"""The attack step — ONE fused XLA program per training iteration.

The reference's hot loop is eager PyTorch: Wav2Vec2 forward, CTC loss,
``backward()``, a sign/Adam update on ``p``, then an eager projection with
host round-trips (reference: src/training_utils/train.py:103-182; SURVEY.md
§3.2). Here the entire iteration — compose+clamp, forward, CTC loss,
``jax.grad`` w.r.t. the perturbation only, optimizer update, and the
psychoacoustic projection — is a single jitted function. The frozen model
parameters are captured as device constants; nothing touches the host but
the scalar metrics and the (tiny) greedy-decode ids.

Multi-chip: ``make_sharded_step`` jits the same function over a
``jax.sharding.Mesh`` with the batch sharded along the ``data`` axis and
``p`` replicated — XLA inserts the ICI all-reduce for ``∂loss/∂p``
(the NCCL-allreduce equivalent the reference never had; SURVEY.md §2.4).
An epsilon sweep adds a vmapped leading axis sharded along ``sweep``
(the TPU-native replacement for SLURM job arrays, submit_scan_range.py).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from paa_tpu.attack import optimizers
from paa_tpu.config import AttackConfig, ConstraintParams
from paa_tpu.ops import ctc, projections
from paa_tpu.ops.psycho import PsychoTables


class StepMetrics(NamedTuple):
    ctc_loss: jnp.ndarray  # scalar, HF 'sum' reduction over the global batch
    greedy_ids: jnp.ndarray  # (B, frames) int32 argmax ids for host-side WER


def _loss_fn(
    p: jnp.ndarray,
    audio: jnp.ndarray,
    labels: jnp.ndarray,
    label_paddings: jnp.ndarray,
    weights: jnp.ndarray,
    apply_fn: Callable,
    params: Any,
    cfg: AttackConfig,
):
    perturbed = audio + p
    if cfg.clamp_audio:
        # mic/software dynamic-range simulation (reference: train.py:136)
        perturbed = jnp.clip(perturbed, -1.0, 1.0)
    logits = apply_fn(params, perturbed)
    per_example = ctc.ctc_loss(logits, labels, label_paddings, reduction="none")
    # weighted sum == HF 'sum' reduction over the real rows; padding rows
    # of the final static-shape batch carry weight 0 (data/pipeline.py)
    loss = jnp.sum(per_example * weights)
    return loss, logits


def _grad_and_metrics(
    p: jnp.ndarray,
    audio: jnp.ndarray,
    labels: jnp.ndarray,
    label_paddings: jnp.ndarray,
    weights: jnp.ndarray,
    apply_fn: Callable,
    params: Any,
    cfg: AttackConfig,
):
    """``(loss, greedy_ids, ∂loss/∂p)`` with optional microbatching.

    With ``cfg.accum_steps > 1`` the batch is processed in chunks under
    ``lax.scan``, summing chunk losses and gradients — numerically the
    same as the monolithic program (the 'sum' CTC reduction is linear in
    the batch) while capping activation memory at chunk size.
    """
    A = cfg.accum_steps
    if A <= 1:
        (loss, logits), grad = jax.value_and_grad(_loss_fn, has_aux=True)(
            p, audio, labels, label_paddings, weights, apply_fn, params, cfg
        )
        return loss, ctc.greedy_ids(logits), grad

    B = audio.shape[0]
    if B % A != 0:
        raise ValueError(f"batch size {B} not divisible by accum_steps {A}")
    chunk = lambda x: x.reshape((A, B // A) + x.shape[1:])

    def body(carry, xs):
        loss_acc, grad_acc = carry
        a, l, lp, w = xs
        (loss, logits), grad = jax.value_and_grad(_loss_fn, has_aux=True)(
            p, a, l, lp, w, apply_fn, params, cfg
        )
        return (loss_acc + loss, grad_acc + grad), ctc.greedy_ids(logits)

    (loss, grad), ids = jax.lax.scan(
        body,
        (jnp.zeros((), jnp.float32), jnp.zeros_like(p)),
        (chunk(audio), chunk(labels), chunk(label_paddings), chunk(weights)),
    )
    return loss, ids.reshape((B,) + ids.shape[2:]), grad


def _train_update(cfg, apply_fn, tables, params, p, opt_state, audio,
                  labels, label_paddings, weights, cparams, lr):
    """One attack update: grad wrt p -> optimizer -> projection. The single
    body behind every train-step variant (plain / sharded / sweep cell)."""
    loss, greedy, grad = _grad_and_metrics(
        p, audio, labels, label_paddings, weights, apply_fn, params, cfg
    )
    new_p, new_opt_state = optimizers.apply_update(cfg, p, grad, opt_state, lr)
    new_p = projections.perturbation_constraint(new_p, audio, cfg, cparams, tables)
    return new_p, new_opt_state, StepMetrics(ctc_loss=loss, greedy_ids=greedy)


def _eval_metrics(apply_fn, params, p, audio, labels, label_paddings, weights):
    """Eval body shared by every eval-step variant: loss + greedy ids with
    ``p`` added but NOT clamped — preserving the reference's train/eval
    asymmetry (reference: src/training_utils/evaluation.py:15-16)."""
    logits = apply_fn(params, audio + p)
    per_example = ctc.ctc_loss(logits, labels, label_paddings, reduction="none")
    return StepMetrics(
        ctc_loss=jnp.sum(per_example * weights), greedy_ids=ctc.greedy_ids(logits)
    )


def make_train_step(
    cfg: AttackConfig,
    apply_fn: Callable,
    tables: PsychoTables,
) -> Callable:
    """Single-device train step:
    ``(params, p, opt_state, audio, labels, label_paddings, weights,
       cparams, lr) -> (new_p, new_opt_state, StepMetrics)``.

    The frozen model parameters are an explicit jit ARGUMENT, never a
    closure constant: closed-over arrays are serialized into the HLO as
    literals, which on a remote-compile backend means shipping hundreds
    of MB per program (and blowing request limits); as arguments they
    stay device-resident and the program is tiny.
    """

    def train_step(params, p, opt_state, audio, labels, label_paddings, weights, cparams, lr):
        return _train_update(cfg, apply_fn, tables, params, p, opt_state,
                             audio, labels, label_paddings, weights, cparams, lr)

    return jax.jit(train_step, donate_argnums=(1, 2))


def make_eval_step(cfg: AttackConfig, apply_fn: Callable) -> Callable:
    """Eval step: loss + greedy ids with ``p`` added but NOT clamped —
    preserving the reference's train/eval asymmetry
    (reference: src/training_utils/evaluation.py:15-16).
    ``p=None``-style clean evaluation passes a zero perturbation.
    """

    def eval_step(params, p, audio, labels, label_paddings, weights):
        return _eval_metrics(apply_fn, params, p, audio, labels, label_paddings, weights)

    return jax.jit(eval_step)


# ---------------------------------------------------------------------------
# Sharded multi-chip variants
# ---------------------------------------------------------------------------


def make_sharded_eval_step(
    cfg: AttackConfig,
    apply_fn: Callable,
    mesh: Mesh,
    params_sharding: Any | None = None,
) -> Callable:
    """Data-parallel eval step over ``mesh``: batch sharded along
    ``"data"``, ``p``/params replicated, the summed CTC loss all-reduced
    by XLA over ICI. Same semantics as :func:`make_eval_step` (unclamped
    add; reference: src/training_utils/evaluation.py:15-16) — on an
    N-chip slice the clean and perturbed eval passes use every chip
    instead of leaving N-1 idle.

    ``params_sharding``: optional pytree of NamedShardings for the frozen
    model params (parallel/tp.py Megatron layout on a ``model`` mesh
    axis); default fully replicated."""
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))

    def eval_step(params, p, audio, labels, label_paddings, weights):
        return _eval_metrics(apply_fn, params, p, audio, labels, label_paddings, weights)

    return jax.jit(
        eval_step,
        in_shardings=(repl if params_sharding is None else params_sharding,
                      repl, batch_sh, batch_sh, batch_sh, batch_sh),
        out_shardings=StepMetrics(ctc_loss=repl, greedy_ids=batch_sh),
    )


def make_sharded_step(
    cfg: AttackConfig,
    apply_fn: Callable,
    tables: PsychoTables,
    mesh: Mesh,
    params_sharding: Any | None = None,
) -> Callable:
    """Data-parallel train step over ``mesh`` (axis name ``"data"``).

    Shardings:
      * audio/labels/ids: batch axis over ``data``
      * p, opt_state, tables: replicated
      * model params: replicated by default; pass ``params_sharding``
        (a pytree of NamedShardings from parallel/tp.py) on a
        ``(data, model)`` mesh for Megatron tensor parallelism — XLA
        partitions every encoder matmul over the ``model`` axis and
        inserts the per-branch all-reduces.
    The gradient of the *summed* CTC loss w.r.t. the replicated ``p`` is
    an all-reduce XLA inserts over ICI automatically.
    """
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))

    def train_step(params, p, opt_state, audio, labels, label_paddings, weights, cparams, lr):
        return _train_update(cfg, apply_fn, tables, params, p, opt_state,
                             audio, labels, label_paddings, weights, cparams, lr)

    return jax.jit(
        train_step,
        in_shardings=(repl if params_sharding is None else params_sharding,
                      repl, repl, batch_sh, batch_sh, batch_sh, batch_sh, repl, repl),
        out_shardings=(repl, repl, StepMetrics(ctc_loss=repl, greedy_ids=batch_sh)),
        donate_argnums=(1, 2),
    )


def _cell_mask_update(cfg, tables, audio, p, grad, opt_state, cparams, active, lr):
    """Per-cell optimizer update + projection + early-stop freeze — the
    cheap (non-model) tail shared by both sweep-step forms."""
    new_p, new_opt_state = optimizers.apply_update(cfg, p, grad, opt_state, lr)
    new_p = projections.perturbation_constraint(new_p, audio, cfg, cparams, tables)
    keep = lambda new, old: jnp.where(active > 0.5, new, old)
    new_p = keep(new_p, p)
    new_opt_state = jax.tree.map(keep, new_opt_state, opt_state)
    return new_p, new_opt_state


def _make_multiplexed_sweep_step(cfg, apply_fn, tables, mesh):
    """Sweep step as S host-dispatched single-cell steps per batch.

    On a mesh that does NOT shard cells across chips they time-share the
    devices, and every single-program form of the sweep measured FAR
    worse than sequential single-cell passes (vmapped-whole-model AND a
    scan over (cell × chunk): ~4.0-4.9 s vs the 1.2-1.35 s ideal at
    S=5, B=64 — the monolithic program overflows HBM and XLA silently
    host-offloads buffers; docs/PERF.md round 3). Those forms also paid
    5-12 MINUTE compiles. Here the sweep reuses the EXACT single-cell
    program (the one bench.py measures, ~60-90 s compile), dispatching
    it once per cell per batch from the host — same math as the vmapped
    form cell-for-cell (parity-tested), full single-run throughput, and
    the data axis still shards every dispatch across chips.

    Returns a plain Python callable with the jitted sweep-step
    signature; frozen (active=0) cells are still scored for metrics but
    keep their state bit-frozen — the vmapped-form contract. In practice
    the driver never pays for this: because this form reuses one
    compiled program for ANY cell count, cli/sweep.py drops frozen cells
    from the device state the moment they freeze (`_should_drop`), so
    dispatches here are live cells only.
    """
    if mesh.shape["data"] > 1:
        inner = make_sharded_step(cfg, apply_fn, tables, mesh)
    else:
        inner = make_train_step(cfg, apply_fn, tables)

    def sweep_step(params, p_s, opt_state_s, audio, labels, label_paddings,
                   weights, cparams_s, active_s, lr):
        S = int(p_s.shape[0])
        act = np.asarray(active_s) > 0.5
        new_p, new_opt, losses, ids = [], [], [], []
        for i in range(S):
            # fresh slice buffers per dispatch — ``inner`` donates them
            p_i = p_s[i]
            opt_i = jax.tree.map(lambda x: x[i], opt_state_s)
            cp_i = jax.tree.map(lambda x: x[i], cparams_s)
            np_i, no_i, m = inner(
                params, p_i, opt_i, audio, labels, label_paddings,
                weights, cp_i, lr,
            )
            if act[i]:
                new_p.append(np_i)
                new_opt.append(no_i)
            else:  # frozen: metrics computed, state kept (re-slice: the
                new_p.append(p_s[i])  # dispatched buffers were donated
                new_opt.append(jax.tree.map(lambda x: x[i], opt_state_s))
            losses.append(m.ctc_loss)
            ids.append(m.greedy_ids)
        return (
            jnp.stack(new_p),
            jax.tree.map(lambda *xs: jnp.stack(xs), *new_opt),
            StepMetrics(ctc_loss=jnp.stack(losses), greedy_ids=jnp.stack(ids)),
        )

    return sweep_step


def make_sweep_step(
    cfg: AttackConfig,
    apply_fn: Callable,
    tables: PsychoTables,
    mesh: Mesh,
) -> Callable:
    """Epsilon-sweep × data-parallel train step over a 2-D mesh
    (axes ``("sweep", "data")``).

    The sweep dimension is a vmap over (p, opt_state, constraint params)
    sharded along ``sweep``; the batch is shared by all sweep cells and
    sharded along ``data``; the psychoacoustic tables are replicated run
    constants (every per-cell quantity — including the max_phon contour
    level — is a traced ``ConstraintParams`` scalar). One compiled
    program trains every epsilon of a norm type simultaneously — the
    TPU-native replacement for the reference's per-cell SLURM jobs
    (reference: submit_scan_range.py:75-133).

    When the mesh does NOT shard cells across chips (sweep axis size 1 —
    one chip, or a pure data mesh), the cells time-share their devices
    anyway; every monolithic form measured far worse than sequential
    single-cell passes (docs/PERF.md round 3), so the step lowers to
    :func:`_make_multiplexed_sweep_step` — S host dispatches of the
    plain single-cell program per batch. Both forms are cell-for-cell
    compatible (parity-tested).

    ``active`` is a per-cell 0/1 float: cells that early-stopped keep
    their perturbation and optimizer state frozen (the sweep equivalent
    of the reference's per-job early stop, run_attack.py:181-183) while
    live cells keep training in the same program.
    """
    if mesh.shape["sweep"] == 1:
        return _make_multiplexed_sweep_step(cfg, apply_fn, tables, mesh)

    repl = NamedSharding(mesh, P())
    sweep_sh = NamedSharding(mesh, P("sweep"))
    audio_sh = NamedSharding(mesh, P("data"))

    def one_cell(params, p, opt_state, cparams, active, audio, labels, label_paddings, weights, lr):
        loss, greedy, grad = _grad_and_metrics(
            p, audio, labels, label_paddings, weights, apply_fn, params, cfg
        )
        new_p, new_opt_state = _cell_mask_update(
            cfg, tables, audio, p, grad, opt_state, cparams, active, lr
        )
        return new_p, new_opt_state, StepMetrics(ctc_loss=loss, greedy_ids=greedy)

    def sweep_step(params, p_s, opt_state_s, audio, labels, label_paddings, weights, cparams_s, active_s, lr):
        return jax.vmap(
            one_cell,
            in_axes=(None, 0, 0, 0, 0, None, None, None, None, None),
            out_axes=(0, 0, StepMetrics(ctc_loss=0, greedy_ids=0)),
        )(params, p_s, opt_state_s, cparams_s, active_s, audio, labels, label_paddings, weights, lr)

    sweep_metrics_sh = StepMetrics(
        ctc_loss=sweep_sh, greedy_ids=NamedSharding(mesh, P("sweep", "data"))
    )
    return jax.jit(
        sweep_step,
        in_shardings=(repl, sweep_sh, sweep_sh, audio_sh, audio_sh, audio_sh, audio_sh, sweep_sh, sweep_sh, repl),
        out_shardings=(sweep_sh, sweep_sh, sweep_metrics_sh),
        donate_argnums=(1, 2),
    )


def make_sweep_eval_step(
    cfg: AttackConfig,
    apply_fn: Callable,
    mesh: Mesh,
) -> Callable:
    """Vmapped eval step for a sweep: every cell's perturbation is scored
    against the shared (data-sharded) batch in one program. Preserves the
    unclamped-add eval asymmetry (reference: evaluation.py:15-16).

    Like :func:`make_sweep_step`, lowers to S host dispatches of the
    plain (data-sharded) eval program when the mesh does not shard cells
    across chips — same numbers, no monolithic compile."""
    if mesh.shape["sweep"] == 1:
        inner = (
            make_sharded_eval_step(cfg, apply_fn, mesh)
            if mesh.shape["data"] > 1 else make_eval_step(cfg, apply_fn)
        )

        def mux_eval(params, p_s, audio, labels, label_paddings, weights):
            ms = [
                inner(params, p_s[i], audio, labels, label_paddings, weights)
                for i in range(int(p_s.shape[0]))
            ]
            return StepMetrics(
                ctc_loss=jnp.stack([m.ctc_loss for m in ms]),
                greedy_ids=jnp.stack([m.greedy_ids for m in ms]),
            )

        return mux_eval

    repl = NamedSharding(mesh, P())
    sweep_sh = NamedSharding(mesh, P("sweep"))
    audio_sh = NamedSharding(mesh, P("data"))

    def one_cell(params, p, audio, labels, label_paddings, weights):
        return _eval_metrics(apply_fn, params, p, audio, labels, label_paddings, weights)

    def sweep_eval(params, p_s, audio, labels, label_paddings, weights):
        return jax.vmap(
            one_cell, in_axes=(None, 0, None, None, None, None),
            out_axes=StepMetrics(ctc_loss=0, greedy_ids=0),
        )(params, p_s, audio, labels, label_paddings, weights)

    sweep_metrics_sh = StepMetrics(
        ctc_loss=sweep_sh, greedy_ids=NamedSharding(mesh, P("sweep", "data"))
    )
    return jax.jit(
        sweep_eval,
        in_shardings=(repl, sweep_sh, audio_sh, audio_sh, audio_sh, audio_sh),
        out_shardings=sweep_metrics_sh,
    )
