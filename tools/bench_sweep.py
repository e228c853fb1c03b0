"""Steady-state epsilon-sweep throughput on one chip.

Measures the consolidated sweep step (attack/step.py:make_sweep_step) —
all S epsilons of one norm trained simultaneously as a vmapped, masked
program — at the reference's production shape, and compares against S
sequential single runs at the single-step rate (the reference's actual
execution model: one SLURM job per epsilon, submit_scan_range.py:75-133).

Defaults: max_phon grid 15/20/25/30/35 (submit_scan_range.py:88),
wav2vec2-base, B=64 × 10 s. The vmapped S-cell program multiplies
activation memory ~S×, so a 16 GB chip needs gradient accumulation:
SWEEP_ACCUM picks the microbatch chunking (see docs/PERF.md for the
measured recipe).

Prints ONE JSON line:
  {"metric": ..., "cell_steps_per_sec": N, "vs_sequential": N, ...}
where vs_sequential = cell_steps_per_sec / single_steps_per_sec — >1.0
means one consolidated sweep beats S sequential runs on the same chip.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("SWEEP_BATCH", "64"))
T = int(os.environ.get("SWEEP_AUDIO_LEN", "160000"))
NORM = os.environ.get("SWEEP_NORM", "max_phon")
GRID = [float(v) for v in os.environ.get("SWEEP_GRID", "15,20,25,30,35").split(",")]
STEPS = int(os.environ.get("SWEEP_STEPS", "10"))
ACCUM = int(os.environ.get("SWEEP_ACCUM", "8"))
MODEL = os.environ.get("SWEEP_MODEL", "wav2vec2-base")
ATTN = os.environ.get("SWEEP_ATTN")  # default: fused on TPU
REMAT = os.environ.get("SWEEP_REMAT", "1") == "1"
PARAM_STORAGE = os.environ.get("SWEEP_PARAM_STORAGE", "bfloat16")
# single-run steps/s at the same shape for the vs_sequential ratio
# (bench.py's current number; override after re-benching)
SINGLE_STEPS_PER_SEC = float(os.environ.get("SWEEP_SINGLE_SPS", "4.18"))


def build_fixture():
    """Sweep step + its operand list at the env-configured shape.

    Shared by this benchmark and tools/profile_sweep.py so the traced
    program can never drift from the timed one. Returns ``(sweep, ops)``
    where ``ops`` is the positional argument list; callers rebind
    ``ops[1], ops[2]`` (p_s, opt_s) with each step's outputs.
    """
    from paa_tpu import runtime

    runtime.configure()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from paa_tpu.attack import optimizers, step as attack_step
    from paa_tpu.config import AttackConfig, ConstraintParams, with_sweep_value
    from paa_tpu.models import wav2vec2
    from paa_tpu.ops import psycho, text
    from paa_tpu.parallel import mesh as mesh_lib

    S = len(GRID)
    attn = ATTN or ("fused" if jax.default_backend() == "tpu" else "xla")
    cfg = AttackConfig(
        norm_type=NORM, optimizer_type="pgd", lr=1e-4, remat=REMAT,
        accum_steps=ACCUM,
        use_pallas_fm=jax.default_backend() == "tpu",
    )
    mcfg = wav2vec2.get_config(
        MODEL, remat=REMAT, attention_impl=attn,
        remat_feature_extractor=True, remat_policy="save_cheap",
    )
    params = wav2vec2.init_params(mcfg, example_len=2000)
    if PARAM_STORAGE != "float32":
        params = wav2vec2.cast_param_storage(params, PARAM_STORAGE)
    model = wav2vec2.Wav2Vec2ForCTC(mcfg)
    apply_fn = lambda prm, a: model.apply({"params": prm}, a)
    tables = psycho.build_tables(cfg)

    n_dev = len(jax.devices())
    n_sweep = S if n_dev % S == 0 and S <= n_dev else 1
    mesh = mesh_lib.sweep_mesh(n_sweep=n_sweep, n_devices=n_dev)
    sweep = attack_step.make_sweep_step(cfg, apply_fn, tables, mesh)

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32) * 0.1)
    labels, pads = text.encode_batch(
        ["the quick brown fox jumps over the lazy dog"] * B
    )
    labels, pads = jnp.asarray(labels), jnp.asarray(pads)
    weights = jnp.ones((B,), jnp.float32)
    cparams_s = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (S,)), ConstraintParams.create()
    )
    cparams_s = with_sweep_value(cparams_s, NORM, np.asarray(GRID, np.float32))
    p_s = jnp.zeros((S, 1, T), jnp.float32)
    opt_s = jax.vmap(lambda q: optimizers.init_opt_state(cfg, q))(p_s)
    active = jnp.ones((S,), jnp.float32)
    lr = jnp.float32(cfg.lr)

    ops = [params, p_s, opt_s, audio, labels, pads, weights, cparams_s, active, lr]
    return sweep, ops


def main() -> int:
    import jax.numpy as jnp

    sweep, ops = build_fixture()
    S = len(GRID)

    # Label the first-call timing honestly: with a populated persistent
    # XLA cache this is a cheap deserialize ("warm"), without one it is
    # a full compile ("cold") — the two differ by ~20× and an unlabeled
    # number invites false comparisons (e.g. 13.7 s warm vs ~270 s cold
    # for the S=8 fm sweep, docs/PERF.md).
    import jax as _jax

    cache_dir = _jax.config.jax_compilation_cache_dir
    cache_populated = bool(cache_dir) and os.path.isdir(cache_dir) and bool(
        os.listdir(cache_dir)
    )
    t_c = time.perf_counter()
    p_s, opt_s, m = sweep(*ops)
    ops[1], ops[2] = p_s, opt_s
    _ = float(jnp.sum(m.ctc_loss))  # force full sync
    compile_s = time.perf_counter() - t_c

    t0 = time.perf_counter()
    for _ in range(STEPS):
        p_s, opt_s, m = sweep(*ops)
        ops[1], ops[2] = p_s, opt_s
    _ = float(jnp.sum(m.ctc_loss))
    _ = float(jnp.sum(ops[1]))
    dt = (time.perf_counter() - t0) / STEPS

    sweep_sps = 1.0 / dt
    cell_sps = S / dt
    print(json.dumps({
        "metric": (
            f"sweep cell-steps/sec/chip ({MODEL}, S={S} {NORM} cells, "
            f"B={B}, {T/16000:.0f}s audio, PGD, accum={ACCUM})"
        ),
        "cell_steps_per_sec": round(cell_sps, 3),
        "sweep_steps_per_sec": round(sweep_sps, 3),
        "single_steps_per_sec_ref": SINGLE_STEPS_PER_SEC,
        "vs_sequential": round(cell_sps / (SINGLE_STEPS_PER_SEC * 1.0), 3),
        "compile_sec": round(compile_s, 1),
        "compile_cache": "warm" if cache_populated else "cold",
        "compile_cache_dir": cache_dir or None,
        "ms_per_sweep_step": round(1000 * dt, 1),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
