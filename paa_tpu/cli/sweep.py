"""Sweep driver — the TPU-native replacement for SLURM job arrays.

The reference farms the (norm_type × epsilon) grid to sbatch, one GPU per
cell, and each cell executes the FULL ``main`` attack loop: per-epoch
clean/perturbed eval, best-perturbation tracking, early stopping, and
requeue-resume (reference: submit_scan_range.py:8-143 driving
src/run_attack.py:61-183). Here a sweep is executed *in-process* with the
same per-cell semantics:

  * all epsilons of one norm type train SIMULTANEOUSLY as a vmapped
    leading axis of one compiled program (attack/step.py:make_sweep_step),
    sharded over the mesh's ``sweep`` axis — one chip per cell on a slice,
    cells sharing chips otherwise;
  * every cell starts from the SAME projected randn perturbation a
    standalone run with this seed would use (the reference hands each
    SLURM job the same ``--seed``; build.py:288-321) — per-cell
    projections differ only through their epsilon;
  * per epoch, every cell is evaluated on the eval split (clean pass
    computed once — it is cell-independent — perturbed pass vmapped over
    cells), with per-cell best-p tracking and early stopping: stopped
    cells freeze their state inside the same compiled program via the
    ``active`` mask (run_attack.py:149-183 per cell);
  * the whole sweep checkpoints per epoch and resumes exactly — batch
    order is a pure function of (seed, epoch), matching train/loop.py —
    replacing SLURM ``--requeue`` (submit_scan_range.py:58);
  * per-cell results land in the same per-cell run directories +
    cumulative results.json + metrics.jsonl the single-run loop produces,
    plus a sweep-level summary (``sweep_results.json``, with per-cell
    eval/test WER) replacing the reference's missing ``grab_results.py``
    aggregator (SURVEY.md §5.5).

Default grids mirror submit_scan_range.py:80-88 (grids left empty there
get the flag defaults as a single cell).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import time

import numpy as np

# Reference grids: submit_scan_range.py:80-88.
DEFAULT_GRIDS = {
    "snr": [60.0, 65.0],
    "min_max_freqs": [100.0, 125.0],
    "fletcher_munson": [2.0],  # reference grid empty → flag default
    "l2": [0.04, 0.06, 0.08],
    "linf": [1e-4],  # reference grid empty → flag default
    "tv": [0.001, 0.002],
    "max_phon": [15.0, 20.0, 25.0, 30.0, 35.0],
}


def create_sweep_parser() -> argparse.ArgumentParser:
    from paa_tpu.cli.parser import create_arg_parser

    parser = create_arg_parser()
    parser.add_argument(
        "--norms", type=str, default=",".join(DEFAULT_GRIDS),
        help="comma-separated norm types to sweep",
    )
    parser.add_argument(
        "--grid", type=str, default=None,
        help="JSON dict {norm_type: [sizes...]} overriding the default grids",
    )
    parser.add_argument(
        "--epochs_per_cell", type=int, default=None,
        help="override --num_epochs for sweep cells",
    )
    parser.add_argument(
        "--cell_artifacts", action="store_true",
        help="emit the FULL per-cell artifact bundle at finalize (loss "
             "plots, sample-inspection triples, perceptual debug panels) "
             "— everything a standalone run_attack would write; off by "
             "default since it costs an extra eval pass and S×plots",
    )
    return parser


def _ns_for(s: int, n_dev: int) -> int:
    """Sweep-axis size for an ``s``-cell sweep on ``n_dev`` devices:
    shard cells across chips when they divide evenly, else the
    host-multiplexed sweep-axis-1 form (attack/step.py:make_sweep_step)."""
    return s if n_dev % s == 0 and s <= n_dev else 1


def _should_drop(n_live: int, n_cur: int, n_dev: int) -> bool:
    """Rebuild device state over the surviving cells now?

    The host-multiplexed form (sweep axis 1) reuses the SAME compiled
    single-cell program for any cell count, so dropping is free and
    happens the moment any cell freezes — each frozen cell would
    otherwise pay a full discarded fwd+bwd dispatch per batch. The
    vmapped form pays a rebuild + compile per new cell count, so it
    waits until ≤ half the cells survive.
    """
    if not 0 < n_live < n_cur:
        return False
    if _ns_for(n_cur, n_dev) == 1 and _ns_for(n_live, n_dev) == 1:
        return True
    return n_live <= n_cur // 2


def _cell_dir(root: str, args, cfg, norm_type: str, size: float) -> str:
    # same layout as the reference's per-job save_dir (build.py:249-254)
    return os.path.join(
        root, cfg.attack_mode, args.dataset,
        f"{norm_type}_{size}_{cfg.attack_mode}_{cfg.optimizer_type}",
    )


def _sweep_wer(ids_s: np.ndarray, mask: np.ndarray, refs: list[str]) -> np.ndarray:
    """Per-cell WER for one batch: ids_s is (S, B, frames). Decoding and
    normalization delegate to the single-run loop's helper so the two
    paths cannot drift."""
    from paa_tpu.train.loop import _batch_wer

    return np.asarray([_batch_wer(ids[mask], refs)[0] for ids in ids_s], np.float64)


def _inspect_cells(
    pipe, cfg, params, best_p_s, best_p_dev, clean_eval_step, sweep_eval_full,
    n_items: int, seed: int = 0,
):
    """Per-cell sample-inspection triples on shared random test items.

    The sweep analogue of AttackRunner.inspect_samples (reference:
    save.py:49-101 per SLURM cell): ONE clean pass + one vmapped
    perturbed pass per item batch scores every cell's predictions; the
    clean prediction is cell-independent and shared."""
    import jax.numpy as jnp

    from paa_tpu.ops import text as text_ops

    split = pipe.test
    S = int(best_p_dev.shape[0])
    rng = np.random.default_rng(seed)
    n = min(n_items, len(split))
    idx = rng.choice(len(split), size=n, replace=False)
    zero = jnp.zeros((1, pipe.audio_len), jnp.float32)
    per_cell = [[] for _ in range(S)]
    for start in range(0, n, cfg.batch_size):
        batch = split.collate(idx[start : start + cfg.batch_size], cfg.batch_size)
        w = np.asarray(batch.weights) > 0
        clean_m = clean_eval_step(
            params, zero, batch.audio, batch.labels, batch.label_paddings,
            batch.weights,
        )
        pert_m = sweep_eval_full(
            params, best_p_dev, batch.audio, batch.labels,
            batch.label_paddings, batch.weights,
        )
        clean_preds = text_ops.decode_batch(np.asarray(clean_m.greedy_ids))
        ids_s = np.asarray(pert_m.greedy_ids)  # (S, B, frames)
        audio_np = np.asarray(batch.audio)
        for i in range(S):
            pert_preds = text_ops.decode_batch(ids_s[i])
            p_i = np.asarray(best_p_s[i]).reshape(-1)
            for j in range(cfg.batch_size):
                if not w[j]:
                    continue
                row = int(batch.indices[j])
                audio = audio_np[j]
                per_cell[i].append(dict(
                    clean=audio,
                    perturbed=np.clip(audio + p_i[: len(audio)], -1, 1),
                    ground_truth=split.texts[row],
                    clean_pred=clean_preds[j].lower(),
                    pert_pred=pert_preds[j].lower(),
                ))
    return per_cell


def run_sweep(args) -> dict:
    from paa_tpu.cli import run_attack as run_attack_cli
    from paa_tpu.data import datasets, pipeline as pipeline_lib

    log = logging.getLogger("paa_tpu")
    if getattr(args, "tp", 1) > 1:
        # The sweep runs on a (sweep, data) mesh; a third `model` axis is
        # not wired. Fail loudly instead of silently training unsharded —
        # use run_attack --tp per cell (or cli.launch_grid) for tp runs.
        raise SystemExit(
            "--tp > 1 is not supported by cli.sweep (its mesh axes are "
            "(sweep, data)); run cells individually via run_attack --tp"
        )
    grids = dict(DEFAULT_GRIDS)
    if args.grid:
        grids.update(json.loads(args.grid))
    norms = [n.strip() for n in args.norms.split(",") if n.strip()]
    if args.epochs_per_cell:
        args.num_epochs = args.epochs_per_cell

    # Shared data + model for every cell (the reference re-downloads and
    # re-loads per job).
    from paa_tpu.cli.run_attack import _parse_words

    samples = datasets.load_dataset_tuples(
        args.dataset, seed=args.seed, data_root=args.data_root,
        small_data=args.small_data, synthetic_samples=args.synthetic_samples,
        synthetic_words=_parse_words(args.synthetic_words),
    )
    pipe = pipeline_lib.build_pipeline(
        samples, relative_audio_length=args.relative_audio_length,
        seed=args.seed, target_sr=args.sr,
    )
    # attn_mesh=None: the sweep's vmapped form runs the model under vmap,
    # where the manual attention region (models/wav2vec2.py _manual_shard)
    # would need per-axis vmap plumbing; sweep attention stays GSPMD.
    _, params, apply_fn = run_attack_cli.load_model_bundle(args, attn_mesh=None)

    summary = {}
    root = args.save_root or os.path.join(os.getcwd(), "logs")
    os.makedirs(root, exist_ok=True)

    for norm_type in norms:
        sizes = grids.get(norm_type, [])
        if not sizes:
            continue
        summary[norm_type] = _run_norm_sweep(
            args, norm_type, [float(s) for s in sizes], pipe, params, apply_fn, root
        )

    out_path = os.path.join(root, "sweep_results.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    log.info("sweep summary written to %s", out_path)
    return summary


def _run_norm_sweep(args, norm_type, sizes, pipe, params, apply_fn, root) -> dict:
    """All epsilons of one norm type, each cell a full attack run
    (reference: one SLURM job per cell running run_attack.py:13-279)."""
    import jax
    import jax.numpy as jnp

    from paa_tpu.attack import optimizers, step as attack_step
    from paa_tpu.cli.parser import config_from_args, constraint_params_from_args
    from paa_tpu.config import with_sweep_value
    from paa_tpu.data import pipeline as pipeline_lib
    from paa_tpu.ops import projections, psycho
    from paa_tpu.parallel import mesh as mesh_lib
    from paa_tpu.train import artifacts, checkpoint, scoring

    log = logging.getLogger("paa_tpu")
    S = len(sizes)
    cfg = config_from_args(args).replace(norm_type=norm_type)
    base_cparams = constraint_params_from_args(args)
    cparams_s = jax.tree.map(lambda x: jnp.broadcast_to(x, (S,)), base_cparams)
    cparams_s = with_sweep_value(cparams_s, norm_type, np.asarray(sizes, np.float32))
    tables = psycho.build_tables(cfg)

    n_dev = len(jax.devices())

    def _build_programs(s_dev: int):
        """Compiled (train, eval, mesh, n_sweep) for an ``s_dev``-cell
        sweep. Rebuilt over the surviving cells when most have
        early-stopped — the vmapped program otherwise keeps paying S full
        forward/backwards per batch for frozen cells (the mask only
        no-ops the *update*)."""
        ns = _ns_for(s_dev, n_dev)
        m = mesh_lib.sweep_mesh(n_sweep=ns, n_devices=n_dev)
        return (
            attack_step.make_sweep_step(cfg, apply_fn, tables, m),
            attack_step.make_sweep_eval_step(cfg, apply_fn, m),
            m,
            ns,
        )

    programs = {S: _build_programs(S)}
    step, sweep_eval, mesh, n_sweep = programs[S]
    # the clean pass is cell-independent — ONE program, batch sharded
    # over the mesh's data axis so no chip idles (attack/step.py:170)
    clean_eval_step = attack_step.make_sharded_eval_step(cfg, apply_fn, mesh)

    cell_dirs = [_cell_dir(root, args, cfg, norm_type, s) for s in sizes]

    # per-cell TensorBoard mirrors (lazy; same writer a standalone
    # run_attack would create for that cell dir)
    _tb_writers: dict[int, object] = {}

    def _tb(i: int):
        if not getattr(args, "tensorboard", False):
            return None
        if i not in _tb_writers:
            from paa_tpu.train import tb_events

            _tb_writers[i] = tb_events.EventWriter(
                os.path.join(cell_dirs[i], "tb")
            )
        return _tb_writers[i]
    for d in cell_dirs:
        os.makedirs(d, exist_ok=True)

    # -- init: every cell starts from the standalone-run perturbation ----
    # randn(1, T) with the run seed (identical across cells, exactly as
    # each SLURM job with the same --seed would draw; build.py:301), then
    # the per-cell projection — the reference projects at init too
    # (build.py:303) and skipping it would feed epoch 0 saturated N(0,1)
    # noise and contaminate Adam's first moments.
    key = jax.random.PRNGKey(cfg.seed)
    p0 = jax.random.normal(key, (1, pipe.audio_len), dtype=jnp.float32)
    clean0 = None
    if cfg.norm_type in ("snr", "tv"):
        first = next(pipe.train.batches(cfg.batch_size))
        clean0 = jnp.asarray(first.audio)
    p_s = jax.vmap(
        lambda cp: projections.perturbation_constraint(p0, clean0, cfg, cp, tables)
    )(cparams_s)
    opt_s = jax.vmap(lambda q: optimizers.init_opt_state(cfg, q))(p_s)

    L = pipe.train.labels.shape[1]
    tgt_labels = tgt_pads = None
    if cfg.attack_mode == "targeted":
        from paa_tpu.train.loop import _targeted_labels

        tl, tp = _targeted_labels(cfg, cfg.batch_size, L, audio_len=pipe.audio_len)
        tgt_labels, tgt_pads = jnp.asarray(tl), jnp.asarray(tp)

    # -- per-cell tracking state (host) -----------------------------------
    history_keys = (
        "train_ctc", "train_wer", "eval_clean_ctc", "eval_clean_wer",
        "eval_pert_ctc", "eval_pert_wer",
    )
    history = {k: [] for k in history_keys}  # lists of (S,) arrays, one per epoch
    best_score_s = np.full((S,), scoring.initial_best(cfg.attack_mode), np.float64)
    best_p_s = np.array(p_s)  # writable copy (np.asarray of a jax array is read-only)
    best_epoch_s = np.full((S,), -1, np.int64)
    no_improve_s = np.zeros((S,), np.int64)
    # epochs recorded while the cell was still TRAINING — a stopped
    # cell's frozen-p epochs must not enter its history aggregates (the
    # equivalent single run stops recording at its stop epoch)
    hist_len_s = np.zeros((S,), np.int64)
    start_epoch = 0
    clean_eval = None  # (ctc, wer) — constant across epochs and cells

    # -- checkpoint/resume (replaces SLURM --requeue; build.py:266-286) ---
    # The checkpoint is guarded by a config fingerprint: resuming a sweep
    # whose grid/seed/optimizer/shapes/corpus changed would silently
    # continue stale state under freshly-labeled cell dirs. ``--no_resume``
    # (and ``--small_data``, matching run_attack/build.py:279) discards
    # any leftover state. A FINISHED norm keeps its checkpoint: a requeued
    # multi-norm sweep then resumes it past its last epoch and goes
    # straight to finalize instead of retraining from scratch; a changed
    # config still refuses via the fingerprint.
    import dataclasses as _dc

    ckpt_path = os.path.join(root, f"sweep_state_{norm_type}.msgpack")
    fp_path = ckpt_path + ".json"
    cfg_fp = _dc.asdict(cfg)
    for transient in ("num_epochs", "early_stopping"):
        # run-length knobs may legitimately change across a resume (a
        # requeued job gets a new walltime); everything else must match
        cfg_fp.pop(transient)
    fingerprint = {
        "cfg": cfg_fp,
        "sizes": [float(s) for s in sizes],
        "audio_len": int(pipe.audio_len),
        "dataset": args.dataset,
        # corpus-shaping flags: the same --dataset name over a different
        # corpus is still stale state
        "data_root": getattr(args, "data_root", None),
        "synthetic_samples": getattr(args, "synthetic_samples", None),
        "synthetic_words": getattr(args, "synthetic_words", None),
        "n_train": len(pipe.train),
    }
    if args.no_resume or args.small_data:
        for stale in (ckpt_path, fp_path):
            if os.path.exists(stale):
                os.remove(stale)
    elif os.path.exists(ckpt_path):
        saved_fp = None
        if os.path.exists(fp_path):
            with open(fp_path) as fh:
                saved_fp = json.load(fh)
        if saved_fp != fingerprint:
            raise RuntimeError(
                f"Sweep checkpoint {ckpt_path!r} was written under a "
                "different configuration (grid/seed/optimizer/shapes "
                "changed). Pass --no_resume to discard it, or restore the "
                "original flags to resume."
            )
    template = {
        "p_s": p_s, "opt_s": opt_s, "epoch": 0,
        "best_score_s": best_score_s, "best_p_s": best_p_s,
        "best_epoch_s": best_epoch_s, "no_improve_s": no_improve_s,
        "hist_len_s": hist_len_s,
        "history": {k: np.zeros((0, S), np.float64) for k in history_keys},
        "clean_eval": np.zeros((2,), np.float64),
    }
    if os.path.exists(ckpt_path):
        state = checkpoint.load_checkpoint(ckpt_path, template)
        p_s = jnp.asarray(state["p_s"])
        opt_s = jax.tree.map(jnp.asarray, state["opt_s"])
        start_epoch = int(state["epoch"]) + 1
        best_score_s = np.array(state["best_score_s"])
        best_p_s = np.array(state["best_p_s"])
        best_epoch_s = np.array(state["best_epoch_s"])
        no_improve_s = np.array(state["no_improve_s"])
        hist_len_s = np.array(state["hist_len_s"])
        history = {k: list(np.asarray(state["history"][k])) for k in history_keys}
        ce = np.asarray(state["clean_eval"])
        clean_eval = (float(ce[0]), float(ce[1])) if np.isfinite(ce[0]) else None
        log.info("[sweep %s] resuming at epoch %d", norm_type, start_epoch)

    # truncate per-cell metric streams to epochs before the resume point
    # (fresh sweeps start clean; a resumed sweep never duplicates an
    # epoch line — the lines are written before the epoch's checkpoint)
    from paa_tpu.train.loop import _truncate_metrics

    for d in cell_dirs:
        _truncate_metrics(os.path.join(d, "metrics.jsonl"), start_epoch)

    def _labels_for(batch):
        if cfg.attack_mode == "targeted":
            return tgt_labels, tgt_pads
        return batch.labels, batch.label_paddings

    # Batch feed honoring cfg.cache_data_on_device (pipeline.CorpusCache,
    # shared with AttackRunner). Corpus rows shard over the initial mesh's
    # data axis; if the sweep program is later rebuilt over fewer cells,
    # jit reshards the gathered batches to the new program's shardings.
    _cache = pipeline_lib.CorpusCache(cfg.cache_data_on_device, mesh=mesh)

    def _src(split, shuffle_rng=None):
        return _cache.batches(split, cfg.batch_size, shuffle_rng=shuffle_rng)

    def _evaluate_cells(split, p_cells, eval_fn):
        """Per-cell (ctc, wer) on a split — the vmapped analogue of
        AttackRunner.evaluate (unclamped add; evaluation.py:15-16).
        ``p_cells`` may hold any number of cells; ``eval_fn`` must be the
        matching compiled program."""
        n_cells = int(p_cells.shape[0])
        pending = []
        for batch in _src(split):
            labels, pads = _labels_for(batch)
            m = eval_fn(params, p_cells, batch.audio, labels, pads, batch.weights)
            pending.append((m, pipeline_lib.host_mask(batch), batch.indices))
        ctc = np.zeros((n_cells,), np.float64)
        wer = np.zeros((n_cells,), np.float64)
        for m, w, indices in pending:
            ctc += np.asarray(m.ctc_loss, np.float64)
            refs = [split.texts[i] for i in np.asarray(indices)[w]]
            wer += _sweep_wer(np.asarray(m.greedy_ids), w, refs)
        if not pending:  # same sentinel as AttackRunner.evaluate
            return np.full((n_cells,), np.inf), np.full((n_cells,), np.inf)
        n = len(pending)
        return ctc / n, wer / n

    def _evaluate_clean(split):
        """Clean pass is cell-independent — one unsweeped program, batch
        sharded over the mesh's data axis (no idle chips)."""
        ctc_scores, wer_scores = [], []
        zero = jnp.zeros((1, pipe.audio_len), jnp.float32)
        for batch in _src(split):
            labels, pads = _labels_for(batch)
            m = clean_eval_step(params, zero, batch.audio, labels, pads, batch.weights)
            from paa_tpu.train.loop import _batch_wer

            w = pipeline_lib.host_mask(batch)
            ctc_scores.append(float(m.ctc_loss))
            refs = [split.texts[i] for i in np.asarray(batch.indices)[w]]
            wer_scores.append(_batch_wer(np.asarray(m.greedy_ids)[w], refs)[0])
        if not ctc_scores:  # same sentinel as AttackRunner.evaluate
            return float("inf"), float("inf")
        n = len(ctc_scores)
        return sum(ctc_scores) / n, sum(wer_scores) / n

    # -- live-cell device state --------------------------------------------
    # Device arrays hold only the cells still worth computing; host-side
    # full-S copies back the checkpoint and best tracking. Once ≤ half
    # the device cells are still live, the programs are rebuilt over the
    # survivors — the masked program otherwise keeps paying S full
    # forward/backwards per batch for frozen cells.
    p_full = np.array(p_s)
    opt_full = jax.tree.map(np.array, opt_s)
    dev_idx = np.arange(S)
    cparams_dev = cparams_s

    # -- epochs ------------------------------------------------------------
    t_start = time.perf_counter()
    n_cell_steps = 0  # Σ over steps of cells actually TRAINING that step
    for epoch in range(start_epoch, cfg.num_epochs):
        if np.all(no_improve_s >= cfg.early_stopping):
            # resumed from a checkpoint where every cell had already
            # early-stopped: don't train extra epochs, go to finalize
            log.info("[sweep %s] resumed fully early-stopped; finalizing", norm_type)
            break
        live_mask = no_improve_s < cfg.early_stopping
        n_live = int(live_mask.sum())
        cur_key = len(dev_idx)
        if _should_drop(n_live, cur_key, n_dev):
            dev_idx = np.where(live_mask)[0]
            s_dev = len(dev_idx)
            if s_dev not in programs:
                if _ns_for(cur_key, n_dev) == 1 and _ns_for(s_dev, n_dev) == 1:
                    # same mux programs: they read S off p_s.shape
                    programs[s_dev] = programs[cur_key]
                else:
                    programs[s_dev] = _build_programs(s_dev)
            step, sweep_eval, _, _ = programs[s_dev]
            p_s = jnp.asarray(p_full[dev_idx])
            opt_s = jax.tree.map(
                lambda f: jnp.asarray(np.asarray(f)[dev_idx]), opt_full
            )
            cparams_dev = jax.tree.map(lambda x: x[dev_idx], cparams_s)
            log.info(
                "[sweep %s] dropping frozen cells: training %d/%d cells from epoch %d",
                norm_type, s_dev, S, epoch,
            )
        # batch order is a pure function of (seed, epoch) — resume-exact,
        # matching train/loop.py
        data_rng = np.random.default_rng((cfg.seed, epoch))
        active = jnp.asarray(live_mask[dev_idx].astype(np.float32))
        lr = jnp.float32(optimizers.step_lr(cfg, epoch))
        pending = []
        for batch in _src(pipe.train, shuffle_rng=data_rng):
            labels, pads = _labels_for(batch)
            p_s, opt_s, m = step(
                params, p_s, opt_s, batch.audio, labels, pads,
                batch.weights, cparams_dev, active, lr,
            )
            pending.append((m, pipeline_lib.host_mask(batch), batch.indices))
        n_cell_steps += len(pending) * n_live
        # scatter the trained cells back into the full-S host state
        p_full[dev_idx] = np.asarray(p_s)

        def _scatter(full, sub):
            full[dev_idx] = np.asarray(sub)
            return full

        opt_full = jax.tree.map(_scatter, opt_full, opt_s)
        # train metrics: per-batch sums averaged over batches, the same
        # aggregation as the single-run loop (train/loop.py:train_epoch);
        # cells not in the device program get NaN (their history past the
        # stop epoch is never consumed — hist_len_s truncates it)
        train_ctc = np.full((S,), np.nan)
        train_wer = np.full((S,), np.nan)
        tc = np.zeros((len(dev_idx),), np.float64)
        tw = np.zeros((len(dev_idx),), np.float64)
        for m, w, indices in pending:
            tc += np.asarray(m.ctc_loss, np.float64)
            refs = [pipe.train.texts[i] for i in np.asarray(indices)[w]]
            tw += _sweep_wer(np.asarray(m.greedy_ids), w, refs)
        nb = max(len(pending), 1)
        train_ctc[dev_idx] = tc / nb
        train_wer[dev_idx] = tw / nb

        if clean_eval is None:
            clean_eval = _evaluate_clean(pipe.eval)
        pert_ctc = np.full((S,), np.nan)
        pert_wer = np.full((S,), np.nan)
        pc, pw = _evaluate_cells(pipe.eval, p_s, sweep_eval)
        pert_ctc[dev_idx] = pc
        pert_wer[dev_idx] = pw

        history["train_ctc"].append(train_ctc)
        history["train_wer"].append(train_wer)
        history["eval_clean_ctc"].append(np.full((S,), clean_eval[0]))
        history["eval_clean_wer"].append(np.full((S,), clean_eval[1]))
        history["eval_pert_ctc"].append(pert_ctc)
        history["eval_pert_wer"].append(pert_wer)
        hist_len_s[live_mask] += 1
        log.info(
            "[sweep %s] epoch %d train_ctc=%s eval_pert_ctc=%s eval_pert_wer=%s active=%s",
            norm_type, epoch, train_ctc.round(1), pert_ctc.round(1),
            pert_wer.round(3), live_mask.astype(np.int32),
        )

        # per-cell best tracking / early stopping (run_attack.py:149-183)
        p_host = p_full
        wall = time.perf_counter() - t_start
        for i in range(S):
            if no_improve_s[i] >= cfg.early_stopping:
                continue  # cell already stopped; state frozen by the mask
            current = pert_wer[i] if cfg.attack_mode == "targeted" else pert_ctc[i]
            if scoring.is_better(current, best_score_s[i], cfg.attack_mode):
                no_improve_s[i] = 0
                best_score_s[i] = current
                best_epoch_s[i] = epoch
                best_p_s[i] = p_host[i]
                checkpoint.save_perturbation(
                    os.path.join(cell_dirs[i], "perturbation.npy"), p_host[i]
                )
            else:
                no_improve_s[i] += 1
            hist_i = {k: [float(v[i]) for v in history[k]] for k in history_keys}
            with open(os.path.join(cell_dirs[i], "metrics.jsonl"), "a") as f:
                f.write(json.dumps({
                    "epoch": epoch, "train_ctc": hist_i["train_ctc"][-1],
                    "train_wer": hist_i["train_wer"][-1],
                    "eval_clean_ctc": clean_eval[0], "eval_clean_wer": clean_eval[1],
                    "eval_pert_ctc": float(pert_ctc[i]),
                    "eval_pert_wer": float(pert_wer[i]),
                    "lr": optimizers.step_lr(cfg, epoch),
                }) + "\n")
            w = _tb(i)
            if w is not None:
                w.scalars({
                    "train/ctc": hist_i["train_ctc"][-1],
                    "train/wer": hist_i["train_wer"][-1],
                    "eval/clean_ctc": clean_eval[0],
                    "eval/clean_wer": clean_eval[1],
                    "eval/pert_ctc": float(pert_ctc[i]),
                    "eval/pert_wer": float(pert_wer[i]),
                    "train/lr": optimizers.step_lr(cfg, epoch),
                }, step=epoch)
                w.flush()
            artifacts.save_json_results(
                cell_dirs[i], norm_type, sizes[i],
                epoch=epoch, finished_training=False,
                eval_score_clean={"ctc": clean_eval[0], "wer": clean_eval[1]},
                eval_score_perturbed={
                    "ctc": scoring.best_agg(hist_i["eval_pert_ctc"], cfg.attack_mode),
                    "wer": scoring.best_agg(hist_i["eval_pert_wer"], cfg.attack_mode),
                },
                train_score={
                    "ctc": scoring.best_agg(hist_i["train_ctc"], cfg.attack_mode),
                    "wer": scoring.best_agg(hist_i["train_wer"], cfg.attack_mode),
                },
                sweep_steps_per_sec=n_cell_steps / wall if (wall and n_cell_steps) else None,
            )

        # written unconditionally WITH every checkpoint: an `only if
        # absent` write would let a stale fingerprint from an earlier
        # aborted run guard a checkpoint of a different configuration
        with open(fp_path, "w") as fh:
            json.dump(fingerprint, fh)
        checkpoint.save_checkpoint(ckpt_path, {
            "p_s": jnp.asarray(p_full), "opt_s": opt_full, "epoch": epoch,
            "best_score_s": best_score_s, "best_p_s": best_p_s,
            "best_epoch_s": best_epoch_s, "no_improve_s": no_improve_s,
            "hist_len_s": hist_len_s,
            "history": {k: np.stack(history[k]) for k in history_keys},
            "clean_eval": np.asarray(
                clean_eval if clean_eval else (np.inf, np.inf), np.float64
            ),
        })
        if np.all(no_improve_s >= cfg.early_stopping):
            log.info("[sweep %s] every cell early-stopped at epoch %d", norm_type, epoch)
            break
    wall = time.perf_counter() - t_start

    # -- finalize: best p per cell on the test split (run_attack.py:185-261)
    best_p_dev = jnp.asarray(best_p_s)
    sweep_eval_full = programs[S][1]  # all S cells, regardless of drops
    test_pert_ctc, test_pert_wer = _evaluate_cells(
        pipe.test, best_p_dev, sweep_eval_full
    )
    test_clean = _evaluate_clean(pipe.test)
    inspected = None
    if getattr(args, "cell_artifacts", False) and args.num_items_to_inspect > 0:
        inspected = _inspect_cells(
            pipe, cfg, params, best_p_s, best_p_dev, clean_eval_step,
            sweep_eval_full, args.num_items_to_inspect,
        )
    norm_summary = []
    for i, size in enumerate(sizes):
        # only the epochs recorded while the cell trained — frozen-p
        # epochs after its early stop are not part of its run
        L = int(hist_len_s[i])
        hist_i = {k: [float(v[i]) for v in history[k][:L]] for k in history_keys}
        artifacts.save_epoch_bundle(cell_dirs[i], best_p_s[i][0], cfg)
        if getattr(args, "cell_artifacts", False):
            # the full per-cell bundle a reference SLURM cell emits from
            # its own `main` (run_attack.py:61-183, save.py:49-199):
            # loss/WER curves with test h-lines, sample-inspection
            # triples, and the perceptual-constraint debug panels
            artifacts.save_loss_plot(
                {"ctc": hist_i["train_ctc"], "wer": hist_i["train_wer"]},
                {"ctc": hist_i["eval_clean_ctc"], "wer": hist_i["eval_clean_wer"]},
                {"ctc": hist_i["eval_pert_ctc"], "wer": hist_i["eval_pert_wer"]},
                cell_dirs[i], norm_type,
                clean_test_loss={"ctc": test_clean[0], "wer": test_clean[1]},
                perturbed_test_loss={
                    "ctc": float(test_pert_ctc[i]),
                    "wer": float(test_pert_wer[i]),
                },
            )
            if inspected is not None:
                artifacts.inspect_samples(
                    cell_dirs[i], inspected[i], cfg.attack_mode, cfg.target,
                    cfg.sr,
                )
            cparams_i = jax.tree.map(lambda x: x[i], cparams_s)
            artifacts.save_debug_plots(
                cell_dirs[i], best_p_s[i], cfg, cparams_i, tables, tag="final"
            )
        artifacts.save_json_results(
            cell_dirs[i], norm_type, size,
            epoch=int(best_epoch_s[i]), finished_training=True,
            best_epoch=int(best_epoch_s[i]),
            best_train_score={
                "ctc": scoring.best_agg(hist_i["train_ctc"], cfg.attack_mode),
                "wer": scoring.best_agg(hist_i["train_wer"], cfg.attack_mode),
            },
            eval_score_clean={"ctc": test_clean[0], "wer": test_clean[1]},
            eval_score_perturbed={"ctc": float(test_pert_ctc[i]), "wer": float(test_pert_wer[i])},
            final_test_clean={"ctc": test_clean[0], "wer": test_clean[1]},
            final_test_perturbed={"ctc": float(test_pert_ctc[i]), "wer": float(test_pert_wer[i])},
            sweep_steps_per_sec=n_cell_steps / wall if (wall and n_cell_steps) else None,
        )
        norm_summary.append({
            "size": float(size),
            "best_epoch": int(best_epoch_s[i]),
            "best_eval_score": float(best_score_s[i]),
            "best_eval_pert_ctc": scoring.best_agg(hist_i["eval_pert_ctc"], cfg.attack_mode),
            "best_eval_pert_wer": scoring.best_agg(hist_i["eval_pert_wer"], cfg.attack_mode),
            "final_ctc": hist_i["train_ctc"][-1] if hist_i["train_ctc"] else None,
            "test_clean_ctc": test_clean[0], "test_clean_wer": test_clean[1],
            "test_pert_ctc": float(test_pert_ctc[i]),
            "test_pert_wer": float(test_pert_wer[i]),
            "dir": cell_dirs[i],
        })
        w = _tb(i)
        if w is not None:
            w.scalars({
                "test/clean_ctc": test_clean[0], "test/clean_wer": test_clean[1],
                "test/pert_ctc": float(test_pert_ctc[i]),
                "test/pert_wer": float(test_pert_wer[i]),
            }, step=int(best_epoch_s[i]))
            w.close()
    # The finished norm's checkpoint is KEPT: if a multi-norm sweep is
    # preempted during a LATER norm, the requeued run resumes this norm
    # past its final epoch and goes straight to finalize instead of
    # retraining from scratch. The fingerprint guard (above) still
    # refuses stale state under a changed config, and --no_resume
    # discards it for a deliberate fresh start.
    return {
        "cells": norm_summary,
        # ACTIVE-cell steps only: frozen (early-stopped) cells are not
        # live throughput even while the masked program still carries them
        "cell_steps_per_sec": n_cell_steps / wall if (wall and n_cell_steps) else None,
        "n_cell_steps": n_cell_steps,
        # cell counts the train program was (re)compiled for — a second
        # entry < S means the late-sweep drop actually engaged
        "programs_built": sorted(programs),
        "mesh": f"(sweep={n_sweep}, data={n_dev // n_sweep})",
    }


def main() -> int:
    args = create_sweep_parser().parse_args()
    from paa_tpu.cli.run_attack import setup_jax
    from paa_tpu.train import log_helpers

    root = args.save_root or os.path.join(os.getcwd(), "logs")
    os.makedirs(root, exist_ok=True)
    log = log_helpers.setup_logging(root, log_name="sweep.log")
    # Fail fast when the accelerator is unreachable (down TPU tunnel =
    # infinite hang at the first device op) — see runtime.maybe_probe.
    # A probe failure leaves a machine-readable marker (the per-cell
    # results.json never got written, so drivers need SOMETHING) and
    # exits 1, mirroring run_attack's failure contract.
    from paa_tpu import runtime

    try:
        runtime.maybe_probe(
            args.platform, getattr(args, "device_probe_timeout", 0), log=log
        )
    except RuntimeError as e:
        log.error("device probe failed: %s", e)
        with open(os.path.join(root, "sweep_failure.json"), "w") as f:
            json.dump({"finished_training": False, "error": str(e)}, f, indent=2)
        return 1
    setup_jax(args.platform)
    run_sweep(args)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
