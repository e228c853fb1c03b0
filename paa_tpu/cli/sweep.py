"""Sweep driver — the TPU-native replacement for SLURM job arrays.

The reference farms the (norm_type × epsilon) grid to sbatch, one GPU per
cell with requeue/resume (reference: submit_scan_range.py:8-143). Here a
sweep is executed *in-process*:

  * all epsilons of one norm type train SIMULTANEOUSLY as a vmapped
    leading axis of one compiled program (attack/step.py:make_sweep_step),
    sharded over the mesh's ``sweep`` axis — one chip per cell on a slice,
    cells sharing chips otherwise;
  * norm types run sequentially (different feasible sets = different
    programs), round-robin-equivalent coverage without a scheduler;
  * per-cell results land in the same per-cell run directories +
    results.json the reference produces, plus a sweep-level summary
    (``sweep_results.json``) replacing the reference's missing
    ``grab_results.py`` aggregator (SURVEY.md §5.5).

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
    return parser


def run_sweep(args) -> dict:
    import jax
    import jax.numpy as jnp

    from paa_tpu.attack import optimizers, step as attack_step
    from paa_tpu.cli import run_attack as run_attack_cli
    from paa_tpu.cli.parser import config_from_args, constraint_params_from_args
    from paa_tpu.config import with_sweep_value, SWEEP_FIELD
    from paa_tpu.data import datasets, pipeline as pipeline_lib
    from paa_tpu.ops import psycho, text as text_ops, wer as wer_ops
    from paa_tpu.parallel import mesh as mesh_lib
    from paa_tpu.train import artifacts, log_helpers, scoring

    log = logging.getLogger("paa_tpu")
    grids = dict(DEFAULT_GRIDS)
    if args.grid:
        grids.update(json.loads(args.grid))
    norms = [n.strip() for n in args.norms.split(",") if n.strip()]
    if args.epochs_per_cell:
        args.num_epochs = args.epochs_per_cell

    # Shared data + model for every cell (the reference re-downloads and
    # re-loads per job).
    samples = datasets.load_dataset_tuples(
        args.dataset, seed=args.seed, data_root=args.data_root,
        small_data=args.small_data, synthetic_samples=args.synthetic_samples,
    )
    pipe = pipeline_lib.build_pipeline(
        samples, relative_audio_length=args.relative_audio_length, seed=args.seed
    )
    _, params, apply_fn = run_attack_cli.load_model_bundle(args)

    n_dev = len(jax.devices())
    summary = {}
    root = args.save_root or os.path.join(os.getcwd(), "logs")

    for norm_type in norms:
        sizes = grids.get(norm_type, [])
        if not sizes:
            continue
        S = len(sizes)
        cfg = config_from_args(args).replace(norm_type=norm_type)
        base_cparams = constraint_params_from_args(args)
        cparams_s = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (S,)), base_cparams
        )
        cparams_s = with_sweep_value(cparams_s, norm_type, np.asarray(sizes, np.float32))

        # max_phon contours are traced per-cell scalars like every other
        # epsilon (ops/psycho.py:phon_contour) — one shared table bundle.
        tables = psycho.build_tables(cfg)

        n_sweep = S if n_dev % S == 0 and S <= n_dev else 1
        mesh = mesh_lib.sweep_mesh(n_sweep=n_sweep, n_devices=n_dev)
        step = attack_step.make_sweep_step(cfg, apply_fn, tables, mesh)
        active = jnp.ones((S,), jnp.float32)

        # init: one projected perturbation per cell
        key = jax.random.PRNGKey(cfg.seed)
        p_s = jax.random.normal(key, (S, 1, pipe.audio_len), dtype=jnp.float32)
        opt_s = jax.vmap(lambda q: optimizers.init_opt_state(cfg, q))(p_s)

        L = pipe.train.labels.shape[1]
        if cfg.attack_mode == "targeted":
            from paa_tpu.train.loop import _targeted_labels

            tgt_labels, tgt_pads = _targeted_labels(cfg, cfg.batch_size, L)
            tgt_labels, tgt_pads = jnp.asarray(tgt_labels), jnp.asarray(tgt_pads)

        data_rng = np.random.default_rng(cfg.seed)
        cell_ctc = [[] for _ in range(S)]
        t_start = time.perf_counter()
        n_steps = 0
        for epoch in range(cfg.num_epochs):
            lr = jnp.float32(optimizers.step_lr(cfg, epoch))
            epoch_losses = []  # device arrays; materialized after the epoch
            for batch in pipeline_lib.prefetch_to_device(
                pipe.train.batches(cfg.batch_size, shuffle_rng=data_rng)
            ):
                labels, pads = batch.labels, batch.label_paddings
                if cfg.attack_mode == "targeted":
                    labels, pads = tgt_labels, tgt_pads
                p_s, opt_s, m = step(
                    params, p_s, opt_s, batch.audio, labels, pads,
                    batch.weights, cparams_s, active, lr,
                )
                epoch_losses.append(m.ctc_loss)
                n_steps += 1
            # average of per-batch sums over ALL batches — the same
            # aggregation as the single-run loop (train/loop.py), not
            # just the final (possibly padded-partial) batch
            losses = np.mean(np.stack([np.asarray(l) for l in epoch_losses]), axis=0)
            for i in range(S):
                cell_ctc[i].append(float(losses[i]))
            log.info("[sweep %s] epoch %d ctc=%s", norm_type, epoch, losses.round(1))
        wall = time.perf_counter() - t_start

        # per-cell final evaluation (clean once + perturbed per cell) + artifacts
        from paa_tpu.train.loop import AttackRunner

        runner = AttackRunner(cfg, apply_fn, params, pipe, base_cparams, use_mesh=False)
        p_np = np.asarray(p_s)
        clean_eval = runner.evaluate(pipe.eval, jnp.zeros((1, pipe.audio_len)), perturbed=False)
        norm_summary = []
        for i, size in enumerate(sizes):
            pert_eval = runner.evaluate(pipe.eval, jnp.asarray(p_np[i]), perturbed=True)
            cell_dir = os.path.join(
                root, cfg.attack_mode, args.dataset,
                f"{norm_type}_{size}_{cfg.attack_mode}_{cfg.optimizer_type}",
            )
            os.makedirs(cell_dir, exist_ok=True)
            np.save(os.path.join(cell_dir, "perturbation.npy"), p_np[i])
            artifacts.save_epoch_bundle(cell_dir, p_np[i][0], cfg)
            artifacts.save_json_results(
                cell_dir, norm_type, size,
                epoch=cfg.num_epochs - 1, finished_training=True,
                train_score={"ctc": scoring.best_agg(cell_ctc[i], cfg.attack_mode)},
                eval_score_clean={"ctc": clean_eval.ctc, "wer": clean_eval.wer},
                eval_score_perturbed={"ctc": pert_eval.ctc, "wer": pert_eval.wer},
                sweep_steps_per_sec=n_steps * S / wall if wall else None,
            )
            norm_summary.append(
                {"size": float(size), "final_ctc": cell_ctc[i][-1],
                 "best_ctc": scoring.best_agg(cell_ctc[i], cfg.attack_mode),
                 "eval_pert_ctc": pert_eval.ctc, "eval_pert_wer": pert_eval.wer,
                 "dir": cell_dir}
            )
        summary[norm_type] = {
            "cells": norm_summary,
            "cell_steps_per_sec": n_steps * S / wall if wall else None,
            "mesh": f"(sweep={n_sweep}, data={n_dev // n_sweep})",
        }

    out_path = os.path.join(root, "sweep_results.json")
    os.makedirs(root, exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    log.info("sweep summary written to %s", out_path)
    return summary


def main() -> int:
    args = create_sweep_parser().parse_args()
    from paa_tpu.cli.run_attack import setup_jax
    from paa_tpu.train import log_helpers

    root = args.save_root or os.path.join(os.getcwd(), "logs")
    os.makedirs(root, exist_ok=True)
    log_helpers.setup_logging(root, log_name="sweep.log")
    setup_jax(args.platform)
    run_sweep(args)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
