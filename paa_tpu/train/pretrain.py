"""In-repo CTC pretraining — produce a model that actually transcribes.

The attack framework trains only the perturbation ``p`` against a FROZEN
ASR model (reference: src/training_utils/train.py:103-182); the
reference obtains that model pretrained from the HF hub
(src/training_utils/build.py:225-231). This environment is zero-egress,
so every recorded WER has been 1.0 — random-init weights transcribe
nothing, making the quality axis (clean vs perturbed WER, targeted
emission, sus-sample routing) vacuous.

This module closes that gap without network access: the synthetic
corpus maps each word to a deterministic chirp (data/synthetic.py — by
design "a CTC model can in principle learn them"), so a small
Wav2Vec2-CTC model trained here with Adam on the MODEL parameters
reaches low greedy-decode WER on held-out synthetic speech. The trained
weights export as a standard HF-layout ``model.safetensors``
(models/convert.export_hf_state_dict) which ``--checkpoint_path``
ingests torch-free — from there every quality experiment the reference
publishes (clean vs perturbed WER per constraint, targeted attacks)
runs end-to-end with meaningful numbers.

TPU notes: the train step is ONE jitted program (forward, CTC, grads
over the whole param tree, optax update); batches are fixed-shape so
nothing retraces; the tiny model runs float32 (MXU-friendly shapes
matter less than numeric headroom when training from scratch).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from paa_tpu.data import datasets, pipeline as pipeline_lib
from paa_tpu.models import checkpoint_io, convert, wav2vec2
from paa_tpu.ops import ctc as ctc_ops, text as text_ops, wer as wer_ops

logger = logging.getLogger("paa_tpu")


@dataclasses.dataclass(frozen=True)
class PretrainConfig:
    """Knobs for the synthetic-corpus CTC trainer."""

    model: str = "wav2vec2-tiny"
    steps: int = 4000
    batch_size: int = 32
    lr: float = 3e-4
    warmup_steps: int = 300
    grad_clip: float = 1.0
    seed: int = 5
    eval_every: int = 250
    synthetic_samples: int = 2048
    # stop as soon as held-out WER reaches this (best params are kept
    # regardless; this only saves wall-clock)
    target_wer: float = 0.05


def make_optimizer(cfg: PretrainConfig) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.lr,
        warmup_steps=cfg.warmup_steps,
        decay_steps=max(cfg.steps, cfg.warmup_steps + 1),
        end_value=cfg.lr * 0.1,
    )
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adam(schedule),
    )


def make_pretrain_step(model: wav2vec2.Wav2Vec2ForCTC, tx):
    """One fused XLA program: forward → CTC(mean) → grads(params) → Adam."""

    def loss_fn(params, audio, labels, pads):
        logits = model.apply({"params": params}, audio)
        return ctc_ops.ctc_loss(logits, labels, pads, reduction="mean")

    @jax.jit
    def step(params, opt_state, audio, labels, pads):
        loss, grads = jax.value_and_grad(loss_fn)(params, audio, labels, pads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_logits_fn(model: wav2vec2.Wav2Vec2ForCTC):
    @jax.jit
    def logits_fn(params, audio):
        return model.apply({"params": params}, audio)

    return logits_fn


def evaluate_wer(
    logits_fn, params, split: pipeline_lib.Split, batch_size: int
) -> tuple[float, float]:
    """Greedy-decode WER + mean per-utterance CTC over a split."""
    preds: list[str] = []
    refs: list[str] = []
    ctc_vals: list[float] = []
    for batch in split.batches(batch_size):
        logits = logits_fn(params, batch.audio)
        w = np.asarray(batch.weights) > 0
        ids = np.asarray(ctc_ops.greedy_ids(logits))[w]
        preds.extend(t.lower() for t in text_ops.decode_batch(ids))
        refs.extend(split.texts[i] for i in np.asarray(batch.indices)[w])
        per_ex = ctc_ops.ctc_loss(
            logits, jnp.asarray(batch.labels), jnp.asarray(batch.label_paddings),
            reduction="none",
        )
        ctc_vals.extend(float(v) for v in np.asarray(per_ex)[w])
    return wer_ops.wer(preds, refs), float(np.mean(ctc_vals)) if ctc_vals else float("inf")


def pretrain(
    cfg: PretrainConfig,
    pipe: pipeline_lib.DataPipeline | None = None,
) -> tuple[dict, dict]:
    """Train a CTC model on the synthetic corpus.

    Returns ``(best_params, history)`` where ``history`` carries the
    loss/WER curves and the final held-out metrics.
    """
    if pipe is None:
        samples = datasets.load_dataset_tuples(
            "synthetic", seed=cfg.seed, synthetic_samples=cfg.synthetic_samples
        )
        pipe = pipeline_lib.build_pipeline(samples, seed=cfg.seed)
    logger.info(
        "pretrain corpus: train=%d eval=%d test=%d audio_len=%d",
        len(pipe.train), len(pipe.eval), len(pipe.test), pipe.audio_len,
    )

    mcfg = wav2vec2.get_config(cfg.model)
    model = wav2vec2.Wav2Vec2ForCTC(mcfg)
    params = wav2vec2.init_params(mcfg, seed=cfg.seed)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    step_fn = make_pretrain_step(model, tx)
    logits_fn = make_logits_fn(model)

    history: dict = {"step": [], "loss": [], "eval_step": [], "eval_wer": [],
                     "eval_ctc": []}
    best_wer = float("inf")
    best_params = params
    step_idx = 0
    epoch = 0
    t0 = time.perf_counter()
    done = False
    while step_idx < cfg.steps and not done:
        rng = np.random.default_rng((cfg.seed, epoch))
        for batch in pipe.train.batches(
            cfg.batch_size, shuffle_rng=rng, drop_remainder=True
        ):
            params, opt_state, loss = step_fn(
                params, opt_state, batch.audio,
                jnp.asarray(batch.labels), jnp.asarray(batch.label_paddings),
            )
            step_idx += 1
            if step_idx % 50 == 0 or step_idx == 1:
                lv = float(loss)
                history["step"].append(step_idx)
                history["loss"].append(lv)
                logger.info(
                    "step %d/%d | ctc(mean)=%.4f | %.1f s",
                    step_idx, cfg.steps, lv, time.perf_counter() - t0,
                )
            if step_idx % cfg.eval_every == 0 or step_idx >= cfg.steps:
                ewer, ectc = evaluate_wer(logits_fn, params, pipe.eval, cfg.batch_size)
                history["eval_step"].append(step_idx)
                history["eval_wer"].append(ewer)
                history["eval_ctc"].append(ectc)
                logger.info("  eval @%d: wer=%.4f ctc=%.2f", step_idx, ewer, ectc)
                if ewer < best_wer:
                    best_wer = ewer
                    best_params = jax.tree.map(np.asarray, params)
                if ewer <= cfg.target_wer or step_idx >= cfg.steps:
                    done = True
                    break
        epoch += 1
    if best_wer == float("inf"):  # steps < eval_every: keep the last params
        best_params = jax.tree.map(np.asarray, params)

    test_wer, test_ctc = evaluate_wer(logits_fn, best_params, pipe.test, cfg.batch_size)
    history["best_eval_wer"] = best_wer
    history["test_wer"] = test_wer
    history["test_ctc"] = test_ctc
    history["wall_sec"] = time.perf_counter() - t0
    logger.info(
        "pretrain done: best eval wer=%.4f | test wer=%.4f ctc=%.2f | %.1f s",
        best_wer, test_wer, test_ctc, history["wall_sec"],
    )
    return best_params, history


def export_checkpoint(params: dict, model_name: str, out_path: str) -> None:
    """Write the trained params as an HF-layout safetensors file readable
    by ``--checkpoint_path`` (models/checkpoint_io.py)."""
    mcfg = wav2vec2.get_config(model_name)
    sd = convert.export_hf_state_dict(params, mcfg)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    checkpoint_io.save_safetensors(out_path, sd)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model", default="wav2vec2-tiny",
                    choices=sorted(wav2vec2.PRESETS))
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--warmup_steps", type=int, default=300)
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument("--eval_every", type=int, default=250)
    ap.add_argument("--synthetic_samples", type=int, default=2048)
    ap.add_argument("--target_wer", type=float, default=0.05)
    ap.add_argument("--out", default="checkpoints/wav2vec2-tiny-synthetic.safetensors",
                    help="HF-layout safetensors output path")
    ap.add_argument("--platform", default=None,
                    help="jax platform pin (tpu/cpu); default = auto")
    ap.add_argument("--device_probe_timeout", type=float, default=20.0)
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    from paa_tpu import runtime

    runtime.maybe_probe(args.platform, args.device_probe_timeout, log=logger)
    runtime.configure()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    logger.info("devices: %s", jax.devices())

    cfg = PretrainConfig(
        model=args.model, steps=args.steps, batch_size=args.batch_size,
        lr=args.lr, warmup_steps=args.warmup_steps, seed=args.seed,
        eval_every=args.eval_every, synthetic_samples=args.synthetic_samples,
        target_wer=args.target_wer,
    )
    params, history = pretrain(cfg)
    export_checkpoint(params, cfg.model, args.out)
    with open(os.path.splitext(args.out)[0] + ".history.json", "w") as f:
        json.dump({"config": dataclasses.asdict(cfg), "history": history}, f, indent=2)
    logger.info("checkpoint written: %s", args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
