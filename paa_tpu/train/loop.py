"""Epoch orchestration: train → eval → track best → early stop → finalize.

The TPU-native rebuild of the reference's ``main`` loop (reference:
src/run_attack.py:13-279) and ``train_epoch`` (src/training_utils/
train.py:103-182):

  * every train batch is one fused XLA step (attack/step.py); metrics come
    back as a scalar + a small int32 id grid, so the host does only WER
    bookkeeping and artifact writing,
  * eval runs clean and perturbed passes per epoch, preserving the
    reference's asymmetries (eval adds ``p`` unclamped; targeted label
    substitution applies to the *loss*, WER is always vs ground truth),
  * best-perturbation tracking on pert-eval WER (targeted) / CTC
    (untargeted) with early stopping (reference: run_attack.py:149-183),
  * exact preemption resume: p, Adam state, epoch, best score and
    history all checkpointed (train/checkpoint.py).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from paa_tpu.attack import optimizers, step as attack_step
from paa_tpu.config import AttackConfig, ConstraintParams, attack_size_value
from paa_tpu.data import pipeline as pipeline_lib
from paa_tpu.ops import projections, psycho, text as text_ops, wer as wer_ops
from paa_tpu.parallel import mesh as mesh_lib
from paa_tpu.train import artifacts, checkpoint, log_helpers, scoring

logger = logging.getLogger("paa_tpu")


@dataclasses.dataclass
class RunResult:
    best_epoch: int
    test_clean: scoring.Scores
    test_perturbed: scoring.Scores
    perturbation: np.ndarray
    history: dict


def _targeted_labels(
    cfg: AttackConfig, batch_size: int, label_len: int,
    audio_len: int | None = None,
):
    """Targeted label grid: the repeated phrase, padded to at least the
    corpus label width. A phrase needing MORE slots than the corpus
    allocated simply widens the grid — targeted steps always feed these
    labels, so shapes stay consistent (the reference has no such coupling;
    src/core/loss_helpers.py:14-20).

    When ``audio_len`` is given, the widened label is validated against
    the encoder's frame count: a CTC alignment needs one frame per token
    plus one per adjacent duplicate, so an oversized ``--target_reps``
    raises an actionable error instead of producing inf losses on every
    step."""
    texts = text_ops.clean_transcripts(
        text_ops.targeted_texts(cfg.target, cfg.target_reps, batch_size)
    )
    labels, paddings = text_ops.encode_batch(texts, pad_to=label_len)
    if audio_len is not None:
        from paa_tpu.models import wav2vec2

        frames = wav2vec2.get_config(cfg.model_name).feat_extract_output_length(
            audio_len
        )
        row = np.asarray(labels[0])[np.asarray(paddings[0]) < 0.5]
        need = len(row) + int(np.sum(row[1:] == row[:-1]))
        if need > frames:
            raise ValueError(
                f"targeted label ({cfg.target!r} × {cfg.target_reps}) needs "
                f"{need} CTC frames but the model emits only {frames} for "
                f"{audio_len}-sample audio — every step's loss would be "
                "inf. Reduce --target_reps or shorten --target."
            )
    return labels, paddings


def _truncate_metrics(path: str, start_epoch: int) -> None:
    """Keep only metrics.jsonl lines with epoch < start_epoch (idempotent
    epoch stream across resumes; unparseable lines are dropped)."""
    if not os.path.exists(path):
        return
    if start_epoch <= 0:
        os.remove(path)
        return
    kept = []
    with open(path) as f:
        for line in f:
            try:
                if json.loads(line).get("epoch", start_epoch) < start_epoch:
                    kept.append(line)
            except json.JSONDecodeError:
                pass
    with open(path, "w") as f:
        f.writelines(kept)


def _batch_wer(
    ids: np.ndarray, ref_texts: list[str]
) -> tuple[float, list[str]]:
    """One decode+normalize path for train AND eval WER (returns the
    normalized predictions so eval can reuse them for inspection)."""
    preds = [p.lower() for p in text_ops.decode_batch(ids)]
    refs = [r.lower() for r in ref_texts]
    return wer_ops.wer(preds, refs), preds


class AttackRunner:
    """Holds compiled steps + psychoacoustic tables for one config."""

    def __init__(
        self,
        cfg: AttackConfig,
        apply_fn,
        model_params,
        pipe: pipeline_lib.DataPipeline,
        cparams: ConstraintParams | None = None,
        use_mesh: bool = True,
    ):
        self.cfg = cfg
        self.pipe = pipe
        self.cparams = cparams if cparams is not None else ConstraintParams.create()
        self.tables = psycho.build_tables(cfg)
        self.model_params = model_params
        n_dev = len(jax.devices())
        if use_mesh and cfg.tp > 1:
            # Model-axis validation BEFORE the mesh is built; the device/
            # batch divisibility checks live in decide_mesh itself (the
            # single error site, shared with load_model_bundle).
            from paa_tpu.models import wav2vec2
            from paa_tpu.parallel import tp as tp_lib

            tp_lib.check_model_axis(wav2vec2.get_config(cfg.model_name), cfg.tp)
        # ONE home for the mesh choice (shared with the model's manual
        # attention region via cli/run_attack.load_model_bundle — the two
        # must never disagree, parallel/mesh.py:decide_mesh).
        self.mesh = mesh_lib.decide_mesh(cfg.tp, cfg.batch_size) if use_mesh else None
        mesh = self.mesh
        if mesh is not None and "model" in mesh.axis_names:
            # dp×tp: the encoder's weights AND activation slices divide
            # over the ``model`` axis (parallel/tp.py Megatron layout) —
            # what lets lv60 ride big batches on small-HBM chips. The
            # reference's only scale-out is one whole model per GPU
            # (submit_scan_range.py:52-66).
            from paa_tpu.parallel import tp as tp_lib

            psh = tp_lib.param_shardings(model_params, mesh)
            self.model_params = tp_lib.shard_params(
                model_params, mesh, shardings=psh
            )
            self.train_step = attack_step.make_sharded_step(
                cfg, apply_fn, self.tables, mesh, params_sharding=psh
            )
            self.eval_step = attack_step.make_sharded_eval_step(
                cfg, apply_fn, mesh, params_sharding=psh
            )
            logger.info(
                "dp×tp mesh: data=%d × model=%d over %d devices",
                n_dev // cfg.tp, cfg.tp, n_dev,
            )
        elif mesh is not None:
            self.train_step = attack_step.make_sharded_step(
                cfg, apply_fn, self.tables, mesh
            )
            # eval rides the same mesh: clean + perturbed passes shard the
            # batch instead of leaving N-1 chips idle per epoch
            self.eval_step = attack_step.make_sharded_eval_step(cfg, apply_fn, mesh)
            logger.info("data-parallel mesh over %d devices", n_dev)
        else:
            self.train_step = attack_step.make_train_step(cfg, apply_fn, self.tables)
            self.eval_step = attack_step.make_eval_step(cfg, apply_fn)

        # lazy device staging of splits (cfg.cache_data_on_device); on a
        # mesh the corpus rows shard over the data axis
        self._corpus_cache = pipeline_lib.CorpusCache(
            cfg.cache_data_on_device, mesh=self.mesh
        )

        L = pipe.train.labels.shape[1]
        if cfg.attack_mode == "targeted":
            tl, tp = _targeted_labels(cfg, cfg.batch_size, L, audio_len=pipe.audio_len)
            self._tgt_labels, self._tgt_pads = jnp.asarray(tl), jnp.asarray(tp)
        else:
            self._tgt_labels = self._tgt_pads = None

    # -- perturbation lifecycle ------------------------------------------

    def init_perturbation(self, seed: int) -> jnp.ndarray:
        """randn(1, audio_len), projected once at init (reference:
        build.py:288-321). SNR/TV need a clean batch for their budget;
        the reference would crash there (it passes None) — we project
        against the first train batch instead."""
        key = jax.random.PRNGKey(seed)
        p = jax.random.normal(key, (1, self.pipe.audio_len), dtype=jnp.float32)
        clean = None
        if self.cfg.norm_type in ("snr", "tv"):
            first = next(self.pipe.train.batches(self.cfg.batch_size))
            clean = jnp.asarray(first.audio)
        p = projections.perturbation_constraint(
            p, clean, self.cfg, self.cparams, self.tables
        )
        logger.info("Perturbation waveform shape: %s", tuple(p.shape))
        return p

    # -- epochs ------------------------------------------------------------

    def train_epoch(self, p, opt_state, epoch: int, shuffle_rng) -> tuple:
        cfg = self.cfg
        lr = jnp.float32(optimizers.step_lr(cfg, epoch))
        # Steps are dispatched back-to-back; metrics stay as device arrays
        # until the epoch ends (a per-batch float()/np.asarray() would
        # sync the host into every step and stall the dispatch pipeline).
        pending = []
        t0 = time.perf_counter()
        n_steps = 0
        for batch in self._corpus_cache.batches(
            self.pipe.train, cfg.batch_size, shuffle_rng=shuffle_rng
        ):
            labels, pads = batch.labels, batch.label_paddings
            if cfg.attack_mode == "targeted":
                labels, pads = self._tgt_labels, self._tgt_pads
            p, opt_state, m = self.train_step(
                self.model_params, p, opt_state, batch.audio, labels, pads,
                batch.weights, self.cparams, lr,
            )
            pending.append((m, pipeline_lib.host_mask(batch), batch.indices))
            n_steps += 1
        # force a device→host scalar before reading the clock: plain
        # block_until_ready is unreliable on the tunneled axon platform
        if pending:
            _ = float(pending[-1][0].ctc_loss)
        wall = time.perf_counter() - t0
        # raw per-batch sums averaged over batches, exactly as the
        # reference aggregates (train.py:146, :182)
        ctc_scores, wer_scores = [], []
        for m, w, indices in pending:
            ctc_scores.append(float(m.ctc_loss))
            ref = [self.pipe.train.texts[i] for i in np.asarray(indices)[w]]
            wer_scores.append(_batch_wer(np.asarray(m.greedy_ids)[w], ref)[0])
        avg = lambda v: sum(v) / max(len(v), 1)
        step_time = wall / max(n_steps, 1)
        return p, opt_state, scoring.Scores(avg(ctc_scores), avg(wer_scores)), step_time

    def evaluate(
        self, split: pipeline_lib.Split, p, perturbed: bool,
        return_preds: bool = False,
    ):
        """Reference: src/training_utils/evaluation.py:5-31. Clean pass
        uses p=0; perturbed adds p unclamped. Targeted mode swaps the
        loss labels (get_loss semantics) but WER stays vs ground truth.

        With ``return_preds`` returns ``(Scores, preds)`` where ``preds``
        are the lowercased greedy decodes in split order — the input the
        targeted emission metrics (train/scoring.emission_metrics) read."""
        cfg = self.cfg
        p_eff = p if perturbed else jnp.zeros_like(p)
        pending = []
        for batch in self._corpus_cache.batches(split, cfg.batch_size):
            labels, pads = batch.labels, batch.label_paddings
            if cfg.attack_mode == "targeted":
                labels, pads = self._tgt_labels, self._tgt_pads
            m = self.eval_step(
                self.model_params, p_eff, batch.audio, labels, pads, batch.weights
            )
            pending.append((m, pipeline_lib.host_mask(batch), batch.indices))
        # reference averages per-batch sums (smaller final batch
        # contributes its smaller sum) — reproduce exactly; metrics are
        # materialized only after every step is dispatched
        ctc_scores, wer_scores, preds = [], [], []
        for m, w, indices in pending:
            ctc_scores.append(float(m.ctc_loss))
            ref = [split.texts[i] for i in np.asarray(indices)[w]]
            batch_wer, batch_preds = _batch_wer(np.asarray(m.greedy_ids)[w], ref)
            wer_scores.append(batch_wer)
            if return_preds:
                preds.extend(batch_preds)
        avg = lambda v: sum(v) / len(v) if v else float("inf")
        scores = scoring.Scores(avg(ctc_scores), avg(wer_scores))
        return (scores, preds) if return_preds else scores

    def inspect_samples(self, p, num_items: int, seed: int = 0) -> list[dict]:
        """Random test samples: clean/perturbed audio + prediction triple
        (reference: save.py:49-101). ``num_items`` is bounded only by the
        test split — batches beyond ``batch_size`` run extra eval steps
        (the reference samples the test set freely, save.py:59)."""
        split = self.pipe.test
        rng = np.random.default_rng(seed)
        n = min(num_items, len(split))
        idx = rng.choice(len(split), size=n, replace=False)
        p_np = np.asarray(p)[0]
        out = []
        for start in range(0, n, self.cfg.batch_size):
            batch = split.collate(idx[start : start + self.cfg.batch_size], self.cfg.batch_size)
            w = np.asarray(batch.weights) > 0
            clean_m = self.eval_step(
                self.model_params, jnp.zeros_like(p), batch.audio, batch.labels,
                batch.label_paddings, batch.weights,
            )
            pert_m = self.eval_step(
                self.model_params, p, batch.audio, batch.labels,
                batch.label_paddings, batch.weights,
            )
            clean_preds = text_ops.decode_batch(np.asarray(clean_m.greedy_ids))
            pert_preds = text_ops.decode_batch(np.asarray(pert_m.greedy_ids))
            for j in range(self.cfg.batch_size):
                if not w[j]:
                    continue
                row = int(batch.indices[j])
                audio = batch.audio[j]
                out.append(
                    dict(
                        clean=audio,
                        perturbed=np.clip(audio + p_np[: len(audio)], -1, 1),
                        ground_truth=split.texts[row],
                        clean_pred=clean_preds[j].lower(),
                        pert_pred=pert_preds[j].lower(),
                    )
                )
        return out


def run_attack(
    cfg: AttackConfig,
    apply_fn,
    model_params,
    pipe: pipeline_lib.DataPipeline,
    save_dir: str,
    cparams: ConstraintParams | None = None,
    num_items_to_inspect: int = 12,
    resume: bool = True,
    init_p: np.ndarray | None = None,
    debug_plots: bool = False,
    tensorboard: bool = False,
) -> RunResult:
    """Full attack run with best-tracking, early stopping and artifacts
    (reference: src/run_attack.py:13-279). ``init_p`` warm-starts from a
    saved perturbation (the reference's --resume_from, build.py:296-299).
    ``tensorboard`` mirrors the per-epoch metric stream to
    ``save_dir/tb/`` as real event files (train/tb_events.py — the
    integration the reference stubs but never ships, run_attack.py:6)."""
    os.makedirs(save_dir, exist_ok=True)
    runner = AttackRunner(cfg, apply_fn, model_params, pipe, cparams)
    cparams = runner.cparams
    size_str = attack_size_value(cfg, cparams)

    if init_p is not None:
        if init_p.shape[-1] != pipe.audio_len:
            raise ValueError(
                f"Loaded perturbation length {init_p.shape[-1]} != expected {pipe.audio_len}"
            )
        p = jnp.asarray(init_p, dtype=jnp.float32).reshape(1, -1)
    else:
        p = runner.init_perturbation(cfg.seed)
    opt_state = optimizers.init_opt_state(cfg, p)

    history = {
        "train_ctc": [], "train_wer": [],
        "eval_clean_ctc": [], "eval_clean_wer": [],
        "eval_pert_ctc": [], "eval_pert_wer": [],
    }
    targeted = cfg.attack_mode == "targeted"
    if targeted:
        # targeted success signals (paper §4.4's experiment): does the
        # model ever emit the target, and how close is the transcript to
        # the full repeated-target label the loss trains toward?
        history["eval_emission_rate"] = []
        history["eval_wer_to_target"] = []
    start_epoch = 0
    best_epoch = -1
    no_improve = 0
    best_eval_score = scoring.initial_best(cfg.attack_mode)
    best_p = np.asarray(p)

    ckpt_path = os.path.join(save_dir, "attack_state.msgpack")
    pert_path = os.path.join(save_dir, "perturbation.npy")
    template = {
        "p": p, "opt_state": opt_state, "epoch": 0, "best_epoch": -1,
        "no_improve": 0, "best_eval_score": 0.0, "best_p": best_p,
        "history": {k: np.zeros((0,), np.float64) for k in history},
    }
    found, path = checkpoint.discover_resume(save_dir)
    if resume and found:
        state = checkpoint.load_checkpoint(path, template)
        p = jnp.asarray(state["p"])
        opt_state = jax.tree.map(jnp.asarray, state["opt_state"])
        start_epoch = int(state["epoch"]) + 1
        best_epoch = int(state["best_epoch"])
        no_improve = int(state["no_improve"])
        best_eval_score = float(state["best_eval_score"])
        best_p = np.asarray(state["best_p"])
        history = {k: list(np.asarray(v)) for k, v in state["history"].items()}
        logger.info("Resuming from checkpoint: %s (epoch=%d)", path, start_epoch)

    # truncate the metric stream to epochs before the resume point: fresh
    # runs start clean, and a resumed run never duplicates an epoch line
    # (the per-epoch line is written before the checkpoint, so a crash in
    # between would otherwise replay the epoch and append it twice)
    metrics_path = os.path.join(save_dir, "metrics.jsonl")
    _truncate_metrics(metrics_path, start_epoch)
    tb_writer = None
    if tensorboard:
        from paa_tpu.train import tb_events

        # one event file per process; a resumed run appends a new file to
        # the same logdir, which stock TensorBoard merges
        tb_writer = tb_events.EventWriter(os.path.join(save_dir, "tb"))

    clean_eval_cache = None
    step_ms = 0.0
    for epoch in range(start_epoch, cfg.num_epochs):
        if no_improve >= cfg.early_stopping:
            # a checkpoint written at the early-stop epoch resumes here:
            # don't train extra epochs, go straight to finalize
            logger.info("resumed run already early-stopped; finalizing")
            break
        logger.info("starting epoch: %d", epoch)
        # shuffle order is a pure function of (seed, epoch) so a resumed
        # run sees exactly the batch order of an uninterrupted one
        data_rng = np.random.default_rng((cfg.seed, epoch))
        p, opt_state, train_scores, step_time = runner.train_epoch(
            p, opt_state, epoch, shuffle_rng=data_rng
        )
        step_ms = 1000.0 * step_time
        # the clean pass is constant across epochs (p_eff = 0, frozen
        # model, fixed eval order) — evaluate once, reuse thereafter
        if clean_eval_cache is None:
            clean_eval_cache = runner.evaluate(pipe.eval, p, perturbed=False)
        clean = clean_eval_cache
        emis = None
        if targeted:
            pert, pert_preds = runner.evaluate(
                pipe.eval, p, perturbed=True, return_preds=True
            )
            emis = scoring.emission_metrics(pert_preds, cfg.target, cfg.target_reps)
            history["eval_emission_rate"].append(emis["emission_rate"])
            history["eval_wer_to_target"].append(emis["wer_to_target"])
            logger.info(
                "targeted: emission_rate=%.4f wer_to_target=%.4f",
                emis["emission_rate"], emis["wer_to_target"],
            )
        else:
            pert = runner.evaluate(pipe.eval, p, perturbed=True)

        history["train_ctc"].append(train_scores.ctc)
        history["train_wer"].append(train_scores.wer)
        history["eval_clean_ctc"].append(clean.ctc)
        history["eval_clean_wer"].append(clean.wer)
        history["eval_pert_ctc"].append(pert.ctc)
        history["eval_pert_wer"].append(pert.wer)

        log_helpers.log_epoch_metrics(
            epoch, cfg.num_epochs,
            train_ctc=train_scores.ctc, eval_ctc_clean=clean.ctc,
            eval_ctc_perturbed=pert.ctc, train_wer=train_scores.wer,
            eval_wer_clean=clean.wer, eval_wer_perturbed=pert.wer,
            step_time_ms=step_ms,
        )
        # machine-readable metric stream (one JSON line per epoch) — the
        # observability channel the reference stubs but never ships
        # (run_attack.py:6 imports a nonexistent tensor_board_logging)
        with open(metrics_path, "a") as f:
            f.write(json.dumps({
                "epoch": epoch, "train_ctc": train_scores.ctc,
                "train_wer": train_scores.wer, "eval_clean_ctc": clean.ctc,
                "eval_clean_wer": clean.wer, "eval_pert_ctc": pert.ctc,
                "eval_pert_wer": pert.wer, "step_time_ms": step_ms,
                "lr": optimizers.step_lr(cfg, epoch),
                **({"eval_emission_rate": emis["emission_rate"],
                    "eval_wer_to_target": emis["wer_to_target"]}
                   if emis is not None else {}),
            }) + "\n")
        if tb_writer is not None:
            tb_writer.scalars({
                "train/ctc": train_scores.ctc, "train/wer": train_scores.wer,
                "eval/clean_ctc": clean.ctc, "eval/clean_wer": clean.wer,
                "eval/pert_ctc": pert.ctc, "eval/pert_wer": pert.wer,
                "train/step_time_ms": step_ms,
                "train/lr": optimizers.step_lr(cfg, epoch),
                **({"eval/emission_rate": emis["emission_rate"],
                    "eval/wer_to_target": emis["wer_to_target"]}
                   if emis is not None else {}),
            }, step=epoch)
            tb_writer.flush()
        artifacts.save_loss_plot(
            {"ctc": history["train_ctc"], "wer": history["train_wer"]},
            {"ctc": history["eval_clean_ctc"], "wer": history["eval_clean_wer"]},
            {"ctc": history["eval_pert_ctc"], "wer": history["eval_pert_wer"]},
            save_dir, cfg.norm_type,
        )
        artifacts.save_json_results(
            save_dir, cfg.norm_type, size_str,
            epoch=epoch, finished_training=False,
            eval_score_clean={"ctc": clean.ctc, "wer": clean.wer},
            eval_score_perturbed={
                "ctc": scoring.best_agg(history["eval_pert_ctc"], cfg.attack_mode),
                "wer": scoring.best_agg(history["eval_pert_wer"], cfg.attack_mode),
            },
            train_score={
                "ctc": scoring.best_agg(history["train_ctc"], cfg.attack_mode),
                "wer": scoring.best_agg(history["train_wer"], cfg.attack_mode),
            },
            steps_per_sec=(1000.0 / step_ms if step_ms else None),
        )

        current = pert.wer if cfg.attack_mode == "targeted" else pert.ctc
        if scoring.is_better(current, best_eval_score, cfg.attack_mode):
            no_improve = 0
            best_eval_score = current
            best_epoch = epoch
            best_p = np.asarray(p)
            checkpoint.save_perturbation(pert_path, p)
            artifacts.save_epoch_bundle(save_dir, np.asarray(p)[0], cfg)
            if debug_plots:
                artifacts.save_debug_plots(
                    save_dir, np.asarray(p), cfg, cparams, runner.tables,
                    tag=f"epoch{epoch}",
                )
            if num_items_to_inspect > 0:
                artifacts.inspect_samples(
                    save_dir,
                    runner.inspect_samples(p, num_items_to_inspect),
                    cfg.attack_mode, cfg.target, cfg.sr,
                )
        else:
            no_improve += 1

        checkpoint.save_checkpoint(
            ckpt_path,
            {
                "p": p, "opt_state": opt_state, "epoch": epoch,
                "best_epoch": best_epoch, "no_improve": no_improve,
                "best_eval_score": best_eval_score, "best_p": best_p,
                "history": {k: np.asarray(v) for k, v in history.items()},
            },
        )
        if no_improve >= cfg.early_stopping:
            logger.info("No improvements in %d epochs. Stopping early.", no_improve)
            break

    # -- finalize: best p on the test split (reference: run_attack.py:185-261)
    p = jnp.asarray(best_p)
    test_emis = None
    if targeted:
        pert_test, test_preds = runner.evaluate(
            pipe.test, p, perturbed=True, return_preds=True
        )
        clean_test, clean_preds = runner.evaluate(
            pipe.test, p, perturbed=False, return_preds=True
        )
        test_emis = {
            "perturbed": scoring.emission_metrics(
                test_preds, cfg.target, cfg.target_reps
            ),
            # clean emission is the false-positive floor: the target
            # phrase occurring in unattacked transcripts
            "clean": scoring.emission_metrics(
                clean_preds, cfg.target, cfg.target_reps
            ),
        }
        logger.info(
            "targeted test: emission_rate=%.4f (clean floor %.4f) "
            "wer_to_target=%.4f",
            test_emis["perturbed"]["emission_rate"],
            test_emis["clean"]["emission_rate"],
            test_emis["perturbed"]["wer_to_target"],
        )
    else:
        pert_test = runner.evaluate(pipe.test, p, perturbed=True)
        clean_test = runner.evaluate(pipe.test, p, perturbed=False)

    artifacts.save_loss_plot(
        {"ctc": history["train_ctc"], "wer": history["train_wer"]},
        {"ctc": history["eval_clean_ctc"], "wer": history["eval_clean_wer"]},
        {"ctc": history["eval_pert_ctc"], "wer": history["eval_pert_wer"]},
        save_dir, cfg.norm_type,
        clean_test_loss={"ctc": clean_test.ctc, "wer": clean_test.wer},
        perturbed_test_loss={"ctc": pert_test.ctc, "wer": pert_test.wer},
    )
    artifacts.save_json_results(
        save_dir, cfg.norm_type, size_str,
        epoch=best_epoch, finished_training=True, best_epoch=best_epoch,
        best_train_score={
            "ctc": scoring.best_agg(history["train_ctc"], cfg.attack_mode),
            "wer": scoring.best_agg(history["train_wer"], cfg.attack_mode),
        },
        eval_score_clean={"ctc": clean_test.ctc, "wer": clean_test.wer},
        eval_score_perturbed={"ctc": pert_test.ctc, "wer": pert_test.wer},
        final_test_clean={"ctc": clean_test.ctc, "wer": clean_test.wer},
        final_test_perturbed={"ctc": pert_test.ctc, "wer": pert_test.wer},
        steps_per_sec=(1000.0 / step_ms if step_ms else None),
        **({"targeted_metrics": test_emis} if test_emis is not None else {}),
    )
    log_helpers.log_summary_metrics(
        norm_type=cfg.norm_type, attack_size_string=str(size_str),
        clean_ctc_test=clean_test.ctc, clean_wer_test=clean_test.wer,
        pert_ctc_test=pert_test.ctc, pert_wer_test=pert_test.wer,
        best_epoch=best_epoch,
    )
    if tb_writer is not None:
        tb_writer.scalars({
            "test/clean_ctc": clean_test.ctc, "test/clean_wer": clean_test.wer,
            "test/pert_ctc": pert_test.ctc, "test/pert_wer": pert_test.wer,
        }, step=best_epoch)
        tb_writer.close()
    return RunResult(
        best_epoch=best_epoch,
        test_clean=clean_test,
        test_perturbed=pert_test,
        perturbation=best_p,
        history=history,
    )
