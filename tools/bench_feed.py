"""A/B the three batch feeds on the real chip at past-budget corpus scale.

Round-3 measured the whole-split DeviceCorpus at 3.4× the host feed
(docs/PERF.md) but it caps at 512 MiB/device; reference-scale splits
(30k clips ≈ 19 GB, reference: src/training_utils/build.py:114)
silently reverted to the host feed. data/pipeline.CachedCorpus closes
that gap with a device-resident row cache + host fill of the overflow
(the round-4 winner, 2.44×; a double-buffered streaming super-block
feed was also measured — 0.91×, link-bound on this tunnel — and was
removed in round 5). This tool measures, on one chip, steady-state
ms/step of:

  * host    — per-batch collate + 2-deep device prefetch (the fallback),
  * cached  — CachedCorpus (512 MiB row cache + per-batch miss fill),
  * gather  — whole-split DeviceCorpus (only if it fits; the control)

over a synthetic corpus sized ABOVE the 512 MiB resident budget, with
the production attack step (wav2vec2-base, fletcher_munson PGD) doing
the compute — the same methodology as the round-3 feed A/B. Epoch 1
pays compile and is discarded; epochs 2+ are reported.

Each feed runs in its OWN subprocess: the B=64 program already fills
HBM to the rim, and the axon remote backend frees a finished feed's
buffers lazily — staging the next feed's first block in the same
process hits RESOURCE_EXHAUSTED even though it fits from cold
(measured 2026-08-19). A process per feed makes every measurement
start from identical free-HBM state anyway, which is the fairer A/B.

Usage: python tools/bench_feed.py [--clips 1500] [--batch 64] [--epochs 3]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _with_speedups(results: dict) -> dict:
    """Attach <kind>_speedup_vs_host ratios — the ONE place the derived
    metric is computed, shared by parent and child modes."""
    out = dict(results)
    for k in ("cached", "gather"):
        if "host" in results and k in results:
            out[f"{k}_speedup_vs_host"] = round(
                results["host"]["ms_per_step"] / results[k]["ms_per_step"], 2
            )
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=1600,
                    help="synthetic corpus size (1600 → ~900-clip train split "
                         "≈ 560 MB staged, past the 512 MiB resident budget)")
    ap.add_argument("--words", type=int, nargs=2, default=(20, 23),
                    help="synthetic words-per-clip range; (20,23) collates to "
                         "~156k samples ≈ the production 10 s shape — longer "
                         "clips inflate the step program past the HBM head "
                         "room the staged blocks need (measured OOM at 11 s)")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=3,
                    help="timed epochs per feed (epoch 1 of the run pays compile)")
    ap.add_argument("--model", default="wav2vec2-base")
    ap.add_argument("--feeds", default="host,cached",
                    help="comma list of host,cached,gather")
    ap.add_argument("--probe_timeout", type=float, default=900.0)
    ap.add_argument("--platform", default=None, choices=[None, "tpu", "cpu"])
    args = ap.parse_args()

    feeds = [k.strip() for k in args.feeds.split(",") if k.strip()]
    if len(feeds) > 1:
        # parent mode: one subprocess per feed (see module docstring),
        # merge the children's JSON lines into the combined record
        import subprocess

        results = {}
        backend = metric = None
        for kind in feeds:
            argv = [sys.executable, os.path.abspath(__file__),
                    "--feeds", kind]
            for flag, val in (("--clips", args.clips), ("--batch", args.batch),
                              ("--epochs", args.epochs), ("--model", args.model),
                              ("--probe_timeout", args.probe_timeout)):
                argv += [flag, str(val)]
            argv += ["--words", str(args.words[0]), str(args.words[1])]
            if args.platform:
                argv += ["--platform", args.platform]
            r = subprocess.run(argv, text=True, stdout=subprocess.PIPE)
            if r.returncode != 0:
                print(f"# feed {kind} failed (rc={r.returncode})",
                      file=sys.stderr)
                continue
            child = json.loads(r.stdout.strip().splitlines()[-1])
            results[kind] = child[kind]
            backend = child.get("backend", backend)
            metric = child.get("metric")
        out = _with_speedups(results)
        out = {"metric": metric, "backend": backend,
               "process_per_feed": True, **out}
        print(json.dumps(out))
        return 0

    from paa_tpu import runtime

    runtime.maybe_probe(args.platform, args.probe_timeout)
    runtime.configure()
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from paa_tpu.attack import optimizers, step as attack_step
    from paa_tpu.config import AttackConfig, ConstraintParams
    from paa_tpu.data import datasets, pipeline as pipeline_lib
    from paa_tpu.models import wav2vec2
    from paa_tpu.ops import psycho

    cfg = AttackConfig(
        norm_type="fletcher_munson", optimizer_type="pgd", lr=1e-4,
        batch_size=args.batch, model_name=args.model,
        compute_dtype="bfloat16", remat=True,
        use_pallas_fm=jax.default_backend() == "tpu",
    )
    samples = datasets.load_dataset_tuples(
        "synthetic", synthetic_samples=args.clips,
        synthetic_words=tuple(args.words),
    )
    pipe = pipeline_lib.build_pipeline(samples, seed=5)
    split = pipe.train
    split_mb = pipeline_lib.DeviceCorpus.nbytes(split) / 1e6
    print(f"# train split: {len(split)} clips × {pipe.audio_len} samples "
          f"= {split_mb:.0f} MB (budget 512 MiB)", file=sys.stderr)

    mcfg = wav2vec2.get_config(
        args.model, compute_dtype=cfg.compute_dtype, remat=True,
        remat_policy="save_cheap",
    )
    params = wav2vec2.init_params(mcfg, seed=0, example_len=pipe.audio_len)
    params = wav2vec2.cast_param_storage(params, "bfloat16")
    model = wav2vec2.Wav2Vec2ForCTC(mcfg)
    apply_fn = lambda prm, audio: model.apply({"params": prm}, audio)
    tables = psycho.build_tables(cfg)
    cparams = ConstraintParams.create(fm_epsilon=2.0)
    train = attack_step.make_train_step(cfg, apply_fn, tables)
    lr = jnp.float32(cfg.lr)

    def feed_iter(kind, epoch):
        rng = np.random.default_rng((5, epoch))
        if kind == "host":
            return pipeline_lib.prefetch_to_device(
                split.batches(args.batch, shuffle_rng=rng)
            )
        if kind == "cached":
            return feed_iter.cached_corpus.batches(args.batch, shuffle_rng=rng)
        if kind == "gather":
            return feed_iter.gather_corpus.batches(args.batch, shuffle_rng=rng)
        raise ValueError(kind)

    results = {}
    for kind in args.feeds.split(","):
        kind = kind.strip()
        if kind == "cached":
            feed_iter.cached_corpus = pipeline_lib.CachedCorpus(
                split, cache_bytes=512 << 20
            )
        if kind == "gather":
            feed_iter.gather_corpus = pipeline_lib.DeviceCorpus(split)
        p = jnp.zeros((1, pipe.audio_len), jnp.float32)
        opt = optimizers.init_opt_state(cfg, p)
        epoch_ms = []
        for epoch in range(args.epochs + 1):  # +1: epoch 0 pays compile
            n = 0
            t0 = time.perf_counter()
            m = None
            for batch in feed_iter(kind, epoch):
                p, opt, m = train(
                    params, p, opt, batch.audio, batch.labels,
                    batch.label_paddings, batch.weights, cparams, lr,
                )
                n += 1
            _ = float(m.ctc_loss)  # force device sync (axon: block is unreliable)
            dt = time.perf_counter() - t0
            if epoch > 0:
                epoch_ms.append(1000.0 * dt / n)
            print(f"# {kind} epoch {epoch}: {1000.0 * dt / n:.0f} ms/step "
                  f"({n} steps)", file=sys.stderr)
        results[kind] = {
            "ms_per_step_epochs": [round(v, 1) for v in epoch_ms],
            "ms_per_step": round(min(epoch_ms), 1),
        }
        del p, opt
        # drop staged corpora before the next feed claims HBM
        feed_iter.cached_corpus = None
        feed_iter.gather_corpus = None

    out = {
        "metric": (
            f"feed A/B past resident budget ({args.model}, B={args.batch}, "
            f"{pipe.audio_len / 16000:.1f}s audio, {len(split)} clips = "
            f"{split_mb:.0f} MB train split, fletcher_munson PGD)"
        ),
        "backend": jax.default_backend(),
        **_with_speedups(results),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
