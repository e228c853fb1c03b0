"""Benchmark: attack steps/sec on the flagship config, single chip.

Measures the fused attack step — Wav2Vec2-base forward, CTC loss (sum
reduction), grad w.r.t. the universal perturbation, PGD update, and the
Fletcher-Munson psychoacoustic projection — at the reference's production
shape (batch 64 × 10 s of 16 kHz audio), i.e. one full iteration of the
reference hot loop (reference: src/training_utils/train.py:126-180).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/sec", "vs_baseline": N}

Baseline: the reference publishes NO throughput numbers (SURVEY.md §6).
``BASELINE_STEPS_PER_SEC`` is MEASURED on this environment's CPU by
``tools/baseline_torch.py`` (2026-08-17, torch 2.13 CPU): the reference's
eager hot loop — random-init HF Wav2Vec2ForCTC base, clamp, CTC 'sum'
loss, backward to p, PGD sign step, eager scipy Fletcher-Munson
projection round-trip (reference: src/training_utils/train.py:126-180,
src/core/projections.py:104-109) — at 3.74 s/sample fwd+bwd (best
observed over B=2/B=4 probes spanning 3.74-5.64 s/sample) ⇒ 239 s/step
at B=64×10 s on 1 CPU ⇒ 0.0042 steps/s, doubled to 0.0084 assuming
PERFECT scaling to the
reference's 2-CPU SLURM allocation (submit_scan_range.py:53-55; every
rounding here favors the baseline; per-batch tokenize/decode/WER cost
omitted entirely). The reference's actual runs used an A40 GPU — no A40
exists here to measure, so the prior engineering estimate (~0.5 steps/s:
≈25% MFU TF32 fwd+bwd + CPU interp/decode) is retained as the separate
``vs_a40_estimate`` field and a labeled row in docs/PERF.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_STEPS_PER_SEC = 0.0084  # measured, tools/baseline_torch.py
A40_ESTIMATE_STEPS_PER_SEC = 0.5  # engineering estimate, docs/PERF.md
# The reference baseline ran at B=64, so its samples/sec on this host's
# CPU pair is 64 × 0.0084 — the denominator for the CPU-fallback mode.
BASELINE_SAMPLES_PER_SEC = 64 * BASELINE_STEPS_PER_SEC

B = int(os.environ.get("BENCH_BATCH", "64"))
T = int(os.environ.get("BENCH_AUDIO_LEN", "160000"))  # 10 s @ 16 kHz
NORM = os.environ.get("BENCH_NORM", "fletcher_munson")
STEPS = int(os.environ.get("BENCH_STEPS", "20"))
# timed windows of STEPS steps each; the reported value is the BEST
# window (steady-state capability; guards against transient tunnel/chip
# degradation — see docs/PERF.md round-3 tail note)
WINDOWS = int(os.environ.get("BENCH_WINDOWS", "3"))
# Memory/compute strategy at the production batch (16 GB HBM), measured
# on one v5e chip (docs/PERF.md): monolithic accum=1 — the lean-residual
# custom VJPs (gelu/LayerNorm) plus the transpose-free fused attention
# kernel freed enough HBM that the full B=64 step fits (4.08 steps/s vs
# 3.99 at accum=2); encoder remat with save_cheap; FE remat on (measured
# free: the conv-stack recompute hides under the backward). lv60 needs
# BENCH_ACCUM>=2.
REMAT = os.environ.get("BENCH_REMAT", "1") == "1"
ACCUM = int(os.environ.get("BENCH_ACCUM", "1"))
# None → "fused" on TPU, "xla" on CPU (the Pallas kernel is TPU-only)
ATTN = os.environ.get("BENCH_ATTN")
REMAT_FE = os.environ.get("BENCH_REMAT_FE", "1") == "1"
FE_SAVE = int(os.environ.get("BENCH_FE_SAVE_LAYERS", "0"))
REMAT_POLICY = os.environ.get("BENCH_REMAT_POLICY", "save_cheap")
PALLAS_FM = os.environ.get("BENCH_PALLAS_FM")  # default: on unless CPU backend
OPT = os.environ.get("BENCH_OPT", "pgd")  # "pgd" | "adam"
MODEL = os.environ.get("BENCH_MODEL", "wav2vec2-base")
# frozen-kernel HBM storage; default bf16 = bit-identical under the bf16
# compute dtype, half the parameter bytes (docs/PERF.md round 3)
PARAM_STORAGE = os.environ.get("BENCH_PARAM_STORAGE", "bfloat16")
FLASH_BLOCK = int(os.environ.get("BENCH_FLASH_BLOCK", "0"))
REMAT_FFN = os.environ.get("BENCH_REMAT_FFN", "0") == "1"
FUSED_QKV = os.environ.get("BENCH_FUSED_QKV", "0") == "1"
# encoder layer-loop unroll: 1 = rolled scan (default; measured best —
# full unroll REGRESSED to 1.22 steps/s, see docs/PERF.md), 0 = fully
# unrolled, k = partial
UNROLL = int(os.environ.get("BENCH_UNROLL", "1"))
COMPUTE_DTYPE = os.environ.get("BENCH_COMPUTE_DTYPE")  # None → preset (bf16)
FE_GELU = os.environ.get("BENCH_FE_GELU", "auto")  # auto | exact | tanh
CONV_IMPL = os.environ.get("BENCH_CONV_IMPL", "conv")  # conv|hybrid|pairdot|...

# --- TPU-reachability guard -------------------------------------------------
# The TPU arrives over a tunnel that can be DOWN (observed: multi-hour
# outage, 2026-08-18) — in that state any JAX device op hangs forever
# instead of erroring, which would leave the driver's bench run with no
# output at all. Before committing to the device, probe it from a
# SUBPROCESS with a hard timeout (the parent must not touch the backend:
# a hung probe can only be killed from outside). A killed probe re-sticks
# the chip ~8 min, but in that branch we're abandoning the device anyway.
# On probe failure (or a CPU-only backend) the bench re-execs itself on
# the CPU backend at a reduced, labeled shape — an HONEST number against
# the CPU-measured baseline rather than silence.
PROBE_TIMEOUT = int(os.environ.get("BENCH_PROBE_TIMEOUT", "900"))
# The tunnel flaps in windows (observed 2026-08-20/21: device listing ok
# while the first HBM transfer hangs for 15-60 min, then recovers) — so
# one probe window can miss a chip that is back minutes later. Attempt
# the probe this many times before conceding to the CPU fallback.
PROBE_ATTEMPTS = max(1, int(os.environ.get("BENCH_PROBE_ATTEMPTS", "2")))
SKIP_PROBE = os.environ.get("BENCH_SKIP_PROBE", "0") == "1"
CPU_FALLBACK = os.environ.get("BENCH_CPU_FALLBACK", "0") == "1"
CPU_BATCH = int(os.environ.get("BENCH_CPU_BATCH", "2"))
CPU_STEPS = int(os.environ.get("BENCH_CPU_STEPS", "2"))


def _probe_backend() -> "tuple[str | None, str | None]":
    """(backend, error) from a watchdogged subprocess probe — backend is
    None on hang or crash, with the actual cause in error (shared logic:
    paa_tpu.runtime.probe_device)."""
    from paa_tpu.runtime import probe_device

    err = None
    for attempt in range(PROBE_ATTEMPTS):
        try:
            return probe_device(timeout=PROBE_TIMEOUT), None
        except RuntimeError as e:
            err = str(e)
            if attempt + 1 < PROBE_ATTEMPTS:
                print(f"bench.py: probe attempt {attempt + 1}/"
                      f"{PROBE_ATTEMPTS} failed ({err.splitlines()[0][:120]}); "
                      "retrying", file=sys.stderr)
    return None, err


def _reexec_cpu_fallback(reason: str) -> "None":
    print(f"bench.py: {reason}; re-running on the CPU backend at "
          f"B={CPU_BATCH} (labeled fallback)", file=sys.stderr)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["BENCH_CPU_FALLBACK"] = "1"
    # first line of the reason, machine-readable in the fallback JSON
    env["BENCH_FALLBACK_REASON"] = reason.splitlines()[0][:200]
    env["BENCH_BATCH"] = str(CPU_BATCH)
    env["BENCH_STEPS"] = str(CPU_STEPS)
    env["BENCH_ATTN"] = "xla"          # Pallas kernels are TPU-only
    env["BENCH_PALLAS_FM"] = "0"
    env["BENCH_PARAM_STORAGE"] = "float32"  # bf16 is a de-opt on CPU
    env["BENCH_COMPUTE_DTYPE"] = "float32"
    env["BENCH_WINDOWS"] = "1"  # CPU steps are slow; one window suffices
    sys.stdout.flush()
    os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)], env)


def main() -> int:
    platforms = os.environ.get("JAX_PLATFORMS", "")
    pin_cpu = CPU_FALLBACK or "cpu" in platforms
    if not pin_cpu and not SKIP_PROBE:
        backend, err = _probe_backend()
        if backend is None:
            _reexec_cpu_fallback(f"device probe failed: {err}")
            return 1  # unreachable (execve), keeps type checkers honest
        if backend == "cpu":
            _reexec_cpu_fallback("no accelerator visible (backend=cpu)")
            return 1

    from paa_tpu import runtime

    runtime.configure()
    import jax

    if pin_cpu:
        # The container's sitecustomize force-registers the TPU plugin
        # and pins jax_platforms at interpreter start; the env var alone
        # does not win (same pin as tests/conftest.py) — so a user's
        # JAX_PLATFORMS=cpu must ALSO be enforced here or the bench
        # would silently run on (or hang against) the TPU backend.
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from paa_tpu.attack import optimizers, step as attack_step
    from paa_tpu.config import AttackConfig, ConstraintParams
    from paa_tpu.models import wav2vec2
    from paa_tpu.ops import psycho, text

    use_pallas_fm = (
        PALLAS_FM == "1" if PALLAS_FM is not None else jax.default_backend() == "tpu"
    )
    attn = ATTN or ("fused" if jax.default_backend() == "tpu" else "xla")
    cfg = AttackConfig(
        norm_type=NORM, optimizer_type=OPT, lr=1e-4, remat=REMAT,
        accum_steps=ACCUM, use_pallas_fm=use_pallas_fm,
    )
    overrides = dict(
        remat=REMAT, attention_impl=attn,
        remat_feature_extractor=REMAT_FE, remat_policy=REMAT_POLICY,
        remat_fe_save_layers=FE_SAVE,
        encoder_unroll=UNROLL if UNROLL > 0 else 10**9,
        flash_block=FLASH_BLOCK,
        fused_qkv=FUSED_QKV,
        remat_ffn=REMAT_FFN,
        fe_gelu=FE_GELU,
        conv_impl=CONV_IMPL,
    )
    if COMPUTE_DTYPE:
        overrides["compute_dtype"] = COMPUTE_DTYPE
    mcfg = wav2vec2.get_config(MODEL, **overrides)
    params = wav2vec2.init_params(mcfg, example_len=2000)
    if PARAM_STORAGE != "float32":
        # bf16 kernel storage: bit-identical under bf16 compute (kernels
        # are cast in-graph anyway), half the parameter HBM (docs/PERF.md)
        params = wav2vec2.cast_param_storage(params, PARAM_STORAGE)
    model = wav2vec2.Wav2Vec2ForCTC(mcfg)
    apply_fn = lambda prm, a: model.apply({"params": prm}, a)
    tables = psycho.build_tables(cfg)
    cparams = ConstraintParams.create()

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32) * 0.1)
    labels, pads = text.encode_batch(
        ["the quick brown fox jumps over the lazy dog"] * B
    )
    labels, pads = jnp.asarray(labels), jnp.asarray(pads)
    weights = jnp.ones((B,), jnp.float32)
    p = jnp.zeros((1, T), jnp.float32)
    opt = optimizers.init_opt_state(cfg, p)
    train = attack_step.make_train_step(cfg, apply_fn, tables)
    lr = jnp.float32(cfg.lr)

    # Warmup / compile (slow the very first run; persistent-cached after).
    p, opt, m = train(params, p, opt, audio, labels, pads, weights, cparams, lr)
    _ = float(m.ctc_loss)  # force full sync (axon block_until_ready is lazy)

    # Best of WINDOWS timed windows. A single window is at the mercy of
    # transient chip/tunnel degradation — observed 2026-08-18: the first
    # bench after a tunnel outage read 1.478 steps/s where the very next
    # runs read 4.17 (docs/PERF.md). Min-of-N wall time per window is the
    # standard steady-state capability measure; every window is reported
    # so variance stays visible.
    window_rates = []
    for _w in range(max(1, WINDOWS)):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            p, opt, m = train(
                params, p, opt, audio, labels, pads, weights, cparams, lr
            )
        _ = float(m.ctc_loss)
        _ = float(jnp.sum(p))
        dt = (time.perf_counter() - t0) / STEPS
        window_rates.append(1.0 / dt)

    steps_per_sec = max(window_rates)
    if CPU_FALLBACK:
        # Honest degraded mode: the accelerator was unusable at bench
        # time (the exact cause is in "fallback_reason"), so this is the
        # SAME fused program on the host CPU at a reduced batch, compared
        # per-SAMPLE against the CPU-measured eager-torch baseline (same
        # hardware, same comparison basis).
        samples_per_sec = B * steps_per_sec
        print(
            json.dumps(
                {
                    "metric": (
                        f"attack samples/sec, CPU FALLBACK — accelerator "
                        f"unusable at bench time ({MODEL}, B={B}, "
                        f"{T/16000:.0f}s audio, {NORM} {OPT.upper()})"
                    ),
                    "value": round(samples_per_sec, 4),
                    "unit": "samples/sec (CPU)",
                    "vs_baseline": round(
                        samples_per_sec / BASELINE_SAMPLES_PER_SEC, 2
                    ),
                    "baseline_samples_per_sec": BASELINE_SAMPLES_PER_SEC,
                    "baseline_source": (
                        "measured CPU eager hot loop (tools/baseline_torch.py)"
                    ),
                    "fallback_reason": os.environ.get(
                        "BENCH_FALLBACK_REASON", "unrecorded"
                    ),
                    "note": (
                        "for the last on-chip steps/s measurement see "
                        "PARITY.md and docs/PERF.md"
                    ),
                }
            )
        )
        return 0
    print(
        json.dumps(
            {
                "metric": (
                    f"attack steps/sec/chip ({MODEL}, B={B}, {T/16000:.0f}s "
                    f"audio, {NORM} {OPT.upper()}, fused fwd+bwd+project, "
                    f"backend={jax.default_backend()})"
                ),
                "value": round(steps_per_sec, 3),
                "unit": "steps/sec",
                "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 2),
                "baseline_steps_per_sec": BASELINE_STEPS_PER_SEC,
                "baseline_source": "measured CPU eager hot loop (tools/baseline_torch.py)",
                "vs_a40_estimate": round(
                    steps_per_sec / A40_ESTIMATE_STEPS_PER_SEC, 2
                ),
                "windows_steps_per_sec": [round(r, 3) for r in window_rates],
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
