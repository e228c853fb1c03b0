"""Per-layer feature-extractor breakdown + roofline (VERDICT r3 weak #1).

The round-3 re-profile showed the FE bucket (fwd + remat replay + bwd)
at ~90-100 ms of a 241 ms step — the largest device-time bucket — at an
effective ~99 TF/s for its ≈9.4 TFLOP, without a per-layer account of
where that time goes or an argument that it is the floor.

This tool measures each conv layer directly: it times cumulative FE
PREFIXES (layers 0..i) — forward, and forward + backward-to-the-INPUT
(`jax.grad` w.r.t. the waveform builds only the dgrad chain, which is
exactly the attack step's FE backward: the model is frozen and p's
gradient flows through the FE input, attack/step.py; no wgrad exists) —
then differences successive prefixes into per-layer costs. Prefix
differencing is robust to XLA fusing the norm/GELU epilogues into the
convs (a standalone per-layer timing would miss cross-layer fusion).

For each layer it also prints the analytic roofline: conv FLOPs vs the
v5e MXU bf16 peak, and minimum HBM traffic (read input once, write
output once, + the f32 norm statistics passes on layer 0) vs HBM peak —
so "this layer runs at X% of its own bound" is a statement, not a vibe.

Usage: python tools/profile_fe.py [--batch 64] [--audio_len 160000]
Prints a table to stderr and one JSON line to stdout.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e peaks (public spec): 197 TF/s bf16, 819 GB/s HBM
PEAK_TFLOPS = 197.0
PEAK_GBPS = 819.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--audio_len", type=int, default=160000)
    ap.add_argument("--model", default="wav2vec2-base")
    ap.add_argument("--conv_impl", default=None,
                    help="override cfg.conv_impl (e.g. 'hybrid' to A/B "
                         "the phase-matmul backward)")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--platform", default=None, choices=[None, "tpu", "cpu"])
    ap.add_argument("--probe_timeout", type=float, default=900.0)
    args = ap.parse_args()

    from paa_tpu import runtime

    runtime.maybe_probe(args.platform, args.probe_timeout)
    runtime.configure()
    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from paa_tpu.models import wav2vec2

    overrides = {"conv_impl": args.conv_impl} if args.conv_impl else {}
    base = wav2vec2.get_config(args.model, compute_dtype="bfloat16", **overrides)
    B, T = args.batch, args.audio_len
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32) * 0.1)

    def timed(fn, *a):
        out = fn(*a)
        _ = float(jnp.sum(out if isinstance(out, jnp.ndarray) else out[0]))
        t0 = time.perf_counter()
        for _i in range(args.iters):
            out = fn(*a)
        _ = float(jnp.sum(out if isinstance(out, jnp.ndarray) else out[0]))
        return 1000.0 * (time.perf_counter() - t0) / args.iters

    n_layers = len(base.conv_dim)
    fwd_ms, both_ms = [], []
    for i in range(n_layers):
        cfg_i = dataclasses.replace(
            base,
            conv_dim=tuple(base.conv_dim[: i + 1]),
            conv_kernel=tuple(base.conv_kernel[: i + 1]),
            conv_stride=tuple(base.conv_stride[: i + 1]),
        )
        fe = wav2vec2.FeatureExtractor(cfg_i)
        params = fe.init(jax.random.PRNGKey(0), audio[:1, :4000])["params"]
        params = jax.tree.map(lambda x: jnp.asarray(x), params)

        fwd = jax.jit(lambda prm, a: jnp.sum(
            fe.apply({"params": prm}, a).astype(jnp.float32)))
        # the attack's VJP: gradient w.r.t. the WAVEFORM only (the model
        # is frozen; p's grad flows through the FE input, attack/step.py)
        grad_in = jax.jit(jax.grad(
            lambda a, prm: jnp.sum(fe.apply({"params": prm}, a).astype(jnp.float32))
        ))
        fwd_ms.append(timed(fwd, params, audio))
        both_ms.append(timed(grad_in, audio, params))
        print(f"# prefix 0..{i}: fwd {fwd_ms[-1]:.1f} ms | "
              f"fwd+dgrad {both_ms[-1]:.1f} ms", file=sys.stderr)

    # per-layer = prefix difference
    rows = []
    t_in = T
    c_in = 1
    print(f"\n# per-layer (B={B}, T={T}, bf16) — prefix differences",
          file=sys.stderr)
    print("# layer  k  s  C_in->C_out  T_out    fwd_ms  fwd+dgrad_ms  "
          "conv_GFLOP  roofline_ms(fwd)  note", file=sys.stderr)
    for i in range(n_layers):
        k, s, c_out = base.conv_kernel[i], base.conv_stride[i], base.conv_dim[i]
        t_out = (t_in - k) // s + 1
        f_ms = fwd_ms[i] - (fwd_ms[i - 1] if i else 0.0)
        b_ms = both_ms[i] - (both_ms[i - 1] if i else 0.0)
        gflop = 2.0 * B * t_out * k * c_in * c_out / 1e9
        # min HBM traffic (bf16): read in, write out; L0 group-norm adds
        # one extra read+write of the f32-normalized buffer (fused stats)
        bytes_min = 2.0 * B * (t_in * c_in + t_out * c_out)
        if i == 0 and base.feat_extract_norm == "group":
            bytes_min += 2.0 * 2.0 * B * t_out * c_out
        mxu_ms = gflop / PEAK_TFLOPS  # GFLOP / (TF/s) = ms
        hbm_ms = bytes_min / (PEAK_GBPS * 1e6)
        roof = max(mxu_ms, hbm_ms)
        bound = "MXU" if mxu_ms >= hbm_ms else "HBM"
        rows.append({
            "layer": i, "k": k, "s": s, "c_in": c_in, "c_out": c_out,
            "t_out": t_out, "fwd_ms": round(f_ms, 2),
            "fwd_dgrad_ms": round(b_ms, 2), "conv_gflop": round(gflop, 1),
            "roofline_fwd_ms": round(roof, 2), "bound": bound,
            "pct_of_roofline_fwd": (
                round(100.0 * roof / f_ms, 1) if f_ms > 0 else None
            ),
        })
        print(f"#   {i}   {k:2d} {s:2d}  {c_in:4d}->{c_out:4d} {t_out:7d} "
              f"{f_ms:8.2f} {b_ms:12.2f} {gflop:10.1f} {roof:16.2f}  "
              f"{bound}-bound", file=sys.stderr)
        t_in, c_in = t_out, c_out

    out = {
        "metric": (f"FE per-layer profile ({args.model}, B={B}, "
                   f"{T/16000:.0f}s, bf16, conv_impl={base.conv_impl})"),
        "backend": jax.default_backend(),
        "fe_total_fwd_ms": round(fwd_ms[-1], 1),
        "fe_total_fwd_dgrad_ms": round(both_ms[-1], 1),
        "layers": rows,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
