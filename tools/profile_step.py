"""Capture + summarize a device profile of the fused attack step.

Runs a few steps of the bench configuration under jax.profiler, parses
the xplane with jax.profiler.ProfileData, and prints the top device ops
by total duration — the tool behind docs/PERF.md's time decomposition.

Usage: python tools/profile_step.py [trace_dir]  (env knobs as bench.py)
"""

from __future__ import annotations

import collections
import glob
import os
import sys


def capture(trace_dir: str) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench  # reuse the bench config/knobs

    import jax

    from paa_tpu import runtime

    runtime.configure()
    import jax.numpy as jnp
    import numpy as np

    from paa_tpu.attack import optimizers, step as attack_step
    from paa_tpu.config import AttackConfig, ConstraintParams
    from paa_tpu.models import wav2vec2
    from paa_tpu.ops import psycho, text

    use_pallas_fm = (
        bench.PALLAS_FM == "1" if bench.PALLAS_FM is not None
        else jax.default_backend() == "tpu"
    )
    cfg = AttackConfig(
        norm_type=bench.NORM, optimizer_type=bench.OPT, lr=1e-4,
        remat=bench.REMAT, accum_steps=bench.ACCUM,
        use_pallas_fm=use_pallas_fm,
    )
    attn = bench.ATTN or ("fused" if jax.default_backend() == "tpu" else "xla")
    mcfg = wav2vec2.get_config(
        bench.MODEL, remat=bench.REMAT, attention_impl=attn,
        remat_feature_extractor=bench.REMAT_FE, remat_policy=bench.REMAT_POLICY,
        remat_fe_save_layers=bench.FE_SAVE,
        encoder_unroll=bench.UNROLL if bench.UNROLL > 0 else 10**9,
        flash_block=bench.FLASH_BLOCK,
        fused_qkv=bench.FUSED_QKV,
        remat_ffn=bench.REMAT_FFN,
    )
    params = wav2vec2.init_params(mcfg, example_len=2000)
    if bench.PARAM_STORAGE != "float32":
        params = wav2vec2.cast_param_storage(params, bench.PARAM_STORAGE)
    model = wav2vec2.Wav2Vec2ForCTC(mcfg)
    apply_fn = lambda prm, a: model.apply({"params": prm}, a)
    tables = psycho.build_tables(cfg)
    cparams = ConstraintParams.create()
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((bench.B, bench.T)).astype(np.float32) * 0.1)
    labels, pads = text.encode_batch(["the quick brown fox"] * bench.B)
    labels, pads = jnp.asarray(labels), jnp.asarray(pads)
    weights = jnp.ones((bench.B,), jnp.float32)
    p = jnp.zeros((1, bench.T), jnp.float32)
    opt = optimizers.init_opt_state(cfg, p)
    train = attack_step.make_train_step(cfg, apply_fn, tables)
    lr = jnp.float32(cfg.lr)

    p, opt, m = train(params, p, opt, audio, labels, pads, weights, cparams, lr)
    _ = float(m.ctc_loss)
    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        p, opt, m = train(params, p, opt, audio, labels, pads, weights, cparams, lr)
    _ = float(m.ctc_loss)
    jax.profiler.stop_trace()


def summarize(trace_dir: str, top: int = 28, steps: int = 3) -> None:
    import jax.profiler as jp

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise SystemExit(f"no xplane under {trace_dir}")
    data = jp.ProfileData.from_serialized_xspace(open(paths[-1], "rb").read())
    per_op = collections.Counter()
    total = 0.0
    for plane in data.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            if "XLA Ops" not in line.name and "xla op" not in line.name.lower():
                continue
            for ev in line.events:
                dur = ev.duration_ns / 1e6 / steps  # ms per step
                per_op[ev.name] += dur
                total += dur
    print(f"device op time: {total:.1f} ms/step over {len(per_op)} distinct ops")
    for name, ms in per_op.most_common(top):
        print(f"{ms:9.3f} ms  {name[:110]}")


if __name__ == "__main__":
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/paa_profile"
    if os.environ.get("PROFILE_SUMMARIZE_ONLY") != "1":
        capture(trace_dir)
    summarize(trace_dir)
