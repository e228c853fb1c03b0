"""Profile the consolidated sweep step (see tools/bench_sweep.py for the
config) and print the top device ops — the tool behind the sweep entries
in docs/PERF.md.

Usage: python tools/profile_sweep.py [trace_dir]  (env knobs as bench_sweep)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/paa_sweep_profile"
    steps = 2

    from tools import bench_sweep as bs

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

    S = len(bs.GRID)
    attn = bs.ATTN or ("fused" if jax.default_backend() == "tpu" else "xla")
    cfg = AttackConfig(
        norm_type=bs.NORM, optimizer_type="pgd", lr=1e-4, remat=bs.REMAT,
        accum_steps=bs.ACCUM, use_pallas_fm=jax.default_backend() == "tpu",
    )
    mcfg = wav2vec2.get_config(
        bs.MODEL, remat=bs.REMAT, attention_impl=attn,
        remat_feature_extractor=True, remat_policy="save_cheap",
    )
    params = wav2vec2.init_params(mcfg, example_len=2000)
    model = wav2vec2.Wav2Vec2ForCTC(mcfg)
    apply_fn = lambda prm, a: model.apply({"params": prm}, a)
    tables = psycho.build_tables(cfg)
    n_dev = len(jax.devices())
    n_sweep = S if n_dev % S == 0 and S <= n_dev else 1
    mesh = mesh_lib.sweep_mesh(n_sweep=n_sweep, n_devices=n_dev)
    sweep = attack_step.make_sweep_step(cfg, apply_fn, tables, mesh)

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((bs.B, bs.T)).astype(np.float32) * 0.1)
    labels, pads = text.encode_batch(["the quick brown fox"] * bs.B)
    labels, pads = jnp.asarray(labels), jnp.asarray(pads)
    weights = jnp.ones((bs.B,), jnp.float32)
    cparams_s = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (S,)), ConstraintParams.create()
    )
    cparams_s = with_sweep_value(cparams_s, bs.NORM, np.asarray(bs.GRID, np.float32))
    p_s = jnp.zeros((S, 1, bs.T), jnp.float32)
    opt_s = jax.vmap(lambda q: optimizers.init_opt_state(cfg, q))(p_s)
    active = jnp.ones((S,), jnp.float32)
    lr = jnp.float32(cfg.lr)

    p_s, opt_s, m = sweep(
        params, p_s, opt_s, audio, labels, pads, weights, cparams_s, active, lr
    )
    _ = float(jnp.sum(m.ctc_loss))
    jax.profiler.start_trace(trace_dir)
    for _ in range(steps):
        p_s, opt_s, m = sweep(
            params, p_s, opt_s, audio, labels, pads, weights, cparams_s, active, lr
        )
    _ = float(jnp.sum(m.ctc_loss))
    jax.profiler.stop_trace()

    from tools.profile_step import summarize

    summarize(trace_dir, top=40, steps=steps)


if __name__ == "__main__":
    main()
