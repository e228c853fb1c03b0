"""AOT per-chip HBM accounting for lv60 on a v5e-8 topology — no slice needed.

docs/PERF.md claims a (data=4, model=2) dp×tp layout on a v5e-8 runs
wav2vec2-large-lv60 MONOLITHIC (accum=1) where the single chip OOMs by a
bisected 230 MB (benchmarks/lv60_r4/). This tool substantiates that with
the XLA compiler's own numbers instead of a projection: it AOT-compiles
the REAL sharded training step (attack/step.make_sharded_step — the same
jit the run uses) against a deviceless `v5e:2x4` topology description
(jax.experimental.topologies) and reads `compiled.memory_analysis()` —
the compiler's per-chip argument/temp/output accounting for that exact
program. Runs entirely on the host: no TPU chip is touched or claimed.

For contrast it also compiles the single-chip (v5e:1x1) monolithic
program whose on-chip attempt produced the OOM, so the report shows both
sides: per-chip demand under dp×tp vs the single-chip demand that
exceeded the 16 GB budget.

Output: benchmarks/lv60_r5/aot_memory.json (plus stdout summary).

Reference capability being replaced: one-whole-model-per-GPU SLURM cells
(reference: submit_scan_range.py:52-66).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

HBM_PER_CHIP = 16 * 1024**3  # v5e


def build_case(mesh, tp: int, batch: int, audio_len: int, accum: int,
               attention_impl: str, conv_impl: str):
    """(jitted step, arg ShapeDtypeStructs) for the production lv60 config."""
    import jax
    import jax.numpy as jnp

    from paa_tpu.attack import optimizers, step as attack_step
    from paa_tpu.config import AttackConfig, ConstraintParams
    from paa_tpu.models import wav2vec2
    from paa_tpu.ops import psycho
    from paa_tpu.parallel import tp as tp_lib

    cfg = AttackConfig(
        norm_type="fletcher_munson", optimizer_type="pgd", lr=1e-4,
        batch_size=batch, remat=True, accum_steps=accum,
        # the Pallas FM kernel needs a real TPU lowering context; the XLA
        # FM path is what the deviceless compile accounts (identical
        # math, ops/projections.py)
        use_pallas_fm=False,
    )
    mcfg = wav2vec2.get_config(
        "wav2vec2-large-lv60",
        remat=True, remat_policy="save_cheap", remat_feature_extractor=True,
        attention_impl=attention_impl, conv_impl=conv_impl,
    )
    model = wav2vec2.Wav2Vec2ForCTC(mcfg)
    apply_fn = lambda prm, a: model.apply({"params": prm}, a)
    tables = psycho.build_tables(cfg)

    # abstract params (f32 init → bf16 kernel storage), no host memory
    params_shape = jax.eval_shape(
        lambda: wav2vec2.cast_param_storage(
            wav2vec2.init_params(mcfg, example_len=4000), "bfloat16"
        )
    )
    psh = tp_lib.param_shardings(params_shape, mesh) if tp > 1 else None
    step = attack_step.make_sharded_step(
        cfg, apply_fn, tables, mesh, params_sharding=psh
    )

    T = audio_len
    sds = lambda shape, dtype: jax.ShapeDtypeStruct(shape, dtype)
    p = sds((1, T), jnp.float32)
    opt = jax.eval_shape(lambda q: optimizers.init_opt_state(cfg, q),
                         sds((1, T), jnp.float32))
    # label geometry as the pipeline pads it (exact length is immaterial
    # to memory at these scales)
    L = 64
    args = (
        params_shape, p, opt,
        sds((batch, T), jnp.float32),           # audio
        sds((batch, L), jnp.int32),             # labels
        sds((batch, L), jnp.float32),           # label paddings
        sds((batch,), jnp.float32),             # weights
        jax.eval_shape(ConstraintParams.create),
        sds((), jnp.float32),                   # lr
    )
    return step, args


def analyze(step, args) -> dict:
    lowered = step.lower(*args)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    fields = {
        k: int(getattr(ma, k))
        for k in ("generated_code_size_in_bytes", "argument_size_in_bytes",
                  "output_size_in_bytes", "alias_size_in_bytes",
                  "temp_size_in_bytes")
    }
    # donated inputs (p, opt_state) alias outputs — do not double count
    peak = (fields["argument_size_in_bytes"] + fields["temp_size_in_bytes"]
            + fields["output_size_in_bytes"] - fields["alias_size_in_bytes"]
            + fields["generated_code_size_in_bytes"])
    fields["per_chip_peak_estimate_bytes"] = int(peak)
    fields["per_chip_peak_estimate_gib"] = round(peak / 1024**3, 3)
    fields["fits_16gib"] = bool(peak < HBM_PER_CHIP)
    return fields


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--audio_len", type=int, default=160000)
    ap.add_argument("--attention_impl", default="xla",
                    help="xla (deviceless-compilable everywhere); 'fused' "
                         "tries the Pallas kernel lowering")
    ap.add_argument("--conv_impl", default="conv")
    ap.add_argument("--out", default="benchmarks/lv60_r5/aot_memory.json")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    from jax.experimental.topologies import get_topology_desc
    from jax.sharding import Mesh

    report: dict = {
        "program": "attack/step.make_sharded_step (fused fwd+bwd+PGD+FM "
                   "projection), wav2vec2-large-lv60, bf16 kernel storage, "
                   "remat save_cheap",
        "batch": args.batch, "audio_len": args.audio_len,
        "attention_impl": args.attention_impl, "conv_impl": args.conv_impl,
        "hbm_per_chip_bytes": HBM_PER_CHIP,
        "cases": {},
    }

    topo8 = get_topology_desc("v5e:2x4", platform="tpu")
    mesh_dp_tp = Mesh(np.array(topo8.devices).reshape(4, 2), ("data", "model"))
    step, sds = build_case(mesh_dp_tp, tp=2, batch=args.batch,
                           audio_len=args.audio_len, accum=1,
                           attention_impl=args.attention_impl,
                           conv_impl=args.conv_impl)
    report["cases"]["v5e-8_dp4_tp2_accum1"] = analyze(step, sds)
    print("dp4×tp2 accum=1:", report["cases"]["v5e-8_dp4_tp2_accum1"])

    # pure 8-way DP at the shipping accum=2 — the layout behind the
    # docs/PERF.md v5e-8 throughput projection; certify its memory too
    mesh_dp8 = Mesh(np.array(topo8.devices).reshape(8,), ("data",))
    step_dp, sds_dp = build_case(mesh_dp8, tp=1, batch=args.batch,
                                 audio_len=args.audio_len, accum=2,
                                 attention_impl=args.attention_impl,
                                 conv_impl=args.conv_impl)
    report["cases"]["v5e-8_dp8_accum2"] = analyze(step_dp, sds_dp)
    print("dp8 accum=2:", report["cases"]["v5e-8_dp8_accum2"])

    # the smallest pod slice that runs lv60 monolithic: v5e-4 dp2×tp2
    topo4 = get_topology_desc("v5e:2x2", platform="tpu")
    mesh4 = Mesh(np.array(topo4.devices).reshape(2, 2), ("data", "model"))
    step4, sds4 = build_case(mesh4, tp=2, batch=args.batch,
                             audio_len=args.audio_len, accum=1,
                             attention_impl=args.attention_impl,
                             conv_impl=args.conv_impl)
    report["cases"]["v5e-4_dp2_tp2_accum1"] = analyze(step4, sds4)
    print("dp2×tp2 accum=1:", report["cases"]["v5e-4_dp2_tp2_accum1"])

    try:
        # 1x1 needs explicit host bounds (the default 2x2x1 doesn't divide)
        topo1 = get_topology_desc(
            "v5e:1x1", platform="tpu", chips_per_host_bounds=(1, 1, 1)
        )
        mesh1 = Mesh(np.array(topo1.devices).reshape(1,), ("data",))
        step1, sds1 = build_case(mesh1, tp=1, batch=args.batch,
                                 audio_len=args.audio_len, accum=1,
                                 attention_impl=args.attention_impl,
                                 conv_impl=args.conv_impl)
        report["cases"]["v5e-1_accum1_monolithic"] = analyze(step1, sds1)
        print("single-chip accum=1:", report["cases"]["v5e-1_accum1_monolithic"])
    except Exception as e:  # keep the dp×tp result even if 1x1 topology fails
        report["cases"]["v5e-1_accum1_monolithic"] = {"error": str(e)[:500]}
        print("single-chip case failed:", e)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
