"""Attack run entry point — ``python -m paa_tpu.cli.run_attack <flags>``.

The TPU-native rebuild of the reference CLI (src/run_attack.py:13-284):
setup → psychoacoustic tables → data → frozen model → perturbation →
epoch loop → finalize, with the same save-dir naming scheme, resume
discovery, results.json, and exit codes (0 success / 1 failure with a
failure JSON).
"""

from __future__ import annotations

import json
import logging
import os
import sys

import numpy as np

from paa_tpu.cli import parser as parser_lib
from paa_tpu.config import attack_size_value
from paa_tpu.data import datasets, pipeline as pipeline_lib
from paa_tpu.models import convert, wav2vec2
from paa_tpu.train import artifacts, checkpoint, log_helpers, loop


def _parse_words(spec: str | None) -> tuple[int, int] | None:
    """``--synthetic_words "MIN,MAX"`` → (min, max) or None."""
    if not spec:
        return None
    try:
        lo, hi = (int(v) for v in spec.split(","))
    except ValueError:
        raise SystemExit(
            f"--synthetic_words expects 'MIN,MAX' (two integers), got {spec!r}"
        )
    if lo < 1 or hi < lo:
        raise SystemExit(
            f"--synthetic_words needs 1 <= MIN <= MAX, got {spec!r}"
        )
    return lo, hi


def make_save_dir(args) -> str:
    """logs/{attack_mode}/{dataset}/{norm}_{size}_{mode}_{opt}
    (reference: build.py:249-254)."""
    from paa_tpu.config import SWEEP_ARG

    args.attack_size_string = f"{getattr(args, SWEEP_ARG[args.norm_type])}"
    root = args.save_root or os.path.join(os.getcwd(), "logs")
    return os.path.join(
        root, args.attack_mode, args.dataset,
        f"{args.norm_type}_{args.attack_size_string}_{args.attack_mode}_{args.optimizer_type}",
    )


def setup_jax(platform: str | None):
    """Configure JAX: optional platform pin + XLA tuning (paa_tpu.runtime).

    The pin goes through jax.config (NOT the JAX_PLATFORMS env var,
    which loses to backends registered at interpreter start); any
    requested platform is pinned, so --platform tpu fails loudly when
    no TPU backend can initialize instead of silently running on CPU.
    """
    from paa_tpu import runtime

    runtime.configure()
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    return jax


def load_model_bundle(args, attn_mesh="auto"):
    """Frozen Wav2Vec2-CTC. Weight sources, in priority order:
      1. ``--checkpoint_path`` — a local model.safetensors /
         pytorch_model.bin read torch-free (models/checkpoint_io.py);
         errors are fatal (the user asked for these exact weights),
      2. HF transformers cache (models/convert.py), best-effort,
      3. random init (zero-egress fallback).

    ``attn_mesh``: the mesh the Pallas attention kernels partition over
    manually (models/wav2vec2.py ``_manual_shard``). ``"auto"`` (single
    runs) resolves the same mesh AttackRunner will build, so on a
    multi-chip slice — dp or dp×tp — each chip runs the fused kernel on
    its local (rows, heads) shard instead of XLA replicating the opaque
    pallas_call. Pass ``None`` to keep GSPMD-only partitioning (the
    sweep, whose vmapped form runs the model under vmap where a manual
    region would need per-axis vmap plumbing)."""
    log = logging.getLogger("paa_tpu")
    overrides = {}
    if getattr(args, "no_input_normalize", False):
        # strict parity with the reference's committed lv60 behavior,
        # which feeds raw waveforms without processor normalization
        # (reference: src/core/loss_helpers.py:21,56)
        overrides["do_normalize"] = False
    attention_impl = args.attention_impl
    if attention_impl is None:
        # "auto": the fused whole-head Pallas kernel where it fits VMEM
        # (the measured-fastest TPU path, docs/PERF.md), flash on longer
        # clips, dense XLA off-TPU — resolved per traced shape so
        # default-flag runs on long audio degrade instead of erroring.
        # Under --tp the kernels still apply: the manual attention region
        # runs each chip's head shard locally (models/wav2vec2.py).
        attention_impl = "auto"
    if attn_mesh == "auto":
        from paa_tpu.parallel import mesh as mesh_lib

        tp = getattr(args, "tp", 1)
        if tp > 1:
            # model-axis validation BEFORE the mesh resolves, so a bad
            # --tp surfaces as the flag-oriented message here (the
            # device/batch divisibility messages live in decide_mesh,
            # the single error site shared with AttackRunner)
            from paa_tpu.parallel import tp as tp_lib

            tp_lib.check_model_axis(wav2vec2.get_config(args.model), tp)
        attn_mesh = mesh_lib.decide_mesh(tp, args.batch_size)
    remat, remat_policy, _ = parser_lib.resolve_perf_defaults(args)
    mcfg = wav2vec2.get_config(
        args.model,
        compute_dtype=args.compute_dtype,
        remat=remat,
        remat_policy=remat_policy,
        attention_impl=attention_impl,
        attn_mesh=attn_mesh,
        fe_gelu=getattr(args, "fe_gelu", "auto"),
        conv_impl=getattr(args, "conv_impl", "conv"),
        **overrides,
    )
    params = None
    if getattr(args, "checkpoint_path", None):
        from paa_tpu.models import checkpoint_io

        sd = checkpoint_io.load_state_dict(args.checkpoint_path)
        params = convert.convert_hf_state_dict(sd, mcfg)
        log.info("loaded weights torch-free from %s", args.checkpoint_path)
    elif args.model != "wav2vec2-tiny":  # tiny is test-only, never pretrained
        try:
            params = convert.load_hf_checkpoint(args.model, mcfg)
            log.info("loaded pretrained HF weights for %s", args.model)
        except Exception as e:
            log.warning("pretrained weights unavailable (%s); using random init", e)
    if params is None:
        params = wav2vec2.init_params(mcfg, seed=args.seed)
    storage = getattr(args, "param_storage", None) or (
        "bfloat16" if args.compute_dtype == "bfloat16" else "float32"
    )
    if storage != "float32":
        params = wav2vec2.cast_param_storage(params, storage)
        log.info("parameter kernels stored as %s (bit-identical under "
                 "%s compute; half the parameter HBM)", storage, args.compute_dtype)
    model = wav2vec2.Wav2Vec2ForCTC(mcfg)
    apply_fn = lambda prm, audio: model.apply({"params": prm}, audio)
    return mcfg, params, apply_fn


def main(args) -> int:
    save_dir = make_save_dir(args)
    os.makedirs(save_dir, exist_ok=True)
    log = log_helpers.setup_logging(save_dir)
    log_helpers.log_args(log, vars(args))
    log.info("norm_type=%s | attack_size=%s", args.norm_type, args.attack_size_string)

    try:
        # Fail fast (with a failure results.json) when the accelerator is
        # unreachable — a down TPU tunnel otherwise hangs the first device
        # op forever with no error (see runtime.maybe_probe). Must run
        # BEFORE anything that initializes the in-process backend (even
        # config_from_args touches jax.default_backend()).
        from paa_tpu import runtime

        runtime.maybe_probe(
            args.platform, getattr(args, "device_probe_timeout", 0), log=log
        )
        jax = setup_jax(args.platform)
        log.info("devices: %s", jax.devices())

        cfg = parser_lib.config_from_args(args)
        cparams = parser_lib.constraint_params_from_args(args)

        samples = datasets.load_dataset_tuples(
            args.dataset,
            seed=args.seed,
            data_root=args.data_root,
            small_data=args.small_data,
            synthetic_samples=args.synthetic_samples,
            synthetic_words=_parse_words(args.synthetic_words),
        )
        pipe = pipeline_lib.build_pipeline(
            samples, relative_audio_length=args.relative_audio_length,
        seed=args.seed, target_sr=args.sr,
        )
        log.info(
            "splits: train=%d eval=%d test=%d | audio_len=%d (%.1fs)",
            len(pipe.train), len(pipe.eval), len(pipe.test),
            pipe.audio_len, pipe.audio_len / args.sr,
        )

        _, params, apply_fn = load_model_bundle(args)

        init_p = None
        if args.resume_from:
            log.info("Resuming perturbation from: %s", args.resume_from)
            init_p = checkpoint.load_perturbation(args.resume_from)

        if args.profile:  # SURVEY.md §5.1: tracing the reference lacks
            jax.profiler.start_trace(os.path.join(save_dir, "profile"))
        try:
            result = loop.run_attack(
                cfg, apply_fn, params, pipe, save_dir,
                cparams=cparams,
                num_items_to_inspect=args.num_items_to_inspect,
                resume=not args.no_resume and not args.small_data,
                init_p=init_p,
                debug_plots=args.debug_plots,
                tensorboard=args.tensorboard,
            )
        finally:
            if args.profile:
                jax.profiler.stop_trace()
                log.info("profiler trace written to %s/profile", save_dir)
        return 0
    except Exception as e:  # failure report (reference: run_attack.py:265-279)
        log.exception("Run failed with an exception: %s", e)
        try:
            artifacts.save_json_results(
                save_dir, args.norm_type, args.attack_size_string,
                epoch=-1, finished_training=False, error=str(e),
            )
        except Exception:
            pass
        return 1


def _console_main() -> int:
    """console_scripts entry (pyproject [project.scripts])."""
    return main(parser_lib.create_arg_parser().parse_args())


if __name__ == "__main__":
    sys.exit(_console_main())
