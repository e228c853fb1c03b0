"""Argparse flag surface — preserves every reference flag.

Reference: src/training_utils/parser.py:6-69 (28 flags in 4 groups).
Additions beyond the reference are marked [NEW]:
  * ``--platform`` replaces the reference's never-defined ``args.device``
    (SURVEY.md §5.6 bug),
  * ``--dataset synthetic`` + ``--data_root`` for offline runs,
  * ``--model`` selects wav2vec2-base (paper) vs wav2vec2-large-lv60
    (committed code) (SURVEY.md §5.9),
  * ``--small_data`` actually subsets (the reference documents 1% but
    never implements it),
  * ``--compute_dtype`` / ``--remat`` expose TPU performance knobs,
  * ``--l1_size`` revives the reference's dead l1 projection.
"""

from __future__ import annotations

import argparse

from paa_tpu.config import AttackConfig, ConstraintParams


def create_arg_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="TPU-native psychoacoustic adversarial attacks on Wav2Vec2-CTC"
    )

    # standard training params (reference: parser.py:10-18)
    parser.add_argument("--batch_size", type=int, default=64, help="batch size")
    parser.add_argument("--lr", type=float, default=1e-4, help="lr for the perturbation update")
    parser.add_argument("--early_stopping", type=int, default=4,
                        help="how many epochs to wait before early stopping")
    parser.add_argument("--num_epochs", type=int, default=50, help="how many epochs at all")
    parser.add_argument("--optimizer_type", type=str, choices=["adam", "pgd"], default="adam",
                        help="how to optimize the perturbation update")
    parser.add_argument("--gamma", type=float, default=0.9, help="lr decay factor")
    parser.add_argument("--step_size", type=int, default=2,
                        help="how many epochs between lr decays")

    # data (reference: parser.py:21-26)
    parser.add_argument("--dataset", type=str, default="LibreeSpeech",
                        choices=["LibreeSpeech", "CommonVoice", "tedlium", "synthetic"],
                        help="dataset; use CommonVoice/tedlium when attacking wav2vec2 "
                             "(trained on LibriSpeech); 'synthetic' is offline [NEW]")
    parser.add_argument("--data_root", type=str, default=None,
                        help="[NEW] local directory for LibriSpeech-layout WAV data")
    parser.add_argument("--resume_from", type=str, default=None,
                        help="Path to a saved perturbation (.npy) to resume training from")

    # adversarial params (reference: parser.py:29-50)
    parser.add_argument("--target_reps", type=int, default=5,
                        help="how many times the model should predict the target word")
    parser.add_argument("--target", type=str, default="delete",
                        help="Target phrase for targeted attacks")
    parser.add_argument("--attack_mode", type=str, choices=["untargeted", "targeted"],
                        default="untargeted")
    parser.add_argument("--norm_type", type=str,
                        choices=["l2", "linf", "snr", "tv", "l1",
                                 "fletcher_munson", "min_max_freqs", "max_phon"],
                        default="max_phon", help="type of norm to limit the perturbation")
    parser.add_argument("--fm_epsilon", type=float, default=2,
                        help="size of the fletcher-munson ball")
    parser.add_argument("--l2_size", type=float, default=0.05)
    parser.add_argument("--l1_size", type=float, default=1.0, help="[NEW] l1 ball radius")
    parser.add_argument("--linf_size", type=float, default=0.0001)
    parser.add_argument("--snr_db", type=float, default=64,
                        help="minimum signal-to-noise ratio (dB)")
    parser.add_argument("--min_freq_attack", type=float, default=120,
                        help="band-mask lower edge (acts as the audible upper cutoff; "
                             "energy is kept OUTSIDE [min,max], reference semantics)")
    parser.add_argument("--max_freq_attack", type=float, default=20_000)
    parser.add_argument("--tv_epsilon", type=float, default=0.001,
                        help="Total Variation constraint (fraction of clean batch TV)")
    parser.add_argument("--max_phon_level", type=float, default=20,
                        help="Maximum allowed phon level in perceptual constraint")

    # sound properties (reference: parser.py:54-61)
    parser.add_argument("--phon_reference_db", type=float, default=65,
                        help="dB level in STFT space corresponding to max_phon_level")
    parser.add_argument("--sr", type=int, default=16000, help="sample rate")
    parser.add_argument("--n_fft", type=int, default=1024)
    parser.add_argument("--hop_length", type=int, default=256)
    parser.add_argument("--win_length", type=int, default=1024)
    parser.add_argument("--relative_audio_length", type=float, default=0.80,
                        help="length-quantile used as the fixed collate length")

    # others (reference: parser.py:64-66)
    parser.add_argument("--seed", type=int, default=5)
    parser.add_argument("--small_data", action="store_true",
                        help="use ~1%% of the dataset for fast debugging")
    parser.add_argument("--num_items_to_inspect", type=int, default=12)

    # [NEW] TPU-native knobs
    parser.add_argument("--model", type=str, default="wav2vec2-base",
                        choices=["wav2vec2-base", "wav2vec2-large-lv60", "wav2vec2-tiny"],
                        help="frozen ASR target (paper uses base; committed reference "
                             "code uses large-lv60)")
    parser.add_argument("--checkpoint_path", type=str, default=None,
                        help="local model.safetensors / pytorch_model.bin with the "
                             "frozen model's weights, read torch-free "
                             "(models/checkpoint_io.py); overrides the HF loader")
    parser.add_argument("--no_input_normalize", action="store_true",
                        help="disable the zero-mean/unit-variance waveform "
                             "normalization baked into the lv60 forward — the "
                             "reference's committed train/eval paths skip processor "
                             "normalization (loss_helpers.py:21,56); set this for a "
                             "strict-parity run against that committed behavior")
    parser.add_argument("--platform", type=str, default=None,
                        choices=[None, "tpu", "cpu"],
                        help="force a JAX platform (default: auto)")
    parser.add_argument("--device_probe_timeout", type=float, default=900,
                        help="before touching the accelerator, probe it from a "
                             "watchdogged subprocess and fail fast (failure "
                             "results.json + exit 1) if it hangs this many "
                             "seconds — a down TPU tunnel otherwise blocks the "
                             "first device op FOREVER with no error. Default "
                             "900 s rides out the ~8 min grant-stickiness of a "
                             "freshly killed TPU process; 0 disables the probe. "
                             "Skipped when --platform cpu")
    parser.add_argument("--compute_dtype", type=str, default="bfloat16",
                        choices=["bfloat16", "float32"])
    parser.add_argument("--param_storage", type=str, default=None,
                        choices=["bfloat16", "float32"],
                        help="HBM storage dtype for the frozen model's matmul/"
                             "conv kernels. Default: auto — bfloat16 whenever "
                             "compute_dtype is bfloat16 (bit-identical compute, "
                             "half the parameter bytes: lv60 1.26 GB -> 0.63 GB), "
                             "float32 otherwise")
    parser.add_argument("--fe_gelu", type=str, default="auto",
                        choices=["auto", "exact", "tanh"],
                        help="GELU flavor in the feature-extractor conv stack "
                             "(~2.1e9 activations/step — the hottest VPU op). "
                             "auto: tanh approximation under bfloat16 compute "
                             "(its error is below the bf16 cast's own noise; "
                             "+16%% step rate measured, docs/PERF.md), exact "
                             "erf under float32. exact/tanh force a flavor")
    parser.add_argument("--conv_impl", type=str, default="conv",
                        choices=["conv", "hybrid", "pairdot", "im2col", "tapdot"],
                        help="feature-extractor conv lowering (all impls share "
                             "one WIO param layout). conv: XLA-native (default); "
                             "hybrid: XLA forward + phase-matmul backward "
                             "(custom VJP; avoids the transposed-conv dgrad); "
                             "pairdot/im2col/tapdot: all-matmul lowerings "
                             "(docs/PERF.md)")
    parser.add_argument("--attention_impl", type=str, default=None,
                        choices=["xla", "flash", "fused", "auto"],
                        help="default: auto (fused where it fits VMEM on TPU, "
                             "flash on long clips, xla on CPU). fused = short-seq "
                             "whole-head Pallas kernel (probs never touch HBM; "
                             "fastest at <=10s audio, TPU only); flash = stock "
                             "Pallas flash attention (O(T) memory, for long "
                             "audio; TPU only); xla = dense softmax(QK^T)V")
    parser.add_argument("--remat", action="store_true", default=None,
                        help="rematerialize encoder layers (less HBM, more FLOPs). "
                             "Default: ON on TPU (the measured-fastest config at the "
                             "production batch, docs/PERF.md), OFF elsewhere")
    parser.add_argument("--no_remat", action="store_true",
                        help="disable encoder rematerialization")
    parser.add_argument("--remat_policy", type=str, default=None,
                        choices=["full", "save_cheap", "no_probs", "save_resid"],
                        help="which activations the encoder remat saves across the "
                             "boundary (default: save_cheap when remat is on — the "
                             "measured-fastest policy, docs/PERF.md)")
    parser.add_argument("--accum_steps", type=int, default=1,
                        help="split each batch into this many lax.scan microbatches, "
                             "summing perturbation gradients (caps HBM at chunk size; "
                             "numerically identical to the monolithic step). On one "
                             "16 GB chip at batch 64 x 10s audio use 2 for "
                             "wav2vec2-base, 8 for wav2vec2-large-lv60")
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel shards for the frozen encoder "
                             "(Megatron layout, parallel/tp.py): q/k/v + FFN-in "
                             "column-sharded, out/FFN-out row-sharded over a "
                             "'model' mesh axis; the remaining devices form the "
                             "data axis. Must divide the device count, the "
                             "model's attention heads and its FFN hidden. Use "
                             "on multi-chip slices when lv60 activations at "
                             "production batch outgrow per-chip HBM")
    parser.add_argument("--use_pallas_fm", action="store_true", default=None,
                        help="fused Pallas kernel for the Fletcher-Munson weighted "
                             "norm (default: ON on TPU, OFF elsewhere)")
    parser.add_argument("--no_pallas_fm", action="store_true",
                        help="force the plain-XLA Fletcher-Munson path")
    parser.add_argument("--device_cache", action="store_true", default=None,
                        help="stage whole data splits to device HBM and form "
                             "batches by on-device gather — zero per-step host "
                             "audio feed. Default: auto (on for TPU runs — one "
                             "chip or a mesh, where rows shard over the data "
                             "axis — when a split stages under 512 MiB per "
                             "device)")
    parser.add_argument("--no_device_cache", action="store_true",
                        help="always feed batches from the host")
    parser.add_argument("--save_root", type=str, default=None,
                        help="root dir for run artifacts (default: ./logs)")
    parser.add_argument("--synthetic_samples", type=int, default=512,
                        help="corpus size for --dataset synthetic")
    parser.add_argument("--synthetic_words", type=str, default=None,
                        help="MIN,MAX words per synthetic utterance (controls "
                             "clip length; ~0.46 s/word — 22,26 gives ~10 s "
                             "production-shape clips)")
    parser.add_argument("--no_resume", action="store_true",
                        help="ignore existing checkpoints in the save dir")
    parser.add_argument("--profile", action="store_true",
                        help="capture a jax.profiler trace of the run into "
                             "<save_dir>/profile (view with tensorboard)")
    parser.add_argument("--tensorboard", action="store_true",
                        help="mirror per-epoch metrics to <save_dir>/tb as real "
                             "TensorBoard event files via the dependency-free "
                             "writer (train/tb_events.py) — the integration the "
                             "reference imports but never ships "
                             "(run_attack.py:6, 245-251)")
    parser.add_argument("--debug_plots", action="store_true",
                        help="emit the phon-projection 3-panel / FM weight-curve "
                             "debug plots on improvement epochs (reference: "
                             "save.py:260-294, emitted from inside the projection "
                             "there; here from the host, outside the jitted step)")
    return parser


def resolve_perf_defaults(args) -> tuple[bool, str, bool]:
    """Resolve the tri-state performance flags against the live backend.

    Out-of-the-box CLI runs must land on the MEASURED-fastest config
    (docs/PERF.md): on TPU that is encoder remat with the ``save_cheap``
    policy plus the fused Pallas Fletcher-Munson kernel; off-TPU both
    stay off (remat only costs FLOPs without the HBM pressure, and the
    Pallas kernel is TPU-only). Explicit flags always win.

    Returns ``(remat, remat_policy, use_pallas_fm)``.
    """
    import jax  # deferred: the caller (CLI main) has set the platform

    on_tpu = jax.default_backend() == "tpu"
    remat = args.remat if args.remat is not None else on_tpu
    if getattr(args, "no_remat", False):
        remat = False
    policy = getattr(args, "remat_policy", None) or (
        "save_cheap" if remat else "full"
    )
    pallas_fm = args.use_pallas_fm if args.use_pallas_fm is not None else on_tpu
    if getattr(args, "no_pallas_fm", False):
        pallas_fm = False
    return remat, policy, pallas_fm


def config_from_args(args) -> AttackConfig:
    remat, _policy, pallas_fm = resolve_perf_defaults(args)
    device_cache = getattr(args, "device_cache", None)
    if getattr(args, "no_device_cache", False):
        device_cache = False
    return AttackConfig(
        norm_type=args.norm_type,
        attack_mode=args.attack_mode,
        optimizer_type=args.optimizer_type,
        target=args.target,
        target_reps=args.target_reps,
        sr=args.sr,
        n_fft=args.n_fft,
        hop_length=args.hop_length,
        win_length=args.win_length,
        phon_reference_db=args.phon_reference_db,
        batch_size=args.batch_size,
        lr=args.lr,
        num_epochs=args.num_epochs,
        early_stopping=args.early_stopping,
        gamma=args.gamma,
        step_size=args.step_size,
        seed=args.seed,
        model_name=args.model,
        compute_dtype=args.compute_dtype,
        remat=remat,
        accum_steps=args.accum_steps,
        use_pallas_fm=pallas_fm,
        tp=getattr(args, "tp", 1),
        cache_data_on_device=device_cache,
    )


def constraint_params_from_args(args) -> ConstraintParams:
    return ConstraintParams.from_args(args)
