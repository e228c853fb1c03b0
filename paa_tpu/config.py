"""Central configuration for attack runs.

The reference drives everything off a single argparse namespace
(reference: src/training_utils/parser.py:6-69). On TPU we split that into:

  * ``AttackConfig`` — a frozen, hashable dataclass of *static* facts
    (norm type, STFT geometry, optimizer kind, attack mode, shapes).
    It is passed to ``jax.jit`` as a static argument so the chosen
    projection and optimizer fuse into one XLA program with no
    data-dependent Python control flow.

  * ``ConstraintParams`` — a NamedTuple of *dynamic* scalars (epsilons,
    SNR target, band edges...). These are traced values, so an epsilon
    sweep can be ``vmap``-ed over a leading axis without recompiling
    (the TPU-native replacement for the reference's SLURM grid,
    reference: submit_scan_range.py:8-143).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp

NORM_TYPES = (
    "l2",
    "linf",
    "snr",
    "tv",
    "l1",
    "fletcher_munson",
    "min_max_freqs",
    "max_phon",
)
FREQ_NORM_TYPES = ("fletcher_munson", "min_max_freqs", "max_phon")
ATTACK_MODES = ("untargeted", "targeted")
OPTIMIZER_TYPES = ("pgd", "adam")


@dataclasses.dataclass(frozen=True)
class AttackConfig:
    """Static attack facts — hashable, safe as a jit static arg.

    Field defaults mirror the reference flag defaults
    (reference: src/training_utils/parser.py:10-66).
    """

    # attack
    norm_type: str = "max_phon"
    attack_mode: str = "untargeted"
    optimizer_type: str = "adam"
    target: str = "delete"
    target_reps: int = 5

    # sound / STFT geometry
    sr: int = 16000
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024

    # psychoacoustics (max_phon_level is a *traced* ConstraintParams
    # scalar, not static config — it sweeps like every other epsilon)
    phon_reference_db: float = 65.0

    # training
    batch_size: int = 64
    lr: float = 1e-4
    num_epochs: int = 50
    early_stopping: int = 4
    gamma: float = 0.9
    step_size: int = 2
    seed: int = 5

    # model
    model_name: str = "wav2vec2-base"  # or "wav2vec2-large-lv60"
    # compute dtype for the frozen model forward/backward (MXU-friendly);
    # the perturbation itself and the CTC loss always stay float32.
    compute_dtype: str = "bfloat16"
    remat: bool = False  # jax.checkpoint over encoder layers (memory vs FLOPs)

    # clamp perturbed audio into the valid waveform range during training
    # (reference: src/training_utils/train.py:136)
    clamp_audio: bool = True

    # Microbatch gradient accumulation inside the jitted step: the batch
    # is split into ``accum_steps`` chunks driven by ``lax.scan``; chunk
    # gradients w.r.t. the universal perturbation are summed (the CTC
    # 'sum' reduction is linear, so the result is bit-comparable to the
    # monolithic grad). Caps activation memory at chunk size — the knob
    # to turn when a batch doesn't fit HBM.
    accum_steps: int = 1

    # use the fused Pallas kernel for the Fletcher-Munson weighted norm
    # (ops/pallas/fm_norm.py); the jnp path is the reference semantics
    # either way
    use_pallas_fm: bool = False

    # Tensor-parallel shards for the frozen encoder (parallel/tp.py
    # Megatron layout): q/k/v + FFN-in column-sharded, out/FFN-out
    # row-sharded over a ``model`` mesh axis; the remaining devices form
    # the data axis. 1 = pure data parallelism (the reference's only
    # scale-out is one whole model per GPU, submit_scan_range.py:52-66).
    tp: int = 1

    # stage whole splits to device HBM and form batches by on-device
    # gather (data/pipeline.py:DeviceCorpus). None = auto: on TPU when
    # the split's PER-DEVICE share stages under 512 MiB — a lone chip, or
    # any mesh run (rows shard over the data axis, so the budget scales
    # with it). True forces, False disables.
    cache_data_on_device: bool | None = None

    def __post_init__(self):
        if self.norm_type not in NORM_TYPES:
            raise ValueError(f"Unknown norm_type: {self.norm_type!r}")
        if self.attack_mode not in ATTACK_MODES:
            raise ValueError(f"Unknown attack_mode: {self.attack_mode!r}")
        if self.optimizer_type not in OPTIMIZER_TYPES:
            raise ValueError(f"Unknown optimizer_type: {self.optimizer_type!r}")
        if self.tp < 1:
            raise ValueError(f"tp must be >= 1, got {self.tp}")

    @property
    def is_freq_domain(self) -> bool:
        return self.norm_type in FREQ_NORM_TYPES

    @property
    def num_freq_bins(self) -> int:
        return self.n_fft // 2 + 1

    @property
    def loss_direction(self) -> float:
        """+1 = maximize CTC loss (untargeted), -1 = minimize (targeted).

        Reference: src/training_utils/train.py:124.
        """
        return 1.0 if self.attack_mode == "untargeted" else -1.0

    def replace(self, **kw) -> "AttackConfig":
        return dataclasses.replace(self, **kw)


class ConstraintParams(NamedTuple):
    """Dynamic constraint scalars — traced, vmappable over a sweep axis.

    Defaults mirror reference flags (src/training_utils/parser.py:42-50).
    Only the entry matching ``AttackConfig.norm_type`` is consulted by the
    projection dispatched for that config; the rest are inert.
    """

    fm_epsilon: jnp.ndarray  # fletcher_munson weighted-norm ball radius
    l2_size: jnp.ndarray  # l2 ball radius
    l1_size: jnp.ndarray  # l1 ball radius (reference dead code, revived)
    linf_size: jnp.ndarray  # linf box half-width
    snr_db: jnp.ndarray  # minimum clean/perturbation SNR in dB
    tv_epsilon: jnp.ndarray  # fraction of the clean batch's total variation
    min_freq: jnp.ndarray  # band-mask lower edge (Hz)
    max_freq: jnp.ndarray  # band-mask upper edge (Hz)
    max_phon_level: jnp.ndarray  # phon contour level for max_phon clipping

    @classmethod
    def create(
        cls,
        fm_epsilon: float = 2.0,
        l2_size: float = 0.05,
        l1_size: float = 1.0,
        linf_size: float = 1e-4,
        snr_db: float = 64.0,
        tv_epsilon: float = 1e-3,
        min_freq: float = 120.0,
        max_freq: float = 20_000.0,
        max_phon_level: float = 20.0,
    ) -> "ConstraintParams":
        f32 = lambda v: jnp.asarray(v, dtype=jnp.float32)
        return cls(
            fm_epsilon=f32(fm_epsilon),
            l2_size=f32(l2_size),
            l1_size=f32(l1_size),
            linf_size=f32(linf_size),
            snr_db=f32(snr_db),
            tv_epsilon=f32(tv_epsilon),
            min_freq=f32(min_freq),
            max_freq=f32(max_freq),
            max_phon_level=f32(max_phon_level),
        )

    @classmethod
    def from_args(cls, args) -> "ConstraintParams":
        """Build from an argparse namespace with reference flag names."""
        return cls.create(
            fm_epsilon=args.fm_epsilon,
            l2_size=args.l2_size,
            l1_size=getattr(args, "l1_size", 1.0),
            linf_size=args.linf_size,
            snr_db=args.snr_db,
            tv_epsilon=args.tv_epsilon,
            min_freq=args.min_freq_attack,
            max_freq=args.max_freq_attack,
            max_phon_level=args.max_phon_level,
        )


# norm_type -> the ConstraintParams field that sizes its feasible set
# (single source of truth for run naming, sweeps and the CLI).
SWEEP_FIELD = {
    "min_max_freqs": "min_freq",
    "fletcher_munson": "fm_epsilon",
    "max_phon": "max_phon_level",
    "l2": "l2_size",
    "l1": "l1_size",
    "linf": "linf_size",
    "snr": "snr_db",
    "tv": "tv_epsilon",
}

# norm_type -> the argparse flag carrying that size (reference flag
# names; only the band edges are spelled differently there).
SWEEP_ARG = {**SWEEP_FIELD, "min_max_freqs": "min_freq_attack"}


def attack_size_value(cfg: AttackConfig, params: ConstraintParams) -> float:
    """The scalar 'size' of the active constraint, for run naming.

    Reference: src/training_utils/build.py:235-246. Every size —
    including ``max_phon_level`` — is a traced ``ConstraintParams``
    scalar consulted directly by its projection.
    """
    return float(getattr(params, SWEEP_FIELD[cfg.norm_type]))


def with_sweep_value(params: ConstraintParams, norm_type: str, value) -> ConstraintParams:
    """Return params with the sweep field for ``norm_type`` replaced.

    ``value`` may be a scalar or a vector (for a vmapped epsilon sweep).
    """
    field = SWEEP_FIELD[norm_type]
    return params._replace(**{field: jnp.asarray(value, dtype=jnp.float32)})
