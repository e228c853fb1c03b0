"""The psychoacoustic projection zoo — pure, jit-able, branch-free.

Each projection maps a perturbation back into its feasibility set:
``project(p, clean, params, tables) -> p``. The reference implements these
as eager torch functions with Python ``if`` branches (reference:
src/core/projections.py:11-159) dispatched per batch under ``no_grad``
(src/training_utils/train.py:69-99). Here every projection is a pure
function of traced values — data-dependent decisions use ``jnp.where`` on
scalars, so the chosen projection fuses into the single compiled attack
step and an epsilon sweep can ``vmap`` over constraint scalars.

Dispatch over the *norm type* is static (``AttackConfig.norm_type``):
a different feasible set is a different program, not a runtime branch.
"""

from __future__ import annotations

import jax.numpy as jnp

from paa_tpu.config import AttackConfig, ConstraintParams
from paa_tpu.ops import dsp, psycho
from paa_tpu.ops.psycho import PsychoTables

_EPS_NORM = 1e-8


def _scale_into_ball(x: jnp.ndarray, norm: jnp.ndarray, radius: jnp.ndarray) -> jnp.ndarray:
    """Rescale ``x`` so its ``norm`` is at most ``radius`` (no-op inside)."""
    factor = jnp.where(norm > radius, radius / jnp.maximum(norm, _EPS_NORM), 1.0)
    return x * factor


# --------------------------------------------------------------------------
# Time-domain projections
# --------------------------------------------------------------------------


def project_l2(p: jnp.ndarray, epsilon: jnp.ndarray) -> jnp.ndarray:
    """Scale into the global L2 ball of radius epsilon.

    Reference: src/core/projections.py:41-46.
    """
    return _scale_into_ball(p, jnp.linalg.norm(p.reshape(-1)), epsilon)


def project_l1(p: jnp.ndarray, epsilon: jnp.ndarray) -> jnp.ndarray:
    """Scale into the L1 ball (radial scaling, as the reference's dead-code
    variant does — not a true L1 simplex projection; kept for parity).

    Reference: src/core/projections.py:49-54.
    """
    return _scale_into_ball(p, jnp.sum(jnp.abs(p)), epsilon)


def project_linf(p: jnp.ndarray, epsilon: jnp.ndarray) -> jnp.ndarray:
    """Clamp into the Linf box [-epsilon, +epsilon].

    Reference: src/core/projections.py:37-39.
    """
    return jnp.clip(p, -epsilon, epsilon)


def project_snr(p: jnp.ndarray, clean: jnp.ndarray, snr_db: jnp.ndarray) -> jnp.ndarray:
    """Rescale ``p`` so SNR(clean, p) hits ``snr_db`` when below target.

    Keeps the reference's semantics exactly (src/core/projections.py:11-35):
    the target norm is ``sqrt(signal_power / snr_linear * clean.numel())``
    with *clean's* element count (B·T) against the norm of the universal
    ``(1, T)`` perturbation, and perturbations already at/above the target
    SNR — or with vanishing norm — pass through unchanged.
    """
    signal_power = jnp.mean(clean**2)
    noise_power = jnp.mean(p**2)
    current_snr_db = 10.0 * jnp.log10(signal_power / (noise_power + 1e-12))

    snr_linear = 10.0 ** (snr_db / 10.0)
    target_norm = jnp.sqrt(signal_power / snr_linear * clean.size)
    current_norm = jnp.linalg.norm(p.reshape(-1))

    needs_scaling = (current_snr_db < snr_db) & (current_norm >= _EPS_NORM)
    factor = jnp.where(needs_scaling, target_norm / jnp.maximum(current_norm, _EPS_NORM), 1.0)
    return p * factor


def total_variation(x: jnp.ndarray) -> jnp.ndarray:
    """Anisotropic 1-D total variation summed over the batch."""
    return jnp.sum(jnp.abs(x[..., 1:] - x[..., :-1]))


def project_tv(p: jnp.ndarray, clean: jnp.ndarray, tv_epsilon: jnp.ndarray) -> jnp.ndarray:
    """Scale ``p`` so TV(p) ≤ tv_epsilon · TV(clean batch).

    The budget is relative to the *current batch's* clean TV — the
    feasible set intentionally changes per batch ("fraction of base
    signal TV"; reference: src/core/projections.py:56-66, semantics
    documented in SURVEY.md §5.9).
    """
    budget = tv_epsilon * total_variation(clean)
    return _scale_into_ball(p, total_variation(p), budget)


# --------------------------------------------------------------------------
# STFT-domain projections
# --------------------------------------------------------------------------


def project_min_max_freqs(
    stft_p: jnp.ndarray,
    bin_freqs: jnp.ndarray,
    min_freq: jnp.ndarray,
    max_freq: jnp.ndarray,
) -> jnp.ndarray:
    """Zero all STFT bins *inside* [min_freq, max_freq], keeping energy
    outside the band.

    This preserves the reference's (surprising but intended) mask
    direction: with defaults ``min=120 Hz, max=20 kHz`` the perturbation
    may only live below 120 Hz — ``--min_freq_attack`` acts as an upper
    cutoff for audible energy (reference: src/core/projections.py:68-80;
    README.md:67; SURVEY.md §5.9).
    """
    keep = (bin_freqs < min_freq) | (bin_freqs > max_freq)
    return stft_p * keep.astype(stft_p.real.dtype)[:, None]


def project_fm_norm(
    stft_p: jnp.ndarray,
    tables: PsychoTables,
    fm_epsilon: jnp.ndarray,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Scale STFT(p) into the Fletcher-Munson weighted-norm ball.

    Reference: src/core/projections.py:116-133, with the perceptual
    weights computed fully on device (see ops/psycho.py) instead of the
    reference's per-batch scipy round-trip. ``use_pallas`` switches to
    the fused single-pass kernel (ops/pallas/fm_norm.py).
    """
    if use_pallas:
        from paa_tpu.ops.pallas import fm_norm as fm_pallas

        norm = fm_pallas.fm_weighted_norm_pallas(stft_p, tables)
    else:
        norm = psycho.fm_weighted_norm(stft_p, tables)
    return _scale_into_ball(stft_p, norm, fm_epsilon)


def project_phon_level(
    stft_p: jnp.ndarray,
    spl_thresh: jnp.ndarray,
    phon_reference_db: float,
) -> jnp.ndarray:
    """Clip STFT magnitudes (dB) to the scaled ISO-226 phon contour,
    preserving phase.

    ``scaled_thresh = spl_thresh - max(spl_thresh) + phon_reference_db``
    (reference: src/core/projections.py:138-159). Implemented as a
    magnitude *ratio* multiply rather than the reference's
    ``mag·exp(i·angle)`` reconstruction — identical where magnitudes are
    clipped, and exactly phase-safe (and exactly zero-preserving) where
    they are not.
    """
    mag = jnp.abs(stft_p)
    mag_db = 20.0 * jnp.log10(mag + 1e-8)
    scaled_thresh = spl_thresh - jnp.max(spl_thresh) + phon_reference_db
    clipped_db = jnp.minimum(mag_db, scaled_thresh[:, None])
    ratio = 10.0 ** ((clipped_db - mag_db) / 20.0)  # ≤ 1, =1 where unclipped
    return stft_p * ratio


# --------------------------------------------------------------------------
# Top-level dispatch
# --------------------------------------------------------------------------


def project_frequency_domain(
    p: jnp.ndarray,
    cfg: AttackConfig,
    params: ConstraintParams,
    tables: PsychoTables,
) -> jnp.ndarray:
    """STFT → project → iSTFT for the frequency-domain constraints.

    Unlike the reference (whose ``torch.istft`` drops the final partial
    hop and zero-pads it back, src/training_utils/train.py:38-66), the
    iSTFT here reconstructs the exact input length.
    """
    T = p.shape[-1]
    stft_p = dsp.stft(p, cfg.n_fft, cfg.hop_length, cfg.win_length)
    if cfg.norm_type == "min_max_freqs":
        stft_p = project_min_max_freqs(stft_p, tables.bin_freqs, params.min_freq, params.max_freq)
    elif cfg.norm_type == "fletcher_munson":
        stft_p = project_fm_norm(
            stft_p, tables, params.fm_epsilon,
            use_pallas=getattr(cfg, "use_pallas_fm", False),
        )
    elif cfg.norm_type == "max_phon":
        # the contour level is a TRACED scalar: one compiled program
        # serves any max_phon_level, and sweeps vmap over it like every
        # other epsilon (reference rebuilds a host tensor per run,
        # build.py:325-348)
        contour = psycho.phon_contour(tables, params.max_phon_level)
        stft_p = project_phon_level(stft_p, contour, cfg.phon_reference_db)
    else:
        raise ValueError(f"Unsupported frequency-domain norm_type: {cfg.norm_type!r}")
    return dsp.istft(stft_p, cfg.n_fft, cfg.hop_length, cfg.win_length, length=T)


def perturbation_constraint(
    p: jnp.ndarray,
    clean: jnp.ndarray | None,
    cfg: AttackConfig,
    params: ConstraintParams,
    tables: PsychoTables,
) -> jnp.ndarray:
    """Project ``p`` into the feasible set selected by ``cfg.norm_type``.

    Static dispatch — under ``jit`` only the selected projection is traced
    and it fuses into the attack step (reference eager dispatch:
    src/training_utils/train.py:69-99).
    """
    if cfg.is_freq_domain:
        return project_frequency_domain(p, cfg, params, tables)
    if cfg.norm_type == "l2":
        return project_l2(p, params.l2_size)
    if cfg.norm_type == "l1":
        return project_l1(p, params.l1_size)
    if cfg.norm_type == "linf":
        return project_linf(p, params.linf_size)
    if cfg.norm_type == "snr":
        if clean is None:
            raise ValueError("SNR projection requires clean_audio to compare to")
        return project_snr(p, clean, params.snr_db)
    if cfg.norm_type == "tv":
        if clean is None:
            raise ValueError("TV projection requires clean_audio for its budget")
        return project_tv(p, clean, params.tv_epsilon)
    raise ValueError(f"Unknown norm_type: {cfg.norm_type!r}")
