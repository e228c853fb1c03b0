"""Device-resident psychoacoustic tables and Fletcher-Munson weighting.

The reference computes Fletcher-Munson perceptual weights by detaching the
full ``(B, F, T, 2)`` query tensor to numpy and round-tripping through a
scipy ``RegularGridInterpolator`` **every batch** (reference:
src/core/projections.py:83-113, round-trip at :104-109). On TPU that
host↔device copy would dominate the step. Here the weight grid is baked
once into a dense ``(10, F)`` table at the run's STFT bin frequencies
(ops/iso226.py), and the per-cell weight becomes a pure on-device
gather + 1-D lerp along the phon axis — identical numerics (the scipy
interpolator is separable bilinear), zero host traffic, fully fused into
the attack step by XLA.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from paa_tpu.config import AttackConfig
from paa_tpu.ops import dsp, iso226


class PsychoTables(NamedTuple):
    """Precomputed device constants shared by the STFT-domain projections.

    All leaves are ``jnp`` arrays so the bundle is a pytree: a sweep over
    ``max_phon_level`` simply vmaps over a leading axis of ``spl_thresh``.
    """

    fm_table: jnp.ndarray  # (10, F) FM penalty weights per (phon level, bin)
    fm_in_domain: jnp.ndarray  # (F,) 1.0 where bin freq in [20, 20000] Hz
    spl_thresh: jnp.ndarray  # (F,) ISO-226 SPL at cfg.max_phon_level per bin
    bin_freqs: jnp.ndarray  # (F,) rFFT bin frequencies in Hz


def build_tables(cfg: AttackConfig, max_phon_level: float | None = None) -> PsychoTables:
    """Precompute all psychoacoustic device tables for a config (host, once)."""
    bin_freqs = dsp.rfft_bin_freqs(cfg.n_fft, cfg.sr)
    fm_table, fm_in_domain = iso226.fm_weight_table(bin_freqs)
    phon = cfg.max_phon_level if max_phon_level is None else max_phon_level
    spl_thresh = iso226.phon_threshold(bin_freqs, phon)
    return PsychoTables(
        fm_table=jnp.asarray(fm_table),
        fm_in_domain=jnp.asarray(fm_in_domain),
        spl_thresh=jnp.asarray(spl_thresh),
        bin_freqs=jnp.asarray(bin_freqs, dtype=jnp.float32),
    )


def build_sweep_tables(cfg: AttackConfig, phon_levels) -> PsychoTables:
    """Tables with a leading sweep axis on ``spl_thresh`` (one row per
    phon level, each evaluated *exactly* — no lerp between contours), for
    vmapped ``max_phon`` epsilon sweeps."""
    bin_freqs = dsp.rfft_bin_freqs(cfg.n_fft, cfg.sr)
    fm_table, fm_in_domain = iso226.fm_weight_table(bin_freqs)
    thresh = np.stack([iso226.phon_threshold(bin_freqs, p) for p in phon_levels])
    return PsychoTables(
        fm_table=jnp.asarray(fm_table),
        fm_in_domain=jnp.asarray(fm_in_domain),
        spl_thresh=jnp.asarray(thresh),
        bin_freqs=jnp.asarray(bin_freqs, dtype=jnp.float32),
    )


def fm_cell_weights(power: jnp.ndarray, tables: PsychoTables) -> jnp.ndarray:
    """Perceptual penalty weight for each STFT cell.

    Args:
      power: ``(..., F, T)`` squared STFT magnitudes.
    Returns:
      ``(..., F, T)`` weights in [0, 1].

    Per-cell SPL ``10·log10(power + 1e-10)`` is used as the phon
    coordinate (the reference's proxy, src/core/projections.py:94-101);
    cells whose SPL falls outside [0, 90] phon or whose bin frequency is
    outside [20, 20000] Hz receive the interpolator fill value 1.0
    (maximum penalty), matching ``RegularGridInterpolator(bounds_error=
    False, fill_value=1.0)`` (reference: src/core/iso.py:261-266).
    """
    spl = 10.0 * jnp.log10(power + 1e-10)

    # 1-D lerp along the phon axis (grid = 0, 10, ..., 90).
    pos = spl / 10.0
    i0 = jnp.clip(jnp.floor(pos), 0, 8).astype(jnp.int32)
    frac = jnp.clip(pos - i0.astype(spl.dtype), 0.0, 1.0)

    f_idx = jnp.arange(power.shape[-2], dtype=jnp.int32)[:, None]  # (F, 1)
    f_idx = jnp.broadcast_to(f_idx, power.shape)
    w0 = tables.fm_table[i0, f_idx]
    w1 = tables.fm_table[i0 + 1, f_idx]
    w = w0 * (1.0 - frac) + w1 * frac

    in_phon = (spl >= 0.0) & (spl <= 90.0)
    in_freq = tables.fm_in_domain[:, None] > 0.5  # (F, 1) broadcasts over T
    return jnp.where(in_phon & in_freq, w, 1.0)


def fm_weighted_norm(stft_p: jnp.ndarray, tables: PsychoTables) -> jnp.ndarray:
    """Fletcher-Munson weighted norm ``sqrt(Σ w·|X|²)`` over all cells.

    Reference: src/core/projections.py:83-113.
    """
    power = jnp.abs(stft_p) ** 2
    w = fm_cell_weights(power, tables)
    return jnp.sqrt(jnp.sum(w * power))
