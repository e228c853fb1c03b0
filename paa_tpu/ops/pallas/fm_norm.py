"""Pallas TPU kernel: fused Fletcher-Munson weighted power reduction.

One VMEM pass per STFT tile computes |X|² → SPL → phon-axis interpolation
into the ISO-226 penalty table → weighted-power partial sums. The jnp
path (ops/psycho.py) materializes power, SPL, indices and weights as
separate (B, F, T) intermediates in HBM; this kernel keeps them all in
registers/VMEM and touches HBM once per input element — the weighted
norm becomes purely HBM-bandwidth-bound.

The phon interpolation is reformulated gather-free: with the phon grid
at 0,10,...,90, linear interpolation equals a sum of 10 hat-function
coefficients ``max(0, 1 - |spl/10 - p|)`` against the table rows — a
fixed sequence of VPU multiply-adds, which vectorizes where a per-cell
gather would serialize.

Numerics match ops/psycho.py:fm_cell_weights exactly (same fill-value
semantics: weight 1.0 outside phon [0, 90] or off-bin frequencies) —
asserted by tests/test_pallas_fm.py in interpret mode and on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only namespace; interpret mode works without it
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

_LOG10_INV = 0.4342944819032518  # 1/ln(10)
T_TILE = 128


def _kernel(re_ref, im_ref, table_ref, dom_ref, tmask_ref, out_ref):
    re = re_ref[0]  # (F, T_TILE)
    im = im_ref[0]
    power = re * re + im * im
    spl = (10.0 * _LOG10_INV) * jnp.log(power + 1e-10)
    pos = spl * 0.1

    w = jnp.zeros_like(power)
    for p in range(10):
        hat = jnp.maximum(0.0, 1.0 - jnp.abs(pos - float(p)))
        w = w + hat * table_ref[p][:, None]  # (F, 1) broadcast over T

    valid = (spl >= 0.0) & (spl <= 90.0) & (dom_ref[0][:, None] > 0.5)
    w = jnp.where(valid, w, 1.0)

    # zero out the padded tail of the last T tile; the sum is stored as
    # a (1, 1) vector block (Mosaic cannot store bare scalars to VMEM)
    out_ref[0, 0] = jnp.sum(w * power * tmask_ref[0][None, :]).reshape(1, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fm_weighted_power_sum(
    re: jnp.ndarray,  # (B, F, T) float32 — real part of STFT
    im: jnp.ndarray,  # (B, F, T) float32 — imaginary part
    table: jnp.ndarray,  # (10, F) float32 penalty weights
    in_domain: jnp.ndarray,  # (F,) float32 1.0 inside [20, 20000] Hz
    interpret: bool = False,
) -> jnp.ndarray:
    """Σ w·|X|² over all cells (the square of the FM weighted norm)."""
    B, F, T = re.shape
    n_t = pl.cdiv(T, T_TILE)
    T_pad = n_t * T_TILE
    if T_pad != T:
        pad = [(0, 0), (0, 0), (0, T_pad - T)]
        re = jnp.pad(re, pad)
        im = jnp.pad(im, pad)
    tmask = (jnp.arange(T_pad, dtype=jnp.float32) < T).astype(jnp.float32)
    tmask = tmask.reshape(1, T_pad)

    if _HAS_PLTPU and not interpret:
        spec = lambda block, index_map: pl.BlockSpec(
            block, index_map, memory_space=pltpu.VMEM
        )
    else:
        spec = lambda block, index_map: pl.BlockSpec(block, index_map)
    # The per-(b, t) partial sum is written as a (B, n_t, 1, 1) array so
    # the block's LAST TWO dims (1, 1) equal the array's — Mosaic rejects
    # scalar blocks whose trailing dims neither tile to (8, 128) nor
    # span the array (e.g. a (1, 1) block of a (B, n_t) output).
    out_spec = spec((1, 1, 1, 1), lambda b, t: (b, t, 0, 0))

    partials = pl.pallas_call(
        _kernel,
        grid=(B, n_t),
        in_specs=[
            spec((1, F, T_TILE), lambda b, t: (b, 0, t)),
            spec((1, F, T_TILE), lambda b, t: (b, 0, t)),
            spec((10, F), lambda b, t: (0, 0)),
            spec((1, F), lambda b, t: (0, 0)),
            spec((1, T_TILE), lambda b, t: (0, t)),
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_t, 1, 1), jnp.float32),
        interpret=interpret,
    )(re, im, table, in_domain.reshape(1, F), tmask)
    return jnp.sum(partials)


def fm_weighted_norm_pallas(stft_p, tables, interpret: bool = False):
    """Drop-in Pallas variant of ops/psycho.py:fm_weighted_norm."""
    re = jnp.real(stft_p).astype(jnp.float32)
    im = jnp.imag(stft_p).astype(jnp.float32)
    total = fm_weighted_power_sum(
        re, im, tables.fm_table, tables.fm_in_domain, interpret=interpret
    )
    return jnp.sqrt(total)
