"""Pallas FM-norm kernel parity vs the jnp reference (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from paa_tpu.config import AttackConfig
from paa_tpu.ops import dsp, psycho
from paa_tpu.ops.pallas import fm_norm


@pytest.fixture(scope="module")
def tables():
    return psycho.build_tables(AttackConfig())


def test_weighted_power_matches_jnp(rng, tables):
    F = 513
    # powers spanning in/out of the phon domain, odd T to exercise the tail mask
    re = rng.standard_normal((2, F, 130)).astype(np.float32) * 10
    im = rng.standard_normal((2, F, 130)).astype(np.float32) * 10
    got = float(
        fm_norm.fm_weighted_power_sum(
            jnp.asarray(re), jnp.asarray(im), tables.fm_table,
            tables.fm_in_domain, interpret=True,
        )
    )
    power = jnp.asarray(re**2 + im**2)
    w = psycho.fm_cell_weights(power, tables)
    expected = float(jnp.sum(w * power))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_norm_matches_on_real_stft(rng, tables):
    cfg = AttackConfig()
    p = jnp.asarray(rng.standard_normal((1, 16000)).astype(np.float32))
    spec = dsp.stft(p, cfg.n_fft, cfg.hop_length, cfg.win_length)
    ref = float(psycho.fm_weighted_norm(spec, tables))
    got = float(fm_norm.fm_weighted_norm_pallas(spec, tables, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_extreme_powers(rng, tables):
    F = 513
    # zeros (SPL -> -100, out of domain -> weight 1) and huge magnitudes
    re = np.zeros((1, F, 128), np.float32)
    re[0, 5, 7] = 1e6
    im = np.zeros_like(re)
    got = float(
        fm_norm.fm_weighted_power_sum(
            jnp.asarray(re), jnp.asarray(im), tables.fm_table,
            tables.fm_in_domain, interpret=True,
        )
    )
    power = jnp.asarray(re**2)
    expected = float(jnp.sum(psycho.fm_cell_weights(power, tables) * power))
    np.testing.assert_allclose(got, expected, rtol=1e-5)
