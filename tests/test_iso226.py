"""ISO-226 model and perceptual weight table tests.

Anchors: by definition of the phon scale, the SPL required at 1 kHz for a
contour of N phon is (approximately, per the ISO-226 closed form) N dB.
Table parity: the device-side phon-axis lerp over the precomputed
frequency-resolved table must match a scipy ``RegularGridInterpolator``
built over the same (phon × freq) grid — the construction the reference
uses (reference: src/core/iso.py:238-266).
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.interpolate import RegularGridInterpolator

from paa_tpu.config import AttackConfig
from paa_tpu.ops import dsp, iso226, psycho


def test_1khz_anchor():
    # ISO-226 closed form at 1 kHz reproduces the phon level within ~0.1 dB.
    for phon in [0, 20, 40, 60, 80]:
        spl = iso226.iso226_spl(phon, [1000.0])[0]
        assert abs(spl - phon) < 0.25, (phon, spl)


def test_low_freq_needs_more_spl():
    # The ear is far less sensitive at 20 Hz than at 1 kHz.
    spl = iso226.iso226_spl(20.0, [20.0, 1000.0, 4000.0])
    assert spl[0] > spl[1] + 40
    # ~3-4 kHz is the most sensitive region: requires less SPL than 1 kHz.
    assert spl[2] < spl[1]


def test_frequency_bounds_raise():
    with pytest.raises(ValueError):
        iso226.iso226_spl(40.0, [10.0])
    with pytest.raises(ValueError):
        iso226.iso226_spl(40.0, [25000.0])
    with pytest.raises(ValueError):
        iso226.iso226_spl(95.0, [1000.0])


def test_weight_matrix_shape_and_range():
    freqs, phons, spl = iso226.compute_weight_matrix()
    assert spl.shape == (10, 30)
    w = iso226.perceptual_weight(spl)
    assert w.shape == spl.shape
    assert np.all(w >= 0) and np.all(w <= 1)
    # More sensitive (lower required SPL) => higher penalty weight.
    i1k = int(np.argmin(np.abs(freqs - 1000.0)))
    i20 = 0
    assert w[0, i1k] > w[0, i20]


def _reference_interpolator():
    """The reference's interpolator construction, built independently here
    from our grid (src/core/iso.py:238-266)."""
    freqs, phons, spl = iso226.compute_weight_matrix()
    weights = iso226.perceptual_weight(spl)
    return RegularGridInterpolator(
        (phons, freqs), weights, bounds_error=False, fill_value=1.0
    )


def test_fm_table_matches_rgi_on_bins():
    cfg = AttackConfig()
    bins = dsp.rfft_bin_freqs(cfg.n_fft, cfg.sr)
    table, in_domain = iso226.fm_weight_table(bins)
    assert table.shape == (10, len(bins))
    rgi = _reference_interpolator()
    # For every (phon grid level, in-domain bin) the table equals RGI.
    phons = np.arange(0, 100, 10)
    for pi, p in enumerate(phons):
        pts = np.stack([np.full_like(bins, p), bins], axis=-1)
        expected = rgi(pts)
        got = np.where(in_domain > 0.5, table[pi], 1.0)
        np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-6)


def test_device_fm_weights_match_rgi(rng):
    """End-to-end: device-side lerp == scipy RGI on random STFT powers."""
    cfg = AttackConfig()
    tables = psycho.build_tables(cfg)
    F = cfg.num_freq_bins
    # Random powers spanning in/out-of-domain SPLs.
    power = (10.0 ** rng.uniform(-3.0, 10.0, size=(2, F, 7))).astype(np.float32)
    got = np.asarray(psycho.fm_cell_weights(jnp.asarray(power), tables))

    rgi = _reference_interpolator()
    spl = 10.0 * np.log10(power + 1e-10)
    bins = dsp.rfft_bin_freqs(cfg.n_fft, cfg.sr)
    freqs = np.broadcast_to(bins[None, :, None], power.shape)
    pts = np.stack([spl, freqs], axis=-1).reshape(-1, 2)
    expected = rgi(pts).reshape(power.shape)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_phon_threshold_clamps_dc_bin():
    cfg = AttackConfig()
    bins = dsp.rfft_bin_freqs(cfg.n_fft, cfg.sr)
    thresh = iso226.phon_threshold(bins, 20.0)
    assert thresh.shape == (cfg.num_freq_bins,)
    # DC bin (0 Hz) reuses the 20 Hz value (reference: build.py:336).
    np.testing.assert_allclose(
        thresh[0], iso226.iso226_spl(20.0, [20.0])[0], rtol=1e-6
    )
