"""Projection property tests: constraint satisfaction, idempotence,
no-op inside the feasible set, and jit/vmap compatibility.

This is the test pyramid the reference lacks (SURVEY.md §4): every member
of the zoo (reference: src/core/projections.py:11-159) gets
  * satisfaction:  project(x) lies in the feasible set,
  * idempotence:   project(project(x)) ≈ project(x),
  * identity:      x already feasible ⇒ project(x) == x.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paa_tpu.config import AttackConfig, ConstraintParams, NORM_TYPES
from paa_tpu.ops import dsp, projections, psycho

T = 8192


@pytest.fixture(scope="module")
def setup():
    cfg = AttackConfig(n_fft=512, hop_length=128, win_length=512)
    tables = psycho.build_tables(cfg)
    params = ConstraintParams.create(
        fm_epsilon=2.0,
        l2_size=0.05,
        l1_size=3.0,
        linf_size=1e-3,
        snr_db=40.0,
        tv_epsilon=1e-3,
        min_freq=120.0,
        max_freq=20_000.0,
    )
    return cfg, tables, params


def _p_and_clean(rng, scale=1.0):
    p = jnp.asarray(rng.standard_normal((1, T)).astype(np.float32) * scale)
    clean = jnp.asarray(rng.standard_normal((4, T)).astype(np.float32) * 0.1)
    return p, clean


# -- satisfaction ----------------------------------------------------------


def test_l2_satisfaction(rng, setup):
    cfg, tables, params = setup
    p, _ = _p_and_clean(rng)
    out = projections.project_l2(p, params.l2_size)
    assert float(jnp.linalg.norm(out)) <= float(params.l2_size) * (1 + 1e-5)


def test_l1_satisfaction(rng, setup):
    cfg, tables, params = setup
    p, _ = _p_and_clean(rng)
    out = projections.project_l1(p, params.l1_size)
    assert float(jnp.sum(jnp.abs(out))) <= float(params.l1_size) * (1 + 1e-5)


def test_linf_satisfaction(rng, setup):
    cfg, tables, params = setup
    p, _ = _p_and_clean(rng)
    out = projections.project_linf(p, params.linf_size)
    assert float(jnp.max(jnp.abs(out))) <= float(params.linf_size) * (1 + 1e-6)


def test_snr_satisfaction(rng, setup):
    cfg, tables, params = setup
    p, clean = _p_and_clean(rng, scale=1.0)  # loud noise => low SNR
    out = projections.project_snr(p, clean, params.snr_db)
    # After projection the realized norm matches the reference's target:
    # sqrt(signal_power / snr_linear * clean.numel())
    sig = float(jnp.mean(clean**2))
    target_norm = np.sqrt(sig / 10 ** (float(params.snr_db) / 10) * clean.size)
    np.testing.assert_allclose(float(jnp.linalg.norm(out)), target_norm, rtol=1e-4)


def test_tv_satisfaction(rng, setup):
    cfg, tables, params = setup
    p, clean = _p_and_clean(rng)
    out = projections.project_tv(p, clean, params.tv_epsilon)
    budget = float(params.tv_epsilon) * float(projections.total_variation(clean))
    assert float(projections.total_variation(out)) <= budget * (1 + 1e-4)


def test_band_mask_satisfaction(rng, setup):
    cfg, tables, params = setup
    p, _ = _p_and_clean(rng)
    spec = dsp.stft(p, cfg.n_fft, cfg.hop_length, cfg.win_length)
    out = projections.project_min_max_freqs(
        spec, tables.bin_freqs, params.min_freq, params.max_freq
    )
    bins = np.asarray(tables.bin_freqs)
    inside = (bins >= float(params.min_freq)) & (bins <= float(params.max_freq))
    # Energy INSIDE the band must be zeroed (reference keeps the outside;
    # src/core/projections.py:76, SURVEY.md §5.9).
    assert float(jnp.abs(out[:, inside, :]).max()) == 0.0
    outside = ~inside
    if outside.any():
        np.testing.assert_allclose(
            np.asarray(out[:, outside, :]), np.asarray(spec[:, outside, :])
        )


def test_fm_satisfaction(rng, setup):
    cfg, tables, params = setup
    p, _ = _p_and_clean(rng)
    spec = dsp.stft(p, cfg.n_fft, cfg.hop_length, cfg.win_length)
    out = projections.project_fm_norm(spec, tables, params.fm_epsilon)
    norm = float(psycho.fm_weighted_norm(out, tables))
    # Rescaling changes the per-cell SPL and thus the weights, so the norm
    # after one scaling step is <= target (weights only grow toward the
    # fill value 1.0 as cells get quieter... actually can shrink). Accept
    # a modest tolerance, as the reference's single-step scaling does.
    assert norm <= float(params.fm_epsilon) * 1.35


def test_phon_satisfaction(rng, setup):
    cfg, tables, params = setup
    p, _ = _p_and_clean(rng, scale=10.0)
    spec = dsp.stft(p, cfg.n_fft, cfg.hop_length, cfg.win_length)
    contour = psycho.phon_contour(tables, params.max_phon_level)
    out = projections.project_phon_level(spec, contour, cfg.phon_reference_db)
    mag_db = 20.0 * jnp.log10(jnp.abs(out) + 1e-8)
    scaled = contour - jnp.max(contour) + cfg.phon_reference_db
    assert bool(jnp.all(mag_db <= scaled[:, None] + 1e-3))


def test_phon_contour_exact_at_integer_levels():
    """Device-side contour lerp == the host ISO-226 closed form at every
    integer phon level (the reference sweep grid is 15/20/25/30/35)."""
    from paa_tpu.ops import iso226

    cfg = AttackConfig(norm_type="max_phon")
    tables = psycho.build_tables(cfg)
    bins = dsp.rfft_bin_freqs(cfg.n_fft, cfg.sr)
    for lvl in (0.0, 15.0, 20.0, 35.0, 90.0):
        exact = iso226.phon_threshold(bins, lvl)
        dev = np.asarray(psycho.phon_contour(tables, jnp.float32(lvl)))
        np.testing.assert_allclose(dev, exact, rtol=1e-6, atol=1e-5)
    # between integers: lerp stays within the bracketing contours
    mid = np.asarray(psycho.phon_contour(tables, jnp.float32(22.5)))
    lo = iso226.phon_threshold(bins, 22.0)
    hi = iso226.phon_threshold(bins, 23.0)
    assert (mid >= np.minimum(lo, hi) - 1e-4).all()
    assert (mid <= np.maximum(lo, hi) + 1e-4).all()


def test_phon_anchor_pinned_at_reference_db(setup):
    """The max-normalized phon threshold pins its loudest bin at exactly
    ``phon_reference_db`` for EVERY phon level — the mechanism behind the
    measured phon-invariance of the max_phon family (pertWER ≈ 1.0 for
    phon 1→70, benchmarks/quality_r5/analysis.md; reference formula:
    src/core/projections.py:138-159). The binding knob is the dB anchor,
    not the phon level; this test pins that property of the kept
    reference semantics so a refactor can't silently change which knob
    binds."""
    cfg, tables, params = setup
    for lvl in (1.0, 10.0, 25.0, 70.0):
        contour = psycho.phon_contour(tables, jnp.float32(lvl))
        for ref_db in (65.0, 25.0, 5.0):
            scaled = contour - jnp.max(contour) + ref_db
            assert abs(float(jnp.max(scaled)) - ref_db) < 1e-4
    # and the anchor bin is the lowest frequency (ISO-226 contours are
    # loudest at the bottom of the band)
    contour = psycho.phon_contour(tables, jnp.float32(25.0))
    assert int(jnp.argmax(contour)) == 0


def test_min_max_freqs_bin_quantization(rng, setup):
    """Admitted-band membership is quantized to rFFT bins: an upper
    cutoff below bin 1 keeps ONLY the DC bin, and any two cutoffs between
    the same pair of bin frequencies admit bit-identical sets (measured
    on chip as the bit-equal 16 Hz and 25 Hz quality_r5 cells; bin width
    sr/n_fft). Reference mask semantics: src/core/projections.py:68-80
    (min_freq is the audible-energy upper cutoff)."""
    cfg, tables, params = setup
    p, _ = _p_and_clean(rng)
    spec = dsp.stft(p, cfg.n_fft, cfg.hop_length, cfg.win_length)
    bin_w = cfg.sr / cfg.n_fft
    max_f = jnp.float32(20_000.0)
    dc_only = projections.project_min_max_freqs(
        spec, tables.bin_freqs, jnp.float32(0.5 * bin_w), max_f)
    assert bool(jnp.all(dc_only[:, 1:] == 0))
    assert bool(jnp.all(dc_only[:, 0] == spec[:, 0]))
    a = projections.project_min_max_freqs(
        spec, tables.bin_freqs, jnp.float32(1.1 * bin_w), max_f)
    b = projections.project_min_max_freqs(
        spec, tables.bin_freqs, jnp.float32(1.9 * bin_w), max_f)
    assert bool(jnp.all(a == b))
    assert bool(jnp.any(a[:, 1] != 0)) and bool(jnp.all(a[:, 2:] == 0))


def test_max_phon_traced_sweep_via_with_sweep_value(rng, setup):
    """max_phon flows through the generic with_sweep_value vmap path."""
    from paa_tpu.config import with_sweep_value

    cfg, tables, params = setup
    cfg = cfg.replace(norm_type="max_phon")
    p, clean = _p_and_clean(rng, scale=10.0)
    levels = np.asarray([15.0, 30.0, 45.0], np.float32)
    params_s = jax.tree.map(lambda x: jnp.broadcast_to(x, (3,)), params)
    params_s = with_sweep_value(params_s, "max_phon", levels)
    out = jax.vmap(
        lambda cp: projections.perturbation_constraint(p, clean, cfg, cp, tables)
    )(params_s)
    assert out.shape == (3,) + p.shape
    # looser level ⇒ more energy retained
    energies = [float(jnp.sum(out[i] ** 2)) for i in range(3)]
    assert energies[0] <= energies[1] <= energies[2]
    # each cell equals the single projection at its own level
    for i, lvl in enumerate(levels):
        single = projections.perturbation_constraint(
            p, clean, cfg, params._replace(max_phon_level=jnp.float32(lvl)), tables
        )
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(single), atol=1e-6)


# -- idempotence & identity -------------------------------------------------


@pytest.mark.parametrize("norm_type", [n for n in NORM_TYPES])
def test_idempotence(rng, setup, norm_type):
    cfg, tables, params = setup
    cfg = cfg.replace(norm_type=norm_type)
    p, clean = _p_and_clean(rng)
    once = projections.perturbation_constraint(p, clean, cfg, params, tables)
    twice = projections.perturbation_constraint(once, clean, cfg, params, tables)
    if norm_type in ("min_max_freqs", "max_phon"):
        # Cell-wise STFT projections are not exact fixed points through
        # overlap-add resynthesis (inconsistent-spectrogram leakage, same
        # as the reference's torch.istft path); assert the iteration
        # contracts instead of strict idempotence.
        thrice = projections.perturbation_constraint(twice, clean, cfg, params, tables)
        d1 = float(jnp.linalg.norm(twice - once) / jnp.linalg.norm(once))
        d2 = float(jnp.linalg.norm(thrice - twice) / jnp.linalg.norm(twice))
        assert d1 < 0.2 and d2 < d1
        return
    atol = 2e-3 if cfg.is_freq_domain else 1e-5
    np.testing.assert_allclose(np.asarray(twice), np.asarray(once), atol=atol, rtol=1e-2)


@pytest.mark.parametrize("norm_type", ["l2", "l1", "linf", "snr", "tv"])
def test_identity_inside_set(rng, setup, norm_type):
    cfg, tables, params = setup
    cfg = cfg.replace(norm_type=norm_type)
    p, clean = _p_and_clean(rng, scale=1e-7)  # deep inside every ball
    out = projections.perturbation_constraint(p, clean, cfg, params, tables)
    np.testing.assert_allclose(np.asarray(out), np.asarray(p), rtol=1e-5, atol=1e-9)


# -- jit / vmap --------------------------------------------------------------


@pytest.mark.parametrize("norm_type", [n for n in NORM_TYPES])
def test_jit_compiles(rng, setup, norm_type):
    cfg, tables, params = setup
    cfg = cfg.replace(norm_type=norm_type)
    p, clean = _p_and_clean(rng)

    fn = jax.jit(
        lambda p, clean, params: projections.perturbation_constraint(
            p, clean, cfg, params, tables
        )
    )
    out = fn(p, clean, params)
    assert out.shape == p.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_vmap_epsilon_sweep(rng, setup):
    """An epsilon sweep is a vmap over ConstraintParams — no recompiles."""
    cfg, tables, params = setup
    cfg = cfg.replace(norm_type="l2")
    p, clean = _p_and_clean(rng)
    epsilons = jnp.asarray([0.01, 0.05, 0.1], dtype=jnp.float32)
    sweep_params = jax.tree.map(lambda x: jnp.broadcast_to(x, (3,)), params)
    sweep_params = sweep_params._replace(l2_size=epsilons)

    def one(eps_params):
        return projections.perturbation_constraint(p, clean, cfg, eps_params, tables)

    outs = jax.vmap(one)(sweep_params)
    assert outs.shape == (3,) + p.shape
    for i, eps in enumerate(np.asarray(epsilons)):
        assert float(jnp.linalg.norm(outs[i])) <= eps * (1 + 1e-5)
