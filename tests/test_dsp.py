"""STFT/iSTFT parity and round-trip tests.

Parity target: ``torch.stft(center=True, hann, return_complex=True)`` —
the exact transform whose output the reference's frequency-domain
projections act on (reference: src/core/fourier_transforms.py:4-41).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from paa_tpu.ops import dsp

N_FFT, HOP, WIN = 1024, 256, 1024


def _rand_audio(rng, b=2, t=16000):
    return (rng.standard_normal((b, t)) * 0.1).astype(np.float32)


def test_stft_matches_torch(rng):
    x = _rand_audio(rng)
    ours = np.asarray(dsp.stft(jnp.asarray(x), N_FFT, HOP, WIN))
    theirs = torch.stft(
        torch.from_numpy(x),
        n_fft=N_FFT,
        hop_length=HOP,
        win_length=WIN,
        window=torch.hann_window(N_FFT),
        return_complex=True,
        center=True,
    ).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_stft_matches_torch_short_window(rng):
    x = _rand_audio(rng, b=1, t=4096)
    ours = np.asarray(dsp.stft(jnp.asarray(x), 512, 128, 400))
    theirs = torch.stft(
        torch.from_numpy(x),
        n_fft=512,
        hop_length=128,
        win_length=400,
        window=torch.hann_window(400),
        return_complex=True,
        center=True,
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_stft_matches_torch_odd_nfft(rng):
    """Odd n_fft exercises the general gather path AND the frame-count
    formula (1 + T//hop is wrong there — regression for an OOB gather)."""
    import torch

    x = rng.standard_normal((2, 4096)).astype(np.float32)
    spec = dsp.stft(jnp.asarray(x), n_fft=1023, hop_length=256, win_length=1023)
    ref = torch.stft(
        torch.from_numpy(x), n_fft=1023, hop_length=256, win_length=1023,
        window=torch.hann_window(1023), center=True, return_complex=True,
    ).numpy()
    assert spec.shape == ref.shape
    np.testing.assert_allclose(np.asarray(spec), ref, rtol=1e-4, atol=1e-4)


def test_istft_round_trip_exact_length(rng):
    x = _rand_audio(rng, b=3, t=16000 + 123)  # non-multiple of hop
    spec = dsp.stft(jnp.asarray(x), N_FFT, HOP, WIN)
    y = np.asarray(dsp.istft(spec, N_FFT, HOP, WIN, length=x.shape[-1]))
    assert y.shape == x.shape
    np.testing.assert_allclose(y, x, rtol=1e-3, atol=1e-4)


def test_istft_default_length_matches_torch(rng):
    x = _rand_audio(rng, b=2, t=8192)
    spec = dsp.stft(jnp.asarray(x), N_FFT, HOP, WIN)
    ours = np.asarray(dsp.istft(spec, N_FFT, HOP, WIN))
    theirs = torch.istft(
        torch.from_numpy(np.asarray(spec)),
        n_fft=N_FFT,
        hop_length=HOP,
        win_length=WIN,
        window=torch.hann_window(N_FFT),
        center=True,
    ).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_align_to():
    x = jnp.ones((2, 100))
    assert dsp.align_to(120, x).shape == (2, 120)
    assert dsp.align_to(80, x).shape == (2, 80)
    assert float(dsp.align_to(120, x)[0, -1]) == 0.0


def test_stft_differentiable():
    import jax

    def loss(x):
        return jnp.sum(jnp.abs(dsp.stft(x, 256, 64, 256)) ** 2)

    x = jnp.ones((1, 1024)) * 0.1
    g = jax.grad(loss)(x)
    assert g.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(g)))


@pytest.mark.parametrize("t", [8000, 16000])
def test_num_frames(t):
    x = jnp.zeros((1, t))
    spec = dsp.stft(x, N_FFT, HOP, WIN)
    assert spec.shape == (1, N_FFT // 2 + 1, 1 + t // HOP)
