"""Pure-JAX STFT / iSTFT with ``torch.stft(center=True)`` semantics.

The reference wraps ``torch.stft``/``torch.istft`` with a Hann window and
``center=True`` (reference: src/core/fourier_transforms.py:4-41). The
frequency-domain projections act on that exact complex STFT, so the TPU
build reproduces the same analysis/synthesis conventions:

  * reflect-pad the signal by ``n_fft // 2`` on both sides,
  * frame starts every ``hop_length`` samples → ``1 + T // hop`` frames,
  * multiply by a periodic Hann window of ``win_length`` (zero-padded,
    centered, to ``n_fft`` if shorter), rFFT, **no normalization**,
  * iSTFT = irFFT per frame × window, overlap-add, divide by the
    overlap-added squared window envelope, crop the center padding.

Unlike ``torch.istft`` (whose default output length is
``hop * (num_frames - 1)``, forcing the reference's pad/crop realign hack
at src/training_utils/train.py:27-35), ``istft`` here takes an explicit
``length`` so round-trips are exact by construction. ``align_to`` is kept
for behavioral parity where callers want the reference semantics.

Everything is shape-static and jit-compatible: the framing gather and the
overlap-add scatter both lower to XLA gather/scatter with precomputed
index arrays; XLA fuses the window multiply into the FFT's prologue.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window, matching ``torch.hann_window(periodic=True)``."""
    n = jnp.arange(win_length, dtype=dtype)
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / win_length)


def _prepared_window(n_fft: int, win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Hann(win_length) zero-padded and centered to n_fft (torch.stft rule)."""
    w = hann_window(win_length, dtype=dtype)
    if win_length < n_fft:
        left = (n_fft - win_length) // 2
        w = jnp.pad(w, (left, n_fft - win_length - left))
    return w


def num_frames(length: int, n_fft: int, hop_length: int) -> int:
    """Number of STFT frames for a centered transform — torch.stft's
    ``1 + (T + 2·(n_fft//2) − n_fft) // hop``, which reduces to
    ``1 + T // hop`` only for even ``n_fft``."""
    return 1 + (length + 2 * (n_fft // 2) - n_fft) // hop_length


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length"))
def stft(
    x: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
) -> jnp.ndarray:
    """Complex STFT of a batch of waveforms.

    Args:
      x: ``(..., T)`` real waveforms.
    Returns:
      ``(..., F, num_frames)`` complex64, ``F = n_fft // 2 + 1`` — the same
      layout as ``torch.stft(return_complex=True)``.
    """
    T = x.shape[-1]
    pad = n_fft // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = num_frames(T, n_fft, hop_length)

    if n_fft % hop_length == 0:
        # Fast path (production geometry): framing as R shifted static
        # slices of a (chunks, hop) reshape — no gather. TPU scatter/
        # gather lowering is the top compile- and run-time hazard here.
        R = n_fft // hop_length
        n_chunks = (frames - 1) + R  # chunks consumed by the last frame
        need = n_chunks * hop_length
        if xp.shape[-1] < need:
            xp = jnp.pad(xp, [(0, 0)] * (x.ndim - 1) + [(0, need - xp.shape[-1])])
        chunks = xp[..., :need].reshape(x.shape[:-1] + (n_chunks, hop_length))
        framed = jnp.concatenate(
            [chunks[..., r : r + frames, :] for r in range(R)], axis=-1
        )  # (..., frames, n_fft)
    else:
        # General path: static gather index matrix, folded by XLA.
        idx = (
            np.arange(frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
        )
        framed = xp[..., idx]  # (..., frames, n_fft)

    w = _prepared_window(n_fft, win_length, dtype=x.dtype)
    spec = jnp.fft.rfft(framed * w, n=n_fft, axis=-1)  # (..., frames, F)
    return jnp.swapaxes(spec, -1, -2)  # (..., F, frames)


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "length")
)
def istft(
    spec: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    length: int | None = None,
) -> jnp.ndarray:
    """Inverse STFT (overlap-add with window-envelope normalization).

    Args:
      spec: ``(..., F, num_frames)`` complex spectrogram.
      length: output waveform length. Default mirrors ``torch.istft``:
        ``hop_length * (num_frames - 1)``.
    Returns:
      ``(..., length)`` real waveform.
    """
    frames = spec.shape[-1]
    default_len = hop_length * (frames - 1)
    out_len = default_len if length is None else length
    pad = n_fft // 2

    w = _prepared_window(n_fft, win_length, dtype=jnp.float32)
    x_frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
    x_frames = x_frames * w  # synthesis window

    total = hop_length * (frames - 1) + n_fft
    batch_shape = spec.shape[:-2]
    flat = x_frames.reshape((-1, frames, n_fft))

    if n_fft % hop_length == 0:
        # Fast path: overlap-add as R shifted pad+add passes — no scatter.
        R = n_fft // hop_length

        def ola_reshape(fr):  # fr: (B*, frames, n_fft)
            fr = fr.reshape(fr.shape[0], frames, R, hop_length)
            y = jnp.zeros((fr.shape[0], total), dtype=fr.dtype)
            for r in range(R):
                part = fr[:, :, r, :].reshape(fr.shape[0], frames * hop_length)
                y = y + jnp.pad(
                    part,
                    ((0, 0), (r * hop_length, total - r * hop_length - frames * hop_length)),
                )
            return y

        y = ola_reshape(flat)
        env = ola_reshape(jnp.broadcast_to(w * w, (1, frames, n_fft)))[0]
    else:
        starts = np.arange(frames) * hop_length
        idx = starts[:, None] + np.arange(n_fft)[None, :]  # (frames, n_fft)

        def ola(fr):
            y = jnp.zeros((total,), dtype=fr.dtype)
            return y.at[idx.reshape(-1)].add(fr.reshape(-1))

        y = jax.vmap(ola)(flat)  # (B*, total)
        env = jnp.zeros((total,), dtype=jnp.float32)
        env = env.at[idx.reshape(-1)].add(jnp.tile(w * w, frames))

    y = y / jnp.maximum(env, 1e-11)

    y = y[:, pad : pad + out_len]
    if out_len > total - pad:  # requested longer than synthesizable: zero-pad
        y = jnp.pad(y, ((0, 0), (0, out_len - (total - pad))))
    return y.reshape(batch_shape + (out_len,))


def align_to(target_len: int, x: jnp.ndarray) -> jnp.ndarray:
    """Pad/crop the last dim of ``x`` to ``target_len``.

    Behavioral parity helper for the reference's post-iSTFT length
    realignment (reference: src/training_utils/train.py:27-35).
    """
    cur = x.shape[-1]
    if cur == target_len:
        return x
    if cur < target_len:
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, target_len - cur)])
    return x[..., :target_len]


def rfft_bin_freqs(n_fft: int, sr: int) -> np.ndarray:
    """Frequencies (Hz) of the rFFT bins — numpy, for table precompute."""
    return np.fft.rfftfreq(n_fft, d=1.0 / sr)
