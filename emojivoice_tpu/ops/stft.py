"""STFT / iSTFT with torch.stft-compatible numerics, channels-last.

The reference leans on ``torch.stft``/``torch.istft`` in two places:
mel extraction (Matcha-TTS/matcha/utils/audio.py:45-82, center=False after a
manual reflect pad) and the vocoder denoiser (matcha/hifigan/denoiser.py:25-50,
center=True).  Both conventions are reproduced here on top of ``jnp.fft.rfft``
so the whole DSP chain stays inside the XLA program (no host round trip).

Layouts: waveforms ``(B, L)``; spectrograms ``(B, T_frames, F)`` —
channels-last so the F axis rides the TPU vector lanes and the mel
projection is a single MXU matmul.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window — matches torch.hann_window(win_length)."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def _frame(y: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """(B, L) → (B, T_frames, n_fft) overlapping frames, torch frame count:
    T_frames = 1 + (L - n_fft) // hop.

    Fast path (hop | n_fft and hop | L — true for all production call
    sites): reshape the signal into hop-sized blocks and concatenate
    n_fft//hop shifted block views — pure slices, no gather.  A
    (T_frames, n_fft) gather materializes badly on TPU (it was over half
    the denoiser's cost); the reshape path is what makes the in-graph
    STFT cheap.  Gather remains the general fallback.
    """
    length = y.shape[-1]
    n_frames = 1 + (length - n_fft) // hop_length
    r, rem = divmod(n_fft, hop_length)
    if rem == 0 and length % hop_length == 0:
        blocks = y.reshape(*y.shape[:-1], length // hop_length, hop_length)
        return jnp.concatenate([blocks[..., j:j + n_frames, :] for j in range(r)], axis=-1)
    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    return y[..., idx]


def _padded_window(n_fft: int, win_length: int) -> np.ndarray:
    """torch.stft centers a short window inside the FFT size."""
    win = hann_window(win_length)
    if win_length == n_fft:
        return win
    left = (n_fft - win_length) // 2
    return np.pad(win, (left, n_fft - win_length - left)).astype(np.float32)


def stft_complex(
    y: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    *,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """torch.stft(..., onesided=True, normalized=False) → (B, T_frames, F) complex."""
    if center:
        pad = n_fft // 2
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode=pad_mode)
    frames = _frame(y, n_fft, hop_length)
    win = jnp.asarray(_padded_window(n_fft, win_length))
    return jnp.fft.rfft(frames * win, n=n_fft, axis=-1)


def stft_magnitude_phase(y, n_fft, hop_length, win_length, *, center=True, eps: float = 0.0):
    """Magnitude (+eps inside the sqrt) and phase — the two reference
    consumers: mel extraction (eps=1e-9, center=False) and denoiser (eps=0,
    center=True; denoiser.py:35 uses plain sqrt of the power sum)."""
    spec = stft_complex(y, n_fft, hop_length, win_length, center=center)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    mag = jnp.sqrt(power + eps) if eps else jnp.sqrt(power)
    phase = jnp.arctan2(jnp.imag(spec), jnp.real(spec))
    return mag, phase


def istft(
    spec: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    *,
    center: bool = True,
    window_eps: float = 1e-11,
) -> jnp.ndarray:
    """torch.istft semantics for complex spec (B, T_frames, F) → (B, L).

    Overlap-add with squared-window envelope normalization; center=True trims
    n_fft//2 from both ends, giving L = hop * (T_frames - 1).
    """
    b, n_frames, _ = spec.shape
    win_np = _padded_window(n_fft, win_length)
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * jnp.asarray(win_np)

    out_len = n_fft + hop_length * (n_frames - 1)

    # squared-window envelope is data-independent — build it in numpy at
    # trace time instead of a device scatter
    env = np.zeros((out_len,), np.float32)
    ww = (win_np * win_np).astype(np.float32)
    for t in range(n_frames):
        env[t * hop_length : t * hop_length + n_fft] += ww

    r, rem = divmod(n_fft, hop_length)
    if rem == 0:
        # overlap-add as n_fft//hop shifted slice-adds (no scatter): split
        # each frame into hop-sized chunks; output block m sums chunk j of
        # frame m-j
        chunks = frames.reshape(b, n_frames, r, hop_length)
        wav = jnp.zeros((b, n_frames + r - 1, hop_length), dtype=frames.dtype)
        for j in range(r):
            wav = wav.at[:, j : j + n_frames].add(chunks[:, :, j])
        wav = wav.reshape(b, out_len)
    else:
        idx = np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
        flat_idx = jnp.asarray(idx.reshape(-1))
        wav = jnp.zeros((b, out_len), dtype=frames.dtype)
        wav = wav.at[:, flat_idx].add(frames.reshape(b, -1))

    wav = wav / jnp.asarray(np.maximum(env, window_eps))

    if center:
        half = n_fft // 2
        wav = wav[:, half : out_len - half]
    return wav
