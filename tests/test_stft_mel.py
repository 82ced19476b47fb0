"""Parity of STFT/iSTFT/mel numerics against torch (reference DSP chain)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from emojivoice_tpu.ops.mel import mel_filterbank, mel_spectrogram
from emojivoice_tpu.ops.stft import hann_window, istft, stft_complex, stft_magnitude_phase


def _torch_stft(y, n_fft, hop, win, center):
    return torch.stft(
        torch.from_numpy(y), n_fft, hop_length=hop, win_length=win,
        window=torch.hann_window(win), center=center, pad_mode="reflect",
        normalized=False, onesided=True, return_complex=True,
    )


def test_hann_window_matches_torch():
    np.testing.assert_allclose(hann_window(1024), torch.hann_window(1024).numpy(), atol=1e-6)


@pytest.mark.parametrize("center", [True, False])
def test_stft_matches_torch(rng, center):
    y = rng.normal(size=(2, 4096)).astype(np.float32) * 0.1
    ref = _torch_stft(y, 1024, 256, 1024, center).numpy()  # (B, F, T)
    got = np.asarray(stft_complex(jnp.asarray(y), 1024, 256, 1024, center=center))  # (B, T, F)
    np.testing.assert_allclose(got.transpose(0, 2, 1), ref, atol=2e-3)


def test_istft_matches_torch(rng):
    y = rng.normal(size=(1, 8192)).astype(np.float32) * 0.1
    spec = _torch_stft(y, 1024, 256, 1024, True)
    ref = torch.istft(spec, 1024, hop_length=256, win_length=1024,
                      window=torch.hann_window(1024)).numpy()
    got = np.asarray(istft(jnp.asarray(spec.numpy().transpose(0, 2, 1)), 1024, 256, 1024))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_istft_roundtrip(rng):
    """stft → istft reconstructs the interior of the signal."""
    y = rng.normal(size=(1, 4096)).astype(np.float32)
    spec = stft_complex(jnp.asarray(y), 1024, 256, 1024, center=True)
    out = np.asarray(istft(spec, 1024, 256, 1024))
    np.testing.assert_allclose(out[0, 512:3584], y[0, 512:3584], atol=1e-3)


def _slaney_hz_to_mel_scalar(f):
    f_sp = 200.0 / 3
    if f < 1000.0:
        return f / f_sp
    import math
    return 1000.0 / f_sp + math.log(f / 1000.0) / (math.log(6.4) / 27.0)


def _slaney_mel_to_hz_scalar(m):
    f_sp = 200.0 / 3
    if m < 1000.0 / f_sp:
        return m * f_sp
    import math
    return 1000.0 * math.exp((math.log(6.4) / 27.0) * (m - 1000.0 / f_sp))


def test_mel_filterbank_slaney():
    """Independent scalar re-derivation of the Slaney filterbank (the
    librosa.filters.mel default the reference uses, audio.py:53): explicit
    per-element triangle evaluation vs our vectorized construction."""
    sr, n_fft, n_mels, fmin, fmax = 22050, 1024, 80, 0.0, 8000.0
    fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)  # (513, 80)
    assert fb.shape == (513, 80)

    mel_pts = np.linspace(_slaney_hz_to_mel_scalar(fmin), _slaney_hz_to_mel_scalar(fmax), n_mels + 2)
    hz = [_slaney_mel_to_hz_scalar(m) for m in mel_pts]
    fftfreqs = [sr / 2.0 * i / (n_fft // 2) for i in range(1 + n_fft // 2)]

    rng = np.random.default_rng(0)
    for _ in range(200):
        m = int(rng.integers(0, n_mels))
        f = int(rng.integers(0, 513))
        lo, cen, hi = hz[m], hz[m + 1], hz[m + 2]
        x = fftfreqs[f]
        if x <= lo or x >= hi:
            w = 0.0
        elif x <= cen:
            w = (x - lo) / (cen - lo)
        else:
            w = (hi - x) / (hi - cen)
        w *= 2.0 / (hi - lo)
        np.testing.assert_allclose(fb[f, m], w, atol=1e-7, err_msg=f"fb[{f},{m}]")

    # analytic spot value: first filter peak at hz[1]=37.239 Hz, bin 1 = 21.533 Hz
    np.testing.assert_allclose(fb[1, 0], (21.533203125 / hz[1]) * 2.0 / hz[2], rtol=1e-6)
    # every mel channel has support
    assert (fb.sum(axis=0) > 0).all()


def test_mel_spectrogram_shape_and_range(rng):
    L = 256 * 32
    y = (rng.normal(size=(2, L)) * 0.1).astype(np.float32)
    mel = np.asarray(mel_spectrogram(jnp.asarray(y)))
    assert mel.shape == (2, 32, 80)
    assert np.isfinite(mel).all()
    assert mel.min() >= np.log(1e-5) - 1e-5


def test_mel_spectrogram_matches_torch_pipeline(rng):
    """Rebuild the reference's torch pipeline (audio.py:45-82) inline with our
    numpy filterbank, and compare our fused JAX version against it."""
    n_fft, hop, win, sr = 1024, 256, 1024, 22050
    L = hop * 16
    y = (rng.normal(size=(1, L)) * 0.1).astype(np.float32)

    yt = torch.from_numpy(y)
    pad = int((n_fft - hop) / 2)
    yt = torch.nn.functional.pad(yt.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    spec = torch.view_as_real(
        torch.stft(yt, n_fft, hop_length=hop, win_length=win, window=torch.hann_window(win),
                   center=False, pad_mode="reflect", normalized=False, onesided=True,
                   return_complex=True)
    )
    spec = torch.sqrt(spec.pow(2).sum(-1) + 1e-9)
    fb = torch.from_numpy(mel_filterbank(sr, n_fft, 80, 0.0, 8000.0).T)
    ref = torch.log(torch.clamp(torch.matmul(fb, spec), min=1e-5)).numpy()  # (B, 80, T)

    got = np.asarray(mel_spectrogram(jnp.asarray(y)))  # (B, T, 80)
    np.testing.assert_allclose(got.transpose(0, 2, 1), ref, atol=2e-3)


@pytest.mark.parametrize("length,hop", [(4100, 256), (4096, 250), (4100, 250)])
def test_stft_gather_fallback_matches_torch(rng, length, hop):
    """Non-hop-divisible length or hop∤n_fft: the reshape fast paths don't
    apply and the gather/scatter fallbacks must still match torch (they
    remain reachable for arbitrary-length audio through the device mel
    path)."""
    y = rng.normal(size=(1, length)).astype(np.float32) * 0.1
    ref = _torch_stft(y, 1024, hop, 1024, True).numpy()
    got = np.asarray(stft_complex(jnp.asarray(y), 1024, hop, 1024, center=True))
    np.testing.assert_allclose(got.transpose(0, 2, 1), ref, atol=2e-3)


def test_istft_scatter_fallback_matches_torch(rng):
    """hop ∤ n_fft → the overlap-add scatter fallback path."""
    y = rng.normal(size=(1, 8000)).astype(np.float32) * 0.1
    spec = _torch_stft(y, 1024, 250, 1024, True)
    ref = torch.istft(spec, 1024, hop_length=250, win_length=1024,
                      window=torch.hann_window(1024)).numpy()
    got = np.asarray(istft(jnp.asarray(spec.numpy().transpose(0, 2, 1)), 1024, 250, 1024))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-3)
