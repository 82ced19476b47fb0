"""HiFi-GAN parity: torch generator (weight-normed, reference naming) vs
our JAX generator fed through the checkpoint converter."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F
from torch.nn.utils import weight_norm

from emojivoice_tpu.config import HiFiGANConfig
from emojivoice_tpu.io.torch_ckpt import convert_hifigan_state_dict
from emojivoice_tpu.vocoder import HiFiGANGenerator

LRELU = 0.1


def _pad(k, d=1):
    return (k * d - d) // 2


class TorchResBlock1(nn.Module):
    def __init__(self, ch, k, dils):
        super().__init__()
        self.convs1 = nn.ModuleList(
            [weight_norm(nn.Conv1d(ch, ch, k, 1, dilation=d, padding=_pad(k, d))) for d in dils]
        )
        self.convs2 = nn.ModuleList(
            [weight_norm(nn.Conv1d(ch, ch, k, 1, padding=_pad(k))) for _ in dils]
        )

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            x = c2(F.leaky_relu(c1(F.leaky_relu(x, LRELU)), LRELU)) + x
        return x


class TorchGenerator(nn.Module):
    """v1-architecture generator with reference state-dict naming."""

    def __init__(self, cfg: HiFiGANConfig):
        super().__init__()
        self.cfg = cfg
        self.num_kernels = len(cfg.resblock_kernel_sizes)
        self.conv_pre = weight_norm(nn.Conv1d(cfg.num_mels, cfg.upsample_initial_channel, 7, 1, padding=3))
        self.ups = nn.ModuleList()
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            self.ups.append(weight_norm(nn.ConvTranspose1d(
                cfg.upsample_initial_channel // (2**i),
                cfg.upsample_initial_channel // (2 ** (i + 1)), k, u, padding=(k - u) // 2)))
        self.resblocks = nn.ModuleList()
        for i in range(len(self.ups)):
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            for k, d in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
                self.resblocks.append(TorchResBlock1(ch, k, tuple(d)))
        self.conv_post = weight_norm(nn.Conv1d(ch, 1, 7, 1, padding=3))

    def forward(self, x):
        x = self.conv_pre(x)
        for i in range(len(self.ups)):
            x = self.ups[i](F.leaky_relu(x, LRELU))
            xs = None
            for j in range(self.num_kernels):
                r = self.resblocks[i * self.num_kernels + j](x)
                xs = r if xs is None else xs + r
            x = xs / self.num_kernels
        x = F.leaky_relu(x)  # torch default slope, like the reference
        return torch.tanh(self.conv_post(x))


def test_hifigan_parity_vs_reference_code(rng):
    """Oracle is the ACTUAL reference Generator (not our torch twin):
    /root/reference/Matcha-TTS/matcha/hifigan/models.py:148-206, imported
    directly (it is torch-only).  Random-init at the full v1 architecture,
    convert its weight-normed state_dict, compare waveforms."""
    import sys

    sys.path.insert(0, "/root/reference/Matcha-TTS")
    try:
        from matcha.hifigan.env import AttrDict
        from matcha.hifigan.models import Generator as RefGenerator
    finally:
        sys.path.pop(0)

    cfg = HiFiGANConfig()  # full v1: conv_pre in the reference hardcodes 80 mels
    h = AttrDict(
        dict(
            resblock=cfg.resblock,
            upsample_rates=list(cfg.upsample_rates),
            upsample_kernel_sizes=list(cfg.upsample_kernel_sizes),
            upsample_initial_channel=cfg.upsample_initial_channel,
            resblock_kernel_sizes=list(cfg.resblock_kernel_sizes),
            resblock_dilation_sizes=[list(d) for d in cfg.resblock_dilation_sizes],
        )
    )
    torch.manual_seed(1234)
    ref = RefGenerator(h).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_hifigan_state_dict(sd, cfg)
    ours = HiFiGANGenerator(cfg=cfg)

    mel = rng.normal(size=(1, 80, 16)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(mel)).numpy()[:, 0, :]
    got = np.asarray(ours.apply(params, jnp.asarray(mel.transpose(0, 2, 1))))
    assert got.shape == want.shape == (1, 16 * cfg.total_upsample)
    np.testing.assert_allclose(got, want, atol=2e-4)
    # sanity: a real waveform-scale signal, not degenerate
    assert float(np.abs(want).max()) > 1e-3


def test_hifigan_generator_parity(rng):
    cfg = HiFiGANConfig(
        upsample_rates=(4, 4),
        upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 3), (1, 3, 5))[0:1] * 2,
        num_mels=12,
    )
    torch.manual_seed(0)
    tg = TorchGenerator(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in tg.state_dict().items()}

    params = convert_hifigan_state_dict(sd, cfg)
    ours = HiFiGANGenerator(cfg=cfg)

    mel = rng.normal(size=(2, 12, 23)).astype(np.float32)
    with torch.no_grad():
        ref = tg(torch.from_numpy(mel)).numpy()[:, 0, :]
    got = np.asarray(ours.apply(params, jnp.asarray(mel.transpose(0, 2, 1))))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-5)


def test_weight_norm_mode_matches_reference_prefold(rng):
    """weight_norm=True generator loaded with fold=False reproduces the
    reference's TRAINING-time forward (weight norm active) — and folding the
    (v, g) params afterwards reproduces the serving kernels exactly."""
    import sys

    sys.path.insert(0, "/root/reference/Matcha-TTS")
    try:
        from matcha.hifigan.env import AttrDict
        from matcha.hifigan.models import Generator as RefGenerator
    finally:
        sys.path.pop(0)

    from emojivoice_tpu.io.torch_ckpt import fold_hifigan_weight_norm

    cfg = HiFiGANConfig()
    h = AttrDict(
        dict(
            resblock=cfg.resblock,
            upsample_rates=list(cfg.upsample_rates),
            upsample_kernel_sizes=list(cfg.upsample_kernel_sizes),
            upsample_initial_channel=cfg.upsample_initial_channel,
            resblock_kernel_sizes=list(cfg.resblock_kernel_sizes),
            resblock_dilation_sizes=[list(d) for d in cfg.resblock_dilation_sizes],
        )
    )
    torch.manual_seed(7)
    ref = RefGenerator(h).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    params_wn = convert_hifigan_state_dict(sd, cfg, fold=False)
    ours_wn = HiFiGANGenerator(cfg=cfg, weight_norm=True)

    mel = rng.normal(size=(1, 80, 12)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(mel)).numpy()[:, 0, :]
    got = np.asarray(ours_wn.apply(params_wn, jnp.asarray(mel.transpose(0, 2, 1))))
    np.testing.assert_allclose(got, want, atol=2e-4)

    # fold (v, g) → plain kernels == the fold-at-load conversion
    folded = fold_hifigan_weight_norm(params_wn)
    params_plain = convert_hifigan_state_dict(sd, cfg, fold=True)
    for (ka, va), (kb, vb) in zip(
        sorted(jax.tree_util.tree_flatten_with_path(folded)[0], key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_flatten_with_path(params_plain)[0], key=lambda kv: str(kv[0])),
    ):
        assert str(ka) == str(kb)
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=1e-6)


def test_gan_step_trains_weight_norm_params(rng):
    """One GAN step in weight_norm mode updates g and v (not folded kernels)."""
    from emojivoice_tpu.training.vocoder_train import (
        create_vocoder_state,
        make_vocoder_train_step,
    )

    # thin generator but the real ×256 upsample (hop-256 mel in the GAN loss)
    cfg = HiFiGANConfig(
        upsample_rates=(8, 8, 2, 2), upsample_kernel_sizes=(16, 16, 4, 4),
        upsample_initial_channel=32, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), num_mels=80,
    )
    state, modules = create_vocoder_state(cfg, segment_frames=16, weight_norm=True)
    leaves = jax.tree_util.tree_flatten_with_path(state.gen_params)[0]
    names = {str(path[-1]) for path, _ in leaves}
    assert any("'v'" in n or n.endswith("v')") for n in map(str, names)) or any(
        "v" == str(p[-1].key) for p, _ in leaves if hasattr(p[-1], "key")
    )
    step = make_vocoder_train_step(cfg, modules)
    wav = rng.normal(size=(2, 16 * cfg.total_upsample)).astype(np.float32) * 0.1
    from emojivoice_tpu.ops.mel import mel_spectrogram

    mel = np.asarray(mel_spectrogram(jnp.asarray(wav), 1024, cfg.num_mels,
                                     cfg.sampling_rate, 256, 1024, 0.0, 8000.0))[:, :16, :]
    before = jax.device_get(state.gen_params)
    state, metrics = step(state, {"mel": jnp.asarray(mel), "wav": jnp.asarray(wav)})
    after = jax.device_get(state.gen_params)
    assert np.isfinite(float(metrics["g_loss"]))
    g_before = before["params"]["conv_pre"]["g"]
    g_after = after["params"]["conv_pre"]["g"]
    assert not np.allclose(g_before, g_after)


def test_denoiser_parity_vs_reference_code(rng):
    """Oracle is the ACTUAL reference Denoiser (hifigan/denoiser.py:7-64,
    torch-only import) built on the ACTUAL reference Generator: same
    weights on both sides, same zero-mel bias probe, same strength —
    denoised audio must match."""
    import sys

    sys.path.insert(0, "/root/reference/Matcha-TTS")
    try:
        from matcha.hifigan.denoiser import Denoiser as RefDenoiser
        from matcha.hifigan.models import Generator as RefGenerator
    finally:
        sys.path.pop(0)

    from types import SimpleNamespace

    from emojivoice_tpu.vocoder import Denoiser as OurDenoiser

    cfg = HiFiGANConfig()
    h = SimpleNamespace(
        resblock="1",
        upsample_rates=list(cfg.upsample_rates),
        upsample_kernel_sizes=list(cfg.upsample_kernel_sizes),
        upsample_initial_channel=cfg.upsample_initial_channel,
        resblock_kernel_sizes=list(cfg.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in cfg.resblock_dilation_sizes],
    )
    torch.manual_seed(3)
    ref_gen = RefGenerator(h)
    ref_gen.remove_weight_norm()
    ref_gen.eval()
    ref_den = RefDenoiser(ref_gen, mode="zeros")

    sd = {k: v.numpy() for k, v in ref_gen.state_dict().items()}
    ours_params = convert_hifigan_state_dict(sd, cfg)
    voc = HiFiGANGenerator(cfg=cfg)
    our_den = OurDenoiser(lambda m: voc.apply(ours_params, m), mode="zeros", num_mels=cfg.num_mels)

    audio = (rng.normal(size=(1, 8192)) * 0.3).astype(np.float32)
    strength = 0.00025
    with torch.no_grad():
        ref_out = ref_den(torch.from_numpy(audio), strength=strength).numpy()
    our_out = np.asarray(our_den(jnp.asarray(audio), strength))

    n = min(ref_out.shape[-1], our_out.shape[-1])
    mae = float(np.abs(our_out[..., :n].squeeze() - ref_out[..., :n].squeeze()).mean())
    assert mae < 1e-5, mae
