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
