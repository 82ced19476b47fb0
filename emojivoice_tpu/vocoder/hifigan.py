"""HiFi-GAN generator (v1) — mel → waveform, channels-last.

TPU-native re-design of the reference vocoder
(reference: Matcha-TTS/matcha/hifigan/models.py:148-206): 7-tap pre-conv,
4 transposed-conv upsample stages (8·8·2·2 = ×256) each followed by a
multi-receptive-field fusion (3 parallel dilated res-blocks, averaged),
7-tap post-conv + tanh.

Weight norm is folded into plain kernels at load time (the reference does
the same via ``remove_weight_norm`` before inference, models.py:199-206;
see ``emojivoice_tpu.io.torch_ckpt.load_hifigan``), so the hot path is pure
convs.  In channels-last layout each upsample stage is an input-dilated conv
XLA maps straight onto the MXU; the whole generator fuses into the same XLA
program as the acoustic model for single-call synthesis.

Only the generator is needed at runtime; the GAN discriminators exist for
vocoder training parity in ``emojivoice_tpu.vocoder.discriminators``.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from emojivoice_tpu.config import HiFiGANConfig
from emojivoice_tpu.models.modules import Conv1d, ConvTranspose1d

LRELU_SLOPE = 0.1


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


class ResBlock1(nn.Module):
    """MRF res-block: 3 × (leaky→dilated conv→leaky→conv) with residuals
    (reference: hifigan/models.py:14-104)."""

    channels: int
    kernel_size: int = 3
    dilation: tuple = (1, 3, 5)
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilation):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = Conv1d(self.channels, self.kernel_size, padding=get_padding(self.kernel_size, d),
                        dilation=d, weight_norm=self.weight_norm, name=f"convs1_{i}")(xt)
            xt = nn.leaky_relu(xt, LRELU_SLOPE)
            xt = Conv1d(self.channels, self.kernel_size, padding=get_padding(self.kernel_size, 1),
                        weight_norm=self.weight_norm, name=f"convs2_{i}")(xt)
            x = xt + x
        return x


class ResBlock2(nn.Module):
    """2-conv variant (reference: hifigan/models.py:106-145)."""

    channels: int
    kernel_size: int = 3
    dilation: tuple = (1, 3)
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilation):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = Conv1d(self.channels, self.kernel_size, padding=get_padding(self.kernel_size, d),
                        dilation=d, weight_norm=self.weight_norm, name=f"convs_{i}")(xt)
            x = xt + x
        return x


class HiFiGANGenerator(nn.Module):
    """mel (B, T, num_mels) → waveform (B, T·256) in [-1, 1]
    (reference: hifigan/models.py:148-197).

    subpixel_upsample selects the phase-decomposed lowering for the
    transposed-conv upsample stages (identical numerics)."""

    cfg: HiFiGANConfig
    subpixel_upsample: bool = False
    weight_norm: bool = False  # train-time reparameterization; fold for serving

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        wn = self.weight_norm
        num_kernels = len(cfg.resblock_kernel_sizes)
        res_cls = ResBlock1 if cfg.resblock == "1" else ResBlock2

        x = Conv1d(cfg.upsample_initial_channel, 7, padding=3, weight_norm=wn, name="conv_pre")(x)
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            x = nn.leaky_relu(x, LRELU_SLOPE)
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            x = ConvTranspose1d(ch, k, stride=u, padding=(k - u) // 2, subpixel=self.subpixel_upsample,
                                weight_norm=wn, name=f"ups_{i}")(x)
            xs = None
            for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)):
                block = res_cls(ch, rk, tuple(rd), weight_norm=wn,
                                name=f"resblocks_{i * num_kernels + j}")
                xs = block(x) if xs is None else xs + block(x)
            x = xs / num_kernels
        # reference uses the torch default slope (0.01) for this last
        # activation (models.py:193) — reproduced for waveform parity.
        x = nn.leaky_relu(x, 0.01)
        x = Conv1d(1, 7, padding=3, weight_norm=wn, name="conv_post")(x)
        return jnp.tanh(x)[..., 0]
