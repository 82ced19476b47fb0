"""CFM estimator: 1-D U-Net over mel-time, channels-last.

TPU-native re-design of the reference decoder
(reference: Matcha-TTS/matcha/models/components/decoder.py:200-443 and
transformer.py:17-316).  Structure for the default config
``channels=(256, 256)``:

  down₀: resnet(in→256) → transformer → stride-2 conv   (time ×1/2)
  down₁: resnet(256→256) → transformer → k3 conv        (time ×1)
  mid×2: resnet → transformer
  up₀:   resnet(cat skip, 512→256) → transformer → convtranspose ×2
  up₁:   resnet(cat skip, 512→256) → transformer → k3 conv
  final: Block1D → 1×1 proj → mask

Time conditioning: sinusoidal embedding (scale 1000) → SiLU MLP, injected
inside every resnet block.  Attention inside the transformer blocks
replicates diffusers' ``Attention`` + ``AttnProcessor2_0`` numerics,
including the reference's additive-0/1 attention-mask quirk: the float mask
is *added* to the scores (diffusers treats float masks as bias), so padded
frames get a −1 relative bias rather than −inf.  ``strict_mask=True``
switches to true masking for from-scratch training.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from emojivoice_tpu.config import DecoderConfig
from emojivoice_tpu.models.modules import Conv1d, ConvTranspose1d, Dropout, mish, snake_beta


def sinusoidal_pos_emb(t: jnp.ndarray, dim: int, scale: float = 1000.0) -> jnp.ndarray:
    """(B,) → (B, dim) (reference: decoder.py:14-29)."""
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * (-jnp.log(10000.0) / (half - 1)))
    ang = scale * t[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class TimestepEmbedding(nn.Module):
    """linear → silu → linear (reference: decoder.py:73-117)."""

    time_embed_dim: int

    @nn.compact
    def __call__(self, sample):
        sample = nn.Dense(self.time_embed_dim, name="linear_1")(sample)
        sample = nn.silu(sample)
        return nn.Dense(self.time_embed_dim, name="linear_2")(sample)


class Block1D(nn.Module):
    """conv3 → GroupNorm(8) → Mish, masked (reference: decoder.py:32-43)."""

    dim_out: int
    groups: int = 8

    @nn.compact
    def __call__(self, x, mask):
        h = Conv1d(self.dim_out, 3, padding=1, name="conv")(x * mask)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, name="norm")(h)
        return mish(h) * mask


class ResnetBlock1D(nn.Module):
    """Two masked conv blocks with time-embedding injection + 1×1 residual
    (reference: decoder.py:46-61)."""

    dim_out: int
    groups: int = 8

    @nn.compact
    def __call__(self, x, mask, time_emb):
        h = Block1D(self.dim_out, self.groups, name="block1")(x, mask)
        t = nn.Dense(self.dim_out, name="mlp")(mish(time_emb))
        h = h + t[:, None, :]
        h = Block1D(self.dim_out, self.groups, name="block2")(h, mask)
        return h + nn.Dense(self.dim_out, name="res_conv")(x * mask)


class DiffusersAttention(nn.Module):
    """diffusers.models.attention_processor.Attention numerics:
    bias-free q/k/v, biased out proj, scale = head_dim^-0.5, float
    attention mask applied additively."""

    dim: int
    heads: int
    head_dim: int
    dropout: float = 0.0
    strict_mask: bool = False

    @nn.compact
    def __call__(self, x, attn_mask: Optional[jnp.ndarray] = None, deterministic: bool = True):
        b, t, _ = x.shape
        inner = self.heads * self.head_dim
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(x)
        v = nn.Dense(inner, use_bias=False, name="to_v")(x)

        def split(z):
            return z.reshape(b, t, self.heads, self.head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum("bhqc,bhkc->bhqk", q, k) / jnp.sqrt(self.head_dim).astype(x.dtype)
        if attn_mask is not None:
            if self.strict_mask:
                scores = jnp.where(attn_mask[:, None, None, :] > 0, scores, jnp.asarray(-1e9, scores.dtype))
            else:
                # reference-parity additive 0/1 bias (diffusers float-mask path)
                scores = scores + attn_mask[:, None, None, :].astype(scores.dtype)
        p = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkc->bhqc", p, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, inner)
        out = nn.Dense(self.dim, name="to_out")(out)
        return Dropout(self.dropout)(out, deterministic)


class SnakeBetaFFN(nn.Module):
    """FeedForward with SnakeBeta projection activation
    (reference: transformer.py:17-134, act_fn='snakebeta')."""

    dim_out: int
    inner_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(self.inner_dim, name="proj_in")(x)
        alpha = self.param("alpha", nn.initializers.zeros, (self.inner_dim,))
        beta = self.param("beta", nn.initializers.zeros, (self.inner_dim,))
        h = snake_beta(h, alpha, beta)
        h = Dropout(self.dropout)(h, deterministic)
        return nn.Dense(self.dim_out, name="proj_out")(h)


class BasicTransformerBlock(nn.Module):
    """Pre-norm self-attention + FFN block (reference: transformer.py:137-316,
    plain layer_norm path — the AdaLayerNorm branches are config-dead in the
    reference and intentionally not carried over)."""

    dim: int
    heads: int
    head_dim: int
    dropout: float = 0.0
    ff_mult: int = 4
    strict_mask: bool = False

    @nn.compact
    def __call__(self, x, attn_mask=None, deterministic: bool = True):
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = x + DiffusersAttention(
            self.dim, self.heads, self.head_dim, self.dropout, self.strict_mask, name="attn1"
        )(h, attn_mask, deterministic)
        h = nn.LayerNorm(epsilon=1e-5, name="norm3")(x)
        x = x + SnakeBetaFFN(self.dim, self.dim * self.ff_mult, self.dropout, name="ff")(h, deterministic)
        return x


class Decoder(nn.Module):
    """U-Net CFM estimator (reference: decoder.py:200-443).

    __call__(x, mask, mu, t, spks) with x, mu (B, T, n_feats), mask (B, T, 1),
    t (B,), spks (B, spk_emb_dim) or None → (B, T, out_channels).
    """

    cfg: DecoderConfig
    in_channels: int
    out_channels: int
    strict_mask: bool = False

    @nn.compact
    def __call__(self, x, mask, mu, t, spks=None, deterministic: bool = True):
        cfg = self.cfg
        channels = tuple(cfg.channels)
        time_embed_dim = channels[0] * 4

        # time embedding computed in f32 for phase precision, then cast to
        # the compute dtype so bf16 runs stay bf16 end-to-end
        temb = sinusoidal_pos_emb(t.astype(jnp.float32), self.in_channels)
        temb = TimestepEmbedding(time_embed_dim, name="time_mlp")(temb).astype(x.dtype)

        h = jnp.concatenate([x, mu], axis=-1)
        if spks is not None:
            h = jnp.concatenate([h, jnp.broadcast_to(spks[:, None, :], (h.shape[0], h.shape[1], spks.shape[-1]))],
                                axis=-1)

        def run_transformers(h, m, prefix, block_type: str):
            for j in range(cfg.n_blocks):
                if block_type == "conformer":
                    from emojivoice_tpu.models.conformer import ConformerBlock

                    h = ConformerBlock(
                        h.shape[-1], cfg.num_heads, cfg.attention_head_dim, cfg.dropout,
                        name=f"{prefix}_tblock_{j}",
                    )(h, m[..., 0], deterministic)
                elif block_type == "transformer":
                    h = BasicTransformerBlock(
                        h.shape[-1], cfg.num_heads, cfg.attention_head_dim, cfg.dropout,
                        strict_mask=self.strict_mask, name=f"{prefix}_tblock_{j}",
                    )(h, m[..., 0], deterministic)
                else:
                    raise ValueError(f"Unknown block type {block_type!r}")
            return h

        hiddens = []
        masks = [mask]
        for i, out_ch in enumerate(channels):
            is_last = i == len(channels) - 1
            m = masks[-1]
            h = ResnetBlock1D(out_ch, name=f"down_{i}_resnet")(h, m, temb)
            h = run_transformers(h, m, f"down_{i}", cfg.down_block_type)
            hiddens.append(h)
            if not is_last:
                h = Conv1d(out_ch, 3, stride=2, padding=1, name=f"down_{i}_downsample")(h * m)
            else:
                h = Conv1d(out_ch, 3, padding=1, name=f"down_{i}_downsample")(h * m)
            masks.append(m[:, ::2, :])

        masks = masks[:-1]
        m_mid = masks[-1]
        for i in range(cfg.num_mid_blocks):
            h = ResnetBlock1D(channels[-1], name=f"mid_{i}_resnet")(h, m_mid, temb)
            h = run_transformers(h, m_mid, f"mid_{i}", cfg.mid_block_type)

        up_channels = channels[::-1] + (channels[0],)
        for i in range(len(up_channels) - 1):
            out_ch = up_channels[i + 1]
            is_last = i == len(up_channels) - 2
            m = masks.pop()
            h = jnp.concatenate([h, hiddens.pop()], axis=-1)
            h = ResnetBlock1D(out_ch, name=f"up_{i}_resnet")(h, m, temb)
            h = run_transformers(h, m, f"up_{i}", cfg.up_block_type)
            if not is_last:
                h = ConvTranspose1d(out_ch, 4, stride=2, padding=1, name=f"up_{i}_upsample")(h * m)
            else:
                h = Conv1d(out_ch, 3, padding=1, name=f"up_{i}_upsample")(h * m)
        m_final = m

        h = Block1D(up_channels[-1], name="final_block")(h, m_final)
        out = nn.Dense(self.out_channels, name="final_proj")(h * m_final)
        return out * mask
