"""Text encoder: phoneme embeddings → mel-prior `mu_x` + log-durations.

TPU-native re-design of the reference encoder
(reference: Matcha-TTS/matcha/models/components/text_encoder.py:328-410):
same math — scaled embedding, 3-layer conv prenet with residual, optional
speaker-embedding concat broadcast over time, 6-layer RoPE transformer with
channel LayerNorm, 1×1 mean-mel head, gradient-detached duration head —
in channels-last layout with all 1×1 convs as Dense (MXU matmuls) and the
RoPE cos/sin tables folded as compile-time constants.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from emojivoice_tpu.config import DurationPredictorConfig, EncoderConfig
from emojivoice_tpu.models.modules import ChannelLayerNorm, Conv1d, Dropout, masked_fill, time_broadcast
from emojivoice_tpu.ops.rope import apply_rope


class ConvReluNorm(nn.Module):
    """Conv prenet with residual 1×1 projection initialized to zero
    (reference: text_encoder.py:36-67)."""

    hidden_channels: int
    out_channels: int
    kernel_size: int = 5
    n_layers: int = 3
    p_dropout: float = 0.5

    @nn.compact
    def __call__(self, x, x_mask, deterministic: bool = True):
        x_org = x
        for i in range(self.n_layers):
            x = Conv1d(self.hidden_channels, self.kernel_size, padding=self.kernel_size // 2, name=f"conv_{i}")(
                x * x_mask
            )
            x = ChannelLayerNorm(name=f"norm_{i}")(x)
            x = nn.relu(x)
            x = Dropout(self.p_dropout)(x, deterministic)
        proj = nn.Dense(self.out_channels, kernel_init=nn.initializers.zeros, name="proj")
        x = x_org + proj(x)
        return x * x_mask


class DurationPredictor(nn.Module):
    """2×(conv→relu→LN→dropout) → 1-channel projection
    (reference: text_encoder.py:70-94)."""

    filter_channels: int
    kernel_size: int
    p_dropout: float

    @nn.compact
    def __call__(self, x, x_mask, deterministic: bool = True):
        x = Conv1d(self.filter_channels, self.kernel_size, padding=self.kernel_size // 2, name="conv_1")(x * x_mask)
        x = nn.relu(x)
        x = ChannelLayerNorm(name="norm_1")(x)
        x = Dropout(self.p_dropout)(x, deterministic)
        x = Conv1d(self.filter_channels, self.kernel_size, padding=self.kernel_size // 2, name="conv_2")(x * x_mask)
        x = nn.relu(x)
        x = ChannelLayerNorm(name="norm_2")(x)
        x = Dropout(self.p_dropout)(x, deterministic)
        x = nn.Dense(1, name="proj")(x * x_mask)
        return x * x_mask


class MultiHeadAttention(nn.Module):
    """Explicit softmax attention with RoPE on half the head dims
    (reference: text_encoder.py:175-252): 1×1-conv q/k/v (Dense here),
    scale 1/√k_channels, mask fill −1e4, RoPE dim = int(head_dim·0.5)."""

    channels: int
    out_channels: int
    n_heads: int
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, attn_mask=None, deterministic: bool = True):
        b, t, _ = x.shape
        h = self.n_heads
        k_channels = self.channels // h
        rope_dim = int(k_channels * 0.5)
        # the labml-style rotation needs an even rotated dim (cos/sin tables
        # pair dims); the reference inherits the same constraint
        # (text_encoder.py:97-172 builds arange(0, d, 2) caches) and would
        # crash identically — fail with the architecture fact instead
        if rope_dim % 2:
            raise ValueError(
                f"attention head dim {k_channels} (channels {self.channels} / "
                f"{h} heads, speaker emb included) gives odd RoPE dim "
                f"{rope_dim}; the per-head dim must be divisible by 4")

        q = nn.Dense(self.channels, name="conv_q")(x)
        k = nn.Dense(self.channels, name="conv_k")(x)
        v = nn.Dense(self.channels, name="conv_v")(x)

        # (B, T, H*C) → (B, H, T, C)
        def split(z):
            return z.reshape(b, t, h, k_channels).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        q = apply_rope(q, rope_dim)
        k = apply_rope(k, rope_dim)

        scores = jnp.einsum("bhqc,bhkc->bhqk", q, k) / jnp.sqrt(k_channels).astype(x.dtype)
        if attn_mask is not None:
            scores = masked_fill(scores, attn_mask)
        p_attn = jax.nn.softmax(scores, axis=-1)
        p_attn = Dropout(self.p_dropout)(p_attn, deterministic)
        out = jnp.einsum("bhqk,bhkc->bhqc", p_attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.channels)
        return nn.Dense(self.out_channels, name="conv_o")(out)


class FFN(nn.Module):
    """conv→relu→dropout→conv (reference: text_encoder.py:255-273)."""

    out_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, x_mask, deterministic: bool = True):
        x = Conv1d(self.filter_channels, self.kernel_size, padding=self.kernel_size // 2, name="conv_1")(x * x_mask)
        x = nn.relu(x)
        x = Dropout(self.p_dropout)(x, deterministic)
        x = Conv1d(self.out_channels, self.kernel_size, padding=self.kernel_size // 2, name="conv_2")(x * x_mask)
        return x * x_mask


class Encoder(nn.Module):
    """Post-norm transformer stack (reference: text_encoder.py:276-325)."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, x_mask, deterministic: bool = True):
        # attn_mask (B, 1, Tq, Tk)
        m = x_mask[..., 0]  # (B, T)
        attn_mask = (m[:, None, :, None] * m[:, None, None, :])
        for i in range(self.n_layers):
            x = x * x_mask
            y = MultiHeadAttention(
                self.hidden_channels, self.hidden_channels, self.n_heads, self.p_dropout, name=f"attn_{i}"
            )(x, attn_mask, deterministic)
            y = Dropout(self.p_dropout)(y, deterministic)
            x = ChannelLayerNorm(name=f"norm1_{i}")(x + y)
            y = FFN(
                self.hidden_channels, self.filter_channels, self.kernel_size, self.p_dropout, name=f"ffn_{i}"
            )(x, x_mask, deterministic)
            y = Dropout(self.p_dropout)(y, deterministic)
            x = ChannelLayerNorm(name=f"norm2_{i}")(x + y)
        return x * x_mask


class TextEncoder(nn.Module):
    """Full text encoder (reference: text_encoder.py:328-410).

    Inputs channels-last: x (B, T) int ids, x_mask (B, T, 1), spks (B, spk_emb_dim).
    Returns mu (B, T, n_feats), logw (B, T, 1), both masked.
    """

    encoder: EncoderConfig
    duration_predictor: DurationPredictorConfig
    n_vocab: int
    n_spks: int = 1
    spk_emb_dim: int = 64

    @nn.compact
    def __call__(self, x, x_mask, spks: Optional[jnp.ndarray] = None, deterministic: bool = True):
        cfg = self.encoder
        emb = nn.Embed(self.n_vocab, cfg.n_channels, embedding_init=nn.initializers.normal(cfg.n_channels**-0.5),
                       name="emb")
        h = emb(x)
        h = h * jnp.asarray(jnp.sqrt(cfg.n_channels), h.dtype)  # (B, T, C)
        x_mask = x_mask.astype(h.dtype)  # follow the compute dtype (f32/bf16)

        if cfg.prenet:
            h = ConvReluNorm(cfg.n_channels, cfg.n_channels, kernel_size=5, n_layers=3, p_dropout=0.5,
                             name="prenet")(h, x_mask, deterministic)

        if self.n_spks > 1:
            h = jnp.concatenate([h, time_broadcast(spks, h.shape[1])], axis=-1)

        h = Encoder(
            cfg.n_channels + (self.spk_emb_dim if self.n_spks > 1 else 0),
            cfg.filter_channels,
            cfg.n_heads,
            cfg.n_layers,
            cfg.kernel_size,
            cfg.p_dropout,
            name="encoder",
        )(h, x_mask, deterministic)

        mu = nn.Dense(cfg.n_feats, name="proj_m")(h) * x_mask

        # duration head sees detached features (reference: text_encoder.py:407-408)
        x_dp = jax.lax.stop_gradient(h)
        logw = DurationPredictor(
            self.duration_predictor.filter_channels_dp,
            self.duration_predictor.kernel_size,
            self.duration_predictor.p_dropout,
            name="proj_w",
        )(x_dp, x_mask, deterministic)

        return mu, logw
