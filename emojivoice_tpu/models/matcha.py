"""MatchaTTS-equivalent top-level acoustic model (text → mel), channels-last.

TPU-native re-design of the reference model
(reference: Matcha-TTS/matcha/models/matcha_tts.py:26-246).  Key departures,
all XLA-motivated:

* static bucketed shapes — `synthesise` takes a static mel capacity instead
  of the reference's `.item()` graph break (matcha_tts.py:124-126);
* MAS runs on device (emojivoice_tpu.ops.mas) instead of round-tripping to a
  Cython CPU kernel;
* the training-time "Grad-TTS hack" segment crop (matcha_tts.py:209-231,
  a Python loop over the batch in the reference) is a vmapped
  `dynamic_slice`;
* explicit PRNG keys everywhere.

Fork quirk reproduced deliberately: ``w_ceil = ceil(exp(logw)) * length_scale``
— the fork applies length_scale *after* the ceil (matcha_tts.py:123),
yielding fractional frame durations; the released emoji checkpoints were
tuned against this behavior.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from emojivoice_tpu.config import ModelConfig
from emojivoice_tpu.models.cfm import CFM
from emojivoice_tpu.models.text_encoder import TextEncoder
from emojivoice_tpu.ops.mas import maximum_path
from emojivoice_tpu.utils.masks import generate_path, sequence_mask


class MatchaTTS(nn.Module):
    cfg: ModelConfig
    strict_mask: bool = False

    def setup(self):
        cfg = self.cfg
        if cfg.n_spks > 1:
            self.spk_emb = nn.Embed(cfg.n_spks, cfg.spk_emb_dim, name="spk_emb")
        self.encoder = TextEncoder(
            encoder=cfg.encoder,
            duration_predictor=cfg.duration_predictor,
            n_vocab=cfg.n_vocab,
            n_spks=cfg.n_spks,
            spk_emb_dim=cfg.spk_emb_dim,
            name="encoder",
        )
        self.decoder = CFM(
            cfg=cfg.cfm,
            decoder=cfg.decoder,
            n_feats=cfg.n_feats,
            n_spks=cfg.n_spks,
            spk_emb_dim=cfg.spk_emb_dim,
            strict_mask=self.strict_mask,
            name="decoder",
        )

    # ------------------------------------------------------------------ #
    # Inference
    # ------------------------------------------------------------------ #

    def _embed_spks(self, spks):
        if self.cfg.n_spks > 1:
            return self.spk_emb(spks.astype(jnp.int32))
        return None

    def encode_text(self, x, x_lengths, spks=None, length_scale: float = 1.0, deterministic: bool = True):
        """Stage A: encoder + durations.  Returns (mu_x, w_ceil, y_lengths,
        x_mask, spk_e).  y_lengths is traced; the host reads it to pick a mel
        bucket (the reference's `.item()` boundary, made explicit)."""
        spk_e = self._embed_spks(spks)
        x_mask = sequence_mask(x_lengths, x.shape[1]).astype(jnp.float32)[..., None]
        mu_x, logw = self.encoder(x, x_mask, spk_e, deterministic)
        # duration math always in f32 (ceil/cumsum precision), regardless of
        # the encoder's compute dtype
        w = jnp.exp(logw.astype(jnp.float32)) * x_mask
        w_ceil = jnp.ceil(w) * length_scale  # fork quirk: scale after ceil
        y_lengths = jnp.maximum(jnp.sum(w_ceil, axis=(1, 2)), 1.0).astype(jnp.int32)
        return mu_x, w_ceil, y_lengths, x_mask, spk_e

    def decode_mel(
        self,
        mu_x,
        w_ceil,
        y_lengths,
        x_mask,
        spk_e,
        y_max_length: int,
        n_timesteps: int = 10,
        temperature: float = 1.0,
        rng=None,
        z=None,
    ):
        """Stage B: alignment expansion + CFM sampling at a static mel bucket.

        Returns dict with encoder_outputs / decoder_outputs (normalized mel,
        (B, T_mel, n_feats)), attn, mel (denormalized), mel_lengths.
        """
        cfg = self.cfg
        dtype = mu_x.dtype  # follow the pipeline's compute dtype (f32 or bf16)
        y_lengths = jnp.minimum(y_lengths, y_max_length)
        # duration→path math stays f32 (cumsum comparisons), then casts down
        y_mask32 = sequence_mask(y_lengths, y_max_length).astype(jnp.float32)[..., None]
        attn_mask32 = x_mask.astype(jnp.float32) * y_mask32.transpose(0, 2, 1)  # (B, T_x, T_y)
        attn = generate_path(w_ceil[..., 0].astype(jnp.float32), attn_mask32).astype(dtype)
        y_mask = y_mask32.astype(dtype)

        # mu_y[b, t_mel, c] = Σ_x attn[b, x, t_mel] · mu_x[b, x, c]   (MXU)
        mu_y = jnp.einsum("bxy,bxc->byc", attn, mu_x)

        dec = self.decoder(mu_y, y_mask, n_timesteps, temperature, spk_e, rng=rng, z=z)
        dec = dec * y_mask

        stats = cfg.data_statistics
        mel = dec * stats.mel_std + stats.mel_mean
        return {
            "encoder_outputs": mu_y,
            "decoder_outputs": dec,
            "attn": attn,
            "mel": mel,
            "mel_lengths": y_lengths,
        }

    def synthesise(
        self,
        x,
        x_lengths,
        y_max_length: int,
        n_timesteps: int = 10,
        temperature: float = 1.0,
        spks=None,
        length_scale: float = 1.0,
        rng=None,
        z=None,
    ):
        """Single fused program: text ids → mel, with static mel capacity
        `y_max_length` (reference entry: matcha_tts.py:77-152).  Frames past
        the predicted length are masked to zero."""
        mu_x, w_ceil, y_lengths, x_mask, spk_e = self.encode_text(x, x_lengths, spks, length_scale)
        return self.decode_mel(
            mu_x, w_ceil, y_lengths, x_mask, spk_e, y_max_length, n_timesteps, temperature, rng=rng, z=z
        )

    # ------------------------------------------------------------------ #
    # Training
    # ------------------------------------------------------------------ #

    def __call__(
        self,
        x,
        x_lengths,
        y,
        y_lengths,
        spks=None,
        durations=None,
        out_size: Optional[int] = None,
        rng=None,
        deterministic: bool = False,
        row_mask=None,
        t=None,
        z=None,
    ):
        """Training forward → (dur_loss, prior_loss, diff_loss, attn)
        (reference: matcha_tts.py:154-246).

        x (B, T_x) int ids; y (B, T_y, n_feats) normalized mel; rng required.
        row_mask (B,) optionally zero-weights whole rows — the training
        loop's uneven-final-batch padding (the reference's DDP drops these
        batches instead); None reproduces the reference losses exactly.
        t/z inject the CFM time/noise draws (parity tests pin them against
        the reference's ambient torch RNG); None draws from rng.
        """
        cfg = self.cfg
        spk_e = self._embed_spks(spks)
        x_mask = sequence_mask(x_lengths, x.shape[1]).astype(jnp.float32)[..., None]
        y_max_length = y.shape[1]
        y_mask = sequence_mask(y_lengths, y_max_length).astype(jnp.float32)[..., None]
        attn_mask = x_mask * y_mask.transpose(0, 2, 1)  # (B, T_x, T_y)

        mu_x, logw = self.encoder(x, x_mask, spk_e, deterministic)

        if cfg.use_precomputed_durations and durations is not None:
            attn = generate_path(durations, attn_mask)
        else:
            # MAS over the Gaussian log-prior −½‖y−μ‖² + const, fully on
            # device (reference computes this via three matmuls then syncs
            # to CPU; matcha_tts.py:190-199).
            const = -0.5 * math.log(2 * math.pi) * cfg.n_feats
            y_sq = -0.5 * jnp.sum(jnp.square(y), axis=-1)  # (B, T_y)
            cross = jnp.einsum("bxc,byc->bxy", mu_x, y)
            mu_sq = -0.5 * jnp.sum(jnp.square(mu_x), axis=-1)  # (B, T_x)
            log_prior = y_sq[:, None, :] + cross + mu_sq[:, :, None] + const
            # cut gradients BEFORE the kernel (not after): MAS is
            # non-differentiable by construction (reference wraps it in
            # no_grad, matcha_tts.py:190) and zero input tangents let jax
            # skip the JVP of the aliased pallas_call entirely
            attn = maximum_path(jax.lax.stop_gradient(log_prior), attn_mask)

        # duration loss on log-durations (reference: matcha_tts.py:203-204).
        # Loss math in f32: bf16 integer duration counts round above 256 and
        # bf16 sums over B·T lose precision (no-op casts under f32 training).
        logw_ = jnp.log(1e-8 + jnp.sum(attn.astype(jnp.float32), axis=-1))[..., None] * x_mask.astype(jnp.float32)
        dur_se = jnp.square(logw.astype(jnp.float32) - logw_)
        if row_mask is None:
            dur_loss = jnp.sum(dur_se) / jnp.sum(x_lengths)
        else:
            rw = row_mask.astype(dur_se.dtype)
            dur_loss = jnp.sum(dur_se * rw[:, None, None]) / jnp.sum(rw * x_lengths)

        if out_size is not None and out_size < y_max_length:
            rng, crop_rng = jax.random.split(rng)
            y, attn, y_mask = self._segment_crop(crop_rng, y, attn, y_lengths, out_size)

        # mask/path math above is f32; the decoder computes in the batch's
        # dtype (bf16 under mixed precision) — binary attn casts exactly
        dtype = y.dtype
        mu_y = jnp.einsum("bxy,bxc->byc", attn.astype(dtype), mu_x.astype(dtype))

        diff_loss, _ = self.decoder.compute_loss(
            y, y_mask.astype(dtype), mu_y, spk_e, rng=rng, deterministic=deterministic,
            row_mask=row_mask, t=t, z=z,
        )

        if cfg.prior_loss:
            y32, mu_y32, y_mask32 = (a.astype(jnp.float32) for a in (y, mu_y, y_mask))
            prior_se = 0.5 * (jnp.square(y32 - mu_y32) + math.log(2 * math.pi)) * y_mask32
            if row_mask is None:
                prior_loss = jnp.sum(prior_se) / (jnp.sum(y_mask32) * cfg.n_feats)
            else:
                rw3 = row_mask.astype(jnp.float32)[:, None, None]
                prior_loss = jnp.sum(prior_se * rw3) / (jnp.sum(y_mask32 * rw3) * cfg.n_feats)
        else:
            prior_loss = jnp.asarray(0.0)

        return dur_loss, prior_loss, diff_loss, attn

    @staticmethod
    def _segment_crop(rng, y, attn, y_lengths, out_size: int):
        """Vectorized "Grad-TTS hack": random out_size-frame crop per item
        (reference: matcha_tts.py:209-231, a host-side Python loop there).

        Requires y.shape[1] ≥ out_size (collate guarantees this).
        """
        b = y.shape[0]
        max_offset = jnp.maximum(y_lengths - out_size, 0)
        u = jax.random.uniform(rng, (b,))
        # uniform over [0, max_offset-1] when max_offset > 0, else 0 —
        # same support as the reference's random.choice(range(0, end)).
        offsets = jnp.floor(u * max_offset.astype(u.dtype)).astype(jnp.int32)

        def cut(y_i, attn_i, off):
            y_c = jax.lax.dynamic_slice(y_i, (off, 0), (out_size, y_i.shape[1]))
            a_c = jax.lax.dynamic_slice(attn_i, (0, off), (attn_i.shape[0], out_size))
            return y_c, a_c

        y_cut, attn_cut = jax.vmap(cut)(y, attn, offsets)
        y_cut_lengths = jnp.minimum(y_lengths, out_size)
        y_cut_mask = sequence_mask(y_cut_lengths, out_size).astype(jnp.float32)[..., None]
        # zero out positions past the cut length (short items keep padding);
        # multiply in each operand's own dtype (y may be bf16, attn is f32)
        y_cut = y_cut * y_cut_mask.astype(y_cut.dtype)
        attn_cut = attn_cut * y_cut_mask.transpose(0, 2, 1).astype(attn_cut.dtype)
        return y_cut, attn_cut, y_cut_mask
