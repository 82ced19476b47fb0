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
        y_max_length = y.shape[1]
        spk_e = self._embed_spks(spks)
        x_mask, y_mask, attn_mask, mu_x, logw, attn = self._encode_align(
            x, x_lengths, y, y_lengths, spk_e, durations, deterministic)

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

    def _encode_align(self, x, x_lengths, y, y_lengths, spk_e, durations=None,
                      deterministic: bool = False):
        """Shared training-forward front half: masks, encoder, MAS alignment
        (reference: matcha_tts.py:177-199).  Used by both the loss forward
        (`__call__`) and the convergence probe (`training_probe`)."""
        cfg = self.cfg
        x_mask = sequence_mask(x_lengths, x.shape[1]).astype(jnp.float32)[..., None]
        y_mask = sequence_mask(y_lengths, y.shape[1]).astype(jnp.float32)[..., None]
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
        return x_mask, y_mask, attn_mask, mu_x, logw, attn

    def training_probe(self, x, x_lengths, y, y_lengths, spks=None,
                       n_timesteps: int = 10, temperature: float = 0.667, rng=None):
        """Deterministic convergence diagnostics for from-scratch training.

        The reference's only from-scratch convergence evidence is loss curves
        plus eyeballed TensorBoard alignment images
        (Matcha-TTS/matcha/models/baselightningmodule.py:177-216).  This
        probe makes alignment emergence *measurable* on a fixed batch:

        - ``mas_durations`` (B, T_x): per-token MAS frame counts — track L1
          drift between probes for duration *stability*;
        - ``diagonality``: 1 − mean |aligned text index − linear diagonal| /
          T_text over valid mel frames.  A degenerate alignment (one token
          absorbing most frames — the random-init state) scores low; a
          converged monotonic near-linear path approaches 1;
        - ``dur_mse_log``: predicted-vs-MAS duration MSE in log domain (the
          dur_loss formula, matcha_tts.py:203-204) — should → ~0;
        - ``dur_mae_frames``: the same gap in raw frames per token;
        - ``prior_mel_l1``: L1 of the aligned encoder mean μ_y to the target
          mel (the encoder-only reconstruction);
        - ``tf_mel_l1``: teacher-forced reconstruction — a full
          ``n_timesteps``-step Euler solve conditioned on the MAS-aligned
          μ_y, L1 to the ground-truth normalized mel.

        No dropout, no segment crop, explicit rng for the solver noise.
        """
        spk_e = self._embed_spks(spks)
        x_mask, y_mask, _, mu_x, logw, attn = self._encode_align(
            x, x_lengths, y, y_lengths, spk_e, None, deterministic=True)

        x_mask32 = x_mask.astype(jnp.float32)
        y_mask32 = y_mask.astype(jnp.float32)
        attn32 = attn.astype(jnp.float32)
        mas_dur = jnp.sum(attn32, axis=-1)  # (B, T_x)
        n_tokens = jnp.sum(x_lengths).astype(jnp.float32)

        logw32 = logw.astype(jnp.float32)[..., 0]  # (B, T_x)
        log_mas = jnp.log(1e-8 + mas_dur)
        dur_mse_log = jnp.sum(jnp.square(logw32 - log_mas) * x_mask32[..., 0]) / n_tokens
        pred_dur = jnp.exp(logw32) * x_mask32[..., 0]
        dur_mae_frames = jnp.sum(jnp.abs(pred_dur - mas_dur) * x_mask32[..., 0]) / n_tokens

        # aligned text index per mel frame vs the straight diagonal
        xs = jnp.arange(attn.shape[1], dtype=jnp.float32)
        idx = jnp.einsum("bxy,x->by", attn32, xs)  # (B, T_y)
        ts = jnp.arange(attn.shape[2], dtype=jnp.float32)[None, :]
        xl = x_lengths.astype(jnp.float32)[:, None]
        yl = y_lengths.astype(jnp.float32)[:, None]
        ideal = ts * (xl - 1.0) / jnp.maximum(yl - 1.0, 1.0)
        dev = jnp.abs(idx - ideal) * y_mask32[..., 0] / jnp.maximum(xl, 1.0)
        diagonality = 1.0 - jnp.sum(dev) / jnp.sum(y_lengths).astype(jnp.float32)

        mu_y = jnp.einsum("bxy,bxc->byc", attn32, mu_x.astype(jnp.float32))
        denom = jnp.sum(y_mask32) * self.cfg.n_feats
        prior_mel_l1 = jnp.sum(jnp.abs(mu_y - y) * y_mask32) / denom

        dec = self.decoder(mu_y, y_mask32, n_timesteps, temperature, spk_e, rng=rng)
        tf_mel_l1 = jnp.sum(jnp.abs(dec * y_mask32 - y) * y_mask32) / denom

        return {
            "mas_durations": mas_dur,
            "diagonality": diagonality,
            "dur_mse_log": dur_mse_log,
            "dur_mae_frames": dur_mae_frames,
            "prior_mel_l1": prior_mel_l1,
            "tf_mel_l1": tf_mel_l1,
        }

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
