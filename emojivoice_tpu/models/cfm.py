"""Optimal-transport conditional flow matching.

TPU-native equivalent of the reference CFM
(reference: Matcha-TTS/matcha/models/components/flow_matching.py:12-132).
The fixed-step Euler solver is *unrolled at trace time* (n_timesteps is a
static Python int), so all ODE steps fuse into one XLA program — the
property the reference only achieves via ONNX export with baked steps
(onnx/export.py:41-53).  RNG is explicit: callers pass a PRNG key instead of
relying on ambient torch RNG state.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from emojivoice_tpu.config import CFMConfig, DecoderConfig
from emojivoice_tpu.models.decoder import Decoder


class CFM(nn.Module):
    """Wraps the U-Net estimator with the Euler sampler and the CFM loss."""

    cfg: CFMConfig
    decoder: DecoderConfig
    n_feats: int
    n_spks: int = 1
    spk_emb_dim: int = 64
    strict_mask: bool = False

    def setup(self):
        in_channels = 2 * self.n_feats + (self.spk_emb_dim if self.n_spks > 1 else 0)
        self.estimator = Decoder(
            cfg=self.decoder,
            in_channels=in_channels,
            out_channels=self.n_feats,
            strict_mask=self.strict_mask,
            name="estimator",
        )

    def __call__(self, mu, mask, n_timesteps: int, temperature: float = 1.0, spks=None, *, rng=None, z=None):
        """Sample a mel given the encoder prior `mu` (B, T, n_feats).

        Provide either `rng` (PRNG key for the initial noise) or `z`
        (explicit noise, used by parity tests).  Reference semantics:
        flow_matching.py:32-85 — z ~ N(0, T²), Euler over t ∈ [0, 1].
        """
        if z is None:
            if rng is None:
                raise ValueError("CFM sampling needs `rng` or explicit `z`")
            # noise is always drawn in f32 so bf16 and f32 runs see the same
            # sample stream, then cast to the compute dtype; temperature may
            # arrive as a traced f32 scalar
            z = (jax.random.normal(rng, mu.shape, jnp.float32) * temperature).astype(mu.dtype)
        return self.solve_euler(z.astype(mu.dtype) * mask, mu, mask, n_timesteps, spks)

    def solve_euler(self, x, mu, mask, n_timesteps: int, spks=None):
        # Uniform t grid: t_span = linspace(0, 1, n+1); dt constant.
        dt = 1.0 / n_timesteps
        for step in range(n_timesteps):
            t = jnp.full((x.shape[0],), step * dt, x.dtype)
            dphi_dt = self.estimator(x, mask, mu, t, spks)
            x = x + dt * dphi_dt
        return x

    def compute_loss(self, x1, mask, mu, spks=None, *, rng=None, deterministic: bool = False,
                     t=None, z=None, row_mask=None):
        """CFM training loss (reference: flow_matching.py:87-118).

        x1: target mel (B, T, n_feats); mask (B, T, 1).
        t/z may be injected explicitly (parity tests); otherwise drawn from rng.
        row_mask (B,) optionally weights whole batch rows (0 = padding row
        contributing nothing to value or gradient — used by the training
        loop's uneven-final-batch padding); None = reference behavior.
        Returns (loss, y) with y the noisy interpolant.
        """
        b = mu.shape[0]
        if t is None or z is None:
            t_rng, z_rng = jax.random.split(rng)
            # invariant: noise is always DRAWN in f32 (bf16 sampling changes
            # the stream), then cast to the compute dtype
            if t is None:
                t = jax.random.uniform(t_rng, (b, 1, 1), jnp.float32).astype(x1.dtype)
            if z is None:
                z = jax.random.normal(z_rng, x1.shape, jnp.float32).astype(x1.dtype)

        sigma_min = self.cfg.sigma_min
        y = (1 - (1 - sigma_min) * t) * z + t * x1
        u = x1 - (1 - sigma_min) * z

        pred = self.estimator(y, mask, mu, t[:, 0, 0], spks, deterministic=deterministic)
        # NOTE(parity): like the reference (flow_matching.py:115), the squared
        # error is summed over *all* positions — the estimator output is
        # masked but the target u is not, so padded frames add a
        # parameter-independent noise term to the loss value (zero gradient:
        # pred ≡ 0 there).  Kept for loss-curve comparability.
        # loss math in f32 regardless of compute dtype (bf16 sums over B·T·C
        # elements lose precision); a no-op cast under f32 training
        sq = jnp.square(pred.astype(jnp.float32) - u.astype(jnp.float32))
        mask32 = mask.astype(jnp.float32)
        if row_mask is None:
            loss = jnp.sum(sq) / (jnp.sum(mask32) * u.shape[-1])
        else:
            w = row_mask.astype(jnp.float32)[:, None, None]
            loss = jnp.sum(sq * w) / (jnp.sum(mask32 * w) * u.shape[-1])
        return loss, y
