"""HiFi-GAN vocoder (fine-)tuning on TPU.

The reference vendors the HiFi-GAN discriminators and losses but never
trains its vocoder (SURVEY.md §2.2 — it downloads pretrained generators).
This module completes the capability: an alternating GAN step in the
upstream HiFi-GAN recipe — generator loss = LSGAN adversarial + 2×feature
matching + 45×mel-L1; discriminator = MPD + MSD LSGAN — as two jitted
data-parallel steps over the mesh.

Typical use: adapt a pretrained generator to fine-tune-speaker recordings
(load via io.torch_ckpt.load_hifigan_params, train on (mel, wav) segment
pairs from data/dataset audio).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from emojivoice_tpu.config import HiFiGANConfig
from emojivoice_tpu.ops.mel import mel_spectrogram
from emojivoice_tpu.parallel.mesh import batch_sharding, replicated_sharding
from emojivoice_tpu.vocoder.discriminators import (
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    discriminator_loss,
    feature_loss,
    generator_loss,
)
from emojivoice_tpu.vocoder.hifigan import HiFiGANGenerator

MEL_LOSS_WEIGHT = 45.0  # upstream HiFi-GAN recipe
FM_LOSS_WEIGHT = 2.0


@flax.struct.dataclass
class VocoderTrainState:
    gen_params: Any
    disc_params: Any
    gen_opt: Any
    disc_opt: Any
    step: jnp.ndarray


def create_vocoder_state(cfg: HiFiGANConfig, lr: float = 2e-4, b1: float = 0.8, b2: float = 0.99,
                         seed: int = 0, gen_params=None, segment_frames: int = 32,
                         weight_norm: bool = True, disc_params=None):
    """weight_norm=True (default) trains the generator in the upstream
    parameterization (one magnitude per channel + direction tensor): load
    params via load_hifigan_params(..., fold=False).  weight_norm=False
    trains plain folded kernels — a different optimizer geometry than
    upstream HiFi-GAN; fine for quick adaptation, not for training parity.

    disc_params warm-starts the discriminators from an upstream ``do_*``
    training checkpoint (io.torch_ckpt.load_hifigan_discriminators →
    {"mpd": …, "msd": …}); the folded kernels continue training in plain
    parameterization.  None (default) initializes them from scratch, which
    is all the reference itself ever does (it never runs its GAN code)."""
    gen = HiFiGANGenerator(cfg=cfg, weight_norm=weight_norm)
    mpd = MultiPeriodDiscriminator()
    msd = MultiScaleDiscriminator()
    rng = jax.random.PRNGKey(seed)
    mel = jnp.zeros((1, segment_frames, cfg.num_mels))
    wav = jnp.zeros((1, segment_frames * cfg.total_upsample))
    if gen_params is None:
        gen_params = gen.init(rng, mel)
    if disc_params is None:
        disc_params = {
            "mpd": mpd.init(jax.random.fold_in(rng, 1), wav, wav),
            "msd": msd.init(jax.random.fold_in(rng, 2), wav, wav),
        }
    gen_tx = optax.adam(lr, b1=b1, b2=b2)
    disc_tx = optax.adam(lr, b1=b1, b2=b2)
    state = VocoderTrainState(
        gen_params=gen_params,
        disc_params=disc_params,
        gen_opt=gen_tx.init(gen_params["params"]),
        disc_opt=disc_tx.init(disc_params),
        step=jnp.asarray(0),
    )
    return state, (gen, mpd, msd, gen_tx, disc_tx)


def make_vocoder_train_step(cfg: HiFiGANConfig, modules, mesh=None, axis: str = "data"):
    """(state, batch{mel (B,T,M), wav (B,T·ups)}) → (state, metrics).

    One call runs the discriminator update then the generator update
    (upstream ordering).
    """
    gen, mpd, msd, gen_tx, disc_tx = modules

    def step_fn(state: VocoderTrainState, batch):
        mel, wav = batch["mel"], batch["wav"]

        y_hat = gen.apply(state.gen_params, mel)

        # ---- discriminator update ----
        def d_loss_fn(dp):
            r_p, g_p, _, _ = mpd.apply(dp["mpd"], wav, jax.lax.stop_gradient(y_hat))
            loss_p, _, _ = discriminator_loss(r_p, g_p)
            r_s, g_s, _, _ = msd.apply(dp["msd"], wav, jax.lax.stop_gradient(y_hat))
            loss_s, _, _ = discriminator_loss(r_s, g_s)
            return loss_p + loss_s

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.disc_params)
        d_updates, disc_opt = disc_tx.update(d_grads, state.disc_opt, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        # ---- generator update ----
        a = cfg  # audio params follow the vocoder config
        # LOSS mels are full-band (fmax_loss=None → sr/2 = 11.025 kHz), unlike
        # the 8 kHz CONDITIONING mels — the upstream recipe's split (reference
        # hifigan/config.py:25 fmax_loss: null, meldataset.py:201-211), so the
        # loss penalizes 8-11 kHz content the conditioning never sees
        fmax_loss = a.sampling_rate / 2.0
        mel_target = mel_spectrogram(wav, 1024, a.num_mels, a.sampling_rate, 256, 1024,
                                     0.0, fmax_loss)

        def g_loss_fn(gp):
            y_g = gen.apply(gp, mel)
            mel_g = mel_spectrogram(y_g, 1024, a.num_mels, a.sampling_rate, 256, 1024,
                                    0.0, fmax_loss)
            loss_mel = jnp.mean(jnp.abs(mel_g - mel_target)) * MEL_LOSS_WEIGHT
            _, g_p, f_rp, f_gp = mpd.apply(disc_params["mpd"], wav, y_g)
            _, g_s, f_rs, f_gs = msd.apply(disc_params["msd"], wav, y_g)
            loss_fm = (feature_loss(f_rp, f_gp) + feature_loss(f_rs, f_gs)) * FM_LOSS_WEIGHT / 2.0
            adv_p, _ = generator_loss(g_p)
            adv_s, _ = generator_loss(g_s)
            total = loss_mel + loss_fm + adv_p + adv_s
            return total, (loss_mel, loss_fm, adv_p + adv_s)

        (g_loss, (loss_mel, loss_fm, loss_adv)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.gen_params)
        g_updates, gen_opt = gen_tx.update(g_grads["params"], state.gen_opt,
                                           state.gen_params["params"])
        gen_params = {"params": optax.apply_updates(state.gen_params["params"], g_updates)}

        new_state = VocoderTrainState(gen_params=gen_params, disc_params=disc_params,
                                      gen_opt=gen_opt, disc_opt=disc_opt, step=state.step + 1)
        metrics = {"d_loss": d_loss, "g_loss": g_loss, "mel_l1": loss_mel / MEL_LOSS_WEIGHT,
                   "fm_loss": loss_fm, "adv_loss": loss_adv}
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh, axis)
    return jax.jit(step_fn, in_shardings=(repl, data), out_shardings=(repl, repl),
                   donate_argnums=(0,))
