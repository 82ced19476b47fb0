"""Training-path numeric parity: losses vs manual numpy + torch oracle."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch

from emojivoice_tpu.models import MatchaTTS
from emojivoice_tpu.models.cfm import CFM
from emojivoice_tpu.ops.mas import maximum_path_numpy

from tests.test_full_parity import pair  # noqa: F401 — fixture reuse
from tests.test_models import tiny_cfg


def _mask(lengths, max_len):
    return (np.arange(max_len)[None, :] < np.asarray(lengths)[:, None]).astype(np.float32)


def test_losses_match_manual_numpy(pair):  # noqa: F811
    cfg, model, params, oracle = pair
    TX, TY = 12, 24
    rng = np.random.default_rng(0)
    x = np.zeros((2, TX), np.int32)
    x[0, :10] = rng.integers(1, 150, 10)
    x[1, :8] = rng.integers(1, 150, 8)
    xl = np.array([10, 8], np.int32)
    y = rng.normal(size=(2, TY, cfg.n_feats)).astype(np.float32)
    yl = np.array([20, 24], np.int32)
    spks = np.array([1, 2], np.int32)
    y = y * _mask(yl, TY)[..., None]

    key = jax.random.PRNGKey(5)
    dur, prior, diff, attn = model.apply(
        {"params": jax.device_get(params)["params"]},
        jnp.asarray(x), jnp.asarray(xl), jnp.asarray(y), jnp.asarray(yl), jnp.asarray(spks),
        rng=key, deterministic=True,
    )
    attn = np.asarray(attn)

    # --- manual recomputation in numpy from encoder outputs ---------------
    mu_x, _, _, x_mask, spk_e = model.apply(
        {"params": jax.device_get(params)["params"]},
        jnp.asarray(x), jnp.asarray(xl), jnp.asarray(spks), 1.0, method=MatchaTTS.encode_text,
    )
    mu_x = np.asarray(mu_x)  # (B, TX, C)
    logw = None  # recomputed below from the oracle for independence

    xm = _mask(xl, TX)
    ym = _mask(yl, TY)
    attn_mask = xm[:, :, None] * ym[:, None, :]

    const = -0.5 * math.log(2 * math.pi) * cfg.n_feats
    log_prior = (
        -0.5 * (np.square(y).sum(-1))[:, None, :]
        + np.einsum("bxc,byc->bxy", mu_x, y)
        - 0.5 * (np.square(mu_x).sum(-1))[:, :, None]
        + const
    )
    attn_ref = maximum_path_numpy(log_prior * attn_mask, attn_mask)
    np.testing.assert_array_equal(attn, attn_ref)

    # duration loss formula (matcha_tts.py:203-204)
    with torch.no_grad():
        spk_t = oracle.spk_emb(torch.from_numpy(spks.astype(np.int64)))
        _, logw_t = oracle.encoder(torch.from_numpy(x.astype(np.int64)),
                                   torch.from_numpy(xm[:, None, :]), spk_t)
    logw = logw_t.numpy()[:, 0, :]  # (B, TX)
    logw_ = np.log(1e-8 + attn_ref.sum(-1)) * xm
    dur_ref = np.sum((logw - logw_) ** 2) / np.sum(xl)
    np.testing.assert_allclose(float(dur), dur_ref, rtol=1e-4)

    # prior loss formula (matcha_tts.py:240-243)
    mu_y = np.einsum("bxy,bxc->byc", attn_ref, mu_x)
    prior_ref = np.sum(0.5 * ((y - mu_y) ** 2 + math.log(2 * math.pi)) * ym[..., None])
    prior_ref /= np.sum(ym) * cfg.n_feats
    np.testing.assert_allclose(float(prior), prior_ref, rtol=1e-4)


def test_cfm_loss_matches_torch_estimator(pair):  # noqa: F811
    """diff loss with injected (t, z): our estimator vs the torch oracle."""
    cfg, model, params, oracle = pair
    B, TY = 2, 16
    rng = np.random.default_rng(1)
    x1 = rng.normal(size=(B, TY, cfg.n_feats)).astype(np.float32)
    mu = rng.normal(size=(B, TY, cfg.n_feats)).astype(np.float32)
    mask = _mask([12, 16], TY)[..., None].astype(np.float32)
    x1 = x1 * mask
    t = rng.uniform(size=(B, 1, 1)).astype(np.float32)
    z = rng.normal(size=(B, TY, cfg.n_feats)).astype(np.float32)
    spk_e_np = rng.normal(size=(B, cfg.spk_emb_dim)).astype(np.float32)

    cfm = CFM(cfg=cfg.cfm, decoder=cfg.decoder, n_feats=cfg.n_feats, n_spks=cfg.n_spks,
              spk_emb_dim=cfg.spk_emb_dim)
    dec_params = {"params": jax.device_get(params)["params"]["decoder"]}
    loss, y_noisy = cfm.apply(
        dec_params, jnp.asarray(x1), jnp.asarray(mask), jnp.asarray(mu), jnp.asarray(spk_e_np),
        deterministic=True, t=jnp.asarray(t), z=jnp.asarray(z), method=CFM.compute_loss,
    )

    # torch oracle: same interpolation + estimator + reference reduction
    sigma_min = cfg.cfm.sigma_min
    y_t = (1 - (1 - sigma_min) * t) * z + t * x1
    u = x1 - (1 - sigma_min) * z
    with torch.no_grad():
        pred = oracle.decoder.estimator(
            torch.from_numpy(y_t.transpose(0, 2, 1)),
            torch.from_numpy(mask.transpose(0, 2, 1)),
            torch.from_numpy(mu.transpose(0, 2, 1)),
            torch.from_numpy(t[:, 0, 0]),
            torch.from_numpy(spk_e_np),
        ).numpy().transpose(0, 2, 1)
    loss_ref = np.sum((pred - u) ** 2) / (mask.sum() * cfg.n_feats)
    np.testing.assert_allclose(float(loss), loss_ref, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(y_noisy), y_t, atol=1e-6)
