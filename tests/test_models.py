"""Acoustic model unit tests: shapes, masking invariants, determinism."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emojivoice_tpu.config import (
    CFMConfig,
    DataStatistics,
    DecoderConfig,
    DurationPredictorConfig,
    EncoderConfig,
    ModelConfig,
)
from emojivoice_tpu.models import MatchaTTS
from emojivoice_tpu.models.decoder import Decoder, sinusoidal_pos_emb


def tiny_cfg(n_spks=3):
    return ModelConfig(
        n_vocab=178,
        n_spks=n_spks,
        spk_emb_dim=8,
        n_feats=12,
        encoder=EncoderConfig(n_feats=12, n_channels=16, filter_channels=32, n_heads=2, n_layers=2),
        duration_predictor=DurationPredictorConfig(filter_channels_dp=16),
        decoder=DecoderConfig(channels=(16, 16), attention_head_dim=8, num_heads=2, num_mid_blocks=1),
        cfm=CFMConfig(),
        data_statistics=DataStatistics(mel_mean=-5.5, mel_std=2.0),
    )


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_cfg()
    model = MatchaTTS(cfg=cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((2, 16), jnp.int32)
    xl = jnp.array([12, 16])
    y = jnp.zeros((2, 32, 12))
    yl = jnp.array([24, 32])
    spks = jnp.array([0, 2])
    params = model.init({"params": rng, "dropout": rng}, x, xl, y, yl, spks, rng=rng)
    return model, params


def test_training_forward_losses(model_and_params):
    model, params = model_and_params
    rng = jax.random.PRNGKey(1)
    x = jnp.concatenate([jnp.arange(1, 13), jnp.zeros(4, jnp.int32)]).astype(jnp.int32)[None, :]
    x = jnp.tile(x, (2, 1))
    xl = jnp.array([12, 12])
    y = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 12))
    yl = jnp.array([24, 32])
    spks = jnp.array([1, 2])
    dur, prior, diff, attn = model.apply(
        params, x, xl, y, yl, spks, rng=rng, deterministic=True, rngs={"dropout": rng}
    )
    for v in (dur, prior, diff):
        assert np.isfinite(float(v))
    assert attn.shape == (2, 16, 32)
    # attn assigns each valid frame exactly one token
    a = np.asarray(attn)
    np.testing.assert_allclose(a[0, :, :24].sum(axis=0), 1.0)
    assert a[0, :, 24:].sum() == 0  # padded frames empty
    assert a[0, 12:, :].sum() == 0  # padded tokens empty


def test_padding_invariance(model_and_params):
    """Outputs must not depend on values in padded text positions."""
    model, params = model_and_params
    rng = jax.random.PRNGKey(3)
    x1 = jnp.concatenate([jnp.arange(1, 13), jnp.zeros(4, jnp.int32)]).astype(jnp.int32)[None, :]
    x2 = jnp.concatenate([jnp.arange(1, 13), jnp.full((4,), 99)]).astype(jnp.int32)[None, :]
    xl = jnp.array([12])
    spks = jnp.array([1])
    z = jax.random.normal(rng, (1, 32, 12))

    outs = []
    for x in (x1, x2):
        out = model.apply(params, x, xl, 32, 2, 0.667, spks, 1.0, None, z,
                          method=MatchaTTS.synthesise)
        outs.append(np.asarray(out["decoder_outputs"]))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-5)


def test_synthesise_deterministic_with_z(model_and_params):
    model, params = model_and_params
    x = jnp.arange(1, 17, dtype=jnp.int32)[None, :]
    xl = jnp.array([16])
    spks = jnp.array([1])
    z = jax.random.normal(jax.random.PRNGKey(7), (1, 64, 12))
    a = model.apply(params, x, xl, 64, 3, 0.667, spks, 1.0, None, z, method=MatchaTTS.synthesise)
    b = model.apply(params, x, xl, 64, 3, 0.667, spks, 1.0, None, z, method=MatchaTTS.synthesise)
    np.testing.assert_array_equal(np.asarray(a["mel"]), np.asarray(b["mel"]))
    # denormalization applied
    stats = model.cfg.data_statistics
    np.testing.assert_allclose(
        np.asarray(a["mel"]),
        np.asarray(a["decoder_outputs"]) * stats.mel_std + stats.mel_mean,
        atol=1e-5,
    )


def test_length_scale_stretches(model_and_params):
    model, params = model_and_params
    x = jnp.arange(1, 17, dtype=jnp.int32)[None, :]
    xl = jnp.array([16])
    spks = jnp.array([1])
    rngk = jax.random.PRNGKey(0)
    slow = model.apply(params, x, xl, 128, 1, 0.667, spks, 2.0, rngk, method=MatchaTTS.synthesise)
    fast = model.apply(params, x, xl, 128, 1, 0.667, spks, 1.0, rngk, method=MatchaTTS.synthesise)
    assert int(slow["mel_lengths"][0]) >= int(fast["mel_lengths"][0])


def test_out_size_crop(model_and_params):
    """Training with out_size crop returns finite losses and cropped attn."""
    model, params = model_and_params
    rng = jax.random.PRNGKey(5)
    x = jnp.arange(1, 17, dtype=jnp.int32)[None, :]
    xl = jnp.array([16])
    y = jax.random.normal(rng, (1, 32, 12))
    yl = jnp.array([32])
    spks = jnp.array([1])
    dur, prior, diff, attn = model.apply(
        params, x, xl, y, yl, spks, out_size=16, rng=rng, deterministic=True, rngs={"dropout": rng}
    )
    assert attn.shape == (1, 16, 16)
    for v in (dur, prior, diff):
        assert np.isfinite(float(v))


def test_sinusoidal_pos_emb():
    emb = sinusoidal_pos_emb(jnp.array([0.0, 0.5]), 8)
    assert emb.shape == (2, 8)
    np.testing.assert_allclose(np.asarray(emb[0, :4]), 0.0, atol=1e-6)  # sin(0)
    np.testing.assert_allclose(np.asarray(emb[0, 4:]), 1.0, atol=1e-6)  # cos(0)


def test_decoder_single_speaker_path():
    cfg = tiny_cfg(n_spks=1)
    model = MatchaTTS(cfg=cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((1, 8), jnp.int32)
    xl = jnp.array([8])
    y = jnp.zeros((1, 16, 12))
    yl = jnp.array([16])
    params = model.init({"params": rng, "dropout": rng}, x, xl, y, yl, None, rng=rng)
    out = model.apply(params, x, xl, 32, 2, 0.667, None, 1.0, rng, method=MatchaTTS.synthesise)
    assert out["mel"].shape == (1, 32, 12)


def test_grads_flow(model_and_params):
    model, params = model_and_params
    rng = jax.random.PRNGKey(9)
    x = jnp.arange(1, 17, dtype=jnp.int32)[None, :]
    xl = jnp.array([16])
    y = jax.random.normal(rng, (1, 32, 12))
    yl = jnp.array([32])
    spks = jnp.array([1])

    def loss_fn(p):
        dur, prior, diff, _ = model.apply(
            p, x, xl, y, yl, spks, rng=rng, deterministic=True, rngs={"dropout": rng}
        )
        return dur + prior + diff

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # at least the encoder embedding must receive gradient
    total = sum(float(jnp.abs(g).sum()) for g in flat)
    assert total > 0
