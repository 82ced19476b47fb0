"""Conformer block type in the CFM U-Net."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from emojivoice_tpu.models import MatchaTTS
from emojivoice_tpu.models.conformer import ConformerBlock

from tests.test_models import tiny_cfg


def test_conformer_block_shapes():
    block = ConformerBlock(dim=16, heads=2, head_dim=8)
    x = jnp.ones((2, 12, 16))
    mask = jnp.ones((2, 12))
    params = block.init(jax.random.PRNGKey(0), x, mask)
    out = block.apply(params, x, mask)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_conformer_mask_invariance():
    block = ConformerBlock(dim=16, heads=2, head_dim=8, conv_kernel_size=7)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 12, 16)).astype(np.float32))
    mask = np.ones((1, 12), np.float32)
    mask[0, 8:] = 0
    params = block.init(jax.random.PRNGKey(0), x, jnp.asarray(mask))

    x2 = np.asarray(x).copy()
    x2[0, 8:] = 99.0  # garbage in padded region
    a = block.apply(params, x, jnp.asarray(mask))
    b = block.apply(params, jnp.asarray(x2), jnp.asarray(mask))
    # valid positions away from the conv halo unaffected by padded content
    np.testing.assert_allclose(np.asarray(a)[0, :5], np.asarray(b)[0, :5], atol=1e-5)


def test_conformer_train_step_updates_batch_stats():
    """The jitted train step threads the BatchNorm running statistics
    (mutable batch_stats collection) and keeps them out of the optimizer."""
    from emojivoice_tpu.config import OptimizerConfig
    from emojivoice_tpu.training.state import create_train_state, make_train_step

    cfg = tiny_cfg()
    cfg = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder, mid_block_type="conformer"))
    state = create_train_state(cfg, OptimizerConfig(), seed=0)
    assert "batch_stats" in state.params
    before = jax.tree.map(np.asarray, state.params["batch_stats"])

    step = make_train_step(cfg, OptimizerConfig())
    batch = {
        "x": jnp.ones((2, 8), jnp.int32),
        "x_lengths": jnp.array([8, 6]),
        "y": jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, cfg.n_feats)),
                         jnp.float32),
        "y_lengths": jnp.array([16, 12]),
        "spks": jnp.array([0, 1]) if cfg.n_spks > 1 else None,
    }
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    after = state.params["batch_stats"]
    changed = jax.tree.map(lambda a, b: float(np.abs(np.asarray(b) - a).max()), before, after)
    assert max(jax.tree.leaves(changed)) > 0.0
    # second step consumes the updated stats without shape/type drift
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))


def test_unet_with_conformer_blocks():
    cfg = tiny_cfg()
    cfg = dataclasses.replace(
        cfg,
        decoder=dataclasses.replace(cfg.decoder, mid_block_type="conformer"),
    )
    model = MatchaTTS(cfg=cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((1, 8), jnp.int32)
    y = jnp.zeros((1, 16, cfg.n_feats))
    params = model.init({"params": rng, "dropout": rng}, x, jnp.array([8]), y, jnp.array([16]),
                        jnp.array([0]), rng=rng)
    out = model.apply(params, x, jnp.array([8]), 32, 2, 0.667, jnp.array([1]), 1.0,
                      jax.random.PRNGKey(1), method=MatchaTTS.synthesise)
    assert out["mel"].shape == (1, 32, cfg.n_feats)
    assert np.isfinite(np.asarray(out["mel"])).all()
