"""Training step: single-device and 8-device virtual mesh (ddp_sim analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow


from emojivoice_tpu.config import OptimizerConfig
from emojivoice_tpu.parallel.mesh import make_mesh, shard_batch
from emojivoice_tpu.training import create_train_state, make_eval_step, make_train_step

from tests.test_models import tiny_cfg


def make_batch(b=8, tx=16, ty=32, n_feats=12, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "x": jnp.asarray(rng.integers(1, 100, size=(b, tx)), jnp.int32),
        "x_lengths": jnp.asarray(rng.integers(tx // 2, tx + 1, size=(b,)), jnp.int32),
        "y": jnp.asarray(rng.normal(size=(b, ty, n_feats)).astype(np.float32)),
        "y_lengths": jnp.asarray(rng.integers(ty // 2, ty + 1, size=(b,)), jnp.int32),
        "spks": jnp.asarray(rng.integers(0, 3, size=(b,)), jnp.int32),
    }


def test_train_step_single_device():
    cfg = tiny_cfg()
    state = create_train_state(cfg, OptimizerConfig())
    step = make_train_step(cfg, OptimizerConfig())
    batch = make_batch()
    rng = jax.random.PRNGKey(0)
    state1, m1 = step(state, batch, rng)
    assert int(state1.step) == 1
    for k in ("loss", "dur_loss", "prior_loss", "diff_loss", "grad_norm"):
        assert np.isfinite(float(m1[k])), k
    # loss decreases over a few steps on a fixed batch (sanity, not strict)
    state_n, m_n = state1, m1
    for _ in range(5):
        state_n, m_n = step(state_n, batch, rng)
    assert float(m_n["loss"]) < float(m1["loss"]) * 1.5


def test_train_step_out_size_crop():
    import dataclasses

    cfg = dataclasses.replace(tiny_cfg(), out_size=16)
    state = create_train_state(cfg, OptimizerConfig())
    step = make_train_step(cfg, OptimizerConfig())
    _, metrics = step(state, make_batch(), jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_train_step_8device_mesh():
    """Data-parallel over the virtual 8-device CPU mesh: batch dim sharded,
    params replicated, XLA-inserted gradient all-reduce."""
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual CPU devices"
    cfg = tiny_cfg()
    mesh = make_mesh(8)
    step = make_train_step(cfg, OptimizerConfig(), mesh=mesh)
    state = create_train_state(cfg, OptimizerConfig())
    batch = shard_batch(mesh, make_batch(b=8))
    rng = jax.random.PRNGKey(0)
    state1, metrics = step(state, batch, rng)
    assert int(state1.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    # params replicated: sharding of any param leaf covers a single shard spec
    leaf = jax.tree.leaves(state1.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_dp_matches_single_device():
    """The sharded step computes the same update as the unsharded step."""
    cfg = tiny_cfg()
    opt = OptimizerConfig()
    batch = make_batch(b=8)
    rng = jax.random.PRNGKey(3)

    s0 = create_train_state(cfg, opt, seed=7)
    single = make_train_step(cfg, opt)
    s1, m1 = single(s0, batch, rng)

    mesh = make_mesh(8)
    sharded_step = make_train_step(cfg, opt, mesh=mesh)
    s0b = create_train_state(cfg, opt, seed=7)
    s1b, m1b = sharded_step(s0b, shard_batch(mesh, batch), rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m1b["loss"]), rtol=1e-5)
    a = jax.tree.leaves(s1.params)[0]
    b = jax.tree.leaves(s1b.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_eval_step():
    cfg = tiny_cfg()
    state = create_train_state(cfg, OptimizerConfig())
    ev = make_eval_step(cfg)
    metrics = ev(state.params, make_batch(), jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # deterministic: same key → same losses
    m2 = ev(state.params, make_batch(), jax.random.PRNGKey(0))
    assert float(metrics["loss"]) == float(m2["loss"])
