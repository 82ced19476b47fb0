"""Vocoder GAN training step (capability the reference ships but never wires)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

pytestmark = pytest.mark.slow


from emojivoice_tpu.parallel.mesh import make_mesh, shard_batch
from emojivoice_tpu.training.vocoder_train import create_vocoder_state, make_vocoder_train_step

from tests.test_vocoder import tiny_hifigan


def test_vocoder_gan_step():
    cfg = tiny_hifigan()  # ups x16, 12 mels
    state, modules = create_vocoder_state(cfg, seed=0, segment_frames=32)
    step = make_vocoder_train_step(cfg, modules)

    rng = np.random.default_rng(0)
    seg = 64
    batch = {
        "mel": jnp.asarray(rng.normal(size=(2, seg, 12)).astype(np.float32) * 2 - 6),
        "wav": jnp.asarray((rng.normal(size=(2, seg * cfg.total_upsample)) * 0.1).astype(np.float32)),
    }
    p0 = np.asarray(jax.tree.leaves(state.gen_params)[0]).copy()
    d0 = np.asarray(jax.tree.leaves(state.disc_params)[0]).copy()

    state, m = step(state, batch)
    for k, v in m.items():
        assert np.isfinite(float(v)), k
    assert int(state.step) == 1

    state, m2 = step(state, batch)
    p1 = np.asarray(jax.tree.leaves(state.gen_params)[0])
    d1 = np.asarray(jax.tree.leaves(state.disc_params)[0])
    assert not np.array_equal(p0, p1), "generator params did not update"
    assert not np.array_equal(d0, d1), "discriminator params did not update"


def test_vocoder_gan_step_sharded():
    cfg = tiny_hifigan()
    mesh = make_mesh(2)
    state, modules = create_vocoder_state(cfg, seed=0, segment_frames=32)
    step = make_vocoder_train_step(cfg, modules, mesh=mesh)
    rng = np.random.default_rng(1)
    seg = 32
    batch = shard_batch(mesh, {
        "mel": (rng.normal(size=(4, seg, 12)).astype(np.float32) * 2 - 6),
        "wav": (rng.normal(size=(4, seg * cfg.total_upsample)) * 0.1).astype(np.float32),
    })
    state, m = step(state, batch)
    assert np.isfinite(float(m["g_loss"]))
