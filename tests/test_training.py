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


def test_wire_f16_mels_train_close_to_f32():
    """f16-wire mels (--wire_f16: halve the host→device transfer, upcast
    in-graph before any compute) train within quantization noise of the f32
    path — same program semantics, input quantized at ~2e-3 on log-mels."""
    cfg = tiny_cfg()
    opt = OptimizerConfig()
    step = make_train_step(cfg, opt)
    batch = make_batch()
    rng = jax.random.PRNGKey(0)
    s_f32, m_f32 = step(create_train_state(cfg, opt, seed=0), batch, rng)
    b16 = {**batch, "y": np.asarray(batch["y"]).astype(np.float16)}
    s_f16, m_f16 = step(create_train_state(cfg, opt, seed=0), b16, rng)
    assert int(s_f16.step) == 1
    np.testing.assert_allclose(float(m_f16["loss"]), float(m_f32["loss"]), rtol=1e-2)
    for k in ("dur_loss", "prior_loss", "diff_loss"):
        np.testing.assert_allclose(float(m_f16[k]), float(m_f32[k]), rtol=2e-2, err_msg=k)


def test_multi_step_matches_sequential_and_masks_padding():
    """make_train_multi_step: K scanned optimizer steps == K sequential
    single-step dispatches (same per-step rng via fold_in(step); float-level
    tolerance — the scan body compiles with different fusion than the
    standalone program), and a masked sub-step passes the state through
    BIT-exactly (Adam moments decay on a zero-grad step, so masking after
    the fact is the only exact padding)."""
    from emojivoice_tpu.training import make_train_multi_step

    cfg = tiny_cfg()
    opt = OptimizerConfig()
    batches = [make_batch(seed=i) for i in range(2)]
    rng = jax.random.PRNGKey(7)

    step = make_train_step(cfg, opt)
    s_seq = create_train_state(cfg, opt, seed=0)
    seq_metrics = []
    for b in batches:
        s_seq, m = step(s_seq, b, rng)
        seq_metrics.append({k: float(v) for k, v in m.items()})

    multi = make_train_multi_step(cfg, opt)
    s_multi = create_train_state(cfg, opt, seed=0)
    stacked = {k: jnp.stack([batches[0][k], batches[1][k], batches[1][k]])
               for k in batches[0]}
    s_multi, mm = multi(s_multi, stacked, rng, np.array([1.0, 1.0, 0.0], np.float32))
    mm = jax.device_get(mm)

    assert int(s_multi.step) == int(s_seq.step) == 2
    for i, ms in enumerate(seq_metrics):
        for k, v in ms.items():
            np.testing.assert_allclose(float(mm[k][i]), v, rtol=1e-5, atol=1e-6, err_msg=f"{k}@{i}")
    for a, b in zip(jax.tree.leaves(s_seq.params), jax.tree.leaves(s_multi.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)

    # all-masked chunk: bit-exact no-op (same program, pure select)
    s0 = create_train_state(cfg, opt, seed=3)
    ref = jax.device_get(s0.params)
    s1, _ = multi(s0, stacked, rng, np.zeros(3, np.float32))
    assert int(s1.step) == 0
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(s1.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multi_step_8device_mesh():
    """The K-step scan program over the virtual 8-device mesh: chunk leaves
    (K, B, ...) shard the BATCH dim (dim 1, parallel/mesh.shard_chunk) and
    match the replicated single-step sequence."""
    from emojivoice_tpu.parallel.mesh import shard_chunk
    from emojivoice_tpu.training import make_train_multi_step

    cfg = tiny_cfg()
    opt = OptimizerConfig()
    rng = jax.random.PRNGKey(7)
    batches = [make_batch(b=8, seed=i) for i in range(2)]

    s_seq = create_train_state(cfg, opt, seed=0)
    step = make_train_step(cfg, opt)
    for b in batches:
        s_seq, _ = step(s_seq, b, rng)

    mesh = make_mesh(8)
    multi = make_train_multi_step(cfg, opt, mesh=mesh)
    s_multi = create_train_state(cfg, opt, seed=0)
    stacked = {k: np.stack([np.asarray(batches[0][k]), np.asarray(batches[1][k])])
               for k in batches[0]}
    s_multi, mm = multi(s_multi, shard_chunk(mesh, stacked), rng,
                        np.ones(2, np.float32))
    assert int(s_multi.step) == 2
    assert np.isfinite(np.asarray(mm["loss"])).all()
    for a, b in zip(jax.tree.leaves(s_seq.params), jax.tree.leaves(s_multi.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)


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


def test_uneven_batch_padding_is_content_invariant():
    """Zero-weight padded rows contribute NOTHING: running the padded batch
    with two different garbage contents in the pad rows gives bit-identical
    loss and parameter updates (same rng → same shapes → same noise draws).
    This is the guarantee that lets the train loop pad uneven final batches
    instead of dropping them (reference DDP drop_last analog)."""
    from emojivoice_tpu.parallel.mesh import pad_batch_to_multiple

    cfg = tiny_cfg()
    opt = OptimizerConfig()
    real = make_batch(b=6)
    padded_a = pad_batch_to_multiple({k: np.asarray(v) for k, v in real.items()}, 8)
    padded_b = dict(padded_a)
    grg = np.random.default_rng(99)
    for k in ("x", "y"):
        v = np.array(padded_a[k])
        v[6:] = grg.integers(1, 100, v[6:].shape) if v.dtype.kind == "i" else \
            grg.normal(size=v[6:].shape).astype(v.dtype)
        padded_b[k] = v
    assert padded_a["row_mask"].tolist() == [1, 1, 1, 1, 1, 1, 0, 0]

    mesh = make_mesh(8)
    step = make_train_step(cfg, opt, mesh=mesh)
    rng = jax.random.PRNGKey(5)
    sa, ma = step(create_train_state(cfg, opt, seed=7), shard_batch(mesh, padded_a), rng)
    sb, mb = step(create_train_state(cfg, opt, seed=7), shard_batch(mesh, padded_b), rng)

    assert float(ma["loss"]) == float(mb["loss"])
    for pa, pb in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_row_mask_all_ones_matches_no_row_mask():
    """row_mask of all ones is the identity — the padded path reproduces the
    reference losses exactly on even batches."""
    cfg = tiny_cfg()
    opt = OptimizerConfig()
    batch = make_batch(b=8)
    rng = jax.random.PRNGKey(11)
    step = make_train_step(cfg, opt)
    _, m_plain = step(create_train_state(cfg, opt, seed=7), batch, rng)
    with_mask = dict(batch)
    with_mask["row_mask"] = jnp.ones(8, jnp.float32)
    _, m_masked = step(create_train_state(cfg, opt, seed=7), with_mask, rng)
    for k in ("loss", "dur_loss", "prior_loss", "diff_loss"):
        np.testing.assert_allclose(float(m_plain[k]), float(m_masked[k]), rtol=1e-6)


def test_bf16_mixed_precision_step():
    """bf16-mixed (reference trainer 16-mixed analog): compute in bf16,
    params/grads/losses f32.  Loss tracks the f32 step within bf16 noise and
    updated params remain f32."""
    cfg = tiny_cfg()
    opt = OptimizerConfig()
    batch = make_batch(b=8)
    rng = jax.random.PRNGKey(2)

    s32, m32 = make_train_step(cfg, opt)(create_train_state(cfg, opt, seed=7), batch, rng)
    s16, m16 = make_train_step(cfg, opt, precision="bf16-mixed")(
        create_train_state(cfg, opt, seed=7), batch, rng)

    assert all(np.isfinite(float(m16[k])) for k in m16)
    # same noise stream (drawn in f32 in both modes) → losses close
    np.testing.assert_allclose(float(m16["loss"]), float(m32["loss"]), rtol=0.05)
    for leaf in jax.tree.leaves(s16.params):
        assert leaf.dtype == jnp.float32
    # updates differ (bf16 compute) but stay near the f32 trajectory
    a = np.concatenate([np.ravel(x) for x in jax.tree.leaves(s16.params)])
    b = np.concatenate([np.ravel(x) for x in jax.tree.leaves(s32.params)])
    assert float(np.abs(a - b).max()) < 1e-3
