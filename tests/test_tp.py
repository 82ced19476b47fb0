"""Tensor-parallel sharding over a 2-D (data, model) mesh.

The reference has no TP at all (SURVEY.md §2.8); these tests pin the
TPU-native capability: params sharded per parallel/tp.py TP_RULES, GSPMD
inserting the intra-layer collectives, numerics matching the replicated
program.  Runs on the virtual 8-device CPU mesh from conftest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emojivoice_tpu.config import HiFiGANConfig, OptimizerConfig
from emojivoice_tpu.models import MatchaTTS
from emojivoice_tpu.parallel.mesh import shard_batch
from emojivoice_tpu.parallel.tp import (
    MODEL_AXIS,
    count_sharded,
    make_mesh_2d,
    shard_params,
    tp_specs,
)
from emojivoice_tpu.training import create_train_state, make_train_step
from emojivoice_tpu.vocoder import HiFiGANGenerator

from tests.test_models import tiny_cfg
from tests.test_training import make_batch

pytestmark = pytest.mark.slow


def test_tp_specs_megatron_pairs():
    """Column→row pairs resolve to the expected dims; non-matching and
    non-divisible leaves stay replicated."""
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh_2d(4, 2)
    cfg = tiny_cfg()
    state = jax.eval_shape(lambda: create_train_state(cfg, OptimizerConfig()))
    specs = tp_specs(state, mesh)
    flat = {
        "/".join(str(getattr(k, "key", getattr(k, "name", getattr(k, "idx", k)))) for k in path): s
        for path, s in jax.tree_util.tree_flatten_with_path(
            specs, is_leaf=lambda x: isinstance(x, P)
        )[0]
    }
    ffn1 = next(k for k in flat if "ffn_0/conv_1/kernel" in k)
    ffn2 = next(k for k in flat if "ffn_0/conv_2/kernel" in k)
    assert flat[ffn1] == P(None, None, MODEL_AXIS)  # column-parallel
    assert flat[ffn2] == P(None, MODEL_AXIS, None)  # row-parallel
    emb = next(k for k in flat if k.endswith("emb/embedding") and "spk" not in k)
    assert flat[emb] == P()  # replicated
    # adam mu mirrors the param tree → same specs through the path suffix
    mu_ffn1 = next(k for k in flat if "mu" in k and "ffn_0/conv_1/kernel" in k)
    assert flat[mu_ffn1] == P(None, None, MODEL_AXIS)
    n_sharded, n_total = count_sharded(state.params, mesh)
    assert n_sharded >= 20, f"expected many sharded leaves, got {n_sharded}/{n_total}"


def test_tp_train_step_matches_single_device():
    """One train step on a (4 data × 2 model) mesh reproduces the
    single-device update (GSPMD collectives change reduction order only)."""
    cfg = tiny_cfg()
    opt = OptimizerConfig()
    batch = make_batch(b=8)
    rng = jax.random.PRNGKey(3)

    s1, m1 = make_train_step(cfg, opt)(create_train_state(cfg, opt, seed=7), batch, rng)

    mesh = make_mesh_2d(4, 2)
    step = make_train_step(cfg, opt, mesh=mesh)
    s1b, m1b = step(create_train_state(cfg, opt, seed=7), shard_batch(mesh, batch), rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m1b["loss"]), rtol=2e-5)
    flat_a = jax.tree_util.tree_leaves_with_path(s1.params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(s1b.params))
    for path, a in flat_a:
        b = flat_b[path]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5,
                                   err_msg=str(path))
    # a large kernel is actually sharded on the model axis
    enc = s1b.params["params"]["encoder"]["encoder"]["ffn_0"]["conv_1"]["kernel"]
    assert MODEL_AXIS in tuple(enc.sharding.spec)


def test_tp_train_step_multiple_steps_stay_finite():
    cfg = tiny_cfg()
    opt = OptimizerConfig()
    mesh = make_mesh_2d(2, 4)  # different dp×tp split
    step = make_train_step(cfg, opt, mesh=mesh)
    state = create_train_state(cfg, opt, seed=1)
    batch = shard_batch(mesh, make_batch(b=8))
    rng = jax.random.PRNGKey(0)
    for _ in range(3):
        state, metrics = step(state, batch, rng)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 3


def test_tp_synthesise_matches_replicated():
    """Inference TP: synthesise with TP-sharded params == replicated output
    (same PRNG key → identical noise regardless of layout)."""
    cfg = tiny_cfg()
    model = MatchaTTS(cfg=cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).integers(1, 170, (1, 16)), jnp.int32)
    xl = jnp.array([16])
    y = jnp.zeros((1, 32, cfg.n_feats))
    params = model.init({"params": rng, "dropout": rng}, x, xl, y, jnp.array([32]),
                        jnp.array([0]), rng=rng)

    def synth(p):
        out = model.apply(p, x, xl, 64, 4, 0.667, jnp.array([1]), 1.0,
                          jax.random.PRNGKey(7), method=MatchaTTS.synthesise)
        return out["mel"]

    ref = np.asarray(jax.jit(synth)(params))
    mesh = make_mesh_2d(1, 8)
    mel_tp = np.asarray(jax.jit(synth)(shard_params(params, mesh)))
    np.testing.assert_allclose(mel_tp, ref, atol=1e-4)


def test_dp_inference_pipeline_matches_unsharded():
    """Data-parallel serving: a SynthesisPipeline built over a mesh shards
    each batch over the data axis (params replicated at tp=1) and matches
    the meshless pipeline's outputs; a batch that doesn't divide the data
    axis falls back to replicated and still works."""
    from emojivoice_tpu.inference.pipeline import SynthesisPipeline
    from tests.test_pipeline import tiny_root

    root = tiny_root()
    base = SynthesisPipeline.from_random(
        root, cleaners=("basic_cleaners",), mel_buckets=(64, 128), text_buckets=(64,))
    mesh = make_mesh_2d(4, 2)
    dp = SynthesisPipeline(
        root.model, base.params, root.vocoder, base.vocoder_params,
        cleaners=("basic_cleaners",), mel_buckets=(64, 128), text_buckets=(64,),
        mesh=mesh)

    texts = [f"shard me number {i}" for i in range(8)]
    spks = list(range(8))
    seeds = list(range(50, 58))
    ref = base.synthesise(texts, spks=spks, n_timesteps=2, seed=seeds)
    got = dp.synthesise(texts, spks=spks, n_timesteps=2, seed=seeds)
    for r, g in zip(ref, got):
        assert r.mel_length == g.mel_length
        np.testing.assert_allclose(g.wav, r.wav, atol=1e-4)

    # batch 3 does not divide data=4 → replicated path
    odd = dp.synthesise(texts[:3], spks=spks[:3], n_timesteps=2, seed=seeds[:3])
    assert all(o.mel_length > 0 and np.isfinite(o.wav).all() for o in odd)


def test_tp_vocoder_matches_replicated():
    """HiFi-GAN MRF stacks sharded across the model axis reproduce the
    replicated waveform."""
    cfg = HiFiGANConfig(upsample_initial_channel=64)
    voc = HiFiGANGenerator(cfg=cfg)
    mel = jnp.asarray(np.random.default_rng(1).normal(size=(1, 24, 80)).astype(np.float32))
    params = voc.init(jax.random.PRNGKey(0), mel)
    ref = np.asarray(jax.jit(voc.apply)(params, mel))

    mesh = make_mesh_2d(1, 4)
    n_sharded, _ = count_sharded(params, mesh)
    assert n_sharded > 0
    wav = np.asarray(jax.jit(voc.apply)(shard_params(params, mesh), mel))
    np.testing.assert_allclose(wav, ref, atol=2e-5)


def test_tp_checkpoint_roundtrip_restores_sharded(tmp_path):
    """Orbax save of a TP-sharded TrainState restores directly onto the
    (data, model) mesh via the abstract template — values identical, large
    kernels sharded on the model axis."""
    from emojivoice_tpu.io.checkpoint import CheckpointManager
    from emojivoice_tpu.training import abstract_train_state, train_state_shardings

    cfg = tiny_cfg()
    opt = OptimizerConfig()
    mesh = make_mesh_2d(4, 2)
    state = jax.device_put(create_train_state(cfg, opt, seed=3),
                           train_state_shardings(cfg, opt, mesh))

    mgr = CheckpointManager(str(tmp_path / "ckpts"))
    mgr.save(0, jax.device_get(state))
    template = abstract_train_state(cfg, opt, mesh)
    restored = mgr.restore(template=template)
    mgr.close()

    kern = restored.params["params"]["encoder"]["encoder"]["ffn_0"]["conv_1"]["kernel"]
    assert MODEL_AXIS in tuple(kern.sharding.spec)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)


def test_train_cli_tp_fast_dev_run(tmp_path):
    """`emojivoice-train --tp 2` runs a fast_dev_run on a (2 data × 2 model)
    mesh end to end (CLI plumbing: mesh build, batch pad to the data axis,
    sharded step)."""
    from scipy.io import wavfile

    from emojivoice_tpu.training.train import main

    rng = np.random.default_rng(0)
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rows = []
    for i, text in enumerate(["hello there", "a second line", "third one", "final row"]):
        path = wav_dir / f"u{i}.wav"
        wavfile.write(path, 22050, (rng.normal(size=22050 // 4) * 0.1).astype(np.float32))
        rows.append(f"{path}|{i}|{text}")
    (tmp_path / "train.txt").write_text("\n".join(rows) + "\n")
    (tmp_path / "val.txt").write_text(rows[0] + "\n")

    rc = main([
        "--preset", "tiny",
        "--train_filelist", str(tmp_path / "train.txt"),
        "--valid_filelist", str(tmp_path / "val.txt"),
        "--out_dir", str(tmp_path / "run"),
        "--batch_size", "2",
        "--num_devices", "4",
        "--tp", "2",
        "--log_every", "1",
        "--fast_dev_run",
    ])
    assert rc == 0
    import json

    metrics = [json.loads(l) for l in (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()]
    assert any(np.isfinite(m["loss"]) for m in metrics if m["tag"] == "train")


def test_tp_degree_one_is_fully_replicated():
    """tp=1 resolves every leaf to replicated — identical to the round-1
    data-parallel program."""
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh_2d(8, 1)
    cfg = tiny_cfg()
    params = jax.eval_shape(lambda: create_train_state(cfg, OptimizerConfig()).params)
    specs = jax.tree.leaves(tp_specs(params, mesh), is_leaf=lambda x: isinstance(x, P))
    assert all(s == P() for s in specs)
