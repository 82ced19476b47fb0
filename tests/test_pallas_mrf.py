"""Fused Pallas MRF stage vs the flax res-block composition (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emojivoice_tpu.config import HiFiGANConfig
from emojivoice_tpu.ops.pallas_mrf import mrf_stage_pallas, stack_resblock_weights
from emojivoice_tpu.vocoder import HiFiGANGenerator
from emojivoice_tpu.vocoder.hifigan import ResBlock1


def _reference_mrf(params, x, cfg, stage):
    num_kernels = len(cfg.resblock_kernel_sizes)
    xs = None
    for j, (k, d) in enumerate(zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)):
        block = ResBlock1(x.shape[-1], k, tuple(d))
        sub = {"params": params["params"][f"resblocks_{stage * num_kernels + j}"]}
        r = block.apply(sub, x)
        xs = r if xs is None else xs + r
    return xs / num_kernels


@pytest.mark.parametrize("t_len,t_tile", [(96, 64), (128, 128), (70, 32)])
def test_pallas_mrf_matches_flax(rng, t_len, t_tile):
    cfg = HiFiGANConfig(
        upsample_rates=(4,),
        upsample_kernel_sizes=(8,),
        upsample_initial_channel=32,  # stage 0 channels: 16
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 2), (1, 2)),
        num_mels=12,
    )
    voc = HiFiGANGenerator(cfg=cfg)
    params = voc.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 12)))

    c = cfg.upsample_initial_channel // 2
    x = jnp.asarray(rng.normal(size=(2, t_len, c)).astype(np.float32))

    ref = _reference_mrf(params, x, cfg, stage=0)
    weights = stack_resblock_weights(params, len(cfg.resblock_kernel_sizes), 0,
                                     [len(d) for d in cfg.resblock_dilation_sizes])
    got = mrf_stage_pallas(x, weights, cfg.resblock_kernel_sizes,
                           tuple(tuple(d) for d in cfg.resblock_dilation_sizes),
                           t_tile=t_tile, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_pallas_mrf_v1_kernels(rng):
    """Real v1 kernel/dilation pattern (3,7,11 × (1,3,5)) on a small channel count."""
    cfg = HiFiGANConfig(
        upsample_rates=(2,),
        upsample_kernel_sizes=(4,),
        upsample_initial_channel=16,
        num_mels=12,
    )
    voc = HiFiGANGenerator(cfg=cfg)
    params = voc.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 12)))
    c = 8
    x = jnp.asarray(rng.normal(size=(1, 200, c)).astype(np.float32))
    ref = _reference_mrf(params, x, cfg, stage=0)
    weights = stack_resblock_weights(params, 3, 0, [3, 3, 3])
    got = mrf_stage_pallas(x, weights, cfg.resblock_kernel_sizes,
                           tuple(tuple(d) for d in cfg.resblock_dilation_sizes),
                           t_tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_hifigan_apply_pallas_matches_flax(rng):
    from emojivoice_tpu.ops.pallas_mrf import hifigan_apply_pallas

    cfg = HiFiGANConfig(
        upsample_rates=(4, 2),
        upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 2), (1, 2)),
        num_mels=12,
    )
    voc = HiFiGANGenerator(cfg=cfg)
    params = voc.init(jax.random.PRNGKey(2), jnp.zeros((1, 8, 12)))
    mel = jnp.asarray(rng.normal(size=(2, 25, 12)).astype(np.float32) * 2 - 6)
    ref = voc.apply(params, mel)
    got = hifigan_apply_pallas(cfg, params, mel, t_tile=64, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_pallas_mrf_lane_packed_matches_unpacked(rng):
    """g=128//C batch items share one kernel row via block-diag tap weights."""
    from emojivoice_tpu.ops.pallas_mrf import mrf_stage_pallas_packed

    cfg = HiFiGANConfig(
        upsample_rates=(2,),
        upsample_kernel_sizes=(4,),
        upsample_initial_channel=64,  # stage-0 channels: 32 → g=4
        num_mels=12,
    )
    voc = HiFiGANGenerator(cfg=cfg)
    params = voc.init(jax.random.PRNGKey(3), jnp.zeros((1, 8, 12)))
    c = 32
    x = jnp.asarray(rng.normal(size=(8, 96, c)).astype(np.float32))
    ref = _reference_mrf(params, x, cfg, stage=0)
    weights = stack_resblock_weights(params, 3, 0, [3, 3, 3])
    got = mrf_stage_pallas_packed(
        x, weights, cfg.resblock_kernel_sizes,
        tuple(tuple(d) for d in cfg.resblock_dilation_sizes),
        t_tile=64, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_pallas_mrf_lane_packed_fallback_on_odd_batch(rng):
    """B not divisible by g routes to time-split, whose chunks are too short
    here (< 2×halo), landing on the unpacked kernel — same numerics."""
    from emojivoice_tpu.ops.pallas_mrf import mrf_stage_pallas_packed

    cfg = HiFiGANConfig(
        upsample_rates=(2,),
        upsample_kernel_sizes=(4,),
        upsample_initial_channel=64,
        num_mels=12,
    )
    voc = HiFiGANGenerator(cfg=cfg)
    params = voc.init(jax.random.PRNGKey(4), jnp.zeros((1, 8, 12)))
    x = jnp.asarray(rng.normal(size=(3, 70, 32)).astype(np.float32))
    ref = _reference_mrf(params, x, cfg, stage=0)
    got = mrf_stage_pallas_packed(
        x, stack_resblock_weights(params, 3, 0, [3, 3, 3]),
        cfg.resblock_kernel_sizes,
        tuple(tuple(d) for d in cfg.resblock_dilation_sizes),
        t_tile=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_hifigan_apply_pallas_batched_packed_matches_flax(rng):
    """Full generator with lane packing engaged at the narrow stages (B=4)."""
    from emojivoice_tpu.ops.pallas_mrf import hifigan_apply_pallas

    cfg = HiFiGANConfig(
        upsample_rates=(4, 2),
        upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 2), (1, 2)),
        num_mels=12,
    )
    voc = HiFiGANGenerator(cfg=cfg)
    params = voc.init(jax.random.PRNGKey(5), jnp.zeros((1, 8, 12)))
    mel = jnp.asarray(rng.normal(size=(4, 25, 12)).astype(np.float32) * 2 - 6)
    ref = voc.apply(params, mel)
    got = hifigan_apply_pallas(cfg, params, mel, t_tile=64, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


@pytest.mark.parametrize("b,t_len,t_tile", [(1, 135, 32), (3, 97, 64), (1, 136, 128)])
def test_pallas_mrf_timesplit_matches_flax(rng, b, t_len, t_tile):
    """Time-split lane packing (chunks of one sequence share the MXU lanes)
    is exact, including sequence edges, non-divisible lengths, and tile
    boundaries inside chunks."""
    from emojivoice_tpu.ops.pallas_mrf import mrf_stage_pallas_timesplit

    cfg = HiFiGANConfig(
        upsample_rates=(2,),
        upsample_kernel_sizes=(4,),
        upsample_initial_channel=64,  # stage-0 channels: 32 → s=4 chunks
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 2), (1, 2)),  # stage halo 10 → chunks pay
        num_mels=12,
    )
    voc = HiFiGANGenerator(cfg=cfg)
    params = voc.init(jax.random.PRNGKey(7), jnp.zeros((1, 8, 12)))
    x = jnp.asarray(rng.normal(size=(b, t_len, 32)).astype(np.float32))
    ref = _reference_mrf(params, x, cfg, stage=0)
    got = mrf_stage_pallas_timesplit(
        x, stack_resblock_weights(params, 2, 0, [2, 2]),
        cfg.resblock_kernel_sizes,
        tuple(tuple(d) for d in cfg.resblock_dilation_sizes),
        t_tile=t_tile, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_pallas_mrf_packed_routes_batch1_to_timesplit(rng):
    """mrf_stage_pallas_packed at B=1 engages the time-split path (long
    enough chunks) and stays exact vs the flax composition."""
    from emojivoice_tpu.ops.pallas_mrf import mrf_stage_pallas_packed

    cfg = HiFiGANConfig(
        upsample_rates=(2,),
        upsample_kernel_sizes=(4,),
        upsample_initial_channel=64,
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 2), (1, 2)),
        num_mels=12,
    )
    voc = HiFiGANGenerator(cfg=cfg)
    params = voc.init(jax.random.PRNGKey(8), jnp.zeros((1, 8, 12)))
    x = jnp.asarray(rng.normal(size=(1, 150, 32)).astype(np.float32))
    ref = _reference_mrf(params, x, cfg, stage=0)
    got = mrf_stage_pallas_packed(
        x, stack_resblock_weights(params, 2, 0, [2, 2]),
        cfg.resblock_kernel_sizes,
        tuple(tuple(d) for d in cfg.resblock_dilation_sizes),
        t_tile=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_hifigan_apply_pallas_batch1_timesplit_matches_flax(rng):
    """Full generator at B=1 with time-split packing engaged at every fused
    stage (the single-stream serving shape)."""
    from emojivoice_tpu.ops.pallas_mrf import hifigan_apply_pallas

    cfg = HiFiGANConfig(
        upsample_rates=(4, 2),
        upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=64,  # stages: C=32 (s=4), C=16 (s=8)
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 2), (1, 2)),
        num_mels=12,
    )
    voc = HiFiGANGenerator(cfg=cfg)
    params = voc.init(jax.random.PRNGKey(9), jnp.zeros((1, 8, 12)))
    mel = jnp.asarray(rng.normal(size=(1, 30, 12)).astype(np.float32) * 2 - 6)
    ref = voc.apply(params, mel)
    got = hifigan_apply_pallas(cfg, params, mel, t_tile=64, interpret=True,
                               stages="all")
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_hifigan_apply_pallas_stage_policy(rng):
    """Explicit per-stage backend choice is numerics-neutral."""
    from emojivoice_tpu.ops.pallas_mrf import hifigan_apply_pallas

    cfg = HiFiGANConfig(
        upsample_rates=(4, 2),
        upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 2), (1, 2)),
        num_mels=12,
    )
    voc = HiFiGANGenerator(cfg=cfg)
    params = voc.init(jax.random.PRNGKey(10), jnp.zeros((1, 8, 12)))
    mel = jnp.asarray(rng.normal(size=(4, 25, 12)).astype(np.float32) * 2 - 6)
    ref = voc.apply(params, mel)
    for policy in ((False, True), (True, False), "auto", "all"):
        got = hifigan_apply_pallas(cfg, params, mel, t_tile=64, interpret=True,
                                   stages=policy)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_hifigan_apply_pallas_bf16_close_to_f32(rng):
    """compute_dtype=bf16 runs single-pass MXU matmuls; output stays f32 and
    lands within audio tolerance (~-40 dB on the tanh-bounded waveform)."""
    from emojivoice_tpu.ops.pallas_mrf import hifigan_apply_pallas

    cfg = HiFiGANConfig(
        upsample_rates=(4, 2),
        upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 2), (1, 2)),
        num_mels=12,
    )
    voc = HiFiGANGenerator(cfg=cfg)
    params = voc.init(jax.random.PRNGKey(6), jnp.zeros((1, 8, 12)))
    mel = jnp.asarray(rng.normal(size=(4, 25, 12)).astype(np.float32) * 2 - 6)
    ref = voc.apply(params, mel)
    got = hifigan_apply_pallas(cfg, params, mel, t_tile=64, interpret=True,
                               compute_dtype=jnp.bfloat16)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2)


def test_hifigan_apply_pallas_rejects_bad_stages(rng):
    """Unknown policy strings and wrong-length bool sequences raise instead
    of being silently indexed per character (a "none"/"xla" typo used to
    fuse every stage)."""
    import pytest

    from emojivoice_tpu.ops.pallas_mrf import hifigan_apply_pallas

    cfg = HiFiGANConfig(
        upsample_rates=(4, 2),
        upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 2), (1, 2)),
        num_mels=12,
    )
    voc = HiFiGANGenerator(cfg=cfg)
    params = voc.init(jax.random.PRNGKey(10), jnp.zeros((1, 8, 12)))
    mel = jnp.asarray(rng.normal(size=(2, 25, 12)).astype(np.float32) * 2 - 6)
    with pytest.raises(ValueError, match="stages"):
        hifigan_apply_pallas(cfg, params, mel, interpret=True, stages="none")
    with pytest.raises(ValueError, match="entries"):
        hifigan_apply_pallas(cfg, params, mel, interpret=True, stages=(True,))


def test_mrf_stage_unfused_matches_generator(rng):
    """The hoisted unfused MRF stage is the generator's math (the bench
    tools import it, so a generator change can't silently diverge)."""
    from emojivoice_tpu.ops.pallas_mrf import hifigan_apply_pallas

    cfg = HiFiGANConfig(
        upsample_rates=(4, 2),
        upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 2), (1, 2)),
        num_mels=12,
    )
    voc = HiFiGANGenerator(cfg=cfg)
    params = voc.init(jax.random.PRNGKey(3), jnp.zeros((1, 8, 12)))
    mel = jnp.asarray(rng.normal(size=(2, 25, 12)).astype(np.float32) * 2 - 6)
    ref = voc.apply(params, mel)
    got = hifigan_apply_pallas(cfg, params, mel, interpret=True,
                               stages=(False, False))  # all stages unfused
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
