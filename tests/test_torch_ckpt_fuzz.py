"""Converter round-trip fuzz: export→convert→export over random legal configs.

io/torch_ckpt.py is the single riskiest file (933 LoC of name/layout
mapping); before this it was pinned on two configs only (default + one
adversarial 4-head).  Here ~50 sampled architectures — heads, dims,
channels, transformer/conformer block mixes, prenet on/off,
n_spks ∈ {1, multi} — each go flax params → torch state dict + hparams →
(infer config, convert back to flax) → torch state dict again, and the two
state dicts must be BYTE-identical (same keys, same dtypes, same bits) with
identical hparams blocks and an equivalent inferred config.  The converter
must reconstruct everything from shapes+hparams — never silently guess.
"""

import dataclasses
import random

import jax
import numpy as np
import pytest

from emojivoice_tpu import config as cfglib
from emojivoice_tpu.io.torch_ckpt import (
    convert_matcha_state_dict,
    export_matcha_hparams,
    export_matcha_state_dict,
    infer_model_config_from_state_dict,
)
from emojivoice_tpu.models import MatchaTTS

N_CONFIGS = 50


def sample_config(rng: random.Random) -> cfglib.ModelConfig:
    n_heads = rng.choice([1, 2, 4])
    # RoPE constraint (shared with the reference): the per-head dim of the
    # encoder attention — (n_channels + spk_emb)/n_heads — must divide by 4.
    # Sample both as multiples of 4·n_heads so every draw is legal.
    n_channels = 4 * n_heads * rng.choice([2, 3, 4])
    n_spks = rng.choice([1, 4, 109])
    num_heads = rng.choice([1, 2])
    head_dim = rng.choice([4, 8, 16])
    n_feats = rng.choice([8, 12, 20])
    bt = lambda: rng.choice(["transformer", "conformer"])  # noqa: E731
    return cfglib.ModelConfig(
        n_vocab=178,
        n_spks=n_spks,
        spk_emb_dim=4 * n_heads * rng.choice([1, 2]) if n_spks > 1 else 64,
        n_feats=n_feats,
        encoder=cfglib.EncoderConfig(
            n_feats=n_feats,
            n_channels=n_channels,
            filter_channels=rng.choice([16, 32]),
            n_heads=n_heads,
            n_layers=rng.choice([1, 2, 3]),
            kernel_size=rng.choice([3, 5]),
            p_dropout=rng.choice([0.0, 0.1]),
            prenet=rng.random() < 0.5,
        ),
        duration_predictor=cfglib.DurationPredictorConfig(
            filter_channels_dp=rng.choice([8, 16]),
            kernel_size=rng.choice([3, 5]),
            p_dropout=rng.choice([0.0, 0.1]),
        ),
        decoder=cfglib.DecoderConfig(
            channels=tuple(rng.choice([16, 32])
                           for _ in range(rng.choice([1, 2, 3]))),
            dropout=rng.choice([0.0, 0.05]),
            attention_head_dim=head_dim,
            n_blocks=rng.choice([1, 2]),
            num_mid_blocks=rng.choice([1, 2]),
            num_heads=num_heads,
            down_block_type=bt(),
            mid_block_type=bt(),
            up_block_type=bt(),
        ),
        cfm=cfglib.CFMConfig(sigma_min=rng.choice([1e-4, 1e-3])),
        # stats ride the checkpoint as f32 buffers (like the reference's
        # registered mel_mean/mel_std) — sample f32-representable values so
        # the strict config equality below stays meaningful
        data_statistics=cfglib.DataStatistics(
            mel_mean=float(np.float32(round(rng.uniform(-7, 0), 3))),
            mel_std=float(np.float32(round(rng.uniform(0.5, 3), 3)))),
        out_size=rng.choice([None, 16]),
        prior_loss=rng.random() < 0.9,
    )


def _init_params(cfg: cfglib.ModelConfig, seed: int):
    """Param tree with the architecture's exact shapes/names, random-filled.

    ``jax.eval_shape`` traces the real ``model.init`` (so the structure is
    authoritative) without compiling or computing — a full jit init per
    sampled config would make 50 architectures compile-bound.  Distinct
    random values per leaf make the byte-compare sensitive to any transposed
    or mis-mapped tensor; actual init distributions are irrelevant here."""
    model = MatchaTTS(cfg=cfg)
    key = jax.random.PRNGKey(0)
    x = jax.numpy.ones((1, 8), jax.numpy.int32)
    y = jax.numpy.zeros((1, 16, cfg.n_feats))
    spks = jax.numpy.array([0]) if cfg.n_spks > 1 else None
    shapes = jax.eval_shape(lambda: model.init(
        {"params": key, "dropout": key}, x, jax.numpy.array([8]), y,
        jax.numpy.array([16]), spks, rng=key))
    rng = np.random.default_rng(seed)
    return jax.tree.map(
        lambda s: rng.standard_normal(s.shape).astype(s.dtype)
        if np.issubdtype(s.dtype, np.floating)
        else rng.integers(0, 2, s.shape).astype(s.dtype), shapes)


@pytest.mark.slow
def test_converter_roundtrip_fuzz():
    rng = random.Random(20260820)
    seen_bt = set()
    for i in range(N_CONFIGS):
        cfg = sample_config(rng)
        seen_bt.update((cfg.decoder.down_block_type, cfg.decoder.mid_block_type,
                        cfg.decoder.up_block_type))
        params1 = jax.device_get(_init_params(cfg, seed=i))

        sd1 = export_matcha_state_dict(params1, cfg)
        hp1 = export_matcha_hparams(cfg)

        # the import path, exactly as load_matcha_params drives it
        cfg2 = infer_model_config_from_state_dict(sd1, hp1)
        params2 = convert_matcha_state_dict(sd1, cfg2)

        # inferred config must equal the source (data_statistics ride the
        # hparams; out_size too)
        assert cfg2 == cfg, f"config {i} round-trip drift:\n{cfg}\nvs\n{cfg2}"

        sd2 = export_matcha_state_dict(params2, cfg2)
        hp2 = export_matcha_hparams(cfg2)
        assert hp1 == hp2, f"config {i}: hparams drift"
        assert set(sd1) == set(sd2), (
            f"config {i}: key drift — only-in-1 {sorted(set(sd1) - set(sd2))[:5]}, "
            f"only-in-2 {sorted(set(sd2) - set(sd1))[:5]}")
        for k in sd1:
            a, b = sd1[k], sd2[k]
            assert a.dtype == b.dtype and a.shape == b.shape, \
                f"config {i}: {k} {a.dtype}{a.shape} vs {b.dtype}{b.shape}"
            assert a.tobytes() == b.tobytes(), f"config {i}: {k} bits drifted"
    # the sampler actually exercised both decoder block families
    assert seen_bt == {"transformer", "conformer"}
