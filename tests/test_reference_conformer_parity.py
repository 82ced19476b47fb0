"""Parity against the REAL reference conformer block type.

The reference U-Net can be built with conformer blocks instead of
transformer blocks (reference: decoder.py:161-197 ``ConformerWrapper``
subclassing the lucidrains ``conformer==0.3.2`` ``ConformerBlock``, selected
via down/mid/up_block_type="conformer").  Round 2 shipped a
structurally-similar but numerics-divergent conformer (LayerNorm for
BatchNorm, no Shaw relative-position attention, masked conv module) with no
converter support — a conformer-config checkpoint would not have loaded.
This pins the rewritten exact implementation against the real reference
wrapper/decoder code (executed via the public-math conformer stand-in in
tests/reference_harness.py):

- block-level eval parity at flagship dims (dim 256, 2 heads × 64) through
  the production converter, including the rel-pos table and fused to_kv
- full U-Net with all-conformer blocks, eval mode
- train-mode BatchNorm: batch statistics normalize, running buffers update
  with torch momentum/unbiased-var semantics (mutable batch_stats)
- converter round-trip via export_matcha_state_dict (ours → torch names →
  ours) at the state-dict level
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.reference_harness import import_reference

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ref_dec():
    return import_reference("matcha.models.components.decoder")


def _flagship_conformer():
    from emojivoice_tpu.config import get_preset

    cfg = get_preset("emoji_multi").model
    return dataclasses.replace(
        cfg,
        decoder=dataclasses.replace(
            cfg.decoder,
            down_block_type="conformer",
            mid_block_type="conformer",
            up_block_type="conformer",
        ),
    )


def _convert_block(ref_block):
    """Reference ConformerWrapper state_dict → our flax block tree via the
    production converter."""
    from emojivoice_tpu.io.torch_ckpt import _convert_cblock

    # .copy(): torch train-mode forwards mutate BN buffers in place, and
    # .numpy() views share their memory
    sd = {f"blk.{k}": v.numpy().copy() for k, v in ref_block.state_dict().items()}
    out, bs = {}, {}
    _convert_cblock(sd, "blk", out, bs, ("blk",))
    return out["blk"], bs["blk"]


def _wrapper(ref_dec, dim=256, heads=2, head_dim=64, dropout=0.0, seed=21):
    torch.manual_seed(seed)
    return ref_dec.ConformerWrapper(
        dim=dim, dim_head=head_dim, heads=heads, ff_mult=1,
        conv_expansion_factor=2, ff_dropout=dropout, attn_dropout=dropout,
        conv_dropout=dropout, conv_kernel_size=31,
    )


def test_real_reference_conformer_block_parity(ref_dec):
    import jax.numpy as jnp

    from emojivoice_tpu.models.conformer import ConformerBlock

    dim, heads, head_dim = 256, 2, 64
    ref = _wrapper(ref_dec, dim, heads, head_dim)
    ref.eval()

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 40, dim)).astype(np.float32)
    mask = np.ones((2, 40), np.float32)
    mask[1, 28:] = 0.0
    with torch.no_grad():
        out_ref = ref(
            hidden_states=torch.from_numpy(x),
            attention_mask=torch.from_numpy(mask),
            timestep=None,
        ).numpy()

    params, stats = _convert_block(ref)
    ours = ConformerBlock(dim=dim, heads=heads, head_dim=head_dim)
    out_j = ours.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x), jnp.asarray(mask))

    mae = float(np.abs(np.asarray(out_j) - out_ref).mean())
    assert mae < 1e-5, mae


def test_real_reference_conformer_decoder_parity(ref_dec):
    """Full U-Net with conformer blocks at every level vs the real reference
    Decoder, through the production estimator converter."""
    import jax.numpy as jnp

    from emojivoice_tpu.io.torch_ckpt import _convert_estimator
    from emojivoice_tpu.models.decoder import Decoder

    cfg = _flagship_conformer()
    in_ch = 2 * cfg.n_feats + cfg.spk_emb_dim
    torch.manual_seed(23)
    ref = ref_dec.Decoder(
        in_channels=in_ch, out_channels=cfg.n_feats,
        channels=tuple(cfg.decoder.channels), dropout=cfg.decoder.dropout,
        attention_head_dim=cfg.decoder.attention_head_dim,
        n_blocks=cfg.decoder.n_blocks, num_mid_blocks=cfg.decoder.num_mid_blocks,
        num_heads=cfg.decoder.num_heads, act_fn="snakebeta",
        down_block_type="conformer", mid_block_type="conformer",
        up_block_type="conformer",
    )
    ref.eval()

    rng = np.random.default_rng(5)
    b, t_y = 2, 32
    x = rng.normal(size=(b, cfg.n_feats, t_y)).astype(np.float32)
    mu = rng.normal(size=(b, cfg.n_feats, t_y)).astype(np.float32)
    mask = np.zeros((b, 1, t_y), np.float32)
    mask[0, :, :32] = 1.0
    mask[1, :, :24] = 1.0
    spks = rng.normal(size=(b, cfg.spk_emb_dim)).astype(np.float32)
    t = np.array([0.35, 0.75], np.float32)
    with torch.no_grad():
        out_ref = ref(
            torch.from_numpy(x), torch.from_numpy(mask), torch.from_numpy(mu),
            torch.from_numpy(t), torch.from_numpy(spks),
        ).numpy()

    sd = {f"decoder.estimator.{k}": v.numpy() for k, v in ref.state_dict().items()}
    out, bs = {}, {}
    _convert_estimator(sd, cfg, out, bs)
    ours = Decoder(cfg=cfg.decoder, in_channels=in_ch, out_channels=cfg.n_feats)
    out_j = ours.apply(
        {"params": out["decoder"]["estimator"],
         "batch_stats": bs["decoder"]["estimator"]},
        jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(mask.transpose(0, 2, 1)),
        jnp.asarray(mu.transpose(0, 2, 1)), jnp.asarray(t), jnp.asarray(spks),
    )

    mae = float(np.abs(np.asarray(out_j) - out_ref.transpose(0, 2, 1)).mean())
    assert mae < 1e-5, mae


def test_conformer_train_mode_batchnorm_parity(ref_dec):
    """Train-mode forward: BatchNorm normalizes with batch statistics and
    updates running buffers (momentum 0.1, unbiased variance), exactly as
    torch — outputs AND updated buffers compared."""
    import jax.numpy as jnp

    from emojivoice_tpu.models.conformer import ConformerBlock

    dim, heads, head_dim = 64, 2, 16
    ref = _wrapper(ref_dec, dim, heads, head_dim, seed=29)
    ref.train()

    rng = np.random.default_rng(7)
    x = rng.normal(size=(3, 20, dim)).astype(np.float32)
    mask = np.ones((3, 20), np.float32)
    mask[2, 12:] = 0.0

    params, stats = _convert_block(ref)  # buffers at init: mean 0, var 1
    out_ref = ref(
        hidden_states=torch.from_numpy(x),
        attention_mask=torch.from_numpy(mask),
        timestep=None,
    ).detach().numpy()
    bn = ref.conv.net[5]
    ref_mean = bn.running_mean.detach().numpy()
    ref_var = bn.running_var.detach().numpy()

    ours = ConformerBlock(dim=dim, heads=heads, head_dim=head_dim)
    out_j, updated = ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x), jnp.asarray(mask), False,
        mutable=["batch_stats"],
    )

    mae = float(np.abs(np.asarray(out_j) - out_ref).mean())
    assert mae < 1e-5, mae
    upd = updated["batch_stats"]["conv"]["bn"]
    np.testing.assert_allclose(np.asarray(upd["mean"]), ref_mean, atol=1e-6)
    np.testing.assert_allclose(np.asarray(upd["var"]), ref_var, atol=1e-5)


def test_conformer_export_import_roundtrip(ref_dec):
    """Our exporter emits lucidrains-named conformer keys that the real
    reference Decoder accepts, and the converter reads them back to the
    identical tree."""
    import jax
    import jax.numpy as jnp

    from emojivoice_tpu.io.torch_ckpt import (
        convert_matcha_state_dict,
        export_matcha_state_dict,
        infer_model_config_from_state_dict,
    )
    from emojivoice_tpu.models import MatchaTTS

    from tests.test_models import tiny_cfg

    cfg = tiny_cfg()
    cfg = dataclasses.replace(
        cfg,
        decoder=dataclasses.replace(
            cfg.decoder, down_block_type="conformer", mid_block_type="conformer",
            up_block_type="conformer",
        ),
    )
    model = MatchaTTS(cfg=cfg)
    rng = jax.random.PRNGKey(3)
    x = jnp.ones((1, 8), jnp.int32)
    y = jnp.zeros((1, 16, cfg.n_feats))
    spks = jnp.array([0]) if cfg.n_spks > 1 else None
    variables = model.init({"params": rng, "dropout": rng}, x, jnp.array([8]), y,
                           jnp.array([16]), spks, rng=rng)
    assert "batch_stats" in variables  # conformer BN stats collected at init

    sd = export_matcha_state_dict(jax.device_get(variables), cfg)
    # torch-side acceptance: the real reference Decoder loads these keys
    est_sd = {k[len("decoder.estimator."):]: torch.from_numpy(np.asarray(v).copy())
              for k, v in sd.items() if k.startswith("decoder.estimator.")}
    in_ch = 2 * cfg.n_feats + (cfg.spk_emb_dim if cfg.n_spks > 1 else 0)
    ref = ref_dec.Decoder(
        in_channels=in_ch, out_channels=cfg.n_feats,
        channels=tuple(cfg.decoder.channels), attention_head_dim=cfg.decoder.attention_head_dim,
        n_blocks=cfg.decoder.n_blocks, num_mid_blocks=cfg.decoder.num_mid_blocks,
        num_heads=cfg.decoder.num_heads, act_fn="snakebeta",
        down_block_type="conformer", mid_block_type="conformer", up_block_type="conformer",
    )
    missing, unexpected = ref.load_state_dict(est_sd, strict=False)
    assert not unexpected, unexpected
    assert all("num_batches_tracked" in k for k in missing), missing

    inferred = infer_model_config_from_state_dict(sd)
    assert inferred.decoder.down_block_type == "conformer"
    assert inferred.decoder.mid_block_type == "conformer"
    assert inferred.decoder.up_block_type == "conformer"
    assert inferred.decoder.attention_head_dim == cfg.decoder.attention_head_dim
    assert inferred.decoder.num_heads == cfg.decoder.num_heads

    back = convert_matcha_state_dict(sd, cfg)
    flat_a = jax.tree_util.tree_leaves_with_path(jax.device_get(variables))
    flat_b = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(back)}
    for k, v in flat_a:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(flat_b[ks], np.asarray(v), atol=1e-6, err_msg=ks)
