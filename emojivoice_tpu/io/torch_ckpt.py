"""Import PyTorch reference checkpoints into our parameter trees.

The released emojivoice voices (Paige/Olivia/Zach — reference /README.md:51-57)
are Lightning checkpoints of the reference MatchaTTS; the vocoders
(hifigan_T2_v1 / hifigan_univ_v1) are raw ``{"generator": state_dict}``
dumps with weight norm (reference: matcha/hifigan/xutils.py:39-45,
cli.py:84-107).  This module:

* reads either with the torch-free zip-pickle reader (io/torch_pickle.py);
* transposes torch layouts into our channels-last layouts once at load
  time — ``Conv1d (out,in,k) → (k,in,out)``, ``Linear/1×1-conv → (in,out)``,
  ``ConvTranspose1d (in,out,k) → (k,in,out)``;
* folds HiFi-GAN weight norm into plain kernels (the reference does the
  same at load via remove_weight_norm, hifigan/models.py:199-206);
* recovers the ModelConfig from tensor shapes PLUS the checkpoint's own
  Lightning ``hyper_parameters`` — read omegaconf-free by walking the
  pickled state of the stand-in objects (extract_hyper_parameters), with
  shape cross-checks for every dimension both sources determine.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from emojivoice_tpu import config as cfglib
from emojivoice_tpu.io.torch_pickle import flatten_state_dict, load_torch_file


# ---------------------------------------------------------------------------
# layout transforms (torch → ours)
# ---------------------------------------------------------------------------

def _conv_w(w: np.ndarray) -> np.ndarray:
    """Conv1d (out, in, k) → (k, in, out)."""
    return np.ascontiguousarray(w.transpose(2, 1, 0))


def _convt_w(w: np.ndarray) -> np.ndarray:
    """ConvTranspose1d (in, out, k) → (k, in, out)."""
    return np.ascontiguousarray(w.transpose(2, 0, 1))


def _dense_w(w: np.ndarray) -> np.ndarray:
    """Linear (out, in) or 1×1 conv (out, in, 1) → (in, out)."""
    if w.ndim == 3:
        w = w[..., 0]
    return np.ascontiguousarray(w.T)


def fold_weight_norm_torch(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """weight_norm dim=0 fold in torch layout: w = g · v / ‖v‖ over dims≥1."""
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt(np.sum(v.astype(np.float64) ** 2, axis=axes, keepdims=True))
    return (g.astype(np.float64) * v.astype(np.float64) / norm).astype(np.float32)


# ---------------------------------------------------------------------------
# generic loading
# ---------------------------------------------------------------------------

def state_dict_arrays(obj: Any) -> Dict[str, np.ndarray]:
    """Flat {name: ndarray} view of an already-loaded checkpoint object.
    Lightning checkpoints are unwrapped to their 'state_dict'; HiFi-GAN
    dumps to 'generator'."""
    if isinstance(obj, dict):
        if "state_dict" in obj:
            obj = obj["state_dict"]
        elif "generator" in obj:
            obj = obj["generator"]
    flat = flatten_state_dict(obj)
    return {k: np.asarray(v, dtype=np.float32) for k, v in flat.items() if isinstance(v, np.ndarray)}


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Flat {name: ndarray} from a torch checkpoint file."""
    return state_dict_arrays(load_torch_file(path))


# ---------------------------------------------------------------------------
# Lightning hyper_parameters (omegaconf-free)
# ---------------------------------------------------------------------------

def _plain_hparams(obj: Any) -> Any:
    """Recursively strip omegaconf/Lightning wrappers into plain python.

    The zip-pickle reader materializes absent classes as stand-ins carrying
    their pickled payload; the omegaconf state layout is walked here:
    DictConfig/ListConfig keep their children under ``_content``, ValueNode
    leaves keep theirs under ``_val`` (``"???"`` = MISSING → None), and
    Lightning's AttributeDict is a dict subclass whose items the reader
    collects into ``dict_items``."""
    if isinstance(obj, dict):
        return {k: _plain_hparams(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain_hparams(v) for v in obj]
    st = getattr(obj, "state", None)
    if isinstance(st, dict):
        if "_content" in st:
            return _plain_hparams(st["_content"])
        if "_val" in st:
            v = st["_val"]
            return None if (isinstance(v, str) and v == "???") else _plain_hparams(v)
        return {k: _plain_hparams(v) for k, v in st.items() if not str(k).startswith("_")}
    items = getattr(obj, "dict_items", None)
    if isinstance(items, dict):
        return {k: _plain_hparams(v) for k, v in items.items()}
    items = getattr(obj, "list_items", None)
    if isinstance(items, list):
        return [_plain_hparams(v) for v in items]
    return obj


def extract_hyper_parameters(ckpt_obj: Any) -> Optional[dict]:
    """Plain-python view of a Lightning checkpoint's embedded hparams.

    The reference saves its __init__ kwargs via ``save_hyperparameters``
    (matcha_tts.py:45); hydra-composed values pickle as omegaconf objects,
    readable without omegaconf via the stand-in walk above.  Returns None
    when the checkpoint carries no hyper_parameters (raw state-dict dumps)."""
    if not isinstance(ckpt_obj, dict):
        return None
    hp = ckpt_obj.get("hyper_parameters", ckpt_obj.get("hparams"))
    if hp is None:
        return None
    plain = _plain_hparams(hp)
    return plain if isinstance(plain, dict) and plain else None


# ---------------------------------------------------------------------------
# MatchaTTS
# ---------------------------------------------------------------------------

def infer_model_config_from_state_dict(
    sd: Dict[str, np.ndarray], hparams: Optional[dict] = None
) -> cfglib.ModelConfig:
    """Re-derive the architecture from tensor shapes, refined by the
    checkpoint's own hyper_parameters when available.

    Shapes are authoritative for every dimension they determine; hparams
    fill in what shapes cannot see — the encoder head count (q/k/v pack
    into one channel axis), the decoder heads×head_dim split, dropout
    rates, sigma_min, out_size, prior_loss — and are cross-checked against
    the shapes for the dimensions both determine (ValueError on conflict:
    a wrong split would silently scramble attention)."""
    n_vocab, n_channels = sd["encoder.emb.weight"].shape
    n_spks, spk_emb_dim = sd["spk_emb.weight"].shape if "spk_emb.weight" in sd else (1, 64)
    n_feats = sd["encoder.proj_m.weight"].shape[0]
    filter_channels = sd["encoder.encoder.ffn_layers.0.conv_1.weight"].shape[0]
    filter_channels_dp = sd["encoder.proj_w.conv_1.weight"].shape[0]
    enc_kernel = sd["encoder.encoder.ffn_layers.0.conv_1.weight"].shape[2]
    dp_kernel = sd["encoder.proj_w.conv_1.weight"].shape[2]
    n_layers = 1 + max(
        int(k.split(".")[3]) for k in sd if k.startswith("encoder.encoder.attn_layers.")
    )
    prenet = any(k.startswith("encoder.prenet.conv_layers") for k in sd)

    n_down = 1 + max(int(k.split(".")[3]) for k in sd if k.startswith("decoder.estimator.down_blocks."))
    channels = tuple(
        sd[f"decoder.estimator.down_blocks.{i}.0.block1.block.0.weight"].shape[0] for i in range(n_down)
    )
    num_mid = 1 + max(int(k.split(".")[3]) for k in sd if k.startswith("decoder.estimator.mid_blocks."))

    def _block_type(prefix: str) -> str:
        """transformer vs conformer, from the attention projection key shape
        (transformer: attn1.to_q; conformer wrapper: attn.fn.to_q —
        reference decoder.py:318-343 get_block)."""
        if f"{prefix}.attn1.to_q.weight" in sd:
            return "transformer"
        if f"{prefix}.attn.fn.to_q.weight" in sd:
            return "conformer"
        raise KeyError(f"cannot identify block type at {prefix}")

    down_bt = _block_type("decoder.estimator.down_blocks.0.1.0")
    mid_bt = _block_type("decoder.estimator.mid_blocks.0.1.0")
    up_bt = _block_type("decoder.estimator.up_blocks.0.1.0")
    if down_bt == "transformer":
        head_dim_times_heads = sd["decoder.estimator.down_blocks.0.1.0.attn1.to_q.weight"].shape[0]
    else:
        head_dim_times_heads = sd["decoder.estimator.down_blocks.0.1.0.attn.fn.to_q.weight"].shape[0]
    # conformer attention stores a (2·max_pos+1, head_dim) distance table —
    # the head split is visible in the shapes, no heuristic needed
    conf_head_dim = None
    for k in sd:
        if k.endswith(".attn.fn.rel_pos_emb.weight") and k.startswith("decoder.estimator."):
            conf_head_dim = int(sd[k].shape[1])
            break
    n_blocks = 1 + max(
        int(k.split(".")[5]) for k in sd if k.startswith("decoder.estimator.down_blocks.0.1.")
    )

    hp = hparams or {}
    enc_hp = (hp.get("encoder") or {}).get("encoder_params") or {}
    dp_hp = (hp.get("encoder") or {}).get("duration_predictor_params") or {}
    dec_hp = hp.get("decoder") or {}
    cfm_hp = hp.get("cfm") or {}

    def _hp(d: dict, key: str, default):
        """hparams value with a None-check — `or` would silently override a
        legitimate 0/0.0 stored in the checkpoint (e.g. p_dropout=0.0)."""
        v = d.get(key)
        return default if v is None else v

    # encoder heads: invisible to shapes (q/k/v pack into one channel axis)
    n_heads = int(_hp(enc_hp, "n_heads", 2))
    if n_channels % n_heads != 0:
        raise ValueError(
            f"hyper_parameters say n_heads={n_heads} but encoder channels {n_channels} do not divide"
        )

    # decoder heads×head_dim split: hparams are the ground truth, the
    # to_q row count is the cross-check; a missing half of the pair is
    # derived from the row count, not defaulted (a 4-head/32-dim ckpt that
    # only stores num_heads must not be rejected against head_dim=64)
    hp_head_dim = dec_hp.get("attention_head_dim")
    hp_num_heads = dec_hp.get("num_heads")
    if hp_head_dim is not None or hp_num_heads is not None:
        if hp_head_dim is None:
            num_heads = int(hp_num_heads)
            attention_head_dim = head_dim_times_heads // num_heads
        elif hp_num_heads is None:
            attention_head_dim = int(hp_head_dim)
            num_heads = head_dim_times_heads // attention_head_dim
        else:
            attention_head_dim, num_heads = int(hp_head_dim), int(hp_num_heads)
        if num_heads * attention_head_dim != head_dim_times_heads:
            raise ValueError(
                f"hyper_parameters say {num_heads} heads × {attention_head_dim} dims but "
                f"attn1.to_q has {head_dim_times_heads} rows"
            )
    elif conf_head_dim is not None:
        attention_head_dim = conf_head_dim
        num_heads = head_dim_times_heads // attention_head_dim
    else:
        # reference default: head_dim 64 (configs/model/decoder/default.yaml)
        attention_head_dim = 64 if head_dim_times_heads % 64 == 0 else head_dim_times_heads
        num_heads = head_dim_times_heads // attention_head_dim
    if conf_head_dim is not None and conf_head_dim != attention_head_dim:
        raise ValueError(
            f"conformer rel_pos_emb says head_dim={conf_head_dim} but the head split "
            f"resolved to {attention_head_dim}"
        )

    # hparams-refined dims that shapes also see: cross-check, do not trust blindly
    for name, shape_val in (("n_vocab", n_vocab), ("n_spks", n_spks), ("n_feats", n_feats)):
        if hp.get(name) is not None and int(hp[name]) != shape_val:
            # the reference itself has one known mismatch: the symbol table has
            # 198 rows against n_vocab=178 (text/symbols.py quirk) — the
            # embedding row count is what the checkpoint actually contains
            if name == "n_vocab":
                continue
            raise ValueError(f"hyper_parameters {name}={hp[name]} vs checkpoint shape {shape_val}")

    stats = cfglib.DataStatistics(
        mel_mean=float(sd.get("mel_mean", np.zeros(()))),
        mel_std=float(sd.get("mel_std", np.ones(()))),
    )
    if not ("mel_mean" in sd) and isinstance(hp.get("data_statistics"), dict):
        ds = hp["data_statistics"]
        if ds.get("mel_mean") is not None:
            stats = cfglib.DataStatistics(mel_mean=float(ds["mel_mean"]), mel_std=float(ds["mel_std"]))
    out_size = hp.get("out_size")
    return cfglib.ModelConfig(
        n_vocab=n_vocab,
        n_spks=n_spks,
        spk_emb_dim=spk_emb_dim,
        n_feats=n_feats,
        encoder=cfglib.EncoderConfig(
            n_feats=n_feats,
            n_channels=n_channels,
            filter_channels=filter_channels,
            n_heads=n_heads,
            n_layers=n_layers,
            kernel_size=enc_kernel,
            p_dropout=float(_hp(enc_hp, "p_dropout", 0.1)),
            prenet=prenet,
        ),
        duration_predictor=cfglib.DurationPredictorConfig(
            filter_channels_dp=filter_channels_dp, kernel_size=dp_kernel,
            # the DP block records its own p_dropout in hparams; the
            # reference shares the encoder's when the block is absent
            p_dropout=float(_hp(dp_hp, "p_dropout", _hp(enc_hp, "p_dropout", 0.1))),
        ),
        decoder=cfglib.DecoderConfig(
            channels=channels,
            dropout=float(_hp(dec_hp, "dropout", 0.05)),
            attention_head_dim=attention_head_dim,
            n_blocks=n_blocks,
            num_mid_blocks=num_mid,
            num_heads=num_heads,
            down_block_type=down_bt,
            mid_block_type=mid_bt,
            up_block_type=up_bt,
        ),
        cfm=cfglib.CFMConfig(sigma_min=float(_hp(cfm_hp, "sigma_min", 1e-4))),
        data_statistics=stats,
        out_size=int(out_size) if out_size is not None else None,
        prior_loss=bool(hp.get("prior_loss", True)),
        use_precomputed_durations=bool(hp.get("use_precomputed_durations", False)),
    )


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convert_resnet(sd, tname: str, out: dict, opath: Tuple[str, ...]):
    _set(out, opath + ("mlp", "kernel"), _dense_w(sd[f"{tname}.mlp.1.weight"]))
    _set(out, opath + ("mlp", "bias"), sd[f"{tname}.mlp.1.bias"])
    for blk in ("block1", "block2"):
        _set(out, opath + (blk, "conv", "kernel"), _conv_w(sd[f"{tname}.{blk}.block.0.weight"]))
        _set(out, opath + (blk, "conv", "bias"), sd[f"{tname}.{blk}.block.0.bias"])
        _set(out, opath + (blk, "norm", "scale"), sd[f"{tname}.{blk}.block.1.weight"])
        _set(out, opath + (blk, "norm", "bias"), sd[f"{tname}.{blk}.block.1.bias"])
    _set(out, opath + ("res_conv", "kernel"), _dense_w(sd[f"{tname}.res_conv.weight"]))
    _set(out, opath + ("res_conv", "bias"), sd[f"{tname}.res_conv.bias"])


def _convert_tblock(sd, tname: str, out: dict, opath: Tuple[str, ...]):
    for norm in ("norm1", "norm3"):
        _set(out, opath + (norm, "scale"), sd[f"{tname}.{norm}.weight"])
        _set(out, opath + (norm, "bias"), sd[f"{tname}.{norm}.bias"])
    for proj in ("to_q", "to_k", "to_v"):
        _set(out, opath + ("attn1", proj, "kernel"), _dense_w(sd[f"{tname}.attn1.{proj}.weight"]))
    _set(out, opath + ("attn1", "to_out", "kernel"), _dense_w(sd[f"{tname}.attn1.to_out.0.weight"]))
    _set(out, opath + ("attn1", "to_out", "bias"), sd[f"{tname}.attn1.to_out.0.bias"])
    _set(out, opath + ("ff", "proj_in", "kernel"), _dense_w(sd[f"{tname}.ff.net.0.proj.weight"]))
    _set(out, opath + ("ff", "proj_in", "bias"), sd[f"{tname}.ff.net.0.proj.bias"])
    _set(out, opath + ("ff", "alpha"), sd[f"{tname}.ff.net.0.alpha"])
    _set(out, opath + ("ff", "beta"), sd[f"{tname}.ff.net.0.beta"])
    _set(out, opath + ("ff", "proj_out", "kernel"), _dense_w(sd[f"{tname}.ff.net.2.weight"]))
    _set(out, opath + ("ff", "proj_out", "bias"), sd[f"{tname}.ff.net.2.bias"])


def _pw_w(w: np.ndarray) -> np.ndarray:
    """torch 1×1 Conv1d weight (out, in, 1) → flax Dense kernel (in, out)."""
    return np.ascontiguousarray(w[:, :, 0].T)


def _convert_cblock(sd, tname: str, out: dict, bstats: dict, opath: Tuple[str, ...]):
    """Conformer block (reference ConformerWrapper = lucidrains-0.3.2
    ConformerBlock, decoder.py:161-197) → models/conformer.py tree.
    BatchNorm running statistics go to the ``batch_stats`` collection."""
    for ff in ("ff1", "ff2"):
        _set(out, opath + (ff, "norm", "scale"), sd[f"{tname}.{ff}.fn.norm.weight"])
        _set(out, opath + (ff, "norm", "bias"), sd[f"{tname}.{ff}.fn.norm.bias"])
        _set(out, opath + (ff, "in_proj", "kernel"), _dense_w(sd[f"{tname}.{ff}.fn.fn.net.0.weight"]))
        _set(out, opath + (ff, "in_proj", "bias"), sd[f"{tname}.{ff}.fn.fn.net.0.bias"])
        _set(out, opath + (ff, "out_proj", "kernel"), _dense_w(sd[f"{tname}.{ff}.fn.fn.net.3.weight"]))
        _set(out, opath + (ff, "out_proj", "bias"), sd[f"{tname}.{ff}.fn.fn.net.3.bias"])
    _set(out, opath + ("attn", "norm", "scale"), sd[f"{tname}.attn.norm.weight"])
    _set(out, opath + ("attn", "norm", "bias"), sd[f"{tname}.attn.norm.bias"])
    _set(out, opath + ("attn", "to_q", "kernel"), _dense_w(sd[f"{tname}.attn.fn.to_q.weight"]))
    _set(out, opath + ("attn", "to_kv", "kernel"), _dense_w(sd[f"{tname}.attn.fn.to_kv.weight"]))
    _set(out, opath + ("attn", "to_out", "kernel"), _dense_w(sd[f"{tname}.attn.fn.to_out.weight"]))
    _set(out, opath + ("attn", "to_out", "bias"), sd[f"{tname}.attn.fn.to_out.bias"])
    _set(out, opath + ("attn", "rel_pos_emb"), sd[f"{tname}.attn.fn.rel_pos_emb.weight"])
    cv = f"{tname}.conv.net"
    _set(out, opath + ("conv", "norm", "scale"), sd[f"{cv}.0.weight"])
    _set(out, opath + ("conv", "norm", "bias"), sd[f"{cv}.0.bias"])
    _set(out, opath + ("conv", "pointwise_in", "kernel"), _pw_w(sd[f"{cv}.2.weight"]))
    _set(out, opath + ("conv", "pointwise_in", "bias"), sd[f"{cv}.2.bias"])
    # depthwise torch weight (inner, 1, k) → ours (k, 1, inner)
    _set(out, opath + ("conv", "depthwise_kernel"),
         np.ascontiguousarray(sd[f"{cv}.4.conv.weight"].transpose(2, 1, 0)))
    _set(out, opath + ("conv", "depthwise_bias"), sd[f"{cv}.4.conv.bias"])
    _set(out, opath + ("conv", "bn", "scale"), sd[f"{cv}.5.weight"])
    _set(out, opath + ("conv", "bn", "bias"), sd[f"{cv}.5.bias"])
    _set(bstats, opath + ("conv", "bn", "mean"), sd[f"{cv}.5.running_mean"])
    _set(bstats, opath + ("conv", "bn", "var"), sd[f"{cv}.5.running_var"])
    _set(out, opath + ("conv", "pointwise_out", "kernel"), _pw_w(sd[f"{cv}.7.weight"]))
    _set(out, opath + ("conv", "pointwise_out", "bias"), sd[f"{cv}.7.bias"])
    _set(out, opath + ("post_norm", "scale"), sd[f"{tname}.post_norm.weight"])
    _set(out, opath + ("post_norm", "bias"), sd[f"{tname}.post_norm.bias"])


def convert_matcha_state_dict(sd: Dict[str, np.ndarray], cfg: Optional[cfglib.ModelConfig] = None) -> dict:
    """Torch MatchaTTS state dict → flax variables tree (matches
    models/matcha.py).  Returns {"params": ...} plus a "batch_stats"
    collection when the checkpoint contains conformer BatchNorm stats."""
    if cfg is None:
        cfg = infer_model_config_from_state_dict(sd)
    out: dict = {}
    bstats: dict = {}

    if cfg.n_spks > 1:
        _set(out, ("spk_emb", "embedding"), sd["spk_emb.weight"])

    _convert_encoder(sd, cfg, out)
    _convert_estimator(sd, cfg, out, bstats)
    if bstats:
        return {"params": out, "batch_stats": bstats}
    return {"params": out}


def _convert_encoder(sd: Dict[str, np.ndarray], cfg: cfglib.ModelConfig, out: dict) -> None:
    """TextEncoder section of the state-dict conversion (keys "encoder.*").

    Factored out so parity tests can convert a standalone reference
    TextEncoder state dict (reference text_encoder.py:328-410) without the
    rest of the model."""
    _set(out, ("encoder", "emb", "embedding"), sd["encoder.emb.weight"])
    if cfg.encoder.prenet:
        for i in range(3):
            _set(out, ("encoder", "prenet", f"conv_{i}", "kernel"),
                 _conv_w(sd[f"encoder.prenet.conv_layers.{i}.weight"]))
            _set(out, ("encoder", "prenet", f"conv_{i}", "bias"),
                 sd[f"encoder.prenet.conv_layers.{i}.bias"])
            _set(out, ("encoder", "prenet", f"norm_{i}", "gamma"),
                 sd[f"encoder.prenet.norm_layers.{i}.gamma"])
            _set(out, ("encoder", "prenet", f"norm_{i}", "beta"),
                 sd[f"encoder.prenet.norm_layers.{i}.beta"])
        _set(out, ("encoder", "prenet", "proj", "kernel"), _dense_w(sd["encoder.prenet.proj.weight"]))
        _set(out, ("encoder", "prenet", "proj", "bias"), sd["encoder.prenet.proj.bias"])

    for i in range(cfg.encoder.n_layers):
        for proj in ("conv_q", "conv_k", "conv_v", "conv_o"):
            _set(out, ("encoder", "encoder", f"attn_{i}", proj, "kernel"),
                 _dense_w(sd[f"encoder.encoder.attn_layers.{i}.{proj}.weight"]))
            _set(out, ("encoder", "encoder", f"attn_{i}", proj, "bias"),
                 sd[f"encoder.encoder.attn_layers.{i}.{proj}.bias"])
        for our, theirs in (("norm1", "norm_layers_1"), ("norm2", "norm_layers_2")):
            _set(out, ("encoder", "encoder", f"{our}_{i}", "gamma"),
                 sd[f"encoder.encoder.{theirs}.{i}.gamma"])
            _set(out, ("encoder", "encoder", f"{our}_{i}", "beta"),
                 sd[f"encoder.encoder.{theirs}.{i}.beta"])
        for c in ("conv_1", "conv_2"):
            _set(out, ("encoder", "encoder", f"ffn_{i}", c, "kernel"),
                 _conv_w(sd[f"encoder.encoder.ffn_layers.{i}.{c}.weight"]))
            _set(out, ("encoder", "encoder", f"ffn_{i}", c, "bias"),
                 sd[f"encoder.encoder.ffn_layers.{i}.{c}.bias"])

    _set(out, ("encoder", "proj_m", "kernel"), _dense_w(sd["encoder.proj_m.weight"]))
    _set(out, ("encoder", "proj_m", "bias"), sd["encoder.proj_m.bias"])
    for c in ("conv_1", "conv_2"):
        _set(out, ("encoder", "proj_w", c, "kernel"), _conv_w(sd[f"encoder.proj_w.{c}.weight"]))
        _set(out, ("encoder", "proj_w", c, "bias"), sd[f"encoder.proj_w.{c}.bias"])
    for n in ("norm_1", "norm_2"):
        _set(out, ("encoder", "proj_w", n, "gamma"), sd[f"encoder.proj_w.{n}.gamma"])
        _set(out, ("encoder", "proj_w", n, "beta"), sd[f"encoder.proj_w.{n}.beta"])
    _set(out, ("encoder", "proj_w", "proj", "kernel"), _dense_w(sd["encoder.proj_w.proj.weight"]))
    _set(out, ("encoder", "proj_w", "proj", "bias"), sd["encoder.proj_w.proj.bias"])


def _convert_estimator(sd: Dict[str, np.ndarray], cfg: cfglib.ModelConfig, out: dict,
                       bstats: Optional[dict] = None) -> None:
    """CFM estimator (U-Net) section of the conversion (keys "decoder.estimator.*")."""
    est = "decoder.estimator"
    bstats = {} if bstats is None else bstats

    def _block(region_type: str, tname: str, opath: Tuple[str, ...]):
        if region_type == "conformer":
            _convert_cblock(sd, tname, out, bstats, opath)
        else:
            _convert_tblock(sd, tname, out, opath)

    for lin in ("linear_1", "linear_2"):
        _set(out, ("decoder", "estimator", "time_mlp", lin, "kernel"),
             _dense_w(sd[f"{est}.time_mlp.{lin}.weight"]))
        _set(out, ("decoder", "estimator", "time_mlp", lin, "bias"), sd[f"{est}.time_mlp.{lin}.bias"])

    n_down = len(cfg.decoder.channels)
    for i in range(n_down):
        _convert_resnet(sd, f"{est}.down_blocks.{i}.0", out, ("decoder", "estimator", f"down_{i}_resnet"))
        for j in range(cfg.decoder.n_blocks):
            _block(cfg.decoder.down_block_type, f"{est}.down_blocks.{i}.1.{j}",
                   ("decoder", "estimator", f"down_{i}_tblock_{j}"))
        ds = f"{est}.down_blocks.{i}.2"
        w_key = f"{ds}.conv.weight" if f"{ds}.conv.weight" in sd else f"{ds}.weight"
        b_key = f"{ds}.conv.bias" if f"{ds}.conv.bias" in sd else f"{ds}.bias"
        _set(out, ("decoder", "estimator", f"down_{i}_downsample", "kernel"), _conv_w(sd[w_key]))
        _set(out, ("decoder", "estimator", f"down_{i}_downsample", "bias"), sd[b_key])

    for i in range(cfg.decoder.num_mid_blocks):
        _convert_resnet(sd, f"{est}.mid_blocks.{i}.0", out, ("decoder", "estimator", f"mid_{i}_resnet"))
        for j in range(cfg.decoder.n_blocks):
            _block(cfg.decoder.mid_block_type, f"{est}.mid_blocks.{i}.1.{j}",
                   ("decoder", "estimator", f"mid_{i}_tblock_{j}"))

    for i in range(n_down):
        _convert_resnet(sd, f"{est}.up_blocks.{i}.0", out, ("decoder", "estimator", f"up_{i}_resnet"))
        for j in range(cfg.decoder.n_blocks):
            _block(cfg.decoder.up_block_type, f"{est}.up_blocks.{i}.1.{j}",
                   ("decoder", "estimator", f"up_{i}_tblock_{j}"))
        us = f"{est}.up_blocks.{i}.2"
        if f"{us}.conv.weight" in sd:  # ConvTranspose1d inside Upsample1D
            _set(out, ("decoder", "estimator", f"up_{i}_upsample", "kernel"),
                 _convt_w(sd[f"{us}.conv.weight"]))
            _set(out, ("decoder", "estimator", f"up_{i}_upsample", "bias"), sd[f"{us}.conv.bias"])
        else:  # plain Conv1d on the last stage
            _set(out, ("decoder", "estimator", f"up_{i}_upsample", "kernel"), _conv_w(sd[f"{us}.weight"]))
            _set(out, ("decoder", "estimator", f"up_{i}_upsample", "bias"), sd[f"{us}.bias"])

    _set(out, ("decoder", "estimator", "final_block", "conv", "kernel"),
         _conv_w(sd[f"{est}.final_block.block.0.weight"]))
    _set(out, ("decoder", "estimator", "final_block", "conv", "bias"), sd[f"{est}.final_block.block.0.bias"])
    _set(out, ("decoder", "estimator", "final_block", "norm", "scale"), sd[f"{est}.final_block.block.1.weight"])
    _set(out, ("decoder", "estimator", "final_block", "norm", "bias"), sd[f"{est}.final_block.block.1.bias"])
    _set(out, ("decoder", "estimator", "final_proj", "kernel"), _dense_w(sd[f"{est}.final_proj.weight"]))
    _set(out, ("decoder", "estimator", "final_proj", "bias"), sd[f"{est}.final_proj.bias"])


def load_matcha_params(path: str) -> Tuple[dict, cfglib.ModelConfig]:
    obj = load_torch_file(path)
    hparams = extract_hyper_parameters(obj)
    sd = state_dict_arrays(obj)
    cfg = infer_model_config_from_state_dict(sd, hparams=hparams)
    return convert_matcha_state_dict(sd, cfg), cfg


# ---------------------------------------------------------------------------
# HiFi-GAN
# ---------------------------------------------------------------------------

def _folded(sd: Dict[str, np.ndarray], name: str) -> np.ndarray:
    if f"{name}.weight_g" in sd:
        return fold_weight_norm_torch(sd[f"{name}.weight_g"], sd[f"{name}.weight_v"])
    return sd[f"{name}.weight"]


def _vg(sd: Dict[str, np.ndarray], name: str):
    """(weight_v, weight_g) in torch layout — synthesized from a plain
    weight (g = ‖w‖ over dims≥1, v = w) when the ckpt was already folded."""
    if f"{name}.weight_g" in sd:
        return sd[f"{name}.weight_v"], sd[f"{name}.weight_g"]
    w = sd[f"{name}.weight"]
    axes = tuple(range(1, w.ndim))
    g = np.sqrt(np.sum(w.astype(np.float64) ** 2, axis=axes, keepdims=True)).astype(np.float32)
    return w, g


def convert_hifigan_state_dict(
    sd: Dict[str, np.ndarray], cfg: Optional[cfglib.HiFiGANConfig] = None, fold: bool = True
) -> dict:
    """Torch HiFi-GAN state dict → flax params.

    fold=True (serving): weight norm folded into plain kernels (the
    reference's remove_weight_norm-at-load, models.py:199-206).
    fold=False (training): keep the (v, g) reparameterization so GAN
    fine-tuning matches upstream optimizer geometry — pair with
    ``HiFiGANGenerator(weight_norm=True)``.
    """
    if cfg is None:
        cfg = cfglib.HiFiGANConfig()
    out: dict = {}

    def put(mod_path: tuple, torch_name: str, to_flax):
        if fold:
            _set(out, mod_path + ("kernel",), to_flax(_folded(sd, torch_name)))
        else:
            v, g = _vg(sd, torch_name)
            _set(out, mod_path + ("v",), to_flax(v))
            _set(out, mod_path + ("g",), np.asarray(g).reshape(-1))
        _set(out, mod_path + ("bias",), sd[f"{torch_name}.bias"])

    put(("conv_pre",), "conv_pre", _conv_w)
    n_up = len(cfg.upsample_rates)
    num_kernels = len(cfg.resblock_kernel_sizes)
    for i in range(n_up):
        put((f"ups_{i}",), f"ups.{i}", _convt_w)
    for n in range(n_up * num_kernels):
        # ResBlock1 has convs1/convs2; ResBlock2 has a single convs list
        for group in ("convs1", "convs2", "convs"):
            j = 0
            while f"resblocks.{n}.{group}.{j}.bias" in sd or f"resblocks.{n}.{group}.{j}.weight_g" in sd:
                put((f"resblocks_{n}", f"{group}_{j}"), f"resblocks.{n}.{group}.{j}", _conv_w)
                j += 1
    put(("conv_post",), "conv_post", _conv_w)
    return {"params": out}


def load_hifigan_params(path: str, cfg: Optional[cfglib.HiFiGANConfig] = None,
                        fold: bool = True) -> dict:
    return convert_hifigan_state_dict(load_torch_state_dict(path), cfg, fold=fold)


def _conv2d_w(w: np.ndarray) -> np.ndarray:
    """Conv2d (out, in, kh, kw) → (kh, kw, in, out)."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _effective_weight(sd: Dict[str, np.ndarray], name: str) -> np.ndarray:
    """Plain torch-layout weight for a conv that may be parameterized.

    Handles the three parameterizations the reference discriminators use
    (hifigan/models.py:213,278-280): plain ``weight``, ``weight_norm``
    (weight_g/weight_v → fold), and ``spectral_norm`` (weight_orig with the
    power-iteration vectors weight_u/weight_v; eval-mode semantics compute
    sigma = u·(W_mat v) from the stored vectors and divide — exactly what
    torch does with do_power_iteration=False)."""
    if f"{name}.weight_orig" in sd:
        w = sd[f"{name}.weight_orig"]
        u = sd[f"{name}.weight_u"].reshape(-1)
        w_mat = w.reshape(w.shape[0], -1)
        if f"{name}.weight_v" in sd:
            v = sd[f"{name}.weight_v"].reshape(-1)
        else:
            v = w_mat.T @ u
            v = v / max(float(np.linalg.norm(v)), 1e-12)
        sigma = float(u @ (w_mat @ v))
        return w / sigma
    if f"{name}.weight_g" in sd:
        return fold_weight_norm_torch(sd[f"{name}.weight_g"], sd[f"{name}.weight_v"])
    return sd[f"{name}.weight"]


def convert_mpd_state_dict(sd: Dict[str, np.ndarray], periods=(2, 3, 5, 7, 11)) -> dict:
    """Torch MultiPeriodDiscriminator state dict → flax params.

    Reference naming (hifigan/models.py:251-273): ``discriminators.{i}``
    holds ``convs.0..4`` (Conv2d, weight-normed) + ``conv_post``.  All
    weights are folded to plain kernels (eval semantics)."""
    out: dict = {}
    for i, _ in enumerate(periods):
        t = f"discriminators.{i}"
        d: dict = {}
        j = 0
        while f"{t}.convs.{j}.bias" in sd:
            d[f"convs_{j}"] = {"kernel": _conv2d_w(_effective_weight(sd, f"{t}.convs.{j}")),
                               "bias": sd[f"{t}.convs.{j}.bias"]}
            j += 1
        d["conv_post"] = {"kernel": _conv2d_w(_effective_weight(sd, f"{t}.conv_post")),
                          "bias": sd[f"{t}.conv_post.bias"]}
        out[f"discriminators_{i}"] = d
    return {"params": out}


def convert_msd_state_dict(sd: Dict[str, np.ndarray], n_scales: int = 3) -> dict:
    """Torch MultiScaleDiscriminator state dict → flax params.

    Reference naming (hifigan/models.py:309-334): ``discriminators.{i}``
    holds ``convs.0..6`` (Conv1d) + ``conv_post``; scale 0 is
    spectral-normed, scales 1-2 weight-normed — both handled by
    ``_effective_weight``."""
    out: dict = {}
    for i in range(n_scales):
        t = f"discriminators.{i}"
        d: dict = {}
        j = 0
        while f"{t}.convs.{j}.bias" in sd:
            d[f"convs_{j}"] = {"kernel": _conv_w(_effective_weight(sd, f"{t}.convs.{j}")),
                               "bias": sd[f"{t}.convs.{j}.bias"]}
            j += 1
        d["conv_post"] = {"kernel": _conv_w(_effective_weight(sd, f"{t}.conv_post")),
                          "bias": sd[f"{t}.conv_post.bias"]}
        out[f"discriminators_{i}"] = d
    return {"params": out}


def load_hifigan_discriminators(path: str) -> dict:
    """Read an upstream HiFi-GAN ``do_*`` training checkpoint
    ({'mpd': …, 'msd': …, 'optim_g': …, …}) → {"mpd": params, "msd": params}
    for MultiPeriodDiscriminator / MultiScaleDiscriminator.  Lets GAN
    fine-tuning warm-start from pretrained discriminators instead of random
    init (the generator side pairs with load_hifigan_params)."""
    from emojivoice_tpu.io.torch_pickle import load_torch_file

    obj = load_torch_file(path)
    if not isinstance(obj, dict) or "mpd" not in obj or "msd" not in obj:
        raise ValueError(f"{path}: not a HiFi-GAN do_* checkpoint (missing mpd/msd)")
    return {"mpd": convert_mpd_state_dict(state_dict_arrays(obj["mpd"])),
            "msd": convert_msd_state_dict(state_dict_arrays(obj["msd"]))}


def fold_hifigan_weight_norm(params: dict) -> dict:
    """Fold trained (v, g) generator params into plain kernels for serving
    (the reference's remove_weight_norm, models.py:199-206).  Transposed-conv
    modules (``ups_*``) carry one magnitude per INPUT channel (torch
    weight_norm dim=0 on an (in, out, k) weight); all others per OUTPUT."""

    import jax

    params = jax.device_get(params)

    def walk(tree: dict, path: tuple) -> dict:
        if "v" in tree and "g" in tree:
            v = np.asarray(tree["v"], np.float64)
            g = np.asarray(tree["g"], np.float64)
            if any(str(p).startswith("ups_") for p in path):
                norm = np.sqrt(np.sum(v**2, axis=(0, 2), keepdims=True))
                kernel = g[None, :, None] * v / norm
            else:
                norm = np.sqrt(np.sum(v**2, axis=(0, 1), keepdims=True))
                kernel = g[None, None, :] * v / norm
            out = {k: np.asarray(val) for k, val in tree.items() if k not in ("v", "g")}
            out["kernel"] = kernel.astype(np.float32)
            return out
        return {k: walk(val, path + (k,)) if isinstance(val, dict) else val
                for k, val in tree.items()}

    return walk(params, ())


# ---------------------------------------------------------------------------
# Export (ours → torch layouts/names) — interop in the other direction, and
# the round-trip oracle for the converter tests.
# ---------------------------------------------------------------------------

def _inv_conv_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).transpose(2, 1, 0))


def _inv_convt_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).transpose(1, 2, 0))


def _inv_dense_w(w: np.ndarray, as_conv1x1: bool = False) -> np.ndarray:
    out = np.ascontiguousarray(np.asarray(w).T)
    return out[..., None] if as_conv1x1 else out


def export_matcha_state_dict(params: dict, cfg: cfglib.ModelConfig) -> Dict[str, np.ndarray]:
    """Flax params tree → torch-named state dict (reference layouts)."""
    p = params["params"]
    sd: Dict[str, np.ndarray] = {}

    def np_(x):
        return np.asarray(x, dtype=np.float32)

    if cfg.n_spks > 1:
        sd["spk_emb.weight"] = np_(p["spk_emb"]["embedding"])
    enc = p["encoder"]
    sd["encoder.emb.weight"] = np_(enc["emb"]["embedding"])
    if cfg.encoder.prenet:
        pre = enc["prenet"]
        for i in range(3):
            sd[f"encoder.prenet.conv_layers.{i}.weight"] = _inv_conv_w(pre[f"conv_{i}"]["kernel"])
            sd[f"encoder.prenet.conv_layers.{i}.bias"] = np_(pre[f"conv_{i}"]["bias"])
            sd[f"encoder.prenet.norm_layers.{i}.gamma"] = np_(pre[f"norm_{i}"]["gamma"])
            sd[f"encoder.prenet.norm_layers.{i}.beta"] = np_(pre[f"norm_{i}"]["beta"])
        sd["encoder.prenet.proj.weight"] = _inv_dense_w(pre["proj"]["kernel"], as_conv1x1=True)
        sd["encoder.prenet.proj.bias"] = np_(pre["proj"]["bias"])
    for i in range(cfg.encoder.n_layers):
        lay = enc["encoder"]
        for proj in ("conv_q", "conv_k", "conv_v", "conv_o"):
            sd[f"encoder.encoder.attn_layers.{i}.{proj}.weight"] = _inv_dense_w(
                lay[f"attn_{i}"][proj]["kernel"], as_conv1x1=True
            )
            sd[f"encoder.encoder.attn_layers.{i}.{proj}.bias"] = np_(lay[f"attn_{i}"][proj]["bias"])
        for our, theirs in (("norm1", "norm_layers_1"), ("norm2", "norm_layers_2")):
            sd[f"encoder.encoder.{theirs}.{i}.gamma"] = np_(lay[f"{our}_{i}"]["gamma"])
            sd[f"encoder.encoder.{theirs}.{i}.beta"] = np_(lay[f"{our}_{i}"]["beta"])
        for c in ("conv_1", "conv_2"):
            sd[f"encoder.encoder.ffn_layers.{i}.{c}.weight"] = _inv_conv_w(lay[f"ffn_{i}"][c]["kernel"])
            sd[f"encoder.encoder.ffn_layers.{i}.{c}.bias"] = np_(lay[f"ffn_{i}"][c]["bias"])
    sd["encoder.proj_m.weight"] = _inv_dense_w(enc["proj_m"]["kernel"], as_conv1x1=True)
    sd["encoder.proj_m.bias"] = np_(enc["proj_m"]["bias"])
    pw = enc["proj_w"]
    for c in ("conv_1", "conv_2"):
        sd[f"encoder.proj_w.{c}.weight"] = _inv_conv_w(pw[c]["kernel"])
        sd[f"encoder.proj_w.{c}.bias"] = np_(pw[c]["bias"])
    for n in ("norm_1", "norm_2"):
        sd[f"encoder.proj_w.{n}.gamma"] = np_(pw[n]["gamma"])
        sd[f"encoder.proj_w.{n}.beta"] = np_(pw[n]["beta"])
    sd["encoder.proj_w.proj.weight"] = _inv_dense_w(pw["proj"]["kernel"], as_conv1x1=True)
    sd["encoder.proj_w.proj.bias"] = np_(pw["proj"]["bias"])

    est = p["decoder"]["estimator"]
    for lin in ("linear_1", "linear_2"):
        sd[f"decoder.estimator.time_mlp.{lin}.weight"] = _inv_dense_w(est["time_mlp"][lin]["kernel"])
        sd[f"decoder.estimator.time_mlp.{lin}.bias"] = np_(est["time_mlp"][lin]["bias"])

    def export_resnet(ours: dict, tname: str):
        sd[f"{tname}.mlp.1.weight"] = _inv_dense_w(ours["mlp"]["kernel"])
        sd[f"{tname}.mlp.1.bias"] = np_(ours["mlp"]["bias"])
        for blk in ("block1", "block2"):
            sd[f"{tname}.{blk}.block.0.weight"] = _inv_conv_w(ours[blk]["conv"]["kernel"])
            sd[f"{tname}.{blk}.block.0.bias"] = np_(ours[blk]["conv"]["bias"])
            sd[f"{tname}.{blk}.block.1.weight"] = np_(ours[blk]["norm"]["scale"])
            sd[f"{tname}.{blk}.block.1.bias"] = np_(ours[blk]["norm"]["bias"])
        sd[f"{tname}.res_conv.weight"] = _inv_dense_w(ours["res_conv"]["kernel"], as_conv1x1=True)
        sd[f"{tname}.res_conv.bias"] = np_(ours["res_conv"]["bias"])

    def export_tblock(ours: dict, tname: str):
        for norm in ("norm1", "norm3"):
            sd[f"{tname}.{norm}.weight"] = np_(ours[norm]["scale"])
            sd[f"{tname}.{norm}.bias"] = np_(ours[norm]["bias"])
        for proj in ("to_q", "to_k", "to_v"):
            sd[f"{tname}.attn1.{proj}.weight"] = _inv_dense_w(ours["attn1"][proj]["kernel"])
        sd[f"{tname}.attn1.to_out.0.weight"] = _inv_dense_w(ours["attn1"]["to_out"]["kernel"])
        sd[f"{tname}.attn1.to_out.0.bias"] = np_(ours["attn1"]["to_out"]["bias"])
        sd[f"{tname}.ff.net.0.proj.weight"] = _inv_dense_w(ours["ff"]["proj_in"]["kernel"])
        sd[f"{tname}.ff.net.0.proj.bias"] = np_(ours["ff"]["proj_in"]["bias"])
        sd[f"{tname}.ff.net.0.alpha"] = np_(ours["ff"]["alpha"])
        sd[f"{tname}.ff.net.0.beta"] = np_(ours["ff"]["beta"])
        sd[f"{tname}.ff.net.2.weight"] = _inv_dense_w(ours["ff"]["proj_out"]["kernel"])
        sd[f"{tname}.ff.net.2.bias"] = np_(ours["ff"]["proj_out"]["bias"])

    bstats_est = (params.get("batch_stats") or {}).get("decoder", {}).get("estimator", {})

    def export_cblock(ours: dict, stats: Optional[dict], tname: str):
        """Conformer block → lucidrains-0.3.2 ConformerWrapper names."""
        for ff in ("ff1", "ff2"):
            sd[f"{tname}.{ff}.fn.norm.weight"] = np_(ours[ff]["norm"]["scale"])
            sd[f"{tname}.{ff}.fn.norm.bias"] = np_(ours[ff]["norm"]["bias"])
            sd[f"{tname}.{ff}.fn.fn.net.0.weight"] = _inv_dense_w(ours[ff]["in_proj"]["kernel"])
            sd[f"{tname}.{ff}.fn.fn.net.0.bias"] = np_(ours[ff]["in_proj"]["bias"])
            sd[f"{tname}.{ff}.fn.fn.net.3.weight"] = _inv_dense_w(ours[ff]["out_proj"]["kernel"])
            sd[f"{tname}.{ff}.fn.fn.net.3.bias"] = np_(ours[ff]["out_proj"]["bias"])
        at = ours["attn"]
        sd[f"{tname}.attn.norm.weight"] = np_(at["norm"]["scale"])
        sd[f"{tname}.attn.norm.bias"] = np_(at["norm"]["bias"])
        sd[f"{tname}.attn.fn.to_q.weight"] = _inv_dense_w(at["to_q"]["kernel"])
        sd[f"{tname}.attn.fn.to_kv.weight"] = _inv_dense_w(at["to_kv"]["kernel"])
        sd[f"{tname}.attn.fn.to_out.weight"] = _inv_dense_w(at["to_out"]["kernel"])
        sd[f"{tname}.attn.fn.to_out.bias"] = np_(at["to_out"]["bias"])
        sd[f"{tname}.attn.fn.rel_pos_emb.weight"] = np_(at["rel_pos_emb"])
        cv = ours["conv"]
        sd[f"{tname}.conv.net.0.weight"] = np_(cv["norm"]["scale"])
        sd[f"{tname}.conv.net.0.bias"] = np_(cv["norm"]["bias"])
        sd[f"{tname}.conv.net.2.weight"] = _inv_dense_w(cv["pointwise_in"]["kernel"], as_conv1x1=True)
        sd[f"{tname}.conv.net.2.bias"] = np_(cv["pointwise_in"]["bias"])
        sd[f"{tname}.conv.net.4.conv.weight"] = np_(np.transpose(
            np.asarray(cv["depthwise_kernel"]), (2, 1, 0)))
        sd[f"{tname}.conv.net.4.conv.bias"] = np_(cv["depthwise_bias"])
        sd[f"{tname}.conv.net.5.weight"] = np_(cv["bn"]["scale"])
        sd[f"{tname}.conv.net.5.bias"] = np_(cv["bn"]["bias"])
        st = (stats or {}).get("conv", {}).get("bn", {})
        sd[f"{tname}.conv.net.5.running_mean"] = np_(
            st["mean"]) if "mean" in st else np.zeros_like(np_(cv["bn"]["scale"]))
        sd[f"{tname}.conv.net.5.running_var"] = np_(
            st["var"]) if "var" in st else np.ones_like(np_(cv["bn"]["scale"]))
        sd[f"{tname}.conv.net.7.weight"] = _inv_dense_w(cv["pointwise_out"]["kernel"], as_conv1x1=True)
        sd[f"{tname}.conv.net.7.bias"] = np_(cv["pointwise_out"]["bias"])
        sd[f"{tname}.post_norm.weight"] = np_(ours["post_norm"]["scale"])
        sd[f"{tname}.post_norm.bias"] = np_(ours["post_norm"]["bias"])

    def export_block(region_type: str, name_key: str, tname: str):
        if region_type == "conformer":
            export_cblock(est[name_key], bstats_est.get(name_key), tname)
        else:
            export_tblock(est[name_key], tname)

    n_down = len(cfg.decoder.channels)
    for i in range(n_down):
        export_resnet(est[f"down_{i}_resnet"], f"decoder.estimator.down_blocks.{i}.0")
        for j in range(cfg.decoder.n_blocks):
            export_block(cfg.decoder.down_block_type, f"down_{i}_tblock_{j}",
                         f"decoder.estimator.down_blocks.{i}.1.{j}")
        if i < n_down - 1:
            sd[f"decoder.estimator.down_blocks.{i}.2.conv.weight"] = _inv_conv_w(
                est[f"down_{i}_downsample"]["kernel"])
            sd[f"decoder.estimator.down_blocks.{i}.2.conv.bias"] = np_(est[f"down_{i}_downsample"]["bias"])
        else:
            sd[f"decoder.estimator.down_blocks.{i}.2.weight"] = _inv_conv_w(
                est[f"down_{i}_downsample"]["kernel"])
            sd[f"decoder.estimator.down_blocks.{i}.2.bias"] = np_(est[f"down_{i}_downsample"]["bias"])
    for i in range(cfg.decoder.num_mid_blocks):
        export_resnet(est[f"mid_{i}_resnet"], f"decoder.estimator.mid_blocks.{i}.0")
        for j in range(cfg.decoder.n_blocks):
            export_block(cfg.decoder.mid_block_type, f"mid_{i}_tblock_{j}",
                         f"decoder.estimator.mid_blocks.{i}.1.{j}")
    for i in range(n_down):
        export_resnet(est[f"up_{i}_resnet"], f"decoder.estimator.up_blocks.{i}.0")
        for j in range(cfg.decoder.n_blocks):
            export_block(cfg.decoder.up_block_type, f"up_{i}_tblock_{j}",
                         f"decoder.estimator.up_blocks.{i}.1.{j}")
        if i < n_down - 1:
            sd[f"decoder.estimator.up_blocks.{i}.2.conv.weight"] = _inv_convt_w(
                est[f"up_{i}_upsample"]["kernel"])
            sd[f"decoder.estimator.up_blocks.{i}.2.conv.bias"] = np_(est[f"up_{i}_upsample"]["bias"])
        else:
            sd[f"decoder.estimator.up_blocks.{i}.2.weight"] = _inv_conv_w(est[f"up_{i}_upsample"]["kernel"])
            sd[f"decoder.estimator.up_blocks.{i}.2.bias"] = np_(est[f"up_{i}_upsample"]["bias"])

    sd["decoder.estimator.final_block.block.0.weight"] = _inv_conv_w(est["final_block"]["conv"]["kernel"])
    sd["decoder.estimator.final_block.block.0.bias"] = np_(est["final_block"]["conv"]["bias"])
    sd["decoder.estimator.final_block.block.1.weight"] = np_(est["final_block"]["norm"]["scale"])
    sd["decoder.estimator.final_block.block.1.bias"] = np_(est["final_block"]["norm"]["bias"])
    sd["decoder.estimator.final_proj.weight"] = _inv_dense_w(est["final_proj"]["kernel"], as_conv1x1=True)
    sd["decoder.estimator.final_proj.bias"] = np_(est["final_proj"]["bias"])

    sd["mel_mean"] = np.asarray(cfg.data_statistics.mel_mean, np.float32)
    sd["mel_std"] = np.asarray(cfg.data_statistics.mel_std, np.float32)
    return sd


def export_matcha_hparams(cfg: cfglib.ModelConfig) -> dict:
    """Reference-structured hyper_parameters block (plain dicts).

    Mirrors what the reference's ``save_hyperparameters`` embeds
    (matcha_tts.py:26-45 init kwargs, hydra tree shape from
    configs/model/matcha.yaml + encoder/decoder/cfm defaults), so an
    exported checkpoint documents its own architecture — readable both by
    ``extract_hyper_parameters`` here and by reference-side tooling."""
    return {
        "n_vocab": cfg.n_vocab,
        "n_spks": cfg.n_spks,
        "spk_emb_dim": cfg.spk_emb_dim,
        "n_feats": cfg.n_feats,
        "encoder": {
            "encoder_type": "RoPE Encoder",
            "encoder_params": {
                "n_feats": cfg.n_feats,
                "n_channels": cfg.encoder.n_channels,
                "filter_channels": cfg.encoder.filter_channels,
                "filter_channels_dp": cfg.duration_predictor.filter_channels_dp,
                "n_heads": cfg.encoder.n_heads,
                "n_layers": cfg.encoder.n_layers,
                "kernel_size": cfg.encoder.kernel_size,
                "p_dropout": cfg.encoder.p_dropout,
                "spk_emb_dim": cfg.spk_emb_dim,
                "n_spks": cfg.n_spks,
                "prenet": cfg.encoder.prenet,
            },
            "duration_predictor_params": {
                "filter_channels_dp": cfg.duration_predictor.filter_channels_dp,
                "kernel_size": cfg.duration_predictor.kernel_size,
                "p_dropout": cfg.duration_predictor.p_dropout,
            },
        },
        "decoder": {
            "channels": list(cfg.decoder.channels),
            "dropout": cfg.decoder.dropout,
            "attention_head_dim": cfg.decoder.attention_head_dim,
            "n_blocks": cfg.decoder.n_blocks,
            "num_mid_blocks": cfg.decoder.num_mid_blocks,
            "num_heads": cfg.decoder.num_heads,
            "act_fn": cfg.decoder.act_fn,
            "down_block_type": cfg.decoder.down_block_type,
            "mid_block_type": cfg.decoder.mid_block_type,
            "up_block_type": cfg.decoder.up_block_type,
        },
        "cfm": {"name": "CFM", "solver": cfg.cfm.solver, "sigma_min": cfg.cfm.sigma_min},
        "data_statistics": {
            "mel_mean": cfg.data_statistics.mel_mean,
            "mel_std": cfg.data_statistics.mel_std,
        },
        "out_size": cfg.out_size,
        "prior_loss": cfg.prior_loss,
        "use_precomputed_durations": cfg.use_precomputed_durations,
    }
