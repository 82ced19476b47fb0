"""Tensor-parallel parameter sharding over a 2-D ``(data, model)`` mesh.

The reference's only parallelism is Lightning DDP (SURVEY.md §2.8 — TP/PP
absent there).  This module goes beyond parity the TPU-native way: instead
of explicit collectives, each parameter leaf gets a ``PartitionSpec`` and
``jax.jit``'s GSPMD partitioner inserts the all-gathers/reduce-scatters over
ICI.  The rule set follows the Megatron column→row pairing so that each
matmul pair costs exactly one all-reduce on its output:

acoustic model (models/{text_encoder,decoder}.py):
  - encoder FFN       conv_1 out-sharded   → conv_2 in-sharded
  - encoder attention conv_{q,k,v} out     → conv_o in        (head split)
  - decoder tblock    to_{q,k,v} out       → to_out in        (head split)
  - decoder tblock FF proj_in out (+ snake α/β on the hidden)
                                           → proj_out in
  - time-emb MLP      linear_2 out         → every resnet mlp in
HiFi-GAN (vocoder/hifigan.py) — the MRF residual stacks own the FLOPs:
  - resblock          convs1_* out         → convs2_* in

Everything else (norms, biases of row-parallel layers, embeddings, prenet,
projection heads, up/downsample convs) stays replicated: at this model scale
those are bandwidth-trivial, and replicating them keeps the residual streams
and normalization statistics unsharded.

A rule only applies when the sharded dimension divides by the mesh's model-
axis size; otherwise the leaf silently stays replicated (so the same rules
work for any tp degree that divides the hidden dims — 2/4/8 for the
flagship).  With tp=1 every leaf resolves to replicated and the result is
exactly the round-1 data-parallel program.
"""

from __future__ import annotations

import re
from typing import Any, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"

# (path regex, index of the dimension to shard on the model axis).
# Paths are "/"-joined flax param paths; regexes are re.search'd.
# Kernels are (k, in, out) for convs and (in, out) for dense layers
# (CLAUDE.md layout invariants), so -1 = column-parallel (output features),
# -2 = row-parallel (input features / reduction dim).
TP_RULES: Sequence[tuple[str, int]] = (
    # --- text encoder (RoPE transformer) ---
    (r"encoder/ffn_\d+/conv_1/(kernel|bias)", -1),
    (r"encoder/ffn_\d+/conv_2/kernel", -2),
    (r"encoder/attn_\d+/conv_[qkv]/(kernel|bias)", -1),
    (r"encoder/attn_\d+/conv_o/kernel", -2),
    # --- decoder U-Net transformer blocks ---
    (r"tblock_\d+/attn1/to_[qkv]/kernel", -1),
    (r"tblock_\d+/attn1/to_out/kernel", -2),
    (r"tblock_\d+/ff/proj_in/(kernel|bias)", -1),
    (r"tblock_\d+/ff/(alpha|beta)$", -1),  # snakebeta acts on the sharded hidden
    (r"tblock_\d+/ff/proj_out/kernel", -2),
    # --- time-embedding MLP → per-resnet conditioning projections ---
    (r"time_mlp/linear_2/(kernel|bias)", -1),
    (r"resnet/mlp/kernel", -2),
    # --- HiFi-GAN MRF residual stacks ---
    (r"resblocks_\d+/convs1_\d+/(kernel|bias)", -1),
    (r"resblocks_\d+/convs2_\d+/kernel", -2),
)


def make_mesh_2d(data: int, model: int, devices=None) -> Mesh:
    """(data × model) mesh over the first data·model devices.

    ``model`` should divide the hidden dims being sharded (see TP_RULES);
    axes are ordered (data, model) so the model axis rides the fastest-
    varying (innermost, highest-bandwidth ICI) device dimension.
    """
    import numpy as np

    if devices is None:
        devices = jax.devices()
    n = data * model
    if n > len(devices):
        raise ValueError(f"Requested {data}x{model} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]).reshape(data, model), ("data", MODEL_AXIS))


def _key_name(k) -> str:
    for attr in ("key", "name", "idx"):  # DictKey / GetAttrKey / SequenceKey
        if hasattr(k, attr):
            return str(getattr(k, attr))
    return str(k)


def _path_str(path) -> str:
    return "/".join(_key_name(k) for k in path)


def spec_for(path: str, shape, tp: int) -> P:
    """PartitionSpec for one param leaf under TP_RULES (replicated if no
    rule matches or the target dim does not divide by tp)."""
    if tp <= 1:
        return P()
    for pattern, dim in TP_RULES:
        if re.search(pattern, path):
            ndim = len(shape)
            d = dim % ndim if ndim else 0
            if ndim == 0 or shape[d] % tp != 0:
                return P()
            spec = [None] * ndim
            spec[d] = MODEL_AXIS
            return P(*spec)
    return P()


def tp_specs(tree: Any, mesh: Mesh) -> Any:
    """PartitionSpec pytree for a parameter (or optimizer-state) pytree.

    Works on concrete arrays or ShapeDtypeStructs (``jax.eval_shape``), and
    on optimizer states whose mu/nu subtrees mirror the param paths — the
    rules match on the path suffix so ``.../mu/params/...`` resolves the
    same way as ``params/...``.
    """
    tp = mesh.shape.get(MODEL_AXIS, 1)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: spec_for(_path_str(path), getattr(leaf, "shape", ()), tp), tree
    )


def tp_shardings(tree: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree (see tp_specs)."""
    return jax.tree.map(lambda s: NamedSharding(mesh, s), tp_specs(tree, mesh),
                        is_leaf=lambda x: isinstance(x, P))


def shard_params(params: Any, mesh: Mesh) -> Any:
    """device_put a parameter tree with its TP shardings (replicates
    non-matching leaves). For inference: load once, then every jitted call
    against these arrays runs tensor-parallel with zero code changes."""
    return jax.device_put(params, tp_shardings(params, mesh))


def count_sharded(tree: Any, mesh: Mesh) -> tuple[int, int]:
    """(# sharded leaves, total leaves) — observability/test helper."""
    specs = jax.tree.leaves(tp_specs(tree, mesh), is_leaf=lambda x: isinstance(x, P))
    return sum(1 for s in specs if s != P()), len(specs)
