"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's Lightning DDP/NCCL data parallelism
(reference: configs/trainer/ddp.yaml, SURVEY.md §2.8).

Design (scaling-book recipe): build a 1-D ``Mesh`` over the data axis,
annotate the batch as sharded and parameters as replicated, and let XLA
insert the gradient all-reduce over ICI.  No explicit collectives in model
code; ``jax.jit`` with these shardings compiles to the same program the
reference gets from DDP's NCCL all-reduce — minus the framework overhead.

Multi-host (DCN) would only need ``jax.distributed.initialize()`` before
``make_mesh``; at this model scale (~21M params) a single v5e pod slice is
already far past the reference's 2-GPU ceiling.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices."""
    devices = jax.devices()
    if num_devices is not None and num_devices > 0:
        if num_devices > len(devices):
            raise ValueError(f"Requested {num_devices} devices, have {len(devices)}")
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_distributed(coordinator: str, num_processes: int, process_id: int) -> None:
    """Multi-host (DCN) bring-up: one call before any device use.

    The JAX analog of torch.distributed.init_process_group — afterwards
    ``jax.devices()`` spans every process and a mesh over it makes the
    jitted step's collectives run cross-host (Gloo on CPU — literally the
    reference's ddp_sim backend, but real multi-process; ICI/DCN on TPU
    pods).  Reference: configs/trainer/ddp.yaml + ddp_sim.yaml semantics.
    """
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes, process_id=process_id)


def shard_batch(mesh: Mesh, batch: dict, axis: str = "data") -> dict:
    """Place a batch dict with batch-dim sharding over the mesh.

    Single-process: a plain sharded device_put.  Multi-process (after
    ``initialize_distributed``): `batch` holds only THIS process's rows and
    the global array is assembled from per-process shards without any
    cross-host data movement (jax.make_array_from_process_local_data).
    """
    sharding = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)), batch
        )
    # single process: leave numpy arrays as-is — the jitted step's
    # in_shardings places them AT DISPATCH, bundling the transfers with the
    # call instead of one synchronous device_put round trip per array
    # (remote-TPU tunnels make each eager put a full round trip).  Arrays
    # already on device pass through device_put unchanged.
    return jax.tree.map(
        lambda x: x if isinstance(x, np.ndarray) else jax.device_put(x, sharding), batch
    )


def shard_chunk(mesh: Mesh, chunk: dict, axis: str = "data") -> dict:
    """shard_batch for a multi-step chunk: leaves are stacked (K, B, ...)
    and the BATCH dim to shard is dim 1 (dim 0 is the scan axis of
    training.state.make_train_multi_step)."""
    sharding = NamedSharding(mesh, P(None, axis))
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)), chunk
        )
    # single process: numpy rides the dispatch (see shard_batch)
    return jax.tree.map(
        lambda x: x if isinstance(x, np.ndarray) else jax.device_put(x, sharding), chunk
    )


def pad_batch_to_multiple(batch: dict, n: int) -> dict:
    """Pad the batch dim up to a multiple of n by repeating the final row,
    and attach a "row_mask" (B,) f32 — 1 for real rows, 0 for padding.

    The losses weight rows by row_mask (models/matcha.py), so padded rows
    contribute exactly nothing to values or gradients: uneven final batches
    shard over the mesh without dropping data (the reference's DDP simply
    drops them).  row_mask is attached even when no padding is needed so the
    compiled-step pytree structure (and thus the XLA program cache) is the
    same for even and uneven batches."""
    b = next(iter(batch.values())).shape[0]
    pad = (-b) % n
    out = {k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)], axis=0) if pad else v
           for k, v in batch.items()}
    out["row_mask"] = np.concatenate(
        [np.ones(b, np.float32), np.zeros(pad, np.float32)]
    )
    return out
