"""Small pytree utilities shared across inference and training."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floats(tree, dtype):
    """Cast every floating leaf of a pytree to ``dtype``; non-float leaves
    (ids, lengths, PRNG key data) pass through.  The one implementation
    behind the bf16-compute casts in the pipeline and the train state."""
    return jax.tree.map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating) else a,
        tree,
    )
