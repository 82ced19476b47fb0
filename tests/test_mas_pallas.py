"""Pallas MAS kernel vs oracle (interpret mode on CPU; compiled on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from emojivoice_tpu.ops.mas import maximum_path_numpy
from emojivoice_tpu.ops.mas_pallas import maximum_path_pallas

from tests.test_mas import _make_problem


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    t_xs, t_ys = [5, 3, 8, 1], [12, 3, 20, 6]
    value, mask = _make_problem(rng, 4, 8, 20, t_xs, t_ys)
    got = np.asarray(maximum_path_pallas(jnp.asarray(value), jnp.asarray(mask), interpret=True))
    want = maximum_path_numpy(value * mask, mask)
    np.testing.assert_array_equal(got, want)


def test_pallas_peaked_prior():
    rng = np.random.default_rng(2)
    t_xs, t_ys = [6, 4], [15, 9]
    value, mask = _make_problem(rng, 2, 6, 15, t_xs, t_ys, peaked=True)
    got = np.asarray(maximum_path_pallas(jnp.asarray(value), jnp.asarray(mask), interpret=True))
    want = maximum_path_numpy(value * mask, mask)
    np.testing.assert_array_equal(got, want)


def test_pallas_multiblock_batch():
    """B=17 → two 16-item blocks with zero-length padding in the second."""
    rng = np.random.default_rng(3)
    t_xs = list(rng.integers(2, 9, size=17))
    t_ys = list(rng.integers(8, 21, size=17))
    t_ys = [max(a, b) for a, b in zip(t_ys, t_xs)]
    value, mask = _make_problem(rng, 17, 8, 20, t_xs, t_ys)
    got = np.asarray(maximum_path_pallas(jnp.asarray(value), jnp.asarray(mask), interpret=True))
    want = maximum_path_numpy(value * mask, mask)
    np.testing.assert_array_equal(got, want)


def test_auto_backend_dispatch():
    from emojivoice_tpu.ops.mas import maximum_path

    rng = np.random.default_rng(4)
    value, mask = _make_problem(rng, 2, 6, 15, [6, 4], [15, 9])
    # on the CPU test backend, auto == the scan path
    got = np.asarray(maximum_path(jnp.asarray(value), jnp.asarray(mask)))
    want = maximum_path_numpy(value * mask, mask)
    np.testing.assert_array_equal(got, want)


def test_auto_backend_vmem_guard(monkeypatch):
    """backend="auto" must not route shapes whose (T_y, 16, T_x) f32 block
    exceeds the proven VMEM budget to the Pallas kernel — Mosaic would fail
    to allocate at compile time mid-training (large mel/text buckets)."""
    import jax

    from emojivoice_tpu.ops.mas import resolve_backend

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert resolve_backend((16, 256, 768)) == "pallas"  # proven training config
    assert resolve_backend((16, 128, 512)) == "pallas"  # smaller: fine
    assert resolve_backend((16, 256, 1024)) == "jax"    # 16.8 MB: over budget
    assert resolve_backend((16, 512, 2048)) == "jax"    # 64 MB: far over
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert resolve_backend((16, 128, 256)) == "jax"     # never pallas off-TPU
