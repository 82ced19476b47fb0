"""C++ MAS backend vs oracle and vs the on-device scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emojivoice_tpu.ops.mas import maximum_path, maximum_path_numpy
from emojivoice_tpu.ops.mas_cpp import maximum_path_host

from tests.test_mas import _make_problem


@pytest.fixture(scope="module", autouse=True)
def build_lib():
    from emojivoice_tpu.ops.mas_cpp import get_library

    get_library()


@pytest.mark.parametrize("seed", [0, 1])
def test_cpp_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    t_xs, t_ys = [5, 3, 8, 1], [12, 3, 20, 6]
    value, mask = _make_problem(rng, 4, 8, 20, t_xs, t_ys)
    got = maximum_path_host(value, mask)
    want = maximum_path_numpy(value * mask, mask)
    np.testing.assert_array_equal(got * mask, want)


def test_cpp_matches_jax_backend():
    rng = np.random.default_rng(2)
    t_xs, t_ys = [6, 4], [15, 9]
    value, mask = _make_problem(rng, 2, 6, 15, t_xs, t_ys, peaked=True)
    via_jax = np.asarray(maximum_path(jnp.asarray(value), jnp.asarray(mask)))
    via_cpp = maximum_path_host(value, mask) * mask
    np.testing.assert_array_equal(via_jax, via_cpp)


def test_cpp_backend_inside_jit():
    rng = np.random.default_rng(3)
    t_xs, t_ys = [5, 7], [11, 14]
    value, mask = _make_problem(rng, 2, 8, 14, t_xs, t_ys)

    @jax.jit
    def f(v, m):
        return maximum_path(v, m, backend="cpp")

    got = np.asarray(f(jnp.asarray(value), jnp.asarray(mask)))
    want = maximum_path_numpy(value * mask, mask)
    np.testing.assert_array_equal(got, want)
