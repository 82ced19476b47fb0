"""MAS wavefront DP vs a brute-force numpy oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from emojivoice_tpu.ops.mas import maximum_path, maximum_path_numpy


def _make_problem(rng, b, tx_max, ty_max, t_xs, t_ys, peaked=False):
    value = rng.normal(size=(b, tx_max, ty_max)).astype(np.float32)
    if peaked:
        # make a diagonal-ish prior so the path is informative
        for i in range(b):
            xs = np.linspace(0, t_xs[i] - 1, t_ys[i])
            for y in range(t_ys[i]):
                value[i, int(round(xs[y])), y] += 4.0
    mask = np.zeros((b, tx_max, ty_max), np.float32)
    for i in range(b):
        mask[i, : t_xs[i], : t_ys[i]] = 1.0
    return value, mask


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mas_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    t_xs = [5, 3, 8, 1]
    t_ys = [12, 3, 20, 6]
    value, mask = _make_problem(rng, 4, 8, 20, t_xs, t_ys)
    got = np.asarray(maximum_path(jnp.asarray(value), jnp.asarray(mask)))
    want = maximum_path_numpy(value * mask, mask)
    np.testing.assert_array_equal(got, want)


def test_mas_path_properties():
    rng = np.random.default_rng(3)
    t_xs, t_ys = [6, 4], [15, 9]
    value, mask = _make_problem(rng, 2, 6, 15, t_xs, t_ys, peaked=True)
    path = np.asarray(maximum_path(jnp.asarray(value), jnp.asarray(mask)))
    for i in range(2):
        p = path[i, : t_xs[i], : t_ys[i]]
        # every valid mel frame assigned exactly one text token
        np.testing.assert_array_equal(p.sum(axis=0), np.ones(t_ys[i]))
        # monotone non-decreasing token index
        tok = p.argmax(axis=0)
        assert (np.diff(tok) >= 0).all()
        assert (np.diff(tok) <= 1).all()
        # endpoints pinned
        assert tok[0] == 0 and tok[-1] == t_xs[i] - 1
        # durations sum to t_y
        assert p.sum() == t_ys[i]
    # padded region untouched
    assert path[1, t_xs[1]:, :].sum() == 0
    assert path[1, :, t_ys[1]:].sum() == 0


def test_mas_equal_lengths():
    """t_x == t_y forces the identity path."""
    rng = np.random.default_rng(4)
    value, mask = _make_problem(rng, 1, 5, 5, [5], [5])
    path = np.asarray(maximum_path(jnp.asarray(value), jnp.asarray(mask)))
    np.testing.assert_array_equal(path[0], np.eye(5, dtype=np.float32))
