import jax.numpy as jnp
import numpy as np

from emojivoice_tpu.utils import (
    default_mel_buckets,
    fix_len_compatibility,
    generate_path,
    intersperse,
    pick_bucket,
    sequence_mask,
)
from emojivoice_tpu.utils.norm import denormalize, normalize


def test_sequence_mask():
    m = sequence_mask(jnp.array([2, 4, 0]), 5)
    expect = np.array(
        [[1, 1, 0, 0, 0], [1, 1, 1, 1, 0], [0, 0, 0, 0, 0]], dtype=bool
    )
    np.testing.assert_array_equal(np.asarray(m), expect)


def test_fix_len_compatibility():
    assert fix_len_compatibility(1) == 4
    assert fix_len_compatibility(4) == 4
    assert fix_len_compatibility(5) == 8
    assert fix_len_compatibility(173) == 176


def test_intersperse():
    assert intersperse([1, 2, 3], 0) == [0, 1, 0, 2, 0, 3, 0]
    assert intersperse([], 0) == [0]


def test_generate_path():
    # durations [2, 1, 3] over 6 mel frames
    dur = jnp.array([[2.0, 1.0, 3.0]])
    mask = jnp.ones((1, 3, 6))
    path = np.asarray(generate_path(dur, mask))
    expect = np.array(
        [
            [1, 1, 0, 0, 0, 0],
            [0, 0, 1, 0, 0, 0],
            [0, 0, 0, 1, 1, 1],
        ],
        dtype=np.float32,
    )
    np.testing.assert_array_equal(path[0], expect)


def test_generate_path_masked():
    dur = jnp.array([[2.0, 2.0, 0.0]])
    mask = np.zeros((1, 3, 6), np.float32)
    mask[0, :2, :4] = 1.0  # only 2 tokens, 4 frames valid
    path = np.asarray(generate_path(dur, jnp.asarray(mask)))
    assert path.sum() == 4
    assert (path[0, 2] == 0).all()


def test_buckets():
    assert pick_bucket(100, default_mel_buckets()) == 128
    assert pick_bucket(128, default_mel_buckets()) == 128
    assert pick_bucket(129, default_mel_buckets()) == 256


def test_normalize_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 7, 80)).astype(np.float32))
    y = normalize(x, -5.5, 2.1)
    z = denormalize(y, -5.5, 2.1)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x), atol=1e-5)


def test_host_prng_key_matches_jax():
    """host_prng_key avoids the eager device put of jax.random.PRNGKey but
    must be bit-identical — same key, same noise stream, same audio."""
    import jax

    from emojivoice_tpu.utils.prng import host_prng_key

    for s in (0, 1, 42, 1234, 2**31 - 1, 2**33 + 5, -1):
        a = np.asarray(jax.random.PRNGKey(s))
        b = host_prng_key(s)
        assert b.dtype == np.uint32
        np.testing.assert_array_equal(a, b, err_msg=f"seed {s}")
    x = np.asarray(jax.random.normal(host_prng_key(7), (4,)))
    y = np.asarray(jax.random.normal(jax.random.PRNGKey(7), (4,)))
    np.testing.assert_array_equal(x, y)


# ---------------------------------------------------------------------------
# Asset resolution (utils/assets.py — the reference's MATCHA_HOME data-dir +
# auto-download convention, utils/utils.py:178-220)
# ---------------------------------------------------------------------------

def test_assets_user_data_dir_override(tmp_path, monkeypatch):
    from emojivoice_tpu.utils import assets

    monkeypatch.setenv("EMOJIVOICE_HOME", str(tmp_path / "custom"))
    d = assets.get_user_data_dir()
    assert d == (tmp_path / "custom" / "emojivoice").resolve()
    assert d.is_dir()


def test_assets_resolution_paths(tmp_path, monkeypatch):
    from emojivoice_tpu.utils import assets

    monkeypatch.setenv("EMOJIVOICE_HOME", str(tmp_path))
    cache = assets.get_user_data_dir()

    # None passes through
    assert assets.resolve_model(None) is None
    # explicit existing path passes through untouched
    f = tmp_path / "local.ckpt"
    f.write_bytes(b"x")
    assert assets.resolve_model(str(f)) == str(f)
    # a cached released-asset name resolves into the data dir
    (cache / "emoji-hri-paige.ckpt").write_bytes(b"y")
    assert assets.resolve_model("emoji-hri-paige.ckpt") == str(cache / "emoji-hri-paige.ckpt")
    # unknown bare name → clear FileNotFoundError naming the cache
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="not a known released asset"):
        assets.resolve_model("no-such-model.ckpt")
    # known-but-uncached with fetching disabled → drop-in instructions
    with _pytest.raises(RuntimeError, match="download"):
        assets.resolve_model("hifigan_univ_v1", allow_fetch=False)
    # fetch failure (zero-egress) surfaces instructions, not a bare crash
    monkeypatch.setattr(assets, "fetch", lambda url, dest, timeout=60.0: (_ for _ in ()).throw(OSError("no egress")))
    with _pytest.raises(RuntimeError, match="place the file"):
        assets.resolve_model("hifigan_univ_v1")
