"""pack_columns/unpack_columns parity vs the XLA reshape definition."""
import jax.numpy as jnp
import numpy as np

from gscream_tpu.ops.shuffle import BLK, ILANES, pack_columns, unpack_columns


def _ref_pack(cols):
    # (16, n) -> (n, 16) -> (n//8, 128): the layout pack_instance_data
    # builds via stack+reshape (rasterize_tiled.py:187-196)
    return np.asarray(cols).T.reshape(-1, 128)


def test_pack_matches_reshape():
    rng = np.random.default_rng(0)
    n = 4 * BLK
    cols = rng.normal(size=(ILANES, n)).astype(np.float32)
    out = pack_columns(jnp.asarray(cols), interpret=True)
    np.testing.assert_array_equal(np.asarray(out), _ref_pack(cols))


def test_unpack_matches_reshape():
    rng = np.random.default_rng(1)
    n = 2 * BLK
    packed = rng.normal(size=(n // 8, 128)).astype(np.float32)
    out = unpack_columns(jnp.asarray(packed), interpret=True)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(packed).reshape(-1, ILANES).T)


def test_roundtrip():
    rng = np.random.default_rng(2)
    n = BLK
    cols = rng.normal(size=(ILANES, n)).astype(np.float32)
    back = unpack_columns(pack_columns(jnp.asarray(cols), interpret=True),
                          interpret=True)
    np.testing.assert_array_equal(np.asarray(back), cols)
