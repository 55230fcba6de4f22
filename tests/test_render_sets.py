"""Render-set harness tests: normals-from-depth, FPS protocol."""
import numpy as np

from gscream_tpu.train.render_sets import normals_from_depth


def test_normals_flat_plane():
    """A fronto-parallel plane at depth z has normal ≈ -z (camera facing)."""
    h, w = 40, 48
    depth = np.full((h, w), 2.0, np.float32)
    K = np.array([[50.0, 0, w / 2], [0, 50.0, h / 2], [0, 0, 1.0]])
    c2w = np.eye(4)
    n = normals_from_depth(depth, c2w, K)
    assert n.shape == (3, h, w)
    inner = n[:, 8:-8, 8:-8]
    # dominant component along z with consistent sign
    assert np.abs(inner[2]).mean() > 0.95
    assert np.abs(inner[0]).mean() < 0.2
    assert np.abs(inner[1]).mean() < 0.2


def test_normals_tilted_plane():
    """A depth ramp tilts the recovered normal away from the z axis."""
    h, w = 40, 48
    xs = np.arange(w, dtype=np.float32)
    depth = 2.0 + 0.02 * xs[None, :].repeat(h, 0)
    K = np.array([[50.0, 0, w / 2], [0, 50.0, h / 2], [0, 0, 1.0]])
    n = normals_from_depth(depth, np.eye(4), K)
    inner = n[:, 8:-8, 8:-8]
    assert np.abs(inner[0]).mean() > 0.05  # x component engaged
