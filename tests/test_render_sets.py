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


def test_spiral_render_set_outputs(tmp_path):
    """Spiral split writes renders, depth, normal maps and an MJPEG AVI."""
    import os
    import jax
    from gscream_tpu.data.synthetic import make_scene
    from gscream_tpu.model.scaffold import ScaffoldConfig, init_scaffold
    from gscream_tpu.train.render_sets import render_set

    cfg = ScaffoldConfig(feat_dim=8, n_offsets=2, voxel_size=0.1,
                         capacity=256)
    scene = make_scene(n_views=3, n_gauss=60, width=64, height=64)
    st = init_scaffold(jax.random.PRNGKey(0), scene.points, cfg)
    cams = [v.camera for v in scene.views]
    out = render_set(str(tmp_path), "spiral", cams, st, cfg,
                     capacity=4096, interpret=True)
    assert len(out["renders"]) == 3
    for i in range(3):
        assert os.path.exists(tmp_path / "spiral" / "renders"
                              / f"{i:05d}.png")
        assert os.path.exists(tmp_path / "spiral" / "normal"
                              / f"{i:05d}.png")
    mp4 = tmp_path / "spiral" / "video.mp4"
    if mp4.exists():                  # cv2 mp4v encoder (preferred)
        import cv2
        cap = cv2.VideoCapture(str(mp4))
        n = 0
        while cap.read()[0]:
            n += 1
        assert n == 3
    else:                             # dependency-free MJPEG AVI fallback
        data = (tmp_path / "spiral" / "video.avi").read_bytes()
        assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
        assert data.count(b"00dc") == 2 * 3      # movi chunks + idx1 rows
