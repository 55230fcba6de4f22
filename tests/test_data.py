"""Data-layer tests: COLMAP text/binary, spiral path, SPIN-NeRF reader."""
import os
import struct

import numpy as np
import pytest

from gscream_tpu.data import colmap
from gscream_tpu.data.spiral import average_pose, get_spiral


def _write_minimal_colmap(sparse, n_imgs=3):
    os.makedirs(sparse, exist_ok=True)
    with open(os.path.join(sparse, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        # SIMPLE_RADIAL (id 2): 4 params
        f.write(struct.pack("<iiQQ", 1, 2, 1000, 800))
        f.write(struct.pack("<4d", 800.0, 500.0, 400.0, 0.0))
    with open(os.path.join(sparse, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_imgs))
        for i in range(n_imgs):
            f.write(struct.pack("<i", i + 1))
            q = np.array([1.0, 0.0, 0.0, 0.0])
            f.write(struct.pack("<4d", *q))
            f.write(struct.pack("<3d", 0.1 * i, 0.0, 2.0))
            f.write(struct.pack("<i", 1))
            f.write(f"IMG_{i:04d}.jpg".encode() + b"\x00")
            f.write(struct.pack("<Q", 0))
    with open(os.path.join(sparse, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", 5))
        for i in range(5):
            f.write(struct.pack("<Q", i))
            f.write(struct.pack("<3d", i * 0.1, 0.0, 1.0))
            f.write(struct.pack("<3B", 10, 20, 30))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 0))


def test_colmap_binary_reader(tmp_path):
    sparse = str(tmp_path / "sparse" / "0")
    _write_minimal_colmap(sparse)
    cams, imgs, pts = colmap.read_model(sparse)
    assert cams[1].model == "SIMPLE_RADIAL"
    assert cams[1].width == 1000
    assert len(imgs) == 3
    assert imgs[1].name == "IMG_0000.jpg"
    np.testing.assert_allclose(imgs[2].tvec, [0.1, 0.0, 2.0])
    xyz, rgb, err = pts
    assert xyz.shape == (5, 3)
    assert rgb[0].tolist() == [10, 20, 30]


def test_colmap_text_reader(tmp_path):
    p = tmp_path / "cameras.txt"
    p.write_text("# comment\n1 PINHOLE 640 480 500 500 320 240\n")
    cams = colmap.read_cameras_text(str(p))
    assert cams[1].model == "PINHOLE" and cams[1].params[0] == 500


def test_spiral_path_shape_and_radius(rng):
    # cameras on a circle looking at origin (c2w with z toward origin)
    c2ws = []
    for a in np.linspace(0, 2 * np.pi, 8, endpoint=False):
        eye = np.array([2 * np.sin(a), 0.1, -2 * np.cos(a)])
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd); right /= np.linalg.norm(right)
        true_up = np.cross(fwd, right)
        c2w = np.stack([right, true_up, fwd, eye], 1)
        c2ws.append(c2w)
    c2ws = np.stack(c2ws)
    near_fars = np.tile([1.0, 6.0], (8, 1))
    poses = get_spiral(c2ws, near_fars, rads_scale=0.4, n_views=120)
    assert poses.shape == (120, 4, 4)
    # rotations orthonormal
    R = poses[:, :3, :3]
    eye3 = np.einsum('nij,nkj->nik', R, R)
    np.testing.assert_allclose(eye3, np.tile(np.eye(3), (120, 1, 1)),
                               atol=1e-6)
    # path centers stay near the average pose center
    avg = average_pose(c2ws)
    d = np.linalg.norm(poses[:, :3, 3] - avg[:, 3], axis=1)
    assert d.max() < 2.0


def test_spinnerf_reader_minimal(tmp_path):
    """Reader handles a bare COLMAP scene (no images on disk)."""
    from gscream_tpu.data.dataset import load_spinnerf_scene
    src = str(tmp_path / "scene")
    _write_minimal_colmap(os.path.join(src, "sparse", "0"))
    sd = load_spinnerf_scene(src, load_images=False)
    assert len(sd.train_views) + len(sd.test_views) == 3
    assert sd.points.shape == (5, 3)
    assert sd.cameras_extent > 0
    # NDC principal point from SIMPLE_RADIAL params
    assert abs(sd.cx_ndc - ((500 - 500) / 1000 * 2)) < 1e-9


def _write_scene_with_images(tmp_path, w=64, h=40):
    import imageio.v2 as imageio
    src = str(tmp_path / "scene")
    _write_minimal_colmap(os.path.join(src, "sparse", "0"))
    os.makedirs(os.path.join(src, "images"), exist_ok=True)
    os.makedirs(os.path.join(src, "images_4"), exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(3):
        open(os.path.join(src, "images", f"IMG_{i:04d}.jpg"), "wb").close()
        img = (rng.uniform(0, 1, (h, w, 3)) * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(src, "images_4", f"IMG_{i:04d}.png"),
                        img)
    return src


def test_resolution_policy_divides(tmp_path):
    """-r 2 halves the stored frames (utils/camera_utils.py:19-58)."""
    from gscream_tpu.data.dataset import load_spinnerf_scene
    src = _write_scene_with_images(tmp_path)
    sd = load_spinnerf_scene(src, resolution=2)
    v = (sd.train_views + sd.test_views)[0]
    assert v.image.shape == (3, 20, 32)
    assert v.camera.width == 32 and v.camera.height == 20


def test_resolution_policy_auto_1600(tmp_path):
    """-r -1 leaves small frames alone and caps >1600px width to 1600."""
    from gscream_tpu.data.dataset import load_spinnerf_scene
    src = _write_scene_with_images(tmp_path, w=64, h=40)
    sd = load_spinnerf_scene(src, resolution=-1)
    v = (sd.train_views + sd.test_views)[0]
    assert v.image.shape == (3, 40, 64)        # untouched below 1600

    src2 = _write_scene_with_images(tmp_path / "big", w=2000, h=1000)
    sd2 = load_spinnerf_scene(src2, resolution=-1)
    v2 = (sd2.train_views + sd2.test_views)[0]
    assert v2.image.shape == (3, 800, 1600)    # scaled to 1600 wide
    assert v2.camera.width == 1600


class TestPfm:
    """MiDaS .pfm loader parity with the reference read_pfm
    (dataset_readers.py:58-86), incl. its two spec deviations (always
    little-endian samples; SIGNED scale multiply)."""

    def _ref_read(self, path, process=True):
        """Straight transcription of the reference for the oracle."""
        with open(path, 'rb') as f:
            assert f.readline().rstrip().decode() == 'Pf'
            w, h = map(int, f.readline().rstrip().split())
            scale = float(f.readline().rstrip())
            data = np.fromfile(f, '<f')
        img = np.flipud(data.reshape(h, w)) * scale
        if process:
            mi, ma = np.percentile(img, 0.01), np.percentile(img, 99.9)
            img = np.clip(img, mi, ma)
            img = img - mi
            return img / img.max()
        return img

    def test_matches_reference_semantics(self, tmp_path):
        from gscream_tpu.data.pfm import read_pfm, write_pfm
        rng = np.random.default_rng(0)
        img = rng.normal(0, 100, (23, 31)).astype(np.float32)
        p = str(tmp_path / "d-dpt_beit_large_512.pfm")
        write_pfm(p, img, scale=-1.0)
        ours = read_pfm(p)
        ref = self._ref_read(p)
        np.testing.assert_allclose(ours, ref, rtol=1e-6)
        assert ours.min() >= 0 and ours.max() == 1.0
        raw = read_pfm(p, process=False)
        np.testing.assert_allclose(raw, -img, rtol=1e-6)  # signed scale

    def test_dataset_pfm_fallback(self, tmp_path, monkeypatch):
        """load_spinnerf_scene picks up midas_output/*.pfm when the
        Marigold .npy is absent."""
        from gscream_tpu.data.pfm import read_pfm
        os.makedirs(tmp_path / "midas_output", exist_ok=True)
        # (direct read check only — the full scene walk is covered by
        # the synthetic-scene integration tests)
        img = np.abs(np.random.default_rng(1).normal(
            1, 0.2, (16, 16))).astype(np.float32)
        from gscream_tpu.data.pfm import write_pfm
        p = str(tmp_path / "midas_output" / "f-dpt_beit_large_512.pfm")
        write_pfm(p, img)
        assert read_pfm(p).shape == (16, 16)
