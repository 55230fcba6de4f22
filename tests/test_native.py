"""Native data-plane tests: C++ parsers/KNN vs the numpy reference paths."""
import os
import struct
import subprocess

import numpy as np
import pytest

from gscream_tpu import native
from gscream_tpu.data import colmap

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libgsnative.so not built")


def _write_points3d(path, xyz, rgb, err):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(xyz)))
        for i in range(len(xyz)):
            f.write(struct.pack("<Q", i + 1))
            f.write(struct.pack("<3d", *xyz[i]))
            f.write(struct.pack("<3B", *rgb[i]))
            f.write(struct.pack("<d", err[i]))
            track = i % 3
            f.write(struct.pack("<Q", track))
            f.write(b"\x00" * (8 * track))


def _write_images(path, n):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", n))
        for i in range(n):
            f.write(struct.pack("<i", i + 1))
            q = np.array([1.0, 0, 0, 0]) + i * 0.01
            f.write(struct.pack("<4d", *q))
            f.write(struct.pack("<3d", i * 1.0, i * 2.0, i * 3.0))
            f.write(struct.pack("<i", 1))
            f.write(f"frame_{i:03d}.jpg".encode() + b"\x00")
            npts = i % 4
            f.write(struct.pack("<Q", npts))
            f.write(b"\x00" * (24 * npts))


def test_points3d_matches_numpy(tmp_path, rng):
    xyz = rng.normal(size=(50, 3))
    rgb = rng.integers(0, 255, (50, 3)).astype(np.uint8)
    err = rng.uniform(0, 1, 50)
    p = str(tmp_path / "points3D.bin")
    _write_points3d(p, xyz, rgb, err)
    nx, nr, ne = native.read_points3d(p)
    px, pr, pe = colmap.read_points3d_binary(p)
    np.testing.assert_allclose(nx, px)
    np.testing.assert_array_equal(nr, pr)
    np.testing.assert_allclose(ne, pe)


def test_images_matches_numpy(tmp_path):
    p = str(tmp_path / "images.bin")
    _write_images(p, 7)
    ids, qvec, tvec, cam_ids, names = native.read_images(p)
    ref = colmap.read_images_binary(p)
    assert list(ids) == sorted(ref.keys())
    for i, img_id in enumerate(ids):
        np.testing.assert_allclose(qvec[i], ref[img_id].qvec)
        np.testing.assert_allclose(tvec[i], ref[img_id].tvec)
        assert names[i] == ref[img_id].name


def test_knn_matches_bruteforce(rng):
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    got = native.knn_mean3_sq(pts)
    d = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    want = np.sort(d, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_knn_clustered(rng):
    """Grid acceleration stays exact on clustered data."""
    a = rng.normal(0, 0.01, (200, 3))
    b = rng.normal(5, 0.01, (200, 3))
    pts = np.concatenate([a, b]).astype(np.float32)
    got = native.knn_mean3_sq(pts)
    d = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    want = np.sort(d, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(got, want, rtol=1e-4)
