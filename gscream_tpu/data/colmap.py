"""COLMAP sparse-reconstruction parsers (pure numpy).

Replaces the reference's duplicated loaders (``scene/colmap_loader.py`` and
``utils/colmap_utils.py`` — near-identical copies, SURVEY.md §2.1): binary
and text readers for ``cameras``, ``images`` and ``points3D`` following the
public COLMAP file format (colmap.github.io/format.html).

A C++ fast path (native/gsnative) is used automatically for large binary
files when the shared library has been built; the numpy path is the
reference implementation and always available.
"""
from __future__ import annotations

import os
import struct
from typing import Dict, NamedTuple

import numpy as np


class ColmapCamera(NamedTuple):
    id: int
    model: str
    width: int
    height: int
    params: np.ndarray


class ColmapImage(NamedTuple):
    id: int
    qvec: np.ndarray     # (4,) w,x,y,z
    tvec: np.ndarray     # (3,)
    camera_id: int
    name: str
    xys: np.ndarray      # (N,2)
    point3d_ids: np.ndarray  # (N,)


CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3), 1: ("PINHOLE", 4), 2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5), 4: ("OPENCV", 8), 5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12), 7: ("FOV", 5), 8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5), 10: ("THIN_PRISM_FISHEYE", 12),
}


def _read(fmt, f):
    size = struct.calcsize(fmt)
    return struct.unpack(fmt, f.read(size))


def read_cameras_binary(path: str) -> Dict[int, ColmapCamera]:
    cams = {}
    with open(path, "rb") as f:
        (n,) = _read("<Q", f)
        for _ in range(n):
            cam_id, model_id, width, height = _read("<iiQQ", f)
            name, n_params = CAMERA_MODELS[model_id]
            params = np.array(_read(f"<{n_params}d", f))
            cams[cam_id] = ColmapCamera(cam_id, name, int(width),
                                        int(height), params)
    return cams


def read_images_binary(path: str) -> Dict[int, ColmapImage]:
    images = {}
    with open(path, "rb") as f:
        (n,) = _read("<Q", f)
        for _ in range(n):
            img_id = _read("<i", f)[0]
            qvec = np.array(_read("<4d", f))
            tvec = np.array(_read("<3d", f))
            cam_id = _read("<i", f)[0]
            name = b""
            while True:
                c = f.read(1)
                if c == b"\x00":
                    break
                name += c
            (n_pts,) = _read("<Q", f)
            data = np.frombuffer(f.read(24 * n_pts), dtype=np.float64)
            data = data.reshape(n_pts, 3)
            xys = data[:, :2].copy()
            ids = data[:, 2].view(np.int64)[:]
            images[img_id] = ColmapImage(img_id, qvec, tvec, cam_id,
                                         name.decode("utf-8"), xys,
                                         ids.copy())
    return images


def read_points3d_binary(path: str):
    """Returns (xyz (N,3) f64, rgb (N,3) u8, error (N,))."""
    with open(path, "rb") as f:
        (n,) = _read("<Q", f)
        xyz = np.empty((n, 3))
        rgb = np.empty((n, 3), np.uint8)
        err = np.empty(n)
        for i in range(n):
            _read("<Q", f)                # point id
            xyz[i] = _read("<3d", f)
            rgb[i] = _read("<3B", f)
            err[i] = _read("<d", f)[0]
            (track_len,) = _read("<Q", f)
            f.read(8 * track_len)
    return xyz, rgb, err


def read_cameras_text(path: str) -> Dict[int, ColmapCamera]:
    cams = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            cams[int(parts[0])] = ColmapCamera(
                int(parts[0]), parts[1], int(parts[2]), int(parts[3]),
                np.array([float(x) for x in parts[4:]]))
    return cams


def read_images_text(path: str) -> Dict[int, ColmapImage]:
    images = {}
    with open(path) as f:
        lines = [ln.strip() for ln in f
                 if ln.strip() and not ln.startswith("#")]
    for meta, pts in zip(lines[0::2], lines[1::2]):
        p = meta.split()
        img_id = int(p[0])
        qvec = np.array([float(x) for x in p[1:5]])
        tvec = np.array([float(x) for x in p[5:8]])
        cam_id = int(p[8])
        name = p[9]
        el = pts.split()
        xys = np.array([float(x) for x in el], dtype=np.float64)
        xys = xys.reshape(-1, 3) if len(el) else np.zeros((0, 3))
        images[img_id] = ColmapImage(img_id, qvec, tvec, cam_id, name,
                                     xys[:, :2], xys[:, 2].astype(np.int64))
    return images


def read_points3d_text(path: str):
    xyz, rgb, err = [], [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            p = line.split()
            xyz.append([float(x) for x in p[1:4]])
            rgb.append([int(x) for x in p[4:7]])
            err.append(float(p[7]))
    return (np.array(xyz), np.array(rgb, np.uint8), np.array(err))


def read_model(sparse_dir: str):
    """(cameras, images, points) from a COLMAP sparse dir, binary or text.

    Uses the native C++ fast path for points3D.bin when built."""
    if os.path.exists(os.path.join(sparse_dir, "cameras.bin")):
        pts_path = os.path.join(sparse_dir, "points3D.bin")
        points = None
        if os.path.exists(pts_path):
            try:
                from .. import native
                points = native.read_points3d(pts_path)
            except Exception:
                points = None
            if points is None:
                points = read_points3d_binary(pts_path)
        return (read_cameras_binary(os.path.join(sparse_dir, "cameras.bin")),
                read_images_binary(os.path.join(sparse_dir, "images.bin")),
                points)
    return (read_cameras_text(os.path.join(sparse_dir, "cameras.txt")),
            read_images_text(os.path.join(sparse_dir, "images.txt")),
            read_points3d_text(os.path.join(sparse_dir, "points3D.txt"))
            if os.path.exists(os.path.join(sparse_dir, "points3D.txt"))
            else None)
