"""Render-set harness: spiral / train / test renders + FPS measurement.

Port of the reference ``render_set``/``render_sets`` (train.py:710-884):
renders every view of a split, saves RGB renders, depth maps (viridis PNG
plus raw ``.npy`` for the train split), uncertainty maps and error maps,
and measures FPS as ``1/mean(per-view wall time, skipping the first 5)``
(train.py:756-763, 861-882).  Spiral renders additionally derive normal
maps from depth (train.py:252-298) — provided by
:func:`normals_from_depth`.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..cameras import Camera
from ..model.scaffold import ScaffoldConfig, ScaffoldState, decode
from ..ops.binning import bin_instances
from ..ops.projection import preprocess
from ..ops.rasterize_tiled import TILE_H, TILE_W, rasterize_tiled


def make_render_fn(scaffold: ScaffoldState, cfg: ScaffoldConfig,
                   width: int, height: int, capacity: int,
                   interpret: Optional[bool] = None, white_bg=False):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bg = jnp.ones(3) if white_bg else jnp.zeros(3)

    @jax.jit
    def render(params, mlps, cam: Camera):
        st = scaffold._replace(params=params, mlps=mlps)
        dec = decode(st, cam.cam_center, None, cfg)
        splats = preprocess(
            dec.xyz, dec.scale, dec.rot, cam.w2c, cam.full_proj,
            width, height, cam.tan_fovx, cam.tan_fovy,
            tile_w=TILE_W, tile_h=TILE_H, active_mask=dec.active,
            opacity=dec.opacity)
        binning = bin_instances(splats, capacity, width, height,
                                TILE_W, TILE_H)
        out = rasterize_tiled(splats.mean2d, splats.conic, dec.opacity,
                              dec.color, splats.depth, dec.uncertainty,
                              binning, bg, width, height, interpret)
        visible = jnp.sum((splats.radius > 0).astype(jnp.int32))
        return out, visible

    return render


def _save_png(path: str, img: np.ndarray) -> None:
    import imageio.v2 as imageio
    arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    imageio.imwrite(path, arr)


def _viridis(depth: np.ndarray) -> np.ndarray:
    """Normalized depth → viridis RGB without matplotlib dependency at
    runtime (falls back to grayscale if matplotlib is unavailable)."""
    d = depth - depth.min()
    d = d / max(d.max(), 1e-9)
    try:
        import matplotlib.cm as cm
        return np.asarray(cm.viridis(d))[..., :3]
    except Exception:
        return np.stack([d, d, d], -1)


def _inferno(depth: np.ndarray) -> np.ndarray:
    """Spiral depth colormap: max-normalize then INFERNO, matching
    reference train.py:806-809 (cv2.COLORMAP_INFERNO)."""
    d = depth / max(depth.max(), 1e-9)
    try:
        import matplotlib.cm as cm
        return np.asarray(cm.inferno(d))[..., :3]
    except Exception:
        return np.stack([d, d, d], -1)


def render_set(out_dir: str, split_name: str, cameras: List[Camera],
               scaffold: ScaffoldState, cfg: ScaffoldConfig,
               capacity: int = 1 << 21, save_images: bool = True,
               gt_images: Optional[List[np.ndarray]] = None,
               interpret: Optional[bool] = None) -> Dict:
    """Render every camera; returns {"fps": ..., "renders": [...]}."""
    if not cameras:
        return {"fps": 0.0, "renders": []}
    width, height = cameras[0].width, cameras[0].height
    render = make_render_fn(scaffold, cfg, width, height, capacity,
                            interpret)
    rdir = os.path.join(out_dir, split_name, "renders")
    ddir = os.path.join(out_dir, split_name, "depth")
    if save_images:
        os.makedirs(rdir, exist_ok=True)
        os.makedirs(ddir, exist_ok=True)

    is_spiral = split_name == "spiral"
    ndir = os.path.join(out_dir, split_name, "normal")
    if save_images and is_spiral:
        os.makedirs(ndir, exist_ok=True)

    times, renders, counts = [], [], []
    for idx, cam in enumerate(cameras):
        t0 = time.time()
        out, visible = render(scaffold.params, scaffold.mlps, cam)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
        img = np.asarray(out.color).transpose(2, 0, 1)
        renders.append(img)
        counts.append(int(visible))
        if save_images:
            _save_png(os.path.join(rdir, f"{idx:05d}.png"),
                      np.asarray(out.color))
            depth = np.asarray(out.depth)
            _save_png(os.path.join(ddir, f"{idx:05d}.png"),
                      _inferno(depth) if is_spiral else _viridis(depth))
            if split_name == "train":
                np.save(os.path.join(ddir, f"{idx:05d}.npy"), depth)
            if is_spiral:
                # spiral-only normal maps from rendered depth
                # (reference train.py:820-825 → 252-298)
                w2c = np.asarray(cam.w2c)
                c2w = np.linalg.inv(w2c)
                fx = width / (2.0 * float(cam.tan_fovx))
                fy = height / (2.0 * float(cam.tan_fovy))
                K = np.array([[fx, 0, width / 2.0],
                              [0, fy, height / 2.0],
                              [0, 0, 1.0]])
                nrm = normals_from_depth(depth, c2w, K)
                _save_png(os.path.join(ndir, f"{idx:05d}.png"),
                          (nrm.transpose(1, 2, 0) + 1.0) * 0.5)
            if (gt_images is not None and idx < len(gt_images)
                    and gt_images[idx] is not None):
                # gt/ beside renders/ (reference render_set writes both,
                # train.py:714-745) so evaluate.py can run standalone on
                # the model directory; errors/ likewise
                gdir = os.path.join(out_dir, split_name, "gt")
                edir = os.path.join(out_dir, split_name, "errors")
                os.makedirs(gdir, exist_ok=True)
                os.makedirs(edir, exist_ok=True)
                gt = np.asarray(gt_images[idx])
                _save_png(os.path.join(gdir, f"{idx:05d}.png"),
                          gt.transpose(1, 2, 0))
                err = np.abs(img - gt).mean(0)
                _save_png(os.path.join(edir, f"{idx:05d}.png"),
                          np.stack([err] * 3, -1))
    # FPS skipping 5 warmup frames (train.py:861)
    t = times[5:] if len(times) > 5 else times
    fps = 1.0 / float(np.mean(t)) if t else 0.0
    if save_images:
        with open(os.path.join(out_dir, split_name,
                               "per_view_count.json"), "w") as f:
            json.dump({f"{i:05d}": c for i, c in enumerate(counts)}, f)
        if is_spiral and renders:
            # the reference ffmpeg-encodes an mp4 (train.py:844-846);
            # cv2's bundled mp4v encoder produces video.mp4, with the
            # dependency-free MJPEG AVI as fallback
            from ..utils.video import write_video
            write_video(os.path.join(out_dir, split_name, "video"),
                        [r.transpose(1, 2, 0) for r in renders], fps=30)
    return {"fps": fps, "renders": renders, "visible_counts": counts}


def normals_from_depth(depth: np.ndarray, c2w: np.ndarray, K: np.ndarray,
                       size: int = 9, gamma: float = 0.15) -> np.ndarray:
    """Depth → per-pixel normals via local plane fits.

    Equivalent of the reference's spiral-render normal derivation
    (``depth2pcd_fromplane`` + ``least_square_normal_regress_fast01``,
    train.py:252-298): unproject to camera→world points, fit a plane over a
    size×size window with relative-depth outlier rejection, return the
    negated unit normal, shape (3,H,W).
    """
    h, w = depth.shape
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    x_n = (xs - K[0, 2]) / K[0, 0]
    y_n = (ys - K[1, 2]) / K[1, 1]
    pts_cam = np.stack([x_n * depth, y_n * depth, depth,
                        np.ones_like(depth)], 0).reshape(4, -1)
    pts_w = (c2w @ pts_cam)[:3].reshape(3, h, w)

    half = size // 2
    pad = np.pad(pts_w, ((0, 0), (half, half), (half, half)), mode="edge")
    # gather size*size neighborhoods
    windows = np.empty((h, w, size * size, 3), np.float32)
    for dy in range(size):
        for dx in range(size):
            windows[:, :, dy * size + dx] = pad[
                :, dy:dy + h, dx:dx + w].transpose(1, 2, 0)
    center = windows[:, :, (size * size) // 2][:, :, None]
    rel = (windows - center) / np.where(np.abs(center) > 1e-9, center, 1e-9)
    # the reference tests only the z-relative difference (train.py:279-282)
    bad = np.abs(rel[..., 2]) > gamma
    windows = np.where(bad[..., None], 0.0, windows)

    A = windows.reshape(-1, size * size, 3)
    AtA = np.einsum('nij,nik->njk', A, A)
    det = np.linalg.det(AtA)
    AtA[det < 1e-5] = np.eye(3)
    Atb = A.sum(1)                     # A^T @ ones
    n = np.linalg.solve(AtA, Atb[..., None])[..., 0]
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
    n = np.nan_to_num(n)
    return (-n).reshape(h, w, 3).transpose(2, 0, 1)
