"""Synthetic multi-view scenes for tests, demos and benchmarks.

The reference repo ships no scene data (``data/`` holds a placeholder);
this module builds small procedurally-generated scenes with ground-truth
renders from the oracle rasterizer so the full training loop — masked RGB
losses, depth supervision, densification, cross-attention — can be
exercised end to end without SPIN-NeRF downloads.
"""
from __future__ import annotations

import math
from typing import List, NamedTuple

import jax.numpy as jnp
import numpy as np

from ..cameras import Camera, make_camera
from ..ops import projection as proj
from ..ops.rasterize_ref import rasterize_scan


class SyntheticView(NamedTuple):
    camera: Camera
    image: np.ndarray        # (3,H,W) float32
    mask: np.ndarray         # (1,H,W) float32 — "object" region
    depth: np.ndarray        # (1,H,W) float32 — mono-style (affine) depth
    name: str


class SyntheticScene(NamedTuple):
    views: List[SyntheticView]
    points: np.ndarray       # (N,3) init cloud
    ref_index: int


def _orbit_camera(angle: float, radius: float, width: int, height: int,
                  fov: float = 1.0) -> Camera:
    """Camera on a circle in the x-z plane looking at the origin."""
    eye = np.array([radius * math.sin(angle), 0.0,
                    -radius * math.cos(angle)])
    fwd = -eye / np.linalg.norm(eye)          # toward origin
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    true_up = np.cross(fwd, right)
    R_c2w = np.stack([right, true_up, fwd], axis=1)   # columns
    # reference stores R = c2w rotation; T = w2c translation
    T = -R_c2w.T @ eye
    return make_camera(R_c2w, T, fov, fov, width, height)


def make_scene(n_views: int = 6, n_gauss: int = 400, width: int = 64,
               height: int = 64, seed: int = 0,
               radius: float = 2.2) -> SyntheticScene:
    """A blob of gaussians at the origin viewed from an orbit.

    GT images/depths come from the oracle rasterizer on a random gaussian
    cloud; the "object mask" marks a central box (stand-in for the removal
    region), and the mono depth is an affine distortion of true rendered
    depth so the scale/shift alignment path is non-trivial.

    The blob is sized to fill most of the frame — a mostly-empty (black)
    ground truth makes "kill every gaussian" a strong local optimum for
    the masked L1 losses and stalls training, which is a property of the
    data, not the optimizer.
    """
    rng = np.random.default_rng(seed)
    pts = rng.normal(0, 0.55, (n_gauss, 3)).astype(np.float32)
    scales = rng.uniform(0.08, 0.2, (n_gauss, 3)).astype(np.float32)
    quats = rng.normal(size=(n_gauss, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    colors = rng.uniform(0, 1, (n_gauss, 3)).astype(np.float32)
    opac = rng.uniform(0.4, 0.9, n_gauss).astype(np.float32)
    unc = rng.uniform(0, 1, n_gauss).astype(np.float32)
    bg = jnp.zeros(3)

    views = []
    for i in range(n_views):
        cam = _orbit_camera(2 * math.pi * i / n_views, radius, width, height)
        s = proj.preprocess(jnp.asarray(pts), jnp.asarray(scales),
                            jnp.asarray(quats), cam.w2c, cam.full_proj,
                            width, height, cam.tan_fovx, cam.tan_fovy,
                            tile_w=32, tile_h=32)
        out = rasterize_scan(s, jnp.asarray(colors), jnp.asarray(opac),
                             jnp.asarray(unc), bg, width, height,
                             tile_w=32, tile_h=32)
        img = np.asarray(out.color).transpose(2, 0, 1)
        depth = np.asarray(out.depth)
        mask = np.zeros((1, height, width), np.float32)
        mask[:, height // 3: 2 * height // 3,
             width // 3: 2 * width // 3] = 1.0
        # affine "monocular" depth in [0,1]-ish.  Positively correlated
        # with true depth: the reference's |scale| guard in the
        # scale/shift alignment (train.py:548) assumes Marigold-style
        # positive correlation — an anti-correlated target would make the
        # depth loss fight the geometry.
        d = depth / max(depth.max(), 1e-6)
        mono = (0.1 + 0.8 * d).astype(np.float32)[None]
        views.append(SyntheticView(camera=cam, image=img.astype(np.float32),
                                   mask=mask, depth=mono,
                                   name=f"view_{i:03d}"))
    # noisy init cloud (subset + jitter), as a stand-in for COLMAP points
    sel = rng.choice(n_gauss, size=min(200, n_gauss), replace=False)
    init_pts = pts[sel] + rng.normal(0, 0.02, (len(sel), 3)).astype(
        np.float32)
    return SyntheticScene(views=views, points=init_pts, ref_index=0)
