"""LLFF-style spiral render path (numpy).

Port of the reference spiral-path generation
(``scene/__init__.py:154-234``): average pose → orbiting camera-to-world
matrices with a z-wobble, focal from the near/far bounds, 90th-percentile
translation radii, 120 poses over 2 rotations.
"""
from __future__ import annotations

import numpy as np


def _normalize(v):
    return v / np.linalg.norm(v)


def average_pose(c2ws: np.ndarray) -> np.ndarray:
    """(N,3,4) → (3,4) average pose (scene/__init__.py:191-225)."""
    center = c2ws[..., 3].mean(0)
    z = _normalize(c2ws[..., 2].mean(0))
    y_ = c2ws[..., 1].mean(0)
    x = _normalize(np.cross(z, y_))
    y = np.cross(x, z)
    return np.stack([x, y, z, center], 1)


def _viewmatrix(z, up, pos):
    """scene/__init__.py:227-234 (note the -x flip)."""
    vec2 = _normalize(z)
    vec0 = _normalize(np.cross(up, vec2))
    vec1 = _normalize(np.cross(vec2, vec0))
    m = np.eye(4)
    m[:3] = np.stack([-vec0, vec1, vec2, pos], 1)
    return m


def render_path_spiral(c2w, up, rads, focal, zrate=0.5, n_rots=2,
                       n_views=120):
    """scene/__init__.py:154-162."""
    poses = []
    rads4 = np.array(list(rads) + [1.0])
    for theta in np.linspace(0.0, 2.0 * np.pi * n_rots, n_views + 1)[:-1]:
        c = c2w[:3, :4] @ (np.array([np.cos(theta), -np.sin(theta),
                                     -np.sin(theta * zrate), 1.0]) * rads4)
        z = _normalize(c - c2w[:3, :4] @ np.array([0, 0, -focal, 1.0]))
        poses.append(_viewmatrix(z, up, c))
    return np.stack(poses)


def get_spiral(c2ws_all: np.ndarray, near_fars: np.ndarray,
               rads_scale: float = 0.4, n_views: int = 120) -> np.ndarray:
    """(N,3,4) train poses + (N,2) bounds → (n_views,4,4) spiral c2ws.

    scene/__init__.py:165-183 with the run default rads_scale=0.4
    (scene/__init__.py:135).
    """
    c2w = average_pose(c2ws_all)
    up = _normalize(c2ws_all[:, :3, 1].sum(0))
    dt = 0.75
    close_depth = near_fars.min() * 0.9
    inf_depth = near_fars.max() * 5.0
    focal = 1.0 / ((1.0 - dt) / close_depth + dt / inf_depth)
    tt = c2ws_all[:, :3, 3]
    rads = np.percentile(np.abs(tt), 90, 0) * rads_scale
    return render_path_spiral(c2w, up, rads, focal, zrate=0.5,
                              n_views=n_views)
