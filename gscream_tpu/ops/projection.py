"""Gaussian preprocess: world-space gaussians → screen-space splats.

Vectorized pure-JAX equivalent of the reference CUDA preprocess
(``cuda_rasterizer/forward.cu:157-267`` ``preprocessCUDA``), fully
differentiable — ``jax.vjp`` of this module replaces the hand-written
``backward.cu:144-406`` (cov2D/projection/cov3D backward) for free.

Semantics matched to the reference:

* near-plane cull at view z <= 0.2       (auxiliary.h:139-164 ``in_frustum``)
* perspective divide by ``w + 1e-7``     (auxiliary.h:146-148)
* quat→rotation with the reference's (r,x,y,z) layout and *unnormalized*
  quaternion (forward.cu:129-141; normalization happens in the caller's
  activation, gaussian_model.py:52)
* EWA Jacobian with 1.3·tan_fov frustum clamp (forward.cu:84-90)
* +0.3 low-pass dilation on the 2D covariance diagonal (forward.cu:112-113)
* radius = ceil(3·sqrt(max eigenvalue)), eigenvalue clamp 0.1
  (forward.cu:229-236)
* depth = view-space z (forward.cu:261)

All functions operate on arrays of N gaussians; invalid/culled gaussians are
signalled by ``radius == 0`` (mask semantics — XLA prefers multiply-by-zero
over gather/compaction).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# Blend/prune constants of the reference rasterizer (forward.cu:524-541).
ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_STOP = 1e-4
NEAR_Z = 0.2
COV2D_DILATION = 0.3
EIG_CLAMP = 0.1


def clamp_alpha(x: jnp.ndarray) -> jnp.ndarray:
    """min(x, 0.99) in value, identity in gradient.

    The reference backward ignores the clamp boundary — it always uses
    dα/dG = opacity and dα/dop = G even when α hit the 0.99 cap
    (backward.cu:585-604: ``dL_dG = con_o.w * dL_dalpha``).  Reproducing
    that (rather than jnp.minimum's zero-gradient branch) is required for
    pixel-gradient parity with the CUDA rasterizer.
    """
    return x + jax.lax.stop_gradient(jnp.minimum(x, ALPHA_MAX) - x)


class Splats(NamedTuple):
    """Screen-space splats: the rasterizer's per-gaussian inputs."""
    mean2d: jnp.ndarray    # (N,2) pixel coordinates of projected center
    conic: jnp.ndarray     # (N,3) upper triangle of inverse 2D covariance (a,b,c)
    depth: jnp.ndarray     # (N,)  view-space z
    radius: jnp.ndarray    # (N,)  int32 pixel radius, 0 => culled/invalid
    cov2d: jnp.ndarray     # (N,3) dilated 2D covariance (a,b,c), for debugging/tests
    rect_min: jnp.ndarray  # (N,2) int32 inclusive tile rect start (x,y)
    rect_max: jnp.ndarray  # (N,2) int32 exclusive tile rect end (x,y)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(N,4) quaternion (r,x,y,z) → (N,3,3) rotation, reference layout.

    Mirrors forward.cu:129-141 — the quaternion is used as-is (the caller
    normalizes it, matching ``rotation_activation = F.normalize``).
    """
    r, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
        2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
        2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
    ], axis=-1).reshape(-1, 3, 3)
    return R


def build_cov3d(scale: jnp.ndarray, rot: jnp.ndarray,
                scale_modifier: float = 1.0) -> jnp.ndarray:
    """(N,3) scales + (N,4) quats → (N,6) upper-tri 3D covariance.

    Σ = (S R)^T (S R) = R^T S² R with the reference's glm column-major
    convention (forward.cu:120-154 ``computeCov3D``): glm ``M = S * R`` and
    ``Sigma = Mᵀ M`` in column-major equals, row-major, Σ = Rᵀ S² R where R
    is the matrix from :func:`quat_to_rotmat`.
    Returns [Σ00, Σ01, Σ02, Σ11, Σ12, Σ22].
    """
    R = quat_to_rotmat(rot)                       # (N,3,3)
    S = scale_modifier * scale                    # (N,3)
    # glm stores matrices column-major; unwinding its S*R then Mᵀ·M gives,
    # in row-major math, Σ = R·diag(S²)·Rᵀ with R from quat_to_rotmat.
    M = R * S[:, None, :]                         # R·diag(S): scale columns
    sigma = jnp.einsum('nij,nkj->nik', M, M)      # (R S)(R S)ᵀ = R S² Rᵀ
    return jnp.stack([
        sigma[:, 0, 0], sigma[:, 0, 1], sigma[:, 0, 2],
        sigma[:, 1, 1], sigma[:, 1, 2], sigma[:, 2, 2],
    ], axis=-1)


def project_points(means3d: jnp.ndarray, w2c: jnp.ndarray,
                   full_proj: jnp.ndarray):
    """Project (N,3) world points: returns (p_view (N,3), p_ndc (N,3)).

    p_view = w2c @ p ; p_ndc = (full_proj @ p) / (w + 1e-7)
    (auxiliary.h:57-76 transformPoint4x3/4x4 with the reference's epsilon).
    """
    ones = jnp.ones_like(means3d[:, :1])
    hom = jnp.concatenate([means3d, ones], axis=-1)        # (N,4)
    p_view = hom @ w2c[:3].T                               # (N,3)
    p_clip = hom @ full_proj.T                             # (N,4)
    p_w = 1.0 / (p_clip[:, 3:4] + 1e-7)
    p_ndc = p_clip[:, :3] * p_w
    return p_view, p_ndc


def ewa_cov2d(means3d: jnp.ndarray, p_view: jnp.ndarray, cov3d: jnp.ndarray,
              w2c: jnp.ndarray, focal_x, focal_y, tan_fovx, tan_fovy) -> jnp.ndarray:
    """EWA splatting 2D covariance (N,3) = (a, b, c) upper triangle.

    forward.cu:76-115 ``computeCov2D``: clamp the view-space point to
    1.3·tan_fov frustum, Jacobian J of the perspective projection, then
    cov2D = J W Σ Wᵀ Jᵀ + 0.3·I (dilation applied by caller or here —
    here, matching forward.cu:112-113).
    """
    tx, ty, tz = p_view[:, 0], p_view[:, 1], p_view[:, 2]
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    tx = jnp.clip(tx / tz, -limx, limx) * tz
    ty = jnp.clip(ty / tz, -limy, limy) * tz

    # M = W Σ Wᵀ (world covariance rotated into the view frame)
    W = w2c[:3, :3]
    Vrk = jnp.stack([
        jnp.stack([cov3d[:, 0], cov3d[:, 1], cov3d[:, 2]], -1),
        jnp.stack([cov3d[:, 1], cov3d[:, 3], cov3d[:, 4]], -1),
        jnp.stack([cov3d[:, 2], cov3d[:, 4], cov3d[:, 5]], -1),
    ], axis=-2)                                            # (N,3,3)
    M = jnp.einsum('ij,njk,lk->nil', W, Vrk, W)            # (N,3,3)

    # cov2d = J M Jᵀ with J = [[u,0,s],[0,v,t]] expanded directly
    # (u = fx/z, s = -fx·tx/z², v = fy/z, t = -fy·ty/z²)
    inv_z = 1.0 / tz
    u = focal_x * inv_z
    v = focal_y * inv_z
    s = -(focal_x * tx) * inv_z * inv_z
    t = -(focal_y * ty) * inv_z * inv_z
    m00, m01, m02 = M[:, 0, 0], M[:, 0, 1], M[:, 0, 2]
    m11, m12, m22 = M[:, 1, 1], M[:, 1, 2], M[:, 2, 2]
    a = u * u * m00 + 2.0 * u * s * m02 + s * s * m22 + COV2D_DILATION
    b = u * v * m01 + u * t * m02 + v * s * m12 + s * t * m22
    c = v * v * m11 + 2.0 * v * t * m12 + t * t * m22 + COV2D_DILATION
    return jnp.stack([a, b, c], axis=-1)


def tile_rect(mean2d: jnp.ndarray, radius: jnp.ndarray,
              width: int, height: int, tile_w: int, tile_h: int):
    """Per-gaussian tile rectangle, exactly as ``getRect`` (auxiliary.h:45-56).

    Returns int32 ``rect_min`` (N,2) inclusive / ``rect_max`` (N,2) exclusive
    in (x, y) tile coordinates; the C int-cast truncation is equivalent to
    floor-then-clip on the ranges that survive the clip.
    """
    grid_x = -(-width // tile_w)
    grid_y = -(-height // tile_h)
    r = radius.astype(mean2d.dtype)
    rmin_x = jnp.clip(jnp.floor((mean2d[:, 0] - r) / tile_w), 0, grid_x)
    rmin_y = jnp.clip(jnp.floor((mean2d[:, 1] - r) / tile_h), 0, grid_y)
    rmax_x = jnp.clip(jnp.floor((mean2d[:, 0] + r + tile_w - 1) / tile_w), 0, grid_x)
    rmax_y = jnp.clip(jnp.floor((mean2d[:, 1] + r + tile_h - 1) / tile_h), 0, grid_y)
    rect_min = jnp.stack([rmin_x, rmin_y], -1).astype(jnp.int32)
    rect_max = jnp.stack([rmax_x, rmax_y], -1).astype(jnp.int32)
    return rect_min, rect_max


def preprocess(means3d: jnp.ndarray, scales: jnp.ndarray, rots: jnp.ndarray,
               w2c: jnp.ndarray, full_proj: jnp.ndarray,
               width: int, height: int, tan_fovx, tan_fovy,
               scale_modifier: float = 1.0,
               cov3d_precomp: jnp.ndarray | None = None,
               tile_w: int = 16, tile_h: int = 16,
               active_mask: jnp.ndarray | None = None) -> Splats:
    """Full preprocess: N world gaussians → screen splats with cull mask.

    Differentiable in (means3d, scales, rots).  radius==0 marks gaussians
    that are near-culled, degenerate (det<=0) or whose tile rect is empty —
    these must be excluded by the rasterizer (the reference returns early,
    forward.cu:186-246, leaving radius 0).
    """
    focal_x = width / (2.0 * tan_fovx)
    focal_y = height / (2.0 * tan_fovy)

    p_view, p_ndc = project_points(means3d, w2c, full_proj)
    depth = p_view[:, 2]
    in_front = depth > NEAR_Z

    if cov3d_precomp is None:
        cov3d = build_cov3d(scales, rots, scale_modifier)
    else:
        cov3d = cov3d_precomp
    # Guard the EWA math against z≈0 for culled points (values are masked out).
    safe_view = jnp.where(in_front[:, None],
                          p_view, jnp.array([0.0, 0.0, 1.0], p_view.dtype))
    cov2d = ewa_cov2d(means3d, safe_view, cov3d, w2c,
                      focal_x, focal_y, tan_fovx, tan_fovy)

    a, b, c = cov2d[:, 0], cov2d[:, 1], cov2d[:, 2]
    det = a * c - b * b
    det_valid = det != 0.0
    inv_det = 1.0 / jnp.where(det_valid, det, 1.0)
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    mid = 0.5 * (a + c)
    # forward.cu:233-235: eigenvalue discriminant clamped at 0.1
    disc = jnp.sqrt(jnp.maximum(EIG_CLAMP, mid * mid - det))
    lam_max = mid + disc
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam_max, 0.0)))

    mean2d = jnp.stack([
        ((p_ndc[:, 0] + 1.0) * width - 1.0) * 0.5,
        ((p_ndc[:, 1] + 1.0) * height - 1.0) * 0.5,
    ], axis=-1)

    # Empty tile rect => invisible (forward.cu:237-246: getRect then
    # zero-area early-out).
    radius_i = radius_f.astype(jnp.int32)
    rect_min, rect_max = tile_rect(mean2d, radius_i, width, height,
                                   tile_w, tile_h)
    area = ((rect_max[:, 0] - rect_min[:, 0])
            * (rect_max[:, 1] - rect_min[:, 1]))
    visible = in_front & det_valid & (area > 0)
    if active_mask is not None:
        # caller-side cull (e.g. neural opacity <= 0 — such gaussians are
        # never rasterized, so don't emit instances for them)
        visible = visible & active_mask
    radius = jnp.where(visible, radius_i, 0)
    zero2 = jnp.zeros_like(rect_min)
    rect_min = jnp.where(visible[:, None], rect_min, zero2)
    rect_max = jnp.where(visible[:, None], rect_max, zero2)

    return Splats(mean2d=mean2d, conic=conic, depth=depth,
                  radius=radius, cov2d=cov2d,
                  rect_min=rect_min, rect_max=rect_max)


def visible_filter(means3d, scales, rots, camera, scale_modifier=1.0):
    """Anchor visibility prefilter: radius>0 mask.

    Replaces the reference ``visible_filter`` CUDA path
    (forward.cu:272-346 ``filter_preprocessCUDA``).
    """
    s = preprocess(means3d, scales, rots, camera.w2c, camera.full_proj,
                   camera.width, camera.height, camera.tan_fovx,
                   camera.tan_fovy, scale_modifier)
    return s.radius > 0


def position2d_filter(means3d, scales, rots, camera, scale_modifier=1.0):
    """(visible mask, x pixels, y pixels) per anchor.

    Replaces ``position2D_filter`` (forward.cu:353-433) used for fg/bg
    anchor labeling in the cross-attention stage (train.py:433-441).
    """
    s = preprocess(means3d, scales, rots, camera.w2c, camera.full_proj,
                   camera.width, camera.height, camera.tan_fovx,
                   camera.tan_fovy, scale_modifier)
    return s.radius > 0, s.mean2d[:, 0], s.mean2d[:, 1]
