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

import os
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
    t_iso: jnp.ndarray | None = None
    # (N,) iso-threshold t = ln(255·op)+guard of the α ≥ 1/255 level set
    # (>0 exactly where tight emission applies; 0 ⇒ the gaussian emits
    # nothing).  None ⇒ tight culling off: emission uses the full rect.


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
               active_mask: jnp.ndarray | None = None,
               opacity: jnp.ndarray | None = None) -> Splats:
    """Full preprocess: N world gaussians → screen splats with cull mask.

    Differentiable in (means3d, scales, rots).  radius==0 marks gaussians
    that are near-culled, degenerate (det<=0) or whose tile rect is empty —
    these must be excluded by the rasterizer (the reference returns early,
    forward.cu:186-246, leaving radius 0).

    Internals run on **column** (N,) arrays with the 3×3 algebra unrolled
    to scalar-broadcast FMAs: stacked (N,3)/(N,3,3) intermediates put the
    tiny trailing axis on the TPU's 128-lane dimension (~3/128 lane
    occupancy), so the column form is the fast layout.  Semantics are
    bit-identical to the reference math documented above.

    ``opacity`` (N,) enables **tight rect culling**: the emission rect
    becomes the intersection of the reference's 3σ square with the
    per-axis bounding box of the ``α ≥ 1/255`` iso-ellipse.  The blend
    kernels skip every pixel with ``α < 1/255`` (forward.cu:536,
    rasterize_tiled/rasterize_ref share the test), so instances dropped
    this way contribute nothing in the reference either — rendered
    output and gradients are unchanged while the instance count (and
    with it every capacity-scale sort/kernel cost) drops by the
    opacity- and anisotropy-dependent area ratio.  ``radius`` itself is
    NOT tightened: it stays the reference's 3σ value so the
    densification visibility statistics and anchor prefilters match the
    reference trajectory exactly.  Escape hatch: GSCREAM_TIGHT_CULL=0.
    """
    focal_x = width / (2.0 * tan_fovx)
    focal_y = height / (2.0 * tan_fovy)

    px, py, pz = means3d[:, 0], means3d[:, 1], means3d[:, 2]

    def xform(m, x, y, z):
        """Row ``m · [x,y,z,1]`` as broadcast FMAs — w2c/full_proj are
        small (4,4) device arrays whose scalar entries XLA folds into the
        fused elementwise loop as broadcasts."""
        return m[0] * x + m[1] * y + m[2] * z + m[3]

    tview_x = xform(w2c[0], px, py, pz)
    tview_y = xform(w2c[1], px, py, pz)
    depth = xform(w2c[2], px, py, pz)
    in_front = depth > NEAR_Z

    p_clip_x = xform(full_proj[0], px, py, pz)
    p_clip_y = xform(full_proj[1], px, py, pz)
    p_clip_w = xform(full_proj[3], px, py, pz)
    p_w = 1.0 / (p_clip_w + 1e-7)
    ndc_x = p_clip_x * p_w
    ndc_y = p_clip_y * p_w

    if cov3d_precomp is None:
        # cov3D = R S² Rᵀ, unrolled (computeCov3D, forward.cu:120-154)
        qr, qx, qy, qz = rots[:, 0], rots[:, 1], rots[:, 2], rots[:, 3]
        r00 = 1 - 2 * (qy * qy + qz * qz)
        r01 = 2 * (qx * qy - qr * qz)
        r02 = 2 * (qx * qz + qr * qy)
        r10 = 2 * (qx * qy + qr * qz)
        r11 = 1 - 2 * (qx * qx + qz * qz)
        r12 = 2 * (qy * qz - qr * qx)
        r20 = 2 * (qx * qz - qr * qy)
        r21 = 2 * (qy * qz + qr * qx)
        r22 = 1 - 2 * (qx * qx + qy * qy)
        s0 = scale_modifier * scales[:, 0]
        s1 = scale_modifier * scales[:, 1]
        s2 = scale_modifier * scales[:, 2]
        s0, s1, s2 = s0 * s0, s1 * s1, s2 * s2
        c00 = r00 * r00 * s0 + r01 * r01 * s1 + r02 * r02 * s2
        c01 = r00 * r10 * s0 + r01 * r11 * s1 + r02 * r12 * s2
        c02 = r00 * r20 * s0 + r01 * r21 * s1 + r02 * r22 * s2
        c11 = r10 * r10 * s0 + r11 * r11 * s1 + r12 * r12 * s2
        c12 = r10 * r20 * s0 + r11 * r21 * s1 + r12 * r22 * s2
        c22 = r20 * r20 * s0 + r21 * r21 * s1 + r22 * r22 * s2
    else:
        c00, c01, c02 = (cov3d_precomp[:, 0], cov3d_precomp[:, 1],
                         cov3d_precomp[:, 2])
        c11, c12, c22 = (cov3d_precomp[:, 3], cov3d_precomp[:, 4],
                         cov3d_precomp[:, 5])

    # EWA cov2D (computeCov2D, forward.cu:76-115), columns throughout.
    # Guard z≈0 for culled points (values are masked out downstream).
    tz = jnp.where(in_front, depth, 1.0)
    tx = jnp.where(in_front, tview_x, 0.0)
    ty = jnp.where(in_front, tview_y, 0.0)
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    tx = jnp.clip(tx / tz, -limx, limx) * tz
    ty = jnp.clip(ty / tz, -limy, limy) * tz

    # M = W Σ Wᵀ with static W = w2c[:3,:3] scalars
    W = w2c[:3, :3]
    cv = ((c00, c01, c02), (c01, c11, c12), (c02, c12, c22))
    # Yi_k = Σ_j W[i,j]·cv[j][k]  (3×3 each a fused FMA chain)
    Y = [[sum(W[i, j] * cv[j][k] for j in range(3)) for k in range(3)]
         for i in range(3)]
    # M[i,l] = Σ_k Y[i][k]·W[l,k] — only the entries the Jacobian needs
    def Ment(i, l):
        return sum(Y[i][k] * W[l, k] for k in range(3))
    m00, m01, m02 = Ment(0, 0), Ment(0, 1), Ment(0, 2)
    m11, m12, m22 = Ment(1, 1), Ment(1, 2), Ment(2, 2)

    inv_z = 1.0 / tz
    u = focal_x * inv_z
    v = focal_y * inv_z
    s = -(focal_x * tx) * inv_z * inv_z
    t = -(focal_y * ty) * inv_z * inv_z
    a = u * u * m00 + 2.0 * u * s * m02 + s * s * m22 + COV2D_DILATION
    b = u * v * m01 + u * t * m02 + v * s * m12 + s * t * m22
    c = v * v * m11 + 2.0 * v * t * m12 + t * t * m22 + COV2D_DILATION
    det = a * c - b * b
    det_valid = det != 0.0
    inv_det = 1.0 / jnp.where(det_valid, det, 1.0)

    mid = 0.5 * (a + c)
    # forward.cu:233-235: eigenvalue discriminant clamped at 0.1
    disc = jnp.sqrt(jnp.maximum(EIG_CLAMP, mid * mid - det))
    lam_max = mid + disc
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam_max, 0.0)))

    mean_x = ((ndc_x + 1.0) * width - 1.0) * 0.5
    mean_y = ((ndc_y + 1.0) * height - 1.0) * 0.5

    # Empty tile rect => invisible (forward.cu:237-246: getRect then
    # zero-area early-out); getRect math in columns (auxiliary.h:45-56)
    grid_x = -(-width // tile_w)
    grid_y = -(-height // tile_h)
    radius_i = radius_f.astype(jnp.int32)
    r = radius_f
    # visibility (and the returned radius) use the REFERENCE's 3σ square —
    # getRect (auxiliary.h:45-56) then zero-area early-out
    ref_rmin_x = jnp.clip(jnp.floor((mean_x - r) / tile_w), 0, grid_x)
    ref_rmin_y = jnp.clip(jnp.floor((mean_y - r) / tile_h), 0, grid_y)
    ref_rmax_x = jnp.clip(jnp.floor((mean_x + r + tile_w - 1) / tile_w),
                          0, grid_x)
    ref_rmax_y = jnp.clip(jnp.floor((mean_y + r + tile_h - 1) / tile_h),
                          0, grid_y)
    area = (ref_rmax_x - ref_rmin_x) * (ref_rmax_y - ref_rmin_y)
    visible = in_front & det_valid & (area > 0)
    if active_mask is not None:
        # caller-side cull (e.g. neural opacity <= 0 — such gaussians are
        # never rasterized, so don't emit instances for them)
        visible = visible & active_mask
    radius = jnp.where(visible, radius_i, 0)

    if opacity is not None and not os.environ.get("GSCREAM_TIGHT_CULL") \
            == "0":
        # tight rect: α(d) = op·exp(-½ dᵀΣ⁻¹d) ≥ 1/255  ⇔  dᵀΣ⁻¹d ≤ 2t,
        # t = ln(255·op).  The level set's bounding box half-widths are
        # √(2t·Σxx), √(2t·Σyy) (Σ = dilated cov2d, whose inverse is the
        # conic the kernels evaluate).  +2% on t absorbs f32 α rounding
        # at the boundary; op ≤ 1/255 means every pixel fails the test —
        # rect empties, the gaussian emits nothing (its radius stays >0
        # for the reference-exact visibility stats above).
        t_op = jnp.log(255.0 * jnp.maximum(
            jax.lax.stop_gradient(opacity), 1e-12)) + 0.02
        t_pos = jnp.maximum(t_op, 0.0)
        hx = jnp.minimum(jnp.sqrt(2.0 * t_pos * jnp.maximum(a, 0.0)), r)
        hy = jnp.minimum(jnp.sqrt(2.0 * t_pos * jnp.maximum(c, 0.0)), r)
        emit = visible & (t_op > 0.0)
        # exact tile covering of the CONTINUOUS interval [m-h, m+h]
        # (floor(x)+1, not the reference's (x + tw-1)//tw int-ceil idiom —
        # that idiom under-covers fractional extents, which is harmless at
        # the ref's 3σ edge where α≈0 but not at the tight box edge where
        # α = 1/255 exactly), then intersected with the reference rect so
        # the emitted set is a strict subset of the reference's
        rmin_x = jnp.maximum(jnp.floor((mean_x - hx) / tile_w), ref_rmin_x)
        rmin_y = jnp.maximum(jnp.floor((mean_y - hy) / tile_h), ref_rmin_y)
        rmax_x = jnp.minimum(jnp.floor((mean_x + hx) / tile_w) + 1.0,
                             ref_rmax_x)
        rmax_y = jnp.minimum(jnp.floor((mean_y + hy) / tile_h) + 1.0,
                             ref_rmax_y)
        rmax_x = jnp.maximum(rmax_x, rmin_x)   # keep rects non-negative
        rmax_y = jnp.maximum(rmax_y, rmin_y)
        vzi = emit.astype(jnp.int32)
        t_iso = jnp.where(emit, t_pos, 0.0)
    else:
        rmin_x, rmin_y = ref_rmin_x, ref_rmin_y
        rmax_x, rmax_y = ref_rmax_x, ref_rmax_y
        vzi = visible.astype(jnp.int32)
        t_iso = None

    return Splats(
        mean2d=jnp.stack([mean_x, mean_y], axis=-1),
        conic=jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1),
        depth=depth, radius=radius,
        cov2d=jnp.stack([a, b, c], axis=-1),
        rect_min=jnp.stack([rmin_x.astype(jnp.int32) * vzi,
                            rmin_y.astype(jnp.int32) * vzi], axis=-1),
        rect_max=jnp.stack([rmax_x.astype(jnp.int32) * vzi,
                            rmax_y.astype(jnp.int32) * vzi], axis=-1),
        t_iso=t_iso)


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
