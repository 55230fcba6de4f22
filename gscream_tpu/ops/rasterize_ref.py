"""Reference (oracle) rasterizer in pure JAX — slow but exact.

Two implementations of the reference's front-to-back alpha compositing
(``cuda_rasterizer/forward.cu:441-568`` ``renderCUDA``):

* :func:`rasterize_sequential` — a literal ``lax.scan`` over depth-sorted
  gaussians carrying per-pixel transmittance, matching the CUDA loop
  term-for-term (including the ``done`` early-stop).  O(N) scan steps;
  use only on tiny problems.
* :func:`rasterize_scan` — the TPU-native reformulation: the sequential
  blend is rewritten as a *prefix product of (1-α) in log space* plus a
  weighted reduction.  This is mathematically identical (see derivation in
  the docstring) and is the formulation the Pallas tile kernel uses.

Both render color (3), depth and uncertainty channels and return the final
transmittance, as the reference does (forward.cu:545-566).

Derivation of the scan form
---------------------------
Reference semantics per pixel, over gaussians i in per-tile depth order:

    T ← 1; done ← false
    for i:  if done: skip
            α = min(0.99, op·exp(power));  if power>0 or α<1/255: skip
            if T·(1-α) < 1e-4: done ← true; skip
            C += c_i·α·T ; D += d_i·α·T ; U += u_i·α·T ; T ← T·(1-α)

Let α'_i = α_i if the (power, 1/255) tests pass else 0, and
P_i = Π_{j≤i}(1-α'_j) (inclusive prefix product).  Because P is
non-increasing, the first i with P_i < 1e-4 is exactly where the reference
sets ``done``; every contribution before it used T = P_{i-1} (the exclusive
prefix).  Hence

    applied_i = (P_i ≥ 1e-4) ∧ (α'_i > 0)
    w_i       = applied_i · α_i · P^exc_i
    C = Σ w_i c_i,   T_final = min_i( P_i if P_i ≥ 1e-4 else 1 )

which needs only a cumulative sum of log(1-α') and two reductions — both
embarrassingly vectorizable on the VPU/MXU, with no sequential dependency.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import ALPHA_MIN, T_STOP, Splats, clamp_alpha


class RenderOut(NamedTuple):
    color: jnp.ndarray        # (H,W,3)
    depth: jnp.ndarray        # (H,W)
    uncertainty: jnp.ndarray  # (H,W)
    final_t: jnp.ndarray      # (H,W) final transmittance
    n_contrib: jnp.ndarray | None = None  # (H,W) int32, sequential impl only


def _pixel_grid(width: int, height: int, dtype=jnp.float32):
    px = jnp.arange(width, dtype=dtype)
    py = jnp.arange(height, dtype=dtype)
    return jnp.meshgrid(px, py, indexing='xy')  # each (H,W)


def _depth_order(splats: Splats):
    """Global depth sort with culled gaussians pushed to the end.

    The reference sorts (tile, depth) pairs with a stable radix sort over
    float depth bits (rasterizer_impl.cu:306-314); for non-negative depths
    that equals a stable ascending value sort.  Culled gaussians never emit
    instances, so they are given +inf keys here.
    """
    key = jnp.where(splats.radius > 0, splats.depth, jnp.inf)
    return jnp.argsort(key, stable=True)


def _alpha_terms(splats: Splats, opacities, px, py, tile_w, tile_h):
    """Per (pixel, gaussian) α and validity, given flattened pixel coords.

    px, py: (P,) pixel coordinates.  Returns α (P,N) and valid (P,N) after
    the power / 1/255 / tile-rect tests.  α is already clamped to 0.99.
    """
    mean = splats.mean2d          # (N,2)
    con = splats.conic            # (N,3)
    dx = mean[None, :, 0] - px[:, None]      # (P,N)
    dy = mean[None, :, 1] - py[:, None]
    power = (-0.5 * (con[None, :, 0] * dx * dx + con[None, :, 2] * dy * dy)
             - con[None, :, 1] * dx * dy)
    alpha = clamp_alpha(opacities[None, :] * jnp.exp(power))
    tx = (px // tile_w).astype(jnp.int32)[:, None]
    ty = (py // tile_h).astype(jnp.int32)[:, None]
    in_rect = ((splats.rect_min[None, :, 0] <= tx) & (tx < splats.rect_max[None, :, 0])
               & (splats.rect_min[None, :, 1] <= ty) & (ty < splats.rect_max[None, :, 1]))
    valid = ((splats.radius[None, :] > 0) & in_rect
             & (power <= 0.0) & (alpha >= ALPHA_MIN))
    return alpha, valid


@partial(jax.jit, static_argnames=("width", "height", "tile_w", "tile_h"))
def rasterize_sequential(splats: Splats, colors, opacities, uncertainties,
                         bg, width: int, height: int,
                         tile_w: int = 16, tile_h: int = 16) -> RenderOut:
    """Literal translation of the CUDA blend loop via lax.scan (oracle only).

    Carries (T, done, C, D, U, n_contrib) per pixel through a scan over
    depth-sorted gaussians.  Exactly reproduces renderCUDA including the
    ``done`` freeze, for validation of :func:`rasterize_scan`.
    """
    order = _depth_order(splats)
    s = Splats(*((x[order] if x is not None else None) for x in splats))
    colors = colors[order]
    opacities = opacities[order]
    uncertainties = uncertainties[order]

    xs, ys = _pixel_grid(width, height)
    px, py = xs.reshape(-1), ys.reshape(-1)          # (P,)
    P = px.shape[0]
    tx = (px // tile_w).astype(jnp.int32)
    ty = (py // tile_h).astype(jnp.int32)

    def step(carry, inp):
        T, done, C, D, U, n, idx = carry
        mean, con, dep, rad, rmin, rmax, col, op, unc = inp
        dx = mean[0] - px
        dy = mean[1] - py
        power = (-0.5 * (con[0] * dx * dx + con[2] * dy * dy)
                 - con[1] * dx * dy)
        alpha = clamp_alpha(op * jnp.exp(power))
        in_rect = ((rmin[0] <= tx) & (tx < rmax[0])
                   & (rmin[1] <= ty) & (ty < rmax[1]))
        seen = (rad > 0) & in_rect                 # in this pixel's list
        ok = seen & (power <= 0.0) & (alpha >= ALPHA_MIN) & ~done
        test_t = T * (1.0 - alpha)
        stop = ok & (test_t < T_STOP)
        apply = ok & ~stop
        w = jnp.where(apply, alpha * T, 0.0)
        C = C + w[:, None] * col[None, :]
        D = D + w * dep
        U = U + w * unc
        T = jnp.where(apply, test_t, T)
        done = done | stop
        # n_contrib counts the last applied position in the pixel's list
        idx = idx + seen.astype(jnp.int32)
        n = jnp.where(apply, idx, n)
        return (T, done, C, D, U, n, idx), None

    init = (jnp.ones(P), jnp.zeros(P, bool), jnp.zeros((P, 3)),
            jnp.zeros(P), jnp.zeros(P), jnp.zeros(P, jnp.int32),
            jnp.zeros(P, jnp.int32))
    inputs = (s.mean2d, s.conic, s.depth, s.radius, s.rect_min, s.rect_max,
              colors, opacities, uncertainties)
    (T, done, C, D, U, n, _), _ = jax.lax.scan(step, init, inputs)
    C = C + T[:, None] * bg[None, :]
    return RenderOut(color=C.reshape(height, width, 3),
                     depth=D.reshape(height, width),
                     uncertainty=U.reshape(height, width),
                     final_t=T.reshape(height, width),
                     n_contrib=n.reshape(height, width))


def _blend_block(splats: Splats, colors, opacities, uncertainties, bg,
                 px, py, tile_w, tile_h):
    """Scan-form blend for a block of pixels: returns (C (P,3), D, U, T)."""
    alpha, valid = _alpha_terms(splats, opacities, px, py, tile_w, tile_h)
    alpha_v = jnp.where(valid, alpha, 0.0)
    logs = jnp.log1p(-alpha_v)
    cum = jnp.cumsum(logs, axis=1)
    p_inc = jnp.exp(cum)                       # inclusive prefix Π(1-α')
    p_exc = jnp.exp(cum - logs)                # exclusive prefix
    applied = valid & (p_inc >= T_STOP)
    w = jnp.where(applied, alpha * p_exc, 0.0)   # (P,N)
    C = w @ colors                                # (P,3)
    D = w @ splats.depth
    U = w @ uncertainties
    T = jnp.min(jnp.where(p_inc >= T_STOP, p_inc, 1.0), axis=1)
    C = C + T[:, None] * bg[None, :]
    return C, D, U, T


@partial(jax.jit, static_argnames=("width", "height", "tile_w", "tile_h",
                                   "block"))
def rasterize_scan(splats: Splats, colors, opacities, uncertainties, bg,
                   width: int, height: int,
                   tile_w: int = 16, tile_h: int = 16,
                   block: int = 4096) -> RenderOut:
    """Prefix-scan rasterizer over all gaussians, blocked over pixels.

    The correctness oracle for the Pallas tile kernel: differentiable end to
    end (jax.grad supplies exactly the reference's ``backward.cu`` pixel
    gradients, with the non-differentiable applied-set decisions frozen just
    as the reference freezes its saved contributor counts).
    """
    order = _depth_order(splats)
    s = Splats(*((x[order] if x is not None else None) for x in splats))
    colors = colors[order]
    opacities = opacities[order]
    uncertainties = uncertainties[order]

    xs, ys = _pixel_grid(width, height)
    px, py = xs.reshape(-1), ys.reshape(-1)
    P = px.shape[0]
    pad = (-P) % block
    px = jnp.pad(px, (0, pad))
    py = jnp.pad(py, (0, pad))
    nblocks = px.shape[0] // block

    def body(_, blk):
        bx, by = blk
        return None, _blend_block(s, colors, opacities, uncertainties, bg,
                                  bx, by, tile_w, tile_h)

    _, (C, D, U, T) = jax.lax.scan(
        body, None, (px.reshape(nblocks, block), py.reshape(nblocks, block)))
    C = C.reshape(-1, 3)[:P].reshape(height, width, 3)
    D = D.reshape(-1)[:P].reshape(height, width)
    U = U.reshape(-1)[:P].reshape(height, width)
    T = T.reshape(-1)[:P].reshape(height, width)
    return RenderOut(color=C, depth=D, uncertainty=U, final_t=T)
