"""Freeze a golden render+gradient bundle for the kernel CI gate.

VERDICT r1 item 9: kernel optimization must not silently drift numerics.
This tool renders a fixed random scene with the *f64* oracle
(``rasterize_scan`` under ``jax_enable_x64``) and stores inputs, outputs,
input-gradients and *fragility masks* in ``tests/golden/golden_small.npz``;
``tests/test_golden.py`` then asserts the fp32 Pallas kernel path stays
within fixed max-error bounds of that bundle forever.

Fragility masks: the tiled kernel evaluates the gaussian exponent from
tile-local polynomial coefficients while the oracle uses global pixel
coordinates — both fp32-accurate to ~1e-5, but an (instance, pixel) pair
sitting within a few ulps of a discrete test (``power<=0``,
``alpha>=1/255``, the 0.99 clamp, the ``T<1e-4`` stop —
forward.cu:438-461 semantics) can flip validity between any two fp32
evaluation orders, changing that pixel (and the transmittance chain behind
it) by O(alpha).  In a 220-gaussian scene some pair is *always* near the
1/255 ring, so instead of hunting a margin-clean seed the generator marks,
in f64:

* ``fragile_pix``   — pixels where any contributing pair is within margin
  of a threshold: only a loose bound applies there;
* ``fragile_gauss`` — gaussians contributing to any fragile pixel (a flip
  there perturbs their gradient): likewise loose-bounded.

Everything else must match to tight fp32-accumulation tolerances, which is
what catches real kernel regressions.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from gscream_tpu.ops.projection import ALPHA_MIN, T_STOP  # noqa: E402

WIDTH, HEIGHT = 96, 64
N = 220
SEED = 3
# f64 distance from a discrete threshold below which a pair is "fragile"
# (fp32 evaluation error between the two paths is ~1e-5 relative):
MARGIN_POWER = 1e-5      # |power|, absolute (power scale is ~1)
MARGIN_ALPHA = 5e-4      # |alpha - 1/255| / (1/255)
MARGIN_CLAMP = 1e-4      # |op*g - 0.99|
MARGIN_TSTOP = 1e-3      # |T_after - 1e-4| / 1e-4


def build_scene(seed):
    from tests.utils import random_camera, random_gaussians
    from gscream_tpu.ops import projection as proj
    from gscream_tpu.ops.rasterize_tiled import TILE_H, TILE_W

    rng = np.random.default_rng(seed)
    cam = random_camera(width=WIDTH, height=HEIGHT)
    means, scales, quats, colors, opac, unc = random_gaussians(rng, n=N)
    f64 = lambda a: jnp.asarray(np.asarray(a, np.float64))  # noqa: E731
    splats = proj.preprocess(
        f64(means), f64(scales), f64(quats), f64(np.asarray(cam.w2c)),
        f64(np.asarray(cam.full_proj)), WIDTH, HEIGHT,
        float(cam.tan_fovx), float(cam.tan_fovy),
        tile_w=TILE_W, tile_h=TILE_H)
    return cam, splats, f64(colors), f64(opac), f64(unc), (means, scales,
                                                           quats)


def fragility(splats, opac):
    """f64 fragile-pixel and fragile-gaussian masks (see module doc)."""
    mean2d = np.asarray(splats.mean2d)
    conic = np.asarray(splats.conic)
    radius = np.asarray(splats.radius)
    depth = np.asarray(splats.depth)
    op = np.asarray(opac)
    alive = radius > 0

    px, py = np.meshgrid(np.arange(WIDTH, dtype=np.float64),
                         np.arange(HEIGHT, dtype=np.float64), indexing="xy")
    dx = mean2d[:, 0:1] - px.ravel()[None, :]
    dy = mean2d[:, 1:2] - py.ravel()[None, :]
    power = -0.5 * (conic[:, 0:1] * dx * dx + conic[:, 2:3] * dy * dy) \
        - conic[:, 1:2] * dx * dy                       # (N, P)
    g = np.exp(np.minimum(power, 0.0))
    raw_alpha = op[:, None] * g
    alpha = np.minimum(raw_alpha, 0.99)
    valid = alive[:, None] & (power <= 0.0) & (alpha >= ALPHA_MIN)

    near = alive[:, None] & (
        (np.abs(power) < MARGIN_POWER)
        | (np.abs(alpha - ALPHA_MIN) < MARGIN_ALPHA * ALPHA_MIN)
        | (np.abs(raw_alpha - 0.99) < MARGIN_CLAMP))

    # transmittance in per-pixel blend (depth) order
    order = np.argsort(depth, kind="stable")
    av = np.where(valid, alpha, 0.0)[order]
    p_inc = np.exp(np.cumsum(np.log1p(-av), axis=0))
    near_t = np.abs(p_inc - T_STOP) < MARGIN_TSTOP * T_STOP
    near = near | near_t[np.argsort(order, kind="stable")]

    fragile_pix = near.any(axis=0)                      # (P,)
    # a flip at pixel p perturbs every gaussian contributing at p
    fragile_gauss = (valid & fragile_pix[None, :]).any(axis=1)
    return (fragile_pix.reshape(HEIGHT, WIDTH), fragile_gauss,
            int(fragile_pix.sum()), int(fragile_gauss.sum()))


def main():
    from gscream_tpu.ops.rasterize_ref import rasterize_scan
    from gscream_tpu.ops.rasterize_tiled import TILE_H, TILE_W

    cam, splats, colors, opac, unc, raw = build_scene(SEED)
    fpix, fgauss, npix, ngauss = fragility(splats, opac)
    print(f"seed {SEED}: fragile pixels {npix}/{WIDTH * HEIGHT}, "
          f"fragile gaussians {ngauss}/{N}")

    bg = jnp.asarray(np.array([0.35, 0.55, 0.25], np.float64))

    def cot(c):
        y, x = jnp.meshgrid(jnp.arange(HEIGHT, dtype=jnp.float64),
                            jnp.arange(WIDTH, dtype=jnp.float64),
                            indexing="ij")
        base = jnp.sin(0.11 * x + 0.07 * y + 1.3 * c) * 0.5
        if c == 3:
            return jnp.stack([base, base * 0.7 + 0.1, base * -0.4], axis=-1)
        return base

    def loss(mean2d, conic, opac, colors, depth, unc):
        s = splats._replace(mean2d=mean2d, conic=conic, depth=depth)
        out = rasterize_scan(s, colors, opac, unc, bg, WIDTH, HEIGHT,
                             tile_w=TILE_W, tile_h=TILE_H)
        return (jnp.sum(out.color * cot(3))
                + jnp.sum(out.depth * cot(0))
                + jnp.sum(out.uncertainty * cot(1))
                + jnp.sum(out.final_t * cot(2)))

    out = rasterize_scan(splats, colors, opac, unc, bg, WIDTH, HEIGHT,
                         tile_w=TILE_W, tile_h=TILE_H)
    args = (splats.mean2d, splats.conic, opac, colors, splats.depth, unc)
    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(*args)

    means, scales, quats = raw
    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden")
    os.makedirs(dst, exist_ok=True)
    np.savez_compressed(
        os.path.join(dst, "golden_small.npz"),
        seed=SEED, width=WIDTH, height=HEIGHT,
        means=means, scales=scales, quats=quats,
        colors=np.asarray(colors), opac=np.asarray(opac),
        unc=np.asarray(unc), bg=np.asarray(bg),
        w2c=np.asarray(cam.w2c), full_proj=np.asarray(cam.full_proj),
        tan_fovx=float(cam.tan_fovx), tan_fovy=float(cam.tan_fovy),
        mean2d=np.asarray(splats.mean2d), conic=np.asarray(splats.conic),
        depth=np.asarray(splats.depth),
        fragile_pix=fpix, fragile_gauss=fgauss,
        out_color=np.asarray(out.color), out_depth=np.asarray(out.depth),
        out_unc=np.asarray(out.uncertainty),
        out_final_t=np.asarray(out.final_t),
        g_mean2d=np.asarray(grads[0]), g_conic=np.asarray(grads[1]),
        g_opac=np.asarray(grads[2]), g_colors=np.asarray(grads[3]),
        g_depth=np.asarray(grads[4]), g_unc=np.asarray(grads[5]))
    print("wrote tests/golden/golden_small.npz")


if __name__ == "__main__":
    main()
