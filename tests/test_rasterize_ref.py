"""Oracle rasterizer tests: scan form == sequential form == analytic cases."""
import numpy as np
import jax
import jax.numpy as jnp

from gscream_tpu.ops import projection as proj
from gscream_tpu.ops.rasterize_ref import rasterize_scan, rasterize_sequential
from tests.utils import random_camera, random_gaussians


def _prep(cam, means, scales, quats, tile=16):
    return proj.preprocess(means, scales, quats, cam.w2c, cam.full_proj,
                           cam.width, cam.height, cam.tan_fovx, cam.tan_fovy,
                           tile_w=tile, tile_h=tile)


def test_scan_equals_sequential(rng):
    cam = random_camera(width=48, height=32)
    means, scales, quats, colors, opac, unc = random_gaussians(rng, n=300)
    s = _prep(cam, means, scales, quats)
    bg = jnp.array([1.0, 1.0, 1.0])
    a = rasterize_sequential(s, colors, opac, unc, bg, cam.width, cam.height)
    b = rasterize_scan(s, colors, opac, unc, bg, cam.width, cam.height)
    np.testing.assert_allclose(np.asarray(a.color), np.asarray(b.color),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(a.depth), np.asarray(b.depth),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(a.uncertainty),
                               np.asarray(b.uncertainty), atol=2e-5)
    np.testing.assert_allclose(np.asarray(a.final_t), np.asarray(b.final_t),
                               atol=2e-5)


def test_scan_equals_sequential_saturating(rng):
    """Dense opaque stack exercises the T<1e-4 early stop path."""
    cam = random_camera(width=32, height=32)
    means, scales, quats, colors, opac, unc = random_gaussians(
        rng, n=400, xy_extent=0.5, scale_range=(0.1, 0.6))
    opac = jnp.full_like(opac, 0.97)
    s = _prep(cam, means, scales, quats)
    bg = jnp.zeros(3)
    a = rasterize_sequential(s, colors, opac, unc, bg, cam.width, cam.height)
    b = rasterize_scan(s, colors, opac, unc, bg, cam.width, cam.height)
    assert float(jnp.min(a.final_t)) < 1e-3  # early stop actually hit
    np.testing.assert_allclose(np.asarray(a.color), np.asarray(b.color),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(a.final_t), np.asarray(b.final_t),
                               atol=5e-6)


def test_single_gaussian_analytic():
    """One isotropic gaussian at the image center: closed-form alpha."""
    cam = random_camera(width=64, height=64)
    means = jnp.array([[0.0, 0.0, 2.0]], jnp.float32)
    scales = jnp.full((1, 3), 0.1, jnp.float32)
    quats = jnp.array([[1.0, 0, 0, 0]], jnp.float32)
    colors = jnp.array([[1.0, 0.5, 0.25]])
    opac = jnp.array([0.8])
    unc = jnp.array([0.6])
    s = _prep(cam, means, scales, quats)
    bg = jnp.zeros(3)
    out = rasterize_scan(s, colors, opac, unc, bg, cam.width, cam.height)

    # center pixel: alpha = min(.99, op*exp(-0.5 d^T conic d))
    mx, my = float(s.mean2d[0, 0]), float(s.mean2d[0, 1])
    pxi, pyi = int(round(mx)), int(round(my))
    dx, dy = mx - pxi, my - pyi
    a, b, c = (float(s.conic[0, i]) for i in range(3))
    alpha = min(0.99, 0.8 * np.exp(-0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy))
    expect = alpha * np.array([1.0, 0.5, 0.25])
    np.testing.assert_allclose(np.asarray(out.color[pyi, pxi]), expect,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(out.depth[pyi, pxi]), alpha * 2.0,
                               rtol=1e-5)
    np.testing.assert_allclose(float(out.uncertainty[pyi, pxi]), alpha * 0.6,
                               rtol=1e-5)
    np.testing.assert_allclose(float(out.final_t[pyi, pxi]), 1 - alpha,
                               rtol=1e-5)


def test_two_gaussians_composite_order():
    """Front-to-back order: near gaussian composites over far one."""
    cam = random_camera(width=32, height=32)
    means = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 3.0]], jnp.float32)
    scales = jnp.full((2, 3), 0.2, jnp.float32)
    quats = jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (2, 1))
    colors = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    opac = jnp.array([0.5, 0.5])
    unc = jnp.zeros(2)
    s = _prep(cam, means, scales, quats)
    out = rasterize_scan(s, colors, opac, unc, jnp.zeros(3),
                         cam.width, cam.height)
    cpix = np.asarray(out.color[16, 16])
    # red (near) contributes with T=1, green (far) with T=(1-alpha_near)
    assert cpix[0] > cpix[1] > 0


def test_background_through_empty_pixels(rng):
    cam = random_camera(width=32, height=32)
    means = jnp.array([[0.0, 0.0, -5.0]], jnp.float32)  # behind camera
    scales = jnp.full((1, 3), 0.1, jnp.float32)
    quats = jnp.array([[1.0, 0, 0, 0]], jnp.float32)
    s = _prep(cam, means, scales, quats)
    bg = jnp.array([0.2, 0.4, 0.6])
    out = rasterize_scan(s, jnp.ones((1, 3)), jnp.ones(1), jnp.ones(1), bg,
                         cam.width, cam.height)
    np.testing.assert_allclose(np.asarray(out.color),
                               np.broadcast_to(bg, (32, 32, 3)), atol=1e-7)
    np.testing.assert_allclose(np.asarray(out.final_t), 1.0, atol=1e-7)


def test_gradients_finite_and_match_sequential(rng):
    """d(loss)/d(splat attrs) identical between the two formulations."""
    cam = random_camera(width=24, height=16)
    means, scales, quats, colors, opac, unc = random_gaussians(rng, n=60)
    bg = jnp.array([0.5, 0.5, 0.5])
    target = jnp.zeros((16, 24, 3))

    def loss_with(raster):
        def f(means, scales, quats, colors, opac, unc):
            s = _prep(cam, means, scales, quats)
            out = raster(s, colors, opac, unc, bg, cam.width, cam.height)
            return (jnp.mean(jnp.abs(out.color - target))
                    + 0.1 * jnp.mean(out.depth)
                    + 0.05 * jnp.mean(out.uncertainty))
        return f

    args = (means, scales, quats, colors, opac, unc)
    g_seq = jax.grad(loss_with(rasterize_sequential), argnums=(0, 3, 4))(*args)
    g_scan = jax.grad(loss_with(rasterize_scan), argnums=(0, 3, 4))(*args)
    for gs, gc in zip(g_seq, g_scan):
        assert np.all(np.isfinite(np.asarray(gc)))
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gc),
                                   rtol=1e-3, atol=1e-5)
