"""Projection / preprocess unit tests.

Cross-checks the pure-JAX EWA preprocess against an independent numpy
re-derivation of the reference math (forward.cu:76-267), plus invariants.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gscream_tpu.ops import projection as proj
from tests.utils import random_camera, random_gaussians


def numpy_reference_preprocess(means, scales, quats, cam):
    """Straight numpy transcription of the reference preprocess math."""
    w2c = np.asarray(cam.w2c, np.float64)
    full = np.asarray(cam.full_proj, np.float64)
    W, H = cam.width, cam.height
    tanx, tany = float(cam.tan_fovx), float(cam.tan_fovy)
    fx, fy = W / (2 * tanx), H / (2 * tany)
    out = []
    for p, s, q in zip(np.asarray(means, np.float64),
                       np.asarray(scales, np.float64),
                       np.asarray(quats, np.float64)):
        ph = np.append(p, 1.0)
        pv = (w2c @ ph)[:3]
        pc = full @ ph
        pn = pc[:3] / (pc[3] + 1e-7)
        r_, x_, y_, z_ = q
        R = np.array([
            [1 - 2 * (y_ * y_ + z_ * z_), 2 * (x_ * y_ - r_ * z_), 2 * (x_ * z_ + r_ * y_)],
            [2 * (x_ * y_ + r_ * z_), 1 - 2 * (x_ * x_ + z_ * z_), 2 * (y_ * z_ - r_ * x_)],
            [2 * (x_ * z_ - r_ * y_), 2 * (y_ * z_ + r_ * x_), 1 - 2 * (x_ * x_ + y_ * y_)],
        ])
        Sigma = R @ np.diag(s ** 2) @ R.T
        tx, ty, tz = pv
        limx, limy = 1.3 * tanx, 1.3 * tany
        tx = np.clip(tx / tz, -limx, limx) * tz
        ty = np.clip(ty / tz, -limy, limy) * tz
        J = np.array([[fx / tz, 0, -fx * tx / tz ** 2],
                      [0, fy / tz, -fy * ty / tz ** 2]])
        JW = J @ w2c[:3, :3]
        cov2 = JW @ Sigma @ JW.T
        a, b, c = cov2[0, 0] + 0.3, cov2[0, 1], cov2[1, 1] + 0.3
        det = a * c - b * b
        mid = 0.5 * (a + c)
        lam = mid + np.sqrt(max(0.1, mid * mid - det))
        radius = np.ceil(3 * np.sqrt(max(lam, 0.0)))
        mx = ((pn[0] + 1) * W - 1) * 0.5
        my = ((pn[1] + 1) * H - 1) * 0.5
        out.append((pv[2], mx, my, a, b, c, radius))
    return np.array(out)


def test_preprocess_matches_numpy(rng):
    cam = random_camera(width=64, height=48)
    means, scales, quats, *_ = random_gaussians(rng, n=100)
    s = proj.preprocess(means, scales, quats, cam.w2c, cam.full_proj,
                        cam.width, cam.height, cam.tan_fovx, cam.tan_fovy)
    ref = numpy_reference_preprocess(means, scales, quats, cam)
    np.testing.assert_allclose(np.asarray(s.depth), ref[:, 0], rtol=2e-5)
    np.testing.assert_allclose(np.asarray(s.mean2d[:, 0]), ref[:, 1],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s.mean2d[:, 1]), ref[:, 2],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s.cov2d), ref[:, 3:6],
                               rtol=2e-4, atol=1e-4)
    vis = np.asarray(s.radius) > 0
    np.testing.assert_allclose(np.asarray(s.radius)[vis], ref[vis, 6],
                               atol=1.0)


def test_near_cull():
    cam = random_camera()
    means = jnp.array([[0, 0, 0.1], [0, 0, 0.2], [0, 0, 1.0]], jnp.float32)
    scales = jnp.full((3, 3), 0.05, jnp.float32)
    quats = jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (3, 1))
    s = proj.preprocess(means, scales, quats, cam.w2c, cam.full_proj,
                        cam.width, cam.height, cam.tan_fovx, cam.tan_fovy)
    # z<=0.2 culled (auxiliary.h:157)
    assert s.radius[0] == 0 and s.radius[1] == 0 and s.radius[2] > 0


def test_offscreen_cull():
    cam = random_camera(width=32, height=32)
    means = jnp.array([[100.0, 0, 1.0], [0, 0, 1.0]], jnp.float32)
    scales = jnp.full((2, 3), 0.02, jnp.float32)
    quats = jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (2, 1))
    s = proj.preprocess(means, scales, quats, cam.w2c, cam.full_proj,
                        cam.width, cam.height, cam.tan_fovx, cam.tan_fovy)
    assert s.radius[0] == 0 and s.radius[1] > 0


def test_tile_rect_covers_center():
    cam = random_camera(width=64, height=64)
    means = jnp.array([[0.0, 0.0, 2.0]], jnp.float32)
    scales = jnp.full((1, 3), 0.05, jnp.float32)
    quats = jnp.array([[1.0, 0, 0, 0]], jnp.float32)
    s = proj.preprocess(means, scales, quats, cam.w2c, cam.full_proj,
                        cam.width, cam.height, cam.tan_fovx, cam.tan_fovy,
                        tile_w=16, tile_h=16)
    cx, cy = float(s.mean2d[0, 0]), float(s.mean2d[0, 1])
    assert s.rect_min[0, 0] <= cx // 16 < s.rect_max[0, 0]
    assert s.rect_min[0, 1] <= cy // 16 < s.rect_max[0, 1]


def test_preprocess_differentiable(rng):
    cam = random_camera()
    means, scales, quats, *_ = random_gaussians(rng, n=20)

    def f(m, s, q):
        sp = proj.preprocess(m, s, q, cam.w2c, cam.full_proj, cam.width,
                             cam.height, cam.tan_fovx, cam.tan_fovy)
        mask = (sp.radius > 0).astype(jnp.float32)
        return jnp.sum(sp.mean2d * mask[:, None]) + jnp.sum(sp.conic * mask[:, None])

    grads = jax.grad(f, argnums=(0, 1, 2))(means, scales, quats)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.any(np.asarray(g) != 0)


class TestTightCull:
    """Tight rect culling (round 3 perf headline): passing ``opacity`` to
    preprocess shrinks the emission rect to the α ≥ 1/255 iso-box ∩ the
    3σ square.  Every removed instance fails the blend kernels' alpha
    test, so output and gradients must be IDENTICAL while the instance
    count drops; radius/visibility stay the reference's 3σ values."""

    def _setup(self, n=300, width=64, height=64, seed=3):
        from tests.utils import random_camera, random_gaussians
        rng = np.random.default_rng(seed)
        cam = random_camera(width=width, height=height)
        means, scales, quats, colors, _, unc = random_gaussians(rng, n=n)
        # opacities spanning sub-1/255 to near-1 to exercise every branch
        op = jnp.asarray(10.0 ** rng.uniform(-4, -0.02, n), jnp.float32)
        return cam, means, scales, quats, colors, op, unc

    def _pre(self, cam, means, scales, quats, op=None, w=64, h=64):
        return proj.preprocess(means, scales, quats, cam.w2c,
                               cam.full_proj, w, h, cam.tan_fovx,
                               cam.tan_fovy, tile_w=16, tile_h=16,
                               opacity=op)

    def test_radius_and_instance_count(self):
        cam, means, scales, quats, colors, op, unc = self._setup()
        s_ref = self._pre(cam, means, scales, quats)
        s_t = self._pre(cam, means, scales, quats, op)
        np.testing.assert_array_equal(np.asarray(s_ref.radius),
                                      np.asarray(s_t.radius))
        def n_inst(s):
            rw = s.rect_max[:, 0] - s.rect_min[:, 0]
            rh = s.rect_max[:, 1] - s.rect_min[:, 1]
            return int(jnp.sum(jnp.where(s.radius > 0, rw * rh, 0)))
        assert n_inst(s_t) < n_inst(s_ref) * 0.7, \
            (n_inst(s_t), n_inst(s_ref))
        # sub-1/255 opacity gaussians emit nothing at all
        dead = np.asarray((op < 1 / 255.) & (s_ref.radius > 0))
        areas = np.asarray((s_t.rect_max - s_t.rect_min).prod(1))
        assert (areas[dead] == 0).all()

    def test_oracle_output_identical(self):
        from gscream_tpu.ops.rasterize_ref import rasterize_scan
        cam, means, scales, quats, colors, op, unc = self._setup()
        bg = jnp.asarray([0.1, 0.2, 0.3])
        outs = []
        for s in (self._pre(cam, means, scales, quats),
                  self._pre(cam, means, scales, quats, op)):
            outs.append(rasterize_scan(s, colors, op, unc, bg, 64, 64))
        for a, b in zip(outs[0][:4], outs[1][:4]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_kernel_fwd_bwd_identical(self):
        from gscream_tpu.ops import rasterize_tiled as rt
        from gscream_tpu.ops.binning import bin_instances
        cam, means, scales, quats, colors, op, unc = self._setup()
        bg = jnp.asarray([0.1, 0.2, 0.3])
        cap = 1 << 14

        def pre32(o):
            return proj.preprocess(means, scales, quats, cam.w2c,
                                   cam.full_proj, 64, 64, cam.tan_fovx,
                                   cam.tan_fovy, tile_w=rt.TILE_W,
                                   tile_h=rt.TILE_H, opacity=o)

        def render(tight):
            s = pre32(op if tight else None)
            def f(m2d, conic, o, col, dep, u):
                binn = bin_instances(
                    s._replace(mean2d=m2d), cap, 64, 64, rt.TILE_W,
                    rt.TILE_H,
                    attrs=jax.lax.stop_gradient(rt.gauss_attrs(
                        m2d, conic, o, col, dep, u)))
                assert int(binn.num_instances) <= cap
                out = rt.rasterize_tiled(m2d, conic, o, col, dep, u,
                                         binn, bg, 64, 64, True)
                return jnp.stack([out.color.sum(-1), out.depth,
                                  out.uncertainty, out.final_t])
            val, vjp = jax.vjp(f, s.mean2d, s.conic, op, colors,
                               s.depth, unc)
            ct = jnp.asarray(np.random.default_rng(0).normal(
                size=val.shape), jnp.float32)
            return val, vjp(ct)

        v_ref, g_ref = render(False)
        v_t, g_t = render(True)
        # forward: removed instances contributed exact zeros, but the
        # kernel's chunked log-transmittance reassociates when the
        # per-tile lists compact → ulp-level drift only
        np.testing.assert_allclose(np.asarray(v_ref), np.asarray(v_t),
                                   rtol=0, atol=2e-6)
        # backward: same nonzero terms, but instances shift φ-groups in
        # the segment reducer → f32 reassociation at the 1e-5 scale
        for a, b in zip(g_ref, g_t):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=1e-4)
