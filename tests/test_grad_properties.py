"""Property tests: analytic vs numerical gradients (SURVEY §4(b)).

`jax.test_util.check_grads` on the smooth differentiable components —
the EWA preprocess (whose jax.vjp replaces the reference's hand-written
backward.cu:144-406), the loss heads, SSIM and the cross-attention
block.  The rasterizer itself is excluded here: its validity gates
(alpha/T thresholds, tile rects) are intentionally non-smooth and its
gradient contract is proven against the oracle + f64 golden bundle
instead (test_rasterize_tiled.py, test_golden.py).

Runs in f64 so finite differences are meaningful (the modules are
dtype-polymorphic; f32 is the production path).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads


@pytest.fixture(autouse=True)
def _x64():
    # per-test only — a module-level update would leak x64 into every
    # other test collected by the same xdist worker
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _gaussians(n=24, seed=0):
    rng = np.random.default_rng(seed)
    means = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                      rng.uniform(1.0, 4.0, n)], -1)
    scales = rng.uniform(0.05, 0.2, (n, 3))
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    return (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats))


def test_preprocess_grads():
    from tests.utils import random_camera
    from gscream_tpu.ops.projection import preprocess
    cam = random_camera(width=64, height=48)
    means, scales, quats = _gaussians()
    w2c = jnp.asarray(np.asarray(cam.w2c, np.float64))
    fproj = jnp.asarray(np.asarray(cam.full_proj, np.float64))

    def f(m, s, q):
        sp = preprocess(m, s, q, w2c, fproj, 64, 48,
                        float(cam.tan_fovx), float(cam.tan_fovy))
        # smooth outputs only (radius/rects are integer by design)
        return (jnp.sum(sp.mean2d ** 2) + jnp.sum(sp.conic)
                + jnp.sum(sp.depth ** 2) + jnp.sum(sp.cov2d))

    check_grads(f, (means, scales, quats), order=1, modes=("rev",),
                atol=1e-6, rtol=1e-6)


def test_loss_head_grads():
    from gscream_tpu.ops import losses as L
    from gscream_tpu.ops.ssim import ssim
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0.1, 0.9, (3, 24, 32)))
    gt = jnp.asarray(rng.uniform(0.1, 0.9, (3, 24, 32)))
    mask = jnp.asarray((rng.uniform(size=(3, 24, 32)) > 0.5)
                       .astype(np.float64))

    check_grads(lambda a: L.l1_loss_masked(a, gt, mask), (img,), order=1,
                modes=("rev",), atol=1e-5, rtol=1e-5)
    check_grads(lambda a: ssim(a, gt), (img,), order=1, modes=("rev",),
                atol=1e-4, rtol=1e-4)


def test_depth_loss_grads():
    from gscream_tpu.ops import losses as L
    rng = np.random.default_rng(2)
    depth = jnp.asarray(rng.uniform(1.0, 4.0, (24, 32)))
    mono = jnp.asarray(rng.uniform(0.2, 0.8, (24, 32)))
    m = jnp.asarray((rng.uniform(size=(24, 32)) > 0.4)
                    .astype(np.float64))
    fg = jnp.asarray((rng.uniform(size=(24, 32)) > 0.6)
                     .astype(np.float64))
    check_grads(lambda d: L.depth_loss_ref(d, mono, m, fg, 1.0, 2.0, 0.5),
                (depth,), order=1, modes=("rev",), atol=2e-4, rtol=2e-4)
    check_grads(lambda d: L.depth_loss_other(d, mono, m, 1.0, 0.5),
                (depth,), order=1, modes=("rev",), atol=2e-4, rtol=2e-4)


def test_attention_grads():
    from gscream_tpu.ops.attention import (bidirectional_attn,
                                           init_bidirectional_attn)
    p = init_bidirectional_attn(jax.random.PRNGKey(0), dim=8, heads=2,
                                dim_head=4)
    p = jax.tree.map(lambda x: x.astype(jnp.float64), p)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(6, 8)))
    ctx = jnp.asarray(rng.normal(size=(5, 8)))

    def f(x_, ctx_):
        o, c = bidirectional_attn(p, x_, ctx_)
        return jnp.sum(o ** 2) + jnp.sum(c ** 2)

    check_grads(f, (x, ctx), order=1, modes=("rev",), atol=1e-6,
                rtol=1e-6)
