"""SPMD sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gscream_tpu.config import OptimConfig
from gscream_tpu.data.synthetic import make_scene
from gscream_tpu.model.scaffold import ScaffoldConfig, init_scaffold
from gscream_tpu.parallel.mesh import make_mesh
from gscream_tpu.parallel.shard import make_sharded_loss, \
    make_sharded_train_step
from gscream_tpu.train.state import init_train_state

CFG = ScaffoldConfig(feat_dim=8, n_offsets=2, voxel_size=0.1, capacity=512)
W = H = 64


@pytest.fixture(scope="module")
def scene():
    return make_scene(n_views=4, n_gauss=100, width=W, height=H)


def _batch(scene, n):
    views = [scene.views[i % len(scene.views)] for i in range(n)]
    return (
        jnp.stack([v.camera.w2c for v in views]),
        jnp.stack([v.camera.full_proj for v in views]),
        jnp.stack([v.camera.cam_center for v in views]),
        jnp.stack([v.camera.tan_fovx for v in views]),
        jnp.stack([v.camera.tan_fovy for v in views]),
        jnp.stack([jnp.asarray(v.image) for v in views]),
        jnp.stack([jnp.asarray(v.mask) for v in views]),
        jnp.stack([jnp.asarray(v.depth) for v in views]),
    )


def _loss_and_grads(mesh, scene, data):
    scaffold = init_scaffold(jax.random.PRNGKey(0), scene.points, CFG)
    loss_fn = make_sharded_loss(mesh, CFG, OptimConfig(), 16384, W, H,
                                interpret=True)
    batch = _batch(scene, data)
    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(
        scaffold.params, scaffold.mlps, scaffold.alive, scaffold.xyz_max,
        batch)
    return float(loss), grads


@pytest.mark.parametrize("is_ref", [True, False])
@pytest.mark.parametrize("hw", [(64, 64), (48, 40)])
def test_band_loss_matches_global(is_ref, hw):
    """band_loss_terms at n_bands=1 == train.step.loss_terms, including
    sub-tile image heights (the zero-pad SSIM boundary)."""
    from gscream_tpu.ops.rasterize_tiled import TILE_H, TiledOut
    from gscream_tpu.parallel.band_loss import band_loss_terms
    from gscream_tpu.train.step import loss_terms

    h, w = hw
    rng = np.random.default_rng(3)
    color = rng.uniform(size=(h, w, 3)).astype(np.float32)
    depth = rng.uniform(1.0, 4.0, size=(h, w)).astype(np.float32)
    unc = rng.uniform(size=(h, w)).astype(np.float32)
    t = rng.uniform(size=(h, w)).astype(np.float32)
    gt = rng.uniform(size=(3, h, w)).astype(np.float32)
    mask = (rng.uniform(size=(1, h, w)) > 0.6).astype(np.float32)
    mono = rng.uniform(1.0, 3.0, size=(1, h, w)).astype(np.float32)
    fgbox = (rng.uniform(size=(h, w)) > 0.5).astype(np.float32)
    opt = OptimConfig()

    out_full = TiledOut(color=jnp.asarray(color), depth=jnp.asarray(depth),
                        uncertainty=jnp.asarray(unc), final_t=jnp.asarray(t))
    l_ref, l1_ref = loss_terms(out_full, gt, mask, mono, fgbox, opt,
                               is_ref=is_ref)

    bh = -(-h // TILE_H) * TILE_H
    pad = ((0, bh - h), (0, 0))

    def padrows(x):
        return jnp.asarray(np.pad(x, pad + ((0, 0),) * (x.ndim - 2)
                                  if x.ndim == 2 else
                                  ((0, bh - h),) + ((0, 0),) * (x.ndim - 1)))

    out_band = TiledOut(
        color=jnp.asarray(np.pad(color, ((0, bh - h), (0, 0), (0, 0)))),
        depth=jnp.asarray(np.pad(depth, ((0, bh - h), (0, 0)))),
        uncertainty=jnp.asarray(np.pad(unc, ((0, bh - h), (0, 0)))),
        final_t=jnp.asarray(np.pad(t, ((0, bh - h), (0, 0)))))
    l_band, l1_band = band_loss_terms(
        out_band, jnp.int32(0), jnp.asarray(gt), jnp.asarray(mask),
        jnp.asarray(mono), jnp.asarray(fgbox), opt, is_ref, h, w,
        "tiles", 1)
    np.testing.assert_allclose(float(l_band), float(l_ref), rtol=2e-5)
    np.testing.assert_allclose(float(l1_band), float(l1_ref), rtol=2e-5)


def test_tile_sharding_matches_single(scene):
    """2-band tile sharding == 1-band (single device) loss and grads."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    l1, g1 = _loss_and_grads(make_mesh(1, 1), scene, 1)
    l2, g2 = _loss_and_grads(make_mesh(1, 2), scene, 1)
    assert abs(l1 - l2) < 1e-5
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_data_parallel_mean(scene):
    """DP over 2 views == mean of per-view losses."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    scaffold = init_scaffold(jax.random.PRNGKey(0), scene.points, CFG)
    loss_fn = make_sharded_loss(make_mesh(1, 1), CFG, OptimConfig(), 16384,
                                W, H, interpret=True)
    views = scene.views

    def single(view_idx):
        vs = [views[view_idx]]
        b = (
            jnp.stack([v.camera.w2c for v in vs]),
            jnp.stack([v.camera.full_proj for v in vs]),
            jnp.stack([v.camera.cam_center for v in vs]),
            jnp.stack([v.camera.tan_fovx for v in vs]),
            jnp.stack([v.camera.tan_fovy for v in vs]),
            jnp.stack([jnp.asarray(v.image) for v in vs]),
            jnp.stack([jnp.asarray(v.mask) for v in vs]),
            jnp.stack([jnp.asarray(v.depth) for v in vs]),
        )
        return float(loss_fn(scaffold.params, scaffold.mlps, scaffold.alive,
                             scaffold.xyz_max, b))

    l0, l1v = single(0), single(1)
    loss_fn2 = make_sharded_loss(make_mesh(2, 1), CFG, OptimConfig(), 16384,
                                 W, H, interpret=True)
    ldp = float(loss_fn2(scaffold.params, scaffold.mlps, scaffold.alive,
                         scaffold.xyz_max, _batch(scene, 2)))
    assert abs(ldp - 0.5 * (l0 + l1v)) < 1e-5


def test_sharded_train_step_runs(scene):
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    mesh = make_mesh(2, 2)
    scaffold = init_scaffold(jax.random.PRNGKey(0), scene.points, CFG)
    ts = init_train_state(scaffold, CFG, jax.random.PRNGKey(1))
    step = make_sharded_train_step(mesh, CFG, OptimConfig(), 16384, W, H,
                                   interpret=True)
    batch = _batch(scene, 2)
    losses = []
    for _ in range(3):
        ts, loss = step(ts, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_pad_tiles_do_not_wipe_gradients():
    """Regression (r2 review): banded grids pad the tile-range arrays;
    pad tiles must carry start=capacity, because the backward kernel's
    sentinel pass zero-fills grad_hbm from the LAST tile's start+count —
    a 0-start pad tile at the end of a band erased every gradient row the
    band had just written (silently zero gradients whenever
    gy % n_bands != 0)."""
    from tests.utils import random_camera, random_gaussians
    from gscream_tpu.ops import projection as proj
    from gscream_tpu.ops.binning import bin_instances
    from gscream_tpu.ops import rasterize_tiled as rt

    rng = np.random.default_rng(0)
    cam = random_camera(width=64, height=64)
    means, scales, quats, colors, opac, unc = random_gaussians(rng, n=150)
    splats = proj.preprocess(means, scales, quats, cam.w2c, cam.full_proj,
                             64, 64, cam.tan_fovx, cam.tan_fovy,
                             tile_w=rt.TILE_W, tile_h=rt.TILE_H)
    cap = 8192
    binning = bin_instances(splats, cap, 64, 64, rt.TILE_W, rt.TILE_H)
    gx = 2
    inst = rt.pack_instance_data(splats.mean2d, splats.conic, opac, colors,
                                 splats.depth, unc, binning, gx)
    pix1 = jnp.ones((1, 8, rt.PIX), jnp.float32)

    def run(ts, tc, n_tiles):
        raw = rt._run_backward(inst, jnp.tile(pix1, (n_tiles, 1, 1)),
                               ts, tc, n_tiles, True)
        return np.asarray(raw[:cap, :rt.ILANES])

    base = run(binning.tile_start, binning.tile_count, 4)
    assert np.abs(base).sum() > 0
    # banded-grid padding convention: start = last real end, count=0
    end = binning.tile_start[-1] + binning.tile_count[-1]
    ts_pad = jnp.concatenate([binning.tile_start,
                              jnp.full((2,), 1, jnp.int32) * end])
    tc_pad = jnp.concatenate([binning.tile_count,
                              jnp.zeros((2,), jnp.int32)])
    padded = run(ts_pad, tc_pad, 6)
    np.testing.assert_array_equal(padded, base)
