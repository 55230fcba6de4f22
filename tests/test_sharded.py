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
    make_sharded_train_step, sharded_view_batch
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
        jnp.zeros((n,), bool),
        jnp.zeros((n, H, W), jnp.float32),
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
            jnp.zeros((1,), bool),
            jnp.zeros((1, H, W), jnp.float32),
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
    batch = sharded_view_batch(scene.views[:2])
    losses = []
    for _ in range(3):
        ts, aux = step(ts, batch, accumulate=True)
        losses.append(float(aux.loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # densify stats accumulated for both views of each step
    assert float(jnp.max(ts.stats.anchor_demon)) >= 3


def _host_inputs(it, mask_np, seed=7):
    """Deterministic per-iteration host sampling shared by both loops."""
    from gscream_tpu.train.loop import random_box_mask, \
        sample_patch_in_mask_region
    rng = np.random.default_rng(np.random.SeedSequence([seed, it]))
    fg_box = random_box_mask(rng, mask_np, 1.5, 0.8, H, W)
    box = sample_patch_in_mask_region(rng, mask_np, 48, 0.8, H, W)
    return fg_box, np.array(box, np.int32)


def test_trajectory_matches_single_device(scene):
    """VERDICT r2 item 2: the sharded step at B=1 IS the training step —
    ~20 iterations of phase 1 (with densify stats) followed by phase-2
    cross-attention iterations track the single-device train_step."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    from gscream_tpu.train.step import train_step

    opt = OptimConfig()
    views = scene.views
    mask_np = np.asarray(views[0].mask[0])
    scaffold = init_scaffold(jax.random.PRNGKey(0), scene.points, CFG)
    ts_a = init_train_state(scaffold, CFG, jax.random.PRNGKey(1))
    ts_b = init_train_state(scaffold, CFG, jax.random.PRNGKey(1))
    step_b = make_sharded_train_step(make_mesh(1, 4), CFG, opt, 16384,
                                     W, H, interpret=True)

    losses_a, losses_b = [], []
    n_phase1, n_phase2 = 14, 4
    for it in range(1, n_phase1 + n_phase2 + 1):
        vi = (it - 1) % len(views)
        v = views[vi]
        is_ref = vi == 0
        use_cross = it > n_phase1
        fg_box, cross_box = _host_inputs(it, np.asarray(v.mask[0]))
        fg_box = fg_box if is_ref else np.zeros((H, W), np.float32)
        ts_a, aux_a = train_step(
            ts_a, v.camera, jnp.asarray(v.image), jnp.asarray(v.mask),
            jnp.asarray(v.depth), jnp.asarray(fg_box),
            jnp.asarray(cross_box), cfg=CFG, opt=opt, is_ref=is_ref,
            use_crossattn=use_cross, capacity=16384, interpret=True,
            width=W, height=H, accumulate=not use_cross,
            feat_frozen=use_cross)
        batch = sharded_view_batch(
            [v], fg_boxes=[fg_box], is_ref=[is_ref],
            cross_boxes=[cross_box], cross_enable=[1.0 if use_cross
                                                   else 0.0])
        ts_b, aux_b = step_b(ts_b, batch, use_crossattn=use_cross,
                             feat_frozen=use_cross,
                             accumulate=not use_cross)
        losses_a.append(float(aux_a.loss))
        losses_b.append(float(aux_b.loss))
        assert bool(aux_a.cross_ok) == bool(aux_b.cross_ok), it

    # loss trajectories coincide up to band-psum reassociation
    np.testing.assert_allclose(losses_a, losses_b, rtol=5e-3)
    # parameters track: compare across the whole tree.  Tolerance note:
    # for elements whose true gradient ≈ 0, the band-boundary f32
    # reassociation noise (~1e-7) decides the SIGN of Adam's m/√v, so
    # such params random-walk apart at up to lr (~2.5e-4) per step — an
    # intrinsic property of comparing reduction orders through Adam, not
    # a semantic divergence (single-STEP grad parity is asserted tightly
    # by test_sharded_loss_*).  atol is therefore a few lr·steps, and
    # row-tight emission (r3) reshuffling which instances sit on band
    # boundaries is expected to move individual elements within it.
    # ADVICE r3: the loose bound alone would tolerate ~5% divergence
    # everywhere — additionally require that the Adam-random-walk
    # population is SMALL: ≥99.5% of elements must still meet the tight
    # pre-r3 tolerance (rtol 5e-3, atol 5e-4).
    n_bad = n_tot = 0
    for a, b in zip(jax.tree.leaves((ts_a.scaffold.params,
                                     ts_a.scaffold.mlps)),
                    jax.tree.leaves((ts_b.scaffold.params,
                                     ts_b.scaffold.mlps))):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=5e-2, atol=5e-3)
        n_bad += int(np.sum(np.abs(a - b) > 5e-4 + 5e-3 * np.abs(b)))
        n_tot += a.size
    assert n_bad <= max(n_tot // 200, 8), (n_bad, n_tot)
    # densify stats identical paths
    np.testing.assert_allclose(np.asarray(ts_a.stats.anchor_demon),
                               np.asarray(ts_b.stats.anchor_demon))
    np.testing.assert_allclose(np.asarray(ts_a.stats.offset_grad_accum),
                               np.asarray(ts_b.stats.offset_grad_accum),
                               rtol=1e-2, atol=1e-6)


def test_sharded_crossattn_batch(scene):
    """Mixed B=2 batch in phase 2: one crossattn-enabled view + one
    normal view; the step runs, gates correctly, and updates feat only
    through the EMA writes."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    opt = OptimConfig()
    views = scene.views[:2]
    scaffold = init_scaffold(jax.random.PRNGKey(0), scene.points, CFG)
    # anchor feats init to ZERO (Scaffold-GS convention) — attention over
    # zero tokens returns zeros, making the EMA mix a no-op; randomize so
    # the write visibility assertion below is meaningful
    scaffold = scaffold._replace(params=scaffold.params._replace(
        feat=0.3 * jax.random.normal(jax.random.PRNGKey(9),
                                     scaffold.params.feat.shape)))
    ts = init_train_state(scaffold, CFG, jax.random.PRNGKey(1))
    step = make_sharded_train_step(make_mesh(2, 2), CFG, opt, 16384,
                                   W, H, interpret=True)
    fg_box, cross_box = _host_inputs(1, np.asarray(views[0].mask[0]))
    batch = sharded_view_batch(
        views, fg_boxes=[fg_box, np.zeros((H, W), np.float32)],
        is_ref=[True, False], cross_boxes=[cross_box, cross_box],
        cross_enable=[1.0, 0.0])
    feat0 = np.asarray(ts.scaffold.params.feat)
    ts2, aux = step(ts, batch, use_crossattn=True, feat_frozen=True)
    assert np.isfinite(float(aux.loss))
    # feat changed ONLY via EMA writes (sampled rows), never via Adam
    changed = np.any(np.asarray(ts2.scaffold.params.feat) != feat0, axis=1)
    if bool(aux.cross_ok):
        assert changed.any()
    assert changed.sum() <= 2 * min(opt.crossattn_max_tokens, CFG.capacity)


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
                               ts, tc, n_tiles, True, gx)
        return np.asarray(raw.reshape(-1, rt.ILANES)[:cap])

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


def test_train_scene_mesh_routing(scene, tmp_path):
    """VERDICT r2 item 2 (loop half): ``train_scene(mesh=...)`` routes the
    ENTIRE loop — prepare/launch/overflow/commit — through the sharded
    step and reproduces the single-device loop's loss trajectory,
    including the phase-1 → phase-2 (cross-attention) switch."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    from gscream_tpu.config import ModelConfig, OptimConfig as OC, RunConfig
    from gscream_tpu.train.loop import train_scene

    run = RunConfig(
        model=ModelConfig(feat_dim=8, n_offsets=2, voxel_size=0.1,
                          anchor_capacity=512),
        optim=OC(iterations=10, start_crossattn_from=6, start_stat=1,
                 update_from=10**9, update_until=10**9))

    def go(mesh, out):
        ts, log = train_scene(
            scene.views, 0, scene.points, run, out_dir=str(tmp_path / out),
            capacity=16384, interpret=True, mesh=mesh)
        return ts, log.losses

    ts_a, losses_a = go(None, "single")
    ts_b, losses_b = go(make_mesh(1, 2), "mesh")
    np.testing.assert_allclose(losses_a, losses_b, rtol=5e-3)
    for a, b in zip(jax.tree.leaves((ts_a.scaffold.params,
                                     ts_a.scaffold.mlps)),
                    jax.tree.leaves((ts_b.scaffold.params,
                                     ts_b.scaffold.mlps))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)


def test_batch_densify_stats_match_per_view(scene):
    """Code-review r3 regression: with the gate-averaged batch loss,
    per-view screen gradients must be rescaled by gsum before densify
    accumulation — a B=2 batch's stat deltas equal the SUM of the two
    single-device steps' deltas taken from the same pre-step state."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    from gscream_tpu.train.step import train_step

    opt = OptimConfig()
    views = scene.views[:2]
    scaffold = init_scaffold(jax.random.PRNGKey(0), scene.points, CFG)
    ts0 = init_train_state(scaffold, CFG, jax.random.PRNGKey(1))

    deltas = []
    for v in views:
        ts_v, _ = train_step(
            ts0, v.camera, jnp.asarray(v.image), jnp.asarray(v.mask),
            jnp.asarray(v.depth), jnp.zeros((H, W)),
            jnp.zeros(4, jnp.int32), cfg=CFG, opt=opt, is_ref=False,
            use_crossattn=False, capacity=16384, interpret=True,
            width=W, height=H, accumulate=True)
        deltas.append(jax.tree.map(
            lambda a, b: np.asarray(a) - np.asarray(b),
            ts_v.stats, ts0.stats))

    step = make_sharded_train_step(make_mesh(2, 2), CFG, opt, 16384,
                                   W, H, interpret=True)
    ts_b, _ = step(ts0, sharded_view_batch(views), accumulate=True)
    for name in ("opacity_accum", "anchor_demon", "offset_grad_accum",
                 "offset_denom"):
        want = (getattr(deltas[0], name) + getattr(deltas[1], name))
        got = (np.asarray(getattr(ts_b.stats, name))
               - np.asarray(getattr(ts0.stats, name)))
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5,
                                   err_msg=name)
