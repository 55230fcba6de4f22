"""Row-tight emission (round 3): per-tile-row x-extents of the α ≥ 1/255
iso-ellipse replace full-rect emission.

Soundness contract (mirrors TestTightCull for the bbox cull): every
(gaussian, tile) pair the row-tight path drops must have α < 1/255 at
EVERY pixel of that tile — the blend paths (forward.cu:536 in the
reference; rasterize_tiled/rasterize_ref here) skip such pixels, so
removal is output-exact.  The kernel stream compaction reassociates the
chunked transmittance/reducer arithmetic, so kernel A/B tolerances match
TestTightCull's (ulp-scale), while the drop-decision test is exact.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gscream_tpu.ops.projection as proj
from gscream_tpu.ops import rasterize_tiled as rt
from gscream_tpu.ops.binning import (bin_instances, emission_counts,
                                     overflow_demand)

TW, TH = rt.TILE_W, rt.TILE_H


def _scene(seed, n=400, width=160, height=96, aniso=True):
    """Random scene biased toward thin/rotated gaussians (the case where
    row extents beat the bbox) with opacities spanning the 1/255 edge."""
    rng = np.random.default_rng(seed)
    means = np.stack([
        rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
        rng.uniform(0.5, 6.0, n)], -1).astype(np.float32)
    if aniso:
        # log-spread scales: some axes 30× longer than others
        scales = np.exp(rng.normal(-2.8, 1.2, (n, 3))).astype(np.float32)
    else:
        scales = rng.uniform(0.01, 0.25, (n, 3)).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    op = (10.0 ** rng.uniform(-4, -0.02, n)).astype(np.float32)
    unc = rng.uniform(0, 1, n).astype(np.float32)
    from tests.utils import random_camera
    cam = random_camera(width=width, height=height)
    splats = proj.preprocess(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
        cam.w2c, cam.full_proj, width, height, cam.tan_fovx, cam.tan_fovy,
        tile_w=TW, tile_h=TH, opacity=jnp.asarray(op))
    return (cam, splats, jnp.asarray(colors), jnp.asarray(op),
            jnp.asarray(unc), width, height)


def _pairs(binning, width, height):
    nt = (-(-width // TW)) * (-(-height // TH))
    t = np.asarray(binning.tile_id)
    g = np.asarray(binning.gauss_id)
    v = t < nt
    return list(zip(t[v].tolist(), g[v].tolist()))


@pytest.mark.parametrize("seed,aniso", [(0, True), (1, True), (2, False)])
def test_dropped_pairs_are_subthreshold(seed, aniso):
    """THE soundness property: max α over every dropped tile < 1/255."""
    cam, splats, colors, op, unc, W, H = _scene(seed, aniso=aniso)
    cap = 1 << 16
    b_full = bin_instances(splats, cap, W, H, TW, TH, row_tight=False)
    b_rt = bin_instances(splats, cap, W, H, TW, TH, row_tight=True)
    full = set(_pairs(b_full, W, H))
    tight = _pairs(b_rt, W, H)
    # subset, no duplicates
    assert len(tight) == len(set(tight))
    assert set(tight) <= full
    dropped = sorted(full - set(tight))
    assert int(b_rt.num_instances) <= int(b_full.num_instances)
    # row-tight must actually remove something on the anisotropic scenes
    if aniso:
        assert len(dropped) > 0
    mean = np.asarray(splats.mean2d)
    con = np.asarray(splats.conic)
    opn = np.asarray(op)
    gx = -(-W // TW)
    for t, g in dropped:
        tx, ty = t % gx, t // gx
        xs = np.arange(tx * TW, (tx + 1) * TW, dtype=np.float64)
        ys = np.arange(ty * TH, (ty + 1) * TH, dtype=np.float64)
        X, Y = np.meshgrid(xs, ys)
        dx = X - mean[g, 0]
        dy = Y - mean[g, 1]
        power = (-0.5 * (con[g, 0] * dx * dx + con[g, 2] * dy * dy)
                 - con[g, 1] * dx * dy)
        alpha = opn[g] * np.exp(power)
        assert alpha.max() < 1.0 / 255.0, (t, g, alpha.max())


def test_emission_structure():
    """Offsets stay per-gaussian emission-contiguous (the segment
    reducer's contract) and emission order is a subsequence of full-rect
    emission order (blend-order preservation)."""
    cam, splats, colors, op, unc, W, H = _scene(0)
    cap = 1 << 16
    b = bin_instances(splats, cap, W, H, TW, TH, row_tight=True)
    n = int(b.num_instances)
    off = np.asarray(b.offsets)
    assert (np.diff(off) >= 0).all()
    assert off[-1] == n
    nt = (-(-W // TW)) * (-(-H // TH))
    t = np.asarray(b.tile_id)
    g = np.asarray(b.gauss_id)
    es = np.asarray(b.emit_slot)
    v = t < nt
    order = np.argsort(es[v], kind="stable")
    ge = g[v][order]
    # emission order must be gaussian-major with spans [off[g], off[g+1])
    for gg in np.unique(ge):
        seg = np.where(ge == gg)[0]
        assert seg[0] == off[gg] and seg[-1] == off[gg + 1] - 1

    # sorted per-tile lists of the shared pairs keep full-rect's order
    b_full = bin_instances(splats, cap, W, H, TW, TH, row_tight=False)
    keep = set(_pairs(b, W, H))
    seq_full = [p for p in _pairs(b_full, W, H) if p in keep]
    assert seq_full == _pairs(b, W, H)


def test_kernel_fwd_bwd_close():
    """Kernel render/gradients match full-rect emission to the same
    reassociation tolerances TestTightCull accepts for the bbox cull."""
    cam, splats, colors, op, unc, W, H = _scene(1, n=300, width=64,
                                                height=64)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    cap = 1 << 14

    def render(row_tight):
        def f(m2d, conic, o, col, dep, u):
            binn = bin_instances(
                splats._replace(mean2d=m2d), cap, 64, 64, TW, TH,
                row_tight=row_tight,
                attrs=jax.lax.stop_gradient(rt.gauss_attrs(
                    m2d, conic, o, col, dep, u)))
            assert int(overflow_demand(binn)) <= cap
            out = rt.rasterize_tiled(m2d, conic, o, col, dep, u,
                                     binn, bg, 64, 64, True)
            return jnp.stack([out.color.sum(-1), out.depth,
                              out.uncertainty, out.final_t])
        val, vjp = jax.vjp(f, splats.mean2d, splats.conic, op, colors,
                           splats.depth, unc)
        ct = jnp.asarray(np.random.default_rng(0).normal(
            size=val.shape), jnp.float32)
        return val, vjp(ct)

    v_ref, g_ref = render(False)
    v_t, g_t = render(True)
    np.testing.assert_allclose(np.asarray(v_ref), np.asarray(v_t),
                               rtol=0, atol=2e-6)
    for a, b in zip(g_ref, g_t):
        # row-tight changes instance counts → chunk/scan boundaries; with
        # raw-mode in-kernel coefficients the f32 reassociation noise on
        # O(100) grads reaches a few 1e-4 absolute (r4: 1/900 elements
        # exceeded the old atol 1e-4 by 2.3e-4)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)


def test_counts_and_overflow():
    cam, splats, colors, op, unc, W, H = _scene(2)
    cap = 1 << 16
    b = bin_instances(splats, cap, W, H, TW, TH, row_tight=True)
    n_rows = int(b.num_rows)
    assert n_rows > 0
    ni, nr = emission_counts(splats, TW, TH, -(-max(n_rows, 1) // 8) * 8)
    assert int(ni) == int(b.num_instances)
    assert int(nr) == n_rows
    from gscream_tpu.ops.binning import ROW_RATIO
    assert int(overflow_demand(b)) == max(
        int(b.num_instances), ROW_RATIO * n_rows)
    # a capacity too small for the row table must push the demand above it
    small = 64
    b2 = bin_instances(splats, small, W, H, TW, TH, row_tight=True)
    assert int(overflow_demand(b2)) > small
    # num_rows is exact even when the static row table truncates
    assert int(b2.num_rows) == n_rows


def test_fullrect_when_no_tiso():
    """Without tight culling (opacity=None ⇒ t_iso None) the row path is
    bypassed and emission equals the pre-round-3 full-rect order."""
    from tests.utils import random_camera, random_gaussians
    rng = np.random.default_rng(0)
    cam = random_camera(width=96, height=64)
    means, scales, q, colors, op, unc = random_gaussians(rng, n=200)
    s = proj.preprocess(means, scales, q, cam.w2c, cam.full_proj, 96, 64,
                        cam.tan_fovx, cam.tan_fovy, tile_w=TW, tile_h=TH)
    assert s.t_iso is None
    b = bin_instances(s, 1 << 14, 96, 64, TW, TH, row_tight=True)
    b0 = bin_instances(s, 1 << 14, 96, 64, TW, TH, row_tight=False)
    assert int(b.num_rows) == 0
    np.testing.assert_array_equal(np.asarray(b.tile_id),
                                  np.asarray(b0.tile_id))
    np.testing.assert_array_equal(np.asarray(b.gauss_id),
                                  np.asarray(b0.gauss_id))


@pytest.mark.parametrize("mode", ["pallas", "full"])
def test_expand_pallas_matches_xla(mode):
    """GSCREAM_EXPAND=pallas/full (compaction sort + windowed indicator-
    matmul expansion; ``full`` additionally runs stage 1 — the row-extent
    math — in the EXPAND1 kernel) reproduces the XLA build EXACTLY on
    every consumed Binning field: table values travel as exact-in-f32
    numbers, so tile, gauss, depth bits, ranges, and per-gaussian offsets
    are bit-equal.  (gauss_id/depth at invalid slots past num_instances
    may differ — both paths emit finite don't-care values there.)"""
    for seed in (0, 3):
        cam, splats, colors, op, unc, W, H = _scene(seed)
        cap = 1 << 16
        a = bin_instances(splats, cap, W, H, TW, TH, expand="xla")
        b = bin_instances(splats, cap, W, H, TW, TH, expand=mode)
        n = int(a.num_instances)
        assert n > 0 and n <= cap
        assert int(b.num_instances) == n
        assert int(b.num_rows) == int(a.num_rows)
        np.testing.assert_array_equal(np.asarray(a.tile_id),
                                      np.asarray(b.tile_id))
        np.testing.assert_array_equal(np.asarray(a.gauss_id)[:n],
                                      np.asarray(b.gauss_id)[:n])
        np.testing.assert_array_equal(np.asarray(a.emit_slot)[:n],
                                      np.asarray(b.emit_slot)[:n])
        np.testing.assert_array_equal(np.asarray(a.tile_start),
                                      np.asarray(b.tile_start))
        np.testing.assert_array_equal(np.asarray(a.tile_count),
                                      np.asarray(b.tile_count))
        np.testing.assert_array_equal(np.asarray(a.offsets),
                                      np.asarray(b.offsets))


@pytest.mark.parametrize("mode", ["pallas", "full"])
def test_expand_pallas_overflow_truncates_like_xla(mode):
    """At an overflowing capacity both builds truncate to the
    same deterministic prefix and report the same true demand."""
    cam, splats, colors, op, unc, W, H = _scene(1)
    cap = 4096
    a = bin_instances(splats, cap, W, H, TW, TH, expand="xla")
    b = bin_instances(splats, cap, W, H, TW, TH, expand=mode)
    assert int(a.num_instances) == int(b.num_instances)
    assert int(overflow_demand(a)) == int(overflow_demand(b))
    n = min(int(a.num_instances), cap)
    np.testing.assert_array_equal(np.asarray(a.tile_id),
                                  np.asarray(b.tile_id))
    np.testing.assert_array_equal(np.asarray(a.gauss_id)[:n],
                                  np.asarray(b.gauss_id)[:n])
    np.testing.assert_array_equal(np.asarray(a.offsets),
                                  np.asarray(b.offsets))
