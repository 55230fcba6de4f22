"""Sharded rendering and training over a (data, tiles) mesh.

Design (SURVEY.md §7 step 7, tuned to how a tile rasterizer actually
shards):

* the image's tile grid is split into contiguous **bands of tile rows**
  along the ``tiles`` axis; each device runs the Pallas kernels on its
  band only (the per-tile instance lists are already independent);
* rendered images stay **band-local**: the GScream losses are evaluated
  by :mod:`.band_loss` with an 8-row halo ``ppermute`` plus ~20 psum'd
  scalars, so the per-view all-reduce volume is O(W·halo), not O(H·W);
* per-gaussian gradients come back through the local backward kernel +
  local ``segment_sum``; differentiating the ``shard_map`` with replicated
  parameter inputs inserts the cross-device gradient psum automatically —
  the collective the reference's single-GPU ``atomicAdd`` never needed;
* views are sharded along ``data``; losses are ``pmean`` over the axis.

Everything is deterministic: tile→device assignment is static, reductions
are tree psums, no atomics anywhere.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..cameras import Camera
from ..config import OptimConfig
from ..model.scaffold import ScaffoldConfig, ScaffoldState, decode
from ..ops.binning import bin_instances, overflow_demand
from ..ops.projection import preprocess
from ..ops import rasterize_tiled as rt
from ..ops.rasterize_tiled import ILANES, PIX, TILE_H, TILE_W, TiledOut
from .mesh import DATA_AXIS, TILE_AXIS


def _band_geometry(width: int, height: int, n_bands: int):
    gx = -(-width // TILE_W)
    gy = -(-height // TILE_H)
    gy_pad = -(-gy // n_bands) * n_bands
    rows_per_band = gy_pad // n_bands
    return gx, gy, gy_pad, rows_per_band


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def rasterize_band(mean2d, conic, opacity, colors, depth, unc,
                   binning, bg, width: int, height: int, n_bands: int,
                   interpret: bool):
    """Rasterize only this device's band of tile rows (inside shard_map).

    Returns a **band-local** TiledOut whose images cover this band's
    ``rows_per_band·TILE_H`` pixel rows only (the last band may extend past
    ``height`` with empty padding rows).  The band index comes from
    ``jax.lax.axis_index(TILE_AXIS)``; no cross-band collective is issued
    here — callers reduce losses via :mod:`.band_loss`.
    """
    out, _ = _band_fwd(mean2d, conic, opacity, colors, depth, unc,
                       binning, bg, width, height, n_bands, interpret)
    return out


def _band_slices(binning, gx, rows_per_band, band):
    start_tile = band * rows_per_band * gx
    n_local = rows_per_band * gx
    ts = jax.lax.dynamic_slice(binning.tile_start, (start_tile,), (n_local,))
    tc = jax.lax.dynamic_slice(binning.tile_count, (start_tile,), (n_local,))
    return ts, tc, n_local


def _band_fwd(mean2d, conic, opacity, colors, depth, unc, binning, bg,
              width, height, n_bands, interpret):
    return _band_fwd_at(jax.lax.axis_index(TILE_AXIS), mean2d, conic,
                        opacity, colors, depth, unc, binning, bg, width,
                        height, n_bands, interpret)


def _band_fwd_at(band, mean2d, conic, opacity, colors, depth, unc, binning,
                 bg, width, height, n_bands, interpret):
    """Band forward with an EXPLICIT band index — lets a single chip
    compile and run the true Mosaic band kernels (local tile windows,
    tile_base offsets, boundary head-skip DMA) outside shard_map; the
    hardware check scripts/band_hw_check.py iterates it over all bands
    and asserts equality with the full-frame path (VERDICT r3 item 5)."""
    gx, gy, gy_pad, rows_per_band = _band_geometry(width, height, n_bands)
    # legacy packing carries tile-local polynomial coefficients computed
    # from each instance's *global* tile id; raw mode derives them
    # in-kernel from the global tile id = tile_base + program_id, so the
    # band's first global tile rides in as the scalar-prefetch tile_base
    inst = rt.pack_instance_data(mean2d, conic, opacity, colors, depth,
                                 unc, binning, gx)
    ts, tc, n_local = _band_slices(binning, gx, rows_per_band, band)
    tile_base = (band * rows_per_band * gx).astype(jnp.int32)[None]
    tiles = rt._run_forward(inst, ts, tc, n_local, interpret, gx,
                            tile_base=tile_base)  # (L,8,PIX)

    # local band tiles → band image (no cross-band collective; the width
    # is cropped).  Rows past ``height`` on the last band are zeroed: the
    # tile kernel renders them, but the losses' zero-pad SSIM windows and
    # the halo exchange must see exactly what a full-frame crop would.
    band_img = tiles.reshape(rows_per_band, gx, 8, TILE_H, TILE_W)
    img = band_img.transpose(2, 0, 3, 1, 4).reshape(
        8, rows_per_band * TILE_H, gx * TILE_W)[:, :, :width]
    bh = rows_per_band * TILE_H
    grow = band * bh + jnp.arange(bh)
    img = img * (grow < height).astype(jnp.float32)[None, :, None]
    # kernel row layout: 1..5 = r,g,b,depth,unc sums, 6 = final T
    raw_c = img[1:4]
    t_img = img[6]
    color = raw_c + t_img[None] * bg[:, None, None]
    out = TiledOut(color=color.transpose(1, 2, 0), depth=img[4],
                   uncertainty=img[5], final_t=t_img)
    res = (inst, binning, bg, raw_c, img[4], img[5], t_img,
           mean2d, conic, opacity)
    return out, res


def _band_bwd(width, height, n_bands, interpret, res, g: TiledOut):
    return _band_bwd_at(jax.lax.axis_index(TILE_AXIS), width, height,
                        n_bands, interpret, res, g)


def _band_bwd_at(band, width, height, n_bands, interpret, res, g: TiledOut):
    """Band backward with an explicit band index (see _band_fwd_at)."""
    (inst, binning, bg, raw_c, d_img, u_img, t_img,
     mean2d, conic, opacity) = res
    n_gauss = mean2d.shape[0]
    gx, gy, gy_pad, rows_per_band = _band_geometry(width, height, n_bands)

    # the forward output is band-local, so the incoming cotangent already
    # is too — no collective here at all
    g_color = g.color.transpose(2, 0, 1)               # (3, bh, W)
    gtt_img = (jnp.einsum('c,chw->hw', bg, g_color) + g.final_t) * t_img
    total_img = (jnp.einsum('chw,chw->hw', raw_c, g_color)
                 + d_img * g.depth + u_img * g.uncertainty)
    pix = jnp.stack([g_color[0], g_color[1], g_color[2], g.depth,
                     g.uncertainty, total_img, gtt_img,
                     jnp.zeros_like(d_img)], axis=0)   # (8, bh, W)
    # transpose of the forward's zeroing of rows past ``height``
    bh = rows_per_band * TILE_H
    grow = band * bh + jnp.arange(bh)
    pix = pix * (grow < height).astype(jnp.float32)[None, :, None]
    pix = jnp.pad(pix, ((0, 0), (0, 0), (0, gx * TILE_W - width)))
    pix_tiles = pix.reshape(8, rows_per_band, TILE_H, gx, TILE_W)
    pix_tiles = pix_tiles.transpose(1, 3, 0, 2, 4).reshape(
        rows_per_band * gx, 8, PIX)

    ts, tc, n_local = _band_slices(binning, gx, rows_per_band, band)
    tile_base = (band * rows_per_band * gx).astype(jnp.int32)[None]
    raw = rt._run_backward(inst, pix_tiles, ts, tc, n_local, interpret,
                           gx, tile_base=tile_base)
    cap = binning.gauss_id.shape[0]
    # the kernel centers moments in-kernel and zero-fills past its last
    # local tile, but slots of *earlier* bands' tiles on this device are
    # uninitialized — mask everything outside this band's slot range
    # (grad rows are packed 8 instances/row; the reshape recovers them)
    n_tiles_real = gx * gy
    slot_band = binning.tile_id // (rows_per_band * gx)
    valid = (binning.tile_id < n_tiles_real) & (slot_band == band)

    # band-masked rows reduce to zero, so the Pallas segment reducers are
    # directly applicable per band (partials psum'd by the shard_map
    # transpose)
    if rt._reorder_mode() == "cm":
        per_gauss = rt.reduce_grads_cm(raw, binning, n_gauss, interpret,
                                       valid=valid)
    else:
        conv = jnp.where(valid[:, None], raw.reshape(-1, ILANES)[:cap], 0.0)
        per_gauss = rt.segment_reduce_grads(conv, binning, n_gauss,
                                            interpret)
    d_mean2d, d_conic, d_op, d_col, d_depth, d_unc = rt.pergauss_chain(
        per_gauss, mean2d, conic, opacity)
    # cotangents are partial (this band only); the outer shard_map
    # transpose inserts the psum over TILE_AXIS for replicated inputs
    d_bg = jnp.einsum('hw,chw->c', t_img, g_color)
    d_binning = jax.tree.map(
        lambda x: (np.zeros(x.shape, jax.dtypes.float0)
                   if jnp.issubdtype(x.dtype, jnp.integer)
                   else jnp.zeros(x.shape, x.dtype)), binning)
    return (d_mean2d, d_conic, d_op, d_col, d_depth, d_unc, d_binning, d_bg)


rasterize_band.defvjp(_band_fwd, _band_bwd)


def render_view_sharded(scaffold: ScaffoldState, camera: Camera, bg,
                        cfg: ScaffoldConfig, capacity: int, n_bands: int,
                        interpret: bool, screen_zero=None):
    """decode → preprocess → bin → band-rasterize (call inside shard_map).

    ``screen_zero`` is the densification screen-gradient probe: a zero
    (C·k, 2) tensor added to the projected means whose cotangent is the
    per-gaussian screen-space gradient (the reference's
    ``screenspace_points`` retain_grad trick,
    gaussian_renderer/__init__.py:124-128) — identical to the
    single-device :func:`gscream_tpu.train.step.render_from_params`.
    """
    dec = decode(scaffold, camera.cam_center, None, cfg)
    splats = preprocess(
        dec.xyz, dec.scale, dec.rot, camera.w2c, camera.full_proj,
        camera.width, camera.height, camera.tan_fovx, camera.tan_fovy,
        tile_w=TILE_W, tile_h=TILE_H, active_mask=dec.active,
        opacity=dec.opacity)
    mean2d = (splats.mean2d if screen_zero is None
              else splats.mean2d + screen_zero)
    gx, gy, gy_pad, _ = _band_geometry(camera.width, camera.height, n_bands)
    binning = rt.build_binning(
        splats, dec.opacity, dec.color, dec.uncertainty, capacity,
        camera.width, camera.height, interpret=interpret)
    # pad the tile-range arrays to the banded grid.  Pad tiles carry
    # start = end of the last REAL tile (count=0), NOT start=0: the
    # backward kernel's sentinel pass zero-fills grad_hbm from the LAST
    # grid tile's start+count to the end of the buffer, so a 0-start pad
    # tile as the last tile of a band would wipe every gradient row the
    # band just wrote (silent zero gradients whenever gy % n_bands != 0),
    # while the real end keeps the sentinel-slot zeroing identical to the
    # unpadded grid.
    pad_tiles = gy_pad * gx - gy * gx
    if pad_tiles:
        end = binning.tile_start[-1] + binning.tile_count[-1]
        binning = binning._replace(
            tile_start=jnp.concatenate(
                [binning.tile_start,
                 jnp.full((pad_tiles,), 1, jnp.int32) * end]),
            tile_count=jnp.concatenate(
                [binning.tile_count,
                 jnp.zeros((pad_tiles,), jnp.int32)]))
    out = rasterize_band(mean2d, splats.conic, dec.opacity,
                         dec.color, splats.depth, dec.uncertainty,
                         binning, bg, camera.width, camera.height,
                         n_bands, interpret)
    return out, dec, splats, binning


def make_sharded_loss(mesh, cfg: ScaffoldConfig, opt: OptimConfig,
                      capacity: int, width: int, height: int,
                      interpret: bool):
    """Build loss(params_tree, view_batch) sharded over (data, tiles).

    view_batch is a pytree of arrays with leading dim = mesh data size:
    (w2c, full_proj, cam_center, tan_fovx, tan_fovy, image, mask, depth,
    is_ref, fg_box).  ``is_ref`` is a per-view (B,) bool; ``fg_box`` the
    per-view (B,H,W) random-box mask of the ref-view fg depth term.
    Differentiating the returned function yields correctly psum'd grads.

    This is the render+loss core only (used by the loss-parity tests);
    :func:`make_sharded_train_step` carries the full training semantics
    (cross-attention, densification statistics, optimizers).
    """
    n_bands = mesh.shape[TILE_AXIS]

    def local_fn(params, mlps, alive, xyz_max, w2c, fproj, center, tfx,
                 tfy, image, mask, mono, is_ref, fg_box):
        from .band_loss import band_loss_terms
        cam = Camera(w2c=w2c[0], full_proj=fproj[0], cam_center=center[0],
                     tan_fovx=tfx[0], tan_fovy=tfy[0],
                     width=width, height=height)
        scaffold = ScaffoldState(params=params, mlps=mlps, alive=alive,
                                 xyz_max=xyz_max)
        bg = jnp.zeros(3, jnp.float32)
        out, dec, splats, binning = render_view_sharded(
            scaffold, cam, bg, cfg, capacity, n_bands, interpret)
        _, _, _, rows_per_band = _band_geometry(width, height, n_bands)
        row0 = jax.lax.axis_index(TILE_AXIS) * rows_per_band * TILE_H
        # band-local loss: after its internal psums the value is identical
        # on every band device, so only the data axis needs a pmean
        loss, l1 = band_loss_terms(
            out, row0, image[0], mask[0], mono[0], fg_box[0], opt,
            is_ref[0], height, width, TILE_AXIS, n_bands)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        return loss

    in_specs = (P(), P(), P(), P()) + (P(DATA_AXIS),) * 10
    sharded = shard_map(local_fn, mesh=mesh, in_specs=in_specs,
                        out_specs=P(), check_vma=False)

    def loss_fn(params, mlps, alive, xyz_max, batch):
        return sharded(params, mlps, alive, xyz_max, *batch)

    return loss_fn


def sharded_view_batch(views, fg_boxes=None, is_ref=None, cross_boxes=None,
                       cross_enable=None):
    """Stack per-view host data into the 12-tuple batch the sharded step
    consumes.  ``views`` carry camera/image/mask/depth as attributes OR
    dict keys (the training loop's device-view records); the remaining
    entries default to the phase-1 values (no ref view, no cross-attn)."""
    def fld(v, name):
        return v[name] if isinstance(v, dict) else getattr(v, name)

    B = len(views)
    cams = [fld(v, "camera") for v in views]
    h, w = cams[0].height, cams[0].width
    return (
        jnp.stack([c.w2c for c in cams]),
        jnp.stack([c.full_proj for c in cams]),
        jnp.stack([c.cam_center for c in cams]),
        jnp.stack([jnp.asarray(c.tan_fovx) for c in cams]),
        jnp.stack([jnp.asarray(c.tan_fovy) for c in cams]),
        jnp.stack([jnp.asarray(fld(v, "image")) for v in views]),
        jnp.stack([jnp.asarray(fld(v, "mask")) for v in views]),
        jnp.stack([jnp.asarray(fld(v, "depth")) for v in views]),
        jnp.asarray(is_ref if is_ref is not None else [False] * B),
        jnp.stack([jnp.asarray(b) for b in fg_boxes]) if fg_boxes
        else jnp.zeros((B, h, w), jnp.float32),
        jnp.stack([jnp.asarray(b, jnp.int32) for b in cross_boxes])
        if cross_boxes else jnp.zeros((B, 4), jnp.int32),
        jnp.asarray(cross_enable, jnp.float32) if cross_enable is not None
        else jnp.zeros((B,), jnp.float32),
    )


def make_sharded_train_step(mesh, cfg: ScaffoldConfig, opt: OptimConfig,
                            capacity: int, width: int, height: int,
                            interpret: bool, *, white_bg: bool = False,
                            spatial_lr_scale: float = 1.0):
    """Full SPMD training step over a (data, tiles) mesh.

    Returns ``step(ts, batch, use_crossattn=False, feat_frozen=False,
    accumulate=False)`` — a jitted function with the three phase flags
    static — carrying the COMPLETE GScream iteration semantics of
    :func:`gscream_tpu.train.step.train_step` (reference train.py:390-616):
    per-view ``is_ref`` loss selection, the ref-view fg-box depth term,
    cross-attention token sampling + EMA feature writes + per-view
    ``cross_ok`` gating, densification statistics from per-view
    screen-space gradients, masked dual-Adam updates, and the instance
    count for the caller's capacity-overflow retry.

    ``batch`` is the 12-tuple of :func:`sharded_view_batch`: per-view
    arrays with leading dim B = mesh data size
    (w2c, full_proj, cam_center, tan_fovx, tan_fovy, image (B,3,H,W),
    mask (B,1,H,W), mono_depth (B,1,H,W), is_ref (B,) bool,
    fg_box (B,H,W), cross_box (B,4) int32, cross_enable (B,)).

    Batch semantics (B > 1): one step evaluates B reference iterations
    from the SAME pre-step state — per-view losses averaged over gated
    views (a view whose cross-attention sampling degenerates is dropped,
    the reference's ``except: continue``, train.py:519-523), densify
    stats summed over views, EMA feature deltas summed (disjoint sampled
    index sets in practice), one Adam application.  For B = 1 this is
    step-equivalent to the single-device ``train_step`` (asserted by
    ``tests/test_sharded.py::test_trajectory_matches_single_device``).
    """
    import functools

    from ..model.densify import accumulate_stats
    from ..model.scaffold import AnchorParams, MLPParams
    from ..ops.projection import preprocess as _pre
    from ..train.state import apply_adam, broadcast_group, lr_tree
    from ..train.step import StepAux, crossattn_update, sample_cross_tokens
    from .band_loss import band_loss_terms

    n_bands = mesh.shape[TILE_AXIS]
    B = mesh.shape[DATA_AXIS]
    C, k = cfg.capacity, cfg.n_offsets
    bg = (jnp.ones(3, jnp.float32) if white_bg
          else jnp.zeros(3, jnp.float32))
    max_tokens = min(opt.crossattn_max_tokens, C)

    def make_local(use_crossattn):
        def local_fn(params, mlps, alive, xyz_max, feat_b, screen_zero_b,
                     gate_b, w2c, fproj, center, tfx, tfy, image, mask,
                     mono, is_ref_b, fg_box_b):
            cam = Camera(w2c=w2c[0], full_proj=fproj[0],
                         cam_center=center[0], tan_fovx=tfx[0],
                         tan_fovy=tfy[0], width=width, height=height)
            p = params._replace(feat=feat_b[0]) if use_crossattn else params
            scaffold = ScaffoldState(params=p, mlps=mlps, alive=alive,
                                     xyz_max=xyz_max)
            out, dec, splats, binning = render_view_sharded(
                scaffold, cam, bg, cfg, capacity, n_bands, interpret,
                screen_zero=screen_zero_b[0])
            _, _, _, rows_per_band = _band_geometry(width, height, n_bands)
            row0 = jax.lax.axis_index(TILE_AXIS) * rows_per_band * TILE_H
            loss_v, l1_v = band_loss_terms(
                out, row0, image[0], mask[0], mono[0], fg_box_b[0], opt,
                is_ref_b[0], height, width, TILE_AXIS, n_bands)
            # gated mean over the data axis: views whose cross-attention
            # sampling degenerated contribute nothing (ref: skipped iter).
            # The REPORTED loss/l1 are the ungated means — the
            # single-device step also computes and logs the loss of a
            # cross_ok=False iteration, it only masks the update.
            g = gate_b[0]
            gsum = jnp.maximum(jax.lax.psum(g, DATA_AXIS), 1.0)
            loss = jax.lax.psum(g * loss_v, DATA_AXIS) / gsum
            B_ = jax.lax.psum(1.0, DATA_AXIS)
            loss_rep = jax.lax.psum(loss_v, DATA_AXIS) / B_
            l1 = jax.lax.psum(l1_v, DATA_AXIS) / B_
            # densification aux (identical on every band device of a view)
            gauss_valid = (dec.active & (splats.radius > 0)).reshape(C, k)
            n_active = jnp.sum(dec.active.astype(jnp.int32))
            # overflow_demand: instance count ∨ 2·row-table rows — one
            # capacity-comparable number for the caller's tier retry
            return (loss, loss_rep, l1, overflow_demand(binning)[None],
                    n_active[None], dec.neural_opacity[None],
                    gauss_valid[None])
        return local_fn

    def make_sharded(use_crossattn):
        in_specs = (P(), P(), P(), P()) + (P(DATA_AXIS),) * 13
        out_specs = (P(), P(), P(), P(DATA_AXIS), P(DATA_AXIS),
                     P(DATA_AXIS), P(DATA_AXIS))
        return shard_map(make_local(use_crossattn), mesh=mesh,
                         in_specs=in_specs, out_specs=out_specs,
                         check_vma=False)

    @functools.partial(jax.jit, static_argnames=(
        "use_crossattn", "feat_frozen", "accumulate"))
    def step(ts, batch, use_crossattn: bool = False,
             feat_frozen: bool = False, accumulate: bool = False):
        (w2c, fproj, center, tfx, tfy, image, mask, mono,
         is_ref, fg_box, cross_box, cross_enable) = batch
        sc = ts.scaffold
        key, k_cross = jax.random.split(ts.key)
        step1 = ts.step + 1
        sharded = make_sharded(use_crossattn)

        # --- per-view anchor prefilter (vmapped; replicated params) ------
        need_prefilter = accumulate or use_crossattn
        if need_prefilter:
            anchor_scales = jnp.exp(sc.params.scaling[:, :3])
            rot_n = sc.params.rotation / jnp.maximum(
                jnp.linalg.norm(sc.params.rotation, axis=1, keepdims=True),
                1e-12)

            def prefilter_one(w2c_v, fproj_v, tfx_v, tfy_v):
                pre = _pre(sc.params.anchor, anchor_scales, rot_n, w2c_v,
                           fproj_v, width, height, tfx_v, tfy_v,
                           tile_w=TILE_W, tile_h=TILE_H,
                           active_mask=sc.alive)
                return pre.mean2d, pre.radius

            mean2d_b, radius_b = jax.vmap(prefilter_one)(w2c, fproj,
                                                         tfx, tfy)
            anchor_visible_b = (radius_b > 0) & sc.alive[None]

        if use_crossattn:
            # per-view token sampling; the PRNG convention matches the
            # single-device step: view j of a batch uses fold_in(k, j)
            def sample_one(i, m2d, rad, mask_v, box_v):
                kv = jax.random.fold_in(k_cross, i)
                return sample_cross_tokens(
                    kv, m2d[:, 0], m2d[:, 1], rad > 0, sc.alive,
                    mask_v[0], box_v, width, height, max_tokens)

            fg_idx, bg_idx, fg_valid, bg_valid, ok = jax.vmap(sample_one)(
                jnp.arange(B), mean2d_b, radius_b, mask, cross_box)
            act = cross_enable > 0          # per-view crossattn enable
            ok_act = ok & act
            # a crossattn-enabled view that failed sampling is dropped;
            # a crossattn-disabled view trains normally
            gate = jnp.where(act, ok_act.astype(jnp.float32), 1.0)
        else:
            gate = jnp.ones((B,), jnp.float32)

        def loss_fn(params, mlps, screen_zero_b):
            if use_crossattn:
                def upd(fi, bi, fv, bv, ir, okv):
                    return crossattn_update(
                        mlps, params.feat, fi, bi, fv, bv,
                        opt.crossattn_feat_update_ema, ir, okv)
                feat_b = jax.vmap(upd)(fg_idx, bg_idx, fg_valid, bg_valid,
                                       is_ref, ok_act)        # (B,C,F)
            else:
                feat_b = jnp.zeros((B, 1, 1), jnp.float32)    # placeholder
            loss, loss_rep, l1, ninst, nact, nop, gvalid = sharded(
                params, mlps, sc.alive, sc.xyz_max, feat_b, screen_zero_b,
                gate, w2c, fproj, center, tfx, tfy, image, mask,
                mono, is_ref, fg_box)
            return loss, (loss_rep, l1, ninst, nact, nop, gvalid, feat_b)

        screen_zero_b = jnp.zeros((B, C * k, 2), jnp.float32)
        (loss, aux), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True)(
                sc.params, sc.mlps, screen_zero_b)
        loss_rep, l1, ninst_b, nact_b, nop_b, gvalid_b, feat_b = aux
        g_anchor, g_mlps, g_screen_b = grads

        # --- densification stats: B sequential-iteration-equivalent ------
        stats = ts.stats
        if accumulate:
            ndc_scale = jnp.array([0.5 * width, 0.5 * height])
            # the differentiated loss is the GATE-AVERAGED batch mean, so
            # d(loss)/d(screen_zero_b[v]) = (g_v/gsum)·d(loss_v)/d(screen);
            # rescale by gsum/g_v (= gsum for g∈{0,1}) to recover each
            # view's own screen gradient, and gate a dropped view's stat
            # contributions off entirely (the reference skips the whole
            # iteration, train.py:519-523)
            gsum_all = jnp.maximum(jnp.sum(gate), 1.0)
            for v in range(B):
                g_v = gate[v] > 0
                grad_norm = jnp.linalg.norm(
                    g_screen_b[v] * ndc_scale, axis=1).reshape(C, k) \
                    * gsum_all
                stats = accumulate_stats(
                    stats, nop_b[v], grad_norm,
                    gvalid_b[v] & g_v, anchor_visible_b[v] & g_v)

        # --- main optimizer (masks identical to train_step) --------------
        anchor_lrs, mlp_lrs = lr_tree(step1, opt, spatial_lr_scale)
        lr_full = (broadcast_group(anchor_lrs, sc.params),
                   broadcast_group(mlp_lrs, sc.mlps))
        if use_crossattn:
            upd_ok = jnp.sum(gate) > 0
            anchor_mask = AnchorParams(
                anchor=upd_ok, offset=upd_ok, feat=False,
                scaling=upd_ok, rotation=False, opacity=False,
                uncertainty=False)
            mlp_mask = MLPParams(opacity=upd_ok, uncertainty=upd_ok,
                                 cov=upd_ok, color=upd_ok, crossattn=False,
                                 feat_bank=upd_ok)
        else:
            anchor_mask = AnchorParams(
                anchor=True, offset=True, feat=not feat_frozen,
                scaling=True, rotation=False, opacity=False,
                uncertainty=False)
            mlp_mask = MLPParams(opacity=True, uncertainty=True, cov=True,
                                 color=True, crossattn=False,
                                 feat_bank=True)
        mask_full = (broadcast_group(anchor_mask, sc.params),
                     broadcast_group(mlp_mask, sc.mlps))

        if use_crossattn:
            # commit the EMA feature writes: deltas summed over gated views
            # (disjoint index sets in practice; == sequential for B=1)
            new_feat = sc.params.feat + jnp.sum(
                feat_b - sc.params.feat[None], axis=0)
            params_tree = (sc.params._replace(
                feat=jax.lax.stop_gradient(new_feat)), sc.mlps)
        else:
            params_tree = (sc.params, sc.mlps)
        (new_anchor, new_mlps), new_m, new_v = apply_adam(
            params_tree, (g_anchor, g_mlps), ts.m, ts.v, lr_full, step1,
            mask_full)

        # --- cross-attention optimizer (own Adam + step count) -----------
        any_cross = jnp.bool_(False)
        step_c1 = ts.step_c
        if use_crossattn:
            any_cross = jnp.any(ok_act)
            step_c1 = ts.step_c + any_cross.astype(jnp.int32)
            ca = new_mlps.crossattn
            ca_lr = jax.tree.map(lambda _: mlp_lrs.crossattn, ca)
            ca_mask = jax.tree.map(lambda _: any_cross, ca)
            ca_new, ca_m, ca_v = apply_adam(
                ca, g_mlps.crossattn, ts.m[1].crossattn, ts.v[1].crossattn,
                ca_lr, jnp.maximum(step_c1, 1), ca_mask)
            new_mlps = new_mlps._replace(crossattn=ca_new)
            new_m = (new_m[0], new_m[1]._replace(crossattn=ca_m))
            new_v = (new_v[0], new_v[1]._replace(crossattn=ca_v))

        new_sc = sc._replace(params=new_anchor, mlps=new_mlps)
        new_ts = ts._replace(scaffold=new_sc, m=new_m, v=new_v, step=step1,
                             step_c=step_c1, stats=stats, key=key)
        from ..train.step import pack_aux
        aux_out = pack_aux(loss_rep, l1, jnp.max(ninst_b), nact_b[0],
                           any_cross)
        return new_ts, aux_out

    return step
