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
from ..ops.binning import bin_instances
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
    gx, gy, gy_pad, rows_per_band = _band_geometry(width, height, n_bands)
    band = jax.lax.axis_index(TILE_AXIS)
    # the packed rows carry tile-local polynomial coefficients computed
    # from each instance's *global* tile id, so band kernels need no
    # tile-offset plumbing — local tile_start/count slices are enough
    inst = rt.pack_instance_data(mean2d, conic, opacity, colors, depth,
                                 unc, binning, gx)
    ts, tc, n_local = _band_slices(binning, gx, rows_per_band, band)
    tiles = rt._run_forward(inst, ts, tc, n_local, interpret)  # (L,8,PIX)

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
    (inst, binning, bg, raw_c, d_img, u_img, t_img,
     mean2d, conic, opacity) = res
    n_gauss = mean2d.shape[0]
    gx, gy, gy_pad, rows_per_band = _band_geometry(width, height, n_bands)
    band = jax.lax.axis_index(TILE_AXIS)

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
    raw = rt._run_backward(inst, pix_tiles, ts, tc, n_local, interpret)
    cap = binning.gauss_id.shape[0]
    # the kernel centers moments in-kernel and zero-fills past its last
    # local tile, but slots of *earlier* bands' tiles on this device are
    # uninitialized — mask everything outside this band's slot range
    n_tiles_real = gx * gy
    slot_band = binning.tile_id // (rows_per_band * gx)
    valid = (binning.tile_id < n_tiles_real) & (slot_band == band)
    conv = jnp.where(valid[:, None], raw[:cap, :ILANES], 0.0)

    # band-masked rows reduce to zero, so the Pallas segment reducer is
    # directly applicable per band (partials psum'd by the shard_map
    # transpose)
    per_gauss = rt.segment_reduce_grads(conv, binning, n_gauss, interpret)
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
                        interpret: bool):
    """decode → preprocess → bin → band-rasterize (call inside shard_map)."""
    dec = decode(scaffold, camera.cam_center, None, cfg)
    splats = preprocess(
        dec.xyz, dec.scale, dec.rot, camera.w2c, camera.full_proj,
        camera.width, camera.height, camera.tan_fovx, camera.tan_fovy,
        tile_w=TILE_W, tile_h=TILE_H, active_mask=dec.active)
    gx, gy, gy_pad, _ = _band_geometry(camera.width, camera.height, n_bands)
    binning = bin_instances(
        splats, capacity, camera.width, camera.height, TILE_W, TILE_H,
        attrs=jax.lax.stop_gradient(rt.gauss_attrs(
            splats.mean2d, splats.conic, dec.opacity, dec.color,
            splats.depth, dec.uncertainty)))
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
    out = rasterize_band(splats.mean2d, splats.conic, dec.opacity,
                         dec.color, splats.depth, dec.uncertainty,
                         binning, bg, camera.width, camera.height,
                         n_bands, interpret)
    return out, dec, binning


def make_sharded_loss(mesh, cfg: ScaffoldConfig, opt: OptimConfig,
                      capacity: int, width: int, height: int,
                      interpret: bool, is_ref_weighting: bool = False):
    """Build loss(params_tree, view_batch) sharded over (data, tiles).

    view_batch is a pytree of arrays with leading dim = mesh data size:
    (w2c, full_proj, cam_center, tan_fovx, tan_fovy, image, mask, depth).
    Differentiating the returned function yields correctly psum'd grads.
    """
    n_bands = mesh.shape[TILE_AXIS]

    def local_fn(params, mlps, alive, xyz_max, w2c, fproj, center, tfx,
                 tfy, image, mask, mono):
        from .band_loss import band_loss_terms
        cam = Camera(w2c=w2c[0], full_proj=fproj[0], cam_center=center[0],
                     tan_fovx=tfx[0], tan_fovy=tfy[0],
                     width=width, height=height)
        scaffold = ScaffoldState(params=params, mlps=mlps, alive=alive,
                                 xyz_max=xyz_max)
        bg = jnp.zeros(3, jnp.float32)
        out, dec, binning = render_view_sharded(
            scaffold, cam, bg, cfg, capacity, n_bands, interpret)
        _, _, _, rows_per_band = _band_geometry(width, height, n_bands)
        row0 = jax.lax.axis_index(TILE_AXIS) * rows_per_band * TILE_H
        # band-local loss: after its internal psums the value is identical
        # on every band device, so only the data axis needs a pmean
        loss, l1 = band_loss_terms(
            out, row0, image[0], mask[0], mono[0],
            jnp.zeros((height, width)), opt, is_ref_weighting,
            height, width, TILE_AXIS, n_bands)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        return loss

    in_specs = (P(), P(), P(), P(),
                P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS))
    sharded = shard_map(local_fn, mesh=mesh, in_specs=in_specs,
                        out_specs=P(), check_vma=False)

    def loss_fn(params, mlps, alive, xyz_max, batch):
        return sharded(params, mlps, alive, xyz_max, *batch)

    return loss_fn


def make_sharded_train_step(mesh, cfg: ScaffoldConfig, opt: OptimConfig,
                            capacity: int, width: int, height: int,
                            interpret: bool):
    """Full SPMD training step: sharded loss grad + replicated Adam."""
    loss_fn = make_sharded_loss(mesh, cfg, opt, capacity, width, height,
                                interpret)
    from ..train.state import apply_adam, broadcast_group, lr_tree

    @jax.jit
    def step(ts, batch):
        sc = ts.scaffold
        (loss), grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            sc.params, sc.mlps, sc.alive, sc.xyz_max, batch)
        step1 = ts.step + 1
        anchor_lrs, mlp_lrs = lr_tree(step1, opt, 1.0)
        lr_full = (broadcast_group(anchor_lrs, sc.params),
                   broadcast_group(mlp_lrs, sc.mlps))
        (new_p, new_mlps), new_m, new_v = apply_adam(
            (sc.params, sc.mlps), grads, ts.m, ts.v, lr_full, step1)
        return ts._replace(
            scaffold=sc._replace(params=new_p, mlps=new_mlps),
            m=new_m, v=new_v, step=step1), loss

    return step
