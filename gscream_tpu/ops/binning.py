"""Tile binning: per-gaussian tile rects → depth-sorted per-tile instance lists.

TPU-native replacement for the reference's CUB pipeline
(``rasterizer_impl.cu:199-347``): prefix-sum of ``tiles_touched``,
``duplicateWithKeys`` 64-bit key emission, radix sort, ``identifyTileRanges``.

Design for XLA (static shapes, SURVEY.md §7 hard part 2):

* instance *emission* is inverted — instead of each gaussian scattering a
  variable number of records, every output slot finds its source gaussian
  via a boundary scatter + running max over the exclusive prefix sum of
  rect areas.  Slot order is identical to the reference's emission order
  (gaussian-major, row-major within each rect, rasterizer_impl.cu:70-111);
* **row-tight emission** (default when the preprocess ran with tight
  culling): each tile *row* of a rect only emits the x-extent of the
  ``α ≥ 1/255`` iso-ellipse over that row's pixel band — a strict subset
  of the rect that cuts the ellipse's corners (large for the thin rotated
  gaussians densification produces).  Dropped (gaussian, tile) pairs have
  ``α < 1/255`` at every pixel of the tile, which the blend kernels skip
  (forward.cu:536) — rendered output and gradients are unchanged while
  every capacity-shaped cost (sorts, pack, kernels, reducer) shrinks.
  Escape hatch: GSCREAM_ROW_TIGHT=0 falls back to full-rect emission;
* the 64-bit ``tile<<32|depth`` radix sort becomes one stable
  lexicographic (tile, depth-bits) sort — same resulting order — with an
  optional packed single-key fast mode (quantized depth);
* capacity is static; overflow is *reported*, never silent (the caller can
  retry with the next capacity tier).  Row-tight mode also needs a row
  table of static size ``capacity // ROW_RATIO``; ``num_rows`` reports its
  true demand, and :func:`overflow_demand` folds both checks into one
  number comparable against ``capacity``.  ROW_RATIO (GSCREAM_ROW_RATIO,
  default 2 ≈ mean tiles per rect row) trades instance-capacity headroom
  against row-table headroom: scenes dominated by thin 1-tile-wide rows
  can drop it to 1 so row demand stops inflating the fitted capacity tier.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .projection import Splats

# instance-slots per row-table slot (the row table is sized
# capacity // ROW_RATIO).  2 matches the observed mean row width of
# SPIN-scale scenes; ADVICE r3: thin-gaussian-heavy scenes whose mean rect
# row covers <2 tiles can set GSCREAM_ROW_RATIO=1 so the doubled row
# demand in overflow_demand stops sizing every capacity-shaped cost.
ROW_RATIO = max(int(os.environ.get("GSCREAM_ROW_RATIO", "2")), 1)


def row_table_size(capacity: int) -> int:
    """Static row-table length used by row-tight emission at ``capacity``."""
    return capacity // ROW_RATIO


class Binning(NamedTuple):
    gauss_id: jnp.ndarray    # (capacity,) int32 source gaussian per instance slot
    tile_id: jnp.ndarray     # (capacity,) int32 sorted tile per slot (num_tiles = invalid)
    tile_start: jnp.ndarray  # (num_tiles,) int32 first slot of each tile
    tile_count: jnp.ndarray  # (num_tiles,) int32 instances in each tile
    num_instances: jnp.ndarray  # () int32 total emitted (may exceed capacity!)
    emit_slot: jnp.ndarray   # (capacity,) int32 emission index of each sorted slot
    offsets: jnp.ndarray     # (N+1,) int32 emission range starts per gaussian
    num_rows: Any = 0        # () int32 row-table demand of row-tight mode
                             # (may exceed capacity//2!); 0 in full-rect mode
    attrs: Any = None        # optional (capacity, n_attr) f32 — per-gaussian
                             # attributes carried through the sort as payload
                             # operands (streams; a post-sort row gather of
                             # the same data costs ~2x, profiled round 1)
    cols16: Any = None       # optional (16, capacity) f32 dense sorted
                             # attribute rows from the Pallas emission
                             # pipeline (emission.py) — pack_instance_data
                             # shuffles them straight into packed rows


def overflow_demand(binning: Binning) -> jnp.ndarray:
    """Smallest capacity at which this emission would NOT overflow.

    Instances need ``capacity >= num_instances``; the row-tight row table
    is sized ``capacity // ROW_RATIO``, so rows need
    ``capacity >= ROW_RATIO * num_rows``.  Compare against the static
    capacity used (and size retry tiers from it) exactly like
    ``num_instances`` alone was used before.
    """
    return jnp.maximum(binning.num_instances, ROW_RATIO * binning.num_rows)


def num_tiles(width: int, height: int, tile_w: int, tile_h: int) -> int:
    return (-(-width // tile_w)) * (-(-height // tile_h))


def _bits(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _f32(x):
    return jax.lax.bitcast_convert_type(x, jnp.float32)


def _row_extents(rslot, r_off, r_ymin, r_xmin, r_xmax,
                 mx, my, ca, cb, cc, t2, total_rows, tile_w: int,
                 tile_h: int):
    """Per tile-row [txmin, txmax) covering of the α ≥ 1/255 iso-ellipse.

    Kernel pixels evaluate ``α = op·exp(-½ dᵀCd)`` at integer (x, y)
    (C = conic, d = pixel − mean); α ≥ 1/255 ⇔ dᵀCd ≤ 2t with
    t = ln(255·op) (+2% guard, applied in the preprocess).  For tile row
    ``ty`` the pixel band is dy ∈ [ty·th − my, ty·th + th − 1 − my]; the
    in-band x-extent of the ellipse is

        dx⁺(dy) = (−b·dy + √D)/a,  D = 2t·a − q·dy²,  q = ac − b²,

    maximised over the band.  dx⁺ is concave on its support, so the band
    max is ``max(dx⁺(l), dx⁺(u))`` unless the unconstrained maximiser
    dy* = −b·√(2t/(c·q)) lies inside, where it equals the bbox half-width
    hx = √(2t·c/q) (= √(2t·Σxx), the tight-cull box of projection.py).
    The left side is the mirror image.  Guards: the band is widened ±¼ px
    and the vertex test by ±1 px — both only ever ADD tiles, so f32
    roundoff can never drop a pixel with α ≥ 1/255; the result is then
    intersected with the (already tight) rect.
    """
    f = jnp.float32
    ty = r_ymin + (rslot - r_off)
    lo = ty.astype(f) * f(tile_h) - my - f(0.25)
    hi = lo + f(tile_h - 1) + f(0.5)
    q = ca * cc - cb * cb
    qs = jnp.maximum(q, 1e-20)
    cs = jnp.maximum(cc, 1e-20)
    a_s = jnp.maximum(ca, 1e-20)
    hx = jnp.sqrt(jnp.maximum(t2 * cs / qs, 0.0))
    hy = jnp.sqrt(jnp.maximum(t2 * a_s / qs, 0.0))
    lc = jnp.maximum(lo, -hy)
    uc = jnp.minimum(hi, hy)

    def sqrt_d(dy):
        return jnp.sqrt(jnp.maximum(t2 * ca - q * dy * dy, 0.0))

    dxp_l = (-cb * lc + sqrt_d(lc)) / a_s
    dxp_u = (-cb * uc + sqrt_d(uc)) / a_s
    dxm_l = (-cb * lc - sqrt_d(lc)) / a_s
    dxm_u = (-cb * uc - sqrt_d(uc)) / a_s
    dyv = -cb * jnp.sqrt(jnp.maximum(t2 / (cs * qs), 0.0))
    xhi = jnp.maximum(dxp_l, dxp_u)
    xhi = jnp.where((dyv >= lc - 1.0) & (dyv <= uc + 1.0),
                    jnp.maximum(xhi, hx), xhi)
    xlo = jnp.minimum(dxm_l, dxm_u)
    xlo = jnp.where((-dyv >= lc - 1.0) & (-dyv <= uc + 1.0),
                    jnp.minimum(xlo, -hx), xlo)

    txmin = jnp.maximum(jnp.floor((mx + xlo - 0.25) / tile_w),
                        r_xmin.astype(f)).astype(jnp.int32)
    txmax = jnp.minimum(jnp.floor((mx + xhi + 0.25) / tile_w) + 1.0,
                        r_xmax.astype(f)).astype(jnp.int32)
    tight = t2 > 0.0
    txmin = jnp.where(tight, txmin, r_xmin)
    txmax = jnp.where(tight, txmax, r_xmax)
    w_row = jnp.maximum(txmax - txmin, 0)
    w_row = jnp.where((rslot < total_rows) & ((lc <= uc) | ~tight),
                      w_row, 0)
    return ty, txmin, w_row


def _row_table(splats: Splats, row_cap: int, tile_w: int, tile_h: int,
               extra_cols):
    """Row-tight stage 1: per-gaussian rects → per tile-row table.

    Returns (rg row→gaussian, ty, txmin, w_row, ioffs instance offsets,
    row_offs (N,) first-row index per gaussian, total instances,
    total_rows, extra) where ``extra`` is ``extra_cols`` (a list of (N,)
    int32 columns) gathered to row scale in the same fused row gather the
    decode columns ride.
    """
    n_gauss = splats.depth.shape[0]
    rmin_x = splats.rect_min[:, 0]
    rmin_y = splats.rect_min[:, 1]
    rmax_x = splats.rect_max[:, 0]
    rmax_y = splats.rect_max[:, 1]
    rect_h = jnp.where((splats.radius > 0) & (rmax_x > rmin_x),
                       rmax_y - rmin_y, 0)
    row_offs = jnp.cumsum(rect_h) - rect_h
    total_rows = row_offs[-1] + rect_h[-1]

    gid = jnp.arange(n_gauss, dtype=jnp.int32)
    rslot = jnp.arange(row_cap, dtype=jnp.int32)
    first_row = jnp.where(rect_h > 0, row_offs, row_cap)
    rmarks = jnp.zeros((row_cap,), jnp.int32).at[first_row].max(
        gid, mode='drop')
    rg = jax.lax.cummax(rmarks)                    # row → source gaussian

    cols = [
        row_offs.astype(jnp.int32), rmin_y, rmin_x, rmax_x,
        _bits(splats.mean2d[:, 0]), _bits(splats.mean2d[:, 1]),
        _bits(splats.conic[:, 0]), _bits(splats.conic[:, 1]),
        _bits(splats.conic[:, 2]), _bits(2.0 * splats.t_iso),
    ] + list(extra_cols)
    pad = -len(cols) % 8
    cols += [jnp.zeros_like(gid)] * pad
    rtab = jnp.stack(cols, axis=1)[rg]             # (row_cap,·) row gather

    ty, txmin, w_row = _row_extents(
        rslot, rtab[:, 0], rtab[:, 1], rtab[:, 2], rtab[:, 3],
        _f32(rtab[:, 4]), _f32(rtab[:, 5]), _f32(rtab[:, 6]),
        _f32(rtab[:, 7]), _f32(rtab[:, 8]), _f32(rtab[:, 9]),
        total_rows, tile_w, tile_h)
    ioffs = jnp.cumsum(w_row) - w_row
    total = ioffs[-1] + w_row[-1]
    extra = [rtab[:, 10 + i] for i in range(len(extra_cols))]
    return (rg, ty, txmin, w_row, ioffs, row_offs, total, total_rows,
            extra)


def emission_counts(splats: Splats, tile_w: int, tile_h: int,
                    row_cap: int):
    """(num_instances, num_rows) that :func:`bin_instances` would emit.

    Row-tight aware (``splats.t_iso`` present and GSCREAM_ROW_TIGHT not
    disabled); ``row_cap`` must hold every rect row or the instance count
    under-reports (num_rows is exact either way — size row_cap from a
    first N-scale pass over ``sum(rect_h)``).
    """
    if splats.t_iso is None or os.environ.get("GSCREAM_ROW_TIGHT") == "0":
        rw = splats.rect_max[:, 0] - splats.rect_min[:, 0]
        rh = splats.rect_max[:, 1] - splats.rect_min[:, 1]
        n = jnp.sum(jnp.where(splats.radius > 0, rw * rh, 0))
        return n.astype(jnp.int32), jnp.int32(0)
    (_, _, _, _, _, _, total, total_rows, _) = _row_table(
        splats, row_cap, tile_w, tile_h, [])
    return total.astype(jnp.int32), total_rows.astype(jnp.int32)


@partial(jax.jit, static_argnames=("capacity", "width", "height",
                                   "tile_w", "tile_h", "precise",
                                   "sort_mode", "row_tight", "expand"))
def bin_instances(splats: Splats, capacity: int, width: int, height: int,
                  tile_w: int, tile_h: int, precise: bool = True,
                  attrs=None, sort_mode: str = "auto",
                  row_tight: bool | str = "auto",
                  expand: str = "auto") -> Binning:
    """Build depth-sorted per-tile instance lists with static capacity.

    If ``num_instances > capacity`` the trailing instances (highest gaussian
    indices in emission order) are dropped deterministically; callers must
    check and re-run at a larger capacity tier for exact rendering.  In
    row-tight mode the row table (static ``capacity // ROW_RATIO``) can
    likewise
    overflow — check :func:`overflow_demand`, not num_instances alone.

    ``precise=True`` (training default) sorts by exact depth within each
    tile.  When ``tile_bits + ceil(log2 N) <= 32`` this is done with one
    *fused* uint32 key ``tile << rank_bits | depth_rank(gaussian)`` — the
    per-scene depth ranks come from a stable N-scale argsort, so the
    resulting order is bit-identical to the lexicographic (tile,
    depth-bits, emission) sort (= the reference's stable 64-bit radix,
    rasterizer_impl.cu:306-314) while XLA sorts the single int key
    radix-style instead of with a lexicographic comparator network.
    ``sort_mode`` ("auto"/"fused"/"lex") pins the strategy for A/B runs;
    "auto" resolves to "lex" (round-3 hardware default) unless
    GSCREAM_SORT_FUSED=1.

    ``precise=False`` packs (tile, quantized depth) into a single int32
    key — the depth keeps its top float bits (≈2⁻¹² relative resolution),
    so gaussians closer than that in depth may blend in emission order
    instead of strict depth order.  Only available when the tile grid
    fits 11 bits, else falls back to exact.

    ``attrs`` (N, n_attr) f32 per-gaussian attributes are expanded to
    emission order inside the row gather(s) this function already pays,
    then ride the sort as payload operands — the downstream
    ``pack_instance_data`` then needs no gather at all (TPU sorts stream;
    a 2M-row random gather of the same data costs ~2x, round-1 profile).
    """
    if attrs is not None and os.environ.get(
            "GSCREAM_ATTRS_PAYLOAD") != "1":
        # default (round-3 hardware A/B): drop the 11 payload operands
        # from the sort; the packer re-gathers attrs per instance
        # (attrs[gauss_id] row gather).  The payload-through-sort mode
        # (GSCREAM_ATTRS_PAYLOAD=1) pays a (capacity, 11) lane interleave
        # for the sorted-attrs stack that costs more than the gather.
        attrs = None
    grid_x = -(-width // tile_w)
    n_tiles = num_tiles(width, height, tile_w, tile_h)
    n_gauss = splats.depth.shape[0]
    n_attr = 0 if attrs is None else attrs.shape[1]

    # exact fused single key: sorting by (tile, per-scene depth RANK) is
    # identical to the lexicographic (tile, depth-bits) sort — ranks come
    # from one stable N-scale argsort (ties broken by gaussian index,
    # exactly the stable radix semantics of rasterizer_impl.cu:306-314) —
    # but needs only one int key, which XLA sorts radix-style instead of
    # with a full lexicographic comparator network
    rank_bits = max(int(n_gauss - 1).bit_length(), 1)
    tile_bits = int(n_tiles).bit_length()
    if sort_mode == "auto":
        # round-3 hardware A/B: the lexicographic 2-key sort beats the
        # fused single key — TPU lax.sort itself is ~0.1 ms at 1.5 M and
        # the fused key's N-scale rank argsort + scatter costs more than
        # the comparator stage it saves (GSCREAM_SORT_FUSED=1 restores it)
        sort_mode = ("fused" if os.environ.get("GSCREAM_SORT_FUSED")
                     else "lex")
    fused_exact = (precise and sort_mode == "fused"
                   and tile_bits + rank_bits <= 32)

    gdepth_bits = _bits(splats.depth)
    if fused_exact:
        # rank[g] = position of g in the stable depth order (N-scale)
        _, order = jax.lax.sort(
            (gdepth_bits, jnp.arange(n_gauss, dtype=jnp.int32)),
            num_keys=1, is_stable=True)
        rank = jnp.zeros((n_gauss,), jnp.int32).at[order].set(
            jnp.arange(n_gauss, dtype=jnp.int32))

    slot = jnp.arange(capacity, dtype=jnp.int32)
    if row_tight == "auto":
        row_tight = os.environ.get("GSCREAM_ROW_TIGHT") != "0"
    row_tight = bool(row_tight) and splats.t_iso is not None

    if expand == "auto":
        # r5 hardware default: the transposed big-block expansion kernels
        # (emission.py) beat the XLA emission build 93.6 → 87.6 ms at the
        # bench tier; on CPU they would run in interpret mode, so the XLA
        # build stays the non-TPU default.
        expand = os.environ.get("GSCREAM_EXPAND", "")
        if not expand:
            expand = "full" if jax.default_backend() == "tpu" else "xla"
    use_expand = (row_tight and not fused_exact and attrs is None
                  and n_gauss < (1 << 24) and expand in ("pallas", "full"))
    use_expand1 = use_expand and expand == "full"
    if use_expand1:
        # -- full Pallas emission (GSCREAM_EXPAND=full): BOTH row-tight
        # stages run as big-block windowed expansion kernels.  Stage 1's
        # row-marks scatter+cummax and (row_cap, 10) row gather are
        # replaced by one N-scale compaction sort (emitting gaussians to
        # a prefix, stable in original order — so kept rows keep the
        # exact XLA row order) + EXPAND1, which evaluates the
        # _row_extents math in-kernel on expanded columns.  Stage 2 is
        # the same compaction-sort + EXPAND2 pipeline as expand=pallas.
        from .emission import expand_gauss_rows, expand_rows
        interpret = (bool(os.environ.get("GSCREAM_PALLAS_INTERPRET"))
                     or jax.default_backend() != "tpu")
        f = jnp.float32
        row_cap = row_table_size(capacity)
        rmin_x = splats.rect_min[:, 0]
        rmin_y = splats.rect_min[:, 1]
        rmax_x = splats.rect_max[:, 0]
        rmax_y = splats.rect_max[:, 1]
        rect_h = jnp.where((splats.radius > 0) & (rmax_x > rmin_x),
                           rmax_y - rmin_y, 0)
        gid = jnp.arange(n_gauss, dtype=jnp.int32)
        sA = jax.lax.sort(
            ((rect_h <= 0).astype(jnp.int32), gid, rect_h,
             rmin_y.astype(f), rmin_x.astype(f), rmax_x.astype(f),
             splats.mean2d[:, 0], splats.mean2d[:, 1],
             splats.conic[:, 0], splats.conic[:, 1], splats.conic[:, 2],
             2.0 * splats.t_iso, splats.depth),
            num_keys=1, is_stable=True)
        gid_c, recth_c = sA[1], sA[2]
        re_raw = jnp.cumsum(recth_c)
        ro_raw = re_raw - recth_c
        total_rows = re_raw[-1]
        rows4 = expand_gauss_rows(
            jnp.minimum(ro_raw, row_cap).astype(f),
            jnp.minimum(re_raw, row_cap).astype(f),
            gid_c.astype(f), sA[3], sA[4], sA[5], sA[6], sA[7],
            sA[8], sA[9], sA[10], sA[11], sA[12],
            row_cap, tile_w, tile_h, grid_x, interpret)
        tile_base = rows4[0].astype(jnp.int32)
        rg = rows4[1].astype(jnp.int32)
        dep_row = _bits(rows4[2])
        w_row = rows4[3].astype(jnp.int32)

        keep = (w_row > 0).astype(jnp.int32)
        sC = jax.lax.sort(
            (1 - keep, tile_base, rg, dep_row, w_row),
            num_keys=1, is_stable=True)
        tb_c, rg_c, dep_c, w_c = sC[1], sC[2], sC[3], sC[4]
        io_c = jnp.cumsum(w_c) - w_c
        total = io_c[-1] + w_c[-1]
        cols4 = expand_rows(
            jnp.minimum(io_c, capacity).astype(f), w_c.astype(f),
            tb_c.astype(f), rg_c.astype(f), _f32(dep_c),
            capacity, n_tiles, interpret)
        tile = cols4[0].astype(jnp.int32)
        g = cols4[1].astype(jnp.int32)
        depth_col = _bits(cols4[2])
        rank_col = None
        attr_src = []
        # per-gaussian offsets: a gaussian's emission start = the prefix
        # sum of w_row (PRE-compaction row order) at its first row —
        # dropped rows contribute w=0 and the row compaction is stable,
        # so this equals the compacted io_c at the gaussian's first kept
        # row.  One row-scale cumsum + ONE gather (the r5 trace showed
        # the old rowrank→io_c two-gather chain costing 2.3 ms each —
        # scalar gathers pay a huge per-element toll on TPU).  Then
        # scatter back to original gaussian order and backfill dropped
        # gaussians from the right (flip-cummin) so ranges stay monotone
        # ([x, x) for non-emitting gaussians — bit-equal to the XLA path)
        iow = jnp.cumsum(w_row) - w_row
        iow_ext = jnp.concatenate(
            [iow, total.astype(jnp.int32).reshape(1)])
        goffs_c = iow_ext[jnp.minimum(ro_raw, row_cap)]
        # un-permute to original gaussian order with a 2-operand sort
        # (gid_c is a permutation, so sorting by it restores original
        # positions; an N-scale scatter costs ~1.5 ms, the sort ~0.5)
        _, goffs_o = jax.lax.sort((gid_c, goffs_c), num_keys=1,
                                  is_stable=True)
        goffs_full = jnp.concatenate(
            [goffs_o,
             jnp.minimum(total, capacity).astype(jnp.int32).reshape(1)])
        goffs = jnp.flip(jax.lax.cummin(jnp.flip(goffs_full)))[:n_gauss]
        num_rows = total_rows.astype(jnp.int32)
    elif row_tight:
        # -- row-tight emission: stage 1 builds the per-tile-row table
        # (gaussian-major, row-major — emission order is a strict
        # subsequence of the full-rect order, so within-tile blend order
        # is unchanged); stage 2 maps instance slots onto rows.
        extra = [gdepth_bits] + ([rank] if fused_exact else []) \
            + [_bits(attrs[:, i]) for i in range(n_attr)]
        row_cap = row_table_size(capacity)
        (rg, ty, txmin, w_row, ioffs, row_offs, total, total_rows,
         extra_r) = _row_table(splats, row_cap, tile_w, tile_h, extra)
        rslot = jnp.arange(row_cap, dtype=jnp.int32)
        tile_base = ty * grid_x + txmin
        if use_expand:
            # -- stage 2 via the windowed Pallas expansion kernel
            # (GSCREAM_EXPAND=pallas): compaction sort + indicator-
            # matmul expansion replace the capacity-scale slot→row
            # scatter+cummax and the (capacity, 8) row gather.  Table
            # values travel as exact-in-f32 numbers (io/w/tile/rg are
            # small ints; depth is its f32 VALUE ≥ 0.2 — never bitcast
            # int patterns through the indicator matmul).
            from .emission import expand_rows
            interpret = (bool(os.environ.get("GSCREAM_PALLAS_INTERPRET"))
                         or jax.default_backend() != "tpu")
            keep = (w_row > 0).astype(jnp.int32)
            sC = jax.lax.sort(
                (1 - keep, tile_base, rg, extra_r[0], w_row),
                num_keys=1, is_stable=True)
            tb_c, rg_c, dep_c, w_c = sC[1], sC[2], sC[3], sC[4]
            io_c = jnp.cumsum(w_c) - w_c
            f = jnp.float32
            cols4 = expand_rows(
                jnp.minimum(io_c, capacity).astype(f), w_c.astype(f),
                tb_c.astype(f), rg_c.astype(f), _f32(dep_c),
                capacity, n_tiles, interpret)
            tile = cols4[0].astype(jnp.int32)
            g = cols4[1].astype(jnp.int32)
            depth_col = _bits(cols4[2])
            rank_col = None
            attr_src = []
            # per-gaussian offsets: the row compaction is stable and
            # dropped rows emit nothing, so the compacted io_c at a
            # gaussian's first kept row equals the PRE-compaction ioffs
            # at its first row — the exact read the XLA stage 2 does.
            # One gather instead of the old rowrank→io_c chain (2 scalar
            # gathers ≈ 2.3 ms each on hardware, r5 trace).
            ioffs_ext = jnp.concatenate(
                [ioffs, total.astype(jnp.int32).reshape(1)])
            goffs = ioffs_ext[jnp.minimum(row_offs, row_cap)]
            num_rows = total_rows.astype(jnp.int32)
        else:
            first_slot = jnp.where(w_row > 0, ioffs, capacity)
            marks = jnp.zeros((capacity,), jnp.int32).at[first_slot].max(
                rslot, mode='drop')
            row_of = jax.lax.cummax(marks)         # slot → row

            # stage-2 fused row gather: rows are already tile-row
            # resolved, so one packed int ``tile_base`` replaces the old
            # (rect_min, width) modulo decode entirely
            cols2 = [ioffs, tile_base, rg] + extra_r
            pad2 = -len(cols2) % 8
            cols2 += [jnp.zeros_like(rslot)] * pad2
            et = jnp.stack(cols2, axis=1)[row_of]  # (capacity,·)
            local = slot - et[:, 0]
            tile = et[:, 1] + local
            g = et[:, 2]
            a0 = 4 + (1 if fused_exact else 0)     # attr column base
            depth_col = et[:, 3]
            rank_col = et[:, 4] if fused_exact else None
            attr_src = [et[:, a0 + i] for i in range(n_attr)]

            # per-gaussian instance offsets: ioffs at each gaussian's
            # first row (empty gaussians inherit the next start)
            ioffs_ext = jnp.concatenate(
                [ioffs, total.astype(jnp.int32).reshape(1)])
            goffs = ioffs_ext[jnp.minimum(row_offs, row_cap)]
            num_rows = total_rows.astype(jnp.int32)
    else:
        rect_w = (splats.rect_max[:, 0] - splats.rect_min[:, 0])
        rect_h = (splats.rect_max[:, 1] - splats.rect_min[:, 1])
        area = jnp.where(splats.radius > 0, rect_w * rect_h, 0)
        offsets = jnp.cumsum(area) - area          # exclusive prefix sum
        total = offsets[-1] + area[-1]

        # slot → source gaussian: scatter each emitting gaussian's id at
        # its first slot, then a running max fills the gaps (replaces a
        # per-slot binary search — one scatter + one cummax instead of
        # ~21 gather rounds over the full capacity)
        gid = jnp.arange(n_gauss, dtype=jnp.int32)
        first_slot = jnp.where(area > 0, offsets, capacity)
        marks = jnp.zeros((capacity,), jnp.int32).at[first_slot].max(
            gid, mode='drop')
        gmap = jax.lax.cummax(marks)

        # one fused row-gather for every per-gaussian emission attribute —
        # TPU gathers pay a large per-row overhead, so five separate
        # scalar gathers of 2M elements cost ~20× one (N,8)-row gather
        cols = [
            offsets.astype(jnp.int32),
            splats.rect_min[:, 0], splats.rect_min[:, 1],
            jnp.maximum(rect_w, 1).astype(jnp.int32),
            gdepth_bits,
        ]
        if fused_exact:
            cols.append(rank)
        a0 = len(cols)                             # attr column base
        cols += [_bits(attrs[:, i]) for i in range(n_attr)]
        pad_cols = -len(cols) % 8
        cols += [jnp.zeros_like(offsets, dtype=jnp.int32)] * pad_cols
        emit_tab = jnp.stack(cols, axis=1)         # (N, ·) int32
        et = emit_tab[gmap]                        # (capacity,·) row gather
        local = slot - et[:, 0]
        rw = et[:, 3]
        tile_x = et[:, 1] + local % rw
        tile_y = et[:, 2] + local // rw
        tile = tile_y * grid_x + tile_x
        g = gmap
        depth_col = et[:, 4]
        rank_col = et[:, 5] if fused_exact else None
        attr_src = [et[:, a0 + i] for i in range(n_attr)]
        goffs = offsets.astype(jnp.int32)
        num_rows = jnp.int32(0)

    attr_ops = tuple(_f32(c) for c in attr_src)
    valid = slot < jnp.minimum(total, capacity)
    tile = jnp.where(valid, tile, n_tiles).astype(jnp.int32)
    # depth as a sortable int key: positive-float bits order like floats
    depth_bits = jnp.where(valid, depth_col, jnp.int32(2 ** 30))

    if fused_exact:
        key = ((tile.astype(jnp.uint32)
                << np.uint32(rank_bits))
               | jnp.where(valid, rank_col, 0).astype(jnp.uint32))
        out = jax.lax.sort(
            (key, g, slot) + attr_ops, num_keys=1, is_stable=True)
        key_s, sorted_gauss, emit_slot = out[0], out[1], out[2]
        sorted_attrs = out[3:]
        sorted_tile = (key_s >> np.uint32(rank_bits)).astype(jnp.int32)
    elif not precise and n_tiles < 2047:
        # single packed key: tile(11b) << 20 | depth-top-bits(20b)
        dq = jax.lax.shift_right_logical(
            depth_bits.astype(jnp.uint32),
            jnp.uint32(11)).astype(jnp.int32) & 0xFFFFF
        key = jnp.where(valid, (tile << 20) | dq,
                        (jnp.int32(n_tiles) << 20))
        out = jax.lax.sort(
            (key, g, slot) + attr_ops, num_keys=1, is_stable=True)
        key_s, sorted_gauss, emit_slot = out[0], out[1], out[2]
        sorted_attrs = out[3:]
        sorted_tile = jax.lax.shift_right_logical(
            key_s.astype(jnp.uint32), jnp.uint32(20)).astype(jnp.int32)
    else:
        # one lexicographic sort on (tile, depth) carrying the gaussian
        # id — the reference's single 64-bit radix sort
        # (rasterizer_impl.cu:306-314)
        out = jax.lax.sort(
            (tile, depth_bits, g, slot) + attr_ops, num_keys=2,
            is_stable=True)
        sorted_tile, sorted_gauss, emit_slot = out[0], out[2], out[3]
        sorted_attrs = out[4:]

    tids = jnp.arange(n_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(sorted_tile, tids, side='left').astype(jnp.int32)
    tile_end = jnp.searchsorted(sorted_tile, tids, side='right').astype(jnp.int32)

    all_offsets = jnp.concatenate(
        [goffs, total.astype(jnp.int32).reshape(1)])
    all_offsets = jnp.minimum(all_offsets, capacity)
    return Binning(gauss_id=sorted_gauss.astype(jnp.int32),
                   tile_id=sorted_tile,
                   tile_start=tile_start,
                   tile_count=tile_end - tile_start,
                   num_instances=total.astype(jnp.int32),
                   emit_slot=emit_slot.astype(jnp.int32),
                   offsets=all_offsets,
                   num_rows=num_rows,
                   attrs=(jnp.stack(sorted_attrs, axis=1)
                          if n_attr else None))
