"""Pallas emission pipeline: splats → sorted dense instance columns.

TPU-native replacement for the XLA emission build in
:mod:`.binning` (which replaces the reference CUB pipeline,
``cuda_rasterizer/rasterizer_impl.cu:199-347``).  The XLA build is
semantically right but relayout-bound: its capacity-scale row gathers
materialize ``(capacity, k)`` tables whose minor dim is lane-padded to
128, costing ~27 ms at the 1.31 M bench tier (BASELINE.md r4 profile).
This module produces **bit-identical** Binning results with dense
column arithmetic plus two small Pallas kernels:

1. **Compaction by stable sort.**  Emitting gaussians (then non-empty
   tile rows) are compacted to a prefix with one stable ``lax.sort``
   whose payload operands are the dense attribute columns — sorts
   stream payloads (round-3 ``scripts/sort_matrix.py``), so this costs
   ~0.1-0.3 ms where the old path paid scatter+cummax+row-gather.
   Compaction bounds the expansion windows below: every remaining
   source emits ≥ 1 output, so K consecutive outputs touch ≤ K+1
   consecutive sources.

2. **Expansion kernels** (gaussians→rows, rows→instance slots).  Source
   tables are stored lane-blocked attribute-major ``(n/128, C, 128)``
   (built by one bandwidth-cheap block transpose); each grid block DMAs
   a 512-source window (dynamic dim-0 offset — no lane-dim slicing) and
   expands with an indicator matmul ``Sel @ tableᵀ`` where
   ``Sel[s, w] = starts[w] <= s < ends[w]`` — exact 0/1 passthrough on
   the MXU (~0.5 ms total at the bench tier).  Row iso-extents
   (:func:`~gscream_tpu.ops.binning._row_extents` math) and the
   tile-local power coefficients are computed in-kernel on expanded
   columns, so the per-instance attribute table leaves EXPAND2 ready
   for the (tile, depth) sort and the packed-row shuffle
   (:mod:`.shuffle`).

The (tile, depth-bits) sort itself, the searchsorted tile ranges, and
the per-gaussian offset table stay XLA — they were never the cost.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import Binning, row_table_size
from .projection import Splats

_HIGHEST = jax.lax.Precision.HIGHEST

KE = 256          # outputs per expansion block
WB = 4            # source window, 128-lane blocks (512 ≥ KE + 128 + 1)
W = WB * 128


def _bits(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


# ---------------------------------------------------------------------------
# lane-blocked tables

def _blocked_table(cols, n_pad: int):
    """[(n,) f32 columns] → (n_pad//128, C, 128) lane-blocked table.

    Row-pads each column to ``n_pad + W`` with zeros (window overrun
    slack; starts==ends==0 ⇒ pad sources never selected) and block-
    transposes — an (8,128)-tile block permutation, pure bandwidth.
    """
    c = len(cols)
    cpad = -c % 8
    cols = list(cols) + [cols[0]] * cpad           # sublane-pad to 8
    tab = jnp.stack(
        [jnp.pad(x.astype(jnp.float32), (0, n_pad + W - x.shape[0]))
         for x in cols], axis=0)                   # (C8, n_pad+W)
    c8 = c + cpad
    return (tab.reshape(c8, (n_pad + W) // 128, 128)
            .transpose(1, 0, 2))                   # (blocks, C8, 128)


def _window(tab_hbm, w0b, buf, sem, c8: int):
    """DMA a WB-block source window and flatten to (C8, W) in VMEM."""
    cp = pltpu.make_async_copy(
        tab_hbm.at[pl.ds(w0b, WB)], buf, sem)
    cp.start()
    cp.wait()
    # lane-concat of the 128-lane blocks (Mosaic has no
    # dynamic_update_slice; concatenate lowers to static vector writes)
    return jnp.concatenate([buf[k] for k in range(WB)], axis=1)


def _expand(tw, starts, ends, out0):
    """Indicator-matmul expansion: (K, C8) rows of the source whose
    [start, end) range contains each output index ``out0 + i``."""
    oiota = out0 + jax.lax.broadcasted_iota(jnp.int32, (KE, 1), 0)
    of = oiota.astype(jnp.float32)
    sel = ((of >= starts) & (of < ends)).astype(jnp.float32)   # (K, W)
    ex = jax.lax.dot_general(
        sel, tw, (((1,), (1,)), ((), ())),
        precision=_HIGHEST, preferred_element_type=jnp.float32)
    has_src = jnp.sum(sel, axis=1, keepdims=True) > 0.5
    return ex, of, has_src


def _transpose16(x):
    """(K, 16) → (16, K) via an exact eye contraction (MXU)."""
    eye = (jax.lax.broadcasted_iota(jnp.int32, (16, 16), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (16, 16), 1)
           ).astype(jnp.float32)
    return jax.lax.dot_general(
        eye, x, (((1,), (1,)), ((), ())),
        precision=_HIGHEST, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# EXPAND1: compacted gaussians → per-tile-row table (+ iso extents)

def _expand1_kernel(tile_w: int, tile_h: int, w0b_ref, tab_hbm,
                    out_ref, buf, sem):
    """Out rows: [gid, ty, txmin, w_row, mx, my, ca, cb, cc, depth,
    op, r, g, b, unc, 0].  Table rows: [row_offs, row_ends, gid, ymin,
    rxmin, rxmax, mx, my, ca, cb, cc, t2, depth, op, r, g, b, unc]
    (+6 pad).  The extents math mirrors binning._row_extents exactly
    (same expression order ⇒ same f32 rounding).
    """
    b = pl.program_id(0)
    tw = _window(tab_hbm, w0b_ref[b], buf, sem, 24)
    ex, of, has_src = _expand(tw, tw[0:1, :], tw[1:2, :], b * KE)

    f = jnp.float32
    local = of - ex[:, 0:1]                        # row index within rect
    ty = ex[:, 3:4] + local
    r_xmin, r_xmax = ex[:, 4:5], ex[:, 5:6]
    mx, my = ex[:, 6:7], ex[:, 7:8]
    ca, cb, cc = ex[:, 8:9], ex[:, 9:10], ex[:, 10:11]
    t2 = ex[:, 11:12]

    lo = ty * f(tile_h) - my - f(0.25)
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

    txmin = jnp.maximum(jnp.floor((mx + xlo - 0.25) / tile_w), r_xmin)
    txmax = jnp.minimum(jnp.floor((mx + xhi + 0.25) / tile_w) + 1.0,
                        r_xmax)
    tight = t2 > 0.0
    txmin = jnp.where(tight, txmin, r_xmin)
    txmax = jnp.where(tight, txmax, r_xmax)
    w_row = jnp.maximum(txmax - txmin, 0.0)
    w_row = jnp.where(has_src & ((lc <= uc) | ~tight), w_row, 0.0)
    txmin = jnp.where(has_src, txmin, 0.0)

    cols = jnp.concatenate(
        [ex[:, 2:3], ty, txmin, w_row, mx, my, ca, cb, cc,
         ex[:, 12:13], ex[:, 13:14], ex[:, 14:15], ex[:, 15:16],
         ex[:, 16:17], ex[:, 17:18], jnp.zeros_like(ty)],
        axis=1) * has_src.astype(jnp.float32)      # (K, 16)
    out_ref[...] = _transpose16(cols)


# ---------------------------------------------------------------------------
# EXPAND2: compacted rows → per-instance attribute columns

def _expand2_kernel(tile_w: int, tile_h: int, grid_x: int, n_tiles: int,
                    w0b_ref, tab_hbm, out_ref, buf, sem):
    """Out rows: [op, r, g, b, depth, unc, k0..k5, sx, sy, tile, gid]
    — lanes 0..13 are the packed-row instance layout of
    ``pack_instance_data``; 14/15 carry the sort key source and the
    gaussian id as exact small-int floats.  Table rows: [ioffs, iends,
    gid, ty, txmin, mx, my, ca, cb, cc, depth, op, r, g, b, unc].
    """
    b = pl.program_id(0)
    tw = _window(tab_hbm, w0b_ref[b], buf, sem, 16)
    ex, of, has_src = _expand(tw, tw[0:1, :], tw[1:2, :], b * KE)

    local = of - ex[:, 0:1]
    ty = ex[:, 3:4]
    tx = ex[:, 4:5] + local
    tile = ty * jnp.float32(grid_x) + tx
    ox = tx * jnp.float32(tile_w)
    oy = ty * jnp.float32(tile_h)
    mx, my = ex[:, 5:6], ex[:, 6:7]
    ca, cb, cc = ex[:, 7:8], ex[:, 8:9], ex[:, 9:10]
    mxl = mx - ox
    myl = my - oy
    k0 = -0.5 * (ca * mxl * mxl + cc * myl * myl) - cb * mxl * myl
    k1 = ca * mxl + cb * myl
    k2 = cc * myl + cb * mxl
    sx = ox - jnp.round(mx)
    sy = oy - jnp.round(my)

    v = has_src.astype(jnp.float32)
    # lane 14: the tile — invalid slots sort to the sentinel tile
    # (= n_tiles), stably by slot
    tile_col = jnp.where(has_src, tile, jnp.float32(n_tiles))
    cols = jnp.concatenate(
        [ex[:, 11:12] * v, ex[:, 12:13] * v, ex[:, 13:14] * v,
         ex[:, 14:15] * v, ex[:, 10:11] * v, ex[:, 15:16] * v,
         k0 * v, k1 * v, k2 * v, -0.5 * ca * v, -cb * v, -0.5 * cc * v,
         sx * v, sy * v, tile_col, ex[:, 2:3] * v],
        axis=1)                                    # (K, 16)
    out_ref[...] = _transpose16(cols)


def _run_expand(kernel, tab, w0b, n_out: int, interpret: bool):
    nblk = n_out // KE
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblk,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((16, KE), lambda b, w: (0, b)),
            scratch_shapes=[
                pltpu.VMEM((WB, tab.shape[1], 128), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((16, n_out), jnp.float32),
        interpret=interpret,
    )(w0b, tab)


def _window_starts(starts, n_out: int):
    """Per-block source-window block offsets: the (compacted) source
    covering each block's first output, aligned down to a 128 block."""
    blk0 = jnp.arange(n_out // KE, dtype=jnp.int32) * KE
    src = jnp.maximum(
        jnp.searchsorted(starts, blk0, side="right").astype(jnp.int32) - 1,
        0)
    return src // 128


# ---------------------------------------------------------------------------
# EXPAND-v2/v3: big-block windowed expansion (GSCREAM_EXPAND)
#
# The r5 hardware trace showed the original KE=256 expansion grids are
# DISPATCH-bound (~8 µs per grid step ⇒ ~40 ms at the bench tier), which
# rejected the full Pallas emission pipeline.  These variants expand
# KOUT=4096 outputs per grid step (320 steps at 1.31 M): one window DMA
# per step, then sub-blocks of SUB outputs, each reading a dynamically-
# positioned SWB-block sub-window of the VMEM window (Mosaic allows
# dynamic dim-0 slices of VMEM refs — probed on hardware).  The sub-
# window bound requires COMPACTED sources (every source emits ≥ 1
# instance ⇒ SUB outputs span ≤ SUB+1 consecutive sources, + ≤ 127
# alignment slack ⇒ SWB·128 ≥ SUB+128).  All table values ride as
# exact-in-f32 numbers (small ints; depth as its f32 VALUE, which is
# ≥ 0.2 by the near clamp, so the 1.0·x indicator matmul is exact —
# never bitcast int bit patterns through a matmul; the 0/1 indicator
# selects exactly one source per output, so any finite f32 passes
# through bit-exact).
#
# r5 diet (v3): the whole sub-block computation runs TRANSPOSED.  The
# v2 kernels expanded to (SUB, C) blocks and did their per-output math
# on (SUB, 1) columns — 1/128-lane VPU utilization — plus a second
# (eye) matmul to transpose the result for the row-major output.  v3
# contracts the indicator directly against the table, ``tw @ selᵀ`` →
# (C, SUB), so every downstream op works on full-lane (1, SUB) rows and
# the output block is written without any transpose.  `has` comes from
# one prefetched scalar total (output index < total) instead of a
# row-reduction over the indicator.

KOUT = 4096       # outputs per grid step
SUB = 256         # outputs per sub-block
SWB = 3           # sub-window blocks (SUB + 1 + 127 ≤ SWB·128)
# window blocks: the last sub-block's source start is ≤ KOUT sources
# past the first (compacted ⇒ each source emits ≥1), so its 128-aligned
# block index is ≤ KOUT//128 + 1 past the window block, and the SWB-block
# sub-window must still fit
WBV = KOUT // 128 + 1 + SWB
NSUB = KOUT // SUB


def _sub_window(buf, sp_ref, b: int, k: int, w0b):
    """The k-th sub-block's (C, SWB·128) source window + output iotas
    ((SUB, 1) column for the indicator build, (1, SUB) row for the
    per-output math)."""
    jb = sp_ref[b, 1 + k] // 128 - w0b
    twb = buf[pl.ds(jb, SWB)]                      # (SWB, C, 128)
    tw = jnp.concatenate([twb[j] for j in range(SWB)],
                         axis=1)                   # (C, SWB*128)
    o0 = jnp.float32(b * KOUT + k * SUB)
    of_c = o0 + jax.lax.broadcasted_iota(
        jnp.int32, (SUB, 1), 0).astype(jnp.float32)
    of_r = o0 + jax.lax.broadcasted_iota(
        jnp.int32, (1, SUB), 1).astype(jnp.float32)
    return tw, of_c, of_r


def _expand_t(tw, of_c, starts, ends):
    """(C, SUB) expanded rows: source s with start ≤ output < end.
    The 0/1 indicator selects exactly one source per live output, so
    any finite f32 table value passes through the MXU bit-exact."""
    sel = ((of_c >= starts) & (of_c < ends)).astype(jnp.float32)
    return jax.lax.dot_general(
        tw, sel, (((1,), (1,)), ((), ())),
        precision=_HIGHEST, preferred_element_type=jnp.float32)


def _expand_rows_kernel(n_tiles: int, sp_ref, tab_hbm, out_ref, buf,
                        sem):
    """tab rows: [io, w, tile_base, rg, depth] (+3 pad), compacted.
    sp_ref: per grid step, [window block offset, NSUB × sub-block source
    row, clamped total] (NSUB+2 int32 per step).  Out rows: [tile, g,
    depth, has] (+4 pad), one column per instance slot."""
    b = pl.program_id(0)
    w0b = sp_ref[b, 0]
    cp = pltpu.make_async_copy(tab_hbm.at[pl.ds(w0b, WBV)], buf, sem)
    cp.start()
    cp.wait()
    totf = sp_ref[b, 1 + NSUB].astype(jnp.float32)

    for k in range(NSUB):
        tw, of_c, of_r = _sub_window(buf, sp_ref, b, k, w0b)
        ex = _expand_t(tw, of_c, tw[0:1, :], tw[0:1, :] + tw[1:2, :])
        has = of_r < totf
        hasf = has.astype(jnp.float32)
        local = of_r - ex[0:1, :]
        tile = jnp.where(has, ex[2:3, :] + local, jnp.float32(n_tiles))
        out_ref[:, k * SUB:(k + 1) * SUB] = jnp.concatenate(
            [tile, ex[3:4, :] * hasf, ex[4:5, :] * hasf, hasf,
             jnp.zeros((4, SUB), jnp.float32)], axis=0)      # (8, SUB)


def _expand_gauss_kernel(tile_w: int, tile_h: int, grid_x: int,
                         sp_ref, tab_hbm, out_ref, buf, sem):
    """Big-block EXPAND1: compacted gaussians → per-tile-row table.

    tab rows: [ro, re, gid, ymin, rxmin, rxmax, mx, my, ca, cb, cc, t2,
    depth] (+3 pad), compacted (every live source emits ≥ 1 row).
    sp_ref per grid step: [window block offset, NSUB × sub-block source
    row, clamped total_rows].  Out rows: [tile_base, gid, depth, w_row]
    (+4 pad), one column per tile-row slot.  The row iso-extents math
    mirrors :func:`~gscream_tpu.ops.binning._row_extents` expression by
    expression (same f32 rounding — the parity suite asserts
    bit-identical w_row/tile_base against the XLA stage 1).
    """
    b = pl.program_id(0)
    w0b = sp_ref[b, 0]
    cp = pltpu.make_async_copy(tab_hbm.at[pl.ds(w0b, WBV)], buf, sem)
    cp.start()
    cp.wait()
    totf = sp_ref[b, 1 + NSUB].astype(jnp.float32)

    f = jnp.float32
    for k in range(NSUB):
        tw, of_c, of_r = _sub_window(buf, sp_ref, b, k, w0b)
        ex = _expand_t(tw, of_c, tw[0:1, :], tw[1:2, :])
        has = of_r < totf
        hasf = has.astype(jnp.float32)

        local = of_r - ex[0:1, :]
        ty = ex[3:4, :] + local
        r_xmin, r_xmax = ex[4:5, :], ex[5:6, :]
        mx, my = ex[6:7, :], ex[7:8, :]
        ca, cb, cc = ex[8:9, :], ex[9:10, :], ex[10:11, :]
        t2 = ex[11:12, :]

        lo = ty * f(tile_h) - my - f(0.25)
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

        txmin = jnp.maximum(jnp.floor((mx + xlo - 0.25) / tile_w), r_xmin)
        txmax = jnp.minimum(jnp.floor((mx + xhi + 0.25) / tile_w) + 1.0,
                            r_xmax)
        tight = t2 > 0.0
        txmin = jnp.where(tight, txmin, r_xmin)
        txmax = jnp.where(tight, txmax, r_xmax)
        w_row = jnp.maximum(txmax - txmin, 0.0)
        w_row = jnp.where(has & ((lc <= uc) | ~tight), w_row, 0.0)

        tb = (ty * f(grid_x) + txmin) * hasf
        out_ref[:, k * SUB:(k + 1) * SUB] = jnp.concatenate(
            [tb, ex[2:3, :] * hasf, ex[12:13, :] * hasf, w_row,
             jnp.zeros((4, SUB), jnp.float32)], axis=0)      # (8, SUB)


def expand_gauss_rows(ro_c, re_c, gid_c, ymin_c, rxmin_c, rxmax_c,
                      mx_c, my_c, ca_c, cb_c, cc_c, t2_c, depth_c,
                      row_cap: int, tile_w: int, tile_h: int,
                      grid_x: int, interpret: bool):
    """Compacted gaussian table → per-tile-row (tile_base, gid, depth,
    w_row) columns via the big-block EXPAND1 kernel.

    All inputs (n_pad,) f32 with exact-in-f32 values except the conic /
    t2 / depth columns, which pass through the 0/1 indicator matmul
    bit-exact (one source per output).  ``ro_c``/``re_c`` are the
    clamped exclusive/inclusive row-range bounds.  Returns
    (4, row_cap) f32.
    """
    rcap_pad = -(-row_cap // KOUT) * KOUT
    tab = _blocked_table(
        [ro_c, re_c, gid_c, ymin_c, rxmin_c, rxmax_c, mx_c, my_c,
         ca_c, cb_c, cc_c, t2_c, depth_c],
        -(-ro_c.shape[0] // 128) * 128 + WBV * 128)
    nblk = rcap_pad // KOUT
    o0 = jnp.arange(nblk * NSUB, dtype=jnp.int32) * SUB
    src = jnp.maximum(
        jnp.searchsorted(ro_c, o0, side="right").astype(jnp.int32) - 1, 0)
    sub_rows = src.reshape(nblk, NSUB)
    w0b = sub_rows[:, 0] // 128
    tot = jnp.minimum(re_c[-1].astype(jnp.int32), row_cap)
    sp = jnp.concatenate(
        [w0b[:, None], sub_rows,
         jnp.broadcast_to(tot, (nblk,))[:, None]], axis=1)
    out = pl.pallas_call(
        functools.partial(_expand_gauss_kernel, tile_w, tile_h, grid_x),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblk,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((8, KOUT), lambda b, sp: (0, b)),
            scratch_shapes=[
                pltpu.VMEM((WBV, tab.shape[1], 128), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((8, rcap_pad), jnp.float32),
        interpret=interpret,
    )(sp, tab)
    return out[:4, :row_cap]


def expand_rows(io_c, w_c, tile_base_c, rg_c, depth_c, capacity: int,
                n_tiles: int, interpret: bool):
    """Compacted row table → per-instance (tile, g, depth, has) columns.

    All inputs (row_cap,) f32 with exact-in-f32 values; ``io_c`` is the
    exclusive cumsum of ``w_c`` (clamped to capacity).  Returns
    (4, capacity) f32.
    """
    row_cap = io_c.shape[0]
    cap_pad = -(-capacity // KOUT) * KOUT
    # pad the blocked table so a window starting at the last real block
    # stays in bounds (pad sources have w=0 ⇒ never selected)
    tab = _blocked_table([io_c, w_c, tile_base_c, rg_c, depth_c],
                         -(-row_cap // 128) * 128 + WBV * 128)
    nblk = cap_pad // KOUT
    o0 = jnp.arange(nblk * NSUB, dtype=jnp.int32) * SUB
    src = jnp.maximum(
        jnp.searchsorted(io_c, o0, side="right").astype(jnp.int32) - 1, 0)
    sub_rows = src.reshape(nblk, NSUB)
    w0b = sub_rows[:, 0] // 128
    tot = jnp.minimum((io_c[-1] + w_c[-1]).astype(jnp.int32), capacity)
    sp = jnp.concatenate(
        [w0b[:, None], sub_rows,
         jnp.broadcast_to(tot, (nblk,))[:, None]], axis=1)  # (nblk, NSUB+2)
    out = pl.pallas_call(
        functools.partial(_expand_rows_kernel, n_tiles),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblk,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((8, KOUT), lambda b, sp: (0, b)),
            scratch_shapes=[
                pltpu.VMEM((WBV, 8, 128), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((8, cap_pad), jnp.float32),
        interpret=interpret,
    )(sp, tab)
    return out[:4, :capacity]


# ---------------------------------------------------------------------------
# pipeline

@functools.partial(jax.jit, static_argnames=(
    "capacity", "width", "height", "tile_w", "tile_h", "interpret"))
def bin_instances_pallas(splats: Splats, opacity, colors, unc,
                         capacity: int, width: int, height: int,
                         tile_w: int, tile_h: int,
                         interpret: bool = False):
    """Row-tight emission via the Pallas expansion pipeline.

    Returns a Binning whose ``cols16`` field carries the (16, capacity)
    dense sorted attribute table ready for :func:`.shuffle.pack_columns`
    (``attrs`` stays None).  Bit-identical (coefficients: ulp-identical)
    to
    ``bin_instances(..., row_tight=True, sort_mode='lex')`` +
    ``pack_instance_data`` on every consumed field (the parity suite
    asserts this).  Requires ``splats.t_iso`` (tight culling on).
    """
    if splats.t_iso is None:
        raise ValueError("bin_instances_pallas requires tight culling "
                         "(splats.t_iso); use bin_instances instead")
    grid_x = -(-width // tile_w)
    n_tiles = grid_x * (-(-height // tile_h))
    n_gauss = splats.depth.shape[0]
    row_cap = max(-(-row_table_size(capacity) // KE) * KE, KE)
    cap = capacity
    if cap % KE:
        raise ValueError(f"capacity {cap} not a multiple of {KE}")

    # --- stage A: compact emitting gaussians (stable: original order)
    rmin_x = splats.rect_min[:, 0]
    rmin_y = splats.rect_min[:, 1]
    rmax_x = splats.rect_max[:, 0]
    rmax_y = splats.rect_max[:, 1]
    rect_h = jnp.where((splats.radius > 0) & (rmax_x > rmin_x),
                       rmax_y - rmin_y, 0)
    gid = jnp.arange(n_gauss, dtype=jnp.int32)
    drop = (rect_h <= 0).astype(jnp.int32)
    sA = jax.lax.sort(
        (drop, gid, rect_h, rmin_y.astype(jnp.float32),
         rmin_x.astype(jnp.float32), rmax_x.astype(jnp.float32),
         splats.mean2d[:, 0], splats.mean2d[:, 1],
         splats.conic[:, 0], splats.conic[:, 1], splats.conic[:, 2],
         2.0 * splats.t_iso, splats.depth, opacity,
         colors[:, 0], colors[:, 1], colors[:, 2], unc),
        num_keys=1, is_stable=True)
    gid_c, recth_c = sA[1], sA[2]
    row_ends_c = jnp.cumsum(recth_c, dtype=jnp.int32)
    row_offs_c = row_ends_c - recth_c
    total_rows = row_ends_c[-1]
    # clamp to the static row table (overflow reported via num_rows)
    ro = jnp.minimum(row_offs_c, row_cap).astype(jnp.float32)
    re = jnp.minimum(row_ends_c, row_cap).astype(jnp.float32)

    tabA = _blocked_table(
        [ro, re, gid_c.astype(jnp.float32)] + list(sA[3:]),
        -(-n_gauss // 128) * 128)
    w0A = _window_starts(jnp.minimum(row_offs_c, row_cap), row_cap)
    rows16 = _run_expand(
        functools.partial(_expand1_kernel, tile_w, tile_h),
        tabA, w0A, row_cap, interpret)             # (16, row_cap)

    # --- stage C: compact non-empty rows (stable: emission order)
    w_row = rows16[3]
    sC = jax.lax.sort(
        ((w_row <= 0.0).astype(jnp.int32),) + tuple(
            rows16[i] for i in (0, 1, 2, 4, 5, 6, 7, 8, 9, 10, 11, 12,
                                13, 14)) + (w_row,),
        num_keys=1, is_stable=True)
    w_c = sC[15]
    iends_i = jnp.cumsum(w_c.astype(jnp.int32), dtype=jnp.int32)
    ioffs_i = iends_i - w_c.astype(jnp.int32)
    total_inst = iends_i[-1]
    io = jnp.minimum(ioffs_i, cap).astype(jnp.float32)
    ie = jnp.minimum(iends_i, cap).astype(jnp.float32)

    # per-gaussian emission offsets (segment-reduce table): the ioffs at
    # each gaussian's first row; empty gaussians inherit the next start.
    # rowrank maps pre-compaction row index -> compacted position (an
    # empty row's rank = the next kept row's position).
    kept = (w_row > 0.0).astype(jnp.int32)
    rowrank = jnp.cumsum(kept) - kept
    rr_ext = jnp.concatenate(
        [rowrank, jnp.sum(kept, keepdims=True)]).astype(jnp.int32)
    io_ext = jnp.concatenate([ioffs_i, total_inst[None]])
    first_rank = rr_ext[jnp.minimum(row_offs_c, row_cap)]
    goffs_c = io_ext[jnp.minimum(first_rank, row_cap)]
    # scatter back to original gaussian order; backfill empties from the
    # right so ranges stay monotone ([x, x) for non-emitting gaussians)
    goffs = jnp.full((n_gauss + 1,), jnp.iinfo(jnp.int32).max, jnp.int32)
    goffs = goffs.at[gid_c].set(goffs_c)
    goffs = goffs.at[n_gauss].set(jnp.minimum(total_inst, cap))
    goffs = jnp.flip(jax.lax.cummin(jnp.flip(goffs)))
    goffs = jnp.minimum(goffs, cap)

    # rows: ioffs iends gid ty txmin mx my ca cb cc depth op r g b unc
    tabC = _blocked_table(
        [io, ie, sC[1], sC[2], sC[3], sC[4], sC[5], sC[6], sC[7],
         sC[8], sC[9], sC[10], sC[11], sC[12], sC[13], sC[14]],
        -(-row_cap // 128) * 128)
    w0C = _window_starts(jnp.minimum(ioffs_i, cap), cap)
    inst16 = _run_expand(
        functools.partial(_expand2_kernel, tile_w, tile_h, grid_x,
                          n_tiles),
        tabC, w0C, cap, interpret)                 # (16, cap)

    # --- stage E: the (tile, depth) sort over dense columns
    slot = jnp.arange(cap, dtype=jnp.int32)
    tile_i = inst16[14].astype(jnp.int32)
    valid = slot < jnp.minimum(total_inst, cap)
    depth_bits = jnp.where(valid, _bits(inst16[4]), jnp.int32(2 ** 30))
    sE = jax.lax.sort(
        (tile_i, depth_bits, inst16[15].astype(jnp.int32), slot)
        + tuple(inst16[i] for i in range(14)),
        num_keys=2, is_stable=True)
    sorted_tile, sorted_gauss, emit_slot = sE[0], sE[2], sE[3]
    cols16 = jnp.concatenate(
        [x[None] for x in sE[4:18]]
        + [jnp.zeros((2, cap), jnp.float32)], axis=0)   # (16, cap)

    tids = jnp.arange(n_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(sorted_tile, tids,
                                  side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(sorted_tile, tids,
                                side="right").astype(jnp.int32)
    return Binning(
        gauss_id=sorted_gauss, tile_id=sorted_tile,
        tile_start=tile_start, tile_count=tile_end - tile_start,
        num_instances=total_inst, emit_slot=emit_slot,
        offsets=goffs, num_rows=total_rows, attrs=None, cols16=cols16)
