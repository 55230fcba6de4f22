"""Tiled Pallas rasterizer: forward + analytic backward (custom_vjp).

TPU-native replacement for the reference CUDA tile renderer
(``cuda_rasterizer/forward.cu:441-568`` and ``backward.cu:409-604``), built
around four ideas that map the splatting math onto TPU hardware:

1. **Quadratic-basis MXU evaluation.**  For every (instance, pixel) pair the
   gaussian exponent is a degree-2 polynomial in the pixel coordinates, so a
   whole chunk of G instances × P pixels of ``power`` values is one
   ``(G,16) @ (16,P)`` matmul against the constant pixel basis
   ``[1, x, y, x², xy, y²]`` — the MXU computes what CUDA evaluates with
   per-thread scalar math.  The six per-instance polynomial coefficients are
   precomputed *outside* the kernel (in tile-local coordinates, so fp32
   precision holds): the kernel does zero per-instance preprocessing and
   uses only the first 16 lanes of each 128-lane instance row (Mosaic
   requires 128-lane-aligned HBM rows for the chunk DMA; a denser 8
   instances/row packing needs tile ranges 8-aligned in the sort — a
   possible future bandwidth optimization).

2. **Prefix-scan transmittance.**  The sequential front-to-back blend
   ``T ← T·(1-α)`` becomes a cumulative sum of ``log1p(-α)`` along the
   instance axis (a lower-triangular matmul on the MXU), after which the
   per-instance blend weights ``w = α·T_prev`` are data-parallel.  See
   ``rasterize_ref.py`` for the proof that this reproduces the reference's
   early-stop (``T < 1e-4``) semantics exactly.

3. **Raw-moment backward.**  Instead of materializing the per-instance
   gradient chain in-kernel (backward.cu:488-604 does ~40 scalar ops per
   instance), the backward kernel emits only MXU products: the 0th–2nd
   pixel-basis moments of ``X = ∂L/∂α · G`` and the per-channel weight sums.
   The (nonlinear, per-instance) map from moments to mean2d/conic/opacity
   gradients is translation-covariant, so it is applied *after* the
   per-gaussian segment reduction on N-sized arrays — the per-instance
   moments are first shifted into each gaussian's own centered frame
   (``sx, sy`` lanes), which keeps the fp32 cancellation behavior of
   tile-local coordinates.

4. **Deterministic gradient scatter.**  The backward kernel writes
   per-*instance* moments to disjoint slots (each instance belongs to one
   tile), then a segment reduction over source gaussian ids replaces CUDA's
   nondeterministic ``atomicAdd`` (backward.cu:554-601) — SURVEY.md §5
   "race detection" note.

The backward math follows backward.cu exactly, including its pass-through
treatment of the 0.99 alpha clamp; the suffix sums that CUDA accumulates
back-to-front (``accum_rec``) are obtained from the identity

    Σ_{j>i} γ_j w_j  =  Total − Σ_{j≤i} γ_j w_j,

with ``Total = (C − T·bg)·gC + D·gD + U·gU`` available from saved forward
outputs, so the backward also runs front-to-back in one pass.

Instance lane layout (lanes 0..15 of a 128-lane row):
    0: opacity   1-5: r,g,b,depth,unc   6-11: k0..k5 (power coefficients,
    tile-local)   12: sx = origin_x − round(mean_x)   13: sy   14,15: 0
Backward output lane layout (lanes 0..15 of a 128-lane row):
    1-5: channel grads (w-weighted sums)   6-11: moments of X against the
    tile-local basis [1, x, y, x², xy, y²]   0,12-15: 0
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import Binning, bin_instances
from .projection import ALPHA_MIN, T_STOP, Splats, preprocess

# ---------------------------------------------------------------------------
# configuration

TILE_W = 32           # pixels per tile, x — tile pixel count must be 1024
TILE_H = 32           # pixels per tile, y   (= one (8,128) f32 vreg block)
PIX = TILE_W * TILE_H
CHUNK = 256           # instances processed per inner step
LANES = 128
ILANES = 16           # used floats per instance row (input + grad output)
PAD_SLOTS = CHUNK     # slack rows absorbing the last chunk's tail overrun

_HIGHEST = jax.lax.Precision.HIGHEST


def _interpret_default() -> bool:
    if os.environ.get("GSCREAM_PALLAS_INTERPRET"):
        return True
    return jax.default_backend() != "tpu"


class TiledOut(NamedTuple):
    color: jnp.ndarray        # (H,W,3) with background composited
    depth: jnp.ndarray        # (H,W)
    uncertainty: jnp.ndarray  # (H,W)
    final_t: jnp.ndarray      # (H,W)


# ---------------------------------------------------------------------------
# packing helpers (pure JAX)

def pack_instance_data(mean2d, conic, opacity, colors, depth, unc,
                       binning: Binning, grid_x: int):
    """Per-gaussian attributes → packed per-instance rows in sorted order.

    One (N,11) row-gather (TPU gathers pay per-row overhead — scalar
    gathers of the same element count are ~20× slower, profiled), then the
    tile-local power polynomial ``power(x,y) = k0 + k1·x + k2·y + k3·x² +
    k4·xy + k5·y²`` is precomputed per instance, so the kernels do no
    per-instance math at all.  Rows are 128 lanes (Mosaic DMA alignment),
    lanes 0..15 used.
    """
    attrs = jnp.concatenate([
        opacity[:, None], colors, depth[:, None], unc[:, None],
        mean2d, conic,
    ], axis=1)                                     # (N, 11)
    a = attrs[binning.gauss_id]                    # (cap, 11) row gather
    tile = binning.tile_id
    ox = ((tile % grid_x) * TILE_W).astype(jnp.float32)
    oy = ((tile // grid_x) * TILE_H).astype(jnp.float32)
    mxl = a[:, 6] - ox
    myl = a[:, 7] - oy
    ca, cb, cc = a[:, 8], a[:, 9], a[:, 10]
    k0 = -0.5 * (ca * mxl * mxl + cc * myl * myl) - cb * mxl * myl
    k1 = ca * mxl + cb * myl
    k2 = cc * myl + cb * mxl
    # sx/sy shift the backward's tile-local moments into the gaussian's own
    # rounded-center frame (see convert_instance_grads) — stays O(radius),
    # so no fp32 catastrophic cancellation at any image size
    sx = ox - jnp.round(a[:, 6])
    sy = oy - jnp.round(a[:, 7])
    zero = jnp.zeros_like(k0)
    data16 = jnp.stack([
        a[:, 0], a[:, 1], a[:, 2], a[:, 3], a[:, 4], a[:, 5],
        k0, k1, k2, -0.5 * ca, -cb, -0.5 * cc, sx, sy, zero, zero,
    ], axis=1)                                     # (cap, 16)
    data16 = jnp.pad(data16, ((0, PAD_SLOTS), (0, LANES - ILANES)))
    return data16                                  # (cap+pad, 128)


def tiles_to_image(tiles: jnp.ndarray, width: int, height: int):
    """(n_tiles, C, PIX) → (C, H, W) crop."""
    gx = -(-width // TILE_W)
    gy = -(-height // TILE_H)
    c = tiles.shape[1]
    img = tiles.reshape(gy, gx, c, TILE_H, TILE_W)
    img = img.transpose(2, 0, 3, 1, 4).reshape(c, gy * TILE_H, gx * TILE_W)
    return img[:, :height, :width]


def image_to_tiles(img: jnp.ndarray, width: int, height: int):
    """(C, H, W) → (n_tiles, C, PIX) zero-padded."""
    gx = -(-width // TILE_W)
    gy = -(-height // TILE_H)
    c = img.shape[0]
    pad = jnp.zeros((c, gy * TILE_H, gx * TILE_W), img.dtype)
    pad = pad.at[:, :height, :width].set(img)
    t = pad.reshape(c, gy, TILE_H, gx, TILE_W)
    return t.transpose(1, 3, 0, 2, 4).reshape(gy * gx, c, PIX)


# ---------------------------------------------------------------------------
# in-kernel shared math

def _pixel_rows():
    """(1, PIX) tile-local pixel coordinate rows (flat p → (y,x) =
    divmod(p, TILE_W)) for VPU polynomial evaluation."""
    flat = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    x = (flat % TILE_W).astype(jnp.float32)
    y = (flat // TILE_W).astype(jnp.float32)
    return x, y


def _pixel_basis16():
    """(16, PIX) constant basis: rows 6..11 = [1, x, y, x², xy, y²] in
    tile-local pixel coordinates, aligned with the k0..k5 instance lanes;
    all other rows zero.  Used only for the backward's moment matmul
    (contraction over the 1024 pixels — the full-depth MXU direction)."""
    x, y = _pixel_rows()
    one = jnp.ones_like(x)
    z = jnp.zeros_like(x)
    return jnp.concatenate(
        [z, z, z, z, z, z, one, x, y, x * x, x * y, y * y, z, z, z, z],
        axis=0)                                    # (16, PIX)


# Sub-group size of the two-level prefix scan.  128 matches the MXU tile:
# a (128,128) triangular block runs at full systolic-array occupancy,
# where the previous 32-wide groups wasted 4x on both the sublane and
# contraction dimensions (measured: the scan dominated both kernels).
CUM_GROUP = 128


def _onehot16(i: int):
    """(1, ILANES) constant one-hot row — places a (CHUNK,1) column into
    grad-output lane ``i`` via a broadcast multiply."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, ILANES), 1)
    return (iota == i).astype(jnp.float32)


def _lower_tri():
    """(CUM_GROUP, CUM_GROUP) inclusive-prefix matrix: L[i,j]=1 if j<=i."""
    i = jax.lax.broadcasted_iota(jnp.int32, (CUM_GROUP, CUM_GROUP), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (CUM_GROUP, CUM_GROUP), 1)
    return (j <= i).astype(jnp.float32)


def _chunk_blend(data, xr, yr, slot_valid):
    """Shared forward math for one chunk.

    data: (CHUNK,16) packed instance rows; xr/yr: (1,PIX) pixel rows;
    slot_valid: (CHUNK,1) bool.  Returns (alpha, valid, alpha_v, logs,
    g_exp) each (CHUNK,PIX) — alpha clamped to 0.99; valid includes the
    power/255 tests; logs = log1p(-alpha·valid).

    The degree-2 power polynomial is evaluated on the VPU as broadcast
    FMAs of (CHUNK,1) coefficient columns against the (1,PIX) coordinate
    rows — a (CHUNK,16)@(16,PIX) matmul here runs at 16/128 systolic
    depth, so the MXU is the *slower* unit for this contraction.
    """
    power = (data[:, 6:7]
             + (data[:, 7:8] + data[:, 9:10] * xr + data[:, 10:11] * yr)
             * xr
             + (data[:, 8:9] + data[:, 11:12] * yr) * yr)
    g_exp = jnp.exp(power)
    op = data[:, 0:1]
    alpha = jnp.minimum(op * g_exp, 0.99)
    valid = slot_valid & (power <= 0.0) & (alpha >= ALPHA_MIN)
    alpha_v = jnp.where(valid, alpha, 0.0)
    logs = jnp.log1p(-alpha_v)
    return alpha, valid, alpha_v, logs, g_exp


def _cumsum_chunk(vals, ltri):
    """Inclusive prefix sum along the instance axis via MXU.

    Two-level scan: (CUM_GROUP×CUM_GROUP) triangular matmuls within each
    sub-group plus a carried group offset — 8× fewer MACs than one
    (CHUNK,CHUNK) triangular matmul, same fp32 result order per group.
    """
    parts = []
    off = jnp.zeros((1, vals.shape[1]), jnp.float32)
    for g in range(CHUNK // CUM_GROUP):
        blk = vals[g * CUM_GROUP:(g + 1) * CUM_GROUP, :]
        pre = jax.lax.dot_general(
            ltri, blk, (((1,), (0,)), ((), ())),
            precision=_HIGHEST, preferred_element_type=jnp.float32) + off
        parts.append(pre)
        off = pre[CUM_GROUP - 1:CUM_GROUP, :]
    return jnp.concatenate(parts, axis=0)


# ---------------------------------------------------------------------------
# forward kernel

def _fwd_kernel(tile_start, tile_count, inst_hbm, out_ref, buf, sem,
                carry, tmin):
    t = pl.program_id(0)
    start = tile_start[t]
    count = tile_count[t]
    nchunks = pl.cdiv(count, CHUNK)

    xr, yr = _pixel_rows()
    ltri = _lower_tri()
    log_stop = np.float32(np.log(T_STOP))

    out_ref[...] = jnp.zeros((8, PIX), jnp.float32)
    carry[...] = jnp.zeros((1, PIX), jnp.float32)
    tmin[...] = jnp.ones((1, PIX), jnp.float32)

    def get_dma(slot, k):
        return pltpu.make_async_copy(
            inst_hbm.at[pl.ds(start + k * CHUNK, CHUNK), :],
            buf.at[slot], sem.at[slot])

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    def body(k, _):
        cur = jax.lax.rem(k, 2)
        # double buffering: next chunk's DMA flies while this one computes
        @pl.when(k + 1 < nchunks)
        def _():
            get_dma(1 - cur, k + 1).start()
        get_dma(cur, k).wait()
        data = buf[cur][:, 0:ILANES]
        sl = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        slot_valid = (k * CHUNK + sl) < count
        alpha, valid, alpha_v, logs, _ = _chunk_blend(data, xr, yr,
                                                      slot_valid)
        cum = _cumsum_chunk(logs, ltri) + carry[0:1, :]
        p_exc = jnp.exp(cum - logs)            # T before this instance
        p_inc = p_exc * (1.0 - alpha_v)        # T after (division-free)
        applied = valid & (p_inc >= T_STOP)
        w = jnp.where(applied, alpha * p_exc, 0.0)          # (CHUNK,PIX)
        feats = data[:, 0:8]     # op,r,g,b,depth,unc,k0,k1 → rows 1..5 used
        acc = jax.lax.dot_general(
            feats, w, (((0,), (0,)), ((), ())),
            precision=_HIGHEST, preferred_element_type=jnp.float32)  # (8,PIX)
        out_ref[...] += acc
        tmin[...] = jnp.minimum(
            tmin[...],
            jnp.min(jnp.where(p_inc >= T_STOP, p_inc, 1.0), axis=0,
                    keepdims=True))
        carry[...] = carry[...] + jnp.sum(logs, axis=0, keepdims=True)
        # alive while any pixel's transmittance can still exceed the stop
        return jnp.max(carry[0:1, :]) >= log_stop

    def cond(state):
        k, alive = state
        return jnp.logical_and(k < nchunks, alive)

    def wbody(state):
        k, _ = state
        alive = body(k, None)
        return (k + 1, alive)

    kf, _ = jax.lax.while_loop(cond, wbody, (jnp.int32(0), jnp.bool_(True)))
    # drain an orphaned prefetch if the early exit fired mid-stream
    @pl.when(kf < nchunks)
    def _():
        get_dma(jax.lax.rem(kf, 2), kf).wait()
    # final transmittance goes to channel row 6 (over the unused k0 sum)
    out_ref[6:7, :] = tmin[...]


def _run_forward(inst_packed, tile_start, tile_count, n_tiles: int,
                 interpret: bool):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((None, 8, PIX), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((1, PIX), jnp.float32),
            pltpu.VMEM((1, PIX), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _fwd_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8, PIX), jnp.float32),
        interpret=interpret,
    )(tile_start, tile_count, inst_packed)


# ---------------------------------------------------------------------------
# backward kernel

def _bwd_kernel(tile_start, tile_count, inst_hbm, pix_ref, grad_hbm,
                buf, gbuf, sem, gsem, carry, prefr):
    """pix_ref rows: [g_r, g_g, g_b, g_depth, g_unc, Total, gTT, 0]."""
    t = pl.program_id(0)
    start = tile_start[t]
    count = tile_count[t]
    nchunks = pl.cdiv(count, CHUNK)

    basis = _pixel_basis16()
    xr, yr = _pixel_rows()
    ltri = _lower_tri()
    log_stop = np.float32(np.log(T_STOP))

    carry[...] = jnp.zeros((1, PIX), jnp.float32)
    prefr[...] = jnp.zeros((1, PIX), jnp.float32)
    # grad lanes 16.. are never written by the compute path — zero them
    # once (scratch persists across the sequential grid)
    @pl.when(t == 0)
    def _():
        gbuf[0] = jnp.zeros((CHUNK, LANES), jnp.float32)
        gbuf[1] = jnp.zeros((CHUNK, LANES), jnp.float32)

    total = pix_ref[5:6, :]
    gtt = pix_ref[6:7, :]
    zrow = jnp.zeros((1, PIX), jnp.float32)
    # (16,PIX): channel-grad rows at 1..5, aligned with the color lanes of
    # the instance layout, so γ and the per-channel sums are single matmuls
    gstack = jnp.concatenate(
        [zrow, pix_ref[0:5, :]] + [zrow] * 10, axis=0)

    def get_dma(slot, k):
        return pltpu.make_async_copy(
            inst_hbm.at[pl.ds(start + k * CHUNK, CHUNK), :],
            buf.at[slot], sem.at[slot])

    def get_gdma(slot, k):
        return pltpu.make_async_copy(
            gbuf.at[slot], grad_hbm.at[pl.ds(start + k * CHUNK, CHUNK), :],
            gsem.at[slot])

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    def body(k, _):
        cur = jax.lax.rem(k, 2)
        @pl.when(k + 1 < nchunks)
        def _():
            get_dma(1 - cur, k + 1).start()
        get_dma(cur, k).wait()
        data = buf[cur][:, 0:ILANES]
        sl = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        slot_valid = (k * CHUNK + sl) < count
        alpha, valid, alpha_v, logs, g_exp = _chunk_blend(data, xr, yr,
                                                          slot_valid)
        cum = _cumsum_chunk(logs, ltri) + carry[0:1, :]
        p_exc = jnp.exp(cum - logs)
        p_inc = p_exc * (1.0 - alpha_v)
        applied = valid & (p_inc >= T_STOP)
        w = jnp.where(applied, alpha * p_exc, 0.0)

        # γ_ip = Σ_c chan_ic·g_cp — VPU broadcast FMAs (K=5 on the MXU
        # would run at 5/128 depth)
        gamma = (data[:, 1:2] * pix_ref[0:1, :]
                 + data[:, 2:3] * pix_ref[1:2, :]
                 + data[:, 3:4] * pix_ref[2:3, :]
                 + data[:, 4:5] * pix_ref[3:4, :]
                 + data[:, 5:6] * pix_ref[4:5, :])
        m = jnp.where(applied, gamma * w, 0.0)
        pref = _cumsum_chunk(m, ltri) + prefr[0:1, :]
        # suffix of γw strictly after i, plus the background/final-T term
        suffix = total - pref + gtt
        dalpha = jnp.where(applied,
                           gamma * p_exc - suffix / (1.0 - alpha_v), 0.0)
        x_mat = jnp.where(applied, dalpha * g_exp, 0.0)      # (CHUNK,PIX)

        # per-instance reductions over pixels (full 1024-deep MXU
        # contractions): moments of X against the pixel basis (lanes
        # 6..11) + channel grads Σ_p w·g_c (lanes 1..5) — disjoint lanes
        mom = jax.lax.dot_general(
            x_mat, basis, (((1,), (1,)), ((), ())),
            precision=_HIGHEST, preferred_element_type=jnp.float32)
        dfeat = jax.lax.dot_general(
            w, gstack, (((1,), (1,)), ((), ())),
            precision=_HIGHEST, preferred_element_type=jnp.float32)

        # shift the tile-local moments into the gaussian's rounded-center
        # frame right here (sx/sy ride the instance rows): per-instance
        # VPU work on (CHUNK,1) columns placed via one-hot lane rows —
        # the rows leave the kernel reduction-ready
        sx = data[:, 12:13]
        sy = data[:, 13:14]
        m0 = mom[:, 6:7]
        mx = mom[:, 7:8]
        my = mom[:, 8:9]
        conv = mom + dfeat
        conv = (conv
                + (sx * m0) * _onehot16(7)
                + (sy * m0) * _onehot16(8)
                + (2.0 * sx * mx + sx * sx * m0) * _onehot16(9)
                + (sx * my + sy * mx + sx * sy * m0) * _onehot16(10)
                + (2.0 * sy * my + sy * sy * m0) * _onehot16(11))

        # wait for the write that used this output slot two chunks ago
        @pl.when(k >= 2)
        def _():
            get_gdma(cur, k - 2).wait()
        gbuf[cur, :, 0:ILANES] = conv
        get_gdma(cur, k).start()

        prefr[...] = prefr[...] + jnp.sum(m, axis=0, keepdims=True)
        carry[...] = carry[...] + jnp.sum(logs, axis=0, keepdims=True)
        # alive while any pixel could still apply another gaussian — the
        # same early stop as the forward; later instances get zero grads
        return jnp.max(carry[0:1, :]) >= log_stop

    def cond(state):
        k, alive = state
        return jnp.logical_and(k < nchunks, alive)

    def wbody(state):
        k, _ = state
        return (k + 1, body(k, None))

    kf, _ = jax.lax.while_loop(cond, wbody, (jnp.int32(0), jnp.bool_(True)))
    # drain outstanding grad writes from the compute phase
    @pl.when(kf >= 2)
    def _():
        get_gdma(jax.lax.rem(kf - 2, 2), kf - 2).wait()
    @pl.when(kf >= 1)
    def _():
        get_gdma(jax.lax.rem(kf - 1, 2), kf - 1).wait()
    # drain an orphaned input prefetch from the early exit
    @pl.when(kf < nchunks)
    def _():
        get_dma(jax.lax.rem(kf, 2), kf).wait()
    # chunks skipped by the early exit still own output slots — their
    # gradients are exactly zero, written without compute
    @pl.when(kf < nchunks)
    def _():
        gbuf[0] = jnp.zeros((CHUNK, LANES), jnp.float32)
        def zbody(k, _):
            d = get_gdma(0, k)
            d.start()
            d.wait()
            return 0
        jax.lax.fori_loop(kf, nchunks, zbody, 0)

    # sentinel-tail slots (instances past the last real tile) are owned by
    # no tile; zero them so garbage HBM can never reach the segment
    # reduction's indicator matmul (0 * Inf = NaN there).  Double-buffered
    # zero DMAs — pure HBM write bandwidth.
    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        cap_rows = grad_hbm.shape[0]
        end = start + count
        gbuf[0] = jnp.zeros((CHUNK, LANES), jnp.float32)
        gbuf[1] = jnp.zeros((CHUNK, LANES), jnp.float32)

        def zdma(s, j):
            return pltpu.make_async_copy(
                gbuf.at[s], grad_hbm.at[pl.ds(end + j * CHUNK, CHUNK), :],
                gsem.at[s])

        nz = (cap_rows - end) // CHUNK
        def zt(j, _):
            s = jax.lax.rem(j, 2)
            @pl.when(j >= 2)
            def _():
                zdma(s, j - 2).wait()
            zdma(s, j).start()
            return 0
        jax.lax.fori_loop(0, nz, zt, 0)
        @pl.when(nz >= 2)
        def _():
            zdma(jax.lax.rem(nz, 2), nz - 2).wait()
        @pl.when(nz >= 1)
        def _():
            zdma(jax.lax.rem(nz + 1, 2), nz - 1).wait()


def _run_backward(inst_packed, pix_tiles, tile_start, tile_count,
                  n_tiles: int, interpret: bool):
    cap_pad = inst_packed.shape[0]           # capacity + PAD_SLOTS
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((None, 8, PIX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, LANES), jnp.float32),
            pltpu.VMEM((2, CHUNK, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((1, PIX), jnp.float32),
            pltpu.VMEM((1, PIX), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _bwd_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cap_pad, LANES), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_start, tile_count, inst_packed, pix_tiles)


# ---------------------------------------------------------------------------
# per-gaussian gradient chain (pure JAX, fuses into the surrounding graph)

def pergauss_chain(pg, mean2d, conic, opacity):
    """Per-gaussian moment sums → (d_mean2d, d_conic, d_op, d_col, d_depth,
    d_unc).

    The reference computes these per (pixel, instance) inside the kernel
    (backward.cu:570-601); here the chain runs once per *gaussian* on the
    reduced centered moments — identical math because the moment form of
    ∂power/∂(mean, conic) is translation-covariant.
    """
    d_col = pg[:, 1:4]
    d_depth = pg[:, 4]
    d_unc = pg[:, 5]
    m0 = pg[:, 6]
    mxs = pg[:, 7]
    mys = pg[:, 8]
    mxxs = pg[:, 9]
    mxys = pg[:, 10]
    myys = pg[:, 11]
    mxc = mean2d[:, 0] - jnp.round(mean2d[:, 0])
    myc = mean2d[:, 1] - jnp.round(mean2d[:, 1])
    ca, cb, cc = conic[:, 0], conic[:, 1], conic[:, 2]
    op = opacity
    d_op = m0
    # dpower-moments = op·X-moments; ∂power/∂mx = -(ca·dx + cb·dy), etc.
    dmx = op * (-(ca * mxc + cb * myc) * m0 + ca * mxs + cb * mys)
    dmy = op * (-(cc * myc + cb * mxc) * m0 + cc * mys + cb * mxs)
    dca = op * (-0.5) * (mxc * mxc * m0 - 2.0 * mxc * mxs + mxxs)
    dcc = op * (-0.5) * (myc * myc * m0 - 2.0 * myc * mys + myys)
    dcb = op * (-(mxc * myc * m0 - mxc * mys - myc * mxs + mxys))
    d_mean2d = jnp.stack([dmx, dmy], axis=1)
    d_conic = jnp.stack([dca, dcb, dcc], axis=1)
    return d_mean2d, d_conic, d_op, d_col, d_depth, d_unc


# ---------------------------------------------------------------------------
# per-gaussian segment reduction (replaces the XLA scatter-add, which
# costs ~150 ms at 2M instances — TPU scatters are element-rate bound)

SEG_GB = 256       # gaussians per reduction block
SEG_RCAP = 256     # packed rows (8 instances each) per inner step


def _segreduce_kernel(off_ref, packed_hbm, out_ref, buf, sem):
    """Sum emission-contiguous instance-gradient runs per gaussian.

    packed_hbm: (rows,128) — 8 instances × 16 floats per row, emission
    order.  off_ref: (1, SEG_GB+1) this block's gaussian offsets.  For
    each sub-lane-group φ an indicator matmul S_φ @ X accumulates every
    instance of each gaussian; the φ-th 16-lane slice of the product is
    the per-gaussian sum for instances at position φ within their row.
    """
    start_i = off_ref[0, 0]
    end_i = off_ref[SEG_GB, 0]
    r0 = start_i // 8
    r1 = (end_i + 7) // 8
    nchunks = pl.cdiv(r1 - r0, SEG_RCAP)

    out_ref[...] = jnp.zeros((SEG_GB, 16), jnp.float32)
    lo = off_ref[0:SEG_GB, :]                      # (SEG_GB,1) [lo, hi)
    hi = off_ref[1:SEG_GB + 1, :]
    riota = jax.lax.broadcasted_iota(jnp.int32, (1, SEG_RCAP), 1)

    def body(j, _):
        cp = pltpu.make_async_copy(
            packed_hbm.at[pl.ds(r0 + j * SEG_RCAP, SEG_RCAP), :],
            buf, sem)
        cp.start()
        cp.wait()
        x = buf[...]                               # (SEG_RCAP,128)
        row_base = r0 + j * SEG_RCAP
        acc = jnp.zeros((SEG_GB, 16), jnp.float32)
        for phi in range(8):
            inst = (row_base + riota) * 8 + phi    # (1,SEG_RCAP)
            s = ((inst >= lo) & (inst < hi)).astype(jnp.float32)
            y = jax.lax.dot_general(
                s, x, (((1,), (0,)), ((), ())),
                precision=_HIGHEST,
                preferred_element_type=jnp.float32)   # (SEG_GB,128)
            acc = acc + y[:, 16 * phi:16 * phi + 16]
        out_ref[...] += acc
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)


def segment_reduce_grads(conv, binning: Binning, n_gauss: int,
                         interpret: bool):
    """(capacity, 16) sorted-order instance rows → (N, 16) per-gaussian sums.

    Pipeline: carry the 11 used grad columns through one multi-operand
    stable sort on the emission slot (TPU sorts stream sequentially where
    gathers pay random access), pack 8 instances per 128-lane row, then
    run the indicator-matmul reduction kernel.
    """
    cap = binning.emit_slot.shape[0]
    if os.environ.get("GSCREAM_REORDER_GATHER"):
        # row-gather variant (random access; ~46 ms at 2M rows)
        iota = jnp.arange(cap, dtype=jnp.int32)
        _, inv = jax.lax.sort((binning.emit_slot, iota), num_keys=1,
                              is_stable=True)      # inv[e] = sorted pos
        ge = conv[inv]                             # (cap,16) emission order
    else:
        cols = tuple(conv[:, i] for i in range(1, 12))
        out = jax.lax.sort((binning.emit_slot,) + cols, num_keys=1,
                           is_stable=True)
        z = jnp.zeros((cap,), jnp.float32)
        ge = jnp.stack((z,) + out[1:12] + (z, z, z, z), axis=1)  # (cap,16)
    rows = cap // 8
    packed = ge.reshape(rows, 128)
    packed = jnp.concatenate(
        [packed, jnp.zeros((SEG_RCAP, 128), jnp.float32)], axis=0)

    n_pad = -(-n_gauss // SEG_GB) * SEG_GB
    offs = jnp.pad(binning.offsets, (0, n_pad + 1 - binning.offsets.shape[0]),
                   mode="edge")
    # per-block overlapped offset windows (SEG_GB+1 each), sublane-major
    idx = (jnp.arange(n_pad // SEG_GB)[:, None] * SEG_GB
           + jnp.arange(SEG_GB + 1)[None, :])
    off_blocks = offs[idx][..., None]              # (n_blocks, SEG_GB+1, 1)

    n_blocks = n_pad // SEG_GB
    out = pl.pallas_call(
        _segreduce_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((None, SEG_GB + 1, 1), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((None, SEG_GB, 16), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((SEG_RCAP, 128), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_blocks, SEG_GB, 16), jnp.float32),
        interpret=interpret,
    )(off_blocks, packed)
    return out.reshape(n_pad, 16)[:n_gauss]


# ---------------------------------------------------------------------------
# custom_vjp wrapper

@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def rasterize_tiled(mean2d, conic, opacity, colors, depth, unc,
                    binning: Binning, bg, width: int, height: int,
                    interpret: bool):
    out, _ = _raster_fwd(mean2d, conic, opacity, colors, depth, unc,
                         binning, bg, width, height, interpret)
    return out


def _raster_fwd(mean2d, conic, opacity, colors, depth, unc,
                binning: Binning, bg, width, height, interpret):
    gx = -(-width // TILE_W)
    gy = -(-height // TILE_H)
    n_tiles = gx * gy
    inst = pack_instance_data(mean2d, conic, opacity, colors, depth, unc,
                              binning, gx)
    tiles = _run_forward(inst, binning.tile_start, binning.tile_count,
                         n_tiles, interpret)
    img = tiles_to_image(tiles, width, height)     # (8,H,W)
    raw_c = img[1:4]
    d_img = img[4]
    u_img = img[5]
    t_img = img[6]
    color = raw_c + t_img[None] * bg[:, None, None]
    out = TiledOut(color=color.transpose(1, 2, 0), depth=d_img,
                   uncertainty=u_img, final_t=t_img)
    res = (inst, binning, bg, raw_c, d_img, u_img, t_img,
           mean2d, conic, opacity)
    return out, res


def _raster_bwd(width, height, interpret, res, g: TiledOut):
    inst, binning, bg, raw_c, d_img, u_img, t_img, mean2d, conic, op = res
    n_gauss = mean2d.shape[0]
    gx = -(-width // TILE_W)
    gy = -(-height // TILE_H)
    n_tiles = gx * gy

    g_color = g.color.transpose(2, 0, 1)           # (3,H,W)
    g_depth = g.depth
    g_unc = g.uncertainty
    g_tfin = g.final_t
    # effective final-T cotangent: direct + background compositing path
    gtt_img = (jnp.einsum('c,chw->hw', bg, g_color) + g_tfin) * t_img
    total_img = (jnp.einsum('chw,chw->hw', raw_c, g_color)
                 + d_img * g_depth + u_img * g_unc)
    pix = jnp.stack([
        g_color[0], g_color[1], g_color[2], g_depth, g_unc,
        total_img, gtt_img, jnp.zeros_like(g_depth)], axis=0)  # (8,H,W)
    pix_tiles = image_to_tiles(pix, width, height)

    raw = _run_backward(inst, pix_tiles, binning.tile_start,
                        binning.tile_count, n_tiles, interpret)
    cap = binning.gauss_id.shape[0]
    # rows leave the kernel already centered (sx/sy shift applied
    # in-kernel) and the sentinel tail zero-filled — reduction-ready
    conv = raw[:cap, :ILANES]

    if os.environ.get("GSCREAM_SCATTER_REDUCE"):
        # fallback: XLA scatter-add (~150 ms at 2M instances)
        per_gauss = jax.ops.segment_sum(conv, binning.gauss_id,
                                        num_segments=n_gauss)
    else:
        per_gauss = segment_reduce_grads(conv, binning, n_gauss, interpret)
    d_mean2d, d_conic, d_op, d_col, d_depth, d_unc = pergauss_chain(
        per_gauss, mean2d, conic, op)
    # bg cotangent: out_color = C + T·bg  ⇒  d bg = Σ_p T_p · g_color_p
    d_bg = jnp.einsum('hw,chw->c', t_img, g_color)
    # Binning holds integer index arrays — their cotangent is float0 zeros
    d_binning = jax.tree.map(
        lambda x: np.zeros(x.shape, jax.dtypes.float0), binning)
    return (d_mean2d, d_conic, d_op, d_col, d_depth, d_unc, d_binning, d_bg)


rasterize_tiled.defvjp(_raster_fwd, _raster_bwd)


# ---------------------------------------------------------------------------
# high-level entry

def render_tiled(means3d, scales, rots, colors, opacity, unc, camera, bg,
                 capacity: int = 2 ** 21, scale_modifier: float = 1.0,
                 interpret: bool | None = None):
    """preprocess → bin → rasterize.  Returns (TiledOut, aux dict).

    aux carries the binning overflow counter (``num_instances`` vs
    ``capacity`` — never silently dropped) and the splats for
    densification statistics.
    """
    if interpret is None:
        interpret = _interpret_default()
    splats = preprocess(means3d, scales, rots, camera.w2c, camera.full_proj,
                        camera.width, camera.height, camera.tan_fovx,
                        camera.tan_fovy, scale_modifier,
                        tile_w=TILE_W, tile_h=TILE_H)
    binning = bin_instances(splats, capacity, camera.width, camera.height,
                            TILE_W, TILE_H)
    out = rasterize_tiled(splats.mean2d, splats.conic, opacity, colors,
                          splats.depth, unc, binning, bg,
                          camera.width, camera.height, interpret)
    aux = {"radius": splats.radius, "num_instances": binning.num_instances,
           "capacity": capacity, "splats": splats}
    return out, aux
