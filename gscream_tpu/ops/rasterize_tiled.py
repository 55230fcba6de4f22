"""Tiled Pallas rasterizer: forward + analytic backward (custom_vjp).

TPU-native replacement for the reference CUDA tile renderer
(``cuda_rasterizer/forward.cu:441-568`` and ``backward.cu:409-604``), built
around three ideas that map the splatting math onto TPU hardware:

1. **Quadratic-basis MXU evaluation.**  For every (instance, pixel) pair the
   gaussian exponent is a degree-2 polynomial in the pixel coordinates, so a
   whole chunk of G instances × P pixels of ``power`` values is one
   ``(G,8) @ (8,P)`` matmul against the constant pixel basis
   ``[1, x, y, x², xy, y²]`` — the MXU computes what CUDA evaluates with
   per-thread scalar math.  Tile-local coordinates keep the basis terms
   small so fp32 precision holds.

2. **Prefix-scan transmittance.**  The sequential front-to-back blend
   ``T ← T·(1-α)`` becomes a cumulative sum of ``log1p(-α)`` along the
   instance axis (a lower-triangular matmul on the MXU), after which the
   per-instance blend weights ``w = α·T_prev`` are data-parallel.  See
   ``rasterize_ref.py`` for the proof that this reproduces the reference's
   early-stop (``T < 1e-4``) semantics exactly.

3. **Deterministic gradient scatter.**  The backward kernel writes
   per-*instance* gradients to disjoint slots (each instance belongs to one
   tile), then a ``segment_sum`` over source gaussian ids replaces CUDA's
   nondeterministic ``atomicAdd`` (backward.cu:554-601) — SURVEY.md §5
   "race detection" note.

The backward math follows backward.cu exactly, including its pass-through
treatment of the 0.99 alpha clamp; the suffix sums that CUDA accumulates
back-to-front (``accum_rec``) are obtained from the identity

    Σ_{j>i} γ_j w_j  =  Total − Σ_{j≤i} γ_j w_j,

with ``Total = (C − T·bg)·gC + D·gD + U·gU`` available from saved forward
outputs, so the backward also runs front-to-back in one pass.
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
INST_W = 128          # floats per instance row (lane-aligned; 11 used)
LANES = 128
SUBLANES = PIX // LANES

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

def pack_instance_data(splats_mean2d, conic, opacity, colors, depth, unc,
                       binning: Binning, grid_x: int):
    """Gather per-gaussian attributes into sorted instance order.

    Layout (capacity, 128) float32 — one 512-byte row per instance, first
    11 lanes used: [mx, my, ca, cb, cc, op, r, g, b, depth, unc, 0...].
    The row width matches the TPU lane tiling (Mosaic requires 128-aligned
    HBM slices for the chunk DMA) and makes the per-instance gather a
    single aligned row copy.  mx/my stay in *global* pixel coordinates —
    the kernel subtracts its own tile origin (it knows its tile index)
    so no per-instance fix-up pass is needed here.
    """
    attrs = jnp.concatenate([
        splats_mean2d, conic, opacity[:, None], colors,
        depth[:, None], unc[:, None],
    ], axis=1)                                     # (N, 11)
    attrs = jnp.pad(attrs, ((0, 0), (0, INST_W - attrs.shape[1])))
    return attrs[binning.gauss_id]                 # one row-gather


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

def _pixel_basis():
    """(8, PIX) constant basis rows [1, x, y, x², xy, y², 0, 0] in
    tile-local pixel coordinates (flat index p → (y,x) = divmod(p, TILE_W))."""
    flat = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    x = (flat % TILE_W).astype(jnp.float32)
    y = (flat // TILE_W).astype(jnp.float32)
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    return jnp.concatenate(
        [one, x, y, x * x, x * y, y * y, zero, zero], axis=0)  # (8, PIX)


CUM_GROUP = 32        # sub-group size of the two-level prefix scan


def _lower_tri():
    """(CUM_GROUP, CUM_GROUP) inclusive-prefix matrix: L[i,j]=1 if j<=i."""
    i = jax.lax.broadcasted_iota(jnp.int32, (CUM_GROUP, CUM_GROUP), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (CUM_GROUP, CUM_GROUP), 1)
    return (j <= i).astype(jnp.float32)


def _chunk_alpha(buf, basis, slot_valid, origin_x, origin_y):
    """Shared forward math for one chunk.

    buf: (CHUNK,INST_W) instance attributes (global-pixel mean2d); basis:
    (8,PIX); slot_valid: (CHUNK,1) bool; origin_x/y: this tile's pixel
    origin (scalars).  Returns (alpha, valid, logs, G=exp(power)) each
    (CHUNK,PIX) — alpha clamped to 0.99, valid includes the power/255
    tests, logs = log1p(-alpha·valid).
    """
    mx = buf[:, 0:1] - origin_x
    my = buf[:, 1:2] - origin_y
    ca = buf[:, 2:3]
    cb = buf[:, 3:4]
    cc = buf[:, 4:5]
    op = buf[:, 5:6]
    # power = -.5·ca·dx² -.5·cc·dy² - cb·dx·dy,  dx = mx-x, dy = my-y
    # as K @ basis with K = [k0, k1, k2, k3, k4, k5, 0, 0]:
    k0 = -0.5 * (ca * mx * mx + cc * my * my) - cb * mx * my
    k1 = ca * mx + cb * my
    k2 = cc * my + cb * mx
    k3 = jnp.broadcast_to(-0.5 * ca, k0.shape)
    k4 = jnp.broadcast_to(-cb, k0.shape)
    k5 = jnp.broadcast_to(-0.5 * cc, k0.shape)
    zero = jnp.zeros_like(k0)
    K = jnp.concatenate([k0, k1, k2, k3, k4, k5, zero, zero], axis=1)
    power = jax.lax.dot_general(
        K, basis, (((1,), (0,)), ((), ())),
        precision=_HIGHEST, preferred_element_type=jnp.float32)  # (CHUNK,PIX)
    g_exp = jnp.exp(power)
    a_raw = op * g_exp
    alpha = jnp.minimum(a_raw, 0.99)
    valid = slot_valid & (power <= 0.0) & (alpha >= ALPHA_MIN)
    alpha_v = jnp.where(valid, alpha, 0.0)
    logs = jnp.log1p(-alpha_v)
    return alpha, valid, logs, g_exp


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

def _fwd_kernel(grid_x, tile_start, tile_count, tile_off, inst_hbm,
                out_ref, buf, sem, carry, tmin):
    t = pl.program_id(0)
    start = tile_start[t]
    count = tile_count[t]
    nchunks = pl.cdiv(count, CHUNK)
    gt = tile_off[0] + t
    origin_x = ((gt % grid_x) * TILE_W).astype(jnp.float32)
    origin_y = ((gt // grid_x) * TILE_H).astype(jnp.float32)

    basis = _pixel_basis()
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
        data = buf[cur]
        sl = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        slot_valid = (k * CHUNK + sl) < count
        alpha, valid, logs, _ = _chunk_alpha(data, basis, slot_valid,
                                             origin_x, origin_y)
        cum = _cumsum_chunk(logs, ltri) + carry[0:1, :]
        p_inc = jnp.exp(cum)
        alpha_v = jnp.where(valid, alpha, 0.0)
        p_exc = p_inc / (1.0 - alpha_v)
        applied = valid & (p_inc >= T_STOP)
        w = jnp.where(applied, alpha * p_exc, 0.0)          # (CHUNK,PIX)
        feats = data[:, 6:14]    # r,g,b,depth,unc + 3 zero lanes → (CHUNK,8)
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
    # final transmittance goes to channel row 5
    out_ref[5:6, :] = tmin[...]


def _run_forward(inst_data, tile_start, tile_count, n_tiles: int,
                 interpret: bool, grid_x: int, tile_offset=None):
    cap = inst_data.shape[0]
    if tile_offset is None:
        tile_offset = jnp.zeros((1,), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((None, 8, PIX), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, INST_W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((1, PIX), jnp.float32),
            pltpu.VMEM((1, PIX), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, grid_x),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8, PIX), jnp.float32),
        interpret=interpret,
    )(tile_start, tile_count, tile_offset, inst_data)


# ---------------------------------------------------------------------------
# backward kernel

def _bwd_kernel(grid_x, tile_start, tile_count, tile_off, inst_hbm,
                pix_ref, grad_hbm, buf, gbuf, sem, gsem, carry, prefr):
    """pix_ref rows: [g_r, g_g, g_b, g_depth, g_unc, Total, gTT, 0]."""
    t = pl.program_id(0)
    start = tile_start[t]
    count = tile_count[t]
    nchunks = pl.cdiv(count, CHUNK)
    gt = tile_off[0] + t
    origin_x = ((gt % grid_x) * TILE_W).astype(jnp.float32)
    origin_y = ((gt // grid_x) * TILE_H).astype(jnp.float32)

    basis = _pixel_basis()
    ltri = _lower_tri()
    log_stop = np.float32(np.log(T_STOP))

    carry[...] = jnp.zeros((1, PIX), jnp.float32)
    prefr[...] = jnp.zeros((1, PIX), jnp.float32)

    # loop-invariant pixel-cotangent rows
    gr = pix_ref[0:1, :]
    gg = pix_ref[1:2, :]
    gb = pix_ref[2:3, :]
    gd = pix_ref[3:4, :]
    gu = pix_ref[4:5, :]
    total = pix_ref[5:6, :]
    gtt = pix_ref[6:7, :]
    gstack = jnp.concatenate([gr, gg, gb, gd, gu,
                              jnp.zeros_like(gr), jnp.zeros_like(gr),
                              jnp.zeros_like(gr)], axis=0)       # (8,PIX)

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
        data = buf[cur]
        sl = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        slot_valid = (k * CHUNK + sl) < count
        alpha, valid, logs, g_exp = _chunk_alpha(data, basis, slot_valid,
                                                 origin_x, origin_y)
        cum = _cumsum_chunk(logs, ltri) + carry[0:1, :]
        p_inc = jnp.exp(cum)
        alpha_v = jnp.where(valid, alpha, 0.0)
        p_exc = p_inc / (1.0 - alpha_v)
        applied = valid & (p_inc >= T_STOP)
        w = jnp.where(applied, alpha * p_exc, 0.0)

        # γ_ip = c_i·g_p (per-channel dot), (CHUNK,PIX)
        gamma = (data[:, 6:7] * gr + data[:, 7:8] * gg + data[:, 8:9] * gb
                 + data[:, 9:10] * gd + data[:, 10:11] * gu)
        m = gamma * w
        pref = _cumsum_chunk(m, ltri) + prefr[0:1, :]
        # suffix of γw strictly after i, plus the background/final-T term
        suffix = total - pref + gtt
        one_minus = 1.0 - alpha_v
        dalpha = jnp.where(applied,
                           gamma * p_exc - suffix / one_minus, 0.0)

        # per-instance reductions over pixels (all on the MXU):
        # 1) color/depth/unc grads: W @ [g...] → (CHUNK,5)
        dfeat = jax.lax.dot_general(
            w, gstack, (((1,), (1,)), ((), ())),
            precision=_HIGHEST, preferred_element_type=jnp.float32)  # (CHUNK,8)

        # 2) moments of X = dα·G against the pixel basis → mean2d/conic/op
        x_mat = dalpha * g_exp                               # (CHUNK,PIX)
        mom = jax.lax.dot_general(
            x_mat, basis, (((1,), (1,)), ((), ())),
            precision=_HIGHEST, preferred_element_type=jnp.float32)  # (CHUNK,8)
        m0, m_x, m_y = mom[:, 0:1], mom[:, 1:2], mom[:, 2:3]
        mxx, mxy, myy = mom[:, 3:4], mom[:, 4:5], mom[:, 5:6]

        mx = data[:, 0:1] - origin_x
        my = data[:, 1:2] - origin_y
        ca = data[:, 2:3]
        cb = data[:, 3:4]
        cc = data[:, 4:5]
        op = data[:, 5:6]
        # dop_i = Σ_p dα·G   (dα/dop = G, clamp passes through)
        dop = m0
        # dpower = dα·op·G = op·X;  moments of dpower = op * moments of X
        # ∂power/∂mx = -(ca·dx + cb·dy) = -(ca·(mx-x) + cb·(my-y))
        dmx = op * (-(ca * mx + cb * my) * m0 + ca * m_x + cb * m_y)
        dmy = op * (-(cc * my + cb * mx) * m0 + cc * m_y + cb * m_x)
        # ∂power/∂ca = -.5 dx² = -.5(mx² - 2mx·x + x²)
        dca = op * (-0.5) * (mx * mx * m0 - 2.0 * mx * m_x + mxx)
        dcc = op * (-0.5) * (my * my * m0 - 2.0 * my * m_y + myy)
        # ∂power/∂cb = -dx·dy = -(mx·my - mx·y - my·x + x·y)
        dcb = op * (-(mx * my * m0 - mx * m_y - my * m_x + mxy))

        # wait for the write that used this output slot two chunks ago
        @pl.when(k >= 2)
        def _():
            get_gdma(cur, k - 2).wait()
        gbuf[cur, :, 0:1] = dmx
        gbuf[cur, :, 1:2] = dmy
        gbuf[cur, :, 2:3] = dca
        gbuf[cur, :, 3:4] = dcb
        gbuf[cur, :, 4:5] = dcc
        gbuf[cur, :, 5:6] = dop
        gbuf[cur, :, 6:11] = dfeat[:, 0:5]
        gbuf[cur, :, 11:INST_W] = jnp.zeros((CHUNK, INST_W - 11),
                                            jnp.float32)
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
        gbuf[0] = jnp.zeros((CHUNK, INST_W), jnp.float32)
        def zbody(k, _):
            d = get_gdma(0, k)
            d.start()
            d.wait()
            return 0
        jax.lax.fori_loop(kf, nchunks, zbody, 0)


def _run_backward(inst_data, pix_tiles, tile_start, tile_count,
                  n_tiles: int, interpret: bool, grid_x: int,
                  tile_offset=None):
    cap = inst_data.shape[0]
    if tile_offset is None:
        tile_offset = jnp.zeros((1,), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((None, 8, PIX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, INST_W), jnp.float32),
            pltpu.VMEM((2, CHUNK, INST_W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((1, PIX), jnp.float32),
            pltpu.VMEM((1, PIX), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, grid_x),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cap, INST_W), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_start, tile_count, tile_offset, inst_data, pix_tiles)


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


def segment_reduce_grads(grads_sorted, binning: Binning, n_gauss: int,
                         interpret: bool):
    """(capacity, INST_W) sorted-order instance grads → (N, 16) sums.

    Pipeline: invert the binning permutation with one 2-int sort, row-
    gather the first 16 columns into emission order, pack 8 instances per
    128-lane row, then run the indicator-matmul reduction kernel.
    """
    cap = binning.emit_slot.shape[0]
    if os.environ.get("GSCREAM_REORDER_GATHER"):
        # row-gather variant (random access; ~46 ms at 2M rows)
        iota = jnp.arange(cap, dtype=jnp.int32)
        _, inv = jax.lax.sort((binning.emit_slot, iota), num_keys=1,
                              is_stable=True)      # inv[e] = sorted pos
        ge = grads_sorted[:, :16][inv]             # (cap,16) emission order
    else:
        # carry the grad columns through one multi-operand sort — TPU
        # sorts stream sequentially where gathers pay random access
        cols = tuple(grads_sorted[:, i] for i in range(16))
        out = jax.lax.sort((binning.emit_slot,) + cols, num_keys=1,
                           is_stable=True)
        ge = jnp.stack(out[1:], axis=1)            # (cap,16)
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
    # one extra zero chunk so the last (partial) chunk's DMA never reads
    # past the end of the buffer
    inst = jnp.concatenate(
        [inst, jnp.zeros((CHUNK, INST_W), jnp.float32)], axis=0)
    tiles = _run_forward(inst, binning.tile_start, binning.tile_count,
                         n_tiles, interpret, gx)
    img = tiles_to_image(tiles, width, height)     # (8,H,W)
    raw_c = img[0:3]
    d_img = img[3]
    u_img = img[4]
    t_img = img[5]
    color = raw_c + t_img[None] * bg[:, None, None]
    out = TiledOut(color=color.transpose(1, 2, 0), depth=d_img,
                   uncertainty=u_img, final_t=t_img)
    res = (inst, binning, bg, raw_c, d_img, u_img, t_img,
           mean2d.shape[0])
    return out, res


def _raster_bwd(width, height, interpret, res, g: TiledOut):
    inst, binning, bg, raw_c, d_img, u_img, t_img, n_gauss = res
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

    grads = _run_backward(inst, pix_tiles, binning.tile_start,
                          binning.tile_count, n_tiles, interpret, gx)
    # instances outside any tile (sentinel) or beyond the count never get
    # written — mask them out before the segment reduction
    grads = grads[:binning.gauss_id.shape[0]]
    valid_slot = binning.tile_id < n_tiles
    grads = jnp.where(valid_slot[:, None], grads, 0.0)

    if os.environ.get("GSCREAM_SCATTER_REDUCE"):
        # fallback: XLA scatter-add (~150 ms at 2M instances)
        per_gauss = jax.ops.segment_sum(grads[:, :11], binning.gauss_id,
                                        num_segments=n_gauss)
    else:
        per_gauss = segment_reduce_grads(grads, binning, n_gauss,
                                         interpret)[:, :11]
    d_mean2d = per_gauss[:, 0:2]
    d_conic = per_gauss[:, 2:5]
    d_op = per_gauss[:, 5]
    d_col = per_gauss[:, 6:9]
    d_depth = per_gauss[:, 9]
    d_unc = per_gauss[:, 10]
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
