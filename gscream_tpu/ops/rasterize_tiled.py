"""Tiled Pallas rasterizer: forward + analytic backward (custom_vjp).

TPU-native replacement for the reference CUDA tile renderer
(``cuda_rasterizer/forward.cu:441-568`` and ``backward.cu:409-604``), built
around four ideas that map the splatting math onto TPU hardware:

1. **Quadratic-basis evaluation.**  For every (instance, pixel) pair the
   gaussian exponent is a degree-2 polynomial in the pixel coordinates:
   per φ-lane-group the (R,1) coefficient columns broadcast-FMA against
   (1,PIX) coordinate rows on the VPU, or (GSCREAM_MXU_POWER=1) a whole
   chunk evaluates as one ``(8R,6) @ (6,PIX)`` matmul against the constant
   pixel basis ``[1, x, y, x², xy, y²]`` on the MXU.  The six per-instance
   coefficients are derived from the raw attributes in tile-local
   coordinates (so fp32 precision holds) — in-kernel by default (raw
   mode), amortized over the tile's 1024 pixels.  Instances pack 8 per
   128-lane HBM row (16 lanes each) on both the input and the
   grad-output side; tile ranges need no alignment — boundary instances
   of neighbouring tiles ride along masked (slot_valid), and boundary
   grad rows merge via a lane-granular head-skip DMA.

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

Instance lane layout (lanes 0..15 of a 128-lane row) — two modes:

* **legacy mode** (GSCREAM_KERNEL_COEFF=0, default): lanes are precomputed
  [op, r, g, b, depth, unc, k0..k5, sx, sy, 0, 0] with k0..k5 the
  tile-local power coefficients and sx = origin_x − round(mean_x);
* **raw mode** (GSCREAM_KERNEL_COEFF=1): lanes hold the per-GAUSSIAN
  attributes [op, r, g, b, depth, unc, mx, my, ca, cb, cc, 0×5] and the
  kernels derive the tile-local power polynomial and the centering
  shifts (sx, sy) themselves from the tile origin — deletes the
  capacity-scale packing interleave outside, but the r4 hardware A/B
  (99.2 vs 94.8 ms) showed the ~12 extra column ops per instance cost
  the VPU-bound kernels more than the pack saved; kept selectable for
  re-evaluation at other workload shapes.

Backward output layout: 8 instances per 128-lane row (lane group
16·(i%8)), each 16 lanes: 1-5: channel grads (w-weighted sums), 6-11:
moments of X against the tile-local basis [1, x, y, x², xy, y²],
0,12-15: 0.  A free reshape recovers (capacity, 16) rows.
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

from .binning import Binning, bin_instances, overflow_demand
from .projection import ALPHA_MIN, T_STOP, Splats, preprocess
from .shuffle import BLK as _SHUF_BLK, PHI as _SHUF_PHI, unpack_columns

# ---------------------------------------------------------------------------
# configuration

TILE_W = 32           # pixels per tile, x — tile pixel count must be 1024
TILE_H = 32           # pixels per tile, y   (= one (8,128) f32 vreg block)
PIX = TILE_W * TILE_H
LANES = 128
ILANES = 16           # used floats per instance (8 instances per 128-lane
                      # packed row, on both the input and grad-output side)
# chunk sizes are env-tunable for hardware A/B sweeps (compile-time
# constants; invalid values fail loudly at kernel build)
CHUNK_F = int(os.environ.get("GSCREAM_CHUNK_F", 1024))
RPC_F = CHUNK_F // 8  # fwd packed rows per inner step
CHUNK_B = int(os.environ.get("GSCREAM_CHUNK_B", 512))
RPC_B = CHUNK_B // 8  # bwd packed rows per inner step (VMEM-bound: 3
                      # per-φ scratch plane sets held across the passes)
assert CHUNK_F % 8 == 0 and CHUNK_B % 8 == 0
PAD_SLOTS = 1024      # slack instance rows absorbing chunk tail overruns
# the sentinel zero-fill relies on PAD_SLOTS covering one full backward
# chunk of packed rows (see the zero loops in _bwd_kernel)
assert CHUNK_B <= PAD_SLOTS

# raw mode: kernels receive per-gaussian attrs and compute the tile-local
# power coefficients + centering shifts in-kernel (see module docstring).
# Hardware A/B (r4, 1297x840 @ 1.22M instances): raw 99.2 ms vs legacy
# 94.8 ms — the in-kernel recompute costs more VPU time on the VPU-bound
# kernels than the deleted packing interleave saves, so legacy
# (precomputed coefficients) is the default.
KERNEL_COEFF = os.environ.get("GSCREAM_KERNEL_COEFF", "0") == "1"

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

def gauss_attrs(mean2d, conic, opacity, colors, depth, unc):
    """(N, 11) attribute table [op, r, g, b, depth, unc, mx, my, ca, cb,
    cc] — pass to ``bin_instances(attrs=...)`` so the sort carries it to
    per-instance order and ``pack_instance_data`` needs no gather."""
    return jnp.concatenate([
        opacity[:, None], colors, depth[:, None], unc[:, None],
        mean2d, conic,
    ], axis=1)


def pack_instance_data(mean2d, conic, opacity, colors, depth, unc,
                       binning: Binning, grid_x: int):
    """Per-gaussian attributes → packed per-instance rows in sorted order.

    When the binning carried the attributes through its sort
    (``binning.attrs``) this is gather-free; otherwise one (N,11)
    row-gather (TPU gathers pay per-row overhead — scalar gathers of the
    same element count are ~20× slower, profiled).  In raw mode
    (KERNEL_COEFF) that is ALL this function does — the kernels
    derive the tile-local power polynomial themselves, so packing is one
    pad+reshape over the attribute rows.  In legacy mode the tile-local
    ``power(x,y) = k0 + k1·x + k2·y + k3·x² + k4·xy + k5·y²`` coefficients
    and centering shifts are precomputed per instance here (a
    capacity-scale 16-column lane interleave, ~6 ms at the bench tier).
    Rows are 128 lanes (Mosaic DMA alignment), 8 instances per row.
    """
    if binning.cols16 is not None:
        # Pallas emission pipeline: dense sorted attribute rows → packed
        # rows via the MXU shuffle kernel (no lane-padded intermediates);
        # pad to the kernel's batched block so its grid runs at full GRP
        from .shuffle import GRP as _SHUF_GRP, pack_columns
        cap16 = binning.cols16.shape[1]
        pad = PAD_SLOTS + (-(cap16 + PAD_SLOTS)
                           % (_SHUF_GRP * _SHUF_BLK))
        return pack_columns(
            jnp.pad(binning.cols16, ((0, 0), (0, pad))),
            interpret=_interpret_default())
    if binning.attrs is not None:
        # (cap, 11) pre-sorted; PAD_SLOTS rows of zeros appended (the
        # kernels read pad rows only as masked chunk-tail riders)
        a = jnp.pad(binning.attrs, ((0, PAD_SLOTS), (0, 0)))
        tile = jnp.pad(binning.tile_id, (0, PAD_SLOTS))
    else:
        attrs = gauss_attrs(mean2d, conic, opacity, colors, depth, unc)
        # pad the (int) index vectors instead of the f32 result: the
        # r5 trace showed the post-stack capacity-scale jnp.pad costing
        # ~2 ms — padding gauss_id is free and the gather then emits
        # (cap + PAD_SLOTS) rows directly.  Pad rows replicate gaussian
        # 0 at tile 0 — finite, masked everywhere they can be read.
        a = attrs[jnp.pad(binning.gauss_id, (0, PAD_SLOTS))]
        tile = jnp.pad(binning.tile_id, (0, PAD_SLOTS))
    cap = a.shape[0] - PAD_SLOTS
    if KERNEL_COEFF:
        data16 = jnp.pad(a, ((0, 0), (0, 16 - a.shape[1])))
        return data16.reshape((cap + PAD_SLOTS) // 8, LANES)
    ox = ((tile % grid_x) * TILE_W).astype(jnp.float32)
    oy = ((tile // grid_x) * TILE_H).astype(jnp.float32)
    mxl = a[:, 6] - ox
    myl = a[:, 7] - oy
    ca, cb, cc = a[:, 8], a[:, 9], a[:, 10]
    k0 = -0.5 * (ca * mxl * mxl + cc * myl * myl) - cb * mxl * myl
    k1 = ca * mxl + cb * myl
    k2 = cc * myl + cb * mxl
    # sx/sy shift the backward's tile-local moments into the gaussian's own
    # rounded-center frame (in-kernel centering) — stays O(radius), so no
    # fp32 catastrophic cancellation at any image size
    sx = ox - jnp.round(a[:, 6])
    sy = oy - jnp.round(a[:, 7])
    zero = jnp.zeros_like(k0)
    data16 = jnp.stack([
        a[:, 0], a[:, 1], a[:, 2], a[:, 3], a[:, 4], a[:, 5],
        k0, k1, k2, -0.5 * ca, -cb, -0.5 * cc, sx, sy, zero, zero,
    ], axis=1)                                     # (cap+PAD, 16)
    # 8 instances per 128-lane row: instance i sits at row i//8, lanes
    # 16·(i%8)..16·(i%8)+16 — a pure reshape, so packing writes 16 floats
    # per instance instead of a 128-lane padded row (8× less HBM traffic)
    return data16.reshape((cap + PAD_SLOTS) // 8, LANES)


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


def _onehot16(i: int):
    """(1, ILANES) constant one-hot row — places a (rows,1) column into
    grad-output lane ``i`` via a broadcast multiply."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, ILANES), 1)
    return (iota == i).astype(jnp.float32)


def _strict_lower_tri(n: int):
    """(n, n) exclusive-prefix matrix: L[i,j]=1 if j<i."""
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (j < i).astype(jnp.float32)


MXU_POWER = os.environ.get("GSCREAM_MXU_POWER") == "1"
if MXU_POWER and KERNEL_COEFF:
    raise RuntimeError(
        "GSCREAM_MXU_POWER=1 requires the legacy precomputed-coefficient "
        "packing (set GSCREAM_KERNEL_COEFF=0): the MXU power contraction "
        "reads k0..k5 from the instance lanes")


def _raw_coeffs(d, origin):
    """Raw-mode lanes → tile-local power coefficients, as (R,1) columns.

    d lanes: 6,7 = mean x/y (global pixels), 8,9,10 = conic (a,b,c).
    Same f32 expression structure as the legacy pack_instance_data, so
    the per-pixel polynomial below is numerically identical; the ~12
    column ops here amortize over the tile's 1024 pixels.
    """
    oxf, oyf = origin
    mxl = d[:, 6:7] - oxf
    myl = d[:, 7:8] - oyf
    ca, cb, cc = d[:, 8:9], d[:, 9:10], d[:, 10:11]
    k0 = -0.5 * (ca * mxl * mxl + cc * myl * myl) - cb * mxl * myl
    k1 = ca * mxl + cb * myl
    k2 = cc * myl + cb * mxl
    return k0, k1, k2, -0.5 * ca, -cb, -0.5 * cc


def _phi_blend(d, xr, yr, slot_valid, power=None, origin=None):
    """Per-φ-block forward math: d (R,16) instance lanes, xr/yr (1,PIX),
    slot_valid (R,1).  Returns (alpha_v, one_m, g_exp) each (R,PIX),
    where one_m = 1 - alpha_v (a transmittance product factor).

    By default the degree-2 power polynomial runs on the VPU as broadcast
    FMAs of (R,1) coefficient columns against (1,PIX) coordinate rows —
    an MXU contraction of depth 16 would waste 112/128 of the systolic
    array.  In raw mode ``origin`` supplies the tile origin and the
    coefficient columns are derived in-kernel (:func:`_raw_coeffs`).
    ``power`` overrides with a precomputed plane (the GSCREAM_MXU_POWER=1
    path, :func:`_power_planes`): the kernels are VPU-bound (BASELINE.md
    memo), so moving the 5 FMAs/pixel onto the otherwise idle MXU trades
    cheap MXU time for scarce VPU time.
    """
    if power is None:
        if origin is not None:
            k0, k1, k2, k3, k4, k5 = _raw_coeffs(d, origin)
        else:
            k0, k1, k2 = d[:, 6:7], d[:, 7:8], d[:, 8:9]
            k3, k4, k5 = d[:, 9:10], d[:, 10:11], d[:, 11:12]
        power = k0 + (k1 + k3 * xr + k4 * yr) * xr + (k2 + k5 * yr) * yr
    g_exp = jnp.exp(power)
    alpha = jnp.minimum(d[:, 0:1] * g_exp, 0.99)
    valid = slot_valid & (power <= 0.0) & (alpha >= ALPHA_MIN)
    alpha_v = jnp.where(valid, alpha, 0.0)
    return alpha_v, 1.0 - alpha_v, g_exp


def _pixel_basis6():
    """(6, PIX) quadratic pixel basis [1, x, y, x², xy, y²] — the lane
    order of the packed power coefficients (pack_instance_data lanes
    6..11).  Built from in-trace iotas: Pallas kernels may not capture
    array constants."""
    x, y = _pixel_rows()
    return jnp.concatenate(
        [jnp.ones_like(x), x, y, x * x, x * y, y * y], axis=0)


def _power_planes(dchunk, basis6):
    """All 8 φ power planes of a packed chunk as MXU contractions.

    dchunk (R,128) → per-φ coefficients (R, 6) → (R, PIX), one
    contraction per φ lane group.  (A single concat into (8R, 6) would
    halve dispatch overhead, but Mosaic cannot concatenate slices whose
    lane offsets differ — "result/input offset mismatch on non-concat
    dimension" at bench shapes — so the planes stay separate.)"""
    return [jax.lax.dot_general(
        dchunk[:, 16 * phi + 6:16 * phi + 12], basis6,
        (((1,), (0,)), ((), ())),
        precision=_HIGHEST, preferred_element_type=jnp.float32)
        for phi in range(8)]


# ---------------------------------------------------------------------------
# forward kernel

def _fwd_kernel(grid_x, tile_base, tile_start, tile_count, inst_hbm,
                out_ref, buf, sem, carry, tmin, av_s):
    """Packed-row forward: one chunk = RPC_F rows × 8 φ-lane-groups.

    The global blend order is row-major, φ-minor (instance = 8·row + φ),
    so the transmittance prefix factorizes into one (RPC,RPC) strict-
    lower-triangular MXU scan over the per-row log sums plus a running
    φ partial — 8× fewer scan MACs per instance than scanning unpacked
    rows, at identical (128-wide) systolic occupancy.

    ``tile_base`` (scalar prefetch, (1,)) is the global tile id of grid
    step 0 — nonzero when a band kernel runs a local tile window
    (parallel/shard.py) — so raw mode resolves each tile's pixel origin
    from its GLOBAL id.
    """
    t = pl.program_id(0)
    start = tile_start[t]
    count = tile_count[t]
    if KERNEL_COEFF:
        gt = tile_base[0] + t
        origin = ((gt % grid_x * TILE_W).astype(jnp.float32),
                  (gt // grid_x * TILE_H).astype(jnp.float32))
    else:
        origin = None
    r0 = start // 8
    # rows spanning [start, start+count) — boundary instances of the
    # neighbouring tiles ride along masked-out (slot_valid)
    total_rows = (start + count + 7) // 8 - r0
    nchunks = pl.cdiv(total_rows, RPC_F)

    xr, yr = _pixel_rows()
    basis6 = _pixel_basis6() if MXU_POWER else None
    sltri = _strict_lower_tri(RPC_F)
    log_stop = np.float32(np.log(T_STOP))

    out_ref[...] = jnp.zeros((8, PIX), jnp.float32)
    carry[...] = jnp.zeros((1, PIX), jnp.float32)
    tmin[...] = jnp.ones((1, PIX), jnp.float32)

    def get_dma(slot, k):
        return pltpu.make_async_copy(
            inst_hbm.at[pl.ds(r0 + k * RPC_F, RPC_F), :],
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
        base = (r0 + k * RPC_F) * 8
        ri = jax.lax.broadcasted_iota(jnp.int32, (RPC_F, 1), 0)

        # pass 1: per-φ alpha, per-row transmittance factor.  The row's
        # log sum Σφ log1p(-α) is computed as ONE log of the row product
        # Πφ(1-α): 8x fewer transcendentals; the extra fp32 rounding is
        # bounded by the golden-bundle gate (tests/test_golden.py)
        rowprod = jnp.ones((RPC_F, PIX), jnp.float32)
        pw = _power_planes(buf[cur], basis6) if MXU_POWER else None
        for phi in range(8):
            d = buf[cur][:, 16 * phi:16 * phi + 16]
            idx = base + ri * 8 + phi
            slot_valid = (idx >= start) & (idx < start + count)
            alpha_v, one_m, _ = _phi_blend(
                d, xr, yr, slot_valid,
                power=(pw[phi] if MXU_POWER else None), origin=origin)
            av_s[phi] = alpha_v
            rowprod = rowprod * one_m
        S = jnp.log(rowprod)

        # exclusive row prefix (strict triangle) + chunk carry
        run = jax.lax.dot_general(
            sltri, S, (((1,), (0,)), ((), ())),
            precision=_HIGHEST, preferred_element_type=jnp.float32) \
            + carry[0:1, :]

        # pass 2: blend in global order.  T before instance (r, φ) is
        # maintained as a running product p_exc ← p_exc·(1-α) — the exact
        # CUDA recurrence (forward.cu:497) — so only the scan output needs
        # one exp per chunk instead of one per φ step
        p_exc = jnp.exp(run)                   # T before each row's φ=0
        for phi in range(8):
            alpha_v = av_s[phi]
            p_inc = p_exc * (1.0 - alpha_v)    # T after (division-free)
            w = jnp.where(p_inc >= T_STOP, alpha_v * p_exc, 0.0)
            d = buf[cur][:, 16 * phi:16 * phi + 16]
            acc = jax.lax.dot_general(
                d[:, 0:8], w, (((0,), (0,)), ((), ())),
                precision=_HIGHEST,
                preferred_element_type=jnp.float32)          # (8,PIX)
            out_ref[...] += acc
            tmin[...] = jnp.minimum(
                tmin[...],
                jnp.min(jnp.where(p_inc >= T_STOP, p_inc, 1.0), axis=0,
                        keepdims=True))
            p_exc = p_inc

        carry[...] = carry[...] + jnp.sum(S, axis=0, keepdims=True)
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
                 interpret: bool, grid_x: int, tile_base=None):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((None, 8, PIX), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, RPC_F, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((1, PIX), jnp.float32),
            pltpu.VMEM((1, PIX), jnp.float32),
            pltpu.VMEM((8, RPC_F, PIX), jnp.float32),
        ],
    )
    if tile_base is None:
        tile_base = jnp.zeros((1,), jnp.int32)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, grid_x),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8, PIX), jnp.float32),
        interpret=interpret,
    )(tile_base, tile_start, tile_count, inst_packed)


# ---------------------------------------------------------------------------
# backward kernel

def _bwd_kernel(grid_x, tile_base, tile_start, tile_count, inst_hbm,
                pix_ref, grad_hbm, buf, gbuf, sem, gsem, ghsem, hbuf,
                carry, prefr, av_s, ge_s, ga_s):
    """pix_ref rows: [g_r, g_g, g_b, g_depth, g_unc, Total, gTT, 0].

    Packed-row backward in three φ passes per chunk (RPC_B rows × 8 φ):
    (1) alpha/log planes + row sums, (2) transmittance + blend weights,
    channel-grad staging and the γw row sums, (3) suffix recovery and the
    moment matmuls.  Pass 3 re-reads the stored α/γ planes and carries
    the transmittance product itself (one extra exp per chunk) — the γ
    recompute (5 broadcast FMAs per φ) and a stored p_exc plane both
    cost more than they save.  Grad output uses the PACKED layout — 8
    instances per 128-lane row, 16 lanes each, mirroring the input
    (r4: the old one-row-per-instance layout wrote 112 zero lanes per
    row, 8× the HBM write traffic): each φ's (RPC,16) block lands in
    lane group 16φ of the chunk's rows in VMEM, then one DMA writes rows
    [row0, row0+RPC_B).  The head row is SHARED with the predecessor
    tile's tail when s8 = start%8 > 0: its s8 leading lane-groups are
    already written and must survive, but Mosaic DMAs cannot slice the
    lane dimension below 128 — so the kernel read-merge-writes: it
    prefetches the predecessor's head row at kernel start (the grid is
    sequential in slot order, so that write has completed) and blends it
    into lanes < 16·s8 before the first chunk's full-row DMA.  Tail
    overruns carry masked zeros and are rewritten by later tiles and the
    sentinel pass.
    """
    t = pl.program_id(0)
    start = tile_start[t]
    count = tile_count[t]
    r0 = start // 8
    s8 = start - r0 * 8
    total_rows = (start + count + 7) // 8 - r0
    nchunks = pl.cdiv(total_rows, RPC_B)
    if KERNEL_COEFF:
        gt = tile_base[0] + t
        origin = ((gt % grid_x * TILE_W).astype(jnp.float32),
                  (gt // grid_x * TILE_H).astype(jnp.float32))
    else:
        origin = None

    basis = _pixel_basis16()
    basis6 = _pixel_basis6() if MXU_POWER else None
    xr, yr = _pixel_rows()
    sltri = _strict_lower_tri(RPC_B)
    log_stop = np.float32(np.log(T_STOP))

    carry[...] = jnp.zeros((1, PIX), jnp.float32)
    prefr[...] = jnp.zeros((1, PIX), jnp.float32)

    total = pix_ref[5:6, :]
    gtt = pix_ref[6:7, :]
    zrow = jnp.zeros((1, PIX), jnp.float32)
    # (16,PIX): channel-grad rows at 1..5, aligned with the color lanes of
    # the instance layout, so the per-channel sums are single matmuls
    gstack = jnp.concatenate(
        [zrow, pix_ref[0:5, :]] + [zrow] * 10, axis=0)

    def get_dma(slot, k):
        return pltpu.make_async_copy(
            inst_hbm.at[pl.ds(r0 + k * RPC_B, RPC_B), :],
            buf.at[slot], sem.at[slot])

    def gdma_full(slot, k):
        return pltpu.make_async_copy(
            gbuf.at[slot],
            grad_hbm.at[pl.ds(r0 + k * RPC_B, RPC_B), :],
            gsem.at[slot])

    def head_read():
        # the predecessor tile's (completed) head-row write, prefetched
        # for the lane merge below
        return pltpu.make_async_copy(
            grad_hbm.at[pl.ds(r0, 1), :], hbuf, ghsem)

    def start_gdma(slot, k):
        @pl.when(k > 0)
        def _():
            gdma_full(slot, k).start()
        @pl.when(k == 0)
        def _():
            @pl.when(s8 > 0)
            def _():
                head_read().wait()
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
                gbuf[slot, 0:1, :] = jnp.where(lane < 16 * s8, hbuf[...],
                                               gbuf[slot, 0:1, :])
            gdma_full(slot, 0).start()

    def wait_gdma(slot, k):
        gdma_full(slot, k).wait()

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()
    @pl.when(s8 > 0)
    def _():
        head_read().start()

    def gamma_of(d):
        # γ_ip = Σ_c chan_ic·g_cp — VPU broadcast FMAs (K=5 on the MXU
        # would run at 5/128 depth)
        return (d[:, 1:2] * pix_ref[0:1, :]
                + d[:, 2:3] * pix_ref[1:2, :]
                + d[:, 3:4] * pix_ref[2:3, :]
                + d[:, 4:5] * pix_ref[3:4, :]
                + d[:, 5:6] * pix_ref[4:5, :])

    def body(k, _):
        cur = jax.lax.rem(k, 2)
        @pl.when(k + 1 < nchunks)
        def _():
            get_dma(1 - cur, k + 1).start()
        get_dma(cur, k).wait()
        base = (r0 + k * RPC_B) * 8
        ri = jax.lax.broadcasted_iota(jnp.int32, (RPC_B, 1), 0)

        # pass 1: per-φ planes + row transmittance factors (see the
        # forward: one log of the row product replaces 8 log1p)
        rowprod = jnp.ones((RPC_B, PIX), jnp.float32)
        pw = _power_planes(buf[cur], basis6) if MXU_POWER else None
        for phi in range(8):
            d = buf[cur][:, 16 * phi:16 * phi + 16]
            idx = base + ri * 8 + phi
            slot_valid = (idx >= start) & (idx < start + count)
            alpha_v, one_m, g_exp = _phi_blend(
                d, xr, yr, slot_valid,
                power=(pw[phi] if MXU_POWER else None), origin=origin)
            av_s[phi] = alpha_v
            ge_s[phi] = g_exp
            rowprod = rowprod * one_m
        S = jnp.log(rowprod)

        run = jax.lax.dot_general(
            sltri, S, (((1,), (0,)), ((), ())),
            precision=_HIGHEST, preferred_element_type=jnp.float32) \
            + carry[0:1, :]

        # this chunk's gbuf slot was DMA'd two chunks ago — wait before
        # pass 2 stages the channel grads into it
        @pl.when(k >= 2)
        def _():
            wait_gdma(cur, k - 2)

        # pass 2: transmittance, blend weights, γw row sums, dfeat
        # staging.  T runs as the product p_exc ← p_exc·(1-α) (the exact
        # CUDA recurrence): one exp per chunk, not one per φ
        Msum = jnp.zeros((RPC_B, PIX), jnp.float32)
        p_exc = jnp.exp(run)
        for phi in range(8):
            alpha_v = av_s[phi]
            p_inc = p_exc * (1.0 - alpha_v)
            w = jnp.where(p_inc >= T_STOP, alpha_v * p_exc, 0.0)
            d = buf[cur][:, 16 * phi:16 * phi + 16]
            gamma = gamma_of(d)
            ga_s[phi] = gamma
            m = gamma * w
            Msum = Msum + m
            dfeat = jax.lax.dot_general(
                w, gstack, (((1,), (1,)), ((), ())),
                precision=_HIGHEST, preferred_element_type=jnp.float32)
            gbuf[cur, :, 16 * phi:16 * phi + ILANES] = dfeat
            p_exc = p_inc

        runm = jax.lax.dot_general(
            sltri, Msum, (((1,), (0,)), ((), ())),
            precision=_HIGHEST, preferred_element_type=jnp.float32) \
            + prefr[0:1, :]

        # pass 3: suffix recovery, moment matmuls, in-kernel centering
        p_exc = jnp.exp(run)
        for phi in range(8):
            alpha_v = av_s[phi]
            g_exp = ge_s[phi]
            gamma = ga_s[phi]
            p_inc = p_exc * (1.0 - alpha_v)
            applied = (alpha_v > 0.0) & (p_inc >= T_STOP)
            d = buf[cur][:, 16 * phi:16 * phi + 16]
            if origin is not None:
                sx = origin[0] - jnp.round(d[:, 6:7])
                sy = origin[1] - jnp.round(d[:, 7:8])
            else:
                sx = d[:, 12:13]
                sy = d[:, 13:14]
            w = jnp.where(applied, alpha_v * p_exc, 0.0)
            m = gamma * w
            pref = runm + m                    # inclusive global prefix
            # suffix of γw strictly after i, plus the bg/final-T term
            suffix = total - pref + gtt
            dalpha = jnp.where(applied,
                               gamma * p_exc - suffix / (1.0 - alpha_v),
                               0.0)
            x_mat = dalpha * g_exp             # (RPC_B,PIX)
            mom = jax.lax.dot_general(
                x_mat, basis, (((1,), (1,)), ((), ())),
                precision=_HIGHEST, preferred_element_type=jnp.float32)
            # shift tile-local moments into the gaussian's rounded-center
            # frame (sx/sy from the instance lanes, or derived in raw
            # mode above) — reduction-ready rows
            m0 = mom[:, 6:7]
            mx = mom[:, 7:8]
            my = mom[:, 8:9]
            conv = (mom
                    + (sx * m0) * _onehot16(7)
                    + (sy * m0) * _onehot16(8)
                    + (2.0 * sx * mx + sx * sx * m0) * _onehot16(9)
                    + (sx * my + sy * mx + sx * sy * m0) * _onehot16(10)
                    + (2.0 * sy * my + sy * sy * m0) * _onehot16(11))
            gbuf[cur, :, 16 * phi:16 * phi + ILANES] = (
                gbuf[cur, :, 16 * phi:16 * phi + ILANES] + conv)
            runm = runm + m
            p_exc = p_inc

        start_gdma(cur, k)
        prefr[...] = prefr[...] + jnp.sum(Msum, axis=0, keepdims=True)
        carry[...] = carry[...] + jnp.sum(S, axis=0, keepdims=True)
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
        wait_gdma(jax.lax.rem(kf - 2, 2), kf - 2)
    @pl.when(kf >= 1)
    def _():
        wait_gdma(jax.lax.rem(kf - 1, 2), kf - 1)
    # drain an orphaned input prefetch from the early exit
    @pl.when(kf < nchunks)
    def _():
        get_dma(jax.lax.rem(kf, 2), kf).wait()
    # chunks skipped by the early exit still own output slots — their
    # gradients are exactly zero, written without compute (kf >= 1 when
    # nchunks >= 1, so no head-skip is ever needed here)
    @pl.when(kf < nchunks)
    def _():
        gbuf[0] = jnp.zeros((RPC_B, LANES), jnp.float32)
        def zbody(k, _):
            dz = pltpu.make_async_copy(
                gbuf.at[0],
                grad_hbm.at[pl.ds(r0 + k * RPC_B, RPC_B), :],
                gsem.at[0])
            dz.start()
            dz.wait()
            return 0
        jax.lax.fori_loop(kf, nchunks, zbody, 0)

    # sentinel-tail slots (instances past the last real tile) are owned by
    # no tile; zero them so garbage HBM can never reach the segment
    # reduction's indicator matmul (0 * Inf = NaN there).  Starts at the
    # first all-sentinel row — the preceding partial row's sentinel lane
    # groups were zeroed by the last tile's masked compute (or a pad
    # tile's).  The floor division leaves < RPC_B rows at the very top
    # unwritten — inside the PAD_SLOTS region past ``capacity``, which the
    # consumer never reads (the CHUNK_B <= PAD_SLOTS assert guards this).
    # Double-buffered zero DMAs — pure HBM write bandwidth.
    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        cap_rows = grad_hbm.shape[0]
        ze = (start + count + 7) // 8
        gbuf[0] = jnp.zeros((RPC_B, LANES), jnp.float32)
        gbuf[1] = jnp.zeros((RPC_B, LANES), jnp.float32)

        def zdma(s, j):
            return pltpu.make_async_copy(
                gbuf.at[s],
                grad_hbm.at[pl.ds(ze + j * RPC_B, RPC_B), :],
                gsem.at[s])

        nz = (cap_rows - ze) // RPC_B
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
                  n_tiles: int, interpret: bool, grid_x: int,
                  tile_base=None):
    rows = inst_packed.shape[0]              # packed rows incl. PAD_SLOTS
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
            pltpu.VMEM((2, RPC_B, LANES), jnp.float32),
            pltpu.VMEM((2, RPC_B, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM((1, LANES), jnp.float32),
            pltpu.VMEM((1, PIX), jnp.float32),
            pltpu.VMEM((1, PIX), jnp.float32),
            pltpu.VMEM((8, RPC_B, PIX), jnp.float32),
            pltpu.VMEM((8, RPC_B, PIX), jnp.float32),
            pltpu.VMEM((8, RPC_B, PIX), jnp.float32),
        ],
    )
    if tile_base is None:
        tile_base = jnp.zeros((1,), jnp.int32)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, grid_x),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_base, tile_start, tile_count, inst_packed, pix_tiles)


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

# reduction block sizes (env-tunable for hardware sweeps).  r5 hardware
# A/B at the 1.31 M bench tier: SEG_GB 256 → 90.8 ms step, 512 → 93.1,
# 1024 → 98.0 — the (SEG_GB, 128) indicator build costs cap·SEG_GB
# element compares, which swamps the grid-dispatch savings of larger
# blocks; 256 stays the default.
SEG_GB = int(os.environ.get("GSCREAM_SEG_GB", 256))    # gaussians/block
SEG_RCAP = 256     # packed rows (8 instances each) per inner step


SEG_ICB = int(os.environ.get("GSCREAM_SEG_ICB", 16))
SEG_IC = SEG_ICB * 128     # instances per column-major reducer DMA


def _segreduce_cm_kernel(off_ref, blk_hbm, out_ref, buf, sem):
    """Column-major segment reduction over lane-blocked grad columns.

    blk_hbm: (n/128, 16, 128) — dense attribute rows in emission order
    (grad lanes 1..11 as rows 1..11), lane-blocked so the instance
    window is a dim-0 slice (Mosaic allows any dynamic offset there;
    lane-dim DMA offsets are restricted).  off_ref: this block's
    gaussian offsets.  Per 128-instance sub-block one indicator matmul
    ``S @ Xᵀ`` sums every gaussian's contiguous emission run — 8× fewer
    MACs than the packed-row reducer's per-φ matmuls (4096 vs 32768 per
    instance at SEG_GB=256).
    """
    start_i = off_ref[0, 0]
    end_i = off_ref[SEG_GB, 0]
    b0 = start_i // 128                            # first instance block
    nchunks = pl.cdiv(end_i - b0 * 128, SEG_IC)

    out_ref[...] = jnp.zeros((SEG_GB, 16), jnp.float32)
    lo = off_ref[0:SEG_GB, :]                      # (SEG_GB,1) [lo, hi)
    hi = off_ref[1:SEG_GB + 1, :]
    iiota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def body(j, _):
        cp = pltpu.make_async_copy(
            blk_hbm.at[pl.ds(b0 + j * SEG_ICB, SEG_ICB)], buf, sem)
        cp.start()
        cp.wait()
        acc = jnp.zeros((SEG_GB, 16), jnp.float32)
        for k in range(SEG_ICB):
            inst = (b0 + j * SEG_ICB + k) * 128 + iiota    # (1,128)
            s = ((inst >= lo) & (inst < hi)).astype(jnp.float32)
            acc = acc + jax.lax.dot_general(
                s, buf[k], (((1,), (1,)), ((), ())),
                precision=_HIGHEST, preferred_element_type=jnp.float32)
        out_ref[...] += acc
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)


def segment_reduce_cm(ge_cols, offsets, n_gauss: int, interpret: bool):
    """(16, cap) emission-order dense grad rows → (N, 16) per-gaussian sums.

    ``ge_cols`` rows follow the conv-lane layout (1..5 channel grads,
    6..11 centered moments); ``offsets`` is the (N+1,) emission-range
    table.  Rows past the true instance count must be zero (the backward
    kernel's sentinel fill guarantees this).
    """
    cap = ge_cols.shape[1]
    # chunk overrun slack: b0 + nchunks*SEG_ICB blocks can pass cap by
    # < SEG_IC + 128; then lane-block: (cap/128, 16, 128).  The reshape
    # of each dense row is free; the stack is a tile-granular interleave
    # (pure bandwidth).
    pad = SEG_IC + 128 + (-(cap + SEG_IC + 128) % 128)
    cols = jnp.pad(ge_cols, ((0, 0), (0, pad)))
    blocked = jnp.stack(
        [cols[i].reshape(-1, 128) for i in range(16)], axis=1)

    n_pad = -(-n_gauss // SEG_GB) * SEG_GB
    offs = jnp.pad(offsets, (0, n_pad + 1 - offsets.shape[0]), mode="edge")
    offs = jnp.minimum(offs, cap)
    n_blocks = n_pad // SEG_GB
    # per-block overlapped offset windows: rows [b·GB .. b·GB+GB]
    # inclusive — a reshape plus a strided slice for the +1 overlap
    # column, NOT a fancy-index (the r5 trace showed the equivalent
    # (n_blocks, GB+1) gather costing 2.2 ms — scalar gathers pay a
    # huge per-element toll on TPU)
    off_blocks = jnp.concatenate(
        [offs[:n_pad].reshape(n_blocks, SEG_GB),
         offs[SEG_GB::SEG_GB][:n_blocks, None]], axis=1)[..., None]
    out = pl.pallas_call(
        _segreduce_cm_kernel,
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
                pltpu.VMEM((SEG_ICB, 16, 128), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_blocks, SEG_GB, 16), jnp.float32),
        interpret=interpret,
    )(off_blocks, blocked)
    return out.reshape(n_pad, 16)[:n_gauss]


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


def _reorder_mode() -> str:
    mode = os.environ.get("GSCREAM_REORDER", "cm")
    if mode not in ("cm", "gather", "scatter", "sort"):
        raise ValueError(
            f"GSCREAM_REORDER={mode!r}: must be one of "
            "'cm', 'gather', 'scatter', 'sort'")
    return mode


def reduce_grads_cm(raw, binning: Binning, n_gauss: int, interpret: bool,
                    valid=None):
    """Packed kernel grad rows → (N, 16) per-gaussian sums, column-major.

    The r4-default gradient flow: unpack the (rows, 128) kernel output
    into dense attribute rows (MXU shuffle, :mod:`.shuffle`), reorder to
    emission order with one stable sort whose 11 payload operands are
    those dense rows (``lax.sort`` payloads stream — the round-3 cost of
    the 'sort' mode was the lane interleaves around it, not the sort),
    then reduce with the single-matmul column-major kernel.  Avoids the
    ``(capacity, 16)`` lane-padded intermediates of the row modes
    entirely (~23 ms of relayout at the 1.31 M bench tier).

    ``valid`` (cap,) optionally masks sorted-order slots (the band-
    sharded path zeroes slots owned by other devices' bands).
    """
    cap = binning.emit_slot.shape[0]
    # pad to a multiple of the shuffle kernel's batched block so the
    # unpack grid runs at full GRP batching (pad rows are sanitized to
    # zero below and sliced off at [:cap])
    from .shuffle import GRP as _SHUF_GRP
    pad_rows = -raw.shape[0] % (_SHUF_GRP * _SHUF_BLK // _SHUF_PHI)
    if pad_rows:
        raw = jnp.pad(raw, ((0, pad_rows), (0, 0)))
    # sanitize: rows the kernel never wrote (other bands' slots in the
    # band-sharded path; the sub-chunk sentinel tail at tiny capacities)
    # are raw uninitialized HBM.  The unpack's indicator matmul would
    # spread a NaN/Inf bit pattern across its whole block (NaN·0 = NaN);
    # FINITE garbage passes through lane-exact and is masked below.
    raw = jnp.where(jnp.isfinite(raw), raw, 0.0)
    cols = unpack_columns(raw, interpret)          # (16, rows*8)
    ops = tuple(cols[i, :cap] for i in range(1, 12))
    if valid is not None:
        # where, not multiply: garbage slots must become exact zeros
        ops = tuple(jnp.where(valid, o, 0.0) for o in ops)
    out = jax.lax.sort((binning.emit_slot,) + ops, num_keys=1,
                       is_stable=True)
    z = jnp.zeros((1, cap), jnp.float32)
    ge = jnp.concatenate([z] + [o[None] for o in out[1:]] + [z] * 4,
                         axis=0)                   # (16, cap)
    return segment_reduce_cm(ge, binning.offsets, n_gauss, interpret)


def segment_reduce_grads(conv, binning: Binning, n_gauss: int,
                         interpret: bool):
    """(capacity, 16) sorted-order instance rows → (N, 16) per-gaussian sums.

    Sorted-order rows reach emission order by applying the known
    permutation ``emit_slot``; mode GSCREAM_REORDER selects how:

    * ``gather`` (default): invert the permutation (aux 2-operand sort)
      then row-gather — round-3 hardware A/B: 104 ms step vs 119 ms for
      the sort mode at the 1.57 M tier;
    * ``scatter``: one row scatter ``out[emit_slot[i]] = row[i]`` —
      emit_slot is a permutation (unique destinations) so it is valid and
      bit-exact, and a standalone row-scatter micro-benches ~0.05 ms/M
      rows, but IN-GRAPH XLA lowers it element-rate bound (step 201 ms —
      the same pathology as the GSCREAM_SCATTER_REDUCE fallback);
    * ``sort``: carry the 11 used grad columns through one multi-operand
      stable sort on the emission slot (the round-1/2 default).

    Then pack 8 instances per 128-lane row and run the indicator-matmul
    reduction kernel.  (The 'cm' default routes through
    :func:`reduce_grads_cm` instead — this function serves the legacy
    row modes only.)
    """
    cap = binning.emit_slot.shape[0]
    mode = _reorder_mode()
    if mode == "cm":
        raise ValueError("GSCREAM_REORDER=cm routes through "
                         "reduce_grads_cm, not segment_reduce_grads")
    if mode == "scatter":
        ge = jnp.zeros((cap, 16), jnp.float32).at[
            binning.emit_slot].set(conv, mode='drop',
                                   unique_indices=True)
    elif mode == "gather":
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
    n_blocks = n_pad // SEG_GB
    # per-block overlapped offset windows (SEG_GB+1 each): reshape plus
    # a strided slice for the overlap column, not a fancy-index (see
    # segment_reduce_cm)
    off_blocks = jnp.concatenate(
        [offs[:n_pad].reshape(n_blocks, SEG_GB),
         offs[SEG_GB::SEG_GB][:n_blocks, None]], axis=1)[..., None]
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
                         n_tiles, interpret, gx)
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
                        binning.tile_count, n_tiles, interpret, gx)
    cap = binning.gauss_id.shape[0]
    # rows leave the kernel already centered (sx/sy shift applied
    # in-kernel) and the sentinel tail zero-filled — reduction-ready.
    if os.environ.get("GSCREAM_SCATTER_REDUCE"):
        # fallback: XLA scatter-add (~150 ms at 2M instances)
        conv = raw.reshape(-1, ILANES)[:cap]
        per_gauss = jax.ops.segment_sum(conv, binning.gauss_id,
                                        num_segments=n_gauss)
    elif _reorder_mode() == "cm":
        per_gauss = reduce_grads_cm(raw, binning, n_gauss, interpret)
    else:
        # row modes pay a (rows,128) → (capacity,16) lane relayout here
        conv = raw.reshape(-1, ILANES)[:cap]
        per_gauss = segment_reduce_grads(conv, binning, n_gauss, interpret)
    d_mean2d, d_conic, d_op, d_col, d_depth, d_unc = pergauss_chain(
        per_gauss, mean2d, conic, op)
    # bg cotangent: out_color = C + T·bg  ⇒  d bg = Σ_p T_p · g_color_p
    d_bg = jnp.einsum('hw,chw->c', t_img, g_color)
    # Binning holds integer index arrays (float0 cotangent) and possibly
    # the f32 sorted attrs (true gradients flow through the analytic
    # per-gaussian chain above, so the pass-through copy gets zeros)
    d_binning = jax.tree.map(
        lambda x: (np.zeros(jnp.shape(x), jax.dtypes.float0)
                   if jnp.issubdtype(jnp.result_type(x), jnp.integer)
                   else jnp.zeros(jnp.shape(x), jnp.result_type(x))),
        binning)
    return (d_mean2d, d_conic, d_op, d_col, d_depth, d_unc, d_binning, d_bg)


rasterize_tiled.defvjp(_raster_fwd, _raster_bwd)


# ---------------------------------------------------------------------------
# high-level entry

def build_binning(splats: Splats, opacity, colors, unc, capacity: int,
                  width: int, height: int, precise: bool = True,
                  interpret: bool | None = None) -> Binning:
    """Emission-pipeline selector shared by every render path.

    GSCREAM_EMIT=pallas routes the default training configuration
    (precise lex sort, row-tight culling, tiered capacity) through the
    Pallas expansion pipeline (:mod:`.emission` — dense columns, no
    capacity-scale relayouts); anything that pipeline does not cover —
    fast/quantized sort, full-rect emission, raw-coefficient kernels,
    unaligned capacities — falls back to the XLA build, as does
    GSCREAM_EMIT=xla.
    """
    if interpret is None:
        interpret = _interpret_default()
    # binning carries values only (indices + attribute copies); true
    # gradients flow through the rasterizer's direct arguments
    splats, opacity, colors, unc = jax.lax.stop_gradient(
        (splats, opacity, colors, unc))
    use_pallas = (os.environ.get("GSCREAM_EMIT", "xla") == "pallas"
                  and precise and not KERNEL_COEFF
                  and splats.t_iso is not None
                  and os.environ.get("GSCREAM_ROW_TIGHT") != "0"
                  and os.environ.get("GSCREAM_SORT_FUSED") != "1"
                  and capacity % 1024 == 0)
    if use_pallas:
        from .emission import bin_instances_pallas
        return bin_instances_pallas(splats, opacity, colors, unc,
                                    capacity, width, height,
                                    TILE_W, TILE_H, interpret=interpret)
    return bin_instances(
        splats, capacity, width, height, TILE_W, TILE_H, precise=precise,
        attrs=gauss_attrs(splats.mean2d, splats.conic, opacity, colors,
                          splats.depth, unc))


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
                        tile_w=TILE_W, tile_h=TILE_H, opacity=opacity)
    binning = build_binning(splats, opacity, colors, unc, capacity,
                            camera.width, camera.height,
                            interpret=interpret)
    out = rasterize_tiled(splats.mean2d, splats.conic, opacity, colors,
                          splats.depth, unc, binning, bg,
                          camera.width, camera.height, interpret)
    aux = {"radius": splats.radius,
           "num_instances": overflow_demand(binning),
           "capacity": capacity, "splats": splats}
    return out, aux
