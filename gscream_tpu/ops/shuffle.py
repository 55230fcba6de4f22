"""Dense-column ↔ packed-row instance layout shuffles (Pallas, MXU).

The tile kernels read instances packed 8 per 128-lane row (16 lanes
each, ``rasterize_tiled.py`` module docstring).  Building that layout
from per-attribute data in XLA costs a genuine relayout: a
``(capacity, 16)`` array is lane-padded 16→128 on TPU, so the
16-column ``jnp.stack`` + reshape in ``pack_instance_data`` measured
15.5 ms at the 1.31 M bench tier, and the backward's inverse
(``(rows,128) → (capacity,16)`` for the emit-slot reorder) another
~23 ms (BASELINE.md round-4 profile).  The reference's CUDA pipeline
has no analogue — its per-instance structs are AoS from the start
(``cuda_rasterizer/rasterizer_impl.cu:70-111``).

These kernels do the shuffle at HBM bandwidth instead: attributes live
as **dense rows of a (16, capacity) array** (each attribute is one
128-lane-dense row — the natural output format of ``lax.sort`` payload
operands and elementwise column math), and the lane↔sublane shuffle
into packed rows runs on the MXU as 8 indicator matmuls per 1024-
instance block:

    out[r, 16φ+j] = cols[j, 8r+φ]        (pack_columns)
    cols[j, 8r+φ] = packed[r, 16φ+j]     (unpack_columns)

Indicator products are exact (each output element is 1.0·x + zeros),
so the shuffle is bit-faithful for normal floats; at ~2 M MACs per
block the MXU cost is ~1 ms at the bench tier — pure bandwidth.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401 (API parity)

ILANES = 16       # floats per instance (lane group width)
PHI = 8           # instances per 128-lane packed row
BLK = 1024        # instances per matmul sub-block
# sub-blocks per grid step: the r5 hardware trace showed the 1024-
# instance grid (1281 steps at the bench tier) dispatch-bound — 10.7 ms
# for ~1 ms of matmul work — but batching hits a Mosaic VMEM stack OOM
# at GRP ≥ 4 (the unrolled schedule materializes the per-φ indicator
# matrices per sub-block instead of sharing them; 17.2 M > the 16 M
# scoped limit).  Default stays 1; the knob remains for hardware sweeps
# at small batches.
GRP = max(int(os.environ.get("GSCREAM_SHUF_GRP", "1")), 1)
_HIGHEST = jax.lax.Precision.HIGHEST


def _selT(phi: int):
    """(BLK//PHI, BLK) indicator: S[r, i] = 1 iff i == PHI*r + phi."""
    r = jax.lax.broadcasted_iota(jnp.int32, (BLK // PHI, BLK), 0)
    i = jax.lax.broadcasted_iota(jnp.int32, (BLK // PHI, BLK), 1)
    return (i == PHI * r + phi).astype(jnp.float32)


def _pack_kernel(grp: int, cols_ref, out_ref):
    # hoist the (constant) per-φ indicators out of the group loop so the
    # unrolled schedule reuses 8 matrices instead of materializing 8·grp
    # (VMEM stack OOM at grp ≥ 7, observed on hardware)
    sels = [_selT(phi) for phi in range(PHI)]
    for g in range(grp):
        buf = cols_ref[:, g * BLK:(g + 1) * BLK]       # (16, BLK)
        for phi in range(PHI):
            # part[r, j] = Σ_i S[r, i]·cols[j, i] = cols[j, PHI·r+phi]
            part = jax.lax.dot_general(
                sels[phi], buf, (((1,), (1,)), ((), ())),
                precision=_HIGHEST, preferred_element_type=jnp.float32)
            out_ref[g * (BLK // PHI):(g + 1) * (BLK // PHI),
                    ILANES * phi:ILANES * (phi + 1)] = part


def _unpack_kernel(grp: int, packed_ref, out_ref):
    sels = [_selT(phi) for phi in range(PHI)]
    for g in range(grp):
        rows = packed_ref[g * (BLK // PHI):(g + 1) * (BLK // PHI), :]
        acc = jnp.zeros((ILANES, BLK), jnp.float32)
        for phi in range(PHI):
            part = rows[:, ILANES * phi:ILANES * (phi + 1)]    # (R,16)
            # contrib[j, i] = Σ_r part[r, j]·S[r, i] = packed[i//8, 16φ+j]
            # exactly at lanes i ≡ phi (mod 8), zero elsewhere
            acc = acc + jax.lax.dot_general(
                part, sels[phi], (((0,), (0,)), ((), ())),
                precision=_HIGHEST, preferred_element_type=jnp.float32)
        out_ref[:, g * BLK:(g + 1) * BLK] = acc


def _grp(n: int) -> int:
    """Largest sub-block batch ≤ GRP that divides n//BLK.

    Callers get full batching by padding n to a multiple of
    ``GRP * BLK`` (see :func:`reduce_grads_cm`); odd sizes still work,
    just at a smaller batch."""
    nblk = n // BLK
    g = min(GRP, nblk)
    while nblk % g:
        g -= 1
    return g


def _check(cols_shape):
    c, n = cols_shape
    if c != ILANES:
        raise ValueError(f"expected {ILANES} attribute rows, got {c}")
    if n % BLK:
        raise ValueError(f"instance count {n} not a multiple of {BLK}")


@functools.partial(jax.jit, static_argnames=("interpret",))
def pack_columns(cols: jnp.ndarray, interpret: bool = False):
    """(16, n) dense attribute rows → (n//8, 128) packed instance rows."""
    _check(cols.shape)
    n = cols.shape[1]
    g = _grp(n)
    nblk = n // (BLK * g)
    return pl.pallas_call(
        functools.partial(_pack_kernel, g),
        grid=(nblk,),
        in_specs=[pl.BlockSpec((ILANES, g * BLK), lambda b: (0, b))],
        out_specs=pl.BlockSpec((g * BLK // PHI, 128), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((n // PHI, 128), jnp.float32),
        interpret=interpret,
    )(cols)


@functools.partial(jax.jit, static_argnames=("interpret",))
def unpack_columns(packed: jnp.ndarray, interpret: bool = False):
    """(n//8, 128) packed instance rows → (16, n) dense attribute rows."""
    rows, lanes = packed.shape
    if lanes != 128:
        raise ValueError(f"expected 128-lane packed rows, got {lanes}")
    n = rows * PHI
    if n % BLK:
        raise ValueError(f"row count {rows} not a multiple of {BLK // PHI}")
    g = _grp(n)
    nblk = n // (BLK * g)
    return pl.pallas_call(
        functools.partial(_unpack_kernel, g),
        grid=(nblk,),
        in_specs=[pl.BlockSpec((g * BLK // PHI, 128), lambda b: (b, 0))],
        out_specs=pl.BlockSpec((ILANES, g * BLK), lambda b: (0, b)),
        out_shape=jax.ShapeDtypeStruct((ILANES, n), jnp.float32),
        interpret=interpret,
    )(packed)
