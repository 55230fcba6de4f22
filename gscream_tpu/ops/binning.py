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
* the 64-bit ``tile<<32|depth`` radix sort becomes one stable
  lexicographic (tile, depth-bits) sort — same resulting order — with an
  optional packed single-key fast mode (quantized depth);
* capacity is static; overflow is *reported*, never silent (the caller can
  retry with the next capacity tier).
"""
from __future__ import annotations

import os
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .projection import Splats


class Binning(NamedTuple):
    gauss_id: jnp.ndarray    # (capacity,) int32 source gaussian per instance slot
    tile_id: jnp.ndarray     # (capacity,) int32 sorted tile per slot (num_tiles = invalid)
    tile_start: jnp.ndarray  # (num_tiles,) int32 first slot of each tile
    tile_count: jnp.ndarray  # (num_tiles,) int32 instances in each tile
    num_instances: jnp.ndarray  # () int32 total emitted (may exceed capacity!)
    emit_slot: jnp.ndarray   # (capacity,) int32 emission index of each sorted slot
    offsets: jnp.ndarray     # (N+1,) int32 emission range starts per gaussian
    attrs: Any = None        # optional (capacity, n_attr) f32 — per-gaussian
                             # attributes carried through the sort as payload
                             # operands (streams; a post-sort row gather of
                             # the same data costs ~2x, profiled round 1)


def num_tiles(width: int, height: int, tile_w: int, tile_h: int) -> int:
    return (-(-width // tile_w)) * (-(-height // tile_h))


@partial(jax.jit, static_argnames=("capacity", "width", "height",
                                   "tile_w", "tile_h", "precise",
                                   "sort_mode"))
def bin_instances(splats: Splats, capacity: int, width: int, height: int,
                  tile_w: int, tile_h: int, precise: bool = True,
                  attrs=None, sort_mode: str = "auto") -> Binning:
    """Build depth-sorted per-tile instance lists with static capacity.

    If ``num_instances > capacity`` the trailing instances (highest gaussian
    indices in emission order) are dropped deterministically; callers must
    check and re-run at a larger capacity tier for exact rendering.

    ``precise=True`` (training default) sorts by exact depth within each
    tile.  When ``tile_bits + ceil(log2 N) <= 32`` this is done with one
    *fused* uint32 key ``tile << rank_bits | depth_rank(gaussian)`` — the
    per-scene depth ranks come from a stable N-scale argsort, so the
    resulting order is bit-identical to the lexicographic (tile,
    depth-bits, emission) sort (= the reference's stable 64-bit radix,
    rasterizer_impl.cu:306-314) while XLA sorts the single int key
    radix-style instead of with a lexicographic comparator network.
    ``sort_mode`` ("auto"/"fused"/"lex") pins the strategy for A/B runs;
    env GSCREAM_SORT_LEX=1 forces "lex" under "auto".

    ``precise=False`` packs (tile, quantized depth) into a single int32
    key — the depth keeps its top float bits (≈2⁻¹² relative resolution),
    so gaussians closer than that in depth may blend in emission order
    instead of strict depth order.  Only available when the tile grid
    fits 11 bits, else falls back to exact.

    ``attrs`` (N, n_attr) f32 per-gaussian attributes are expanded to
    emission order inside the *single* row-gather this function already
    pays, then ride the sort as payload operands — the downstream
    ``pack_instance_data`` then needs no gather at all (TPU sorts stream;
    a 2M-row random gather of the same data costs ~2x, round-1 profile).
    """
    if attrs is not None and os.environ.get("GSCREAM_ATTRS_GATHER"):
        # A/B: drop the 11 payload operands from the sort; the packer
        # then re-gathers attrs per instance (attrs[gauss_id] row gather)
        attrs = None
    grid_x = -(-width // tile_w)
    n_tiles = num_tiles(width, height, tile_w, tile_h)

    rect_w = (splats.rect_max[:, 0] - splats.rect_min[:, 0])
    rect_h = (splats.rect_max[:, 1] - splats.rect_min[:, 1])
    area = jnp.where(splats.radius > 0, rect_w * rect_h, 0)
    n_gauss = area.shape[0]

    # exact fused single key: sorting by (tile, per-scene depth RANK) is
    # identical to the lexicographic (tile, depth-bits) sort — ranks come
    # from one stable N-scale argsort (ties broken by gaussian index,
    # exactly the stable radix semantics of rasterizer_impl.cu:306-314) —
    # but needs only one int key, which XLA sorts radix-style instead of
    # with a full lexicographic comparator network
    rank_bits = max(int(n_gauss - 1).bit_length(), 1)
    tile_bits = int(n_tiles).bit_length()
    if sort_mode == "auto":
        sort_mode = "lex" if os.environ.get("GSCREAM_SORT_LEX") else "fused"
    fused_exact = (precise and sort_mode == "fused"
                   and tile_bits + rank_bits <= 32)

    offsets = jnp.cumsum(area) - area            # exclusive prefix sum
    total = offsets[-1] + area[-1]

    # slot → source gaussian: scatter each emitting gaussian's id at its
    # first slot, then a running max fills the gaps (replaces a per-slot
    # binary search — one scatter + one cummax instead of ~21 gather
    # rounds over the full capacity)
    slot = jnp.arange(capacity, dtype=jnp.int32)
    gid = jnp.arange(area.shape[0], dtype=jnp.int32)
    first_slot = jnp.where(area > 0, offsets, capacity)  # drop empty rects
    marks = jnp.zeros((capacity,), jnp.int32).at[first_slot].max(
        gid, mode='drop')
    g = jax.lax.cummax(marks)

    # one fused row-gather for every per-gaussian emission attribute —
    # TPU gathers pay a large per-row overhead, so five separate scalar
    # gathers of 2M elements cost ~20× one (N,8)-row gather (profiled)
    gdepth_bits = jax.lax.bitcast_convert_type(splats.depth, jnp.int32)
    cols = [
        offsets.astype(jnp.int32),
        splats.rect_min[:, 0], splats.rect_min[:, 1],
        jnp.maximum(rect_w, 1).astype(jnp.int32),
        gdepth_bits,
    ]
    if fused_exact:
        # rank[g] = position of g in the stable depth order (N-scale)
        _, order = jax.lax.sort(
            (gdepth_bits, jnp.arange(n_gauss, dtype=jnp.int32)),
            num_keys=1, is_stable=True)
        rank = jnp.zeros((n_gauss,), jnp.int32).at[order].set(
            jnp.arange(n_gauss, dtype=jnp.int32))
        cols.append(rank)
    a0 = len(cols)                               # attr column base
    n_attr = 0
    if attrs is not None:
        n_attr = attrs.shape[1]
        cols += [jax.lax.bitcast_convert_type(attrs[:, i], jnp.int32)
                 for i in range(n_attr)]
    pad_cols = -len(cols) % 8
    cols += [jnp.zeros_like(offsets, dtype=jnp.int32)] * pad_cols
    emit_tab = jnp.stack(cols, axis=1)           # (N, a0+n_attr→8k) int32
    et = emit_tab[g]                             # (capacity,·) row gather
    local = slot - et[:, 0]
    rw = et[:, 3]
    tile_x = et[:, 1] + local % rw
    tile_y = et[:, 2] + local // rw
    tile = tile_y * grid_x + tile_x
    attr_ops = tuple(
        jax.lax.bitcast_convert_type(et[:, a0 + i], jnp.float32)
        for i in range(n_attr))

    valid = slot < jnp.minimum(total, capacity)
    tile = jnp.where(valid, tile, n_tiles).astype(jnp.int32)
    # depth as a sortable int key: positive-float bits order like floats
    depth_bits = jnp.where(valid, et[:, 4], jnp.int32(2 ** 30))

    if fused_exact:
        key = ((tile.astype(jnp.uint32)
                << np.uint32(rank_bits))
               | jnp.where(valid, et[:, 5], 0).astype(jnp.uint32))
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
        [offsets.astype(jnp.int32),
         total.astype(jnp.int32).reshape(1)])
    all_offsets = jnp.minimum(all_offsets, capacity)
    return Binning(gauss_id=sorted_gauss.astype(jnp.int32),
                   tile_id=sorted_tile,
                   tile_start=tile_start,
                   tile_count=tile_end - tile_start,
                   num_instances=total.astype(jnp.int32),
                   emit_slot=emit_slot.astype(jnp.int32),
                   offsets=all_offsets,
                   attrs=(jnp.stack(sorted_attrs, axis=1)
                          if n_attr else None))
