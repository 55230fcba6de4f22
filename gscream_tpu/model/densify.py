"""Anchor densification: growing and pruning with static shapes.

Functional port of the reference's shape-mutating densification
(``scene/gaussian_model.py:730-973``): the reference concatenates/prunes
parameter tensors and surgically edits Adam moments every 100 iterations;
here anchors live in capacity-padded arrays with an ``alive`` mask, growth
writes into free slots and pruning clears mask bits, so every array shape
is static and the whole transform jits (SURVEY.md §7 hard part 4).

Semantics matched to the reference:

* stats (``training_statis`` gaussian_model.py:730-757): per-anchor opacity
  sums over visible anchors, visit counts, per-offset screen-gradient norms
  (in the reference's NDC units — the ×0.5·W/H factors of
  backward.cu:488-489,592-593 are applied by the caller);
* growing (``anchor_growing`` 808-911): ``update_depth`` hierarchy levels
  with threshold ``grad_thr·(hier//2)^i``, random keep 1−0.5^{i+1}, voxel
  size ``voxel·(init_factor // hier^i)``, candidate uniquification +
  dedup against existing anchors on exact integer voxel coords, features
  from a max-reduction over the candidates that landed in each voxel,
  new scales ``log(cur_size)``, opacity/uncertainty logits σ⁻¹(0.1);
* pruning (``adjust_anchor`` 937-971): anchors observed more than
  ``interval·success`` times whose accumulated opacity stays below
  ``min_opacity·count``; the reference's scaling clamp side effect
  (log-scale[:,3:] capped at 0.05, gaussian_model.py:776-788) is applied;
* overflow (free slots exhausted) is counted and reported, never silent.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .scaffold import AnchorParams, ScaffoldConfig, ScaffoldState, \
    inverse_sigmoid


class DensifyStats(NamedTuple):
    opacity_accum: jnp.ndarray    # (C,1)
    anchor_demon: jnp.ndarray     # (C,1) visit counts
    offset_grad_accum: jnp.ndarray  # (C,k)
    offset_denom: jnp.ndarray     # (C,k)
    grow_overflow: jnp.ndarray    # () int32 — candidates dropped for space


def init_stats(cfg: ScaffoldConfig) -> DensifyStats:
    C, k = cfg.capacity, cfg.n_offsets
    z = jnp.zeros
    return DensifyStats(z((C, 1)), z((C, 1)), z((C, k)), z((C, k)),
                        jnp.int32(0))


@jax.jit
def accumulate_stats(stats: DensifyStats, neural_opacity, screen_grad,
                     gauss_valid, anchor_visible) -> DensifyStats:
    """training_statis (gaussian_model.py:730-757).

    neural_opacity: (C,k) raw tanh outputs; screen_grad: (C,k) NDC-unit
    gradient norms of the 2D means; gauss_valid: (C,k) bool — gaussian
    passed the opacity>0 selection *and* was visible (radius>0);
    anchor_visible: (C,) bool from the prefilter.
    """
    op = jnp.maximum(neural_opacity, 0.0)
    vis = anchor_visible[:, None]
    opacity_accum = stats.opacity_accum + jnp.where(
        vis, jnp.sum(op, axis=1, keepdims=True), 0.0)
    anchor_demon = stats.anchor_demon + vis.astype(jnp.float32)
    upd = gauss_valid & anchor_visible[:, None]
    offset_grad = stats.offset_grad_accum + jnp.where(upd, screen_grad, 0.0)
    offset_denom = stats.offset_denom + upd.astype(jnp.float32)
    return stats._replace(opacity_accum=opacity_accum,
                          anchor_demon=anchor_demon,
                          offset_grad_accum=offset_grad,
                          offset_denom=offset_denom)


def _voxel_keys(coords):
    """(N,3) int32 voxel coords → three exact lexicographic int32 keys.

    The reference dedups on exact integer voxel coords with no range
    limit (gaussian_model.py:834-859); three full-width keys keep that
    exactness at any scene extent (no packing, no clamp — |coord| can use
    the whole int32 range short of the 2³⁰ non-candidate sentinel).
    """
    return coords[:, 0], coords[:, 1], coords[:, 2]


def _lex_sort(k1, k2, k3):
    """Stable lexicographic order by (k1, k2, k3): returns the permutation."""
    o = jnp.argsort(k3, stable=True)
    o = o[jnp.argsort(k2[o], stable=True)]
    return o[jnp.argsort(k1[o], stable=True)]


@partial(jax.jit, static_argnames=("cfg",))
def adjust_anchors(state: ScaffoldState, stats: DensifyStats, opt_moments,
                   key, cfg: ScaffoldConfig,
                   check_interval: float = 100,
                   success_threshold: float = 0.8,
                   grad_threshold: float = 2e-4,
                   min_opacity: float = 0.005):
    """Growing + pruning.  Returns (state, stats, opt_moments).

    ``opt_moments`` is a pytree of (m, v) Adam moment pairs aligned with
    ``state.params`` — new slots get zeroed moments, pruned slots are
    cleared, mirroring the reference's optimizer-state surgery
    (gaussian_model.py:705-726, 762-792).
    """
    p = state.params
    C, k = cfg.capacity, cfg.n_offsets
    CK = C * k

    grads = stats.offset_grad_accum / jnp.maximum(stats.offset_denom, 1e-12)
    grads = jnp.where(stats.offset_denom > 0, grads, 0.0).reshape(CK)
    offset_mask = (stats.offset_denom
                   > check_interval * success_threshold * 0.5).reshape(CK)
    offset_mask = offset_mask & jnp.repeat(state.alive, k)

    # candidate positions for every (anchor, offset)
    extent = jnp.exp(p.scaling[:, :3])
    cand_xyz = (p.anchor[:, None, :] + p.offset * extent[:, None, :]
                ).reshape(CK, 3)

    alive = state.alive
    new_params = p
    new_moments = opt_moments
    overflow = stats.grow_overflow
    feat_rep = jnp.repeat(p.feat, k, axis=0)      # (CK, F)

    for level in range(cfg.update_depth):
        key, sub = jax.random.split(key)
        cur_threshold = grad_threshold * (
            (cfg.update_hierachy_factor // 2) ** level)
        size_factor = cfg.update_init_factor // (
            cfg.update_hierachy_factor ** level)
        cur_size = cfg.voxel_size * size_factor

        cand = (grads >= cur_threshold) & offset_mask
        rand_keep = jax.random.uniform(sub, (CK,)) > (0.5 ** (level + 1))
        cand = cand & rand_keep

        coords = jnp.round(cand_xyz / cur_size).astype(jnp.int32)
        k1, k2, k3 = _voxel_keys(coords)
        # push non-candidates to the end of the sort with a sentinel key
        k1 = jnp.where(cand, k1, jnp.int32(2 ** 30))
        order = _lex_sort(k1, k2, k3)
        k1s, k2s, k3s = k1[order], k2[order], k3[order]
        idx_s, feat_s = order, feat_rep[order]
        same_as_prev = jnp.concatenate([
            jnp.array([False]),
            (k1s[1:] == k1s[:-1]) & (k2s[1:] == k2s[:-1])
            & (k3s[1:] == k3s[:-1])])
        is_cand = k1s < 2 ** 30
        first = is_cand & ~same_as_prev
        # feature per unique voxel: max over the group (scatter_max,
        # gaussian_model.py:874) via segment_max on group ranks
        group = jnp.cumsum(first.astype(jnp.int32)) - 1
        group = jnp.where(is_cand, jnp.maximum(group, 0), CK - 1)
        feat_max = jax.ops.segment_max(
            jnp.where(is_cand[:, None], feat_s, -jnp.inf),
            group, num_segments=CK)
        feat_max = jnp.where(jnp.isfinite(feat_max), feat_max, 0.0)
        feat_vals = feat_max[group]               # per-position group max

        # dedup against existing (alive) anchors on the same grid — exact
        # lexicographic binary search over sorted (k1,k2) pairs
        ex_coords = jnp.round(new_params.anchor / cur_size).astype(jnp.int32)
        e1, e2, e3 = _voxel_keys(ex_coords)
        e1 = jnp.where(alive, e1, jnp.int32(2 ** 30))
        eorder = _lex_sort(e1, e2, e3)
        e1s, e2s, e3s = e1[eorder], e2[eorder], e3[eorder]
        lo = jnp.zeros((CK,), jnp.int32)
        hi = jnp.full((CK,), C, jnp.int32)
        for _ in range(C.bit_length()):
            mid = (lo + hi) // 2
            midc = jnp.clip(mid, 0, C - 1)
            less = ((e1s[midc] < k1s)
                    | ((e1s[midc] == k1s) & (e2s[midc] < k2s))
                    | ((e1s[midc] == k1s) & (e2s[midc] == k2s)
                       & (e3s[midc] < k3s)))
            lo = jnp.where(less, mid + 1, lo)
            hi = jnp.where(less, hi, mid)
        loc = jnp.clip(lo, 0, C - 1)
        dup = ((lo < C) & (e1s[loc] == k1s) & (e2s[loc] == k2s)
               & (e3s[loc] == k3s))
        survivor = first & ~dup

        # compact survivors into free slots (extra dummy slot absorbs
        # the scatter of non-survivors)
        surv_rank = jnp.cumsum(survivor.astype(jnp.int32)) - 1
        n_surv = jnp.sum(survivor.astype(jnp.int32))
        by_rank_coord = jnp.zeros((CK + 1, 3), jnp.int32)
        by_rank_feat = jnp.zeros((CK + 1, p.feat.shape[1]), jnp.float32)
        coords_s = coords[idx_s]
        dst = jnp.where(survivor, surv_rank, CK)
        by_rank_coord = by_rank_coord.at[dst].set(
            jnp.where(survivor[:, None], coords_s, 0))
        by_rank_feat = by_rank_feat.at[dst].set(
            jnp.where(survivor[:, None], feat_vals, 0.0))

        free = ~alive
        free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
        n_free = jnp.sum(free.astype(jnp.int32))
        take = free & (free_rank < n_surv)
        src = jnp.clip(jnp.where(take, free_rank, CK), 0, CK)

        new_anchor_xyz = by_rank_coord[src].astype(jnp.float32) * cur_size
        new_feat = by_rank_feat[src]
        overflow = overflow + jnp.maximum(n_surv - n_free, 0)

        def upd(old, new_vals):
            return jnp.where(take[:, None], new_vals, old)

        log_size = jnp.log(jnp.float32(cur_size))
        new_params = AnchorParams(
            anchor=upd(new_params.anchor, new_anchor_xyz),
            offset=jnp.where(take[:, None, None],
                             jnp.zeros_like(new_params.offset),
                             new_params.offset),
            feat=upd(new_params.feat, new_feat),
            scaling=upd(new_params.scaling,
                        jnp.full((C, 6), log_size)),
            rotation=upd(new_params.rotation,
                         jnp.broadcast_to(
                             jnp.array([1.0, 0, 0, 0]), (C, 4))),
            opacity=upd(new_params.opacity,
                        jnp.full((C, 1), inverse_sigmoid(0.1))),
            uncertainty=upd(new_params.uncertainty,
                            jnp.full((C, 1), inverse_sigmoid(0.1))),
        )
        # zero Adam moments for newborn slots
        new_moments = jax.tree.map(
            lambda mo: jnp.where(
                take.reshape((C,) + (1,) * (mo.ndim - 1)),
                jnp.zeros_like(mo), mo),
            new_moments)
        alive = alive | take

    # --- pruning (gaussian_model.py:937-971)
    prune = (stats.opacity_accum < min_opacity * stats.anchor_demon)[:, 0]
    observed = (stats.anchor_demon
                > check_interval * success_threshold)[:, 0]
    prune = prune & observed & state.alive
    alive = alive & ~prune

    # scaling clamp side effect on surviving anchors (log-space cap 0.05,
    # gaussian_model.py:776-788)
    clamped = new_params.scaling.at[:, 3:].set(
        jnp.minimum(new_params.scaling[:, 3:], 0.05))
    new_params = new_params._replace(scaling=clamped)

    # stats resets: observed anchors restart their accumulators; offsets
    # that were candidates restart; pruned slots clear
    keep = ~prune
    new_stats = DensifyStats(
        opacity_accum=jnp.where((observed | prune)[:, None], 0.0,
                                stats.opacity_accum),
        anchor_demon=jnp.where((observed | prune)[:, None], 0.0,
                               stats.anchor_demon),
        offset_grad_accum=jnp.where(
            (offset_mask.reshape(C, k)) | ~keep[:, None], 0.0,
            stats.offset_grad_accum),
        offset_denom=jnp.where(
            (offset_mask.reshape(C, k)) | ~keep[:, None], 0.0,
            stats.offset_denom),
        grow_overflow=overflow,
    )
    new_state = state._replace(params=new_params, alive=alive)
    return new_state, new_stats, new_moments
