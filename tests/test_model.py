"""Scaffold model layer tests: KNN, init, decode, densification."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gscream_tpu.model import densify as dz
from gscream_tpu.model.scaffold import (
    ScaffoldConfig, decode, init_scaffold, n_alive)
from gscream_tpu.ops.knn import mean_knn_sq_dist


CFG = ScaffoldConfig(feat_dim=16, n_offsets=4, voxel_size=0.05,
                     capacity=2048)


def test_knn_matches_bruteforce(rng):
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    got = np.asarray(mean_knn_sq_dist(jnp.asarray(pts), block=64))
    d = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    want = np.sort(d, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_init_scaffold_voxelization(rng):
    pts = rng.uniform(-1, 1, (1000, 3)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    st = init_scaffold(key, pts, CFG)
    n = int(n_alive(st))
    assert 0 < n <= CFG.capacity
    # anchors are voxel centers: multiples of voxel_size
    anchors = np.asarray(st.params.anchor)[:n]
    np.testing.assert_allclose(anchors / CFG.voxel_size,
                               np.round(anchors / CFG.voxel_size), atol=1e-4)
    # no duplicate voxel
    assert len(np.unique(np.round(anchors / CFG.voxel_size).astype(int),
                         axis=0)) == n


def test_decode_shapes_and_mask(rng):
    pts = rng.uniform(-1, 1, (300, 3)).astype(np.float32)
    st = init_scaffold(jax.random.PRNGKey(1), pts, CFG)
    dec = decode(st, jnp.zeros(3), None, CFG)
    CK = CFG.capacity * CFG.n_offsets
    assert dec.xyz.shape == (CK, 3)
    assert dec.color.shape == (CK, 3)
    assert dec.opacity.shape == (CK,)
    # dead anchors produce inactive gaussians with zero opacity
    dead = ~np.repeat(np.asarray(st.alive), CFG.n_offsets)
    assert not np.any(np.asarray(dec.active)[dead])
    assert np.all(np.asarray(dec.opacity)[dead] == 0)
    # colors in [0,1], scales positive
    assert np.all(np.asarray(dec.color) >= 0) and np.all(
        np.asarray(dec.color) <= 1)
    assert np.all(np.asarray(dec.scale) > 0)
    # rotations normalized
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(dec.rot), axis=1), 1.0, atol=1e-5)


def _adam_like_moments(params):
    return (jax.tree.map(jnp.zeros_like, params),
            jax.tree.map(jnp.zeros_like, params))


def test_densify_grow_and_prune(rng):
    pts = rng.uniform(-1, 1, (200, 3)).astype(np.float32)
    st = init_scaffold(jax.random.PRNGKey(2), pts, CFG)
    n0 = int(n_alive(st))
    stats = dz.init_stats(CFG)
    C, k = CFG.capacity, CFG.n_offsets

    # fabricate stats: half of the anchors have large offset grads and
    # well-observed denominators; offsets pushed away from their anchor
    big = jnp.zeros((C, k)).at[: n0 // 2].set(1.0)
    stats = stats._replace(
        offset_grad_accum=big * 100.0 * 2e-4,
        offset_denom=big * 100.0,
        opacity_accum=jnp.ones((C, 1)) * 10.0,   # no pruning
        anchor_demon=jnp.ones((C, 1)) * 10.0,
    )
    # give offsets a displacement so candidates land in new voxels
    params = st.params._replace(
        offset=jnp.ones_like(st.params.offset) * 5.0)
    st = st._replace(params=params)

    moments = _adam_like_moments(st.params)
    st2, stats2, moments2 = dz.adjust_anchors(
        st, stats, moments, jax.random.PRNGKey(3), CFG)
    n1 = int(n_alive(st2))
    assert n1 > n0  # growth happened
    # newborn anchors have zero moments and zero offsets
    born = np.asarray(st2.alive & ~st.alive)
    assert born.sum() == n1 - n0
    m0 = np.asarray(moments2[0].offset)[born]
    assert np.all(m0 == 0)
    # stats for candidate offsets were reset
    assert float(jnp.sum(stats2.offset_denom)) == 0.0


def test_densify_prune(rng):
    pts = rng.uniform(-1, 1, (200, 3)).astype(np.float32)
    st = init_scaffold(jax.random.PRNGKey(2), pts, CFG)
    n0 = int(n_alive(st))
    stats = dz.init_stats(CFG)
    # all observed, zero opacity → prune everything observed
    stats = stats._replace(
        anchor_demon=jnp.ones((CFG.capacity, 1)) * 1000.0,
        opacity_accum=jnp.zeros((CFG.capacity, 1)),
    )
    moments = _adam_like_moments(st.params)
    st2, stats2, _ = dz.adjust_anchors(
        st, stats, moments, jax.random.PRNGKey(3), CFG)
    assert int(n_alive(st2)) == 0
    # scaling clamp applied (log-space cap at 0.05)
    assert float(jnp.max(st2.params.scaling[:, 3:])) <= 0.05 + 1e-6


def test_densify_dedup_existing(rng):
    """Candidates landing on an existing anchor's voxel are rejected."""
    pts = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    st = init_scaffold(jax.random.PRNGKey(5), pts, CFG)
    n0 = int(n_alive(st))
    stats = dz.init_stats(CFG)
    # offsets exactly zero → candidates at the anchor position itself,
    # which (at the finest level) dedups against the existing anchor...
    # coarser levels use bigger voxels that also contain the anchor.
    stats = stats._replace(
        offset_grad_accum=jnp.ones((CFG.capacity, CFG.n_offsets)) * 100 * 1.0,
        offset_denom=jnp.ones((CFG.capacity, CFG.n_offsets)) * 100.0,
        opacity_accum=jnp.ones((CFG.capacity, 1)) * 10.0,
        anchor_demon=jnp.ones((CFG.capacity, 1)) * 10.0,
    )
    moments = _adam_like_moments(st.params)
    st2, _, _ = dz.adjust_anchors(st, stats, moments,
                                  jax.random.PRNGKey(6), CFG)
    assert int(n_alive(st2)) == n0  # nothing new


def test_feat_bank_decode(rng):
    """use_feat_bank: softmax-weighted multi-resolution feature mixing
    (gaussian_model.py:109-115, gaussian_renderer/__init__.py:39-50)
    changes the decode output and matches a manual torch-repeat-style
    tiling of the strided subsamples."""
    pts = rng.uniform(-1, 1, (50, 3)).astype(np.float32)
    cfg_fb = CFG._replace(use_feat_bank=True)
    st = init_scaffold(jax.random.PRNGKey(7), pts, cfg_fb)
    assert st.mlps.feat_bank is not None
    feat = 0.5 * jax.random.normal(jax.random.PRNGKey(8),
                                   st.params.feat.shape)
    st = st._replace(params=st.params._replace(feat=feat))
    cam = jnp.array([0.0, 0.0, 3.0])

    dec_fb = decode(st, cam, None, cfg_fb)
    dec_plain = decode(st, cam, None, CFG)
    # mixing must actually change the decoded colors
    assert not np.allclose(np.asarray(dec_fb.color),
                           np.asarray(dec_plain.color))

    # manual reimplementation of the mix for one anchor
    from gscream_tpu.model.scaffold import apply_mlp
    i = 3
    view = st.params.anchor[i] - cam
    dist = jnp.linalg.norm(view)
    dirn = view / dist
    cat = jnp.concatenate([dirn, dist[None]])[None]
    bw = apply_mlp(st.mlps.feat_bank, cat,
                   lambda z: jax.nn.softmax(z, axis=1))[0]
    f = feat[i]
    mixed = (jnp.tile(f[::4], 4) * bw[0] + jnp.tile(f[::2], 2) * bw[1]
             + f * bw[2])
    x = jnp.concatenate([mixed, dirn, dist[None]])[None]
    color_i = apply_mlp(st.mlps.color, x, jax.nn.sigmoid).reshape(
        cfg_fb.n_offsets, 3)
    np.testing.assert_allclose(
        np.asarray(dec_fb.color[i * cfg_fb.n_offsets:(i + 1)
                                * cfg_fb.n_offsets]),
        np.asarray(color_i), rtol=1e-5, atol=1e-6)
