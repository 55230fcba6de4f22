"""PLY + checkpoint roundtrip tests."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from gscream_tpu.data.ply import read_ply, read_ply_xyz, write_ply
from gscream_tpu.model.io import load_anchors_ply, save_anchors_ply
from gscream_tpu.model.scaffold import ScaffoldConfig, init_scaffold

CFG = ScaffoldConfig(feat_dim=8, n_offsets=3, voxel_size=0.05, capacity=1024)


def test_ply_roundtrip(tmp_path, rng):
    cols = {"x": rng.normal(size=50).astype(np.float32),
            "y": rng.normal(size=50).astype(np.float32),
            "z": rng.normal(size=50).astype(np.float32),
            "val_0": rng.normal(size=50).astype(np.float32)}
    p = str(tmp_path / "test.ply")
    write_ply(p, cols)
    back = read_ply(p)
    for k in cols:
        np.testing.assert_allclose(back[k], cols[k], rtol=1e-6)
    xyz = read_ply_xyz(p)
    assert xyz.shape == (50, 3)


def test_anchor_ply_roundtrip(tmp_path, rng):
    pts = rng.uniform(-1, 1, (200, 3)).astype(np.float32)
    st = init_scaffold(jax.random.PRNGKey(0), pts, CFG)
    # randomize params so the roundtrip is meaningful
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 3)
    st = st._replace(params=st.params._replace(
        feat=jax.random.normal(ks[0], st.params.feat.shape),
        offset=jax.random.normal(ks[1], st.params.offset.shape),
    ))
    p = str(tmp_path / "anchors.ply")
    save_anchors_ply(p, st, CFG)
    params, alive = load_anchors_ply(p, CFG)
    n = int(jnp.sum(st.alive))
    assert int(jnp.sum(alive)) == n
    for a, b in zip(jax.tree.leaves(st.params), jax.tree.leaves(params)):
        np.testing.assert_allclose(np.asarray(a)[:n], np.asarray(b)[:n],
                                   rtol=1e-6)


def test_load_trained_scaffold(tmp_path, rng):
    """Model-directory restore (reference Scene load_iteration,
    scene/__init__.py:141-149): cfg.json + point_cloud/iteration_<N> →
    a ready ScaffoldState, used by render.py and bench.py --ply."""
    import dataclasses
    import json

    from gscream_tpu.config import ModelConfig, OptimConfig, RunConfig
    from gscream_tpu.model.io import (load_trained_scaffold, save_anchors_ply,
                                      save_mlps_npz)

    pts = rng.uniform(-1, 1, (200, 3)).astype(np.float32)
    st = init_scaffold(jax.random.PRNGKey(0), pts, CFG)
    st = st._replace(params=st.params._replace(
        feat=jax.random.normal(jax.random.PRNGKey(1), st.params.feat.shape)))
    mdir = tmp_path / "model"
    pdir = mdir / "point_cloud" / "iteration_77"
    save_anchors_ply(str(pdir / "point_cloud.ply"), st, CFG)
    save_mlps_npz(str(pdir / "mlp_checkpoints.npz"), st.mlps)
    run = RunConfig(model=ModelConfig(
        feat_dim=CFG.feat_dim, n_offsets=CFG.n_offsets,
        voxel_size=CFG.voxel_size, anchor_capacity=CFG.capacity),
        optim=OptimConfig())
    with open(mdir / "cfg.json", "w") as f:
        json.dump(dataclasses.asdict(run), f)

    back, cfg2, it = load_trained_scaffold(str(mdir))
    assert it == 77
    assert cfg2.capacity == CFG.capacity
    n = int(jnp.sum(st.alive))
    assert int(jnp.sum(back.alive)) == n
    for a, b in zip(jax.tree.leaves(st.params), jax.tree.leaves(back.params)):
        np.testing.assert_allclose(np.asarray(a)[:n], np.asarray(b)[:n],
                                   rtol=1e-6)
    for a, b in zip(jax.tree.leaves(st.mlps), jax.tree.leaves(back.mlps)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mlps_npz_roundtrip(tmp_path):
    """save_mlp_checkpoints equivalent (gaussian_model.py:975-1000):
    decoder MLPs round-trip through the .npz beside the point cloud."""
    import jax
    import jax.numpy as jnp
    from gscream_tpu.model.io import load_mlps_npz, save_mlps_npz
    from gscream_tpu.model.scaffold import ScaffoldConfig, init_scaffold

    cfg = ScaffoldConfig(feat_dim=8, n_offsets=2, voxel_size=0.1,
                         capacity=128)
    pts = np.random.default_rng(0).normal(0, 1, (40, 3)).astype(np.float32)
    sc = init_scaffold(jax.random.PRNGKey(3), pts, cfg)
    p = str(tmp_path / "mlp_checkpoints.npz")
    save_mlps_npz(p, sc.mlps)
    zeroed = jax.tree.map(jnp.zeros_like, sc.mlps)
    back = load_mlps_npz(p, zeroed)
    for a, b in zip(jax.tree.leaves(sc.mlps), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
