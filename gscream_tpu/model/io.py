"""Model checkpointing: anchor PLY + MLP/optimizer state via orbax.

Mirrors the reference's three persistence mechanisms (SURVEY.md §5):

* :func:`save_anchors_ply` / :func:`load_anchors_ply` — the PLY anchor
  layout of ``save_ply``/``load_ply_sparse_gaussian``
  (gaussian_model.py:620-686): alive anchors only (compacted on save,
  re-padded on load);
* :func:`save_checkpoint` / :func:`load_checkpoint` — the full functional
  train state (params + Adam moments + densify stats + RNG) as one orbax
  pytree, replacing the reference's broken ``capture``/``restore`` pair
  (gaussian_model.py:203-237) with a correct, preemption-safe resume path.
"""
from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.ply import read_ply, write_ply
from .scaffold import AnchorParams, ScaffoldConfig, ScaffoldState


def save_anchors_ply(path: str, state: ScaffoldState,
                     cfg: ScaffoldConfig) -> None:
    alive = np.asarray(state.alive)
    p = jax.tree.map(lambda x: np.asarray(x)[alive], state.params)
    n, k = p.offset.shape[0], cfg.n_offsets
    cols = {"x": p.anchor[:, 0], "y": p.anchor[:, 1], "z": p.anchor[:, 2],
            "nx": np.zeros(n), "ny": np.zeros(n), "nz": np.zeros(n)}
    # reference stores offsets transposed: (N,k,3)→(N,3,k) flat
    off = p.offset.transpose(0, 2, 1).reshape(n, -1)
    for i in range(off.shape[1]):
        cols[f"f_offset_{i}"] = off[:, i]
    for i in range(p.feat.shape[1]):
        cols[f"f_anchor_feat_{i}"] = p.feat[:, i]
    cols["opacity"] = p.opacity[:, 0]
    cols["uncertainty"] = p.uncertainty[:, 0]
    for i in range(6):
        cols[f"scale_{i}"] = p.scaling[:, i]
    for i in range(4):
        cols[f"rot_{i}"] = p.rotation[:, i]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    write_ply(path, cols)


def load_anchors_ply(path: str, cfg: ScaffoldConfig) -> Tuple[AnchorParams,
                                                              np.ndarray]:
    """Returns (capacity-padded AnchorParams, alive mask)."""
    d = read_ply(path)
    n = len(d["x"])
    C, k, F = cfg.capacity, cfg.n_offsets, cfg.feat_dim
    if n > C:
        raise ValueError(f"{n} anchors exceed capacity {C}")

    def col_block(prefix, m):
        names = sorted((name for name in d if name.startswith(prefix)),
                       key=lambda s: int(s.split("_")[-1]))
        return np.stack([d[name] for name in names], 1).astype(np.float32)

    anchor = np.stack([d["x"], d["y"], d["z"]], 1).astype(np.float32)
    off = col_block("f_offset_", 3 * k).reshape(n, 3, k).transpose(0, 2, 1)
    feat = col_block("f_anchor_feat_", F)
    scaling = col_block("scale_", 6)
    rot = col_block("rot_", 4)

    def pad(x):
        out = np.zeros((C,) + x.shape[1:], np.float32)
        out[:n] = x
        return jnp.asarray(out)

    params = AnchorParams(
        anchor=pad(anchor), offset=pad(off), feat=pad(feat),
        scaling=pad(scaling), rotation=pad(rot),
        opacity=pad(np.asarray(d["opacity"], np.float32)[:, None]),
        uncertainty=pad(np.asarray(d["uncertainty"], np.float32)[:, None]),
    )
    alive = np.zeros(C, bool)
    alive[:n] = True
    return params, jnp.asarray(alive)


def save_checkpoint(path: str, train_state) -> None:
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, train_state, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, template):
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)


def save_mlps_npz(path: str, mlps) -> None:
    """Per-MLP decoder checkpoint beside the point cloud — the TPU-native
    equivalent of the reference's ``save_mlp_checkpoints``
    (gaussian_model.py:975-988, torch .pth per MLP): one .npz whose keys
    are ``<mlp>/<path>`` flattened parameter arrays.  Together with the
    anchors PLY this makes a trained model loadable without the orbax
    training checkpoint (the reference's eval-time contract)."""
    import jax
    import numpy as np
    flat = {}
    for name, tree in mlps._asdict().items():
        leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
        for kp, leaf in leaves:
            key = name + "/" + "/".join(
                str(getattr(p, "name", getattr(p, "idx", p))) for p in kp)
            flat[key] = np.asarray(leaf)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def load_mlps_npz(path: str, template):
    """Inverse of :func:`save_mlps_npz`: restores into ``template``'s
    structure (shape-checked)."""
    import jax
    import numpy as np
    z = np.load(path)
    new = {}
    for name, tree in template._asdict().items():
        leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
        vals = []
        for kp, leaf in leaves:
            key = name + "/" + "/".join(
                str(getattr(p, "name", getattr(p, "idx", p))) for p in kp)
            arr = z[key]
            assert arr.shape == leaf.shape, (key, arr.shape, leaf.shape)
            vals.append(jnp.asarray(arr))
        new[name] = jax.tree_util.tree_unflatten(treedef, vals)
    return type(template)(**new)


def load_trained_scaffold(model_path: str, iteration: int = -1):
    """Trained-model restore: ``<model>/cfg.json`` +
    ``point_cloud/iteration_<N>/{point_cloud.ply, mlp_checkpoints.npz}`` →
    a ready ScaffoldState (the reference Scene ``load_iteration`` path,
    scene/__init__.py:141-149).  Returns (scaffold, scaffold_cfg, it)."""
    import jax

    from ..config import ModelConfig, RunConfig, load_config
    from .scaffold import ScaffoldConfig, init_scaffold

    cfg_path = os.path.join(model_path, "cfg.json")
    if os.path.exists(cfg_path):
        run = load_config(cfg_path)
    else:
        run = RunConfig(model=ModelConfig())
    m = run.model
    cfg = ScaffoldConfig(
        feat_dim=m.feat_dim, n_offsets=m.n_offsets,
        voxel_size=m.voxel_size, capacity=m.anchor_capacity,
        attn_heads=run.optim.attn_head_num,
        attn_head_dim=run.optim.attn_head_dim,
        use_feat_bank=m.use_feat_bank)

    base = os.path.join(model_path, "point_cloud")
    its = [int(d.split("_")[-1]) for d in os.listdir(base)
           if d.startswith("iteration_")]
    if not its:
        raise FileNotFoundError(f"no point_cloud/iteration_* under "
                                f"{model_path}")
    it = max(its) if iteration < 0 else iteration
    ply_dir = os.path.join(base, f"iteration_{it}")

    params, alive = load_anchors_ply(
        os.path.join(ply_dir, "point_cloud.ply"), cfg)
    # dummy cloud: only the pytree SHAPES matter, params/alive are replaced
    dummy = np.linspace(0.0, 1.0, 24, dtype=np.float32).reshape(8, 3)
    scaffold = init_scaffold(jax.random.PRNGKey(0), dummy, cfg,
                             voxel_size=1e-3)._replace(
        params=params, alive=alive)
    mlp_path = os.path.join(ply_dir, "mlp_checkpoints.npz")
    if os.path.exists(mlp_path):
        scaffold = scaffold._replace(
            mlps=load_mlps_npz(mlp_path, scaffold.mlps))
    return scaffold, cfg, it


def write_scene_artifacts(model_path: str, views, points) -> None:
    """The reference Scene's load-time artifacts (scene/__init__.py:62-78):
    ``input.ply`` (the initial cloud) and ``cameras.json`` (test cams then
    train cams, camera_to_JSON fields — c2w position/rotation, fx/fy)."""
    import json

    import numpy as np

    from ..data.ply import write_ply
    os.makedirs(model_path, exist_ok=True)
    pts = np.asarray(points, np.float32)
    write_ply(os.path.join(model_path, "input.ply"),
              {"x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2]})
    cams = []
    for i, v in enumerate(views):
        c = v.camera
        w2c = np.asarray(c.w2c, np.float64)
        c2w = np.linalg.inv(w2c)
        cams.append({
            "id": i,
            "img_name": getattr(v, "name", f"{i:05d}"),
            "width": int(c.width),
            "height": int(c.height),
            "position": c2w[:3, 3].tolist(),
            "rotation": [r.tolist() for r in c2w[:3, :3]],
            "fy": float(c.height / (2.0 * float(c.tan_fovy))),
            "fx": float(c.width / (2.0 * float(c.tan_fovx))),
        })
    with open(os.path.join(model_path, "cameras.json"), "w") as f:
        json.dump(cams, f)
