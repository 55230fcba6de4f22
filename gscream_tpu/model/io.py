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
