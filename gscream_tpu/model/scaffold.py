"""Scaffold-GS anchor model as a functional JAX pytree.

Re-designs the reference's mutating ``GaussianModel``
(``scene/gaussian_model.py:34-1039``) as immutable state advanced by pure
functions — the idiomatic XLA shape (SURVEY.md §7 design stance):

* anchor arrays are padded to a static ``capacity`` with an ``alive`` mask;
  densification writes new anchors into free slots and flips mask bits
  instead of reallocating (``adjust_anchor``'s shape mutation,
  gaussian_model.py:914-973, becomes a state→state transform);
* the four 2-layer MLP decoders (opacity/tanh, uncertainty/sigmoid,
  cov, color/sigmoid — gaussian_model.py:118-144) are weight pytrees applied
  with plain matmuls;
* activations: scaling=exp, opacity/uncertainty=sigmoid, rotation=normalize
  (gaussian_model.py:36-54 ``setup_functions``).

Parameter semantics (matching reference shapes):
  anchor (C,3) · offset (C,k,3) · feat (C,F) · scaling (C,6) log-space
  [first 3: offset extent, last 3: gaussian scale base] · rotation (C,4)
  frozen · opacity/uncertainty (C,1) frozen logits.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


# ---------------------------------------------------------------------------
# MLPs (torch nn.Linear-compatible init)

def _linear_init(key, fan_in, fan_out):
    """torch nn.Linear default init: U(±1/sqrt(fan_in)) for W and b."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def init_mlp(key, dims):
    keys = jax.random.split(key, len(dims) - 1)
    return [
        _linear_init(k, dims[i], dims[i + 1]) for i, k in enumerate(keys)
    ]


def apply_mlp(params, x, final_act=None):
    """2-layer MLP with ReLU hidden, as the reference decoders."""
    h = x @ params[0]["w"] + params[0]["b"]
    h = jax.nn.relu(h)
    out = h @ params[1]["w"] + params[1]["b"]
    if final_act is not None:
        out = final_act(out)
    return out


# ---------------------------------------------------------------------------
# state

class ScaffoldConfig(NamedTuple):
    feat_dim: int = 32          # arguments/__init__.py:49
    n_offsets: int = 10         # scripts/run.py config (arguments :50)
    voxel_size: float = 0.001   # arguments/__init__.py:51
    update_depth: int = 3
    update_init_factor: int = 16
    update_hierachy_factor: int = 4
    capacity: int = 2 ** 17     # static anchor capacity (padded)
    attn_heads: int = 8         # crossattn heads (run.py --attn_head_num)
    attn_head_dim: int = 64
    use_feat_bank: bool = False  # view-adaptive multi-res feature mix
                                 # (gaussian_model.py:109-115, default off)


class AnchorParams(NamedTuple):
    """Learnable (and frozen) per-anchor arrays, capacity-padded."""
    anchor: jnp.ndarray       # (C,3)
    offset: jnp.ndarray       # (C,k,3)
    feat: jnp.ndarray         # (C,F)
    scaling: jnp.ndarray      # (C,6) log-space
    rotation: jnp.ndarray     # (C,4) frozen
    opacity: jnp.ndarray      # (C,1) frozen logit
    uncertainty: jnp.ndarray  # (C,1) frozen logit


class MLPParams(NamedTuple):
    opacity: Any              # feat+3+1 → F → k, tanh
    uncertainty: Any          # feat+3+1 → F → k, sigmoid
    cov: Any                  # feat+3+1 → F → 7k
    color: Any                # feat+3+1 → F → 3k, sigmoid
    crossattn: Any            # bidirectional cross attention params
    feat_bank: Any = None     # 3+1 → F → 3 softmax (use_feat_bank only,
                              # gaussian_model.py:109-115)


class ScaffoldState(NamedTuple):
    params: AnchorParams
    mlps: MLPParams
    alive: jnp.ndarray        # (C,) bool
    xyz_max: jnp.ndarray      # (3,) from init cloud (gaussian_model.py:324-326)


def voxelize(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """Unique voxel centers: round(p/v)·v (gaussian_model.py:295-299)."""
    coords = np.unique(np.round(points / voxel_size), axis=0)
    return (coords * voxel_size).astype(np.float32)


def init_scaffold(key, points: np.ndarray, cfg: ScaffoldConfig,
                  voxel_size: float | None = None) -> ScaffoldState:
    """create_from_pcd (gaussian_model.py:301-345), functional.

    ``points`` is the (host-side numpy) initial cloud; anchors are unique
    voxel centers, scales initialised from the mean-3NN distance, offsets
    and features zero, opacity/uncertainty logits at σ⁻¹(0.1).
    """
    v = cfg.voxel_size if voxel_size is None else voxel_size
    anchors = voxelize(np.asarray(points, np.float32), v)
    n = anchors.shape[0]
    if n > cfg.capacity:
        raise ValueError(f"{n} anchors exceed capacity {cfg.capacity}")
    C, k, F = cfg.capacity, cfg.n_offsets, cfg.feat_dim

    # host-side init: prefer the native grid KNN, fall back to JAX
    dist2 = None
    try:
        from .. import native
        dist2 = native.knn_mean3_sq(anchors)
    except Exception:
        dist2 = None
    if dist2 is None:
        from ..ops.knn import mean_knn_sq_dist
        dist2 = np.asarray(mean_knn_sq_dist(jnp.asarray(anchors)))
    dist2 = np.maximum(dist2, 1e-7)
    log_scale = np.log(np.sqrt(dist2))[:, None].repeat(6, axis=1)

    def pad(x, fill=0.0):
        out = np.full((C,) + x.shape[1:], fill, np.float32)
        out[:n] = x
        return jnp.asarray(out)

    params = AnchorParams(
        anchor=pad(anchors),
        offset=jnp.zeros((C, k, 3), jnp.float32),
        feat=jnp.zeros((C, F), jnp.float32),
        scaling=pad(log_scale, fill=np.log(1e-3)),
        rotation=jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (C, 1)),
        opacity=jnp.full((C, 1), float(inverse_sigmoid(0.1)), jnp.float32),
        uncertainty=jnp.full((C, 1), float(inverse_sigmoid(0.1)),
                             jnp.float32),
    )
    mlps = init_mlps(key, cfg)
    alive = jnp.arange(C) < n
    xyz_max = jnp.asarray(anchors.max(axis=0))
    return ScaffoldState(params=params, mlps=mlps, alive=alive,
                         xyz_max=xyz_max)


def init_mlps(key, cfg: ScaffoldConfig) -> MLPParams:
    from ..ops.attention import init_bidirectional_attn

    F, k = cfg.feat_dim, cfg.n_offsets
    keys = jax.random.split(key, 5)
    d_in = F + 3 + 1
    return MLPParams(
        opacity=init_mlp(keys[0], (d_in, F, k)),
        uncertainty=init_mlp(keys[1], (d_in, F, k)),
        cov=init_mlp(keys[2], (d_in, F, 7 * k)),
        color=init_mlp(keys[3], (d_in, F, 3 * k)),
        crossattn=init_bidirectional_attn(
            keys[4], dim=F, heads=cfg.attn_heads,
            dim_head=cfg.attn_head_dim, context_dim=F),
        feat_bank=(init_mlp(jax.random.fold_in(key, 5), (3 + 1, F, 3))
                   if cfg.use_feat_bank else None),
    )


class Decoded(NamedTuple):
    """Neural gaussians, one block of k per anchor, flattened to (C·k, ·).

    ``active`` combines alive ∧ visible ∧ (neural opacity > 0) — the
    reference's boolean gather (gaussian_renderer/__init__.py:58-63)
    expressed as a mask.
    """
    xyz: jnp.ndarray          # (C·k,3)
    color: jnp.ndarray        # (C·k,3)
    opacity: jnp.ndarray      # (C·k,)
    uncertainty: jnp.ndarray  # (C·k,)
    scale: jnp.ndarray        # (C·k,3)
    rot: jnp.ndarray          # (C·k,4)
    neural_opacity: jnp.ndarray  # (C,k) raw tanh output (densification stats)
    active: jnp.ndarray       # (C·k,) bool
    anchor_visible: jnp.ndarray  # (C,) bool — alive ∧ visible


def decode(state: ScaffoldState, cam_center: jnp.ndarray,
           visible_mask: jnp.ndarray | None, cfg: ScaffoldConfig) -> Decoded:
    """generate_neural_gaussians (gaussian_renderer/__init__.py:18-102).

    Per visible anchor: view direction and distance condition four MLPs;
    each anchor spawns k gaussians at ``anchor + offset·scaling[:,:3]`` with
    scale ``scaling[:,3:]·σ(cov[:3])``, rotation ``normalize(cov[3:7])``.
    """
    p = state.params
    C, k = cfg.capacity, cfg.n_offsets
    alive = state.alive if visible_mask is None else (
        state.alive & visible_mask)

    ob_view = p.anchor - cam_center[None, :]
    # dead/coincident anchors would hit ‖0‖ whose gradient is NaN (and
    # NaN·0 poisons the whole backward) — substitute a unit view there
    degenerate = jnp.sum(ob_view * ob_view, axis=1, keepdims=True) < 1e-18
    safe_view = jnp.where(degenerate, jnp.array([0.0, 0.0, 1.0]), ob_view)
    ob_dist = jnp.linalg.norm(safe_view, axis=1, keepdims=True)
    ob_dir = safe_view / ob_dist
    feat = p.feat
    if cfg.use_feat_bank:
        # view-adaptive multi-resolution feature mix
        # (gaussian_renderer/__init__.py:39-50): softmax weights blend the
        # feature with its stride-2 and stride-4 subsamples tiled back up
        # (torch ``repeat`` tiles, so tiling — not interleaving — here)
        cat_view = jnp.concatenate([ob_dir, ob_dist], axis=1)     # (C,4)
        bw = apply_mlp(state.mlps.feat_bank, cat_view,
                       lambda z: jax.nn.softmax(z, axis=1))       # (C,3)
        feat = (jnp.tile(feat[:, ::4], (1, 4)) * bw[:, 0:1]
                + jnp.tile(feat[:, ::2], (1, 2)) * bw[:, 1:2]
                + feat * bw[:, 2:3])
    x = jnp.concatenate([feat, ob_dir, ob_dist], axis=1)    # (C,F+4)

    neural_op = apply_mlp(state.mlps.opacity, x, jnp.tanh)      # (C,k)
    unc = apply_mlp(state.mlps.uncertainty, x, jax.nn.sigmoid)  # (C,k)
    color = apply_mlp(state.mlps.color, x, jax.nn.sigmoid)      # (C,3k)
    scale_rot = apply_mlp(state.mlps.cov, x)                    # (C,7k)

    color = color.reshape(C * k, 3)
    scale_rot = scale_rot.reshape(C * k, 7)
    grid_scale = jnp.exp(p.scaling)                             # (C,6)
    offset_extent = grid_scale[:, :3]
    scale_base = grid_scale[:, 3:]

    scale = (jnp.repeat(scale_base, k, axis=0)
             * jax.nn.sigmoid(scale_rot[:, :3]))                # (C·k,3)
    rotq = scale_rot[:, 3:7]
    rot = rotq / jnp.maximum(
        jnp.linalg.norm(rotq, axis=1, keepdims=True), 1e-12)

    xyz = (jnp.repeat(p.anchor, k, axis=0)
           + p.offset.reshape(C * k, 3)
           * jnp.repeat(offset_extent, k, axis=0))

    op_flat = neural_op.reshape(C * k)
    active = (jnp.repeat(alive, k) & (op_flat > 0.0))
    opacity = jnp.where(active, op_flat, 0.0)

    return Decoded(xyz=xyz, color=color, opacity=opacity,
                   uncertainty=unc.reshape(C * k), scale=scale, rot=rot,
                   neural_opacity=neural_op, active=active,
                   anchor_visible=alive)


def n_alive(state: ScaffoldState) -> jnp.ndarray:
    return jnp.sum(state.alive.astype(jnp.int32))
