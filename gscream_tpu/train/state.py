"""Train state: Adam with per-group exponential LR schedules.

Reproduces the reference optimizer setup (``training_setup``
gaussian_model.py:348-458): one Adam (ε=1e-15) over anchors/offsets/feats/
frozen params/MLPs with per-group learning rates, a second Adam for the
cross-attention module stepped only on iterations where it ran
(train.py:611-616), and ``get_expon_lr_func`` schedules
(utils/general_utils.py:104-137).

Hand-rolled Adam (rather than optax) so densification can surgically mask
moments (model/densify.py) and so per-leaf LR trees stay transparent.
Matches torch.optim.Adam: β=(0.9,0.999), bias-corrected, ε added *after*
the square root.
"""
from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..config import OptimConfig
from ..model.densify import DensifyStats, init_stats
from ..model.scaffold import AnchorParams, MLPParams, ScaffoldConfig, \
    ScaffoldState

BETA1, BETA2 = 0.9, 0.999
EPS = 1e-15   # gaussian_model.py:409


def expon_lr(step, lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
             max_steps=1_000_000):
    """utils/general_utils.py:104-137 (log-linear interpolation + optional
    sine delay ramp; zero when both endpoints are zero)."""
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(jnp.asarray(step, jnp.float32))
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
    else:
        delay = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(math.log(max(lr_init, 1e-30)) * (1 - t)
                       + math.log(max(lr_final, 1e-30)) * t)
    return delay * log_lerp


def lr_tree(step, opt: OptimConfig, spatial_lr_scale: float):
    """Per-leaf learning rates matching update_learning_rate
    (gaussian_model.py:460-499).  Returns (AnchorParams lrs, MLPParams lrs)
    with scalar leaves (crossattn handled separately)."""
    sls = spatial_lr_scale
    anchor_lr = expon_lr(step, opt.position_lr_init * sls,
                         opt.position_lr_final * sls,
                         lr_delay_mult=opt.position_lr_delay_mult,
                         max_steps=opt.position_lr_max_steps)
    offset_lr = expon_lr(step, opt.offset_lr_init * sls,
                         opt.offset_lr_final * sls,
                         lr_delay_mult=opt.offset_lr_delay_mult,
                         max_steps=opt.offset_lr_max_steps)
    mlp_lrs = MLPParams(
        opacity=expon_lr(step, opt.mlp_opacity_lr_init,
                         opt.mlp_opacity_lr_final,
                         lr_delay_mult=opt.mlp_opacity_lr_delay_mult,
                         max_steps=opt.mlp_opacity_lr_max_steps),
        uncertainty=expon_lr(step, opt.mlp_uncertainty_lr_init,
                             opt.mlp_uncertainty_lr_final,
                             lr_delay_mult=opt.mlp_uncertainty_lr_delay_mult,
                             max_steps=opt.mlp_uncertainty_lr_max_steps),
        cov=expon_lr(step, opt.mlp_cov_lr_init, opt.mlp_cov_lr_final,
                     lr_delay_mult=opt.mlp_cov_lr_delay_mult,
                     max_steps=opt.mlp_cov_lr_max_steps),
        color=expon_lr(step, opt.mlp_color_lr_init, opt.mlp_color_lr_final,
                       lr_delay_mult=opt.mlp_color_lr_delay_mult,
                       max_steps=opt.mlp_color_lr_max_steps),
        crossattn=expon_lr(step, opt.crossattn_lr_init,
                           opt.crossattn_lr_final,
                           lr_delay_mult=opt.crossattn_lr_delay_mult,
                           max_steps=opt.crossattn_lr_max_steps),
        feat_bank=expon_lr(step, opt.mlp_featurebank_lr_init,
                           opt.mlp_featurebank_lr_final,
                           lr_delay_mult=opt.mlp_featurebank_lr_delay_mult,
                           max_steps=opt.mlp_featurebank_lr_max_steps),
    )
    anchor_lrs = AnchorParams(
        anchor=anchor_lr,
        offset=offset_lr,
        feat=jnp.float32(opt.feature_lr),
        scaling=jnp.float32(opt.scaling_lr),
        rotation=jnp.float32(0.0),       # frozen (gaussian_model.py:342)
        opacity=jnp.float32(0.0),        # frozen
        uncertainty=jnp.float32(0.0),    # frozen
    )
    return anchor_lrs, mlp_lrs


class TrainState(NamedTuple):
    scaffold: ScaffoldState
    m: Any                 # Adam first moments, same tree as (params, mlps)
    v: Any                 # Adam second moments
    step: jnp.ndarray      # () int32 — main optimizer step count
    step_c: jnp.ndarray    # () int32 — cross-attn optimizer step count
    stats: DensifyStats
    key: jnp.ndarray       # PRNG key


def init_train_state(scaffold: ScaffoldState, cfg: ScaffoldConfig,
                     key) -> TrainState:
    tree = (scaffold.params, scaffold.mlps)
    zeros = jax.tree.map(jnp.zeros_like, tree)
    return TrainState(scaffold=scaffold, m=zeros,
                      v=jax.tree.map(jnp.zeros_like, tree),
                      step=jnp.int32(0), step_c=jnp.int32(0),
                      stats=init_stats(cfg), key=key)


def adam_update(param, grad, m, v, lr, step):
    """One torch-style Adam step (bias-corrected, eps after sqrt)."""
    m = BETA1 * m + (1 - BETA1) * grad
    v = BETA2 * v + (1 - BETA2) * grad * grad
    t = step.astype(jnp.float32)
    mhat = m / (1 - BETA1 ** t)
    vhat = v / (1 - BETA2 ** t)
    new_param = param - lr * mhat / (jnp.sqrt(vhat) + EPS)
    return new_param, m, v


def broadcast_group(value_per_group, tree_like):
    """Expand one value per group into a tree matching ``tree_like``.

    ``value_per_group`` is a NamedTuple (AnchorParams/MLPParams) holding one
    scalar/flag per *group*; each group's value is broadcast over the whole
    parameter subtree of that group (e.g. one lr for all of mlp_color's
    weights) — the reference's per-param-group optimizer semantics.
    """
    assert type(tree_like)._fields == type(value_per_group)._fields
    return type(tree_like)(*[
        jax.tree.map(lambda _: v, sub)
        for v, sub in zip(value_per_group, tree_like)])


def apply_adam(params_tree, grads_tree, m_tree, v_tree, lr_full, step,
               mask_full=None):
    """Tree-mapped Adam; leaves where the mask is False keep the parameter
    *and* its moments unchanged (torch's grad-is-None behavior — used to
    skip the anchor_feat group while cross-attention owns it, and the
    crossattn group on non-crossattn steps).  ``lr_full``/``mask_full``
    must already match the parameter tree structure (see broadcast_group).
    """
    def one(param, grad, m, v, lr, mask):
        if mask is False:
            return param, m, v
        new_p, new_m, new_v = adam_update(param, grad, m, v, lr, step)
        if mask is True:
            return new_p, new_m, new_v
        # traced boolean mask (e.g. "did cross-attention run this step")
        return (jnp.where(mask, new_p, param),
                jnp.where(mask, new_m, m),
                jnp.where(mask, new_v, v))

    if mask_full is None:
        mask_full = jax.tree.map(lambda _: True, params_tree)
    flat_p, treedef = jax.tree.flatten(params_tree)
    flat = [one(p, g, m, v, lr, mk) for p, g, m, v, lr, mk in zip(
        flat_p, jax.tree.leaves(grads_tree), jax.tree.leaves(m_tree),
        jax.tree.leaves(v_tree), jax.tree.leaves(lr_full),
        jax.tree.leaves(mask_full))]
    new_p = jax.tree.unflatten(treedef, [f[0] for f in flat])
    new_m = jax.tree.unflatten(treedef, [f[1] for f in flat])
    new_v = jax.tree.unflatten(treedef, [f[2] for f in flat])
    return new_p, new_m, new_v
