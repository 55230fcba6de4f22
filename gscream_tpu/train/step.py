"""Jitted training step: decode → rasterize → losses → Adam.

Functional equivalent of one iteration of the reference training loop
(``train.py:390-616``):

1. prefilter anchors (position2D_filter) for visibility + fg/bg labeling;
2. [phase 2] bidirectional cross-attention between sampled foreground
   (mask-region) and background anchors with an EMA write into the anchor
   features (run_crossattn, gaussian_model.py:553-583; sampling
   train.py:436-513);
3. decode neural gaussians, rasterize color+depth+uncertainty;
4. masked RGB + scale/shift depth losses (train.py:535-573);
5. one Adam step with per-group LR schedules; densification statistics.

Two compiled variants exist — ``use_crossattn`` is a static flag that flips
at ``start_crossattn_from`` (15 000), like the reference's phase switch.
The screen-space gradient needed for densification is obtained by adding a
zero tensor to the projected means and reading its cotangent (the
reference's ``screenspace_points`` retain_grad trick,
gaussian_renderer/__init__.py:124-128).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..cameras import Camera
from ..config import OptimConfig
from ..model.densify import accumulate_stats
from ..model.scaffold import Decoded, MLPParams, ScaffoldConfig, \
    ScaffoldState, decode
from ..ops import losses as L
from ..ops.attention import bidirectional_attn
from ..ops.binning import bin_instances, overflow_demand
from ..ops.projection import preprocess
from ..ops.rasterize_tiled import TILE_H, TILE_W, rasterize_tiled
from ..ops.ssim import ssim, ssim_masked
from .state import TrainState, apply_adam, broadcast_group, lr_tree


class StepAux(NamedTuple):
    loss: jnp.ndarray
    l1: jnp.ndarray
    num_instances: jnp.ndarray
    n_active: jnp.ndarray
    cross_ok: jnp.ndarray
    # (5,) f32 [loss, l1, num_instances, n_active, cross_ok] — the
    # host-facing copy of the scalars above, packed ON DEVICE so the
    # training loop fetches ONE array per step instead of issuing one
    # device→host round trip per scalar (each fetch is a full RPC behind
    # the TPU relay; counts are exact in f32 below 2²⁴)
    packed: jnp.ndarray = None


def pack_aux(loss, l1, num_instances, n_active, cross_ok) -> StepAux:
    f = jnp.float32
    packed = jnp.stack([
        loss.astype(f), l1.astype(f), num_instances.astype(f),
        n_active.astype(f), cross_ok.astype(f)])
    return StepAux(loss=loss, l1=l1, num_instances=num_instances,
                   n_active=n_active, cross_ok=cross_ok, packed=packed)


def render_from_params(params, mlps, scaffold: ScaffoldState, camera: Camera,
                       bg, screen_zero, cfg: ScaffoldConfig,
                       capacity: int, interpret: bool,
                       precise_sort: bool = True):
    """Decode + rasterize from explicit (differentiable) param trees."""
    st = scaffold._replace(params=params, mlps=mlps)
    dec = decode(st, camera.cam_center, None, cfg)
    splats = preprocess(
        dec.xyz, dec.scale, dec.rot, camera.w2c, camera.full_proj,
        camera.width, camera.height, camera.tan_fovx, camera.tan_fovy,
        tile_w=TILE_W, tile_h=TILE_H, active_mask=dec.active,
        opacity=dec.opacity)
    mean2d = splats.mean2d + screen_zero
    from ..ops.rasterize_tiled import build_binning
    binning = build_binning(
        splats, dec.opacity, dec.color, dec.uncertainty, capacity,
        camera.width, camera.height, precise=precise_sort,
        interpret=interpret)
    out = rasterize_tiled(mean2d, splats.conic, dec.opacity, dec.color,
                          splats.depth, dec.uncertainty, binning, bg,
                          camera.width, camera.height, interpret)
    return out, dec, splats, binning


def crossattn_update(mlps: MLPParams, feat, fg_idx, bg_idx, fg_valid,
                     bg_valid, ema: float, is_ref, cross_ok):
    """run_crossattn (gaussian_model.py:553-583), functional.

    The anchor features are detached (stop_gradient) before attention, the
    attention outputs are EMA-mixed back at the sampled indices — the
    foreground side only on the reference view — and the result carries
    gradients to the cross-attention parameters only.  ``is_ref`` may be a
    Python bool or a traced scalar (per-view flag in a sharded batch);
    the fg write is gated by index-dropping, which is a no-op — in values
    and in gradients — when the gate is False.
    """
    base = jax.lax.stop_gradient(feat)
    fg_tok = base[fg_idx]
    bg_tok = base[bg_idx]
    fg_out, bg_out = bidirectional_attn(mlps.crossattn, fg_tok, bg_tok,
                                        mask=fg_valid,
                                        context_mask=bg_valid)
    new_feat = base
    C = feat.shape[0]
    # fg updated only under the reference view (gm.py:576-579)
    fg_mix = ema * fg_out + (1 - ema) * fg_tok
    fg_dst = jnp.where(fg_valid & cross_ok & is_ref, fg_idx, C)
    new_feat = new_feat.at[fg_dst].set(fg_mix, mode='drop')
    bg_mix = ema * bg_out + (1 - ema) * bg_tok
    bg_dst = jnp.where(bg_valid & cross_ok, bg_idx, C)
    new_feat = new_feat.at[bg_dst].set(bg_mix, mode='drop')
    return new_feat


def sample_cross_tokens(key, pos_x, pos_y, visible, alive, gt_mask,
                        box, width: int, height: int, max_tokens: int):
    """fg/bg anchor token sampling (train.py:436-513).

    box = (min_y, max_y, min_x, max_x) of the sampled patch.  Anchors
    projecting inside the patch are split by the object mask into fg/bg;
    ``min(fg, bg, cap)`` of each are drawn uniformly.  Returns
    (fg_idx, bg_idx, fg_valid, bg_valid, ok).
    """
    xi = pos_x.astype(jnp.int32)
    yi = pos_y.astype(jnp.int32)
    valid2d = ((pos_x > 0) & (pos_x < width) & (pos_y > 0)
               & (pos_y < height) & visible & alive)
    xi = jnp.clip(xi, 0, width - 1)
    yi = jnp.clip(yi, 0, height - 1)
    min_y, max_y, min_x, max_x = box
    in_box = ((yi >= min_y) & (yi < max_y) & (xi >= min_x) & (xi < max_x)
              & valid2d)
    fgbg = gt_mask[yi, xi] > 0.5
    fg_cand = in_box & fgbg
    bg_cand = in_box & ~fgbg
    n_fg = jnp.sum(fg_cand.astype(jnp.int32))
    n_bg = jnp.sum(bg_cand.astype(jnp.int32))
    min_num = jnp.minimum(jnp.minimum(n_fg, n_bg), max_tokens)
    ok = (n_fg > 11) & (n_bg > 11)   # the reference exits below 12 anchors

    kf, kb = jax.random.split(key)

    def draw(k, cand):
        pri = jnp.where(cand, jax.random.uniform(k, cand.shape), -jnp.inf)
        _, idx = jax.lax.top_k(pri, max_tokens)
        rank = jnp.arange(max_tokens)
        return idx.astype(jnp.int32), rank < min_num

    fg_idx, fg_valid = draw(kf, fg_cand)
    bg_idx, bg_valid = draw(kb, bg_cand)
    return fg_idx, bg_idx, fg_valid, bg_valid, ok


def loss_terms(out, gt_image, gt_mask, midas_depth, fg_box_mask,
               opt: OptimConfig, is_ref: bool):
    """RGB + depth losses (train.py:535-573).  Images are (C,H,W).

    ``opt.loss_dtype == "bfloat16"`` runs the RGB L1/SSIM maps in bf16
    (halves the loss head's HBM traffic; reductions stay f32 — see
    OptimConfig).  The depth terms keep fp32: their closed-form
    scale/shift fit solves normal equations that cancel catastrophically
    in bf16.
    """
    img = out.color.transpose(2, 0, 1)
    if opt.loss_dtype == "bfloat16":
        img = img.astype(jnp.bfloat16)
        gt_image = gt_image.astype(jnp.bfloat16)
    if is_ref:
        l1 = L.l1_loss(img, gt_image)
        loss = opt.refer_rgb_lr * ((1 - opt.lambda_dssim) * l1
                                   + opt.lambda_dssim
                                   * (1 - ssim(img, gt_image)))
        if opt.refer_rgb_lr_fg > opt.refer_rgb_lr:
            loss = loss + (opt.refer_rgb_lr_fg - opt.refer_rgb_lr) * (
                (1 - opt.lambda_dssim)
                * L.l1_loss_masked(img, gt_image, gt_mask)
                + opt.lambda_dssim
                * (1 - ssim_masked(img, gt_image, gt_mask)))
        if opt.refer_depth_lr > 0:
            loss = loss + L.depth_loss_ref(
                out.depth, midas_depth[0], gt_mask[0], fg_box_mask,
                opt.refer_depth_lr, opt.refer_depth_lr_fg,
                opt.refer_depth_lr_smooth)
    else:
        w = (1.0 - gt_mask) + opt.other_rgb_lr_fg * gt_mask
        l1 = L.l1_loss_masked(img, gt_image, w)
        loss = opt.other_rgb_lr * ((1 - opt.lambda_dssim) * l1
                                   + opt.lambda_dssim
                                   * (1 - ssim_masked(img, gt_image, w)))
        if opt.other_depth_lr > 0:
            loss = loss + L.depth_loss_other(
                out.depth, midas_depth[0], gt_mask[0],
                opt.other_depth_lr, opt.other_depth_lr_smooth)
    return loss, l1


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "opt", "is_ref", "use_crossattn", "capacity",
                     "interpret", "width", "height", "accumulate",
                     "white_bg", "spatial_lr_scale", "precise_sort",
                     "feat_frozen"))
def train_step(ts: TrainState, camera: Camera, gt_image, gt_mask,
               midas_depth, fg_box_mask, cross_box,
               *, cfg: ScaffoldConfig, opt: OptimConfig, is_ref: bool,
               use_crossattn: bool, capacity: int, interpret: bool,
               width: int, height: int, accumulate: bool,
               white_bg: bool = False, spatial_lr_scale: float = 1.0,
               precise_sort: bool = True, feat_frozen: bool = False):
    """One optimization iteration.  Returns (new_state, StepAux).

    gt_image (3,H,W) · gt_mask (1,H,W) · midas_depth (1,H,W) ·
    fg_box_mask (H,W) random box for the ref-view fg depth term ·
    cross_box (4,) int32 patch for cross-attn sampling (phase 2).
    """
    key, k_cross = jax.random.split(ts.key)
    # view j of a sharded batch samples with fold_in(k_cross, j); the
    # single-device step is "view 0 of a B=1 batch" so the trajectories
    # coincide (tests/test_sharded.py::test_trajectory_matches_single)
    k_cross = jax.random.fold_in(k_cross, 0)
    bg = (jnp.ones(3, jnp.float32) if white_bg
          else jnp.zeros(3, jnp.float32))
    scaffold = ts.scaffold
    C, k = cfg.capacity, cfg.n_offsets
    step1 = ts.step + 1

    # --- prefilter: anchor visibility + projected positions -------------
    p = scaffold.params
    anchor_scales = jnp.exp(p.scaling[:, :3])
    from ..ops.projection import preprocess as _pre
    pre = _pre(p.anchor, anchor_scales,
               p.rotation / jnp.maximum(
                   jnp.linalg.norm(p.rotation, axis=1, keepdims=True),
                   1e-12),
               camera.w2c, camera.full_proj, width, height,
               camera.tan_fovx, camera.tan_fovy,
               tile_w=TILE_W, tile_h=TILE_H, active_mask=scaffold.alive)
    anchor_visible = (pre.radius > 0) & scaffold.alive

    cross_ok = jnp.bool_(False)
    cross_params = scaffold.mlps
    feat_for_render = p.feat
    if use_crossattn:
        fg_idx, bg_idx, fg_valid, bg_valid, cross_ok = sample_cross_tokens(
            k_cross, pre.mean2d[:, 0], pre.mean2d[:, 1],
            pre.radius > 0, scaffold.alive, gt_mask[0], cross_box,
            width, height, min(opt.crossattn_max_tokens, C))

    def loss_fn(anchor_params, mlps, screen_zero):
        feat = anchor_params.feat
        if use_crossattn:
            feat = crossattn_update(
                mlps, feat, fg_idx, bg_idx, fg_valid, bg_valid,
                opt.crossattn_feat_update_ema, is_ref, cross_ok)
        ap = anchor_params._replace(feat=feat)
        out, dec, splats, binning = render_from_params(
            ap, mlps, scaffold, camera, bg, screen_zero, cfg,
            capacity, interpret, precise_sort)
        loss, l1 = loss_terms(out, gt_image, gt_mask, midas_depth,
                              fg_box_mask, opt, is_ref)
        aux = (out, dec, splats, binning, l1, feat)
        return loss, aux

    screen_zero = jnp.zeros((C * k, 2), jnp.float32)
    (loss, (out, dec, splats, binning, l1, feat_used)), grads = (
        jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)(
            scaffold.params, scaffold.mlps, screen_zero))
    g_anchor, g_mlps, g_screen = grads

    # --- densification stats (training_statis, train.py:599) ------------
    stats = ts.stats
    if accumulate:
        # screen grads in the reference's NDC units (backward.cu:592-593)
        ndc = g_screen * jnp.array([0.5 * width, 0.5 * height])
        grad_norm = jnp.linalg.norm(ndc, axis=1).reshape(C, k)
        gauss_valid = (dec.active & (splats.radius > 0)).reshape(C, k)
        stats = accumulate_stats(stats, dec.neural_opacity, grad_norm,
                                 gauss_valid, anchor_visible)

    # --- main optimizer (cross-attn excluded — it has its own Adam) -----
    anchor_lrs, mlp_lrs = lr_tree(step1, opt, spatial_lr_scale)
    lr_full = (broadcast_group(anchor_lrs, scaffold.params),
               broadcast_group(mlp_lrs, scaffold.mlps))

    from ..model.scaffold import AnchorParams
    # Phase-2 iteration gating: when token sampling degenerates
    # (cross_ok=False) the reference skips the ENTIRE iteration
    # (train.py:519-523 ``except: continue``) — so every parameter (and
    # its Adam moments) is masked on cross_ok, not only anchor_feat.
    # ``feat_frozen`` reproduces the reference's permanent detach: the
    # first run_crossattn call replaces ``_anchor_feat`` with a detached
    # tensor (gaussian_model.py:556), after which the main Adam never
    # updates feat again — on ANY view, cross-attended or not.
    if use_crossattn:
        anchor_mask = AnchorParams(
            anchor=cross_ok, offset=cross_ok, feat=False,
            scaling=cross_ok, rotation=False, opacity=False,
            uncertainty=False)
        mlp_mask = MLPParams(opacity=cross_ok, uncertainty=cross_ok,
                             cov=cross_ok, color=cross_ok, crossattn=False,
                             feat_bank=cross_ok)
    else:
        anchor_mask = AnchorParams(
            anchor=True, offset=True, feat=not feat_frozen,
            scaling=True, rotation=False, opacity=False, uncertainty=False)
        mlp_mask = MLPParams(opacity=True, uncertainty=True, cov=True,
                             color=True, crossattn=False, feat_bank=True)
    mask_full = (broadcast_group(anchor_mask, scaffold.params),
                 broadcast_group(mlp_mask, scaffold.mlps))

    params_tree = (scaffold.params._replace(
        feat=jax.lax.stop_gradient(feat_used)), scaffold.mlps)
    (new_anchor, new_mlps), new_m, new_v = apply_adam(
        params_tree, (g_anchor, g_mlps), ts.m, ts.v, lr_full, step1,
        mask_full)

    # --- cross-attention optimizer (optimizer_c, train.py:614-616):
    # separate Adam with its own step count, applied only when it ran
    step_c1 = ts.step_c + (cross_ok.astype(jnp.int32)
                           if use_crossattn else 0)
    if use_crossattn:
        ca = new_mlps.crossattn
        ca_lr = jax.tree.map(lambda _: mlp_lrs.crossattn, ca)
        ca_mask = jax.tree.map(lambda _: cross_ok, ca)
        ca_new, ca_m, ca_v = apply_adam(
            ca, g_mlps.crossattn, ts.m[1].crossattn, ts.v[1].crossattn,
            ca_lr, jnp.maximum(step_c1, 1), ca_mask)
        new_mlps = new_mlps._replace(crossattn=ca_new)
        new_m = (new_m[0], new_m[1]._replace(crossattn=ca_m))
        new_v = (new_v[0], new_v[1]._replace(crossattn=ca_v))

    new_scaffold = scaffold._replace(params=new_anchor, mlps=new_mlps)
    new_ts = ts._replace(scaffold=new_scaffold, m=new_m, v=new_v,
                         step=step1, step_c=step_c1,
                         stats=stats, key=key)
    # overflow_demand folds the instance count and the row-tight row-table
    # demand (capacity//2) into one capacity-comparable number, so the
    # loop's single tier check/retry covers both static tables
    aux = pack_aux(loss, l1, overflow_demand(binning),
                   jnp.sum(dec.active.astype(jnp.int32)), cross_ok)
    return new_ts, aux
