"""Training losses: masked RGB, scale/shift-aligned depth, smoothness.

Functional ports of the reference loss library and the in-``train.py``
helpers the run config actually uses:

* ``l1_loss`` / ``l1_loss_masked`` — utils/loss_utils.py:27-31 (the masked
  variant normalizes by *all* elements, not the mask sum);
* ``compute_scale_and_shift`` — train.py:198-221 (MiDaS closed-form least
  squares for per-image scale/shift);
* ``gradient_loss`` — train.py:232-249 with *image-based* reduction
  (``reduction_image_based``, train.py:224-230): per-image sum of masked
  forward-difference magnitudes divided by the mask sum;
* ``depth_loss_ref`` / ``depth_loss_other`` — the composite depth terms of
  train.py:535-573 including the |scale| guard and the 4-level multiscale
  smoothness pyramid.

Images are (C,H,W); depths and masks (H,W) or (1,H,W).
"""
from __future__ import annotations

import jax.numpy as jnp


def _acc_dtype(x):
    # accumulate in AT LEAST f32: bf16 inputs reduce in f32 (the
    # selective-bf16 loss path's contract), f64 stays f64 (property
    # tests / oracles)
    return jnp.promote_types(x.dtype, jnp.float32)


def l1_loss(pred, gt):
    return jnp.mean(jnp.abs(pred - gt), dtype=_acc_dtype(pred))


def l1_loss_masked(pred, gt, mask):
    return jnp.mean(jnp.abs(pred - gt) * mask.astype(pred.dtype),
                    dtype=_acc_dtype(pred))


def l2_loss(pred, gt):
    return jnp.mean((pred - gt) ** 2)


def psnr(pred, gt, mask=None):
    """utils/image_utils.py:22-33 (20·log10(1/√mse))."""
    if mask is None:
        mse = jnp.mean((pred - gt) ** 2)
    else:
        mask = jnp.broadcast_to(mask, pred.shape)
        mse = jnp.sum(((pred - gt) * mask) ** 2) / jnp.maximum(
            jnp.sum(mask), 1.0)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))


def compute_scale_and_shift(prediction, target, mask):
    """Closed-form (s, t) minimising ‖mask·(s·pred + t − target)‖².

    prediction/target/mask: (H,W).  Returns scalars (s, t); a singular
    system yields (0, 0) as in the reference.
    """
    a00 = jnp.sum(mask * prediction * prediction)
    a01 = jnp.sum(mask * prediction)
    a11 = jnp.sum(mask)
    b0 = jnp.sum(mask * prediction * target)
    b1 = jnp.sum(mask * target)
    det = a00 * a11 - a01 * a01
    ok = det != 0.0
    safe = jnp.where(ok, det, 1.0)
    s = jnp.where(ok, (a11 * b0 - a01 * b1) / safe, 0.0)
    t = jnp.where(ok, (-a01 * b0 + a00 * b1) / safe, 0.0)
    return s, t


def gradient_loss(prediction, target, mask):
    """Masked multidirectional forward-difference loss, image-based
    reduction (train.py:224-249)."""
    diff = (prediction - target) * mask
    gx = jnp.abs(diff[:, 1:] - diff[:, :-1]) * (mask[:, 1:] * mask[:, :-1])
    gy = jnp.abs(diff[1:, :] - diff[:-1, :]) * (mask[1:, :] * mask[:-1, :])
    m = jnp.sum(mask)
    total = jnp.sum(gx) + jnp.sum(gy)
    return jnp.where(m > 0, total / jnp.maximum(m, 1.0), 0.0)


def multiscale_gradient_loss(aligned_depth, target_depth, mask,
                             levels: int = 4):
    """Σ_{s=0..3} gradient_loss at stride 2^s (train.py:553-556, 571-573)."""
    loss = 0.0
    for s in range(levels):
        step = 2 ** s
        loss = loss + gradient_loss(aligned_depth[::step, ::step],
                                    target_depth[::step, ::step],
                                    mask[::step, ::step])
    return loss


def align_depth(depth, midas_depth, valid_mask):
    """|s|·depth + t with (s,t) fit on the valid region (train.py:546-551,
    including the abs() guard against negative scale)."""
    s, t = compute_scale_and_shift(depth, midas_depth, valid_mask)
    s = jnp.abs(s)
    return s * depth + t


def depth_loss_ref(depth, midas_depth, gt_mask, fg_mask, w_depth: float,
                   w_depth_fg: float, w_smooth: float):
    """Reference-view depth term (train.py:544-556).

    gt_mask: object mask (1 = removed region); the scale/shift is fit on
    the background, the L1 covers the full image, an extra term covers a
    random box around the mask, smoothness is unmasked and multiscale.
    """
    valid = 1.0 - gt_mask
    aligned = align_depth(depth, midas_depth, valid)
    loss = w_depth * l1_loss(aligned, midas_depth)
    if w_depth_fg > w_depth:
        loss = loss + (w_depth_fg - w_depth) * l1_loss_masked(
            aligned, midas_depth, fg_mask)
    loss = loss + 0.5 * w_smooth * multiscale_gradient_loss(
        aligned, midas_depth, jnp.ones_like(gt_mask))
    return loss


def depth_loss_other(depth, midas_depth, gt_mask, w_depth: float,
                     w_smooth: float):
    """Non-reference-view depth term (train.py:560-573): masked to the
    background both for the L1 and the smoothness pyramid."""
    valid = 1.0 - gt_mask
    aligned = align_depth(depth, midas_depth, valid)
    loss = w_depth * l1_loss_masked(aligned, midas_depth, valid)
    loss = loss + 0.5 * w_smooth * multiscale_gradient_loss(
        aligned, midas_depth, valid)
    return loss


def inverse_depth_smoothness(idepth, image, mask=None):
    """Image-aware inverse-depth smoothness (kornia semantics).

    ``loss = |∂x d|·exp(-mean_c|∂x I|) + |∂y d|·exp(-mean_c|∂y I|)``,
    each term mean-reduced over its (H, W-1) / (H-1, W) grid.  Mirrors
    the reference's ``inverse_depth_smoothness_loss`` and its masked
    ``_spatial`` variant (/root/reference/utils/loss_utils.py:224-346;
    forward differences d[..., :-1] - d[..., 1:], loss_utils.py:211-221).
    Unused in the reference's run configuration (PARITY.md) but part of
    its loss library surface.

    idepth: (H, W) inverse depth; image: (3, H, W); mask: optional
    (H, W) — multiplies the per-pixel terms before the mean (the
    reference's spatial variant keeps the UNMASKED denominator).
    """
    dx_d = jnp.abs(idepth[:, :-1] - idepth[:, 1:])
    dy_d = jnp.abs(idepth[:-1, :] - idepth[1:, :])
    wx = jnp.exp(-jnp.mean(jnp.abs(image[:, :, :-1] - image[:, :, 1:]),
                           axis=0))
    wy = jnp.exp(-jnp.mean(jnp.abs(image[:, :-1, :] - image[:, 1:, :]),
                           axis=0))
    sx = dx_d * wx
    sy = dy_d * wy
    if mask is not None:
        sx = sx * mask[:, :-1]
        sy = sy * mask[:-1, :]
    return jnp.mean(sx) + jnp.mean(sy)
