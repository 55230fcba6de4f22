"""Band-local GScream losses with halo exchange — O(H·W/bands) comms.

The naive sharded loss (round 1) psum'd the full 8×H×W canvas in both
directions so every band device could evaluate :func:`train.step.loss_terms`
on the complete frame (~35 MB per view per direction at 1297×840).  Every
loss the reference uses (train.py:535-573) is in fact *local* up to a small
row halo plus a handful of global scalars:

* masked L1 terms — perfectly pixel-local partial sums;
* training SSIM (11×11 zero-pad window, utils/loss_utils.py:131-199) — each
  output row reads ±5 input rows;
* MiDaS scale/shift (train.py:198-221) — five global sums (the 2×2 normal
  equations), psum'd as scalars;
* the multiscale gradient pyramid (train.py:224-249) at strides 1,2,4,8 —
  the stride-8 vertical difference reads 8 rows ahead.

So each device exchanges only ``HALO`` = 8 rendered rows with its
neighbours (one ``ppermute`` per direction) and psums ~20 scalars: the
all-reduce volume drops from O(H·W) to O(W·HALO + 1).  Band heights are
multiples of TILE_H = 32, so every pyramid stride divides the band origin
and the strided grids partition exactly across bands.

Parity contract: for any band count the total loss (and its gradients,
via the differentiable ppermute/psum) equals the single-device
:func:`gscream_tpu.train.step.loss_terms` — asserted by
``tests/test_sharded.py``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import OptimConfig
from ..ops.ssim import _ssim_map

HALO = 8          # rows exchanged per direction (ssim needs 5, stride-8
                  # pyramid needs 8)


def halo_exchange(band: jnp.ndarray, axis_name: str, n_bands: int):
    """(C, bh, W) → (C, HALO + bh + HALO, W) with neighbours' edge rows.

    Two ``ppermute`` rounds (down-shift and up-shift along the band axis);
    the first band's top halo and last band's bottom halo stay zero, which
    reproduces the global zero-padding of the training SSIM at the true
    image border.
    """
    if n_bands == 1:
        z = jnp.zeros(band.shape[:-2] + (HALO, band.shape[-1]), band.dtype)
        return jnp.concatenate([z, band, z], axis=-2)
    idx = jax.lax.axis_index(axis_name)
    top_edge = band[..., :HALO, :]       # rows this band sends upward
    bot_edge = band[..., -HALO:, :]      # rows this band sends downward
    # band b receives its *bottom* halo from band b+1's top edge
    from_below = jax.lax.ppermute(
        top_edge, axis_name, [(i, i - 1) for i in range(1, n_bands)])
    # band b receives its *top* halo from band b-1's bottom edge
    from_above = jax.lax.ppermute(
        bot_edge, axis_name, [(i, i + 1) for i in range(n_bands - 1)])
    zero = jnp.zeros_like(top_edge)
    top = jnp.where(idx > 0, from_above, zero)
    bot = jnp.where(idx < n_bands - 1, from_below, zero)
    return jnp.concatenate([top, band, bot], axis=-2)


def _own(x_ext: jnp.ndarray, bh: int):
    """Slice the owned rows back out of a halo-extended strip."""
    return x_ext[..., HALO:HALO + bh, :]


def _row_weight(row0, bh, height: int):
    """(bh, 1) weight: 1 for rows that exist in the real image (the last
    band's padding rows weigh 0)."""
    r = row0 + jnp.arange(bh)
    return (r < height)[:, None].astype(jnp.float32)


def _grad_pyramid_partials(aligned_ext, target_ext, mask_ext, row0, bh,
                           height: int, levels: int = 4):
    """Band partials of the multiscale gradient loss (train.py:224-249).

    Returns (nums, dens): per-level partial numerators Σ|∂(masked diff)|
    owned by this band and partial denominators Σ mask over this band's
    strided rows.  ``gradient_loss`` divides per level, so the division
    happens after the psum.

    Ownership: a vertical difference (r, r+step) belongs to the band owning
    row r; horizontal differences to the band owning their row.  row0 is a
    multiple of 32, so the global strided grid restricted to this band is
    ``aligned[HALO + (0, step, …), :]`` exactly.
    """
    nums, dens = [], []
    for s in range(levels):
        step = 2 ** s
        # global strided rows r = row0, row0+step, … inside the band,
        # plus one extra strided row below (from the halo) for gy
        n_rows = bh // step
        rows = HALO + jnp.arange(n_rows + 1) * step    # last may be halo
        a = aligned_ext[rows, ::step]                  # (n_rows+1, W/step)
        t = target_ext[rows, ::step]
        m = mask_ext[rows, ::step]
        diff = (a - t) * m
        # row existence weights at this stride
        rw = ((row0 + jnp.arange(n_rows + 1) * step) < height
              ).astype(jnp.float32)[:, None]
        own_w = rw[:n_rows]                            # owned strided rows
        gx = jnp.abs(diff[:n_rows, 1:] - diff[:n_rows, :-1]) \
            * (m[:n_rows, 1:] * m[:n_rows, :-1]) * own_w
        gy = jnp.abs(diff[1:] - diff[:-1]) * (m[1:] * m[:-1]) \
            * own_w * rw[1:]
        nums.append(jnp.sum(gx) + jnp.sum(gy))
        dens.append(jnp.sum(m[:n_rows] * own_w))
    return jnp.stack(nums), jnp.stack(dens)


def band_loss_terms(out_band, row0, gt_image, gt_mask, midas_depth,
                    fg_box_mask, opt: OptimConfig, is_ref,
                    height: int, width: int, axis_name: str, n_bands: int):
    """Band-sharded equivalent of ``train.step.loss_terms``.

    out_band: TiledOut with band-local (bh, W, …) images; row0: this band's
    first global row; gt_image (3,H,W), gt_mask (1,H,W), midas_depth
    (1,H,W), fg_box_mask (H,W) are replicated full-frame inputs (they are
    plain training data — only *rendered* tensors travel between bands).

    ``is_ref`` may be a Python bool **or a traced scalar** (per-view flag
    in a data-parallel batch, VERDICT r2 item 2): the superset of both
    branches' partial sums is computed once — the expensive SSIM map is
    shared, the extra masked sums are elementwise-cheap — and the final
    value is a ``jnp.where`` select (constant-folded when is_ref is a
    Python bool).  Returns (loss, l1) — identical on every band device
    after the psums.
    """
    bh = out_band.depth.shape[0]
    img_band = out_band.color.transpose(2, 0, 1)       # (3, bh, W)
    dep_band = out_band.depth                          # (bh, W)

    def band_rows(full):
        return jax.lax.dynamic_slice_in_dim(
            jnp.pad(full, [(0, 0)] * (full.ndim - 2)
                    + [(0, bh * n_bands - height)] + [(0, 0)]),
            row0, bh, axis=-2)

    def ext_rows(full):
        """Halo-extended strip of a replicated full-image tensor."""
        padded = jnp.pad(full, [(0, 0)] * (full.ndim - 2)
                         + [(HALO, HALO + bh * n_bands - height), (0, 0)])
        return jax.lax.dynamic_slice_in_dim(padded, row0, bh + 2 * HALO,
                                            axis=-2)

    rw = _row_weight(row0, bh, height)                 # (bh,1)
    npix = jnp.float32(height * width)

    gt_band = band_rows(gt_image)                      # (3,bh,W)
    mask_band = band_rows(gt_mask)                     # (1,bh,W)
    mono_band = band_rows(midas_depth[0])              # (bh,W)
    fgbox_band = band_rows(fg_box_mask)                # (bh,W)

    img_ext = halo_exchange(img_band, axis_name, n_bands)
    gt_ext = ext_rows(gt_image)

    # row-weighted ssim map over this band's owned real rows — built ONCE;
    # all three weighted sums reuse it (the 11x11 separable convs are the
    # loss head's dominant cost)
    m_own = _own(_ssim_map(img_ext, gt_ext, 11, 1.5, "zero",
                           0.01 ** 2, 0.03 ** 2), bh) * rw[None]
    l1_map = jnp.abs(img_band - gt_band) * rw[None]
    w_band = (1.0 - mask_band) + opt.other_rgb_lr_fg * mask_band
    sums = [jnp.sum(l1_map), jnp.sum(m_own),                   # ref plain
            jnp.sum(l1_map * mask_band), jnp.sum(m_own * mask_band),
            jnp.sum(l1_map * w_band), jnp.sum(m_own * w_band)]  # other
    valid_band = (1.0 - mask_band[0]) * rw

    # --- MiDaS scale/shift normal equations on the valid region ---------
    p, t_, mk = dep_band, mono_band, valid_band
    ss = [jnp.sum(mk * p * p), jnp.sum(mk * p), jnp.sum(mk),
          jnp.sum(mk * p * t_), jnp.sum(mk * t_)]

    red1 = jax.lax.psum(jnp.stack(sums + ss), axis_name) \
        if n_bands > 1 else jnp.stack(sums + ss)
    a00, a01, a11, b0, b1 = red1[6], red1[7], red1[8], red1[9], red1[10]
    det = a00 * a11 - a01 * a01
    ok = det != 0.0
    safe = jnp.where(ok, det, 1.0)
    s_fit = jnp.abs(jnp.where(ok, (a11 * b0 - a01 * b1) / safe, 0.0))
    t_fit = jnp.where(ok, (-a01 * b0 + a00 * b1) / safe, 0.0)

    aligned_band = s_fit * dep_band + t_fit
    aligned_ext = halo_exchange(aligned_band[None], axis_name,
                                n_bands)[0]            # (HALO+bh+HALO, W)
    mono_ext = ext_rows(midas_depth[0])

    # --- depth partial sums (both branches) ------------------------------
    dl1_map = jnp.abs(aligned_band - mono_band)
    dsum = [jnp.sum(dl1_map * rw),                     # ref: full image
            jnp.sum(dl1_map * fgbox_band * rw),        # ref: fg box
            jnp.sum(dl1_map * valid_band)]             # other: background
    # pyramid masks: ref = ones, other = background; both zeroed beyond
    # the real image so halo-extension rows vanish (matches the unpadded
    # global computation)
    ridx = row0 - HALO + jnp.arange(bh + 2 * HALO)
    real = ((ridx >= 0) & (ridx < height)).astype(jnp.float32)[:, None]
    ones_ext = jnp.broadcast_to(real, (bh + 2 * HALO, width))
    bg_ext = ext_rows(1.0 - gt_mask[0]) * real
    nums_1, dens_1 = _grad_pyramid_partials(aligned_ext, mono_ext,
                                            ones_ext, row0, bh, height)
    nums_m, dens_m = _grad_pyramid_partials(aligned_ext, mono_ext,
                                            bg_ext, row0, bh, height)

    red2 = jax.lax.psum(
        jnp.concatenate([jnp.stack(dsum), nums_1, dens_1, nums_m, dens_m]),
        axis_name) if n_bands > 1 \
        else jnp.concatenate([jnp.stack(dsum), nums_1, dens_1,
                              nums_m, dens_m])
    dsum_g = red2[:3]

    def pyr_of(nums_g, dens_g):
        return jnp.sum(jnp.where(dens_g > 0,
                                 nums_g / jnp.maximum(dens_g, 1.0), 0.0))

    pyr_ref = pyr_of(red2[3:7], red2[7:11])
    pyr_other = pyr_of(red2[11:15], red2[15:19])

    # --- assemble exactly as loss_terms does, then select ----------------
    l1_ref = red1[0] / (3.0 * npix)
    ssim_ref = red1[1] / (3.0 * npix)
    loss_ref = opt.refer_rgb_lr * ((1 - opt.lambda_dssim) * l1_ref
                                   + opt.lambda_dssim * (1 - ssim_ref))
    if opt.refer_rgb_lr_fg > opt.refer_rgb_lr:
        l1m = red1[2] / (3.0 * npix)
        ssim_m = red1[3] / (3.0 * npix)
        loss_ref = loss_ref + (opt.refer_rgb_lr_fg - opt.refer_rgb_lr) * (
            (1 - opt.lambda_dssim) * l1m
            + opt.lambda_dssim * (1 - ssim_m))
    if opt.refer_depth_lr > 0:
        dloss = opt.refer_depth_lr * (dsum_g[0] / npix)
        if opt.refer_depth_lr_fg > opt.refer_depth_lr:
            dloss = dloss + (opt.refer_depth_lr_fg
                             - opt.refer_depth_lr) * (dsum_g[1] / npix)
        dloss = dloss + 0.5 * opt.refer_depth_lr_smooth * pyr_ref
        loss_ref = loss_ref + dloss

    l1_other = red1[4] / (3.0 * npix)
    ssim_o = red1[5] / (3.0 * npix)
    loss_other = opt.other_rgb_lr * ((1 - opt.lambda_dssim) * l1_other
                                     + opt.lambda_dssim * (1 - ssim_o))
    if opt.other_depth_lr > 0:
        loss_other = loss_other + opt.other_depth_lr * (dsum_g[2] / npix) \
            + 0.5 * opt.other_depth_lr_smooth * pyr_other

    loss = jnp.where(is_ref, loss_ref, loss_other)
    l1 = jnp.where(is_ref, l1_ref, l1_other)
    return loss, l1
