"""SSIM variants matching the reference's two implementations.

* :func:`ssim` / :func:`ssim_masked` — the training-loss SSIM
  (``utils/loss_utils.py:131-199``): 11×11 gaussian window (σ=1.5),
  per-channel convolution with **zero** padding of window//2, constants
  C1=0.01², C2=0.03²; the masked variant multiplies the ssim map by the
  mask before the global mean.
* :func:`kornia_ssim` / :func:`my_ssim` — the evaluation SSIM
  (``utils/loss_utils.py:123-128, 381-441``): kornia ``metrics.ssim`` with
  window 5, σ=1.5, *reflect* padding; ``my_ssim = 1 − 2·mean(clamp((1−map)/2))``
  optionally restricted to a mask.

Images are (C,H,W) float in [0,1].
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _filter2d(img: jnp.ndarray, k1d: np.ndarray, padding: str) -> jnp.ndarray:
    """Depthwise gaussian blur using conv_general_dilated (fast path)."""
    half = len(k1d) // 2
    c = img.shape[0]
    x = img[None]                                  # (1,C,H,W)
    if padding == "reflect":
        x = jnp.pad(x, ((0, 0), (0, 0), (half, half), (half, half)),
                    mode="reflect")
        pad = "VALID"
    else:
        pad = [(half, half), (half, half)]
    # kernel follows the image dtype so a bf16 fast path stays bf16
    kh = jnp.asarray(k1d, img.dtype).reshape(1, 1, -1, 1)
    kv = jnp.asarray(k1d, img.dtype).reshape(1, 1, 1, -1)
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, 1, len(k1d), 1),
                                        ("NCHW", "OIHW", "NCHW"))
    ph = pad if pad == "VALID" else [pad[0], (0, 0)]
    pw = pad if pad == "VALID" else [(0, 0), pad[1]]
    x = jax.lax.conv_general_dilated(
        x, jnp.tile(kh, (c, 1, 1, 1)), (1, 1), ph,
        dimension_numbers=dn, feature_group_count=c)
    x = jax.lax.conv_general_dilated(
        x, jnp.tile(kv, (c, 1, 1, 1)), (1, 1), pw,
        dimension_numbers=dn, feature_group_count=c)
    return x[0]


def _ssim_map(img1, img2, window_size, sigma, padding, c1, c2):
    k = _gaussian_kernel(window_size, sigma)
    f = partial(_filter2d, k1d=k, padding=padding)
    mu1 = f(img1)
    mu2 = f(img2)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu12 = mu1 * mu2
    # variances are mathematically >= 0; the E[x²]-μ² cancellation makes
    # them slightly negative under rounding — catastrophically so in the
    # bf16 loss path, where (s1+s2+c2) can cross zero and blow the map to
    # inf/NaN.  Clamping keeps the denominator >= c2 (a no-op at fp32
    # beyond the last ulp).
    s1 = jnp.maximum(f(img1 * img1) - mu1_sq, 0.0)
    s2 = jnp.maximum(f(img2 * img2) - mu2_sq, 0.0)
    s12 = f(img1 * img2) - mu12
    return ((2 * mu12 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))


def ssim(img1: jnp.ndarray, img2: jnp.ndarray,
         window_size: int = 11) -> jnp.ndarray:
    """Training SSIM (loss_utils.py:139-168), zero padding, mean reduce."""
    m = _ssim_map(img1, img2, window_size, 1.5, "zero", 0.01 ** 2, 0.03 ** 2)
    # accumulate in AT LEAST f32 (f32 under bf16, f64 stays f64)
    return jnp.mean(m, dtype=jnp.promote_types(m.dtype, jnp.float32))


def ssim_masked(img1: jnp.ndarray, img2: jnp.ndarray, mask: jnp.ndarray,
                window_size: int = 11) -> jnp.ndarray:
    """Masked training SSIM (loss_utils.py:172-199): map·mask then mean
    over *all* pixels (the reference's normalization)."""
    m = _ssim_map(img1, img2, window_size, 1.5, "zero", 0.01 ** 2, 0.03 ** 2)
    return jnp.mean(m * mask.astype(m.dtype),
                    dtype=jnp.promote_types(m.dtype, jnp.float32))


def kornia_ssim_map(img1, img2, window_size: int = 5,
                    max_val: float = 1.0) -> jnp.ndarray:
    """kornia.metrics.ssim map: gaussian window σ=1.5, reflect padding."""
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    return _ssim_map(img1, img2, window_size, 1.5, "reflect", c1, c2)


def my_ssim(img_pred, img_gt, mask=None) -> jnp.ndarray:
    """Evaluation SSIM (loss_utils.py:123-128): 1 − 2·dssim ∈ [−1,1].

    ``mask`` (1,H,W or H,W) restricts the mean to masked entries
    (broadcast over channels), mirroring ``loss[mask]``.
    """
    m = kornia_ssim_map(img_pred, img_gt, 5)
    dssim = jnp.clip((1.0 - m) / 2.0, 0.0, 1.0)
    if mask is None:
        d = jnp.mean(dssim)
    else:
        mask = jnp.broadcast_to(mask.reshape(1, *mask.shape[-2:]) > 0,
                                dssim.shape)
        d = jnp.sum(dssim * mask) / jnp.maximum(jnp.sum(mask), 1)
    return 1.0 - 2.0 * d
