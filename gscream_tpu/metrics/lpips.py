"""LPIPS (VGG16 variant) in pure JAX.

The reference evaluates LPIPS with the ``lpips`` pip package's VGG16 net
(``train.py:50-51``, used at ``train.py:948-953`` incl. the masked spatial
variant).  This module reimplements that exact computation:

* VGG16 features after relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3;
* per-layer unit-normalization along channels, squared difference,
  1×1 learned linear heads, spatial averaging (or masked averaging for the
  object-region metric) and summation over layers;
* the canonical input scaling ``(x - shift) / scale`` of the LPIPS net.

Pretrained weights cannot be bundled (this build environment has no
network egress and no torchvision/lpips caches).  Weights load from an
``.npz`` at ``$GSCREAM_LPIPS_WEIGHTS`` or ``~/.cache/gscream/lpips_vgg.npz``
with keys ``conv{i}_w``/``conv{i}_b`` (OIHW, i=0..12 over VGG16 conv
layers) and ``lin{j}_w`` (j=0..4, shape (C_j,)); ``tools/export_lpips.py``
writes that file from the upstream packages on any connected machine.
When no weights are present :func:`lpips_available` is False and the
evaluation harness reports LPIPS as null rather than a wrong number.
"""
from __future__ import annotations

import os
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, pool_before)
_VGG_PLAN = [(64, False), (64, False),
             (128, True), (128, False),
             (256, True), (256, False), (256, False),
             (512, True), (512, False), (512, False),
             (512, True), (512, False), (512, False)]
# indices (into conv outputs) whose relu activations feed LPIPS
_TAP_AFTER = [1, 3, 6, 9, 12]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _weights_path() -> Optional[str]:
    cand = [os.environ.get("GSCREAM_LPIPS_WEIGHTS", ""),
            os.path.expanduser("~/.cache/gscream/lpips_vgg.npz")]
    for c in cand:
        if c and os.path.exists(c):
            return c
    return None


_CACHE = {}


def lpips_available() -> bool:
    return _weights_path() is not None


def load_weights():
    path = _weights_path()
    if path is None:
        raise FileNotFoundError(
            "LPIPS weights not found; export them with tools/export_lpips.py"
            " and set GSCREAM_LPIPS_WEIGHTS")
    if path not in _CACHE:
        z = np.load(path)
        convs = [(jnp.asarray(z[f"conv{i}_w"]), jnp.asarray(z[f"conv{i}_b"]))
                 for i in range(13)]
        lins = [jnp.asarray(z[f"lin{j}_w"]) for j in range(5)]
        _CACHE[path] = (convs, lins)
    return _CACHE[path]


def _vgg_features(x, convs):
    """x: (3,H,W) in [-1,1] LPIPS convention → list of tap activations."""
    h = (x - _SHIFT[:, None, None]) / _SCALE[:, None, None]
    h = h[None]                                   # (1,3,H,W)
    taps: List[jnp.ndarray] = []
    for i, ((w, b), (_, pool)) in enumerate(zip(convs, _VGG_PLAN)):
        if pool:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                "VALID")
        h = jax.lax.conv_general_dilated(
            h, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        h = h + b[None, :, None, None]
        h = jax.nn.relu(h)
        if i in _TAP_AFTER:
            taps.append(h[0])
    return taps


def _norm_feat(f, eps=1e-10):
    n = jnp.sqrt(jnp.sum(f * f, axis=0, keepdims=True))
    return f / (n + eps)


def lpips(img0, img1, mask=None):
    """LPIPS distance between (3,H,W) images in [0,1].

    ``mask`` (H,W): the reference's masked-LPIPS protocol
    (train.py:951-953) — the lpips package's **spatial** mode: each
    layer's per-pixel map is bilinearly upsampled (align_corners=False)
    to the INPUT resolution, the layer maps are summed into one spatial
    LPIPS map, and that map is averaged inside the mask
    (``cur_lpips_spatial[mask].mean()``).
    """
    convs, lins = load_weights()
    f0 = _vgg_features(img0 * 2.0 - 1.0, convs)
    f1 = _vgg_features(img1 * 2.0 - 1.0, convs)
    hw = img0.shape[-2:]
    total = 0.0
    for a, b, lw in zip(f0, f1, lins):
        d = (_norm_feat(a) - _norm_feat(b)) ** 2          # (C,h,w)
        m = jnp.einsum('c,chw->hw', lw, d)                # 1x1 lin head
        if mask is None:
            total = total + jnp.mean(m)
        else:
            # jax.image "linear" and torch bilinear(align_corners=False)
            # share half-pixel sampling; antialias only kicks in on
            # downscale, so upsampled maps match the package's
            # nn.Upsample bit-for-bit in exact arithmetic
            total = total + jax.image.resize(m, hw, method="linear")
    if mask is not None:
        mm = (mask > 0).astype(jnp.float32)
        total = jnp.sum(total * mm) / jnp.maximum(jnp.sum(mm), 1.0)
    return total
