"""Parity gate for the selective-bf16 RGB loss head (VERDICT r1 item 6).

``OptimConfig.loss_dtype="bfloat16"`` runs the L1/SSIM maps in bf16 with
f32 reductions while the render path, the transmittance math and the depth
scale/shift fit stay fp32 (round 1 showed blanket bf16 matmuls collapse
training — gscream_tpu/precision.py).  These tests pin:

* fp32 losses are bit-identical to before the feature (dtype plumb-through
  is a no-op at the default);
* bf16 losses and their input gradients stay within tight relative bounds
  of fp32 on both view types (ref + other, incl. masked SSIM paths);
* gradient DIRECTION is preserved (cosine similarity), which is what the
  optimizer actually consumes.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from gscream_tpu.config import OptimConfig
from gscream_tpu.train.step import loss_terms


class _Out:
    def __init__(self, color, depth, unc, t):
        self.color = color
        self.depth = depth
        self.uncertainty = unc
        self.final_t = t


def _scene(rng, h=96, w=128):
    color = jnp.asarray(rng.uniform(0, 1, (h, w, 3)), jnp.float32)
    depth = jnp.asarray(rng.uniform(2, 8, (h, w)), jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 1, (3, h, w)), jnp.float32)
    mask = np.zeros((1, h, w), np.float32)
    mask[0, 20:60, 30:90] = 1.0
    midas = jnp.asarray(rng.uniform(0, 1, (1, h, w)), jnp.float32)
    fg_box = jnp.asarray(mask[0])
    return color, depth, gt, jnp.asarray(mask), midas, fg_box


def _loss_and_grad(opt, is_ref, scene):
    color, depth, gt, mask, midas, fg_box = scene

    def f(color, depth):
        out = _Out(color, depth, jnp.zeros_like(depth),
                   jnp.zeros_like(depth))
        loss, l1 = loss_terms(out, gt, mask, midas, fg_box, opt, is_ref)
        return loss

    loss, grads = jax.value_and_grad(f, argnums=(0, 1))(color, depth)
    return float(loss), [np.asarray(g, np.float64) for g in grads]


def test_bf16_losses_match_fp32():
    rng = np.random.default_rng(0)
    scene = _scene(rng)
    for is_ref in (True, False):
        l32, g32 = _loss_and_grad(OptimConfig(), is_ref, scene)
        l16, g16 = _loss_and_grad(
            OptimConfig(loss_dtype="bfloat16"), is_ref, scene)
        assert abs(l16 - l32) <= 2e-2 * abs(l32), (is_ref, l16, l32)
        for a, b in zip(g16, g32):
            # direction: what Adam actually consumes
            cos = np.sum(a * b) / max(
                np.linalg.norm(a) * np.linalg.norm(b), 1e-12)
            # 0.995: random test images put many pixels at |diff|~0 where
            # bf16 legitimately flips the L1 sign; real images are smooth
            assert cos > 0.995, (is_ref, cos)
            # magnitude
            assert np.linalg.norm(a - b) <= 5e-2 * np.linalg.norm(b), \
                (is_ref, np.linalg.norm(a - b) / np.linalg.norm(b))


def test_fp32_default_unchanged():
    """The dtype plumbing is a no-op at the fp32 default."""
    rng = np.random.default_rng(1)
    scene = _scene(rng, h=64, w=64)
    l_def, g_def = _loss_and_grad(OptimConfig(), True, scene)
    l_f32, g_f32 = _loss_and_grad(
        OptimConfig(loss_dtype="float32"), True, scene)
    assert l_def == l_f32
    for a, b in zip(g_def, g_f32):
        np.testing.assert_array_equal(a, b)
