"""Loss/SSIM parity tests, cross-checked against torch re-derivations."""
import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from gscream_tpu.ops import losses
from gscream_tpu.ops.ssim import my_ssim, ssim, ssim_masked


def torch_ssim(img1, img2, window_size=11, sigma=1.5):
    """Independent torch transcription of the reference training SSIM
    (utils/loss_utils.py:112-168) for cross-checking."""
    xs = torch.arange(window_size, dtype=torch.float64) - window_size // 2
    g = torch.exp(-(xs ** 2) / (2 * sigma ** 2))
    g = (g / g.sum()).float()
    w2d = g[:, None] @ g[None, :]
    c = img1.shape[-3]
    window = w2d.expand(c, 1, window_size, window_size).contiguous()
    pad = window_size // 2
    mu1 = F.conv2d(img1, window, padding=pad, groups=c)
    mu2 = F.conv2d(img2, window, padding=pad, groups=c)
    mu1_sq, mu2_sq, mu12 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = F.conv2d(img1 * img1, window, padding=pad, groups=c) - mu1_sq
    s2 = F.conv2d(img2 * img2, window, padding=pad, groups=c) - mu2_sq
    s12 = F.conv2d(img1 * img2, window, padding=pad, groups=c) - mu12
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu12 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return m


def test_ssim_matches_torch(rng):
    a = rng.uniform(0, 1, (3, 37, 53)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    want = torch_ssim(torch.from_numpy(a)[None],
                      torch.from_numpy(b)[None]).mean().item()
    got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - want) < 1e-5


def test_ssim_masked_matches_torch(rng):
    a = rng.uniform(0, 1, (3, 32, 40)).astype(np.float32)
    b = rng.uniform(0, 1, a.shape).astype(np.float32)
    mask = (rng.uniform(0, 1, (1, 32, 40)) > 0.5).astype(np.float32)
    m = torch_ssim(torch.from_numpy(a)[None], torch.from_numpy(b)[None])
    want = (m * torch.from_numpy(mask)[None]).mean().item()
    got = float(ssim_masked(jnp.asarray(a), jnp.asarray(b),
                            jnp.asarray(mask)))
    assert abs(got - want) < 1e-5


def test_ssim_identity():
    a = jnp.ones((3, 20, 20)) * 0.5
    assert float(ssim(a, a)) == pytest.approx(1.0, abs=1e-6)
    assert float(my_ssim(a, a)) == pytest.approx(1.0, abs=1e-6)


def test_scale_and_shift_recovers_affine(rng):
    d = rng.uniform(0.5, 3.0, (32, 48)).astype(np.float32)
    target = 2.5 * d - 0.7
    mask = np.ones_like(d)
    s, t = losses.compute_scale_and_shift(
        jnp.asarray(d), jnp.asarray(target), jnp.asarray(mask))
    assert float(s) == pytest.approx(2.5, abs=1e-4)
    assert float(t) == pytest.approx(-0.7, abs=1e-4)


def test_scale_and_shift_singular():
    d = jnp.zeros((8, 8))
    s, t = losses.compute_scale_and_shift(d, d, jnp.zeros((8, 8)))
    assert float(s) == 0.0 and float(t) == 0.0


def test_gradient_loss_matches_torch(rng):
    """Against the reference train.py:232-249 gradient_loss with
    image-based reduction."""
    pred = rng.uniform(0, 2, (20, 30)).astype(np.float32)
    tgt = rng.uniform(0, 2, (20, 30)).astype(np.float32)
    mask = (rng.uniform(0, 1, (20, 30)) > 0.3).astype(np.float32)

    p, g, m = (torch.from_numpy(x)[None] for x in (pred, tgt, mask))
    M = torch.sum(m, (1, 2))
    diff = m * (p - g)
    gx = torch.abs(diff[:, :, 1:] - diff[:, :, :-1]) * (m[:, :, 1:] * m[:, :, :-1])
    gy = torch.abs(diff[:, 1:, :] - diff[:, :-1, :]) * (m[:, 1:, :] * m[:, :-1, :])
    img_loss = torch.sum(gx, (1, 2)) + torch.sum(gy, (1, 2))
    want = (img_loss / M).mean().item()

    got = float(losses.gradient_loss(jnp.asarray(pred), jnp.asarray(tgt),
                                     jnp.asarray(mask)))
    assert abs(got - want) < 1e-5


def test_l1_masked_normalization():
    pred = jnp.ones((3, 4, 4))
    gt = jnp.zeros((3, 4, 4))
    mask = jnp.zeros((1, 4, 4)).at[0, :2].set(1.0)
    # reference normalizes by ALL elements: mean(|1|·mask) = 8/16
    assert float(losses.l1_loss_masked(pred, gt, mask)) == pytest.approx(0.5)


def test_psnr():
    a = jnp.full((3, 8, 8), 0.5)
    b = jnp.full((3, 8, 8), 0.6)
    assert float(losses.psnr(a, b)) == pytest.approx(20.0, abs=1e-3)


def test_inverse_depth_smoothness_matches_torch():
    """Parity with the reference's kornia-style implementation
    (loss_utils.py:224-346), including the masked spatial variant."""
    import torch

    from gscream_tpu.ops.losses import inverse_depth_smoothness

    rng = np.random.default_rng(11)
    d = rng.uniform(0.1, 2.0, (24, 31)).astype(np.float32)
    img = rng.uniform(size=(3, 24, 31)).astype(np.float32)
    mask = (rng.uniform(size=(24, 31)) > 0.4).astype(np.float32)

    td = torch.tensor(d)[None, None]
    ti = torch.tensor(img)[None]
    idx = td[:, :, :, :-1] - td[:, :, :, 1:]
    idy = td[:, :, :-1, :] - td[:, :, 1:, :]
    imx = ti[:, :, :, :-1] - ti[:, :, :, 1:]
    imy = ti[:, :, :-1, :] - ti[:, :, 1:, :]
    wx = torch.exp(-torch.mean(torch.abs(imx), dim=1, keepdim=True))
    wy = torch.exp(-torch.mean(torch.abs(imy), dim=1, keepdim=True))
    ref = (torch.mean(torch.abs(idx * wx))
           + torch.mean(torch.abs(idy * wy))).item()
    got = float(inverse_depth_smoothness(jnp.asarray(d), jnp.asarray(img)))
    np.testing.assert_allclose(got, ref, rtol=1e-6)

    tm = torch.tensor(mask)[None, None]
    ref_m = (torch.mean(torch.abs(idx * wx) * tm[:, :, :, :-1])
             + torch.mean(torch.abs(idy * wy) * tm[:, :, :-1, :])).item()
    got_m = float(inverse_depth_smoothness(
        jnp.asarray(d), jnp.asarray(img), jnp.asarray(mask)))
    np.testing.assert_allclose(got_m, ref_m, rtol=1e-6)
