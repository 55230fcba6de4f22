"""LPIPS reimplementation parity vs an independent torch computation.

Real pretrained VGG/LPIPS weights cannot exist in this zero-egress image
(see gscream_tpu/metrics/lpips.py docstring), so this test freezes random
weights in the export .npz format and checks our JAX pipeline — input
scaling, padded convs, pre-conv max-pools, relu taps, channel unit
normalization, 1x1 linear heads, spatial (masked) averaging — against a
from-scratch torch replica of the lpips package's VGG16 forward
(lpips/lpips.py + pretrained_networks.py).  Passing means the only gap to
the reference metric is the weight file itself, which
tools/export_lpips.py produces on any connected machine.
"""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from gscream_tpu.metrics import lpips as L


_PLAN = L._VGG_PLAN
_TAPS = L._TAP_AFTER


def _random_weights(rng):
    out = {}
    cin = 3
    for i, (cout, _) in enumerate(_PLAN):
        out[f"conv{i}_w"] = rng.normal(
            0, 0.1 / np.sqrt(cin * 9), (cout, cin, 3, 3)).astype(np.float32)
        out[f"conv{i}_b"] = rng.normal(0, 0.05, (cout,)).astype(np.float32)
        cin = cout
    for j, tap in enumerate(_TAPS):
        c = _PLAN[tap][0]
        out[f"lin{j}_w"] = np.abs(
            rng.normal(0, 0.01, (c,))).astype(np.float32)
    return out


def _torch_lpips(z, img0, img1, mask=None):
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(x):
        h = (x * 2.0 - 1.0 - shift) / scale
        taps = []
        for i, (_, pool) in enumerate(_PLAN):
            if pool:
                h = F.max_pool2d(h, 2, 2)
            h = F.conv2d(h, torch.from_numpy(z[f"conv{i}_w"]),
                         torch.from_numpy(z[f"conv{i}_b"]), padding=1)
            h = F.relu(h)
            if i in _TAPS:
                taps.append(h)
        return taps

    f0 = feats(torch.from_numpy(img0[None]))
    f1 = feats(torch.from_numpy(img1[None]))
    in_hw = img0.shape[-2:]
    total = 0.0
    spatial = torch.zeros(in_hw)
    for a, b, j in zip(f0, f1, range(5)):
        na = a / (a.square().sum(1, keepdim=True).sqrt() + 1e-10)
        nb = b / (b.square().sum(1, keepdim=True).sqrt() + 1e-10)
        d = (na - nb).square()
        lw = torch.from_numpy(z[f"lin{j}_w"]).view(1, -1, 1, 1)
        m = (d * lw).sum(1, keepdim=True)
        if mask is None:
            total += m.mean().item()
        else:
            # the lpips package's spatial=True mode: per-layer maps are
            # bilinearly upsampled (align_corners=False) to the input
            # resolution and summed (lpips/lpips.py upsample())
            spatial = spatial + F.interpolate(
                m, size=in_hw, mode="bilinear", align_corners=False)[0, 0]
    if mask is not None:
        # reference train.py:951-953: cur_lpips_spatial[mask].mean()
        total = spatial[torch.from_numpy(mask > 0)].mean().item()
    return total


@pytest.fixture()
def weights(tmp_path, monkeypatch):
    rng = np.random.default_rng(11)
    z = _random_weights(rng)
    p = tmp_path / "lpips_rand.npz"
    np.savez(p, **z)
    monkeypatch.setenv("GSCREAM_LPIPS_WEIGHTS", str(p))
    L._CACHE.clear()
    return z


def test_lpips_matches_torch(weights):
    rng = np.random.default_rng(5)
    img0 = rng.uniform(0, 1, (3, 64, 96)).astype(np.float32)
    img1 = np.clip(img0 + rng.normal(0, 0.1, img0.shape), 0, 1) \
        .astype(np.float32)
    assert L.lpips_available()
    ours = float(L.lpips(img0, img1))
    ref = _torch_lpips(weights, img0, img1)
    assert ours == pytest.approx(ref, rel=2e-4), (ours, ref)
    assert ours > 0


def test_lpips_masked_matches_torch(weights):
    rng = np.random.default_rng(6)
    img0 = rng.uniform(0, 1, (3, 64, 64)).astype(np.float32)
    img1 = rng.uniform(0, 1, (3, 64, 64)).astype(np.float32)
    mask = np.zeros((64, 64), np.float32)
    mask[12:40, 20:50] = 1.0
    ours = float(L.lpips(img0, img1, mask=mask))
    ref = _torch_lpips(weights, img0, img1, mask=mask)
    assert ours == pytest.approx(ref, rel=2e-4), (ours, ref)


def test_lpips_identical_images_zero(weights):
    img = np.random.default_rng(7).uniform(0, 1, (3, 48, 48)) \
        .astype(np.float32)
    assert float(L.lpips(img, img)) == pytest.approx(0.0, abs=1e-9)


# ---------------------------------------------------------------------------
# Real-weights integration gate (VERDICT r3 item 9).  The replica tests
# above prove the PIPELINE (scaling, pads, pools, taps, normalization,
# heads, spatial mode) but cannot catch a wrong tap index or scaling
# constant that a replica built from the same description would share.
# This test auto-activates on the first machine where the real exported
# weights exist (tools/export_lpips.py) and, when the lpips pip package
# is importable too, closes that residual risk against the published
# implementation itself.

_real = os.environ.get("GSCREAM_LPIPS_WEIGHTS", "")
_real = _real if _real and os.path.exists(_real) else os.path.expanduser(
    "~/.cache/gscream/lpips_vgg.npz")


@pytest.mark.skipif(not os.path.exists(_real),
                    reason="real LPIPS weights absent (zero-egress image); "
                           "run tools/export_lpips.py on a connected machine")
def test_lpips_real_weights(monkeypatch):
    monkeypatch.setenv("GSCREAM_LPIPS_WEIGHTS", _real)
    L._CACHE.clear()
    rng = np.random.default_rng(3)
    img0 = rng.uniform(0, 1, (3, 64, 64)).astype(np.float32)
    img1 = np.clip(img0 + rng.normal(0, 0.2, img0.shape), 0, 1) \
        .astype(np.float32)
    ours = float(L.lpips(img0, img1))
    assert 0.0 < ours < 1.5        # plausible-perturbation range
    assert float(L.lpips(img0, img0)) == pytest.approx(0.0, abs=1e-9)
    try:
        import lpips as lpips_pkg
    except ImportError:
        pytest.skip("real weights present but lpips package absent — "
                    "value-range gate only")
    net = lpips_pkg.LPIPS(net="vgg", spatial=False)
    ref = float(net(torch.from_numpy(img0[None]) * 2 - 1,
                    torch.from_numpy(img1[None]) * 2 - 1).item())
    assert ours == pytest.approx(ref, rel=1e-3), (ours, ref)
