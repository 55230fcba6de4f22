"""LPIPS architecture + evaluation harness tests (synthetic weights)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from gscream_tpu.metrics import lpips as L


@pytest.fixture
def fake_weights(tmp_path, rng, monkeypatch):
    """Random (untrained) weights exercise the full architecture."""
    out = {}
    in_c = 3
    plan = L._VGG_PLAN
    for i, (out_c, _) in enumerate(plan):
        out[f"conv{i}_w"] = rng.normal(
            0, 0.05, (out_c, in_c, 3, 3)).astype(np.float32)
        out[f"conv{i}_b"] = np.zeros(out_c, np.float32)
        in_c = out_c
    taps = [plan[t][0] for t in L._TAP_AFTER]
    for j, c in enumerate(taps):
        out[f"lin{j}_w"] = np.abs(rng.normal(0, 0.1, c)).astype(np.float32)
    p = tmp_path / "lpips.npz"
    np.savez(p, **out)
    monkeypatch.setenv("GSCREAM_LPIPS_WEIGHTS", str(p))
    L._CACHE.clear()
    return str(p)


def test_lpips_unavailable(monkeypatch):
    monkeypatch.delenv("GSCREAM_LPIPS_WEIGHTS", raising=False)
    monkeypatch.setattr(L, "_weights_path", lambda: None)
    assert not L.lpips_available()


def test_lpips_identity_zero(fake_weights, rng):
    img = jnp.asarray(rng.uniform(0, 1, (3, 64, 64)).astype(np.float32))
    assert float(L.lpips(img, img)) == pytest.approx(0.0, abs=1e-6)


def test_lpips_monotone_in_noise(fake_weights, rng):
    img = jnp.asarray(rng.uniform(0.2, 0.8, (3, 64, 64)).astype(np.float32))
    small = img + 0.02 * rng.standard_normal(img.shape).astype(np.float32)
    big = img + 0.3 * rng.standard_normal(img.shape).astype(np.float32)
    d_small = float(L.lpips(img, jnp.asarray(small)))
    d_big = float(L.lpips(img, jnp.asarray(big)))
    assert 0 < d_small < d_big


def test_lpips_masked(fake_weights, rng):
    img = jnp.asarray(rng.uniform(0, 1, (3, 64, 64)).astype(np.float32))
    other = img.at[:, :32].set(0.0)  # corrupt top half
    mask_top = jnp.zeros((64, 64)).at[:32].set(1.0)
    mask_bot = jnp.zeros((64, 64)).at[32:].set(1.0)
    d_top = float(L.lpips(img, other, mask_top))
    d_bot = float(L.lpips(img, other, mask_bot))
    assert d_top > d_bot


def test_evaluate_pairs_runs(rng):
    from gscream_tpu.train.evaluate import evaluate_pairs
    a = [rng.uniform(0, 1, (3, 32, 32)).astype(np.float32)
         for _ in range(2)]
    b = [np.clip(x + 0.05, 0, 1) for x in a]
    masks = [np.ones((1, 32, 32), np.float32) for _ in a]
    res = evaluate_pairs(a, b, masks)
    assert "PSNR" in res["summary"] and "SSIM" in res["summary"]
    assert res["summary"]["PSNR"] > 20


def test_code_snapshot(tmp_path):
    """saveRuntimeCode equivalent: zip of the source tree + git head."""
    import zipfile
    from gscream_tpu.utils.snapshot import save_runtime_code
    p = save_runtime_code(str(tmp_path))
    with zipfile.ZipFile(p) as z:
        names = z.namelist()
    assert "train.py" in names
    assert any(n.startswith("gscream_tpu/") for n in names)
    assert "GIT_HEAD" in names


def test_wandb_mirror_with_fake_module(tmp_path, monkeypatch):
    """The wandb mirror calls init/log/finish when the package imports."""
    import sys
    import types
    calls = []
    fake = types.ModuleType("wandb")
    fake.init = lambda **kw: calls.append(("init", kw["project"]))
    fake.log = lambda d, step=None: calls.append(("log", step, dict(d)))
    fake.finish = lambda: calls.append(("finish",))
    monkeypatch.setitem(sys.modules, "wandb", fake)
    from gscream_tpu.train.metrics_log import MetricsLogger
    m = MetricsLogger(str(tmp_path), tensorboard=False,
                      wandb_project="gscream")
    m.log(5, {"loss": 1.0})
    m.close()
    assert ("init", "gscream") in calls
    assert ("log", 5, {"loss": 1.0}) in calls
    assert ("finish",) in calls
