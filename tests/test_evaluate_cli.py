"""Standalone disk-artifact evaluation (VERDICT r2 item 7).

The reference's ``evaluate()`` runs on a model DIRECTORY
(/root/reference/train.py:905-992): ``test/<method>/renders`` vs ``gt``
plus ``images_4/test_label/out_%05d.png`` masks (1-indexed, LANCZOS →
render size).  These tests drive this repo's ``evaluate.py`` CLI over
synthetic artifacts and check the protocol details.
"""
import json
import os

import numpy as np
import pytest

imageio = pytest.importorskip("imageio.v2")

from evaluate import evaluate_dir, load_test_label_masks


def _write_png(path, chw):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    imageio.imwrite(path, (np.clip(chw.transpose(1, 2, 0), 0, 1)
                           * 255).astype(np.uint8))


@pytest.fixture()
def artifacts(tmp_path):
    rng = np.random.default_rng(0)
    model = tmp_path / "model"
    src = tmp_path / "scene"
    h, w = 32, 48
    for i in range(3):
        gt = rng.uniform(0.2, 0.8, (3, h, w)).astype(np.float32)
        render = np.clip(gt + rng.normal(0, 0.03, gt.shape), 0, 1) \
            .astype(np.float32)
        _write_png(str(model / "test" / "renders" / f"{i:05d}.png"), render)
        _write_png(str(model / "test" / "gt" / f"{i:05d}.png"), gt)
        # 1-indexed test_label at DOUBLE resolution (exercises the
        # LANCZOS resize-to-render-size path)
        m = np.zeros((2 * h, 2 * w), np.float32)
        m[20:44, 30:70] = 1.0
        os.makedirs(src / "images_4" / "test_label", exist_ok=True)
        imageio.imwrite(
            str(src / "images_4" / "test_label" / ("out_%05d.png" % (1 + i))),
            (m * 255).astype(np.uint8))
    return str(model), str(src), (h, w)


def test_load_test_label_masks(artifacts):
    model, src, (h, w) = artifacts
    masks = load_test_label_masks(src, 3, (w, h))
    assert masks is not None and len(masks) == 3
    assert masks[0].shape == (1, h, w)
    assert set(np.unique(masks[0])) <= {0.0, 1.0}
    assert masks[0].sum() > 0
    # missing dir → None (caller falls back)
    assert load_test_label_masks(model, 3, (w, h)) is None


def test_evaluate_dir_writes_results(artifacts):
    model, src, _ = artifacts
    r = evaluate_dir(os.path.join(model, "test"), source_path=src)
    assert r["summary"]["PSNR"] > 20
    assert 0 < r["summary"]["SSIM"] <= 1
    assert "PSNR_masked" in r["summary"]
    with open(os.path.join(model, "test", "results.json")) as f:
        blob = json.load(f)
    assert "PSNR" in blob["ours"]
    with open(os.path.join(model, "test", "per_view.json")) as f:
        pv = json.load(f)
    assert "00000.png" in pv["ours"]


def test_evaluate_dir_without_masks(artifacts):
    model, _, _ = artifacts
    r = evaluate_dir(os.path.join(model, "test"))
    assert "PSNR_masked" not in r["summary"]
