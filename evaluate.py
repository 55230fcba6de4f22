"""Standalone metric evaluation over a model directory's disk artifacts.

The reference evaluates from directories alone — ``evaluate()``
(/root/reference/train.py:905-992) walks ``<model>/test/<method>/renders``
vs ``.../gt`` and loads the object-region masks from
``<source>/images_4/test_label/out_%05d.png`` (1-indexed, LANCZOS-resized
to the render resolution, train.py:895-899).  This CLI reproduces that
contract on this repo's artifacts:

    python evaluate.py --model_path out/scene [--source_path data/scene]
                       [--split test]

Layouts accepted: ``<model>/<split>/renders`` (this repo's render_set) or
``<model>/<split>/<method>/renders`` (the reference's nested method dirs).
Writes ``results.json`` / ``per_view.json`` next to the renders' parent,
in the reference's format.  Masked metrics follow the reference protocol
exactly: binarized test_label masks, masked PSNR/my_ssim, and LPIPS in
the lpips package's *spatial* mode (per-layer maps upsampled to input
resolution, averaged inside the mask — train.py:951-953).
"""
from __future__ import annotations

import argparse
import json
import os
from typing import List, Optional

import numpy as np


def _read_image(path: str) -> np.ndarray:
    """PNG → (3,H,W) float32 in [0,1]."""
    import imageio.v2 as imageio
    arr = np.asarray(imageio.imread(path), np.float32) / 255.0
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, -1)
    return arr[..., :3].transpose(2, 0, 1)


def load_test_label_masks(source_path: str, n: int,
                          size: Optional[tuple] = None
                          ) -> Optional[List[np.ndarray]]:
    """The reference's masked-eval masks (train.py:895-899):
    ``images_4/test_label/out_%05d.png`` for render idx → ``out_{idx+1}``
    (1-indexed), resized to the render size with LANCZOS, binarized.
    Returns None when the directory is absent (e.g. non-SPIN data)."""
    mask_dir = os.path.join(source_path, "images_4", "test_label")
    if not os.path.isdir(mask_dir):
        return None
    from PIL import Image
    masks = []
    for idx in range(n):
        p = os.path.join(mask_dir, "out_%05d.png" % (1 + idx))
        if not os.path.exists(p):
            return None
        m = Image.open(p)
        if size is not None:
            m = m.resize(size, Image.LANCZOS)
        arr = np.asarray(m, np.float32)
        if arr.ndim == 3:
            arr = arr[..., 0]
        masks.append((arr > 0).astype(np.float32)[None])   # (1,H,W)
    return masks


def _find_method_dirs(model_path: str, split: str) -> List[str]:
    base = os.path.join(model_path, split)
    if os.path.isdir(os.path.join(base, "renders")):
        return [base]
    out = []
    if os.path.isdir(base):
        for method in sorted(os.listdir(base)):
            if os.path.isdir(os.path.join(base, method, "renders")):
                out.append(os.path.join(base, method))
    return out


def evaluate_dir(method_dir: str, source_path: str = "",
                 method: str = "ours") -> dict:
    """renders/ + gt/ (+ test_label masks) → results/per_view JSONs."""
    from gscream_tpu.train.evaluate import evaluate_pairs, write_results
    rdir = os.path.join(method_dir, "renders")
    gdir = os.path.join(method_dir, "gt")
    names = sorted(f for f in os.listdir(rdir) if f.endswith(".png"))
    renders = [_read_image(os.path.join(rdir, f)) for f in names]
    gts = [_read_image(os.path.join(gdir, f)) for f in names]
    masks = None
    if source_path and renders:
        h, w = renders[0].shape[1:]
        masks = load_test_label_masks(source_path, len(renders), (w, h))
    results = evaluate_pairs(renders, gts, masks, names=names)
    write_results(method_dir, results, method=method)
    return results


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", required=True)
    p.add_argument("--source_path", default="",
                   help="scene dir holding images_4/test_label masks")
    p.add_argument("--split", default="test")
    p.add_argument("--method", default="ours")
    args = p.parse_args()
    dirs = _find_method_dirs(args.model_path, args.split)
    if not dirs:
        raise SystemExit(f"no {args.split}/renders under {args.model_path}")
    for d in dirs:
        r = evaluate_dir(d, args.source_path, args.method)
        print(d, json.dumps(r["summary"]))


if __name__ == "__main__":
    main()
