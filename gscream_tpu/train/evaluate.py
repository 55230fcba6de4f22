"""Evaluation harness: PSNR / SSIM / LPIPS, full + masked, → results.json.

Port of the reference ``evaluate()`` (train.py:905-992): renders of the
test split are compared to ground truth with PSNR, the kornia-style
``my_ssim`` and VGG-LPIPS, plus the *masked* variants restricted to the
object-removal region (``test_label`` masks resized to the render size,
train.py:899-901).  Writes ``results.json`` and ``per_view.json`` in the
reference's format.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..metrics.lpips import lpips, lpips_available
from ..ops.losses import psnr
from ..ops.ssim import my_ssim


def evaluate_pairs(renders: List[np.ndarray], gts: List[np.ndarray],
                   masks: Optional[List[np.ndarray]] = None,
                   names: Optional[List[str]] = None) -> Dict:
    """renders/gts: (3,H,W) float arrays in [0,1]; masks: (1,H,W) or None."""
    have_lpips = lpips_available()
    per_view: Dict[str, Dict[str, float]] = {}
    agg: Dict[str, List[float]] = {}

    for i, (r, g) in enumerate(zip(renders, gts)):
        name = names[i] if names else f"{i:05d}"
        r_j, g_j = jnp.asarray(r), jnp.asarray(g)
        row = {
            "PSNR": float(psnr(r_j, g_j)),
            "SSIM": float(my_ssim(r_j, g_j)),
        }
        if have_lpips:
            row["LPIPS"] = float(lpips(r_j, g_j))
        if masks is not None and masks[i] is not None:
            m = jnp.asarray(masks[i])
            row["PSNR_masked"] = float(psnr(r_j, g_j, m))
            row["SSIM_masked"] = float(my_ssim(r_j, g_j, m))
            if have_lpips:
                row["LPIPS_masked"] = float(lpips(r_j, g_j, m[0]))
        per_view[name] = row
        for k, v in row.items():
            agg.setdefault(k, []).append(v)

    summary = {k: float(np.mean(v)) for k, v in agg.items()}
    if not have_lpips:
        summary["LPIPS"] = None   # reported as unavailable, never wrong
    return {"summary": summary, "per_view": per_view}


def write_results(out_dir: str, results: Dict, method: str = "ours") -> None:
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "results.json"), "w") as f:
        json.dump({method: results["summary"]}, f, indent=2)
    with open(os.path.join(out_dir, "per_view.json"), "w") as f:
        json.dump({method: results["per_view"]}, f, indent=2)
