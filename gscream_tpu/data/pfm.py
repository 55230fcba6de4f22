"""MiDaS ``.pfm`` monocular-depth loader.

The reference's ``load_midas`` path reads
``midas_output/<name>-dpt_beit_large_512.pfm`` via ``read_pfm``
(/root/reference/scene/dataset_readers.py:58-86, used at :192-197) as the
alternative to the Marigold ``.npy`` depths.  Semantics reproduced
exactly, including two deliberate deviations from the PFM spec that the
reference makes (and trained with):

* samples are always decoded little-endian, regardless of the scale
  sign (the spec says a negative scale *means* little-endian);
* the image is multiplied by the SIGNED scale (the spec multiplies by
  ``|scale|``) — MiDaS writes scale -1, so values flip sign, and the
  percentile normalization below maps them to [0, 1] anyway.

``process=True`` (the reference default) clamps to the [0.01, 99.9]
percentiles, shifts to zero minimum and normalizes by the max.
"""
from __future__ import annotations

import numpy as np


def read_pfm(file_path: str, process: bool = True) -> np.ndarray:
    """PFM grayscale file → (H, W) float32, row 0 at the top."""
    with open(file_path, "rb") as f:
        header = f.readline().rstrip().decode("utf-8")
        if header == "Pf":
            channels = 1
        elif header == "PF":
            channels = 3
        else:
            raise ValueError(f"not a PFM file (header {header!r})")
        width, height = map(int, f.readline().rstrip().split())
        scale = float(f.readline().rstrip())
        data = np.fromfile(f, "<f")   # ref: little-endian unconditionally

    if channels != 1:
        raise ValueError("MiDaS depths are single-channel (Pf)")
    img = data.reshape(height, width)
    # PFM stores bottom row first; the ref flips then applies the SIGNED
    # scale (dataset_readers.py:77)
    img = np.flipud(img) * scale

    if process:
        lo, hi = np.percentile(img, 0.01), np.percentile(img, 99.9)
        img = np.clip(img, lo, hi)
        img = img - lo
        img = img / img.max()
    return np.ascontiguousarray(img.astype(np.float32))


def write_pfm(file_path: str, img: np.ndarray, scale: float = -1.0) -> None:
    """Inverse of :func:`read_pfm`'s raw decode (testing/tooling)."""
    img = np.asarray(img, np.float32)
    with open(file_path, "wb") as f:
        f.write(b"Pf\n")
        f.write(f"{img.shape[1]} {img.shape[0]}\n".encode())
        f.write(f"{scale}\n".encode())
        np.flipud(img).astype("<f").tofile(f)
