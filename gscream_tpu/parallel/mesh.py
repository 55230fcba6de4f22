"""Device mesh construction.

The reference is strictly single-GPU (SURVEY.md §2.3 — no distributed code
anywhere); the TPU build adds a two-axis mesh:

* ``data``  — views (cameras) per step, gradients all-reduced;
* ``tiles`` — image tile rows of one view, the sequence-parallel analogue
  for splatting (SURVEY.md §5 "long-context" note): tiles are independent
  workloads; per-gaussian gradients are partial-summed locally and
  all-reduced across the axis.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
TILE_AXIS = "tiles"


def make_mesh(data: int = 1, tiles: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = data * tiles
    if need > len(devices):
        raise ValueError(f"mesh {data}x{tiles} needs {need} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(data, tiles)
    return Mesh(arr, (DATA_AXIS, TILE_AXIS))


def auto_mesh(n_devices: Optional[int] = None) -> Mesh:
    """Factor available devices into (data, tiles), favoring tiles."""
    n = n_devices if n_devices is not None else len(jax.devices())
    tiles = 1
    for t in (8, 4, 2, 1):
        if n % t == 0:
            tiles = t
            break
    return make_mesh(data=n // tiles, tiles=tiles)
