"""K-nearest-neighbor mean squared distance (pure JAX).

TPU-native replacement for the ``simple-knn`` CUDA extension
(``submodules/simple-knn/simple_knn.cu:185-221``, entry ``spatial.cu:15-26``
``distCUDA2``): per point, the mean of the *squared* distances to its 3
nearest neighbors (simple_knn.cu:180-182 averages the three best squared
distances).  Used for the initial anchor log-scale and the voxel-size
auto-estimate (gaussian_model.py:305-330).

The CUDA version approximates via Morton-sorted boxes; on TPU a blocked
exact O(N²) sweep is both simpler and fast (N≈10⁵ anchors → 10¹⁰ FLOPs ≈
milliseconds on the MXU), and exact beats the reference's approximation.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k", "block"))
def mean_knn_sq_dist(points: jnp.ndarray, k: int = 3,
                     block: int = 1024) -> jnp.ndarray:
    """(N,3) → (N,) mean squared distance to the k nearest neighbors."""
    n = points.shape[0]
    pad = (-n) % block
    pts = jnp.pad(points, ((0, pad), (0, 0)), constant_values=1e9)
    nb = pts.shape[0] // block
    sq = jnp.sum(pts * pts, axis=1)                      # (Np,)

    def body(_, blk):
        rows, row_sq, row_idx = blk                      # (block,3),(block,),(block,)
        # squared distances via the expansion ‖a-b‖² = ‖a‖²+‖b‖²-2a·b
        d = (row_sq[:, None] + sq[None, :]
             - 2.0 * rows @ pts.T)                       # (block, Np)
        d = jnp.maximum(d, 0.0)
        # exclude self-match by index (not by zero distance — duplicates
        # of a point are genuine neighbors, as in the reference)
        d = jnp.where(row_idx[:, None] == jnp.arange(pts.shape[0])[None, :],
                      jnp.inf, d)
        neg_top, _ = jax.lax.top_k(-d, k)
        return None, jnp.mean(-neg_top, axis=1)

    idx = jnp.arange(pts.shape[0])
    _, out = jax.lax.scan(
        body, None,
        (pts.reshape(nb, block, 3), sq.reshape(nb, block),
         idx.reshape(nb, block)))
    return out.reshape(-1)[:n]


def estimate_voxel_size(points: jnp.ndarray) -> jnp.ndarray:
    """Median mean-3NN distance — the reference's auto voxel size
    (gaussian_model.py:305-312, ``kthvalue(N/2)`` of ``distCUDA2``)."""
    d = mean_knn_sq_dist(points)
    n = d.shape[0]
    return jnp.sort(d)[(n // 2) - 1 if n % 2 == 0 else n // 2]
