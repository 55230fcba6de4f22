"""gscream_tpu — a TPU-native differentiable Gaussian-splatting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of GScream
(ECCV 2024, reference: /root/reference) — Scaffold-GS anchor-based 3D
Gaussian splatting with depth-guided geometry and cross-attention feature
consistency for object removal — built TPU-first:

* the CUDA tile rasterizer (reference
  ``submodules/diff-gaussian-rasterization``) becomes a Pallas kernel whose
  front-to-back alpha blend is expressed as a log-space prefix scan plus an
  MXU matmul accumulation (no atomics, deterministic gradients);
* ``simple-knn`` becomes a pure-JAX blocked KNN;
* the mutating ``GaussianModel`` becomes a functional train state with
  fixed-capacity anchor arrays and alive masks (static shapes for XLA);
* single-GPU training becomes an SPMD ``shard_map`` program over a
  ``jax.sharding.Mesh`` with (data, tile) axes.

Subpackages
-----------
- ``gscream_tpu.cameras``   camera model + projection matrices
- ``gscream_tpu.config``    typed config tree (mirrors reference arguments/)
- ``gscream_tpu.data``      COLMAP / SPIN-NeRF readers, spiral paths, synthetic scenes
- ``gscream_tpu.ops``       projection, rasterization (oracle + Pallas), KNN, SSIM, losses
- ``gscream_tpu.model``     Scaffold-GS anchor state, MLP decoders, densification
- ``gscream_tpu.train``     train state, jitted step, loop, eval harness
- ``gscream_tpu.parallel``  mesh / sharding layer
- ``gscream_tpu.metrics``   PSNR / SSIM / LPIPS evaluation
"""

__version__ = "0.1.0"
