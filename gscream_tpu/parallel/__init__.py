"""SPMD parallelism: device mesh, tile-sharded rasterizer, DP training."""
