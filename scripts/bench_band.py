"""Band-path overhead bench: sharded (mesh 1x1) vs direct rasterizer.

VERDICT r1 item 4: the band-sharded path needs a performance story on real
hardware.  One chip cannot exercise >1 band, but it can measure what the
``shard_map`` band machinery costs over the plain path at the bench shape
(1297x840, ~2M instances): band geometry padding, the dynamic tile-range
slices, band-local loss + halo exchange, and the shard_map transpose.
Multi-band *correctness* is covered by tests/test_sharded.py and the
8-virtual-device dryrun (MULTICHIP_r02); multi-band *scaling* needs real
chips the environment does not have.

Writes one JSON line like bench.py; run manually, recorded in BASELINE.md.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gscream_tpu.precision import enable_compile_cache, ensure_fp32_matmuls

enable_compile_cache()
ensure_fp32_matmuls()

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *a, iters=5):
    o = f(*a)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters


def main():
    from bench import build_workload
    from gscream_tpu.cameras import make_camera
    from gscream_tpu.config import OptimConfig
    from gscream_tpu.model.scaffold import ScaffoldConfig, init_scaffold
    from gscream_tpu.parallel.mesh import make_mesh
    from gscream_tpu.parallel.shard import make_sharded_train_step
    from gscream_tpu.train.state import init_train_state

    width, height = 1297, 840
    grad_fn, args = build_workload(width, height)
    (_, n_inst), _ = grad_fn(*args)
    n_inst = int(n_inst)
    t_direct = timeit(grad_fn, *args, iters=10)

    # band path: full sharded train step over a 1x1 mesh, same scene
    cfg = ScaffoldConfig(feat_dim=32, n_offsets=10, voxel_size=0.01,
                         capacity=1 << 15)
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 0.6, (30000, 3)).astype(np.float32)
    scaffold = init_scaffold(jax.random.PRNGKey(0), pts, cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    scaffold = scaffold._replace(params=scaffold.params._replace(
        feat=0.3 * jax.random.normal(ks[0], scaffold.params.feat.shape),
        offset=0.5 * jax.random.normal(ks[1],
                                       scaffold.params.offset.shape)))
    ts = init_train_state(scaffold, cfg, jax.random.PRNGKey(0))
    cam = make_camera(np.eye(3), np.array([0.0, 0.0, 3.0]), 1.0,
                      1.0 * height / width, width, height)
    mesh = make_mesh(data=1, tiles=1)
    interpret = jax.default_backend() != "tpu"
    sstep = make_sharded_train_step(mesh, cfg, OptimConfig(),
                                    capacity=1 << 21, width=width,
                                    height=height, interpret=interpret)
    img = jnp.zeros((3, height, width), jnp.float32)
    msk = jnp.zeros((1, height, width), jnp.float32)
    batch = (
        jnp.stack([cam.w2c]), jnp.stack([cam.full_proj]),
        jnp.stack([cam.cam_center]),
        jnp.stack([jnp.float32(cam.tan_fovx)]),
        jnp.stack([jnp.float32(cam.tan_fovy)]),
        jnp.stack([img]), jnp.stack([msk]), jnp.stack([msk]),
        jnp.zeros((1,), bool),
        jnp.zeros((1, height, width), jnp.float32),
        jnp.zeros((1, 4), jnp.int32),
        jnp.zeros((1,), jnp.float32),
    )

    def run_band(ts, batch):
        _, aux = sstep(ts, batch)
        return aux.loss

    t_band = timeit(run_band, ts, batch, iters=5)

    rays = width * height
    print(json.dumps({
        "metric": "band_path_overhead_1297x840",
        "value": t_band / t_direct,
        "unit": "x (sharded 1x1-mesh full train step / direct fwd+bwd)",
        "direct_ms": t_direct * 1e3,
        "band_ms": t_band * 1e3,
        "direct_rays_s": rays / t_direct,
        "band_rays_s": rays / t_band,
        "instances": n_inst,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
