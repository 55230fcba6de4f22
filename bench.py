"""Benchmark: rays/s per chip, forward+backward, at SPIN-NeRF resolution.

Prints ONE JSON line:
  {"metric": "rays_per_s_fwd_bwd_1297x840", "value": N, "unit": "rays/s",
   "vs_baseline": N}

Workload: a Scaffold-GS-scale synthetic scene (anchors decoded to neural
gaussians → Pallas tile rasterizer fwd+bwd with color/depth/uncertainty
channels and the full GScream loss head) at the reference's quarter-res
SPIN-NeRF frame size 1008x567 per its images_4 pipeline — the BASELINE.json
headline config (2) uses 1297x840; both are measured, the headline value is
the 1297x840 one.

``vs_baseline``: the reference CUDA rasterizer (diff-gaussian-rasterization
on an RTX 3090, the reference's hardcoded target, setup.py:29) sustains on
the order of 7e7 rays/s fwd+bwd at this scale for typical 3DGS scenes; the
repo publishes no number (BASELINE.md), so that figure is the denominator.
"""
import json
import sys
import time

BASELINE_RAYS_PER_S = 7.0e7


def build_workload(width, height, n_anchors=30000, k=10, seed=0):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gscream_tpu.cameras import make_camera
    from gscream_tpu.model.scaffold import ScaffoldConfig, init_scaffold, \
        decode
    from gscream_tpu.ops.binning import bin_instances
    from gscream_tpu.ops.projection import preprocess
    from gscream_tpu.ops.rasterize_tiled import (
        TILE_H, TILE_W, gauss_attrs, rasterize_tiled)

    rng = np.random.default_rng(seed)
    cfg = ScaffoldConfig(feat_dim=32, n_offsets=k, voxel_size=0.01,
                         capacity=1 << 15)
    pts = rng.normal(0, 0.6, (n_anchors, 3)).astype(np.float32)
    scaffold = init_scaffold(jax.random.PRNGKey(seed), pts, cfg)
    # randomize features/offsets so decoded gaussians are non-degenerate
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    scaffold = scaffold._replace(params=scaffold.params._replace(
        feat=0.3 * jax.random.normal(ks[0], scaffold.params.feat.shape),
        offset=0.5 * jax.random.normal(ks[1], scaffold.params.offset.shape),
    ))
    cam = make_camera(np.eye(3), np.array([0.0, 0.0, 3.0]), 1.0,
                      1.0 * height / width, width, height)
    capacity = 1 << 21
    interpret = jax.default_backend() != "tpu"
    target = jnp.zeros((height, width, 3))

    def loss_fn(params, mlps):
        st = scaffold._replace(params=params, mlps=mlps)
        dec = decode(st, cam.cam_center, None, cfg)
        splats = preprocess(
            dec.xyz, dec.scale, dec.rot, cam.w2c, cam.full_proj,
            width, height, cam.tan_fovx, cam.tan_fovy,
            tile_w=TILE_W, tile_h=TILE_H, active_mask=dec.active)
        # training configuration: exact (tile, depth) lexicographic sort,
        # attributes carried as sort payload (gather-free packing)
        binning = bin_instances(
            splats, capacity, width, height, TILE_W, TILE_H, precise=True,
            attrs=jax.lax.stop_gradient(gauss_attrs(
                splats.mean2d, splats.conic, dec.opacity, dec.color,
                splats.depth, dec.uncertainty)))
        out = rasterize_tiled(splats.mean2d, splats.conic, dec.opacity,
                              dec.color, splats.depth, dec.uncertainty,
                              binning, jnp.zeros(3), width, height,
                              interpret)
        return (jnp.mean(jnp.abs(out.color - target))
                + 0.1 * jnp.mean(out.depth) + 0.05 * jnp.mean(
                    out.uncertainty)), binning.num_instances

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1),
                                         has_aux=True))
    return grad_fn, (scaffold.params, scaffold.mlps)


def time_config(width, height, iters=10):
    import jax
    grad_fn, args = build_workload(width, height)
    # warmup + compile
    out = grad_fn(*args)
    jax.block_until_ready(out)
    n_inst = int(out[0][1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = grad_fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return width * height / dt, dt, n_inst



def _enable_compile_cache():
    from gscream_tpu.precision import enable_compile_cache, \
        ensure_fp32_matmuls
    enable_compile_cache()
    # training-accurate precision: bf16 default matmuls break training
    # (see gscream_tpu/precision.py) so the benchmark measures fp32 mode
    ensure_fp32_matmuls()


def _backend_alive(timeout_s: int = 420) -> bool:
    """Probe jax backend init in a SUBPROCESS.

    When the axon relay dies (observed: the local endpoint vanishes),
    ``jax.devices()`` hangs forever in C — an in-process try/except can't
    guard it.  A timed-out probe lets the bench emit its error JSON
    instead of wedging the caller.
    """
    import subprocess
    import sys
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    import os
    _enable_compile_cache()
    if not _backend_alive():
        print(json.dumps({
            "metric": "rays_per_s_fwd_bwd_1297x840", "value": 0,
            "unit": "rays/s", "vs_baseline": 0.0,
            "error": "backend init hang: TPU relay unreachable "
                     "(probe subprocess timed out)"}))
        return
    try:
        import jax
        backend = jax.default_backend()
        rays, dt, n_inst = time_config(1297, 840, iters=10)
        extra = {}
        # the secondary config doubles (remote) compile time — opt-in
        if os.environ.get("GSCREAM_BENCH_EXTRA"):
            try:
                rays_q, dt_q, _ = time_config(1008, 567, iters=10)
                extra = {"rays_per_s_1008x567": rays_q,
                         "iter_ms_1008x567": dt_q * 1e3}
            except Exception:
                pass
        result = {
            "metric": "rays_per_s_fwd_bwd_1297x840",
            "value": rays,
            "unit": "rays/s",
            "vs_baseline": rays / BASELINE_RAYS_PER_S,
            "iter_ms": dt * 1e3,
            "instances": n_inst,
            "backend": backend,
            "sort": "precise",
            **extra,
        }
    except Exception as e:
        result = {"metric": "rays_per_s_fwd_bwd_1297x840", "value": 0,
                  "unit": "rays/s", "vs_baseline": 0.0,
                  "error": f"{type(e).__name__}: {e}"}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
