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
import os
import sys
import time

BASELINE_RAYS_PER_S = 7.0e7


def _bench_scene(width, height, n_anchors, k, seed):
    import jax
    import numpy as np
    from gscream_tpu.cameras import make_camera
    from gscream_tpu.model.scaffold import ScaffoldConfig, init_scaffold

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
    return cfg, scaffold, cam


def count_instances(width, height, n_anchors=30000, k=10, seed=0):
    cfg, scaffold, cam = _bench_scene(width, height, n_anchors, k, seed)
    return _count_instances(cfg, scaffold, cam, width, height)


def _count_instances(cfg, scaffold, cam, width, height):
    """(instances, rows) emission demand of a scene — tiny
    separate programs, so the big fwd+bwd graph compiles once at the
    right capacity tier (the tier training's overflow logic would settle
    at).  Row-tight aware: the first pass counts rect rows exactly
    (N-scale), the second counts the row-tight instances at a row table
    sized from the first."""
    import jax
    import jax.numpy as jnp
    from gscream_tpu.model.scaffold import decode
    from gscream_tpu.ops.binning import emission_counts
    from gscream_tpu.ops.projection import preprocess
    from gscream_tpu.ops.rasterize_tiled import TILE_H, TILE_W

    def splat(params, mlps):
        st = scaffold._replace(params=params, mlps=mlps)
        dec = decode(st, cam.cam_center, None, cfg)
        return preprocess(
            dec.xyz, dec.scale, dec.rot, cam.w2c, cam.full_proj,
            width, height, cam.tan_fovx, cam.tan_fovy,
            tile_w=TILE_W, tile_h=TILE_H, active_mask=dec.active,
            opacity=dec.opacity)

    @jax.jit
    def count_rows(params, mlps):
        s = splat(params, mlps)
        rh = s.rect_max[:, 1] - s.rect_min[:, 1]
        rw = s.rect_max[:, 0] - s.rect_min[:, 0]
        ok = (s.radius > 0) & (rw > 0)
        return jnp.sum(jnp.where(ok, rh, 0))

    n_rows = int(count_rows(scaffold.params, scaffold.mlps))
    row_cap = max(-(-max(n_rows, 1) // 8) * 8, 8)

    def count_inst(params, mlps):
        return emission_counts(splat(params, mlps), TILE_W, TILE_H,
                               row_cap)[0]

    n_inst = int(jax.jit(count_inst)(scaffold.params, scaffold.mlps))
    return n_inst, n_rows


def build_workload(width, height, n_anchors=30000, k=10, seed=0,
                   capacity=1 << 21):
    cfg, scaffold, cam = _bench_scene(width, height, n_anchors, k, seed)
    return _build_workload(cfg, scaffold, cam, width, height, capacity)


def _build_workload(cfg, scaffold, cam, width, height, capacity):
    import jax
    import jax.numpy as jnp
    from gscream_tpu.model.scaffold import decode
    from gscream_tpu.ops.projection import preprocess
    from gscream_tpu.ops.rasterize_tiled import (
        TILE_H, TILE_W, build_binning, rasterize_tiled)

    interpret = jax.default_backend() != "tpu"
    target = jnp.zeros((height, width, 3))

    def loss_fn(params, mlps):
        st = scaffold._replace(params=params, mlps=mlps)
        dec = decode(st, cam.cam_center, None, cfg)
        splats = preprocess(
            dec.xyz, dec.scale, dec.rot, cam.w2c, cam.full_proj,
            width, height, cam.tan_fovx, cam.tan_fovy,
            tile_w=TILE_W, tile_h=TILE_H, active_mask=dec.active,
            opacity=dec.opacity)
        # training configuration: exact (tile, depth) lexicographic sort;
        # GSCREAM_EMIT selects the Pallas expansion pipeline vs the XLA
        # emission build (both row-tight)
        binning = build_binning(splats, dec.opacity, dec.color,
                                dec.uncertainty, capacity, width, height,
                                interpret=interpret)
        out = rasterize_tiled(splats.mean2d, splats.conic, dec.opacity,
                              dec.color, splats.depth, dec.uncertainty,
                              binning, jnp.zeros(3), width, height,
                              interpret)
        from gscream_tpu.ops.binning import overflow_demand
        return (jnp.mean(jnp.abs(out.color - target))
                + 0.1 * jnp.mean(out.depth) + 0.05 * jnp.mean(
                    out.uncertainty)), (binning.num_instances,
                                        overflow_demand(binning))

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1),
                                         has_aux=True))
    return grad_fn, (scaffold.params, scaffold.mlps)


def time_config(width, height, iters=10):
    cfg, scaffold, cam = _bench_scene(width, height, 30000, 10, 0)
    return _time_scene(cfg, scaffold, cam, width, height, iters)


def _time_scene(cfg, scaffold, cam, width, height, iters=10):
    import jax
    # capacity tier: the tier training's overflow logic would settle at
    # (train/loop.py::capacity_tier — pow2/8 granularity)
    from gscream_tpu.ops.binning import ROW_RATIO
    from gscream_tpu.train.loop import capacity_tier
    n_emit, n_rows = _count_instances(cfg, scaffold, cam, width, height)
    capacity = max(capacity_tier(max(n_emit, ROW_RATIO * n_rows)), 1 << 14)
    grad_fn, args = _build_workload(cfg, scaffold, cam, width, height,
                                    capacity)
    # warmup + compile
    out = grad_fn(*args)
    jax.block_until_ready(out)
    n_inst, demand = (int(v) for v in out[0][1])
    assert demand <= capacity, (demand, capacity)
    from gscream_tpu.utils.trace import maybe_trace
    with maybe_trace(f"bench_{width}x{height}"):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = grad_fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
    return width * height / dt, dt, n_inst, demand, capacity


def time_trained(model_path, iters=10):
    """Trained-scene fwd+bwd rate: rays/s at a TRAINED model's opacity and
    scale distribution, where tight/row-tight culling bites harder than at
    the synthetic scene's random init (VERDICT r3: the headline likely
    understates the real training rate).  Loads
    ``<model>/point_cloud/iteration_<N>`` + cameras.json and measures the
    full loss-head fwd+bwd on a mid-list camera — the reference FPS
    protocol also runs on trained models (reference train.py:710-848)."""
    import json as _json

    import numpy as np

    from gscream_tpu.cameras import make_camera_from_c2w
    from gscream_tpu.model.io import load_trained_scaffold

    scaffold, cfg, it = load_trained_scaffold(model_path)
    with open(os.path.join(model_path, "cameras.json")) as f:
        cams = _json.load(f)
    c = cams[len(cams) // 2]
    c2w = np.eye(4)
    c2w[:3, :3] = np.asarray(c["rotation"], np.float64)
    c2w[:3, 3] = np.asarray(c["position"], np.float64)
    w, h = int(c["width"]), int(c["height"])
    fovx = 2.0 * np.arctan(w / (2.0 * c["fx"]))
    fovy = 2.0 * np.arctan(h / (2.0 * c["fy"]))
    cam = make_camera_from_c2w(c2w, fovx, fovy, w, h)
    rays, dt, n_inst, demand, cap = _time_scene(cfg, scaffold, cam, w, h,
                                                iters)
    return {"rays_per_s": rays, "iter_ms": dt * 1e3, "width": w,
            "height": h, "instances": n_inst, "capacity": cap,
            "iteration": it, "model_path": model_path}



def _enable_compile_cache():
    from gscream_tpu.precision import enable_compile_cache, \
        ensure_fp32_matmuls
    enable_compile_cache()
    # training-accurate precision: bf16 default matmuls break training
    # (see gscream_tpu/precision.py) so the benchmark measures fp32 mode
    ensure_fp32_matmuls()


def _backend_alive(timeout_s: int = 300) -> bool:
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


_LAST_GOOD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".bench_last_good.json")


def _save_last_good(result: dict) -> None:
    try:
        with open(_LAST_GOOD, "w") as f:
            json.dump(result, f)
    except OSError:
        pass


def _outage_record() -> dict:
    """A relay outage must be unmistakable for a perf regression: the
    record carries ``status: infra_outage`` with null measurements, plus
    the last hardware-confirmed numbers as clearly-labelled *stale*
    context (never as this run's value)."""
    rec = {
        "metric": "rays_per_s_fwd_bwd_1297x840",
        "value": None, "unit": "rays/s", "vs_baseline": None,
        "status": "infra_outage",
        "error": "backend init hang: TPU relay unreachable "
                 "(probe subprocess timed out after retries)",
    }
    try:
        with open(_LAST_GOOD) as f:
            lg = json.load(f)
        rec["last_confirmed"] = {
            "value": lg.get("value"),
            "vs_baseline": lg.get("vs_baseline"),
            "iter_ms": lg.get("iter_ms"),
            "measured_at": lg.get("measured_at"),
        }
    except (OSError, ValueError):
        pass
    return rec


def main():
    _enable_compile_cache()
    # retry with backoff — outages observed so far are relay restarts
    # measured in minutes; three spaced probes ride out the short ones
    alive = False
    for attempt, (probe_s, wait_s) in enumerate(
            [(240, 60), (240, 120), (240, 0)]):
        if _backend_alive(probe_s):
            alive = True
            break
        if wait_s:
            print(f"# TPU backend probe {attempt + 1} timed out; retrying "
                  f"in {wait_s}s", file=sys.stderr)
            time.sleep(wait_s)
    if not alive:
        print(json.dumps(_outage_record()))
        return
    try:
        import jax
        backend = jax.default_backend()
        rays, dt, n_inst, demand, cap = time_config(1297, 840, iters=10)
        extra = {}
        # the secondary config doubles (remote) compile time — opt-in
        if os.environ.get("GSCREAM_BENCH_EXTRA"):
            try:
                rays_q, dt_q, _, _, _ = time_config(1008, 567, iters=10)
                extra = {"rays_per_s_1008x567": rays_q,
                         "iter_ms_1008x567": dt_q * 1e3}
            except Exception:
                pass
        # trained-scene figure (VERDICT r3 item 3): measured whenever a
        # trained model directory is available — tight/row-tight culling
        # bites harder at trained opacity distributions, so the random-init
        # headline understates the real training rate
        ply_dir = os.environ.get("GSCREAM_BENCH_PLY",
                                 "output/synth_spin30k")
        if os.path.isdir(os.path.join(ply_dir, "point_cloud")):
            try:
                extra["trained"] = time_trained(ply_dir, iters=10)
            except Exception as e:
                extra["trained"] = {"error": f"{type(e).__name__}: {e}"}
        result = {
            "metric": "rays_per_s_fwd_bwd_1297x840",
            "value": rays,
            "unit": "rays/s",
            "vs_baseline": rays / BASELINE_RAYS_PER_S,
            "iter_ms": dt * 1e3,
            "instances": n_inst,
            "overflow_demand": demand,
            "capacity": cap,
            "tight_cull": not os.environ.get(
                "GSCREAM_TIGHT_CULL") == "0",
            "backend": backend,
            "sort": "precise",
            **extra,
        }
        _save_last_good({**result,
                         "measured_at": time.strftime("%Y-%m-%dT%H:%M:%S")})
    except Exception as e:
        result = {"metric": "rays_per_s_fwd_bwd_1297x840", "value": None,
                  "unit": "rays/s", "vs_baseline": None,
                  "status": "error", "error": f"{type(e).__name__}: {e}"}
    print(json.dumps(result))


if __name__ == "__main__":
    # `bench.py --ply <model_dir>` pins the trained-scene figure to a
    # specific trained model directory (same as GSCREAM_BENCH_PLY)
    if "--ply" in sys.argv:
        os.environ["GSCREAM_BENCH_PLY"] = sys.argv[
            sys.argv.index("--ply") + 1]
    main()
