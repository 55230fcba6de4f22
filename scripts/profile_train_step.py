"""Wall-clock + trace profile of the REAL train_step at flagship shapes.

The bench measures the raster fwd+bwd in isolation; the flagship logs
~4.3 it/s (~232 ms/step at 1008×567, ~650 k trained instances) — far
above the raster share.  This script loads the trained model, builds a
TrainState, and times the full jitted ``train_step`` (phase-1 and
phase-2 variants) plus its pieces, so the loss-head / optimizer / stats
overhead is attributed instead of guessed.  `GSCREAM_TRACE=<dir>`
captures an XLA trace of the timed loop (VERDICT r3 item 7 machinery).

Usage:  python scripts/profile_train_step.py [model_dir] [iters]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gscream_tpu.precision import enable_compile_cache, ensure_fp32_matmuls


def main():
    enable_compile_cache()
    ensure_fp32_matmuls()
    model = sys.argv[1] if len(sys.argv) > 1 else "output/synth_spin30k"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from gscream_tpu.cameras import make_camera_from_c2w
    from gscream_tpu.config import OptimConfig
    from gscream_tpu.model.io import load_trained_scaffold
    from gscream_tpu.ops.binning import ROW_RATIO
    from gscream_tpu.train.loop import capacity_tier
    from gscream_tpu.train.state import init_train_state
    from gscream_tpu.train.step import train_step
    from gscream_tpu.utils.trace import maybe_trace

    opt = OptimConfig()
    if os.path.isdir(os.path.join(model, "point_cloud")):
        scaffold, cfg, it0 = load_trained_scaffold(model)
        with open(os.path.join(model, "cameras.json")) as f:
            cams = json.load(f)
        c = cams[len(cams) // 2]
        c2w = np.eye(4)
        c2w[:3, :3] = np.asarray(c["rotation"], np.float64)
        c2w[:3, 3] = np.asarray(c["position"], np.float64)
        w, h = int(c["width"]), int(c["height"])
        fovx = 2.0 * np.arctan(w / (2.0 * c["fx"]))
        fovy = 2.0 * np.arctan(h / (2.0 * c["fy"]))
        cam = make_camera_from_c2w(c2w, fovx, fovy, w, h)
        run_cfg = os.path.join(model, "cfg.json")
        if os.path.exists(run_cfg):
            from gscream_tpu.config import load_config
            opt = load_config(run_cfg).optim
    else:
        # no trained model on disk: the synthetic bench scene at the
        # flagship resolution (same shapes as a flagship run's start)
        import bench as _bb
        w, h = 1008, 567
        cfg, scaffold, cam = _bb._bench_scene(w, h, 30000, 10, 0)
        it0 = 0
        print(f"(no trained model at {model}; synthetic scene)")

    interpret = jax.default_backend() != "tpu"
    ts = init_train_state(scaffold, cfg, jax.random.PRNGKey(0))

    # emission demand at this trained view → the tier training would use
    import bench as _b
    n_inst, n_rows = _b._count_instances(cfg, scaffold, cam, w, h)
    capacity = max(capacity_tier(max(n_inst, ROW_RATIO * n_rows)), 1 << 14)
    print(f"model iter {it0}  {w}x{h}  anchors {scaffold.params.anchor.shape[0]}"
          f"  instances {n_inst}  tier {capacity}")

    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.random((3, h, w), np.float32))
    mask = jnp.asarray((rng.random((1, h, w)) > 0.8).astype(np.float32))
    depth = jnp.asarray(rng.random((1, h, w), np.float32))
    fg_box = jnp.zeros((h, w), jnp.float32)
    cross_box = jnp.array([10, 10, 266, 266], jnp.int32)

    def run(label, **kw):
        args = (ts, cam, gt, mask, depth, fg_box, cross_box)
        kwargs = dict(cfg=cfg, opt=opt, is_ref=False, capacity=capacity,
                      interpret=interpret, width=w, height=h,
                      white_bg=False, spatial_lr_scale=1.0,
                      precise_sort=True, **kw)
        out = train_step(*args, **kwargs)
        jax.block_until_ready(out)
        with maybe_trace(label):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = train_step(*args, **kwargs)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / iters
        print(f"{label:34s} {dt*1e3:9.2f} ms  ({1.0/dt:.2f} it/s)")
        return dt

    run("train_step phase1",
        use_crossattn=False, accumulate=True, feat_frozen=False)
    run("train_step phase1 no-stats",
        use_crossattn=False, accumulate=False, feat_frozen=False)
    run("train_step phase2 crossattn",
        use_crossattn=True, accumulate=False, feat_frozen=True)

    # loss head alone at these shapes (rendered image -> loss, fwd only)
    from gscream_tpu.train.step import loss_terms
    from gscream_tpu.ops.rasterize_tiled import TiledOut

    out_fake = TiledOut(
        color=jnp.asarray(rng.random((h, w, 3), np.float32)),
        depth=jnp.asarray(rng.random((h, w), np.float32)),
        uncertainty=jnp.zeros((h, w), jnp.float32),
        final_t=jnp.zeros((h, w), jnp.float32))

    for is_ref in (False, True):
        f = jax.jit(lambda o: loss_terms(o, gt, mask, depth, fg_box, opt,
                                         is_ref)[0])
        g = jax.jit(jax.grad(lambda o: loss_terms(
            o, gt, mask, depth, fg_box, opt, is_ref)[0]))
        for fn, nm in ((f, "fwd"), (g, "fwd+bwd")):
            out = fn(out_fake)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(out_fake)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / iters
            print(f"loss_terms is_ref={is_ref} {nm:10s} {dt*1e3:9.2f} ms")


if __name__ == "__main__":
    main()
