"""Component-level timing of the render pipeline on the current backend."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gscream_tpu.cameras import make_camera
from gscream_tpu.model.scaffold import ScaffoldConfig, decode, init_scaffold
from gscream_tpu.ops.projection import preprocess
from gscream_tpu.ops.rasterize_tiled import (
    TILE_H, TILE_W, pack_instance_data, rasterize_tiled, _run_forward)


def timeit(f, *args, iters=5, label=""):
    from gscream_tpu.utils.trace import maybe_trace
    out = f(*args)
    jax.block_until_ready(out)
    with maybe_trace(label.split()[0] if label else "timeit"):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
    print(f"{label:32s} {dt*1e3:9.2f} ms")
    return out


def main():
    width, height = 1297, 840
    rng = np.random.default_rng(0)
    cfg = ScaffoldConfig(feat_dim=32, n_offsets=10, voxel_size=0.01,
                         capacity=1 << 15)
    pts = rng.normal(0, 0.6, (30000, 3)).astype(np.float32)
    scaffold = init_scaffold(jax.random.PRNGKey(0), pts, cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    scaffold = scaffold._replace(params=scaffold.params._replace(
        feat=0.3 * jax.random.normal(ks[0], scaffold.params.feat.shape),
        offset=0.5 * jax.random.normal(ks[1], scaffold.params.offset.shape)))
    cam = make_camera(np.eye(3), np.array([0.0, 0.0, 3.0]), 1.0,
                      1.0 * height / width, width, height)
    interpret = jax.default_backend() != "tpu"

    dec_fn = jax.jit(lambda p, m: decode(
        scaffold._replace(params=p, mlps=m), cam.cam_center, None, cfg))
    dec = timeit(dec_fn, scaffold.params, scaffold.mlps, label="decode")

    pre_fn = jax.jit(lambda d: preprocess(
        d.xyz, d.scale, d.rot, cam.w2c, cam.full_proj, width, height,
        cam.tan_fovx, cam.tan_fovy, tile_w=TILE_W, tile_h=TILE_H,
        active_mask=d.active, opacity=d.opacity))
    splats = timeit(pre_fn, dec, label="preprocess (tight cull)")

    # bench-identical capacity: fitted tier over the (row-tight-aware)
    # emission demand, exactly as bench.py::count_instances fits it
    from gscream_tpu.ops.binning import ROW_RATIO, emission_counts
    from gscream_tpu.train.loop import capacity_tier
    rw = splats.rect_max[:, 0] - splats.rect_min[:, 0]
    rh = splats.rect_max[:, 1] - splats.rect_min[:, 1]
    ok = (splats.radius > 0) & (rw > 0)
    n_rows = int(jnp.sum(jnp.where(ok, rh, 0)))
    row_cap = max(-(-max(n_rows, 1) // 8) * 8, 8)
    n_emit = int(jax.jit(lambda s: emission_counts(
        s, TILE_W, TILE_H, row_cap)[0])(splats))
    capacity = max(capacity_tier(max(n_emit, ROW_RATIO * n_rows)), 1 << 14)
    print(f"emitted {n_emit}  rows {n_rows}  capacity tier {capacity}")

    from gscream_tpu.ops.rasterize_tiled import build_binning
    emit = os.environ.get("GSCREAM_EMIT", "xla")
    bin_fn = jax.jit(lambda s, d: build_binning(
        s, d.opacity, d.color, d.uncertainty, capacity, width, height,
        interpret=interpret))
    binning = timeit(bin_fn, splats, dec, label=f"binning (emit={emit})")
    print("instances:", int(binning.num_instances))

    gx = -(-width // TILE_W)
    pack_fn = jax.jit(lambda s, d, b: pack_instance_data(
        s.mean2d, s.conic, d.opacity, d.color, s.depth, d.uncertainty,
        b, gx))
    inst = timeit(pack_fn, splats, dec, binning, label="pack_instance_data")

    n_tiles = gx * (-(-height // TILE_H))
    fwd_fn = jax.jit(lambda i, ts, tc: _run_forward(i, ts, tc, n_tiles,
                                                    interpret, gx))
    timeit(fwd_fn, inst, binning.tile_start, binning.tile_count,
           label="pallas forward kernel")

    full_fn = jax.jit(lambda s, d, b: rasterize_tiled(
        s.mean2d, s.conic, d.opacity, d.color, s.depth, d.uncertainty,
        b, jnp.zeros(3), width, height, interpret))
    timeit(full_fn, splats, dec, binning, label="rasterize fwd (full)")

    def loss(s, d, b):
        out = rasterize_tiled(s.mean2d, s.conic, d.opacity, d.color,
                              s.depth, d.uncertainty, b, jnp.zeros(3),
                              width, height, interpret)
        return jnp.mean(out.color) + jnp.mean(out.depth)

    g_fn = jax.jit(jax.grad(
        lambda m2, con, op, col, dep, unc, b: (
            lambda o: jnp.mean(o.color) + jnp.mean(o.depth))(
            rasterize_tiled(m2, con, op, col, dep, unc, b, jnp.zeros(3),
                            width, height, interpret)),
        argnums=(0, 1, 2, 3, 4, 5)))
    timeit(g_fn, splats.mean2d, splats.conic, dec.opacity, dec.color,
           splats.depth, dec.uncertainty, binning,
           label="rasterize fwd+bwd")


if __name__ == "__main__" and not os.environ.get("BWD_PARTS"):
    main()


def bwd_parts():
    """Micro-profile the backward side."""
    import jax
    import jax.numpy as jnp
    width, height = 1297, 840
    grad_fn, args = None, None
    # rebuild workload pieces
    main_args = {}
    rngstate = {}
    # reuse main() setup inline
    import numpy as np
    from gscream_tpu.cameras import make_camera
    from gscream_tpu.model.scaffold import ScaffoldConfig, decode, \
        init_scaffold
    from gscream_tpu.train.loop import capacity_tier  # noqa: F401 (reimported below)
    from gscream_tpu.ops.projection import preprocess
    from gscream_tpu.ops.rasterize_tiled import (
        ILANES, TILE_H, TILE_W, _reorder_mode, _run_backward,
        image_to_tiles, pack_instance_data, reduce_grads_cm,
        segment_reduce_grads)
    rng = np.random.default_rng(0)
    cfg = ScaffoldConfig(feat_dim=32, n_offsets=10, voxel_size=0.01,
                         capacity=1 << 15)
    pts = rng.normal(0, 0.6, (30000, 3)).astype(np.float32)
    scaffold = init_scaffold(jax.random.PRNGKey(0), pts, cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    scaffold = scaffold._replace(params=scaffold.params._replace(
        feat=0.3 * jax.random.normal(ks[0], scaffold.params.feat.shape),
        offset=0.5 * jax.random.normal(ks[1], scaffold.params.offset.shape)))
    cam = make_camera(np.eye(3), np.array([0.0, 0.0, 3.0]), 1.0,
                      1.0 * height / width, width, height)
    interpret = jax.default_backend() != "tpu"
    dec = decode(scaffold, cam.cam_center, None, cfg)
    splats = preprocess(dec.xyz, dec.scale, dec.rot, cam.w2c, cam.full_proj,
                        width, height, cam.tan_fovx, cam.tan_fovy,
                        tile_w=TILE_W, tile_h=TILE_H, active_mask=dec.active,
                        opacity=dec.opacity)
    from gscream_tpu.train.loop import capacity_tier
    rw = splats.rect_max[:, 0] - splats.rect_min[:, 0]
    rh = splats.rect_max[:, 1] - splats.rect_min[:, 1]
    n_emit = int(jnp.sum(jnp.where(splats.radius > 0, rw * rh, 0)))
    capacity = max(capacity_tier(n_emit), 1 << 14)
    print("emitted", n_emit, "capacity tier", capacity)
    from gscream_tpu.ops.rasterize_tiled import build_binning
    binning = build_binning(splats, dec.opacity, dec.color,
                            dec.uncertainty, capacity, width, height,
                            interpret=interpret)
    gx = -(-width // TILE_W)
    n_tiles = gx * (-(-height // TILE_H))
    inst = pack_instance_data(splats.mean2d, splats.conic, dec.opacity,
                              dec.color, splats.depth, dec.uncertainty,
                              binning, gx)
    pix = jnp.ones((8, height, width), jnp.float32)
    pt_fn = jax.jit(lambda p: image_to_tiles(p, width, height))
    pix_tiles = timeit(pt_fn, pix, label="image_to_tiles")
    bk_fn = jax.jit(lambda i, p, ts, tc: _run_backward(
        i, p, ts, tc, n_tiles, interpret, gx))
    raw = timeit(bk_fn, inst, pix_tiles, binning.tile_start,
                 binning.tile_count, label="pallas backward kernel")
    n_g = splats.mean2d.shape[0]
    cap = binning.gauss_id.shape[0]
    if _reorder_mode() == "cm":
        seg_fn = jax.jit(lambda r, b: reduce_grads_cm(
            r, b, n_g, interpret))
    else:
        seg_fn = jax.jit(lambda r, b: segment_reduce_grads(
            r.reshape(-1, ILANES)[:cap], b, n_g, interpret))
    timeit(seg_fn, raw, binning, label="segment reduce")


if __name__ == "__main__" and os.environ.get("BWD_PARTS"):
    bwd_parts()
