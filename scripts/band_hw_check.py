"""Compile + run the band-sharded kernel path on ONE real chip.

VERDICT r3 item 5: the band-sliced kernels (local tile windows, global
tile_base offsets, head-skip DMA at band boundaries — parallel/shard.py)
had only ever executed in interpret mode on CPU meshes.  This script runs
the EXACT Mosaic band path on the current backend by iterating
``_band_fwd_at``/``_band_bwd_at`` over explicit band indices (no shard_map,
so one chip suffices), asserts equality with the full-frame kernels, and
reports the per-band overhead in ms.

    python scripts/band_hw_check.py [n_bands ...]      # default: 2 4
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(bands_list):
    from gscream_tpu.precision import enable_compile_cache, \
        ensure_fp32_matmuls
    enable_compile_cache()
    ensure_fp32_matmuls()

    import bench
    from gscream_tpu.model.scaffold import decode
    from gscream_tpu.ops.binning import ROW_RATIO, bin_instances
    from gscream_tpu.ops.projection import preprocess
    from gscream_tpu.ops.rasterize_tiled import (
        TILE_H, TILE_W, TiledOut, gauss_attrs, rasterize_tiled)
    from gscream_tpu.parallel.shard import (_band_bwd_at, _band_fwd_at,
                                            _band_geometry)
    from gscream_tpu.train.loop import capacity_tier

    width, height = (int(v) for v in os.environ.get(
        "GSCREAM_BHC_SIZE", "1297x840").split("x"))
    n_anchors = int(os.environ.get("GSCREAM_BHC_ANCHORS", "30000"))
    interpret = jax.default_backend() != "tpu"
    print(f"backend={jax.default_backend()} interpret={interpret} "
          f"{width}x{height}")

    cfg, scaffold, cam = bench._bench_scene(width, height, n_anchors, 10, 0)
    dec = decode(scaffold, cam.cam_center, None, cfg)
    splats = jax.jit(lambda d: preprocess(
        d.xyz, d.scale, d.rot, cam.w2c, cam.full_proj, width, height,
        cam.tan_fovx, cam.tan_fovy, tile_w=TILE_W, tile_h=TILE_H,
        active_mask=d.active, opacity=d.opacity))(dec)
    n_emit, n_rows = bench._count_instances(cfg, scaffold, cam, width,
                                            height)
    capacity = max(capacity_tier(max(n_emit, ROW_RATIO * n_rows)), 1 << 14)
    print(f"instances {n_emit} rows {n_rows} capacity {capacity}")
    binning = jax.jit(lambda s, d: bin_instances(
        s, capacity, width, height, TILE_W, TILE_H, precise=True,
        attrs=gauss_attrs(s.mean2d, s.conic, d.opacity, d.color, s.depth,
                          d.uncertainty)))(splats, dec)

    bg = jnp.zeros(3)
    args = (splats.mean2d, splats.conic, dec.opacity, dec.color,
            splats.depth, dec.uncertainty)

    # fixed cotangents so full and band paths see identical pixel grads
    rng = np.random.default_rng(0)
    ct = TiledOut(
        color=jnp.asarray(rng.normal(0, 1, (height, width, 3)), jnp.float32),
        depth=jnp.asarray(rng.normal(0, 1, (height, width)), jnp.float32),
        uncertainty=jnp.asarray(rng.normal(0, 1, (height, width)),
                                jnp.float32),
        final_t=jnp.zeros((height, width), jnp.float32))

    def timed(fn, *a, iters=5, label=""):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{label:34s} {dt:9.2f} ms")
        return out, dt

    # full-frame reference: forward + vjp with the fixed cotangent
    def full(b, *a):
        out, pull = jax.vjp(
            lambda *x: rasterize_tiled(*x, b, bg, width, height, interpret),
            *a)
        return out, pull(ct)

    (out_full, g_full), t_full = timed(jax.jit(full), binning, *args,
                                       label="full-frame fwd+bwd")

    for n_bands in bands_list:
        gx, gy, gy_pad, rpb = _band_geometry(width, height, n_bands)
        bh = rpb * TILE_H

        def band_step(band, b, *a):
            out, res = _band_fwd_at(band, *a, b, bg, width, height,
                                    n_bands, interpret)
            r0 = band * bh
            ctb = TiledOut(
                color=jax.lax.dynamic_slice(
                    jnp.pad(ct.color, ((0, gy_pad * TILE_H - height),
                                       (0, 0), (0, 0))),
                    (r0, 0, 0), (bh, width, 3)),
                depth=jax.lax.dynamic_slice(
                    jnp.pad(ct.depth, ((0, gy_pad * TILE_H - height),
                                       (0, 0))), (r0, 0), (bh, width)),
                uncertainty=jax.lax.dynamic_slice(
                    jnp.pad(ct.uncertainty,
                            ((0, gy_pad * TILE_H - height), (0, 0))),
                    (r0, 0), (bh, width)),
                final_t=jnp.zeros((bh, width), jnp.float32))
            grads = _band_bwd_at(band, width, height, n_bands, interpret,
                                 res, ctb)
            return out, grads[:6]

        jb = jax.jit(band_step)
        # correctness: assemble bands, compare to full frame
        outs, gsum = [], None
        t_bands = 0.0
        for b in range(n_bands):
            (ob, gb), tb = timed(jb, jnp.int32(b), binning, *args,
                                 label=f"bands={n_bands} band {b} fwd+bwd")
            outs.append(jax.tree.map(np.asarray, ob))
            gb = jax.tree.map(np.asarray, gb)
            gsum = gb if gsum is None else jax.tree.map(np.add, gsum, gb)
            t_bands += tb

        img = np.concatenate([o.color for o in outs], axis=0)[:height]
        dep = np.concatenate([o.depth for o in outs], axis=0)[:height]
        np.testing.assert_allclose(img, np.asarray(out_full.color),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(dep, np.asarray(out_full.depth),
                                   rtol=1e-5, atol=1e-5)
        names = ("mean2d", "conic", "opacity", "color", "depth", "unc")
        for name, a, b in zip(names, gsum, g_full[:6]):
            scale = max(np.abs(np.asarray(b)).max(), 1e-8)
            err = np.abs(np.asarray(a) - np.asarray(b)).max() / scale
            print(f"  grad {name:8s} max rel err {err:.3e}")
            assert err < 5e-5, (name, err)
        print(f"bands={n_bands}: OK — sum of band steps {t_bands:.2f} ms "
              f"vs full {t_full:.2f} ms "
              f"(overhead {(t_bands / t_full - 1) * 100:+.1f}% serial; "
              f"on a pod the bands run CONCURRENTLY, so per-chip time "
              f"≈ {t_bands / n_bands:.2f} ms)")


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [2, 4])
