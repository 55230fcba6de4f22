"""Fast (quantized-key) binning: same tiles, near-identical render."""
import numpy as np
import jax.numpy as jnp

from gscream_tpu.ops import projection as proj
from gscream_tpu.ops.binning import bin_instances
from gscream_tpu.ops.rasterize_tiled import TILE_H, TILE_W, rasterize_tiled
from tests.utils import random_camera, random_gaussians


def test_fast_sort_matches_precise(rng):
    cam = random_camera(width=96, height=64)
    means, scales, quats, colors, opac, unc = random_gaussians(rng, n=300)
    splats = proj.preprocess(means, scales, quats, cam.w2c, cam.full_proj,
                             cam.width, cam.height, cam.tan_fovx,
                             cam.tan_fovy, tile_w=TILE_W, tile_h=TILE_H)
    bg = jnp.zeros(3)
    outs = {}
    for precise in (True, False):
        b = bin_instances(splats, 8192, cam.width, cam.height,
                          TILE_W, TILE_H, precise=precise)
        outs[precise] = rasterize_tiled(
            splats.mean2d, splats.conic, opac, colors, splats.depth, unc,
            b, bg, cam.width, cam.height, True)
    # tile membership identical; blend order may differ only for depths
    # within 2^-12 relative — for random depths the images match tightly
    np.testing.assert_allclose(np.asarray(outs[False].color),
                               np.asarray(outs[True].color), atol=5e-3)
    same = np.mean(np.isclose(np.asarray(outs[False].color),
                              np.asarray(outs[True].color), atol=1e-5))
    assert same > 0.999


def test_fused_exact_matches_lex(rng):
    """The fused depth-rank single-key sort is BIT-identical to the
    lexicographic (tile, depth-bits) sort — same instances, same order,
    same carried attributes (including equal-depth tie-breaking)."""
    from gscream_tpu.ops.rasterize_tiled import gauss_attrs

    cam = random_camera(width=96, height=64)
    means, scales, quats, colors, opac, unc = random_gaussians(rng, n=300)
    # force depth ties to exercise the stable tie-break parity
    means = means.at[10:20, 2].set(means[0, 2])
    splats = proj.preprocess(means, scales, quats, cam.w2c, cam.full_proj,
                             cam.width, cam.height, cam.tan_fovx,
                             cam.tan_fovy, tile_w=TILE_W, tile_h=TILE_H)
    attrs = gauss_attrs(splats.mean2d, splats.conic, opac, colors,
                        splats.depth, unc)
    outs = {}
    for mode in ("fused", "lex"):
        outs[mode] = bin_instances(splats, 8192, cam.width, cam.height,
                                   TILE_W, TILE_H, precise=True,
                                   attrs=attrs, sort_mode=mode)
    for field in ("gauss_id", "tile_id", "tile_start", "tile_count",
                  "emit_slot", "offsets", "attrs"):
        a = np.asarray(getattr(outs["fused"], field))
        b = np.asarray(getattr(outs["lex"], field))
        np.testing.assert_array_equal(a, b, err_msg=field)
