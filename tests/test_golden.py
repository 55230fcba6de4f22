"""Golden-bundle CI gate (VERDICT r1 item 9).

``tests/golden/golden_small.npz`` holds a frozen scene with f64-oracle
outputs, input-gradients and fragility masks (see tools/make_golden.py).
These tests pin the fp32 projection + Pallas rasterizer forward/backward
to fixed max-error bounds so kernel optimization can never silently drift
numerics.  Bounds are ~3-5x the errors measured when the bundle was
frozen; fragile pixels/gaussians (threshold-flip candidates marked in f64)
get a loose O(alpha_min) envelope instead.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gscream_tpu.ops import projection as proj
from gscream_tpu.ops.binning import bin_instances
from gscream_tpu.ops.rasterize_tiled import (TILE_H, TILE_W,
                                             rasterize_tiled)

BUNDLE = os.path.join(os.path.dirname(__file__), "golden",
                      "golden_small.npz")


@pytest.fixture(scope="module")
def golden():
    assert os.path.exists(BUNDLE), "run tools/make_golden.py"
    z = dict(np.load(BUNDLE))
    return z


def _splats_f32(z):
    return proj.preprocess(
        jnp.asarray(z["means"], jnp.float32),
        jnp.asarray(z["scales"], jnp.float32),
        jnp.asarray(z["quats"], jnp.float32),
        jnp.asarray(z["w2c"], jnp.float32),
        jnp.asarray(z["full_proj"], jnp.float32),
        int(z["width"]), int(z["height"]),
        float(z["tan_fovx"]), float(z["tan_fovy"]),
        tile_w=TILE_W, tile_h=TILE_H)


def test_projection_matches_f64(golden):
    """fp32 preprocess vs the frozen f64 EWA projection."""
    s = _splats_f32(golden)
    assert np.abs(np.asarray(s.mean2d) - golden["mean2d"]).max() < 5e-5
    assert np.abs(np.asarray(s.conic) - golden["conic"]).max() < 2e-5
    assert np.abs(np.asarray(s.depth) - golden["depth"]).max() < 2e-6


def _cot(z, c):
    h, w = int(z["height"]), int(z["width"])
    y, x = np.meshgrid(np.arange(h, dtype=np.float64),
                       np.arange(w, dtype=np.float64), indexing="ij")
    base = np.sin(0.11 * x + 0.07 * y + 1.3 * c) * 0.5
    if c == 3:
        return np.stack([base, base * 0.7 + 0.1, base * -0.4], axis=-1)
    return base


def _run(z):
    """Tiled fp32 forward + vjp under the bundle's fixed cotangents."""
    w, h = int(z["width"]), int(z["height"])
    # exact f64 splats rounded to f32 (gates the rasterizer in isolation);
    # radius/rects keep the fp32 integer math binning expects
    splats = _splats_f32(z)._replace(
        mean2d=jnp.asarray(z["mean2d"], jnp.float32),
        conic=jnp.asarray(z["conic"], jnp.float32),
        depth=jnp.asarray(z["depth"], jnp.float32))
    binning = bin_instances(splats, 8192, w, h, TILE_W, TILE_H)
    assert int(binning.num_instances) <= 8192
    args = (splats.mean2d, splats.conic,
            jnp.asarray(z["opac"], jnp.float32),
            jnp.asarray(z["colors"], jnp.float32),
            splats.depth, jnp.asarray(z["unc"], jnp.float32))
    bg = jnp.asarray(z["bg"], jnp.float32)

    def loss(mean2d, conic, opac, colors, depth, unc):
        out = rasterize_tiled(mean2d, conic, opac, colors, depth, unc,
                              binning, bg, w, h, True)
        return (jnp.sum(out.color * _cot(z, 3))
                + jnp.sum(out.depth * _cot(z, 0))
                + jnp.sum(out.uncertainty * _cot(z, 1))
                + jnp.sum(out.final_t * _cot(z, 2))), out

    (_, out), grads = jax.value_and_grad(
        loss, argnums=(0, 1, 2, 3, 4, 5), has_aux=True)(*args)
    return out, grads


def _gate(val, ref, fragile, tight, loose, name):
    err = np.abs(np.asarray(val, np.float64) - ref)
    scale = max(np.abs(ref).max(), 1e-3)
    fr = fragile
    while fr.ndim < err.ndim:
        fr = fr[..., None]
    fr = np.broadcast_to(fr, err.shape)
    worst_ok = err[~fr].max() if (~fr).any() else 0.0
    worst_fr = err[fr].max() if fr.any() else 0.0
    assert worst_ok <= tight * scale, (
        f"{name}: non-fragile err {worst_ok:.3e} > {tight:.1e}*{scale:.3e}")
    assert worst_fr <= loose * scale, (
        f"{name}: fragile err {worst_fr:.3e} > {loose:.1e}*{scale:.3e}")


def test_forward_matches_golden(golden):
    out, _ = _run(golden)
    fpix = golden["fragile_pix"].astype(bool)
    _gate(out.color, golden["out_color"], fpix, 5e-5, 2e-2, "color")
    _gate(out.depth, golden["out_depth"], fpix, 5e-5, 2e-2, "depth")
    _gate(out.uncertainty, golden["out_unc"], fpix, 5e-5, 2e-2, "unc")
    _gate(out.final_t, golden["out_final_t"], fpix, 5e-5, 2e-2, "final_t")


def test_backward_matches_golden(golden):
    _, grads = _run(golden)
    fg = golden["fragile_gauss"].astype(bool)
    names = ["g_mean2d", "g_conic", "g_opac", "g_colors", "g_depth",
             "g_unc"]
    # ~4x the relative errors measured at freeze time (see tool docstring)
    tights = dict(g_mean2d=6e-5, g_conic=1e-5, g_opac=2e-5,
                  g_colors=1e-5, g_depth=1e-5, g_unc=1e-5)
    for name, g in zip(names, grads):
        _gate(g, golden[name], fg, tights[name], 3e-2, name)
