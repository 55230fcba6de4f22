"""Pallas emission pipeline vs the XLA binning build: bit parity.

bin_instances_pallas must reproduce bin_instances(row_tight, lex sort)
exactly on every consumed field, and its dense attribute columns must
pack to the same instance rows pack_instance_data builds.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from gscream_tpu.ops import projection as proj
from gscream_tpu.ops.binning import bin_instances
from gscream_tpu.ops.emission import bin_instances_pallas
from gscream_tpu.ops.rasterize_tiled import (
    PAD_SLOTS, TILE_H, TILE_W, pack_instance_data, rasterize_tiled)
from gscream_tpu.ops.shuffle import pack_columns
from tests.utils import random_camera, random_gaussians


def _setup(rng, n=700, width=160, height=128):
    cam = random_camera(width=width, height=height)
    means, scales, quats, colors, opac, unc = random_gaussians(rng, n=n)
    splats = proj.preprocess(means, scales, quats, cam.w2c, cam.full_proj,
                             cam.width, cam.height, cam.tan_fovx,
                             cam.tan_fovy, tile_w=TILE_W, tile_h=TILE_H,
                             opacity=opac)
    assert splats.t_iso is not None
    return cam, splats, colors, opac, unc


@pytest.mark.parametrize("capacity", [4096, 8192])
def test_emission_matches_xla(rng, capacity):
    cam, splats, colors, opac, unc = _setup(rng)
    ref = bin_instances(splats, capacity, cam.width, cam.height,
                        TILE_W, TILE_H, sort_mode="lex")
    new = bin_instances_pallas(
        splats, opac, colors, unc, capacity, cam.width, cam.height,
        TILE_W, TILE_H, interpret=True)
    cols16 = new.cols16
    total = int(ref.num_instances)
    assert total > 0 and total < capacity
    assert int(new.num_instances) == total
    assert int(new.num_rows) == int(ref.num_rows)
    np.testing.assert_array_equal(np.asarray(new.tile_id),
                                  np.asarray(ref.tile_id))
    np.testing.assert_array_equal(np.asarray(new.tile_start),
                                  np.asarray(ref.tile_start))
    np.testing.assert_array_equal(np.asarray(new.tile_count),
                                  np.asarray(ref.tile_count))
    np.testing.assert_array_equal(np.asarray(new.gauss_id)[:total],
                                  np.asarray(ref.gauss_id)[:total])
    np.testing.assert_array_equal(np.asarray(new.emit_slot)[:total],
                                  np.asarray(ref.emit_slot)[:total])
    np.testing.assert_array_equal(np.asarray(new.offsets),
                                  np.asarray(ref.offsets))

    # packed instance rows agree lane-exactly over valid slots
    gx = -(-cam.width // TILE_W)
    inst_ref = pack_instance_data(splats.mean2d, splats.conic, opac,
                                  colors, splats.depth, unc, ref, gx)
    inst_new = pack_columns(
        jnp.pad(cols16, ((0, 0), (0, PAD_SLOTS))), interpret=True)
    a = np.asarray(inst_new).reshape(-1, 16)[:total]
    b = np.asarray(inst_ref).reshape(-1, 16)[:total]
    # k0/k1/k2 (lanes 6..8) reassociate an FMA between the two programs —
    # ulp-level only; every other lane is a bit-exact passthrough
    exact = [0, 1, 2, 3, 4, 5, 9, 10, 11, 12, 13, 14, 15]
    np.testing.assert_array_equal(a[:, exact], b[:, exact])
    np.testing.assert_allclose(a[:, 6:9], b[:, 6:9], rtol=1e-5, atol=1e-6)


def test_emission_overflow_reported(rng):
    cam, splats, colors, opac, unc = _setup(rng)
    ref = bin_instances(splats, 1024, cam.width, cam.height,
                        TILE_W, TILE_H, sort_mode="lex")
    new = bin_instances_pallas(splats, opac, colors, unc, 1024,
                                cam.width, cam.height, TILE_W, TILE_H,
                                interpret=True)
    from gscream_tpu.ops.binning import overflow_demand
    assert int(new.num_instances) == int(ref.num_instances)
    assert int(new.num_rows) == int(ref.num_rows)
    assert int(overflow_demand(new)) == int(overflow_demand(ref)) > 1024


def test_emission_render_path(rng):
    """rasterize_tiled over the pallas emission == over the XLA binning."""
    cam, splats, colors, opac, unc = _setup(rng, n=400, width=96, height=64)
    bg = jnp.zeros(3)
    ref = bin_instances(splats, 4096, cam.width, cam.height,
                        TILE_W, TILE_H, sort_mode="lex")
    out_ref = rasterize_tiled(splats.mean2d, splats.conic, opac, colors,
                              splats.depth, unc, ref, bg,
                              cam.width, cam.height, True)
    new = bin_instances_pallas(
        splats, opac, colors, unc, 4096, cam.width, cam.height,
        TILE_W, TILE_H, interpret=True)
    out_new = rasterize_tiled(splats.mean2d, splats.conic, opac, colors,
                              splats.depth, unc, new, bg,
                              cam.width, cam.height, True)
    # ulp-level k-coefficient reassociation (see test_emission_matches_xla)
    # perturbs the blend inputs, so images match to fp32 noise, not bits
    for a, b in zip(out_new, out_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=3e-5)


def test_emit_modes_agree_grads(rng, monkeypatch):
    """Full fwd+bwd through build_binning: pallas emission vs XLA build
    produce matching losses and pixel gradients (ulp-level k-coeff
    reassociation only)."""
    import jax

    from gscream_tpu.ops.rasterize_tiled import build_binning

    cam, splats, colors, opac, unc = _setup(rng, n=400, width=96, height=64)
    bg = jnp.zeros(3)

    def loss(op, col, mode):
        monkeypatch.setenv("GSCREAM_EMIT", mode)
        binning = build_binning(splats, op, col, unc, 4096,
                                cam.width, cam.height, interpret=True)
        out = rasterize_tiled(splats.mean2d, splats.conic, op, col,
                              splats.depth, unc, binning, bg,
                              cam.width, cam.height, True)
        return (jnp.sum(out.color * jnp.cos(out.color))
                + jnp.sum(out.depth) + 0.3 * jnp.sum(out.uncertainty))

    grads = {}
    for mode in ("xla", "pallas"):
        grads[mode] = jax.value_and_grad(
            lambda o, c: loss(o, c, mode), argnums=(0, 1))(opac, colors)
    np.testing.assert_allclose(float(grads["pallas"][0]),
                               float(grads["xla"][0]), rtol=1e-6)
    # ulp-level coefficient reassociation can flip alpha thresholds for a
    # handful of instances (same envelope as the oracle parity suite)
    for ga, gp in zip(grads["xla"][1], grads["pallas"][1]):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(ga),
                                   rtol=2e-3, atol=1e-6)
