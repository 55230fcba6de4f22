"""Shared test helpers: random gaussian clouds and cameras."""
import numpy as np
import jax.numpy as jnp

from gscream_tpu.cameras import make_camera


def random_camera(width=64, height=48, fov=1.0, cx=0.0, cy=0.0):
    # camera at origin looking down +z (identity R, zero T)
    R = np.eye(3)
    T = np.zeros(3)
    return make_camera(R, T, fov_x=fov, fov_y=fov, width=width, height=height,
                       cx_ndc=cx, cy_ndc=cy)


def random_gaussians(rng, n=200, depth_range=(0.5, 6.0), xy_extent=2.0,
                     scale_range=(0.01, 0.25)):
    """Random world-space gaussians in front of a +z-looking camera."""
    means = np.stack([
        rng.uniform(-xy_extent, xy_extent, n),
        rng.uniform(-xy_extent, xy_extent, n),
        rng.uniform(*depth_range, n),
    ], axis=-1).astype(np.float32)
    scales = rng.uniform(*scale_range, (n, 3)).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    opac = rng.uniform(0.05, 0.95, n).astype(np.float32)
    unc = rng.uniform(0, 1, n).astype(np.float32)
    return (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
            jnp.asarray(colors), jnp.asarray(opac), jnp.asarray(unc))
