"""Blender (NeRF-synthetic) reader: conventions + round-trip render.

The decisive check is geometric: frames rendered with the repo's own
rasterizer through cameras built DIRECTLY (w2c) must be reproduced when
those cameras round-trip through the Blender transforms.json convention
(camera-to-world in OpenGL axes, dataset_readers.py:390-431).
"""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from gscream_tpu.data.blender import load_blender_scene


def _write_scene(tmp_path, n=2, w=64, h=48):
    import imageio.v2 as imageio
    from gscream_tpu.cameras import make_camera
    from gscream_tpu.ops.rasterize_tiled import render_tiled

    rng = np.random.default_rng(0)
    means = rng.normal(0, 0.4, (80, 3)).astype(np.float32)
    scales = np.full((80, 3), 0.06, np.float32)
    quats = np.zeros((80, 4), np.float32)
    quats[:, 0] = 1
    colors = rng.uniform(0.2, 1.0, (80, 3)).astype(np.float32)
    opac = np.full((80,), 0.9, np.float32)
    unc = np.zeros((80,), np.float32)

    fovx = 0.9
    frames = []
    os.makedirs(tmp_path / "train", exist_ok=True)
    rendered = []
    for i in range(n):
        ang = 0.3 * i
        # camera at radius 3 looking at the origin, COLMAP frame
        fwd = np.array([np.sin(ang), 0.1, np.cos(ang)])
        fwd = -fwd / np.linalg.norm(fwd)              # toward origin
        eye = -3.0 * fwd
        right = np.cross([0, -1, 0], fwd)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R_w2c = np.stack([right, down, fwd], 0)
        t_w2c = -R_w2c @ eye
        fovy = 2 * np.arctan(np.tan(fovx / 2) * h / w)
        cam = make_camera(R_w2c.T, t_w2c, fovx, fovy, w, h)
        out, _ = render_tiled(jnp.asarray(means), jnp.asarray(scales),
                              jnp.asarray(quats), jnp.asarray(colors),
                              jnp.asarray(opac), jnp.asarray(unc), cam,
                              jnp.zeros(3), capacity=4096, interpret=True)
        img = np.clip(np.asarray(out.color), 0, 1)
        rendered.append(img.transpose(2, 0, 1))
        imageio.imwrite(tmp_path / "train" / f"r_{i}.png",
                        (img * 255).astype(np.uint8))
        # c2w in COLMAP axes → Blender/OpenGL axes (flip Y,Z columns)
        w2c = np.eye(4)
        w2c[:3, :3] = R_w2c
        w2c[:3, 3] = t_w2c
        c2w = np.linalg.inv(w2c)
        c2w[:3, 1:3] *= -1
        frames.append({"file_path": f"train/r_{i}",
                       "transform_matrix": c2w.tolist()})
    meta = {"camera_angle_x": fovx, "frames": frames}
    with open(tmp_path / "transforms_train.json", "w") as f:
        json.dump(meta, f)
    return (means, scales, quats, colors, opac, unc), rendered


def test_blender_roundtrip_render(tmp_path):
    from gscream_tpu.ops.rasterize_tiled import render_tiled

    gauss, rendered = _write_scene(tmp_path)
    sd = load_blender_scene(str(tmp_path), white_background=False)
    assert len(sd.train_views) == 2 and sd.points.shape == (10_000, 3)
    means, scales, quats, colors, opac, unc = gauss
    for v, ref in zip(sd.train_views, rendered):
        assert v.image.shape == ref.shape
        out, _ = render_tiled(jnp.asarray(means), jnp.asarray(scales),
                              jnp.asarray(quats), jnp.asarray(colors),
                              jnp.asarray(opac), jnp.asarray(unc),
                              v.camera, jnp.zeros(3), capacity=4096,
                              interpret=True)
        re_render = np.asarray(out.color).transpose(2, 0, 1)
        # loaded image is 8-bit quantized; re-render through the
        # round-tripped camera must match to quantization error
        assert np.abs(np.clip(re_render, 0, 1) - v.image).max() < 3 / 255.0


def test_blender_white_background_compositing(tmp_path):
    """RGBA frames composite onto white when asked (dgs convention)."""
    import imageio.v2 as imageio
    os.makedirs(tmp_path / "train", exist_ok=True)
    rgba = np.zeros((8, 8, 4), np.uint8)           # fully transparent
    imageio.imwrite(tmp_path / "train" / "r_0.png", rgba)
    meta = {"camera_angle_x": 0.9,
            "frames": [{"file_path": "train/r_0",
                        "transform_matrix": np.eye(4).tolist()}]}
    with open(tmp_path / "transforms_train.json", "w") as f:
        json.dump(meta, f)
    sd = load_blender_scene(str(tmp_path), white_background=True)
    assert np.allclose(sd.train_views[0].image, 1.0)
    sd = load_blender_scene(str(tmp_path), white_background=False)
    assert np.allclose(sd.train_views[0].image, 0.0)
