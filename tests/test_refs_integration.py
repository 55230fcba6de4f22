"""Gate config 1 (BASELINE.json): fwd+bwd against the shipped refs/ data.

The reference repo ships per-scene inpainted reference images and Marigold
depths (refs/book_out.png + refs/book_out_pred.npy, (567,1008) float32) as
the only golden artifacts.  This test drives the full GScream loss head —
masked RGB + scale/shift-aligned depth with multiscale smoothness — with
the *real* artifacts at quarter resolution on CPU, through the Pallas
(interpret) rasterizer, and checks that training descends with finite
gradients.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

REFS = "/root/reference/refs"


@pytest.mark.skipif(not os.path.isdir(REFS), reason="refs/ not mounted")
def test_book_refs_fwd_bwd_descends():
    import imageio.v2 as imageio
    from gscream_tpu.cameras import make_camera
    from gscream_tpu.config import OptimConfig
    from gscream_tpu.model.scaffold import ScaffoldConfig, init_scaffold
    from gscream_tpu.train.state import init_train_state
    from gscream_tpu.train.step import train_step

    depth = np.load(os.path.join(REFS, "book_out_pred.npy")).astype(
        np.float32)
    img = np.asarray(imageio.imread(
        os.path.join(REFS, "book_out.png")), np.float32) / 255.0
    assert depth.shape == (567, 1008)
    # quarter-res of the 1008x567 artifacts
    h, w = 144, 256
    yi = (np.arange(h) * depth.shape[0] // h)
    xi = (np.arange(w) * depth.shape[1] // w)
    depth_q = depth[yi][:, xi][None]
    img_q = img[yi][:, xi][:, :, :3].transpose(2, 0, 1)

    rng = np.random.default_rng(0)
    # init cloud roughly aligned with the view frustum
    pts = np.stack([
        rng.uniform(-1.2, 1.2, 2000),
        rng.uniform(-0.7, 0.7, 2000),
        rng.uniform(1.0, 4.0, 2000),
    ], -1).astype(np.float32)
    cfg = ScaffoldConfig(feat_dim=8, n_offsets=2, voxel_size=0.08,
                         capacity=4096)
    cam = make_camera(np.eye(3), np.zeros(3), 1.2, 1.2 * h / w, w, h)
    scaffold = init_scaffold(jax.random.PRNGKey(0), pts, cfg)
    ts = init_train_state(scaffold, cfg, jax.random.PRNGKey(1))
    opt = OptimConfig()

    mask = np.zeros((1, h, w), np.float32)
    mask[:, h // 3: 2 * h // 3, w // 3: 2 * w // 3] = 1.0
    fg_box = jnp.asarray(mask[0])
    losses = []
    for i in range(8):
        ts, aux = train_step(
            ts, cam, jnp.asarray(img_q), jnp.asarray(mask),
            jnp.asarray(depth_q), fg_box, jnp.zeros(4, jnp.int32),
            cfg=cfg, opt=opt, is_ref=True, use_crossattn=False,
            capacity=65536, interpret=True, width=w, height=h,
            accumulate=True)
        losses.append(float(aux.loss))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    # the scale/shift-aligned depth path engaged (non-trivial loss value)
    assert losses[0] > 0.1
