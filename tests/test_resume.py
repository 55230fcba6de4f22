"""Kill-and-resume: a checkpoint restore reproduces the uninterrupted run.

The reference's capture/restore pair (gaussian_model.py:203-237) is broken
(optimizer state keys mismatch on restore); this repo's contract is
stronger — all host randomness is derived from (seed, iteration), so
resume is *bit-exact*: train N iters straight vs train k, checkpoint,
restore, train to N, and compare every parameter.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gscream_tpu.config import ModelConfig, OptimConfig, RunConfig
from gscream_tpu.data.synthetic import make_scene
from gscream_tpu.train.loop import train_scene


def _run(tmp_path, scene, run, iterations, tag, start_checkpoint="",
         checkpoint_interval=0):
    out = str(tmp_path / tag)
    ts, _ = train_scene(
        scene.views, scene.ref_index, scene.points, run, out_dir=out,
        capacity=1 << 14, iterations=iterations,
        start_checkpoint=start_checkpoint,
        checkpoint_interval=checkpoint_interval)
    return ts, out


@pytest.mark.timeout(540)
def test_resume_bit_exact(tmp_path):
    scene = make_scene(n_views=4, n_gauss=120, width=64, height=64, seed=3)
    run = RunConfig(
        model=ModelConfig(feat_dim=8, n_offsets=2, voxel_size=0.1,
                          anchor_capacity=512),
        optim=OptimConfig(iterations=16, start_crossattn_from=10 ** 9),
        seed=3)

    ts_full, _ = _run(tmp_path, scene, run, 16, "full")
    _, out_a = _run(tmp_path, scene, run, 8, "part_a",
                    checkpoint_interval=8)
    ts_res, _ = _run(tmp_path, scene, run, 16, "part_b",
                     start_checkpoint=f"{out_a}/ckpt")

    assert int(ts_res.step) == int(ts_full.step) == 16
    flat_full = jax.tree.leaves((ts_full.scaffold.params,
                                 ts_full.scaffold.mlps, ts_full.m,
                                 ts_full.v))
    flat_res = jax.tree.leaves((ts_res.scaffold.params,
                                ts_res.scaffold.mlps, ts_res.m, ts_res.v))
    for a, b in zip(flat_full, flat_res):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.timeout(540)
def test_checkpoint_meta_written(tmp_path):
    scene = make_scene(n_views=3, n_gauss=80, width=64, height=64, seed=5)
    run = RunConfig(
        model=ModelConfig(feat_dim=8, n_offsets=2, voxel_size=0.1,
                          anchor_capacity=512),
        optim=OptimConfig(iterations=6, start_crossattn_from=10 ** 9),
        seed=5)
    _, out = _run(tmp_path, scene, run, 6, "meta", checkpoint_interval=4)
    import json
    import os
    assert os.path.isdir(os.path.join(out, "ckpt"))
    with open(os.path.join(out, "ckpt_meta.json")) as f:
        meta = json.load(f)
    assert meta["iteration"] == 6
    assert meta["capacity"] >= 1 << 14


def test_nonfinite_dump(tmp_path):
    """A NaN loss checkpoints the pre-step state and aborts loudly."""
    import logging

    import jax
    import numpy as np
    import pytest
    import jax.numpy as jnp

    from gscream_tpu.config import OptimConfig
    from gscream_tpu.model.scaffold import ScaffoldConfig, init_scaffold
    from gscream_tpu.train.loop import NonFiniteLossError, dump_nonfinite
    from gscream_tpu.train.state import init_train_state

    cfg = ScaffoldConfig(feat_dim=8, n_offsets=2, voxel_size=0.1,
                         capacity=64)
    pts = np.random.default_rng(0).normal(size=(20, 3)).astype(np.float32)
    sc = init_scaffold(jax.random.PRNGKey(0), pts, cfg)
    ts = init_train_state(sc, cfg, jax.random.PRNGKey(1))

    class Aux:
        num_instances = jnp.int32(7)
        n_active = jnp.int32(5)

    rec = dict(it=123, vi=2, fg_box=jnp.zeros((4, 4)),
               cross_box=jnp.zeros(4, jnp.int32), use_cross=False,
               ts_prev=ts, aux=Aux())
    with pytest.raises(NonFiniteLossError):
        dump_nonfinite(str(tmp_path), rec, logging.getLogger("t"))
    import os
    assert os.path.exists(tmp_path / "nonfinite_it123_inputs.npz")
    z = np.load(tmp_path / "nonfinite_it123_inputs.npz")
    assert int(z["it"]) == 123 and int(z["num_instances"]) == 7
    assert os.path.isdir(tmp_path / "nonfinite_it123_ckpt")
