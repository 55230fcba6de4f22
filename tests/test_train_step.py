"""Training-step integration: loss decreases on a synthetic scene."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gscream_tpu.config import OptimConfig
from gscream_tpu.data.synthetic import make_scene
from gscream_tpu.model.scaffold import ScaffoldConfig, init_scaffold
from gscream_tpu.train.state import init_train_state
from gscream_tpu.train.step import train_step

CFG = ScaffoldConfig(feat_dim=8, n_offsets=2, voxel_size=0.1, capacity=1024)
OPT = OptimConfig()


@pytest.fixture(scope="module")
def scene():
    return make_scene(n_views=3, n_gauss=150, width=64, height=64)


def _state(scene):
    key = jax.random.PRNGKey(0)
    scaffold = init_scaffold(key, scene.points, CFG)
    return init_train_state(scaffold, CFG, jax.random.PRNGKey(1))


def test_step_runs_and_descends(scene):
    ts = _state(scene)
    v = scene.views[0]
    zero_box = jnp.zeros(4, jnp.int32)
    fg_box = jnp.asarray(v.mask[0])
    losses = []
    for i in range(30):
        view = scene.views[i % len(scene.views)]
        ts, aux = train_step(
            ts, view.camera, jnp.asarray(view.image),
            jnp.asarray(view.mask), jnp.asarray(view.depth), fg_box,
            zero_box, cfg=CFG, opt=OPT, is_ref=(i % len(scene.views) == 0),
            use_crossattn=False, capacity=16384, interpret=True,
            width=64, height=64, accumulate=True)
        losses.append(float(aux.loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # training makes progress
    assert int(ts.step) == 30
    # densification stats accumulated
    assert float(jnp.sum(ts.stats.anchor_demon)) > 0
    assert float(jnp.sum(ts.stats.offset_denom)) > 0


def test_step_crossattn_phase(scene):
    ts = _state(scene)
    # non-zero features so the EMA write is observable
    feat = jax.random.normal(jax.random.PRNGKey(7),
                             ts.scaffold.params.feat.shape) * 0.1
    ts = ts._replace(scaffold=ts.scaffold._replace(
        params=ts.scaffold.params._replace(feat=feat)))
    v = scene.views[0]
    h, w = 64, 64
    # a patch box covering the mask region
    box = jnp.asarray([h // 4, 3 * h // 4, w // 4, 3 * w // 4], jnp.int32)
    fg_box = jnp.asarray(v.mask[0])
    ts2, aux = train_step(
        ts, v.camera, jnp.asarray(v.image), jnp.asarray(v.mask),
        jnp.asarray(v.depth), fg_box, box, cfg=CFG, opt=OPT, is_ref=True,
        use_crossattn=True, capacity=16384, interpret=True,
        width=64, height=64, accumulate=False)
    assert np.isfinite(float(aux.loss))
    if bool(aux.cross_ok):
        # cross-attn optimizer stepped; features changed by the EMA write
        assert int(ts2.step_c) == 1
        diff = np.abs(np.asarray(ts2.scaffold.params.feat)
                      - np.asarray(ts.scaffold.params.feat)).max()
        assert diff > 0
