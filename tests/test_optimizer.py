"""Adam + LR-schedule parity vs torch (the reference's optimizer)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from gscream_tpu.train.state import adam_update, expon_lr


def test_adam_matches_torch(rng):
    """Our hand-rolled Adam == torch.optim.Adam(eps=1e-15) step-for-step."""
    p0 = rng.normal(size=(40,)).astype(np.float32)
    grads = [rng.normal(size=(40,)).astype(np.float32) for _ in range(5)]
    lr = 0.01

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch.optim.Adam([tp], lr=lr, eps=1e-15)
    for g in grads:
        tp.grad = torch.from_numpy(g.copy())
        opt.step()

    jp = jnp.asarray(p0)
    m = jnp.zeros_like(jp)
    v = jnp.zeros_like(jp)
    for t, g in enumerate(grads, start=1):
        jp, m, v = adam_update(jp, jnp.asarray(g), m, v, lr, jnp.int32(t))

    np.testing.assert_allclose(np.asarray(jp), tp.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_expon_lr_reference_formula():
    """utils/general_utils.py:104-137: log-lerp between init and final."""
    f = lambda s: float(expon_lr(s, 0.01, 0.0001, max_steps=30000))
    assert f(0) == pytest.approx(0.01, rel=1e-6)
    assert f(30000) == pytest.approx(0.0001, rel=1e-6)
    # halfway in log space
    assert f(15000) == pytest.approx(np.sqrt(0.01 * 0.0001), rel=1e-5)
    # clamped beyond max_steps
    assert f(60000) == pytest.approx(0.0001, rel=1e-6)


def test_expon_lr_zero_shortcut():
    assert float(expon_lr(100, 0.0, 0.0)) == 0.0


def test_expon_lr_delay_ramp():
    full = float(expon_lr(1000, 0.01, 0.001, lr_delay_steps=0,
                          max_steps=30000))
    delayed = float(expon_lr(10, 0.01, 0.001, lr_delay_steps=1000,
                             lr_delay_mult=0.1, max_steps=30000))
    start = float(expon_lr(0, 0.01, 0.001, lr_delay_steps=1000,
                           lr_delay_mult=0.1, max_steps=30000))
    assert start == pytest.approx(0.1 * 0.01, rel=1e-5)
    assert delayed < full
