"""Fused Pallas CIN layer (ops/kernels/cin.py) vs the einsum path:
forward and gradients must match (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ml_function_tpu.ops.interactions import CIN


def _close(a, b, tol=2e-2):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=tol,
                               atol=tol * float(np.abs(np.asarray(b)).max()))


@pytest.mark.parametrize("hidden", [(128,), (128, 128)])
def test_cin_kernel_matches_einsum(hidden):
    b, f, d = 256, 5, 4
    cin_k = CIN(f, d, hidden=hidden, out_logit=False, kernel="pallas")
    cin_e = CIN(f, d, hidden=hidden, out_logit=False, kernel="off")
    p = cin_k.init(jax.random.PRNGKey(0))
    e = jax.random.normal(jax.random.PRNGKey(1), (b, f, d))

    yk = jax.jit(lambda p, e: cin_k.features(p, e))(p, e)
    ye = jax.jit(lambda p, e: cin_e.features(p, e))(p, e)
    assert yk.shape == (b, sum(hidden))
    _close(yk, ye)

    def loss(which):
        def fn(p, e):
            return jnp.sum(jnp.square(which.features(p, e)))
        return fn

    gk = jax.jit(jax.grad(loss(cin_k), argnums=(0, 1)))(p, e)
    ge = jax.jit(jax.grad(loss(cin_e), argnums=(0, 1)))(p, e)
    for a, bb in zip(jax.tree_util.tree_leaves(gk),
                     jax.tree_util.tree_leaves(ge)):
        _close(a, bb, tol=3e-2)


def test_cin_auto_gating():
    """auto uses the kernel only when shapes qualify; odd widths fall back
    to einsum with identical results."""
    from ml_function_tpu.ops.kernels.cin import supports
    assert supports(256, 5, 128, 4)
    assert not supports(100, 5, 128, 4)     # batch not a tile multiple
    assert not supports(256, 5, 64, 4)      # O not a lane multiple
    b, f, d = 96, 4, 4
    cin = CIN(f, d, hidden=(64,), out_logit=False)   # auto -> einsum
    p = cin.init(jax.random.PRNGKey(0))
    e = jax.random.normal(jax.random.PRNGKey(1), (b, f, d))
    y = cin.features(p, e)
    y_off = CIN(f, d, hidden=(64,), out_logit=False,
                kernel="off").features(p, e)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_off), rtol=1e-6)
