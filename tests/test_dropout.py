"""uint16-bits Dropout: identity cases, rate statistics, scale, gradient."""

import jax
import jax.numpy as jnp
import numpy as np

from ecamp_tpu.nn.layers import Dropout


def test_dropout_identity_cases():
    x = jnp.ones((4, 8))
    assert (Dropout(0.5).apply({}, x, deterministic=True) == x).all()
    assert (Dropout(0.0).apply(
        {}, x, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(0)}) == x).all()


def test_dropout_rate_and_scale():
    rate = 0.1
    x = jnp.ones((512, 512), jnp.float32)
    y = np.asarray(Dropout(rate).apply(
        {}, x, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)}))
    kept = y != 0
    assert abs(kept.mean() - (1 - rate)) < 0.01
    np.testing.assert_allclose(y[kept], 1.0 / (1 - rate), rtol=1e-6)


def test_dropout_grad_masks_match_forward():
    rate = 0.3
    x = jnp.ones((64, 64), jnp.float32)

    def f(x):
        return Dropout(rate).apply(
            {}, x, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(2)}).sum()

    g = np.asarray(jax.grad(f)(x))
    y = np.asarray(Dropout(rate).apply(
        {}, x, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(2)}))
    np.testing.assert_allclose(g, y)  # d(sum)/dx = mask * scale = y for x=1
