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
    # scale is derived from the quantized keep probability so the
    # expectation is exact: thresh/65536 dropped, 65536/(65536-thresh) up
    thresh = round(rate * 65536)
    np.testing.assert_allclose(y[kept], 65536.0 / (65536 - thresh),
                               rtol=1e-6)
    # ... and close to the nominal 1/(1-rate)
    np.testing.assert_allclose(y[kept], 1.0 / (1 - rate), rtol=2e-5)


def test_dropout_exact_expectation_and_tiny_rate_identity():
    # E[dropout(x)] == x exactly with the quantized-threshold scale
    rate = 0.25  # thresh = 16384 exactly
    x = jnp.ones((1024, 256), jnp.float32)
    y = np.asarray(Dropout(rate).apply(
        {}, x, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(3)}), np.float64)
    assert abs(y.mean() - 1.0) < 2e-3
    # a rate that rounds to thresh=0 is an exact identity (nothing can be
    # dropped, so nothing may be rescaled)
    tiny = 1.0 / 200000
    out = Dropout(tiny).apply(
        {}, x, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(4)})
    assert (out == x).all()


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
