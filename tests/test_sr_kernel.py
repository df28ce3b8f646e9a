"""SR-head Pallas kernel numerics vs the XLA reference formulation
(interpret mode on CPU; the same comparison runs on-chip via
tools/bench_sr.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from ecamp_tpu.kernels.sr_head import _sr_conv_stack_impl, _xla_reference


@pytest.mark.parametrize("shape", [(2, 3, 32, 64), (1, 3, 24, 24)])
def test_sr_kernel_matches_reference(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, 3, 3)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(3,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, 3, 3)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(3,)) * 0.1, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = _sr_conv_stack_impl(x, w1, b1, w2, b2)
    want = _xla_reference(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_sr_kernel_bf16_matches_reference():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 3, 16, 32)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(3, 3, 3, 3)) * 0.2, jnp.float32)
    b1 = jnp.zeros((3,), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, 3, 3)) * 0.2, jnp.float32)
    b2 = jnp.zeros((3,), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_sr_conv_stack_impl(x, w1, b1, w2, b2), np.float32)
    # fp32 oracle (kernel accumulates fp32 from bf16 inputs)
    want = np.asarray(
        _xla_reference(x.astype(jnp.float32), w1, b1, w2, b2), np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_sr_custom_vjp_grads_match():
    from ecamp_tpu.kernels import sr_head

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 3, 16, 16)), jnp.float32)
    args = [x] + [jnp.asarray(rng.normal(size=s) * 0.2, jnp.float32)
                  for s in [(3, 3, 3, 3), (3,), (3, 3, 3, 3), (3,)]]

    def loss_ref(*a):
        return (_xla_reference(*a) ** 2).mean()

    def loss_kernel(*a):
        return (sr_head.sr_conv_stack(*a) ** 2).mean()

    g_ref = jax.grad(loss_ref, argnums=tuple(range(5)))(*args)
    with pltpu.force_tpu_interpret_mode():
        g_k = jax.grad(loss_kernel, argnums=tuple(range(5)))(*args)
    for a, b in zip(g_ref, g_k):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
