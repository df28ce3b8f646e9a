"""Mixed-precision policy.

Replaces the reference's apex O2 fp16 + GradScaler(2**20) stack
(Classification/train.py:393-398, util/misc.py:251-292): on TPU, bf16 has
fp32's exponent range so no loss scaling is needed. Params and optimizer
state stay fp32; activations/matmuls run bf16 on the MXU.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class DTypePolicy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    # dtype for loss/softmax/layer-norm statistics accumulation
    reduce_dtype: jnp.dtype = jnp.float32

    def cast_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_reduce(self, x):
        return jnp.asarray(x, self.reduce_dtype)


DEFAULT_POLICY = DTypePolicy()
FP32_POLICY = DTypePolicy(compute_dtype=jnp.float32)


def policy(bf16: bool = True) -> DTypePolicy:
    return DEFAULT_POLICY if bf16 else FP32_POLICY
