"""Micro-benchmark: SR head (bilinear x2 + 2x conv3x3 C=3 + residual) variants.

The NHWC C=3 convs lane-pad 3 -> 128 on TPU; this measures reformulations.
Usage: python tools/bench_sr.py [B]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from ecamp_tpu.ops.image_ops import resize_bilinear  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 96
WARM, STEPS = 3, 10


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.reshape(-1)[0])


def timeit(fn, *args):
    for _ in range(WARM):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / STEPS


DT = jnp.bfloat16


def head_nhwc(params, x):
    """Current formulation: NHWC lax convs."""
    x = resize_bilinear(x, (448, 448))
    res = x
    w1, b1, w2, b2 = params
    y = jax.lax.conv_general_dilated(
        x, w1.astype(DT), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b1.astype(DT)
    y = jax.nn.relu(y)
    y = jax.lax.conv_general_dilated(
        y, w2.astype(DT), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b2.astype(DT)
    return jax.nn.relu(y + res)


def _conv3x3_taps(x_chw, w_hwio, b):
    """3x3 conv on (B, C, H, W) via 9 shifted channel-mix adds.

    Channels ride the (tiny) leading dims; H,W stay the TPU-tiled trailing
    dims, so no lane padding. w_hwio: (3, 3, Cin, Cout).
    """
    bsz, c, h, w = x_chw.shape
    xp = jnp.pad(x_chw, ((0, 0), (0, 0), (1, 1), (1, 1)))
    out = jnp.zeros((bsz, w_hwio.shape[3], h, w), DT)
    for dy in range(3):
        for dx in range(3):
            tap = xp[:, :, dy:dy + h, dx:dx + w]  # (B, Cin, H, W)
            mix = w_hwio[dy, dx].astype(DT)  # (Cin, Cout)
            out = out + jnp.einsum("bihw,io->bohw", tap, mix)
    return out + b.astype(DT)[None, :, None, None]


def head_taps(params, x):
    """Channels-first 9-tap formulation."""
    x = resize_bilinear(x, (448, 448))
    x = jnp.transpose(x, (0, 3, 1, 2))
    res = x
    w1, b1, w2, b2 = params
    y = jax.nn.relu(_conv3x3_taps(x, w1, b1))
    y = jax.nn.relu(_conv3x3_taps(y, w2, b2) + res)
    return jnp.transpose(y, (0, 2, 3, 1))


def head_nchw(params, x):
    """lax conv with NCHW dimension numbers."""
    x = resize_bilinear(x, (448, 448))
    x = jnp.transpose(x, (0, 3, 1, 2))
    res = x
    w1, b1, w2, b2 = params
    y = jax.lax.conv_general_dilated(
        x, jnp.transpose(w1, (3, 2, 0, 1)).astype(DT), (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    y = jax.nn.relu(y + b1.astype(DT)[None, :, None, None])
    y = jax.lax.conv_general_dilated(
        y, jnp.transpose(w2, (3, 2, 0, 1)).astype(DT), (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    y = jax.nn.relu(y + b2.astype(DT)[None, :, None, None] + res)
    return jnp.transpose(y, (0, 2, 3, 1))


def run(name, head, params, x, grad=False):
    if grad:
        def f(params, x):
            def loss(p):
                return (head(p, x).astype(jnp.float32) ** 2).mean()

            return jax.value_and_grad(loss)(params)

        fn = jax.jit(f)
    else:
        fn = jax.jit(head)
    dt = timeit(fn, params, x)
    print(f"{name:18s} {'fwd+bwd' if grad else 'fwd    '} {dt*1e3:8.2f} ms")
    return head(params, x)


def main():
    rng = np.random.default_rng(0)
    # warm the resize-matrix cache eagerly (it is numpy-backed and can't be
    # built for the first time under a jit trace)
    resize_bilinear(jnp.zeros((1, 224, 224, 3), DT), (448, 448))
    x = jnp.asarray(rng.normal(size=(B, 224, 224, 3)), DT)
    w1 = jnp.asarray(rng.normal(size=(3, 3, 3, 3)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(3,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, 3, 3)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(3,)) * 0.1, jnp.float32)
    params = (w1, b1, w2, b2)

    outs = {}
    for name, head in (("nhwc(current)", head_nhwc), ("taps_chw", head_taps),
                       ("nchw", head_nchw)):
        outs[name] = run(name, head, params, x)
        run(name, head, params, x, grad=True)
    ref = outs["nhwc(current)"].astype(np.float32)
    for name, o in outs.items():
        err = float(np.abs(np.asarray(o, np.float32) - np.asarray(ref)).max())
        print(f"max|{name} - nhwc| = {err:.3e}")


if __name__ == "__main__":
    main()
