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


def test_drop_path_per_sample_branch_drop():
    """Stochastic depth (timm DropPath): whole samples of a residual
    branch are zeroed (never partial features), kept samples scaled by
    1/(1-rate); identity in eval."""
    from ecamp_tpu.nn.layers import DropPath

    x = jnp.ones((256, 4, 8))
    rate = 0.25
    y = np.asarray(DropPath(rate).apply(
        {}, x, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(0)}))
    per_sample = y.reshape(256, -1)
    zeroed = (per_sample == 0).all(axis=1)
    kept = (per_sample == 1.0 / (1 - rate)).all(axis=1)
    assert (zeroed | kept).all()  # all-or-nothing per sample
    assert 0.15 < zeroed.mean() < 0.35
    assert (DropPath(rate).apply({}, x, deterministic=True) == x).all()
    assert (DropPath(0.0).apply(
        {}, x, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)}) == x).all()


def test_vit_drop_path_ramps_across_blocks():
    """ViTConfig.drop_path_rate threads into blocks with the timm
    linspace ramp: block 0 rate 0, last block full rate (observable as
    param-free behavior: train-mode forward differs from eval only when
    rate > 0)."""
    from ecamp_tpu.core.config import ViTConfig
    from ecamp_tpu.nn.vit import VisionTransformer

    c = ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=3,
                  num_heads=2, drop_path_rate=0.9)
    m = VisionTransformer(c)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 32, 32, 3)),
                    jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    ev = m.apply(v, x, deterministic=True)
    tr = m.apply(v, x, deterministic=False,
                 rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(ev), np.asarray(tr))
    c0 = ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=3,
                   num_heads=2, drop_path_rate=0.0)
    tr0 = VisionTransformer(c0).apply(
        v, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(np.asarray(ev), np.asarray(tr0), rtol=1e-6)


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
