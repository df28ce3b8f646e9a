"""Layout-variant equivalence: the TPU layout choices (one-hot-matmul
token permutes and channels-first resize contractions, both DEFAULT
after the round-3 A/B; kill-switches ECAMP_GATHER_PERMUTE /
ECAMP_RESIZE_NHWC; opt-in ECAMP_SR_NCHW_PATH) must be numerically
identical to the reference formulations — they change op lowering, not
math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_onehot_permute_matches_gather(monkeypatch):
    from ecamp_tpu.ops import masking

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 196, 64)), jnp.float32)
    ids = jnp.asarray(np.stack([rng.permutation(196)[:49] for _ in range(4)]),
                      jnp.int32)
    monkeypatch.setenv("ECAMP_GATHER_PERMUTE", "1")
    a = masking.permute_tokens(x, ids)
    monkeypatch.delenv("ECAMP_GATHER_PERMUTE", raising=False)
    b = masking.permute_tokens(x, ids)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # full-permutation (decoder unshuffle) + gradient equivalence
    idsr = jnp.asarray(np.stack([rng.permutation(196) for _ in range(4)]),
                       jnp.int32)

    g0 = jax.grad(lambda x: (jnp.take_along_axis(
        x, idsr[:, :, None], axis=1) ** 2).sum())(x)
    monkeypatch.delenv("ECAMP_GATHER_PERMUTE", raising=False)
    g1 = jax.grad(lambda x: (masking.permute_tokens(x, idsr) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=1e-6)


def test_random_masking_identical_under_onehot(monkeypatch):
    from ecamp_tpu.ops.masking import random_masking

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 196, 32)), jnp.float32)
    key = jax.random.PRNGKey(7)
    monkeypatch.setenv("ECAMP_GATHER_PERMUTE", "1")
    a = random_masking(key, x, 0.75)
    monkeypatch.delenv("ECAMP_GATHER_PERMUTE", raising=False)
    b = random_masking(key, x, 0.75)
    for u, v in zip(a, b):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))


def test_sr_nchw_path_matches_default(monkeypatch):
    """ECAMP_SR_NCHW_PATH keeps the 448^2 SR branch channels-first; the
    three losses must match the NHWC formulation to fp tolerance (same
    math, different iteration order in the means)."""
    from ecamp_tpu.core.config import (BertConfig, MAEDecoderConfig,
                                       ViTConfig)
    from ecamp_tpu.nn import ECAMP

    rng = np.random.default_rng(3)
    model_kw = dict(
        vit=ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=1,
                      num_heads=2),
        decoder=MAEDecoderConfig(embed_dim=16, depth=1, num_heads=2),
        bert=BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                        num_attention_heads=2, intermediate_size=64,
                        max_position_embeddings=8))
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32),
        "ids": jnp.asarray(rng.integers(0, 64, (2, 8)), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 64, (2, 8)), jnp.int32),
        "attention_mask": jnp.ones((2, 8), jnp.int32),
        "type_ids": jnp.zeros((2, 8), jnp.int32),
        "weights": jnp.ones((2, 8), jnp.float32),
        "column": jnp.zeros((2,), jnp.int32),
        "row": jnp.zeros((2,), jnp.int32)}

    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("ECAMP_SR_NCHW_PATH", flag)
        m = ECAMP(**model_kw)
        v = m.init({"params": jax.random.PRNGKey(0),
                    "masking": jax.random.PRNGKey(1)}, batch,
                   mask_ratio=0.75, deterministic=True)
        out = m.apply(v, batch, mask_ratio=0.75, deterministic=True,
                      rngs={"masking": jax.random.PRNGKey(2)})
        outs[flag] = {k: float(out[k])
                      for k in ("mim_loss", "res_loss", "mlm_loss")}
    for k in outs["0"]:
        np.testing.assert_allclose(outs["0"][k], outs["1"][k], rtol=1e-5)


def test_s2d_conv_stack_matches_direct():
    """ops/s2d_sr.py: the space-to-depth conv stack must equal the direct
    fine-grid conv stack exactly (same taps, reassociated layout only)."""
    from ecamp_tpu.ops.s2d_sr import (depth_to_space, space_to_depth,
                                      sr_conv_stack_s2d)
    from jax import lax

    rng = np.random.default_rng(11)
    u = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, 3, 3)) * 0.2, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, 3, 3)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(3,)), jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(3,)), jnp.float32)

    def direct(u):
        h = lax.conv_general_dilated(
            u, w1, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b1
        h = jnp.maximum(h, 0)
        h = lax.conv_general_dilated(
            h, w2, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b2
        return jnp.maximum(h + u, 0)

    got = depth_to_space(sr_conv_stack_s2d(u, w1, b1, w2, b2, b=4), 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(direct(u)),
                               rtol=1e-5, atol=1e-5)

    # round trip
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(space_to_depth(u, 4), 4)), np.asarray(u))


def test_upsample2x_s2d_matches_resize_then_s2d():
    """The fused stride-2 conv (upsample emitted in s2d layout) must equal
    resize_bilinear -> space_to_depth, including the clamped borders."""
    from ecamp_tpu.ops.image_ops import resize_bilinear
    from ecamp_tpu.ops.s2d_sr import space_to_depth, upsample2x_s2d

    rng = np.random.default_rng(7)
    for h, w in ((16, 16), (224, 32), (12, 20)):
        x = jnp.asarray(rng.normal(size=(2, h, w, 3)), jnp.float32)
        want = space_to_depth(resize_bilinear(x, (2 * h, 2 * w)), 4)
        got = upsample2x_s2d(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


def test_sr_s2d_model_losses_match_direct(monkeypatch):
    """ECAMP_SR_S2D (default on) must leave all three pretrain losses
    unchanged vs the direct NHWC SR branch: the conv math is exact and the
    res loss is a permutation-invariant full-tensor mean."""
    from ecamp_tpu.core.config import (BertConfig, MAEDecoderConfig,
                                       ViTConfig)
    from ecamp_tpu.nn import ECAMP

    rng = np.random.default_rng(5)
    model_kw = dict(
        vit=ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=1,
                      num_heads=2),
        decoder=MAEDecoderConfig(embed_dim=16, depth=1, num_heads=2),
        bert=BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                        num_attention_heads=2, intermediate_size=64,
                        max_position_embeddings=8),
        # window=1 on the g=2 patch grid with per-sample (column, row)
        # offsets -> a PARTIAL SR mask, so the res-loss comparison
        # actually exercises the coarse super_stride mask replication
        sr_window=1)
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32),
        "ids": jnp.asarray(rng.integers(0, 64, (2, 8)), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 64, (2, 8)), jnp.int32),
        "attention_mask": jnp.ones((2, 8), jnp.int32),
        "type_ids": jnp.zeros((2, 8), jnp.int32),
        "weights": jnp.ones((2, 8), jnp.float32),
        "column": jnp.asarray([0, 1], jnp.int32),
        "row": jnp.asarray([1, 0], jnp.int32)}

    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("ECAMP_SR_S2D", flag)
        m = ECAMP(**model_kw)
        v = m.init({"params": jax.random.PRNGKey(0),
                    "masking": jax.random.PRNGKey(1)}, batch,
                   mask_ratio=0.75, deterministic=True)
        out = m.apply(v, batch, mask_ratio=0.75, deterministic=True,
                      rngs={"masking": jax.random.PRNGKey(2)})
        outs[flag] = {k: float(out[k])
                      for k in ("mim_loss", "res_loss", "mlm_loss")}
        # identical param trees either way (torch import untouched)
        assert "conv1" in v["params"]["super_res"]
        # the partial window must hit some pixels — a zero res_loss would
        # make this comparison vacuous
        assert outs[flag]["res_loss"] > 0
    for k in outs["0"]:
        np.testing.assert_allclose(outs["0"][k], outs["1"][k],
                                   rtol=1e-5, atol=1e-7)


def test_pad_vocab_lanes_loss_and_logits_identical(monkeypatch):
    """ECAMP_PAD_VOCAB (default on) lane-pads the vocab projection for
    the CE loss; losses must be bit-comparable to the unpadded path and
    exposed mlm_logits keep the true vocab width."""
    from ecamp_tpu.core.config import (BertConfig, MAEDecoderConfig,
                                       ViTConfig)
    from ecamp_tpu.nn import ECAMP

    rng = np.random.default_rng(8)
    model_kw = dict(
        vit=ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=1,
                      num_heads=2),
        decoder=MAEDecoderConfig(embed_dim=16, depth=1, num_heads=2),
        bert=BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                        num_attention_heads=2, intermediate_size=64,
                        max_position_embeddings=8),
        sr_window=1)
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32),
        "ids": jnp.asarray(rng.integers(0, 64, (2, 8)), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 64, (2, 8)), jnp.int32),
        "attention_mask": jnp.ones((2, 8), jnp.int32),
        "type_ids": jnp.zeros((2, 8), jnp.int32),
        "weights": jnp.ones((2, 8), jnp.float32),
        "column": jnp.zeros((2,), jnp.int32),
        "row": jnp.zeros((2,), jnp.int32)}

    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("ECAMP_PAD_VOCAB", flag)
        m = ECAMP(**model_kw)
        v = m.init({"params": jax.random.PRNGKey(0),
                    "masking": jax.random.PRNGKey(1)}, batch,
                   mask_ratio=0.75, deterministic=True)
        out = m.apply(v, batch, mask_ratio=0.75, deterministic=True,
                      rngs={"masking": jax.random.PRNGKey(2)})
        assert out["mlm_logits"].shape == (2, 8, 64)  # true width either way
        outs[flag] = {k: float(out[k])
                      for k in ("mim_loss", "res_loss", "mlm_loss")}
    for k in outs["0"]:
        np.testing.assert_allclose(outs["0"][k], outs["1"][k],
                                   rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("method", ["bicubic", "bilinear"])
def test_nchw_resize_matches_nhwc(monkeypatch, method):
    from ecamp_tpu.ops.image_ops import resize_bicubic, resize_bilinear

    f = resize_bicubic if method == "bicubic" else resize_bilinear
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    monkeypatch.setenv("ECAMP_RESIZE_NHWC", "1")
    a = np.asarray(f(x, (32, 32)))
    monkeypatch.delenv("ECAMP_RESIZE_NHWC", raising=False)
    b = np.asarray(f(x, (32, 32)))
    # same taps, same contraction order per output element — tiny fp
    # reassociation tolerance only
    np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-6)
