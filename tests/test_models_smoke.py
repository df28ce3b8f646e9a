"""Shape/finite smoke tests for every model family on tiny configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecamp_tpu.core.config import (
    BertConfig, MAEDecoderConfig, ViTConfig,
)
from ecamp_tpu.nn import (
    ECAMP, DetectionModel, SegViT, SegViTDual, ViTClassifier,
)

TINY_VIT = ViTConfig(img_size=32, patch_size=16, embed_dim=64, depth=2,
                     num_heads=2)
TINY_BERT = BertConfig(vocab_size=128, hidden_size=64, num_hidden_layers=2,
                       num_attention_heads=2, intermediate_size=128,
                       max_position_embeddings=16)
TINY_DEC = MAEDecoderConfig(embed_dim=32, depth=1, num_heads=2)


def test_vit_classifier_shapes():
    model = ViTClassifier(TINY_VIT, num_classes=5)
    x = jnp.zeros((2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(params, x)
    assert logits.shape == (2, 5)
    assert np.all(np.isfinite(np.asarray(logits)))


@pytest.mark.slow
def test_ecamp_pretrain_losses():
    model = ECAMP(vit=TINY_VIT, decoder=TINY_DEC, bert=TINY_BERT, sr_window=1)
    b, L = 2, 16
    batch = {
        "image": jnp.ones((b, 64, 64, 3)),
        "ids": jnp.ones((b, L), jnp.int32),
        "labels": jnp.ones((b, L), jnp.int32),
        "attention_mask": jnp.ones((b, L), jnp.int32),
        "type_ids": jnp.zeros((b, L), jnp.int32),
        "weights": jnp.ones((b, L)),
        "column": jnp.zeros((b,), jnp.int32),
        "row": jnp.zeros((b,), jnp.int32),
    }
    rngs = {"params": jax.random.PRNGKey(0),
            "masking": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    params = model.init(rngs, batch, mask_ratio=0.75, deterministic=True)
    out = model.apply(params, batch, mask_ratio=0.75, deterministic=True,
                      rngs={"masking": jax.random.PRNGKey(3)})
    for k in ("mim_loss", "res_loss", "mlm_loss"):
        assert np.isfinite(float(out[k])), k
    assert out["mlm_logits"].shape == (b, L, TINY_BERT.vocab_size)


def test_ecamp_visualization_mode():
    model = ECAMP(vit=TINY_VIT, decoder=TINY_DEC, bert=TINY_BERT)
    b, L = 1, 16
    batch = {
        "image": jnp.ones((b, 64, 64, 3)),
        "ids": jnp.ones((b, L), jnp.int32),
        "attention_mask": jnp.ones((b, L), jnp.int32),
        "type_ids": jnp.zeros((b, L), jnp.int32),
    }
    rngs = {"params": jax.random.PRNGKey(0)}
    params = model.init(rngs, batch, mask_ratio=0.0, deterministic=True)
    out = model.apply(params, batch, mask_ratio=0.0, deterministic=True,
                      return_cross_probs=True)
    # cross-attention: (B, heads, L_text, N_patches); 32/16 -> 2x2=4 patches
    assert out["cross_attention"].shape == (b, 2, L, 4)
    assert "mim_loss" not in out


@pytest.mark.slow
def test_seg_vit_shapes():
    cfg = ViTConfig(img_size=64, patch_size=16, embed_dim=64, depth=1,
                    num_heads=2)
    model = SegViT(cfg, out_channels=1, features=(16, 16, 8, 8))
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(variables, x)
    assert logits.shape == (2, 64, 64, 1)


def test_seg_vit_dual_shapes():
    cfg = ViTConfig(img_size=64, patch_size=16, embed_dim=64, depth=1,
                    num_heads=2)
    model = SegViTDual(cfg, out_channels=1, features=(16, 16, 8, 8))
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    disc, cup = model.apply(variables, x)
    assert disc.shape == (1, 64, 64, 1)
    assert cup.shape == (1, 64, 64, 1)


@pytest.mark.slow
def test_detection_model_shapes():
    cfg = ViTConfig(img_size=224, patch_size=16, embed_dim=64, depth=1,
                    num_heads=2)
    model = DetectionModel(cfg, num_classes=1, expansion=4)
    x = jnp.zeros((1, 224, 224, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out0, out1, out2 = model.apply(variables, x)
    assert out0.shape == (1, 18, 7, 7)
    assert out1.shape == (1, 18, 14, 14)
    assert out2.shape == (1, 18, 28, 28)


def test_upsample_align_corners_matches_torch():
    """Matmul-formulated align_corners upsample vs torch nn.Upsample."""
    import pytest

    torch = pytest.importorskip("torch")
    import numpy as np

    from ecamp_tpu.ops.image_ops import upsample_align_corners

    rng = np.random.default_rng(0)
    for h, w, c, s in ((14, 14, 8, 2), (7, 5, 3, 2), (1, 4, 2, 2)):
        x = rng.normal(size=(2, h, w, c)).astype(np.float32)
        got = np.asarray(upsample_align_corners(jnp.asarray(x), s))
        ref = torch.nn.functional.interpolate(
            torch.tensor(x).permute(0, 3, 1, 2), scale_factor=s,
            mode="bilinear", align_corners=True
        ).permute(0, 2, 3, 1).numpy()
        # matmul accumulates the 4 taps in a different order than torch's
        # lerp; fp32 rounding only
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=2e-5)


def test_resize_bicubic_matches_torch_kernel():
    """resize_bicubic must use torch's a=-0.75 cubic convolution (the
    reference's F.interpolate/torchvision tensor path), not jax's a=-0.5."""
    torch = pytest.importorskip("torch")

    from ecamp_tpu.ops.image_ops import resize_bicubic

    rng = np.random.default_rng(0)
    for (h, w, oh, ow) in ((32, 32, 16, 16), (17, 23, 9, 12),
                           (14, 14, 28, 28)):
        x = rng.normal(size=(2, h, w, 3)).astype(np.float32)
        got = np.asarray(resize_bicubic(jnp.asarray(x), (oh, ow)))
        ref = torch.nn.functional.interpolate(
            torch.tensor(x).permute(0, 3, 1, 2), size=(oh, ow),
            mode="bicubic", align_corners=False, antialias=False
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_interpolate_pos_embed_matches_torch():
    """pos-embed interpolation parity vs the reference's torch bicubic
    (util/pos_embed.py:75-96)."""
    torch = pytest.importorskip("torch")

    from ecamp_tpu.nn.pos_embed import interpolate_pos_embed

    rng = np.random.default_rng(1)
    d, orig, new = 16, 14, 28
    pe = rng.normal(size=(1, 1 + orig * orig, d)).astype(np.float32)
    out = interpolate_pos_embed(pe, new)
    grid = torch.tensor(pe[:, 1:].reshape(1, orig, orig, d)
                        ).permute(0, 3, 1, 2)
    ref = torch.nn.functional.interpolate(
        grid, size=(new, new), mode="bicubic", align_corners=False
    ).permute(0, 2, 3, 1).reshape(1, new * new, d).numpy()
    np.testing.assert_allclose(out[:, 1:], ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(out[:, :1], pe[:, :1])  # cls untouched


def test_classifier_features_only():
    from ecamp_tpu.nn import ViTClassifier

    m = ViTClassifier(TINY_VIT, 3)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)))
    feat = m.apply(v, jnp.zeros((2, 32, 32, 3)), features_only=True)
    assert feat.shape == (2, TINY_VIT.embed_dim)


def test_ecamp_features_only_minimal_batch():
    """features_only with mask_ratio=0 must need only batch['image'] and
    skip the BERT stack (image-embedding serving path)."""
    from ecamp_tpu.core import config as cfg
    from ecamp_tpu.nn import ECAMP

    model = ECAMP(vit=TINY_VIT,
                  decoder=cfg.MAEDecoderConfig(embed_dim=16, depth=1,
                                               num_heads=2),
                  bert=cfg.BertConfig(vocab_size=64, hidden_size=32,
                                      num_hidden_layers=1,
                                      num_attention_heads=2,
                                      intermediate_size=64,
                                      max_position_embeddings=8),
                  sr_window=1)
    init_batch = {"image": jnp.zeros((2, 32, 32, 3)),
                  "ids": jnp.zeros((2, 8), jnp.int32),
                  "column": jnp.zeros((2,), jnp.int32),
                  "row": jnp.zeros((2,), jnp.int32)}
    v = model.init({"params": jax.random.PRNGKey(0),
                    "masking": jax.random.PRNGKey(1)},
                   init_batch, mask_ratio=0.0, deterministic=True)
    out = model.apply(v, {"image": jnp.ones((2, 32, 32, 3))},
                      mask_ratio=0.0, deterministic=True,
                      features_only=True)
    assert out["gap_feature"].shape == (2, 32)
    assert "mlm_loss" not in out and "mlm_logits" not in out


def test_resnet_key_mapping_matches_torchvision_names():
    from ecamp_tpu.ckpt.torch_import import _default_key_fn

    cases = {
        ("backbone", "layer1_0", "conv1", "kernel"):
            "backbone.layer1.0.conv1.weight",
        ("backbone", "layer3_5", "bn2", "scale"):
            "backbone.layer3.5.bn2.weight",
        ("backbone", "layer1_0", "downsample_conv", "kernel"):
            "backbone.layer1.0.downsample.0.weight",
        ("backbone", "layer1_0", "downsample_bn", "mean"):
            "backbone.layer1.0.downsample.1.running_mean",
        ("backbone", "bn1", "var"): "backbone.bn1.running_var",
    }
    for path, want in cases.items():
        assert _default_key_fn(path) == want, (path, _default_key_fn(path))
