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
