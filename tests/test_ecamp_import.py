"""Full-model checkpoint import coverage: a synthetic torch state dict with
the reference's exact ECAMP key names must fill EVERY leaf of the flax
pretrain model (convention 1, util/misc.py:315-338), with verified layout
transforms. Also covers the visualization rename (cross_attn_layer ->
context_fusion_layer)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from ecamp_tpu.core.config import BertConfig, MAEDecoderConfig, ViTConfig
from ecamp_tpu.nn import ECAMP

VIT = ViTConfig(img_size=32, patch_size=16, embed_dim=64, depth=2, num_heads=2)
DEC = MAEDecoderConfig(embed_dim=32, depth=1, num_heads=2)
BERT = BertConfig(vocab_size=128, hidden_size=64, num_hidden_layers=2,
                  num_attention_heads=2, intermediate_size=128,
                  max_position_embeddings=16)


def _reference_state_dict(g):
    def t(*s):
        return torch.randn(*s, generator=g)

    sd = {}
    D, P = 64, 16
    sd["cls_token"] = t(1, 1, D)
    sd["pos_embed"] = t(1, 5, D)  # regenerated constant; ignored on import
    sd["patch_embed.proj.weight"] = t(D, 3, P, P)
    sd["patch_embed.proj.bias"] = t(D)

    def block(prefix, dim, mlp):
        sd[prefix + "norm1.weight"] = t(dim)
        sd[prefix + "norm1.bias"] = t(dim)
        sd[prefix + "attn.qkv.weight"] = t(3 * dim, dim)
        sd[prefix + "attn.qkv.bias"] = t(3 * dim)
        sd[prefix + "attn.proj.weight"] = t(dim, dim)
        sd[prefix + "attn.proj.bias"] = t(dim)
        sd[prefix + "norm2.weight"] = t(dim)
        sd[prefix + "norm2.bias"] = t(dim)
        sd[prefix + "mlp.fc1.weight"] = t(mlp, dim)
        sd[prefix + "mlp.fc1.bias"] = t(mlp)
        sd[prefix + "mlp.fc2.weight"] = t(dim, mlp)
        sd[prefix + "mlp.fc2.bias"] = t(dim)

    for i in range(2):
        block(f"blocks.{i}.", D, 4 * D)
    sd["norm.weight"] = t(D)
    sd["norm.bias"] = t(D)

    # decoder
    dd = 32
    sd["decoder_embed.weight"] = t(dd, D)
    sd["decoder_embed.bias"] = t(dd)
    sd["mask_token"] = t(1, 1, dd)
    sd["decoder_pos_embed"] = t(1, 5, dd)
    block("decoder_blocks.0.", dd, 4 * dd)
    sd["decoder_norm.weight"] = t(dd)
    sd["decoder_norm.bias"] = t(dd)
    sd["decoder_pred.weight"] = t(P * P * 3, dd)
    sd["decoder_pred.bias"] = t(P * P * 3)
    sd["super_res.conv1.weight"] = t(3, 3, 3, 3)
    sd["super_res.conv1.bias"] = t(3)
    sd["super_res.conv2.weight"] = t(3, 3, 3, 3)
    sd["super_res.conv2.bias"] = t(3)
    sd["bert_mlp.weight"] = t(64, D)
    sd["bert_mlp.bias"] = t(64)

    # multimodal BERT (HF naming under bert_encoder.model.)
    H = 64
    bp = "bert_encoder.model.bert."
    sd[bp + "embeddings.word_embeddings.weight"] = t(128, H)
    sd[bp + "embeddings.position_embeddings.weight"] = t(16, H)
    sd[bp + "embeddings.token_type_embeddings.weight"] = t(2, H)
    sd[bp + "embeddings.LayerNorm.weight"] = t(H)
    sd[bp + "embeddings.LayerNorm.bias"] = t(H)

    def self_attn(prefix):
        for n in ("query", "key", "value"):
            sd[prefix + n + ".weight"] = t(H, H)
            sd[prefix + n + ".bias"] = t(H)

    def self_output(prefix):
        sd[prefix + "dense.weight"] = t(H, H)
        sd[prefix + "dense.bias"] = t(H)
        sd[prefix + "LayerNorm.weight"] = t(H)
        sd[prefix + "LayerNorm.bias"] = t(H)

    def ffn(prefix):
        sd[prefix + "intermediate.dense.weight"] = t(128, H)
        sd[prefix + "intermediate.dense.bias"] = t(128)
        sd[prefix + "output.dense.weight"] = t(H, 128)
        sd[prefix + "output.dense.bias"] = t(H)
        sd[prefix + "output.LayerNorm.weight"] = t(H)
        sd[prefix + "output.LayerNorm.bias"] = t(H)

    fp = bp + "context_fusion_layer."
    self_attn(fp + "attention.self.")
    self_output(fp + "attention.output.")
    self_attn(fp + "cross_self_attention.")
    sd[fp + "gap_mlp.weight"] = t(H, H)
    sd[fp + "gap_mlp.bias"] = t(H)
    self_output(fp + "out_layer.")
    ffn(fp)
    for i in range(2):
        lp = bp + f"encoder.layer.{i}."
        self_attn(lp + "attention.self.")
        self_output(lp + "attention.output.")
        ffn(lp)
    cp = "bert_encoder.model.cls.predictions."
    sd[cp + "transform.dense.weight"] = t(H, H)
    sd[cp + "transform.dense.bias"] = t(H)
    sd[cp + "transform.LayerNorm.weight"] = t(H)
    sd[cp + "transform.LayerNorm.bias"] = t(H)
    sd[cp + "decoder.weight"] = t(128, H)
    sd[cp + "decoder.bias"] = t(128)
    sd[cp + "bias"] = sd[cp + "decoder.bias"]  # HF alias
    return sd


@pytest.fixture(scope="module")
def tiny_variables():
    model = ECAMP(vit=VIT, decoder=DEC, bert=BERT, sr_window=1)
    b, L = 1, 16
    batch = {
        "image": jnp.zeros((b, 64, 64, 3)),
        "ids": jnp.zeros((b, L), jnp.int32),
        "labels": jnp.zeros((b, L), jnp.int32),
        "attention_mask": jnp.ones((b, L), jnp.int32),
        "type_ids": jnp.zeros((b, L), jnp.int32),
        "weights": jnp.ones((b, L)),
        "column": jnp.zeros((b,), jnp.int32),
        "row": jnp.zeros((b,), jnp.int32),
    }
    rngs = {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)}
    return model.init(rngs, batch, mask_ratio=0.75, deterministic=True)


def test_full_ecamp_import_coverage(tiny_variables, tmp_path):
    from ecamp_tpu.ckpt import import_ecamp_pretrain

    g = torch.Generator().manual_seed(0)
    sd = _reference_state_dict(g)
    path = str(tmp_path / "ecamp.pth")
    torch.save({"model": sd, "epoch": 3}, path)
    v1, loaded, missing = import_ecamp_pretrain(tiny_variables, path)
    assert missing == [], f"unmapped flax leaves: {missing}"
    # spot value checks incl. transposes
    np.testing.assert_allclose(
        np.asarray(v1["params"]["bert"]["context_fusion_layer"]["gap_mlp"]["kernel"]),
        sd["bert_encoder.model.bert.context_fusion_layer.gap_mlp.weight"].numpy().T)
    np.testing.assert_allclose(
        np.asarray(v1["params"]["bert"]["embeddings"]["word_embeddings"]["embedding"]),
        sd["bert_encoder.model.bert.embeddings.word_embeddings.weight"].numpy())
    np.testing.assert_allclose(
        np.asarray(v1["params"]["super_res"]["conv1"]["kernel"]),
        sd["super_res.conv1.weight"].numpy().transpose(2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(v1["params"]["bert"]["layer_1"]["output"]["dense"]["kernel"]),
        sd["bert_encoder.model.bert.encoder.layer.1.output.dense.weight"].numpy().T)


def test_visualization_rename_convention(tiny_variables, tmp_path):
    """cross_attn_layer checkpoints load after the rename
    (Visualization/main_visualization.py:88-93)."""
    from ecamp_tpu.ckpt import import_ecamp_pretrain

    g = torch.Generator().manual_seed(1)
    sd = _reference_state_dict(g)
    sd = {k.replace("context_fusion_layer", "cross_attn_layer"): v
          for k, v in sd.items()}
    path = str(tmp_path / "ecamp_old.pth")
    torch.save({"model": sd}, path)
    _, loaded, missing = import_ecamp_pretrain(tiny_variables, path)
    assert missing == []
