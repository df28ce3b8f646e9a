"""Activation-level parity vs torch implementations.

BERT side: compared against HF transformers modules wired exactly as the
reference wires them (bert_modeling.py / context_fusion.py) — same classes
the reference imports, so matching activations here IS checkpoint
compatibility.

ViT side: timm isn't installed in this image, so the torch reference block
is assembled from torch.nn following timm 0.4.12's published Block
semantics (pre-LN, fused qkv, erf-GELU); this still catches transpose,
ordering, eps, and activation bugs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

RTOL, ATOL = 1e-4, 1e-5


def _t2n(t):
    return t.detach().cpu().numpy()


def _linear_params(linear):
    return {"kernel": _t2n(linear.weight).T, "bias": _t2n(linear.bias)}


def _ln_params(ln):
    return {"weight": _t2n(ln.weight), "bias": _t2n(ln.bias)}


@pytest.fixture(scope="module")
def bert_cfgs():
    from transformers import BertConfig as HFConfig

    from ecamp_tpu.core.config import BertConfig

    mine = BertConfig(vocab_size=120, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=2, intermediate_size=64,
                      max_position_embeddings=24,
                      hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0)
    hf = HFConfig(vocab_size=120, hidden_size=32, num_hidden_layers=2,
                  num_attention_heads=2, intermediate_size=64,
                  max_position_embeddings=24, hidden_dropout_prob=0.0,
                  attention_probs_dropout_prob=0.0, hidden_act="gelu",
                  layer_norm_eps=1e-12)
    hf._attn_implementation = "eager"
    return mine, hf


def test_bert_layer_parity(bert_cfgs):
    from transformers.models.bert.modeling_bert import BertLayer as HFLayer

    from ecamp_tpu.nn.bert import BertLayer, extend_attention_mask

    mine_cfg, hf_cfg = bert_cfgs
    torch.manual_seed(0)
    ref = HFLayer(hf_cfg).eval()

    params = {
        "attention": {
            "self": {
                "query": _linear_params(ref.attention.self.query),
                "key": _linear_params(ref.attention.self.key),
                "value": _linear_params(ref.attention.self.value),
            },
            "output": {
                "dense": _linear_params(ref.attention.output.dense),
                "LayerNorm": _ln_params(ref.attention.output.LayerNorm),
            },
        },
        "intermediate": {"dense": _linear_params(ref.intermediate.dense)},
        "output": {
            "dense": _linear_params(ref.output.dense),
            "LayerNorm": _ln_params(ref.output.LayerNorm),
        },
    }
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 32)).astype(np.float32)
    mask = np.ones((2, 8), np.float32)
    mask[0, 5:] = 0

    with torch.no_grad():
        ext = (1.0 - torch.tensor(mask)[:, None, None, :]) * \
            torch.finfo(torch.float32).min
        ref_out = ref(torch.tensor(x), attention_mask=ext)[0]

    layer = BertLayer(mine_cfg)
    out = layer.apply({"params": params}, jnp.asarray(x),
                      bias=extend_attention_mask(jnp.asarray(mask)))
    np.testing.assert_allclose(np.asarray(out), _t2n(ref_out),
                               rtol=RTOL, atol=ATOL)


def test_bert_embeddings_parity(bert_cfgs):
    from transformers.models.bert.modeling_bert import (
        BertEmbeddings as HFEmb)

    from ecamp_tpu.nn.bert import BertEmbeddings

    mine_cfg, hf_cfg = bert_cfgs
    torch.manual_seed(1)
    ref = HFEmb(hf_cfg).eval()
    params = {
        "word_embeddings": {"embedding": _t2n(ref.word_embeddings.weight)},
        "position_embeddings": {
            "embedding": _t2n(ref.position_embeddings.weight)},
        "token_type_embeddings": {
            "embedding": _t2n(ref.token_type_embeddings.weight)},
        "LayerNorm": _ln_params(ref.LayerNorm),
    }
    ids = np.array([[2, 5, 9, 0, 0], [2, 7, 8, 10, 4]], np.int32)
    with torch.no_grad():
        ref_out = ref(input_ids=torch.tensor(ids, dtype=torch.long))
    emb = BertEmbeddings(mine_cfg)
    out = emb.apply({"params": params}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), _t2n(ref_out),
                               rtol=RTOL, atol=ATOL)


def test_fusion_layer_parity(bert_cfgs):
    """The ECAMP fusion layer, assembled from HF parts exactly as the
    reference wires them (context_fusion.py:7-72)."""
    from transformers.models.bert.modeling_bert import (
        BertAttention, BertIntermediate, BertOutput, BertSelfAttention,
        BertSelfOutput)

    from ecamp_tpu.nn.bert import FusionLayer, extend_attention_mask

    mine_cfg, hf_cfg = bert_cfgs
    torch.manual_seed(2)
    attn = BertAttention(hf_cfg).eval()
    cross = BertSelfAttention(hf_cfg).eval()
    gap_mlp = torch.nn.Linear(32, 32)
    out_layer = BertSelfOutput(hf_cfg).eval()
    inter = BertIntermediate(hf_cfg).eval()
    outp = BertOutput(hf_cfg).eval()

    rng = np.random.default_rng(3)
    hidden = rng.normal(size=(2, 8, 32)).astype(np.float32)
    latent = rng.normal(size=(2, 6, 32)).astype(np.float32)
    gap = rng.normal(size=(2, 1, 32)).astype(np.float32)
    mask = np.ones((2, 8), np.float32)
    mask[1, 6:] = 0

    with torch.no_grad():
        ext = (1.0 - torch.tensor(mask)[:, None, None, :]) * \
            torch.finfo(torch.float32).min
        a = attn(torch.tensor(hidden), ext)[0]
        # reference (transformers 4.42) BertSelfAttention used the ENCODER
        # mask for cross-attention — all-ones image mask -> no bias; in
        # 4.57 the arg is gone, so pass attention_mask=None (equivalent)
        c = cross(a, None, None, torch.tensor(latent))[0]
        c = c + gap_mlp(torch.tensor(gap))
        fused = out_layer(c, a)
        ref_out = outp(inter(fused), fused)

    params = {
        "attention": {
            "self": {"query": _linear_params(attn.self.query),
                     "key": _linear_params(attn.self.key),
                     "value": _linear_params(attn.self.value)},
            "output": {"dense": _linear_params(attn.output.dense),
                       "LayerNorm": _ln_params(attn.output.LayerNorm)},
        },
        "cross_self_attention": {
            "query": _linear_params(cross.query),
            "key": _linear_params(cross.key),
            "value": _linear_params(cross.value)},
        "gap_mlp": _linear_params(gap_mlp),
        "out_layer": {"dense": _linear_params(out_layer.dense),
                      "LayerNorm": _ln_params(out_layer.LayerNorm)},
        "intermediate": {"dense": _linear_params(inter.dense)},
        "output": {"dense": _linear_params(outp.dense),
                   "LayerNorm": _ln_params(outp.LayerNorm)},
    }
    layer = FusionLayer(mine_cfg)
    out = layer.apply({"params": params}, jnp.asarray(hidden),
                      jnp.asarray(latent), jnp.asarray(gap),
                      text_bias=extend_attention_mask(jnp.asarray(mask)))
    np.testing.assert_allclose(np.asarray(out), _t2n(ref_out),
                               rtol=RTOL, atol=ATOL)


def test_mlm_head_parity(bert_cfgs):
    from transformers.models.bert.modeling_bert import BertOnlyMLMHead

    from ecamp_tpu.nn.bert import MLMHead

    mine_cfg, hf_cfg = bert_cfgs
    torch.manual_seed(4)
    ref = BertOnlyMLMHead(hf_cfg).eval()
    params = {
        "transform_dense": _linear_params(ref.predictions.transform.dense),
        "transform_LayerNorm": _ln_params(ref.predictions.transform.LayerNorm),
        "decoder": {"kernel": _t2n(ref.predictions.decoder.weight).T,
                    "bias": _t2n(ref.predictions.decoder.bias)},
    }
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 8, 32)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x))
    out = MLMHead(mine_cfg).apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), _t2n(ref_out),
                               rtol=RTOL, atol=ATOL)


class _TorchTimmBlock(torch.nn.Module):
    """timm 0.4.12 Block semantics: x + attn(norm1(x)); x + mlp(norm2(x));
    fused qkv, scale=head_dim**-0.5, erf-GELU, eps=1e-6."""

    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(dim, eps=1e-6)
        self.qkv = torch.nn.Linear(dim, dim * 3, bias=True)
        self.proj = torch.nn.Linear(dim, dim)
        self.norm2 = torch.nn.LayerNorm(dim, eps=1e-6)
        self.fc1 = torch.nn.Linear(dim, dim * 4)
        self.fc2 = torch.nn.Linear(dim * 4, dim)
        self.heads = heads

    def forward(self, x):
        b, n, d = x.shape
        h = self.heads
        y = self.norm1(x)
        qkv = self.qkv(y).reshape(b, n, 3, h, d // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * ((d // h) ** -0.5)
        attn = attn.softmax(dim=-1)
        y = (attn @ v).transpose(1, 2).reshape(b, n, d)
        x = x + self.proj(y)
        y = self.norm2(x)
        y = self.fc2(torch.nn.functional.gelu(self.fc1(y)))
        return x + y


def test_vit_block_parity():
    from ecamp_tpu.nn.layers import Block

    torch.manual_seed(6)
    ref = _TorchTimmBlock(32, 4).eval()
    params = {
        "norm1": _ln_params(ref.norm1),
        "attn": {"qkv": _linear_params(ref.qkv),
                 "proj": _linear_params(ref.proj)},
        "norm2": _ln_params(ref.norm2),
        "mlp": {"fc1": _linear_params(ref.fc1),
                "fc2": _linear_params(ref.fc2)},
    }
    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 9, 32)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x))
    out = Block(num_heads=4).apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), _t2n(ref_out),
                               rtol=RTOL, atol=ATOL)


def test_patch_embed_conv_parity():
    from ecamp_tpu.nn.layers import PatchEmbed

    torch.manual_seed(8)
    conv = torch.nn.Conv2d(3, 16, kernel_size=8, stride=8).eval()
    rng = np.random.default_rng(9)
    x = rng.normal(size=(2, 24, 24, 3)).astype(np.float32)
    with torch.no_grad():
        ref = conv(torch.tensor(x).permute(0, 3, 1, 2))
        ref = ref.flatten(2).transpose(1, 2)  # (B, L, D)
    params = {"proj": {"kernel": _t2n(conv.weight).transpose(2, 3, 1, 0),
                       "bias": _t2n(conv.bias)}}
    out = PatchEmbed(patch_size=8, embed_dim=16).apply(
        {"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), _t2n(ref),
                               rtol=RTOL, atol=ATOL)


def test_weighted_mlm_loss_parity():
    from ecamp_tpu.ops.losses import weighted_mlm_loss

    torch.manual_seed(10)
    rng = np.random.default_rng(11)
    logits = rng.normal(size=(2, 6, 20)).astype(np.float32)
    labels = rng.integers(0, 20, (2, 6))
    weights = rng.random((2, 6)).astype(np.float32)
    ce = torch.nn.CrossEntropyLoss(reduction="none")(
        torch.tensor(logits).view(-1, 20), torch.tensor(labels).view(-1))
    ref = (ce * torch.tensor(weights).view(-1)).mean()
    mine = weighted_mlm_loss(jnp.asarray(logits),
                             jnp.asarray(labels.astype(np.int32)),
                             jnp.asarray(weights))
    np.testing.assert_allclose(float(mine), float(ref), rtol=1e-5)


def test_focal_dice_mixed_parity():
    """Losses vs the reference formulas executed in torch
    (segmentation_loss.py:7-90)."""
    from ecamp_tpu.ops.losses import dice_coefficient, focal_loss, mixed_loss

    rng = np.random.default_rng(12)
    logits = rng.normal(size=(2, 16, 16)).astype(np.float32)
    target = (rng.random((2, 16, 16)) > 0.6).astype(np.float32)
    tl, tt = torch.tensor(logits), torch.tensor(target)

    max_val = (-tl).clamp(min=0)
    bce = tl - tl * tt + max_val + \
        ((-max_val).exp() + (-tl - max_val).exp()).log()
    invprobs = torch.nn.functional.logsigmoid(-tl * (tt * 2.0 - 1.0))
    ref_focal = ((invprobs * 2.0).exp() * bce).mean()
    p = torch.sigmoid(tl).view(-1)
    t = tt.reshape(-1)
    ref_dice = (2 * (p * t).sum() + 1.0) / (p.sum() + t.sum() + 1.0)
    ref_mixed = 10.0 * ref_focal - torch.log(ref_dice)

    np.testing.assert_allclose(float(focal_loss(logits, target)),
                               float(ref_focal), rtol=1e-5)
    np.testing.assert_allclose(float(dice_coefficient(logits, target)),
                               float(ref_dice), rtol=1e-5)
    np.testing.assert_allclose(float(mixed_loss(logits, target)),
                               float(ref_mixed), rtol=1e-5)
