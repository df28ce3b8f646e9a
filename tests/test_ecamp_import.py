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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_adamw_moment_restore(tiny_variables, tmp_path):
    """Optimizer-state resume (util/misc.py:331-338): torch AdamW
    exp_avg/exp_avg_sq/step must land in the optax ScaleByAdamState with
    the same layout transforms as the weights."""
    import optax

    from ecamp_tpu.ckpt.torch_import import (_map_adam_states,
                                             _optimizer_param_order,
                                             import_ecamp_adamw_state,
                                             load_pth)
    from ecamp_tpu.core.config import OptimizerConfig
    from ecamp_tpu.train.optim import make_optimizer

    g = torch.Generator().manual_seed(2)
    sd = _reference_state_dict(g)
    # realism: a buffer and the frozen sincos embeddings must be excluded
    # from the index reconstruction (named_parameters vs state_dict)
    sd["bert_encoder.model.bert.embeddings.position_ids"] = \
        torch.arange(16).unsqueeze(0)
    model_state = {k: v.numpy() for k, v in sd.items()}
    order, n_nd, n_d = _optimizer_param_order(model_state)
    assert "bert_encoder.model.bert.embeddings.position_ids" not in order
    assert "pos_embed" not in order and "decoder_pos_embed" not in order
    assert "bert_encoder.model.cls.predictions.decoder.bias" not in order
    assert "bert_encoder.model.cls.predictions.bias" in order

    # synthesize the torch AdamW state dict exactly as torch would save it
    opt_sd = {"state": {}, "param_groups": [
        {"params": list(range(n_nd)), "weight_decay": 0.0},
        {"params": list(range(n_nd, n_nd + n_d)), "weight_decay": 0.05}]}
    for i, name in enumerate(order):
        t = sd[name]
        opt_sd["state"][i] = {
            "step": torch.tensor(123.0),
            "exp_avg": torch.full_like(t, float(i)),
            "exp_avg_sq": torch.full_like(t, float(i) + 0.5)}
    # one non-constant moment to verify the Linear transpose
    de = order.index("decoder_embed.weight")
    opt_sd["state"][de]["exp_avg"] = torch.arange(
        32 * 64, dtype=torch.float32).reshape(32, 64)

    path = str(tmp_path / "ECAMP_resume.pth")
    torch.save({"model": sd, "optimizer": opt_sd, "epoch": 7}, path)

    params = tiny_variables["params"]
    tx = make_optimizer(OptimizerConfig(name="adamw", lr=1.5e-4,
                                        betas=(0.9, 0.95), weight_decay=0.05,
                                        schedule="constant"))
    opt_state = tx.init(params)
    new_opt, n_loaded, step = import_ecamp_adamw_state(opt_state, params,
                                                       load_pth(path))
    assert step == 123
    assert n_loaded > 50  # nearly all leaves carry moments

    found = {}
    _map_adam_states(new_opt, lambda a: found.update(adam=a) or a)
    adam = found["adam"]
    assert int(adam.count) == 123
    # scalar index spot-checks
    ct = order.index("cls_token")
    np.testing.assert_allclose(np.asarray(adam.mu["cls_token"]),
                               np.full((1, 1, 64), float(ct)))
    np.testing.assert_allclose(np.asarray(adam.nu["cls_token"]),
                               np.full((1, 1, 64), float(ct) + 0.5))
    # transpose check: torch (out,in)=(32,64) -> flax kernel (64,32)
    np.testing.assert_allclose(
        np.asarray(adam.mu["decoder_embed"]["kernel"]),
        np.arange(32 * 64, dtype=np.float32).reshape(32, 64).T)
    # tied MLM-head bias: moments come from cls.predictions.bias
    pb = order.index("bert_encoder.model.cls.predictions.bias")
    np.testing.assert_allclose(
        np.asarray(adam.mu["bert"]["cls"]["decoder"]["bias"]),
        np.full((128,), float(pb)))

    # training continues from the restored moments without error
    upd, _ = tx.update(jax.tree_util.tree_map(jnp.ones_like, params),
                       new_opt, params)
    assert all(np.isfinite(np.asarray(u)).all()
               for u in jax.tree_util.tree_leaves(upd))


def test_adamw_moment_restore_rejects_mismatched_groups(tiny_variables,
                                                        tmp_path):
    from ecamp_tpu.ckpt.torch_import import import_ecamp_adamw_state

    g = torch.Generator().manual_seed(3)
    sd = _reference_state_dict(g)
    ckpt = {"model": {k: v.numpy() for k, v in sd.items()},
            "optimizer": {"state": {}, "param_groups": [
                {"params": [0, 1], "weight_decay": 0.0}]}}
    with pytest.raises(ValueError, match="param-group"):
        import_ecamp_adamw_state(None, tiny_variables["params"], ckpt)


def _tiny_trunk_sd(g, D=32, P=16, depth=1):
    """Reference-named ViT trunk state dict (timm naming) for seg import."""
    def t(*s):
        return torch.randn(*s, generator=g)

    sd = {"cls_token": t(1, 1, D), "pos_embed": t(1, 5, D),
          "patch_embed.proj.weight": t(D, 3, P, P),
          "patch_embed.proj.bias": t(D)}
    for i in range(depth):
        pre = f"blocks.{i}."
        for n, shape in [("norm1.weight", (D,)), ("norm1.bias", (D,)),
                         ("attn.qkv.weight", (3 * D, D)),
                         ("attn.qkv.bias", (3 * D,)),
                         ("attn.proj.weight", (D, D)),
                         ("attn.proj.bias", (D,)),
                         ("norm2.weight", (D,)), ("norm2.bias", (D,)),
                         ("mlp.fc1.weight", (4 * D, D)),
                         ("mlp.fc1.bias", (4 * D,)),
                         ("mlp.fc2.weight", (D, 4 * D)),
                         ("mlp.fc2.bias", (D,))]:
            sd[pre + n] = t(*shape)
    return sd


@pytest.mark.slow
def test_seg_import_gloria_flavor(tmp_path):
    """RIGA gloria baseline branch (train_RIGA.py:110-131): state_dict keys
    carry a gloria.img_encoder.model. prefix, matched against encoder.-
    stripped SegViT keys."""
    from ecamp_tpu.ckpt import import_seg_vit
    from ecamp_tpu.core.config import ViTConfig
    from ecamp_tpu.nn.seg import SegViT

    vit = ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=1,
                    num_heads=2)
    model = SegViT(vit, out_channels=1, sample_rate=4,
                   features=(16, 8, 8, 8))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                           train=False)

    g = torch.Generator().manual_seed(5)
    trunk = _tiny_trunk_sd(g)
    sd = {"gloria.img_encoder.model." + k: v for k, v in trunk.items()}
    path = str(tmp_path / "gloria.pth")
    torch.save({"state_dict": sd}, path)

    v1, loaded, _ = import_seg_vit(variables, path, flavor="gloria")
    assert len(loaded) >= 14  # trunk fully matched
    np.testing.assert_allclose(
        np.asarray(v1["params"]["encoder"]["trunk"]["cls_token"]),
        trunk["cls_token"].numpy())
    np.testing.assert_allclose(
        np.asarray(v1["params"]["encoder"]["trunk"]["blocks_0"]["mlp"]["fc1"]
                   ["kernel"]),
        trunk["blocks.0.mlp.fc1.weight"].numpy().T)
    # default flavor must NOT match gloria-prefixed keys
    _, loaded_plain, _ = import_seg_vit(variables, path, flavor="ecamp")
    assert loaded_plain == []


@pytest.mark.slow
def test_single_channel_vit_factory():
    """vit_base_patch16_singlechannel parity (models_vit.py:131-136):
    in_chans=1 factory runs on 1-channel input."""
    from ecamp_tpu.core.config import vit_base_singlechannel
    from ecamp_tpu.nn.vit import ViTClassifier

    c = vit_base_singlechannel(img_size=32)
    assert c.in_chans == 1
    model = ViTClassifier(c, num_classes=3)
    x = jnp.zeros((2, 32, 32, 1))
    v = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(v, x)
    assert logits.shape == (2, 3)
    assert v["params"]["trunk"]["patch_embed"]["proj"]["kernel"].shape[2] == 1


def test_pos_embed_interpolated_on_resolution_mismatch(tmp_path):
    """Importing a 224-trained checkpoint into a different-resolution
    classifier bicubic-interpolates pos_embed instead of dropping it
    (reference util/pos_embed.py:75-96 interpolate_pos_embed)."""
    from ecamp_tpu.ckpt import import_vit_classifier
    from ecamp_tpu.core.config import ViTConfig
    from ecamp_tpu.nn.pos_embed import interpolate_pos_embed
    from ecamp_tpu.nn.vit import ViTClassifier

    # ckpt trained at 64px (4x4 grid, 17 tokens), target model at 32px
    g = torch.Generator().manual_seed(6)
    sd = _tiny_trunk_sd(g)
    sd["pos_embed"] = torch.randn(1, 17, 32, generator=g)
    path = str(tmp_path / "res224.pth")
    torch.save({"model": sd}, path)

    model = ViTClassifier(ViTConfig(img_size=32, patch_size=16, embed_dim=32,
                                    depth=1, num_heads=2), num_classes=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    v1, loaded, _ = import_vit_classifier(variables, path)
    assert "pos_embed" in loaded
    expect = interpolate_pos_embed(sd["pos_embed"].numpy(), 2)
    np.testing.assert_allclose(
        np.asarray(v1["params"]["trunk"]["pos_embed"]), expect, rtol=1e-5)
