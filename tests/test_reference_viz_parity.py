"""In-place VISUALIZATION parity vs the reference (VERDICT coverage V1/V2
direct evidence): drive the reference Visualization model — the flavor
whose context-fusion layer returns raw cross-attention probabilities
(Visualization/module/context_fusion.py:57) — on CPU from a fresh tiny
init, import the identical weights through our `.pth` importer, and
compare the cross-attention probs and the final heatmap post-processing
chain (main_visualization.py:153-167) number-for-number.

Key-order quirk: at mask_ratio=0 the reference still shuffles all image
tokens through random_masking's argsort(rand) (model_ecamp.py:166-191),
so its key axis is a random patch permutation; our model uses identity
order at ratio 0 (`nn/mae.py::image_encoder`). Attention over a
permuted key set is permutation-EQUIVARIANT (pos-embed is added before
the shuffle), so the runner replays the shuffle and returns
patch-ordered probs — which must match ours exactly.
"""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

TINY = dict(embed_dim=64, depth=2, num_heads=4,
            decoder_embed_dim=64, decoder_depth=1, decoder_num_heads=4,
            bert_hidden=64, bert_layers=2, bert_heads=4,
            bert_intermediate=128)
L_TEXT = 256     # main_visualization.py:111 pads/truncates to 256
N_REAL = 12      # real (non-pad) token count
TOKEN_INDEX = 4  # the row the reference visualizes (:154)


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(3)
    img_nhwc = rng.normal(size=(1, 224, 224, 3)).astype(np.float32)
    ids = np.zeros((1, L_TEXT), dtype=np.int64)
    ids[0, :N_REAL] = rng.integers(1, 30000, N_REAL)
    attention_mask = np.zeros((1, L_TEXT), dtype=np.int64)
    attention_mask[0, :N_REAL] = 1
    type_ids = np.zeros((1, L_TEXT), dtype=np.int64)
    return {"img_nhwc": img_nhwc, "ids": ids,
            "attention_mask": attention_mask, "type_ids": type_ids}


@pytest.fixture(scope="module")
def reference_result(inputs, tmp_path_factory):
    from tests.ref_harness.driver import run_reference_visualization

    pth = tmp_path_factory.mktemp("viz") / "viz_init.pth"
    res = run_reference_visualization(
        str(pth),
        image=np.transpose(inputs["img_nhwc"], (0, 3, 1, 2)),
        ids=inputs["ids"], attention_mask=inputs["attention_mask"],
        type_ids=inputs["type_ids"], **TINY)
    res["pth"] = str(pth)
    return res


@pytest.fixture(scope="module")
def jax_probs(inputs, reference_result):
    import jax
    import jax.numpy as jnp

    from ecamp_tpu.ckpt import import_ecamp_pretrain
    from ecamp_tpu.core import config as cfg
    from ecamp_tpu.nn.mae import ECAMP

    model = ECAMP(
        vit=cfg.ViTConfig(img_size=224, patch_size=16,
                          embed_dim=TINY["embed_dim"], depth=TINY["depth"],
                          num_heads=TINY["num_heads"]),
        decoder=cfg.MAEDecoderConfig(embed_dim=TINY["decoder_embed_dim"],
                                     depth=TINY["decoder_depth"],
                                     num_heads=TINY["decoder_num_heads"]),
        bert=cfg.BertConfig(hidden_size=TINY["bert_hidden"],
                            num_hidden_layers=TINY["bert_layers"],
                            num_attention_heads=TINY["bert_heads"],
                            intermediate_size=TINY["bert_intermediate"]),
        dtype=jnp.float32)
    batch = {
        "image": jnp.asarray(inputs["img_nhwc"]),
        "ids": jnp.asarray(inputs["ids"], jnp.int32),
        "attention_mask": jnp.asarray(inputs["attention_mask"], jnp.int32),
        "type_ids": jnp.asarray(inputs["type_ids"], jnp.int32),
    }
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           mask_ratio=0.0, deterministic=True)
    variables, loaded, missing = import_ecamp_pretrain(
        variables, reference_result["pth"])
    assert not missing, f"importer left leaves uncovered: {missing}"
    out = model.apply(variables, batch, mask_ratio=0.0, deterministic=True,
                      return_cross_probs=True)
    return np.asarray(out["cross_attention"], dtype=np.float32)


def test_cross_attention_probs_match(reference_result, jax_probs):
    """The viz model's return value (B, H, L_text, 196) in patch order."""
    ref = reference_result["probs_patch_order"]
    assert jax_probs.shape == ref.shape == (1, TINY["bert_heads"],
                                            L_TEXT, 196)
    np.testing.assert_allclose(jax_probs, ref, atol=2e-5, rtol=1e-4)


def test_shuffle_replay_is_a_permutation(reference_result):
    ids_shuffle = reference_result["ids_shuffle"]
    assert sorted(ids_shuffle.tolist()) == list(range(196))
    # rows must renormalize to 1 after unshuffling (softmax preserved)
    row = reference_result["probs_patch_order"][0, :, TOKEN_INDEX]
    np.testing.assert_allclose(row.sum(axis=-1), 1.0, atol=1e-5)


def test_heatmap_postprocessing_matches(reference_result, jax_probs):
    """Reference post-chain (main_visualization.py:156-167: reshape 14x14,
    head-max, ^0.25, min-max, torch bilinear align_corners=False to 224)
    vs our cli.visualize.heatmap_from_row on the same row."""
    from ecamp_tpu.cli.visualize import heatmap_from_row

    row = reference_result["probs_patch_order"][0, :, TOKEN_INDEX]

    att = row.reshape(row.shape[0], 14, 14)
    amap = att.max(axis=0) ** 0.25
    amap = (amap - amap.min()) / (amap.max() - amap.min())
    t = torch.tensor(amap)[None, None]
    ref_map = torch.nn.functional.interpolate(
        t, size=(224, 224), mode="bilinear",
        align_corners=False).squeeze().numpy()

    ours = heatmap_from_row(jax_probs[0, :, TOKEN_INDEX], out_size=224)
    assert ours.shape == (224, 224)
    np.testing.assert_allclose(ours, ref_map, atol=5e-5)
