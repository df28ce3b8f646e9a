"""Torch-free .pth writer: reader round-trip, real torch.load
compatibility, and full-coverage family round-trips through the
importers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecamp_tpu.core import config as cfg

TINY = cfg.ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=1,
                     num_heads=2)


def test_write_pth_roundtrip_own_reader(tmp_path):
    from ecamp_tpu.ckpt.torch_export import write_pth
    from ecamp_tpu.ckpt.torch_reader import load_pth_file

    obj = {
        "model": {"w": np.arange(12, dtype=np.float32).reshape(3, 4),
                  "idx": np.array([1, 2, 3], np.int64),
                  "flag": np.array([True, False])},
        "epoch": 7,
        "lr": 1.5e-4,
        "name": "ckpt",
        "none": None,
        "nested": {"big": 2 ** 40, "neg": -5},
        "list": [1, 2.5, "x"],
    }
    p = str(tmp_path / "out.pth")
    write_pth(obj, p)
    back = load_pth_file(p)
    np.testing.assert_array_equal(back["model"]["w"], obj["model"]["w"])
    np.testing.assert_array_equal(back["model"]["idx"], obj["model"]["idx"])
    np.testing.assert_array_equal(back["model"]["flag"], obj["model"]["flag"])
    assert back["epoch"] == 7 and back["lr"] == 1.5e-4
    assert back["name"] == "ckpt" and back["none"] is None
    assert back["nested"] == {"big": 2 ** 40, "neg": -5}
    assert back["list"] == [1, 2.5, "x"]


def test_write_pth_loads_with_real_torch(tmp_path):
    torch = pytest.importorskip("torch")
    from ecamp_tpu.ckpt.torch_export import write_pth

    w = np.random.default_rng(0).normal(size=(4, 5)).astype(np.float32)
    p = str(tmp_path / "t.pth")
    write_pth({"model": {"layer.weight": w}, "epoch": 3}, p)
    ckpt = torch.load(p, map_location="cpu", weights_only=True)
    assert ckpt["epoch"] == 3
    np.testing.assert_array_equal(ckpt["model"]["layer.weight"].numpy(), w)


def _randomize(variables, seed=0):
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    rng = np.random.default_rng(seed)
    new = [np.asarray(rng.normal(size=np.shape(x)), np.float32)
           for x in leaves]
    return jax.tree_util.tree_unflatten(treedef, new)


def test_ecamp_pretrain_export_import_roundtrip(tmp_path):
    from ecamp_tpu.ckpt.torch_export import export_ecamp_pretrain
    from ecamp_tpu.ckpt.torch_import import import_ecamp_pretrain
    from ecamp_tpu.nn import ECAMP

    model = ECAMP(vit=TINY, decoder=cfg.MAEDecoderConfig(embed_dim=16,
                                                         depth=1, num_heads=2),
                  bert=cfg.BertConfig(vocab_size=64, hidden_size=32,
                                      num_hidden_layers=1,
                                      num_attention_heads=2,
                                      intermediate_size=64,
                                      max_position_embeddings=8),
                  sr_window=1)
    batch = {"image": jnp.zeros((2, 64, 64, 3)),
             "ids": jnp.zeros((2, 8), jnp.int32),
             "labels": jnp.zeros((2, 8), jnp.int32),
             "weights": jnp.ones((2, 8), jnp.float32),
             "column": jnp.zeros((2,), jnp.int32),
             "row": jnp.zeros((2,), jnp.int32)}
    init = model.init({"params": jax.random.PRNGKey(0),
                       "masking": jax.random.PRNGKey(1)},
                      batch, mask_ratio=0.75, deterministic=True)
    src = _randomize(init)
    p = str(tmp_path / "ecamp.pth")
    export_ecamp_pretrain(src, p, epoch=5)
    restored, loaded, missing = import_ecamp_pretrain(init, p)
    assert missing == [], missing  # every leaf round-trips
    jax.tree_util.tree_map(np.testing.assert_array_equal, restored, src)


def test_classifier_export_import_roundtrip(tmp_path):
    from ecamp_tpu.ckpt.torch_export import export_vit_classifier
    from ecamp_tpu.ckpt.torch_import import import_vit_classifier
    from ecamp_tpu.nn import ViTClassifier

    model = ViTClassifier(TINY, 3)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)))
    src = _randomize(init, seed=1)
    p = str(tmp_path / "cls.pth")
    export_vit_classifier(src, p)
    restored, loaded, missing = import_vit_classifier(init, p)
    assert missing == [], missing
    jax.tree_util.tree_map(np.testing.assert_array_equal, restored, src)


@pytest.mark.slow
def test_seg_det_export_import_roundtrip(tmp_path):
    from ecamp_tpu.ckpt.torch_export import export_detector, export_seg_vit
    from ecamp_tpu.ckpt.torch_import import import_detector, import_seg_vit
    from ecamp_tpu.nn import DetectionModel, SegViT

    seg = SegViT(TINY)
    sinit = seg.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)),
                     train=False)
    ssrc = _randomize(sinit, seed=2)
    sp = str(tmp_path / "seg.pth")
    export_seg_vit(ssrc, sp)
    srest, _, smissing = import_seg_vit(sinit, sp, from_pretrain=False)
    assert smissing == [], smissing
    jax.tree_util.tree_map(np.testing.assert_array_equal, srest, ssrc)

    det = DetectionModel(TINY, num_classes=1, expansion=2)
    dinit = det.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)),
                     train=False)
    dsrc = _randomize(dinit, seed=3)
    dp = str(tmp_path / "det.pth")
    export_detector(dsrc, dp)
    drest, _, dmissing = import_detector(dinit, dp, from_pretrain=False)
    assert dmissing == [], dmissing
    jax.tree_util.tree_map(np.testing.assert_array_equal, drest, dsrc)
