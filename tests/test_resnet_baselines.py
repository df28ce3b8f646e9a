"""ResNet-50 baseline paths (reference Segmentation/train.py:139-180
smp.Unet branch and Detection/train.py:99-131 ResNetDetector branch):
torchvision-style weight import coverage + CLI reachability."""

import sys

import numpy as np
import pytest

from ecamp_tpu.ckpt.torch_import import _default_key_fn, flatten

pytestmark = pytest.mark.slow


def _to_torch_layout(leaf: str, v: np.ndarray) -> np.ndarray:
    """Inverse of torch_import._convert: flax layout -> torch layout."""
    if leaf == "kernel":
        if v.ndim == 2:
            return np.ascontiguousarray(v.T)
        if v.ndim == 4:  # HWIO -> OIHW
            return np.ascontiguousarray(v.transpose(3, 2, 0, 1))
    return np.asarray(v)


def _synthetic_state(variables, keep, key_prefix=""):
    """Build a torch-layout state dict covering every flax leaf selected by
    `keep(generic_key)`; returns (state_dict, expected flax-layout leaves)."""
    rng = np.random.default_rng(0)
    sd, expect = {}, {}
    for path, val in flatten(variables).items():
        generic = _default_key_fn(path[1:])
        if not keep(generic):
            continue
        r = rng.standard_normal(np.shape(val)).astype(np.float32)
        sd[key_prefix + generic] = _to_torch_layout(path[1:][-1], r)
        expect[path] = r
    return sd, expect


def test_resnet_unet_torchvision_import_full_coverage(tmp_path):
    import jax
    import jax.numpy as jnp

    from ecamp_tpu.ckpt import import_resnet_unet
    from ecamp_tpu.ckpt.torch_export import write_pth
    from ecamp_tpu.nn.unet import ResNetUNet

    model = ResNetUNet(out_channels=1)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)

    def is_encoder(key):
        return not key.startswith(("decoder_", "seg_head."))

    sd, expect = _synthetic_state(variables, is_encoder)
    # torchvision dicts also carry fc.* and num_batches_tracked buffers;
    # the importer must tolerate them silently
    sd["fc.weight"] = np.zeros((1000, 2048), np.float32)
    sd["fc.bias"] = np.zeros((1000,), np.float32)
    sd["bn1.num_batches_tracked"] = np.asarray(7)
    path = str(tmp_path / "resnet50.pth")
    write_pth(sd, path)

    new_vars, loaded, missing = import_resnet_unet(variables, path)
    flat = flatten(new_vars)
    n_checked = 0
    for p, r in expect.items():
        np.testing.assert_array_equal(np.asarray(flat[p]), r)
        n_checked += 1
    # resnet50 encoder: 53 conv kernels + 53 BN (scale+bias) params +
    # 106 running-stat buffers = 265 leaves
    assert n_checked == 265
    # decoder/seg_head untouched (kept init)
    for p, v in flatten(variables).items():
        if p not in expect:
            np.testing.assert_array_equal(np.asarray(flat[p]),
                                          np.asarray(v))


def test_resnet_detector_import_model_prefixed(tmp_path):
    """Detection baseline accepts `model.`-prefixed (ResNetDetector.model)
    spellings wrapped in module.img_encoder. (train.py:110-121)."""
    import jax
    import jax.numpy as jnp

    from ecamp_tpu.ckpt import import_detector
    from ecamp_tpu.ckpt.torch_export import write_pth
    from ecamp_tpu.core.config import vit_tiny
    from ecamp_tpu.nn.det import DetectionModel

    model = DetectionModel(vit_tiny(img_size=64), backbone="resnet50")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)

    def is_backbone(key):
        return key.startswith("backbone.")

    sd, expect = _synthetic_state(variables, is_backbone)
    sd = {"module.img_encoder.model." + k[len("backbone."):]: v
          for k, v in sd.items()}
    path = str(tmp_path / "det_resnet.pth")
    write_pth(sd, path)

    new_vars, loaded, _ = import_detector(variables, path,
                                          backbone="resnet50")
    flat = flatten(new_vars)
    assert len(loaded) == len(expect) > 0
    for p, r in expect.items():
        np.testing.assert_array_equal(np.asarray(flat[p]), r)
    # YOLO neck/head keeps init
    for p, v in flatten(variables).items():
        if p not in expect:
            np.testing.assert_array_equal(np.asarray(flat[p]),
                                          np.asarray(v))


def test_finetune_seg_cli_resnet50(tmp_path, monkeypatch, capsys):
    from PIL import Image

    from ecamp_tpu.cli import finetune_seg

    rng = np.random.default_rng(0)
    lists = tmp_path / "lists" / "SIIM"
    lists.mkdir(parents=True)
    imgdir = tmp_path / "imgs" / "train" / "images" / "1024" / "dicom"
    imgdir.mkdir(parents=True)
    for split, n in (("train", 4), ("val", 2), ("test", 2)):
        rows = ["ImageId,EncodedPixels"]
        for i in range(n):
            iid = f"{split}{i}"
            arr = rng.integers(0, 255, (128, 128, 3)).astype(np.uint8)
            Image.fromarray(arr).save(imgdir / f"{iid}.png")
            rows.append(f"{iid},{'100 500' if i % 2 == 0 else '-1'}")
        (lists / f"{split}_list.csv").write_text("\n".join(rows) + "\n")

    out = tmp_path / "out"
    argv = ["finetune_seg", "--task", "SIIM",
            "--dataset_path", str(tmp_path / "imgs"),
            "--list_path", str(tmp_path / "lists"),
            "--img_size", "64", "--model", "resnet50",
            "--batch_size", "2", "--eval_batch_size", "2",
            "--num_steps", "1", "--warmup_steps", "1",
            "--num_workers", "2", "--output_dir", str(out), "--no_bf16"]
    monkeypatch.setattr(sys, "argv", argv)
    finetune_seg.main()
    assert "TEST dice" in capsys.readouterr().out


def test_finetune_det_cli_resnet50(tmp_path, monkeypatch, capsys):
    from PIL import Image

    from ecamp_tpu.cli import finetune_det

    rng = np.random.default_rng(0)
    lists = tmp_path / "lists" / "RSNA"
    lists.mkdir(parents=True)
    imgdir = tmp_path / "imgs"
    imgdir.mkdir()
    for split, n in (("train", 4), ("val", 2)):
        rows = ["image_path,bbox"]
        for i in range(n):
            name = f"{split}{i}.png"
            arr = rng.integers(0, 255, (128, 128, 3)).astype(np.uint8)
            Image.fromarray(arr).save(imgdir / name)
            rows.append(f'{name},"[[10, 12, 40, 52]]"')
        (lists / f"{split}_list.csv").write_text("\n".join(rows) + "\n")

    out = tmp_path / "out"
    argv = ["finetune_det",
            "--dataset_path", str(imgdir),
            "--list_path", str(tmp_path / "lists"),
            "--img_size", "64", "--model", "resnet50",
            "--batch_size", "2", "--eval_batch_size", "2",
            "--num_steps", "1", "--warmup_steps", "1", "--start_eval", "1",
            "--num_workers", "2", "--output_dir", str(out), "--no_bf16"]
    monkeypatch.setattr(sys, "argv", argv)
    finetune_det.main()
    assert "TEST mAP" in capsys.readouterr().out
