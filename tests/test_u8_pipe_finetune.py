"""u8 image pipe for the FINE-TUNE feeders (--u8_pipe on finetune_seg /
finetune_det; finetune_cls is covered by tests/test_u8_pipe.py).

The seg/det pipelines interpolate in f32 (SSR / bilinear resize, reference
albumentations semantics), so — unlike the pretrain/cls transforms whose
f32 path itself normalizes u8-quantized pixels — the u8 pipe QUANTIZES the
interpolated image to the nearest gray level before shipping
(data/datasets.py::_finish_image). The claims under test:

  * dataset level: the u8 output is exactly the rounded pre-normalize
    image of the f32 output (quantization <= half a gray level), 1-channel
    for x-ray tasks, 3-channel for RIGA fundus;
  * step level: a u8 batch reproduces the f32-of-the-same-quantized-pixels
    batch's losses/outputs to ~1 ulp through SegmentationTask /
    DetectionTask (device_normalize_image inside the jitted step).
"""

import numpy as np
import pytest
from PIL import Image

MEAN, STD = 0.4722, 0.3028


def _invert_normalize(f32_img: np.ndarray) -> np.ndarray:
    """Recover the pre-normalize pixel values of the f32 arm."""
    return (f32_img * STD + MEAN) * 255.0


# ---------------------------------------------------------------------------
# dataset level


def _siim_fixture(tmp_path, n=3):
    rng = np.random.default_rng(0)
    lists = tmp_path / "lists" / "SIIM"
    lists.mkdir(parents=True)
    imgdir = tmp_path / "imgs" / "train" / "images" / "1024" / "dicom"
    imgdir.mkdir(parents=True)
    for split in ("train", "val"):
        rows = ["ImageId,EncodedPixels"]
        for i in range(n):
            iid = f"{split}{i}"
            # x-ray sources are grayscale renders (1-ch content): the
            # u8 pipe's 1-channel ship assumes this, as documented
            arr = rng.integers(0, 255, (128, 128)).astype(np.uint8)
            Image.fromarray(arr, "L").save(imgdir / f"{iid}.png")
            rows.append(f"{iid},{'100 5000' if i % 2 == 0 else '-1'}")
        (lists / f"{split}_list.csv").write_text("\n".join(rows) + "\n")
    return str(tmp_path / "lists"), str(tmp_path / "imgs")


@pytest.mark.parametrize("split", ["train", "val"])
def test_siim_dataset_u8_is_quantized_f32(tmp_path, split):
    """Same seed, same split: u8 image == rint(pre-normalize f32 image)
    within half a gray level, channels identical (1-ch shipped)."""
    from ecamp_tpu.data.datasets import SIIMSegmentationDataset

    lists, imgs = _siim_fixture(tmp_path)
    kw = dict(img_size=64, seed=5)
    dsf = SIIMSegmentationDataset(lists, imgs, split, **kw)
    ds8 = SIIMSegmentationDataset(lists, imgs, split, output_u8=True, **kw)
    for i in range(len(dsf)):
        sf, s8 = dsf[i], ds8[i]
        assert s8["image"].dtype == np.uint8
        assert s8["image"].shape == (64, 64, 1)
        assert sf["image"].dtype == np.float32
        assert sf["image"].shape == (64, 64, 3)
        # x-ray channels are identical, so shipping 1 loses nothing
        np.testing.assert_array_equal(sf["image"][..., 0],
                                      sf["image"][..., 1])
        pre = _invert_normalize(sf["image"][..., 0])
        # rounding to the nearest gray level, robust to the ~1-ulp error
        # of inverting the affine normalize
        assert np.abs(pre - s8["image"][..., 0].astype(np.float64)
                      ).max() <= 0.5 + 1e-3
        np.testing.assert_array_equal(sf["mask"], s8["mask"])


def test_rsna_det_dataset_u8_is_quantized_f32(tmp_path):
    from ecamp_tpu.data.datasets import RSNADetectionDataset

    rng = np.random.default_rng(1)
    lists = tmp_path / "lists" / "RSNA"
    lists.mkdir(parents=True)
    imgdir = tmp_path / "imgs"
    imgdir.mkdir()
    rows = ["image_path,bbox"]
    for i in range(3):
        name = f"v{i}.png"
        Image.fromarray(rng.integers(0, 255, (96, 96)).astype(
            np.uint8), "L").save(imgdir / name)
        rows.append(f'{name},"[[10, 12, 40, 50]]"')
    (lists / "val_list.csv").write_text("\n".join(rows) + "\n")

    kw = dict(img_size=64)
    dsf = RSNADetectionDataset(str(tmp_path / "lists"), str(imgdir),
                               "val", **kw)
    ds8 = RSNADetectionDataset(str(tmp_path / "lists"), str(imgdir),
                               "val", output_u8=True, **kw)
    for i in range(len(dsf)):
        sf, s8 = dsf[i], ds8[i]
        assert s8["image"].dtype == np.uint8
        assert s8["image"].shape == (64, 64, 1)
        pre = _invert_normalize(sf["image"][..., 0])
        assert np.abs(pre - s8["image"][..., 0].astype(np.float64)
                      ).max() <= 0.5 + 1e-3
        np.testing.assert_array_equal(sf["target"], s8["target"])


def test_riga_dataset_u8_is_3channel(tmp_path):
    """RIGA fundus images are genuinely color: the u8 pipe ships 3-ch u8
    (no channel drop), masks untouched."""
    from ecamp_tpu.data.datasets import RIGASegmentationDataset

    rng = np.random.default_rng(2)
    lists = tmp_path / "lists" / "RIGA"
    lists.mkdir(parents=True)
    imgdir = tmp_path / "imgs"
    imgdir.mkdir()
    rows = ["img_path,mask_path"]
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (80, 96, 3)).astype(
            np.uint8)).save(imgdir / f"im{i}.png")
        m = np.zeros((80, 96), np.uint8)
        m[20:60, 30:70] = 2
        m[35:50, 40:60] = 1
        Image.fromarray(m, "L").save(imgdir / f"m{i}.png")
        rows.append(f"im{i}.png,m{i}.png")
    (lists / "val_list.csv").write_text("\n".join(rows) + "\n")

    kw = dict(img_size=64)
    dsf = RIGASegmentationDataset(str(tmp_path / "lists"), str(imgdir),
                                  "val", **kw)
    ds8 = RIGASegmentationDataset(str(tmp_path / "lists"), str(imgdir),
                                  "val", output_u8=True, **kw)
    sf, s8 = dsf[0], ds8[0]
    assert s8["image"].dtype == np.uint8
    assert s8["image"].shape == (64, 64, 3)
    pre = _invert_normalize(sf["image"])
    assert np.abs(pre - s8["image"].astype(np.float64)).max() <= 0.5 + 1e-3
    np.testing.assert_array_equal(sf["mask"], s8["mask"])


# ---------------------------------------------------------------------------
# step level: u8 batch == f32(normalize(same quantized pixels)) batch


def _quantized_pair(rng, n, size, channels=1):
    """A u8 gray batch and the f32 batch the host pipe would have shipped
    for the SAME quantized pixels."""
    u8 = rng.integers(0, 256, (n, size, size, channels), np.uint8)
    f32 = (np.broadcast_to(u8, (n, size, size, 3)).astype(np.float32)
           / 255.0 - MEAN) / STD
    return u8, f32


def test_seg_train_and_eval_steps_u8_equals_f32():
    import jax

    from ecamp_tpu.core import config as cfg
    from ecamp_tpu.core.mesh import make_mesh
    from ecamp_tpu.train.segmentation import SegmentationTask

    c = cfg.SegmentationConfig(
        vit=cfg.ViTConfig(img_size=64, patch_size=16, embed_dim=32,
                          depth=2, num_heads=2),
        optimizer=cfg.OptimizerConfig(name="adamw", lr=1e-3,
                                      schedule="constant"),
        mesh=cfg.MeshConfig(data=1), bf16=False,
        data=cfg.DataConfig(img_size=64, mean=MEAN, std=STD),
        decode_features=(16, 16, 8, 8))
    rng = np.random.default_rng(11)
    u8, f32 = _quantized_pair(rng, 2, 64)
    masks = (rng.random((2, 64, 64, 1)) > 0.7).astype(np.float32)

    def run(img):
        task = SegmentationTask(c, mesh=make_mesh(
            c.mesh, devices=jax.devices()[:1]))
        state = task.init_state(jax.random.PRNGKey(0))
        probs0 = task.eval_step(state, img)  # pre-update: pure fwd parity
        state, m = task.train_step(state, img, masks)
        probs1 = task.eval_step(state, img)
        return np.asarray(probs0), float(m["loss"]), np.asarray(probs1)

    p08, l8, p18 = run(u8)
    p0f, lf, p1f = run(f32)
    np.testing.assert_allclose(p08, p0f, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(l8, lf, rtol=1e-6)
    # post-update: AdamW's grad/(sqrt(v)+eps) amplifies ~1-ulp fusion
    # differences at step 1 (v ~ 0) — same artifact as
    # test_hybrid_tp_finetune.py's det note; parity of the math itself is
    # the two tight asserts above
    np.testing.assert_allclose(p18, p1f, rtol=2e-3, atol=1e-3)


def test_det_train_and_eval_steps_u8_equals_f32():
    import jax

    from ecamp_tpu.core import config as cfg
    from ecamp_tpu.core.mesh import make_mesh
    from ecamp_tpu.train.detection import DetectionTask

    c = cfg.DetectionConfig(
        vit=cfg.ViTConfig(img_size=64, patch_size=16, embed_dim=32,
                          depth=2, num_heads=2),
        optimizer=cfg.OptimizerConfig(name="adamw", lr=1e-3,
                                      schedule="constant"),
        mesh=cfg.MeshConfig(data=1), img_size=64, expansion=1, bf16=False,
        data=cfg.DataConfig(img_size=64, mean=MEAN, std=STD))
    rng = np.random.default_rng(12)
    u8, f32 = _quantized_pair(rng, 2, 64)
    targets = np.zeros((2, 3, 5), np.float32)
    targets[:, 0] = [0.0, 0.5, 0.5, 0.4, 0.4]

    def run(img):
        task = DetectionTask(c, mesh=make_mesh(
            c.mesh, devices=jax.devices()[:1]))
        state = task.init_state(jax.random.PRNGKey(0))
        preds0 = task.eval_step(state, img)  # pre-update: pure fwd parity
        state, m = task.train_step(state, img, targets)
        preds1 = task.eval_step(state, img)
        return np.asarray(preds0), float(m["loss"]), np.asarray(preds1)

    p08, l8, p18 = run(u8)
    p0f, lf, p1f = run(f32)
    np.testing.assert_allclose(p08, p0f, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(l8, lf, rtol=1e-6)
    # post-update tolerance: see the seg test's AdamW amplification note
    np.testing.assert_allclose(p18, p1f, rtol=2e-3, atol=1e-3)
