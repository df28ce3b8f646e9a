"""u8 image pipe: ship the quantized single-channel gray host->device,
normalize + broadcast on-device (--u8_pipe, train/pretrain.py::
device_normalize).

The claim under test: the u8 pipe produces EXACTLY the pixels of the f32
pipe — same quantized gray per pixel at the transform level, bitwise-equal
normalized tensors at the step level — while shipping 1/12 the f32 bytes
(1/6 of the default bf16 pipe). Covers both the native C++ kernel
(ecamp_resize_gray_u8, native/ecamp_host.cpp) and the PIL fallback.
"""

import csv
import os
import shutil

import numpy as np
import pytest
from PIL import Image

MEAN, STD = 0.4721, 0.3037


def _save_jpegs(tmp_path):
    rng = np.random.default_rng(7)
    paths = []
    p = os.path.join(str(tmp_path), "gray.jpg")
    Image.fromarray(rng.integers(0, 256, (96, 80), np.uint8).astype(
        np.uint8), "L").save(p, "JPEG", quality=92)
    paths.append(p)
    p = os.path.join(str(tmp_path), "rgb.jpg")
    Image.fromarray(rng.integers(0, 256, (80, 96, 3), np.uint8).astype(
        np.uint8), "RGB").save(p, "JPEG", quality=92)
    paths.append(p)
    return paths


@pytest.mark.parametrize("use_native", [False, True])
@pytest.mark.parametrize("via_load", [False, True])
def test_transform_u8_is_the_f32_pipes_quantized_gray(tmp_path, use_native,
                                                      via_load):
    """Same seed, same image: the u8 output must be exactly the integer
    gray the f32 pipe normalized — recovered by inverting the affine
    normalize (1-ulp f32 error << the 1/510 quantization half-step)."""
    from ecamp_tpu.data import native
    from ecamp_tpu.data.transforms import TrainTransform

    if use_native and native.load_library() is None:
        pytest.skip("libecamp_host.so unavailable")
    for path in _save_jpegs(tmp_path):
        kw = dict(mean=MEAN, std=STD, scale=(0.2, 1.0),
                  interpolation="bicubic", seed=11, use_native=use_native)
        t8 = TrainTransform(64, output_u8=True, **kw)
        tf = TrainTransform(64, **kw)
        if via_load:
            a8, af = t8.load(path), tf.load(path)
        else:
            with Image.open(path) as img:
                a8 = t8(img.copy())
                af = tf(img.copy())
        assert a8.shape == (64, 64, 1) and a8.dtype == np.uint8
        assert af.shape == (64, 64, 3) and af.dtype == np.float32
        np.testing.assert_array_equal(af[..., 0], af[..., 1])
        np.testing.assert_array_equal(af[..., 0], af[..., 2])
        gray = np.rint((af[..., 0] * STD + MEAN) * 255.0).astype(np.uint8)
        np.testing.assert_array_equal(gray, a8[..., 0])


def test_native_gray_u8_matches_pil_fallback(tmp_path):
    """Direct kernel check: native resize_gray_u8 vs PIL
    resize+convert('L') on both L and RGB sources, within one gray level
    — the same bound as resize_norm's PIL parity (PIL resamples with
    INT16 fixed-point weights; the kernel uses f32)."""
    from ecamp_tpu.data import native
    from ecamp_tpu.data.transforms import _interp

    if native.load_library() is None or native.resize_gray_u8(
            np.zeros((4, 4), np.uint8), (0, 0, 4, 4), 2) is None:
        pytest.skip("libecamp_host.so (abi>=2) unavailable")
    rng = np.random.default_rng(3)
    for shape in [(70, 90), (90, 70, 3)]:
        arr = rng.integers(0, 256, shape).astype(np.uint8)
        box = (3.0, 5.0, 66.0, 61.0)
        got = native.resize_gray_u8(arr, box, 48, filter="bilinear")
        pil = Image.fromarray(arr).resize((48, 48), _interp("bilinear"),
                                          box=box).convert("L")
        diff = np.abs(got.astype(np.int32)
                      - np.asarray(pil).astype(np.int32))
        assert diff.max() <= 1


def test_device_normalize_bitwise_matches_host_path():
    """(u8/255 - mean)/std in XLA f32 == the host numpy normalize,
    bitwise, and therefore also after the model's bf16 cast."""
    import jax.numpy as jnp
    import ml_dtypes

    from ecamp_tpu.train.pretrain import device_normalize

    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (2, 16, 16, 1), np.uint8)
    host = (np.broadcast_to(u8, (2, 16, 16, 3)).astype(np.float32)
            / 255.0 - MEAN) / STD
    out = device_normalize({"image": jnp.asarray(u8)}, MEAN, STD)["image"]
    assert out.dtype == jnp.float32 and out.shape == (2, 16, 16, 3)
    np.testing.assert_array_equal(np.asarray(out), host)
    np.testing.assert_array_equal(
        np.asarray(out.astype(jnp.bfloat16)),
        host.astype(ml_dtypes.bfloat16))
    # non-u8 batches pass through untouched (same jitted step, two pipes)
    f32 = {"image": jnp.asarray(host)}
    assert device_normalize(f32, MEAN, STD)["image"] is f32["image"]


def test_train_step_u8_equals_f32_pipe():
    """Two optimizer steps on the tiny pretrain task: the u8 batch must
    reproduce the f32 batch's losses and params to ~1 ulp (inside the
    fused step XLA may reassociate the normalize — e.g. fold /255 and
    /std into one multiply — so bitwise equality is not guaranteed the
    way it is for the standalone device_normalize above)."""
    import jax

    from ecamp_tpu.core import config as cfg
    from ecamp_tpu.core.mesh import make_mesh
    from ecamp_tpu.train.pretrain import PretrainTask

    tiny = cfg.PretrainConfig(
        vit=cfg.ViTConfig(img_size=32, patch_size=16, embed_dim=32,
                          depth=1, num_heads=2),
        decoder=cfg.MAEDecoderConfig(embed_dim=16, depth=1, num_heads=2),
        bert=cfg.BertConfig(vocab_size=64, hidden_size=32,
                            num_hidden_layers=1, num_attention_heads=2,
                            intermediate_size=64,
                            max_position_embeddings=8),
        optimizer=cfg.OptimizerConfig(schedule="constant", lr=1e-3),
        data=cfg.DataConfig(img_size=64, mean=MEAN, std=STD),
        mesh=cfg.MeshConfig(data=1),
        sr_window=1, max_caption_length=8, bf16=False)

    rng = np.random.default_rng(5)

    def mk_batches(as_u8):
        out = []
        for s in range(2):
            gray = np.random.default_rng(100 + s).integers(
                0, 256, (2, 64, 64, 1), np.uint8)
            if as_u8:
                img = gray
            else:
                img = (np.broadcast_to(gray, (2, 64, 64, 3)).astype(
                    np.float32) / 255.0 - MEAN) / STD
            r = np.random.default_rng(200 + s)
            out.append({
                "image": img,
                "ids": r.integers(0, 64, (2, 8)).astype(np.int32),
                "labels": r.integers(0, 64, (2, 8)).astype(np.int32),
                "attention_mask": np.ones((2, 8), np.int32),
                "type_ids": np.zeros((2, 8), np.int32),
                "weights": np.ones((2, 8), np.float32),
                "column": np.zeros((2,), np.int32),
                "row": np.zeros((2,), np.int32)})
        return out

    del rng
    key = jax.random.PRNGKey(13)

    def run(as_u8):
        task = PretrainTask(tiny, mesh=make_mesh(
            tiny.mesh, devices=jax.devices()[:1]))
        state = task.init_state(jax.random.PRNGKey(0))
        losses = []
        for b in mk_batches(as_u8):
            state, m = task.train_step(state, task.shard_batch(b), key)
            losses.append(float(m["loss"]))
        return losses, np.asarray(state.params["cls_token"])

    l8, p8 = run(True)
    lf, pf = run(False)
    np.testing.assert_allclose(l8, lf, rtol=1e-6)
    np.testing.assert_allclose(p8, pf, rtol=1e-5, atol=1e-8)


def test_eval_transform_u8_is_the_f32_pipes_quantized_gray():
    from ecamp_tpu.data.transforms import EvalTransform

    rng = np.random.default_rng(9)
    img = Image.fromarray(rng.integers(0, 256, (80, 96, 3), np.uint8)
                          .astype(np.uint8), "RGB")
    kw = dict(mean=MEAN, std=STD, crop_ratio=0.875)
    a8 = EvalTransform(64, output_u8=True, **kw)(img)
    af = EvalTransform(64, **kw)(img)
    assert a8.shape == (64, 64, 1) and a8.dtype == np.uint8
    gray = np.rint((af[..., 0] * STD + MEAN) * 255.0).astype(np.uint8)
    np.testing.assert_array_equal(gray, a8[..., 0])


def test_cls_train_and_eval_steps_u8_equals_f32():
    """ClassificationTask (--u8_pipe in finetune_cls): u8 batches must
    reproduce the f32 pipe's losses/logits to ~1 ulp (mean/std 0.4722/
    0.3028, reference data_utils.py)."""
    import jax

    from ecamp_tpu.core import config as cfg
    from ecamp_tpu.core.mesh import make_mesh
    from ecamp_tpu.train.classification import ClassificationTask

    mean, std = 0.4722, 0.3028
    c = cfg.ClassificationConfig(
        vit=cfg.ViTConfig(img_size=32, patch_size=16, embed_dim=32,
                          depth=2, num_heads=2),
        optimizer=cfg.OptimizerConfig(name="sgd", lr=1e-2, momentum=0.9,
                                      schedule="constant"),
        mesh=cfg.MeshConfig(data=1), num_classes=3, is_multilabel=True,
        bf16=False, data=cfg.DataConfig(img_size=32, mean=mean, std=std))
    rng = np.random.default_rng(21)
    gray = rng.integers(0, 256, (4, 32, 32, 1), np.uint8)
    f32 = (np.broadcast_to(gray, (4, 32, 32, 3)).astype(np.float32)
           / 255.0 - mean) / std
    labels = rng.integers(0, 2, (4, 3)).astype(np.float32)

    def run(img):
        task = ClassificationTask(c, mesh=make_mesh(
            c.mesh, devices=jax.devices()[:1]))
        state = task.init_state(jax.random.PRNGKey(0))
        state, m = task.train_step(state, img, labels)
        logits = task.eval_step(state, img)
        return float(m["loss"]), np.asarray(logits)

    l8, g8 = run(gray)
    lf, gf = run(f32)
    np.testing.assert_allclose(l8, lf, rtol=1e-6)
    np.testing.assert_allclose(g8, gf, rtol=1e-5, atol=1e-6)


def test_pretrain_dataset_u8_pipe(tmp_path):
    """PretrainReportDataset(image_dtype=np.uint8) emits (S, S, 1) u8
    samples whose gray equals the f32 dataset's normalized channel."""
    from ecamp_tpu.data.datasets import PretrainReportDataset

    root = str(tmp_path)
    rng = np.random.default_rng(1)
    Image.fromarray(rng.integers(0, 256, (96, 96), np.uint8).astype(
        np.uint8), "L").save(os.path.join(root, "im.jpg"), "JPEG")
    with open(os.path.join(root, "mimic-cxr-2.0.0-entity-llm.csv"), "w",
              newline="") as f:
        w = csv.writer(f)
        w.writerow(["img_path", "report", "llm_output"])
        w.writerow([os.path.join(root, "im.jpg"),
                    "no pneumothorax.", "clear lungs."])
    with open(os.path.join(root, "mimic-cxr-2.0.0-attn-label.csv"), "w",
              newline="") as f:
        w = csv.writer(f)
        w.writerow(["label_i", "label_j"])
        w.writerow([1, 1])
    shutil.copy(os.path.join(os.path.dirname(__file__), "..", "ecamp_tpu",
                             "assets", "mimic_wordpiece.json"), root)
    ds8 = PretrainReportDataset(root, img_size=64, seed=4,
                                image_dtype=np.uint8)
    dsf = PretrainReportDataset(root, img_size=64, seed=4)
    s8, sf = ds8[0], dsf[0]
    assert s8["image"].dtype == np.uint8
    assert s8["image"].shape == (64, 64, 1)
    gray = np.rint((sf["image"][..., 0] * STD + MEAN) * 255.0)
    np.testing.assert_array_equal(gray.astype(np.uint8),
                                  s8["image"][..., 0])
    # text/masking fields are untouched by the image dtype
    np.testing.assert_array_equal(s8["ids"], sf["ids"])
