"""End-to-end SEGMENTATION training parity vs the reference (VERDICT r2
#1 'repeat for one seg config'): the reference's own
Segmentation/train.py (SIIM SegViT path, executed unmodified with tiny
dims) vs our `ecamp-finetune-seg` CLI on the same CSVs from the same
imported trunk, identical recipe (AdamW 2e-4 wd 0.05, warmup-cosine,
MixedLoss 10*focal - log(dice), clip 1.0, eval per epoch, best-dice).

Synthetic learnable task: the mask is a bright rectangle visible in the
image, so dice climbs fast. RNG streams differ (torch vs JAX), so the
claim is metric-level agreement."""

import json
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

IMG_SRC = 128   # on-disk image side; both pipelines resize to 224
N_TRAIN_POS, N_TRAIN_NEG = 24, 24
N_VAL, N_TEST = 12, 12


def _rect_rle(r0, c0, r1, c1, size=1024):
    """RLE string (relative-start convention of the reference's rle2mask:
    flat = out.T.flatten(), 'start length' pairs with starts relative to
    the previous run's end; mask.reshape(W,H).T decodes it)."""
    out = np.zeros((size, size), np.uint8)
    out[r0:r1, c0:c1] = 1
    flat = out.T.flatten()
    idx = np.flatnonzero(np.diff(np.concatenate([[0], flat, [0]])))
    starts_abs, ends_abs = idx[0::2], idx[1::2]
    parts = []
    prev_end = 0
    for s, e in zip(starts_abs, ends_abs):
        parts += [str(s - prev_end), str(e - s)]
        prev_end = e
    return " ".join(parts)


@pytest.fixture(scope="module")
def siim_corpus(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("seg_parity")
    imgdir = root / "imgs" / "train" / "images" / "1024" / "dicom"
    listdir = root / "datasets" / "SIIM"
    imgdir.mkdir(parents=True)
    listdir.mkdir(parents=True)
    rng = np.random.default_rng(11)

    def sample(i, positive):
        arr = rng.normal(90, 12, (IMG_SRC, IMG_SRC, 3))
        if positive:
            # rectangle at a jittered position; same rect drives the mask
            r0 = 24 + int(rng.integers(0, 40))
            c0 = 24 + int(rng.integers(0, 40))
            h = w = 40
            arr[r0:r0 + h, c0:c0 + w] += 90
            s = 1024 // IMG_SRC
            rle = _rect_rle(r0 * s, c0 * s, (r0 + h) * s, (c0 + w) * s)
        else:
            rle = "-1"
        return np.clip(arr, 0, 255).astype(np.uint8), rle

    for split, n_pos, n_neg in (("train", N_TRAIN_POS, N_TRAIN_NEG),
                                ("val", N_VAL // 2, N_VAL // 2),
                                ("test", N_TEST // 2, N_TEST // 2)):
        rows = ["ImageId,EncodedPixels"]
        for i in range(n_pos + n_neg):
            pos = i < n_pos
            arr, rle = sample(i, pos)
            iid = f"{split}{i}"
            Image.fromarray(arr).save(imgdir / f"{iid}.png")
            rows.append(f'{iid},{rle}')
        (listdir / f"{split}_list.csv").write_text("\n".join(rows) + "\n")
    return root


@pytest.fixture(scope="module")
def shared_trunk_pth(siim_corpus):
    """Random-init tiny trunk in the seg checkpoint convention
    ({'model': bare ViT keys}, matched as key2.replace('encoder.',''))."""
    from tests.ref_harness.timm_stub import VisionTransformer

    torch.manual_seed(0)
    m = VisionTransformer(img_size=224, patch_size=16, embed_dim=64,
                          depth=2, num_heads=4, num_classes=0)
    sd = {k: v for k, v in m.state_dict().items()
          if not (k.startswith("norm.") or k.startswith("head."))}
    path = str(siim_corpus / "trunk.pth")
    torch.save({"model": sd}, path)
    return path


# lr 1e-3 x 72 steps: the dice cliff (empty-pred regime -> rectangles)
# sits near step 30-36 for BOTH frameworks on this toy at these dims;
# 2e-4/36 (the real SIIM recipe scale) leaves both in the flat regime.
HP = dict(num_steps=72, warmup_steps=6, learning_rate=1e-3,
          train_batch_size=8, eval_batch_size=8, seed=42)


@pytest.fixture(scope="module")
def reference_result(siim_corpus, shared_trunk_pth):
    from tests.ref_harness.driver import run_reference_seg

    return run_reference_seg(str(siim_corpus), shared_trunk_pth,
                             hidden_size=64, num_layers=2, num_heads=4,
                             decode_features=(16, 16, 8, 8), **HP)


@pytest.fixture(scope="module")
def jax_result(siim_corpus, shared_trunk_pth):
    from ecamp_tpu.cli import finetune_seg
    from ecamp_tpu.core.config import ViTConfig

    out = siim_corpus / "jax_out"
    finetune_seg._VIT_FACTORY["test_tiny"] = lambda img_size=224: ViTConfig(
        img_size=img_size, patch_size=16, embed_dim=64, depth=2,
        num_heads=4)
    argv = ["finetune_seg", "--task", "SIIM",
            "--dataset_path", str(siim_corpus / "imgs"),
            "--list_path", str(siim_corpus / "datasets"),
            "--img_size", "224", "--model", "test_tiny",
            "--decode_features", "16,16,8,8",
            "--batch_size", str(HP["train_batch_size"]),
            "--eval_batch_size", str(HP["eval_batch_size"]),
            "--num_steps", str(HP["num_steps"]),
            "--warmup_steps", str(HP["warmup_steps"]),
            "--lr", str(HP["learning_rate"]),
            "--seed", str(HP["seed"]),
            "--pretrained", shared_trunk_pth,
            "--num_workers", "2", "--output_dir", str(out), "--no_bf16"]
    old = sys.argv
    sys.argv = argv
    try:
        finetune_seg.main()
    finally:
        sys.argv = old
        finetune_seg._VIT_FACTORY.pop("test_tiny", None)
    records = [json.loads(ln) for ln in
               (out / "log.txt").read_text().splitlines()]
    traj = [(r["step"], r["dice"]) for r in records if "dice" in r]
    test_dice = next(r["test_dice"] for r in records if "test_dice" in r)
    return {"val_trajectory": traj, "test_dice": float(test_dice)}


def test_seg_both_trainers_learn(reference_result, jax_result):
    """>= 0.6 is above the trivial predict-empty policy (dice 0.5 on a
    half-negative val set under the empty-mask convention)."""
    print(f"ref test dice {reference_result['test_dice']:.4f}  "
          f"jax test dice {jax_result['test_dice']:.4f}")
    print("ref traj", reference_result["val_trajectory"])
    print("jax traj", jax_result["val_trajectory"])
    assert reference_result["test_dice"] >= 0.6, reference_result
    assert jax_result["test_dice"] >= 0.6, jax_result


def test_seg_dice_parity_within_tolerance(reference_result, jax_result):
    delta = abs(reference_result["test_dice"] - jax_result["test_dice"])
    assert delta <= 0.15, (reference_result, jax_result)
