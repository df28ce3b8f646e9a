"""End-to-end TRAINING parity vs the reference (VERDICT r2 #1).

Drives the reference's own Classification/train.py (setup/train/test,
unmodified, via tests/ref_harness stubs) on a synthetic learnable binary
task, and our `ecamp-finetune-cls` CLI on the SAME list files from the
SAME imported trunk init (shared .pth), with identical hyperparameters
(SGD m=0.9, warmup-cosine, BCE, clip 1.0, drop_path 0.1, eval cadence =
one epoch of optimizer steps, patience/best-AUC selection).

The RNG streams differ by construction (torch vs JAX dropout/shuffle),
so the claim is trajectory/metric agreement, not bitwise equality: both
must learn the task (test AUC >= 0.9) and agree within 0.05 AUC."""

import json
import os
import sys
from functools import partial

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")


TASK = "RSNA"  # 1 class, multilabel path (BCE + AUROC)
N_TRAIN, N_VAL, N_TEST = 96, 48, 48
IMG = 64


@pytest.fixture(scope="module")
def brightness_corpus(tmp_path_factory):
    """Binary 'bright vs dark' images: the signal is global image
    brightness, so it survives RandomResizedCrop/flip/grayscale in both
    pipelines."""
    from PIL import Image

    root = tmp_path_factory.mktemp("parity")
    imgdir = root / "imgs"
    listdir = root / "datasets" / TASK
    imgdir.mkdir()
    listdir.mkdir(parents=True)
    rng = np.random.default_rng(7)
    for split, n in (("train", N_TRAIN), ("val", N_VAL), ("test", N_TEST)):
        lines = []
        for i in range(n):
            label = i % 2
            base = 170 if label else 100
            arr = np.clip(rng.normal(base, 15, (IMG, IMG, 3)), 0,
                          255).astype(np.uint8)
            name = f"{split}{i}.png"
            Image.fromarray(arr).save(imgdir / name)
            lines.append(f"{name} {label}")
        (listdir / f"{split}_list.txt").write_text("\n".join(lines) + "\n")
    return root


def _tiny_factory(models_vit):
    import torch.nn as nn

    def factory(**kwargs):
        return models_vit.VisionTransformer(
            img_size=IMG, patch_size=16, embed_dim=64, depth=4, num_heads=4,
            mlp_ratio=4, qkv_bias=True,
            norm_layer=partial(nn.LayerNorm, eps=1e-6), **kwargs)

    return factory


@pytest.fixture(scope="module")
def shared_init_pth(brightness_corpus):
    """Random-init reference trunk (global_pool variant, incl fc_norm),
    head excluded -> both sides re-init their heads at std 2e-5."""
    from tests.ref_harness.driver import _import_ref_train

    _import_ref_train()
    models_vit = sys.modules["models_vit"]
    torch.manual_seed(0)
    model = _tiny_factory(models_vit)(num_classes=1, drop_path_rate=0.1,
                                      global_pool=True)
    sd = {k: v for k, v in model.state_dict().items()
          if not k.startswith("head.")}
    path = str(brightness_corpus / "shared_init.pth")
    torch.save({"model": sd}, path)
    return path


HP = dict(num_steps=36, warmup_steps=6, learning_rate=3e-3,
          train_batch_size=8, eval_batch_size=16, seed=42)


@pytest.fixture(scope="module")
def reference_result(brightness_corpus, shared_init_pth):
    from tests.ref_harness.driver import run_reference_cls

    return run_reference_cls(
        str(brightness_corpus), shared_init_pth, model_name="vit_test_tiny",
        num_classes=1, task=TASK, img_size=IMG,
        tiny_factory=_tiny_factory(sys.modules["models_vit"]), **HP)


@pytest.fixture(scope="module")
def jax_result(brightness_corpus, shared_init_pth):
    from ecamp_tpu.cli import finetune_cls
    from ecamp_tpu.core.config import ViTConfig

    out = brightness_corpus / "jax_out"
    finetune_cls._VIT_FACTORY["test_tiny"] = lambda img_size=IMG: ViTConfig(
        img_size=img_size, patch_size=16, embed_dim=64, depth=4, num_heads=4)
    argv = ["finetune_cls", "--task", TASK,
            "--dataset_path", str(brightness_corpus / "imgs"),
            "--list_path", str(brightness_corpus / "datasets"),
            "--img_size", str(IMG), "--model", "test_tiny",
            "--batch_size", str(HP["train_batch_size"]),
            "--eval_batch_size", str(HP["eval_batch_size"]),
            "--num_steps", str(HP["num_steps"]),
            "--warmup_steps", str(HP["warmup_steps"]),
            "--lr", str(HP["learning_rate"]),
            "--seed", str(HP["seed"]),
            "--pretrained", shared_init_pth,
            "--num_workers", "2", "--output_dir", str(out), "--no_bf16"]
    old_argv = sys.argv
    sys.argv = argv
    try:
        finetune_cls.main()
    finally:
        sys.argv = old_argv
        finetune_cls._VIT_FACTORY.pop("test_tiny", None)
    records = [json.loads(ln) for ln in
               (out / "log.txt").read_text().splitlines()]
    traj = [(r["step"], r["auc"]) for r in records if "auc" in r]
    test_auc = next(r["test"]["auc"] for r in records if "test" in r)
    return {"val_trajectory": traj, "test_auc": float(test_auc)}


def test_both_trainers_learn_the_task(reference_result, jax_result):
    assert reference_result["test_auc"] >= 0.9, reference_result
    assert jax_result["test_auc"] >= 0.9, jax_result


def test_final_auc_parity_within_tolerance(reference_result, jax_result):
    delta = abs(reference_result["test_auc"] - jax_result["test_auc"])
    print(f"ref test AUC {reference_result['test_auc']:.4f}  "
          f"jax test AUC {jax_result['test_auc']:.4f}  delta {delta:.4f}")
    assert delta <= 0.05, (reference_result, jax_result)


@pytest.fixture(scope="module")
def lp_reference_result(brightness_corpus, shared_init_pth):
    """LinearProbe mode: all but `head` frozen (train.py:156-159)."""
    from tests.ref_harness.driver import run_reference_cls

    return run_reference_cls(
        str(brightness_corpus), shared_init_pth, model_name="vit_test_tiny",
        num_classes=1, task=TASK, img_size=IMG, mode="LinearProbe",
        out_name="ref_out_lp",
        tiny_factory=_tiny_factory(sys.modules["models_vit"]), **HP)


@pytest.fixture(scope="module")
def lp_jax_result(brightness_corpus, shared_init_pth):
    from ecamp_tpu.cli import finetune_cls
    from ecamp_tpu.core.config import ViTConfig

    out = brightness_corpus / "jax_out_lp"
    finetune_cls._VIT_FACTORY["test_tiny"] = lambda img_size=IMG: ViTConfig(
        img_size=img_size, patch_size=16, embed_dim=64, depth=4, num_heads=4)
    argv = ["finetune_cls", "--task", TASK, "--linear_probe",
            "--dataset_path", str(brightness_corpus / "imgs"),
            "--list_path", str(brightness_corpus / "datasets"),
            "--img_size", str(IMG), "--model", "test_tiny",
            "--batch_size", str(HP["train_batch_size"]),
            "--eval_batch_size", str(HP["eval_batch_size"]),
            "--num_steps", str(HP["num_steps"]),
            "--warmup_steps", str(HP["warmup_steps"]),
            "--lr", str(HP["learning_rate"]),
            "--seed", str(HP["seed"]),
            "--pretrained", shared_init_pth,
            "--num_workers", "2", "--output_dir", str(out), "--no_bf16"]
    old_argv = sys.argv
    sys.argv = argv
    try:
        finetune_cls.main()
    finally:
        sys.argv = old_argv
        finetune_cls._VIT_FACTORY.pop("test_tiny", None)
    records = [json.loads(ln) for ln in
               (out / "log.txt").read_text().splitlines()]
    test_auc = next(r["test"]["auc"] for r in records if "test" in r)
    return {"test_auc": float(test_auc)}


def test_linear_probe_parity(lp_reference_result, lp_jax_result):
    """Frozen-trunk probe of a RANDOM trunk on a linearly separable
    signal: both sides should still find it through the frozen features,
    and agree."""
    delta = abs(lp_reference_result["test_auc"] - lp_jax_result["test_auc"])
    print(f"LP ref {lp_reference_result['test_auc']:.4f}  "
          f"jax {lp_jax_result['test_auc']:.4f}  delta {delta:.4f}")
    assert lp_reference_result["test_auc"] >= 0.8, lp_reference_result
    assert lp_jax_result["test_auc"] >= 0.8, lp_jax_result
    assert delta <= 0.1


def test_validation_trajectories_track(reference_result, jax_result):
    """Same eval cadence (every 12 optimizer steps): by the final eval
    both trainers should be in the learned regime."""
    ref = dict((s, a) for s, a, _ in reference_result["val_trajectory"])
    jx = dict(jax_result["val_trajectory"])
    common = sorted(set(ref) & set(jx))
    assert common, (ref, jx)
    last = common[-1]
    assert ref[last] >= 0.85 and jx[last] >= 0.85, (ref, jx)
    assert abs(ref[last] - jx[last]) <= 0.1, (ref, jx)
