"""End-to-end detection TRAINING parity vs the reference (VERDICT r2 #1,
"repeat for one det config").

Drives the reference's own Detection/train.py (setup/train/test,
unmodified, via tests/ref_harness stubs — see run_reference_det for the
num_workers=1 bbox-mutation-semantics note and tm_stub for the mAP
metric) on a synthetic bright-square localization task, and our
`ecamp-finetune-det` CLI on the SAME csv lists from the SAME imported
trunk init (shared .pth), with identical hyperparameters (AdamW
(0.9,0.999) wd 1e-6, warmup-cosine, 3-scale YOLO loss, conf/NMS 0.5,
eval per epoch of optimizer steps, best-mAP selection).

The neck/YOLO-head weights are random per side (the reference only
imports trunk weights and freezes the trunk, Detection/train.py:149-174)
and the RNG streams differ, so the claim is trajectory/metric agreement:
both must learn the task (test mAP@[.40:.05:.75] >= 0.8) and agree
within 0.15."""

import json
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

IMG = 64
SQ = 24
N_TRAIN, N_VAL = 48, 16
DIMS = dict(hidden_size=64, num_layers=2, num_heads=4)
HP = dict(num_steps=48, warmup_steps=4, learning_rate=1e-3,
          train_batch_size=8, eval_batch_size=8, seed=42)


@pytest.fixture(scope="module")
def square_corpus(tmp_path_factory):
    """Bright ~24px square on a dark noisy background at one of four
    corner positions (+jitter); the bbox is the square. Survives the
    ToTensor+Normalize-only detection transforms on both sides."""
    from PIL import Image

    root = tmp_path_factory.mktemp("det_parity")
    imgdir = root / "imgs"
    listdir = root / "RSNA"
    imgdir.mkdir()
    listdir.mkdir()
    rng = np.random.default_rng(7)
    for split, n in (("train", N_TRAIN), ("val", N_VAL)):
        rows = ["image_path,bbox"]
        for i in range(n):
            arr = np.clip(rng.normal(30, 10, (IMG, IMG, 3)), 0,
                          255).astype(np.uint8)
            qx = [4, IMG - SQ - 4][i % 2]
            qy = [4, IMG - SQ - 4][(i // 2) % 2]
            x1 = qx + int(rng.integers(0, 5))
            y1 = qy + int(rng.integers(0, 5))
            arr[y1:y1 + SQ, x1:x1 + SQ] = np.clip(
                rng.normal(220, 10, (SQ, SQ, 3)), 0, 255).astype(np.uint8)
            name = f"{split}{i}.png"
            Image.fromarray(arr).save(imgdir / name)
            rows.append(f'{name},"[[{x1}, {y1}, {x1 + SQ}, {y1 + SQ}]]"')
        (listdir / f"{split}_list.csv").write_text("\n".join(rows) + "\n")
    return root


@pytest.fixture(scope="module")
def shared_trunk_pth(square_corpus):
    """Random-init reference det encoder trunk in pretrain-key naming
    (cls_token/pos_embed/patch_embed/blocks.*), det_head excluded —
    both sides keep their own random det_head/neck/YOLO head, which the
    reference leaves trainable (train.py:169-174)."""
    from tests.ref_harness.driver import REF_DET, _import_ref_train

    _import_ref_train(REF_DET, "ref_det_train")
    dbv = sys.modules["detector_backbone_vit"]
    torch.manual_seed(0)
    enc = dbv.VisionTransformer(
        img_size=IMG, patch_size=16, embed_dim=DIMS["hidden_size"],
        depth=DIMS["num_layers"], num_heads=DIMS["num_heads"],
        mlp_ratio=4, qkv_bias=True)
    sd = {k: v for k, v in enc.state_dict().items()
          if not k.startswith("det_head.")}
    path = str(square_corpus / "shared_init.pth")
    torch.save({"model": sd}, path)
    return path


@pytest.fixture(scope="module")
def reference_result(square_corpus, shared_trunk_pth):
    from tests.ref_harness.driver import run_reference_det

    return run_reference_det(str(square_corpus), shared_trunk_pth,
                             img_size=IMG, **DIMS, **HP)


@pytest.fixture(scope="module")
def jax_result(square_corpus, shared_trunk_pth):
    from ecamp_tpu.cli import finetune_det
    from ecamp_tpu.core.config import ViTConfig

    out = square_corpus / "jax_out"
    finetune_det._VIT_FACTORY["det_parity_tiny"] = \
        lambda img_size=IMG: ViTConfig(
            img_size=img_size, patch_size=16,
            embed_dim=DIMS["hidden_size"], depth=DIMS["num_layers"],
            num_heads=DIMS["num_heads"])
    argv = ["finetune_det", "--task", "RSNA",
            "--dataset_path", str(square_corpus / "imgs"),
            "--list_path", str(square_corpus),
            "--img_size", str(IMG), "--model", "det_parity_tiny",
            "--batch_size", str(HP["train_batch_size"]),
            "--eval_batch_size", str(HP["eval_batch_size"]),
            "--num_steps", str(HP["num_steps"]),
            "--warmup_steps", str(HP["warmup_steps"]),
            "--lr", str(HP["learning_rate"]),
            "--seed", str(HP["seed"]), "--start_eval", "1",
            "--pretrained", shared_trunk_pth,
            "--num_workers", "2", "--output_dir", str(out), "--no_bf16"]
    old_argv = sys.argv
    sys.argv = argv
    try:
        finetune_det.main()
    finally:
        sys.argv = old_argv
        finetune_det._VIT_FACTORY.pop("det_parity_tiny", None)
    records = [json.loads(ln) for ln in
               (out / "log.txt").read_text().splitlines()]
    traj = [(r["step"], r["mAP"]) for r in records if "mAP" in r]
    test_map = next(r["test_map"] for r in records if "test_map" in r)
    return {"val_trajectory": traj, "test_map": float(test_map)}


def test_trunk_import_took_effect(square_corpus, shared_trunk_pth):
    """The shared .pth actually lands in our det model's trunk."""
    import jax

    from ecamp_tpu.ckpt import import_detector
    from ecamp_tpu.core.config import ViTConfig
    from ecamp_tpu.nn.det import DetectionModel

    model = DetectionModel(ViTConfig(
        img_size=IMG, patch_size=16, embed_dim=DIMS["hidden_size"],
        depth=DIMS["num_layers"], num_heads=DIMS["num_heads"]))
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, IMG, IMG, 3), np.float32),
                           train=False)
    loaded_vars, loaded, _ = import_detector(variables, shared_trunk_pth,
                                             from_pretrain=True)
    assert len(loaded) > 10, loaded
    ref_sd = torch.load(shared_trunk_pth, weights_only=True)["model"]
    np.testing.assert_allclose(
        np.asarray(loaded_vars["params"]["backbone"]["encoder"]["trunk"]
                   ["cls_token"]).ravel(),
        ref_sd["cls_token"].numpy().ravel(), rtol=1e-6)


def test_both_trainers_learn_the_task(reference_result, jax_result):
    assert reference_result["test_map"] >= 0.8, reference_result
    assert jax_result["test_map"] >= 0.8, jax_result


def test_final_map_parity_within_tolerance(reference_result, jax_result):
    delta = abs(reference_result["test_map"] - jax_result["test_map"])
    print(f"ref test mAP {reference_result['test_map']:.4f}  "
          f"jax test mAP {jax_result['test_map']:.4f}  delta {delta:.4f}")
    assert delta <= 0.15, (reference_result, jax_result)


def test_validation_trajectories_track(reference_result, jax_result):
    """Same eval cadence (every 6 optimizer steps): by the final eval
    both trainers must be in the learned regime."""
    ref = dict(reference_result["val_trajectory"])
    jx = dict(jax_result["val_trajectory"])
    common = sorted(set(ref) & set(jx))
    assert common, (ref, jx)
    last = common[-1]
    assert ref[last] >= 0.8 and jx[last] >= 0.8, (ref, jx)
    assert abs(ref[last] - jx[last]) <= 0.2, (ref, jx)
