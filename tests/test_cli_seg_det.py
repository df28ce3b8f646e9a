"""End-to-end CLI tests for segmentation and detection on toy data."""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow
from PIL import Image


@pytest.fixture
def toy_siim(tmp_path):
    rng = np.random.default_rng(0)
    lists = tmp_path / "lists" / "SIIM"
    lists.mkdir(parents=True)
    imgdir = tmp_path / "imgs" / "train" / "images" / "1024" / "dicom"
    imgdir.mkdir(parents=True)
    rows = ["ImageId,EncodedPixels"]
    for split, n in (("train", 4), ("val", 2), ("test", 2)):
        split_rows = ["ImageId,EncodedPixels"]
        for i in range(n):
            iid = f"{split}{i}"
            arr = rng.integers(0, 255, (1024, 1024, 3)).astype(np.uint8)
            Image.fromarray(arr).save(imgdir / f"{iid}.png")
            rle = "100 5000" if i % 2 == 0 else "-1"
            split_rows.append(f"{iid},{rle}")
        (lists / f"{split}_list.csv").write_text("\n".join(split_rows) + "\n")
    return tmp_path


@pytest.mark.parametrize("u8", [False, True])
def test_finetune_seg_cli(toy_siim, tmp_path, monkeypatch, capsys, u8):
    from ecamp_tpu.cli import finetune_seg

    out = tmp_path / "out"
    argv = ["finetune_seg", "--task", "SIIM",
            "--dataset_path", str(toy_siim / "imgs"),
            "--list_path", str(toy_siim / "lists"),
            "--img_size", "64", "--model", "tiny",
            "--batch_size", "4", "--eval_batch_size", "2",
            "--num_steps", "2", "--warmup_steps", "1",
            "--num_workers", "2", "--output_dir", str(out), "--no_bf16"]
    if u8:
        argv.append("--u8_pipe")
    monkeypatch.setattr(sys, "argv", argv)
    finetune_seg.main()
    captured = capsys.readouterr().out
    assert "TEST dice" in captured


@pytest.fixture
def toy_rsna_det(tmp_path):
    rng = np.random.default_rng(0)
    lists = tmp_path / "lists" / "RSNA"
    lists.mkdir(parents=True)
    imgdir = tmp_path / "imgs"
    imgdir.mkdir()
    for split, n in (("train", 4), ("val", 2)):
        rows = ["image_path,bbox"]
        for i in range(n):
            name = f"{split}{i}.png"
            arr = rng.integers(0, 255, (256, 256, 3)).astype(np.uint8)
            Image.fromarray(arr).save(imgdir / name)
            rows.append(f'{name},"[[40, 50, 120, 160]]"')
        (lists / f"{split}_list.csv").write_text("\n".join(rows) + "\n")
    return tmp_path


def test_finetune_det_cli_objectcxr(tmp_path, monkeypatch, capsys):
    """ObjectCXR task dispatch: resize/ image dir + per-image .npy label
    arrays (Detection/utils/my_dataset.py:106-209)."""
    from ecamp_tpu.cli import finetune_det

    rng = np.random.default_rng(0)
    lists = tmp_path / "lists" / "ObjectCXR"
    lists.mkdir(parents=True)
    imgdir = tmp_path / "imgs" / "resize"
    imgdir.mkdir(parents=True)
    for split, n in (("train", 4), ("test", 2)):
        rows = ["image_name"]
        for i in range(n):
            name = f"{split}{i}.png"
            arr = rng.integers(0, 255, (128, 128, 3)).astype(np.uint8)
            Image.fromarray(arr).save(imgdir / name)
            y = np.array([[0.0, 0.5, 0.5, 0.3, 0.3]], np.float32)
            np.save(imgdir / (name + ".npy"), y)
            rows.append(name)
        fname = "train_list.csv" if split == "train" else "test_list.csv"
        (lists / fname).write_text("\n".join(rows) + "\n")

    out = tmp_path / "out"
    argv = ["finetune_det", "--task", "ObjectCXR",
            "--dataset_path", str(tmp_path / "imgs"),
            "--list_path", str(tmp_path / "lists"),
            "--img_size", "64", "--model", "tiny",
            "--batch_size", "2", "--eval_batch_size", "2",
            "--num_steps", "1", "--warmup_steps", "1", "--start_eval", "1",
            "--num_workers", "2", "--output_dir", str(out), "--no_bf16"]
    monkeypatch.setattr(sys, "argv", argv)
    finetune_det.main()
    assert "TEST mAP" in capsys.readouterr().out


@pytest.mark.parametrize("u8", [False, True])
def test_finetune_det_cli(toy_rsna_det, tmp_path, monkeypatch, capsys, u8):
    from ecamp_tpu.cli import finetune_det

    out = tmp_path / "out"
    argv = ["finetune_det",
            "--dataset_path", str(toy_rsna_det / "imgs"),
            "--list_path", str(toy_rsna_det / "lists"),
            "--img_size", "64", "--model", "tiny",
            "--batch_size", "4", "--eval_batch_size", "2",
            "--num_steps", "2", "--warmup_steps", "1", "--start_eval", "1",
            "--num_workers", "2", "--output_dir", str(out), "--no_bf16"]
    if u8:
        argv.append("--u8_pipe")
    monkeypatch.setattr(sys, "argv", argv)
    finetune_det.main()
    captured = capsys.readouterr().out
    assert "TEST mAP" in captured
