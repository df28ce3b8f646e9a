"""Shipped split registries + regeneration of the missing full-volume
lists (reference datasets/* data assets; .MISSING_LARGE_BLOBS)."""

import os

import numpy as np
import pytest

from ecamp_tpu.data import assets

# full-volume lists absent from the reference mirror itself
MISSING_UPSTREAM = {
    ("Classification", "ChestX-ray14", "train_list.txt"),
    ("Classification", "CheXpert", "train_list.txt"),
    ("Segmentation", "SIIM", "siim.csv"),
    ("Segmentation", "SIIM", "train_list.csv"),
}


def _expected_files(entry, args):
    """Which split files a preset's CLI will open."""
    vol = args.get("data_volume", "100")
    train = {"1": "train_list_1", "10": "train_list_10",
             "100": "train_list"}[vol]
    if entry == "finetune_cls":
        return ("Classification", args["task"],
                [f"{train}.txt", "val_list.txt", "test_list.txt"])
    if entry == "finetune_seg":
        return ("Segmentation", args["task"],
                [f"{train}.csv", "val_list.csv", "test_list.csv"])
    if entry == "finetune_det":
        return ("Detection", "RSNA",
                [f"{train}.csv", "val_list.csv", "test_list.csv"])
    return None


def test_every_preset_resolves_shipped_splits():
    from ecamp_tpu.core.presets import PRESETS

    missing = []
    for name, p in PRESETS.items():
        exp = _expected_files(p["entry"], p["args"])
        if exp is None:
            continue
        workload, task, files = exp
        root = assets.splits_root(workload)
        for fn in files:
            path = os.path.join(root, task, fn)
            if not os.path.exists(path):
                missing.append((name, workload, task, fn))
    # only the documented upstream-absent lists may be missing
    assert {(w, t, f) for _, w, t, f in missing} <= MISSING_UPSTREAM, missing


def test_tokenizer_asset_shipped():
    from ecamp_tpu.data.tokenizer import WordPieceTokenizer

    tok = WordPieceTokenizer.from_file(assets.tokenizer_path())
    enc = tok.encode("[CLS] there is no evidence of pneumonia .",
                     max_length=16, pad_to=16)
    assert enc.ids[0] == 2  # [CLS]
    assert 219 in enc.ids and 149 in enc.ids  # "there", "is"


def test_resolve_list_root_order(tmp_path):
    probe = "T/test_list.txt"
    co = tmp_path / "data"
    (co / "T").mkdir(parents=True)
    (co / probe).write_text("x 0\n")
    assert assets.resolve_list_root("/explicit", str(co), "Classification",
                                    probe) == "/explicit"
    assert assets.resolve_list_root("", str(co), "Classification",
                                    probe) == str(co)
    assert assets.resolve_list_root("", str(tmp_path / "empty"),
                                    "Classification", probe) == \
        assets.splits_root("Classification")


def test_make_chestxray14_train_list(tmp_path):
    import pandas as pd

    from ecamp_tpu.data.split_tools import (CHESTXRAY14_CLASSES,
                                            make_chestxray14_train_list)

    de = tmp_path / "Data_Entry_2017.csv"
    pd.DataFrame({
        "Image Index": ["a.png", "b.png", "c.png", "d.png"],
        "Finding Labels": ["No Finding", "Cardiomegaly|Edema",
                           "Hernia", "Mass"],
    }).to_csv(de, index=False)
    (tmp_path / "train_val_list.txt").write_text("a.png\nb.png\nc.png\n")
    (tmp_path / "val_list.txt").write_text(
        "images/c.png " + " ".join(["0"] * 14) + "\n")
    img_root = tmp_path / "imgs"
    (img_root / "images_003" / "images").mkdir(parents=True)
    (img_root / "images_003" / "images" / "b.png").write_bytes(b"")
    out = tmp_path / "train_list.txt"
    n = make_chestxray14_train_list(str(de),
                                    str(tmp_path / "train_val_list.txt"),
                                    str(tmp_path / "val_list.txt"),
                                    str(out), str(img_root))
    assert n == 2
    lines = out.read_text().splitlines()
    assert lines[0].split() == ["images/a.png"] + ["0"] * 14
    lab = dict.fromkeys(CHESTXRAY14_CLASSES, 0)
    lab["Cardiomegaly"] = lab["Edema"] = 1
    assert lines[1].split() == ["images_003/images/b.png"] + \
        [str(lab[c]) for c in CHESTXRAY14_CLASSES]


def test_make_chexpert_train_list(tmp_path):
    import pandas as pd

    from ecamp_tpu.data.split_tools import make_chexpert_train_list

    csv = tmp_path / "train.csv"
    pd.DataFrame({
        "Path": ["CheXpert-v1.0/train/p1/s1/v1.jpg",
                 "CheXpert-v1.0-small/train/p2/s1/v1.jpg"],
        "Atelectasis": [1.0, -1.0],
        "Cardiomegaly": [0.0, None],
        "Consolidation": [None, 0.0],
        "Edema": [-1.0, 1.0],
        "Pleural Effusion": [0.0, 1.0],
    }).to_csv(csv, index=False)
    out = tmp_path / "train_list.txt"
    assert make_chexpert_train_list(str(csv), str(out)) == 2
    lines = out.read_text().splitlines()
    assert lines[0].split() == ["train/p1/s1/v1.jpg", "1", "0", "0", "1", "0"]
    assert lines[1].split() == ["train/p2/s1/v1.jpg", "1", "0", "0", "1", "1"]
    out2 = tmp_path / "zeros.txt"
    make_chexpert_train_list(str(csv), str(out2), uncertain="zeros")
    assert out2.read_text().splitlines()[0].split()[4] == "0"


def test_make_siim_lists(tmp_path):
    import pandas as pd

    from ecamp_tpu.data.split_tools import make_siim_lists

    rle = tmp_path / "train-rle.csv"
    with open(rle, "w") as f:
        f.write("ImageId, EncodedPixels\n")
        f.write("id_a, 1 5 10 5\n")
        f.write("id_b, -1\n")
        f.write("id_c, 3 4\n")
    pd.DataFrame({"ImageId": ["id_b"], "EncodedPixels": ["-1"]}).to_csv(
        tmp_path / "val_list.csv", index=False)
    pd.DataFrame({"ImageId": [], "EncodedPixels": []}).to_csv(
        tmp_path / "test_list.csv", index=False)
    n = make_siim_lists(str(rle), str(tmp_path), str(tmp_path / "val_list.csv"),
                        str(tmp_path / "test_list.csv"))
    assert n == 2
    full = pd.read_csv(tmp_path / "siim.csv")
    assert list(full.columns) == ["ImageId", "EncodedPixels"]
    assert full["EncodedPixels"].tolist() == ["1 5 10 5", "-1", "3 4"]
    train = pd.read_csv(tmp_path / "train_list.csv")
    assert train["ImageId"].tolist() == ["id_a", "id_c"]


def test_every_preset_parses_through_its_cli():
    """Guard against preset/CLI flag drift: the rendered argv of every
    preset must be accepted by the target entry point's parser."""
    import sys
    from unittest import mock

    from ecamp_tpu.core.presets import PRESETS, preset_argv

    required = {
        "pretrain": ["--data_path", "/tmp/x"],
        "finetune_cls": ["--dataset_path", "/tmp/x"],
        "finetune_seg": ["--dataset_path", "/tmp/x"],
        "finetune_det": ["--dataset_path", "/tmp/x"],
    }
    for name, p in PRESETS.items():
        mod = __import__(f"ecamp_tpu.cli.{p['entry']}",
                         fromlist=["get_args"])
        argv = ["prog"] + preset_argv(name) + required[p["entry"]]
        with mock.patch.object(sys, "argv", argv):
            args = mod.get_args()  # SystemExit on any unknown/invalid flag
        assert args is not None, name
