"""Dataset split tooling: k-fold 1%/10% subset generation.

Equivalent of Detection/utils/dataset_split.py:26-83 — generate
train_list_1.csv / train_list_10.csv style subsets from a full CSV or list
file, stratified-free random folds with a fixed seed.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np


def subset_csv(full_csv: str, out_path: str, fraction: float,
               seed: int = 42, fold: int = 0) -> int:
    """Write a random `fraction` subset of a CSV (header preserved).
    fold selects which of the 1/fraction disjoint folds to take."""
    import pandas as pd

    df = pd.read_csv(full_csv)
    n = len(df)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    k = max(1, int(round(n * fraction)))
    start = (fold * k) % n
    idx = perm[start:start + k]
    df.iloc[np.sort(idx)].to_csv(out_path, index=False)
    return len(idx)


def subset_list_file(full_list: str, out_path: str, fraction: float,
                     seed: int = 42, fold: int = 0) -> int:
    """Same for whitespace list files (classification splits)."""
    with open(full_list) as f:
        lines = [ln for ln in f if ln.strip()]
    n = len(lines)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    k = max(1, int(round(n * fraction)))
    start = (fold * k) % n
    idx = np.sort(perm[start:start + k])
    with open(out_path, "w") as f:
        for i in idx:
            f.write(lines[i])
    return len(idx)


def make_volume_splits(path: str, seed: int = 42) -> List[str]:
    """Generate the _1 / _10 volume variants next to a full split file."""
    base, ext = os.path.splitext(path)
    written = []
    for frac, tag in ((0.01, "_1"), (0.10, "_10")):
        out = f"{base}{tag}{ext}"
        if ext == ".csv":
            subset_csv(path, out, frac, seed)
        else:
            subset_list_file(path, out, frac, seed)
        written.append(out)
    return written


# ---------------------------------------------------------------------------
# Regeneration of the four full-volume lists absent from the reference
# mirror (.MISSING_LARGE_BLOBS). Each builds from the dataset's OFFICIAL
# label files and the shipped val/test registries, so the result is the
# deterministic complement of the published splits.

CHESTXRAY14_CLASSES = [
    "Atelectasis", "Cardiomegaly", "Effusion", "Infiltration", "Mass",
    "Nodule", "Pneumonia", "Pneumothorax", "Consolidation", "Edema",
    "Emphysema", "Fibrosis", "Pleural_Thickening", "Hernia",
]  # column order of the shipped lists (Classification/train.py:37-40)

CHEXPERT_CLASSES = [
    "Atelectasis", "Cardiomegaly", "Consolidation", "Edema",
    "Pleural Effusion",
]  # competition tasks (Classification/train.py:41-42)


def _read_list_names(path: str) -> set:
    with open(path) as f:
        return {ln.split()[0] for ln in f if ln.strip()}


def make_chestxray14_train_list(data_entry_csv: str, train_val_list: str,
                                val_list: str, out_path: str,
                                image_root: str = "") -> int:
    """Regenerate Classification/datasets/ChestX-ray14/train_list.txt.

    Inputs: the NIH release's Data_Entry_2017.csv ('Image Index',
    'Finding Labels' pipe-joined) and official train_val_list.txt, plus the
    SHIPPED val_list.txt; train = train_val minus val. Rows are
    '<subdir>/<name>.png l1 .. l14' with the class order above. The NIH
    archive shards images into images_001..images_012/ — when image_root is
    given, subdirs are resolved by scanning it; otherwise 'images/'."""
    import pandas as pd

    df = pd.read_csv(data_entry_csv)
    labels = {}
    for name, finding in zip(df["Image Index"], df["Finding Labels"]):
        present = set(str(finding).split("|"))
        labels[name] = [int(c in present) for c in CHESTXRAY14_CLASSES]

    subdir_of = {}
    if image_root:
        import glob

        for p in glob.glob(os.path.join(image_root, "images_*", "images",
                                        "*.png")) + \
                glob.glob(os.path.join(image_root, "images_*", "*.png")):
            rel = os.path.relpath(p, image_root)
            subdir_of[os.path.basename(p)] = os.path.dirname(rel)

    with open(train_val_list) as f:
        train_val = [ln.strip() for ln in f if ln.strip()]
    val = _read_list_names(val_list)
    val_names = {os.path.basename(v) for v in val}

    n = 0
    with open(out_path, "w") as f:
        for name in train_val:
            base = os.path.basename(name)
            if base in val_names or base not in labels:
                continue
            sub = subdir_of.get(base, "images")
            f.write(f"{sub}/{base} " +
                    " ".join(str(v) for v in labels[base]) + "\n")
            n += 1
    return n


def make_chexpert_train_list(chexpert_train_csv: str, out_path: str,
                             uncertain: str = "ones") -> int:
    """Regenerate Classification/datasets/CheXpert/train_list.txt from the
    official CheXpert-v1.0 train.csv.

    Label policy for the uncertain (-1) entries is configurable
    ('ones' | 'zeros') and documented rather than guessed: the reference
    ships only its derived lists, not the policy. Blank -> 0. Paths are
    rewritten 'CheXpert-v1.0*/train/...' -> 'train/...' to match the
    shipped val/test lists."""
    import pandas as pd

    u = 1 if uncertain == "ones" else 0
    df = pd.read_csv(chexpert_train_csv)
    n = 0
    with open(out_path, "w") as f:
        for _, row in df.iterrows():
            path = str(row["Path"])
            parts = path.split("/")
            if parts and parts[0].startswith("CheXpert"):
                path = "/".join(parts[1:])
            vals = []
            for c in CHEXPERT_CLASSES:
                v = row.get(c)
                v = 0.0 if pd.isna(v) else float(v)
                vals.append(u if v == -1.0 else int(v))
            f.write(path + " " + " ".join(str(v) for v in vals) + " \n")
            n += 1
    return n


def make_siim_lists(train_rle_csv: str, out_dir: str, val_list_csv: str,
                    test_list_csv: str) -> int:
    """Regenerate Segmentation/datasets/SIIM/{siim.csv,train_list.csv} from
    the official SIIM-ACR 'train-rle.csv' ('ImageId',' EncodedPixels' —
    note the leading space upstream). siim.csv is the normalized full
    registry; train_list.csv is its exact complement of the SHIPPED
    val_list.csv + test_list.csv ImageIds."""
    import pandas as pd

    df = pd.read_csv(train_rle_csv)
    df.columns = [c.strip() for c in df.columns]
    df["EncodedPixels"] = df["EncodedPixels"].astype(str).str.strip()
    df.to_csv(os.path.join(out_dir, "siim.csv"), index=False)
    held = set(pd.read_csv(val_list_csv)["ImageId"]) | \
        set(pd.read_csv(test_list_csv)["ImageId"])
    train = df[~df["ImageId"].isin(held)]
    train.to_csv(os.path.join(out_dir, "train_list.csv"), index=False)
    return len(train)


def regenerate_missing_splits(chestxray14_data_entry: str = "",
                              chestxray14_train_val: str = "",
                              chexpert_train_csv: str = "",
                              siim_train_rle: str = "",
                              splits_root: str = "",
                              image_root: str = "") -> dict:
    """One-call regeneration of every .MISSING_LARGE_BLOBS entry into the
    shipped registry tree (defaults to the package assets). Pass only the
    official files you have; each group is independent."""
    from .assets import splits_root as shipped

    root = splits_root or os.path.dirname(shipped("Classification"))
    done = {}
    if chestxray14_data_entry and chestxray14_train_val:
        d = os.path.join(root, "Classification", "ChestX-ray14")
        done["chestxray14_train"] = make_chestxray14_train_list(
            chestxray14_data_entry, chestxray14_train_val,
            os.path.join(d, "val_list.txt"),
            os.path.join(d, "train_list.txt"), image_root)
    if chexpert_train_csv:
        d = os.path.join(root, "Classification", "CheXpert")
        done["chexpert_train"] = make_chexpert_train_list(
            chexpert_train_csv, os.path.join(d, "train_list.txt"))
    if siim_train_rle:
        d = os.path.join(root, "Segmentation", "SIIM")
        done["siim_train"] = make_siim_lists(
            siim_train_rle, d, os.path.join(d, "val_list.csv"),
            os.path.join(d, "test_list.csv"))
    return done
