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
