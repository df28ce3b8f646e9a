"""Shipped data assets: split registries + tokenizer vocabulary.

The reference publishes its downstream split registries as data files
(Classification/datasets/<task>/*.txt, Segmentation/datasets/{SIIM,RSNA,
RIGA}/*.csv, Detection/datasets/RSNA/*.csv) and the WordPiece vocabulary
(Pre-training/dataset/mimic_wordpiece.json). They are shipped verbatim
under ecamp_tpu/assets/ — they are data, not code — so every preset in
core/presets.py resolves its split files out of the box.

Four large full-volume lists are absent upstream (the mirror's
.MISSING_LARGE_BLOBS): Classification/{ChestX-ray14,CheXpert}/train_list.txt
and Segmentation/SIIM/{siim.csv,train_list.csv}. data/split_tools.py
regenerates them from each dataset's official label files; see
regenerate_missing_splits() there for the documented contracts.
"""

from __future__ import annotations

import os

_ASSETS = os.path.join(os.path.dirname(os.path.dirname(__file__)), "assets")

WORKLOADS = ("Classification", "Segmentation", "Detection")


def assets_root() -> str:
    return _ASSETS


def tokenizer_path() -> str:
    """The shipped mimic_wordpiece.json (30k WordPiece vocab, exact copy of
    the reference asset — parity-tested against HF tokenizers)."""
    return os.path.join(_ASSETS, "mimic_wordpiece.json")


def splits_root(workload: str) -> str:
    """Directory containing the shipped split lists for one workload
    ('Classification' | 'Segmentation' | 'Detection')."""
    if workload not in WORKLOADS:
        raise ValueError(f"unknown workload {workload!r}; one of {WORKLOADS}")
    return os.path.join(_ASSETS, "splits", workload)


def resolve_list_root(explicit: str, dataset_path: str, workload: str,
                      probe: str) -> str:
    """Pick the split-list root for a fine-tune CLI.

    Order: an explicit --list_path wins; else a dataset_path that already
    contains the probe file (e.g. '<task>/test_list.txt') keeps the round-1
    behavior of co-located lists; else the shipped registries.
    """
    if explicit:
        return explicit
    if dataset_path and os.path.exists(os.path.join(dataset_path, probe)):
        return dataset_path
    return splits_root(workload)
