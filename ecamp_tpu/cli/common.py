"""Shared CLI plumbing: arg helpers, logging setup, checkpoint cadence."""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional

import jax


def add_common_args(p: argparse.ArgumentParser):
    p.add_argument("--output_dir", default="./output")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--data_volume", default="100", choices=["1", "10", "100"])
    p.add_argument("--pretrained", default="",
                   help=".pth or orbax checkpoint to initialize from")
    p.add_argument("--resume", default="")
    p.add_argument("--no_bf16", action="store_true")
    return p


def setup_output(output_dir: str, args: argparse.Namespace,
                 snapshot_source: bool = True):
    """Create the run dir and record provenance, mirroring the reference's
    main_pretrain.py:214-216,258: args dumped both as JSON and YAML
    (config.yaml), plus a source snapshot of the framework into
    <output_dir>/code/ so a run is reproducible from its artifacts alone."""
    os.makedirs(output_dir, exist_ok=True)
    if jax.process_index() != 0:
        return
    kv = {k: v if isinstance(v, (int, float, bool, type(None))) else str(v)
          for k, v in vars(args).items()}
    with open(os.path.join(output_dir, "args.json"), "w") as f:
        json.dump(kv, f, indent=2)
    with open(os.path.join(output_dir, "config.yaml"), "w") as f:
        for k in sorted(kv):
            v = kv[k]
            if isinstance(v, str):
                v = "'" + v.replace("'", "''") + "'"
            elif v is None:
                v = "null"
            f.write(f"{k}: {v}\n")
    if snapshot_source:
        import shutil

        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        dst = os.path.join(output_dir, "code", "ecamp_tpu")
        if not os.path.exists(dst):
            shutil.copytree(
                pkg_root, dst,
                ignore=shutil.ignore_patterns("__pycache__", "*.pyc", "*.so",
                                              "assets"))


def pretrain_ckpt_epochs(epochs: int, mid_every: int = 10, late_every: int = 5):
    """Checkpoint cadence: epoch 0, every `mid_every` in [60,100), every
    `late_every` >= 100, and the final epoch (main_pretrain.py:274-292)."""
    out = set()
    for e in range(epochs):
        if e == 0:
            out.add(e)
        elif 60 <= e < 100 and e % mid_every == 0:
            out.add(e)
        elif e >= 100 and e % late_every == 0:
            out.add(e)
    out.add(epochs - 1)
    return out


class EarlyStopper:
    """Best-metric tracking + patience (Classification/train.py:427,502)."""

    def __init__(self, patience: int, mode: str = "max"):
        self.patience = patience
        self.mode = mode
        self.best: Optional[float] = None
        self.bad = 0

    def update(self, value: float) -> bool:
        """Returns True when `value` is a new best."""
        better = (self.best is None or
                  (value > self.best if self.mode == "max" else value < self.best))
        if better:
            self.best = value
            self.bad = 0
            return True
        self.bad += 1
        return False

    @property
    def should_stop(self) -> bool:
        return self.bad >= self.patience


def pad_eval_batch(x, batch_size: int):
    """Zero-pad an eval batch's leading dim to `batch_size`.

    TPU-native eval: XLA compiles one program per input shape, so a ragged
    final batch (drop_last=False) would trigger a fresh multi-minute
    compile. Pad to the static shape and slice the outputs back with the
    returned true length."""
    import numpy as np

    n = x.shape[0]
    if n == batch_size:
        return x, n
    pad = np.zeros((batch_size - n,) + x.shape[1:], x.dtype)
    return np.concatenate([x, pad]), n


def _train_sharder(mesh):
    """Batch placer for fine-tune train loops: shard the leading dim over
    the data axis (data parallelism, like pretrain). Single-process
    batches that do not divide by the device count fall back to
    replicated placement — correct, just not data-parallel (e.g. tiny
    smoke batches smaller than the mesh). Multi-host runs always shard
    (per-process loader shards assemble the global batch; the global
    batch must divide by the device count there)."""
    import jax as _jax

    from ..core.mesh import shard_batch

    ndata = mesh.shape[mesh.axis_names[0]]
    multi = _jax.process_count() > 1

    def place(x):
        if multi or (x.shape[0] % ndata == 0):
            return shard_batch(mesh, x)
        return x

    return place


def _eval_sharder(mesh):
    """Batch placer for eval loops: shard over the local mesh in
    single-process runs (when the batch divides the device count); in
    multi-host runs every process evaluates the identical full val set,
    so batches stay host-local numpy and jit treats them as replicated
    (sharding identical-per-host data with global-array assembly would
    duplicate samples and make the outputs non-addressable)."""
    import jax as _jax

    from ..core.mesh import shard_batch

    ndata = mesh.shape[mesh.axis_names[0]]
    if _jax.process_count() == 1:
        return lambda x: (shard_batch(mesh, x) if x.shape[0] % ndata == 0
                          else x)
    return lambda x: x
