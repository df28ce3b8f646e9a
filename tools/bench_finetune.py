"""Fine-tune train-step throughput on real hardware.

Times the jitted cls / seg / det train steps at reference-recipe shapes
(ViT-B/16, 224 input) the way bench.py times the pretrain step. Prints
one line per task: ms/step and img/s/chip.

Usage: python tools/bench_finetune.py [B] [task ...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from ecamp_tpu.core import config as cfg  # noqa: E402
from ecamp_tpu.core.mesh import shard_batch  # noqa: E402

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
TASKS = sys.argv[2:] or ["cls", "seg", "det"]
WARM, STEPS = 3, 10


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).reshape(-1)[0])


def _time(step, *args):
    state = args[0]
    for _ in range(WARM):
        state, m = step(state, *args[1:])
        _sync(m)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step(state, *args[1:])
    _sync(m)
    dt = (time.perf_counter() - t0) / STEPS
    return dt


def bench_cls(rng):
    from ecamp_tpu.train.classification import ClassificationTask

    c = cfg.ClassificationConfig(
        num_classes=14, is_multilabel=True,
        optimizer=cfg.OptimizerConfig(name="sgd", lr=3e-3, grad_clip=1.0,
                                      schedule="warmup_cosine_step",
                                      warmup_steps=50, total_steps=3000))
    task = ClassificationTask(c)
    state = task.init_state(jax.random.PRNGKey(0))
    x = shard_batch(task.mesh, rng.normal(size=(BATCH, 224, 224, 3))
                         .astype(np.float32))
    y = shard_batch(task.mesh, rng.integers(0, 2, (BATCH, 14))
                         .astype(np.float32))
    return _time(task.train_step, state, x, y)


def bench_seg(rng):
    from ecamp_tpu.train.segmentation import SegmentationTask

    c = cfg.SegmentationConfig()
    task = SegmentationTask(c)
    state = task.init_state(jax.random.PRNGKey(0))
    x = shard_batch(task.mesh, rng.normal(size=(BATCH, 224, 224, 3))
                         .astype(np.float32))
    m = shard_batch(task.mesh, (rng.random((BATCH, 224, 224, 1)) > 0.5)
                         .astype(np.float32))
    return _time(task.train_step, state, x, m)


def bench_det(rng):
    from ecamp_tpu.train.detection import DetectionTask

    c = cfg.DetectionConfig()
    task = DetectionTask(c)
    state = task.init_state(jax.random.PRNGKey(0))
    x = shard_batch(task.mesh, rng.normal(size=(BATCH, 224, 224, 3))
                         .astype(np.float32))
    t = np.zeros((BATCH, c.max_objects, 5), np.float32)
    t[:, 0] = [0, 0.5, 0.5, 0.3, 0.2]  # one box per image [cls,cx,cy,w,h]
    targets = shard_batch(task.mesh, t)
    return _time(task.train_step, state, x, targets)


def main():
    rng = np.random.default_rng(0)
    fns = {"cls": bench_cls, "seg": bench_seg, "det": bench_det}
    for t in TASKS:
        dt = fns[t](rng)
        print(f"{t}: B={BATCH} {dt*1e3:7.2f} ms/step  "
              f"{BATCH/dt:8.1f} img/s/chip")


if __name__ == "__main__":
    main()
