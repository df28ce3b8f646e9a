"""Benchmark: ECAMP pre-training throughput (images/sec/chip) on real HW.

Runs the FULL jitted train step (448-px input + on-device 224 resize, MAE
encoder/decoder, SR head, 6L multimodal BERT, 3 losses, backward, AdamW)
with synthetic data — the same step the reference's hot loop executes
(main_pretrain.py:116-180).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput (SURVEY §6); BASELINE's
north star is ">2x A100 images/sec/chip". We use an estimated A100
reference of 250 img/s for this exact workload (MAE ViT-B/16 with 448->224
dual-res pipeline + BERT branch, fp16, per reference run.sh config) —
vs_baseline = measured / 250, so the 2x target reads as vs_baseline >= 2.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_REFERENCE_IMG_PER_SEC = 250.0
BATCH = 64
WARMUP = 3
STEPS = 10


def main():
    from ecamp_tpu.core import config as cfg
    from ecamp_tpu.train.pretrain import PretrainTask

    pcfg = cfg.PretrainConfig()
    task = PretrainTask(pcfg, steps_per_epoch=1000)
    state = task.init_state(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    L = pcfg.max_caption_length
    batch = task.shard_batch({
        "image": rng.normal(size=(BATCH, 448, 448, 3)).astype(np.float32),
        "ids": rng.integers(0, 30000, (BATCH, L)).astype(np.int32),
        "labels": rng.integers(0, 30000, (BATCH, L)).astype(np.int32),
        "attention_mask": np.ones((BATCH, L), np.int32),
        "type_ids": np.zeros((BATCH, L), np.int32),
        "weights": np.ones((BATCH, L), np.float32),
        "column": np.ones((BATCH,), np.int32),
        "row": np.ones((BATCH,), np.int32),
    })
    key = jax.random.PRNGKey(1)
    for _ in range(WARMUP):
        state, metrics = task.train_step(state, batch, key)
    float(metrics["loss"])  # hard sync (block_until_ready proved unreliable
    #                         through the remote-TPU transport)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = task.train_step(state, batch, key)
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    n_chips = jax.device_count()
    img_per_sec_per_chip = BATCH * STEPS / dt / n_chips
    print(json.dumps({
        "metric": "ecamp_pretrain_images_per_sec_per_chip",
        "value": round(img_per_sec_per_chip, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(img_per_sec_per_chip / A100_REFERENCE_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
