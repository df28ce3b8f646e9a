"""A/B: default fused-path attention-OUTPUT dropout vs HF-exact attention-
PROBS dropout (BertConfig.exact_attn_dropout) on the real chip.

Trains the flagship-config ECAMP pretrain step on a fixed synthetic
4-batch pool (learnable: losses fall as the model memorizes) for N steps
per arm x seeds, and reports the mean+/-std of the last-50-step losses
per arm plus steady step time. Records the evidence VERDICT r2 weak-#3
asked for; result goes into DESIGN.md.

Usage: python tools/ab_attn_dropout.py [--steps 200] [--batch 32]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np


def run_arm(exact: bool, seed: int, steps: int, batch: int):
    from ecamp_tpu.core import config as cfg
    from ecamp_tpu.train.pretrain import PretrainTask

    pcfg = cfg.PretrainConfig(
        bert=cfg.BertConfig(exact_attn_dropout=exact),
        optimizer=cfg.OptimizerConfig(
            name="adamw", lr=1.5e-4, weight_decay=0.05, betas=(0.9, 0.95),
            schedule="constant"))
    task = PretrainTask(pcfg, steps_per_epoch=1000)
    state = task.init_state(jax.random.PRNGKey(seed))

    rng = np.random.default_rng(0)  # SAME data pool for every arm/seed
    L = pcfg.max_caption_length
    pool = []
    for _ in range(4):
        pool.append(task.shard_batch({
            "image": rng.normal(size=(batch, 448, 448, 3)).astype(np.float32),
            "ids": rng.integers(0, 30000, (batch, L)).astype(np.int32),
            "labels": rng.integers(0, 30000, (batch, L)).astype(np.int32),
            "attention_mask": np.ones((batch, L), np.int32),
            "type_ids": np.zeros((batch, L), np.int32),
            "weights": np.ones((batch, L), np.float32),
            "column": np.ones((batch,), np.int32),
            "row": np.ones((batch,), np.int32),
        }))

    key = jax.random.PRNGKey(100 + seed)
    losses = []
    t_steady = None
    for i in range(steps):
        t0 = time.perf_counter()
        state, metrics = task.train_step(state, pool[i % 4],
                                         jax.random.fold_in(key, i))
        losses.append(float(metrics["loss"]))  # sync
        if i == steps // 2:
            t_steady = time.perf_counter()
    dt = (time.perf_counter() - t_steady) / (steps - steps // 2 - 1)
    return np.asarray(losses), dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seeds", type=int, default=2)
    args = ap.parse_args()

    out = {}
    for exact in (False, True):
        tails, dts, finals = [], [], []
        for seed in range(args.seeds):
            losses, dt = run_arm(exact, seed, args.steps, args.batch)
            tails.append(losses[-50:])
            finals.append(losses[-1])
            dts.append(dt)
            print(f"arm exact={exact} seed={seed}: "
                  f"loss[0]={losses[0]:.4f} loss[-1]={losses[-1]:.4f} "
                  f"step={dt * 1e3:.1f} ms", flush=True)
        tails = np.asarray(tails)
        out["exact" if exact else "default"] = {
            "tail_mean": float(tails.mean()),
            "tail_std": float(tails.std()),
            "final_losses": [round(f, 4) for f in finals],
            "step_ms": round(float(np.mean(dts)) * 1e3, 1),
        }
    d = out["default"]
    e = out["exact"]
    out["delta_tail_mean"] = round(e["tail_mean"] - d["tail_mean"], 4)
    out["delta_in_sigmas"] = round(
        (e["tail_mean"] - d["tail_mean"])
        / max(d["tail_std"], 1e-9), 2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
