"""Capture a TPU op-level profile of the pretrain train step.

Traces a few steps with jax.profiler, converts the xplane with xprof's
tooling, and prints the top HLO ops by self time.

Usage: python tools/profile_step.py [B]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile

import jax
import numpy as np

sys.path.insert(0, ".")

BATCH = (int(sys.argv[1]) if len(sys.argv) > 1
         and sys.argv[1].isdigit() else 96)


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
    for _ in range(3):
        state, metrics = task.train_step(state, batch, key)
    float(metrics["loss"])

    logdir = tempfile.mkdtemp(prefix="ecamp_prof_")
    with jax.profiler.trace(logdir):
        for _ in range(3):
            state, metrics = task.train_step(state, batch, key)
        float(metrics["loss"])

    xplanes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                        recursive=True)
    print("xplane files:", xplanes, file=sys.stderr)
    report(xplanes)


def report(xplanes):
    try:
        from xprof.convert import raw_to_tool_data
    except ImportError:  # older image
        from tensorboard_plugin_profile.convert import raw_to_tool_data

    for tool in ("op_profile", "framework_op_stats"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(
                xplanes, tool, {})
        except Exception as e:
            print(f"-- {tool} failed: {e}", file=sys.stderr)
            continue
        out = f"/tmp/prof_{tool}.json"
        mode = "wb" if isinstance(data, bytes) else "w"
        with open(out, mode) as f:
            f.write(data)
        print(f"wrote {out}")
        if tool == "op_profile":
            summarize_op_profile(out)


def summarize_op_profile(path):
    with open(path) as f:
        prof = json.load(f)

    # op_profile.json: tree of categories -> ops with metrics
    def walk(node, depth=0, out=None):
        out = out if out is not None else []
        m = node.get("metrics", {})
        name = node.get("name", "?")
        t = m.get("time", 0)
        out.append((t, depth, name, m.get("flops", 0),
                    m.get("memoryBandwidth", 0)))
        for ch in node.get("children", []):
            walk(ch, depth + 1, out)
        return out

    root = prof.get("byCategory") or prof.get("byProgram") or {}
    rows = walk(root)
    rows.sort(reverse=True)
    print(f"{'time%':>7} {'flops%':>7} {'bw':>8}  name")
    for t, depth, name, fl, bw in rows[:60]:
        print(f"{t*100:7.2f} {fl*100:7.2f} {bw:8.2f}  {'  '*depth}{name}")


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--report":
        report(sys.argv[2:])
    else:
        main()
