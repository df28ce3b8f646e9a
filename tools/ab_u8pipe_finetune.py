"""On-chip A/B of the u8 image pipe for a FINE-TUNE workload (VERDICT r4
#6: the finetune CLIs ship f32 448^2/224^2 over the same leaky link the
pretrain pipe optimized).

Runs the REAL `ecamp-finetune-cls` CLI (RSNA binary task, ViT-B at 448 —
the heaviest finetune transfer: f32 448^2x3 = 115 MB/step at B=48 vs u8
1-ch 9.6 MB) twice on a synthetic-learnable corpus, once default and once
with `--u8_pipe`, and records per-epoch s/it (the CLI's epoch timing
line), steady step time, and host-RSS slope into BENCH_U8PIPE_FT.json.

RSS is sampled for the direct child PID only (single-process assumption,
same as tools/ab_u8pipe.py: the documented leak lives in the main
process's transfer path and the arms run with thread feeders, not mp
workers).

Run:  python tools/ab_u8pipe_finetune.py [--epochs 3] [--work DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from ab_u8pipe import _rss_mb  # noqa: E402  (same sampling helper)

_SIT_RE = re.compile(r"Epoch \[(\d+)\]  Total time: ([0-9.]+)s "
                     r"\(([0-9.]+) s/it\)")


def make_cls_corpus(root: str, n_train: int, n_val: int,
                    side: int = 1024) -> None:
    """Learnable RSNA-style binary cls corpus: class-0 images are smooth
    gradients, class-1 adds a bright blob — separable, so val AUC can
    move while we time the feeder."""
    from PIL import Image

    imgdir = os.path.join(root, "imgs")
    lists = os.path.join(root, "lists", "RSNA")
    os.makedirs(imgdir, exist_ok=True)
    os.makedirs(lists, exist_ok=True)
    rng = np.random.default_rng(0)
    base = np.add.outer(np.linspace(40, 180, side),
                        np.linspace(0, 50, side))

    def write_split(name: str, n: int):
        rows = []
        for i in range(n):
            label = i % 2
            arr = base + rng.normal(0, 6, (side, side))
            if label:
                cy, cx = rng.integers(side // 4, 3 * side // 4, 2)
                yy, xx = np.ogrid[:side, :side]
                arr = arr + 70.0 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2)
                                          / (2 * (side / 10) ** 2))
            fname = f"{name}_{i:04d}.jpg"
            Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8),
                            "L").save(os.path.join(imgdir, fname),
                                      "JPEG", quality=90)
            rows.append(f"{fname} {label}")
        with open(os.path.join(lists, f"{name}_list.txt"), "w") as f:
            f.write("\n".join(rows) + "\n")

    write_split("train", n_train)
    write_split("val", n_val)
    write_split("test", n_val)


def run_arm(name: str, work: str, batch: int, epochs: int, u8: bool,
            img_size: int, steps_per_epoch: int) -> dict:
    out_dir = os.path.join(work, name)
    os.makedirs(out_dir, exist_ok=True)
    stale = os.path.join(out_dir, "log.txt")
    if os.path.exists(stale):  # same footgun as ab_u8pipe run_arm
        os.replace(stale, stale + ".prev")
    argv = [sys.executable, "-m", "ecamp_tpu.cli.finetune_cls",
            "--task", "RSNA",
            "--dataset_path", os.path.join(work, "corpus", "imgs"),
            "--list_path", os.path.join(work, "corpus", "lists"),
            "--img_size", str(img_size), "--model", "base",
            "--batch_size", str(batch),
            "--eval_batch_size", str(batch),
            "--num_steps", str(epochs * steps_per_epoch),
            "--warmup_steps", "5", "--num_workers", "1",
            "--output_dir", out_dir, "--seed", "0"]
    if u8:
        argv.append("--u8_pipe")
    env = dict(os.environ, PYTHONUNBUFFERED="1")
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(work, "xla_cache"))
    logpath = os.path.join(out_dir, "run.log")
    sit, rss_series = [], []
    t0 = time.time()
    with open(logpath, "w") as logf:
        proc = subprocess.Popen(argv, cwd=REPO, stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT, text=True,
                                env=env)
        stop = threading.Event()

        def sample():
            while not stop.wait(2.0):
                mb = _rss_mb(proc.pid)
                if mb > 0:
                    rss_series.append((round(time.time() - t0, 1), mb))

        th = threading.Thread(target=sample, daemon=True)
        th.start()
        for line in proc.stdout:
            logf.write(line)
            logf.flush()
            m = _SIT_RE.search(line)
            if m:
                sit.append((int(m.group(1)), float(m.group(3))))
        rc = proc.wait()
        stop.set()
        th.join(4.0)
    assert rc == 0, f"arm {name} failed rc={rc} (log {logpath})"
    steady = [s for e, s in sit if e >= 1]
    slope = None
    if len(rss_series) >= 4 and steady:
        half = rss_series[len(rss_series) // 2:]
        dt = half[-1][0] - half[0][0]
        if dt > 1:
            slope = ((half[-1][1] - half[0][1]) / dt
                     * (sum(steady) / len(steady)))
    return {"u8_pipe": u8, "epoch_s_it": sit,
            "steady_s_it": (round(sum(steady) / len(steady), 4)
                            if steady else None),
            "wall_s": round(time.time() - t0, 1),
            "rss_start_mb": (round(rss_series[0][1], 1)
                             if rss_series else None),
            "rss_end_mb": (round(rss_series[-1][1], 1)
                           if rss_series else None),
            "rss_mb_per_step_steady": (round(slope, 2)
                                       if slope is not None else None),
            "log": logpath}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/ecamp_u8ab_ft")
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--img_size", type=int, default=448)
    ap.add_argument("--n_train", type=int, default=480)
    args = ap.parse_args()

    corpus = os.path.join(args.work, "corpus")
    if not os.path.exists(os.path.join(corpus, "lists", "RSNA",
                                       "train_list.txt")):
        print(f"building cls corpus ({args.n_train} train JPEGs)...",
              flush=True)
        make_cls_corpus(corpus, args.n_train, args.batch)
    steps_per_epoch = args.n_train // args.batch

    arms = {}
    for name, u8 in (("baseline", False), ("u8", True)):
        print(f"=== arm {name} (u8_pipe={u8}) ===", flush=True)
        arms[name] = run_arm(name, args.work, args.batch, args.epochs, u8,
                             args.img_size, steps_per_epoch)
        print(json.dumps(arms[name]), flush=True)

    b, u = arms["baseline"], arms["u8"]
    out = {
        "task": "finetune-cls RSNA ViT-B", "batch": args.batch,
        "img_size": args.img_size, "epochs": args.epochs,
        "steps_per_epoch": steps_per_epoch,
        "h2d_image_mb_per_step": {
            "baseline": round(args.img_size ** 2 * 3 * 4 * args.batch
                              / 2**20, 1),
            "u8": round(args.img_size ** 2 * args.batch / 2**20, 1),
        },
        "arms": arms,
        "speedup_steady": (round(b["steady_s_it"] / u["steady_s_it"], 3)
                           if b["steady_s_it"] and u["steady_s_it"]
                           else None),
    }
    dst = os.path.join(REPO, "BENCH_U8PIPE_FT.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {dst}", flush=True)
    print(json.dumps({"speedup_steady": out["speedup_steady"]}))


if __name__ == "__main__":
    main()
