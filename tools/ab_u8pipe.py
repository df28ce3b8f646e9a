"""On-chip A/B of the u8 image pipe (HANDOFF round-4 open item).

Runs the REAL `ecamp-pretrain` CLI twice on the burn-in corpus — once
with the default f32->bf16 3-channel feeder, once with `--u8_pipe`
((448,448,1) u8 shipped, normalize+broadcast on-device,
train/pretrain.py::device_normalize) — and records per-epoch s/it,
steady-state step time, host-RSS growth (the tunnel transport retains
transferred bytes, DESIGN.md "host RSS leak", so RSS slope is a direct
proxy for H2D traffic), and per-epoch losses, into BENCH_U8PIPE.json.

RSS is sampled for the direct child PID only (single-process assumption:
the documented leak lives in the main process's transfer path; the CLI is
run here without the mp feeder, so there are no worker processes to
miss). If arms are ever run with `--num_workers > 0`, sum VmRSS over the
child's process tree instead.

Run:  python tools/ab_u8pipe.py [--epochs 3] [--work /tmp/ecamp_u8ab]
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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from burnin import make_corpus  # noqa: E402  (same learnable corpus)

_SIT_RE = re.compile(r"Epoch \[(\d+)\].*Total time: ([0-9.]+)s "
                     r"\(([0-9.]+) s/it\)")


def _epoch_losses(out_dir: str) -> list:
    """Per-epoch loss records from the CLI's JSONL log (log.txt)."""
    path = os.path.join(out_dir, "log.txt")
    out = []
    if os.path.exists(path):
        with open(path) as f:
            for ln in f:
                try:
                    rec = json.loads(ln)
                except ValueError:
                    continue
                if "epoch" in rec and "loss" in rec:
                    out.append((rec["epoch"], round(rec["loss"], 6)))
    return out


def _rss_mb(pid: int) -> float:
    try:
        with open(f"/proc/{pid}/status") as f:
            for ln in f:
                if ln.startswith("VmRSS"):
                    return float(ln.split()[1]) / 1024.0
    except OSError:
        pass
    return -1.0


def run_arm(name: str, work: str, corpus: str, batch: int, epochs: int,
            u8: bool) -> dict:
    out_dir = os.path.join(work, name)
    os.makedirs(out_dir, exist_ok=True)
    # log.txt is append-only in the CLI; a stale one from a previous A/B
    # into the same --work would leak its epoch_loss records into this
    # run's artifact (ADVICE r4) — rotate it out of the way
    stale = os.path.join(out_dir, "log.txt")
    if os.path.exists(stale):
        os.replace(stale, stale + ".prev")
    argv = [sys.executable, "-m", "ecamp_tpu.cli.pretrain",
            "--data_path", corpus, "--output_dir", out_dir,
            "--batch_size", str(batch), "--epochs", str(epochs),
            "--max_epoch", str(2 * epochs), "--warmup_epochs", "5",
            "--seed", "0", "--print_freq", "10"]
    if u8:
        argv.append("--u8_pipe")
    env = dict(os.environ, PYTHONUNBUFFERED="1")
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(work, "xla_cache"))
    logpath = os.path.join(out_dir, "run.log")
    sit = []
    rss_series = []  # (t, mb) sampled while the child runs
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
    # steady-state excludes epoch 0 (remote compile + feeder warm-up)
    steady = [s for e, s in sit if e >= 1]
    # RSS slope over the steady window: MB per wall-second, converted to
    # MB/step via the steady s/it
    slope = None
    if len(rss_series) >= 4 and steady:
        # restrict to the last half of the run (post-compile)
        half = rss_series[len(rss_series) // 2:]
        dt = half[-1][0] - half[0][0]
        if dt > 1:
            mb_per_s = (half[-1][1] - half[0][1]) / dt
            slope = mb_per_s * (sum(steady) / len(steady))
    return {
        "u8_pipe": u8,
        "epoch_s_it": sit,
        "steady_s_it": (round(sum(steady) / len(steady), 4)
                        if steady else None),
        "epoch_loss": _epoch_losses(out_dir),
        "wall_s": round(time.time() - t0, 1),
        "rss_start_mb": round(rss_series[0][1], 1) if rss_series else None,
        "rss_end_mb": round(rss_series[-1][1], 1) if rss_series else None,
        "rss_mb_per_step_steady": (round(slope, 2)
                                   if slope is not None else None),
        "log": logpath,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/ecamp_u8ab")
    ap.add_argument("--batch", type=int, default=104)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--n_images", type=int, default=2080)
    ap.add_argument("--corpus_side", type=int, default=512)
    args = ap.parse_args()

    corpus = os.path.join(args.work, "corpus")
    meta = os.path.join(corpus, "corpus_meta.json")
    if not os.path.exists(meta):
        print(f"building corpus ({args.n_images} @ {args.corpus_side})...",
              flush=True)
        make_corpus(corpus, args.n_images, side=args.corpus_side)

    arms = {}
    for name, u8 in (("baseline", False), ("u8", True)):
        print(f"=== arm {name} (u8_pipe={u8}) ===", flush=True)
        arms[name] = run_arm(name, args.work, corpus, args.batch,
                             args.epochs, u8)
        print(json.dumps({k: v for k, v in arms[name].items()
                          if k != "epoch_loss"}), flush=True)

    b, u = arms["baseline"], arms["u8"]
    out = {
        "batch": args.batch,
        "epochs": args.epochs,
        "corpus": {"n_images": args.n_images, "side": args.corpus_side},
        # analytic per-step H2D image bytes (448*448*B): bf16*3ch vs u8*1ch
        "h2d_image_mb_per_step": {
            "baseline": round(448 * 448 * 3 * 2 * args.batch / 2**20, 1),
            "u8": round(448 * 448 * 1 * args.batch / 2**20, 1),
        },
        "arms": arms,
        "speedup_steady": (round(b["steady_s_it"] / u["steady_s_it"], 3)
                           if b["steady_s_it"] and u["steady_s_it"]
                           else None),
    }
    dst = os.path.join(REPO, "BENCH_U8PIPE.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {dst}", flush=True)
    print(json.dumps({"speedup_steady": out["speedup_steady"]}))


if __name__ == "__main__":
    main()
