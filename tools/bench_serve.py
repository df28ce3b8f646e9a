"""Serving-engine latency on real hardware.

Measures the classifier engine per bucket twice: end-to-end (host numpy
in, includes the H2D copy) and device-resident (input pre-placed), which
separates compute from transfer. On this environment's REMOTE TPU the
tunnel adds a ~36 ms fixed dispatch floor and ~30 MB/s H2D — production
hosts (PCIe-attached v5e) see neither; the device-resident numbers are
the representative ones.

Usage: python tools/bench_serve.py [buckets...]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax.numpy as jnp  # noqa: E402

from ecamp_tpu.core.mesh import shard_batch  # noqa: E402
from ecamp_tpu.serve import classifier_engine  # noqa: E402

BUCKETS = tuple(int(b) for b in sys.argv[1:]) or (1, 8, 32)
WARM, CALLS = 4, 12


def _p50(fn):
    lats = []
    for _ in range(CALLS):
        t = time.perf_counter()
        fn()
        lats.append((time.perf_counter() - t) * 1e3)
    return float(np.percentile(lats[WARM:], 50))


def main():
    eng = classifier_engine(num_classes=14, img_size=224, buckets=BUCKETS)
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    eng.warmup(rng.normal(size=(1, 224, 224, 3)).astype(np.float32))
    print(f"warmup ({len(eng.buckets)} buckets): {time.perf_counter()-t0:.1f}s")
    for b in eng.buckets:
        x = rng.normal(size=(b, 224, 224, 3)).astype(np.float32)
        p50 = _p50(lambda: eng(x))
        print(f"end-to-end      bucket {b:3d}: p50 {p50:7.2f} ms "
              f"{b / p50 * 1e3:8.1f} img/s")
    for b in eng.buckets:
        xd = shard_batch(eng.mesh, rng.normal(size=(b, 224, 224, 3))
                         .astype(jnp.bfloat16))
        p50 = _p50(lambda: np.asarray(eng._fn(eng.params, xd)))
        print(f"device-resident bucket {b:3d}: p50 {p50:7.2f} ms "
              f"{b / p50 * 1e3:8.1f} img/s")


if __name__ == "__main__":
    main()
