"""Minimal repro + quantifier for the jaxlib host-transfer RSS leak.

DESIGN.md "Host RSS leak (remote-TPU transport)": under this image's
tunneled-TPU backend, every numpy->jax ingestion path permanently
retains the transferred bytes host-side, per call. This probe measures
the per-iteration RSS growth for each ingestion path and dtype so the
leak (or its absence, on a fixed transport) is a one-command check:

  python tools/host_leak_probe.py              # default: device_put f32
  python tools/host_leak_probe.py --mode all   # every path x dtype
  python tools/host_leak_probe.py --cpu        # genuine CPU backend
  (the JAX_PLATFORMS=cpu env var is silently ignored under the axon
  sitecustomize - always use --cpu)

Measured 2026-08-19: axon TPU target leaks the full buffer per call
(f32 238.9 MB/iter); the genuine CPU backend is clean (0.0 MB/iter) —
stock jaxlib is fine, the tunnel client is the leaker. The mitigation
lives in core/preemption.py (ECAMP_RSS_LIMIT_GB watchdog).
"""

from __future__ import annotations

import argparse
import ctypes
import gc


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for ln in f:
            if ln.startswith("VmRSS"):
                return int(ln.split()[1]) / 1024.0
    return 0.0


def measure(path: str, dtype_name: str, iters: int) -> float:
    """Per-iteration RSS growth (MB) for one ingestion path x dtype."""
    import ml_dtypes
    import numpy as np
    import jax
    import jax.numpy as jnp

    dtype = {"f32": np.float32, "bf16": ml_dtypes.bfloat16,
             "uint8": np.uint8}[dtype_name]
    rng = np.random.default_rng(0)
    libc = ctypes.CDLL("libc.so.6")
    ident = jax.jit(lambda a: a)
    shape = (104, 448, 448, 3)  # one flagship image batch

    def make():
        if dtype is np.uint8:
            return rng.integers(0, 255, shape).astype(dtype)
        return rng.normal(0, 1, shape).astype(dtype)

    r0 = None
    for i in range(iters):
        x = make()
        if path == "device_put":
            d = jax.device_put(x)
        elif path == "asarray":
            d = jnp.asarray(x)
        elif path == "jit_arg":
            d = ident(x)
        else:
            raise ValueError(path)
        d.block_until_ready()
        del x, d
        gc.collect()
        libc.malloc_trim(0)
        if i == 1:  # skip the warm-up iteration (client init, jit compile)
            r0 = rss_mb()
    growth = (rss_mb() - r0) / max(1, iters - 2)
    print(f"{path:11s} {dtype_name:5s}: {growth:7.1f} MB/iter "
          f"(batch bytes: {np.prod(shape) * np.dtype(dtype).itemsize / 1e6:.1f} MB)")
    return growth


def measure_stream(name: str, make_host, n_calls: int, iters: int) -> dict:
    """Per-iteration RSS growth for one transfer stream: each iteration
    performs `n_calls` H2D transfers of make_host()'s arrays (or one D2H
    readback for name='d2h_*'). Returns {name, mb_per_iter, bytes_per_iter}.
    """
    import numpy as np
    import jax

    libc = ctypes.CDLL("libc.so.6")
    r0 = None
    payload = make_host()
    nbytes = sum(a.nbytes for a in payload) * n_calls
    for i in range(iters):
        arrs = make_host()
        for _ in range(n_calls):
            ds = [jax.device_put(a) for a in arrs]
            for d in ds:
                d.block_until_ready()
            del ds
        del arrs
        gc.collect()
        libc.malloc_trim(0)
        if i == 1:
            r0 = rss_mb()
    growth = (rss_mb() - r0) / max(1, iters - 2)
    print(f"{name:24s}: {growth:7.2f} MB/iter  "
          f"(payload {nbytes / 2**20:7.2f} MiB/iter x {n_calls} call(s))")
    return {"name": name, "mb_per_iter": round(growth, 2),
            "payload_mib": round(nbytes / 2**20, 3)}


def streams_mode(iters: int) -> None:
    """Attribute the u8-pipe step's RSS slope per transfer stream
    (VERDICT r4 #2: BENCH_U8PIPE.json's u8 arm shows ~32 MB/step against
    ~20.5 MB of accounted H2D payload). Replays the flagship step's exact
    transfer composition — u8 image batch, the five text tensors, the
    column/row vectors, the D2H metric readbacks — plus a pure per-call
    overhead probe (32 empty-ish transfers), and prints a byte-accounting
    table whose sum is directly comparable to the measured step slope."""
    import json

    import numpy as np
    import jax
    import jax.numpy as jnp

    B, L = 104, 256
    rng = np.random.default_rng(0)
    rows = []
    rows.append(measure_stream(
        "image_u8 (B,448,448,1)",
        lambda: [rng.integers(0, 255, (B, 448, 448, 1)).astype(np.uint8)],
        1, iters))
    rows.append(measure_stream(
        "text x5 (B,256) i32/f32",
        lambda: [rng.integers(0, 30000, (B, L)).astype(np.int32)
                 for _ in range(4)] + [np.ones((B, L), np.float32)],
        1, iters))
    rows.append(measure_stream(
        "column+row (B,) i32",
        lambda: [np.ones((B,), np.int32), np.ones((B,), np.int32)],
        1, iters))
    rows.append(measure_stream(
        "per-call overhead x32",
        lambda: [np.zeros((1,), np.float32)], 32, iters))

    # D2H metric readback: a jitted fn returning 5 scalars, each float()ed
    # (the train loop fetches loss/mim/res/mlm/lr per step)
    libc = ctypes.CDLL("libc.so.6")
    five = jax.jit(lambda a: tuple(jnp.sum(a) + i for i in range(5)))
    x = jax.device_put(np.ones((8, 8), np.float32))
    r0 = None
    for i in range(iters):
        for v in five(x):
            float(v)
        gc.collect()
        libc.malloc_trim(0)
        if i == 1:
            r0 = rss_mb()
    d2h = (rss_mb() - r0) / max(1, iters - 2)
    print(f"{'d2h metrics x5':24s}: {d2h:7.2f} MB/iter")
    rows.append({"name": "d2h metrics x5", "mb_per_iter": round(d2h, 2),
                 "payload_mib": 0.0})

    total = sum(r["mb_per_iter"] for r in rows)
    print(f"{'SUM':24s}: {total:7.2f} MB/iter "
          f"(compare: BENCH_U8PIPE.json u8 arm rss_mb_per_step_steady)")
    print(json.dumps({"streams": rows, "sum_mb_per_iter": round(total, 2)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["quick", "all", "streams"],
                    default="quick")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon plugin ignores "
                         "the JAX_PLATFORMS env var)")
    args = ap.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print(f"backend: {jax.devices()[0].platform}")
    if args.mode == "quick":
        measure("device_put", "f32", args.iters)
    elif args.mode == "streams":
        streams_mode(args.iters)
    else:
        for path in ("device_put", "asarray", "jit_arg"):
            for dt in ("f32", "bf16", "uint8"):
                measure(path, dt, args.iters)


if __name__ == "__main__":
    main()
