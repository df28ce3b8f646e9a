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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["quick", "all"], default="quick")
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
    else:
        for path in ("device_put", "asarray", "jit_arg"):
            for dt in ("f32", "bf16", "uint8"):
                measure(path, dt, args.iters)


if __name__ == "__main__":
    main()
