"""Batched, bucketed, mesh-sharded inference engine.

TPU-first serving: XLA compiles one program per input shape, so a naive
server that runs whatever batch size arrives recompiles constantly (a
multi-second stall each time). The engine therefore:

- pads every request batch up to a fixed *bucket* size (smallest bucket
  that covers it; oversize requests are chunked by the largest bucket),
  so the set of compiled programs is small and known up front;
- rounds buckets up to a multiple of the data-axis size and executes
  data-sharded over all local chips (`core/mesh.py` sharding — the same
  path the trainers use);
- keeps per-call latency stats (p50/p99) for observability.

`MicroBatcher` adds dynamic batching on top: concurrent `submit()` calls
are coalesced into one device call (bounded by `max_batch` and
`max_wait_ms`), the standard way to serve many small requests at high
device utilization.
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import Future
from typing import Callable, Optional, Sequence, Tuple

import jax
import numpy as np

from ..core.mesh import make_mesh, replicate, shard_batch


class InferenceEngine:
    """Wraps `apply_fn(params, x) -> pytree of arrays` for serving.

    apply_fn must be shape-polymorphic in the leading (batch) dim only;
    outputs must have the batch as their leading dim (they are sliced back
    to the true request size).
    """

    def __init__(self, apply_fn: Callable, params, mesh=None,
                 buckets: Sequence[int] = (8, 32, 64),
                 postprocess: Optional[Callable] = None,
                 input_dtype=None):
        self.mesh = mesh if mesh is not None else make_mesh()
        n_data = self.mesh.shape[self.mesh.axis_names[0]]
        # buckets must divide evenly over the data axis
        self.buckets = sorted({-(-b // n_data) * n_data for b in buckets})
        self.params = replicate(self.mesh, params)
        self._fn = jax.jit(apply_fn)
        self.postprocess = postprocess
        # cast inputs before the host->device copy (bf16 halves transfer
        # bytes; bit-identical for models whose first op casts to bf16)
        self.input_dtype = input_dtype
        self._lat_ms: list = []
        self._count = 0
        self._bucket_hits = {b: 0 for b in self.buckets}
        self._lock = threading.Lock()

    # -- shape management ------------------------------------------------

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def warmup(self, example: np.ndarray) -> None:
        """Compile every bucket up front (cold-start off the request path)."""
        for b in self.buckets:
            x = np.broadcast_to(example[:1], (b,) + example.shape[1:])
            jax.block_until_ready(self._run_padded(np.ascontiguousarray(x)))

    def _run_padded(self, x: np.ndarray):
        if self.input_dtype is not None:
            x = x.astype(self.input_dtype)
        sharded = shard_batch(self.mesh, x)
        return self._fn(self.params, sharded)

    # -- public API ------------------------------------------------------

    def __call__(self, x: np.ndarray):
        """Run a request batch of any size; returns outputs of the same
        leading size, bucketing/chunking internally."""
        t0 = time.perf_counter()
        n = x.shape[0]
        outs = []
        big = self.buckets[-1]
        i = 0
        if n == 0:
            # run the smallest bucket on zeros and slice to 0 so empty
            # requests return correctly-typed empty outputs
            b = self.buckets[0]
            out = self._run_padded(np.zeros((b,) + x.shape[1:], x.dtype))
            outs.append(jax.tree_util.tree_map(
                lambda a: np.asarray(a[:0]), out))
        while i < n:
            chunk = x[i:i + big]
            m = chunk.shape[0]
            b = self._bucket_for(m)
            with self._lock:
                self._bucket_hits[b] += 1
            if m < b:
                pad = np.broadcast_to(chunk[-1:], (b - m,) + chunk.shape[1:])
                chunk = np.concatenate([chunk, pad])
            out = self._run_padded(chunk)
            # slice the padding off ON DEVICE before the host copy — a
            # full-bucket transfer of pad rows costs real bandwidth (6 MB
            # of discarded masks per 1-image seg request at bucket 32)
            out = jax.tree_util.tree_map(lambda a: np.asarray(a[:m]), out)
            outs.append(out)
            i += m
        if len(outs) == 1:
            result = outs[0]
        else:
            result = jax.tree_util.tree_map(
                lambda *xs: np.concatenate(xs), *outs)
        with self._lock:
            self._lat_ms.append((time.perf_counter() - t0) * 1e3)
            if len(self._lat_ms) > 1000:
                self._lat_ms = self._lat_ms[-1000:]
            self._count += n
        if self.postprocess is not None:
            result = self.postprocess(result)
        return result

    def stats(self) -> dict:
        with self._lock:
            lat = np.asarray(self._lat_ms) if self._lat_ms else np.zeros(1)
            return {
                "requests": self._count,
                "calls": len(self._lat_ms),
                "latency_ms_p50": float(np.percentile(lat, 50)),
                "latency_ms_p99": float(np.percentile(lat, 99)),
                "buckets": list(self.buckets),
                "bucket_hits": {str(b): n
                                for b, n in self._bucket_hits.items()},
            }


class MicroBatcher:
    """Dynamic batching: coalesce concurrent single requests into one
    device call. submit() returns a Future resolved with that sample's
    output slice.

    Requires an engine whose outputs are arrays with the batch on dim 0
    (classifier/segmenter/embedding). Engines with per-image list outputs
    (detector NMS) must be called directly instead."""

    def __init__(self, engine: InferenceEngine, max_batch: int = 32,
                 max_wait_ms: float = 5.0):
        self.engine = engine
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        self._queue: list = []
        self._cv = threading.Condition()
        self._closed = False
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    def submit(self, x: np.ndarray) -> Future:
        """x: one sample (no batch dim)."""
        fut: Future = Future()
        with self._cv:
            if self._closed:
                raise RuntimeError("MicroBatcher closed")
            self._queue.append((x, fut))
            self._cv.notify()
        return fut

    def _loop(self):
        while True:
            with self._cv:
                while not self._queue and not self._closed:
                    self._cv.wait()
                if self._closed and not self._queue:
                    return
                deadline = time.monotonic() + self.max_wait
                while (len(self._queue) < self.max_batch
                       and not self._closed):
                    left = deadline - time.monotonic()
                    if left <= 0:
                        break
                    self._cv.wait(timeout=left)
                batch = self._queue[:self.max_batch]
                self._queue = self._queue[self.max_batch:]
            # np.stack stays inside the try: one mis-shaped sample
            # submitted through the public submit() API must fail its own
            # batch's futures, not kill the batching thread forever.
            try:
                xs = np.stack([b[0] for b in batch])
                out = self.engine(xs)
                for i, (_, fut) in enumerate(batch):
                    fut.set_result(jax.tree_util.tree_map(
                        lambda a: a[i], out))
            except Exception as e:
                for _, fut in batch:
                    fut.set_exception(e)

    def close(self):
        with self._cv:
            self._closed = True
            self._cv.notify_all()
        self._worker.join(timeout=5)


def softmax_np(x: np.ndarray, axis: int = -1) -> np.ndarray:
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def sigmoid_np(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


Prediction = Tuple[np.ndarray, np.ndarray]
