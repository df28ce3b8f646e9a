"""Host-side training metrics.

Equivalent of the reference MetricLogger / SmoothedValue
(util/misc.py:24-167) with cross-process sync done via
jax.experimental.multihost_utils instead of dist.all_reduce.
"""

from __future__ import annotations

import json
import time
from collections import defaultdict, deque
from typing import Dict, Iterable

import numpy as np


class SmoothedValue:
    """Windowed + global average meter (reference util/misc.py:24-83)."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n: int = 1):
        value = float(value)
        self.deque.append(value)
        self.count += n
        self.total += value * n

    def synchronize_between_processes(self):
        """All-reduce (count, total) across hosts (misc.py:42-53)."""
        import jax

        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils

        arr = np.array([self.count, self.total], dtype=np.float64)
        arr = np.asarray(multihost_utils.process_allgather(arr)).sum(axis=0)
        self.count = int(arr[0])
        self.total = float(arr[1])

    @property
    def median(self) -> float:
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self) -> float:
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def max(self) -> float:
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg,
            max=self.max, value=self.value,
        )


def device_memory_mb() -> float:
    """Peak device-memory use of local device 0 in MiB, or 0.0 when the
    backend exposes no memory stats (CPU; tunneled axon devices return
    None — production TPU hosts report real HBM numbers). Equivalent of the reference's
    per-iteration torch.cuda.max_memory_allocated (util/misc.py:156) — the
    first number an operator wants when choosing remat/ZeRO-1 flags."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        return 0.0
    peak = stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0))
    return float(peak) / (1024.0 * 1024.0)


class MetricLogger:
    """Iteration logger with iter/data timing (reference util/misc.py:86-167)."""

    def __init__(self, delimiter: str = "  ", print_fn=print):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter
        self.print_fn = print_fn

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self):
        return self.delimiter.join(f"{name}: {meter}" for name, meter in self.meters.items())

    def synchronize_between_processes(self):
        for meter in self.meters.values():
            meter.synchronize_between_processes()

    def add_meter(self, name: str, meter: SmoothedValue):
        self.meters[name] = meter

    def log_every(self, iterable: Iterable, print_freq: int, header: str = ""):
        i = 0
        start_time = time.time()
        end = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        try:
            total = len(iterable)  # type: ignore[arg-type]
        except TypeError:
            total = None
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0 or (total is not None and i == total - 1):
                mem = device_memory_mb()
                msg = [header, f"[{i}" + (f"/{total}]" if total else "]"), str(self),
                       f"time: {iter_time}", f"data: {data_time}"]
                if mem > 0:  # max mem print parity (util/misc.py:156)
                    msg.append(f"max mem: {mem:.0f}")
                self.print_fn(self.delimiter.join(m for m in msg if m))
            i += 1
            end = time.time()
        total_time = time.time() - start_time
        self.print_fn(f"{header} Total time: {total_time:.1f}s "
                      f"({total_time / max(i, 1):.4f} s/it)")


class JsonlLogger:
    """Append-only JSON-lines run log (reference main_pretrain.py:297-304)."""

    def __init__(self, path: str, enabled: bool = True):
        self.path = path
        self.enabled = enabled

    def write(self, record: dict):
        if not self.enabled:
            return
        with open(self.path, "a", encoding="utf-8") as f:
            f.write(json.dumps(record) + "\n")
