"""Observability: TensorBoard scalars + jax profiler hooks.

Reference parity for L7 (SURVEY §1): TB writers (main_pretrain.py:212,
Classification/train.py:367) and wall-clock meters. The profiler context
wraps jax.profiler for on-demand device traces (SURVEY §5.1 rebuild note).
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator


class SummaryWriter:
    """TensorBoard scalar writer. Uses tf.summary when tensorflow is
    importable; silently degrades to the JSONL log otherwise."""

    def __init__(self, log_dir: str, enabled: bool = True):
        self._writer = None
        self.log_dir = log_dir
        if not enabled:
            return
        try:
            import tensorflow as tf  # noqa: PLC0415

            os.makedirs(log_dir, exist_ok=True)
            self._writer = tf.summary.create_file_writer(log_dir)
        except Exception:
            self._writer = None

    def add_scalar(self, tag: str, value: float, step: int):
        if self._writer is None:
            return
        import tensorflow as tf

        with self._writer.as_default():
            tf.summary.scalar(tag, float(value), step=int(step))

    def flush(self):
        if self._writer is not None:
            self._writer.flush()


@contextlib.contextmanager
def device_trace(log_dir: str, enabled: bool = True) -> Iterator[None]:
    """jax.profiler trace context; no-op when disabled or unsupported
    (remote/tunneled backends may not implement the PJRT profiler)."""
    if not enabled:
        yield
        return
    import jax

    # only profiler START failures are swallowed; exceptions raised by the
    # body must propagate (a catch-all around the yield would turn them
    # into RuntimeError("generator didn't stop after throw()"))
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in profiler timelines (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
