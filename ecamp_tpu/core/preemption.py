"""Preemption-safe training: save a step-exact checkpoint on SIGTERM.

TPU pods are routinely preempted (spot reclamation, maintenance events);
the host gets SIGTERM with a grace window. The reference has no handling
at all — a preempted run loses everything since its last epoch-boundary
torch.save (main_pretrain.py:274-292). `PreemptionGuard` converts the
signal into a clean mid-epoch exit:

- a SIGTERM handler records the request (signal-safe: sets a flag),
- the train loop polls `should_save(step)` once per optimizer step,
- on True the loop drains in-flight work, writes a blocking orbax
  checkpoint at the exact step, and exits 0; `--resume` then continues
  from that step bitwise (step-folded RNG + deterministic loader order;
  see cli/pretrain.py mid-epoch fast-forward).

Multi-host: every process must agree on the exit step or the survivors
hang in collectives. At `sync_every`-step boundaries the guard first
consults JAX's native preemption notice (delivered through the
coordination service when the TPU runtime learns of a maintenance
event), then all-gathers the hosts' local SIGTERM flags; either source
triggers a coordinated save at the same step on all hosts. Between
boundaries the check is a flag read — no per-step host collective.

Fault injection (§5.3): `ECAMP_PREEMPT_AT_STEP=N` arms a synthetic
preemption at optimizer step N, exercising the full save/exit/resume
path deterministically in tests and drills.

Host-RSS watchdog: `ECAMP_RSS_LIMIT_GB=G` (or the rss_limit_mb ctor arg)
treats host RSS crossing the limit like a preemption notice — the loop
checkpoints at the exact step and exits cleanly instead of being
SIGKILLed by the kernel OOM killer and losing everything since the last
cadence save. Motivation: any unbounded host-memory growth (leaky
feeder, fragmenting allocator — and concretely the remote-TPU-transport
per-transfer host-buffer leak documented in DESIGN.md "host RSS leak")
turns a multi-hour run into an OOM kill; bounded-RSS checkpoint-restart
makes it a sequence of clean resumable segments.
"""

from __future__ import annotations

import os
import signal
from typing import Optional, Sequence

import jax


class PreemptionGuard:
    """Polls for a preemption request; cheap enough to call every step."""

    def __init__(self, sync_every: int = 50,
                 signals: Sequence[int] = (signal.SIGTERM,),
                 rss_limit_mb: Optional[float] = None):
        self.sync_every = max(1, int(sync_every))
        self._flag = False
        self._installed = []
        self.reason: Optional[str] = None
        env = os.environ.get("ECAMP_PREEMPT_AT_STEP", "")
        self._preempt_at: Optional[int] = int(env) if env else None
        if rss_limit_mb is None:
            genv = os.environ.get("ECAMP_RSS_LIMIT_GB", "")
            rss_limit_mb = float(genv) * 1024.0 if genv else 0.0
        self.rss_limit_mb = float(rss_limit_mb or 0.0)
        for sig in signals:
            try:
                prev = signal.signal(sig, self._on_signal)
            except ValueError:  # non-main thread (e.g. under a test runner)
                continue
            self._installed.append((sig, prev))

    def _on_signal(self, signum, frame):  # pragma: no cover - async entry
        self._flag = True

    def uninstall(self) -> None:
        """Restore previous handlers (tests; nested CLI invocations)."""
        for sig, prev in self._installed:
            signal.signal(sig, prev)
        self._installed = []

    @property
    def requested(self) -> bool:
        """This host's local view (signal or injected fault)."""
        return self._flag

    @staticmethod
    def host_rss_mb() -> float:
        try:
            with open("/proc/self/status") as f:
                for ln in f:
                    if ln.startswith("VmRSS"):
                        return int(ln.split()[1]) / 1024.0
        except OSError:  # pragma: no cover - non-procfs platform
            pass
        return 0.0

    def _local(self, step: int) -> bool:
        if self._preempt_at is not None and step >= self._preempt_at:
            self.reason = self.reason or f"injected @ {self._preempt_at}"
            return True
        if self._flag:
            self.reason = self.reason or "signal"
            return True
        if self.rss_limit_mb > 0:
            rss = self.host_rss_mb()
            if rss > self.rss_limit_mb:
                self.reason = (f"host RSS {rss:.0f} MB > limit "
                               f"{self.rss_limit_mb:.0f} MB")
                return True
        return False

    def should_save(self, step: int) -> bool:
        """True when training must checkpoint-and-exit at `step`.

        Single-process: immediate on the local flag. Multi-process: only
        at sync_every boundaries, where all hosts reach consensus (native
        JAX preemption notice first, then an allgather of local flags).
        """
        local = self._local(step)
        if jax.process_count() == 1:
            return local
        if step % self.sync_every != 0:
            return False
        from jax.experimental import multihost_utils

        try:
            if multihost_utils.reached_preemption_sync_point(int(step)):
                return True
        except Exception:
            pass  # no coordination service (tests, single-controller)
        import numpy as np

        flags = multihost_utils.process_allgather(np.int32(local))
        return bool(np.max(flags) > 0)
