"""Async host-side data loader.

Replaces torch DataLoader(num_workers=16) + DistributedSampler
(main_pretrain.py:200-230): a thread-pool fetches+augments samples while
the device computes; batches are stacked numpy dicts ready for
mesh.shard_batch. Epoch shuffling matches DistributedSampler semantics:
seeded permutation, indices wrapped so every process receives the SAME
number of samples (DistributedSampler pads by repeating from the start —
unequal per-process batch counts would desynchronize the SPMD train step
across hosts), strided per-process shard, drop_last.
"""

from __future__ import annotations

import copy
import queue
import threading
from typing import Callable, Dict, Iterator

import numpy as np


def default_collate(samples) -> Dict[str, np.ndarray]:
    out = {}
    for k in samples[0]:
        out[k] = np.stack([s[k] for s in samples])
    return out


class _ProducerError:
    """Sentinel carrying a worker exception to the consuming thread."""

    def __init__(self, exc: BaseException):
        self.exc = exc


def _mp_worker(dataset, batches, K: int, wid: int, epoch: int, out_q,
               collate) -> None:
    """Module-level worker body (picklable, so the 'spawn' context works
    when forking a JAX-threaded parent is undesirable)."""
    try:
        if hasattr(dataset, "reseed"):
            dataset.reseed(epoch, wid)
        for bi in range(wid, len(batches), K):
            samples = [dataset[i] for i in batches[bi]]
            out_q.put((bi, collate(samples)))
        out_q.put((-1, wid))
    except BaseException as e:  # noqa: BLE001 - re-raised by the parent
        out_q.put((-2, repr(e)))


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, num_workers: int = 8, drop_last: bool = True,
                 prefetch: int = 2, process_index: int = 0,
                 process_count: int = 1,
                 collate: Callable = default_collate,
                 mp_workers: int = 0, mp_context: str = "spawn"):
        """mp_workers > 0 switches the producer from the in-process thread
        pool to `mp_workers` forked WORKER PROCESSES (the torch
        DataLoader(num_workers=16) equivalent for GIL-bound feeders):
        worker w builds whole batches w, w+K, ... and ships them over a
        bounded mp.Queue; the consumer restores deterministic batch
        order. Stateful per-sample RNG follows torch worker semantics
        via the optional dataset `reseed(epoch, worker_id)` protocol —
        each worker gets an independent, per-epoch-deterministic stream.
        Thread mode (the default) applies the SAME contract via
        `_worker_dataset` copies, so at equal worker count both modes
        produce identical batches; draws change with the worker count
        (exactly as changing torch num_workers does) but are
        reproducible run-to-run and across preemption resume."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count
        self.collate = collate
        self.mp_workers = max(0, mp_workers)
        # 'spawn' (default) is safe after the JAX/TPU client initialized
        # (forking a threaded process risks malloc/mutex deadlocks in the
        # child); workers re-import + unpickle the dataset (native
        # tokenizer handles re-attach lazily). 'fork' skips the ~seconds
        # of per-epoch worker startup where the parent is single-threaded.
        self.mp_context = mp_context
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            idx = rng.permutation(n)
        else:
            idx = np.arange(n)
        if self.process_count > 1:
            # pad by wrapping so every process sees ceil(n/pc) samples
            # (DistributedSampler semantics) — equal batch counts keep the
            # multi-host SPMD step in lockstep
            total = -(-n // self.process_count) * self.process_count
            if total > n:
                idx = np.concatenate([idx, idx[: total - n]])
            idx = idx[self.process_index::self.process_count]
        if self.drop_last:
            idx = idx[: (len(idx) // self.batch_size) * self.batch_size]
        return idx

    def __len__(self) -> int:
        n = -(-len(self.dataset) // self.process_count)  # ceil, matches pad
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = self._indices()
        batches = [idx[i:i + self.batch_size]
                   for i in range(0, len(idx), self.batch_size)]
        if not batches:
            return
        if self.mp_workers > 0:
            yield from self._iter_processes(batches)
            return
        yield from self._iter_threads(batches)

    def _worker_dataset(self, wid: int):
        """Per-worker dataset view for thread mode: a shallow copy whose
        stateful RNG streams are re-seeded per (epoch, worker) via the
        dataset `reseed` protocol — the same scheme `_mp_worker` gets for
        free from the process fork. A SHARED dataset RNG consumed from
        the old thread pool was scheduling-dependent: which thread drew
        next depended on decode timing, so same-seed runs diverged
        (caught by the round-5 burn-in's phase-3 bitwise compare). The
        copy is shallow — heavy read-only state (image lists, tokenizer,
        mmap'd CSVs) stays shared; only the RNG objects are rebound, so
        the transform (whose `rng` reseed rebinds) is copied too."""
        d = copy.copy(self.dataset)
        t = getattr(d, "transform", None)
        if t is not None:
            d.transform = copy.copy(t)
        if hasattr(d, "reseed"):
            d.reseed(self.epoch, wid)
        return d

    def _iter_threads(self, batches) -> Iterator[Dict[str, np.ndarray]]:
        """Thread-pool producer with the SAME deterministic contract as
        `_iter_processes`: worker w builds whole batches w, w+K, ... from
        its own per-(epoch, worker)-seeded dataset view, and the consumer
        restores batch order. Augmentation draws are therefore a pure
        function of (seed, epoch, num_workers, batch index) — identical
        run-to-run, identical to mp mode at equal K, and replayable
        across preemption resume (cli/pretrain.py islice skip)."""
        K = self.num_workers
        out_q: "queue.Queue" = queue.Queue(maxsize=max(2, self.prefetch))
        stop = threading.Event()

        def put(item) -> bool:
            # bounded put that keeps checking `stop`: an abandoned iterator
            # must not leave worker threads parked forever in q.put
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def work(wid: int):
            try:
                ds = self._worker_dataset(wid)
                for bi in range(wid, len(batches), K):
                    samples = [ds[i] for i in batches[bi]]
                    if not put((bi, self.collate(samples))):
                        return
                put((-1, wid))
            except BaseException as e:  # noqa: BLE001 - re-raised below
                put((-2, _ProducerError(e)))

        threads = [threading.Thread(target=work, args=(w,), daemon=True)
                   for w in range(K)]
        for t in threads:
            t.start()
        try:
            buffered: Dict[int, Dict[str, np.ndarray]] = {}
            nxt, done = 0, 0
            while nxt < len(batches):
                if nxt in buffered:
                    yield buffered.pop(nxt)
                    nxt += 1
                    continue
                if done == K:
                    raise RuntimeError(
                        f"DataLoader workers exited early: batch {nxt} "
                        f"of {len(batches)} never arrived")
                tag, payload = out_q.get()
                if tag == -1:
                    done += 1
                elif tag == -2:
                    raise RuntimeError(
                        "DataLoader worker failed") from payload.exc
                else:
                    buffered[tag] = payload
        finally:
            stop.set()

    def _iter_processes(self, batches) -> Iterator[Dict[str, np.ndarray]]:
        """Multi-process producer (see __init__ docstring). Workers never
        touch JAX; batch payloads move through an mp.Queue pipe — on
        many-core production hosts K scales the decode/augment/tokenize
        aggregate (measured in tools/bench_feeder_scaling.py) while the
        pipe cost stays one memcpy of the batch bytes."""
        import multiprocessing as mp

        ctx = mp.get_context(self.mp_context)
        K = self.mp_workers
        out_q = ctx.Queue(maxsize=max(2, self.prefetch))
        procs = [ctx.Process(target=_mp_worker,
                             args=(self.dataset, batches, K, w, self.epoch,
                                   out_q, self.collate), daemon=True)
                 for w in range(K)]
        for p in procs:
            p.start()
        try:
            buffered: Dict[int, Dict[str, np.ndarray]] = {}
            nxt, done = 0, 0
            while nxt < len(batches):
                if nxt in buffered:
                    yield buffered.pop(nxt)
                    nxt += 1
                    continue
                if done == K:
                    raise RuntimeError(
                        f"DataLoader processes exited early: batch {nxt} "
                        f"of {len(batches)} never arrived")
                tag, payload = out_q.get()
                if tag == -1:
                    done += 1
                elif tag == -2:
                    raise RuntimeError(
                        f"DataLoader worker process failed: {payload}")
                else:
                    buffered[tag] = payload
        finally:
            for p in procs:
                p.terminate()
            for p in procs:
                p.join(timeout=5)
            out_q.close()
