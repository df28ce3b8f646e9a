"""Shared CLI plumbing: arg helpers, logging setup, checkpoint cadence."""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional

import jax
import numpy as np


def add_common_args(p: argparse.ArgumentParser):
    p.add_argument("--output_dir", default="./output")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--data_volume", default="100", choices=["1", "10", "100"])
    p.add_argument("--pretrained", default="",
                   help=".pth or orbax checkpoint to initialize from")
    p.add_argument("--resume", default="")
    p.add_argument("--no_bf16", action="store_true")
    return p


def setup_output(output_dir: str, args: argparse.Namespace,
                 snapshot_source: bool = True):
    """Create the run dir and record provenance, mirroring the reference's
    main_pretrain.py:214-216,258: args dumped both as JSON and YAML
    (config.yaml), plus a source snapshot of the framework into
    <output_dir>/code/ so a run is reproducible from its artifacts alone."""
    os.makedirs(output_dir, exist_ok=True)
    if jax.process_index() != 0:
        return
    kv = {k: v if isinstance(v, (int, float, bool, type(None))) else str(v)
          for k, v in vars(args).items()}
    with open(os.path.join(output_dir, "args.json"), "w") as f:
        json.dump(kv, f, indent=2)
    with open(os.path.join(output_dir, "config.yaml"), "w") as f:
        for k in sorted(kv):
            v = kv[k]
            if isinstance(v, str):
                v = "'" + v.replace("'", "''") + "'"
            elif v is None:
                v = "null"
            f.write(f"{k}: {v}\n")
    if snapshot_source:
        import shutil

        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        dst = os.path.join(output_dir, "code", "ecamp_tpu")
        if not os.path.exists(dst):
            shutil.copytree(
                pkg_root, dst,
                ignore=shutil.ignore_patterns("__pycache__", "*.pyc", "*.so",
                                              "assets"))


def pretrain_ckpt_epochs(epochs: int, mid_every: int = 10, late_every: int = 5):
    """Checkpoint cadence: epoch 0, every `mid_every` in [60,100), every
    `late_every` >= 100, and the final epoch (main_pretrain.py:274-292)."""
    out = set()
    for e in range(epochs):
        if e == 0:
            out.add(e)
        elif 60 <= e < 100 and e % mid_every == 0:
            out.add(e)
        elif e >= 100 and e % late_every == 0:
            out.add(e)
    out.add(epochs - 1)
    return out


class EarlyStopper:
    """Best-metric tracking + patience (Classification/train.py:427,502)."""

    def __init__(self, patience: int, mode: str = "max"):
        self.patience = patience
        self.mode = mode
        self.best: Optional[float] = None
        self.bad = 0

    def update(self, value: float) -> bool:
        """Returns True when `value` is a new best."""
        better = (self.best is None or
                  (value > self.best if self.mode == "max" else value < self.best))
        if better:
            self.best = value
            self.bad = 0
            return True
        self.bad += 1
        return False

    @property
    def should_stop(self) -> bool:
        return self.bad >= self.patience


def pad_eval_batch(x, batch_size: int):
    """Zero-pad an eval batch's leading dim to `batch_size`.

    TPU-native eval: XLA compiles one program per input shape, so a ragged
    final batch (drop_last=False) would trigger a fresh multi-minute
    compile. Pad to the static shape and slice the outputs back with the
    returned true length."""
    import numpy as np

    n = x.shape[0]
    if n == batch_size:
        return x, n
    pad = np.zeros((batch_size - n,) + x.shape[1:], x.dtype)
    return np.concatenate([x, pad]), n


def _train_sharder(mesh):
    """Batch placer for fine-tune train loops: shard the leading dim over
    the data axis (data parallelism, like pretrain). Single-process
    batches that do not divide by the device count fall back to
    replicated placement — correct, just not data-parallel (e.g. tiny
    smoke batches smaller than the mesh). Multi-host runs always shard
    (per-process loader shards assemble the global batch; the global
    batch must divide by the device count there)."""
    import jax as _jax

    from ..core.mesh import shard_batch

    ndata = mesh.shape[mesh.axis_names[0]]
    multi = _jax.process_count() > 1

    def place(x):
        if multi or (x.shape[0] % ndata == 0):
            return shard_batch(mesh, x)
        return x

    return place


def _eval_sharder(mesh):
    """Batch placer for eval loops: shard over the local mesh in
    single-process runs (when the batch divides the device count); in
    multi-host runs every process evaluates the identical full val set,
    so batches stay host-local numpy and jit treats them as replicated
    (sharding identical-per-host data with global-array assembly would
    duplicate samples and make the outputs non-addressable)."""
    import jax as _jax

    from ..core.mesh import shard_batch

    ndata = mesh.shape[mesh.axis_names[0]]
    if _jax.process_count() == 1:
        return lambda x: (shard_batch(mesh, x) if x.shape[0] % ndata == 0
                          else x)
    return lambda x: x


class Subset:
    """View of a dataset restricted to an index array (eval sharding)."""

    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = np.asarray(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[int(self.indices[i])]


class ShardedEval:
    """Split an eval set over processes; allgather per-sample results.

    TPU-native improvement over the reference protocol (single-GPU eval,
    Classification/run_ft.sh): instead of every process scoring the
    identical full val set, process p evaluates the interleaved shard
    indices[p::P], wrap-padded so every process runs the SAME number of
    batches (collectives stay aligned), and per-sample result arrays are
    reassembled into original dataset order host-side via
    multihost_utils.process_allgather. Metric math is unchanged — it runs
    on the full gathered set, identically on every process.

    Single-process: local_indices is the identity and gather is a no-op,
    so one code path serves both."""

    def __init__(self, n: int):
        self.n = n
        self.pid = jax.process_index()
        self.P = jax.process_count()
        self.n_local = -(-n // self.P) if self.P > 1 else n

    @property
    def distributed(self) -> bool:
        return self.P > 1

    def local_indices(self) -> np.ndarray:
        if not self.distributed:
            return np.arange(self.n)
        # position k on process p holds global index (p + k*P) mod n:
        # for i < n this is exactly index i at (i%P, i//P) — what gather
        # reassembles — and the mod wraps pad entries onto real samples
        # even when the eval set is smaller than the process count
        k = np.arange(self.n_local)
        return (self.pid + k * self.P) % self.n

    def gather(self, arr: np.ndarray) -> np.ndarray:
        """(n_local, ...) per-sample results -> (n, ...) in dataset order."""
        arr = np.asarray(arr)
        if not self.distributed:
            return arr[: self.n]
        from jax.experimental import multihost_utils

        assert arr.shape[0] == self.n_local, (arr.shape, self.n_local)
        g = np.asarray(multihost_utils.process_allgather(arr))
        # g: (P, n_local, ...); original index i lives at g[i % P, i // P]
        out = np.swapaxes(g, 0, 1).reshape((-1,) + g.shape[2:])
        return out[: self.n]

    def gather_ragged(self, items, cols: int):
        """List of (k_i, cols) arrays (or None) -> global list in dataset
        order. Fixed-shape encoding: lengths first (to agree on the global
        max k), then zero-padded (n_local, K, cols) blocks."""
        if not self.distributed:
            return list(items)[: self.n]
        from jax.experimental import multihost_utils

        lengths = np.asarray([0 if it is None else len(it) for it in items],
                             np.int32)
        assert len(items) == self.n_local
        all_len = self.gather(lengths)
        # every process derives K from the same gathered lengths (wrap-pad
        # rows duplicate real samples, so the trimmed max bounds them too)
        k = max(int(all_len.max()) if len(all_len) else 0, 1)
        packed = np.zeros((self.n_local, k, cols), np.float32)
        for i, it in enumerate(items):
            if it is not None and len(it):
                packed[i, :len(it)] = np.asarray(it, np.float32)[:, :cols]
        g = self.gather(packed)
        return [g[i, :all_len[i]] if all_len[i] else None
                for i in range(self.n)]


def sharded_eval_loader(dataset, batch_size: int, num_workers: int):
    """(DataLoader over this process's eval shard, ShardedEval gatherer)."""
    from ..data.loader import DataLoader

    se = ShardedEval(len(dataset))
    loader = DataLoader(Subset(dataset, se.local_indices()), batch_size,
                        shuffle=False, drop_last=False,
                        num_workers=num_workers)
    return loader, se


def eval_state_and_sharder(task, state):
    """(state, batch placer) for eval.

    Single-process: unchanged — shard eval batches over the task mesh
    when divisible. Multi-host: copy params/batch_stats to a process-
    LOCAL mesh so eval launches are host-local; combined with ShardedEval
    each process then scores only its 1/P of the val set (the task mesh's
    global params would make every eval launch a cross-host collective,
    forcing all processes to score identical data in lockstep)."""
    import jax as _jax

    if _jax.process_count() == 1:
        return state, _eval_sharder(task.mesh)

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ..core.mesh import data_sharding, replicated_sharding

    local = np.asarray(_jax.local_devices()).reshape(-1, 1)
    lmesh = Mesh(local, task.mesh.axis_names[:2]
                 if len(task.mesh.axis_names) >= 2
                 else (task.mesh.axis_names[0], "model"))
    repl = NamedSharding(lmesh, P())
    grepl = replicated_sharding(task.mesh)

    def localize(tree):
        if tree is None:
            return None

        def one(a):
            # TP-sharded params span non-addressable devices; gather them
            # to replicated on the GLOBAL mesh first (a collective every
            # process executes), then the host copy is addressable
            if (hasattr(a, "sharding")
                    and not getattr(a, "is_fully_replicated", True)):
                a = _jax.device_put(a, grepl)
            return _jax.device_put(np.asarray(_jax.device_get(a)), repl)

        return _jax.tree_util.tree_map(one, tree)

    lstate = state.replace(params=localize(state.params))
    if getattr(state, "batch_stats", None) is not None:
        lstate = lstate.replace(batch_stats=localize(state.batch_stats))
    ndata = local.shape[0]

    def place(x):
        if x.shape[0] % ndata == 0:
            return _jax.device_put(x, data_sharding(lmesh, max(x.ndim, 1)))
        return _jax.device_put(x, repl)

    return lstate, place


class FinetunePreemption:
    """Preemption-safe mid-run state for the fine-tune CLIs.

    SIGTERM (or the injected fault ECAMP_PREEMPT_AT_STEP, counted in
    MICRO steps) checkpoints {params, opt_state, [batch_stats], counters,
    early-stop state} into <output_dir>/preempt and exits cleanly; a
    rerun with the same --output_dir resumes micro-step-exact (dropout
    RNG folds on state.step == micro and the loader order is
    deterministic per (seed, epoch)), including a partially-filled
    gradient-accumulation buffer inside opt_state. Beyond-reference:
    the reference's only recovery is the detection trainer's best-ckpt
    step fast-forward (Detection/train.py:176-182) — see SURVEY §5.3.
    """

    def __init__(self, task, output_dir: str, loader_len: int,
                 accum: int = 1):
        from ..core.preemption import PreemptionGuard

        self.task = task
        self.guard = PreemptionGuard()
        self.dir = os.path.join(os.path.abspath(output_dir), "preempt")
        self.loader_len = max(1, int(loader_len))
        self.accum = max(1, int(accum))

    # every epoch consumes exactly loader_len micro-batches, so the micro
    # counter alone pins (epoch, position-in-epoch)

    def _template(self, state):
        t = {"params": state.params, "opt_state": state.opt_state,
             "meta": {"micro": 0, "step": 0, "best": 0.0, "bad": 0,
                      "has_best": False}}
        if getattr(state, "batch_stats", None) is not None:
            t["batch_stats"] = state.batch_stats
        return t

    def resume(self, state, stopper: "EarlyStopper", micro: int = 0,
               step: int = 0, epoch: int = 0):
        """-> (state, micro, step, epoch, skip_micro); passes the caller's
        counters through unchanged when no preemption checkpoint exists
        under output_dir (so e.g. detection's --resume best-ckpt
        fast-forward survives)."""
        from ..ckpt import latest_step, restore_checkpoint
        from ..core.mesh import place_finetune_state

        pstep = latest_step(self.dir) if os.path.isdir(self.dir) else None
        if pstep is None:
            return state, micro, step, epoch, 0
        restored = restore_checkpoint(self.dir, pstep,
                                      template=self._template(state))
        meta = restored["meta"]
        micro, step = int(meta["micro"]), int(meta["step"])
        if meta["has_best"]:
            stopper.best = float(meta["best"])
            stopper.bad = int(meta["bad"])
        kw = dict(params=restored["params"], opt_state=restored["opt_state"],
                  step=np.int32(micro))
        if restored.get("batch_stats") is not None:
            kw["batch_stats"] = restored["batch_stats"]
        state = place_finetune_state(self.task.mesh, state.replace(**kw))
        epoch, skip_micro = divmod(micro, self.loader_len)
        if jax.process_index() == 0:
            print(f"resuming from preemption checkpoint: micro {micro} "
                  f"(optimizer step {step}, epoch {epoch})")
        return state, micro, step, epoch, skip_micro

    def maybe_save(self, state, micro: int, step: int,
                   stopper: "EarlyStopper") -> bool:
        """Poll once per micro step; on a preemption request write the
        blocking checkpoint and return True (caller exits the CLI).

        The saved optimizer-step counter is derived as micro // accum —
        NOT the caller's loop variable, which at the poll site has not
        yet been incremented for a just-completed accumulation cycle;
        persisting the stale value made a resumed run execute one extra
        optimizer step and shifted its eval schedule off the
        uninterrupted run's (caught by the det preemption drill, where
        mAP is sensitive to the eval step)."""
        if not self.guard.should_save(micro):
            return False
        from ..ckpt import save_checkpoint

        save_checkpoint(
            self.dir, micro,
            {**({"batch_stats": state.batch_stats}
                if getattr(state, "batch_stats", None) is not None else {}),
             "params": state.params, "opt_state": state.opt_state,
             "meta": {"micro": micro, "step": micro // self.accum,
                      "best": float(stopper.best
                                    if stopper.best is not None else 0.0),
                      "bad": int(stopper.bad),
                      "has_best": stopper.best is not None}},
            block=True)
        self.guard.uninstall()
        if jax.process_index() == 0:
            print(f"preemption checkpoint saved @ micro {micro} "
                  f"(optimizer step {step}); rerun with the same "
                  f"--output_dir to resume")
        return True

    def finish(self) -> None:
        """Training completed normally: drop the stale preemption state so
        a future rerun in this output_dir does not skip straight to test."""
        self.guard.uninstall()
        if jax.process_index() == 0 and os.path.isdir(self.dir):
            import shutil

            from ..ckpt.orbax_io import wait_for_saves

            wait_for_saves(self.dir)
            shutil.rmtree(self.dir, ignore_errors=True)


def skip_micro_batches(batch_iter, skip: int):
    """Fast-forward a deterministic epoch iterator after a mid-epoch
    preemption resume."""
    if skip:
        import itertools

        return itertools.islice(batch_iter, skip, None)
    return batch_iter
