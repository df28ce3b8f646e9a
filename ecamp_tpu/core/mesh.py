"""Device mesh + sharding helpers.

TPU-native replacement for the reference's NCCL bootstrap
(util/misc.py:216-248 init_distributed_mode, per-task utils/dist_util.py):
single-controller JAX with a `Mesh` over all chips. Gradient all-reduce is
emitted by XLA inside the jitted train step — there is no explicit DDP
wrapper. Host-side metric reduction uses `multihost_utils`.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .config import MeshConfig


_dist_initialized = False


def enable_compilation_cache(path: Optional[str] = None) -> Optional[str]:
    """Persistent XLA compilation cache: repeat runs skip the 1-4 min
    remote TPU compiles (the reference has no equivalent; torch re-JITs
    nothing, but XLA pays per-process compiles). Env contract:
    ECAMP_COMPILE_CACHE=<dir> overrides, ECAMP_COMPILE_CACHE=0 disables.
    Called by every CLI right after initialize_distributed."""
    import os

    path = path or os.environ.get(
        "ECAMP_COMPILE_CACHE",
        os.path.expanduser("~/.cache/ecamp_tpu/xla"))
    if not path or path == "0":
        return None
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - unknown flag on old jax
        return None
    return path


def initialize_distributed(force: bool = False) -> None:
    """Multi-host bootstrap — the reference's init_distributed_mode
    (util/misc.py:216-248) detects OMPI / RANK+WORLD_SIZE / SLURM env vars
    and NCCL-inits; here one jax.distributed.initialize() call wires every
    host to the coordinator and XLA collectives ride ICI/DCN.

    MUST be called before any backend query (jax.devices / process_count /
    device_put) — every CLI entry point calls this first. Single-process
    runs (none of the env families present) are a no-op.

    Env contract:
      JAX_COORDINATOR_ADDRESS [+ JAX_NUM_PROCESSES, JAX_PROCESS_ID] —
        explicit bootstrap, the 'RANK and WORLD_SIZE in os.environ' branch
        of misc.py:222-226;
      OMPI_COMM_WORLD_SIZE>1 / SLURM_NTASKS>1 — auto-detected (JAX's own
        cluster detection fills the parameters), the misc.py:227-233
        branches;
      force=True — initialize unconditionally (TPU-pod auto-detection).
    """
    global _dist_initialized
    if _dist_initialized:
        return
    import os

    env = os.environ
    explicit = env.get("JAX_COORDINATOR_ADDRESS")
    auto = (int(env.get("OMPI_COMM_WORLD_SIZE", "1")) > 1
            or int(env.get("SLURM_NTASKS", "1")) > 1)
    if not (force or explicit or auto):
        return
    kwargs = {}
    if explicit:
        kwargs["coordinator_address"] = explicit
        if "JAX_NUM_PROCESSES" in env:
            kwargs["num_processes"] = int(env["JAX_NUM_PROCESSES"])
        if "JAX_PROCESS_ID" in env:
            kwargs["process_id"] = int(env["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    _dist_initialized = True


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh. data=-1 consumes all remaining devices.

    The reference is DP-only (SURVEY §2.9); the model axis defaults to 1 and
    exists so TP can be enabled without restructuring train steps.
    """
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = max(1, cfg.model)
    data = cfg.data if cfg.data > 0 else n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (cfg.data_axis, cfg.model_axis))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard leading (batch) dim over the data axis, replicate the rest."""
    spec = P(mesh.axis_names[0], *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (pytree of np/jnp arrays) sharded over 'data'.

    Replaces DistributedSampler + .cuda() transfers (main_pretrain.py:200-205,
    model_ecamp.py:312-317). Single-process: one device_put with a
    NamedSharding splits the batch across local chips. Multi-process: the
    DataLoader already yields each process's shard of the global batch
    (DistributedSampler semantics), so the local arrays are assembled into
    one global jax.Array spanning all hosts — global batch = local x
    process_count. Verified by the 2-process gloo test
    (tests/test_aux_components.py::test_two_process_data_parallel).
    """
    nproc = jax.process_count()

    def put(x):
        x = np.asarray(x)
        sh = data_sharding(mesh, max(x.ndim, 1))
        if nproc == 1:
            return jax.device_put(x, sh)
        gshape = (x.shape[0] * nproc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sh, x,
                                                      global_shape=gshape)

    return jax.tree_util.tree_map(put, batch)


def shard_superbatch(mesh: Mesh, batch):
    """Place a (K, B, ...) stacked superbatch (pytree of np arrays) with
    the BATCH axis (axis 1) sharded over 'data' and the leading scan axis
    replicated — the input layout for PretrainTask.make_train_step_scan.
    Multi-process: each process holds its (K, B_local, ...) shard of the
    global (K, B_local * process_count, ...) array, mirroring
    shard_batch's DistributedSampler semantics per scan slice.
    Single-process batches that do not divide by the data-axis size fall
    back to replicated placement (correct, not data-parallel — same
    policy as the fine-tune batch placers, cli/common.py)."""
    nproc = jax.process_count()
    ndata = mesh.shape[mesh.axis_names[0]]

    def put(x):
        x = np.asarray(x)
        if nproc == 1 and x.shape[1] % ndata != 0:
            return jax.device_put(x, replicated_sharding(mesh))
        spec = P(None, mesh.axis_names[0], *([None] * max(x.ndim - 2, 0)))
        sh = NamedSharding(mesh, spec)
        if nproc == 1:
            return jax.device_put(x, sh)
        gshape = (x.shape[0], x.shape[1] * nproc) + x.shape[2:]
        return jax.make_array_from_process_local_data(sh, x,
                                                      global_shape=gshape)

    return jax.tree_util.tree_map(put, batch)


def prefetch_to_device(iterator, mesh: Mesh, size: int = 2):
    """Double-buffered sharded host->device transfer.

    jax.device_put is asynchronous: issuing the transfer of batch N+1
    while the device computes step N hides H2D latency entirely. This
    replaces the reference's synchronous per-step .cuda() copies
    (model_ecamp.py:312-317) and the round-1 per-step shard_batch call.
    """
    import collections

    buf = collections.deque()
    for b in iterator:
        buf.append(shard_batch(mesh, b))
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def replicate(mesh: Mesh, tree):
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def tp_param_spec(path, leaf, model_axis: str = "model"):
    """Megatron-style tensor-parallel PartitionSpec for one param leaf.

    Column-parallel (output dim sharded): MLP fc1, fused qkv, BERT
    query/key/value, intermediate dense, vocab decoder. Row-parallel
    (input dim sharded): MLP fc2, attention out-proj, BERT output dense.
    Everything else replicated. XLA/GSPMD inserts the all-reduces when the
    step is jitted over a mesh with a non-trivial model axis (the
    reference is DP-only — SURVEY §2.9 — this is the growth hook).
    """
    keys = [str(getattr(k, "key", k)) for k in path]
    name = keys[-2] if len(keys) >= 2 else ""
    leaf_name = keys[-1]
    if leaf_name == "kernel" and getattr(leaf, "ndim", 0) == 2:
        if name in ("fc1", "qkv", "query", "key", "value", "decoder") or \
                (name == "dense" and len(keys) >= 3
                 and keys[-3] == "intermediate"):
            return P(None, model_axis)
        if name in ("fc2", "proj") or \
                (name == "dense" and len(keys) >= 3
                 and keys[-3] in ("output", "out_layer")):
            return P(model_axis, None)
    if leaf_name == "bias" and name in ("fc1", "qkv", "query", "key",
                                        "value", "decoder"):
        return P(model_axis)
    return P()


def shard_params_tp(mesh: Mesh, params):
    """Place a param tree with tensor-parallel shardings over the model
    axis (no-op layout when the model axis has size 1)."""
    def put(path, x):
        spec = tp_param_spec(path, x, mesh.axis_names[1])
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)


def place_finetune_state(mesh: Mesh, state):
    """Lay a fine-tune TrainState out on the mesh: replicated by default;
    when the model axis is >1 the params get Megatron-style TP shardings
    (tp_param_spec) and the optimizer state is re-initialized so the
    moments inherit them. The fine-tune equivalent of
    PretrainTask.place_state (SURVEY §2.9 TP growth hook)."""
    state = jax.device_put(state, replicated_sharding(mesh))
    if mesh.shape.get(mesh.axis_names[1], 1) > 1:
        params = shard_params_tp(mesh, state.params)
        state = state.replace(params=params,
                              opt_state=state.tx.init(params))
    return state


def zero1_spec(shape, data_axis: str, n: int) -> P:
    """ZeRO-1 PartitionSpec for one optimizer-state leaf: shard the first
    axis divisible by the data-axis size; scalars and indivisible shapes
    stay replicated (moments are elementwise, so any axis works)."""
    for i, d in enumerate(shape):
        if d >= n and d % n == 0:
            return P(*([None] * i), data_axis)
    return P()


def shard_opt_state_zero1(mesh: Mesh, opt_state):
    """Place an optax state tree with moments sharded over the data axis.

    TPU-native ZeRO-1 (SURVEY §2.9 'optional: shard optimizer state over
    data axis'): AdamW keeps 2 fp32 moments per param (~1.5 GB for the
    182.6M-param flagship) — sharding them over N chips divides that HBM
    cost by N. Params stay replicated; inside the jitted step GSPMD
    computes moment updates shard-local from the (already all-reduced)
    gradients and all-gathers only the final updates. Grad-accumulation
    buffers (optax.MultiSteps acc_grads) are sharded the same way.
    """
    n = mesh.shape[mesh.axis_names[0]]

    def put(x):
        shape = getattr(x, "shape", None)
        spec = zero1_spec(shape, mesh.axis_names[0], n) if shape else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, opt_state)


def shard_params_fsdp(mesh: Mesh, params):
    """FSDP / ZeRO-3 parameter placement (MeshConfig.shard_params): each
    param leaf sharded over the data axis on its first divisible dim —
    the same zero1_spec layout as the optimizer moments, so params,
    grads, and moments share one partitioning. Inside the jitted step
    GSPMD all-gathers each weight at its forward/backward use sites and
    reduce-scatters its gradient; per-chip memory for params + grads +
    2 fp32 moments drops to 1/N."""
    return shard_opt_state_zero1(mesh, params)


@functools.lru_cache(maxsize=None)
def cpu_test_mesh(n: int = 8) -> Mesh:
    """n-device mesh for CPU multi-device tests (SURVEY §4c)."""
    return make_mesh(MeshConfig(data=n), devices=jax.devices()[:n])


# -- TP attention constraints ------------------------------------------------
#
# Under a dp x tp mesh, GSPMD without guidance reshards attention
# intermediates through full replication ("Involuntary full
# rematerialization" warnings on image_encoder/blocks_*/attn/* — softmax
# div/reduce and the qkv slice/pad transposes): the qkv projection output
# inherits batch-only sharding from the input while the head-sharded
# Megatron layout of the projection weights wants heads on the model
# axis. The fix is an explicit in-graph constraint on every (B, H, N, D)
# attention intermediate: batch on the data axis, heads on the model
# axis. The constraint is a no-op unless tracing happens inside
# `tp_constraint_scope` of a mesh whose model axis is >1, so single-chip
# and pure-DP paths compile byte-identical programs.
#
# FSDP (shard_params over 'data', ZeRO-3) hits the mirror image of the
# same GSPMD failure mode: the data-axis-sharded qkv kernel propagates a
# weight-derived sharding into the attention intermediates, which then
# collides with the batch sharding at the softmax (12 involuntary-remat
# warnings on blocks_*/attn in the 8-device dryrun). There the right
# constraint is batch-only — P(data) on dim 0 — which tells GSPMD to
# all-gather the weights (standard ZeRO-3 semantics) and keep activations
# batch-sharded. `batch_only=True` activates that mode.

import contextvars as _contextvars

_TP_MESH: "_contextvars.ContextVar" = _contextvars.ContextVar(
    "ecamp_tp_mesh", default=None)


class tp_constraint_scope:
    """Context manager activating attention sharding constraints inside
    attention modules for any jit TRACE performed within it.

    Head-dim (P(data, model)) when the mesh has a model axis > 1;
    batch-only (P(data)) when `batch_only` is set (the FSDP layout)."""

    def __init__(self, mesh: Optional[Mesh], batch_only: bool = False):
        tp_active = (mesh is not None and len(mesh.axis_names) >= 2
                     and mesh.shape[mesh.axis_names[1]] > 1)
        active = tp_active or (mesh is not None and batch_only)
        self.mesh = mesh if active else None
        self.batch_only = batch_only and not tp_active
        self._token = None

    def __enter__(self):
        if self.mesh is not None:
            self._token = _TP_MESH.set((self.mesh, self.batch_only))
        return self

    def __exit__(self, *exc):
        if self._token is not None:
            _TP_MESH.reset(self._token)
            self._token = None
        return False


def constrain_heads(x):
    """Pin a (B, H, N, D) attention intermediate to P(data, model) when a
    tp_constraint_scope is active and the head count divides the model
    axis — or to batch-only P(data) in an FSDP scope; identity otherwise
    (single chip, pure DP, probs-returning viz path, head counts that
    don't tile)."""
    scope = _TP_MESH.get()
    if scope is None or x.ndim != 4:
        return x
    mesh, batch_only = scope
    d_ax = mesh.axis_names[0]
    if x.shape[0] % mesh.shape[d_ax] != 0:
        return x
    if batch_only:
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(d_ax, None, None, None)))
    m_ax = mesh.axis_names[1]
    if x.shape[1] % mesh.shape[m_ax] != 0:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(d_ax, m_ax, None, None)))


def tp_scoped_jit(mesh: Mesh, fn, batch_only: bool = False, **jit_kwargs):
    """jax.jit whose (lazy, first-call) trace runs inside
    tp_constraint_scope(mesh). Returns the bare jit when the mesh has no
    model axis and no FSDP layout — zero per-call overhead on the common
    path."""
    jitted = jax.jit(fn, **jit_kwargs)
    if not batch_only and (len(mesh.axis_names) < 2
                           or mesh.shape[mesh.axis_names[1]] <= 1):
        return jitted

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with tp_constraint_scope(mesh, batch_only=batch_only):
            return jitted(*args, **kwargs)

    return wrapped
