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


def initialize_distributed() -> None:
    """Multi-host bootstrap. Equivalent of misc.init_distributed_mode
    (util/misc.py:216-248); safe no-op in single-process runs."""
    if jax.process_count() > 1:
        return  # already initialized by the launcher
    try:
        import os

        if "JAX_COORDINATOR_ADDRESS" in os.environ:
            jax.distributed.initialize()
    except Exception:
        pass


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
    model_ecamp.py:312-317): one device_put with a NamedSharding splits the
    global batch across chips.
    """
    def put(x):
        x = np.asarray(x)
        return jax.device_put(x, data_sharding(mesh, x.ndim))

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


@functools.lru_cache(maxsize=None)
def cpu_test_mesh(n: int = 8) -> Mesh:
    """n-device mesh for CPU multi-device tests (SURVEY §4c)."""
    return make_mesh(MeshConfig(data=n), devices=jax.devices()[:n])
