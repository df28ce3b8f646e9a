"""Tests: ResNet-50 det backbone, split tooling, presets, determinism,
orbax round-trip, graft entry."""

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.slow
def test_resnet50_backbone_shapes():
    from ecamp_tpu.nn.resnet import ResNet50Backbone

    m = ResNet50Backbone(layers=(1, 1, 1, 1))  # tiny depth, same strides
    x = jnp.zeros((1, 224, 224, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    c2, c3, c4 = m.apply(variables, x)
    assert c2.shape == (1, 28, 28, 512)
    assert c3.shape == (1, 14, 14, 1024)
    assert c4.shape == (1, 7, 7, 2048)


def test_split_tools(tmp_path):
    from ecamp_tpu.data.split_tools import make_volume_splits

    full = tmp_path / "train_list.txt"
    full.write_text("".join(f"img_{i}.png {i % 2}\n" for i in range(200)))
    written = make_volume_splits(str(full))
    n1 = len(open(written[0]).readlines())
    n10 = len(open(written[1]).readlines())
    assert n1 == 2 and n10 == 20
    # csv variant
    import pandas as pd

    csv = tmp_path / "train_list.csv"
    pd.DataFrame({"image_path": [f"i{i}" for i in range(100)],
                  "bbox": ["[[0,0,1,1]]"] * 100}).to_csv(csv, index=False)
    from ecamp_tpu.data.split_tools import subset_csv

    n = subset_csv(str(csv), str(tmp_path / "out.csv"), 0.1)
    assert n == 10
    assert len(pd.read_csv(tmp_path / "out.csv")) == 10


def test_presets_registry():
    from ecamp_tpu.core.presets import PRESETS, list_presets, preset_argv

    names = list_presets()
    # every run.sh recipe family present
    assert "pretrain_mimic" in names
    assert sum(n.startswith("cls_ft_") for n in names) == 12
    assert sum(n.startswith("cls_lp_") for n in names) == 12
    assert sum(n.startswith("seg_") for n in names) == 9
    assert sum(n.startswith("det_") for n in names) == 3
    argv = preset_argv("cls_lp_ChestX-ray14_1")
    assert "--linear_probe" in argv and "--task" in argv


@pytest.mark.slow
def test_pretrain_step_deterministic():
    """Same seed => bitwise-identical loss (SURVEY §5.2 determinism check)."""
    from ecamp_tpu.core import config as cfg
    from ecamp_tpu.core.mesh import make_mesh
    from ecamp_tpu.train.pretrain import PretrainTask

    tiny = cfg.PretrainConfig(
        vit=cfg.ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=1,
                          num_heads=2),
        decoder=cfg.MAEDecoderConfig(embed_dim=16, depth=1, num_heads=2),
        bert=cfg.BertConfig(vocab_size=64, hidden_size=32,
                            num_hidden_layers=1, num_attention_heads=2,
                            intermediate_size=64, max_position_embeddings=8),
        data=cfg.DataConfig(img_size=64), mesh=cfg.MeshConfig(data=4),
        sr_window=1, max_caption_length=8, bf16=False)

    def run():
        mesh = make_mesh(tiny.mesh, devices=jax.devices()[:4])
        task = PretrainTask(tiny, mesh=mesh, steps_per_epoch=2)
        state = task.init_state(jax.random.PRNGKey(7))
        rng = np.random.default_rng(3)
        batch = task.shard_batch({
            "image": rng.normal(size=(4, 64, 64, 3)).astype(np.float32),
            "ids": rng.integers(0, 64, (4, 8)).astype(np.int32),
            "labels": rng.integers(0, 64, (4, 8)).astype(np.int32),
            "attention_mask": np.ones((4, 8), np.int32),
            "type_ids": np.zeros((4, 8), np.int32),
            "weights": np.ones((4, 8), np.float32),
            "column": np.zeros((4,), np.int32),
            "row": np.zeros((4,), np.int32)})
        losses = []
        for _ in range(2):
            state, m = task.train_step(state, batch, jax.random.PRNGKey(9))
            losses.append(float(m["loss"]))
        return losses

    assert run() == run()


def test_orbax_roundtrip(tmp_path):
    from ecamp_tpu.ckpt import (latest_step, restore_checkpoint,
                                save_checkpoint)

    state = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
             "step": 5}
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, 5, state)
    assert latest_step(d) == 5
    out = restore_checkpoint(d, template=state)
    np.testing.assert_array_equal(out["params"]["w"], state["params"]["w"])
    assert int(out["step"]) == 5


def test_device_memory_meter(monkeypatch):
    """log_every prints a 'max mem:' column when the backend reports
    memory (reference util/misc.py:156 parity); device_memory_mb returns
    0.0 gracefully on backends without memory_stats (CPU)."""
    from ecamp_tpu.core import metrics

    assert metrics.device_memory_mb() >= 0.0

    monkeypatch.setattr(metrics, "device_memory_mb", lambda: 123.0)
    lines = []
    logger = metrics.MetricLogger(print_fn=lines.append)
    for _ in logger.log_every(range(3), 1, header="t"):
        logger.update(loss=1.0)
    assert any("max mem: 123" in ln for ln in lines)

    monkeypatch.setattr(metrics, "device_memory_mb", lambda: 0.0)
    lines.clear()
    logger = metrics.MetricLogger(print_fn=lines.append)
    for _ in logger.log_every(range(2), 1):
        pass
    assert not any("max mem" in ln for ln in lines)


def test_orbax_async_save_survives_donated_buffers(tmp_path):
    """Pin the orbax invariant the pretrain save path relies on: an async
    CheckpointManager.save must snapshot device arrays to host before
    returning, because every train step donates the state
    (donate_argnums=(0,)) and the very next step invalidates the saved
    state's buffers. If an orbax upgrade ever makes the snapshot lazy,
    this test catches it (restore would see clobbered/poisoned data)."""
    import jax
    import jax.numpy as jnp

    from ecamp_tpu.ckpt import restore_checkpoint, save_checkpoint

    @partial(jax.jit, donate_argnums=(0,))
    def step(state):
        return jax.tree_util.tree_map(lambda a: a * -7.0 + 1.0, state)

    state = {"w": jnp.arange(1024, dtype=jnp.float32).reshape(32, 32),
             "m": jnp.full((8, 8), 3.0)}
    state = step(state)  # make buffers the product of a donating step
    expect = jax.tree_util.tree_map(np.asarray, state)
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, 1, state)  # async: returns before files exist
    # immediately clobber the donated buffers with further steps
    for _ in range(4):
        state = step(state)
    out = restore_checkpoint(d, template={"w": expect["w"], "m": expect["m"]})
    np.testing.assert_array_equal(np.asarray(out["w"]), expect["w"])
    np.testing.assert_array_equal(np.asarray(out["m"]), expect["m"])


def test_graft_entry_single():
    """entry() must be jittable (tiny-compile smoke on CPU would be slow at
    full size; we only validate the contract shape here)."""
    import __graft_entry__ as ge

    assert callable(ge.entry)
    assert callable(ge.dryrun_multichip)


@pytest.mark.slow
def test_detection_resnet_backbone_variant():
    from ecamp_tpu.core.config import ViTConfig
    from ecamp_tpu.nn.det import DetectionModel

    m = DetectionModel(ViTConfig(img_size=224, embed_dim=64, depth=1,
                                 num_heads=2), backbone="resnet50")
    x = jnp.zeros((1, 224, 224, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    o0, o1, o2 = m.apply(v, x)
    assert o0.shape == (1, 18, 7, 7)
    assert o2.shape == (1, 18, 28, 28)


@pytest.mark.slow
def test_pretrain_grad_accum_on_mesh():
    """MultiSteps accumulation under the sharded jit: params update only
    every accum_steps microbatches (reference accum_iter semantics,
    main_pretrain.py:137-153)."""
    from ecamp_tpu.core import config as cfg
    from ecamp_tpu.core.mesh import make_mesh
    from ecamp_tpu.train.pretrain import PretrainTask

    tiny = cfg.PretrainConfig(
        vit=cfg.ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=1,
                          num_heads=2),
        decoder=cfg.MAEDecoderConfig(embed_dim=16, depth=1, num_heads=2),
        bert=cfg.BertConfig(vocab_size=64, hidden_size=32,
                            num_hidden_layers=1, num_attention_heads=2,
                            intermediate_size=64, max_position_embeddings=8),
        # constant lr: the epoch-cosine warmup starts at lr=0, which would
        # make the first applied update a no-op and mask the accum check
        optimizer=cfg.OptimizerConfig(accum_steps=2, schedule="constant",
                                      lr=1e-3),
        data=cfg.DataConfig(img_size=64), mesh=cfg.MeshConfig(data=4),
        sr_window=1, max_caption_length=8, bf16=False)
    mesh = make_mesh(tiny.mesh, devices=jax.devices()[:4])
    task = PretrainTask(tiny, mesh=mesh, steps_per_epoch=2)
    state = task.init_state(jax.random.PRNGKey(0))
    p0 = np.asarray(state.params["cls_token"])
    rng = np.random.default_rng(3)
    batch = task.shard_batch({
        "image": rng.normal(size=(4, 64, 64, 3)).astype(np.float32),
        "ids": rng.integers(0, 64, (4, 8)).astype(np.int32),
        "labels": rng.integers(0, 64, (4, 8)).astype(np.int32),
        "attention_mask": np.ones((4, 8), np.int32),
        "type_ids": np.zeros((4, 8), np.int32),
        "weights": np.ones((4, 8), np.float32),
        "column": np.zeros((4,), np.int32),
        "row": np.zeros((4,), np.int32)})
    state, _ = task.train_step(state, batch, jax.random.PRNGKey(9))
    assert np.allclose(np.asarray(state.params["cls_token"]), p0)  # accum
    state, _ = task.train_step(state, batch, jax.random.PRNGKey(9))
    assert not np.allclose(np.asarray(state.params["cls_token"]), p0)  # applied


def test_initialize_distributed_env_bootstrap():
    """initialize_distributed must wire jax.distributed from env vars
    BEFORE any backend query (reference util/misc.py:216-248). Runs in a
    subprocess with an explicit single-process coordinator env."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    code = (
        "import os\n"
        # the axon TPU plugin overrides JAX_PLATFORMS at startup (see
        # conftest.py) and would grab the real chip -> hangs under
        # contention; pin the config to cpu before any backend query
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from ecamp_tpu.core.mesh import initialize_distributed\n"
        "initialize_distributed()\n"
        "assert jax.process_count() == 1, jax.process_count()\n"
        "from jax._src import distributed as dist_mod\n"
        "assert dist_mod.global_state.client is not None, 'not initialized'\n"
        "assert dist_mod.global_state.coordinator_address is not None\n"
        "print('BOOTSTRAP_OK')\n")
    import os

    env = dict(os.environ,
               JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
               JAX_NUM_PROCESSES="1", JAX_PROCESS_ID="0",
               JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=300,
                         cwd=os.path.dirname(os.path.dirname(__file__)))
    assert "BOOTSTRAP_OK" in out.stdout, (out.stdout, out.stderr)


def test_initialize_distributed_single_process_noop():
    """Without any multi-process env the bootstrap must not touch
    jax.distributed (and must not crash)."""
    import os
    import subprocess
    import sys

    code = (
        "from ecamp_tpu.core.mesh import initialize_distributed\n"
        "initialize_distributed()\n"
        "from jax._src import distributed as dist_mod\n"
        "assert dist_mod.global_state.client is None\n"
        "print('NOOP_OK')\n")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_COORDINATOR_ADDRESS", "OMPI_COMM_WORLD_SIZE",
                        "SLURM_NTASKS")}
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=300,
                         cwd=os.path.dirname(os.path.dirname(__file__)))
    assert "NOOP_OK" in out.stdout, (out.stdout, out.stderr)


def test_setup_output_provenance(tmp_path):
    """Run provenance (main_pretrain.py:214-216,258): args.json +
    config.yaml + a source snapshot under code/."""
    import argparse

    from ecamp_tpu.cli.common import setup_output

    args = argparse.Namespace(lr=1.5e-4, output_dir=str(tmp_path),
                              note="o'clock", flag=None)
    setup_output(str(tmp_path), args)
    assert (tmp_path / "args.json").exists()
    yaml_text = (tmp_path / "config.yaml").read_text()
    assert "lr: 0.00015" in yaml_text
    assert "note: 'o''clock'" in yaml_text
    assert "flag: null" in yaml_text
    snap = tmp_path / "code" / "ecamp_tpu"
    assert (snap / "cli" / "common.py").exists()
    assert (snap / "train" / "pretrain.py").exists()
    assert not (snap / "assets").exists()  # 17M of data stays out


@pytest.mark.slow
def test_dryrun_multichip_driver_style():
    """Regression guard for the round-1 driver failure: dryrun_multichip
    must succeed from a FRESH process with no platform env forcing,
    exactly how the driver invokes it."""
    import os
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    out = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8); "
         "print('DRYRUN_OK')"],
        env=env, capture_output=True, text=True, timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert "DRYRUN_OK" in out.stdout, (out.stdout[-2000:], out.stderr[-2000:])
    assert "dp=4 x tp=2" in out.stdout


@pytest.mark.slow
def test_two_process_data_parallel():
    """REAL multi-process data parallelism on one box: two processes with
    4 virtual CPU devices each bootstrap via initialize_distributed
    (gloo collectives), each contributes its LOCAL half of a global batch
    through shard_batch, and a jitted global mean reduces across
    processes — the framework's answer to DDP+NCCL (SURVEY §2.9/§5.8)."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    code = r'''
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_num_cpu_devices", 4)
from ecamp_tpu.core.mesh import initialize_distributed, make_mesh, shard_batch
initialize_distributed()
import jax.numpy as jnp
import numpy as np
from ecamp_tpu.core.config import MeshConfig
assert jax.process_count() == 2 and jax.device_count() == 8
mesh = make_mesh(MeshConfig(data=8))
pid = jax.process_index()
local = {"x": np.arange(4 * 3, dtype=np.float32).reshape(4, 3) + 100 * pid}
g = shard_batch(mesh, local)
assert g["x"].shape == (8, 3), g["x"].shape  # global batch = 2 x local
val_local = float(jax.jit(jnp.mean)(g["x"]).addressable_shards[0].data)
expect = (np.arange(12, dtype=np.float64).mean() * 2 + 100) / 2
np.testing.assert_allclose(val_local, expect, rtol=1e-6)
print(f"proc {pid}: OK", flush=True)
'''
    procs = []
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for i in range(2):
        env = dict(os.environ, JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                   JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(i))
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen([sys.executable, "-c", code], env=env,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.PIPE, text=True,
                                      cwd=root))
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0 and f"proc {i}: OK" in out, \
            (i, out[-1000:], err[-1000:])


def test_compilation_cache_config(tmp_path, monkeypatch):
    import jax

    from ecamp_tpu.core.mesh import enable_compilation_cache

    d = str(tmp_path / "xlacache")
    assert enable_compilation_cache(d) == d
    assert jax.config.jax_compilation_cache_dir == d
    import os

    assert os.path.isdir(d)
    # env disable
    monkeypatch.setenv("ECAMP_COMPILE_CACHE", "0")
    assert enable_compilation_cache() is None


def test_train_and_eval_sharders_divisibility():
    import numpy as np

    from ecamp_tpu.cli.common import _eval_sharder, _train_sharder
    from ecamp_tpu.core.config import MeshConfig
    from ecamp_tpu.core.mesh import make_mesh

    mesh = make_mesh(MeshConfig(data=8))
    place = _train_sharder(mesh)
    x8 = place(np.zeros((8, 4), np.float32))
    assert "data" in str(x8.sharding.spec)
    # indivisible batch falls back to host array (replicated by jit)
    x3 = place(np.zeros((3, 4), np.float32))
    assert isinstance(x3, np.ndarray)
    ev = _eval_sharder(mesh)
    assert "data" in str(ev(np.zeros((16, 4), np.float32)).sharding.spec)
    assert isinstance(ev(np.zeros((5, 4), np.float32)), np.ndarray)
