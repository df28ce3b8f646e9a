"""Warning-free TP partitioning (VERDICT r3 Weak #2 / Next #2).

The dp x tp hybrid mesh must compile WITHOUT GSPMD "Involuntary full
rematerialization" warnings: attention intermediates carry explicit
head-dim sharding constraints (core/mesh.py::constrain_heads, applied in
nn/layers.py::Attention and nn/bert.py) so the partitioner never routes
(B, H, N, D) tensors through full replication. Correctness of the TP math
is covered by test_hybrid_tp_finetune.py / the dryrun equality asserts;
this file checks the COMPILATION is clean, via a subprocess whose raw
stderr (C++ XLA logging bypasses sys.stderr) is inspected.
"""

import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import os
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import numpy as np
from ecamp_tpu.core import config as cfg
from ecamp_tpu.core.mesh import make_mesh, shard_batch
from ecamp_tpu.train.pretrain import PretrainTask
from ecamp_tpu.train.classification import ClassificationTask

# pretrain step, dp=4 x tp=2
tiny = cfg.PretrainConfig(
    vit=cfg.ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=2,
                      num_heads=2),
    decoder=cfg.MAEDecoderConfig(embed_dim=16, depth=1, num_heads=2),
    bert=cfg.BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=2, intermediate_size=64,
                        max_position_embeddings=8),
    optimizer=cfg.OptimizerConfig(schedule="constant", lr=1e-3),
    data=cfg.DataConfig(img_size=64), mesh=cfg.MeshConfig(data=4, model=2),
    sr_window=1, max_caption_length=8, bf16=False)
task = PretrainTask(tiny, mesh=make_mesh(tiny.mesh))
state = task.place_state(task.init_state(jax.random.PRNGKey(0)))
rng = np.random.default_rng(5)
batch = task.shard_batch({
    "image": rng.normal(size=(8, 64, 64, 3)).astype(np.float32),
    "ids": rng.integers(0, 64, (8, 8)).astype(np.int32),
    "labels": rng.integers(0, 64, (8, 8)).astype(np.int32),
    "attention_mask": np.ones((8, 8), np.int32),
    "type_ids": np.zeros((8, 8), np.int32),
    "weights": np.ones((8, 8), np.float32),
    "column": np.ones((8,), np.int32),
    "row": np.ones((8,), np.int32)})
state, m = task.train_step(state, batch, jax.random.PRNGKey(1))
assert np.isfinite(float(m["loss"]))

# classification fine-tune step, dp=4 x tp=2
ccfg = cfg.ClassificationConfig(
    vit=cfg.ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=2,
                      num_heads=2),
    optimizer=cfg.OptimizerConfig(name="sgd", lr=1e-2, momentum=0.9,
                                  schedule="constant"),
    mesh=cfg.MeshConfig(data=4, model=2), num_classes=3,
    is_multilabel=True, bf16=False, data=cfg.DataConfig(img_size=32))
ctask = ClassificationTask(ccfg, mesh=make_mesh(ccfg.mesh))
cstate = ctask.init_state(jax.random.PRNGKey(0))
x = shard_batch(ctask.mesh, rng.normal(size=(8, 32, 32, 3)).astype(np.float32))
y = shard_batch(ctask.mesh, rng.integers(0, 2, (8, 3)).astype(np.float32))
cstate, cm = ctask.train_step(cstate, x, y)
assert np.isfinite(float(cm["loss"]))
print("OK")
"""


def test_tp_steps_compile_without_involuntary_remat():
    proc = subprocess.run([sys.executable, "-c", _SCRIPT],
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "OK" in proc.stdout
    bad = [ln for ln in proc.stderr.splitlines()
           if "Involuntary full rematerialization" in ln]
    assert not bad, "GSPMD involuntary remat:\n" + "\n".join(bad[:5])
