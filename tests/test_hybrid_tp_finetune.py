"""Hybrid dp=4 x tp=2 vs pure dp=8 numerical equality for the FINE-TUNE
train steps (VERDICT r2 #8; pretrain already runs hybrid in the driver
dryrun). TP shardings come from place_finetune_state -> shard_params_tp;
XLA/GSPMD inserts the model-axis collectives. Math must match pure DP."""

import jax
import numpy as np
import pytest

from ecamp_tpu.core import config as cfg
from ecamp_tpu.core.mesh import make_mesh, shard_batch

pytestmark = pytest.mark.slow

TINY_VIT = dict(img_size=32, patch_size=16, embed_dim=32, depth=2,
                num_heads=2)
SEG_VIT = dict(img_size=64, patch_size=16, embed_dim=32, depth=2,
               num_heads=2)


def _steps(task, state, batches, place):
    losses = []
    for b in batches:
        state, m = task.train_step(state, *[place(x) for x in b])
        losses.append(float(m["loss"]))
    return losses, state


def _run(task_name, mesh_cfg):
    mesh = make_mesh(mesh_cfg)
    rng = np.random.default_rng(3)
    size = 32 if task_name == "cls" else 64
    imgs = [rng.normal(size=(8, size, size, 3)).astype(np.float32)
            for _ in range(2)]
    place = lambda x: shard_batch(mesh, x)

    if task_name == "cls":
        from ecamp_tpu.train.classification import ClassificationTask

        c = cfg.ClassificationConfig(
            vit=cfg.ViTConfig(**TINY_VIT),
            optimizer=cfg.OptimizerConfig(name="sgd", lr=1e-2, momentum=0.9,
                                          schedule="constant"),
            mesh=mesh_cfg, num_classes=3, is_multilabel=True, bf16=False,
            data=cfg.DataConfig(img_size=32))
        task = ClassificationTask(c, mesh=mesh)
        state = task.init_state(jax.random.PRNGKey(0))
        labels = rng.integers(0, 2, (8, 3)).astype(np.float32)
        batches = [(im, labels) for im in imgs]
    elif task_name == "seg":
        from ecamp_tpu.train.segmentation import SegmentationTask

        c = cfg.SegmentationConfig(
            vit=cfg.ViTConfig(**SEG_VIT),
            optimizer=cfg.OptimizerConfig(name="adamw", lr=1e-3,
                                          schedule="constant"),
            mesh=mesh_cfg, bf16=False, data=cfg.DataConfig(img_size=64),
            decode_features=(16, 16, 8, 8))
        task = SegmentationTask(c, mesh=mesh)
        state = task.init_state(jax.random.PRNGKey(0))
        masks = (rng.random((8, 64, 64, 1)) > 0.7).astype(np.float32)
        batches = [(im, masks) for im in imgs]
    else:
        from ecamp_tpu.train.detection import DetectionTask

        c = cfg.DetectionConfig(
            vit=cfg.ViTConfig(**SEG_VIT),
            optimizer=cfg.OptimizerConfig(name="adamw", lr=1e-3,
                                          schedule="constant"),
            mesh=mesh_cfg, img_size=64, expansion=1, bf16=False,
            data=cfg.DataConfig(img_size=64))
        task = DetectionTask(c, mesh=mesh)
        state = task.init_state(jax.random.PRNGKey(0))
        targets = np.zeros((8, 3, 5), np.float32)
        targets[:, 0] = [0.0, 0.5, 0.5, 0.4, 0.4]
        batches = [(im, targets) for im in imgs]

    losses, state = _steps(task, state, batches, place)
    leaf = np.asarray(jax.device_get(
        jax.tree_util.tree_leaves(state.params)[0]))
    return losses, leaf


@pytest.mark.parametrize("task_name", ["cls", "seg", "det"])
def test_hybrid_tp_matches_pure_dp(task_name):
    dp = _run(task_name, cfg.MeshConfig(data=8))
    hy = _run(task_name, cfg.MeshConfig(data=4, model=2))
    np.testing.assert_allclose(dp[0], hy[0], rtol=2e-5, atol=1e-6)
    # det: AdamW's grad/(sqrt(v)+eps) normalization amplifies
    # reduction-order fp noise early in training (v ~ 0), and the YOLO
    # loss's IoU ignore-threshold comparisons are discrete — a 1-ulp
    # shard-layout difference can flip a mask bit. Losses above prove
    # forward equality; params agree to ~1e-4 after 2 AdamW steps.
    atol = 2e-4 if task_name == "det" else 1e-6
    np.testing.assert_allclose(dp[1], hy[1], rtol=2e-4, atol=atol)
