"""Train-step tests: loss decreases, sharding works on the 8-device mesh,
freeze masks actually freeze."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from ecamp_tpu.core import config as cfg
from ecamp_tpu.core.mesh import make_mesh

TINY_VIT = cfg.ViTConfig(img_size=32, patch_size=16, embed_dim=64, depth=2,
                         num_heads=2)


def _cls_task(linear_probe=False):
    from ecamp_tpu.train.classification import ClassificationTask

    c = cfg.ClassificationConfig(
        vit=TINY_VIT, num_classes=3, is_multilabel=True,
        linear_probe=linear_probe, bf16=False,
        optimizer=cfg.OptimizerConfig(name="sgd", lr=0.1, weight_decay=0.0,
                                      schedule="warmup_cosine_step",
                                      warmup_steps=2, total_steps=50),
        mesh=cfg.MeshConfig(data=8),
    )
    mesh = make_mesh(c.mesh)
    return ClassificationTask(c, mesh=mesh)


def test_classification_loss_decreases():
    task = _cls_task()
    state = task.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, (8, 3)), jnp.float32)
    losses = []
    for i in range(8):
        state, m = task.train_step(state, x, y)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_linear_probe_freezes_trunk():
    task = _cls_task(linear_probe=True)
    state = task.init_state(jax.random.PRNGKey(0))
    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, (8, 3)), jnp.float32)
    for _ in range(3):
        state, _ = task.train_step(state, x, y)
    trunk_same = np.allclose(
        np.asarray(state.params["trunk"]["blocks_0"]["attn"]["qkv"]["kernel"]),
        p0["trunk"]["blocks_0"]["attn"]["qkv"]["kernel"])
    head_changed = not np.allclose(np.asarray(state.params["head"]["kernel"]),
                                   p0["head"]["kernel"])
    assert trunk_same and head_changed


def test_segmentation_step_and_dice():
    from ecamp_tpu.train.segmentation import SegmentationTask

    c = cfg.SegmentationConfig(
        vit=cfg.ViTConfig(img_size=64, patch_size=16, embed_dim=64, depth=1,
                          num_heads=2),
        decode_features=(16, 16, 8, 8), bf16=False,
        optimizer=cfg.OptimizerConfig(name="adamw", lr=1e-3,
                                      schedule="warmup_cosine_step",
                                      warmup_steps=2, total_steps=50),
        data=cfg.DataConfig(img_size=64), mesh=cfg.MeshConfig(data=8),
    )
    task = SegmentationTask(c, mesh=make_mesh(c.mesh))
    state = task.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 64, 64, 3)), jnp.float32)
    m = jnp.asarray((rng.random((8, 64, 64, 1)) > 0.7), jnp.float32)
    state, metrics = task.train_step(state, x, m)
    assert np.isfinite(float(metrics["loss"]))
    probs = task.eval_step(state, x)
    d = task.compute_dice(np.asarray(probs), np.asarray(m))
    assert d.shape == (8,)
    assert np.all((d >= 0) & (d <= 1))


def test_dice_empty_mask_convention():
    from ecamp_tpu.train.eval_metrics import dice_scores

    probs = np.zeros((2, 4, 4))
    truth = np.zeros((2, 4, 4))
    probs[1, 0, 0] = 0.9  # pred non-empty, gt empty -> 0
    d = dice_scores(probs, truth)
    assert d[0] == 1.0 and d[1] == 0.0


def test_detection_step_runs():
    from ecamp_tpu.train.detection import DetectionTask

    c = cfg.DetectionConfig(
        vit=cfg.ViTConfig(img_size=224, patch_size=16, embed_dim=64, depth=1,
                          num_heads=2),
        bf16=False,
        optimizer=cfg.OptimizerConfig(name="adamw", lr=1e-4,
                                      schedule="warmup_cosine_step",
                                      warmup_steps=2, total_steps=50),
        mesh=cfg.MeshConfig(data=8),
    )
    task = DetectionTask(c, mesh=make_mesh(c.mesh))
    state = task.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 224, 224, 3)), jnp.float32)
    t = np.zeros((8, 10, 5), np.float32)
    t[:, 0] = [0, 0.5, 0.5, 0.3, 0.2]  # one box per image
    state, metrics = task.train_step(state, x, jnp.asarray(t))
    assert np.isfinite(float(metrics["loss"]))
    preds = task.eval_step(state, x)
    assert preds.shape == (8, 3 * (49 + 196 + 784), 6)
    dets = task.detections(preds)
    gts = [np.array([[0.4 * 224 - 0.15 * 224, 0.4 * 224 - 0.1 * 224,
                      0.4 * 224 + 0.15 * 224, 0.4 * 224 + 0.1 * 224]])] * 8
    mp = task.compute_map(dets, gts)
    assert 0.0 <= mp <= 1.0


def test_roc_auc_matches_closed_form():
    from ecamp_tpu.train.eval_metrics import roc_auc

    scores = np.array([0.1, 0.4, 0.35, 0.8])
    labels = np.array([0, 0, 1, 1])
    # sklearn.roc_auc_score gives 0.75 for this classic example
    assert abs(roc_auc(scores, labels) - 0.75) < 1e-9
    # ties handled by average rank
    s2 = np.array([0.5, 0.5, 0.5, 0.5])
    l2 = np.array([0, 1, 0, 1])
    assert abs(roc_auc(s2, l2) - 0.5) < 1e-9


def test_remat_matches_exact():
    """cfg.remat (jax.checkpoint per block) must be numerically identical
    to the non-remat step — it only changes the memory/recompute schedule."""
    from ecamp_tpu.train.pretrain import PretrainTask

    def build(remat):
        tiny = cfg.PretrainConfig(
            vit=cfg.ViTConfig(img_size=32, patch_size=16, embed_dim=32,
                              depth=2, num_heads=2, remat=remat),
            decoder=cfg.MAEDecoderConfig(embed_dim=16, depth=1, num_heads=2,
                                         remat=remat),
            bert=cfg.BertConfig(vocab_size=64, hidden_size=32,
                                num_hidden_layers=2, num_attention_heads=2,
                                intermediate_size=64,
                                max_position_embeddings=8, remat=remat),
            optimizer=cfg.OptimizerConfig(schedule="constant", lr=1e-3),
            data=cfg.DataConfig(img_size=64), mesh=cfg.MeshConfig(data=1),
            sr_window=1, max_caption_length=8, bf16=False)
        task = PretrainTask(tiny, mesh=make_mesh(tiny.mesh,
                                                 devices=jax.devices()[:1]))
        state = task.init_state(jax.random.PRNGKey(0))
        return task, state

    rng = np.random.default_rng(5)
    batch = {
        "image": rng.normal(size=(2, 64, 64, 3)).astype(np.float32),
        "ids": rng.integers(0, 64, (2, 8)).astype(np.int32),
        "labels": rng.integers(0, 64, (2, 8)).astype(np.int32),
        "attention_mask": np.ones((2, 8), np.int32),
        "type_ids": np.zeros((2, 8), np.int32),
        "weights": np.ones((2, 8), np.float32),
        "column": np.zeros((2,), np.int32),
        "row": np.zeros((2,), np.int32)}
    outs = {}
    for remat in (False, True):
        task, state = build(remat)
        sharded = task.shard_batch(batch)
        state, m = task.train_step(state, sharded, jax.random.PRNGKey(7))
        outs[remat] = (float(m["loss"]),
                       np.asarray(state.params["cls_token"]))
    assert np.isclose(outs[False][0], outs[True][0], rtol=1e-6)
    np.testing.assert_allclose(outs[False][1], outs[True][1], rtol=1e-5,
                               atol=1e-7)


def test_scan_train_step_matches_sequential():
    """make_train_step_scan (K optimizer steps per dispatch, CLI
    --steps_per_call) must reproduce K sequential train_step calls: same
    per-step rng folding (each scan iteration folds in its own
    state.step), same losses, same final params."""
    from ecamp_tpu.train.pretrain import PretrainTask

    tiny = cfg.PretrainConfig(
        vit=cfg.ViTConfig(img_size=32, patch_size=16, embed_dim=32,
                          depth=1, num_heads=2),
        decoder=cfg.MAEDecoderConfig(embed_dim=16, depth=1, num_heads=2),
        bert=cfg.BertConfig(vocab_size=64, hidden_size=32,
                            num_hidden_layers=1, num_attention_heads=2,
                            intermediate_size=64,
                            max_position_embeddings=8),
        optimizer=cfg.OptimizerConfig(schedule="constant", lr=1e-3),
        data=cfg.DataConfig(img_size=64), mesh=cfg.MeshConfig(data=1),
        sr_window=1, max_caption_length=8, bf16=False)

    rng = np.random.default_rng(9)

    def mk_batch():
        return {
            "image": rng.normal(size=(2, 64, 64, 3)).astype(np.float32),
            "ids": rng.integers(0, 64, (2, 8)).astype(np.int32),
            "labels": rng.integers(0, 64, (2, 8)).astype(np.int32),
            "attention_mask": np.ones((2, 8), np.int32),
            "type_ids": np.zeros((2, 8), np.int32),
            "weights": np.ones((2, 8), np.float32),
            "column": np.zeros((2,), np.int32),
            "row": np.zeros((2,), np.int32)}

    batches = [mk_batch() for _ in range(3)]
    key = jax.random.PRNGKey(11)

    def build():
        task = PretrainTask(tiny, mesh=make_mesh(tiny.mesh,
                                                 devices=jax.devices()[:1]))
        return task, task.init_state(jax.random.PRNGKey(0))

    task, state = build()
    seq_losses = []
    for b in batches:
        state, m = task.train_step(state, task.shard_batch(b), key)
        seq_losses.append(float(m["loss"]))
    seq_params = np.asarray(state.params["cls_token"])

    task2, state2 = build()
    scan_step = task2.make_train_step_scan(state2)
    super_b = task2.shard_superbatch(batches)
    state2, ms = scan_step(state2, super_b, key)
    scan_losses = [float(v) for v in np.asarray(ms["loss"])]
    assert int(state2.step) == 3

    np.testing.assert_allclose(scan_losses, seq_losses, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(state2.params["cls_token"]),
                               seq_params, rtol=1e-6, atol=1e-8)


def test_frozen_encoder_stop_gradient_updates_identical():
    """stop_trunk_grad (skip dead backward under freeze) must produce the
    exact same post-step params as computing-then-masking the grads."""

    from ecamp_tpu.train.segmentation import SegmentationTask

    c = cfg.SegmentationConfig(
        vit=cfg.ViTConfig(img_size=64, patch_size=16, embed_dim=32, depth=1,
                          num_heads=2),
        decode_features=(8, 8, 8, 8), bf16=False, freeze_encoder=True,
        # sgd: updates are linear in grads, so tolerances are meaningful
        # (first-step adamw normalizes to +-lr and amplifies fp noise)
        optimizer=cfg.OptimizerConfig(name="sgd", lr=1e-2, weight_decay=0.0,
                                      schedule="constant"),
        data=cfg.DataConfig(img_size=64), mesh=cfg.MeshConfig(data=1),
    )
    task = SegmentationTask(c, mesh=make_mesh(c.mesh,
                                              devices=jax.devices()[:1]))
    state = task.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    m = jnp.asarray((rng.random((2, 64, 64, 1)) > 0.7), jnp.float32)

    # manual step computing the full backward (no stop), masked by the
    # same optimizer
    def loss_full(params, batch_stats):
        from ecamp_tpu.ops.losses import mixed_loss

        out, mutated = task.model.apply(
            {"params": params, "batch_stats": batch_stats}, x,
            train=True, mutable=["batch_stats"], stop_trunk_grad=False)
        return mixed_loss(out[..., 0], m[..., 0], c.mixed_loss_alpha,
                          c.focal_gamma), mutated["batch_stats"]

    def loss_stop(params, batch_stats):
        from ecamp_tpu.ops.losses import mixed_loss

        out, mutated = task.model.apply(
            {"params": params, "batch_stats": batch_stats}, x,
            train=True, mutable=["batch_stats"], stop_trunk_grad=True)
        return mixed_loss(out[..., 0], m[..., 0], c.mixed_loss_alpha,
                          c.focal_gamma), mutated["batch_stats"]

    (l0, _), g_full = jax.value_and_grad(loss_full, has_aux=True)(
        state.params, state.batch_stats)
    (l1, _), g_stop = jax.value_and_grad(loss_stop, has_aux=True)(
        state.params, state.batch_stats)
    assert float(l0) == float(l1)  # forward value unchanged
    # trainable-leaf grads agree; trunk grads become exact zeros
    flat_full = dict(jax.tree_util.tree_leaves_with_path(g_full))
    for path, gs in jax.tree_util.tree_leaves_with_path(g_stop):
        keys = [getattr(k, "key", "") for k in path]
        gf = flat_full[path]
        if keys[0] == "encoder" and keys[1] == "trunk":
            np.testing.assert_array_equal(np.asarray(gs), 0.0)
        else:
            np.testing.assert_allclose(np.asarray(gs), np.asarray(gf),
                                       rtol=1e-4, atol=1e-6)

    trunk_before = jax.tree_util.tree_map(
        np.asarray, state.params["encoder"]["trunk"])
    new_state, metrics = task.train_step(state, x, m)  # donates state
    # trunk params must be bitwise untouched by the real step
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        new_state.params["encoder"]["trunk"], trunk_before)
