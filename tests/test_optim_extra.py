"""Layerwise LR decay + schedules + UNet baseline tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_layerwise_lr_scales():
    from ecamp_tpu.train.optim import layerwise_lr_scales

    params = {
        "patch_embed": {"proj": {"kernel": np.zeros((2, 2))}},
        "blocks_0": {"attn": {"qkv": {"kernel": np.zeros((2, 2))}}},
        "blocks_3": {"mlp": {"fc1": {"kernel": np.zeros((2, 2))}}},
        "head": {"kernel": np.zeros((2, 2))},
    }
    s = layerwise_lr_scales(params, decay=0.5, num_layers=4)
    assert s["patch_embed"]["proj"]["kernel"] == 0.5 ** 5
    assert s["blocks_0"]["attn"]["qkv"]["kernel"] == 0.5 ** 4
    assert s["blocks_3"]["mlp"]["fc1"]["kernel"] == 0.5 ** 1
    assert s["head"]["kernel"] == 1.0


def test_layerwise_decay_in_optimizer():
    import optax

    from ecamp_tpu.core.config import OptimizerConfig
    from ecamp_tpu.train.optim import layerwise_lr_scales, make_optimizer

    params = {"blocks_0": {"kernel": jnp.ones((2, 2))},
              "head": {"kernel": jnp.ones((2, 2))}}
    scales = layerwise_lr_scales(params, decay=0.1, num_layers=1)
    cfg = OptimizerConfig(name="sgd", lr=1.0, weight_decay=0.0,
                          momentum=0.0, schedule="constant")
    tx = make_optimizer(cfg, lr_scales=scales)
    st = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    upd, _ = tx.update(grads, st, params)
    # head update magnitude 1*lr, blocks_0 scaled by 0.1^1
    assert abs(float(upd["head"]["kernel"][0, 0])) == pytest.approx(1.0)
    assert abs(float(upd["blocks_0"]["kernel"][0, 0])) == pytest.approx(0.1)


def test_schedules_match_reference_shapes():
    from ecamp_tpu.train.optim import (epoch_cosine_schedule,
                                       warmup_cosine_step_schedule,
                                       warmup_linear_step_schedule)
    import math

    # epoch-cosine (util/lr_sched.py:9-21)
    f = epoch_cosine_schedule(1.0, 0.0, warmup_epochs=4, max_epoch=10,
                              steps_per_epoch=2)
    assert float(f(0)) == 0.0
    assert float(f(4)) == pytest.approx(0.5)  # epoch 2 of 4 warmup
    e = 7.0
    expect = 0.5 * (1 + math.cos(math.pi * (e - 4) / (10 - 4)))
    assert float(f(14)) == pytest.approx(expect, rel=1e-6)

    # step cosine (utils/scheduler.py:24-41)
    g = warmup_cosine_step_schedule(2.0, warmup_steps=10, total_steps=110)
    assert float(g(5)) == pytest.approx(1.0)
    prog = (60 - 10) / 100
    assert float(g(60)) == pytest.approx(
        2.0 * 0.5 * (1 + math.cos(math.pi * prog)), rel=1e-6)

    h = warmup_linear_step_schedule(1.0, 10, 110)
    assert float(h(60)) == pytest.approx(0.5)


@pytest.mark.slow
def test_resnet_unet_shapes():
    from ecamp_tpu.nn.unet import ResNetUNet

    m = ResNetUNet(out_channels=1, decoder_channels=(16, 16, 8, 8, 8))
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 64, 64, 1)


@pytest.mark.slow
def test_summary_writer_smoke(tmp_path):
    from ecamp_tpu.core.observability import SummaryWriter

    w = SummaryWriter(str(tmp_path / "tb"))
    w.add_scalar("x", 1.0, 0)
    w.flush()  # no assertion on files: degrades silently without tf


def test_epoch_cosine_lr_under_accum_matches_reference():
    """Under grad accumulation the optimizer must apply, at each update,
    the epoch-cosine LR of that update's cycle-START micro-step: the
    reference adjusts lr per data iteration whenever iter % accum == 0
    (main_pretrain.py:136-138, util/lr_sched.py:9-21), while MultiSteps'
    inner schedule counts optimizer updates — make_optimizer rescales."""
    import math

    import optax

    from ecamp_tpu.core.config import OptimizerConfig
    from ecamp_tpu.train.optim import make_optimizer

    k, steps_per_epoch, base, minlr, warm, maxep = 4, 8, 0.1, 0.01, 1.0, 4.0
    ocfg = OptimizerConfig(name="sgd", lr=base, min_lr=minlr, momentum=0.0,
                           weight_decay=0.0, schedule="warmup_cosine_epoch",
                           warmup_epochs=warm, accum_steps=k)
    tx = make_optimizer(ocfg, steps_per_epoch=steps_per_epoch, max_epoch=maxep)
    params = {"w": jnp.zeros(())}
    st = tx.init(params)
    grads = {"w": jnp.ones(())}
    traj = [0.0]
    for _ in range(4 * k):
        upd, st = tx.update(grads, st, params)
        params = optax.apply_updates(params, upd)
        traj.append(float(params["w"]))

    def ref_lr(epoch_frac):  # util/lr_sched.py:9-21
        if epoch_frac < warm:
            return base * epoch_frac / warm
        return minlr + (base - minlr) * 0.5 * (
            1.0 + math.cos(math.pi * (epoch_frac - warm) / (maxep - warm)))

    # params move only at cycle boundaries, by -lr(cycle_start)*mean_grad
    w = 0.0
    for t in range(4 * k):
        if (t + 1) % k == 0:
            w -= ref_lr((t + 1 - k) / steps_per_epoch) * 1.0
        np.testing.assert_allclose(traj[t + 1], w, rtol=1e-6, atol=1e-12,
                                   err_msg=f"micro-step {t}")


@pytest.mark.slow
def test_pretrain_logged_lr_is_applied_lr():
    """metrics['lr'] must report the lr the optimizer applies (cycle-start
    schedule value), not the raw micro-step value (round-1 weak #3)."""
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
        optimizer=cfg.OptimizerConfig(lr=0.1, warmup_epochs=1.0,
                                      schedule="warmup_cosine_epoch",
                                      accum_steps=2),
        data=cfg.DataConfig(img_size=64), mesh=cfg.MeshConfig(data=1),
        sr_window=1, max_caption_length=8, bf16=False)
    mesh = make_mesh(tiny.mesh, devices=jax.devices()[:1])
    task = PretrainTask(tiny, mesh=mesh, steps_per_epoch=4)
    state = task.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    batch = task.shard_batch({
        "image": rng.normal(size=(1, 64, 64, 3)).astype(np.float32),
        "ids": rng.integers(0, 64, (1, 8)).astype(np.int32),
        "labels": rng.integers(0, 64, (1, 8)).astype(np.int32),
        "attention_mask": np.ones((1, 8), np.int32),
        "type_ids": np.zeros((1, 8), np.int32),
        "weights": np.ones((1, 8), np.float32),
        "column": np.zeros((1,), np.int32),
        "row": np.zeros((1,), np.int32)})
    lrs = []
    for _ in range(4):
        state, m = task.train_step(state, batch, jax.random.PRNGKey(9))
        lrs.append(float(m["lr"]))
    # warmup_epochs=1, steps_per_epoch=4, accum=2: applied lr at micro-steps
    # 0,1 is sched(0)=0; at 2,3 it is sched(2)=0.1*(2/4)/1
    np.testing.assert_allclose(lrs, [0.0, 0.0, 0.05, 0.05], atol=1e-9)


def test_grad_clip_in_finetune_chain():
    """max_grad_norm=1.0 semantics (Classification/train.py:459): a
    too-large gradient is rescaled to unit global norm before the
    optimizer applies it."""
    import optax

    from ecamp_tpu.core.config import OptimizerConfig
    from ecamp_tpu.train.optim import make_optimizer

    ocfg = OptimizerConfig(name="sgd", lr=0.1, momentum=0.0,
                           weight_decay=0.0, schedule="constant",
                           grad_clip=1.0)
    tx = make_optimizer(ocfg)
    params = {"a": jnp.zeros(()), "b": jnp.zeros(())}
    st = tx.init(params)
    upd, st = tx.update({"a": jnp.asarray(3.0), "b": jnp.asarray(4.0)},
                        st, params)
    # global norm 5 -> clip to 1 -> grads (0.6, 0.8) -> sgd lr 0.1
    np.testing.assert_allclose(float(upd["a"]), -0.1 * 0.6, rtol=1e-6)
    np.testing.assert_allclose(float(upd["b"]), -0.1 * 0.8, rtol=1e-6)
    # small grads pass through unclipped
    upd, st = tx.update({"a": jnp.asarray(0.3), "b": jnp.asarray(0.4)},
                        st, params)
    np.testing.assert_allclose(float(upd["a"]), -0.1 * 0.3, rtol=1e-6)


def test_finetune_clis_default_max_grad_norm():
    """All three fine-tune CLIs default --max_grad_norm to 1.0 (reference
    train.py parsers: Classification:555, Segmentation:465, Detection:559)."""
    import argparse

    for mod in ("finetune_cls", "finetune_seg", "finetune_det"):
        m = __import__(f"ecamp_tpu.cli.{mod}", fromlist=["get_args"])
        import inspect
        import unittest.mock as mock

        parser_holder = {}
        orig = argparse.ArgumentParser.parse_args

        def fake(self, *a, **kw):
            parser_holder["p"] = self
            raise SystemExit(0)

        with mock.patch.object(argparse.ArgumentParser, "parse_args", fake):
            try:
                m.get_args()
            except SystemExit:
                pass
        defaults = {a.dest: a.default
                    for a in parser_holder["p"]._actions}
        assert defaults.get("max_grad_norm") == 1.0, mod
