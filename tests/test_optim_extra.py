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


def test_resnet_unet_shapes():
    from ecamp_tpu.nn.unet import ResNetUNet

    m = ResNetUNet(out_channels=1, decoder_channels=(16, 16, 8, 8, 8))
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 64, 64, 1)


def test_summary_writer_smoke(tmp_path):
    from ecamp_tpu.core.observability import SummaryWriter

    w = SummaryWriter(str(tmp_path / "tb"))
    w.add_scalar("x", 1.0, 0)
    w.flush()  # no assertion on files: degrades silently without tf
