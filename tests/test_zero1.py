"""ZeRO-1 optimizer-state sharding (core/mesh.py::shard_opt_state_zero1).

SURVEY §2.9's optional growth item: AdamW moments sharded over the data
axis, params replicated. Numerics must be identical to the replicated
run — ZeRO-1 only changes where the moments live.
"""

import jax
import numpy as np
import pytest

from ecamp_tpu.core import config as cfg
from ecamp_tpu.core.mesh import make_mesh, zero1_spec
from jax.sharding import PartitionSpec as P


def test_zero1_spec_picks_first_divisible_axis():
    assert zero1_spec((768,), "data", 8) == P("data")
    assert zero1_spec((1, 1, 768), "data", 8) == P(None, None, "data")
    assert zero1_spec((3, 3, 3, 64), "data", 8) == P(None, None, None, "data")
    assert zero1_spec((), "data", 8) == P()          # scalar counters
    assert zero1_spec((5,), "data", 8) == P()        # indivisible
    assert zero1_spec((30000, 64), "data", 8) == P("data")


@pytest.mark.slow
def test_zero1_pretrain_step_matches_replicated():
    from ecamp_tpu.train.pretrain import PretrainTask

    def build(shard_opt):
        tiny = cfg.PretrainConfig(
            vit=cfg.ViTConfig(img_size=32, patch_size=16, embed_dim=32,
                              depth=2, num_heads=2),
            decoder=cfg.MAEDecoderConfig(embed_dim=16, depth=1, num_heads=2),
            bert=cfg.BertConfig(vocab_size=64, hidden_size=32,
                                num_hidden_layers=2, num_attention_heads=2,
                                intermediate_size=64,
                                max_position_embeddings=8),
            optimizer=cfg.OptimizerConfig(schedule="constant", lr=1e-3),
            data=cfg.DataConfig(img_size=64),
            mesh=cfg.MeshConfig(data=8, shard_optimizer=shard_opt),
            sr_window=1, max_caption_length=8, bf16=False)
        task = PretrainTask(tiny, mesh=make_mesh(tiny.mesh))
        return task, task.init_state(jax.random.PRNGKey(0))

    rng = np.random.default_rng(5)
    batch = {
        "image": rng.normal(size=(8, 64, 64, 3)).astype(np.float32),
        "ids": rng.integers(0, 64, (8, 8)).astype(np.int32),
        "labels": rng.integers(0, 64, (8, 8)).astype(np.int32),
        "attention_mask": np.ones((8, 8), np.int32),
        "type_ids": np.zeros((8, 8), np.int32),
        "weights": np.ones((8, 8), np.float32),
        "column": np.zeros((8,), np.int32),
        "row": np.zeros((8,), np.int32)}
    outs = {}
    for shard_opt in (False, True):
        task, state = build(shard_opt)
        if shard_opt:
            # moments sharded over 'data', params replicated
            mu = jax.tree_util.tree_leaves(state.opt_state)
            specs = {getattr(x, "sharding", None).spec for x in mu
                     if getattr(x, "ndim", 0) >= 1 and x.shape[-1] % 8 == 0}
            assert any("data" in str(s) for s in specs), specs
            p0 = jax.tree_util.tree_leaves(state.params)[0]
            assert p0.sharding.spec == P()
        sharded = task.shard_batch(batch)
        losses = []
        for i in range(2):
            state, m = task.train_step(state, sharded, jax.random.PRNGKey(7))
            losses.append(float(m["loss"]))
        if shard_opt:
            # layout must be stable after the update (the step pins it)
            mu2 = [x for x in jax.tree_util.tree_leaves(state.opt_state)
                   if getattr(x, "ndim", 0) >= 1]
            assert any("data" in str(x.sharding.spec) for x in mu2)
        outs[shard_opt] = (losses, np.asarray(state.params["cls_token"]))
    np.testing.assert_allclose(outs[False][0], outs[True][0], rtol=1e-6)
    np.testing.assert_allclose(outs[False][1], outs[True][1], rtol=1e-5,
                               atol=1e-7)


@pytest.mark.slow
def test_zero1_scan_step_matches_sequential():
    """make_train_step_scan under dp=8 + ZeRO-1: the per-iteration
    output-sharding constraint must hold inside lax.scan, and numerics
    must match sequential ZeRO-1 steps."""
    from ecamp_tpu.train.pretrain import PretrainTask

    def build():
        tiny = cfg.PretrainConfig(
            vit=cfg.ViTConfig(img_size=32, patch_size=16, embed_dim=32,
                              depth=1, num_heads=2),
            decoder=cfg.MAEDecoderConfig(embed_dim=16, depth=1, num_heads=2),
            bert=cfg.BertConfig(vocab_size=64, hidden_size=32,
                                num_hidden_layers=1, num_attention_heads=2,
                                intermediate_size=64,
                                max_position_embeddings=8),
            optimizer=cfg.OptimizerConfig(schedule="constant", lr=1e-3),
            data=cfg.DataConfig(img_size=64),
            mesh=cfg.MeshConfig(data=8, shard_optimizer=True),
            sr_window=1, max_caption_length=8, bf16=False)
        task = PretrainTask(tiny, mesh=make_mesh(tiny.mesh))
        return task, task.init_state(jax.random.PRNGKey(0))

    rng = np.random.default_rng(6)

    def mk_batch():
        return {
            "image": rng.normal(size=(8, 64, 64, 3)).astype(np.float32),
            "ids": rng.integers(0, 64, (8, 8)).astype(np.int32),
            "labels": rng.integers(0, 64, (8, 8)).astype(np.int32),
            "attention_mask": np.ones((8, 8), np.int32),
            "type_ids": np.zeros((8, 8), np.int32),
            "weights": np.ones((8, 8), np.float32),
            "column": np.zeros((8,), np.int32),
            "row": np.zeros((8,), np.int32)}

    batches = [mk_batch() for _ in range(2)]
    key = jax.random.PRNGKey(3)

    task, state = build()
    seq = []
    for b in batches:
        state, m = task.train_step(state, task.shard_batch(b), key)
        seq.append(float(m["loss"]))
    seq_params = np.asarray(state.params["cls_token"])

    task2, state2 = build()
    scan_step = task2.make_train_step_scan(state2)
    state2, ms = scan_step(state2, task2.shard_superbatch(batches), key)
    np.testing.assert_allclose([float(v) for v in np.asarray(ms["loss"])],
                               seq, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(state2.params["cls_token"]),
                               seq_params, rtol=1e-5, atol=1e-7)
    # moments still ZeRO-1-sharded after the scan
    mu = [x for x in jax.tree_util.tree_leaves(state2.opt_state)
          if getattr(x, "ndim", 0) >= 1]
    assert any("data" in str(x.sharding.spec) for x in mu)
