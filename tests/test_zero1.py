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
def test_fsdp_pretrain_step_matches_replicated():
    """FSDP / ZeRO-3 (MeshConfig.shard_params): params AND moments
    sharded over 'data'. One jitted step must be numerically identical
    to the replicated run — GSPMD only changes where tensors live and
    which collectives move them."""
    from jax.sharding import PartitionSpec as P

    from ecamp_tpu.train.pretrain import PretrainTask

    def build(shard_params):
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
            mesh=cfg.MeshConfig(data=8, shard_params=shard_params),
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
    for shard_params in (False, True):
        task, state = build(shard_params)
        if shard_params:
            # divisible param leaves sharded over 'data', scalars not
            cls = state.params["cls_token"]
            assert "data" in str(cls.sharding.spec), cls.sharding
            mu = [x for x in jax.tree_util.tree_leaves(state.opt_state)
                  if getattr(x, "ndim", 0) >= 1]
            assert any("data" in str(x.sharding.spec) for x in mu)
        sharded = task.shard_batch(batch)
        losses = []
        for _ in range(2):
            state, m = task.train_step(state, sharded, jax.random.PRNGKey(7))
            losses.append(float(m["loss"]))
        if shard_params:
            # layout stable after the step (pinned by _out_constraint)
            assert "data" in str(state.params["cls_token"].sharding.spec)
        outs[shard_params] = (losses,
                              np.asarray(state.params["cls_token"]))
    np.testing.assert_allclose(outs[False][0], outs[True][0], rtol=1e-6)
    np.testing.assert_allclose(outs[False][1], outs[True][1], rtol=1e-5,
                               atol=1e-7)


@pytest.mark.slow
def test_orbax_roundtrip_sharded_state(tmp_path):
    """Checkpoint round trip for a sharded (FSDP + ZeRO-1) TrainState:
    orbax must snapshot non-trivially NamedSharded arrays before the
    donating step clobbers them, and restore into a sharded template
    with values intact (the resume path for --fsdp/--shard_optimizer)."""
    from ecamp_tpu.ckpt import restore_checkpoint, save_checkpoint
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
            mesh=cfg.MeshConfig(data=8, shard_params=True,
                                shard_optimizer=True),
            sr_window=1, max_caption_length=8, bf16=False)
        task = PretrainTask(tiny, mesh=make_mesh(tiny.mesh))
        return task, task.init_state(jax.random.PRNGKey(0))

    rng = np.random.default_rng(7)
    batch = {
        "image": rng.normal(size=(8, 64, 64, 3)).astype(np.float32),
        "ids": rng.integers(0, 64, (8, 8)).astype(np.int32),
        "labels": rng.integers(0, 64, (8, 8)).astype(np.int32),
        "attention_mask": np.ones((8, 8), np.int32),
        "type_ids": np.zeros((8, 8), np.int32),
        "weights": np.ones((8, 8), np.float32),
        "column": np.zeros((8,), np.int32),
        "row": np.zeros((8,), np.int32)}
    task, state = build()
    assert "data" in str(state.params["cls_token"].sharding.spec)
    sharded = task.shard_batch(batch)
    key = jax.random.PRNGKey(1)
    state, _ = task.train_step(state, sharded, key)  # donating step
    tree = {"params": state.params, "opt_state": state.opt_state,
            "step": state.step}
    snap = jax.device_get(tree)
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, 1, tree)
    for _ in range(3):  # clobber the donated buffers
        state, _ = task.train_step(state, sharded, key)

    task2, template = build()
    out = restore_checkpoint(
        d, template={"params": template.params,
                     "opt_state": template.opt_state,
                     "step": template.step})
    # restored with the template's (sharded) layouts and exact values
    assert "data" in str(out["params"]["cls_token"].sharding.spec)
    for a, b in zip(jax.tree_util.tree_leaves(snap),
                    jax.tree_util.tree_leaves(jax.device_get(out))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the restored state trains
    restored = template.replace(params=out["params"],
                                opt_state=out["opt_state"],
                                step=out["step"])
    restored, m = task2.train_step(restored, task2.shard_batch(batch), key)
    assert np.isfinite(float(m["loss"]))


def test_fsdp_rejects_tp_mesh():
    from ecamp_tpu.train.pretrain import PretrainTask

    tiny = cfg.PretrainConfig(
        vit=cfg.ViTConfig(img_size=32, patch_size=16, embed_dim=32,
                          depth=1, num_heads=2),
        decoder=cfg.MAEDecoderConfig(embed_dim=16, depth=1, num_heads=2),
        bert=cfg.BertConfig(vocab_size=64, hidden_size=32,
                            num_hidden_layers=1, num_attention_heads=2,
                            intermediate_size=64, max_position_embeddings=8),
        data=cfg.DataConfig(img_size=64),
        mesh=cfg.MeshConfig(data=4, model=2, shard_params=True),
        sr_window=1, max_caption_length=8, bf16=False)
    with pytest.raises(ValueError, match="FSDP"):
        PretrainTask(tiny, mesh=make_mesh(tiny.mesh))


@pytest.mark.slow
def test_zero1_fused_update_matches_optax_fixed_grads():
    """The shard_map ZeRO-1 fused update (kernels/fused_adamw.py::
    _zero1_update) vs the optax chain on the same FIXED grads (no
    model feedback, so the comparison is exact): 3 steps, moments
    ZeRO-1-placed over the 8-device mesh, params replicated."""
    import optax

    from ecamp_tpu.core.mesh import (cpu_test_mesh, replicate,
                                     shard_opt_state_zero1)
    from ecamp_tpu.kernels.fused_adamw import fused_adamw
    from ecamp_tpu.train.optim import _decay_mask

    mesh = cpu_test_mesh(8)
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 4)
    params = {
        "tok": jax.random.normal(ks[0], (1, 1, 32)),     # last-dim shard
        "dense": {"kernel": jax.random.normal(ks[1], (48, 16)),
                  "bias": jax.random.normal(ks[2], (16,))},
        "odd": jax.random.normal(ks[3], (5, 3)),          # replicated
    }
    sched = lambda u: 1e-3 * (1.0 + 0.5 * jax.numpy.asarray(u, "float32"))
    ref_tx = optax.chain(optax.adamw(sched, b1=0.9, b2=0.95, eps=1e-8,
                                     weight_decay=0.05, mask=_decay_mask))
    fus_tx = fused_adamw(sched, 0.9, 0.95, 1e-8, 0.05, _decay_mask,
                         zero1_mesh=mesh, use_pallas=False)

    ref_p = fus_p = replicate(mesh, params)
    ref_s = shard_opt_state_zero1(mesh, replicate(mesh, ref_tx.init(params)))
    fus_s = shard_opt_state_zero1(mesh, replicate(mesh, fus_tx.init(params)))
    assert (jax.tree_util.tree_structure(ref_s)
            == jax.tree_util.tree_structure(fus_s))

    @jax.jit
    def ref_step(g, s, p):
        upd, s = ref_tx.update(g, s, p)
        return optax.apply_updates(p, upd), s

    fus_step = jax.jit(fus_tx.fused_apply)
    for step in range(3):
        g = jax.tree_util.tree_map(
            lambda p: jax.random.normal(
                jax.random.fold_in(jax.random.PRNGKey(9), step), p.shape),
            params)
        g = replicate(mesh, g)
        ref_p, ref_s = ref_step(g, ref_s, ref_p)
        fus_p, fus_s = fus_step(g, fus_s, fus_p)
        for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(ref_p)),
                        jax.tree_util.tree_leaves(jax.device_get(fus_p))):
            np.testing.assert_allclose(a, b, rtol=2e-6, atol=1e-7)
        for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(ref_s)),
                        jax.tree_util.tree_leaves(jax.device_get(fus_s))):
            np.testing.assert_allclose(a, b, rtol=2e-6, atol=1e-7)
    # moments still ZeRO-1-sharded after the fused updates
    mu = [x for x in jax.tree_util.tree_leaves(fus_s)
          if getattr(x, "ndim", 0) >= 1]
    assert any("data" in str(x.sharding.spec) for x in mu)


@pytest.mark.slow
def test_zero1_fused_adamw_matches_optax(monkeypatch):
    """ECAMP_FUSED_ADAMW=1 under dp=8 + ZeRO-1 runs the update inside a
    shard_map region (kernels/fused_adamw.py::_zero1_update): e2e wiring
    check — losses must match the optax ZeRO-1 path and the moment
    layout must stay ZeRO-1-sharded. (Params compared loosely: the two
    flags are different compiled programs, and Adam amplifies last-ulp
    backward noise on near-zero-grad leaves; exact update equality is
    covered by test_zero1_fused_update_matches_optax_fixed_grads.)"""
    from ecamp_tpu.train.pretrain import PretrainTask

    def build():
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
            mesh=cfg.MeshConfig(data=8, shard_optimizer=True),
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
    for flag in ("0", "1"):
        monkeypatch.setenv("ECAMP_FUSED_ADAMW", flag)
        task, state = build()
        if flag == "1":
            assert hasattr(task.tx, "fused_apply")
        sharded = task.shard_batch(batch)
        losses = []
        for _ in range(2):
            state, m = task.train_step(state, sharded, jax.random.PRNGKey(7))
            losses.append(float(m["loss"]))
        mu = [x for x in jax.tree_util.tree_leaves(state.opt_state)
              if getattr(x, "ndim", 0) >= 1]
        assert any("data" in str(x.sharding.spec) for x in mu)
        outs[flag] = (losses, np.asarray(state.params["cls_token"]),
                      jax.device_get(state.params))
    np.testing.assert_allclose(outs["0"][0], outs["1"][0], rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(outs["0"][2]),
                    jax.tree_util.tree_leaves(outs["1"][2])):
        np.testing.assert_allclose(a, b, rtol=0, atol=2e-3)


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
