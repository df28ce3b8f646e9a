"""Fused AdamW (kernels/fused_adamw.py) vs optax.adamw equivalence.

The fused path must be numerically interchangeable with the optax chain
it replaces (scale_by_adam -> masked add_decayed_weights -> schedule),
including bias-correction/count semantics and the timm no-decay split
(1-d params), and its optimizer-state layout must be identical so
orbax/torch-moment restore keep working.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ecamp_tpu.kernels.fused_adamw import fused_adamw, _leaf_update_pallas
from ecamp_tpu.train.optim import _decay_mask

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


B1, B2, EPS, WD = 0.9, 0.95, 1e-8, 0.05


def _sched(step):
    # varies per step so count semantics are exercised
    return 1e-3 * (1.0 + 0.1 * jnp.asarray(step, jnp.float32))


def _tree(key):
    ks = jax.random.split(key, 5)
    return {
        "dense": {"kernel": jax.random.normal(ks[0], (96, 256)),
                  "bias": jax.random.normal(ks[1], (256,))},
        # non-128-multiple flat size and a >min-elems leaf
        "vocab": {"kernel": jax.random.normal(ks[2], (48, 375))},
        "norm": {"scale": jax.random.normal(ks[3], (96,))},
        "odd": jax.random.normal(ks[4], (7, 13)),
    }


def test_fused_apply_matches_optax_over_steps():
    params = _tree(jax.random.PRNGKey(0))
    # chain-wrapped like make_optimizer's `optax.chain(*pre, tx, *post)`
    ref_tx = optax.chain(optax.adamw(_sched, b1=B1, b2=B2, eps=EPS,
                                     weight_decay=WD, mask=_decay_mask))
    fus_tx = fused_adamw(_sched, B1, B2, EPS, WD, _decay_mask,
                         use_pallas=False)

    ref_state = ref_tx.init(params)
    fus_state = fus_tx.init(params)
    assert (jax.tree_util.tree_structure(ref_state)
            == jax.tree_util.tree_structure(fus_state))

    ref_p, fus_p = params, params
    for step in range(4):
        g = jax.tree_util.tree_map(
            lambda p: jax.random.normal(
                jax.random.fold_in(jax.random.PRNGKey(7), step), p.shape),
            ref_p)
        upd, ref_state = ref_tx.update(g, ref_state, ref_p)
        ref_p = optax.apply_updates(ref_p, upd)
        fus_p, fus_state = fus_tx.fused_apply(g, fus_state, fus_p)

        for a, b in zip(jax.tree_util.tree_leaves(ref_p),
                        jax.tree_util.tree_leaves(fus_p)):
            np.testing.assert_allclose(a, b, rtol=2e-6, atol=1e-7)
        for a, b in zip(jax.tree_util.tree_leaves(ref_state),
                        jax.tree_util.tree_leaves(fus_state)):
            np.testing.assert_allclose(a, b, rtol=2e-6, atol=1e-7)


@pytest.mark.parametrize("grad_clip", [None, 1.0])
def test_state_layout_matches_make_optimizer_across_flag(monkeypatch,
                                                         grad_clip):
    """Orbax restore across the ECAMP_FUSED_ADAMW=0/1 boundary requires
    the fused and non-fused make_optimizer states to be the SAME pytree
    structure, with and without grad_clip."""
    from ecamp_tpu.core.config import OptimizerConfig
    from ecamp_tpu.train.optim import make_optimizer

    params = _tree(jax.random.PRNGKey(4))
    cfg = OptimizerConfig(name="adamw", lr=1e-3, weight_decay=WD,
                          grad_clip=grad_clip, schedule="constant")
    states = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("ECAMP_FUSED_ADAMW", flag)
        tx = make_optimizer(cfg)
        if flag == "1":
            assert hasattr(tx, "fused_apply")
        states[flag] = tx.init(params)
    assert (jax.tree_util.tree_structure(states["0"])
            == jax.tree_util.tree_structure(states["1"]))


def test_fused_apply_with_clip_matches_optax_chain():
    """grad_clip path: state layout and numerics must match
    optax.chain(clip_by_global_norm, adamw) — the make_optimizer chain
    for the fine-tune default (max_grad_norm=1.0). Uses one step with a
    norm above the bound (clip active) and one below (identity)."""
    params = _tree(jax.random.PRNGKey(2))
    clip = 1.0
    ref_tx = optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(_sched, b1=B1, b2=B2, eps=EPS, weight_decay=WD,
                    mask=_decay_mask))
    fus_tx = fused_adamw(_sched, B1, B2, EPS, WD, _decay_mask,
                         grad_clip=clip, use_pallas=False)

    ref_state = ref_tx.init(params)
    fus_state = fus_tx.init(params)
    assert (jax.tree_util.tree_structure(ref_state)
            == jax.tree_util.tree_structure(fus_state))

    ref_p, fus_p = params, params
    for step, scale in enumerate((3.0, 1e-4, 2.5)):  # clipped, not, clipped
        g = jax.tree_util.tree_map(
            lambda p: scale * jax.random.normal(
                jax.random.fold_in(jax.random.PRNGKey(11), step), p.shape),
            ref_p)
        gnorm = optax.global_norm(g)
        assert (float(gnorm) > clip) == (scale > 1.0)
        upd, ref_state = ref_tx.update(g, ref_state, ref_p)
        ref_p = optax.apply_updates(ref_p, upd)
        fus_p, fus_state = fus_tx.fused_apply(g, fus_state, fus_p)

        for a, b in zip(jax.tree_util.tree_leaves(ref_p),
                        jax.tree_util.tree_leaves(fus_p)):
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-7)
        for a, b in zip(jax.tree_util.tree_leaves(ref_state),
                        jax.tree_util.tree_leaves(fus_state)):
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-7)


@pytest.mark.skipif(pltpu is None, reason="pallas tpu backend unavailable")
def test_pallas_leaf_matches_jnp_reference():
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 4)
    # ragged size: not a multiple of 128, > _MIN_PALLAS_ELEMS
    shape = (171, 133)
    g = jax.random.normal(ks[0], shape)
    m = jax.random.normal(ks[1], shape) * 0.1
    v = jnp.abs(jax.random.normal(ks[2], shape)) * 0.01
    p = jax.random.normal(ks[3], shape)
    lr, bc1, bc2 = 1e-3, 1.0 - B1 ** 3, 1.0 - B2 ** 3
    gdiv, gmul = 2.7, 1.0  # clip active: (g / gnorm) * max_norm
    scal = jnp.asarray([lr, bc1, bc2, gdiv, gmul], jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        p_k, m_k, v_k = _leaf_update_pallas(g, m, v, p, scal, B1, B2, EPS, WD)

    g = g / gdiv * gmul
    m_ref = (1 - B1) * g + B1 * m
    v_ref = (1 - B2) * g * g + B2 * v
    u = (m_ref / bc1) / (jnp.sqrt(v_ref / bc2) + EPS) + WD * p
    p_ref = p - lr * u
    np.testing.assert_allclose(np.asarray(p_k), np.asarray(p_ref),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(m_k), np.asarray(m_ref),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_ref),
                               rtol=1e-6, atol=1e-7)


def test_finetune_cls_step_fused_matches_default(monkeypatch):
    """The fine-tune path (adamw + global-norm clip 1.0): jitted cls
    train steps with ECAMP_FUSED_ADAMW=1 match the optax chain."""
    from ecamp_tpu.core import config as cfg
    from ecamp_tpu.core.mesh import make_mesh
    from ecamp_tpu.train.classification import ClassificationTask

    c = cfg.ClassificationConfig(
        vit=cfg.ViTConfig(img_size=32, patch_size=16, embed_dim=64,
                          depth=2, num_heads=2),
        num_classes=3, is_multilabel=True, bf16=False,
        optimizer=cfg.OptimizerConfig(name="adamw", lr=3e-2,
                                      weight_decay=0.05, grad_clip=1.0,
                                      schedule="warmup_cosine_step",
                                      warmup_steps=2, total_steps=50),
        mesh=cfg.MeshConfig(data=1))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, (4, 3)), jnp.float32)

    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("ECAMP_FUSED_ADAMW", flag)
        task = ClassificationTask(c, mesh=make_mesh(c.mesh,
                                                    devices=jax.devices()[:1]))
        state = task.init_state(jax.random.PRNGKey(0))
        if flag == "1":
            assert hasattr(task.tx, "fused_apply")
        losses = []
        for _ in range(3):
            state, m = task.train_step(state, x, y)
            losses.append(float(m["loss"]))
        outs[flag] = (losses, jax.device_get(state.params))
    np.testing.assert_allclose(outs["0"][0], outs["1"][0],
                               rtol=1e-4, atol=1e-6)
    # Wiring check only — the two flags compile DIFFERENT programs, XLA
    # fuses the backward differently, and Adam amplifies last-ulp grad
    # noise (u ~ sign(g) where |g| is small), so 3-step trajectories of
    # the two programs agree only loosely (measured max ~1e-4; both are
    # bitwise-deterministic run-to-run). Update semantics incl. the clip
    # are checked tightly in test_fused_apply_with_clip_matches_optax_chain.
    for a, b in zip(jax.tree_util.tree_leaves(outs["0"][1]),
                    jax.tree_util.tree_leaves(outs["1"][1])):
        np.testing.assert_allclose(a, b, rtol=0, atol=2e-3)


def test_pretrain_step_fused_matches_default(monkeypatch):
    """Three jitted pretrain steps with ECAMP_FUSED_ADAMW=1 (CPU -> jnp
    fused path) match the default optax steps from the same init."""
    from ecamp_tpu.core import config as cfg
    from ecamp_tpu.core.mesh import make_mesh
    from ecamp_tpu.train.pretrain import PretrainTask

    tiny = cfg.PretrainConfig(
        vit=cfg.ViTConfig(img_size=32, patch_size=16, embed_dim=32,
                          depth=2, num_heads=2),
        decoder=cfg.MAEDecoderConfig(embed_dim=16, depth=1, num_heads=2),
        bert=cfg.BertConfig(vocab_size=64, hidden_size=32,
                            num_hidden_layers=2, num_attention_heads=2,
                            intermediate_size=64,
                            max_position_embeddings=8),
        optimizer=cfg.OptimizerConfig(schedule="constant", lr=1e-3),
        data=cfg.DataConfig(img_size=64), mesh=cfg.MeshConfig(data=1),
        sr_window=1, max_caption_length=8, bf16=False)
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
    for flag in ("0", "1"):
        monkeypatch.setenv("ECAMP_FUSED_ADAMW", flag)
        task = PretrainTask(tiny, mesh=make_mesh(tiny.mesh,
                                                 devices=jax.devices()[:1]))
        if flag == "1":
            assert hasattr(task.tx, "fused_apply")
        state = task.init_state(jax.random.PRNGKey(0))
        sharded = task.shard_batch(batch)
        for _ in range(3):
            state, metrics = task.train_step(state, sharded,
                                             jax.random.PRNGKey(7))
        outs[flag] = (jax.device_get(metrics), jax.device_get(state.params))
    m0, p0 = outs["0"]
    m1, p1 = outs["1"]
    for k in ("mim_loss", "res_loss", "mlm_loss"):
        np.testing.assert_allclose(m0[k], m1[k], rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(a, b, rtol=3e-5, atol=1e-6)
