"""Optimizers + LR schedules (optax).

Replaces: AdamW β=(0.9,0.95) with timm add_weight_decay param grouping
(main_pretrain.py:253-254), SGD momentum 0.9 (Classification/train.py:
377-384), per-iteration epoch-cosine warmup (util/lr_sched.py:9-21) and
the step-based Warmup{Cosine,Linear}Schedule (utils/scheduler.py:8-41),
grad accumulation (main_pretrain.py:137-153) via optax.MultiSteps.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..core.config import OptimizerConfig


def _decay_mask(params) -> bool:
    """timm optim_factory.add_weight_decay: no decay for 1-d params
    (biases, norm scales) — True = apply weight decay."""
    return jax.tree_util.tree_map(lambda p: p.ndim > 1, params)


def epoch_cosine_schedule(base_lr: float, min_lr: float, warmup_epochs: float,
                          max_epoch: float, steps_per_epoch: int
                          ) -> optax.Schedule:
    """Per-iteration warmup + half-cosine over fractional epochs
    (util/lr_sched.py:9-21, driven per-iter at main_pretrain.py:138)."""

    def fn(step):
        epoch = step / max(steps_per_epoch, 1)
        warm = base_lr * epoch / max(warmup_epochs, 1e-8)
        progress = (epoch - warmup_epochs) / max(max_epoch - warmup_epochs, 1e-8)
        cos = min_lr + (base_lr - min_lr) * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        return jnp.where(epoch < warmup_epochs, warm, cos)

    return fn


def warmup_cosine_step_schedule(base_lr: float, warmup_steps: int,
                                total_steps: int, cycles: float = 0.5
                                ) -> optax.Schedule:
    """WarmupCosineSchedule (utils/scheduler.py:24-41)."""

    def fn(step):
        step = step.astype(jnp.float32) if hasattr(step, "astype") else float(step)
        warm = step / max(1.0, warmup_steps)
        progress = (step - warmup_steps) / max(1.0, total_steps - warmup_steps)
        cos = jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * cycles * 2.0 * progress)))
        return base_lr * jnp.where(step < warmup_steps, warm, cos)

    return fn


def warmup_linear_step_schedule(base_lr: float, warmup_steps: int,
                                total_steps: int) -> optax.Schedule:
    """WarmupLinearSchedule (utils/scheduler.py:8-21)."""

    def fn(step):
        step = step.astype(jnp.float32) if hasattr(step, "astype") else float(step)
        warm = step / max(1.0, warmup_steps)
        lin = jnp.maximum(0.0, (total_steps - step) /
                          max(1.0, total_steps - warmup_steps))
        return base_lr * jnp.where(step < warmup_steps, warm, lin)

    return fn


def make_schedule(cfg: OptimizerConfig, steps_per_epoch: int = 1,
                  max_epoch: Optional[float] = None) -> optax.Schedule:
    if cfg.schedule == "warmup_cosine_epoch":
        return epoch_cosine_schedule(cfg.lr, cfg.min_lr, cfg.warmup_epochs,
                                     max_epoch if max_epoch is not None else 1.0,
                                     steps_per_epoch)
    if cfg.schedule == "warmup_cosine_step":
        return warmup_cosine_step_schedule(cfg.lr, cfg.warmup_steps,
                                           cfg.total_steps)
    if cfg.schedule == "warmup_linear_step":
        return warmup_linear_step_schedule(cfg.lr, cfg.warmup_steps,
                                           cfg.total_steps)
    if cfg.schedule == "constant":
        return lambda step: cfg.lr
    raise ValueError(f"unknown schedule {cfg.schedule}")


def layerwise_lr_scales(params, decay: float, num_layers: int):
    """BEiT-style layer-wise lr decay scales (reference util/lr_decay.py:
    15-75, defined-but-unused there; offered as a first-class option here).

    Returns a pytree of float scales: embeddings/cls/pos at layer 0,
    blocks_i at i+1, heads at num_layers+1; scale = decay^(L+1-layer_id).
    """
    import re

    def layer_id(path) -> int:
        keys = [str(getattr(k, "key", k)) for k in path]
        for k in keys:
            m = re.fullmatch(r"blocks_(\d+)", k)
            if m:
                return int(m.group(1)) + 1
        if any(k in ("patch_embed", "cls_token", "pos_embed") for k in keys):
            return 0
        return num_layers + 1

    return jax.tree_util.tree_map_with_path(
        lambda path, _: decay ** (num_layers + 1 - layer_id(path)), params)


def scale_by_layerwise_lr(scales) -> optax.GradientTransformation:
    """Multiply updates by per-leaf lr scales (apply after the optimizer)."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return (jax.tree_util.tree_map(lambda u, s: u * s, updates, scales),
                state)

    return optax.GradientTransformation(init_fn, update_fn)


def _fused_adamw_enabled(cfg: OptimizerConfig) -> bool:
    import os

    env = os.environ.get("ECAMP_FUSED_ADAMW")
    if env is not None:
        val = env.strip().lower()
        if val in ("1", "true", "yes", "on"):
            return True
        if val in ("0", "false", "no", "off", ""):
            return False
        raise ValueError(f"ECAMP_FUSED_ADAMW={env!r}: expected 0/1")
    return cfg.fused_adamw


def make_optimizer(cfg: OptimizerConfig, params=None,
                   steps_per_epoch: int = 1,
                   max_epoch: Optional[float] = None,
                   freeze_mask=None,
                   lr_scales=None,
                   allow_fused: bool = True,
                   zero1_mesh=None) -> optax.GradientTransformation:
    """Build the optax chain. freeze_mask: pytree of bool, True = trainable
    (linear-probe / frozen-encoder modes; reference freezes via
    requires_grad_(False): Classification/train.py:156-159,
    Segmentation/train.py:128-133). lr_scales: optional per-leaf lr
    multipliers (layerwise_lr_scales)."""
    sched = make_schedule(cfg, steps_per_epoch, max_epoch)
    if cfg.accum_steps > 1 and cfg.schedule == "warmup_cosine_epoch":
        # Under MultiSteps the inner schedule advances once per optimizer
        # UPDATE, but the reference keys this schedule to fractional *data*
        # epochs, i.e. micro-steps / len(loader) (main_pretrain.py:136-138:
        # adjust_learning_rate(data_iter_step / len(data_loader) + epoch) at
        # each accumulation-cycle start). Rescale so inner update u applies
        # the LR of its cycle-start micro-step u*accum. Step-based schedules
        # are NOT rescaled: the reference steps those once per optimizer
        # update (Classification/train.py:463 scheduler.step() inside the
        # accumulation gate).
        inner = sched
        accum = cfg.accum_steps
        sched = lambda u: inner(u * accum)
    if cfg.name == "adamw":
        if (allow_fused and _fused_adamw_enabled(cfg)
                and lr_scales is None
                and freeze_mask is None and cfg.accum_steps <= 1):
            # Single fused HBM pass per leaf; identical state layout
            # (incl. the clip_by_global_norm chain element when grad_clip
            # is set), so orbax/torch-moment restore and every
            # (init, update) caller are unaffected (kernels/fused_adamw.py).
            from ..kernels.fused_adamw import fused_adamw

            return fused_adamw(sched, b1=cfg.betas[0], b2=cfg.betas[1],
                               eps=1e-8, weight_decay=cfg.weight_decay,
                               mask_fn=_decay_mask,
                               grad_clip=cfg.grad_clip or None,
                               zero1_mesh=zero1_mesh)
        tx = optax.adamw(sched, b1=cfg.betas[0], b2=cfg.betas[1],
                         weight_decay=cfg.weight_decay,
                         mask=_decay_mask if cfg.weight_decay > 0 else None)
    elif cfg.name == "sgd":
        chain = [optax.sgd(sched, momentum=cfg.momentum)]
        if cfg.weight_decay > 0:
            chain.insert(0, optax.add_decayed_weights(cfg.weight_decay,
                                                      mask=_decay_mask))
        tx = optax.chain(*chain)
    else:
        raise ValueError(f"unknown optimizer {cfg.name}")

    pre = []
    if cfg.grad_clip:
        pre.append(optax.clip_by_global_norm(cfg.grad_clip))
    post = []
    if lr_scales is not None:
        post.append(scale_by_layerwise_lr(lr_scales))
    tx = optax.chain(*pre, tx, *post)

    if freeze_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree_util.tree_map(
                lambda t: "train" if t else "freeze", freeze_mask))

    if cfg.accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accum_steps)
    return tx
