"""Pre-training task: jitted 3-loss train step, data-parallel over the mesh.

Replaces the reference hot loop (main_pretrain.py:116-180 + DDP): one jit
compiles resize→encoder→decoder→SR→BERT→losses→grads→AdamW update; the
batch arrives sharded over the 'data' mesh axis and XLA emits the gradient
all-reduce over ICI (no DDP wrapper, no GradScaler — bf16 params policy).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..core import config as cfglib
from ..core.dtypes import policy
from ..core.mesh import make_mesh, replicated_sharding
from ..nn.mae import ECAMP
from .optim import make_optimizer, make_schedule
from .state import TrainState


def device_normalize(batch: Dict, mean: float, std: float) -> Dict:
    """On-device normalize for the u8 image pipe (--u8_pipe): the feeder
    ships the quantized single-channel gray as uint8 (1/6 the bytes of
    the normalized bf16 3-channel tensor it replaces over the host->device
    link — the measured bottleneck on tunneled accelerators, DESIGN.md
    "host RSS leak"), and the first traced op reproduces the host path
    bit-for-bit: (u8/255 - mean) / std in f32 (data/transforms.py::
    normalize), broadcast to the 3 identical channels Grayscale(3)
    produced on the host (reference pretrain_datasets.py:47-52). No-op
    for non-u8 batches, so one jitted step serves both pipes."""
    img = batch.get("image")
    if img is None or img.dtype != jnp.uint8:
        return batch
    from ..ops.image_ops import device_normalize_image

    return dict(batch, image=device_normalize_image(img, mean, std))


class PretrainTask:
    def __init__(self, cfg: cfglib.PretrainConfig, mesh=None,
                 steps_per_epoch: int = 1):
        if cfg.data.img_size != cfg.vit.img_size * cfg.sr_scale:
            # the SR branch reconstructs the full-resolution input from
            # the encoder-resolution view (reference run.sh: 448 -> 224
            # with sr_scale=2); any other pairing fails deep in the SR
            # loss with an opaque broadcast error
            raise ValueError(
                f"PretrainConfig: data.img_size ({cfg.data.img_size}) "
                f"must equal vit.img_size * sr_scale "
                f"({cfg.vit.img_size} * {cfg.sr_scale} = "
                f"{cfg.vit.img_size * cfg.sr_scale}); pass --input_size "
                f"matching the model, or a ViTConfig sized input/sr_scale")
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh)
        self.steps_per_epoch = steps_per_epoch
        pol = policy(cfg.bf16)
        self.model = ECAMP(vit=cfg.vit, decoder=cfg.decoder, bert=cfg.bert,
                           sr_window=cfg.sr_window, sr_scale=cfg.sr_scale,
                           dtype=pol.compute_dtype)
        self.schedule = make_schedule(cfg.optimizer, steps_per_epoch,
                                      max_epoch=cfg.max_epoch)
        self.tx = make_optimizer(
            cfg.optimizer, steps_per_epoch=steps_per_epoch,
            max_epoch=cfg.max_epoch,
            # a pallas_call does not partition shard-local under GSPMD:
            # under TP / FSDP (sharded params) keep optax; under ZeRO-1
            # the fused update instead runs inside a shard_map region that
            # mirrors shard_opt_state_zero1's layout (kernels/fused_adamw)
            allow_fused=(self.mesh.shape[self.mesh.axis_names[1]] == 1
                         and not cfg.mesh.shard_params),
            zero1_mesh=(self.mesh if (cfg.mesh.shard_optimizer
                                      and not cfg.mesh.shard_params)
                        else None))
        if (cfg.mesh.shard_params
                and self.mesh.shape[self.mesh.axis_names[1]] > 1):
            raise ValueError("shard_params (FSDP) and a model axis > 1 "
                             "(TP) cannot be combined")
        self._train_step = None

    # -- state ---------------------------------------------------------

    def fake_batch(self, batch_size: int):
        c = self.cfg
        L = c.max_caption_length
        s = c.data.img_size
        return {
            "image": jnp.zeros((batch_size, s, s, 3), jnp.float32),
            "ids": jnp.zeros((batch_size, L), jnp.int32),
            "labels": jnp.zeros((batch_size, L), jnp.int32),
            "attention_mask": jnp.ones((batch_size, L), jnp.int32),
            "type_ids": jnp.zeros((batch_size, L), jnp.int32),
            "weights": jnp.ones((batch_size, L), jnp.float32),
            "column": jnp.ones((batch_size,), jnp.int32),
            "row": jnp.ones((batch_size,), jnp.int32),
        }

    def init_state(self, rng: jax.Array, pretrained: str = "") -> TrainState:
        batch = self.fake_batch(2)
        variables = self.model.init(
            {"params": rng, "masking": jax.random.fold_in(rng, 1)},
            batch, mask_ratio=self.cfg.mask_ratio, deterministic=True)
        if pretrained:
            from ..ckpt import import_ecamp_pretrain

            variables, loaded, _ = import_ecamp_pretrain(variables, pretrained)
        params = variables["params"]
        return self.place_state(TrainState.create(params, self.tx))

    def place_state(self, state: TrainState,
                    reinit_opt: bool = True) -> TrainState:
        """Lay the train state out on the mesh: params replicated (or TP
        over the model axis), optimizer state replicated or ZeRO-1-sharded
        over the data axis (cfg.mesh.shard_optimizer). Also used to re-place
        a state restored from checkpoint (reinit_opt=False keeps the
        restored moments)."""
        if self.mesh.shape.get(self.mesh.axis_names[1], 1) > 1:
            # tensor-parallel layout over the model axis (optax state
            # inherits the param shardings through tx.init). Replicate
            # everything first so non-param leaves (step, restored opt
            # moments) are device-placed too — ZeRO-1's sharding snapshot
            # in make_train_step reads .sharding off every leaf.
            from ..core.mesh import shard_params_tp

            state = jax.device_put(state, replicated_sharding(self.mesh))
            params = shard_params_tp(self.mesh, state.params)
            state = state.replace(params=params)
            if reinit_opt:
                state = state.replace(opt_state=self.tx.init(params))
        else:
            state = jax.device_put(state, replicated_sharding(self.mesh))
        if self.cfg.mesh.shard_params:
            # FSDP / ZeRO-3: params sharded over 'data' like the moments
            from ..core.mesh import shard_params_fsdp

            params = shard_params_fsdp(self.mesh, state.params)
            state = state.replace(params=params)
            if reinit_opt:
                state = state.replace(opt_state=self.tx.init(params))
        if self.cfg.mesh.shard_optimizer or self.cfg.mesh.shard_params:
            from ..core.mesh import shard_opt_state_zero1

            state = state.replace(
                opt_state=shard_opt_state_zero1(self.mesh, state.opt_state))
        return state

    # -- step ----------------------------------------------------------

    def _loss_fn(self, params, batch, rng) -> Tuple[jnp.ndarray, Dict]:
        # dropout uses the XLA hardware RNG (rbg): threefry bit generation
        # for the ~20 dropout sites costs ~25 ms/step at B=64 on v5e
        # (measured); rbg is effectively free. Masking keeps threefry for
        # reproducible token selection.
        seed = jax.random.randint(jax.random.fold_in(rng, 1), (), 0,
                                  jnp.iinfo(jnp.int32).max)
        dropout_key = jax.random.key(seed, impl="unsafe_rbg")
        out = self.model.apply(
            {"params": params}, batch, mask_ratio=self.cfg.mask_ratio,
            deterministic=False,
            rngs={"masking": rng, "dropout": dropout_key})
        loss = out["mim_loss"] + out["res_loss"] + out["mlm_loss"]
        return loss, {"mim_loss": out["mim_loss"], "res_loss": out["res_loss"],
                      "mlm_loss": out["mlm_loss"]}

    def _out_constraint(self, state):
        # Pin the output state to the input layout: under ZeRO-1 the
        # moments come in sharded over 'data' and must leave the same way
        # (GSPMD then computes moment updates shard-local and all-gathers
        # only the param updates); without the constraint propagation may
        # flip layouts between steps and re-shuffle the state every call.
        if state is not None and (self.cfg.mesh.shard_optimizer
                                  or self.cfg.mesh.shard_params):
            return jax.tree_util.tree_map(lambda x: x.sharding, state)
        return None

    def _step_body(self, state: TrainState, batch, rng, out_constraint):
        batch = device_normalize(batch, self.cfg.data.mean,
                                 self.cfg.data.std)
        rng = jax.random.fold_in(rng, state.step)
        (loss, aux), grads = jax.value_and_grad(
            self._loss_fn, has_aux=True)(state.params, batch, rng)
        new_state = state.replace(tx=self.tx).apply_gradients(grads)
        if out_constraint is not None:
            new_state = jax.lax.with_sharding_constraint(
                new_state, out_constraint)
        # log the lr the optimizer actually APPLIES: under grad
        # accumulation the update covering this micro-step uses the
        # schedule value at its cycle-start micro-step (reference
        # main_pretrain.py:136-138 adjusts lr when iter % accum == 0)
        accum = max(1, self.cfg.optimizer.accum_steps)
        applied = (state.step // accum) * accum
        aux = dict(aux, loss=loss, lr=self.schedule(applied))
        return new_state, aux

    def make_train_step(self, state: TrainState = None):
        oc = self._out_constraint(state)

        def step_fn(state: TrainState, batch, rng):
            return self._step_body(state, batch, rng, oc)

        from ..core.mesh import tp_scoped_jit

        return tp_scoped_jit(self.mesh, step_fn,
                             batch_only=self.cfg.mesh.shard_params,
                             donate_argnums=(0,))

    def make_train_step_scan(self, state: TrainState = None):
        """K optimizer steps per dispatch via lax.scan over a (K, B, ...)
        superbatch — bitwise-identical to K sequential train_step calls
        with the same base rng (each iteration folds in its own
        state.step), but pays host->device dispatch once per K steps.
        Metrics come back stacked (K,) per key. The production lever for
        dispatch-latency-dominated links (remote/tunneled accelerators);
        --steps_per_call in the pretrain CLI."""
        from ..core.mesh import tp_scoped_jit

        oc = self._out_constraint(state)

        def scan_fn(state: TrainState, batches, rng):
            def body(st, batch):
                return self._step_body(st, batch, rng, oc)

            return jax.lax.scan(body, state, batches)

        return tp_scoped_jit(self.mesh, scan_fn,
                             batch_only=self.cfg.mesh.shard_params,
                             donate_argnums=(0,))

    def train_step(self, state, batch, rng):
        if self._train_step is None:
            self._train_step = self.make_train_step(state)
        return self._train_step(state, batch, rng)

    def shard_batch(self, batch):
        from ..core.mesh import shard_batch

        return shard_batch(self.mesh, batch)

    def shard_superbatch(self, batches):
        """Stack K host batches into one (K, B, ...) superbatch for
        make_train_step_scan, sharded over 'data' on the BATCH axis
        (axis 1); the scan axis is unsharded."""
        import numpy as np

        from ..core.mesh import shard_superbatch

        stacked = {k: np.stack([b[k] for b in batches])
                   for k in batches[0]}
        return shard_superbatch(self.mesh, stacked)
