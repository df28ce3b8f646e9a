"""Classification fine-tune / linear-probe task.

Reference: Classification/train.py — SGD(m=0.9) + Warmup{Cosine,Linear},
BCE-with-logits for multilabel tasks vs CE for single-label
(train.py:118-121,442-447), linear-probe freezes all but `head`
(train.py:156-159). apex O2 fp16 -> bf16 policy.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..core import config as cfglib
from ..core.dtypes import policy
from ..core.mesh import make_mesh, place_finetune_state
from ..nn.vit import ViTClassifier
from ..ops.losses import sigmoid_bce, softmax_cross_entropy
from .eval_metrics import accuracy, multilabel_auc
from .optim import make_optimizer, make_schedule
from .state import TrainState


class ClassificationTask:
    def __init__(self, cfg: cfglib.ClassificationConfig, mesh=None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh)
        pol = policy(cfg.bf16)
        self.model = ViTClassifier(cfg.vit, cfg.num_classes,
                                   global_pool=cfg.global_pool,
                                   head_init_std=cfg.head_init_std,
                                   dtype=pol.compute_dtype)
        self.schedule = make_schedule(cfg.optimizer)
        self._train_step = None
        self._eval_step = None

    def init_state(self, rng: jax.Array, pretrained: str = "") -> TrainState:
        c = self.cfg
        x = jnp.zeros((2, c.vit.img_size, c.vit.img_size, 3))
        variables = self.model.init(rng, x)
        if pretrained:
            from ..ckpt import import_vit_classifier

            variables, _, _ = import_vit_classifier(variables, pretrained)
        freeze_mask = None
        if c.linear_probe:
            flat = jax.tree_util.tree_map_with_path(
                lambda path, _: any(
                    getattr(k, "key", None) == "head" for k in path),
                variables["params"])
            freeze_mask = flat
        self.tx = make_optimizer(
            c.optimizer, freeze_mask=freeze_mask,
            # pallas_call does not partition TP-sharded leaves under GSPMD
            allow_fused=self.mesh.shape[self.mesh.axis_names[1]] == 1)
        state = TrainState.create(variables["params"], self.tx)
        return place_finetune_state(self.mesh, state)

    def _loss(self, params, images, labels, dropout_rng):
        from ..ops.image_ops import device_normalize_image

        images = device_normalize_image(images, self.cfg.data.mean,
                                        self.cfg.data.std)
        logits = self.model.apply({"params": params}, images,
                                  deterministic=False,
                                  stop_trunk_grad=self.cfg.linear_probe,
                                  rngs={"dropout": dropout_rng})
        if self.cfg.is_multilabel:
            loss = sigmoid_bce(logits, labels)
        else:
            loss = jnp.mean(softmax_cross_entropy(logits, labels))
        return loss, logits

    def make_train_step(self):
        def step_fn(state: TrainState, images, labels):
            drng = jax.random.fold_in(jax.random.PRNGKey(self.cfg.seed),
                                      state.step)
            (loss, _), grads = jax.value_and_grad(self._loss, has_aux=True)(
                state.params, images, labels, drng)
            new_state = state.replace(tx=self.tx).apply_gradients(grads)
            # step-based schedules count optimizer UPDATES; state.step
            # counts micro-steps under accumulation
            upd = state.step // max(1, self.cfg.optimizer.accum_steps)
            return new_state, {"loss": loss, "lr": self.schedule(upd)}

        from ..core.mesh import tp_scoped_jit

        return tp_scoped_jit(self.mesh, step_fn, donate_argnums=(0,))

    def train_step(self, state, images, labels):
        if self._train_step is None:
            self._train_step = self.make_train_step()
        return self._train_step(state, images, labels)

    def make_eval_step(self):
        from ..ops.image_ops import device_normalize_image

        def eval_fn(params, images):
            images = device_normalize_image(images, self.cfg.data.mean,
                                            self.cfg.data.std)
            return self.model.apply({"params": params}, images,
                                    deterministic=True)

        from ..core.mesh import tp_scoped_jit

        return tp_scoped_jit(self.mesh, eval_fn)

    def eval_step(self, state, images):
        if self._eval_step is None:
            self._eval_step = self.make_eval_step()
        return self._eval_step(state.params, images)

    # -- host-side metric aggregation (valid()/test() parity) ------------

    def compute_metrics(self, logits: np.ndarray, labels: np.ndarray) -> Dict:
        if self.cfg.is_multilabel:
            probs = 1.0 / (1.0 + np.exp(-np.asarray(logits, np.float64)))
            aucs = multilabel_auc(probs, labels)
            return {"auc": float(np.nanmean(aucs)), "per_class_auc": aucs}
        preds = np.argmax(logits, axis=-1)
        return {"acc": accuracy(preds, labels)}
