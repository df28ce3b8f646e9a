"""Detection fine-tune task (RSNA pneumonia, YOLOv3 on ViT).

Reference: Detection/train.py — 3-scale YOLOLoss sum (:445-471), frozen
encoder (:169-174), eval = decode + NMS(conf/nms 0.5) + mAP@[.40:.05:.75]
(:214-250). Loss + target assignment run on device (ops.yolo);
NMS/mAP host-side (tiny N).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import config as cfglib
from ..core.dtypes import policy
from ..core.mesh import make_mesh, place_finetune_state
from ..nn.det import DetectionModel, YOLO_ANCHORS
from ..ops.boxes import average_precision, decode_yolo, nms
from ..ops.yolo import yolo_loss
from .optim import make_optimizer, make_schedule
from .state import TrainState


def _det_freeze_mask(params, freeze_encoder: bool, backbone: str = "vit"):
    """True = trainable. ViT path freezes backbone.encoder.trunk (det_head
    stays trainable, Detection/train.py:169-174); the resnet50 baseline
    freezes the ENTIRE backbone (train.py:126-127 sets requires_grad=False
    on every img_encoder parameter)."""
    if not freeze_encoder:
        return None

    def fn(path, _):
        keys = [getattr(k, "key", "") for k in path]
        if backbone == "resnet50":
            return not (len(keys) >= 1 and keys[0] == "backbone")
        return not (len(keys) >= 3 and keys[0] == "backbone"
                    and keys[1] == "encoder" and keys[2] == "trunk")

    return jax.tree_util.tree_map_with_path(fn, params)


class DetectionTask:
    def __init__(self, cfg: cfglib.DetectionConfig, mesh=None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh)
        pol = policy(cfg.bf16)
        self.model = DetectionModel(cfg.vit, num_classes=cfg.num_classes,
                                    expansion=cfg.expansion,
                                    backbone=cfg.backbone,
                                    dtype=pol.compute_dtype)
        self.schedule = make_schedule(cfg.optimizer)
        self._train_step = None
        self._eval_step = None

    def init_state(self, rng: jax.Array, pretrained: str = "",
                   from_pretrain: bool = True) -> TrainState:
        c = self.cfg
        x = jnp.zeros((2, c.img_size, c.img_size, 3))
        variables = self.model.init(rng, x, train=False)
        if pretrained:
            from ..ckpt import import_detector

            variables, _, _ = import_detector(variables, pretrained,
                                              from_pretrain=from_pretrain,
                                              backbone=c.backbone)
        mask = _det_freeze_mask(variables["params"], c.freeze_encoder,
                                c.backbone)
        self.tx = make_optimizer(
            c.optimizer, freeze_mask=mask,
            # pallas_call does not partition TP-sharded leaves under GSPMD
            allow_fused=self.mesh.shape[self.mesh.axis_names[1]] == 1)
        state = TrainState.create(variables["params"], self.tx,
                                  batch_stats=variables.get("batch_stats"))
        return place_finetune_state(self.mesh, state)

    def _loss(self, params, batch_stats, images, targets, dropout_rng):
        from ..ops.image_ops import device_normalize_image

        # u8 pipe (--u8_pipe): quantized u8 shipped, normalize + channel
        # broadcast on-device; passthrough for the default f32 feeder
        images = device_normalize_image(images, self.cfg.data.mean,
                                        self.cfg.data.std)
        outs, mutated = self.model.apply(
            {"params": params, "batch_stats": batch_stats}, images,
            train=True, mutable=["batch_stats"],
            stop_trunk_grad=self.cfg.freeze_encoder,
            rngs={"dropout": dropout_rng})
        total = 0.0
        parts = {}
        for i, logits in enumerate(outs):
            li, _ = yolo_loss(logits, targets, YOLO_ANCHORS[i],
                                self.cfg.img_size, self.cfg.num_classes)
            total = total + li
            parts[f"scale{i}"] = li
        return total, (mutated["batch_stats"], parts)

    def make_train_step(self):
        def step_fn(state: TrainState, images, targets):
            drng = jax.random.fold_in(jax.random.PRNGKey(self.cfg.seed),
                                      state.step)
            (loss, (new_stats, parts)), grads = jax.value_and_grad(
                self._loss, has_aux=True)(state.params, state.batch_stats,
                                          images, targets, drng)
            new_state = state.replace(tx=self.tx).apply_gradients(
                grads, batch_stats=new_stats)
            upd = state.step // max(1, self.cfg.optimizer.accum_steps)
            metrics = dict(parts, loss=loss, lr=self.schedule(upd))
            return new_state, metrics

        from ..core.mesh import tp_scoped_jit

        return tp_scoped_jit(self.mesh, step_fn, donate_argnums=(0,))

    def train_step(self, state, images, targets):
        if self._train_step is None:
            self._train_step = self.make_train_step()
        return self._train_step(state, images, targets)

    def make_eval_step(self):
        from ..ops.image_ops import device_normalize_image

        def eval_fn(params, batch_stats, images):
            images = device_normalize_image(images, self.cfg.data.mean,
                                            self.cfg.data.std)
            outs = self.model.apply(
                {"params": params, "batch_stats": batch_stats}, images,
                train=False)
            decoded = [decode_yolo(o, YOLO_ANCHORS[i], self.cfg.img_size,
                                   self.cfg.num_classes)
                       for i, o in enumerate(outs)]
            return jnp.concatenate(decoded, axis=1)

        from ..core.mesh import tp_scoped_jit

        return tp_scoped_jit(self.mesh, eval_fn)

    def eval_step(self, state, images) -> np.ndarray:
        if self._eval_step is None:
            self._eval_step = self.make_eval_step()
        return np.asarray(self._eval_step(state.params, state.batch_stats,
                                          images))

    # -- host-side eval ---------------------------------------------------

    def detections(self, predictions: np.ndarray) -> List[Optional[np.ndarray]]:
        return nms(predictions, self.cfg.num_classes,
                   conf_thres=self.cfg.conf_threshold,
                   nms_thres=self.cfg.nms_threshold)

    def compute_map(self, all_dets: List[Optional[np.ndarray]],
                    all_gt_xyxy: List[np.ndarray]) -> float:
        pred_boxes, pred_scores = [], []
        for d in all_dets:
            if d is None or len(d) == 0:
                pred_boxes.append(np.zeros((0, 4)))
                pred_scores.append(np.zeros((0,)))
            else:
                pred_boxes.append(d[:, :4])
                pred_scores.append(d[:, 4])
        return average_precision(pred_boxes, pred_scores, all_gt_xyxy,
                                 self.cfg.map_iou_thresholds)
