"""Engine factories: build an InferenceEngine for each served workload
from either a reference `.pth` checkpoint or an orbax directory written by
this framework's fine-tune CLIs (the `best/` dir)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import config as cfg
from ..core.dtypes import policy
from .engine import InferenceEngine, sigmoid_np, softmax_np


def _load_params(variables, checkpoint: str, importer, has_batch_stats=False):
    """Resolve params (and batch_stats) from a .pth file via `importer` or
    from an orbax directory saved by the fine-tune CLIs."""
    if checkpoint and checkpoint.endswith(".pth"):
        variables, _, _ = importer(variables, checkpoint)
        return variables
    if checkpoint:
        from ..ckpt import latest_step, restore_checkpoint

        step = latest_step(checkpoint)
        template = {"params": variables["params"]}
        if has_batch_stats and "batch_stats" in variables:
            template["batch_stats"] = variables["batch_stats"]
        restored = restore_checkpoint(checkpoint, step, template=template)
        variables = dict(variables, **restored)
    return variables


def _maybe_quantize(apply_fn, params, quantize: str):
    """quantize='int8': per-output-channel weight-only int8 (see
    serve/quantize.py) — params become {'weights', 'scales'} and apply_fn
    dequantizes in-trace (fused into the consuming dots)."""
    if not quantize:
        return apply_fn, params
    if quantize != "int8":
        raise ValueError(f"unknown quantize mode {quantize!r}")
    from .quantize import quantize_params_int8, wrap_apply_fn

    return wrap_apply_fn(apply_fn), quantize_params_int8(params)


def classifier_engine(checkpoint: str = "", num_classes: int = 14,
                      img_size: int = 224, multilabel: bool = True,
                      vit: Optional[cfg.ViTConfig] = None,
                      buckets=(8, 32, 64), mesh=None,
                      bf16: bool = True,
                      quantize: str = "") -> InferenceEngine:
    """Serve ViTClassifier logits -> probabilities (sigmoid for multilabel
    BCE tasks, softmax for single-label CE tasks — Classification/
    train.py:199-202 semantics)."""
    from ..ckpt import import_vit_classifier
    from ..nn import ViTClassifier

    vcfg = vit or cfg.ViTConfig(img_size=img_size)
    model = ViTClassifier(vcfg, num_classes,
                          dtype=policy(bf16).compute_dtype)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, img_size, img_size, 3)))
    variables = _load_params(variables, checkpoint, import_vit_classifier)

    def apply_fn(params, x):
        # fp32 on device before the host copy: bf16 logits would leave the
        # served probabilities with only ~2-3 significant digits
        return model.apply({"params": params}, x).astype(jnp.float32)

    post = sigmoid_np if multilabel else softmax_np
    apply_fn, params = _maybe_quantize(apply_fn, variables["params"],
                                       quantize)
    return InferenceEngine(apply_fn, params, mesh=mesh,
                           buckets=buckets, postprocess=post,
                           input_dtype=policy(bf16).compute_dtype)


def segmenter_engine(checkpoint: str = "", img_size: int = 224,
                     dual: bool = False, vit: Optional[cfg.ViTConfig] = None,
                     buckets=(8, 32), mesh=None,
                     bf16: bool = True,
                     quantize: str = "") -> InferenceEngine:
    """Serve SegViT sigmoid masks (B, H, W, 1); dual=True serves the RIGA
    disc/cup pair stacked on the channel axis."""
    from ..ckpt import import_seg_vit
    from ..nn import SegViT, SegViTDual

    vcfg = vit or cfg.ViTConfig(img_size=img_size)
    model_cls = SegViTDual if dual else SegViT
    model = model_cls(vcfg, dtype=policy(bf16).compute_dtype)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, img_size, img_size, 3)),
                           train=False)

    def importer(v, p):
        # .pth fine-tuned checkpoints carry the full SegViT tree
        return import_seg_vit(v, p, from_pretrain=False)

    variables = _load_params(variables, checkpoint, importer,
                             has_batch_stats=True)

    def apply_fn(variables_, x):
        out = model.apply(variables_, x, train=False)
        if dual:
            out = jnp.concatenate(out, axis=-1)
        return jax.nn.sigmoid(out.astype(jnp.float32))

    v = {"params": variables["params"]}
    if "batch_stats" in variables:
        v["batch_stats"] = variables["batch_stats"]
    apply_fn, v = _maybe_quantize(apply_fn, v, quantize)
    return InferenceEngine(apply_fn, v, mesh=mesh, buckets=buckets,
                           input_dtype=policy(bf16).compute_dtype)


def detector_engine(checkpoint: str = "", img_size: int = 224,
                    num_classes: int = 1, expansion: int = 4,
                    conf_threshold: float = 0.5, nms_threshold: float = 0.5,
                    buckets=(8, 16), mesh=None,
                    bf16: bool = True,
                    quantize: str = "") -> InferenceEngine:
    """Serve YOLOv3 detections: on-device decode of all 3 scales to
    (B, N, 5+C) candidates, host-side NMS in postprocess. Returns a list
    (len B) of (k_i, 7) arrays [x1 y1 x2 y2 conf cls_conf cls] or None —
    the reference's NMS output contract (detection_utils.py:76-135)."""
    from ..ckpt import import_detector
    from ..nn import DetectionModel
    from ..nn.det import YOLO_ANCHORS
    from ..ops.boxes import decode_yolo, nms

    vcfg = cfg.ViTConfig(img_size=img_size)
    model = DetectionModel(vcfg, num_classes=num_classes,
                           expansion=expansion,
                           dtype=policy(bf16).compute_dtype)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, img_size, img_size, 3)),
                           train=False)

    def importer(v, p):
        return import_detector(v, p, from_pretrain=False)

    variables = _load_params(variables, checkpoint, importer,
                             has_batch_stats=True)

    def apply_fn(variables_, x):
        outs = model.apply(variables_, x, train=False)
        decoded = [decode_yolo(o, YOLO_ANCHORS[i], img_size, num_classes)
                   for i, o in enumerate(outs)]
        return jnp.concatenate(decoded, axis=1)

    def post(preds):
        return nms(np.asarray(preds), num_classes,
                   conf_thres=conf_threshold, nms_thres=nms_threshold)

    v = {"params": variables["params"]}
    if "batch_stats" in variables:
        v["batch_stats"] = variables["batch_stats"]
    apply_fn, v = _maybe_quantize(apply_fn, v, quantize)
    return InferenceEngine(apply_fn, v, mesh=mesh, buckets=buckets,
                           postprocess=post,
                           input_dtype=policy(bf16).compute_dtype)


def embedding_engine(checkpoint: str = "", img_size: int = 224,
                     buckets=(8, 32), mesh=None,
                     bf16: bool = True,
                     quantize: str = "") -> InferenceEngine:
    """Serve L2-normalized ECAMP image embeddings (the GAP of the encoder
    latents that feeds the report decoder, model_ecamp.py:267-273) — the
    natural retrieval/indexing feature of the pretrained model."""
    from ..ckpt import import_ecamp_pretrain
    from ..nn import ECAMP

    model = ECAMP(vit=cfg.ViTConfig(img_size=img_size),
                  decoder=cfg.MAEDecoderConfig(), bert=cfg.BertConfig(),
                  dtype=policy(bf16).compute_dtype)
    batch = {
        "image": jnp.zeros((2, img_size, img_size, 3)),
        "ids": jnp.zeros((2, 4), jnp.int32),
        "column": jnp.zeros((2,), jnp.int32),
        "row": jnp.zeros((2,), jnp.int32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
        batch, mask_ratio=0.0, deterministic=True)
    variables = _load_params(variables, checkpoint, import_ecamp_pretrain)

    def apply_fn(params, x):
        out = model.apply({"params": params}, {"image": x}, mask_ratio=0.0,
                          deterministic=True, features_only=True)
        feat = out["gap_feature"].astype(jnp.float32)
        return feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)

    apply_fn, params = _maybe_quantize(apply_fn, variables["params"],
                                       quantize)
    return InferenceEngine(apply_fn, params, mesh=mesh,
                           buckets=buckets,
                           input_dtype=policy(bf16).compute_dtype)
