"""YOLOv3 loss with fully vectorized target assignment.

Reference semantics: Detection/utils/yolo_loss.py:41-194. The reference
builds targets with a per-(batch, box) Python double loop on host tensors
every step (:136-194 — SURVEY §7.4 hard-part #4); here assignment is a
batched scatter that lives inside the jitted train step.

Collision semantics: when two gt boxes land on the same (anchor, cell), the
reference's sequential loop lets the later box overwrite; the scatter picks
one winner (duplicate-index .set). RSNA pneumonia has <= 10 well-separated
boxes per image, so this does not measurably change training.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

# torch.nn.BCELoss clamps each log term at -100
_LOG_CLAMP = -100.0


def _bce(p: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    # clip keeps p in the normal fp32 range (a denormal epsilon gets
    # flushed to zero on some backends -> log(0) grad = inf * 0 = NaN) and
    # zeroes the gradient at the clamp, mirroring torch BCELoss's -100
    # log clamp.
    p = jnp.clip(p.astype(jnp.float32), 1e-12, 1.0 - 1e-7)
    t = t.astype(jnp.float32)
    logp = jnp.maximum(jnp.log(p), _LOG_CLAMP)
    log1mp = jnp.maximum(jnp.log1p(-p), _LOG_CLAMP)
    return jnp.mean(-(t * logp + (1.0 - t) * log1mp))


def build_targets(targets: jnp.ndarray, anchors: jnp.ndarray, grid: int,
                  num_classes: int, ignore_threshold: float = 0.5):
    """Vectorized YOLO target assignment.

    targets: (B, T, 5) rows [cls, cx, cy, w, h] normalized; all-zero rows
    are padding (yolo_loss.py:158). anchors: (A, 2) in grid units.
    Returns dict of (B, A, G, G) maps (+ tcls with trailing C).
    """
    b, t, _ = targets.shape
    a = anchors.shape[0]
    g = grid

    valid = jnp.sum(targets, axis=-1) > 0  # (B, T)
    gx = targets[..., 1] * g
    gy = targets[..., 2] * g
    gw = targets[..., 3] * g
    gh = targets[..., 4] * g
    gi = jnp.clip(gx.astype(jnp.int32), 0, g - 1)
    gj = jnp.clip(gy.astype(jnp.int32), 0, g - 1)

    # anchor IoU with the reference's +1 convention on centered boxes
    # (bbox_iou with x1y1x2y2=False on (0,0,w,h) pairs, yolo_loss.py:169-175)
    aw = anchors[:, 0][None, None, :]
    ah = anchors[:, 1][None, None, :]
    inter = (jnp.minimum(gw[..., None], aw) + 1.0) * \
            (jnp.minimum(gh[..., None], ah) + 1.0)
    union = (gw[..., None] + 1.0) * (gh[..., None] + 1.0) + \
            (aw + 1.0) * (ah + 1.0) - inter
    anch_iou = inter / (union + 1e-16)  # (B, T, A)
    best_n = jnp.argmax(anch_iou, axis=-1)  # (B, T)

    # route padding rows to a trash row (g) that gets sliced off
    trash_j = jnp.where(valid, gj, g)
    batch_idx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, t))

    def scatter(value, init, reduce="set"):
        buf = jnp.full((b, a, g + 1, g), init, dtype=jnp.float32)
        ref = buf.at[batch_idx, best_n, trash_j, gi]
        if reduce == "set":
            buf = ref.set(value)
        elif reduce == "max":
            buf = ref.max(value)
        elif reduce == "min":
            buf = ref.min(value)
        return buf[:, :, :g, :]

    best_aw = jnp.take(anchors[:, 0], best_n)
    best_ah = jnp.take(anchors[:, 1], best_n)
    one = jnp.where(valid, 1.0, 0.0)
    mask = scatter(one, 0.0, "max")
    tx = scatter(jnp.where(valid, gx - gi, 0.0), 0.0)
    ty = scatter(jnp.where(valid, gy - gj, 0.0), 0.0)
    tw = scatter(jnp.where(valid, jnp.log(gw / best_aw + 1e-16), 0.0), 0.0)
    th = scatter(jnp.where(valid, jnp.log(gh / best_ah + 1e-16), 0.0), 0.0)
    tconf = mask

    # noobj: zero every anchor whose IoU with the gt exceeds the threshold
    # at the gt cell (yolo_loss.py:177)
    ignore = (anch_iou > ignore_threshold) & valid[..., None]  # (B, T, A)
    noobj = jnp.ones((b, a, g + 1, g), dtype=jnp.float32)
    bi = jnp.broadcast_to(jnp.arange(b)[:, None, None], (b, t, a))
    ai = jnp.broadcast_to(jnp.arange(a)[None, None, :], (b, t, a))
    ji = jnp.broadcast_to(trash_j[..., None], (b, t, a))
    ii = jnp.broadcast_to(gi[..., None], (b, t, a))
    ji = jnp.where(ignore, ji, g)  # non-ignored entries go to trash
    noobj = noobj.at[bi, ai, ji, ii].min(0.0)[:, :, :g, :]
    # the best anchor cell is also no-obj=0 implicitly via ignore>thresh in
    # the reference (best anchor IoU is always > threshold for its own gt in
    # practice); keep explicit parity by zeroing assigned cells too
    noobj = jnp.minimum(noobj, 1.0 - mask)

    cls_ids = jnp.clip(targets[..., 0].astype(jnp.int32), 0, num_classes - 1)
    tcls_onehot = jax.nn.one_hot(cls_ids, num_classes)  # (B, T, C)
    tcls = jnp.zeros((b, a, g + 1, g, num_classes), dtype=jnp.float32)
    tcls = tcls.at[batch_idx, best_n, trash_j, gi].set(
        tcls_onehot * one[..., None])[:, :, :g, :, :]

    return dict(mask=mask, noobj_mask=noobj, tx=tx, ty=ty, tw=tw, th=th,
                tconf=tconf, tcls=tcls)


def yolo_loss(logits: jnp.ndarray, targets: jnp.ndarray,
              anchors: Sequence[Tuple[float, float]], img_size: int,
              num_classes: int = 1, ignore_threshold: float = 0.5,
              lambda_xy: float = 2.5, lambda_wh: float = 2.5,
              lambda_conf: float = 1.0, lambda_cls: float = 1.0):
    """One-scale YOLO loss (yolo_loss.py:59-104). logits: (B, A*(5+C), G, G)."""
    b, ch, h, w = logits.shape
    a = len(anchors)
    c = ch // a - 5
    stride = img_size / h
    scaled = jnp.asarray(anchors, dtype=jnp.float32) / stride

    pred = logits.reshape(b, a, 5 + c, h, w).transpose(0, 1, 3, 4, 2)
    pred = pred.astype(jnp.float32)
    x = jax.nn.sigmoid(pred[..., 0])
    y = jax.nn.sigmoid(pred[..., 1])
    pw = pred[..., 2]
    ph = pred[..., 3]
    conf = jax.nn.sigmoid(pred[..., 4])
    pcls = jax.nn.sigmoid(pred[..., 5:])

    tt = build_targets(targets, scaled, h, c, ignore_threshold)
    m, noobj = tt["mask"], tt["noobj_mask"]
    loss_x = _bce(x * m, tt["tx"] * m)
    loss_y = _bce(y * m, tt["ty"] * m)
    loss_w = jnp.mean(jnp.square(pw * m - tt["tw"] * m))
    loss_h = jnp.mean(jnp.square(ph * m - tt["th"] * m))
    loss_conf = _bce(conf * m, m) + 0.5 * _bce(conf * noobj, jnp.zeros_like(noobj))
    loss_cls = _bce(pcls * m[..., None], tt["tcls"] * m[..., None])
    total = (loss_x + loss_y) * lambda_xy + (loss_w + loss_h) * lambda_wh + \
        loss_conf * lambda_conf + loss_cls * lambda_cls
    return total, dict(x=loss_x, y=loss_y, w=loss_w, h=loss_h,
                       conf=loss_conf, cls=loss_cls)
