"""torchmetrics.detection.MeanAveragePrecision stand-in.

torchmetrics is not installed in this environment, so the reference's
Detection/train.py valid()/test() (train.py:214-215, 224-294) are driven
with this stub, which implements the same single-class COCO-style
101-point mAP over an explicit IoU-threshold grid. The AP math is
`ecamp_tpu.ops.boxes.average_precision` — the SAME implementation our
trainer's eval uses — so the detection parity claim covers the
reference's trainer/losses/NMS/decode, not the metric aggregation
(which is shared by construction and separately parity-tested against
a loop reference in tests/test_yolo_parity.py)."""

from __future__ import annotations

import numpy as np
import torch


class MeanAveragePrecision:
    def __init__(self, iou_thresholds=None, **_ignored):
        self.iou_thresholds = [float(t) for t in
                               (iou_thresholds or
                                [0.5 + 0.05 * i for i in range(10)])]
        self._preds = []    # per-image (boxes xyxy ndarray, scores ndarray)
        self._targets = []  # per-image boxes xyxy ndarray

    def update(self, preds, targets):
        for p in preds:
            self._preds.append((
                np.asarray(p["boxes"].detach().cpu(), dtype=np.float64),
                np.asarray(p["scores"].detach().cpu(), dtype=np.float64)))
        for t in targets:
            self._targets.append(
                np.asarray(t["boxes"].detach().cpu(), dtype=np.float64))

    def compute(self):
        from ecamp_tpu.ops.boxes import average_precision

        if not self._targets:
            # torchmetrics convention: -1 when nothing was accumulated
            return {"map": torch.tensor(-1.0)}
        n = max(len(self._preds), len(self._targets))
        pb = [self._preds[i][0] if i < len(self._preds)
              else np.zeros((0, 4)) for i in range(n)]
        ps = [self._preds[i][1] if i < len(self._preds)
              else np.zeros((0,)) for i in range(n)]
        gt = [self._targets[i] if i < len(self._targets)
              else np.zeros((0, 4)) for i in range(n)]
        return {"map": torch.tensor(
            average_precision(pb, ps, gt, self.iou_thresholds))}
