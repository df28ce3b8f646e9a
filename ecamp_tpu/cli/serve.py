"""Inference entry point: HTTP serving or offline batch prediction.

The reference has no inference path outside its training scripts; this CLI
serves any of the four workloads from a checkpoint (.pth or orbax best/):

  # HTTP server (stdlib, JSON/base64)
  python -m ecamp_tpu.cli.serve --task classification --num_classes 14 \
      --checkpoint best/ --port 8000

  # offline batch: folder or list file -> JSONL of predictions
  python -m ecamp_tpu.cli.serve --task classification --num_classes 14 \
      --checkpoint best/ --images /data/imgs --output preds.jsonl
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def get_args():
    p = argparse.ArgumentParser("ecamp_tpu serve/infer")
    p.add_argument("--task", required=True,
                   choices=["classification", "segmentation", "detection",
                            "embedding"])
    p.add_argument("--checkpoint", default="",
                   help=".pth file or orbax checkpoint dir")
    p.add_argument("--num_classes", type=int, default=14)
    p.add_argument("--multilabel", action="store_true", default=True)
    p.add_argument("--singlelabel", dest="multilabel", action="store_false")
    p.add_argument("--dual", action="store_true",
                   help="RIGA dual-decoder segmentation")
    p.add_argument("--expansion", type=int, default=4)
    p.add_argument("--img_size", type=int, default=224)
    p.add_argument("--mean", type=float, default=0.4722)
    p.add_argument("--std", type=float, default=0.3028)
    p.add_argument("--buckets", type=int, nargs="+", default=None)
    p.add_argument("--quantize", default="", choices=["", "int8"],
                   help="int8: weight-only per-output-channel "
                        "quantization (halves weight HBM reads — the "
                        "small-batch latency bound; serve/quantize.py)")
    p.add_argument("--class_names", nargs="+", default=None)
    # serve mode
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    # batch mode
    p.add_argument("--images", default="",
                   help="dir of images or a text file of paths; presence "
                        "selects batch mode")
    p.add_argument("--output", default="predictions.jsonl")
    p.add_argument("--batch_size", type=int, default=32)
    return p.parse_args()


def build_engine(args):
    from ..serve import (classifier_engine, detector_engine,
                         embedding_engine, segmenter_engine)

    kw = {"checkpoint": args.checkpoint, "img_size": args.img_size,
          "quantize": args.quantize}
    if args.buckets:
        kw["buckets"] = tuple(args.buckets)
    if args.task == "classification":
        return classifier_engine(num_classes=args.num_classes,
                                 multilabel=args.multilabel, **kw)
    if args.task == "segmentation":
        return segmenter_engine(dual=args.dual, **kw)
    if args.task == "detection":
        return detector_engine(num_classes=args.num_classes,
                               expansion=args.expansion, **kw)
    return embedding_engine(**kw)


def iter_paths(spec: str):
    if os.path.isdir(spec):
        exts = (".jpg", ".jpeg", ".png", ".bmp")
        for name in sorted(os.listdir(spec)):
            if name.lower().endswith(exts):
                yield os.path.join(spec, name)
    else:
        with open(spec) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                # path-per-line files may contain spaces; reference-style
                # list files append label columns — prefer the full line
                # when it exists on disk, else the first token
                yield line if os.path.exists(line) else line.split()[0]


def batch_predict(args, engine):
    from PIL import Image

    from ..data.transforms import EvalTransform
    from ..serve.http_server import _jsonable, _summarize_mask

    et = EvalTransform(args.img_size, args.mean, args.std)
    paths = list(iter_paths(args.images))
    with open(args.output, "w") as out:
        for i in range(0, len(paths), args.batch_size):
            chunk = paths[i:i + args.batch_size]
            xs = np.stack([et(Image.open(p).convert("RGB")) for p in chunk])
            preds = engine(xs)
            rows = preds if isinstance(preds, list) else list(preds)
            for path, pred in zip(chunk, rows):
                if args.task == "segmentation":
                    rec = _summarize_mask(np.asarray(pred))
                elif args.task == "detection":
                    rec = {"boxes": _jsonable(pred)}
                elif args.task == "classification":
                    rec = {"probs": _jsonable(pred)}
                    if args.class_names:
                        rec["labels"] = {n: float(v) for n, v in
                                         zip(args.class_names, pred)}
                else:
                    rec = {"embedding": _jsonable(pred)}
                out.write(json.dumps({"path": path, **rec}) + "\n")
    print(f"wrote {len(paths)} predictions to {args.output}")
    print(json.dumps(engine.stats()))


def main():
    from ..core.mesh import enable_compilation_cache, initialize_distributed

    initialize_distributed()
    enable_compilation_cache()
    args = get_args()
    engine = build_engine(args)
    if args.images:
        return batch_predict(args, engine)
    # compile every bucket before accepting traffic — a cold first request
    # would otherwise stall multiple minutes on remote-TPU compiles
    print(f"warming {len(engine.buckets)} buckets ...")
    engine.warmup(np.zeros((1, args.img_size, args.img_size, 3), np.float32))
    from ..serve.http_server import PredictionService, serve

    service = PredictionService(engine, args.task, img_size=args.img_size,
                                mean=args.mean, std=args.std,
                                class_names=args.class_names)
    serve(service, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
