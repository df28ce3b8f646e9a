"""Export checkpoints back to the reference PyTorch `.pth` format.

The inverse of the importers: take an orbax checkpoint written by this
framework's CLIs (or a fresh init) and write a `.pth` the reference
codebase loads directly — pretrain checkpoints in the
{'model': state, 'epoch': N} layout (util/misc.py:295-312), fine-tuned
heads as flat state dicts (Classification/train.py:84-95). Torch-free.

  python -m ecamp_tpu.cli.export --task pretrain \
      --checkpoint out/ckpt --output ECAMP_ViT_Base_16.pth
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp


def get_args():
    p = argparse.ArgumentParser("ecamp_tpu export")
    p.add_argument("--task", required=True,
                   choices=["pretrain", "classification", "segmentation",
                            "detection"])
    p.add_argument("--checkpoint", required=True,
                   help="orbax checkpoint directory")
    p.add_argument("--output", required=True, help="target .pth path")
    p.add_argument("--num_classes", type=int, default=14)
    p.add_argument("--img_size", type=int, default=224)
    p.add_argument("--expansion", type=int, default=4)
    p.add_argument("--epoch", type=int, default=None)
    p.add_argument("--model", default="base",
                   help="ViT trunk size (tiny|base|base_singlechannel|"
                        "large|huge) — must match the checkpoint")
    return p.parse_args()


_VIT_FACTORY = {"tiny": "vit_tiny", "base": "vit_base",
                "base_singlechannel": "vit_base_singlechannel",
                "large": "vit_large", "huge": "vit_huge"}


def _template(args):
    from ..core import config as cfg
    from ..nn import ECAMP, DetectionModel, SegViT, ViTClassifier

    vit_factory = getattr(cfg, _VIT_FACTORY[args.model])
    key = jax.random.PRNGKey(0)
    if args.task == "pretrain":
        model = ECAMP(vit=vit_factory(), decoder=cfg.MAEDecoderConfig(),
                      bert=cfg.BertConfig())
        batch = {"image": jnp.zeros((1, 448, 448, 3)),
                 "ids": jnp.zeros((1, 4), jnp.int32),
                 "labels": jnp.zeros((1, 4), jnp.int32),
                 "weights": jnp.ones((1, 4), jnp.float32),
                 "column": jnp.zeros((1,), jnp.int32),
                 "row": jnp.zeros((1,), jnp.int32)}
        return model.init({"params": key, "masking": key}, batch,
                          mask_ratio=0.75, deterministic=True)
    vcfg = vit_factory(img_size=args.img_size)
    x = jnp.zeros((1, args.img_size, args.img_size, 3))
    if args.task == "classification":
        return ViTClassifier(vcfg, args.num_classes).init(key, x)
    if args.task == "segmentation":
        return SegViT(vcfg).init(key, x, train=False)
    return DetectionModel(vcfg, num_classes=args.num_classes,
                          expansion=args.expansion).init(key, x, train=False)


def main():
    from ..core.mesh import enable_compilation_cache

    enable_compilation_cache()
    args = get_args()
    from ..ckpt import (export_detector, export_ecamp_pretrain,
                        export_seg_vit, export_vit_classifier, latest_step,
                        restore_checkpoint)

    variables = _template(args)
    step = latest_step(args.checkpoint)
    # template-free restore: checkpoints may carry extra state beyond what
    # export needs (pretrain saves {params, opt_state, step}) and orbax
    # StandardRestore rejects partial templates — read the raw tree and
    # take only the weight collections
    restored = restore_checkpoint(args.checkpoint, step)
    variables = dict(variables,
                     **{k: restored[k] for k in ("params", "batch_stats")
                        if k in restored})

    if args.task == "pretrain":
        export_ecamp_pretrain(variables, args.output, epoch=args.epoch)
    elif args.task == "classification":
        export_vit_classifier(variables, args.output)
    elif args.task == "segmentation":
        export_seg_vit(variables, args.output)
    else:
        export_detector(variables, args.output)
    print(f"exported {args.task} weights to {args.output}")


if __name__ == "__main__":
    main()
