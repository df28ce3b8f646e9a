"""Detection fine-tune entry point (RSNA pneumonia).

Mirrors Detection/run.sh + train.py: 3-scale YOLO loss, expansion 8 for
1/10% volume else 4 (:136), eval = decode + NMS + mAP@[.40:.05:.75],
patience 20, best-mAP checkpointing.
"""

from __future__ import annotations

import argparse
import ast
import os

import jax
import numpy as np

from ..core import config as cfg

_VIT_FACTORY = {"tiny": cfg.vit_tiny, "base": cfg.vit_base,
                "base_singlechannel": cfg.vit_base_singlechannel,
                "large": cfg.vit_large, "huge": cfg.vit_huge}
from ..core.metrics import JsonlLogger, MetricLogger
from ..data.datasets import (ObjectCXRDetectionDataset,
                             RSNADetectionDataset)
from ..data.loader import DataLoader
from ..train.detection import DetectionTask
from .common import (EarlyStopper, ShardedEval, _train_sharder,
                     add_common_args, eval_state_and_sharder,
                     pad_eval_batch, setup_output, sharded_eval_loader)


def get_args():
    p = argparse.ArgumentParser("ecamp_tpu finetune detection")
    add_common_args(p)
    p.add_argument("--task", default="RSNA",
                   choices=["RSNA", "ObjectCXR"])  # train.py:532
    p.add_argument("--dataset_path", required=True)
    p.add_argument("--list_path", default="")
    p.add_argument("--img_size", type=int, default=224)
    p.add_argument("--model", default="base",
                   choices=sorted(_VIT_FACTORY) + ["resnet50"],
                   help="ViT variant, or 'resnet50' for the ResNetDetector "
                        "baseline path (Detection/train.py:99-131)")
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--weight_decay", type=float, default=1e-6)
    p.add_argument("--warmup_steps", type=int, default=50)
    p.add_argument("--num_steps", type=int, default=3000)
    p.add_argument("--patience", type=int, default=20)
    p.add_argument("--eval_batch_size", type=int, default=64)
    p.add_argument("--conf_threshold", type=float, default=0.5)
    p.add_argument("--max_grad_norm", type=float, default=1.0,
                   help="global grad-norm clip, every step (Detection/train.py:483,559); <=0 disables")
    p.add_argument("--gradient_accumulation_steps", type=int, default=1,
                   help="micro-batch = batch_size//accum; the optimizer "
                        "steps once per accum micro-batches (reference "
                        "train.py semantics)")
    p.add_argument("--nms_threshold", type=float, default=0.5)
    p.add_argument("--start_eval", type=int, default=1,
                   help="skip eval before this epoch (train.py --start_eval)")
    p.add_argument("--stage", default="train", choices=["train", "test"])
    p.add_argument("--u8_pipe", action="store_true",
                   help="ship images host->device as quantized u8 1-ch "
                        "gray and normalize + broadcast on-device — 1/12 "
                        "the f32 bytes; quantizes the interpolated pixels "
                        "to the nearest gray level (<=0.5/255 "
                        "pre-normalize, tests/test_u8_pipe_finetune.py)")
    return p.parse_args()


def _gt_xyxy(targets: np.ndarray, img_size: int):
    """(B, T, 5) normalized cxcywh -> list of (n, 4) xyxy pixel arrays
    (Detection/train.py:252-261)."""
    out = []
    for rows in targets:
        valid = rows[rows.sum(-1) > 0]
        if len(valid) == 0:
            out.append(np.zeros((0, 4), np.float32))
            continue
        cx, cy, w, h = (valid[:, 1] * img_size, valid[:, 2] * img_size,
                        valid[:, 3] * img_size, valid[:, 4] * img_size)
        out.append(np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                            axis=1))
    return out


def evaluate(task: DetectionTask, state, loader, img_size: int,
             se: ShardedEval = None) -> float:
    state, sb = eval_state_and_sharder(task, state)
    all_dets, all_gts = [], []
    bs = loader.batch_size
    for batch in loader:
        img, n = pad_eval_batch(batch["image"], bs)
        preds = task.eval_step(state, sb(img))
        all_dets.extend(task.detections(preds[:n]))
        all_gts.extend(_gt_xyxy(batch["target"], img_size))
    if se is not None:  # multi-host: reassemble the full val set
        all_dets = se.gather_ragged(all_dets, cols=5)
        all_gts = [g if g is not None else np.zeros((0, 4), np.float32)
                   for g in se.gather_ragged(all_gts, cols=4)]
    return task.compute_map(all_dets, all_gts)


def main():
    from ..core.mesh import enable_compilation_cache, initialize_distributed

    initialize_distributed()  # before any backend query (misc.py:216-248 parity)
    enable_compilation_cache()
    args = get_args()
    setup_output(args.output_dir, args)
    from ..data.assets import resolve_list_root

    list_path = resolve_list_root(args.list_path, args.dataset_path,
                                  "Detection", f"{args.task}/test_list.csv")
    expansion = 8 if args.data_volume in ("1", "10") else 4  # train.py:136

    is_resnet = args.model == "resnet50"
    vit_factory = _VIT_FACTORY["base" if is_resnet else args.model]
    dcfg = cfg.DetectionConfig(
        backbone="resnet50" if is_resnet else "vit",
        vit=vit_factory(img_size=args.img_size),
        optimizer=cfg.OptimizerConfig(
            name="adamw", lr=args.lr, weight_decay=args.weight_decay,
            betas=(0.9, 0.999), schedule="warmup_cosine_step",
            warmup_steps=args.warmup_steps, total_steps=args.num_steps,
            grad_clip=(args.max_grad_norm if args.max_grad_norm > 0
                       else None),
            accum_steps=args.gradient_accumulation_steps),
        img_size=args.img_size, expansion=expansion,
        conf_threshold=args.conf_threshold, nms_threshold=args.nms_threshold,
        patience=args.patience, bf16=not args.no_bf16, seed=args.seed)

    task = DetectionTask(dcfg)
    state = task.init_state(jax.random.PRNGKey(args.seed),
                            pretrained=args.pretrained)
    ckpt_dir = os.path.join(os.path.abspath(args.output_dir), "best")
    jsonl = JsonlLogger(os.path.join(args.output_dir, "log.txt"),
                        enabled=jax.process_index() == 0)

    def make_ds(split):
        cls = (ObjectCXRDetectionDataset if args.task == "ObjectCXR"
               else RSNADetectionDataset)
        return cls(list_path, args.dataset_path, split,
                   img_size=args.img_size, data_volume=args.data_volume,
                   output_u8=args.u8_pipe)

    if args.stage == "train":
        # micro-batch = batch // accum (reference train.py semantics)
        micro_bs = max(1, args.batch_size
                       // max(1, args.gradient_accumulation_steps))
        train_loader = DataLoader(make_ds("train"), micro_bs,
                                  process_index=jax.process_index(),
                                  process_count=jax.process_count(),
                                  shuffle=True, seed=args.seed,
                                  num_workers=args.num_workers)
        val_loader, val_se = sharded_eval_loader(
            make_ds("val"), args.eval_batch_size, args.num_workers)
        stopper = EarlyStopper(args.patience, mode="max")
        from ..ckpt import save_checkpoint

        place = _train_sharder(task.mesh)

        step, epoch = 0, 0
        if args.resume:
            # step-indexed re-entry (Detection/train.py:176-182,411-416):
            # reload the best checkpoint and fast-forward the step counter;
            # the LR schedule picks up at the restored step automatically.
            from ..ckpt import latest_step, restore_checkpoint

            best_step = latest_step(args.resume)
            if best_step is not None:
                restored = restore_checkpoint(
                    args.resume, best_step,
                    template={"params": state.params,
                              "batch_stats": state.batch_stats})
                import jax.numpy as jnp

                accum_ = max(1, args.gradient_accumulation_steps)
                state = state.replace(
                    params=restored["params"],
                    batch_stats=restored["batch_stats"],
                    # state.step counts micro-steps; the checkpoint index
                    # counts optimizer updates
                    step=jnp.asarray(best_step * accum_, jnp.int32))
                step = int(best_step)
                epoch = step // max(1, len(train_loader) // accum_)
                print(f"resumed from step {step}")
        logger = MetricLogger()
        pending = None
        accum = max(1, args.gradient_accumulation_steps)
        # preemption-safe mid-run state (SIGTERM / ECAMP_PREEMPT_AT_STEP,
        # counted in MICRO steps): see FinetunePreemption. A preemption
        # checkpoint, if present, supersedes the --resume fast-forward.
        from .common import FinetunePreemption, skip_micro_batches

        preempt = FinetunePreemption(task, args.output_dir,
                                     len(train_loader), accum=accum)
        state, micro, step, epoch, skip_micro = preempt.resume(
            state, stopper, micro=step * accum, step=step, epoch=epoch)
        while step < args.num_steps and not stopper.should_stop:
            train_loader.set_epoch(epoch)
            batch_iter = skip_micro_batches(iter(train_loader), skip_micro)
            skip_micro = 0
            for batch in batch_iter:
                state, m = task.train_step(state, place(batch["image"]),
                                           place(batch["target"]))
                # one step in flight: sync the PREVIOUS step's
                # metrics after this one is dispatched
                if pending is not None:
                    logger.update(loss=float(pending["loss"]),
                                  lr=float(pending["lr"]))
                pending = m
                micro += 1
                if preempt.maybe_save(state, micro, step, stopper):
                    return
                if micro % accum != 0:
                    continue  # optimizer updates every accum micro-batches
                step += 1
                if step % max(1, len(train_loader) // accum) == 0:
                    if pending is not None:
                        logger.update(loss=float(pending["loss"]),
                                      lr=float(pending["lr"]))
                        pending = None
                    if epoch + 1 >= args.start_eval:
                        ap = evaluate(task, state, val_loader, args.img_size,
                                      val_se)
                        is_best = stopper.update(ap)
                        jsonl.write({"step": step, "mAP": ap,
                                     "best": stopper.best})
                        print(f"step {step}: val mAP={ap:.4f} "
                              f"(best {stopper.best:.4f})")
                        if is_best:
                            save_checkpoint(
                                ckpt_dir, step,
                                {"params": jax.device_get(state.params),
                                 "batch_stats": jax.device_get(
                                     state.batch_stats)})
                    if stopper.should_stop or step >= args.num_steps:
                        break
            epoch += 1
        preempt.finish()

    from ..ckpt import latest_step, restore_checkpoint
    from ..ckpt.orbax_io import wait_for_saves

    # drain any in-flight async best-ckpt save before the test
    # phase scans the directory (same race the burn-in drill
    # caught in the pretrain CLI)
    wait_for_saves(ckpt_dir)
    best = latest_step(ckpt_dir)
    if best is not None:
        restored = restore_checkpoint(
            ckpt_dir, best, template={"params": state.params,
                                      "batch_stats": state.batch_stats})
        state = state.replace(params=restored["params"],
                              batch_stats=restored["batch_stats"])
    test_loader, test_se = sharded_eval_loader(
        make_ds("test"), args.eval_batch_size, args.num_workers)
    ap = evaluate(task, state, test_loader, args.img_size, test_se)
    print(f"TEST mAP@[.40:.05:.75]: {ap:.4f}")
    jsonl.write({"test_map": ap})


if __name__ == "__main__":
    main()
