"""Segmentation fine-tune entry point (SIIM / RSNA / RIGA).

Mirrors Segmentation/run.sh + train.py / train_RIGA.py: AdamW +
warmup-cosine, MixedLoss, dice eval per epoch-equivalent, patience 40,
best-dice checkpointing, final test.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from ..core import config as cfg

_VIT_FACTORY = {"tiny": cfg.vit_tiny, "base": cfg.vit_base,
                "base_singlechannel": cfg.vit_base_singlechannel,
                "large": cfg.vit_large, "huge": cfg.vit_huge}
from ..core.metrics import JsonlLogger, MetricLogger
from ..data.datasets import (RIGASegmentationDataset, RSNASegmentationDataset,
                             SIIMSegmentationDataset)
from ..data.loader import DataLoader
from ..train.segmentation import SegmentationTask
from .common import (EarlyStopper, ShardedEval, _train_sharder,
                     add_common_args, eval_state_and_sharder,
                     pad_eval_batch, setup_output, sharded_eval_loader)

DATASETS = {"SIIM": SIIMSegmentationDataset, "RSNA": RSNASegmentationDataset,
            "RIGA": RIGASegmentationDataset}


def get_args():
    p = argparse.ArgumentParser("ecamp_tpu finetune segmentation")
    add_common_args(p)
    p.add_argument("--task", default="SIIM", choices=sorted(DATASETS))
    p.add_argument("--dataset_path", required=True)
    p.add_argument("--list_path", default="")
    p.add_argument("--img_size", type=int, default=224)
    p.add_argument("--model", default="base",
                   choices=sorted(_VIT_FACTORY) + ["resnet50"],
                   help="ViT variant, or 'resnet50' for the UNet baseline "
                        "path (Segmentation/train.py:139-180)")
    p.add_argument("--decode_features", default="512,256,128,64",
                   help="conv-decoder channel widths (reference SegViT "
                        "decode_features, models_vit.py:70-106)")
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--warmup_steps", type=int, default=50)
    p.add_argument("--num_steps", type=int, default=3000)
    p.add_argument("--patience", type=int, default=40)
    p.add_argument("--eval_batch_size", type=int, default=64)
    p.add_argument("--max_grad_norm", type=float, default=1.0,
                   help="global grad-norm clip, every step (Segmentation/train.py:388,465); <=0 disables")
    p.add_argument("--gradient_accumulation_steps", type=int, default=1,
                   help="micro-batch = batch_size//accum; the optimizer "
                        "steps once per accum micro-batches (reference "
                        "train.py semantics)")
    p.add_argument("--no_freeze_encoder", action="store_true")
    p.add_argument("--name", default="ecamp",
                   choices=["ecamp", "gloria", "random"],
                   help="pretrained-checkpoint convention for RIGA baselines (train_RIGA.py:110-138); random skips loading")
    p.add_argument("--stage", default="train", choices=["train", "test"])
    p.add_argument("--u8_pipe", action="store_true",
                   help="ship images host->device as quantized u8 (1-ch "
                        "gray for SIIM/RSNA, 3-ch for RIGA) and normalize "
                        "+ broadcast on-device — 1/12 (1/4 RIGA) the f32 "
                        "bytes; quantizes the interpolated pixels to the "
                        "nearest gray level (<=0.5/255 pre-normalize, "
                        "tests/test_u8_pipe_finetune.py)")
    return p.parse_args()


def evaluate(task: SegmentationTask, state, loader,
             se: ShardedEval = None) -> float:
    state, sb = eval_state_and_sharder(task, state)
    dices = []
    bs = loader.batch_size
    for batch in loader:
        img, n = pad_eval_batch(batch["image"], bs)
        probs = task.eval_step(state, sb(img))
        probs = tuple(p[:n] for p in probs) if task.dual else probs[:n]
        if task.dual:
            disc, cup = probs
            d1 = task.compute_dice(np.asarray(disc)[..., 0],
                                   batch["mask"][..., 0])
            d2 = task.compute_dice(np.asarray(cup)[..., 0],
                                   batch["mask"][..., 1])
            dices.append((d1 + d2) / 2.0)  # train_RIGA.py:264-327
        else:
            dices.append(task.compute_dice(np.asarray(probs)[..., 0],
                                           batch["mask"][..., 0]))
    per_sample = np.concatenate(dices)
    if se is not None:  # multi-host: reassemble the full val set
        per_sample = se.gather(per_sample)
    return float(per_sample.mean())


def main():
    from ..core.mesh import enable_compilation_cache, initialize_distributed

    initialize_distributed()  # before any backend query (misc.py:216-248 parity)
    enable_compilation_cache()
    args = get_args()
    setup_output(args.output_dir, args)
    from ..data.assets import resolve_list_root

    list_path = resolve_list_root(args.list_path, args.dataset_path,
                                  "Segmentation",
                                  f"{args.task}/test_list.csv")
    ds_cls = DATASETS[args.task]

    is_resnet = args.model == "resnet50"
    vit_factory = _VIT_FACTORY["base" if is_resnet else args.model]
    scfg = cfg.SegmentationConfig(
        backbone="resnet50" if is_resnet else "vit",
        vit=vit_factory(img_size=args.img_size),
        decode_features=tuple(int(x) for x
                              in args.decode_features.split(",")),
        optimizer=cfg.OptimizerConfig(
            name="adamw", lr=args.lr, weight_decay=args.weight_decay,
            betas=(0.9, 0.999), schedule="warmup_cosine_step",
            warmup_steps=args.warmup_steps, total_steps=args.num_steps,
            grad_clip=(args.max_grad_norm if args.max_grad_norm > 0
                       else None),
            accum_steps=args.gradient_accumulation_steps),
        task=args.task, freeze_encoder=not args.no_freeze_encoder,
        patience=args.patience, bf16=not args.no_bf16, seed=args.seed,
        data=cfg.DataConfig(img_size=args.img_size, mean=0.4722, std=0.3028))

    task = SegmentationTask(scfg)
    state = task.init_state(jax.random.PRNGKey(args.seed),
                            pretrained=args.pretrained,
                            flavor=args.name)
    ckpt_dir = os.path.join(os.path.abspath(args.output_dir), "best")
    jsonl = JsonlLogger(os.path.join(args.output_dir, "log.txt"),
                        enabled=jax.process_index() == 0)

    def make_ds(split):
        return ds_cls(list_path, args.dataset_path, split,
                      img_size=args.img_size, data_volume=args.data_volume,
                      seed=args.seed, output_u8=args.u8_pipe)

    if args.stage == "train":
        # micro-batch = batch // accum (reference train.py:308)
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

        logger = MetricLogger()
        pending = None
        accum = max(1, args.gradient_accumulation_steps)
        # preemption-safe mid-run state (SIGTERM / ECAMP_PREEMPT_AT_STEP,
        # counted in MICRO steps): see FinetunePreemption
        from .common import FinetunePreemption, skip_micro_batches

        preempt = FinetunePreemption(task, args.output_dir,
                                     len(train_loader), accum=accum)
        state, micro, step, epoch, skip_micro = preempt.resume(state, stopper)
        while step < args.num_steps and not stopper.should_stop:
            train_loader.set_epoch(epoch)
            batch_iter = skip_micro_batches(iter(train_loader), skip_micro)
            skip_micro = 0
            for batch in batch_iter:
                state, m = task.train_step(state, place(batch["image"]),
                                           place(batch["mask"]))
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
                    dice = evaluate(task, state, val_loader, val_se)
                    is_best = stopper.update(dice)
                    jsonl.write({"step": step, "dice": dice,
                                 "best": stopper.best})
                    print(f"step {step}: val dice={dice:.4f} "
                          f"(best {stopper.best:.4f})")
                    if is_best:
                        save_checkpoint(
                            ckpt_dir, step,
                            {"params": jax.device_get(state.params),
                             "batch_stats": jax.device_get(state.batch_stats)})
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
    dice = evaluate(task, state, test_loader, test_se)
    print(f"TEST dice: {dice:.4f}")
    jsonl.write({"test_dice": dice})


if __name__ == "__main__":
    main()
