"""Classification fine-tune / linear-probe entry point.

Mirrors Classification/run_{ft,lp}.sh + train.py: per-task class counts,
validate every len(train_loader) steps, early-stop patience 20, best-AUC/ACC
checkpointing, final test() with per-class AUROC.
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
from ..data.datasets import ClassificationListDataset
from ..data.loader import DataLoader
from ..data.transforms import EvalTransform, TrainTransform
from ..train.classification import ClassificationTask
from .common import (EarlyStopper, ShardedEval, _train_sharder,
                     add_common_args, eval_state_and_sharder,
                     pad_eval_batch, setup_output, sharded_eval_loader)

# task -> (num_classes, multilabel) (Classification/train.py:37-44,118-121)
TASKS = {
    "ChestX-ray14": (14, True), "CheXpert": (5, True), "RSNA": (1, True),
    "COVIDx": (3, False), "Aptos": (5, False), "SpineXR": (1, True),
    "ODIR5K": (8, True), "MURED": (20, True),
}

CLASS_NAMES = {
    "ChestX-ray14": ["Atelectasis", "Cardiomegaly", "Effusion", "Infiltration",
                     "Mass", "Nodule", "Pneumonia", "Pneumothorax",
                     "Consolidation", "Edema", "Emphysema", "Fibrosis",
                     "Pleural_Thickening", "Hernia"],
    "CheXpert": ["Atelectasis", "Cardiomegaly", "Consolidation", "Edema",
                 "Pleural Effusion"],
    "RSNA": ["Pneumonia"],
    "ODIR5K": ["Normal", "Diabetes", "Glaucoma", "Cataract",
               "Age related Macular Degeneration", "Hypertension",
               "Pathological Myopia", "Other diseases/abnormalities"],
    "MURED": ["DR", "NORMAL", "MH", "ODC", "TSLN", "ARMD", "DN", "MYA",
              "BRVO", "ODP", "CRVO", "CNV", "RS", "ODE", "LS", "CSR", "HTR",
              "ASR", "CRS", "OTHER"],
}


def get_args():
    p = argparse.ArgumentParser("ecamp_tpu finetune classification")
    add_common_args(p)
    p.add_argument("--task", default="ChestX-ray14", choices=sorted(TASKS))
    p.add_argument("--dataset_path", required=True)
    p.add_argument("--list_path", default="",
                   help="dir with <task>/{train,val,test}_list*.txt "
                        "(defaults to dataset_path)")
    p.add_argument("--img_size", type=int, default=224)
    p.add_argument("--model", default="base",
                   choices=sorted(_VIT_FACTORY))
    p.add_argument("--ratio", type=float, default=1.0,
                   help="eval center-crop ratio (Resize(img/ratio)); "
                        "reference default 1 (train.py:574)")
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--warmup_steps", type=int, default=500)
    p.add_argument("--num_steps", type=int, default=3000)
    p.add_argument("--decay_type", default="cosine", choices=["cosine", "linear"])
    p.add_argument("--linear_probe", action="store_true")
    p.add_argument("--drop_path", type=float, default=0.1,
                   help="stochastic depth rate (reference hardcodes 0.1, "
                        "Classification/train.py:127)")
    p.add_argument("--patience", type=int, default=20)
    p.add_argument("--eval_batch_size", type=int, default=128)
    p.add_argument("--max_grad_norm", type=float, default=1.0,
                   help="global grad-norm clip, every step (Classification/train.py:459,555); <=0 disables")
    p.add_argument("--gradient_accumulation_steps", type=int, default=1,
                   help="micro-batch = batch_size//accum; the optimizer "
                        "steps once per accum micro-batches (reference "
                        "train.py semantics)")
    p.add_argument("--stage", default="train", choices=["train", "test"])
    p.add_argument("--u8_pipe", action="store_true",
                   help="ship images host->device as the quantized u8 "
                        "single-channel gray and normalize + broadcast "
                        "on-device (1/12 the f32 bytes; identical "
                        "quantized pixels — tests/test_u8_pipe.py)")
    return p.parse_args()


def evaluate(task: ClassificationTask, state, loader,
             se: ShardedEval = None) -> dict:
    state, sb = eval_state_and_sharder(task, state)
    logits_all, labels_all = [], []
    bs = loader.batch_size
    for batch in loader:
        img, n = pad_eval_batch(batch["image"], bs)
        logits = task.eval_step(state, sb(img))
        logits_all.append(np.asarray(logits, np.float32)[:n])
        labels_all.append(batch["label"])
    logits = np.concatenate(logits_all)
    labels = np.concatenate(labels_all)
    if se is not None:  # multi-host: reassemble the full val set
        logits, labels = se.gather(logits), se.gather(labels)
    if not task.cfg.is_multilabel:
        labels = labels.astype(np.int32).ravel() if labels.ndim == 1 else \
            labels.argmax(-1)
    return task.compute_metrics(logits, labels)


def main():
    from ..core.mesh import enable_compilation_cache, initialize_distributed

    initialize_distributed()  # before any backend query (misc.py:216-248 parity)
    enable_compilation_cache()
    args = get_args()
    setup_output(args.output_dir, args)
    from ..data.assets import resolve_list_root

    list_path = resolve_list_root(args.list_path, args.dataset_path,
                                  "Classification",
                                  f"{args.task}/test_list.txt")
    num_classes, multilabel = TASKS[args.task]

    tt = TrainTransform(args.img_size, 0.4722, 0.3028, seed=args.seed,
                        output_u8=args.u8_pipe)
    et = EvalTransform(args.img_size, 0.4722, 0.3028, crop_ratio=args.ratio,
                       output_u8=args.u8_pipe)

    import dataclasses

    vit_cfg = dataclasses.replace(
        _VIT_FACTORY[args.model](img_size=args.img_size),
        drop_path_rate=args.drop_path)
    ccfg = cfg.ClassificationConfig(
        vit=vit_cfg,
        optimizer=cfg.OptimizerConfig(
            name="sgd", lr=args.lr, weight_decay=args.weight_decay,
            momentum=0.9,
            schedule=("warmup_cosine_step" if args.decay_type == "cosine"
                      else "warmup_linear_step"),
            warmup_steps=args.warmup_steps, total_steps=args.num_steps,
            grad_clip=(args.max_grad_norm if args.max_grad_norm > 0
                       else None),
            accum_steps=args.gradient_accumulation_steps),
        task=args.task, num_classes=num_classes, is_multilabel=multilabel,
        linear_probe=args.linear_probe, patience=args.patience,
        bf16=not args.no_bf16, seed=args.seed)

    task = ClassificationTask(ccfg)
    state = task.init_state(jax.random.PRNGKey(args.seed),
                            pretrained=args.pretrained)
    ckpt_dir = os.path.join(os.path.abspath(args.output_dir), "best")
    jsonl = JsonlLogger(os.path.join(args.output_dir, "log.txt"),
                        enabled=jax.process_index() == 0)

    if args.stage == "train":
        train_ds = ClassificationListDataset(list_path, args.dataset_path,
                                             args.task, "train",
                                             args.data_volume, tt)
        val_ds = ClassificationListDataset(list_path, args.dataset_path,
                                           args.task, "val", args.data_volume,
                                           et)
        # micro-batch = batch // accum (reference train.py:369)
        micro_bs = max(1, args.batch_size
                       // max(1, args.gradient_accumulation_steps))
        train_loader = DataLoader(train_ds, micro_bs, shuffle=True,
                                  seed=args.seed, num_workers=args.num_workers,
                                  process_index=jax.process_index(),
                                  process_count=jax.process_count())
        val_loader, val_se = sharded_eval_loader(val_ds, args.eval_batch_size,
                                                 args.num_workers)
        stopper = EarlyStopper(args.patience, mode="max")
        metric_key = "auc" if multilabel else "acc"
        step = 0
        epoch = 0
        logger = MetricLogger()
        pending = None
        micro = 0
        accum = max(1, args.gradient_accumulation_steps)
        from ..ckpt import save_checkpoint

        place = _train_sharder(task.mesh)

        # preemption-safe mid-run state (core/preemption.py via
        # FinetunePreemption): SIGTERM or ECAMP_PREEMPT_AT_STEP (counted
        # in MICRO steps) saves and exits; same --output_dir resumes
        # micro-step-exact incl. a partial accumulation buffer.
        from .common import FinetunePreemption, skip_micro_batches

        preempt = FinetunePreemption(task, args.output_dir,
                                     len(train_loader), accum=accum)
        state, micro, step, epoch, skip_micro = preempt.resume(state, stopper)

        import time as _time

        while step < args.num_steps and not stopper.should_stop:
            train_loader.set_epoch(epoch)
            batch_iter = skip_micro_batches(iter(train_loader), skip_micro)
            skip_micro = 0
            _t0, _n0 = _time.perf_counter(), micro
            for batch in batch_iter:
                labels = batch["label"]
                if not multilabel:
                    labels = labels.argmax(-1).astype(np.int32)
                state, m = task.train_step(state, place(batch["image"]),
                                           place(labels))
                # one step in flight: sync the PREVIOUS step's
                # metrics after this one is dispatched
                if pending is not None:
                    logger.update(loss=float(pending["loss"]),
                                  lr=float(pending["lr"]))
                pending = m
                micro += 1
                if preempt.maybe_save(state, micro, step, stopper):
                    if pending is not None:
                        logger.update(loss=float(pending["loss"]),
                                      lr=float(pending["lr"]))
                    return
                if micro % accum != 0:
                    continue  # optimizer updates every accum micro-batches
                step += 1
                # validate every epoch-equivalent of OPTIMIZER steps
                # (train.py:427,475; len(train_loader) counts micro-batches)
                if step % max(1, len(train_loader) // accum) == 0:
                    if pending is not None:
                        logger.update(loss=float(pending["loss"]),
                                      lr=float(pending["lr"]))
                        pending = None
                    metrics = evaluate(task, state, val_loader, val_se)
                    val = metrics[metric_key]
                    is_best = stopper.update(val)
                    jsonl.write({"step": step, metric_key: val,
                                 "best": stopper.best,
                                 "loss": logger.meters["loss"].global_avg})
                    print(f"step {step}: val {metric_key}={val:.4f} "
                          f"(best {stopper.best:.4f})")
                    if is_best:
                        save_checkpoint(ckpt_dir, step,
                                        {"params": jax.device_get(state.params)})
                    if stopper.should_stop or step >= args.num_steps:
                        break
            _dt, _dn = _time.perf_counter() - _t0, micro - _n0
            if _dn > 0:  # per-epoch wall timing (pretrain-CLI style line;
                # parsed by tools/ab_u8pipe_finetune.py)
                print(f"Epoch [{epoch}]  Total time: {_dt:.1f}s "
                      f"({_dt / _dn:.4f} s/it)", flush=True)
            epoch += 1
        preempt.finish()

    # test phase: reload best, per-class report (train.py:267-361)
    from ..ckpt import latest_step, restore_checkpoint
    from ..ckpt.orbax_io import wait_for_saves

    # drain any in-flight async best-ckpt save before the test
    # phase scans the directory (same race the burn-in drill
    # caught in the pretrain CLI)
    wait_for_saves(ckpt_dir)
    best = latest_step(ckpt_dir)
    if best is not None:
        restored = restore_checkpoint(ckpt_dir, best,
                                      template={"params": state.params})
        state = state.replace(params=restored["params"])
    test_ds = ClassificationListDataset(list_path, args.dataset_path,
                                        args.task, "test", args.data_volume,
                                        et)
    test_loader, test_se = sharded_eval_loader(test_ds, args.eval_batch_size,
                                               args.num_workers)
    metrics = evaluate(task, state, test_loader, test_se)
    if multilabel:
        names = CLASS_NAMES.get(args.task,
                                [f"class_{i}" for i in range(num_classes)])
        for n, a in zip(names, metrics["per_class_auc"]):
            print(f"  {n}: AUROC {a:.4f}")
        print(f"TEST mean AUROC: {metrics['auc']:.4f}")
    else:
        print(f"TEST accuracy: {metrics['acc']:.4f}")
    jsonl.write({"test": metrics})


if __name__ == "__main__":
    main()
