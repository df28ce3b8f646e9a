"""Pre-training entry point.

Mirrors ECAMP/Pre-training/run.sh + main_pretrain.py: e.g.

python -m ecamp_tpu.cli.pretrain \
  --data_path /data/mimic --batch_size 256 --accum_iter 8 \
  --epochs 120 --max_epoch 200 --warmup_epochs 40 \
  --blr-none --lr 1.5e-4 --weight_decay 0.05 --mask_ratio 0.75 \
  --resume /ckpts/mae_vit_base.pth --output_dir ./out
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from ..core import config as cfg
from ..core.metrics import JsonlLogger, MetricLogger
from ..data.datasets import PretrainReportDataset
from ..data.loader import DataLoader
from ..train.pretrain import PretrainTask
from .common import add_common_args, pretrain_ckpt_epochs, setup_output


def get_args():
    p = argparse.ArgumentParser("ecamp_tpu pretrain")
    add_common_args(p)
    p.add_argument("--data_path", required=True,
                   help="dir with mimic CSVs + mimic_wordpiece.json")
    p.add_argument("--epochs", type=int, default=120)
    p.add_argument("--max_epoch", type=int, default=200)
    p.add_argument("--warmup_epochs", type=float, default=40)
    p.add_argument("--lr", type=float, default=1.5e-4)
    p.add_argument("--min_lr", type=float, default=0.0)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--mask_ratio", type=float, default=0.75)
    p.add_argument("--accum_iter", type=int, default=1)
    p.add_argument("--input_size", type=int, default=448)
    p.add_argument("--max_caption_length", type=int, default=256)
    p.add_argument("--norm_pix_loss", action="store_true",
                   help="parsed for parity; unused on the loss path, "
                        "exactly like the reference (model_ecamp.py:100)")
    p.add_argument("--print_freq", type=int, default=20)
    p.add_argument("--resume_optimizer", action="store_true",
                   help="force optimizer-moment restore from a .pth resume "
                        "even when the filename does not look like a "
                        "reference ECAMP checkpoint")
    p.add_argument("--exact_attn_dropout", action="store_true",
                   help="HF-exact attention dropout on the BERT prob "
                        "tensor (XLA path) instead of the default "
                        "same-rate output dropout (fused kernel); see "
                        "DESIGN.md for the measured A/B")
    p.add_argument("--steps_per_call", type=int, default=1,
                   help="optimizer steps per device dispatch (lax.scan "
                        "over a stacked superbatch) — identical numerics, "
                        "host dispatch paid once per K steps; useful when "
                        "dispatch latency is high (remote accelerators). "
                        "Logging granularity becomes K steps.")
    p.add_argument("--shard_optimizer", action="store_true",
                   help="ZeRO-1: shard AdamW moments (and accumulation "
                        "buffers) over the data mesh axis instead of "
                        "replicating them (~1.5 GB/N HBM saved per chip)")
    p.add_argument("--fsdp", action="store_true",
                   help="FSDP/ZeRO-3: additionally shard the params over "
                        "the data mesh axis; GSPMD all-gathers weights at "
                        "their use sites and reduce-scatters grads — "
                        "per-chip params+grads+moments memory becomes 1/N")
    p.add_argument("--rss_limit_gb", type=float, default=0.0,
                   help="host-RSS watchdog: when this process's RSS "
                        "crosses the limit, checkpoint at the exact step "
                        "and exit cleanly (resumable) instead of risking "
                        "an OOM SIGKILL; 0 disables. Also settable as "
                        "ECAMP_RSS_LIMIT_GB for all CLIs.")
    p.add_argument("--u8_pipe", action="store_true",
                   help="ship images host->device as the quantized u8 "
                        "single-channel gray and normalize + broadcast "
                        "to 3 channels on-device: 1/6 the transfer bytes "
                        "of the default bf16 pipe (1/12 of --no_bf16); "
                        "identical quantized pixels, losses equal to "
                        "~1 ulp (tests/test_u8_pipe.py)")
    return p.parse_args()


def main():
    from ..core.mesh import enable_compilation_cache, initialize_distributed

    initialize_distributed()  # before any backend query (misc.py:216-248 parity)
    enable_compilation_cache()
    args = get_args()
    setup_output(args.output_dir, args)

    if args.u8_pipe:
        image_dtype = np.uint8
    elif args.no_bf16:
        image_dtype = np.float32
    else:
        import ml_dtypes

        # halve H2D bytes; bit-identical (model casts to bf16 first anyway)
        image_dtype = ml_dtypes.bfloat16
    dataset = PretrainReportDataset(args.data_path, img_size=args.input_size,
                                    max_caption_length=args.max_caption_length,
                                    seed=args.seed, image_dtype=image_dtype)
    loader = DataLoader(dataset, batch_size=args.batch_size, shuffle=True,
                        seed=args.seed, num_workers=args.num_workers,
                        process_index=jax.process_index(),
                        process_count=jax.process_count())
    steps_per_epoch = max(1, len(loader))

    pconf = cfg.PretrainConfig(
        bert=cfg.BertConfig(exact_attn_dropout=args.exact_attn_dropout),
        optimizer=cfg.OptimizerConfig(
            name="adamw", lr=args.lr, min_lr=args.min_lr,
            weight_decay=args.weight_decay, betas=(0.9, 0.95),
            schedule="warmup_cosine_epoch", warmup_epochs=args.warmup_epochs,
            accum_steps=args.accum_iter),
        data=cfg.DataConfig(img_size=args.input_size,
                            batch_size=args.batch_size),
        mesh=cfg.MeshConfig(shard_optimizer=args.shard_optimizer,
                            shard_params=args.fsdp),
        mask_ratio=args.mask_ratio, epochs=args.epochs,
        max_epoch=args.max_epoch, bf16=not args.no_bf16, seed=args.seed,
        max_caption_length=args.max_caption_length)

    task = PretrainTask(pconf, steps_per_epoch=steps_per_epoch)
    rng = jax.random.PRNGKey(args.seed)
    resume_pth = args.resume.endswith(".pth") if args.resume else False
    # a .pth resume replaces the init import entirely — don't pay the full
    # init + --pretrained import twice
    state = task.init_state(
        rng, pretrained=args.resume if resume_pth else args.pretrained)

    start_epoch = 0
    skip_batches = 0
    ckpt_dir = os.path.join(os.path.abspath(args.output_dir), "ckpt")
    if args.resume:
        if resume_pth:
            # The reference restores optimizer + epoch when resuming its
            # OWN checkpoints (path starts './ECAMP', util/misc.py:331-338)
            # and leaves the optimizer cold for MAE-init. Mirror the gate
            # on the filename (reference saves 'checkpoint-<epoch>.pth',
            # misc.py:295-312), overridable with --resume_optimizer.
            base = os.path.basename(args.resume)
            if args.resume_optimizer or base.startswith(("ECAMP",
                                                         "checkpoint")):
                from ..ckpt.torch_import import (import_ecamp_adamw_state,
                                                 load_pth)

                ckpt = load_pth(args.resume)
                if isinstance(ckpt, dict) and "optimizer" in ckpt:
                    new_opt, n, tstep = import_ecamp_adamw_state(
                        state.opt_state, state.params, ckpt)
                    state = task.place_state(
                        state.replace(opt_state=new_opt), reinit_opt=False)
                    print(f"restored AdamW moments for {n} params "
                          f"(torch step {tstep})")
                    if "epoch" in ckpt:
                        start_epoch = int(ckpt["epoch"]) + 1
                        state = state.replace(
                            step=np.int32(start_epoch * steps_per_epoch))
        else:
            from ..ckpt import latest_step, restore_checkpoint

            step = latest_step(args.resume)
            if step is not None:
                restored = restore_checkpoint(
                    args.resume, step,
                    template={"params": state.params,
                              "opt_state": state.opt_state, "step": 0})
                state = task.place_state(
                    state.replace(params=restored["params"],
                                  opt_state=restored["opt_state"],
                                  step=np.int32(restored["step"])),
                    reinit_opt=False)
                # mid-epoch (preemption) checkpoints resume step-exact:
                # replay the interrupted epoch's deterministic loader
                # order and skip the batches already consumed
                start_epoch, skip_batches = divmod(int(restored["step"]),
                                                   steps_per_epoch)

    jsonl = JsonlLogger(os.path.join(args.output_dir, "log.txt"),
                        enabled=jax.process_index() == 0)
    from ..core.observability import SummaryWriter

    tb = SummaryWriter(os.path.join(args.output_dir, "tb"),
                       enabled=jax.process_index() == 0)
    ckpt_epochs = pretrain_ckpt_epochs(args.epochs)
    step_rng = jax.random.PRNGKey(args.seed + 1)

    from ..core.mesh import prefetch_to_device
    from ..core.preemption import PreemptionGuard

    guard = PreemptionGuard(
        rss_limit_mb=args.rss_limit_gb * 1024.0 if args.rss_limit_gb else None)
    host_step = int(state.step)
    preempted = False
    scan_k = max(1, args.steps_per_call)
    scan_step = task.make_train_step_scan(state) if scan_k > 1 else None

    def _superbatches(host_iter):
        """Group K host batches -> placed (K, B, ...) superbatches,
        one placed ahead (device_put is async, so this double-buffers
        H2D like prefetch_to_device). A final short group is yielded as
        the raw host list and run through the per-step path."""
        from collections import deque

        def groups():
            buf = []
            for b in host_iter:
                buf.append(b)
                if len(buf) == scan_k:
                    yield buf
                    buf = []
            if buf:
                yield buf

        q = deque()
        for g in groups():
            q.append(task.shard_superbatch(g) if len(g) == scan_k else g)
            if len(q) >= 2:
                yield q.popleft()
        while q:
            yield q.popleft()

    for epoch in range(start_epoch, args.epochs):
        loader.set_epoch(epoch)
        host_iter = iter(loader)
        if epoch == start_epoch and skip_batches:
            import itertools

            host_iter = itertools.islice(host_iter, skip_batches, None)
        logger = MetricLogger()
        # double-buffered H2D prefetch + one step in flight: the float()
        # sync of step N's metrics happens AFTER step N+1 is dispatched,
        # so host logging never stalls the device
        pending = None

        def _flush(metrics):
            # scan metrics are stacked (K,); per-step are scalars
            arrs = {k: np.atleast_1d(np.asarray(v))
                    for k, v in metrics.items()}
            for i in range(next(iter(arrs.values())).shape[0]):
                logger.update(**{k: float(v[i]) for k, v in arrs.items()})

        if scan_k > 1:
            for item in logger.log_every(
                    _superbatches(host_iter), args.print_freq,
                    header=f"Epoch [{epoch}]"):
                if isinstance(item, list):  # short final group
                    ndata = task.mesh.shape[task.mesh.axis_names[0]]
                    for b in item:
                        # same divisibility fallback as the fine-tune
                        # placers: replicated when the batch can't shard
                        ok = (jax.process_count() > 1
                              or b["image"].shape[0] % ndata == 0)
                        state, metrics = task.train_step(
                            state, task.shard_batch(b) if ok else b,
                            step_rng)
                        if pending is not None:
                            _flush(pending)
                        pending = metrics
                        host_step += 1
                        if guard.should_save(host_step):
                            preempted = True
                            break
                else:
                    state, metrics = scan_step(state, item, step_rng)
                    if pending is not None:
                        _flush(pending)
                    pending = metrics
                    host_step += scan_k
                    preempted = guard.should_save(host_step)
                if preempted:
                    break
        else:
            for sharded in logger.log_every(
                    prefetch_to_device(host_iter, task.mesh),
                    args.print_freq, header=f"Epoch [{epoch}]"):
                state, metrics = task.train_step(state, sharded, step_rng)
                if pending is not None:
                    _flush(pending)
                pending = metrics
                host_step += 1
                if guard.should_save(host_step):
                    preempted = True
                    break
        if pending is not None:
            _flush(pending)
        if preempted:
            from ..ckpt import save_checkpoint

            # blocking: the grace window may expire right after we return
            save_checkpoint(ckpt_dir, host_step,
                            {"params": state.params,
                             "opt_state": state.opt_state,
                             "step": host_step}, block=True)
            if jax.process_index() == 0:
                print(f"preemption checkpoint saved @ step {host_step} "
                      f"(epoch {epoch}); resume with --resume {ckpt_dir}"
                      + (f" [{guard.reason}]" if guard.reason else ""))
            return
        logger.synchronize_between_processes()
        from ..core.metrics import device_memory_mb

        record = {"epoch": epoch,
                  **{k: m.global_avg for k, m in logger.meters.items()},
                  "max_mem_mb": device_memory_mb()}
        jsonl.write(record)
        for k in ("loss", "mim_loss", "res_loss", "mlm_loss", "lr"):
            if k in logger.meters:
                tb.add_scalar(f"train/{k}", logger.meters[k].global_avg, epoch)
        tb.flush()
        if epoch in ckpt_epochs:
            from ..ckpt import save_checkpoint

            # pass the device arrays — orbax snapshots them itself and,
            # for ZeRO-1-sharded moments or multi-host runs, gathers the
            # non-addressable shards (device_get would crash there); every
            # process must participate in the save
            save_checkpoint(ckpt_dir, int(state.step),
                            {"params": state.params,
                             "opt_state": state.opt_state,
                             "step": int(state.step)})
            if jax.process_index() == 0:
                print(f"saved checkpoint @ epoch {epoch}")
    # drain async orbax saves BEFORE interpreter teardown: exiting right
    # after the final cadence save used to leave a half-written
    # <step>.orbax-checkpoint-tmp and a "cannot schedule new futures
    # after interpreter shutdown" spray from orbax's commit threads
    # (caught by the round-4 burn-in drill on a tiny corpus)
    from ..ckpt.orbax_io import wait_for_saves

    wait_for_saves(ckpt_dir)


if __name__ == "__main__":
    main()
