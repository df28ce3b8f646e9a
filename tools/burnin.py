"""Sustained on-chip burn-in of the flagship pretrain stack (VERDICT r4 #1).

Drives the REAL `ecamp-pretrain` CLI (real feeder processes, checkpoint
cadence on, JSONL/TB logging) for >= STEPS optimizer steps at B=104 on a
synthetic-learnable corpus, with one mid-run SIGTERM preemption drill:

  phase 1  run to ~step PREEMPT_AT, deliver SIGTERM, expect a step-exact
           preemption checkpoint and clean exit;
  phase 2  resume with --resume and run to completion (>= STEPS total);
  phase 3  an UNINTERRUPTED reference run with the same seed up to the
           first shared checkpoint-cadence epoch, to verify the
           interrupted+resumed state is BITWISE equal at that step;

and writes BENCH_BURNIN.json: loss trajectory (per-epoch mim/res/mlm),
step-time series + drift (first-vs-last window of per-epoch s/it), peak
device memory (0.0 on the axon tunnel — memory_stats unsupported; see
DESIGN), drill/resume/bitwise outcomes.

Run:  python tools/burnin.py [--steps 2000] [--batch 104] [--work DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import signal
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REPORTS = [
    ("the heart size is normal. there is no evidence of pneumothorax. "
     "lungs are clear without focal consolidation.",
     "impression: no acute cardiopulmonary abnormality."),
    ("moderate cardiomegaly with mild pulmonary edema. small left "
     "pleural effusion is present.",
     "impression: congestive heart failure with effusion."),
    ("right lower lobe opacity concerning for pneumonia. no "
     "pneumothorax or pleural effusion.",
     "impression: right lower lobe pneumonia."),
    ("degenerative changes of the thoracic spine. the lungs are "
     "hyperinflated consistent with emphysema.",
     "impression: copd without acute disease."),
]


def make_corpus(root: str, n_images: int, side: int = 1024) -> None:
    """Learnable synthetic MIMIC-like corpus: per-class image textures
    paired with per-class reports, so mim/res AND mlm losses can descend
    (the model can associate texture class with report template)."""
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    yy, xx = np.meshgrid(np.linspace(0, 1, side), np.linspace(0, 1, side),
                         indexing="ij")
    import csv
    import shutil

    rows, labels = [], []
    for i in range(n_images):
        k = i % len(REPORTS)
        base = (80 + 60 * np.sin(2 * np.pi * (k + 1) * yy)
                + 50 * xx * (k + 1) / 4)
        arr = np.clip(base + rng.normal(0, 8, (side, side)), 0,
                      255).astype(np.uint8)
        p = os.path.join(root, f"img_{i:05d}.jpg")
        Image.fromarray(arr, "L").save(p, "JPEG", quality=90)
        rows.append((p,) + REPORTS[k])
        labels.append((int(rng.integers(0, 3)), int(rng.integers(0, 3))))
    with open(os.path.join(root, "mimic-cxr-2.0.0-entity-llm.csv"), "w",
              newline="") as f:
        w = csv.writer(f)
        w.writerow(["img_path", "report", "llm_output"])
        w.writerows(rows)
    with open(os.path.join(root, "mimic-cxr-2.0.0-attn-label.csv"), "w",
              newline="") as f:
        w = csv.writer(f)
        w.writerow(["label_i", "label_j"])
        w.writerows(labels)
    shutil.copy(os.path.join(REPO, "ecamp_tpu", "assets",
                             "mimic_wordpiece.json"), root)


_SIT_RE = re.compile(r"Epoch \[(\d+)\].*Total time: ([0-9.]+)s "
                     r"\(([0-9.]+) s/it\)")


def run_cli(out_dir: str, corpus: str, batch: int, epochs: int,
            seed: int, resume: str = "", sigterm_after_epochs: int = -1,
            log_name: str = "run") -> dict:
    """Run ecamp-pretrain as a subprocess; optionally SIGTERM it after
    `sigterm_after_epochs` 'Total time' epoch lines. Returns parsed
    per-epoch s/it and exit info; streams raw output to <out>/<log>.log."""
    argv = [sys.executable, "-m", "ecamp_tpu.cli.pretrain",
            "--data_path", corpus, "--output_dir", out_dir,
            "--batch_size", str(batch), "--epochs", str(epochs),
            "--max_epoch", str(2 * epochs), "--warmup_epochs", "5",
            "--seed", str(seed), "--print_freq", "10"]
    if resume:
        argv += ["--resume", resume]
    t0 = time.time()
    logpath = os.path.join(out_dir, f"{log_name}.log")
    os.makedirs(out_dir, exist_ok=True)
    sit, epochs_done, terminated = [], 0, False
    env = dict(os.environ, PYTHONUNBUFFERED="1")  # line-latency matters:
    # the SIGTERM drill triggers off parsed epoch lines
    with open(logpath, "w") as logf:
        proc = subprocess.Popen(argv, cwd=REPO, stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT, text=True,
                                env=env)
        for line in proc.stdout:
            logf.write(line)
            logf.flush()  # keep the on-disk log live: a crashed driver
            # must not take the child's output with it
            m = _SIT_RE.search(line)
            if m:
                sit.append((int(m.group(1)), float(m.group(3))))
                epochs_done += 1
                if (sigterm_after_epochs >= 0 and not terminated
                        and epochs_done >= sigterm_after_epochs):
                    # mid-epoch delivery: wait a beat so the next epoch is
                    # underway, then SIGTERM (the preemption drill)
                    time.sleep(3.0)
                    proc.send_signal(signal.SIGTERM)
                    terminated = True
        rc = proc.wait()
    return {"rc": rc, "s_it": sit, "wall_s": round(time.time() - t0, 1),
            "terminated": terminated, "log": logpath}


def read_jsonl(out_dir: str):
    path = os.path.join(out_dir, "log.txt")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(ln) for ln in f if ln.strip()]


def compare_ckpts(dir_a: str, dir_b: str, step: int) -> dict:
    """Bitwise leaf comparison of two orbax checkpoints at `step`."""
    sys.path.insert(0, REPO)
    from ecamp_tpu.ckpt import restore_checkpoint

    import jax

    a = restore_checkpoint(dir_a, step)
    b = restore_checkpoint(dir_b, step)
    la = jax.tree_util.tree_leaves_with_path(a["params"])
    lb = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_leaves_with_path(b["params"])}
    mism = [jax.tree_util.keystr(k) for k, v in la
            if not np.array_equal(np.asarray(v),
                                  np.asarray(lb[jax.tree_util.keystr(k)]))]
    om = [jax.tree_util.keystr(k) for k, v in
          jax.tree_util.tree_leaves_with_path(a["opt_state"])
          ] if "opt_state" in a and "opt_state" in b else []
    opt_mism = []
    if om:
        bo = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(b["opt_state"])}
        opt_mism = [jax.tree_util.keystr(k) for k, v in
                    jax.tree_util.tree_leaves_with_path(a["opt_state"])
                    if not np.array_equal(np.asarray(v),
                                          np.asarray(bo[
                                              jax.tree_util.keystr(k)]))]
    return {"step": step, "param_leaves": len(la),
            "param_mismatches": mism[:5], "n_param_mismatch": len(mism),
            "n_opt_mismatch": len(opt_mism)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=104)
    ap.add_argument("--corpus_images", type=int, default=2080)
    ap.add_argument("--preempt_epoch", type=int, default=30)
    ap.add_argument("--ref_epochs", type=int, default=61,
                    help="uninterrupted bitwise-reference run length; its "
                         "last cadence ckpt (epoch 60) is compared")
    ap.add_argument("--work", default="/tmp/ecamp_burnin")
    ap.add_argument("--skip_ref", action="store_true")
    args = ap.parse_args()

    corpus = os.path.join(args.work, "corpus")
    if not os.path.exists(os.path.join(corpus,
                                       "mimic-cxr-2.0.0-entity-llm.csv")):
        print(f"building corpus ({args.corpus_images} JPEGs)...")
        make_corpus(corpus, args.corpus_images)
    steps_per_epoch = args.corpus_images // args.batch
    epochs = max(1, -(-args.steps // steps_per_epoch))
    out = os.path.join(args.work, "run")
    ref_out = os.path.join(args.work, "ref")
    result = {"batch": args.batch, "steps_target": args.steps,
              "steps_per_epoch": steps_per_epoch, "epochs": epochs}

    # phase 1: run + SIGTERM drill
    print(f"phase 1: {epochs} epochs x {steps_per_epoch} steps, "
          f"SIGTERM after epoch {args.preempt_epoch}")
    p1 = run_cli(out, corpus, args.batch, epochs, seed=42,
                 sigterm_after_epochs=args.preempt_epoch, log_name="phase1")
    with open(os.path.join(out, "phase1.log")) as f:
        tail = f.read()
    m = re.search(r"preemption checkpoint saved @ step (\d+)", tail)
    result["drill"] = {"rc": p1["rc"], "sigterm_delivered": p1["terminated"],
                       "preempt_step": int(m.group(1)) if m else None,
                       "epochs_before": len(p1["s_it"])}
    assert p1["rc"] == 0 and m, f"drill failed: rc={p1['rc']}"

    # phase 2: resume to completion
    print(f"phase 2: resume from step {m.group(1)}")
    ckpt_dir = os.path.join(os.path.abspath(out), "ckpt")
    p2 = run_cli(out, corpus, args.batch, epochs, seed=42,
                 resume=ckpt_dir, log_name="phase2")
    assert p2["rc"] == 0, f"resume run failed rc={p2['rc']}"
    records = read_jsonl(out)
    sit_all = sorted(p1["s_it"] + p2["s_it"])
    result["epochs_logged"] = len(records)
    result["steps_completed"] = (len({e for e, _ in sit_all})
                                 * steps_per_epoch)
    k = min(10, max(1, len(sit_all) // 4))
    first = float(np.median([s for _, s in sit_all[:k]]))
    last = float(np.median([s for _, s in sit_all[-k:]]))
    result["step_time"] = {
        "first_window_s_it": round(first, 4),
        "last_window_s_it": round(last, 4),
        "drift_pct": round(100.0 * (last - first) / first, 2),
        "all_epochs": [[e, s] for e, s in sit_all]}
    losses = [{kk: r.get(kk) for kk in
               ("epoch", "loss", "mim_loss", "res_loss", "mlm_loss")}
              for r in records]
    result["loss_first"] = losses[0] if losses else None
    result["loss_mid"] = losses[len(losses) // 2] if losses else None
    result["loss_last"] = losses[-1] if losses else None
    result["loss_monotone_frac"] = (
        round(float(np.mean(np.diff([r["loss"] for r in losses]) < 0)), 3)
        if len(losses) > 1 else None)
    result["max_mem_mb"] = max((r.get("max_mem_mb", 0.0) or 0.0)
                               for r in records) if records else 0.0
    result["wall_s"] = {"phase1": p1["wall_s"], "phase2": p2["wall_s"]}

    # phase 3: bitwise reference
    if not args.skip_ref:
        print(f"phase 3: uninterrupted reference, {args.ref_epochs} epochs")
        p3 = run_cli(ref_out, corpus, args.batch, args.ref_epochs, seed=42,
                     log_name="phase3")
        assert p3["rc"] == 0, f"reference run failed rc={p3['rc']}"
        # compare at the last cadence ckpt both runs share: epoch 60
        shared_step = (60 + 1) * steps_per_epoch
        result["bitwise"] = compare_ckpts(
            ckpt_dir, os.path.join(os.path.abspath(ref_out), "ckpt"),
            shared_step)
        result["bitwise"]["ok"] = (
            result["bitwise"]["n_param_mismatch"] == 0
            and result["bitwise"]["n_opt_mismatch"] == 0)
        result["wall_s"]["phase3"] = p3["wall_s"]

    with open(os.path.join(REPO, "BENCH_BURNIN.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({kk: vv for kk, vv in result.items()
                      if kk != "step_time"} |
                     {"step_time_drift_pct":
                      result["step_time"]["drift_pct"]}, indent=2))


if __name__ == "__main__":
    main()
