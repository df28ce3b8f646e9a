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
    with open(os.path.join(root, "corpus_meta.json"), "w") as f:
        json.dump({"n_images": n_images, "side": side}, f)


_SIT_RE = re.compile(r"Epoch \[(\d+)\].*Total time: ([0-9.]+)s "
                     r"\(([0-9.]+) s/it\)")


def run_cli(out_dir: str, corpus: str, batch: int, epochs: int,
            seed: int, resume: str = "", sigterm_after_epochs: int = -1,
            log_name: str = "run", rss_limit_gb: float = 0.0,
            u8_pipe: bool = False) -> dict:
    """Run ecamp-pretrain as a subprocess; optionally SIGTERM it after
    `sigterm_after_epochs` 'Total time' epoch lines. Returns parsed
    per-epoch s/it and exit info; streams raw output to <out>/<log>.log."""
    argv = [sys.executable, "-m", "ecamp_tpu.cli.pretrain",
            "--data_path", corpus, "--output_dir", out_dir,
            "--batch_size", str(batch), "--epochs", str(epochs),
            "--max_epoch", str(2 * epochs), "--warmup_epochs", "5",
            "--seed", str(seed), "--print_freq", "10"]
    if u8_pipe:
        argv.append("--u8_pipe")
    if rss_limit_gb:
        argv += ["--rss_limit_gb", str(rss_limit_gb)]
    if resume:
        argv += ["--resume", resume]
    t0 = time.time()
    logpath = os.path.join(out_dir, f"{log_name}.log")
    os.makedirs(out_dir, exist_ok=True)
    sit, epochs_done, terminated = [], 0, False
    env = dict(os.environ, PYTHONUNBUFFERED="1")  # line-latency matters:
    # the SIGTERM drill triggers off parsed epoch lines
    # persistent XLA compile cache: RSS-watchdog resumes and the phase-3
    # reference run re-trace the same graph — without this each restart
    # re-pays a multi-minute remote compile (harmless no-op if the
    # backend doesn't support it)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(os.path.dirname(os.path.abspath(out_dir)),
                                "xla_cache"))
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


_RSS_PREEMPT_RE = re.compile(
    r"preemption checkpoint saved @ step (\d+).*\[host RSS")


def run_cli_to_completion(out_dir: str, corpus: str, batch: int,
                          epochs: int, seed: int, resume: str = "",
                          log_name: str = "run",
                          rss_limit_gb: float = 55.0,
                          stop_after_epochs: int = -1,
                          max_segments: int = 20,
                          u8_pipe: bool = False,
                          epochs_done_on_disk=()) -> dict:
    """run_cli in resumable segments: the host-RSS watchdog (remote-TPU
    per-transfer host leak, DESIGN.md "host RSS leak") makes the child
    checkpoint-and-exit before the kernel OOM killer would SIGKILL it;
    each watchdog exit is resumed with --resume until the run completes.
    Aggregates s_it/wall across segments and reports the restart count.

    stop_after_epochs >= 0: SIGTERM the run once that many DISTINCT
    epochs have completed across all segments (the phase-3 reference run
    must use the full --epochs so its LR schedule matches the main run
    bitwise, but only needs to reach the shared cadence checkpoint)."""
    ckpt_dir = os.path.join(os.path.abspath(out_dir), "ckpt")
    sit, wall, restarts = [], 0.0, 0
    # epochs completed by a PREVIOUS driver invocation (read from the
    # run's JSONL) count toward stop_after_epochs, so a resumed phase
    # stops at the same absolute epoch a fresh one would
    done_epochs = set(epochs_done_on_disk)

    def free_name(base: str) -> str:
        # never clobber a previous invocation's segment log: the harvest
        # reconstructs the step-time series from ALL <stem>*.log files
        if not os.path.exists(os.path.join(out_dir, f"{base}.log")):
            return base
        i = 1
        while os.path.exists(os.path.join(out_dir, f"{base}_r{i}.log")):
            i += 1
        return f"{base}_r{i}"

    for seg in range(max_segments):
        name = free_name(log_name)
        sig = -1
        if stop_after_epochs >= 0:
            sig = stop_after_epochs - len(done_epochs)
            if sig <= 0:
                break
        r = run_cli(out_dir, corpus, batch, epochs, seed=seed,
                    resume=resume, log_name=name, rss_limit_gb=rss_limit_gb,
                    sigterm_after_epochs=sig, u8_pipe=u8_pipe)
        sit += r["s_it"]
        done_epochs.update(e for e, _ in r["s_it"])
        wall += r["wall_s"]
        assert r["rc"] == 0, f"{name} failed rc={r['rc']} (log {r['log']})"
        with open(r["log"]) as f:
            tail = f.read()[-4000:]
        if r["terminated"] or not _RSS_PREEMPT_RE.search(tail):
            return {"rc": 0, "s_it": sit, "wall_s": round(wall, 1),
                    "restarts": restarts, "log": r["log"]}
        restarts += 1
        resume = ckpt_dir
        print(f"  [{log_name}] RSS watchdog checkpoint-exit; "
              f"resuming (segment {seg + 1})", flush=True)
    else:
        raise RuntimeError(f"{log_name}: exceeded {max_segments} "
                           f"RSS-resume segments")
    return {"rc": 0, "s_it": sit, "wall_s": round(wall, 1),
            "restarts": restarts, "log": None}


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
    ap.add_argument("--corpus_side", type=int, default=1024,
                    help="stored JPEG side; must be >= 448 (the RRC "
                         "target). 512 cuts 1-core decode cost ~4x vs "
                         "1024 without changing what the model sees")
    ap.add_argument("--preempt_epoch", type=int, default=30)
    ap.add_argument("--ref_epochs", type=int, default=61,
                    help="uninterrupted bitwise-reference run length; its "
                         "last cadence ckpt (epoch 60) is compared")
    ap.add_argument("--work", default="/tmp/ecamp_burnin")
    ap.add_argument("--skip_ref", action="store_true")
    ap.add_argument("--rss_limit_gb", type=float, default=55.0,
                    help="host-RSS watchdog handed to each child; see "
                         "core/preemption.py (jaxlib host-transfer leak)")
    ap.add_argument("--u8_pipe", action="store_true",
                    help="run every phase with the u8 image pipe (all "
                         "phases share the flag, so the phase-3 bitwise "
                         "compare remains valid; BENCH_U8PIPE.json has "
                         "the measured A/B)")
    args = ap.parse_args()

    # --u8_pipe consistency across re-invocations (ADVICE r4): the f32 and
    # u8 pipes differ by ~1 ulp/step, so resuming phase-1/2 state produced
    # under a different pipe silently invalidates the phase-3 bitwise
    # compare. Pin the flag in a marker on first run; assert it after.
    os.makedirs(args.work, exist_ok=True)
    marker = os.path.join(args.work, "pipe_marker.json")
    if os.path.exists(marker):
        with open(marker) as f:
            pinned = json.load(f)["u8_pipe"]
        assert pinned == args.u8_pipe, (
            f"work dir {args.work} was started with u8_pipe={pinned}; "
            f"rerun with {'--u8_pipe' if pinned else 'no --u8_pipe'} or "
            f"use a fresh --work")
    else:
        with open(marker, "w") as f:
            json.dump({"u8_pipe": args.u8_pipe}, f)

    corpus = os.path.join(args.work, "corpus")
    if not os.path.exists(os.path.join(corpus,
                                       "mimic-cxr-2.0.0-entity-llm.csv")):
        print(f"building corpus ({args.corpus_images} JPEGs "
              f"@ {args.corpus_side}^2)...")
        make_corpus(corpus, args.corpus_images, side=args.corpus_side)
    steps_per_epoch = args.corpus_images // args.batch
    epochs = max(1, -(-args.steps // steps_per_epoch))
    out = os.path.join(args.work, "run")
    ref_out = os.path.join(args.work, "ref")
    ckpt_dir = os.path.join(os.path.abspath(out), "ckpt")

    def last_epoch(d: str) -> int:
        recs = read_jsonl(d)
        return max((r["epoch"] for r in recs), default=-1)

    # Every phase is idempotent: a dead driver (or a cut-short round) is
    # re-run with the same --work and picks up where the state on disk
    # says it left off.

    # phase 1: run + SIGTERM drill. The drill is specifically the
    # SIGNAL-triggered preemption ("[signal]" reason suffix) — an
    # RSS-watchdog checkpoint-exit also prints a "preemption checkpoint
    # saved" line but is NOT the drill, so phase 1 runs with the
    # watchdog armed and auto-resumes across watchdog exits until the
    # real drill lands (same segment scheme as run_cli_to_completion).
    import glob

    drill_re = re.compile(
        r"preemption checkpoint saved @ step \d+ .*\[signal\]")

    def drill_recorded() -> bool:
        for p in glob.glob(os.path.join(out, "phase1*.log")):
            with open(p) as f:
                if drill_re.search(f.read()):
                    return True
        return False

    if drill_recorded():
        print("phase 1: already complete (drill recorded)")
    else:
        print(f"phase 1: {epochs} epochs x {steps_per_epoch} steps, "
              f"SIGTERM after epoch {args.preempt_epoch}")
        done1 = {r["epoch"] for r in read_jsonl(out)}
        resume1 = (ckpt_dir if os.path.isdir(ckpt_dir) and any(
            d.isdigit() for d in os.listdir(ckpt_dir)) else "")
        for seg in range(20):
            name = "phase1" if seg == 0 and not os.path.exists(
                os.path.join(out, "phase1.log")) else f"phase1_r{seg}"
            while os.path.exists(os.path.join(out, f"{name}.log")):
                seg += 1
                name = f"phase1_r{seg}"
            p1 = run_cli(out, corpus, args.batch, epochs, seed=42,
                         resume=resume1,
                         sigterm_after_epochs=max(
                             0, args.preempt_epoch - len(done1)),
                         log_name=name, rss_limit_gb=args.rss_limit_gb,
                         u8_pipe=args.u8_pipe)
            assert p1["rc"] == 0, f"phase 1 failed: rc={p1['rc']}"
            done1.update(e for e, _ in p1["s_it"])
            if drill_recorded():
                break
            print("  [phase1] RSS watchdog checkpoint-exit before the "
                  "drill; resuming", flush=True)
            resume1 = ckpt_dir
        else:
            raise RuntimeError("phase 1: drill never delivered")

    # phase 2: resume to completion (auto-resuming across RSS-watchdog
    # checkpoint-exits)
    if last_epoch(out) >= epochs - 1:
        print("phase 2: already complete")
    else:
        print(f"phase 2: resume from {ckpt_dir}")
        p2 = run_cli_to_completion(out, corpus, args.batch, epochs,
                                   seed=42, resume=ckpt_dir,
                                   log_name="phase2",
                                   rss_limit_gb=args.rss_limit_gb,
                                   u8_pipe=args.u8_pipe)
        print(f"phase 2 done in {p2['wall_s']}s "
              f"({p2['restarts']} watchdog resumes)")

    # phase 3: independent second run, same config/seed/schedule (same
    # --epochs so the LR cosine is identical), stopped after the shared
    # cadence checkpoint (epoch 60 -> step 61*steps_per_epoch). Both runs
    # restart at DIFFERENT step boundaries (drill at the preempt epoch vs
    # watchdog RSS exits), so bitwise equality at the shared step proves
    # resume is state-exact at multiple distinct interruption points.
    if not args.skip_ref and last_epoch(ref_out) < args.ref_epochs - 1:
        print(f"phase 3: reference run to epoch {args.ref_epochs}")
        # idempotence: a prior cut-short invocation leaves cadence
        # checkpoints under ref/ckpt — resume from them instead of
        # restarting the reference run at epoch 0, and count the
        # epochs it already logged toward the stop condition
        ref_ck = os.path.join(os.path.abspath(ref_out), "ckpt")
        prior = {r["epoch"] for r in read_jsonl(ref_out)}
        has_ck = os.path.isdir(ref_ck) and any(
            d.isdigit() for d in os.listdir(ref_ck))
        p3 = run_cli_to_completion(ref_out, corpus, args.batch, epochs,
                                   seed=42, log_name="phase3",
                                   resume=ref_ck if has_ck else "",
                                   rss_limit_gb=args.rss_limit_gb,
                                   stop_after_epochs=args.ref_epochs,
                                   u8_pipe=args.u8_pipe,
                                   epochs_done_on_disk=prior)
        print(f"phase 3 done in {p3['wall_s']}s "
              f"({p3['restarts']} watchdog resumes)")
    elif not args.skip_ref:
        print("phase 3: already complete")

    # artifact: shared with the standalone harvest tool
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from burnin_harvest import harvest

    harvest(args.work, args.steps, args.batch, steps_per_epoch,
            os.path.join(REPO, "BENCH_BURNIN.json"))


if __name__ == "__main__":
    main()
