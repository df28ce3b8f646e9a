"""Rebuild BENCH_BURNIN.json from an (even partially) completed
tools/burnin.py work directory.

burnin.py only writes the artifact after all three phases; if the driver
dies (or the round clock cuts phase 3), the raw evidence is still on
disk — phase logs, the run's JSONL, orbax checkpoints. This script
re-derives the same artifact from that state:

  python tools/burnin_harvest.py [--work /tmp/ecamp_burnin] [--steps 2000]

Bitwise comparison runs only if both the interrupted+resumed run and the
reference run have the shared cadence checkpoint (epoch 60) on disk;
otherwise the artifact records "bitwise": {"status": "pending"}.
"""

from __future__ import annotations

import argparse
import json
import os
import re

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SIT_RE = re.compile(r"Epoch \[(\d+)\].*Total time: ([0-9.]+)s "
                     r"\(([0-9.]+) s/it\)")
_PRE_RE = re.compile(r"preemption checkpoint saved @ step (\d+)")


def parse_phase(path: str):
    if not os.path.exists(path):
        return [], None
    with open(path) as f:
        text = f.read()
    sit = [(int(e), float(s)) for e, _, s in _SIT_RE.findall(text)]
    m = _PRE_RE.search(text)
    return sit, (int(m.group(1)) if m else None)


def parse_phase_segments(run_dir: str, stem: str):
    """Parse <stem>.log plus any <stem>_rN.log RSS-watchdog resume
    segments (tools/burnin.py run_cli_to_completion); returns the merged
    per-epoch s/it list and the segment count."""
    import glob

    paths = sorted(glob.glob(os.path.join(run_dir, f"{stem}*.log")))
    sit = []
    for p in paths:
        s, _ = parse_phase(p)
        sit += s
    return sit, len(paths)


def harvest(work: str, steps: int, batch: int, steps_per_epoch: int,
            out: str, hbm_static: float = None) -> dict:
    run = os.path.join(work, "run")
    ref = os.path.join(work, "ref")
    # phase 1 may span RSS-watchdog resume segments (tools/burnin.py,
    # round 5): merge phase1*.log and take the drill step — preferring a
    # "[signal]"-suffixed line (the actual SIGTERM drill) over a generic
    # preemption line (an RSS-watchdog exit also prints one)
    import glob as _glob

    sig_re = re.compile(
        r"preemption checkpoint saved @ step (\d+) .*\[signal\]")
    p1, preempt_step, sig_step = [], None, None
    for pth in sorted(_glob.glob(os.path.join(run, "phase1*.log"))):
        s, pe = parse_phase(pth)
        p1 += s
        if preempt_step is None:
            preempt_step = pe
        if sig_step is None:
            with open(pth) as f:
                m = sig_re.search(f.read())
            if m:
                sig_step = int(m.group(1))
    preempt_step = sig_step if sig_step is not None else preempt_step
    p2, n2 = parse_phase_segments(run, "phase2")
    _, n3 = parse_phase_segments(ref, "phase3")
    result = {"batch": batch, "steps_target": steps,
              "steps_per_epoch": steps_per_epoch,
              "epochs": -(-steps // steps_per_epoch),
              "harvested": True}
    meta_path = os.path.join(work, "corpus", "corpus_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            result["corpus"] = json.load(f)
    result["drill"] = {"sigterm_delivered": preempt_step is not None,
                       "preempt_step": preempt_step,
                       "epochs_before": len(p1)}
    if n2 > 1 or n3 > 1:
        result["rss_watchdog_resumes"] = {"phase2": max(0, n2 - 1),
                                          "phase3": max(0, n3 - 1)}

    sit_all = sorted(p1 + p2)
    # ground truth for completed work is the run's JSONL (one record per
    # COMPLETED epoch, appended across all segments); the s/it series can
    # have gaps if a pre-fix segment overwrote an earlier log
    logpath0 = os.path.join(run, "log.txt")
    n_epoch_records = 0
    if os.path.exists(logpath0):
        with open(logpath0) as f:
            n_epoch_records = sum(1 for ln in f if ln.strip())
    result["steps_completed"] = (max(len({e for e, _ in sit_all}),
                                     n_epoch_records) * steps_per_epoch)
    if sit_all:
        k = min(10, max(1, len(sit_all) // 4))
        # one entry per epoch (an epoch re-run across a resume boundary
        # appears in two segment logs); median windows absorb the
        # occasional slow post-restart epoch
        by_epoch = {}
        for e, s in sit_all:
            by_epoch.setdefault(e, s)
        steady = sorted(by_epoch.items())
        # the drift windows measure STEADY-state degradation, so exclude
        # the warm-up epochs (remote compile + feeder/page-cache warm-up
        # dominate epochs 0-1 and would read as a large fake negative
        # drift); same convention as tools/ab_u8pipe.py's steady window
        warm = [(e, s) for e, s in steady if e >= 2] or steady
        first = float(np.median([s for _, s in warm[:k]]))
        last = float(np.median([s for _, s in warm[-k:]]))
        result["step_time"] = {
            "first_window_s_it": round(first, 4),
            "last_window_s_it": round(last, 4),
            "drift_pct": round(100.0 * (last - first) / first, 2),
            "drift_basis": "median of first/last 10 epochs, warm-up "
                           "epochs 0-1 excluded",
            "all_epochs": [[e, s] for e, s in sit_all]}

    logpath = os.path.join(run, "log.txt")
    records = []
    if os.path.exists(logpath):
        with open(logpath) as f:
            records = [json.loads(ln) for ln in f if ln.strip()]
    losses = [{kk: r.get(kk) for kk in
               ("epoch", "loss", "mim_loss", "res_loss", "mlm_loss")}
              for r in records]
    result["epochs_logged"] = len(records)
    result["loss_first"] = losses[0] if losses else None
    result["loss_mid"] = losses[len(losses) // 2] if losses else None
    result["loss_last"] = losses[-1] if losses else None
    result["loss_monotone_frac"] = (
        round(float(np.mean(np.diff([r["loss"] for r in losses]) < 0)), 3)
        if len(losses) > 1 else None)
    result["max_mem_mb"] = max((r.get("max_mem_mb", 0.0) or 0.0)
                               for r in records) if records else 0.0

    shared_step = (60 + 1) * steps_per_epoch
    have = all(os.path.isdir(os.path.join(d, "ckpt", str(shared_step)))
               for d in (run, ref))
    if have:
        from burnin import compare_ckpts  # same directory

        result["bitwise"] = compare_ckpts(
            os.path.join(run, "ckpt"), os.path.join(ref, "ckpt"),
            shared_step)
        result["bitwise"]["ok"] = (
            result["bitwise"]["n_param_mismatch"] == 0
            and result["bitwise"]["n_opt_mismatch"] == 0)
    else:
        result["bitwise"] = {
            "status": "pending",
            "note": f"shared cadence ckpt {shared_step} absent from one "
                    "of run/ref; small-scale bitwise resume is covered by "
                    "tests/test_preemption.py::test_pretrain_preempt_resume"}

    # static HBM bound (VERDICT r4 #7): runtime memory_stats() is None
    # over this environment's tunneled transport (max_mem_mb above stays
    # 0.0), so carry XLA's compile-time bound for the flagship step
    # instead. bench.py emits it per-run; reuse its last recorded value
    # when present rather than paying a full B=104 AOT compile here.
    result["hbm_static_mb"] = hbm_static
    if hbm_static is None:
        result["hbm_static_note"] = ("pass --hbm_static_mb (from bench.py's "
                                     "hbm_static_mb field) to record the "
                                     "compile-time bound")

    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    brief = {kk: vv for kk, vv in result.items() if kk != "step_time"}
    if "step_time" in result:
        brief["step_time_drift_pct"] = result["step_time"]["drift_pct"]
    print(json.dumps(brief, indent=2))
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/ecamp_burnin")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=104)
    ap.add_argument("--steps_per_epoch", type=int, default=20)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_BURNIN.json"))
    ap.add_argument("--hbm_static_mb", type=float, default=None,
                    help="compile-time HBM bound of the flagship step "
                         "(bench.py's hbm_static_mb field)")
    args = ap.parse_args()
    harvest(args.work, args.steps, args.batch, args.steps_per_epoch,
            args.out, hbm_static=args.hbm_static_mb)


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
