"""Unit tests for the burn-in harvest tooling (tools/burnin_harvest.py).

The round-4 headline artifact (BENCH_BURNIN.json) is derived from raw
phase logs + the run JSONL by `harvest()`; these tests pin its parsing
and aggregation on fabricated work directories so a cut-short or
watchdog-segmented run is summarized correctly.
"""

import json
import os
import sys

import pytest

TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")
sys.path.insert(0, TOOLS)

from burnin_harvest import harvest, parse_phase, parse_phase_segments  # noqa: E402


def _epoch_line(e, s_it):
    return f"Epoch [{e}] Total time: {20 * s_it:.1f}s ({s_it:.4f} s/it)\n"


def _write(path, text):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(text)


def _make_work(tmp_path, *, epochs_p1=3, epochs_p2=(), p2_segments=1,
               preempt_step=65, jsonl_epochs=None, s_it=4.0):
    """Fabricate a burn-in work dir: phase1.log with a drill line,
    phase2 logs split over `p2_segments` watchdog segments, and the
    run's JSONL with one record per completed epoch."""
    work = str(tmp_path)
    run = os.path.join(work, "run")
    p1 = "".join(_epoch_line(e, s_it) for e in range(epochs_p1))
    if preempt_step is not None:
        p1 += f"preemption checkpoint saved @ step {preempt_step}\n"
    _write(os.path.join(run, "phase1.log"), p1)
    if epochs_p2:
        chunks = [list(epochs_p2)[i::p2_segments] for i in range(p2_segments)]
        for i, chunk in enumerate(chunks):
            name = "phase2.log" if i == 0 else f"phase2_r{i}.log"
            _write(os.path.join(run, name),
                   "".join(_epoch_line(e, s_it + 0.1 * i) for e in chunk))
    all_epochs = (jsonl_epochs if jsonl_epochs is not None
                  else sorted(set(range(epochs_p1)) | set(epochs_p2)))
    recs = [{"epoch": e, "loss": 9.0 - 0.1 * e, "mim_loss": 0.5,
             "res_loss": 0.3, "mlm_loss": 8.0 - 0.1 * e,
             "max_mem_mb": 0.0} for e in all_epochs]
    _write(os.path.join(run, "log.txt"),
           "".join(json.dumps(r) + "\n" for r in recs))
    return work


def test_parse_phase_extracts_sit_and_preempt(tmp_path):
    p = os.path.join(str(tmp_path), "phase1.log")
    _write(p, _epoch_line(0, 4.0) + _epoch_line(1, 3.5)
           + "preemption checkpoint saved @ step 65 [host RSS 12.0 GB]\n")
    sit, preempt = parse_phase(p)
    assert sit == [(0, 4.0), (1, 3.5)]
    assert preempt == 65


def test_parse_phase_missing_file():
    assert parse_phase("/nonexistent/phase.log") == ([], None)


def test_parse_phase_segments_merges_watchdog_logs(tmp_path):
    d = str(tmp_path)
    _write(os.path.join(d, "phase2.log"), _epoch_line(4, 4.0))
    _write(os.path.join(d, "phase2_r1.log"),
           _epoch_line(5, 4.1) + _epoch_line(6, 4.2))
    sit, n = parse_phase_segments(d, "phase2")
    assert n == 2
    assert sorted(sit) == [(4, 4.0), (5, 4.1), (6, 4.2)]


def test_harvest_partial_run(tmp_path):
    """Cut-short run (no phase 3): drill recorded, bitwise pending,
    steps_completed from epoch records x steps_per_epoch."""
    work = _make_work(tmp_path, epochs_p1=3, epochs_p2=(3, 4, 5, 6),
                      p2_segments=2, preempt_step=65)
    out = os.path.join(work, "BENCH_BURNIN.json")
    r = harvest(work, steps=2000, batch=104, steps_per_epoch=20, out=out)
    assert r["harvested"] is True
    assert r["drill"]["sigterm_delivered"] is True
    assert r["drill"]["preempt_step"] == 65
    assert r["steps_completed"] == 7 * 20
    assert r["rss_watchdog_resumes"]["phase2"] == 1
    assert r["bitwise"]["status"] == "pending"
    assert r["epochs_logged"] == 7
    assert r["loss_first"]["epoch"] == 0 and r["loss_last"]["epoch"] == 6
    # fabricated losses strictly decrease
    assert r["loss_monotone_frac"] == 1.0
    assert os.path.exists(out)
    with open(out) as f:
        assert json.load(f)["steps_completed"] == 140


def test_harvest_steps_from_jsonl_when_logs_gapped(tmp_path):
    """If a pre-fix segment clobbered a log, the JSONL (one record per
    completed epoch) is the ground truth for steps_completed."""
    work = _make_work(tmp_path, epochs_p1=2, epochs_p2=(),
                      jsonl_epochs=list(range(10)))
    r = harvest(work, 2000, 104, 20,
                os.path.join(work, "BENCH_BURNIN.json"))
    assert r["steps_completed"] == 10 * 20


def test_harvest_no_drill(tmp_path):
    work = _make_work(tmp_path, epochs_p1=2, preempt_step=None)
    r = harvest(work, 2000, 104, 20,
                os.path.join(work, "BENCH_BURNIN.json"))
    assert r["drill"]["sigterm_delivered"] is False


def test_harvest_step_time_windows_and_drift(tmp_path):
    """First/last windows are medians over per-epoch s/it; an epoch that
    appears in two segment logs (resume boundary re-run) counts once."""
    work = str(tmp_path)
    run = os.path.join(work, "run")
    lines = [_epoch_line(e, 4.0) for e in range(8)]
    _write(os.path.join(run, "phase1.log"),
           "".join(lines) + "preemption checkpoint saved @ step 160\n")
    # phase 2: epoch 8 slow post-restart, 9..15 faster; epoch 8 repeated
    _write(os.path.join(run, "phase2.log"),
           _epoch_line(8, 9.0) + "".join(_epoch_line(e, 3.0)
                                         for e in range(9, 16)))
    _write(os.path.join(run, "phase2_r1.log"), _epoch_line(8, 9.5))
    recs = [{"epoch": e, "loss": 5.0, "mim_loss": 0, "res_loss": 0,
             "mlm_loss": 5.0, "max_mem_mb": 0.0} for e in range(16)]
    _write(os.path.join(run, "log.txt"),
           "".join(json.dumps(r) + "\n" for r in recs))
    r = harvest(work, 2000, 104, 20,
                os.path.join(work, "BENCH_BURNIN.json"))
    st = r["step_time"]
    # 16 distinct epochs -> window k = min(10, 17//4) = 4
    assert st["first_window_s_it"] == pytest.approx(4.0)
    assert st["last_window_s_it"] == pytest.approx(3.0)
    assert st["drift_pct"] == pytest.approx(-25.0)


def test_run_cli_to_completion_resume_stop_accounting(monkeypatch,
                                                      tmp_path):
    """Phase-3 idempotence (round 5): when a prior driver invocation
    already logged epochs 0..k, a resumed run_cli_to_completion must
    SIGTERM after the same ABSOLUTE epoch a fresh run would — the
    epochs_done_on_disk set counts toward stop_after_epochs, so the
    first segment's sigterm_after_epochs budget shrinks accordingly."""
    import burnin

    calls = []

    def fake_run_cli(out_dir, corpus, batch, epochs, seed, resume="",
                     sigterm_after_epochs=-1, log_name="run",
                     rss_limit_gb=0.0, u8_pipe=False):
        calls.append(dict(resume=resume, sig=sigterm_after_epochs))
        # pretend the child ran epochs 3..6 then got the drill SIGTERM
        log = os.path.join(out_dir, f"{log_name}.log")
        _write(log, "".join(_epoch_line(e, 1.0) for e in range(3, 7)))
        return {"rc": 0, "s_it": [(e, 1.0) for e in range(3, 7)],
                "wall_s": 1.0, "terminated": True, "log": log}

    monkeypatch.setattr(burnin, "run_cli", fake_run_cli)
    out = str(tmp_path / "ref")
    os.makedirs(out, exist_ok=True)
    r = burnin.run_cli_to_completion(
        out, "corpus", 8, 10, seed=42, resume="CK", log_name="phase3",
        stop_after_epochs=7, epochs_done_on_disk={0, 1, 2})
    assert r["rc"] == 0
    # 3 epochs already on disk -> first segment's budget is 7-3=4
    assert calls[0]["sig"] == 4 and calls[0]["resume"] == "CK"


def test_harvest_prefers_signal_drill_across_phase1_segments(tmp_path):
    """An RSS-watchdog exit in phase1.log also prints a generic
    preemption line; the drill record must prefer the [signal]-suffixed
    line, wherever in the phase1* segment logs it appears."""
    work = _make_work(tmp_path, epochs_p1=2, preempt_step=None,
                      jsonl_epochs=[0, 1, 2, 3])
    run = os.path.join(work, "run")
    _write(os.path.join(run, "phase1.log"),
           _epoch_line(0, 2.0)
           + "preemption checkpoint saved @ step 25 (epoch 1); resume "
             "with --resume /x/ckpt [host RSS 60001 MB > limit 56320 MB]\n")
    _write(os.path.join(run, "phase1_r1.log"),
           _epoch_line(1, 2.0)
           + "preemption checkpoint saved @ step 41 (epoch 2); resume "
             "with --resume /x/ckpt [signal]\n")
    out = os.path.join(work, "B.json")
    r = harvest(work, 80, 8, 20, out)
    assert r["drill"]["preempt_step"] == 41
    assert r["drill"]["sigterm_delivered"] is True


def test_phase1_resumes_across_watchdog_exit(monkeypatch, tmp_path):
    """tools/burnin.py main's phase-1 loop: an RSS-watchdog exit before
    the drill is resumed (with the remaining SIGTERM budget) until the
    [signal] drill lands."""
    import burnin

    work = str(tmp_path)
    corpus = os.path.join(work, "corpus")
    os.makedirs(corpus, exist_ok=True)
    _write(os.path.join(corpus, "mimic-cxr-2.0.0-entity-llm.csv"), "x\n")
    _write(os.path.join(corpus, "corpus_meta.json"),
           json.dumps({"n_images": 160, "side": 64}))
    calls = []

    def fake_run_cli(out_dir, corpus_, batch, epochs, seed, resume="",
                     sigterm_after_epochs=-1, log_name="phase1",
                     rss_limit_gb=0.0, u8_pipe=False):
        calls.append(dict(sig=sigterm_after_epochs, resume=resume,
                          rss=rss_limit_gb, log=log_name))
        log = os.path.join(out_dir, f"{log_name}.log")
        if len(calls) == 1:  # watchdog exit after 2 epochs, no drill
            _write(log, _epoch_line(0, 1.0) + _epoch_line(1, 1.0)
                   + "preemption checkpoint saved @ step 40 (epoch 1); "
                     "resume with --resume CK [host RSS 9 MB > limit 1 MB]\n")
            sit = [(0, 1.0), (1, 1.0)]
        else:  # resumed segment delivers the drill
            _write(log, _epoch_line(2, 1.0)
                   + "preemption checkpoint saved @ step 41 (epoch 2); "
                     "resume with --resume CK [signal]\n")
            sit = [(2, 1.0)]
        return {"rc": 0, "s_it": sit, "wall_s": 1.0,
                "terminated": len(calls) > 1, "log": log}

    def fake_completion(*a, **kw):
        return {"rc": 0, "s_it": [], "wall_s": 0.0, "restarts": 0,
                "log": None}

    monkeypatch.setattr(burnin, "run_cli", fake_run_cli)
    monkeypatch.setattr(burnin, "run_cli_to_completion", fake_completion)
    monkeypatch.setattr(sys, "argv",
                        ["burnin", "--steps", "80", "--batch", "8",
                         "--corpus_images", "160", "--preempt_epoch", "3",
                         "--skip_ref", "--work", work])
    # keep the artifact write inside tmp
    monkeypatch.setattr(burnin, "REPO", work)
    burnin.main()
    assert len(calls) == 2
    assert calls[0]["sig"] == 3 and calls[0]["rss"] == 55.0
    # 2 epochs done on disk-log basis after segment 1 -> remaining budget 1
    assert calls[1]["sig"] == 1 and calls[1]["resume"].endswith("ckpt")
