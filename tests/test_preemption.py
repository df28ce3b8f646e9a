"""Preemption-safe checkpointing (core/preemption.py + cli/pretrain.py).

The reference loses all progress since the last epoch-boundary torch.save
when a job is preempted; ecamp_tpu converts SIGTERM (or the injected
fault ECAMP_PREEMPT_AT_STEP) into a step-exact orbax checkpoint and a
clean exit, and --resume continues BITWISE: per-step RNG is folded from
state.step and the loader order is deterministic per (seed, epoch), so
interrupted+resumed training equals an uninterrupted run exactly.
"""

import json
import os
import signal
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from test_cli_pretrain_viz import _make_tokenizer_json


@pytest.fixture
def toy_mimic32(tmp_path):
    """32 samples so B=8 (shardable over the 8-device CPU mesh) still
    gives 4 optimizer steps per epoch — room to preempt mid-epoch."""
    from PIL import Image
    import pandas as pd

    rng = np.random.default_rng(0)
    root = tmp_path / "mimic32"
    root.mkdir()
    _make_tokenizer_json(root / "mimic_wordpiece.json")
    rows = []
    for i in range(32):
        name = str(root / f"img_{i}.png")
        Image.fromarray(rng.integers(0, 255, (96, 96, 3)).astype(np.uint8)
                        ).save(name)
        rows.append({"img_path": name,
                     "report": "the lungs are clear. heart size normal.",
                     "llm_output": "no evidence of pneumonia."})
    pd.DataFrame(rows).to_csv(root / "mimic-cxr-2.0.0-entity-llm.csv",
                              index=False)
    pd.DataFrame({"label_i": [0] * 32, "label_j": [1] * 32}).to_csv(
        root / "mimic-cxr-2.0.0-attn-label.csv", index=False)
    return root


def test_guard_sigterm_sets_flag():
    from ecamp_tpu.core.preemption import PreemptionGuard

    guard = PreemptionGuard()
    try:
        assert not guard.should_save(1)
        os.kill(os.getpid(), signal.SIGTERM)
        assert guard.requested
        assert guard.should_save(2)  # single-process: immediate
    finally:
        guard.uninstall()


def test_guard_fault_injection_env(monkeypatch):
    from ecamp_tpu.core.preemption import PreemptionGuard

    monkeypatch.setenv("ECAMP_PREEMPT_AT_STEP", "5")
    guard = PreemptionGuard()
    try:
        assert not guard.should_save(4)
        assert guard.should_save(5)
        assert guard.should_save(6)
    finally:
        guard.uninstall()


def test_guard_rss_watchdog():
    """rss_limit_mb: crossing the host-RSS limit reads as a preemption
    request (reason recorded); an un-crossable limit never triggers."""
    from ecamp_tpu.core.preemption import PreemptionGuard

    guard = PreemptionGuard(rss_limit_mb=1.0)  # any process exceeds 1 MB
    try:
        assert guard.host_rss_mb() > 1.0
        assert guard.should_save(1)
        assert guard.reason and "host RSS" in guard.reason
    finally:
        guard.uninstall()
    guard = PreemptionGuard(rss_limit_mb=float(2**40))
    try:
        assert not guard.should_save(1)
        assert guard.reason is None
    finally:
        guard.uninstall()


def _tiny_pretrain(monkeypatch, corpus, out, epochs=2, resume=None,
                   num_workers=0):
    from ecamp_tpu.cli import pretrain
    from ecamp_tpu.core import config as cfg

    argv = ["pretrain", "--data_path", str(corpus),
            "--batch_size", "8", "--epochs", str(epochs), "--max_epoch", "4",
            "--warmup_epochs", "1", "--input_size", "64",
            "--max_caption_length", "16",
            "--num_workers", str(num_workers), "--output_dir", str(out),
            "--no_bf16", "--print_freq", "1"]
    if resume:
        argv += ["--resume", str(resume)]
    monkeypatch.setattr(sys, "argv", argv)
    tiny_kw = dict(
        vit=cfg.ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=1,
                          num_heads=2),
        decoder=cfg.MAEDecoderConfig(embed_dim=16, depth=1, num_heads=2),
        bert=cfg.BertConfig(vocab_size=32, hidden_size=32,
                            num_hidden_layers=1, num_attention_heads=2,
                            intermediate_size=64, max_position_embeddings=16),
        sr_window=1, max_caption_length=16)
    orig = cfg.PretrainConfig

    def tiny_config(**kw):
        merged = dict(tiny_kw)
        merged.update({k: v for k, v in kw.items() if k not in merged})
        return orig(**merged)

    monkeypatch.setattr(cfg, "PretrainConfig", tiny_config)
    monkeypatch.setattr(pretrain.cfg, "PretrainConfig", tiny_config)
    pretrain.main()


def test_preempt_resume_bitwise(toy_mimic32, tmp_path, monkeypatch, capsys):
    """Preempt at step 3 of 8 (mid-epoch 0), resume, and require the final
    checkpoint to equal an uninterrupted run's params bitwise."""
    from ecamp_tpu.ckpt import latest_step, restore_checkpoint

    # --- uninterrupted reference run -----------------------------------
    ref_out = tmp_path / "ref"
    _tiny_pretrain(monkeypatch, toy_mimic32, ref_out)
    ref_dir = str(ref_out / "ckpt")
    ref_final = latest_step(ref_dir)
    assert ref_final == 8  # 32 samples / B=8 -> 4 steps/epoch x 2 epochs

    # --- interrupted run ------------------------------------------------
    pre_out = tmp_path / "pre"
    monkeypatch.setenv("ECAMP_PREEMPT_AT_STEP", "3")
    _tiny_pretrain(monkeypatch, toy_mimic32, pre_out)
    monkeypatch.delenv("ECAMP_PREEMPT_AT_STEP")
    msg = capsys.readouterr().out
    assert "preemption checkpoint saved @ step 3 (epoch 0)" in msg
    ck = str(pre_out / "ckpt")
    assert latest_step(ck) == 3  # mid-epoch: epoch-boundary save never ran

    # --- resume to completion --------------------------------------------
    _tiny_pretrain(monkeypatch, toy_mimic32, pre_out, resume=ck)
    assert latest_step(ck) == 8

    ref = restore_checkpoint(ref_dir, 8)
    res = restore_checkpoint(ck, 8)
    import jax

    mism = [p for p, (a, b) in zip(
        [str(k) for k in jax.tree_util.tree_leaves_with_path(ref["params"])],
        zip(jax.tree_util.tree_leaves(ref["params"]),
            jax.tree_util.tree_leaves(res["params"])))
        if not np.array_equal(np.asarray(a), np.asarray(b))]
    assert not mism, f"params differ after resume: {mism[:5]}"

    # resumed run logs only the epochs it actually finished; the final
    # epoch record must exist and be finite
    log = (pre_out / "log.txt").read_text().strip().splitlines()
    rec = json.loads(log[-1])
    assert rec["epoch"] == 1 and np.isfinite(rec["loss"])


def test_preempt_resume_bitwise_midrun_threads(toy_mimic32, tmp_path,
                                               monkeypatch, capsys):
    """Preempt at step 6 (mid-epoch 1) with a 2-thread feeder and require
    bitwise equality with an uninterrupted same-seed run — the burn-in
    phase-3 contract at small scale. This exercises both round-5 fixes:
    per-(epoch, worker) thread RNG streams (scheduling-independent draws)
    and epoch>0 resume replay (a fresh process must reproduce epoch 1's
    streams without having consumed epoch 0's)."""
    from ecamp_tpu.ckpt import latest_step, restore_checkpoint

    ref_out = tmp_path / "ref"
    _tiny_pretrain(monkeypatch, toy_mimic32, ref_out, num_workers=2)
    ref_dir = str(ref_out / "ckpt")
    assert latest_step(ref_dir) == 8

    pre_out = tmp_path / "pre"
    monkeypatch.setenv("ECAMP_PREEMPT_AT_STEP", "6")
    _tiny_pretrain(monkeypatch, toy_mimic32, pre_out, num_workers=2)
    monkeypatch.delenv("ECAMP_PREEMPT_AT_STEP")
    msg = capsys.readouterr().out
    assert "preemption checkpoint saved @ step 6 (epoch 1)" in msg
    ck = str(pre_out / "ckpt")
    assert latest_step(ck) == 6

    _tiny_pretrain(monkeypatch, toy_mimic32, pre_out, resume=ck,
                   num_workers=2)
    assert latest_step(ck) == 8

    import jax

    ref = restore_checkpoint(ref_dir, 8)
    res = restore_checkpoint(ck, 8)
    for group in ("params", "opt_state"):
        mism = [str(k) for (k, a), b in zip(
            jax.tree_util.tree_leaves_with_path(ref[group]),
            jax.tree_util.tree_leaves(res[group]))
            if not np.array_equal(np.asarray(a), np.asarray(b))]
        assert not mism, f"{group} differ after mid-epoch-1 resume: {mism[:5]}"


def test_rss_watchdog_checkpoint_exit_and_resume(toy_mimic32, tmp_path,
                                                 monkeypatch, capsys):
    """ECAMP_RSS_LIMIT_GB below the process RSS makes the pretrain CLI
    checkpoint at step 1 and exit cleanly with the RSS reason in the log
    line; resuming without the limit completes the run (the burn-in
    driver's auto-resume segments, tools/burnin.py)."""
    from ecamp_tpu.ckpt import latest_step

    out = tmp_path / "rss"
    monkeypatch.setenv("ECAMP_RSS_LIMIT_GB", "0.001")
    _tiny_pretrain(monkeypatch, toy_mimic32, out)
    monkeypatch.delenv("ECAMP_RSS_LIMIT_GB")
    msg = capsys.readouterr().out
    assert "preemption checkpoint saved @ step 1 (epoch 0)" in msg
    assert "[host RSS" in msg
    ck = str(out / "ckpt")
    assert latest_step(ck) == 1
    _tiny_pretrain(monkeypatch, toy_mimic32, out, resume=ck)
    assert latest_step(ck) == 8


from test_cli_e2e import toy_cls_data  # noqa: F401, E402  (fixture)


def _tiny_cls(monkeypatch, data, out):
    from ecamp_tpu.cli import finetune_cls

    argv = [
        "finetune_cls", "--task", "RSNA",
        "--dataset_path", str(data / "imgs"),
        "--list_path", str(data / "lists"),
        "--img_size", "32", "--model", "tiny",
        "--batch_size", "8", "--eval_batch_size", "8",
        "--num_steps", "6", "--warmup_steps", "1",
        "--lr", "0.01", "--num_workers", "2",
        "--output_dir", str(out), "--no_bf16",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    finetune_cls.main()


def test_cls_preempt_resume(toy_cls_data, tmp_path, monkeypatch, capsys):
    """Fine-tune preemption: interrupt at micro-step 3 (epoch 1 of 3),
    rerun with the same --output_dir, and require resume + completion +
    cleanup, with the final test metrics equal to an uninterrupted run."""
    ref_out = tmp_path / "cls_ref"
    _tiny_cls(monkeypatch, toy_cls_data, ref_out)
    ref_log = (ref_out / "log.txt").read_text().strip().splitlines()
    ref_test = json.loads(ref_log[-1])["test"]

    out = tmp_path / "cls_pre"
    monkeypatch.setenv("ECAMP_PREEMPT_AT_STEP", "3")  # micro steps here
    _tiny_cls(monkeypatch, toy_cls_data, out)
    monkeypatch.delenv("ECAMP_PREEMPT_AT_STEP")
    msg = capsys.readouterr().out
    assert "preemption checkpoint saved @ micro 3" in msg
    assert (out / "preempt").exists()
    assert "TEST" not in msg.split("preemption checkpoint")[-1]

    _tiny_cls(monkeypatch, toy_cls_data, out)
    msg = capsys.readouterr().out
    assert "resuming from preemption checkpoint: micro 3" in msg
    assert "TEST mean AUROC" in msg
    assert not (out / "preempt").exists()  # cleaned after completion

    log = (out / "log.txt").read_text().strip().splitlines()
    test_rec = json.loads(log[-1])["test"]
    assert test_rec["auc"] == pytest.approx(ref_test["auc"], abs=1e-6)


from test_cli_seg_det import toy_rsna_det, toy_siim  # noqa: F401, E402


def _tiny_seg(monkeypatch, data, out):
    from ecamp_tpu.cli import finetune_seg

    argv = ["finetune_seg", "--task", "SIIM",
            "--dataset_path", str(data / "imgs"),
            "--list_path", str(data / "lists"),
            "--img_size", "64", "--model", "tiny",
            "--batch_size", "2", "--eval_batch_size", "2",
            "--num_steps", "6", "--warmup_steps", "1",
            "--num_workers", "2", "--output_dir", str(out), "--no_bf16"]
    monkeypatch.setattr(sys, "argv", argv)
    finetune_seg.main()


def _tiny_det(monkeypatch, data, out):
    from ecamp_tpu.cli import finetune_det

    argv = ["finetune_det",
            "--dataset_path", str(data / "imgs"),
            "--list_path", str(data / "lists"),
            "--img_size", "64", "--model", "tiny",
            "--batch_size", "2", "--eval_batch_size", "2",
            "--num_steps", "4", "--warmup_steps", "1", "--start_eval", "1",
            "--num_workers", "2", "--output_dir", str(out), "--no_bf16"]
    monkeypatch.setattr(sys, "argv", argv)
    finetune_det.main()


def _preempt_roundtrip(run, data, tmp_path, monkeypatch, capsys,
                       final_marker, metric_key):
    """Shared drill: reference run, preempt @ micro 3 (mid-epoch with
    2 micro-steps/epoch), resume, compare final test metric."""
    ref_out = tmp_path / "ref"
    run(monkeypatch, data, ref_out)
    ref_log = (ref_out / "log.txt").read_text().strip().splitlines()
    ref_test = json.loads(ref_log[-1])[metric_key]

    out = tmp_path / "pre"
    monkeypatch.setenv("ECAMP_PREEMPT_AT_STEP", "3")
    run(monkeypatch, data, out)
    monkeypatch.delenv("ECAMP_PREEMPT_AT_STEP")
    msg = capsys.readouterr().out
    assert "preemption checkpoint saved @ micro 3" in msg
    assert (out / "preempt").exists()
    assert final_marker not in msg.split("preemption checkpoint")[-1]

    run(monkeypatch, data, out)
    msg = capsys.readouterr().out
    assert "resuming from preemption checkpoint: micro 3" in msg
    assert final_marker in msg
    assert not (out / "preempt").exists()  # cleaned after completion

    log = (out / "log.txt").read_text().strip().splitlines()
    assert json.loads(log[-1])[metric_key] == pytest.approx(ref_test,
                                                            abs=1e-6)


def test_seg_preempt_resume(toy_siim, tmp_path, monkeypatch, capsys):
    """Segmentation fine-tune preemption drill: interrupt at micro 3
    (epoch 1 of 3, mid-epoch skip exercised), resume, final test dice
    equal to an uninterrupted run (batch_stats included in the state)."""
    _preempt_roundtrip(_tiny_seg, toy_siim, tmp_path, monkeypatch, capsys,
                       "TEST dice", "test_dice")


def test_det_preempt_resume(toy_rsna_det, tmp_path, monkeypatch, capsys):
    """Detection fine-tune preemption drill (same contract as seg)."""
    _preempt_roundtrip(_tiny_det, toy_rsna_det, tmp_path, monkeypatch,
                       capsys, "TEST mAP", "test_map")


def test_pretrain_cli_exit_leaves_no_tmp_checkpoint(toy_mimic32, tmp_path):
    """Exiting right after the final cadence save used to leave a
    half-written <step>.orbax-checkpoint-tmp (async save vs interpreter
    teardown — caught by the round-4 burn-in drill). The CLI now drains
    saves before returning; a SUBPROCESS run (in-process managers would
    mask the race) must leave only complete checkpoints."""
    import subprocess

    out = tmp_path / "out"
    script = f"""
import sys
sys.argv = ["pretrain", "--data_path", {str(toy_mimic32)!r},
            "--batch_size", "8", "--epochs", "2", "--max_epoch", "4",
            "--warmup_epochs", "1", "--input_size", "64",
            "--max_caption_length", "16", "--num_workers", "0",
            "--output_dir", {str(out)!r}, "--no_bf16", "--print_freq", "1"]
from ecamp_tpu.core import config as cfg
tiny_kw = dict(
    vit=cfg.ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=1,
                      num_heads=2),
    decoder=cfg.MAEDecoderConfig(embed_dim=16, depth=1, num_heads=2),
    bert=cfg.BertConfig(vocab_size=32, hidden_size=32, num_hidden_layers=1,
                        num_attention_heads=2, intermediate_size=64,
                        max_position_embeddings=16),
    sr_window=1, max_caption_length=16)
orig = cfg.PretrainConfig
def tiny(**kw):
    merged = dict(tiny_kw)
    merged.update({{k: v for k, v in kw.items() if k not in merged}})
    return orig(**merged)
cfg.PretrainConfig = tiny
from ecamp_tpu.cli import pretrain
pretrain.cfg.PretrainConfig = tiny
pretrain.main()
"""
    # 900s: under multi-way CPU contention (suite + live TPU feeder) the
    # tiny subprocess run was seen to exceed 600s on this 1-core box
    proc = subprocess.run([sys.executable, "-c", script],
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    ck = out / "ckpt"
    tmps = [p.name for p in ck.iterdir() if "tmp" in p.name]
    assert not tmps, f"incomplete checkpoints left behind: {tmps}"
    steps = sorted(int(p.name) for p in ck.iterdir())
    assert steps == [4, 8]  # epoch-0 and final-epoch cadence saves
    assert "cannot schedule new futures" not in proc.stderr
