"""End-to-end CLI tests: pretrain loop on a synthetic MIMIC-style dir, and
the visualization CLI from a synthetic reference .pth."""

import json
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow
from PIL import Image


def _make_tokenizer_json(path):
    """Tiny HF-tokenizers-format WordPiece asset (same schema as
    mimic_wordpiece.json)."""
    words = ["the", "lungs", "are", "clear", "no", "evidence", "of",
             "pneumonia", "effusion", "heart", "size", "normal", "there",
             "is", "mild", "##ly", "stable", "chest", "pa", "and"]
    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[MASK]": 3, "[SEP]": 4,
             ".": 5, ",": 6}
    for w in words:
        vocab[w] = len(vocab)
    cfg = {
        "version": "1.0",
        "truncation": None, "padding": None,
        "added_tokens": [
            {"id": i, "special": True, "content": t, "single_word": False,
             "lstrip": False, "rstrip": False, "normalized": False}
            for t, i in list(vocab.items())[:5]
        ],
        "normalizer": {"type": "Sequence", "normalizers": [
            {"type": "Lowercase"}, {"type": "NFKD"},
            {"type": "StripAccents"}]},
        "pre_tokenizer": {"type": "Sequence", "pretokenizers": [
            {"type": "Whitespace"},
            {"type": "Digits", "individual_digits": False}]},
        "post_processor": None, "decoder": None,
        "model": {"type": "WordPiece", "unk_token": "[UNK]",
                  "continuing_subword_prefix": "##",
                  "max_input_chars_per_word": 100, "vocab": vocab},
    }
    with open(path, "w") as f:
        json.dump(cfg, f)
    return vocab


@pytest.fixture
def toy_mimic(tmp_path):
    rng = np.random.default_rng(0)
    root = tmp_path / "mimic"
    root.mkdir()
    _make_tokenizer_json(root / "mimic_wordpiece.json")
    import pandas as pd

    rows = []
    for i in range(8):
        name = str(root / f"img_{i}.png")
        Image.fromarray(rng.integers(0, 255, (96, 96, 3)).astype(np.uint8)
                        ).save(name)
        rows.append({"img_path": name,
                     "report": "the lungs are clear. heart size normal.",
                     "llm_output": "no evidence of pneumonia."})
    pd.DataFrame(rows).to_csv(root / "mimic-cxr-2.0.0-entity-llm.csv",
                              index=False)
    pd.DataFrame({"label_i": [0] * 8, "label_j": [1] * 8}).to_csv(
        root / "mimic-cxr-2.0.0-attn-label.csv", index=False)
    return root


@pytest.mark.parametrize("pipe", [[], ["--u8_pipe"]],
                         ids=["f32", "u8_pipe"])
def test_pretrain_cli_e2e(toy_mimic, tmp_path, monkeypatch, capsys, pipe):
    from ecamp_tpu.cli import pretrain

    out = tmp_path / "out"
    argv = ["pretrain", "--data_path", str(toy_mimic),
            "--batch_size", "8", "--epochs", "2", "--max_epoch", "4",
            "--warmup_epochs", "1", "--input_size", "64",
            "--max_caption_length", "16",
            "--num_workers", "2", "--output_dir", str(out), "--no_bf16",
            "--print_freq", "1"] + pipe
    monkeypatch.setattr(sys, "argv", argv)
    # shrink the model via config monkeypatching: the CLI builds
    # PretrainConfig() defaults — patch the dataclass defaults used there
    from ecamp_tpu.core import config as cfg

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
    # epoch logs written, checkpoint for epoch 0 and final saved
    log = (out / "log.txt").read_text().strip().splitlines()
    assert len(log) == 2
    rec = json.loads(log[-1])
    assert np.isfinite(rec["loss"]) and "mlm_loss" in rec
    assert (out / "ckpt").exists()


def test_pretrain_cli_steps_per_call(toy_mimic, tmp_path, monkeypatch,
                                     capsys):
    """--steps_per_call 3 over 4 steps/epoch exercises both the scan
    superbatch path (one group of 3) and the short-final-group fallback
    (1 per-step call), with per-step metrics still logged."""
    from ecamp_tpu.cli import pretrain

    out = tmp_path / "out_scan"
    argv = ["pretrain", "--data_path", str(toy_mimic),
            "--batch_size", "2", "--epochs", "1", "--max_epoch", "4",
            "--warmup_epochs", "1", "--input_size", "64",
            "--max_caption_length", "16", "--steps_per_call", "3",
            "--num_workers", "2", "--output_dir", str(out), "--no_bf16",
            "--print_freq", "1"]
    monkeypatch.setattr(sys, "argv", argv)
    from ecamp_tpu.core import config as cfg

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
    log = (out / "log.txt").read_text().strip().splitlines()
    assert len(log) == 1
    rec = json.loads(log[-1])
    assert np.isfinite(rec["loss"]) and "mlm_loss" in rec


def test_full_lifecycle_pretrain_export_finetune(toy_mimic, tmp_path,
                                                 monkeypatch, capsys):
    """The reference README's whole workflow, chained: pretrain ->
    reference-format .pth (torch-free writer) -> classification
    fine-tune seeded from it. The fine-tune's initial trunk must equal
    the pretrained trunk (import actually took effect), and training +
    test must complete."""
    from ecamp_tpu.ckpt import latest_step, restore_checkpoint
    from ecamp_tpu.ckpt.torch_export import export_ecamp_pretrain
    from ecamp_tpu.cli import pretrain
    from ecamp_tpu.core import config as cfg

    out = tmp_path / "pre_out"
    argv = ["pretrain", "--data_path", str(toy_mimic),
            "--batch_size", "8", "--epochs", "1", "--max_epoch", "4",
            "--warmup_epochs", "1", "--input_size", "64",
            "--max_caption_length", "16",
            "--num_workers", "2", "--output_dir", str(out), "--no_bf16",
            "--print_freq", "1"]
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

    # export the pretrain checkpoint to a reference-format .pth
    ckdir = str(out / "ckpt")
    step = latest_step(ckdir)
    restored = restore_checkpoint(ckdir, step)
    pth = str(tmp_path / "pretrained_tiny.pth")
    export_ecamp_pretrain({"params": restored["params"]}, pth, epoch=0)

    # fine-tune classification seeded from the exported .pth
    from ecamp_tpu.cli import finetune_cls

    rng = np.random.default_rng(0)
    lists = tmp_path / "lists" / "RSNA"
    lists.mkdir(parents=True)
    imgdir = tmp_path / "cls_imgs"
    imgdir.mkdir()
    for split, n in (("train", 8), ("val", 4), ("test", 4)):
        lines = []
        for i in range(n):
            name = f"{split}{i}.png"
            base = 170 if i % 2 else 100
            Image.fromarray(np.clip(rng.normal(base, 15, (64, 64, 3)), 0,
                                    255).astype(np.uint8)).save(imgdir / name)
            lines.append(f"{name} {i % 2}")
        (lists / f"{split}_list.txt").write_text("\n".join(lines) + "\n")

    cls_out = tmp_path / "cls_out"
    finetune_cls._VIT_FACTORY["pretrain_tiny"] = \
        lambda img_size=32: cfg.ViTConfig(img_size=img_size, patch_size=16,
                                          embed_dim=32, depth=1, num_heads=2)
    argv = ["finetune_cls", "--task", "RSNA",
            "--dataset_path", str(imgdir), "--list_path", str(tmp_path / "lists"),
            "--img_size", "32", "--model", "pretrain_tiny",
            "--batch_size", "4", "--eval_batch_size", "4",
            "--num_steps", "2", "--warmup_steps", "1",
            "--pretrained", pth,
            "--num_workers", "2", "--output_dir", str(cls_out), "--no_bf16"]
    monkeypatch.setattr(sys, "argv", argv)
    try:
        finetune_cls.main()
    finally:
        finetune_cls._VIT_FACTORY.pop("pretrain_tiny", None)
    assert "TEST mean AUROC" in capsys.readouterr().out

    # the import took effect: the classifier template seeded from the
    # .pth carries the pretrained trunk values
    import jax

    from ecamp_tpu.ckpt import import_vit_classifier
    from ecamp_tpu.nn import ViTClassifier

    model = ViTClassifier(finetune_cls.cfg.ViTConfig(
        img_size=32, patch_size=16, embed_dim=32, depth=1, num_heads=2), 1)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 32, 32, 3), np.float32))
    loaded_vars, loaded, _ = import_vit_classifier(variables, pth)
    assert len(loaded) > 10  # trunk leaves came from the .pth
    np.testing.assert_array_equal(
        np.asarray(loaded_vars["params"]["trunk"]["cls_token"]),
        np.asarray(restored["params"]["cls_token"]))


def test_visualize_cli_e2e(tmp_path, monkeypatch, capsys):
    """visualize CLI end-to-end with a synthetic .pth of the tiny model.

    Uses the real reference tokenizer asset path when present (read-only)."""
    tok_json = tmp_path / "wp.json"
    _make_tokenizer_json(tok_json)

    # Build a tiny ECAMP torch checkpoint via the import test helper
    torch = pytest.importorskip("torch")
    sys.path.insert(0, os.path.dirname(__file__))
    from test_ecamp_import import BERT, DEC, VIT, _reference_state_dict

    g = torch.Generator().manual_seed(0)
    sd = _reference_state_dict(g)
    ckpt = str(tmp_path / "tiny.pth")
    torch.save({"model": sd}, ckpt)

    img = tmp_path / "x.png"
    rng = np.random.default_rng(1)
    Image.fromarray(rng.integers(0, 255, (128, 128, 3)).astype(np.uint8)
                    ).save(img)

    from ecamp_tpu.cli import visualize

    # patch the CLI's full-size model to the tiny config matching the ckpt
    from ecamp_tpu.core import config as cfg

    monkeypatch.setattr(visualize.cfg, "ViTConfig", lambda: VIT)
    monkeypatch.setattr(visualize.cfg, "MAEDecoderConfig", lambda: DEC)
    monkeypatch.setattr(visualize.cfg, "BertConfig", lambda: BERT)

    out_png = str(tmp_path / "heat.png")
    argv = ["visualize", "--image", str(img), "--text", "no pneumonia",
            "--checkpoint", ckpt, "--tokenizer", str(tok_json),
            "--output", out_png,
            "--save_original", str(tmp_path / "orig.png")]
    monkeypatch.setattr(sys, "argv", argv)
    # tiny model is 32px; patch the hardcoded 224 path by resizing later —
    # the CLI resizes to 224 then the model resizes to vit.img_size; works
    visualize.main()
    assert os.path.exists(out_png)
    arr = np.asarray(Image.open(out_png))
    assert arr.shape == (224, 224, 3)


def test_pretrain_cli_resume(toy_mimic, tmp_path, monkeypatch, capsys):
    """Orbax resume path: second invocation restores step/opt state and
    continues from the saved epoch (util/misc.py:315-338 parity)."""
    from ecamp_tpu.cli import pretrain
    from ecamp_tpu.core import config as cfg

    out = tmp_path / "out"
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

    base = ["pretrain", "--data_path", str(toy_mimic),
            "--batch_size", "8", "--max_epoch", "4",
            "--warmup_epochs", "1", "--input_size", "64",
            "--max_caption_length", "16", "--num_workers", "2",
            "--output_dir", str(out), "--no_bf16", "--print_freq", "1"]
    monkeypatch.setattr(sys, "argv", base + ["--epochs", "1"])
    pretrain.main()
    ckpt_dir = str(out / "ckpt")
    assert os.path.isdir(ckpt_dir)
    # resume for 2 more epochs
    monkeypatch.setattr(sys, "argv",
                        base + ["--epochs", "3", "--resume", ckpt_dir])
    pretrain.main()
    log = (out / "log.txt").read_text().strip().splitlines()
    epochs = [json.loads(l)["epoch"] for l in log]
    assert epochs == [0, 1, 2]  # run 1 wrote epoch 0; resume wrote 1,2


def test_encoder_resolution_input_skips_resize(monkeypatch):
    """The viz path feeds the image at encoder resolution and must reach
    the patch embed untouched — the reference viz forward has no resize
    (Visualization/module/model_ecamp.py:308-319). Inputs above encoder
    resolution still go through the bicubic downsample (model_ecamp.py:318)."""
    import jax
    import jax.numpy as jnp

    import ecamp_tpu.nn.mae as mae_mod
    from ecamp_tpu.core.config import BertConfig, MAEDecoderConfig, ViTConfig

    model = mae_mod.ECAMP(
        vit=ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=1,
                      num_heads=2),
        decoder=MAEDecoderConfig(embed_dim=16, depth=1, num_heads=2),
        bert=BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                        num_attention_heads=2, intermediate_size=64,
                        max_position_embeddings=8),
        sr_window=1)

    def batch(size):
        return {
            "image": jnp.zeros((1, size, size, 3)),
            "ids": jnp.zeros((1, 8), jnp.int32),
            "attention_mask": jnp.ones((1, 8), jnp.int32),
            "type_ids": jnp.zeros((1, 8), jnp.int32),
        }

    variables = model.init({"params": jax.random.PRNGKey(0)}, batch(32),
                           mask_ratio=0.0, deterministic=True)

    def boom(*a, **kw):
        raise AssertionError("resize_bicubic called for a no-op resize")

    monkeypatch.setattr(mae_mod, "resize_bicubic", boom)
    out = model.apply(variables, batch(32), mask_ratio=0.0,
                      deterministic=True, return_cross_probs=True)
    assert out["cross_attention"].shape == (1, 2, 8, 4)
    with pytest.raises(AssertionError, match="resize_bicubic"):
        model.apply(variables, batch(64), mask_ratio=0.0, deterministic=True)


def test_pretrain_cli_pth_resume_restores_optimizer(toy_mimic, tmp_path,
                                                    monkeypatch, capsys):
    """Reference-style .pth resume through the CLI restores AdamW moments
    and continues from epoch+1 (util/misc.py:331-338: optimizer+epoch are
    restored for the reference's own checkpoints)."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, os.path.dirname(__file__))
    from test_ecamp_import import BERT, DEC, VIT, _reference_state_dict

    from ecamp_tpu.ckpt.torch_import import _optimizer_param_order

    g = torch.Generator().manual_seed(4)
    sd = _reference_state_dict(g)
    order, n_nd, n_d = _optimizer_param_order(
        {k: v.numpy() for k, v in sd.items()})
    opt_sd = {"state": {}, "param_groups": [
        {"params": list(range(n_nd)), "weight_decay": 0.0},
        {"params": list(range(n_nd, n_nd + n_d)), "weight_decay": 0.05}]}
    for i, name in enumerate(order):
        opt_sd["state"][i] = {"step": torch.tensor(7.0),
                              "exp_avg": torch.full_like(sd[name], 0.25),
                              "exp_avg_sq": torch.full_like(sd[name], 0.5)}
    ckpt = str(tmp_path / "ECAMP_mid_run.pth")
    torch.save({"model": sd, "optimizer": opt_sd, "epoch": 0}, ckpt)

    from ecamp_tpu.cli import pretrain
    from ecamp_tpu.core import config as cfg

    tiny_kw = dict(vit=VIT, decoder=DEC, bert=BERT, sr_window=1,
                   max_caption_length=16)
    orig = cfg.PretrainConfig

    def tiny_config(**kw):
        merged = dict(tiny_kw)
        merged.update({k: v for k, v in kw.items() if k not in merged})
        return orig(**merged)

    monkeypatch.setattr(cfg, "PretrainConfig", tiny_config)
    monkeypatch.setattr(pretrain.cfg, "PretrainConfig", tiny_config)

    out = tmp_path / "out"
    argv = ["pretrain", "--data_path", str(toy_mimic),
            "--batch_size", "8", "--epochs", "2", "--max_epoch", "4",
            "--warmup_epochs", "1", "--input_size", "64",
            "--max_caption_length", "16", "--num_workers", "2",
            "--output_dir", str(out), "--no_bf16", "--print_freq", "1",
            "--resume", ckpt]
    monkeypatch.setattr(sys, "argv", argv)
    pretrain.main()
    printed = capsys.readouterr().out
    assert "restored AdamW moments" in printed
    assert "(torch step 7)" in printed
    # epoch 0 in the ckpt -> training resumed at epoch 1 -> ONE epoch ran
    log = (out / "log.txt").read_text().strip().splitlines()
    recs = [json.loads(l) for l in log]
    assert [r["epoch"] for r in recs] == [1]
    assert np.isfinite(recs[-1]["loss"])
