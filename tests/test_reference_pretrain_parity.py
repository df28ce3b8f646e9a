"""End-to-end PRE-TRAINING loop parity vs the reference (VERDICT r2 #1
extended to the flagship path — the last loop without in-place evidence).

Drives the reference's own main_pretrain.py train_one_epoch (with its
ContextBertDataset, ECAMP 3-loss model, timm-split AdamW param groups,
NativeScaler, per-iteration epoch-cosine LR — all unmodified, via
tests/ref_harness stubs + hf_compat.OldBertSelfAttention) on a synthetic
MIMIC-layout corpus at the REAL 448/224 geometry with tiny dims, and our
`ecamp-pretrain` CLI on the SAME corpus from the SAME torch init
(shared .pth through the importer) with identical hyperparameters
(AdamW (0.9,0.95) wd 0.05 timm no-decay split, warmup 1 epoch then
cosine to max_epoch=4, mask_ratio 0.75, batch 4, fp32).

RNG streams differ (crop/flip/entity-mask draws), so the claim is
trajectory-level: from a shared init, per-epoch average mim/res/mlm
losses must start in the same place and descend together within
tolerances. Epoch-0 averages in particular are dominated by the shared
init, so they bound model-forward/loss/data-pipeline parity directly.
"""

import json
import os
import shutil
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

TINY = dict(embed_dim=64, depth=2, num_heads=4,
            decoder_embed_dim=64, decoder_depth=1, decoder_num_heads=4,
            bert_hidden=64, bert_layers=2, bert_heads=4,
            bert_intermediate=128)
# batch 8: the test conftest forces an 8-virtual-device CPU mesh, and the
# sharded train step needs batch % devices == 0
HP = dict(batch_size=8, epochs=3, max_epoch=4, warmup_epochs=1.0,
          lr=2e-3, weight_decay=0.05, max_caption_length=128, seed=42)
N_IMAGES = 32

REPORTS = [
    "the lungs are clear without consolidation. heart size is normal.",
    "there is no evidence of pneumonia. the cardiomediastinal "
    "silhouette is stable.",
    "mild cardiomegaly with small bilateral effusion. no pneumothorax.",
    "patchy opacity in the right lower lobe concerning for pneumonia.",
]
LLM_OUT = [
    "no acute cardiopulmonary abnormality.",
    "there is no focal consolidation or edema.",
    "stable mild cardiomegaly without congestion.",
    "right basilar opacity may reflect atelectasis.",
]


@pytest.fixture(scope="module")
def mimic_corpus(tmp_path_factory):
    """Synthetic 512px chest-film-like corpus in the exact MIMIC CSV
    layout both sides read (mimic-cxr-2.0.0-entity-llm.csv +
    attn-label.csv + the REAL shipped 30k wordpiece vocab), with
    learnable structure: smooth vertical luminance + a bright gaussian
    blob (images) and 4 recurring radiology sentences rich in entity
    words (text)."""
    import pandas as pd
    from PIL import Image

    root = tmp_path_factory.mktemp("pre_parity")
    shutil.copy(
        os.path.join(os.path.dirname(__file__), "..", "ecamp_tpu",
                     "assets", "mimic_wordpiece.json"),
        root / "mimic_wordpiece.json")
    rng = np.random.default_rng(11)
    rows = []
    for i in range(N_IMAGES):
        y, x = np.mgrid[0:512, 0:512]
        base = 60 + 90 * np.sin(y / 512 * np.pi)
        cx, cy = rng.integers(128, 384, 2)
        disk = 120 * np.exp(-(((x - cx) ** 2 + (y - cy) ** 2)
                              / (2 * 70.0 ** 2)))
        img = np.clip(base + disk + rng.normal(0, 6, (512, 512)),
                      0, 255).astype(np.uint8)
        name = str(root / f"img_{i}.png")
        Image.fromarray(img).convert("RGB").save(name)
        rows.append({"img_path": name, "report": REPORTS[i % 4],
                     "llm_output": LLM_OUT[i % 4]})
    pd.DataFrame(rows).to_csv(root / "mimic-cxr-2.0.0-entity-llm.csv",
                              index=False)
    pd.DataFrame({
        "label_i": [int(v) for v in rng.integers(0, 3, N_IMAGES)],
        "label_j": [int(v) for v in rng.integers(0, 3, N_IMAGES)],
    }).to_csv(root / "mimic-cxr-2.0.0-attn-label.csv", index=False)
    return root


@pytest.fixture(scope="module")
def reference_result(mimic_corpus):
    from tests.ref_harness.driver import run_reference_pretrain

    return run_reference_pretrain(
        str(mimic_corpus), init_out=str(mimic_corpus / "shared_init.pth"),
        **TINY, **HP)


@pytest.fixture(scope="module")
def jax_result(mimic_corpus, reference_result):
    # depends on reference_result for the shared_init.pth it exports
    from ecamp_tpu.cli import pretrain
    from ecamp_tpu.core import config as cfg

    out = mimic_corpus / "jax_out"
    argv = ["pretrain", "--data_path", str(mimic_corpus),
            "--batch_size", str(HP["batch_size"]),
            "--epochs", str(HP["epochs"]),
            "--max_epoch", str(HP["max_epoch"]),
            "--warmup_epochs", str(HP["warmup_epochs"]),
            "--lr", str(HP["lr"]),
            "--weight_decay", str(HP["weight_decay"]),
            "--input_size", "448",
            "--max_caption_length", str(HP["max_caption_length"]),
            "--seed", str(HP["seed"]), "--num_workers", "0",
            "--output_dir", str(out), "--no_bf16", "--print_freq", "4",
            "--resume", str(mimic_corpus / "shared_init.pth")]
    tiny_kw = dict(
        vit=cfg.ViTConfig(img_size=224, patch_size=16,
                          embed_dim=TINY["embed_dim"],
                          depth=TINY["depth"],
                          num_heads=TINY["num_heads"]),
        decoder=cfg.MAEDecoderConfig(embed_dim=TINY["decoder_embed_dim"],
                                     depth=TINY["decoder_depth"],
                                     num_heads=TINY["decoder_num_heads"]),
        bert=cfg.BertConfig(hidden_size=TINY["bert_hidden"],
                            num_hidden_layers=TINY["bert_layers"],
                            num_attention_heads=TINY["bert_heads"],
                            intermediate_size=TINY["bert_intermediate"]),
        max_caption_length=HP["max_caption_length"])
    orig_cfg = cfg.PretrainConfig

    def tiny_config(**kw):
        merged = dict(tiny_kw)
        merged.update({k: v for k, v in kw.items() if k not in merged})
        return orig_cfg(**merged)

    old_argv = sys.argv
    cfg.PretrainConfig = tiny_config
    pretrain.cfg.PretrainConfig = tiny_config
    sys.argv = argv
    try:
        pretrain.main()
    finally:
        sys.argv = old_argv
        cfg.PretrainConfig = orig_cfg
        pretrain.cfg.PretrainConfig = orig_cfg
    epochs = [json.loads(ln) for ln in
              (out / "log.txt").read_text().splitlines()]
    return {"epochs": epochs}


def test_shared_init_lands_in_jax_params(mimic_corpus, reference_result):
    """The exported torch init imports 1:1 into our pretrain params."""
    import jax

    from ecamp_tpu.ckpt.torch_import import import_ecamp_pretrain
    from ecamp_tpu.core import config as cfg
    from ecamp_tpu.train.pretrain import PretrainTask

    pconf = cfg.PretrainConfig(
        vit=cfg.ViTConfig(img_size=224, patch_size=16,
                          embed_dim=TINY["embed_dim"], depth=TINY["depth"],
                          num_heads=TINY["num_heads"]),
        decoder=cfg.MAEDecoderConfig(embed_dim=TINY["decoder_embed_dim"],
                                     depth=TINY["decoder_depth"],
                                     num_heads=TINY["decoder_num_heads"]),
        bert=cfg.BertConfig(hidden_size=TINY["bert_hidden"],
                            num_hidden_layers=TINY["bert_layers"],
                            num_attention_heads=TINY["bert_heads"],
                            intermediate_size=TINY["bert_intermediate"]),
        data=cfg.DataConfig(img_size=448, batch_size=2), bf16=False,
        max_caption_length=HP["max_caption_length"])
    task = PretrainTask(pconf, steps_per_epoch=8)
    rng = jax.random.PRNGKey(0)
    variables = task.model.init(
        {"params": rng, "masking": jax.random.fold_in(rng, 1)},
        task.fake_batch(2), mask_ratio=pconf.mask_ratio,
        deterministic=True)
    loaded_vars, loaded, skipped = import_ecamp_pretrain(
        variables, str(mimic_corpus / "shared_init.pth"))
    assert len(loaded) > 40, (len(loaded), skipped)
    ref_sd = torch.load(str(mimic_corpus / "shared_init.pth"),
                        weights_only=True)["model"]
    flat = jax.tree_util.tree_flatten_with_path(loaded_vars["params"])[0]
    cls_leaves = [v for path, v in flat
                  if "cls_token" in jax.tree_util.keystr(path)]
    assert cls_leaves, [jax.tree_util.keystr(p) for p, _ in flat[:10]]
    np.testing.assert_allclose(
        np.asarray(cls_leaves[0]).ravel(),
        ref_sd["cls_token"].numpy().ravel(), rtol=1e-6)


def test_epoch0_losses_match_from_shared_init(reference_result, jax_result):
    """Epoch-0 averages are dominated by the shared init: the two
    frameworks' mim/res/mlm must agree within RNG-of-the-masking noise.
    (Measured on this corpus: mlm 10.015 vs 10.023, mim 0.412 vs 0.396,
    res 0.306 vs 0.295.)"""
    ref = reference_result["epochs"][0]
    jx = jax_result["epochs"][0]
    print("ref e0:", ref, "\njax e0:", jx)
    assert abs(ref["mlm_loss"] - jx["mlm_loss"]) < 0.3, (ref, jx)
    for k in ("mim_loss", "res_loss"):
        assert 0.7 < jx[k] / ref[k] < 1.4, (k, ref, jx)


def test_applied_lr_schedule_identical(reference_result, jax_result):
    """Both sides log the per-iteration epoch-cosine LR they actually
    applied (reference: lr_sched.adjust_learning_rate; ours rescaled the
    same way) — epoch averages must agree to float precision."""
    for ref, jx in zip(reference_result["epochs"], jax_result["epochs"]):
        assert abs(ref["lr"] - jx["lr"]) < 1e-6, (ref, jx)


def test_all_losses_descend_both_sides(reference_result, jax_result):
    for side in (reference_result, jax_result):
        first, last = side["epochs"][0], side["epochs"][-1]
        for k in ("mim_loss", "res_loss", "mlm_loss"):
            assert last[k] < first[k], (k, side["epochs"])


def test_final_losses_within_tolerance(reference_result, jax_result):
    ref = reference_result["epochs"][-1]
    jx = jax_result["epochs"][-1]
    print("ref final:", ref, "\njax final:", jx)
    assert abs(ref["mlm_loss"] - jx["mlm_loss"]) < 0.6, (ref, jx)
    for k in ("mim_loss", "res_loss"):
        assert 0.55 < jx[k] / ref[k] < 1.8, (k, ref, jx)
