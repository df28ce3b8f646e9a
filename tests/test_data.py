"""Data layer tests: tokenizer parity vs the HF Rust tokenizer on the
reference asset, entity masking semantics, transforms, loader, datasets."""

import json
import os
import random
import time

import numpy as np
import pytest

TOKENIZER_JSON = "/root/reference/ECAMP/Pre-training/dataset/mimic_wordpiece.json"

SAMPLE_TEXTS = [
    "[CLS] There is no evidence of pneumothorax. Mild cardiomegaly noted.",
    "[CLS] the lungs are clear. no effusion, consolidation or edema seen.",
    "[CLS] Comparison made 2023-01-05; 5cm nodule in right hilar region!!",
    "[CLS] s/p CABG. Degenerative changes of the spine. IMPRESSION: none.",
    "[CLS] Fréquence cardiaque élevée, sinon RAS (accents test).",
]


@pytest.fixture(scope="module")
def wp():
    from ecamp_tpu.data.tokenizer import WordPieceTokenizer

    if not os.path.exists(TOKENIZER_JSON):
        pytest.skip("reference tokenizer asset unavailable")
    return WordPieceTokenizer.from_file(TOKENIZER_JSON)


def test_tokenizer_special_ids(wp):
    v = wp.get_vocab()
    assert v["[PAD]"] == 0 and v["[CLS]"] == 2 and v["[MASK]"] == 3
    assert v["."] == 16
    assert [v[t] for t in ["there", "is", "no", "evidence", "of"]] == \
        [219, 149, 152, 422, 158]


def test_tokenizer_parity_vs_hf(wp):
    tokenizers = pytest.importorskip("tokenizers")
    hf = tokenizers.Tokenizer.from_file(TOKENIZER_JSON)
    hf.enable_truncation(max_length=64)
    hf.enable_padding(length=64)
    for text in SAMPLE_TEXTS:
        ref = hf.encode(text)
        enc = wp.encode(text, max_length=64, pad_to=64)
        assert enc.ids.tolist() == ref.ids, (text, enc.tokens, ref.tokens)
        assert enc.attention_mask.tolist() == ref.attention_mask


def test_context_mask_semantics(wp):
    from ecamp_tpu.data.entity_masking import context_mask

    enc = wp.encode("[CLS] there is severe cardiomegaly today.",
                    max_length=16, pad_to=16)
    idx2w = wp.ids_to_tokens
    # rng that always masks (random() -> 0.0)
    class Always:
        def random(self):
            return 0.0

    masked, mask_pos = context_mask(enc.ids, idx2w, Always())
    v = wp.get_vocab()
    ent = enc.ids.tolist().index(v["cardiomegaly"])
    # entity masked by the 75% pass; context positions recorded
    assert masked[ent] == 3
    assert (ent - 1) in mask_pos and (ent - 2) in mask_pos
    # context positions themselves NOT masked (dead-branch parity) unless
    # they were '##' continuations of a masked token
    assert masked[0] == enc.ids[0]  # [CLS] untouched (loop starts at 1)
    # pads (beyond sentence) untouched
    assert masked[-1] == 0

    class Never:
        def random(self):
            return 1.0

    masked2, _ = context_mask(enc.ids, idx2w, Never())
    assert masked2.tolist() == enc.ids.tolist()


def test_template_weights_and_rebalance(wp):
    from ecamp_tpu.data.entity_masking import (
        rebalance_weights, template_weights)

    enc = wp.encode("[CLS] there is no evidence of pneumothorax. "
                    "there is no effusion.", max_length=32, pad_to=32)
    w, dim_pos, cnt = template_weights(enc.ids, 32)
    assert cnt == 8  # 5 + 3
    assert all(w[p] == pytest.approx(0.05) for p in dim_pos)
    # no masked context -> global expansion branch
    w2 = rebalance_weights(w, [], dim_pos, cnt, 32)
    expand = 32 / (32 - 0.95 * 8)
    assert w2[dim_pos[0]] == pytest.approx(0.05 * expand)
    assert w2[20] == pytest.approx(1.0 * expand)
    # masked-context branch
    mask_pos = [dim_pos[0], 20]
    w3 = rebalance_weights(w, mask_pos, dim_pos, cnt, 32)
    exp3 = (0.95 * (cnt - 1) + 2) / (2 - 0.95 * 1)
    assert w3[20] == pytest.approx(exp3)


def test_build_text_example(wp):
    from ecamp_tpu.data.entity_masking import build_text_example

    rng = random.Random(0)
    out = build_text_example("the lungs are clear. no pneumothorax.",
                             "llm says: heart size normal.", wp, rng,
                             max_len=64)
    assert out["ids"].shape == (64,)
    assert out["labels"][0] == 2  # [CLS]
    assert np.all(out["weights"] >= 0)
    # masked ids differ from labels somewhere (something got masked)
    assert (out["ids"] != out["labels"]).any()
    # pads identical in both
    pad_at = np.where(out["attention_mask"] == 0)[0]
    assert np.all(out["ids"][pad_at] == 0)


def test_rle_roundtrip():
    from ecamp_tpu.data.datasets import rle2mask

    # simple RLE: skip 3, fill 2 (column-major + transpose convention)
    m = rle2mask("3 2", 8, 8)
    assert m.sum() == 2
    flat = m.T.reshape(-1)
    assert flat[3] == 1 and flat[4] == 1 and flat[5] == 0


def test_resize_pad_square():
    from ecamp_tpu.data.datasets import resize_pad_square

    arr = np.ones((100, 50), np.float32)
    out = resize_pad_square(arr, 64)
    assert out.shape == (64, 64)
    assert out[:, :15].sum() == 0 and out[:, 50:].sum() == 0  # padded sides


def test_shift_scale_rotate_mask_alignment():
    from ecamp_tpu.data.datasets import shift_scale_rotate

    rng = random.Random(1)
    img = np.zeros((64, 64, 3), np.float32)
    img[20:40, 20:40] = 1.0
    mask = np.zeros((64, 64), np.float32)
    mask[20:40, 20:40] = 1.0
    img2, mask2 = shift_scale_rotate(img, mask, rng, p=1.0)
    # transformed mask overlaps transformed image region heavily
    inter = ((img2[..., 0] > 0.5) & (mask2 > 0.5)).sum()
    assert inter > 0.7 * (mask2 > 0.5).sum()


def test_loader_sharding_and_shuffle():
    from ecamp_tpu.data.loader import DataLoader

    class Toy:
        def __len__(self):
            return 103

        def __getitem__(self, i):
            return {"x": np.asarray([i], np.int32)}

    dl = DataLoader(Toy(), batch_size=8, shuffle=True, seed=1, num_workers=2)
    seen = [b["x"].ravel() for b in dl]
    assert len(seen) == 12  # 96 samples, drop_last
    flat = np.concatenate(seen)
    assert len(set(flat.tolist())) == 96
    # two processes see disjoint samples
    d0 = DataLoader(Toy(), batch_size=8, shuffle=True, seed=1,
                    process_index=0, process_count=2, num_workers=2)
    d1 = DataLoader(Toy(), batch_size=8, shuffle=True, seed=1,
                    process_index=1, process_count=2, num_workers=2)
    s0 = np.concatenate([b["x"].ravel() for b in d0])
    s1 = np.concatenate([b["x"].ravel() for b in d1])
    assert set(s0).isdisjoint(set(s1))


def test_classification_list_dataset(tmp_path):
    from ecamp_tpu.data.datasets import ClassificationListDataset
    from ecamp_tpu.data.transforms import TrainTransform
    from PIL import Image

    task_dir = tmp_path / "lists" / "toy"
    task_dir.mkdir(parents=True)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    lines = []
    for i in range(4):
        name = f"img_{i}.png"
        Image.new("RGB", (96, 80), color=(i * 30, 100, 50)).save(img_dir / name)
        lines.append(f"{name} {i % 2} {1 - i % 2} 0\n")
    (task_dir / "train_list.txt").write_text("".join(lines))
    ds = ClassificationListDataset(str(tmp_path / "lists"), str(img_dir),
                                   "toy", "train", "100",
                                   TrainTransform(32, 0.4722, 0.3028, seed=0))
    assert len(ds) == 4
    s = ds[1]
    assert s["image"].shape == (32, 32, 3)
    assert s["label"].tolist() == [1.0, 0.0, 0.0]
    # grayscale replication: channels identical
    assert np.allclose(s["image"][..., 0], s["image"][..., 1])


def test_train_transform_load_matches_call_rng_stream(tmp_path):
    """TrainTransform.load(path) must consume the SAME rng draws as
    __call__(img) (crop box, then flip) so epoch determinism is unchanged,
    and produce the same pixels for non-drafted sources."""
    import random

    from PIL import Image

    from ecamp_tpu.data.transforms import TrainTransform

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (96, 80), np.uint8)
    p = str(tmp_path / "x.png")  # PNG: no JPEG draft path
    Image.fromarray(arr, "L").save(p)

    t1 = TrainTransform(32, 0.47, 0.3, scale=(0.2, 1.0), seed=9,
                        interpolation="bicubic")
    t2 = TrainTransform(32, 0.47, 0.3, scale=(0.2, 1.0), seed=9,
                        interpolation="bicubic")
    for _ in range(4):
        a = t1.load(p)
        with open(p, "rb") as f:
            img = Image.open(f)
            img.load()
        b = t2(img.convert("RGB"))
        assert a.shape == (32, 32, 3)
        np.testing.assert_allclose(a, b, atol=1.5 / 255 / 0.3)
    # streams stayed aligned across iterations
    assert t1.rng.random() == t2.rng.random()


def test_train_transform_load_draft_quality(tmp_path):
    """JPEG draft decode stays within a few gray levels of the exact
    full-resolution path and never upsamples the sampled crop."""
    from PIL import Image

    from ecamp_tpu.data.transforms import TrainTransform

    rng = np.random.default_rng(1)
    big = np.clip(np.add.outer(np.linspace(0, 200, 1200),
                               np.linspace(0, 55, 1000))
                  + rng.normal(0, 8, (1200, 1000)), 0, 255).astype(np.uint8)
    p = str(tmp_path / "big.jpg")
    Image.fromarray(big, "L").save(p, "JPEG", quality=95)
    a = TrainTransform(448, 0.4721, 0.3037, scale=(0.5, 1.0), seed=3,
                       interpolation="bicubic", draft=True).load(p)
    b = TrainTransform(448, 0.4721, 0.3037, scale=(0.5, 1.0), seed=3,
                       interpolation="bicubic", draft=False).load(p)
    assert np.abs(a - b).max() < 6.0 / 255 / 0.3037  # few gray levels
    assert np.abs(a - b).mean() < 1.0 / 255 / 0.3037


def test_prefetch_to_device_order_and_sharding():
    import jax

    from ecamp_tpu.core.mesh import cpu_test_mesh, prefetch_to_device

    mesh = cpu_test_mesh(4)
    batches = [{"x": np.full((8, 3), i, np.float32)} for i in range(5)]
    out = list(prefetch_to_device(iter(batches), mesh, size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert float(b["x"][0, 0]) == i
        # leading dim sharded over the data axis
        assert len(b["x"].sharding.device_set) == 4


def test_pretrain_dataset_bf16_images(tmp_path):
    """image_dtype=bfloat16 halves transfer bytes and is bit-identical
    downstream (the model casts to bf16 first regardless)."""
    import ml_dtypes
    import shutil

    from PIL import Image

    from ecamp_tpu.data.datasets import PretrainReportDataset

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 64), np.uint8)
    ip = str(tmp_path / "a.jpg")
    Image.fromarray(img, "L").save(ip, "JPEG")
    with open(tmp_path / "mimic-cxr-2.0.0-entity-llm.csv", "w") as f:
        f.write("img_path,report,llm_output\n")
        f.write(f"{ip},no effusion. heart normal.,impression normal.\n")
    with open(tmp_path / "mimic-cxr-2.0.0-attn-label.csv", "w") as f:
        f.write("label_i,label_j\n1,1\n")
    from ecamp_tpu.data.assets import tokenizer_path

    shutil.copy(tokenizer_path(), tmp_path / "mimic_wordpiece.json")

    ds32 = PretrainReportDataset(str(tmp_path), img_size=32, seed=0)
    ds16 = PretrainReportDataset(str(tmp_path), img_size=32, seed=0,
                                 image_dtype=ml_dtypes.bfloat16)
    a = ds32[0]["image"]
    b = ds16[0]["image"]
    assert b.dtype == ml_dtypes.bfloat16
    np.testing.assert_allclose(a.astype(ml_dtypes.bfloat16).astype(np.float32),
                               b.astype(np.float32))


class _BoomDataset:
    def __len__(self):
        return 16

    def __getitem__(self, i):
        if i == 5:
            raise OSError("corrupt image")
        import numpy as np

        return {"x": np.zeros((2,), np.float32)}


def test_loader_worker_exception_propagates():
    """A failing sample must raise in the consumer, not hang the epoch."""
    from ecamp_tpu.data.loader import DataLoader

    loader = DataLoader(_BoomDataset(), batch_size=4, shuffle=False,
                        num_workers=2)
    with pytest.raises(RuntimeError, match="DataLoader worker failed"):
        for _ in loader:
            pass


class _TinyDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        import numpy as np

        return {"i": np.asarray([i], np.int64)}


def test_loader_multiprocess_equal_batch_counts():
    """DistributedSampler semantics: every process yields the same number
    of batches (wrapped padding), and __len__ matches the iterator."""
    from ecamp_tpu.data.loader import DataLoader

    counts, seen = [], []
    for pi in (0, 1):
        loader = DataLoader(_TinyDataset(31), batch_size=8, shuffle=False,
                            num_workers=1, process_index=pi, process_count=2)
        batches = list(loader)
        counts.append(len(batches))
        assert len(loader) == len(batches)
        seen.extend(int(b["i"][j, 0]) for b in batches
                    for j in range(b["i"].shape[0]))
    assert counts == [2, 2]
    # all 31 samples covered at least once (one wraps)
    assert set(range(31)) <= set(seen)


def test_multilabel_auc_single_class_column_is_nan():
    from ecamp_tpu.train.eval_metrics import multilabel_auc

    scores = np.array([[0.2, 0.8], [0.7, 0.3], [0.4, 0.9]])
    labels = np.array([[0, 1], [0, 0], [0, 1]])  # col 0 has no positives
    aucs = multilabel_auc(scores, labels)
    assert np.isnan(aucs[0]) and 0.0 <= aucs[1] <= 1.0


class _IdxDataset:
    """Deterministic toy dataset for loader-order tests."""

    def __init__(self, n, delay_on=()):
        self.n = n
        self.delay_on = set(delay_on)
        self.reseeds = []

    def reseed(self, epoch, worker_id):
        self.reseeds.append((epoch, worker_id))

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if i in self.delay_on:
            import time

            time.sleep(0.05)
        return {"x": np.array([i], np.int64)}


def test_mp_loader_matches_thread_order_and_content():
    """mp_workers>0: forked worker processes build whole batches; the
    consumer restores deterministic batch order, so index streams equal
    the thread loader's exactly (slow early batches included)."""
    from ecamp_tpu.data.loader import DataLoader

    ds = _IdxDataset(37, delay_on={0, 1, 2, 3})
    kw = dict(batch_size=5, shuffle=True, seed=3, drop_last=True)
    ref = [b["x"].ravel().tolist()
           for b in DataLoader(ds, num_workers=2, **kw)]
    got = [b["x"].ravel().tolist()
           for b in DataLoader(ds, mp_workers=3, **kw)]
    assert got == ref and len(got) == 7


class _BadDataset(_IdxDataset):
    """Module-level (spawn-picklable) dataset that fails on one index."""

    def __getitem__(self, i):
        if i == 7:
            raise ValueError("boom7")
        return super().__getitem__(i)


def test_mp_loader_worker_failure_propagates():
    from ecamp_tpu.data.loader import DataLoader

    loader = DataLoader(_BadDataset(16), batch_size=4, shuffle=False,
                        mp_workers=2)
    with pytest.raises(RuntimeError, match="boom7"):
        list(loader)


def test_mp_loader_reseed_protocol(tmp_path):
    """Each forked worker reseeds per (epoch, worker); two iterations of
    the same epoch produce IDENTICAL batches (preemption-resume replay),
    different epochs differ."""
    import csv
    import shutil

    from PIL import Image

    from ecamp_tpu.data.datasets import PretrainReportDataset
    from ecamp_tpu.data.loader import DataLoader

    root = str(tmp_path)
    rng = np.random.default_rng(0)
    with open(os.path.join(root, "mimic-cxr-2.0.0-entity-llm.csv"), "w",
              newline="") as f:
        w = csv.writer(f)
        w.writerow(["img_path", "report", "llm_output"])
        for i in range(8):
            p = os.path.join(root, f"i{i}.png")
            Image.fromarray(rng.integers(0, 255, (64, 64), np.uint8),
                            "L").save(p)
            w.writerow([p, "lungs are clear. no pneumothorax.",
                        "no acute disease."])
    with open(os.path.join(root, "mimic-cxr-2.0.0-attn-label.csv"), "w",
              newline="") as f:
        w = csv.writer(f)
        w.writerow(["label_i", "label_j"])
        for _ in range(8):
            w.writerow([1, 1])
    shutil.copy(os.path.join(os.path.dirname(__file__), "..", "ecamp_tpu",
                             "assets", "mimic_wordpiece.json"), root)
    ds = PretrainReportDataset(root, img_size=32, max_caption_length=16,
                               seed=0)
    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=0,
                        mp_workers=2)
    loader.set_epoch(1)
    a = [{k: np.asarray(v) for k, v in b.items()} for b in loader]
    b = [{k: np.asarray(v) for k, v in b.items()} for b in loader]
    assert len(a) == len(b) == 2
    for ba, bb in zip(a, b):
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k], err_msg=k)
    loader.set_epoch(2)
    c = list(loader)
    assert not all(
        np.array_equal(np.asarray(a[i]["image"]),
                       np.asarray(c[i]["image"])) for i in range(2))


class _JitterRngDataset:
    """Stateful-RNG dataset with scheduling jitter: each fetch sleeps a
    non-deterministic duration (os.urandom, outside any seeded stream)
    and then draws from self.rng. Under the pre-fix thread pool the draw
    order followed thread timing, so same-seed iterations diverged —
    the failure the round-5 burn-in's phase-3 bitwise compare caught."""

    def __init__(self, n, seed=0):
        self.n = n
        self.seed = seed
        self.rng = random.Random(seed)

    def reseed(self, epoch, worker_id):
        base = (self.seed * 1_000_003 + epoch) * 1_000_003 + worker_id
        self.rng = random.Random(base)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        time.sleep(os.urandom(1)[0] / 10000.0)  # 0-25 ms, scheduler noise
        return {"x": np.array([i], np.int64),
                "r": np.array([self.rng.random()], np.float64)}


def test_thread_loader_rng_deterministic_under_scheduling():
    """Thread mode must give every worker its own per-(epoch, worker)
    stream (the `reseed` protocol), making augmentation draws a pure
    function of (seed, epoch, K, batch index) — identical run-to-run
    despite timing jitter, and identical to mp mode at equal K."""
    from ecamp_tpu.data.loader import DataLoader

    kw = dict(batch_size=5, shuffle=True, seed=7, drop_last=True)
    runs = []
    for _ in range(2):
        loader = DataLoader(_JitterRngDataset(30), num_workers=3, **kw)
        loader.set_epoch(4)
        runs.append([(b["x"].ravel().tolist(), b["r"].ravel().tolist())
                     for b in loader])
    assert runs[0] == runs[1] and len(runs[0]) == 6

    mp_loader = DataLoader(_JitterRngDataset(30), mp_workers=3,
                           mp_context="fork", **kw)
    mp_loader.set_epoch(4)
    got = [(b["x"].ravel().tolist(), b["r"].ravel().tolist())
           for b in mp_loader]
    assert got == runs[0]


def test_thread_loader_reseeds_per_worker():
    """Each thread worker reseeds its own dataset view with (epoch, wid);
    the original dataset object's RNG is never consumed."""
    from ecamp_tpu.data.loader import DataLoader

    ds = _IdxDataset(24)
    loader = DataLoader(ds, batch_size=4, shuffle=False, num_workers=3)
    loader.set_epoch(5)
    list(loader)
    # shallow worker copies share the `reseeds` list with the original
    assert sorted(ds.reseeds) == [(5, 0), (5, 1), (5, 2)]
