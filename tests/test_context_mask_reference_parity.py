"""Bit-exact parity of entity-context masking against the reference's own
`_context_mask` (pretrain_datasets.py:60-110), executed in place with
stubbed unavailable deps (ipdb/torchvision) and the same seeded RNG."""

import importlib.util
import os
import random
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_DS = "/root/reference/ECAMP/Pre-training/module/pretrain_datasets.py"
REF_TOK = "/root/reference/ECAMP/Pre-training/dataset/mimic_wordpiece.json"


@pytest.fixture(scope="module")
def ref_module():
    if not (os.path.exists(REF_DS) and os.path.exists(REF_TOK)):
        pytest.skip("reference tree unavailable")
    # stub modules the test environment lacks ONLY for the duration of the
    # import (a lingering fake torchvision breaks transformers' capability
    # probing in other tests); the loaded module keeps its own references.
    stubs = {}
    stubs["ipdb"] = types.ModuleType("ipdb")
    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    trf = types.ModuleType("torchvision.transforms.functional")
    trf.InterpolationMode = types.SimpleNamespace(BICUBIC=3)
    tr.functional = trf
    tv.transforms = tr
    stubs["torchvision"] = tv
    stubs["torchvision.transforms"] = tr
    stubs["torchvision.transforms.functional"] = trf
    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update({k: v for k, v in stubs.items()
                        if saved[k] is None})
    try:
        spec = importlib.util.spec_from_file_location("ref_pretrain_ds",
                                                      REF_DS)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, old in saved.items():
            if old is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = old
    return mod


class _SeededRNG:
    """random.Random facade so both sides consume one identical stream."""

    def __init__(self, seed):
        self._r = random.Random(seed)

    def random(self):
        return self._r.random()


def test_context_mask_bit_exact(ref_module):
    from ecamp_tpu.data.entity_masking import context_mask
    from ecamp_tpu.data.tokenizer import WordPieceTokenizer

    wp = WordPieceTokenizer.from_file(REF_TOK)
    idx2w = wp.ids_to_tokens

    texts = [
        "[CLS] there is no evidence of pneumothorax or pleural effusion.",
        "[CLS] mild cardiomegaly with pulmonary edema and atelectasis.",
        "[CLS] the lungs are well aerated. no focal consolidation.",
        "[CLS] unremarkable study without acute findings.",  # no entities
        "[CLS] interval improvement of the right hilar opacity.",
    ]
    # reference object: only idxtoword is used by _context_mask
    ds = object.__new__(ref_module.ContextBertDataset)
    ds.idxtoword = idx2w

    for seed, text in enumerate(texts):
        enc = wp.encode(text, max_length=32, pad_to=32)
        ids_t = torch.tensor(enc.ids.astype(np.int64)).unsqueeze(0)

        ref_module.random.seed(1234 + seed)
        ref_masked, ref_pos = ds._context_mask(ids_t)

        # random.seed(x) and random.Random(x) yield the same MT stream
        mine_masked, mine_pos = context_mask(enc.ids, idx2w,
                                             _SeededRNG(1234 + seed))
        assert mine_masked.tolist() == ref_masked[0].tolist(), text
        assert list(mine_pos) == list(ref_pos), text
