"""Entity-centered context masking + template down-weighting (host-side).

Faithful port of the reference's per-sample text pipeline:
  * `_context_mask` (pretrain_datasets.py:60-110): a stateful sequential
    token walk — '##'-continuation propagation of the [MASK]=3 state,
    2-token context window before each entity ('.'=16 excluded), 75%/70%
    random masking depending on whether any entity exists, then a second
    75% pass over entity positions. Quirks preserved: the context-masking
    branch is dead (its condition re-tests the ENTITY token, :93) so
    context tokens are only recorded, never force-masked.
  * "there is no (evidence of)" template scan -> weight 0.05
    (:143-170) and the exact weight-rebalance algebra (:174-184).

Runs in the async host feeder; the reference ran the same logic in
DataLoader workers.
"""

from __future__ import annotations

import random
from typing import Dict, List, Sequence, Tuple

import numpy as np

ENTITIES = frozenset([
    'abnormality', 'abscess', 'aerate', 'aorta', 'atelectasis',
    'bronchiectasis', 'calcification', 'cardiomediastinal', 'cardiomegaly',
    'catheter', 'chf', 'collapse', 'congestion', 'consolidation', 'contour',
    'COPD', 'deformity', 'dilation', 'distention', 'edema', 'effusion',
    'embolism', 'emphysema', 'engorgement', 'fibrosis', 'fracture',
    'granuloma', 'hernia', 'hilar', 'hyperinflate', 'hemidiaphragm',
    'infiltrate', 'mass', 'nodule', 'obscure', 'opacity', 'perihilar',
    'pneumonia', 'pneumothorax', 'sarcoidosis', 'silhouette', 'thickening',
    'tuberculosis', 'vasculature',
])  # pretrain_datasets.py:17-22

TEMPLATE_FULL = (219, 149, 152, 422, 158)  # "there is no evidence of"
TEMPLATE_SHORT = (219, 149, 152)           # "there is no"
MASK_ID = 3
PAD_ID = 0
PERIOD_ID = 16
DIMINISH_WEIGHT = 0.05


def context_mask(ids: np.ndarray, idx_to_word: Dict[int, str],
                 rng: random.Random,
                 entities: frozenset = ENTITIES,
                 mask_id: int = MASK_ID) -> Tuple[np.ndarray, List[int]]:
    """Entity-centered masking of a 1-D id sequence.

    Returns (masked_ids, mask_pos) where mask_pos are the entity-context
    positions (used by the weight rebalance, not force-masked — see module
    docstring)."""
    ids = np.asarray(ids)
    masked = ids.copy()
    L = ids.shape[0]
    entity_pos: List[int] = []
    mask_pos: List[int] = []

    def word(i: int, arr) -> str:
        return idx_to_word.get(int(arr[i]), "")

    entity_exist = any(word(i, masked) in entities for i in range(1, L - 1))

    for i in range(1, L - 1):
        if masked[i] == PAD_ID:
            break
        w = word(i, masked)
        if masked[i - 1] == mask_id and w.startswith("##"):
            masked[i] = mask_id
            continue
        if masked[i - 1] != mask_id and w.startswith("##"):
            continue
        if w in entities:
            entity_pos.append(i)
            for j in range(1, 3):
                if i - j <= 0:
                    break
                if ids[i - j] != PERIOD_ID:
                    if i - j not in mask_pos:
                        mask_pos.append(i - j)
                    # reference's context-force-mask branch is dead code
                    # (condition re-tests the entity token itself,
                    # pretrain_datasets.py:93); kept omitted for parity
        prob = rng.random()
        if not entity_exist:
            if prob < 0.75:
                masked[i] = mask_id
        else:
            if prob < 0.7 and i not in entity_pos and i not in mask_pos:
                masked[i] = mask_id

    for i in range(1, L - 1):
        if i in entity_pos and rng.random() < 0.75:
            masked[i] = mask_id

    return masked, mask_pos


def template_weights(ids: np.ndarray, max_len: int
                     ) -> Tuple[np.ndarray, List[int], int]:
    """Down-weight negated-finding template tokens to 0.05
    (pretrain_datasets.py:143-170). Returns (weights, diminish_pos, count)."""
    weights = np.ones((max_len,), dtype=np.float32)
    diminish_pos: List[int] = []
    cnt = 0
    i = 0
    L = len(ids)
    while i < L - 4:
        if tuple(int(x) for x in ids[i:i + 5]) == TEMPLATE_FULL:
            weights[i:i + 5] = DIMINISH_WEIGHT
            diminish_pos.extend(range(i, i + 5))
            cnt += 5
            i += 5
        elif tuple(int(x) for x in ids[i:i + 3]) == TEMPLATE_SHORT:
            weights[i:i + 3] = DIMINISH_WEIGHT
            diminish_pos.extend(range(i, i + 3))
            cnt += 3
            i += 3
        else:
            i += 1
    return weights, diminish_pos, cnt


def rebalance_weights(weights: np.ndarray, mask_pos: Sequence[int],
                      diminish_pos: Sequence[int], diminish_cnt: int,
                      max_len: int) -> np.ndarray:
    """Exact rebalance algebra (pretrain_datasets.py:174-184)."""
    weights = weights.copy()
    mask_diminish = [p for p in mask_pos if p in diminish_pos]
    len_dm = len(mask_diminish)
    mask_cnt = len(mask_pos)
    if mask_cnt > 0 and diminish_cnt > 0:
        expand = (0.95 * (diminish_cnt - len_dm) + mask_cnt) / \
            (mask_cnt - 0.95 * len_dm)
        for p in mask_pos:
            weights[p] = weights[p] * expand
    elif diminish_cnt > 0:
        expand = max_len / (max_len - 0.95 * diminish_cnt)
        weights = weights * expand
    return weights


def build_text_example(report: str, llm_output: str, tokenizer, rng: random.Random,
                       max_len: int = 256) -> Dict[str, np.ndarray]:
    """Full text-side sample prep (pretrain_datasets.py:116-191): LLM
    sentence insertion (p=0.8 at a random sentence boundary), tokenize,
    template weighting, entity-context masking, weight rebalance."""
    sentences = report.split(".")
    if rng.random() < 0.8:
        loc = rng.randint(0, len(sentences))
        sent = "".join(s + "." for s in sentences[:loc])
        sent += llm_output
        sent += "".join(s + "." for s in sentences[loc:])
    else:
        sent = report
    sent = sent.replace("..", ".")
    sent = "[CLS] " + sent

    enc = tokenizer.encode(sent, max_length=max_len, pad_to=max_len)
    idx_to_word = getattr(tokenizer, "ids_to_tokens", None)
    if idx_to_word is None:
        idx_to_word = {v: k for k, v in tokenizer.get_vocab().items()}

    weights, diminish_pos, diminish_cnt = template_weights(enc.ids, max_len)
    masked_ids, mask_pos = context_mask(enc.ids, idx_to_word, rng)
    weights = rebalance_weights(weights, mask_pos, diminish_pos,
                                diminish_cnt, max_len)
    return {
        "ids": masked_ids.astype(np.int32),
        "labels": enc.ids.astype(np.int32),
        "attention_mask": enc.attention_mask,
        "type_ids": enc.type_ids,
        "weights": weights,
    }
