"""Map reference PyTorch checkpoints onto flax parameter trees.

Implements all four key-mapping conventions of the reference (SURVEY §5.4):
  1. pretrain partial key-intersection resume / MAE-init
     (util/misc.py:315-338)
  2. classification: drop mismatched head.*, strict=False, keep the rest
     (Classification/train.py:130-148)
  3. segmentation: match pretrain keys against `encoder.`-prefixed SegViT
     keys (Segmentation/train.py:112-126)
  4. detection: match into backbone.encoder.* (Detection/train.py:149-167);
     visualization rename cross_attn_layer->context_fusion_layer
     (Visualization/main_visualization.py:88-93)

Direction of traversal: we walk the TARGET flax tree and derive each leaf's
torch key + layout transform (Linear (out,in)->(in,out); Conv OIHW->HWIO;
BatchNorm weight/bias/running_* -> scale/bias + batch_stats). This gives
exact coverage/shape reporting.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

from .torch_reader import load_pth_file


def load_pth(path: str) -> Dict[str, Any]:
    """Load a .pth; prefer the torch-free zip reader, fall back to torch
    (legacy/rare formats) if available."""
    try:
        return load_pth_file(path)
    except Exception:
        import torch  # noqa: PLC0415 — fallback only

        obj = torch.load(path, map_location="cpu", weights_only=False)

        def conv(x):
            if hasattr(x, "detach"):
                return x.detach().cpu().numpy()
            if isinstance(x, dict):
                return {k: conv(v) for k, v in x.items()}
            if isinstance(x, (list, tuple)):
                return type(x)(conv(v) for v in x)
            return x

        return conv(obj)


# ---------------------------------------------------------------------------
# tree utilities


def flatten(tree, prefix=()) -> Dict[Tuple[str, ...], np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten(v, prefix + (str(k),)))
    else:
        out[prefix] = tree
    return out


def unflatten(flat: Dict[Tuple[str, ...], Any]):
    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def _convert(leaf: str, val: np.ndarray, target_shape) -> np.ndarray:
    v = np.asarray(val)
    if leaf == "kernel":
        if v.ndim == 2:
            v = v.T
        elif v.ndim == 4:  # OIHW -> HWIO
            v = v.transpose(2, 3, 1, 0)
    v = np.asarray(v, dtype=np.float32)
    if v.shape != tuple(target_shape):
        raise ValueError(f"shape mismatch: got {v.shape}, want {tuple(target_shape)}")
    return v


_LEAF_TO_TORCH = {
    "kernel": "weight",
    "embedding": "weight",
    "scale": "weight",
    "mean": "running_mean",
    "var": "running_var",
    "weight": "weight",
    "bias": "bias",
}


def _default_key_fn(path: Tuple[str, ...]) -> str:
    """Generic flax-path -> torch-key translation shared by all families."""
    *mods, leaf = path
    joined = ".".join(mods)
    joined = re.sub(r"blocks_(\d+)", r"blocks.\1", joined)
    joined = re.sub(r"decoder\.blocks\.(\d+)", r"decoder_blocks.\1", joined)
    # BERT encoder stack: layer_i -> encoder.layer.i
    joined = re.sub(r"layer_(\d+)", r"encoder.layer.\1", joined)
    # MLM head naming
    joined = joined.replace("cls.transform_dense", "cls.predictions.transform.dense")
    joined = joined.replace("cls.transform_LayerNorm", "cls.predictions.transform.LayerNorm")
    joined = joined.replace("cls.decoder", "cls.predictions.decoder")
    # seg/det conv decoders: decoder_i_conv -> decoder_i.0, _bn -> .1
    joined = re.sub(r"decoder_(\d+)_conv", r"decoder_\1.0", joined)
    joined = re.sub(r"decoder_(\d+)_bn", r"decoder_\1.1", joined)
    # yolo head cbl towers: embeddingN/cbl_i/{conv,bn} -> embeddingN.i.{conv,bn}
    joined = re.sub(r"embedding(\d+)\.cbl_(\d+)", r"embedding\1.\2", joined)
    torch_leaf = _LEAF_TO_TORCH.get(leaf, leaf)
    return f"{joined}.{torch_leaf}" if joined else torch_leaf


def _apply_state(variables: Dict[str, Any], state: Dict[str, np.ndarray],
                 prefix_map: Callable[[str], Optional[str]],
                 verbose: bool = False):
    """Merge a torch state dict into flax `variables` ({'params': ...,
    'batch_stats': ...}). prefix_map rewrites the generic torch key into the
    checkpoint's namespace (or returns None to leave the leaf at init).

    Returns (new_variables, loaded_keys, missing_paths).
    """
    flat = flatten(variables)
    loaded, missing = [], []
    new_flat = {}
    for path, init_val in flat.items():
        collection = path[0]  # params | batch_stats
        rel = path[1:]
        # flax cls_token/pos_embed are (1,1,D)/(1,N,D) params named directly
        generic = _default_key_fn(rel)
        torch_key = prefix_map(generic)
        if torch_key is not None and torch_key in state:
            try:
                new_flat[path] = _convert(rel[-1], state[torch_key],
                                          np.shape(init_val))
                loaded.append(torch_key)
                continue
            except ValueError:
                pass  # shape mismatch -> keep init (strict=False semantics)
        new_flat[path] = init_val
        missing.append("/".join(path))
    return unflatten(new_flat), loaded, missing


def _get_model_state(ckpt: Dict[str, Any]) -> Dict[str, np.ndarray]:
    state = ckpt.get("model", ckpt)
    if "state_dict" in state:
        state = state["state_dict"]
    # strip DDP "module." prefixes
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in state.items()}


# ---------------------------------------------------------------------------
# family-specific importers


def import_ecamp_pretrain(variables, ckpt_path: str, verbose: bool = False):
    """Conventions 1 (+viz rename). Target: nn.mae.ECAMP variables."""
    state = _get_model_state(load_pth(ckpt_path))
    state = {k.replace("cross_attn_layer", "context_fusion_layer"): v
             for k, v in state.items()}

    def pm(key: str) -> str:
        # flax 'bert/...' subtree corresponds to torch
        # 'bert_encoder.model.bert....' except the MLM head, which lives at
        # 'bert_encoder.model.cls.predictions...'
        if key.startswith("bert.cls."):
            return "bert_encoder.model." + key[len("bert."):]
        if key.startswith("bert."):
            return "bert_encoder.model.bert." + key[len("bert."):]
        return key

    return _apply_state(variables, state, pm, verbose)


def import_vit_classifier(variables, ckpt_path: str, verbose: bool = False):
    """Convention 2: head.* dropped (shape mismatch keeps init), rest
    loaded when present; pretrain checkpoints contribute the trunk."""
    state = _get_model_state(load_pth(ckpt_path))

    def pm(key: str) -> Optional[str]:
        if key.startswith("trunk."):
            return key[len("trunk."):]
        return key  # fc_norm / norm / head at top level

    return _apply_state(variables, state, pm, verbose)


def import_seg_vit(variables, ckpt_path: str, from_pretrain: bool = True,
                   verbose: bool = False):
    """Convention 3: pretrain keys match `encoder.`-stripped SegViT keys.
    With from_pretrain=False, load a fine-tuned SegViT state dict."""
    state = _get_model_state(load_pth(ckpt_path))

    def pm(key: str) -> Optional[str]:
        if key.startswith("encoder.trunk."):
            inner = key[len("encoder.trunk."):]
            return inner if from_pretrain else f"encoder.{inner}"
        if key.startswith("encoder.seg_head."):
            return None if from_pretrain else key
        return None if from_pretrain else key

    return _apply_state(variables, state, pm, verbose)


def import_detector(variables, ckpt_path: str, from_pretrain: bool = True,
                    verbose: bool = False):
    """Convention 4: pretrain keys -> backbone.encoder.*; fine-tuned ckpts
    load the whole ModelMain tree."""
    state = _get_model_state(load_pth(ckpt_path))

    def pm(key: str) -> Optional[str]:
        if key.startswith("backbone.encoder.trunk."):
            inner = key[len("backbone.encoder.trunk."):]
            return inner if from_pretrain else f"backbone.encoder.{inner}"
        if from_pretrain:
            return None
        if key.startswith("backbone.encoder.det_head."):
            return key
        if key.startswith("head."):
            return key[len("head."):]
        return key

    return _apply_state(variables, state, pm, verbose)
