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
    # ResNet-50 backbone (nn/resnet.py vs torchvision): layerN_M -> layerN.M,
    # downsample_{conv,bn} -> downsample.{0,1}
    joined = re.sub(r"layer(\d)_(\d+)", r"layer\1.\2", joined)
    joined = joined.replace("downsample_conv", "downsample.0")
    joined = joined.replace("downsample_bn", "downsample.1")
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
                # shape mismatch: for position embeddings, bicubic-
                # interpolate the patch grid to the target resolution
                # (reference util/pos_embed.py:75-96 interpolate_pos_embed);
                # anything else keeps init (strict=False semantics)
                if rel[-1] == "pos_embed":
                    from ..nn.pos_embed import interpolate_pos_embed

                    v = np.asarray(state[torch_key], np.float32)
                    tgt = np.shape(init_val)
                    if (v.ndim == 3 and len(tgt) == 3
                            and v.shape[-1] == tgt[-1]):
                        grid = int(round((tgt[1] - 1) ** 0.5))
                        out = interpolate_pos_embed(v, grid)
                        if out.shape == tgt:
                            new_flat[path] = out
                            loaded.append(torch_key)
                            continue
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
                   verbose: bool = False, flavor: str = "ecamp"):
    """Convention 3: pretrain keys match `encoder.`-stripped SegViT keys.
    With from_pretrain=False, load a fine-tuned SegViT state dict.

    flavor follows the RIGA baseline branches (train_RIGA.py:110-138):
      'ecamp' (default) — checkpoint['model'], key1 == key2 minus
        'encoder.';
      'gloria' — checkpoint['state_dict'], ckpt keys additionally carry a
        'gloria.img_encoder.model.' prefix that is stripped before the
        same match. ('random' never reaches the importer: the trainer
        skips loading entirely.)
    """
    state = _get_model_state(load_pth(ckpt_path))
    if flavor == "gloria":
        pre = "gloria.img_encoder.model."
        state = {k[len(pre):]: v for k, v in state.items()
                 if k.startswith(pre)}

    def pm(key: str) -> Optional[str]:
        if key.startswith("encoder.trunk."):
            inner = key[len("encoder.trunk."):]
            return inner if from_pretrain else f"encoder.{inner}"
        if key.startswith("encoder.seg_head."):
            return None if from_pretrain else key
        return None if from_pretrain else key

    return _apply_state(variables, state, pm, verbose)


def _strip_prefixes(state: Dict[str, np.ndarray],
                    prefixes) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state.items():
        for p in prefixes:
            if k.startswith(p):
                k = k[len(p):]
                break
        out[k] = v
    return out


def _first_present(state: Dict[str, np.ndarray], candidates):
    for c in candidates:
        if c in state:
            return c
    return None


def import_detector(variables, ckpt_path: str, from_pretrain: bool = True,
                    verbose: bool = False, backbone: str = "vit"):
    """Convention 4: pretrain keys -> backbone.encoder.*; fine-tuned ckpts
    load the whole ModelMain tree.

    backbone='resnet50' (baseline path, Detection/train.py:99-131) loads
    torchvision-resnet50-style weights into the backbone: plain
    `conv1/layer1.0...` keys, `model.`-prefixed (ResNetDetector.model) and
    `module.img_encoder.`-wrapped spellings are all accepted; the YOLO
    neck/head keeps its init (reference load is strict=False over backbone
    keys only)."""
    state = _get_model_state(load_pth(ckpt_path))

    if backbone == "resnet50":
        state = _strip_prefixes(
            state, ("module.img_encoder.", "img_encoder.", "gloria.img_encoder."))

        def pm(key: str) -> Optional[str]:
            if key.startswith("backbone."):
                bare = key[len("backbone."):]
                return _first_present(state, (bare, f"model.{bare}"))
            if from_pretrain:
                return None
            if key.startswith("head."):
                return _first_present(state, (key, key[len("head."):]))
            return key

        return _apply_state(variables, state, pm, verbose)

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


def import_resnet_unet(variables, ckpt_path: str, verbose: bool = False):
    """ResNet-UNet baseline (Segmentation/train.py:139-180 smp.Unet path):
    load torchvision-resnet50-style weights into the UNet's inline
    encoder (conv1/bn1/layerN.M...); decoder + seg_head keep their init.
    Accepts plain torchvision state dicts, smp `encoder.`-prefixed dicts,
    and `module.img_encoder.model.`-wrapped baseline checkpoints."""
    state = _get_model_state(load_pth(ckpt_path))
    state = _strip_prefixes(
        state, ("module.img_encoder.", "img_encoder.",
                "gloria.img_encoder."))

    def pm(key: str) -> Optional[str]:
        if key.startswith(("decoder_", "seg_head.")):
            return None
        return _first_present(
            state, (key, f"encoder.{key}", f"model.{key}"))

    return _apply_state(variables, state, pm, verbose)


# ---------------------------------------------------------------------------
# optimizer-state import (reference resume semantics, util/misc.py:331-338)

_BUFFER_SUFFIXES = ("position_ids", "token_type_ids", "running_mean",
                    "running_var", "num_batches_tracked")


def _optimizer_param_order(model_state: Dict[str, np.ndarray]):
    """Reconstruct the torch AdamW param-index order of the reference
    pretrain run: timm optim_factory.add_weight_decay partitions
    named_parameters into [no_decay (ndim<=1 or .bias), decay], group 0
    first (main_pretrain.py:253), and torch assigns state indices by
    enumerating groups in order.

    Exclusions mirror what named_parameters(requires_grad) yields for the
    reference model: buffers; the frozen sincos pos embeddings
    (model_ecamp.py:64,78 requires_grad=False); and the HF-tied
    cls.predictions.decoder.bias duplicate of cls.predictions.bias
    (state_dict carries both, named_parameters deduplicates)."""
    names = []
    for k, v in model_state.items():
        if k.endswith(_BUFFER_SUFFIXES):
            continue
        if np.issubdtype(np.asarray(v).dtype, np.integer):
            continue
        if k in ("pos_embed", "decoder_pos_embed"):
            continue
        if (k.endswith("cls.predictions.decoder.bias")
                and k[:-len("decoder.bias")] + "bias" in model_state):
            continue
        names.append(k)
    no_decay = [n for n in names
                if np.asarray(model_state[n]).ndim <= 1 or n.endswith(".bias")]
    nd = set(no_decay)
    decay = [n for n in names if n not in nd]
    return no_decay + decay, len(no_decay), len(decay)


def _map_adam_states(obj, fn):
    """Recursively rewrite every optax ScaleByAdamState inside an opt-state
    pytree (works through chains, masks and MultiSteps wrappers)."""
    import optax

    if isinstance(obj, optax.ScaleByAdamState):
        return fn(obj)
    if isinstance(obj, tuple) and hasattr(obj, "_fields"):  # NamedTuple
        return type(obj)(*(_map_adam_states(v, fn) for v in obj))
    if isinstance(obj, (list, tuple)):
        return type(obj)(_map_adam_states(v, fn) for v in obj)
    if isinstance(obj, dict):
        return {k: _map_adam_states(v, fn) for k, v in obj.items()}
    return obj


def import_ecamp_adamw_state(opt_state, params_template, ckpt,
                             verbose: bool = False):
    """Restore torch AdamW moments (exp_avg/exp_avg_sq/step) from a
    reference pretrain checkpoint into an optax adamw opt-state.

    The reference restores optimizer + scaler when resuming its own
    checkpoints (util/misc.py:331-338); round 1 resumed params only,
    losing the moments. Moments transform with the same layout rules as
    the weights (transpose for Linear kernels, OIHW->HWIO for convs) —
    both are per-element statistics in the weight's coordinate system.

    Args:
      opt_state: the task's initialized opt-state (tx.init(params)).
      params_template: the flax params tree ('params' collection).
      ckpt: loaded checkpoint dict with 'model' + 'optimizer' keys.

    Returns (new_opt_state, n_loaded_moments, torch_step).
    """
    import jax.numpy as jnp

    opt_sd = ckpt["optimizer"]
    model_state = _get_model_state(ckpt)
    model_state = {k.replace("cross_attn_layer", "context_fusion_layer"): v
                   for k, v in model_state.items()}
    order, n_nd, n_d = _optimizer_param_order(model_state)
    groups = opt_sd.get("param_groups", [])
    if groups:
        sizes = [len(g.get("params", [])) for g in groups]
        if sizes != [n_nd, n_d]:
            raise ValueError(
                f"optimizer param-group sizes {sizes} do not match the "
                f"reconstructed [no_decay={n_nd}, decay={n_d}] partition — "
                "not a reference-format AdamW checkpoint")
    torch_state = opt_sd.get("state", {})
    idx_of = {name: i for i, name in enumerate(order)}
    # cross-check: every indexed moment must match its param's shape
    for name, i in idx_of.items():
        st = torch_state.get(i) or torch_state.get(str(i))
        if st is not None and "exp_avg" in st:
            if tuple(np.shape(st["exp_avg"])) != tuple(
                    np.shape(model_state[name])):
                raise ValueError(
                    f"moment shape mismatch at index {i} ({name}): "
                    f"{np.shape(st['exp_avg'])} vs "
                    f"{np.shape(model_state[name])}")

    def pm(key: str) -> str:  # same namespace map as import_ecamp_pretrain
        if key.startswith("bert.cls."):
            return "bert_encoder.model." + key[len("bert."):]
        if key.startswith("bert."):
            return "bert_encoder.model.bert." + key[len("bert."):]
        return key

    flat_params = flatten(params_template)
    mu_flat, nu_flat = {}, {}
    n_loaded = 0
    steps = []
    for path, leaf in flat_params.items():
        torch_key = pm(_default_key_fn(path))
        if (torch_key not in idx_of
                and torch_key.endswith("cls.predictions.decoder.bias")):
            # tied HF param: moments live under cls.predictions.bias
            torch_key = torch_key[:-len("decoder.bias")] + "bias"
        st = None
        if torch_key in idx_of:
            i = idx_of[torch_key]
            st = torch_state.get(i) or torch_state.get(str(i))
        if st is not None and "exp_avg" in st:
            mu_flat[path] = jnp.asarray(
                _convert(path[-1], st["exp_avg"], np.shape(leaf)))
            nu_flat[path] = jnp.asarray(
                _convert(path[-1], st["exp_avg_sq"], np.shape(leaf)))
            n_loaded += 1
            s = st.get("step", 0)
            steps.append(int(np.asarray(s).item()
                             if hasattr(s, "item") or np.ndim(s) == 0
                             else s))
        else:
            mu_flat[path] = jnp.zeros_like(leaf)
            nu_flat[path] = jnp.zeros_like(leaf)
            if verbose:
                print(f"optimizer: no moments for {'/'.join(path)}")
    mu = unflatten(mu_flat)
    nu = unflatten(nu_flat)
    step = max(steps) if steps else 0

    def replace(adam):
        return adam._replace(count=jnp.asarray(step, jnp.int32),
                             mu=mu, nu=nu)

    return _map_adam_states(opt_state, replace), n_loaded, step
