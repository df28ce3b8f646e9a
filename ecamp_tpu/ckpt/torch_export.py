"""Torch-free writer for PyTorch `.pth` checkpoints (inverse of
torch_reader/torch_import).

Lets a user round-trip weights back into the reference ecosystem: a
state dict exported here loads with plain `torch.load` +
`model.load_state_dict(..., strict=False)` into the reference modules
(strict=False only because flax has no buffers for torch's
position_ids/num_batches_tracked, which the reference re-creates at
construction anyway).

The pickle stream for the torch-zip format is emitted with hand-rolled
protocol-2 opcodes — no torch import and no fake-module tricks: tensors
become `torch._utils._rebuild_tensor_v2(<persistent storage>, offset,
size, stride, False, OrderedDict())` exactly as torch writes them, with
each storage's raw little-endian bytes at `archive/data/<key>`.
Compatible with `torch.load(weights_only=True)` (rebuild fn, storages
and collections.OrderedDict are all on torch's allowlist).
"""

from __future__ import annotations

import struct
import zipfile
from typing import Any, Dict, Optional, Tuple

import numpy as np

from .torch_import import _default_key_fn, flatten

try:
    import ml_dtypes

    _BF16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    _BF16 = None

_STORAGE_NAMES = {
    np.dtype(np.float32): "FloatStorage",
    np.dtype(np.float64): "DoubleStorage",
    np.dtype(np.float16): "HalfStorage",
    np.dtype(np.int64): "LongStorage",
    np.dtype(np.int32): "IntStorage",
    np.dtype(np.int16): "ShortStorage",
    np.dtype(np.int8): "CharStorage",
    np.dtype(np.uint8): "ByteStorage",
    np.dtype(np.bool_): "BoolStorage",
}
if _BF16 is not None:
    _STORAGE_NAMES[_BF16] = "BFloat16Storage"


class _PicklerState:
    def __init__(self):
        self.out = bytearray()
        self.storages: list = []  # (key, bytes)

    # -- low-level opcodes -------------------------------------------------

    def w(self, b: bytes):
        self.out += b

    def put_str(self, s: str):
        b = s.encode("utf-8")
        self.w(b"X" + struct.pack("<I", len(b)) + b)

    def put_int(self, x: int):
        if 0 <= x < 256:
            self.w(b"K" + bytes([x]))
        elif -(2 ** 31) <= x < 2 ** 31:
            self.w(b"J" + struct.pack("<i", x))
        else:
            data = x.to_bytes((x.bit_length() + 8) // 8, "little", signed=True)
            self.w(b"\x8a" + bytes([len(data)]) + data)

    def put_global(self, module: str, name: str):
        self.w(b"c" + module.encode() + b"\n" + name.encode() + b"\n")

    # -- values -------------------------------------------------------------

    def put_tensor(self, v: np.ndarray):
        v = np.ascontiguousarray(v)
        name = _STORAGE_NAMES.get(v.dtype)
        if name is None:
            raise ValueError(f"unsupported export dtype {v.dtype}")
        key = str(len(self.storages))
        self.storages.append((key, v.tobytes()))
        self.put_global("torch._utils", "_rebuild_tensor_v2")
        self.w(b"(")                       # MARK: args tuple
        # persistent storage id ('storage', StorageType, key, 'cpu', numel)
        self.w(b"(")
        self.put_str("storage")
        self.put_global("torch", name)
        self.put_str(key)
        self.put_str("cpu")
        self.put_int(int(v.size))
        self.w(b"t")                       # TUPLE (pid)
        self.w(b"Q")                       # BINPERSID
        self.put_int(0)                    # storage_offset
        self.put_tuple_of_ints(v.shape)    # size
        # contiguous strides in elements
        strides = []
        acc = 1
        for d in reversed(v.shape):
            strides.append(acc)
            acc *= d
        self.put_tuple_of_ints(tuple(reversed(strides)))
        self.w(b"\x89")                    # requires_grad = False
        self.put_global("collections", "OrderedDict")
        self.w(b")R")                      # OrderedDict() -> backward_hooks
        self.w(b"t")                       # close args tuple
        self.w(b"R")                       # REDUCE -> tensor

    def put_tuple_of_ints(self, xs):
        self.w(b"(")
        for x in xs:
            self.put_int(int(x))
        self.w(b"t")

    def put_value(self, v: Any):
        if isinstance(v, np.ndarray):
            return self.put_tensor(v)
        if v is None:
            return self.w(b"N")
        if isinstance(v, bool):
            return self.w(b"\x88" if v else b"\x89")
        if isinstance(v, (int, np.integer)):
            return self.put_int(int(v))
        if isinstance(v, (float, np.floating)):
            return self.w(b"G" + struct.pack(">d", float(v)))
        if isinstance(v, str):
            return self.put_str(v)
        if isinstance(v, dict):
            self.w(b"}")
            if v:
                self.w(b"(")
                for k, val in v.items():
                    self.put_value(k)
                    self.put_value(val)
                self.w(b"u")
            return
        if isinstance(v, (list, tuple)):
            self.w(b"]" if isinstance(v, list) else b"(")
            if isinstance(v, list):
                self.w(b"(")
                for item in v:
                    self.put_value(item)
                self.w(b"e")
            else:
                for item in v:
                    self.put_value(item)
                self.w(b"t")
            return
        raise TypeError(f"cannot export value of type {type(v)}")


def write_pth(obj: Any, path: str, archive: str = "archive") -> None:
    """Serialize `obj` (dicts/scalars/str + numpy-array tensors) in the
    torch-zip format readable by torch.load and this package's
    torch_reader."""
    ps = _PicklerState()
    ps.w(b"\x80\x02")
    ps.put_value(obj)
    ps.w(b".")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr(f"{archive}/data.pkl", bytes(ps.out))
        zf.writestr(f"{archive}/byteorder", "little")
        for key, raw in ps.storages:
            zf.writestr(f"{archive}/data/{key}", raw)
        zf.writestr(f"{archive}/version", "3\n")


# ---------------------------------------------------------------------------
# flax variables -> reference torch state dicts (inverse of torch_import)


def _deconvert(leaf: str, v: np.ndarray) -> np.ndarray:
    v = np.asarray(v, np.float32)
    if leaf == "kernel":
        if v.ndim == 2:
            v = v.T                      # in,out -> out,in
        elif v.ndim == 4:
            v = v.transpose(3, 2, 0, 1)  # HWIO -> OIHW
    return np.ascontiguousarray(v)


def state_dict_from_variables(variables, prefix_map) -> Dict[str, np.ndarray]:
    """Flatten flax variables ({'params': ..., 'batch_stats': ...}) to a
    torch state dict using the same generic name translation as the
    importer; prefix_map rewrites the generic key into the family
    namespace (None drops the leaf)."""
    out: Dict[str, np.ndarray] = {}
    for path, val in flatten(variables).items():
        rel = path[1:]  # drop collection
        torch_key: Optional[str] = prefix_map(_default_key_fn(rel))
        if torch_key is not None:
            out[torch_key] = _deconvert(rel[-1], val)
    return out


def export_ecamp_pretrain(variables, path: str,
                          epoch: Optional[int] = None) -> Dict[str, Any]:
    """Write a reference-pretraining-style checkpoint {'model': state}
    (util/misc.py:295-312 layout minus optimizer/scaler)."""
    def pm(key: str) -> str:
        if key.startswith("bert.cls."):
            return "bert_encoder.model." + key[len("bert."):]
        if key.startswith("bert."):
            return "bert_encoder.model.bert." + key[len("bert."):]
        return key

    ckpt: Dict[str, Any] = {"model": state_dict_from_variables(variables, pm)}
    if epoch is not None:
        ckpt["epoch"] = int(epoch)
    write_pth(ckpt, path)
    return ckpt


def export_vit_classifier(variables, path: str) -> Dict[str, Any]:
    """Write a fine-tuned classifier state dict (the flat layout the
    reference saves at Classification/train.py:84-95)."""
    def pm(key: str) -> str:
        return key[len("trunk."):] if key.startswith("trunk.") else key

    state = state_dict_from_variables(variables, pm)
    write_pth(state, path)
    return state


def export_seg_vit(variables, path: str) -> Dict[str, Any]:
    def pm(key: str) -> str:
        if key.startswith("encoder.trunk."):
            return "encoder." + key[len("encoder.trunk."):]
        return key

    state = state_dict_from_variables(variables, pm)
    write_pth(state, path)
    return state


def export_detector(variables, path: str) -> Dict[str, Any]:
    def pm(key: str) -> str:
        # same namespace map as import_detector(from_pretrain=False)
        if key.startswith("backbone.encoder.trunk."):
            return ("backbone.encoder."
                    + key[len("backbone.encoder.trunk."):])
        if key.startswith("head."):
            return key[len("head."):]
        return key

    state = state_dict_from_variables(variables, pm)
    write_pth(state, path)
    return state
