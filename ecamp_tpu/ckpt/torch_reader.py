"""Torch-free reader for PyTorch `.pth` checkpoints.

Parses the torch zip serialization format (data.pkl with persistent-id
storage references + per-storage data files) directly with the stdlib:
no torch import on the load path. Supports the tensor types the ECAMP
reference checkpoints contain (fp32/fp16/bf16/int64/...), nested dicts,
argparse.Namespace (saved args), and plain python scalars.

This is SURVEY §7.4 hard-part #1's foundation; key mapping to flax trees
lives in torch_import.py.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from typing import Any, Dict

import numpy as np

try:
    import ml_dtypes

    _BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    _BFLOAT16 = np.dtype(np.float32)

_DTYPES = {
    "FloatStorage": np.dtype(np.float32),
    "DoubleStorage": np.dtype(np.float64),
    "HalfStorage": np.dtype(np.float16),
    "BFloat16Storage": _BFLOAT16,
    "LongStorage": np.dtype(np.int64),
    "IntStorage": np.dtype(np.int32),
    "ShortStorage": np.dtype(np.int16),
    "CharStorage": np.dtype(np.int8),
    "ByteStorage": np.dtype(np.uint8),
    "BoolStorage": np.dtype(np.bool_),
}


class _StorageType:
    def __init__(self, name: str):
        self.name = name


class _Tensor:
    """Lazy strided view over a raw storage buffer."""

    def __init__(self, storage: np.ndarray, offset: int, size, stride,
                 requires_grad=False):
        self.storage = storage
        self.offset = offset
        self.size = tuple(size)
        self.stride = tuple(stride)

    def to_numpy(self) -> np.ndarray:
        itemsize = self.storage.dtype.itemsize
        arr = np.lib.stride_tricks.as_strided(
            self.storage[self.offset:],
            shape=self.size,
            strides=tuple(s * itemsize for s in self.stride),
        )
        return np.ascontiguousarray(arr)


def _rebuild_tensor_v2(storage, offset, size, stride, requires_grad,
                       backward_hooks, metadata=None):
    return _Tensor(storage, offset, size, stride, requires_grad)


def _rebuild_parameter(tensor, requires_grad, backward_hooks):
    return tensor


class _Unpickler(pickle.Unpickler):
    def __init__(self, file, loader):
        super().__init__(file, encoding="utf-8")
        self._loader = loader

    def persistent_load(self, pid):
        assert pid[0] == "storage", f"unknown persistent id {pid!r}"
        storage_type, key, _location, numel = pid[1], pid[2], pid[3], pid[4]
        name = storage_type.name if isinstance(storage_type, _StorageType) \
            else getattr(storage_type, "__name__", str(storage_type))
        dtype = _DTYPES.get(name)
        if dtype is None:
            raise ValueError(f"unsupported storage type {name}")
        return self._loader(key, dtype, numel)

    def find_class(self, module, name):
        if module == "torch._utils":
            if name == "_rebuild_tensor_v2":
                return _rebuild_tensor_v2
            if name == "_rebuild_parameter":
                return _rebuild_parameter
        if module == "torch" and name.endswith("Storage"):
            return _StorageType(name)
        if module == "torch" and name == "Size":
            return tuple
        if module in ("collections", "argparse", "builtins",
                      "numpy", "numpy.core.multiarray", "numpy._core.multiarray"):
            return super().find_class(module, name)
        if module.startswith("torch"):
            # Any other torch object (device, dtype markers in optimizer
            # state, etc.): return an inert placeholder class.
            return _StorageType
        return super().find_class(module, name)


def _to_numpy(obj: Any) -> Any:
    if isinstance(obj, _Tensor):
        return obj.to_numpy()
    if isinstance(obj, dict):
        return {k: _to_numpy(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_to_numpy(v) for v in obj)
    return obj


def load_pth_file(path: str) -> Any:
    """Load a torch-zip `.pth`. Returns pytrees with numpy leaves."""
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("data.pkl"))
        prefix = pkl_name[: -len("data.pkl")]
        cache: Dict[str, np.ndarray] = {}

        def loader(key, dtype, numel):
            ck = f"{key}:{dtype}"
            if ck not in cache:
                raw = zf.read(f"{prefix}data/{key}")
                cache[ck] = np.frombuffer(raw, dtype=dtype).copy()
            return cache[ck]

        with zf.open(pkl_name) as f:
            obj = _Unpickler(io.BytesIO(f.read()), loader).load()
    return _to_numpy(obj)
