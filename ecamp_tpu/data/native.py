"""ctypes bindings for the native host-feeder library (native/ecamp_host.cpp).

Load is lazy and optional: if the .so is missing it is built on demand when
a compiler is available, else every accessor returns None and callers use
the pure-Python paths (exact-parity implementations).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False


def _repo_native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


def load_library() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.environ.get("ECAMP_NATIVE_LIB") or os.path.join(
        _repo_native_dir(), "libecamp_host.so")
    if not os.path.exists(path):
        build = os.path.join(_repo_native_dir(), "build.sh")
        if os.path.exists(build):
            try:
                subprocess.run(["sh", build], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.ecamp_tok_new.restype = ctypes.c_void_p
    lib.ecamp_tok_new.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
    lib.ecamp_tok_encode.restype = ctypes.c_int64
    lib.ecamp_tok_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32)]
    lib.ecamp_tok_free.argtypes = [ctypes.c_void_p]
    if hasattr(lib, "ecamp_resize_gray_u8"):  # abi >= 2
        lib.ecamp_resize_gray_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8)]
    lib.ecamp_resize_norm.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
        ctypes.c_float, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float)]
    _LIB = lib
    return lib


class NativeTokenizer:
    """Native WordPiece handle mirroring WordPieceTokenizer's vocab/config.
    encode() returns None when the C fast path declines (non-ASCII)."""

    def __init__(self, py_tokenizer) -> None:
        lib = load_library()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self.lib = lib
        vocab = py_tokenizer.get_vocab()
        toks = list(vocab.keys())
        tok_arr = (ctypes.c_char_p * len(toks))(
            *[t.encode("utf-8") for t in toks])
        id_arr = (ctypes.c_int32 * len(toks))(*[vocab[t] for t in toks])
        specials = py_tokenizer.special_tokens
        sp_arr = (ctypes.c_char_p * len(specials))(
            *[s.encode("utf-8") for s in specials])
        sp_ids = (ctypes.c_int32 * len(specials))(
            *[vocab[s] for s in specials])
        self.handle = lib.ecamp_tok_new(
            tok_arr, id_arr, len(toks), sp_arr, sp_ids, len(specials),
            vocab[py_tokenizer.unk_token], py_tokenizer.pad_id,
            py_tokenizer.max_chars)

    def encode(self, text: str, max_length: int, pad_to: int):
        try:
            raw = text.encode("ascii")
        except UnicodeEncodeError:
            return None
        ids = np.zeros((pad_to,), np.int32)
        attn = np.zeros((pad_to,), np.int32)
        n = self.lib.ecamp_tok_encode(
            self.handle, raw, len(raw), max_length, pad_to,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            attn.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if n < 0:
            return None
        return ids, attn

    def __del__(self):
        try:
            self.lib.ecamp_tok_free(self.handle)
        except Exception:
            pass


def resize_norm(src: np.ndarray, box, out_size: int, mean: float, std: float,
                grayscale: bool = True, filter: str = "bilinear"
                ) -> Optional[np.ndarray]:
    """Fused crop-resize (bilinear|bicubic, PIL semantics) + grayscale +
    normalize. src: u8 HWC. Returns f32 (out, out, 3) or None if the
    library is unavailable."""
    lib = load_library()
    if lib is None or filter not in ("bilinear", "bicubic"):
        # the C++ kernel implements only bilinear/bicubic; anything else
        # (e.g. 'nearest') must take the PIL fallback so numerics match
        # the configured interpolation regardless of whether the .so built
        return None
    src = np.ascontiguousarray(src, np.uint8)
    h, w = src.shape[:2]
    c = src.shape[2] if src.ndim == 3 else 1
    dst = np.empty((out_size, out_size, 3), np.float32)
    x0, y0, x1, y1 = box
    lib.ecamp_resize_norm(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        float(x0), float(y0), float(x1), float(y1), out_size, out_size,
        float(mean), float(std), int(grayscale),
        1 if filter == "bicubic" else 0,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return dst


def resize_gray_u8(src: np.ndarray, box, out_size: int,
                   filter: str = "bilinear") -> Optional[np.ndarray]:
    """Fused crop-resize + grayscale to the QUANTIZED u8 gray — exactly
    the integer resize_norm normalizes internally (clip8 passes + ITU-R
    601-2 luma). src: u8 HWC or HW. Returns u8 (out, out), or None if
    the library/symbol is unavailable (pre-abi-2 .so) or the filter is
    not implemented natively."""
    lib = load_library()
    if (lib is None or not hasattr(lib, "ecamp_resize_gray_u8")
            or filter not in ("bilinear", "bicubic")):
        return None
    src = np.ascontiguousarray(src, np.uint8)
    h, w = src.shape[:2]
    c = src.shape[2] if src.ndim == 3 else 1
    dst = np.empty((out_size, out_size), np.uint8)
    x0, y0, x1, y1 = box
    lib.ecamp_resize_gray_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        float(x0), float(y0), float(x1), float(y1), out_size, out_size,
        1 if filter == "bicubic" else 0,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return dst
