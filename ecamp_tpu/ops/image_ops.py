"""On-device image ops (NHWC).

The reference resizes 448->224 bicubic INSIDE the model forward on device
(model_ecamp.py:318, torchvision Resize without antialias); we keep the
same on-device placement (it rides the input transfer and fuses into the
step) and match torch's non-antialiased kernels.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _torch_cubic_matrix(src: int, dst: int, a: float = -0.75) -> np.ndarray:
    """(dst, src) matrix of torch's non-antialiased bicubic
    (F.interpolate mode='bicubic', align_corners=False): cubic convolution
    with a=-0.75 and border-replicated taps. jax.image.resize's 'bicubic'
    is the Keys a=-0.5 kernel — different taps, so extracting jax's linear
    map would NOT reproduce the reference resize (model_ecamp.py:318)."""
    def w(x: np.ndarray) -> np.ndarray:
        x = np.abs(x)
        return np.where(
            x <= 1.0, (a + 2.0) * x ** 3 - (a + 3.0) * x ** 2 + 1.0,
            np.where(x < 2.0,
                     a * x ** 3 - 5.0 * a * x ** 2 + 8.0 * a * x - 4.0 * a,
                     0.0))

    m = np.zeros((dst, src), np.float64)
    scale = src / dst
    for o in range(dst):
        s = (o + 0.5) * scale - 0.5
        i = int(np.floor(s))
        t = s - i
        taps = np.array([i - 1, i, i + 1, i + 2])
        weights = w(np.array([1.0 + t, t, 1.0 - t, 2.0 - t]))
        for tap, wt in zip(np.clip(taps, 0, src - 1), weights):
            m[o, tap] += wt
    return m.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _resize_matrix(src: int, dst: int, method: str) -> np.ndarray:
    """The (dst, src) matrix of the separable resize linear map: torch's
    cubic-convolution weights for 'bicubic' (see _torch_cubic_matrix);
    'bilinear'/others extracted from jax.image.resize by resizing the
    identity (exact by linearity — jax's triangle kernel equals torch
    bilinear align_corners=False)."""
    if method == "bicubic":
        return _torch_cubic_matrix(src, dst)
    # ensure_compile_time_eval: stays correct even if the first call happens
    # inside a jit trace (otherwise np.asarray would see a tracer)
    with jax.ensure_compile_time_eval():
        eye = jnp.eye(src, dtype=jnp.float32)
        with jax.default_device(jax.devices("cpu")[0]):
            m = jax.image.resize(eye, (dst, src), method=method,
                                 antialias=False)
    return np.asarray(m)


def _resize_matmul(x: jnp.ndarray, size: Tuple[int, int],
                   method: str) -> jnp.ndarray:
    """Separable resize as two dense contractions.

    Same linear map as jax.image.resize(antialias=False) but executed on
    the MXU: measured 3.9 ms vs 25 ms for the gather-based lowering on the
    (64, 448, 448, 3) -> 224 bicubic of the pretrain step (v5e).

    By default the two contractions run channels-first (h/w as the minor
    dims, c folded into the batch) with one NHWC transpose at each end —
    avoids the T(4,128) lane padding that a c=3 minor dim forces on the
    NHWC operands (same pathology the SR head had; measured +0.3% step
    throughput at B=96, DESIGN round-3 layout A/B).
    ECAMP_RESIZE_NHWC=1 restores the direct NHWC einsums."""
    import os

    n, h, w, c = x.shape
    if os.environ.get("ECAMP_RESIZE_NHWC") == "1":
        mh = jnp.asarray(_resize_matrix(h, size[0], method), x.dtype)
        mw = jnp.asarray(_resize_matrix(w, size[1], method), x.dtype)
        # fp32 callers (parity/eval) get full-precision taps; the bf16
        # hot path keeps single-pass MXU matmuls (default precision)
        prec = "highest" if x.dtype == jnp.float32 else None
        y = jnp.einsum("oh,bhwc->bowc", mh, x, precision=prec)
        return jnp.einsum("pw,bowc->bopc", mw, y, precision=prec)
    z = _resize_matmul_nchw(jnp.transpose(x, (0, 3, 1, 2)), size, method)
    return jnp.transpose(z, (0, 2, 3, 1))


def resize_bicubic(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """NHWC bicubic resize, antialias off (torchvision tensor-mode default)."""
    return _resize_matmul(x, size, "bicubic")


def _resize_matmul_nchw(x: jnp.ndarray, size: Tuple[int, int],
                        method: str) -> jnp.ndarray:
    """Separable resize on an NCHW tensor, no layout changes: both
    contractions run over the minor h/w dims (c rides the batch dims), so
    no T(4,128) lane padding and no transposes. Same linear map as the
    NHWC path."""
    n, c, h, w = x.shape
    mh = jnp.asarray(_resize_matrix(h, size[0], method), x.dtype)
    mw = jnp.asarray(_resize_matrix(w, size[1], method), x.dtype)
    prec = "highest" if x.dtype == jnp.float32 else None
    y = jnp.einsum("oh,bchw->bcow", mh, x, precision=prec)
    return jnp.einsum("pw,bcow->bcop", mw, y, precision=prec)


def resize_bicubic_nchw(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    return _resize_matmul_nchw(x, size, "bicubic")


def resize_bilinear_nchw(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    return _resize_matmul_nchw(x, size, "bilinear")


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int],
                    antialias: bool = False) -> jnp.ndarray:
    """NHWC bilinear resize; align_corners=False semantics (matches
    F.interpolate(..., mode='bilinear', align_corners=False) used by the SR
    head, model_ecamp.py:38)."""
    if antialias:
        n, h, w, c = x.shape
        return jax.image.resize(x, (n, size[0], size[1], c),
                                method="bilinear", antialias=True)
    return _resize_matmul(x, size, "bilinear")


@functools.lru_cache(maxsize=None)
def _align_corners_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) matrix of torch's align_corners=True bilinear grid
    (src = dst * (in-1)/(out-1)); exact fp32 weights."""
    m = np.zeros((out_size, in_size), np.float32)
    if out_size == 1 or in_size == 1:
        m[:, 0] = 1.0
        return m
    src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    lo = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    hi = np.clip(lo + 1, 0, in_size - 1)
    frac = (src - lo).astype(np.float32)
    m[np.arange(out_size), lo] += 1.0 - frac
    m[np.arange(out_size), hi] += frac
    return m


def upsample_align_corners(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Bilinear upsample with align_corners=True (seg decoder nn.Upsample,
    Segmentation/models_vit.py:77; det neck, detector_backbone_vit.py:165).

    jax.image.resize has no align_corners mode. Formulated as the two
    separable (out, in) matmuls of the torch grid rather than gather+lerp:
    a gather's backward is a scatter-add, which is pathologically slow on
    TPU and was the dominant cost of the whole seg train step (4 decoder
    upsamples: 309 -> 61 ms/step at B=64 on v5e, tools/bench_finetune.py);
    matmuls run on the MXU and differentiate as transposed matmuls.
    Precision HIGHEST keeps fp32-exact weights (the matrices are mostly
    0/0.5/1 at integer scales).
    """
    n, h, w, c = x.shape
    wy = jnp.asarray(_align_corners_matrix(h, h * scale))
    wx = jnp.asarray(_align_corners_matrix(w, w * scale))
    xf = x.astype(jnp.float32)
    out = jnp.einsum("Oh,nhwc->nOwc", wy, xf, precision="highest")
    out = jnp.einsum("Pw,nOwc->nOPc", wx, out, precision="highest")
    return out.astype(x.dtype)


def upsample_nearest(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Nearest-neighbor upsample (YOLO head, detector_model.py:30-31)."""
    x = jnp.repeat(x, scale, axis=1)
    return jnp.repeat(x, scale, axis=2)


def normalize_image(x: jnp.ndarray, mean: float, std: float) -> jnp.ndarray:
    """Per-channel-identical normalize (grayscale-replicated inputs,
    pretrain_datasets.py:52)."""
    return (x - mean) / std


def device_normalize_image(x: jnp.ndarray, mean: float,
                           std: float) -> jnp.ndarray:
    """On-device half of the u8 image pipe: quantized u8 gray
    (..., H, W, 1|3) -> normalized f32 (..., H, W, 3), the same ops/order
    as the host path (data/transforms.py::normalize) so results match
    bitwise outside fusion; broadcast restores the 3 identical channels
    Grayscale(3) produced on the host. Passthrough for non-u8 inputs, so
    one jitted step serves both pipes."""
    if x.dtype != jnp.uint8:
        return x
    y = (x.astype(jnp.float32) / 255.0 - mean) / std
    if y.shape[-1] == 1:
        y = jnp.broadcast_to(y, y.shape[:-1] + (3,))
    return y
