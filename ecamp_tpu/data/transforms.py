"""Host-side image transforms (PIL + numpy), NHWC float32 output.

Matches the reference's torchvision stacks:
  pretrain: RandomResizedCrop(448, scale=(0.2,1)) bicubic + HFlip +
            Grayscale(3) + Normalize(0.4721, 0.3037)
            (pretrain_datasets.py:47-52)
  cls train: RandomResizedCrop(img) + HFlip + Grayscale(3) +
             Normalize(0.4722, 0.3028) (Classification/utils/data_utils.py:20-27)
  cls eval:  Resize(img/ratio) + CenterCrop + Grayscale(3) + Normalize
             (data_utils.py:29-34)

RandomResizedCrop reproduces torchvision's sampling (10 area/log-ratio
draws then center fallback). Grayscale uses the ITU-R 601-2 luma transform
(PIL 'L'), replicated to 3 channels.
"""

from __future__ import annotations

import math
import random
from typing import Tuple

import numpy as np
from PIL import Image


def _interp(name: str):
    return {"bicubic": Image.BICUBIC, "bilinear": Image.BILINEAR,
            "nearest": Image.NEAREST}[name]


def sample_crop_box(width: int, height: int, rng: random.Random,
                    scale: Tuple[float, float] = (0.08, 1.0),
                    ratio: Tuple[float, float] = (3 / 4, 4 / 3)
                    ) -> Tuple[int, int, int, int]:
    """torchvision RandomResizedCrop box sampling (10 area/log-ratio draws
    then clamped center fallback). Returns (x0, y0, x1, y1)."""
    area = width * height
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        aspect = math.exp(rng.uniform(log_ratio[0], log_ratio[1]))
        w = int(round(math.sqrt(target_area * aspect)))
        h = int(round(math.sqrt(target_area / aspect)))
        if 0 < w <= width and 0 < h <= height:
            i = rng.randint(0, height - h)
            j = rng.randint(0, width - w)
            return (j, i, j + w, i + h)
    in_ratio = width / height
    if in_ratio < ratio[0]:
        w, h = width, int(round(width / ratio[0]))
    elif in_ratio > ratio[1]:
        h, w = height, int(round(height * ratio[1]))
    else:
        w, h = width, height
    i = (height - h) // 2
    j = (width - w) // 2
    return (j, i, j + w, i + h)


def random_resized_crop(img: Image.Image, size: int, rng: random.Random,
                        scale: Tuple[float, float] = (0.08, 1.0),
                        ratio: Tuple[float, float] = (3 / 4, 4 / 3),
                        interpolation: str = "bilinear") -> Image.Image:
    width, height = img.size
    box = sample_crop_box(width, height, rng, scale, ratio)
    return img.resize((size, size), _interp(interpolation), box=box)


def center_crop_resize(img: Image.Image, size: int, resize_to: int,
                       interpolation: str = "bilinear") -> Image.Image:
    """Resize smaller edge to resize_to then center-crop size x size."""
    w, h = img.size
    if w < h:
        nw, nh = resize_to, int(round(h * resize_to / w))
    else:
        nh, nw = resize_to, int(round(w * resize_to / h))
    img = img.resize((nw, nh), _interp(interpolation))
    left = (nw - size) // 2
    top = (nh - size) // 2
    return img.crop((left, top, left + size, top + size))


def to_grayscale3(img: Image.Image) -> Image.Image:
    return img.convert("L").convert("RGB")


def normalize(arr: np.ndarray, mean: float, std: float) -> np.ndarray:
    """uint8 HWC -> float32 normalized."""
    x = arr.astype(np.float32) / 255.0
    return (x - mean) / std


class TrainTransform:
    """RandomResizedCrop + HFlip + Grayscale(3) + Normalize.

    Uses the native fused crop-resize+grayscale+normalize kernel when the
    C++ library is available (flip commutes with grayscale/normalize, so
    it applies to the output array); PIL fallback otherwise.
    """

    def __init__(self, size: int, mean: float, std: float,
                 scale: Tuple[float, float] = (0.08, 1.0),
                 interpolation: str = "bilinear", seed: int = 0,
                 use_native: bool = True, draft: bool = True,
                 output_u8: bool = False):
        """output_u8: emit the quantized u8 gray (size, size, 1) instead
        of the normalized f32 (size, size, 3) — 1/12 the bytes; the
        normalize + 3-channel broadcast then runs on-device
        (train/pretrain.py::device_normalize). Same quantized pixels by
        construction: the f32 path normalizes exactly this u8 value."""
        self.size = size
        self.mean = mean
        self.std = std
        self.scale = scale
        self.interpolation = interpolation
        self.seed = seed
        self.rng = random.Random(seed)
        self.use_native = use_native
        self.draft = draft
        self.output_u8 = output_u8

    def reseed(self, epoch: int, worker_id: int) -> None:
        """DataLoader worker protocol (data/loader.py): rebind the crop/
        flip stream to a per-(epoch, worker)-deterministic one."""
        base = (self.seed * 1_000_003 + epoch) * 1_000_003 + worker_id
        self.rng = random.Random(base + 500_009)

    def _emit(self, img, box, flip: bool) -> np.ndarray:
        """Finish one sample from the decoded image + sampled box/flip:
        native fused kernel when available, PIL fallback otherwise (the
        rng draws are already consumed either way)."""
        # getattr: instances pickled by pre-u8 versions (mp spawn workers,
        # cached datasets) lack the attribute
        output_u8 = getattr(self, "output_u8", False)
        if self.use_native:
            from . import native

            arr = np.asarray(img)
            if output_u8:
                out = native.resize_gray_u8(arr, box, self.size,
                                            filter=self.interpolation)
                if out is not None:
                    if flip:
                        out = np.ascontiguousarray(out[:, ::-1])
                    return out[..., None]
            else:
                out = native.resize_norm(arr, box, self.size, self.mean,
                                         self.std, grayscale=True,
                                         filter=self.interpolation)
                if out is not None:
                    return out[:, ::-1].copy() if flip else out
        pil = Image.fromarray(img) if isinstance(img, np.ndarray) else img
        pil = pil.resize((self.size, self.size), _interp(self.interpolation),
                         box=box)
        if flip:
            pil = pil.transpose(Image.FLIP_LEFT_RIGHT)
        if output_u8:
            return np.asarray(pil.convert("L"))[..., None]
        return normalize(np.asarray(to_grayscale3(pil)), self.mean, self.std)

    def load(self, path) -> np.ndarray:
        """Fused open+decode+transform for one file — the feeder hot path.

        Two measured wins over decode-then-__call__ (per-stage numbers in
        DESIGN.md):
          * the crop box is sampled from the JPEG HEADER size, so libjpeg
            can draft-decode (DCT-domain 1/2 / 1/4 / 1/8 scaling) at the
            smallest scale that still gives >= 1 source px per output px
            for THIS crop — no fidelity loss for the 448-out resize;
          * grayscale sources decode as single-channel 'L' (MIMIC-CXR JPEGs
            are gray; RGB convert+crop+re-gray is 3x the bytes for an
            identical result).
        RNG draw order (crop box, then flip) matches __call__ exactly.
        """
        with open(path, "rb") as f:
            img = Image.open(f)
            w, h = img.size  # header only; pixels not decoded yet
            box = sample_crop_box(w, h, self.rng, self.scale)
            flip = self.rng.random() < 0.5
            if self.draft and img.format == "JPEG":
                bw, bh = box[2] - box[0], box[3] - box[1]
                shrink = max(1, min(bw, bh) // self.size)
                shrink = 1 << min(3, shrink.bit_length() - 1)
                if shrink > 1:
                    img.draft(img.mode, (w // shrink, h // shrink))
            if img.mode not in ("L", "RGB"):
                img = img.convert("RGB")
            arr = np.asarray(img)  # decode happens here (possibly drafted)
            sw, sh = img.size
        if (sw, sh) != (w, h):
            sx, sy = sw / w, sh / h
            box = (box[0] * sx, box[1] * sy, box[2] * sx, box[3] * sy)
        return self._emit(arr, box, flip)

    def __call__(self, img: Image.Image) -> np.ndarray:
        # rng draw order (crop box, then flip) matches load() exactly
        box = sample_crop_box(img.size[0], img.size[1], self.rng,
                              self.scale)
        flip = self.rng.random() < 0.5
        return self._emit(img, box, flip)


class EvalTransform:
    """Resize(size/crop_ratio) + CenterCrop + Grayscale(3) + Normalize.

    output_u8: emit the quantized u8 gray (size, size, 1) for the u8
    pipe (see TrainTransform); normalization happens on-device."""

    def __init__(self, size: int, mean: float, std: float,
                 crop_ratio: float = 0.875, interpolation: str = "bilinear",
                 output_u8: bool = False):
        self.size = size
        self.resize_to = int(size / crop_ratio)
        self.mean = mean
        self.std = std
        self.interpolation = interpolation
        self.output_u8 = output_u8

    def __call__(self, img: Image.Image) -> np.ndarray:
        img = center_crop_resize(img, self.size, self.resize_to,
                                 self.interpolation)
        if getattr(self, "output_u8", False):
            return np.asarray(img.convert("L"))[..., None]
        img = to_grayscale3(img)
        return normalize(np.asarray(img), self.mean, self.std)
