"""torchvision.transforms stand-ins over PIL images (only the ops the
reference's Classification/utils/data_utils.py composes). Sampling
follows torchvision semantics (RandomResizedCrop scale/ratio draws with
10 attempts + center fallback) using the python `random` module, which
the reference seeds via set_seed."""

from __future__ import annotations

import math
import random

import numpy as np
import torch
from PIL import Image


class Compose:
    def __init__(self, ts):
        self.ts = ts

    def __call__(self, img):
        for t in self.ts:
            img = t(img)
        return img


def _pil_resample(interpolation):
    """Map a (stubbed) InterpolationMode to a PIL resample filter."""
    name = str(getattr(interpolation, "name", interpolation) or "").upper()
    if "CUBIC" in name:
        return Image.BICUBIC
    if "NEAREST" in name:
        return Image.NEAREST
    return Image.BILINEAR


class RandomResizedCrop:
    def __init__(self, size, scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3),
                 interpolation=None):
        self.size = size if isinstance(size, tuple) else (size, size)
        self.scale, self.ratio = scale, ratio
        self.resample = _pil_resample(interpolation)

    def __call__(self, img):
        w, h = img.size
        area = w * h
        for _ in range(10):
            target = random.uniform(*self.scale) * area
            log_r = (math.log(self.ratio[0]), math.log(self.ratio[1]))
            ar = math.exp(random.uniform(*log_r))
            cw = int(round(math.sqrt(target * ar)))
            ch = int(round(math.sqrt(target / ar)))
            if 0 < cw <= w and 0 < ch <= h:
                x = random.randint(0, w - cw)
                y = random.randint(0, h - ch)
                return img.crop((x, y, x + cw, y + ch)).resize(
                    self.size[::-1], self.resample)
        # fallback: center crop to bounded aspect
        in_r = w / h
        if in_r < self.ratio[0]:
            cw, ch = w, int(round(w / self.ratio[0]))
        elif in_r > self.ratio[1]:
            ch, cw = h, int(round(h * self.ratio[1]))
        else:
            cw, ch = w, h
        x, y = (w - cw) // 2, (h - ch) // 2
        return img.crop((x, y, x + cw, y + ch)).resize(
            self.size[::-1], self.resample)


class RandomHorizontalFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, img):
        if random.random() < self.p:
            return img.transpose(Image.FLIP_LEFT_RIGHT)
        return img


class Grayscale:
    def __init__(self, num_output_channels=1):
        self.n = num_output_channels

    def __call__(self, img):
        g = img.convert("L")
        return Image.merge("RGB", (g, g, g)) if self.n == 3 else g


class Resize:
    """int size: shorter side scaled to `size`; (h, w) size: exact
    (torchvision semantics). Also accepts batched CHW/NCHW tensors as
    torchvision does, resized via F.interpolate WITHOUT antialias — the
    pre-2023 torchvision default the reference deployed with
    (model_ecamp.py:318 resizes the 448 batch to 224 this way)."""

    def __init__(self, size, interpolation=None):
        self.size = tuple(size) if isinstance(size, (tuple, list)) else size
        self.interpolation = interpolation
        self.resample = _pil_resample(interpolation)

    def __call__(self, img):
        if isinstance(img, torch.Tensor):
            import torch.nn.functional as F

            name = str(getattr(self.interpolation, "name",
                               self.interpolation) or "bilinear").lower()
            mode = "bicubic" if "cubic" in name else name
            size = (self.size if isinstance(self.size, tuple)
                    else (self.size, self.size))
            batched = img.dim() == 4
            x = img if batched else img.unsqueeze(0)
            out = F.interpolate(x, size=size, mode=mode,
                                align_corners=False)
            return out if batched else out.squeeze(0)
        if isinstance(self.size, tuple):
            return img.resize(self.size[::-1], self.resample)
        w, h = img.size
        if w <= h:
            nw, nh = self.size, int(round(self.size * h / w))
        else:
            nh, nw = self.size, int(round(self.size * w / h))
        return img.resize((nw, nh), self.resample)


class CenterCrop:
    def __init__(self, size):
        self.size = size if isinstance(size, tuple) else (size, size)

    def __call__(self, img):
        w, h = img.size
        th, tw = self.size
        x = int(round((w - tw) / 2.0))
        y = int(round((h - th) / 2.0))
        return img.crop((x, y, x + tw, y + th))


class ToTensor:
    """torchvision semantics: PIL images and uint8 arrays scale to [0,1];
    float arrays convert without rescaling (the seg datasets pass float
    masks through ToTensor and rely on this)."""

    def __call__(self, img):
        arr = np.asarray(img)
        scale = 255.0 if arr.dtype == np.uint8 else 1.0
        arr = arr.astype(np.float32) / scale
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return torch.from_numpy(arr.transpose(2, 0, 1).copy())


class Normalize:
    def __init__(self, mean, std):
        self.mean = torch.tensor(mean, dtype=torch.float32)
        self.std = torch.tensor(std, dtype=torch.float32)

    def __call__(self, t):
        return (t - self.mean[:, None, None]) / self.std[:, None, None]


class ColorJitter:
    """Constructed (but never composed) by the reference's
    DetectionDataTransforms (Detection/utils/data_utils.py:17-22)."""

    def __init__(self, *args, **kwargs):
        self.args, self.kwargs = args, kwargs

    def __call__(self, img):
        return img
