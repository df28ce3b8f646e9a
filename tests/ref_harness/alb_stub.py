"""albumentations stand-ins for the seg datasets (Compose over numpy
HWC images with the `image=` kwarg protocol): ShiftScaleRotate (cv2
warpAffine, albumentations sampling via python random), Resize,
Normalize (max_pixel_value=255), ToTensorV2."""

from __future__ import annotations

import random

import cv2
import numpy as np
import torch


class Compose:
    def __init__(self, ts):
        self.ts = ts

    def __call__(self, **data):
        for t in self.ts:
            data = t(**data)
        return data


class ShiftScaleRotate:
    def __init__(self, shift_limit=0.0625, scale_limit=0.1, rotate_limit=45,
                 p=0.5, border_mode=cv2.BORDER_REFLECT_101, value=None):
        self.shift_limit = shift_limit
        self.scale_limit = scale_limit
        self.rotate_limit = rotate_limit
        self.p = p
        self.border_mode = border_mode
        self.value = 0 if value is None else value

    def __call__(self, image, **kw):
        if random.random() < self.p:
            angle = random.uniform(-self.rotate_limit, self.rotate_limit)
            scale = 1.0 + random.uniform(-self.scale_limit, self.scale_limit)
            dx = random.uniform(-self.shift_limit, self.shift_limit)
            dy = random.uniform(-self.shift_limit, self.shift_limit)
            h, w = image.shape[:2]
            m = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), angle,
                                        scale)
            m[0, 2] += dx * w
            m[1, 2] += dy * h
            image = cv2.warpAffine(image, m, (w, h),
                                   flags=cv2.INTER_LINEAR,
                                   borderMode=self.border_mode,
                                   borderValue=self.value)
        return dict(image=image, **kw)


class Resize:
    def __init__(self, height, width, p=1):
        self.height, self.width = height, width

    def __call__(self, image, **kw):
        image = cv2.resize(image, (self.width, self.height),
                           interpolation=cv2.INTER_LINEAR)
        return dict(image=image, **kw)


class Normalize:
    def __init__(self, mean, std, p=1, max_pixel_value=255.0):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.maxv = max_pixel_value

    def __call__(self, image, **kw):
        img = image.astype(np.float32)
        mean = self.mean * self.maxv
        std = self.std * self.maxv
        if img.ndim == 2:
            img = (img - mean[0]) / std[0]
        else:
            img = (img - mean.reshape(1, 1, -1)) / std.reshape(1, 1, -1)
        return dict(image=img, **kw)


class ToTensorV2:
    def __call__(self, image, **kw):
        if image.ndim == 2:
            image = image[:, :, None]
        t = torch.from_numpy(np.ascontiguousarray(
            image.transpose(2, 0, 1)))
        return dict(image=t, **kw)
