"""Dataset adapters (host-side, numpy out).

One registry replaces the reference's per-task copies (SURVEY §2.8):
  * ClassificationListDataset — whitespace list files "path l1 ... ln"
    (Classification/utils/my_dataset.py:12-88), 1/10/100% volume splits
  * PretrainReportDataset — MIMIC-CXR CSV (img_path, report, llm_output) +
    attention-window CSV (label_i, label_j)
    (Pre-training/module/pretrain_datasets.py:34-239)
  * SIIM / RSNA / RIGA segmentation (Segmentation/utils/my_dataset.py):
    RLE decode, bbox->mask rasterize, disc/cup split, aspect-preserving
    pad-resize, ShiftScaleRotate(scale 0.1, rot 10, p=0.5)
  * RSNADetectionDataset — CSV bboxes xyxy -> normalized cxcywh padded to
    max_objects (Detection/utils/my_dataset.py:18-102)

All return dict samples of numpy arrays (NHWC float32 images).
"""

from __future__ import annotations

import ast
import math
import os
import random
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

from .entity_masking import build_text_example
from .tokenizer import WordPieceTokenizer
from .transforms import TrainTransform, normalize


def _pil_load_rgb(path: str) -> Image.Image:
    with open(path, "rb") as f:
        img = Image.open(f)
        return img.convert("RGB")


# ---------------------------------------------------------------------------
# shared geometry helpers


def resize_pad_square(arr: np.ndarray, scale: int) -> np.ndarray:
    """Aspect-preserving resize (area interpolation) + zero-pad to square
    (Segmentation/utils/my_dataset.py:16-62)."""
    h, w = arr.shape[:2]
    if h >= w:
        nh, nw = scale, int(w * scale / float(h))
    else:
        nw, nh = scale, int(h * scale / float(w))
    try:
        import cv2

        resized = cv2.resize(arr.astype(np.float32), (nw, nh),
                             interpolation=cv2.INTER_AREA)
    except ImportError:  # pragma: no cover
        resized = np.asarray(Image.fromarray(arr.astype(np.float32))
                             .resize((nw, nh), Image.BOX))
    pad_h = scale - nh
    pad_w = scale - nw
    return np.pad(resized,
                  [(pad_h // 2, pad_h - pad_h // 2),
                   (pad_w // 2, pad_w - pad_w // 2)] +
                  [(0, 0)] * (arr.ndim - 2), constant_values=0)


def _reseed_rng(self, epoch: int, worker_id: int) -> None:
    """Shared DataLoader worker-protocol body (data/loader.py): rebind
    `self.rng` to a per-(epoch, worker)-deterministic stream so
    augmentation draws are independent of worker scheduling. Same
    derivation as PretrainReportDataset.reseed."""
    base = (self.seed * 1_000_003 + epoch) * 1_000_003 + worker_id
    self.rng = random.Random(base)


def shift_scale_rotate(img: np.ndarray, mask: Optional[np.ndarray],
                       rng: random.Random, scale_limit: float = 0.1,
                       rotate_limit: float = 10.0, p: float = 0.5
                       ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """albumentations ShiftScaleRotate(shift=0) equivalent: random scale in
    [1-s, 1+s] + rotation about center, constant border."""
    if rng.random() >= p:
        return img, mask
    angle = rng.uniform(-rotate_limit, rotate_limit)
    scale = 1.0 + rng.uniform(-scale_limit, scale_limit)
    theta = math.radians(angle)

    def apply(arr, is_mask):
        h, w = arr.shape[:2]
        cx, cy = w / 2.0, h / 2.0
        cos_t, sin_t = math.cos(theta), math.sin(theta)
        # output->input affine (inverse of scale+rotate about center)
        a = cos_t / scale
        b = sin_t / scale
        c = cx - a * cx - b * cy
        d = -sin_t / scale
        e = cos_t / scale
        f = cy - d * cx - e * cy
        mode = Image.NEAREST if is_mask else Image.BILINEAR
        if arr.ndim == 2:
            pil = Image.fromarray(arr.astype(np.float32), mode="F")
            out = pil.transform((w, h), Image.AFFINE, (a, b, c, d, e, f), mode)
            return np.asarray(out)
        chans = [Image.fromarray(arr[..., i].astype(np.float32), mode="F")
                 .transform((w, h), Image.AFFINE, (a, b, c, d, e, f), mode)
                 for i in range(arr.shape[-1])]
        return np.stack([np.asarray(ch) for ch in chans], axis=-1)

    img = apply(img, False)
    if mask is not None:
        mask = apply(mask, True)
    return img, mask


def _resize_img_linear(arr: np.ndarray, size: int) -> np.ndarray:
    try:
        import cv2

        return cv2.resize(arr.astype(np.float32), (size, size),
                          interpolation=cv2.INTER_LINEAR)
    except ImportError:  # pragma: no cover
        if arr.ndim == 2:
            return np.asarray(Image.fromarray(arr.astype(np.float32), "F")
                              .resize((size, size), Image.BILINEAR))
        return np.stack(
            [np.asarray(Image.fromarray(arr[..., i].astype(np.float32), "F")
                        .resize((size, size), Image.BILINEAR))
             for i in range(arr.shape[-1])], axis=-1)


def _finish_image(img: np.ndarray, mean: float, std: float,
                  output_u8: bool, gray: bool = True) -> np.ndarray:
    """Final feeder step for the seg/det pipelines: host normalize
    (default, reference albumentations semantics), or — for the u8 pipe
    (--u8_pipe) — quantize the interpolated f32 image to u8 and ship
    that; normalize + channel broadcast then run on-device
    (ops/image_ops.py::device_normalize_image). Unlike the pretrain/cls
    transforms, whose f32 path itself normalizes u8-quantized pixels,
    these pipelines interpolate in f32 (SSR / bilinear resize), so the
    u8 pipe rounds to the nearest gray level: a <= 0.5/255 pre-normalize
    delta (~0.0065 post-normalize) is the documented cost of shipping
    1/12 the bytes (tests/test_u8_pipe_finetune.py).

    gray=True: x-ray sources decode via _pil_load_rgb with 3 identical
    channels, and SSR/resize act per-channel — ship 1 channel and let the
    device broadcast. RIGA fundus images are genuinely color: gray=False
    ships 3-channel u8 (1/4 the bytes)."""
    if not output_u8:
        return normalize(img, mean, std).astype(np.float32)
    q = np.clip(np.rint(img), 0.0, 255.0).astype(np.uint8)
    return q[..., :1] if gray else q


def rle2mask(rle: str, width: int, height: int) -> np.ndarray:
    """SIIM run-length decode (my_dataset.py:151-164, incl. its
    transpose/orientation convention)."""
    mask = np.zeros(width * height)
    array = np.asarray([int(x) for x in rle.split()])
    starts = array[0::2]
    lengths = array[1::2]
    pos = 0
    for start, length in zip(starts, lengths):
        pos += start
        mask[pos:pos + length] = 1
        pos += length
    return mask.reshape(width, height).T


# ---------------------------------------------------------------------------
# classification


class ClassificationListDataset:
    """XRAY list-file dataset. Split files live under
    <list_root>/<task>/{train_list[_1|_10],val_list,test_list}.txt."""

    def __init__(self, list_root: str, image_root: str, task: str,
                 split: str = "train", data_volume: str = "100",
                 transform=None):
        names = {"train": {"1": "train_list_1.txt", "10": "train_list_10.txt",
                           "100": "train_list.txt"}[data_volume],
                 "val": "val_list.txt", "test": "test_list.txt"}
        path = os.path.join(list_root, task, names[split])
        self.samples: List[Tuple[str, np.ndarray]] = []
        with open(path) as f:
            for line in f:
                items = line.split()
                if not items:
                    continue
                self.samples.append(
                    (os.path.join(image_root, items[0]),
                     np.asarray([int(v) for v in items[1:]], np.float32)))
        self.transform = transform

    def reseed(self, epoch: int, worker_id: int) -> None:
        """DataLoader worker protocol: the only stateful RNG here is the
        train transform's crop/flip stream."""
        if hasattr(self.transform, "reseed"):
            self.transform.reseed(epoch, worker_id)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i) -> Dict[str, np.ndarray]:
        path, label = self.samples[i]
        img = _pil_load_rgb(path)
        if self.transform is not None:
            img = self.transform(img)
        else:
            img = np.asarray(img, np.float32) / 255.0
        if img.dtype != np.uint8:  # u8 pipe: keep the wire dtype
            img = img.astype(np.float32)
        return {"image": img, "label": label}


# ---------------------------------------------------------------------------
# pre-training


class PretrainReportDataset:
    """MIMIC-CXR entity-LLM pretrain dataset (pretrain_datasets.py:34-239).

    data_root must contain mimic-cxr-2.0.0-entity-llm.csv,
    mimic-cxr-2.0.0-attn-label.csv and mimic_wordpiece.json.
    """

    def __init__(self, data_root: str, img_size: int = 448,
                 max_caption_length: int = 256, seed: int = 0,
                 tokenizer: Optional[WordPieceTokenizer] = None,
                 image_dtype=np.float32):
        """image_dtype: np.float32; ml_dtypes.bfloat16 to halve H2D
        bytes; or np.uint8 to ship the quantized single-channel gray
        (1/12 the f32 bytes) and normalize + broadcast on-device
        (train/pretrain.py::device_normalize) —
        transfer bytes — bit-identical downstream because the model's
        first op casts the image to its compute dtype anyway
        (nn/mae.py: batch['image'].astype(self.dtype))."""
        import pandas as pd

        self.data_root = data_root
        self.max_caption_length = max_caption_length
        df = pd.read_csv(os.path.join(data_root, "mimic-cxr-2.0.0-entity-llm.csv"))
        df_attn = pd.read_csv(os.path.join(data_root,
                                           "mimic-cxr-2.0.0-attn-label.csv"))
        self.images = df["img_path"].tolist()
        self.reports = df["report"].tolist()
        self.llm_outputs = df["llm_output"].tolist()
        self.attn_i = df_attn["label_i"].tolist()
        self.attn_j = df_attn["label_j"].tolist()
        self.tokenizer = tokenizer or WordPieceTokenizer.from_file(
            os.path.join(data_root, "mimic_wordpiece.json"))
        self.tokenizer.enable_native()
        self.transform = TrainTransform(img_size, mean=0.4721, std=0.3037,
                                        scale=(0.2, 1.0),
                                        interpolation="bicubic", seed=seed,
                                        output_u8=image_dtype == np.uint8)
        self.rng = random.Random(seed)
        self.seed = seed
        self.image_dtype = image_dtype

    def reseed(self, epoch: int, worker_id: int) -> None:
        """DataLoader mp-worker protocol: give this (forked) worker an
        independent, per-epoch-deterministic RNG stream for the stateful
        augmentation/masking draws — torch DataLoader worker semantics
        (each worker re-seeds per epoch; reference main_pretrain.py
        relies on the same property for resumable shuffling)."""
        base = (self.seed * 1_000_003 + epoch) * 1_000_003 + worker_id
        self.rng = random.Random(base)
        self.transform.reseed(epoch, worker_id)
        # spawn-context workers receive the dataset pickled WITHOUT the
        # ctypes tokenizer handle — re-attach the C++ fast path here
        self.tokenizer.enable_native()

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i) -> Dict[str, np.ndarray]:
        # fused decode+transform (draft-scaled JPEG decode, L-mode path)
        image = self.transform.load(self.images[i])
        text = build_text_example(str(self.reports[i]),
                                  str(self.llm_outputs[i]), self.tokenizer,
                                  self.rng, self.max_caption_length)
        return dict(text, image=image.astype(self.image_dtype),
                    column=np.int32(self.attn_i[i]),
                    row=np.int32(self.attn_j[i]))


# ---------------------------------------------------------------------------
# segmentation


class SIIMSegmentationDataset:
    """SIIM-ACR pneumothorax (my_dataset.py:65-194): RLE masks at 1024,
    positive/negative balancing for train, ShiftScaleRotate, resize+norm."""

    def __init__(self, list_root: str, image_root: str, split: str,
                 img_size: int = 224, data_volume: str = "100",
                 mean: float = 0.4722, std: float = 0.3028, seed: int = 0,
                 output_u8: bool = False):
        import pandas as pd

        names = {"train": {"1": "train_list_1.csv", "10": "train_list_10.csv",
                           "100": "train_list.csv"}[data_volume],
                 "val": "val_list.csv", "test": "test_list.csv"}
        df = pd.read_csv(os.path.join(list_root, "SIIM", names[split]))
        df["ImagePath"] = df["ImageId"].apply(lambda x: os.path.join(
            image_root, "train/images/1024/dicom/" + x + ".png"))
        df["class"] = df["EncodedPixels"].apply(lambda v: v != "-1")
        if split == "train":
            pos = df[df["class"]]
            neg = df[~df["class"]]
            n_pos = pos["ImageId"].nunique()
            rng = np.random.default_rng(seed)
            chosen = rng.choice(neg["ImageId"].unique(),
                                size=min(n_pos, neg["ImageId"].nunique()),
                                replace=False)
            df = pd.concat([pos, neg[neg["ImageId"].isin(chosen)]])
        self.df = df
        self.groups = df.groupby("ImageId")
        self.img_ids = df["ImageId"].unique().tolist()
        self.split = split
        self.img_size = img_size
        self.mean, self.std = mean, std
        self.output_u8 = output_u8
        self.seed = seed
        self.rng = random.Random(seed)

    reseed = _reseed_rng

    def __len__(self):
        return len(self.img_ids)

    def __getitem__(self, i) -> Dict[str, np.ndarray]:
        g = self.groups.get_group(self.img_ids[i])
        img = np.asarray(_pil_load_rgb(g.iloc[0]["ImagePath"]), np.float32)
        rles = g["EncodedPixels"].tolist()
        mask = np.zeros([1024, 1024], np.float32)
        if rles[0] != "-1":
            for rle in rles:
                mask += rle2mask(rle, 1024, 1024)
        mask = (mask >= 1).astype(np.float32)
        mask = resize_pad_square(mask, self.img_size)
        if self.split == "train":
            img, _ = shift_scale_rotate(img, None, self.rng)
        img = _resize_img_linear(img, self.img_size)
        img = _finish_image(img, self.mean, self.std, self.output_u8)
        return {"image": img,
                "mask": mask[..., None].astype(np.float32)}


class RSNASegmentationDataset:
    """RSNA pneumonia as segmentation (my_dataset.py:196-292): bbox
    rasterized at 1024, mask bilinear-resized WITH the image (note: unlike
    SIIM, the reference resizes the RSNA mask bilinearly via albumentations
    Resize, producing fractional edge values — preserved here)."""

    def __init__(self, list_root: str, image_root: str, split: str,
                 img_size: int = 224, data_volume: str = "100",
                 mean: float = 0.4722, std: float = 0.3028, seed: int = 0,
                 output_u8: bool = False):
        import pandas as pd

        names = {"train": {"1": "train_list_1.csv", "10": "train_list_10.csv",
                           "100": "train_list.csv"}[data_volume],
                 "val": "val_list.csv", "test": "test_list.csv"}
        df = pd.read_csv(os.path.join(list_root, "RSNA", names[split]))
        self.img_paths = [os.path.join(image_root, p)
                          for p in df["image_path"].tolist()]
        self.bboxes = df["bbox"].tolist()
        self.split = split
        self.img_size = img_size
        self.mean, self.std = mean, std
        self.output_u8 = output_u8
        self.seed = seed
        self.rng = random.Random(seed)

    reseed = _reseed_rng

    def __len__(self):
        return len(self.img_paths)

    def __getitem__(self, i) -> Dict[str, np.ndarray]:
        img = np.asarray(_pil_load_rgb(self.img_paths[i]), np.float32)
        mask = np.zeros((1024, 1024), np.float32)
        bbox = np.asarray(ast.literal_eval(self.bboxes[i]))
        valid = bbox[bbox[:, 3] > 0].astype(np.int64)
        for b in valid:
            mask[b[1]:b[3], b[0]:b[2]] += 1
        mask = (mask >= 1).astype(np.float32)
        if self.split == "train":
            img, mask = shift_scale_rotate(img, mask, self.rng)
        img = _resize_img_linear(img, self.img_size)
        mask = _resize_img_linear(mask, self.img_size)
        img = _finish_image(img, self.mean, self.std, self.output_u8)
        return {"image": img,
                "mask": mask[..., None].astype(np.float32)}


class RIGASegmentationDataset:
    """RIGA disc/cup (my_dataset.py:294-397): mask png -> disc = (m != 0),
    cup = (m == 1) channels; pad-resize mask; image bilinear resize."""

    def __init__(self, list_root: str, image_root: str, split: str,
                 img_size: int = 224, data_volume: str = "100",
                 mean: float = 0.4722, std: float = 0.3028, seed: int = 0,
                 output_u8: bool = False):
        import pandas as pd

        names = {"train": {"1": "train_list_1.csv", "10": "train_list_10.csv",
                           "100": "train_list.csv"}[data_volume],
                 "val": "val_list.csv", "test": "test_list.csv"}
        df = pd.read_csv(os.path.join(list_root, "RIGA", names[split]))
        self.img_paths = [os.path.join(image_root, p)
                          for p in df["img_path"].tolist()]
        self.mask_paths = [os.path.join(image_root, p)
                           for p in df["mask_path"].tolist()]
        self.split = split
        self.img_size = img_size
        self.mean, self.std = mean, std
        self.output_u8 = output_u8
        self.seed = seed
        self.rng = random.Random(seed)

    reseed = _reseed_rng

    def __len__(self):
        return len(self.img_paths)

    def __getitem__(self, i) -> Dict[str, np.ndarray]:
        img = np.asarray(_pil_load_rgb(self.img_paths[i]), np.float32)
        with open(self.mask_paths[i], "rb") as f:
            mask = np.asarray(Image.open(f).convert("L"), np.float32)
        mask = resize_pad_square(mask, self.img_size)
        if mask.max() > 1:
            mask = mask / 255.0
        disc = (mask != 0).astype(np.float32)
        cup = np.where(mask == 1, mask, 0).astype(np.float32)
        stacked = np.stack([disc, cup], axis=-1)  # (H, W, 2)
        if self.split == "train":
            img, stacked = shift_scale_rotate(img, stacked, self.rng)
        img = _resize_img_linear(img, self.img_size)
        # RIGA fundus photographs are genuinely color: the u8 pipe ships
        # 3-channel u8 (gray=False)
        img = _finish_image(img, self.mean, self.std, self.output_u8,
                            gray=False)
        return {"image": img,
                "mask": stacked.astype(np.float32)}


# ---------------------------------------------------------------------------
# detection


class ObjectCXRDetectionDataset:
    """Object-CXR foreign-object detection
    (Detection/utils/my_dataset.py:106-209): CSV of image names under
    <image_root>/resize/ with precomputed per-image label arrays
    <name>.npy (rows [cls, cx, cy, w, h], padded)."""

    def __init__(self, list_root: str, image_root: str, split: str,
                 img_size: int = 224, data_volume: str = "100",
                 max_objects: int = 20, mean: float = 0.4722,
                 std: float = 0.3028, output_u8: bool = False):
        import pandas as pd

        names = {"train": {"1": "train_list_1.csv", "10": "train_list_10.csv",
                           "100": "train_list.csv"}[data_volume],
                 "val": "test_list.csv", "test": "test_list.csv"}
        df = pd.read_csv(os.path.join(list_root, "ObjectCXR", names[split]))
        df = df.sort_values(by="image_name")
        self.image_dir = os.path.join(image_root, "resize")
        self.names = df["image_name"].tolist()
        self.img_size = img_size
        self.max_objects = max_objects
        self.mean, self.std = mean, std
        self.output_u8 = output_u8

    def __len__(self):
        return len(self.names)

    def __getitem__(self, i) -> Dict[str, np.ndarray]:
        name = self.names[i]
        img = np.asarray(_pil_load_rgb(os.path.join(self.image_dir, name)),
                         np.float32)
        img = _resize_img_linear(img, self.img_size)
        img = _finish_image(img, self.mean, self.std, self.output_u8)
        y = np.load(os.path.join(self.image_dir, name + ".npy"))
        out = np.zeros((self.max_objects, 5), np.float32)
        n = min(len(y), self.max_objects)
        out[:n] = y[:n, :5]
        return {"image": img, "target": out}


class RSNADetectionDataset:
    """RSNA pneumonia detection (Detection/utils/my_dataset.py:18-102):
    CSV xyxy bboxes -> normalized [cls=0, cx, cy, w, h] rows padded to
    max_objects; image bilinear-resized + normalized."""

    def __init__(self, list_root: str, image_root: str, split: str,
                 img_size: int = 224, data_volume: str = "100",
                 max_objects: int = 10, mean: float = 0.4722,
                 std: float = 0.3028, output_u8: bool = False):
        import pandas as pd

        names = {"train": {"1": "train_list_1.csv", "10": "train_list_10.csv",
                           "100": "train_list.csv"}[data_volume],
                 "val": "val_list.csv", "test": "val_list.csv"}
        df = pd.read_csv(os.path.join(list_root, "RSNA", names[split]))
        self.img_paths = [os.path.join(image_root, p)
                          for p in df["image_path"].tolist()]
        self.raw_bboxes = df["bbox"].tolist()
        self.img_size = img_size
        self.max_objects = max_objects
        self.mean, self.std = mean, std
        self.output_u8 = output_u8

    def __len__(self):
        return len(self.img_paths)

    def __getitem__(self, i) -> Dict[str, np.ndarray]:
        img = np.asarray(_pil_load_rgb(self.img_paths[i]), np.float32)
        h, w = img.shape[:2]
        img = _resize_img_linear(img, self.img_size)
        img = _finish_image(img, self.mean, self.std, self.output_u8)

        bbox = np.asarray(ast.literal_eval(self.raw_bboxes[i]), np.float32)
        out = np.zeros((self.max_objects, 5), np.float32)
        n = min(len(bbox), self.max_objects)
        if n > 0:
            cx = (bbox[:n, 0] + bbox[:n, 2]) / 2.0 / w
            cy = (bbox[:n, 1] + bbox[:n, 3]) / 2.0 / h
            bw = (bbox[:n, 2] - bbox[:n, 0]) / w
            bh = (bbox[:n, 3] - bbox[:n, 1]) / h
            out[:n, 1], out[:n, 2], out[:n, 3], out[:n, 4] = cx, cy, bw, bh
        return {"image": img, "target": out}
