from .masking import random_masking, mask_to_pixel, unpatchify, patchify
from .losses import (
    weighted_mlm_loss,
    masked_pixel_losses,
    focal_loss,
    dice_coefficient,
    mixed_loss,
    softmax_cross_entropy,
    sigmoid_bce,
)
from .image_ops import resize_bicubic, resize_bilinear, normalize_image
from .boxes import box_iou, nms, decode_yolo, average_precision
