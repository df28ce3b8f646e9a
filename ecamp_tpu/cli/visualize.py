"""Text->image cross-attention heatmap CLI.

Mirrors Visualization/main_visualization.py:106-178: tokenize a prompt,
run the pretrain model with mask_ratio=0 in attention-return mode, take the
head-max of one token's cross-attention row over the 14x14 grid, ^0.25
contrast, min-max normalize, bilinear upsample to 224, jet colormap, 50/50
blend with the (grayscale) image, save vis_heatmap.png.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..core import config as cfg
from ..data.tokenizer import WordPieceTokenizer
from ..data.transforms import normalize, to_grayscale3
from ..nn.mae import ECAMP


def jet_colormap(x: np.ndarray) -> np.ndarray:
    """matplotlib 'jet' approximation in numpy: piecewise-linear RGB."""
    x = np.clip(x, 0.0, 1.0)

    def channel(v, lo_up, hi_up, lo_dn, hi_dn):
        up = np.clip((v - lo_up) / max(hi_up - lo_up, 1e-9), 0, 1)
        dn = 1.0 - np.clip((v - lo_dn) / max(hi_dn - lo_dn, 1e-9), 0, 1)
        return np.minimum(up, dn)

    r = channel(x, 0.375, 0.625, 0.875, 1.125)
    g = channel(x, 0.125, 0.375, 0.625, 0.875)
    b = channel(x, -0.125, 0.125, 0.375, 0.625)
    return np.stack([r, g, b], axis=-1)


def heatmap_from_row(attn_row: np.ndarray, out_size: int = 224) -> np.ndarray:
    """Reference post-processing of one cross-attention text row
    (main_visualization.py:156-167): (H, grid^2) -> reshape to the patch
    grid, max over heads, ^0.25 contrast, min-max normalize, bilinear
    upsample (half-pixel centers == torch align_corners=False) to
    (out_size, out_size). Returns the float map in [0, 1]."""
    grid = int(round(attn_row.shape[-1] ** 0.5))
    attn = attn_row.reshape(attn_row.shape[0], grid, grid)
    amap = attn.max(axis=0) ** 0.25
    amap = (amap - amap.min()) / (amap.max() - amap.min() + 1e-12)
    return np.asarray(jax.image.resize(
        jnp.asarray(amap)[None, :, :, None],
        (1, out_size, out_size, 1), "bilinear"))[0, :, :, 0]


def get_args():
    p = argparse.ArgumentParser("ecamp_tpu visualize")
    p.add_argument("--image", required=True)
    p.add_argument("--text", required=True)
    p.add_argument("--checkpoint", required=True, help=".pth pretrain ckpt")
    p.add_argument("--tokenizer", required=True, help="mimic_wordpiece.json")
    p.add_argument("--token_index", type=int, default=4,
                   help="text token row to visualize (reference uses 4)")
    p.add_argument("--output", default="vis_heatmap.png")
    p.add_argument("--save_original", default="vis_original.png")
    return p.parse_args()


def main():
    from ..core.mesh import enable_compilation_cache, initialize_distributed

    initialize_distributed()  # before any backend query (misc.py:216-248 parity)
    enable_compilation_cache()
    args = get_args()
    vit_cfg = cfg.ViTConfig()
    bert_cfg = cfg.BertConfig()
    max_len = bert_cfg.max_position_embeddings
    tok = WordPieceTokenizer.from_file(args.tokenizer)
    enc = tok.encode("[CLS] " + args.text, max_length=max_len, pad_to=max_len)

    with open(args.image, "rb") as f:
        pil = Image.open(f).convert("RGB")
    pil = pil.resize((224, 224), Image.BILINEAR)
    pil = to_grayscale3(pil)
    origin = np.asarray(pil)
    if args.save_original:
        Image.fromarray(origin[:, :, 0], "L").save(args.save_original)
    img = normalize(origin, 0.4722, 0.3028)[None]

    model = ECAMP(vit=vit_cfg, decoder=cfg.MAEDecoderConfig(),
                  bert=bert_cfg, dtype=jnp.float32)
    batch = {
        # feed 224 directly — the model skips the 448->224 resize for
        # inputs already at encoder resolution, matching the reference viz
        # forward (Visualization/module/model_ecamp.py:308-319)
        "image": jnp.asarray(img),
        "ids": jnp.asarray(enc.ids)[None],
        "attention_mask": jnp.asarray(enc.attention_mask)[None],
        "type_ids": jnp.asarray(enc.type_ids)[None],
    }
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           mask_ratio=0.0, deterministic=True)
    from ..ckpt import import_ecamp_pretrain

    variables, loaded, _ = import_ecamp_pretrain(variables, args.checkpoint)
    print(f"loaded {len(loaded)} tensors from {args.checkpoint}")

    out = model.apply(variables, batch, mask_ratio=0.0, deterministic=True,
                      return_cross_probs=True)
    # (1, H, L_text, grid^2) -> token row -> normalized 224 map
    attn = np.asarray(out["cross_attention"])[0, :, args.token_index]
    amap = heatmap_from_row(attn, out_size=224)
    color = (jet_colormap(amap) * 255).astype(np.uint8)
    blended = (0.5 * origin + 0.5 * color).astype(np.uint8)
    Image.fromarray(blended).save(args.output)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
