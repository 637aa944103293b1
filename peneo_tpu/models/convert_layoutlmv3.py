"""LayoutLMv3 torch state dict → our flax param tree.

Key conventions beyond models/convert.py: the patch-embed conv kernel
transposes (H, C, kh, kw) → (kh, kw, C, H); the three relative-bias Linear
weights (heads, bins) become gather tables (bins, heads).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from .convert import _emb, _lin, _ln, _set


def convert_layoutlmv3_backbone(sd: Dict[str, np.ndarray], prefix: str = "") -> Dict:
    p = prefix
    t: Dict = {}
    emb = ("embeddings",)
    _emb(t, emb + ("word_embeddings",), sd, p + "embeddings.word_embeddings")
    _emb(t, emb + ("token_type_embeddings",), sd,
         p + "embeddings.token_type_embeddings")
    _emb(t, emb + ("position_embeddings",), sd, p + "embeddings.position_embeddings")
    for c in ("x", "y", "h", "w"):
        _emb(t, emb + (f"{c}_position_embeddings",), sd,
             p + f"embeddings.{c}_position_embeddings")
    _ln(t, emb + ("LayerNorm",), sd, p + "embeddings.LayerNorm")

    if p + "patch_embed.proj.weight" in sd:
        w = sd[p + "patch_embed.proj.weight"]  # (H, C, kh, kw)
        _set(t, ("patch_proj", "kernel"), np.transpose(w, (2, 3, 1, 0)))
        _set(t, ("patch_proj", "bias"), sd[p + "patch_embed.proj.bias"])
        _set(t, ("cls_token",), sd[p + "cls_token"])
        _set(t, ("pos_embed",), sd[p + "pos_embed"])
        _ln(t, ("visual_norm",), sd, p + "norm")
        _ln(t, ("post_concat_LayerNorm",), sd, p + "LayerNorm")

    for key, ours in (("rel_pos_bias", "rel_pos_bias"),
                      ("rel_pos_x_bias", "rel_pos_x_bias"),
                      ("rel_pos_y_bias", "rel_pos_y_bias")):
        src = p + f"encoder.{key}.weight"
        if src in sd:
            _set(t, (ours,), np.transpose(sd[src]))  # (heads, bins) → table

    i = 0
    while p + f"encoder.layer.{i}.attention.self.query.weight" in sd:
        src = p + f"encoder.layer.{i}."
        dst = (f"layer_{i}",)
        for name in ("query", "key", "value"):
            _lin(t, dst + (name,), sd, src + f"attention.self.{name}")
        _lin(t, dst + ("attention_output_dense",), sd, src + "attention.output.dense")
        _ln(t, dst + ("attention_output_LayerNorm",), sd,
            src + "attention.output.LayerNorm")
        _lin(t, dst + ("intermediate",), sd, src + "intermediate.dense")
        _lin(t, dst + ("output_dense",), sd, src + "output.dense")
        _ln(t, dst + ("output_LayerNorm",), sd, src + "output.LayerNorm")
        i += 1
    return t
