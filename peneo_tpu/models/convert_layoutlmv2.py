"""LayoutLMv2/LayoutXLM torch state dict → our flax param tree.

Transformer part maps directly (fast_qkv kernel + q/v biases, bias tables as
gather tables). The detectron2 visual tower converts via FrozenBN folding:
``FrozenBatchNorm2d`` is a per-channel affine, so it folds into the preceding
conv's kernel/bias (fold_conv_frozen_bn) — our ResNeXt-FPN then runs plain
biased convs. The detectron2 pixel mean/std normalization and our /255 input
scaling fold into the stem conv the same way.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from .convert import _emb, _lin, _ln, _set

BN_EPS = 1e-5


def fold_conv_frozen_bn(conv_w, bn_w, bn_b, bn_mean, bn_var,
                        eps: float = BN_EPS):
    """Fold y = FrozenBN(conv(x)) into a single biased conv.

    conv_w: (out, in, kh, kw) torch layout; returns (flax kernel, bias).
    Note the *input*-side pixel normalization cannot fold into the conv —
    padding zeros live in normalized space — so the model applies it as an
    explicit elementwise op (models/layoutlmv2.py forward).
    """
    conv_w = np.asarray(conv_w, dtype=np.float64)
    s = np.asarray(bn_w, np.float64) / np.sqrt(np.asarray(bn_var, np.float64) + eps)
    kernel = (conv_w * s[:, None, None, None]).transpose(2, 3, 1, 0)
    bias = np.asarray(bn_b, np.float64) - np.asarray(bn_mean, np.float64) * s
    return kernel.astype(np.float32), bias.astype(np.float32)


def _fold(t, dst, sd, key):
    kernel, bias = fold_conv_frozen_bn(
        sd[key + ".weight"], sd[key + ".norm.weight"], sd[key + ".norm.bias"],
        sd[key + ".norm.running_mean"], sd[key + ".norm.running_var"])
    _set(t, dst + ("conv", "kernel"), kernel)
    _set(t, dst + ("conv", "bias"), bias)


def convert_visual_backbone(sd: Dict[str, np.ndarray],
                            depths: Sequence[int] = (3, 4, 23, 3),
                            prefix: str = "visual.backbone.") -> Dict:
    """detectron2 ResNeXt-FPN weights → our ResNeXtFPN tree (BN folded).

    Inputs stay BGR 0-255 end to end (data/image_processing +
    config.pixel_mean/std), so no channel flip is needed."""
    t: Dict = {}
    p = prefix + "bottom_up."
    _fold(t, ("stem",), sd, p + "stem.conv1")

    for stage, depth in enumerate(depths):
        res = f"res{stage + 2}"
        for blk in range(depth):
            src = f"{p}{res}.{blk}."
            dst = (f"{res}_{blk}",)
            for conv in ("conv1", "conv2", "conv3"):
                _fold(t, dst + (conv,), sd, src + conv)
            if src + "shortcut.weight" in sd:
                _fold(t, dst + ("shortcut",), sd, src + "shortcut")
    for i in range(2, 6):
        _fold(t, (f"fpn_lateral{i}",), sd, prefix + f"fpn_lateral{i}") \
            if prefix + f"fpn_lateral{i}.norm.weight" in sd else _plain_conv(
            t, (f"fpn_lateral{i}",), sd, prefix + f"fpn_lateral{i}")
    if prefix + "fpn_output2.norm.weight" in sd:
        _fold(t, ("fpn_output2",), sd, prefix + "fpn_output2")
    else:
        _plain_conv(t, ("fpn_output2",), sd, prefix + "fpn_output2")
    return t


def _plain_conv(t, dst, sd, key):
    _set(t, dst + ("conv", "kernel"),
         np.asarray(sd[key + ".weight"]).transpose(2, 3, 1, 0))
    if key + ".bias" in sd:
        _set(t, dst + ("conv", "bias"), sd[key + ".bias"])
    else:
        _set(t, dst + ("conv", "bias"),
             np.zeros(sd[key + ".weight"].shape[0], np.float32))


def convert_layoutlmv2_backbone(sd: Dict[str, np.ndarray], prefix: str = "",
                                with_visual: bool = True,
                                depths: Sequence[int] = (3, 4, 23, 3)) -> Dict:
    p = prefix
    t: Dict = {}
    emb = ("embeddings",)
    for name in ("word_embeddings", "position_embeddings",
                 "token_type_embeddings", "x_position_embeddings",
                 "y_position_embeddings", "h_position_embeddings",
                 "w_position_embeddings"):
        _emb(t, emb + (name,), sd, p + f"embeddings.{name}")
    _ln(t, emb + ("LayerNorm",), sd, p + "embeddings.LayerNorm")

    i = 0
    while (p + f"encoder.layer.{i}.attention.self.qkv_linear.weight" in sd
           or p + f"encoder.layer.{i}.attention.self.query.weight" in sd):
        src = p + f"encoder.layer.{i}."
        dst = (f"layer_{i}",)
        if src + "attention.self.qkv_linear.weight" in sd:
            _set(t, dst + ("qkv_linear", "kernel"),
                 np.transpose(sd[src + "attention.self.qkv_linear.weight"]))
            _set(t, dst + ("q_bias",), sd[src + "attention.self.q_bias"])
            _set(t, dst + ("v_bias",), sd[src + "attention.self.v_bias"])
        else:
            for name in ("query", "key", "value"):
                _lin(t, dst + (name,), sd, src + f"attention.self.{name}")
        _lin(t, dst + ("attention_output_dense",), sd, src + "attention.output.dense")
        _ln(t, dst + ("attention_output_LayerNorm",), sd,
            src + "attention.output.LayerNorm")
        _lin(t, dst + ("intermediate",), sd, src + "intermediate.dense")
        _lin(t, dst + ("output_dense",), sd, src + "output.dense")
        _ln(t, dst + ("output_LayerNorm",), sd, src + "output.LayerNorm")
        i += 1

    for key in ("rel_pos_bias", "rel_pos_x_bias", "rel_pos_y_bias"):
        src = p + f"encoder.{key}.weight"
        if src in sd:
            _set(t, (key,), np.transpose(sd[src]))

    if p + "visual_proj.weight" in sd:
        _lin(t, ("visual_proj",), sd, p + "visual_proj")
        _ln(t, ("visual_LayerNorm",), sd, p + "visual_LayerNorm")
    if with_visual and p + "visual.backbone.bottom_up.stem.conv1.weight" in sd:
        t["visual_backbone"] = convert_visual_backbone(
            {k[len(p):]: v for k, v in sd.items() if k.startswith(p + "visual.")},
            depths=depths,
        )
    return t
