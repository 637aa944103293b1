"""Convert reference/HF torch state dicts → peneo_tpu flax param pytrees.

Handles PEneo checkpoints (keys prefixed ``backbone.`` / ``peneo_decoder.``,
written by tools/generate_peneo_weights.py:76-91 in the reference) and raw HF
backbone checkpoints.

Layout conventions:
- torch ``nn.Linear.weight`` is (out, in) → flax Dense ``kernel`` is (in, out):
  transpose.
- torch ``nn.Embedding.weight`` == flax ``Embed.embedding``: copy.
- torch ``nn.LayerNorm.{weight,bias}`` → flax ``{scale,bias}``.
- the reference's HandshakingKernel ``combine_fc.weight`` (H, 2H) acting on
  cat(h_i, h_j) splits into our ``comb_a`` (first H input columns, + bias) and
  ``comb_b`` (last H input columns, no bias) — see models/decoder.py.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

from ..config import PEneoConfig


def _set(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value)


def _lin(tree, path, sd, key):
    _set(tree, path + ("kernel",), np.transpose(sd[key + ".weight"]))
    if key + ".bias" in sd:
        _set(tree, path + ("bias",), sd[key + ".bias"])


def _ln(tree, path, sd, key):
    _set(tree, path + ("scale",), sd[key + ".weight"])
    _set(tree, path + ("bias",), sd[key + ".bias"])


def _emb(tree, path, sd, key):
    _set(tree, path + ("embedding",), sd[key + ".weight"])


def convert_lilt_backbone(sd: Dict[str, np.ndarray], prefix: str = "") -> Dict:
    """Vendored-LiLT torch keys → our LiltModel param tree.

    ``sd`` keys are expected *without* the outer 'backbone.' prefix; pass
    ``prefix`` if the checkpoint nests them (e.g. 'lilt.').
    """
    p = prefix
    t: Dict = {}
    emb = ("embeddings",)
    _emb(t, emb + ("word_embeddings",), sd, p + "embeddings.word_embeddings")
    _emb(t, emb + ("position_embeddings",), sd, p + "embeddings.position_embeddings")
    _emb(t, emb + ("token_type_embeddings",), sd, p + "embeddings.token_type_embeddings")
    _ln(t, emb + ("LayerNorm",), sd, p + "embeddings.LayerNorm")

    lay = ("layout_embeddings",)
    for c in ("x", "y", "h", "w"):
        _emb(t, lay + (f"{c}_position_embeddings",), sd,
             p + f"layout_embeddings.{c}_position_embeddings")
    _emb(t, lay + ("box_position_embeddings",), sd,
         p + "layout_embeddings.box_position_embeddings")
    _lin(t, lay + ("box_linear_embeddings",), sd,
         p + "layout_embeddings.box_linear_embeddings")
    _ln(t, lay + ("LayerNorm",), sd, p + "layout_embeddings.LayerNorm")

    n_layers = 0
    while p + f"encoder.layer.{n_layers}.attention.self.query.weight" in sd:
        n_layers += 1
    for i in range(n_layers):
        src = p + f"encoder.layer.{i}."
        dst = (f"layer_{i}",)
        for name in ("query", "key", "value", "layout_query", "layout_key",
                     "layout_value"):
            _lin(t, dst + ("self_attn", name), sd, src + f"attention.self.{name}")
        _lin(t, dst + ("attn_output", "dense"), sd, src + "attention.output.dense")
        _ln(t, dst + ("attn_output", "LayerNorm"), sd, src + "attention.output.LayerNorm")
        _lin(t, dst + ("layout_attn_output", "dense"), sd,
             src + "attention.layout_output.dense")
        _ln(t, dst + ("layout_attn_output", "LayerNorm"), sd,
            src + "attention.layout_output.LayerNorm")
        _lin(t, dst + ("mlp", "intermediate_dense"), sd, src + "intermediate.dense")
        _lin(t, dst + ("mlp", "output", "dense"), sd, src + "output.dense")
        _ln(t, dst + ("mlp", "output", "LayerNorm"), sd, src + "output.LayerNorm")
        _lin(t, dst + ("layout_mlp", "intermediate_dense"), sd,
             src + "layout_intermediate.dense")
        _lin(t, dst + ("layout_mlp", "output", "dense"), sd, src + "layout_output.dense")
        _ln(t, dst + ("layout_mlp", "output", "LayerNorm"), sd,
            src + "layout_output.LayerNorm")
    return t


def convert_peneo_decoder(sd: Dict[str, np.ndarray], cfg: PEneoConfig,
                          prefix: str = "peneo_decoder.") -> Dict:
    """Reference PEneoDecoder torch keys → our decoder param tree."""
    p = prefix
    t: Dict = {}
    if cfg.peneo_decoder_shrink:
        _lin(t, ("shrink_0",), sd, p + "shrink_projection.0")
        _lin(t, ("shrink_1",), sd, p + "shrink_projection.3")

    w = sd[p + "handshaking_kernel.combine_fc.weight"]  # (H, 2H)
    b = sd[p + "handshaking_kernel.combine_fc.bias"]
    h = w.shape[0]
    _set(t, ("comb_a", "kernel"), np.transpose(w[:, :h]))
    _set(t, ("comb_a", "bias"), b)
    _set(t, ("comb_b", "kernel"), np.transpose(w[:, h:]))

    n_layers = cfg.peneo_classifier_num_layers
    for name in ("line_extraction", "ent_linking_h2h", "ent_linking_t2t",
                 "line_grouping_h2h", "line_grouping_t2t"):
        src = p + f"{name}_fc"
        dst = ("heads", f"{name}_fc")
        if n_layers == 1:
            _lin(t, dst + ("fc_out",), sd, src)
        else:
            # Sequential: [Linear, SiLU, Dropout] * (n-1) + [Linear]
            for i in range(n_layers - 1):
                _lin(t, dst + (f"fc_{i}",), sd, src + f".{3 * i}")
            _lin(t, dst + ("fc_out",), sd, src + f".{3 * (n_layers - 1)}")
    return t


def convert_peneo_checkpoint(sd: Dict[str, np.ndarray], cfg: PEneoConfig) -> Dict:
    """Full reference PEneoModel state dict → our PEneoModel param tree."""
    fam = cfg.backbone_family()
    backbone_sd = {k[len("backbone."):]: v for k, v in sd.items()
                   if k.startswith("backbone.")}
    if fam == "lilt":
        backbone = convert_lilt_backbone(backbone_sd)
    elif fam == "layoutlmv3":
        from .convert_layoutlmv3 import convert_layoutlmv3_backbone

        backbone = convert_layoutlmv3_backbone(backbone_sd)
    elif fam == "layoutlmv2":
        from .convert_layoutlmv2 import convert_layoutlmv2_backbone

        backbone = convert_layoutlmv2_backbone(backbone_sd)
    else:
        raise NotImplementedError(fam)
    params = {"backbone": backbone,
              "peneo_decoder": convert_peneo_decoder(sd, cfg)}
    return params


def merge_params(full: Dict, partial: Dict) -> Dict:
    """Overlay a partial param tree (e.g. a converted backbone) onto freshly
    initialized params; shapes must agree where paths overlap."""
    out = {}
    for k, v in full.items():
        if k in partial:
            if isinstance(v, dict):
                out[k] = merge_params(v, partial[k])
            else:
                pv = partial[k]
                assert tuple(pv.shape) == tuple(v.shape), (
                    f"shape mismatch at {k}: {pv.shape} vs {v.shape}")
                out[k] = pv
        else:
            out[k] = v
    return out


def torch_state_dict_to_numpy(sd) -> Dict[str, np.ndarray]:
    """Detach a torch state dict to numpy (host-side, no torch downstream)."""
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}
