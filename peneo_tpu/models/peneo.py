"""PEneoModel: switchable multimodal backbone + PEneo decoder.

Reference: model/modeling_peneo.py:41-175. The wrapper
- runs the backbone,
- strips visual tokens and/or the CLS position from the hidden states (and
  the parallel bbox/attention tensors) per backbone flags
  (modeling_peneo.py:138-163),
- applies dropout, then the decoder.

Sequence-length contract: inputs are padded to the static ``cfg.max_seq_len``
(L). After the CLS strip the decoder operates on Ld = L - 1 positions; labels
must be (B, Ld, Ld). For visual backbones the image tokens live *after* the
text tokens and are dropped before the decoder, exactly like the reference.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..config import PEneoConfig
from .decoder import PEneoDecoder
from .lilt import LiltModel


def build_backbone(cfg: PEneoConfig, dtype, mesh=None):
    fam = cfg.backbone_family()
    remat = cfg.gradient_checkpointing
    if fam == "lilt":
        return LiltModel(cfg.backbone(), dtype=dtype, remat_layers=remat,
                         flash_attention=cfg.use_flash_attention,
                         fused_biacm=getattr(cfg, "use_fused_biacm", False),
                         fused_biacm_train=getattr(
                             cfg, "use_fused_biacm_train", False),
                         mesh=mesh,
                         int8_dense=getattr(
                             cfg, "quantize_backbone", None) == "int8",
                         name="backbone")
    if fam == "layoutlmv3":
        from .layoutlmv3 import LayoutLMv3Model

        return LayoutLMv3Model(cfg.backbone(), dtype=dtype, remat_layers=remat,
                               int8_dense=getattr(
                                   cfg, "quantize_backbone", None) == "int8",
                               fused_attention=getattr(
                                   cfg, "use_fused_bias_attention", False),
                               fused_attention_train=getattr(
                                   cfg, "use_fused_bias_attention_train",
                                   False),
                               mesh=mesh,
                               name="backbone")
    if fam == "layoutlmv2":
        from .layoutlmv2 import LayoutLMv2Model

        bc = cfg.backbone()
        return LayoutLMv2Model(bc, dtype=dtype, remat_layers=remat,
                               visual_depths=tuple(bc.visual_depths),
                               int8_dense=getattr(
                                   cfg, "quantize_backbone", None) == "int8",
                               fused_attention=getattr(
                                   cfg, "use_fused_bias_attention", False),
                               fused_attention_train=getattr(
                                   cfg, "use_fused_bias_attention_train",
                                   False),
                               mesh=mesh,
                               name="backbone")
    raise NotImplementedError(f"backbone family {fam}")


# per-family structural flags (mirrors BACKBONE_MAPPING fields the model needs;
# reference: model/backbone_mapping.py:276-349)
FAMILY_FLAGS = {
    "lilt": dict(add_cls_token=True, has_visual_embeds=False),
    "layoutlmv3": dict(add_cls_token=True, has_visual_embeds=True),
    "layoutlmv2": dict(add_cls_token=True, has_visual_embeds=True),
}


class PEneoModel(nn.Module):
    cfg: PEneoConfig
    dtype: jnp.dtype = jnp.float32
    # (dp, tp[, sp]) jax.sharding.Mesh: when set AND dp×tp > 1, the fused
    # BiACM pallas kernels run under shard_map (batch over dp, heads over
    # tp) instead of being gated off — GSPMD cannot partition a custom call
    mesh: Optional[object] = None

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        bbox: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        image: Optional[jnp.ndarray] = None,
        labels: Optional[Dict[str, jnp.ndarray]] = None,
        deterministic: bool = True,
        return_logits: bool = False,
        also_decode: bool = False,
        return_pair_inputs: bool = False,
        label_row_mask: Optional[jnp.ndarray] = None,
    ):
        cfg = self.cfg
        fam = cfg.backbone_family()
        flags = FAMILY_FLAGS[fam]
        backbone = build_backbone(cfg, self.dtype, mesh=self.mesh)

        if fam == "lilt":
            out = backbone(input_ids, bbox, attention_mask, deterministic=deterministic)
        else:
            out = backbone(input_ids, bbox, attention_mask, image=image,
                           deterministic=deterministic)
        hidden = out["last_hidden_state"]

        seq_len = input_ids.shape[1]
        if flags["has_visual_embeds"]:
            if flags["add_cls_token"]:
                hidden = hidden[:, 1:seq_len]
            else:
                hidden = hidden[:, :seq_len]
        elif flags["add_cls_token"]:
            hidden = hidden[:, 1:]

        drop = (cfg.backbone_config or {}).get("hidden_dropout_prob", 0.1)
        hidden = nn.Dropout(drop)(hidden, deterministic=deterministic)

        decoder = PEneoDecoder(cfg, self.dtype, name="peneo_decoder")
        return decoder(hidden, labels=labels, deterministic=deterministic,
                       return_logits=return_logits, also_decode=also_decode,
                       return_pair_inputs=return_pair_inputs,
                       label_row_mask=label_row_mask)
