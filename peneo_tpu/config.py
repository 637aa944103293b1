"""Configuration system.

Plain dataclasses + JSON, wire-compatible with the reference's HF-style
``config.json`` (reference: model/configuration_peneo.py:6-37 and
tools/generate_peneo_weights.py:63-74 — nested ``backbone_config`` dict).

We deliberately avoid depending on ``transformers.PretrainedConfig``: configs
here are pure data, loadable from reference-produced directories.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional


def _filtered_kwargs(cls, d: Dict[str, Any]) -> Dict[str, Any]:
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in d.items() if k in names}


@dataclass
class LiltConfig:
    """LiLT backbone config (reference: model/backbone/lilt/configuration_lilt.py:6-47)."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    initializer_range: float = 0.02
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0
    position_embedding_type: str = "absolute"
    channel_shrink_ratio: int = 4
    max_2d_position_embeddings: int = 1024
    model_type: str = "lilt"

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "LiltConfig":
        return cls(**_filtered_kwargs(cls, d))

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


@dataclass
class LayoutLMv3Config:
    """LayoutLMv3 backbone config (reference: model/backbone/layoutlmv3/configuration_layoutlmv3.py)."""

    vocab_size: int = 50265
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    initializer_range: float = 0.02
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1
    max_2d_position_embeddings: int = 1024
    coordinate_size: int = 128
    shape_size: int = 128
    has_relative_attention_bias: bool = True
    rel_pos_bins: int = 32
    max_rel_pos: int = 128
    has_spatial_attention_bias: bool = True
    rel_2d_pos_bins: int = 64
    max_rel_2d_pos: int = 256
    visual_embed: bool = True
    input_size: int = 224
    patch_size: int = 16
    num_channels: int = 3
    model_type: str = "layoutlmv3"

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "LayoutLMv3Config":
        return cls(**_filtered_kwargs(cls, d))

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


@dataclass
class LayoutLMv2Config:
    """LayoutLMv2/LayoutXLM backbone config (reference imports HF transformers
    ``LayoutLMv2Config``; reference: model/backbone_mapping.py:19-24)."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    initializer_range: float = 0.02
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0
    max_2d_position_embeddings: int = 1024
    coordinate_size: int = 128
    shape_size: int = 128
    has_relative_attention_bias: bool = True
    rel_pos_bins: int = 32
    max_rel_pos: int = 128
    has_spatial_attention_bias: bool = True
    rel_2d_pos_bins: int = 64
    max_rel_2d_pos: int = 256
    fast_qkv: bool = True
    image_feature_pool_shape: List[int] = field(default_factory=lambda: [7, 7, 256])
    # visual-tower geometry (detectron2 layoutlmv2 = ResNeXt-101 (3,4,23,3)
    # on 224px inputs; lighter settings for synthetic/CI runs)
    visual_depths: List[int] = field(default_factory=lambda: [3, 4, 23, 3])
    input_size: int = 224
    # detectron2 pixel normalization (BGR order, matching the BGR 0-255 input
    # from data/image_processing.layoutlmv2_preprocess)
    pixel_mean: List[float] = field(
        default_factory=lambda: [103.530, 116.280, 123.675])
    pixel_std: List[float] = field(
        default_factory=lambda: [57.375, 57.120, 58.395])
    model_type: str = "layoutlmv2"

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "LayoutLMv2Config":
        return cls(**_filtered_kwargs(cls, d))

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


BACKBONE_CONFIG_CLASSES = {
    "lilt": LiltConfig,
    "layoutlmv3": LayoutLMv3Config,
    "layoutlmv2": LayoutLMv2Config,
}


@dataclass
class PEneoConfig:
    """Top-level model config (reference: model/configuration_peneo.py:6-37).

    ``backbone_config`` is stored as a plain dict (wire format identical to the
    reference's nested dict); use :meth:`backbone` for the typed view.
    """

    backbone_name: Optional[str] = None
    backbone_config: Optional[Dict[str, Any]] = None
    initializer_range: float = 0.02
    peneo_decoder_shrink: bool = True
    peneo_classifier_num_layers: int = 2
    peneo_loss_ratio: List[float] = field(default_factory=lambda: [1.0] * 5)
    peneo_category_weights: List[float] = field(default_factory=lambda: [1.0] * 3)
    peneo_ohem_num_positive: int = -1
    peneo_ohem_num_negative: int = -1
    peneo_downstream_speedup_ratio: float = 1.0
    inference_mode: bool = False
    # TPU-specific knobs (extensions; absent from the reference)
    max_seq_len: int = 512          # static padded sequence length incl. CLS/SEP
    pair_block_size: int = 128      # row-block size for the blockwise pair head
    dtype: str = "bfloat16"         # compute dtype for the jitted model
    use_flash_attention: bool = False   # Pallas flash attention (inference / no-attn-dropout)
    # dim-80-aware fused BiACM attention kernel (LiLT; inference only):
    # separate d=64/d=16 score matmuls + shared softmax (ops/biacm_attention)
    use_fused_biacm: bool = False
    # training variant (custom VJP + in-kernel hardware-PRNG dropout);
    # TPU-only when attention dropout is active
    use_fused_biacm_train: bool = False
    # fused rel-bias attention kernel for LayoutLMv3/v2 (inference only):
    # q·kᵀ + precomputed rel-pos bias + softmax + p·v in VMEM, the (L, L)
    # score/prob tensors never round-trip HBM (ops/bias_attention). Falls
    # back to XLA attention when dropout is active or the padded image-token
    # length would waste >10% extra score FLOPs.
    use_fused_bias_attention: bool = False
    # training variant for the rel-bias families (custom VJP + in-kernel
    # hardware-PRNG dropout + dbias into the trained bias tables);
    # TPU-only when attention dropout is active
    use_fused_bias_attention_train: bool = False
    gradient_checkpointing: bool = False  # remat backbone layers (memory vs FLOPs)
    # inference: ship only the top-k nonzero triu spots per head to host
    # (0 = dense (L, L) tag/score maps, used by tests/parity)
    max_spots_per_head: int = 512
    # spot-extraction top-k: "approx" = jax.lax.approx_max_k (the TPU-native
    # partial-reduce op; recall_target 0.99; measured ~2.5x faster than the
    # full variadic sort at L=512). k is sized far above real per-head spot
    # counts and trained spots score near 1.0 vs the -1 empty filler, so any
    # recall loss lands on the empty tail; spot_count still flags overflow.
    # On non-TPU backends approx_max_k lowers to the exact sort, so CPU runs
    # are bit-identical to "exact". Set "exact" to force lax.top_k anywhere.
    spot_topk: str = "approx"
    # streaming spot extraction: reduce each pair-grid row block to its own
    # top-k candidates as it is produced and merge once at the end, instead
    # of materializing the five dense (B, L, L) tag+score maps and top-k'ing
    # the full grid (models/decoder.block_spot_candidates). Skips ~10·L²·B
    # bytes of HBM writes per batch — but the v5e A/B (docs §8, round 5)
    # measured the DENSE path faster at 6 of 7 geometries (streaming won
    # only LiLT L=2048 B=8 at +9.4%, lost 15-31% elsewhere): XLA fuses the
    # argmax/max into the pair-head epilogue, while the per-block top-k sits
    # on the critical path. Default stays False; kept as an opt-in knob.
    # Ties at the k-boundary may resolve differently than the dense path
    # (both orders are valid top-k sets; spot_count ≤ k — the trained-model
    # regime — is unaffected).
    spot_streaming: bool = False
    # serving-only quantization of the pair head's dominant matmul (each
    # head's first classifier layer, ~2/3 of per-page FLOPs): "int8" runs it
    # s8×s8→s32 on the MXU (2× the bf16 peak on v5e) with per-row dynamic
    # activation scales and per-channel weight scales, dequantized before
    # bias+silu. Active only on deterministic forwards; training and the
    # sp stacked-weight path keep full precision. None = off (default).
    quantize_pair_head: Optional[str] = None
    # serving-only int8 for the backbone's projection/MLP matmuls (all
    # three text encoders; v2's conv tower stays full precision; same
    # Int8Dense, gated per-call on deterministic forwards)
    quantize_backbone: Optional[str] = None
    model_type: str = "peneo"

    def __post_init__(self):
        if self.peneo_loss_ratio is not None:
            assert len(self.peneo_loss_ratio) == 5, "loss_ratio must have 5 elements"
        if self.peneo_category_weights is not None:
            assert len(self.peneo_category_weights) == 3, "category_weights must have 3 elements"
        assert self.spot_topk in ("exact", "approx"), self.spot_topk
        assert self.quantize_pair_head in (None, "int8"), \
            self.quantize_pair_head
        assert self.quantize_backbone in (None, "int8"), \
            self.quantize_backbone

    # --- typed backbone view -------------------------------------------------
    def backbone_family(self) -> str:
        name = (self.backbone_name or "").lower()
        if "lilt" in name:
            return "lilt"
        if "layoutlmv3" in name:
            return "layoutlmv3"
        if "layoutxlm" in name or "layoutlmv2" in name:
            return "layoutlmv2"
        bt = (self.backbone_config or {}).get("model_type", "")
        if bt in BACKBONE_CONFIG_CLASSES:
            return bt
        raise ValueError(f"cannot infer backbone family from {self.backbone_name!r}")

    def backbone(self):
        cls = BACKBONE_CONFIG_CLASSES[self.backbone_family()]
        return cls.from_dict(self.backbone_config or {})

    # --- (de)serialization ----------------------------------------------------
    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "PEneoConfig":
        return cls(**_filtered_kwargs(cls, d))

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_pretrained(cls, path: str) -> "PEneoConfig":
        cfg_path = path if path.endswith(".json") else os.path.join(path, "config.json")
        with open(cfg_path, "r", encoding="utf-8") as f:
            return cls.from_dict(json.load(f))

    def save_pretrained(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "config.json"), "w", encoding="utf-8") as f:
            json.dump(self.to_dict(), f, indent=2, ensure_ascii=False)

    # --- derived quantities ---------------------------------------------------
    def downstream_input_size(self) -> int:
        """Decoder input width (reference: model/modeling_peneo.py:93-100).

        LiLT returns concat(semantic, layout) = H + H//shrink (e.g. 768+192=960).
        """
        bc = self.backbone_config or {}
        h = bc.get("hidden_size", 768)
        if self.backbone_family() == "lilt":
            return h + h // bc.get("channel_shrink_ratio", 4)
        return h

    def decoder_hidden_size(self) -> int:
        bc = self.backbone_config or {}
        h = bc.get("hidden_size", 768)
        return h // 2 if self.peneo_decoder_shrink else self.downstream_input_size()
