"""LayoutLMv3 backbone + PEneo numerical parity vs the reference torch model
(random weights, converted), text-only and text+image paths."""

import numpy as np
import pytest

from tests.conftest import reference_available, enable_reference_imports
from peneo_tpu.config import LayoutLMv3Config, PEneoConfig
from peneo_tpu.data import tagging as tg

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")

B, L = 2, 14  # includes CLS and SEP; decoder length Ld = 13
TINY = dict(
    vocab_size=120,
    hidden_size=48,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=64,
    hidden_dropout_prob=0.0,
    attention_probs_dropout_prob=0.0,
    max_position_embeddings=80,
    type_vocab_size=1,
    pad_token_id=1,
    layer_norm_eps=1e-5,
    coordinate_size=8,
    shape_size=8,
    max_2d_position_embeddings=1024,
    has_relative_attention_bias=True,
    rel_pos_bins=32,
    max_rel_pos=128,
    has_spatial_attention_bias=True,
    rel_2d_pos_bins=64,
    max_rel_2d_pos=256,
    visual_embed=True,
    input_size=32,  # 2x2 grid of 16px patches → 5 visual tokens
    patch_size=16,
)


def _make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    input_ids = rng.integers(3, 120, (B, L)).astype(np.int64)
    input_ids[1, -3:] = 1  # pad (pad_token_id = 1)
    attn = (input_ids != 1).astype(np.int64)
    x0 = rng.integers(0, 900, (B, L))
    y0 = rng.integers(0, 900, (B, L))
    bbox = np.stack([x0, y0, x0 + rng.integers(1, 100, (B, L)),
                     y0 + rng.integers(1, 100, (B, L))], -1).astype(np.int64)
    bbox[input_ids == 1] = 0
    bbox[:, 0] = 0
    image = rng.normal(size=(B, 3, 32, 32)).astype(np.float32)
    return input_ids, attn, bbox, image


def _build_reference():
    enable_reference_imports()
    import torch
    from model.configuration_peneo import PEneoConfig as RefConfig
    from model.modeling_peneo import PEneoModel as RefModel

    torch.manual_seed(0)
    ref_cfg = RefConfig(
        backbone_name="layoutlmv3-base",
        backbone_config=dict(TINY, model_type="layoutlmv3"),
        inference_mode=True,
    )
    ref = RefModel(ref_cfg)
    ref.eval()
    return ref


def _ours(ref):
    import jax
    import jax.numpy as jnp

    from peneo_tpu.models.convert import (convert_peneo_checkpoint,
                                          torch_state_dict_to_numpy)
    from peneo_tpu.models.peneo import PEneoModel

    cfg = PEneoConfig(
        backbone_name="layoutlmv3-base",
        backbone_config=LayoutLMv3Config.from_dict(TINY).to_dict(),
        pair_block_size=8,
        inference_mode=True,
    )
    params = convert_peneo_checkpoint(
        torch_state_dict_to_numpy(ref.state_dict()), cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return PEneoModel(cfg, dtype=jnp.float32), params


def test_forward_parity_with_image():
    import torch

    ref = _build_reference()
    input_ids, attn, bbox, image = _make_inputs()
    with torch.no_grad():
        ref_out = ref(
            input_ids=torch.tensor(input_ids),
            bbox=torch.tensor(bbox),
            orig_bbox=torch.tensor(bbox),
            attention_mask=torch.tensor(attn),
            image=torch.tensor(image),
        )
    model, params = _ours(ref)
    out = model.apply({"params": params}, input_ids, bbox, attn, image=image,
                      deterministic=True, return_logits=True)
    names = ["line_extraction", "ent_linking_h2h", "ent_linking_t2t",
             "line_grouping_h2h", "line_grouping_t2t"]
    for idx, name in enumerate(names):
        ref_flat = ref_out[idx].numpy()
        dense = np.asarray(out[name]["logits"])
        ours = np.stack([tg.flatten_triu(dense[b]) for b in range(B)])
        np.testing.assert_allclose(ours, ref_flat, atol=1e-3, rtol=5e-3,
                                   err_msg=name)


def test_backbone_parity_text_only():
    """Bare backbone without image (deployment text-only mode)."""
    import jax.numpy as jnp
    import torch

    enable_reference_imports()
    ref = _build_reference()
    bb = ref.backbone
    input_ids, attn, bbox, _ = _make_inputs(seed=3)
    with torch.no_grad():
        ref_h = bb(input_ids=torch.tensor(input_ids), bbox=torch.tensor(bbox),
                   attention_mask=torch.tensor(attn)).last_hidden_state.numpy()

    from peneo_tpu.models.convert_layoutlmv3 import convert_layoutlmv3_backbone
    from peneo_tpu.models.convert import torch_state_dict_to_numpy
    from peneo_tpu.models.layoutlmv3 import LayoutLMv3Model

    params = convert_layoutlmv3_backbone(
        torch_state_dict_to_numpy(bb.state_dict()))
    model = LayoutLMv3Model(LayoutLMv3Config.from_dict(TINY), dtype=jnp.float32)
    out = model.apply({"params": params}, input_ids, bbox, attn,
                      deterministic=True)
    np.testing.assert_allclose(np.asarray(out["last_hidden_state"]), ref_h,
                               atol=1e-4, rtol=1e-3)
