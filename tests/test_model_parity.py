"""Numerical parity: reference torch PEneoModel (LiLT) vs peneo_tpu flax model
with converted weights — SURVEY.md §7.3 calls this the single most valuable
test. Covers forward logits (inference mode) and the 5-head training loss."""

import numpy as np
import pytest

from tests.conftest import reference_available, enable_reference_imports
from peneo_tpu.config import LiltConfig, PEneoConfig
from peneo_tpu.data import tagging as tg

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")

B, L = 2, 16  # L includes CLS; decoder length Ld = 15
TINY = dict(
    vocab_size=100,
    hidden_size=48,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=64,
    hidden_dropout_prob=0.0,
    attention_probs_dropout_prob=0.0,
    max_position_embeddings=64,
    channel_shrink_ratio=4,
    max_2d_position_embeddings=1024,
)

HEADS = [
    ("line_extraction", "line_extraction_shaking_tag"),
    ("ent_linking_h2h", "ent_linking_head_rel_shaking_tag"),
    ("ent_linking_t2t", "ent_linking_tail_rel_shaking_tag"),
    ("line_grouping_h2h", "line_grouping_head_rel_shaking_tag"),
    ("line_grouping_t2t", "line_grouping_tail_rel_shaking_tag"),
]


def _make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    input_ids = rng.integers(2, 100, (B, L)).astype(np.int64)
    input_ids[1, -4:] = 0  # pad (LiLT pad_token_id = 0)
    attn = (input_ids != 0).astype(np.int64)
    x0 = rng.integers(0, 900, (B, L))
    y0 = rng.integers(0, 900, (B, L))
    bbox = np.stack([x0, y0, x0 + rng.integers(1, 100, (B, L)),
                     y0 + rng.integers(1, 100, (B, L))], axis=-1).astype(np.int64)
    bbox[input_ids == 0] = 0
    bbox[:, 0] = 0  # CLS box
    return input_ids, attn, bbox


def _build_reference(peneo_kwargs):
    enable_reference_imports()
    import torch
    from model.configuration_peneo import PEneoConfig as RefConfig
    from model.modeling_peneo import PEneoModel as RefModel

    torch.manual_seed(0)
    ref_cfg = RefConfig(
        backbone_name="lilt-infoxlm-base",
        backbone_config=dict(TINY, model_type="lilt", pad_token_id=0),
        **peneo_kwargs,
    )
    ref = RefModel(ref_cfg)
    ref.eval()
    return ref


def _our_model_and_params(ref, peneo_kwargs):
    import jax.numpy as jnp

    from peneo_tpu.models.convert import (convert_peneo_checkpoint,
                                          torch_state_dict_to_numpy)
    from peneo_tpu.models.peneo import PEneoModel

    cfg = PEneoConfig(
        backbone_name="lilt-infoxlm-base",
        backbone_config=LiltConfig.from_dict(dict(TINY, pad_token_id=0)).to_dict(),
        pair_block_size=8,
        **peneo_kwargs,
    )
    params = convert_peneo_checkpoint(
        torch_state_dict_to_numpy(ref.state_dict()), cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return PEneoModel(cfg, dtype=jnp.float32), params, cfg


import jax  # noqa: E402  (after conftest set platform)


def test_forward_logits_parity():
    import torch

    ref = _build_reference(dict(inference_mode=True))
    input_ids, attn, bbox = _make_inputs()
    with torch.no_grad():
        ref_out = ref(
            input_ids=torch.tensor(input_ids),
            bbox=torch.tensor(bbox),
            orig_bbox=torch.tensor(bbox),
            attention_mask=torch.tensor(attn),
        )
    model, params, cfg = _our_model_and_params(ref, dict(inference_mode=True))
    out = model.apply({"params": params}, input_ids, bbox, attn,
                      deterministic=True, return_logits=True)

    Ld = L - 1
    for idx, (name, _) in enumerate(HEADS):
        ref_flat = ref_out[idx].numpy()  # (B, P, C)
        ours_dense = np.asarray(out[name]["logits"])  # (B, Ld, Ld, C)
        ours_flat = np.stack([tg.flatten_triu(ours_dense[b]) for b in range(B)])
        np.testing.assert_allclose(ours_flat, ref_flat, atol=1e-3, rtol=5e-3,
                                   err_msg=name)


def test_training_loss_parity():
    import torch

    ref = _build_reference(dict(peneo_category_weights=[1.0, 10.0, 10.0]))
    input_ids, attn, bbox = _make_inputs(seed=1)
    Ld = L - 1
    rng = np.random.default_rng(2)

    dense_labels, ref_tags = {}, {}
    for name, ref_key in HEADS:
        n_cls = 2 if name == "line_extraction" else 3
        spots_b = []
        for _ in range(B):
            spots = []
            for _ in range(4):
                i = int(rng.integers(0, Ld))
                j = int(rng.integers(i, Ld))
                spots.append((i, j, int(rng.integers(1, n_cls))))
            spots_b.append(spots)
        dense_labels[name] = tg.batch_spots_to_matrix(spots_b, Ld)
        ref_tags[ref_key] = torch.tensor(
            np.stack([tg.flatten_triu(m) for m in dense_labels[name]])).long()

    with torch.no_grad():
        ref_out = ref(
            input_ids=torch.tensor(input_ids),
            bbox=torch.tensor(bbox),
            orig_bbox=torch.tensor(bbox),
            attention_mask=torch.tensor(attn),
            **ref_tags,
        )

    model, params, cfg = _our_model_and_params(
        ref, dict(peneo_category_weights=[1.0, 10.0, 10.0]))
    losses = model.apply({"params": params}, input_ids, bbox, attn,
                         labels=dense_labels, deterministic=True)

    np.testing.assert_allclose(float(losses["line_extraction"]),
                               float(ref_out.line_extraction_loss), rtol=2e-4)
    np.testing.assert_allclose(float(losses["ent_linking_h2h"]),
                               float(ref_out.ent_linking_h2h_loss), rtol=2e-4)
    np.testing.assert_allclose(float(losses["ent_linking_t2t"]),
                               float(ref_out.ent_linking_t2t_loss), rtol=2e-4)
    np.testing.assert_allclose(float(losses["line_grouping_h2h"]),
                               float(ref_out.line_grouping_h2h_loss), rtol=2e-4)
    np.testing.assert_allclose(float(losses["line_grouping_t2t"]),
                               float(ref_out.line_grouping_t2t_loss), rtol=2e-4)
    np.testing.assert_allclose(float(losses["total"]), float(ref_out.loss), rtol=2e-4)
