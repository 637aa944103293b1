"""Fused BiACM attention kernel (ops/biacm_attention.py) vs the XLA einsum
path — identity on a full LiltModel forward (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from peneo_tpu.config import LiltConfig
from peneo_tpu.models.lilt import LiltModel

L = 128  # kernel requires L % 128 == 0
TINY = dict(
    vocab_size=120, hidden_size=96, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=128,
    max_position_embeddings=L + 16, channel_shrink_ratio=4,
    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    pad_token_id=0,
)


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(2, 120, (2, L)).astype(np.int32)
    ids[1, -17:] = 0  # padding exercises the additive key mask
    attn = (ids != 0).astype(np.int32)
    x0 = rng.integers(0, 900, (2, L))
    y0 = rng.integers(0, 900, (2, L))
    bbox = np.stack([x0, y0, x0 + 40, y0 + 20], -1).astype(np.int32)
    return ids, bbox, attn


def test_fused_biacm_matches_einsum_path():
    cfg = LiltConfig.from_dict(TINY)
    ids, bbox, attn = _inputs()

    base = LiltModel(cfg, dtype=jnp.float32)
    params = base.init(jax.random.PRNGKey(0), ids, bbox, attn)["params"]
    ref = base.apply({"params": params}, ids, bbox, attn, deterministic=True)

    fused = LiltModel(cfg, dtype=jnp.float32, fused_biacm=True)
    got = fused.apply({"params": params}, ids, bbox, attn, deterministic=True)

    for key in ("semantic_output", "layout_output"):
        np.testing.assert_allclose(np.asarray(got[key]),
                                   np.asarray(ref[key]),
                                   rtol=2e-5, atol=2e-5, err_msg=key)


def test_fused_biacm_falls_back_on_ragged_length():
    """L not divisible by 128 silently uses the einsum path (same weights,
    same outputs) — serving pads to multiples of 8, not always 128."""
    cfg = LiltConfig.from_dict(dict(TINY, max_position_embeddings=64))
    rng = np.random.default_rng(1)
    ids = rng.integers(2, 120, (2, 40)).astype(np.int32)
    attn = np.ones_like(ids)
    bbox = np.zeros((2, 40, 4), np.int32)
    fused = LiltModel(cfg, dtype=jnp.float32, fused_biacm=True)
    params = fused.init(jax.random.PRNGKey(0), ids, bbox, attn)["params"]
    out = fused.apply({"params": params}, ids, bbox, attn, deterministic=True)
    base = LiltModel(cfg, dtype=jnp.float32)
    ref = base.apply({"params": params}, ids, bbox, attn, deterministic=True)
    np.testing.assert_allclose(np.asarray(out["semantic_output"]),
                               np.asarray(ref["semantic_output"]),
                               rtol=1e-6)
