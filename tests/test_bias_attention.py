"""Fused rel-bias attention kernel (ops/bias_attention.py) vs the XLA einsum
path — wrapper-level (incl. the key-masked padding path) and full-model
identity for LayoutLMv3 and LayoutLMv2 (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from peneo_tpu.config import LayoutLMv2Config, LayoutLMv3Config
from peneo_tpu.ops.bias_attention import maybe_fused_ctx

V3_TINY = dict(
    vocab_size=120, hidden_size=48, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=64,
    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    max_position_embeddings=200, type_vocab_size=1, pad_token_id=1,
    coordinate_size=8, shape_size=8, max_2d_position_embeddings=1024,
    visual_embed=True, input_size=32, patch_size=16,
)

# text L=79 + 49 visual tokens = 128 → tile-aligned without padding
V2_TINY = dict(
    vocab_size=120, hidden_size=48, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=64,
    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    max_position_embeddings=200, coordinate_size=8, shape_size=8,
    pad_token_id=0, fast_qkv=True, image_feature_pool_shape=[7, 7, 16],
)


def _xla_ref(q, k, v, bias, mask, scale):
    s = jnp.einsum("blhd,bmhd->bhlm", q, k,
                   preferred_element_type=jnp.float32) * scale
    s = s + bias + mask.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhlm,bmhd->blhd", p, v).reshape(
        q.shape[0], q.shape[1], -1)


def _rand_attn(L, seed=0, B=2, nh=2, d=16):
    rng = np.random.default_rng(seed)
    q, k, v = (rng.normal(size=(B, L, nh, d)).astype(np.float32)
               for _ in range(3))
    bias = rng.normal(size=(B, nh, L, L)).astype(np.float32)
    mask = np.zeros((B, 1, 1, L), np.float32)
    mask[1, ..., -9:] = -10000.0  # padded keys
    return (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(bias), jnp.asarray(mask))


def test_wrapper_matches_xla_aligned():
    q, k, v, bias, mask, = _rand_attn(128)
    got = maybe_fused_ctx(q, k, v, bias, mask, 0.25,
                          deterministic=True, dropout_p=0.0)
    assert got is not None
    ref = _xla_ref(q, k, v, bias, mask, 0.25)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)


def test_wrapper_pads_unaligned_length():
    """L=120 → padded to 128 (6.7% < the 10% gate): padded keys are masked,
    padded query rows sliced off — identical to the unpadded XLA path."""
    q, k, v, bias, mask = _rand_attn(120, seed=1)
    got = maybe_fused_ctx(q, k, v, bias, mask, 0.25,
                          deterministic=True, dropout_p=0.0)
    assert got is not None and got.shape == (2, 120, 32)
    ref = _xla_ref(q, k, v, bias, mask, 0.25)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)


def test_wrapper_gates_off():
    q, k, v, bias, mask = _rand_attn(96, seed=2)
    # 96 → 128 would waste 33% extra rows: gate returns None
    assert maybe_fused_ctx(q, k, v, bias, mask, 0.25,
                           deterministic=True, dropout_p=0.0) is None
    # attention dropout active on a training forward: gate returns None
    q, k, v, bias, mask = _rand_attn(128, seed=3)
    assert maybe_fused_ctx(q, k, v, bias, mask, 0.25,
                           deterministic=False, dropout_p=0.1) is None
    # no rel bias: XLA's plain attention path is fine already
    assert maybe_fused_ctx(q, k, v, None, mask, 0.25,
                           deterministic=True, dropout_p=0.0) is None


def _v3_inputs(L, seed=0, image=False):
    rng = np.random.default_rng(seed)
    ids = rng.integers(3, 120, (2, L)).astype(np.int32)
    ids[1, -7:] = 1
    attn = (ids != 1).astype(np.int32)
    x0 = rng.integers(0, 900, (2, L))
    y0 = rng.integers(0, 900, (2, L))
    bbox = np.stack([x0, y0, x0 + 40, y0 + 20], -1).astype(np.int32)
    bbox[ids == 1] = 0
    img = (rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
           if image else None)
    return ids, bbox, attn, img


def test_layoutlmv3_fused_matches_einsum_path():
    from peneo_tpu.models.layoutlmv3 import LayoutLMv3Model

    cfg = LayoutLMv3Config.from_dict(V3_TINY)
    ids, bbox, attn, _ = _v3_inputs(128)

    base = LayoutLMv3Model(cfg, dtype=jnp.float32)
    params = base.init(jax.random.PRNGKey(0), ids, bbox, attn)["params"]
    ref = base.apply({"params": params}, ids, bbox, attn,
                     deterministic=True)["last_hidden_state"]

    fused = LayoutLMv3Model(cfg, dtype=jnp.float32, fused_attention=True)
    got = fused.apply({"params": params}, ids, bbox, attn,
                      deterministic=True)["last_hidden_state"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)


def test_layoutlmv3_fused_image_path_padded():
    """text 123 + CLS-less 5 visual tokens → L'=128 aligned; text 120 →
    L'=125 → padded to 128. Both must match the XLA path."""
    from peneo_tpu.models.layoutlmv3 import LayoutLMv3Model

    cfg = LayoutLMv3Config.from_dict(V3_TINY)
    for L in (123, 120):
        ids, bbox, attn, img = _v3_inputs(L, seed=L, image=True)
        base = LayoutLMv3Model(cfg, dtype=jnp.float32)
        params = base.init(jax.random.PRNGKey(0), ids, bbox, attn,
                           image=img)["params"]
        ref = base.apply({"params": params}, ids, bbox, attn, image=img,
                         deterministic=True)["last_hidden_state"]
        fused = LayoutLMv3Model(cfg, dtype=jnp.float32, fused_attention=True)
        got = fused.apply({"params": params}, ids, bbox, attn, image=img,
                          deterministic=True)["last_hidden_state"]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=3e-4, atol=3e-4, err_msg=f"L={L}")


def test_layoutlmv2_fused_matches_einsum_path():
    from peneo_tpu.models.layoutlmv2 import LayoutLMv2Model

    cfg = LayoutLMv2Config.from_dict(V2_TINY)
    rng = np.random.default_rng(5)
    L = 79  # + 49 visual grid tokens = 128
    ids = rng.integers(3, 120, (2, L)).astype(np.int32)
    ids[1, -5:] = 0
    attn = (ids != 0).astype(np.int32)
    x0 = rng.integers(0, 900, (2, L))
    y0 = rng.integers(0, 900, (2, L))
    bbox = np.stack([x0, y0, x0 + 40, y0 + 20], -1).astype(np.int32)
    bbox[ids == 0] = 0

    base = LayoutLMv2Model(cfg, dtype=jnp.float32)
    params = base.init(jax.random.PRNGKey(0), ids, bbox, attn)["params"]
    ref = base.apply({"params": params}, ids, bbox, attn,
                     deterministic=True)["last_hidden_state"]
    fused = LayoutLMv2Model(cfg, dtype=jnp.float32, fused_attention=True)
    got = fused.apply({"params": params}, ids, bbox, attn,
                      deterministic=True)["last_hidden_state"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)
