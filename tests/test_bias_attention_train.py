"""bias_attention_train (ops/bias_attention.py): the custom-VJP fused
rel-bias attention used by the LayoutLMv3/v2 training path.

CPU coverage strategy (same as test_biacm_train.py): interpret mode cannot
run the TPU hardware PRNG, so dropout math is exercised through the
explicit-bits form (``inkernel_rng=False``) against a plain-JAX reference
consuming the SAME bits; the rate=0 form is checked against the stock XLA
einsum path (values and grads). The in-kernel-PRNG path differs only in
where the bits come from and is cross-checked on real TPU by
tools/check_bias_attention.py --train.

The structural novelty vs the BiACM pair: the rel bias is TRAINED (it
comes from the families' bucketed relative-position tables, reference
model/backbone/layoutlmv3/modeling_layoutlmv3.py:586-676), so the backward
emits dbias = dS — asserted here against the XLA reference's bias grad.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from peneo_tpu.ops.bias_attention import (
    bias_attention,
    bias_attention_train,
    maybe_fused_ctx_train,
)
from peneo_tpu.ops.biacm_attention import _keep_thr

B, NH, L, D = 2, 2, 256, 64
SCALE = 1.0 / D ** 0.5


def _inputs(seed=0):
    rng = np.random.default_rng(seed)

    def t(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.5)

    q, k, v = t(B, NH, L, D), t(B, NH, L, D), t(B, NH, L, D)
    bias = t(B, NH, L, L)
    mask = np.zeros((B, L), np.float32)
    mask[0, L - 7:] = -1e9  # padded keys on one row
    return q, k, v, bias, jnp.asarray(mask)


def _bits(seed=1):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.integers(0, 2 ** 32, size=(B, NH, L, L), dtype=np.uint64)
        .astype(np.uint32))


def _ref_fwd(q, k, v, bias, mask, bits, rate):
    s = (jnp.einsum("bhld,bhmd->bhlm", q, k) * SCALE
         + bias + mask[:, None, None, :])
    p = jax.nn.softmax(s, axis=-1)
    if rate > 0.0:
        thr = jnp.uint32(_keep_thr(rate))
        p = jnp.where(bits < thr, p * (1.0 / (1.0 - rate)), 0.0)
    return jnp.einsum("bhlm,bhmd->bhld", p, v)


def test_rate0_matches_inference_kernel_and_xla():
    q, k, v, bias, mask = _inputs()
    seed = jnp.zeros((1,), jnp.int32)
    ct = bias_attention_train(q, k, v, bias, mask, seed, SCALE,
                              rate=0.0, interpret=True)
    rt = _ref_fwd(q, k, v, bias, mask, None, 0.0)
    np.testing.assert_allclose(np.asarray(ct), np.asarray(rt),
                               rtol=2e-5, atol=2e-5)
    it = bias_attention(q, k, v, bias, mask, SCALE, interpret=True)
    np.testing.assert_allclose(np.asarray(ct), np.asarray(it),
                               rtol=1e-6, atol=1e-6)


def test_rate0_grads_match_xla_including_dbias():
    q, k, v, bias, mask = _inputs(3)
    seed = jnp.zeros((1,), jnp.int32)
    rng = np.random.default_rng(9)
    w = jnp.asarray(rng.normal(size=(B, NH, L, D)).astype(np.float32))

    def loss_kernel(q_, k_, v_, bias_):
        ct = bias_attention_train(q_, k_, v_, bias_, mask, seed, SCALE,
                                  rate=0.0, interpret=True)
        return (ct * w).sum()

    def loss_ref(q_, k_, v_, bias_):
        return (_ref_fwd(q_, k_, v_, bias_, mask, None, 0.0) * w).sum()

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b, name in zip(gk, gr, ["q", "k", "v", "bias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


@pytest.mark.parametrize("rate", [0.1, 0.5])
def test_dropout_fwd_matches_reference_with_same_bits(rate):
    q, k, v, bias, mask = _inputs(5)
    bits = _bits(7)
    ct = bias_attention_train(q, k, v, bias, mask, bits, SCALE,
                              rate=rate, interpret=True, inkernel_rng=False)
    rt = _ref_fwd(q, k, v, bias, mask, bits, rate)
    np.testing.assert_allclose(np.asarray(ct), np.asarray(rt),
                               rtol=2e-5, atol=2e-5)


def test_dropout_grads_match_reference_with_same_bits():
    rate = 0.1
    q, k, v, bias, mask = _inputs(11)
    bits = _bits(13)
    rng = np.random.default_rng(17)
    w = jnp.asarray(rng.normal(size=(B, NH, L, D)).astype(np.float32))

    def loss_kernel(q_, k_, v_, bias_):
        ct = bias_attention_train(q_, k_, v_, bias_, mask, bits, SCALE,
                                  rate=rate, interpret=True,
                                  inkernel_rng=False)
        return (ct * w).sum()

    def loss_ref(q_, k_, v_, bias_):
        return (_ref_fwd(q_, k_, v_, bias_, mask, bits, rate) * w).sum()

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b, name in zip(gk, gr, ["q", "k", "v", "bias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_maybe_fused_ctx_train_padded_grads_match_xla():
    """The pad-to-64 wrapper must be gradient-exact: padded dq/dbias rows
    are dropped by jnp.pad's VJP slice, so grads at the ORIGINAL L agree
    with the unpadded XLA reference (L=120 → lp=128, 6.7% pad)."""
    Lp = 120
    rng = np.random.default_rng(19)

    def t(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.5)

    # (B, L, nh, d) layout at the wrapper boundary
    q, k, v = t(B, Lp, NH, D), t(B, Lp, NH, D), t(B, Lp, NH, D)
    bias = t(B, NH, Lp, Lp)
    attn_bias = np.zeros((B, 1, 1, Lp), np.float32)
    attn_bias[0, ..., Lp - 5:] = -1e9
    attn_bias = jnp.asarray(attn_bias)
    w = t(B, Lp, NH * D)

    def loss_fused(q_, k_, v_, bias_):
        ctx = maybe_fused_ctx_train(q_, k_, v_, bias_, attn_bias, SCALE,
                                    rate=0.0, seed=jnp.zeros((1,), jnp.int32))
        assert ctx is not None
        return (ctx * w).sum()

    def loss_ref(q_, k_, v_, bias_):
        s = (jnp.einsum("blhd,bmhd->bhlm", q_, k_) * SCALE
             + bias_ + attn_bias)
        p = jax.nn.softmax(s, axis=-1)
        ctx = jnp.einsum("bhlm,bmhd->blhd", p, v_).reshape(B, Lp, NH * D)
        return (ctx * w).sum()

    gk = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b, name in zip(gk, gr, ["q", "k", "v", "bias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


def _v3_model_grads(fused_train, L, remat=False, seed=23):
    """LayoutLMv3Model grads under loss=(last_hidden·w).sum().

    Model-level on purpose: through the full PEneo decoder the tiny test
    geometry attenuates backbone grads to ~1e-8 and the rel-bias tables'
    to ~1e-12 — far below any sane comparison atol, so a full-PEneoModel
    grad comparison passes for ANY two attention implementations (found
    the hard way). The dense loss keeps every grad O(1), including the
    bucketed rel_pos/rel_2d tables fed by the kernel's dbias.

    All dropout 0: the two attention implementations instantiate different
    numbers of unnamed nn.Dropout modules, which shifts flax's
    auto-numbered rng paths — with rates >0 the variants draw DIFFERENT
    hidden-dropout masks (a legitimate stream change, not a grad bug)."""
    from peneo_tpu.config import LayoutLMv3Config
    from peneo_tpu.models.layoutlmv3 import LayoutLMv3Model

    cfg = LayoutLMv3Config(
        vocab_size=64, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64, pad_token_id=1,
        max_position_embeddings=L + 8, coordinate_size=8, shape_size=8,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(2, 64, (2, L)).astype(np.int32))
    bbox = jnp.asarray(rng.integers(0, 1000, (2, L, 4)).astype(np.int32))
    attn = jnp.ones((2, L), jnp.int32)
    w = jnp.asarray(rng.normal(size=(2, L, 48)).astype(np.float32))

    model = LayoutLMv3Model(cfg, dtype=jnp.float32, remat_layers=remat,
                            fused_attention_train=fused_train)
    params = model.init(jax.random.PRNGKey(0), ids, bbox, attn,
                        deterministic=True)["params"]

    def loss_fn(p):
        out = model.apply({"params": p}, ids, bbox, attn,
                          deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(7)})
        return (out["last_hidden_state"] * w).sum()

    return jax.grad(loss_fn)(params)


def test_v3_train_grads_with_fused_train_kernel_rate0():
    """LayoutLMv3 model grads with fused_attention_train on (attention
    dropout 0 → CPU/interpret path legal) match the XLA path — including
    the rel_pos/rel_2d bias tables' grads, which flow through the kernel's
    dbias output. L=120 exercises the pad-to-64 wrapper (→128)."""
    g0 = _v3_model_grads(False, 120)
    g1 = _v3_model_grads(True, 120)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
    relmax = max(float(np.abs(np.asarray(g0["rel_pos_bias"])).max()),
                 float(np.abs(np.asarray(g0["rel_pos_x_bias"])).max()))
    assert relmax > 1e-2, f"rel-bias table grads ~0 ({relmax:.2e}) — vacuous"
    bad = [jax.tree_util.keystr(kp) for kp, a in flat0
           if not np.allclose(a, flat1[kp], rtol=2e-3, atol=2e-3)]
    assert not bad, f"fused-train grads diverge from XLA path: {bad}"


def test_v2_train_grads_with_fused_train_kernel_rate0():
    """LayoutLMv2 got the same fused-train code path as v3
    (models/layoutlmv2.py Layer); grad-check it at the model level:
    fused_attention_train=True vs the XLA einsum path, deterministic=False,
    all dropout rates 0 → CPU/interpret legal AND rng-stream-neutral (the
    XLA path instantiates an extra unnamed nn.Dropout for attention probs,
    which shifts flax's auto-numbered dropout rng paths — with rates >0 the
    two implementations draw different hidden-dropout masks, a legitimate
    stream change, not a grad bug).
    v2 always appends its 7×7=49 visual-pool tokens, so text L=71 → 120
    exercises the pad-to-64 wrapper (→128, 6.25% pad).
    Covers the rel_pos/rel_2d bias-table grads via the kernel's dbias."""
    from peneo_tpu.config import LayoutLMv2Config
    from peneo_tpu.models.layoutlmv2 import LayoutLMv2Model

    cfg_d = dict(
        vocab_size=120, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        max_position_embeddings=200, coordinate_size=8, shape_size=8,
        pad_token_id=0, fast_qkv=True, image_feature_pool_shape=[7, 7, 16],
    )
    cfg = LayoutLMv2Config.from_dict(cfg_d)
    rng = np.random.default_rng(41)
    L = 71  # + 49 visual-pool tokens = 120 → padded to 128
    ids = rng.integers(3, 120, (2, L)).astype(np.int32)
    ids[1, -5:] = 0
    attn = (ids != 0).astype(np.int32)
    x0 = rng.integers(0, 900, (2, L))
    y0 = rng.integers(0, 900, (2, L))
    bbox = np.stack([x0, y0, x0 + 40, y0 + 20], -1).astype(np.int32)
    bbox[ids == 0] = 0
    w = jnp.asarray(rng.normal(size=(2, L + 49, 48)).astype(np.float32))

    def grads(fused_train):
        model = LayoutLMv2Model(cfg, dtype=jnp.float32,
                                fused_attention_train=fused_train)
        params = model.init(jax.random.PRNGKey(0), ids, bbox, attn,
                            deterministic=True)["params"]

        def loss_fn(p):
            out = model.apply(
                {"params": p}, ids, bbox, attn, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(11)})
            return (out["last_hidden_state"] * w).sum()

        return jax.grad(loss_fn)(params)

    g0 = grads(False)
    g1 = grads(True)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
    bad = [jax.tree_util.keystr(kp) for kp, a in flat0
           if not np.allclose(a, flat1[kp], rtol=5e-4, atol=5e-4)]
    assert not bad, f"v2 fused-train grads diverge from XLA path: {bad}"


def test_v3_fused_train_composes_with_remat():
    g0 = _v3_model_grads(True, 128, remat=False)
    g1 = _v3_model_grads(True, 128, remat=True)
    # grads are O(1)-O(1e3) here; remat recomputes the forward in the
    # backward, so fp reassociation noise ~1e-7 relative is expected
    ok = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(
            lambda a, b: np.allclose(a, b, rtol=1e-4, atol=5e-4), g0, g1))
    assert all(ok), "remat changes fused-train grads"


def test_sharded_train_matches_single_device():
    """bias_attention_train_sharded under a dp=2×tp=2 CPU mesh: forward
    and grads (incl. dbias) identical to the single-device kernel at
    rate=0 (dropout seeds only decorrelate the rate>0 TPU path)."""
    from jax.sharding import Mesh

    from peneo_tpu.ops.bias_attention import bias_attention_train_sharded

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = Mesh(np.asarray(devs[:4]).reshape(2, 2), ("dp", "tp"))
    q, k, v, bias, mask = _inputs(31)
    seed = jnp.zeros((1,), jnp.int32)
    rng = np.random.default_rng(37)
    w = jnp.asarray(rng.normal(size=(B, NH, L, D)).astype(np.float32))

    def loss_single(q_, k_, v_, bias_):
        ct = bias_attention_train(q_, k_, v_, bias_, mask, seed, SCALE,
                                  rate=0.0, interpret=True)
        return (ct * w).sum()

    def loss_sharded(q_, k_, v_, bias_):
        ct = bias_attention_train_sharded(q_, k_, v_, bias_, mask, seed,
                                          SCALE, mesh=mesh, rate=0.0,
                                          interpret=True)
        return (ct * w).sum()

    v0, g0 = jax.value_and_grad(loss_single, argnums=(0, 1, 2, 3))(
        q, k, v, bias)
    v1, g1 = jax.value_and_grad(loss_sharded, argnums=(0, 1, 2, 3))(
        q, k, v, bias)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-5)
    for a, b, name in zip(g0, g1, ["q", "k", "v", "bias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5, err_msg=name)
