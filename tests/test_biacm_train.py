"""biacm_attention_train (ops/biacm_attention.py): the custom-VJP fused
BiACM attention used by the training path.

CPU coverage strategy: interpret mode cannot run the TPU hardware PRNG, so
the dropout math is exercised through the explicit-bits form
(``inkernel_rng=False``) against a plain-JAX reference that consumes the
SAME bits; the rate=0 form is checked against the stock XLA einsum path
(values and grads). The in-kernel-PRNG path differs only in where the bits
come from and is cross-checked on real TPU by tools/check_biacm_train.py.

Reference semantics: BiACM couples the two streams by summing their scores
and applies TWO independent dropout masks to the shared probabilities
(reference model/backbone/lilt/modeling_lilt.py:328-425).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from peneo_tpu.ops.biacm_attention import (
    _keep_thr,
    biacm_attention,
    biacm_attention_train,
)

B, NH, L, DT, DL = 2, 2, 256, 64, 16
SCALE_T, SCALE_L = 1.0 / DT ** 0.5, 1.0 / DL ** 0.5


def _inputs(seed=0):
    rng = np.random.default_rng(seed)

    def t(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.5)

    qt, kt, vt = t(B, NH, L, DT), t(B, NH, L, DT), t(B, NH, L, DT)
    ql, kl, vl = t(B, NH, L, DL), t(B, NH, L, DL), t(B, NH, L, DL)
    bias = np.zeros((B, L), np.float32)
    bias[0, L - 7:] = -1e9  # padded keys on one row
    return qt, kt, vt, ql, kl, vl, jnp.asarray(bias)


def _bits(seed=1):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(
        rng.integers(0, 2 ** 32, size=(B, NH, L, L), dtype=np.uint64)
        .astype(np.uint32))
    return mk(), mk()


def _ref_fwd(qt, kt, vt, ql, kl, vl, bias, bits1, bits2, rate):
    s = (jnp.einsum("bhld,bhmd->bhlm", qt, kt) * SCALE_T
         + jnp.einsum("bhld,bhmd->bhlm", ql, kl) * SCALE_L
         + bias[:, None, None, :])
    p = jax.nn.softmax(s, axis=-1)
    if rate > 0.0:
        thr = jnp.uint32(_keep_thr(rate))
        inv = 1.0 / (1.0 - rate)
        p1 = jnp.where(bits1 < thr, p * inv, 0.0)
        p2 = jnp.where(bits2 < thr, p * inv, 0.0)
    else:
        p1 = p2 = p
    return (jnp.einsum("bhlm,bhmd->bhld", p1, vt),
            jnp.einsum("bhlm,bhmd->bhld", p2, vl))


def test_rate0_matches_inference_kernel_and_xla():
    args = _inputs()
    seed = jnp.zeros((1,), jnp.int32)
    ct, cl = biacm_attention_train(*args, seed, SCALE_T, SCALE_L,
                                   rate=0.0, interpret=True)
    rt, rl = _ref_fwd(*args, None, None, 0.0)
    np.testing.assert_allclose(np.asarray(ct), np.asarray(rt),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(cl), np.asarray(rl),
                               rtol=2e-5, atol=2e-5)
    it, il = biacm_attention(*args, SCALE_T, SCALE_L, interpret=True)
    np.testing.assert_allclose(np.asarray(ct), np.asarray(it),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cl), np.asarray(il),
                               rtol=1e-6, atol=1e-6)


def test_rate0_grads_match_xla():
    args = _inputs(3)
    seed = jnp.zeros((1,), jnp.int32)
    rng = np.random.default_rng(9)
    wt = jnp.asarray(rng.normal(size=(B, NH, L, DT)).astype(np.float32))
    wl = jnp.asarray(rng.normal(size=(B, NH, L, DL)).astype(np.float32))

    def loss_kernel(*qkv):
        ct, cl = biacm_attention_train(*qkv, args[6], seed,
                                       SCALE_T, SCALE_L, rate=0.0,
                                       interpret=True)
        return (ct * wt).sum() + (cl * wl).sum()

    def loss_ref(*qkv):
        ct, cl = _ref_fwd(*qkv, args[6], None, None, 0.0)
        return (ct * wt).sum() + (cl * wl).sum()

    gk = jax.grad(loss_kernel, argnums=tuple(range(6)))(*args[:6])
    gr = jax.grad(loss_ref, argnums=tuple(range(6)))(*args[:6])
    for a, b, name in zip(gk, gr, ["qt", "kt", "vt", "ql", "kl", "vl"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


@pytest.mark.parametrize("rate", [0.1, 0.5])
def test_dropout_fwd_matches_reference_with_same_bits(rate):
    args = _inputs(5)
    bits = _bits(7)
    ct, cl = biacm_attention_train(*args, bits, SCALE_T, SCALE_L,
                                   rate=rate, interpret=True,
                                   inkernel_rng=False)
    rt, rl = _ref_fwd(*args, *bits, rate)
    np.testing.assert_allclose(np.asarray(ct), np.asarray(rt),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(cl), np.asarray(rl),
                               rtol=2e-5, atol=2e-5)


def test_dropout_grads_match_reference_with_same_bits():
    rate = 0.1
    args = _inputs(11)
    bits = _bits(13)
    rng = np.random.default_rng(17)
    wt = jnp.asarray(rng.normal(size=(B, NH, L, DT)).astype(np.float32))
    wl = jnp.asarray(rng.normal(size=(B, NH, L, DL)).astype(np.float32))

    def loss_kernel(*qkv):
        ct, cl = biacm_attention_train(*qkv, args[6], bits,
                                       SCALE_T, SCALE_L, rate=rate,
                                       interpret=True, inkernel_rng=False)
        return (ct * wt).sum() + (cl * wl).sum()

    def loss_ref(*qkv):
        ct, cl = _ref_fwd(*qkv, args[6], *bits, rate)
        return (ct * wt).sum() + (cl * wl).sum()

    gk = jax.grad(loss_kernel, argnums=tuple(range(6)))(*args[:6])
    gr = jax.grad(loss_ref, argnums=tuple(range(6)))(*args[:6])
    for a, b, name in zip(gk, gr, ["qt", "kt", "vt", "ql", "kl", "vl"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def _lilt_model_grads(fused_train, remat=False, seed=23):
    """LiltModel grads under loss=(last_hidden·w).sum().

    Model-level on purpose: through the full PEneo decoder this tiny
    geometry attenuates backbone grads to ~1e-8 — far below any sane
    comparison atol, so a full-PEneoModel grad comparison passes for ANY
    two attention implementations. The dense loss keeps every grad O(1),
    including the layout stream's (the coupled BiACM scores feed both).

    All dropout 0: the two attention implementations instantiate
    different numbers of unnamed nn.Dropout modules, which shifts flax's
    auto-numbered rng paths — with rates >0 the variants draw DIFFERENT
    hidden-dropout masks (a legitimate stream change, not a grad bug)."""
    from peneo_tpu.config import LiltConfig
    from peneo_tpu.models.lilt import LiltModel

    cfg = LiltConfig(
        vocab_size=64, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=512, max_2d_position_embeddings=1024,
        channel_shrink_ratio=4, pad_token_id=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(2, 64, (2, 128)).astype(np.int32))
    bbox = jnp.asarray(rng.integers(0, 1000, (2, 128, 4)).astype(np.int32))
    attn = jnp.ones((2, 128), jnp.int32)
    w = None

    model = LiltModel(cfg, dtype=jnp.float32, remat_layers=remat,
                      fused_biacm_train=fused_train)
    params = model.init(jax.random.PRNGKey(0), ids, bbox, attn,
                        deterministic=True)["params"]
    hs = model.apply({"params": params}, ids, bbox, attn,
                     deterministic=True)["last_hidden_state"]
    w = jnp.asarray(rng.normal(size=hs.shape).astype(np.float32))

    def loss_fn(p):
        out = model.apply({"params": p}, ids, bbox, attn,
                          deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(7)})
        return (out["last_hidden_state"] * w).sum()

    return jax.grad(loss_fn)(params)


def test_lilt_train_grads_with_fused_train_kernel_rate0():
    """LiltModel grads with fused_biacm_train on (attention dropout 0 so
    the CPU/interpret path is legal) match the XLA path, at O(1) grad
    magnitudes (see _lilt_model_grads on why not through the decoder)."""
    g0 = _lilt_model_grads(False)
    g1 = _lilt_model_grads(True)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
    gmax = max(float(np.abs(np.asarray(a)).max()) for _kp, a in flat0)
    assert gmax > 1e-1, f"grads ~0 ({gmax:.2e}) — comparison vacuous"
    bad = [jax.tree_util.keystr(kp) for kp, a in flat0
           if not np.allclose(a, flat1[kp], rtol=2e-3, atol=2e-3)]
    assert not bad, f"fused-train grads diverge from XLA path: {bad}"


def test_fused_train_kernel_composes_with_remat():
    """gradient_checkpointing (nn.remat over LiltLayer) replays the fused
    kernel's forward during backward; the custom VJP must survive that and
    produce the same grads as the non-remat fused path. Grads are O(1)
    here, so remat's fp reassociation noise (~1e-7 relative) needs a
    relative tolerance."""
    g0 = _lilt_model_grads(True, remat=False, seed=29)
    g1 = _lilt_model_grads(True, remat=True, seed=29)
    ok = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(
            lambda a, b: np.allclose(a, b, rtol=1e-4, atol=5e-4), g0, g1))
    assert all(ok), "remat changes fused-train grads"


def test_auto_tile_q_and_vmem_limit():
    """Long-context VMEM guard: tile 128 at L=4096 measured 24.28 MB of
    scoped VMEM against Mosaic's 16 MB default on a real v5e. The fix is
    two-layered: raise vmem_limit_bytes from the calibrated estimate (the
    v5e has 128 MiB of VMEM), and shrink the tile only at extreme lengths
    where even the raised ceiling would be exceeded. Short serving lengths
    must keep compiler_params=None (the tuned L≤2048 path is untouched)."""
    from peneo_tpu.ops.biacm_attention import (
        _auto_tile_q, _compiler_params, _vmem_bytes)

    # tile 128 survives the practical long-context range
    for L in (512, 2048, 4096, 8192):
        assert _auto_tile_q(L, 128) == 128, L
    assert _auto_tile_q(16384, 128) < 128  # backstop engages eventually
    for L in (256, 512, 768, 1024, 3072, 4096, 8192, 16384):
        t = _auto_tile_q(L, 128)
        assert t % 8 == 0 and L % t == 0 and t <= 128
        # backward working set stays under the raised ceiling
        assert _vmem_bytes(L, t, 64, 16, 2, True) * 1.5 <= 100 * 2 ** 20

    # estimate must cover the two real Mosaic measurements (L=4096 bwd)
    assert _vmem_bytes(4096, 128, 64, 16, 2, True) * 1.5 >= 24.28 * 2 ** 20
    assert _vmem_bytes(4096, 64, 64, 16, 2, True) * 1.5 >= 19.08 * 2 ** 20

    # serving lengths keep the compiler default (no behavior change)
    assert _compiler_params(_vmem_bytes(512, 128, 64, 16, 2, False)) is None
    assert _compiler_params(_vmem_bytes(2048, 128, 64, 16, 2, False)) is None
    cp = _compiler_params(_vmem_bytes(4096, 128, 64, 16, 2, True))
    assert cp is not None and cp.vmem_limit_bytes <= 100 * 2 ** 20


def test_tile_q_does_not_change_values_or_grads():
    """The auto-shrunk tile must be semantics-free: values and grads agree
    across tile sizes (rate=0 covers the VJP math; the explicit-bits
    dropout form is tile-independent by construction since the bits come
    from (B, nh, L, L) arrays sliced per tile)."""
    args = _inputs(11)
    seed = jnp.zeros((1,), jnp.int32)
    rng = np.random.default_rng(13)
    wt = jnp.asarray(rng.normal(size=(B, NH, L, DT)).astype(np.float32))
    wl = jnp.asarray(rng.normal(size=(B, NH, L, DL)).astype(np.float32))

    def loss(tile):
        def f(*qkv):
            ct, cl = biacm_attention_train(*qkv, args[6], seed,
                                           SCALE_T, SCALE_L, rate=0.0,
                                           tile_q=tile, interpret=True)
            return (ct * wt).sum() + (cl * wl).sum()
        return f

    v128, g128 = jax.value_and_grad(loss(128), argnums=(0, 1))(*args[:6])
    v32, g32 = jax.value_and_grad(loss(32), argnums=(0, 1))(*args[:6])
    np.testing.assert_allclose(float(v128), float(v32), rtol=1e-5)
    for a, b in zip(g128, g32):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
