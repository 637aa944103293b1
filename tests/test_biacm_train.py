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


def test_lilt_train_step_with_fused_train_kernel_rate0():
    """A full LiLT train-step grad with fused_biacm_train on (attention
    dropout 0 so the CPU/interpret path is legal) matches the XLA path."""
    from peneo_tpu.config import LiltConfig, PEneoConfig
    from peneo_tpu.models.peneo import PEneoModel

    def cfg(fused):
        return PEneoConfig(
            backbone_name="lilt-infoxlm-base",
            backbone_config=LiltConfig(
                vocab_size=64, hidden_size=48, num_hidden_layers=2,
                num_attention_heads=2, intermediate_size=64,
                max_position_embeddings=512, max_2d_position_embeddings=1024,
                channel_shrink_ratio=4, pad_token_id=1,
                hidden_dropout_prob=0.1,
                attention_probs_dropout_prob=0.0).to_dict(),
            max_seq_len=128, max_spots_per_head=16,
            use_fused_biacm_train=fused)

    rng = np.random.default_rng(23)
    ids = jnp.asarray(rng.integers(2, 64, (2, 128)).astype(np.int32))
    bbox = jnp.asarray(rng.integers(0, 1000, (2, 128, 4)).astype(np.int32))
    attn = jnp.ones((2, 128), jnp.int32)
    labels = {  # pair grids are (L-1, L-1): the CLS row/col is stripped
        h: jnp.zeros((2, 127, 127), jnp.int32)
        for h in ("line_extraction", "ent_linking_h2h", "ent_linking_t2t",
                  "line_grouping_h2h", "line_grouping_t2t")
    }

    def grads(fused):
        model = PEneoModel(cfg(fused), dtype=jnp.float32)
        params = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            ids, bbox, attn, deterministic=True)["params"]

        def loss_fn(p):
            out = model.apply({"params": p}, ids, bbox, attn,
                              labels=labels, deterministic=False,
                              rngs={"dropout": jax.random.PRNGKey(7)})
            return out["total"]

        return params, jax.grad(loss_fn)(params)

    p0, g0 = grads(False)
    p1, g1 = grads(True)
    chex = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(
            lambda a, b: np.allclose(a, b, rtol=5e-4, atol=5e-4), g0, g1))
    assert all(chex), "fused-train grads diverge from XLA path at rate=0"


def test_fused_train_kernel_composes_with_remat():
    """gradient_checkpointing (nn.remat over LiltLayer) replays the fused
    kernel's forward during backward; the custom VJP must survive that and
    produce the same grads as the non-remat fused path."""
    from peneo_tpu.config import LiltConfig, PEneoConfig
    from peneo_tpu.models.peneo import PEneoModel

    def cfg(remat):
        return PEneoConfig(
            backbone_name="lilt-infoxlm-base",
            backbone_config=LiltConfig(
                vocab_size=64, hidden_size=48, num_hidden_layers=2,
                num_attention_heads=2, intermediate_size=64,
                max_position_embeddings=512, max_2d_position_embeddings=1024,
                channel_shrink_ratio=4, pad_token_id=1,
                hidden_dropout_prob=0.0,
                attention_probs_dropout_prob=0.0).to_dict(),
            max_seq_len=128, max_spots_per_head=16,
            use_fused_biacm_train=True, gradient_checkpointing=remat)

    rng = np.random.default_rng(29)
    ids = jnp.asarray(rng.integers(2, 64, (2, 128)).astype(np.int32))
    bbox = jnp.asarray(rng.integers(0, 1000, (2, 128, 4)).astype(np.int32))
    attn = jnp.ones((2, 128), jnp.int32)
    labels = {
        h: jnp.zeros((2, 127, 127), jnp.int32)
        for h in ("line_extraction", "ent_linking_h2h", "ent_linking_t2t",
                  "line_grouping_h2h", "line_grouping_t2t")
    }

    def grads(remat):
        model = PEneoModel(cfg(remat), dtype=jnp.float32)
        params = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            ids, bbox, attn, deterministic=True)["params"]

        def loss_fn(p):
            out = model.apply({"params": p}, ids, bbox, attn,
                              labels=labels, deterministic=False,
                              rngs={"dropout": jax.random.PRNGKey(7)})
            return out["total"]

        return jax.grad(loss_fn)(params)

    g0 = grads(False)
    g1 = grads(True)
    ok = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(
            lambda a, b: np.allclose(a, b, rtol=1e-5, atol=1e-5), g0, g1))
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
