"""Fused BiACM kernels under dp/tp meshes via shard_map
(ops/biacm_attention.biacm_attention[_train]_sharded, models/lilt.py mesh
attr): per-chip blocks must reproduce the single-device kernel exactly —
attention is independent per (batch, head), so the shard_map split adds no
collectives and no numerics. Interpret mode on the 8-virtual-CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from peneo_tpu.config import LiltConfig
from peneo_tpu.models.lilt import LiltModel
from peneo_tpu.ops.biacm_attention import (
    biacm_attention,
    biacm_attention_sharded,
    biacm_attention_train,
    biacm_attention_train_sharded,
)
from peneo_tpu.parallel import mesh as pmesh

L = 128
TINY = dict(
    vocab_size=120, hidden_size=96, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=128,
    max_position_embeddings=L + 16, channel_shrink_ratio=4,
    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    pad_token_id=0,
)


def _qkv(seed=0, B=4, nh=4, dt=64, dl=16):
    k = jax.random.PRNGKey(seed)
    qs = [jax.random.normal(jax.random.fold_in(k, i), (B, nh, L, d),
                            jnp.float32)
          for i, d in enumerate([dt, dt, dt, dl, dl, dl])]
    bias = jnp.where(jnp.arange(L) < L - 9, 0.0, -1e9)[None].repeat(B, 0)
    return qs, bias.astype(jnp.float32)


def test_sharded_kernel_matches_unsharded():
    qs, bias = _qkv()
    mesh = pmesh.make_mesh(dp=2, tp=2, sp=2)
    ref = biacm_attention(*qs, bias, 0.125, 0.25, interpret=True)
    got = jax.jit(lambda *a: biacm_attention_sharded(
        *a, 0.125, 0.25, mesh=mesh, interpret=True))(*qs, bias)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-6, atol=1e-6)


def test_sharded_train_grads_match_unsharded():
    qs, bias = _qkv(1)
    mesh = pmesh.make_mesh(dp=4, tp=1, sp=2)
    seed = jnp.zeros((1,), jnp.int32)

    def loss_ref(args):
        t, l = biacm_attention_train(*args, bias, seed, 0.125, 0.25,
                                     rate=0.0, interpret=True)
        return (t ** 2).sum() + (l ** 2).sum()

    def loss_sharded(args):
        t, l = biacm_attention_train_sharded(
            *args, bias, seed, 0.125, 0.25, mesh=mesh, rate=0.0,
            interpret=True)
        return (t ** 2).sum() + (l ** 2).sum()

    g_ref = jax.grad(loss_ref)(qs)
    g_got = jax.jit(jax.grad(loss_sharded))(qs)
    for r, g in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=1e-5)


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(2, 120, (4, L)).astype(np.int32)
    ids[1, -17:] = 0
    attn = (ids != 0).astype(np.int32)
    x0 = rng.integers(0, 900, (4, L))
    y0 = rng.integers(0, 900, (4, L))
    bbox = np.stack([x0, y0, x0 + 40, y0 + 20], -1).astype(np.int32)
    return ids, bbox, attn


def test_lilt_forward_with_mesh_matches_single_device():
    """Full LiltModel forward: fused kernel under a dp=2×tp=2 mesh (batch +
    params GSPMD-sharded, kernel shard_mapped) == the plain XLA path."""
    cfg = LiltConfig.from_dict(TINY)
    ids, bbox, attn = _inputs()

    base = LiltModel(cfg, dtype=jnp.float32)
    params = base.init(jax.random.PRNGKey(0), ids, bbox, attn)["params"]
    ref = base.apply({"params": params}, ids, bbox, attn, deterministic=True)

    mesh = pmesh.make_mesh(dp=2, tp=2, sp=2)
    fused = LiltModel(cfg, dtype=jnp.float32, fused_biacm=True, mesh=mesh)
    shardings = pmesh.param_shardings({"params": params}, mesh)
    sharded_params = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), {"params": params}, shardings)
    batch_sh = pmesh.batch_sharding(mesh)
    ids_s, bbox_s, attn_s = (jax.device_put(jnp.asarray(x), batch_sh)
                             for x in (ids, bbox, attn))
    got = jax.jit(lambda p, i, b, a: fused.apply(
        p, i, b, a, deterministic=True))(sharded_params, ids_s, bbox_s, attn_s)

    for key in ("semantic_output", "layout_output"):
        np.testing.assert_allclose(np.asarray(got[key]),
                                   np.asarray(ref[key]),
                                   rtol=2e-5, atol=2e-5, err_msg=key)


def test_lilt_train_grads_with_mesh_match_single_device():
    """Fused TRAIN kernel (custom VJP) under dp=2: loss and grads equal the
    single-device fused path (rate=0 on CPU — no hardware PRNG here)."""
    cfg = LiltConfig.from_dict(TINY)
    ids, bbox, attn = _inputs(1)

    def make_loss(model):
        def loss_fn(params):
            out = model.apply({"params": params}, ids, bbox, attn,
                              deterministic=False,
                              rngs={"dropout": jax.random.PRNGKey(7)})
            return (out["semantic_output"] ** 2).mean() + \
                (out["layout_output"] ** 2).mean()
        return loss_fn

    single = LiltModel(cfg, dtype=jnp.float32, fused_biacm_train=True)
    params = single.init(jax.random.PRNGKey(0), ids, bbox, attn)["params"]
    l_ref, g_ref = jax.value_and_grad(make_loss(single))(params)

    mesh = pmesh.make_mesh(dp=2, tp=2, sp=2)
    sharded = LiltModel(cfg, dtype=jnp.float32, fused_biacm_train=True,
                        mesh=mesh)
    l_got, g_got = jax.jit(jax.value_and_grad(make_loss(sharded)))(params)

    np.testing.assert_allclose(float(l_got), float(l_ref), rtol=1e-6)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    flat_g, _ = jax.tree_util.tree_flatten(g_got)
    for r, g in zip(flat_r, flat_g):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-5, atol=2e-5)
