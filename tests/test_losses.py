"""Loss function tests: weighted CE vs torch, OHEM intended semantics, focal
loss vs the reference implementation, remat (gradient checkpointing) path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import reference_available, enable_reference_imports
from peneo_tpu.ops import losses as L


def test_weighted_ce_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(40, 3)).astype(np.float32)
    targets = rng.integers(0, 3, 40)
    w = np.array([1.0, 10.0, 10.0], np.float32)
    ref = F.cross_entropy(torch.tensor(logits), torch.tensor(targets),
                          weight=torch.tensor(w))
    ours = L.weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(targets),
                                    jnp.asarray(w))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-6)


def test_ohem_intended_topk():
    rng = np.random.default_rng(1)
    n = 60
    logits = rng.normal(size=(n, 3)).astype(np.float32)
    targets = rng.integers(0, 3, n)
    w = np.array([1.0, 2.0, 3.0], np.float32)
    k_pos, k_neg = 5, 7

    ours = float(L.ohem_cross_entropy(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(w), None,
        k_pos, k_neg))

    # numpy reference of the intended semantics
    z = logits - logits.max(1, keepdims=True)
    p = np.exp(z) / np.exp(z).sum(1, keepdims=True)
    ce = -np.log(p[np.arange(n), targets]) * w[targets]
    pos = np.sort(ce[targets != 0])[::-1]
    neg = np.sort(ce[targets == 0])[::-1]
    kp, kn = min(k_pos, len(pos)), min(k_neg, len(neg))
    expect = (pos[:kp].sum() + neg[:kn].sum()) / (kp + kn)
    np.testing.assert_allclose(ours, expect, rtol=1e-5)


def test_ohem_fewer_than_k():
    logits = jnp.asarray(np.random.default_rng(2).normal(size=(4, 2)),
                         jnp.float32)
    targets = jnp.asarray([0, 0, 0, 1])
    out = L.ohem_cross_entropy(logits, targets, jnp.ones(2), None, 10, 10)
    assert np.isfinite(float(out))


@pytest.mark.parametrize("k_pos,k_neg", [(5, 7), (-1, 6), (4, -1), (100, 100)])
def test_ohem_streaming_matches_full(k_pos, k_neg):
    """Blockwise streaming OHEM == OHEM on the concatenated logits."""
    rng = np.random.default_rng(6)
    B, R, C, ncls = 2, 24, 24, 3
    logits = rng.normal(size=(B, R, C, ncls)).astype(np.float32)
    targets = rng.integers(0, ncls, (B, R, C))
    mask = rng.integers(0, 2, (B, R, C)).astype(bool)
    w = np.array([1.0, 10.0, 10.0], np.float32)

    full = float(L.ohem_cross_entropy(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(w),
        jnp.asarray(mask), k_pos, k_neg))

    state = L.ohem_stream_init(k_pos, k_neg)
    for r0 in range(0, R, 8):  # feed row blocks like the decoder does
        state = L.ohem_stream_update(
            state, jnp.asarray(logits[:, r0:r0 + 8]),
            jnp.asarray(targets[:, r0:r0 + 8]), jnp.asarray(w),
            jnp.asarray(mask[:, r0:r0 + 8]))
    streamed = float(L.ohem_stream_final(state))
    np.testing.assert_allclose(streamed, full, rtol=1e-6)


def test_decoder_ohem_blockwise_matches_full_logits():
    """Decoder loss with OHEM enabled == peneo_head_loss applied to the full
    logits the same decoder emits via return_logits (no (B,L,L,C) concat in
    the loss path itself)."""
    from peneo_tpu.config import LiltConfig, PEneoConfig
    from peneo_tpu.data.tagging import batch_spots_to_matrix
    from peneo_tpu.models.decoder import HEAD_NAMES, triu_valid_mask
    from peneo_tpu.models.peneo import PEneoModel

    rng = np.random.default_rng(7)
    B, Lseq = 2, 21
    Ld = Lseq - 1
    tiny = dict(vocab_size=60, hidden_size=48, num_hidden_layers=1,
                num_attention_heads=4, intermediate_size=64,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                max_position_embeddings=64, pad_token_id=0)
    ids = rng.integers(2, 60, (B, Lseq)).astype(np.int32)
    attn = np.ones((B, Lseq), np.int32)
    x0 = rng.integers(0, 800, (B, Lseq))
    bbox = np.stack([x0, x0, x0 + 20, x0 + 30], -1).astype(np.int32)
    labels = {n: batch_spots_to_matrix(
        [[(0, 2, 1), (3, 9, 2)], [(1, 4, 1)]], Ld) for n in HEAD_NAMES}
    labels["line_extraction"] = np.minimum(labels["line_extraction"], 1)

    cfg = PEneoConfig(backbone_name="lilt-infoxlm-base",
                      backbone_config=LiltConfig.from_dict(tiny).to_dict(),
                      peneo_category_weights=[1.0, 10.0, 10.0],
                      pair_block_size=8, peneo_ohem_num_positive=3,
                      peneo_ohem_num_negative=11)
    model = PEneoModel(cfg, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ids, bbox, attn,
                        deterministic=True)["params"]
    losses = model.apply({"params": params}, ids, bbox, attn, labels=labels,
                         deterministic=True)
    full = model.apply({"params": params}, ids, bbox, attn,
                       deterministic=True, return_logits=True)

    Lp = full["line_extraction"]["logits"].shape[1]
    assert Lp == Ld
    mask = np.asarray(triu_valid_mask(0, Ld, Ld, Ld))[None]
    for name in HEAD_NAMES:
        w = np.array([1.0, 10.0, 10.0], np.float32)
        if name == "line_extraction":
            w = w[:2]
        expect = float(L.peneo_head_loss(
            jnp.asarray(full[name]["logits"]), jnp.asarray(labels[name]),
            jnp.asarray(w), jnp.broadcast_to(mask, labels[name].shape),
            3, 11))
        np.testing.assert_allclose(float(losses[name]), expect, rtol=2e-5)


def test_ohem_train_step_L512():
    """OHEM training at a realistic L=512 stays blockwise (no full-grid
    logits): grads compile and the loss is finite."""
    from peneo_tpu.config import LiltConfig, PEneoConfig
    from peneo_tpu.data.tagging import batch_spots_to_matrix
    from peneo_tpu.models.peneo import PEneoModel

    rng = np.random.default_rng(8)
    B, Lseq = 1, 512
    Ld = Lseq - 1
    tiny = dict(vocab_size=60, hidden_size=48, num_hidden_layers=1,
                num_attention_heads=4, intermediate_size=64,
                max_position_embeddings=520, pad_token_id=0)
    ids = rng.integers(2, 60, (B, Lseq)).astype(np.int32)
    attn = np.ones((B, Lseq), np.int32)
    x0 = rng.integers(0, 800, (B, Lseq))
    bbox = np.stack([x0, x0, x0 + 20, x0 + 30], -1).astype(np.int32)
    spots = [[(int(i), int(rng.integers(i, Ld)), 1)
              for i in rng.integers(0, Ld, 6)]]
    labels = {n: batch_spots_to_matrix(spots, Ld)
              for n in ("line_extraction", "ent_linking_h2h", "ent_linking_t2t",
                        "line_grouping_h2h", "line_grouping_t2t")}

    cfg = PEneoConfig(backbone_name="lilt-infoxlm-base",
                      backbone_config=LiltConfig.from_dict(tiny).to_dict(),
                      pair_block_size=64, peneo_ohem_num_positive=128,
                      peneo_ohem_num_negative=512)
    model = PEneoModel(cfg, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ids, bbox, attn,
                        deterministic=True)["params"]

    def loss_fn(p):
        return model.apply({"params": p}, ids, bbox, attn, labels=labels,
                           deterministic=True)["total"]

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    gnorm = float(jnp.sqrt(sum(jnp.sum(g ** 2)
                               for g in jax.tree_util.tree_leaves(grads))))
    assert np.isfinite(gnorm) and gnorm > 0


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_focal_loss_parity():
    enable_reference_imports()
    import torch
    from model.custom_loss import sigmoid_focal_loss as ref_focal

    rng = np.random.default_rng(3)
    x = rng.normal(size=(5, 7)).astype(np.float32)
    t = rng.integers(0, 2, (5, 7)).astype(np.float32)
    for reduction in ("none", "mean", "sum"):
        ref = ref_focal(torch.tensor(x), torch.tensor(t), reduction=reduction)
        ours = L.sigmoid_focal_loss(jnp.asarray(x), jnp.asarray(t),
                                    reduction=reduction)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-6)


def test_random_sample_ce_runs():
    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.normal(size=(30, 3)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, 3, 30))
    out = L.random_sample_cross_entropy(logits, targets, jax.random.PRNGKey(0),
                                        num_background=5, num_foreground=5)
    assert np.isfinite(float(out))


def test_gradient_checkpointing_matches():
    """remat'd backbone must produce identical loss and gradients."""
    from peneo_tpu.config import LiltConfig, PEneoConfig
    from peneo_tpu.data.tagging import batch_spots_to_matrix
    from peneo_tpu.models.peneo import PEneoModel

    rng = np.random.default_rng(5)
    B, Lseq = 2, 13
    tiny = dict(vocab_size=60, hidden_size=48, num_hidden_layers=2,
                num_attention_heads=4, intermediate_size=64,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                max_position_embeddings=64, pad_token_id=0)
    ids = rng.integers(2, 60, (B, Lseq)).astype(np.int32)
    attn = np.ones((B, Lseq), np.int32)
    x0 = rng.integers(0, 800, (B, Lseq))
    bbox = np.stack([x0, x0, x0 + 20, x0 + 30], -1).astype(np.int32)
    labels = {n: batch_spots_to_matrix([[(0, 2, 1)], [(1, 4, 1)]], Lseq - 1)
              for n in ("line_extraction", "ent_linking_h2h", "ent_linking_t2t",
                        "line_grouping_h2h", "line_grouping_t2t")}

    results = {}
    for gc in (False, True):
        cfg = PEneoConfig(backbone_name="lilt-infoxlm-base",
                          backbone_config=LiltConfig.from_dict(tiny).to_dict(),
                          pair_block_size=8, gradient_checkpointing=gc)
        model = PEneoModel(cfg, dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(0), ids, bbox, attn,
                            deterministic=True)["params"]

        def loss_fn(p):
            return model.apply({"params": p}, ids, bbox, attn, labels=labels,
                               deterministic=True)["total"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        results[gc] = (float(loss), grads)

    np.testing.assert_allclose(results[False][0], results[True][0], rtol=1e-6)
    flat_a = jax.tree_util.tree_leaves(results[False][1])
    flat_b = jax.tree_util.tree_leaves(results[True][1])
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
