"""Long-sequence capability: the reference hard-caps packing at 510/511 text
tokens because its handshaking head materializes O(L²·2H)
(SURVEY.md §5 long-context note). Our blockwise pair head scales past that —
L=1024 and L=2048 end-to-end (forward, loss, grads) on tiny configs.
Measured device-side scaling on the v5e chip lives in docs/documentation.md
§8 (L ∈ {512, 1024, 2048} table)."""

import numpy as np

import jax
import jax.numpy as jnp

from peneo_tpu.config import LiltConfig, PEneoConfig
from peneo_tpu.data.tagging import batch_spots_to_matrix
from peneo_tpu.models.peneo import PEneoModel

HEADS = ("line_extraction", "ent_linking_h2h", "ent_linking_t2t",
         "line_grouping_h2h", "line_grouping_t2t")


def _long_cfg(L):
    return PEneoConfig(
        backbone_name="lilt-infoxlm-base",
        backbone_config=LiltConfig(
            vocab_size=64, hidden_size=48, num_hidden_layers=1,
            num_attention_heads=4, intermediate_size=96,
            max_position_embeddings=L + 8, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0).to_dict(),
        pair_block_size=128,
        max_seq_len=L,
        max_spots_per_head=128,
    )


def test_l1024_forward_and_train():
    B, L = 1, 1024
    cfg = _long_cfg(L)
    model = PEneoModel(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = rng.integers(2, 64, (B, L)).astype(np.int32)
    attn = np.ones((B, L), np.int32)
    x0 = rng.integers(0, 800, (B, L))
    bbox = np.stack([x0, x0, x0 + 30, x0 + 20], -1).astype(np.int32)
    Ld = L - 1
    labels = {}
    for name in HEADS:
        c = 2 if name == "line_extraction" else 3
        spots = [[(int(i), int(min(i + 5, Ld - 1)), 1)
                  for i in rng.integers(0, Ld - 6, 10)]]
        labels[name] = batch_spots_to_matrix(spots, Ld)

    params = model.init(jax.random.PRNGKey(0), ids, bbox, attn,
                        deterministic=True)["params"]
    # inference over the 1M-cell pair grid
    out = model.apply({"params": params}, ids, bbox, attn, deterministic=True)
    assert out["line_extraction"]["spot_idx"].shape == (B, 128)
    assert int(out["line_extraction"]["seq_len"][0]) == Ld

    # training step end-to-end (grads through the remat'd blockwise head)
    def loss_fn(p):
        return model.apply({"params": p}, ids, bbox, attn, labels=labels,
                           deterministic=True)["total"]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gn = float(jax.tree_util.tree_reduce(
        lambda a, g: a + jnp.abs(g).sum(), grads, 0.0))
    assert np.isfinite(gn) and gn > 0


def test_l2048_forward_and_train():
    """4M-cell pair grid: blockwise XLA forward + train step compile and stay
    finite."""
    B, L = 1, 2048
    rng = np.random.default_rng(1)
    ids = rng.integers(2, 64, (B, L)).astype(np.int32)
    attn = np.ones((B, L), np.int32)
    x0 = rng.integers(0, 800, (B, L))
    bbox = np.stack([x0, x0, x0 + 30, x0 + 20], -1).astype(np.int32)
    Ld = L - 1
    labels = {}
    for name in HEADS:
        spots = [[(int(i), int(min(i + 5, Ld - 1)), 1)
                  for i in rng.integers(0, Ld - 6, 10)]]
        labels[name] = batch_spots_to_matrix(spots, Ld)

    cfg = _long_cfg(L)
    model = PEneoModel(cfg, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ids, bbox, attn,
                        deterministic=True)["params"]
    out = model.apply({"params": params}, ids, bbox, attn, deterministic=True)
    assert out["line_extraction"]["spot_idx"].shape == (B, 128)
    assert int(out["line_extraction"]["seq_len"][0]) == Ld

    def loss_fn(p):
        return model.apply({"params": p}, ids, bbox, attn, labels=labels,
                           deterministic=True)["total"]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gn = float(jax.tree_util.tree_reduce(
        lambda a, g: a + jnp.abs(g).sum(), grads, 0.0))
    assert np.isfinite(gn) and gn > 0
