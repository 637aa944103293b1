"""Multi-step scan training (K steps per dispatch) must match K sequential
single-step calls exactly (same rng threading, same final params)."""

import numpy as np

import jax
import jax.numpy as jnp

from peneo_tpu.config import LiltConfig, PEneoConfig
from peneo_tpu.data.tagging import batch_spots_to_matrix
from peneo_tpu.models.peneo import PEneoModel
from peneo_tpu.pipeline import train as T

HEADS = ("line_extraction", "ent_linking_h2h", "ent_linking_t2t",
         "line_grouping_h2h", "line_grouping_t2t")


def _batches(rng, n, B, L):
    out = []
    for _ in range(n):
        ids = rng.integers(2, 60, (B, L)).astype(np.int32)
        x0 = rng.integers(0, 800, (B, L))
        labels = {}
        for name in HEADS:
            c = 2 if name == "line_extraction" else 3
            labels[name] = batch_spots_to_matrix(
                [[(0, 3, 1), (2, 5, c - 1)] for _ in range(B)], L - 1)
        out.append({
            "input_ids": ids,
            "bbox": np.stack([x0, x0, x0 + 20, x0 + 30], -1).astype(np.int32),
            "attention_mask": np.ones((B, L), np.int32),
            "labels": labels,
        })
    return out


def test_multi_step_matches_sequential():
    rng = np.random.default_rng(0)
    B, L, K = 2, 13, 4
    cfg = PEneoConfig(
        backbone_name="lilt-infoxlm-base",
        backbone_config=LiltConfig(
            vocab_size=60, hidden_size=48, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=64, pad_token_id=0).to_dict(),
        pair_block_size=8,
    )
    model = PEneoModel(cfg, dtype=jnp.float32)
    opt = T.make_optimizer(None, lr=1e-3, total_steps=20,
                           downstream_speedup_ratio=30.0)
    batches = _batches(rng, K, B, L)

    state_a = T.create_train_state(cfg, model, opt, batches[0], seed=0)
    step = T.jit_train_step(model, opt)
    metrics_seq = []
    for b in batches:
        state_a, m = step(state_a, b)
        metrics_seq.append(float(m["total"]))

    state_b = T.create_train_state(cfg, model, opt, batches[0], seed=0)
    multi = T.make_multi_train_step(model, opt, K)
    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)
    state_b, m_mean = multi(state_b, stacked)

    np.testing.assert_allclose(float(m_mean["total"]), np.mean(metrics_seq),
                               rtol=1e-5)
    assert int(state_b.step) == K
    a = jax.tree_util.tree_leaves(state_a.params)
    b = jax.tree_util.tree_leaves(state_b.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)
