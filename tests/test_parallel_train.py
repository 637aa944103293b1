"""Sharded training-step tests on the 8-device virtual CPU mesh: dp×tp
training runs, updates params, and matches single-device numerics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from peneo_tpu.config import LiltConfig, PEneoConfig
from peneo_tpu.data.tagging import batch_spots_to_matrix
from peneo_tpu.models.peneo import PEneoModel
from peneo_tpu.parallel import mesh as pmesh
from peneo_tpu.pipeline import train as T

B, L = 8, 17  # Ld = 16
TINY = dict(
    vocab_size=64, hidden_size=48, num_hidden_layers=2, num_attention_heads=4,
    intermediate_size=96, max_position_embeddings=64, channel_shrink_ratio=4,
    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0, pad_token_id=0,
)


def _cfg():
    return PEneoConfig(
        backbone_name="lilt-infoxlm-base",
        backbone_config=LiltConfig.from_dict(TINY).to_dict(),
        pair_block_size=8,
        peneo_downstream_speedup_ratio=30.0,
        peneo_category_weights=[1.0, 10.0, 10.0],
    )


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    input_ids = rng.integers(2, 64, (B, L)).astype(np.int32)
    attn = np.ones((B, L), np.int32)
    x0 = rng.integers(0, 900, (B, L))
    y0 = rng.integers(0, 900, (B, L))
    bbox = np.stack([x0, y0, x0 + 50, y0 + 20], -1).astype(np.int32)
    Ld = L - 1
    labels = {}
    for name in ("line_extraction", "ent_linking_h2h", "ent_linking_t2t",
                 "line_grouping_h2h", "line_grouping_t2t"):
        c = 2 if name == "line_extraction" else 3
        spots_b = [[(int(i), int(rng.integers(i, Ld)), int(rng.integers(1, c)))
                    for i in rng.integers(0, Ld, 3)] for _ in range(B)]
        labels[name] = batch_spots_to_matrix(spots_b, Ld)
    return {"input_ids": input_ids, "bbox": bbox, "attention_mask": attn,
            "labels": labels}


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def _run_steps(mesh, n_steps=2):
    cfg = _cfg()
    model = PEneoModel(cfg, dtype=jnp.float32)
    batch = _batch()
    opt = T.make_optimizer(None, lr=1e-3, total_steps=10,
                           downstream_speedup_ratio=30.0)
    state = T.create_train_state(cfg, model, opt, batch, seed=0)
    step_fn = T.jit_train_step(model, opt)
    if mesh is not None:
        shardings = pmesh.param_shardings(state.params, mesh)
        state = T.shard_state(state, mesh, shardings)
        bs = pmesh.batch_sharding(mesh)
        batch = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, bs), batch)
    metrics_hist = []
    for _ in range(n_steps):
        state, metrics = step_fn(state, batch)
        metrics_hist.append({k: float(v) for k, v in metrics.items()})
    return state, metrics_hist


def test_train_step_runs_and_learns_dp_tp():
    mesh = pmesh.make_mesh(dp=4, tp=2)
    state, hist = _run_steps(mesh, n_steps=3)
    assert np.isfinite(hist[0]["total"])
    # loss should drop on the same repeated batch
    assert hist[-1]["total"] < hist[0]["total"]


def test_sharded_matches_single_device():
    mesh = pmesh.make_mesh(dp=4, tp=2)
    _, hist_mesh = _run_steps(mesh, n_steps=2)
    _, hist_single = _run_steps(None, n_steps=2)
    for a, b in zip(hist_mesh, hist_single):
        np.testing.assert_allclose(a["total"], b["total"], rtol=1e-4)


def test_fsdp_matches_replicated_and_actually_shards():
    """ZeRO-3-style fsdp (params + adam moments sharded over dp): numerics
    identical to the replicated layout, and big kernels really live 1/dp per
    device."""
    cfg = _cfg()
    model = PEneoModel(cfg, dtype=jnp.float32)
    batch = _batch()
    opt = T.make_optimizer(None, lr=1e-3, total_steps=10,
                           downstream_speedup_ratio=30.0)
    mesh = pmesh.make_mesh(dp=4, tp=2)
    bs = pmesh.batch_sharding(mesh)
    dev_batch = jax.tree_util.tree_map(lambda x: jax.device_put(x, bs), batch)

    hists = {}
    for fsdp in (False, True):
        state = T.create_train_state(cfg, model, opt, batch, seed=0)
        shardings = pmesh.param_shardings(state.params, mesh, fsdp=fsdp,
                                          fsdp_min_elements=0)
        state = T.shard_state(state, mesh, shardings)
        if fsdp:
            # the mlp intermediate kernel must actually be dp-sharded
            k = state.params["backbone"]["layer_0"]["mlp"][
                "intermediate_dense"]["kernel"]
            assert "dp" in tuple(k.sharding.spec), k.sharding
            assert len(k.sharding.device_set) == 8
        step_fn = T.jit_train_step(model, opt)
        hist = []
        for _ in range(2):
            state, metrics = step_fn(state, dev_batch)
            hist.append(float(metrics["total"]))
        hists[fsdp] = hist
    np.testing.assert_allclose(hists[True], hists[False], rtol=1e-4)


def test_decoder_speedup_applied():
    cfg = _cfg()
    model = PEneoModel(cfg, dtype=jnp.float32)
    batch = _batch()
    opt = T.make_optimizer(None, lr=1e-3, total_steps=10, warmup_ratio=0.0,
                           downstream_speedup_ratio=30.0, max_grad_norm=None)
    state = T.create_train_state(cfg, model, opt, batch, seed=0)
    params_before = jax.tree_util.tree_map(np.asarray, state.params)
    step_fn = T.jit_train_step(model, opt)
    new_state, _ = step_fn(state, batch)
    # decoder params must move ~30x more (per unit grad) than backbone ones:
    # compare update/grad ratios via parameter deltas on first step (adam's
    # first-step update is ±lr * sign-ish; the scale factor is exact).
    d_backbone = jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: jnp.abs(a - b).max(), params_before["backbone"],
        new_state.params["backbone"]))
    d_decoder = jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: jnp.abs(a - b).max(), params_before["peneo_decoder"],
        new_state.params["peneo_decoder"]))
    assert max(float(x) for x in d_decoder) > 10 * max(float(x) for x in d_backbone)


def test_optimizer_decay_mask():
    params = {"backbone": {"LayerNorm": {"scale": jnp.ones(3), "bias": jnp.zeros(3)},
                           "dense": {"kernel": jnp.ones((3, 3)), "bias": jnp.zeros(3)}}}
    mask = T._decay_mask(params)
    assert mask["backbone"]["dense"]["kernel"] is True
    assert mask["backbone"]["dense"]["bias"] is False
    assert mask["backbone"]["LayerNorm"]["scale"] is False
    assert mask["backbone"]["LayerNorm"]["bias"] is False
