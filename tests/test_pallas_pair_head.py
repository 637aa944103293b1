"""Fused Pallas pair-head kernel correctness (interpret mode on CPU) vs a
straight jnp computation of the same math, and vs the decoder's XLA path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from peneo_tpu.ops import pair_head as ph


def _ref_compute(a, b, w1, b1, w2, b2):
    """Dense jnp reference of the kernel math."""
    B, L, H = a.shape
    pair = jax.nn.silu(a[:, :, None, :] + b[:, None, :, :])
    tags, scores = [], []
    for h in range(ph.N_HEADS):
        x = jax.nn.silu(pair @ w1[h] + b1[h])
        logits = x @ w2[h] + b2[h]
        p = jax.nn.softmax(logits, axis=-1)
        tags.append(jnp.argmax(p, axis=-1).astype(jnp.int32))
        scores.append(jnp.max(p, axis=-1))
    return jnp.stack(tags), jnp.stack(scores)


def _rand_weights(rng, H):
    w1 = jnp.asarray(rng.normal(0, 0.3, (ph.N_HEADS, H, H)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(0, 0.1, (ph.N_HEADS, H)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(0, 0.3, (ph.N_HEADS, H, ph.C_PAD)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(0, 0.1, (ph.N_HEADS, ph.C_PAD)).astype(np.float32))
    # emulate padded classes: heads 1-4 have 3 classes, head 0 has 2
    b2 = b2.at[0, 2:].set(ph.NEG_INF)
    b2 = b2.at[1:, 3:].set(ph.NEG_INF)
    w2 = w2.at[0, :, 2:].set(0.0)
    w2 = w2.at[1:, :, 3:].set(0.0)
    return w1, b1, w2, b2


def test_kernel_matches_reference_interpret():
    rng = np.random.default_rng(0)
    B, L, H = 2, 32, 16
    a = jnp.asarray(rng.normal(0, 1, (B, L, H)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 1, (B, L, H)).astype(np.float32))
    w1, b1, w2, b2 = _rand_weights(rng, H)

    ref_tags, ref_scores = _ref_compute(a, b, w1, b1, w2, b2)
    k_tags, k_scores = ph.pair_head_infer(a, b, w1, b1, w2, b2,
                                          tile_i=8, tile_j=16, interpret=True)
    # compare only the upper triangle (kernel skips/zeroes the rest)
    triu = np.triu(np.ones((L, L), bool))
    for h in range(ph.N_HEADS):
        for bi in range(B):
            np.testing.assert_array_equal(
                np.asarray(k_tags[h, bi])[triu], np.asarray(ref_tags[h, bi])[triu])
            np.testing.assert_allclose(
                np.asarray(k_scores[h, bi])[triu],
                np.asarray(ref_scores[h, bi])[triu], atol=1e-5)


def test_stack_head_weights_roundtrip():
    rng = np.random.default_rng(1)
    H = 12
    tree = {"heads": {}}
    from peneo_tpu.models.decoder import HEAD_CLASSES, HEAD_NAMES

    for name in HEAD_NAMES:
        c = HEAD_CLASSES[name]
        tree["heads"][f"{name}_fc"] = {
            "fc_0": {"kernel": rng.normal(size=(H, H)).astype(np.float32),
                     "bias": rng.normal(size=(H,)).astype(np.float32)},
            "fc_out": {"kernel": rng.normal(size=(H, c)).astype(np.float32),
                       "bias": rng.normal(size=(c,)).astype(np.float32)},
        }
    w1, b1, w2, b2 = ph.stack_head_weights(tree, HEAD_NAMES)
    assert w1.shape == (5, H, H) and w2.shape == (5, H, ph.C_PAD)
    # pad class bias is -inf-ish so it never wins argmax
    assert float(b2[0, 2]) == ph.NEG_INF
    assert float(b2[1, 3]) == ph.NEG_INF


def test_use_pallas_pair_head_flag_wired_through_eval_step():
    """cfg.use_pallas_pair_head=True must actually route the jitted eval step
    through the fused kernel (stack_head_weights from the live param tree)
    and produce the same spots as the XLA blockwise path."""
    from peneo_tpu.config import LiltConfig, PEneoConfig
    from peneo_tpu.models.decoder import HEAD_NAMES
    from peneo_tpu.models.peneo import PEneoModel
    from peneo_tpu.pipeline import train as T

    rng = np.random.default_rng(3)
    B, Lseq = 1, 129  # Ld = 128 after CLS strip → one 128-wide kernel tile
    tiny = dict(vocab_size=60, hidden_size=48, num_hidden_layers=1,
                num_attention_heads=4, intermediate_size=64,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                max_position_embeddings=140, pad_token_id=0)
    ids = rng.integers(2, 60, (B, Lseq)).astype(np.int32)
    attn = np.ones((B, Lseq), np.int32)
    x0 = rng.integers(0, 800, (B, Lseq))
    bbox = np.stack([x0, x0, x0 + 20, x0 + 30], -1).astype(np.int32)
    batch = {"input_ids": ids, "bbox": bbox, "attention_mask": attn}

    outs = {}
    params = None
    for use_pallas in (False, True):
        cfg = PEneoConfig(
            backbone_name="lilt-infoxlm-base",
            backbone_config=LiltConfig.from_dict(tiny).to_dict(),
            pair_block_size=64, max_spots_per_head=32,
            use_pallas_pair_head=use_pallas)
        model = PEneoModel(cfg, dtype=jnp.float32)
        if params is None:
            params = model.init(jax.random.PRNGKey(0), ids, bbox, attn,
                                deterministic=True)["params"]
        step = jax.jit(T.make_eval_step(model))
        outs[use_pallas] = jax.device_get(step(params, batch))

    for name in HEAD_NAMES:
        for key in ("spot_idx", "spot_tag"):
            np.testing.assert_array_equal(outs[False][name][key],
                                          outs[True][name][key])
        np.testing.assert_allclose(outs[False][name]["spot_score"],
                                   outs[True][name]["spot_score"], atol=1e-5)


def test_decoder_pallas_path_matches_xla():
    """Full decoder: pallas kernel vs blockwise XLA on the same params."""
    from peneo_tpu.config import LiltConfig, PEneoConfig
    from peneo_tpu.models.decoder import HEAD_NAMES, PEneoDecoder
    from peneo_tpu.ops.pair_head import stack_head_weights
    from peneo_tpu.pipeline.decode import spots_from_device_outputs

    rng = np.random.default_rng(2)
    B, Ld, F = 1, 128, 60
    cfg = PEneoConfig(
        backbone_name="lilt-infoxlm-base",
        backbone_config=LiltConfig(hidden_size=48,
                                   hidden_dropout_prob=0.0).to_dict(),
        pair_block_size=64,
        max_spots_per_head=64,
    )
    dec_mod = PEneoDecoder(cfg, dtype=jnp.float32)
    h = jnp.asarray(rng.normal(0, 1, (B, Ld, F)).astype(np.float32))
    params = dec_mod.init(jax.random.PRNGKey(0), h, deterministic=True)["params"]

    out_xla = dec_mod.apply({"params": params}, h, deterministic=True)
    pw = stack_head_weights(params["peneo_decoder"]
                            if "peneo_decoder" in params else params, HEAD_NAMES)
    import peneo_tpu.ops.pair_head as phm

    orig = phm.pair_head_infer
    phm.pair_head_infer = lambda *a, **k: orig(*a, tile_i=32, tile_j=64,
                                               interpret=True)
    try:
        out_pal = dec_mod.apply({"params": params}, h, deterministic=True,
                                pallas_head_weights=pw)
    finally:
        phm.pair_head_infer = orig

    spots_xla = spots_from_device_outputs(out_xla, 0, Ld)
    spots_pal = spots_from_device_outputs(out_pal, 0, Ld)
    for name in HEAD_NAMES:
        sx, sp = spots_xla[name], spots_pal[name]
        assert [(i, j, t) for i, j, t, _ in sx] == [(i, j, t) for i, j, t, _ in sp], name
        for a, b in zip(sx, sp):
            assert abs(a[3] - b[3]) < 1e-5
