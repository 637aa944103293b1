"""Int8-quantized pair head (ops/quant.Int8Dense,
cfg.quantize_pair_head="int8"): the serving-only s8×s8→s32 path must load
full-precision checkpoints unchanged (identical param tree) and track the
fp32 logits closely — per-row activation scales + per-channel weight scales
bound the quantization error of each hidden matmul at ~1/127 relative."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from peneo_tpu.config import LiltConfig, PEneoConfig
from peneo_tpu.models.peneo import PEneoModel

L = 48
TINY = dict(
    vocab_size=500, hidden_size=64, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=128,
    max_position_embeddings=L + 16, channel_shrink_ratio=4,
    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    pad_token_id=0,
)


def _cfg(**kw):
    return PEneoConfig(
        backbone_name="lilt-infoxlm-base",
        backbone_config=dict(TINY),
        max_seq_len=L, pair_block_size=16, max_spots_per_head=0,
        **kw)


def _inputs(seed=0, B=2):
    rng = np.random.default_rng(seed)
    ids = rng.integers(2, 500, (B, L)).astype(np.int32)
    ids[-1, -7:] = 0
    attn = (ids != 0).astype(np.int32)
    x0 = rng.integers(0, 900, (B, L))
    y0 = rng.integers(0, 900, (B, L))
    bbox = np.stack([x0, y0, x0 + 40, y0 + 20], -1).astype(np.int32)
    return ids, bbox, attn


def test_int8_tracks_fp32_logits_same_params():
    ids, bbox, attn = _inputs()
    fp = PEneoModel(_cfg(), dtype=jnp.float32)
    params = fp.init(jax.random.PRNGKey(0), ids, bbox, attn)["params"]
    ref = fp.apply({"params": params}, ids, bbox, attn,
                   deterministic=True, return_logits=True)

    q = PEneoModel(_cfg(quantize_pair_head="int8"), dtype=jnp.float32)
    got = q.apply({"params": params}, ids, bbox, attn,
                  deterministic=True, return_logits=True)

    for name in ref:
        a = np.asarray(ref[name]["logits"], np.float32)
        b = np.asarray(got[name]["logits"], np.float32)
        # error budget: one int8 hidden matmul between two exact layers;
        # scale-relative tolerance (logits are O(1) on random init)
        err = np.abs(a - b).max()
        span = np.abs(a).max() + 1e-6
        assert err / span < 0.05, (name, err, span)
        # and the argmax maps agree almost everywhere on this random model
        agree = (a.argmax(-1) == b.argmax(-1)).mean()
        assert agree > 0.98, (name, agree)


def test_int8_inactive_during_training():
    """Non-deterministic (training) forwards keep full precision: losses are
    bit-identical with and without the flag."""
    ids, bbox, attn = _inputs(1)
    labels = {
        name: np.zeros((2, L - 1, L - 1), np.int8)
        for name in ("line_extraction", "ent_linking_h2h", "ent_linking_t2t",
                     "line_grouping_h2h", "line_grouping_t2t")
    }
    fp = PEneoModel(_cfg(), dtype=jnp.float32)
    params = fp.init(jax.random.PRNGKey(0), ids, bbox, attn)["params"]
    kw = dict(deterministic=False, rngs={"dropout": jax.random.PRNGKey(3)})
    ref = fp.apply({"params": params}, ids, bbox, attn, labels=labels, **kw)
    q = PEneoModel(_cfg(quantize_pair_head="int8"), dtype=jnp.float32)
    got = q.apply({"params": params}, ids, bbox, attn, labels=labels, **kw)
    assert float(ref["total"]) == float(got["total"])


def test_int8_sp_serving_matches_single_device(tmp_path):
    """sp > 1 + int8: the stacked-weight evaluation quantizes the first
    layers with the Int8Dense recipe (ops/pair_head.stack_head_weights_int8)
    — decoded serving outputs must equal the single-device int8 module path
    (round-4 VERDICT #3; previously rejected with a ValueError)."""
    import json
    import os
    import random

    from peneo_tpu.data.synthetic import (ToyTokenizer, make_document,
                                          render_page)
    from peneo_tpu.pipeline.checkpoint import save_params_msgpack
    from peneo_tpu.pipeline.infer import InferenceService

    if len(jax.devices()) < 4:
        pytest.skip("needs the 8-device virtual mesh (tests/conftest.py)")

    tok = ToyTokenizer()
    wdir = str(tmp_path / "weights")
    os.makedirs(wdir)
    cfg = PEneoConfig(
        backbone_name="lilt-infoxlm-base",
        backbone_config=LiltConfig(
            vocab_size=tok.vocab_size, hidden_size=48, num_hidden_layers=1,
            num_attention_heads=4, intermediate_size=96, pad_token_id=0,
            max_position_embeddings=72).to_dict(),
        pair_block_size=16, max_seq_len=64, max_spots_per_head=64)
    cfg.save_pretrained(wdir)
    model = PEneoModel(cfg, dtype=jnp.float32)
    ids = np.ones((1, 64), np.int32)
    params = model.init(jax.random.PRNGKey(7), ids,
                        np.zeros((1, 64, 4), np.int32), ids,
                        deterministic=True)["params"]
    save_params_msgpack(jax.device_get(params),
                        os.path.join(wdir, "params.msgpack"))

    from PIL import Image

    img_dir = str(tmp_path / "images")
    ocr_dir = str(tmp_path / "ocr")
    os.makedirs(img_dir)
    os.makedirs(ocr_dir)
    rng = random.Random(13)
    for i in range(4):
        doc = make_document(rng, f"q{i}.png", n_pairs=3, n_noise=1)
        Image.fromarray(render_page(doc)).save(f"{img_dir}/q{i}.png")
        ocr = [{"text": ln["text"], "bbox": ln["bbox"]}
               for e in doc["entities"] for ln in e["lines"]]
        with open(f"{ocr_dir}/q{i}.json", "w") as f:
            json.dump(ocr, f)

    base = InferenceService(wdir, tokenizer=tok, dtype="float32",
                            batch_size=2, int8_pair_head=True)
    sp = InferenceService(wdir, tokenizer=tok, dtype="float32",
                          batch_size=2, dp=1, tp=1, sp=2,
                          int8_pair_head=True)
    assert sp.cfg.quantize_pair_head == "int8"
    r1 = base.run(img_dir, ocr_dir)
    r2 = sp.run(img_dir, ocr_dir)
    assert set(r1) == set(r2) and len(r1) == 4
    for k in r1:
        assert r1[k]["kv_pairs"] == r2[k]["kv_pairs"], k
        assert r1[k]["lines"] == r2[k]["lines"], k


def test_int8_backbone_tracks_fp32():
    """quantize_backbone="int8" swaps the LiLT projection/MLP matmuls for
    Int8Dense (same param tree). Drift accumulates over layers, so the
    tolerance is looser than the single-matmul pair-head case but the
    logits must still track fp32 closely."""
    ids, bbox, attn = _inputs(2)
    fp = PEneoModel(_cfg(), dtype=jnp.float32)
    params = fp.init(jax.random.PRNGKey(0), ids, bbox, attn)["params"]
    ref = fp.apply({"params": params}, ids, bbox, attn,
                   deterministic=True, return_logits=True)

    q = PEneoModel(_cfg(quantize_backbone="int8",
                        quantize_pair_head="int8"), dtype=jnp.float32)
    got = q.apply({"params": params}, ids, bbox, attn,
                  deterministic=True, return_logits=True)

    for name in ref:
        a = np.asarray(ref[name]["logits"], np.float32)
        b = np.asarray(got[name]["logits"], np.float32)
        err = np.abs(a - b).max()
        span = np.abs(a).max() + 1e-6
        assert err / span < 0.15, (name, err, span)
        agree = (a.argmax(-1) == b.argmax(-1)).mean()
        assert agree > 0.95, (name, agree)


def test_int8_backbone_inactive_during_training():
    ids, bbox, attn = _inputs(3)
    fp = PEneoModel(_cfg(), dtype=jnp.float32)
    params = fp.init(jax.random.PRNGKey(0), ids, bbox, attn)["params"]
    labels = {
        name: np.zeros((2, L - 1, L - 1), np.int8)
        for name in ("line_extraction", "ent_linking_h2h", "ent_linking_t2t",
                     "line_grouping_h2h", "line_grouping_t2t")
    }
    kw = dict(deterministic=False, rngs={"dropout": jax.random.PRNGKey(5)})
    ref = fp.apply({"params": params}, ids, bbox, attn, labels=labels, **kw)
    q = PEneoModel(_cfg(quantize_backbone="int8"), dtype=jnp.float32)
    got = q.apply({"params": params}, ids, bbox, attn, labels=labels, **kw)
    assert float(ref["total"]) == float(got["total"])


def test_int8_backbone_layoutlmv3():
    """The v3 family routes through the same Int8Dense on deterministic
    forwards — logits track fp32, losses untouched in training."""
    from peneo_tpu.config import LayoutLMv3Config

    rng = np.random.default_rng(4)
    ids = rng.integers(2, 300, (2, 32)).astype(np.int32)
    attn = np.ones_like(ids)
    x0 = rng.integers(0, 900, (2, 32))
    y0 = rng.integers(0, 900, (2, 32))
    bbox = np.stack([x0, y0, x0 + 40, y0 + 20], -1).astype(np.int32)

    def cfg(**kw):
        return PEneoConfig(
            backbone_name="layoutlmv3-base",
            backbone_config=LayoutLMv3Config(
                vocab_size=300, hidden_size=64, num_hidden_layers=2,
                num_attention_heads=4, intermediate_size=128,
                max_position_embeddings=64, pad_token_id=0,
                # concat spatial embeds must equal hidden: 4c + 2s = 64
                coordinate_size=12, shape_size=8, visual_embed=False,
                hidden_dropout_prob=0.0,
                attention_probs_dropout_prob=0.0).to_dict(),
            max_seq_len=32, pair_block_size=16, max_spots_per_head=0, **kw)

    fp = PEneoModel(cfg(), dtype=jnp.float32)
    params = fp.init(jax.random.PRNGKey(0), ids, bbox, attn)["params"]
    ref = fp.apply({"params": params}, ids, bbox, attn,
                   deterministic=True, return_logits=True)
    q = PEneoModel(cfg(quantize_backbone="int8"), dtype=jnp.float32)
    got = q.apply({"params": params}, ids, bbox, attn,
                  deterministic=True, return_logits=True)
    for name in ref:
        a = np.asarray(ref[name]["logits"], np.float32)
        b = np.asarray(got[name]["logits"], np.float32)
        err = np.abs(a - b).max()
        span = np.abs(a).max() + 1e-6
        assert err / span < 0.15, (name, err, span)
