"""Length-bucketed serving identity: with ``bucket_lengths`` the directory
runner groups pages by real token length and pads each batch only to its
bucket (the O(L²) pair grid makes short pages much cheaper) — results must
be exactly the unbucketed run's. The reference always pads to 512
(deploy/inference.py:318-335); bucketing is a TPU-native extension (one
cached XLA executable per static bucket shape)."""

import json
import os
import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from peneo_tpu.config import LiltConfig, PEneoConfig
from peneo_tpu.data.synthetic import ToyTokenizer, make_document, render_page
from peneo_tpu.models.peneo import PEneoModel
from peneo_tpu.pipeline.checkpoint import save_params_msgpack
from peneo_tpu.pipeline.infer import InferenceService


@pytest.fixture(scope="module")
def bucket_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("buckets")
    tok = ToyTokenizer()
    wdir = str(root / "weights")
    os.makedirs(wdir, exist_ok=True)
    cfg = PEneoConfig(
        backbone_name="lilt-infoxlm-base",
        backbone_config=LiltConfig(
            vocab_size=tok.vocab_size, hidden_size=48, num_hidden_layers=1,
            num_attention_heads=4, intermediate_size=96, pad_token_id=0,
            max_position_embeddings=72).to_dict(),
        # k=4096 clamps to each bucket's full grid (decoder.compact_spots
        # k=min(k, L²)), so the random-weight model overflows no bucket —
        # overflow WOULD legitimately diverge across buckets (different
        # top-k cuts of the same spot set; documented in config.spot_topk)
        pair_block_size=16, max_seq_len=64, max_spots_per_head=4096)
    cfg.save_pretrained(wdir)
    model = PEneoModel(cfg, dtype=jnp.float32)
    ids = np.ones((1, 64), np.int32)
    params = model.init(jax.random.PRNGKey(11), ids,
                        np.zeros((1, 64, 4), np.int32), ids,
                        deterministic=True)["params"]
    save_params_msgpack(jax.device_get(params),
                        os.path.join(wdir, "params.msgpack"))

    from PIL import Image

    img_dir = str(root / "images")
    ocr_dir = str(root / "ocr")
    os.makedirs(img_dir)
    os.makedirs(ocr_dir)
    rng = random.Random(17)
    # 7 mixed-length pages: tiny (1 pair), medium (3), and full pages that
    # overflow every non-top bucket — with batch_size 2 this exercises
    # per-bucket grouping, partial-bucket flushes, and the overflow bucket
    for i, n_pairs in enumerate([1, 3, 6, 1, 3, 6, 1]):
        doc = make_document(rng, f"p{i}.png", n_pairs=n_pairs, n_noise=1)
        Image.fromarray(render_page(doc)).save(f"{img_dir}/p{i}.png")
        ocr = [{"text": ln["text"], "bbox": ln["bbox"]}
               for e in doc["entities"] for ln in e["lines"]]
        with open(f"{ocr_dir}/p{i}.json", "w") as f:
            json.dump(ocr, f)
    return wdir, img_dir, ocr_dir, tok


def test_bucketed_matches_unbucketed(bucket_setup):
    wdir, img_dir, ocr_dir, tok = bucket_setup
    plain = InferenceService(wdir, tokenizer=tok, dtype="float32",
                             batch_size=2)
    bucketed = InferenceService(wdir, tokenizer=tok, dtype="float32",
                                batch_size=2, bucket_lengths=[16, 32, 48])
    # 64 (max_seq_len) auto-appended as the overflow bucket
    assert bucketed.bucket_lengths == [16, 32, 48, 64]
    r1 = plain.run(img_dir, ocr_dir)
    r2 = bucketed.run(img_dir, ocr_dir)
    assert set(r1) == set(r2) and len(r1) == 7
    for k in r1:
        assert r1[k]["kv_pairs"] == r2[k]["kv_pairs"], k
        assert r1[k]["lines"] == r2[k]["lines"], k


def test_bucket_assignment_and_slicing(bucket_setup):
    """Pages route to the smallest covering bucket and dispatch_batch
    truncates the sequence axis to it (tail padding only)."""
    wdir, img_dir, ocr_dir, tok = bucket_setup
    svc = InferenceService(wdir, tokenizer=tok, dtype="float32",
                           batch_size=2, bucket_lengths=[16, 32, 48])
    assert svc._bucket_for(10) == 16
    assert svc._bucket_for(16) == 16
    assert svc._bucket_for(17) == 32
    assert svc._bucket_for(63) == 64
    assert svc._bucket_for(200) == 64  # beyond every bucket → top bucket

    page = svc.preprocess_page(f"{img_dir}/p0.png", f"{ocr_dir}/p0.json")
    arrays, _, _, seq_len = page
    rows = seq_len + int(svc.info.add_cls_token)
    bucket = svc._bucket_for(rows)
    assert bucket < svc.cfg.max_seq_len, "p0 must be a short page"
    # everything cut off is padding
    assert not arrays["attention_mask"][bucket:].any()
    out = svc.run_batch([page])  # unbucketed single-page path still works
    assert out[0][1], "page decodes to at least one line"


def test_bucket_lengths_validation(bucket_setup):
    wdir, _, _, tok = bucket_setup
    with pytest.raises(ValueError, match="bucket_lengths"):
        InferenceService(wdir, tokenizer=tok, dtype="float32",
                         bucket_lengths=[4096])  # all above max_seq_len
