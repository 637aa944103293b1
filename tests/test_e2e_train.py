"""End-to-end smoke: synthetic data → collate → sharded train steps →
device eval outputs → host decode → metrics. Asserts the model actually
learns (loss drops sharply; decoded predictions appear with good precision)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from peneo_tpu.config import LiltConfig, PEneoConfig
from peneo_tpu.data.collator import PEneoCollator
from peneo_tpu.data.datasets import RFUNDDataset
from peneo_tpu.data.fetchers import fetch_xlm
from peneo_tpu.data.synthetic import ToyTokenizer, write_rfund_dataset
from peneo_tpu.models.peneo import PEneoModel
from peneo_tpu.pipeline import decode as dec
from peneo_tpu.pipeline import evaluation as ev
from peneo_tpu.pipeline import train as T


@pytest.mark.slow
def test_overfit_two_pages(tmp_path):
    root = write_rfund_dataset(str(tmp_path / "rfund"), n_train=2, n_val=1, seed=5)
    tok = ToyTokenizer()
    ds = RFUNDDataset(root, "train", "en", tok, tokenizer_fetcher=fetch_xlm,
                      max_token_len=64, add_cls_token=True)
    coll = PEneoCollator(max_seq_len=65, pad_token_id=0, add_cls_token=True)
    b = coll([ds[0], ds[1]])
    batch = {"input_ids": b.input_ids, "bbox": b.bbox,
             "attention_mask": b.attention_mask, "labels": b.labels}

    cfg = PEneoConfig(
        backbone_name="lilt-infoxlm-base",
        backbone_config=LiltConfig(
            vocab_size=tok.vocab_size, pad_token_id=0, hidden_size=48,
            num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=96).to_dict(),
        pair_block_size=16,
        peneo_category_weights=[1.0, 10.0, 10.0],
        peneo_downstream_speedup_ratio=30.0,
    )
    model = PEneoModel(cfg, dtype=jnp.float32)
    # 500 steps: with the reference-parity embedding init (padding rows
    # zeroed), seed 0 needs past ~400 steps before decoded precision
    # stabilizes ≥0.5 on this 2-page corpus (measured: 0.75 at 500)
    n_steps = 500
    opt = T.make_optimizer(None, lr=1e-3, total_steps=n_steps,
                           warmup_ratio=0.05, downstream_speedup_ratio=30.0)
    state = T.create_train_state(cfg, model, opt, batch, seed=0)
    step = T.jit_train_step(model, opt)
    first_loss = None
    for i in range(n_steps):
        state, m = step(state, batch)
        if first_loss is None:
            first_loss = float(m["total"])
    last_loss = float(m["total"])
    assert last_loss < 0.35 * first_loss, (first_loss, last_loss)

    eval_step = jax.jit(T.make_eval_step(model))
    out = jax.device_get(eval_step(state.params, batch))
    # the model must be predicting actual line spans by now (compact format)
    assert int(out["line_extraction"]["spot_count"][0]) > 0
    preds, gts, fn = dec.decode_batch(b.texts, out, b.labels,
                                      [int(s) for s in b.seq_len], b.fnames)
    metrics, _ = ev.calculate_kvpe_metric(preds, gts, fn)
    # gt decode must reproduce the dataset relations exactly
    for gt_res, rels in zip(gts, b.relations):
        assert sorted(gt_res[0]) == sorted((r["key"], r["value"]) for r in rels)
    # overfit model: anything it emits should be mostly right
    if sum(len(p[0]) for p in preds):
        assert metrics["precision"] >= 0.5
