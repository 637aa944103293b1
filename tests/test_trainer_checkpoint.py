"""Trainer integration: checkpoint save → resume continues at the same step
with identical params; serving artifact export → deserialized call matches
the live model."""

import os

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
from peneo_tpu.pipeline.trainer import PEneoTrainer, TrainingArguments

TINY = dict(vocab_size=2000, hidden_size=48, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=96,
            max_position_embeddings=64, pad_token_id=0)


def _make_trainer(root, outdir, max_steps):
    tok = ToyTokenizer()
    ds_kwargs = dict(tokenizer=tok, tokenizer_fetcher=fetch_xlm,
                     max_token_len=48, add_cls_token=True)
    train_ds = RFUNDDataset(root, "train", "en", **ds_kwargs)
    eval_ds = RFUNDDataset(root, "dev", "en", **ds_kwargs)
    coll = PEneoCollator(max_seq_len=48, pad_token_id=0, add_cls_token=True)
    cfg = PEneoConfig(backbone_name="lilt-infoxlm-base",
                      backbone_config=LiltConfig.from_dict(TINY).to_dict(),
                      pair_block_size=16, max_spots_per_head=64)
    model = PEneoModel(cfg, dtype=jnp.float32)
    args = TrainingArguments(
        output_dir=outdir, max_steps=max_steps, learning_rate=1e-3,
        per_device_train_batch_size=1, per_device_eval_batch_size=1,
        logging_steps=10, eval_steps=0, save_steps=5, save_total_limit=2,
        metric_for_best_model=None, dp=8, tp=1, seed=0,
    )
    return PEneoTrainer(cfg, model, args, train_ds, eval_ds, coll)


def test_checkpoint_resume(tmp_path):
    root = write_rfund_dataset(str(tmp_path / "data"), n_train=8, n_val=2)
    out = str(tmp_path / "run")

    t1 = _make_trainer(root, out, max_steps=5)
    t1.train()
    assert t1.ckpt.latest_step() == 5
    params_after_5 = jax.device_get(t1.state.params)
    t1.ckpt.close()

    # resume in a fresh trainer and continue to step 8
    t2 = _make_trainer(root, out, max_steps=10)
    t2.train()
    assert int(jax.device_get(t2.state.step)) == 10
    assert t2.ckpt.latest_step() == 10  # continued saving past the resume point

    # the restored state really came from the checkpoint: re-restoring step 5
    # must equal the params captured after the first run
    restored = t2.ckpt.restore(t2.state, step=5)
    a = jax.tree_util.tree_leaves(params_after_5)
    b = jax.tree_util.tree_leaves(jax.device_get(restored.params))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    t2.ckpt.close()


def test_feed_state_set_state_matches_uninterrupted_run():
    """DataFeed.set_state(epoch, k) must continue exactly where an
    uninterrupted run would be: same per-epoch shuffle, first k batches
    skipped — NOT an epoch-0 replay."""
    from peneo_tpu.pipeline.loader import DataFeed

    make = lambda: DataFeed(list(range(20)), lambda f: np.array(f),
                            batch_size=4, shuffle=True, seed=7,
                            num_workers=1)
    ref = make()
    epoch0 = [b.copy() for b in ref]
    epoch1 = [b.copy() for b in ref]

    resumed = make()
    resumed.set_state(1, 2)  # 2 batches of epoch 1 already consumed
    got = [b.copy() for b in resumed]
    assert len(got) == len(epoch1) - 2
    for g, e in zip(got, epoch1[2:]):
        np.testing.assert_array_equal(g, e)
    # epoch-1 shuffle differs from epoch-0 (the thing a naive restart replays)
    assert any(not np.array_equal(a, b) for a, b in zip(epoch0, epoch1))
    # subsequent epoch continues normally (epoch 2, no skip)
    nxt = [b.copy() for b in resumed]
    assert len(nxt) == len(epoch0)


def test_checkpoint_persists_feed_position(tmp_path):
    root = write_rfund_dataset(str(tmp_path / "data"), n_train=8, n_val=2)
    out = str(tmp_path / "run")
    t1 = _make_trainer(root, out, max_steps=5)
    t1.train()
    # 8 train docs / global batch 8 → 1 batch per epoch: after 5 batches the
    # feed sits at (epoch 4, 1 batch consumed)
    _, feed_pos = t1.ckpt.restore_with_feed(t1.state, step=5)
    assert feed_pos == (4, 1)
    t1.ckpt.close()


def test_eval_losses_and_servable_save_model(tmp_path):
    """evaluate() reports mean eval losses (reference only logs the last
    batch's, pipeline/trainer.py:185-200); save_model() leaves a
    self-contained dir that InferenceService can load directly (reference
    saves the processor next to the weights, start/run_rfund.py:323-327)."""
    root = write_rfund_dataset(str(tmp_path / "data"), n_train=8, n_val=2)
    out = str(tmp_path / "run")
    t = _make_trainer(root, out, max_steps=2)
    t.tokenizer = ToyTokenizer()
    t.train()

    metrics = t.evaluate()
    for name in ("total", "line_extraction", "ent_linking_h2h"):
        assert f"loss_{name}" in metrics
        assert np.isfinite(metrics[f"loss_{name}"])

    t.save_model()
    t.ckpt.close()
    assert os.path.exists(os.path.join(out, "toy_tokenizer.json"))

    from peneo_tpu.pipeline.infer import InferenceService

    svc = InferenceService(out, max_seq_len=48, dtype="float32")
    assert isinstance(svc.tokenizer, ToyTokenizer)
    ids = np.ones((1, 48), np.int32) * 5
    bbox = np.tile(np.array([1, 2, 30, 20], np.int32), (1, 48, 1))
    attn = np.ones((1, 48), np.int32)
    out = jax.device_get(svc._forward(svc.params, ids, bbox, attn, None))
    if svc._packed:  # compact outputs ride the packed transport
        from peneo_tpu.pipeline.decode import unpack_spots

        out = unpack_spots(*out)
    assert "line_extraction" in out


def test_export_artifact_roundtrip(tmp_path):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.export_artifact import export_artifact, load_artifact

    root = write_rfund_dataset(str(tmp_path / "data"), n_train=8, n_val=1)
    out = str(tmp_path / "run")
    t = _make_trainer(root, out, max_steps=2)
    t.train()
    t.save_model()
    t.ckpt.close()

    art = export_artifact(out, str(tmp_path / "art"), batch_size=1,
                          max_seq_len=48, dtype="float32")
    call, params, meta, cfg = load_artifact(art)

    rng = np.random.default_rng(0)
    ids = rng.integers(3, 2000, (1, 48)).astype(np.int32)
    bbox = np.tile(np.array([1, 2, 30, 20], np.int32), (1, 48, 1))
    attn = np.ones((1, 48), np.int32)
    art_out = jax.device_get(call(params, ids, bbox, attn))

    from peneo_tpu.models.peneo import PEneoModel as PM

    model = PM(cfg, dtype=jnp.float32)
    live_out = jax.device_get(model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        ids, bbox, attn, deterministic=True))
    for name, head in live_out.items():
        for k in head:
            np.testing.assert_allclose(np.asarray(art_out[name][k]),
                                       np.asarray(head[k]), atol=1e-5)


def _make_mesh_trainer(root, outdir, max_steps, *, dp, tp=1, sp=1,
                       fsdp=False, batch=1):
    tok = ToyTokenizer()
    ds_kwargs = dict(tokenizer=tok, tokenizer_fetcher=fetch_xlm,
                     max_token_len=48, add_cls_token=True)
    train_ds = RFUNDDataset(root, "train", "en", **ds_kwargs)
    coll = PEneoCollator(max_seq_len=48, pad_token_id=0, add_cls_token=True)
    cfg = PEneoConfig(backbone_name="lilt-infoxlm-base",
                      backbone_config=LiltConfig.from_dict(TINY).to_dict(),
                      pair_block_size=16, max_spots_per_head=64)
    model = PEneoModel(cfg, dtype=jnp.float32)
    args = TrainingArguments(
        output_dir=outdir, max_steps=max_steps, learning_rate=1e-3,
        per_device_train_batch_size=batch, per_device_eval_batch_size=batch,
        logging_steps=10, eval_steps=0, save_steps=4, save_total_limit=2,
        metric_for_best_model=None, dp=dp, tp=tp, sp=sp, fsdp=fsdp, seed=0,
    )
    return PEneoTrainer(cfg, model, args, train_ds, None, coll)


def test_checkpoint_resumes_on_a_different_mesh(tmp_path):
    """Checkpoints are mesh-portable: a run saved under a pure-dp mesh
    restores (value-identical params + feed position) into a dp×tp×sp mesh
    with fsdp-sharded optimizer state and keeps training — the topology can
    change across restarts (the reference's HF/torch checkpoints are tied
    to the DDP world size for optimizer state, pipeline/trainer.py)."""
    root = write_rfund_dataset(str(tmp_path / "data"), n_train=8, n_val=2)
    out = str(tmp_path / "run")

    t1 = _make_mesh_trainer(root, out, max_steps=4, dp=8)
    t1.train()
    assert t1.ckpt.latest_step() == 4
    params_saved = jax.device_get(t1.state.params)
    t1.ckpt.close()

    # the restore is value-identical: a trainer whose max_steps equals the
    # saved step restores and runs ZERO steps, leaving state exactly as
    # restored (now laid out on the new mesh, fsdp-sharded)
    t3 = _make_mesh_trainer(root, out, max_steps=4,
                            dp=2, tp=2, sp=2, fsdp=True, batch=4)
    t3.train()
    assert int(jax.device_get(t3.state.step)) == 4
    flat_a, _ = jax.tree_util.tree_flatten(params_saved)
    flat_b, _ = jax.tree_util.tree_flatten(jax.device_get(t3.state.params))
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    t3.ckpt.close()

    # and training continues on the new mesh past the restore point
    t2 = _make_mesh_trainer(root, out, max_steps=6, dp=2, tp=2, sp=2,
                            fsdp=True, batch=4)
    t2.train()  # restores step 4, runs 2 more steps on the new mesh
    assert int(jax.device_get(t2.state.step)) == 6
    t2.ckpt.close()
