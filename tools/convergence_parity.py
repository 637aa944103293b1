#!/usr/bin/env python
"""Same-corpus convergence parity: reference torch trainer vs peneo-tpu.

The strongest quality-parity statement this environment permits (no real
RFUND data / pretrained weights): fine-tune the REFERENCE PEneo stack
(/root/reference — its real PEneoTrainer.create_optimizer 4-group AdamW,
pipeline/trainer.py:275-354, + the HF linear warmup/decay scheduler and
grad clipping) and peneo-tpu from IDENTICAL converted initial weights on
the SAME synthetic RFUND corpus in the SAME batch order for N steps
(through warmup and deep into the decay tail), then decode a held-out
split through EACH side's own decode + KVPE-metric stack
(reference: pipeline/decode.py:381-511 + pipeline/evaluation.py:98;
ours: pipeline/decode.decode_batch + pipeline/evaluation.calculate_kvpe_metric)
and compare per-step loss curves and final F1.

Both sides run fp32 on CPU with dropout 0 so the only divergence source is
floating-point arithmetic order. Per-step losses are compared exactly early
(before fp drift compounds) and as window means late; the decoded eval
F1 is the end-to-end functional check.

Run:  python tools/convergence_parity.py --steps 400
Writes a JSON report + prints a summary table. A slow-marked test
(tests/test_convergence_parity.py) runs a short version in CI.
"""

import argparse
import json
import math
import os
import sys
import time

# PENEO_PARITY_TPU=1 lets `--ours_dtype bfloat16` time-travel the jax side
# onto the real TPU for the statistical (window-means-only) flagship run;
# the reference side stays torch CPU fp32 either way.
if os.environ.get("PENEO_PARITY_TPU") != "1":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np  # noqa: E402

_COMMON = dict(
    hidden_dropout_prob=0.0,           # determinism: fp order is the only
    attention_probs_dropout_prob=0.0,  # divergence source between stacks
    max_2d_position_embeddings=1024,
)
_V3_COMMON = dict(
    _COMMON,
    type_vocab_size=1,
    layer_norm_eps=1e-5,
    has_relative_attention_bias=True,
    rel_pos_bins=32,
    max_rel_pos=128,
    has_spatial_attention_bias=True,
    rel_2d_pos_bins=64,
    max_rel_2d_pos=256,
    visual_embed=True,
    patch_size=16,
)
GEOMETRIES = {
    # dev: smallest geometry where every integral constraint holds
    ("lilt", "dev"): dict(
        _COMMON, hidden_size=96, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=192, channel_shrink_ratio=4),
    # base: the real lilt-infoxlm-base geometry (reference
    # model/backbone/lilt/configuration_lilt.py defaults)
    ("lilt", "base"): dict(
        _COMMON, hidden_size=768, num_hidden_layers=12,
        num_attention_heads=12, intermediate_size=3072,
        channel_shrink_ratio=4),
    # dev v3: 4·coord + 2·shape = hidden; input 64px → 17 visual tokens
    ("layoutlmv3", "dev"): dict(
        _V3_COMMON, hidden_size=96, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=192,
        coordinate_size=16, shape_size=16, input_size=64),
    # base v3: the layoutlmv3-base geometry (reference
    # model/backbone/layoutlmv3/configuration_layoutlmv3.py), 224px images
    ("layoutlmv3", "base"): dict(
        _V3_COMMON, hidden_size=768, num_hidden_layers=12,
        num_attention_heads=12, intermediate_size=3072,
        coordinate_size=128, shape_size=128, input_size=224),
}
GEOMETRY = GEOMETRIES[("lilt", "dev")]  # legacy alias (round-4 report)
CATEGORY_WEIGHTS = [1.0, 10.0, 10.0]
SPEEDUP = 30.0
WEIGHT_DECAY = 0.01
MAX_GRAD_NORM = 1.0


def build_corpus(tmp, n_train, n_val, max_len, seed=11, family="lilt",
                 input_size=224):
    from peneo_tpu.data.collator import PEneoCollator
    from peneo_tpu.data.datasets import RFUNDDataset
    from peneo_tpu.data.fetchers import fetch_xlm
    from peneo_tpu.data.synthetic import ToyTokenizer, write_rfund_dataset

    with_images = family != "lilt"
    root = write_rfund_dataset(os.path.join(tmp, "rfund"), n_train=n_train,
                               n_val=n_val, seed=seed,
                               with_images=with_images)
    tok = ToyTokenizer()
    # registry flags for the family (registry.py): v3 appends SEP too
    add_sep = family == "layoutlmv3"
    mk = lambda split: RFUNDDataset(  # noqa: E731
        root, split, "en", tok, tokenizer_fetcher=fetch_xlm,
        max_token_len=max_len - 1 - int(add_sep), add_cls_token=True,
        add_sep_token=add_sep)
    image_loader = None
    if with_images:
        from peneo_tpu.data.image_processing import layoutlmv3_preprocess

        image_loader = lambda p: layoutlmv3_preprocess(p, input_size)  # noqa: E731
    coll = PEneoCollator(max_seq_len=max_len, pad_token_id=0,
                         add_cls_token=True, image_loader=image_loader)
    return tok, mk("train"), mk("dev"), coll


def batch_schedule(n_items, batch_size, n_steps, seed=3):
    """Identical-order epoch shuffles for both stacks (drop ragged tail)."""
    rng = np.random.default_rng(seed)
    order = []
    while len(order) < n_steps:
        perm = rng.permutation(n_items)
        for k in range(n_items // batch_size):
            order.append(perm[k * batch_size:(k + 1) * batch_size].tolist())
    return order[:n_steps]


def collate_steps(ds, coll, schedule):
    items = [ds[i] for i in range(len(ds))]
    return [coll([items[i] for i in idxs]) for idxs in schedule]


FAMILY_BACKBONE = {"lilt": "lilt-infoxlm-base",
                   "layoutlmv3": "layoutlmv3-base"}


def reference_model(tok_vocab, max_len, family="lilt", geometry="dev",
                    seed=0):
    from conftest import enable_reference_imports

    enable_reference_imports()
    import torch

    from model.configuration_peneo import PEneoConfig as RefConfig
    from model.modeling_peneo import PEneoModel as RefModel

    torch.manual_seed(seed)
    cfg = RefConfig(
        backbone_name=FAMILY_BACKBONE[family],
        backbone_config=dict(
            GEOMETRIES[(family, geometry)], model_type=family,
            vocab_size=tok_vocab,
            pad_token_id=0, max_position_embeddings=max_len + 8),
        peneo_category_weights=CATEGORY_WEIGHTS,
        peneo_downstream_speedup_ratio=SPEEDUP,
    )
    return RefModel(cfg)


def ref_tags_from_dense(labels):
    """Dense (B, Ld, Ld) label matrices → reference flattened shaking tags."""
    from peneo_tpu.data import tagging as tg

    out = {}
    key_map = {
        "line_extraction": "line_extraction_shaking_tag",
        "ent_linking_h2h": "ent_linking_head_rel_shaking_tag",
        "ent_linking_t2t": "ent_linking_tail_rel_shaking_tag",
        "line_grouping_h2h": "line_grouping_head_rel_shaking_tag",
        "line_grouping_t2t": "line_grouping_tail_rel_shaking_tag",
    }
    for name, ref_key in key_map.items():
        m = np.asarray(labels[name])
        out[ref_key] = np.stack([tg.flatten_triu(m[b])
                                 for b in range(m.shape[0])])
    return out


def run_ours(ref, batches, lr, warmup_ratio, n_steps, val_batches,
             family="lilt", ours_dtype="float32", fused=False):
    import jax
    import jax.numpy as jnp

    from peneo_tpu.config import LayoutLMv3Config, LiltConfig, PEneoConfig
    from peneo_tpu.models.convert import (convert_peneo_checkpoint,
                                          torch_state_dict_to_numpy)
    from peneo_tpu.models.peneo import PEneoModel
    from peneo_tpu.pipeline import decode as dec
    from peneo_tpu.pipeline import evaluation as ev
    from peneo_tpu.pipeline import train as T

    bb = ref.config.backbone_config
    cfg_cls = LayoutLMv3Config if family == "layoutlmv3" else LiltConfig
    cfg = PEneoConfig(
        backbone_name=FAMILY_BACKBONE[family],
        backbone_config=cfg_cls.from_dict(dict(bb)).to_dict(),
        pair_block_size=64,
        peneo_category_weights=CATEGORY_WEIGHTS,
        peneo_downstream_speedup_ratio=SPEEDUP,
        spot_topk="exact",
        # the TPU training defaults under test in the bf16 statistical run
        use_fused_biacm_train=fused and family == "lilt",
        use_fused_bias_attention_train=fused and family == "layoutlmv3",
    )
    params = convert_peneo_checkpoint(
        torch_state_dict_to_numpy(ref.state_dict()), cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    model = PEneoModel(cfg, dtype=jnp.dtype(ours_dtype))

    opt = T.make_optimizer(params, lr=lr, total_steps=n_steps,
                           warmup_ratio=warmup_ratio,
                           weight_decay=WEIGHT_DECAY,
                           downstream_speedup_ratio=SPEEDUP,
                           max_grad_norm=MAX_GRAD_NORM)
    def to_batch(b, with_labels=True):
        d = {"input_ids": jnp.asarray(b.input_ids),
             "bbox": jnp.asarray(b.bbox),
             "attention_mask": jnp.asarray(b.attention_mask)}
        if b.image is not None:
            d["image"] = jnp.asarray(b.image)
        if with_labels:
            d["labels"] = {k: jnp.asarray(v) for k, v in b.labels.items()}
        return d

    state = T.create_train_state(cfg, model, opt, to_batch(batches[0]),
                                 params=params)
    step_fn = T.jit_train_step(model, opt)

    losses = []
    t0 = time.time()
    for i in range(n_steps):
        state, m = step_fn(state, to_batch(batches[i]))
        losses.append(float(m["total"]))
    train_s = time.time() - t0

    eval_step = jax.jit(T.make_eval_step(model))
    all_pred, all_gt, all_fn = [], [], []
    for b in val_batches:
        out = jax.device_get(eval_step(state.params,
                                       to_batch(b, with_labels=False)))
        p, g, f = dec.decode_batch(b.texts, out, b.labels,
                                   [int(s) for s in b.seq_len], b.fnames)
        all_pred += p
        all_gt += g
        all_fn += f
    metrics, _ = ev.calculate_kvpe_metric(all_pred, all_gt, all_fn)
    return losses, metrics, train_s


def run_reference(ref, batches, lr, warmup_ratio, n_steps, val_batches):
    import torch
    from transformers import TrainingArguments

    sys.path.insert(0, "/root/reference")
    from model.peneo_decoder import HandshakingTaggingScheme
    from pipeline.decode import decode_peneo
    from pipeline.evaluation import calculate_KVPE_metric
    from pipeline.trainer import PEneoTrainer

    torch.set_num_threads(max(1, (os.cpu_count() or 4) - 2))
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        args = TrainingArguments(
            output_dir=tmp, learning_rate=lr, warmup_ratio=warmup_ratio,
            weight_decay=WEIGHT_DECAY, max_grad_norm=MAX_GRAD_NORM,
            per_device_train_batch_size=batches[0].input_ids.shape[0],
            use_cpu=True, report_to=[])
        trainer = PEneoTrainer(downstream_speedup_ratio=SPEEDUP,
                               model=ref, args=args)
        optimizer = trainer.create_optimizer()
        scheduler = trainer.create_scheduler(
            num_training_steps=n_steps, optimizer=optimizer)

    def to_inputs(b):
        tags = ref_tags_from_dense(b.labels)
        d = dict(
            input_ids=torch.tensor(np.asarray(b.input_ids, np.int64)),
            bbox=torch.tensor(np.asarray(b.bbox, np.int64)),
            orig_bbox=torch.tensor(np.asarray(b.bbox, np.int64)),
            attention_mask=torch.tensor(np.asarray(b.attention_mask,
                                                   np.int64)),
            **{k: torch.tensor(v).long() for k, v in tags.items()},
        )
        if b.image is not None:
            d["image"] = torch.tensor(np.asarray(b.image, np.float32))
        return d

    ref.train()
    losses = []
    t0 = time.time()
    for i in range(n_steps):
        out = ref(**to_inputs(batches[i]))
        optimizer.zero_grad()
        out.loss.backward()
        torch.nn.utils.clip_grad_norm_(ref.parameters(), MAX_GRAD_NORM)
        optimizer.step()
        scheduler.step()
        losses.append(float(out.loss.detach()))
    train_s = time.time() - t0

    # eval exactly as the reference prediction_loop assembles its state
    # (pipeline/trainer.py:95-160): per-sample padded logits + tags + the
    # model-output orig_bbox (padded) + unpadded fetched texts
    ref.eval()
    tagger = HandshakingTaggingScheme()
    acc = {k: [] for k in ("le", "eh", "et", "gh", "gt")}
    tag_acc = {k: [] for k in ("le", "eh", "et", "gh", "gt")}
    texts, bboxes, fnames = [], [], []
    with torch.no_grad():
        for b in val_batches:
            inputs = to_inputs(b)
            out = ref(**inputs)
            for lst, t in ((acc["le"], out.line_extraction_shaking_outputs),
                           (acc["eh"], out.ent_linking_h2h_shaking_outputs),
                           (acc["et"], out.ent_linking_t2t_shaking_outputs),
                           (acc["gh"], out.line_grouping_h2h_shaking_outputs),
                           (acc["gt"], out.line_grouping_t2t_shaking_outputs)):
                lst.extend(list(t))
            for key, name in (("le", "line_extraction_shaking_tag"),
                              ("eh", "ent_linking_head_rel_shaking_tag"),
                              ("et", "ent_linking_tail_rel_shaking_tag"),
                              ("gh", "line_grouping_head_rel_shaking_tag"),
                              ("gt", "line_grouping_tail_rel_shaking_tag")):
                tag_acc[key].extend(list(inputs[name]))
            bboxes += out.orig_bbox.tolist()
            texts += list(b.texts)
            fnames += list(b.fnames)

    preds, gts, fids = decode_peneo(
        tagger, texts,
        acc["le"], acc["eh"], acc["et"], acc["gh"], acc["gt"],
        tag_acc["le"], tag_acc["eh"], tag_acc["et"], tag_acc["gh"],
        tag_acc["gt"], bboxes, fnames)
    metrics, _detail = calculate_KVPE_metric(preds, gts, fids)
    return losses, metrics, train_s


def compare(ours, ref, n_steps, window=50):
    report = {}
    o, r = np.asarray(ours), np.asarray(ref)
    report["step1_rel_diff"] = float(abs(o[0] - r[0]) / r[0])
    # per-step drift compounds ~fp32-chaotically once updates apply (the
    # decoder group steps at 30× lr), so exact comparison is only meaningful
    # for the first few steps; beyond that window means carry the signal
    k = min(5, n_steps)
    report["first5_max_rel_diff"] = float(
        np.max(np.abs(o[:k] - r[:k]) / r[:k]))
    wins = []
    for s in range(0, n_steps, window):
        e = min(s + window, n_steps)
        om, rm = float(o[s:e].mean()), float(r[s:e].mean())
        wins.append({"steps": [s, e], "ours_mean": om, "ref_mean": rm,
                     "rel_diff": abs(om - rm) / max(rm, 1e-9)})
    report["window_means"] = wins
    report["max_window_rel_diff"] = max(w["rel_diff"] for w in wins)
    report["final_window_rel_diff"] = wins[-1]["rel_diff"]
    return report


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--b", type=int, default=8)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--warmup_ratio", type=float, default=0.1)
    p.add_argument("--max_len", type=int, default=192)
    p.add_argument("--train_pages", type=int, default=48)
    p.add_argument("--val_pages", type=int, default=16)
    p.add_argument("--family", choices=("lilt", "layoutlmv3"),
                   default="lilt")
    p.add_argument("--geometry", choices=("dev", "base"), default="dev")
    p.add_argument("--ours_dtype", choices=("float32", "bfloat16"),
                   default="float32",
                   help="bfloat16 runs the jax side in the TPU training "
                        "dtype (set PENEO_PARITY_TPU=1 to put it on the "
                        "real chip) — step-exact checks are skipped; the "
                        "comparison is statistical (window means + F1)")
    p.add_argument("--fused", action="store_true",
                   help="enable the fused train attention kernel under "
                        "test (use_fused_biacm_train / "
                        "use_fused_bias_attention_train)")
    p.add_argument("--reuse_ref", default=None,
                   help="path to a previous report.json: reuse its "
                        "reference trajectory + eval instead of re-running "
                        "the torch side (corpus/schedule seeds are fixed, "
                        "so identical settings yield identical batches)")
    p.add_argument("--eval_split", choices=("dev", "train"), default="dev",
                   help="'train' decodes the training pages instead — the "
                        "functional overfit check (tiny from-scratch models "
                        "don't generalize off 48 pages, so dev F1 can be "
                        "0 == 0 on both sides; train F1 shows real decode "
                        "activity through each stack)")
    p.add_argument("--out", default=os.path.join(REPO, "runs",
                                                 "convergence_parity"))
    args = p.parse_args(argv)

    from conftest import reference_available

    if not reference_available():
        print("reference not mounted", file=sys.stderr)
        return 1

    import tempfile

    reused = None
    if args.reuse_ref:
        with open(args.reuse_ref) as f:
            reused = json.load(f)
        for key in ("steps", "b", "lr", "warmup_ratio", "max_len",
                    "train_pages", "val_pages"):
            assert reused["config"][key] == getattr(args, key), \
                f"--reuse_ref mismatch on {key}"
        # keys absent in round-4 reports default to that round's values
        for key, legacy in (("eval_split", "dev"), ("family", "lilt"),
                            ("geometry", "dev")):
            assert reused["config"].get(key, legacy) == getattr(args, key), \
                f"--reuse_ref mismatch on {key}"

    geom = GEOMETRIES[(args.family, args.geometry)]
    with tempfile.TemporaryDirectory() as tmp:
        tok, train_ds, val_ds, coll = build_corpus(
            tmp, args.train_pages, args.val_pages, args.max_len,
            family=args.family, input_size=geom.get("input_size", 224))
        schedule = batch_schedule(len(train_ds), args.b, args.steps)
        print(f"collating {args.steps} train batches "
              f"({len(train_ds)} pages, B={args.b}) ...", flush=True)
        batches = collate_steps(train_ds, coll, schedule)
        eval_ds = train_ds if args.eval_split == "train" else val_ds
        val_idx = list(range(len(eval_ds)))
        val_sched = [val_idx[k:k + args.b]
                     for k in range(0, len(val_idx), args.b)]
        val_batches = collate_steps(eval_ds, coll, val_sched)

        ref = reference_model(tok.vocab_size, args.max_len,
                              args.family, args.geometry)

        print("running peneo-tpu trajectory ...", flush=True)
        ours_losses, ours_metrics, ours_s = run_ours(
            ref, batches, args.lr, args.warmup_ratio, args.steps,
            val_batches, family=args.family, ours_dtype=args.ours_dtype,
            fused=args.fused)
        print(f"  done in {ours_s:.0f}s; eval {ours_metrics}", flush=True)

        if reused is not None:
            ref_losses = reused["losses_ref"]
            ref_metrics = dict(reused["eval_ref"])
            ref_s = reused["train_seconds"]["ref_cpu"]
            print(f"reference trajectory reused from {args.reuse_ref}",
                  flush=True)
        else:
            # the reference trajectory mutates ref's weights — run second
            print("running reference trajectory ...", flush=True)
            ref_losses, ref_metrics, ref_s = run_reference(
                ref, batches, args.lr, args.warmup_ratio, args.steps,
                val_batches)
            print(f"  done in {ref_s:.0f}s; "
                  f"eval p={ref_metrics['precision']:.4f}"
                  f" r={ref_metrics['recall']:.4f} "
                  f"f1={ref_metrics['f1']:.4f}",
                  flush=True)

    cmp = compare(ours_losses, ref_losses, args.steps)
    report = {
        "config": vars(args),
        "geometry": geom,
        "losses_ours": ours_losses,
        "losses_ref": ref_losses,
        "loss_compare": cmp,
        "eval_ours": {k: ours_metrics[k] for k in
                      ("precision", "recall", "f1")},
        "eval_ref": {k: float(ref_metrics[k]) for k in
                     ("precision", "recall", "f1")},
        "train_seconds": {"ours": ours_s, "ref_cpu": ref_s},
    }
    os.makedirs(args.out, exist_ok=True)
    tag = f"{args.family}_{args.geometry}"
    if args.ours_dtype != "float32":
        tag += f"_{args.ours_dtype}" + ("_fused" if args.fused else "")
    out_path = os.path.join(args.out, f"report_{tag}.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)

    print("\n=== convergence parity ===")
    print(f"step-1 loss:   ours {ours_losses[0]:.6f}  "
          f"ref {ref_losses[0]:.6f}  rel {cmp['step1_rel_diff']:.2e}")
    print(f"first-5 max rel diff: {cmp['first5_max_rel_diff']:.2e}")
    for w in cmp["window_means"]:
        print(f"steps {w['steps'][0]:4d}-{w['steps'][1]:4d}: "
              f"ours {w['ours_mean']:.5f}  ref {w['ref_mean']:.5f}  "
              f"rel {w['rel_diff']:.3%}")
    print(f"eval F1: ours {report['eval_ours']['f1']:.4f}  "
          f"ref {report['eval_ref']['f1']:.4f}")
    print(f"report: {out_path}")

    if args.ours_dtype == "float32":
        ok = (cmp["step1_rel_diff"] < 5e-4
              and cmp["first5_max_rel_diff"] < 2e-2
              and cmp["max_window_rel_diff"] < 0.10
              and abs(report["eval_ours"]["f1"]
                      - report["eval_ref"]["f1"]) < 0.05)
    else:
        # bf16: per-step exactness is not defined (≈3 decimal digits of
        # mantissa); the statistical claim is that window means track the
        # fp32 torch trajectory and the decoded F1 agrees. Each window is
        # judged rtol-OR-atol (allclose-style): deep in the memorization
        # tail the per-window means sit at ~1e-2 while the loss scale is
        # ~5.0 at init, so a bf16-rounding floor of a few 1e-3 absolute —
        # systematic (ours slightly above fp32), not a trajectory
        # divergence — reads as tens of percent on an ill-conditioned
        # relative metric. atol 5e-3 = 0.1% of the initial-loss scale.
        win_ok = all(w["rel_diff"] < 0.15
                     or abs(w["ours_mean"] - w["ref_mean"]) < 5e-3
                     for w in cmp["window_means"])
        ok = (win_ok
              and abs(report["eval_ours"]["f1"]
                      - report["eval_ref"]["f1"]) < 0.05)
    print("PARITY:", "PASS" if ok else "FAIL")
    return 0 if ok else 2


if __name__ == "__main__":
    raise SystemExit(main())
