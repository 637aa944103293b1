#!/usr/bin/env python
"""A/B the pipelined eval loop against the round-4 sequential one.

`PEneoTrainer.evaluate` overlaps host chain-walk decode of batch i with
device compute of batch i+1 (the serving dispatch/collect pattern,
pipeline/infer.py); `PENEO_EVAL_SEQUENTIAL=1` restores the strictly
sequential fetch→decode→dispatch loop. The env var is read per `evaluate()`
call, so one process times both modes against the same compiled step and
the metrics are asserted identical (the futures drain in dispatch order).

Mirrors the reference recipe's eval shape (per_device_eval_batch_size=16,
L=512 — /root/reference/start/run_rfund.py) on a synthetic RFUND corpus
with a freshly initialized model; random logits mark plenty of spots, so
the host decode side is a realistic-to-heavy load.

  python tools/bench_eval.py --pages 192 --B 16 --iters 3
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pages", type=int, default=192)
    p.add_argument("--B", type=int, default=16,
                   help="per-device eval batch (reference recipe: 16)")
    p.add_argument("--L", type=int, default=512)
    p.add_argument("--iters", type=int, default=3,
                   help="timed evaluate() calls per mode (alternating)")
    p.add_argument("--hidden", type=int, default=768)
    p.add_argument("--layers", type=int, default=12)
    p.add_argument("--out", default=None, help="append JSON line here")
    p.add_argument("--sparse", action="store_true",
                   help="shift pair-head output biases so (almost) no "
                        "position tags positive — the trained-model-like "
                        "regime where eval is device-bound and pipelining "
                        "hides fetch+decode behind compute")
    args = p.parse_args(argv)

    import tempfile

    import jax
    import jax.numpy as jnp

    from peneo_tpu.config import LiltConfig, PEneoConfig
    from peneo_tpu.data.collator import PEneoCollator
    from peneo_tpu.data.datasets import RFUNDDataset
    from peneo_tpu.data.fetchers import fetch_xlm
    from peneo_tpu.data.synthetic import ToyTokenizer, write_rfund_dataset
    from peneo_tpu.models.peneo import PEneoModel
    from peneo_tpu.pipeline.trainer import PEneoTrainer, TrainingArguments

    tmp = tempfile.mkdtemp(prefix="bench_eval_")
    root = write_rfund_dataset(os.path.join(tmp, "data"), n_train=4,
                               n_val=args.pages)
    tok = ToyTokenizer()
    ds_kwargs = dict(tokenizer=tok, tokenizer_fetcher=fetch_xlm,
                     max_token_len=args.L - 1, add_cls_token=True)
    eval_ds = RFUNDDataset(root, "dev", "en", **ds_kwargs)
    train_ds = RFUNDDataset(root, "train", "en", **ds_kwargs)
    coll = PEneoCollator(max_seq_len=args.L, pad_token_id=0,
                         add_cls_token=True)
    bb = LiltConfig(vocab_size=tok.vocab_size, hidden_size=args.hidden,
                    num_hidden_layers=args.layers,
                    max_position_embeddings=args.L + 2).to_dict()
    cfg = PEneoConfig(backbone_name="lilt-infoxlm-base", backbone_config=bb,
                      max_spots_per_head=256, spot_topk="approx")
    model = PEneoModel(cfg, dtype=jnp.bfloat16)
    # Fresh random params (no training run here): shape-infer then fill on
    # host — random logits mark plenty of spots, a realistic-to-heavy decode
    # load for the A/B.
    import numpy as np
    ids = np.ones((1, args.L), np.int32)
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), ids,
                           np.zeros((1, args.L, 4), np.int32), ids,
                           deterministic=True)["params"])
    rng = np.random.default_rng(0)
    params = jax.tree_util.tree_map(
        lambda s: rng.normal(0, 0.02, s.shape).astype(s.dtype), params)
    if args.sparse:
        # Every pair-head classifier chain ends in ``fc_out`` (decoder.py
        # MLPHead); pushing its non-negative-class biases down means argmax
        # lands on class 0 everywhere → zero spots, trivial chain walks.
        def _shift(tree):
            for k, v in tree.items():
                if k == "fc_out" and isinstance(v, dict) and "bias" in v:
                    v["bias"][1:] -= 50.0
                elif isinstance(v, dict):
                    _shift(v)
        _shift(params)
    targs = TrainingArguments(
        output_dir=os.path.join(tmp, "run"), max_steps=1,
        per_device_eval_batch_size=args.B, dp=1, tp=1, seed=0)
    trainer = PEneoTrainer(cfg, model, targs, train_ds, eval_ds, coll,
                           params=params)

    print(f"backend={jax.default_backend()} pages={args.pages} "
          f"B={args.B} L={args.L}", flush=True)
    t0 = time.perf_counter()
    warm = trainer.evaluate()
    print(f"warmup (compile) {time.perf_counter() - t0:.1f}s "
          f"f1={warm.get('eval_f1')}", flush=True)

    results = {"pipelined": [], "sequential": []}
    metrics = {}
    for it in range(args.iters):
        for mode in ("pipelined", "sequential"):
            os.environ["PENEO_EVAL_SEQUENTIAL"] = \
                "1" if mode == "sequential" else "0"
            t0 = time.perf_counter()
            m = trainer.evaluate()
            dt = time.perf_counter() - t0
            results[mode].append(dt)
            metrics.setdefault(mode, m)
            print(f"  iter {it} {mode}: {dt:.2f}s "
                  f"({args.pages / dt:.2f} samples/s)", flush=True)
    os.environ.pop("PENEO_EVAL_SEQUENTIAL", None)

    # identical accumulation order → identical metrics
    for k, v in metrics["pipelined"].items():
        if k.startswith("eval_") and "per_second" not in k and "runtime" \
                not in k:
            assert abs(v - metrics["sequential"][k]) < 1e-9, \
                (k, v, metrics["sequential"][k])

    med = {m: sorted(v)[len(v) // 2] for m, v in results.items()}
    line = {
        "metric": "eval_samples_per_second",
        "B": args.B, "L": args.L, "pages": args.pages,
        "pipelined_s": round(med["pipelined"], 3),
        "sequential_s": round(med["sequential"], 3),
        "pipelined_samples_per_s": round(args.pages / med["pipelined"], 2),
        "sequential_samples_per_s": round(args.pages / med["sequential"], 2),
        "speedup": round(med["sequential"] / med["pipelined"], 4),
    }
    print(json.dumps(line), flush=True)
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
