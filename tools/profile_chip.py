#!/usr/bin/env python
"""On-device profile + roofline for the flagship inference/train step.

Runs the LiLT-base + PEneo forward (bench.py shapes) under ``jax.profiler``,
parses the Chrome-trace the TPU backend writes, and prints:

- top device ops by total time (fusions, matmuls, sort/top-k, transfers)
- a category rollup (matmul / softmax-reduce / top_k / elementwise / other)
- analytic FLOPs/page and achieved vs peak FLOP/s (roofline position)

The reference has no profiling story at all (SURVEY.md §5); this is the
TPU-native observability extension, used to justify bench.py numbers.

Usage (on the TPU host):
    python tools/profile_chip.py [--B 32] [--L 512] [--iters 8] [--train]
"""

import argparse
import glob
import gzip
import json
import os
import re
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

V5E_PEAK_BF16 = 197e12  # TPU v5e: 197 TFLOP/s bf16


def analytic_flops_per_page(L: int, H: int = 768, layers: int = 12,
                            inter: int = 3072, shrink: int = 384,
                            n_heads: int = 5) -> float:
    """Forward FLOPs for LiLT-base + PEneo decoder at seq len L (2·MAC)."""
    ratio = 4  # LiLT channel_shrink_ratio
    Hl = H // ratio
    per_layer = (
        4 * L * H * H * 2          # text qkv + out proj
        + 2 * L * H * inter * 2    # text MLP
        + 4 * L * Hl * Hl * 2      # layout qkv + out proj
        + 2 * L * Hl * Hl * 4 * 2  # layout MLP (intermediate = 4·Hl)
        + 2 * L * L * (H + Hl) * 2  # scores + context (concat streams)
    )
    decoder = (
        L * H * H * 2 + L * H * shrink * 2      # shrink projections
        + 2 * L * shrink * shrink * 2           # comb_a/comb_b
        + (L * L // 2) * n_heads * (shrink * shrink * 2 + shrink * 4 * 2)
    )
    return layers * per_layer + decoder


def analytic_flops_single_stream(L_text: int, n_vis: int, H: int = 768,
                                 layers: int = 12, inter: int = 3072,
                                 shrink: int = 384, n_heads: int = 5) -> float:
    """Forward FLOPs for a single-stream backbone (LayoutLMv3/v2) + PEneo
    decoder: standard transformer over L_text + n_vis tokens; the pair grid
    covers the text tokens only (PEneoModel strips the visual tail). The
    visual tower (patch conv / ResNeXt) is excluded — it shows up in the
    rollup as conv time but is small at base geometry."""
    Lp = L_text + n_vis
    per_layer = (
        4 * Lp * H * H * 2          # qkv + out proj
        + 2 * Lp * H * inter * 2    # MLP
        + 2 * Lp * Lp * H * 2       # scores + context
    )
    decoder = (
        L_text * H * H * 2 + L_text * H * shrink * 2
        + 2 * L_text * shrink * shrink * 2
        + (L_text * L_text // 2) * n_heads * (shrink * shrink * 2
                                              + shrink * 4 * 2)
    )
    return layers * per_layer + decoder


CATEGORIES = [
    ("matmul", re.compile(r"dot|conv|gemm|matmul|einsum", re.I)),
    ("softmax/reduce", re.compile(r"softmax|reduce|exponential|divide", re.I)),
    ("top_k/sort", re.compile(r"sort|top.?k", re.I)),
    ("transfer", re.compile(r"copy|transpose|infeed|outfeed|h2d|d2h|"
                            r"transfer", re.I)),
    ("fusion", re.compile(r"fusion|fused", re.I)),
    ("elementwise", re.compile(r"add|mul|select|broadcast|compare|iota",
                               re.I)),
]


def parse_trace(logdir: str):
    """Aggregate device-op durations from the profiler's chrome trace."""
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {logdir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device lanes: process names that mention TPU/device (host python lanes
    # are excluded so the rollup is device time only)
    pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if re.search(r"TPU|/device|XLA Op|Tensorcore|SparseCore",
                         name, re.I):
                pids.add(e["pid"])
    ops = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if pids and e.get("pid") not in pids:
            continue
        name = e.get("name", "?")
        if name.startswith("jit_"):
            continue  # module-level event double-counts its child ops
        if name.isdigit():
            continue  # per-step aggregate lanes ("0", "1", …) double-count
        # the hlo_op/long_name arg (when present) is more classifiable than
        # "fusion.1234"
        args = e.get("args", {})
        label = args.get("hlo_op") or args.get("long_name") or name
        ops[label] = ops.get(label, 0.0) + e["dur"]  # µs
    return ops


def rollup(ops):
    cats = {name: 0.0 for name, _ in CATEGORIES}
    cats["other"] = 0.0
    for name, dur in ops.items():
        for cat, pat in CATEGORIES:
            if pat.search(name):
                cats[cat] += dur
                break
        else:
            cats["other"] += dur
    return cats


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--B", type=int, default=32)
    p.add_argument("--L", type=int, default=512)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--train", action="store_true",
                   help="profile the training step instead of inference. "
                        "NOTE: ships dense label matrices (~40 MB/step H2D "
                        "at B=8) — production training uses compact spot "
                        "labels + steps_per_call batching (trainer.py), so "
                        "wall numbers here overstate per-step cost; use the "
                        "trainer's own throughput log for honest steps/s")
    p.add_argument("--logdir", default="/tmp/peneo_profile")
    p.add_argument("--backbone", default="lilt",
                   choices=["lilt", "layoutlmv3", "layoutlmv2"],
                   help="backbone family at base geometry (inference only; "
                        "--train stays LiLT). Visual families get a "
                        "synthetic page image, matching serving")
    p.add_argument("--no_image", action="store_true",
                   help="layoutlmv3/v2: run text-only (no visual tokens)")
    args = p.parse_args()

    import time

    import jax
    import jax.numpy as jnp

    import bench as bench_mod
    from peneo_tpu.config import (LayoutLMv2Config, LayoutLMv3Config,
                                  LiltConfig, PEneoConfig)
    from peneo_tpu.models.peneo import PEneoModel

    if args.backbone == "layoutlmv3":
        bb_name, bb_cfg = "layoutlmv3-base-chinese", LayoutLMv3Config(
            vocab_size=250002, max_position_embeddings=args.L + 8,
            pad_token_id=1,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    elif args.backbone == "layoutlmv2":
        bb_name, bb_cfg = "layoutxlm-base", LayoutLMv2Config(
            vocab_size=250002, max_position_embeddings=args.L + 8,
            pad_token_id=1,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    else:
        bb_name, bb_cfg = "lilt-infoxlm-base", LiltConfig(
            vocab_size=250002, max_position_embeddings=args.L + 8,
            pad_token_id=1, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0)
    if args.train and args.backbone != "lilt":
        p.error("--train profiling supports --backbone lilt only")
    # serving auto-enables the fused kernels + int8 pair head only on a real
    # TPU (pipeline/infer.py); mirror that gate so the profile matches what
    # bench.py/bench_serving.py time on every backend (off-TPU the fused
    # kernels would run in slow interpret mode and skew the profile)
    on_tpu = jax.default_backend() == "tpu"
    kernel_flags = {} if args.train or not on_tpu else dict(
        use_fused_biacm=(args.backbone == "lilt"),
        use_fused_bias_attention=(args.backbone != "lilt"),
        quantize_pair_head="int8",
    )
    cfg = PEneoConfig(
        backbone_name=bb_name,
        backbone_config=bb_cfg.to_dict(),
        max_seq_len=args.L,
        **kernel_flags,
    )
    model = PEneoModel(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    ids, bbox, attn = bench_mod._inputs(rng, args.B, seq_len=args.L)
    image = None
    if args.backbone != "lilt" and not args.no_image:
        s = bb_cfg.input_size
        image = rng.standard_normal((args.B, 3, s, s)).astype(np.float32)
    params = bench_mod._random_params(model, ids, bbox, attn, image=image)

    if args.train:
        from peneo_tpu.data.tagging import batch_spots_to_matrix
        from peneo_tpu.pipeline import train as T

        Ld = args.L - 1
        labels = {}
        for name in ("line_extraction", "ent_linking_h2h", "ent_linking_t2t",
                     "line_grouping_h2h", "line_grouping_t2t"):
            spots = [[(int(i), int(rng.integers(i, Ld)), 1)
                      for i in rng.integers(0, Ld, 8)]
                     for _ in range(args.B)]
            labels[name] = batch_spots_to_matrix(spots, Ld)
        batch = {"input_ids": ids, "bbox": bbox, "attention_mask": attn,
                 "labels": labels}
        opt = T.make_optimizer(None, lr=1e-4, total_steps=100)
        state = T.create_train_state(cfg, model, opt, batch, params=params)
        step = T.jit_train_step(model, opt)

        def run():
            nonlocal state
            state, m = step(state, batch)
            return float(jax.device_get(m["total"]))
    else:
        fwd = bench_mod.build_forward(model, with_image=image is not None)
        img_d = (None if image is None
                 else jnp.asarray(image, jnp.bfloat16))

        def run():
            if img_d is not None:
                return jax.device_get(fwd(params, ids, bbox, attn, img_d))
            return jax.device_get(fwd(params, ids, bbox, attn))

    run()  # compile
    run()  # warmup

    os.makedirs(args.logdir, exist_ok=True)
    jax.profiler.start_trace(args.logdir)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        run()
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()

    pages = args.B * args.iters
    print(f"wall: {wall * 1e3:.1f} ms for {args.iters} iters "
          f"({pages / wall:.1f} pages/s)")
    if args.backbone == "lilt":
        flops = analytic_flops_per_page(args.L) * pages
    else:
        grid = bb_cfg.input_size // bb_cfg.patch_size \
            if args.backbone == "layoutlmv3" \
            else int(bb_cfg.image_feature_pool_shape[0])
        n_vis = (grid * grid + 1 if args.backbone == "layoutlmv3"
                 else grid * grid) if image is not None else 0
        flops = analytic_flops_single_stream(args.L, n_vis) * pages
    if args.train:
        flops *= 3  # fwd + backward ≈ 3× fwd FLOPs
    achieved = flops / wall
    print(f"analytic: {flops / pages / 1e9:.1f} GFLOP/page → achieved "
          f"{achieved / 1e12:.1f} TFLOP/s = "
          f"{achieved / V5E_PEAK_BF16 * 100:.1f}% of v5e bf16 peak")

    try:
        ops = parse_trace(args.logdir)
    except FileNotFoundError as e:
        print(f"trace parse failed: {e}")
        return
    total = sum(ops.values())
    print(f"\ndevice op time: {total / 1e3:.1f} ms total")
    for cat, dur in sorted(rollup(ops).items(), key=lambda kv: -kv[1]):
        print(f"  {cat:16s} {dur / 1e3:9.1f} ms  {dur / total * 100:5.1f}%")
    print("\ntop ops:")
    for name, dur in sorted(ops.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {dur / 1e3:9.1f} ms  {name[:100]}")


if __name__ == "__main__":
    main()
