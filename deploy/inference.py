#!/usr/bin/env python
"""PEneo-TPU inference CLI.

Mirrors the reference deploy/inference.py flag surface
(deploy/inference.py:467-491):

    python deploy/inference.py \
        --model_name_or_path /path/to/trained-model \
        --dir_image /path/to/images --dir_ocr /path/to/ocr_json \
        --dir_save /path/to/out.json [--dir_visualize viz/] [--score_thresh 0.5]

The deployment artifact is the jitted apply fn itself; no ONNX step.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_name_or_path", type=str, required=True)
    p.add_argument("--dir_image", type=str, required=True)
    p.add_argument("--dir_ocr", type=str, default=None,
                   help="line-level OCR JSON dir; omit with --apply_ocr")
    p.add_argument("--apply_ocr", action="store_true",
                   help="run tesseract OCR instead of reading OCR JSON")
    p.add_argument("--dir_save", type=str, default="inference_results.json")
    p.add_argument("--dir_visualize", type=str, default=None)
    p.add_argument("--score_thresh", type=float, default=0.0)
    p.add_argument("--max_seq_len", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=1,
                   help="pages per device forward (batch serving)")
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel chips (batch shards over the mesh)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel chips (Megatron-style kernel shards)")
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel chips (pair-grid rows sharded; "
                        "the long-context axis)")
    p.add_argument("--workers", type=int, default=4,
                   help="preprocess threads (4 measured best; more loses "
                        "to GIL contention)")
    p.add_argument("--decode_workers", type=int, default=2,
                   help="host-decode threads (kept off the dispatch thread)")
    p.add_argument("--inflight_depth", type=int, default=2,
                   help="batches kept in flight on the device; 2 absorbs "
                        "host GIL jitter that starves the chip at depth 1 "
                        "(+5-10%% e2e measured)")
    p.add_argument("--preprocess_procs", type=int, default=0,
                   help="preprocess in N spawned worker processes instead "
                        "of threads (escapes the GIL that caps the thread "
                        "pool; ~1 s spawn cost, wins on large directories)")
    p.add_argument("--no_fused_biacm", action="store_true",
                   help="disable the fused BiACM attention kernel (on by "
                        "default for LiLT on TPU; +7-8%% serving throughput)")
    p.add_argument("--fused_bias_attention", action="store_true",
                   default=None,
                   help="route LayoutLMv3/v2 attention through the fused "
                        "rel-bias kernel (ops/bias_attention; default auto "
                        "— ON for TPU backends, measured +17-25%% on v5e, "
                        "docs §8)")
    p.add_argument("--no_fused_bias_attention", dest="fused_bias_attention",
                   action="store_false",
                   help="force the stock XLA einsum attention path for "
                        "LayoutLMv3/v2")
    p.add_argument("--int8_pair_head", action="store_true", default=None,
                   help="quantize the pair head's dominant matmuls to int8 "
                        "(s8xs8->s32 on the MXU, 2x bf16 peak; default auto "
                        "— ON for TPU serving: +7-9%% measured, decoded F1 "
                        "bit-identical to bf16 on a trained checkpoint, "
                        "docs §8)")
    p.add_argument("--no_int8_pair_head", dest="int8_pair_head",
                   action="store_false",
                   help="force the exact-parity bf16 pair head")
    p.add_argument("--int8_backbone", action="store_true",
                   help="additionally quantize the backbone's projection/"
                        "MLP matmuls to int8 (all three text encoders; "
                        "the v2 conv tower stays full precision)")
    p.add_argument("--bucket_lengths", type=str, default=None,
                   help="comma-separated sequence-length buckets (e.g. "
                        "'128,256,384'); pages batch with same-bucket pages "
                        "and pad only to their bucket instead of "
                        "max_seq_len — the O(L^2) pair grid makes short "
                        "pages much cheaper. Multiples of 128 keep the "
                        "fused BiACM kernel engaged; max_seq_len is always "
                        "appended as the overflow bucket")
    args = p.parse_args(argv)

    from peneo_tpu.pipeline.infer import InferenceService

    service = InferenceService(
        args.model_name_or_path,
        max_seq_len=args.max_seq_len,
        batch_size=args.batch_size,
        dtype=args.dtype,
        score_thresh=args.score_thresh,
        dp=args.dp,
        tp=args.tp,
        sp=args.sp,
        fused_biacm=False if args.no_fused_biacm else None,
        fused_bias_attention=args.fused_bias_attention,
        int8_pair_head=args.int8_pair_head,
        int8_backbone=args.int8_backbone,
        bucket_lengths=[int(b) for b in args.bucket_lengths.split(",")]
        if args.bucket_lengths else None,
    )
    if not args.apply_ocr and args.dir_ocr is None:
        p.error("--dir_ocr is required unless --apply_ocr is set")
    results = service.run(args.dir_image, args.dir_ocr,
                          visualize_dir=args.dir_visualize,
                          workers=args.workers,
                          decode_workers=args.decode_workers,
                          preprocess_procs=args.preprocess_procs,
                          inflight_depth=args.inflight_depth)
    with open(args.dir_save, "w", encoding="utf-8") as f:
        json.dump(results, f, ensure_ascii=False, indent=1)
    print(f"[peneo] wrote {args.dir_save}")
    return results


if __name__ == "__main__":
    main()
