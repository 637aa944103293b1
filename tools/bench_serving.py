#!/usr/bin/env python
"""End-to-end serving benchmark: OCR JSON → InferenceService.run → kv JSON.

Measures the real deployment path (reference: deploy/inference.py's
avg-sec/sample log, deploy/inference.py:459-462) — preprocess (tokenize,
sort, pad) in the thread pool, the jitted forward, device→host spot
transfer, and the host chain-walk decode — on synthetic pages with the
full-size LiLT geometry and the toy tokenizer (no hub access needed).

Usage (TPU host):
    python tools/bench_serving.py [--pages 256] [--batch 32] [--L 512]
                                  [--workers 4] [--profile_host]
"""

import argparse
import json
import os
import random
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_assets(root: str, pages: int, L: int, lines_per_page,
                 backbone: str = "lilt"):
    import numpy as np
    from PIL import Image

    import jax
    import jax.numpy as jnp

    from peneo_tpu.config import (LayoutLMv2Config, LayoutLMv3Config,
                                  LiltConfig, PEneoConfig)
    from peneo_tpu.data.synthetic import ToyTokenizer, make_document, render_page
    from peneo_tpu.models.peneo import PEneoModel
    from peneo_tpu.pipeline.checkpoint import save_params_msgpack

    tok = ToyTokenizer()
    wdir = os.path.join(root, "weights")
    os.makedirs(wdir, exist_ok=True)
    # base geometry for every family (the dataclass defaults); the visual
    # families exercise the real serving path — host image decode+resize in
    # preprocess, patch/ResNeXt tower + rel-bias attention on device
    if backbone == "layoutlmv3":
        bb_name, bb_cfg = "layoutlmv3-base-chinese", LayoutLMv3Config(
            vocab_size=tok.vocab_size, max_position_embeddings=L + 8,
            pad_token_id=1)
    elif backbone == "layoutlmv2":
        bb_name, bb_cfg = "layoutxlm-base", LayoutLMv2Config(
            vocab_size=tok.vocab_size, max_position_embeddings=L + 8,
            pad_token_id=1)
    else:
        bb_name, bb_cfg = "lilt-infoxlm-base", LiltConfig(
            vocab_size=tok.vocab_size, max_position_embeddings=L + 8)
    cfg = PEneoConfig(
        backbone_name=bb_name,
        backbone_config=bb_cfg.to_dict(),
        max_seq_len=L,
    )
    cfg.save_pretrained(wdir)
    tok.save_pretrained(wdir)  # --keep_dir assets serve via deploy/inference.py too
    model = PEneoModel(cfg, dtype=jnp.float32)
    ids = np.ones((1, L), np.int32)
    image = None
    if backbone != "lilt":
        s = bb_cfg.input_size
        image = np.zeros((1, 3, s, s), np.float32)
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), ids,
                           np.zeros((1, L, 4), np.int32), ids,
                           image=image, deterministic=True)["params"])
    rng = np.random.default_rng(0)
    params = jax.tree_util.tree_map(
        lambda s: (rng.normal(0, 0.02, s.shape) * 1.0).astype(s.dtype),
        params)
    save_params_msgpack(params, os.path.join(wdir, "params.msgpack"))

    img_dir = os.path.join(root, "images")
    ocr_dir = os.path.join(root, "ocr")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ocr_dir, exist_ok=True)
    prng = random.Random(7)
    # render a handful of distinct pages and alias the rest (PIL open cost
    # is still paid per page; content variety doesn't affect the math).
    # ``lines_per_page`` may be a list (mixed-length corpus): densities
    # cycle across pages so the bucketed runner sees a realistic spread.
    densities = (list(lines_per_page)
                 if isinstance(lines_per_page, (list, tuple))
                 else [lines_per_page])
    base = []
    for i in range(min(pages, max(16, 4 * len(densities)))):
        lines = densities[i % len(densities)]
        doc = make_document(prng, f"b{i}.png", n_pairs=max(1, lines // 2),
                            n_noise=2)
        img = Image.fromarray(render_page(doc))
        ocr = [{"text": ln["text"], "bbox": ln["bbox"]}
               for e in doc["entities"] for ln in e["lines"]]
        base.append((img, ocr))
    for i in range(pages):
        img, ocr = base[i % len(base)]
        img.save(os.path.join(img_dir, f"p{i:04d}.png"))
        with open(os.path.join(ocr_dir, f"p{i:04d}.json"), "w") as f:
            json.dump(ocr, f)
    return wdir, img_dir, ocr_dir, tok


def main(argv=None):
    p = argparse.ArgumentParser()
    # 256 pages averages out the remote-TPU tunnel's ±5-10% variance
    # (shorter runs report the noisier number — CLAUDE.md / docs §8)
    p.add_argument("--pages", type=int, default=256)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--L", type=int, default=512)
    p.add_argument("--lines_per_page", type=int, default=24)
    p.add_argument("--mixed_lines", type=str, default=None,
                   help="comma-separated line densities cycled across pages "
                        "(e.g. '4,10,24') — a mixed-length corpus for "
                        "--bucket_lengths runs; overrides --lines_per_page")
    p.add_argument("--bucket_lengths", type=str, default=None,
                   help="comma-separated sequence-length buckets; pages pad "
                        "only to the smallest covering bucket instead of L "
                        "(InferenceService bucket_lengths)")
    p.add_argument("--backbone", default="lilt",
                   choices=["lilt", "layoutlmv3", "layoutlmv2"],
                   help="backbone family at base geometry; the visual "
                        "families measure the full serving path incl. host "
                        "image decode+resize and the visual tower")
    p.add_argument("--no_raw_image", action="store_true",
                   help="visual families: host-fp32 image loader instead of "
                        "the raw-uint8 + device-normalize serving default "
                        "(A/B hook)")
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--preprocess_procs", type=int, default=0,
                   help="preprocess in N spawned processes (GIL escape) "
                        "instead of --workers threads")
    p.add_argument("--int8_pair_head", action="store_true", default=None,
                   help="serve with the int8-quantized pair head (default "
                        "auto — ON for TPU, the serving default)")
    p.add_argument("--no_int8_pair_head", dest="int8_pair_head",
                   action="store_false",
                   help="force the exact-parity bf16 pair head")
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--sp", type=int, default=1)
    p.add_argument("--keep_dir", type=str, default=None,
                   help="reuse/keep assets here instead of a temp dir")
    p.add_argument("--profile_host", action="store_true",
                   help="cProfile the serving loop and print top host costs")
    p.add_argument("--inflight_depth", type=int, default=2,
                   help="batches kept in flight on the device (see "
                        "InferenceService.run)")
    args = p.parse_args(argv)

    root = args.keep_dir or tempfile.mkdtemp(prefix="peneo_serve_bench_")
    made = not (args.keep_dir and os.path.isdir(
        os.path.join(root, "weights")))
    lines = ([int(x) for x in args.mixed_lines.split(",")]
             if args.mixed_lines else args.lines_per_page)
    if made:
        wdir, img_dir, ocr_dir, _ = build_assets(
            root, args.pages, args.L, lines, backbone=args.backbone)
    else:
        wdir = os.path.join(root, "weights")
        img_dir = os.path.join(root, "images")
        ocr_dir = os.path.join(root, "ocr")

    from peneo_tpu.data.synthetic import ToyTokenizer
    from peneo_tpu.pipeline.infer import InferenceService

    buckets = ([int(b) for b in args.bucket_lengths.split(",")]
               if args.bucket_lengths else None)
    svc = InferenceService(wdir, tokenizer=ToyTokenizer(),
                           batch_size=args.batch, dtype="bfloat16",
                           dp=args.dp, tp=args.tp, sp=args.sp,
                           int8_pair_head=args.int8_pair_head,
                           bucket_lengths=buckets)
    if args.no_raw_image and svc.image_loader is not None:
        from peneo_tpu.data.image_processing import make_image_loader

        svc.raw_image = False
        svc.image_loader = make_image_loader(svc.cfg, raw=False)
    # warm the jit outside the timed run — one compile per bucket shape
    warm_img = os.path.join(img_dir, sorted(os.listdir(img_dir))[0])
    warm_ocr = os.path.join(ocr_dir, sorted(os.listdir(ocr_dir))[0])
    if svc.bucket_lengths:
        import jax as _jax

        page = svc.preprocess_page(warm_img, warm_ocr)
        for b in svc.bucket_lengths:
            _jax.device_get(svc.dispatch_batch([page], bucket=b))
    else:
        svc.run(warm_img, warm_ocr)

    prof = None
    if args.profile_host:
        import cProfile

        prof = cProfile.Profile()
        prof.enable()
    t0 = time.perf_counter()
    results = svc.run(img_dir, ocr_dir, workers=args.workers,
                      preprocess_procs=args.preprocess_procs,
                      inflight_depth=args.inflight_depth)
    dt = time.perf_counter() - t0
    if prof is not None:
        prof.disable()
        import pstats

        pstats.Stats(prof).sort_stats("cumulative").print_stats(25)
    n = len(results)
    tag = "" if args.backbone == "lilt" else f"_{args.backbone}"
    print(json.dumps({
        "metric": f"serving_pages_per_sec_e2e{tag}",
        "value": round(n / dt, 2),
        "unit": "pages/s",
        "pages": n,
        "batch": args.batch,
        "L": args.L,
        "workers": args.workers,
        "buckets": svc.bucket_lengths,
        "mixed_lines": args.mixed_lines,
    }))
    if args.keep_dir is None:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
