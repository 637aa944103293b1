#!/usr/bin/env python
"""AOT-compile the serving forward and print its TPU HBM footprint.

Compiles (never executes) the exact bench.py forward through the axon
remote-compile service and reports ``memory_analysis()`` + wall compile
time — a ~15 s answer to "does this geometry fit / what did that change do
to program HBM" that a 900 s bench run can't give when it OOMs.

Round-5 origin: the static-rel-bucket change (models/layoutlmv3.py
static_rel_pos_bucket) OOMed the v3 bench at L=512 B=32 / L=2048 B=4 —
configs that fit in round 4. Probing four bias formulations here showed the
single-gather ``table[bucket][None]`` variant materializes the broadcast
fp32 bias (15.56G program) while a batched gather over the same static
bucket constant fuses like the dynamic path (10.83G, = round 4); the
batched gather is what ships (docs §8).

  python tools/probe_hbm.py --backbone layoutlmv3 --L 512 --B 32
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def probe(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _inputs, _random_params, build_forward
    from peneo_tpu.config import (LayoutLMv2Config, LayoutLMv3Config,
                                  PEneoConfig)
    from peneo_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # probe compiles then warm the bench/serving runs

    if args.backbone == "layoutlmv3":
        bb_name = "layoutlmv3-base"
        bb_cfg = LayoutLMv3Config(hidden_dropout_prob=0.0,
                                  attention_probs_dropout_prob=0.0)
    else:
        bb_name = "layoutlmv2-base-uncased"
        bb_cfg = LayoutLMv2Config(hidden_dropout_prob=0.0,
                                  attention_probs_dropout_prob=0.0)
    cfg = PEneoConfig(
        backbone_name=bb_name, backbone_config=bb_cfg.to_dict(),
        max_seq_len=args.L,
        use_fused_bias_attention=True,
        quantize_pair_head="int8",
        spot_streaming=False,
    )
    from peneo_tpu.models.peneo import PEneoModel
    model = PEneoModel(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    ids, bbox, attn = _inputs(rng, args.B, seq_len=args.L)
    s = bb_cfg.input_size
    image = rng.standard_normal((args.B, 3, s, s)).astype(np.float32)
    params = _random_params(model, ids, bbox, attn, image=image)
    fwd = build_forward(model, with_image=True)

    t0 = time.perf_counter()
    try:
        lowered = fwd.lower(params, jnp.asarray(ids.astype(np.int32)),
                            jnp.asarray(bbox.astype(np.int32)),
                            jnp.asarray(attn.astype(np.int32)),
                            jnp.asarray(image, jnp.bfloat16))
        t_lower = time.perf_counter() - t0
        compiled = lowered.compile()
        t_total = time.perf_counter() - t0
        mem = compiled.memory_analysis()
        out = {"backbone": args.backbone, "L": args.L, "B": args.B,
               "ok": True, "lower_s": round(t_lower, 1),
               "compile_s": round(t_total - t_lower, 1)}
        for key in ("temp_size_in_bytes", "argument_size_in_bytes",
                    "output_size_in_bytes", "generated_code_size_in_bytes"):
            try:
                out[key] = int(getattr(mem, key))
            except Exception:
                pass
        if "temp_size_in_bytes" in out:
            out["temp_gb"] = round(out["temp_size_in_bytes"] / 2**30, 2)
    except Exception as e:  # OOM text carries the breakdown
        msg = str(e)
        t_total = time.perf_counter() - t0
        head = [ln for ln in msg.splitlines()
                if "hbm" in ln.lower() or "Used" in ln][:4]
        out = {"backbone": args.backbone, "L": args.L, "B": args.B,
               "ok": False, "compile_s": round(t_total, 1),
               "error": " | ".join(head) or msg[:300]}
    print(json.dumps(out), flush=True)
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--backbone", default="layoutlmv3",
                   choices=["layoutlmv3", "layoutlmv2"])
    p.add_argument("--L", type=int, default=512)
    p.add_argument("--B", type=int, default=32)
    args = p.parse_args(argv)
    probe(args)


if __name__ == "__main__":
    main()
