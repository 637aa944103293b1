#!/usr/bin/env python
"""Single-chip timing of the STACKED pair-head path: bf16 vs int8 weights.

The sequence-parallel serving path evaluates the five pair-head classifiers
from stacked weights inside a shard_map body (parallel/seq_parallel.py
sp_pair_spots) instead of the single-device module path
(models/decoder.PairBlockBank). Round 4 measured the module-path int8 win
(+6.9-9.1%, docs §8); this tool measures the same question for the stacked
formulation — sp>1 only changes WHERE the rows live, not the per-shard math,
so a single-chip sp=1 mesh times the exact kernel the sp shards run.

Mirrors serving (pipeline/infer.py:246-261): stacking + quantization happen
inside the jitted step from the fp32 decoder params (XLA folds them), a/b
combine features arrive in the model dtype (bf16), outputs are fetched to
host each iteration (hard sync — block_until_ready under-reports through
the axon tunnel, CLAUDE.md).

  python tools/bench_sp_pair.py --L 2048 --B 1 --iters 16
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--L", type=int, default=2048)
    p.add_argument("--B", type=int, default=1)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--hidden", type=int, default=768,
                   help="backbone hidden (pair features are hidden // 2)")
    p.add_argument("--k", type=int, default=256)
    args = p.parse_args(argv)

    from peneo_tpu.config import LiltConfig, PEneoConfig
    from peneo_tpu.models.decoder import HEAD_NAMES, PEneoDecoder
    from peneo_tpu.ops.pair_head import (stack_head_weights,
                                         stack_head_weights_int8)
    from peneo_tpu.parallel.seq_parallel import sp_pair_spots

    bb = LiltConfig(hidden_size=args.hidden).to_dict()
    cfg = PEneoConfig(backbone_name="lilt-infoxlm-base", backbone_config=bb,
                      max_spots_per_head=args.k, spot_topk="approx")
    dec = PEneoDecoder(cfg, dtype=jnp.bfloat16)
    params = dec.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 8, args.hidden), jnp.float32))["params"]

    H = args.hidden // 2
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((args.B, args.L, H)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((args.B, args.L, H)), jnp.bfloat16)
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:1]), ("sp",))

    results = {}
    for mode, stack in (("bf16", stack_head_weights),
                        ("int8", stack_head_weights_int8)):
        def step(p, a, b):
            w = stack(p, HEAD_NAMES, jnp.bfloat16)
            return sp_pair_spots(a, b, w, mesh, args.k, valid_len=args.L,
                                 topk_method=cfg.spot_topk)
        fn = jax.jit(step)
        out = jax.device_get(fn(params, a, b))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = jax.device_get(fn(params, a, b))
        dt = (time.perf_counter() - t0) / args.iters
        results[mode] = dt
        print(json.dumps({"mode": mode, "L": args.L, "B": args.B,
                          "ms_per_batch": round(dt * 1e3, 3),
                          "pages_per_s": round(args.B / dt, 3)}), flush=True)
    print(json.dumps({"L": args.L, "B": args.B,
                      "int8_speedup": round(results["bf16"]
                                            / results["int8"], 4)}),
          flush=True)


if __name__ == "__main__":
    main()
