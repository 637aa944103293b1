#!/usr/bin/env python
"""On-TPU validation + micro-bench of the fused rel-bias attention kernel.

The CPU test suite (tests/test_bias_attention.py) runs the kernel in
interpret mode only, which does not exercise Mosaic's lowering constraints
(tiling, VMEM budgeting). This tool closes that gap on hardware for the
LayoutLMv3/v2 serving shapes:

  A. Parity vs the XLA einsum reference at the aligned point (L=512,
     tile_q=128) and at the padded serving points the visual families
     actually hit — v3: L_text+197 = 709 → pad 768, tile 64;
     v2: L_text+49 = 561 → pad 576, tile 64 (ops/bias_attention.py
     ``maybe_fused_ctx``).
  B. Micro-bench fused vs XLA at those shapes (bf16 q/k/v, fp32 bias —
     the per-layer hot op of modeling_layoutlmv3.py:678-809).

Timing hard-syncs by fetching outputs to host every iteration (the axon
tunnel under-reports with block_until_ready; docs/documentation.md §8).
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def xla_ref(q, k, v, bias, mask, scale):
    import jax.numpy as jnp

    s = jnp.einsum("bhld,bhmd->bhlm", q, k).astype(jnp.float32)
    s = s * scale + bias + mask[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhlm,bhmd->bhld", p, v)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--B", type=int, default=8)
    p.add_argument("--nh", type=int, default=12)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--L", type=int, action="append", default=None,
                   help="raw serving lengths (default: 512, 709, 561)")
    args = p.parse_args()
    Ls = args.L or [512, 709, 561]

    global jax
    import jax
    import jax.numpy as jnp

    from peneo_tpu.ops.bias_attention import maybe_fused_ctx

    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    B, nh, d = args.B, args.nh, args.d
    scale = 1.0 / d ** 0.5

    for L in Ls:
        q = jnp.asarray(rng.standard_normal((B, L, nh, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, L, nh, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, L, nh, d)), jnp.bfloat16)
        bias = jnp.asarray(rng.standard_normal((B, nh, L, L)), jnp.float32)
        # realistic padding: last 5% of keys masked out
        maskv = np.zeros((B, L), np.float32)
        maskv[:, int(L * 0.95):] = -1e9
        attn_bias = jnp.asarray(maskv)[:, None, None, :]

        fused = jax.jit(lambda q, k, v, b, m: maybe_fused_ctx(
            q, k, v, b, m, scale, deterministic=True, dropout_p=0.0))
        ref = jax.jit(lambda q, k, v, b, m: xla_ref(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), b, m.reshape(B, L), scale
        ).transpose(0, 2, 1, 3).reshape(B, L, nh * d))

        out_f = jax.device_get(fused(q, k, v, bias, attn_bias))
        out_r = jax.device_get(ref(q, k, v, bias, attn_bias))
        # compare only unmasked key-influenced rows (all rows see real keys)
        diff = np.abs(out_f.astype(np.float32) - out_r.astype(np.float32))
        denom = np.abs(out_r.astype(np.float32)).max()
        print(f"L={L}: pad_to={-(-L // 64) * 64} "
              f"max_abs_diff={diff.max():.5f} (ref_max={denom:.2f}) "
              f"rel={diff.max() / max(denom, 1e-6):.2e}")

        def bench(fn, name):
            jax.device_get(fn(q, k, v, bias, attn_bias))
            t0 = time.perf_counter()
            pend = fn(q, k, v, bias, attn_bias)
            for _ in range(args.iters - 1):
                nxt = fn(q, k, v, bias, attn_bias)
                jax.device_get(pend)
                pend = nxt
            jax.device_get(pend)
            dt = (time.perf_counter() - t0) / args.iters * 1e3
            print(f"  {name}: {dt:.3f} ms/call")
            return dt

        tf = bench(fused, f"fused (L={L})")
        tr = bench(ref, f"xla   (L={L})")
        print(f"  speedup: {tr / tf:.2f}x")


if __name__ == "__main__":
    main()
