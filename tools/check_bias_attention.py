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

``--train`` instead validates + benches the custom-VJP TRAIN pair
(bias_attention_train): value_and_grad wrt (q, k, v, bias) — the dbias
output is the structural novelty — fused vs the XLA reference, with
in-kernel hardware-PRNG dropout at ``--rate`` (parity is only asserted at
rate 0; dropout draws a different stream than the XLA path by design).

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
    p.add_argument("--train", action="store_true",
                   help="validate + bench the custom-VJP train pair "
                        "(value_and_grad incl. dbias) instead of inference")
    p.add_argument("--rate", type=float, default=0.1,
                   help="attention dropout for the --train bench leg "
                        "(parity leg always runs rate 0)")
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

    if args.train:
        return train_main(args, Ls)

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


def train_main(args, Ls):
    import jax
    import jax.numpy as jnp

    from peneo_tpu.ops.bias_attention import maybe_fused_ctx_train

    rng = np.random.default_rng(0)
    B, nh, d = args.B, args.nh, args.d
    scale = 1.0 / d ** 0.5

    for L in Ls:
        q = jnp.asarray(rng.standard_normal((B, L, nh, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, L, nh, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, L, nh, d)), jnp.bfloat16)
        bias = jnp.asarray(rng.standard_normal((B, nh, L, L)), jnp.float32)
        maskv = np.zeros((B, L), np.float32)
        maskv[:, int(L * 0.95):] = -1e9
        attn_bias = jnp.asarray(maskv)[:, None, None, :]
        w = jnp.asarray(rng.standard_normal((B, L, nh * d)), jnp.bfloat16)
        seed0 = jnp.zeros((1,), jnp.int32)
        seed1 = jnp.asarray([12345], jnp.int32)

        def make_loss(rate, seed):
            def loss(q_, k_, v_, b_):
                ctx = maybe_fused_ctx_train(q_, k_, v_, b_, attn_bias,
                                            scale, rate=rate, seed=seed)
                assert ctx is not None, "train gate bailed"
                return (ctx.astype(jnp.float32)
                        * w.astype(jnp.float32)).sum()
            return loss

        def ref_loss(q_, k_, v_, b_):
            s = jnp.einsum("blhd,bmhd->bhlm", q_, k_).astype(jnp.float32)
            s = s * scale + b_ + attn_bias
            p = jax.nn.softmax(s, axis=-1).astype(q_.dtype)
            ctx = jnp.einsum("bhlm,bmhd->blhd", p, v_).reshape(B, L, nh * d)
            return (ctx.astype(jnp.float32) * w.astype(jnp.float32)).sum()

        vg_fused = jax.jit(jax.value_and_grad(make_loss(0.0, seed0),
                                              argnums=(0, 1, 2, 3)))
        vg_ref = jax.jit(jax.value_and_grad(ref_loss, argnums=(0, 1, 2, 3)))

        vf, gf = jax.device_get(vg_fused(q, k, v, bias))
        vr, gr = jax.device_get(vg_ref(q, k, v, bias))
        for a, b, name in zip(gf, gr, ["dq", "dk", "dv", "dbias"]):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            denom = max(np.abs(b).max(), 1e-6)
            print(f"L={L} {name}: max_abs_diff={np.abs(a - b).max():.4f} "
                  f"rel={np.abs(a - b).max() / denom:.2e}")

        def bench(fn, name, *a):
            jax.device_get(fn(*a))
            import time as _t
            t0 = _t.perf_counter()
            pend = fn(*a)
            for _ in range(args.iters - 1):
                nxt = fn(*a)
                jax.device_get(pend)
                pend = nxt
            jax.device_get(pend)
            dt = (_t.perf_counter() - t0) / args.iters * 1e3
            print(f"  {name}: {dt:.3f} ms/call")
            return dt

        # bench with dropout active (the real training config)
        vg_fused_drop = jax.jit(jax.value_and_grad(
            make_loss(args.rate, seed1), argnums=(0, 1, 2, 3)))

        def ref_drop(q_, k_, v_, b_, key):
            def loss(q2, k2, v2, b2):
                s = jnp.einsum("blhd,bmhd->bhlm", q2, k2).astype(jnp.float32)
                s = s * scale + b2 + attn_bias
                p = jax.nn.softmax(s, axis=-1).astype(q2.dtype)
                keep = jax.random.bernoulli(key, 1.0 - args.rate, p.shape)
                p = jnp.where(keep, p / (1.0 - args.rate), 0.0).astype(q2.dtype)
                ctx = jnp.einsum("bhlm,bmhd->blhd", p,
                                 v2).reshape(B, L, nh * d)
                return (ctx.astype(jnp.float32)
                        * w.astype(jnp.float32)).sum()
            return jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
                q_, k_, v_, b_)

        vg_ref_drop = jax.jit(ref_drop)
        key = jax.random.PRNGKey(3)

        tf = bench(vg_fused_drop, f"fused train fwd+bwd (L={L}, "
                   f"rate={args.rate})", q, k, v, bias)
        tr = bench(lambda *a: vg_ref_drop(*a, key),
                   f"xla   train fwd+bwd (L={L}, rate={args.rate})",
                   q, k, v, bias)
        print(f"  speedup: {tr / tf:.2f}x")


if __name__ == "__main__":
    main()
