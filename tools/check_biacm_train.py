#!/usr/bin/env python
"""On-TPU validation + micro-bench of the trainable fused BiACM kernel.

The CPU test suite (tests/test_biacm_train.py) covers the math through the
explicit-bits dropout form; the in-kernel hardware-PRNG path only exists on
real TPU. This tool closes that gap on hardware:

  A. rate=0 forward + grads match the XLA einsum reference on-device.
  B. Hardware-PRNG determinism: the same scalar seed yields bit-identical
     outputs across calls (what makes fwd/bwd masks agree), different seeds
     yield different outputs.
  C. Dropout keep-rate statistics: with uniform attention (q=k=0) and
     all-ones values, each output element is keep_count/(L*(1-rate)), so
     its mean estimates keep_prob/(1-rate) ≈ 1. Checked at 4 sigma.
  D. Micro-bench fwd+bwd at the training geometry (B=8, nh=12, L=512,
     d=64/16, bf16) vs the XLA einsum path with two `nn.Dropout`-style
     rbg-drawn masks — the exact alternative inside the train step.

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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--B", type=int, default=8)
    p.add_argument("--nh", type=int, default=12)
    p.add_argument("--L", type=int, default=512)
    p.add_argument("--dt", type=int, default=64)
    p.add_argument("--dl", type=int, default=16)
    p.add_argument("--rate", type=float, default=0.1)
    p.add_argument("--iters", type=int, default=32)
    p.add_argument("--skip_bench", action="store_true")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_default_prng_impl", "rbg")  # trainer parity
    import jax.numpy as jnp

    from peneo_tpu.ops.biacm_attention import biacm_attention_train

    on_tpu = jax.default_backend() == "tpu"
    interp = not on_tpu
    B, nh, L, dt, dl = args.B, args.nh, args.L, args.dt, args.dl
    st, sl = 1.0 / dt ** 0.5, 1.0 / dl ** 0.5
    rng = np.random.default_rng(0)

    def t(*shape, dtype=jnp.bfloat16):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.5,
                           dtype=dtype)

    qt, kt, vt = t(B, nh, L, dt), t(B, nh, L, dt), t(B, nh, L, dt)
    ql, kl, vl = t(B, nh, L, dl), t(B, nh, L, dl), t(B, nh, L, dl)
    bias = np.zeros((B, L), np.float32)
    bias[0, L - 9:] = -1e9
    bias = jnp.asarray(bias)
    six = (qt, kt, vt, ql, kl, vl)

    def ref_fwd(qt, kt, vt, ql, kl, vl):
        s = (jnp.einsum("bhld,bhmd->bhlm", qt, kt,
                        preferred_element_type=jnp.float32) * st
             + jnp.einsum("bhld,bhmd->bhlm", ql, kl,
                          preferred_element_type=jnp.float32) * sl
             + bias[:, None, None, :])
        p = jax.nn.softmax(s, axis=-1).astype(qt.dtype)
        return (jnp.einsum("bhlm,bhmd->bhld", p, vt),
                jnp.einsum("bhlm,bhmd->bhld", p, vl))

    # ---- A: rate=0 fwd + grad parity on device ----------------------------
    seed0 = jnp.zeros((1,), jnp.int32)

    @jax.jit
    def fused0(*six):
        return biacm_attention_train(*six, bias, seed0, st, sl, rate=0.0,
                                     interpret=interp)

    ct, cl = jax.device_get(fused0(*six))
    rt, rl = jax.device_get(jax.jit(ref_fwd)(*six))
    err_t = np.abs(ct.astype(np.float32) - rt.astype(np.float32)).max()
    err_l = np.abs(cl.astype(np.float32) - rl.astype(np.float32)).max()
    assert err_t < 3e-2 and err_l < 3e-2, (err_t, err_l)  # bf16 tolerance

    wt, wl = t(B, nh, L, dt, dtype=jnp.float32), t(B, nh, L, dl,
                                                   dtype=jnp.float32)

    def loss_fused(*six):
        a, b = biacm_attention_train(*six, bias, seed0, st, sl, rate=0.0,
                                     interpret=interp)
        return (a.astype(jnp.float32) * wt).sum() + \
            (b.astype(jnp.float32) * wl).sum()

    def loss_ref(*six):
        a, b = ref_fwd(*six)
        return (a.astype(jnp.float32) * wt).sum() + \
            (b.astype(jnp.float32) * wl).sum()

    gk = jax.device_get(jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4,
                                                              5)))(*six))
    gr = jax.device_get(jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4,
                                                            5)))(*six))
    for a, b, name in zip(gk, gr, ["qt", "kt", "vt", "ql", "kl", "vl"]):
        a = a.astype(np.float32)
        b = b.astype(np.float32)
        scale = max(np.abs(b).max(), 1e-6)
        rel = np.abs(a - b).max() / scale
        assert rel < 5e-2, (name, rel)
    print("A. rate=0 fwd+grad parity vs XLA on device: OK "
          f"(fwd max err {max(err_t, err_l):.2e})")

    if on_tpu and args.rate > 0.0:
        # ---- B: seed determinism --------------------------------------
        @jax.jit
        def fused_drop(seed):
            return biacm_attention_train(*six, bias, seed, st, sl,
                                         rate=args.rate)

        o1 = jax.device_get(fused_drop(jnp.asarray([123], jnp.int32)))
        o2 = jax.device_get(fused_drop(jnp.asarray([123], jnp.int32)))
        o3 = jax.device_get(fused_drop(jnp.asarray([124], jnp.int32)))
        assert all(np.array_equal(a, b) for a, b in zip(o1, o2))
        assert not np.array_equal(o1[0], o3[0])
        print("B. hardware-PRNG seed determinism: OK")

        # ---- C: keep-rate statistics -----------------------------------
        z_t = jnp.zeros((B, nh, L, dt), jnp.bfloat16)
        z_l = jnp.zeros((B, nh, L, dl), jnp.bfloat16)
        ones_t = jnp.ones((B, nh, L, dt), jnp.bfloat16)
        ones_l = jnp.ones((B, nh, L, dl), jnp.bfloat16)

        @jax.jit
        def uniform_drop(seed):
            return biacm_attention_train(
                z_t, z_t, ones_t, z_l, z_l, ones_l,
                jnp.zeros((B, L), jnp.float32), seed, st, sl, rate=args.rate)

        a, b = jax.device_get(uniform_drop(jnp.asarray([7], jnp.int32)))
        n = a.size + b.size
        mean = (a.astype(np.float64).sum() + b.astype(np.float64).sum()) / n
        # each element ≈ Binomial(L, 1-rate)/(L(1-rate)); elements in one row
        # are identical → effective sample count is rows, not elements
        rows = 2 * B * nh * L
        sigma = np.sqrt(args.rate / (L * (1 - args.rate))) / np.sqrt(rows)
        dev = abs(mean - 1.0)
        assert dev < 4 * sigma + 5e-3, (mean, sigma)  # +bf16 quantization
        print(f"C. dropout keep-rate stats: OK (mean {mean:.5f}, "
              f"4sigma {4 * sigma:.5f} + bf16 slack)")
    else:
        print("B/C skipped (CPU or rate=0): hardware PRNG needs real TPU")

    if args.skip_bench:
        return

    # ---- D: fwd+bwd micro-bench vs XLA attention with rbg dropout ---------
    key = jax.random.PRNGKey(3)

    def xla_train_loss(qt, kt, vt, ql, kl, vl, key):
        s = (jnp.einsum("bhld,bhmd->bhlm", qt, kt,
                        preferred_element_type=jnp.float32) * st
             + jnp.einsum("bhld,bhmd->bhlm", ql, kl,
                          preferred_element_type=jnp.float32) * sl
             + bias[:, None, None, :])
        pr = jax.nn.softmax(s, axis=-1).astype(qt.dtype)
        if args.rate > 0.0:
            k1, k2 = jax.random.split(key)
            keep = 1.0 - args.rate
            m1 = jax.random.bernoulli(k1, keep, pr.shape)
            m2 = jax.random.bernoulli(k2, keep, pr.shape)
            p1 = jnp.where(m1, pr / keep, 0).astype(qt.dtype)
            p2 = jnp.where(m2, pr / keep, 0).astype(qt.dtype)
        else:
            p1 = p2 = pr
        a = jnp.einsum("bhlm,bhmd->bhld", p1, vt)
        b = jnp.einsum("bhlm,bhmd->bhld", p2, vl)
        return (a.astype(jnp.float32) * wt).sum() + \
            (b.astype(jnp.float32) * wl).sum()

    def fused_train_loss(qt, kt, vt, ql, kl, vl, seed):
        a, b = biacm_attention_train(qt, kt, vt, ql, kl, vl, bias, seed,
                                     st, sl, rate=args.rate, interpret=interp)
        return (a.astype(jnp.float32) * wt).sum() + \
            (b.astype(jnp.float32) * wl).sum()

    # chain K grad evaluations on-device inside one jit (output feeds the
    # next input so nothing is DCE'd) and fetch ONE scalar at the end —
    # per-call D2H over the tunnel would otherwise dominate the timing
    def chained(grad_fn, mix_rng):
        def call(k):
            def body(carry, i):
                g = grad_fn(*carry, mix_rng(i))
                nxt = tuple(q + 1e-6 * d.astype(q.dtype)
                            for q, d in zip(carry, g))
                return nxt, ()
            out, _ = jax.lax.scan(body, six, jnp.arange(k))
            return sum(o.astype(jnp.float32).sum() for o in out)
        return jax.jit(call, static_argnums=0)

    xla_g = chained(jax.grad(xla_train_loss, argnums=(0, 1, 2, 3, 4, 5)),
                    lambda i: jax.random.fold_in(key, i))
    fus_g = chained(jax.grad(fused_train_loss, argnums=(0, 1, 2, 3, 4, 5)),
                    lambda i: jnp.asarray([5], jnp.int32) + i)

    def bench(fn):
        jax.device_get(fn(args.iters))  # compile + run
        t0 = time.perf_counter()
        jax.device_get(fn(args.iters))
        return (time.perf_counter() - t0) / args.iters * 1e3

    ms_xla = bench(xla_g)
    ms_fus = bench(fus_g)
    print(f"D. fwd+bwd one layer, B={B} nh={nh} L={L} rate={args.rate}: "
          f"XLA+rbg {ms_xla:.3f} ms  fused-train {ms_fus:.3f} ms  "
          f"({ms_xla / ms_fus:.2f}x)")


if __name__ == "__main__":
    main()
