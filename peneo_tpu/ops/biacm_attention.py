"""Pallas TPU kernel: fused BiACM (dual-stream) attention for LiLT.

The reference's BiACM couples the text (head_dim 64) and layout (head_dim
16) streams by SUMMING their attention scores, then applies the shared
probabilities to each stream's values (reference:
model/backbone/lilt/modeling_lilt.py:328-425). The stock flash-attention
kernel forces the two streams to be concatenated into head_dim 80, which
pads to 128 MXU lanes — measured 8% slower end-to-end (docs §8). This
kernel keeps the streams separate (both MXU-aligned contractions) and
shares one softmax:

    s   = (q_t·k_tᵀ)/√d_t + (q_l·k_lᵀ)/√d_l + bias      (TQ, L) fp32
    p   = softmax(s)
    ctx_t = p·v_t   (TQ, d_t);   ctx_l = p·v_l   (TQ, d_l)

Per grid cell (batch, head, query-tile) the FULL key/value rows live in
VMEM (at L=4096 that is ~2.6 MB for both streams in bf16), so the (L, L)
score/prob tensors never round-trip HBM — the XLA path writes + re-reads
them several times per layer. No online-softmax pass is needed at these
lengths; the (TQ, L) fp32 score tile peaks at 2 MB.

``biacm_attention`` is the inference kernel (no dropout, no VJP).
``biacm_attention_train`` is the training variant: a ``jax.custom_vjp``
pair of kernels with attention dropout generated INSIDE the forward and
backward kernels by the TPU hardware PRNG (`pltpu.prng_*`), so neither the
(L, L) probability tensors nor the two (B, nh, L, L) dropout masks ever
touch HBM. The backward recomputes scores/softmax flash-style per query
tile and accumulates dk/dv across the (sequential) query-tile grid axis.
Dropout draws a DIFFERENT stream than flax's `nn.Dropout` — statistically
identical, same precedent as the trainer's `rbg` switch (docs §8); the
per-(batch, head, tile) seeds derive from one scalar seed input, so remat
replays are bit-identical. On CPU the hardware PRNG does not exist even in
interpret mode: pass ``bits_in`` (explicit mask bits) instead — the tests
use that to cross-check the kernels against a plain-JAX reference.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(qt_ref, kt_ref, vt_ref, ql_ref, kl_ref, vl_ref, bias_ref,
            ct_ref, cl_ref, *, scale_t: float, scale_l: float):
    qt = qt_ref[0, 0]
    kt = kt_ref[0, 0]
    ql = ql_ref[0, 0]
    kl = kl_ref[0, 0]
    s_t = jax.lax.dot_general(qt, kt, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    s_l = jax.lax.dot_general(ql, kl, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    # bias block is (1, 1, L); [0] yields (1, L), broadcasting over rows
    s = s_t * scale_t + s_l * scale_l + bias_ref[0]
    mx = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - mx)
    p = (e / e.sum(axis=-1, keepdims=True)).astype(qt_ref.dtype)
    ct_ref[0, 0] = jnp.dot(p, vt_ref[0, 0],
                           preferred_element_type=jnp.float32).astype(
        qt_ref.dtype)
    cl_ref[0, 0] = jnp.dot(p, vl_ref[0, 0],
                           preferred_element_type=jnp.float32).astype(
        qt_ref.dtype)


def biacm_attention(
    q_t: jnp.ndarray,   # (B, nh, L, d_t)
    k_t: jnp.ndarray,
    v_t: jnp.ndarray,
    q_l: jnp.ndarray,   # (B, nh, L, d_l)
    k_l: jnp.ndarray,
    v_l: jnp.ndarray,
    bias: jnp.ndarray,  # (B, L) additive key mask, fp32 (0 or large-neg)
    scale_t: float,
    scale_l: float,
    tile_q: int = 128,
    interpret: bool = False,
):
    """Returns (ctx_t (B, nh, L, d_t), ctx_l (B, nh, L, d_l))."""
    B, nh, L, dt = q_t.shape
    dl = q_l.shape[-1]
    assert L % tile_q == 0, (L, tile_q)
    grid = (B, nh, L // tile_q)

    def q_spec(d):
        return pl.BlockSpec((1, 1, tile_q, d), lambda b, h, i: (b, h, i, 0),
                            memory_space=pltpu.VMEM)

    def kv_spec(d):
        return pl.BlockSpec((1, 1, L, d), lambda b, h, i: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)

    import functools

    kernel = functools.partial(_kernel, scale_t=float(scale_t),
                               scale_l=float(scale_l))
    flops = 2 * B * nh * L * L * (dt + dl) * 2
    cp = _compiler_params(_vmem_bytes(L, tile_q, dt, dl,
                                      q_t.dtype.itemsize, False))
    return pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=cp,
        in_specs=[
            q_spec(dt), kv_spec(dt), kv_spec(dt),
            q_spec(dl), kv_spec(dl), kv_spec(dl),
            # (B, 1, L) with a full (1, 1, L) block: TPU lowering requires
            # the last two block dims divisible by (8, 128) OR equal to the
            # array dims — a (1, L) block over (B, L) violates that (real
            # Mosaic rejects it; interpret mode does not check)
            pl.BlockSpec((1, 1, L), lambda b, h, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[q_spec(dt), q_spec(dl)],
        out_shape=[
            jax.ShapeDtypeStruct((B, nh, L, dt), q_t.dtype),
            jax.ShapeDtypeStruct((B, nh, L, dl), q_t.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(q_t.size + k_t.size + v_t.size) * 2 * 2,
            transcendentals=B * nh * L * L),
        interpret=interpret,
    )(q_t, k_t, v_t, q_l, k_l, v_l, bias[:, None, :])


def _dp_tp(mesh) -> int:
    return mesh.shape.get("dp", 1) * mesh.shape.get("tp", 1)


def biacm_attention_sharded(
    q_t, k_t, v_t, q_l, k_l, v_l, bias, scale_t, scale_l, *,
    mesh, tile_q: int = 128, interpret: bool = False,
):
    """``biacm_attention`` under a (dp, tp[, sp]) mesh via ``shard_map``.

    GSPMD cannot partition a ``pallas_call`` (it would all-gather the
    operands around the custom call), but attention is independent per
    (batch, head): shard_map splits the batch over ``dp`` and the heads
    over ``tp`` and runs the kernel on each chip's local block with zero
    collectives. Axes the specs do not mention (``sp``) replicate the
    computation, matching the backbone's replicated-over-sp design
    (parallel/seq_parallel.py)."""
    from jax.sharding import PartitionSpec as P

    B, nh = q_t.shape[:2]
    dp = mesh.shape.get("dp", 1)
    tp = mesh.shape.get("tp", 1)
    assert B % dp == 0 and nh % tp == 0, (B, nh, dp, tp)
    d_ax = "dp" if "dp" in mesh.axis_names else None
    t_ax = "tp" if "tp" in mesh.axis_names else None
    spec = P(d_ax, t_ax, None, None)

    def local(qt, kt, vt, ql, kl, vl, b):
        return biacm_attention(qt, kt, vt, ql, kl, vl, b, scale_t, scale_l,
                               tile_q=tile_q, interpret=interpret)

    return jax.shard_map(
        local, mesh=mesh, in_specs=(spec,) * 6 + (P(d_ax, None),),
        out_specs=(spec, spec), check_vma=False,
    )(q_t, k_t, v_t, q_l, k_l, v_l, bias)


def biacm_attention_train_sharded(
    q_t, k_t, v_t, q_l, k_l, v_l, bias, seed, scale_t, scale_l, *,
    mesh, rate: float = 0.0, tile_q: int = 128, interpret: bool = False,
):
    """``biacm_attention_train`` under a (dp, tp[, sp]) mesh via shard_map.

    Differentiation passes through shard_map into the custom VJP; the
    backward kernel runs per-shard with the same specs. The scalar dropout
    seed is decorrelated per (dp, tp) shard — each shard's kernel grid
    restarts its cell indices at 0, so without the offset two dp shards
    would draw IDENTICAL masks for different pages. ``sp`` shards keep the
    same seed on purpose: the backbone is replicated across sp and every
    sp chip must draw the same masks to stay consistent."""
    from jax.sharding import PartitionSpec as P

    B, nh = q_t.shape[:2]
    dp = mesh.shape.get("dp", 1)
    tp = mesh.shape.get("tp", 1)
    assert B % dp == 0 and nh % tp == 0, (B, nh, dp, tp)
    d_ax = "dp" if "dp" in mesh.axis_names else None
    t_ax = "tp" if "tp" in mesh.axis_names else None
    spec = P(d_ax, t_ax, None, None)

    def local(qt, kt, vt, ql, kl, vl, b, s):
        shard = jnp.int32(0)
        if "dp" in mesh.axis_names:
            shard = shard + jax.lax.axis_index("dp") * tp
        if "tp" in mesh.axis_names:
            shard = shard + jax.lax.axis_index("tp")
        s = s + (shard * jnp.int32(1000003))[None]
        return biacm_attention_train(qt, kt, vt, ql, kl, vl, b, s,
                                     scale_t, scale_l, rate=rate,
                                     tile_q=tile_q, interpret=interpret)

    return jax.shard_map(
        local, mesh=mesh, in_specs=(spec,) * 6 + (P(d_ax, None), P()),
        out_specs=(spec, spec), check_vma=False,
    )(q_t, k_t, v_t, q_l, k_l, v_l, bias, seed)


# ---------------------------------------------------------------------------
# Training path: custom-VJP fused BiACM attention with in-kernel dropout.
# ---------------------------------------------------------------------------

def _keep_thr(rate: float) -> int:
    """uint32 threshold t with P(bits < t) = 1 - rate for uniform bits."""
    return min(int(round((1.0 - rate) * 4294967296.0)), 4294967295)


def _vmem_bytes(L: int, tile: int, dt: int, dl: int, itemsize: int,
                with_grads: bool) -> int:
    """Scoped-VMEM estimate for one fused-BiACM kernel invocation.

    Calibrated against real Mosaic compile errors at L=4096 (24.28 MB at
    tile 128, 19.08 MB at tile 64 for the backward ⇒ ~5.2 live (TQ, L)
    fp32 temporaries + ~14 MB of double-buffered (L, d) kv blocks, fp32
    dk/dv accumulators and scratch). Deliberately a mild underestimate;
    callers multiply by 1.5 before handing it to the compiler."""
    kv = 2 * 2 * L * (dt + dl) * itemsize          # k+v blocks, dbuf
    acc = (2 * 2 * L * (dt + dl) * 4) if with_grads else 0  # fp32 dk/dv
    temps = 7 * tile * L * 4                       # live (TQ, L) fp32
    return kv + acc + temps + (1 << 20)            # + q/bias/out tiles


# Mosaic's default scoped-VMEM limit; requests beyond it need an explicit
# vmem_limit_bytes (v5e has 128 MiB of VMEM per core — the default is a
# conservative fraction that long-context kernels legitimately exceed).
_DEFAULT_VMEM_LIMIT = 16 * 2 ** 20
_MAX_VMEM_LIMIT = 100 * 2 ** 20


def _compiler_params(est_bytes: int):
    """Raise the scoped-VMEM limit when the estimate needs it (L ≥ ~4096);
    None keeps the default and stays friendly to small-VMEM TPU gens."""
    want = int(est_bytes * 1.5)
    if want <= _DEFAULT_VMEM_LIMIT:
        return None
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(want, _MAX_VMEM_LIMIT))


def _auto_tile_q(L: int, tile_q: int, dt: int = 64, dl: int = 16,
                 itemsize: int = 2) -> int:
    """Largest query tile ≤ ``tile_q`` (multiple of 8, dividing L) whose
    backward-kernel working set fits under the raised VMEM ceiling
    (est × 1.5 ≤ 100 MB of the v5e's 128 MiB). The default tile 128
    survives through L=8192; extreme lengths shrink it as a backstop.

    The fwd/bwd kernel PAIR must share one tile: the in-kernel hardware
    PRNG draws mask bits per (seed, grid cell) with the tile's shape, so
    differing tiles would give the backward different dropout masks than
    the forward actually applied."""
    budget = int(_MAX_VMEM_LIMIT / 1.5)
    t = min(tile_q, max(8, L // 8 * 8))
    t -= t % 8
    while t > 8 and (L % t or
                     _vmem_bytes(L, t, dt, dl, itemsize, True) > budget):
        t -= 8
    return max(t, 8)


def _coupled_probs(qt_ref, kt_ref, ql_ref, kl_ref, bias_ref,
                   scale_t: float, scale_l: float):
    s_t = jax.lax.dot_general(qt_ref[0, 0], kt_ref[0, 0],
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    s_l = jax.lax.dot_general(ql_ref[0, 0], kl_ref[0, 0],
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    s = s_t * scale_t + s_l * scale_l + bias_ref[0]
    mx = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - mx)
    return e / e.sum(axis=-1, keepdims=True)  # fp32 (TQ, L)


def _draw_bits(seed_ref, cell: int, shape):
    """Two uint32 mask-bit tensors; the SAME (seed, cell) always yields the
    same bits, which is what makes the fwd/bwd kernels and remat replays
    agree without ever storing the masks."""
    pltpu.prng_seed(seed_ref[0], cell)
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return b1, b2


def _fwd_train_kernel(*refs, scale_t, scale_l, rate, inkernel_rng):
    if rate > 0.0 and inkernel_rng:
        (seed_ref, qt_ref, kt_ref, vt_ref, ql_ref, kl_ref, vl_ref,
         bias_ref, ct_ref, cl_ref) = refs
    elif rate > 0.0:
        (qt_ref, kt_ref, vt_ref, ql_ref, kl_ref, vl_ref, bias_ref,
         b1_ref, b2_ref, ct_ref, cl_ref) = refs
    else:
        (qt_ref, kt_ref, vt_ref, ql_ref, kl_ref, vl_ref, bias_ref,
         ct_ref, cl_ref) = refs
    p = _coupled_probs(qt_ref, kt_ref, ql_ref, kl_ref, bias_ref,
                       scale_t, scale_l)
    dt_ = qt_ref.dtype
    if rate > 0.0:
        if inkernel_rng:
            b, h, i = pl.program_id(0), pl.program_id(1), pl.program_id(2)
            cell = (b * pl.num_programs(1) + h) * pl.num_programs(2) + i
            bits1, bits2 = _draw_bits(seed_ref, cell, p.shape)
        else:
            bits1, bits2 = b1_ref[0, 0], b2_ref[0, 0]
        thr = jnp.uint32(_keep_thr(rate))
        inv = 1.0 / (1.0 - rate)
        p1 = jnp.where(bits1 < thr, p * inv, 0.0).astype(dt_)
        p2 = jnp.where(bits2 < thr, p * inv, 0.0).astype(dt_)
    else:
        p1 = p2 = p.astype(dt_)
    ct_ref[0, 0] = jnp.dot(p1, vt_ref[0, 0],
                           preferred_element_type=jnp.float32).astype(dt_)
    cl_ref[0, 0] = jnp.dot(p2, vl_ref[0, 0],
                           preferred_element_type=jnp.float32).astype(dt_)


def _bwd_train_kernel(*refs, scale_t, scale_l, rate, inkernel_rng):
    if rate > 0.0 and inkernel_rng:
        (seed_ref, qt_ref, kt_ref, vt_ref, ql_ref, kl_ref, vl_ref, bias_ref,
         dct_ref, dcl_ref,
         dqt_ref, dql_ref, dkt_ref, dvt_ref, dkl_ref, dvl_ref) = refs
    elif rate > 0.0:
        (qt_ref, kt_ref, vt_ref, ql_ref, kl_ref, vl_ref, bias_ref,
         b1_ref, b2_ref, dct_ref, dcl_ref,
         dqt_ref, dql_ref, dkt_ref, dvt_ref, dkl_ref, dvl_ref) = refs
    else:
        (qt_ref, kt_ref, vt_ref, ql_ref, kl_ref, vl_ref, bias_ref,
         dct_ref, dcl_ref,
         dqt_ref, dql_ref, dkt_ref, dvt_ref, dkl_ref, dvl_ref) = refs
    p = _coupled_probs(qt_ref, kt_ref, ql_ref, kl_ref, bias_ref,
                       scale_t, scale_l)
    dt_ = qt_ref.dtype
    dct = dct_ref[0, 0]
    dcl = dcl_ref[0, 0]
    # dP_di = dctx_i · V_iᵀ   (TQ, L) fp32
    g1 = jax.lax.dot_general(dct, vt_ref[0, 0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    g2 = jax.lax.dot_general(dcl, vl_ref[0, 0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if rate > 0.0:
        if inkernel_rng:
            b, h, i = pl.program_id(0), pl.program_id(1), pl.program_id(2)
            cell = (b * pl.num_programs(1) + h) * pl.num_programs(2) + i
            bits1, bits2 = _draw_bits(seed_ref, cell, p.shape)
        else:
            bits1, bits2 = b1_ref[0, 0], b2_ref[0, 0]
        thr = jnp.uint32(_keep_thr(rate))
        inv = 1.0 / (1.0 - rate)
        p1 = jnp.where(bits1 < thr, p * inv, 0.0)
        p2 = jnp.where(bits2 < thr, p * inv, 0.0)
        dP = jnp.where(bits1 < thr, g1 * inv, 0.0) \
            + jnp.where(bits2 < thr, g2 * inv, 0.0)
    else:
        p1 = p2 = p
        dP = g1 + g2
    # shared-softmax backward: dS = P ⊙ (dP − Σ_j dP_j P_j)
    row = (dP * p).sum(axis=-1, keepdims=True)
    dS = (p * (dP - row)).astype(dt_)
    p1 = p1.astype(dt_)
    p2 = p2.astype(dt_)
    dqt_ref[0, 0] = (jnp.dot(dS, kt_ref[0, 0],
                             preferred_element_type=jnp.float32)
                     * scale_t).astype(dt_)
    dql_ref[0, 0] = (jnp.dot(dS, kl_ref[0, 0],
                             preferred_element_type=jnp.float32)
                     * scale_l).astype(dt_)

    # dk/dv accumulate over query tiles: their out blocks ignore the i grid
    # axis (innermost ⇒ sequential revisits keep the block in VMEM)
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        dkt_ref[0, 0] = jnp.zeros_like(dkt_ref[0, 0])
        dvt_ref[0, 0] = jnp.zeros_like(dvt_ref[0, 0])
        dkl_ref[0, 0] = jnp.zeros_like(dkl_ref[0, 0])
        dvl_ref[0, 0] = jnp.zeros_like(dvl_ref[0, 0])

    def acc_T(a, b):  # aᵀ·b over the TQ axis: (TQ, L)ᵀ (TQ, d) → (L, d)
        return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    dkt_ref[0, 0] += acc_T(dS, qt_ref[0, 0]) * scale_t
    dvt_ref[0, 0] += acc_T(p1, dct)
    dkl_ref[0, 0] += acc_T(dS, ql_ref[0, 0]) * scale_l
    dvl_ref[0, 0] += acc_T(p2, dcl)


def _train_specs(B, nh, L, dt, dl, tile_q, rate, inkernel_rng, with_grads):
    def q_spec(d):
        return pl.BlockSpec((1, 1, tile_q, d), lambda b, h, i: (b, h, i, 0),
                            memory_space=pltpu.VMEM)

    def kv_spec(d):
        return pl.BlockSpec((1, 1, L, d), lambda b, h, i: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)

    def kv_acc_spec(d):  # dk/dv accumulators: same block across all i
        return pl.BlockSpec((1, 1, L, d), lambda b, h, i: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)

    bias_spec = pl.BlockSpec((1, 1, L), lambda b, h, i: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = []
    if rate > 0.0 and inkernel_rng:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    in_specs += [q_spec(dt), kv_spec(dt), kv_spec(dt),
                 q_spec(dl), kv_spec(dl), kv_spec(dl), bias_spec]
    if rate > 0.0 and not inkernel_rng:
        in_specs += [q_spec(L), q_spec(L)]  # explicit mask bits (B,nh,L,L)
    if with_grads:
        in_specs += [q_spec(dt), q_spec(dl)]  # dctx_t, dctx_l
        out_specs = [q_spec(dt), q_spec(dl),
                     kv_acc_spec(dt), kv_acc_spec(dt),
                     kv_acc_spec(dl), kv_acc_spec(dl)]
    else:
        out_specs = [q_spec(dt), q_spec(dl)]
    return in_specs, out_specs


def _train_fwd_call(q_t, k_t, v_t, q_l, k_l, v_l, bias, rng,
                    scale_t, scale_l, rate, tile_q, interpret, inkernel_rng):
    B, nh, L, dt = q_t.shape
    dl = q_l.shape[-1]
    assert L % tile_q == 0, (L, tile_q)
    in_specs, out_specs = _train_specs(
        B, nh, L, dt, dl, tile_q, rate, inkernel_rng, with_grads=False)
    kernel = functools.partial(
        _fwd_train_kernel, scale_t=float(scale_t), scale_l=float(scale_l),
        rate=float(rate), inkernel_rng=inkernel_rng)
    args = []
    if rate > 0.0 and inkernel_rng:
        args.append(rng)
    args += [q_t, k_t, v_t, q_l, k_l, v_l, bias[:, None, :]]
    if rate > 0.0 and not inkernel_rng:
        args += [rng[0], rng[1]]
    return pl.pallas_call(
        kernel,
        grid=(B, nh, L // tile_q),
        compiler_params=_compiler_params(_vmem_bytes(
            L, tile_q, dt, dl, q_t.dtype.itemsize, False)),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((B, nh, L, dt), q_t.dtype),
            jax.ShapeDtypeStruct((B, nh, L, dl), q_t.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * nh * L * L * (dt + dl) * 2,
            bytes_accessed=(q_t.size + k_t.size + v_t.size) * 2 * 2,
            transcendentals=B * nh * L * L),
        interpret=interpret,
    )(*args)


def _train_bwd_call(q_t, k_t, v_t, q_l, k_l, v_l, bias, rng, dct, dcl,
                    scale_t, scale_l, rate, tile_q, interpret, inkernel_rng):
    B, nh, L, dt = q_t.shape
    dl = q_l.shape[-1]
    in_specs, out_specs = _train_specs(
        B, nh, L, dt, dl, tile_q, rate, inkernel_rng, with_grads=True)
    kernel = functools.partial(
        _bwd_train_kernel, scale_t=float(scale_t), scale_l=float(scale_l),
        rate=float(rate), inkernel_rng=inkernel_rng)
    args = []
    if rate > 0.0 and inkernel_rng:
        args.append(rng)
    args += [q_t, k_t, v_t, q_l, k_l, v_l, bias[:, None, :]]
    if rate > 0.0 and not inkernel_rng:
        args += [rng[0], rng[1]]
    args += [dct.astype(q_t.dtype), dcl.astype(q_t.dtype)]
    dqt, dql, dkt, dvt, dkl, dvl = pl.pallas_call(
        kernel,
        grid=(B, nh, L // tile_q),
        compiler_params=_compiler_params(_vmem_bytes(
            L, tile_q, dt, dl, q_t.dtype.itemsize, True)),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((B, nh, L, dt), q_t.dtype),
            jax.ShapeDtypeStruct((B, nh, L, dl), q_t.dtype),
            jax.ShapeDtypeStruct((B, nh, L, dt), jnp.float32),
            jax.ShapeDtypeStruct((B, nh, L, dt), jnp.float32),
            jax.ShapeDtypeStruct((B, nh, L, dl), jnp.float32),
            jax.ShapeDtypeStruct((B, nh, L, dl), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * B * nh * L * L * (dt + dl),
            bytes_accessed=(q_t.size + k_t.size + v_t.size) * 2 * 4,
            transcendentals=B * nh * L * L),
        interpret=interpret,
    )(*args)
    return (dqt, dkt.astype(k_t.dtype), dvt.astype(v_t.dtype),
            dql, dkl.astype(k_l.dtype), dvl.astype(v_l.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13))
def _biacm_train(q_t, k_t, v_t, q_l, k_l, v_l, bias, rng,
                 scale_t, scale_l, rate, tile_q, interpret, inkernel_rng):
    return _train_fwd_call(q_t, k_t, v_t, q_l, k_l, v_l, bias, rng,
                           scale_t, scale_l, rate, tile_q, interpret,
                           inkernel_rng)


def biacm_attention_train(
    q_t: jnp.ndarray,   # (B, nh, L, d_t)
    k_t: jnp.ndarray,
    v_t: jnp.ndarray,
    q_l: jnp.ndarray,   # (B, nh, L, d_l)
    k_l: jnp.ndarray,
    v_l: jnp.ndarray,
    bias: jnp.ndarray,  # (B, L) additive key mask, fp32
    rng,                # (1,) int32 seed, or (bits1, bits2) uint32 (B,nh,L,L)
    scale_t: float,
    scale_l: float,
    rate: float = 0.0,
    tile_q: int = 128,
    interpret: bool = False,
    inkernel_rng: bool = True,
):
    """Differentiable fused BiACM attention with in-kernel dropout.

    ``rate`` is the attention-dropout probability (two independent masks,
    one per stream — mirroring the XLA path's two `nn.Dropout` draws,
    modeling_lilt.py:378-382 of the reference). With ``inkernel_rng`` the
    masks are drawn by the TPU hardware PRNG from a scalar seed (pass
    ``rng`` = (1,) int32); the alternative explicit-bits form exists for
    CPU tests. Returns (ctx_t, ctx_l) like ``biacm_attention``.

    (custom_vjp takes positional args only, hence this wrapper.)
    """
    tile_q = _auto_tile_q(q_t.shape[2], int(tile_q))
    return _biacm_train(q_t, k_t, v_t, q_l, k_l, v_l, bias, rng,
                        float(scale_t), float(scale_l), float(rate),
                        tile_q, bool(interpret), bool(inkernel_rng))


def _train_vjp_fwd(q_t, k_t, v_t, q_l, k_l, v_l, bias, rng,
                   scale_t, scale_l, rate, tile_q, interpret, inkernel_rng):
    out = _train_fwd_call(q_t, k_t, v_t, q_l, k_l, v_l, bias, rng,
                          scale_t, scale_l, rate, tile_q, interpret,
                          inkernel_rng)
    return out, (q_t, k_t, v_t, q_l, k_l, v_l, bias, rng)


def _train_vjp_bwd(scale_t, scale_l, rate, tile_q, interpret, inkernel_rng,
                   res, cts):
    q_t, k_t, v_t, q_l, k_l, v_l, bias, rng = res
    dct, dcl = cts
    dqt, dkt, dvt, dql, dkl, dvl = _train_bwd_call(
        q_t, k_t, v_t, q_l, k_l, v_l, bias, rng, dct, dcl,
        scale_t, scale_l, rate, tile_q, interpret, inkernel_rng)
    dbias = jnp.zeros_like(bias)  # bias is a padding mask, not trained
    drng = jax.tree_util.tree_map(
        lambda x: np.zeros(x.shape, jax.dtypes.float0), rng)
    return (dqt, dkt, dvt, dql, dkl, dvl, dbias, drng)


_biacm_train.defvjp(_train_vjp_fwd, _train_vjp_bwd)
