"""Pallas TPU kernel: fused attention with a full relative-position bias.

LayoutLMv3 and LayoutLMv2 add precomputed relative-position biases to the
attention scores (reference: model/backbone/layoutlmv3/layoutlmv3.py:370-398
``cogview``/rel-bias path and the HF LayoutLMv2 encoder): per layer the XLA
path materializes the fp32 ``(B, nh, L, L)`` score tensor in HBM, re-reads
it for the softmax, writes the probability tensor and reads it again for the
``p·v`` contraction. The bias itself is computed ONCE per forward and shared
by all layers, so per layer the only O(L²) traffic that is fundamentally
required is a single read of the bias — everything else is avoidable.

This kernel is the single-stream sibling of ``ops/biacm_attention.py``
(same grid/tiling/VMEM conventions): per grid cell ``(batch, head,
query-tile)`` the full key/value rows live in VMEM and

    s   = (q·kᵀ)·scale + rel_bias + key_mask        (TQ, L) fp32
    p   = softmax(s)
    ctx = p·v                                       (TQ, d)

so scores and probabilities never round-trip HBM; the bias is streamed
tile-by-tile exactly once per layer. ``bias_attention`` is the inference
kernel; ``maybe_fused_ctx`` is its gate — it pads L to the next multiple
of 64 (visual families leave L unaligned: v2 +49, v3 +197 image tokens)
and falls back to the XLA einsum path when padding would exceed
``max_pad_frac``.

``bias_attention_train`` is the training variant (the same custom-VJP
recipe as ``biacm_attention_train``): attention dropout is drawn INSIDE
the forward/backward kernels by the TPU hardware PRNG (one mask — the
families apply dropout once to the shared probs, vs the BiACM pair's two
per-stream draws), and the backward recomputes probabilities flash-style
per query tile while accumulating dk/dv across the sequential query-tile
grid axis. The one structural difference from the BiACM pair: the rel
bias is TRAINED (it comes from the families' bucketed-relative-position
tables, reference layoutlmv3.py:586-676), so the backward also emits
``dbias = dS`` — one fp32 (B, nh, L, L) write per layer, vs the XLA
path's several score/prob/mask round-trips. XLA sums the per-layer dbias
contributions and scatters them into the shared bias tables' gradient.
``maybe_fused_ctx_train`` is the training gate (same pad-to-64 logic; it
additionally refuses dropout off-TPU, where the hardware PRNG does not
exist).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .biacm_attention import (_DEFAULT_VMEM_LIMIT, _MAX_VMEM_LIMIT,
                              _keep_thr)


def _kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref, *, scale: float):
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    # bias block is (1, 1, TQ, L); mask block (1, 1, L) broadcasts over rows
    s = s * scale + bias_ref[0, 0] + mask_ref[0]
    mx = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - mx)
    p = (e / e.sum(axis=-1, keepdims=True)).astype(q_ref.dtype)
    out_ref[0, 0] = jnp.dot(p, v_ref[0, 0],
                            preferred_element_type=jnp.float32).astype(
        q_ref.dtype)


def _vmem_bytes(L: int, tile: int, d: int, itemsize: int) -> int:
    """Scoped-VMEM estimate (same calibration style as biacm_attention):
    double-buffered k/v blocks + double-buffered fp32 bias tiles + the live
    (TQ, L) fp32 score/exp temporaries."""
    kv = 2 * 2 * L * d * itemsize      # k+v blocks, double-buffered
    bias = 2 * tile * L * 4            # fp32 bias tile, double-buffered
    temps = 5 * tile * L * 4           # live (TQ, L) fp32
    return kv + bias + temps + (1 << 20)


def _compiler_params(est_bytes: int):
    want = int(est_bytes * 1.5)
    if want <= _DEFAULT_VMEM_LIMIT:
        return None
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(want, _MAX_VMEM_LIMIT))


def bias_attention(
    q: jnp.ndarray,      # (B, nh, L, d)
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,   # (B, nh, L, L) fp32 rel-pos bias (already scaled)
    mask: jnp.ndarray,   # (B, L) additive key mask, fp32 (0 or large-neg)
    scale: float,
    tile_q: int = 128,
    interpret: bool = False,
):
    """Returns ctx (B, nh, L, d) = softmax(q·kᵀ·scale + bias + mask)·v."""
    B, nh, L, d = q.shape
    assert L % tile_q == 0, (L, tile_q)
    assert bias.shape == (B, nh, L, L), (bias.shape, q.shape)
    grid = (B, nh, L // tile_q)

    q_spec = pl.BlockSpec((1, 1, tile_q, d), lambda b, h, i: (b, h, i, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, 1, L, d), lambda b, h, i: (b, h, 0, 0),
                           memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, 1, tile_q, L), lambda b, h, i: (b, h, i, 0),
                             memory_space=pltpu.VMEM)
    # (B, 1, L) with a full (1, 1, L) block — see biacm_attention for why a
    # (1, L) block over (B, L) is rejected by the TPU lowering
    mask_spec = pl.BlockSpec((1, 1, L), lambda b, h, i: (b, 0, 0),
                             memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel, scale=float(scale))
    return pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=_compiler_params(
            _vmem_bytes(L, tile_q, d, q.dtype.itemsize)),
        in_specs=[q_spec, kv_spec, kv_spec, bias_spec, mask_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((B, nh, L, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * nh * L * L * d * 2,
            bytes_accessed=(q.size + k.size + v.size) * 2 * 2 + bias.size * 4,
            transcendentals=B * nh * L * L),
        interpret=interpret,
    )(q, k, v, bias.astype(jnp.float32), mask[:, None, :])


def maybe_fused_ctx(q, k, v, rel_bias, attn_bias, scale, *,
                    deterministic, dropout_p, mesh=None,
                    max_pad_frac: float = 0.10):
    """Shared gate + dispatch for the LayoutLMv3/v2 attention layers.

    ``q/k/v`` are the layers' (B, L, nh, d) projections, ``rel_bias`` the
    precomputed (B, nh, L, L) relative-position bias, ``attn_bias`` the
    (B, 1, 1, L) extended attention mask. Returns the (B, L, nh·d) context
    via the fused kernel, or ``None`` when the kernel does not apply
    (non-deterministic/training forward, no rel bias — a bias-free config
    where XLA's plain attention is already fine — or a mesh whose dp/tp
    axes don't divide the batch/head counts).

    Visual backbones append image tokens (v2: +49, v3: +197), leaving L
    unaligned to the TPU tile. The wrapper pads keys/queries to the next
    multiple of 64 (tile_q 128 when 128-aligned, else 64), masks the padded
    keys with a large negative bias (padded *query* rows still see real
    keys, so no NaN rows), and slices the context back — but only while the
    extra padded-row fraction stays under ``max_pad_frac``: beyond that the
    wasted score FLOPs eat the fusion win and the XLA path is better."""
    B, L, nh, d = q.shape
    if rel_bias is None:
        return None
    if not deterministic:
        # inference-only: this kernel has no custom VJP (unlike
        # ops/biacm_attention's train variant), so even a dropout_p == 0.0
        # training forward must take the differentiable XLA path
        return None
    del dropout_p  # serving is deterministic; kept for call-site symmetry
    if mesh is not None:
        dp_ = mesh.shape.get("dp", 1)
        tp_ = mesh.shape.get("tp", 1)
        if dp_ * tp_ > 1 and (B % dp_ or nh % tp_):
            # shard_map needs dp|B and tp|nh (nh=12 for both families) —
            # fall back to the GSPMD-partitionable XLA path instead of
            # tripping bias_attention_sharded's assert at trace time
            return None
    lp = -(-L // 64) * 64
    if lp > L * (1.0 + max_pad_frac):
        return None
    tile_q = 128 if lp % 128 == 0 else 64
    mask = attn_bias.reshape(B, L).astype(jnp.float32)
    if lp != L:
        pad = lp - L
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        rel_bias = jnp.pad(rel_bias,
                           ((0, 0), (0, 0), (0, pad), (0, pad)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)), constant_values=-1e9)
    args = (q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), rel_bias, mask, scale)
    interpret = jax.default_backend() == "cpu"
    if mesh is not None and (mesh.shape.get("dp", 1)
                             * mesh.shape.get("tp", 1)) > 1:
        ctx = bias_attention_sharded(*args, mesh=mesh, tile_q=tile_q,
                                     interpret=interpret)
    else:
        ctx = bias_attention(*args, tile_q=tile_q, interpret=interpret)
    return ctx.transpose(0, 2, 1, 3)[:, :L].reshape(B, L, nh * d)


def bias_attention_sharded(
    q, k, v, bias, mask, scale, *,
    mesh, tile_q: int = 128, interpret: bool = False,
):
    """``bias_attention`` under a (dp, tp[, sp]) mesh via ``shard_map``.

    Same reasoning as ``biacm_attention_sharded``: GSPMD cannot partition a
    ``pallas_call`` (it would all-gather around the custom call), but the
    computation is independent per (batch, head) — the batch splits over
    ``dp`` and the heads over ``tp`` with zero collectives; unmentioned axes
    (``sp``) replicate."""
    from jax.sharding import PartitionSpec as P

    B, nh = q.shape[:2]
    dp = mesh.shape.get("dp", 1)
    tp = mesh.shape.get("tp", 1)
    assert B % dp == 0 and nh % tp == 0, (B, nh, dp, tp)
    d_ax = "dp" if "dp" in mesh.axis_names else None
    t_ax = "tp" if "tp" in mesh.axis_names else None
    spec = P(d_ax, t_ax, None, None)

    def local(q_, k_, v_, bias_, mask_):
        return bias_attention(q_, k_, v_, bias_, mask_, scale,
                              tile_q=tile_q, interpret=interpret)

    return jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec, spec, P(d_ax, None)),
        out_specs=spec, check_vma=False,
    )(q, k, v, bias, mask)


# ---------------------------------------------------------------------------
# Training path: custom-VJP fused rel-bias attention with in-kernel dropout
# and a trained-bias gradient (dbias = dS). Same recipe as
# ops/biacm_attention's train pair; single stream, single dropout mask.
# ---------------------------------------------------------------------------

def _vmem_bytes_train(L: int, tile: int, d: int, itemsize: int,
                      with_grads: bool) -> int:
    """Scoped-VMEM estimate for the train kernels (same calibration style
    as biacm_attention._vmem_bytes): double-buffered kv blocks, fp32 dk/dv
    accumulators, double-buffered fp32 bias in / dbias out tiles, plus the
    live (TQ, L) fp32 score/prob/grad temporaries."""
    kv = 2 * 2 * L * d * itemsize                       # k+v blocks, dbuf
    acc = (2 * L * d * 4) if with_grads else 0          # fp32 dk/dv
    bias_io = (4 if with_grads else 2) * tile * L * 4   # bias in (+ dbias out)
    temps = 7 * tile * L * 4                            # live (TQ, L) fp32
    return kv + acc + bias_io + temps + (1 << 20)


def _auto_tile_q_train(L: int, tile_q: int, d: int, itemsize: int) -> int:
    """Largest query tile ≤ tile_q (multiple of 8, dividing L) whose
    backward working set fits under the raised VMEM ceiling. The fwd/bwd
    pair must share one tile: the in-kernel PRNG draws mask bits per
    (seed, grid cell) with the tile's shape."""
    budget = int(_MAX_VMEM_LIMIT / 1.5)
    t = min(tile_q, max(8, L // 8 * 8))
    t -= t % 8
    while t > 8 and (L % t or
                     _vmem_bytes_train(L, t, d, itemsize, True) > budget):
        t -= 8
    return max(t, 8)


def _probs(q_ref, k_ref, bias_ref, mask_ref, scale: float):
    s = jax.lax.dot_general(q_ref[0, 0], k_ref[0, 0],
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * scale + bias_ref[0, 0] + mask_ref[0]
    mx = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - mx)
    return e / e.sum(axis=-1, keepdims=True)  # fp32 (TQ, L)


def _draw_bits(seed_ref, cell: int, shape):
    """One uint32 mask-bit tensor; the SAME (seed, cell) always yields the
    same bits — fwd/bwd kernels and remat replays agree without storing
    the mask."""
    pltpu.prng_seed(seed_ref[0], cell)
    return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)


def _fwd_train_kernel(*refs, scale, rate, inkernel_rng):
    if rate > 0.0 and inkernel_rng:
        seed_ref, q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref = refs
    elif rate > 0.0:
        q_ref, k_ref, v_ref, bias_ref, mask_ref, bits_ref, out_ref = refs
    else:
        q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref = refs
    p = _probs(q_ref, k_ref, bias_ref, mask_ref, scale)
    dt_ = q_ref.dtype
    if rate > 0.0:
        if inkernel_rng:
            b, h, i = pl.program_id(0), pl.program_id(1), pl.program_id(2)
            cell = (b * pl.num_programs(1) + h) * pl.num_programs(2) + i
            bits = _draw_bits(seed_ref, cell, p.shape)
        else:
            bits = bits_ref[0, 0]
        thr = jnp.uint32(_keep_thr(rate))
        p1 = jnp.where(bits < thr, p * (1.0 / (1.0 - rate)), 0.0).astype(dt_)
    else:
        p1 = p.astype(dt_)
    out_ref[0, 0] = jnp.dot(p1, v_ref[0, 0],
                            preferred_element_type=jnp.float32).astype(dt_)


def _bwd_train_kernel(*refs, scale, rate, inkernel_rng):
    if rate > 0.0 and inkernel_rng:
        (seed_ref, q_ref, k_ref, v_ref, bias_ref, mask_ref, dct_ref,
         dq_ref, dbias_ref, dk_ref, dv_ref) = refs
    elif rate > 0.0:
        (q_ref, k_ref, v_ref, bias_ref, mask_ref, bits_ref, dct_ref,
         dq_ref, dbias_ref, dk_ref, dv_ref) = refs
    else:
        (q_ref, k_ref, v_ref, bias_ref, mask_ref, dct_ref,
         dq_ref, dbias_ref, dk_ref, dv_ref) = refs
    p = _probs(q_ref, k_ref, bias_ref, mask_ref, scale)
    dt_ = q_ref.dtype
    dct = dct_ref[0, 0]
    # dP_dropped = dctx · Vᵀ   (TQ, L) fp32
    g = jax.lax.dot_general(dct, v_ref[0, 0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if rate > 0.0:
        if inkernel_rng:
            b, h, i = pl.program_id(0), pl.program_id(1), pl.program_id(2)
            cell = (b * pl.num_programs(1) + h) * pl.num_programs(2) + i
            bits = _draw_bits(seed_ref, cell, p.shape)
        else:
            bits = bits_ref[0, 0]
        thr = jnp.uint32(_keep_thr(rate))
        inv = 1.0 / (1.0 - rate)
        p1 = jnp.where(bits < thr, p * inv, 0.0)      # applied probs
        dP = jnp.where(bits < thr, g * inv, 0.0)      # grad wrt pre-drop p
    else:
        p1 = p
        dP = g
    # softmax backward: dS = P ⊙ (dP − Σ_j dP_j P_j); dbias = dS (the bias
    # adds directly to the scores and is TRAINED — unlike biacm's key mask)
    row = (dP * p).sum(axis=-1, keepdims=True)
    dS = p * (dP - row)
    dbias_ref[0, 0] = dS                               # fp32 out
    dS_c = dS.astype(dt_)
    p1 = p1.astype(dt_)
    dq_ref[0, 0] = (jnp.dot(dS_c, k_ref[0, 0],
                            preferred_element_type=jnp.float32)
                    * scale).astype(dt_)

    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    def acc_T(a, b):  # aᵀ·b over the TQ axis: (TQ, L)ᵀ (TQ, d) → (L, d)
        return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    dk_ref[0, 0] += acc_T(dS_c, q_ref[0, 0]) * scale
    dv_ref[0, 0] += acc_T(p1, dct)


def _train_specs(L, d, tile_q, rate, inkernel_rng, with_grads):
    def q_spec(d_):
        return pl.BlockSpec((1, 1, tile_q, d_), lambda b, h, i: (b, h, i, 0),
                            memory_space=pltpu.VMEM)

    kv_spec = pl.BlockSpec((1, 1, L, d), lambda b, h, i: (b, h, 0, 0),
                           memory_space=pltpu.VMEM)
    kv_acc_spec = pl.BlockSpec((1, 1, L, d), lambda b, h, i: (b, h, 0, 0),
                               memory_space=pltpu.VMEM)
    bias_spec = q_spec(L)  # (1, 1, TQ, L) tiles over the (B, nh, L, L) bias
    mask_spec = pl.BlockSpec((1, 1, L), lambda b, h, i: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = []
    if rate > 0.0 and inkernel_rng:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    in_specs += [q_spec(d), kv_spec, kv_spec, bias_spec, mask_spec]
    if rate > 0.0 and not inkernel_rng:
        in_specs.append(q_spec(L))  # explicit mask bits (B, nh, L, L)
    if with_grads:
        in_specs.append(q_spec(d))  # dctx
        out_specs = [q_spec(d), q_spec(L), kv_acc_spec, kv_acc_spec]
    else:
        out_specs = [q_spec(d)]
    return in_specs, out_specs


def _train_fwd_call(q, k, v, bias, mask, rng, scale, rate, tile_q,
                    interpret, inkernel_rng):
    B, nh, L, d = q.shape
    assert L % tile_q == 0, (L, tile_q)
    assert bias.shape == (B, nh, L, L), (bias.shape, q.shape)
    in_specs, out_specs = _train_specs(
        L, d, tile_q, rate, inkernel_rng, with_grads=False)
    kernel = functools.partial(_fwd_train_kernel, scale=float(scale),
                               rate=float(rate), inkernel_rng=inkernel_rng)
    args = []
    if rate > 0.0 and inkernel_rng:
        args.append(rng)
    args += [q, k, v, bias.astype(jnp.float32), mask[:, None, :]]
    if rate > 0.0 and not inkernel_rng:
        args.append(rng)
    [out] = pl.pallas_call(
        kernel,
        grid=(B, nh, L // tile_q),
        compiler_params=_compiler_params(
            _vmem_bytes_train(L, tile_q, d, q.dtype.itemsize, False)),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((B, nh, L, d), q.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * nh * L * L * d * 2,
            bytes_accessed=(q.size + k.size + v.size) * 2 * 2
            + bias.size * 4,
            transcendentals=B * nh * L * L),
        interpret=interpret,
    )(*args)
    return out


def _train_bwd_call(q, k, v, bias, mask, rng, dct, scale, rate, tile_q,
                    interpret, inkernel_rng):
    B, nh, L, d = q.shape
    in_specs, out_specs = _train_specs(
        L, d, tile_q, rate, inkernel_rng, with_grads=True)
    kernel = functools.partial(_bwd_train_kernel, scale=float(scale),
                               rate=float(rate), inkernel_rng=inkernel_rng)
    args = []
    if rate > 0.0 and inkernel_rng:
        args.append(rng)
    args += [q, k, v, bias.astype(jnp.float32), mask[:, None, :]]
    if rate > 0.0 and not inkernel_rng:
        args.append(rng)
    args.append(dct.astype(q.dtype))
    dq, dbias, dk, dv = pl.pallas_call(
        kernel,
        grid=(B, nh, L // tile_q),
        compiler_params=_compiler_params(
            _vmem_bytes_train(L, tile_q, d, q.dtype.itemsize, True)),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((B, nh, L, d), q.dtype),
            jax.ShapeDtypeStruct((B, nh, L, L), jnp.float32),
            jax.ShapeDtypeStruct((B, nh, L, d), jnp.float32),
            jax.ShapeDtypeStruct((B, nh, L, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * B * nh * L * L * d,
            bytes_accessed=(q.size + k.size + v.size) * 2 * 4
            + bias.size * 8,
            transcendentals=B * nh * L * L),
        interpret=interpret,
    )(*args)
    return dq, dbias.astype(bias.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def _bias_train(q, k, v, bias, mask, rng,
                scale, rate, tile_q, interpret, inkernel_rng):
    return _train_fwd_call(q, k, v, bias, mask, rng, scale, rate, tile_q,
                           interpret, inkernel_rng)


def bias_attention_train(
    q: jnp.ndarray,      # (B, nh, L, d)
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,   # (B, nh, L, L) fp32 rel-pos bias — TRAINED
    mask: jnp.ndarray,   # (B, L) additive key mask, fp32 (not trained)
    rng,                 # (1,) int32 seed, or uint32 (B, nh, L, L) mask bits
    scale: float,
    rate: float = 0.0,
    tile_q: int = 128,
    interpret: bool = False,
    inkernel_rng: bool = True,
):
    """Differentiable fused rel-bias attention with in-kernel dropout.

    ``rate`` is the attention-dropout probability (ONE mask over the shared
    probs — the reference applies `self.dropout(attention_probs)` once,
    modeling_layoutlmv3.py:400-407). With ``inkernel_rng`` the mask is
    drawn by the TPU hardware PRNG from a scalar seed (pass ``rng`` = (1,)
    int32); the explicit-bits form exists for CPU tests. Returns ctx
    (B, nh, L, d); gradients flow to q/k/v AND the bias (dbias = dS).

    (custom_vjp takes positional args only, hence this wrapper.)
    """
    tile_q = _auto_tile_q_train(q.shape[2], int(tile_q), q.shape[3],
                                q.dtype.itemsize)
    return _bias_train(q, k, v, bias, mask, rng,
                       float(scale), float(rate), tile_q, bool(interpret),
                       bool(inkernel_rng))


def _train_vjp_fwd(q, k, v, bias, mask, rng,
                   scale, rate, tile_q, interpret, inkernel_rng):
    out = _train_fwd_call(q, k, v, bias, mask, rng, scale, rate, tile_q,
                          interpret, inkernel_rng)
    return out, (q, k, v, bias, mask, rng)


def _train_vjp_bwd(scale, rate, tile_q, interpret, inkernel_rng, res, dct):
    q, k, v, bias, mask, rng = res
    dq, dbias, dk, dv = _train_bwd_call(
        q, k, v, bias, mask, rng, dct, scale, rate, tile_q, interpret,
        inkernel_rng)
    dmask = jnp.zeros_like(mask)  # padding mask, not trained
    drng = jax.tree_util.tree_map(
        lambda x: np.zeros(x.shape, jax.dtypes.float0), rng)
    return (dq, dk, dv, dbias, dmask, drng)


_bias_train.defvjp(_train_vjp_fwd, _train_vjp_bwd)


def bias_attention_train_sharded(
    q, k, v, bias, mask, rng, scale, *,
    mesh, rate: float = 0.0, tile_q: int = 128, interpret: bool = False,
):
    """``bias_attention_train`` under a (dp, tp[, sp]) mesh via shard_map.

    Differentiation passes through shard_map into the custom VJP; the
    backward kernel runs per-shard with the same specs (dbias keeps the
    dp/tp sharding of the bias — GSPMD reduces it into the bias tables'
    gradient). The scalar dropout seed is decorrelated per (dp, tp) shard;
    ``sp`` shards keep the same seed on purpose (replicated backbone,
    identical masks keep the replicated activations consistent)."""
    from jax.sharding import PartitionSpec as P

    B, nh = q.shape[:2]
    dp = mesh.shape.get("dp", 1)
    tp = mesh.shape.get("tp", 1)
    assert B % dp == 0 and nh % tp == 0, (B, nh, dp, tp)
    d_ax = "dp" if "dp" in mesh.axis_names else None
    t_ax = "tp" if "tp" in mesh.axis_names else None
    spec = P(d_ax, t_ax, None, None)

    def local(q_, k_, v_, bias_, mask_, rng_):
        shard = jnp.int32(0)
        if "dp" in mesh.axis_names:
            shard = shard + jax.lax.axis_index("dp") * tp
        if "tp" in mesh.axis_names:
            shard = shard + jax.lax.axis_index("tp")
        rng_ = rng_ + (shard * jnp.int32(1000003))[None]
        return bias_attention_train(q_, k_, v_, bias_, mask_, rng_, scale,
                                    rate=rate, tile_q=tile_q,
                                    interpret=interpret)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec, spec, spec, P(d_ax, None), P()),
        out_specs=spec, check_vma=False,
    )(q, k, v, bias, mask, rng)


def maybe_fused_ctx_train(q, k, v, rel_bias, attn_bias, scale, *,
                          rate, seed, mesh=None, max_pad_frac: float = 0.10):
    """Training-forward gate + dispatch for the LayoutLMv3/v2 layers.

    Mirror of ``maybe_fused_ctx`` for non-deterministic forwards: same
    (B, L, nh, d) layout, same pad-to-64 handling (padding is
    differentiable — `jnp.pad`'s VJP slices, so padded-region dbias/dq
    rows are dropped exactly), dispatching to the custom-VJP train kernel.
    Returns None when the kernel does not apply: no rel bias, dropout
    requested off-TPU (no hardware PRNG — CPU tests use the explicit-bits
    form directly), pad fraction over budget, or an indivisible mesh."""
    B, L, nh, d = q.shape
    if rel_bias is None:
        return None
    if rate > 0.0 and jax.default_backend() != "tpu":
        return None
    if mesh is not None:
        dp_ = mesh.shape.get("dp", 1)
        tp_ = mesh.shape.get("tp", 1)
        if dp_ * tp_ > 1 and (B % dp_ or nh % tp_):
            return None
    lp = -(-L // 64) * 64
    if lp > L * (1.0 + max_pad_frac):
        return None
    tile_q = 128 if lp % 128 == 0 else 64
    mask = attn_bias.reshape(B, L).astype(jnp.float32)
    if lp != L:
        pad = lp - L
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        rel_bias = jnp.pad(rel_bias, ((0, 0), (0, 0), (0, pad), (0, pad)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)), constant_values=-1e9)
    args = (q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), rel_bias, mask, seed, scale)
    interpret = jax.default_backend() == "cpu"
    if mesh is not None and (mesh.shape.get("dp", 1)
                             * mesh.shape.get("tp", 1)) > 1:
        ctx = bias_attention_train_sharded(*args, mesh=mesh, rate=rate,
                                           tile_q=tile_q,
                                           interpret=interpret)
    else:
        ctx = bias_attention_train(*args, rate=rate, tile_q=tile_q,
                                   interpret=interpret)
    return ctx.transpose(0, 2, 1, 3)[:, :L].reshape(B, L, nh * d)
