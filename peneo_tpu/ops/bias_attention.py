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
tile-by-tile exactly once per layer. Inference-only (no attention dropout —
LayoutLMv3/v2 serving runs deterministic); ``maybe_fused_ctx`` below is the
gate — it pads L to the next multiple of 64 (visual families leave L
unaligned: v2 +49, v3 +197 image tokens) and falls back to the XLA einsum
path on any training forward or when padding would exceed ``max_pad_frac``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .biacm_attention import _DEFAULT_VMEM_LIMIT, _MAX_VMEM_LIMIT


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
