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

Inference-only (no attention dropout inside), mirroring the flash path's
gating; training keeps the XLA einsum path and its backward.
"""

from __future__ import annotations

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
    return pl.pallas_call(
        kernel,
        grid=grid,
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
