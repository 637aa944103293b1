"""Pallas TPU kernel: fused pair-head inference.

The PEneo decoder's hot op scores every upper-triangular token pair through
five 2-layer MLP heads (models/decoder.py). The XLA blockwise path
materializes pair features ``silu(A_i + B_j)`` in HBM between ops — at
L=512, H=384 that is ~200 MB of traffic per sample per head layer. This
kernel keeps the whole chain in VMEM per (row-tile × col-tile):

    P   = silu(A[i_tile, :, None] + B[None, j_tile, :])   (TI·TJ, H)
    X_h = silu(P @ W1_h + b1_h)                           per head
    lg  = X_h @ W2_h + b2_h                               (TI·TJ, C)
    tag = argmax softmax(lg);  score = max softmax(lg)

writing only the tiny (TI, TJ) tag/score tiles to HBM. Lower-triangle tiles
are skipped entirely (pl.when on the grid coordinates).

The five heads' first-layer weights are stacked (5, H, H); second-layer
weights are padded to a common class count C_PAD=4 with a -inf pad bias so
softmax/argmax ignore the pad classes. Inference only — training uses the
remat'd XLA path (its per-block matmuls are MXU-bound already and need the
backward pass).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_HEADS = 5
C_PAD = 4
NEG_INF = -1e9


def _silu_f32(x32):
    # explicit fp32 silu: Mosaic rejects lax.logistic's f32 constant
    # broadcast into bf16 vectors
    return x32 / (1.0 + jnp.exp(-x32))


def _kernel(a_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, tags_ref, scores_ref):
    i = pl.program_id(1)
    j = pl.program_id(2)
    ti = a_ref.shape[1]
    tj = b_ref.shape[1]

    @pl.when(j * tj + tj > i * ti)  # tile intersects the upper triangle
    def _():
        a = a_ref[0].astype(jnp.float32)  # (TI, H)
        b = b_ref[0].astype(jnp.float32)  # (TJ, H)
        h = a.shape[-1]
        dtype = a_ref.dtype
        pair32 = a[:, None, :] + b[None, :, :]
        pair = _silu_f32(pair32).astype(dtype).reshape(ti * tj, h)
        for head in range(N_HEADS):
            x = jnp.dot(pair, w1_ref[head], preferred_element_type=jnp.float32)
            x = _silu_f32(x + b1_ref[head][None, :].astype(jnp.float32))
            x = x.astype(dtype)
            logits = jnp.dot(x, w2_ref[head], preferred_element_type=jnp.float32)
            logits = logits + b2_ref[head][None, :].astype(jnp.float32)
            probs = jax.nn.softmax(logits, axis=-1)
            tags_ref[head, 0] = jnp.argmax(probs, axis=-1).astype(
                jnp.int32).reshape(ti, tj)
            scores_ref[head, 0] = jnp.max(probs, axis=-1).reshape(ti, tj)

    @pl.when(j * tj + tj <= i * ti)  # fully below the diagonal: never read
    def _():
        tags_ref[...] = jnp.zeros_like(tags_ref)
        scores_ref[...] = jnp.zeros_like(scores_ref)


def pair_head_infer(
    a: jnp.ndarray,        # (B, L, H) combine-A (rows, incl. bias)
    b: jnp.ndarray,        # (B, L, H) combine-B (cols)
    w1: jnp.ndarray,       # (5, H, H) stacked first-layer kernels
    b1: jnp.ndarray,       # (5, H)
    w2: jnp.ndarray,       # (5, H, C_PAD) padded second-layer kernels
    b2: jnp.ndarray,       # (5, C_PAD) with NEG_INF on pad classes
    tile_i: int = 32,
    tile_j: int = 128,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (tags (5, B, L, L) int32, scores (5, B, L, L) float32)."""
    B, L, H = a.shape
    assert L % tile_i == 0 and L % tile_j == 0, (L, tile_i, tile_j)
    grid = (B, L // tile_i, L // tile_j)

    flops = 2 * B * (L * L // 2) * H * (H + C_PAD) * N_HEADS
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_i, H), lambda bi, i, j: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_j, H), lambda bi, i, j: (bi, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_HEADS, H, H), lambda bi, i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_HEADS, H), lambda bi, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_HEADS, H, C_PAD), lambda bi, i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_HEADS, C_PAD), lambda bi, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N_HEADS, 1, tile_i, tile_j),
                         lambda bi, i, j: (0, bi, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_HEADS, 1, tile_i, tile_j),
                         lambda bi, i, j: (0, bi, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N_HEADS, B, L, L), jnp.int32),
            jax.ShapeDtypeStruct((N_HEADS, B, L, L), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=a.size * 4 + b.size * 4,
            transcendentals=B * L * L * N_HEADS),
        interpret=interpret,
    )(a, b, w1, b1, w2, b2)
    return out[0], out[1]


def stack_head_weights(decoder_params: Dict, head_names, dtype=jnp.float32):
    """Decoder param tree → stacked/padded kernel weights.

    Expects the 2-layer classifier layout (heads/<name>_fc/{fc_0, fc_out})
    produced by models/decoder.PairClassifier. jit-safe (jnp ops only), so it
    can run on traced params inside an eval step — the stacking is a handful
    of tiny copies XLA folds away.
    """
    w1, b1, w2, b2 = [], [], [], []
    for name in head_names:
        clf = decoder_params["heads"][f"{name}_fc"]
        w1.append(jnp.asarray(clf["fc_0"]["kernel"], dtype))
        b1.append(jnp.asarray(clf["fc_0"]["bias"], dtype))
        k = jnp.asarray(clf["fc_out"]["kernel"], dtype)
        bo = jnp.asarray(clf["fc_out"]["bias"], dtype)
        c = k.shape[1]
        k_pad = jnp.zeros((k.shape[0], C_PAD), dtype).at[:, :c].set(k)
        b_pad = jnp.full((C_PAD,), NEG_INF, dtype).at[:c].set(bo)
        w2.append(k_pad)
        b2.append(b_pad)
    return (jnp.stack(w1), jnp.stack(b1), jnp.stack(w2), jnp.stack(b2))
