"""Pallas TPU kernel: fused pair-head inference.

The PEneo decoder's hot op scores every upper-triangular token pair through
five 2-layer MLP heads (models/decoder.py). The XLA blockwise path
materializes pair features ``silu(A_i + B_j)`` in HBM between ops — at
L=512, H=384 that is ~200 MB of traffic per sample per head layer. This
kernel keeps the whole chain in VMEM per (row-tile × col-tile):

    P   = silu(A[i_tile, :, None] + B[None, j_tile, :])   (TI·TJ, H)
    X   = silu(P @ W1s + b1s)     one (H → 5H) matmul, all heads stacked
    lgᵀ = W2ᵀ·Xᵀ                  block-diagonal (5C, 5H) → (5C, TI·TJ)
    tag = argmax lg over classes; score = 1/Σexp(lg - max) (= max prob)

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


def _kernel(a_ref, b_ref, w1s_ref, b1s_ref, w2t_ref, b2_ref, tags_ref,
            scores_ref):
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
        # all 5 heads in ONE fc_0 matmul (H → 5H): a single large-N MXU op
        # pipelines better than five H→H ops. (The XLA path measured the
        # same stacking 13% SLOWER — but only because it broke XLA's
        # producer fusions, docs §8; inside one kernel there is nothing to
        # break.)
        x = jnp.dot(pair, w1s_ref[...], preferred_element_type=jnp.float32)
        x = _silu_f32(x + b1s_ref[...].astype(jnp.float32)).astype(dtype)
        # logits come out TRANSPOSED (5·C_PAD, N) via a block-diagonal w2ᵀ:
        # with (N, C_PAD) layout the 4-class minor dim pads to 128 lanes and
        # every softmax/argmax pass wastes 124/128 of the VPU; (C, N) makes
        # them cheap cross-sublane reductions over 4 rows.
        lgt = jax.lax.dot_general(
            w2t_ref[...], x, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (5·C_PAD, TI·TJ)
        for head in range(N_HEADS):
            # cast before the [:, None]: Mosaic only supports non-no-op
            # minor-dim insertion for 32-bit types
            b2_col = b2_ref[head].astype(jnp.float32)[:, None]
            lg = lgt[head * C_PAD:(head + 1) * C_PAD] + b2_col
            mx = jnp.max(lg, axis=0)
            e = jnp.exp(lg - mx[None, :])
            score = 1.0 / e.sum(axis=0)  # = max softmax prob (e at argmax = 1)
            tags_ref[head, 0] = jnp.argmax(lg, axis=0).astype(
                jnp.int32).reshape(ti, tj)
            scores_ref[head, 0] = score.reshape(ti, tj)

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
    tile_i: int = 16,
    tile_j: int = 128,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (tags (5, B, L, L) int32, scores (5, B, L, L) float32).

    ``tile_i`` defaults to 16 (not 32): the stacked activations
    (TI·TJ, 5H) must fit VMEM — at H=384, bf16, TI=16, TJ=128 that is
    ~7.5 MB, leaving room for pair features and weights."""
    B, L, H = a.shape
    assert L % tile_i == 0 and L % tile_j == 0, (L, tile_i, tile_j)
    grid = (B, L // tile_i, L // tile_j)

    # stacked single-matmul forms (folded into constants under jit):
    # fc_0 kernels concatenated on the output dim, fc_out kernels transposed
    # into one block-diagonal (5·C_PAD, 5H)
    w1s = jnp.transpose(w1, (1, 0, 2)).reshape(H, N_HEADS * H)
    b1s = b1.reshape(1, N_HEADS * H)
    w2t = jnp.zeros((N_HEADS * C_PAD, N_HEADS * H), w2.dtype)
    for h in range(N_HEADS):
        w2t = w2t.at[h * C_PAD:(h + 1) * C_PAD, h * H:(h + 1) * H].set(
            w2[h].T)

    flops = 2 * B * (L * L // 2) * H * (H + C_PAD) * N_HEADS
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_i, H), lambda bi, i, j: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_j, H), lambda bi, i, j: (bi, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, N_HEADS * H), lambda bi, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_HEADS * H), lambda bi, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_HEADS * C_PAD, N_HEADS * H),
                         lambda bi, i, j: (0, 0),
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
    )(a, b, w1s, b1s, w2t, b2)
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
