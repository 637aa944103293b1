"""Stacked pair-head weight utilities (shared by the sequence-parallel path).

``stack_head_weights`` flattens the five 2-layer classifier heads
(models/decoder.PairClassifier) into four stacked arrays — first-layer
kernels (5, H, H), second-layer kernels padded to a common class count
C_PAD=4 with a -inf pad bias so softmax/argmax ignore the pad classes.
parallel/seq_parallel.py evaluates head logits from this layout inside its
shard_map bodies.

History: this module used to also hold a fused Pallas inference kernel for
the pair head (pair features + 5 heads + argmax in VMEM). It was measured
and removed in round 3 — the XLA blockwise path (models/decoder.py) won at
every configuration: 249 vs 192 pages/s (L=512), 70.9 vs 56.1 (L=1024),
19.1 vs 15.2 (L=2048) for the original per-head kernel, and 265 vs 242
(L=512) / 19.2 vs 17.3 (L=2048) for a column-major rework; an intermediate
stacked-matmul variant additionally hung the Mosaic compiler (its transposed
fp32 (TI·TJ, 5H) intermediate alone filled the ~16 MB VMEM). XLA's
producer-fused silu→matmul chain over triu column slices is already
MXU-bound here — a hand kernel has nothing left to win. Full measurements:
docs/documentation.md §8.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

N_HEADS = 5
C_PAD = 4
NEG_INF = -1e9


def stack_head_weights(decoder_params: Dict, head_names, dtype=jnp.float32):
    """Decoder param tree → stacked/padded head weights.

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


def stack_head_weights_int8(decoder_params: Dict, head_names,
                            dtype=jnp.float32):
    """Int8 stacked layout for the sp pair-head path: the dominant H→H
    first-layer kernels are pre-quantized with per-output-channel symmetric
    scales (the ops/quant.Int8Dense weight scheme, computed from the fp32
    params exactly as the module path does); the tiny H→C_PAD output layers
    stay full precision, mirroring PairClassifier's quant_int8 which only
    swaps the hidden layers.

    Returns a 5-tuple ``(w1q int8 (5,H,H), w1_scale f32 (5,H), b1, w2, b2)``
    — parallel/seq_parallel._head_block dispatches on the tuple arity.
    """
    w1, b1, w2, b2 = stack_head_weights(decoder_params, head_names,
                                        jnp.float32)
    w_scale = jnp.max(jnp.abs(w1), axis=1) / 127.0            # (5, H)
    w1q = jnp.round(
        w1 / jnp.maximum(w_scale, 1e-12)[:, None, :]).astype(jnp.int8)
    return (w1q, w_scale, b1, w2.astype(dtype), b2.astype(dtype))
