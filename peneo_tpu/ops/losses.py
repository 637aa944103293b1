"""Classification losses for the pair heads (fp32, shape-static, jit-safe).

Parity targets (reference: model/custom_loss.py):
- plain class-weighted CE with torch "weighted mean" reduction
  (sum(w[t_i] * ce_i) / sum(w[t_i]))                          :189-202
- OHEM: per-element weighted CE, split positives (t != 0) /
  negatives (t == 0), keep top-k hardest of each, mean over
  kept count                                                   :234-288

The reference OHEM path contains an indexing bug (custom_loss.py:262-263,
272-273: it re-indexes the already-sorted loss array with indices into the
*unsorted* array, keeping a scrambled subset instead of the top-k). It is
dormant — shipped configs disable OHEM (-1/-1). We implement the *intended*
top-k semantics here; the quirk is documented, not reproduced.

The reference upcasts logits to fp32 before CE (custom_loss.py:197,205); we do
the same so bf16 training matches.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _per_element_ce(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Unweighted per-element cross-entropy, fp32.

    The target logp is picked with a one-hot select-sum rather than
    ``take_along_axis``: for the 2-4 classes of the pair heads a C-way
    select chain fuses into the surrounding elementwise code, where the
    equivalent small-C gather compiled to its own memory-bound fusion
    (measured ~4 ms/step/head at B=8, L=512 — r3 train profile). Values are
    bit-identical (the sum adds exact zeros)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    classes = jnp.arange(logits.shape[-1], dtype=targets.dtype)
    onehot = targets[..., None] == classes
    return -jnp.where(onehot, logp, 0.0).sum(axis=-1)


def class_weight_lookup(class_weights: jnp.ndarray,
                        targets: jnp.ndarray) -> jnp.ndarray:
    """``class_weights[targets]`` as a select chain (same fusion rationale
    as :func:`_per_element_ce`; exact — multiplies by 1.0/0.0)."""
    cw = class_weights.astype(jnp.float32)
    w = jnp.zeros(targets.shape, jnp.float32)
    for k in range(cw.shape[0]):
        w = w + jnp.where(targets == k, cw[k], 0.0)
    return w


def weighted_cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    class_weights: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    return_sum_and_weight: bool = False,
):
    """Class-weighted mean CE with torch semantics.

    ``mask`` selects which positions participate (e.g. the upper triangle of
    the dense pair grid — equivalent to the reference's flattened triu
    sequence). torch's weighted 'mean' divides by the sum of the selected
    class weights, not the count.
    """
    ce = _per_element_ce(logits, targets)
    w = class_weight_lookup(class_weights, targets)
    if mask is not None:
        w = w * mask.astype(jnp.float32)
    num = (ce * w).sum()
    den = w.sum()
    if return_sum_and_weight:
        return num, den
    return num / jnp.maximum(den, 1e-12)


def _top_k_sum(values: jnp.ndarray, mask: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sum of the k largest masked values; returns (sum, kept_count).

    kept_count = min(k, #selected) as in the reference (custom_loss.py:258,268).
    """
    flat = jnp.where(mask, values, -jnp.inf).ravel()
    k_static = min(k, flat.shape[0])
    top = jax.lax.top_k(flat, k_static)[0]
    finite = jnp.isfinite(top)
    n_avail = mask.sum()
    kept = jnp.minimum(n_avail, k_static)
    return jnp.where(finite, top, 0.0).sum(), kept


def ohem_cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    class_weights: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    num_hard_positive: int,
    num_hard_negative: int,
) -> jnp.ndarray:
    """Online hard example mining CE.

    Per-element *weighted* CE (torch reduction='none' with ``weight`` scales
    each element by w[target]); positives are targets != 0, negatives == 0;
    keep the top-k hardest of each; mean over total kept.

    If a k is <= 0, all elements of that class group are kept (matching the
    intended reference behavior when only one side uses OHEM).
    """
    ce = _per_element_ce(logits, targets)
    w = class_weight_lookup(class_weights, targets)
    ce_w = ce * w
    valid = jnp.ones_like(ce_w, dtype=bool) if mask is None else mask.astype(bool)
    pos_mask = (targets != 0) & valid
    neg_mask = (targets == 0) & valid

    def group(m, k):
        if k is None or k <= 0:
            s = jnp.where(m, ce_w, 0.0).sum()
            return s, m.sum()
        return _top_k_sum(ce_w, m, k)

    pos_sum, pos_n = group(pos_mask, num_hard_positive)
    neg_sum, neg_n = group(neg_mask, num_hard_negative)
    return (pos_sum + neg_sum) / jnp.maximum(pos_n + neg_n, 1).astype(jnp.float32)


def ohem_stream_init(num_hard_positive: int, num_hard_negative: int):
    """Streaming OHEM accumulator (one per head): the decoder feeds pair-grid
    row blocks through :func:`ohem_stream_update` and never materializes the
    full (B, L, L, C) logits — running top-k state is O(k), so OHEM keeps the
    blockwise head's O(blk·L) live-memory guarantee. Equivalent to
    :func:`ohem_cross_entropy` on the concatenated logits (tested)."""

    def group(k):
        if k is None or k <= 0:  # keep-all group: plain sum
            return {"sum": jnp.zeros((), jnp.float32),
                    "count": jnp.zeros((), jnp.int32)}
        return {"best": jnp.full((k,), -jnp.inf, jnp.float32),
                "count": jnp.zeros((), jnp.int32)}

    return {"pos": group(num_hard_positive), "neg": group(num_hard_negative)}


def ohem_stream_update(state, logits, targets, class_weights, mask):
    """Fold one block's weighted CE into the running OHEM state."""
    ce_w = _per_element_ce(logits, targets) \
        * class_weight_lookup(class_weights, targets)
    valid = mask.astype(bool)
    new = {}
    for key, gmask in (("pos", (targets != 0) & valid),
                       ("neg", (targets == 0) & valid)):
        g = state[key]
        cnt = g["count"] + gmask.sum()
        if "sum" in g:
            new[key] = {"sum": g["sum"] + jnp.where(gmask, ce_w, 0.0).sum(),
                        "count": cnt}
        else:
            k = g["best"].shape[0]
            vals = jnp.where(gmask, ce_w, -jnp.inf).ravel()
            merged = jnp.concatenate([g["best"], vals])
            new[key] = {"best": jax.lax.top_k(merged, k)[0], "count": cnt}
    return new


def ohem_stream_merge(state, axis: str):
    """Merge per-shard streaming OHEM states across a mapped mesh axis
    (inside shard_map): counts and keep-all sums are psum'd; top-k ``best``
    buffers are all_gather'd and re-top-k'd. The merged state is identical on
    every shard and equals a single-device stream over the union of the
    shards' elements, so ``ohem_stream_final`` afterwards reproduces the
    non-sp OHEM loss exactly (sums of the same top-k values)."""
    merged = {}
    for key in ("pos", "neg"):
        g = state[key]
        cnt = jax.lax.psum(g["count"], axis)
        if "sum" in g:
            merged[key] = {"sum": jax.lax.psum(g["sum"], axis), "count": cnt}
        else:
            k = g["best"].shape[0]
            allv = jax.lax.all_gather(g["best"], axis).reshape(-1)
            merged[key] = {"best": jax.lax.top_k(allv, k)[0], "count": cnt}
    return merged


def ohem_stream_final(state) -> jnp.ndarray:
    """Running state → OHEM loss (mean over kept elements, matching
    ohem_cross_entropy / reference custom_loss.py:234-288 intended
    semantics)."""

    def group(g):
        if "sum" in g:
            return g["sum"], g["count"]
        finite = jnp.isfinite(g["best"])
        kept = jnp.minimum(g["count"], g["best"].shape[0])
        return jnp.where(finite, g["best"], 0.0).sum(), kept

    pos_sum, pos_n = group(state["pos"])
    neg_sum, neg_n = group(state["neg"])
    return (pos_sum + neg_sum) / jnp.maximum(pos_n + neg_n, 1).astype(jnp.float32)


def random_sample_cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    rng: jax.Array,
    num_background: int,
    num_foreground: int,
    class_weights: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Randomly subsample background (t==0) / foreground (t!=0) elements
    before averaging CE (reference: CrossEntropyLossRandomSample,
    model/custom_loss.py:9-101 — defined there but unused by the pipeline;
    provided for capability parity). Shape-static: sampling keeps at most k
    of each group via random scores + top_k."""
    ce = _per_element_ce(logits, targets)
    if class_weights is not None:
        ce = ce * class_weight_lookup(class_weights, targets)
    valid = jnp.ones_like(ce, dtype=bool) if mask is None else mask.astype(bool)
    noise = jax.random.uniform(rng, ce.shape)

    def group(m, k):
        k = min(k, ce.size)
        sel = jnp.where(m, noise, -1.0).ravel()
        _, idx = jax.lax.top_k(sel, k)
        chosen = jnp.take(ce.ravel(), idx)
        ok = jnp.take(m.ravel(), idx)
        return jnp.where(ok, chosen, 0.0).sum(), jnp.minimum(m.sum(), k)

    bg_sum, bg_n = group((targets == 0) & valid, num_background)
    fg_sum, fg_n = group((targets != 0) & valid, num_foreground)
    return (bg_sum + fg_sum) / jnp.maximum(bg_n + fg_n, 1).astype(jnp.float32)


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
    reduction: str = "none",
) -> jnp.ndarray:
    """RetinaNet focal loss (reference: model/custom_loss.py:291-340 —
    unused by the pipeline; capability parity)."""
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    t = targets.astype(jnp.float32)
    ce = -(t * jax.nn.log_sigmoid(logits) + (1 - t) * jax.nn.log_sigmoid(-logits))
    p_t = p * t + (1 - p) * (1 - t)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        loss = (alpha * t + (1 - alpha) * (1 - t)) * loss
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss


def peneo_head_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    class_weights: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    num_hard_positive: int = -1,
    num_hard_negative: int = -1,
) -> jnp.ndarray:
    """Dispatch between plain weighted CE and OHEM, mirroring
    CrossEntropyLossOHEM.forward (reference: model/custom_loss.py:189-210)."""
    if num_hard_positive == -1 and num_hard_negative == -1:
        return weighted_cross_entropy(logits, targets, class_weights, mask)
    return ohem_cross_entropy(
        logits, targets, class_weights, mask, num_hard_positive, num_hard_negative
    )
