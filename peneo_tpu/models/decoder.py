"""PEneo decoder: shrink projection + pairwise ("handshaking") head + 5
classifiers + losses, in dense blockwise form.

Reference semantics (model/peneo_decoder.py):
- shrink projection: Linear→SiLU→Dropout ×2, input → H_b → H_b/2   :213-222
- HandshakingKernel: silu(Linear([h_i; h_j]))                       :149-177
- 5 classifiers (2-layer MLPs by default)                           :231-292
- weighted-CE/OHEM losses over the flattened triu sequence          :375-428

TPU-first redesign: ``Linear([h_i; h_j]) = h_i @ W_a + h_j @ W_b + b``, so we
precompute ``A = h @ W_a + b`` and ``Bm = h @ W_b`` once (O(L·H²)) and build
pair features blockwise as ``silu(A[:, i_blk, None] + Bm[:, None, :])`` —
O(L²·H) compute with O(blk·L·H) live memory, never materializing the
(B, L, L, 2H) concat tensor the reference allocates (peneo_decoder.py:163-170).
Each row-block is rematerialized in the backward pass (nn.remat), so training
residuals stay O(L·H).

Labels are dense (B, L, L) int matrices; the loss masks to the upper triangle
of the first ``valid_len`` positions — numerically identical to the
reference's flattened-triu CE when the reference pads to the same length
(collator "max_length" mode, data/collator.py:74-80,156-169).
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import PEneoConfig

HEAD_NAMES = (
    "line_extraction",
    "ent_linking_h2h",
    "ent_linking_t2t",
    "line_grouping_h2h",
    "line_grouping_t2t",
)
HEAD_CLASSES = {
    "line_extraction": 2,
    "ent_linking_h2h": 3,
    "ent_linking_t2t": 3,
    "line_grouping_h2h": 3,
    "line_grouping_t2t": 3,
}


class PairClassifier(nn.Module):
    """MLP classifier over pair features (reference build_classifier,
    model/peneo_decoder.py:231-271). num_layers==1 → single Dense; otherwise
    Dense(mid)→SiLU→Dropout repeated, final Dense(C).

    ``quant_int8`` swaps the hidden layers (the H→H matmuls that dominate
    pair-head FLOPs) for :class:`Int8Dense`; the tiny H→C output layer
    stays full precision."""

    num_classes: int
    num_layers: int
    dropout: float
    init_range: float
    dtype: jnp.dtype = jnp.float32
    quant_int8: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool):
        init = nn.initializers.normal(self.init_range)
        if self.num_layers == 1:
            return nn.Dense(self.num_classes, kernel_init=init, dtype=self.dtype,
                            name="fc_out")(x)
        mid = x.shape[-1]
        from ..ops.quant import dense as qdense

        for i in range(self.num_layers - 1):
            x = qdense(mid, quant=self.quant_int8, kernel_init=init,
                       dtype=self.dtype, name=f"fc_{i}")(x)
            x = jax.nn.silu(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.num_classes, kernel_init=init, dtype=self.dtype,
                        name="fc_out")(x)


class PairBlockBank(nn.Module):
    """One row-block of the pair grid through all 5 heads.

    Inputs: ``a_blk (B, bs, H)`` (rows), ``b_all (B, L, H)`` (columns).
    Output: dict head → logits (B, bs, L, C). Wrapped in nn.remat by the
    decoder so pair features are recomputed in backward.

    Deliberately one independent classifier chain per head: XLA fuses each
    head's silu(a+b) → fc_0 → silu → fc_out into ONE mega-fusion that keeps
    the (bs, L, H) intermediates in registers/VMEM. A measured alternative —
    concatenating the 5 first-layer kernels into one H→5H matmul — was 13%
    SLOWER end-to-end (245.4 → 212.9 pages/s): the concatenated activation
    has 6 consumers, which breaks producer fusion and spills the
    (B, bs, L, 5H) intermediate to HBM. Don't re-fuse.
    """

    cfg: PEneoConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, a_blk, b_all, deterministic: bool):
        cfg = self.cfg
        drop = (cfg.backbone_config or {}).get("hidden_dropout_prob", 0.1)
        # int8 only on deterministic (serving/eval) forwards: the quantized
        # matmul has no useful gradient, and training stays full precision
        quant = (deterministic
                 and getattr(cfg, "quantize_pair_head", None) == "int8")
        pair = jax.nn.silu(a_blk[:, :, None, :] + b_all[:, None, :, :])
        out = {}
        for name in HEAD_NAMES:
            out[name] = PairClassifier(
                HEAD_CLASSES[name],
                cfg.peneo_classifier_num_layers,
                drop,
                cfg.initializer_range,
                self.dtype,
                quant_int8=quant,
                name=f"{name}_fc",
            )(pair, deterministic)
        return out


def dense_labels_from_spots(spots: jnp.ndarray, seq_len: int) -> jnp.ndarray:
    """(B, S, 3) padded spot array → dense (B, seq_len, seq_len) int32 labels.

    Spots are (i, j, tag); padding rows use i = j = seq_len (scattered into a
    sacrificial border that is sliced off), so host→device label traffic is
    a few KB of spots instead of megabytes of dense matrices.
    """
    B, S, _ = spots.shape
    dense = jnp.zeros((B, seq_len + 1, seq_len + 1), jnp.int32)
    b_idx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, S))
    dense = dense.at[b_idx, spots[..., 0], spots[..., 1]].set(spots[..., 2])
    return dense[:, :seq_len, :seq_len]


def triu_valid_mask(row0: int, bs: int, n_cols: int, valid_len: int,
                    col0: int = 0) -> jnp.ndarray:
    """(bs, n_cols) bool: upper-triangular and within the first valid_len.
    ``col0`` offsets the column coordinates (triu-sliced blocks)."""
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (bs, n_cols), 0)
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (bs, n_cols), 1)
    return (rows <= cols) & (rows < valid_len) & (cols < valid_len)


class PEneoDecoder(nn.Module):
    """Pair-extraction head stack.

    Call modes:
    - ``labels`` given  → dict of losses (total + per-head), reference
      semantics (model/peneo_decoder.py:375-428)
    - ``labels`` None   → dict with per-head ``tags`` (argmax class) and
      ``scores`` (max softmax prob), both (B, L, L) — the device half of
      decoding; or full ``logits`` when ``return_logits=True``.
    - ``labels`` + ``also_decode`` → ``(losses, decode_out)`` from ONE pass
      over the pair grid (eval reports losses and KVPE metrics without a
      second backbone/pair-head forward).
    """

    cfg: PEneoConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sequence_output: jnp.ndarray,  # (B, Ld, F) stripped hidden states
        labels: Optional[Dict[str, jnp.ndarray]] = None,  # head → (B, Ld, Ld)
        deterministic: bool = True,
        return_logits: bool = False,
        also_decode: bool = False,
        return_pair_inputs: bool = False,  # expose (a, b) for sp sharding
        label_row_mask: Optional[jnp.ndarray] = None,  # (B,) 1=row in loss
    ):
        cfg = self.cfg
        bc = cfg.backbone_config or {}
        backbone_hidden = bc.get("hidden_size", 768)
        drop_p = bc.get("hidden_dropout_prob", 0.1)
        init = nn.initializers.normal(cfg.initializer_range)
        B, Ld, _ = sequence_output.shape

        h = sequence_output.astype(self.dtype)
        if cfg.peneo_decoder_shrink:
            h = nn.Dense(backbone_hidden, kernel_init=init, dtype=self.dtype,
                         name="shrink_0")(h)
            h = jax.nn.silu(h)
            h = nn.Dropout(drop_p)(h, deterministic=deterministic)
            h = nn.Dense(backbone_hidden // 2, kernel_init=init, dtype=self.dtype,
                         name="shrink_1")(h)
            h = jax.nn.silu(h)
            h = nn.Dropout(drop_p)(h, deterministic=deterministic)
        dec_h = h.shape[-1]

        # handshaking combine split: cat(h_i, h_j) @ W  ==  h_i@W_a + h_j@W_b
        a = nn.Dense(dec_h, kernel_init=init, dtype=self.dtype, name="comb_a")(h)
        b = nn.Dense(dec_h, use_bias=False, kernel_init=init, dtype=self.dtype,
                     name="comb_b")(h)

        if return_pair_inputs:
            # sequence-parallel path (parallel/seq_parallel.py): the caller
            # shards the pair grid's rows over the sp mesh axis and evaluates
            # the heads from stacked weights — return the unpadded combine
            # features straight from the (dp/tp-GSPMD) backbone+shrink stage.
            return {"a": a, "b": b, "valid_len": Ld}

        bs = min(cfg.pair_block_size, max(Ld, 8))
        Lp = ((Ld + bs - 1) // bs) * bs
        if Lp != Ld:
            pad = [(0, 0), (0, Lp - Ld), (0, 0)]
            a = jnp.pad(a, pad)
            b = jnp.pad(b, pad)

        bank = nn.remat(PairBlockBank, static_argnums=(3,))(
            cfg, self.dtype, name="heads")

        if labels is not None:
            weights = jnp.asarray(cfg.peneo_category_weights, dtype=jnp.float32)
            le_weights = weights[:2]
            nums = {name: 0.0 for name in HEAD_NAMES}
            dens = {name: 0.0 for name in HEAD_NAMES}
            ohem = cfg.peneo_ohem_num_positive != -1 or cfg.peneo_ohem_num_negative != -1
            if ohem:
                # Streaming OHEM: fold each block's weighted CE into a
                # running O(k) top-k state instead of concatenating the full
                # (B, Lp, Lp, C) logits ×5 heads — blockwise memory holds.
                from ..ops.losses import (ohem_stream_final, ohem_stream_init,
                                          ohem_stream_update)

                ohem_acc = {name: ohem_stream_init(
                    cfg.peneo_ohem_num_positive, cfg.peneo_ohem_num_negative)
                    for name in HEAD_NAMES}
            lbl = {}
            for name in HEAD_NAMES:
                m = labels[name]
                if m.ndim == 3 and m.shape[-1] == 3:
                    # compact spot array → dense on device (KBs over the wire)
                    m = dense_labels_from_spots(m.astype(jnp.int32), Lp)
                else:
                    m = m.astype(jnp.int32)  # dense int8 on the wire
                    if Lp != Ld:
                        m = jnp.pad(m, [(0, 0), (0, Lp - Ld), (0, Lp - Ld)])
                lbl[name] = m
            dec_tags = {name: [] for name in HEAD_NAMES} if also_decode else None
            dec_scores = {name: [] for name in HEAD_NAMES} if also_decode else None
            dec_stream = (also_decode and cfg.spot_streaming
                          and cfg.max_spots_per_head > 0)
            dec_counts = {name: 0 for name in HEAD_NAMES} if dec_stream else None
            # per-sample loss inclusion: eval pads ragged final batches by
            # repeating rows (pipeline/trainer.py) — masking those rows out
            # of the CE/OHEM sums keeps reported eval losses exact instead of
            # biased by up to one batch's padding fraction
            rowm = (None if label_row_mask is None
                    else (label_row_mask > 0)[:, None, None])
            for r0 in range(0, Lp, bs):
                # triu-only: row block r0 needs columns >= r0 (the lower
                # triangle is masked everywhere downstream) — ~45% less
                # pair-head compute, all shapes still static per block.
                logits_blk = bank(a[:, r0:r0 + bs], b[:, r0:], deterministic)
                mask = triu_valid_mask(r0, bs, Lp - r0, Ld, col0=r0)[None]
                if rowm is not None:
                    mask = mask & rowm
                if also_decode:
                    for name in HEAD_NAMES:
                        p = jax.nn.softmax(
                            logits_blk[name].astype(jnp.float32), axis=-1)
                        t_blk = jnp.argmax(p, axis=-1).astype(jnp.int32)
                        s_blk = jnp.max(p, axis=-1)
                        if dec_stream:
                            cand, cnt = block_spot_candidates(
                                t_blk, s_blk, r0, r0, Ld,
                                cfg.max_spots_per_head, cfg.spot_topk)
                            dec_tags[name].append(cand)
                            dec_counts[name] = dec_counts[name] + cnt
                            continue
                        dec_tags[name].append(
                            jnp.pad(t_blk, [(0, 0), (0, 0), (r0, 0)]))
                        dec_scores[name].append(
                            jnp.pad(s_blk, [(0, 0), (0, 0), (r0, 0)]))
                for name in HEAD_NAMES:
                    w = le_weights if name == "line_extraction" else weights
                    tgt_blk = lbl[name][:, r0:r0 + bs, r0:]
                    if ohem:
                        ohem_acc[name] = ohem_stream_update(
                            ohem_acc[name], logits_blk[name], tgt_blk, w,
                            jnp.broadcast_to(mask, tgt_blk.shape))
                        continue
                    num, den = _ce_sums(logits_blk[name], tgt_blk, w, mask)
                    nums[name] = nums[name] + num
                    dens[name] = dens[name] + den
            losses = {}
            if ohem:
                for name in HEAD_NAMES:
                    losses[name] = ohem_stream_final(ohem_acc[name])
            else:
                for name in HEAD_NAMES:
                    losses[name] = nums[name] / jnp.maximum(dens[name], 1e-12)
            ratios = cfg.peneo_loss_ratio or [1.0] * 5
            losses["total"] = sum(
                r * losses[name] for r, name in zip(ratios, HEAD_NAMES))
            if also_decode:
                out = {}
                for name in HEAD_NAMES:
                    if dec_stream:
                        out[name] = merge_spot_candidates(
                            dec_tags[name], dec_counts[name],
                            cfg.max_spots_per_head, Ld)
                        continue
                    t = jnp.concatenate(dec_tags[name], axis=1)[:, :Ld, :Ld]
                    s = jnp.concatenate(dec_scores[name], axis=1)[:, :Ld, :Ld]
                    if cfg.max_spots_per_head > 0:
                        out[name] = compact_spots(t, s, cfg.max_spots_per_head,
                                                  cfg.spot_topk)
                    else:
                        out[name] = {"tags": t, "scores": s}
                return losses, out
            return losses

        # inference / eval path
        compact_k = cfg.max_spots_per_head
        stream = (cfg.spot_streaming and compact_k > 0 and not return_logits)
        tags = {name: [] for name in HEAD_NAMES}
        scores = {name: [] for name in HEAD_NAMES}
        counts = {name: 0 for name in HEAD_NAMES} if stream else None
        logits_out = {name: [] for name in HEAD_NAMES} if return_logits else None
        for r0 in range(0, Lp, bs):
            logits_blk = bank(a[:, r0:r0 + bs], b[:, r0:], True)
            for name in HEAD_NAMES:
                lg = logits_blk[name].astype(jnp.float32)
                p = jax.nn.softmax(lg, axis=-1)
                t_blk = jnp.argmax(p, axis=-1).astype(jnp.int32)
                s_blk = jnp.max(p, axis=-1)
                if stream:
                    # reduce the block to candidates while it is live in
                    # VMEM — the dense (B, L, L) maps are never written
                    cand, cnt = block_spot_candidates(
                        t_blk, s_blk, r0, r0, Ld, compact_k, cfg.spot_topk)
                    tags[name].append(cand)
                    counts[name] = counts[name] + cnt
                    continue
                # left-pad the skipped lower-triangle columns (never read:
                # decode keeps only i <= j)
                tags[name].append(jnp.pad(t_blk, [(0, 0), (0, 0), (r0, 0)]))
                scores[name].append(jnp.pad(s_blk, [(0, 0), (0, 0), (r0, 0)]))
                if return_logits:
                    logits_out[name].append(jnp.pad(
                        lg, [(0, 0), (0, 0), (r0, 0), (0, 0)]))
        out = {}
        for name in HEAD_NAMES:
            if stream:
                out[name] = merge_spot_candidates(
                    tags[name], counts[name], compact_k, Ld)
                continue
            t = jnp.concatenate(tags[name], axis=1)[:, :Ld, :Ld]
            s = jnp.concatenate(scores[name], axis=1)[:, :Ld, :Ld]
            if compact_k > 0 and not return_logits:
                out[name] = compact_spots(t, s, compact_k, cfg.spot_topk)
            else:
                out[name] = {"tags": t, "scores": s}
            if return_logits:
                out[name]["logits"] = jnp.concatenate(
                    logits_out[name], axis=1)[:, :Ld, :Ld]
        return out


def block_spot_candidates(t_blk: jnp.ndarray, s_blk: jnp.ndarray, row0: int,
                          col0: int, valid_len: int, k: int,
                          method: str = "exact"):
    """One pair-grid row block → its top-k nonzero-triu spot candidates.

    Streaming half of :func:`compact_spots`: the block's (B, bs, W) argmax
    tags / max-prob scores are reduced to at most k candidates *while the
    block is live in VMEM*, so the five dense (B, L, L) tag+score maps are
    never written to HBM (~10·L²·B bytes per batch at f32+i32 — 671 MB/page
    at L=4096). Any global top-k spot is necessarily in its own block's
    top-k, so merging the per-block candidates (:func:`merge_spot_candidates`)
    reproduces the dense top-k set exactly; only the resolution of score
    ties at the k boundary can differ (both are valid top-k cuts, and with
    spot_count ≤ k every nonzero spot survives either way).

    Flat indices use the ``valid_len`` stride so they are interchangeable
    with the dense path's ``i * L + j`` contract (pipeline/decode.py).
    """
    B, bsz, W = t_blk.shape
    valid = triu_valid_mask(row0, bsz, W, valid_len, col0)[None] & (t_blk != 0)
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (bsz, W), 0)
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (bsz, W), 1)
    flat = jnp.where(valid, (rows * valid_len + cols)[None], 0)
    n = bsz * W
    kb = min(k, n)
    sc = jnp.where(valid, s_blk, -1.0).reshape(B, n)
    if method == "approx" and n >= 2 * kb:
        # same partial-reduce op and recall rationale as compact_spots
        top_s, pos = jax.lax.approx_max_k(sc, kb, recall_target=0.99)
    else:
        top_s, pos = jax.lax.top_k(sc, kb)
    return {
        "score": top_s,
        "idx": jnp.take_along_axis(flat.reshape(B, n), pos, axis=1),
        "tag": jnp.take_along_axis(t_blk.reshape(B, n), pos, axis=1),
    }, valid.reshape(B, n).sum(axis=1)


def merge_spot_candidates(cands, count: jnp.ndarray, k: int, valid_len: int):
    """Per-block candidates → the :func:`compact_spots` output contract."""
    sc = jnp.concatenate([c["score"] for c in cands], axis=1)
    idx = jnp.concatenate([c["idx"] for c in cands], axis=1)
    tag = jnp.concatenate([c["tag"] for c in cands], axis=1)
    B, n = sc.shape
    if n < k:  # tiny grids: fewer candidates than slots — pad empties
        sc = jnp.pad(sc, [(0, 0), (0, k - n)], constant_values=-1.0)
        idx = jnp.pad(idx, [(0, 0), (0, k - n)])
        tag = jnp.pad(tag, [(0, 0), (0, k - n)])
        n = k
    top_s, pos = jax.lax.top_k(sc, min(k, n))
    return {
        "spot_idx": jnp.take_along_axis(idx, pos, axis=1).astype(jnp.int32),
        "spot_tag": jnp.take_along_axis(tag, pos, axis=1).astype(jnp.int8),
        "spot_score": top_s,
        "spot_count": count.astype(jnp.int32),
        "seq_len": jnp.full((sc.shape[0],), valid_len, jnp.int32),
    }


def compact_spots(tags: jnp.ndarray, scores: jnp.ndarray, k: int,
                  method: str = "exact"):
    """Dense (B, L, L) argmax maps → top-k nonzero triu spots per sample.

    TPU-native serving design: the dense maps are O(L²) per head per sample
    (~10 MB/page for all five heads) — far too much device→host traffic per
    page; the nonzero spots are what the host parser actually consumes. We
    keep the k highest-scoring nonzero upper-triangular positions on device
    and ship only (idx, tag, score, count); the host restores row-major spot
    order by sorting indices (pipeline/decode.py), preserving the reference's
    first-seen tie semantics. ``count`` flags overflow (k too small — only
    plausible for untrained models). lax.top_k costs ~19 ms/batch at B=32;
    a fixed-size jnp.nonzero alternative was 3× slower end-to-end (cumsum +
    gather compiles poorly on TPU), so top_k stays.
    """
    B, L, _ = tags.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    valid = (rows <= cols)[None] & (tags != 0)
    k = min(k, L * L)
    flat_scores = jnp.where(valid, scores, -1.0).reshape(B, L * L)
    if method == "approx":
        # TPU-native partial reduce (exact-sort fallback on other backends);
        # see config.spot_topk for the recall rationale. (Tried: bf16 sort
        # keys to halve the payload — XLA compile time exploded >10 min for
        # an estimated ~2% win; keep f32 keys.)
        top_scores, top_idx = jax.lax.approx_max_k(
            flat_scores, k, recall_target=0.99)
    else:
        top_scores, top_idx = jax.lax.top_k(flat_scores, k)
    top_tags = jnp.take_along_axis(tags.reshape(B, L * L), top_idx, axis=1)
    count = valid.reshape(B, L * L).sum(axis=1)
    return {
        "spot_idx": top_idx.astype(jnp.int32),      # flat i*L + j
        "spot_tag": top_tags.astype(jnp.int8),
        "spot_score": top_scores,                   # -1 marks empty slots
        "spot_count": count.astype(jnp.int32),
        "seq_len": jnp.full((B,), L, jnp.int32),
    }


def pack_spots(out):
    """Pack the 5 heads' compact-spot dicts into TWO int32 device arrays.

    Serving transport optimization: fetching the raw dict is 25 small
    device→host transfers per batch; on a high-RTT transport (the remote-TPU
    tunnel measures ~5 ms per array) that serializes into ~125 ms/batch of
    fetch. Packed it is 2 transfers. Scores are bitcast (not converted) so
    the unpack (pipeline/decode.unpack_spots) restores float32 exactly.

    Returns (big (5, 3, B, k) int32 = [idx, tag, score-bits],
             small (5, 2, B) int32 = [count, seq_len]).
    """
    big = jnp.stack([
        jnp.stack([
            out[n]["spot_idx"].astype(jnp.int32),
            out[n]["spot_tag"].astype(jnp.int32),
            jax.lax.bitcast_convert_type(
                out[n]["spot_score"].astype(jnp.float32), jnp.int32),
        ], axis=0) for n in HEAD_NAMES], axis=0)
    small = jnp.stack([
        jnp.stack([out[n]["spot_count"].astype(jnp.int32),
                   out[n]["seq_len"].astype(jnp.int32)], axis=0)
        for n in HEAD_NAMES], axis=0)
    return big, small


def _ce_sums(logits, targets, class_weights, mask):
    """Weighted-CE numerator/denominator for one block (torch 'mean' parts).

    Target selection and class-weight lookup use select chains instead of
    gathers — bit-identical, but they fuse into the loss fusion where the
    small-C gathers compiled to their own memory-bound fusions (~4 ms/step
    per head at B=8, L=512 — r3 train profile; ops/losses.py rationale)."""
    from ..ops.losses import _per_element_ce, class_weight_lookup

    ce = _per_element_ce(logits, targets)
    w = class_weight_lookup(class_weights, targets) * mask.astype(jnp.float32)
    return (ce * w).sum(), w.sum()
