"""Sequence parallelism (sp) for the O(L²) pair grid.

The PEneo decoder's pair head scores every upper-triangular token pair —
O(L²·H) FLOPs that dominate at long sequence lengths (the capability
extension SURVEY.md §5 promises over the reference's hard 510-token cap,
data/datasets/rfund.py:243-245). A single chip runs out of time (and, for the
decode maps, memory) as L grows; this module shards the pair grid's *rows*
over a dedicated ``sp`` mesh axis so one page's grid splits across chips:

- **Partial-manual shard_map**: only the ``sp`` axis is manual; ``dp``
  (batch) and ``tp`` (Megatron kernel shards in the backbone) stay under
  automatic GSPMD, so the same jitted program composes dp×tp×sp.
- **Strided row layout**: shard s owns rows ``s, s+sp, s+2·sp, …`` (a gather
  of the row features before the shard_map). Contiguous slabs would give the
  first shard ~2× the triu FLOPs of the last; striding balances every shard
  to within one row. The block loop's triu column skip survives: local block
  ``r0`` covers global rows ≥ ``r0·sp``, so columns ``< r0·sp`` are skipped
  with a *static* slice.
- **Collectives**: loss sums are ``psum('sp')``; inference merges per-shard
  top-k spot candidates with an ``all_gather('sp')`` + re-top-k (k spots per
  shard is a few KB — the pair maps themselves never leave their shard).

Heads are evaluated from stacked weight arrays (ops/pair_head.py's layout:
first layers stacked (5, H, H), second layers padded to C_PAD=4 classes with
a -inf pad bias, which leaves softmax/argmax/log-softmax over the real
classes bit-identical). The reference has no comparable capability — its DDP
replicates the whole grid per GPU (SURVEY.md §2.6).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.decoder import HEAD_NAMES
from ..ops.pair_head import N_HEADS

__all__ = [
    "sp_pair_spots",
    "sp_pair_losses",
    "sp_pair_eval",
    "sp_row_layout",
]


def sp_row_layout(valid_len: int, sp: int, block_size: int) -> Tuple[int, int]:
    """(padded row count Lpad, local block size) for an sp-sharded grid.

    Lpad is the smallest multiple of ``8·sp`` covering ``valid_len`` (8 =
    TPU sublane granularity); the local slab Ls = Lpad/sp is looped in block
    size ``min(block_size, Ls)`` halved until it divides Ls (always a
    divisor of Ls, not necessarily a power of two — e.g. Ls=24,
    block_size=128 → bs=24).
    """
    ls = -(-valid_len // sp)
    ls = ((ls + 7) // 8) * 8
    bs = min(block_size, ls)
    while ls % bs:
        bs //= 2
    return ls * sp, bs


def _strided_perm(lpad: int, sp: int) -> jnp.ndarray:
    """Permutation putting rows s, s+sp, s+2sp… of shard s contiguous."""
    return jnp.arange(lpad).reshape(lpad // sp, sp).T.reshape(-1)


def _pad_rows(x: jnp.ndarray, lpad: int) -> jnp.ndarray:
    if x.shape[1] == lpad:
        return x
    return jnp.pad(x, [(0, 0), (0, lpad - x.shape[1])] +
                   [(0, 0)] * (x.ndim - 2))


def _sharded_layout(a, b, sp: int, block_size: int):
    """Shared row-layout prologue for the spots and losses paths — these MUST
    stay bit-identical (inference spots vs training labels use the same
    strided perm / padding / local block size)."""
    lpad, bs = sp_row_layout(a.shape[1], sp, block_size)
    perm = _strided_perm(lpad, sp)
    a_rows = jnp.take(_pad_rows(a, lpad), perm, axis=1)
    b_cols = _pad_rows(b, lpad)
    return a_rows, b_cols, perm, lpad, lpad // sp, bs


def _head_block(pair, weights, hi, dropout_rng=None, dropout_p=0.0):
    """One head's logits for a pair-feature block: silu(pair@W1+b1)@W2+b2.

    Matches models/decoder.PairClassifier with num_layers=2 (the default;
    reference build_classifier, model/peneo_decoder.py:231-271). C_PAD pad
    classes carry a -inf bias → downstream softmax/log-softmax ignore them.

    A 5-tuple ``weights`` (ops/pair_head.stack_head_weights_int8) runs the
    first matmul s8×s8→s32 with per-row dynamic activation scales — the
    ops/quant.Int8Dense recipe, serving-only (no dropout, no gradient).
    """
    if len(weights) == 5:
        w1q, w1s, b1, w2, b2 = weights
        assert dropout_rng is None or dropout_p == 0.0, \
            "int8 stacked pair head is serving-only"
        xf = pair.astype(jnp.float32)
        x_scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
        xq = jnp.round(xf / jnp.maximum(x_scale, 1e-12)).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, w1q[hi], (((xf.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        x = acc.astype(jnp.float32) * x_scale * w1s[hi]
        x = jax.nn.silu(x + b1[hi].astype(jnp.float32)).astype(pair.dtype)
        logits = jnp.dot(x, w2[hi], preferred_element_type=jnp.float32)
        return logits + b2[hi].astype(jnp.float32)
    w1, b1, w2, b2 = weights
    x = jnp.dot(pair, w1[hi], preferred_element_type=jnp.float32)
    x = jax.nn.silu(x + b1[hi].astype(jnp.float32)).astype(pair.dtype)
    if dropout_rng is not None and dropout_p > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_p, x.shape)
        x = jnp.where(keep, x / (1.0 - dropout_p), 0.0).astype(pair.dtype)
    logits = jnp.dot(x, w2[hi], preferred_element_type=jnp.float32)
    return logits + b2[hi].astype(jnp.float32)


def _block_coords(r0: int, bs: int, col0: int, ncols: int, sp: int):
    """Global (rows, cols) for local block r0 under the strided layout.
    Row offset by axis_index('sp') is added by the caller."""
    li = jax.lax.broadcasted_iota(jnp.int32, (bs, ncols), 0)
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (bs, ncols), 1)
    rows = (r0 + li) * sp  # + shard index at call site
    return rows, cols


def _spot_acc_init(B: int):
    """Per-shard spot-candidate accumulator (python lists while tracing)."""
    return {
        "tags": [[] for _ in range(N_HEADS)],
        "scores": [[] for _ in range(N_HEADS)],
        "idx": [[] for _ in range(N_HEADS)],
        "count": jnp.zeros((B, N_HEADS), jnp.int32),
    }


def _spot_block_update(acc, hi, logits, ok, flat, B, bs, ncols):
    """Fold one (head, block)'s logits into the spot accumulator — the sp
    half of models/decoder.compact_spots (argmax tag, max-prob score)."""
    probs = jax.nn.softmax(logits, axis=-1)
    t = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    sc = jnp.max(probs, axis=-1)
    m = (ok[None] & (t.reshape(B, bs, ncols) != 0)).reshape(B, bs * ncols)
    acc["tags"][hi].append(jnp.where(m, t, 0))
    acc["scores"][hi].append(jnp.where(m, sc, -1.0))
    acc["idx"][hi].append(
        jnp.broadcast_to(flat.reshape(1, -1), (B, bs * ncols)))
    acc["count"] = acc["count"].at[:, hi].add(m.sum(axis=1).astype(jnp.int32))


def _finalize_spots(acc, k, kk, topk_method, axis, Ld, B):
    """Per-shard top-k then cross-shard merge → replicated compact spots."""
    out = {}
    for hi, name in enumerate(HEAD_NAMES):
        sc = jnp.concatenate(acc["scores"][hi], axis=1)
        tg = jnp.concatenate(acc["tags"][hi], axis=1)
        ix = jnp.concatenate(acc["idx"][hi], axis=1)
        kloc = min(kk, sc.shape[1])
        if topk_method == "approx" and jax.default_backend() == "tpu":
            top_sc, top_pos = jax.lax.approx_max_k(
                sc, kloc, recall_target=0.99)
        else:
            top_sc, top_pos = jax.lax.top_k(sc, kloc)
        top_tg = jnp.take_along_axis(tg, top_pos, axis=1)
        top_ix = jnp.take_along_axis(ix, top_pos, axis=1)
        # merge shards: gather each shard's k candidates, then re-select with
        # a (score desc, flat idx asc) lexicographic order — the same tie
        # order as lax.top_k over the single-device row-major flat array, so
        # sp and single-device pick identical spot sets even when score ties
        # straddle the k boundary. (The per-shard kloc cut above can still
        # drop tied candidates in the overflow regime spot_count > k.)
        g_sc = jax.lax.all_gather(top_sc, axis, axis=1).reshape(B, -1)
        g_tg = jax.lax.all_gather(top_tg, axis, axis=1).reshape(B, -1)
        g_ix = jax.lax.all_gather(top_ix, axis, axis=1).reshape(B, -1)
        order = jnp.lexsort((g_ix, -g_sc), axis=-1)
        m_pos = order[:, :min(k, order.shape[1])]
        out[name] = {
            "spot_idx": jnp.take_along_axis(
                g_ix, m_pos, axis=1).astype(jnp.int32),
            "spot_tag": jnp.take_along_axis(
                g_tg, m_pos, axis=1).astype(jnp.int8),
            "spot_score": jnp.take_along_axis(g_sc, m_pos, axis=1),
            "spot_count": jax.lax.psum(acc["count"][:, hi], axis),
            "seq_len": jnp.full((B,), Ld, jnp.int32),
        }
    return out


def sp_pair_spots(
    a: jnp.ndarray,             # (B, Ld, H) combine-A rows (incl. bias)
    b: jnp.ndarray,             # (B, Ld, H) combine-B cols
    head_weights,               # stacked (w1, b1, w2, b2), ops/pair_head.py
    mesh: Mesh,
    k: int,
    valid_len: Optional[int] = None,
    block_size: int = 128,
    topk_method: str = "exact",
    axis: str = "sp",
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Row-sharded pair-grid inference → compact top-k spots per head.

    Output layout is identical to models/decoder.compact_spots (spot_idx /
    spot_tag / spot_score / spot_count / seq_len), replicated over the sp
    axis; the host chain-walk decoder (pipeline/decode.py) consumes it
    unchanged. ``seq_len`` reports the true Ld so flat indices i·Ld+j match
    the single-device path bit-for-bit.
    """
    B, Ld, H = a.shape
    valid = Ld if valid_len is None else valid_len
    sp = mesh.shape[axis]
    a_rows, b_cols, _, lpad, ls, bs = _sharded_layout(a, b, sp, block_size)
    kk = min(k, ls * lpad)  # per-shard candidates; merged k below

    def shard_fn(a_loc, b_all, weights):
        s = jax.lax.axis_index(axis)
        acc = _spot_acc_init(B)
        for r0 in range(0, ls, bs):
            col0 = (r0 * sp // 128) * 128  # static triu column skip
            ncols = lpad - col0
            pair = jax.nn.silu(a_loc[:, r0:r0 + bs, None, :]
                               + b_all[:, None, col0:, :])
            rows, cols = _block_coords(r0, bs, col0, ncols, sp)
            rows = rows + s
            ok = (rows <= cols) & (rows < valid) & (cols < valid)
            flat = rows * Ld + cols  # global flat index, true-Ld layout
            pair_flat = pair.reshape(B, bs * ncols, H)
            for hi in range(N_HEADS):
                logits = _head_block(pair_flat, weights, hi)
                _spot_block_update(acc, hi, logits, ok, flat, B, bs, ncols)
        return _finalize_spots(acc, k, kk, topk_method, axis, Ld, B)

    specs_in = (P(None, axis, None), P(), P())
    spec_out = jax.tree_util.tree_map(lambda _: P(), {
        name: {"spot_idx": 0, "spot_tag": 0, "spot_score": 0,
               "spot_count": 0, "seq_len": 0} for name in HEAD_NAMES})
    # check_vma=False: the final top-k runs on all_gather'ed candidates that
    # are identical on every sp shard, so outputs ARE replicated — but the
    # varying-mesh-axes checker can't prove it through the gather+sort.
    # The jit wrapper is required: eager partial-manual shard_map with
    # check_vma=False mis-canonicalizes out_specs (jax 0.9 quirk); under an
    # outer jit this inlines away.
    fn = jax.shard_map(shard_fn, mesh=mesh, in_specs=specs_in,
                       out_specs=spec_out, axis_names={axis},
                       check_vma=False)
    return jax.jit(fn)(a_rows, b_cols, head_weights)


def sp_pair_losses(
    a: jnp.ndarray,             # (B, Ld, H)
    b: jnp.ndarray,             # (B, Ld, H)
    head_weights,               # stacked (w1, b1, w2, b2)
    labels: Dict[str, jnp.ndarray],  # head → (B, Ld, Ld) int or (B, S, 3) spots
    class_weights,              # (3,) category weights
    loss_ratio,                 # (5,) head loss mix
    mesh: Mesh,
    valid_len: Optional[int] = None,
    block_size: int = 128,
    axis: str = "sp",
    dropout_rng: Optional[jax.Array] = None,
    dropout_p: float = 0.0,
    num_hard_positive: int = -1,
    num_hard_negative: int = -1,
) -> Dict[str, jnp.ndarray]:
    """Row-sharded 5-head weighted-CE/OHEM losses (reference semantics,
    model/peneo_decoder.py:375-428), sp-parallel.

    Numerically identical to the in-module blockwise path (fp32 CE over the
    same masked positions; the C_PAD -inf bias leaves log_softmax over real
    classes unchanged). Classifier-internal dropout draws from
    ``dropout_rng`` folded per (shard, block, head) — a different stream
    than the flax module path, same distribution. OHEM
    (reference model/custom_loss.py:234-288 intended semantics) streams a
    per-shard O(k) top-k state over the local row blocks, then merges it
    across shards (psum counts, all_gather + re-top-k of the best buffers —
    ops/losses.ohem_stream_merge) — identical to the single-device
    streaming OHEM over the whole grid."""
    B, Ld, H = a.shape
    valid = Ld if valid_len is None else valid_len
    sp = mesh.shape[axis]
    a_rows, b_cols, perm, lpad, ls, bs = _sharded_layout(a, b, sp,
                                                         block_size)
    dense = _dense_sharded_labels(labels, perm, lpad, mesh, axis)
    weights_by_head = _weights_by_head(class_weights)
    use_ohem = num_hard_positive != -1 or num_hard_negative != -1

    use_dropout = dropout_rng is not None and dropout_p > 0.0
    rng_in = dropout_rng if use_dropout else jax.random.PRNGKey(0)

    def shard_fn(a_loc, b_all, weights, lbl, base_rng):
        from ..ops.losses import ohem_stream_init

        s = jax.lax.axis_index(axis)
        if use_ohem:
            acc = {name: ohem_stream_init(num_hard_positive,
                                          num_hard_negative)
                   for name in HEAD_NAMES}
        else:
            acc = ({name: 0.0 for name in HEAD_NAMES},
                   {name: 0.0 for name in HEAD_NAMES})
        for r0 in range(0, ls, bs):
            col0 = (r0 * sp // 128) * 128
            ncols = lpad - col0

            def block_fold(carry, a_blk, b_slice, wts, tgts, s_idx, rng0,
                           r0=r0, col0=col0, ncols=ncols):
                """Fold one block's loss contribution into the carry —
                weighted-CE (numerator, denominator) sums, or the streaming
                OHEM top-k state.

                Wrapped in jax.checkpoint below so backward recomputes the
                (B, bs, ncols, H) pair features and per-head activations
                instead of saving them — mirroring the module path's
                nn.remat (models/decoder.py): without it, sp *training*
                residuals are O(L²·H/sp) per chip and the long-context runs
                this path exists for would OOM."""
                from ..ops.losses import ohem_stream_update

                pair = jax.nn.silu(a_blk[:, :, None, :]
                                   + b_slice[:, None, :, :])
                rows, cols = _block_coords(r0, bs, col0, ncols, sp)
                rows = rows + s_idx
                ok = ((rows <= cols) & (rows < valid) & (cols < valid))
                ok_flat = ok.reshape(1, bs * ncols).astype(jnp.float32)
                new_nums, new_dens, new_states = {}, {}, {}
                for hi, name in enumerate(HEAD_NAMES):
                    rng = None
                    if use_dropout:
                        rng = jax.random.fold_in(
                            jax.random.fold_in(rng0, r0 * N_HEADS + hi),
                            s_idx)
                    logits = _head_block(pair.reshape(B, bs * ncols, H),
                                         wts, hi, rng, dropout_p)
                    tgt = tgts[name].reshape(B, bs * ncols)
                    if use_ohem:
                        new_states[name] = ohem_stream_update(
                            carry[name], logits, tgt, weights_by_head[name],
                            jnp.broadcast_to(ok.reshape(1, bs * ncols),
                                             tgt.shape))
                    else:
                        from ..ops.losses import (_per_element_ce,
                                                  class_weight_lookup)

                        ce = _per_element_ce(logits, tgt)
                        w = class_weight_lookup(
                            weights_by_head[name], tgt) * ok_flat
                        new_nums[name] = carry[0][name] + (ce * w).sum()
                        new_dens[name] = carry[1][name] + w.sum()
                if use_ohem:
                    return new_states
                return new_nums, new_dens

            acc = jax.checkpoint(block_fold)(
                acc, a_loc[:, r0:r0 + bs], b_all[:, col0:], weights,
                {name: lbl[name][:, r0:r0 + bs, col0:]
                 for name in HEAD_NAMES}, s, base_rng)
        losses = _finalize_losses(acc, use_ohem, loss_ratio, axis)
        return losses

    spec_out = {name: P() for name in HEAD_NAMES}
    spec_out["total"] = P()
    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, axis, None), P(), P(),
                  {name: P(None, axis, None) for name in HEAD_NAMES}, P()),
        out_specs=spec_out, axis_names={axis},
        # the OHEM merge ends in an all_gather + top_k the varying-axes
        # checker can't prove replicated (same situation as sp_pair_spots);
        # results ARE replicated. jit wrap required for the same jax quirk.
        check_vma=not use_ohem)
    if use_ohem:
        return jax.jit(fn)(a_rows, b_cols, head_weights, dense, rng_in)
    return fn(a_rows, b_cols, head_weights, dense, rng_in)


def _dense_sharded_labels(labels, perm, lpad, mesh, axis):
    """Dense (B, lpad, lpad) int32 label grids, rows permuted to the strided
    sp layout and constrained to row-sharding — without the constraint GSPMD
    can materialize the permuted grids replicated per chip, which at L=4096
    is ~64 MB per head per page (the memory sp exists to split)."""
    from jax.sharding import NamedSharding

    from ..models.decoder import dense_labels_from_spots

    row_sharded = NamedSharding(mesh, P(None, axis, None))
    dense = {}
    for name in HEAD_NAMES:
        m = labels[name]
        if m.ndim == 3 and m.shape[-1] == 3:
            m = dense_labels_from_spots(m.astype(jnp.int32), lpad)
        else:
            m = m.astype(jnp.int32)
            if m.shape[1] < lpad:
                p = lpad - m.shape[1]
                m = jnp.pad(m, [(0, 0), (0, p), (0, p)])
        # shard label rows like the features
        dense[name] = jax.lax.with_sharding_constraint(
            jnp.take(m, perm, axis=1), row_sharded)
    return dense


def _weights_by_head(class_weights):
    cw = jnp.asarray(class_weights, jnp.float32)
    return {name: (cw[:2] if name == "line_extraction" else cw)
            for name in HEAD_NAMES}


def _finalize_losses(acc, use_ohem, loss_ratio, axis):
    """Per-shard loss accumulators → replicated per-head losses + total."""
    from ..ops.losses import ohem_stream_final, ohem_stream_merge

    if use_ohem:
        losses = {name: ohem_stream_final(ohem_stream_merge(acc[name], axis))
                  for name in HEAD_NAMES}
    else:
        nums, dens = acc
        losses = {
            name: jax.lax.psum(nums[name], axis)
            / jnp.maximum(jax.lax.psum(dens[name], axis), 1e-12)
            for name in HEAD_NAMES
        }
    losses["total"] = sum(
        r * losses[name] for r, name in zip(loss_ratio, HEAD_NAMES))
    return losses


def sp_pair_eval(
    a: jnp.ndarray,             # (B, Ld, H)
    b: jnp.ndarray,             # (B, Ld, H)
    head_weights,               # stacked (w1, b1, w2, b2)
    labels: Dict[str, jnp.ndarray],
    class_weights,
    loss_ratio,
    mesh: Mesh,
    k: int,
    valid_len: Optional[int] = None,
    block_size: int = 128,
    topk_method: str = "exact",
    num_hard_positive: int = -1,
    num_hard_negative: int = -1,
    axis: str = "sp",
    row_mask: Optional[jnp.ndarray] = None,  # (B,) 1 = sample in loss sums
):
    """ONE row-sharded pass over the pair grid producing BOTH the compact
    top-k spots and the 5-head losses — the sp twin of the module path's
    ``also_decode`` (models/decoder.py:232-281). Each block's head logits
    are computed once and feed both consumers, halving sp eval grid cost vs
    running sp_pair_spots + sp_pair_losses back to back.

    ``row_mask`` excludes edge-padded duplicate samples (the trainer's
    ragged final eval batch) from the CE/OHEM sums, mirroring the module
    path's ``label_row_mask``; spots are still produced for every sample
    (the host decoder discards padded rows itself).

    Returns ``(spots_out, losses)`` with layouts identical to those two
    functions. Eval has no grad, so blocks are not checkpointed."""
    B, Ld, H = a.shape
    valid = Ld if valid_len is None else valid_len
    sp = mesh.shape[axis]
    a_rows, b_cols, perm, lpad, ls, bs = _sharded_layout(a, b, sp,
                                                         block_size)
    kk = min(k, ls * lpad)
    dense = _dense_sharded_labels(labels, perm, lpad, mesh, axis)
    weights_by_head = _weights_by_head(class_weights)
    use_ohem = num_hard_positive != -1 or num_hard_negative != -1
    rowm_in = (jnp.ones((B,), jnp.float32) if row_mask is None
               else row_mask.astype(jnp.float32))

    def shard_fn(a_loc, b_all, weights, lbl, rowm):
        from ..ops.losses import ohem_stream_init, ohem_stream_update

        s = jax.lax.axis_index(axis)
        spot_acc = _spot_acc_init(B)
        if use_ohem:
            loss_acc = {name: ohem_stream_init(num_hard_positive,
                                               num_hard_negative)
                        for name in HEAD_NAMES}
        else:
            loss_acc = ({name: 0.0 for name in HEAD_NAMES},
                        {name: 0.0 for name in HEAD_NAMES})
        for r0 in range(0, ls, bs):
            col0 = (r0 * sp // 128) * 128
            ncols = lpad - col0
            pair = jax.nn.silu(a_loc[:, r0:r0 + bs, None, :]
                               + b_all[:, None, col0:, :])
            rows, cols = _block_coords(r0, bs, col0, ncols, sp)
            rows = rows + s
            ok = (rows <= cols) & (rows < valid) & (cols < valid)
            flat = rows * Ld + cols
            # loss mask includes the per-sample row mask; the spot update
            # keeps the sample-agnostic ok (decode drops padded rows host-side)
            okm = ok.reshape(1, bs * ncols) & (rowm > 0)[:, None]
            okm_flat = okm.astype(jnp.float32)
            pair_flat = pair.reshape(B, bs * ncols, H)
            for hi, name in enumerate(HEAD_NAMES):
                logits = _head_block(pair_flat, weights, hi)
                _spot_block_update(spot_acc, hi, logits, ok, flat,
                                   B, bs, ncols)
                tgt = lbl[name][:, r0:r0 + bs, col0:].reshape(B, bs * ncols)
                if use_ohem:
                    loss_acc[name] = ohem_stream_update(
                        loss_acc[name], logits, tgt, weights_by_head[name],
                        jnp.broadcast_to(okm, tgt.shape))
                else:
                    from ..ops.losses import (_per_element_ce,
                                              class_weight_lookup)

                    ce = _per_element_ce(logits, tgt)
                    w = class_weight_lookup(
                        weights_by_head[name], tgt) * okm_flat
                    loss_acc[0][name] = loss_acc[0][name] + (ce * w).sum()
                    loss_acc[1][name] = loss_acc[1][name] + w.sum()
        spots_out = _finalize_spots(spot_acc, k, kk, topk_method, axis,
                                    Ld, B)
        losses = _finalize_losses(loss_acc, use_ohem, loss_ratio, axis)
        return spots_out, losses

    spot_spec = jax.tree_util.tree_map(lambda _: P(), {
        name: {"spot_idx": 0, "spot_tag": 0, "spot_score": 0,
               "spot_count": 0, "seq_len": 0} for name in HEAD_NAMES})
    loss_spec = {name: P() for name in HEAD_NAMES}
    loss_spec["total"] = P()
    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, axis, None), P(), P(),
                  {name: P(None, axis, None) for name in HEAD_NAMES}, P()),
        out_specs=(spot_spec, loss_spec), axis_names={axis},
        check_vma=False)  # see sp_pair_spots note; jit wrap required
    return jax.jit(fn)(a_rows, b_cols, head_weights, dense, rowm_in)
