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
    "sp_row_layout",
]


def sp_row_layout(valid_len: int, sp: int, block_size: int) -> Tuple[int, int]:
    """(padded row count Lpad, local block size) for an sp-sharded grid.

    Lpad is the smallest multiple of ``8·sp`` covering ``valid_len`` (8 =
    TPU sublane granularity); the local slab Ls = Lpad/sp is looped in the
    largest power-of-two block ≤ ``block_size`` that divides it.
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
    """
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
        tags_parts, score_parts, idx_parts = [], [], []
        for hi in range(N_HEADS):
            tags_parts.append([])
            score_parts.append([])
            idx_parts.append([])
        count = jnp.zeros((B, N_HEADS), jnp.int32)
        for r0 in range(0, ls, bs):
            col0 = (r0 * sp // 128) * 128  # static triu column skip
            ncols = lpad - col0
            pair = jax.nn.silu(a_loc[:, r0:r0 + bs, None, :]
                               + b_all[:, None, col0:, :])
            rows, cols = _block_coords(r0, bs, col0, ncols, sp)
            rows = rows + s
            ok = (rows <= cols) & (rows < valid) & (cols < valid)
            flat = rows * Ld + cols  # global flat index, true-Ld layout
            for hi in range(N_HEADS):
                logits = _head_block(pair.reshape(B, bs * ncols, H),
                                     weights, hi)
                probs = jax.nn.softmax(logits, axis=-1)
                t = jnp.argmax(probs, axis=-1).astype(jnp.int32)
                sc = jnp.max(probs, axis=-1)
                m = (ok[None] & (t.reshape(B, bs, ncols) != 0)).reshape(
                    B, bs * ncols)
                tags_parts[hi].append(jnp.where(m, t, 0))
                score_parts[hi].append(jnp.where(m, sc, -1.0))
                idx_parts[hi].append(
                    jnp.broadcast_to(flat.reshape(1, -1), (B, bs * ncols)))
                count = count.at[:, hi].add(m.sum(axis=1).astype(jnp.int32))

        out = {}
        for hi, name in enumerate(HEAD_NAMES):
            sc = jnp.concatenate(score_parts[hi], axis=1)
            tg = jnp.concatenate(tags_parts[hi], axis=1)
            ix = jnp.concatenate(idx_parts[hi], axis=1)
            kloc = min(kk, sc.shape[1])
            if topk_method == "approx" and jax.default_backend() == "tpu":
                top_sc, top_pos = jax.lax.approx_max_k(
                    sc, kloc, recall_target=0.99)
            else:
                top_sc, top_pos = jax.lax.top_k(sc, kloc)
            top_tg = jnp.take_along_axis(tg, top_pos, axis=1)
            top_ix = jnp.take_along_axis(ix, top_pos, axis=1)
            # merge shards: gather each shard's k candidates, re-top-k.
            # ties re-break by gathered order (shard-major); real score ties
            # at the k boundary only occur for k ≪ true spot count.
            g_sc = jax.lax.all_gather(top_sc, axis, axis=1).reshape(B, -1)
            g_tg = jax.lax.all_gather(top_tg, axis, axis=1).reshape(B, -1)
            g_ix = jax.lax.all_gather(top_ix, axis, axis=1).reshape(B, -1)
            m_sc, m_pos = jax.lax.top_k(g_sc, min(k, g_sc.shape[1]))
            out[name] = {
                "spot_idx": jnp.take_along_axis(
                    g_ix, m_pos, axis=1).astype(jnp.int32),
                "spot_tag": jnp.take_along_axis(
                    g_tg, m_pos, axis=1).astype(jnp.int8),
                "spot_score": m_sc,
                "spot_count": jax.lax.psum(count[:, hi], axis),
                "seq_len": jnp.full((B,), Ld, jnp.int32),
            }
        return out

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
) -> Dict[str, jnp.ndarray]:
    """Row-sharded 5-head weighted-CE losses (reference semantics,
    model/peneo_decoder.py:375-428), sp-parallel.

    Numerically identical to the in-module blockwise path (fp32 CE over the
    same masked positions; the C_PAD -inf bias leaves log_softmax over real
    classes unchanged). Classifier-internal dropout draws from
    ``dropout_rng`` folded per (shard, block, head) — a different stream
    than the flax module path, same distribution. OHEM is not supported on
    the sp path (streaming OHEM state is per-shard; configs shipping OHEM
    train single-shard)."""
    from ..models.decoder import dense_labels_from_spots

    B, Ld, H = a.shape
    valid = Ld if valid_len is None else valid_len
    sp = mesh.shape[axis]
    a_rows, b_cols, perm, lpad, ls, bs = _sharded_layout(a, b, sp,
                                                         block_size)

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
        dense[name] = jnp.take(m, perm, axis=1)

    cw = jnp.asarray(class_weights, jnp.float32)
    weights_by_head = {
        name: (cw[:2] if name == "line_extraction" else cw)
        for name in HEAD_NAMES
    }

    use_dropout = dropout_rng is not None and dropout_p > 0.0
    rng_in = dropout_rng if use_dropout else jax.random.PRNGKey(0)

    def shard_fn(a_loc, b_all, weights, lbl, base_rng):
        s = jax.lax.axis_index(axis)
        nums = {name: 0.0 for name in HEAD_NAMES}
        dens = {name: 0.0 for name in HEAD_NAMES}
        for r0 in range(0, ls, bs):
            col0 = (r0 * sp // 128) * 128
            ncols = lpad - col0

            def block_sums(a_blk, b_slice, wts, tgts, s_idx, rng0,
                           r0=r0, col0=col0, ncols=ncols):
                """One block's weighted-CE sums, all 5 heads → ((5,), (5,)).

                Wrapped in jax.checkpoint below so backward recomputes the
                (B, bs, ncols, H) pair features and per-head activations
                instead of saving them — mirroring the module path's
                nn.remat (models/decoder.py): without it, sp *training*
                residuals are O(L²·H/sp) per chip and the long-context runs
                this path exists for would OOM."""
                pair = jax.nn.silu(a_blk[:, :, None, :]
                                   + b_slice[:, None, :, :])
                rows, cols = _block_coords(r0, bs, col0, ncols, sp)
                rows = rows + s_idx
                ok = ((rows <= cols) & (rows < valid) & (cols < valid))
                ok_flat = ok.reshape(1, bs * ncols).astype(jnp.float32)
                ns, ds = [], []
                for hi, name in enumerate(HEAD_NAMES):
                    rng = None
                    if use_dropout:
                        rng = jax.random.fold_in(
                            jax.random.fold_in(rng0, r0 * N_HEADS + hi),
                            s_idx)
                    logits = _head_block(pair.reshape(B, bs * ncols, H),
                                         wts, hi, rng, dropout_p)
                    tgt = tgts[name].reshape(B, bs * ncols)
                    logp = jax.nn.log_softmax(logits, axis=-1)
                    ce = -jnp.take_along_axis(
                        logp, tgt[..., None], axis=-1)[..., 0]
                    w = weights_by_head[name][tgt] * ok_flat
                    ns.append((ce * w).sum())
                    ds.append(w.sum())
                return jnp.stack(ns), jnp.stack(ds)

            n_vec, d_vec = jax.checkpoint(block_sums)(
                a_loc[:, r0:r0 + bs], b_all[:, col0:], weights,
                {name: lbl[name][:, r0:r0 + bs, col0:]
                 for name in HEAD_NAMES}, s, base_rng)
            for hi, name in enumerate(HEAD_NAMES):
                nums[name] = nums[name] + n_vec[hi]
                dens[name] = dens[name] + d_vec[hi]
        losses = {
            name: jax.lax.psum(nums[name], axis)
            / jnp.maximum(jax.lax.psum(dens[name], axis), 1e-12)
            for name in HEAD_NAMES
        }
        losses["total"] = sum(
            r * losses[name] for r, name in zip(loss_ratio, HEAD_NAMES))
        return losses

    spec_out = {name: P() for name in HEAD_NAMES}
    spec_out["total"] = P()
    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, axis, None), P(), P(),
                  {name: P(None, axis, None) for name in HEAD_NAMES}, P()),
        out_specs=spec_out, axis_names={axis})
    return fn(a_rows, b_cols, head_weights, dense, rng_in)
