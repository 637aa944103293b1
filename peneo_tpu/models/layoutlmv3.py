"""LayoutLMv3 backbone in flax.linen — single-stream transformer over
[text tokens ‖ CLS_img ‖ image patches] with T5-style 1D + 2D relative
attention biases.

TPU-first re-design of the reference's vendored model
(model/backbone/layoutlmv3/modeling_layoutlmv3.py). Key changes:

- The reference computes the relative biases via one-hot → Linear matmuls of
  a (B, L', L', 32/64) tensor every forward (modeling_layoutlmv3.py:639-642,
  665-672); we gather directly from the (bins, heads) tables —
  mathematically identical (one_hot(i) @ W == W[i]) with zero FLOPs and no
  giant one-hot intermediate.
- CogView PB-Relax softmax (:308-321) equals a standard max-subtracted
  softmax algebraically ((s/α − max(s/α))·α = s − max(s)), so we use
  jax.nn.softmax; fp32 score accumulation covers the stability concern.
- Biases are computed once per forward and shared by all layers, same as the
  reference encoder (:704-713).

I/O contract (:934-1164): inputs ``input_ids (B, L)``, ``bbox (B, L, 4)`` in
[0, 1000], ``attention_mask (B, L)``, optional ``image (B, 3, S, S)``
(torch CHW convention, preprocessed by data/image_processing.py). The visual
attention mask is auto-appended (:1072-1080). Output hidden covers text +
1 + (S/16)² positions; PEneoModel strips the visual tail and CLS.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import LayoutLMv3Config
from .lilt import (ACT, dense_init, embed_init, extended_attention_mask,
                   make_position_ids)


def relative_position_bucket(rel_pos: jnp.ndarray, num_buckets: int,
                             max_distance: int) -> jnp.ndarray:
    """Bidirectional T5 log-bucketing (modeling_layoutlmv3.py:586-613)."""
    num_buckets //= 2
    ret = (rel_pos > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    n_safe = jnp.maximum(n, 1).astype(jnp.float32)
    val_if_large = max_exact + (
        jnp.log(n_safe / max_exact) / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


def static_rel_pos_bucket(seq_len: int, n_vis: int, num_buckets: int,
                          max_distance: int):
    """Trace-time twin of the 1D rel-pos bucket matrix.

    The 1D relative positions are plain ``arange`` ramps in both the
    text-only and image branches (modeling_layoutlmv3.py:1101-1107 — NOT the
    pad-aware embedding ids), so the (L', L') bucket matrix depends only on
    the static shapes: build it ONCE in numpy at trace time and bake it as a
    constant instead of re-deriving it on device every forward (abs/log/div/
    select over B·L'² elements per call). Integer-equality with the traced
    :func:`relative_position_bucket` is asserted in
    tests/test_rel_bucket_static.py.
    """
    import numpy as np

    pos = np.arange(seq_len, dtype=np.int64)
    if n_vis:
        pos = np.concatenate([pos, np.arange(n_vis, dtype=np.int64)])
    rel = pos[None, :] - pos[:, None]
    num_buckets //= 2
    ret = (rel > 0).astype(np.int32) * num_buckets
    n = np.abs(rel)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    n_safe = np.maximum(n, 1).astype(np.float32)
    val_if_large = max_exact + (
        np.log(n_safe / np.float32(max_exact))
        / np.float32(math.log(max_distance / max_exact))
        * (num_buckets - max_exact)
    ).astype(np.int32)
    val_if_large = np.minimum(val_if_large, num_buckets - 1)
    return jnp.asarray(ret + np.where(is_small, n, val_if_large), jnp.int32)


def visual_bbox(img_grid: int, max_len: int = 1000) -> jnp.ndarray:
    """Patch-grid pseudo-bboxes + cls box (modeling_layoutlmv3.py:879-901)."""
    edges = (jnp.arange(0, max_len * (img_grid + 1), max_len) // img_grid)
    x0, y0 = jnp.meshgrid(edges[:-1], edges[:-1], indexing="xy")
    x1, y1 = jnp.meshgrid(edges[1:], edges[1:], indexing="xy")
    grid = jnp.stack([x0, y0, x1, y1], axis=-1).reshape(-1, 4)
    cls_box = jnp.array([[1, 1, max_len - 1, max_len - 1]])
    return jnp.concatenate([cls_box, grid], axis=0).astype(jnp.int32)


class LayoutLMv3Embeddings(nn.Module):
    cfg: LayoutLMv3Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, bbox, deterministic: bool):
        cfg = self.cfg
        init = dense_init(cfg)
        # Embeds gather fp32 rows and cast only the gathered output: a
        # bf16-dtype Embed converts the WHOLE table before gathering (~1.1 GB
        # of HBM traffic per forward on the 250k-row XLM vocab; see the same
        # fix in lilt.py).
        words = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                         embedding_init=embed_init(cfg, cfg.pad_token_id),
                         name="word_embeddings")(input_ids)
        tok_type = nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                            embedding_init=init,
                            name="token_type_embeddings")(jnp.zeros_like(input_ids))
        pos_ids = make_position_ids(input_ids, cfg.pad_token_id)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       embedding_init=embed_init(cfg, cfg.pad_token_id),
                       name="position_embeddings")(pos_ids)

        x_emb = nn.Embed(cfg.max_2d_position_embeddings, cfg.coordinate_size,
                         embedding_init=init,
                         name="x_position_embeddings")
        y_emb = nn.Embed(cfg.max_2d_position_embeddings, cfg.coordinate_size,
                         embedding_init=init,
                         name="y_position_embeddings")
        h_emb = nn.Embed(cfg.max_2d_position_embeddings, cfg.shape_size,
                         embedding_init=init,
                         name="h_position_embeddings")
        w_emb = nn.Embed(cfg.max_2d_position_embeddings, cfg.shape_size,
                         embedding_init=init,
                         name="w_position_embeddings")
        spatial = jnp.concatenate([
            x_emb(bbox[:, :, 0]),
            y_emb(bbox[:, :, 1]),
            x_emb(bbox[:, :, 2]),
            y_emb(bbox[:, :, 3]),
            h_emb(jnp.clip(bbox[:, :, 3] - bbox[:, :, 1], 0, 1023)),
            w_emb(jnp.clip(bbox[:, :, 2] - bbox[:, :, 0], 0, 1023)),
        ], axis=-1)

        x = words + tok_type + pos + spatial
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                         name="LayerNorm")(x)
        x = x.astype(self.dtype)
        return nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic=deterministic)


class Layer(nn.Module):
    """Pre-computed-bias transformer layer (attention + MLP, post-LN)."""

    cfg: LayoutLMv3Config
    dtype: jnp.dtype = jnp.float32
    int8_dense: bool = False  # serving-only int8 matmuls (ops/quant)
    # fused rel-bias attention kernel (ops/bias_attention). The inference
    # kernel has no VJP, so maybe_fused_ctx refuses any non-deterministic
    # forward; training forwards instead go through fused_attention_train
    # (custom-VJP pair, in-kernel hardware-PRNG dropout, dbias = dS flows
    # into the bias tables). Both gates pad L to the next multiple of 64
    # (v3 serving lengths are L_text + 197 image tokens) and fall back to
    # the XLA path when the pad fraction would exceed ~10%
    fused_attention: bool = False
    mesh: Optional[object] = None  # (dp, tp[, sp]) mesh → shard_map dispatch
    fused_attention_train: bool = False

    @nn.compact
    def __call__(self, x, attn_bias, rel_bias, deterministic: bool):
        cfg = self.cfg
        init = dense_init(cfg)
        nh = cfg.num_attention_heads
        dh = cfg.hidden_size // nh
        from ..ops.quant import dense as qdense

        quant = self.int8_dense and deterministic

        def proj(v, name):
            y = qdense(cfg.hidden_size, quant=quant, kernel_init=init,
                       dtype=self.dtype, name=name)(v)
            return y.reshape(y.shape[0], y.shape[1], nh, dh)

        q = proj(x, "query")
        k = proj(x, "key")
        v = proj(x, "value")
        ctx = None
        if self.fused_attention and deterministic:
            # scores/softmax/p·v fused in VMEM — the (B, nh, L, L) score and
            # prob tensors never round-trip HBM (ops/bias_attention)
            from ..ops.bias_attention import maybe_fused_ctx

            ctx = maybe_fused_ctx(
                q, k, v, rel_bias, attn_bias, 1.0 / math.sqrt(dh),
                deterministic=deterministic,
                dropout_p=cfg.attention_probs_dropout_prob, mesh=self.mesh)
        elif self.fused_attention_train and not deterministic:
            # differentiable fused kernel (custom VJP); the dropout mask is
            # drawn by the TPU hardware PRNG inside the kernels and the
            # trained rel-bias gets its gradient from the backward's dbias
            from ..ops.bias_attention import maybe_fused_ctx_train

            rate = float(cfg.attention_probs_dropout_prob)
            if rate > 0.0 and jax.default_backend() == "tpu":
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0,
                    jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
            else:
                seed = jnp.zeros((1,), jnp.int32)
            ctx = maybe_fused_ctx_train(
                q, k, v, rel_bias, attn_bias, 1.0 / math.sqrt(dh),
                rate=rate, seed=seed, mesh=self.mesh)
        if ctx is None:
            scores = jnp.einsum(
                "blhd,bmhd->bhlm", q, k,
                preferred_element_type=jnp.float32) / math.sqrt(dh)
            if rel_bias is not None:
                scores = scores + rel_bias  # already /√d (:370-373)
            scores = scores + attn_bias.astype(jnp.float32)
            probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
            probs = nn.Dropout(cfg.attention_probs_dropout_prob)(
                probs, deterministic=deterministic)
            ctx = jnp.einsum("bhlm,bmhd->blhd", probs, v)
            ctx = ctx.reshape(x.shape[0], x.shape[1], cfg.hidden_size)

        ctx = qdense(cfg.hidden_size, quant=quant, kernel_init=init,
                     dtype=self.dtype, name="attention_output_dense")(ctx)
        ctx = nn.Dropout(cfg.hidden_dropout_prob)(ctx, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="attention_output_LayerNorm")(ctx + x)

        h = qdense(cfg.intermediate_size, quant=quant, kernel_init=init,
                   dtype=self.dtype, name="intermediate")(x)
        h = ACT[cfg.hidden_act](h)
        h = qdense(cfg.hidden_size, quant=quant, kernel_init=init,
                   dtype=self.dtype, name="output_dense")(h)
        h = nn.Dropout(cfg.hidden_dropout_prob)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="output_LayerNorm")(h + x)


class LayoutLMv3Model(nn.Module):
    cfg: LayoutLMv3Config
    dtype: jnp.dtype = jnp.float32
    remat_layers: bool = False
    int8_dense: bool = False  # serving-only int8 matmuls (ops/quant)
    fused_attention: bool = False  # fused rel-bias attention (inference)
    mesh: Optional[object] = None
    fused_attention_train: bool = False  # custom-VJP kernel for training

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        bbox: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        image: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        cfg = self.cfg
        init = dense_init(cfg)
        B, L = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)

        x = LayoutLMv3Embeddings(cfg, self.dtype, name="embeddings")(
            input_ids, bbox, deterministic)

        if image is not None:
            grid = cfg.input_size // cfg.patch_size
            n_vis = grid * grid + 1
            img = image.astype(self.dtype).transpose(0, 2, 3, 1)  # NCHW→NHWC
            patches = nn.Conv(
                cfg.hidden_size,
                kernel_size=(cfg.patch_size, cfg.patch_size),
                strides=(cfg.patch_size, cfg.patch_size),
                kernel_init=init, dtype=self.dtype, name="patch_proj")(img)
            patches = patches.reshape(B, grid * grid, cfg.hidden_size)
            cls_tok = self.param("cls_token", nn.initializers.zeros,
                                 (1, 1, cfg.hidden_size))
            pos_embed = self.param("pos_embed", nn.initializers.zeros,
                                   (1, n_vis, cfg.hidden_size))
            vis = jnp.concatenate(
                [jnp.broadcast_to(cls_tok, (B, 1, cfg.hidden_size)).astype(self.dtype),
                 patches], axis=1)
            vis = vis + pos_embed.astype(self.dtype)
            vis = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="visual_norm")(vis)

            x = jnp.concatenate([x, vis], axis=1)
            # extra LN + dropout over the concatenated stream (:1113-1114)
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                             name="post_concat_LayerNorm")(x)
            x = nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic=deterministic)

            attention_mask = jnp.concatenate(
                [attention_mask, jnp.ones((B, n_vis), attention_mask.dtype)], axis=1)
            # bias positions are plain aranges when an image is present
            # (:1101-1107 — NOT the pad-aware embedding ids): built statically
            # inside static_rel_pos_bucket below
            vis_box = jnp.broadcast_to(visual_bbox(grid)[None], (B, n_vis, 4))
            final_bbox = jnp.concatenate([bbox, vis_box], axis=1)
        else:
            final_bbox = bbox

        attn_bias = extended_attention_mask(attention_mask, jnp.float32)

        rel_bias = None
        if cfg.has_relative_attention_bias or cfg.has_spatial_attention_bias:
            dh = cfg.hidden_size // cfg.num_attention_heads
            parts = []
            if cfg.has_relative_attention_bias:
                table = self.param("rel_pos_bias", dense_init(cfg),
                                   (cfg.rel_pos_bins, cfg.num_attention_heads))
                # static per trace (position-only): the (L', L') bucket
                # matrix is a numpy constant at trace time — skips the
                # per-forward B·L'² on-device bucketing math (abs/log/div/
                # select) and compiles ~1.6× faster. The gather itself must
                # stay batch-shaped: gathering once into (1, L', L', heads)
                # measured +5.5% at L=512 B=16 but OOMs at B=32 / L=2048 B=4
                # (15.56G program vs 10.83G — XLA materializes the broadcast
                # fp32 bias instead of fusing the gather into its consumers;
                # AOT-probed via tools/probe_hbm.py, docs §8), so the batched
                # gather is the keeper: memory-identical to the dynamic path.
                bucket = static_rel_pos_bucket(
                    L, n_vis if image is not None else 0,
                    cfg.rel_pos_bins, cfg.max_rel_pos)
                parts.append(table[jnp.broadcast_to(
                    bucket[None], (B,) + bucket.shape)])  # (B, L', L', heads)
            if cfg.has_spatial_attention_bias:
                tx = self.param("rel_pos_x_bias", dense_init(cfg),
                                (cfg.rel_2d_pos_bins, cfg.num_attention_heads))
                ty = self.param("rel_pos_y_bias", dense_init(cfg),
                                (cfg.rel_2d_pos_bins, cfg.num_attention_heads))
                cx = final_bbox[:, :, 0]
                cy = final_bbox[:, :, 3]
                bx = relative_position_bucket(cx[:, None, :] - cx[:, :, None],
                                              cfg.rel_2d_pos_bins,
                                              cfg.max_rel_2d_pos)
                by = relative_position_bucket(cy[:, None, :] - cy[:, :, None],
                                              cfg.rel_2d_pos_bins,
                                              cfg.max_rel_2d_pos)
                parts.append(tx[bx] + ty[by])
            rel_bias = sum(parts).transpose(0, 3, 1, 2).astype(jnp.float32) \
                / math.sqrt(dh)

        layer_cls = (nn.remat(Layer, static_argnums=(4,))
                     if self.remat_layers else Layer)
        for i in range(cfg.num_hidden_layers):
            x = layer_cls(cfg, self.dtype, self.int8_dense,
                          self.fused_attention, self.mesh,
                          fused_attention_train=self.fused_attention_train,
                          name=f"layer_{i}")(
                x, attn_bias, rel_bias, deterministic)

        return {"last_hidden_state": x}
