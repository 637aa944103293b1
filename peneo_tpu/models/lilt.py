"""LiLT backbone in flax.linen — dual-stream (text + layout) transformer.

TPU-first re-design of the reference's vendored LiLT
(reference: model/backbone/lilt/modeling_lilt.py). Key observations exploited:

- BiACM score coupling (modeling_lilt.py:370-375): the reference computes
  ``text_final = s_t/√d + s_l/√(d/r)`` and ``layout_final = s_l/√(d/r) +
  s_t/√d`` — the two matrices are IDENTICAL, so both streams share one score
  tensor and one softmax. We compute it once (halves the softmax/mask work);
  the two streams still draw independent attention-dropout masks.
- The text stream width H and layout stream width H/r (r=4 ⇒ 192) are both
  MXU-friendly; all matmuls run in the configured compute dtype (bf16 on TPU)
  with fp32 params.

Numerics parity (fp32 vs fp32) is tested against the reference torch model in
tests/test_model_parity.py.

I/O contract (modeling_lilt.py:855-997): inputs ``input_ids (B, L)``, ``bbox
(B, L, 4)`` in [0,1000], ``attention_mask (B, L)``; returns dict with
``last_hidden_state = concat(semantic, layout) (B, L, H + H/r)`` plus the two
streams.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import LiltConfig

ACT = {
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
}


def dense_init(cfg):
    return nn.initializers.normal(cfg.initializer_range)


def embed_init(cfg, pad_idx=None):
    """normal(initializer_range) with the padding row zeroed, matching the
    reference _init_weights for nn.Embedding(padding_idx=...) (reference:
    model/modeling_peneo.py:25-28). Only affects train-from-scratch; converted
    checkpoints overwrite the init."""
    base = nn.initializers.normal(cfg.initializer_range)
    if pad_idx is None:
        return base

    def init(key, shape, dtype=jnp.float32):
        emb = base(key, shape, dtype)
        return emb.at[pad_idx].set(0.0)

    return init


def make_position_ids(input_ids: jnp.ndarray, pad_token_id: int) -> jnp.ndarray:
    """RoBERTa-style pad-aware position ids: cumsum over non-pad, offset by
    pad id (reference: modeling_lilt.py:1000-1015)."""
    mask = (input_ids != pad_token_id).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + pad_token_id


def extended_attention_mask(attention_mask: jnp.ndarray, dtype) -> jnp.ndarray:
    """(B, L) {0,1} → (B, 1, 1, L) additive bias with large negative on pads."""
    neg = jnp.asarray(jnp.finfo(jnp.float32).min / 2, dtype=jnp.float32)
    bias = (1.0 - attention_mask.astype(jnp.float32)) * neg
    return bias[:, None, None, :].astype(dtype)


class LiltTextEmbeddings(nn.Module):
    cfg: LiltConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, position_ids, deterministic: bool):
        cfg = self.cfg
        init = dense_init(cfg)
        # Embeds gather in fp32 (the params' dtype) and the sum+LN stays
        # fp32, casting only the (B, L, H) output: an Embed with
        # dtype=bfloat16 makes XLA convert the ENTIRE table before the
        # gather — for the 250k-row vocab that is ~1.1 GB of HBM traffic
        # per forward (profiled: convert_element_type on [250002,768]).
        words = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                         embedding_init=embed_init(cfg, cfg.pad_token_id),
                         name="word_embeddings")(input_ids)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       embedding_init=embed_init(cfg, cfg.pad_token_id),
                       name="position_embeddings")(position_ids)
        # token_type_ids are always zeros in the PEneo pipeline
        tok_type = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, embedding_init=init,
                            name="token_type_embeddings")(
            jnp.zeros_like(input_ids))
        x = words + tok_type + pos
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="LayerNorm")(x)
        x = x.astype(self.dtype)
        x = nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic=deterministic)
        return x


class LiltLayoutEmbeddings(nn.Module):
    """Layout stream input: x/y/h/w bucket embeddings of the [0,1000] bbox,
    concat → linear → + box position embedding → LN (modeling_lilt.py:133-210)."""

    cfg: LiltConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, bbox, position_ids, deterministic: bool):
        cfg = self.cfg
        init = dense_init(cfg)
        sixth = cfg.hidden_size // 6
        lay_h = cfg.hidden_size // cfg.channel_shrink_ratio
        x_emb = nn.Embed(cfg.max_2d_position_embeddings, sixth, embedding_init=init,
                         dtype=self.dtype, name="x_position_embeddings")
        y_emb = nn.Embed(cfg.max_2d_position_embeddings, sixth, embedding_init=init,
                         dtype=self.dtype, name="y_position_embeddings")
        h_emb = nn.Embed(cfg.max_2d_position_embeddings, sixth, embedding_init=init,
                         dtype=self.dtype, name="h_position_embeddings")
        w_emb = nn.Embed(cfg.max_2d_position_embeddings, sixth, embedding_init=init,
                         dtype=self.dtype, name="w_position_embeddings")
        spatial = jnp.concatenate(
            [
                x_emb(bbox[:, :, 0]),
                y_emb(bbox[:, :, 1]),
                x_emb(bbox[:, :, 2]),
                y_emb(bbox[:, :, 3]),
                h_emb(bbox[:, :, 3] - bbox[:, :, 1]),
                w_emb(bbox[:, :, 2] - bbox[:, :, 0]),
            ],
            axis=-1,
        )
        spatial = nn.Dense(lay_h, kernel_init=init, dtype=self.dtype,
                           name="box_linear_embeddings")(spatial)
        box_pos = nn.Embed(cfg.max_position_embeddings, lay_h,
                           embedding_init=embed_init(cfg, cfg.pad_token_id),
                           dtype=self.dtype, name="box_position_embeddings")(position_ids)
        out = spatial + box_pos
        out = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="LayerNorm")(out)
        out = nn.Dropout(cfg.hidden_dropout_prob)(out, deterministic=deterministic)
        return out


class LiltSelfAttention(nn.Module):
    """Dual-stream attention with BiACM score sharing (modeling_lilt.py:328-425).

    Because both streams use the IDENTICAL coupled score matrix, the whole op
    is one standard attention over concatenated per-head features: q/k/v of
    the text (d=64) and layout (d=16) streams concat to head_dim 80 with the
    per-stream 1/√d folded into q. The ``flash`` path runs this through the
    Pallas TPU flash-attention kernel (online softmax, no (B, h, L, L) probs
    in HBM); padding is masked via segment ids. Flash is used only when
    attention dropout is inactive (the kernel has none).
    """

    cfg: LiltConfig
    dtype: jnp.dtype = jnp.float32
    flash: bool = False
    fused_biacm: bool = False
    fused_biacm_train: bool = False
    # a (dp, tp[, sp]) jax.sharding.Mesh routes the fused kernels through
    # shard_map (GSPMD cannot partition a pallas_call); None = single-device
    mesh: Optional[object] = None
    int8_dense: bool = False  # serving-only s8×s8→s32 projections (ops/quant)

    @nn.compact
    def __call__(self, text, layout, attn_bias, seg_mask, deterministic: bool):
        cfg = self.cfg
        init = dense_init(cfg)
        nh = cfg.num_attention_heads
        dh = cfg.hidden_size // nh
        r = cfg.channel_shrink_ratio
        dh_l = dh // r
        B, L = text.shape[:2]
        from ..ops.quant import dense as qdense

        quant = self.int8_dense and deterministic

        def proj(x, feats, name):
            y = qdense(feats, quant=quant, kernel_init=init,
                       dtype=self.dtype, name=name)(x)
            return y.reshape(y.shape[0], y.shape[1], nh, feats // nh)

        q_t = proj(text, cfg.hidden_size, "query")
        k_t = proj(text, cfg.hidden_size, "key")
        v_t = proj(text, cfg.hidden_size, "value")
        q_l = proj(layout, cfg.hidden_size // r, "layout_query")
        k_l = proj(layout, cfg.hidden_size // r, "layout_key")
        v_l = proj(layout, cfg.hidden_size // r, "layout_value")

        no_attn_dropout = (deterministic
                           or cfg.attention_probs_dropout_prob == 0.0)
        rate = 0.0 if deterministic else float(cfg.attention_probs_dropout_prob)
        if (self.fused_biacm_train and not deterministic and L % 128 == 0
                and (rate == 0.0 or jax.default_backend() == "tpu")):
            # differentiable fused kernel (custom VJP); dropout masks are
            # drawn by the TPU hardware PRNG inside the kernels, so the
            # (B, nh, L, L) prob/mask tensors never exist in HBM. CPU runs
            # only reach here with rate==0 (no hardware PRNG off-TPU).
            from ..ops import biacm_attention as ba

            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0,
                    jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
            else:
                seed = jnp.zeros((1,), jnp.int32)
            args = (
                q_t.transpose(0, 2, 1, 3), k_t.transpose(0, 2, 1, 3),
                v_t.transpose(0, 2, 1, 3), q_l.transpose(0, 2, 1, 3),
                k_l.transpose(0, 2, 1, 3), v_l.transpose(0, 2, 1, 3),
                attn_bias[:, 0, 0, :].astype(jnp.float32), seed,
                1.0 / float(dh) ** 0.5, 1.0 / float(dh_l) ** 0.5)
            interp = jax.default_backend() == "cpu"
            if self.mesh is not None and ba._dp_tp(self.mesh) > 1:
                ctx_t, ctx_l = ba.biacm_attention_train_sharded(
                    *args, mesh=self.mesh, rate=rate, interpret=interp)
            else:
                ctx_t, ctx_l = ba.biacm_attention_train(
                    *args, rate=rate, interpret=interp)
            return (ctx_t.transpose(0, 2, 1, 3).reshape(B, L, nh * dh),
                    ctx_l.transpose(0, 2, 1, 3).reshape(B, L, nh * dh_l))

        if self.fused_biacm and no_attn_dropout and L % 128 == 0:
            # dim-80-aware fused kernel: separate d=64/d=16 score matmuls +
            # shared softmax, no (L, L) HBM roundtrip (ops/biacm_attention)
            from ..ops import biacm_attention as ba

            args = (
                q_t.transpose(0, 2, 1, 3), k_t.transpose(0, 2, 1, 3),
                v_t.transpose(0, 2, 1, 3), q_l.transpose(0, 2, 1, 3),
                k_l.transpose(0, 2, 1, 3), v_l.transpose(0, 2, 1, 3),
                attn_bias[:, 0, 0, :].astype(jnp.float32),
                1.0 / float(dh) ** 0.5, 1.0 / float(dh_l) ** 0.5)
            interp = jax.default_backend() == "cpu"
            if self.mesh is not None and ba._dp_tp(self.mesh) > 1:
                ctx_t, ctx_l = ba.biacm_attention_sharded(
                    *args, mesh=self.mesh, interpret=interp)
            else:
                ctx_t, ctx_l = ba.biacm_attention(*args, interpret=interp)
            return (ctx_t.transpose(0, 2, 1, 3).reshape(B, L, nh * dh),
                    ctx_l.transpose(0, 2, 1, 3).reshape(B, L, nh * dh_l))

        use_flash = self.flash and no_attn_dropout
        if use_flash:
            from jax.experimental.pallas.ops.tpu import flash_attention as fa

            scale_t = 1.0 / float(dh) ** 0.5
            scale_l = 1.0 / float(dh_l) ** 0.5
            q = jnp.concatenate([q_t * scale_t, q_l * scale_l], axis=-1)
            k = jnp.concatenate([k_t, k_l], axis=-1)
            v = jnp.concatenate([v_t, v_l], axis=-1)
            seg = fa.SegmentIds(seg_mask, seg_mask)
            ctx = fa.flash_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), segment_ids=seg, sm_scale=1.0)
            ctx = ctx.transpose(0, 2, 1, 3).astype(self.dtype)
            ctx_t, ctx_l = ctx[..., :dh], ctx[..., dh:]
            return (ctx_t.reshape(B, L, nh * dh),
                    ctx_l.reshape(B, L, nh * dh_l))

        s_t = jnp.einsum("blhd,bmhd->bhlm", q_t, k_t,
                         preferred_element_type=jnp.float32) / jnp.sqrt(float(dh))
        s_l = jnp.einsum("blhd,bmhd->bhlm", q_l, k_l,
                         preferred_element_type=jnp.float32) / jnp.sqrt(float(dh_l))
        # BiACM: both streams share the same coupled scores
        scores = s_t + s_l + attn_bias.astype(jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)

        drop = nn.Dropout(cfg.attention_probs_dropout_prob)
        p_t = drop(probs, deterministic=deterministic)
        p_l = drop(probs, deterministic=deterministic)

        ctx_t = jnp.einsum("bhlm,bmhd->blhd", p_t, v_t)
        ctx_l = jnp.einsum("bhlm,bmhd->blhd", p_l, v_l)
        return ctx_t.reshape(B, L, nh * dh), ctx_l.reshape(B, L, nh * dh_l)


class ResidualOutput(nn.Module):
    """Dense → dropout → LayerNorm(x + residual) (modeling_lilt.py:432-443)."""

    features: int
    cfg: LiltConfig
    dtype: jnp.dtype = jnp.float32
    int8_dense: bool = False

    @nn.compact
    def __call__(self, x, residual, deterministic: bool):
        from ..ops.quant import dense as qdense

        x = qdense(self.features, quant=self.int8_dense and deterministic,
                   kernel_init=dense_init(self.cfg), dtype=self.dtype,
                   name="dense")(x)
        x = nn.Dropout(self.cfg.hidden_dropout_prob)(x, deterministic=deterministic)
        return nn.LayerNorm(epsilon=self.cfg.layer_norm_eps, dtype=self.dtype,
                            name="LayerNorm")(x + residual)


class Mlp(nn.Module):
    """intermediate (act) + output (residual LN) (modeling_lilt.py:511-537)."""

    hidden: int
    intermediate: int
    cfg: LiltConfig
    dtype: jnp.dtype = jnp.float32
    int8_dense: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool):
        from ..ops.quant import dense as qdense

        h = qdense(self.intermediate,
                   quant=self.int8_dense and deterministic,
                   kernel_init=dense_init(self.cfg),
                   dtype=self.dtype, name="intermediate_dense")(x)
        h = ACT[self.cfg.hidden_act](h)
        out = ResidualOutput(self.hidden, self.cfg, self.dtype,
                             self.int8_dense, name="output")(
            h, x, deterministic)
        return out


class LiltLayer(nn.Module):
    cfg: LiltConfig
    dtype: jnp.dtype = jnp.float32
    flash: bool = False
    fused_biacm: bool = False
    fused_biacm_train: bool = False
    mesh: Optional[object] = None
    int8_dense: bool = False

    @nn.compact
    def __call__(self, text, layout, attn_bias, seg_mask, deterministic: bool):
        cfg = self.cfg
        q8 = self.int8_dense
        lay_h = cfg.hidden_size // cfg.channel_shrink_ratio
        ctx_t, ctx_l = LiltSelfAttention(cfg, self.dtype, self.flash,
                                         self.fused_biacm,
                                         self.fused_biacm_train,
                                         self.mesh, q8,
                                         name="self_attn")(
            text, layout, attn_bias, seg_mask, deterministic)
        text = ResidualOutput(cfg.hidden_size, cfg, self.dtype, q8,
                              name="attn_output")(
            ctx_t, text, deterministic)
        layout = ResidualOutput(lay_h, cfg, self.dtype, q8,
                                name="layout_attn_output")(
            ctx_l, layout, deterministic)
        text = Mlp(cfg.hidden_size, cfg.intermediate_size, cfg, self.dtype,
                   q8, name="mlp")(text, deterministic)
        layout = Mlp(lay_h, cfg.intermediate_size // cfg.channel_shrink_ratio, cfg,
                     self.dtype, q8, name="layout_mlp")(layout, deterministic)
        return text, layout


class LiltModel(nn.Module):
    """Full LiLT encoder. Returns dict with concat(semantic, layout) hidden."""

    cfg: LiltConfig
    dtype: jnp.dtype = jnp.float32
    remat_layers: bool = False  # gradient checkpointing per layer
    flash_attention: bool = False
    fused_biacm: bool = False  # dim-80-aware fused BiACM kernel (inference)
    fused_biacm_train: bool = False  # custom-VJP variant w/ in-kernel dropout
    mesh: Optional[object] = None  # shard_map the kernels over (dp, tp)
    int8_dense: bool = False  # serving-only int8 projections/MLPs (ops/quant)

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        bbox: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        cfg = self.cfg
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        position_ids = make_position_ids(input_ids, cfg.pad_token_id)
        attn_bias = extended_attention_mask(attention_mask, jnp.float32)

        text = LiltTextEmbeddings(cfg, self.dtype, name="embeddings")(
            input_ids, position_ids, deterministic)
        layout = LiltLayoutEmbeddings(cfg, self.dtype, name="layout_embeddings")(
            bbox, position_ids, deterministic)

        seg_mask = attention_mask.astype(jnp.int32)
        layer_cls = (nn.remat(LiltLayer, static_argnums=(5,))
                     if self.remat_layers else LiltLayer)
        for i in range(cfg.num_hidden_layers):
            text, layout = layer_cls(cfg, self.dtype, self.flash_attention,
                                     self.fused_biacm,
                                     self.fused_biacm_train,
                                     self.mesh, self.int8_dense,
                                     name=f"layer_{i}")(
                text, layout, attn_bias, seg_mask, deterministic)

        return {
            "last_hidden_state": jnp.concatenate([text, layout], axis=-1),
            "semantic_output": text,
            "layout_output": layout,
        }
