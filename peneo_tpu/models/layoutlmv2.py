"""LayoutLMv2 / LayoutXLM backbone in flax.linen.

The reference consumes HF ``transformers.LayoutLMv2Model`` (model/
backbone_mapping.py:19-24,301-324), whose visual tower is a detectron2
ResNeXt-101-FPN. This is a from-scratch TPU-native implementation:

- text path: word + absolute position + concatenated 2D spatial embeddings
  (x0/y0/x1/y1 coordinate_size + h/w shape_size) + token type → LN → dropout.
- visual path: native flax ResNeXt-FPN (p2 level, 256 ch) with FrozenBN
  *folded into the convolutions at weight-conversion time* (detectron2 uses
  FrozenBatchNorm2d, i.e. a per-channel affine — folding it removes the op
  entirely on TPU), average-pooled to the 7×7 grid → 49 tokens → linear proj
  + shared position/spatial embeddings of the visual bbox grid → visual LN.
- encoder: fast_qkv attention (single (H, 3H) kernel, q/v biases only) with
  T5-bucketed 1D + 2D relative biases gathered from (bins, heads) tables,
  biases added *unscaled* to q/√d·k scores (unlike v3, which scales them).

Sequence layout: [text tokens ‖ 49 visual tokens]; PEneoModel strips the
visual tail and CLS (modeling_peneo.py:138-154).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import LayoutLMv2Config
from .layoutlmv3 import relative_position_bucket
from .lilt import ACT, dense_init, embed_init, extended_attention_mask


# --------------------------------------------------------------------- visual
class ConvNoBN(nn.Module):
    """Conv with bias standing in for detectron2 Conv2d+FrozenBN (the frozen
    affine is folded into kernel/bias during weight conversion)."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    groups: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = ((self.kernel[0] // 2,) * 2, (self.kernel[1] // 2,) * 2)
        return nn.Conv(self.features, self.kernel, strides=self.strides,
                       padding=pad, feature_group_count=self.groups,
                       dtype=self.dtype, name="conv")(x)


class ResNeXtBlock(nn.Module):
    """Bottleneck block (1×1 → grouped 3×3 → 1×1) with projection shortcut on
    stride/width change (detectron2 BottleneckBlock semantics,
    stride_in_1x1=True caffe-style)."""

    bottleneck: int
    out_features: int
    stride: int = 1
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        if self.stride != 1 or x.shape[-1] != self.out_features:
            shortcut = ConvNoBN(self.out_features, (1, 1),
                                (self.stride, self.stride), dtype=self.dtype,
                                name="shortcut")(x)
        y = ConvNoBN(self.bottleneck, (1, 1), (self.stride, self.stride),
                     dtype=self.dtype, name="conv1")(x)
        y = jax.nn.relu(y)
        y = ConvNoBN(self.bottleneck, (3, 3), groups=self.groups,
                     dtype=self.dtype, name="conv2")(y)
        y = jax.nn.relu(y)
        y = ConvNoBN(self.out_features, (1, 1), dtype=self.dtype, name="conv3")(y)
        return jax.nn.relu(y + shortcut)


class ResNeXtFPN(nn.Module):
    """ResNeXt-FPN producing the p2 (stride-4, 256-ch) feature map.

    Defaults follow detectron2's layoutlmv2 config (ResNeXt-101 32×8d); a
    lighter depth can be configured for tests.
    """

    depths: Sequence[int] = (3, 4, 23, 3)
    groups: int = 32
    width_per_group: int = 8
    fpn_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, 3)
        y = ConvNoBN(64, (7, 7), (2, 2), dtype=self.dtype, name="stem")(x)
        y = jax.nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        features = 256
        bottleneck = self.groups * self.width_per_group
        for stage, depth in enumerate(self.depths):
            for blk in range(depth):
                stride = 2 if (blk == 0 and stage > 0) else 1
                y = ResNeXtBlock(bottleneck, features, stride, self.groups,
                                 self.dtype, name=f"res{stage + 2}_{blk}")(y)
            outs.append(y)
            features *= 2
            bottleneck *= 2

        # FPN top-down: laterals from res5..res2, nearest-neighbor upsample
        laterals = [
            ConvNoBN(self.fpn_channels, (1, 1), dtype=self.dtype,
                     name=f"fpn_lateral{i + 2}")(o)
            for i, o in enumerate(outs)
        ]
        top = laterals[-1]
        for i in range(len(laterals) - 2, -1, -1):
            up = jax.image.resize(top, laterals[i].shape, method="nearest")
            top = laterals[i] + up
        p2 = ConvNoBN(self.fpn_channels, (3, 3), dtype=self.dtype,
                      name="fpn_output2")(top)
        return p2


def visual_grid_bbox(grid_h: int, grid_w: int) -> jnp.ndarray:
    """7×7 pseudo-bboxes on the [0,1000] grid (HF _calc_visual_bbox)."""
    xe = jnp.arange(0, 1000 * (grid_w + 1), 1000) // grid_w
    ye = jnp.arange(0, 1000 * (grid_h + 1), 1000) // grid_h
    x0, y0 = jnp.meshgrid(xe[:-1], ye[:-1], indexing="xy")
    x1, y1 = jnp.meshgrid(xe[1:], ye[1:], indexing="xy")
    return jnp.stack([x0, y0, x1, y1], axis=-1).reshape(-1, 4).astype(jnp.int32)


# ----------------------------------------------------------------------- text
class LayoutLMv2SharedEmbeddings(nn.Module):
    """Word/position/spatial/token-type tables shared by text and visual paths."""

    cfg: LayoutLMv2Config
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        init = dense_init(cfg)
        self.word_embeddings = nn.Embed(
            cfg.vocab_size, cfg.hidden_size,
            embedding_init=embed_init(cfg, cfg.pad_token_id),
            dtype=self.dtype)
        self.position_embeddings = nn.Embed(cfg.max_position_embeddings,
                                            cfg.hidden_size,
                                            embedding_init=init, dtype=self.dtype)
        self.token_type_embeddings = nn.Embed(cfg.type_vocab_size,
                                              cfg.hidden_size,
                                              embedding_init=init, dtype=self.dtype)
        self.x_position_embeddings = nn.Embed(cfg.max_2d_position_embeddings,
                                              cfg.coordinate_size,
                                              embedding_init=init, dtype=self.dtype)
        self.y_position_embeddings = nn.Embed(cfg.max_2d_position_embeddings,
                                              cfg.coordinate_size,
                                              embedding_init=init, dtype=self.dtype)
        self.h_position_embeddings = nn.Embed(cfg.max_2d_position_embeddings,
                                              cfg.shape_size,
                                              embedding_init=init, dtype=self.dtype)
        self.w_position_embeddings = nn.Embed(cfg.max_2d_position_embeddings,
                                              cfg.shape_size,
                                              embedding_init=init, dtype=self.dtype)
        self.LayerNorm = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype)

    def spatial(self, bbox):
        return jnp.concatenate([
            self.x_position_embeddings(bbox[:, :, 0]),
            self.y_position_embeddings(bbox[:, :, 1]),
            self.x_position_embeddings(bbox[:, :, 2]),
            self.y_position_embeddings(bbox[:, :, 3]),
            self.h_position_embeddings(bbox[:, :, 3] - bbox[:, :, 1]),
            self.w_position_embeddings(bbox[:, :, 2] - bbox[:, :, 0]),
        ], axis=-1)


class Layer(nn.Module):
    """fast_qkv attention + MLP, post-LN, with precomputed relative biases."""

    cfg: LayoutLMv2Config
    dtype: jnp.dtype = jnp.float32
    int8_dense: bool = False  # serving-only int8 matmuls (ops/quant)
    # fused rel-bias attention kernel (ops/bias_attention). The inference
    # kernel has no VJP, so maybe_fused_ctx refuses any non-deterministic
    # forward; training forwards go through fused_attention_train
    # (custom-VJP pair, in-kernel hardware-PRNG dropout, dbias = dS flows
    # into the bias tables). Both gates pad L to the next multiple of 64
    # (v2 serving lengths are L_text + 49 image tokens) and fall back to
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
        B, L, _ = x.shape
        from ..ops.quant import dense as qdense

        quant = self.int8_dense and deterministic

        if cfg.fast_qkv:
            qkv = qdense(3 * cfg.hidden_size, quant=quant, use_bias=False,
                         kernel_init=init,
                         dtype=self.dtype, name="qkv_linear")(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q + self.param("q_bias", nn.initializers.zeros,
                               (1, 1, cfg.hidden_size)).astype(self.dtype)
            v = v + self.param("v_bias", nn.initializers.zeros,
                               (1, 1, cfg.hidden_size)).astype(self.dtype)
        else:
            q = qdense(cfg.hidden_size, quant=quant, kernel_init=init,
                       dtype=self.dtype, name="query")(x)
            k = qdense(cfg.hidden_size, quant=quant, kernel_init=init,
                       dtype=self.dtype, name="key")(x)
            v = qdense(cfg.hidden_size, quant=quant, kernel_init=init,
                       dtype=self.dtype, name="value")(x)

        q = q.reshape(B, L, nh, dh)
        k = k.reshape(B, L, nh, dh)
        v = v.reshape(B, L, nh, dh)
        ctx = None
        if self.fused_attention and deterministic:
            # scores/softmax/p·v fused in VMEM (ops/bias_attention)
            from ..ops.bias_attention import maybe_fused_ctx

            ctx = maybe_fused_ctx(
                q, k, v, rel_bias, attn_bias, 1.0 / math.sqrt(dh),
                deterministic=deterministic,
                dropout_p=cfg.attention_probs_dropout_prob, mesh=self.mesh)
        elif self.fused_attention_train and not deterministic:
            # differentiable fused kernel (custom VJP); in-kernel hardware
            # PRNG dropout, dbias = dS into the trained bias tables
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
                scores = scores + rel_bias  # v2 adds biases unscaled
            scores = scores + attn_bias.astype(jnp.float32)
            probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
            probs = nn.Dropout(cfg.attention_probs_dropout_prob)(
                probs, deterministic=deterministic)
            ctx = jnp.einsum("bhlm,bmhd->blhd", probs,
                             v).reshape(B, L, cfg.hidden_size)

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


class LayoutLMv2Model(nn.Module):
    cfg: LayoutLMv2Config
    dtype: jnp.dtype = jnp.float32
    visual_depths: Sequence[int] = (3, 4, 23, 3)
    remat_layers: bool = False
    # serving-only int8 text-encoder matmuls (ops/quant); the visual conv
    # tower stays full precision
    int8_dense: bool = False
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
        B, L = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        grid_h, grid_w = cfg.image_feature_pool_shape[:2]
        n_vis = grid_h * grid_w

        emb = LayoutLMv2SharedEmbeddings(cfg, self.dtype, name="embeddings")

        pos_ids = jnp.broadcast_to(jnp.arange(L)[None], (B, L))
        text = (emb.word_embeddings(input_ids)
                + emb.position_embeddings(pos_ids)
                + emb.spatial(bbox)
                + emb.token_type_embeddings(jnp.zeros_like(input_ids)))
        text = emb.LayerNorm(text)
        text = nn.Dropout(cfg.hidden_dropout_prob)(text, deterministic=deterministic)

        vis_box = jnp.broadcast_to(visual_grid_bbox(grid_h, grid_w)[None],
                                   (B, n_vis, 4))
        vis_pos = jnp.broadcast_to(jnp.arange(n_vis)[None], (B, n_vis))
        if image is not None:
            img = image.transpose(0, 2, 3, 1)  # NCHW→NHWC, BGR 0-255
            mean = jnp.asarray(cfg.pixel_mean, jnp.float32)
            std = jnp.asarray(cfg.pixel_std, jnp.float32)
            img = ((img - mean) / std).astype(self.dtype)
            p2 = ResNeXtFPN(self.visual_depths, dtype=self.dtype,
                            name="visual_backbone")(img)
            ph = p2.shape[1] // grid_h
            pw = p2.shape[2] // grid_w
            pooled = nn.avg_pool(p2, (ph, pw), strides=(ph, pw))
            vis_feats = pooled.reshape(B, n_vis, p2.shape[-1])
        else:
            # text-only mode (no visual features, grid embeddings only)
            vis_feats = jnp.zeros(
                (B, n_vis, cfg.image_feature_pool_shape[2]), self.dtype)
        vis = nn.Dense(cfg.hidden_size, kernel_init=dense_init(cfg),
                       dtype=self.dtype, name="visual_proj")(vis_feats)
        vis = vis + emb.position_embeddings(vis_pos) + emb.spatial(vis_box)
        vis = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                           name="visual_LayerNorm")(vis)
        vis = nn.Dropout(cfg.hidden_dropout_prob)(vis, deterministic=deterministic)

        x = jnp.concatenate([text, vis], axis=1)
        final_mask = jnp.concatenate(
            [attention_mask, jnp.ones((B, n_vis), attention_mask.dtype)], axis=1)
        attn_bias = extended_attention_mask(final_mask, jnp.float32)

        final_bbox = jnp.concatenate([bbox, vis_box], axis=1)
        rel_bias = None
        if cfg.has_relative_attention_bias or cfg.has_spatial_attention_bias:
            from .layoutlmv3 import static_rel_pos_bucket

            parts = []
            if cfg.has_relative_attention_bias:
                table = self.param("rel_pos_bias", dense_init(cfg),
                                   (cfg.rel_pos_bins, cfg.num_attention_heads))
                # position-only (pos_ids/vis_pos are plain aranges above) →
                # static per trace: numpy constant, one gather shared
                # across the batch (see models/layoutlmv3.py). Unlike v3,
                # the single (1, L', L', heads) gather is safe here: v2 is
                # capped at L=512 (max_position_embeddings) and its whole
                # envelope fits (AOT-probed 6.68G at B=32,
                # tools/probe_hbm.py) — and it measured +8.2% at B=16
                # (126.7 → 137.1 pages/s, docs §8)
                bucket = static_rel_pos_bucket(L, n_vis, cfg.rel_pos_bins,
                                               cfg.max_rel_pos)
                parts.append(table[bucket][None])
            if cfg.has_spatial_attention_bias:
                tx = self.param("rel_pos_x_bias", dense_init(cfg),
                                (cfg.rel_2d_pos_bins, cfg.num_attention_heads))
                ty = self.param("rel_pos_y_bias", dense_init(cfg),
                                (cfg.rel_2d_pos_bins, cfg.num_attention_heads))
                cx = final_bbox[:, :, 0]
                cy = final_bbox[:, :, 3]
                parts.append(tx[relative_position_bucket(
                    cx[:, None, :] - cx[:, :, None], cfg.rel_2d_pos_bins,
                    cfg.max_rel_2d_pos)])
                parts.append(ty[relative_position_bucket(
                    cy[:, None, :] - cy[:, :, None], cfg.rel_2d_pos_bins,
                    cfg.max_rel_2d_pos)])
            rel_bias = sum(parts).transpose(0, 3, 1, 2).astype(jnp.float32)
            if rel_bias.shape[0] != B:  # 1D-only configs: batch-broadcast
                rel_bias = jnp.broadcast_to(rel_bias,
                                            (B,) + rel_bias.shape[1:])

        layer_cls = (nn.remat(Layer, static_argnums=(4,))
                     if self.remat_layers else Layer)
        for i in range(cfg.num_hidden_layers):
            x = layer_cls(cfg, self.dtype, self.int8_dense,
                          self.fused_attention, self.mesh,
                          fused_attention_train=self.fused_attention_train,
                          name=f"layer_{i}")(
                x, attn_bias, rel_bias, deterministic)

        return {"last_hidden_state": x}
