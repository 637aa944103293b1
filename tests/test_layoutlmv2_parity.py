"""LayoutLMv2 backbone parity vs HF transformers components (text path; the
detectron2 visual tower is not installable here, so the conv tower is covered
by the FrozenBN-folding math test + shape/self-consistency tests)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from peneo_tpu.config import LayoutLMv2Config

B, L = 2, 10
TINY = dict(
    vocab_size=120, hidden_size=48, num_hidden_layers=2, num_attention_heads=4,
    intermediate_size=64, hidden_dropout_prob=0.0,
    attention_probs_dropout_prob=0.0, max_position_embeddings=80,
    coordinate_size=8, shape_size=8, pad_token_id=0, fast_qkv=True,
    image_feature_pool_shape=[7, 7, 16],
)


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(3, 120, (B, L)).astype(np.int64)
    ids[1, -2:] = 0
    attn = (ids != 0).astype(np.int64)
    x0 = rng.integers(0, 900, (B, L))
    y0 = rng.integers(0, 900, (B, L))
    bbox = np.stack([x0, y0, x0 + rng.integers(1, 99, (B, L)),
                     y0 + rng.integers(1, 99, (B, L))], -1).astype(np.int64)
    bbox[ids == 0] = 0
    return ids, attn, bbox


def test_text_path_parity_vs_hf_components():
    import torch
    import torch.nn as tnn
    from transformers import LayoutLMv2Config as HFConfig
    from transformers.models.layoutlmv2.modeling_layoutlmv2 import (
        LayoutLMv2Embeddings, LayoutLMv2Encoder)

    torch.manual_seed(0)
    hf_cfg = HFConfig(**TINY)
    emb = LayoutLMv2Embeddings(hf_cfg).eval()
    enc = LayoutLMv2Encoder(hf_cfg).eval()
    vis_proj = tnn.Linear(16, TINY["hidden_size"])
    vis_ln = tnn.LayerNorm(TINY["hidden_size"], eps=hf_cfg.layer_norm_eps)

    ids, attn, bbox = _inputs()
    t_ids, t_attn, t_bbox = map(torch.tensor, (ids, attn, bbox))
    n_vis = 49

    with torch.no_grad():
        # emulate LayoutLMv2Model.forward text+zero-visual flow (HF source)
        pos_ids = torch.arange(L).unsqueeze(0).expand(B, L)
        text = (emb.word_embeddings(t_ids) + emb.position_embeddings(pos_ids)
                + emb._calc_spatial_position_embeddings(t_bbox)
                + emb.token_type_embeddings(torch.zeros_like(t_ids)))
        text = emb.LayerNorm(text)

        gx = torch.div(torch.arange(0, 1000 * 8, 1000), 7, rounding_mode="floor")
        gy = torch.div(torch.arange(0, 1000 * 8, 1000), 7, rounding_mode="floor")
        vis_box = torch.stack([
            gx[:-1].repeat(7, 1), gy[:-1].repeat(7, 1).T,
            gx[1:].repeat(7, 1), gy[1:].repeat(7, 1).T], dim=-1).view(-1, 4)
        vis_box = vis_box.repeat(B, 1, 1)
        vis_pos = torch.arange(n_vis).repeat(B, 1)
        vis = (vis_proj(torch.zeros(B, n_vis, 16))
               + emb.position_embeddings(vis_pos)
               + emb._calc_spatial_position_embeddings(vis_box))
        vis = vis_ln(vis)

        final = torch.cat([text, vis], dim=1)
        final_mask = torch.cat([t_attn, torch.ones(B, n_vis, dtype=torch.long)], 1)
        ext = (1.0 - final_mask[:, None, None, :].float()) * torch.finfo(torch.float32).min
        ref_out = enc(final, ext,
                      bbox=torch.cat([t_bbox, vis_box], 1),
                      position_ids=torch.cat([pos_ids, vis_pos], 1))[0].numpy()

    # ours, from converted weights
    from peneo_tpu.models.convert_layoutlmv2 import convert_layoutlmv2_backbone
    from peneo_tpu.models.layoutlmv2 import LayoutLMv2Model

    sd = {}
    for k, v in emb.state_dict().items():
        sd[f"embeddings.{k}"] = v.numpy()
    for k, v in enc.state_dict().items():
        sd[f"encoder.{k}"] = v.numpy()
    for k, v in vis_proj.state_dict().items():
        sd[f"visual_proj.{k}"] = v.numpy()
    for k, v in vis_ln.state_dict().items():
        sd[f"visual_LayerNorm.{k}"] = v.numpy()
    params = convert_layoutlmv2_backbone(sd, with_visual=False)

    model = LayoutLMv2Model(LayoutLMv2Config.from_dict(TINY), dtype=jnp.float32)
    out = model.apply({"params": params}, ids, bbox, attn, image=None,
                      deterministic=True)["last_hidden_state"]
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-4, rtol=1e-3)


def test_frozen_bn_folding_math():
    import torch
    import torch.nn.functional as F

    from peneo_tpu.models.convert_layoutlmv2 import fold_conv_frozen_bn

    rng = np.random.default_rng(0)
    out_c, in_c = 6, 3
    w = rng.normal(size=(out_c, in_c, 3, 3)).astype(np.float32)
    bn_w = rng.normal(size=out_c).astype(np.float32)
    bn_b = rng.normal(size=out_c).astype(np.float32)
    mean = rng.normal(size=out_c).astype(np.float32)
    var = rng.random(out_c).astype(np.float32) + 0.5
    x_in = rng.normal(size=(1, in_c, 8, 8)).astype(np.float32)

    # reference: detectron2 semantics conv(x) then FrozenBN
    y = F.conv2d(torch.tensor(x_in), torch.tensor(w), padding=1)
    s = torch.tensor(bn_w) / torch.sqrt(torch.tensor(var) + 1e-5)
    ref = y * s[None, :, None, None] + (
        torch.tensor(bn_b) - torch.tensor(mean) * s)[None, :, None, None]

    # ours: folded biased conv (NHWC)
    kernel, bias = fold_conv_frozen_bn(w, bn_w, bn_b, mean, var)
    x_nhwc = jnp.asarray(x_in.transpose(0, 2, 3, 1))
    ours = jax.lax.conv_general_dilated(
        x_nhwc, jnp.asarray(kernel), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + jnp.asarray(bias)
    np.testing.assert_allclose(np.asarray(ours),
                               ref.numpy().transpose(0, 2, 3, 1),
                               atol=1e-3, rtol=1e-4)


def _torch_d2_tower(depths, groups, width_per_group, seed=0):
    """Minimal torch implementation of the detectron2 ResNeXt-FPN that
    LayoutLMv2 ships (Conv2d-no-bias + FrozenBatchNorm2d, caffe-style
    stride_in_1x1 bottlenecks, FPN with biased lateral/output convs), with
    detectron2's state-dict key layout (bottom_up.stem.conv1.*,
    bottom_up.res{2-5}.{i}.conv{1-3}.*, fpn_lateral{2-5}.*, fpn_output2.*).
    detectron2 itself is not installable here; this module reproduces its
    published architecture so the weight converter + flax tower can be
    validated on shared random weights (reference consumes the real thing via
    HF transformers, model/backbone_mapping.py:301-324)."""
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    torch.manual_seed(seed)

    class FBN(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.register_buffer("weight", torch.rand(c) + 0.5)
            self.register_buffer("bias", torch.randn(c) * 0.1)
            self.register_buffer("running_mean", torch.randn(c) * 0.1)
            self.register_buffer("running_var", torch.rand(c) + 0.5)

        def forward(self, x):
            s = self.weight / torch.sqrt(self.running_var + 1e-5)
            return (x * s[None, :, None, None]
                    + (self.bias - self.running_mean * s)[None, :, None, None])

    class D2Conv(tnn.Conv2d):
        def __init__(self, cin, cout, k, stride=1, groups=1):
            super().__init__(cin, cout, k, stride=stride, padding=k // 2,
                             groups=groups, bias=False)
            tnn.init.normal_(self.weight, 0, 0.1)
            self.norm = FBN(cout)

        def forward(self, x):
            return self.norm(super().forward(x))

    class Stem(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = D2Conv(3, 64, 7, 2)

        def forward(self, x):
            x = F.relu(self.conv1(x))
            return F.max_pool2d(x, 3, stride=2, padding=1)

    class Bottleneck(tnn.Module):
        def __init__(self, cin, bott, cout, stride):
            super().__init__()
            if stride != 1 or cin != cout:
                self.shortcut = D2Conv(cin, cout, 1, stride)
            self.conv1 = D2Conv(cin, bott, 1, stride)  # stride_in_1x1
            self.conv2 = D2Conv(bott, bott, 3, 1, groups=groups)
            self.conv3 = D2Conv(bott, cout, 1)

        def forward(self, x):
            sc = self.shortcut(x) if hasattr(self, "shortcut") else x
            y = F.relu(self.conv1(x))
            y = F.relu(self.conv2(y))
            return F.relu(self.conv3(y) + sc)

    class BottomUp(tnn.Module):
        def __init__(self):
            super().__init__()
            self.stem = Stem()
            cin, cout = 64, 256
            bott = groups * width_per_group
            for stage, depth in enumerate(depths):
                blocks = []
                for blk in range(depth):
                    stride = 2 if (blk == 0 and stage > 0) else 1
                    blocks.append(Bottleneck(cin, bott, cout, stride))
                    cin = cout
                setattr(self, f"res{stage + 2}", tnn.Sequential(*blocks))
                cout *= 2
                bott *= 2

        def forward(self, x):
            x = self.stem(x)
            outs = []
            for i in range(len(depths)):
                x = getattr(self, f"res{i + 2}")(x)
                outs.append(x)
            return outs

    class Tower(tnn.Module):
        def __init__(self):
            super().__init__()
            self.bottom_up = BottomUp()
            c = 256
            for i, _ in enumerate(depths):
                lat = tnn.Conv2d(c * (2 ** i), 256, 1, bias=True)
                tnn.init.normal_(lat.weight, 0, 0.1)
                setattr(self, f"fpn_lateral{i + 2}", lat)
            self.fpn_output2 = tnn.Conv2d(256, 256, 3, padding=1, bias=True)
            tnn.init.normal_(self.fpn_output2.weight, 0, 0.1)

        def forward(self, x):
            outs = self.bottom_up(x)
            laterals = [getattr(self, f"fpn_lateral{i + 2}")(o)
                        for i, o in enumerate(outs)]
            top = laterals[-1]
            for i in range(len(laterals) - 2, -1, -1):
                top = laterals[i] + F.interpolate(top, scale_factor=2,
                                                  mode="nearest")
            return self.fpn_output2(top)

    return Tower().eval()


def test_visual_tower_parity_vs_torch_detectron2_style():
    """flax ResNeXt-FPN + FrozenBN-folding converter vs the torch
    detectron2-style tower on shared random weights: identical p2 maps."""
    import torch

    from peneo_tpu.models.convert_layoutlmv2 import convert_visual_backbone
    from peneo_tpu.models.layoutlmv2 import ResNeXtFPN

    depths, groups, wpg = (1, 1, 1, 1), 4, 8
    tower = _torch_d2_tower(depths, groups, wpg)
    rng = np.random.default_rng(3)
    # normalized input (pixel mean/std applied on both sides identically)
    x = rng.normal(0, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tower(torch.tensor(x)).numpy()

    sd = {k: v.numpy() for k, v in tower.state_dict().items()}
    params = convert_visual_backbone(sd, depths=depths, prefix="")
    flax_tower = ResNeXtFPN(depths, groups=groups, width_per_group=wpg,
                            dtype=jnp.float32)
    out = flax_tower.apply({"params": params},
                           jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out),
                               ref.transpose(0, 2, 3, 1), atol=2e-3, rtol=1e-3)


def test_full_model_image_path_parity():
    """End-to-end LayoutLMv2 parity INCLUDING the visual path: HF text
    components + the detectron2-style torch tower on one side, our converted
    full model (image != None) on the other."""
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F
    from transformers import LayoutLMv2Config as HFConfig
    from transformers.models.layoutlmv2.modeling_layoutlmv2 import (
        LayoutLMv2Embeddings, LayoutLMv2Encoder)

    from peneo_tpu.models.convert_layoutlmv2 import convert_layoutlmv2_backbone
    from peneo_tpu.models.layoutlmv2 import LayoutLMv2Model

    depths, groups, wpg = (1, 1, 1, 1), 32, 8
    cfg_d = dict(TINY, image_feature_pool_shape=[7, 7, 256])
    torch.manual_seed(0)
    hf_cfg = HFConfig(**cfg_d)
    emb = LayoutLMv2Embeddings(hf_cfg).eval()
    enc = LayoutLMv2Encoder(hf_cfg).eval()
    vis_proj = tnn.Linear(256, cfg_d["hidden_size"])
    vis_ln = tnn.LayerNorm(cfg_d["hidden_size"], eps=hf_cfg.layer_norm_eps)
    tower = _torch_d2_tower(depths, groups, wpg, seed=1)

    ids, attn, bbox = _inputs()
    rng = np.random.default_rng(4)
    image = (rng.random((B, 3, 224, 224)) * 255).astype(np.float32)
    # must match our LayoutLMv2Config defaults (detectron2 BGR normalization)
    pixel_mean = np.array([103.530, 116.280, 123.675], np.float32)
    pixel_std = np.array([57.375, 57.120, 58.395], np.float32)

    t_ids, t_attn, t_bbox = map(torch.tensor, (ids, attn, bbox))
    n_vis = 49
    with torch.no_grad():
        norm = (torch.tensor(image)
                - torch.tensor(pixel_mean)[None, :, None, None]) \
            / torch.tensor(pixel_std)[None, :, None, None]
        p2 = tower(norm)
        feats = F.adaptive_avg_pool2d(p2, (7, 7)).flatten(2).transpose(1, 2)

        pos_ids = torch.arange(L).unsqueeze(0).expand(B, L)
        text = (emb.word_embeddings(t_ids) + emb.position_embeddings(pos_ids)
                + emb._calc_spatial_position_embeddings(t_bbox)
                + emb.token_type_embeddings(torch.zeros_like(t_ids)))
        text = emb.LayerNorm(text)
        gx = torch.div(torch.arange(0, 1000 * 8, 1000), 7, rounding_mode="floor")
        vis_box = torch.stack([
            gx[:-1].repeat(7, 1), gx[:-1].repeat(7, 1).T,
            gx[1:].repeat(7, 1), gx[1:].repeat(7, 1).T], dim=-1).view(-1, 4)
        vis_box = vis_box.repeat(B, 1, 1)
        vis_pos = torch.arange(n_vis).repeat(B, 1)
        vis = (vis_proj(feats) + emb.position_embeddings(vis_pos)
               + emb._calc_spatial_position_embeddings(vis_box))
        vis = vis_ln(vis)
        final = torch.cat([text, vis], dim=1)
        final_mask = torch.cat([t_attn, torch.ones(B, n_vis, dtype=torch.long)], 1)
        ext = (1.0 - final_mask[:, None, None, :].float()) \
            * torch.finfo(torch.float32).min
        ref_out = enc(final, ext,
                      bbox=torch.cat([t_bbox, vis_box], 1),
                      position_ids=torch.cat([pos_ids, vis_pos], 1))[0].numpy()

    sd = {}
    for k, v in emb.state_dict().items():
        sd[f"embeddings.{k}"] = v.numpy()
    for k, v in enc.state_dict().items():
        sd[f"encoder.{k}"] = v.numpy()
    for k, v in vis_proj.state_dict().items():
        sd[f"visual_proj.{k}"] = v.numpy()
    for k, v in vis_ln.state_dict().items():
        sd[f"visual_LayerNorm.{k}"] = v.numpy()
    for k, v in tower.state_dict().items():
        sd[f"visual.backbone.{k}"] = v.numpy()
    params = convert_layoutlmv2_backbone(sd, with_visual=True, depths=depths)

    from peneo_tpu.config import LayoutLMv2Config as Cfg

    cfg = Cfg.from_dict(cfg_d)
    model = LayoutLMv2Model(cfg, dtype=jnp.float32, visual_depths=depths)
    out = model.apply({"params": params}, ids, bbox, attn, image=image,
                      deterministic=True)["last_hidden_state"]
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=5e-3, rtol=1e-3)


def test_visual_tower_shapes_and_full_model():
    """Self-consistency: tiny ResNeXt-FPN + full v2 model with image input."""
    from peneo_tpu.models.layoutlmv2 import LayoutLMv2Model

    cfg = LayoutLMv2Config.from_dict(TINY)
    model = LayoutLMv2Model(cfg, dtype=jnp.float32, visual_depths=(1, 1, 1, 1))
    ids, attn, bbox = _inputs(1)
    rng = np.random.default_rng(2)
    image = rng.random((B, 3, 112, 112)).astype(np.float32) * 255
    params = model.init(jax.random.PRNGKey(0), ids, bbox, attn, image=image,
                        deterministic=True)["params"]
    out = model.apply({"params": params}, ids, bbox, attn, image=image,
                      deterministic=True)["last_hidden_state"]
    assert out.shape == (B, L + 49, TINY["hidden_size"])
    assert np.isfinite(np.asarray(out)).all()


def test_int8_dense_tracks_fp32():
    """int8_dense (ops/quant) on the v2 text encoder: same params, logits
    track the fp32 forward; the conv tower stays full precision."""
    from peneo_tpu.models.layoutlmv2 import LayoutLMv2Model

    cfg = LayoutLMv2Config.from_dict(TINY)
    fp = LayoutLMv2Model(cfg, dtype=jnp.float32, visual_depths=(1, 1, 1, 1))
    ids, attn, bbox = _inputs(3)
    rng = np.random.default_rng(5)
    image = rng.random((B, 3, 112, 112)).astype(np.float32) * 255
    params = fp.init(jax.random.PRNGKey(0), ids, bbox, attn, image=image,
                     deterministic=True)["params"]
    ref = fp.apply({"params": params}, ids, bbox, attn, image=image,
                   deterministic=True)["last_hidden_state"]
    q = LayoutLMv2Model(cfg, dtype=jnp.float32, visual_depths=(1, 1, 1, 1),
                        int8_dense=True)
    got = q.apply({"params": params}, ids, bbox, attn, image=image,
                  deterministic=True)["last_hidden_state"]
    a, b = np.asarray(ref), np.asarray(got)
    err = np.abs(a - b).max()
    span = np.abs(a).max() + 1e-6
    assert err / span < 0.15, (err, span)
