#!/usr/bin/env python
"""Export a deployment artifact: serialized StableHLO of the jitted inference
step + params + config.

TPU-native equivalent of the reference's ONNX export (tools/export_onnx.py:
36-125): the portable serving program is ``jax.export`` StableHLO (runs under
any XLA backend of the same topology) instead of an ONNX graph. Fixed input
shapes (batch, max_seq_len), the five heads' compact spot outputs.

    python tools/export_artifact.py --model_name_or_path DIR --output_dir OUT \
        [--batch_size 1] [--max_seq_len 512] [--dtype bfloat16]

Check it with tools/check_run_artifact.py; serve with
deploy/inference_artifact.py.
"""

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def export_artifact(model_name_or_path: str, output_dir: str,
                    batch_size: int = 1, max_seq_len: int = 512,
                    dtype: str = "bfloat16") -> str:
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from peneo_tpu.config import PEneoConfig
    from peneo_tpu.models.peneo import PEneoModel
    from peneo_tpu.pipeline.infer import load_params
    from peneo_tpu.registry import get_backbone_info

    cfg = PEneoConfig.from_pretrained(model_name_or_path)
    cfg.max_seq_len = max_seq_len
    cfg.inference_mode = True
    info = get_backbone_info(cfg.backbone_name)
    model = PEneoModel(cfg, dtype=jnp.bfloat16 if dtype == "bfloat16"
                       else jnp.float32)
    params = load_params(model_name_or_path, cfg)
    assert params is not None, f"no weights under {model_name_or_path}"
    params = jax.tree_util.tree_map(jnp.asarray, params)

    B, L = batch_size, max_seq_len
    specs = dict(
        input_ids=jax.ShapeDtypeStruct((B, L), jnp.int32),
        bbox=jax.ShapeDtypeStruct((B, L, 4), jnp.int32),
        attention_mask=jax.ShapeDtypeStruct((B, L), jnp.int32),
    )
    if info.has_visual_embeds:
        size = (cfg.backbone_config or {}).get("input_size", 224)
        specs["image"] = jax.ShapeDtypeStruct((B, 3, size, size), jnp.float32)

    def forward(params, input_ids, bbox, attention_mask, image=None):
        return model.apply({"params": params}, input_ids, bbox, attention_mask,
                           image=image, deterministic=True)

    args = [params] + [specs[k] for k in
                       ("input_ids", "bbox", "attention_mask")]
    if "image" in specs:
        exported = jexport.export(jax.jit(
            lambda p, i, b, a, im: forward(p, i, b, a, im)))(*args, specs["image"])
    else:
        exported = jexport.export(jax.jit(
            lambda p, i, b, a: forward(p, i, b, a)))(*args)

    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "forward.stablehlo"), "wb") as f:
        f.write(exported.serialize())
    cfg.save_pretrained(output_dir)
    from peneo_tpu.pipeline.checkpoint import save_params_msgpack

    save_params_msgpack(jax.device_get(params),
                        os.path.join(output_dir, "params.msgpack"))
    with open(os.path.join(output_dir, "artifact_meta.json"), "w") as f:
        json.dump({"batch_size": B, "max_seq_len": L, "dtype": dtype,
                   "has_image": "image" in specs,
                   "backbone_name": cfg.backbone_name}, f, indent=2)
    # tokenizer files travel with the artifact when present
    from peneo_tpu.registry import TOKENIZER_FILES

    for fname in TOKENIZER_FILES:
        src = os.path.join(model_name_or_path, fname)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(output_dir, fname))
    print(f"[peneo] exported serving artifact to {output_dir}")
    return output_dir


def load_artifact(artifact_dir: str):
    """Returns (call_fn(params, *inputs) -> outputs, params, meta, cfg)."""
    import jax
    import jax.numpy as jnp
    from flax.serialization import msgpack_restore
    from jax import export as jexport

    from peneo_tpu.config import PEneoConfig

    with open(os.path.join(artifact_dir, "forward.stablehlo"), "rb") as f:
        exported = jexport.deserialize(f.read())
    with open(os.path.join(artifact_dir, "params.msgpack"), "rb") as f:
        params = jax.tree_util.tree_map(jnp.asarray, msgpack_restore(f.read()))
    with open(os.path.join(artifact_dir, "artifact_meta.json")) as f:
        meta = json.load(f)
    cfg = PEneoConfig.from_pretrained(artifact_dir)
    return exported.call, params, meta, cfg


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_name_or_path", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--max_seq_len", type=int, default=512)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    a = p.parse_args()
    export_artifact(a.model_name_or_path, a.output_dir, a.batch_size,
                    a.max_seq_len, a.dtype)
