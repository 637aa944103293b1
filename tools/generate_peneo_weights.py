#!/usr/bin/env python
"""Build a PEneo-TPU pretrained directory from a (local) HF backbone checkpoint.

Equivalent of the reference tools/generate_peneo_weights.py:13-147: match the
backbone by substring against the registry (order-sensitive), compose a PEneo
config.json with the shipped defaults (category_weights [1,10,10], downstream
speedup 30×), convert the backbone weights into our flax pytree (nested under
``backbone``; the decoder initializes randomly at training start), and copy
tokenizer files.

Usage:
    python tools/generate_peneo_weights.py \
        --backbone_name_or_path /local/lilt-infoxlm-base \
        --output_dir /path/to/peneo-lilt-infoxlm-base
"""

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOKENIZER_FILES = (
    "tokenizer.json", "tokenizer_config.json", "sentencepiece.bpe.model",
    "vocab.json", "vocab.txt", "merges.txt", "special_tokens_map.json",
    "added_tokens.json",
)


def load_state_dict(path: str):
    for name in ("model.safetensors", "pytorch_model.bin"):
        fp = os.path.join(path, name)
        if not os.path.exists(fp):
            continue
        if name.endswith(".safetensors"):
            from safetensors.numpy import load_file

            return load_file(fp)
        import torch

        from peneo_tpu.models.convert import torch_state_dict_to_numpy

        return torch_state_dict_to_numpy(
            torch.load(fp, map_location="cpu", weights_only=True))
    raise FileNotFoundError(f"no model weights under {path}")


def strip_base_prefix(sd, family: str):
    """Remove the backbone's own base prefix (e.g. 'lilt.') if present
    (reference: tools/generate_peneo_weights.py:84-88)."""
    prefixes = {"lilt": "lilt.", "layoutlmv3": "layoutlmv3.",
                "layoutlmv2": "layoutlmv2."}
    pref = prefixes.get(family)
    if pref and any(k.startswith(pref) for k in sd):
        return {k[len(pref):] if k.startswith(pref) else k: v
                for k, v in sd.items()}
    return sd


def generate_peneo_weights(backbone_name_or_path: str, output_dir: str,
                           backbone_name: str = None) -> str:
    from peneo_tpu.config import PEneoConfig
    from peneo_tpu.models.convert import (convert_lilt_backbone)
    from peneo_tpu.registry import BACKBONE_REGISTRY

    base = os.path.basename(backbone_name_or_path.rstrip("/"))
    name = backbone_name
    if name is None:
        for key in BACKBONE_REGISTRY:  # order-sensitive substring match
            if key in base or key in backbone_name_or_path:
                name = key
                break
    if name is None:
        raise KeyError(f"cannot match backbone for {backbone_name_or_path}")
    info = BACKBONE_REGISTRY[name]

    with open(os.path.join(backbone_name_or_path, "config.json")) as f:
        backbone_config = json.load(f)

    cfg = PEneoConfig(
        backbone_name=name,
        backbone_config=backbone_config,
        peneo_category_weights=[1.0, 10.0, 10.0],
        peneo_downstream_speedup_ratio=30.0,
    )
    os.makedirs(output_dir, exist_ok=True)
    cfg.save_pretrained(output_dir)

    sd = strip_base_prefix(load_state_dict(backbone_name_or_path), info.family)
    if info.family == "lilt":
        backbone = convert_lilt_backbone(sd)
    elif info.family == "layoutlmv3":
        from peneo_tpu.models.convert_layoutlmv3 import convert_layoutlmv3_backbone

        backbone = convert_layoutlmv3_backbone(sd)
    else:
        raise NotImplementedError(info.family)

    from peneo_tpu.pipeline.checkpoint import save_params_msgpack

    save_params_msgpack({"backbone": backbone},
                        os.path.join(output_dir, "backbone_params.msgpack"))

    for fname in TOKENIZER_FILES:
        src = os.path.join(backbone_name_or_path, fname)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(output_dir, fname))
    with open(os.path.join(output_dir, "preprocessor_config.json"), "w") as f:
        json.dump({"apply_ocr": False, "size": info.image_size}, f, indent=2)
    print(f"[peneo] wrote PEneo-TPU weights for {name} to {output_dir}")
    return output_dir


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--backbone_name_or_path", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--backbone_name", default=None)
    a = p.parse_args()
    generate_peneo_weights(a.backbone_name_or_path, a.output_dir, a.backbone_name)
