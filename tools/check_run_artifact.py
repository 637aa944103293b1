#!/usr/bin/env python
"""Smoke-check an exported serving artifact on random inputs
(reference: tools/check_run_onnx.py:14-41)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(artifact_dir: str):
    from tools.export_artifact import load_artifact

    call, params, meta, cfg = load_artifact(artifact_dir)
    B, L = meta["batch_size"], meta["max_seq_len"]
    rng = np.random.default_rng(0)
    vocab = (cfg.backbone_config or {}).get("vocab_size", 1000)
    ids = rng.integers(3, vocab, (B, L)).astype(np.int32)
    x0 = rng.integers(0, 800, (B, L))
    y0 = rng.integers(0, 800, (B, L))
    bbox = np.stack([x0, y0, x0 + 50, y0 + 20], -1).astype(np.int32)
    attn = np.ones((B, L), np.int32)
    args = [params, ids, bbox, attn]
    if meta["has_image"]:
        size = (cfg.backbone_config or {}).get("input_size", 224)
        args.append(rng.normal(size=(B, 3, size, size)).astype(np.float32))
    out = call(*args)
    import jax

    out = jax.device_get(out)
    for name, head in out.items():
        keys = sorted(head.keys())
        print(f"{name}: {keys}")
    print("End")


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--artifact_dir", required=True)
    main(p.parse_args().artifact_dir)
