"""Host-side image preprocessing (numpy/PIL) — the half of the reference's HF
image processors the pipeline actually uses (SURVEY.md §2.7: resize +
normalize; the collator calls only the image-processor part,
data/collator.py:225-228).

- LayoutLMv3ImageProcessor: resize to 224×224 (bilinear), rescale 1/255,
  normalize mean=std=0.5, CHW float32.
- LayoutLMv2ImageProcessor: resize to 224×224, RGB→BGR flip, raw 0-255
  float32 CHW (the detectron2 visual tower normalizes internally).
"""

from __future__ import annotations

from typing import Callable

import numpy as np


def load_rgb(path: str, size: int) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB").resize((size, size), Image.BILINEAR)
        return np.asarray(im, dtype=np.float32)  # (H, W, 3) in [0, 255]


def layoutlmv3_preprocess(path: str, size: int = 224) -> np.ndarray:
    arr = load_rgb(path, size) / 255.0
    arr = (arr - 0.5) / 0.5
    return arr.transpose(2, 0, 1)  # CHW


def layoutlmv2_preprocess(path: str, size: int = 224) -> np.ndarray:
    arr = load_rgb(path, size)
    return arr[..., ::-1].transpose(2, 0, 1).copy()  # BGR, CHW, 0-255


def make_image_loader(cfg) -> Callable[[str], np.ndarray]:
    fam = cfg.backbone_family()
    size = (cfg.backbone_config or {}).get("input_size", 224)
    if fam == "layoutlmv3":
        return lambda p: layoutlmv3_preprocess(p, size)
    if fam == "layoutlmv2":
        return lambda p: layoutlmv2_preprocess(p, size)
    raise ValueError(f"backbone family {fam} takes no image input")
