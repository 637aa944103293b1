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


def load_rgb_u8(path: str, size: int) -> np.ndarray:
    """Decode + resize only — uint8 (H, W, 3) RGB. The serving fast path:
    normalization/transpose move ON DEVICE (see device_image_normalize), so
    the host does no float conversion and the H2D transfer is 4× smaller
    (uint8 vs fp32). Values are bit-identical to the float path — PIL's
    resize output is uint8 either way, and u8→f32 is exact."""
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB").resize((size, size), Image.BILINEAR)
        return np.asarray(im, dtype=np.uint8)


def make_image_loader(cfg, raw: bool = False) -> Callable[[str], np.ndarray]:
    fam = cfg.backbone_family()
    size = (cfg.backbone_config or {}).get("input_size", 224)
    if raw:
        if fam not in ("layoutlmv3", "layoutlmv2"):
            raise ValueError(f"backbone family {fam} takes no image input")
        return lambda p: load_rgb_u8(p, size)
    if fam == "layoutlmv3":
        return lambda p: layoutlmv3_preprocess(p, size)
    if fam == "layoutlmv2":
        return lambda p: layoutlmv2_preprocess(p, size)
    raise ValueError(f"backbone family {fam} takes no image input")


def device_image_normalize(image, family: str):
    """jnp half of the raw-uint8 loader: (B, H, W, 3) uint8 RGB → the
    normalized (B, 3, H, W) float32 tensor the models take. Same IEEE fp32
    ops as the host loaders (layoutlmv3_preprocess / layoutlmv2_preprocess),
    so live-vs-raw serving outputs are bit-identical; fp32→model-dtype cast
    stays inside the model as before."""
    import jax.numpy as jnp

    x = image.astype(jnp.float32)
    if family == "layoutlmv3":
        x = (x / 255.0 - 0.5) / 0.5
    elif family == "layoutlmv2":
        x = x[..., ::-1]  # RGB→BGR, raw 0-255 (tower normalizes internally)
    else:
        raise ValueError(f"backbone family {family} takes no image input")
    return x.transpose(0, 3, 1, 2)  # NHWC→NCHW (model transposes back; XLA
    # folds the pair into the patch-conv layout)
