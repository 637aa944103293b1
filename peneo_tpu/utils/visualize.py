"""Prediction visualization: draw line boxes, kv boxes and key→value arrows
on the page image (reference: deploy/inference.py:79-107)."""

from __future__ import annotations

from typing import Sequence, Tuple


def draw_page(image_path: str, kv_pairs: Sequence[Tuple], lines: Sequence[Tuple],
              out_path: str) -> None:
    from PIL import Image, ImageDraw

    with Image.open(image_path) as im:
        im = im.convert("RGB")
        drw = ImageDraw.Draw(im)
        for text, box in lines:
            drw.rectangle([box[0], box[1], box[2], box[3]], outline=(60, 160, 60),
                          width=2)
        for item in kv_pairs:
            k, v, kb, vb = item[:4]
            drw.rectangle([kb[0], kb[1], kb[2], kb[3]], outline=(220, 60, 60),
                          width=3)
            drw.rectangle([vb[0], vb[1], vb[2], vb[3]], outline=(60, 60, 220),
                          width=3)
            drw.line(
                [(kb[0] + kb[2]) / 2, (kb[1] + kb[3]) / 2,
                 (vb[0] + vb[2]) / 2, (vb[1] + vb[3]) / 2],
                fill=(230, 140, 20), width=2)
        im.save(out_path)
