"""apply_ocr (tesseract) path + visualization parity tests.

The reference's inference service can run Tesseract itself when no OCR JSON
is provided (deploy/inference.py:243-252); ours gates that path behind
pytesseract (pipeline/preprocess.tesseract_ocr). pytesseract is not
installed in this environment, so the path is exercised with an injected
mock module (word-level image_to_data output → line grouping), plus a live
test that only runs where the real binary exists.

Visualization must match the reference's deploy/inference.py:79-107: red
key / green value boxes with text labels drawn above them, a blue link line
from the key box's bottom-right to the value box's top-left, and thin inset
gray line rectangles.
"""

import json
import os
import random
import shutil
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from peneo_tpu.config import LiltConfig, PEneoConfig
from peneo_tpu.data.synthetic import ToyTokenizer, make_document, render_page
from peneo_tpu.models.peneo import PEneoModel
from peneo_tpu.pipeline.checkpoint import save_params_msgpack
from peneo_tpu.pipeline.infer import InferenceService

# word-level tesseract output for two text lines:
#   line (1,1,1): "total amount" at y=100
#   line (1,1,2): "42 usd"       at y=200
_FAKE_DATA = {
    "text": ["total", "amount", "", "42", "usd"],
    "block_num": [1, 1, 1, 1, 1],
    "par_num": [1, 1, 1, 1, 1],
    "line_num": [1, 1, 1, 2, 2],
    "left": [100, 220, 0, 100, 180],
    "top": [100, 102, 0, 200, 201],
    "width": [100, 140, 0, 60, 80],
    "height": [30, 28, 0, 30, 29],
}


def _install_fake_pytesseract(monkeypatch, data=_FAKE_DATA):
    mod = types.ModuleType("pytesseract")
    mod.Output = types.SimpleNamespace(DICT="dict")
    calls = []

    def image_to_data(im, output_type=None):
        calls.append(im.size)
        return data

    mod.image_to_data = image_to_data
    monkeypatch.setitem(sys.modules, "pytesseract", mod)
    return calls


def test_tesseract_ocr_groups_words_into_lines(monkeypatch, tmp_path):
    from PIL import Image

    from peneo_tpu.pipeline.preprocess import tesseract_ocr

    calls = _install_fake_pytesseract(monkeypatch)
    img = tmp_path / "page.png"
    Image.fromarray(np.full((300, 400, 3), 255, np.uint8)).save(img)

    texts, boxes = tesseract_ocr(str(img))
    assert calls == [(400, 300)]
    assert texts == ["total amount", "42 usd"]
    # line bbox = union of its word boxes
    assert boxes[0] == [100, 100, 360, 130]
    assert boxes[1] == [100, 200, 260, 230]


def test_tesseract_missing_dependency_raises(monkeypatch, tmp_path):
    from PIL import Image

    from peneo_tpu.pipeline.preprocess import tesseract_ocr

    # sys.modules[name] = None makes `import pytesseract` raise ImportError
    monkeypatch.setitem(sys.modules, "pytesseract", None)
    img = tmp_path / "page.png"
    Image.fromarray(np.full((64, 64, 3), 255, np.uint8)).save(img)
    with pytest.raises(RuntimeError, match="pytesseract"):
        tesseract_ocr(str(img))


@pytest.fixture(scope="module")
def tiny_service(tmp_path_factory):
    root = tmp_path_factory.mktemp("tess")
    tok = ToyTokenizer()
    wdir = str(root / "weights")
    os.makedirs(wdir, exist_ok=True)
    cfg = PEneoConfig(
        backbone_name="lilt-infoxlm-base",
        backbone_config=LiltConfig(
            vocab_size=tok.vocab_size, hidden_size=48, num_hidden_layers=1,
            num_attention_heads=4, intermediate_size=96, pad_token_id=0,
            max_position_embeddings=72).to_dict(),
        pair_block_size=16, max_seq_len=64, max_spots_per_head=64)
    cfg.save_pretrained(wdir)
    model = PEneoModel(cfg, dtype=jnp.float32)
    ids = np.ones((1, 64), np.int32)
    params = model.init(jax.random.PRNGKey(11), ids,
                        np.zeros((1, 64, 4), np.int32), ids,
                        deterministic=True)["params"]
    save_params_msgpack(jax.device_get(params),
                        os.path.join(wdir, "params.msgpack"))
    return wdir, tok


def test_apply_ocr_full_decode(monkeypatch, tiny_service, tmp_path):
    """ocr_dir=None → tesseract_ocr feeds the normal preprocess → forward →
    decode pipeline (reference apply_ocr mode, deploy/inference.py:243-252).
    Exercises the branch end-to-end with the mocked OCR."""
    from PIL import Image

    _install_fake_pytesseract(monkeypatch)
    wdir, tok = tiny_service
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    Image.fromarray(np.full((300, 400, 3), 255, np.uint8)).save(
        img_dir / "page.png")

    svc = InferenceService(wdir, tokenizer=tok, dtype="float32", batch_size=1)

    # preprocess alone: tokens must come from the mocked OCR lines
    arrays, texts, orig_bbox, seq_len = svc.preprocess_page(
        str(img_dir / "page.png"), None)
    joined = "".join(texts).replace("▁", " ").strip()
    assert "total amount" in joined and "42 usd" in joined
    assert seq_len == len(orig_bbox)

    # full run: the apply_ocr branch goes through batching + decode
    results = svc.run(str(img_dir), None)
    assert set(results) == {"page.png"}
    assert "kv_pairs" in results["page.png"]
    assert "lines" in results["page.png"]


def test_apply_ocr_live_tesseract(tmp_path):
    """Real-binary smoke (skips where tesseract isn't installed)."""
    if shutil.which("tesseract") is None:
        pytest.skip("tesseract binary not installed")
    pytest.importorskip("pytesseract")
    from PIL import Image, ImageDraw

    from peneo_tpu.pipeline.preprocess import tesseract_ocr

    img = tmp_path / "page.png"
    im = Image.new("RGB", (400, 200), "white")
    ImageDraw.Draw(im).text((50, 80), "HELLO WORLD", fill="black")
    im.save(img)
    texts, boxes = tesseract_ocr(str(img))
    assert isinstance(texts, list) and isinstance(boxes, list)


def test_draw_page_labels_and_links(tmp_path):
    """Visualization smoke: labels + corner link line must render
    (reference deploy/inference.py:88-97)."""
    from PIL import Image

    from peneo_tpu.utils.visualize import draw_page

    src = tmp_path / "page.png"
    Image.fromarray(np.full((400, 600, 3), 255, np.uint8)).save(src)
    kv_pairs = [("total", "42 usd", (50, 50, 150, 90), (300, 200, 420, 240))]
    lines = [("total", (50, 50, 150, 90)), ("42 usd", (300, 200, 420, 240))]
    out = tmp_path / "viz.png"
    draw_page(str(src), kv_pairs, lines, str(out))

    arr = np.asarray(Image.open(out).convert("RGB")).astype(np.int32)
    h, w = arr.shape[:2]
    red = (arr[:, :, 0] > 180) & (arr[:, :, 1] < 100) & (arr[:, :, 2] < 100)
    green = (arr[:, :, 1] > 100) & (arr[:, :, 0] < 100) & (arr[:, :, 2] < 100)
    blue = (arr[:, :, 2] > 180) & (arr[:, :, 0] < 100) & (arr[:, :, 1] < 100)
    assert red.sum() > 100    # key box + key text label
    assert green.sum() > 100  # value box + value text label
    assert blue.sum() > 10    # corner-to-corner link line
    # the link line runs from key bottom-right (150,90) to value
    # top-left (300,200): a blue pixel must exist strictly between the boxes
    ys, xs = np.nonzero(blue)
    assert ((xs > 160) & (xs < 290) & (ys > 100) & (ys < 190)).any()
    # text labels sit ABOVE the key box top (y < 50)
    assert red[:49, :].sum() > 5


def test_serving_visualize_dir(monkeypatch, tiny_service, tmp_path):
    """run(visualize_dir=...) writes one rendered page per input through
    decode → draw_page (reference --dir_visualize)."""
    from PIL import Image

    wdir, tok = tiny_service
    img_dir = tmp_path / "images"
    ocr_dir = tmp_path / "ocr"
    img_dir.mkdir()
    ocr_dir.mkdir()
    rng = random.Random(3)
    doc = make_document(rng, "v.png", n_pairs=2, n_noise=0)
    Image.fromarray(render_page(doc)).save(img_dir / "v.png")
    ocr = [{"text": ln["text"], "bbox": ln["bbox"]}
           for e in doc["entities"] for ln in e["lines"]]
    (ocr_dir / "v.json").write_text(json.dumps(ocr))

    svc = InferenceService(wdir, tokenizer=tok, dtype="float32", batch_size=1)
    viz = tmp_path / "viz"
    svc.run(str(img_dir), str(ocr_dir), visualize_dir=str(viz))
    assert (viz / "v.png").exists()
