"""Dataset + collator tests: synthetic RFUND/SIBR docs through our datasets,
with item-level parity vs the reference RFUNDDataset/SIBRDataset."""

import numpy as np
import pytest

from tests.conftest import reference_available, enable_reference_imports
from peneo_tpu.data.collator import PEneoCollator
from peneo_tpu.data.datasets import RFUNDDataset, SIBRDataset
from peneo_tpu.data.fetchers import fetch_xlm
from peneo_tpu.data.synthetic import (ToyTokenizer, write_rfund_dataset,
                                      write_sibr_dataset)


@pytest.fixture(scope="module")
def rfund_root(tmp_path_factory):
    return write_rfund_dataset(str(tmp_path_factory.mktemp("rfund")),
                               n_train=6, n_val=3)


@pytest.fixture(scope="module")
def sibr_root(tmp_path_factory):
    return write_sibr_dataset(str(tmp_path_factory.mktemp("sibr")),
                              n_train=4, n_test=2)


def _ours(root, split="train"):
    return RFUNDDataset(root, split, "en", ToyTokenizer(),
                        tokenizer_fetcher=fetch_xlm, max_token_len=511,
                        add_cls_token=True)


def test_rfund_items(rfund_root):
    ds = _ours(rfund_root)
    assert len(ds) == 6
    for i in range(len(ds)):
        f = ds[i]
        assert len(f["input_ids"]) == len(f["bbox"]) == len(f["orig_bbox"])
        assert f["input_ids"][0] == 1  # CLS
        assert len(f["text"]) == len(f["input_ids"]) - 1
        assert len(f["relations"]) > 0
        assert len(f["line_extraction_matrix_spots"]) > 0
        # spots index the post-CLS-strip coordinate system
        for s, e, tag in f["line_extraction_matrix_spots"]:
            assert 0 <= s <= e < len(f["text"])
            assert tag == 1


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_rfund_item_parity(rfund_root):
    enable_reference_imports()
    from data.datasets.rfund import RFUNDDataset as RefRFUND

    tok = ToyTokenizer()
    ref = RefRFUND(rfund_root, "train", "en", tok, tokenizer_fetcher=fetch_xlm,
                   max_token_len=511, add_cls_token=True)
    ours = _ours(rfund_root)
    assert len(ref) == len(ours)
    for i in range(len(ref)):
        rf, of = ref[i], ours[i]
        for key in rf.keys():
            if key == "bbox" or key == "orig_bbox":
                assert np.array_equal(np.asarray(rf[key], dtype=np.float64),
                                      np.asarray(of[key], dtype=np.float64)), (i, key)
            else:
                assert rf[key] == of[key], (i, key)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_sibr_item_parity(sibr_root):
    enable_reference_imports()
    from data.datasets.sibr import SIBRDataset as RefSIBR

    tok = ToyTokenizer()
    ref = RefSIBR(sibr_root, "train", tok, tokenizer_fetcher=fetch_xlm,
                  max_token_len=511, add_cls_token=True)
    ours = SIBRDataset(sibr_root, "train", tok, tokenizer_fetcher=fetch_xlm,
                       max_token_len=511, add_cls_token=True)
    assert len(ref) == len(ours)
    for i in range(len(ref)):
        rf, of = ref[i], ours[i]
        for key in rf.keys():
            if key in ("bbox", "orig_bbox"):
                assert np.array_equal(np.asarray(rf[key], dtype=np.float64),
                                      np.asarray(of[key], dtype=np.float64)), (i, key)
            else:
                assert rf[key] == of[key], (i, key)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_box_aug_quirk_parity(rfund_root):
    """``apply_box_aug`` + ``box_aug_quirk`` reproduces the reference's
    augmented items byte-for-byte: same global-random draw sequence, same
    always-down vertical shift (reference data/data_utils.py:155-160) —
    the strict-parity mode for fine-tuning converted reference checkpoints."""
    enable_reference_imports()
    import random

    from data.datasets.rfund import RFUNDDataset as RefRFUND

    tok = ToyTokenizer()
    ref = RefRFUND(rfund_root, "train", "en", tok, tokenizer_fetcher=fetch_xlm,
                   max_token_len=511, add_cls_token=True, apply_box_aug=True)
    ours = RFUNDDataset(rfund_root, "train", "en", tok,
                        tokenizer_fetcher=fetch_xlm, max_token_len=511,
                        add_cls_token=True, apply_box_aug=True,
                        box_aug_quirk=True)
    fixed = RFUNDDataset(rfund_root, "train", "en", tok,
                         tokenizer_fetcher=fetch_xlm, max_token_len=511,
                         add_cls_token=True, apply_box_aug=True)
    any_diff = False
    for i in range(len(ref)):
        random.seed(1234 + i)
        rf = ref[i]
        random.seed(1234 + i)
        of = ours[i]
        for key in rf.keys():
            if key in ("bbox", "orig_bbox"):
                assert np.array_equal(np.asarray(rf[key], dtype=np.float64),
                                      np.asarray(of[key], dtype=np.float64)), (i, key)
            else:
                assert rf[key] == of[key], (i, key)
        # default (fixed) mode draws the same sequence but honors the
        # vertical direction — it must diverge somewhere on this corpus
        random.seed(1234 + i)
        ff = fixed[i]
        if not np.array_equal(np.asarray(rf["orig_bbox"], dtype=np.float64),
                              np.asarray(ff["orig_bbox"], dtype=np.float64)):
            any_diff = True
    assert any_diff, "fixed-direction aug never differed; quirk flag is moot"


def test_collator_shapes(rfund_root):
    ds = _ours(rfund_root)
    coll = PEneoCollator(max_seq_len=512, pad_token_id=0, add_cls_token=True)
    batch = coll([ds[i] for i in range(3)])
    assert batch.input_ids.shape == (3, 512)
    assert batch.bbox.shape == (3, 512, 4)
    assert batch.labels["line_extraction"].shape == (3, 511, 511)
    assert batch.attention_mask.sum(axis=1).tolist() == [
        len(ds[i]["input_ids"]) for i in range(3)]
    # label spots land where the dataset put them
    f0 = ds[0]
    for s, e, tag in f0["line_extraction_matrix_spots"]:
        assert batch.labels["line_extraction"][0, s, e] == tag
    # dense labels only on the upper triangle
    for name, m in batch.labels.items():
        assert (np.tril(m[0], -1) == 0).all(), name


def test_truncation_drops_overflow(rfund_root):
    ds = RFUNDDataset(rfund_root, "train", "en", ToyTokenizer(),
                      tokenizer_fetcher=fetch_xlm, max_token_len=24,
                      add_cls_token=True)
    f = ds[0]
    assert len(f["input_ids"]) <= 25
    for s, e, _ in f["line_extraction_matrix_spots"]:
        assert e < 24
