"""Data-plane geometry tests, cross-checked against the reference implementation
when /root/reference is present (golden parity, no code copied)."""

import random
import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE_ROOT, reference_available, enable_reference_imports
from peneo_tpu.data import box_utils as bu


def _ref_data_utils():
    enable_reference_imports()
    from data import data_utils  # noqa

    return data_utils


def test_box_two_point_convert():
    assert bu.box_two_point_convert([1, 2, 3, 4]) == [1, 2, 3, 4]
    assert bu.box_two_point_convert([1, 2, 3, 2, 3, 4, 1, 4]) == [1, 2, 3, 4]
    assert bu.box_two_point_convert(
        {"x0": 1, "y0": 2, "x1": 3, "y1": 2, "x2": 3, "y2": 4, "x3": 1, "y3": 4}
    ) == [1, 2, 3, 4]
    with pytest.raises(ValueError):
        bu.box_two_point_convert([1, 2, 3])


def test_normalize_bbox():
    assert bu.normalize_bbox([0, 0, 100, 200], (100, 200)) == [0, 0, 1000, 1000]
    assert bu.normalize_bbox([50, 50, 75, 100], (100, 200)) == [500, 250, 750, 500]
    # clipping
    assert bu.normalize_bbox([-5, 0, 150, 200], (100, 200)) == [0, 0, 1000, 1000]


def test_merge_bbox():
    assert bu.merge_bbox([[1, 2, 3, 4], [0, 5, 10, 6]]) == [0, 2, 10, 6]


def test_sort_boxes_simple():
    # two rows: (a b) on top, (c) below
    boxes = [
        [100, 10, 200, 30],  # a
        [10, 12, 90, 32],    # b (same row, further left)
        [10, 100, 200, 120], # c
    ]
    assert bu.sort_boxes(boxes) == [1, 0, 2]
    assert bu.sort_boxes([]) == []


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_sort_boxes_parity_random():
    ref = _ref_data_utils()
    rng = np.random.default_rng(0)
    for trial in range(50):
        n = int(rng.integers(1, 40))
        x0 = rng.uniform(0, 900, n)
        y0 = rng.uniform(0, 900, n)
        w = rng.uniform(5, 100, n)
        h = rng.uniform(5, 40, n)
        boxes = np.stack([x0, y0, x0 + w, y0 + h], axis=1).tolist()
        assert bu.sort_boxes(boxes) == ref.sort_boxes(boxes), f"trial {trial}"


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_normalize_merge_parity_random():
    ref = _ref_data_utils()
    rng = np.random.default_rng(1)
    for _ in range(100):
        w, h = rng.integers(100, 3000, 2)
        x0, y0 = rng.integers(0, w - 2), rng.integers(0, h - 2)
        x1 = rng.integers(x0 + 1, w)
        y1 = rng.integers(y0 + 1, h)
        box = [int(x0), int(y0), int(x1), int(y1)]
        assert bu.normalize_bbox(box, (int(w), int(h))) == ref.normalize_bbox(box, (int(w), int(h)))


def test_string_f2h():
    assert bu.string_f2h("ＡＢＣ１２３") == "ABC123"
    assert bu.string_f2h("　") == " "
    assert bu.string_f2h("abc") == "abc"


def test_box_augmentation_bounds():
    rng = random.Random(0)
    for _ in range(100):
        box = bu.box_augmentation([10, 10, 50, 30], 100, 100, rng=rng)
        l, t, r, b = box
        assert 0 <= l <= 100 and 0 <= r <= 100
        assert 0 <= t <= 100 and 0 <= b <= 100
