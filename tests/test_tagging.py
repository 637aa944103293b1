"""Dense-matrix tagging ↔ flattened shaking-sequence equivalence tests."""

import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE_ROOT, reference_available, enable_reference_imports
from peneo_tpu.data import tagging as tg


def test_spots_roundtrip():
    spots = [(0, 3, 1), (2, 2, 2), (1, 5, 1)]
    m = tg.spots_to_matrix(spots, 8)
    assert m[0, 3] == 1 and m[2, 2] == 2 and m[1, 5] == 1
    back = tg.matrix_to_spots(m)
    # row-major (i, j) order
    assert [(i, j, t) for i, j, t, _ in back] == [(0, 3, 1), (1, 5, 1), (2, 2, 2)]
    assert all(s == 1.0 for *_, s in back)


def test_lower_triangle_ignored():
    m = np.zeros((4, 4), dtype=np.int32)
    m[3, 1] = 1  # below diagonal — must be ignored
    m[1, 3] = 2
    assert [(i, j, t) for i, j, t, _ in tg.matrix_to_spots(m)] == [(1, 3, 2)]


def test_flatten_unflatten():
    rng = np.random.default_rng(0)
    L = 7
    m = np.triu(rng.integers(0, 3, (L, L))).astype(np.int32)
    flat = tg.flatten_triu(m)
    assert flat.shape == (L * (L + 1) // 2,)
    assert np.array_equal(tg.unflatten_triu(flat, L), m)
    # shaking order matches the reference index convention
    inds = tg.shaking_ind2matrix_ind(L)
    for k, (i, j) in enumerate(inds):
        assert flat[k] == m[i, j]


def test_logits_to_spots_matches_argmax():
    rng = np.random.default_rng(1)
    L, C = 6, 3
    logits = rng.normal(size=(L, L, C))
    spots = tg.logits_to_spots(logits)
    tags = logits.argmax(-1)
    triu = np.triu(np.ones((L, L), dtype=bool))
    expect = [(i, j) for i in range(L) for j in range(i, L) if tags[i, j] != 0]
    assert [(i, j) for i, j, _, _ in spots] == expect
    for i, j, t, s in spots:
        assert t == tags[i, j]
        assert 1.0 / C <= s <= 1.0


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_parity_with_reference_shaking_tags():
    enable_reference_imports()
    from model.peneo_decoder import HandshakingTaggingScheme as HTS

    rng = np.random.default_rng(2)
    L = 12
    for _ in range(10):
        n = int(rng.integers(0, 8))
        spots = []
        for _ in range(n):
            i = int(rng.integers(0, L))
            j = int(rng.integers(i, L))
            spots.append((i, j, int(rng.integers(1, 3))))
        ref_tag = HTS.spots2shaking_tag4batch([spots], seq_len=L).numpy()[0]
        ours = tg.flatten_triu(tg.spots_to_matrix(spots, L))
        assert np.array_equal(ref_tag, ours)

        # spot extraction parity (tag matrices, gt path)
        ref_spots = HTS.get_spots_from_shaking_tag(
            __import__("torch").tensor(ref_tag), seq_len=L
        )
        our_spots = tg.matrix_to_spots(tg.spots_to_matrix(spots, L))
        assert [(i, j, t) for i, j, t, _ in our_spots] == [
            (s[0], s[1], s[2]) for s in ref_spots
        ]


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_parity_with_reference_logits_decode():
    enable_reference_imports()
    import torch
    from model.peneo_decoder import HandshakingTaggingScheme as HTS

    rng = np.random.default_rng(3)
    L, C = 10, 3
    flat_logits = rng.normal(size=(L * (L + 1) // 2, C))
    ref_spots = HTS.get_spots_from_shaking_tag(torch.tensor(flat_logits), seq_len=L)
    dense = tg.unflatten_triu(flat_logits, L)
    our_spots = tg.logits_to_spots(dense)
    assert len(ref_spots) == len(our_spots)
    for r, o in zip(ref_spots, our_spots):
        assert (r[0], r[1], r[2]) == (o[0], o[1], o[2])
        assert abs(r[3] - o[3]) < 1e-9
