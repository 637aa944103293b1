"""Compact top-k device spot extraction must decode identically to the dense
tag/score maps."""

import numpy as np

import jax.numpy as jnp

from peneo_tpu.models.decoder import compact_spots
from peneo_tpu.pipeline import decode as dec


def _fake_heads(rng, B, L, sparse=True):
    dense, compact = {}, {}
    for name in dec.HEAD_NAMES:
        c = 2 if name == "line_extraction" else 3
        tags = rng.integers(0, c, (B, L, L)).astype(np.int32)
        if sparse:
            tags *= (rng.random((B, L, L)) < 0.1)
        scores = rng.random((B, L, L)).astype(np.float32) * 0.5 + 0.5
        dense[name] = {"tags": tags, "scores": scores}
        compact[name] = {k: np.asarray(v) for k, v in compact_spots(
            jnp.asarray(tags), jnp.asarray(scores), k=L * L).items()}
    return dense, compact


def test_compact_matches_dense():
    rng = np.random.default_rng(0)
    B, L = 3, 20
    dense, compact = _fake_heads(rng, B, L)
    for i in range(B):
        for seq_len in (L, L - 4):
            d = dec.spots_from_device_outputs(dense, i, seq_len)
            c = dec.spots_from_device_outputs(compact, i, seq_len)
            for name in dec.HEAD_NAMES:
                assert len(d[name]) == len(c[name]), (name, seq_len)
                for a, b in zip(d[name], c[name]):
                    assert a[:3] == b[:3]
                    assert abs(a[3] - b[3]) < 1e-6


def test_compact_truncation_flags_overflow(recwarn):
    rng = np.random.default_rng(1)
    B, L = 1, 16
    tags = np.ones((B, L, L), np.int32)  # every triu position is a spot
    scores = rng.random((B, L, L)).astype(np.float32)
    compact = {k: np.asarray(v)
               for k, v in compact_spots(jnp.asarray(tags),
                                         jnp.asarray(scores), k=8).items()}
    out = dec.spots_from_device_outputs(
        {name: compact for name in dec.HEAD_NAMES}, 0, L)
    assert any("exceed" in str(w.message) for w in recwarn.list)
    assert len(out["line_extraction"]) == 8
