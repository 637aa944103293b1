"""Native (C++) decoder equivalence: on randomized compact spot outputs the
ctypes chain-walk must return EXACTLY the python decode_sample 7-tuple
(kv pairs incl. boxes, lines, and all five link maps with dict order)."""

import numpy as np
import pytest

from peneo_tpu.native import load_decode_lib
from peneo_tpu.pipeline import decode as dec

pytestmark = pytest.mark.skipif(load_decode_lib() is None,
                                reason="no C++ toolchain")


def _fake_compact(rng, L, k, dense=False):
    """Random compact device outputs for one sample (B=1)."""
    out = {}
    for name in dec.HEAD_NAMES:
        c = 2 if name == "line_extraction" else 3
        n = k if dense else int(rng.integers(0, k))
        pos = rng.choice(L * L, size=min(n, L * L), replace=False)
        pos = pos[(pos // L) <= (pos % L)]  # triu only, like compact_spots
        tag = rng.integers(1, c, len(pos))
        score = rng.random(len(pos)).astype(np.float32) * 0.9 + 0.05
        pad = k - len(pos)
        out[name] = {
            "spot_idx": np.concatenate([pos, np.zeros(pad, int)])[None].astype(np.int32),
            "spot_tag": np.concatenate([tag, np.zeros(pad, int)])[None].astype(np.int8),
            "spot_score": np.concatenate(
                [score, np.full(pad, -1.0, np.float32)])[None],
            "spot_count": np.array([len(pos)], np.int32)[None][0][None],
            "seq_len": np.array([L], np.int32)[None][0][None],
        }
    return out


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("thresh", [0.0, 0.4])
def test_native_matches_python(seed, thresh):
    rng = np.random.default_rng(seed)
    L, k = 40, 96
    outputs = _fake_compact(rng, L, k)
    text = [f"w{i} " for i in range(L)]
    x = rng.integers(0, 900, (L,))
    bbox = np.stack([x, x, x + 20, x + 10], -1).astype(np.float64).tolist()

    arrays = dec.spot_arrays_from_device_outputs(outputs, 0, L)
    spots = dec.spots_from_device_outputs(outputs, 0, L)

    py = dec.decode_sample(text, spots, bbox=bbox, score_thresh=thresh)
    nat = dec.decode_sample_native(text, arrays, bbox=bbox,
                                   score_thresh=thresh)
    assert nat is not None

    # kv pairs: exact text + box equality, same order
    assert len(py[0]) == len(nat[0])
    for a, b in zip(py[0], nat[0]):
        assert a[0] == b[0] and a[1] == b[1]
        np.testing.assert_allclose(a[2], b[2])
        np.testing.assert_allclose(a[3], b[3])
    # lines: same order, same text/boxes
    assert len(py[1]) == len(nat[1])
    for a, b in zip(py[1], nat[1]):
        assert a[0] == b[0]
        np.testing.assert_allclose(a[1], b[1])
    # all five maps equal INCLUDING iteration order (dict semantics)
    for m in range(2, 7):
        assert list(py[m].items()) == list(nat[m].items()), m


def test_decode_pred_sample_uses_native_and_matches():
    rng = np.random.default_rng(7)
    L, k = 32, 64
    outputs = _fake_compact(rng, L, k)
    text = [f"t{i}" for i in range(L)]
    spots = dec.spots_from_device_outputs(outputs, 0, L)
    py = dec.decode_sample(text, spots, score_thresh=0.0)
    via = dec.decode_pred_sample(text, outputs, 0, L, score_thresh=0.0)
    assert py[0] == via[0]
    assert py[1] == via[1]
    for m in range(2, 7):
        assert list(py[m].items()) == list(via[m].items())
