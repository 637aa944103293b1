"""stack_head_weights (ops/pair_head.py): the stacked/padded head-weight
layout consumed by the sequence-parallel shard bodies
(parallel/seq_parallel.py). The fused Pallas inference kernel that used to
live beside it was measured slower than the XLA blockwise path at every
configuration and removed in round 3 (docs/documentation.md §8)."""

import numpy as np

from peneo_tpu.ops import pair_head as ph


def test_stack_head_weights_roundtrip():
    rng = np.random.default_rng(1)
    H = 12
    tree = {"heads": {}}
    from peneo_tpu.models.decoder import HEAD_CLASSES, HEAD_NAMES

    for name in HEAD_NAMES:
        c = HEAD_CLASSES[name]
        tree["heads"][f"{name}_fc"] = {
            "fc_0": {"kernel": rng.normal(size=(H, H)).astype(np.float32),
                     "bias": rng.normal(size=(H,)).astype(np.float32)},
            "fc_out": {"kernel": rng.normal(size=(H, c)).astype(np.float32),
                       "bias": rng.normal(size=(c,)).astype(np.float32)},
        }
    w1, b1, w2, b2 = ph.stack_head_weights(tree, HEAD_NAMES)
    assert w1.shape == (5, H, H) and w2.shape == (5, H, ph.C_PAD)
    # pad class bias is -inf-ish so it never wins argmax
    assert float(b2[0, 2]) == ph.NEG_INF
    assert float(b2[1, 3]) == ph.NEG_INF
    # real class columns/biases carried through unchanged
    for hi, name in enumerate(HEAD_NAMES):
        c = HEAD_CLASSES[name]
        clf = tree["heads"][f"{name}_fc"]
        np.testing.assert_array_equal(np.asarray(w1[hi]), clf["fc_0"]["kernel"])
        np.testing.assert_array_equal(np.asarray(w2[hi, :, :c]),
                                      clf["fc_out"]["kernel"])
        np.testing.assert_array_equal(np.asarray(b2[hi, :c]),
                                      clf["fc_out"]["bias"])
