"""The trace-time numpy 1D rel-pos bucket matrix == the traced jnp one.

static_rel_pos_bucket bakes the position-only bucket matrix as a constant
(models/layoutlmv3.py); bucket indices are integers, so the two must agree
EXACTLY — a one-off at a log-boundary would silently swap a trained bias row.
Exhaustive over every (i, j) pair for representative text/visual lengths,
covering both families' bins/max-distance pairs (v3: 32/128 1D; v2/XLM uses
the same helper) and the long-context serving shape.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from peneo_tpu.models.layoutlmv3 import (relative_position_bucket,
                                         static_rel_pos_bucket)


@pytest.mark.parametrize("L,n_vis", [(512, 0), (512, 197), (512, 49),
                                     (4096, 197), (129, 17)])
@pytest.mark.parametrize("bins,maxd", [(32, 128), (64, 256)])
def test_static_equals_traced(L, n_vis, bins, maxd):
    pos = np.arange(L, dtype=np.int64)
    if n_vis:
        pos = np.concatenate([pos, np.arange(n_vis, dtype=np.int64)])
    rel = jnp.asarray(pos[None, :] - pos[:, None])
    traced = np.asarray(relative_position_bucket(rel, bins, maxd))
    static = np.asarray(static_rel_pos_bucket(L, n_vis, bins, maxd))
    np.testing.assert_array_equal(static, traced)
    assert static.dtype == np.int32
