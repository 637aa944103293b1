"""Short same-corpus convergence-parity run (tools/convergence_parity.py).

The full experiment (400 steps through warmup AND deep into the linear-decay
tail, reference PEneoTrainer vs peneo_tpu from identical converted weights
and identical batch order, then decoded eval F1 through each side's own
decode+metric stack) runs via the tool and its report is recorded in
docs/reports/. This test keeps the harness itself green with a 12-step
version: step-1 losses must agree to <5e-4 relative, the first five steps
to <2e-2, and window means to <10% (fp32 drift compounds chaotically under
the 30x decoder-group lr, so late steps only carry window-mean signal).

Reference trainer: /root/reference/pipeline/trainer.py:275-354 (4-group
AdamW) + HF linear warmup/decay scheduler; eval decode
pipeline/decode.py:381-511 + pipeline/evaluation.py:98.
"""

import pytest

from tests.conftest import reference_available

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not reference_available(),
                       reason="reference checkout not mounted"),
]


def test_convergence_parity_smoke(tmp_path):
    from tools.convergence_parity import main

    rc = main(["--steps", "12", "--b", "4", "--max_len", "128",
               "--train_pages", "8", "--val_pages", "4",
               "--out", str(tmp_path)])
    assert rc == 0, "convergence parity smoke FAILED (see stdout table)"
