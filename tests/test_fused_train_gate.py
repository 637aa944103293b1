"""resolve_fused_biacm_train (start/run_rfund.py): the auto-gate that
decides when training routes through the fused BiACM kernel."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from start.run_rfund import build_argparser, resolve_fused_biacm_train


def _args(extra=()):
    return build_argparser().parse_args(
        ["--output_dir", "/tmp/x", *extra])


def test_auto_on_single_chip_tpu_lilt():
    a = _args()
    assert resolve_fused_biacm_train(a, "lilt", backend="tpu", n_devices=1)


def test_auto_allows_every_mesh_shape():
    """dp/tp meshes run the kernel through shard_map (models/lilt.py), so
    the auto-gate no longer turns it off for them; sp was always allowed."""
    a = _args(["--sp", "4"])
    assert resolve_fused_biacm_train(a, "lilt", backend="tpu", n_devices=4)
    a = _args(["--dp", "2", "--sp", "2"])
    assert resolve_fused_biacm_train(a, "lilt", backend="tpu", n_devices=4)
    a = _args(["--tp", "2", "--sp", "2"])
    assert resolve_fused_biacm_train(a, "lilt", backend="tpu", n_devices=4)


def test_auto_off_cpu_other_families_bad_seqlen():
    assert not resolve_fused_biacm_train(_args(), "lilt", backend="cpu",
                                         n_devices=1)
    assert not resolve_fused_biacm_train(_args(), "layoutlmv3",
                                         backend="tpu", n_devices=1)
    a = _args(["--max_seq_len", "500"])
    assert not resolve_fused_biacm_train(a, "lilt", backend="tpu",
                                         n_devices=1)


def test_explicit_flags_override_auto():
    a = _args(["--fused_biacm_train"])
    assert resolve_fused_biacm_train(a, "layoutlmv3", backend="cpu",
                                     n_devices=8)
    a = _args(["--no_fused_biacm_train"])
    assert not resolve_fused_biacm_train(a, "lilt", backend="tpu",
                                         n_devices=1)
