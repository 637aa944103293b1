"""Driver contract: dryrun_multichip executes a full sharded train step on the
8-device CPU mesh; entry() produces a jittable forward (tiny-shape variant —
the driver compile-checks the full-size one on real hardware)."""

import jax


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_shapes_lower():
    import __graft_entry__ as g

    fn, args = g.entry()
    # abstract lowering only — full compile of the 768-wide model is for TPU
    jax.eval_shape(fn, *args)
