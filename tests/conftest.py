"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

This is the standard way to test pjit/shard_map logic without TPU hardware
(SURVEY.md §4). Must run before any module imports jax.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the env's 'axon' (remote TPU)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize imports jax and registers the axon (TPU)
# PJRT plugin before this file runs, so the env var alone is not enough —
# switch the already-imported jax to CPU before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def enable_reference_imports():
    """Make /root/reference importable: add to sys.path and stub the 'timm'
    dependency (only `to_2tuple` is used by the vendored LayoutLMv3)."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    if "timm" not in sys.modules:
        import types

        def to_2tuple(x):
            return x if isinstance(x, tuple) else (x, x)

        import importlib.machinery

        def _mk(name):
            mod = types.ModuleType(name)
            mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            mod.__version__ = "0.0.0"
            sys.modules[name] = mod
            return mod

        timm = _mk("timm")
        models = _mk("timm.models")
        layers = _mk("timm.models.layers")
        layers.to_2tuple = to_2tuple
        models.layers = layers
        timm.models = models
    # The reference targets transformers 4.40; newer versions moved some
    # helpers out of modeling_utils. Re-expose them for the vendored code.
    try:
        import transformers.modeling_utils as mu
        import transformers.pytorch_utils as ptu

        for name in (
            "find_pruneable_heads_and_indices",
            "prune_linear_layer",
            "apply_chunking_to_forward",
        ):
            if not hasattr(mu, name) and hasattr(ptu, name):
                setattr(mu, name, getattr(ptu, name))
    except Exception:
        pass
