"""Persistent XLA compilation cache.

Full-size PEneo graphs take 1-6 minutes to compile against the remote TPU;
without a persistent cache every fresh process (CLI inference run, cron
retrain, serving restart) pays it again — the reference's torch eager mode
has no such cold-start, so this is the TPU-native mitigation. The cache is
keyed by HLO fingerprint, so config/shape changes miss safely.

Set PENEO_COMPILE_CACHE=0 to disable, or to a path to relocate it.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/peneo_tpu_xla")


def enable_compile_cache() -> str | None:
    """Idempotently point JAX at the persistent compilation cache dir.
    Returns the directory used, or None when disabled/unsupported."""
    setting = os.environ.get("PENEO_COMPILE_CACHE", _DEFAULT)
    if setting in ("0", "", "off", "none"):
        return None
    import jax

    try:
        os.makedirs(setting, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", setting)
        # cache even moderately sized graphs; tiny test graphs stay out
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return setting
    except Exception:  # older jax or read-only fs: cold compile still works
        return None
