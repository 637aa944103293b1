"""Native (C++) host-runtime components, loaded via ctypes.

The TPU handles the parallel half of decoding (softmax/argmax/top-k spots on
device); the sequential chain-walk half runs on host. The reference leans on
torch's native runtime for its host loops — here the equivalent is a small
C ABI library built from ``decode.cpp``, used automatically by
``pipeline.decode`` when a toolchain is available and falling back to the
pure-python implementation (identical outputs, tested) otherwise.

The library builds lazily with ``g++`` into ``~/.cache/peneo_tpu_native``
(override with PENEO_NATIVE_CACHE; disable entirely with PENEO_NATIVE=0).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build(src: str, out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    so = os.path.join(out_dir, "libpeneo_decode.so")
    stamp = os.path.join(out_dir, "libpeneo_decode.mtime")
    src_mtime = str(os.path.getmtime(src))
    if os.path.exists(so) and os.path.exists(stamp):
        with open(stamp) as f:
            if f.read() == src_mtime:
                return so
    subprocess.run(
        ["g++", "-O2", "-fPIC", "-shared", "-std=c++17", src, "-o", so],
        check=True, capture_output=True, text=True, timeout=300)
    with open(stamp, "w") as f:
        f.write(src_mtime)
    return so


def load_decode_lib():
    """ctypes handle to the native decoder, or None (no toolchain /
    disabled). Thread-safe, builds at most once per process."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("PENEO_NATIVE", "1") in ("0", "off", ""):
            return None
        try:
            cache = os.environ.get(
                "PENEO_NATIVE_CACHE",
                os.path.expanduser("~/.cache/peneo_tpu_native"))
            so = _build(os.path.join(_HERE, "decode.cpp"), cache)
            lib = ctypes.CDLL(so)
            i32p = ctypes.POINTER(ctypes.c_int32)
            i8p = ctypes.POINTER(ctypes.c_int8)
            f32p = ctypes.POINTER(ctypes.c_float)
            head = [i32p, i32p, i8p, f32p, ctypes.c_int]
            lib.peneo_decode_sample.argtypes = (
                head * 5
            ) + [ctypes.c_float] + [i32p] * 7 + [ctypes.c_int, i32p]
            lib.peneo_decode_sample.restype = ctypes.c_int
            _LIB = lib
        except Exception as e:  # missing g++, sandboxed fs, ...
            import warnings

            warnings.warn(f"native decoder unavailable ({e}); "
                          f"using the python path")
            _LIB = None
        return _LIB
