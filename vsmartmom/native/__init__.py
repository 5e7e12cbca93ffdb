"""Native (C++) runtime components, bound via ctypes.

The compute path is JAX/XLA/Pallas; these are the IO/runtime pieces that
benefit from native code (currently: the HITRAN line-list loader). Each
component compiles lazily from the bundled source with the system g++ and
caches the shared object; every caller keeps a pure-Python fallback, so a
missing toolchain degrades performance, never capability.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_LIB_CACHE: dict = {}


def _build_dir() -> str:
    d = os.environ.get("VSMARTMOM_NATIVE_CACHE")
    if not d:
        d = os.path.join(tempfile.gettempdir(),
                         f"vsmartmom-native-{os.getuid()}")
    os.makedirs(d, exist_ok=True)
    return d


def load_native(name: str) -> ctypes.CDLL:
    """Compile (once, content-hashed) and dlopen the named component."""
    if name in _LIB_CACHE:
        return _LIB_CACHE[name]
    src = os.path.join(os.path.dirname(__file__), f"{name}.cpp")
    with open(src, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    so = os.path.join(_build_dir(), f"{name}-{tag}.so")
    if not os.path.exists(so):
        tmp = f"{so}.tmp.{os.getpid()}"
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", tmp, src],
            check=True, capture_output=True)
        os.replace(tmp, so)  # atomic under concurrent builders
    lib = ctypes.CDLL(so)
    _LIB_CACHE[name] = lib
    return lib
