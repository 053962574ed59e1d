"""Build and load the native C++ core.

The reference builds its C++ with CMake/Bazel/Make; this framework's native
pieces are small enough to compile on demand with g++ into a cached shared
library (no pybind11 in this image — the C ABI is consumed via ctypes).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

_DIR = Path(__file__).resolve().parent
_LOCK = threading.Lock()
_CACHE: dict = {}


class NativeBuildError(RuntimeError):
    pass


def _build(src: Path, out: Path) -> None:
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
        str(src), "-o", str(out),
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise NativeBuildError(
            f"native build failed: {' '.join(cmd)}\n{proc.stderr}"
        )


def load_library(name: str = "graph") -> ctypes.CDLL:
    """Compile (if needed) and dlopen the named native module.

    The cached .so lives next to the source, keyed by a source hash so
    edits trigger rebuilds.
    """
    with _LOCK:
        if name in _CACHE:
            return _CACHE[name]
        src = _DIR / f"{name}.cc"
        if not src.exists():
            raise NativeBuildError(f"no native source {src}")
        digest = hashlib.sha256(src.read_bytes()).hexdigest()[:16]
        out = _DIR / f"lib_otpu_{name}_{digest}.so"
        if not out.exists():
            # clean stale builds of this module
            for old in _DIR.glob(f"lib_otpu_{name}_*.so"):
                try:
                    old.unlink()
                except OSError:
                    pass
            _build(src, out)
        try:
            lib = ctypes.CDLL(str(out))
        except OSError:
            # a stale/foreign-arch binary was on disk: rebuild from source
            try:
                out.unlink()
            except OSError:
                pass
            _build(src, out)
            lib = ctypes.CDLL(str(out))
        _CACHE[name] = lib
        return lib
