"""Native host-side geometry kernels (C++ via ctypes).

Sequential algorithms that resist both XLA and vectorization — quadric
edge-collapse decimation — live here, mirroring the reference's use of native
DLLs for its sequential geometry (``sf3d/uv_unwrapper/uv_unwrapper.dll``,
``sf3d/texture_baker/texture_baker.dll``). Unlike the reference, sources are
vendored and built on first use with g++.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIBS = {}


def load_native(name: str) -> Optional[ctypes.CDLL]:
    """Compile (once) and load lib<name>.so from <name>.cpp; None on failure."""
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        src = os.path.join(_DIR, f"{name}.cpp")
        lib = os.path.join(_DIR, f"lib{name}.so")
        try:
            if not os.path.isfile(lib) or os.path.getmtime(lib) < os.path.getmtime(src):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", src, "-o", lib],
                    check=True,
                    capture_output=True,
                )
            _LIBS[name] = ctypes.CDLL(lib)
        except Exception:
            _LIBS[name] = None
        return _LIBS[name]
