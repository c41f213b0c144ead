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


def _cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    path = os.path.join(base, "sculptmate_tpu", "native")
    os.makedirs(path, exist_ok=True)
    return path


_HOST_TAG = None


def _host_tag() -> str:
    """CPU fingerprint for the -march=native cache filename: a cache dir on
    a shared/copied home (NFS, container images) must not hand an AVX-512
    build to a host without it — dlopen succeeds and the process dies with
    SIGILL at the first call, which no try/except can catch."""
    global _HOST_TAG
    if _HOST_TAG is None:
        import hashlib
        import platform

        desc = platform.machine()
        try:
            with open("/proc/cpuinfo") as fh:
                for line in fh:
                    if line.startswith(("flags", "Features")):
                        desc += line
                        break
        except OSError:
            desc += platform.processor()
        _HOST_TAG = hashlib.md5(desc.encode()).hexdigest()[:10]
    return _HOST_TAG


def _build(src: str, out: str, native_arch: bool = False) -> None:
    flags = ["-O3", "-shared", "-fPIC", "-pthread"]
    if native_arch:
        flags += ["-march=native", "-funroll-loops"]
    # write-then-rename: concurrent processes may race on the cache path
    tmp = f"{out}.{os.getpid()}.tmp"
    subprocess.run(
        ["g++", *flags, src, "-o", tmp], check=True, capture_output=True
    )
    os.replace(tmp, out)


def load_native(name: str) -> Optional[ctypes.CDLL]:
    """Compile (once) and load lib<name>.so from <name>.cpp; None on failure.

    Load order: (1) a host-optimized (-march=native) build in the per-user
    cache dir — built once per machine; the decimator's cache-bound loops run
    ~25% faster with AVX-512 than the portable shipped binary — (2) the
    shipped/prebuilt portable .so next to the source (rebuilt in place when
    stale and the directory is writable), (3) a portable rebuild into the
    cache dir (read-only site-packages, wrong-platform shipped ELF). Only
    when all fail is None cached.
    """
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        src = os.path.join(_DIR, f"{name}.cpp")
        lib = os.path.join(_DIR, f"lib{name}.so")
        handle = None
        if os.path.isfile(src):
            try:
                # host-tagged filename: a -march=native ELF is only valid on
                # the CPU that built it (see _host_tag); the portable
                # last-resort build below uses the untagged name, so the two
                # never collide either
                cached = os.path.join(
                    _cache_dir(), f"lib{name}.{_host_tag()}.so"
                )
                if (
                    not os.path.isfile(cached)
                    or os.path.getmtime(cached) < os.path.getmtime(src)
                ):
                    _build(src, cached, native_arch=True)
                handle = ctypes.CDLL(cached)
            except Exception:
                handle = None
        if handle is None:
            try:
                if os.path.isfile(src) and (
                    not os.path.isfile(lib)
                    or os.path.getmtime(lib) < os.path.getmtime(src)
                ):
                    _build(src, lib)
                handle = ctypes.CDLL(lib)
            except Exception:
                # last resort: portable build into the user cache (covers a
                # wrong-platform shipped ELF in a read-only install)
                try:
                    cached = os.path.join(_cache_dir(), f"lib{name}.so")
                    _build(src, cached)
                    handle = ctypes.CDLL(cached)
                except Exception:
                    handle = None
        _LIBS[name] = handle
        return _LIBS[name]
