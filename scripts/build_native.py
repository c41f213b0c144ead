"""Build all native (C++ -> .so) geometry kernels ahead of time.

The runtime loader (``geometry/native/__init__.py:load_native``) already
compiles each library on first use; this script exists for packaging (wheel /
add-on zip builds ship prebuilt .so files) and for CI to fail loudly if the
toolchain can't build any of them.

Usage: python scripts/build_native.py [--check]
  --check: exit non-zero if any library fails to build/load.
"""

import argparse
import os
import sys

NATIVE = [
    "quadric_decimate", "isotropic_remesh", "unwrap_overlap", "mc_wire",
    "mt_wire", "uv_reconstruct",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    # Build the PORTABLE shipped .so explicitly: the runtime loader prefers
    # a host-optimized (-march=native) build in the user cache, so going
    # through load_native would leave a stale in-tree binary.
    import ctypes

    from sculptmate_tpu.geometry.native import _build, _DIR

    failed = []
    for name in NATIVE:
        src = os.path.join(_DIR, f"{name}.cpp")
        path = os.path.join(_DIR, f"lib{name}.so")
        try:
            _build(src, path)
            ctypes.CDLL(path)
            print(f"ok    {name}  -> {path}  ({os.path.getsize(path)} B)")
        except Exception as e:
            failed.append(name)
            print(f"FAIL  {name}  (g++ build or dlopen failed: {e})")
    if failed and args.check:
        print(f"{len(failed)} native libraries failed: {failed}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
