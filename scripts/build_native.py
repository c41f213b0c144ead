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

NATIVE = ["quadric_decimate", "isotropic_remesh", "unwrap_overlap", "mc_wire", "mt_wire"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    # force a rebuild decision through the same path the runtime uses
    from sculptmate_tpu.geometry.native import load_native, _DIR

    failed = []
    for name in NATIVE:
        lib = load_native(name)
        path = os.path.join(_DIR, f"lib{name}.so")
        if lib is None:
            failed.append(name)
            print(f"FAIL  {name}  (g++ build or dlopen failed)")
        else:
            print(f"ok    {name}  -> {path}  ({os.path.getsize(path)} B)")
    if failed and args.check:
        print(f"{len(failed)} native libraries failed: {failed}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
