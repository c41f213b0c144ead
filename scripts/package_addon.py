"""Build the installable Blender add-on zip (``update_zip.py`` parity).

Zips the ``sculptmate_tpu`` package (skipping caches, checkpoints, native
build artifacts, and VCS metadata) into ``SculptMateTPU.zip`` at the repo
root.
"""

from __future__ import annotations

import os
import zipfile

SKIP_DIRS = {".git", "__pycache__", "checkpoints", "assets", "_update_staging"}
SKIP_SUFFIXES = (".pyc", ".so", ".o")


def build(out_path: str = "SculptMateTPU.zip") -> str:
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_root = os.path.join(repo_root, "sculptmate_tpu")
    out = os.path.join(repo_root, out_path)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(pkg_root):
            dirnames[:] = [d for d in dirnames if d not in SKIP_DIRS]
            for fn in filenames:
                if fn.endswith(SKIP_SUFFIXES):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, repo_root)
                z.write(full, rel)
    return out


if __name__ == "__main__":
    print(build())
