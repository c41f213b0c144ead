"""load_native fallback behavior (round-2 advisor finding #1).

A shipped prebuilt .so that fails to dlopen (wrong platform ELF) with an
mtime >= the source's must NOT poison the cache with None: the loader must
rebuild from source into the per-user cache dir and load that.
"""

import os

import pytest


def _write_tiny_lib(src_dir):
    src = src_dir / "tiny_addone.cpp"
    src.write_text('extern "C" int addone(int x) { return x + 1; }\n')
    return src


def test_bad_prebuilt_so_rebuilds_into_user_cache(tmp_path, monkeypatch):
    from sculptmate_tpu.geometry import native

    src_dir = tmp_path / "pkg"
    src_dir.mkdir()
    src = _write_tiny_lib(src_dir)

    # a corrupt "prebuilt" whose mtime is NEWER than the source: the
    # in-place staleness check passes, dlopen fails -> cache-dir rebuild
    bad = src_dir / "libtiny_addone.so"
    bad.write_bytes(b"\x7fNOT-AN-ELF")
    st = os.stat(src)
    os.utime(bad, (st.st_atime + 10, st.st_mtime + 10))

    cache_root = tmp_path / "xdg"
    monkeypatch.setenv("XDG_CACHE_HOME", str(cache_root))
    monkeypatch.setattr(native, "_DIR", str(src_dir))
    native._LIBS.pop("tiny_addone", None)
    try:
        lib = native.load_native("tiny_addone")
        assert lib is not None, "loader cached None instead of rebuilding"
        assert lib.addone(2) == 3
        # the -march=native cache build carries a host-CPU tag in its name
        # (a shared cache dir must never hand an AVX-512 ELF to another CPU)
        cached = (
            cache_root
            / "sculptmate_tpu"
            / "native"
            / f"libtiny_addone.{native._host_tag()}.so"
        )
        assert cached.is_file()
        # and the corrupt shipped blob was left alone (read-only installs)
        assert bad.read_bytes().startswith(b"\x7fNOT-AN-ELF")
    finally:
        native._LIBS.pop("tiny_addone", None)


def test_host_tag_is_stable_and_filename_safe():
    from sculptmate_tpu.geometry import native

    t1, t2 = native._host_tag(), native._host_tag()
    assert t1 == t2 and len(t1) == 10 and t1.isalnum()


def test_missing_source_and_lib_caches_none(tmp_path, monkeypatch):
    from sculptmate_tpu.geometry import native

    monkeypatch.setattr(native, "_DIR", str(tmp_path))
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "xdg"))
    native._LIBS.pop("no_such_kernel", None)
    try:
        assert native.load_native("no_such_kernel") is None
        # cached: second call must not retry the build
        assert native._LIBS["no_such_kernel"] is None
    finally:
        native._LIBS.pop("no_such_kernel", None)
