"""Updater + download layer (network mocked / local files)."""

import io
import json
import os
import zipfile

import pytest

from sculptmate_tpu.addon.updater import AddonUpdater, _parse_version
from sculptmate_tpu.runtime.downloads import DownloadResult, ensure_checkpoint, fetch


def test_parse_version():
    assert _parse_version("v1.2.3") == (1, 2, 3)
    assert _parse_version("0.5") == (0, 5)
    assert _parse_version("v2.0-rc1") == (2, 0)


def test_updater_check_and_apply(tmp_path, monkeypatch):
    install = tmp_path / "addon"
    install.mkdir()
    (install / "old.py").write_text("old = 1\n")

    updater = AddonUpdater(
        user="x", repo="y", current_version=(0, 1, 0), install_dir=str(install)
    )

    monkeypatch.setattr(
        updater,
        "_fetch_json",
        lambda url: {"tag_name": "v0.2.0", "zipball_url": "http://example/zip"},
    )
    newer, tag, zip_url = updater.check()
    assert newer and tag == "v0.2.0"

    # stage a fake release tree and apply it
    staged = tmp_path / "staged"
    staged.mkdir()
    (staged / "new.py").write_text("new = 2\n")
    backup = updater.apply(str(staged))
    assert (install / "new.py").exists()
    assert os.path.isdir(backup)
    assert (tmp_path / "addon_backup" / "old.py").exists()

    # restore brings old.py back
    (install / "old.py").unlink()
    updater.restore(backup)
    assert (install / "old.py").exists()


def test_updater_not_newer(monkeypatch, tmp_path):
    updater = AddonUpdater(
        user="x", repo="y", current_version=(1, 0, 0), install_dir=str(tmp_path)
    )
    monkeypatch.setattr(
        updater, "_fetch_json", lambda url: {"tag_name": "v0.9", "zipball_url": "u"}
    )
    newer, _, _ = updater.check()
    assert not newer


def test_fetch_local_file(tmp_path):
    src = tmp_path / "blob.bin"
    src.write_bytes(b"x" * 1024)
    dest = tmp_path / "out" / "blob.bin"
    seen = []
    res = fetch(
        src.as_uri(), str(dest), progress=lambda d, t: seen.append((d, t))
    )
    assert res.ok and dest.read_bytes() == b"x" * 1024
    assert seen and seen[-1][0] == 1024


def test_fetch_failure_reports_error(tmp_path):
    res = fetch("file:///nonexistent/nope", str(tmp_path / "x"), retries=2)
    assert not res.ok and res.error


def test_ensure_checkpoint_existing(tmp_path):
    (tmp_path / "model.ckpt").write_bytes(b"ok")
    res = ensure_checkpoint("model.ckpt", checkpoint_dir=str(tmp_path))
    assert res.ok and res.path.endswith("model.ckpt")


def test_ensure_checkpoint_unknown(tmp_path):
    res = ensure_checkpoint("mystery.bin", checkpoint_dir=str(tmp_path))
    assert not res.ok and "no known URL" in res.error
