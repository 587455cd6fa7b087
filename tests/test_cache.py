"""Compile-cache lifecycle: info / export / import round trip.

The archive mechanics (manifest fingerprint, safety checks, merge
semantics) are testable without real XLA cache entries — the entry
files are opaque bytes to these tools by design.  One end-to-end test
verifies a real jit compile lands persistent entries that survive the
round trip.
"""

import io
import json
import os
import tarfile

import pytest

from bm25_tpu.cli.main import main
from bm25_tpu.runtime import cache as cc


def _fake_cache(tmp_path, n=3):
    d = tmp_path / "cache"
    d.mkdir()
    for i in range(n):
        (d / f"jit_step_{i}-deadbeef{i}").write_bytes(b"x" * (100 + i))
    return str(d)


def test_info_missing_dir(tmp_path):
    info = cc.cache_info(str(tmp_path / "nope"))
    assert info["exists"] is False and info["entries"] == 0


def test_export_import_roundtrip(tmp_path):
    src = _fake_cache(tmp_path)
    archive = str(tmp_path / "cache.tar.gz")
    out = cc.export_cache(archive, path=src)
    assert out["entries"] == 3
    assert os.path.getsize(archive) > 0
    # manifest records this host's fingerprint
    assert out["manifest"]["fingerprint"]["jax"] is not None

    dest = str(tmp_path / "dest")
    res = cc.import_cache(archive, path=dest)
    assert res["imported"] == 3 and res["mismatches"] == []
    assert sorted(os.listdir(dest)) == sorted(os.listdir(src))
    for name in os.listdir(src):
        assert (
            open(os.path.join(dest, name), "rb").read()
            == open(os.path.join(src, name), "rb").read()
        )


def test_export_missing_or_empty(tmp_path):
    with pytest.raises(FileNotFoundError):
        cc.export_cache(str(tmp_path / "a.tar.gz"), path=str(tmp_path / "no"))
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ValueError, match="no entries"):
        cc.export_cache(str(tmp_path / "a.tar.gz"), path=str(empty))


def test_import_fingerprint_mismatch_refused(tmp_path):
    src = _fake_cache(tmp_path)
    archive = str(tmp_path / "cache.tar.gz")
    cc.export_cache(archive, path=src)

    # rewrite the manifest with a foreign device kind
    doctored = str(tmp_path / "doctored.tar.gz")
    with tarfile.open(archive, "r:gz") as tar, \
            tarfile.open(doctored, "w:gz") as out:
        for m in tar.getmembers():
            f = tar.extractfile(m)
            data = f.read()
            if m.name == cc.MANIFEST_NAME:
                manifest = json.loads(data)
                manifest["fingerprint"]["device_kind"] = "TPU v9 imaginary"
                manifest["fingerprint"]["jaxlib"] = "0.0.1"
                data = json.dumps(manifest).encode()
            info = tarfile.TarInfo(m.name)
            info.size = len(data)
            out.addfile(info, io.BytesIO(data))

    dest = str(tmp_path / "dest")
    with pytest.raises(ValueError, match="different environment"):
        cc.import_cache(doctored, path=dest)
    assert not os.path.isdir(dest) or os.listdir(dest) == []

    # --force imports anyway and reports what mismatched
    res = cc.import_cache(doctored, path=dest, force=True)
    assert res["imported"] == 3
    assert any("jaxlib" in m for m in res["mismatches"])


def test_import_rejects_path_traversal(tmp_path):
    evil = str(tmp_path / "evil.tar.gz")
    with tarfile.open(evil, "w:gz") as tar:
        data = b"pwned"
        info = tarfile.TarInfo("../escape.bin")
        info.size = len(data)
        tar.addfile(info, io.BytesIO(data))
    with pytest.raises(ValueError, match="unsafe path"):
        cc.import_cache(evil, path=str(tmp_path / "dest"))
    assert not (tmp_path / "escape.bin").exists()


def test_import_rejects_links(tmp_path):
    evil = str(tmp_path / "link.tar.gz")
    with tarfile.open(evil, "w:gz") as tar:
        info = tarfile.TarInfo("entry")
        info.type = tarfile.SYMTYPE
        info.linkname = "/etc/passwd"
        tar.addfile(info)
    with pytest.raises(ValueError, match="non-file"):
        cc.import_cache(evil, path=str(tmp_path / "dest"))


def test_import_merges_into_existing(tmp_path):
    src = _fake_cache(tmp_path)
    archive = str(tmp_path / "cache.tar.gz")
    cc.export_cache(archive, path=src)
    dest = tmp_path / "dest"
    dest.mkdir()
    (dest / "preexisting-entry").write_bytes(b"keep me")
    res = cc.import_cache(archive, path=str(dest))
    assert res["imported"] == 3
    assert (dest / "preexisting-entry").read_bytes() == b"keep me"
    assert len(os.listdir(dest)) == 4


def test_cli_surface(tmp_path, capsys):
    src = _fake_cache(tmp_path)
    archive = str(tmp_path / "c.tar.gz")

    assert main(["cache", "info", "--dir", src]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["entries"] == 3

    assert main(["cache", "export", archive, "--dir", src]) == 0
    capsys.readouterr()

    dest = str(tmp_path / "dest")
    assert main(["cache", "import", archive, "--dir", dest]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["imported"] == 3

    # missing archive argument
    assert main(["cache", "export", "--dir", src]) == 2
    # export of a missing dir fails cleanly
    assert main(["cache", "export", archive,
                 "--dir", str(tmp_path / "absent")]) == 2


def test_real_compile_lands_entries_and_roundtrips(tmp_path, monkeypatch):
    """End to end: a jit compile writes persistent entries; the archive
    round trip preserves them byte-for-byte."""
    import jax
    import jax.numpy as jnp

    cache_dir = str(tmp_path / "real")
    os.makedirs(cache_dir)
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

        @jax.jit
        def step(x):
            return jnp.tanh(x) @ x.T + 20260818.0

        step(jnp.ones((17, 13), jnp.float32)).block_until_ready()
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", prev_min)

    info = cc.cache_info(cache_dir)
    if info["entries"] == 0:
        pytest.skip("this jax build did not persist CPU cache entries")
    archive = str(tmp_path / "real.tar.gz")
    cc.export_cache(archive, path=cache_dir)
    dest = str(tmp_path / "real_dest")
    res = cc.import_cache(archive, path=dest)
    assert res["imported"] == info["entries"]
