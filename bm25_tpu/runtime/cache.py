"""Persistent compile-cache lifecycle: inspect, export, import.

``enable_persistent_compile_cache`` (runtime/session.py) makes every
compiled query step land in an on-disk cache, which amortizes repeat
starts *on the same host*.  The remaining deploy cost is the FIRST start
on a fresh host: a new serving machine pays full XLA compiles for every
shape in the engine's dispatch family — observed 441-455 s through a
remote-compile relay (NOTES.md), all of it avoidable because another
host already compiled the identical family.

These helpers make the cache a shippable artifact:

- ``bm25-tpu warm`` on a build host populates the cache,
- ``export_cache`` tars it with an environment manifest,
- ``import_cache`` on the serving host validates the manifest (XLA cache
  keys bake in jaxlib version and device kind — a mismatched archive
  would import cleanly and then miss on every lookup, which looks like
  "warm didn't work"; refusing with a reason is kinder) and unpacks.

The reference has no compile step and nothing to ship
(SURVEY.md section 0 — MAX recompiles its graph per process); this is
TPU-native operational tooling for XLA's compile-once model.
"""

from __future__ import annotations

import json
import os
import tarfile
import tempfile

MANIFEST_NAME = "__bm25_cache_manifest__.json"


def resolve_cache_dir(path: str | None = None) -> str:
    """The cache directory these tools operate on.

    Precedence: explicit argument > the dir jax is already configured
    with > ``BM25_TPU_COMPILE_CACHE`` > the session.py default.  Never
    initializes a backend.
    """
    if path:
        return path
    try:
        import jax

        configured = jax.config.jax_compilation_cache_dir
        if configured:
            return configured
    except Exception:
        pass
    return os.environ.get(
        "BM25_TPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "jax_bm25"),
    )


def _entry_names(cache_dir: str) -> list[str]:
    """Cache entry files, relative paths, manifest excluded."""
    names: list[str] = []
    for root, _dirs, files in os.walk(cache_dir):
        for f in files:
            rel = os.path.relpath(os.path.join(root, f), cache_dir)
            if rel != MANIFEST_NAME:
                names.append(rel)
    return sorted(names)


def environment_fingerprint() -> dict:
    """The facts that determine whether cache entries can ever hit.

    XLA's persistent-cache key hashes the compile environment; jax/jaxlib
    version or device-kind drift means every lookup misses.  Backend
    initialization can fail on a build box with no accelerator — then the
    device fields are None and import-side validation skips them.
    """
    fp: dict = {"jax": None, "jaxlib": None, "platform": None,
                "device_kind": None}
    try:
        import jax

        fp["jax"] = jax.__version__
        try:
            import jaxlib

            fp["jaxlib"] = jaxlib.__version__
        except Exception:
            pass
        try:
            dev = jax.devices()[0]
            fp["platform"] = dev.platform
            fp["device_kind"] = dev.device_kind
        except Exception:
            pass
    except Exception:
        pass
    return fp


def cache_info(path: str | None = None) -> dict:
    cache_dir = resolve_cache_dir(path)
    if not os.path.isdir(cache_dir):
        return {"path": cache_dir, "exists": False, "entries": 0, "bytes": 0}
    names = _entry_names(cache_dir)
    total = sum(
        os.path.getsize(os.path.join(cache_dir, n))
        for n in names
        if os.path.isfile(os.path.join(cache_dir, n))
    )
    return {"path": cache_dir, "exists": True, "entries": len(names),
            "bytes": total}


def export_cache(dest: str, path: str | None = None) -> dict:
    """Tar the cache with an environment manifest -> ``dest`` (.tar.gz).

    Raises ``FileNotFoundError`` on a missing dir and ``ValueError`` on an
    empty one — exporting zero entries is always a deploy-pipeline bug
    (warm didn't run, or ran against a different cache dir).
    """
    cache_dir = resolve_cache_dir(path)
    if not os.path.isdir(cache_dir):
        raise FileNotFoundError(
            f"compile cache dir does not exist: {cache_dir} "
            f"(run `bm25-tpu warm` first)"
        )
    names = _entry_names(cache_dir)
    if not names:
        raise ValueError(
            f"compile cache at {cache_dir} has no entries; "
            f"run `bm25-tpu warm` against the deploy engine first"
        )
    manifest = {
        "format": 1,
        "entries": len(names),
        "fingerprint": environment_fingerprint(),
    }
    # write to a temp file in the destination directory and rename, so a
    # crashed export can't leave a truncated archive that a later deploy
    # step trusts
    dest_dir = os.path.dirname(os.path.abspath(dest)) or "."
    os.makedirs(dest_dir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=dest_dir, suffix=".partial")
    os.close(fd)
    try:
        with tarfile.open(tmp, "w:gz") as tar:
            mf = tempfile.NamedTemporaryFile("w", suffix=".json", delete=False)
            try:
                json.dump(manifest, mf)
                mf.close()
                tar.add(mf.name, arcname=MANIFEST_NAME)
            finally:
                os.unlink(mf.name)
            for n in names:
                tar.add(os.path.join(cache_dir, n), arcname=n)
        os.replace(tmp, dest)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return {"dest": dest, "entries": len(names),
            "bytes": os.path.getsize(dest), "manifest": manifest}


def _safe_members(tar: tarfile.TarFile) -> list[tarfile.TarInfo]:
    """Regular files with normalized relative paths only.

    An archive is deploy-pipeline input, not trusted input: refuse
    absolute paths, parent escapes, and links outright.
    """
    members = []
    for m in tar.getmembers():
        name = m.name
        if not m.isfile():
            if m.isdir():
                continue  # directories are re-created implicitly
            raise ValueError(f"refusing non-file member in archive: {name!r}")
        norm = os.path.normpath(name)
        if norm.startswith(("/", "..")) or os.path.isabs(norm):
            raise ValueError(f"refusing unsafe path in archive: {name!r}")
        members.append(m)
    return members


def import_cache(src: str, path: str | None = None,
                 force: bool = False) -> dict:
    """Unpack an exported cache archive into the local cache dir.

    Validates the manifest fingerprint against this host: jax/jaxlib
    version or device-kind drift means the entries can never hit, so a
    mismatch raises (``force=True`` imports anyway and reports the
    mismatches — harmless, every lookup just misses).  Fingerprint
    fields that are None on either side are skipped: a CPU build box
    legitimately exports for a TPU serving host only when versions
    match, and device fields may be unprobeable.
    """
    cache_dir = resolve_cache_dir(path)
    with tarfile.open(src, "r:gz") as tar:
        members = _safe_members(tar)
        manifest = None
        rest = []
        for m in members:
            if m.name == MANIFEST_NAME:
                f = tar.extractfile(m)
                manifest = json.load(f) if f is not None else None
            else:
                rest.append(m)
        mismatches: list[str] = []
        if manifest is not None:
            theirs = manifest.get("fingerprint", {})
            ours = environment_fingerprint()
            for key in ("jax", "jaxlib", "platform", "device_kind"):
                a, b = theirs.get(key), ours.get(key)
                if a is not None and b is not None and a != b:
                    mismatches.append(f"{key}: archive={a!r} host={b!r}")
        if mismatches and not force:
            raise ValueError(
                "cache archive was built for a different environment "
                "(entries would never hit): " + "; ".join(mismatches)
                + ". Pass --force to import anyway."
            )
        os.makedirs(cache_dir, exist_ok=True)
        for m in rest:
            # belt and braces on top of _safe_members: the stdlib 'data'
            # filter also strips mode bits/ownership and re-checks paths
            # (and silences the Python 3.12+ unfiltered-extract warning)
            try:
                tar.extract(m, cache_dir, filter="data")
            except TypeError:  # Python < 3.12
                tar.extract(m, cache_dir)
    return {
        "path": cache_dir,
        "imported": len(rest),
        "mismatches": mismatches,
        "manifest": manifest,
    }
