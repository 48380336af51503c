"""Shared generation-store primitives for the persisted incremental
artifacts (``streaming/cagg.py``, ``streaming/dedup_index.py``).

Both stores follow the same commit protocol — write a fresh generation
directory, then atomically swap one manifest JSON that maps partition
keys to their owning generation — so the crash-critical pieces live
here ONCE: the atomic swap, the corrupt-manifest load policy (raise
loudly, never silently reset a store), the superseded-generation gc
with a grace window, and the by-generation partition read. The stores
keep their own manifest SCHEMAS (cagg carries legacy-layout adoption;
the dedup index carries run namespaces and the bucket count) — only the
mechanics are shared.
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

try:  # flock is POSIX-only; the CAS check at commit covers its absence
    import fcntl as _fcntl
except ImportError:  # pragma: no cover - non-POSIX host
    _fcntl = None


class ConcurrentWriteError(RuntimeError):
    """Two writers raced on one store manifest: a commit landed inside
    another writer's read->merge->swap window. The losing writer's
    generation directory is an orphan (overwritten or gc'd later); the
    store itself is consistent. Re-invoke the failed operation — it
    re-reads the committed manifest and applies on top."""


@contextlib.contextmanager
def writer_lock(manifest_path: str):
    """Serialize store WRITERS (register / update_batch / rebucket)
    across threads and processes: flock on ``<manifest>.lock`` held for
    the WHOLE read->merge->write->swap window, so a writer landing
    inside another's window waits, then applies on top of the committed
    state — never silently superseded, and two writers can never
    interleave writes into the same generation directory. flock is
    released by the OS on crash (no stale-lock recovery), and it is
    per-open-file-description, so threads in one process exclude each
    other too. On filesystems without flock the ``cas_check`` at commit
    remains the (loud-failure) tripwire. For an object store, replace
    with a conditional-put on the manifest key."""
    os.makedirs(os.path.dirname(manifest_path) or ".", exist_ok=True)
    with open(manifest_path + ".lock", "a") as lk:
        if _fcntl is not None:
            try:
                _fcntl.flock(lk, _fcntl.LOCK_EX)
            except OSError:
                pass  # flock-less mount: fall through to the CAS check
        try:
            yield
        finally:
            if _fcntl is not None:
                try:
                    _fcntl.flock(lk, _fcntl.LOCK_UN)
                except OSError:
                    pass


def cas_check(what: str, path: str, expected, current) -> None:
    """Compare-and-swap guard at the commit point: ``expected`` is the
    commit token (gen_seq / batch_id) the writer derived its work from,
    ``current`` is a fresh re-read under the writer lock. A mismatch
    means a non-cooperating writer committed inside our window — raise
    loudly rather than silently supersede its commit."""
    if expected != current:
        raise ConcurrentWriteError(
            f"{what} store at {path}: commit token moved {expected!r} -> "
            f"{current!r} during this writer's window; another writer "
            "committed concurrently (writers must serialize through "
            "writer_lock). Re-invoke this operation to apply it on top "
            "of the committed state."
        )


def mint_store_id(man: dict) -> str:
    """The store-instance nonce: minted at the first commit, carried
    verbatim through every later manifest swap. Per-process caches key
    on it so a store deleted and recreated at the same path (gen_seq
    restarts at 0) can never serve cached frames from the dead store."""
    return man.get("store_id") or uuid.uuid4().hex


def store_nonce(manifest_path: str, store_id) -> str:
    """Cache-key component identifying the store INSTANCE at a path:
    the manifest's store_id when present, else a stat fingerprint of
    the manifest file (pre-store_id manifests upgrade at their next
    commit) — either way a recreated store yields a different nonce."""
    if store_id:
        return str(store_id)
    try:
        st = os.stat(manifest_path)
        return f"st:{st.st_ino}:{st.st_mtime_ns}"
    except OSError:
        return "absent"


def atomic_json_swap(path: str, obj: dict) -> None:
    """Write ``obj`` next to ``path`` and ``os.replace`` it into place —
    the POSIX-atomic commit point both stores rely on."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def load_json_manifest(path: str, what: str):
    """Read + parse a manifest. Returns ``None`` when the file does not
    exist (caller decides: fresh store or legacy adoption). An
    existing-but-unparseable manifest RAISES: falling back to an empty
    manifest would silently reset the store — readers see no data and
    the next replayed batch re-merges from scratch, a silent
    double-count."""
    try:
        with open(path) as f:
            raw = f.read()
    except FileNotFoundError:
        return None
    try:
        return json.loads(raw)
    except ValueError as exc:
        raise RuntimeError(
            f"corrupt {what} manifest at {path}: {exc}; recover by "
            "rebuilding it from the gen/<n> directories (the data files "
            "are intact — the manifest is the only pointer), do NOT "
            "delete the store"
        ) from exc


def gc_superseded(store_path: str, live_gens, gc_keep: int) -> None:
    """Best-effort removal of generation dirs no longer referenced,
    RETAINING the ``gc_keep`` newest superseded generations as a grace
    window so a reader holding a lazy DataFrame resolved against a
    recent manifest survives the next few commits. Non-integer dir
    names (foreign files) are never touched."""
    live = {str(g) for g in live_gens}
    root = os.path.join(store_path, "gen")
    try:
        gens = os.listdir(root)
    except OSError:
        return
    superseded = sorted(
        (g for g in gens if g not in live and g.lstrip("-").isdigit()), key=int
    )
    for g in superseded[: max(0, len(superseded) - gc_keep)]:
        shutil.rmtree(os.path.join(root, g), ignore_errors=True)


def read_partitions(
    spark: SparkSession,
    gen_dir_for,
    part_col: str,
    owners: dict,
    keys,
) -> DataFrame | None:
    """Union the manifest-selected partitions (``<part_col>=<key>`` dirs),
    grouped by owning generation so each read keeps its basePath (which
    restores the partition column). ``owners`` maps key -> generation;
    ``gen_dir_for`` resolves a generation to its directory."""
    by_gen: dict[str, list[str]] = {}
    for k in keys:
        g = owners.get(str(k))
        if g is not None:
            by_gen.setdefault(str(g), []).append(str(k))
    parts = []
    for g, ks in by_gen.items():
        base = gen_dir_for(g)
        paths = [os.path.join(base, f"{part_col}={k}") for k in ks]
        parts.append(spark.read.option("basePath", base).parquet(*paths))
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
