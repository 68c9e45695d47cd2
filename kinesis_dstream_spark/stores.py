"""Crash-safe on-disk store primitives, shared by every foreachBatch
state rewrite, the compaction passes, physical erasure, and (r10, the
one-seam verdict task) every persisted store's JSON meta sidecar.

Two invariants, one module:

1. **Directory swap** (``swap_dir``): the naive ``rmtree(cur);
   rename(tmp, cur)`` has a window where a crash leaves NO store at the
   live path. ``swap_dir`` renames the live directory aside first, so
   at every instant the live path holds either the complete old store
   or the complete new one — and in the one-rename window where it
   briefly holds nothing, both full copies still exist on disk
   (``cur_old`` and ``tmp``), making recovery mechanical rather than
   forensic. Leftover ``_old`` dirs from a crashed swap are swept on
   the next swap of the same path.
2. **Meta sidecar** (``read_meta`` / ``write_meta`` / ``remove_meta``):
   every persisted store in the repo (ANN index, dedup index, pairs
   artifact, IVF-det / IVF-PQ-det codes, chunk store, granule store)
   marks "this build is complete and belongs to THIS corpus+params"
   with a ``_meta.json`` written LAST. The write is temp-file +
   ``os.replace`` so a crash mid-write can never leave a truncated
   JSON that bricks the store (the r9-ADVICE failure: a torn
   read-modify-write made every later ensure/append/serve raise
   JSONDecodeError instead of rebuilding). A sidecar that is absent OR
   unparseable reads as ``None`` — "no complete build" — so recovery
   is always "rebuild", never "delete by hand".

Object-store caveat (the 100 TB home — stated once here for all
stores, see SCALE.md §stores): POSIX ``rename(2)`` is atomic per call;
S3-class object stores have no rename at all (copy+delete) and no
atomic directory operations. There, both invariants move behind a
versioned-manifest indirection (write new objects under a fresh
version prefix, then atomically CAS a single manifest pointer — the
Iceberg/Delta commit protocol). These fixture-scale local stores don't
warrant the manifest layer; the seam in this module is exactly where
it would slot in, with no call-site changes.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

META_NAME = "_meta.json"


def swap_dir(tmp: str, cur: str) -> None:
    """Promote ``tmp`` to ``cur``: aside-rename, promote, sweep."""
    old = cur.rstrip("/") + "_old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(cur):
        os.rename(cur, old)
    os.rename(tmp, cur)
    if os.path.exists(old):
        shutil.rmtree(old)


def read_meta(store_dir: str, name: str = META_NAME) -> dict | None:
    """The store's meta sidecar, or ``None`` when the store has no
    complete build: absent, unreadable, or torn-JSON sidecars all read
    as None (an unparseable sidecar means a crash beat the atomic
    protocol below into the store — e.g. a pre-seam writer — and the
    only safe interpretation is "rebuild")."""
    try:
        with open(os.path.join(store_dir, name)) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def write_meta(store_dir: str, meta: dict, name: str = META_NAME) -> None:
    """Atomically (re)write the meta sidecar: serialize to a temp file
    in the SAME directory, then ``os.replace`` — one atomic rename, so
    readers see either the complete old JSON or the complete new one,
    never a truncation. Call this LAST in any build/append: the
    sidecar's presence-and-parseability IS the completeness marker."""
    os.makedirs(store_dir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=store_dir, prefix="._meta_", suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(store_dir, name))
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def remove_meta(store_dir: str, name: str = META_NAME) -> None:
    """Poison the store BEFORE a rebuild starts overwriting data files
    (the r9-ADVICE rebuild-ordering fix): with the sidecar gone, a
    crash mid-rebuild leaves a store that reads as incomplete (ensure
    rebuilds; frozen serving refuses) instead of an old valid meta
    sitting next to half-rewritten data."""
    try:
        os.unlink(os.path.join(store_dir, name))
    except FileNotFoundError:
        pass
