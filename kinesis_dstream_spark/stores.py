"""Crash-safe on-disk store swap, shared by every foreachBatch state
rewrite, the compaction passes, and physical erasure.

The naive ``rmtree(cur); rename(tmp, cur)`` has a window where a crash
leaves NO store at the live path. ``swap_dir`` renames the live
directory aside first, so at every instant the live path holds either
the complete old store or the complete new one — and in the one-rename
window where it briefly holds nothing, both full copies still exist on
disk (``cur_old`` and ``tmp``), making recovery mechanical rather than
forensic. Leftover ``_old`` dirs from a crashed swap are swept on the
next swap of the same path.

(rename(2) is atomic per call on POSIX; two renames cannot be made
jointly atomic without an extra indirection layer — a versioned
manifest file — which these fixture-scale stores don't warrant. The
docstrings at the call sites state exactly this guarantee.)
"""

from __future__ import annotations

import os
import shutil


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
