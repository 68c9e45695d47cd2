"""Shared helpers for oracle-parity comparison (tests + tools).

Canonicalization mirrors what an order-insensitive value-hash comparison
needs: floats normalized (integral floats, -0.0, NaN), rows sorted, and
columns ordered by name.
"""

from __future__ import annotations

import hashlib


def canon_cell(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if v != v:
            return "<nan>"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v) + 0)  # +0 folds -0.0 into 0
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(v)
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    """Rows as canonical string tuples with columns sorted by name."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon_cell(r[i]) for i in order) for r in rows)


def frame_fingerprint(cols: list[str], rows: list[tuple]) -> str:
    h = hashlib.sha256()
    for row in canon_rows(cols, rows):
        h.update("\x1f".join(row).encode())
        h.update(b"\n")
    return h.hexdigest()
