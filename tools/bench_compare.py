"""Compare two bench JSON records (e.g. BENCH_r03.json vs BENCH_r04.json).

Usage: ``python tools/bench_compare.py OLD.json NEW.json``

Prints a markdown table of per-query deltas over the SHARED query set
(watch the shared subset, not the total: the headline set widens between
rounds, so totals are not comparable) plus queries added/removed.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        data = json.load(f)
    if data.get("parsed") is not None:  # driver wrapper format
        data = data["parsed"]
    return data


def main() -> None:
    old_path, new_path = sys.argv[1], sys.argv[2]
    old, new = _load(old_path), _load(new_path)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    shared = sorted(set(oq) & set(nq))
    print(f"| query | {old_path} | {new_path} | delta |")
    print("|---|---|---|---|")
    total_old = total_new = 0.0
    for q in shared:
        a, b = oq[q], nq[q]
        total_old += a
        total_new += b
        sign = "+" if b > a else ""
        delta = f"{sign}{(b - a) / a * 100:.0f}%" if a > 0 else "n/a"
        print(f"| {q} | {a:.3f} | {b:.3f} | {delta} |")
    sign = "+" if total_new > total_old else ""
    total_delta = (
        f"{sign}{(total_new - total_old) / total_old * 100:.0f}%" if total_old > 0 else "n/a"
    )
    print(
        f"| **shared total ({len(shared)})** | {total_old:.3f} | {total_new:.3f} "
        f"| {total_delta} |"
    )
    added, removed = sorted(set(nq) - set(oq)), sorted(set(oq) - set(nq))
    if added:
        print(f"\nadded: {', '.join(f'{q} ({nq[q]:.3f}s)' for q in added)}")
    if removed:
        print(f"\nremoved: {', '.join(removed)}")


if __name__ == "__main__":
    main()
