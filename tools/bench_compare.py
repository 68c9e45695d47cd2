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
    """Accept any of: a bare bench JSON record, raw bench.py stdout
    (note lines + one JSON line), or the driver wrapper — including
    wrappers whose ``parsed`` is null and whose ``tail`` is a
    front-truncated string capture (regex-recover the query timings)."""
    import re

    with open(path) as f:
        text = f.read()
    try:
        # a bare record or pretty-printed driver wrapper
        data = json.loads(text)
    except json.JSONDecodeError:
        # raw stdout: last line that parses as a JSON object wins
        for line in reversed(text.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                try:
                    data = json.loads(line)
                    break
                except json.JSONDecodeError:
                    continue
        else:
            raise ValueError(f"{path}: no JSON object found")
    if "queries" in data:
        return data
    if data.get("parsed") is not None:  # driver wrapper, parsed ok
        return data["parsed"]
    tail = data.get("tail", "")
    start = tail.find('{"metric"')
    if start >= 0:
        return json.loads(tail[start:].strip())
    # front-truncated tail: recover the name->seconds pairs directly
    pairs = re.findall(r'"([a-z0-9_]+)": ([0-9.]+)', tail)
    queries = {k: float(v) for k, v in pairs if k not in ("sf", "value")}
    if not queries:
        raise ValueError(f"{path}: could not recover query timings")
    return {"queries": queries}


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
