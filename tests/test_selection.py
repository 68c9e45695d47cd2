"""grid_rank_select (selection.py) — exactness against a local sort.

The histogram-refinement selector must return the exact r-th smallest
value for every rank, including the traps: ties straddling a rank,
negative values (trunc-div buckets overlap sign at bucket 0 — must stay
monotone), single-row groups, ranks landing exactly on a bucket
boundary, and several selections per group hitting the same bucket.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from kinesis_dstream_spark.operators.selection import grid_rank_select


def _check(spark, rows, ranks, bucket_width):
    df = spark.createDataFrame(rows, "key string, v long")
    rdf = spark.createDataFrame(ranks, "key string, sel string, r long")
    got = {
        (r["key"], r["sel"]): r["value"]
        for r in grid_rank_select(df, "key", "v", rdf, bucket_width).collect()
    }
    by_key: dict[str, list[int]] = {}
    for k, v in rows:
        by_key.setdefault(k, []).append(v)
    for k in by_key:
        by_key[k].sort()
    want = {(k, s): by_key[k][r - 1] for k, s, r in ranks}
    assert got == want


def test_exact_at_every_rank_small(spark):
    rows = [("a", v) for v in [5, 5, 5, 1, 9, -3, -3, 1024, 1023, 1025]]
    n = len(rows)
    ranks = [("a", f"r{r}", r) for r in range(1, n + 1)]
    _check(spark, rows, ranks, bucket_width=4)


def test_single_row_group_lo_equals_hi(spark):
    rows = [("solo", 42), ("big", 1), ("big", 2), ("big", 3)]
    ranks = [
        ("solo", "lo", 1),
        ("solo", "hi", 1),
        ("big", "lo", 1),
        ("big", "hi", 3),
    ]
    _check(spark, rows, ranks, bucket_width=1024)


def test_negative_values_and_boundaries(spark):
    # values spanning bucket 0 from both sides under trunc division,
    # plus exact multiples of the bucket width
    rows = [("k", v) for v in [-2048, -1024, -1023, -1, 0, 1, 1023, 1024, 2048]]
    ranks = [("k", f"r{r}", r) for r in range(1, 10)]
    _check(spark, rows, ranks, bucket_width=1024)


def test_degenerate_single_bucket_distribution(spark):
    """r7 verdict 'what's wrong #1': a zero-inflated / single-price-point
    key concentrates nearly all rows in ONE bucket. The r7 refine sorted
    that bucket's rows in one task; the r8 value-frequency refine must
    (a) stay exact and (b) contain NO row-level sort: the executed plan
    has no row_number anywhere, and every Window runs over a count table
    (fed by an Aggregate), so a hot value is absorbed map-side."""
    rows = [("hot", 0)] * 500 + [("hot", v) for v in (7, 7, 3, -2, 1)]
    rows += [("cold", v) for v in (10, 20, 30)]
    n_hot = 505
    ranks = [
        ("hot", "min", 1),
        ("hot", "med", (n_hot + 1) // 2),
        ("hot", "p99", max(1, n_hot * 99 // 100)),
        ("hot", "max", n_hot),
        ("cold", "med", 2),
    ]
    _check(spark, rows, ranks, bucket_width=1024)

    df = spark.createDataFrame(rows, "key string, v long")
    rdf = spark.createDataFrame(ranks, "key string, sel string, r long")
    out = grid_rank_select(df, "key", "v", rdf, 1024)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "row_number" not in plan.lower(), plan
    # every windowspec carries bucket (level-0 locate) or sel (level-1
    # value-frequency locate) — never a bare raw-row key partition
    specs = [
        part.split(")")[0]
        for part in plan.split("windowspecdefinition(")[1:]
    ]
    assert specs
    for s in specs:
        assert "bucket" in s or "sel" in s, s


def test_randomized_against_sorted(spark):
    rng = random.Random(7)
    rows = [
        (k, rng.randint(-5000, 5000))
        for k in ("x", "y")
        for _ in range(rng.randint(50, 80))
    ]
    counts: dict[str, int] = {}
    for k, _ in rows:
        counts[k] = counts.get(k, 0) + 1
    ranks = []
    for k, n in counts.items():
        for sel, r in [
            ("min", 1),
            ("p05", max(1, n * 5 // 100)),
            ("med", (n + 1) // 2),
            ("p95", n + 1 - max(1, n * 5 // 100)),
            ("max", n),
        ]:
            ranks.append((k, sel, r))
    _check(spark, rows, ranks, bucket_width=512)


def test_weighted_rank_select_against_local(spark):
    """grid_weighted_rank_select: the smallest value whose cumulative
    weight reaches rank r must match a local weighted scan, including
    zero-weight rows (transparently skipped) and ties sharing a
    value."""
    from kinesis_dstream_spark.operators.selection import (
        grid_weighted_rank_select,
    )

    rows = [
        ("a", 10, 3),
        ("a", 10, 2),
        ("a", 5, 0),
        ("a", 7, 4),
        ("a", 2000, 1),
        ("b", -4, 5),
        ("b", 0, 5),
    ]
    df = spark.createDataFrame(rows, "key string, v long, w long")

    def local(key, r):
        items = sorted((v, w) for k, v, w in rows if k == key)
        cum = 0
        for v, w in items:
            cum += w
            if cum >= r:
                return v
        raise AssertionError("rank beyond total weight")

    ranks = []
    want = {}
    totals = {"a": 10, "b": 10}
    for key, tot in totals.items():
        for p in (1, 30, 50, 90, 100):
            r = max(1, (tot * p + 99) // 100)
            ranks.append((key, f"p{p}", r))
            want[(key, f"p{p}")] = local(key, r)
    rdf = spark.createDataFrame(ranks, "key string, sel string, r long")
    got = {
        (r["key"], r["sel"]): r["value"]
        for r in grid_weighted_rank_select(df, "key", "v", "w", rdf, 8).collect()
    }
    assert got == want
