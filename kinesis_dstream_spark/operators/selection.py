"""Exact distributed rank selection via histogram refinement.

The order-statistic engine behind ``winsorize_stats``, ``mad_outliers``,
``adaptive_quality_gate``, ``grouped_percentiles`` and
``value_decile_binning`` — the operators whose naive plan is a full-row
``row_number`` window partitioned by a low-cardinality key
(``event_type`` ~5 values, ``lang`` with English most of the web): at
100 TB one partition sorts most of the data. The r6 review prescribed
the entity-sharded bottom-k pattern (shard-local bottom-k(n·p) on
``key, id % S`` merged to the global cut), but that pattern DEGENERATES
for exactly these call sites, which is why this module exists instead:

- each shard can guarantee exactness only by keeping its local bottom
  min(r, shard_size) rows, so the merge input is min(r·S, n) rows —
  for the quality gate (r = 0.2·n, S = 8) that is min(1.6n, n) = ALL
  rows funneled into one merge partition per key, strictly worse than
  the sort it replaces; any p·S ≥ 1 keeps everything;
- for central ranks (MAD's median, r ≈ n/2) every shard's bottom-r is
  its entire lower half — bottom-k sharding cannot help a median at any
  shard count.

Histogram refinement is the selection algorithm that IS exact at every
rank and (since r8) never sorts rows at all — only count tables:

1. **Bucket counts** — one ``groupBy(key, value DIV B)`` count. The
   exchange hashes on (key, bucket), so a hot key spreads across the
   cluster by value; map-side partial aggregation (pinned in
   tests/test_plans.py) means the shuffle carries at most one row per
   (input-partition, key, bucket) — the "shard-local" work of the
   prescribed pattern, done by Spark's hash aggregate for free, with
   counts (additive, mergeable) instead of rows.
2. **Locate** — a running-count window per key over the BUCKET table
   (|buckets| rows ≤ value_range/B, independent of n) finds, for each
   requested rank r, the single bucket where the cumulative count
   crosses r, and how many rows precede that bucket (``base``).
3. **Refine by exact value frequency** — re-scan filtered to the hit
   buckets via a broadcast join (~n/|buckets| rows survive), then
   ``groupBy(key, sel, value)`` count. Because ``value`` is integral
   (fixed-point contract), a bucket of width B holds at most B distinct
   values, so this frequency table has ≤ B rows per (key, sel) — and
   the final locate is the same running-count crossing over THAT table.
   No row-level sort exists anywhere in the plan.

The r7 version sorted the hit bucket's resident ROWS with
``row_number``, which re-created the bare-key hot-spot one data shape
away: a zero-inflated metric or single dominant price point puts nearly
all of a hot key's rows in ONE bucket, and the refine window sorted
them in one task. The value-frequency refine closes that tail
structurally: a hot VALUE is absorbed by map-side partial counting
(each input partition emits one combined row per (key, sel, value)),
and the only windows in the plan run over count tables bounded by
value_range/B and B rows per group respectively — independent of n.
No data-dependent recursion or share-threshold branch is needed; the
degenerate shape simply has nowhere to concentrate.

Truncating division (Spark ``DIV``) is monotone non-decreasing, so
bucket ids order consistently with values even for negatives (bucket 0
spans both signs — harmless, ordering across buckets is what matters).

``grid_weighted_rank_select`` generalizes the same engine to weighted
order statistics: every count becomes a weight SUM (equally additive
and map-combinable), ranks address cumulative weight instead of row
count, and zero-weight rows are transparently skipped by the crossing
condition. The plan shape and the degenerate-distribution immunity are
identical — ``grid_rank_select`` is the weight≡1 special case.

Exactness: the (key, sel, value, count) table is an exact multiset
representation of the hit bucket's residents, so the value whose
cumulative frequency first reaches the residual rank r − base IS the
r-th smallest value — ties share the value by construction. Every
consumer derives its remaining outputs from the selected values with
value-based integer comparisons (count/sum of rows beyond a cut never
depends on WHICH tie-rows straddle it), keeping the DuckDB oracles
bit-exact.

Reference tie: the reference engine has no local executor at all — its
only "selection" is the remote server's ORDER BY + paging
(/root/reference/app/hs_contacts.py:61-81); this module is part of the
mandated extension surface (SURVEY §2B, E-15/E-12 robust statistics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grid_rank_select(
    df: DataFrame,
    key: str,
    value: str,
    ranks: DataFrame,
    bucket_width: int,
) -> DataFrame:
    """Return, per (key, sel) request, the exact ``r``-th smallest
    ``value`` within the key group.

    ``df``: rows (key, value) with ``value`` integral (fixed-point).
    ``ranks``: one row per request — (key, sel, r), 1 ≤ r ≤ n(key).
    Output: (key, sel, value) — the order statistic at ascending rank r.
    """
    return _grid_select(df, key, value, ranks, bucket_width, F.lit(1))


def grid_weighted_rank_select(
    df: DataFrame,
    key: str,
    value: str,
    weight: str,
    ranks: DataFrame,
    bucket_width: int,
) -> DataFrame:
    """Weighted order statistics on the same two-level count-table
    engine: return, per (key, sel) request, the smallest ``value``
    whose cumulative ``weight`` (ascending by value) reaches rank
    ``r`` — i.e. the exact weighted quantile at mass r of the key's
    total weight W = Σ weight, 1 ≤ r ≤ W.

    ``weight`` must be a non-negative integral column; every
    "count" in the unweighted engine simply becomes a weight SUM
    (additive and map-combinable in exactly the same way), so the
    plan shape, the degenerate-distribution immunity, and the
    exactness argument carry over verbatim: the (key, sel, value,
    weight-sum) table is an exact representation of the weighted
    multiset, and the crossing value is unique because cumulative
    weight is non-decreasing in value with ties sharing a value row.
    """
    return _grid_select(df, key, value, ranks, bucket_width, F.col(weight))


def _grid_select(
    df: DataFrame,
    key: str,
    value: str,
    ranks: DataFrame,
    bucket_width: int,
    measure,
) -> DataFrame:
    bucket = F.expr(f"{value} DIV {bucket_width}")
    cand = df.select(
        key, F.col(value).alias("v"), bucket.alias("bucket"), measure.alias("m")
    )
    bcounts = cand.groupBy(key, "bucket").agg(F.sum("m").alias("c"))
    before = (
        Window.partitionBy(key)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    located = bcounts.select(
        key,
        "bucket",
        "c",
        F.coalesce(F.sum("c").over(before), F.lit(0)).alias("base"),
    )
    hits = (
        located.join(ranks, key)
        .where((F.col("base") < F.col("r")) & (F.col("r") <= F.col("base") + F.col("c")))
        .select(key, "sel", "bucket", "base", "r")
    )
    # Exact value-frequency refine: bucket/base/r are constant within a
    # (key, sel) group, so grouping by them avoids a re-join, and bucket
    # riding the window spec keeps the refine window identifiable in
    # plan tests even when Catalyst constant-folds a literal `sel` out
    # of a single-selection call. The exchange hashes on (key, sel, v)
    # — a hot value cannot hot-spot because the partial aggregate
    # combines it map-side.
    vfreq = (
        cand.join(F.broadcast(hits), [key, "bucket"])
        .groupBy(key, "sel", "bucket", "base", "r", "v")
        .agg(F.sum("m").alias("vc"))
    )
    in_sel = (
        Window.partitionBy(key, "sel", "bucket")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        vfreq.select(
            key,
            "sel",
            "v",
            "vc",
            (F.col("r") - F.col("base")).alias("pos"),
            F.coalesce(F.sum("vc").over(in_sel), F.lit(0)).alias("vbase"),
        )
        .where(
            (F.col("vbase") < F.col("pos"))
            & (F.col("pos") <= F.col("vbase") + F.col("vc"))
        )
        .select(key, "sel", F.col("v").alias("value"))
    )
