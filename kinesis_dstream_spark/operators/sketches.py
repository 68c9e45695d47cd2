"""Mergeable-sketch telemetry operators (SURVEY §2B E-4 depth).

At 100 TB, "how many distinct users did we see this week" and "what are
the heavy-hitter tokens in the corpus" cannot be answered by re-scanning
history: the scan is the cost. The standard answer is MERGEABLE SKETCHES
— tiny fixed-size summaries computed once per partition/day and unioned
later, so the rollup over any time range touches only the sketches, never
the raw rows. Two families here, both fully JVM-side:

* HyperLogLog distinct rollup — Spark's Datasketches-backed
  ``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``.
  The per-(event_type, day) sketches are what a production job persists;
  the union-then-estimate rollup demonstrates lossless mergeability
  (pytest pins merged == direct at equal lgConfigK).

* Count-min sketch as a DATAFRAME — the CMS table IS a (depth × width)
  grid of counters, which in relational form is just
  ``groupBy(row, bucket).count()`` over hashed token occurrences. That
  makes it natively distributed (map-side partial aggregation collapses
  every partition's contribution to ≤ depth·width rows before the
  shuffle) and trivially mergeable (union = sum by (row, bucket)).
  Spark's builtin ``count_min_sketch`` aggregate returns an opaque
  binary usable only JVM-side; the relational encoding keeps the sketch
  queryable, joinable, and persistable as plain parquet.

Estimates are probabilistic → no SQL oracle for the sketch queries
(registered rows-only); pytest pins the guarantees instead:
``hll`` within rel-error of exact and merge-lossless; ``cms`` never
underestimates and overestimate ≤ εN with the standard (ε=e/width)
bound. The exact heavy-hitter twin IS oracle-backed — it is both the
ground truth the CMS query reports against and the driver-checkable row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kinesis_dstream_spark.functions.textfns import tokens

# CMS geometry defaults: width 2048 → ε = e/2048 ≈ 0.0013 (overestimate
# ≤ 0.13% of total token count w.h.p.); depth 4 → δ = e⁻⁴ ≈ 1.8%.
CMS_DEPTH = 4
CMS_WIDTH = 2048


def hll_daily_sketches(events: DataFrame, lgk: int = 12) -> DataFrame:
    """Per-(event_type, day) HLL sketch of distinct user_ids.

    This is the PERSISTED granule of the rollup pattern: one ~2^lgk-byte
    binary per group per day, written once when the day closes. Any later
    range query (week, month, all-time, cross-event-type) unions sketches
    instead of re-scanning events. The aggregate is JVM-side with
    map-side partials — the shuffle carries sketches, not user_ids.
    """
    return events.select(
        "event_type", F.date_trunc("day", "ts").alias("day"), "user_id"
    ).groupBy("event_type", "day").agg(
        F.hll_sketch_agg("user_id", F.lit(lgk)).alias("user_sketch"),
        F.count("*").alias("n_events"),
    )


def hll_distinct_rollup(events: DataFrame, lgk: int = 12) -> DataFrame:
    """Distinct-user rollup per event_type from daily sketches.

    Two-level: daily sketches (the persisted granule) → ``hll_union_agg``
    per event_type → estimate. HLL union is lossless at equal lgConfigK,
    so this returns the same estimate as sketching the raw rows directly
    (pinned by ``tests/test_sketches.py``); the difference is cost — the
    rollup reads |days|·|types| sketches, not N rows.

    Estimate is probabilistic (rel. stderr ≈ 1.04/√2^lgk ≈ 1.6% at
    lgk=12) → rows-only registration + error-bound pytest.
    """
    return (
        hll_daily_sketches(events, lgk)
        .groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("user_sketch")).alias("est_users"),
            F.count("*").alias("n_days"),
            F.sum("n_events").alias("n_events"),
        )
        .orderBy("event_type")
    )


def _tok_bucket(col, r: int, width: int):
    """Bucket of token `col` in CMS row r: xxhash64 seeded by the row
    index, reduced mod width. pmod keeps it non-negative."""
    return F.pmod(F.xxhash64(F.lit(r), col), F.lit(width))


def cms_table(
    documents: DataFrame, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """Count-min sketch of corpus token occurrences as (r, b, cnt) rows.

    One explode pass: each token occurrence contributes `depth` (row,
    bucket) increments via ``posexplode`` of its per-row buckets — no
    per-row union, one aggregate. The groupBy keyspace is ≤ depth·width
    (8192 cells at defaults) regardless of corpus size, so partial
    aggregation collapses each input partition to ≤ 8192 rows before the
    shuffle: the reduce side of a 100 TB sketch build moves kilobytes.
    Merging sketches from two corpora (or two days) is
    ``union.groupBy(r, b).sum(cnt)`` — the relational form of CMS's
    counter-wise addition.
    """
    occurrences = documents.select(
        F.explode(tokens(F.col("text"))).alias("tok")
    ).filter(F.col("tok") != "")
    return (
        occurrences.select(
            F.posexplode(
                F.array(*[_tok_bucket(F.col("tok"), r, width) for r in range(depth)])
            ).alias("r", "b")
        )
        .groupBy("r", "b")
        .agg(F.count("*").alias("cnt"))
    )


def heavy_hitter_tokens(documents: DataFrame, k: int = 20) -> DataFrame:
    """EXACT top-k tokens by occurrence count — the oracle-backed twin.

    groupBy(token).count() then global top-k: the sort is
    TakeOrderedAndProject (per-partition heap + driver merge of k rows),
    never a full sort. Ties broken by token text for determinism.
    """
    occurrences = documents.select(
        F.explode(tokens(F.col("text"))).alias("token")
    ).filter(F.col("token") != "")
    return (
        occurrences.groupBy("token")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(k)
    )


def cms_heavy_hitters(
    documents: DataFrame,
    k: int = 20,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """CMS frequency estimates reported against exact counts for the
    top-k tokens: (token, n_occurrences, cms_estimate).

    The production shape is "query a PERSISTED sketch for counts the raw
    data no longer serves cheaply"; here the sketch is built in-query so
    the comparison is self-contained. Probe = compute each query token's
    `depth` buckets, join against the sketch rows, take min over rows.
    Both join sides are tiny after their aggregates (≤ depth·width cells,
    k·depth probes) so the join broadcasts; the corpus is scanned twice
    (sketch build + exact twin) but never joined row-to-row.

    Guarantees (pinned in pytest, no SQL oracle for the estimate):
    estimate ≥ true count always; estimate ≤ true + εN (ε = e/width)
    with prob ≥ 1 - e^(-depth) per token.
    """
    sketch = cms_table(documents, depth, width)
    probes = heavy_hitter_tokens(documents, k).select(
        "token",
        "n_occurrences",
        F.posexplode(
            F.array(*[_tok_bucket(F.col("token"), r, width) for r in range(depth)])
        ).alias("r", "b"),
    )
    return (
        probes.join(sketch, ["r", "b"])
        .groupBy("token", "n_occurrences")
        .agg(F.min("cnt").alias("cms_estimate"))
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
    )
