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

from pyspark.sql import DataFrame, SparkSession, Window
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


# --------------------------------------------------------------------------
# KMV bottom-k sample granules → mergeable quantiles (deterministic)
# --------------------------------------------------------------------------

KMV_K = 256  # sample size per granule and for the merged sample


def _kmv_rank_key():
    """Deterministic uniform rank: md5 of the row's primary key.

    Hash-rank sampling makes "keep the k smallest hashes" a UNIFORM
    random sample that is MERGEABLE: bottom-k of a union equals bottom-k
    of the concatenated per-part bottom-k's. md5 (not xxhash) because the
    DuckDB oracle computes the identical hex string, making the whole
    sketch — selection included — exactly reproducible in SQL.
    """
    return F.md5(F.col("event_id").cast("string"))


def kmv_day_granules(events: DataFrame, k: int = KMV_K, shards: int = 8) -> DataFrame:
    """Per-day bottom-k sample of ``value`` by hash rank.

    This is the persisted granule: k rows per day, written once when the
    day closes. Two-level tournament so no single window partition ever
    sees a full day's rows (a day at 100 TB is billions of events — a
    plain ``Window.partitionBy(day)`` would sort them all in one task):
    stage 1 keeps bottom-k per (day, shard) — 'shards' parallel
    partitions, each a partial sort cut to k rows; stage 2 merges the
    ≤ shards·k survivors per day. Bottom-k mergeability makes the
    two-level result IDENTICAL to the direct per-day bottom-k, which is
    what the (single-level) DuckDB oracle computes.
    """
    base = events.select(
        F.date_trunc("day", "ts").alias("day"),
        F.pmod(F.xxhash64("event_id"), F.lit(shards)).alias("shard"),
        _kmv_rank_key().alias("rk"),
        "value",
        "event_id",
    )
    w1 = Window.partitionBy("day", "shard").orderBy("rk", "event_id")
    w2 = Window.partitionBy("day").orderBy("rk", "event_id")
    return (
        base.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= k)
        .drop("rn", "shard")
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def kmv_quantile_rollup(
    spark: SparkSession, events: DataFrame, k: int = KMV_K
) -> DataFrame:
    """Quantile estimates for ``value`` from merged per-day KMV granules.

    Merge = global bottom-k over all granule rows (|days|·k inputs — a
    TakeOrderedAndProject, never a full sort), then the q-quantile
    estimate is the sample's order statistic at index floor(q·(n−1)).
    Every step is deterministic hash arithmetic + order statistics, so
    unlike HLL/CMS this sketch IS oracle-checkable end to end; the
    sampling-error bound (|est_rank − q| = O(1/√k)) is pinned in pytest
    against the exact percentiles.
    """
    merged = (
        kmv_day_granules(events, k)
        .orderBy("rk", "event_id")
        .limit(k)
        .select("value", "event_id")
    )
    w = Window.orderBy("value", "event_id")
    ordered = merged.select(
        "value",
        (F.row_number().over(w) - 1).alias("idx"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    qs = spark.createDataFrame([(0.5,), (0.9,), (0.99,)], "q double")
    return (
        ordered.join(
            qs, F.col("idx") == F.floor(F.col("q") * (F.col("n") - 1)).cast("long")
        )
        .select("q", F.col("value").alias("est_value"), "n")
        .orderBy("q")
    )


# --------------------------------------------------------------------------
# Bloom-filter membership granules (deterministic → oracle-backed)
# --------------------------------------------------------------------------

BLOOM_M = 8192  # bits per granule
BLOOM_H = 3  # hash functions


def _bloom_positions(key, m: int = BLOOM_M, h: int = BLOOM_H):
    """The h bit positions of ``key``: salted-md5 prefixes mod m.

    md5 again (not xxhash) so the DuckDB oracle reproduces the exact
    bit pattern: first 8 hex chars → 32-bit int → mod m, per salt.
    """
    return F.array_distinct(
        F.array(
            *[
                F.pmod(
                    F.conv(
                        F.substring(F.md5(F.concat(key, F.lit(f"#{s}"))), 1, 8),
                        16,
                        10,
                    ).cast("long"),
                    F.lit(m),
                )
                for s in range(h)
            ]
        )
    )


def bloom_granules(documents: DataFrame, m: int = BLOOM_M, h: int = BLOOM_H) -> DataFrame:
    """Per-source bloom filter over document texts, as (source, bit) rows.

    The relational encoding of a bitset — same trick as the CMS table:
    ≤ m distinct rows per source regardless of corpus size, so partial
    aggregation collapses each scan partition before the shuffle and
    merging two corpora's filters is a plain ``union().distinct()``.
    A production pipeline persists these granules per source/day and
    answers "have we ever ingested this document?" without re-scanning
    history; false positives possible (bit collisions at m=8192), false
    negatives impossible — both pinned in pytest, and the whole filter
    is deterministic md5 arithmetic so the membership REPORT is
    oracle-checked too.
    """
    return (
        documents.select(
            "source", F.explode(_bloom_positions(F.col("text"), m, h)).alias("bit")
        )
        .distinct()
    )


def bloom_membership_stats(
    spark: SparkSession,
    documents: DataFrame,
    m: int = BLOOM_M,
    h: int = BLOOM_H,
    n_absent: int = 200,
) -> DataFrame:
    """Probe the per-source bloom granules with two key sets.

    'present' = every distinct src0 text (must claim membership in src0:
    no false negatives); 'absent' = synthetic keys never ingested (any
    claim is a false positive — expected ≈ n_sources·n_keys·(1−e^{−hn/m})^h).
    A key claims membership in a source iff ALL h of its bit positions
    are set in that source's granule: probe bits equi-join granule bits,
    then count matched distinct bits per (key, source). Output is one
    row per probe set: keys probed, (key, source) membership claims.
    """
    granules = bloom_granules(documents, m, h)
    present = (
        documents.filter(F.col("source") == "src0")
        .select(F.col("text").alias("probe_key"))
        .distinct()
        .withColumn("set_tag", F.lit("present"))
    )
    absent = spark.range(n_absent).select(
        F.concat(F.lit("miss-"), F.col("id").cast("string")).alias("probe_key"),
        F.lit("absent").alias("set_tag"),
    )
    probes = present.unionByName(absent).select(
        "set_tag",
        "probe_key",
        F.posexplode(_bloom_positions(F.col("probe_key"), m, h)).alias("pos", "bit"),
    )
    n_pos = Window.partitionBy("set_tag", "probe_key")
    probe_bits = probes.select(
        "set_tag",
        "probe_key",
        "bit",
        F.count("*").over(n_pos).alias("n_bits"),
    )
    claims = (
        probe_bits.join(granules, "bit")
        .groupBy("set_tag", "probe_key", "source", "n_bits")
        .agg(F.count("*").alias("n_matched"))
        .filter(F.col("n_matched") == F.col("n_bits"))
    )
    n_keys = (
        probe_bits.select("set_tag", "probe_key")
        .distinct()
        .groupBy("set_tag")
        .agg(F.count("*").alias("n_keys"))
    )
    return (
        n_keys.join(
            claims.groupBy("set_tag").agg(F.count("*").alias("claimed_pairs")),
            "set_tag",
            "left",
        )
        .select(
            "set_tag",
            "n_keys",
            F.coalesce("claimed_pairs", F.lit(0)).alias("claimed_pairs"),
        )
        .orderBy("set_tag")
    )


_THETA_K = 64
_POW2_60 = 1 << 60


def theta_set_intersection(events: DataFrame, k: int = _THETA_K) -> DataFrame:
    """Theta-sketch SET ALGEBRA — the capability that makes sketch
    families (Apache DataSketches) more than fast counters: estimate
    |A∩B| and |A∪B| from two bottom-k samples WITHOUT touching the
    raw sets again. A = high-spend users (Σ value over a fixed
    threshold), B = high-activity users (event count over a fixed
    threshold) — audience segments with real partial overlap.

    Theta math, verbatim: h(u) = 60-bit md5 integer; θ_X = k-th
    smallest hash of X (or 1.0 when |X| < k — the sketch is exact
    below k); for set ops θ = min(θ_A, θ_B) and the estimate is
    (matching hashes below θ) / θ. Because the "random" hash is
    deterministic md5, every selection and count is integer-exact and
    the DuckDB oracle reproduces the ESTIMATES bit-for-bit — the
    rare case where approximation itself is hash-checkable. rel_err
    columns report estimate quality against the exact cardinalities
    computed alongside (~1/√k ≈ 12% at k=64).

    Scale: the entire sketch state is k hashes per set — the
    intersection of two 100 TB-derived sets costs two bottom-k
    selections (shard-mergeable, see kmv_day_granules) plus math on
    128 rows. The exact twin columns are the fixture-scale
    certificate, not part of the production plan.
    """
    user_h = F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10).cast("long")
    # audience sets from per-user aggregates (the fixture's users all
    # emit every event TYPE, so type-membership sets are degenerate;
    # value/activity thresholds give real partial overlap): A = high
    # total spend, B = high event count
    per_user = events.groupBy("user_id").agg(
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("sv"),
        F.count(F.lit(1)).alias("ne"),
    )
    sets = (
        per_user.select(
            "user_id",
            F.explode(
                F.concat(
                    F.when(F.col("sv") > 350_000, F.array(F.lit("high_value"))).otherwise(
                        F.array().cast("array<string>")
                    ),
                    F.when(F.col("ne") > 70, F.array(F.lit("high_activity"))).otherwise(
                        F.array().cast("array<string>")
                    ),
                )
            ).alias("s"),
        )
        .withColumn("h", user_h)
    )
    n_per = sets.groupBy("s").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("s").orderBy("h", "user_id")
    kth = (
        sets.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == k)
        .select("s", F.col("h").alias("hk"))
    )
    theta = (
        n_per.join(kth, "s", "left")
        .select(
            "s",
            "n",
            F.when(F.col("n") < k, F.lit(_POW2_60)).otherwise(F.col("hk")).alias("th"),
        )
    )
    est_set = theta.select(
        "s",
        F.col("n").alias("exact_distinct"),
        F.when(F.col("n") < k, F.col("n").cast("double"))
        .otherwise(F.lit(float((k - 1) * _POW2_60)) / F.col("th"))
        .alias("est"),
    )
    a = theta.filter(F.col("s") == "high_value").select(F.col("th").alias("tha"))
    b = theta.filter(F.col("s") == "high_activity").select(F.col("th").alias("thb"))
    thmin = a.crossJoin(F.broadcast(b)).select(F.least("tha", "thb").alias("th"))
    va = sets.filter(F.col("s") == "high_value").select("user_id", "h")
    vb = sets.filter(F.col("s") == "high_activity").select("user_id", F.col("h").alias("hb"))
    inter = (
        va.join(vb, "user_id")
        .crossJoin(F.broadcast(thmin))
        .agg(
            F.count(F.lit(1)).alias("exact_n"),
            F.sum((F.col("h") < F.col("th")).cast("long")).alias("cnt"),
            F.max("th").alias("th"),
        )
        .select(
            F.lit("intersection").alias("s"),
            F.col("exact_n").alias("exact_distinct"),
            F.when(F.col("th") == _POW2_60, F.col("cnt").cast("double"))
            .otherwise(F.col("cnt") * F.lit(float(_POW2_60)) / F.col("th"))
            .alias("est"),
        )
    )
    uni = (
        sets.select("user_id", "h")
        .distinct()
        .crossJoin(F.broadcast(thmin))
        .agg(
            F.count(F.lit(1)).alias("exact_n"),
            F.sum((F.col("h") < F.col("th")).cast("long")).alias("cnt"),
            F.max("th").alias("th"),
        )
        .select(
            F.lit("union").alias("s"),
            F.col("exact_n").alias("exact_distinct"),
            F.when(F.col("th") == _POW2_60, F.col("cnt").cast("double"))
            .otherwise(F.col("cnt") * F.lit(float(_POW2_60)) / F.col("th"))
            .alias("est"),
        )
    )
    return (
        est_set.unionAll(inter)
        .unionAll(uni)
        .select(
            F.col("s").alias("set_name"),
            "exact_distinct",
            F.round("est", 2).alias("est_distinct"),
            F.round((F.col("est") - F.col("exact_distinct")) / F.col("exact_distinct"), 4).alias(
                "rel_err"
            ),
        )
    )


THETA_SET_INTERSECTION_SQL = f"""
WITH per_user AS (
  SELECT user_id,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sv,
         count(*) AS ne
  FROM events GROUP BY user_id
), sets AS (
  SELECT 'high_value' AS s, user_id FROM per_user WHERE sv > 350000
  UNION ALL
  SELECT 'high_activity', user_id FROM per_user WHERE ne > 70
), hashed AS (
  SELECT s, user_id,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM sets
), n_per AS (
  SELECT s, CAST(count(*) AS BIGINT) AS n FROM hashed GROUP BY s
), kth AS (
  SELECT s, h AS hk FROM (
    SELECT s, h, row_number() OVER (PARTITION BY s ORDER BY h, user_id) AS rn
    FROM hashed
  ) WHERE rn = {_THETA_K}
), theta AS (
  SELECT n_per.s, n,
         CASE WHEN n < {_THETA_K} THEN {_POW2_60} ELSE hk END AS th
  FROM n_per LEFT JOIN kth ON kth.s = n_per.s
), est_set AS (
  SELECT s, n AS exact_distinct,
         CASE WHEN n < {_THETA_K} THEN CAST(n AS DOUBLE)
              ELSE {float((_THETA_K - 1) * _POW2_60)!r} / th END AS est
  FROM theta
), thmin AS (
  SELECT least((SELECT th FROM theta WHERE s = 'high_value'),
               (SELECT th FROM theta WHERE s = 'high_activity')) AS th
), inter AS (
  SELECT 'intersection' AS s,
         CAST(count(*) AS BIGINT) AS exact_distinct,
         CASE WHEN max(t.th) = {_POW2_60}
              THEN CAST(sum(CASE WHEN a.h < t.th THEN 1 ELSE 0 END) AS DOUBLE)
              ELSE CAST(sum(CASE WHEN a.h < t.th THEN 1 ELSE 0 END) AS BIGINT)
                   * {float(_POW2_60)!r} / max(t.th) END AS est
  FROM hashed a JOIN hashed b
    ON a.s = 'high_value' AND b.s = 'high_activity' AND a.user_id = b.user_id, thmin t
), uni AS (
  SELECT 'union' AS s,
         CAST(count(*) AS BIGINT) AS exact_distinct,
         CASE WHEN max(t.th) = {_POW2_60}
              THEN CAST(sum(CASE WHEN u.h < t.th THEN 1 ELSE 0 END) AS DOUBLE)
              ELSE CAST(sum(CASE WHEN u.h < t.th THEN 1 ELSE 0 END) AS BIGINT)
                   * {float(_POW2_60)!r} / max(t.th) END AS est
  FROM (SELECT DISTINCT user_id, h FROM hashed) u, thmin t
)
SELECT s AS set_name, exact_distinct,
       round(est, 2) AS est_distinct,
       round((est - exact_distinct) / exact_distinct, 4) AS rel_err
FROM (SELECT * FROM est_set UNION ALL SELECT * FROM inter
      UNION ALL SELECT * FROM uni)
"""
