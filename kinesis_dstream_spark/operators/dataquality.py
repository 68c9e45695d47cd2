"""Declarative data-quality constraint checking (Deequ/GE-style).

A production ingestion pipeline (the reference's poller feeds exactly
such a pipeline) gates loads on constraint reports: completeness,
uniqueness, referential integrity, value ranges, set membership. This
module evaluates a constraint suite over the fixture warehouse and
emits one row per constraint — counts, violations, verdict.

Scale shape (100 TB): all row-local predicates on one table fold into a
SINGLE aggregation pass (conditional sums — one scan, map-side
partials); uniqueness is one groupBy on the key; referential integrity
is a broadcast anti-join against the (small) dimension key set. Nothing
materializes violation row sets — only counts travel. A report over N
tables costs N scans, independent of constraint count.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_dstream_spark.tables import load_table


def _report_row(
    constraint: str, table: str, n_rows, n_violations
) -> list:  # Column spec helper, see suite below
    return [
        F.lit(constraint).alias("constraint"),
        F.lit(table).alias("table_name"),
        n_rows.alias("n_rows"),
        n_violations.alias("n_violations"),
        (n_violations == 0).alias("passed"),
    ]


def _single_pass(df: DataFrame, table: str, checks: list[tuple[str, F.Column]]) -> DataFrame:
    """All row-local constraints on ``df`` in ONE aggregation scan.

    The per-constraint rows come from EXPLODING an array of structs over
    the single agg row — NOT from a union of selects, which would
    re-plan (and re-scan) the aggregation subtree once per constraint
    (no CSE across union branches; pinned in tests/test_dataquality.py).
    """
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        F.sum(F.when(violation, 1).otherwise(0)).cast("long").alias(f"_v{i}")
        for i, (_, violation) in enumerate(checks)
    ]
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(name).alias("constraint"),
            F.lit(table).alias("table_name"),
            F.col("_n").alias("n_rows"),
            F.col(f"_v{i}").alias("n_violations"),
            (F.col(f"_v{i}") == 0).alias("passed"),
        )
        for i, (name, _) in enumerate(checks)
    ]
    return row.select(F.explode(F.array(*structs)).alias("r")).select("r.*")


def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint suite over the warehouse: one verdict row each.

    Row-local suites run one scan per table; `unique_key` adds one
    aggregation on the key; `ref_integrity` one broadcast anti-join.
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")
    events = load_table(spark, sf_dir, "events")

    orders_pass = _single_pass(
        orders,
        "orders",
        [
            ("complete_custkey", F.col("o_custkey").isNull()),
            (
                "status_in_domain",
                ~F.col("o_orderstatus").isin("O", "F", "P"),
            ),
            ("nonneg_totalprice", F.col("o_totalprice") < 0),
        ],
    )
    lineitem_pass = _single_pass(
        lineitem,
        "lineitem",
        [
            ("quantity_range_1_50", ~F.col("l_quantity").between(1, 50)),
            ("discount_range_0_1", ~F.col("l_discount").between(0.0, 1.0)),
            (
                "ship_before_receipt_proxy",
                F.col("l_shipdate").isNull(),
            ),
        ],
    )
    events_pass = _single_pass(
        events,
        "events",
        [
            ("event_ts_complete", F.col("ts").isNull()),
            (
                "event_type_in_domain",
                ~F.col("event_type").isin(
                    "signup", "view", "click", "purchase", "error"
                ),
            ),
        ],
    )

    # uniqueness: one aggregation keyed on the candidate key
    dup_parts = (
        part.groupBy("p_partkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).cast("long").alias("_v"),
        )
        .select(*_report_row("unique_partkey", "part", F.col("_n"), F.col("_v")))
    )

    # referential integrity: broadcast anti-join against the dim keys
    orphan = (
        orders.join(
            F.broadcast(customer.select("c_custkey")),
            orders["o_custkey"] == customer["c_custkey"],
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("_v"))
        .crossJoin(orders.agg(F.count(F.lit(1)).alias("_n")))
        .select(
            *_report_row(
                "orders_custkey_in_customer", "orders", F.col("_n"), F.col("_v")
            )
        )
    )

    return reduce(
        lambda a, b: a.unionByName(b),
        [orders_pass, lineitem_pass, events_pass, dup_parts, orphan],
    )


DQ_REPORT_SQL = """
WITH o AS (
  SELECT count(*) AS n,
         CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v0,
         CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END)
              AS BIGINT) AS v1,
         CAST(sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT) AS v2
  FROM orders
), l AS (
  SELECT count(*) AS n,
         CAST(sum(CASE WHEN l_quantity NOT BETWEEN 1 AND 50 THEN 1 ELSE 0 END)
              AS BIGINT) AS v0,
         CAST(sum(CASE WHEN l_discount NOT BETWEEN 0.0 AND 1.0 THEN 1 ELSE 0 END)
              AS BIGINT) AS v1,
         CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v2
  FROM lineitem
), e AS (
  SELECT count(*) AS n,
         CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v0,
         CAST(sum(CASE WHEN event_type NOT IN
                  ('signup','view','click','purchase','error')
                  THEN 1 ELSE 0 END) AS BIGINT) AS v1
  FROM events
), pk AS (
  SELECT count(*) AS n,
         CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS v
  FROM (SELECT p_partkey, count(*) AS c FROM part GROUP BY p_partkey)
), ri AS (
  SELECT (SELECT count(*) FROM orders) AS n,
         -- NOT EXISTS, not NOT IN: NOT IN's three-valued logic returns
         -- UNKNOWN (drops the row) whenever any c_custkey is NULL,
         -- silently diverging from the Spark side's left_anti join,
         -- which counts such rows as orphans. NOT EXISTS is null-safe
         -- and matches anti-join semantics exactly.
         (SELECT count(*) FROM orders o2
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o2.o_custkey)) AS v
)
SELECT 'complete_custkey' AS constraint, 'orders' AS table_name,
       n AS n_rows, v0 AS n_violations, v0 = 0 AS passed FROM o
UNION ALL
SELECT 'status_in_domain', 'orders', n, v1, v1 = 0 FROM o
UNION ALL
SELECT 'nonneg_totalprice', 'orders', n, v2, v2 = 0 FROM o
UNION ALL
SELECT 'quantity_range_1_50', 'lineitem', n, v0, v0 = 0 FROM l
UNION ALL
SELECT 'discount_range_0_1', 'lineitem', n, v1, v1 = 0 FROM l
UNION ALL
SELECT 'ship_before_receipt_proxy', 'lineitem', n, v2, v2 = 0 FROM l
UNION ALL
SELECT 'event_ts_complete', 'events', n, v0, v0 = 0 FROM e
UNION ALL
SELECT 'event_type_in_domain', 'events', n, v1, v1 = 0 FROM e
UNION ALL
SELECT 'unique_partkey', 'part', n, v, v = 0 FROM pk
UNION ALL
SELECT 'orders_custkey_in_customer', 'orders', n, v, v = 0 FROM ri
"""


def key_skew_profile(events: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Join/agg-key skew diagnostics — the profile a pipeline runs
    BEFORE picking a shuffle strategy (salt? broadcast? AQE skew
    threshold?) for a new key at 100 TB.

    One row per candidate shuffle key with the three numbers that
    decide the physical plan:

    - ``skew_ratio`` — max key count / mean key count. AQE's skew-join
      trigger is exactly this shape (skewedPartitionFactor); >5-10
      says salt or let AQE split.
    - ``top_share`` — heaviest key's fraction of all rows. A single
      key holding >1/parallelism of the table caps speedup no matter
      the partition count (one straggler task).
    - ``hhi`` — Herfindahl concentration Σ(cᵢ/n)². Its reciprocal is
      the "effective number of keys": the real parallelism an even
      hash partitioner can extract.

    All three derive from ONE groupBy per key column (map-side partial
    counts) followed by a scalar rollup — integer-exact numerators
    (counts and Σc² are int64; c≤n≤9e9 keeps Σc² under 2⁶³ up to ~9B
    rows per key, beyond which the rollup should move to DECIMAL), one
    deterministic double per displayed ratio. Never materializes the
    key list; only per-key counts travel, and they collapse to one row
    per profiled column.
    """
    def profile(df: DataFrame, column: str, table: str) -> DataFrame:
        # Display ratios via INTEGER half-up division onto a decimal
        # grid, then one exact /10^k — never round() on a float chain:
        # Java's BigDecimal round and DuckDB's sprintf-style round
        # disagree on boundary doubles (observed: 99/(100000/1500) =
        # 1.4849999999999999 → Spark 1.48, DuckDB 1.49 at sf0.1).
        counts = df.groupBy(column).agg(F.count(F.lit(1)).alias("c"))
        return counts.agg(
            F.lit(f"{table}.{column}").alias("key"),
            F.sum("c").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("c").alias("max_key_rows"),
            (
                F.expr(
                    "(200 * max(c) * count(1) + sum(c)) DIV (2 * sum(c))"
                )
                / 100.0
            ).alias("skew_ratio"),
            (
                F.expr("(20000 * max(c) + sum(c)) DIV (2 * sum(c))") / 10000.0
            ).alias("top_share"),
            (
                F.expr(
                    "(2000000 * sum(c * c) + sum(c) * sum(c))"
                    " DIV (2 * sum(c) * sum(c))"
                )
                / 1000000.0
            ).alias("hhi"),
        )
    return (
        profile(events, "event_type", "events")
        .unionAll(profile(events, "user_id", "events"))
        .unionAll(profile(lineitem, "l_orderkey", "lineitem"))
        .unionAll(profile(lineitem, "l_suppkey", "lineitem"))
    )


KEY_SKEW_PROFILE_SQL = """
WITH prof AS (
  SELECT 'events.event_type' AS key, event_type::VARCHAR AS k FROM events
  UNION ALL
  SELECT 'events.user_id', user_id::VARCHAR FROM events
  UNION ALL
  SELECT 'lineitem.l_orderkey', l_orderkey::VARCHAR FROM lineitem
  UNION ALL
  SELECT 'lineitem.l_suppkey', l_suppkey::VARCHAR FROM lineitem
), counts AS (
  SELECT key, k, count(*) AS c FROM prof GROUP BY key, k
)
SELECT key,
       CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(max(c) AS BIGINT) AS max_key_rows,
       CAST((200 * CAST(max(c) AS BIGINT) * CAST(count(*) AS BIGINT)
             + CAST(sum(c) AS BIGINT))
            // (2 * CAST(sum(c) AS BIGINT)) AS BIGINT) / 100.0 AS skew_ratio,
       CAST((20000 * CAST(max(c) AS BIGINT) + CAST(sum(c) AS BIGINT))
            // (2 * CAST(sum(c) AS BIGINT)) AS BIGINT) / 10000.0 AS top_share,
       CAST((2000000 * CAST(sum(c * c) AS BIGINT)
             + CAST(sum(c) AS BIGINT) * CAST(sum(c) AS BIGINT))
            // (2 * CAST(sum(c) AS BIGINT) * CAST(sum(c) AS BIGINT)) AS BIGINT)
         / 1000000.0 AS hhi
FROM counts GROUP BY key
"""


def join_size_estimate(
    orders: DataFrame, lineitem: DataFrame, customer: DataFrame, events: DataFrame
) -> DataFrame:
    """Pre-shuffle join cardinality: predict |A ⋈ B| from per-key
    counts BEFORE paying for the join. For an equi-join the identity
    |A ⋈_k B| = Σ_k c_A(k)·c_B(k) is exact, and the prediction costs
    two count-shaped aggregations (map-side partials, key-cardinality
    shuffles) plus a join of two COUNT TABLES — at 100 TB that is the
    difference between a metadata-sized query and materializing a
    possibly-quadratic result to discover it was quadratic.

    The ``events_self_user`` row is the cautionary case this exists
    for: Σ c(u)² is the size of any per-user pairwise design, and the
    estimate flags the blowup (≫ input rows) without running it.

    Each output row also carries ``actual_rows`` computed by really
    joining — the demo certifies the identity; production runs only
    the estimate. All counts/products int64-exact.
    """
    def one(name: str, a: DataFrame, ka: str, b: DataFrame, kb: str) -> DataFrame:
        ca = a.groupBy(F.col(ka).alias("k")).agg(F.count(F.lit(1)).alias("ca"))
        cb = b.groupBy(F.col(kb).alias("k")).agg(F.count(F.lit(1)).alias("cb"))
        predicted = ca.join(cb, "k").agg(
            F.coalesce(F.sum(F.col("ca") * F.col("cb")), F.lit(0)).alias(
                "predicted_rows"
            )
        )
        actual = (
            a.select(F.col(ka).alias("_ka"))
            .join(b.select(F.col(kb).alias("_kb")), F.col("_ka") == F.col("_kb"))
            .agg(F.count(F.lit(1)).alias("actual_rows"))
        )
        lhs = a.agg(F.count(F.lit(1)).alias("lhs_rows"))
        rhs = b.agg(F.count(F.lit(1)).alias("rhs_rows"))
        return (
            lhs.crossJoin(rhs)
            .crossJoin(predicted)
            .crossJoin(actual)
            .select(
                F.lit(name).alias("join_name"),
                "lhs_rows",
                "rhs_rows",
                "predicted_rows",
                "actual_rows",
            )
        )

    return (
        one("lineitem_orders", lineitem, "l_orderkey", orders, "o_orderkey")
        .unionAll(one("orders_customer", orders, "o_custkey", customer, "c_custkey"))
        .unionAll(one("events_self_user", events, "user_id", events, "user_id"))
    )


JOIN_SIZE_ESTIMATE_SQL = """
WITH pairs AS (
  SELECT 'lineitem_orders' AS join_name,
         (SELECT count(*) FROM lineitem) AS lhs_rows,
         (SELECT count(*) FROM orders) AS rhs_rows,
         (SELECT CAST(sum(ca * cb) AS BIGINT) FROM
            (SELECT l_orderkey AS k, count(*) AS ca FROM lineitem GROUP BY 1) a
            JOIN (SELECT o_orderkey AS k, count(*) AS cb FROM orders GROUP BY 1) b
            USING (k)) AS predicted_rows,
         (SELECT count(*) FROM lineitem l JOIN orders o
            ON l.l_orderkey = o.o_orderkey) AS actual_rows
  UNION ALL
  SELECT 'orders_customer',
         (SELECT count(*) FROM orders),
         (SELECT count(*) FROM customer),
         (SELECT CAST(sum(ca * cb) AS BIGINT) FROM
            (SELECT o_custkey AS k, count(*) AS ca FROM orders GROUP BY 1) a
            JOIN (SELECT c_custkey AS k, count(*) AS cb FROM customer GROUP BY 1) b
            USING (k)),
         (SELECT count(*) FROM orders o JOIN customer c
            ON o.o_custkey = c.c_custkey)
  UNION ALL
  SELECT 'events_self_user',
         (SELECT count(*) FROM events),
         (SELECT count(*) FROM events),
         (SELECT CAST(sum(ca * cb) AS BIGINT) FROM
            (SELECT user_id AS k, count(*) AS ca FROM events GROUP BY 1) a
            JOIN (SELECT user_id AS k, count(*) AS cb FROM events GROUP BY 1) b
            USING (k)),
         (SELECT count(*) FROM events a JOIN events b ON a.user_id = b.user_id)
)
SELECT join_name, CAST(lhs_rows AS BIGINT) AS lhs_rows,
       CAST(rhs_rows AS BIGINT) AS rhs_rows, predicted_rows,
       CAST(actual_rows AS BIGINT) AS actual_rows
FROM pairs
"""


_HIST_BUCKETS = 8
_PRICE_SCALE = 100


def column_histogram_equidepth(lineitem: DataFrame, buckets: int = _HIST_BUCKETS) -> DataFrame:
    """Exact equi-depth histogram of ``l_extendedprice`` — the
    optimizer statistic (Spark CBO's ANALYZE ... FOR COLUMNS shape)
    computed the way it scales, NOT the way it's usually written.

    The textbook formulation sorts all rows and buckets by global
    row_number — an unpartitioned window that funnels the corpus
    through one task. This operator never ranks rows. It aggregates to
    the VALUE DOMAIN first (one groupBy: value → count, map-side
    combinable), then does rank arithmetic on the domain: a running
    sum over distinct values yields each value's global rank interval
    [cum−cnt+1, cum], and the overlap of that interval with bucket
    k's rank range [⌈kn/B⌉+1, ⌈(k+1)n/B⌉] is a closed-form integer
    expression. The only ordered pass runs over DISTINCT values —
    bounded by the column's domain (prices: ~millions), not the
    corpus; the same day-axis argument as ``cumulative_distinct_users``.

    A value spanning a bucket boundary contributes its exact row
    split to both buckets and counts toward both buckets'
    ``n_distinct`` (standard equi-depth semantics). Everything is
    int64 on the cents grid; only display bounds divide.
    """
    iv = F.expr(f"CAST(round(l_extendedprice * {_PRICE_SCALE}) AS BIGINT)")
    vals = lineitem.select(iv.alias("iv")).groupBy("iv").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.orderBy("iv").rowsBetween(Window.unboundedPreceding, 0)
    cum = vals.select(
        "iv", "cnt", F.sum("cnt").over(w).alias("cum")
    ).crossJoin(F.broadcast(lineitem.agg(F.count(F.lit(1)).alias("n"))))
    spans = cum.select(
        "iv",
        "cnt",
        "cum",
        "n",
        F.explode(
            F.sequence(
                F.expr(f"(cum - cnt) * {buckets} DIV n"),
                F.expr(f"(cum - 1) * {buckets} DIV n"),
            )
        ).alias("bucket"),
    )
    lo_rank = F.expr(f"(bucket * n + {buckets} - 1) DIV {buckets} + 1")
    hi_rank = F.expr(f"((bucket + 1) * n + {buckets} - 1) DIV {buckets}")
    rows_in = F.least(F.col("cum"), hi_rank) - F.greatest(
        F.col("cum") - F.col("cnt") + 1, lo_rank
    ) + 1
    return (
        spans.select("bucket", "iv", rows_in.alias("rows_in"))
        .groupBy("bucket")
        .agg(
            F.round(F.min("iv") / _PRICE_SCALE, 2).alias("lo_price"),
            F.round(F.max("iv") / _PRICE_SCALE, 2).alias("hi_price"),
            F.sum("rows_in").alias("n_rows"),
            F.count(F.lit(1)).alias("n_distinct"),
        )
    )


COLUMN_HISTOGRAM_SQL = f"""
WITH vals AS (
  SELECT CAST(round(l_extendedprice * {_PRICE_SCALE}) AS BIGINT) AS iv,
         count(*) AS cnt
  FROM lineitem GROUP BY 1
), cum AS (
  SELECT iv, CAST(cnt AS BIGINT) AS cnt,
         CAST(sum(cnt) OVER (ORDER BY iv ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum,
         CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n
  FROM vals
), spans AS (
  SELECT iv, cnt, cum, n,
         unnest(generate_series(CAST((cum - cnt) * {_HIST_BUCKETS} // n AS BIGINT),
                                CAST((cum - 1) * {_HIST_BUCKETS} // n AS BIGINT)))
           AS bucket
  FROM cum
), sized AS (
  SELECT bucket, iv,
         least(cum, ((bucket + 1) * n + {_HIST_BUCKETS} - 1) // {_HIST_BUCKETS})
         - greatest(cum - cnt + 1,
                    (bucket * n + {_HIST_BUCKETS} - 1) // {_HIST_BUCKETS} + 1)
         + 1 AS rows_in
  FROM spans
)
SELECT bucket,
       round(min(iv) / {_PRICE_SCALE}, 2) AS lo_price,
       round(max(iv) / {_PRICE_SCALE}, 2) AS hi_price,
       CAST(sum(rows_in) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_distinct
FROM sized GROUP BY bucket
"""


# --------------------------------------------------------------------------
# Grouped percentiles + equal-frequency binning (grid selection engine)
# --------------------------------------------------------------------------

_PCT_SCALE = 100  # events.value fixed-point grid (2dp)
_PCT_BUCKET = 1024  # histogram-refinement bucket width (selection.py)


def grouped_percentiles(events: DataFrame) -> DataFrame:
    """Exact p50/p90/p99 of ``value`` per event_type — the latency-SLO
    style rollup, computed by histogram-refinement selection
    (operators/selection.py) instead of a per-type full-row sort:
    one (event_type, bucket) count aggregate with map-side combine, a
    bucket-table window, one one-bucket refine per requested rank.
    Nearest-rank definition (r = ceil(p·n/100)) so every percentile is
    an order statistic the DuckDB twin reproduces bit-for-bit.
    """
    from kinesis_dstream_spark.functions.exact import fixedpoint
    from kinesis_dstream_spark.operators.selection import grid_rank_select

    base = events.select(
        "event_type", fixedpoint(F.col("value"), _PCT_SCALE).alias("iv")
    )
    totals = base.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    ranks = None
    for p in (50, 90, 99):
        r = totals.select(
            "event_type",
            F.lit(f"p{p}").alias("sel"),
            F.expr(f"(n * {p} + 99) DIV 100").alias("r"),
        )
        ranks = r if ranks is None else ranks.unionByName(r)
    sel = grid_rank_select(base, "event_type", "iv", ranks, _PCT_BUCKET)
    pivoted = sel.groupBy("event_type").agg(
        *[
            F.round(
                F.max(F.when(F.col("sel") == f"p{p}", F.col("value")))
                / _PCT_SCALE,
                2,
            ).alias(f"p{p}")
            for p in (50, 90, 99)
        ]
    )
    return totals.join(pivoted, "event_type").select(
        "event_type", "n", "p50", "p90", "p99"
    )


GROUPED_PERCENTILES_SQL = f"""
WITH base AS (
  SELECT event_type, CAST(round(value * {_PCT_SCALE}) AS BIGINT) AS iv FROM events
), ranked AS (
  SELECT event_type, iv,
         row_number() OVER (PARTITION BY event_type ORDER BY iv) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM base
)
SELECT event_type, CAST(max(n) AS BIGINT) AS n,
       round(CAST(max(CASE WHEN rn = (n * 50 + 99) // 100 THEN iv END) AS BIGINT)
             / {_PCT_SCALE}, 2) AS p50,
       round(CAST(max(CASE WHEN rn = (n * 90 + 99) // 100 THEN iv END) AS BIGINT)
             / {_PCT_SCALE}, 2) AS p90,
       round(CAST(max(CASE WHEN rn = (n * 99 + 99) // 100 THEN iv END) AS BIGINT)
             / {_PCT_SCALE}, 2) AS p99
FROM ranked GROUP BY event_type
"""


def percentiles_from_value_frequency(freq: DataFrame) -> DataFrame:
    """p50/p90/p99 + n per event_type from an exact value-frequency
    table (event_type, iv, c) — the serving half shared by the
    streaming granule drain (streaming/jobs.py) and the
    ``grouped_percentiles_from_store`` batch fast path: nearest-rank
    selection is a cumulative-count crossing over the DISTINCT-value
    table, so no raw row is ever read or sorted. Output is identical
    to ``grouped_percentiles`` by construction (the frequency table is
    the exact sufficient statistic for every order statistic)."""
    from pyspark.sql import Window

    cum_w = (
        Window.partitionBy("event_type")
        .orderBy("iv")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = freq.select(
        "event_type",
        "iv",
        F.sum("c").over(cum_w).alias("cum"),
        F.sum("c").over(Window.partitionBy("event_type")).alias("n"),
    )
    return cum.groupBy("event_type").agg(
        F.max("n").alias("n"),
        *[
            F.round(
                F.min(
                    F.when(
                        F.col("cum") >= F.expr(f"(n * {p} + 99) DIV 100"),
                        F.col("iv"),
                    )
                )
                / _PCT_SCALE,
                2,
            ).alias(f"p{p}")
            for p in (50, 90, 99)
        ],
    )


def value_decile_binning(events: DataFrame, bins: int = 10) -> DataFrame:
    """Equal-frequency (decile) feature binning per event_type — the
    training-feature discretization step: bin boundaries are the exact
    ceil(j·n/bins) order statistics from histogram-refinement selection
    (never a per-type row sort), broadcast back, and assignment is a
    value comparison (ties at a boundary go to the lower bin — a
    deterministic, rank-free rule both engines replay). Per-bin counts
    differ from n/bins exactly where boundary ties lump — that lumping
    is part of the declared semantics and the oracle checks it.
    """
    from kinesis_dstream_spark.functions.exact import fixedpoint
    from kinesis_dstream_spark.operators.selection import grid_rank_select

    base = events.select(
        "event_type", fixedpoint(F.col("value"), _PCT_SCALE).alias("iv")
    )
    totals = base.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    ranks = None
    for j in range(1, bins):
        r = totals.select(
            "event_type",
            F.lit(f"b{j}").alias("sel"),
            F.expr(f"(n * {j} + {bins - 1}) DIV {bins}").alias("r"),
        )
        ranks = r if ranks is None else ranks.unionByName(r)
    bounds = (
        grid_rank_select(base, "event_type", "iv", ranks, _PCT_BUCKET)
        .groupBy("event_type")
        .agg(F.sort_array(F.collect_list("value")).alias("bs"))
    )
    binned = base.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "iv",
        (
            F.lit(1)
            + F.size(F.filter("bs", lambda b: F.col("iv") > b))
        ).cast("int").alias("bin"),
    )
    return binned.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.min("iv") / _PCT_SCALE, 2).alias("lo_value"),
        F.round(F.max("iv") / _PCT_SCALE, 2).alias("hi_value"),
    )


VALUE_DECILE_BINNING_SQL = f"""
WITH base AS (
  SELECT event_type, CAST(round(value * {_PCT_SCALE}) AS BIGINT) AS iv FROM events
), ranked AS (
  SELECT event_type, iv,
         row_number() OVER (PARTITION BY event_type ORDER BY iv) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM base
), bounds AS (
  SELECT r.event_type, r.iv AS b
  FROM ranked r
  JOIN (SELECT unnest(range(1, 10)) AS j) js
    ON r.rn = (r.n * js.j + 9) // 10
), binned AS (
  SELECT b.event_type, b.iv,
         CAST(1 + (SELECT count(*) FROM bounds x
                   WHERE x.event_type = b.event_type AND b.iv > x.b)
              AS INT) AS bin
  FROM base b
)
SELECT event_type, bin, count(*) AS n_rows,
       round(CAST(min(iv) AS BIGINT) / {_PCT_SCALE}, 2) AS lo_value,
       round(CAST(max(iv) AS BIGINT) / {_PCT_SCALE}, 2) AS hi_value
FROM binned GROUP BY event_type, bin
"""


def value_ks_drift(events: DataFrame) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov distance between each event
    type's ``value`` distribution and the pooled rest — the
    distribution-drift test a feature pipeline runs before trusting a
    segment: KS is the max gap between empirical CDFs, and on the
    fixed-point grid it is EXACT integer arithmetic (no sampling, no
    binning error): D_t = max_x |F_t(x) − F_rest(x)| =
    max_x |cum_t(x)·n_rest − cum_rest(x)·n_t| / (n_t·n_rest), with the
    numerator reported as the hash-exact ``ks_num`` and the statistic
    as a 6dp round of one int→double division.

    Plan: one (type, iv) count (the only row-grain shuffle, spread by
    value like the selection engine), then everything operates on the
    |distinct values| grid: a partition-less cumulative window over
    the grid table (grid-bounded, independent of row count — same
    boundedness argument as selection.py's bucket table), a broadcast
    |types|-row cross join, and a per-type cumulative window over
    |grid|·|types| rows. int64 bound: cum·n products need
    n_t·n ≲ 9·10¹⁸ (n ≤ ~3·10⁹ rows); beyond that cast the two
    products to decimal(38,0) — one line, identical semantics.
    """
    from kinesis_dstream_spark.functions.exact import fixedpoint

    base = events.select(
        "event_type", fixedpoint(F.col("value"), _PCT_SCALE).alias("iv")
    )
    counts = base.groupBy("event_type", "iv").agg(F.count(F.lit(1)).alias("c"))
    return ks_from_value_frequency(counts)


def ks_from_value_frequency(counts: DataFrame) -> DataFrame:
    """KS drift from the (event_type, iv, c) value-frequency table —
    the selection engine's sufficient statistic, so this entry point
    serves both the raw scan above and the streaming-maintained granule
    store (``streaming/jobs.value_ks_from_store``): every quantity in
    the KS statistic is a cumulative count over the grid."""
    from pyspark.sql import Window

    grid = counts.groupBy("iv").agg(F.sum("c").alias("c_all"))
    cum_all_w = Window.orderBy("iv").rowsBetween(Window.unboundedPreceding, 0)
    grid_cum = grid.select(
        "iv", F.sum("c_all").over(cum_all_w).alias("cum_all")
    )
    totals = counts.groupBy("event_type").agg(F.sum("c").alias("n_t"))
    grand = totals.agg(F.sum("n_t").alias("n"))
    pairs = grid_cum.crossJoin(F.broadcast(totals.crossJoin(grand)))
    cum_t_w = (
        Window.partitionBy("event_type")
        .orderBy("iv")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    joined = (
        pairs.join(counts, ["event_type", "iv"], "left")
        .select(
            "event_type",
            "iv",
            "cum_all",
            "n_t",
            "n",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
        .withColumn("cum_t", F.sum("c").over(cum_t_w))
    )
    stat = F.abs(
        F.col("cum_t") * (F.col("n") - F.col("n_t"))
        - (F.col("cum_all") - F.col("cum_t")) * F.col("n_t")
    )
    return (
        joined.select("event_type", "n_t", "n", stat.alias("d"))
        .groupBy("event_type")
        .agg(
            F.max("n_t").alias("n_type"),
            (F.max("n") - F.max("n_t")).alias("n_rest"),
            F.max("d").alias("ks_num"),
        )
        .select(
            "event_type",
            "n_type",
            "n_rest",
            "ks_num",
            # n_rest = 0 (a single-type corpus: nothing to drift
            # against) would THROW under Spark's ANSI integer division
            # while DuckDB returns NULL — emit NULL explicitly in both
            # engines (the r9 degenerate-denominator rule)
            F.when(
                F.col("n_rest") > 0,
                F.round(
                    F.col("ks_num") / (F.col("n_type") * F.col("n_rest")), 6
                ),
            ).alias("ks_stat"),
        )
    )


VALUE_KS_DRIFT_SQL = f"""
WITH base AS (
  SELECT event_type, CAST(round(value * {_PCT_SCALE}) AS BIGINT) AS iv
  FROM events
), counts AS (
  SELECT event_type, iv, count(*) AS c FROM base GROUP BY event_type, iv
), grid AS (
  SELECT iv, sum(c) AS c_all FROM counts GROUP BY iv
), grid_cum AS (
  SELECT iv, sum(c_all) OVER (ORDER BY iv) AS cum_all FROM grid
), totals AS (
  SELECT event_type, CAST(sum(c) AS BIGINT) AS n_t FROM counts
  GROUP BY event_type
), grand AS (SELECT CAST(sum(n_t) AS BIGINT) AS n FROM totals),
joined AS (
  SELECT t.event_type, g.iv, g.cum_all, t.n_t, gr.n,
         coalesce(c.c, 0) AS c
  FROM grid_cum g CROSS JOIN totals t CROSS JOIN grand gr
  LEFT JOIN counts c ON c.event_type = t.event_type AND c.iv = g.iv
), cum AS (
  SELECT event_type, n_t, n, cum_all,
         sum(c) OVER (PARTITION BY event_type ORDER BY iv) AS cum_t
  FROM joined
)
SELECT event_type, CAST(max(n_t) AS BIGINT) AS n_type,
       CAST(max(n) - max(n_t) AS BIGINT) AS n_rest,
       CAST(max(abs(cum_t * (n - n_t) - (cum_all - cum_t) * n_t))
            AS BIGINT) AS ks_num,
       CASE WHEN max(n) - max(n_t) > 0 THEN
         round(CAST(max(abs(cum_t * (n - n_t) - (cum_all - cum_t) * n_t))
                    AS BIGINT)
               / (CAST(max(n_t) AS BIGINT) * (max(n) - max(n_t))), 6)
       END AS ks_stat
FROM cum GROUP BY event_type
"""


def value_gini_by_type(events: DataFrame) -> DataFrame:
    """Exact Gini coefficient of ``value`` per event type — the
    inequality/concentration lens on value mass (companion to
    ``event_concentration_hhi``'s user-concentration): G = (2·Σ i·x₍ᵢ₎
    − (n+1)·Σx) / (n·Σx) over the ascending sort — computed WITHOUT
    sorting rows, from the (type, iv, count) value-frequency table:
    rows sharing a value contribute a closed-form rank sum
    (c·cum_before + c(c+1)/2), so 2·Σ i·x₍ᵢ₎ =
    Σ_v iv·(2·c·cum_before + c² + c) — integer arithmetic end to end,
    one row-grain (type, iv) count then a grid-bounded cumulative
    window, the selection-engine plan shape. Defined for non-negative
    value columns (standard Gini domain); the formula itself is
    deterministic regardless. 6dp round of one int→double division.
    """
    from kinesis_dstream_spark.functions.exact import fixedpoint

    base = events.select(
        "event_type", fixedpoint(F.col("value"), _PCT_SCALE).alias("iv")
    )
    freq = base.groupBy("event_type", "iv").agg(F.count(F.lit(1)).alias("c"))
    return gini_from_value_frequency(freq)


def gini_from_value_frequency(freq: DataFrame) -> DataFrame:
    """Gini from the (event_type, iv, c) value-frequency table — the
    shared sufficient statistic (same contract as
    ``percentiles_from_value_frequency`` / ``ks_from_value_frequency``
    / ``rank_normalize_from_value_frequency``): a pure function of the
    granules, so the streaming percentile maintenance serves this too.
    Separated from ``value_gini_by_type`` (r11) so the granule-store
    path and the scan path share one arithmetic body."""
    from pyspark.sql import Window

    before = (
        Window.partitionBy("event_type")
        .orderBy("iv")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    terms = freq.select(
        "event_type",
        "c",
        "iv",
        F.coalesce(F.sum("c").over(before), F.lit(0)).alias("cb"),
    )
    agg = terms.groupBy("event_type").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("iv") * F.col("c")).alias("s"),
        F.sum(
            F.col("iv")
            * (
                F.lit(2) * F.col("c") * F.col("cb")
                + F.col("c") * F.col("c")
                + F.col("c")
            )
        ).alias("t2"),
    )
    return agg.select(
        "event_type",
        "n",
        F.round(F.col("s") / _PCT_SCALE, 2).alias("total_value"),
        # s = 0 (all-zero values for a type — plausible for
        # zero-inflated metrics) would make this 0/0; emit NULL
        # explicitly so Spark and the DuckDB twin agree at the hash
        # gate instead of diverging NaN-vs-NULL.
        F.when(
            F.col("s") != 0,
            F.round(
                (F.col("t2") - (F.col("n") + 1) * F.col("s"))
                / (F.col("n") * F.col("s")),
                6,
            ),
        ).alias("gini"),
    )


VALUE_GINI_SQL = f"""
WITH base AS (
  SELECT event_type, CAST(round(value * {_PCT_SCALE}) AS BIGINT) AS iv
  FROM events
), freq AS (
  SELECT event_type, iv, count(*) AS c FROM base GROUP BY event_type, iv
), terms AS (
  SELECT event_type, iv, c,
         coalesce(sum(c) OVER (PARTITION BY event_type ORDER BY iv
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
  FROM freq
), agg AS (
  SELECT event_type, CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(iv * c) AS BIGINT) AS s,
         CAST(sum(iv * (2 * c * cb + c * c + c)) AS BIGINT) AS t2
  FROM terms GROUP BY event_type
)
SELECT event_type, n, round(s / {_PCT_SCALE}, 2) AS total_value,
       CASE WHEN s <> 0
            THEN round((t2 - (n + 1) * s) / (n * s), 6)
            ELSE NULL END AS gini
FROM agg
"""


def categorical_association(
    orders: DataFrame, col_a: str = "o_orderstatus", col_b: str = "o_orderpriority"
) -> DataFrame:
    """Chi-square contingency profile between two categorical columns —
    the dependence screen a pipeline runs before trusting one column as
    a stratification key for the other (independent ⇒ stratifying on A
    doesn't bias B). Emits the FULL value grid (absent cells as
    observed = 0 — they carry association signal too) with per-cell
    exact-integer moments:

      observed        raw cell count (bigint)
      expected_ppm    trunc(10⁶·rowtot·coltot/N) — exact fixed-point
      delta_num       observed·N − rowtot·coltot (the (O−E)·N numerator,
                      exact; sign = over/under-representation)
      chi_contrib     (O−E)²/E = delta_num²/(rowtot·coltot·N), evaluated
                      as the SAME double expression in both engines

    No cross-cell double sum is emitted (accumulation order would be
    engine-dependent); the consumer sums chi_contrib at display grain.
    int64 envelope: delta_num needs N·max(observed) < 2⁶³ — safe below
    ~3·10⁹ rows per column pair; beyond that, switch the two products
    to decimal(38,0) (same expressions, wider lattice).

    Plan: three map-combined aggregates (cells, row margins, column
    margins — the only row-grain work, one scan if the cell aggregate
    feeds the margins, which it does here) and a broadcast-sized grid
    join of the |A|·|B| margin cross product.
    """
    cells = orders.groupBy(
        F.col(col_a).alias("va"), F.col(col_b).alias("vb")
    ).agg(F.count(F.lit(1)).alias("observed"))
    rt = cells.groupBy("va").agg(F.sum("observed").alias("rt"))
    ct = cells.groupBy("vb").agg(F.sum("observed").alias("ct"))
    n = cells.agg(F.sum("observed").alias("n"))
    grid = rt.crossJoin(F.broadcast(ct)).crossJoin(F.broadcast(n))
    full = grid.join(cells, ["va", "vb"], "left").select(
        "va",
        "vb",
        F.coalesce("observed", F.lit(0)).cast("long").alias("observed"),
        "rt",
        "ct",
        "n",
    )
    delta = F.col("observed") * F.col("n") - F.col("rt") * F.col("ct")
    return full.select(
        "va",
        "vb",
        "observed",
        F.expr("CAST((1000000 * rt * ct) div n AS BIGINT)").alias("expected_ppm"),
        delta.cast("long").alias("delta_num"),
        (
            delta.cast("double")
            * delta.cast("double")
            / (F.col("rt").cast("double") * F.col("ct") * F.col("n"))
        ).alias("chi_contrib"),
    )


CATEGORICAL_ASSOCIATION_SQL = """
WITH cells AS (
  SELECT o_orderstatus AS va, o_orderpriority AS vb,
         CAST(count(*) AS BIGINT) AS observed
  FROM orders GROUP BY 1, 2
), rt AS (SELECT va, CAST(sum(observed) AS BIGINT) AS rt FROM cells GROUP BY 1),
ct AS (SELECT vb, CAST(sum(observed) AS BIGINT) AS ct FROM cells GROUP BY 1),
n AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM cells),
full_grid AS (
  SELECT rt.va, ct.vb, coalesce(c.observed, 0) AS observed, rt.rt, ct.ct, n.n
  FROM rt CROSS JOIN ct CROSS JOIN n
  LEFT JOIN cells c ON c.va = rt.va AND c.vb = ct.vb
)
SELECT va, vb, CAST(observed AS BIGINT) AS observed,
       CAST((1000000 * rt * ct) // n AS BIGINT) AS expected_ppm,
       CAST(observed * n - rt * ct AS BIGINT) AS delta_num,
       CAST(observed * n - rt * ct AS DOUBLE)
         * CAST(observed * n - rt * ct AS DOUBLE)
         / (CAST(rt AS DOUBLE) * ct * n) AS chi_contrib
FROM full_grid
"""


def rank_normalize_from_value_frequency(freq: DataFrame) -> DataFrame:
    """Mid-rank quantile transform from the exact value-frequency
    table: every distinct (event_type, value) maps to its tie-aware
    mid-rank percentile ``rank_ppm = trunc(10⁶·(2·cum − c + 1)/(2n))``
    — the rank/quantile normalization step of classic feature
    preprocessing (makes any monotone-scaled metric comparable across
    types), exact in int64 (the doubled mid-rank keeps the ½ out of
    float). Output is at the DISTINCT-VALUE grain: |values| rows,
    independent of event count — which is why this is the third
    consumer of the streaming value-frequency granule store."""
    from pyspark.sql import Window

    cum_w = (
        Window.partitionBy("event_type")
        .orderBy("iv")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = freq.select(
        "event_type",
        "iv",
        "c",
        F.sum("c").over(cum_w).alias("cum"),
        F.sum("c").over(Window.partitionBy("event_type")).alias("n"),
    )
    return cum.select(
        "event_type",
        F.round(F.col("iv") / _PCT_SCALE, 2).alias("value"),
        F.col("c").cast("long").alias("c"),
        F.expr("CAST((1000000 * (2 * cum - c + 1)) DIV (2 * n) AS BIGINT)").alias(
            "rank_ppm"
        ),
    )


def value_rank_normalize(events: DataFrame) -> DataFrame:
    """Scan-path twin of the rank/quantile transform: build the exact
    (event_type, iv, c) frequency table (ONE map-combined row-grain
    shuffle, spread by value so a hot type cannot hot-spot — the
    selection-engine argument) and normalize on it. The store-served
    variant (``streaming/jobs.rank_normalize_from_store``) reads the
    maintained granules instead; both run
    ``rank_normalize_from_value_frequency`` on a value-identical
    table, so equality is structural."""
    from kinesis_dstream_spark.functions.exact import fixedpoint

    freq = (
        events.select(
            "event_type", fixedpoint(F.col("value"), _PCT_SCALE).alias("iv")
        )
        .groupBy("event_type", "iv")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return rank_normalize_from_value_frequency(freq)


VALUE_RANK_NORMALIZE_SQL = f"""
WITH base AS (
  SELECT event_type, CAST(round(value * {_PCT_SCALE}) AS BIGINT) AS iv FROM events
), freq AS (
  SELECT event_type, iv, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1, 2
), cum AS (
  SELECT event_type, iv, c,
         sum(c) OVER (PARTITION BY event_type ORDER BY iv) AS cum,
         sum(c) OVER (PARTITION BY event_type) AS n
  FROM freq
)
SELECT event_type, round(iv / {_PCT_SCALE}, 2) AS value, c,
       CAST((1000000 * (2 * cum - c + 1)) // (2 * n) AS BIGINT) AS rank_ppm
FROM cum
"""


def functional_dependency_profile(
    orders: DataFrame,
    pairs: tuple[tuple[str, str], ...] = (
        ("o_custkey", "o_orderstatus"),
        ("o_orderkey", "o_orderpriority"),
        ("o_orderpriority", "o_orderstatus"),
        ("o_orderdate", "o_orderstatus"),
    ),
) -> DataFrame:
    """Functional-dependency discovery over candidate column pairs —
    the schema-profiling pass (Metanome/Deequ territory) that answers
    "does A determine B in this data": for each candidate A→B, the
    number of distinct A values, how many of them map to MORE than one
    B (the violating keys), the worst fan-out, and the violation rate
    in exact ppm. An FD that holds (0 violations) licenses
    normalization, dedup survivorship rules, and join-cardinality
    assumptions; one that almost-holds flags dirty keys.

    One aggregation pair per candidate (distinct (A,B) count-down →
    per-A distinct-B count — both map-combined), unioned into a single
    result; no candidate scans the table twice wastefully at scale —
    each is an independent column-pruned scan, and a consumer probing
    many candidates batches them per LHS column.
    """
    out = None
    for lhs, rhs in pairs:
        per_key = (
            orders.select(F.col(lhs).alias("k"), F.col(rhs).alias("v"))
            .distinct()
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n_rhs"))
        )
        prof = per_key.agg(
            F.lit(f"{lhs}->{rhs}").alias("candidate"),
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0)).alias(
                "n_violating_keys"
            ),
            F.max("n_rhs").alias("max_fanout"),
            F.expr(
                "CAST((1000000 * sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END))"
                " div count(*) AS BIGINT)"
            ).alias("violation_ppm"),
        )
        out = prof if out is None else out.unionByName(prof)
    return out


def functional_dependency_sql(
    pairs: tuple[tuple[str, str], ...] = (
        ("o_custkey", "o_orderstatus"),
        ("o_orderkey", "o_orderpriority"),
        ("o_orderpriority", "o_orderstatus"),
        ("o_orderdate", "o_orderstatus"),
    ),
) -> str:
    """DuckDB twin generated from the SAME candidate list."""
    parts = []
    for lhs, rhs in pairs:
        parts.append(f"""
SELECT '{lhs}->{rhs}' AS candidate,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_keys,
       CAST(max(n_rhs) AS BIGINT) AS max_fanout,
       CAST((1000000 * sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END))
            // count(*) AS BIGINT) AS violation_ppm
FROM (
  SELECT k, count(*) AS n_rhs FROM (
    SELECT DISTINCT {lhs} AS k, {rhs} AS v FROM orders
  ) GROUP BY k
)""")
    return "\nUNION ALL\n".join(parts)


FUNCTIONAL_DEPENDENCY_SQL = functional_dependency_sql()


_PSI_BINS = 10
_PSI_TERM_SCALE = 1_000_000_000  # per-bin term fixed-point (exact.py idiom)


def value_psi_temporal(events: DataFrame, bins: int = _PSI_BINS) -> DataFrame:
    """Population Stability Index of each event type's ``value``
    distribution, EARLY half vs LATE half of the stream (split at the
    midpoint day) — the standard production drift monitor ("did this
    feature shift since the model was fit"), complementing
    ``value_ks_drift``'s type-vs-rest contrast with a temporal one.
    Rule-of-thumb thresholds: <0.1 stable, 0.1-0.25 moderate, >0.25
    action.

    PSI = Σ_bins (q − p)·ln(q/p) over ``bins`` equal-width bins of the
    global fixed-point value range, with Laplace smoothing
    p = (c+1)/(n+bins) so empty bins contribute finitely (and the full
    type×bin grid is generated, so a bin empty on BOTH sides still
    contributes its n_base-vs-n_target imbalance term).

    Determinism discipline: bin ids, counts, and totals are exact
    int64 (equal-width binning is one integer multiply-divide); p, q,
    and ln are identical doubles in both engines; each bin's term is
    fixed-pointed at 1e-9 before the Σ, so the per-type sum is an
    order-independent int64 aggregate (the exact.py rule — a raw
    double Σ would hash-flake on accumulation order).

    Plan: ONE row-grain shuffle (the (type, bin) count, carrying base
    and target columns in the same aggregate); everything after runs
    on |types|·bins rows against broadcast bounds. The corpus is
    scanned once.
    """
    from kinesis_dstream_spark.functions.exact import fixedpoint

    base = events.select(
        "event_type",
        F.to_date("ts").alias("day"),
        fixedpoint(F.col("value"), _PCT_SCALE).alias("iv"),
    )
    bounds = base.agg(
        F.min("day").alias("min_day"),
        F.max("day").alias("max_day"),
        F.min("iv").alias("min_iv"),
        F.max("iv").alias("max_iv"),
    ).select(
        F.expr("date_add(min_day, CAST(datediff(max_day, min_day) DIV 2 AS INT))")
        .alias("mid_day"),
        "min_iv",
        "max_iv",
    )
    binned = base.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        (F.col("day") <= F.col("mid_day")).cast("long").alias("is_base"),
        F.expr(
            f"least({bins} - 1, CAST(((iv - min_iv) * {bins})"
            " DIV (max_iv - min_iv + 1) AS INT))"
        ).alias("bin"),
    )
    counts = binned.groupBy("event_type", "bin").agg(
        F.sum("is_base").alias("c_base"),
        F.sum(1 - F.col("is_base")).alias("c_target"),
    )
    totals = counts.groupBy("event_type").agg(
        F.sum("c_base").alias("n_base"), F.sum("c_target").alias("n_target")
    )
    spark = events.sparkSession
    grid = totals.crossJoin(
        F.broadcast(spark.range(bins).select(F.col("id").alias("bin")))
    )
    full = grid.join(counts, ["event_type", "bin"], "left").select(
        "event_type",
        "n_base",
        "n_target",
        F.coalesce("c_base", F.lit(0)).alias("c_base"),
        F.coalesce("c_target", F.lit(0)).alias("c_target"),
    )
    p = (F.col("c_base") + 1) / (F.col("n_base") + bins)
    q = (F.col("c_target") + 1) / (F.col("n_target") + bins)
    term_fp = F.round((q - p) * F.log(q / p) * _PSI_TERM_SCALE, 0).cast("long")
    return (
        full.select("event_type", "n_base", "n_target", term_fp.alias("tf"))
        .groupBy("event_type")
        .agg(
            F.max("n_base").alias("n_base"),
            F.max("n_target").alias("n_target"),
            F.round(
                F.sum("tf") / float(_PSI_TERM_SCALE), 6
            ).alias("psi"),
        )
    )


VALUE_PSI_TEMPORAL_SQL = f"""
WITH base AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(round(value * {_PCT_SCALE}) AS BIGINT) AS iv
  FROM events
), bounds AS (
  SELECT min(day) + CAST(date_diff('day', min(day), max(day)) // 2 AS INT)
           AS mid_day,
         min(iv) AS min_iv, max(iv) AS max_iv
  FROM base
), binned AS (
  SELECT event_type,
         CASE WHEN day <= mid_day THEN 1 ELSE 0 END AS is_base,
         least({_PSI_BINS} - 1,
               CAST(((iv - min_iv) * {_PSI_BINS})
                    // (max_iv - min_iv + 1) AS INT)) AS bin
  FROM base, bounds
), counts AS (
  SELECT event_type, bin,
         CAST(sum(is_base) AS BIGINT) AS c_base,
         CAST(sum(1 - is_base) AS BIGINT) AS c_target
  FROM binned GROUP BY 1, 2
), totals AS (
  SELECT event_type, CAST(sum(c_base) AS BIGINT) AS n_base,
         CAST(sum(c_target) AS BIGINT) AS n_target
  FROM counts GROUP BY 1
), grid AS (
  SELECT t.event_type, t.n_base, t.n_target, g.bin
  FROM totals t, (SELECT unnest(generate_series(0, {_PSI_BINS} - 1)) AS bin) g
), full_grid AS (
  SELECT g.event_type, g.n_base, g.n_target,
         coalesce(c.c_base, 0) AS c_base,
         coalesce(c.c_target, 0) AS c_target
  FROM grid g LEFT JOIN counts c
    ON c.event_type = g.event_type AND c.bin = g.bin
), terms AS (
  SELECT event_type, n_base, n_target,
         CAST(round((
             (c_target + 1) / CAST(n_target + {_PSI_BINS} AS DOUBLE)
             - (c_base + 1) / CAST(n_base + {_PSI_BINS} AS DOUBLE)
           ) * ln((
             (c_target + 1) / CAST(n_target + {_PSI_BINS} AS DOUBLE)
           ) / (
             (c_base + 1) / CAST(n_base + {_PSI_BINS} AS DOUBLE)
           )) * {_PSI_TERM_SCALE}) AS BIGINT) AS tf
  FROM full_grid
)
SELECT event_type, max(n_base) AS n_base, max(n_target) AS n_target,
       round(CAST(sum(tf) AS BIGINT) / {_PSI_TERM_SCALE}.0, 6) AS psi
FROM terms GROUP BY 1
"""


_BENFORD_TERM_SCALE = 1_000_000
# micro fixed-point for first-significant-digit extraction (r10 ADVICE:
# cents mis-digit sub-unit values; micros resolve down to 1e-6)
_BENFORD_DIGIT_SCALE = 1_000_000


def benford_digit_audit(events: DataFrame) -> DataFrame:
    """First-significant-digit audit per event type against Benford's
    law — the classic fabricated/synthetic-data smell test (organically
    grown magnitudes follow P(d) = log10(1+1/d); uniform or templated
    generators don't). Reports the chi-square distance and the
    digit-1 share; on the synthetic fixture the statistic is LARGE by
    construction — the audit correctly smells synthetic data — and the
    pytest pins that a constructed log-uniform sample passes while a
    uniform one fails.

    Determinism discipline: the first significant digit comes from
    INTEGER fixed-point MICROS (leading char of the int64's decimal
    string — the leading char of a positive integer is never '0', and
    string rendering of positive ints is engine-identical, dodging the
    float log10-at-power-boundary hazard). Micros, not cents (r10
    ADVICE): at cents scale, sub-unit values mis-digit (0.095 → cents
    10 → digit 1, true digit 9) and values < 0.005 produce cents=0
    rows that inflated n while being excluded from the 1-9 grid. At
    micro scale the rounding can only flip the digit for values within
    5e-7 of a digit boundary, and the ``micros >= 1`` filter makes a
    '0' digit impossible, so n is exactly the sum over the 1-9 counts.
    Audit domain: 1e-6 ≤ value < 9.2e12 (int64 fixed-point headroom;
    both bounds filtered identically in both engines — values outside
    are not Benford-auditable at this resolution). Expected counts are
    identical doubles; each digit's (obs−exp)²/exp term is
    fixed-pointed before the Σ (order-independent int64 sum); the full
    type×digit grid is generated so absent digits contribute their
    (0−exp)²/exp mass.

    Plan: one (type, digit) count — row-grain work is a 9-ary group —
    then |types|·9 rows of arithmetic. One corpus scan.
    """
    from kinesis_dstream_spark.functions.exact import fixedpoint

    base = (
        events.filter((F.col("value") > 0) & (F.col("value") < 9.2e12))
        .select(
            "event_type",
            fixedpoint(F.col("value"), _BENFORD_DIGIT_SCALE).alias("micros"),
        )
        .filter(F.col("micros") >= 1)
    )
    digits = base.select(
        "event_type",
        F.substring(F.col("micros").cast("string"), 1, 1).cast("int").alias("d"),
    )
    counts = digits.groupBy("event_type", "d").agg(
        F.count(F.lit(1)).alias("c")
    )
    totals = counts.groupBy("event_type").agg(F.sum("c").alias("n"))
    spark = events.sparkSession
    grid = totals.crossJoin(
        F.broadcast(spark.range(1, 10).select(F.col("id").cast("int").alias("d")))
    )
    full = grid.join(counts, ["event_type", "d"], "left").select(
        "event_type",
        "n",
        "d",
        F.coalesce("c", F.lit(0)).alias("c"),
    )
    exp = F.col("n") * F.log10(1 + 1.0 / F.col("d"))
    term_fp = F.round(
        (F.col("c") - exp) * (F.col("c") - exp) / exp * _BENFORD_TERM_SCALE, 0
    ).cast("long")
    d1 = F.sum(F.when(F.col("d") == 1, F.col("c"))).alias("_d1")
    return (
        full.select("event_type", "n", "d", "c", term_fp.alias("tf"))
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.round(
                F.sum("tf") / float(_BENFORD_TERM_SCALE), 4
            ).alias("chi_square"),
            F.round(
                F.sum(F.when(F.col("d") == 1, F.col("c"))) / F.max("n"), 6
            ).alias("digit1_frac"),
        )
    )


BENFORD_DIGIT_AUDIT_SQL = f"""
WITH base AS (
  SELECT event_type, CAST(round(value * {_BENFORD_DIGIT_SCALE}) AS BIGINT) AS micros
  FROM events WHERE value > 0 AND value < 9.2e12
), digits AS (
  SELECT event_type,
         CAST(substr(CAST(micros AS VARCHAR), 1, 1) AS INT) AS d
  FROM base WHERE micros >= 1
), counts AS (
  SELECT event_type, d, CAST(count(*) AS BIGINT) AS c
  FROM digits GROUP BY 1, 2
), totals AS (
  SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM counts GROUP BY 1
), grid AS (
  SELECT t.event_type, t.n, g.d
  FROM totals t, (SELECT CAST(unnest(generate_series(1, 9)) AS INT) AS d) g
), full_grid AS (
  SELECT g.event_type, g.n, g.d, coalesce(c.c, 0) AS c
  FROM grid g LEFT JOIN counts c ON c.event_type = g.event_type AND c.d = g.d
), terms AS (
  SELECT event_type, n, d, c,
         CAST(round(
           (c - n * log10(1 + 1.0 / d)) * (c - n * log10(1 + 1.0 / d))
             / (n * log10(1 + 1.0 / d)) * {_BENFORD_TERM_SCALE}) AS BIGINT) AS tf
  FROM full_grid
)
SELECT event_type, max(n) AS n,
       round(CAST(sum(tf) AS BIGINT) / {_BENFORD_TERM_SCALE}.0, 4) AS chi_square,
       round(CAST(sum(CASE WHEN d = 1 THEN c END) AS BIGINT)
             / CAST(max(n) AS DOUBLE), 6) AS digit1_frac
FROM terms GROUP BY 1
"""


# ---------------------------------------------------------------------------
# PII audit (r11): the compliance pre-flight an LLM training pipeline
# runs before a corpus ships — count, per source, how many documents
# carry each recognizable PII class and how many instances. Sibling of
# ``text.pii_scrub_stats`` (r4), deliberately NOT merged: the scrub op
# is the per-LANGUAGE redaction throughput stage with a permissive
# catch-all phone shape (favoring recall when everything gets replaced
# anyway); the audit needs per-SOURCE, per-class counts a compliance
# reviewer can act on, so its shapes are ANCHORED (word-boundary,
# fixed group structure — a match is an assertable finding, not a
# maybe) and it adds the SSN class. Detection is regex over classes
# chosen for ENGINE-IDENTICAL semantics (ASCII \d and \b behave the
# same under Java regex and RE2; no lookarounds, no unicode classes).
# Pattern strings are module constants shared verbatim by the Spark
# builder and the DuckDB twin — one definition, zero drift.
# ---------------------------------------------------------------------------

PII_AUDIT_PATTERNS: dict[str, str] = {
    # local-part@domain.tld — the pragmatic email shape (full RFC 5322
    # needs backtracking constructs RE2 refuses)
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # NANP-style 555-123-4567 / 555.123.4567
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    # US SSN 123-45-6789
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    # dotted-quad IPv4 (over-matches 999.9.9.9 — an audit counts
    # candidates; octet range-checking is the redactor's job)
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_audit(documents: DataFrame) -> DataFrame:
    """Per-source PII exposure report: docs scanned, and per class the
    count of documents containing ≥1 match plus the total instance
    count. Zero-hit sources still report (a compliance report that
    omits clean sources can't prove it scanned them) — so the output
    is one row per source at every fixture scale, never vacuous, even
    on the synthetic corpus where all counts are 0 (the constructed-
    PII pytest exercises the positive path and redaction).

    Plan: one corpus scan, regexp_count per class fused into a single
    projection (JVM-side codegen — no Python), one per-source
    aggregate. Both engines scan left-to-right non-overlapping, so
    instance counts match exactly.
    """
    proj = [F.col("source")]
    for cls, pat in PII_AUDIT_PATTERNS.items():
        proj.append(F.regexp_count("text", F.lit(pat)).alias(f"n_{cls}"))
    hits = documents.select(*proj)
    aggs = [F.count(F.lit(1)).alias("docs_scanned")]
    for cls in PII_AUDIT_PATTERNS:
        aggs.append(
            F.sum(
                F.when(F.col(f"n_{cls}") > 0, F.lit(1)).otherwise(F.lit(0))
            ).cast("long").alias(f"docs_with_{cls}")
        )
        aggs.append(F.sum(f"n_{cls}").cast("long").alias(f"total_{cls}"))
    return hits.groupBy("source").agg(*aggs)


def pii_redact(documents: DataFrame) -> DataFrame:
    """Redaction pass: every PII match replaced by its class tag
    (<EMAIL>, <PHONE>, ...), all classes applied in the fixed
    PII_AUDIT_PATTERNS order (order matters: SSN is a substring shape of
    phone's alternatives, so each class must see the already-redacted
    text of the previous ones — both engines compose identically).
    Emits ONLY touched documents (doc_id, n_redactions, text_redacted):
    the common case writes nothing back. Covered by the constructed
    pytest, not an oracle entry — on the clean fixture the correct
    output is empty, which the vacuity gate rightly refuses to count
    as certification."""
    total = None
    redacted = F.col("text")
    for cls, pat in PII_AUDIT_PATTERNS.items():
        n = F.regexp_count("text", F.lit(pat))
        total = n if total is None else total + n
        redacted = F.regexp_replace(redacted, pat, f"<{cls.upper()}>")
    return (
        documents.select(
            "doc_id", total.alias("n_redactions"), redacted.alias("text_redacted")
        )
        .filter(F.col("n_redactions") > 0)
    )


def pii_audit_sql() -> str:
    """DuckDB twin — the SAME PII_AUDIT_PATTERNS constants, instance counts
    via len(regexp_extract_all) (RE2 scans left-to-right non-
    overlapping, exactly like Java's Matcher.find loop)."""
    cols = []
    for cls, pat in PII_AUDIT_PATTERNS.items():
        # DuckDB single-quoted strings do NOT process backslash escapes
        # (standard SQL), so the pattern passes through verbatim — only
        # quotes need doubling
        esc = pat.replace("'", "''")
        cols.append(
            f"CAST(sum(CASE WHEN len(regexp_extract_all(text, '{esc}')) > 0 "
            f"THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_{cls},\n       "
            f"CAST(sum(len(regexp_extract_all(text, '{esc}'))) AS BIGINT) "
            f"AS total_{cls}"
        )
    cols_sql = ",\n       ".join(cols)
    return f"""
SELECT source, CAST(count(*) AS BIGINT) AS docs_scanned,
       {cols_sql}
FROM documents GROUP BY 1
"""


PII_AUDIT_SQL = pii_audit_sql()


_MI_SCALE = 1_000_000_000  # nano-nat fixed-point for entropy terms
_MI_PAIRS = [("p_brand", "p_type"), ("p_brand", "p_size"), ("p_type", "p_size")]


def categorical_mi_profile(part: DataFrame) -> DataFrame:
    """Mutual information (in nats) between categorical column pairs —
    the INFORMATION-theoretic dependence screen beside
    ``categorical_association``'s chi-square: chi-square answers "is
    the dependence statistically surprising", MI answers "how many
    nats does knowing A tell you about B" — the number that ranks
    candidate stratification/blocking keys by usefulness (a key with
    MI≈0 against the target stratifies nothing) and prices feature
    redundancy before training.

    Computed through the entropy identity MI = H(A) + H(B) − H(A,B),
    so each pair needs exactly three count tables (joint + two
    marginals, the marginals AGGREGATED FROM the joint — one row-grain
    shuffle per pair). Every entropy term −(c/n)·ln(c/n) is
    fixed-pointed to nano-nats BEFORE its sum (the exact.py rule: a
    raw double Σ would hash-flake on accumulation order), so H values
    are order-independent int64s and MI is exact integer arithmetic on
    them. NMI = MI/min(H(A),H(B)) (NULL when a column is constant).

    Output: one row per configured pair — n, h_a, h_b, h_ab, mi_nats,
    nmi. Plan per pair: one |A×B|-bounded aggregate + grid-sized
    follow-ups; pairs are unioned, the corpus is scanned once per pair
    (a conditional-agg single-scan variant exists if column pairs grow,
    the dq_constraint_report trick).
    """
    spark = part.sparkSession
    outs = []
    for ca, cb in _MI_PAIRS:
        joint = part.groupBy(
            F.col(ca).cast("string").alias("va"),
            F.col(cb).cast("string").alias("vb"),
        ).agg(F.count(F.lit(1)).alias("c"))
        n_row = joint.agg(F.sum("c").alias("n"))

        def h_fp(df, ccol="c"):
            # Σ round(−(c/n)·ln(c/n)·1e9): per-term fixedpoint then int sum
            return df.crossJoin(F.broadcast(n_row)).select(
                F.round(
                    -(F.col(ccol) / F.col("n"))
                    * F.log(F.col(ccol) / F.col("n"))
                    * _MI_SCALE
                )
                .cast("long")
                .alias("t")
            ).agg(F.sum("t").alias("h"))

        ha = h_fp(joint.groupBy("va").agg(F.sum("c").alias("c")))
        hb = h_fp(joint.groupBy("vb").agg(F.sum("c").alias("c")))
        hab = h_fp(joint)
        row = (
            n_row.crossJoin(F.broadcast(ha.select(F.col("h").alias("h_a"))))
            .crossJoin(F.broadcast(hb.select(F.col("h").alias("h_b"))))
            .crossJoin(F.broadcast(hab.select(F.col("h").alias("h_ab"))))
            .select(
                F.lit(ca).alias("col_a"),
                F.lit(cb).alias("col_b"),
                "n",
                F.round(F.col("h_a") / _MI_SCALE, 6).alias("h_a"),
                F.round(F.col("h_b") / _MI_SCALE, 6).alias("h_b"),
                F.round(F.col("h_ab") / _MI_SCALE, 6).alias("h_ab"),
                F.round(
                    (F.col("h_a") + F.col("h_b") - F.col("h_ab")) / _MI_SCALE, 6
                ).alias("mi_nats"),
                F.when(
                    F.least("h_a", "h_b") > 0,
                    F.round(
                        (F.col("h_a") + F.col("h_b") - F.col("h_ab"))
                        / F.least("h_a", "h_b"),
                        4,
                    ),
                ).alias("nmi"),
            )
        )
        outs.append(row)
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result


def categorical_mi_sql() -> str:
    """DuckDB twin over the SAME pair list / scale."""
    blocks = []
    for ca, cb in _MI_PAIRS:
        blocks.append(f"""
SELECT '{ca}' AS col_a, '{cb}' AS col_b, n,
       round(h_a / {_MI_SCALE}.0, 6) AS h_a,
       round(h_b / {_MI_SCALE}.0, 6) AS h_b,
       round(h_ab / {_MI_SCALE}.0, 6) AS h_ab,
       round((h_a + h_b - h_ab) / {_MI_SCALE}.0, 6) AS mi_nats,
       CASE WHEN least(h_a, h_b) > 0 THEN
         round((h_a + h_b - h_ab) * 1.0 / least(h_a, h_b), 4)
       END AS nmi
FROM (
  WITH joint AS (
    SELECT CAST({ca} AS VARCHAR) AS va, CAST({cb} AS VARCHAR) AS vb,
           CAST(count(*) AS BIGINT) AS c
    FROM part GROUP BY 1, 2
  ), nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM joint),
  ha AS (
    SELECT CAST(sum(CAST(round(-(c * 1.0 / n) * ln(c * 1.0 / n) * {_MI_SCALE})
                 AS BIGINT)) AS BIGINT) AS h_a
    FROM (SELECT va, CAST(sum(c) AS BIGINT) AS c FROM joint GROUP BY va), nn
  ),
  hb AS (
    SELECT CAST(sum(CAST(round(-(c * 1.0 / n) * ln(c * 1.0 / n) * {_MI_SCALE})
                 AS BIGINT)) AS BIGINT) AS h_b
    FROM (SELECT vb, CAST(sum(c) AS BIGINT) AS c FROM joint GROUP BY vb), nn
  ),
  hab AS (
    SELECT CAST(sum(CAST(round(-(c * 1.0 / n) * ln(c * 1.0 / n) * {_MI_SCALE})
                 AS BIGINT)) AS BIGINT) AS h_ab
    FROM joint, nn
  )
  SELECT nn.n, ha.h_a, hb.h_b, hab.h_ab FROM nn, ha, hb, hab
)""")
    return "\nUNION ALL\n".join(blocks)


CATEGORICAL_MI_SQL = categorical_mi_sql()


_TRIM_PCT = 5


def trimmed_mean_from_value_frequency(
    freq: DataFrame, trim_pct: int = _TRIM_PCT
) -> DataFrame:
    """Symmetric trimmed mean per event type from the (event_type, iv,
    count) value-frequency table — the robust-location statistic
    between the mean (skew-hostage) and the median (throws away 98% of
    the data): drop the lowest and highest ``trim_pct``% BY RANK, mean
    the middle. Pure rank arithmetic over the distinct-value grain
    (the fifth pure function of the percentile granules): each value
    row's contribution is the exact overlap of its rank interval
    (cum_before, cum] with the kept band (t, n−t] — no row sort, no
    row-grain work at all when served from the store.

    All quantities are exact int64 until the single final display
    division; ties need no rule because trimming is BY RANK COUNT and
    equal values contribute interchangeably. Types with n − 2t ≤ 0
    (tiny groups fully trimmed) emit NULL — explicit in both engines.
    """
    from pyspark.sql import Window

    n_w = Window.partitionBy("event_type")
    before = (
        Window.partitionBy("event_type")
        .orderBy("iv")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rows = (
        freq.withColumn("n", F.sum("c").over(n_w))
        .withColumn("cb", F.coalesce(F.sum("c").over(before), F.lit(0)))
        .withColumn("t", F.expr(f"n * {trim_pct} div 100"))
        .withColumn(
            "kept",
            F.greatest(
                F.lit(0),
                F.least(F.col("cb") + F.col("c"), F.col("n") - F.col("t"))
                - F.greatest(F.col("cb"), F.col("t")),
            ),
        )
    )
    return rows.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        (F.max("n") - 2 * F.max("t")).cast("long").alias("trimmed_n"),
        F.when(
            (F.max("n") - 2 * F.max("t")) > 0,
            F.round(
                F.sum(F.col("iv") * F.col("kept"))
                / (F.max("n") - 2 * F.max("t"))
                / _PCT_SCALE,
                4,
            ),
        ).alias("trimmed_mean"),
        F.round(F.sum(F.col("iv") * F.col("c")) / F.max("n") / _PCT_SCALE, 4)
        .alias("plain_mean"),
    )


def value_trimmed_mean(events: DataFrame, trim_pct: int = _TRIM_PCT) -> DataFrame:
    """Scan-path trimmed mean: build the value-frequency table from
    events, then the shared rank arithmetic."""
    from kinesis_dstream_spark.functions.exact import fixedpoint

    freq = (
        events.select(
            "event_type", fixedpoint(F.col("value"), _PCT_SCALE).alias("iv")
        )
        .groupBy("event_type", "iv")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return trimmed_mean_from_value_frequency(freq, trim_pct)


def value_trimmed_mean_sql(trim_pct: int = _TRIM_PCT) -> str:
    """DuckDB twin generated from the SAME trim_pct."""
    return f"""
WITH freq AS (
  SELECT event_type, CAST(round(value * {_PCT_SCALE}) AS BIGINT) AS iv,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), rows_t AS (
  SELECT event_type, iv, c,
         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n,
         coalesce(CAST(sum(c) OVER (PARTITION BY event_type ORDER BY iv
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
           AS cb
  FROM freq
), kept_t AS (
  SELECT event_type, iv, c, n, (n * {trim_pct}) // 100 AS t,
         greatest(0, least(cb + c, n - (n * {trim_pct}) // 100)
                     - greatest(cb, (n * {trim_pct}) // 100)) AS kept
  FROM rows_t
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n,
       CAST(max(n) - 2 * max(t) AS BIGINT) AS trimmed_n,
       CASE WHEN max(n) - 2 * max(t) > 0 THEN
         round(CAST(sum(iv * kept) AS BIGINT)
               / (max(n) - 2 * max(t)) / {_PCT_SCALE}, 4)
       END AS trimmed_mean,
       round(CAST(sum(iv * c) AS BIGINT) / max(n) / {_PCT_SCALE}, 4)
         AS plain_mean
FROM kept_t GROUP BY event_type
"""


VALUE_TRIMMED_MEAN_SQL = value_trimmed_mean_sql()


def tukey_outliers_from_value_frequency(freq: DataFrame) -> DataFrame:
    """Tukey boxplot-fence outlier accounting per event type from the
    (event_type, iv, count) value-frequency table — the SIXTH pure
    function of the percentile granules: exact nearest-rank q1/q3,
    IQR, the 1.5·IQR fences, and the row mass outside them. The
    boxplot fence is THE default outlier screen a data-quality
    dashboard shows; mad_outliers and the z-score family flag rows,
    this accounts masses (and so stays distinct-value-grain — no
    row-grain work at all when served from the store).

    Integer discipline: q1/q3 are cumulative-count crossings at
    ceil(n·p/100) (the shared nearest-rank formula); 1.5·IQR is
    (3·IQR) div 2 on the non-negative IQR — trunc == floor; fence
    comparisons and the outside-mass sums are exact int64. One final
    display division per quartile column.
    """
    from pyspark.sql import Window

    cum_w = (
        Window.partitionBy("event_type")
        .orderBy("iv")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = freq.select(
        "event_type",
        "iv",
        "c",
        F.sum("c").over(cum_w).alias("cum"),
        F.sum("c").over(Window.partitionBy("event_type")).alias("n"),
    )
    qs = cum.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.min(
            F.when(F.col("cum") >= F.expr("(n * 25 + 99) DIV 100"), F.col("iv"))
        ).alias("q1i"),
        F.min(
            F.when(F.col("cum") >= F.expr("(n * 75 + 99) DIV 100"), F.col("iv"))
        ).alias("q3i"),
    )
    fenced = qs.select(
        "event_type",
        "n",
        "q1i",
        "q3i",
        (F.col("q1i") - F.expr("(3 * (q3i - q1i)) div 2")).alias("lo_f"),
        (F.col("q3i") + F.expr("(3 * (q3i - q1i)) div 2")).alias("hi_f"),
    )
    joined = freq.join(F.broadcast(fenced), "event_type")
    return (
        joined.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.round(F.max("q1i") / _PCT_SCALE, 2).alias("q1"),
            F.round(F.max("q3i") / _PCT_SCALE, 2).alias("q3"),
            F.round((F.max("q3i") - F.max("q1i")) / _PCT_SCALE, 2).alias("iqr"),
            F.sum(F.when(F.col("iv") < F.col("lo_f"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_low"),
            F.sum(F.when(F.col("iv") > F.col("hi_f"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_high"),
        )
        .withColumn(
            "outlier_ppm",
            F.expr("CAST((n_low + n_high) * 1000000 div n AS BIGINT)"),
        )
    )


def value_tukey_outliers(events: DataFrame) -> DataFrame:
    """Scan-path Tukey fences: value-frequency table from events, then
    the shared rank arithmetic."""
    from kinesis_dstream_spark.functions.exact import fixedpoint

    freq = (
        events.select(
            "event_type", fixedpoint(F.col("value"), _PCT_SCALE).alias("iv")
        )
        .groupBy("event_type", "iv")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return tukey_outliers_from_value_frequency(freq)


VALUE_TUKEY_OUTLIERS_SQL = f"""
WITH freq AS (
  SELECT event_type, CAST(round(value * {_PCT_SCALE}) AS BIGINT) AS iv,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), cum AS (
  SELECT event_type, iv, c,
         CAST(sum(c) OVER (PARTITION BY event_type ORDER BY iv
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum,
         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM freq
), qs AS (
  SELECT event_type, max(n) AS n,
         min(CASE WHEN cum >= (n * 25 + 99) // 100 THEN iv END) AS q1i,
         min(CASE WHEN cum >= (n * 75 + 99) // 100 THEN iv END) AS q3i
  FROM cum GROUP BY event_type
), fenced AS (
  SELECT event_type, n, q1i, q3i,
         q1i - (3 * (q3i - q1i)) // 2 AS lo_f,
         q3i + (3 * (q3i - q1i)) // 2 AS hi_f
  FROM qs
)
SELECT f.event_type,
       CAST(max(fe.n) AS BIGINT) AS n,
       round(max(fe.q1i) / {_PCT_SCALE}, 2) AS q1,
       round(max(fe.q3i) / {_PCT_SCALE}, 2) AS q3,
       round((max(fe.q3i) - max(fe.q1i)) / {_PCT_SCALE}, 2) AS iqr,
       CAST(sum(CASE WHEN f.iv < fe.lo_f THEN f.c ELSE 0 END) AS BIGINT)
         AS n_low,
       CAST(sum(CASE WHEN f.iv > fe.hi_f THEN f.c ELSE 0 END) AS BIGINT)
         AS n_high,
       CAST((sum(CASE WHEN f.iv < fe.lo_f THEN f.c ELSE 0 END)
             + sum(CASE WHEN f.iv > fe.hi_f THEN f.c ELSE 0 END))
            * 1000000 // max(fe.n) AS BIGINT) AS outlier_ppm
FROM freq f JOIN fenced fe ON fe.event_type = f.event_type
GROUP BY f.event_type
"""


def wasserstein_from_value_frequency(counts: DataFrame) -> DataFrame:
    """Exact 1-D Wasserstein-1 (earth-mover) distance between each
    event type's ``value`` distribution and the pooled rest, from the
    (event_type, iv, c) value-frequency table — the SEVENTH pure
    function of the percentile granules. KS reports the single worst
    CDF gap; W1 integrates ALL of it — ``W1 = ∫|F_t − F_rest| dx`` —
    so a broad small shift (which KS under-reads) and a narrow spike
    (which KS over-reads) are priced by the mass actually moved, in
    value units. It is the drift number with a cost interpretation:
    "how far, on average, must a unit of probability mass travel".

    Exactness discipline: on the fixed-point grid the integral is the
    finite sum Σ_i |cum_t·n_rest − cum_rest·n_t| · (iv_{i+1} − iv_i)
    over consecutive grid points (the CDFs are step functions — the
    closed form is exact, not a quadrature). The cross-multiplied gap
    |cum_t·n_rest − cum_rest·n_t| is int64 (bound n_t·n_rest ≤
    (n/2)² → safe to ~6·10⁹ rows), but the gap-weighted SUM can pass
    9.2·10¹⁸, so each term is cast to decimal(38,0) (HUGEINT in the
    oracle) BEFORE the multiply-by-gap and the Σ — order-independent
    integer aggregation, no float accumulation anywhere. The one
    float appears at display: both engines cast the identical exact
    integer to double (IEEE nearest — same bits) and run the same
    division chain, then round(…, 6).

    Plan (identical shape to ``ks_from_value_frequency``): grid cum +
    lead-gap on a partition-less grid-bounded window, broadcast
    |types|-row totals, one per-type cumulative window over
    |grid|·|types| rows. No row-grain work at all when served from
    the granule store. Degenerate n_rest = 0 emits NULL explicitly in
    both engines (the r9 ANSI divide rule).
    """
    from pyspark.sql import Window

    grid = counts.groupBy("iv").agg(F.sum("c").alias("c_all"))
    cum_all_w = Window.orderBy("iv").rowsBetween(Window.unboundedPreceding, 0)
    grid_cum = grid.select(
        "iv",
        F.sum("c_all").over(cum_all_w).alias("cum_all"),
        (F.lead("iv").over(Window.orderBy("iv")) - F.col("iv")).alias("gap"),
    )
    totals = counts.groupBy("event_type").agg(F.sum("c").alias("n_t"))
    grand = totals.agg(F.sum("n_t").alias("n"))
    pairs = grid_cum.crossJoin(F.broadcast(totals.crossJoin(grand)))
    cum_t_w = (
        Window.partitionBy("event_type")
        .orderBy("iv")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    joined = (
        pairs.join(counts, ["event_type", "iv"], "left")
        .select(
            "event_type",
            "iv",
            "cum_all",
            "gap",
            "n_t",
            "n",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
        .withColumn("cum_t", F.sum("c").over(cum_t_w))
    )
    diff = F.abs(
        F.col("cum_t") * (F.col("n") - F.col("n_t"))
        - (F.col("cum_all") - F.col("cum_t")) * F.col("n_t")
    )
    term = F.when(F.col("gap").isNotNull(), diff).otherwise(F.lit(0)).cast(
        "decimal(38,0)"
    ) * F.coalesce(F.col("gap"), F.lit(0)).cast("decimal(38,0)")
    return (
        joined.select("event_type", "n_t", "n", term.alias("t"))
        .groupBy("event_type")
        .agg(
            F.max("n_t").cast("long").alias("n_type"),
            (F.max("n") - F.max("n_t")).cast("long").alias("n_rest"),
            F.sum("t").alias("w1_sum"),
        )
        .select(
            "event_type",
            "n_type",
            "n_rest",
            F.when(
                F.col("n_rest") > 0,
                F.round(
                    F.col("w1_sum").cast("double")
                    / F.col("n_type")
                    / F.col("n_rest")
                    / _PCT_SCALE,
                    6,
                ),
            ).alias("w1_value_units"),
        )
    )


def value_wasserstein_drift(events: DataFrame) -> DataFrame:
    """Scan-path Wasserstein drift: build the value-frequency table
    from events, then the shared grid integral."""
    from kinesis_dstream_spark.functions.exact import fixedpoint

    base = events.select(
        "event_type", fixedpoint(F.col("value"), _PCT_SCALE).alias("iv")
    )
    counts = base.groupBy("event_type", "iv").agg(F.count(F.lit(1)).alias("c"))
    return wasserstein_from_value_frequency(counts)


VALUE_WASSERSTEIN_SQL = f"""
WITH base AS (
  SELECT event_type, CAST(round(value * {_PCT_SCALE}) AS BIGINT) AS iv
  FROM events
), counts AS (
  SELECT event_type, iv, count(*) AS c FROM base GROUP BY event_type, iv
), grid AS (
  SELECT iv, sum(c) AS c_all FROM counts GROUP BY iv
), grid_cum AS (
  SELECT iv, sum(c_all) OVER (ORDER BY iv) AS cum_all,
         lead(iv) OVER (ORDER BY iv) - iv AS gap
  FROM grid
), totals AS (
  SELECT event_type, CAST(sum(c) AS BIGINT) AS n_t FROM counts
  GROUP BY event_type
), grand AS (SELECT CAST(sum(n_t) AS BIGINT) AS n FROM totals),
joined AS (
  SELECT t.event_type, g.iv, g.cum_all, g.gap, t.n_t, gr.n,
         coalesce(c.c, 0) AS c
  FROM grid_cum g CROSS JOIN totals t CROSS JOIN grand gr
  LEFT JOIN counts c ON c.event_type = t.event_type AND c.iv = g.iv
), cum AS (
  SELECT event_type, n_t, n, cum_all, gap,
         sum(c) OVER (PARTITION BY event_type ORDER BY iv) AS cum_t
  FROM joined
), terms AS (
  SELECT event_type, n_t, n,
         CAST(CASE WHEN gap IS NOT NULL THEN
                CAST(abs(cum_t * (n - n_t) - (cum_all - cum_t) * n_t)
                     AS BIGINT)
              ELSE 0 END AS HUGEINT)
           * CAST(coalesce(gap, 0) AS HUGEINT) AS t
  FROM cum
)
SELECT event_type,
       CAST(max(n_t) AS BIGINT) AS n_type,
       CAST(max(n) - max(n_t) AS BIGINT) AS n_rest,
       CASE WHEN max(n) - max(n_t) > 0 THEN
         round(CAST(sum(t) AS DOUBLE)
               / CAST(max(n_t) AS BIGINT)
               / (max(n) - max(n_t))
               / {_PCT_SCALE}, 6)
       END AS w1_value_units
FROM terms GROUP BY event_type
"""


_THEIL_SCALE = 1_000_000  # µ-units for the per-value ln terms


def theil_from_value_frequency(counts: DataFrame) -> DataFrame:
    """Theil-T inequality decomposition of ``value`` mass by event
    type, from the (event_type, iv, c) value-frequency table — the
    EIGHTH pure function of the percentile granules. Theil is the
    inequality index that DECOMPOSES exactly: total T = Σ_g s_g·T_g
    (within) + Σ_g s_g·ln(μ_g/μ) (between), so a dashboard can say
    how much of the value concentration lives inside types vs between
    them — the drill-down Gini cannot do (Gini does not decompose
    additively).

    Per type this reports n, the exact value-mass share (ppm grid),
    within-type Theil T_g = Σ_v (c·iv/X_g)·ln(iv·N_g/X_g), and the
    between-group term s_g·ln(μ_g/μ). Determinism: counts/masses are
    exact int64; each distinct value's ln factor is µ-unit
    fixed-pointed BEFORE the Σ (the PSI discipline) and the gap-free
    weighted sum Σ (c·iv)·lnterm runs in decimal(38,0)/HUGEINT (the
    W1 discipline — c·iv·lnterm can pass int64); single double
    divisions at display. Requires strictly positive values (checked
    upstream by the fixture's domain; zero/negative value mass makes
    every log-based inequality index undefined).

    Plan: grid-grain everything — one (type, iv) aggregate feeds a
    broadcast totals join; no row-grain work at all when served from
    the granule store.
    """
    g = counts.groupBy("event_type").agg(
        F.sum("c").alias("n_g"),
        F.sum(F.col("c") * F.col("iv")).alias("x_g"),
    )
    tot = g.agg(F.sum("n_g").alias("n"), F.sum("x_g").alias("x"))
    joined = counts.join(F.broadcast(g), "event_type").crossJoin(
        F.broadcast(tot)
    )
    lnterm = F.round(
        F.log(F.col("iv").cast("double") * F.col("n_g") / F.col("x_g"))
        * _THEIL_SCALE
    ).cast("long")
    # iv = 0 rows (values that round to zero mass) contribute exactly
    # 0 to the weighted log sum — lim x→0 x·ln(x) = 0 — and ln(0)
    # errors under both engines' range rules, so they are excluded
    # HERE (their c still counts in n_g: they are real observations
    # of ~zero value, and the mass weights already ignore them)
    num = (
        joined.filter(F.col("iv") > 0)
        .select(
            "event_type",
            (
                (F.col("c") * F.col("iv")).cast("decimal(38,0)")
                * lnterm.cast("decimal(38,0)")
            ).alias("t"),
        )
        .groupBy("event_type")
        .agg(F.sum("t").alias("num"))
    )
    out = g.crossJoin(F.broadcast(tot)).join(num, "event_type")
    share = F.col("x_g") / F.col("x")
    between = share * F.log(
        F.col("x_g").cast("double")
        * F.col("n")
        / (F.col("x").cast("double") * F.col("n_g"))
    )
    return out.select(
        "event_type",
        F.col("n_g").cast("long").alias("n"),
        # x_g = Σc·iv can pass ~9.2e12 on large corpora, where the
        # ×1e6 product overflows int64 (Spark wraps silently, DuckDB
        # raises — inconsistent failure modes); route the product
        # through decimal(38,0) ↔ HUGEINT like the W1 sibling
        F.expr("cast(x_g as decimal(38,0)) * 1000000 div x")
        .cast("long")
        .alias("share_ppm"),
        F.round(
            F.col("num").cast("double") / F.col("x_g") / _THEIL_SCALE, 6
        ).alias("theil_within"),
        F.round(between, 6).alias("between_term"),
    )


def value_theil_decomposition(events: DataFrame) -> DataFrame:
    """Scan-path Theil decomposition: value-frequency table from
    events, then the shared grid arithmetic."""
    from kinesis_dstream_spark.functions.exact import fixedpoint

    base = events.select(
        "event_type", fixedpoint(F.col("value"), _PCT_SCALE).alias("iv")
    )
    counts = base.groupBy("event_type", "iv").agg(F.count(F.lit(1)).alias("c"))
    return theil_from_value_frequency(counts)


VALUE_THEIL_SQL = f"""
WITH freq AS (
  SELECT event_type, CAST(round(value * {_PCT_SCALE}) AS BIGINT) AS iv,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), g AS (
  SELECT event_type, CAST(sum(c) AS BIGINT) AS n_g,
         CAST(sum(c * iv) AS BIGINT) AS x_g
  FROM freq GROUP BY event_type
), tot AS (
  SELECT CAST(sum(n_g) AS BIGINT) AS n, CAST(sum(x_g) AS BIGINT) AS x FROM g
), num AS (
  SELECT f.event_type,
         sum(CAST(f.c * f.iv AS HUGEINT)
             * CAST(CAST(round(ln(CAST(f.iv AS DOUBLE) * g.n_g / g.x_g)
                                * {_THEIL_SCALE}) AS BIGINT) AS HUGEINT)) AS num
  FROM freq f JOIN g ON g.event_type = f.event_type
  WHERE f.iv > 0
  GROUP BY f.event_type
)
SELECT g.event_type,
       g.n_g AS n,
       CAST(CAST(g.x_g AS HUGEINT) * 1000000 // t.x AS BIGINT) AS share_ppm,
       round(CAST(num.num AS DOUBLE) / g.x_g / {_THEIL_SCALE}, 6)
         AS theil_within,
       round((g.x_g / t.x)
             * ln(CAST(g.x_g AS DOUBLE) * t.n
                  / (CAST(t.x AS DOUBLE) * g.n_g)), 6) AS between_term
FROM g JOIN num ON num.event_type = g.event_type CROSS JOIN tot t
"""


def value_wasserstein_temporal(events: DataFrame) -> DataFrame:
    """Wasserstein-1 distance between each event type's EARLY-half and
    LATE-half value distributions (midpoint-day split — the
    ``value_psi_temporal`` convention): the temporal companion to the
    type-vs-rest W1, so the drift dashboard reads PSI (binned,
    log-scored) and W1 (exact mass-transport) over the SAME split and
    disagreements are attributable to the statistic, not the slicing.

    Same exactness discipline as ``wasserstein_from_value_frequency``:
    cross-multiplied CDF gaps in int64, decimal(38,0)/HUGEINT
    gap-weighted sums, one int→double display division. Types with an
    empty side emit NULL explicitly.

    Plan: ONE row-grain shuffle (the (type, side, iv) count carrying
    both side counts in one aggregate); the grid windows and totals
    joins are grid-bounded.
    """
    from pyspark.sql import Window

    from kinesis_dstream_spark.functions.exact import fixedpoint

    base = events.select(
        "event_type",
        F.to_date("ts").alias("day"),
        fixedpoint(F.col("value"), _PCT_SCALE).alias("iv"),
    )
    bounds = base.agg(
        F.min("day").alias("min_day"), F.max("day").alias("max_day")
    ).select(
        F.expr("date_add(min_day, CAST(datediff(max_day, min_day) DIV 2 AS INT))")
        .alias("mid_day")
    )
    counts = (
        base.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            "iv",
            (F.col("day") <= F.col("mid_day")).cast("long").alias("is_base"),
        )
        .groupBy("event_type", "iv")
        .agg(
            F.sum("is_base").alias("c1"),
            F.sum(1 - F.col("is_base")).alias("c2"),
        )
    )
    totals = counts.groupBy("event_type").agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    grid_w = Window.partitionBy("event_type").orderBy("iv")
    cum_w = grid_w.rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        "event_type",
        "iv",
        F.sum("c1").over(cum_w).alias("cum1"),
        F.sum("c2").over(cum_w).alias("cum2"),
        (F.lead("iv").over(grid_w) - F.col("iv")).alias("gap"),
    )
    diff = F.abs(
        F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1")
    )
    term = F.when(F.col("gap").isNotNull(), diff).otherwise(F.lit(0)).cast(
        "decimal(38,0)"
    ) * F.coalesce(F.col("gap"), F.lit(0)).cast("decimal(38,0)")
    return (
        cum.join(F.broadcast(totals), "event_type")
        .select("event_type", "n1", "n2", term.alias("t"))
        .groupBy("event_type")
        .agg(
            F.max("n1").cast("long").alias("n_early"),
            F.max("n2").cast("long").alias("n_late"),
            F.sum("t").alias("w1_sum"),
        )
        .select(
            "event_type",
            "n_early",
            "n_late",
            F.when(
                (F.col("n_early") > 0) & (F.col("n_late") > 0),
                F.round(
                    F.col("w1_sum").cast("double")
                    / F.col("n_early")
                    / F.col("n_late")
                    / _PCT_SCALE,
                    6,
                ),
            ).alias("w1_value_units"),
        )
    )


VALUE_WASSERSTEIN_TEMPORAL_SQL = f"""
WITH base AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(round(value * {_PCT_SCALE}) AS BIGINT) AS iv
  FROM events
), bounds AS (
  SELECT min(day) + CAST((max(day) - min(day)) // 2 AS INTEGER) AS mid_day
  FROM base
), counts AS (
  SELECT event_type, iv,
         CAST(sum(CASE WHEN day <= (SELECT mid_day FROM bounds)
                  THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(sum(CASE WHEN day <= (SELECT mid_day FROM bounds)
                  THEN 0 ELSE 1 END) AS BIGINT) AS c2
  FROM base GROUP BY event_type, iv
), totals AS (
  SELECT event_type, CAST(sum(c1) AS BIGINT) AS n1,
         CAST(sum(c2) AS BIGINT) AS n2
  FROM counts GROUP BY event_type
), cum AS (
  SELECT event_type, iv,
         CAST(sum(c1) OVER (PARTITION BY event_type ORDER BY iv) AS BIGINT)
           AS cum1,
         CAST(sum(c2) OVER (PARTITION BY event_type ORDER BY iv) AS BIGINT)
           AS cum2,
         lead(iv) OVER (PARTITION BY event_type ORDER BY iv) - iv AS gap
  FROM counts
), terms AS (
  SELECT c.event_type, t.n1, t.n2,
         CAST(CASE WHEN c.gap IS NOT NULL THEN
                CAST(abs(c.cum1 * t.n2 - c.cum2 * t.n1) AS BIGINT)
              ELSE 0 END AS HUGEINT)
           * CAST(coalesce(c.gap, 0) AS HUGEINT) AS t
  FROM cum c JOIN totals t ON t.event_type = c.event_type
)
SELECT event_type,
       CAST(max(n1) AS BIGINT) AS n_early,
       CAST(max(n2) AS BIGINT) AS n_late,
       CASE WHEN max(n1) > 0 AND max(n2) > 0 THEN
         round(CAST(sum(t) AS DOUBLE) / max(n1) / max(n2) / {_PCT_SCALE}, 6)
       END AS w1_value_units
FROM terms GROUP BY event_type
"""


def source_lang_entropy(documents: DataFrame) -> DataFrame:
    """Shannon entropy of each source's language mix — the diversity
    probe a multilingual-corpus curator reads next to the mixture
    quotas: entropy 0 means a monolingual source (fine for targeted
    mixes, a red flag for a "web" source), ln(k) means a uniform
    k-language blend. Reported with the majority language and its ppm
    share so the table reads at a glance.

    Determinism: counts exact; each language's −p·ln(p) term is
    µ-unit fixed-pointed via the count form c·ln(n/c) (positive, so
    no sign juggling) and summed as int64 — the PSI discipline; one
    display division. Majority ties break on language code.

    Plan: one (source, lang) count, then |sources|·|langs|-bounded
    arithmetic — broadcast class throughout.
    """
    counts = documents.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot_w = Window.partitionBy("source")
    rows = counts.withColumn("n", F.sum("c").over(tot_w))
    term = F.round(
        F.col("c")
        * F.log(F.col("n").cast("double") / F.col("c"))
        * _THEIL_SCALE
    ).cast("long")
    top_w = Window.partitionBy("source").orderBy(
        F.col("c").desc(), F.col("lang").asc()
    )
    flagged = rows.withColumn("t", term).withColumn(
        "rk", F.row_number().over(top_w)
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.max("n").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_langs"),
            F.round(
                F.sum("t") / F.max("n") / _THEIL_SCALE, 6
            ).alias("lang_entropy"),
            F.max(F.when(F.col("rk") == 1, F.col("lang"))).alias(
                "majority_lang"
            ),
            F.max(
                F.when(F.col("rk") == 1, F.expr("c * 1000000 div n"))
            )
            .cast("long")
            .alias("majority_ppm"),
        )
    )


SOURCE_LANG_ENTROPY_SQL = f"""
WITH counts AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY source, lang
), rows_t AS (
  SELECT source, lang, c,
         CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS n,
         row_number() OVER (PARTITION BY source ORDER BY c DESC, lang ASC)
           AS rk
  FROM counts
)
SELECT source,
       CAST(max(n) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_langs,
       round(sum(CAST(round(c * ln(CAST(n AS DOUBLE) / c) * {_THEIL_SCALE})
                      AS BIGINT)) / max(n) / {_THEIL_SCALE}, 6)
         AS lang_entropy,
       max(CASE WHEN rk = 1 THEN lang END) AS majority_lang,
       CAST(max(CASE WHEN rk = 1 THEN c * 1000000 // n END) AS BIGINT)
         AS majority_ppm
FROM rows_t GROUP BY source
"""
