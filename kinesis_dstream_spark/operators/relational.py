"""Batch relational core (SURVEY §2B E-1..E-8).

The reference has no local relational executor (SURVEY §2A "explicit
absences") — joins, aggregation, window functions, sorts, and set ops all
come from Spark built-ins here, expressed declaratively so Catalyst gets
join reordering, predicate pushdown, column pruning, and partial
aggregation for free.

Scale notes (100 TB):
- Dimension tables (region/nation/supplier/part at TPC-H proportions) are
  broadcast explicitly — no shuffle of the fact table for those joins.
- Fact-fact joins (orders ⋈ lineitem) shuffle on the join key once; AQE
  handles skew splitting.
- Every aggregate is a plain hash aggregate with map-side partial
  aggregation; no distinct-on-top-of-sort patterns.
- Top-k uses TakeOrderedAndProject (local top-k per partition, k rows to
  the final stage) — never a global sort of the full input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kinesis_dstream_spark.functions.exact import exact_avg, exact_sum


def q1_pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 shape: wide scan-side aggregate with derived expressions.

    Pure map-side arithmetic + one hash aggregate; the shipdate filter is
    pushed to the parquet scan.
    """
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # fixed-point sums/avgs: order-independent, bit-identical to
            # the DuckDB oracle (see functions/exact.py)
            exact_sum(F.col("l_quantity")).alias("sum_qty"),
            exact_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            exact_sum(disc_price).alias("sum_disc_price"),
            exact_sum(charge).alias("sum_charge"),
            exact_avg(F.col("l_quantity")).alias("avg_qty"),
            exact_avg(F.col("l_extendedprice")).alias("avg_price"),
            exact_avg(F.col("l_discount"), scale=1_000_000, dp=6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q3_shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    date: str = "1995-03-15",
) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join → agg → top-k.

    ``customer`` (filtered to one segment) is broadcast; orders⋈lineitem
    shuffles on the orderkey once. Top-10 is an ordered limit, not a
    global sort.
    """
    cut = F.lit(date).cast("timestamp")
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        orders.filter(F.col("o_orderdate") < cut)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            lineitem.filter(F.col("l_shipdate") > cut),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(exact_sum(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
    )


def q5_local_supplier_volume(
    tables: dict[str, DataFrame],
    region_name: str = "EUROPE",
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5 shape: 6-way join through the dimension snowflake.

    region→nation is a tiny broadcast chain; the fact-side joins
    (orders⋈lineitem⋈supplier⋈customer) keep the fact table on the build
    side of broadcasts wherever a dim fits, and the nation-match predicate
    (customer and supplier in the same nation) is an ordinary equi-join
    condition — no cross product.
    """
    t = tables
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nations = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    return (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= F.lit(date_lo).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(date_hi).cast("timestamp"))
        )
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            t["customer"],
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(exact_sum(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


def customers_without_orders(
    customer: DataFrame,
    orders: DataFrame,
    date_lo: str = "1995-01-01",
    date_hi: str = "1995-07-01",
) -> DataFrame:
    """Anti join (E-3): customers with no order in a date window.

    The window filter keeps the anti join non-degenerate (every fixture
    customer has *some* order) and pushes down to the orders scan.
    """
    in_window = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_lo).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_hi).cast("timestamp"))
    )
    return (
        customer.join(in_window, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_nationkey")
    )


def customers_with_high_value_orders(
    customer: DataFrame, orders: DataFrame, min_total: float = 400000.0
) -> DataFrame:
    """Semi join (E-3): customers with ≥1 order above a total threshold."""
    big = orders.filter(F.col("o_totalprice") > min_total)
    return (
        customer.join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"))
    )


def outer_join_order_counts(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left outer join + agg (E-3/E-4): order count per customer incl. zeros."""
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(
                F.coalesce(F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")), F.lit(0))
                / 100.0,
                2,
            ).alias("total_spent"),
        )
    )


def rollup_sales(lineitem: DataFrame) -> DataFrame:
    """Grouping-sets aggregate (E-4): ROLLUP over (returnflag, linestatus).

    Spark expands grouping sets before the single hash aggregate — still
    one shuffle. ``grouping_id`` disambiguates subtotal rows from real
    NULL keys.
    """
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            exact_sum(F.col("l_extendedprice")).alias("sum_price"),
            F.grouping_id().alias("gid"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "sum_price",
            "gid",
        )
    )


def distinct_agg_stats(orders: DataFrame) -> DataFrame:
    """Distinct aggregation (E-4): exact count-distinct per group."""
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_distinct_cust"),
            F.count("*").alias("n_orders"),
            exact_avg(F.col("o_totalprice"), dp=2).alias("avg_total"),
        )
    )


def approx_distinct_users(events: DataFrame, rsd: float = 0.02) -> DataFrame:
    """Sketch aggregate (E-4): HyperLogLog++ approximate count-distinct.

    The 100 TB path for cardinality: mergeable constant-memory sketches
    instead of an exact distinct shuffle. No SQL oracle (sketch estimates
    are engine-specific); the pytest suite bounds the relative error
    against the exact count instead.
    """
    return (
        events.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd).alias("approx_users"))
        .orderBy("event_type")
    )


def window_rank_parts(part: DataFrame, k: int = 3) -> DataFrame:
    """Ranking window functions (E-5/E-6): top-k per group via dense_rank.

    The per-group top-k idiom: one shuffle on the partition key, ranks
    computed per partition, filter keeps k rows per group. No global sort.
    """
    # dense_rank depends only on the price values (equal prices share a
    # rank), so the output SET is deterministic without a tie-break column.
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    return (
        part.withColumn("price_rank", F.dense_rank().over(w))
        .filter(F.col("price_rank") <= k)
        .select("p_brand", "p_partkey", "p_name",
                F.round("p_retailprice", 2).alias("retailprice"), "price_rank")
    )


def window_running_totals(orders: DataFrame) -> DataFrame:
    """Analytic window functions (E-5): lag + running sum per customer."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(cents).over(running) / 100.0, 2).alias("running_total"),
        F.round(
            F.col("o_totalprice") - F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0)),
            2,
        ).alias("delta_prev"),
    )


def global_topk_orders(orders: DataFrame, k: int = 25) -> DataFrame:
    """Global top-k (E-6): ordered limit → TakeOrderedAndProject."""
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(k)
        .select("o_orderkey", "o_custkey",
                F.round("o_totalprice", 2).alias("totalprice"), "o_orderstatus")
    )


def set_ops_customers(orders: DataFrame) -> DataFrame:
    """Set operations (E-7): intersect / except / union on key sets.

    Customers who ordered in both halves of 2024 (intersect), only in H1
    (except), tagged and unioned into one result.
    """
    mid = F.lit("1998-01-01").cast("timestamp")
    h1 = orders.filter(F.col("o_orderdate") < mid).select("o_custkey").distinct()
    h2 = orders.filter(F.col("o_orderdate") >= mid).select("o_custkey").distinct()
    both = h1.intersect(h2).withColumn("cohort", F.lit("both_halves"))
    h1_only = h1.exceptAll(h2).withColumn("cohort", F.lit("h1_only"))
    return both.unionByName(h1_only).select("o_custkey", "cohort")


def scalar_functions_showcase(part: DataFrame) -> DataFrame:
    """Scalar function library (E-8): string/math/conditional expressions.

    Everything stays inside whole-stage codegen — zero Python in the row
    path.
    """
    return part.select(
        "p_partkey",
        F.lower(F.col("p_name")).alias("name_lower"),
        F.length(F.col("p_name")).alias("name_len"),
        F.regexp_extract(F.col("p_type"), r"^(\w+)", 1).alias("type_head"),
        F.substring(F.col("p_brand"), 1, 5).alias("brand_prefix"),
        F.round(F.sqrt(F.abs(F.col("p_retailprice"))), 4).alias("price_sqrt"),
        F.when(F.col("p_size") >= 25, "large")
        .when(F.col("p_size") >= 10, "medium")
        .otherwise("small")
        .alias("size_class"),
        (F.col("p_partkey") % 16).cast("int").alias("bucket"),
    )


def date_functions_showcase(orders: DataFrame) -> DataFrame:
    """Date/time function library (E-8) + aggregation by derived keys."""
    return (
        orders.select(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
            F.dayofweek("o_orderdate").alias("dow"),
            "o_totalprice",
        )
        .groupBy("yr", "mo", "dow")
        .agg(F.count("*").alias("n"), exact_sum(F.col("o_totalprice")).alias("total"))
    )


def asof_join_prev_order(orders: DataFrame, horizon_days: int = 90) -> DataFrame:
    """As-of join (E-3): each order matched to the customer's previous
    order within a bounded horizon.

    As-of joins aren't a Spark built-in; the scalable composition is a
    *bounded* range join + per-left-row argmax. The horizon bound is what
    makes it scale: it turns an unbounded inequality join (quadratic blow-
    up) into a band join AQE can handle, and is the same trick a
    range-bucketed implementation would formalize. Informed by the
    distributed range/top-k join literature (PAPERS.md).

    The argmax is a lexicographic struct-MAX aggregate, not a
    row_number window (r7): the hash aggregate combines map-side, so
    the exchange carries one row per order rather than the full
    band-join fan-out (up to horizon_days matches per order) feeding a
    per-key sort — the part of the plan that grows with match density.
    """
    prev = orders.select(
        F.col("o_custkey").alias("p_custkey"),
        F.col("o_orderkey").alias("p_orderkey"),
        F.col("o_orderdate").alias("p_orderdate"),
    )
    lo = F.col("o_orderdate") - F.expr(f"INTERVAL {horizon_days} DAYS")
    joined = orders.join(
        prev,
        (F.col("o_custkey") == F.col("p_custkey"))
        & (F.col("p_orderdate") <= F.col("o_orderdate"))
        & (F.col("p_orderdate") >= lo)
        & (F.col("p_orderkey") != F.col("o_orderkey")),
    )
    return (
        joined.groupBy("o_orderkey", "o_custkey", "o_orderdate")
        .agg(F.max(F.struct("p_orderdate", "p_orderkey")).alias("m"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("m.p_orderkey").alias("prev_orderkey"),
            F.date_format("m.p_orderdate", "yyyy-MM-dd").alias("prev_orderdate"),
            F.datediff(F.col("o_orderdate"), F.col("m.p_orderdate")).alias(
                "days_since_prev"
            ),
        )
    )


def asof_join_events(
    events: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
    direction: str = "backward",
    tolerance_minutes: int = 120,
) -> DataFrame:
    """Generalized event-stream as-of join: for each ``left_type`` event,
    the same user's nearest ``right_type`` event, looking ``backward``
    (most recent at-or-before) or ``forward`` (earliest at-or-after),
    within a tolerance window — pandas ``merge_asof`` semantics on a
    distributed table.

    Same scalable shape as ``asof_join_prev_order``: the tolerance bound
    turns the inequality join into a BAND equi-join on user_id (the
    quadratic-blowup guard), then one per-left-row window argmin picks
    the nearest. "Nearest within tolerance" == "nearest overall, kept if
    within tolerance" (anything nearer than the nearest doesn't exist),
    which is exactly DuckDB's native ASOF JOIN + tolerance filter — the
    oracle cross-validates our composition against a real ASOF
    implementation.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join_events: bad direction {direction!r}")
    left = events.filter(F.col("event_type") == left_type).select(
        F.col("event_id").alias("l_id"),
        F.col("user_id").alias("l_user"),
        F.col("ts").alias("l_ts"),
    )
    right = events.filter(F.col("event_type") == right_type).select(
        F.col("user_id").alias("r_user"),
        F.col("event_id").alias("r_id"),
        F.col("ts").alias("r_ts"),
    )
    tol = F.expr(f"INTERVAL {tolerance_minutes} MINUTES")
    if direction == "backward":
        band = (F.col("r_ts") <= F.col("l_ts")) & (F.col("r_ts") >= F.col("l_ts") - tol)
        order = [F.col("r_ts").desc(), F.col("r_id").asc()]
    else:
        band = (F.col("r_ts") >= F.col("l_ts")) & (F.col("r_ts") <= F.col("l_ts") + tol)
        order = [F.col("r_ts").asc(), F.col("r_id").asc()]
    joined = left.join(right, (F.col("l_user") == F.col("r_user")) & band)
    w = Window.partitionBy("l_id").orderBy(*order)
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("l_id").alias("event_id"),
            F.col("l_user").alias("user_id"),
            F.col("r_id").alias("matched_event_id"),
            # ts is TIMESTAMP_NTZ; unix_micros needs TimestampType and the
            # session tz is pinned UTC, so the cast is a reinterpretation
            (
                F.unix_micros(F.col("l_ts").cast("timestamp"))
                - F.unix_micros(F.col("r_ts").cast("timestamp"))
            ).alias("gap_micros"),
        )
    )


def range_join_value_bands(spark, events: DataFrame) -> DataFrame:
    """Non-equi (range) join (E-3): bucket events into value bands.

    The band table is tiny and broadcast; the range condition runs as a
    BroadcastNestedLoopJoin over 4 band rows — constant extra cost per
    event row, scales linearly.
    """
    bands = spark.createDataFrame(
        [(0.0, 25.0, "low"), (25.0, 75.0, "mid"), (75.0, 200.0, "high"),
         (200.0, float("inf"), "extreme")],
        "band_lo double, band_hi double, band string",
    )
    return (
        events.join(
            F.broadcast(bands),
            (F.col("value") >= F.col("band_lo")) & (F.col("value") < F.col("band_hi")),
        )
        .groupBy("band")
        .agg(F.count("*").alias("n_events"), exact_avg(F.col("value"), scale=10_000).alias("avg_value"))
    )


def q2_min_cost_supplier(tables: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q2 shape: correlated 'argmin per group' via self-aggregation.

    The correlated subquery (min acctbal supplier per nation) decorrelates
    into a broadcast-joined aggregate — the standard Catalyst-friendly
    rewrite of WHERE x = (SELECT min ...).
    """
    t = tables
    best = (
        t["supplier"]
        .groupBy(F.col("s_nationkey").alias("b_nationkey"))
        .agg(F.min("s_acctbal").alias("min_bal"))
    )
    return (
        t["supplier"]
        .join(
            F.broadcast(best),
            (F.col("s_nationkey") == F.col("b_nationkey"))
            & (F.col("s_acctbal") == F.col("min_bal")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            "s_suppkey",
            "s_name",
            F.round("s_acctbal", 2).alias("acctbal"),
        )
    )


def q4_order_priority(orders: DataFrame, lineitem: DataFrame,
                      date_lo: str = "1996-07-01", date_hi: str = "1996-10-01") -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi join + count by priority.

    (The fixture lacks l_commitdate/l_receiptdate, so the EXISTS predicate
    is simply 'has any lineitem' — the join/agg shape is what matters.)
    """
    li = lineitem.select("l_orderkey").distinct()
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit(date_lo).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(date_hi).cast("timestamp"))
        )
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def q6_revenue_forecast(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q6: highly-selective scan-side filter + single agg."""
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            exact_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


def q12_shipmode_priority(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q12 shape: join + conditional (CASE) aggregation."""
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


def q14_promo_effect(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14 shape: conditional revenue share. The ratio of two
    fixed-point sums stays bit-deterministic."""
    promo = F.col("p_type").startswith("PROMO")
    revenue_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.sum(F.when(promo, revenue_cents).otherwise(0))
                * 100.0
                / F.sum(revenue_cents),
                6,
            ).alias("promo_revenue_pct"),
            F.count("*").alias("n_rows"),
        )
    )


def q18_large_volume_customers(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, min_qty: float = 212.0
) -> DataFrame:
    """TPC-H Q18: HAVING-filtered agg joined back to dims.

    The heavy side (lineitem groupBy orderkey) reduces before any join;
    dims join onto the small filtered aggregate.
    """
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(exact_sum(F.col("l_quantity"), dp=2).alias("total_qty"))
        .filter(F.col("total_qty") > min_qty)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
    )


def window_ntile_frames(orders: DataFrame) -> DataFrame:
    """Window functions part 2 (E-5): ntile, first/last over explicit
    ROWS frames, and a bounded moving average."""
    w = Window.partitionBy("o_orderpriority").orderBy("o_orderdate", "o_orderkey")
    frame3 = w.rowsBetween(-2, Window.currentRow)
    whole = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.first("o_orderkey").over(whole).alias("first_key"),
        F.last("o_orderkey").over(whole).alias("last_key"),
        F.round(F.sum(cents).over(frame3) / F.count(F.lit(1)).over(frame3) / 100.0, 4)
        .alias("moving_avg3"),
    )


def cube_sales(lineitem: DataFrame) -> DataFrame:
    """CUBE grouping sets (E-4) — all 4 subtotal combinations."""
    return (
        lineitem.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            exact_sum(F.col("l_quantity")).alias("sum_qty"),
            F.grouping_id().alias("gid"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "sum_qty",
            "gid",
        )
    )


def array_map_json_showcase(events: DataFrame) -> DataFrame:
    """Collection & JSON function library (E-8 part 2): from_json with an
    explicit schema, map access, array construct/contains/transform."""
    parsed = F.from_json(F.col("props"), "k INT")
    arr = F.array(F.col("user_id"), F.col("event_id") % 100)
    return events.select(
        "event_id",
        parsed.getField("k").alias("k"),
        F.map_from_arrays(F.array(F.lit("type")), F.array(F.col("event_type")))
        .getItem("type")
        .alias("type_from_map"),
        F.array_contains(arr, F.lit(50).cast("long")).alias("has_50"),
        F.aggregate(
            F.transform(arr, lambda x: x * 2),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("arr_sum2x"),
        F.size(F.split(F.col("props"), ":")).alias("props_parts"),
    )


def percentile_stats(events: DataFrame) -> DataFrame:
    """Exact percentiles per group (E-4): p25/p50/p90 of ``value``.

    ``F.percentile`` is Spark's exact linear-interpolation percentile —
    a full sort-based aggregate per group. At 100 TB swap to
    ``approx_percentile`` (t-digest sketch, mergeable map-side) — the
    sketch variant is asserted against these exact values in pytest
    rather than oracle-hashed, since its error is probabilistic.
    """
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.percentile("value", 0.25), 6).alias("p25"),
            F.round(F.percentile("value", 0.5), 6).alias("p50"),
            F.round(F.percentile("value", 0.9), 6).alias("p90"),
        )
    )


def user_activity_streaks(events: DataFrame) -> DataFrame:
    """Gaps-and-islands (E-5): longest run of consecutive active days.

    distinct (user, day) → day_no − row_number() is constant within a
    consecutive run (the island id) → count per island, max per user.
    Two window passes over the same (user_id) partitioning, so Catalyst
    plans a single Exchange; the distinct is the only other shuffle.
    """
    days = (
        events.select(
            "user_id",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("day_no"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day_no")
    islands = days.withColumn(
        "grp", F.col("day_no") - F.row_number().over(w)
    )
    return (
        islands.groupBy("user_id", "grp")
        .agg(F.count("*").alias("streak"))
        .groupBy("user_id")
        .agg(F.max("streak").cast("int").alias("longest_streak"))
    )


def q10_top_customer_revenue(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-04-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: top customers by returned-quarter revenue.

    Aggregate lineitem revenue per customer FIRST (the big shuffle keyed
    on o_custkey, fully partial-aggregated map-side), then join the small
    result to the dims — customer joins after reduction, nation
    broadcast. Revenue in integer cents for hash-exact oracle parity.
    """
    rev = (
        lineitem.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit(date_lo).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(date_hi).cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0).cast(
                    "long"
                )
            ).alias("rev_cents")
        )
    )
    return (
        rev.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.round(F.col("rev_cents") / 100.0, 2).alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(k)
    )


def pivot_event_counts(events: DataFrame) -> DataFrame:
    """Pivot (E-4): daily event counts, one column per event type.

    The pivot values are declared explicitly — at 100 TB an undeclared
    pivot triggers an extra distinct scan just to discover the columns.
    Declared values make it a single conditional-count aggregation pass.
    """
    types = ["click", "error", "purchase", "signup", "view"]
    pivoted = (
        events.groupBy(
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day")
        )
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types]
    )


def window_range_frames(orders: DataFrame) -> DataFrame:
    """RANGE window frame (E-5): trailing-7-day revenue per priority.

    RANGE frames bound by the ORDER BY *value* (all same-day peers join
    the frame regardless of row order) — the deterministic choice for
    event-time analytics, unlike ROWS frames whose content depends on
    tie order. Integer day numbers + cent sums keep it hash-exact.
    """
    enriched = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")).alias("day_no"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day_no")
        .rangeBetween(-7, Window.currentRow)
    )
    return enriched.select(
        "o_orderkey",
        "o_orderpriority",
        "day_no",
        F.round(F.sum("cents").over(w) / 100.0, 2).alias("trailing7_revenue"),
    )


def q7_volume_shipping(
    tables: dict[str, DataFrame], nation_a: str = "NATION_1", nation_b: str = "NATION_2"
) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume by year.

    The 5-way join keyed on lineitem: both nation dims broadcast, the
    disjunctive nation-pair predicate applied after the supplier/customer
    joins, revenue in cents by (supp_nation, cust_nation, year). Only
    lineitem is big — every other side broadcasts, so the plan is one
    scan + one final aggregation shuffle.
    """
    t = tables
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b)
    ) | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0).cast(
        "long"
    )
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.round(F.sum(cents) / 100.0, 2).alias("revenue"))
    )


def q9_product_profit(tables: dict[str, DataFrame], name_like: str = "%red%") -> DataFrame:
    """TPC-H Q9 shape: profit by nation and year for matching parts.

    (The fixture ships no partsupp, so profit is discounted revenue —
    the join tree l⋈p⋈s⋈n + LIKE filter + (nation, year) rollup is the
    exercised shape.) Part filter pushes to the part scan, then the
    filtered dim broadcasts into the lineitem join.
    """
    t = tables
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0).cast(
        "long"
    )
    return (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_name").like(name_like))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year"))
        .agg(F.round(F.sum(cents) / 100.0, 2).alias("sum_profit"), F.count("*").alias("n_lines"))
    )


def q17_small_quantity_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q17 shape: per-part correlated AVG subquery, decorrelated.

    WHERE l_quantity < 0.2 * (SELECT avg(l_quantity) ... same part)
    becomes a per-part aggregate broadcast back onto lineitem — the
    standard rewrite that turns a correlated scan-per-row into one extra
    aggregation pass.
    """
    thresholds = (
        lineitem.groupBy(F.col("l_partkey").alias("t_partkey"))
        .agg((F.avg("l_quantity") * 0.2).alias("qty_threshold"))
    )
    small = lineitem.join(
        F.broadcast(thresholds),
        (F.col("l_partkey") == F.col("t_partkey"))
        & (F.col("l_quantity") < F.col("qty_threshold")),
    )
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    return small.join(
        F.broadcast(part.filter(F.col("p_brand") == "Brand#1")),
        F.col("l_partkey") == F.col("p_partkey"),
    ).agg(
        F.round(F.sum(cents) / 100.0 / 7.0, 2).alias("avg_yearly"),
        F.count("*").alias("n_lines"),
    )


def q22_global_sales_opportunity(
    customer: DataFrame, orders: DataFrame, date_hi: str = "2000-01-01"
) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (global avg) + anti join.

    Customers with above-average positive balance and no *recent* order
    (the fixture gives every customer some order, so the anti side is
    date-windowed to keep the shape non-degenerate). The global average
    is a one-row broadcast (scalar subquery decorrelation); "no recent
    order" is a left anti join.
    """
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = orders.filter(F.col("o_orderdate") >= F.lit(date_hi).cast("timestamp"))
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(F.round(F.col("c_acctbal") * 100, 0).cast("long")) / 100.0, 2)
            .alias("totacctbal"),
        )
    )


def q15_top_supplier(lineitem: DataFrame, supplier: DataFrame,
                     date_lo: str = "1996-01-01", date_hi: str = "1996-04-01") -> DataFrame:
    """TPC-H Q15 shape: revenue view + WHERE total = (SELECT max(...)).

    The scalar-max subquery decorrelates into a rank-over-empty-partition:
    compute per-supplier revenue once, keep rank()==1 (ties included,
    matching SQL's = max semantics). One aggregation shuffle, one
    all-reduce window over the small aggregate.
    """
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0).cast("long")
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_lo).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_hi).cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(F.sum(cents) / 100.0, 2).alias("total_revenue"))
    )
    w = Window.orderBy(F.col("total_revenue").desc())
    best = rev.withColumn("rk", F.rank().over(w)).filter(F.col("rk") == 1).drop("rk")
    return (
        best.join(F.broadcast(supplier), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q19_disjunctive_predicates(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: join with OR-of-conjunctions mixing both sides.

    The equi-join key (partkey) still drives the join; the disjunctive
    brand/size/quantity residual is evaluated as a post-join filter —
    Catalyst keeps the equi-join hashable instead of degrading to a
    nested-loop over the full cross space.
    """
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 10))
         & (F.col("l_quantity").between(1, 15)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(1, 20))
           & (F.col("l_quantity").between(10, 25)))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 30))
           & (F.col("l_quantity").between(20, 35)))
    )
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0).cast("long")
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.round(F.sum(cents) / 100.0, 2).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


def q8_market_share(
    tables: dict[str, DataFrame],
    target_nation: str = "NATION_1",
    region_name: str = "EUROPE",
) -> DataFrame:
    """TPC-H Q8 shape: market share = conditional share of a grouped sum.

    Numerator and denominator come out of ONE aggregation pass
    (sum(CASE WHEN supplier-nation = target)) / sum(all) per year — never
    two scans. Joins: customer-region chain restricts the order side;
    supplier-nation tags each line with the supplier's nation.
    """
    t = tables
    region_nations = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("cust_nkey"))
    )
    supp_nation = t["nation"].select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0).cast("long")
    lines = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(region_nations), F.col("c_nationkey") == F.col("cust_nkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("s_nkey"))
    )
    target = F.when(F.col("supp_nation") == target_nation, cents).otherwise(F.lit(0))
    return (
        lines.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(F.sum(target) * 1.0 / F.sum(cents), 6).alias("mkt_share"),
            F.count("*").alias("n_lines"),
        )
    )


def q13_customer_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count.

    Left outer join (zero-order customers kept) → count per customer →
    count per count. Two aggregations, each with map-side partials; the
    second one's input is already tiny (one row per customer).
    """
    per_cust = (
        customer.join(
            orders.filter(~F.col("o_orderpriority").startswith("1")),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


# ---------------------------------------------------------------------------
# Adapted TPC-H shapes Q11/Q16/Q20/Q21. The driver fixtures ship no
# partsupp table and no l_receiptdate/l_commitdate columns, so these
# preserve each query's *plan shape* (the part Spark must execute well)
# with fixture-expressible predicates: lineitem's (l_partkey, l_suppkey)
# pairs stand in for partsupp, and "shipped >90 days after the order
# date" stands in for receipt-after-commit lateness.
# ---------------------------------------------------------------------------


def q11_important_part_value(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_name: str = "NATION_1",
    fraction: float = 0.001,
) -> DataFrame:
    """TPC-H Q11 shape: grouped agg + HAVING against a global scalar agg.

    Per-part value restricted to one nation's suppliers, keeping parts
    whose value exceeds ``fraction`` of the nation total. The scalar
    subquery decorrelates into an unpartitioned window SUM over the
    *already-aggregated* per-part rows (same trick as Q15's rank): a
    naive cross-join-with-scalar-agg plan would duplicate the whole
    per-part subtree and scan the 100 TB fact table twice; this plan
    scans and shuffles it exactly once, and the single-partition window
    only ever sees one small row per part.
    """
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0).cast(
        "long"
    )
    nat_supp = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == nation_name)),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    per_part = (
        lineitem.join(F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(cents).alias("value_cents"))
    )
    w_all = Window.partitionBy()
    return (
        per_part.withColumn(
            "threshold_cents", F.sum("value_cents").over(w_all) * fraction
        )
        .filter(F.col("value_cents") > F.col("threshold_cents"))
        .select(
            "partkey",
            F.round(F.col("value_cents") / 100.0, 2).alias("part_value"),
        )
    )


def q16_supplier_count_by_part(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    excluded_brand: str = "Brand#1",
    excluded_type: str = "PROMO",
    sizes: tuple[int, ...] = (1, 4, 9, 14, 19, 23, 36, 45),
) -> DataFrame:
    """TPC-H Q16 shape: distinct pairs + anti-join exclusion + distinct agg.

    ``SELECT DISTINCT (l_partkey, l_suppkey)`` from lineitem stands in
    for partsupp; suppliers with negative balance play the "customer
    complaints" NOT IN subquery (left anti join — no broadcast NOT IN
    materialization at scale). count(DISTINCT suppkey) per part attribute
    triple is the classic two-phase distinct aggregate: Spark plans it as
    expand + two hash aggregates, both partial-aggregated map-side.
    """
    pairs = lineitem.select(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).distinct()
    complaints = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    kept_parts = part.filter(
        (F.col("p_brand") != excluded_brand)
        & (~F.col("p_type").startswith(excluded_type))
        & (F.col("p_size").isin(*sizes))
    )
    return (
        pairs.join(
            F.broadcast(complaints),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(kept_parts), F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


def q20_excess_stock_suppliers(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    name_prefix: str = "red",
    nation_name: str = "NATION_2",
) -> DataFrame:
    """TPC-H Q20 shape: nested IN subqueries → semi-join chain.

    "Suppliers whose 1997 shipments of a red part exceeded half that
    part's 1996 demand" — availqty is proxied by the pair's 1997 shipped
    quantity. Both per-pair aggregates come from one grouped pass over
    lineitem with conditional sums (no second fact scan), the part-name
    IN-subquery is a broadcast semi join, and the final supplier
    filter is a semi join against the qualifying pair set.
    """
    y96 = (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")
    )
    y97 = (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")
    )
    red_parts = part.filter(F.col("p_name").startswith(name_prefix)).select("p_partkey")
    pair_qty = (
        lineitem.join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.when(y97, F.col("l_quantity")).otherwise(F.lit(0.0))).alias("avail_qty"),
            F.sum(F.when(y96, F.col("l_quantity")).otherwise(F.lit(0.0))).alias("demand_qty"),
        )
        .filter(
            (F.col("demand_qty") > 0) & (F.col("avail_qty") > 0.5 * F.col("demand_qty"))
        )
        .select(F.col("l_suppkey").alias("q_suppkey"))
        .distinct()
    )
    nat = nation.filter(F.col("n_name") == nation_name)
    return (
        supplier.join(pair_qty, F.col("s_suppkey") == F.col("q_suppkey"), "left_semi")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )


def q21_waiting_suppliers(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    late_days: int = 90,
    topk: int = 100,
) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS self-joins on the fact table.

    Lateness is ``l_shipdate > o_orderdate + late_days`` (fixtures ship
    no receipt/commit dates). The two correlated EXISTS subqueries over
    "other lineitems of the same order" decorrelate into ONE per-order
    aggregate — count of distinct suppliers and of distinct *late*
    suppliers — joined back to the late lines: a multi-supplier order
    with exactly one late supplier is precisely EXISTS(other supplier)
    AND NOT EXISTS(other late supplier). One shuffle by orderkey serves
    the aggregate and the join-back; the fact table is never self-joined
    row-to-row.
    """
    flagged = (
        lineitem.join(
            orders.filter(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")
            ).alias("is_late"),
        )
    )
    per_order = flagged.groupBy(F.col("l_orderkey").alias("a_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    qualifying = (
        flagged.filter(F.col("is_late"))
        .join(
            per_order.filter(
                (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
            ),
            F.col("l_orderkey") == F.col("a_orderkey"),
            "left_semi",
        )
    )
    return (
        qualifying.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(topk)
    )


def grouping_sets_sales(lineitem: DataFrame) -> DataFrame:
    """Irregular GROUPING SETS aggregate (E-4) via the DataFrame API.

    ``rollup_sales`` covers the ROLLUP special case; this one uses an
    arbitrary set list — (flag, status), (status), () — that no
    rollup/cube can express. Spark plans it as one Expand + a single
    hash aggregate: still exactly one shuffle regardless of how many
    sets are requested, which is why grouping sets beat unioning three
    separate aggregations at 100 TB (3 scans → 1 scan).
    """
    return (
        lineitem.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.count("*").alias("n_rows"),
            exact_sum(F.col("l_extendedprice")).alias("sum_price"),
            F.grouping_id().alias("gid"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "sum_price",
            "gid",
        )
    )


def unpivot_measure_stats(lineitem: DataFrame) -> DataFrame:
    """Wide→long melt (E-7 adjacent): `DataFrame.unpivot` + re-aggregate.

    Turns four measure columns into (measure, value) rows, then hash-
    aggregates per (returnflag, measure). At scale the melt is a pure
    map-side Expand (one row in → 4 rows out, no shuffle); the only
    shuffle is the final aggregation — same cost profile as aggregating
    the wide table directly, so long-format exports don't multiply scan
    cost.
    """
    long = lineitem.unpivot(
        ids=["l_returnflag"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )
    return long.groupBy("l_returnflag", "measure").agg(
        F.count("*").alias("n_vals"),
        exact_sum(F.col("value")).alias("sum_value"),
    )


def observed_write_metrics(documents: DataFrame) -> tuple[DataFrame, "object"]:
    """Free pipeline telemetry via ``Dataset.observe`` (E-1/E-9 ops
    pattern): named aggregate metrics ride an EXISTING action — no
    second scan, no extra job. The canonical 100 TB use: a nightly
    corpus write also reports row counts / byte totals / null rates for
    data-quality gates, at zero marginal cost (the metrics accumulate
    in the same tasks that produce the output).

    Returns (df, observation): run any ONE action on ``df``, then read
    ``observation.get`` for the metrics dict. In Structured Streaming
    the same call surfaces per-batch metrics through
    ``StreamingQueryListener`` (observable metrics), which is how the
    reference's per-poll log line (`hs_contacts.py:120-123`) upgrades
    to structured telemetry.
    """
    from pyspark.sql import Observation

    obs = Observation("corpus_write")
    observed = documents.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.length("text")).alias("total_chars"),
        F.sum(F.when(F.col("text").isNull() | (F.col("text") == ""), 1).otherwise(0)).alias(
            "n_empty"
        ),
        # DISTINCT aggregates are disallowed in observed metrics (they
        # need a per-key shuffle; metrics must accumulate in-task) —
        # the sketch-based distinct is the observable substitute
        F.approx_count_distinct(F.col("source")).alias("n_sources_approx"),
    )
    return observed, obs


def market_basket_pairs(lineitem: DataFrame, top_k: int = 20) -> DataFrame:
    """Market-basket pair mining over order line items — the
    co-purchase half of association mining (``event_type_cooccurrence``
    covers the per-user behavioral half): for the ``top_k`` part pairs
    by basket co-occurrence, support counts, DIRECTED confidences
    (conf(a→b) = n_both/n_a — the rule-strength asymmetry that matters
    for recommendations), and lift against independence.

    Plan at scale: the pair generator self-joins the deduped
    (order, part) table on the ORDER key, so fan-out per join key is
    (items-per-basket choose 2) — bounded by basket size, never by
    catalog or corpus size (the same bounded-fanout argument as the
    per-user co-occurrence join). Margins are map-combined counts; the
    final top-k is a TakeOrderedAndProject. Confidences are exact ppm
    (trunc division); lift is one int-ratio double, the identical
    expression in the twin.
    """
    items = lineitem.select("l_orderkey", "l_partkey").distinct()
    n_orders = items.agg(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    per_part = items.groupBy(F.col("l_partkey").alias("p")).agg(
        F.count(F.lit(1)).alias("n_p")
    )
    a = items.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    both = (
        a.join(b, "l_orderkey")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    out = (
        both.join(
            F.broadcast(per_part.select(F.col("p").alias("part_a"), F.col("n_p").alias("n_a"))),
            "part_a",
        )
        .join(
            F.broadcast(per_part.select(F.col("p").alias("part_b"), F.col("n_p").alias("n_b"))),
            "part_b",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_both",
            "n_a",
            "n_b",
            F.expr("CAST((n_both * 1000000) div n_a AS BIGINT)").alias("conf_a2b_ppm"),
            F.expr("CAST((n_both * 1000000) div n_b AS BIGINT)").alias("conf_b2a_ppm"),
            F.round(
                F.col("n_both") * F.col("n_orders") / (F.col("n_a") * F.col("n_b")), 4
            ).alias("lift"),
        )
    )
    return out.orderBy(F.col("n_both").desc(), "part_a", "part_b").limit(top_k)


MARKET_BASKET_SQL = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), n_o AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM items),
per_part AS (
  SELECT l_partkey AS p, CAST(count(*) AS BIGINT) AS n_p FROM items GROUP BY 1
), both_t AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(count(*) AS BIGINT) AS n_both
  FROM items a JOIN items b
    ON b.l_orderkey = a.l_orderkey AND b.l_partkey > a.l_partkey
  GROUP BY 1, 2
)
SELECT part_a, part_b, n_both, pa.n_p AS n_a, pb.n_p AS n_b,
       CAST((n_both * 1000000) // pa.n_p AS BIGINT) AS conf_a2b_ppm,
       CAST((n_both * 1000000) // pb.n_p AS BIGINT) AS conf_b2a_ppm,
       round(n_both * n_orders / (pa.n_p * pb.n_p), 4) AS lift
FROM both_t
JOIN per_part pa ON pa.p = part_a
JOIN per_part pb ON pb.p = part_b
CROSS JOIN n_o
ORDER BY n_both DESC, part_a, part_b
LIMIT 20
"""
