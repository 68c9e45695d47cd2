"""The reference engine's own operator semantics on Spark DataFrames.

The reference (sazzrahman/kinesis-dstream) pushes one query shape to a
remote API: conjunctive filters (an event-time BETWEEN + a HAS_PROPERTY
existence check), a column projection, and limit+cursor pagination
(reference ``app/hs_contacts.py:61-81``). It then tumbles that window
forward forever (``app/hs_contacts.py:139-147``) and streams a *changelog*
keyed by last-modified time (SURVEY §1.3).

Here each of those semantics is a declarative DataFrame transform over the
``events`` fixture (the local stand-in for the remote entity stream):
filters/projection compile to a parquet scan with pushed filters and a
pruned read schema — the same architectural optimization the reference got
by serializing its filter into the HTTP payload, except Catalyst does it
for free (SURVEY §4).

Scale notes (100 TB): every function below is a narrow scan+filter+project
or a single keyed shuffle; no driver-side loops, no Python UDFs. The
changelog/top-k operators use window functions whose partition key
(``user_id``) is the natural distribution key; skew is handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kinesis_dstream_spark.functions.exact import exact_sum

# Default event-time window used by the flagship query: a closed interval
# inside the fixture's [2024-01-01, 2024-01-31) range — the analog of the
# reference's [now - lag, now] window (app/hs_contacts.py:40-48).
DEFAULT_WINDOW_LO = "2024-01-05 00:00:00"
DEFAULT_WINDOW_HI = "2024-01-20 00:00:00"


def poll_window_filter(
    events: DataFrame,
    lo: str = DEFAULT_WINDOW_LO,
    hi: str = DEFAULT_WINDOW_HI,
) -> DataFrame:
    """Flagship: event-time BETWEEN + existence predicate + projection.

    Reference semantics O-2 (BETWEEN, app/hs_contacts.py:65-70), O-3
    (HAS_PROPERTY, :71-74), O-4 (conjunction, :62-77), O-5 (projection,
    :78). BETWEEN is closed on both ends, exactly like the reference's.

    The filter and 4-column projection reach the parquet scan as
    PushedFilters + a pruned ReadSchema — verified in
    tests/test_plans.py.
    """
    return (
        events.filter(
            F.col("ts").between(F.lit(lo).cast("timestamp"), F.lit(hi).cast("timestamp"))
            & F.col("props").isNotNull()
        )
        .select("event_id", "ts", "user_id", "event_type")
    )


def changelog_latest_state(events: DataFrame) -> DataFrame:
    """Latest state per key from a last-modified changelog (SURVEY §1.3).

    The reference re-emits a record every time it is modified; "current
    state" is the max-ts row per key. One shuffle on the key, then a
    per-partition sort — the canonical distributed argmax.
    """
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value", "ts")
    )


def json_props_extract(events: DataFrame) -> DataFrame:
    """Parse the JSON-ish ``props`` payload (≅ HubSpot ``properties``).

    The reference's records are dynamic JSON property bags (SURVEY §1.1);
    here ``get_json_object`` pulls a typed column out and filters on it —
    all JVM-side expression work, no Python.
    """
    return (
        events.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .filter(F.col("k").isNotNull() & (F.col("k") >= 50))
        .select("event_id", "user_id", "event_type", "k")
    )


def variant_props_stats(events: DataFrame) -> DataFrame:
    """Semi-structured aggregation via VariantType (Spark 4).

    The modern path for the reference's dynamic JSON property bags
    (SURVEY §1.1): ``parse_json`` shreds the payload ONCE into Spark's
    binary Variant encoding, then ``variant_get`` does typed, O(1)
    field access — contrast ``json_props_extract``'s per-access string
    parsing (``get_json_object`` re-parses the JSON text for every
    field). At 100 TB with multi-field bags the one-shred/many-reads
    shape is the difference between one and N text parses per row;
    both stay fully JVM-side.
    """
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "int")
    return (
        events.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


def page_limit_topk(events: DataFrame, n: int = 100) -> DataFrame:
    """O-6 limit semantics: first ``n`` rows in event-time order.

    The reference paginates with limit=100 + cursor; in Spark the ordered
    limit is a TakeOrderedAndProject — each partition computes a local
    top-n, only n rows ever reach the driver stage. Tie-broken on
    event_id for determinism.
    """
    return (
        events.orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .limit(n)
        .select("event_id", "user_id", "event_type", "value")
    )


def microbatch_tumbling_counts(events: DataFrame, days: int = 1) -> DataFrame:
    """O-7's tumbling micro-batch windows as an event-time windowed agg.

    The reference advances a wall-clock window every 10 s; the batch analog
    is a tumbling event-time window group-by. Uses date_trunc (not
    F.window) so the key is a plain timestamp — partial aggregation
    (map-side combine) applies before the single shuffle.
    """
    assert days == 1, "fixture-scale queries use 1-day windows"
    return (
        events.groupBy(
            F.date_trunc("day", F.col("ts")).alias("win_start"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            exact_sum(F.col("value")).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.date_format("win_start", "yyyy-MM-dd").alias("win_day"),
            "event_type",
            "n_events",
            "sum_value",
            "n_users",
        )
    )


def sessionize_events(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization (batch analog of session windows, E-9).

    A new session starts when a user's inter-event gap exceeds
    ``gap_minutes``. Classic two-window formulation: lag to mark session
    starts, running sum to number sessions — one shuffle on user_id, both
    window functions share the same partitioning so Catalyst plans a
    single Exchange.
    """
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000  # integer µs: exact & engine-portable
    # events.ts is TIMESTAMP_NTZ in the parquet; unix_micros requires
    # TIMESTAMP. Session tz is pinned to UTC (session.py:53), so the cast
    # is a fixed-offset reinterpretation and all µs *differences* are exact.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    with_flag = events.withColumn(
        "new_session",
        F.when(F.col("ts").isNotNull() & (us - F.lag(us).over(by_user) > F.lit(gap_us)), 1)
        .otherwise(0)
        .cast("int"),
    ).withColumn(
        # first event of a user has lag=null -> new_session=0; session ids
        # still start at 0 per user via the running sum.
        "session_id",
        F.sum("new_session").over(
            by_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_flag.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round((F.max(us) - F.min(us)) / 1e6, 3).alias("duration_s"),
        )
        .filter(F.col("n_events") >= 3)
        .select("user_id", "session_id", "n_events", "duration_s")
    )


def events_gap_fill(events: DataFrame) -> DataFrame:
    """Zero-filled daily activity per user — the date-spine pattern.

    Time-series reporting over sparse event data needs explicit zero
    rows for silent days (rates, streak math, charting). Recipe: per-user
    daily aggregate, then a generated date spine (``sequence`` between
    each user's first and last active day, exploded) left-joined back,
    gaps coalesced to zero.

    Scale shape: two aggregations and one join, all keyed on user_id —
    the same shuffle partitioning end-to-end, so Catalyst/AQE reuses it.
    The spine explode generates at most (active span in days) rows per
    user — output-sized, never corpus-sized. Value sums use fixed-point
    aggregation (order-independent, oracle-exact).
    """
    from kinesis_dstream_spark.functions.exact import exact_sum

    day = F.date_trunc("day", F.col("ts"))
    daily = events.groupBy(F.col("user_id"), day.alias("day")).agg(
        F.count("*").alias("n_events"),
        exact_sum(F.col("value")).alias("sum_value"),
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(
                F.sequence(F.col("d0"), F.col("d1"), F.expr("interval 1 day"))
            ).alias("day"),
        )
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            F.coalesce(F.col("sum_value"), F.lit(0.0)).alias("sum_value"),
        )
    )


def parse_text_table(lines: DataFrame, pattern: str) -> DataFrame:
    """O-12: unstructured text scan → regex filter → positional projection.

    The reference parses ``ps`` output (app/app.py:11-28): keep lines
    matching a pattern, whitespace-split, project positional fields. Same
    shape here over a single-column ``lines`` DataFrame (column ``line``).
    """
    toks = F.split(F.regexp_replace(F.trim(F.col("line")), r"\s+", " "), " ")
    return (
        lines.filter(F.col("line").rlike(pattern))
        .select(
            toks.getItem(0).alias("pid"),
            toks.getItem(1).alias("user"),
            toks.getItem(2).alias("time"),
            F.slice(toks, 4, 1000).alias("command"),
        )
    )
