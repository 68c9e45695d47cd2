"""Event-flow analytics: funnel, cohort retention, EWMA, outliers, transitions.

The product-analytics layer over an event stream — the queries a team
runs on the data the reference engine ingests (its pollers emit exactly
this shape: entity events keyed by id with a last-modified event time,
see /root/reference/app/hs_contacts.py:59-81). The reference itself has
no analytics executor; these are part of the mandated extension surface
(SURVEY §2B), expressed Spark-first.

Every operator here is one-or-two-shuffle by construction and fully
deterministic (fixed-point integer arithmetic before any float division,
see functions/exact.py), so each has an exact DuckDB SQL oracle.

Scale shapes (100 TB):
- funnel / EWMA / transitions: ONE shuffle on ``user_id``; all
  subsequent window passes reuse the same partitioning (Catalyst elides
  the re-exchange), and the final rollups aggregate map-side first.
- cohort retention: one shuffle on ``user_id`` for first-touch, one on
  the (cohort, offset) pair — whose cardinality is O(weeks²), tiny.
- rolling z-score: one shuffle on ``event_type``. NOTE: event_type is a
  low-cardinality key, so at 100 TB this window would hot-spot its
  partitions; ``rolling_zscore_outliers_sharded`` is the implemented
  mitigation — sub-keys the window by (event_type, user_id % shards)
  so no partition sorts more than ~1/shards of a type. The unsharded
  variant remains for when a per-type total order IS the semantics —
  a trailing-window baseline is inherently sequential per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kinesis_dstream_spark.functions.exact import fixedpoint
from kinesis_dstream_spark.operators.selection import grid_rank_select

# Fixed-point scale for event values (2 decimal places in the fixture;
# 100 keeps int64 sums exact for any realistic window).
_V_SCALE = 100

# Histogram-refinement bucket width for order-statistic selection over
# the iv grid (selection.py): ~10.24 value units per bucket — a few
# hundred buckets for realistic event-value ranges, so the bucket table
# is tiny and the refine pass touches ~1/|buckets| of the rows.
_GRID_BUCKET = 1024


def funnel_conversion(
    events: DataFrame, stages: tuple[str, str, str] = ("view", "click", "purchase")
) -> DataFrame:
    """Ordered three-stage funnel: users reaching each stage *in order*.

    A user counts for stage k only if an event of type ``stages[k]``
    happened at-or-after their earliest chained stage k-1 time — the
    standard product-funnel semantics (not mere set intersection).

    Plan: one shuffle on ``user_id``; the three chained window minima
    run over the same partitioning (no re-exchange); the per-user
    reduction and the final single-row rollup are map-side-combined.
    """
    s1, s2, s3 = stages
    w = Window.partitionBy("user_id")
    ts, et = F.col("ts"), F.col("event_type")
    step1 = events.withColumn("t1", F.min(F.when(et == s1, ts)).over(w))
    step2 = step1.withColumn(
        "t2", F.min(F.when((et == s2) & (ts >= F.col("t1")), ts)).over(w)
    )
    step3 = step2.withColumn(
        "t3", F.min(F.when((et == s3) & (ts >= F.col("t2")), ts)).over(w)
    )
    per_user = step3.groupBy("user_id").agg(
        F.max(F.col("t1").isNotNull()).alias("r1"),
        F.max(F.col("t2").isNotNull()).alias("r2"),
        F.max(F.col("t3").isNotNull()).alias("r3"),
    )
    cnt = lambda c: F.sum(F.col(c).cast("long"))  # noqa: E731
    return per_user.agg(
        cnt("r1").alias("stage1_users"),
        cnt("r2").alias("stage2_users"),
        cnt("r3").alias("stage3_users"),
        F.round(cnt("r2") / cnt("r1"), 4).alias("conv_stage2"),
        F.round(cnt("r3") / cnt("r1"), 4).alias("conv_stage3"),
    )


def funnel_sql(stages: tuple[str, str, str] = ("view", "click", "purchase")) -> str:
    """DuckDB twin of funnel_conversion (identical chained-min logic)."""
    s1, s2, s3 = stages
    return f"""
WITH w1 AS (
  SELECT *, min(CASE WHEN event_type = '{s1}' THEN ts END)
            OVER (PARTITION BY user_id) AS t1
  FROM events
), w2 AS (
  SELECT *, min(CASE WHEN event_type = '{s2}' AND ts >= t1 THEN ts END)
            OVER (PARTITION BY user_id) AS t2
  FROM w1
), w3 AS (
  SELECT *, min(CASE WHEN event_type = '{s3}' AND ts >= t2 THEN ts END)
            OVER (PARTITION BY user_id) AS t3
  FROM w2
), per_user AS (
  SELECT user_id, max(t1 IS NOT NULL) AS r1, max(t2 IS NOT NULL) AS r2,
         max(t3 IS NOT NULL) AS r3
  FROM w3 GROUP BY user_id
)
SELECT CAST(sum(CAST(r1 AS BIGINT)) AS BIGINT) AS stage1_users,
       CAST(sum(CAST(r2 AS BIGINT)) AS BIGINT) AS stage2_users,
       CAST(sum(CAST(r3 AS BIGINT)) AS BIGINT) AS stage3_users,
       round(CAST(sum(CAST(r2 AS BIGINT)) AS BIGINT)
             / CAST(sum(CAST(r1 AS BIGINT)) AS BIGINT), 4) AS conv_stage2,
       round(CAST(sum(CAST(r3 AS BIGINT)) AS BIGINT)
             / CAST(sum(CAST(r1 AS BIGINT)) AS BIGINT), 4) AS conv_stage3
FROM per_user
"""


_EPOCH = "2024-01-01"  # fixture epoch: week indices are days-since /7


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention: active users by (first-touch week, offset).

    ``cohort_week`` indexes the week of a user's first event;
    ``week_offset`` is whole weeks between an activity day and the
    user's first day. ``retention_pct`` normalizes by the cohort's
    offset-0 population (== cohort size, since every user is active in
    their first week by definition).

    Plan: first-touch is a window min over the ``user_id`` shuffle;
    the rollup shuffles on (cohort_week, week_offset) — O(weeks²) keys.
    The distinct-users count is the only expensive agg and Spark
    map-side partial-aggregates it per user automatically.
    """
    w = Window.partitionBy("user_id")
    first_day = F.min(F.to_date("ts")).over(w)
    base = events.select(
        "user_id",
        F.to_date("ts").alias("day"),
        first_day.alias("first_day"),
    )
    shaped = base.select(
        "user_id",
        F.expr(f"datediff(first_day, DATE '{_EPOCH}') DIV 7").alias("cohort_week"),
        F.expr("datediff(day, first_day) DIV 7").alias("week_offset"),
    )
    counts = shaped.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("user_id").alias("active_users")
    )
    wc = Window.partitionBy("cohort_week")
    return counts.select(
        "cohort_week",
        "week_offset",
        "active_users",
        F.round(
            F.col("active_users")
            / F.max(F.when(F.col("week_offset") == 0, F.col("active_users"))).over(wc),
            4,
        ).alias("retention_pct"),
    )


COHORT_RETENTION_SQL = f"""
WITH firsts AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         min(CAST(ts AS DATE)) OVER (PARTITION BY user_id) AS first_day
  FROM events
), shaped AS (
  SELECT user_id,
         date_diff('day', DATE '{_EPOCH}', first_day) // 7 AS cohort_week,
         date_diff('day', first_day, day) // 7 AS week_offset
  FROM firsts
), counts AS (
  SELECT cohort_week, week_offset, count(DISTINCT user_id) AS active_users
  FROM shaped GROUP BY cohort_week, week_offset
)
SELECT cohort_week, week_offset, active_users,
       round(active_users / max(CASE WHEN week_offset = 0 THEN active_users END)
                            OVER (PARTITION BY cohort_week), 4) AS retention_pct
FROM counts
"""


_EWMA_K = 16  # trailing kernel length (current row + 15 preceding)


def ewma_user_value(events: DataFrame) -> DataFrame:
    """Per-user exponential smoothing of ``value`` (dyadic α = 1/2).

    Truncated-kernel EWMA over the trailing {K} events:
    ``ewma_t = Σ_d v_{{t-d}}·2^(K-1-d) / Σ_d 2^(K-1-d)`` — the newest
    event carries half the total weight, matching α=1/2 exactly while
    keeping all arithmetic in int64 until one final division.

    Determinism: values are fixed-pointed (×100) first, weights are
    powers of two, and the numerator/denominator are exact integer sums,
    so Spark and the SQL oracle produce bit-identical doubles (scaling
    num and den by the same 2^c cancels in IEEE division).

    Plan: ONE shuffle on ``user_id``; the frame collect + weighting run
    as JVM higher-order functions (no UDF, no self-join — the oracle's
    O(K·n) self-join is the *specification*, not the implementation).
    """
    iv = fixedpoint(F.col("value"), _V_SCALE)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_EWMA_K - 1), 0)
    )
    arr = F.collect_list(iv).over(w)
    # pow(2.0, i) is an exact double for i ≤ 15, so the cast-to-long
    # weights are exact; the running aggregate stays in int64.
    weighted = F.transform(
        arr, lambda x, i: x * F.pow(F.lit(2.0), i).cast("long")
    )
    num = F.aggregate(weighted, F.lit(0).cast("long"), lambda a, x: a + x)
    den = F.pow(F.lit(2.0), F.size(arr)).cast("long") - 1
    return events.select(
        "user_id",
        "event_id",
        num.alias("_num"),
        den.alias("_den"),
    ).select(
        "user_id",
        "event_id",
        F.round(F.col("_num") / F.col("_den") / float(_V_SCALE), 4).alias("ewma"),
    )


EWMA_SQL = f"""
WITH o AS (
  SELECT user_id, event_id, CAST(round(value * {_V_SCALE}) AS BIGINT) AS iv,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT a.user_id, a.event_id,
       round(CAST(sum(b.iv * CAST(power(2, {_EWMA_K - 1} - a.rn + b.rn) AS BIGINT))
                  AS BIGINT)
             / CAST(sum(CAST(power(2, {_EWMA_K - 1} - a.rn + b.rn) AS BIGINT))
                    AS BIGINT)
             / {_V_SCALE}.0, 4) AS ewma
FROM o a JOIN o b
  ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - {_EWMA_K - 1} AND a.rn
GROUP BY a.user_id, a.event_id
"""


_Z_LOOKBACK = 20
_Z_THRESHOLD = 2.5
_Z_MIN_BASELINE = 5


def rolling_zscore_outliers(events: DataFrame) -> DataFrame:
    """Trailing-window anomaly detection per event type.

    Each event's ``value`` is z-scored against the {N} events preceding
    it (same type, event-time order, current row excluded so an outlier
    can't mask itself); |z| > {T} flags an outlier. Output is the
    per-type rollup: events scored, outliers, and the largest |z|.

    Determinism: with s1 = Σiv, s2 = Σiv² (exact int64 over the frame),
    ``z = (iv·n − s1) / sqrt((n·s2 − s1²)·n / (n−1))`` uses only
    integer ops until two IEEE divisions and one sqrt — bit-identical
    across engines, so even the > threshold flags match exactly.
    """
    iv = fixedpoint(F.col("value"), _V_SCALE)
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-_Z_LOOKBACK, -1)
    )
    n = F.count(F.lit(1)).over(w)
    s1 = F.sum(iv).over(w)
    s2 = F.sum(iv * iv).over(w)
    scored = events.select(
        "event_type",
        iv.alias("iv"),
        n.alias("n"),
        s1.alias("s1"),
        s2.alias("s2"),
    ).where(F.col("n") >= _Z_MIN_BASELINE)
    den = F.sqrt(
        F.nullif(
            (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
            * F.col("n")
            / (F.col("n") - 1),
            F.lit(0.0),
        )
    )
    z = (F.col("iv") * F.col("n") - F.col("s1")) / den
    return (
        scored.select("event_type", z.alias("z"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.sum((F.abs("z") > _Z_THRESHOLD).cast("long")).alias("n_outliers"),
            F.round(F.max(F.abs("z")), 4).alias("max_abs_z"),
        )
    )


ZSCORE_SQL = f"""
WITH framed AS (
  SELECT event_type, CAST(round(value * {_V_SCALE}) AS BIGINT) AS iv,
         count(*) OVER w AS n,
         CAST(sum(CAST(round(value * {_V_SCALE}) AS BIGINT)) OVER w AS BIGINT) AS s1,
         CAST(sum(CAST(round(value * {_V_SCALE}) AS BIGINT)
                  * CAST(round(value * {_V_SCALE}) AS BIGINT)) OVER w
              AS BIGINT) AS s2
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN {_Z_LOOKBACK} PRECEDING AND 1 PRECEDING)
), scored AS (
  SELECT event_type,
         (iv * n - s1) / sqrt(nullif((n * s2 - s1 * s1) * n / (n - 1), 0.0)) AS z
  FROM framed WHERE n >= {_Z_MIN_BASELINE}
)
SELECT event_type, count(*) AS n_scored,
       CAST(sum(CAST(abs(z) > {_Z_THRESHOLD} AS BIGINT)) AS BIGINT) AS n_outliers,
       round(max(abs(z)), 4) AS max_abs_z
FROM scored GROUP BY event_type
"""


_Z_SHARDS = 8


def rolling_zscore_outliers_sharded(
    events: DataFrame, shards: int = _Z_SHARDS
) -> DataFrame:
    """Sharded trailing z-score: the 100 TB shape of
    ``rolling_zscore_outliers``.

    The plain variant's window partitions by ``event_type`` alone — a
    low-cardinality key whose partitions hold a full type's rows, the
    classic hot-spot at scale. This variant sub-keys the window by
    ``(event_type, user_id % shards)`` — the documented entity-shard
    mitigation, now code: each event is z-scored against the trailing
    {N} same-type events OF ITS ENTITY SHARD (a per-shard baseline is
    statistically interchangeable with the global one when events are
    hash-spread across shards, which user-keyed traffic is), so no
    window partition ever sorts more than ~1/shards of a type's rows,
    and adding shards scales the sort out linearly.

    The two-level merge mirrors ``sketches.kmv_day_granules``: stage 1
    computes shard-local exact moments + flags inside the sharded
    window; stage 2's per-type rollup merges shard results EXACTLY
    (counts are additive, max is distributive), so the merge introduces
    no approximation — only the baseline's membership changes, and that
    change is part of the operator's declared semantics with its own
    exact DuckDB oracle (the oracle computes the identical sharded
    window, so flags match bit-for-bit).
    """
    iv = fixedpoint(F.col("value"), _V_SCALE)
    # `%` (not pmod): the shard is SEMANTIC — it sub-keys the window the
    # oracle twin computes with `user_id % shards`, and DuckDB's % takes
    # the dividend's sign while pmod is always non-negative, so a
    # negative user_id would silently diverge between engines (r7
    # ADVICE). Spark's % matches DuckDB's remainder semantics exactly.
    shard = F.expr(f"user_id % {int(shards)}")
    w = (
        Window.partitionBy("event_type", "shard")
        .orderBy("ts", "event_id")
        .rowsBetween(-_Z_LOOKBACK, -1)
    )
    base = events.select(
        "event_type", shard.alias("shard"), "ts", "event_id", iv.alias("iv")
    )
    scored = base.select(
        "event_type",
        "iv",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("iv").over(w).alias("s1"),
        F.sum(F.col("iv") * F.col("iv")).over(w).alias("s2"),
    ).where(F.col("n") >= _Z_MIN_BASELINE)
    den = F.sqrt(
        F.nullif(
            (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
            * F.col("n")
            / (F.col("n") - 1),
            F.lit(0.0),
        )
    )
    z = (F.col("iv") * F.col("n") - F.col("s1")) / den
    return (
        scored.select("event_type", z.alias("z"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.sum((F.abs("z") > _Z_THRESHOLD).cast("long")).alias("n_outliers"),
            F.round(F.max(F.abs("z")), 4).alias("max_abs_z"),
        )
    )


ZSCORE_SHARDED_SQL = f"""
WITH framed AS (
  SELECT event_type, CAST(round(value * {_V_SCALE}) AS BIGINT) AS iv,
         count(*) OVER w AS n,
         CAST(sum(CAST(round(value * {_V_SCALE}) AS BIGINT)) OVER w AS BIGINT) AS s1,
         CAST(sum(CAST(round(value * {_V_SCALE}) AS BIGINT)
                  * CAST(round(value * {_V_SCALE}) AS BIGINT)) OVER w
              AS BIGINT) AS s2
  FROM events
  WINDOW w AS (PARTITION BY event_type, user_id % {_Z_SHARDS}
               ORDER BY ts, event_id
               ROWS BETWEEN {_Z_LOOKBACK} PRECEDING AND 1 PRECEDING)
), scored AS (
  SELECT event_type,
         (iv * n - s1) / sqrt(nullif((n * s2 - s1 * s1) * n / (n - 1), 0.0)) AS z
  FROM framed WHERE n >= {_Z_MIN_BASELINE}
)
SELECT event_type, count(*) AS n_scored,
       CAST(sum(CAST(abs(z) > {_Z_THRESHOLD} AS BIGINT)) AS BIGINT) AS n_outliers,
       round(max(abs(z)), 4) AS max_abs_z
FROM scored GROUP BY event_type
"""


def event_transition_matrix(events: DataFrame) -> DataFrame:
    """First-order Markov transition counts/probabilities per user path.

    For each user's event-time-ordered path, count consecutive
    (prev_type → next_type) pairs and normalize per source state — the
    classic behavioral-flow summary. All-integer until one division.

    Plan: one shuffle on ``user_id`` for the lag, one tiny rollup on
    the (prev, next) pair — at most |event_types|² keys.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = events.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).where(F.col("prev_type").isNotNull())
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    wp = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(wp), 4
        ).alias("transition_pct"),
    )


# Fixed-point scale for interpolated hourly means: the hourly sum is
# already ×100; one more ×100 for the truncating mean division keeps
# 4 decimal places while every intermediate stays int64-exact.
_M_SCALE = _V_SCALE * 100
_US_PER_HOUR = 3_600_000_000


def gap_fill_interpolate(events: DataFrame) -> DataFrame:
    """Hourly series per event type with LOCF and linear interpolation.

    The continuous-aggregate + gapfill shape (TimescaleDB's
    ``time_bucket_gapfill`` + ``locf``/``interpolate``): bucket events
    into hours, generate the full hour spine per type, and fill silent
    hours two ways — last-observation-carried-forward and linear
    interpolation between the neighboring observed hours. Hours outside
    the observed range stay null (no extrapolation).

    Determinism: hourly means are truncating fixed-point integers
    (scale {S}); the interpolation formula multiplies/divides those
    int64s in a fixed order, so both engines emit identical doubles.

    Plan: one shuffle on (event_type, hour) for the bucket agg, one on
    event_type for the spine + fills. The spine explode is
    span-bounded (hours in the observed range), never corpus-sized;
    the fill windows run over the already-aggregated hourly table.
    """
    hourly = (
        events.select(
            "event_type",
            F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_US_PER_HOUR}").alias(
                "hidx"
            ),
            fixedpoint(F.col("value"), _V_SCALE).alias("iv"),
        )
        .groupBy("event_type", "hidx")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("iv").alias("s"))
    )
    return gap_fill_from_hourly(hourly)


def gap_fill_from_hourly(hourly: DataFrame) -> DataFrame:
    """Spine + LOCF/interpolation over an hourly (n_events, s) table —
    the drain-shaping half, shared with the streaming granule job
    (additive hourly partials merge first, then this runs span-bounded)."""
    # NB: Spark DIV and DuckDB // both truncate toward zero, so the
    # truncating mean is engine-portable even for negative sums.
    hourly = hourly.withColumn("m", F.expr("s * 100 DIV n_events"))
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("hidx").alias("h0"), F.max("hidx").alias("h1"))
        .select(
            "event_type",
            F.explode(F.sequence("h0", "h1")).alias("hidx"),
        )
    )
    joined = spine.join(hourly, ["event_type", "hidx"], "left")
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("hidx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("hidx")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev_v = F.last("m", ignorenulls=True).over(w_prev)
    prev_h = F.last(F.when(F.col("m").isNotNull(), F.col("hidx")), True).over(w_prev)
    next_v = F.first("m", ignorenulls=True).over(w_next)
    next_h = F.first(F.when(F.col("m").isNotNull(), F.col("hidx")), True).over(w_next)
    # Exact rational interpolation, rounded to the integer fixed-point
    # grid IN INTEGER ARITHMETIC (half-up via floor((2·num + den)/2den)).
    # Rounding the double instead is a trap: the interpolated rational
    # can land exactly on a 4-decimal boundary, where Spark's
    # BigDecimal HALF_UP and DuckDB's raw-double rounding disagree.
    num2 = (
        2 * (prev_v * (next_h - prev_h) + (next_v - prev_v) * (F.col("hidx") - prev_h))
        + (next_h - prev_h)
    )
    den2 = 2 * (next_h - prev_h)
    floored = (num2 - F.pmod(num2, den2)) / den2  # exact: remainder removed
    interp_int = F.when(F.col("m").isNotNull(), F.col("m")).otherwise(
        floored.cast("long")
    )
    return joined.select(
        "event_type",
        "hidx",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.round(prev_v / float(_M_SCALE), 4).alias("v_locf"),
        F.round(interp_int / float(_M_SCALE), 4).alias("v_interp"),
    )


GAP_FILL_INTERP_SQL = f"""
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // {_US_PER_HOUR} AS hidx,
         count(*) AS n_events,
         CAST(sum(CAST(round(value * {_V_SCALE}) AS BIGINT)) AS BIGINT) AS s
  FROM events GROUP BY 1, 2
), hm AS (
  SELECT *, s * 100 // n_events AS m FROM hourly
), rng AS (
  SELECT event_type, min(hidx) AS h0, max(hidx) AS h1 FROM hm GROUP BY event_type
), spine AS (
  SELECT event_type, unnest(generate_series(h0, h1)) AS hidx FROM rng
), joined AS (
  SELECT s.event_type, s.hidx, h.n_events, h.m
  FROM spine s LEFT JOIN hm h ON s.event_type = h.event_type AND s.hidx = h.hidx
), filled AS (
  SELECT event_type, hidx, n_events, m,
         last_value(m IGNORE NULLS) OVER wp AS prev_v,
         last_value(CASE WHEN m IS NOT NULL THEN hidx END IGNORE NULLS)
           OVER wp AS prev_h,
         first_value(m IGNORE NULLS) OVER wn AS next_v,
         first_value(CASE WHEN m IS NOT NULL THEN hidx END IGNORE NULLS)
           OVER wn AS next_h
  FROM joined
  WINDOW wp AS (PARTITION BY event_type ORDER BY hidx
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY event_type ORDER BY hidx
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, hidx, coalesce(n_events, 0) AS n_events,
       round(prev_v / {float(_M_SCALE)}, 4) AS v_locf,
       round(CASE WHEN m IS NOT NULL THEN m
                  ELSE (num2 - (((num2 % den2) + den2) % den2)) // den2 END
             / {float(_M_SCALE)}, 4) AS v_interp
FROM (
  SELECT *,
         2 * (prev_v * (next_h - prev_h)
              + (next_v - prev_v) * (hidx - prev_h))
           + (next_h - prev_h) AS num2,
         2 * (next_h - prev_h) AS den2
  FROM filled
) t
"""


_US_PER_MINUTE = 60_000_000


def hierarchical_time_rollup(events: DataFrame) -> DataFrame:
    """Continuous-aggregate hierarchy: minute → hour → day, merged upward.

    The hypertable-rollup shape: the fine (minute) grain is aggregated
    ONCE from raw; every coarser grain is computed by merging the grain
    below it, never by rescanning raw data. Exact int64 partials
    (count + fixed-point sum) make the merge lossless — the oracle
    computes hour/day straight from raw, so the hash match *proves*
    mergeability. Output is the hour and day grains, tagged.

    Plan: one shuffle builds the minute grain; each rollup shuffles the
    (already tiny) granule table on its coarser key. At 100 TB the
    minute grain is the only corpus-sized pass; reusing granules makes
    every additional grain O(granules), the entire point of the shape.
    """
    return rollup_from_minute_granules(minute_granules(events))


def minute_granules(events: DataFrame) -> DataFrame:
    """Exact minute-grain partials (count + fixed-point sum) from raw."""
    return (
        events.select(
            "event_type",
            F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_US_PER_MINUTE}").alias(
                "midx"
            ),
            fixedpoint(F.col("value"), _V_SCALE).alias("iv"),
        )
        .groupBy("event_type", "midx")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("iv").alias("s"))
    )


def minute_granules_by_user(events: DataFrame) -> DataFrame:
    """Subject-keyed minute granules — the derived-store variant whose
    rows remain attributable to a user (and therefore erasable; see
    operators/governance.py)."""
    return (
        events.select(
            "user_id",
            "event_type",
            F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_US_PER_MINUTE}").alias(
                "midx"
            ),
            fixedpoint(F.col("value"), _V_SCALE).alias("iv"),
        )
        .groupBy("user_id", "event_type", "midx")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("iv").alias("s"))
    )


def rollup_from_minute_granules(minute: DataFrame) -> DataFrame:
    """Merge minute granules upward to the tagged hour+day output.

    ``minute`` may contain SEVERAL partial rows per (event_type, midx)
    — e.g. one per streaming micro-batch — because count and
    fixed-point sum are mergeable by addition; the first groupBy here
    folds them losslessly.
    """
    hour = minute.groupBy("event_type", F.expr("midx DIV 60").alias("bucket")).agg(
        F.sum("n").alias("n"), F.sum("s").alias("s")
    )
    day = hour.groupBy("event_type", F.expr("bucket DIV 24").alias("bucket")).agg(
        F.sum("n").alias("n"), F.sum("s").alias("s")
    )
    shape = lambda df, g: df.select(  # noqa: E731
        F.lit(g).alias("grain"),
        "event_type",
        "bucket",
        F.col("n").alias("n_events"),
        F.round(F.col("s") / float(_V_SCALE), 2).alias("sum_value"),
    )
    return shape(hour, "hour").unionByName(shape(day, "day"))


HIERARCHICAL_ROLLUP_SQL = f"""
WITH raw AS (
  SELECT event_type, epoch_us(ts) AS us,
         CAST(round(value * {_V_SCALE}) AS BIGINT) AS iv
  FROM events
), hour AS (
  SELECT 'hour' AS grain, event_type, us // {_US_PER_HOUR} AS bucket,
         count(*) AS n_events,
         round(CAST(sum(iv) AS BIGINT) / {float(_V_SCALE)}, 2) AS sum_value
  FROM raw GROUP BY 2, 3
), day AS (
  SELECT 'day' AS grain, event_type, us // {_US_PER_HOUR * 24} AS bucket,
         count(*) AS n_events,
         round(CAST(sum(iv) AS BIGINT) / {float(_V_SCALE)}, 2) AS sum_value
  FROM raw GROUP BY 2, 3
)
SELECT * FROM hour UNION ALL SELECT * FROM day
"""


_FUNNEL_WINDOW_DAYS = 7


def funnel_conversion_windowed(
    events: DataFrame,
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
    window_days: int = _FUNNEL_WINDOW_DAYS,
) -> DataFrame:
    """Conversion-window funnel: each stage must land within
    ``window_days`` of the PREVIOUS stage's chained timestamp.

    The unbounded funnel (``funnel_conversion``) overcounts long-horizon
    conversions; product funnels bound each hop ("clicked within 7 days
    of first view"). Same one-shuffle chained-window plan, with the
    upper bound folded into each stage's conditional minimum.
    """
    s1, s2, s3 = stages
    w = Window.partitionBy("user_id")
    ts, et = F.col("ts"), F.col("event_type")
    lim = F.expr(f"INTERVAL {window_days} DAYS")
    step1 = events.withColumn("t1", F.min(F.when(et == s1, ts)).over(w))
    in2 = (et == s2) & (ts >= F.col("t1")) & (ts <= F.col("t1") + lim)
    step2 = step1.withColumn("t2", F.min(F.when(in2, ts)).over(w))
    in3 = (et == s3) & (ts >= F.col("t2")) & (ts <= F.col("t2") + lim)
    step3 = step2.withColumn("t3", F.min(F.when(in3, ts)).over(w))
    per_user = step3.groupBy("user_id").agg(
        F.max(F.col("t1").isNotNull()).alias("r1"),
        F.max(F.col("t2").isNotNull()).alias("r2"),
        F.max(F.col("t3").isNotNull()).alias("r3"),
    )
    cnt = lambda c: F.sum(F.col(c).cast("long"))  # noqa: E731
    return per_user.agg(
        cnt("r1").alias("stage1_users"),
        cnt("r2").alias("stage2_users"),
        cnt("r3").alias("stage3_users"),
        F.round(cnt("r2") / cnt("r1"), 4).alias("conv_stage2"),
        F.round(cnt("r3") / cnt("r1"), 4).alias("conv_stage3"),
    )


def funnel_windowed_sql(
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
    window_days: int = _FUNNEL_WINDOW_DAYS,
) -> str:
    s1, s2, s3 = stages
    return f"""
WITH w1 AS (
  SELECT *, min(CASE WHEN event_type = '{s1}' THEN ts END)
            OVER (PARTITION BY user_id) AS t1
  FROM events
), w2 AS (
  SELECT *, min(CASE WHEN event_type = '{s2}' AND ts >= t1
                      AND ts <= t1 + INTERVAL {window_days} DAY THEN ts END)
            OVER (PARTITION BY user_id) AS t2
  FROM w1
), w3 AS (
  SELECT *, min(CASE WHEN event_type = '{s3}' AND ts >= t2
                      AND ts <= t2 + INTERVAL {window_days} DAY THEN ts END)
            OVER (PARTITION BY user_id) AS t3
  FROM w2
), per_user AS (
  SELECT user_id, max(t1 IS NOT NULL) AS r1, max(t2 IS NOT NULL) AS r2,
         max(t3 IS NOT NULL) AS r3
  FROM w3 GROUP BY user_id
)
SELECT CAST(sum(CAST(r1 AS BIGINT)) AS BIGINT) AS stage1_users,
       CAST(sum(CAST(r2 AS BIGINT)) AS BIGINT) AS stage2_users,
       CAST(sum(CAST(r3 AS BIGINT)) AS BIGINT) AS stage3_users,
       round(CAST(sum(CAST(r2 AS BIGINT)) AS BIGINT)
             / CAST(sum(CAST(r1 AS BIGINT)) AS BIGINT), 4) AS conv_stage2,
       round(CAST(sum(CAST(r3 AS BIGINT)) AS BIGINT)
             / CAST(sum(CAST(r1 AS BIGINT)) AS BIGINT), 4) AS conv_stage3
FROM per_user
"""


_PATH_TOPK = 25


def top_event_paths(events: DataFrame, k: int = _PATH_TOPK) -> DataFrame:
    """Most common 3-step behavioral paths (second-order sequences).

    Two lags over the per-user event-time order produce every
    consecutive (a → b → c) triple; the rollup keys on at most
    |types|³ paths. Distributed top-k via orderBy+limit compiles to
    TakeOrderedAndProject — no global sort materializes. The
    (n_paths DESC, path ASC) order is total, so the cut is
    deterministic.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    triples = events.select(
        F.lag("event_type", 2).over(w).alias("step1"),
        F.lag("event_type", 1).over(w).alias("step2"),
        F.col("event_type").alias("step3"),
    ).where(F.col("step1").isNotNull())
    return (
        triples.groupBy("step1", "step2", "step3")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .withColumn(
            "path", F.concat_ws(">", "step1", "step2", "step3")
        )
        .select("path", "n_paths")
        .orderBy(F.col("n_paths").desc(), F.col("path").asc())
        .limit(k)
    )


TOP_PATHS_SQL = f"""
WITH triples AS (
  SELECT lag(event_type, 2) OVER w AS step1,
         lag(event_type, 1) OVER w AS step2,
         event_type AS step3
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT step1 || '>' || step2 || '>' || step3 AS path, count(*) AS n_paths
FROM triples WHERE step1 IS NOT NULL
GROUP BY step1, step2, step3
ORDER BY n_paths DESC, path ASC
LIMIT {_PATH_TOPK}
"""


_SIM_N_QUERIES = 10
_SIM_K = 5


def user_similarity_topk(
    events: DataFrame, n_queries: int = _SIM_N_QUERIES, k: int = _SIM_K
) -> DataFrame:
    """Audience lookalikes: cosine top-k over behavioral count vectors.

    Each user's profile is their event-type count vector (exact
    integers), so cosine similarity is an integer dot product over two
    integer norms — bit-identical across engines after one sqrt and one
    division (both IEEE-exact on identical inputs). The E-11 broadcast
    pattern applied to behavior instead of embeddings: the bounded query
    side broadcasts, the user-profile table is scanned once, per-query
    top-k rides a window.

    Scale: profiles are |users| × |types| — the only corpus-sized pass
    is the one groupBy building them. For all-pairs at 10⁹ users the
    E-11 LSH/IVF machinery applies unchanged to these vectors.
    """
    profiles = (
        events.groupBy("user_id")
        .pivot("event_type", ["signup", "view", "click", "purchase", "error"])
        .count()
        .na.fill(0)
        .select(
            "user_id",
            F.array("signup", "view", "click", "purchase", "error").alias("vec"),
        )
    )
    q = profiles.filter(F.col("user_id") < n_queries).select(
        F.col("user_id").alias("q_user"), F.col("vec").alias("q_vec")
    )
    c = profiles.select(F.col("user_id").alias("c_user"), F.col("vec").alias("c_vec"))
    dot = F.aggregate(
        F.zip_with("q_vec", "c_vec", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    norm = lambda col: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(col, lambda x: x * x),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).cast("double")
    )
    scored = c.join(F.broadcast(q), F.col("q_user") != F.col("c_user")).select(
        "q_user",
        "c_user",
        F.round(dot / (norm(F.col("q_vec")) * norm(F.col("c_vec"))), 4).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("q_user").orderBy(
        F.col("cos_sim").desc(), F.col("c_user").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_user", "c_user", "cos_sim", "rk")
    )


USER_SIM_SQL = f"""
WITH profiles AS (
  SELECT user_id,
         [CAST(sum(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS BIGINT),
          CAST(sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT),
          CAST(sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT),
          CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT),
          CAST(sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT)]
           AS vec
  FROM events GROUP BY user_id
), scored AS (
  SELECT q.user_id AS q_user, c.user_id AS c_user,
         round(
           CAST(list_sum(list_transform(range(1, 6),
                i -> q.vec[i] * c.vec[i])) AS BIGINT)
           / (sqrt(CAST(list_sum(list_transform(range(1, 6),
                        i -> q.vec[i] * q.vec[i])) AS BIGINT))
              * sqrt(CAST(list_sum(list_transform(range(1, 6),
                          i -> c.vec[i] * c.vec[i])) AS BIGINT))), 4) AS cos_sim
  FROM profiles q JOIN profiles c
    ON q.user_id < {_SIM_N_QUERIES} AND c.user_id != q.user_id
)
SELECT q_user, c_user, cos_sim, rk FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY q_user ORDER BY cos_sim DESC, c_user ASC
  ) AS INT) AS rk
  FROM scored
) WHERE rk <= {_SIM_K}
"""


_SESSION_GAP_MIN = 30


def session_funnel(
    events: DataFrame,
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
    gap_minutes: int = _SESSION_GAP_MIN,
) -> DataFrame:
    """Within-session funnel: stage progression counted per session.

    The composition every product-analytics stack ships: gap-based
    sessionization (30-min inactivity cut, identical recurrence to
    ``reference_ops.sessionize_events``) feeding the chained-minimum
    funnel, partitioned by (user, session) instead of user — "did this
    VISIT convert", not "did this user ever convert". Output is the
    session-level rollup: sessions reaching each stage + conversion
    rates.

    Plan: sessionization's lag + running-sum and all three funnel
    minima partition by ``user_id`` (session_id is a function of the
    user's own order), so the whole pipeline still rides ONE user_id
    exchange before the final rollup.
    """
    s1, s2, s3 = stages
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    flagged = events.withColumn(
        "new_session",
        F.when(us - F.lag(us).over(by_user) > F.lit(gap_us), 1).otherwise(0),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(
            by_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    w = Window.partitionBy("user_id", "session_id")
    ts, et = F.col("ts"), F.col("event_type")
    step1 = flagged.withColumn("t1", F.min(F.when(et == s1, ts)).over(w))
    step2 = step1.withColumn(
        "t2", F.min(F.when((et == s2) & (ts >= F.col("t1")), ts)).over(w)
    )
    step3 = step2.withColumn(
        "t3", F.min(F.when((et == s3) & (ts >= F.col("t2")), ts)).over(w)
    )
    per_session = step3.groupBy("user_id", "session_id").agg(
        F.max(F.col("t1").isNotNull()).alias("r1"),
        F.max(F.col("t2").isNotNull()).alias("r2"),
        F.max(F.col("t3").isNotNull()).alias("r3"),
    )
    cnt = lambda c: F.sum(F.col(c).cast("long"))  # noqa: E731
    return per_session.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        cnt("r1").alias("stage1_sessions"),
        cnt("r2").alias("stage2_sessions"),
        cnt("r3").alias("stage3_sessions"),
        F.round(cnt("r2") / cnt("r1"), 4).alias("conv_stage2"),
        F.round(cnt("r3") / cnt("r1"), 4).alias("conv_stage3"),
    )


def session_funnel_sql(
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
    gap_minutes: int = _SESSION_GAP_MIN,
) -> str:
    s1, s2, s3 = stages
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
WITH flagged AS (
  SELECT *, CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                      OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  > {gap_us} THEN 1 ELSE 0 END AS new_session
  FROM events
), sess AS (
  SELECT *, sum(new_session) OVER (
    PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
  ) AS session_id
  FROM flagged
), w1 AS (
  SELECT *, min(CASE WHEN event_type = '{s1}' THEN ts END)
            OVER (PARTITION BY user_id, session_id) AS t1
  FROM sess
), w2 AS (
  SELECT *, min(CASE WHEN event_type = '{s2}' AND ts >= t1 THEN ts END)
            OVER (PARTITION BY user_id, session_id) AS t2
  FROM w1
), w3 AS (
  SELECT *, min(CASE WHEN event_type = '{s3}' AND ts >= t2 THEN ts END)
            OVER (PARTITION BY user_id, session_id) AS t3
  FROM w2
), per_session AS (
  SELECT user_id, session_id, max(t1 IS NOT NULL) AS r1,
         max(t2 IS NOT NULL) AS r2, max(t3 IS NOT NULL) AS r3
  FROM w3 GROUP BY user_id, session_id
)
SELECT count(*) AS n_sessions,
       CAST(sum(CAST(r1 AS BIGINT)) AS BIGINT) AS stage1_sessions,
       CAST(sum(CAST(r2 AS BIGINT)) AS BIGINT) AS stage2_sessions,
       CAST(sum(CAST(r3 AS BIGINT)) AS BIGINT) AS stage3_sessions,
       round(CAST(sum(CAST(r2 AS BIGINT)) AS BIGINT)
             / CAST(sum(CAST(r1 AS BIGINT)) AS BIGINT), 4) AS conv_stage2,
       round(CAST(sum(CAST(r3 AS BIGINT)) AS BIGINT)
             / CAST(sum(CAST(r1 AS BIGINT)) AS BIGINT), 4) AS conv_stage3
FROM per_session
"""


def rfm_segments(events: DataFrame) -> DataFrame:
    """RFM segmentation: recency/frequency/monetary quartiles per user.

    The classic customer-value segmentation over purchase events:
    recency = days from last purchase to the corpus horizon, frequency =
    purchase count, monetary = fixed-point purchase value sum. Each
    dimension is quartiled with ``ntile(4)`` under a TOTAL order (metric,
    then user_id) so tie assignment is deterministic and
    engine-identical; the output is the segment-level rollup.

    Plan: one aggregation shuffle on user_id; the three ntiles run over
    the (already user-grained) aggregate — at 100 TB that table is
    |users|, and a no-partition ntile would single-task it, so the
    production variant quartiles by bucketed approx quantiles instead;
    here the exact ntile IS the point (oracle-exact segment counts).
    """
    horizon = F.lit("2024-02-01").cast("timestamp")
    per_user = (
        events.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.datediff(horizon, F.max("ts")).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(fixedpoint(F.col("value"), _V_SCALE)).alias("monetary_fp"),
        )
    )
    return rfm_from_per_user(per_user)


def rfm_from_per_user(per_user: DataFrame) -> DataFrame:
    """Quartile + rollup over per-user RFM statistics (the holistic,
    non-mergeable half — shared by the batch query and the streaming
    granule drain). Recency ntile ascends (1 = most recent)."""
    wr = Window.orderBy(F.col("recency_days").asc(), F.col("user_id").asc())
    wf = Window.orderBy(F.col("frequency").desc(), F.col("user_id").asc())
    wm = Window.orderBy(F.col("monetary_fp").desc(), F.col("user_id").asc())
    scored = per_user.select(
        "user_id",
        F.ntile(4).over(wr).alias("r_quartile"),
        F.ntile(4).over(wf).alias("f_quartile"),
        F.ntile(4).over(wm).alias("m_quartile"),
        "monetary_fp",
    )
    return (
        scored.groupBy("r_quartile", "f_quartile", "m_quartile")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.sum("monetary_fp") / float(_V_SCALE), 2).alias("segment_value"),
        )
    )


def rfm_segments_kmv(events: DataFrame, k: int = 256, shards: int = 8) -> DataFrame:
    """RFM segmentation via broadcast KMV quartile boundaries — the
    production variant the exact ``rfm_segments`` docstring promises
    ("quartiles by bucketed approx quantiles"): the three no-partition
    ``ntile``\\ s over the |users| table each single-task a total sort at
    scale; here each dimension's three quartile boundaries come from
    one shared KMV bottom-k hash-rank sample of users (md5 rank —
    uniform, mergeable, hash-exact in SQL; two-level shard tournament
    so no sort partition exceeds max(|users|/shards, shards·k) rows),
    and assignment is a map-side lexicographic comparison against the
    ≤ 9 broadcast boundary tuples. Fully deterministic → hash-exact
    DuckDB twin; per-dimension quartile sizes deviate from |users|/4
    by O(|users|/√k) (pinned in pytest vs the exact ntile variant).

    Output contract matches ``rfm_segments``: per (r,f,m)-quartile
    segment user counts and fixed-point segment value.
    """
    horizon = F.lit("2024-02-01").cast("timestamp")
    per_user = (
        events.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.datediff(horizon, F.max("ts")).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(fixedpoint(F.col("value"), _V_SCALE)).alias("monetary_fp"),
        )
    )
    ranked = per_user.select(
        "*",
        F.md5(F.col("user_id").cast("string")).alias("rk"),
        F.pmod(F.xxhash64(F.col("user_id")), F.lit(shards)).alias("shard"),
    )
    w1 = Window.partitionBy("shard").orderBy("rk", "user_id")
    samp = (
        ranked.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= k)
        .orderBy("rk", "user_id")
        .limit(k)
        .select("user_id", "recency_days", "frequency", "monetary_fp")
    )
    stages = events.sparkSession.range(1, 4).withColumnRenamed("id", "j")

    def dim_bounds(metric: str, ascending: bool, name: str) -> DataFrame:
        order = [
            F.col(metric).asc() if ascending else F.col(metric).desc(),
            F.col("user_id").asc(),
        ]
        ordered = samp.select(
            F.col(metric).alias("q_b"),
            F.col("user_id").alias("d_b"),
            F.row_number().over(Window.orderBy(*order)).alias("idx"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("m"),
        )
        return ordered.join(stages, F.col("idx") == F.expr("m * j DIV 4")).agg(
            F.sort_array(F.collect_list(F.struct("q_b", "d_b"))).alias(name)
        )

    bounds = (
        dim_bounds("recency_days", True, "br")
        .crossJoin(dim_bounds("frequency", False, "bf"))
        .crossJoin(dim_bounds("monetary_fp", False, "bm"))
    )

    def beyond(metric: str, arr: str, ascending: bool):
        if ascending:
            cmp = lambda b: (F.col(metric) > b["q_b"]) | (  # noqa: E731
                (F.col(metric) == b["q_b"]) & (F.col("user_id") > b["d_b"])
            )
        else:
            cmp = lambda b: (F.col(metric) < b["q_b"]) | (  # noqa: E731
                (F.col(metric) == b["q_b"]) & (F.col("user_id") > b["d_b"])
            )
        return (F.lit(1) + F.size(F.filter(arr, cmp))).cast("int")

    scored = per_user.crossJoin(F.broadcast(bounds)).select(
        beyond("recency_days", "br", True).alias("r_quartile"),
        beyond("frequency", "bf", False).alias("f_quartile"),
        beyond("monetary_fp", "bm", False).alias("m_quartile"),
        "monetary_fp",
    )
    return scored.groupBy("r_quartile", "f_quartile", "m_quartile").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.sum("monetary_fp") / float(_V_SCALE), 2).alias("segment_value"),
    )


def rfm_kmv_sql(k: int = 256) -> str:
    """DuckDB twin generated from the same ``k`` as
    ``rfm_segments_kmv`` (r7 ADVICE: a hardcoded twin silently
    diverges from a non-default call). ``shards`` is result-invariant
    — the shard tournament only reshapes the plan; the bottom-k of a
    union equals the bottom-k of per-shard bottom-k's — so the twin
    takes no shards parameter."""
    return f"""
WITH per_user AS (
  SELECT user_id,
         date_diff('day', max(ts), TIMESTAMP '2024-02-01') AS recency_days,
         count(*) AS frequency,
         CAST(sum(CAST(round(value * {_V_SCALE}) AS BIGINT)) AS BIGINT)
           AS monetary_fp
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
), samp AS (
  SELECT * FROM per_user
  ORDER BY md5(CAST(user_id AS VARCHAR)), user_id LIMIT {int(k)}
), js AS (SELECT unnest(range(1, 4)) AS j),
br AS (
  SELECT q_b, d_b FROM (
    SELECT recency_days AS q_b, user_id AS d_b,
           row_number() OVER (ORDER BY recency_days ASC, user_id ASC) AS idx,
           count(*) OVER () AS m
    FROM samp
  ) o JOIN js ON o.idx = o.m * js.j // 4
), bf AS (
  SELECT q_b, d_b FROM (
    SELECT frequency AS q_b, user_id AS d_b,
           row_number() OVER (ORDER BY frequency DESC, user_id ASC) AS idx,
           count(*) OVER () AS m
    FROM samp
  ) o JOIN js ON o.idx = o.m * js.j // 4
), bm AS (
  SELECT q_b, d_b FROM (
    SELECT monetary_fp AS q_b, user_id AS d_b,
           row_number() OVER (ORDER BY monetary_fp DESC, user_id ASC) AS idx,
           count(*) OVER () AS m
    FROM samp
  ) o JOIN js ON o.idx = o.m * js.j // 4
), scored AS (
  SELECT CAST(1 + (SELECT count(*) FROM br b
                   WHERE u.recency_days > b.q_b
                      OR (u.recency_days = b.q_b AND u.user_id > b.d_b))
              AS INT) AS r_quartile,
         CAST(1 + (SELECT count(*) FROM bf b
                   WHERE u.frequency < b.q_b
                      OR (u.frequency = b.q_b AND u.user_id > b.d_b))
              AS INT) AS f_quartile,
         CAST(1 + (SELECT count(*) FROM bm b
                   WHERE u.monetary_fp < b.q_b
                      OR (u.monetary_fp = b.q_b AND u.user_id > b.d_b))
              AS INT) AS m_quartile,
         monetary_fp
  FROM per_user u
)
SELECT r_quartile, f_quartile, m_quartile, count(*) AS n_users,
       round(CAST(sum(monetary_fp) AS BIGINT) / {float(_V_SCALE)}, 2)
         AS segment_value
FROM scored GROUP BY r_quartile, f_quartile, m_quartile
"""


RFM_KMV_SQL = rfm_kmv_sql()


RFM_SQL = f"""
WITH per_user AS (
  SELECT user_id,
         date_diff('day', max(ts), TIMESTAMP '2024-02-01') AS recency_days,
         count(*) AS frequency,
         CAST(sum(CAST(round(value * {_V_SCALE}) AS BIGINT)) AS BIGINT)
           AS monetary_fp
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
), scored AS (
  SELECT user_id,
         ntile(4) OVER (ORDER BY recency_days ASC, user_id ASC) AS r_quartile,
         ntile(4) OVER (ORDER BY frequency DESC, user_id ASC) AS f_quartile,
         ntile(4) OVER (ORDER BY monetary_fp DESC, user_id ASC) AS m_quartile,
         monetary_fp
  FROM per_user
)
SELECT r_quartile, f_quartile, m_quartile, count(*) AS n_users,
       round(CAST(sum(monetary_fp) AS BIGINT) / {float(_V_SCALE)}, 2)
         AS segment_value
FROM scored GROUP BY r_quartile, f_quartile, m_quartile
"""


TRANSITION_SQL = """
WITH pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type,
         event_type AS next_type
  FROM events
), counts AS (
  SELECT prev_type, next_type, count(*) AS n_transitions
  FROM pairs WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n_transitions,
       round(n_transitions / CAST(sum(n_transitions)
             OVER (PARTITION BY prev_type) AS BIGINT), 4) AS transition_pct
FROM counts
"""


_TOUCH_TYPES = ("view", "click", "signup")


def revenue_attribution(events: DataFrame) -> DataFrame:
    """First-touch / last-touch revenue attribution — which acquisition
    touchpoint gets credit for each purchase.

    For every ``purchase``, the LAST-touch model credits the most
    recent preceding touch event (view/click/signup) by the same user;
    the FIRST-touch model credits the user's earliest touch at-or-
    before the purchase. Purchases with no preceding touch credit
    ``direct``. Output: one row per (model, touch_type) with purchase
    count and exact attributed revenue.

    Determinism: both credits are IGNORE NULLS window picks over the
    (ts, event_id) total order — no ties possible; revenue sums run on
    fixed-point int64 (the module convention) with one final division,
    so the DuckDB twin matches bit-for-bit.

    Plan: ONE shuffle on ``user_id``; both window picks share the
    partitioning (no re-exchange) and the final rollup's key space is
    |models| x |touch types| — tiny, map-side combined.

    At 100 TB this is the same shape as the funnel: per-user event-time
    scans parallelize across users (high-cardinality key), and no
    state beyond the window frame exists.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type").isin(*_TOUCH_TYPES), F.col("event_type"))
    credited = (
        events.select(
            "user_id",
            "event_type",
            fixedpoint(F.col("value"), _V_SCALE).alias("iv"),
            F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
            F.first(touch, ignorenulls=True).over(w).alias("first_touch"),
        )
        .where(F.col("event_type") == "purchase")
        .select(
            F.coalesce("last_touch", F.lit("direct")).alias("last_touch"),
            F.coalesce("first_touch", F.lit("direct")).alias("first_touch"),
            "iv",
        )
    )
    # single pass: a union of two rollups would re-run the window scan
    # per branch (plan-audited); exploding each purchase into its two
    # (model, touch) credits keeps ONE window exchange + ONE tiny rollup
    exploded = credited.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("last_touch").alias("model"),
                    F.col("last_touch").alias("touch_type"),
                    F.col("iv").alias("iv"),
                ),
                F.struct(
                    F.lit("first_touch").alias("model"),
                    F.col("first_touch").alias("touch_type"),
                    F.col("iv").alias("iv"),
                ),
            )
        ).alias("e")
    ).select("e.model", "e.touch_type", "e.iv")
    return exploded.groupBy("model", "touch_type").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(F.sum("iv") / _V_SCALE, 2).alias("revenue"),
    )


ATTRIBUTION_SQL = f"""
WITH credited AS (
  SELECT event_type,
         CAST(round(value * {_V_SCALE}) AS BIGINT) AS iv,
         last_value(CASE WHEN event_type IN {_TOUCH_TYPES} THEN event_type END
                    IGNORE NULLS) OVER w AS last_touch,
         first_value(CASE WHEN event_type IN {_TOUCH_TYPES} THEN event_type END
                     IGNORE NULLS) OVER w AS first_touch
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), purchases AS (
  SELECT coalesce(last_touch, 'direct') AS last_touch,
         coalesce(first_touch, 'direct') AS first_touch, iv
  FROM credited WHERE event_type = 'purchase'
)
SELECT 'last_touch' AS model, last_touch AS touch_type,
       count(*) AS n_purchases,
       round(CAST(sum(iv) AS BIGINT) / {_V_SCALE}, 2) AS revenue
FROM purchases GROUP BY last_touch
UNION ALL
SELECT 'first_touch', first_touch, count(*),
       round(CAST(sum(iv) AS BIGINT) / {_V_SCALE}, 2)
FROM purchases GROUP BY first_touch
"""


def mad_outliers(events: DataFrame) -> DataFrame:
    """Robust anomaly rollup via Median Absolute Deviation — the
    heavy-tail-safe complement to ``rolling_zscore_outliers``: mean/std
    are themselves dragged by outliers, while median/MAD are not
    (50% breakdown point), so MAD flags what z-scores mask when the
    contamination is heavy.

    Integer-exact end to end: values live on the fixed-point grid, and
    both location (median) and scale (MAD) use the LOWER-median order
    statistic (rank ⌈n/2⌉) — a selection, not an average — so every
    intermediate is an int64 and the flag rule |x − med| > 3·MAD
    compares integers. The DuckDB twin replicates the same order
    statistic; only the two display divisions produce doubles.

    Plan (the r6 "weak" fix, selection.py): both medians come from
    exact histogram-refinement selection — a (event_type, bucket)
    count aggregate, a bucket-table window, a one-bucket refine — so
    no partition sorts a full event_type's rows. A median is the case
    where the prescribed bottom-k shard merge degenerates COMPLETELY
    (rank ≈ n/2 means every shard's bottom-k is its whole lower half);
    counting-based selection is the shard-mergeable decomposition that
    works at every rank — the map-side partial counts ARE the
    shard-local stage, with additive merge. Medians broadcast back;
    one rollup.
    """
    iv = fixedpoint(F.col("value"), _V_SCALE)
    base = events.select("event_type", iv.alias("iv"))

    def lower_median(df: DataFrame, col: str, out: str) -> DataFrame:
        totals = df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
        ranks = totals.select(
            "event_type",
            F.lit(out).alias("sel"),
            F.expr("(n + 1) DIV 2").alias("r"),
        )
        return grid_rank_select(df, "event_type", col, ranks, _GRID_BUCKET).select(
            "event_type", F.col("value").alias(out)
        )

    med = lower_median(base, "iv", "med")
    dev = base.join(F.broadcast(med.select("event_type", "med")), "event_type").select(
        "event_type", F.abs(F.col("iv") - F.col("med")).alias("d")
    )
    mad = lower_median(dev, "d", "mad").select("event_type", "mad")
    flagged = (
        base.join(F.broadcast(med.select("event_type", "med")), "event_type")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.max("med") / _V_SCALE, 2).alias("median_value"),
            F.round(F.max("mad") / _V_SCALE, 2).alias("mad_value"),
            F.sum(
                (F.abs(F.col("iv") - F.col("med")) > 3 * F.col("mad")).cast("long")
            ).alias("n_outliers"),
        )
        .select(
            "event_type",
            "n",
            "median_value",
            "mad_value",
            "n_outliers",
            F.round(F.col("n_outliers") / F.col("n"), 4).alias("outlier_pct"),
        )
    )
    return flagged


MAD_OUTLIERS_SQL = f"""
WITH base AS (
  SELECT event_type, CAST(round(value * {_V_SCALE}) AS BIGINT) AS iv FROM events
), med AS (
  SELECT event_type, iv AS med FROM (
    SELECT event_type, iv,
           row_number() OVER (PARTITION BY event_type ORDER BY iv) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM base
  ) WHERE rn = (n + 1) // 2
), dev AS (
  SELECT b.event_type, abs(b.iv - m.med) AS d
  FROM base b JOIN med m ON m.event_type = b.event_type
), mad AS (
  SELECT event_type, d AS mad FROM (
    SELECT event_type, d,
           row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM dev
  ) WHERE rn = (n + 1) // 2
)
SELECT b.event_type, count(*) AS n,
       round(CAST(max(m.med) AS BIGINT) / {_V_SCALE}, 2) AS median_value,
       round(CAST(max(x.mad) AS BIGINT) / {_V_SCALE}, 2) AS mad_value,
       CAST(sum(CASE WHEN abs(b.iv - m.med) > 3 * x.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       round(CAST(sum(CASE WHEN abs(b.iv - m.med) > 3 * x.mad THEN 1 ELSE 0 END)
                  AS BIGINT) / count(*), 4) AS outlier_pct
FROM base b
JOIN med m ON m.event_type = b.event_type
JOIN mad x ON x.event_type = b.event_type
GROUP BY b.event_type
"""


def cumulative_distinct_users(events: DataFrame) -> DataFrame:
    """Cumulative distinct users per day — the first-touch transform.

    The naive formulation is ``COUNT(DISTINCT user_id) OVER (ORDER BY
    day ROWS UNBOUNDED PRECEDING)``, which Spark (correctly) refuses:
    a distinct over a growing frame keeps O(users) state per frame and
    is O(days x users) work. The scale-correct rewrite is EXACT and
    linear: a user contributes to the cumulative count on exactly one
    day — their first — so (1) reduce events to per-user first days
    (one user_id shuffle with map-side partial min), (2) count first
    days per day (a days-cardinality rollup), (3) running-sum those
    new-user counts over the day axis. The only unpartitioned window
    runs over #days rows (~36.5k rows for a century of days), so the
    single-partition sort is a non-issue at any corpus scale.

    ``daily_active`` (plain per-day distinct) rides along for the
    new-vs-returning read; Spark partial-aggregates it per user
    map-side before the day rollup.
    """
    firsts = events.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("day"))
    new_per_day = firsts.groupBy("day").agg(F.count(F.lit(1)).alias("new_users"))
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.countDistinct("user_id").alias("daily_active")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.join(new_per_day, "day", "left")
        .na.fill({"new_users": 0})
        .select(
            "day",
            "daily_active",
            "new_users",
            F.sum("new_users").over(w).alias("cumulative_users"),
        )
    )


CUMULATIVE_DISTINCT_USERS_SQL = """
WITH firsts AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY user_id
), new_per_day AS (
  SELECT day, count(*) AS new_users FROM firsts GROUP BY day
), daily AS (
  SELECT CAST(ts AS DATE) AS day, count(DISTINCT user_id) AS daily_active
  FROM events GROUP BY 1
)
SELECT d.day, d.daily_active,
       coalesce(n.new_users, 0) AS new_users,
       CAST(sum(coalesce(n.new_users, 0)) OVER (
         ORDER BY d.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS cumulative_users
FROM daily d LEFT JOIN new_per_day n ON n.day = d.day
"""


_US_PER_DAY = 86_400_000_000


def session_concurrency(
    events: DataFrame, gap_minutes: int = _SESSION_GAP_MIN
) -> DataFrame:
    """Peak concurrent sessions per day — interval analytics WITHOUT an
    interval self-join.

    The naive formulation joins sessions on ``a.start <= b.end AND
    b.start <= a.end`` — O(n²) pairs the moment intervals cluster
    (they always do: that is what "peak" means). The scale shape is the
    classic sweep-line made distributed: (1) sessionize (the 30-min
    gap recurrence — one user_id exchange shared with the rest of the
    session family), (2) CLIP each session interval to day boundaries
    (explode over spanned days — sessions are minutes long, so the
    fan-out is ~1), (3) emit +1/−1 boundary deltas, (4) running-sum
    per DAY partition and take the max. The sweep sort is partitioned
    by day — no global sort exists, each day sorts 2x(its sessions)
    boundary rows, and day count grows with time, not corpus size.

    Tie rule: boundaries sort (t ASC, delta DESC) — a session starting
    exactly when another ends counts as overlapping (closed
    intervals). The day peak is invariant to the remaining tie freedom
    (order among equal (t, delta) rows shifts which +1 row carries the
    prefix max, never its value).

    All arithmetic on epoch-microsecond int64; only the output day is
    rendered as a date.
    """
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    sess = (
        events.withColumn("us", us)
        .withColumn(
            "new_session",
            F.when(
                F.col("us") - F.lag("us").over(by_user) > F.lit(gap_us), 1
            ).otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("new_session").over(
                by_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "session_id")
        .agg(F.min("us").alias("s"), F.max("us").alias("e"))
    )
    day = lambda c: F.expr(f"{c} DIV {_US_PER_DAY}")  # noqa: E731  int div, never /
    segs = (
        sess.select(
            "s", "e", F.explode(F.sequence(day("s"), day("e"))).alias("d")
        )
        .select(
            "d",
            F.greatest(F.col("s"), F.col("d") * _US_PER_DAY).alias("seg_s"),
            F.least(F.col("e"), (F.col("d") + 1) * _US_PER_DAY - 1).alias("seg_e"),
        )
    )
    bounds = segs.select(
        "d", F.col("seg_s").alias("t"), F.lit(1).alias("delta")
    ).unionAll(segs.select("d", F.col("seg_e").alias("t"), F.lit(-1).alias("delta")))
    sweep = Window.partitionBy("d").orderBy(F.col("t").asc(), F.col("delta").desc())
    running = bounds.withColumn(
        "running",
        F.sum("delta").over(sweep.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        running.groupBy("d")
        .agg(
            F.max("running").alias("peak_concurrent"),
            F.expr("count(1) DIV 2").alias("n_active_sessions"),
        )
        .select(
            F.date_add(F.lit("1970-01-01").cast("date"), F.col("d").cast("int")).alias(
                "day"
            ),
            "n_active_sessions",
            "peak_concurrent",
        )
    )


SESSION_CONCURRENCY_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
               > {_SESSION_GAP_MIN * 60 * 1_000_000} THEN 1 ELSE 0 END AS ns
  FROM events
), sess_rows AS (
  SELECT user_id, us, sum(ns) OVER (
    PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING
  ) AS session_id
  FROM flagged
), sess AS (
  SELECT user_id, session_id, min(us) AS s, max(us) AS e
  FROM sess_rows GROUP BY user_id, session_id
), spanned AS (
  SELECT unnest(generate_series(s // {_US_PER_DAY}, e // {_US_PER_DAY})) AS d, s, e
  FROM sess
), segs AS (
  SELECT d, greatest(s, d * {_US_PER_DAY}) AS seg_s,
         least(e, (d + 1) * {_US_PER_DAY} - 1) AS seg_e
  FROM spanned
), bounds AS (
  SELECT d, seg_s AS t, 1 AS delta FROM segs
  UNION ALL
  SELECT d, seg_e, -1 FROM segs
), running AS (
  SELECT d, sum(delta) OVER (
    PARTITION BY d ORDER BY t ASC, delta DESC ROWS UNBOUNDED PRECEDING
  ) AS running
  FROM bounds
)
SELECT DATE '1970-01-01' + CAST(d AS INT) AS day,
       CAST(count(*) // 2 AS BIGINT) AS n_active_sessions,
       CAST(max(running) AS BIGINT) AS peak_concurrent
FROM running GROUP BY d
"""


_SEQ_CODES = (
    ("signup", "s"),
    ("view", "v"),
    ("click", "c"),
    ("purchase", "p"),
    ("error", "e"),
)
# portable regex subset: RE2 (DuckDB) ∩ java.util.regex (Spark) — char
# classes + greedy quantifiers + anchors only, no lookaround/backrefs
_SEQ_PATTERNS = (
    ("view_click_purchase", "v[^e]*c[^e]*p"),
    ("purchase_after_error", "e[^p]*p"),
    ("single_view_bounce", "^v$"),
    ("signup_then_purchase", "s.*p"),
    ("repeat_purchaser", "p.*p"),
)


def event_sequence_match(events: DataFrame) -> DataFrame:
    """Row-pattern matching over per-user event sequences — the
    MATCH_RECOGNIZE / Flink-CEP capability, re-expressed Spark-first:
    instead of an NFA operator walking a sorted stream, encode each
    user's ordered history as a compact symbol string ONCE (one
    user_id shuffle: sort_array over (ts, event_id, symbol) structs,
    then concat — deterministic total order, no window needed) and
    evaluate every pattern as a regex over that string (row-local,
    JVM-side rlike, zero additional exchange for any number of
    patterns).

    Scale: state per user is the event-initial string (1 byte/event)
    — the same order as any CEP engine's per-key buffer; adding a
    pattern costs one more regex pass over in-memory strings, not a
    shuffle. A pathological mega-user bounds at its event count, and
    the symbol alphabet keeps strings compressible. The regex subset
    is RE2∩Java so the DuckDB oracle evaluates the IDENTICAL patterns
    over the identically-ordered strings.
    """
    code = F.col("event_type")
    for name, ch in _SEQ_CODES:
        code = F.when(F.col("event_type") == name, F.lit(ch)).otherwise(code)
    seqs = (
        events.select(
            "user_id",
            F.struct(
                F.col("ts").alias("ts"),
                F.col("event_id").alias("event_id"),
                code.alias("ch"),
            ).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                "", F.transform(F.array_sort(F.collect_list("s")), lambda s: s["ch"])
            ).alias("seq")
        )
    )
    matches = [
        F.sum(F.col("seq").rlike(regex).cast("long")).alias(f"_m{i}")
        for i, (_, regex) in enumerate(_SEQ_PATTERNS)
    ]
    row = seqs.agg(F.count(F.lit(1)).alias("_n"), *matches)
    structs = [
        F.struct(
            F.lit(name).alias("pattern"),
            F.col(f"_m{i}").alias("n_users_matched"),
            F.col("_n").alias("n_users_total"),
            F.round(F.col(f"_m{i}") / F.col("_n"), 4).alias("match_pct"),
        )
        for i, (name, _) in enumerate(_SEQ_PATTERNS)
    ]
    return row.select(F.explode(F.array(*structs)).alias("r")).select("r.*")


EVENT_SEQUENCE_MATCH_SQL = """
WITH seqs AS (
  SELECT user_id,
         string_agg(CASE event_type WHEN 'signup' THEN 's' WHEN 'view' THEN 'v'
                    WHEN 'click' THEN 'c' WHEN 'purchase' THEN 'p'
                    WHEN 'error' THEN 'e' ELSE event_type END,
                    '' ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id
), agg AS (
  SELECT count(*) AS n,
         CAST(sum(CASE WHEN regexp_matches(seq, 'v[^e]*c[^e]*p') THEN 1 ELSE 0 END) AS BIGINT) AS m0,
         CAST(sum(CASE WHEN regexp_matches(seq, 'e[^p]*p') THEN 1 ELSE 0 END) AS BIGINT) AS m1,
         CAST(sum(CASE WHEN regexp_matches(seq, '^v$') THEN 1 ELSE 0 END) AS BIGINT) AS m2,
         CAST(sum(CASE WHEN regexp_matches(seq, 's.*p') THEN 1 ELSE 0 END) AS BIGINT) AS m3,
         CAST(sum(CASE WHEN regexp_matches(seq, 'p.*p') THEN 1 ELSE 0 END) AS BIGINT) AS m4
  FROM seqs
)
SELECT 'view_click_purchase' AS pattern, m0 AS n_users_matched,
       n AS n_users_total, round(m0 / n, 4) AS match_pct FROM agg
UNION ALL
SELECT 'purchase_after_error', m1, n, round(m1 / n, 4) FROM agg
UNION ALL
SELECT 'single_view_bounce', m2, n, round(m2 / n, 4) FROM agg
UNION ALL
SELECT 'signup_then_purchase', m3, n, round(m3 / n, 4) FROM agg
UNION ALL
SELECT 'repeat_purchaser', m4, n, round(m4 / n, 4) FROM agg
"""


_WINSOR_PCT = 5


def winsorize_stats(events: DataFrame, pct: int = _WINSOR_PCT) -> DataFrame:
    """Winsorization — the robust feature-prep step before training on
    heavy-tailed values: clamp each event_type's values at its exact
    p05/p95 order statistics and report how much mass moved. Clipping
    at a GLOBAL percentile repeats the adaptive-quality-gate mistake
    (one hot type's tail sets every type's cut), so the cuts are
    per-group rank selections.

    Integer-exact: values on the fixed-point grid, cut ranks are the
    closed-form lo = max(1, n·p DIV 100) and its mirror
    hi = n + 1 − lo (selection, not interpolation — the oracle
    reproduces the exact same ranks), clip counts are integer
    comparisons, and both means come from int64 sums with one display
    division each.

    Plan (the r6 "weak" fix, selection.py): the p05/p95 order
    statistics come from exact histogram-refinement selection — a
    (event_type, value-bucket) count aggregate, a bucket-table window,
    and a one-bucket refine — so NO partition ever sorts a full
    event_type's rows (the old plan's single per-type row_number sort;
    the prescribed bottom-k shard merge would still funnel 2·p·S of
    the rows into one merge partition — see selection.py's degeneracy
    note). Cuts broadcast back; one rollup. The lo and hi cuts are
    selected INDEPENDENTLY, so the degenerate n=1 group (lo_rank ==
    hi_rank) yields lo == hi == the value, exactly as the SQL twin's
    two independent CASEs do.
    """
    iv = fixedpoint(F.col("value"), _V_SCALE)
    base = events.select("event_type", iv.alias("iv"))
    totals = base.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    lo_rank = F.expr(f"greatest(1, n * {pct} DIV 100)")
    ranks = totals.select(
        "event_type", F.lit("lo").alias("sel"), lo_rank.alias("r")
    ).unionByName(
        totals.select(
            "event_type",
            F.lit("hi").alias("sel"),
            (F.col("n") + 1 - lo_rank).alias("r"),
        )
    )
    sel = grid_rank_select(base, "event_type", "iv", ranks, _GRID_BUCKET)
    cuts = sel.groupBy("event_type").agg(
        F.max(F.when(F.col("sel") == "lo", F.col("value"))).alias("lo"),
        F.max(F.when(F.col("sel") == "hi", F.col("value"))).alias("hi"),
    )
    clipped = base.join(F.broadcast(cuts), "event_type").select(
        "event_type",
        "iv",
        "lo",
        "hi",
        F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("iv"))).alias("cv"),
    )
    return clipped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.max("lo") / _V_SCALE, 2).alias("lo_cut"),
        F.round(F.max("hi") / _V_SCALE, 2).alias("hi_cut"),
        F.sum((F.col("iv") < F.col("lo")).cast("long")).alias("n_clipped_lo"),
        F.sum((F.col("iv") > F.col("hi")).cast("long")).alias("n_clipped_hi"),
        F.round(F.sum("iv") / F.count(F.lit(1)) / _V_SCALE, 4).alias("mean_before"),
        F.round(F.sum("cv") / F.count(F.lit(1)) / _V_SCALE, 4).alias("mean_after"),
    )


WINSORIZE_STATS_SQL = f"""
WITH ranked AS (
  SELECT event_type,
         CAST(round(value * {_V_SCALE}) AS BIGINT) AS iv,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY CAST(round(value * {_V_SCALE}) AS BIGINT),
                                     event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
), cuts AS (
  SELECT event_type,
         max(CASE WHEN rn = greatest(1, n * {_WINSOR_PCT} // 100)
                  THEN iv END) AS lo,
         max(CASE WHEN rn = n + 1 - greatest(1, n * {_WINSOR_PCT} // 100)
                  THEN iv END) AS hi
  FROM ranked GROUP BY event_type
), clipped AS (
  SELECT r.event_type, r.iv, c.lo, c.hi,
         greatest(c.lo, least(c.hi, r.iv)) AS cv
  FROM ranked r JOIN cuts c ON c.event_type = r.event_type
)
SELECT event_type, count(*) AS n,
       round(CAST(max(lo) AS BIGINT) / {_V_SCALE}, 2) AS lo_cut,
       round(CAST(max(hi) AS BIGINT) / {_V_SCALE}, 2) AS hi_cut,
       CAST(sum(CASE WHEN iv < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_lo,
       CAST(sum(CASE WHEN iv > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_hi,
       round(CAST(sum(iv) AS BIGINT) / count(*) / {_V_SCALE}, 4) AS mean_before,
       round(CAST(sum(cv) AS BIGINT) / count(*) / {_V_SCALE}, 4) AS mean_after
FROM clipped GROUP BY event_type
"""


def value_trend_regression(events: DataFrame) -> DataFrame:
    """Per-type least-squares trend (value vs day) from EXACT integer
    normal equations — drift detection ("is purchase value declining?")
    as one aggregation, no ML library, no iteration.

    x = days since the fixture epoch (≤ thousands — rebasing x to days
    is what keeps every moment in int64: with x in epoch-µs, Σx² blows
    past 2⁶³ immediately), y = fixed-point value. One scan collects
    the five sufficient statistics (n, Σx, Σy, Σxy, Σx²[, Σy²]) with
    map-side partials; slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) and r²
    derive in closed form — the only doubles are the display
    divisions (and the two explicit casts in r², both mirrored in the
    oracle). Fixture-scale headroom is ~10⁴×; at 100 TB row counts
    the numerators need DECIMAL(38) or per-shard moment merge (the
    KMV shard pattern) — noted, not silently wrong.

    Scale: this is the cheapest possible shape — a (type, day) moment
    granule (map-combined, grid-bounded) folded into 6 integer partial
    aggregates; no window, no join, no sort. r9: delegates to the
    shared granule form so the streaming daily-moment store can serve
    the identical statistic (``value_trend_from_store``).
    """
    return value_trend_from_daily_moments(daily_value_moments(events))


VALUE_TREND_REGRESSION_SQL = f"""
WITH base AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS x,
         CAST(round(value * {_V_SCALE}) AS BIGINT) AS y
  FROM events
), agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM base GROUP BY event_type
)
SELECT event_type, n,
       CASE WHEN n * sxx - sx * sx <> 0 THEN
         round((n * sxy - sx * sy) / (n * sxx - sx * sx) / {_V_SCALE}, 6)
       END AS slope_per_day,
       CASE WHEN n * sxx - sx * sx <> 0 THEN
         round((sy * sxx - sx * sxy) / (n * sxx - sx * sx) / {_V_SCALE}, 4)
       END AS intercept,
       CASE WHEN n * sxx - sx * sx <> 0 AND n * syy - sy * sy <> 0 THEN
         round((CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE))
               / (CAST(n * sxx - sx * sx AS DOUBLE)
                  * CAST(n * syy - sy * sy AS DOUBLE)), 4)
       END AS r2
FROM agg
"""


def rolling_active_users(events: DataFrame) -> DataFrame:
    """Exact DAU / WAU(7) / MAU(28) per day — THE product-analytics
    headline series, computed the way exact sliding distinct actually
    scales: reduce to DISTINCT (user, day) pairs first (one shuffle,
    map-side combinable — the fan-in that makes everything after
    cheap), then each pair CONTRIBUTES ITSELF FORWARD to every day
    whose trailing window covers it (explode of a ≤28-day sequence)
    and each target day counts distinct users once per window width.

    No window function exists here at all: COUNT(DISTINCT) OVER a
    RANGE frame is the quadratic trap (per-frame distinct state);
    the contribution explode is linear ×W on the deduped pair set,
    and the per-day distinct is one aggregation. The approximate
    sibling at extreme scale is the HLL granule rollup
    (``hll_distinct_rollup``) — this is the exact twin. Day axis is
    clipped to the observed range so leading days have honest
    partial-window values (stated, not hidden).
    """
    pairs = events.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    bounds = pairs.agg(
        F.min("day").alias("min_day"), F.max("day").alias("max_day")
    )
    widths = [("dau", 1), ("wau", 7), ("mau", 28)]
    contrib = (
        pairs.crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(name).alias("w"),
                            F.sequence(
                                F.col("day"),
                                F.least(
                                    F.date_add(F.col("day"), width - 1),
                                    F.col("max_day"),
                                ),
                            ).alias("targets"),
                        )
                        for name, width in widths
                    ]
                )
            ).alias("e"),
        )
        .select("user_id", F.col("e.w").alias("w"), F.explode("e.targets").alias("day"))
    )
    counts = contrib.groupBy("day", "w").agg(
        F.countDistinct("user_id").alias("c")
    )
    return (
        counts.groupBy("day")
        .pivot("w", ["dau", "wau", "mau"])
        .agg(F.max("c"))
        .select("day", "dau", "wau", "mau")
    )


ROLLING_ACTIVE_USERS_SQL = """
WITH pairs AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), bounds AS (
  SELECT max(day) AS max_day FROM pairs
), contrib AS (
  SELECT user_id, 'dau' AS w, day FROM pairs
  UNION ALL
  SELECT user_id, 'wau',
         unnest(generate_series(day, least(day + 6, (SELECT max_day FROM bounds)),
                                INTERVAL 1 DAY))::DATE
  FROM pairs
  UNION ALL
  SELECT user_id, 'mau',
         unnest(generate_series(day, least(day + 27, (SELECT max_day FROM bounds)),
                                INTERVAL 1 DAY))::DATE
  FROM pairs
), counts AS (
  SELECT day, w, count(DISTINCT user_id) AS c FROM contrib GROUP BY day, w
)
SELECT day,
       max(CASE WHEN w = 'dau' THEN c END) AS dau,
       max(CASE WHEN w = 'wau' THEN c END) AS wau,
       max(CASE WHEN w = 'mau' THEN c END) AS mau
FROM counts GROUP BY day
"""


def event_type_cooccurrence(events: DataFrame) -> DataFrame:
    """Behavioral co-occurrence with lift — association mining over the
    event stream ("users who purchase also refund?"): for every
    unordered event-type pair, how many users exhibit both, against the
    independence baseline lift = n_both·n_users / (n_a·n_b).

    Plan: dedupe to distinct (user, type) once (ONE shuffle on
    user_id; per-user type sets are tiny — at most |vocabulary|), then
    a user-keyed self-join whose fan-out is bounded by
    (types-per-user choose 2) — never a cross of the raw stream — and
    a rollup on the pair space (|vocab|² at most, trivially
    broadcast-scale). All counts integer; lift is one int/int→double
    division each engine performs identically, rounded at 4dp.
    """
    ut = events.select("user_id", "event_type").distinct()
    tot = events.agg(F.countDistinct("user_id").alias("n_users"))
    per_type = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    a = ut.alias("a")
    b = ut.alias("b")
    pairs = (
        a.join(b, "user_id")
        .where(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    return (
        pairs.join(
            F.broadcast(per_type.withColumnRenamed("event_type", "type_a")), "type_a"
        )
        .withColumnRenamed("n_t", "n_a")
        .join(
            F.broadcast(per_type.withColumnRenamed("event_type", "type_b")), "type_b"
        )
        .withColumnRenamed("n_t", "n_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            F.round(
                F.col("n_both") * F.col("n_users") / (F.col("n_a") * F.col("n_b")), 4
            ).alias("lift"),
        )
    )


EVENT_COOCCURRENCE_SQL = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
tot AS (SELECT count(DISTINCT user_id) AS n_users FROM events),
per_type AS (SELECT event_type, count(*) AS n_t FROM ut GROUP BY event_type),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*) AS n_both
  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT p.type_a, p.type_b, CAST(p.n_both AS BIGINT) AS n_both,
       CAST(x.n_t AS BIGINT) AS n_a, CAST(y.n_t AS BIGINT) AS n_b,
       round(p.n_both * t.n_users / (x.n_t * y.n_t), 4) AS lift
FROM pairs p
JOIN per_type x ON x.event_type = p.type_a
JOIN per_type y ON y.event_type = p.type_b
CROSS JOIN tot t
"""


_CUSUM_SHARDS = 8
_CUSUM_H = 40 * _V_SCALE  # alarm threshold, fixed-point units


def cusum_changepoints(events: DataFrame, shards: int = _CUSUM_SHARDS) -> DataFrame:
    """One-sided CUSUM change detection per event type — the classic
    drift alarm (Page 1954): alarm when the cumulative excess of value
    over a reference level exceeds a threshold. Complements the
    z-score family (point anomalies) and value-trend (global slope)
    with SUSTAINED-shift detection.

    The recurrence S_t = max(0, S_{t-1} + y_t) looks per-row
    sequential, but its closed form is windowable: with prefix sums
    P_t over y and P_0 = 0, S_t = P_t − min(0, min_{j≤t} P_j) — one
    running sum and one running min over the same ordered window, so
    the whole detector is two window expressions both engines compute
    identically in int64.

    Reference level = the type's exact p90 order statistic from the
    histogram-refinement selection engine (selection.py — no
    sort-by-key pass), broadcast back: with right-skewed values the
    in-control drift E[x − ref] must be negative or the statistic
    ramps and every row alarms (a median reference does exactly that
    on this corpus; p90 keeps alarms at the sustained-excursion
    tail). Streams are sub-keyed by
    (event_type, user_id % shards), the z-score family's entity-shard
    convention: a per-shard alarm is statistically interchangeable
    with the global one under hash-spread traffic, and no window
    partition ever sorts more than ~1/shards of a type. All
    arithmetic int64 until the display divisions, so the DuckDB twin
    (identical windows, identical median rank) matches bit-for-bit.
    """
    iv = fixedpoint(F.col("value"), _V_SCALE)
    # `%` (not pmod): semantic shard, must match the twin's
    # `user_id % shards` on negative ids — see zscore_outliers.
    base = events.select(
        "event_type",
        F.expr(f"user_id % {int(shards)}").alias("shard"),
        "ts",
        "event_id",
        iv.alias("iv"),
    )
    totals = base.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    ranks = totals.select(
        "event_type",
        F.lit("ref").alias("sel"),
        F.expr("(n * 90 + 99) DIV 100").alias("r"),
    )
    ref = grid_rank_select(
        base.select("event_type", "iv"), "event_type", "iv", ranks, _GRID_BUCKET
    ).select("event_type", F.col("value").alias("ref"))
    w = Window.partitionBy("event_type", "shard").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    scored = (
        base.join(F.broadcast(ref), "event_type")
        .withColumn("y", F.col("iv") - F.col("ref"))
        .withColumn("p", F.sum("y").over(run))
        .withColumn("s", F.col("p") - F.least(F.lit(0), F.min("p").over(run)))
    )
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.max("ref") / _V_SCALE, 2).alias("ref_level"),
        F.sum((F.col("s") > _CUSUM_H).cast("long")).alias("n_alarm_rows"),
        F.round(F.max("s") / _V_SCALE, 2).alias("max_cusum"),
    )


CUSUM_SQL = f"""
WITH base AS (
  SELECT event_type, user_id % {_CUSUM_SHARDS} AS shard, ts, event_id,
         CAST(round(value * {_V_SCALE}) AS BIGINT) AS iv
  FROM events
), med AS (
  SELECT event_type, iv AS med FROM (
    SELECT event_type, iv,
           row_number() OVER (PARTITION BY event_type ORDER BY iv) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM base
  ) WHERE rn = (n * 90 + 99) // 100
), pre AS (
  SELECT b.event_type, b.shard, b.ts, b.event_id, m.med,
         sum(b.iv - m.med) OVER (PARTITION BY b.event_type, b.shard
                                 ORDER BY b.ts, b.event_id
                                 ROWS UNBOUNDED PRECEDING) AS p
  FROM base b JOIN med m USING (event_type)
), scored AS (
  SELECT event_type, med,
         p - least(0, min(p) OVER (PARTITION BY event_type, shard
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING)) AS s
  FROM pre
)
SELECT event_type, count(*) AS n,
       round(CAST(max(med) AS BIGINT) / {_V_SCALE}, 2) AS ref_level,
       CAST(sum(CASE WHEN s > {_CUSUM_H} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_alarm_rows,
       round(CAST(max(s) AS BIGINT) / {_V_SCALE}, 2) AS max_cusum
FROM scored GROUP BY event_type
"""


def funnel_time_to_convert(
    events: DataFrame, stages: tuple[str, str, str] = ("view", "click", "purchase")
) -> DataFrame:
    """Time-through-funnel percentiles — the product-metrics companion
    to ``funnel_conversion``: for users who complete the ordered
    chain, how long did first-touch → final stage take (p50/p90 and
    mean minutes)?

    Latency is exact int64 end to end: epoch-microsecond difference,
    truncating division to minutes (identical Spark DIV / DuckDB //),
    and the percentiles are nearest-rank order statistics from the
    histogram-refinement selection engine (selection.py) over the
    converted-user latencies — no global sort even when every user
    converts. One user_id shuffle for the stage chain (the funnel's
    own plan), one map-combinable latency-bucket count, one one-bucket
    refine.
    """
    s1, s2, s3 = stages
    w = Window.partitionBy("user_id")
    ts, et = F.col("ts"), F.col("event_type")
    chain = (
        events.withColumn("t1", F.min(F.when(et == s1, ts)).over(w))
        .withColumn("t2", F.min(F.when((et == s2) & (ts >= F.col("t1")), ts)).over(w))
        .withColumn("t3", F.min(F.when((et == s3) & (ts >= F.col("t2")), ts)).over(w))
    )
    lat = (
        chain.groupBy("user_id")
        .agg(F.max("t1").alias("t1"), F.max("t3").alias("t3"))
        .where(F.col("t3").isNotNull())
        .select(
            F.lit("funnel").alias("g"),
            # ts loads as TIMESTAMP_NTZ; the cast to TIMESTAMP applies
            # the session TZ (UTC) to both endpoints, so the DIFFERENCE
            # is TZ-invariant and micro-exact
            F.expr(
                "(unix_micros(cast(t3 as timestamp))"
                " - unix_micros(cast(t1 as timestamp))) DIV 60000000"
            ).alias("lat_min"),
        )
    )
    totals = lat.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"), F.sum("lat_min").alias("s")
    )
    ranks = None
    for p in (50, 90):
        r = totals.select(
            "g", F.lit(f"p{p}").alias("sel"), F.expr(f"(n * {p} + 99) DIV 100").alias("r")
        )
        ranks = r if ranks is None else ranks.unionByName(r)
    sel = grid_rank_select(lat, "g", "lat_min", ranks, 1024)
    pcts = sel.groupBy("g").agg(
        F.max(F.when(F.col("sel") == "p50", F.col("value"))).alias("p50_minutes"),
        F.max(F.when(F.col("sel") == "p90", F.col("value"))).alias("p90_minutes"),
    )
    return totals.join(pcts, "g").select(
        F.col("n").alias("n_converted"),
        "p50_minutes",
        "p90_minutes",
        F.round(F.col("s") / F.col("n"), 4).alias("mean_minutes"),
    )


FUNNEL_TIME_SQL = """
WITH chain AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS t1,
         ts, event_type
  FROM events
), chain2 AS (
  SELECT user_id, t1,
         min(CASE WHEN event_type = 'click' AND ts >= t1 THEN ts END)
           OVER (PARTITION BY user_id) AS t2,
         ts, event_type
  FROM chain
), chain3 AS (
  SELECT user_id, t1,
         min(CASE WHEN event_type = 'purchase' AND ts >= t2 THEN ts END)
           OVER (PARTITION BY user_id) AS t3
  FROM chain2
), lat AS (
  SELECT CAST((epoch_us(t3) - epoch_us(t1)) // 60000000 AS BIGINT) AS lat_min
  FROM (SELECT user_id, max(t1) AS t1, max(t3) AS t3 FROM chain3 GROUP BY user_id)
  WHERE t3 IS NOT NULL
), ranked AS (
  SELECT lat_min, row_number() OVER (ORDER BY lat_min) AS rn,
         count(*) OVER () AS n, sum(lat_min) OVER () AS s
  FROM lat
)
SELECT max(n) AS n_converted,
       max(CASE WHEN rn = (n * 50 + 99) // 100 THEN lat_min END) AS p50_minutes,
       max(CASE WHEN rn = (n * 90 + 99) // 100 THEN lat_min END) AS p90_minutes,
       round(CAST(max(s) AS BIGINT) / max(n), 4) AS mean_minutes
FROM ranked
"""


def interarrival_percentiles(events: DataFrame) -> DataFrame:
    """Exact p50/p90/p99 of the inter-arrival gap (seconds) between a
    user's consecutive events of the same type — the traffic-model /
    staleness-SLO statistic behind polling-cadence choices (the
    reference's only cadence knob is a fixed sleep,
    /root/reference/app/hs_contacts.py:139-147; this measures what the
    cadence SHOULD be per entity type).

    Gaps are exact int64 end to end: epoch-microsecond difference,
    truncating division to whole seconds (Spark DIV == DuckDB //),
    deterministic ordering by (ts, event_id). Percentiles are
    nearest-rank order statistics from the histogram-refinement
    selection engine (selection.py) — the lag window partitions on
    (user_id, event_type), a user-grain key that scales out, and no
    per-type sort of raw gaps exists anywhere.
    """
    us = F.expr("unix_micros(cast(ts as timestamp))")
    seq = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = (
        events.select("user_id", "event_type", "ts", "event_id", us.alias("us"))
        .withColumn("prev_us", F.lag("us").over(seq))
        .where(F.col("prev_us").isNotNull())
        .select(
            "event_type",
            F.expr("(us - prev_us) DIV 1000000").alias("gap_s"),
        )
    )
    from kinesis_dstream_spark.operators.selection import grid_rank_select

    totals = gaps.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_gaps"))
    ranks = None
    for p in (50, 90, 99):
        r = totals.select(
            "event_type",
            F.lit(f"p{p}").alias("sel"),
            F.expr(f"(n_gaps * {p} + 99) DIV 100").alias("r"),
        )
        ranks = r if ranks is None else ranks.unionByName(r)
    sel = grid_rank_select(gaps, "event_type", "gap_s", ranks, _GRID_BUCKET)
    pcts = sel.groupBy("event_type").agg(
        *[
            F.max(F.when(F.col("sel") == f"p{p}", F.col("value"))).alias(
                f"p{p}_s"
            )
            for p in (50, 90, 99)
        ]
    )
    return totals.join(pcts, "event_type").select(
        "event_type", "n_gaps", "p50_s", "p90_s", "p99_s"
    )


INTERARRIVAL_SQL = """
WITH gaps AS (
  SELECT event_type,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER (
            PARTITION BY user_id, event_type ORDER BY ts, event_id
          )) // 1000000 AS gap_s
  FROM events
), g AS (SELECT event_type, gap_s FROM gaps WHERE gap_s IS NOT NULL),
ranked AS (
  SELECT event_type, gap_s,
         row_number() OVER (PARTITION BY event_type ORDER BY gap_s) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM g
)
SELECT event_type, CAST(max(n) AS BIGINT) AS n_gaps,
       max(CASE WHEN rn = (n * 50 + 99) // 100 THEN gap_s END) AS p50_s,
       max(CASE WHEN rn = (n * 90 + 99) // 100 THEN gap_s END) AS p90_s,
       max(CASE WHEN rn = (n * 99 + 99) // 100 THEN gap_s END) AS p99_s
FROM ranked GROUP BY event_type
"""


def event_concentration_hhi(events: DataFrame) -> DataFrame:
    """Per-type activity concentration across users — the
    Herfindahl–Hirschman index the abuse/skew dashboards watch: a type
    whose traffic is one bot is a partition-skew hazard AND a data-
    quality smell, and HHI = Σ share_u² detects it in one pass.

    Exact: per-(type, user) counts are int64, hhi_num = Σ c_u² and
    n_events² divide as one double operation, rounded to 6dp — both
    engines perform the identical int→double division. Plan: two hash
    aggregates ((type, user) then type — the first is the only
    row-grain shuffle, user-grain keyed), no window, no join. int64
    bound: c_u ≤ 3·10⁹ keeps c_u² in range; beyond that cast the
    squares to decimal(38,0) (one line, same semantics).
    """
    per_user = events.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        per_user.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("c").alias("n_events"),
            F.sum(F.col("c") * F.col("c")).alias("hhi_num"),
        )
        .select(
            "event_type",
            "n_users",
            "n_events",
            F.round(
                F.col("hhi_num") / (F.col("n_events") * F.col("n_events")), 6
            ).alias("hhi"),
        )
    )


EVENT_HHI_SQL = """
WITH per_user AS (
  SELECT event_type, user_id, count(*) AS c FROM events
  GROUP BY event_type, user_id
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(c) AS BIGINT) AS n_events,
       round(CAST(sum(c * c) AS BIGINT) / (CAST(sum(c) AS BIGINT) * sum(c)), 6)
         AS hhi
FROM per_user GROUP BY event_type
"""


def daily_count_autocorr(events: DataFrame, lags: tuple[int, ...] = (1, 7)) -> DataFrame:
    """Autocorrelation of the per-type DAILY EVENT COUNT series at the
    given lags — the seasonality probe a pipeline runs before trusting
    a trend fit (value_trend_regression above): lag-1 says "is today
    like yesterday", lag-7 "is today like last week". The series is
    gap-filled with explicit zero days (an absent day IS a zero count —
    skipping it would silently correlate only busy days).

    Exactness discipline (the trend op's): everything is int64 moments;
    sqrt never happens — the statistic is the SIGNED square
    sign(cov)·cov²/(varx·vary), monotone in |r| with r's sign, plus
    the exact integer ``cov_num`` for the hash gate. One double
    division at the end, identical left-to-right in the twin.

    Plan: one (type, day) count (map-combined, grid-bounded output), a
    per-type min/max span, a sequence-explode day grid (|days| rows —
    independent of event count), one self-join of the grid at ``+lag``
    per lag, and a 6-sum moment aggregate. No window, no row sort; the
    only row-grain shuffle is the initial daily count, keyed by
    (type, day) so hot types spread across days.
    """
    return autocorr_from_daily_counts(daily_event_counts(events), lags)


def daily_event_counts(events: DataFrame) -> DataFrame:
    """(event_type, d, c) daily counts — the shared additive sufficient
    statistic for the whole daily-series family (autocorrelation,
    seasonal decomposition); also exactly what the streaming granule
    store maintains (streaming/jobs.py), so every consumer here can be
    served from the store or the scan interchangeably."""
    d = F.expr("datediff(to_date(ts), DATE '2024-01-01')").cast("long")
    return events.groupBy("event_type", d.alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )


def daily_value_moments(events: DataFrame) -> DataFrame:
    """(event_type, d, c, sy, syy) daily VALUE moments — the r9
    widening of the daily-count granule: counts plus the fixed-point
    value sum and sum-of-squares per (type, day). Still purely
    ADDITIVE (every column merges losslessly under any batching), so
    the streaming maintenance replay story is unchanged, and it is a
    strict superset of ``daily_event_counts`` (project c to recover
    it). One maintained table now serves the whole daily-series family
    AND the per-type trend regression: Σx, Σxy, Σx² over events reduce
    exactly to Σd·c, Σd·sy, Σd²·c over these granules (x is the day)."""
    d = F.expr("datediff(to_date(ts), DATE '2024-01-01')").cast("long")
    y = fixedpoint(F.col("value"), _V_SCALE)
    return (
        events.select("event_type", d.alias("d"), y.alias("y"))
        .groupBy("event_type", "d")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum("y").alias("sy"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
    )


def value_trend_from_daily_moments(moments: DataFrame) -> DataFrame:
    """The trend regression from pre-aggregated (event_type, d, c, sy,
    syy) granules — scan path and granule-store path share this
    exactly. The five per-event sufficient statistics fold exactly
    onto the granules (x = day is constant within a granule):
    n = Σc, Σx = Σd·c, Σy = Σsy, Σxy = Σd·sy, Σx² = Σd²·c, Σy² = Σsyy
    — all int64, so the closed form below is bit-identical to the
    event-grain aggregate."""
    agg = moments.groupBy("event_type").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("d") * F.col("c")).alias("sx"),
        F.sum("sy").alias("sy"),
        F.sum(F.col("d") * F.col("sy")).alias("sxy"),
        F.sum(F.col("d") * F.col("d") * F.col("c")).alias("sxx"),
        F.sum("syy").alias("syy"),
    )
    A = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    B = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    C = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    # B = 0 (a type whose events all land on ONE day — x has no
    # variance) must emit NULL explicitly: under Spark's default ANSI
    # mode the bare division THROWS, and DuckDB returns NULL even for
    # float /0, so the guard is both a crash fix and a hash-gate
    # parity rule (the value_gini_by_type precedent). r² additionally
    # needs C ≠ 0 (constant y) — double /0.0 is Inf in Spark but NULL
    # in DuckDB.
    return agg.select(
        "event_type",
        "n",
        F.when(B != 0, F.round(A / B / _V_SCALE, 6)).alias("slope_per_day"),
        F.when(
            B != 0,
            F.round(
                (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy"))
                / B
                / _V_SCALE,
                4,
            ),
        ).alias("intercept"),
        F.when(
            (B != 0) & (C != 0),
            F.round(
                (A.cast("double") * A.cast("double"))
                / (B.cast("double") * C.cast("double")),
                4,
            ),
        ).alias("r2"),
    )


def _zero_filled(daily: DataFrame) -> DataFrame:
    span = daily.groupBy("event_type").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    grid = span.select(
        "event_type", F.explode(F.sequence("d0", "d1")).alias("d")
    )
    return grid.join(daily, ["event_type", "d"], "left").select(
        "event_type", "d", F.coalesce("c", F.lit(0)).alias("c")
    )


def autocorr_from_daily_counts(
    daily: DataFrame, lags: tuple[int, ...] = (1, 7)
) -> DataFrame:
    """The autocorrelation statistic from a pre-aggregated
    (event_type, d, c) table — scan path and granule-store path share
    this exactly."""
    filled = _zero_filled(daily)
    lag_df = filled.sparkSession.createDataFrame(
        [(int(l),) for l in lags], "lag long"
    )
    a = filled.select("event_type", "d", F.col("c").alias("x"))
    b = filled.select(
        F.col("event_type").alias("et2"), F.col("d").alias("d2"), F.col("c").alias("y")
    )
    pairs = (
        a.crossJoin(F.broadcast(lag_df))
        .join(
            b,
            (F.col("et2") == F.col("event_type"))
            & (F.col("d2") == F.col("d") + F.col("lag")),
        )
    )
    agg = pairs.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    A = F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")
    B = F.col("n_pairs") * F.col("sxx") - F.col("sx") * F.col("sx")
    C = F.col("n_pairs") * F.col("syy") - F.col("sy") * F.col("sy")
    return agg.select(
        "event_type",
        "lag",
        "n_pairs",
        A.alias("cov_num"),
        # B or C = 0 (a CONSTANT daily series — e.g. a heartbeat type
        # firing exactly once per day) is 0/0: Spark doubles give NaN
        # where DuckDB gives NULL — emit NULL explicitly in both
        # engines (the r9 degenerate-denominator rule)
        F.when(
            (B != 0) & (C != 0),
            F.round(
                F.signum(A.cast("double"))
                * (A.cast("double") * A.cast("double"))
                / (B.cast("double") * C.cast("double")),
                6,
            ),
        ).alias("acf_signed_r2"),
    )


def daily_autocorr_sql(lags: tuple[int, ...] = (1, 7)) -> str:
    """DuckDB twin generated from the SAME lags parameter as the
    Python function (the r7-ADVICE discipline: no silently-diverging
    hardcoded twin of a parameterized operator)."""
    lag_list = ", ".join(str(int(l)) for l in lags)
    return f"""
WITH daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), span AS (
  SELECT event_type, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY 1
), grid AS (
  SELECT event_type, unnest(generate_series(d0, d1)) AS d FROM span
), filled AS (
  SELECT g.event_type, g.d, coalesce(dl.c, 0) AS c
  FROM grid g LEFT JOIN daily dl ON dl.event_type = g.event_type AND dl.d = g.d
), lagt AS (SELECT unnest([{lag_list}]) AS lag),
pairs AS (
  SELECT a.event_type, l.lag, a.c AS x, b.c AS y
  FROM filled a CROSS JOIN lagt l
  JOIN filled b ON b.event_type = a.event_type AND b.d = a.d + l.lag
), agg AS (
  SELECT event_type, lag, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM pairs GROUP BY 1, 2
)
SELECT event_type, lag, n_pairs,
       CAST(n_pairs * sxy - sx * sy AS BIGINT) AS cov_num,
       CASE WHEN n_pairs * sxx - sx * sx <> 0
             AND n_pairs * syy - sy * sy <> 0 THEN
         round(sign(CAST(n_pairs * sxy - sx * sy AS DOUBLE))
               * (CAST(n_pairs * sxy - sx * sy AS DOUBLE)
                  * CAST(n_pairs * sxy - sx * sy AS DOUBLE))
               / (CAST(n_pairs * sxx - sx * sx AS DOUBLE)
                  * CAST(n_pairs * syy - sy * sy AS DOUBLE)), 6)
       END AS acf_signed_r2
FROM agg
"""


DAILY_AUTOCORR_SQL = daily_autocorr_sql()


def daily_seasonal_decomposition(events: DataFrame, period: int = 7) -> DataFrame:
    """Additive seasonal decomposition of the per-type DAILY EVENT
    COUNT series: count = seasonal(dow) + trend + residual — the
    classic pre-fit decomposition a pipeline runs to separate weekly
    rhythm from drift before alerting on either (the fit-side
    complement of ``daily_count_autocorr``'s seasonality probe).

    Exactness discipline: the series is zero-filled (an absent day IS a
    zero), the seasonal term is the truncating integer mean of the
    day-of-week bucket, the trend is the truncating centered
    ``period``-day moving average (emitted only where the window is
    full — edge days get NULL trend/resid rather than a biased
    partial), and the residual is pure int64 subtraction. ``d % p``
    matches DuckDB's ``%`` because d ≥ 0 by construction (days since
    the fixture epoch); no pmod asymmetry (the r7-ADVICE CUSUM trap).

    Plan: one map-combined (type, day) count — the only row-grain
    shuffle; everything after runs on the |types|·|days| grid, which
    scales with the TIME SPAN, not the event count. The trend window
    partitions by type ordered by day: bounded partitions by the same
    argument.
    """
    return seasonal_from_daily_counts(daily_event_counts(events), period)


def seasonal_from_daily_counts(daily: DataFrame, period: int = 7) -> DataFrame:
    """The decomposition from a pre-aggregated (event_type, d, c)
    table — scan path and granule-store path share this exactly."""
    filled = _zero_filled(daily)
    half = period // 2
    seas = (
        filled.groupBy("event_type", F.expr(f"d % {period}").alias("dow"))
        .agg(F.expr("CAST(sum(c) div count(*) AS BIGINT)").alias("s"))
        .withColumnRenamed("event_type", "et2")
    )
    wt = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rangeBetween(-half, half)
    )
    tr = filled.select(
        "event_type",
        "d",
        F.col("c").cast("long").alias("c"),
        # floor((double)sum/period) — the SAME double expression in the
        # twin, so both engines agree bit-for-bit (sums << 2^53)
        F.when(
            F.count(F.lit(1)).over(wt) == period,
            F.floor(F.sum("c").over(wt) / period),
        ).alias("trend_c"),
    )
    out = tr.join(
        seas,
        (F.col("event_type") == F.col("et2"))
        & (F.col("dow") == F.expr(f"d % {period}")),
    ).select(
        "event_type",
        "d",
        "c",
        F.col("s").alias("seasonal_c"),
        "trend_c",
        F.when(
            F.col("trend_c").isNotNull(),
            F.col("c") - F.col("s") - F.col("trend_c"),
        ).alias("resid"),
    )
    return out


def daily_seasonal_sql(period: int = 7) -> str:
    """DuckDB twin generated from the SAME period parameter."""
    half = period // 2
    return f"""
WITH daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), span AS (
  SELECT event_type, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY 1
), grid AS (
  SELECT event_type, unnest(generate_series(d0, d1)) AS d FROM span
), filled AS (
  SELECT g.event_type, g.d, coalesce(dl.c, 0) AS c
  FROM grid g LEFT JOIN daily dl ON dl.event_type = g.event_type AND dl.d = g.d
), seas AS (
  SELECT event_type, d % {period} AS dow,
         CAST(CAST(sum(c) AS BIGINT) // count(*) AS BIGINT) AS s
  FROM filled GROUP BY 1, 2
), tr AS (
  SELECT event_type, d, CAST(c AS BIGINT) AS c,
         CASE WHEN count(*) OVER w = {period}
              THEN CAST(floor(CAST(sum(c) OVER w AS BIGINT) / {period}) AS BIGINT)
         END AS trend_c
  FROM filled
  WINDOW w AS (PARTITION BY event_type ORDER BY d
               RANGE BETWEEN {half} PRECEDING AND {half} FOLLOWING)
)
SELECT t.event_type, t.d, t.c, s.s AS seasonal_c, t.trend_c,
       CASE WHEN t.trend_c IS NOT NULL
            THEN CAST(t.c - s.s - t.trend_c AS BIGINT) END AS resid
FROM tr t JOIN seas s ON s.event_type = t.event_type AND s.dow = t.d % {period}
"""


DAILY_SEASONAL_SQL = daily_seasonal_sql()


def temporal_split_leakage(events: DataFrame, train_pct: int = 80) -> DataFrame:
    """Temporal train/test split with entity-leakage accounting — the
    split audit an ML pipeline runs before trusting offline metrics:
    cut the event stream at the ``train_pct`` point of the day span
    (time-based, never row-hash-based, so the test set is a true
    future), then quantify how much of the test set belongs to users
    already seen in training (those rows evaluate memorization, not
    generalization — the classic entity-leakage term).

    Three rows: ``train`` / ``test`` (events, distinct users, day
    bounds) and ``overlap`` — n_users = users present on BOTH sides,
    n_events = TEST events carried by those shared users (the leakage
    volume a per-entity split would have removed). All counts exact;
    the cutoff is integer arithmetic on the day span.

    Plan: one span aggregate (1-row broadcast), one (split, user)
    distinct — the only row-grain shuffle, keyed by user so it spreads
    — one broadcast-sized semi-join for the shared-user set, and
    map-combined count aggregates. The complement of
    ``deterministic_split`` (hash split for IID data): time split for
    forecasting-shaped data, with the leakage term made visible.
    """
    d = F.expr("datediff(to_date(ts), DATE '2024-01-01')").cast("long")
    base = events.select("user_id", d.alias("d"))
    span = base.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    tagged = base.crossJoin(F.broadcast(span)).select(
        "user_id",
        "d",
        F.when(
            F.col("d")
            <= F.col("d0")
            + F.expr(f"((d1 - d0) * {train_pct}) DIV 100"),
            F.lit("train"),
        )
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    per = tagged.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("d").alias("d_min"),
        F.max("d").alias("d_max"),
    )
    tr_users = tagged.filter(F.col("split") == "train").select("user_id").distinct()
    te = tagged.filter(F.col("split") == "test")
    shared = te.join(tr_users, "user_id", "left_semi")
    overlap = shared.agg(
        F.lit("overlap").alias("split"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("d").alias("d_min"),
        F.max("d").alias("d_max"),
    )
    return per.unionByName(overlap)


def temporal_split_sql(train_pct: int = 80) -> str:
    """DuckDB twin generated from the SAME train_pct parameter."""
    return f"""
WITH base AS (
  SELECT user_id,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS d
  FROM events
), span AS (SELECT min(d) AS d0, max(d) AS d1 FROM base),
tagged AS (
  SELECT user_id, d,
         CASE WHEN d <= d0 + ((d1 - d0) * {train_pct}) // 100
              THEN 'train' ELSE 'test' END AS split
  FROM base CROSS JOIN span
), per AS (
  SELECT split, CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
         min(d) AS d_min, max(d) AS d_max
  FROM tagged GROUP BY 1
), tr_users AS (
  SELECT DISTINCT user_id FROM tagged WHERE split = 'train'
), shared AS (
  SELECT t.user_id, t.d FROM tagged t
  JOIN tr_users u ON u.user_id = t.user_id
  WHERE t.split = 'test'
)
SELECT * FROM per
UNION ALL
SELECT 'overlap', CAST(count(*) AS BIGINT),
       CAST(count(DISTINCT user_id) AS BIGINT), min(d), max(d)
FROM shared
"""


TEMPORAL_SPLIT_SQL = temporal_split_sql()


def markov_baseline_hitrate(events: DataFrame) -> DataFrame:
    """Hit-rate evaluation of the most-likely-next-event baseline —
    the eval harness a pipeline runs BEFORE training a sequence model:
    if "predict the modal next event per current state" already scores
    X%, a learned model must beat X to justify itself. For each prev
    state: the argmax next event (ties broken lexicographically — the
    same deterministic-argmax contract as the transition matrix), the
    number of evaluated transitions, hits, and the exact ppm hit rate;
    plus an ``__overall__`` row (micro-average across states).

    Exactness: train and eval use the SAME transition counts (in-sample
    baseline — the honest label for what sequence-model papers call
    the "majority class per context" floor), so everything is two
    map-combined aggregates over the (prev, next) pair table after the
    one user-keyed lag shuffle the transition matrix already pays.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = events.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).where(F.col("prev_type").isNotNull())
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    best_w = Window.partitionBy("prev_type").orderBy(
        F.col("n").desc(), F.col("next_type")
    )
    best = (
        counts.withColumn("rk", F.row_number().over(best_w))
        .filter(F.col("rk") == 1)
        .select("prev_type", F.col("next_type").alias("predicted"), F.col("n"))
    )
    per_state = (
        counts.groupBy("prev_type")
        .agg(F.sum("n").alias("n_eval"))
        .join(best.select("prev_type", "predicted", F.col("n").alias("n_hits")), "prev_type")
        .select(
            "prev_type",
            "predicted",
            "n_eval",
            "n_hits",
            F.expr("CAST((1000000 * n_hits) div n_eval AS BIGINT)").alias(
                "hitrate_ppm"
            ),
        )
    )
    overall = per_state.agg(
        F.lit("__overall__").alias("prev_type"),
        F.lit("").alias("predicted"),
        F.sum("n_eval").alias("n_eval"),
        F.sum("n_hits").alias("n_hits"),
        F.expr(
            "CAST((1000000 * sum(n_hits)) div sum(n_eval) AS BIGINT)"
        ).alias("hitrate_ppm"),
    )
    return per_state.unionByName(overall)


MARKOV_BASELINE_SQL = """
WITH ordered AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
), pairs AS (
  SELECT prev_type, event_type AS next_type FROM ordered
  WHERE prev_type IS NOT NULL
), counts AS (
  SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
  FROM pairs GROUP BY 1, 2
), best AS (
  SELECT prev_type, next_type AS predicted, n FROM (
    SELECT prev_type, next_type, n,
           row_number() OVER (PARTITION BY prev_type
                              ORDER BY n DESC, next_type) AS rk
    FROM counts
  ) WHERE rk = 1
), per_state AS (
  SELECT c.prev_type, b.predicted,
         CAST(sum(c.n) AS BIGINT) AS n_eval,
         CAST(max(b.n) AS BIGINT) AS n_hits
  FROM counts c JOIN best b ON b.prev_type = c.prev_type
  GROUP BY 1, 2
)
SELECT prev_type, predicted, n_eval, n_hits,
       CAST((1000000 * n_hits) // n_eval AS BIGINT) AS hitrate_ppm
FROM per_state
UNION ALL
SELECT '__overall__', '', CAST(sum(n_eval) AS BIGINT),
       CAST(sum(n_hits) AS BIGINT),
       CAST((1000000 * sum(n_hits)) // sum(n_eval) AS BIGINT)
FROM per_state
"""


def seasonal_anomaly_bands(events: DataFrame, period: int = 7) -> DataFrame:
    """Anomaly flags on the DESEASONALIZED daily series — the
    composition the decomposition exists for: residual = count −
    seasonal − trend (interior days only), per-type residual p05/p95
    by nearest-rank over the residual value-frequency table (the exact
    selection-engine formulation — residuals are small-domain ints, so
    the frequency table IS the distribution), and each day flagged
    below/inside/above the band. Raw-count thresholds alert every
    weekend; residual bands alert on deviations FROM the weekly
    rhythm.

    All grid-grain: the only row-grain work is the daily count
    inherited from the decomposition; bands and flags operate on
    |types|·|days| rows.
    """
    return seasonal_anomaly_from_daily_counts(daily_event_counts(events), period)


def seasonal_anomaly_from_daily_counts(
    daily: DataFrame, period: int = 7
) -> DataFrame:
    """The residual-band anomaly flags from a pre-aggregated
    (event_type, d, c) table — scan path and granule-store path share
    this exactly (r9: the store's fourth consumer)."""
    dec = seasonal_from_daily_counts(daily, period).filter(
        F.col("resid").isNotNull()
    )
    freq = dec.groupBy("event_type", "resid").agg(F.count(F.lit(1)).alias("c"))
    cum_w = (
        Window.partitionBy("event_type")
        .orderBy("resid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = freq.select(
        "event_type",
        "resid",
        F.sum("c").over(cum_w).alias("cum"),
        F.sum("c").over(Window.partitionBy("event_type")).alias("n"),
    )
    bands = cum.groupBy("event_type").agg(
        F.min(
            F.when(F.col("cum") >= F.expr("(n * 5 + 99) DIV 100"), F.col("resid"))
        ).alias("lo"),
        F.min(
            F.when(F.col("cum") >= F.expr("(n * 95 + 99) DIV 100"), F.col("resid"))
        ).alias("hi"),
    )
    return (
        dec.join(F.broadcast(bands), "event_type")
        .select(
            "event_type",
            "d",
            "c",
            "resid",
            "lo",
            "hi",
            F.when(F.col("resid") < F.col("lo"), F.lit("below"))
            .when(F.col("resid") > F.col("hi"), F.lit("above"))
            .otherwise(F.lit("inside"))
            .alias("flag"),
        )
    )


def seasonal_anomaly_sql(period: int = 7) -> str:
    """DuckDB twin generated from the SAME period: decomposition CTEs
    + nearest-rank residual bands + flags."""
    half = period // 2
    return f"""
WITH daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), span AS (
  SELECT event_type, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY 1
), grid AS (
  SELECT event_type, unnest(generate_series(d0, d1)) AS d FROM span
), filled AS (
  SELECT g.event_type, g.d, coalesce(dl.c, 0) AS c
  FROM grid g LEFT JOIN daily dl ON dl.event_type = g.event_type AND dl.d = g.d
), seas AS (
  SELECT event_type, d % {period} AS dow,
         CAST(CAST(sum(c) AS BIGINT) // count(*) AS BIGINT) AS s
  FROM filled GROUP BY 1, 2
), tr AS (
  SELECT event_type, d, CAST(c AS BIGINT) AS c,
         CASE WHEN count(*) OVER w = {period}
              THEN CAST(floor(CAST(sum(c) OVER w AS BIGINT) / {period}) AS BIGINT)
         END AS trend_c
  FROM filled
  WINDOW w AS (PARTITION BY event_type ORDER BY d
               RANGE BETWEEN {half} PRECEDING AND {half} FOLLOWING)
), dec AS (
  SELECT t.event_type, t.d, t.c,
         CAST(t.c - s.s - t.trend_c AS BIGINT) AS resid
  FROM tr t JOIN seas s ON s.event_type = t.event_type AND s.dow = t.d % {period}
  WHERE t.trend_c IS NOT NULL
), freq AS (
  SELECT event_type, resid, CAST(count(*) AS BIGINT) AS cf
  FROM dec GROUP BY 1, 2
), cum AS (
  SELECT event_type, resid,
         sum(cf) OVER (PARTITION BY event_type ORDER BY resid) AS cum,
         sum(cf) OVER (PARTITION BY event_type) AS n
  FROM freq
), bands AS (
  SELECT event_type,
         min(CASE WHEN cum >= (n * 5 + 99) // 100 THEN resid END) AS lo,
         min(CASE WHEN cum >= (n * 95 + 99) // 100 THEN resid END) AS hi
  FROM cum GROUP BY 1
)
SELECT d.event_type, d.d, d.c, d.resid, b.lo, b.hi,
       CASE WHEN d.resid < b.lo THEN 'below'
            WHEN d.resid > b.hi THEN 'above'
            ELSE 'inside' END AS flag
FROM dec d JOIN bands b ON b.event_type = d.event_type
"""


SEASONAL_ANOMALY_SQL = seasonal_anomaly_sql()


def cusum_shift_detection(
    events: DataFrame,
    allowance_ppm: int = 200_000,
    h_ppm: int = 2_000_000,
) -> DataFrame:
    """One-sided CUSUM upward-shift detection on the per-type DAILY
    COUNT series (E-15 depth, r11) — the VOLUME sibling of
    ``cusum_changepoints`` above (which monitors per-row VALUE
    excursions against a p90 reference over sharded event streams):
    this one watches the daily-series family's grid for sustained
    TRAFFIC shifts — ramps and slow regressions that the EWMA/
    seasonal-band ops miss because no single day crosses a band, and
    that the value CUSUM cannot see at all (a volume ramp with
    unchanged values never moves it). Same Page-1954 statistic, same
    closed prefix form, different monitored series — the pairing every
    monitoring stack ships (rate alarm + level alarm).

    Estimator, all integer: with n grid days and N total events per
    type, the scaled daily deviation is x'_d = (c_d·n − N)·10⁶ −
    allowance_ppm·N (counts are scaled by n so the mean needs no
    division; the allowance is the slack k in mean-days/day). The
    recursion S_d = max(0, S_{d−1} + x'_d) has the closed prefix form
    S_d = C_d − min(0, min_{j≤d} C_j) with C the ordered cumsum of x'
    — two ordered windows instead of an inexpressible recursion, exact
    int64 throughout. A day is flagged 'shift' when S_d > h_ppm·N
    (h_ppm = cumulative excess in mean-days beyond the allowance).

    Determinism: int64 end-to-end (no division anywhere); the windows
    order by the unique (event_type, d) grid, so both engines fold
    identically. Headroom: |x'| ≤ N·n·10⁶ ≈ 3e16 per day at sf0.1 —
    cumsums stay under int64 for any fixture scale (documented bound:
    N·n·(10⁶+allowance) · days < 9.2e18, i.e. N ≲ 1e9 at a 30-day
    grid — repartition the monitor per shard past that).

    Plan: one (type, day) count (map-combined), the zero-filled grid,
    then two windows over ≤|days| rows per type — the documented
    grid-bounded WindowExec shape. One corpus scan.

    Reference scope: the reference engine (HubSpot poller) has no
    analytics; this extends the E-15 event-flow family mandated by
    SURVEY §2B.
    """
    return cusum_from_daily_counts(
        daily_event_counts(events), allowance_ppm, h_ppm
    )


def cusum_from_daily_counts(
    daily: DataFrame,
    allowance_ppm: int = 200_000,
    h_ppm: int = 2_000_000,
) -> DataFrame:
    """The CUSUM statistic from a pre-aggregated (event_type, d, c)
    table — scan path and granule-store path share this exactly (the
    daily-series family convention: ``autocorr_from_daily_counts``)."""
    filled = _zero_filled(daily)
    totals = filled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("c").alias("tot")
    )
    x = filled.join(F.broadcast(totals), "event_type").select(
        "event_type",
        "d",
        "c",
        "n",
        "tot",
        (
            (F.col("c") * F.col("n") - F.col("tot")) * F.lit(1_000_000)
            - F.lit(int(allowance_ppm)) * F.col("tot")
        ).alias("xp"),
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = x.withColumn("cx", F.sum("xp").over(w_cum))
    s = cum.withColumn(
        "s_num", F.col("cx") - F.least(F.lit(0), F.min("cx").over(w_cum))
    )
    return s.select(
        "event_type",
        "d",
        "c",
        "s_num",
        F.when(
            F.col("s_num") > F.lit(int(h_ppm)) * F.col("tot"), F.lit("shift")
        ).otherwise(F.lit("ok")).alias("flag"),
    )


def mann_kendall_trend(events: DataFrame) -> DataFrame:
    """Mann–Kendall trend test + Theil–Sen slope per event type over
    the zero-filled daily count series (E-15 depth, r11) — the ROBUST
    sibling of ``value_trend_regression``'s least squares: MK tests
    monotone trend from sign counts alone (one outlier day moves S by
    at most n−1, not by its magnitude), and the Theil–Sen slope is the
    median pairwise slope (50% breakdown vs the mean-based fit).

    Exactness discipline: all pairs (d_i < d_j) of the ≤|days| grid —
    C(|days|, 2) rows per type, GRID-bounded (435 at the 30-day
    fixture), never corpus-bounded. S = Σ sign(c_j − c_i) is exact
    int64; the tie-corrected variance Var(S) = [n(n−1)(2n+5) −
    Σ t(t−1)(2t+5)]/18 is computed as the integer numerator (the /18
    rides into the flag comparison). Pairwise slopes live on the ppm
    grid (dy·10⁶ div dx — trunc division, the repo's fixed-point
    convention) so the median is an exact integer order statistic:
    lower median at rank (m+1) div 2 ordered by (slope, d_i, d_j),
    fully tie-deterministic. Significance at |z| > 1.96 without sqrt:
    18·S² ≥ 3.8416·var_num ⟺ 180000·S² ≥ 38416·var_num·18/…, kept
    integer as 10000·18·S² vs 38416·var_num — identical in both
    engines.

    Plan: one (type, day) count, the zero-fill grid, one grid
    self-join (grid² rows per type — bounded by the day span), two
    scalar aggregates, one grid-bounded rank window for the median.
    One corpus scan total.
    """
    return mann_kendall_from_daily_counts(daily_event_counts(events))


def mann_kendall_from_daily_counts(daily: DataFrame) -> DataFrame:
    """The MK/Theil–Sen statistic from a pre-aggregated
    (event_type, d, c) table — shared by scan and granule-store
    paths."""
    filled = _zero_filled(daily)
    a = filled.select("event_type", F.col("d").alias("d1"), F.col("c").alias("c1"))
    b = filled.select(
        F.col("event_type").alias("et2"),
        F.col("d").alias("d2"),
        F.col("c").alias("c2"),
    )
    # the grid is ≤ |types|·|days| rows by construction — broadcast it
    # so the pair join is a BroadcastHashJoin on event_type with the
    # range condition as the residual, never a corpus-stat-misled SMJ
    pairs = a.join(
        F.broadcast(b),
        (F.col("et2") == F.col("event_type")) & (F.col("d2") > F.col("d1")),
    ).select(
        "event_type",
        "d1",
        "d2",
        F.signum(F.col("c2") - F.col("c1")).cast("long").alias("sgn"),
        F.expr("(c2 - c1) * 1000000 div (d2 - d1)").alias("slope_ppm"),
    )
    stats = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("sgn").alias("s_stat"),
    )
    # tie correction: Σ t(t-1)(2t+5) over count-value ties within type
    ties = (
        filled.groupBy("event_type", "c")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(
                F.expr("t * (t - 1) * (2 * t + 5)")
            ).alias("tie_term"),
            F.sum("t").alias("n"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("slope_ppm", "d1", "d2")
    med = (
        pairs.withColumn("rk", F.row_number().over(w))
        .join(F.broadcast(stats.select("event_type", "m")), "event_type")
        .filter(F.col("rk") == F.expr("(m + 1) div 2"))
        .select("event_type", F.col("slope_ppm").alias("sen_slope_ppm"))
    )
    out = (  # all three sides are |types| rows — broadcast the joins
        stats.join(F.broadcast(ties), "event_type")
        .join(F.broadcast(med), "event_type")
        .select(
            "event_type",
            "n",
            "s_stat",
            F.expr(
                "n * (n - 1) * (2 * n + 5) - tie_term"
            ).alias("var_num"),  # 18·Var(S), exact int64
            "sen_slope_ppm",
            F.when(
                F.expr("180000 * s_stat * s_stat < 38416 * (n * (n - 1) * (2 * n + 5) - tie_term)")
                | (F.col("s_stat") == 0),
                F.lit("none"),
            )
            .when(F.col("s_stat") > 0, F.lit("increasing"))
            .otherwise(F.lit("decreasing"))
            .alias("trend"),
        )
    )
    return out


MANN_KENDALL_SQL = """
WITH daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), span AS (
  SELECT event_type, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY 1
), grid AS (
  SELECT event_type, unnest(generate_series(d0, d1)) AS d FROM span
), filled AS (
  SELECT g.event_type, g.d, coalesce(dl.c, 0) AS c
  FROM grid g LEFT JOIN daily dl ON dl.event_type = g.event_type AND dl.d = g.d
), pairs AS (
  SELECT a.event_type, a.d AS d1, b.d AS d2,
         CAST(sign(b.c - a.c) AS BIGINT) AS sgn,
         CAST((b.c - a.c) * 1000000 // (b.d - a.d) AS BIGINT) AS slope_ppm
  FROM filled a
  JOIN filled b ON b.event_type = a.event_type AND b.d > a.d
), stats AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS m,
         CAST(sum(sgn) AS BIGINT) AS s_stat
  FROM pairs GROUP BY 1
), ties AS (
  SELECT event_type,
         CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term,
         CAST(sum(t) AS BIGINT) AS n
  FROM (SELECT event_type, c, CAST(count(*) AS BIGINT) AS t
        FROM filled GROUP BY 1, 2)
  GROUP BY 1
), med AS (
  SELECT event_type, slope_ppm AS sen_slope_ppm FROM (
    SELECT p.event_type, p.slope_ppm,
           row_number() OVER (PARTITION BY p.event_type
                              ORDER BY p.slope_ppm, p.d1, p.d2) AS rk,
           s.m
    FROM pairs p JOIN stats s ON s.event_type = p.event_type
  ) WHERE rk = (m + 1) // 2
)
SELECT s.event_type, t.n, s.s_stat,
       CAST(t.n * (t.n - 1) * (2 * t.n + 5) - t.tie_term AS BIGINT) AS var_num,
       m.sen_slope_ppm,
       CASE WHEN 180000 * s.s_stat * s.s_stat
                 < 38416 * (t.n * (t.n - 1) * (2 * t.n + 5) - t.tie_term)
              OR s.s_stat = 0 THEN 'none'
            WHEN s.s_stat > 0 THEN 'increasing'
            ELSE 'decreasing' END AS trend
FROM stats s
JOIN ties t ON t.event_type = s.event_type
JOIN med m ON m.event_type = s.event_type
"""


def cusum_shift_sql(
    allowance_ppm: int = 200_000, h_ppm: int = 2_000_000
) -> str:
    """DuckDB twin generated from the SAME parameters (param
    discipline)."""
    return f"""
WITH daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), span AS (
  SELECT event_type, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY 1
), grid AS (
  SELECT event_type, unnest(generate_series(d0, d1)) AS d FROM span
), filled AS (
  SELECT g.event_type, g.d, coalesce(dl.c, 0) AS c
  FROM grid g LEFT JOIN daily dl ON dl.event_type = g.event_type AND dl.d = g.d
), totals AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(c) AS BIGINT) AS tot
  FROM filled GROUP BY 1
), x AS (
  SELECT f.event_type, f.d, f.c, t.tot,
         (f.c * t.n - t.tot) * 1000000 - {int(allowance_ppm)} * t.tot AS xp
  FROM filled f JOIN totals t ON t.event_type = f.event_type
), cum AS (
  SELECT event_type, d, c, tot,
         CAST(sum(xp) OVER (PARTITION BY event_type ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cx
  FROM x
), s AS (
  SELECT event_type, d, c, tot,
         cx - least(0, CAST(min(cx) OVER (PARTITION BY event_type ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT))
           AS s_num
  FROM cum
)
SELECT event_type, d, c, s_num,
       CASE WHEN s_num > {int(h_ppm)} * tot THEN 'shift' ELSE 'ok' END AS flag
FROM s
"""


CUSUM_SHIFT_SQL = cusum_shift_sql()


def user_survival_km(events: DataFrame, censor_days: int = 7) -> DataFrame:
    """Kaplan-Meier survival over user lifetimes (E-15 depth, r10) —
    the retention statistic product teams actually quote ("what
    fraction of users are still active after t days"), with honest
    right-censoring: a user whose LAST event falls within
    ``censor_days`` of the corpus horizon hasn't been observed to
    churn — they leave the at-risk set at their observation time
    without counting as an event (treating them as churned is the
    classic retention-curve bias).

    Estimator: observation time per user = datediff(last_day,
    first_day); event (churn) iff last_day ≤ horizon − censor_days.
    At each observed event time t: n_risk(t) = users with obs ≥ t,
    d(t) = events at t, step = (n_risk − d)/n_risk, and
    S(t) = Π_{u ≤ t} step(u). Rows are emitted at event times only
    (the standard KM table).

    Determinism discipline: n_risk/d are exact int64 (N minus a
    cumulative count over the obs_t-ordered grid); step is one
    division of identical int64s (identical doubles both engines);
    the product is exp(Σ ln step) with the Σ as an ORDERED window sum
    — a sequential left-to-right fold in both engines, so no
    accumulation-order divergence — rounded 6dp at the edge. A step
    of 0 (everyone at risk dies, n_risk == n_events) is guarded
    EXPLICITLY: ln(0) is -inf in neither engine's happy path (DuckDB
    throws OutOfRangeException; Spark 4.1 under its default ANSI mode
    errors too), so that case emits the documented sentinel
    ``ln_step = -1e9`` — exp underflows to exactly 0.0 (IEEE double)
    in both engines, forcing survival to 0 at and after that t, which
    is the mathematically correct KM value when the risk set is
    exhausted.

    Plan: one user-grain aggregate (first/last day), one obs_t-grain
    aggregate, then windows over the |distinct obs_t| grid —
    corpus-size work is the two aggregates; everything after runs on
    ≤ #days rows (the documented grid-bounded WindowExec shape).
    """
    per_user = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day"),
        F.max(F.to_date("ts")).alias("last_day"),
    )
    horizon = per_user.agg(F.max("last_day").alias("h"))
    obs = per_user.crossJoin(F.broadcast(horizon)).select(
        F.datediff("last_day", "first_day").alias("obs_t"),
        (
            F.datediff("h", "last_day") >= censor_days
        ).cast("int").alias("churned"),
    )
    grid = obs.groupBy("obs_t").agg(
        F.count(F.lit(1)).alias("n_leaving"),
        F.sum("churned").alias("n_events"),
    )
    w_prev = (
        Window.orderBy("obs_t").rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = Window.orderBy("obs_t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = obs.count()  # scalar aggregate (driver-bounded)
    stepped = (
        grid.withColumn(
            "n_risk",
            F.lit(total) - F.coalesce(F.sum("n_leaving").over(w_prev), F.lit(0)),
        )
        .withColumn(
            "ln_step",
            F.when(
                F.col("n_events") >= F.col("n_risk"), F.lit(-1.0e9)
            )
            .when(
                F.col("n_events") > 0,
                F.log((F.col("n_risk") - F.col("n_events")) / F.col("n_risk")),
            )
            .otherwise(F.lit(0.0)),
        )
        .withColumn("ln_surv", F.sum("ln_step").over(w_cum))
    )
    return (
        stepped.filter(F.col("n_events") > 0)
        .select(
            F.col("obs_t").alias("t_days"),
            "n_risk",
            "n_events",
            F.round(
                (F.col("n_risk") - F.col("n_events")) / F.col("n_risk"), 6
            ).alias("step_factor"),
            F.round(F.exp("ln_surv"), 6).alias("survival"),
        )
    )


def user_survival_km_sql(censor_days: int = 7) -> str:
    """DuckDB twin generated from the SAME censor window (param
    discipline)."""
    return f"""
WITH per_user AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS first_day,
         max(CAST(ts AS DATE)) AS last_day
  FROM events GROUP BY 1
), h AS (SELECT max(last_day) AS horizon FROM per_user),
obs AS (
  SELECT date_diff('day', first_day, last_day) AS obs_t,
         CASE WHEN date_diff('day', last_day, horizon) >= {censor_days}
              THEN 1 ELSE 0 END AS churned
  FROM per_user, h
), grid AS (
  SELECT obs_t, count(*) AS n_leaving,
         CAST(sum(churned) AS BIGINT) AS n_events
  FROM obs GROUP BY 1
), stepped AS (
  SELECT obs_t, n_events,
         (SELECT count(*) FROM obs)
           - coalesce(CAST(sum(n_leaving) OVER (ORDER BY obs_t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
           AS n_risk,
         CASE WHEN n_events >= (
             (SELECT count(*) FROM obs)
             - coalesce(CAST(sum(n_leaving) OVER (ORDER BY obs_t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
           ) THEN -1e9
         WHEN n_events > 0 THEN
           ln((
             ((SELECT count(*) FROM obs)
              - coalesce(CAST(sum(n_leaving) OVER (ORDER BY obs_t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0))
             - n_events
           ) / (
             (SELECT count(*) FROM obs)
             - coalesce(CAST(sum(n_leaving) OVER (ORDER BY obs_t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
           ))
         ELSE 0.0 END AS ln_step
  FROM grid
), summed AS (
  SELECT obs_t, n_events, n_risk,
         sum(ln_step) OVER (ORDER BY obs_t
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ln_surv
  FROM stepped
)
SELECT obs_t AS t_days, n_risk, n_events,
       round((n_risk - n_events) / CAST(n_risk AS DOUBLE), 6) AS step_factor,
       round(exp(ln_surv), 6) AS survival
FROM summed WHERE n_events > 0
"""


USER_SURVIVAL_KM_SQL = user_survival_km_sql()


def user_hazard_na(events: DataFrame, censor_days: int = 7) -> DataFrame:
    """Nelson–Aalen cumulative hazard over user lifetimes — the
    estimator survival analysis pairs with Kaplan-Meier
    (``user_survival_km``): H(t) = Σ_{u ≤ t} d(u)/n_risk(u), the
    cumulative churn FORCE. Where KM answers "what fraction survives
    past t", NA answers "how much churn pressure has accumulated by t"
    — its increments are the discrete hazard rates a retention team
    plots to find WHEN churn concentrates (onboarding cliff vs slow
    decay), and exp(−H) is the Breslow survival estimate (reported as
    ``surv_breslow``; ≥ the KM curve, equal in the no-ties limit —
    both facts pytest-pinned).

    Same right-censoring and risk-set construction as KM (same
    per-user/grid aggregates, same censor_days convention). Unlike KM
    there is NO ln/product step — each increment is one division of
    exact int64s and the curve is an ORDERED window sum (the
    sequential-fold shape KM's ln-sum already relies on), so the
    step==0-risk-set edge KM needs a sentinel for simply cannot arise
    (d ≤ n_risk always, and d/n_risk is finite).

    Plan: identical to KM — two corpus-grain aggregates, then all
    windows run on the ≤ #days observation grid.
    """
    per_user = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day"),
        F.max(F.to_date("ts")).alias("last_day"),
    )
    horizon = per_user.agg(F.max("last_day").alias("h"))
    obs = per_user.crossJoin(F.broadcast(horizon)).select(
        F.datediff("last_day", "first_day").alias("obs_t"),
        (
            F.datediff("h", "last_day") >= censor_days
        ).cast("int").alias("churned"),
    )
    grid = obs.groupBy("obs_t").agg(
        F.count(F.lit(1)).alias("n_leaving"),
        F.sum("churned").alias("n_events"),
    )
    w_prev = Window.orderBy("obs_t").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("obs_t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = obs.count()  # scalar aggregate (driver-bounded)
    stepped = (
        grid.withColumn(
            "n_risk",
            F.lit(total) - F.coalesce(F.sum("n_leaving").over(w_prev), F.lit(0)),
        )
        .withColumn(
            "h_step", F.col("n_events") / F.col("n_risk").cast("double")
        )
        .withColumn("cum_h", F.sum("h_step").over(w_cum))
    )
    return (
        stepped.filter(F.col("n_events") > 0)
        .select(
            F.col("obs_t").alias("t_days"),
            "n_risk",
            "n_events",
            F.round("h_step", 6).alias("hazard_step"),
            F.round("cum_h", 6).alias("cum_hazard"),
            F.round(F.exp(-F.col("cum_h")), 6).alias("surv_breslow"),
        )
    )


def user_hazard_na_sql(censor_days: int = 7) -> str:
    """DuckDB twin generated from the SAME censor window."""
    return f"""
WITH per_user AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS first_day,
         max(CAST(ts AS DATE)) AS last_day
  FROM events GROUP BY 1
), h AS (SELECT max(last_day) AS horizon FROM per_user),
obs AS (
  SELECT date_diff('day', first_day, last_day) AS obs_t,
         CASE WHEN date_diff('day', last_day, horizon) >= {censor_days}
              THEN 1 ELSE 0 END AS churned
  FROM per_user, h
), grid AS (
  SELECT obs_t, count(*) AS n_leaving,
         CAST(sum(churned) AS BIGINT) AS n_events
  FROM obs GROUP BY 1
), stepped AS (
  SELECT obs_t, n_events,
         (SELECT count(*) FROM obs)
           - coalesce(CAST(sum(n_leaving) OVER (ORDER BY obs_t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
           AS n_risk
  FROM grid
), hsteps AS (
  SELECT obs_t, n_events, n_risk,
         n_events / CAST(n_risk AS DOUBLE) AS h_step
  FROM stepped
), summed AS (
  SELECT obs_t, n_events, n_risk, h_step,
         sum(h_step) OVER (ORDER BY obs_t
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_h
  FROM hsteps
)
SELECT obs_t AS t_days, n_risk, n_events,
       round(h_step, 6) AS hazard_step,
       round(cum_h, 6) AS cum_hazard,
       round(exp(-cum_h), 6) AS surv_breslow
FROM summed WHERE n_events > 0
"""


USER_HAZARD_NA_SQL = user_hazard_na_sql()


def ab_conversion_ztest(events: DataFrame) -> DataFrame:
    """Two-proportion z-test on user-level conversion between two
    deterministic experiment buckets — the experimentation readout
    every product-analytics stack ships next to funnels and retention.

    Assignment: ``user_id % 2`` splits users into arms A/B. That is a
    stand-in for the production assignment (a salted murmur/xx hash of
    the user key mod the bucket count) chosen because the two engines
    do not share a hash function; the ANALYSIS — the part this
    operator exhibits — is identical either way. Conversion is
    user-grain: a user converts if they have ≥1 ``purchase`` event
    (dedup inside the same aggregate, no second pass).

    Statistic: with per-arm exposures n₁, n₂ and conversions c₁, c₂,
    pooled p̂ = (c₁+c₂)/(n₁+n₂) and
    ``z = (p₁ − p₂) / sqrt(p̂(1−p̂)(1/n₁ + 1/n₂))``. Counts are exact
    int64; the z expression is ONE identical double chain from those
    ints in both engines (IEEE-correctly-rounded ops in the same
    order), then round(…, 4). Degenerate cases (an empty arm, or
    p̂ ∈ {0, 1} where the variance is 0) emit NULL explicitly in both
    engines rather than relying on ANSI-vs-NULL division semantics.

    Plan: ONE user-grain shuffle (groupBy user_id with a map-side
    partial max), then a single global conditional aggregate over
    |users| rows → one row out. Nothing else moves; at 100 TB the
    cost is the one exposure-dedup exchange any user-grain metric
    pays, spread across the full user-id key space (no skew — every
    key is one user).
    """
    users = events.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv")
    )
    return ab_ztest_from_user_conversions(users)


def ab_ztest_from_user_conversions(users: DataFrame) -> DataFrame:
    """The z-test readout from the (user_id, conv) user-grain table —
    the mergeable sufficient statistic (conv merges by max), so this
    entry point serves both the batch scan above and the streaming
    granule store (``streaming/jobs.streaming_ab_ztest_maintenance``)."""
    arms = users.select(
        (F.col("user_id") % 2 == 0).cast("int").alias("in_a"), "conv"
    )
    counts = arms.agg(
        F.sum("in_a").cast("long").alias("n_a"),
        F.sum(F.col("in_a") * F.col("conv")).cast("long").alias("conv_a"),
        F.sum(1 - F.col("in_a")).cast("long").alias("n_b"),
        F.sum((1 - F.col("in_a")) * F.col("conv")).cast("long").alias("conv_b"),
    )
    p1 = F.col("conv_a") / F.col("n_a")
    p2 = F.col("conv_b") / F.col("n_b")
    pooled = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b"))
    z = (p1 - p2) / F.sqrt(
        pooled * (1 - pooled) * (1 / F.col("n_a") + 1 / F.col("n_b"))
    )
    ok = (
        (F.col("n_a") > 0)
        & (F.col("n_b") > 0)
        & (F.col("conv_a") + F.col("conv_b") > 0)
        & (F.col("conv_a") + F.col("conv_b") < F.col("n_a") + F.col("n_b"))
    )
    return counts.select(
        "n_a",
        "conv_a",
        F.when(F.col("n_a") > 0, F.round(p1, 6)).alias("rate_a"),
        "n_b",
        "conv_b",
        F.when(F.col("n_b") > 0, F.round(p2, 6)).alias("rate_b"),
        F.when(ok, F.round(p1 - p2, 6)).alias("rate_diff"),
        F.when(ok, F.round(z, 4)).alias("z_score"),
        F.when(ok, (F.abs(z) >= 1.96).cast("int")).alias("significant_95"),
    )


AB_CONVERSION_ZTEST_SQL = """
WITH users AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
), arms AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS in_a, conv
  FROM users
), counts AS (
  SELECT CAST(sum(in_a) AS BIGINT) AS n_a,
         CAST(sum(in_a * conv) AS BIGINT) AS conv_a,
         CAST(sum(1 - in_a) AS BIGINT) AS n_b,
         CAST(sum((1 - in_a) * conv) AS BIGINT) AS conv_b
  FROM arms
)
SELECT n_a, conv_a,
       CASE WHEN n_a > 0 THEN round(conv_a / n_a, 6) END AS rate_a,
       n_b, conv_b,
       CASE WHEN n_b > 0 THEN round(conv_b / n_b, 6) END AS rate_b,
       CASE WHEN n_a > 0 AND n_b > 0 AND conv_a + conv_b > 0
                 AND conv_a + conv_b < n_a + n_b THEN
         round(conv_a / n_a - conv_b / n_b, 6)
       END AS rate_diff,
       CASE WHEN n_a > 0 AND n_b > 0 AND conv_a + conv_b > 0
                 AND conv_a + conv_b < n_a + n_b THEN
         round((conv_a / n_a - conv_b / n_b)
               / sqrt(((conv_a + conv_b) / (n_a + n_b))
                      * (1 - (conv_a + conv_b) / (n_a + n_b))
                      * (1 / n_a + 1 / n_b)), 4)
       END AS z_score,
       CASE WHEN n_a > 0 AND n_b > 0 AND conv_a + conv_b > 0
                 AND conv_a + conv_b < n_a + n_b THEN
         CAST(abs((conv_a / n_a - conv_b / n_b)
                  / sqrt(((conv_a + conv_b) / (n_a + n_b))
                         * (1 - (conv_a + conv_b) / (n_a + n_b))
                         * (1 / n_a + 1 / n_b))) >= 1.96 AS INT)
       END AS significant_95
FROM counts
"""


def ab_value_welch_ttest(events: DataFrame) -> DataFrame:
    """Welch's unequal-variance t-test on per-user PURCHASE REVENUE
    between the two deterministic experiment arms — the continuous
    companion to ``ab_conversion_ztest``: conversion answers "did more
    users buy", this answers "did users spend more", which is the
    metric most revenue experiments actually gate on. Welch (not
    pooled Student) because revenue variances routinely differ across
    arms; the statistic is t = (x̄₁ − x̄₂) / sqrt(s₁²/n₁ + s₂²/n₂)
    with the Welch–Satterthwaite df reported alongside.

    Every user counts — non-purchasers contribute 0 revenue (the
    standard intent-to-treat frame; dropping them would bias toward
    whichever arm converts more). Per-user revenue is an exact
    fixed-point int64 sum; per-arm n/Σx are int64 and Σx² goes
    through decimal(38,0) (HUGEINT in the oracle) so the moment sums
    survive any corpus size. The t/df chain is ONE identical double
    expression from those exact integers in both engines; round(…, 4).
    Degenerate cases (an empty arm, or both sample variances 0) emit
    NULL explicitly.

    Plan: one user-grain shuffle (conditional sum), one global
    conditional aggregate → 1 row. Same cost envelope as the z-test.
    """
    from kinesis_dstream_spark.functions.exact import fixedpoint

    users = events.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                fixedpoint(F.col("value"), 100),
            ).otherwise(0)
        ).alias("rev")
    )
    arms = users.select(
        (F.col("user_id") % 2 == 0).cast("int").alias("in_a"), "rev"
    )
    rev_dec = F.col("rev").cast("decimal(38,0)")
    counts = arms.agg(
        F.sum("in_a").cast("long").alias("n_a"),
        F.sum(F.col("in_a") * F.col("rev")).cast("long").alias("sx_a"),
        F.sum(F.when(F.col("in_a") == 1, rev_dec * rev_dec).otherwise(0)).alias(
            "sxx_a"
        ),
        F.sum(1 - F.col("in_a")).cast("long").alias("n_b"),
        F.sum((1 - F.col("in_a")) * F.col("rev")).cast("long").alias("sx_b"),
        F.sum(F.when(F.col("in_a") == 0, rev_dec * rev_dec).otherwise(0)).alias(
            "sxx_b"
        ),
    )
    m1 = F.col("sx_a") / F.col("n_a") / 100.0
    m2 = F.col("sx_b") / F.col("n_b") / 100.0
    # sample variance in VALUE units: (Σx² − (Σx)²/n) / (n−1) / 100²
    v1 = (
        (F.col("sxx_a").cast("double") - F.col("sx_a") * m1 * 100.0)
        / (F.col("n_a") - 1)
        / 10000.0
    )
    v2 = (
        (F.col("sxx_b").cast("double") - F.col("sx_b") * m2 * 100.0)
        / (F.col("n_b") - 1)
        / 10000.0
    )
    se2 = v1 / F.col("n_a") + v2 / F.col("n_b")
    t = (m1 - m2) / F.sqrt(se2)
    df = (se2 * se2) / (
        (v1 / F.col("n_a")) * (v1 / F.col("n_a")) / (F.col("n_a") - 1)
        + (v2 / F.col("n_b")) * (v2 / F.col("n_b")) / (F.col("n_b") - 1)
    )
    ok = (F.col("n_a") > 1) & (F.col("n_b") > 1)
    return counts.select(
        "n_a",
        F.round(F.col("sx_a") / 100.0, 2).alias("rev_a"),
        "n_b",
        F.round(F.col("sx_b") / 100.0, 2).alias("rev_b"),
        # 6dp: mean_diff is a difference of two rationals (sx/n/100) —
        # the rational-grid class where 4dp half-boundary hits diverge
        # across engines (ADVICE r11); 4dp stays reserved for
        # irrational chains (t_stat goes through sqrt)
        F.when(ok, F.round(m1 - m2, 6)).alias("mean_diff"),
        F.when(ok & (se2 > 0), F.round(t, 4)).alias("t_stat"),
        F.when(ok & (se2 > 0), F.round(df, 2)).alias("welch_df"),
        F.when(ok & (se2 > 0), (F.abs(t) >= 1.96).cast("int")).alias(
            "significant_95"
        ),
    )


AB_VALUE_WELCH_SQL = """
WITH users AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS rev
  FROM events GROUP BY user_id
), arms AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS in_a, rev
  FROM users
), counts AS (
  SELECT CAST(sum(in_a) AS BIGINT) AS n_a,
         CAST(sum(in_a * rev) AS BIGINT) AS sx_a,
         sum(CASE WHEN in_a = 1
                  THEN CAST(rev AS HUGEINT) * CAST(rev AS HUGEINT)
                  ELSE 0 END) AS sxx_a,
         CAST(sum(1 - in_a) AS BIGINT) AS n_b,
         CAST(sum((1 - in_a) * rev) AS BIGINT) AS sx_b,
         sum(CASE WHEN in_a = 0
                  THEN CAST(rev AS HUGEINT) * CAST(rev AS HUGEINT)
                  ELSE 0 END) AS sxx_b
  FROM arms
), calc AS (
  SELECT n_a, sx_a, n_b, sx_b,
         sx_a / n_a / 100.0 AS m1,
         sx_b / n_b / 100.0 AS m2,
         (CAST(sxx_a AS DOUBLE) - sx_a * (sx_a / n_a / 100.0) * 100.0)
           / (n_a - 1) / 10000.0 AS v1,
         (CAST(sxx_b AS DOUBLE) - sx_b * (sx_b / n_b / 100.0) * 100.0)
           / (n_b - 1) / 10000.0 AS v2
  FROM counts
), calc2 AS (
  SELECT *, v1 / n_a + v2 / n_b AS se2 FROM calc
)
SELECT n_a, round(sx_a / 100.0, 2) AS rev_a,
       n_b, round(sx_b / 100.0, 2) AS rev_b,
       CASE WHEN n_a > 1 AND n_b > 1 THEN round(m1 - m2, 6) END AS mean_diff,
       CASE WHEN n_a > 1 AND n_b > 1 AND se2 > 0 THEN
         round((m1 - m2) / sqrt(se2), 4)
       END AS t_stat,
       CASE WHEN n_a > 1 AND n_b > 1 AND se2 > 0 THEN
         round((se2 * se2)
               / ((v1 / n_a) * (v1 / n_a) / (n_a - 1)
                  + (v2 / n_b) * (v2 / n_b) / (n_b - 1)), 2)
       END AS welch_df,
       CASE WHEN n_a > 1 AND n_b > 1 AND se2 > 0 THEN
         CAST(abs((m1 - m2) / sqrt(se2)) >= 1.96 AS INT)
       END AS significant_95
FROM calc2
"""


_MSPRT_TAU = 0.0001  # mixture variance for the always-valid test


def ab_msprt_always_valid(events: DataFrame, tau: float = _MSPRT_TAU) -> DataFrame:
    """Mixture-SPRT always-valid p-value for the conversion experiment
    — the sequential-testing readout (Robbins' mixture martingale;
    Johari et al.'s "peeking problem" fix, all public literature) that
    modern experimentation platforms show INSTEAD of the fixed-horizon
    z-test, because it stays valid under continuous monitoring: you
    may stop the moment it crosses α and the guarantee holds, whereas
    peeking at a z-test inflates false positives severalfold.

    Math (normal approximation, two-sample proportions): with effect
    θ̂ = p₁ − p₂ and squared standard error se² = p̂(1−p̂)(1/n₁+1/n₂),
    the mixture N(0, τ) likelihood ratio is
    ``Λ = sqrt(se²/(se²+τ)) · exp(θ̂²·τ / (2·se²·(se²+τ)))`` and the
    always-valid p-value is ``min(1, 1/Λ)``. τ is the prior scale of
    plausible effects — a REGISTERED constant (the r7 param-twin
    discipline: Spark and oracle are generated from the same value).

    Counts are the exact user-grain int64s of the z-test; Λ and p are
    ONE identical double chain in both engines; degenerate arms or
    p̂ ∈ {0,1} emit NULL explicitly. Same one-shuffle plan as the
    siblings.
    """
    users = events.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv")
    )
    arms = users.select(
        (F.col("user_id") % 2 == 0).cast("int").alias("in_a"), "conv"
    )
    counts = arms.agg(
        F.sum("in_a").cast("long").alias("n_a"),
        F.sum(F.col("in_a") * F.col("conv")).cast("long").alias("conv_a"),
        F.sum(1 - F.col("in_a")).cast("long").alias("n_b"),
        F.sum((1 - F.col("in_a")) * F.col("conv")).cast("long").alias("conv_b"),
    )
    p1 = F.col("conv_a") / F.col("n_a")
    p2 = F.col("conv_b") / F.col("n_b")
    pooled = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b"))
    theta = p1 - p2
    se2 = pooled * (1 - pooled) * (1 / F.col("n_a") + 1 / F.col("n_b"))
    lam = F.sqrt(se2 / (se2 + tau)) * F.exp(
        theta * theta * tau / (2 * se2 * (se2 + tau))
    )
    p_av = F.least(F.lit(1.0), 1 / lam)
    ok = (
        (F.col("n_a") > 0)
        & (F.col("n_b") > 0)
        & (F.col("conv_a") + F.col("conv_b") > 0)
        & (F.col("conv_a") + F.col("conv_b") < F.col("n_a") + F.col("n_b"))
    )
    return counts.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.when(ok, F.round(theta, 6)).alias("theta"),
        F.when(ok, F.round(lam, 4)).alias("lambda_lr"),
        F.when(ok, F.round(p_av, 6)).alias("p_always_valid"),
        F.when(ok, (p_av <= 0.05).cast("int")).alias("reject_at_5pct"),
    )


def ab_msprt_sql(tau: float = _MSPRT_TAU) -> str:
    """DuckDB twin generated from the SAME τ."""
    return f"""
WITH users AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
), arms AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS in_a, conv
  FROM users
), counts AS (
  SELECT CAST(sum(in_a) AS BIGINT) AS n_a,
         CAST(sum(in_a * conv) AS BIGINT) AS conv_a,
         CAST(sum(1 - in_a) AS BIGINT) AS n_b,
         CAST(sum((1 - in_a) * conv) AS BIGINT) AS conv_b
  FROM arms
), calc AS (
  SELECT n_a, conv_a, n_b, conv_b,
         conv_a / n_a - conv_b / n_b AS theta,
         ((conv_a + conv_b) / (n_a + n_b))
           * (1 - (conv_a + conv_b) / (n_a + n_b))
           * (1 / n_a + 1 / n_b) AS se2,
         n_a > 0 AND n_b > 0 AND conv_a + conv_b > 0
           AND conv_a + conv_b < n_a + n_b AS ok
  FROM counts
), lr AS (
  SELECT *,
         sqrt(se2 / (se2 + {tau}))
           * exp(theta * theta * {tau} / (2 * se2 * (se2 + {tau}))) AS lam
  FROM calc
)
SELECT n_a, conv_a, n_b, conv_b,
       CASE WHEN ok THEN round(theta, 6) END AS theta,
       CASE WHEN ok THEN round(lam, 4) END AS lambda_lr,
       CASE WHEN ok THEN round(least(1.0, 1 / lam), 6) END AS p_always_valid,
       CASE WHEN ok THEN CAST(least(1.0, 1 / lam) <= 0.05 AS INT) END
         AS reject_at_5pct
FROM lr
"""


AB_MSPRT_SQL = ab_msprt_sql()


def ab_quantile_effect(events: DataFrame) -> DataFrame:
    """Exact median treatment effect on per-user revenue between the
    two arms — the ROBUST companion to the Welch mean test: revenue is
    heavy-tailed (a few whales move the mean; Welch chases them), and
    the median-shift is the number an analyst trusts when the mean and
    median disagree. Computed WITHOUT sorting rows: per-arm nearest-
    rank median from the (arm, rev, count) frequency table via the
    cumulative-crossing trick (the percentile-granule discipline at
    ceil(n/2)) — exact int64 end to end, one display division.

    Plan: one user-grain shuffle, one (arm, rev) count (map-side
    combined), a 2-partition cumulative window, one 2-row aggregate.
    """
    from kinesis_dstream_spark.functions.exact import fixedpoint

    users = events.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                fixedpoint(F.col("value"), 100),
            ).otherwise(0)
        ).alias("rev")
    )
    freq = (
        users.select(
            (F.col("user_id") % 2 == 0).cast("int").alias("in_a"), "rev"
        )
        .groupBy("in_a", "rev")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cum_w = (
        Window.partitionBy("in_a")
        .orderBy("rev")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = freq.select(
        "in_a",
        "rev",
        F.sum("c").over(cum_w).alias("cum"),
        F.sum("c").over(Window.partitionBy("in_a")).alias("n"),
    )
    med = cum.groupBy("in_a").agg(
        F.max("n").cast("long").alias("n"),
        F.min(
            F.when(F.col("cum") >= F.expr("(n + 1) DIV 2"), F.col("rev"))
        ).alias("med_fp"),
    )
    wide = med.agg(
        F.max(F.when(F.col("in_a") == 1, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("in_a") == 1, F.col("med_fp"))).alias("ma"),
        F.max(F.when(F.col("in_a") == 0, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("in_a") == 0, F.col("med_fp"))).alias("mb"),
    )
    return wide.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.round(F.col("ma") / 100.0, 2).alias("median_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(F.col("mb") / 100.0, 2).alias("median_b"),
        F.round((F.col("ma") - F.col("mb")) / 100.0, 2).alias("median_diff"),
    )


AB_QUANTILE_EFFECT_SQL = """
WITH users AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS rev
  FROM events GROUP BY user_id
), freq AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS in_a, rev,
         count(*) AS c
  FROM users GROUP BY 1, 2
), cum AS (
  SELECT in_a, rev,
         CAST(sum(c) OVER (PARTITION BY in_a ORDER BY rev
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum,
         CAST(sum(c) OVER (PARTITION BY in_a) AS BIGINT) AS n
  FROM freq
), med AS (
  SELECT in_a, max(n) AS n,
         min(CASE WHEN cum >= (n + 1) // 2 THEN rev END) AS med_fp
  FROM cum GROUP BY in_a
)
SELECT CAST(max(CASE WHEN in_a = 1 THEN n END) AS BIGINT) AS n_a,
       round(max(CASE WHEN in_a = 1 THEN med_fp END) / 100.0, 2) AS median_a,
       CAST(max(CASE WHEN in_a = 0 THEN n END) AS BIGINT) AS n_b,
       round(max(CASE WHEN in_a = 0 THEN med_fp END) / 100.0, 2) AS median_b,
       round((max(CASE WHEN in_a = 1 THEN med_fp END)
              - max(CASE WHEN in_a = 0 THEN med_fp END)) / 100.0, 2)
         AS median_diff
FROM med
"""


def value_twap_daily(events: DataFrame) -> DataFrame:
    """Time-weighted average value (TWAP) per (event_type, day) — the
    monitoring/finance aggregate that fixes the plain mean's sampling
    bias: events arrive irregularly, and a burst of cheap readings
    should not drag the day's average the way arrival-weighted mean
    lets it. Each observation is weighted by the time it was "in
    force" (until the next event of its type that day; the last one
    holds until midnight).

    Exactness: timestamps in µs and values on the 100× grid are
    int64; per-term products value_fp·Δt_µs are ≤ ~5·10¹⁵ and the
    per-(type, day) sums are bounded by the day length (Σ Δt ≤
    8.64·10¹⁰ µs), so everything stays int64 with room for three
    more orders of magnitude of value scale; ONE display division.
    The plain mean rides along for the contrast column.

    Plan: one (type, day)-keyed window (lead over event time — the
    partition is a single type-day, bounded), then one aggregate on
    the same key. At 100 TB both hash on the same composite key and
    the exchange is reused (no second shuffle).
    """
    from kinesis_dstream_spark.functions.exact import fixedpoint

    base = events.select(
        "event_type",
        F.to_date("ts").alias("day"),
        # fixture ts is TIMESTAMP_NTZ; the session runs UTC so the
        # cast is value-preserving and matches DuckDB's naive epoch_us
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        "event_id",
        fixedpoint(F.col("value"), 100).alias("iv"),
    )
    w = Window.partitionBy("event_type", "day").orderBy("t_us", "event_id")
    day_end = F.unix_micros(
        F.date_add(F.col("day"), 1).cast("timestamp")
    )
    spans = base.withColumn(
        "dt",
        F.coalesce(F.lead("t_us").over(w), day_end) - F.col("t_us"),
    )
    return (
        spans.groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("iv") * F.col("dt")).alias("wsum"),
            F.sum("dt").alias("tsum"),
            F.sum("iv").alias("vsum"),
        )
        .select(
            "event_type",
            F.col("day").cast("string").alias("day"),
            F.col("n").cast("long").alias("n"),
            # 6dp display: plain_mean lives on the 1/(n·100) grid whose
            # points can sit EXACTLY on 4dp half-boundaries (hit at
            # sf0.001: 30703/8/100 = 38.37875 → HALF_UP vs
            # double-round disagree); no 1/(n·100) point reaches a
            # 7-decimal half-boundary, so 6dp is engine-stable
            F.round(F.col("wsum") / F.col("tsum") / 100.0, 6).alias("twap"),
            F.round(F.col("vsum") / F.col("n") / 100.0, 6).alias("plain_mean"),
        )
    )


VALUE_TWAP_DAILY_SQL = """
WITH base AS (
  SELECT event_type, CAST(ts AS DATE) AS day, epoch_us(ts) AS t_us,
         event_id, CAST(round(value * 100) AS BIGINT) AS iv
  FROM events
), spans AS (
  SELECT event_type, day, iv,
         coalesce(lead(t_us) OVER (PARTITION BY event_type, day
                                   ORDER BY t_us, event_id),
                  epoch_us(CAST(day + INTERVAL 1 DAY AS TIMESTAMP)))
           - t_us AS dt
  FROM base
)
SELECT event_type, CAST(day AS VARCHAR) AS day,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(iv * dt) AS BIGINT)
             / CAST(sum(dt) AS BIGINT) / 100.0, 6) AS twap,
       round(CAST(sum(iv) AS BIGINT) / count(*) / 100.0, 6) AS plain_mean
FROM spans GROUP BY event_type, day
"""


def ab_srm_check(events: DataFrame) -> DataFrame:
    """Sample-ratio-mismatch guardrail — the FIRST thing a trustworthy
    experimentation platform checks (Kohavi's classic failure mode): if
    the realized arm split deviates from the designed 50/50 beyond
    chance, every downstream readout is suspect (assignment bug,
    logging loss, bot filtering skew). One-degree chi-square against
    the expected equal split over exposed USERS: χ² = (n_a − n_b)² /
    (n_a + n_b), flagged at the 3.841 (p = 0.05) critical value.
    Counts exact int64; one double division; NULL on an empty
    experiment.
    """
    users = events.groupBy("user_id").agg(F.lit(1).alias("one"))
    counts = users.select(
        (F.col("user_id") % 2 == 0).cast("int").alias("in_a")
    ).agg(
        F.sum("in_a").cast("long").alias("n_a"),
        F.sum(1 - F.col("in_a")).cast("long").alias("n_b"),
    )
    n = F.col("n_a") + F.col("n_b")
    d = F.col("n_a") - F.col("n_b")
    chi2 = (d * d) / n
    return counts.select(
        "n_a",
        "n_b",
        # 6dp: d²/n is a pure rational — same 4dp half-boundary class
        # as mean_diff (ADVICE r11)
        F.when(n > 0, F.round(chi2, 6)).alias("chi_square"),
        F.when(n > 0, (chi2 > 3.841).cast("int")).alias("srm_detected"),
    )


AB_SRM_CHECK_SQL = """
WITH users AS (
  SELECT user_id FROM events GROUP BY user_id
), counts AS (
  SELECT CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_a,
         CAST(sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT)
           AS n_b
  FROM users
)
SELECT n_a, n_b,
       CASE WHEN n_a + n_b > 0 THEN
         round((n_a - n_b) * (n_a - n_b) / (n_a + n_b), 6)
       END AS chi_square,
       CASE WHEN n_a + n_b > 0 THEN
         CAST((n_a - n_b) * (n_a - n_b) / (n_a + n_b) > 3.841 AS INT)
       END AS srm_detected
FROM counts
"""


def experiment_readout_report(events: DataFrame) -> DataFrame:
    """The experiment DASHBOARD: every readout of the A/B suite as one
    labeled metric table — SRM guardrail first (if it fires, stop
    reading), then conversion z, revenue Welch t, the always-valid
    sequential p, and the robust median effect. One row per metric
    with a uniform (metric, statistic, p_proxy_or_effect, flag)
    shape — what an experimenter actually looks at, and the composed
    proof that the five readouts agree on their shared counts. Each
    leg reuses its oracle-certified operator; the union is the only
    new code.
    """
    srm = ab_srm_check(events).select(
        F.lit("srm_check").alias("metric"),
        F.col("chi_square").alias("statistic"),
        F.col("chi_square").alias("effect"),
        F.col("srm_detected").alias("flag"),
    )
    z = ab_conversion_ztest(events).select(
        F.lit("conversion_z").alias("metric"),
        F.col("z_score").alias("statistic"),
        F.col("rate_diff").alias("effect"),
        F.col("significant_95").alias("flag"),
    )
    t = ab_value_welch_ttest(events).select(
        F.lit("revenue_welch_t").alias("metric"),
        F.col("t_stat").alias("statistic"),
        F.col("mean_diff").alias("effect"),
        F.col("significant_95").alias("flag"),
    )
    av = ab_msprt_always_valid(events).select(
        F.lit("msprt_always_valid").alias("metric"),
        F.col("lambda_lr").alias("statistic"),
        F.col("p_always_valid").alias("effect"),
        F.col("reject_at_5pct").alias("flag"),
    )
    med = ab_quantile_effect(events).select(
        F.lit("median_effect").alias("metric"),
        F.col("median_diff").alias("statistic"),
        F.col("median_diff").alias("effect"),
        F.lit(None).cast("int").alias("flag"),
    )
    return srm.unionByName(z).unionByName(t).unionByName(av).unionByName(med)


EXPERIMENT_READOUT_SQL = f"""
SELECT 'srm_check' AS metric, chi_square AS statistic,
       CAST(chi_square AS DOUBLE) AS effect, srm_detected AS flag
FROM ({AB_SRM_CHECK_SQL})
UNION ALL
SELECT 'conversion_z', z_score, rate_diff, significant_95
FROM ({{z_sql}})
UNION ALL
SELECT 'revenue_welch_t', t_stat, mean_diff, significant_95
FROM ({{t_sql}})
UNION ALL
SELECT 'msprt_always_valid', lambda_lr, p_always_valid, reject_at_5pct
FROM ({{av_sql}})
UNION ALL
SELECT 'median_effect', median_diff, median_diff, CAST(NULL AS INT)
FROM ({{med_sql}})
""".format(
    z_sql=AB_CONVERSION_ZTEST_SQL,
    t_sql=AB_VALUE_WELCH_SQL,
    av_sql=AB_MSPRT_SQL,
    med_sql=AB_QUANTILE_EFFECT_SQL,
)


def cohort_revenue_ltv(events: DataFrame) -> DataFrame:
    """Weekly-cohort cumulative revenue per user (the LTV curve) —
    the money companion to ``cohort_retention``: retention says how
    many users come back, this says what the cohort has EARNED per
    member by each week offset, which is the number growth teams
    actually compare acquisition channels on. Rows cover every
    (cohort, offset) cell with ACTIVITY (same grid as retention), so
    offsets with activity but no purchases show a flat curve segment
    rather than a gap.

    Exactness: purchase revenue is fixed-point int64; the cumulative
    sum is an int window; cohort size is the offset-0 distinct-user
    count; displays at 2dp (exact cents) and 6dp (the 1/(size·100)
    grid never reaches a 7-decimal half boundary — the TWAP rule).

    Plan: one user-grain window (first touch), one (cohort, offset)
    rollup carrying the revenue partial in the same aggregate, one
    cohort-partitioned cumulative window over O(weeks²) rows.
    """
    from kinesis_dstream_spark.functions.exact import fixedpoint

    w = Window.partitionBy("user_id")
    base = events.select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.min(F.to_date("ts")).over(w).alias("first_day"),
        F.when(
            F.col("event_type") == "purchase", fixedpoint(F.col("value"), 100)
        )
        .otherwise(0)
        .alias("rev"),
    )
    shaped = base.select(
        "user_id",
        F.expr(f"datediff(first_day, DATE '{_EPOCH}') DIV 7").alias(
            "cohort_week"
        ),
        F.expr("datediff(day, first_day) DIV 7").alias("week_offset"),
        "rev",
    )
    cells = shaped.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("user_id").alias("active_users"),
        F.sum("rev").alias("rev_fp"),
    )
    wc = Window.partitionBy("cohort_week")
    cum_w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sized = cells.withColumn(
        "cohort_size",
        F.max(
            F.when(F.col("week_offset") == 0, F.col("active_users"))
        ).over(wc),
    ).withColumn("cum_fp", F.sum("rev_fp").over(cum_w))
    return sized.select(
        "cohort_week",
        "week_offset",
        F.col("cohort_size").cast("long").alias("cohort_size"),
        F.round(F.col("rev_fp") / 100.0, 2).alias("week_revenue"),
        F.round(
            F.col("cum_fp") / F.col("cohort_size") / 100.0, 6
        ).alias("cum_ltv_per_user"),
    )


COHORT_REVENUE_LTV_SQL = f"""
WITH firsts AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         min(CAST(ts AS DATE)) OVER (PARTITION BY user_id) AS first_day,
         CASE WHEN event_type = 'purchase'
              THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END AS rev
  FROM events
), shaped AS (
  SELECT user_id,
         date_diff('day', DATE '{{_EPOCH}}', first_day) // 7 AS cohort_week,
         date_diff('day', first_day, day) // 7 AS week_offset,
         rev
  FROM firsts
), cells AS (
  SELECT cohort_week, week_offset,
         count(DISTINCT user_id) AS active_users,
         CAST(sum(rev) AS BIGINT) AS rev_fp
  FROM shaped GROUP BY cohort_week, week_offset
), sized AS (
  SELECT cohort_week, week_offset, rev_fp,
         max(CASE WHEN week_offset = 0 THEN active_users END)
           OVER (PARTITION BY cohort_week) AS cohort_size,
         CAST(sum(rev_fp) OVER (PARTITION BY cohort_week ORDER BY week_offset
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_fp
  FROM cells
)
SELECT cohort_week, week_offset,
       CAST(cohort_size AS BIGINT) AS cohort_size,
       round(rev_fp / 100.0, 2) AS week_revenue,
       round(cum_fp / cohort_size / 100.0, 6) AS cum_ltv_per_user
FROM sized
""".replace("{_EPOCH}", _EPOCH)
