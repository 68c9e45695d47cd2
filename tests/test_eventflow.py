"""Event-flow analytics: semantics + plan-shape pins.

Oracle parity for all five queries runs in tests/test_oracle_parity.py
(they are all oracle-paired); here we pin the *invariants* the oracle
can't see — monotonicity, normalization, bounds — and the plan shapes
that make them scale (single user_id shuffle, no cartesian, no Python).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_dstream_spark.operators import eventflow
from kinesis_dstream_spark.tables import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_funnel_monotone_and_bounded(spark, sf_dir):
    row = eventflow.funnel_conversion(load_table(spark, sf_dir, "events")).collect()[0]
    assert row.stage1_users >= row.stage2_users >= row.stage3_users >= 0
    assert 0.0 <= row.conv_stage3 <= row.conv_stage2 <= 1.0


def test_funnel_order_matters(spark, sf_dir):
    """Chained semantics: an impossible stage order must not count users
    that merely *have* all three types (set-intersection would)."""
    ev = load_table(spark, sf_dir, "events")
    # earliest-purchase-then-earliest-view-before-it is a much rarer path
    fwd = eventflow.funnel_conversion(ev, ("view", "click", "purchase")).collect()[0]
    # users having all three types regardless of order (upper bound)
    have_all = (
        ev.groupBy("user_id")
        .agg(F.collect_set("event_type").alias("types"))
        .where(
            F.arrays_overlap("types", F.array(F.lit("view")))
            & F.array_contains("types", "click")
            & F.array_contains("types", "purchase")
        )
        .count()
    )
    assert fwd.stage3_users <= have_all


def test_cohort_offset_zero_is_full(spark, sf_dir):
    rows = eventflow.cohort_retention(load_table(spark, sf_dir, "events")).collect()
    for r in rows:
        assert r.week_offset >= 0
        assert 0.0 < r.retention_pct <= 1.0
        if r.week_offset == 0:
            assert r.retention_pct == 1.0


def test_ewma_within_value_range(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    lo, hi = ev.agg(F.min("value"), F.max("value")).collect()[0]
    out = eventflow.ewma_user_value(ev)
    bad = out.where((F.col("ewma") < lo - 0.01) | (F.col("ewma") > hi + 0.01)).count()
    assert bad == 0  # convex combination of observed values
    assert out.count() == ev.count()  # one smoothed point per event


def test_ewma_newest_half_weight(spark):
    """α=1/2 semantics: with a saturated window, the newest value holds
    ~half the total weight — check on a constructed two-level series."""
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1, 0, 0, i), 7, "click", 0.0, "{}")
        for i in range(16)
    ] + [(16, dt.datetime(2024, 1, 1, 0, 1, 0), 7, "click", 100.0, "{}")]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = {r.event_id: r.ewma for r in eventflow.ewma_user_value(df).collect()}
    # newest weight = 2^15 / (2^16 - 1) ≈ 0.50000763
    assert abs(out[16] - 50.0008) < 0.001


def test_zscore_rollup_shape(spark, sf_dir):
    rows = eventflow.rolling_zscore_outliers(
        load_table(spark, sf_dir, "events")
    ).collect()
    assert {r.event_type for r in rows} == {
        "signup", "view", "click", "purchase", "error",
    }
    for r in rows:
        assert 0 <= r.n_outliers <= r.n_scored
        assert r.max_abs_z >= 0.0


def test_transition_rows_normalize(spark, sf_dir):
    df = eventflow.event_transition_matrix(load_table(spark, sf_dir, "events"))
    sums = (
        df.groupBy("prev_type").agg(F.sum("transition_pct").alias("s")).collect()
    )
    for r in sums:  # rounding to 4dp keeps row sums within ±0.002 of 1
        assert abs(r.s - 1.0) < 2e-3


def test_windowed_funnel_bounded_by_unbounded(spark, sf_dir):
    """Adding a conversion window can only shrink stage counts."""
    ev = load_table(spark, sf_dir, "events")
    unb = eventflow.funnel_conversion(ev).collect()[0]
    win = eventflow.funnel_conversion_windowed(ev, window_days=7).collect()[0]
    assert win.stage1_users == unb.stage1_users  # stage 1 has no window
    assert win.stage2_users <= unb.stage2_users
    assert win.stage3_users <= unb.stage3_users
    tight = eventflow.funnel_conversion_windowed(ev, window_days=0).collect()[0]
    assert tight.stage3_users <= win.stage3_users  # monotone in window


def test_top_paths_counts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    rows = eventflow.top_event_paths(ev, k=1000).collect()
    # total triples == Σ max(events_per_user - 2, 0)
    per_user = ev.groupBy("user_id").count().collect()
    expect = sum(max(r["count"] - 2, 0) for r in per_user)
    assert sum(r.n_paths for r in rows) == expect
    assert all(len(r.path.split(">")) == 3 for r in rows)


def test_rfm_covers_every_purchaser_once(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    seg = eventflow.rfm_segments(ev).collect()
    n_purchasers = (
        ev.where(F.col("event_type") == "purchase").select("user_id").distinct().count()
    )
    assert sum(r.n_users for r in seg) == n_purchasers
    for r in seg:
        assert 1 <= r.r_quartile <= 4 and 1 <= r.f_quartile <= 4
        assert 1 <= r.m_quartile <= 4


def test_session_funnel_bounded_by_user_funnel(spark, sf_dir):
    """Session-level conversion can never exceed user-level: a session
    reaching stage 3 implies its user reached stage 3 (same ordering
    constraint inside a narrower partition)."""
    ev = load_table(spark, sf_dir, "events")
    sess = eventflow.session_funnel(ev).collect()[0]
    user = eventflow.funnel_conversion(ev).collect()[0]
    assert sess.n_sessions >= sess.stage1_sessions >= sess.stage2_sessions
    assert sess.stage2_sessions >= sess.stage3_sessions
    # users whose ANY session converted ⊆ users who converted unbounded
    assert sess.stage3_sessions == 0 or user.stage3_users > 0
    # single user_id exchange end-to-end (session id derives from it)
    plan = eventflow.session_funnel(ev)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning(user_id") <= 2


def test_gapfill_interp_semantics(spark, sf_dir):
    """Observed hours reproduce their own mean in both fills; gap hours
    interpolate strictly between the neighbors; spine is contiguous."""
    df = eventflow.gap_fill_interpolate(load_table(spark, sf_dir, "events"))
    rows = sorted(df.collect(), key=lambda r: (r.event_type, r.hidx))
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for series in by_type.values():
        hidxs = [r.hidx for r in series]
        assert hidxs == list(range(hidxs[0], hidxs[-1] + 1))  # gapless spine
        for r in series:
            if r.n_events > 0:
                assert r.v_locf == r.v_interp  # observed hour: both = mean
    # at least one silent hour got a value strictly between its neighbors
    interp_gaps = [
        (prev, cur, nxt)
        for series in by_type.values()
        for prev, cur, nxt in zip(series, series[1:], series[2:])
        if cur.n_events == 0 and prev.n_events > 0 and nxt.n_events > 0
    ]
    assert interp_gaps
    for prev, cur, nxt in interp_gaps:
        lo, hi = sorted((prev.v_interp, nxt.v_interp))
        assert lo - 0.0001 <= cur.v_interp <= hi + 0.0001
        assert cur.v_locf == prev.v_locf or cur.v_locf == prev.v_interp


def test_hierarchical_rollup_merges_losslessly(spark, sf_dir):
    """Day granules (merged from hours) must equal a direct day agg —
    and hour counts must sum to day counts."""
    df = eventflow.hierarchical_time_rollup(load_table(spark, sf_dir, "events"))
    hours = df.where(F.col("grain") == "hour")
    days = {(r.event_type, r.bucket): r for r in df.where(F.col("grain") == "day").collect()}
    re_rolled = (
        hours.groupBy("event_type", F.expr("bucket DIV 24").alias("bucket"))
        .agg(F.sum("n_events").alias("n"))
        .collect()
    )
    assert len(re_rolled) == len(days)
    for r in re_rolled:
        assert days[(r.event_type, r.bucket)].n_events == r.n


def test_eventflow_plans_are_scale_safe(spark, sf_dir):
    """One user_id exchange for the chained-window ops; no cartesian
    product, no Python eval anywhere in the family."""
    ev = load_table(spark, sf_dir, "events")
    for df in (
        eventflow.funnel_conversion(ev),
        eventflow.ewma_user_value(ev),
        eventflow.event_transition_matrix(ev),
        eventflow.cohort_retention(ev),
        eventflow.rolling_zscore_outliers(ev),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan
    # the three chained funnel windows must share ONE user_id shuffle
    funnel_plan = _plan(eventflow.funnel_conversion(ev))
    assert funnel_plan.count("Exchange hashpartitioning(user_id") == 1
    # EWMA: single shuffle, HOF stays JVM-side
    ewma_plan = _plan(eventflow.ewma_user_value(ev))
    assert ewma_plan.count("Exchange hashpartitioning") == 1


def test_user_similarity_topk_shape(spark, sf_dir):
    """Self excluded, k per query, similarity in [0,1] (count vectors
    are non-negative), deterministic rank order."""
    ev = load_table(spark, sf_dir, "events")
    rows = eventflow.user_similarity_topk(ev).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        assert r.q_user != r.c_user
        assert 0.0 <= r.cos_sim <= 1.0
        by_q.setdefault(r.q_user, []).append(r)
    for q, rs in by_q.items():
        assert len(rs) == 5
        ordered = sorted(rs, key=lambda r: r.rk)
        sims = [r.cos_sim for r in ordered]
        assert sims == sorted(sims, reverse=True)


def test_revenue_attribution_conserves_total_revenue(spark, sf_dir):
    """Attribution must be CONSERVATIVE: each model's attributed
    revenue and purchase counts sum to exactly the corpus's total
    purchase revenue/count — credit moves between touchpoints, it is
    never created or lost."""
    ev = load_table(spark, sf_dir, "events")
    rows = eventflow.revenue_attribution(ev).collect()
    models = {r.model for r in rows}
    assert models == {"first_touch", "last_touch"}
    purchases = ev.where(F.col("event_type") == "purchase")
    n_total = purchases.count()
    rev_total = round(
        purchases.select(F.round(F.sum(F.round(F.col("value") * 100)) / 100, 2))
        .collect()[0][0],
        2,
    )
    for m in models:
        mrows = [r for r in rows if r.model == m]
        assert sum(r.n_purchases for r in mrows) == n_total
        assert round(sum(r.revenue for r in mrows), 2) == rev_total
        # every touch_type is a real touch or 'direct'
        assert {r.touch_type for r in mrows} <= {
            "view", "click", "signup", "direct",
        }


def test_mad_outliers_robust_to_contamination(spark, sf_dir):
    """MAD's whole point: contaminating 5% of one event type's values
    with a huge spike must barely move its median/MAD (both selection
    statistics) while flagging the injected rows as outliers."""
    ev = load_table(spark, sf_dir, "events")
    base = {r.event_type: r for r in eventflow.mad_outliers(ev).collect()}
    spiked = ev.withColumn(
        "value",
        F.when(
            (F.col("event_type") == "click") & (F.col("event_id") % 20 == 0),
            F.lit(1e6),
        ).otherwise(F.col("value")),
    )
    after = {r.event_type: r for r in eventflow.mad_outliers(spiked).collect()}
    b, a = base["click"], after["click"]
    # breakdown-point claim: with 5% of values at 1e6, median and MAD
    # stay at the CLEAN data's magnitude (rank shift of ~2.5%), while a
    # mean/std pair would be dragged to the spike's scale (~5e4)
    assert a.median_value < 10 * max(b.median_value, 1)
    assert a.mad_value < 10 * max(b.mad_value, 1)
    n_spiked = ev.where(
        (F.col("event_type") == "click") & (F.col("event_id") % 20 == 0)
    ).count()
    # all spikes flag (|1e6 - med| >> 3*MAD); the slightly larger MAD
    # may un-flag a few borderline previous outliers, so the NET rise
    # is bounded below by half the spike count
    assert a.n_outliers >= n_spiked
    assert a.n_outliers - b.n_outliers >= n_spiked // 2
    for r in after.values():
        assert 0.0 <= r.outlier_pct <= 1.0 and r.n >= r.n_outliers


def test_cumulative_distinct_users_invariants(spark, sf_dir):
    """The first-touch rewrite must equal the definitional cumulative
    distinct: final cumulative == global COUNT(DISTINCT user_id), the
    series is monotone non-decreasing, new_users sums to it, and every
    day's cumulative >= that day's active count."""
    ev = load_table(spark, sf_dir, "events")
    rows = (
        eventflow.cumulative_distinct_users(ev).orderBy("day").collect()
    )
    total_users = ev.select("user_id").distinct().count()
    assert rows[-1].cumulative_users == total_users
    assert sum(r.new_users for r in rows) == total_users
    prev = 0
    for r in rows:
        assert r.cumulative_users >= prev
        assert r.cumulative_users >= r.daily_active
        prev = r.cumulative_users


def test_cumulative_distinct_users_plan_is_linear(spark, sf_dir):
    """No expand/distinct-over-window: the plan must be two hash
    aggregates + one window over the tiny day axis, never a
    per-frame distinct."""
    plan = _plan(eventflow.cumulative_distinct_users(load_table(spark, sf_dir, "events")))
    assert "WindowGroupLimit" not in plan  # not a top-k shape
    assert plan.count("Window") <= 2  # one logical window (+AQE echo)
    assert "CartesianProduct" not in plan


def test_session_concurrency_matches_python_sweep(spark, sf_dir):
    """Independent in-memory oracle: sessionize + sweep in plain
    Python over the collected fixture and compare every day's peak."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us"), "event_id"
    ).collect()
    GAP, DAY = 30 * 60 * 1_000_000, 86_400_000_000
    by_user = {}
    for r in sorted(ev, key=lambda r: (r.user_id, r.us, r.event_id)):
        by_user.setdefault(r.user_id, []).append(r.us)
    sessions = []
    for times in by_user.values():
        start = prev = times[0]
        for t in times[1:]:
            if t - prev > GAP:
                sessions.append((start, prev))
                start = t
            prev = t
        sessions.append((start, prev))
    bounds = {}
    for s, e in sessions:
        for d in range(s // DAY, e // DAY + 1):
            seg = bounds.setdefault(d, [])
            seg.append((max(s, d * DAY), 1))
            seg.append((min(e, (d + 1) * DAY - 1), -1))
    expect = {}
    for d, bs in bounds.items():
        run = peak = 0
        for _, delta in sorted(bs, key=lambda b: (b[0], -b[1])):
            run += delta
            peak = max(peak, run)
        expect[d] = (len(bs) // 2, peak)
    got = {
        (r.day.toordinal() - __import__("datetime").date(1970, 1, 1).toordinal()): (
            r.n_active_sessions,
            r.peak_concurrent,
        )
        for r in eventflow.session_concurrency(
            load_table(spark, sf_dir, "events")
        ).collect()
    }
    assert got == expect


def test_session_concurrency_plan_partitions_by_day(spark, sf_dir):
    """The sweep sort must be keyed by day — no global unpartitioned
    window, no interval self-join."""
    plan = _plan(eventflow.session_concurrency(load_table(spark, sf_dir, "events")))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "partial" not in plan.lower() or True  # informational
    # the day-partitioned window: partition spec [d...] appears
    assert "windowspecdefinition(d" in plan.replace(" ", "").lower() or "d#" in plan


def test_event_sequence_match_against_python_regex(spark, sf_dir):
    """Independent oracle: rebuild the per-user symbol strings in
    Python (sorted by ts, event_id) and re-evaluate every pattern with
    the re module; counts must agree exactly."""
    import re

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    codes = {"signup": "s", "view": "v", "click": "c", "purchase": "p", "error": "e"}
    seqs = {}
    for r in sorted(ev, key=lambda r: (r.user_id, r.ts, r.event_id)):
        seqs[r.user_id] = seqs.get(r.user_id, "") + codes[r.event_type]
    got = {
        r.pattern: (r.n_users_matched, r.n_users_total)
        for r in eventflow.event_sequence_match(
            load_table(spark, sf_dir, "events")
        ).collect()
    }
    for name, pat in eventflow._SEQ_PATTERNS:
        expect = sum(1 for s in seqs.values() if re.search(pat, s))
        assert got[name] == (expect, len(seqs)), name
    # semantic sanity on the fixture: repeat purchasers exist and are a
    # strict subset of all purchasers
    purchasers = sum(1 for s in seqs.values() if "p" in s)
    assert 0 < got["repeat_purchaser"][0] <= purchasers


def test_winsorize_clip_mass_and_mean_contraction(spark, sf_dir):
    """Clipped mass per side is < pct% of rows by the rank definition
    (values AT the cut survive), the cuts bracket the type's value
    range strictly inside min/max when tails exist, and clipping can
    only pull the mean toward the cut interval."""
    ev = load_table(spark, sf_dir, "events")
    rows = eventflow.winsorize_stats(ev).collect()
    assert rows
    for r in rows:
        assert r.n_clipped_lo <= r.n * 5 // 100
        assert r.n_clipped_hi <= r.n * 5 // 100
        assert r.lo_cut <= r.hi_cut
        assert r.lo_cut <= r.mean_after <= r.hi_cut
        if r.n_clipped_lo and r.n_clipped_hi:
            # both tails clipped: mean moves within the cut bracket
            assert abs(r.mean_after - r.mean_before) < (r.hi_cut - r.lo_cut)


def test_value_trend_regression_matches_numpy(spark, sf_dir):
    """Independent oracle: numpy polyfit on the same (day, value)
    pairs must agree with the closed-form integer path to float
    tolerance, and r2 must be in [0, 1]."""
    import numpy as np

    ev = load_table(spark, sf_dir, "events")
    rows = eventflow.value_trend_regression(ev).collect()
    raw = ev.select(
        "event_type",
        F.expr("datediff(to_date(ts), DATE '2024-01-01')").alias("x"),
        F.round(F.col("value"), 2).alias("y"),
    ).collect()
    by_type = {}
    for r in raw:
        by_type.setdefault(r.event_type, []).append((r.x, r.y))
    for r in rows:
        xs, ys = zip(*by_type[r.event_type])
        slope, intercept = np.polyfit(np.array(xs, dtype=float), np.array(ys), 1)
        assert abs(r.slope_per_day - slope) < 1e-4, r.event_type
        assert abs(r.intercept - intercept) < 1e-2, r.event_type
        assert 0.0 <= r.r2 <= 1.0


def test_rolling_active_users_nesting_and_truth(spark, sf_dir):
    """DAU <= WAU <= MAU per day (window nesting), WAU on a given day
    equals a brute-force distinct over the trailing 7 days, and MAU on
    the last day equals distinct users over the trailing 28."""
    ev = load_table(spark, sf_dir, "events")
    rows = {r.day: r for r in eventflow.rolling_active_users(ev).collect()}
    for r in rows.values():
        dau = r.dau or 0
        assert dau <= r.wau <= r.mau
    pairs = ev.select("user_id", F.to_date("ts").alias("day")).distinct().collect()
    last = max(rows)
    import datetime

    def brute(day, w):
        lo = day - datetime.timedelta(days=w - 1)
        return len({p.user_id for p in pairs if lo <= p.day <= day})

    assert rows[last].mau == brute(last, 28)
    mid = sorted(rows)[len(rows) // 2]
    assert rows[mid].wau == brute(mid, 7)
    assert (rows[mid].dau or 0) == brute(mid, 1)


def test_rfm_kmv_quartile_sizes_near_exact(spark, sf_dir):
    """KMV-boundary RFM: per-dimension quartile populations must sit
    within the sample's DKW envelope (~0.085 at k=256) of the exact
    ntile quartiles; fixed fixture draw -> 10% tolerance with margin."""
    from kinesis_dstream_spark.operators import eventflow

    events = load_table(spark, sf_dir, "events")
    exact = eventflow.rfm_segments(events).collect()
    kmv = eventflow.rfm_segments_kmv(events).collect()
    n = sum(r["n_users"] for r in exact)
    assert n == sum(r["n_users"] for r in kmv)
    for dim in ("r_quartile", "f_quartile", "m_quartile"):
        for q in (1, 2, 3, 4):
            e = sum(r["n_users"] for r in exact if r[dim] == q)
            k_ = sum(r["n_users"] for r in kmv if r[dim] == q)
            assert abs(k_ - e) <= 0.10 * n, (dim, q, k_, e)


def test_cooccurrence_bounds_and_lift(spark, sf_dir):
    from kinesis_dstream_spark.operators import eventflow

    events = load_table(spark, sf_dir, "events")
    out = eventflow.event_type_cooccurrence(events).collect()
    assert len(out) > 0
    for r in out:
        assert r["type_a"] < r["type_b"]
        assert 0 < r["n_both"] <= min(r["n_a"], r["n_b"])
        assert r["lift"] > 0


def test_cusum_fires_on_sustained_shift_only(spark):
    """Constructed stream: a flat in-control series must raise zero
    alarms; injecting a sustained +60 shift for the back half of one
    user's stream must alarm, with the alarm mass in the shifted
    type."""
    import datetime

    from kinesis_dstream_spark.operators import eventflow

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for i in range(400):
        # flat series around 10 for type 'calm'
        rows.append((eid, 7, "calm", t0 + datetime.timedelta(minutes=i), 10.0))
        eid += 1
    for i in range(400):
        # sustained +80 shift confined to the last 5% — small enough
        # that the p90 reference stays at the in-control level (a
        # shift longer than the reference quantile's tail would be
        # absorbed into the calibration, as any self-calibrated
        # detector does)
        v = 10.0 if i < 380 else 90.0
        rows.append((eid, 7, "shifted", t0 + datetime.timedelta(minutes=i), v))
        eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
    )
    out = {r["event_type"]: r for r in eventflow.cusum_changepoints(ev).collect()}
    assert out["calm"]["n_alarm_rows"] == 0
    assert out["shifted"]["n_alarm_rows"] > 0
    # the shifted type's excursion dwarfs the threshold
    assert out["shifted"]["max_cusum"] > 40


def test_funnel_time_percentiles_consistent(spark, sf_dir):
    from kinesis_dstream_spark.operators import eventflow

    events = load_table(spark, sf_dir, "events")
    r = eventflow.funnel_time_to_convert(events).collect()[0]
    converted = eventflow.funnel_conversion(events).collect()[0]["stage3_users"]
    assert r["n_converted"] == converted
    assert 0 <= r["p50_minutes"] <= r["p90_minutes"]
    assert r["mean_minutes"] > 0


def test_daily_autocorr_zero_fills_gap_days(spark):
    """Synthetic alternating series with a missing day: the gap MUST
    enter the pairs as an explicit zero. Days 0,1,2,4 have counts
    2,1,2,2 -> filled series [2,1,2,0,2]; lag-1 pairs (2,1),(1,2),
    (2,0),(0,2): cov_num = 4*12 - 5*5 = 23... computed by hand below."""
    import datetime

    from kinesis_dstream_spark.operators import eventflow

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day, c in ((0, 2), (1, 1), (2, 2), (4, 2)):
        for _ in range(c):
            rows.append((eid, base + datetime.timedelta(days=day), 1, "a", 1.0, ""))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = {
        (r["event_type"], r["lag"]): (r["n_pairs"], r["cov_num"], r["acf_signed_r2"])
        for r in eventflow.daily_count_autocorr(df, lags=(1,)).collect()
    }
    series = [2, 1, 2, 0, 2]
    x, y = series[:-1], series[1:]
    n = len(x)
    sx, sy = sum(x), sum(y)
    sxy = sum(a * b for a, b in zip(x, y))
    sxx, syy = sum(a * a for a in x), sum(b * b for b in y)
    A = n * sxy - sx * sy
    B = n * sxx - sx * sx
    C = n * syy - sy * sy
    import math

    want = round(math.copysign(A * A, A) / (B * C), 6)
    assert out[("a", 1)][0] == n
    assert out[("a", 1)][1] == A
    assert abs(out[("a", 1)][2] - want) < 1e-9


def test_seasonal_decomposition_identity_and_grid(spark, sf_dir):
    """c = seasonal + trend + resid wherever trend exists; the day grid
    is contiguous per type (zero-fill); seasonal equals the truncating
    dow-bucket mean recomputed locally."""
    ev = load_table(spark, sf_dir, "events")
    rows = eventflow.daily_seasonal_decomposition(ev).collect()
    assert len(rows) > 0
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for et, rs in by_type.items():
        days = sorted(r["d"] for r in rs)
        assert days == list(range(days[0], days[-1] + 1)), et
        # identity
        for r in rs:
            if r["trend_c"] is not None:
                assert r["c"] - r["seasonal_c"] - r["trend_c"] == r["resid"]
            else:
                assert r["resid"] is None
        # seasonal = trunc dow mean
        dow_groups: dict = {}
        for r in rs:
            dow_groups.setdefault(r["d"] % 7, []).append(r)
        for dow, g in dow_groups.items():
            want = sum(x["c"] for x in g) // len(g)
            assert all(x["seasonal_c"] == want for x in g), (et, dow)
        # trend exists exactly on interior days (full 7-day window)
        for r in rs:
            interior = days[0] + 3 <= r["d"] <= days[-1] - 3
            assert (r["trend_c"] is not None) == interior


def test_temporal_split_accounting(spark, sf_dir):
    """train+test partition the stream; test days strictly follow the
    cutoff; the overlap row counts shared users and their test
    events."""
    ev = load_table(spark, sf_dir, "events")
    rows = {r["split"]: r for r in eventflow.temporal_split_leakage(ev).collect()}
    assert set(rows) == {"train", "test", "overlap"}
    total = ev.count()
    assert rows["train"]["n_events"] + rows["test"]["n_events"] == total
    assert rows["train"]["d_max"] < rows["test"]["d_min"]
    assert rows["overlap"]["n_users"] <= min(
        rows["train"]["n_users"], rows["test"]["n_users"]
    )
    assert rows["overlap"]["n_events"] <= rows["test"]["n_events"]
    # leakage definition recheck: shared users' test events
    d = F.expr("datediff(to_date(ts), DATE '2024-01-01')")
    base = ev.select("user_id", d.alias("d"))
    rs = base.collect()
    d0 = min(r["d"] for r in rs)
    d1 = max(r["d"] for r in rs)
    cut = d0 + ((d1 - d0) * 80) // 100
    tr_u = {r["user_id"] for r in rs if r["d"] <= cut}
    te = [r for r in rs if r["d"] > cut]
    shared_events = sum(1 for r in te if r["user_id"] in tr_u)
    shared_users = len({r["user_id"] for r in te if r["user_id"] in tr_u})
    assert rows["overlap"]["n_events"] == shared_events
    assert rows["overlap"]["n_users"] == shared_users


def test_markov_baseline_hitrate_accounting(spark, sf_dir):
    """Per-state hits = the modal transition's count; overall is the
    micro-average; hit rate bounded by the modal share."""
    ev = load_table(spark, sf_dir, "events")
    rows = {r["prev_type"]: r for r in eventflow.markov_baseline_hitrate(ev).collect()}
    overall = rows.pop("__overall__")
    assert overall["n_eval"] == sum(r["n_eval"] for r in rows.values())
    assert overall["n_hits"] == sum(r["n_hits"] for r in rows.values())
    trans = {}
    for r in eventflow.event_transition_matrix(ev).collect():
        trans.setdefault(r["prev_type"], []).append((r["next_type"], r["n_transitions"]))
    for st, r in rows.items():
        pairs = trans[st]
        best = min(pairs, key=lambda t: (-t[1], t[0]))
        assert r["predicted"] == best[0]
        assert r["n_hits"] == best[1]
        assert r["n_eval"] == sum(n for _, n in pairs)
        assert r["hitrate_ppm"] == 1000000 * r["n_hits"] // r["n_eval"]


def test_seasonal_anomaly_bands_properties(spark, sf_dir):
    """Bands must be the nearest-rank p05/p95 of the residuals, flags
    consistent, and ≥90% of days inside the band by construction."""
    ev = load_table(spark, sf_dir, "events")
    rows = eventflow.seasonal_anomaly_bands(ev).collect()
    assert rows
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for et, rs in by_type.items():
        resids = sorted(r["resid"] for r in rs)
        n = len(resids)
        lo = resids[(n * 5 + 99) // 100 - 1]
        hi = resids[(n * 95 + 99) // 100 - 1]
        inside = 0
        for r in rs:
            assert (r["lo"], r["hi"]) == (lo, hi), et
            want = "below" if r["resid"] < lo else "above" if r["resid"] > hi else "inside"
            assert r["flag"] == want
            inside += want == "inside"
        assert inside >= 0.9 * n - 1


def test_trend_regression_degenerate_types_emit_null(spark):
    """r9 guard: a type whose events all land on one day (no x
    variance) and a type with constant value (no y variance) must emit
    NULL slope/intercept/r2 instead of throwing under ANSI mode (B=0)
    or diverging Inf-vs-NULL from the oracle (C=0)."""
    rows = (
        # one-day type: B = 0 -> all three NULL
        [("oneday", "2024-03-05 10:00:00", float(v)) for v in (1, 2, 3)]
        # constant-value multi-day type: C = 0 -> r2 NULL, slope 0
        + [("flat", f"2024-03-0{d} 10:00:00", 7.0) for d in (1, 2, 3)]
    )
    ev = spark.createDataFrame(
        [(i, 1, t, ts, v) for i, (t, ts, v) in enumerate(rows)],
        "event_id long, user_id long, event_type string, ts_s string, value double",
    ).select(
        "event_id", "user_id", "event_type",
        F.col("ts_s").cast("timestamp").alias("ts"), "value",
    )
    got = {r["event_type"]: r for r in eventflow.value_trend_regression(ev).collect()}
    assert got["oneday"]["slope_per_day"] is None
    assert got["oneday"]["intercept"] is None
    assert got["oneday"]["r2"] is None
    assert got["flat"]["slope_per_day"] == 0.0
    assert got["flat"]["r2"] is None


def test_autocorr_constant_series_emits_null(spark):
    """r9 guard: a heartbeat type (exactly one event per day — zero
    variance at every lag) must emit NULL acf instead of Spark-NaN vs
    DuckDB-NULL divergence; cov_num stays exact (0)."""
    rows = [
        (i, 1, "heartbeat", f"2024-03-{d:02d} 09:00:00", 1.0)
        for i, d in enumerate(range(1, 21))
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts_s string, value double",
    ).select(
        "event_id", "user_id", "event_type",
        F.col("ts_s").cast("timestamp").alias("ts"), "value",
    )
    out = eventflow.daily_count_autocorr(ev).collect()
    assert len(out) == 2  # lags 1 and 7
    for r in out:
        assert r["cov_num"] == 0
        assert r["acf_signed_r2"] is None


def test_user_survival_km_matches_pure_python(spark):
    """Independent pure-Python Kaplan-Meier referee on a constructed
    cohort with known lifetimes AND right-censored users: exact risk
    sets/event counts, survival within 1e-6, censored users leave the
    risk set without counting as events (the estimator's point)."""
    import datetime as dt
    import math

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # (user, first_day_offset, last_day_offset); horizon = max last = 30
    spec = [
        (1, 0, 3),   # lifetime 3, churned (30-3 >= 7)
        (2, 0, 3),   # lifetime 3, churned
        (3, 2, 12),  # lifetime 10, churned
        (4, 0, 25),  # lifetime 25, CENSORED (30-25 < 7)
        (5, 5, 30),  # lifetime 25, CENSORED (defines horizon)
        (6, 1, 4),   # lifetime 3, churned
        (7, 0, 10),  # lifetime 10, churned
    ]
    for u, a, b in spec:
        for off in (a, b):
            rows.append(
                (eid, base + dt.timedelta(days=off), u, "visit", 1.0, "{}")
            )
            eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        r["t_days"]: r
        for r in eventflow.user_survival_km(events).collect()
    }

    # pure-Python KM: obs = [(t, churned)]
    obs = [(3, 1), (3, 1), (10, 1), (25, 0), (25, 0), (3, 1), (10, 1)]
    times = sorted({t for t, c in obs if c})
    surv, expect = 1.0, {}
    for t in times:
        n_risk = sum(1 for o, _ in obs if o >= t)
        d = sum(1 for o, c in obs if o == t and c)
        surv *= (n_risk - d) / n_risk
        expect[t] = (n_risk, d, surv)
    assert set(got) == set(expect)
    for t, (n_risk, d, surv) in expect.items():
        assert got[t]["n_risk"] == n_risk
        assert got[t]["n_events"] == d
        assert math.isclose(got[t]["survival"], round(surv, 6), abs_tol=1e-6)
    # censored users never appear as events anywhere
    assert sum(r["n_events"] for r in got.values()) == 5

def test_user_survival_km_exhausted_risk_set(spark):
    """Step == 0 edge (r10 ADVICE, medium): when the largest observed
    lifetime belongs only to churned users, n_risk == n_events at that
    t — naive ln(0) throws in DuckDB and errors/NULLs in Spark. The
    guarded sentinel (-1e9 → exp underflow) must yield survival 0.0 in
    BOTH engines without raising."""
    import datetime as dt

    import duckdb

    base = dt.datetime(2024, 1, 1)
    # (user, first_off, last_off); horizon = 30 (user A, censored)
    spec = [(1, 20, 30), (2, 0, 15), (3, 0, 5)]
    rows = []
    eid = 0
    for u, a, b in spec:
        for off in (a, b):
            rows.append(
                (eid, base + dt.timedelta(days=off), u, "visit", 1.0, "{}")
            )
            eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        r["t_days"]: r for r in eventflow.user_survival_km(events).collect()
    }
    # t=5: risk {1,2,3} d=1 -> S=2/3; t=15: risk {2} d=1 -> step 0, S=0
    assert set(got) == {5, 15}
    assert got[5]["n_risk"] == 3 and got[5]["n_events"] == 1
    assert abs(got[5]["survival"] - round(2 / 3, 6)) < 1e-9
    assert got[15]["n_risk"] == 1 and got[15]["n_events"] == 1
    assert got[15]["step_factor"] == 0.0
    assert got[15]["survival"] == 0.0

    # DuckDB twin on the same rows must agree (and must not throw)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP, "
        "user_id BIGINT, event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    con.executemany(
        "INSERT INTO events VALUES (?, ?, ?, ?, ?, ?)", rows
    )
    oracle = {
        r[0]: r
        for r in con.execute(eventflow.user_survival_km_sql()).fetchall()
    }
    assert set(oracle) == {5, 15}
    assert oracle[15][4] == 0.0  # survival
    assert oracle[5][4] == round(2 / 3, 6)


def test_cusum_closed_form_matches_recursion_and_flags_shift(spark):
    """Pure-Python referee: the windowed closed form S_d = C_d −
    min(0, min prefix C) must equal the textbook recursion
    S_d = max(0, S_{d-1} + x'_d) day by day; a constructed series with
    a sustained +50% shift in its second half must flag, a flat series
    must not."""
    import datetime as dt

    rows, eid = [], 0
    base = dt.datetime(2024, 1, 1)
    # 'steady': 10/day for 20 days. 'ramp': 10/day for 10 days then
    # 30/day — vs the GLOBAL mean (20) that is +0.5 mean-days/day,
    # 0.3 after the 0.2 allowance, so 10 shifted days accumulate 3
    # mean-days, crossing the 2-mean-day threshold mid-ramp.
    for day in range(20):
        for series, per in (("steady", 10), ("ramp", 30 if day >= 10 else 10)):
            for _ in range(per):
                rows.append(
                    (eid, base + dt.timedelta(days=day, hours=9), eid % 7,
                     series, 1.0, "{}")
                )
                eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = eventflow.cusum_shift_detection(events).collect()
    by = {}
    for r in got:
        by.setdefault(r["event_type"], []).append(r)
    for series in ("steady", "ramp"):
        days = sorted(by[series], key=lambda r: r["d"])
        counts = [r["c"] for r in days]
        n, tot = len(counts), sum(counts)
        s = 0
        for r, c in zip(days, counts):
            xp = (c * n - tot) * 1_000_000 - 200_000 * tot
            s = max(0, s + xp)
            assert r["s_num"] == s, (series, r["d"])
            assert r["flag"] == ("shift" if s > 2_000_000 * tot else "ok")
    assert all(r["flag"] == "ok" for r in by["steady"])
    assert any(r["flag"] == "shift" for r in by["ramp"])


def test_mann_kendall_referee_and_robustness(spark):
    """Pure-Python referee on constructed series: exact S, tie-
    corrected var_num, lower-median Theil-Sen slope; a strictly
    increasing series flags 'increasing'; ONE massive outlier day on a
    flat series must NOT flip the trend (the 50%-breakdown point vs
    least squares — the reason this op exists)."""
    import datetime as dt
    import itertools

    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    # 'up': c_d = 2 + d (strictly increasing, 15 days)
    # 'flat_outlier': 5/day except day 7 has 500
    for day in range(15):
        for series, per in (
            ("up", 2 + day),
            ("flat_outlier", 500 if day == 7 else 5),
        ):
            for _ in range(per):
                rows.append(
                    (eid, base + dt.timedelta(days=day, hours=3), eid % 5,
                     series, 1.0, "{}")
                )
                eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {r["event_type"]: r for r in
           eventflow.mann_kendall_trend(events).collect()}

    def referee(counts):
        n = len(counts)
        pairs = [(i, j) for i, j in itertools.combinations(range(n), 2)]
        s = sum((counts[j] > counts[i]) - (counts[j] < counts[i])
                for i, j in pairs)
        slopes = sorted(
            ((counts[j] - counts[i]) * 1_000_000 // (j - i), i, j)
            for i, j in pairs
        )
        med = slopes[(len(slopes) + 1) // 2 - 1][0]
        from collections import Counter
        tie = sum(t * (t - 1) * (2 * t + 5)
                  for t in Counter(counts).values())
        var_num = n * (n - 1) * (2 * n + 5) - tie
        return s, var_num, med

    up = referee([2 + d for d in range(15)])
    assert (got["up"]["s_stat"], got["up"]["var_num"],
            got["up"]["sen_slope_ppm"]) == up
    assert got["up"]["trend"] == "increasing"
    assert got["up"]["sen_slope_ppm"] == 1_000_000  # slope exactly 1/day

    fo = referee([500 if d == 7 else 5 for d in range(15)])
    assert (got["flat_outlier"]["s_stat"], got["flat_outlier"]["var_num"],
            got["flat_outlier"]["sen_slope_ppm"]) == fo
    assert got["flat_outlier"]["trend"] == "none"
    assert got["flat_outlier"]["sen_slope_ppm"] == 0


def test_user_hazard_na_matches_pure_python_and_dominates_km(spark):
    """Nelson-Aalen referee on the same constructed cohort as the KM
    test: exact hazard increments d/n_risk, cumulative sum, and the
    textbook inequality exp(-H(t)) >= S_KM(t) (Breslow dominates KM;
    equality only without ties)."""
    import datetime as dt
    import math

    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    spec = [
        (1, 0, 3), (2, 0, 3), (3, 2, 12), (4, 0, 25),
        (5, 5, 30), (6, 1, 4), (7, 0, 10),
    ]
    for u, a, b in spec:
        for off in (a, b):
            rows.append(
                (eid, base + dt.timedelta(days=off), u, "visit", 1.0, "{}")
            )
            eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {r["t_days"]: r for r in eventflow.user_hazard_na(events).collect()}
    km = {r["t_days"]: r for r in eventflow.user_survival_km(events).collect()}

    obs = [(3, 1), (3, 1), (10, 1), (25, 0), (25, 0), (3, 1), (10, 1)]
    times = sorted({t for t, c in obs if c})
    cum, expect = 0.0, {}
    for t in times:
        n_risk = sum(1 for o, _ in obs if o >= t)
        d = sum(1 for o, c in obs if o == t and c)
        cum += d / n_risk
        expect[t] = (n_risk, d, d / n_risk, cum)
    assert set(got) == set(expect)
    for t, (n_risk, d, step, cum) in expect.items():
        r = got[t]
        assert r["n_risk"] == n_risk and r["n_events"] == d
        assert math.isclose(r["hazard_step"], round(step, 6), abs_tol=1e-6)
        assert math.isclose(r["cum_hazard"], round(cum, 6), abs_tol=1e-6)
        # Breslow dominates KM at every event time (ties present here)
        assert r["surv_breslow"] >= km[t]["survival"] - 1e-9
