"""Tests for the second coverage wave: TPC-H part 2, UDF surface, IVF
ANN, streaming session windows, frame sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_dstream_spark.operators import multimodal, relational, similarity, udfs
from kinesis_dstream_spark.tables import load_table


def test_udf_token_counts_python_matches_jvm(spark, sf_dir):
    rows = udfs.udf_token_counts(load_table(spark, sf_dir, "documents")).collect()
    assert all(r.py_tokens == r.jvm_tokens for r in rows)


def test_udf_query_is_the_only_python_one(spark, sf_dir):
    """The row-UDF demo is the designated slow path; it must carry a
    BatchEvalPython node (and stay quarantined to this one query)."""
    plan = udfs.udf_token_counts(
        load_table(spark, sf_dir, "documents")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" in plan


def test_pandas_udf_uses_arrow_eval(spark, sf_dir):
    plan = udfs.pandas_udf_value_transform(
        load_table(spark, sf_dir, "events")
    )._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan


def test_udaf_weighted_mean_matches_builtin_twin(spark, sf_dir):
    """The GROUPED_AGG pandas UDAF (E-14's last tier) must equal the
    pure-relational statement of the same weighted mean — sum(v·w) DIV
    sum(w) — bit-for-bit, and its plan must carry the grouped-agg
    Arrow node (proving the UDAF path executed, not a fallback)."""
    from kinesis_dstream_spark.functions.exact import fixedpoint

    ev = load_table(spark, sf_dir, "events")
    got = {tuple(r) for r in udfs.udaf_weighted_mean(ev).collect()}
    twin = (
        ev.select(
            "event_type",
            fixedpoint(F.col("value"), 1_000_000).alias("v_fp"),
            (F.col("event_id") % 7 + 1).cast("long").alias("w"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("w").alias("sum_w"),
            F.expr("sum(v_fp * w) DIV sum(w)").alias("wmean_fp"),
        )
        .select(
            "event_type",
            "n",
            "sum_w",
            "wmean_fp",
            F.round(F.col("wmean_fp") / 1_000_000.0, 6).alias("wmean_value"),
        )
    )
    assert got == {tuple(r) for r in twin.collect()}
    plan = (
        udfs.udaf_weighted_mean(ev)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowAggregatePython" in plan


def test_exact_median_matches_sorted_middle(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = {r.event_type: (r.n, r.median_value) for r in udfs.exact_median_by_group(ev).collect()}
    for et, (n, med) in got.items():
        vals = sorted(
            r.value for r in ev.filter(F.col("event_type") == et).collect()
        )
        mid = len(vals) // 2
        expect = vals[mid] if len(vals) % 2 else (vals[mid - 1] + vals[mid]) / 2
        assert med == expect and n == len(vals)


def test_ivf_topk_recall_vs_bruteforce(spark, sf_dir):
    """IVF with 4 probes of 16 cells should recover most true neighbors
    on 500 vectors — and must never fabricate scores."""
    emb = load_table(spark, sf_dir, "embeddings")
    brute = similarity.ann_bruteforce_topk(emb, n_queries=10, k=5).collect()
    ivf = similarity.ann_ivf_topk(emb, n_queries=10, k=5).collect()
    brute_pairs = {(r.q_id, r.c_id) for r in brute}
    ivf_pairs = {(r.q_id, r.c_id) for r in ivf}
    recall = len(brute_pairs & ivf_pairs) / len(brute_pairs)
    assert recall >= 0.5, f"IVF recall {recall}"
    score_of = {(r.q_id, r.c_id): r.cos_sim for r in brute}
    for r in ivf:
        if (r.q_id, r.c_id) in score_of:
            assert abs(r.cos_sim - score_of[(r.q_id, r.c_id)]) < 1e-9


def test_streaming_session_windows_match_batch_sessionize(spark, sf_dir):
    """session_window membership == the batch gap-split sessionization."""
    from kinesis_dstream_spark.operators.reference_ops import sessionize_events
    from kinesis_dstream_spark.streaming import jobs

    stream = jobs.streaming_session_windows(spark, sf_dir).collect()
    batch = sessionize_events(load_table(spark, sf_dir, "events")).collect()
    # compare per-user multisets of session sizes (ids/bounds differ)
    def sizes(rows):
        out: dict[int, list[int]] = {}
        for r in rows:
            out.setdefault(r.user_id, []).append(r.n_events)
        return {u: sorted(v) for u, v in out.items()}

    assert sizes(stream) == sizes(batch)


def test_frame_sampling_fanout(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.to_media_table(docs)
    frames = multimodal.sample_frames(media)
    per_doc = {r.media_id: r.n_frames for r in multimodal.media_frame_index(docs).collect()}
    assert frames.count() == sum(per_doc.values())
    lens = docs.select("doc_id", F.length("text").alias("n")).collect()
    for r in lens:
        assert per_doc[r.doc_id] == min(8, max(1, r.n // 256))


def test_q2_returns_one_min_per_nation_at_least(spark, sf_dir):
    from kinesis_dstream_spark.tables import load_tables

    t = load_tables(spark, sf_dir)
    rows = relational.q2_min_cost_supplier(t).collect()
    by_nation: dict[str, list] = {}
    for r in rows:
        by_nation.setdefault(r.n_name, []).append(r.acctbal)
    for n, bals in by_nation.items():
        assert len(set(bals)) == 1  # all tied at the minimum


def test_approx_percentile_tracks_exact(spark, sf_dir):
    """The t-digest sketch (the 100 TB path) must land near the exact
    sort-based percentiles the oracle verifies."""
    from kinesis_dstream_spark.operators.relational import percentile_stats
    from kinesis_dstream_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    exact = {r.event_type: (r.p25, r.p50, r.p90) for r in percentile_stats(ev).collect()}
    approx = {
        r.event_type: (r.a25, r.a50, r.a90)
        for r in ev.groupBy("event_type")
        .agg(
            F.approx_percentile("value", 0.25, 10000).alias("a25"),
            F.approx_percentile("value", 0.5, 10000).alias("a50"),
            F.approx_percentile("value", 0.9, 10000).alias("a90"),
        )
        .collect()
    }
    for et, (p25, p50, p90) in exact.items():
        a25, a50, a90 = approx[et]
        for e, a in [(p25, a25), (p50, a50), (p90, a90)]:
            assert abs(e - a) <= max(2.0, 0.02 * abs(e))


def test_bpe_tokens_at_least_words(spark, sf_dir):
    from kinesis_dstream_spark.operators.text import bpe_token_counts
    from kinesis_dstream_spark.tables import load_table

    out = bpe_token_counts(load_table(spark, sf_dir, "documents"))
    assert out.filter(F.col("n_bpe_tokens") < F.col("n_ws_tokens")).count() == 0


def test_salted_agg_equals_plain(spark, sf_dir):
    from kinesis_dstream_spark.functions import skew
    from kinesis_dstream_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").withColumn(
        "cents", F.round(F.col("value") * 100).cast("long")
    )
    salted = {
        (r.event_type, r.n_rows, r.sum_cents)
        for r in skew.salted_agg_count_sum(ev, ["event_type"], "cents").collect()
    }
    plain = {
        (r.event_type, r.n_rows, r.sum_cents)
        for r in ev.groupBy("event_type")
        .agg(F.count("*").alias("n_rows"), F.sum("cents").alias("sum_cents"))
        .collect()
    }
    assert salted == plain


def test_salted_join_equals_plain(spark, sf_dir):
    from kinesis_dstream_spark.functions import skew
    from kinesis_dstream_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    salted = skew.salted_join(ev, cust, "user_id", "c_custkey")
    plain = ev.join(cust, ev["user_id"] == cust["c_custkey"])
    assert salted.count() == plain.count()
    s = {(r.event_id, r.c_custkey) for r in salted.select("event_id", "c_custkey").collect()}
    p = {(r.event_id, r.c_custkey) for r in plain.select("event_id", "c_custkey").collect()}
    assert s == p


def test_streaming_streaks_equal_batch(spark, sf_dir):
    from kinesis_dstream_spark.operators.relational import user_activity_streaks
    from kinesis_dstream_spark.streaming import jobs
    from kinesis_dstream_spark.tables import load_table

    batch = {
        (r.user_id, r.longest_streak)
        for r in user_activity_streaks(load_table(spark, sf_dir, "events")).collect()
    }
    streamed = {
        (r.user_id, r.longest_streak)
        for r in jobs.streaming_user_streaks(spark, sf_dir).collect()
    }
    assert streamed == batch


def test_ranked_median_equals_pandas_path(spark, sf_dir):
    """The spill-safe rank-selection median must agree with the
    applyInPandas twin on the fixture AND on synthetic groups that hit
    every parity case (odd n, even n, n=1, duplicated middle values,
    high key cardinality)."""
    ev = load_table(spark, sf_dir, "events")
    a = {tuple(r) for r in udfs.exact_median_by_group(ev).collect()}
    b = {tuple(r) for r in udfs.exact_median_by_group_ranked(ev).collect()}
    assert a == b

    rows = []
    for g in range(200):  # high-cardinality keys, varied group sizes
        for i in range(g % 7 + 1):
            rows.append((f"g{g}", float((i * 13) % 5)))  # dup values too
    syn = spark.createDataFrame(rows, "event_type string, value double")
    a = {tuple(r) for r in udfs.exact_median_by_group(syn).collect()}
    b = {tuple(r) for r in udfs.exact_median_by_group_ranked(syn).collect()}
    assert a == b


def test_ranked_median_stays_on_jvm(spark, sf_dir):
    """The scale path must not fall off the JVM: no Python eval in the
    plan (its applyInPandas twin is the deliberate Python exhibit)."""
    plan = (
        udfs.exact_median_by_group_ranked(load_table(spark, sf_dir, "events"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan and "FlatMapGroupsInPandas" not in plan


def test_asof_join_events_directions(spark):
    """Backward picks the most recent at-or-before match, forward the
    earliest at-or-after; tolerance drops distant matches; gap sign
    encodes direction."""
    import datetime as dt

    from kinesis_dstream_spark.operators import relational

    t0 = dt.datetime(2025, 1, 1, 12, 0, 0)

    def ev(eid, minutes, typ):
        return (eid, t0 + dt.timedelta(minutes=minutes), 1, typ, 1.0, "{}")

    rows = [
        ev(1, 0, "purchase"),     # 12:00
        ev(2, 50, "click"),       # 12:50 -> backward matches 1 (50m)
        ev(3, 60, "purchase"),    # 13:00 -> forward match for 2 (10m)
        ev(4, 300, "click"),      # 17:00 -> nothing within 120m
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )
    back = {r.event_id: r for r in relational.asof_join_events(events).collect()}
    assert set(back) == {2}
    assert back[2].matched_event_id == 1 and back[2].gap_micros == 50 * 60 * 1_000_000
    fwd = {
        r.event_id: r
        for r in relational.asof_join_events(events, direction="forward").collect()
    }
    assert set(fwd) == {2}
    assert fwd[2].matched_event_id == 3 and fwd[2].gap_micros == -10 * 60 * 1_000_000


def test_arrow_norm_stats_matches_native_expressions(spark, sf_dir):
    """mapInArrow kernel vs JVM aggregate HOFs on the same column."""
    emb = load_table(spark, sf_dir, "embeddings")
    got = {r["vec_id"]: r for r in udfs.arrow_norm_stats(emb).collect()}
    ref = emb.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        F.round(
            F.sqrt(
                F.aggregate(
                    F.transform(F.col("embedding").cast("array<double>"), lambda x: x * x),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
            ),
            4,
        ).alias("l2_norm"),
        F.round(
            F.array_max(
                F.transform(F.col("embedding").cast("array<double>"), lambda x: F.abs(x))
            ),
            6,
        ).alias("max_abs"),
    ).collect()
    for r in ref:
        g = got[r["vec_id"]]
        assert g["n_dims"] == r["n_dims"]
        assert abs(g["l2_norm"] - r["l2_norm"]) <= 1e-4
        assert g["max_abs"] == r["max_abs"]


def test_arrow_norm_stats_ragged_fallback(spark):
    """Mixed-width vectors exercise the per-row-slice branch."""
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [1.0]), (3, [0.0, 0.0, 5.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r for r in udfs.arrow_norm_stats(df).collect()}
    assert got[1]["l2_norm"] == 5.0 and got[1]["n_dims"] == 2
    assert got[2]["l2_norm"] == 1.0 and got[2]["max_abs"] == 1.0
    assert got[3]["l2_norm"] == 5.0 and got[3]["max_abs"] == 5.0


def test_observe_metrics_ride_the_action_for_free(spark, sf_dir):
    """Observed metrics must equal direct aggregates, computed without
    a second scan (one action on the observed frame populates them)."""
    docs = load_table(spark, sf_dir, "documents")
    observed, obs = relational.observed_write_metrics(docs)
    n = observed.count()  # the ONE action; metrics accumulate in its tasks
    m = obs.get
    assert m["n_rows"] == n == docs.count()
    assert m["total_chars"] == docs.agg(F.sum(F.length("text"))).first()[0]
    assert m["n_empty"] == docs.filter(F.col("text").isNull() | (F.col("text") == "")).count()
    exact_sources = docs.select("source").distinct().count()
    assert abs(m["n_sources_approx"] - exact_sources) <= max(1, 0.05 * exact_sources)
