"""Semantics tests for the r6 operators: SCD-2 / CDC merge / record linkage.

Oracle hash-parity for these queries lives in test_oracle_parity; here we
pin the STRUCTURAL guarantees the hash can't state: interval gaplessness,
incremental==batch under many cutoffs, blocking losslessness.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kinesis_dstream_spark.operators import changelog, linkage, reference_ops
from kinesis_dstream_spark.tables import load_table


def test_scd2_intervals_gapless_and_single_current(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    scd2 = changelog.scd2_from_changelog(ev).cache()
    try:
        # exactly one open (current) version per key
        per_key = scd2.groupBy("user_id").agg(
            F.sum(F.col("is_current").cast("int")).alias("n_current"),
            F.count("*").alias("n_versions"),
        )
        assert per_key.filter(F.col("n_current") != 1).count() == 0
        # version count == changelog rows per key (every change versioned)
        ev_counts = ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
        assert (
            per_key.join(ev_counts, "user_id")
            .filter(F.col("n_versions") != F.col("n_events"))
            .count()
            == 0
        )
        # gapless: valid_to of version k == valid_from of version k+1
        nxt = scd2.select(
            "user_id",
            (F.col("version") - 1).alias("version"),
            F.col("valid_from").alias("next_from"),
        )
        joined = scd2.filter(~F.col("is_current")).join(
            nxt, ["user_id", "version"]
        )
        assert joined.filter(F.col("valid_to") != F.col("next_from")).count() == 0
    finally:
        scd2.unpersist()


def test_cdc_incremental_equals_batch_any_cutoff(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    batch = (
        reference_ops.changelog_latest_state(ev)
        .filter(F.col("event_type") != changelog.TOMBSTONE)
        .select("user_id", "event_id")
    )
    for cut in ("2024-01-05", "2024-01-15", "2024-01-25"):
        cutoff = F.lit(cut).cast("timestamp")
        snap = changelog.build_snapshot(ev, cutoff)
        applied = changelog.cdc_apply(snap, ev.filter(F.col("ts") > cutoff))
        inc = applied.select("user_id", "event_id")
        assert inc.exceptAll(batch).count() == 0, cut
        assert batch.exceptAll(inc).count() == 0, cut


def test_cdc_tombstone_deletes_key(spark):
    rows = [
        (1, 10, "signup", 1.0, "2024-01-01 00:00:00"),
        (1, 11, "error", 0.0, "2024-01-20 00:00:00"),
        (2, 20, "view", 2.0, "2024-01-02 00:00:00"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, value double, ts_s string"
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    cutoff = F.lit("2024-01-10").cast("timestamp")
    snap = changelog.build_snapshot(ev, cutoff)
    assert {r.user_id for r in snap.collect()} == {1, 2}  # user 1 live at cutoff
    final = changelog.cdc_apply(snap, ev.filter(F.col("ts") > cutoff))
    assert {r.user_id for r in final.collect()} == {2}  # tombstone applied


def test_linkage_blocking_is_lossless(spark, sf_dir):
    """Blocked candidate pairs == the unblocked declarative spec."""
    part = load_table(spark, sf_dir, "part")
    blocked = linkage.candidate_pairs(part, 4).select("a_key", "b_key", "distance")

    a = part.select(
        F.col("p_partkey").alias("a_key"),
        F.col("p_name").alias("a_name"),
        F.element_at(F.split("p_name", " "), -1).alias("noun"),
    )
    b = part.select(
        F.col("p_partkey").alias("b_key"),
        F.col("p_name").alias("b_name"),
        F.element_at(F.split("p_name", " "), -1).alias("noun"),
    )
    spec = (
        a.join(b, "noun")
        .filter(F.col("a_key") < F.col("b_key"))
        .withColumn("distance", F.levenshtein("a_name", "b_name"))
        .filter(F.col("distance") <= 4)
        .select("a_key", "b_key", "distance")
    )
    # collect-and-compare instead of exceptAll: Spark 4.1 hits an
    # INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND binding bug when exceptAll runs
    # over this self-join + window lineage (pair sets are small: ~200/sf0.001)
    blocked_set = {tuple(r) for r in blocked.collect()}
    spec_set = {tuple(r) for r in spec.collect()}
    assert blocked_set == spec_set


def test_linkage_best_match_unique_and_bounded(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    best = linkage.best_matches(part, 4).cache()
    try:
        assert best.groupBy("a_key").count().filter("count > 1").count() == 0
        assert best.filter(F.col("distance") > 4).count() == 0
    finally:
        best.unpersist()


def test_streaming_scd2_replay_safe(spark, sf_dir, tmp_path):
    """Re-draining the whole source into an existing store (fresh
    checkpoint → every file re-delivered) must change nothing: the
    event_id replay guard makes ingestion idempotent."""
    from kinesis_dstream_spark.streaming import jobs

    store = str(tmp_path / "store")
    first = jobs.streaming_scd2_maintenance(
        spark, sf_dir, store_dir=store, checkpoint_dir=str(tmp_path / "chk1")
    )
    n_first = first.count()
    second = jobs.streaming_scd2_maintenance(
        spark, sf_dir, store_dir=store, checkpoint_dir=str(tmp_path / "chk2")
    )
    assert second.count() == n_first
    batch = changelog.scd2_from_changelog(
        load_table(spark, sf_dir, "events")
    ).select("user_id", "version", "event_id")
    assert second.select("user_id", "version", "event_id").exceptAll(batch).count() == 0
    assert batch.exceptAll(second.select("user_id", "version", "event_id")).count() == 0


def test_best_matches_equals_pair_level(spark, sf_dir):
    """The name-class rewrite must reproduce the pair-level definition
    (window over candidate_pairs) row for row."""
    part = load_table(spark, sf_dir, "part")
    fast = {tuple(r) for r in linkage.best_matches(part, 4).collect()}
    pairs = linkage.candidate_pairs(part, 4)
    w = Window.partitionBy("a_key").orderBy("distance", "b_key")
    slow = {
        tuple(r)
        for r in pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("a_key", "a_name", "b_key", "b_name", "distance")
        .collect()
    }
    assert fast == slow


def test_scd2_as_of_matches_filtered_latest(spark, sf_dir):
    """AS OF T must equal the argmax-per-key over events ≤ T (every key
    seen by T appears exactly once, carrying its last pre-T change)."""
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15").cast("timestamp")
    snap = changelog.scd2_as_of(ev, cutoff)
    assert snap.groupBy("user_id").count().filter("count > 1").count() == 0
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    expect = (
        ev.filter(F.col("ts") <= cutoff)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id")
    )
    got = snap.select("user_id", "event_id")
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in expect.collect()}


def test_pit_feature_join_never_leaks(spark, sf_dir):
    """Leakage guard: every feature must come from an event strictly
    earlier in the per-user (ts, event_id) order than its label, the
    feature value must equal the chronologically previous non-purchase
    event's value (checked row-for-row against a Python replay), and
    purchases with no prior state must be absent."""
    from kinesis_dstream_spark.operators.changelog import pit_feature_join
    from kinesis_dstream_spark.tables import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    rows = pit_feature_join(ev).collect()
    assert rows
    raw = ev.select(
        "user_id", "event_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.round("value", 4).alias("v"),
    ).collect()
    state, version, expect = {}, {}, {}
    for r in sorted(raw, key=lambda r: (r.user_id, r.us, r.event_id)):
        if r.event_type == "purchase":
            if r.user_id in state:
                expect[r.event_id] = (
                    state[r.user_id][0], version[r.user_id], r.us - state[r.user_id][1]
                )
        else:
            state[r.user_id] = (r.v, r.us)
            version[r.user_id] = version.get(r.user_id, 0) + 1
    got = {
        r.label_event_id: (r.feature_value, r.feature_version, r.feature_age_us)
        for r in rows
    }
    assert got == expect
    for r in rows:
        assert r.feature_age_us >= 0
