"""Subject-erasure: zero-residual proof + accounting + plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_dstream_spark.operators import changelog, eventflow, governance
from kinesis_dstream_spark.tables import load_table


def test_erasure_leaves_zero_residual_rows(spark, sf_dir):
    """After erasure, NO store contains any requested subject's rows —
    the actual regulatory requirement, stronger than count accounting."""
    events = load_table(spark, sf_dir, "events")
    requests = (
        events.select("user_id").distinct().where(F.col("user_id") % 37 == 0)
    )
    n_req = requests.count()
    assert n_req > 0, "fixture must contain requested subjects"
    for df in (
        events,
        changelog.scd2_from_changelog(events),
        eventflow.minute_granules_by_user(events),
    ):
        erased = governance.erase_subjects(df, requests, "user_id")
        residual = erased.join(requests, "user_id").count()
        assert residual == 0
        # non-subjects are untouched
        assert erased.count() == df.join(requests, "user_id", "left_anti").count()


def test_erasure_report_accounting(spark, sf_dir):
    rows = governance.erasure_report(spark, sf_dir).collect()
    assert {r.store for r in rows} == {
        "events_raw", "scd2_history", "minute_granules",
    }
    for r in rows:
        assert r.rows_before == r.rows_erased + r.rows_after
        assert r.rows_erased > 0  # the request set is non-empty on fixtures


def test_erasure_plan_broadcasts_requests(spark, sf_dir):
    """The erase anti-join must broadcast the request set — the store
    side is never shuffled."""
    events = load_table(spark, sf_dir, "events")
    requests = (
        events.select("user_id").distinct().where(F.col("user_id") % 37 == 0)
    )
    plan = (
        governance.erase_subjects(events, requests, "user_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_full_erasure_physical_zero_residual_all_stores(spark, sf_dir, tmp_path):
    """The six-store erasure: after erasure_report_full, the PERSISTED
    stores on disk (ANN index, chunk store, MinHash dedup index bands +
    shingles) contain zero rows for any requested doc/vec id, non-
    subject rows survive bit-for-bit, and the report's accounting adds
    up for every store."""
    import os

    work = str(tmp_path / "erase_work")
    rows = governance.erasure_report_full(spark, sf_dir, work_dir=work).collect()
    assert {r.store for r in rows} == {
        "events_raw", "scd2_history", "minute_granules",
        "ann_index", "chunk_store", "minhash_dedup_index",
    }
    for r in rows:
        assert r.rows_before == r.rows_erased + r.rows_after
        assert r.rows_erased > 0

    stores = {
        "vec_id": [os.path.join(work, "ann_index")],
        "doc_id": [
            os.path.join(work, "chunk_store", "chunks"),
            os.path.join(work, "dedup_index", "bands"),
            os.path.join(work, "dedup_index", "shingles"),
        ],
    }
    # the dedup_index dir in the work copy is named after the pristine
    # store key
    if not os.path.exists(stores["doc_id"][1]):
        stores["doc_id"][1] = os.path.join(work, "minhash_dedup_index", "bands")
        stores["doc_id"][2] = os.path.join(work, "minhash_dedup_index", "shingles")
    for key, paths in stores.items():
        for p in paths:
            erased = spark.read.parquet(p)
            assert erased.where(F.col(key) % 37 == 0).count() == 0, p
            assert erased.where(F.col(key) % 37 != 0).count() == erased.count()


def test_erase_parquet_store_is_exact_and_preserves_survivors(spark, tmp_path):
    """Unit-level: physical parquet erasure removes exactly the subject
    rows and leaves survivors byte-identical (values, not just counts)."""
    import os

    path = str(tmp_path / "store")
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") * 7 % 13).alias("payload")
    )
    df.write.parquet(path)
    req = spark.range(100).select(F.col("id").alias("doc_id")).where(
        F.col("doc_id") % 10 == 0
    )
    governance.erase_parquet_store(spark, path, req, "doc_id")
    got = sorted(map(tuple, spark.read.parquet(path).collect()))
    want = sorted(
        (i, i * 7 % 13) for i in range(100) if i % 10 != 0
    )
    assert got == want
    assert not os.path.exists(path.rstrip("/") + "_erase_tmp")
