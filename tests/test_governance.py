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
