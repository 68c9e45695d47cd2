"""Data-governance operators: subject-erasure (right to be forgotten).

A pipeline that ingests user-keyed records (the reference's pollers
ingest CRM contacts — personal data by definition) owes its operators a
deletion path: given a set of data-subject keys, remove their rows from
the raw store AND every derived store, and produce an auditable report
of what was erased where. The erase itself is one anti-join per store —
the engineering content is (a) the report (regulators ask "what did you
delete"), and (b) coverage of DERIVED stores, where subject data hides
after transformation.

Scale shape (100 TB): the request set is small (thousands of subjects
vs billions of rows) and broadcasts into every anti-join, so each
store pays one scan and no shuffle. With user-partitioned store
layouts the anti-join prunes to the affected partitions — the same
bounded-rewrite argument as the streaming affected-key jobs. Counts
only travel; erased row contents are never collected.

Reference scope note: the reference (app/app.py) has no deletion path
at all — records only ever accrete into the log sink; this family is
part of the mandated extension surface.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_dstream_spark.tables import load_table

# Deterministic fixture stand-in for an erasure-request table: every
# 37th subject. A real deployment reads these ids from a requests queue.
_ERASE_MOD = 37


def erase_subjects(df: DataFrame, requests: DataFrame, key: str) -> DataFrame:
    """The erased view of ``df``: anti-join on the subject key.

    ``requests`` holds one column named ``key``. Broadcast by the
    caller's planner (AQE converts when small); no shuffle of ``df``.
    """
    return df.join(F.broadcast(requests), key, "left_anti")


def erasure_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erase the fixture request set from the raw event log and two
    derived stores (SCD-2 history, minute granules) and report per-store
    row accounting. ``rows_before = rows_erased + rows_after`` by
    construction; the pytest additionally proves zero residual rows per
    requested subject in every store.
    """
    from kinesis_dstream_spark.operators import changelog, eventflow

    events = load_table(spark, sf_dir, "events")
    requests = (
        events.select("user_id")
        .distinct()
        .where(F.col("user_id") % _ERASE_MOD == 0)
    )
    stores = {
        "events_raw": events,
        "scd2_history": changelog.scd2_from_changelog(events),
        "minute_granules": eventflow.minute_granules_by_user(events),
    }
    reports = []
    for name, df in stores.items():
        erased = erase_subjects(df, requests, "user_id")
        reports.append(
            df.agg(F.count(F.lit(1)).alias("rows_before"))
            .crossJoin(erased.agg(F.count(F.lit(1)).alias("rows_after")))
            .select(
                F.lit(name).alias("store"),
                "rows_before",
                (F.col("rows_before") - F.col("rows_after")).alias("rows_erased"),
                "rows_after",
            )
        )
    return reduce(lambda a, b: a.unionByName(b), reports)


ERASURE_REPORT_SQL = f"""
WITH requests AS (
  SELECT DISTINCT user_id FROM events WHERE user_id % {_ERASE_MOD} = 0
), ev AS (
  SELECT count(*) AS before,
         CAST(sum(CASE WHEN user_id IN (SELECT user_id FROM requests)
                  THEN 1 ELSE 0 END) AS BIGINT) AS erased
  FROM events
), gran AS (
  SELECT count(*) AS before,
         CAST(sum(CASE WHEN user_id IN (SELECT user_id FROM requests)
                  THEN 1 ELSE 0 END) AS BIGINT) AS erased
  FROM (
    SELECT user_id, event_type, epoch_us(ts) // 60000000 AS midx
    FROM events GROUP BY user_id, event_type, epoch_us(ts) // 60000000
  )
)
SELECT 'events_raw' AS store, before AS rows_before, erased AS rows_erased,
       before - erased AS rows_after FROM ev
UNION ALL
-- SCD-2 history has exactly one version row per changelog row, so its
-- accounting equals the raw log's (the history is a reshaping, not a
-- re-aggregation).
SELECT 'scd2_history', before, erased, before - erased FROM ev
UNION ALL
SELECT 'minute_granules', before, erased, before - erased FROM gran
"""
