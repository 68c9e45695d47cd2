"""Custom paged_poll source (O-1/O-6): batch pagination + sinks."""

from __future__ import annotations

import json
import math
import os

from kinesis_dstream_spark.sources import polling
from kinesis_dstream_spark.sources.sinks import JsonLogSink
from kinesis_dstream_spark.tables import load_table


def test_batch_source_reads_all_pages(spark, sf_dir):
    polling.register(spark)
    df = (
        spark.read.format(polling.FORMAT_NAME)
        .option("path", f"{sf_dir}/events.parquet")
        .option("page_size", 137)
        .load()
    )
    direct = load_table(spark, sf_dir, "events")
    assert df.count() == direct.count()
    assert {r.event_id for r in df.select("event_id").collect()} == {
        r.event_id for r in direct.select("event_id").collect()
    }


def test_batch_source_page_partitioning(spark, sf_dir):
    """One input partition per page — the parallel upgrade of the
    reference's serial cursor loop (app/hs_contacts.py:95-126)."""
    polling.register(spark)
    df = (
        spark.read.format(polling.FORMAT_NAME)
        .option("path", f"{sf_dir}/events.parquet")
        .option("page_size", 100)
        .load()
    )
    n_rows = load_table(spark, sf_dir, "events").count()
    assert df.rdd.getNumPartitions() == math.ceil(n_rows / 100)


def test_batch_source_projection_and_filter(spark, sf_dir):
    polling.register(spark)
    df = (
        spark.read.format(polling.FORMAT_NAME)
        .option("path", f"{sf_dir}/events.parquet")
        .load()
        .select("event_id", "event_type")
        .filter("event_type = 'click'")
    )
    direct = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "event_type")
        .filter("event_type = 'click'")
    )
    assert df.count() == direct.count()


def test_json_log_sink_writes_batches(spark, sf_dir, tmp_path):
    """The reference's implemented sink is a log file
    (app/hs_contacts.py:120-123); JsonLogSink is its foreachBatch twin."""
    out = str(tmp_path / "log_sink")
    sink = JsonLogSink(out)
    df = load_table(spark, sf_dir, "events").limit(5)
    sink(df, batch_id=7)
    path = os.path.join(out, "batch-000007.jsonl")
    assert os.path.exists(path)
    lines = [json.loads(line) for line in open(path)]
    assert len(lines) == 5 and "event_id" in lines[0]


def test_kinesis_sink_import_gate():
    """Without boto3 the Kinesis sink must fail at construction with a
    clear message, not inside executors."""
    import importlib.util

    import pytest

    from kinesis_dstream_spark.sources.sinks import KinesisPutRecordsSink

    if importlib.util.find_spec("boto3") is None:
        with pytest.raises(ImportError, match="boto3"):
            KinesisPutRecordsSink("stream", "event_id")
    else:  # boto3 present: construction succeeds
        KinesisPutRecordsSink("stream", "event_id")


def test_datasource_writer_roundtrip(spark, sf_dir, tmp_path):
    """Write through the custom DataSource writer (one JSONL file per
    task, collision-free names), read back, compare."""
    import glob
    import json

    from kinesis_dstream_spark.sources import polling
    from kinesis_dstream_spark.tables import load_table

    polling.register(spark)
    out = str(tmp_path / "sink")
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    ev.write.format(polling.FORMAT_NAME).option("path", out).mode("append").save()
    written = sorted(
        (json.loads(line)["event_id"], json.loads(line)["event_type"])
        for p in glob.glob(out + "/*.jsonl")
        for line in open(p)
    )
    expected = sorted((r.event_id, r.event_type) for r in ev.collect())
    assert written == expected


def test_fetch_retry_recovers_and_bounds(monkeypatch):
    """O-10 semantics: transient IO errors retry with backoff and then
    succeed; persistent errors surface after bounded attempts (never the
    reference's infinite same-page loop)."""
    import pytest

    from kinesis_dstream_spark.sources import polling

    monkeypatch.setattr(polling, "FETCH_BACKOFF_S", 0.001)
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("transient")
        return "page"

    assert polling._fetch_with_retry(flaky) == "page"
    assert calls["n"] == 3

    def dead():
        raise OSError("still down")

    with pytest.raises(OSError, match="still down"):
        polling._fetch_with_retry(dead)

    calls["n"] = 0

    def fatal_counting():
        calls["n"] += 1
        raise ValueError("bad payload")

    with pytest.raises(ValueError):
        polling._fetch_with_retry(fatal_counting)
    assert calls["n"] == 1  # non-transient: no retry


def test_csv_json_roundtrip_lossless(spark, sf_dir):
    """E-1 format scans: CSV and JSON round-trips must preserve row count,
    keys, totals, and timestamp values exactly."""
    from pyspark.sql import functions as F

    from kinesis_dstream_spark.sources import formats
    from kinesis_dstream_spark.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    out = formats.csv_json_roundtrip_stats(spark, sf_dir)
    expect = (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")) / 100.0, 2
            ).alias("total_price"),
            F.min(F.year("o_orderdate")).alias("first_year"),
            F.max(F.year("o_orderdate")).alias("last_year"),
        )
    )
    got = {tuple(r) for r in out.collect()}
    want = {tuple(r) for r in expect.collect()}
    assert got == want
