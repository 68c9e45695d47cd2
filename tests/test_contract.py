"""Driver-contract surface tests (__spark_entry__)."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["event_id", "ts", "user_id", "event_type"]


def test_entry_schema_stable(spark):
    a = entry_mod.entry(spark).schema
    b = entry_mod.entry(spark).schema
    assert a == b


def test_oracle_keys_subset_of_queries():
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 40
    # the env-var nod to the reference's only test
    # (hs_engagements.py:155-159): config surface is importable & sane
    from kinesis_dstream_spark.tables import DEFAULT_SF_DIR, TABLES

    assert DEFAULT_SF_DIR
    assert len(TABLES) == 10
