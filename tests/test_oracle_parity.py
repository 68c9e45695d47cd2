"""DuckDB-oracle parity for every oracle-paired query (the driver gate).

Each query runs on Spark and its ANSI-SQL twin on DuckDB at sf0.001;
row count, sorted column names, and the order-insensitive value hash
must all match — the same comparison the driver performs at sf0.01.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from kinesis_dstream_spark.testing import frame_fingerprint

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row counts differ"
    assert frame_fingerprint(scols, srows) == frame_fingerprint(dcols, drows), (
        f"{name}: value hash differs"
    )


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
