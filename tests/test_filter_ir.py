"""Filter-IR compiler tests (plans/filter_ir.py, SURVEY §1.2).

Covers each operator of the payload language, the OR-of-AND group
semantics, epoch-ms time handling, offset+limit pagination, and — the
architectural point — that compiled predicates and projections reach the
parquet scan as PushedFilters / a pruned ReadSchema.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_dstream_spark.plans import filter_ir
from kinesis_dstream_spark.tables import load_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def _flt(prop, op, **kw):
    return {"propertyName": prop, "operator": op, **kw}


class TestOperators:
    def test_eq_neq(self, events):
        total = events.count()
        eq = events.filter(filter_ir.compile_filter(_flt("event_type", "EQ", value="click")))
        neq = events.filter(filter_ir.compile_filter(_flt("event_type", "NEQ", value="click")))
        assert eq.count() > 0
        assert eq.count() + neq.count() == total
        assert eq.select("event_type").distinct().collect()[0][0] == "click"

    def test_ordering_ops(self, events):
        lt = events.filter(filter_ir.compile_filter(_flt("value", "LT", value=100.0))).count()
        lte = events.filter(filter_ir.compile_filter(_flt("value", "LTE", value=100.0))).count()
        gt = events.filter(filter_ir.compile_filter(_flt("value", "GT", value=100.0))).count()
        gte = events.filter(filter_ir.compile_filter(_flt("value", "GTE", value=100.0))).count()
        assert lt <= lte and gt <= gte
        assert lte + gt == events.count()

    def test_between_is_closed_closed(self, spark):
        df = spark.createDataFrame([(i,) for i in range(10)], "x int")
        out = df.filter(
            filter_ir.compile_filter(_flt("x", "BETWEEN", value=3, highValue=5))
        )
        assert sorted(r.x for r in out.collect()) == [3, 4, 5]

    def test_in_not_in(self, events):
        both = {"purchase", "signup"}
        inn = events.filter(
            filter_ir.compile_filter(_flt("event_type", "IN", values=list(both)))
        )
        notin = events.filter(
            filter_ir.compile_filter(_flt("event_type", "NOT_IN", values=list(both)))
        )
        assert set(r.event_type for r in inn.select("event_type").distinct().collect()) == both
        assert inn.count() + notin.count() == events.count()

    def test_has_property(self, spark):
        df = spark.createDataFrame([("a",), (None,)], "p string")
        has = df.filter(filter_ir.compile_filter(_flt("p", "HAS_PROPERTY")))
        nothas = df.filter(filter_ir.compile_filter(_flt("p", "NOT_HAS_PROPERTY")))
        assert has.count() == 1 and nothas.count() == 1

    def test_contains_token_is_whole_token(self, spark):
        df = spark.createDataFrame(
            [("hash join scan",), ("hashjoin scan",), ("scan",)], "text string"
        )
        hit = df.filter(
            filter_ir.compile_filter(_flt("text", "CONTAINS_TOKEN", value="join"))
        )
        # 'hashjoin' must NOT match the token 'join'
        assert [r.text for r in hit.collect()] == ["hash join scan"]
        miss = df.filter(
            filter_ir.compile_filter(_flt("text", "NOT_CONTAINS_TOKEN", value="join"))
        )
        assert miss.count() == 2

    def test_unknown_operator_raises(self):
        with pytest.raises(ValueError, match="unsupported"):
            filter_ir.compile_filter(_flt("x", "LIKE", value="%a%"))


class TestPayloadSemantics:
    def test_groups_or_filters_and(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "b"), (4, "b")], "x int, t string"
        )
        payload = {
            "filterGroups": [
                {"filters": [_flt("t", "EQ", value="a"), _flt("x", "GTE", value=2)]},
                {"filters": [_flt("t", "EQ", value="b"), _flt("x", "LT", value=4)]},
            ]
        }
        out = filter_ir.compile_payload(df, payload)
        assert sorted(r.x for r in out.collect()) == [2, 3]

    def test_time_columns_epoch_ms(self, events):
        """Epoch-ms string literals (the reference's wire encoding) must
        select exactly the rows a timestamp BETWEEN would."""
        payload = filter_ir.contacts_poll_payload(1704412800000, 1705708800000)
        via_ir = filter_ir.compile_payload(events, payload, time_columns={"ts"})
        via_ts = events.filter(
            F.col("ts").between(
                F.lit("2024-01-05 00:00:00").cast("timestamp"),
                F.lit("2024-01-20 00:00:00").cast("timestamp"),
            )
            & F.col("props").isNotNull()
        )
        assert via_ir.count() == via_ts.count() > 0

    def test_pagination_offset_limit(self, events):
        payload = {
            "sorts": [{"propertyName": "event_id", "direction": "ASCENDING"}],
            "limit": 5,
            "after": 5,
            "properties": ["event_id"],
        }
        page2 = [r.event_id for r in filter_ir.compile_payload(events, payload).collect()]
        allsorted = [
            r.event_id for r in events.orderBy("event_id").limit(10).select("event_id").collect()
        ]
        assert page2 == allsorted[5:10]

    def test_sort_direction(self, events):
        payload = {
            "sorts": [{"propertyName": "value", "direction": "DESCENDING"}],
            "limit": 3,
            "properties": ["value"],
        }
        vals = [r.value for r in filter_ir.compile_payload(events, payload).collect()]
        assert vals == sorted(vals, reverse=True)


class TestPlanShape:
    def test_pushdown_and_pruning(self, events):
        """Compiled EQ conjuncts reach the scan; ReadSchema is pruned to
        the projected+filtered columns only."""
        import io
        from contextlib import redirect_stdout

        payload = {
            "filterGroups": [
                {"filters": [_flt("event_type", "EQ", value="click")]}
            ],
            "properties": ["event_id", "event_type"],
        }
        df = filter_ir.compile_payload(events, payload)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        text = buf.getvalue()
        assert "PushedFilters" in text
        assert "IsNotNull(event_type)" in text or "EqualTo(event_type,click)" in text
        # pruned read schema should not mention untouched wide columns
        assert "props" not in text.split("ReadSchema")[1].splitlines()[0]


def test_ir_composes_with_streams(spark, sf_dir):
    """The IR compiler is source-agnostic: the same payload compiles onto
    a streaming DataFrame and yields the same rows as the batch plan."""
    from kinesis_dstream_spark.streaming.jobs import _events_stream, _run_bounded
    from kinesis_dstream_spark.tables import load_table

    payload = filter_ir.contacts_poll_payload(
        1704412800000, 1705708800000, properties=["event_id", "user_id"]
    )
    batch = {
        r.event_id
        for r in filter_ir.compile_payload(
            load_table(spark, sf_dir, "events"), payload, time_columns={"ts"}
        ).collect()
    }
    streamed = _run_bounded(
        filter_ir.compile_payload(
            _events_stream(spark, sf_dir), payload, time_columns={"ts"}
        ),
        "ir_stream_compile",
        "append",
    )
    assert {r.event_id for r in streamed.collect()} == batch


class TestTimeColumnIn:
    def test_in_on_time_column_converts_epoch_ms(self, spark):
        """IN/NOT_IN literals on a time column are epoch-ms strings on the
        wire; they must convert like every other operator instead of being
        cast to NULL timestamps that silently match nothing."""
        df = spark.createDataFrame(
            [("2024-01-05 00:00:00",), ("2024-01-06 00:00:00",)], "s string"
        ).select(F.col("s").cast("timestamp").alias("ts"))
        jan5_ms = 1704412800000
        inn = df.filter(
            filter_ir.compile_filter(
                _flt("ts", "IN", values=[str(jan5_ms)]), time_columns={"ts"}
            )
        )
        assert inn.count() == 1
        notin = df.filter(
            filter_ir.compile_filter(
                _flt("ts", "NOT_IN", values=[str(jan5_ms)]), time_columns={"ts"}
            )
        )
        assert notin.count() == 1

    def test_in_empty_values(self, spark):
        df = spark.createDataFrame([(1,), (2,)], "x int")
        assert df.filter(
            filter_ir.compile_filter(_flt("x", "IN", values=[]))
        ).count() == 0
        assert df.filter(
            filter_ir.compile_filter(_flt("x", "NOT_IN", values=[]))
        ).count() == 2
