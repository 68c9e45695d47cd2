"""Unit tests for the reference's operator semantics (SURVEY §2A).

These pin behaviors the oracle comparison can't isolate: closed-interval
BETWEEN bounds, changelog argmax, session-gap logic, and the ps-style
text parse — each on small hand-built frames.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from kinesis_dstream_spark.operators import reference_ops


def _events(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=t,
                user_id=u,
                event_type=et,
                value=v,
                props=p,
            )
            for (i, t, u, et, v, p) in rows
        ]
    )


def test_poll_window_between_is_closed_both_ends(spark):
    """Reference O-2: BETWEEN includes both boundary instants
    (app/hs_contacts.py:67-69) — boundary rows must appear."""
    lo = dt.datetime(2024, 1, 5)
    hi = dt.datetime(2024, 1, 20)
    df = _events(
        spark,
        [
            (1, lo, 1, "a", 1.0, "{}"),           # exactly lo -> kept
            (2, hi, 1, "a", 1.0, "{}"),           # exactly hi -> kept
            (3, lo - dt.timedelta(microseconds=1), 1, "a", 1.0, "{}"),  # out
            (4, hi + dt.timedelta(microseconds=1), 1, "a", 1.0, "{}"),  # out
            (5, dt.datetime(2024, 1, 10), 1, "a", 1.0, None),  # null props -> out
        ],
    )
    got = {r.event_id for r in reference_ops.poll_window_filter(df).collect()}
    assert got == {1, 2}


def test_changelog_latest_state_takes_max_ts(spark):
    df = _events(
        spark,
        [
            (1, dt.datetime(2024, 1, 1), 7, "old", 1.0, "{}"),
            (2, dt.datetime(2024, 1, 3), 7, "new", 2.0, "{}"),
            (3, dt.datetime(2024, 1, 2), 7, "mid", 3.0, "{}"),
        ],
    )
    rows = reference_ops.changelog_latest_state(df).collect()
    assert len(rows) == 1
    assert rows[0].event_id == 2 and rows[0].event_type == "new"


def test_changelog_tie_breaks_on_event_id(spark):
    t = dt.datetime(2024, 1, 1)
    df = _events(spark, [(1, t, 7, "a", 1.0, "{}"), (2, t, 7, "b", 1.0, "{}")])
    rows = reference_ops.changelog_latest_state(df).collect()
    assert rows[0].event_id == 2


def test_sessionize_gap_splits_sessions(spark):
    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        # session 0: 3 events, tight
        (1, t0, 5, "a", 1.0, "{}"),
        (2, t0 + 2 * m, 5, "a", 1.0, "{}"),
        (3, t0 + 4 * m, 5, "a", 1.0, "{}"),
        # 31-minute gap -> session 1: 3 events
        (4, t0 + 35 * m, 5, "a", 1.0, "{}"),
        (5, t0 + 36 * m, 5, "a", 1.0, "{}"),
        (6, t0 + 37 * m, 5, "a", 1.0, "{}"),
    ]
    out = {
        (r.session_id, r.n_events)
        for r in reference_ops.sessionize_events(_events(spark, rows)).collect()
    }
    assert out == {(0, 3), (1, 3)}


def test_sessionize_gap_exactly_30min_stays_in_session(spark):
    """Gap must be STRICTLY greater than the threshold to split."""
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 5, "a", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=30), 5, "a", 1.0, "{}"),
        (3, t0 + dt.timedelta(minutes=60), 5, "a", 1.0, "{}"),
    ]
    out = reference_ops.sessionize_events(_events(spark, rows)).collect()
    assert len(out) == 1 and out[0].n_events == 3


def test_parse_text_table_ps_shape(spark):
    """O-12 (app/app.py:11-28): regex keep + whitespace split + positional
    projection, on realistic ps output lines."""
    lines = spark.createDataFrame(
        [
            ("123  root  10:02  python hs_contacts.py",),
            ("456  root  10:03  python   hs_engagements.py  --flag",),
            ("789  root  10:04  nginx -g daemon",),
        ],
        "line string",
    )
    rows = reference_ops.parse_text_table(lines, pattern="python").collect()
    assert len(rows) == 2
    by_pid = {r.pid: r for r in rows}
    assert by_pid["123"].command == ["python", "hs_contacts.py"]
    assert by_pid["456"].command == ["python", "hs_engagements.py", "--flag"]
    assert by_pid["456"].user == "root" and by_pid["456"].time == "10:03"


def test_page_limit_topk_is_deterministic(spark, sf_dir):
    from kinesis_dstream_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    a = [r.event_id for r in reference_ops.page_limit_topk(ev, 50).collect()]
    b = [r.event_id for r in reference_ops.page_limit_topk(ev, 50).collect()]
    assert a == b and len(a) == 50
