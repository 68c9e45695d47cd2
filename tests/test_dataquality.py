"""DQ constraint report: violation detection + single-scan plan shape.

Oracle parity (all-pass verdicts on the clean fixtures) runs in
test_oracle_parity.py; here we prove the checks actually FIRE on dirty
data and that row-local suites cost one scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_dstream_spark.operators import dataquality


def test_violations_fire_on_dirty_data(spark):
    dirty = spark.createDataFrame(
        [
            (1, "O", 10.0),
            (None, "O", 20.0),  # null custkey
            (3, "X", 30.0),  # bad status
            (4, "F", -5.0),  # negative price
            (5, "P", 40.0),
        ],
        "o_custkey long, o_orderstatus string, o_totalprice double",
    )
    report = {
        r.constraint: r
        for r in dataquality._single_pass(
            dirty,
            "orders",
            [
                ("complete_custkey", F.col("o_custkey").isNull()),
                ("status_in_domain", ~F.col("o_orderstatus").isin("O", "F", "P")),
                ("nonneg_totalprice", F.col("o_totalprice") < 0),
            ],
        ).collect()
    }
    assert all(r.n_rows == 5 for r in report.values())
    assert report["complete_custkey"].n_violations == 1
    assert report["status_in_domain"].n_violations == 1
    assert report["nonneg_totalprice"].n_violations == 1
    assert not any(r.passed for r in report.values())


def test_report_shape_on_fixture(spark, sf_dir):
    rows = dataquality.dq_constraint_report(spark, sf_dir).collect()
    assert len(rows) == 10
    assert all(r.passed for r in rows)  # driver fixtures are clean
    assert {r.table_name for r in rows} == {"orders", "lineitem", "events", "part"}


def test_row_local_suite_is_one_scan(spark, sf_dir):
    """All three orders constraints share a single aggregation over one
    scan — constraint count must not multiply scans."""
    from kinesis_dstream_spark.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    df = dataquality._single_pass(
        orders,
        "orders",
        [
            ("a", F.col("o_custkey").isNull()),
            ("b", ~F.col("o_orderstatus").isin("O", "F", "P")),
            ("c", F.col("o_totalprice") < 0),
        ],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") <= 1  # union reuses the one agg


def test_key_skew_profile_semantics(spark, sf_dir):
    """Bounds every ratio must satisfy by construction: top_share in
    (0,1], hhi in [1/n_keys, 1], skew_ratio >= 1, and the uniform-ish
    l_orderkey key must profile as less skewed than event_type (7
    values over 10k rows is structurally hot)."""
    from kinesis_dstream_spark.operators.dataquality import key_skew_profile
    from kinesis_dstream_spark.tables import load_table

    rows = {
        r.key: r
        for r in key_skew_profile(
            load_table(spark, sf_dir, "events"),
            load_table(spark, sf_dir, "lineitem"),
        ).collect()
    }
    assert set(rows) == {
        "events.event_type",
        "events.user_id",
        "lineitem.l_orderkey",
        "lineitem.l_suppkey",
    }
    for r in rows.values():
        assert 0 < r.top_share <= 1.0
        assert r.skew_ratio >= 1.0
        assert 1.0 / r.n_keys <= r.hhi + 1e-9 <= 1.0
        assert r.max_key_rows <= r.n_rows
    # low-cardinality key concentrates: fewer keys -> higher hhi
    assert rows["events.event_type"].hhi > rows["events.user_id"].hhi


def test_join_size_estimate_identity_and_blowup(spark, sf_dir):
    """The count-table identity must be exact for every row, and the
    self-join row must flag the quadratic blowup (predicted >> input)."""
    from kinesis_dstream_spark.operators.dataquality import join_size_estimate
    from kinesis_dstream_spark.tables import load_table

    rows = {
        r.join_name: r
        for r in join_size_estimate(
            load_table(spark, sf_dir, "orders"),
            load_table(spark, sf_dir, "lineitem"),
            load_table(spark, sf_dir, "customer"),
            load_table(spark, sf_dir, "events"),
        ).collect()
    }
    for r in rows.values():
        assert r.predicted_rows == r.actual_rows  # exact identity
    assert rows["events_self_user"].predicted_rows > rows["events_self_user"].lhs_rows


def test_column_histogram_equidepth_invariants(spark, sf_dir):
    """Equi-depth law: bucket k holds ranks ceil(kn/B)+1..ceil((k+1)n/B),
    so sizes differ by at most 1; totals conserve; bucket bounds are
    ordered and non-overlapping except at shared boundary values."""
    from kinesis_dstream_spark.operators.dataquality import (
        column_histogram_equidepth,
    )
    from kinesis_dstream_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    rows = sorted(column_histogram_equidepth(li).collect(), key=lambda r: r.bucket)
    n = li.count()
    assert [r.bucket for r in rows] == list(range(8))
    assert sum(r.n_rows for r in rows) == n
    sizes = [r.n_rows for r in rows]
    assert max(sizes) - min(sizes) <= 1
    for a, b in zip(rows, rows[1:]):
        assert a.hi_price <= b.lo_price  # boundary value may be shared
        assert a.lo_price <= a.hi_price


def test_grouped_percentiles_ordered_and_exact_vs_local(spark, sf_dir):
    """p50 <= p90 <= p99 per type, and each equals the local nearest-rank
    order statistic computed in Python."""
    from kinesis_dstream_spark.operators import dataquality
    from kinesis_dstream_spark.tables import load_table

    events = load_table(spark, sf_dir, "events")
    rows = {r["event_type"]: r for r in dataquality.grouped_percentiles(events).collect()}
    vals = {}
    for r in events.select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(int(round(r["value"] * 100)))
    for et, r in rows.items():
        xs = sorted(vals[et])
        n = len(xs)
        assert r["n"] == n
        for p in (50, 90, 99):
            want = xs[(n * p + 99) // 100 - 1] / 100
            assert abs(r[f"p{p}"] - round(want, 2)) < 1e-9, (et, p)
        assert r["p50"] <= r["p90"] <= r["p99"]


def test_value_decile_binning_partitions_and_monotone(spark, sf_dir):
    """Bins partition each type's rows (counts sum to n) and bin value
    ranges are non-overlapping and ordered."""
    from kinesis_dstream_spark.operators import dataquality
    from kinesis_dstream_spark.tables import load_table

    events = load_table(spark, sf_dir, "events")
    out = dataquality.value_decile_binning(events).collect()
    n_total = events.count()
    assert sum(r["n_rows"] for r in out) == n_total
    by_type = {}
    for r in out:
        by_type.setdefault(r["event_type"], []).append(r)
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r["bin"])
        for a, b in zip(rs, rs[1:]):
            assert a["hi_value"] <= b["lo_value"], (et, a, b)


def test_categorical_association_margins_and_independence(spark, sf_dir):
    """Cell moments must reconcile with margins; a synthetic
    independent pair must yield delta_num == 0 everywhere; a perfectly
    dependent pair must put all mass on the diagonal."""
    from kinesis_dstream_spark.operators import dataquality as dq
    from kinesis_dstream_spark.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    rows = dq.categorical_association(orders).collect()
    n = sum(r["observed"] for r in rows)
    # margins reconcile
    rts: dict = {}
    cts: dict = {}
    for r in rows:
        rts[r["va"]] = rts.get(r["va"], 0) + r["observed"]
        cts[r["vb"]] = cts.get(r["vb"], 0) + r["observed"]
    for r in rows:
        assert r["delta_num"] == r["observed"] * n - rts[r["va"]] * cts[r["vb"]]
        assert r["expected_ppm"] == (1000000 * rts[r["va"]] * cts[r["vb"]]) // n
        want = r["delta_num"] ** 2 / (rts[r["va"]] * cts[r["vb"]] * n)
        assert abs(r["chi_contrib"] - want) < 1e-9 * max(1.0, want)

    # synthetic independent: uniform cross product
    ind = spark.createDataFrame(
        [(a, b) for a in "xy" for b in "pq" for _ in range(5)],
        "o_orderstatus string, o_orderpriority string",
    )
    for r in dq.categorical_association(ind).collect():
        assert r["delta_num"] == 0
    # synthetic dependent: b == a
    dep = spark.createDataFrame(
        [(a, a) for a in "xy" for _ in range(5)],
        "o_orderstatus string, o_orderpriority string",
    )
    for r in dq.categorical_association(dep).collect():
        if r["va"] == r["vb"]:
            assert r["delta_num"] > 0
        else:
            assert r["delta_num"] < 0


def test_rank_normalize_midrank_and_store_path(spark, sf_dir):
    """rank_ppm must equal the tie-aware mid-rank recomputed locally,
    be monotone in value per type, and the granule-store serve must
    equal the scan path exactly."""
    from kinesis_dstream_spark.streaming.jobs import (
        rank_normalize_from_store,
        streaming_percentile_maintenance,
    )
    from kinesis_dstream_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    rows = dataquality.value_rank_normalize(ev).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r["value"])
        n = sum(r["c"] for r in rs)
        cum = 0
        prev = -1
        for r in rs:
            cum += r["c"]
            want = (1000000 * (2 * cum - r["c"] + 1)) // (2 * n)
            assert r["rank_ppm"] == want, (et, r)
            assert r["rank_ppm"] > prev
            prev = r["rank_ppm"]

    streaming_percentile_maintenance(spark, sf_dir)
    got = sorted(map(tuple, rank_normalize_from_store(spark, sf_dir).collect()))
    assert got == sorted(map(tuple, rows))


def test_functional_dependency_profile_detects_key_fd(spark, sf_dir):
    """o_orderkey is the table key, so o_orderkey→o_orderpriority must
    hold exactly (0 violations, fanout 1); synthetic violating data
    must report the exact violating-key count."""
    from kinesis_dstream_spark.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    rows = {
        r["candidate"]: r
        for r in dataquality.functional_dependency_profile(orders).collect()
    }
    key_fd = rows["o_orderkey->o_orderpriority"]
    assert key_fd["n_violating_keys"] == 0
    assert key_fd["max_fanout"] == 1
    assert key_fd["violation_ppm"] == 0

    synth = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (3, "c"), (3, "c")],
        "o_custkey long, o_orderstatus string",
    )
    r = dataquality.functional_dependency_profile(
        synth, pairs=(("o_custkey", "o_orderstatus"),)
    ).collect()[0]
    assert r["n_keys"] == 3
    assert r["n_violating_keys"] == 1
    assert r["max_fanout"] == 2
    assert r["violation_ppm"] == 1000000 * 1 // 3


def test_ks_single_type_corpus_emits_null(spark):
    """r9 guard: a corpus with ONE event type has nothing to drift
    against (n_rest = 0) — the statistic must be NULL, not an ANSI
    DIVIDE_BY_ZERO crash (Spark) or NaN-vs-NULL divergence (DuckDB)."""
    ev = spark.createDataFrame(
        [(i, 1, "only", f"2024-03-0{1 + i % 5} 10:00:00", float(i)) for i in range(10)],
        "event_id long, user_id long, event_type string, ts_s string, value double",
    ).select(
        "event_id", "user_id", "event_type",
        F.col("ts_s").cast("timestamp").alias("ts"), "value",
    )
    out = dataquality.value_ks_drift(ev).collect()
    assert len(out) == 1
    assert out[0]["n_rest"] == 0
    assert out[0]["ks_stat"] is None


def test_psi_temporal_separates_drifted_from_stable(spark):
    """Constructed drift: type 'shift' moves its whole value mass
    between the early and late halves (PSI >> 0.25, the action
    threshold); type 'flat' keeps the same distribution (PSI ~ 0).
    Also pins the invariant PSI >= 0 up to the 1e-9 term grid."""
    import datetime as dt

    from kinesis_dstream_spark.operators.dataquality import value_psi_temporal

    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for i in range(400):
        early = i < 200
        ts = base + dt.timedelta(days=0 if early else 20, minutes=i)
        # 'shift': low values early, high late; 'flat': same both halves
        rows.append((eid, ts, i, "shift", 1.0 + (0.0 if early else 90.0) + i % 5, "{}")); eid += 1
        rows.append((eid, ts, i, "flat", 50.0 + i % 7, "{}")); eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {r["event_type"]: r for r in value_psi_temporal(events).collect()}
    assert got["shift"]["psi"] > 0.25, got["shift"]["psi"]
    assert got["flat"]["psi"] < 0.1, got["flat"]["psi"]
    for r in got.values():
        assert r["psi"] >= -1e-6
        assert r["n_base"] + r["n_target"] == 400


def test_benford_passes_loguniform_fails_uniform(spark):
    """Constructed referee: a log-uniform sample (the regime where
    Benford provably holds) must score a SMALL chi-square with
    digit1_frac near log10(2) ~= 0.301; a uniform sample over one
    decade must score large with digit-1 share ~1/9. Chi-square
    critical value at 8 df / alpha=0.001 is 26.1 — the bands sit far
    on either side."""
    import math

    from kinesis_dstream_spark.operators.dataquality import benford_digit_audit

    rows, eid = [], 0
    import datetime as dt

    ts = dt.datetime(2024, 1, 1)
    for i in range(4000):
        # deterministic log-uniform over [0.01, 100): u in [0,1) from a
        # hash-free stride, v = 10^(4u - 2)
        u = (i * 2654435761 % 2**32) / 2**32
        rows.append((eid, ts, i, "benford", round(10 ** (4 * u - 2), 2), "{}"))
        eid += 1
        # uniform over [1, 10): digit-1 share ~1/9
        rows.append((eid, ts, i, "uniform", round(1.0 + 9.0 * u, 2), "{}"))
        eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {r["event_type"]: r for r in benford_digit_audit(events).collect()}
    assert got["benford"]["chi_square"] < 26.1, got["benford"]
    assert math.isclose(got["benford"]["digit1_frac"], math.log10(2), abs_tol=0.03)
    assert got["uniform"]["chi_square"] > 100, got["uniform"]
    assert got["uniform"]["digit1_frac"] < 0.2


def test_benford_subunit_digits_correct(spark):
    """r10 ADVICE fix: sub-unit values must contribute their TRUE first
    significant digit (0.095 -> 9, not cents-rounded 10 -> 1), and
    near-zero values (< 5e-7, micro fixed-point 0) must be excluded
    from n entirely rather than inflating totals as phantom digit-0
    rows."""
    import datetime as dt

    from kinesis_dstream_spark.operators.dataquality import benford_digit_audit

    ts = dt.datetime(2024, 1, 1)
    rows = []
    # 9 copies of 0.095 (digit 9), 3 of 0.0004 (digit 4), 2 near-zero
    # (excluded), 4 of 2.5 (digit 2)
    vals = [0.095] * 9 + [0.0004] * 3 + [1e-9, 4e-7] + [2.5] * 4
    for eid, v in enumerate(vals):
        rows.append((eid, ts, eid, "sub", v, "{}"))
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    row = benford_digit_audit(events).collect()[0]
    # n excludes the two near-zero rows: 9 + 3 + 4 = 16
    assert row["n"] == 16, row
    # digit-1 share: no digit-1 values at all
    assert row["digit1_frac"] == 0.0, row


def test_pii_audit_and_redaction_constructed(spark):
    """Positive-path referee (the fixture corpus is PII-free, so the
    oracle pair certifies only the zero path): constructed docs with
    known emails/phones/SSNs/IPs must count exactly — in Spark AND in
    the DuckDB twin (regex parity on actual matches) — and redaction
    must remove every match, tag by class, and emit only touched
    docs."""
    import duckdb

    from kinesis_dstream_spark.operators import dataquality

    rows = [
        (0, "contact alice@example.com or bob@test.org today", "en", "a", 40),
        (1, "call 555-123-4567 or 555.987.6543 x", "en", "a", 30),
        (2, "ssn 123-45-6789 leaked from 10.0.0.1", "en", "b", 30),
        (3, "clean document with no pii at all", "en", "b", 30),
        (4, "alice@example.com again and 999-88-7777", "en", "b", 30),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r["source"]: r for r in dataquality.pii_audit(docs).collect()}
    assert got["a"]["docs_scanned"] == 2
    assert got["a"]["docs_with_email"] == 1 and got["a"]["total_email"] == 2
    assert got["a"]["docs_with_phone"] == 1 and got["a"]["total_phone"] == 2
    assert got["a"]["total_ssn"] == 0
    assert got["b"]["docs_with_ssn"] == 2 and got["b"]["total_ssn"] == 2
    assert got["b"]["docs_with_ipv4"] == 1 and got["b"]["total_ipv4"] == 1
    assert got["b"]["docs_with_email"] == 1

    # NOTE: phone rows also match nothing else; SSN "999-88-7777" must
    # not be counted as phone (different group shape)
    assert got["b"]["total_phone"] == 0

    # DuckDB twin on the SAME rows — positive-match regex parity
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR, lang VARCHAR,"
        " source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?, ?, ?, ?)", rows)
    cols = None
    for rec in con.execute(dataquality.PII_AUDIT_SQL).fetchall():
        if cols is None:
            cols = [d[0] for d in con.description]
        duck = dict(zip(cols, rec))
        sp = got[duck["source"]]
        for c in cols:
            assert duck[c] == sp[c], (duck["source"], c)

    red = {r["doc_id"]: r for r in dataquality.pii_redact(docs).collect()}
    assert set(red) == {0, 1, 2, 4}  # doc 3 untouched, not emitted
    assert red[0]["n_redactions"] == 2
    assert red[0]["text_redacted"] == "contact <EMAIL> or <EMAIL> today"
    assert "<PHONE>" in red[1]["text_redacted"]
    assert "555" not in red[1]["text_redacted"]
    assert "<SSN>" in red[2]["text_redacted"]
    assert "<IPV4>" in red[2]["text_redacted"]
    assert "<SSN>" in red[4]["text_redacted"] and "<EMAIL>" in red[4]["text_redacted"]
