"""Property-based tests (hypothesis) for the compiler and text kernels.

Each example generates a random dataset + random query payload, runs the
Spark plan, and compares against a direct Python evaluation of the same
semantics — the model-based testing the reference lacked entirely
(SURVEY §5).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kinesis_dstream_spark.plans import filter_ir

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),                      # x
        st.sampled_from(["a", "b", "c"]),                            # t
        st.one_of(st.none(), st.sampled_from(["p1", "p2"])),         # p
    ),
    min_size=0,
    max_size=30,
)

FILTERS = st.lists(
    st.one_of(
        st.builds(
            lambda v: {"propertyName": "x", "operator": "LT", "value": v},
            st.integers(0, 50),
        ),
        st.builds(
            lambda v: {"propertyName": "x", "operator": "GTE", "value": v},
            st.integers(0, 50),
        ),
        st.builds(
            lambda lo, hi: {
                "propertyName": "x",
                "operator": "BETWEEN",
                "value": min(lo, hi),
                "highValue": max(lo, hi),
            },
            st.integers(0, 50),
            st.integers(0, 50),
        ),
        st.builds(
            lambda v: {"propertyName": "t", "operator": "EQ", "value": v},
            st.sampled_from(["a", "b", "c"]),
        ),
        st.builds(
            lambda vs: {"propertyName": "t", "operator": "IN", "values": sorted(set(vs))},
            st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=3),
        ),
        st.just({"propertyName": "p", "operator": "HAS_PROPERTY"}),
        st.just({"propertyName": "p", "operator": "NOT_HAS_PROPERTY"}),
    ),
    min_size=1,
    max_size=3,
)

PAYLOADS = st.builds(
    lambda groups: {"filterGroups": [{"filters": g} for g in groups]},
    st.lists(FILTERS, min_size=1, max_size=3),
)


def _eval_filter(flt: dict, row: dict) -> bool:
    p, op = flt["propertyName"], flt["operator"]
    v = row[p]
    if op == "HAS_PROPERTY":
        return v is not None
    if op == "NOT_HAS_PROPERTY":
        return v is None
    if v is None:
        return False  # SQL three-valued logic: comparisons with NULL filter out
    if op == "LT":
        return v < flt["value"]
    if op == "GTE":
        return v >= flt["value"]
    if op == "BETWEEN":
        return flt["value"] <= v <= flt["highValue"]
    if op == "EQ":
        return v == flt["value"]
    if op == "IN":
        return v in flt["values"]
    raise AssertionError(op)


def _eval_payload(payload: dict, row: dict) -> bool:
    return any(
        all(_eval_filter(f, row) for f in g["filters"])
        for g in payload["filterGroups"]
        if g["filters"]
    )


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=ROWS, payload=PAYLOADS)
def test_filter_ir_matches_python_model(spark, rows, payload):
    data = [(i, x, t, p) for i, (x, t, p) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, x int, t string, p string")
    got = {
        r.id for r in filter_ir.compile_payload(df, payload).select("id").collect()
    }
    want = {
        i
        for i, (x, t, p) in enumerate(rows)
        if _eval_payload(payload, {"x": x, "t": t, "p": p})
    }
    assert got == want


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    toks=st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=1, max_size=12),
    k=st.integers(2, 4),
)
def test_word_shingles_model(spark, toks, k):
    from kinesis_dstream_spark.functions.textfns import word_shingles

    df = spark.createDataFrame([(toks,)], "toks array<string>")
    got = df.select(word_shingles(F.col("toks"), k).alias("s")).collect()[0].s
    if len(toks) >= k:
        want = sorted({" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)})
    else:
        want = [" ".join(toks)]
    assert sorted(got) == sorted(want)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(text=st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=80))
def test_rolling_fingerprint_model(spark, text):
    from kinesis_dstream_spark.functions.textfns import (
        FP_BASE,
        FP_MOD,
        rolling_fingerprint,
    )

    df = spark.createDataFrame([(text,)], "t string")
    got = df.select(rolling_fingerprint(F.col("t")).alias("fp")).collect()[0].fp
    want = 0
    for ch in text:
        want = (want * FP_BASE + ord(ch)) % FP_MOD
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["w1", "w2", "w3", "w4"]), min_size=1, max_size=8),
        min_size=1,
        max_size=12,
    ),
    budget=st.integers(2, 10),
)
def test_pack_sequences_model(spark, docs, budget):
    """Packing conserves tokens and bins follow the exclusive running
    offset within each shard — checked against a direct Python model."""
    import hashlib

    from kinesis_dstream_spark.operators import curation

    rows = [(i, " ".join(toks), "s") for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r["shard"], r["bin_id"]): (r["n_docs"], r["n_tokens"])
        for r in curation.pack_sequences(df, budget_tokens=budget, n_shards=2).collect()
    }

    def shard(doc_id: int) -> int:
        return int(hashlib.md5(f"pack:{doc_id}".encode()).hexdigest()[:8], 16) % 2

    want: dict = {}
    for s in (0, 1):
        offset = 0
        for i, toks in enumerate(docs):  # doc_id order
            if shard(i) != s:
                continue
            b = offset // budget
            n, t = want.get((s, b), (0, 0))
            want[(s, b)] = (n + 1, t + len(toks))
            offset += len(toks)
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=10),
        min_size=1,
        max_size=10,
    )
)
def test_repetition_stats_model(spark, docs):
    """Word/bigram fractions match a direct Python count model."""
    from collections import Counter

    from kinesis_dstream_spark.operators import curation

    rows = [(i, " ".join(toks), "s") for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["doc_id"]: r for r in curation.repetition_stats(df).collect()}
    for i, toks in enumerate(docs):
        wc = Counter(toks)
        bigrams = (
            [" ".join(p) for p in zip(toks, toks[1:])] if len(toks) >= 2 else [" ".join(toks)]
        )
        bc = Counter(bigrams)
        r = got[i]
        assert r["n_tokens"] == len(toks)
        assert r["dup_word_frac"] == round(1.0 - len(wc) / len(toks), 4)
        assert r["top_word_frac"] == round(max(wc.values()) / len(toks), 4)
        assert r["top_bigram_frac"] == round(max(bc.values()) / len(bigrams), 4)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.floats(min_value=-1000, max_value=1000, allow_nan=False, width=32),
        min_size=1,
        max_size=40,
    )
)
def test_exact_sum_matches_decimal_model(spark, vals):
    """Fixed-point sums equal the Decimal reference regardless of
    accumulation order — the property the oracle hashing relies on."""
    from decimal import ROUND_HALF_UP, Decimal

    from kinesis_dstream_spark.functions.exact import exact_sum

    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    got = df.agg(exact_sum(F.col("v")).alias("s")).collect()[0].s
    # Spark's round() is HALF_UP (not Python's banker's rounding)
    want = float(
        sum(
            Decimal(repr(float(v) * 100)).quantize(Decimal(1), rounding=ROUND_HALF_UP)
            for v in vals
        )
        / 100
    )
    assert abs(got - want) < 1e-9


# ---------------------------------------------------------------------------
# as-of event join vs the pandas merge_asof model
# ---------------------------------------------------------------------------

import datetime as _dt

import pandas as _pd

from kinesis_dstream_spark.operators import relational as _rel

_T0 = _dt.datetime(2025, 1, 1)

# (user, minute-offset, type) triples; (user, ts) pairs deduped below so
# tie-break conventions (which differ between implementations) never bite
_EVENTS = st.lists(
    st.tuples(
        st.integers(0, 3),
        st.integers(0, 500),
        st.sampled_from(["click", "purchase", "view"]),
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(rows=_EVENTS, direction=st.sampled_from(["backward", "forward"]), tol=st.integers(1, 240))
def test_asof_join_events_matches_pandas_merge_asof(spark, rows, direction, tol):
    seen: set[tuple[int, int]] = set()
    uniq = []
    for i, (u, m, t) in enumerate(rows):
        if (u, m) in seen:
            continue
        seen.add((u, m))
        uniq.append((i, _T0 + _dt.timedelta(minutes=m), u, t, 1.0, "{}"))
    events = spark.createDataFrame(
        uniq,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    )
    got = {
        r.event_id: r.matched_event_id
        for r in _rel.asof_join_events(
            events, direction=direction, tolerance_minutes=tol
        ).collect()
    }

    pdf = _pd.DataFrame(uniq, columns=["event_id", "ts", "user_id", "event_type", "value", "props"])
    left = pdf[pdf.event_type == "click"].sort_values("ts")
    right = pdf[pdf.event_type == "purchase"].sort_values("ts")
    if left.empty or right.empty:
        assert got == {}
        return
    merged = _pd.merge_asof(
        left,
        right[["ts", "user_id", "event_id"]].rename(columns={"event_id": "m_id"}),
        on="ts",
        by="user_id",
        direction=direction,
        tolerance=_pd.Timedelta(minutes=tol),
        allow_exact_matches=True,
    )
    want = {
        int(r.event_id): int(r.m_id)
        for r in merged.itertuples()
        if not _pd.isna(r.m_id)
    }
    assert got == want


@given(
    x=st.integers(min_value=0, max_value=255),
    y=st.integers(min_value=0, max_value=255),
)
@settings(max_examples=60, deadline=None)
def test_morton_interleave_is_bijective(x, y):
    """interleave(x, y) must be invertible — even bits give back x, odd
    bits y — and monotone-compatible with the quadrant structure (the
    property parquet min/max skipping relies on)."""

    def py_interleave(a: int, b: int, bits: int = 8) -> int:
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    z = py_interleave(x, y)
    back_x = sum(((z >> (2 * i)) & 1) << i for i in range(8))
    back_y = sum(((z >> (2 * i + 1)) & 1) << i for i in range(8))
    assert (back_x, back_y) == (x, y)
    # quadrant containment: top bit pair of z = (y7, x7)
    assert (z >> 15) & 1 == (y >> 7) & 1
    assert (z >> 14) & 1 == (x >> 7) & 1


@given(
    docs=st.lists(
        st.text(alphabet="ab ", min_size=1, max_size=30), min_size=1, max_size=12
    )
)
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_cms_never_underestimates_property(spark, docs):
    """For ANY corpus: CMS estimate >= exact count for every token."""
    import pyspark.sql.functions as _F

    from kinesis_dstream_spark.operators import sketches

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    rows = sketches.cms_heavy_hitters(df, k=5, depth=3, width=64).collect()
    for r in rows:
        assert r["cms_estimate"] >= r["n_occurrences"], r


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from([f"w{i}" for i in range(12)]), min_size=3, max_size=12
        ),
        min_size=2,
        max_size=12,
    ),
    cap=st.integers(min_value=1, max_value=8),
)
def test_setsim_cap_monotone_and_sound(spark, docs, cap):
    """r9 circuit-breaker properties on random corpora: (a) SOUND —
    every capped pair also appears in the uncapped exact output (the
    cap can only drop candidates, verify stays exact); (b) MONOTONE —
    a larger cap never loses a pair the smaller cap found."""
    from kinesis_dstream_spark.operators import dedup

    df = spark.createDataFrame(
        [(i, " ".join(t), "en", "s", len(t)) for i, t in enumerate(docs)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    full = {(r["doc_a"], r["doc_b"]) for r in dedup.dedup_setsim_prefix(df).collect()}
    small = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.dedup_setsim_prefix(df, max_key_rows=cap).collect()
    }
    big = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.dedup_setsim_prefix(df, max_key_rows=cap + 4).collect()
    }
    assert small <= big <= full


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from([f"w{i}" for i in range(10)]), min_size=3, max_size=10
        ),
        min_size=2,
        max_size=10,
    )
)
def test_multipass_neighborhood_superset_property(spark, docs):
    """r9 multipass ER on random corpora: the prefix+suffix union is
    always a superset of each single pass, and every emitted pair
    clears the exact Jaccard threshold (soundness of the shared
    verify)."""
    from kinesis_dstream_spark.operators import dedup

    df = spark.createDataFrame(
        [(i, " ".join(t), "en", "s", len(t)) for i, t in enumerate(docs)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    single = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.dedup_sorted_neighborhood(df).collect()
    }
    multi_rows = dedup.dedup_sorted_neighborhood_multipass(df).collect()
    multi = {(r["doc_a"], r["doc_b"]) for r in multi_rows}
    assert single <= multi
    for r in multi_rows:
        assert 5 * r["n_inter"] >= 3 * (r["n_a"] + r["n_b"] - r["n_inter"])
