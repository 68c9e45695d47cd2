"""Positional inverted-index store: serve==scan, lifecycle, pruning.

The certification spine of the lexical store (operators/lexindex.py):
the persisted serve paths must be ROW-IDENTICAL to the corpus-scan
operators (shared oracle), the append must be batch-order-independent
and replay/torn-window safe (the r12 graph-store ADVICE lesson applied
from birth), the BM25 serve read must carry a bucket PartitionFilter,
and compaction must be content-preserving.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kinesis_dstream_spark.operators import lexindex, text
from kinesis_dstream_spark.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def store(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lexidx") / "idx")
    lexindex.lex_index_ensure(docs, path)
    return path


def _readout(spark, path):
    p = spark.read.parquet(os.path.join(path, "postings")).select(
        "term", "doc_id", "tf", "dl", "positions", "bucket"
    )
    d = spark.read.parquet(os.path.join(path, "docs"))
    return (
        sorted(tuple(r) for r in p.collect()),
        sorted(tuple(r) for r in d.collect()),
    )


def test_bm25_serve_equals_scan(spark, docs, store):
    """The store serve and the corpus scan share text.bm25_rank — the
    rows must be identical, which is what lets bm25_from_store keep the
    scan's registry oracle."""
    scan = [tuple(r) for r in text.bm25_search(docs).collect()]
    serve = [tuple(r) for r in lexindex.bm25_from_store(spark, store).collect()]
    assert scan == serve and len(scan) == 20


def test_phrase_serve_equals_scan_and_counts(spark, docs, store):
    scan = [tuple(r) for r in lexindex.phrase_search(docs).collect()]
    serve = [tuple(r) for r in lexindex.phrase_from_store(spark, store).collect()]
    assert scan == serve
    assert len(scan) > 0
    # 3-term generality (hits on the sf0.001 fixture); the merge must
    # agree between scan and store for m > 2 as well
    ph3 = ("big", "order", "scan")
    s3 = [tuple(r) for r in lexindex.phrase_search(docs, ph3).collect()]
    t3 = [tuple(r) for r in lexindex.phrase_from_store(spark, store, ph3).collect()]
    assert s3 == t3
    if os.environ.get("KDS_TEST_SF_DIR", "/root/testdata/sf0.001").endswith("0.001"):
        assert len(s3) > 0, "fixture trigram must hit at sf0.001"


def test_phrase_overlapping_and_repeated_terms(spark):
    """Self-overlapping phrases ('a a' in 'a a a' matches at 1 AND 2)
    and repeated phrase terms exercise the shifted-intersect merge's
    edge cases exactly."""
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "a b a b"), (3, "b b b")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in lexindex.phrase_search(df, ("a", "a")).collect()
    }
    assert got == {1: (2, 1)}
    got2 = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in lexindex.phrase_search(df, ("a", "b")).collect()
    }
    assert got2 == {1: (1, 3), 2: (2, 1)}


def test_stats_serve_equals_scan(spark, docs, store):
    scan = lexindex.lex_index_stats(docs).collect()[0]
    frozen = lexindex.lex_index_stats_frozen(spark, store).collect()[0]
    assert tuple(scan) == tuple(frozen)
    assert scan.n_docs > 0 and scan.n_postings >= scan.n_terms


def test_append_order_independence_and_equals_full_build(
    spark, docs, tmp_path
):
    """Tokenization is stateless, so the drained index must be
    IDENTICAL under any batch partition of the corpus AND identical to
    the one-shot full build — the certification argument the streaming
    ingest entry rides on."""
    base = docs.filter(F.col("doc_id") % 5 != 4)
    b1 = docs.filter((F.col("doc_id") % 5 == 4) & (F.col("doc_id") % 2 == 0))
    b2 = docs.filter((F.col("doc_id") % 5 == 4) & (F.col("doc_id") % 2 == 1))
    pa, pb, pf = (str(tmp_path / n) for n in ("a", "b", "full"))
    lexindex.lex_index_ensure(base, pa)
    lexindex.lex_index_append(b1, pa)
    lexindex.lex_index_append(b2, pa)
    lexindex.lex_index_ensure(base, pb)
    lexindex.lex_index_append(b2, pb)
    lexindex.lex_index_append(b1, pb)
    lexindex.lex_index_ensure(docs, pf)
    ra, rb, rf = (_readout(spark, p) for p in (pa, pb, pf))
    assert ra == rb == rf

    # replay: a fully re-delivered batch is a no-op
    assert lexindex.lex_index_append(b1, pa) == 0
    assert _readout(spark, pa) == rf

    # post-append serve equals the full-corpus scan
    serve = [tuple(r) for r in lexindex.bm25_from_store(spark, pa).collect()]
    scan = [tuple(r) for r in text.bm25_search(docs).collect()]
    assert serve == scan


def test_torn_window_replay_heals(spark, docs, tmp_path):
    """Crash AFTER the postings write, BEFORE the docs write (the
    exact two-table torn window from the r12 graph-store ADVICE item):
    the replay must converge to the same final state with no duplicate
    postings — transplant-constructed torn state, then replay."""
    base = docs.filter(F.col("doc_id") % 5 != 4)
    b1 = docs.filter((F.col("doc_id") % 5 == 4) & (F.col("doc_id") % 2 == 0))
    b2 = docs.filter((F.col("doc_id") % 5 == 4) & (F.col("doc_id") % 2 == 1))
    pt, pf = str(tmp_path / "torn"), str(tmp_path / "full")
    lexindex.lex_index_ensure(base, pt)
    # simulate the crash: postings land, docs never does
    lexindex.lex_postings(b1).write.partitionBy("bucket").mode(
        "append"
    ).parquet(os.path.join(pt, "postings"))
    assert lexindex.lex_index_append(b1, pt) > 0  # replay heals
    lexindex.lex_index_append(b2, pt)
    lexindex.lex_index_ensure(docs, pf)
    assert _readout(spark, pt) == _readout(spark, pf)


def test_bm25_serve_is_bucket_pruned(spark, store):
    """The serve's postings scan must carry a bucket PartitionFilter —
    the partition-pruning property the term-hash layout exists for."""
    from kinesis_dstream_spark.operators.text import DEFAULT_BM25_QUERY

    buckets = sorted(
        {lexindex.term_bucket_py(t) for t in DEFAULT_BM25_QUERY}
    )
    pruned = (
        spark.read.parquet(os.path.join(store, "postings"))
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(list(DEFAULT_BM25_QUERY)))
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan[plan.index("PartitionFilters"):]
    assert "bucket" in pf[: pf.index("]")]


def test_bucket_portability_python_vs_jvm(spark):
    """term_bucket_py (driver-side pruning literals) must equal the
    JVM md5 bucket for every term in the vocabulary path."""
    terms = ["table", "scan", "data", "system", "model", "a", "", "Zq9"]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    jvm = {
        r.term: r.b
        for r in df.select(
            "term", lexindex._term_bucket(F.col("term")).alias("b")
        ).collect()
    }
    assert jvm == {t: lexindex.term_bucket_py(t) for t in terms}


def test_compaction_preserves_content(spark, docs, tmp_path):
    base = docs.filter(F.col("doc_id") % 5 != 4)
    rest = docs.filter(F.col("doc_id") % 5 == 4)
    p = str(tmp_path / "cmp")
    lexindex.lex_index_ensure(base, p)
    lexindex.lex_index_append(rest, p)
    before = _readout(spark, p)
    stats = lexindex.lex_index_compact(spark, p, max_files_per_bucket=1)
    assert stats["files_after"] <= stats["files_before"]
    assert _readout(spark, p) == before


def test_frozen_serve_refuses_incomplete_store(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        lexindex.bm25_from_store(spark, str(tmp_path / "nope"))
    with pytest.raises(FileNotFoundError):
        lexindex.phrase_from_store(spark, str(tmp_path / "nope"))


def test_proximity_serve_equals_scan(spark, docs, store):
    scan = [tuple(r) for r in lexindex.proximity_search(docs).collect()]
    serve = [
        tuple(r) for r in lexindex.proximity_from_store(spark, store).collect()
    ]
    assert scan == serve and len(scan) > 0
    # NEAR semantics: every returned doc's min_span clears the window
    assert all(r[1] <= lexindex._PROX_WINDOW for r in scan)


def test_proximity_nested_fold_matches_pair_enumeration(spark):
    """The nested array fold must agree with explicit pair enumeration
    on a constructed doc (both positions multi-occurrence)."""
    df = spark.createDataFrame(
        [(1, "x a y y b a b"), (2, "a y y y y y b")], "doc_id long, text string"
    )
    rows = {
        r.doc_id: (r.min_span, r.n_close)
        for r in lexindex.proximity_search(df, ("a", "b"), window=4).collect()
    }
    # doc 1: a@[2,6], b@[5,7] -> diffs {3,5,1,1}; min 1; three <= 4
    # doc 2: a@[1], b@[7] -> diff 6 > window -> excluded
    assert rows == {1: (1, 3)}


def test_hybrid_from_store_partial_embedding_coverage(spark, docs, store, sf_dir):
    """Docs without an embedding row must fuse on the lexical term
    alone (rank_sem NULL) — the embedding-backfill-trails-ingest
    reality the full-outer fuse exists for."""
    emb = load_table(spark, sf_dir, "embeddings")
    half = emb.filter(F.col("vec_id") < 20)
    rows = lexindex.hybrid_from_store_rrf(spark, store, half).collect()
    assert len(rows) == 20
    by_id = {r.doc_id: r for r in rows}
    assert any(r.rank_sem is None for r in rows), "lex-only docs must appear"
    # every row has at least one leg, and the score matches its legs
    for r in rows:
        terms = (1.0 / (60 + r.rank_lex) if r.rank_lex else 0.0) + (
            1.0 / (60 + r.rank_sem) if r.rank_sem else 0.0
        )
        assert abs(terms - r.rrf_score) < 1e-6
        assert r.rank_lex is not None or r.rank_sem is not None


def test_spell_suggest_catches_all_edit_kinds(spark):
    """The 1-delete candidate join must surface substitution, single
    insertion, single deletion, AND adjacent transposition (the
    SymSpell guarantee), verified by builtin levenshtein."""
    df = spark.createDataFrame(
        [(i, "table scan merge") for i in range(3)], "doc_id long, text string"
    )
    out = {
        r.qterm: (r.suggestion, r.dist)
        for r in lexindex.spell_suggest(
            df, ("tble", "scanx", "mmerge", "tabel")
        ).collect()
        if r.rk == 1
    }
    assert out["tble"] == ("table", 1)     # deletion in the query
    assert out["scanx"] == ("scan", 1)     # insertion in the query
    assert out["mmerge"] == ("merge", 1)   # leading duplicate
    assert out["tabel"] == ("table", 2)    # adjacent transposition


def test_spell_from_store_equals_scan(spark, docs, store):
    scan = [tuple(r) for r in lexindex.spell_suggest(docs).collect()]
    serve = [
        tuple(r)
        for r in lexindex.spell_suggest_from_store(spark, store).collect()
    ]
    assert scan == serve and len(scan) >= 3


def test_kwic_serve_equals_scan_and_window_optimality(spark, docs, store):
    scan = [tuple(r) for r in lexindex.kwic_snippets(docs).collect()]
    serve = [
        tuple(r)
        for r in lexindex.kwic_from_store(spark, store, docs).collect()
    ]
    assert scan == serve and len(scan) == 10
    # the snippet really is the rendered window: n_hits query-term
    # occurrences inside, and no window anywhere in the doc beats it
    from kinesis_dstream_spark.operators.text import DEFAULT_BM25_QUERY

    qt = set(DEFAULT_BM25_QUERY)
    texts = {
        r.doc_id: r.text.lower().split()
        for r in docs.collect()
    }
    for doc_id, start, n_hits, snippet in scan:
        toks = texts[doc_id]
        win = toks[start - 1 : start - 1 + 8]
        assert " ".join(win) == snippet
        assert sum(1 for t in win if t in qt) == n_hits
        best = max(
            sum(1 for q in range(p, min(p + 8, len(toks) + 1))
                if toks[q - 1] in qt)
            for p in range(1, len(toks) + 1)
        )
        assert n_hits == best, "a better window exists"
