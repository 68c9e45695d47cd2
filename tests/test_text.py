"""Text-analysis operators (E-12)."""

from __future__ import annotations

from kinesis_dstream_spark.operators import text
from kinesis_dstream_spark.tables import load_table


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_lang_id_marker_logic(spark):
    df = _docs(
        spark,
        [
            "the cat and the dog is in a house",  # en markers
            "el perro y la casa de que",  # es markers
            "xyzzy qwerty",  # no markers -> unknown
        ],
    )
    rows = {r.doc_id: r.pred_lang for r in text.lang_id(df).collect()}
    assert rows[0] == "en"
    assert rows[1] == "es"
    assert rows[2] == "unknown"


def test_quality_score_monotone_in_diversity(spark):
    rep = "spam " * 100
    rich = "the quick brown fox jumps over a lazy dog and runs far away to town"
    df = _docs(spark, [rep.strip(), rich])
    rows = {r.doc_id: r for r in text.quality_score(df).collect()}
    assert rows[1].type_token_ratio > rows[0].type_token_ratio
    assert rows[1].quality > rows[0].quality


def test_token_stats_bpe_lower_bound(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = text.token_stats(docs).collect()
    for r in rows:
        assert r.total_bpe_tokens >= r.total_ws_tokens  # bpe >= word count


def test_fingerprint_is_content_sensitive(spark):
    df = _docs(spark, ["abc def", "abc deg", "abc def"])
    rows = {r.doc_id: r.fingerprint for r in text.doc_fingerprints(df).collect()}
    assert rows[0] == rows[2]
    assert rows[0] != rows[1]


def test_tfidf_common_words_score_low(spark):
    """A term present in every document gets near-zero idf."""
    df = _docs(
        spark,
        [
            "common alpha alpha alpha",
            "common beta beta beta",
            "common gamma gamma gamma",
        ],
    )
    rows = text.tfidf_top_terms(df, top_k=1, max_doc_id=10).collect()
    # top term per doc is never the ubiquitous 'common'
    assert all(r.term != "common" for r in rows)


def test_corpus_curation_semantics(spark):
    """Gate drops short/low-quality docs, dedup keeps one copy (lowest
    doc_id), and budgets count only surviving docs."""
    df = _docs(
        spark,
        [
            "the quick brown fox jumps over the lazy dog every day",  # keeper
            "the quick brown fox jumps over the lazy dog every day",  # dupe
            "tiny",  # under min_tokens
            "alpha beta gamma delta epsilon zeta eta theta iota kappa",  # keeper
        ],
    )
    rows = text.corpus_curation(df, min_quality=0.0, min_tokens=5).collect()
    assert sum(r.n_docs for r in rows) == 2  # dupe + short doc removed
    assert all(r.split in ("train", "val", "test") for r in rows)
    assert all(r.total_bpe_tokens >= r.total_ws_tokens for r in rows)
    assert all(0.0 <= r.avg_quality <= 1.0 for r in rows)


def test_pii_scrub_redacts_and_counts(spark):
    from kinesis_dstream_spark.operators import text as t

    docs = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@example.co.uk or call +1 (555) 123-4567", "en", "s"),
            (2, "server at 10.0.255.3 responded; backup 192.168.1.1 down", "en", "s"),
            (3, "no sensitive content here at all", "en", "s"),
        ],
        "doc_id int, text string, lang string, source string",
    )
    row = t.pii_scrub_stats(docs).collect()[0]
    assert row.total_email == 1
    assert row.total_phone == 1
    assert row.total_ipv4 == 2
    assert row.n_docs_with_pii == 2
    # redaction really shrinks the scrubbed text
    raw_total = sum(len(r[1]) for r in docs.select("doc_id", "text").collect())
    assert row.total_chars_scrubbed < raw_total


def test_bm25_ranks_term_dense_docs_higher(spark):
    from kinesis_dstream_spark.operators import text as t

    docs = spark.createDataFrame(
        [
            (1, "data data data system model", "en", "s"),     # dense in query terms
            (2, "data and some other words here about stuff", "en", "s"),
            (3, "nothing relevant in this one at all", "en", "s"),
            (4, "model system", "en", "s"),                    # short, 2 distinct terms
        ],
        "doc_id int, text string, lang string, source string",
    )
    rows = t.bm25_search(docs, top_k=10).collect()
    ids = [r.doc_id for r in rows]
    assert 3 not in ids                      # no query term, never returned
    assert set(ids) == {1, 2, 4}
    by_id = {r.doc_id: r for r in rows}
    assert by_id[1].n_terms_hit == 3 and by_id[4].n_terms_hit == 2
    assert by_id[1].bm25 > by_id[2].bm25     # 3 distinct terms beat 1


class TestHashedEmbeddings:
    def test_deterministic_and_dense(self, spark, sf_dir):
        from kinesis_dstream_spark.operators import text as T
        from kinesis_dstream_spark.tables import load_table

        docs = load_table(spark, sf_dir, "documents").limit(50)
        a = {r["doc_id"]: list(r["embedding"]) for r in T.hashed_embeddings(docs).collect()}
        b = {r["doc_id"]: list(r["embedding"]) for r in T.hashed_embeddings(docs).collect()}
        assert a == b
        assert all(len(v) == 64 for v in a.values())

    def test_matches_python_hashing_model(self, spark):
        """Pure-Python feature-hashing twin on a tiny corpus."""
        import hashlib

        from kinesis_dstream_spark.operators import text as T

        rows = [(1, "alpha beta alpha"), (2, "gamma"), (3, "beta beta beta")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: list(r["embedding"]) for r in T.hashed_embeddings(df).collect()}

        def model(txt: str, dim: int = 64) -> list[float]:
            v = [0.0] * dim
            for tok in txt.split():
                h = hashlib.md5(tok.encode()).hexdigest()
                idx = int(h[:8], 16) % dim
                sign = 1.0 if int(h[8], 16) % 2 == 0 else -1.0
                v[idx] += sign
            return v

        assert got == {d: model(t) for d, t in rows}

    def test_feeds_ann_bruteforce(self, spark, sf_dir):
        """Composition: text -> hashed embedding -> cosine top-k runs
        end-to-end and returns a full result set (the E-12 -> E-11 bridge)."""
        from kinesis_dstream_spark.operators import similarity
        from kinesis_dstream_spark.operators import text as T
        from kinesis_dstream_spark.tables import load_table

        from pyspark.sql import functions as _F

        docs = load_table(spark, sf_dir, "documents").limit(100)
        emb = T.hashed_embeddings(docs).select(
            _F.col("doc_id").alias("vec_id"),
            "embedding",
            (_F.col("doc_id") % 10).cast("int").alias("label"),
        )
        out = similarity.ann_bruteforce_topk(emb, n_queries=3, k=5).collect()
        assert len(out) == 15


def test_text_semantic_topk_contract(spark, sf_dir):
    """Determinism, self-exclusion, k rows per query, rank ordering."""
    from kinesis_dstream_spark.operators import text as T
    from kinesis_dstream_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = T.text_semantic_topk(docs, n_queries=5, k=4).collect()
    assert len(rows) == 20
    by_q = {}
    for r in rows:
        assert r["q_id"] != r["c_id"]
        by_q.setdefault(r["q_id"], []).append((r["rk"], r["cos_sim"], r["c_id"]))
    for q, lst in by_q.items():
        lst.sort()
        assert [t[0] for t in lst] == [1, 2, 3, 4]
        sims = [t[1] for t in lst]
        assert sims == sorted(sims, reverse=True)
    again = T.text_semantic_topk(docs, n_queries=5, k=4).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_hybrid_rrf_fuses_both_rankers(spark, sf_dir):
    """RRF output must contain docs from both shortlists; a doc ranked
    top by BOTH rankers must beat a doc present in only one."""
    from kinesis_dstream_spark.operators import text as T
    from kinesis_dstream_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = T.hybrid_search_rrf(docs, k=20).collect()
    assert 0 < len(rows) <= 20
    # scores strictly ordered, ties by doc_id
    key = [(-r["rrf_score"], r["doc_id"]) for r in rows]
    assert key == sorted(key)
    both = [r for r in rows if r["rank_lex"] is not None and r["rank_sem"] is not None]
    one = [r for r in rows if (r["rank_lex"] is None) != (r["rank_sem"] is None)]
    if both and one:
        # any doc in both shortlists with decent ranks outscores a
        # doc with a single contribution at a similar rank
        assert max(r["rrf_score"] for r in both) > min(r["rrf_score"] for r in one)
    for r in rows:
        expect = 0.0
        if r["rank_lex"] is not None:
            expect += 1.0 / (60 + r["rank_lex"])
        if r["rank_sem"] is not None:
            expect += 1.0 / (60 + r["rank_sem"])
        assert abs(r["rrf_score"] - round(expect, 6)) < 1e-9


def test_chunk_documents_covers_every_token_with_overlap(spark, sf_dir):
    """Every token index must fall inside >=1 chunk; consecutive chunks
    of one doc share exactly `overlap` start offsets; reassembling
    non-overlapping parts reproduces the document."""
    from kinesis_dstream_spark.operators import text as T
    from kinesis_dstream_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(40)
    chunks = T.chunk_documents(docs, chunk_tokens=64, overlap=16).collect()
    n_toks = {
        r["doc_id"]: len(r["text"].split())
        for r in docs.select("doc_id", "text").collect()
    }
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(n_toks)
    for doc_id, lst in by_doc.items():
        lst.sort(key=lambda r: r["chunk_no"])
        # stride spacing and full coverage of the last token
        for a, b in zip(lst, lst[1:]):
            assert b["start_tok"] - a["start_tok"] == 48
        last = lst[-1]
        assert last["start_tok"] + last["n_tokens"] - 1 >= n_toks[doc_id]
        # non-overlapping reassembly equals the original token stream
        parts = [lst[0]["chunk_text"].split()] + [
            r["chunk_text"].split()[16:] for r in lst[1:]
        ]
        rebuilt = [t for p in parts for t in p]
        assert len(rebuilt) == n_toks[doc_id]


def test_late_interaction_favors_token_overlap(spark, sf_dir):
    """MaxSim semantics: a corpus doc sharing MORE query tokens must
    never rank below one sharing none (each shared token contributes
    its full self-similarity, the max over the doc's tokens); scores
    are positive integers and ranks are dense per query."""
    from pyspark.sql import functions as F

    from kinesis_dstream_spark.operators.text import late_interaction_topk

    docs = load_table(spark, sf_dir, "documents")
    rows = late_interaction_topk(docs).collect()
    assert len(rows) > 0
    by_q = {}
    for r in rows:
        assert r.maxsim > 0 and r.rk >= 1
        by_q.setdefault(r.q_id, []).append((r.rk, r.maxsim))
    for q, rs in by_q.items():
        rs.sort()
        assert [rk for rk, _ in rs] == list(range(1, len(rs) + 1))
        sims = [s for _, s in rs]
        assert sims == sorted(sims, reverse=True)
    # per-token cosine caps each contribution at 1.0, so an exact copy
    # of the query achieves the MAXIMUM possible score (= its distinct
    # token count); any doc tying it must also contain a cos-1.0 match
    # for every query token. Pin: with the copy present, q1's top-1
    # maxsim equals exactly n_distinct_tokens(q1).
    base = docs.limit(40).select("doc_id", "text")
    copy = base.where(F.col("doc_id") == 1).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    out = late_interaction_topk(base.unionByName(copy)).collect()
    n_toks = (
        base.where(F.col("doc_id") == 1)
        .select(F.explode(F.array_distinct(F.split(F.trim(F.regexp_replace("text", r"\s+", " ")), " "))))
        .count()
    )
    top1_sim = {r.q_id: r.maxsim for r in out if r.rk == 1}
    assert abs(top1_sim[1] - float(n_toks)) < 1e-6


def test_adaptive_quality_gate_semantics(spark, sf_dir):
    """Per-language accounting must be conservation-exact, the drop
    fraction must approximate drop_pct within integer-floor error for
    EVERY language (the property a global threshold violates), and
    kept quality must dominate dropped quality."""
    from kinesis_dstream_spark.operators.text import adaptive_quality_gate
    from kinesis_dstream_spark.tables import load_table

    rows = adaptive_quality_gate(load_table(spark, sf_dir, "documents")).collect()
    assert rows
    for r in rows:
        assert r.n_kept + r.n_dropped == r.n_docs
        assert r.n_dropped == r.n_docs * 20 // 100  # exact floor, per lang
        if r.n_dropped > 0:
            assert r.avg_dropped_q <= r.threshold_q <= r.avg_kept_q


def test_vocabulary_growth_accounting(spark, sf_dir):
    """n_new sums to the global vocabulary; cum_vocab is the running
    sum; the first source's new == its distinct count; every source's
    new ≤ distinct."""
    from kinesis_dstream_spark.operators import text as T
    from kinesis_dstream_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = sorted(T.vocabulary_growth(docs).collect(), key=lambda r: r["source"])
    assert rows, "no sources"
    total_vocab = rows[-1]["cum_vocab"]
    assert sum(r["n_new_tokens"] for r in rows) == total_vocab
    run = 0
    for r in rows:
        run += r["n_new_tokens"]
        assert r["cum_vocab"] == run
        assert r["n_new_tokens"] <= r["n_distinct_tokens"]
    assert rows[0]["n_new_tokens"] == rows[0]["n_distinct_tokens"]


def test_winnowing_guarantee_and_density(spark):
    """The winnowing theorem: two documents sharing a substring of at
    least w+k-1 = 8 tokens MUST share at least one fingerprint VALUE;
    and the selected density stays near 2/(w+1) (within a loose band)
    while never exceeding the gram count."""
    from kinesis_dstream_spark.operators.text import winnowing_fingerprints

    shared = "one two three four five six seven eight"  # 8 = w+k-1 tokens
    rows = [
        (0, f"alpha beta {shared} gamma delta", "s", "x", 10),
        (1, f"zeta eta theta iota {shared} kappa", "s", "x", 10),
        (2, "totally different words without any overlap here at all", "s", "x", 10),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    fps = winnowing_fingerprints(docs).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[0] & by_doc[1], "shared >= w+k-1 substring must share a fingerprint"
    assert not (by_doc[0] & by_doc[2])
    # density: each doc has n_grams - w + 1 windows; selections are
    # window minima, so count <= windows and >= windows / w
    for did, text in [(0, rows[0][1]), (1, rows[1][1]), (2, rows[2][1])]:
        n_grams = max(len(text.split()) - 3, 1)
        windows = max(n_grams - 4, 1)
        got = len([r for r in fps if r["doc_id"] == did])
        assert got <= windows
        assert got * 5 >= windows  # >= windows/w distinct minima
