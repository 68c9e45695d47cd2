"""BPE tokenizer model checks: the Spark pipeline must agree EXACTLY
with an independent, deliberately-naive pure-Python BPE implementation
(full-table recount per merge round, no incremental bookkeeping, no
caches) on both the learned merges and every per-document token count.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kinesis_dstream_spark.operators import bpe
from kinesis_dstream_spark.operators.text import BPE_ISH_PATTERN
from kinesis_dstream_spark.tables import load_table

_PAT = re.compile(BPE_ISH_PATTERN)


# ---------------------------------------------------------------------------
# naive reference model (independent of the operator implementation)
# ---------------------------------------------------------------------------


def ref_train(texts: list[str], n_merges: int, min_pair_freq: int = 2):
    """Recount every pair over the whole word table each round."""
    wf = Counter()
    for t in texts:
        wf.update(_PAT.findall(t or ""))
    table = {w: (tuple(w), c) for w, c in wf.items()}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in table.values():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_freq:
            break
        (a, b), _ = best
        merges.append((a, b))
        new_table = {}
        for w, (syms, c) in table.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_table[w] = (tuple(out), c)
        table = new_table
    return merges


def ref_encode_count(text: str, merges) -> int:
    ranks = {p: i for i, p in enumerate(merges)}
    n = 0
    for w in _PAT.findall(text or ""):
        syms = list(w)
        while len(syms) > 1:
            cands = [
                (ranks[(syms[i], syms[i + 1])], i)
                for i in range(len(syms) - 1)
                if (syms[i], syms[i + 1]) in ranks
            ]
            if not cands:
                break
            r = min(c[0] for c in cands)
            a, b = merges[r]
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        n += len(syms)
    return n


# ---------------------------------------------------------------------------
# fixture-corpus exactness
# ---------------------------------------------------------------------------


def test_fit_bpe_matches_naive_model_on_fixture(spark, sf_dir):
    """Merges learned by the Spark-fed trainer == the naive full-recount
    model, and every per-doc count from the Arrow UDF == the naive
    encoder. max_word_table exceeds the fixture's unique pre-token count
    so the bounded cut is a no-op and equality is exact."""
    docs = load_table(spark, sf_dir, "documents")
    rows = docs.select("doc_id", "text").collect()
    texts = [r["text"] for r in rows]

    n_merges = 80
    merges = bpe.fit_bpe(docs, n_merges=n_merges, max_word_table=500_000)
    assert merges == ref_train(texts, n_merges)

    got = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", bpe.bpe_count_udf(merges)(F.col("text")).alias("n")
        ).collect()
    }
    for r in rows:
        assert got[r["doc_id"]] == ref_encode_count(r["text"], merges), r["doc_id"]


def test_bpe_token_stats_compresses(spark, sf_dir):
    """Real merges must actually compress: chars per token strictly above
    the 1.0 character baseline, token totals positive, deterministic
    across two runs."""
    docs = load_table(spark, sf_dir, "documents")
    a = bpe.bpe_token_stats(docs, n_merges=80).collect()
    b = bpe.bpe_token_stats(docs, n_merges=80).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    for r in a:
        assert r["total_bpe_tokens"] > 0
        assert r["chars_per_token"] > 1.0


def test_more_merges_never_increase_token_count(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    table = bpe.pretoken_freq_table(docs)
    m_small = bpe.learn_merges(table, n_merges=20)
    m_big = bpe.learn_merges(table, n_merges=120)
    assert m_big[:20] == m_small  # merge list grows monotonically
    text = docs.select("text").first()["text"]
    assert ref_encode_count(text, m_big) <= ref_encode_count(text, m_small)


def test_pack_sequences_bpe_budget(spark, sf_dir):
    """BPE-budgeted packing: bins sum to the corpus BPE token total and
    differ from the whitespace budget (the proxy error the real
    tokenizer removes)."""
    from kinesis_dstream_spark.operators import curation

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe.fit_bpe(docs, n_merges=80)
    packed = curation.pack_sequences(docs, merges=merges).collect()
    total = sum(r["n_tokens"] for r in packed)
    expected = (
        docs.select(bpe.bpe_count_udf(merges)(F.col("text")).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert total == expected
    ws_packed = curation.pack_sequences(docs).collect()
    assert sum(r["n_tokens"] for r in ws_packed) != total


# ---------------------------------------------------------------------------
# property-based: random corpora
# ---------------------------------------------------------------------------

CORPUS = st.lists(
    st.text(
        alphabet="ab c.xy\n",  # words, spaces, punctuation, newlines
        min_size=0,
        max_size=40,
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(texts=CORPUS)
def test_learn_and_apply_match_model_on_random_corpora(texts):
    """Driver-side trainer + apply_merges == naive model on arbitrary
    text (no Spark in the loop: pins the core algorithm itself)."""
    wf = Counter()
    for t in texts:
        wf.update(_PAT.findall(t))
    table = sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))
    merges = bpe.learn_merges(table, n_merges=30)
    assert merges == ref_train(texts, 30)
    ranks = {p: i for i, p in enumerate(merges)}
    for t in texts:
        n = sum(len(bpe.apply_merges(w, ranks)) for w in _PAT.findall(t))
        assert n == ref_encode_count(t, merges)
        # segmentation is lossless: subwords concatenate back to the text
        joined = "".join(
            "".join(bpe.apply_merges(w, ranks)) for w in _PAT.findall(t)
        )
        assert joined == "".join(_PAT.findall(t))


def test_bpe_encode_ids_roundtrip_and_truncation(spark, sf_dir):
    """Ids decode back to the exact pre-token concatenation (lossless
    below max_len); counts agree with the counter UDF; truncation caps
    the array but reports the true length."""
    docs = load_table(spark, sf_dir, "documents").limit(50)
    merges = bpe.fit_bpe(docs, n_merges=60)
    vocab = bpe.bpe_vocab(merges)
    # merge-implied symbols are unique and every merged pair is present
    assert len(vocab) == len(set(vocab))
    id2tok = dict(enumerate(vocab))

    full = {r.doc_id: r for r in bpe.bpe_encode_ids(docs, merges).collect()}
    counts = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", bpe.bpe_count_udf(merges)(F.col("text")).alias("n")
        ).collect()
    }
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    oov = len(vocab)
    for d, r in full.items():
        assert r.n_tokens == counts[d]
        assert not r.truncated and len(r.ids) == r.n_tokens
        decoded = "".join(id2tok.get(i, "\x00") for i in r.ids)
        pretokens = "".join(_PAT.findall(texts[d]))
        if oov not in set(r.ids):  # fully in-alphabet: exact round-trip
            assert decoded == pretokens

    capped = {r.doc_id: r for r in bpe.bpe_encode_ids(docs, merges, max_len=16).collect()}
    for d, r in capped.items():
        assert len(r.ids) <= 16
        assert r.n_tokens == counts[d]  # true length survives truncation
        assert r.truncated == (counts[d] > 16)


def test_bpe_empty_and_degenerate_corpora(spark):
    """Empty corpus -> no merges; single-char docs -> no merges; encode
    of empty text -> zero tokens. No crashes anywhere."""
    empty = spark.createDataFrame([], "doc_id long, text string, lang string, source string")
    assert bpe.fit_bpe(empty) == []
    assert bpe.learn_merges([]) == []
    docs = spark.createDataFrame(
        [(1, "", "en", "s"), (2, "a", "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    merges = bpe.fit_bpe(docs)  # nothing repeatable to merge
    got = {r.doc_id: r for r in bpe.bpe_encode_ids(docs, merges).collect()}
    assert got[1].n_tokens == 0 and got[1].ids == []
    assert got[2].n_tokens == 1
