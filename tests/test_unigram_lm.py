"""Unigram-LM tokenizer model checks (the BPE referee discipline,
tests/test_bpe.py): the operator must agree EXACTLY with an
independent, deliberately-naive pure-Python implementation of the same
deterministic spec — seed substring counts, fixed Viterbi-EM rounds
with frequency pruning, µ-int log-prob Viterbi — on the learned vocab
AND every per-document piece count. Plus the semantic bounds no
referee is needed for: compression > 1, OOV handling, determinism."""

from __future__ import annotations

import math
import re
from collections import Counter

from pyspark.sql import functions as F

from kinesis_dstream_spark.operators import unigram_lm
from kinesis_dstream_spark.operators.text import BPE_ISH_PATTERN
from kinesis_dstream_spark.tables import load_table

_PAT = re.compile(BPE_ISH_PATTERN)
_S = unigram_lm._LP_SCALE


# ---------------------------------------------------------------------------
# naive reference model (independent of the operator implementation)
# ---------------------------------------------------------------------------


def ref_viterbi(word, lp, max_len):
    """Plain recursive-style DP, recomputing slices — no shared code
    with the operator beyond the spec: int scores, >= longer-piece tie
    rule (length loop short→long), OOV singles at the fixed penalty."""
    n = len(word)
    best = [0] + [None] * n
    back = [0] * (n + 1)
    for j in range(1, n + 1):
        for ln in range(1, min(j, max_len) + 1):
            piece = word[j - ln : j]
            if piece in lp:
                sc = lp[piece]
            elif ln == 1:
                sc = -30 * _S
            else:
                continue
            if best[j - ln] is None:
                continue
            cand = best[j - ln] + sc
            if best[j] is None or cand >= best[j]:
                best[j] = cand
                back[j] = j - ln
    pieces = []
    j = n
    while j > 0:
        pieces.append(word[back[j] : j])
        j = back[j]
    return list(reversed(pieces))


def ref_fit(texts, vocab_size, seed_cap, max_len, rounds, table_cap):
    wf = Counter()
    for t in texts:
        wf.update(_PAT.findall(t or ""))
    table = sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))[:table_cap]
    subs: Counter = Counter()
    singles = set()
    for w, c in table:
        for i in range(len(w)):
            singles.add(w[i])
            for j in range(i + 1, min(i + max_len, len(w)) + 1):
                subs[w[i:j]] += c
    counts = {p: subs[p] for p in singles}
    counts.update(
        dict(
            sorted(
                ((p, c) for p, c in subs.items() if len(p) > 1),
                key=lambda kv: (-kv[1], kv[0]),
            )[:seed_cap]
        )
    )
    for _ in range(rounds):
        total = sum(counts.values())
        lp = {p: round(math.log(c / total) * _S) for p, c in counts.items()}
        nc: Counter = Counter()
        for w, c in table:
            for piece in ref_viterbi(w, lp, max_len):
                nc[piece] += c
        kept = {p: nc[p] for p in singles if nc[p] > 0}
        for p in singles:
            kept.setdefault(p, 1)
        budget = max(vocab_size - len(kept), 0)
        for p, c in sorted(
            ((p, c) for p, c in nc.items() if len(p) > 1 and c > 0),
            key=lambda kv: (-kv[1], kv[0]),
        )[:budget]:
            kept[p] = c
        counts = kept
    total = sum(counts.values())
    return {p: round(math.log(c / total) * _S) for p, c in counts.items()}


def test_fit_matches_naive_referee_exactly(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    params = dict(
        vocab_size=256, seed_cap=1000, max_piece_len=5, em_rounds=2
    )
    got = unigram_lm.fit_unigram_lm(docs, max_word_table=50_000, **params)
    want = ref_fit(
        texts,
        params["vocab_size"],
        params["seed_cap"],
        params["max_piece_len"],
        params["em_rounds"],
        50_000,
    )
    assert got == want  # vocab AND every µ-int log-prob


def test_per_doc_piece_counts_match_referee(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    lp = unigram_lm.fit_unigram_lm(docs)
    out = {
        r["doc_id"]: (list(r["ids"]), r["n_pieces"])
        for r in unigram_lm.unigram_lm_encode_ids(docs, lp=lp).collect()
    }
    vocab = unigram_lm.unigram_vocab(lp)
    tok2id = {t: i for i, t in enumerate(vocab)}
    oov = len(vocab)
    max_len = max(len(p) for p in vocab)
    for r in docs.select("doc_id", "text").collect():
        ids = []
        for w in _PAT.findall(r["text"] or ""):
            ids.extend(tok2id.get(p, oov) for p in ref_viterbi(w, lp, max_len))
        assert out[r["doc_id"]] == (ids, len(ids)), r["doc_id"]


def test_compression_and_zero_oov_on_train_corpus(spark, sf_dir):
    stats = unigram_lm.unigram_lm_token_counts(
        load_table(spark, sf_dir, "documents")
    ).collect()
    assert stats
    for r in stats:
        # learned multi-char pieces are real: well above the 1.0
        # single-character baseline
        assert r["chars_per_piece"] > 1.5
        # every training-corpus character is in the vocab (singles floor)
        assert r["total_oov"] == 0


def test_oov_chars_encode_at_penalty_id(spark):
    docs = spark.createDataFrame(
        [(0, "abc abc abd", "en"), (1, "abd abc", "en")],
        "doc_id long, text string, lang string",
    )
    lp = unigram_lm.fit_unigram_lm(docs, vocab_size=16, seed_cap=8)
    out = unigram_lm.unigram_lm_encode_ids(
        spark.createDataFrame([(9, "abc xyz")], "doc_id long, text string"),
        lp=lp,
    ).collect()[0]
    oov = len(unigram_lm.unigram_vocab(lp))
    # 'abc' encodes in-vocab; x/y/z were never seen → three OOV ids
    assert sum(1 for i in out["ids"] if i == oov) == 3


def test_fit_is_reproducible(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = unigram_lm.fit_unigram_lm(docs)
    b = unigram_lm.fit_unigram_lm(docs)
    assert a == b


def test_longer_piece_wins_ties():
    # 'ab' and single chars with scores making segmentations tie:
    # lp(ab) == lp(a)+lp(b) → the longer final piece must win
    lp = {"a": -1 * _S, "b": -1 * _S, "ab": -2 * _S}
    assert unigram_lm.viterbi_segment("ab", lp, 4) == ["ab"]


def test_fertility_report_invariants(spark, sf_dir):
    """One (lang, tokenizer) row per pair; fertility ≥ 1 piece per
    pre-token for BOTH families (every pre-token emits at least one
    symbol by construction); compression above the character baseline;
    the unigram leg's totals agree with the standalone
    unigram_lm_token_counts entry (shared fit, shared encode)."""
    docs = load_table(spark, sf_dir, "documents")
    rows = unigram_lm.tokenizer_fertility_report(docs).collect()
    langs = {r["lang"] for r in rows}
    assert len(rows) == 2 * len(langs)
    for r in rows:
        assert r["fertility_ppm"] >= 1_000_000, r
        assert r["chars_per_piece_ppm"] > 1_000_000, r
        assert r["vocab_size"] > 0
    uni = {r["lang"]: r["total_pieces"] for r in rows if r["tokenizer"] == "unigram_lm"}
    counts = {
        r["lang"]: r["total_pieces"]
        for r in unigram_lm.unigram_lm_token_counts(docs).collect()
    }
    assert uni == counts
