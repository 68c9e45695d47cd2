"""Unigram-LM tokenizer (SentencePiece-shape, Kudo 2018) beside BPE.

The second of the two tokenizer families real pipelines train
(SentencePiece's default is the unigram LM, not BPE): a piece
VOCABULARY with per-piece log-probabilities, fit by EM over a seed
vocab, encoding each word as its maximum-likelihood segmentation
(Viterbi). This module supplies the deterministic engine variant under
the repo's exactness discipline — every source of drift in the
published algorithm is replaced by a fixed rule, so unlike the
sampled-codebook ANN families the whole train+encode chain is
golden-hash-pinnable:

* **Seed vocab** — all substrings (length ≤ ``max_piece_len``) of the
  bounded pre-token frequency table (`bpe.pretoken_freq_table`, the
  same structurally-bounded training input BPE uses), cut to the top
  ``seed_cap`` multi-char pieces by the TOTAL order (count DESC,
  piece ASC); every observed single character is always kept, so any
  word stays segmentable.
* **EM** — a FIXED number of Viterbi-EM rounds (hard EM: the E-step
  counts each word's single best segmentation, weighted by word
  frequency, instead of SentencePiece's forward-backward expected
  counts — the deterministic limit of the same estimator). Piece
  scores are µ-unit fixed-point log-probs (``round(ln(c/total)·1e6)``
  as int64 — the repo's ln discipline), so Viterbi compares exact
  integer sums; ties prefer the LONGER final piece (a total rule).
* **Prune** — after each round keep all single-char pieces plus the
  top multi-char pieces by (count DESC, piece ASC) down to
  ``vocab_size`` (the greedy frequency-prune variant of
  SentencePiece's likelihood-loss prune — same fixed-point totality).

Scale shape (the BPE argument, `bpe.py:1`): the fit is driver-side
over the ≤``max_word_table``-row frequency table — bounded regardless
of corpus size — and the corpus encode is ONE Arrow pass whose UDF
closure carries the few-KB vocab, with a per-executor word→ids memo
(Zipf: per row a dict hit, not a Viterbi run). Reference scope note:
the reference engine (app/app.py:1-121) has no tokenizer; this is
mandated LLM-pipeline extension surface (E-12).
"""

from __future__ import annotations

import math
import re
from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kinesis_dstream_spark.operators.bpe import pretoken_freq_table
from kinesis_dstream_spark.operators.text import BPE_ISH_PATTERN

DEFAULT_VOCAB_SIZE = 512
DEFAULT_SEED_CAP = 4_000
DEFAULT_MAX_PIECE_LEN = 6
DEFAULT_EM_ROUNDS = 3
DEFAULT_WORD_TABLE_CAP = 50_000

_LP_SCALE = 1_000_000
# fixed out-of-vocabulary penalty per character (µ-units): far below
# any real piece's log-prob, so Viterbi only falls back to it for
# characters the training corpus never produced
_OOV_LP = -30 * _LP_SCALE


def _mu_ln(c: int, total: int) -> int:
    """µ-unit fixed-point ln(c/total) — the repo's ln discipline:
    fix-point BEFORE any sum so Viterbi compares exact integers."""
    return round(math.log(c / total) * _LP_SCALE)


def viterbi_segment(word: str, lp: dict[str, int], max_piece_len: int) -> list[str]:
    """Maximum-likelihood segmentation of ``word`` under µ-int piece
    log-probs: exact int64 DP, ties preferring the LONGER final piece
    (checked second because the length loop runs short→long and the
    update is strict-greater-or-equal for longer candidates via >=
    on equal scores). Characters absent from ``lp`` segment as
    single-char OOV pieces at the fixed penalty."""
    n = len(word)
    best: list[int] = [0] + [-(1 << 62)] * n
    back: list[int] = [0] * (n + 1)
    for j in range(1, n + 1):
        for length in range(1, min(j, max_piece_len) + 1):
            i = j - length
            piece = word[i:j]
            sc = lp.get(piece)
            if sc is None:
                if length > 1:
                    continue
                sc = _OOV_LP
            cand = best[i] + sc
            # >= : on an exact tie the longer piece (larger length,
            # seen later in the loop) wins — a total, portable rule
            if cand >= best[j]:
                best[j] = cand
                back[j] = i
    out = []
    j = n
    while j > 0:
        i = back[j]
        out.append(word[i:j])
        j = i
    out.reverse()
    return out


def fit_unigram_lm(
    documents: DataFrame,
    vocab_size: int = DEFAULT_VOCAB_SIZE,
    seed_cap: int = DEFAULT_SEED_CAP,
    max_piece_len: int = DEFAULT_MAX_PIECE_LEN,
    em_rounds: int = DEFAULT_EM_ROUNDS,
    max_word_table: int = DEFAULT_WORD_TABLE_CAP,
) -> dict[str, int]:
    """Train the unigram LM: returns {piece: µ-int log-prob} for the
    final pruned vocab. Driver-side over the bounded word table (the
    BPE fit contract); deterministic end to end — fixed rounds, total
    tie orders, integer scores."""
    table = pretoken_freq_table(documents, max_word_table)
    # ---- seed: substring counts, singles always kept ----------------
    sub_counts: Counter = Counter()
    singles: set[str] = set()
    for w, c in table:
        for i in range(len(w)):
            singles.add(w[i])
            for j in range(i + 1, min(i + max_piece_len, len(w)) + 1):
                sub_counts[w[i : j]] += c
    multi = sorted(
        ((p, c) for p, c in sub_counts.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[:seed_cap]
    counts = {p: sub_counts[p] for p in singles}
    counts.update(dict(multi))
    # ---- fixed Viterbi-EM rounds with frequency prune ----------------
    for _ in range(em_rounds):
        total = sum(counts.values())
        lp = {p: _mu_ln(c, total) for p, c in counts.items()}
        new_counts: Counter = Counter()
        for w, c in table:
            for piece in viterbi_segment(w, lp, max_piece_len):
                new_counts[piece] += c
        kept = {p: new_counts[p] for p in singles if new_counts[p] > 0}
        # singles with zero Viterbi count survive at count 1 so every
        # observed character stays encodable (additive floor, the
        # add-one discipline)
        for p in singles:
            kept.setdefault(p, 1)
        budget = max(vocab_size - len(kept), 0)
        for p, c in sorted(
            ((p, c) for p, c in new_counts.items() if len(p) > 1 and c > 0),
            key=lambda kv: (-kv[1], kv[0]),
        )[:budget]:
            kept[p] = c
        counts = kept
    total = sum(counts.values())
    return {p: _mu_ln(c, total) for p, c in counts.items()}


def unigram_vocab(lp: dict[str, int]) -> list[str]:
    """Stable id order: pieces sorted lexicographically (a pure
    function of the trained vocab — no insertion-order dependence)."""
    return sorted(lp)


def unigram_encode_udf(lp: dict[str, int], max_piece_len: int = DEFAULT_MAX_PIECE_LEN):
    """Arrow-batched encoder: (ids, n_pieces, n_oov) per text. The
    few-KB (vocab, log-prob) closure rides the UDF; a per-executor
    word→ids memo makes the per-row cost a dict hit (Zipf)."""
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    vocab = unigram_vocab(lp)
    tok2id = {t: i for i, t in enumerate(vocab)}
    oov = len(vocab)
    pat = re.compile(BPE_ISH_PATTERN)
    cache: dict[str, list[int]] = {}

    out_schema = StructType(
        [
            StructField("ids", ArrayType(IntegerType())),
            StructField("n_pieces", LongType()),
            StructField("n_oov", LongType()),
        ]
    )

    @F.pandas_udf(out_schema)
    def encode(texts):
        import pandas as pd

        rows = []
        for t in texts:
            ids: list[int] = []
            for w in pat.findall(t or ""):
                got = cache.get(w)
                if got is None:
                    got = [
                        tok2id.get(p, oov)
                        for p in viterbi_segment(w, lp, max_piece_len)
                    ]
                    cache[w] = got
                ids.extend(got)
            rows.append((ids, len(ids), sum(1 for i in ids if i == oov)))
        return pd.DataFrame(rows, columns=["ids", "n_pieces", "n_oov"])

    return encode


def unigram_lm_token_counts(
    documents: DataFrame,
    vocab_size: int = DEFAULT_VOCAB_SIZE,
    seed_cap: int = DEFAULT_SEED_CAP,
    max_piece_len: int = DEFAULT_MAX_PIECE_LEN,
    em_rounds: int = DEFAULT_EM_ROUNDS,
) -> DataFrame:
    """Registry entry: train the unigram LM on the corpus, encode the
    corpus, report per-language piece totals and compression. No SQL
    oracle by nature (the vocab is learned state — the
    ``bpe_token_stats`` class); exactness is pinned by the pure-Python
    referee in ``tests/test_unigram_lm.py`` plus golden hashes ×3
    scales (the fit is deterministic end to end, unlike the sampled
    codebooks). ``chars_per_piece`` > 1 is the evidence the learned
    multi-char pieces are real — the character baseline would be 1.0.
    """
    lp = fit_unigram_lm(
        documents, vocab_size, seed_cap, max_piece_len, em_rounds
    )
    encode = unigram_encode_udf(lp, max_piece_len)
    per_doc = documents.select(
        "doc_id",
        "lang",
        F.length("text").alias("n_chars"),
        encode(F.col("text")).alias("e"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(F.col("e.n_pieces")).alias("total_pieces"),
            F.sum(F.col("e.n_oov")).alias("total_oov"),
            F.round(F.sum("n_chars") / F.sum(F.col("e.n_pieces")), 4).alias(
                "chars_per_piece"
            ),
        )
    )


def unigram_lm_encode_ids(
    documents: DataFrame,
    lp: dict[str, int] | None = None,
    max_len: int | None = None,
    **fit_kwargs,
) -> DataFrame:
    """Encode documents to unigram-LM piece-id arrays (the
    ``bpe_encode_ids`` twin): (doc_id, ids, n_pieces, truncated)."""
    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    if lp is None:
        lp = fit_unigram_lm(documents, **fit_kwargs)
    vocab = unigram_vocab(lp)
    tok2id = {t: i for i, t in enumerate(vocab)}
    oov = len(vocab)
    pat = re.compile(BPE_ISH_PATTERN)
    max_piece_len = max((len(p) for p in vocab), default=1)
    cache: dict[str, list[int]] = {}

    out_schema = StructType(
        [
            StructField("ids", ArrayType(IntegerType())),
            StructField("n_pieces", LongType()),
            StructField("truncated", BooleanType()),
        ]
    )

    @F.pandas_udf(out_schema)
    def encode(texts):
        import pandas as pd

        rows = []
        for t in texts:
            ids: list[int] = []
            for w in pat.findall(t or ""):
                got = cache.get(w)
                if got is None:
                    got = [
                        tok2id.get(p, oov)
                        for p in viterbi_segment(w, lp, max_piece_len)
                    ]
                    cache[w] = got
                ids.extend(got)
            n = len(ids)
            trunc = max_len is not None and n > max_len
            rows.append((ids[:max_len] if trunc else ids, n, trunc))
        return pd.DataFrame(rows, columns=["ids", "n_pieces", "truncated"])

    return documents.select(
        "doc_id", encode(F.col("text")).alias("e")
    ).select(
        "doc_id",
        F.col("e.ids").alias("ids"),
        F.col("e.n_pieces").alias("n_pieces"),
        F.col("e.truncated").alias("truncated"),
    )


def tokenizer_fertility_report(
    documents: DataFrame,
    vocab_size: int = DEFAULT_VOCAB_SIZE,
    n_merges: int | None = None,
) -> DataFrame:
    """BPE vs unigram-LM head-to-head — the tokenizer-selection table
    a multilingual pretraining team reads before committing a vocab:
    per language, FERTILITY (pieces per pre-token — the standard
    multilingual-fairness metric: a language with 2× fertility pays 2×
    the context budget for the same text) and compression for BOTH
    families trained on the SAME corpus at comparable vocabulary
    budgets. One row per (lang, tokenizer); exact integer totals,
    ppm-grid fertility (trunc-div — engine-portable).

    Learned-state class (both vocabs are fit artifacts): golden-pinned
    ×3 scales; each tokenizer's exactness is separately referee-tested
    (tests/test_bpe.py, tests/test_unigram_lm.py).

    Scale: two bounded driver-side fits over the shared word table +
    two Arrow encode passes + one pre-token count pass — all
    corpus-linear, no joins beyond the per-doc aggregation.
    """
    from kinesis_dstream_spark.operators.bpe import (
        bpe_count_udf,
        bpe_vocab,
        fit_bpe,
    )

    # comparable budgets: BPE's vocab is alphabet + n_merges tokens;
    # match the unigram vocab_size by default
    merges = fit_bpe(
        documents,
        n_merges if n_merges is not None else vocab_size,
    )
    bpe_counter = bpe_count_udf(merges)
    lp = fit_unigram_lm(documents, vocab_size=vocab_size)
    uni_encode = unigram_encode_udf(lp)
    pretok = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH_PATTERN), 0)
    ).cast("long")
    per_doc = documents.select(
        "lang",
        F.length("text").alias("n_chars"),
        pretok.alias("n_pretokens"),
        bpe_counter(F.col("text")).alias("n_bpe"),
        uni_encode(F.col("text")).alias("u"),
    )
    base = per_doc.groupBy("lang").agg(
        F.sum("n_chars").alias("chars"),
        F.sum("n_pretokens").alias("pretokens"),
        F.sum("n_bpe").alias("bpe_pieces"),
        F.sum(F.col("u.n_pieces")).alias("uni_pieces"),
    )
    rows = []
    for fam, col in (("bpe", "bpe_pieces"), ("unigram_lm", "uni_pieces")):
        rows.append(
            base.select(
                "lang",
                F.lit(fam).alias("tokenizer"),
                F.lit(
                    len(bpe_vocab(merges)) if fam == "bpe" else len(lp)
                ).cast("long").alias("vocab_size"),
                F.col(col).cast("long").alias("total_pieces"),
                F.expr(f"{col} * 1000000 div pretokens")
                .cast("long")
                .alias("fertility_ppm"),
                F.expr(f"chars * 1000000 div {col}")
                .cast("long")
                .alias("chars_per_piece_ppm"),
            )
        )
    out = rows[0].unionByName(rows[1])
    return out.orderBy("lang", "tokenizer")
