"""Training-corpus curation operators (SURVEY §2B E-10/E-12 extensions).

The quality/safety stages a pretraining data pipeline runs between raw
crawl and tokenizer: statistical-LM quality scoring, repetition
filtering (Gopher-style), benchmark-contamination detection, and
deterministic domain mixing. Complements ``operators/text.py`` (per-doc
scans) and ``operators/dedup.py`` (near-dup): these are the
corpus-relative stages — each needs one corpus-wide aggregate (vocab,
benchmark shingle set) that is small enough to broadcast, so the
per-document work stays embarrassingly parallel.

Reference scope note: the reference engine (app/app.py) is a poll/filter
pipeline with no corpus analytics; these operators are part of the
mandated LLM-pipeline extension surface, not reference parity.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kinesis_dstream_spark.functions.exact import fixedpoint
from kinesis_dstream_spark.functions.textfns import tokens, word_shingles

# Fixed-point scale for per-token log-probabilities: 6 decimal places
# keeps ln() engine differences (last-ulp libm variance ~1e-16) far from
# rounding boundaries while int64 sums stay exact for docs of any length.
_LP_SCALE = 1_000_000


def unigram_logprob_score(documents: DataFrame, vocab_size: int = 1000) -> DataFrame:
    """Perplexity-proxy quality score from a corpus unigram LM.

    The classic cheap stand-in for model-based perplexity filtering:
    train a unigram LM on the corpus itself (top ``vocab_size`` words),
    score each document by its mean per-token log-probability, and
    report a perplexity proxy ``exp(-mean_lp)``. Low-probability
    (gibberish / OOV-heavy) documents surface at the bottom.

    Scale shape (100 TB): ONE aggregation shuffle builds the word-count
    table (map-side partial aggs make it |vocab|-bounded per partition);
    the top-K vocabulary is by definition tiny and is broadcast, so
    scoring is a map-side hash join + one reaggregation keyed on doc_id.
    The corpus token total comes from a map-side ``sum(size(tokens))``
    scan — no explode, no shuffle.

    Determinism: per-token log-probs are rounded to fixed-point integers
    (µ-units) BEFORE the per-doc sum, so the double sum-order hazard is
    gone and DuckDB reproduces the exact doubles (see functions/exact.py).
    Vocabulary ties break on (count DESC, term ASC).
    """
    toks = documents.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    counts = toks.groupBy("term").agg(F.count("*").alias("cnt"))
    # Distributed top-K (TakeOrderedAndProject), NOT a global row_number
    # window: the word-count table has |distinct words| rows (easily 10^8+
    # on web text) and a no-partition window would drag it all to one
    # task. (cnt DESC, term ASC) is a total order, so the cut is
    # deterministic either way.
    vocab = counts.orderBy(F.col("cnt").desc(), F.col("term").asc()).limit(vocab_size)
    # Corpus token total: narrow scan, no explode. (int64 exact)
    n_total = documents.select(
        F.sum(F.size(tokens(F.col("text")))).alias("n")
    ).collect()[0][0]
    # OOV floor = ln(1/N): an unseen word is treated as a count-1 event.
    lp = F.when(
        F.col("cnt").isNotNull(), F.log(F.col("cnt") * F.lit(1.0) / F.lit(float(n_total)))
    ).otherwise(F.log(F.lit(1.0) / F.lit(float(n_total))))
    scored = toks.join(F.broadcast(vocab), "term", "left").select(
        "doc_id", fixedpoint(lp, _LP_SCALE).alias("lp_fp")
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"), F.sum("lp_fp").alias("lp_sum"))
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.col("lp_sum") / F.col("n_tokens") / _LP_SCALE, 4).alias(
                "avg_logprob"
            ),
            F.round(
                F.exp(-(F.col("lp_sum") / F.col("n_tokens") / _LP_SCALE)), 4
            ).alias("ppl_proxy"),
        )
    )


def bigram_lm_perplexity(
    documents: DataFrame, vocab_size: int = 1000
) -> DataFrame:
    """CCNet-style bigram-LM quality scoring — the context-aware step
    up from ``unigram_logprob_score``.

    The production pattern (CCNet, Gopher's quality bucket): score each
    document by the perplexity of a cheap statistical LM, drop (or
    down-weight) the worst tail. The unigram proxy can't see word
    ORDER — "the of and a" scores as well as fluent text built from the
    same words; a bigram model penalizes improbable transitions, which
    is most of what separates boilerplate/spam from prose at this model
    size.

    Model, all deterministic:

    - vocabulary = top-``vocab_size`` words (count DESC, term ASC), ids
      1..V by that order; every OOV word maps to id 0 — so the symbol
      space is the closed set {0..V} and the pair table is bounded by
      (V+1)² regardless of corpus size (the reason production quality
      LMs cap the vocab).
    - Laplace (add-one) transition model over adjacent-token pairs:
      ``P(w2|w1) = (c(w1,w2) + 1) / (c(w1→·) + V + 1)`` with the
      context count taken over bigram FIRST positions — rows sum to 1
      exactly, and every quantity is an exact int64.
    - per-document score: mean per-bigram log-probability and the
      perplexity proxy ``exp(-mean)``. ln() terms are fixed-pointed to
      µ-units BEFORE the per-doc sum (the ``_LP_SCALE`` discipline), so
      sum order can't break engine parity. Documents with <2 tokens
      have no bigram and are excluded (score undefined, matching the
      oracle's inner-join semantics).

    Scale shape (100 TB): ONE token-count shuffle (|vocab'|-bounded by
    map-side partials) trains the vocab; the id map is a broadcast
    (≤V rows); bigrams ride ONE window-lead exchange keyed on doc_id
    (per-doc-bounded partitions, no skew — the hottest key is one
    document); pair/context count tables are ≤(V+1)² / ≤V+1 rows —
    broadcast class — so scoring is map-side joins plus the final
    doc_id re-aggregation. Nothing anywhere holds more than (V+1)²
    rows outside a corpus-grain map stage.
    """
    toks = documents.select("doc_id", tokens(F.col("text")).alias("t"))
    words = toks.select("doc_id", F.posexplode("t").alias("pos", "term"))
    counts = words.groupBy("term").agg(F.count("*").alias("cnt"))
    # Distributed top-K cut (TakeOrderedAndProject), then ids by the
    # same total order — a ≤V-row single-partition window (bounded).
    vocab = counts.orderBy(F.col("cnt").desc(), F.col("term").asc()).limit(
        vocab_size
    )
    vid = vocab.select(
        "term",
        F.row_number()
        .over(Window.orderBy(F.col("cnt").desc(), F.col("term").asc()))
        .alias("sid"),
    )
    seq = words.join(F.broadcast(vid), "term", "left").select(
        "doc_id", "pos", F.coalesce("sid", F.lit(0)).alias("sid")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        seq.withColumn("sid2", F.lead("sid").over(w))
        .filter(F.col("sid2").isNotNull())
        .select("doc_id", "sid", "sid2")
    )
    pair_cnt = big.groupBy("sid", "sid2").agg(F.count("*").alias("c12"))
    ctx_cnt = big.groupBy("sid").agg(F.count("*").alias("c1"))
    denom_add = vocab_size + 1
    lp = F.log(
        (F.col("c12") + 1) / (F.col("c1") + F.lit(denom_add))
    )
    scored = (
        big.join(F.broadcast(pair_cnt), ["sid", "sid2"])
        .join(F.broadcast(ctx_cnt), "sid")
        .select("doc_id", fixedpoint(lp, _LP_SCALE).alias("lp_fp"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"), F.sum("lp_fp").alias("lp_sum"))
        .select(
            "doc_id",
            "n_bigrams",
            F.round(
                F.col("lp_sum") / F.col("n_bigrams") / _LP_SCALE, 4
            ).alias("avg_logprob"),
            F.round(
                F.exp(-(F.col("lp_sum") / F.col("n_bigrams") / _LP_SCALE)), 4
            ).alias("ppl_proxy"),
        )
    )


def bigram_lm_perplexity_sql(vocab_size: int = 1000) -> str:
    """DuckDB twin generated from the SAME vocab_size (the r7-ADVICE
    discipline). Mirrors the chain: vocab ids → OOV→0 mapping →
    lead() bigrams → Laplace transition lp, fixed-pointed per term."""
    duck_toks = "str_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')"
    return f"""
WITH toks AS (
  SELECT doc_id, {duck_toks} AS t FROM documents
), words AS (
  SELECT doc_id, unnest(generate_series(1, len(t))) AS pos,
         unnest(t) AS term
  FROM toks
), counts AS (
  SELECT term, count(*) AS cnt FROM words GROUP BY term
), vid AS (
  SELECT term, rk AS sid FROM (
    SELECT term, row_number() OVER (ORDER BY cnt DESC, term ASC) AS rk
    FROM counts
  ) WHERE rk <= {vocab_size}
), seq AS (
  SELECT w.doc_id, w.pos, coalesce(v.sid, 0) AS sid
  FROM words w LEFT JOIN vid v USING (term)
), big AS (
  SELECT doc_id, sid, sid2 FROM (
    SELECT doc_id, sid,
           lead(sid) OVER (PARTITION BY doc_id ORDER BY pos) AS sid2
    FROM seq
  ) WHERE sid2 IS NOT NULL
), pair_cnt AS (
  SELECT sid, sid2, count(*) AS c12 FROM big GROUP BY sid, sid2
), ctx_cnt AS (
  SELECT sid, count(*) AS c1 FROM big GROUP BY sid
), lp AS (
  SELECT b.doc_id,
         CAST(round(ln((p.c12 + 1) * 1.0 / (c.c1 + {vocab_size + 1}))
                    * {_LP_SCALE}) AS BIGINT) AS lp_fp
  FROM big b
  JOIN pair_cnt p ON p.sid = b.sid AND p.sid2 = b.sid2
  JOIN ctx_cnt c ON c.sid = b.sid
)
SELECT doc_id, count(*) AS n_bigrams,
       round(CAST(sum(lp_fp) AS BIGINT) / count(*) / {_LP_SCALE}.0, 4)
         AS avg_logprob,
       round(exp(-(CAST(sum(lp_fp) AS BIGINT) / count(*) / {_LP_SCALE}.0)), 4)
         AS ppl_proxy
FROM lp GROUP BY doc_id
"""


BIGRAM_LM_PERPLEXITY_SQL = bigram_lm_perplexity_sql()


def repetition_stats(documents: DataFrame) -> DataFrame:
    """Gopher-style repetition signals per document.

    Three signals from the Gopher/MassiveText filter family: fraction of
    duplicate words, fraction of the document taken by its single most
    frequent word, and fraction taken by its most frequent bigram.
    Boilerplate / templated / looping documents spike all three.

    Plan: words and bigrams ride ONE exploded stream, tagged with a
    'W '/'B ' marker prefix, so a single (doc_id, item) count + one
    re-aggregation to doc_id (conditional aggs per kind) produces every
    signal — two shuffles total, and crucially NO per-doc join between a
    word branch and a bigram branch (at 100 TB neither side of that join
    is broadcastable; this shape never asks the question). All aggregates
    are int counts — no float-order hazard. The (doc_id, item) keyspace
    is per-doc-bounded, so no skew is possible: the hottest key is (one
    doc, one word).
    """
    toks = tokens(F.col("text"))
    n = F.size(toks)
    m = F.greatest(n - 1, F.lit(1))
    # Bigrams: shifted-slice zip (no per-position array allocation);
    # single-token docs fall back to the whole-doc "bigram".
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, m),
            F.slice(toks, 2, m),
            lambda x, y: F.concat(x, F.lit(" "), y),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    tagged = F.concat(
        F.transform(toks, lambda t: F.concat(F.lit("W "), t)),
        F.transform(bigrams, lambda b: F.concat(F.lit("B "), b)),
    )
    items = documents.select("doc_id", F.explode(tagged).alias("item"))
    is_word = F.col("item").startswith("W ")
    per_doc = (
        items.groupBy("doc_id", "item")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(is_word, F.col("cnt"))).alias("n_tokens"),
            F.count(F.when(is_word, F.lit(1))).alias("n_unique"),
            F.max(F.when(is_word, F.col("cnt"))).alias("top_word_n"),
            F.sum(F.when(~is_word, F.col("cnt"))).alias("n_bigrams"),
            F.max(F.when(~is_word, F.col("cnt"))).alias("top_bigram_n"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        F.round(1.0 - F.col("n_unique") / F.col("n_tokens"), 4).alias("dup_word_frac"),
        F.round(F.col("top_word_n") / F.col("n_tokens"), 4).alias("top_word_frac"),
        F.round(F.col("top_bigram_n") / F.col("n_bigrams"), 4).alias("top_bigram_frac"),
        (
            (F.col("top_word_n") / F.col("n_tokens") > 0.2)
            | (F.col("top_bigram_n") / F.col("n_bigrams") > 0.18)
            | (1.0 - F.col("n_unique") / F.col("n_tokens") > 0.6)
        ).alias("repetitive"),
    )


def contamination_check(
    documents: DataFrame, benchmark_source: str = "src0", k: int = 5
) -> DataFrame:
    """Benchmark-contamination detection by k-word shingle overlap.

    Standard eval-decontamination: any training document sharing enough
    k-gram shingles with a held-out benchmark set is flagged. Here the
    "benchmark" is the fixture's ``source = benchmark_source`` slice and
    the candidates are every other document.

    Scale shape: the benchmark set is SMALL by definition (evals are
    thousands of prompts, not terabytes) — its distinct shingle set is
    built once and broadcast, so the 100 TB side is a map-side hash
    semi-join per shingle + one count-shuffle keyed on doc_id. The
    training corpus is never shuffled on shingle keys (contrast with
    self-join dedup, where both sides are big).

    Output: contaminated docs only (n_overlap >= 1) with their overlap
    fraction — the action list for the filter stage.

    The exploded candidate stream carries ONLY (doc_id, shingle); the
    per-doc shingle count joins back to the (small by construction)
    overlap result afterwards. Carrying ``size(shingles)`` through the
    explode reads nicely but is a measured 50x trap: codegen inlines the
    whole shingle-construction expression into the generated column, so
    it re-evaluates per exploded row instead of per document.
    """
    sh = word_shingles(tokens(F.col("text")), k=k)
    bench = (
        documents.filter(F.col("source") == benchmark_source)
        .select(F.explode(sh).alias("shingle"))
        .distinct()
    )
    eval_docs = documents.filter(F.col("source") != benchmark_source)
    cand = eval_docs.select("doc_id", F.explode(sh).alias("shingle"))
    overlaps = (
        cand.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    per_doc_n = eval_docs.select("doc_id", F.size(sh).alias("n_shingles"))
    return overlaps.join(per_doc_n, "doc_id").select(
        "doc_id",
        "n_shingles",
        "n_overlap",
        F.round(F.col("n_overlap") / F.col("n_shingles"), 4).alias("contam_frac"),
    )


def grouped_sample(documents: DataFrame, n_per_group: int = 20) -> DataFrame:
    """Deterministic N-per-group sample (eval/inspection set construction).

    Uniform-without-replacement per source, reproducible across engines
    and runs: rank by a salted content-stable md5 of the doc id within
    each group, keep the first N. The md5 orders documents uniformly at
    random but identically everywhere — ``TABLESAMPLE``/``rand()`` can't
    promise that, and eval sets must not silently change between runs.

    One window shuffle keyed on source; with a bounded group count the
    rank truncation makes the output |groups|×N rows regardless of
    corpus size. (For very hot groups at 100 TB, pre-filtering with
    bucket < ~4·N·100/|group| bounds the window sort input first — not
    needed at fixture scale.)
    """
    h = F.md5(F.concat(F.lit("sample:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(h, F.col("doc_id"))
    return (
        documents.select("doc_id", "source", h.alias("sort_key"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= n_per_group)
        .select("source", "doc_id", "rk")
    )


def materialize_corpus(
    documents: DataFrame,
    out_dir: str,
    val_pct: int = 10,
    test_pct: int = 10,
    max_records_per_file: int = 1_000_000,
) -> DataFrame:
    """Materialize the curated corpus as a partitioned parquet table and
    return its manifest — the final "write the training data" step.

    Layout: ``partitionBy(split, lang)`` so downstream training jobs
    partition-prune to exactly the split+language they read, with
    ``maxRecordsPerFile`` bounding file sizes (the write-side analog of
    the small-files problem the ANN compactor solves on ingest). Split
    assignment reuses the content-stable md5 recipe of
    ``deterministic_split`` — re-materializing never moves a document
    between splits. The manifest is computed from the WRITTEN table
    (read back post-write), so it certifies what landed on disk, not
    what was intended — and the DuckDB oracle recomputes the same
    numbers from the source table, closing the loop end-to-end.
    """
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < test_pct, F.lit("test"))
        .when(bucket < test_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    (
        documents.withColumn("split", split)
        .write.partitionBy("split", "lang")
        .option("maxRecordsPerFile", max_records_per_file)
        .mode("overwrite")
        .parquet(out_dir)
    )
    written = documents.sparkSession.read.parquet(out_dir)
    return written.groupBy("split", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
    )


DEFAULT_CLF_FEATURES = 1 << 18


def fit_quality_classifier(
    documents: DataFrame,
    positive_source: str = "src0",
    n_features: int = DEFAULT_CLF_FEATURES,
    epochs: int = 5,
    lr: float = 0.5,
    train_cap: int = 50_000,
    train_fraction: float = 1.0,
    seed: int = 42,
):
    """Train a fasttext-style linear quality classifier on a bounded
    sample (CCNet recipe: positives = a trusted source, negatives =
    the rest; at production the caller passes real curated labels).

    Same bounded-fit shape as the codebooks and BPE: ``limit(cap)``
    collect of (text, label) to the driver, hashed bag-of-words
    features (crc32 mod n_features — process-stable, reproducible in
    any language), seeded SGD logistic regression in numpy. The weight
    vector (n_features doubles ≈ 2 MB) broadcasts in the scoring UDF's
    closure. Returns the weight vector + bias.
    """
    import zlib

    import numpy as np

    # limit() alone takes the FIRST cap rows — source-biased when data
    # is laid out by source. At corpus scale set train_fraction << 1 so
    # the Bernoulli pre-sample spreads the cap across the whole input
    # (the codebook.fit_sampled_kmeans recipe); fixture-scale defaults
    # keep the whole corpus for determinism.
    train = documents.select(
        "text", (F.col("source") == positive_source).cast("int").alias("y")
    )
    if train_fraction < 1.0:
        train = train.sample(withReplacement=False, fraction=train_fraction, seed=seed)
    rows = train.limit(train_cap).toPandas()
    w = np.zeros(n_features)
    b = 0.0
    rng = np.random.RandomState(seed)
    feats = []
    for t in rows["text"]:
        toks = (t or "").lower().split()
        idx = np.array(
            [zlib.crc32(tok.encode()) % n_features for tok in toks] or [0],
            dtype=np.int64,
        )
        feats.append((idx, 1.0 / len(idx)))
    y = rows["y"].to_numpy()
    order = np.arange(len(rows))
    for _ in range(epochs):
        rng.shuffle(order)
        for i in order:
            idx, val = feats[i]
            p = 1.0 / (1.0 + np.exp(-(w[idx].sum() * val + b)))
            g = lr * (y[i] - p)
            # np.add.at, not fancy-index +=: a token appearing twice in a
            # doc must contribute two gradient increments (buffered
            # fancy-index assignment silently collapses duplicates)
            np.add.at(w, idx, g * val)
            b += g
    return w, b


def quality_classifier_scores(
    documents: DataFrame,
    positive_source: str = "src0",
    n_features: int = DEFAULT_CLF_FEATURES,
    **fit_kwargs,
) -> DataFrame:
    """Score the corpus with the trained classifier; report per-source
    calibration (the model should rank the positive source highest).

    Scoring is one Arrow pass; the featurizer is the same crc32 hash as
    training, so train/serve skew is structurally impossible. Rows-only
    in the registry (learned weights have no SQL oracle); pytest pins
    source separation and determinism.
    """
    import zlib

    import numpy as np
    from pyspark.sql.types import DoubleType

    w, b = fit_quality_classifier(
        documents, positive_source, n_features, **fit_kwargs
    )

    @F.pandas_udf(DoubleType())
    def score(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = (t or "").lower().split()
            idx = np.array(
                [zlib.crc32(tok.encode()) % n_features for tok in toks] or [0],
                dtype=np.int64,
            )
            out.append(1.0 / (1.0 + np.exp(-(w[idx].sum() / len(idx) + b))))
        return pd.Series(out)

    per_doc = documents.select("source", score(F.col("text")).alias("p"))
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("p"), 4).alias("avg_quality_prob"),
        F.round(F.min("p"), 4).alias("min_prob"),
        F.round(F.max("p"), 4).alias("max_prob"),
    )


def pack_sequences(
    documents: DataFrame,
    budget_tokens: int = 512,
    n_shards: int = 8,
    merges: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Sequential sequence packing: assign documents to fixed-token-budget
    training bins (the pretraining batch-packing stage).

    Pretraining concatenates documents in a deterministic order and cuts
    every ``budget_tokens``; the useful statistic is how full the bins
    run. Recipe: shard each document by a content-stable md5 bucket
    (packing must be reproducible — same argument as the split/mix
    operators), order within the shard by doc_id, and place each doc in
    the bin its exclusive running-token-offset falls into. A document
    straddling a boundary belongs to the bin where it starts.

    Scale shape: ONE shuffle — the per-shard window sort. Shard count is
    the parallelism knob (thousands at 100 TB); each shard's window is an
    independent sort of |corpus|/n_shards rows, and the follow-up bin
    aggregation reuses the same shard-prefixed key. No global sort, no
    single-partition window.

    ``merges``: pass learned BPE merges (``operators/bpe.fit_bpe``) to
    budget bins in REAL tokenizer tokens instead of whitespace words —
    the count the training batch actually pays for. Whitespace stays the
    default so the oracle-backed registry shape is unchanged.
    """
    toks = tokens(F.col("text"))
    if merges is not None:
        from kinesis_dstream_spark.operators.bpe import bpe_count_udf

        n_tok_col = bpe_count_udf(merges)(F.col("text"))
    else:
        n_tok_col = F.size(toks).cast("long")
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("pack:"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % n_shards
    )
    per_doc = documents.select("doc_id", shard.alias("shard"), n_tok_col.alias("n_tok"))
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = per_doc.withColumn(
        "bin_id",
        F.floor(F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / budget_tokens),
    )
    return (
        binned.groupBy("shard", "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.round(F.sum("n_tok") / F.lit(float(budget_tokens)), 4).alias("fill_ratio"),
        )
    )


# Per-source keep rates (percent) for the domain-mix demonstration; any
# source absent from the map falls back to DEFAULT_MIX_RATE.
DEFAULT_MIX_RATES: dict[str, int] = {"src0": 100, "src1": 75, "src2": 50, "src3": 25}
DEFAULT_MIX_RATE = 10


def domain_mix_sample(
    documents: DataFrame, rates: dict[str, int] | None = None
) -> DataFrame:
    """Deterministic stratified domain mixing (per-source keep rates).

    Corpus mixing must be reproducible across runs, engines, and cluster
    sizes — ``df.sample`` is none of those. Recipe: a content-stable
    md5 bucket in [0,100) per document (salted 'mix:' so it is
    independent of the train/val/test split hash), kept iff
    bucket < rate(source). Adding documents never flips an existing
    document's keep decision.

    One narrow scan + one small groupBy(source) shuffle; reports
    per-source totals, kept counts and realized vs target rates.
    """
    rates = DEFAULT_MIX_RATES if rates is None else rates
    rate = F.lit(DEFAULT_MIX_RATE)
    for src, r in sorted(rates.items()):
        rate = F.when(F.col("source") == src, F.lit(r)).otherwise(rate)
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 100
    )
    kept = (bucket < rate).cast("int")
    return (
        documents.select("source", rate.alias("target_pct"), kept.alias("kept"))
        .groupBy("source", "target_pct")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("kept").alias("n_kept"),
            F.round(F.sum("kept") * 100.0 / F.count("*"), 4).alias("realized_pct"),
        )
    )


def embedding_contamination(
    embeddings: DataFrame,
    threshold: float = 0.3,
    bench_mod: int = 10,
    bench_cap: int = 1_000_000,
) -> DataFrame:
    """Embedding-space decontamination: training vectors semantically
    close to any benchmark vector — EXACT, zero shuffles.

    The shingle-based ``contamination_check`` misses paraphrases; this is
    its semantic twin over the embedding column. Benchmark slice =
    ``vec_id % bench_mod == 0`` (evals are small by nature), corpus = the
    rest. Returns every corpus vector whose max cosine against the
    benchmark is ≥ threshold, with its best-matching benchmark id —
    (vec_id, bench_id, cos_sim), ties broken by lowest bench_id.

    Scale design — the decisive fact is the asymmetry: benchmarks are
    thousands-to-millions of rows (bounded by ``bench_cap``, asserted),
    the corpus is the 100 TB side. So the benchmark matrix rides the UDF
    closure (one copy per executor via task-binary broadcast, like the
    ann_bruteforce query side and every codebook here) and the corpus is
    scanned ONCE by mapInPandas with a single numpy matmul per Arrow
    batch — embarrassingly parallel, no join, no aggregation, NO
    EXCHANGE anywhere in the plan (pinned by pytest). An earlier
    cell-pruned join variant (the dedup_embedding_cosine bound, cross-
    table) was exact too but paid interpreted per-element dot products
    on every surviving candidate — measured 4x slower at bench scale
    with zero pruning on the near-isotropic fixture; the matmul path is
    both faster and structurally simpler. For a benchmark too large for
    one closure, shard B and union the per-shard argmaxes (same shape,
    one extra max-by groupBy).

    Exactness contract: scores are rounded to 4dp BEFORE the threshold
    and the argmax (benchmark columns ordered by bench_id, so numpy's
    first-max argmax IS the lowest-id tie-break) — mirroring the DuckDB
    brute-force oracle row for row.
    """
    import numpy as np
    import pandas as pd

    from kinesis_dstream_spark.functions import vectors as V

    normed = embeddings.select(
        "vec_id",
        (F.col("vec_id") % bench_mod == 0).alias("is_bench"),
        V.l2_normalize(F.col("embedding").cast("array<double>")).alias("unit"),
    )
    bench_pdf = (
        normed.filter(F.col("is_bench"))
        .select("vec_id", "unit")
        .toPandas()
        .sort_values("vec_id")
    )
    if len(bench_pdf) > bench_cap:
        raise ValueError(
            f"benchmark slice has {len(bench_pdf)} rows > bench_cap={bench_cap}; "
            "shard the benchmark matrix for closures this large"
        )
    bench_ids = bench_pdf["vec_id"].to_numpy().astype("int64")
    bmat = np.stack(bench_pdf["unit"].to_numpy()).astype(np.float64)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["unit"].to_numpy()).astype(np.float64)
            s = np.round(x @ bmat.T, 4)
            best = s.max(axis=1)
            arg = s.argmax(axis=1)  # first max -> lowest bench_id
            keep = best >= threshold
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy()[keep].astype("int64"),
                    "bench_id": bench_ids[arg[keep]],
                    "cos_sim": best[keep],
                }
            )

    return normed.filter(~F.col("is_bench")).select("vec_id", "unit").mapInPandas(
        score, "vec_id long, bench_id long, cos_sim double"
    )


def curriculum_assignment(documents: DataFrame, n_stages: int = 4) -> DataFrame:
    """Curriculum staging for training: quality-quartile x length-bucket
    cohort sizes — the assignment table a curriculum-ordered training
    run consumes (start on high-quality short documents, anneal toward
    the long tail).

    Stage = ntile({n}) over the (quality, doc_id) total order (quality
    from the oracle-backed ``text.quality_score``); length buckets are
    fixed token bands. Output per (stage, len_bucket): doc count, exact
    quality extrema (order statistics — deterministic, unlike a float
    mean), and the token budget the cohort contributes.

    Scale note: the global ntile is a single ordered pass at fixture
    scale; at 100 TB the stage boundaries come from the KMV quantile
    granules (sketches.py) and the assignment becomes a map-side
    comparison against broadcast boundaries — same output contract,
    no global sort. The RFM segmentation documents the same tradeoff.
    """
    from pyspark.sql import Window

    from kinesis_dstream_spark.operators.text import quality_score

    scored = quality_score(documents)
    staged = scored.select(
        "doc_id",
        "quality",
        "n_tokens",
        F.ntile(n_stages).over(Window.orderBy("quality", "doc_id")).alias("stage"),
        F.when(F.col("n_tokens") < 64, "short")
        .when(F.col("n_tokens") < 256, "medium")
        .otherwise("long")
        .alias("len_bucket"),
    )
    return staged.groupBy("stage", "len_bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("quality").alias("min_quality"),
        F.max("quality").alias("max_quality"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


def curriculum_assignment_kmv(
    documents: DataFrame, n_stages: int = 4, k: int = 256, shards: int = 8
) -> DataFrame:
    """Curriculum staging via broadcast KMV boundaries — the 100 TB
    variant of ``curriculum_assignment`` (the r6 review's task 2): the
    exact version's global ``ntile`` is a single-task total sort of
    every document, the one plan that cannot scale out. Here the stage
    boundaries come from a KMV bottom-k hash-rank sample (the
    ``sketches.kmv_day_granules`` machinery: md5 rank keeps the sample
    uniform AND mergeable, the two-level shard tournament keeps every
    sort partition ≤ max(n/shards, shards·k) rows, and bottom-k
    mergeability makes the two-level sample IDENTICAL to the direct
    bottom-k the single-level DuckDB twin computes). Assignment is then
    a map-side comparison of (quality, doc_id) against the ≤ n_stages−1
    broadcast boundary tuples — no global sort anywhere.

    Fully deterministic, so unlike most sketches this is hash-exact
    oracle-checkable end to end: sample membership (md5 ranks), the
    boundary order statistics (sample idx = m·j DIV n_stages in
    (quality, doc_id) order), and the lexicographic tuple comparison
    all replay identically in SQL. Stage sizes deviate from the exact
    quartiles by O(n/√k) (DKW) — pinned in pytest against the exact
    ``curriculum_assignment`` per-stage totals.

    Same output contract as the exact twin: per (stage, len_bucket)
    doc count, exact quality extrema, token budget.
    """
    from kinesis_dstream_spark.operators.text import quality_score

    scored = quality_score(documents)
    ranked = scored.select(
        "doc_id",
        "quality",
        F.md5(F.col("doc_id").cast("string")).alias("rk"),
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(shards)).alias("shard"),
    )
    w1 = Window.partitionBy("shard").orderBy("rk", "doc_id")
    samp = (
        ranked.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= k)
        .orderBy("rk", "doc_id")
        .limit(k)
        .select("doc_id", "quality")
    )
    ws = Window.orderBy("quality", "doc_id")
    ordered = samp.select(
        F.col("quality").alias("q_b"),
        F.col("doc_id").alias("d_b"),
        F.row_number().over(ws).alias("idx"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("m"),
    )
    stages = samp.sparkSession.range(1, n_stages).withColumnRenamed("id", "j")
    bounds = ordered.join(
        stages, F.col("idx") == F.expr(f"m * j DIV {n_stages}")
    ).agg(F.sort_array(F.collect_list(F.struct("q_b", "d_b"))).alias("bs"))
    staged = scored.crossJoin(F.broadcast(bounds)).select(
        "quality",
        "n_tokens",
        (
            F.lit(1)
            + F.size(
                F.filter(
                    "bs",
                    lambda b: (F.col("quality") > b["q_b"])
                    | ((F.col("quality") == b["q_b"]) & (F.col("doc_id") > b["d_b"])),
                )
            )
        ).cast("int").alias("stage"),
        F.when(F.col("n_tokens") < 64, "short")
        .when(F.col("n_tokens") < 256, "medium")
        .otherwise("long")
        .alias("len_bucket"),
    )
    return staged.groupBy("stage", "len_bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("quality").alias("min_quality"),
        F.max("quality").alias("max_quality"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


def stratified_sample_quota(
    documents: DataFrame, quota: int = 50, shards: int = 8
) -> DataFrame:
    """Deterministic per-language quota sampling — the corpus-ablation
    primitive ("give me exactly N uniformly-random docs per language,
    reproducibly"): bottom-``quota`` by md5 hash rank WITHIN each
    language, via the KMV two-level shard tournament so no window
    partition holds more than ~1/shards of a language (bottom-k
    mergeability makes the two-level winner set identical to the
    single-level one the DuckDB twin computes — the zscore/kmv family's
    argument, per (lang, shard) here).

    Output certifies sample MEMBERSHIP, not just size: per language the
    count, the sum of sampled doc_ids and sampled token mass (any
    membership difference moves the sums), and the max hash rank (the
    KMV threshold — two engines agree on it only if they picked the
    identical set).
    """
    from kinesis_dstream_spark.operators.text import quality_score

    scored = quality_score(documents).select("doc_id", "n_tokens")
    base = documents.select("doc_id", "lang").join(scored, "doc_id").select(
        "lang",
        "doc_id",
        "n_tokens",
        F.md5(F.col("doc_id").cast("string")).alias("rk"),
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(shards)).alias("shard"),
    )
    w1 = Window.partitionBy("lang", "shard").orderBy("rk", "doc_id")
    w2 = Window.partitionBy("lang").orderBy("rk", "doc_id")
    samp = (
        base.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= quota)
        .drop("rn", "shard")
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= quota)
    )
    totals = documents.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    per_lang = samp.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("doc_id").alias("sum_sampled_ids"),
        F.sum("n_tokens").cast("long").alias("sampled_tokens"),
        F.max("rk").alias("max_rank"),
    )
    return totals.join(per_lang, "lang")


def corpus_snapshot_diff(documents: DataFrame) -> DataFrame:
    """Content-level diff between two corpus snapshots — the audit a
    daily ingest pipeline runs before promoting a snapshot: how many
    documents appeared, vanished, changed content, or carried over.

    The fixture's OLD snapshot is derived deterministically (every 7th
    doc absent — an addition in the new snapshot; every 11th doc's text
    perturbed — a content change), so the diff has an exact oracle. The
    comparison is content-addressed: a FULL OUTER join on doc_id
    comparing sha256(text), the only scalable definition of "changed"
    (byte-compare via hash, never text-compare across the join).

    Plan: one shuffle on doc_id for the outer join (both sides are the
    corpus — no broadcast), map-side sha hashing, one single-row
    rollup. At 100 TB both snapshots are id-partitioned on disk and the
    join is co-located; the hash comparison never moves text bytes —
    only 32-byte digests ride the shuffle.
    """
    new = documents.select("doc_id", F.sha2(F.col("text"), 256).alias("sha_new"))
    old = (
        documents.filter(F.col("doc_id") % 7 != 3)
        .select(
            "doc_id",
            F.sha2(
                F.when(
                    F.col("doc_id") % 11 == 5,
                    F.concat(F.col("text"), F.lit(" [rev1]")),
                ).otherwise(F.col("text")),
                256,
            ).alias("sha_old"),
        )
    )
    joined = new.join(old, "doc_id", "full_outer")
    return joined.agg(
        F.sum(F.col("sha_old").isNull().cast("long")).alias("n_added"),
        F.sum(F.col("sha_new").isNull().cast("long")).alias("n_removed"),
        F.sum(
            (
                F.col("sha_old").isNotNull()
                & F.col("sha_new").isNotNull()
                & (F.col("sha_old") != F.col("sha_new"))
            ).cast("long")
        ).alias("n_changed"),
        F.sum((F.col("sha_old") == F.col("sha_new")).cast("long")).alias(
            "n_unchanged"
        ),
    )


_MIX_TOTAL = 10_000
_MIX_SQRT_SCALE = 1_000_000


def temperature_mix_quotas(documents: DataFrame, total: int = _MIX_TOTAL) -> DataFrame:
    """Temperature-based sampling quotas (α = 0.5) with EXACT integer
    apportionment — the multilingual data-mixing step (mT5/XLM-R's
    p_i ∝ c_i^α): proportional sampling drowns low-resource languages,
    uniform sampling starves the head, α ∈ (0,1) interpolates. α is
    pinned to 0.5 because sqrt is the one power IEEE-754 guarantees
    correctly rounded — the SINGLE float op in the pipeline lands on
    identical bits in every engine, and everything after it is int64.

    Quota allocation is largest-remainder (Hamilton) apportionment,
    not naive rounding: base_i = ⌊total·s_i/S⌋, then the leftover
    seats go to the largest remainders (tie → lang asc) — quotas sum
    to EXACTLY ``total`` by construction, which per-group rounding
    cannot promise. ``oversample_factor`` > 1 marks the languages the
    temperature boosts.

    Scale: one lang-cardinality groupBy; apportionment runs on the
    group table (|langs| rows) — the window is domain-bounded like the
    histogram's. Everything is decided by integer comparisons, so the
    DuckDB twin reproduces the allocation seat for seat.
    """
    counts = documents.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
    s = F.expr(f"CAST(round(sqrt(c) * {_MIX_SQRT_SCALE}) AS BIGINT)")
    base = counts.select("lang", "c", s.alias("s")).crossJoin(
        F.broadcast(
            counts.agg(
                F.sum("c").alias("ctot"),
                F.sum(s).alias("stot"),
            )
        )
    )
    shaped = base.select(
        "lang",
        "c",
        "ctot",
        "stot",
        F.expr(f"{total} * s DIV stot").alias("base_q"),
        F.expr(f"({total} * s) % stot").alias("rem"),
        F.round(F.col("s") / F.col("stot"), 4).alias("temp_share"),
        F.round(F.col("c") / F.col("ctot"), 4).alias("raw_share"),
    )
    w = Window.orderBy(F.col("rem").desc(), F.col("lang").asc())
    leftover = F.col("lb_total") - F.col("base_sum")
    return (
        shaped.crossJoin(
            F.broadcast(
                shaped.agg(
                    F.sum("base_q").alias("base_sum"), F.lit(total).alias("lb_total")
                )
            )
        )
        .withColumn("rk", F.row_number().over(w))
        .withColumn(
            "quota",
            F.col("base_q")
            + F.when(F.col("rk") <= leftover, F.lit(1)).otherwise(F.lit(0)),
        )
        .select(
            "lang",
            F.col("c").alias("n_docs"),
            "raw_share",
            "temp_share",
            "quota",
            F.round(
                (F.col("quota") * F.col("ctot")) / (F.lit(total) * F.col("c")), 4
            ).alias("oversample_factor"),
        )
    )


def systematic_sample(documents: DataFrame, k: int = 25) -> DataFrame:
    """Systematic (every k-th) sampling down an explicit order — the
    survey-sampling complement of the hash (``deterministic_split``),
    stratified-quota, and md5-rank (``grouped_sample``) samplers: sort
    by (n_chars, doc_id) and keep ranks ≡ 1 (mod k), which by
    construction spreads the sample EVENLY across the length
    distribution (hash sampling only does so in expectation). The
    pipeline use: eval sets that must cover short and long documents
    proportionally, not just randomly.

    The global order comes from ``dedup._global_rank`` (range
    partition + local rank + broadcast offsets — no single-partition
    window), so the systematic pick is scale-safe; the oracle twin
    uses the plain window row_number, value-identical by the rank
    invariance argument pinned in tests/test_dedup.py.
    """
    from kinesis_dstream_spark.operators.dedup import _global_rank

    keyed = documents.select("doc_id", "n_chars")
    ranked = _global_rank(keyed, ["n_chars", "doc_id"], "rk")
    return (
        ranked.filter((F.col("rk") % k) == 1)
        .select("doc_id", "n_chars", "rk")
    )


def systematic_sample_sql(k: int = 25) -> str:
    """DuckDB twin generated from the SAME k parameter."""
    return f"""
SELECT doc_id, n_chars, rk FROM (
  SELECT doc_id, n_chars,
         row_number() OVER (ORDER BY n_chars, doc_id) AS rk
  FROM documents
) WHERE rk % {k} = 1
"""


SYSTEMATIC_SAMPLE_SQL = systematic_sample_sql()


def pps_systematic_sample(documents: DataFrame, n: int = 100) -> DataFrame:
    """Systematic PPS sampling (Madow): sample documents with
    probability PROPORTIONAL to token count — the curation move when a
    token budget, not a document budget, drives selection (a 5k-token
    doc should be n× likelier in the mix than a 5-token one; uniform
    doc sampling systematically over-weights short docs token-wise).

    Mechanics, all integer-exact: walk the corpus in doc_id order,
    accumulate token weights, lay a fixed stride = total_tokens div n
    over the cumulative axis, and pick every document whose weight
    interval crosses a stride boundary. ``n_picks`` = boundary
    crossings inside the doc's interval (a doc heavier than the stride
    is a certainty unit picked multiple times — honest PPS
    accounting). Exactly ``total div stride`` picks overall.

    Scale shape: the cumulative sum is the 2-pass range-partitioned
    running sum (``dedup._global_cumsum`` — no single-partition
    window); stride/total are one scalar aggregate. The oracle twin
    uses the plain ordered-window sum, value-identical by the same
    partition-boundary-invariance argument as ``_global_rank``'s.
    """
    from kinesis_dstream_spark.operators.dedup import _global_cumsum

    w = documents.select(
        "doc_id",
        "source",
        F.greatest(F.lit(1), F.size(tokens(F.col("text"))))
        .cast("long")
        .alias("w_tokens"),
    )
    cum = _global_cumsum(w, ["doc_id"], "w_tokens", "cum_w")
    total = cum.agg(F.max("cum_w")).collect()[0][0]  # scalar (driver-bounded)
    stride = max(1, int(total) // n)
    prev = F.col("cum_w") - F.col("w_tokens")
    picks = F.expr(f"cum_w div {stride}") - F.expr(f"(cum_w - w_tokens) div {stride}")
    return (
        cum.withColumn("n_picks", picks.cast("long"))
        .filter(F.col("n_picks") > 0)
        .select("doc_id", "source", "w_tokens", "cum_w", "n_picks")
    )


def pps_systematic_sample_sql(n: int = 100) -> str:
    """DuckDB twin generated from the SAME n: the stride is computed
    in-query from the same total (scalar subquery — the oracle has no
    driver)."""
    return f"""
WITH w AS (
  SELECT doc_id, source,
         greatest(1, len(str_split(trim(regexp_replace(text, '\\s+', ' ', 'g')),
                                   ' '))) AS w_tokens
  FROM documents
), cum AS (
  SELECT doc_id, source, CAST(w_tokens AS BIGINT) AS w_tokens,
         CAST(sum(w_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_w
  FROM w
), s AS (
  SELECT greatest(1, max(cum_w) // {n}) AS stride FROM cum
)
SELECT doc_id, source, w_tokens, cum_w,
       CAST(cum_w // stride - (cum_w - w_tokens) // stride AS BIGINT)
         AS n_picks
FROM cum, s
WHERE cum_w // stride - (cum_w - w_tokens) // stride > 0
"""


PPS_SYSTEMATIC_SAMPLE_SQL = pps_systematic_sample_sql()


# Default target mixture for the budget solve: even-indexed sources get
# double the share of odd-indexed ones; the 20 ppm weights sum to
# exactly 1_000_000 so the needed-token split is an exact partition of
# the budget.
MIX_TARGET_PPM = {
    f"src{i}": (66666 if i % 2 == 0 else 33334) for i in range(20)
}


def _needed_tokens_sql(budget_tokens: int, div: str, w: str = "w_ppm") -> str:
    """int64-safe ``budget·w div 1e6``: the budget's quotient/remainder
    by 1e6 are folded driver-side (the budget is a parameter literal),
    so no intermediate exceeds max(budget, 1e12) — exact for ANY int64
    budget (see mixture_budget_solve docstring identity). ``div`` is
    the engine's trunc-div spelling ('div' Spark, '//' DuckDB)."""
    bq, br = int(budget_tokens) // 1_000_000, int(budget_tokens) % 1_000_000
    wb = f"CAST({w} AS BIGINT)"  # DuckDB VALUES-typed weights are INT32
    return f"CAST({wb} * {bq} + ({wb} * {br}) {div} 1000000 AS BIGINT)"


# epochs saturation: n·1e6 div a itself stops fitting int64 once
# n div a > 9.2e12 (≈ 9.2 billion repeat epochs — beyond any physical
# mix). Rather than throw (Spark ANSI) or wrap (naively), the fragment
# SATURATES at _EPOCHS_PPM_SAT, the largest multiple of 1e6 below
# int64 max — a self-labeling "effectively infinite repetition" value.
_EPOCHS_Q_CAP = 9_223_372_036_854
_EPOCHS_PPM_SAT = _EPOCHS_Q_CAP * 1_000_000


def _epochs_ppm_sql(n: str, a: str, div: str) -> str:
    """int64-safe ``n·1e6 div a`` via the two-step remainder identity
    (intermediates bounded by a·1e3, never n·1e6), saturating at
    ``_EPOCHS_PPM_SAT`` when the true value wouldn't fit int64.
    ``n``/``a`` must be simple column references (each appears three
    times); CASE evaluates lazily in both engines, so the full formula
    never executes on saturating rows."""
    full = (
        f"(({n} {div} {a}) * 1000000"
        f" + (({n} % {a}) * 1000 {div} {a}) * 1000"
        f" + ((({n} % {a}) * 1000 % {a}) * 1000) {div} {a})"
    )
    return (
        # >= not >: at exactly n div a == _EPOCHS_Q_CAP the unsaturated
        # formula evaluates cap*1e6 (only 775,807 of int64 headroom left)
        # plus remainder terms up to ~1e6 — overflowing under ANSI. The
        # boundary value is within rounding noise of the sentinel anyway
        # (r10 ADVICE).
        f"(CASE WHEN ({n} {div} {a}) >= {_EPOCHS_Q_CAP}"
        f" THEN {_EPOCHS_PPM_SAT} ELSE {full} END)"
    )


def mixture_budget_solve(
    documents: DataFrame,
    budget_tokens: int = 100_000,
    target_ppm: dict[str, int] | None = None,
) -> DataFrame:
    """The data-mixing DECISION step (the solve that precedes
    ``domain_mix_sample``'s rate application): given a token budget and
    a target mixture over sources, compute per source how many tokens
    the mix needs, the keep-rate that achieves it by downsampling, the
    repeat factor when the source is UNDERSUPPLIED (epochs > 1 — the
    "repeat data" regime LLM mixing recipes price explicitly), and the
    absolute deficit. All integer ppm arithmetic:

      tokens_needed = budget · w_ppm div 10⁶        (exact partition)
      epochs_ppm    = needed · 10⁶ div available    (NULL if no supply)
      keep_rate_ppm = min(10⁶, epochs_ppm)          (downsample cap)
      deficit       = max(0, needed − available)

    Overflow discipline (r9-ADVICE: the naive ``budget·w_ppm`` and
    ``needed·10⁶`` intermediates overflow int64 once the budget passes
    ~9.2e12 tokens — squarely in-domain for trillion-token LLM mixes).
    Both products are decomposed by exact quotient/remainder identities
    so every intermediate stays within int64 for ANY int64 budget:

      budget·w div 10⁶  =  w·(budget div 10⁶) + (w·(budget mod 10⁶)) div 10⁶
      n·10⁶ div a       =  (n div a)·10⁶ + ((r·10³) div a)·10³
                           + (((r·10³) mod a)·10³) div a,   r = n mod a

    (identities exact for trunc division on non-negatives; verified by
    a randomized pytest with Python bignums as referee). epochs_ppm
    itself stops fitting int64 once needed/available > 9.2e12 — there
    the fragment SATURATES at ``_EPOCHS_PPM_SAT`` (≈9.2e18 ppm, i.e.
    9.2 billion epochs) instead of throwing, identically in both
    engines. One bound remains documented rather than guarded: the
    remainder step needs tokens_available ≤ 9.2e15 (a ~9-quadrillion-
    token corpus; 100 TB of text is ~2.5e13).

    A target source absent from the corpus keeps its row
    (tokens_available = 0, NULL epochs, full deficit) — the missing-
    domain alarm. Division guards follow the r9 ANSI rule: Spark
    throws on integer /0 where DuckDB returns NULL, so zero-supply is
    an explicit NULL in both engines.

    Plan at 100 TB: ONE corpus scan into a map-combined
    groupBy(source) token sum (|sources| rows), joined to the literal
    target table (broadcast by size) — the solve is a dashboard-cheap
    aggregate no matter the corpus size.
    """
    target_ppm = MIX_TARGET_PPM if target_ppm is None else target_ppm
    spark = documents.sparkSession
    tgt = spark.createDataFrame(
        sorted(target_ppm.items()), "source string, w_ppm long"
    )
    avail = (
        documents.select("source", F.size(tokens(F.col("text"))).alias("nt"))
        .groupBy("source")
        .agg(F.sum("nt").cast("long").alias("tokens_available"))
    )
    j = tgt.join(avail, "source", "left").select(
        "source",
        F.coalesce("tokens_available", F.lit(0)).alias("tokens_available"),
        F.expr(_needed_tokens_sql(budget_tokens, "div")).alias("tokens_needed"),
    )
    epochs = F.expr(
        _epochs_ppm_sql("tokens_needed", "tokens_available", "div")
    )
    return j.select(
        "source",
        "tokens_available",
        "tokens_needed",
        F.when(F.col("tokens_available") > 0, F.least(F.lit(1_000_000), epochs))
        .alias("keep_rate_ppm"),
        F.when(F.col("tokens_available") > 0, epochs).alias("epochs_ppm"),
        F.greatest(
            F.lit(0).cast("long"),
            F.col("tokens_needed") - F.col("tokens_available"),
        ).alias("deficit_tokens"),
    )


def mixture_budget_sql(
    budget_tokens: int = 100_000, target_ppm: dict[str, int] | None = None
) -> str:
    """DuckDB twin generated from the SAME budget and target dict
    (param discipline — the VALUES list IS the parameter)."""
    target_ppm = MIX_TARGET_PPM if target_ppm is None else target_ppm
    values = ",\n         ".join(
        f"('{s}', {w})" for s, w in sorted(target_ppm.items())
    )
    return f"""
WITH tgt(source, w_ppm) AS (
  VALUES {values}
), avail AS (
  SELECT source,
         CAST(sum(len(str_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')))
              AS BIGINT) AS tokens_available
  FROM documents GROUP BY 1
), j AS (
  SELECT t.source,
         coalesce(a.tokens_available, 0) AS tokens_available,
         {_needed_tokens_sql(budget_tokens, "//", "t.w_ppm")} AS tokens_needed
  FROM tgt t LEFT JOIN avail a ON a.source = t.source
)
SELECT source, tokens_available, tokens_needed,
       CASE WHEN tokens_available > 0 THEN
         least(1000000,
               {_epochs_ppm_sql("tokens_needed", "tokens_available", "//")})
       END AS keep_rate_ppm,
       CASE WHEN tokens_available > 0 THEN
         {_epochs_ppm_sql("tokens_needed", "tokens_available", "//")}
       END AS epochs_ppm,
       greatest(0, tokens_needed - tokens_available) AS deficit_tokens
FROM j
"""


MIXTURE_BUDGET_SQL = mixture_budget_sql()


def curation_pipeline_report(
    documents: DataFrame,
    budget_tokens: int = 100_000,
    target_ppm: dict[str, int] | None = None,
    min_tokens: int = 5,
    max_tokens: int = 5000,
) -> DataFrame:
    """End-to-end curation pipeline in ONE declarative plan — the
    composition a training-data run actually executes, with per-source
    survivorship accounting at every stage:

      1. quality gate: token count in [min_tokens, max_tokens];
      2. exact dedup: keep the min-doc_id representative per
         normalized-text md5 (the content-hash grouping — no window,
         a min-aggregate + semi-join);
      3. mixture application: solve the per-source keep-rate for the
         token budget ON THE DEDUPED SURVIVORS (the rates join back
         into the same plan — no driver round-trip), then keep each
         doc iff its salted md5 ppm-bucket clears the rate (the
         ``domain_mix_sample`` decision, content-stable across runs).

    Output per source: n_raw, n_quality, n_dedup, n_final,
    tokens_final. Every stage is deterministic and relational, so the
    WHOLE pipeline is one oracle-checked query — the composition
    guarantee (stage interfaces can't drift apart silently).

    Scale shape: two row-grain shuffles total (the md5 dedup group and
    the per-source rollups); the rate table is |sources| rows joined
    broadcast; nothing collects. Sources absent from the target
    mixture get rate 0 (excluded from the final mix, still accounted).
    """
    target_ppm = MIX_TARGET_PPM if target_ppm is None else target_ppm
    spark = documents.sparkSession
    tgt = spark.createDataFrame(
        sorted(target_ppm.items()), "source string, w_ppm long"
    )
    norm = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    base = documents.select(
        "doc_id",
        "source",
        F.md5(norm).alias("h"),
        F.size(tokens(F.col("text"))).cast("long").alias("nt"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 1_000_000
        ).alias("bucket_ppm"),
    ).localCheckpoint(eager=True)  # three stage rollups + the rate join
    q = base.filter(
        (F.col("nt") >= min_tokens) & (F.col("nt") <= max_tokens)
    )
    keepers = q.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    dd = q.join(keepers, ["h", "doc_id"])  # semi: the kept representative
    avail = dd.groupBy("source").agg(F.sum("nt").alias("ta"))
    rates = (
        avail.join(tgt, "source", "left")
        # int64-safe needed/epochs fragments (shared with the solve —
        # see _needed_tokens_sql/_epochs_ppm_sql overflow identities)
        .withColumn(
            "needed", F.expr(_needed_tokens_sql(budget_tokens, "div"))
        )
        .select(
            "source",
            F.when(
                F.col("w_ppm").isNotNull() & (F.col("ta") > 0),
                F.least(
                    F.lit(1_000_000),
                    F.expr(_epochs_ppm_sql("needed", "ta", "div")),
                ),
            )
            .otherwise(F.lit(0))
            .alias("keep_rate_ppm"),
        )
    )
    final = dd.join(F.broadcast(rates), "source").filter(
        F.col("bucket_ppm") < F.col("keep_rate_ppm")
    )
    r_raw = base.groupBy("source").agg(F.count(F.lit(1)).alias("n_raw"))
    r_q = q.groupBy("source").agg(F.count(F.lit(1)).alias("n_quality"))
    r_dd = dd.groupBy("source").agg(F.count(F.lit(1)).alias("n_dedup"))
    r_fin = final.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_final"),
        F.sum("nt").alias("tokens_final"),
    )
    return (
        r_raw.join(r_q, "source", "left")
        .join(r_dd, "source", "left")
        .join(r_fin, "source", "left")
        .select(
            "source",
            "n_raw",
            F.coalesce("n_quality", F.lit(0)).alias("n_quality"),
            F.coalesce("n_dedup", F.lit(0)).alias("n_dedup"),
            F.coalesce("n_final", F.lit(0)).alias("n_final"),
            F.coalesce("tokens_final", F.lit(0)).alias("tokens_final"),
        )
    )


def curation_pipeline_sql(
    budget_tokens: int = 100_000,
    target_ppm: dict[str, int] | None = None,
    min_tokens: int = 5,
    max_tokens: int = 5000,
) -> str:
    """DuckDB twin generated from the SAME parameters — the whole
    pipeline as one WITH-chain."""
    target_ppm = MIX_TARGET_PPM if target_ppm is None else target_ppm
    values = ",\n         ".join(
        f"('{s}', {w})" for s, w in sorted(target_ppm.items())
    )
    return f"""
WITH tgt(source, w_ppm) AS (
  VALUES {values}
), base AS (
  SELECT doc_id, source,
         md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS h,
         CAST(len(str_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '))
              AS BIGINT) AS nt,
         CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 1000000 AS bucket_ppm
  FROM documents
), q AS (
  SELECT * FROM base WHERE nt BETWEEN {int(min_tokens)} AND {int(max_tokens)}
), keepers AS (
  SELECT h, min(doc_id) AS doc_id FROM q GROUP BY 1
), dd AS (
  SELECT q.* FROM q JOIN keepers k ON k.h = q.h AND k.doc_id = q.doc_id
), avail AS (
  SELECT source, CAST(sum(nt) AS BIGINT) AS ta FROM dd GROUP BY 1
), rates AS (
  SELECT source,
         CASE WHEN w_ppm IS NOT NULL AND ta > 0 THEN
           least(1000000, {_epochs_ppm_sql("needed", "ta", "//")})
         ELSE 0 END AS keep_rate_ppm
  FROM (
    SELECT a.source, t.w_ppm, a.ta,
           {_needed_tokens_sql(budget_tokens, "//", "t.w_ppm")} AS needed
    FROM avail a LEFT JOIN tgt t ON t.source = a.source
  )
), fin AS (
  SELECT d.* FROM dd d JOIN rates r ON r.source = d.source
  WHERE d.bucket_ppm < r.keep_rate_ppm
)
SELECT b.source,
       CAST(count(*) AS BIGINT) AS n_raw,
       CAST(count(q.doc_id) AS BIGINT) AS n_quality,
       CAST(count(d.doc_id) AS BIGINT) AS n_dedup,
       CAST(count(f.doc_id) AS BIGINT) AS n_final,
       CAST(coalesce(sum(CASE WHEN f.doc_id IS NOT NULL THEN f.nt END), 0)
            AS BIGINT) AS tokens_final
FROM base b
LEFT JOIN q ON q.doc_id = b.doc_id
LEFT JOIN dd d ON d.doc_id = b.doc_id
LEFT JOIN fin f ON f.doc_id = b.doc_id
GROUP BY 1
"""


CURATION_PIPELINE_SQL = curation_pipeline_sql()


def shard_balance_plan(documents: DataFrame, n_shards: int = 8) -> DataFrame:
    """Training-shard assembly plan (r11): assign every document to one
    of ``n_shards`` shards balancing TOTAL TOKENS per shard — the step
    that turns a curated corpus into the fixed-size input files a
    trainer streams, where one fat shard sets the epoch's critical
    path. Uniform doc round-robin balances document COUNTS and lets
    token mass skew with the length distribution; this plan balances
    the quantity the trainer actually pays for.

    Mechanics: rank documents by (tokens DESC, doc_id) — the scalable
    2-pass ``_global_rank``, no single-partition sort — then deal them
    SERPENTINE (boustrophedon): round r = (rank−1) div N takes shards
    left-to-right when r is even, right-to-left when odd, so the shard
    that got the heaviest doc of round r gets the lightest of round
    r+1. Every shard receives one doc per round from a contiguous
    weight-sorted band; the alternation cancels the within-band bias
    that plain sorted round-robin accumulates (pytest measures both on
    a skewed corpus). Assignment is a closed integer form of the rank
    alone — deterministic, engine-identical, replayable.

    Output: one row per shard — n_docs, total_tokens, max_doc_tokens,
    share_ppm (token share of the corpus, trunc-div grid). Imbalance
    reads directly off max−min of total_tokens; the pytest pins it at
    ≤ the largest document weight on the fixture AND on a constructed
    adversarially-skewed corpus.

    Plan: one token-count projection, the 2-pass rank, one shard-grain
    aggregate (N rows), one broadcast of the 1-row grand total. The
    only corpus-grain exchange is the range partition inside the rank.
    """
    from kinesis_dstream_spark.operators.dedup import _global_rank

    n = int(n_shards)
    w = documents.select(
        "doc_id",
        F.greatest(F.lit(1), F.size(tokens(F.col("text"))))
        .cast("long")
        .alias("w_tokens"),
    ).withColumn("neg_w", -F.col("w_tokens"))
    ranked = _global_rank(w, ["neg_w", "doc_id"], "r").drop("neg_w")
    assigned = ranked.withColumn(
        "shard",
        F.expr(
            f"CASE WHEN ((r - 1) div {n}) % 2 = 0 THEN (r - 1) % {n} "
            f"ELSE {n - 1} - ((r - 1) % {n}) END"
        ).cast("int"),
    )
    per = assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("w_tokens").alias("total_tokens"),
        F.max("w_tokens").alias("max_doc_tokens"),
    )
    grand = per.agg(F.sum("total_tokens").alias("g"))
    return (
        per.crossJoin(F.broadcast(grand))
        .select(
            "shard",
            "n_docs",
            "total_tokens",
            "max_doc_tokens",
            F.expr("CAST(total_tokens * 1000000 div g AS BIGINT)").alias(
                "share_ppm"
            ),
        )
    )


def shard_balance_sql(n_shards: int = 8) -> str:
    """DuckDB twin from the SAME shard count (param discipline); plain
    ordered row_number — value-identical to the 2-pass rank by the
    partition-boundary-invariance argument."""
    n = int(n_shards)
    return f"""
WITH w AS (
  SELECT doc_id,
         CAST(greatest(1, len(str_split(trim(regexp_replace(text, '\\s+', ' ', 'g')),
                                        ' '))) AS BIGINT) AS w_tokens
  FROM documents
), ranked AS (
  SELECT doc_id, w_tokens,
         row_number() OVER (ORDER BY w_tokens DESC, doc_id) AS r
  FROM w
), assigned AS (
  SELECT w_tokens,
         CAST(CASE WHEN ((r - 1) // {n}) % 2 = 0 THEN (r - 1) % {n}
                   ELSE {n - 1} - ((r - 1) % {n}) END AS INT) AS shard
  FROM ranked
), per AS (
  SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(w_tokens) AS BIGINT) AS total_tokens,
         CAST(max(w_tokens) AS BIGINT) AS max_doc_tokens
  FROM assigned GROUP BY 1
)
SELECT shard, n_docs, total_tokens, max_doc_tokens,
       CAST(total_tokens * 1000000 //
            (SELECT sum(total_tokens) FROM per) AS BIGINT) AS share_ppm
FROM per
"""


SHARD_BALANCE_SQL = shard_balance_sql()


def source_overlap_matrix(documents: DataFrame, k: int = 3) -> DataFrame:
    """Directed source-level shingle-containment matrix — the
    crawl-slice redundancy audit: for every ordered source pair,
    what fraction of source A's distinct k-word shingles also appear
    in source B. A row near 1.0 says slice A is (content-wise) already
    inside B — the number a curation team reads before paying to
    ingest, dedup, and tokenize a new crawl slice ("does this feed add
    anything?"), one level above the per-document dedup operators.

    The FULL ordered grid is emitted (zero-overlap pairs included, so
    the matrix is never vacuously sparse); self-pairs are excluded
    (trivially 1.0).

    Scale shape — and why this needs NO df cap unlike the document-
    grain joins: the join runs at the DISTINCT (source, shingle)
    grain, so a shingle's join fan-out is bounded by |sources|² no
    matter how many documents contain it — the stop-phrase that would
    put (0.01n)² pairs on one key at document grain contributes at
    most one row per source here. One distinct-reduction shuffle
    (map-side partial), one shingle-keyed self-join with per-key work
    ≤ |sources|², then |sources|²-row arithmetic.
    """
    from kinesis_dstream_spark.functions.textfns import word_shingles

    sh = documents.select(
        "source",
        F.explode(word_shingles(tokens(F.col("text")), k)).alias("shingle"),
    ).distinct()
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("source").alias("source_a"), "shingle")
    b = sh.select(F.col("source").alias("source_b"), "shingle")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("source_a") != F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    grid = (
        sizes.select(F.col("source").alias("source_a"), F.col("n_sh").alias("n_a"))
        .crossJoin(
            F.broadcast(
                sizes.select(
                    F.col("source").alias("source_b"),
                    F.col("n_sh").alias("n_b"),
                )
            )
        )
        .filter(F.col("source_a") != F.col("source_b"))
    )
    return (
        grid.join(F.broadcast(shared), ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            "n_a",
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            F.round(
                F.coalesce("n_shared", F.lit(0)) / F.col("n_a"), 6
            ).alias("containment"),
        )
    )


def source_overlap_sql(k: int = 3) -> str:
    """DuckDB twin generated from the SAME k (string shingles —
    count-identical to the hashed Spark side at the distinct grain)."""
    duck_toks = "str_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')"
    return f"""
WITH toks AS (
  SELECT source, {duck_toks} AS t FROM documents
), sh AS (
  SELECT DISTINCT source, shingle FROM (
    SELECT source,
           unnest(list_transform(range(1, greatest(len(t) - {k - 1}, 1) + 1),
                                 i -> array_to_string(t[i:i+{k - 1}], ' ')))
             AS shingle
    FROM toks
  )
), sizes AS (
  SELECT source, count(*) AS n_sh FROM sh GROUP BY source
), shared AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source <> b.source
  GROUP BY 1, 2
)
SELECT ga.source AS source_a, gb.source AS source_b,
       ga.n_sh AS n_a,
       coalesce(s.n_shared, 0) AS n_shared,
       round(coalesce(s.n_shared, 0) / ga.n_sh, 6) AS containment
FROM sizes ga JOIN sizes gb ON ga.source <> gb.source
LEFT JOIN shared s ON s.source_a = ga.source AND s.source_b = gb.source
"""


SOURCE_OVERLAP_SQL = source_overlap_sql()


_PACK_CONTEXT_LENGTHS = [512, 1024, 2048]


def packing_efficiency_report(
    documents: DataFrame, lengths: list[int] | None = None
) -> DataFrame:
    """Padding-waste accounting per candidate context length — the
    closed-form study a training team runs BEFORE choosing a sequence
    length and packing strategy (``pack_sequences`` then implements the
    chosen one). Pad tokens are pure wasted compute; at trillion-token
    scale a 10% padding rate is a 10% GPU bill.

    Per context length L, from the document token-length distribution
    alone (all exact int64 closed forms, no packing simulation):

      n_docs / total_tokens       corpus facts (shared across L rows)
      seqs_one_doc                Σ ceil(len/L) — one document per
                                  sequence, padded to L (the naive
                                  fine-tuning layout)
      pad_one_doc                 Σ (L·ceil(len/L) − len), its waste
      pad_one_doc_ppm             waste ∕ capacity, ppm
      seqs_packed_lb              ceil(total/L) — the concat-packing
                                  LOWER BOUND (what greedy concat with
                                  document breaks approaches from
                                  above; cross-doc attention masking
                                  assumed)
      pack_gain_ppm               1 − packed_lb/one_doc sequence
                                  saving, ppm

    The spread between pad_one_doc_ppm rows is the decision surface:
    short-doc corpora waste catastrophically at large L without
    packing (every 50-token doc pays L−50 pads), which is exactly why
    pretraining packs.

    Plan: ONE map-side scan computes per-doc token counts; each L row
    is a conditional aggregate over the same scan (one pass total,
    |lengths| output rows). Nothing shuffles but the |lengths|-row agg.
    """
    if lengths is None:
        lengths = _PACK_CONTEXT_LENGTHS
    lens = documents.select(
        F.size(tokens(F.col("text"))).cast("long").alias("len")
    )
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("len").alias("total_tokens"),
    ]
    for L in lengths:
        ceil_div = F.expr(f"(len + {L} - 1) div {L}")
        aggs.append(F.sum(ceil_div).alias(f"seqs_{L}"))
        aggs.append(F.sum(ceil_div * L - F.col("len")).alias(f"pad_{L}"))
    one = lens.agg(*aggs)
    rows = []
    for L in lengths:
        packed_lb = F.expr(f"(total_tokens + {L} - 1) div {L}")
        rows.append(
            one.select(
                F.lit(L).alias("context_len"),
                "n_docs",
                "total_tokens",
                F.col(f"seqs_{L}").alias("seqs_one_doc"),
                F.col(f"pad_{L}").alias("pad_one_doc"),
                F.expr(
                    f"CAST(pad_{L} * 1000000 div (seqs_{L} * {L}) AS BIGINT)"
                ).alias("pad_one_doc_ppm"),
                packed_lb.cast("long").alias("seqs_packed_lb"),
                F.expr(
                    f"CAST((seqs_{L} - (total_tokens + {L} - 1) div {L})"
                    f" * 1000000 div seqs_{L} AS BIGINT)"
                ).alias("pack_gain_ppm"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def packing_efficiency_sql(lengths: list[int] | None = None) -> str:
    """DuckDB twin generated from the SAME length list."""
    if lengths is None:
        lengths = _PACK_CONTEXT_LENGTHS
    duck_toks = "str_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')"
    blocks = []
    for L in lengths:
        blocks.append(f"""
SELECT {L} AS context_len, n_docs, total_tokens,
       seqs_{L} AS seqs_one_doc, pad_{L} AS pad_one_doc,
       CAST(pad_{L} * 1000000 // (seqs_{L} * {L}) AS BIGINT)
         AS pad_one_doc_ppm,
       CAST((total_tokens + {L} - 1) // {L} AS BIGINT) AS seqs_packed_lb,
       CAST((seqs_{L} - (total_tokens + {L} - 1) // {L}) * 1000000
            // seqs_{L} AS BIGINT) AS pack_gain_ppm
FROM base""")
    sums = ",\n         ".join(
        f"CAST(sum((len + {L} - 1) // {L}) AS BIGINT) AS seqs_{L},\n"
        f"         CAST(sum(((len + {L} - 1) // {L}) * {L} - len) AS BIGINT)"
        f" AS pad_{L}"
        for L in lengths
    )
    return f"""
WITH lens AS (
  SELECT CAST(len({duck_toks}) AS BIGINT) AS len FROM documents
), base AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len) AS BIGINT) AS total_tokens,
         {sums}
  FROM lens
)
{chr(10).join("UNION ALL" + b if i else b for i, b in enumerate(blocks))}
"""


PACKING_EFFICIENCY_SQL = packing_efficiency_sql()


_DSIR_BUCKETS = 256


def dsir_importance_weights(
    documents: DataFrame, target_lang: str = "en", buckets: int = _DSIR_BUCKETS
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023, public) — scored over hashed unigram features: every raw
    (non-target) document gets the average log importance ratio
    ``mean_tokens[ln p_target(b(t)) − ln p_raw(b(t))]`` where b(t)
    hashes the token into ``buckets`` buckets and both distributions
    carry add-one smoothing. High scores mark raw documents that LOOK
    like the target distribution — the scalable stand-in for "find me
    more data like my curated set" that the big pretraining pipelines
    run ahead of quality classifiers (hashed features need no vocab
    and the two histograms fit in cache at any corpus size).

    Exhibit framing: the target here is the ``lang = target_lang``
    slice (the only labeled split the fixture carries); production
    swaps in any curated target set — the math never changes.

    Determinism: bucket ids are md5-based (engine-portable, the
    SimHash discipline); histogram counts and totals are exact int64;
    each bucket's ln is fixed-pointed to µ-units BEFORE the per-doc
    sum (order-independent int aggregation), one display division at
    the end.

    Plan: ONE exploded token stream → a ``buckets``-bounded histogram
    aggregate (map-side combined; the histogram pair is 2·B rows —
    broadcast class); scoring is a map-side broadcast join on bucket
    id plus the final doc_id re-aggregation. No corpus-grain joins,
    no vocabulary state.
    """
    toks = documents.select(
        "doc_id",
        "source",
        (F.col("lang") == target_lang).alias("is_t"),
        F.explode(tokens(F.col("text"))).alias("w"),
    )
    from kinesis_dstream_spark.functions.textfns import md5_bits32

    bucketed = toks.select(
        "doc_id", "source", "is_t", (md5_bits32(F.col("w")) % buckets).alias("b")
    )
    hist = bucketed.groupBy("b").agg(
        F.sum(F.col("is_t").cast("long")).alias("c_t"),
        F.sum((~F.col("is_t")).cast("long")).alias("c_r"),
    )
    totals = hist.agg(
        F.sum("c_t").alias("n_t"), F.sum("c_r").alias("n_r")
    )
    spark = documents.sparkSession
    grid = (
        spark.range(buckets)
        .select(F.col("id").alias("b"))
        .join(hist, "b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            (
                F.round(
                    F.log(
                        (F.coalesce(F.col("c_t"), F.lit(0)) + 1)
                        / (F.col("n_t") + F.lit(buckets))
                    )
                    * _LP_SCALE
                ).cast("long")
                - F.round(
                    F.log(
                        (F.coalesce(F.col("c_r"), F.lit(0)) + 1)
                        / (F.col("n_r") + F.lit(buckets))
                    )
                    * _LP_SCALE
                ).cast("long")
            ).alias("lr_fp"),
        )
    )
    return (
        bucketed.filter(~F.col("is_t"))
        .join(F.broadcast(grid), "b")
        .groupBy("doc_id", "source")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("lr_fp").alias("s"))
        .select(
            "doc_id",
            "source",
            "n_tokens",
            # the exact int64 µ-unit sum rides along so downstream
            # consumers (dsir_select_topk) can rank on exact integers
            # instead of the rounded display
            F.col("s").cast("long").alias("s_fp"),
            # the rational s/n_tokens/1e6 has denominator n_tokens·1e6,
            # so NO fixed display precision is boundary-safe (hit at
            # 4dp: 1050/1e6; hit again at 6dp: -384870/12 =
            # -0.0320725 exactly). Fix-point FIRST with the exact
            # integer division both engines share (Spark div ↔ DuckDB
            # //, truncate-toward-zero, verified on negatives), THEN
            # one /1e6 display division — the µ-unit value has ≤6
            # decimals, so the 6dp round is ~5e-7 from any boundary
            F.round(
                F.expr("s div n_tokens") / _LP_SCALE, 6
            ).alias("dsir_avg_logratio"),
        )
    )


def dsir_importance_weights_sql(
    target_lang: str = "en", buckets: int = _DSIR_BUCKETS
) -> str:
    """DuckDB twin generated from the SAME target/buckets."""
    duck_toks = "str_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')"
    s = _LP_SCALE
    return f"""
WITH toks AS (
  SELECT doc_id, source, lang = '{target_lang}' AS is_t, unnest({duck_toks}) AS w
  FROM documents
), bucketed AS (
  SELECT doc_id, source, is_t,
         CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) % {buckets} AS b
  FROM toks
), hist AS (
  SELECT b, sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS c_t,
         sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS c_r
  FROM bucketed GROUP BY b
), totals AS (
  SELECT CAST(sum(c_t) AS BIGINT) AS n_t, CAST(sum(c_r) AS BIGINT) AS n_r
  FROM hist
), grid AS (
  SELECT g.b,
         CAST(round(ln((coalesce(h.c_t, 0) + 1)
                       / CAST(t.n_t + {buckets} AS DOUBLE)) * {s}) AS BIGINT)
         - CAST(round(ln((coalesce(h.c_r, 0) + 1)
                         / CAST(t.n_r + {buckets} AS DOUBLE)) * {s}) AS BIGINT)
           AS lr_fp
  FROM (SELECT unnest(generate_series(0, {buckets - 1})) AS b) g
  LEFT JOIN hist h ON h.b = g.b
  CROSS JOIN totals t
)
SELECT bk.doc_id, bk.source, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(gr.lr_fp) AS BIGINT) AS s_fp,
       round((CAST(sum(gr.lr_fp) AS BIGINT) // count(*)) / {s}.0, 6)
         AS dsir_avg_logratio
FROM bucketed bk JOIN grid gr ON gr.b = bk.b
WHERE NOT bk.is_t
GROUP BY bk.doc_id, bk.source
"""


DSIR_IMPORTANCE_WEIGHTS_SQL = dsir_importance_weights_sql()


def dsir_select_topk(
    documents: DataFrame,
    target_lang: str = "en",
    buckets: int = _DSIR_BUCKETS,
    top_n: int = 100,
) -> DataFrame:
    """The ACTIONABLE half of ``dsir_importance_weights``: the ranked
    top-``top_n`` selection manifest — the document set a curation run
    would actually pull from the raw pool into the next training mix.
    DSIR proper samples proportionally to exp(weight); the
    deterministic engine exhibit takes the top of the ranking (the
    greedy limit of that sampler), which is also what teams ship when
    they want reproducible pulls. Ordering is total and
    engine-portable, and ranks on EXACT integers, not the rounded
    display (ADVICE r11): the key is the unrounded quotient
    s_fp/n_tokens — ONE correctly-rounded IEEE division of two exact
    int64s, bit-identical in both engines — with doc_id as the total
    tie-break; a 6dp display re-round can never flip membership. The
    global cut is a TakeOrderedAndProject (per-partition local top-n,
    never a global sort).
    """
    scored = dsir_importance_weights(documents, target_lang, buckets)
    key = F.col("s_fp") / F.col("n_tokens")
    picked = scored.orderBy(key.desc(), F.col("doc_id").asc()).limit(top_n)
    w = Window.orderBy(key.desc(), F.col("doc_id").asc())
    return picked.withColumn(
        "selection_rank", F.row_number().over(w).cast("long")
    )


def dsir_select_topk_sql(
    target_lang: str = "en", buckets: int = _DSIR_BUCKETS, top_n: int = 100
) -> str:
    """Twin: the DSIR score chain + the same total-order cut."""
    inner = dsir_importance_weights_sql(target_lang, buckets).strip()
    return f"""
SELECT doc_id, source, n_tokens, s_fp, dsir_avg_logratio,
       CAST(row_number() OVER (
              ORDER BY CAST(s_fp AS DOUBLE) / n_tokens DESC, doc_id ASC)
            AS BIGINT) AS selection_rank
FROM ({inner}) scored
ORDER BY CAST(s_fp AS DOUBLE) / n_tokens DESC, doc_id ASC
LIMIT {top_n}
"""


DSIR_SELECT_TOPK_SQL = dsir_select_topk_sql()
