"""Text-analysis operators (SURVEY §2B E-12) over ``documents``.

Language-ID, quality scoring, token counting, fingerprinting, tf-idf —
the per-document stages of a training-data pipeline. Everything is
JVM-side column expressions (one narrow pass per doc) except where a
shuffle is semantically required (document frequency in tf-idf). At
100 TB these are the cheap operators: embarrassingly parallel scans whose
cost is bounded by parquet read throughput.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kinesis_dstream_spark.functions.exact import exact_sum
from kinesis_dstream_spark.functions.textfns import rolling_fingerprint, tokens
from kinesis_dstream_spark.operators.selection import grid_rank_select

# Tiny per-language marker-word sets for the n-gram/stopword heuristic.
# Deliberately simple + engine-portable: the oracle replicates the exact
# same sets, so the *operator semantics* (argmax over marker hits with a
# fixed tie order) are what is verified.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is", "to", "in"),
    "es": ("el", "la", "de", "que", "y", "en", "un"),
    "fr": ("le", "la", "de", "et", "un", "une", "est"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu"),
    "zh": ("的", "是", "了", "在", "我", "有", "和"),
}
LANG_ORDER = ("en", "es", "fr", "de", "zh")


def lang_id(documents: DataFrame) -> DataFrame:
    """Marker-word language ID: argmax of per-language hit counts.

    ``size(filter(tokens, t in markers))`` per language — five narrow
    array passes, no shuffle. Ties (incl. zero hits everywhere) resolve
    to 'unknown' / fixed LANG_ORDER priority, making output deterministic
    and oracle-checkable.
    """

    def hit_counter(markers: tuple[str, ...]):
        arr = F.array(*[F.lit(m) for m in markers])
        return lambda toks: F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    toks = tokens(F.lower(F.col("text")))
    df = documents.select("doc_id", "lang", *[
        hit_counter(LANG_MARKERS[lang])(toks).alias(f"hits_{lang}") for lang in LANG_ORDER
    ])
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in LANG_ORDER])
    pred = F.when(best == 0, F.lit("unknown"))
    for lang in LANG_ORDER:  # first lang reaching the max wins (fixed tie order)
        pred = pred.when(F.col(f"hits_{lang}") == best, F.lit(lang))
    return df.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("pred_lang"),
        *[F.col(f"hits_{lang}") for lang in LANG_ORDER],
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Heuristic quality metrics + composite score per document.

    Length, mean word length, type-token ratio, stopword ratio — the
    standard cheap filters run before expensive pipeline stages. Pure
    map-side arithmetic.
    """
    toks = tokens(F.col("text"))
    en_stop = F.array(*[F.lit(m) for m in LANG_MARKERS["en"]])
    n_tok = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(en_stop, t)))
    mean_wlen = (F.length(F.col("text")) - (n_tok - 1)) / n_tok  # chars sans separators
    ttr = n_uniq / n_tok
    stop_ratio = stop_hits / n_tok
    score = (
        F.least(n_tok / F.lit(200.0), F.lit(1.0)) * 0.4
        + ttr * 0.4
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.2
    )
    return documents.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_uniq.alias("n_unique"),
        F.round(mean_wlen, 4).alias("mean_word_len"),
        F.round(ttr, 4).alias("type_token_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(score, 4).alias("quality"),
    )


def token_stats(documents: DataFrame) -> DataFrame:
    """Token counting per doc: whitespace tokens + a BPE-ish estimate.

    The BPE-ish count approximates subword tokenizers as
    ceil(n_chars / 4) bounded below by the word count — the standard
    budget heuristic for LLM corpus sizing. Aggregated per (lang, source)
    to show corpus-level budgeting: one small shuffle.
    """
    toks = tokens(F.col("text"))
    n_ws = F.size(toks)
    n_bpe = F.greatest(F.ceil(F.length("text") / 4.0), n_ws.cast("long"))
    per_doc = documents.select("lang", "source", n_ws.alias("n_ws"), n_bpe.alias("n_bpe"))
    return (
        per_doc.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_ws").alias("total_ws_tokens"),
            F.sum("n_bpe").alias("total_bpe_tokens"),
            F.round(F.avg("n_ws"), 4).alias("avg_ws_tokens"),
        )
    )


def doc_fingerprints(documents: DataFrame) -> DataFrame:
    """Per-document rolling-hash fingerprint (content identity).

    Polynomial fold over the character stream (see textfns) — an
    engine-portable stand-in for xxhash-style content ids; useful for
    dedup ledger joins where the id must be reproducible outside Spark.
    """
    return documents.select(
        "doc_id",
        rolling_fingerprint(F.col("text")).alias("fingerprint"),
        F.length("text").alias("n_chars_computed"),
    )


def tfidf_top_terms(documents: DataFrame, top_k: int = 3, max_doc_id: int = 100) -> DataFrame:
    """tf-idf: top-k highest-scoring terms per document.

    Term frequencies are per-doc (map-side after one explode); document
    frequency is the one true shuffle (term key). idf = ln((N+1)/(df+1)).
    Output restricted to doc_id < max_doc_id to keep result sets bounded.

    Only the df branch needs the full corpus (df is corpus-wide by
    definition); the tf branch filters to the output docs BEFORE its
    groupBy, so the tf shuffle carries max_doc_id docs' terms, not the
    corpus's — at the default max_doc_id=100 that is ~99% less tf-side
    shuffle while producing byte-identical results (oracle-pinned).
    (A derive-df-from-tf single-shuffle variant was measured and lost:
    Catalyst pushes the group-key filter below the tf aggregate, so the
    branches diverge and ReuseExchange never fires — the corpus-wide
    agg then runs for BOTH branches unless cached, and caching the full
    vocabulary is exactly what a 100 TB run must not do.)
    """
    toks = documents.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = (
        toks.filter(F.col("doc_id") < max_doc_id)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = toks.select("doc_id", "term").distinct().groupBy("term").agg(
        F.count("*").alias("df")
    )
    n_docs = documents.count()  # scalar; cheap count-star over parquet metadata
    scored = (
        tf.join(F.broadcast(df_), "term")
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log((n_docs + 1.0) / (F.col("df") + 1.0)), 6),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select("doc_id", "term", "tf", "df", "tfidf", "rk")
    )


def corpus_curation(
    documents: DataFrame,
    min_quality: float = 0.3,
    min_tokens: int = 5,
    val_pct: int = 10,
    test_pct: int = 10,
) -> DataFrame:
    """End-to-end curation pipeline: quality gate → exact dedup →
    deterministic split → per-(split, lang) token budget.

    The composition a pretraining data pipeline runs nightly, as ONE
    declarative plan so Catalyst sees every stage at once: (1) per-doc
    quality scoring (map-side, same formula as ``quality_score``), (2)
    drop docs under the quality/length floors BEFORE any shuffle — at
    100 TB the gate typically removes most of the corpus, so it must
    precede the dedup exchange, (3) exact dedup keeping the lowest
    doc_id per content hash (one shuffle keyed on sha2(text) — 32-byte
    keys, never full text), (4) content-stable split assignment
    (md5-bucket, the ``deterministic_split`` recipe), (5) per-(split,
    lang) doc counts and ws/BPE-ish token budgets with order-independent
    fixed-point sums.
    """
    from kinesis_dstream_spark.functions.exact import exact_avg

    toks = tokens(F.col("text"))
    n_tok = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    en_stop = F.array(*[F.lit(m) for m in LANG_MARKERS["en"]])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(en_stop, t)))
    quality = (
        F.least(n_tok / F.lit(200.0), F.lit(1.0)) * 0.4
        + (n_uniq / n_tok) * 0.4
        + F.least((stop_hits / n_tok) * 5, F.lit(1.0)) * 0.2
    )
    n_bpe = F.greatest(F.ceil(F.length("text") / 4.0), n_tok.cast("long"))
    scored = documents.select(
        "doc_id",
        "lang",
        "text",
        n_tok.alias("n_ws"),
        n_bpe.alias("n_bpe"),
        quality.alias("quality"),
    )
    kept = scored.filter(
        (F.col("quality") >= min_quality) & (F.col("n_ws") >= min_tokens)
    )
    dedup_w = Window.partitionBy(F.sha2(F.col("text"), 256)).orderBy("doc_id")
    uniq = kept.withColumn("rn", F.row_number().over(dedup_w)).filter(F.col("rn") == 1)
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
    return (
        uniq.select(split.alias("split"), "lang", "n_ws", "n_bpe", "quality")
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_ws").alias("total_ws_tokens"),
            F.sum("n_bpe").alias("total_bpe_tokens"),
            exact_avg(F.col("quality"), scale=10_000, dp=4).alias("avg_quality"),
        )
    )


# RE2-portable subword pattern (no lookarounds): a leading-space word, a
# leading-space number run, a leading-space punctuation run, or bare
# whitespace — the GPT-2 tokenizer's pre-tokenization shape minus its
# contraction lookaheads, so Spark (Java regex) and DuckDB (RE2) agree.
BPE_ISH_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_token_counts(documents: DataFrame) -> DataFrame:
    """Regex subword token counting (E-12): per-doc whitespace-word and
    BPE-ish pre-token counts plus their ratio.

    One narrow scan; ``regexp_extract_all`` runs JVM-side per row. The
    pattern is deliberately RE2-compatible so the count is reproducible
    in DuckDB/Go/Rust tooling outside Spark — corpus token budgets must
    not depend on one engine's regex dialect.
    """
    n_ws = F.size(tokens(F.col("text")))
    n_bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH_PATTERN), 0))
    return documents.select(
        "doc_id",
        "lang",
        n_ws.alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        F.round(n_bpe / n_ws, 6).alias("bpe_per_word"),
    )


DEFAULT_BM25_QUERY = ("data", "system", "model")


def bm25_search(
    documents: DataFrame,
    query_terms: tuple[str, ...] = DEFAULT_BM25_QUERY,
    top_k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 document ranking for a fixed query-term set — the retrieval
    primitive a training pipeline uses for targeted corpus slicing
    ("find documents about X") and contamination triage.

    Scale shape: the query-term set is tiny by definition, so the
    term-match filter is an ``isin`` pushed into the token explode (no
    join, no shuffle of the corpus on term keys); per-(doc, term) tf is
    one aggregation; df and avgdl are two small corpus aggregates (df
    only over the query terms — |terms| rows). Scoring is pure column
    math; the final cut is a distributed top-k (TakeOrderedAndProject).
    idf uses the standard Robertson form ln(1 + (N-df+0.5)/(df+0.5)).
    """
    toks = tokens(F.lower(F.col("text")))
    n_docs = documents.count()
    avgdl_row = documents.agg(F.avg(F.size(toks)).alias("a")).collect()[0]
    avgdl = float(avgdl_row["a"])

    terms = [t.lower() for t in query_terms]
    per_doc = documents.select(
        "doc_id", F.size(toks).alias("dl"), F.explode(toks).alias("term")
    ).filter(F.col("term").isin(terms))
    tf = per_doc.groupBy("doc_id", "dl", "term").agg(F.count("*").alias("tf"))
    return bm25_rank(tf, n_docs, avgdl, top_k, k1, b)


def bm25_rank(
    tf: DataFrame,
    n_docs: int,
    avgdl: float,
    top_k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """The BM25 scoring tail shared by the corpus-scan path above and
    the inverted-index serve (``lexindex.bm25_from_store``): one
    expression tree, so the two paths cannot drift and both keep the
    same DuckDB oracle. ``tf`` carries (doc_id, dl, term, tf) — only
    the query's terms."""
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl)),
        )
        .groupBy("doc_id")
        .agg(
            # fixed-point per-term weights before the sum: the 3-term sum
            # is order-independent, so the DuckDB oracle reproduces the
            # exact doubles and the top-k cut (the exact.py convention)
            exact_sum(F.col("w"), scale=1_000_000, dp=4).alias("bm25"),
            F.count("*").alias("n_terms_hit"),
        )
    )
    return scored.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()).limit(top_k)


def corpus_length_stats(documents: DataFrame) -> DataFrame:
    """Token-length distribution telemetry per language: exact p50/p90/
    p99 plus mean — the dashboard numbers a pipeline watches to catch
    crawl drift (a p99 collapse means truncation upstream; a p50 spike
    means boilerplate flooding in).

    Exact ``percentile`` (not approx_percentile) so the oracle matches
    bit-for-bit; at 100 TB swap in ``approx_percentile`` (t-digest, one
    pass, mergeable) — the aggregation shape is identical, and the
    driver-visible contract (one row per lang) doesn't change.
    """
    n_tok = F.size(tokens(F.col("text")))
    per_doc = documents.select("lang", n_tok.cast("double").alias("n"))
    return per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n"), 4).alias("mean_tokens"),
        F.round(F.expr("percentile(n, 0.5)"), 4).alias("p50_tokens"),
        F.round(F.expr("percentile(n, 0.9)"), 4).alias("p90_tokens"),
        F.round(F.expr("percentile(n, 0.99)"), 4).alias("p99_tokens"),
    )


# RE2-portable PII patterns (no lookarounds/backrefs): conservative
# email / phone-ish / IPv4 shapes. Production pipelines tune these per
# jurisdiction; the operator contract is the redaction pass itself.
# NOTE (r11): dataquality.PII_AUDIT_PATTERNS is the ANCHORED sibling
# set for the per-source compliance audit — see the rationale there
# for why the two ops keep distinct shapes (recall-leaning scrub vs
# assertable audit findings).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\-\s]{7,}[0-9]",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
}


def pii_scrub_stats(documents: DataFrame) -> DataFrame:
    """PII redaction pass: replace email/phone/IPv4 shapes with typed
    placeholder tokens and report per-language hit counts — the
    compliance stage every crawl corpus runs before training.

    Shuffle shape: per-doc JVM ``regexp_replace``/``regexp_count``
    chains + one small groupBy(lang) — parquet-throughput bound, no
    Python in the hot path. Patterns are RE2-portable so the oracle
    reproduces both the counts and the redacted lengths exactly.
    """
    counts = {
        name: F.regexp_count(F.col("text"), F.lit(pat))
        for name, pat in PII_PATTERNS.items()
    }
    scrubbed = F.col("text")
    for name, pat in PII_PATTERNS.items():
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name}>")
    per_doc = documents.select(
        "lang",
        counts["email"].alias("n_email"),
        counts["phone"].alias("n_phone"),
        counts["ipv4"].alias("n_ipv4"),
        F.length(scrubbed).alias("len_scrubbed"),
    )
    return per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_email").alias("total_email"),
        F.sum("n_phone").alias("total_phone"),
        F.sum("n_ipv4").alias("total_ipv4"),
        F.sum(
            (F.col("n_email") + F.col("n_phone") + F.col("n_ipv4") > 0).cast("int")
        ).alias("n_docs_with_pii"),
        F.sum("len_scrubbed").alias("total_chars_scrubbed"),
    )


def normalize_text_stats(documents: DataFrame) -> DataFrame:
    """Text-normalization stage stats: lowercase, strip non-letter/digit
    runs (unicode property classes, so CJK/accents survive), collapse
    whitespace — the canonicalization pass that runs before hashing,
    shingling, or tokenizing a crawl.

    Shuffle shape: per-doc JVM column expressions + one small
    groupBy(lang) aggregate — cost is parquet read throughput. The
    regexes are deliberately RE2-portable (``\\p{L}``/``\\p{N}``, no
    lookarounds) so DuckDB reproduces every byte of the normalized
    output (oracle-checked).
    """
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^\p{L}\p{N}\s]+", " "),
            r"\s+",
            " ",
        )
    )
    per_doc = documents.select(
        "lang",
        F.length("text").alias("len_raw"),
        F.length(norm).alias("len_norm"),
        (norm != F.col("text")).cast("int").alias("changed"),
    )
    return per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("changed").alias("n_changed"),
        F.sum("len_raw").alias("total_chars_raw"),
        F.sum("len_norm").alias("total_chars_norm"),
        F.round(F.sum("len_norm") / F.sum("len_raw"), 4).alias("keep_ratio"),
    )


def deterministic_split(documents: DataFrame, val_pct: int = 10, test_pct: int = 10) -> DataFrame:
    """Reproducible train/val/test assignment by content-stable hash.

    Training pipelines must NOT use ``df.sample`` for splits — Bernoulli
    sampling depends on partitioning and reshuffles between runs. The
    stable recipe: bucket = md5(doc_id) mod 100, split by bucket range.
    Deterministic across engines, runs, and cluster sizes; adding data
    never moves an existing document between splits.
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
    return (
        documents.select("doc_id", "lang", split.alias("split"))
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"))
    )


def hashed_embeddings(
    documents: DataFrame,
    dim: int = 64,
    id_cols: tuple[str, ...] = ("doc_id",),
    text_col: str = "text",
) -> DataFrame:
    """Text → dense vector via the feature-hashing trick (E-12→E-11
    bridge): each token hashes to a coordinate ``md5_32(tok) mod dim``
    with a ±1 sign from an independent md5 nibble; a document's
    embedding is the signed count vector — the classic cheap, training-
    free text embedder (Weinberger et al.'s hashing trick), good enough
    to feed every ANN/dedup operator in ``operators/similarity.py``.

    Returns (doc_id, embedding array<double>), UNnormalized — compose
    with ``functions.vectors.l2_normalize`` for cosine work (the ANN
    operators normalize internally anyway).

    Scale shape: explode → one (doc_id, idx) hash-aggregate (map-side
    partials; the keyspace is |docs|·dim) → per-doc dense assembly with
    ``map_from_entries`` + a ``sequence`` transform, all JVM-side — one
    shuffle total, no UDF, no vocabulary state (that statelessness is
    the point of hashing: the embedder is a pure function, so streaming
    ingest and historical backfill produce identical vectors).

    Determinism/portability: md5-derived hashes (textfns.md5_bits32
    pattern) — bit-identical in DuckDB, which is what lets
    ``hashed_embedding_stats`` be driver-oracle-checked.
    """
    from kinesis_dstream_spark.functions.textfns import md5_bits32

    ids = list(id_cols)
    toks = documents.select(
        *ids, F.explode(tokens(F.col(text_col))).alias("tok")
    ).filter(F.col("tok") != "")
    entries = toks.select(
        *ids,
        F.pmod(md5_bits32(F.col("tok")), F.lit(dim)).alias("idx"),
        # sign nibble: 9th md5 hex char, independent of the index bits
        F.when(
            F.conv(F.substring(F.md5(F.col("tok")), 9, 1), 16, 10).cast("long") % 2
            == 0,
            F.lit(1.0),
        )
        .otherwise(F.lit(-1.0))
        .alias("v"),
    )
    sparse = (
        entries.groupBy(*ids, "idx")
        .agg(F.sum("v").alias("val"))
        .groupBy(*ids)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("idx"), F.col("val")))
            ).alias("m")
        )
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at(F.col("m"), i.cast("int")), F.lit(0.0)),
    )
    return sparse.select(*ids, dense.alias("embedding"))


def hashed_embedding_stats(documents: DataFrame, dim: int = 64) -> DataFrame:
    """Checkable projection of ``hashed_embeddings``: per-doc nnz, l2
    norm, and a position-weighted checksum computed FROM the assembled
    dense array (posexplode), so the oracle certifies coordinate
    placement, not just the sparse aggregate. All arithmetic is ±1 sums
    and integer weights — exact in float64, no accumulation-order hazard.
    """
    emb = hashed_embeddings(documents, dim)
    coords = emb.select("doc_id", F.posexplode("embedding").alias("i", "x"))
    return coords.groupBy("doc_id").agg(
        F.count(F.when(F.col("x") != 0.0, 1)).alias("nnz"),
        F.round(F.sqrt(F.sum(F.col("x") * F.col("x"))), 4).alias("l2_norm"),
        F.round(F.sum(F.col("x") * (F.col("i") + 1)), 4).alias("checksum"),
    )


def text_semantic_topk(
    documents: DataFrame, n_queries: int = 10, k: int = 5, dim: int = 64
) -> DataFrame:
    """End-to-end semantic retrieval over raw text in ONE query:
    hashed embeddings (``hashed_embeddings``) → exact cosine top-k —
    the lexical counterpart of ``bm25_search`` and the composition the
    E-12 → E-11 bridge exists for. Queries = doc_id < n_queries; returns
    (q_id, c_id, cos_sim, rk).

    Fully DuckDB-oracle-backed despite being a vector search: hashed
    embedding coordinates are small integers, so every dot product is
    EXACT in float64 regardless of accumulation order, and cosine is
    computed as exact_dot / (norm_a · norm_b) — the identical operand
    tree the oracle's sparse-coordinate SQL builds, hence bit-identical
    doubles (contrast with pre-normalized dots, where operand order
    diverges engines at the last ulp).

    Scale shape: the bounded query side broadcasts (ann_bruteforce
    pattern); corpus scanned once; per-query top-k via window over
    |queries|·|corpus| scored pairs — for big corpora swap the tail for
    the IVF/PQ family, which consumes the same hashed vectors.
    Zero-norm documents (all coordinates cancelled) are excluded from
    both sides, mirroring the oracle's HAVING guard.
    """
    emb = hashed_embeddings(documents, dim)
    with_norm = emb.select(
        "doc_id",
        "embedding",
        F.sqrt(
            F.aggregate(
                F.col("embedding"), F.lit(0.0), lambda a, x: a + x * x
            )
        ).alias("nrm"),
    ).filter(F.col("nrm") > 0)
    q = with_norm.filter(F.col("doc_id") < n_queries).select(
        F.col("doc_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    c = with_norm.select(
        F.col("doc_id").alias("c_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("q_emb"), F.col("c_emb"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = c.join(F.broadcast(q), F.col("q_id") != F.col("c_id")).select(
        "q_id",
        "c_id",
        F.round(dot / (F.col("q_nrm") * F.col("c_nrm")), 4).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "c_id", "cos_sim", "rk")
    )


def hybrid_search_rrf(
    documents: DataFrame,
    query_terms: tuple[str, ...] = DEFAULT_BM25_QUERY,
    top_n: int = 50,
    k: int = 20,
    rrf_k: int = 60,
    dim: int = 64,
) -> DataFrame:
    """Hybrid retrieval: BM25 (lexical) + hashed-embedding cosine
    (semantic) fused by Reciprocal Rank Fusion —
    ``score(d) = Σ_r 1/(rrf_k + rank_r(d))`` (Cormack et al., SIGIR'09),
    the standard modern corpus-slicing retriever (lexical catches exact
    terminology, semantic catches paraphrase; RRF needs no score
    calibration between the two).

    Both rankers cut to their top_n BEFORE fusion (the production shape:
    fusion is over shortlists, so the full-corpus work is exactly one
    BM25 pass + one embedding scan), then a full outer join on doc_id
    fuses ranks; documents missing from a ranker contribute 0 from it.
    The query's own embedding comes from the SAME ``hashed_embeddings``
    operator applied to the query string — one tiny driver-side job, no
    second implementation to drift.

    Exactness: ranks are integers, RRF terms are 1/(rrf_k+rank) doubles
    summed in a fixed (lex, sem) order — bit-identical in DuckDB, so
    the whole hybrid pipeline is oracle-backed.
    """
    import math

    spark = documents.sparkSession
    qtext = " ".join(t.lower() for t in query_terms)
    qrow = hashed_embeddings(
        spark.createDataFrame([(0, qtext)], "doc_id long, text string"), dim
    ).first()
    qvec = [float(x) for x in qrow["embedding"]]
    qn = math.sqrt(sum(x * x for x in qvec))

    w_lex = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    lex = bm25_search(documents, query_terms, top_n).select(
        "doc_id", F.row_number().over(w_lex).alias("rank_lex")
    )

    emb = hashed_embeddings(documents, dim)
    qcol = F.array(*[F.lit(x) for x in qvec])
    dot = F.aggregate(
        F.zip_with(F.col("embedding"), qcol, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = F.sqrt(
        F.aggregate(F.col("embedding"), F.lit(0.0), lambda a, x: a + x * x)
    )
    sem_scored = (
        emb.select("doc_id", nrm.alias("nrm"), dot.alias("dp"))
        # guard BEFORE dividing: a zero vector (every coordinate
        # cancelled) would give 0/0 = NaN, which sorts unpredictably;
        # the oracle mirrors this with HAVING sum(val*val) > 0
        .filter(F.col("nrm") > 0)
        .select("doc_id", (F.col("dp") / (F.col("nrm") * F.lit(qn))).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col("doc_id").asc())
        .limit(top_n)
    )
    w_sem = Window.orderBy(F.col("cos").desc(), F.col("doc_id").asc())
    sem = sem_scored.select("doc_id", F.row_number().over(w_sem).alias("rank_sem"))

    # Fusion WITHOUT a join: each shortlist contributes (doc_id, term,
    # which-rank) rows; one tiny hash aggregate sums the RRF terms. A
    # full-outer join of the two shortlists would plan as SortMergeJoin
    # (the static planner can't see through the limits); union+agg is
    # join-free at any shortlist size. A doc appears in ≤2 rows, and
    # two-term double addition is commutative, so the aggregated sum is
    # bit-identical to the oracle's fixed-order lex+sem expression.
    contrib = lex.select(
        "doc_id",
        (1.0 / (F.lit(rrf_k) + F.col("rank_lex"))).alias("term"),
        F.col("rank_lex").alias("rank_lex"),
        F.lit(None).cast("int").alias("rank_sem"),
    ).unionByName(
        sem.select(
            "doc_id",
            (1.0 / (F.lit(rrf_k) + F.col("rank_sem"))).alias("term"),
            F.lit(None).cast("int").alias("rank_lex"),
            F.col("rank_sem").alias("rank_sem"),
        )
    )
    fused = contrib.groupBy("doc_id").agg(
        F.max("rank_lex").alias("rank_lex"),
        F.max("rank_sem").alias("rank_sem"),
        F.round(F.sum("term"), 6).alias("rrf_score"),
    )
    return fused.select(
        "doc_id", "rank_lex", "rank_sem", "rrf_score"
    ).orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc()).limit(k)


def chunk_documents(
    documents: DataFrame, chunk_tokens: int = 64, overlap: int = 16
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the stage
    between raw documents and context-window-bounded training /
    retrieval indexing (``pack_sequences`` consumes bounded pieces;
    chunking is where long documents become them).

    Windows start every ``stride = chunk_tokens - overlap`` tokens, so
    consecutive chunks share ``overlap`` tokens (retrieval-friendly:
    no answer span is ever split without a copy). The start sequence
    ``1, 1+stride, ...`` runs to ``max(n - overlap, 1)``, which provably
    covers the last token. Output: (doc_id, chunk_no, start_tok,
    n_tokens, chunk_sha, chunk_text); chunk_no is pure arithmetic from
    the start offset (no window function), chunk_sha is the
    content-address for downstream chunk-level dedup.

    Scale shape: one narrow pass — tokenize, per-row ``sequence`` of
    starts, ONE explode, per-chunk ``slice``; no shuffle at all (the
    chunk fan-out is row-local). Everything is integer/string exact →
    full DuckDB oracle.
    """
    stride = chunk_tokens - overlap
    assert stride > 0, "overlap must be smaller than chunk_tokens"
    toks = tokens(F.col("text"))
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(toks) - overlap, F.lit(1)), F.lit(stride)
    )
    exploded = documents.select(
        "doc_id", toks.alias("toks"), F.explode(starts).alias("start_tok")
    )
    chunk = F.slice(F.col("toks"), F.col("start_tok"), chunk_tokens)
    chunk_text = F.concat_ws(" ", chunk)
    return exploded.select(
        "doc_id",
        ((F.col("start_tok") - 1) / stride).cast("int").alias("chunk_no"),
        "start_tok",
        F.size(chunk).alias("n_tokens"),
        F.sha2(chunk_text, 256).alias("chunk_sha"),
        chunk_text.alias("chunk_text"),
    )


def chunk_dedup_stats(
    documents: DataFrame, chunk_tokens: int = 64, overlap: int = 16, min_docs: int = 2
) -> DataFrame:
    """Cross-document duplicated chunks: content-addressed chunk groups
    appearing in ≥ min_docs distinct documents — span-granular
    copy-paste detection (complements ``dedup_substring``'s 8-gram
    spans with retrieval-sized 64-token units, and is exactly the
    "dedup the chunk store" step a RAG/training-chunk pipeline runs).

    One shuffle keyed on the 32-byte sha (uniform — no skew possible
    beyond true duplicates); representative = min (doc_id, chunk_no)
    for determinism. Fully oracle-backed via the chunking oracle + a
    regular aggregate.
    """
    chunks = chunk_documents(documents, chunk_tokens, overlap)
    return (
        chunks.groupBy("chunk_sha")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_copies"),
            F.min(F.struct("doc_id", "chunk_no")).alias("rep"),
            F.max("n_tokens").alias("n_tokens"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .select(
            "chunk_sha",
            "n_docs",
            "n_copies",
            F.col("rep.doc_id").alias("rep_doc_id"),
            F.col("rep.chunk_no").alias("rep_chunk_no"),
            "n_tokens",
        )
    )


def chunk_semantic_topk(
    documents: DataFrame,
    query_terms: tuple[str, ...] = DEFAULT_BM25_QUERY,
    k: int = 20,
    chunk_tokens: int = 64,
    overlap: int = 16,
    dim: int = 64,
) -> DataFrame:
    """Chunk-granular semantic retrieval — the RAG serving shape: the
    query embedding scores every CHUNK (not whole documents), so a long
    document with one relevant passage ranks by that passage. Composes
    ``chunk_documents`` + the generalized ``hashed_embeddings`` (keyed
    on (doc_id, chunk_no)) + the closure-side query vector from
    ``hashed_embeddings`` on the query string itself.

    Returns (doc_id, chunk_no, cos_sim, rk) for the global top-k chunks
    (ties by doc_id, chunk_no). Exact integer dots → fully oracle-backed
    like ``text_semantic_topk``; one explode + one hash-aggregate + a
    TakeOrdered cut, no join against the corpus anywhere.
    """
    import math

    spark = documents.sparkSession
    qtext = " ".join(t.lower() for t in query_terms)
    qrow = hashed_embeddings(
        spark.createDataFrame([(0, qtext)], "doc_id long, text string"), dim
    ).first()
    qvec = [float(x) for x in qrow["embedding"]]
    qn = math.sqrt(sum(x * x for x in qvec))

    chunks = chunk_documents(documents, chunk_tokens, overlap).select(
        "doc_id", "chunk_no", "chunk_text"
    )
    emb = hashed_embeddings(
        chunks, dim, id_cols=("doc_id", "chunk_no"), text_col="chunk_text"
    )
    qcol = F.array(*[F.lit(x) for x in qvec])
    dot = F.aggregate(
        F.zip_with(F.col("embedding"), qcol, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = F.sqrt(F.aggregate(F.col("embedding"), F.lit(0.0), lambda a, x: a + x * x))
    scored = (
        emb.select("doc_id", "chunk_no", nrm.alias("nrm"), dot.alias("dp"))
        .filter(F.col("nrm") > 0)
        .select(
            "doc_id",
            "chunk_no",
            F.round(F.col("dp") / (F.col("nrm") * F.lit(qn)), 4).alias("cos_sim"),
        )
    )
    top = scored.orderBy(
        F.col("cos_sim").desc(), F.col("doc_id").asc(), F.col("chunk_no").asc()
    ).limit(k)
    w = Window.orderBy(
        F.col("cos_sim").desc(), F.col("doc_id").asc(), F.col("chunk_no").asc()
    )
    return top.select("doc_id", "chunk_no", "cos_sim", F.row_number().over(w).alias("rk"))


_LI_DIM = 32  # trigram hash buckets for per-token vectors


def _char_trigram_vectors(vocab: DataFrame, dim: int = _LI_DIM) -> DataFrame:
    """(token, idx, val): signed hashed char-trigram counts per token —
    the per-TOKEN embedding for late-interaction scoring. Tokens
    shorter than 3 chars contribute themselves as one gram. md5-based
    hash + sign (the ``hashed_embeddings`` convention) so the DuckDB
    twin is bit-identical."""
    from kinesis_dstream_spark.functions.textfns import md5_bits32

    t = F.col("token")
    n = F.length(t)
    grams = F.when(n < 3, F.array(t)).otherwise(
        F.transform(F.sequence(F.lit(1), n - 2), lambda i: F.substr(t, i, F.lit(3)))
    )
    sign = F.when(
        F.conv(F.substring(F.md5(F.col("g")), 9, 1), 16, 10).cast("long") % 2 == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    return (
        vocab.select("token", F.explode(grams).alias("g"))
        .select(
            "token",
            F.pmod(md5_bits32(F.col("g")), F.lit(dim)).alias("idx"),
            sign.cast("long").alias("s"),
        )
        .groupBy("token", "idx")
        .agg(F.sum("s").alias("val"))
    )


def late_interaction_topk(
    documents: DataFrame, n_queries: int = 5, k: int = 3, dim: int = _LI_DIM
) -> DataFrame:
    """ColBERT-style late-interaction retrieval (MaxSim):
    score(Q, D) = Σ_{q∈toks(Q)} max(0, max_{d∈toks(D)} cos(v_q, v_d))
    over per-TOKEN signed hashed char-trigram vectors — token-level
    matching that survives typos and inflections (shared trigrams
    score high), where a single pooled document vector would blur
    every token together. The modern retrieval family's third member
    beside BM25 (term-weighted) and the pooled-embedding semantic
    top-k. Per-token COSINE (not raw dot) is what ColBERT normalizes
    for, and matters: with raw dots a fat-vocabulary document
    out-scores an exact copy of the query (Cauchy-Schwarz lets a
    larger-norm token dot higher than self-similarity); under cosine,
    self-match is the per-token maximum (pytest-pinned).

    Exactness: vectors are integer counts; each pair similarity is
    ``round(1e6·dot/√(|q|²·|d|²))`` — one deterministic double from an
    identical operand tree on both engines, then LONG fixed-point, so
    max/Σ run on integers (no float accumulation order anywhere). The
    rounding can never land on a .5 tie: a tie needs the residue of
    1e6·dot mod s (s = √ of the norm product ≤ 100) to equal s/2, and
    residues inherit 2-adic valuation ≥ v₂(s) from 1e6 while s/2 has
    exactly v₂(s)−1 — impossible. Hence bit-identical ranks.

    Scale shape: pair scoring is computed once per DISTINCT
    (query-token, corpus-token) pair sharing a hash bucket (the
    record-linkage distinct-pair trick); the query-side vocabulary is
    control-plane sized and broadcasts, so the corpus pays one
    vocabulary aggregation + one bucket-keyed broadcast join +
    two grouped aggs (per-(doc, q_tok) max, per-(q, doc) sum) — no
    all-pairs token matrix ever materializes, and document text is
    touched exactly once to extract its distinct tokens.
    """
    toks_all = documents.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("tok")
    ).filter(F.col("tok") != "")
    q_toks = toks_all.filter(F.col("doc_id") < n_queries).select(
        F.col("doc_id").alias("q_id"), F.col("tok").alias("q_tok")
    )
    d_toks = toks_all.filter(F.col("doc_id") >= n_queries).select(
        "doc_id", F.col("tok").alias("d_tok")
    )
    qv = _char_trigram_vectors(
        q_toks.select(F.col("q_tok").alias("token")).distinct(), dim
    )
    dv = _char_trigram_vectors(
        d_toks.select(F.col("d_tok").alias("token")).distinct(), dim
    )
    norm2 = lambda v: v.groupBy("token").agg(  # noqa: E731
        F.sum(F.col("val") * F.col("val")).alias("n2")
    )
    qn, dn = norm2(qv), norm2(dv)
    dots = (
        dv.alias("d")
        .join(F.broadcast(qv.alias("q")), F.col("d.idx") == F.col("q.idx"))
        .groupBy(
            F.col("q.token").alias("q_tok"), F.col("d.token").alias("d_tok")
        )
        .agg(F.sum(F.col("d.val") * F.col("q.val")).alias("dot"))
        .filter(F.col("dot") > 0)
    )
    scores = (
        dots.join(F.broadcast(qn.select(F.col("token").alias("q_tok"), F.col("n2").alias("qn2"))), "q_tok")
        .join(dn.select(F.col("token").alias("d_tok"), F.col("n2").alias("dn2")), "d_tok")
        .select(
            "q_tok",
            "d_tok",
            F.round(
                F.lit(1000000.0)
                * F.col("dot")
                / F.sqrt((F.col("qn2") * F.col("dn2")).cast("double"))
            )
            .cast("long")
            .alias("s"),
        )
        .filter(F.col("s") > 0)
    )
    per_tok_doc = (
        d_toks.join(scores, "d_tok")
        .groupBy("doc_id", "q_tok")
        .agg(F.max("s").alias("m"))
    )
    maxsim = (
        per_tok_doc.join(q_toks.distinct(), "q_tok")
        .groupBy("q_id", "doc_id")
        .agg(F.round(F.sum("m") / 1000000.0, 6).alias("maxsim"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.col("maxsim").desc(), F.col("doc_id").asc())
    return (
        maxsim.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
        .select("q_id", "doc_id", "maxsim", "rk")
    )


def adaptive_quality_gate(documents: DataFrame, drop_pct: int = 20) -> DataFrame:
    """Per-language adaptive quality filtering — the curation gate a
    multilingual corpus actually needs: a single global threshold
    calibrated on the majority language silently deletes low-resource
    languages whose score DISTRIBUTION sits lower, so the cut must be
    a per-language order statistic ("drop each language's bottom 20%"),
    not a constant.

    The quality key is integer fixed-point end to end (1e4 grid,
    floor-division components — length saturation, type-token ratio,
    stopword saturation, the same signals as ``quality_score``), so
    the per-language rank selection is tie-deterministic (iq, doc_id)
    and the DuckDB twin reproduces the cut bit-for-bit; only display
    columns divide.

    Scale (the r6 "weak" fix, selection.py): the per-language cut
    value comes from exact histogram-refinement selection — a
    (lang, iq DIV 256) count aggregate whose exchange spreads a hot
    language across the cluster by value (iq is bounded in [0, 30000]
    by construction, so the bucket table is ≤ 118 rows per language
    REGARDLESS of corpus size), a bucket-table window, and a
    one-bucket refine. The prescribed shard-local bottom-k(n·p) merge
    degenerates here: with p = 20% and S = 8, each shard's exactness
    floor is min(n·p, n/S) = its entire content, so the "merge" would
    sort every row in one partition per language (see selection.py).
    The rollup is then value-based — sums/counts against the broadcast
    cut value t, with the c − count(iq < t) threshold-tie rows
    contributing exactly (c − cnt_lt)·t because ties share the value —
    so no per-row rank exists anywhere and the DuckDB oracle (which
    ranks explicitly) still matches bit-for-bit.
    """
    toks = tokens(F.col("text"))
    n_tok = F.greatest(F.size(toks), F.lit(1))
    n_uniq = F.size(F.array_distinct(toks))
    en_stop = F.array(*[F.lit(m) for m in LANG_MARKERS["en"]])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(en_stop, t)))
    scored = documents.select(
        "doc_id",
        "lang",
        n_tok.alias("n_tok"),
        n_uniq.alias("n_uniq"),
        stop_hits.alias("stop_hits"),
    ).select(
        "doc_id",
        "lang",
        (
            F.expr("least(n_tok, 200) * 10000 DIV 200")
            + F.expr("n_uniq * 10000 DIV n_tok")
            + F.expr("least(stop_hits * 50000 DIV n_tok, 10000)")
        ).alias("iq"),
    )
    base = scored.select("lang", "iq")
    totals = base.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    ranks = totals.select(
        "lang",
        F.lit("cut").alias("sel"),
        F.expr(f"n * {drop_pct} DIV 100").alias("r"),
    ).where(F.col("r") >= 1)
    cuts = grid_rank_select(base, "lang", "iq", ranks, 256).select(
        "lang", F.col("value").alias("t")
    )
    stats = (
        base.join(F.broadcast(cuts), "lang", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("iq").alias("s_tot"),
            F.coalesce(
                F.sum(F.when(F.col("iq") < F.col("t"), F.col("iq"))), F.lit(0)
            ).alias("s_lt"),
            F.coalesce(
                F.sum((F.col("iq") < F.col("t")).cast("long")), F.lit(0)
            ).alias("c_lt"),
            F.max("t").alias("t"),
        )
        .withColumn("c", F.expr(f"n * {drop_pct} DIV 100"))
        .withColumn(
            "s_drop",
            F.col("s_lt") + (F.col("c") - F.col("c_lt")) * F.coalesce("t", F.lit(0)),
        )
    )
    return stats.select(
        "lang",
        F.col("n").alias("n_docs"),
        F.col("c").alias("n_dropped"),
        (F.col("n") - F.col("c")).alias("n_kept"),
        F.round(F.coalesce(F.col("t"), F.lit(0)) / 10000.0, 4).alias("threshold_q"),
        F.round(
            (F.col("s_tot") - F.col("s_drop")) / (F.col("n") - F.col("c")) / 10000.0,
            4,
        ).alias("avg_kept_q"),
        F.when(
            F.col("c") > 0,
            F.round(F.col("s_drop") / F.col("c") / 10000.0, 4),
        ).alias("avg_dropped_q"),
    )


def lang_id_confusion(documents: DataFrame) -> DataFrame:
    """Model-evaluation rollup for the language identifier — the
    confusion matrix + per-label precision/recall a curation team reads
    before trusting ``lang_id`` to gate a corpus: counts per
    (labeled, predicted) cell and the per-labeled-language recall /
    per-predicted-language precision, all from ONE aggregation over the
    classifier's own output (no second scoring pass).

    Integer counts; the two ratios are single int/int→double divisions
    rounded at 4dp, identical cross-engine. Cell space is bounded by
    |languages|² — broadcast-scale forever.
    """
    pred = lang_id(documents).select("labeled_lang", "pred_lang")
    cells = pred.groupBy("labeled_lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    by_label = Window.partitionBy("labeled_lang")
    by_pred = Window.partitionBy("pred_lang")
    return cells.select(
        "labeled_lang",
        "pred_lang",
        "n",
        F.round(F.col("n") / F.sum("n").over(by_label), 4).alias("recall"),
        F.round(F.col("n") / F.sum("n").over(by_pred), 4).alias("precision"),
    )


def char_weighted_length_percentiles(documents: DataFrame) -> DataFrame:
    """Char-weighted document-length percentiles per language — the
    curation statistic that answers "where does the median BYTE live?"
    rather than "where does the median DOC live?": a corpus can be 90%
    short docs yet 90% long-doc characters, and token budgets follow
    mass, not document count (the count-weighted twin is
    ``adaptive_quality_gate``'s cut).

    wp50/wp90 are exact weighted order statistics: the smallest length
    L such that documents of length ≤ L hold ≥ p% of the language's
    total characters — computed by ``grid_weighted_rank_select``
    (selection.py), the weighted generalization of the histogram-
    refinement engine: every count becomes a weight SUM (additive,
    map-combinable), so no per-language sort of raw docs exists and
    the degenerate-distribution immunity carries over unchanged.
    Languages with zero total weight are excluded (weighted
    percentiles are undefined there) — both engines filter on W > 0.
    """
    from kinesis_dstream_spark.operators.selection import (
        grid_weighted_rank_select,
    )

    base = documents.select(
        "lang", F.col("n_chars").alias("len"), F.col("n_chars").alias("w")
    )
    totals = (
        base.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("w").alias("total_chars"),
        )
        .where(F.col("total_chars") > 0)
    )
    ranks = None
    for p in (50, 90):
        r = totals.select(
            "lang",
            F.lit(f"p{p}").alias("sel"),
            F.expr(f"(total_chars * {p} + 99) DIV 100").alias("r"),
        )
        ranks = r if ranks is None else ranks.unionByName(r)
    sel = grid_weighted_rank_select(base, "lang", "len", "w", ranks, 1024)
    pcts = sel.groupBy("lang").agg(
        F.max(F.when(F.col("sel") == "p50", F.col("value"))).alias("wp50_len"),
        F.max(F.when(F.col("sel") == "p90", F.col("value"))).alias("wp90_len"),
    )
    return totals.join(pcts, "lang").select(
        "lang", "n_docs", "total_chars", "wp50_len", "wp90_len"
    )


CHAR_WEIGHTED_LENGTH_SQL = """
WITH base AS (SELECT lang, n_chars AS len FROM documents),
tot AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len) AS BIGINT) AS total_chars
  FROM base GROUP BY lang HAVING sum(len) > 0
), vals AS (
  SELECT lang, len, sum(len) AS c FROM base GROUP BY lang, len
), cum AS (
  SELECT lang, len,
         sum(c) OVER (PARTITION BY lang ORDER BY len) AS cw
  FROM vals
)
SELECT t.lang, t.n_docs, t.total_chars,
       min(CASE WHEN cw >= (total_chars * 50 + 99) // 100 THEN len END)
         AS wp50_len,
       min(CASE WHEN cw >= (total_chars * 90 + 99) // 100 THEN len END)
         AS wp90_len
FROM cum c JOIN tot t ON c.lang = t.lang
GROUP BY t.lang, t.n_docs, t.total_chars
"""


def vocabulary_growth(documents: DataFrame) -> DataFrame:
    """Vocabulary-growth (Heaps-law) telemetry per source: processing
    sources in lexicographic order, how many DISTINCT tokens each
    source contributes that no earlier source contained, plus the
    cumulative vocabulary — the curve a curation team reads to decide
    whether the next crawl slice still adds linguistic coverage or
    only repeats the vocabulary it already has.

    Exact formulation (no iterative scan): a token's contributing
    source is its MINIMUM source id — one (token, min) aggregate — so
    per-source new-token counts are a second map-combined aggregate
    and the cumulative curve is a running sum over the |sources|-row
    table. The only row-grain shuffle keys on the token itself
    (naturally spread); everything after is source-grain.
    """
    from kinesis_dstream_spark.functions.textfns import tokens

    tok = documents.select(
        "source", F.explode(F.array_distinct(tokens(F.col("text")))).alias("tok")
    ).filter(F.col("tok") != "")
    per_source_tokens = tok.groupBy("source").agg(
        F.countDistinct("tok").alias("n_distinct_tokens")
    )
    first = tok.groupBy("tok").agg(F.min("source").alias("source"))
    new_per_source = first.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_new_tokens")
    )
    w = Window.orderBy("source").rowsBetween(Window.unboundedPreceding, 0)
    out = (
        per_source_tokens.join(new_per_source, "source", "left")
        .select(
            "source",
            "n_distinct_tokens",
            F.coalesce("n_new_tokens", F.lit(0)).alias("n_new_tokens"),
        )
        # |sources|-row table: the unpartitioned running-sum window is
        # bounded by the source count, not the corpus (same class as
        # cumulative_distinct_users' #days window)
        .withColumn("cum_vocab", F.sum("n_new_tokens").over(w))
    )
    return out


VOCABULARY_GROWTH_SQL = """
WITH tok AS (
  SELECT DISTINCT source, unnest({toks}) AS tok FROM documents
), tok2 AS (SELECT source, tok FROM tok WHERE tok <> ''),
per_source AS (
  SELECT source, CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct_tokens
  FROM tok2 GROUP BY 1
), first AS (
  SELECT tok, min(source) AS source FROM tok2 GROUP BY 1
), new_t AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_new_tokens FROM first GROUP BY 1
)
SELECT p.source, p.n_distinct_tokens,
       CAST(coalesce(n.n_new_tokens, 0) AS BIGINT) AS n_new_tokens,
       CAST(sum(coalesce(n.n_new_tokens, 0))
            OVER (ORDER BY p.source) AS BIGINT) AS cum_vocab
FROM per_source p LEFT JOIN new_t n ON n.source = p.source
"""


_WINNOW_K = 4  # tokens per k-gram
_WINNOW_W = 5  # k-grams per winnowing window


def winnowing_fingerprints(
    documents: DataFrame, k: int = _WINNOW_K, w: int = _WINNOW_W
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS algorithm): hash every k-token gram, slide a w-gram window,
    and keep each window's MINIMUM hash (leftmost on ties) — the
    position-robust LOCAL fingerprinting scheme with the guarantee the
    whole-doc rolling hash (``doc_fingerprints``) and fixed-stride
    chunk hashes can't give: any substring of at least w+k−1 shared
    tokens is CERTAIN to contribute at least one identical
    fingerprint to both documents (pytest-pinned), while only
    ~2/(w+1) of grams are kept. The plagiarism/attribution index
    primitive; fingerprints are joinable across docs exactly like LSH
    bands.

    Engine parity: the gram hash is the md5 HEX STRING (identical in
    both engines) and the window minimum runs on ``h#zero-padded-pos``
    so lexicographic min == (hash asc, pos asc) — the leftmost-tie
    rule — with no numeric-hash portability hazard. Tail windows
    shorter than w are excluded (standard winnowing defines exactly
    n_grams − w + 1 windows; docs with fewer than w grams contribute
    their single whole-doc window).

    Plan: one explode to (doc, pos, gram) rows, ONE per-doc ordered
    window pass (frame CURRENT..w−1 FOLLOWING — partitioned by doc,
    never global), one distinct. Fingerprint volume ≈ 2·n_grams/(w+1).
    """
    toks = tokens(F.col("text"))
    n_grams = F.greatest(F.size(toks) - (k - 1), F.lit(1))
    grams = documents.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), n_grams),
                lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
            )
        ).alias("pos0", "gram"),
        n_grams.alias("n_grams"),
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        "n_grams",
        F.concat(
            F.md5("gram"), F.lit("#"), F.lpad(F.col("pos0") + 1, 10, "0")
        ).alias("key"),
    )
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    selected = (
        grams.withColumn("sel", F.min("key").over(win))
        # exactly n_grams − w + 1 full windows (≥ 1 for short docs)
        .filter(F.col("pos") <= F.greatest(F.col("n_grams") - (w - 1), F.lit(1)))
        .select(
            "doc_id",
            F.substring("sel", 1, 32).alias("fp"),
            F.substring("sel", 34, 10).cast("int").alias("fp_pos"),
        )
        .distinct()
    )
    return selected


def winnowing_sql(k: int = _WINNOW_K, w: int = _WINNOW_W) -> str:
    """DuckDB twin generated from the SAME (k, w)."""
    return f"""
WITH toks AS (
  SELECT doc_id,
         str_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS t
  FROM documents
), grams AS (
  SELECT doc_id,
         unnest(generate_series(1, greatest(len(t) - {k - 1}, 1))) AS pos,
         unnest(list_transform(range(1, greatest(len(t) - {k - 1}, 1) + 1),
                               i -> array_to_string(t[i:i+{k - 1}], ' ')))
           AS gram,
         greatest(len(t) - {k - 1}, 1) AS n_grams
  FROM toks
), keyed AS (
  SELECT doc_id, pos, n_grams,
         md5(gram) || '#' || lpad(CAST(pos AS VARCHAR), 10, '0') AS key
  FROM grams
), sel AS (
  SELECT doc_id,
         min(key) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS sel,
         pos, n_grams
  FROM keyed
)
SELECT DISTINCT doc_id, substr(sel, 1, 32) AS fp,
       CAST(substr(sel, 34, 10) AS INT) AS fp_pos
FROM sel
WHERE pos <= greatest(n_grams - {w - 1}, 1)
"""


WINNOWING_SQL = winnowing_sql()


_ZIPF_LN_SCALE = 1_000_000  # µ-units for ln(rank)/ln(count) fixed-points


def zipf_fit_by_source(documents: DataFrame, top_n: int = 100) -> DataFrame:
    """Zipf-law fit per source: OLS slope of ln(frequency) on ln(rank)
    over each source's ``top_n`` most frequent tokens — the
    frequency-DISTRIBUTION companion to ``vocabulary_growth``'s Heaps
    curve. Natural language sits near slope −1; a source whose slope
    collapses toward 0 (flat counts — machine-generated id soup) or
    dives far below −1 (a few tokens dominate — templated boilerplate)
    fails the linguistic-plausibility screen regardless of its
    per-document quality scores. The r² says whether a power law
    describes the source at all.

    Determinism: ranks are exact (count DESC, term ASC is a total
    order); ln(rank) and ln(count) are fixed-pointed to µ-units per
    row, so the five OLS sufficient statistics are exact int64 sums —
    with ``top_n`` = 100 and ln(count) < 50 (count < e⁵⁰), every
    normal-equation product stays inside int64 (~2.7e18 worst case;
    raising top_n past ~300 needs DECIMAL(38) — noted, the
    ``value_trend_regression`` rule). Slope is one int/int division;
    intercept and r² use the same explicit double casts as the trend
    twin, mirrored in the oracle.

    Plan: ONE token-count shuffle (map-side partials bound it at
    |distinct (source, term)|), a per-source rank window over that
    distinct-term table (partitioned by source — never global), then a
    |sources|-row closed-form aggregate. Corpus scanned once.
    """
    toks = documents.select(
        "source", F.explode(tokens(F.col("text"))).alias("term")
    ).filter(F.col("term") != "")
    counts = toks.groupBy("source", "term").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("source").orderBy(
        F.col("cnt").desc(), F.col("term").asc()
    )
    ranked = (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_n)
        .select(
            "source",
            F.round(F.log("rk") * _ZIPF_LN_SCALE).cast("long").alias("lx"),
            F.round(F.log("cnt") * _ZIPF_LN_SCALE).cast("long").alias("ly"),
        )
    )
    agg = ranked.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum(F.col("ly") * F.col("ly")).alias("syy"),
    )
    det = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    det_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return agg.select(
        "source",
        "n",
        F.when(det != 0, F.round(num / det, 6)).alias("zipf_slope"),
        F.when(
            det != 0,
            F.round(
                (
                    F.col("sy").cast("double") * F.col("sxx").cast("double")
                    - F.col("sx").cast("double") * F.col("sxy").cast("double")
                )
                / det.cast("double")
                / _ZIPF_LN_SCALE,
                4,
            ),
        ).alias("ln_intercept"),
        F.when(
            (det != 0) & (det_y != 0),
            F.round(
                (num.cast("double") * num.cast("double"))
                / (det.cast("double") * det_y.cast("double")),
                4,
            ),
        ).alias("r2"),
    )


def zipf_fit_sql(top_n: int = 100) -> str:
    """DuckDB twin generated from the SAME top_n."""
    duck_toks = "str_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')"
    s = _ZIPF_LN_SCALE
    return f"""
WITH toks AS (
  SELECT source, unnest({duck_toks}) AS term FROM documents
), counts AS (
  SELECT source, term, count(*) AS cnt FROM toks
  WHERE term <> '' GROUP BY source, term
), ranked AS (
  SELECT source,
         CAST(round(ln(rk) * {s}) AS BIGINT) AS lx,
         CAST(round(ln(cnt) * {s}) AS BIGINT) AS ly
  FROM (
    SELECT source, cnt,
           row_number() OVER (PARTITION BY source
                              ORDER BY cnt DESC, term ASC) AS rk
    FROM counts
  ) WHERE rk <= {top_n}
), agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(lx) AS BIGINT) AS sx, CAST(sum(ly) AS BIGINT) AS sy,
         CAST(sum(lx * ly) AS BIGINT) AS sxy,
         CAST(sum(lx * lx) AS BIGINT) AS sxx,
         CAST(sum(ly * ly) AS BIGINT) AS syy
  FROM ranked GROUP BY source
)
SELECT source, n,
       CASE WHEN n * sxx - sx * sx <> 0 THEN
         round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
       END AS zipf_slope,
       CASE WHEN n * sxx - sx * sx <> 0 THEN
         round((CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE))
               / CAST(n * sxx - sx * sx AS DOUBLE) / {s}, 4)
       END AS ln_intercept,
       CASE WHEN n * sxx - sx * sx <> 0 AND n * syy - sy * sy <> 0 THEN
         round((CAST(n * sxy - sx * sy AS DOUBLE)
                * CAST(n * sxy - sx * sy AS DOUBLE))
               / (CAST(n * sxx - sx * sx AS DOUBLE)
                  * CAST(n * syy - sy * sy AS DOUBLE)), 4)
       END AS r2
FROM agg
"""


ZIPF_FIT_SQL = zipf_fit_sql()


def doc_novelty_score(documents: DataFrame, k: int = 5) -> DataFrame:
    """Per-document novelty: what fraction of a document's distinct
    k-gram shingles appear NOWHERE else in the corpus — the
    memorization-risk / contribution screen between the pair-grain
    dedup operators and corpus-grain curation: a near-zero novelty doc
    adds no new n-grams (train-set memorization fodder, prune-safe),
    while bulk LOW corpus novelty flags a crawl slice as re-crawl.
    The doc-grain complement of ``source_overlap_matrix``'s
    source-grain containment.

    Output per doc: n_shingles (distinct k-grams), n_shared (those
    with corpus document-frequency ≥ 2), novelty_ppm =
    (n_shingles − n_shared)·10⁶ div n_shingles — exact integers.

    Scale shape: shingle document-frequency is ONE map-combined
    aggregate keyed by shingle; the join back is keyed on the SAME
    shingle column (co-partitioned with the aggregate, output linear
    in shingle rows — a 1:df join, never pairwise); the re-aggregation
    keys on doc_id. No df cap is needed because nothing here is a
    SELF-join: a stop-phrase contributes one counted row per document,
    not df² pairs.
    """
    from kinesis_dstream_spark.functions.textfns import tokens, word_shingles

    sh = documents.select(
        "doc_id",
        F.explode(word_shingles(tokens(F.col("text")), k)).alias("shingle"),
    )
    # r13 optimization (guide §2.4): df-per-shingle and the join back
    # are keyed the SAME way, so one window over the shingle exchange
    # replaces the aggregate + second shuffle-join of the shingle rows
    # (2 corpus-shingle exchanges + re-scan → 1); count over the
    # partition is exactly the joined df value
    dfw = Window.partitionBy("shingle")
    return (
        sh.withColumn("df", F.count(F.lit(1)).over(dfw))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("df") >= 2).cast("long")).alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_shared",
            F.expr(
                "CAST((n_shingles - n_shared) * 1000000 div n_shingles"
                " AS BIGINT)"
            ).alias("novelty_ppm"),
        )
    )


def doc_novelty_sql(k: int = 5) -> str:
    """DuckDB twin generated from the SAME k (string shingles,
    count-identical at the distinct-per-doc grain)."""
    duck_toks = "str_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')"
    return f"""
WITH toks AS (
  SELECT doc_id, {duck_toks} AS t FROM documents
), sh AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(range(1, greatest(len(t) - {k - 1}, 1) + 1),
                   i -> array_to_string(t[i:i+{k - 1}], ' ')))) AS shingle
  FROM toks
), dfs AS (
  SELECT shingle, count(*) AS df FROM sh GROUP BY shingle
)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared,
       CAST((count(*) - sum(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END))
            * 1000000 // count(*) AS BIGINT) AS novelty_ppm
FROM sh s JOIN dfs d ON d.shingle = s.shingle
GROUP BY s.doc_id
"""


DOC_NOVELTY_SQL = doc_novelty_sql()


def sentence_stats(documents: DataFrame) -> DataFrame:
    """Per-document sentence statistics — the Gopher/MassiveText
    sentence-level quality signals the word-level operators can't see:
    sentence count, mean sentence length in words, and the share of
    very short (<3-word) "sentences" (boilerplate menus and nav bars
    segment into storms of fragments; prose doesn't).

    Segmentation is the deliberately simple terminal-punctuation rule
    ([.!?]+ runs as boundaries) applied IDENTICALLY in both engines —
    the portable RE2∩Java subset (the CEP-regex discipline): no
    lookaround, no classes outside literals. Abbreviation handling is
    out of scope by design (a quality FILTER needs a consistent
    segmenter, not a perfect one; both engines seeing the same splits
    is the property that matters and the one the oracle certifies).

    Output: doc_id, n_sentences, mean_sent_words (round 4),
    short_sent_ppm — exact integers until the one display division.
    Plan: one map-side split+transform per row, one doc-grain
    aggregate; no joins, no shuffle beyond the final aggregate.
    """
    sents = F.filter(
        F.transform(
            F.split(F.col("text"), r"[.!?]+"),
            lambda s: F.trim(s),
        ),
        lambda s: s != "",
    )
    words_per = F.transform(
        sents, lambda s: F.size(F.split(s, r"\s+"))
    )
    n = F.size(sents)
    return documents.select(
        "doc_id",
        n.cast("long").alias("n_sentences"),
        F.when(
            n > 0,
            F.round(
                F.aggregate(
                    words_per, F.lit(0).cast("long"), lambda a, x: a + x
                )
                / n,
                4,
            ),
        ).alias("mean_sent_words"),
        F.when(
            n > 0,
            F.floor(
                F.size(F.filter(words_per, lambda w: w < 3))
                .cast("long")
                * 1000000
                / n
            ).cast("long"),
        ).alias("short_sent_ppm"),
    )


SENTENCE_STATS_SQL = """
WITH segs AS (
  SELECT doc_id,
         list_filter(list_transform(regexp_split_to_array(text, '[.!?]+'),
                                    s -> trim(s)),
                     s -> s <> '') AS sents
  FROM documents
), stats AS (
  SELECT doc_id, len(sents) AS n_sentences,
         list_transform(sents,
                        s -> len(regexp_split_to_array(s, '\\s+'))) AS wp
  FROM segs
)
SELECT doc_id, CAST(n_sentences AS BIGINT) AS n_sentences,
       CASE WHEN n_sentences > 0 THEN
         round(list_reduce(wp, (a, b) -> a + b) * 1.0 / n_sentences, 4)
       END AS mean_sent_words,
       CASE WHEN n_sentences > 0 THEN
         CAST(len(list_filter(wp, w -> w < 3)) * 1000000 // n_sentences
              AS BIGINT)
       END AS short_sent_ppm
FROM stats
"""


_PMI_SCALE = 1_000_000  # µ-units for ln() terms (the zipf/LM discipline)
# shared defaults — the streaming maintenance drain imports THESE (and
# the scoring helper below) so the batch oracle and the streamed
# readout can never silently diverge on thresholds or arithmetic
_PMI_MIN_COUNT = 5
_PMI_TOP_K = 50


def pmi_score_topk(
    uni: DataFrame,
    pair: DataFrame,
    n_uni: int,
    n_big: int,
    min_count: int = _PMI_MIN_COUNT,
    top_k: int = _PMI_TOP_K,
) -> DataFrame:
    """The SINGLE PMI scoring chain, shared by the batch operator and
    the streaming maintenance drain (`streaming/jobs.py`): given the
    unigram table ``uni(w, c)``, the UNFILTERED bigram table
    ``pair(w1, w2, c_xy)``, and the two exact totals, apply the
    min_count gate, the µ-unit ln fixed-point, and the integer-ranked
    top-k cut. Any future change to thresholds or to the double chain
    lands in both consumers by construction."""
    pair = pair.filter(F.col("c_xy") >= min_count)
    joined = (
        pair.join(
            F.broadcast(uni.select(F.col("w").alias("w1"), F.col("c").alias("c_x"))),
            "w1",
        )
        .join(
            F.broadcast(uni.select(F.col("w").alias("w2"), F.col("c").alias("c_y"))),
            "w2",
        )
    )
    pmi_fp = F.round(
        F.log(
            (F.col("c_xy") * F.lit(float(n_uni)) * F.lit(float(n_uni)))
            / (F.lit(float(n_big)) * F.col("c_x") * F.col("c_y"))
        )
        * _PMI_SCALE
    ).cast("long")
    return (
        joined.select("w1", "w2", "c_xy", "c_x", "c_y", pmi_fp.alias("pmi_fp"))
        .orderBy(F.col("pmi_fp").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(top_k)
        .select(
            "w1",
            "w2",
            "c_xy",
            "c_x",
            "c_y",
            # display at the FULL µ-unit precision: a 4dp re-round of a
            # 6dp fixed-point can land exactly on a .5 boundary (hit at
            # sf0.1: pmi_fp = 95450 → 0.0955 vs 0.0954 across engines);
            # on its own 6dp grid the double is ~1e-17 from the grid
            # point and ~5e-7 from any boundary — no engine can differ
            F.round(F.col("pmi_fp") / _PMI_SCALE, 6).alias("pmi"),
        )
    )


def token_pmi_collocations(
    documents: DataFrame, min_count: int = _PMI_MIN_COUNT, top_k: int = _PMI_TOP_K
) -> DataFrame:
    """Top-k adjacent-bigram collocations by pointwise mutual
    information — the classic phrase-mining pass (Church & Hanks 1990;
    word2vec's phrase pre-join uses the same statistic): PMI =
    ln(p(xy) / (p(x)p(y))) with p(xy) = c_xy/N_bigrams and p(x) =
    c_x/N_tokens. High-PMI pairs are the multi-word lexemes ("new
    york", "machine learning") a tokenizer or phrase-joiner should
    treat as units; a curation stack runs this to build phrase
    vocabularies and to spot templated word pairs.

    Determinism: counts and totals are exact int64; the ln is
    fixed-pointed to µ-units (``round(ln·1e6)`` — the zipf/LM
    discipline) so the ORDER BY that picks the global top-k compares
    integers, with (w1, w2) as the total tie-break. ``min_count``
    suppresses the PMI's notorious rare-pair instability (a
    1-occurrence pair of two hapaxes maxes the statistic).

    Plan: tokens and bigrams ride the same exploded stream (one
    doc_id-keyed lead window, per-doc-bounded partitions); unigram and
    bigram counts are map-side-combined shuffles on term keys; the
    final top-k is a TakeOrderedAndProject (per-partition local top-k,
    k rows to the driver stage — never a global sort). The pair table
    is bounded by distinct ADJACENT pairs ≥ min_count, a vanishing
    fraction of vocab².
    """
    from kinesis_dstream_spark.functions.textfns import tokens

    toks = documents.select("doc_id", tokens(F.col("text")).alias("t"))
    words = toks.select("doc_id", F.posexplode("t").alias("pos", "w"))
    uni = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    n_uni = words.count()
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        words.withColumn("w2", F.lead("w").over(w))
        .filter(F.col("w2").isNotNull())
        .select(F.col("w").alias("w1"), "w2")
    )
    pair = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_xy"))
    n_big = big.count()
    return pmi_score_topk(uni, pair, n_uni, n_big, min_count, top_k)


def token_pmi_collocations_sql(
    min_count: int = _PMI_MIN_COUNT, top_k: int = _PMI_TOP_K
) -> str:
    """DuckDB twin generated from the SAME thresholds."""
    duck_toks = "str_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')"
    s = _PMI_SCALE
    return f"""
WITH toks AS (
  SELECT doc_id, {duck_toks} AS t FROM documents
), words AS (
  SELECT doc_id, unnest(generate_series(1, len(t))) AS pos, unnest(t) AS w
  FROM toks
), uni AS (
  SELECT w, count(*) AS c FROM words GROUP BY w
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_uni FROM words
), big AS (
  SELECT w1, w2 FROM (
    SELECT w AS w1, lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM words
  ) WHERE w2 IS NOT NULL
), btot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_big FROM big
), pair AS (
  SELECT w1, w2, count(*) AS c_xy FROM big GROUP BY w1, w2
  HAVING count(*) >= {min_count}
), scored AS (
  SELECT p.w1, p.w2, p.c_xy, u1.c AS c_x, u2.c AS c_y,
         CAST(round(ln((p.c_xy * CAST(t.n_uni AS DOUBLE) * t.n_uni)
                       / (CAST(b.n_big AS DOUBLE) * u1.c * u2.c))
                    * {s}) AS BIGINT) AS pmi_fp
  FROM pair p
  JOIN uni u1 ON u1.w = p.w1
  JOIN uni u2 ON u2.w = p.w2
  CROSS JOIN tot t CROSS JOIN btot b
)
SELECT w1, w2, CAST(c_xy AS BIGINT) AS c_xy, CAST(c_x AS BIGINT) AS c_x,
       CAST(c_y AS BIGINT) AS c_y,
       round(pmi_fp / {s}.0, 6) AS pmi
FROM scored
ORDER BY pmi_fp DESC, w1 ASC, w2 ASC
LIMIT {top_k}
"""


TOKEN_PMI_COLLOCATIONS_SQL = token_pmi_collocations_sql()
