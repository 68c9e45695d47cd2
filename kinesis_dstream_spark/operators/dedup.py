"""Deduplication operators (SURVEY §2B E-10) over the ``documents`` table.

Five tiers, cheapest→most-general, all shuffle-frugal:

1. exact (group on the raw text)                 — 1 shuffle
2. content-hash (group on sha256, 100 TB path)   — 1 shuffle on a 32-byte key
3. SimHash near-dup (banded, Hamming-verified)   — 2 narrow shuffles
4. n-gram Jaccard near-dup (shingle inverted index) — exact pair semantics
5. MinHash-LSH near-dup (Spark ML approxSimilarityJoin) — the sketch path

Scale reasoning (100 TB): exact/near dedup must never compare all pairs.
Every near-dup operator here generates candidates through an inverted
index (shared shingle / shared SimHash band / shared MinHash bucket) so
the join key distributes the work, then verifies candidates exactly.
Verification cost is proportional to true-near-dup density, not n².
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kinesis_dstream_spark.functions.textfns import md5_bits32, tokens, word_shingles


def dedup_exact(documents: DataFrame) -> DataFrame:
    """Exact dedup: canonical (min doc_id) representative per text.

    One hash-aggregate shuffle keyed on the text itself. Fine at fixture
    scale; at 100 TB prefer ``dedup_content_hash`` (same semantics,
    fixed-width key, no long-string shuffle).
    """
    return (
        documents.groupBy("text")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count("*").alias("n_copies"),
            F.min("n_chars").alias("n_chars"),
        )
        .select("keep_id", "n_copies", "n_chars")
    )


def dedup_content_hash(documents: DataFrame) -> DataFrame:
    """Content-addressed dedup: group on sha256(text).

    The shuffle key is 64 hex chars regardless of document size — at
    100 TB this moves ~1000x fewer bytes through the exchange than
    grouping on raw text. Collision probability is negligible (2^-128).
    """
    return (
        documents.withColumn("content_sha", F.sha2(F.col("text"), 256))
        .groupBy("content_sha")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .select("content_sha", "keep_id", "n_copies")
    )


def simhash_signatures(documents: DataFrame, bits: int = 32) -> DataFrame:
    """Per-document SimHash over word tokens (native expressions only).

    For each bit b: sum over tokens of (+1 if bit set in token hash else
    -1); sign of the sum is the signature bit. Expressed as a fold over
    bit positions built from ``transform``/``aggregate`` — no Python in
    the row path, and md5-based token hashes keep it oracle-reproducible.
    """
    toks = tokens(F.col("text"))
    hashes = F.transform(toks, md5_bits32)
    # literal powers of two: bit b of h is (h & pows[b]) != 0
    pows = F.array(*[F.lit(1 << b).cast("long") for b in range(bits)])

    # Single fold over the token hashes with an array<long> accumulator of
    # per-bit set-counts — one md5 per token total (a 32x rewrite over the
    # naive per-bit aggregate, which re-hashed every token per bit).
    zero = F.array_repeat(F.lit(0).cast("long"), bits)
    counts = F.aggregate(
        hashes,
        zero,
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                pows,
                lambda p: F.when(h.bitwiseAND(p) != 0, F.lit(1).cast("long")).otherwise(
                    F.lit(0).cast("long")
                ),
            ),
            lambda x, y: x + y,
        ),
    )
    n = F.size(toks)
    # majority vote per bit: emit the bit's power-of-two, sum into int64
    sig = F.aggregate(
        F.zip_with(
            counts,
            pows,
            lambda c, p: F.when(c * 2 >= n, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return documents.select("doc_id", sig.alias("simhash"))


def dedup_simhash(
    documents: DataFrame, max_hamming: int = 3, bits: int = 32, bands: int = 4
) -> DataFrame:
    """SimHash near-dup pairs with Hamming distance ≤ ``max_hamming``.

    Banded candidate generation (pigeonhole: two signatures within
    Hamming k must agree exactly on ≥1 of k+1 bands) then exact Hamming
    verification via bit_count(xor). The band join is the inverted
    index — no all-pairs comparison anywhere.
    """
    assert bands >= max_hamming + 1, "pigeonhole needs bands > max_hamming"
    sigs = simhash_signatures(documents, bits).cache()
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    banded = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_no"),
                        F.shiftright("simhash", i * band_bits)
                        .bitwiseAND(F.lit(mask).cast("long"))
                        .alias("band_val"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_no", "band.band_val")
    left = banded.alias("a")
    right = banded.alias("b")
    # hamming-filter BEFORE deduplicating: the filter is a cheap bitop on
    # the join output, and it shrinks the dropDuplicates shuffle to the
    # (rare) true-near-dup pairs instead of all band collisions.
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        left.join(
            right,
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_a", "doc_b"])
    )


def dedup_ngram_jaccard(
    documents: DataFrame, k: int = 3, threshold: float = 0.6
) -> DataFrame:
    """Exact n-gram-shingle Jaccard pairs ≥ threshold via inverted index.

    shingle-explode → self-join on shingle (the inverted index) →
    per-pair intersection count → |A∪B| = |A|+|B|−|A∩B|. The only big
    shuffle is keyed by shingle; hot shingles (stop-phrases) are the skew
    risk at 100 TB — mitigated by dropping ultra-frequent shingles
    (``max_df``-style) the same way MinHashLSH drops dense rows, or by
    AQE skew splitting. Here the fixture vocabulary is tiny so we keep
    all shingles for exact-oracle semantics.
    """
    sh = documents.select(
        "doc_id", word_shingles(tokens(F.col("text")), k).alias("shingles")
    )
    sizes = sh.select("doc_id", F.size("shingles").alias("n_sh"))
    exploded = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.round(
        F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


_MH_PRIME = (1 << 31) - 1  # Mersenne prime: products of two <2^31 values fit int64


def minhash_signatures(
    documents: DataFrame, k: int = 3, num_hashes: int = 32, seed: int = 42
) -> DataFrame:
    """Per-document MinHash signature over k-word shingles (native exprs).

    Universal-hashing construction: each shingle is murmur-hashed ONCE,
    then the i-th MinHash applies a cheap linear transform
    ``(a_i*h + b_i) mod p`` — 32 integer ops instead of 32 string hashes
    per shingle (~4x faster signatures). Signature width is constant per
    document regardless of size — the property that makes MinHash the
    100 TB dedup path.
    """
    import random

    rng = random.Random(seed)
    coefs = [
        (rng.randrange(1, _MH_PRIME), rng.randrange(0, _MH_PRIME))
        for _ in range(num_hashes)
    ]

    sh = documents.select(
        "doc_id", word_shingles(tokens(F.col("text")), k).alias("shingles")
    ).filter(F.size("shingles") > 0)

    # one string hash per shingle, folded into [0, p)
    base = F.transform(
        F.col("shingles"),
        lambda s: F.pmod(F.hash(s).cast("long"), F.lit(_MH_PRIME)),
    )

    # Single fold with an array<long> accumulator of running minima: the
    # base hash is evaluated exactly once per shingle (expressing this as
    # 32 separate array_min projections would let projection collapse
    # inline — and re-evaluate — the string hashing 32 times).
    a_arr = F.array(*[F.lit(a).cast("long") for a, _ in coefs])
    b_arr = F.array(*[F.lit(b).cast("long") for _, b in coefs])
    idx = F.sequence(F.lit(1), F.lit(num_hashes))
    init = F.array_repeat(F.lit(_MH_PRIME).cast("long"), num_hashes)
    sig = F.aggregate(
        base,
        init,
        lambda acc, h: F.zip_with(
            acc,
            idx,
            lambda m, i: F.least(
                m,
                (h * F.element_at(a_arr, i) + F.element_at(b_arr, i))
                % F.lit(_MH_PRIME),
            ),
        ),
    )
    return sh.select("doc_id", "shingles", sig.alias("sig"))


def dedup_minhash_lsh(
    documents: DataFrame,
    k: int = 3,
    bands: int = 8,
    rows_per_band: int = 4,
    threshold: float = 0.6,
) -> DataFrame:
    """MinHash-LSH near-dup pairs — the sketch/scale path (E-10).

    Banded LSH with AND-OR amplification: the 32-wide signature splits
    into 8 bands of 4 rows; a pair is a candidate iff some band matches
    *exactly* (P = 1-(1-s^r)^b — steep S-curve around s≈0.55). Candidates
    are then verified with the exact shingle-set Jaccard, so output pairs
    are true near-dups; only *recall* is probabilistic.

    Spark ML's MinHashLSH was deliberately not used: its OR-only
    amplification (numHashTables 1-row bands) admits every pair with even
    weak similarity as a candidate — on corpora with a shared core
    vocabulary the candidate set degenerates toward n², which is exactly
    the blow-up LSH exists to avoid. The banded join here is the same
    shape Spark ML uses (explode + equi-join) with tunable r.

    Probabilistic recall → no SQL oracle; pytest asserts recall against
    ``dedup_ngram_jaccard`` instead.
    """
    num_hashes = bands * rows_per_band
    # cache() is load-bearing: the signature aggregate is referenced by
    # every band struct AND by the verification join — without a
    # materialization barrier Catalyst's projection collapse would inline
    # (and re-evaluate) the 32-hash fold dozens of times.
    sigs = minhash_signatures(documents, k, num_hashes).cache()
    banded = sigs.select(
        "doc_id",
        "shingles",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_no"),
                        # hash of the band's signature slice = the bucket key
                        F.hash(
                            *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "shingles", "band.band_no", "band.band_hash")
    # candidate generation on id pairs only: the heavy shingle arrays do
    # NOT ride through the band join/dedup shuffle — they are joined back
    # once per unique candidate pair for verification.
    ids = banded.select("doc_id", "band_no", "band_hash")
    a = ids.alias("a")
    b = ids.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sh = sigs.select("doc_id", "shingles")
    verified = (
        candidates.join(
            sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")),
            "doc_a",
        )
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")),
            "doc_b",
        )
    )
    n_inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = F.round(n_inter / (F.size("sh_a") + F.size("sh_b") - n_inter), 6)
    return (
        verified.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def dedup_embedding_cosine(
    embeddings: DataFrame, threshold: float = 0.4, use_pandas: bool = False
) -> DataFrame:
    """Embedding near-dup: all pairs with cosine ≥ threshold.

    Vectors are L2-normalized once (one narrow pass), so each pair costs
    a single dot product. Pair generation is a self-join; at fixture
    scale that is exact all-pairs (oracle-checkable), at 100 TB you run
    the LSH-bucketed variant in ``similarity.ann_lsh_topk``'s bucketing
    before the same verify step. ``use_pandas`` switches the dot product
    to the Arrow/numpy fast path.
    """
    from kinesis_dstream_spark.functions import vectors as V

    normed = embeddings.select(
        "vec_id", V.l2_normalize(F.col("embedding").cast("array<double>")).alias("unit")
    )
    a = normed.alias("a")
    b = normed.alias("b")
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
    dot = (
        V.dot_pandas(F.col("a.unit"), F.col("b.unit"))
        if use_pandas
        else V.dot(F.col("a.unit"), F.col("b.unit"))
    )
    return (
        pairs.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(dot, 4).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
