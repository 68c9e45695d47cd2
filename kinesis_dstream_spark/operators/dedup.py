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

import numpy as np
import pandas as pd
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

    For each bit b the signature bit is the sign of sum over tokens of
    (+1 if bit set in the token hash else -1); ties count as set (the
    ±1 sum ≥ 0 ⟺ 2·set_count ≥ n). md5-based token hashes keep it
    oracle-reproducible in DuckDB.

    Shape: explode tokens → hash once per token → ONE hash-aggregate with
    32 conditional-sum columns → assemble the int64 signature. This stays
    entirely inside whole-stage codegen with map-side partial aggregation
    — measured ~4x faster than the equivalent higher-order-function fold
    (``aggregate``/``zip_with`` lambdas run interpreted per element) and
    the shape that scales: the shuffle carries 33 longs per document.
    """
    ex = documents.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    hashed = ex.select("doc_id", md5_bits32(F.col("tok")).alias("h"))
    votes = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.col("h").bitwiseAND(F.lit(1 << b).cast("long")) != 0, 1
                ).otherwise(-1)
            ).alias(f"c{b}")
            for b in range(bits)
        ]
    )
    sig = None
    for b in range(bits):
        term = F.when(F.col(f"c{b}") >= 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = term if sig is None else sig + term
    return votes.select("doc_id", sig.alias("simhash"))


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


def capped_shingles(
    documents: DataFrame, k: int = 3, max_df: int | None = None
) -> DataFrame:
    """(doc_id, shingle) inverted-index rows with hot shingles dropped.

    The document-frequency cap is the skew guard for the shingle
    self-join: one stop-phrase shared by 1% of a web corpus would put
    (0.01n)² pairs on a single join key. df is computed with a plain
    hash aggregate (map-side partial aggregation absorbs the hot keys —
    an agg never skews the way a join does), the few shingles over the
    cap form a tiny table that is broadcast anti-joined away. Dropping
    near-universal shingles also *improves* dedup precision: a phrase in
    >2% of documents carries no duplicate signal, the same reason tf-idf
    discounts it. Default cap: max(20, ceil(2% of corpus)).

    Shingles are the 64-bit rotate-xor token-hash folds of
    ``_shingle_hash_sets``, not strings: the inverted index shuffles
    8-byte longs instead of ~20-byte phrases (measured ~2x on the
    self-join), with per-document distinct counts preserved modulo
    negligible 64-bit collisions (<<2^-20 per document pair).
    """
    import math

    if max_df is None:
        max_df = max(20, math.ceil(0.02 * documents.count()))
    # cached: the df aggregate AND the anti-join output both consume it,
    # and downstream the self-join reads it from both sides — without the
    # cache the (interpreted-HOF) shingle fold recomputes 4x. Two longs
    # per row, so the cache is a few MB per million shingle occurrences —
    # nothing like the string-array caching that measured as a loss.
    exploded = (
        _shingle_hash_sets(documents, k)
        .select("doc_id", F.explode("shingles").alias("shingle"))
        .cache()
    )
    hot = (
        exploded.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_df)
        .select("shingle")
    )
    return exploded.join(F.broadcast(hot), "shingle", "left_anti")


def dedup_ngram_jaccard(
    documents: DataFrame,
    k: int = 3,
    threshold: float = 0.6,
    max_df: int | None = None,
) -> DataFrame:
    """n-gram-shingle Jaccard pairs ≥ threshold via capped inverted index.

    shingle-explode → df-cap hot shingles (see ``capped_shingles``) →
    self-join on shingle (the inverted index, with a length-ratio
    prefilter in the join condition) → per-pair intersection count →
    |A∪B| = |A|+|B|−|A∩B| over the *retained* shingle sets. The only big
    shuffle is keyed by shingle, and the cap bounds every key's pair
    count by max_df², so no stop-phrase can create a quadratic partition.

    Two exactness-preserving prunes (the PPJoin length-filter family):
    each index row carries its document's retained-set size, so (1) the
    join condition drops pairs with min(|A|,|B|) < t·max(|A|,|B|) —
    J ≤ min/max, so no qualifying pair is ever lost — before any
    intersection row is emitted, and (2) the sizes ride the group-by
    keys (functionally dependent on the pair), eliminating the two
    end-stage size joins the previous shape paid. Semantics stay
    deterministic (exact Jaccard over the df-capped shingle vocabulary)
    — the DuckDB oracle applies the same cap; on this fixture no shingle
    reaches the default cap, so values equal the uncapped definition.
    """
    from pyspark.sql import Window

    # cached (narrow long pairs + one int): feeds BOTH self-join sides,
    # which would otherwise re-run the anti-join and size window twice
    kept = (
        capped_shingles(documents, k, max_df)
        .withColumn("n_sh", F.count("*").over(Window.partitionBy("doc_id")))
        .cache()
    )
    a = kept.alias("a")
    b = kept.alias("b")
    eps = 1e-9  # float slack: a pair at exactly J = t must survive
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                F.least(F.col("a.n_sh"), F.col("b.n_sh"))
                >= threshold * F.greatest(F.col("a.n_sh"), F.col("b.n_sh")) - eps
            ),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count("*").alias("n_inter"))
    )
    jac = F.round(
        F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
    )
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def dedup_ngram_containment(
    documents: DataFrame,
    k: int = 3,
    threshold: float = 0.6,
    max_df: int | None = None,
) -> DataFrame:
    """Directed n-gram CONTAINMENT pairs: C(src→dst) = |A∩B| / |A|.

    The asymmetric sibling of ``dedup_ngram_jaccard`` — the Broder
    containment coefficient. Jaccard misses the commonest real dup
    shape in crawled corpora: a short document embedded whole inside a
    longer one (quote + commentary, article + boilerplate wrapper) has
    J = |A|/|B| → 0 as B grows but C(A→B) = 1. Emits one row per
    qualifying DIRECTION (a fully-nested pair yields src→dst at 1.0
    and dst→src at |A|/|B|, each filtered independently).

    Plan: the SAME df-capped inverted index as Jaccard
    (``capped_shingles`` — the cap is the skew guard: no stop-phrase
    key can go quadratic), ONE self-join keyed by shingle, one pair
    aggregation carrying both set sizes on the group-by key, then the
    two directions unioned map-side from that single pair table — the
    join and the aggregation are never run twice. No length-ratio
    join prefilter exists for containment BY DESIGN: a tiny A inside a
    huge B qualifies at any size ratio (exactly the pairs Jaccard's
    min/max filter is allowed to drop and this operator is for).

    Scale: identical to Jaccard's — the only corpus-grain shuffle is
    keyed by shingle with per-key pair count bounded by max_df²; the
    direction fan-out is 2× an already-threshold-filtered pair table.
    """
    from pyspark.sql import Window

    kept = (
        capped_shingles(documents, k, max_df)
        .withColumn("n_sh", F.count("*").over(Window.partitionBy("doc_id")))
        .cache()
    )
    a = kept.alias("a")
    b = kept.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count("*").alias("n_inter"))
    )
    fwd = inter.select(
        F.col("doc_a").alias("doc_src"),
        F.col("doc_b").alias("doc_dst"),
        F.round(F.col("n_inter") / F.col("n_a"), 6).alias("containment"),
    )
    rev = inter.select(
        F.col("doc_b").alias("doc_src"),
        F.col("doc_a").alias("doc_dst"),
        F.round(F.col("n_inter") / F.col("n_b"), 6).alias("containment"),
    )
    return fwd.unionByName(rev).filter(F.col("containment") >= threshold)


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
    return minhash_signatures_from_shingles(_shingle_sets(documents, k), num_hashes, seed)


def _shingle_sets(documents: DataFrame, k: int) -> DataFrame:
    """(doc_id, shingles) with empty sets dropped — shared by the
    signature and verification paths so LSH shingles once."""
    return documents.select(
        "doc_id", word_shingles(tokens(F.col("text")), k).alias("shingles")
    ).filter(F.size("shingles") > 0)


def _shingle_hash_sets(documents: DataFrame, k: int) -> DataFrame:
    """(doc_id, hashed shingle set as array<long>) — the MinHash fast path.

    Hash each token once (xxhash64), then combine k adjacent token hashes
    positionally (rotate-xor folds) instead of concatenating strings:
    the zip_with passes do long arithmetic with zero allocations, and the
    resulting sets are 8 bytes/shingle — cheap to cache, cheap to
    array_intersect at verification. 64-bit collisions are negligible at
    corpus scale (<<2^-20 per pair). String shingles remain the oracle
    path (``dedup_ngram_jaccard``); everything probabilistic uses this.
    """
    def mix(x, y):
        # rotate-left-21 then xor: position-sensitive, overflow-free
        # (ANSI mode forbids wrapping multiplies), bijective per step
        rot = F.shiftleft(x, 21).bitwiseOR(F.shiftrightunsigned(x, 43))
        return rot.bitwiseXOR(y)

    toks = tokens(F.col("text"))
    th = F.transform(toks, lambda t: F.xxhash64(t))
    n = F.size(th)
    m = F.greatest(n - (k - 1), F.lit(1))
    acc = F.slice(th, 1, m)
    for j in range(2, k + 1):
        nxt = F.slice(th, j, m)
        acc = F.zip_with(acc, nxt, mix)
    whole = F.array(F.aggregate(th, F.lit(0).cast("long"), mix))
    hsh = F.array_distinct(F.when(n >= k, acc).otherwise(whole))
    return documents.select("doc_id", hsh.alias("shingles")).filter(
        F.size("shingles") > 0
    )


def minhash_signatures_from_shingles(
    sh: DataFrame, num_hashes: int = 32, seed: int = 42
) -> DataFrame:
    """MinHash signatures from precomputed (doc_id, shingles).

    explode → hash each shingle ONCE → one hash-aggregate with 32 min
    columns. All codegen'd with map-side partial mins; the shuffle
    carries (doc_id, 32 longs) regardless of document size. Measured
    ~2x faster than the higher-order-function fold (interpreted
    per-element) it replaces.
    """
    import random

    rng = random.Random(seed)
    coefs = [
        (rng.randrange(1, _MH_PRIME), rng.randrange(0, _MH_PRIME))
        for _ in range(num_hashes)
    ]
    hashed = sh.select("doc_id", F.explode("shingles").alias("s")).select(
        "doc_id", F.pmod(F.hash("s").cast("long"), F.lit(_MH_PRIME)).alias("h")
    )
    mins = hashed.groupBy("doc_id").agg(
        *[
            F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(_MH_PRIME)).alias(f"m{i}")
            for i, (a, b) in enumerate(coefs)
        ]
    )
    return mins.select(
        "doc_id", F.array(*[F.col(f"m{i}") for i in range(num_hashes)]).alias("sig")
    )


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
    # Hashed shingle sets (array<long>, ~8 bytes/shingle) are cheap
    # enough to cache and reuse for BOTH the signature aggregate and the
    # verification intersects — string shingle sets were measured slower
    # to cache than to recompute. Signatures are cached too (33 longs per
    # doc) because the band explode self-joins on them.
    sh = _shingle_hash_sets(documents, k).cache()
    sigs = minhash_signatures_from_shingles(sh, num_hashes).cache()
    ids = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    # band index folded INTO the bucket hash: one join key
                    # instead of (band_no, band_hash) — narrower shuffle
                    # rows and a single-column hash join. A cross-band
                    # hash collision only creates a false candidate,
                    # which exact verification discards.
                    F.hash(
                        F.lit(b),
                        *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)],
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_hash"),
    )
    # candidate generation on id pairs only: the heavy shingle arrays do
    # NOT ride through the band join/dedup shuffle — they are joined back
    # once per unique candidate pair for verification.
    a = ids.alias("a")
    b = ids.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
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
    embeddings: DataFrame,
    threshold: float = 0.4,
    n_cells: int = 16,
    seed: int = 42,
    use_pandas: bool = False,
    train_fraction: float = 1.0,
) -> DataFrame:
    """Embedding near-dup: ALL pairs with cosine ≥ threshold — exact,
    with no cartesian product anywhere in the plan.

    Metric-pruned pair generation: angular distance d(a,b)=arccos(a·b)
    is a metric on the unit sphere, so for a in KMeans cell i and b in
    cell j, d(a,b) ≥ d(ĉᵢ,ĉⱼ) − rᵢ − rⱼ (ĉ = normalized centroid,
    r = cell's max member angle to ĉ). Cell pairs whose lower bound
    exceeds arccos(threshold) provably contain no qualifying pair and
    are pruned before any row-level work; the survivors form a tiny
    driver-computed (cell_a, cell_b) list that is broadcast and met with
    two hash equi-joins keyed on cell. Every candidate is then verified
    with one exact dot product, so the result is identical to all-pairs
    for ANY clustering — correctness never depends on KMeans quality.

    Scale behavior: on real near-dup corpora (clustered — the SemDeDup
    regime) pruning discards almost all of the n_cells² cell pairs and
    candidate count tracks true-duplicate density; n_cells is the knob
    that keeps cells executor-sized at 100 TB. On adversarially isotropic
    data (this fixture) no exact method can prune — the bound degrades
    gracefully to all cell pairs, i.e. the same O(n²) verify work as the
    naive join, but still expressed as hash joins (no cartesian), so AQE
    can split any skewed cell. For a sub-quadratic *approximate* path in
    that regime use ``dedup_embedding_cosine_lsh``.

    ``use_pandas`` switches verification to the Arrow/numpy dot.
    ``train_fraction`` bounds the codebook fit (see ``codebook.py``):
    clustering quality shifts only how much gets pruned, never the
    result, so the fit runs on a driver-collected
    ``sample(train_fraction).limit(cap)`` (numpy Lloyd's, no per-
    iteration Spark jobs); assignment of the full corpus is a single
    Arrow pass with the codebook in the UDF closure.
    """
    import math

    from kinesis_dstream_spark.functions import vectors as V
    from kinesis_dstream_spark.operators.codebook import assign_cells, fit_sampled_kmeans

    spark = embeddings.sparkSession
    normed = embeddings.select(
        "vec_id",
        V.l2_normalize(F.col("embedding").cast("array<double>")).alias("unit"),
    )
    centroids = fit_sampled_kmeans(
        normed, k=n_cells, seed=seed, max_iter=5, train_fraction=train_fraction
    )
    # cached: feeds the radius aggregate and BOTH sides of the pair join
    assigned = assign_cells(normed, centroids).cache()

    chat = []
    for arr in centroids:
        nrm = float(np.linalg.norm(arr))
        chat.append(arr / nrm if nrm > 0 else arr)
    cent_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(chat)],
        "cell int, chat array<double>",
    )

    def _ang(x: float) -> float:
        return math.acos(max(-1.0, min(1.0, x)))

    # per-cell angular radius: one broadcast join + one agg; the collect
    # moves n_cells scalars to the driver (control plane, like
    # dedup_clusters' convergence check) — never row data.
    radius = {
        r["cell"]: _ang(r["min_dot"])
        for r in assigned.join(F.broadcast(cent_df), "cell")
        .groupBy("cell")
        .agg(F.min(V.dot(F.col("unit"), F.col("chat"))).alias("min_dot"))
        .collect()
    }
    theta_t = _ang(threshold)
    eps = 1e-6  # float slack so the bound never prunes a boundary pair
    cells = sorted(radius)  # cells with no members can hold no pairs
    surviving: list[tuple[int, int]] = []
    for pos, i in enumerate(cells):
        for j in cells[pos:]:
            if _ang(float(chat[i] @ chat[j])) - radius[i] - radius[j] <= theta_t + eps:
                # both orders for i≠j: with the a.cell=cell_a ∧ b.cell=cell_b
                # ∧ vec_a<vec_b join, each qualifying pair then matches
                # exactly one orientation — no dedup shuffle needed.
                surviving.append((i, j))
                if i != j:
                    surviving.append((j, i))
    pairs_df = spark.createDataFrame(surviving, "cell_a int, cell_b int")

    a = assigned.select(
        F.col("vec_id").alias("vec_a"),
        F.col("unit").alias("unit_a"),
        F.col("cell").alias("ca"),
    )
    b = assigned.select(
        F.col("vec_id").alias("vec_b"),
        F.col("unit").alias("unit_b"),
        F.col("cell").alias("cb"),
    )
    cands = a.join(F.broadcast(pairs_df), F.col("ca") == F.col("cell_a")).join(
        b, (F.col("cb") == F.col("cell_b")) & (F.col("vec_a") < F.col("vec_b"))
    )
    dot = (
        V.dot_pandas(F.col("unit_a"), F.col("unit_b"))
        if use_pandas
        else V.dot(F.col("unit_a"), F.col("unit_b"))
    )
    return cands.select(
        "vec_a", "vec_b", F.round(dot, 4).alias("cos_sim")
    ).filter(F.col("cos_sim") >= threshold)


def dedup_embedding_cosine_allpairs(
    embeddings: DataFrame, threshold: float = 0.4, use_pandas: bool = False
) -> DataFrame:
    """Naive all-pairs cosine twin — the small-n oracle/test reference.

    One self-join on vec_id< (a cartesian): O(n²) rows through the plan,
    fine for fixtures and pytest ground truth, never the registered path.
    ``dedup_embedding_cosine`` must return exactly this result.
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


def dedup_embedding_cosine_lsh(
    embeddings: DataFrame,
    threshold: float = 0.4,
    n_planes: int = 4,
    n_tables: int = 16,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Sign-LSH near-dup pairs — the sub-quadratic sketch path (E-10).

    OR-amplified multi-table random-hyperplane LSH: ``n_tables``
    independent tables of ``n_planes`` sign bits each; a pair is a
    candidate iff some table buckets it together
    (P = 1−(1−p^planes)^tables with p = 1−θ/π). All tables' buckets come
    from ONE Arrow matmul per batch; the table index is folded into the
    bucket id so candidate generation is a single equi-join on one long
    key (the ``dedup_minhash_lsh`` band trick). Candidates are verified
    with the exact dot product — output pairs are always true near-dups;
    only recall is probabilistic (pytest-bounded vs the exact twin).

    Regime note: hyperplane LSH separates well when near-dups are tight
    (cos ≥ ~0.8, planes rarely split them). At low thresholds on
    isotropic data (this fixture's 0.4) the gap ρ→1 and candidate counts
    approach all-pairs — that regime belongs to the exact metric-pruned
    ``dedup_embedding_cosine``; defaults here (4×16) still give ~94%
    recall on it.
    """
    from pyspark.sql.types import ArrayType, LongType

    from kinesis_dstream_spark.functions import vectors as V

    pows = 1 << np.arange(n_planes)
    offs = np.arange(n_tables, dtype="int64") << n_planes
    # Hyperplanes are derived lazily from the OBSERVED embedding width
    # (seeded, so every executor derives identical planes) rather than a
    # hardcoded dim — a fixture with a different width must bucket
    # correctly, not die in a matmul shape error. An explicit ``dim``
    # turns a mismatch into a clear assertion instead.
    plane_cache: dict[int, np.ndarray] = {}

    def _planes_for(d: int) -> np.ndarray:
        if dim is not None and d != dim:
            raise ValueError(
                f"dedup_embedding_cosine_lsh: embeddings have dim {d}, "
                f"but dim={dim} was requested"
            )
        if d not in plane_cache:
            plane_cache[d] = np.random.RandomState(seed).randn(n_tables * n_planes, d)
        return plane_cache[d]

    @F.pandas_udf(ArrayType(LongType()))
    def buckets_udf(emb: pd.Series) -> pd.Series:
        x = np.stack(emb.to_numpy())
        bits = (x @ _planes_for(x.shape[1]).T >= 0).reshape(len(x), n_tables, n_planes)
        codes = (bits @ pows).astype("int64") + offs  # table folded in
        return pd.Series(list(codes))

    # cached: bucket explode + both verify joins reuse the units
    normed = embeddings.select(
        "vec_id",
        V.l2_normalize(F.col("embedding").cast("array<double>")).alias("unit"),
    ).cache()
    ids = normed.select(
        "vec_id", F.explode(buckets_udf(F.col("unit"))).alias("bucket")
    )
    a = ids.alias("a")
    b = ids.alias("b")
    # id-only candidates: units never ride the bucket join / dedup shuffle
    candidates = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .dropDuplicates(["vec_a", "vec_b"])
    )
    verified = candidates.join(
        normed.select(F.col("vec_id").alias("vec_a"), F.col("unit").alias("unit_a")),
        "vec_a",
    ).join(
        normed.select(F.col("vec_id").alias("vec_b"), F.col("unit").alias("unit_b")),
        "vec_b",
    )
    return verified.select(
        "vec_a",
        "vec_b",
        F.round(V.dot_pandas(F.col("unit_a"), F.col("unit_b")), 4).alias("cos_sim"),
    ).filter(F.col("cos_sim") >= threshold)


def dedup_clusters(pairs: DataFrame, max_iter: int = 30) -> DataFrame:
    """Connected components over a near-dup pair graph (iterative).

    Near-dup *pairs* (from any of the pair operators above) say "these
    two are the same document"; what a pipeline actually needs is the
    transitive closure — one canonical representative per duplicate
    CLUSTER, so A~B, B~C collapses all three. Classic min-label
    propagation: every node starts labeled with its own id; each round
    takes the min of its neighbors' labels; fixpoint = component minimum,
    reached in at most graph-diameter rounds (near-dup components are
    shallow in practice — a handful of rounds).

    Scale notes: each round is one join + one aggregate keyed on node id.
    ``localCheckpoint`` after each round is load-bearing — without it the
    lineage (and thus the physical plan) doubles every iteration.
    Convergence is detected with a single scalar aggregate (sum of
    labels, strictly decreasing until fixpoint) instead of a row-level
    diff. Returns (doc_id, cluster_rep, cluster_size) for every node that
    appears in ≥1 pair.
    """
    edges = (
        pairs.select(F.col("doc_a").alias("s"), F.col("doc_b").alias("d"))
        .union(pairs.select(F.col("doc_b").alias("s"), F.col("doc_a").alias("d")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("s").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("label"))
        .localCheckpoint()
    )
    prev_sum = None
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges["d"] == labels["doc_id"])
            .groupBy("s")
            .agg(F.min("label").alias("nbr_min"))
        )
        labels = (
            labels.join(nbr_min, labels["doc_id"] == nbr_min["s"], "left")
            .select(
                "doc_id",
                F.least(F.col("label"), F.coalesce("nbr_min", "label")).alias("label"),
            )
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return labels.join(sizes, "label").select(
        "doc_id", F.col("label").alias("cluster_rep"), "cluster_size"
    )


def dedup_substring(
    documents: DataFrame, k: int = 8, min_docs: int = 2
) -> DataFrame:
    """Duplicated-span detection: per-document fraction of word k-gram
    positions whose k-gram also occurs in ≥ ``min_docs`` documents —
    the scalable approximation of exact-substring training-data dedup
    (Lee et al., "Deduplicating Training Data Makes Language Models
    Better": suffix-array substring dedup ≈ long-k-gram match).

    Whole-doc dedup misses partially-copied documents (a page quoting a
    boilerplate paragraph); span-level stats catch them. Shape: one
    explode to per-POSITION k-grams (not the distinct shingle set), one
    aggregation shuffle on the gram key for document frequency, one
    equi-join of the gram stream against the duplicated keys, one
    per-doc reaggregation. The gram string itself never rides a
    shuffle — keys are xxhash64(gram) (8 bytes vs ~50; collision odds
    n²/2⁶⁵ are negligible below ~10¹² distinct grams, and a collision
    only perturbs one count, never correctness of the pipeline gate).
    At 100 TB this is the same two-shuffle + equi-join posture as
    ``contamination_check``, except the dup-key side is corpus-derived
    (not broadcastable by definition) — so it stays a shuffle join on
    8-byte keys, the cheapest join this computation can possibly have.

    Returns (doc_id, n_grams, n_dup_grams, dup_frac) for documents with
    at least one duplicated span.
    """
    toks = tokens(F.col("text"))
    # cache the (doc_id, hash) stream: three consumers (df count, per-doc
    # totals, dup join) shuffle on different keys, so without the cache
    # the zip_with shingle chain — per-row interpreted HOFs, the
    # expensive part — would run three times (measured ~2x end-to-end)
    grams = (
        documents.select(
            "doc_id",
            F.explode(word_shingles(toks, k, distinct=False)).alias("gram"),
        )
        .select("doc_id", F.xxhash64("gram").alias("g"))
        .cache()
    )
    dup_keys = (
        grams.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("g")
    )
    totals = grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    dups = (
        grams.join(dup_keys, "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_dup_grams"))
    )
    return totals.join(dups, "doc_id").select(
        "doc_id",
        "n_grams",
        "n_dup_grams",
        F.round(F.col("n_dup_grams") / F.col("n_grams"), 4).alias("dup_frac"),
    )


def dedup_substring_cut(
    documents: DataFrame, k: int = 8, min_docs: int = 2
) -> DataFrame:
    """The ACTION step of substring dedup: remove every word span whose
    k-gram occurs in ≥ ``min_docs`` documents, and report the per-doc
    cut statistics (Lee et al.'s dedup actually rewrites the corpus —
    ``dedup_substring`` only measures it).

    Pipeline: per-position k-grams with positions (posexplode), one
    aggregation shuffle for document frequency, dup positions collected
    per doc, then the cut itself is pure JVM array HOFs — the covered
    token-index set is ``flatten(transform(positions, p → sequence(p,
    p+k-1)))`` and kept tokens are a ``filter`` over the indexed token
    array. No Python in the rewrite path. Keys are the raw grams here
    (not xxhash64) so the DuckDB oracle reproduces the rewrite
    byte-for-byte; the measurement twin documents the hashed-key scale
    variant.
    """
    toks = tokens(F.col("text"))
    base = documents.select("doc_id", toks.alias("t")).filter(F.size("t") > 0)
    grams = base.select(
        "doc_id",
        F.posexplode(word_shingles(F.col("t"), k, distinct=False)).alias("pos0", "gram"),
    ).select("doc_id", (F.col("pos0") + 1).alias("p"), "gram")
    dup_keys = (
        grams.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("gram")
    )
    dup_pos = (
        grams.join(dup_keys, "gram")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("p")).alias("dup_starts"))
    )
    joined = base.join(dup_pos, "doc_id", "left").select(
        "doc_id",
        "t",
        F.coalesce("dup_starts", F.array().cast("array<int>")).alias("dup_starts"),
    )
    n = F.size("t")
    # a short doc (< k tokens) collapses to ONE whole-doc gram: its span
    # covers every token, mirrored by capping sequence() at n
    covered = F.array_distinct(
        F.flatten(
            F.transform(
                F.col("dup_starts"),
                lambda p: F.sequence(p, F.least(p + F.lit(k - 1), n)),
            )
        )
    )
    kept = F.filter(
        F.zip_with(F.col("t"), F.sequence(F.lit(1), n), lambda tok, i: F.struct(tok.alias("tok"), i.alias("i"))),
        lambda s: ~F.array_contains(covered, s["i"]),
    )
    return joined.select(
        "doc_id",
        n.alias("n_tokens"),
        F.size(covered).alias("n_removed"),
        F.concat_ws(" ", F.transform(kept, lambda s: s["tok"])).alias("kept_text"),
    )


def dedup_clusters_star(
    pairs: DataFrame, max_iter: int = 20, stats: dict | None = None
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    rounds (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — the round-bounded twin of ``dedup_clusters``.

    Min-label propagation needs O(graph diameter) full-edge rounds: a
    chain of n near-identical documents (common on boilerplate crawls —
    each page ~= the next) costs n rounds of join+agg. The star
    operations instead REWRITE the edge set each round: large-star hangs
    every larger neighbor directly off its neighborhood minimum,
    small-star flattens the smaller neighbors, and alternating the two
    halves the effective height — convergence in O(log n) rounds on any
    topology. Each round is the same one-join-one-agg shape as a
    min-label round, so the per-round cost is identical; only the round
    COUNT changes (pytest pins ~log₂ rounds vs the chain length, and
    label-for-label equality with ``dedup_clusters``).

    Fixpoint: the edge set is a star forest — every node points at its
    component minimum. Detected by the (count, Σsrc, Σdst) triple going
    stationary; the triple strictly shrinks lexicographically while any
    rewrite happens (dst labels only ever decrease), the same scalar
    convergence trick the min-label loop uses. ``stats``, when passed,
    receives {"rounds": n} for observability.

    Returns (doc_id, cluster_rep, cluster_size), identical contract and
    values to ``dedup_clusters``.
    """
    # Directed working set, kept ORIENTED (v < u after normalization /
    # after every small-star): then edges and swap(edges) are disjoint by
    # construction, so the symmetric closure needs NO distinct — that
    # dedup was a full extra shuffle per round.
    edges = (
        pairs.select(
            F.greatest("doc_a", "doc_b").alias("u"),
            F.least("doc_a", "doc_b").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    prev_sig = None
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # --- large-star: ∀u, m = min(Γ(u) ∪ {u}); emit (v, m) ∀v ∈ Γ(u), v > u
        sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least(F.col("u"), F.col("mv")).alias("m"))
        )
        # cache (not checkpoint): `large` feeds BOTH the min aggregate
        # and the rewrite join below, and caching makes the shared
        # subtree compute once inside the round's single materializing
        # job — an eager checkpoint here was a whole extra job per round
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
            .cache()
        )
        # --- small-star: edges now all point down (v < u); ∀u over its
        # smaller neighbors N, m = min(N); emit (u, m) and (v, m) ∀v ∈ N\{m}
        mins2 = large.groupBy("u").agg(F.min("v").alias("m"))
        edges = (
            large.join(mins2, "u")
            .select(
                F.when(F.col("v") == F.col("m"), F.col("u"))
                .otherwise(F.col("v"))
                .alias("u"),
                F.col("m").alias("v"),
            )
            .distinct()
            # lazy: the signature aggregate right below is the round's
            # one materializing action — it computes the round AND pins
            # the checkpoint blocks in the same job
            .localCheckpoint(eager=False)
        )
        sig = tuple(
            edges.agg(
                F.count("*"), F.sum("u"), F.sum("v")
            ).collect()[0]
        )
        large.unpersist()
        if sig == prev_sig:
            break
        prev_sig = sig
    if stats is not None:
        stats["rounds"] = rounds
    # star forest → labels: members point at their root; roots label themselves
    members = edges.select(F.col("u").alias("doc_id"), F.col("v").alias("label"))
    roots = (
        edges.select("v")
        .distinct()
        .select(F.col("v").alias("doc_id"), F.col("v").alias("label"))
    )
    labels = members.union(roots).distinct()
    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return labels.join(sizes, "label").select(
        "doc_id", F.col("label").alias("cluster_rep"), "cluster_size"
    )


def dedup_edit_distance(
    documents: DataFrame, prefix_len: int = 32, max_dist: int = 60
) -> DataFrame:
    """Fuzzy dedup: Levenshtein-verified pairs via prefix blocking.

    Classic blocking-key design: candidates must share their first
    ``prefix_len`` characters (an equi-join — distributes like any hash
    join), then the quadratic edit-distance only runs on the tiny
    candidate set. At 100 TB the blocking key is the knob: longer
    prefixes → fewer candidates → lower recall, and multiple passes with
    different keys (prefix, suffix, sorted-token prefix) union their
    candidates. ``levenshtein`` is a native JVM expression, called with
    the threshold argument so the DP early-exits once a pair provably
    exceeds ``max_dist`` (returns -1 there; exact distance otherwise —
    measured ~25% faster on the fixture, and the win grows with doc
    length since the bounded DP is O(len·max_dist), not O(len²)).
    """
    b = documents.select(
        "doc_id", "text", F.substring("text", 1, prefix_len).alias("blk")
    )
    a, c = b.alias("a"), b.alias("b")
    return (
        a.join(
            c,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.levenshtein(F.col("a.text"), F.col("b.text"), max_dist).alias("edit_dist"),
        )
        .filter(F.col("edit_dist") >= 0)
    )


def _setsim_prefix_index(ex: DataFrame, t_num: int, t_den: int) -> DataFrame:
    """The rarity-first PPJoin prefix index over exploded shingle rows:
    per doc, the first |s| − ceil(t·|s|) + 1 shingles in (df asc,
    shingle) order — the only rows the candidate self-join touches."""
    from pyspark.sql import Window

    dfreq = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    wdoc = Window.partitionBy("doc_id")
    ranked = (
        ex.join(dfreq, "shingle")
        .withColumn("sz", F.count(F.lit(1)).over(wdoc))
        .withColumn("pos", F.row_number().over(wdoc.orderBy("df", "shingle")))
    )
    # prefix length |s| − ceil(t·|s|) + 1, all-integer ceil
    plen = (
        F.col("sz")
        - F.expr(f"(CAST({t_num} AS BIGINT) * sz + {t_den - 1}) div {t_den}")
        + F.lit(1)
    )
    return ranked.filter(F.col("pos") <= plen).select(
        "doc_id", "shingle", "sz", "pos"
    )


def setsim_prefix_cap_stats(
    documents: DataFrame,
    k: int = 3,
    t_num: int = 3,
    t_den: int = 5,
    max_key_rows: int = 8,
) -> DataFrame:
    """Circuit-breaker accounting for the PPJoin prefix index: one row
    of (n_prefix_keys, n_hot_keys, n_prefix_rows, n_dropped_rows) at
    the given per-key cap. ``n_hot_keys > 0`` means a capped
    ``dedup_setsim_prefix(..., max_key_rows=...)`` run has tripped the
    breaker and its output is a lower bound (pairs whose only shared
    prefix keys were hot are not generated) — the monitoring signal
    that a corpus has degenerated toward near-identical (the hazard
    the module docstring names).

    Plan: the prefix index build (one shingle join + per-doc window),
    one group-by on shingle, one scalar rollup — no pair stage at all,
    so the report itself is safe to run on exactly the corpora that
    would blow the uncapped join up.
    """
    ex = _shingle_sets(documents, k).select(
        "doc_id", F.explode("shingles").alias("shingle")
    )
    prefix = _setsim_prefix_index(ex, t_num, t_den)
    key_rows = prefix.groupBy("shingle").agg(F.count(F.lit(1)).alias("pk_rows"))
    hot = F.col("pk_rows") > max_key_rows
    return key_rows.agg(
        F.count(F.lit(1)).alias("n_prefix_keys"),
        F.sum(F.when(hot, 1).otherwise(0)).alias("n_hot_keys"),
        F.sum("pk_rows").alias("n_prefix_rows"),
        F.sum(F.when(hot, F.col("pk_rows")).otherwise(F.lit(0))).alias(
            "n_dropped_rows"
        ),
    )


def dedup_setsim_prefix(
    documents: DataFrame,
    k: int = 3,
    t_num: int = 3,
    t_den: int = 5,
    max_key_rows: int | None = None,
) -> DataFrame:
    """Exact Jaccard self-join via AllPairs/PPJoin PREFIX filtering —
    the third index strategy in the tier (vs the df-CAP inverted index
    of ``dedup_ngram_jaccard`` and the probabilistic MinHash bands):
    pairs with shingle-set Jaccard ≥ t (= t_num/t_den), over the FULL
    uncapped shingle vocabulary, with integer-exact semantics
    (``jac_ppm`` = trunc(10⁶·|∩|/|∪|), no float round at the boundary).

    The prefix theorem (Chaudhuri et al., SSJoin; Bayardo et al.,
    AllPairs): fix any global total order on shingles; if
    J(A,B) ≥ t then |A∩B| ≥ ceil(t·max(|A|,|B|)), so the first
    p_s = |s| − ceil(t·|s|) + 1 shingles of EACH set (in that order)
    must share at least one element. Only those prefixes enter the
    inverted index — at t=0.6 the index holds ≤ ~40% of shingle rows,
    and because the order is rarity-first (df asc, shingle asc) the
    indexed shingles are the LOW-df tail, so candidate fan-out per join
    key is naturally small. Exactness does not depend on the order
    being consistent anywhere but inside this one job (any total order
    satisfies the lemma), so there is no cross-engine collation hazard;
    the oracle twin is the direct all-pairs definition.

    Three exactness-preserving prunes compose: the prefix index (only
    |s| − ceil(t·|s|) + 1 rarity-first shingles are indexed), the
    length filter (t·max ≤ min), and the PPJoin positional filter
    (the match-position overlap bound — see the inline comment).

    vs the df-cap index: the cap bounds the WORST-case key quadratically
    but changes the vocabulary (exact only w.r.t. the capped sets); the
    prefix index keeps the textbook-exact semantics and shrinks the
    typical case, but a corpus of near-identical documents can still
    concentrate candidates.

    Worst-case circuit breaker (r9, ``max_key_rows``): with the default
    ``None`` the join is textbook-exact (the oracle-gated path). Set it
    to drop prefix-index KEYS whose row count exceeds the cap before
    the self-join — per-key candidate generation is then bounded by
    max_key_rows²/2 no matter how degenerate the corpus (100 identical
    docs would otherwise put every doc under the same rare shingles).
    The cap applies to candidate GENERATION only; surviving candidates
    are verified uncapped-exact, so emitted pairs are always true
    positives — what the cap can cost is pairs whose ONLY shared
    prefix keys were hot (on a truly near-identical corpus those pairs
    are genuinely quadratic in number, which is exactly the blow-up
    being refused). ``setsim_prefix_cap_stats`` reports how much the
    cap dropped so ops can see when the breaker has tripped.

    Plan at 100 TB: df attach is a shingle-keyed join (linear per-key
    fan-out — AQE skew split applies cleanly, no pair blowup); the
    per-doc rank window partitions by doc_id (bounded by document
    length); the candidate self-join keys on prefix shingles; the
    verify join rescans only candidate docs' shingle rows. Verification
    cost tracks true near-dup density, not n².
    """
    from pyspark.sql import Window

    # cached: feeds the df aggregate, both prefix-join sides, and the
    # two verify-side rescans — five consumers of one explode
    # localCheckpoint (not .cache()): blocks are released when the
    # DataFrame goes out of scope (ContextCleaner), so registry sweeps
    # composing several dedup generators don't accumulate pinned
    # storage across queries the way an un-unpersisted cache does.
    ex = (
        _shingle_sets(documents, k)
        .select("doc_id", F.explode("shingles").alias("shingle"))
        .localCheckpoint(eager=True)
    )
    prefix = _setsim_prefix_index(ex, t_num, t_den)
    if max_key_rows is not None:
        key_rows = prefix.groupBy("shingle").agg(
            F.count(F.lit(1)).alias("_pk_rows")
        )
        prefix = (
            prefix.join(key_rows, "shingle")
            .filter(F.col("_pk_rows") <= max_key_rows)
            .drop("_pk_rows")
        )
    a, b = prefix.alias("a"), prefix.alias("b")
    # POSITIONAL filter (the PPJoin upgrade over AllPairs): a match on
    # the shared token at prefix positions (pa, pb) bounds the whole
    # intersection by 1 + min(|A|−pa, |B|−pb) (everything before the
    # match in either prefix is, by the shared order, provably outside
    # the other set's remainder); J ≥ t needs inter ≥ ceil(t·(|A|+|B|)
    # /(1+t)), so candidates whose positional bound falls short die
    # BEFORE the verify join — exactness preserved (Xiao et al.,
    # PPJoin), candidate count strictly shrinks (pytest-pinned).
    pos_bound = F.lit(1) + F.least(
        F.col("a.sz") - F.col("a.pos"), F.col("b.sz") - F.col("b.pos")
    )
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # length filter: J ≤ min/max, so t·max ≤ min is necessary
            & (
                t_den * F.least(F.col("a.sz"), F.col("b.sz"))
                >= t_num * F.greatest(F.col("a.sz"), F.col("b.sz"))
            )
            & (
                (t_num + t_den) * pos_bound
                >= t_num * (F.col("a.sz") + F.col("b.sz"))
            ),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sz").alias("n_a"),
            F.col("b.sz").alias("n_b"),
        )
        .distinct()
    )
    ta = ex.select(F.col("doc_id").alias("doc_a"), "shingle")
    tb = ex.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(ta, "doc_a")
        .join(tb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    union = F.col("n_a") + F.col("n_b") - F.col("n_inter")
    return inter.filter(t_den * F.col("n_inter") >= t_num * union).select(
        "doc_a",
        "doc_b",
        "n_a",
        "n_b",
        "n_inter",
        F.expr("CAST((n_inter * 1000000) div (n_a + n_b - n_inter) AS BIGINT)").alias(
            "jac_ppm"
        ),
    )


def _global_rank(df: DataFrame, cols: list[str], rank_col: str) -> DataFrame:
    """Scalable global row_number over ``cols`` (which must include a
    unique tiebreaker, so the order is total): range-partition on the
    order columns, rank locally, add per-partition offsets. This is the
    2-pass pattern that replaces ``Window.orderBy(...)`` — whose plan is
    a SINGLE-partition sort, the canonical driver-shaped bottleneck at
    scale. The offsets table is ≤ numPartitions rows (a scalar-bounded
    collect, same class as codebook samples); rank values are invariant
    to where the range boundaries fall because they equal the row's
    position in the total order.

    CRITICAL (r9 fix): ``repartitionByRange`` samples its range
    boundaries per JOB (the reservoir sample is re-seeded from the RDD
    id), so without pinning, the counts job and every consuming job can
    see DIFFERENT partitionings — offsets computed against one
    partitioning applied to another duplicate/skip ranks (reproduced at
    200k rows: 6644 duplicate ranks). ``localCheckpoint`` materializes
    the partitioned+locally-ranked rows ONCE so offsets and consumers
    read the same physical partitioning; the checkpoint also truncates
    lineage for downstream self-joins.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    n_parts = spark.sparkContext.defaultParallelism
    part = df.repartitionByRange(n_parts, *cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    local = part.withColumn(
        "_lrn", F.row_number().over(Window.partitionBy("_pid").orderBy(*cols))
    ).localCheckpoint(eager=True)
    counts = sorted(
        (r["_pid"], r["_c"])
        for r in local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c")).collect()
    )
    offs, acc = [], 0
    for pid, c in counts:
        offs.append((pid, acc))
        acc += c
    odf = spark.createDataFrame(offs, "_pid int, _off long")
    return (
        local.join(F.broadcast(odf), "_pid")
        .withColumn(rank_col, F.col("_lrn") + F.col("_off"))
        .drop("_pid", "_lrn", "_off")
    )


def _global_cumsum(
    df: DataFrame, order_cols: list[str], val_col: str, out_col: str
) -> DataFrame:
    """Scalable global INCLUSIVE running sum of ``val_col`` down the
    total order ``order_cols`` — the summing sibling of
    ``_global_rank`` (same 2-pass shape, same r9 pinning rule: the
    range-partitioned locally-cumsummed rows are localCheckpoint-ed so
    the per-partition offset totals and every consumer read ONE
    physical partitioning). Offsets are ≤ numPartitions int64s."""
    from pyspark.sql import Window

    spark = df.sparkSession
    n_parts = spark.sparkContext.defaultParallelism
    part = df.repartitionByRange(n_parts, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    local = part.withColumn(
        "_lcum",
        F.sum(val_col).over(
            Window.partitionBy("_pid")
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).localCheckpoint(eager=True)
    sums = sorted(
        (r["_pid"], r["_s"])
        for r in local.groupBy("_pid").agg(F.sum(val_col).alias("_s")).collect()
    )
    offs, acc = [], 0
    for pid, sv in sums:
        offs.append((pid, acc))
        acc += int(sv)
    odf = spark.createDataFrame(offs, "_pid int, _off long")
    return (
        local.join(F.broadcast(odf), "_pid")
        .withColumn(out_col, F.col("_lcum") + F.col("_off"))
        .drop("_pid", "_lcum", "_off")
    )


def dedup_sorted_neighborhood(
    documents: DataFrame,
    window: int = 4,
    key_len: int = 24,
    k: int = 3,
    t_num: int = 3,
    t_den: int = 5,
) -> DataFrame:
    """Sorted-neighborhood entity resolution (Hernández & Stolfo):
    sort the corpus by a blocking key (here the normalized text
    prefix), compare each record only to its ``window`` successors in
    that order, verify candidates with exact shingle Jaccard ≥
    t_num/t_den. The classic complement to hash blocking: near-dups
    whose edits are NOT in the prefix sort adjacently and surface even
    when no equi-join key survives the noise; multi-pass with other
    keys (suffix, sorted-token prefix) unions candidates.

    Scale shape: the global order comes from ``_global_rank`` (range
    partition + local rank + broadcast offsets — no single-partition
    window); the neighborhood join is ``window`` perfectly-balanced
    equi-joins in one plan (explode j∈1..w, join rank+j == rank — every
    join key is unique, so no skew is even possible); the verify join
    rescans only candidate docs' shingle rows. Candidate count is
    exactly w·(n−w) + w·(w−1)/2 ≈ w·n — linear in the corpus by
    construction, the whole point of the method.

    Output matches ``dedup_setsim_prefix``'s integer-exact convention
    (jac_ppm trunc division) so downstream cluster/survivorship
    consumers can union the two candidate generators.
    """
    pairs = _nbhd_candidate_pairs(documents, _nbhd_key_prefix(key_len), window)
    return _verify_shingle_jaccard(documents, pairs, k, t_num, t_den)


def _nbhd_key_prefix(key_len: int):
    """Pass-1 blocking key: prefix of the whitespace-normalized text."""
    norm = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    return F.lower(F.substring(norm, 1, key_len))


def _nbhd_key_suffix(key_len: int):
    """Pass-2 blocking key: prefix of the REVERSED normalized text
    (= suffix blocking). reverse-then-substr instead of a negative
    substr start because Spark and DuckDB disagree on negative-start
    semantics for short strings.

    Codepoint-safety (r9-ADVICE): ``reverse`` itself is NOT
    engine-identical on arbitrary Unicode — Spark reverses by
    codepoint while DuckDB reverses by grapheme CLUSTER, so any
    combining sequence (e.g. e + U+0301) diverges. The key therefore
    reverses only the printable-ASCII projection of the text
    (non-ASCII codepoints stripped first — regex char classes are
    codepoint-identical in both engines), which is exact on normalized
    ASCII corpora like the fixture and deterministic-and-identical on
    any corpus. Blocking keys only GENERATE candidates (the shingle
    verify decides), so projecting the key never affects correctness —
    only which near-misses land adjacent; a production corpus wanting
    suffix blocking on non-Latin text would NFC-normalize and reverse
    by grapheme in BOTH engines instead."""
    norm = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    ascii_only = F.regexp_replace(norm, r"[^\x20-\x7e]", "")
    return F.lower(F.substring(F.reverse(ascii_only), 1, key_len))


def _nbhd_key_tokens(key_len: int):
    """Pass-3 blocking key: prefix of the SORTED-token join — the
    word-order-insensitive sort key (Hernández & Stolfo's classic
    third pass). Recovers near-dups whose edits are pure reorders
    touching BOTH text ends, which defeat the prefix AND suffix keys
    simultaneously. Engine parity: tokens are sorted on the
    printable-ASCII projection because Spark compares strings by
    UTF-16 code unit while DuckDB compares UTF-8 bytes — orders that
    diverge for astral codepoints; on ASCII they are the same binary
    order."""
    ascii_only = F.regexp_replace(F.col("text"), r"[^\x20-\x7e]", "")
    norm = F.trim(F.regexp_replace(ascii_only, r"\s+", " "))
    return F.lower(
        F.substring(F.concat_ws(" ", F.sort_array(F.split(norm, " "))), 1, key_len)
    )


def _nbhd_candidate_pairs(
    documents: DataFrame, key_expr, window: int
) -> DataFrame:
    """One sorted-neighborhood pass: global rank by (key, doc_id) via
    the 2-pass range-partitioned rank, then ``window`` unique-key
    equi-joins (rank+j == rank — skew impossible). Exactly
    w·n − w(w+1)/2 candidate pairs."""
    keyed = documents.select("doc_id", key_expr.alias("bk"))
    ranked = _global_rank(keyed, ["bk", "doc_id"], "r").select("doc_id", "r")
    spark = documents.sparkSession
    js = spark.range(1, window + 1).select(F.col("id").alias("j"))
    probes = ranked.crossJoin(F.broadcast(js)).select(
        F.col("doc_id").alias("id_a"), (F.col("r") + F.col("j")).alias("r2")
    )
    return probes.join(
        ranked.select(F.col("doc_id").alias("id_b"), F.col("r").alias("r2")), "r2"
    ).select(
        F.least("id_a", "id_b").alias("doc_a"),
        F.greatest("id_a", "id_b").alias("doc_b"),
    )


def _verify_shingle_jaccard(
    documents: DataFrame,
    pairs: DataFrame,
    k: int,
    t_num: int,
    t_den: int,
    ex: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-Jaccard verify over a candidate pair list —
    rescans only candidate docs' shingle rows; integer-exact jac_ppm.
    Pass a prebuilt exploded shingle table ``ex`` to share ONE
    materialization across composed generators (the agreement report)."""
    # localCheckpoint (not .cache()): blocks are released when the
    # DataFrame goes out of scope (ContextCleaner), so registry sweeps
    # composing several dedup generators don't accumulate pinned
    # storage across queries the way an un-unpersisted cache does.
    if ex is None:
        ex = (
            _shingle_sets(documents, k)
            .select("doc_id", F.explode("shingles").alias("shingle"))
            .localCheckpoint(eager=True)
        )
    sz = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        pairs.join(ex.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a")
        .join(ex.select(F.col("doc_id").alias("doc_b"), "shingle"), ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        inter.join(sz.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("n_a")), "doc_a")
        .join(sz.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("n_b")), "doc_b")
    )
    union = F.col("n_a") + F.col("n_b") - F.col("n_inter")
    return out.filter(t_den * F.col("n_inter") >= t_num * union).select(
        "doc_a",
        "doc_b",
        "n_a",
        "n_b",
        "n_inter",
        F.expr("CAST((n_inter * 1000000) div (n_a + n_b - n_inter) AS BIGINT)").alias(
            "jac_ppm"
        ),
    )


def sorted_neighborhood_accounting(
    documents: DataFrame,
    window: int = 4,
    key_len: int = 24,
    keys: tuple[str, ...] = ("prefix", "suffix", "tokens"),
) -> DataFrame:
    """Pre-flight accounting for the sorted-neighborhood passes (r11,
    r10 verdict task 5 — the PPJoin trip-accounting discipline applied
    to the rank-window generator). One row per blocking key with:

    - ``n_docs`` / ``n_keys`` / ``max_block`` (largest identical-key
      block — the sorted-token key's degenerate case on
      near-duplicate-heavy corpora where many docs share one token
      multiset);
    - ``n_candidates``: the EXACT pair count the pass will emit. With
      t = min(w, n−1) it is t·n − t(t+1)/2 — a closed form in n alone,
      INDEPENDENT of key skew, because the neighborhood join runs on
      the total (bk, doc_id) rank, not on key equality: a
      million-doc identical-key block still contributes exactly w
      successors per rank. Candidate blowup is therefore structurally
      impossible (unlike equi-join blocking, where a block of size b
      costs C(b,2)) — this is the proof the PPJoin-style circuit
      breaker is NOT needed here, now oracle-certified per corpus;
    - ``blocks_over_window`` / ``missed_intra_pairs``: the flip side —
      key skew costs RECALL, not compute. A block of size b > w+1
      holds C(b,2) true intra-block pairs but the window only
      generates t·b − t(t+1)/2 of them (t = min(w, b−1)); the sum of
      the shortfalls is the exact upper bound on same-key pairs the
      pass can miss, the number an operator raises ``window`` (or adds
      a pass) to drive down.

    Plan: per key, one projection + one (bk) count + one scalar
    aggregate — three corpus scans total for the default key set, no
    joins, no windows.
    """
    key_fns = {
        "prefix": _nbhd_key_prefix,
        "suffix": _nbhd_key_suffix,
        "tokens": _nbhd_key_tokens,
    }
    w = int(window)
    out = None
    for kind in keys:
        blocks = (
            documents.select(key_fns[kind](key_len).alias("bk"))
            .groupBy("bk")
            .agg(F.count(F.lit(1)).alias("b"))
        )
        # integer-exact: b(b-1) and t(t+1) are consecutive-int products
        # (always even), so trunc-div by 2 is exact in both engines
        missed = F.expr(
            f"b * (b - 1) div 2 - (least({w}, b - 1) * b "
            f"- least({w}, b - 1) * (least({w}, b - 1) + 1) div 2)"
        )
        row = (
            blocks.agg(
                F.sum("b").cast("long").alias("n_docs"),
                F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.max("b").cast("long").alias("max_block"),
                F.sum(
                    F.when(F.col("b") > w + 1, F.lit(1)).otherwise(F.lit(0))
                ).cast("long").alias("blocks_over_window"),
                F.sum(missed).cast("long").alias("missed_intra_pairs"),
            )
            .withColumn("kind", F.lit(kind))
            .withColumn(
                "n_candidates",
                F.expr(
                    f"CAST(least({w}, n_docs - 1) * n_docs "
                    f"- least({w}, n_docs - 1) * (least({w}, n_docs - 1) + 1) "
                    f"div 2 AS BIGINT)"
                ),
            )
            .select(
                "kind", "n_docs", "n_keys", "max_block",
                "blocks_over_window", "missed_intra_pairs", "n_candidates",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def dedup_sorted_neighborhood_multipass(
    documents: DataFrame,
    window: int = 4,
    key_len: int = 24,
    k: int = 3,
    t_num: int = 3,
    t_den: int = 5,
    keys: tuple[str, ...] = ("prefix", "suffix"),
) -> DataFrame:
    """Multi-pass sorted-neighborhood ER (Hernández & Stolfo's full
    recipe): UNION the candidate pairs of two independent sort passes —
    the text-prefix key and the text-suffix key (reversed-text prefix)
    — then verify once with exact shingle Jaccard. The second pass is
    what closes the single-pass blind spot: a near-dup whose edit falls
    INSIDE the prefix key lands far away in the prefix sort but stays
    adjacent in the suffix sort (and vice versa); any pair whose edits
    hit both key regions is the residual miss that a third pass
    (e.g. sorted-token key) would target.

    Scale shape: each pass is the linear-candidate neighborhood join
    (w·n pairs, skew-free unique-rank equi-joins); the union carries
    2·w·n candidate rows (distinct-deduped before verify so a pair
    found by both passes is verified once); the verify rescans only
    candidate docs' shingle rows. Cost is pass count × one corpus
    sort — exactly the multi-pass economics the generator-agreement
    report quantifies.

    Output schema matches the single-pass (the convention all dedup
    generators share) so downstream union/cluster consumers are
    interchangeable.

    ``keys`` picks the passes: 'prefix' / 'suffix' / 'tokens' (the
    sorted-token third pass, r10 — the residual-miss class the r9
    docstring named: edits hitting both key regions, i.e. pure
    reorders, stay adjacent under the token sort). Each extra pass is
    one more corpus sort; the verify is shared.
    """
    key_fns = {
        "prefix": _nbhd_key_prefix,
        "suffix": _nbhd_key_suffix,
        "tokens": _nbhd_key_tokens,
    }
    passes = [
        _nbhd_candidate_pairs(documents, key_fns[kind](key_len), window)
        for kind in keys
    ]
    pairs = passes[0]
    for p in passes[1:]:
        pairs = pairs.unionByName(p)
    return _verify_shingle_jaccard(documents, pairs.distinct(), k, t_num, t_den)


def near_dup_generator_agreement(
    documents: DataFrame,
    ngram_pairs: DataFrame | None = None,
    setsim_pairs: DataFrame | None = None,
) -> DataFrame:
    """Ablation report over the FOUR candidate-generation strategies
    (df-capped inverted index / rarity-ordered prefix index / sorted
    neighborhood by text prefix / sorted neighborhood by text suffix):
    Venn counts of the pair sets each emits at its own threshold. The
    ER-ops question this answers is "which blocking strategy is earning
    its keep" — a region like (ngram=1, setsim=1, nbhd=0, sfx=0) counts
    near-dups whose edits fall inside BOTH neighborhood keys, while
    (1, 1, 0, 1) isolates the prefix-pass blind spot that the r9 suffix
    pass recovers (edit inside the prefix key → far in the prefix sort,
    adjacent in the suffix sort). Production multi-pass ER unions
    generators; this report is the evidence for which passes to keep at
    100 TB, where each pass is a real scan.

    Plan: the four generators run as-is (each sub-quadratic by its
    own index argument), then three pair-keyed full outer joins and one
    16-region rollup — the joins carry only candidate pairs, never
    corpus rows.

    Artifact serving (r10): callers holding FRESH persisted pair
    artifacts (``pairs_store.near_dup_pairs_ensure`` /
    ``setsim_pairs_ensure`` — fingerprint-validated at build) pass
    them as ``ngram_pairs`` / ``setsim_pairs`` and the report reads
    the tiny pair parquet instead of re-running the two corpus-scan
    generators — the rows are identical by the store contract (the
    artifact IS the operator's output, pytest-pinned), so the oracle
    is unchanged. Left None, the generators run live (the staleness
    fallback — same rows, full price).
    """
    g1 = (ngram_pairs if ngram_pairs is not None else dedup_ngram_jaccard(documents)).select(
        "doc_a", "doc_b", F.lit(1).alias("in_ngram")
    )
    g2 = (setsim_pairs if setsim_pairs is not None else dedup_setsim_prefix(documents)).select(
        "doc_a", "doc_b", F.lit(1).alias("in_setsim")
    )
    # the two neighborhood passes share ONE shingle explode and ONE
    # verify: the verify predicate is per-pair (independent of which
    # pass generated the candidate), so verified(p1 ∪ p2) ∩ pX ==
    # verified(pX) — tag candidate membership, verify the union once,
    # split by tag (r9: cuts two of the report's three duplicate
    # explode+verify stages)
    ex = (
        _shingle_sets(documents, 3)
        .select("doc_id", F.explode("shingles").alias("shingle"))
        .localCheckpoint(eager=True)
    )
    p1 = _nbhd_candidate_pairs(documents, _nbhd_key_prefix(24), 4)
    p2 = _nbhd_candidate_pairs(documents, _nbhd_key_suffix(24), 4)
    tagged = (
        p1.select("doc_a", "doc_b", F.lit(1).alias("p1"), F.lit(0).alias("p2"))
        .unionByName(
            p2.select("doc_a", "doc_b", F.lit(0).alias("p1"), F.lit(1).alias("p2"))
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.max("p1").alias("p1"), F.max("p2").alias("p2"))
        .localCheckpoint(eager=True)
    )
    verified = _verify_shingle_jaccard(
        documents, tagged.select("doc_a", "doc_b"), 3, 3, 5, ex=ex
    ).join(tagged, ["doc_a", "doc_b"])
    g3 = verified.filter(F.col("p1") == 1).select(
        "doc_a", "doc_b", F.lit(1).alias("in_nbhd")
    )
    g4 = verified.filter(F.col("p2") == 1).select(
        "doc_a", "doc_b", F.lit(1).alias("in_nbhd_sfx")
    )
    full = (
        g1.join(g2, ["doc_a", "doc_b"], "full")
        .join(g3, ["doc_a", "doc_b"], "full")
        .join(g4, ["doc_a", "doc_b"], "full")
        .select(
            F.coalesce("in_ngram", F.lit(0)).alias("in_ngram"),
            F.coalesce("in_setsim", F.lit(0)).alias("in_setsim"),
            F.coalesce("in_nbhd", F.lit(0)).alias("in_nbhd"),
            F.coalesce("in_nbhd_sfx", F.lit(0)).alias("in_nbhd_sfx"),
        )
    )
    return full.groupBy("in_ngram", "in_setsim", "in_nbhd", "in_nbhd_sfx").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


def sentence_dedup_stats(documents: DataFrame) -> DataFrame:
    """Corpus-level sentence-grain dedup accounting per source — the
    CCNet/RefinedWeb "paragraph dedup" stage at this fixture's segment
    grain (the fixture has no newlines, so the segmenter is the shared
    ``[.!?]+`` sentence rule from ``text.sentence_stats``). Document
    dedup (MinHash/SimHash/…) removes whole near-copies; the remaining
    repetition in web corpora is SEGMENT-level — boilerplate sentences
    (nav bars, cookie banners, license blurbs) pasted across otherwise
    distinct pages — and removing it is a standard pretraining-corpus
    pass (CCNet does it before the LM filter).

    Keeper rule, fully deterministic: every occurrence of a sentence is
    ranked by (doc_id, position) and only the global first survives;
    an occurrence is REMOVABLE iff its rank > 1. No tie exists because
    (doc_id, pos) is unique per occurrence. Per source this reports
    occurrence volume, removable occurrences/chars (what a rewrite
    would actually drop), removable ppm, and how many documents are
    touched — the numbers a curation team reads to decide whether the
    pass pays for itself on a given source.

    Plan: ONE corpus-grain shuffle keyed on sentence text (the
    row_number window), then a per-source aggregate. The hot-key bound
    is the count of the single most-pasted sentence — the window does
    no global sort, and a per-key rank over even a 10⁶-copy banner is
    a single partition's linear pass. (A count-only variant would
    avoid the rank entirely but cannot attribute removable CHARS to
    sources, which is the column that prices the rewrite.)
    """
    segs = documents.select(
        "doc_id",
        "source",
        F.filter(
            F.transform(F.split(F.col("text"), r"[.!?]+"), lambda s: F.trim(s)),
            lambda s: s != "",
        ).alias("ss"),
    )
    occ = segs.select("doc_id", "source", F.posexplode("ss").alias("pos", "sent"))
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy("sent").orderBy("doc_id", "pos")
    )
    flagged = occ.withColumn("rn", rn)
    return (
        flagged.groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_sentences"),
            F.sum((F.col("rn") > 1).cast("long")).alias("removable"),
            F.sum(
                F.when(F.col("rn") > 1, F.length("sent")).otherwise(0)
            ).alias("removable_chars"),
            F.countDistinct(
                F.when(F.col("rn") > 1, F.col("doc_id"))
            ).alias("docs_affected"),
        )
        .select(
            "source",
            "n_docs",
            "n_sentences",
            "removable",
            "removable_chars",
            "docs_affected",
            F.expr("removable * 1000000 div n_sentences").alias(
                "removable_ppm"
            ),
        )
    )


SENTENCE_DEDUP_STATS_SQL = """
WITH segs AS (
  SELECT doc_id, source,
         list_filter(list_transform(regexp_split_to_array(text, '[.!?]+'),
                                    s -> trim(s)),
                     s -> s <> '') AS ss
  FROM documents
), occ AS (
  SELECT doc_id, source,
         unnest(generate_series(1, len(ss))) AS pos, unnest(ss) AS sent
  FROM segs
), flagged AS (
  SELECT doc_id, source, sent,
         row_number() OVER (PARTITION BY sent ORDER BY doc_id, pos) AS rn
  FROM occ
)
SELECT source,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_sentences,
       CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS removable,
       CAST(sum(CASE WHEN rn > 1 THEN len(sent) ELSE 0 END) AS BIGINT)
         AS removable_chars,
       CAST(count(DISTINCT CASE WHEN rn > 1 THEN doc_id END) AS BIGINT)
         AS docs_affected,
       CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS removable_ppm
FROM flagged GROUP BY source
"""


def sentence_dedup_rewrite(documents: DataFrame) -> DataFrame:
    """The ACTIONABLE half of ``sentence_dedup_stats``: actually
    rebuild each document with its removable sentence occurrences
    dropped (global (doc_id, pos)-first keeper rule, same window), and
    certify the rewrite content — kept/dropped counts, the rebuilt
    char length, and the rolling fingerprint of the rebuilt text (the
    ``doc_fingerprints`` hash, so the certificate is engine-portable).
    This is the corpus a pretraining run would consume after the
    boilerplate pass; the fingerprint column means two independent
    runs (or the streaming rebuild of the future) can prove they
    produced byte-identical rewrites without shipping the text.

    Rebuild joins kept sentences with a single space in position
    order — the normalized segment form (original inter-sentence
    punctuation was consumed by the shared ``[.!?]+`` segmenter; the
    rewrite is defined on the normalized stream, like every dedup
    consumer here). Documents losing ALL sentences emit an empty
    rebuild (fingerprint 0), not a dropped row.

    Plan: the stats op's one sentence-keyed shuffle, plus one per-doc
    collect_list bounded by document size — corpus-grain map work, no
    new joins beyond a |docs|-row left join.
    """
    from kinesis_dstream_spark.functions.textfns import rolling_fingerprint

    segs = documents.select(
        "doc_id",
        F.filter(
            F.transform(F.split(F.col("text"), r"[.!?]+"), lambda s: F.trim(s)),
            lambda s: s != "",
        ).alias("ss"),
    )
    occ = segs.select("doc_id", F.posexplode("ss").alias("pos", "sent"))
    from pyspark.sql import Window

    flagged = occ.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("sent").orderBy("doc_id", "pos")),
    )
    totals = occ.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tot"))
    rebuilt = (
        flagged.filter(F.col("rn") == 1)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "sent"))),
                    lambda x: x["sent"],
                ),
                " ",
            ).alias("new_text"),
        )
    )
    out = totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        (F.col("n_tot") - F.coalesce("n_kept", F.lit(0)))
        .cast("long")
        .alias("n_dropped"),
        F.coalesce("new_text", F.lit("")).alias("new_text"),
    )
    return out.select(
        "doc_id",
        "n_kept",
        "n_dropped",
        F.length("new_text").cast("long").alias("new_n_chars"),
        rolling_fingerprint(F.col("new_text")).alias("new_fp"),
    )


SENTENCE_DEDUP_REWRITE_SQL = """
WITH segs AS (
  SELECT doc_id,
         list_filter(list_transform(regexp_split_to_array(text, '[.!?]+'),
                                    s -> trim(s)),
                     s -> s <> '') AS ss
  FROM documents
), occ AS (
  SELECT doc_id, unnest(generate_series(1, len(ss))) AS pos, unnest(ss) AS sent
  FROM segs
), flagged AS (
  SELECT doc_id, pos, sent,
         row_number() OVER (PARTITION BY sent ORDER BY doc_id, pos) AS rn
  FROM occ
), totals AS (
  SELECT doc_id, count(*) AS n_tot FROM occ GROUP BY doc_id
), rebuilt AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(sent, ' ' ORDER BY pos) AS new_text
  FROM flagged WHERE rn = 1 GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(t.n_tot - coalesce(r.n_kept, 0) AS BIGINT) AS n_dropped,
       CAST(length(coalesce(r.new_text, '')) AS BIGINT) AS new_n_chars,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
                      list_transform(str_split(coalesce(r.new_text, ''), ''),
                                     c -> CAST(ascii(c) AS BIGINT))),
         (acc, x) -> (acc * 31 + x) % 1000000007
       ) AS new_fp
FROM totals t LEFT JOIN rebuilt r ON r.doc_id = t.doc_id
"""
