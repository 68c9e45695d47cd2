"""Deterministic embedding clustering + semantic (cluster-scoped)
dedup — the SemDeDup-style curation pass (SURVEY §2B E-10/E-11).

Near-dup dedup (MinHash/simhash/cosine-LSH) removes *copies*; semantic
dedup removes *redundancy*: documents that say the same thing in
different words. The published recipe (SemDeDup, Abbas et al. 2023;
see PAPERS.md) is (1) k-means-cluster the embedding space, (2) compare
pairs ONLY within a cluster, (3) drop all but one of each semantic
group. Clustering is what makes the quadratic pairwise step tractable:
the cluster is the candidate block, exactly like LSH bands are for
near-dup — and this module implements both stages Spark-first with a
bit-exact relational oracle.

Determinism/exactness contract (the house fixed-point discipline):

- Vectors are L2-normalized with the sequential left-to-right fold
  (bitwise-equal to the DuckDB twin's ``list_reduce`` — the
  ``_DUCK_UNIT_CTE`` argument, registry.py), then land on the 1e-6
  fixed-point grid. Everything after is int64 arithmetic.
- Lloyd iterations are FIXED (``n_assign`` assignment rounds with one
  truncating-division centroid update between), not convergence-polled,
  so the whole algorithm is an exact relational recurrence with an
  unrolled DuckDB twin — the PageRank/LPA oracle pattern (graph.py).
- Seeds are the ``k`` smallest md5 hash ranks of vec_id — the repo's
  deterministic-draw idiom (KMV/negative-sampling): reproducible across
  runs/partitionings with no RNG state. (Production k-means++ would
  sample seeds the same hash-rank way.)
- Distances: squared L2 on the unit grid (rank-equivalent to cosine
  for unit vectors: ||a−b||² = 2−2·cos). Bounds: coords ≤ 1e6,
  per-dim diff² ≤ 4e12, ×64 dims ≤ 2.6e14 — comfortably int64.
- Argmin ties break toward the smallest centroid id (array_position
  returns the FIRST minimum; the oracle's min-join replays it).

Plan shape (100 TB story):

- Assignment is PURE MAP-SIDE: centroids are collected to the driver
  (k·d int64s — the bounded "codebook" collect the PQ family already
  uses) and compiled into the row expression as literal arrays, so
  scoring is a JVM ``zip_with``/``aggregate`` fold per centroid with
  NO join and NO shuffle. The only exchange per update round is the
  (cid, pos) partial-sum aggregate: map-combined to ≤ partitions·k·d
  rows — independent of corpus size.
- Like the JL/PQ paths, building the plan therefore runs bounded Spark
  jobs (one k·d collect per centroid state) — the documented
  EAGER-EVALUATION house semantics (similarity.py): centroids freeze
  at plan-build; rebuild the plan to re-fit.
- SemDeDup's pair stage joins the capped member list with itself on
  cluster id. The deterministic per-cluster cap (md5-ranked
  representatives, default 256) bounds every cluster's pairwise work
  to cap²/2 dots regardless of data volume — the skew bound: 8 cluster
  keys would otherwise be 8 straggler tasks whose size tracks the
  corpus. Production scales k with n (SemDeDup uses k ≈ n/⟨cluster⟩)
  so clusters stay small; the cap is the belt-and-braces guarantee on
  top, and dropping only among representatives is itself the paper's
  subsampling variant.

Fixture caveat (same as the JL/IVF family): the synthetic corpus is
isotropic, so within-cluster cosines sit near 0 and τ is calibrated to
0.40 to exercise the drop path (~5% drops); production embeddings
cluster tightly and use τ ≈ 0.95+. τ enters as an exact integer
threshold on the grid (τ·S² — no float compare).

Reference tie: the reference engine (/root/reference/app/app.py) is an
HTTP poll/filter pipeline with no vector executor; this module is part
of the mandated LLM-pipeline extension surface, not reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kinesis_dstream_spark.operators.similarity import _normalized

_SCALE = 1_000_000
_K = 8
_N_ASSIGN = 2  # assignment rounds; one centroid update between
_SEM_TAU_FP = 400_000_000_000  # τ=0.40 on the unit grid: τ·S²
_SEM_CAP = 256


def _unit_int_arrays(embeddings: DataFrame) -> DataFrame:
    """(vec_id, iu): unit vector on the 1e-6 fixed-point grid."""
    return _normalized(embeddings).select(
        "vec_id",
        F.transform("unit", lambda x: F.round(x * _SCALE).cast("long")).alias(
            "iu"
        ),
    )


def _collect_seed_centroids(
    embeddings: DataFrame, iarr: DataFrame, k: int, tag: str = "kmeans:"
) -> list[tuple[int, list[int]]]:
    """The k hash-rank seed vectors, as (cid, coords) driver literals.
    ``tag`` salts the md5 rank so independent fits over the same ids
    (e.g. the PQ subspace quantizers, pq_det.py) draw independent
    seed orders — the oracle replays the same salted rank."""
    seeds = (
        embeddings.select(
            "vec_id",
            F.md5(
                F.concat(F.lit(tag), F.col("vec_id").cast("string"))
            ).alias("rk"),
        )
        .orderBy("rk", "vec_id")
        .limit(k)
    )
    rows = (
        iarr.join(seeds, "vec_id")
        .select("rk", "vec_id", "iu")
        .orderBy("rk", "vec_id")
        .collect()
    )
    return [(cid, [int(x) for x in r["iu"]]) for cid, r in enumerate(rows)]


def _sq_l2_fold_sql(vec_sql: str, coords: list[int]) -> str:
    """SQL text of the exact int64 squared-L2 fold of ``vec_sql``
    against a literal coordinate array. Rendered as TEXT rather than
    the Column DSL deliberately (r10 perf): building k·d literal terms
    through the Python API costs one py4j round-trip per ``F.lit`` —
    ~3.4 s of pure driver chatter per assignment build at m·ksub·dsub
    ≈ 1e3 terms — while a string parses JVM-side in one call. Same
    expression tree, same codegen, same values (golden-hash-pinned)."""
    arr = "array(" + ",".join(f"{c}L" for c in coords) + ")"
    return (
        f"aggregate(zip_with({vec_sql}, {arr}, (a, b) -> (a - b) * (a - b)), "
        f"0L, (acc, x) -> acc + x)"
    )


def _dot_fold_sql(vec_sql: str, coords: list[int]) -> str:
    """SQL text of the exact int64 dot of ``vec_sql`` with a literal
    coordinate array (same text-over-DSL rationale as above)."""
    arr = "array(" + ",".join(f"{c}L" for c in coords) + ")"
    return (
        f"aggregate(zip_with({vec_sql}, {arr}, (a, b) -> a * b), "
        f"0L, (acc, x) -> acc + x)"
    )


def _argmin_cid_sql(darr_sql: str, cids: list[int]) -> str:
    """SQL text picking the centroid id at the distance array's FIRST
    minimum (array_position tie rule — ties to the smallest cid since
    the array is cid-ordered)."""
    cid_arr = "array(" + ",".join(str(c) for c in cids) + ")"
    return (
        f"element_at({cid_arr}, "
        f"cast(array_position({darr_sql}, array_min({darr_sql})) as int))"
    )


def _assign_expr(iarr: DataFrame, cents: list[tuple[int, list[int]]]) -> DataFrame:
    """Map-side assignment against literal centroids: no join, no
    shuffle — dist per centroid is a JVM zip_with/aggregate fold."""
    darr = (
        "array("
        + ",".join(_sq_l2_fold_sql("iu", coords) for _, coords in cents)
        + ")"
    )
    return iarr.select(
        "vec_id",
        "iu",
        F.expr(f"array_min({darr})").alias("dist"),
        # first minimum == smallest centroid id (cents is cid-ordered)
        F.expr(_argmin_cid_sql(darr, [cid for cid, _ in cents])).alias(
            "cluster_id"
        ),
    )


# k·d literal terms above which the codegen'd zip_with/aggregate folds
# degrade (giant expression trees, task-binary blowup — the Hilbert
# lesson) and assignment flips to the Arrow matmul kernel. Fixture runs
# (k=8, d=64 → 512 terms) stay on the literal path; the kernels are
# pinned bit-identical in pytest.
_ARROW_ASSIGN_MIN_TERMS = 200_000


def _assign_arrow(iarr: DataFrame, cents: list[tuple[int, list[int]]]) -> DataFrame:
    """Arrow-matmul assignment — IDENTICAL semantics to ``_assign_expr``
    (exact int64 squared-L2, argmin ties to the smallest centroid id)
    computed as one numpy int64 matmul per Arrow batch instead of k
    codegen'd folds: ||x−c||² = ||x||² − 2x·c + ||c||², argmin over the
    k columns (numpy argmin returns the FIRST minimum; ``cents`` is
    cid-ordered, replaying array_position's tie rule). Every product
    and sum is the same int64 arithmetic as the literal expression, so
    the flip is bit-invisible (pytest-pinned). Same plan shape: still a
    map-only pass, no join, no shuffle — only the scoring kernel
    changes, which is what lets k grow past codegen limits (SCALE.md).
    Overflow headroom: coords ≤ 1e6 ⇒ ||x||², ||c||², dist ≤ 2.6e14 —
    comfortably int64 (the module-docstring bound)."""
    import numpy as np
    import pandas as pd

    cid_arr = np.array([cid for cid, _ in cents], dtype=np.int64)
    C = np.array([coords for _, coords in cents], dtype=np.int64)
    cn = (C * C).sum(axis=1)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["iu"].to_numpy()).astype(np.int64)
            dist = (X * X).sum(axis=1)[:, None] - 2 * (X @ C.T) + cn[None, :]
            j = dist.argmin(axis=1)  # first minimum == smallest cid
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "iu": pdf["iu"],
                    "dist": dist[np.arange(len(j)), j],
                    "cluster_id": cid_arr[j].astype(np.int32),
                }
            )

    return iarr.mapInPandas(
        score, "vec_id long, iu array<long>, dist long, cluster_id int"
    )


def _assign(iarr: DataFrame, cents: list[tuple[int, list[int]]]) -> DataFrame:
    """Kernel dispatch: literal codegen folds for small k·d (JVM-side,
    whole-stage-codegen'd into the scan), Arrow matmul past the gate."""
    d = len(cents[0][1]) if cents else 0
    if len(cents) * d >= _ARROW_ASSIGN_MIN_TERMS:
        return _assign_arrow(iarr, cents)
    return _assign_expr(iarr, cents)


def _lloyd_rounds(
    iarr: DataFrame, cents: list[tuple[int, list[int]]], n_assign: int
) -> tuple[DataFrame, list[tuple[int, list[int]]]]:
    """``n_assign`` assignment rounds with one truncating-division
    centroid update between each pair — the exact relational recurrence
    both the full-dim fit and the PQ subspace fits (pq_det.py) run.
    Returns (final assignment, final centroids)."""
    asg = _assign(iarr, cents)
    for _ in range(n_assign - 1):
        upd = (
            asg.select("cluster_id", F.posexplode("iu").alias("pos0", "v"))
            .groupBy("cluster_id", "pos0")
            # trunc division toward zero: Spark DIV == DuckDB // (the
            # determinism-trap contract) — numpy-validated in pytest
            .agg(F.expr("sum(v) DIV count(1)").alias("cv"))
            .groupBy("cluster_id")
            .agg(F.sort_array(F.collect_list(F.struct("pos0", "cv"))).alias("cs"))
            .orderBy("cluster_id")
            .collect()  # bounded: ≤ k rows of d int64s (the PQ codebook bound)
        )
        cents = [
            (int(r["cluster_id"]), [int(s["cv"]) for s in r["cs"]]) for r in upd
        ]
        asg = _assign(iarr, cents)
    return asg, cents


def _fit_kmeans(
    embeddings: DataFrame, k: int = _K, n_assign: int = _N_ASSIGN
) -> tuple[DataFrame, DataFrame, list[tuple[int, list[int]]]]:
    """(iarr, assignment, final centroids) — the fit shared by the
    profile, SemDeDup, and the deterministic-IVF serving path."""
    iarr = _unit_int_arrays(embeddings).localCheckpoint()
    cents = _collect_seed_centroids(embeddings, iarr, k)
    asg, cents = _lloyd_rounds(iarr, cents, n_assign)
    return iarr, asg, cents


def embedding_kmeans_assign(
    embeddings: DataFrame, k: int = _K, n_assign: int = _N_ASSIGN
) -> DataFrame:
    """Deterministic fixed-point Lloyd assignment:
    (vec_id, iu, dist, cluster_id) after ``n_assign`` assignment rounds
    with a truncating-division centroid update between each pair.

    A centroid that captures no members simply drops out of the next
    round's literal list (its id is never reassigned) — identical
    group-by semantics in the oracle, deterministic in both engines.
    """
    _, asg, _ = _fit_kmeans(embeddings, k, n_assign)
    return asg


def embedding_kmeans_profile(
    embeddings: DataFrame, k: int = _K, n_assign: int = _N_ASSIGN
) -> DataFrame:
    """Per-cluster fit profile: size, exact integer inertia, mean
    squared unit-space distance (one int/int division at the end)."""
    asg = embedding_kmeans_assign(embeddings, k, n_assign)
    return (
        asg.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("dist").alias("inertia_num"),
        )
        .select(
            "cluster_id",
            "n_members",
            "inertia_num",
            # same left-to-right division chain as the DuckDB twin
            F.round(
                F.col("inertia_num")
                / F.col("n_members")
                / float(_SCALE)
                / float(_SCALE),
                6,
            ).alias("mean_sq_dist"),
        )
    )


def semantic_cluster_dedup(
    embeddings: DataFrame,
    k: int = _K,
    n_assign: int = _N_ASSIGN,
    tau_fp: int = _SEM_TAU_FP,
    cap: int = _SEM_CAP,
) -> DataFrame:
    """SemDeDup: within each k-means cluster, drop every member that
    has a LOWER-id capped representative within cosine τ (exact
    integer dot ≥ τ·S² on the unit grid). Greedy-by-id — the paper's
    "keep one per semantic group" with a deterministic keeper.

    Returns per-cluster accounting: (cluster_id, n_members, n_dropped,
    n_kept). Members beyond the md5-ranked cap are kept by default
    (dedup runs among representatives — the subsampling variant; the
    cap is the per-cluster work bound, see module docstring).
    """
    asg = embedding_kmeans_assign(embeddings, k, n_assign).localCheckpoint()
    mrk = Window.partitionBy("cluster_id").orderBy(
        F.md5(F.concat(F.lit("sem:"), F.col("vec_id").cast("string"))), "vec_id"
    )
    capped = (
        asg.withColumn("mrk", F.row_number().over(mrk))
        .filter(F.col("mrk") <= cap)
        .select("vec_id", "cluster_id", "iu")
    )
    a = capped.select(
        F.col("cluster_id").alias("cid"),
        F.col("vec_id").alias("a_id"),
        F.col("iu").alias("a_iu"),
    )
    b = capped.select(
        F.col("cluster_id").alias("cid"),
        F.col("vec_id").alias("b_id"),
        F.col("iu").alias("b_iu"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("a_iu"), F.col("b_iu"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    dropped = (
        a.join(b, ["cid"])
        .where(F.col("a_id") < F.col("b_id"))
        .where(dot >= F.lit(tau_fp))
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
    )
    return (
        asg.join(dropped.withColumn("dr", F.lit(1)), "vec_id", "left")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.count("dr").alias("n_dropped"),
            (F.count(F.lit(1)) - F.count("dr")).alias("n_kept"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB twins: the same recurrence unrolled (PageRank-oracle pattern).
# ---------------------------------------------------------------------------


def kmeans_oracle_cte(
    k: int = _K, n_assign: int = _N_ASSIGN, fit_pred: str | None = None
) -> str:
    """WITH-chain ending in ``a{n_assign}`` = (vec_id, cid, dist),
    plus ``iarr`` (vec_id, iu list) for downstream pair dots.

    ``fit_pred`` (r9, for the frozen-centroid ingest twin): a vec_id
    predicate restricting the FIT — seeds and every assignment/update
    round see only matching vectors — while ``iarr``/``lg`` still
    cover the full table for downstream all-corpus scoring."""
    lg_fit = "lg"
    fit_cte = ""
    seed_where = ""
    if fit_pred:
        lg_fit = "lgf"
        fit_cte = f", lgf AS (SELECT * FROM lg WHERE {fit_pred})"
        seed_where = f" WHERE {fit_pred}"
    chain = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), u AS (
  SELECT vec_id,
         list_transform(v, x -> x /
           sqrt(list_reduce(list_transform(v, y -> y * y), (a, b) -> a + b))
         ) AS unit
  FROM e
), iarr AS (
  SELECT vec_id,
         list_transform(unit, x -> CAST(round(x * {_SCALE}) AS BIGINT)) AS iu
  FROM u
), lg AS (
  SELECT vec_id, unnest(generate_series(1, len(iu))) AS pos, unnest(iu) AS iu
  FROM iarr
){fit_cte}, seeds AS (
  SELECT vec_id,
         row_number() OVER (
           ORDER BY md5('kmeans:' || CAST(vec_id AS VARCHAR)), vec_id) - 1
           AS cid
  FROM embeddings{seed_where}
  ORDER BY md5('kmeans:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT {k}
), c0 AS (
  SELECT s.cid, l.pos, l.iu AS cv FROM seeds s JOIN {lg_fit} l USING (vec_id)
)"""
    prev = "c0"
    for i in range(1, n_assign + 1):
        chain += f""", d{i} AS (
  SELECT l.vec_id, c.cid,
         CAST(sum((l.iu - c.cv) * (l.iu - c.cv)) AS BIGINT) AS dist
  FROM {lg_fit} l JOIN {prev} c ON c.pos = l.pos GROUP BY 1, 2
), m{i} AS (SELECT vec_id, min(dist) AS md FROM d{i} GROUP BY 1),
a{i} AS (
  SELECT d.vec_id, min(d.cid) AS cid, min(d.dist) AS dist
  FROM d{i} d JOIN m{i} ON m{i}.vec_id = d.vec_id AND d.dist = m{i}.md
  GROUP BY 1
)"""
        if i < n_assign:
            chain += f""", c{i} AS (
  SELECT a.cid, l.pos,
         CAST(CAST(sum(l.iu) AS BIGINT) // count(*) AS BIGINT) AS cv
  FROM a{i} a JOIN {lg_fit} l USING (vec_id) GROUP BY 1, 2
)"""
            prev = f"c{i}"
    return chain


KMEANS_PROFILE_SQL = (
    kmeans_oracle_cte()
    + f"""
SELECT cid AS cluster_id, count(*) AS n_members,
       CAST(sum(dist) AS BIGINT) AS inertia_num,
       round(CAST(sum(dist) AS BIGINT) / count(*) / {_SCALE}.0 / {_SCALE}.0, 6)
         AS mean_sq_dist
FROM a{_N_ASSIGN} GROUP BY 1
"""
)


SEMANTIC_DEDUP_SQL = (
    kmeans_oracle_cte()
    + f""", mem AS (
  SELECT vec_id, cid,
         row_number() OVER (PARTITION BY cid
            ORDER BY md5('sem:' || CAST(vec_id AS VARCHAR)), vec_id) AS mrk
  FROM a{_N_ASSIGN}
), capped AS (SELECT vec_id, cid FROM mem WHERE mrk <= {_SEM_CAP}),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM capped a JOIN capped b ON a.cid = b.cid AND a.vec_id < b.vec_id
  JOIN iarr ia ON ia.vec_id = a.vec_id
  JOIN iarr ib ON ib.vec_id = b.vec_id
  WHERE list_reduce(list_transform(list_zip(ia.iu, ib.iu), s -> s[1] * s[2]),
                    (x, y) -> x + y) >= {_SEM_TAU_FP}
)
SELECT f.cid AS cluster_id, count(*) AS n_members,
       CAST(count(d.vec_id) AS BIGINT) AS n_dropped,
       CAST(count(*) - count(d.vec_id) AS BIGINT) AS n_kept
FROM a{_N_ASSIGN} f LEFT JOIN dropped d ON d.vec_id = f.vec_id
GROUP BY 1
"""
)


def ivf_deterministic_topk(
    embeddings: DataFrame,
    n_queries: int = 10,
    topk: int = 5,
    n_probe: int = 2,
    k: int = _K,
    n_assign: int = _N_ASSIGN,
    _fit: tuple | None = None,
) -> DataFrame:
    """IVF ANN with NOTHING probabilistic left: coarse cells come from
    the deterministic Lloyd fit above, the probe list is an exact
    integer ranking of query→centroid distances, and the candidate
    re-rank is the exact integer dot — so unlike the sampled-codebook
    ``ann_ivf_topk`` (rows-only, recall-bounded in pytest), THIS IVF
    is end-to-end hash-checkable against a relational oracle while
    keeping the real IVF serving shape: each query scores only the
    members of its ``n_probe`` nearest cells, never the corpus.

    The approximation error is still honest ANN semantics (a true
    neighbor living outside the probed cells is missed); recall vs the
    exact brute-force operator is measured in pytest. What changed is
    that the error is REPRODUCIBLE — certifiable row-for-row — which
    is what a production retrieval pipeline wants from its serving
    tier (the "same query, same shortlist, any replica" contract).

    Plan: query→centroid scoring is map-side (k literal folds, tiny
    query side), the probe pick a ≤ |q|·k-row window, and the
    candidate join hashes on cluster_id — at 100 TB with the corpus
    written cell-partitioned (the ann_index layout), that join is
    partition-pruned to the probed cells. Ties: cells on (dist, cid),
    results on (dot desc, c_id).

    ``_fit`` (r13 optimization): an optional precomputed
    ``(iarr, asg, cents)`` from ``_fit_kmeans(embeddings, k, n_assign)``
    so multi-family evals (``quantizer_recall_matrix``) pay the
    deterministic coarse fit ONCE instead of once per leg — identical
    values by construction (the fit is a pure function of its inputs).
    """
    iarr, asg, cents = _fit if _fit is not None else _fit_kmeans(
        embeddings, k, n_assign
    )
    queries = iarr.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("iu").alias("q_iu")
    )
    probes = _ivf_probes(queries, cents, n_probe)
    cand = asg.select("vec_id", "iu", "cluster_id").join(
        F.broadcast(probes), "cluster_id"
    )
    return _ivf_rerank(cand, topk)


def ann_recall_mrr_report(
    embeddings: DataFrame,
    n_queries: int = 10,
    topk: int = 5,
    n_probe: int = 2,
    k: int = _K,
    n_assign: int = _N_ASSIGN,
) -> DataFrame:
    """Retrieval-quality evaluation harness (E-11 depth, r11): per
    query, recall@k and reciprocal rank of the deterministic IVF
    serving tier against the EXACT integer-dot ground truth — the
    eval loop every retrieval deployment runs before trusting an
    index, here fully hash-certifiable because BOTH sides are
    deterministic (exact truth by construction; det-IVF by the Lloyd
    grid discipline). The sampled-codebook family gets recall FLOORS
    in pytest; this op turns recall itself into a first-class,
    oracle-paired statistic an operator can trend per corpus.

    Output per query: (q_id, n_hits, recall_ppm = hits·10⁶ div k,
    rr_ppm = 10⁶ div rank-of-first-true-neighbor, 0 if none) — exact
    integers, trunc-div grid.

    Cost model: ground truth pays the honest |corpus|·|q| exact-dot
    pass (the oracle-twin price, bounded by the small eval query
    batch — evals run on samples, not corpora); the IVF side pays its
    normal probed-cells serve. One extra |q|·k join for the overlap.
    """
    iarr = _unit_int_arrays(embeddings).localCheckpoint()
    queries = iarr.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("iu").alias("q_iu")
    )
    dot = F.aggregate(
        F.zip_with(F.col("q_iu"), F.col("iu"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    tw = Window.partitionBy("q_id").orderBy(F.col("dot_num").desc(), "c_id")
    truth = (
        iarr.join(F.broadcast(queries), F.col("vec_id") != F.col("q_id"))
        .select("q_id", F.col("vec_id").alias("c_id"), dot.alias("dot_num"))
        .withColumn("trk", F.row_number().over(tw))
        .filter(F.col("trk") <= topk)
        .select("q_id", "c_id")
    )
    approx = ivf_deterministic_topk(
        embeddings, n_queries, topk, n_probe, k, n_assign
    ).select("q_id", "c_id", "rk")
    hits = approx.join(F.broadcast(truth), ["q_id", "c_id"])  # ≤ |q|·k rows
    per_q = hits.groupBy("q_id").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.min("rk").alias("first_hit_rk"),
    )
    return (
        queries.select("q_id")
        .join(F.broadcast(per_q), "q_id", "left")
        .select(
            "q_id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.expr(f"coalesce(n_hits, 0) * 1000000 div {int(topk)}")
            .cast("long")
            .alias("recall_ppm"),
            F.coalesce(
                F.expr("1000000 div first_hit_rk"), F.lit(0)
            ).cast("long").alias("rr_ppm"),
        )
    )


def ann_recall_report_sql(
    n_queries: int = 10,
    topk: int = 5,
    n_probe: int = 2,
    k: int = _K,
    n_assign: int = _N_ASSIGN,
) -> str:
    """Twin: the det-IVF chain (shared CTE prefix) + exact truth top-k
    + the same integer overlap arithmetic."""
    cent_tbl = f"c{n_assign - 1}" if n_assign > 1 else "c0"
    return (
        kmeans_oracle_cte(k, n_assign)
        + f""", q AS (
  SELECT vec_id AS q_id, iu AS q_iu FROM iarr WHERE vec_id < {n_queries}
), qd AS (
  SELECT l.vec_id AS q_id, c.cid,
         CAST(sum((l.iu - c.cv) * (l.iu - c.cv)) AS BIGINT) AS cd
  FROM lg l JOIN {cent_tbl} c ON c.pos = l.pos
  WHERE l.vec_id < {n_queries}
  GROUP BY 1, 2
), probes AS (
  SELECT q_id, cid FROM (
    SELECT q_id, cid, row_number() OVER (PARTITION BY q_id ORDER BY cd, cid) AS pr
    FROM qd
  ) WHERE pr <= {n_probe}
), approx AS (
  SELECT q_id, c_id, rk FROM (
    SELECT p.q_id, a.vec_id AS c_id,
           row_number() OVER (PARTITION BY p.q_id
             ORDER BY CAST(list_reduce(list_transform(list_zip(q.q_iu, ia.iu),
                                                      s -> s[1] * s[2]),
                           (x, y) -> x + y) AS BIGINT) DESC, a.vec_id) AS rk
    FROM probes p
    JOIN a{n_assign} a ON a.cid = p.cid
    JOIN q ON q.q_id = p.q_id
    JOIN iarr ia ON ia.vec_id = a.vec_id
    WHERE a.vec_id <> p.q_id
  ) WHERE rk <= {topk}
), truth AS (
  SELECT q_id, c_id FROM (
    SELECT q.q_id, ia.vec_id AS c_id,
           row_number() OVER (PARTITION BY q.q_id
             ORDER BY CAST(list_reduce(list_transform(list_zip(q.q_iu, ia.iu),
                                                      s -> s[1] * s[2]),
                           (x, y) -> x + y) AS BIGINT) DESC, ia.vec_id) AS trk
    FROM q JOIN iarr ia ON ia.vec_id <> q.q_id
  ) WHERE trk <= {topk}
), per_q AS (
  SELECT a.q_id, CAST(count(*) AS BIGINT) AS n_hits,
         CAST(min(a.rk) AS BIGINT) AS first_hit_rk
  FROM approx a JOIN truth t ON t.q_id = a.q_id AND t.c_id = a.c_id
  GROUP BY 1
)
SELECT q.q_id,
       coalesce(p.n_hits, 0) AS n_hits,
       CAST(coalesce(p.n_hits, 0) * 1000000 // {topk} AS BIGINT) AS recall_ppm,
       CAST(coalesce(1000000 // p.first_hit_rk, 0) AS BIGINT) AS rr_ppm
FROM q LEFT JOIN per_q p ON p.q_id = q.q_id
"""
    )


ANN_RECALL_REPORT_SQL = ann_recall_report_sql()


def _ivf_probes(queries: DataFrame, cents, n_probe: int) -> DataFrame:
    """(q_id, q_iu, cluster_id): each query's ``n_probe`` nearest cells
    by exact integer squared-L2 against the literal centroids — a
    map-side explode + a ≤ |q|·k-row window, no corpus contact."""
    entries = ",".join(
        f"named_struct('cd', {_sq_l2_fold_sql('q_iu', coords)}, 'cid', {cid})"
        for cid, coords in cents
    )
    probe_w = Window.partitionBy("q_id").orderBy("cd", "cid")
    return (
        queries.select(
            "q_id", "q_iu", F.expr(f"explode(array({entries}))").alias("s")
        )
        .select("q_id", "q_iu", F.col("s.cd").alias("cd"), F.col("s.cid").alias("cid"))
        .withColumn("pr", F.row_number().over(probe_w))
        .filter(F.col("pr") <= n_probe)
        .select("q_id", "q_iu", F.col("cid").alias("cluster_id"))
    )


def _ivf_rerank(cand: DataFrame, topk: int) -> DataFrame:
    """Exact integer dot + per-query top-k over the (q_iu, iu)
    candidate rows — identical tie rule in build and serve paths."""
    dot = F.aggregate(
        F.zip_with(F.col("q_iu"), F.col("iu"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = cand.filter(F.col("vec_id") != F.col("q_id")).select(
        "q_id", F.col("vec_id").alias("c_id"), dot.alias("dot_num")
    )
    topk_w = Window.partitionBy("q_id").orderBy(F.col("dot_num").desc(), "c_id")
    return (
        scored.withColumn("rk", F.row_number().over(topk_w))
        .filter(F.col("rk") <= topk)
        .select("q_id", "c_id", "dot_num", "rk")
    )


_IVF_DET_META = "_meta.json"
# replay-log cap: the appended-fingerprint list is a fast-path cache on
# top of the row-level anti-join idempotence guard, so bounding it is
# safe (see ivf_det_store_append)
_IVF_DET_APPEND_LOG_CAP = 64


def ivf_det_store_ensure(
    embeddings: DataFrame,
    path: str,
    k: int = _K,
    n_assign: int = _N_ASSIGN,
) -> tuple[list[tuple[int, list[int]]], DataFrame]:
    """Build-if-absent persisted deterministic-IVF index (r8-verdict
    task: split the Lloyd fit out of the serve path): the codes table
    (vec_id, iu, cluster_id) written parquet **partitioned by
    cluster_id**, and the final Lloyd centroids stored in the meta
    sidecar (k·d int64s — driver-bounded by the same codebook argument
    as the fit itself). The meta JSON is written LAST so its presence
    marks a complete build, and it carries the corpus+params
    fingerprint (``ann_index.corpus_fingerprint`` convention): a
    regenerated fixture or changed (k, n_assign) rebuilds instead of
    silently serving stale cells.

    Returns (centroids, codes DataFrame read from the partitioned
    parquet). At 100 TB the build is one Lloyd fit + one partitioned
    write (no shuffle — partitionBy splits task output by cell);
    serving reads ONLY the probed cells' files (planning-time
    PartitionFilters, see ``ivf_deterministic_serve``).

    Crash safety (r10, the r9-ADVICE rebuild-ordering fix): the meta
    sidecar is REMOVED before a rebuild starts overwriting codes and
    atomically rewritten LAST (``stores.write_meta`` temp+replace), so
    at every instant the sidecar's presence-and-parseability marks a
    complete, self-consistent store — for rebuilds exactly as for
    first builds. ``ivf_det_serve_frozen`` trusts that marker.
    """
    import os

    from kinesis_dstream_spark import stores
    from kinesis_dstream_spark.operators.ann_index import corpus_fingerprint

    fp = corpus_fingerprint(embeddings, ivf_det_k=k, ivf_det_n_assign=n_assign)
    codes_path = os.path.join(path, "codes")
    stored = stores.read_meta(path, _IVF_DET_META)
    if stored is None or stored.get("fingerprint") != fp:
        # poison FIRST: a crash between here and the final write_meta
        # leaves a detectably-incomplete store, never stale-meta-over-
        # partial-codes
        stores.remove_meta(path, _IVF_DET_META)
        _, asg, cents = _fit_kmeans(embeddings, k, n_assign)
        asg.select("vec_id", "iu", "cluster_id").write.mode(
            "overwrite"
        ).partitionBy("cluster_id").parquet(codes_path)
        stored = {
            "fingerprint": fp,
            "k": k,
            "n_assign": n_assign,
            "centroids": [[cid, coords] for cid, coords in cents],
        }
        stores.write_meta(path, stored, _IVF_DET_META)  # LAST: build complete
    cents = [
        (int(cid), [int(x) for x in coords]) for cid, coords in stored["centroids"]
    ]
    codes = embeddings.sparkSession.read.parquet(codes_path)
    return cents, codes


def ivf_det_store_invalidate(path: str) -> None:
    """Poison the store fingerprint (erasure hook): centroids were
    trained on the full corpus, so after subject vectors are erased the
    model parameters must refit — the ``ann_index_invalidate_codebooks``
    contract. Next ensure() rebuilds fit + codes from the live corpus."""
    from kinesis_dstream_spark import stores

    meta = stores.read_meta(path, _IVF_DET_META)
    if meta is not None:
        meta["fingerprint"] = "invalidated-by-erasure"
        stores.write_meta(path, meta, _IVF_DET_META)


def ivf_deterministic_serve(
    embeddings: DataFrame,
    path: str,
    n_queries: int = 10,
    topk: int = 5,
    n_probe: int = 2,
    k: int = _K,
    n_assign: int = _N_ASSIGN,
) -> DataFrame:
    """Serving half of the build/serve split: identical rows to
    ``ivf_deterministic_topk`` (same centroids — the fit is
    deterministic — same probe rule, same tie rule; one oracle serves
    both), but the recurring cost is only the serve:

    - query vectors: a pushed-filter scan of the ``n_queries`` rows;
    - probe pick: map-side literal scoring (centroids come from the
      meta sidecar — NO Lloyd fit, no corpus pass);
    - candidates: the probed cells' parquet partitions ONLY — the
      probe list is collected (≤ |q|·n_probe ints, driver-bounded) and
      pushed as a static ``cluster_id IN (...)`` partition filter, so
      the scan never opens unprobed cells' files;
    - re-rank: the shared ``_ivf_rerank`` integer dot + top-k window.

    This is the production retrieval shape at 100 TB: the index is
    built once per corpus snapshot (``ivf_det_store_ensure``), every
    query batch pays |probed cells| I/O + |q|·|cell| dots.
    """
    cents, codes = ivf_det_store_ensure(embeddings, path, k, n_assign)
    return _ivf_serve_from(embeddings, codes, cents, n_queries, topk, n_probe)


def _ivf_serve_from(
    embeddings: DataFrame,
    codes: DataFrame,
    cents: list[tuple[int, list[int]]],
    n_queries: int,
    topk: int,
    n_probe: int,
) -> DataFrame:
    """The recurring serve: probe pick against literal centroids, a
    static probed-cell partition prune on the codes scan, broadcast
    probe join, shared integer rerank."""
    queries = (
        _unit_int_arrays(embeddings)
        .filter(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("q_id"), F.col("iu").alias("q_iu"))
    )
    probes = _ivf_probes(queries, cents, n_probe).localCheckpoint(eager=True)
    # static planning-time partition prune: the probed-cell set is
    # ≤ |q|·n_probe ints (bounded collect, codebook class)
    cells = sorted(
        r["cluster_id"] for r in probes.select("cluster_id").distinct().collect()
    )
    cand = codes.filter(F.col("cluster_id").isin(cells)).join(
        F.broadcast(probes), "cluster_id"
    )
    return _ivf_rerank(cand, topk)


def replay_existing_vec_ids(spark, codes_path: str, cells: list[int]):
    """The replay anti-join's store-side read, cell-pruned (r11, r10
    verdict task 2): restrict the cell-partitioned codes table to the
    batch's assigned ``cluster_id`` values BEFORE projecting vec_id.
    ``cluster_id`` is the table's partition column, so the IN-filter is
    pushed as a PartitionFilter (plan-pinned in
    tests/test_streaming.py) — the read lists only the touched cell
    directories instead of scanning every partition's vec_id column.
    Shared by the det-IVF and det-IVF-PQ appends."""
    return (
        spark.read.parquet(codes_path)
        .filter(F.col("cluster_id").isin([int(c) for c in cells]))
        .select("vec_id")
    )


def ivf_det_store_append(embeddings_new: DataFrame, path: str) -> None:
    """Incremental ingest for the deterministic-IVF store: assign the
    new vectors to the FROZEN stored centroids (the meta sidecar's k·d
    literals — no refit, no corpus pass over existing data) and append
    their code rows to the cell partitions. This is the production IVF
    upkeep split: serve-time ingest is cheap and never perturbs
    existing assignments; quantizer REFIT is a deliberate rebuild
    (``ivf_det_store_invalidate`` + ensure), exactly like the PQ
    index's codebook lifecycle (``ann_index_append`` /
    ``ann_index_compact``).

    Replay-safe: the meta sidecar records each appended batch's
    content fingerprint; re-delivering a batch is a no-op instead of a
    duplicate append (the dedup_index ingest convention). The recorded
    list is a fast-path cache, not the correctness mechanism — the
    row-level anti-join below is — so it is CAPPED at the most recent
    ``_IVF_DET_APPEND_LOG_CAP`` fingerprints (and cleared by
    ``ivf_det_store_compact``) instead of growing one entry per batch
    forever; an evicted fingerprint's replay just pays the anti-join
    and appends zero rows. Meta rewrites go through the atomic
    ``stores.write_meta`` seam (r9-ADVICE: a torn in-place rewrite
    bricked the store until manual deletion).
    """
    import os

    from kinesis_dstream_spark import stores
    from kinesis_dstream_spark.operators.ann_index import corpus_fingerprint

    meta = stores.read_meta(path, _IVF_DET_META)
    if meta is None:  # append is upkeep: the store must exist, complete
        raise FileNotFoundError(
            f"ivf_det_store_append: no complete store at {path} "
            "(missing/torn meta sidecar) — run ivf_det_store_ensure first"
        )
    fp_new = corpus_fingerprint(embeddings_new, ivf_det_append=True)
    if fp_new in meta.get("appended", []):
        return
    cents = [
        (int(cid), [int(x) for x in coords]) for cid, coords in meta["centroids"]
    ]
    codes_path = os.path.join(path, "codes")
    # row-level idempotence on top of the batch fingerprint: a crash
    # BETWEEN the parquet append and the meta write would otherwise
    # re-append the batch on replay. r11 (r10 verdict task 2): assign
    # FIRST, then anti-join against ONLY the batch's cells. The frozen
    # deterministic centroids mean a vector can only ever live in its
    # assigned cell, so restricting `existing` to the batch's
    # cluster_id values — pushed as a PARTITION filter on the
    # cell-partitioned codes table — is provably identical to the
    # whole-store vec_id scan it replaces, and turns the per-batch
    # replay read from O(store) into O(touched cells).
    spark = embeddings_new.sparkSession
    asg = _assign(
        _unit_int_arrays(embeddings_new).dropDuplicates(["vec_id"]), cents
    ).persist()
    try:
        cells = [
            int(r[0]) for r in asg.select("cluster_id").distinct().collect()
        ]  # bounded by k (the centroid count) — a driver-side literal set
        if cells:
            existing = replay_existing_vec_ids(spark, codes_path, cells)
            fresh = asg.join(existing, "vec_id", "left_anti")
            if not fresh.isEmpty():
                fresh.select("vec_id", "iu", "cluster_id").write.mode(
                    "append"
                ).partitionBy("cluster_id").parquet(codes_path)
    finally:
        asg.unpersist()
    appended = meta.get("appended", [])
    appended.append(fp_new)
    meta["appended"] = appended[-_IVF_DET_APPEND_LOG_CAP:]
    stores.write_meta(path, meta, _IVF_DET_META)


def ivf_det_store_compact(
    spark, path: str, max_files_per_cell: int = 4
) -> dict[str, int]:
    """Compaction for the deterministic-IVF codes table — the last
    lifecycle piece (build / serve / ingest / erase / COMPACT):
    ``ivf_det_store_append`` adds one file per touched cell per batch,
    so a daily-ingest store accumulates unbounded small files. Cells
    whose parquet file count exceeds the threshold are repartitioned
    to one file each and committed via Spark's DYNAMIC partition
    overwrite — untouched cells are never rewritten, so the cost is
    bounded by the oversized cells' volume, not the store size (the
    ``ann_index_compact`` contract). Rows are localCheckpoint-ed
    before the overwrite so the read plan no longer depends on the
    files the commit replaces. Content, meta, and fingerprints are
    untouched (pytest pins identical serve results before/after).

    Returns ``{"cells_compacted", "files_before", "files_after"}``.
    """
    import os

    from kinesis_dstream_spark.operators.ann_index import _n_parquet_files

    codes_path = os.path.join(path, "codes")
    oversized = [
        int(entry.split("=", 1)[1])
        for entry in os.listdir(codes_path)
        if entry.startswith("cluster_id=")
        and _n_parquet_files(os.path.join(codes_path, entry)) > max_files_per_cell
    ]
    files_before = _n_parquet_files(codes_path)
    if not oversized:
        return {
            "cells_compacted": 0,
            "files_before": files_before,
            "files_after": files_before,
        }
    rows = (
        spark.read.parquet(codes_path)
        .filter(F.col("cluster_id").isin(oversized))
        .repartition("cluster_id")
        .localCheckpoint()
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        rows.write.partitionBy("cluster_id").mode("overwrite").parquet(codes_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # compaction is the natural truncation point for the append replay
    # log (its entries only short-circuit re-delivered batches, which
    # the row-level anti-join also catches — see ivf_det_store_append)
    from kinesis_dstream_spark import stores

    meta = stores.read_meta(path, _IVF_DET_META)
    if meta is not None and meta.get("appended"):
        meta["appended"] = []
        stores.write_meta(path, meta, _IVF_DET_META)
    return {
        "cells_compacted": len(oversized),
        "files_before": files_before,
        "files_after": _n_parquet_files(codes_path),
    }


def ivf_det_serve_frozen(
    embeddings: DataFrame,
    path: str,
    n_queries: int = 10,
    topk: int = 5,
    n_probe: int = 2,
) -> DataFrame:
    """Serve against the store AS-IS — frozen centroids plus whatever
    the ingest path appended. No ensure, no FRESHNESS check: the
    build/append calls own the lifecycle (the contract that lets
    post-ingest results stay deterministic — a freshness-gated rebuild
    here would silently refit the quantizer on the union corpus). It
    does still demand a COMPLETE store: a missing/torn meta sidecar
    (ensure poisons it for the whole rebuild window) refuses to serve
    rather than scanning half-rewritten codes."""
    import os

    from kinesis_dstream_spark import stores

    meta = stores.read_meta(path, _IVF_DET_META)
    if meta is None:
        raise FileNotFoundError(
            f"ivf_det_serve_frozen: no complete store at {path} "
            "(missing/torn meta sidecar — a rebuild may be in flight); "
            "run ivf_det_store_ensure"
        )
    cents = [
        (int(cid), [int(x) for x in coords]) for cid, coords in meta["centroids"]
    ]
    codes = embeddings.sparkSession.read.parquet(os.path.join(path, "codes"))
    return _ivf_serve_from(embeddings, codes, cents, n_queries, topk, n_probe)


def ivf_deterministic_sql(
    n_queries: int = 10,
    topk: int = 5,
    n_probe: int = 2,
    k: int = _K,
    n_assign: int = _N_ASSIGN,
) -> str:
    """DuckDB twin generated from the same parameters (the r7-ADVICE
    discipline). The final centroid table is ``c{n_assign-1}`` (or the
    seeds for a single-round fit)."""
    cent_tbl = f"c{n_assign - 1}" if n_assign > 1 else "c0"
    return (
        kmeans_oracle_cte(k, n_assign)
        + f""", q AS (
  SELECT vec_id AS q_id, iu AS q_iu FROM iarr WHERE vec_id < {n_queries}
), qd AS (
  SELECT l.vec_id AS q_id, c.cid,
         CAST(sum((l.iu - c.cv) * (l.iu - c.cv)) AS BIGINT) AS cd
  FROM lg l JOIN {cent_tbl} c ON c.pos = l.pos
  WHERE l.vec_id < {n_queries}
  GROUP BY 1, 2
), probes AS (
  SELECT q_id, cid FROM (
    SELECT q_id, cid, row_number() OVER (PARTITION BY q_id ORDER BY cd, cid) AS pr
    FROM qd
  ) WHERE pr <= {n_probe}
), scored AS (
  SELECT p.q_id, a.vec_id AS c_id,
         CAST(list_reduce(list_transform(list_zip(q.q_iu, ia.iu),
                                         s -> s[1] * s[2]),
                          (x, y) -> x + y) AS BIGINT) AS dot_num
  FROM probes p
  JOIN a{n_assign} a ON a.cid = p.cid
  JOIN q ON q.q_id = p.q_id
  JOIN iarr ia ON ia.vec_id = a.vec_id
  WHERE a.vec_id <> p.q_id
)
SELECT q_id, c_id, dot_num, rk FROM (
  SELECT q_id, c_id, dot_num,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY dot_num DESC, c_id) AS rk
  FROM scored
) WHERE rk <= {topk}
"""
    )


IVF_DETERMINISTIC_SQL = ivf_deterministic_sql()


def ivf_det_ingest_sql(
    fit_pred: str = "vec_id % 5 <> 4",
    n_queries: int = 10,
    topk: int = 5,
    n_probe: int = 2,
    k: int = _K,
    n_assign: int = _N_ASSIGN,
) -> str:
    """DuckDB twin of the frozen-centroid ingest flow (ensure on the
    ``fit_pred`` base + append the rest + serve): centroids fit on the
    base subset only, then ALL vectors assign to those frozen
    centroids (``aall``), and the probe/rerank reads ``aall`` — the
    relational statement of "ingest never refits"."""
    cent_tbl = f"c{n_assign - 1}" if n_assign > 1 else "c0"
    return (
        kmeans_oracle_cte(k, n_assign, fit_pred=fit_pred)
        + f""", dall AS (
  SELECT l.vec_id, c.cid,
         CAST(sum((l.iu - c.cv) * (l.iu - c.cv)) AS BIGINT) AS dist
  FROM lg l JOIN {cent_tbl} c ON c.pos = l.pos GROUP BY 1, 2
), mall AS (SELECT vec_id, min(dist) AS md FROM dall GROUP BY 1),
aall AS (
  SELECT d.vec_id, min(d.cid) AS cid
  FROM dall d JOIN mall ON mall.vec_id = d.vec_id AND d.dist = mall.md
  GROUP BY 1
), q AS (
  SELECT vec_id AS q_id, iu AS q_iu FROM iarr WHERE vec_id < {n_queries}
), qd AS (
  SELECT l.vec_id AS q_id, c.cid,
         CAST(sum((l.iu - c.cv) * (l.iu - c.cv)) AS BIGINT) AS cd
  FROM lg l JOIN {cent_tbl} c ON c.pos = l.pos
  WHERE l.vec_id < {n_queries}
  GROUP BY 1, 2
), probes AS (
  SELECT q_id, cid FROM (
    SELECT q_id, cid, row_number() OVER (PARTITION BY q_id ORDER BY cd, cid) AS pr
    FROM qd
  ) WHERE pr <= {n_probe}
), scored AS (
  SELECT p.q_id, a.vec_id AS c_id,
         CAST(list_reduce(list_transform(list_zip(qq.q_iu, ia.iu),
                                         s -> s[1] * s[2]),
                          (x, y) -> x + y) AS BIGINT) AS dot_num
  FROM probes p
  JOIN aall a ON a.cid = p.cid
  JOIN q qq ON qq.q_id = p.q_id
  JOIN iarr ia ON ia.vec_id = a.vec_id
  WHERE a.vec_id <> p.q_id
)
SELECT q_id, c_id, dot_num, rk FROM (
  SELECT q_id, c_id, dot_num,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY dot_num DESC, c_id) AS rk
  FROM scored
) WHERE rk <= {topk}
"""
    )


IVF_DET_INGEST_SQL = ivf_det_ingest_sql()


def _idcg_fp(topk: int) -> int:
    """Ideal-DCG fixed-point constant for graded gains (topk, topk−1,
    …, 1) at ranks 1..topk with the standard log2(r+1) discount, each
    term µ-unit-rounded EXACTLY like the live terms. Computed once in
    Python and embedded as a literal in BOTH engines — so engine-log2
    last-bit differences cannot touch the denominator."""
    import math

    return sum(
        round((topk - i + 1) * 1_000_000 / math.log2(i + 1))
        for i in range(1, topk + 1)
    )


def ann_ndcg_report(
    embeddings: DataFrame,
    n_queries: int = 10,
    topk: int = 5,
    n_probe: int = 2,
    k: int = _K,
    n_assign: int = _N_ASSIGN,
) -> DataFrame:
    """NDCG@k of the deterministic IVF serving tier against exact
    ground truth — the ORDER-aware companion to
    ``ann_recall_mrr_report``: recall says "how many true neighbors
    surfaced", NDCG says "and in what positions", with graded
    relevance (the true rank-1 neighbor is worth more than the true
    rank-k) and the standard log2(r+1) position discount. This is the
    metric retrieval teams actually tune serving parameters (n_probe,
    shortlist size) against, because it moves smoothly when ordering
    degrades before membership does.

    Determinism: relevance grades are exact ints (topk − true_rank
    + 1); each DCG term rel/log2(rk+1) is µ-unit fixed-pointed before
    the per-query sum (identical double chain from identical ints in
    both engines); the ideal DCG is a PYTHON-computed integer literal
    shared by both sides, so ndcg_ppm = dcg_fp·10⁶ div idcg_fp is
    pure integer arithmetic.

    Cost model identical to the recall report: truth pays the honest
    query-batch-bounded exact pass, the IVF side its normal probed
    serve, plus one |q|·k overlap join.
    """
    iarr = _unit_int_arrays(embeddings).localCheckpoint()
    queries = iarr.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("iu").alias("q_iu")
    )
    dot = F.aggregate(
        F.zip_with(F.col("q_iu"), F.col("iu"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    tw = Window.partitionBy("q_id").orderBy(F.col("dot_num").desc(), "c_id")
    truth = (
        iarr.join(F.broadcast(queries), F.col("vec_id") != F.col("q_id"))
        .select("q_id", F.col("vec_id").alias("c_id"), dot.alias("dot_num"))
        .withColumn("trk", F.row_number().over(tw))
        .filter(F.col("trk") <= topk)
        .select("q_id", "c_id", (F.lit(topk) - F.col("trk") + 1).alias("gain"))
    )
    approx = ivf_deterministic_topk(
        embeddings, n_queries, topk, n_probe, k, n_assign
    ).select("q_id", "c_id", "rk")
    term_fp = F.round(
        F.col("gain") * F.lit(1_000_000) / F.log2(F.col("rk") + 1)
    ).cast("long")
    hits = approx.join(F.broadcast(truth), ["q_id", "c_id"]).select(
        "q_id", term_fp.alias("t")
    )
    per_q = hits.groupBy("q_id").agg(
        F.count(F.lit(1)).alias("n_hits"), F.sum("t").alias("dcg_fp")
    )
    idcg = _idcg_fp(topk)
    return (
        queries.select("q_id")
        .join(F.broadcast(per_q), "q_id", "left")
        .select(
            "q_id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.coalesce("dcg_fp", F.lit(0)).cast("long").alias("dcg_fp"),
            F.expr(f"coalesce(dcg_fp, 0) * 1000000 div {idcg}")
            .cast("long")
            .alias("ndcg_ppm"),
        )
    )


def ann_ndcg_report_sql(
    n_queries: int = 10,
    topk: int = 5,
    n_probe: int = 2,
    k: int = _K,
    n_assign: int = _N_ASSIGN,
) -> str:
    """Twin: shared det-IVF CTE prefix + graded truth + the same
    fixed-point DCG arithmetic against the SAME Python idcg literal."""
    cent_tbl = f"c{n_assign - 1}" if n_assign > 1 else "c0"
    idcg = _idcg_fp(topk)
    return (
        kmeans_oracle_cte(k, n_assign)
        + f""", q AS (
  SELECT vec_id AS q_id, iu AS q_iu FROM iarr WHERE vec_id < {n_queries}
), qd AS (
  SELECT l.vec_id AS q_id, c.cid,
         CAST(sum((l.iu - c.cv) * (l.iu - c.cv)) AS BIGINT) AS cd
  FROM lg l JOIN {cent_tbl} c ON c.pos = l.pos
  WHERE l.vec_id < {n_queries}
  GROUP BY 1, 2
), probes AS (
  SELECT q_id, cid FROM (
    SELECT q_id, cid, row_number() OVER (PARTITION BY q_id ORDER BY cd, cid) AS pr
    FROM qd
  ) WHERE pr <= {n_probe}
), approx AS (
  SELECT q_id, c_id, rk FROM (
    SELECT p.q_id, a.vec_id AS c_id,
           row_number() OVER (PARTITION BY p.q_id
             ORDER BY CAST(list_reduce(list_transform(list_zip(q.q_iu, ia.iu),
                                                      s -> s[1] * s[2]),
                           (x, y) -> x + y) AS BIGINT) DESC, a.vec_id) AS rk
    FROM probes p
    JOIN a{n_assign} a ON a.cid = p.cid
    JOIN q ON q.q_id = p.q_id
    JOIN iarr ia ON ia.vec_id = a.vec_id
    WHERE a.vec_id <> p.q_id
  ) WHERE rk <= {topk}
), truth AS (
  SELECT q_id, c_id, {topk} - trk + 1 AS gain FROM (
    SELECT q.q_id, ia.vec_id AS c_id,
           row_number() OVER (PARTITION BY q.q_id
             ORDER BY CAST(list_reduce(list_transform(list_zip(q.q_iu, ia.iu),
                                                      s -> s[1] * s[2]),
                           (x, y) -> x + y) AS BIGINT) DESC, ia.vec_id) AS trk
    FROM q JOIN iarr ia ON ia.vec_id <> q.q_id
  ) WHERE trk <= {topk}
), per_q AS (
  SELECT a.q_id, CAST(count(*) AS BIGINT) AS n_hits,
         CAST(sum(CAST(round(t.gain * 1000000 / log2(a.rk + 1)) AS BIGINT))
              AS BIGINT) AS dcg_fp
  FROM approx a JOIN truth t ON t.q_id = a.q_id AND t.c_id = a.c_id
  GROUP BY 1
)
SELECT q.q_id,
       coalesce(p.n_hits, 0) AS n_hits,
       coalesce(p.dcg_fp, 0) AS dcg_fp,
       CAST(coalesce(p.dcg_fp, 0) * 1000000 // {idcg} AS BIGINT) AS ndcg_ppm
FROM q LEFT JOIN per_q p ON p.q_id = q.q_id
"""
    )


def _pca_cov_cs(
    embeddings: DataFrame, _iarr: DataFrame | None = None
) -> tuple[DataFrame, int]:
    """The scaled-covariance matrix ``Cs`` of ``embedding_pca_profile``
    (exact integer ``(n·S − m·mᵀ) div 1e9`` over the µ-unit grid) plus
    the dimensionality — factored out (r13) so the OPQ rotation
    (`operators/opq.py`) derives its Householder vector from the SAME
    Gram chain the profile certifies, never a diverging copy.

    Gram kernel (r13 optimization, guide §2.3/§4.2): the Gram pass used
    to be a vec_id self-join of the exploded (vec_id, pos, x) table —
    n·d² rows (8.2M at sf0.1's 2k×64) through a shuffle join + hash
    aggregate just to sum x_i·x_j. It is now ONE ``mapInPandas`` pass
    emitting a per-task partial ``Xᵀ·X`` (d² int64 cells) plus the
    partial column sums, re-aggregated by a d²-row map-side-combined
    sum — the Gram never crosses an exchange at row grain. The numpy
    int64 matmul is the same exact integer arithmetic as the joined
    sum-of-products (the ``_assign_arrow`` precedent), so values are
    bit-identical and the DuckDB twin is unchanged. Per-task partials
    bound at n_task·1e12 ≪ 2⁶³; the final n·S product keeps the
    documented n ≈ 2300 int64 horizon (HUGEINT/decimal beyond it)."""
    import numpy as np
    import pandas as pd

    iarr = _iarr if _iarr is not None else _unit_int_arrays(
        embeddings
    ).localCheckpoint()
    n = iarr.count()

    def gram(batches):
        S = None
        mv = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["iu"].to_numpy()).astype(np.int64)
            St = X.T @ X
            S = St if S is None else S + St
            mt = X.sum(axis=0)
            mv = mt if mv is None else mv + mt
        if S is None:
            return
        d = S.shape[0]
        idx = np.arange(1, d + 1, dtype=np.int32)
        # Gram cells as (i ≥ 1, j ≥ 1, Σ x_i·x_j); column sums ride the
        # same frame under the j = 0 sentinel so ONE aggregation feeds
        # both the m literals and Cs
        yield pd.DataFrame(
            {
                "i": np.concatenate([np.repeat(idx, d), idx]),
                "j": np.concatenate(
                    [np.tile(idx, d), np.zeros(d, dtype=np.int32)]
                ),
                "s": np.concatenate([S.ravel(), mv]),
            }
        )

    parts = (
        iarr.select("iu")  # only the column the kernel needs (§4.1)
        .mapInPandas(gram, "i int, j int, s long")
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
        .localCheckpoint()
    )
    m_rows = {r.i: r.s for r in parts.filter(F.col("j") == 0).collect()}
    d = len(m_rows)
    marr = F.array(
        *[F.lit(m_rows[i]).cast("long") for i in range(1, d + 1)]
    )
    Cs = (
        parts.filter(F.col("j") > 0)
        .withColumn("ma", marr)
        .select(
            "i",
            "j",
            F.expr(
                f"(s * {n} - element_at(ma, CAST(i AS INT))"
                " * element_at(ma, CAST(j AS INT))) div 1000000000"
            ).alias("c"),
        )
        .localCheckpoint()
    )
    return Cs, d


def _pca_power(
    Cs: DataFrame, d: int, n_iter: int
) -> tuple[list[int], dict[int, int], list[int]]:
    """``n_iter`` exact-integer power rounds over a collected-literal
    vector (bounded by d, the kmeans-centroid discipline). Returns
    (v, last w rows, the v the last mat-vec consumed)."""
    v = [1_000_000] * d
    w_rows: dict[int, int] = {}
    prev_v = v
    for _ in range(n_iter):
        varr = F.array(*[F.lit(x).cast("long") for x in v])
        w_df = (
            Cs.withColumn("va", varr)
            .select(
                "i",
                (F.col("c") * F.expr("element_at(va, CAST(j AS INT))")).alias("t"),
            )
            .groupBy("i")
            .agg(F.sum("t").alias("w"))
        )
        w_rows = {r.i: r.w for r in w_df.collect()}
        wmax = max(abs(x) for x in w_rows.values())
        denom = max(wmax // 1_000_000, 1)
        prev_v = v
        v = [
            (1 if w_rows.get(i, 0) >= 0 else -1) * (abs(w_rows.get(i, 0)) // denom)
            for i in range(1, d + 1)
        ]
    return v, w_rows, prev_v


def dominant_pc_vector(
    embeddings: DataFrame, n_iter: int = 3, _iarr: DataFrame | None = None
) -> list[int]:
    """The dominant principal direction on the ±1e6 integer grid — the
    exact power-iteration output the OPQ pre-rotation consumes."""
    Cs, d = _pca_cov_cs(embeddings, _iarr=_iarr)
    v, _, _ = _pca_power(Cs, d, n_iter)
    return v


def embedding_pca_profile(embeddings: DataFrame, n_iter: int = 3) -> DataFrame:
    """Dominant principal component of the embedding cloud by EXACT
    fixed-point power iteration — the geometry probe run before
    trusting any quantizer: a large leading eigen-share means the
    cloud is anisotropic (JL/PQ subspace splits and IVF cells degrade
    predictably — see quantizer_recall_matrix), and the loading vector
    says WHICH directions carry the variance. Classical PCA is float
    linear algebra; this is the engine-portable integer formulation:

    - scaled covariance ``C' = n·S − m·mᵀ`` (S = Σ x xᵀ, m = Σ x over
      the 1e-6 unit grid) — exact int64 at fixture scale (the n·S and
      m_i·m_j products need decimal(38,0)/HUGEINT beyond n ≈ 2300; a
      one-line switch on both sides, the Wasserstein discipline);
    - ``Cs = C' div 1e9`` drops the matrix into the int64 mat-vec
      range (≤ 2.5e-10 relative truncation on the entries that
      matter);
    - ``n_iter`` mat-vecs with a per-round integer renorm
      ``v ← sign(w)·(|w| div greatest(|w|max div 1e6, 1))`` back onto
      the ±1e6 grid — truncating division, identical in both engines
      (Spark ``div`` and DuckDB ``//`` both truncate toward zero,
      verified on negatives);
    - Rayleigh share ``λ/tr = (v·w) / ((v·v)·tr Cs)`` with the integer
      products exact (Python bigint here, HUGEINT in the oracle) and
      ONE double division at display, mirrored as
      cast-both-sides-then-divide in the twin.

    The per-round d-int vector is collected as a literal — the
    kmeans-centroid discipline (bounded by d, not data) — while the
    Gram pass (the only corpus-grain work, n·d² multiply-adds) stays
    distributed: one vec_id-keyed self-join fanning into a d²-row
    map-side-combined aggregate. Every post-Gram stage is
    broadcast-class (d² matrix, d vectors).
    """
    Cs, d = _pca_cov_cs(embeddings)
    v, w_rows, prev_v = _pca_power(Cs, d, n_iter)
    num = sum(prev_v[i - 1] * w_rows.get(i, 0) for i in range(1, d + 1))
    den = sum(x * x for x in prev_v)
    trace = Cs.filter(F.col("i") == F.col("j")).agg(F.sum("c")).collect()[0][0]
    dt = den * trace
    share = float(num) / float(dt) if dt != 0 else 0.0
    vout = F.array(*[F.lit(x).cast("long") for x in v])
    return (
        Cs.filter(F.col("i") == F.col("j"))
        .withColumn("vv", vout)
        .select(
            F.col("i").cast("long").alias("pos"),
            F.expr("element_at(vv, CAST(i AS INT))").cast("long").alias(
                "loading_ppm"
            ),
            F.round(F.lit(float(share)), 6).alias("eig_share"),
        )
    )


def pca_power_cte_sql(n_iter: int = 3, with_base: bool = True) -> str:
    """The WITH-chain prefix of the PCA twin, ending at ``v{n_iter}``
    (the dominant-PC integer vector): e/u/iarr/lg, the exact Gram
    ``cs``, and the unrolled power rounds with HUGEINT renorm products
    on the same truncating-div grid. Shared by
    ``embedding_pca_profile_sql`` and the OPQ rotation twin
    (`operators/opq.py`) — parameter discipline, one chain.
    ``with_base=False`` drops the leading e/u/iarr/lg CTEs (returning a
    ``, params AS …`` continuation) for composition after a chain that
    already defines them (``kmeans_oracle_cte`` — its other CTE names
    c0/d{i}/m{i}/a{i} don't collide with params/m/s/cs/v*/w*)."""
    prev, cte = "v0", ""
    for k in range(1, n_iter + 1):
        cte += f""", w{k} AS (
  SELECT c.i, CAST(sum(c.c * v.v) AS BIGINT) AS w
  FROM cs c JOIN {prev} v ON v.i = c.j
  GROUP BY c.i
), v{k} AS (
  SELECT i,
         CAST((CASE WHEN w >= 0 THEN 1 ELSE -1 END)
              * (CAST(abs(w) AS HUGEINT)
                 // greatest((SELECT max(abs(w)) FROM w{k}) // 1000000, 1))
              AS BIGINT) AS v
  FROM w{k}
)"""
        prev = f"v{k}"
    base = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), u AS (
  SELECT vec_id,
         list_transform(v, x -> x /
           sqrt(list_reduce(list_transform(v, y -> y * y), (a, b) -> a + b))
         ) AS unit
  FROM e
), iarr AS (
  SELECT vec_id,
         list_transform(unit, x -> CAST(round(x * 1000000) AS BIGINT)) AS iu
  FROM u
), lg AS (
  SELECT vec_id, unnest(generate_series(1, len(iu))) AS pos, unnest(iu) AS x
  FROM iarr
), params AS""" if with_base else """, plg AS (
  SELECT vec_id, pos, iu AS x FROM lg
), params AS"""
    # kmeans_oracle_cte's long form names its scalar `iu`, this chain's
    # names it `x` — the no-base adapter CTE (plg) bridges them
    lgn = "lg" if with_base else "plg"
    return f"""{base} (SELECT count(*) AS n FROM iarr),
m AS (SELECT pos, CAST(sum(x) AS BIGINT) AS m FROM {lgn} GROUP BY pos),
s AS (
  SELECT a.pos AS i, b.pos AS j, CAST(sum(a.x * b.x) AS BIGINT) AS s
  FROM {lgn} a JOIN {lgn} b USING (vec_id) GROUP BY 1, 2
), cs AS (
  SELECT s.i, s.j,
         (s.s * (SELECT n FROM params) - mi.m * mj.m) // 1000000000 AS c
  FROM s JOIN m mi ON mi.pos = s.i JOIN m mj ON mj.pos = s.j
), v0 AS (
  SELECT DISTINCT i, CAST(1000000 AS BIGINT) AS v FROM cs
){cte}"""


def embedding_pca_profile_sql(n_iter: int = 3) -> str:
    """DuckDB twin: same Gram build, the power rounds unrolled with
    HUGEINT renorm products, same truncating-div grid."""
    last = n_iter
    return f"""{pca_power_cte_sql(n_iter)},
ray AS (
  SELECT (SELECT sum(CAST(p.v AS HUGEINT) * w.w)
          FROM v{last - 1 if last > 1 else 0} p JOIN w{last} w ON w.i = p.i)
           AS num,
         (SELECT sum(CAST(p.v AS HUGEINT) * p.v)
          FROM v{last - 1 if last > 1 else 0} p) AS den,
         (SELECT sum(c) FROM cs WHERE i = j) AS tr
)
SELECT cs.i AS pos, vf.v AS loading_ppm,
       round(CASE WHEN ray.den * ray.tr <> 0 THEN
               CAST(ray.num AS DOUBLE) / CAST(ray.den * ray.tr AS DOUBLE)
             ELSE 0.0 END, 6) AS eig_share
FROM cs JOIN v{last} vf ON vf.i = cs.i CROSS JOIN ray
WHERE cs.i = cs.j
"""
