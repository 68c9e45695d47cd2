"""Deterministic graph-based ANN — the HNSW/NSW tier (E-11, r12).

The production-default ANN structure (FAISS ``IndexHNSW``, hnswlib,
Malkov & Yashunin 2016) is a navigable k-NN GRAPH served by beam
search, not an inverted file. This module supplies that tier under the
repo's hash-certifiable discipline: every stochastic choice HNSW makes
(level draws, insertion order, entry point) is replaced by an
md5-ranked or exact-integer rule, and the serve path runs a FIXED
number of beam rounds with literal beam width — so the whole
build+search chain is reproducible row-for-row in a relational oracle,
exactly like the det-IVF family (`clustering.py:478`).

Reference parity note: the reference repo (an HTTP poller,
`app/hs_contacts.py`) has no vector code — this is §2B mandate scope
("similarity search ... designed for 100 TB"), the last production ANN
family the quantizer grid (flat/IVF/PQ/residual/SQ8) did not cover.

Shape of the deterministic variant:

* **Build** — candidate generation is CELL-BLOCKED, the standard
  k-NN-graph construction at scale (NN-Descent seeding, Vamana's
  partition passes): each node probes its ``n_probe`` nearest
  deterministic-Lloyd cells and scores only the md5-capped candidate
  pool of those cells (the SemDeDup rep discipline, ≤ ``cell_cap``
  per cell), then keeps its top-``m`` out-neighbors by exact integer
  dot with (dot DESC, dst ASC) ties. Out-degree is HARD-capped at
  ``m`` — the HNSW M parameter.
* **Serve** — entry points are the ``n_entry`` globally md5-ranked
  nodes (the deterministic stand-in for HNSW's top-layer descent);
  each of ``rounds`` beam iterations expands the current beam through
  the adjacency list, re-ranks beam ∪ neighbors by exact integer dot,
  and keeps the best ``beam`` nodes. Fixed rounds + literal widths
  make the visited set — and therefore the result — a pure function
  of the corpus.

100 TB scale argument: the build touches |corpus|·n_probe·cell_cap
candidate pairs (linear in the corpus for fixed caps — NO all-pairs
stage), partition-prunable by ``cluster_id`` under the ann_index cell
layout; the graph itself is ≤ m rows per node, co-partitioned by
``src``. A serve round joins a |q|·beam frontier with the
bounded-degree adjacency — beam·m candidate rows per query per round,
independent of corpus size, which is precisely the property that makes
graph ANN the production default. Recall vs the exact brute-force
truth is measured as a first-class oracle-paired statistic (the
``knn_graph`` row of ``quantizer_recall_matrix``) plus a pytest floor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kinesis_dstream_spark.operators.clustering import (
    _K,
    _N_ASSIGN,
    _fit_kmeans,
    _unit_int_arrays,
    kmeans_oracle_cte,
)

# defaults picked by a measured recall sweep at sf0.01 (10 queries,
# top-5, isotropic 64-d fixture): (m=6, beam=8, R=3, E=4, P=2) reads
# 30% recall — BELOW det-IVF's 40% — while this setting reads 88%,
# comfortably above every IVF-family tier, which is the graph tier's
# reason to exist; HNSW-realistic values (M=12, efSearch=24)
_M = 12  # out-degree cap (HNSW's M)
_M_BACK = 12  # back-link in-degree cap per pool node (HNSW prunes
# bidirectional links to the same M; r13 — restores the corpus-size-
# independent beam round under sustained ingest, see store_append)
_N_PROBE = 3  # build-time candidate cells per node
_CELL_CAP = 256  # md5-capped candidate pool per cell (SemDeDup bound)
_N_ENTRY = 8  # deterministic entry points (top-layer stand-in)
_BEAM = 24  # beam width (HNSW's efSearch)
_ROUNDS = 4  # fixed beam iterations

_DOT = "CAST(list_reduce(list_transform(list_zip({a}, {b}), s -> s[1] * s[2]), (x, y) -> x + y) AS BIGINT)"


def _dot_col(a: str, b: str):
    """Exact int64 dot of two µ-unit integer array columns."""
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _graph_pool(asg: DataFrame, cell_cap: int) -> DataFrame:
    """The md5-capped candidate pool per cell (SemDeDup rep bound):
    (vec_id, iu, cluster_id), ≤ cell_cap rows per cell."""
    pw = Window.partitionBy("cluster_id").orderBy(
        F.md5(F.concat(F.lit("knng:"), F.col("vec_id").cast("string"))),
        "vec_id",
    )
    return (
        asg.select("vec_id", "iu", "cluster_id")
        .withColumn("pr", F.row_number().over(pw))
        .filter(F.col("pr") <= cell_cap)
        .drop("pr")
    )


def _graph_probes(nodes: DataFrame, cents, n_probe: int) -> DataFrame:
    """``_ivf_probes`` plus the node's OWN coarse cell carried along:
    (q_id, q_iu, cluster_id, src_cell) where src_cell is the pr = 1
    probe — identical to ``_assign``'s cluster_id (both argmin exact
    squared-L2 with ties to the smallest cid), so the edge rows can be
    cell-partitioned by their src WITHOUT a corpus-sized join back onto
    the assignment. Both window passes share one (q_id) partitioning."""
    from kinesis_dstream_spark.operators.clustering import _sq_l2_fold_sql

    entries = ",".join(
        f"named_struct('cd', {_sq_l2_fold_sql('q_iu', coords)}, 'cid', {cid})"
        for cid, coords in cents
    )
    probe_w = Window.partitionBy("q_id").orderBy("cd", "cid")
    own_w = probe_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        nodes.select(
            F.col("vec_id").alias("q_id"), F.col("iu").alias("q_iu")
        )
        .select("q_id", "q_iu", F.expr(f"explode(array({entries}))").alias("s"))
        .select("q_id", "q_iu", F.col("s.cd").alias("cd"), F.col("s.cid").alias("cid"))
        .withColumn("pr", F.row_number().over(probe_w))
        .withColumn("src_cell", F.first("cid").over(own_w))
        .filter(F.col("pr") <= n_probe)
        .select("q_id", "q_iu", F.col("cid").alias("cluster_id"), "src_cell")
    )


def _edges_vs_pool(
    nodes: DataFrame,
    pool: DataFrame,
    cents,
    m: int,
    n_probe: int,
) -> DataFrame:
    """Out-edges of ``nodes`` against a (possibly FROZEN) candidate
    pool: each node probes its n_probe nearest cells of ``cents`` and
    keeps its top-m pool members by exact integer dot, (dot DESC,
    dst ASC) ties. Output carries ``cluster_id`` = the SRC's own
    coarse cell so the persisted store can partition ``edges/`` by it.

    Kernel (r13 optimization, guide §4.2 + the ``_assign_arrow``
    precedent): the build used to explode |corpus|·n_probe·cell_cap
    candidate rows through a broadcast join, evaluate a codegen'd
    64-term zip_with dot per row, and cut top-m with a corpus-sized
    row_number window — 1.5M joined rows + an exchange at sf0.1, and
    the single slowest stage of the whole graph family (~15 s of the
    one-shot build's 25 s). The pool is ≤ k·cell_cap rows BY
    CONSTRUCTION (the SemDeDup bound — the same bound that justified
    broadcasting it), so it now ships to each task as int64 matrices
    and ONE ``mapInPandas`` pass per corpus partition does probe
    selection (exact squared-L2 vs the k literal centroids, ties
    (cd, cid)), candidate masking (pool membership of the probed
    cells, self excluded), exact int64 dot matmul, and the per-src
    (dot DESC, dst ASC) top-m cut — NO join, NO shuffle, no
    corpus-sized exchange anywhere. numpy int64 arithmetic is the
    same exact integer math as the JVM folds (pytest + oracle + golden
    pins certify bit-equality); a chunked matmul bounds the per-task
    dot matrix at ~1024·|pool| cells."""
    import numpy as np
    import pandas as pd

    # bounded collect: ≤ k·cell_cap rows (the PQ-codebook collect class)
    pool_rows = pool.select("vec_id", "iu", "cluster_id").collect()
    p_ids = np.array([r["vec_id"] for r in pool_rows], dtype=np.int64)
    p_cells = np.array([r["cluster_id"] for r in pool_rows], dtype=np.int64)
    P = (
        np.array([list(r["iu"]) for r in pool_rows], dtype=np.int64)
        if pool_rows
        else np.zeros((0, len(cents[0][1])), dtype=np.int64)
    )
    cids = np.array([cid for cid, _ in cents], dtype=np.int64)
    C = np.array([coords for _, coords in cents], dtype=np.int64)
    cn = (C * C).sum(axis=1)
    npb = min(n_probe, len(cids))

    def build(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["iu"].to_numpy()).astype(np.int64)
            ids = pdf["vec_id"].to_numpy().astype(np.int64)
            for s in range(0, len(ids), 1024):
                Xc, idc = X[s : s + 1024], ids[s : s + 1024]
                # probe ranking: exact ||x−c||², ties (cd, cid) — the
                # _graph_probes / _ivf_probes rule
                Dc = (Xc * Xc).sum(1)[:, None] - 2 * (Xc @ C.T) + cn[None, :]
                order = np.lexsort(
                    (np.broadcast_to(cids, Dc.shape), Dc), axis=-1
                )
                probe_cells = cids[order[:, :npb]]
                src_cell = cids[order[:, 0]]
                if len(p_ids) == 0:
                    continue
                dots = Xc @ P.T
                mask = np.zeros(dots.shape, dtype=bool)
                for c in range(npb):
                    mask |= p_cells[None, :] == probe_cells[:, c : c + 1]
                mask &= p_ids[None, :] != idc[:, None]
                srcs, dsts, dnum, rks, cells = [], [], [], [], []
                for i in range(len(idc)):
                    j = np.flatnonzero(mask[i])
                    if len(j) == 0:
                        continue
                    # (dot DESC, dst ASC) — row_number's tie rule
                    sel = j[np.lexsort((p_ids[j], -dots[i, j]))][:m]
                    srcs.append(np.full(len(sel), idc[i], dtype=np.int64))
                    dsts.append(p_ids[sel])
                    dnum.append(dots[i, sel])
                    rks.append(np.arange(1, len(sel) + 1, dtype=np.int32))
                    cells.append(
                        np.full(len(sel), src_cell[i], dtype=np.int32)
                    )
                if not srcs:
                    continue
                yield pd.DataFrame(
                    {
                        "src": np.concatenate(srcs),
                        "dst": np.concatenate(dsts),
                        "dot_num": np.concatenate(dnum),
                        "rk": np.concatenate(rks),
                        "cluster_id": np.concatenate(cells),
                    }
                )

    return nodes.select("vec_id", "iu").mapInPandas(
        build, "src long, dst long, dot_num long, rk int, cluster_id int"
    )


def knn_graph_edges(
    embeddings: DataFrame,
    m: int = _M,
    n_probe: int = _N_PROBE,
    k: int = _K,
    n_assign: int = _N_ASSIGN,
    cell_cap: int = _CELL_CAP,
) -> DataFrame:
    """The bounded-out-degree k-NN graph: (src, dst, dot_num, rk) with
    rk ≤ m per src. Candidates are cell-blocked (each node scores only
    the md5-capped pools of its n_probe nearest deterministic-Lloyd
    cells), so the build is linear in the corpus for fixed caps."""
    iarr, asg, cents = _fit_kmeans(embeddings, k, n_assign)
    return _edges_vs_pool(iarr, _graph_pool(asg, cell_cap), cents, m, n_probe)


def ann_knn_graph_topk(
    embeddings: DataFrame,
    n_queries: int = 10,
    topk: int = 5,
    m: int = _M,
    n_probe: int = _N_PROBE,
    k: int = _K,
    n_assign: int = _N_ASSIGN,
    cell_cap: int = _CELL_CAP,
    n_entry: int = _N_ENTRY,
    beam: int = _BEAM,
    rounds: int = _ROUNDS,
) -> DataFrame:
    """Graph-ANN serve: fixed-round beam search over the deterministic
    k-NN graph → (q_id, c_id, dot_num, rk), rk ≤ topk per query.

    Every round joins the |q|·beam frontier with the m-bounded
    adjacency (beam·m candidate rows per query — corpus-size-
    independent), unions the standing beam (monotone: a found
    neighbor is never dropped for a worse one), and re-ranks by exact
    integer dot with (dot DESC, node ASC) ties. The beam is
    localCheckpoint-ed per round (iterative-lineage discipline)."""
    edges = knn_graph_edges(embeddings, m, n_probe, k, n_assign, cell_cap)
    iarr = _unit_int_arrays(embeddings).localCheckpoint()
    return _beam_serve(
        _adjacency_with_vecs(edges, iarr),
        iarr,
        n_queries,
        topk,
        n_entry,
        beam,
        rounds,
    )


def _adjacency_with_vecs(edges: DataFrame, iarr: DataFrame) -> DataFrame:
    """(src, dst, dst_iu) — the adjacency with each neighbor's vector
    DENORMALIZED onto the edge (the vectors-with-adjacency layout real
    HNSW serving uses), checkpointed once. r13 optimization: the beam
    rounds used to fetch candidate vectors by joining the |q|·beam·m
    candidate set against the FULL corpus table every round — a
    corpus-sized scan per round that contradicted the tier's
    corpus-independent-round story. Paying ONE corpus-scale join here
    makes every subsequent round touch only beam-bounded frames, and
    multi-serve callers (the efSearch curve's three widths) share the
    one materialization."""
    return edges.select("src", "dst").join(
        iarr.select(F.col("vec_id").alias("dst"), F.col("iu").alias("dst_iu")),
        "dst",
    ).select("src", "dst", "dst_iu").localCheckpoint()


def _beam_serve(
    edges_iu: DataFrame,
    iarr: DataFrame,
    n_queries: int,
    topk: int,
    n_entry: int,
    beam: int,
    rounds: int,
) -> DataFrame:
    """The shared fixed-round beam search over a vector-carrying
    adjacency frame (``_adjacency_with_vecs``): identical math whether
    the graph came from the one-shot build or the persisted store (one
    oracle serves both).

    Round shape (r13): the standing beam KEEPS its scores (the dot is
    a pure function of (query, node), so re-scoring it every round was
    pure waste); only newly discovered neighbors — already carrying
    their vectors on the edge — are scored, against the broadcast
    query batch. No corpus contact inside the loop: each round is
    broadcast-joins over |q|·beam(·m) frames plus one dedup exchange
    and the rank window. Set equality with the old
    rescore-the-whole-candidate-set formulation is exact: candidates =
    beam ∪ (neighbors \\ beam), scores deterministic, same
    (dot DESC, node ASC) cut."""
    queries = iarr.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("iu").alias("q_iu")
    )
    entries = (
        iarr.select(
            F.col("vec_id").alias("node"),
            F.md5(
                F.concat(F.lit("knne:"), F.col("vec_id").cast("string"))
            ).alias("erk"),
        )
        .orderBy("erk", "node")
        .limit(n_entry)
        .select("node")
    )
    # the entry beam, scored once up front (≤ n_entry vectors join in)
    ent_iu = entries.join(
        iarr.withColumnRenamed("vec_id", "node"), "node"
    ).select("node", "iu")
    beam_df = (
        queries.crossJoin(F.broadcast(ent_iu))
        .filter(F.col("node") != F.col("q_id"))
        .select("q_id", "node", _dot_col("q_iu", "iu").alias("dot_num"))
    )
    bw = Window.partitionBy("q_id").orderBy(F.col("dot_num").desc(), "node")
    for _ in range(rounds):
        nbrs = F.broadcast(beam_df.select("q_id", "node")).join(
            edges_iu, beam_df["node"] == edges_iu["src"]
        ).select("q_id", F.col("dst").alias("node"), "dst_iu")
        fresh = (
            nbrs.filter(F.col("node") != F.col("q_id"))
            .dropDuplicates(["q_id", "node"])
            .join(
                F.broadcast(beam_df.select("q_id", "node")),
                ["q_id", "node"],
                "left_anti",
            )
            .join(F.broadcast(queries), "q_id")
            .select(
                "q_id", "node", _dot_col("q_iu", "dst_iu").alias("dot_num")
            )
        )
        beam_df = (
            beam_df.unionByName(fresh)
            .withColumn("brk", F.row_number().over(bw))
            .filter(F.col("brk") <= beam)
            .select("q_id", "node", "dot_num")
            .localCheckpoint()
        )
    return (
        beam_df.withColumn("rk", F.row_number().over(bw))
        .filter(F.col("rk") <= topk)
        .select("q_id", F.col("node").alias("c_id"), "dot_num", "rk")
    )


def knn_graph_degree_stats(
    embeddings: DataFrame,
    m: int = _M,
    n_probe: int = _N_PROBE,
    k: int = _K,
    n_assign: int = _N_ASSIGN,
    cell_cap: int = _CELL_CAP,
) -> DataFrame:
    """Graph-quality summary a deployment would trend per build:
    node/edge counts, the degree envelope, and RECIPROCITY (edges
    whose reverse also exists — high reciprocity means the graph is
    navigable from either endpoint, the property beam search relies
    on). One row, exact integers; the reciprocity self-join hashes on
    the m-bounded edge list, never the corpus."""
    edges = knn_graph_edges(embeddings, m, n_probe, k, n_assign, cell_cap)
    return _degree_stats_from(edges)


def knn_graph_degree_stats_frozen(spark, path: str) -> DataFrame:
    """``knn_graph_degree_stats`` over the PERSISTED store's built
    edges — the r12 verdict's shared-build path: the bench family
    prices one build-if-absent ensure plus this scan instead of a
    fresh k-means fit + graph build per entry. Identical rows to the
    fresh build on the same corpus (the store is the same chain,
    fingerprint-pinned), so the entry keeps ``KNN_GRAPH_STATS_SQL``."""
    import os

    from kinesis_dstream_spark import stores

    if stores.read_meta(path, _KNNG_META) is None:
        raise FileNotFoundError(
            f"knn_graph_degree_stats_frozen: no complete store at {path}"
        )
    return _degree_stats_from(spark.read.parquet(os.path.join(path, "edges")))


def _degree_stats_from(edges: DataFrame) -> DataFrame:
    e = edges.select("src", "dst").localCheckpoint()
    recip = e.join(
        e.select(F.col("src").alias("dst"), F.col("dst").alias("src")),
        ["src", "dst"],
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    return (
        deg.agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("deg").alias("n_edges"),
            F.min("deg").alias("min_out_degree"),
            F.max("deg").alias("max_out_degree"),
        )
        .crossJoin(
            F.broadcast(recip.agg(F.count(F.lit(1)).alias("n_reciprocal")))
        )
        .select(
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("n_edges").cast("long").alias("n_edges"),
            F.col("min_out_degree").cast("long").alias("min_out_degree"),
            F.col("max_out_degree").cast("long").alias("max_out_degree"),
            F.col("n_reciprocal").cast("long").alias("n_reciprocal"),
            # degenerate-graph guard (r12 ADVICE): on an empty edge set
            # emit explicit NULL — Spark's `div NULL/0` and DuckDB's
            # `//` disagree (error vs NULL), so both sides CASE it
            F.expr(
                "CASE WHEN coalesce(n_edges, 0) = 0 THEN NULL"
                " ELSE n_reciprocal * 1000000 div n_edges END"
            )
            .cast("long")
            .alias("reciprocity_ppm"),
        )
    )


def knng_cte_sql(
    n_queries: int = 10,
    m: int = _M,
    n_probe: int = _N_PROBE,
    k: int = _K,
    n_assign: int = _N_ASSIGN,
    cell_cap: int = _CELL_CAP,
    n_entry: int = _N_ENTRY,
    beam: int = _BEAM,
    rounds: int = _ROUNDS,
    qset: str = "kg_q",
    with_qset: bool = True,
    rev_pred: str | None = None,
    m_back: int = _M_BACK,
) -> str:
    """The graph-build + beam-search CTE chain, to be appended after
    ``kmeans_oracle_cte`` (needs ``iarr``, ``lg``, ``a{n_assign}``,
    ``c{n_assign-1}``). All CTE names are kg_-prefixed so the chain
    composes into the quantizer_recall_matrix twin without colliding
    with the IVF/PQ/SQ CTEs; ``qset``/``with_qset`` let the matrix
    reuse its existing query CTE. Ends with ``kg_b{rounds}`` — the
    final beam. Round CTEs are MATERIALIZED (each is read by the next
    round's union AND its neighbor expansion — the DuckDB CTE-inlining
    trap would re-run the whole prefix exponentially).

    ``rev_pred`` (the ingest twin): a predicate template with a
    ``{col}`` placeholder marking INGESTED nodes (e.g.
    ``"{col} % 5 = 4"``) — their out-edges gain reverse rows (the store append's
    back-links) so beam search can reach nodes that are absent from
    the frozen pool, CAPPED per pool node at the top ``m_back`` by
    (dot DESC, ingested id ASC) — the same rank cut the store append
    applies (r13), keeping the adjacency ≤ m + m_back under any ingest
    volume; combined with ``kmeans_oracle_cte(fit_pred=...)``
    (cells/pool fit on the base split, ``iarr``/``lg``/probes over the
    union) this chain is the relational proof that the incremental
    insert refits nothing and is batch-order-independent."""
    cent_tbl = f"c{n_assign - 1}" if n_assign > 1 else "c0"
    dot_q_ia = _DOT.format(a="q.q_iu", b="ia.iu")
    sql = f""", kg_nd AS (
  SELECT l.vec_id, c.cid,
         CAST(sum((l.iu - c.cv) * (l.iu - c.cv)) AS BIGINT) AS cd
  FROM lg l JOIN {cent_tbl} c ON c.pos = l.pos GROUP BY 1, 2
), kg_pro AS (
  SELECT vec_id AS src, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY cd, cid) AS pr
    FROM kg_nd
  ) WHERE pr <= {n_probe}
), kg_pool AS MATERIALIZED (
  SELECT cid, vec_id, iu FROM (
    SELECT a.cid, a.vec_id, ia.iu,
           row_number() OVER (PARTITION BY a.cid
             ORDER BY md5('knng:' || CAST(a.vec_id AS VARCHAR)), a.vec_id)
             AS pr
    FROM a{n_assign} a JOIN iarr ia USING (vec_id)
  ) WHERE pr <= {cell_cap}
), kg_es AS (
  SELECT p.src, c.vec_id AS dst,
         {_DOT.format(a="si.iu", b="c.iu")} AS dot_num
  FROM kg_pro p
  JOIN kg_pool c ON c.cid = p.cid AND c.vec_id <> p.src
  JOIN iarr si ON si.vec_id = p.src
), kg_edges AS MATERIALIZED (
  SELECT src, dst, dot_num FROM (
    SELECT src, dst, dot_num,
           row_number() OVER (PARTITION BY src
                              ORDER BY dot_num DESC, dst) AS rk
    FROM kg_es
  ) WHERE rk <= {m}
)"""
    adj = "kg_edges"
    if rev_pred is not None:
        # back-links: reverse every ingested node's out-edges (a new
        # node is never in the frozen pool, so no reverse row can
        # duplicate an existing built edge), capped per pool node at
        # the top m_back by (dot DESC, ingested id ASC) — the store
        # append's merge cut (r13)
        adj = "kg_adj"
        sql += f""", kg_adj AS MATERIALIZED (
  SELECT src, dst FROM kg_edges
  UNION ALL
  SELECT dst AS src, src AS dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY dst
                              ORDER BY dot_num DESC, src) AS brk
    FROM kg_edges
    WHERE {rev_pred.format(col="src")}
  ) WHERE brk <= {m_back}
)"""
    if with_qset:
        sql += f""", {qset} AS (
  SELECT vec_id AS q_id, iu AS q_iu FROM iarr WHERE vec_id < {n_queries}
)"""
    sql += f""", kg_entries AS (
  SELECT vec_id AS node FROM iarr
  ORDER BY md5('knne:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT {n_entry}
), kg_b0 AS MATERIALIZED (
  SELECT q.q_id, e.node, {dot_q_ia} AS dot_num
  FROM {qset} q
  CROSS JOIN kg_entries e
  JOIN iarr ia ON ia.vec_id = e.node
  WHERE e.node <> q.q_id
)"""
    sql += _knng_rounds_cte("kg_", "kg_b0", adj, qset, beam, rounds)
    return sql


def _knng_rounds_cte(
    prefix: str, b0: str, adj: str, qset: str, beam: int, rounds: int
) -> str:
    """Only the width-DEPENDENT part of the beam chain — ``rounds``
    candidate-expansion + re-rank CTE pairs named ``{prefix}c{r}`` /
    ``{prefix}b{r}``, reading a caller-supplied entry beam ``b0``,
    adjacency and query set. Lets multi-width twins (the efSearch
    curve) emit the k-means + graph BUILD chain once and re-emit only
    these rounds per width (r12 ADVICE: the blanket ``.replace("kg_",
    ...)`` retag re-ran the whole build per width, 3× redundant oracle
    cost and fragile to substring collisions)."""
    dot_q_ia = _DOT.format(a="q.q_iu", b="ia.iu")
    sql = ""
    prev = b0
    for r in range(1, rounds + 1):
        sql += f""", {prefix}c{r} AS (
  SELECT DISTINCT q_id, node FROM (
    SELECT q_id, node FROM {prev}
    UNION ALL
    SELECT b.q_id, e.dst AS node FROM {prev} b JOIN {adj} e ON e.src = b.node
  ) WHERE node <> q_id
), {prefix}b{r} AS MATERIALIZED (
  SELECT q_id, node, dot_num FROM (
    SELECT c.q_id, c.node, {dot_q_ia} AS dot_num,
           row_number() OVER (PARTITION BY c.q_id
             ORDER BY {dot_q_ia} DESC, c.node) AS brk
    FROM {prefix}c{r} c
    JOIN {qset} q ON q.q_id = c.q_id
    JOIN iarr ia ON ia.vec_id = c.node
  ) WHERE brk <= {beam}
)"""
        prev = f"{prefix}b{r}"
    return sql


def ann_knn_graph_sql(
    n_queries: int = 10,
    topk: int = 5,
    m: int = _M,
    n_probe: int = _N_PROBE,
    k: int = _K,
    n_assign: int = _N_ASSIGN,
    cell_cap: int = _CELL_CAP,
    n_entry: int = _N_ENTRY,
    beam: int = _BEAM,
    rounds: int = _ROUNDS,
) -> str:
    """DuckDB twin of ``ann_knn_graph_topk``: the shared k-means chain
    + the kg_ graph/beam chain + the same final top-k cut."""
    return (
        kmeans_oracle_cte(k=k, n_assign=n_assign)
        + knng_cte_sql(
            n_queries, m, n_probe, k, n_assign, cell_cap, n_entry, beam, rounds
        )
        + f"""
SELECT q_id, node AS c_id, dot_num, CAST(rk AS BIGINT) AS rk FROM (
  SELECT q_id, node, dot_num,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY dot_num DESC, node) AS rk
  FROM kg_b{rounds}
) WHERE rk <= {topk}
"""
    )


def ann_knn_graph_ingest_sql(
    fit_pred: str = "vec_id % 5 <> 4",
    new_pred: str = "{col} % 5 = 4",
    n_queries: int = 10,
    topk: int = 5,
    m: int = _M,
    n_probe: int = _N_PROBE,
    k: int = _K,
    n_assign: int = _N_ASSIGN,
    cell_cap: int = _CELL_CAP,
    n_entry: int = _N_ENTRY,
    beam: int = _BEAM,
    rounds: int = _ROUNDS,
    m_back: int = _M_BACK,
) -> str:
    """Twin of the frozen-structure ingest flow (ensure on the
    ``fit_pred`` base + append the rest + serve over the union): cells
    AND the candidate pool are fit on the base subset only
    (``kmeans_oracle_cte(fit_pred)`` restricts seeds/assignments;
    ``kg_pool`` draws from the base assignment), then ALL nodes link
    against that frozen pool and ingested nodes gain back-links capped
    at ``m_back`` per pool node (r13 — the store append's merge cut) —
    the relational proof that the incremental HNSW insert refits
    nothing and the final graph is independent of batch order. Shared
    by the batch ``ann_knn_graph_ingest_serve`` entry and the drained
    ``streaming_knn_graph_ingest`` job."""
    return (
        kmeans_oracle_cte(k=k, n_assign=n_assign, fit_pred=fit_pred)
        + knng_cte_sql(
            n_queries,
            m,
            n_probe,
            k,
            n_assign,
            cell_cap,
            n_entry,
            beam,
            rounds,
            rev_pred=new_pred,
            m_back=m_back,
        )
        + f"""
SELECT q_id, node AS c_id, dot_num, CAST(rk AS BIGINT) AS rk FROM (
  SELECT q_id, node, dot_num,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY dot_num DESC, node) AS rk
  FROM kg_b{rounds}
) WHERE rk <= {topk}
"""
    )


def knn_graph_stats_sql(
    m: int = _M,
    n_probe: int = _N_PROBE,
    k: int = _K,
    n_assign: int = _N_ASSIGN,
    cell_cap: int = _CELL_CAP,
) -> str:
    """DuckDB twin of ``knn_graph_degree_stats``."""
    return (
        kmeans_oracle_cte(k=k, n_assign=n_assign)
        + knng_cte_sql(
            m=m,
            n_probe=n_probe,
            k=k,
            n_assign=n_assign,
            cell_cap=cell_cap,
            with_qset=False,
        ).split(", kg_entries AS")[0]
        + """, kg_deg AS (
  SELECT src, count(*) AS deg FROM kg_edges GROUP BY src
), kg_recip AS (
  SELECT count(*) AS n_reciprocal
  FROM kg_edges e JOIN kg_edges r ON r.src = e.dst AND r.dst = e.src
), kg_degagg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(sum(deg) AS BIGINT) AS n_edges,
         CAST(min(deg) AS BIGINT) AS min_out_degree,
         CAST(max(deg) AS BIGINT) AS max_out_degree
  FROM kg_deg
)
SELECT d.n_nodes, d.n_edges, d.min_out_degree, d.max_out_degree,
       CAST(r.n_reciprocal AS BIGINT) AS n_reciprocal,
       CAST(CASE WHEN coalesce(d.n_edges, 0) = 0 THEN NULL
            ELSE r.n_reciprocal * 1000000 // d.n_edges END AS BIGINT)
         AS reciprocity_ppm
FROM kg_degagg d CROSS JOIN kg_recip r
"""
    )


def knn_graph_edges_query_sql(
    m: int = _M,
    n_probe: int = _N_PROBE,
    k: int = _K,
    n_assign: int = _N_ASSIGN,
    cell_cap: int = _CELL_CAP,
) -> str:
    """Standalone (src, dst) edge-list query — the erasure oracle's
    re-derivation of the persisted graph store's adjacency cardinality
    (governance.py parameter discipline: the accounting twin reuses
    THE SAME build chain the store uses, never a hand-copied count)."""
    return (
        kmeans_oracle_cte(k=k, n_assign=n_assign)
        + knng_cte_sql(
            m=m,
            n_probe=n_probe,
            k=k,
            n_assign=n_assign,
            cell_cap=cell_cap,
            with_qset=False,
        ).split(", kg_entries AS")[0]
        + "\nSELECT src, dst FROM kg_edges\n"
    )


ANN_KNN_GRAPH_SQL = ann_knn_graph_sql()
KNN_GRAPH_STATS_SQL = knn_graph_stats_sql()
ANN_KNN_GRAPH_INGEST_SQL = ann_knn_graph_ingest_sql()
KNN_GRAPH_EDGES_QUERY_SQL = knn_graph_edges_query_sql()


# ---------------------------------------------------------------------------
# persisted store lifecycle (the det-IVF store contract, clustering.py:699)
# ---------------------------------------------------------------------------

_KNNG_META = "_meta_knng.json"
# replay-log cap: the appended-fingerprint list is a fast-path cache on
# top of the row-level anti-join idempotence guard (see the det-IVF
# append's rationale) — bounding it is safe
_KNNG_APPEND_LOG_CAP = 64


def knn_graph_store_ensure(
    embeddings: DataFrame,
    path: str,
    m: int = _M,
    n_probe: int = _N_PROBE,
    k: int = _K,
    n_assign: int = _N_ASSIGN,
    cell_cap: int = _CELL_CAP,
    m_back: int = _M_BACK,
) -> dict:
    """Build-if-absent persisted k-NN graph (the HNSW index artifact):

    * ``nodes/`` — (vec_id, iu, in_pool) parquet PARTITIONED BY the
      coarse ``cluster_id`` (append anti-joins prune to touched cells,
      the det-IVF layout); ``in_pool`` marks the md5-capped candidate
      pool, FROZEN at build time — incremental inserts link against
      the base pool, never into it, which is what makes the append
      order-independent (see ``knn_graph_store_append``).
    * ``edges/`` — (src, dst, dot_num, rk) built out-edges, rk ≤ m,
      PARTITIONED BY the src's own coarse ``cluster_id`` (r13): the
      append's replay guard and compaction prune to touched cells, and
      no maintenance step ever rewrites the whole adjacency in one
      task (the r12 ``coalesce(1)`` straggler is gone).
    * ``back/`` — ingest back-links (src = pool node, dst = ingested
      node, rk = -1), PARTITIONED BY the pool node's cell, created on
      first append and per-node CAPPED at ``m_back`` (see append).
    * meta sidecar — corpus+params fingerprint, frozen coarse
      centroids (k·d int64 literals), params; written LAST through the
      atomic ``stores.write_meta`` seam (poison-first rebuild — the
      det-IVF crash-safety contract verbatim).
    """
    import os

    from kinesis_dstream_spark import stores
    from kinesis_dstream_spark.operators.ann_index import corpus_fingerprint

    fp = corpus_fingerprint(
        embeddings, knn_graph=[m, n_probe, k, n_assign, cell_cap, m_back]
    )
    meta = stores.read_meta(path, _KNNG_META)
    if meta is None or meta.get("fingerprint") != fp:
        stores.remove_meta(path, _KNNG_META)  # poison FIRST
        iarr, asg, cents = _fit_kmeans(embeddings, k, n_assign)
        pool = _graph_pool(asg, cell_cap)
        nodes = asg.select("vec_id", "iu", "cluster_id").join(
            F.broadcast(pool.select("vec_id", F.lit(True).alias("in_pool"))),
            "vec_id",
            "left",
        ).select(
            "vec_id",
            "iu",
            F.coalesce("in_pool", F.lit(False)).alias("in_pool"),
            "cluster_id",
        )
        nodes.write.mode("overwrite").partitionBy("cluster_id").parquet(
            os.path.join(path, "nodes")
        )
        _edges_vs_pool(iarr, pool, cents, m, n_probe).write.mode(
            "overwrite"
        ).partitionBy("cluster_id").parquet(os.path.join(path, "edges"))
        meta = {
            "fingerprint": fp,
            "params": [m, n_probe, k, n_assign, cell_cap, m_back],
            "centroids": [[cid, coords] for cid, coords in cents],
        }
        stores.write_meta(path, meta, _KNNG_META)  # LAST: build complete
    return meta


def knn_graph_store_invalidate(path: str) -> None:
    """Poison the store fingerprint (erasure hook): the coarse cells,
    the md5-capped pool, AND the graph edges were all derived from the
    full corpus, so after subject vectors are erased the whole
    structure must rebuild from the live corpus — the
    ``ivf_det_store_invalidate`` contract."""
    from kinesis_dstream_spark import stores

    meta = stores.read_meta(path, _KNNG_META)
    if meta is not None:
        meta["fingerprint"] = "invalidated-by-erasure"
        stores.write_meta(path, meta, _KNNG_META)


def knn_graph_serve_frozen(
    spark,
    path: str,
    n_queries: int = 10,
    topk: int = 5,
    n_entry: int = _N_ENTRY,
    beam: int = _BEAM,
    rounds: int = _ROUNDS,
) -> DataFrame:
    """The recurring serve: beam search over the STORED adjacency —
    no fit, no graph build, no corpus pass beyond reading the stored
    (vec_id, iu) node rows. Queries and the md5-ranked entry points
    come from the stored nodes (base + ingested), so the serve is a
    pure function of the store's content — identical rows to the
    one-shot ``ann_knn_graph_topk`` on the same corpus (one oracle
    serves both)."""
    import os

    from kinesis_dstream_spark import stores

    if stores.read_meta(path, _KNNG_META) is None:
        raise FileNotFoundError(
            f"knn_graph_serve_frozen: no complete store at {path} "
            "(missing/torn meta sidecar) — run knn_graph_store_ensure first"
        )
    iarr = (
        spark.read.parquet(os.path.join(path, "nodes"))
        .select("vec_id", "iu")
        .localCheckpoint()
    )
    edges_iu = _adjacency_with_vecs(_read_adjacency(spark, path), iarr)
    return _beam_serve(edges_iu, iarr, n_queries, topk, n_entry, beam, rounds)


def _read_adjacency(spark, path: str) -> DataFrame:
    """The store's full adjacency: built out-edges (``edges/``) plus
    ingest back-links (``back/``, present only after appends). Per-node
    fan-out is ≤ m + m_back by construction — the bound each beam
    round's expansion relies on."""
    import os

    from kinesis_dstream_spark.operators.ann_index import _n_parquet_files

    adj = spark.read.parquet(os.path.join(path, "edges")).select("src", "dst")
    back_path = os.path.join(path, "back")
    # file-count guard, not isdir: an all-rows-erased back/ holds only
    # _SUCCESS and would fail schema inference
    if os.path.isdir(back_path) and _n_parquet_files(back_path) > 0:
        adj = adj.unionByName(
            spark.read.parquet(back_path).select("src", "dst")
        )
    return adj


def knn_graph_store_append(embeddings_new: DataFrame, path: str) -> None:
    """Incremental node insertion — the HNSW insert made
    order-independent: each new vector probes its n_probe nearest
    FROZEN cells, links to its top-m neighbors among the FROZEN base
    pool (exact integer dot), and gets BACK-LINKS from those targets so
    beam search can reach it. Because the pool and centroids are frozen
    at ensure time and pool members never change, a node's out-edges
    are a pure function of (node, store); back-links are merged under a
    per-pool-node TOP-``m_back`` cut by (dot DESC, ingested id ASC) —
    a selection whose result over any union equals the re-cut of
    per-subset cuts, so the final graph after any batch partition of
    the same ingest set is IDENTICAL, which is what lets the drained
    streaming serve share the batch ingest oracle
    (``ANN_KNN_GRAPH_INGEST_SQL``).

    Degree bound (r13): the back-link cap keeps every node's adjacency
    ≤ m + m_back under SUSTAINED ingest — the beam round's expansion
    stays corpus-size- and ingest-volume-independent without
    invalidate+ensure (which the r12 additive design required). The
    cap's price is a merge-rewrite of the touched ``back/`` cells per
    batch, each cell bounded at cell_cap·m_back rows — constant, not
    corpus-sized.

    Replay / crash safety: capped batch-fingerprint fast path +
    cell-pruned row anti-joins. Three writes, each individually
    idempotent, in crash-safe order: (1) ``back/`` touched-cell
    dynamic-partition merge-overwrite (re-running the merge is a
    no-op), (2) ``edges/`` append GUARDED by an anti-join on srcs
    already present in the batch's cells (r12 ADVICE: a crash between
    the edge and node writes must not double-append on replay),
    (3) ``nodes/`` append guarded by the stored-node anti-join.
    """
    import os

    from kinesis_dstream_spark import stores
    from kinesis_dstream_spark.operators.ann_index import (
        _n_parquet_files,
        corpus_fingerprint,
    )
    from kinesis_dstream_spark.operators.clustering import _assign

    meta = stores.read_meta(path, _KNNG_META)
    if meta is None:
        raise FileNotFoundError(
            f"knn_graph_store_append: no complete store at {path} "
            "(missing/torn meta sidecar) — run knn_graph_store_ensure first"
        )
    fp_new = corpus_fingerprint(embeddings_new, knn_graph_append=True)
    if fp_new in meta.get("appended", []):
        return
    m, n_probe, _, _, _, m_back = meta["params"]
    cents = [
        (int(cid), [int(x) for x in coords]) for cid, coords in meta["centroids"]
    ]
    nodes_path = os.path.join(path, "nodes")
    edges_path = os.path.join(path, "edges")
    back_path = os.path.join(path, "back")
    spark = embeddings_new.sparkSession
    asg = _assign(
        _unit_int_arrays(embeddings_new).dropDuplicates(["vec_id"]), cents
    ).select("vec_id", "iu", "cluster_id").persist()
    try:
        cells = [
            int(r[0]) for r in asg.select("cluster_id").distinct().collect()
        ]
        if cells:
            # cell-pruned replay anti-join: frozen centroids pin every
            # vector to one deterministic cell, so the stored-node read
            # prunes to the batch's partitions (the det-IVF argument)
            existing = (
                spark.read.parquet(nodes_path)
                .filter(F.col("cluster_id").isin(cells))
                .select("vec_id")
            )
            fresh = asg.join(existing, "vec_id", "left_anti").localCheckpoint()
            if not fresh.isEmpty():
                # probe-cell discovery for the pruned pool read (the
                # edge build itself re-ranks probes inside its Arrow
                # kernel — no joined probe frame exists anymore, r13)
                probe_cells = sorted(
                    r["cluster_id"]
                    for r in _graph_probes(fresh, cents, n_probe)
                    .select("cluster_id")
                    .distinct()
                    .collect()
                )
                pool = (
                    spark.read.parquet(nodes_path)
                    .filter(
                        F.col("in_pool")
                        & F.col("cluster_id").isin(probe_cells)
                    )
                    .select("vec_id", "iu", "cluster_id")
                )
                out_edges = _edges_vs_pool(
                    fresh, pool, cents, m, n_probe
                ).localCheckpoint()
                # -- (1) back-link merge: pool-node cell from the
                # bounded broadcast pool; union new reverse rows with
                # the stored rows of the touched cells, dedup (replay),
                # keep the top m_back per pool node
                back_new = out_edges.select(
                    F.col("dst").alias("src"),
                    F.col("src").alias("dst"),
                    "dot_num",
                ).join(
                    F.broadcast(
                        pool.select(
                            F.col("vec_id").alias("src"),
                            F.col("cluster_id").alias("bcell"),
                        )
                    ),
                    "src",
                )
                touched = back_new
                if os.path.isdir(back_path) and _n_parquet_files(back_path) > 0:
                    stored_back = (
                        spark.read.parquet(back_path)
                        .filter(F.col("cluster_id").isin(probe_cells))
                        .select(
                            "src",
                            "dst",
                            "dot_num",
                            F.col("cluster_id").alias("bcell"),
                        )
                    )
                    touched = touched.unionByName(stored_back)
                bw = Window.partitionBy("src").orderBy(
                    F.col("dot_num").desc(), "dst"
                )
                merged = (
                    touched.dropDuplicates(["src", "dst"])
                    .withColumn("brk", F.row_number().over(bw))
                    .filter(F.col("brk") <= m_back)
                    .select(
                        "src",
                        "dst",
                        "dot_num",
                        F.lit(-1).alias("rk"),
                        F.col("bcell").alias("cluster_id"),
                    )
                    .localCheckpoint()
                )
                prev = spark.conf.get(
                    "spark.sql.sources.partitionOverwriteMode", "static"
                )
                spark.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", "dynamic"
                )
                try:
                    merged.write.partitionBy("cluster_id").mode(
                        "overwrite"
                    ).parquet(back_path)
                finally:
                    spark.conf.set(
                        "spark.sql.sources.partitionOverwriteMode", prev
                    )
                # -- (2) guarded out-edge append: a crash after (2)
                # before (3) leaves edge rows whose node rows are
                # missing — the replay recomputes the batch, and this
                # anti-join (pruned to the batch's own cells) drops the
                # already-written srcs instead of double-appending.
                # The pruning list is the batch's own `cells` (already
                # collected): every out-edge's cluster_id is its src's
                # OWN coarse cell and fresh ⊆ asg, so edge cells ⊆
                # cells — reusing it drops a distinct+collect job per
                # micro-batch (r13)
                written_srcs = (
                    spark.read.parquet(edges_path)
                    .filter(F.col("cluster_id").isin(cells))
                    .select("src")
                    .distinct()
                )
                out_edges.join(written_srcs, "src", "left_anti").write.mode(
                    "append"
                ).partitionBy("cluster_id").parquet(edges_path)
                # -- (3) node append (the original stored-node guard)
                fresh.select(
                    "vec_id", "iu", F.lit(False).alias("in_pool"), "cluster_id"
                ).write.mode("append").partitionBy("cluster_id").parquet(
                    nodes_path
                )
    finally:
        asg.unpersist()
    appended = meta.get("appended", [])
    appended.append(fp_new)
    meta["appended"] = appended[-_KNNG_APPEND_LOG_CAP:]
    stores.write_meta(path, meta, _KNNG_META)


def _compact_cells(spark, table_path: str, max_files_per_cell: int) -> int:
    """Rewrite the OVERSIZED cells of one cluster_id-partitioned table
    via dynamic partition overwrite — only cells past the file budget
    rewrite, each as its own task; no single-task whole-table pass (the
    r12 `coalesce(1)` straggler). Returns the number of cells
    compacted."""
    import os

    from kinesis_dstream_spark.operators.ann_index import _n_parquet_files

    if not os.path.isdir(table_path):
        return 0
    oversized = [
        int(entry.split("=", 1)[1])
        for entry in os.listdir(table_path)
        if entry.startswith("cluster_id=")
        and _n_parquet_files(os.path.join(table_path, entry)) > max_files_per_cell
    ]
    if not oversized:
        return 0
    rows = (
        spark.read.parquet(table_path)
        .filter(F.col("cluster_id").isin(oversized))
        .repartition("cluster_id")
        .localCheckpoint()
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        rows.write.partitionBy("cluster_id").mode("overwrite").parquet(
            table_path
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return len(oversized)


def knn_graph_store_compact(
    spark, path: str, max_files_per_cell: int = 8
) -> dict[str, int]:
    """Small-file compaction for the graph store (the `_pq_store_compact`
    contract): per-batch appends leave one file set per micro-batch in
    each touched cell of ``nodes/``, ``edges/`` and ``back/``; all
    three are cluster_id-partitioned (r13), so compaction is uniform
    per-cell dynamic partition overwrite — only oversized cells
    rewrite, in parallel, bounded by the cell's own row count (the r12
    edges-side ``coalesce(1)`` single-task whole-adjacency rewrite is
    gone). CONTENT-PRESERVING by construction (no re-pruning — the
    m-bound restore is the deliberate invalidate+ensure rebuild, the
    quantizer-store refit contract). Clears the append fast-path log;
    row-level idempotence still holds for replays of evicted batches."""
    import os

    from kinesis_dstream_spark import stores
    from kinesis_dstream_spark.operators.ann_index import _n_parquet_files

    parts = [os.path.join(path, s) for s in ("nodes", "edges", "back")]
    files_before = sum(_n_parquet_files(p) for p in parts if os.path.isdir(p))
    cells = sum(_compact_cells(spark, p, max_files_per_cell) for p in parts)
    meta = stores.read_meta(path, _KNNG_META)
    if meta is not None and meta.get("appended"):
        meta["appended"] = []
        stores.write_meta(path, meta, _KNNG_META)
    return {
        "cells_compacted": cells,
        "files_before": files_before,
        "files_after": sum(
            _n_parquet_files(p) for p in parts if os.path.isdir(p)
        ),
    }


def knn_graph_beam_curve(
    embeddings: DataFrame,
    n_queries: int = 10,
    topk: int = 5,
    beams: tuple = (8, 16, 24),
    m: int = _M,
    n_probe: int = _N_PROBE,
    k: int = _K,
    n_assign: int = _N_ASSIGN,
    cell_cap: int = _CELL_CAP,
    n_entry: int = _N_ENTRY,
    rounds: int = _ROUNDS,
) -> DataFrame:
    """The efSearch tuning curve — THE accuracy-vs-compute knob of
    graph ANN (HNSW exposes exactly this trade): recall@k + MRR vs the
    exact integer-dot ground truth at each candidate beam width, over
    ONE shared graph build. The table a deployment reads to pick its
    serving beam; measured on the fixture it reproduces the textbook
    monotone curve (wider beam → recall up, cost up) that the
    beam-monotonicity pytest pins as an invariant.

    Cost: one graph build + one exact-truth pass shared across all
    widths; each width pays only its beam rounds (|q|·beam·m candidate
    rows per round). Exact trunc-div ppm integers end to end —
    oracle-paired (the twin re-runs the beam chain per width)."""
    edges = knn_graph_edges(embeddings, m, n_probe, k, n_assign, cell_cap)
    iarr = _unit_int_arrays(embeddings).localCheckpoint()
    return _beam_curve_from(
        _adjacency_with_vecs(edges, iarr),
        iarr,
        n_queries,
        topk,
        beams,
        n_entry,
        rounds,
    )


def knn_graph_beam_curve_frozen(
    spark,
    path: str,
    n_queries: int = 10,
    topk: int = 5,
    beams: tuple = (8, 16, 24),
    n_entry: int = _N_ENTRY,
    rounds: int = _ROUNDS,
) -> DataFrame:
    """The efSearch curve over the PERSISTED store's built graph (the
    r12 verdict's shared-build path — one ensure amortized across the
    family's bench entries). Identical rows to the fresh-build curve
    on the same corpus; keeps ``KNN_GRAPH_BEAM_CURVE_SQL``."""
    import os

    from kinesis_dstream_spark import stores

    if stores.read_meta(path, _KNNG_META) is None:
        raise FileNotFoundError(
            f"knn_graph_beam_curve_frozen: no complete store at {path}"
        )
    iarr = (
        spark.read.parquet(os.path.join(path, "nodes"))
        .select("vec_id", "iu")
        .localCheckpoint()
    )
    edges_iu = _adjacency_with_vecs(
        spark.read.parquet(os.path.join(path, "edges")), iarr
    )
    return _beam_curve_from(
        edges_iu, iarr, n_queries, topk, beams, n_entry, rounds
    )


def _beam_curve_from(
    edges_iu: DataFrame,
    iarr: DataFrame,
    n_queries: int,
    topk: int,
    beams: tuple,
    n_entry: int,
    rounds: int,
) -> DataFrame:
    queries = iarr.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("iu").alias("q_iu")
    )
    tw = Window.partitionBy("q_id").orderBy(F.col("dot_num").desc(), "c_id")
    truth = (
        iarr.join(F.broadcast(queries), F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("c_id"),
            _dot_col("q_iu", "iu").alias("dot_num"),
        )
        .withColumn("trk", F.row_number().over(tw))
        .filter(F.col("trk") <= topk)
        .select("q_id", "c_id")
        .localCheckpoint()
    )
    rows = []
    for b in beams:
        approx = _beam_serve(
            edges_iu, iarr, n_queries, topk, n_entry, b, rounds
        )
        hits = approx.join(F.broadcast(truth), ["q_id", "c_id"])
        per_q = hits.groupBy("q_id").agg(
            F.count(F.lit(1)).alias("n_hits"), F.min("rk").alias("first_rk")
        )
        scored = queries.select("q_id").join(F.broadcast(per_q), "q_id", "left")
        rows.append(
            scored.agg(
                F.sum(F.coalesce("n_hits", F.lit(0))).alias("h"),
                F.sum(
                    F.coalesce(F.expr("1000000 div first_rk"), F.lit(0))
                ).alias("rr"),
            ).select(
                F.lit(b).cast("long").alias("beam"),
                F.col("h").cast("long").alias("n_hits_total"),
                F.expr(f"CAST(h * 1000000 div {n_queries * topk} AS BIGINT)")
                .alias("recall_ppm"),
                F.expr(f"CAST(rr div {n_queries} AS BIGINT)").alias("mrr_ppm"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def knn_graph_beam_curve_sql(
    n_queries: int = 10,
    topk: int = 5,
    beams: tuple = (8, 16, 24),
    m: int = _M,
    n_probe: int = _N_PROBE,
    k: int = _K,
    n_assign: int = _N_ASSIGN,
    cell_cap: int = _CELL_CAP,
    n_entry: int = _N_ENTRY,
    rounds: int = _ROUNDS,
) -> str:
    """Twin: the shared k-means chain + the graph BUILD chain emitted
    ONCE (the beam-width-independent part — k-means distances, pool,
    edges, entries, and the b0 entry beam are all shared) + only the
    width-dependent beam ROUNDS re-emitted per width under a
    ``kg{b}_`` prefix + the exact truth + the same trunc-div
    aggregates. (r12 ADVICE: the previous blanket string-replace
    re-emitted the whole k-means-dependent build per width.)"""
    sql = kmeans_oracle_cte(k=k, n_assign=n_assign)
    # everything up to the first round CTE is width-independent
    # (distances, pool, edges, qset, entries, the b0 entry beam)
    sql += knng_cte_sql(
        n_queries, m, n_probe, k, n_assign, cell_cap, n_entry, beams[0], rounds
    ).split(", kg_c1 AS")[0]
    for b in beams:
        sql += _knng_rounds_cte(f"kg{b}_", "kg_b0", "kg_edges", "kg_q", b, rounds)
    sql += f""", bc_truth AS MATERIALIZED (
  SELECT q_id, c_id FROM (
    SELECT q.q_id, ia.vec_id AS c_id,
           row_number() OVER (PARTITION BY q.q_id
             ORDER BY {_DOT.format(a="q.q_iu", b="ia.iu")} DESC, ia.vec_id)
             AS trk
    FROM kg_q q JOIN iarr ia ON ia.vec_id <> q.q_id
  ) WHERE trk <= {topk}
)"""
    legs = []
    for b in beams:
        legs.append(f"""
SELECT CAST({b} AS BIGINT) AS beam,
       CAST(coalesce(sum(s.n_hits), 0) AS BIGINT) AS n_hits_total,
       CAST(coalesce(sum(s.n_hits), 0) * 1000000
            // {n_queries * topk} AS BIGINT) AS recall_ppm,
       CAST(coalesce(sum(s.rr), 0) // {n_queries} AS BIGINT) AS mrr_ppm
FROM kg_q q LEFT JOIN (
  SELECT a.q_id, count(*) AS n_hits, 1000000 // min(a.rk) AS rr
  FROM (
    SELECT q_id, node AS c_id, rk FROM (
      SELECT q_id, node,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY dot_num DESC, node) AS rk
      FROM kg{b}_b{rounds}
    ) WHERE rk <= {topk}
  ) a JOIN bc_truth t ON t.q_id = a.q_id AND t.c_id = a.c_id
  GROUP BY 1
) s ON s.q_id = q.q_id""")
    sql += "\nUNION ALL".join(legs)
    return sql


KNN_GRAPH_BEAM_CURVE_SQL = knn_graph_beam_curve_sql()


def matryoshka_recall_report(
    embeddings: DataFrame,
    n_queries: int = 10,
    topk: int = 5,
    prefixes: tuple = (16, 32, 64),
) -> DataFrame:
    """Matryoshka (MRL, Kusupati et al. 2022 — public) truncation
    evaluation: recall@k + MRR of EXACT search over the first ``p``
    dimensions vs the full-dimension exact truth, one row per prefix
    length — the dimension-vs-recall decision table teams read before
    shipping truncated embeddings (truncation is the cheapest index
    compression there is: it needs NO model, just a slice). The
    fixture's embeddings are not MRL-trained, so the curve shows the
    honest untrained baseline; the operator is the harness.

    Exactness: integer dots over the same µ-unit grid as every ANN
    tier; truncation is an array slice, so the whole table is
    SQL-expressible (unlike the learned quantizers) — fully
    oracle-paired, no golden pin needed.

    Scale: the truth pass and each prefix pass share the honest
    |corpus|·|q| exact-dot envelope, prefix passes cheaper by p/d —
    evals run on bounded query batches, and truncated dots are the
    serving-cost model being measured."""
    iarr = _unit_int_arrays(embeddings).localCheckpoint()
    queries = iarr.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("iu").alias("q_iu")
    )
    tw = Window.partitionBy("q_id").orderBy(F.col("dot_num").desc(), "c_id")
    base = iarr.join(F.broadcast(queries), F.col("vec_id") != F.col("q_id"))
    truth = (
        base.select(
            "q_id",
            F.col("vec_id").alias("c_id"),
            _dot_col("q_iu", "iu").alias("dot_num"),
        )
        .withColumn("trk", F.row_number().over(tw))
        .filter(F.col("trk") <= topk)
        .select("q_id", "c_id")
        .localCheckpoint()
    )
    rows = []
    for p in prefixes:
        pdot = F.aggregate(
            F.zip_with(
                F.slice(F.col("q_iu"), 1, p),
                F.slice(F.col("iu"), 1, p),
                lambda x, y: x * y,
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        approx = (
            base.select(
                "q_id", F.col("vec_id").alias("c_id"), pdot.alias("dot_num")
            )
            .withColumn("rk", F.row_number().over(tw))
            .filter(F.col("rk") <= topk)
            .select("q_id", "c_id", "rk")
        )
        hits = approx.join(F.broadcast(truth), ["q_id", "c_id"])
        per_q = hits.groupBy("q_id").agg(
            F.count(F.lit(1)).alias("n_hits"), F.min("rk").alias("first_rk")
        )
        scored = queries.select("q_id").join(F.broadcast(per_q), "q_id", "left")
        rows.append(
            scored.agg(
                F.sum(F.coalesce("n_hits", F.lit(0))).alias("h"),
                F.sum(
                    F.coalesce(F.expr("1000000 div first_rk"), F.lit(0))
                ).alias("rr"),
            ).select(
                F.lit(p).cast("long").alias("prefix_dims"),
                F.col("h").cast("long").alias("n_hits_total"),
                F.expr(f"CAST(h * 1000000 div {n_queries * topk} AS BIGINT)")
                .alias("recall_ppm"),
                F.expr(f"CAST(rr div {n_queries} AS BIGINT)").alias("mrr_ppm"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def matryoshka_recall_sql(
    n_queries: int = 10, topk: int = 5, prefixes: tuple = (16, 32, 64)
) -> str:
    """Twin: the shared iarr chain + one exact prefix-dot ranking per
    prefix length + the same trunc-div aggregates."""
    dot_full = _DOT.format(a="q.q_iu", b="ia.iu")
    sql = (
        kmeans_oracle_cte().split(", seeds AS")[0]
        + f""", mq AS (
  SELECT vec_id AS q_id, iu AS q_iu FROM iarr WHERE vec_id < {n_queries}
), m_truth AS MATERIALIZED (
  SELECT q_id, c_id FROM (
    SELECT q.q_id, ia.vec_id AS c_id,
           row_number() OVER (PARTITION BY q.q_id
             ORDER BY {dot_full} DESC, ia.vec_id) AS trk
    FROM mq q JOIN iarr ia ON ia.vec_id <> q.q_id
  ) WHERE trk <= {topk}
)"""
    )
    legs = []
    for p in prefixes:
        pdot = _DOT.format(
            a=f"list_slice(q.q_iu, 1, {p})", b=f"list_slice(ia.iu, 1, {p})"
        )
        sql += f""", m_ap{p} AS (
  SELECT q_id, c_id, rk FROM (
    SELECT q.q_id, ia.vec_id AS c_id,
           row_number() OVER (PARTITION BY q.q_id
             ORDER BY {pdot} DESC, ia.vec_id) AS rk
    FROM mq q JOIN iarr ia ON ia.vec_id <> q.q_id
  ) WHERE rk <= {topk}
)"""
        legs.append(f"""
SELECT CAST({p} AS BIGINT) AS prefix_dims,
       CAST(coalesce(sum(s.n_hits), 0) AS BIGINT) AS n_hits_total,
       CAST(coalesce(sum(s.n_hits), 0) * 1000000
            // {n_queries * topk} AS BIGINT) AS recall_ppm,
       CAST(coalesce(sum(s.rr), 0) // {n_queries} AS BIGINT) AS mrr_ppm
FROM mq q LEFT JOIN (
  SELECT a.q_id, count(*) AS n_hits, 1000000 // min(a.rk) AS rr
  FROM m_ap{p} a JOIN m_truth t ON t.q_id = a.q_id AND t.c_id = a.c_id
  GROUP BY 1
) s ON s.q_id = q.q_id""")
    sql += "\nUNION ALL".join(legs)
    return sql


MATRYOSHKA_RECALL_SQL = matryoshka_recall_sql()


def ann_knn_graph_filtered_topk(
    embeddings: DataFrame,
    n_queries: int = 10,
    topk: int = 5,
    m: int = _M,
    n_probe: int = _N_PROBE,
    k: int = _K,
    n_assign: int = _N_ASSIGN,
    cell_cap: int = _CELL_CAP,
    n_entry: int = _N_ENTRY,
    beam: int = _BEAM,
    rounds: int = _ROUNDS,
) -> DataFrame:
    """FILTERED vector search over the graph tier — the production
    feature every vector store ships (Qdrant/Weaviate filtered HNSW,
    FAISS IDSelector): top-k among candidates satisfying a metadata
    predicate, here "same ``label`` as the query" (the fixture's only
    metadata column; a real deployment parameterizes the predicate).
    The serving strategy is the standard POST-FILTER-with-oversampling:
    beam search runs UNFILTERED at width ``beam`` (filtering the
    traversal itself breaks graph connectivity — the documented
    filtered-HNSW failure mode), then the final beam is label-filtered
    and re-ranked; beam > topk is the oversampling that keeps filtered
    recall usable. Queries with fewer than topk matching candidates in
    the beam honestly return fewer rows — identical in both engines.

    Output: (q_id, c_id, dot_num, rk) with rk dense over the MATCHING
    candidates per query."""
    edges = knn_graph_edges(embeddings, m, n_probe, k, n_assign, cell_cap)
    iarr = _unit_int_arrays(embeddings).localCheckpoint()
    return _filtered_from(
        _adjacency_with_vecs(edges, iarr),
        iarr,
        embeddings,
        n_queries,
        topk,
        n_entry,
        beam,
        rounds,
    )


def ann_knn_graph_filtered_frozen(
    spark,
    path: str,
    embeddings: DataFrame,
    n_queries: int = 10,
    topk: int = 5,
    n_entry: int = _N_ENTRY,
    beam: int = _BEAM,
    rounds: int = _ROUNDS,
) -> DataFrame:
    """Filtered graph search over the PERSISTED store's built graph
    (the r12 verdict's shared-build path); ``embeddings`` supplies the
    label metadata column. Identical rows to the fresh-build variant;
    keeps ``ANN_KNN_GRAPH_FILTERED_SQL``."""
    import os

    from kinesis_dstream_spark import stores

    if stores.read_meta(path, _KNNG_META) is None:
        raise FileNotFoundError(
            f"ann_knn_graph_filtered_frozen: no complete store at {path}"
        )
    iarr = (
        spark.read.parquet(os.path.join(path, "nodes"))
        .select("vec_id", "iu")
        .localCheckpoint()
    )
    edges_iu = _adjacency_with_vecs(
        spark.read.parquet(os.path.join(path, "edges")), iarr
    )
    return _filtered_from(
        edges_iu, iarr, embeddings, n_queries, topk, n_entry, beam, rounds
    )


def _filtered_from(
    edges_iu: DataFrame,
    iarr: DataFrame,
    embeddings: DataFrame,
    n_queries: int,
    topk: int,
    n_entry: int,
    beam: int,
    rounds: int,
) -> DataFrame:
    full_beam = _beam_serve(
        edges_iu, iarr, n_queries, beam, n_entry, beam, rounds
    )
    labels = embeddings.select("vec_id", "label")
    q_labels = labels.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("label").alias("q_label")
    )
    fw = Window.partitionBy("q_id").orderBy(F.col("dot_num").desc(), "c_id")
    return (
        # broadcast the |q|·beam final beam, NOT the corpus-sized label
        # table (r12 ADVICE: the labels stay the streamed/probe side —
        # the family's only corpus-sized broadcast is gone)
        F.broadcast(full_beam)
        .join(labels.withColumnRenamed("vec_id", "c_id"), "c_id")
        .join(F.broadcast(q_labels), "q_id")
        .filter(F.col("label") == F.col("q_label"))
        .select("q_id", "c_id", "dot_num")
        .withColumn("rk", F.row_number().over(fw))
        .filter(F.col("rk") <= topk)
    )


def ann_knn_graph_filtered_sql(
    n_queries: int = 10,
    topk: int = 5,
    m: int = _M,
    n_probe: int = _N_PROBE,
    k: int = _K,
    n_assign: int = _N_ASSIGN,
    cell_cap: int = _CELL_CAP,
    n_entry: int = _N_ENTRY,
    beam: int = _BEAM,
    rounds: int = _ROUNDS,
) -> str:
    """Twin: the kg beam chain (full width — the unfiltered traversal)
    + the same label post-filter and re-rank."""
    return (
        kmeans_oracle_cte(k=k, n_assign=n_assign)
        + knng_cte_sql(
            n_queries, m, n_probe, k, n_assign, cell_cap, n_entry, beam, rounds
        )
        + f"""
SELECT q_id, c_id, dot_num, CAST(rk AS BIGINT) AS rk FROM (
  SELECT b.q_id, b.node AS c_id, b.dot_num,
         row_number() OVER (PARTITION BY b.q_id
                            ORDER BY b.dot_num DESC, b.node) AS rk
  FROM kg_b{rounds} b
  JOIN embeddings ec ON ec.vec_id = b.node
  JOIN embeddings eq ON eq.vec_id = b.q_id
  WHERE ec.label = eq.label
) WHERE rk <= {topk}
"""
    )


ANN_KNN_GRAPH_FILTERED_SQL = ann_knn_graph_filtered_sql()
