"""PageRank semantics (oracle parity runs in test_oracle_parity.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_dstream_spark.operators import graph
from kinesis_dstream_spark.tables import load_table


def test_pagerank_star_center_dominates(spark):
    """On a star (hub ↔ 4 leaves) the hub must out-rank every leaf."""
    pairs = [(0, leaf) for leaf in (1, 2, 3, 4)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs], "src long, dst long"
    )
    ranks = {r.node: r.r for r in graph.pagerank(edges, n_iter=3).collect()}
    assert all(ranks[0] > ranks[leaf] for leaf in (1, 2, 3, 4))
    assert ranks[1] == ranks[2] == ranks[3] == ranks[4]  # symmetry


def test_pagerank_mass_roughly_conserved(spark, sf_dir):
    """Total rank ≈ 1: truncating division only ever LOSES mass, ≤1e-9
    per term per round — the sum must sit just under 1, never over."""
    out = graph.pagerank_near_dup_graph(load_table(spark, sf_dir, "documents"))
    rows = out.collect()
    assert rows, "near-dup graph should be non-empty on the fixture"
    total = sum(r.pr for r in rows)
    assert 0.95 < total <= 1.0 + 1e-9
    assert all(r.pr > 0 for r in rows)


def test_pagerank_plan_no_cartesian(spark, sf_dir):
    df = graph.pagerank_near_dup_graph(load_table(spark, sf_dir, "documents"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_graph_stats_invariants(spark, sf_dir):
    """Handshake identity, triangle bound (≤ triads/3 when every triad
    closes), clustering ∈ [0, 1]."""
    r = graph.near_dup_graph_stats(load_table(spark, sf_dir, "documents")).collect()[0]
    assert r.n_nodes > 0 and r.n_edges > 0
    assert abs(r.avg_degree - 2 * r.n_edges / r.n_nodes) < 1e-3  # handshake
    assert r.max_degree >= r.avg_degree
    assert r.n_triangles >= 0
    if r.clustering_coeff is not None:
        assert 0.0 <= r.clustering_coeff <= 1.0


def test_triangle_count_on_known_graph(spark):
    """K4 has 4 triangles; adding a pendant edge adds none."""
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b] + [(3, 9)]
    edges = spark.createDataFrame(k4, "doc_a long, doc_b long")
    # count via the same oriented-join shape the operator uses
    from pyspark.sql import functions as F2

    pairs = edges.select(
        F2.least("doc_a", "doc_b").alias("u"), F2.greatest("doc_a", "doc_b").alias("v")
    ).distinct()
    e1 = pairs.select(F2.col("u").alias("a"), F2.col("v").alias("b"))
    e2 = pairs.select(F2.col("u").alias("b"), F2.col("v").alias("c"))
    tri = (
        e1.join(e2, "b")
        .join(pairs.select(F2.col("u").alias("a"), F2.col("v").alias("c")), ["a", "c"])
        .count()
    )
    assert tri == 4


def test_lpa_on_constructed_two_block_graph(spark):
    """Two 4-cliques joined by one bridge edge: CC sees one component,
    LPA must keep two communities (the bridge cannot outvote a
    clique), each labeled by its minimum member."""
    from kinesis_dstream_spark.operators import graph

    edges = []
    a = [1, 2, 3, 4]
    b = [10, 11, 12, 13]
    for blk in (a, b):
        for i in range(len(blk)):
            for j in range(i + 1, len(blk)):
                edges.append((blk[i], blk[j]))
    edges.append((4, 10))  # bridge
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = {
        r["community"]: r
        for r in graph.label_propagation_communities(None, pairs=pairs).collect()
    }
    assert set(out) == {1, 10}
    assert out[1]["n_members"] == 4 and out[1]["sum_member_ids"] == 10
    assert out[10]["n_members"] == 4 and out[10]["sum_member_ids"] == 46


def test_k_core_fixed_round_peel(spark):
    """Hand graph: triangle {10,11,12} + pendant chain 12-20-21.
    2-core peeling removes 21 (deg 1) in round 1, then 20 (deg 1 after
    21 left) in round 2; the triangle survives with degree 2 each."""
    from kinesis_dstream_spark.operators import graph

    pairs = spark.createDataFrame(
        [(10, 11), (11, 12), (10, 12), (12, 20), (20, 21)],
        "doc_a long, doc_b long",
    )
    out = {
        r["doc_id"]: r["core_degree"]
        for r in graph.k_core_members(None, k=2, n_iter=3, pairs=pairs).collect()
    }
    assert out == {10: 2, 11: 2, 12: 2}


def test_k_core_oracle_unrolls_same_recurrence(spark, duck, sf_dir):
    from kinesis_dstream_spark.operators import graph
    from kinesis_dstream_spark.operators.dedup import dedup_ngram_jaccard
    from kinesis_dstream_spark.registry import _SQL_DEDUP_JACCARD
    from kinesis_dstream_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = sorted(
        map(tuple, graph.k_core_members(docs, pairs=dedup_ngram_jaccard(docs)).collect())
    )
    want = sorted(
        map(tuple, duck.execute(graph.k_core_oracle_sql(_SQL_DEDUP_JACCARD)).fetchall())
    )
    assert got == want and len(got) > 0


def test_k_truss_fixed_round_peel(spark):
    """Hand graph: K4 on {1,2,3,4} plus a lone triangle {4,5,6} plus a
    pendant edge 6-9. k=4 truss (support ≥ 2): the lone triangle's
    edges have support 1 → peeled round 1; the pendant has support 0;
    K4's six edges each close 2 triangles and survive with support 2."""
    from kinesis_dstream_spark.operators import graph

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    extra = [(4, 5), (4, 6), (5, 6), (6, 9)]
    pairs = spark.createDataFrame(k4 + extra, "doc_a long, doc_b long")
    out = {
        (r["doc_a"], r["doc_b"]): r["truss_support"]
        for r in graph.k_truss_edges(None, k=4, n_iter=2, pairs=pairs).collect()
    }
    assert out == {e: 2 for e in k4}


def test_k_truss_orientation_matches_plain_closure(spark, duck, sf_dir):
    """The degree-oriented Spark enumeration and the plain a<b<c oracle
    closure must count identical supports on the fixture graph."""
    from kinesis_dstream_spark.operators import graph
    from kinesis_dstream_spark.operators.dedup import dedup_ngram_jaccard
    from kinesis_dstream_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup_ngram_jaccard(docs).localCheckpoint()
    got = sorted(
        map(tuple, graph.k_truss_edges(None, k=3, n_iter=2, pairs=pairs).collect())
    )
    # independent check: triangles via adjacency sets in plain Python
    edges = {(r["doc_a"], r["doc_b"]) for r in pairs.select("doc_a", "doc_b").collect()}
    es = set(edges)
    for _ in range(2):
        nbrs: dict = {}
        for a, b in es:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        supp = {
            (a, b): len(nbrs[a] & nbrs[b]) for a, b in es
        }
        es = {e for e in es if supp[e] >= 1}
    nbrs = {}
    for a, b in es:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    want = sorted((a, b, len(nbrs[a] & nbrs[b])) for a, b in es)
    assert got == want
