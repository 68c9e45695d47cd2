"""Semantic clustering + SemDeDup: numpy reference, edge cases, plan."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from kinesis_dstream_spark.operators import clustering
from kinesis_dstream_spark.tables import load_table

S = clustering._SCALE


def _numpy_reference(rows, k, n_assign):
    """Independent Lloyd re-implementation (fold-norm, trunc-div)."""
    ids = np.array([r[0] for r in rows])
    V = [r[1] for r in rows]

    def fold_norm(v):
        acc = 0.0
        for y in v:
            acc += float(y) * float(y)
        return math.sqrt(acc)

    IU = np.array(
        [[round(float(x) / fold_norm(v) * S) for x in v] for v in V],
        dtype=np.int64,
    )
    order = sorted(
        range(len(ids)),
        key=lambda i: (hashlib.md5(f"kmeans:{ids[i]}".encode()).hexdigest(), ids[i]),
    )
    cents = {c: IU[order[c]].copy() for c in range(k)}

    def assign(cents):
        cids = sorted(cents)
        C = np.stack([cents[c] for c in cids])
        d = ((IU[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)  # first min == smallest cid
        return (
            np.array([cids[j] for j in a]),
            d[np.arange(len(ids)), a],
        )

    cid, dist = assign(cents)
    for _ in range(n_assign - 1):
        nxt = {}
        for c in sorted(cents):
            m = IU[cid == c]
            if len(m):  # empty centroid drops out
                nxt[c] = np.trunc(m.sum(axis=0) / len(m)).astype(np.int64)
        cents = nxt
        cid, dist = assign(cents)
    return ids, cid, dist


def test_kmeans_matches_numpy_reference(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    rows = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.select("vec_id", "embedding").collect()
    ]
    ids, cid, dist = _numpy_reference(rows, clustering._K, clustering._N_ASSIGN)
    expected = {int(i): (int(c), int(d)) for i, c, d in zip(ids, cid, dist)}
    got = {
        int(r["vec_id"]): (int(r["cluster_id"]), int(r["dist"]))
        for r in clustering.embedding_kmeans_assign(emb).collect()
    }
    assert got == expected


def test_semantic_dedup_matches_numpy_reference(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    rows = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.select("vec_id", "embedding").collect()
    ]
    ids, cid, _ = _numpy_reference(rows, clustering._K, clustering._N_ASSIGN)
    IU = {}
    for r_id, v in rows:

        def fold_norm(v):
            acc = 0.0
            for y in v:
                acc += float(y) * float(y)
            return math.sqrt(acc)

        IU[r_id] = np.array([round(float(x) / fold_norm(v) * S) for x in v], np.int64)
    dropped = set()
    for c in set(cid.tolist()):
        members = sorted(int(i) for i in ids[cid == c])
        capped = sorted(
            sorted(
                members,
                key=lambda v: (hashlib.md5(f"sem:{v}".encode()).hexdigest(), v),
            )[: clustering._SEM_CAP]
        )
        for bi, b in enumerate(capped):
            for a in capped[:bi]:
                if int(IU[a] @ IU[b]) >= clustering._SEM_TAU_FP:
                    dropped.add(b)
                    break
    expected = {}
    for c in set(cid.tolist()):
        mem = [int(i) for i in ids[cid == c]]
        dr = sum(1 for v in mem if v in dropped)
        expected[int(c)] = (len(mem), dr, len(mem) - dr)
    got = {
        int(r["cluster_id"]): (
            int(r["n_members"]),
            int(r["n_dropped"]),
            int(r["n_kept"]),
        )
        for r in clustering.semantic_cluster_dedup(emb).collect()
    }
    assert got == expected
    assert sum(v[1] for v in got.values()) > 0, "τ must exercise the drop path"


def test_empty_centroid_drops_out(spark):
    # three coincident points, k=2: every point picks cid 0 (tie→min),
    # the update leaves centroid 1 memberless, the final round must run
    # with the surviving centroid only
    df = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.0, 0.0], 0) for i in range(3)],
        "vec_id long, embedding array<double>, label long",
    )
    out = clustering.embedding_kmeans_profile(df, k=2, n_assign=2).collect()
    assert len(out) == 1
    assert out[0]["n_members"] == 3
    assert out[0]["inertia_num"] == 0


def test_cap_bounds_pair_stage(spark):
    # 4 identical vectors in one cluster, cap=2: only the two capped
    # representatives can pair, so exactly ONE drop (the higher-id of
    # the capped pair) even though all 4 are mutually identical
    df = spark.createDataFrame(
        [(i, [0.0, 1.0, 0.0, 0.0], 0) for i in range(4)],
        "vec_id long, embedding array<double>, label long",
    )
    out = clustering.semantic_cluster_dedup(
        df, k=1, n_assign=2, tau_fp=int(0.99 * S * S), cap=2
    ).collect()
    assert len(out) == 1
    assert out[0]["n_members"] == 4
    assert out[0]["n_dropped"] == 1
    assert out[0]["n_kept"] == 3


def test_assignment_is_joinless_map_side(spark, sf_dir):
    # the scale contract: scoring against literal centroids must not
    # introduce a join or an exchange before the argmin — the plan of
    # the assignment DataFrame contains no Exchange at all
    emb = load_table(spark, sf_dir, "embeddings")
    asg = clustering.embedding_kmeans_assign(emb)
    plan = asg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_ivf_deterministic_recall_and_probe_semantics(spark, sf_dir):
    """The deterministic IVF must (a) return exactly topk rows per
    query, (b) only surface candidates from the query's n_probe
    nearest cells, and (c) achieve nonzero recall vs the exact
    brute-force integer ranking (isotropic-fixture caveat: cell
    pruning is genuinely lossy here, so the bound is modest — the
    determinism, not the recall, is this operator's claim)."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    out = clustering.ivf_deterministic_topk(emb, n_queries=10, topk=5).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r["q_id"], []).append(r)
    assert set(per_q) == set(range(10))
    assert all(len(v) == 5 for v in per_q.values())
    for v in per_q.values():
        rks = sorted(r["rk"] for r in v)
        assert rks == [1, 2, 3, 4, 5]
        dots = [r["dot_num"] for r in sorted(v, key=lambda r: r["rk"])]
        assert dots == sorted(dots, reverse=True)

    # brute-force exact integer ranking for recall
    iarr = {r["vec_id"]: np.array(r["iu"], np.int64)
            for r in clustering._unit_int_arrays(emb).collect()}
    hits = total = 0
    for q in range(10):
        scores = sorted(
            ((int(iarr[q] @ v), c) for c, v in iarr.items() if c != q),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        truth = {c for _, c in scores}
        got = {r["c_id"] for r in per_q[q]}
        hits += len(truth & got)
        total += 5
    assert hits / total >= 0.2, f"recall {hits/total} below floor"


def test_ivf_deterministic_is_reproducible(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = sorted(map(tuple, clustering.ivf_deterministic_topk(emb).collect()))
    b = sorted(map(tuple, clustering.ivf_deterministic_topk(emb).collect()))
    assert a == b


def test_ivf_serve_matches_build_and_detects_staleness(spark, sf_dir, tmp_path):
    """r9 build/serve split: (a) the persisted-store serve returns
    row-identical results to the build-per-call operator (the fit is
    deterministic, so one oracle certifies both); (b) the serve plan
    partition-prunes to the probed cells (static IN on cluster_id in
    PartitionFilters); (c) a poisoned fingerprint triggers a rebuild
    whose meta re-matches the corpus."""
    import json
    import os

    path = str(tmp_path / "ivf_det")
    emb = load_table(spark, sf_dir, "embeddings")
    build = sorted(
        map(tuple, clustering.ivf_deterministic_topk(emb).collect())
    )
    serve_df = clustering.ivf_deterministic_serve(emb, path)
    assert sorted(map(tuple, serve_df.collect())) == build

    plan = serve_df._jdf.queryExecution().executedPlan().toString()
    scan = next(
        ln for ln in plan.splitlines()
        if "FileScan parquet" in ln and "PartitionFilters: [cluster_id" in ln
    )
    assert " IN (" in scan.split("PartitionFilters", 1)[1]

    meta_path = os.path.join(path, clustering._IVF_DET_META)
    with open(meta_path) as f:
        good_fp = json.load(f)["fingerprint"]
    clustering.ivf_det_store_invalidate(path)
    with open(meta_path) as f:
        assert json.load(f)["fingerprint"] == "invalidated-by-erasure"
    # re-ensure: rebuilds and restores the corpus fingerprint
    cents, codes = clustering.ivf_det_store_ensure(emb, path)
    with open(meta_path) as f:
        assert json.load(f)["fingerprint"] == good_fp
    assert codes.count() == emb.count()


def test_arrow_assignment_kernel_matches_literal_bit_for_bit(spark, sf_dir):
    """r9 kernel flip (SCALE.md commitment): past k·d ≈ 2e5 terms the
    literal zip_with folds hit codegen limits and assignment switches
    to the Arrow int64 matmul. Both kernels must be BIT-identical —
    same exact squared-L2, same first-minimum (smallest-cid) tie rule
    — on the real fixture and on a constructed exact-tie case."""
    emb = load_table(spark, sf_dir, "embeddings")
    iarr = clustering._unit_int_arrays(emb).localCheckpoint()
    cents = clustering._collect_seed_centroids(emb, iarr, clustering._K)
    lit = sorted(map(tuple, clustering._assign_expr(iarr, cents).collect()))
    arw = sorted(map(tuple, clustering._assign_arrow(iarr, cents).collect()))
    assert [(r[0], r[2], r[3]) for r in lit] == [(r[0], r[2], r[3]) for r in arw]

    # constructed tie: two centroids equidistant from every point —
    # both kernels must pick the smaller cid
    rows = [(i, [int(x) for x in v]) for i, v in [(0, [5, 0]), (1, [0, 5])]]
    tie_iarr = spark.createDataFrame(rows, "vec_id long, iu array<long>")
    tie_cents = [(0, [10, 10]), (1, [10, 10]), (2, [-100, -100])]
    for fn in (clustering._assign_expr, clustering._assign_arrow):
        got = {r["vec_id"]: r["cluster_id"] for r in fn(tie_iarr, tie_cents).collect()}
        assert got == {0: 0, 1: 0}, fn.__name__

    # the dispatcher gate: fixture k·d sits far below the flip point
    assert clustering._K * 64 < clustering._ARROW_ASSIGN_MIN_TERMS


def test_ivf_ingest_is_replay_safe_and_frozen(spark, sf_dir, tmp_path):
    """r9 ingest: appending a batch twice must be a no-op (fingerprint
    replay guard — no duplicate code rows), appended vectors assign to
    the FROZEN stored centroids (meta centroids unchanged by append),
    and the frozen serve is deterministic across calls."""
    import json
    import os

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 4)
    newv = emb.filter(F.col("vec_id") % 5 == 4)
    path = str(tmp_path / "ivf_ing")
    clustering.ivf_det_store_ensure(base, path)
    meta_path = os.path.join(path, clustering._IVF_DET_META)
    with open(meta_path) as f:
        cents_before = json.load(f)["centroids"]

    clustering.ivf_det_store_append(newv, path)
    codes = spark.read.parquet(os.path.join(path, "codes"))
    n_after_first = codes.count()
    assert n_after_first == emb.count()

    clustering.ivf_det_store_append(newv, path)  # replay: no-op
    assert spark.read.parquet(os.path.join(path, "codes")).count() == n_after_first
    with open(meta_path) as f:
        meta = json.load(f)
    assert meta["centroids"] == cents_before, "append must never refit"
    assert len(meta["appended"]) == 1

    # crash-window replay: simulate "parquet appended, meta write
    # lost" by erasing the fingerprint record — the row-level
    # anti-join must still add zero duplicate rows
    meta["appended"] = []
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    clustering.ivf_det_store_append(newv, path)
    assert spark.read.parquet(os.path.join(path, "codes")).count() == n_after_first

    a = sorted(map(tuple, clustering.ivf_det_serve_frozen(emb, path).collect()))
    b = sorted(map(tuple, clustering.ivf_det_serve_frozen(emb, path).collect()))
    assert a == b and len(a) > 0


def test_ivf_compaction_preserves_serve_and_bounds_files(spark, sf_dir, tmp_path):
    """r9 lifecycle: three append batches inflate per-cell file counts;
    compaction rewrites ONLY oversized cells down to one file each and
    the frozen serve is bit-identical before/after."""
    import os

    from kinesis_dstream_spark.operators.ann_index import _n_parquet_files

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf_compact")
    clustering.ivf_det_store_ensure(emb.filter("vec_id % 5 = 0"), path)
    for m in (1, 2, 3, 4):
        clustering.ivf_det_store_append(emb.filter(f"vec_id % 5 = {m}"), path)
    codes_path = os.path.join(path, "codes")
    before_files = _n_parquet_files(codes_path)
    before = sorted(map(tuple, clustering.ivf_det_serve_frozen(emb, path).collect()))

    report = clustering.ivf_det_store_compact(spark, path, max_files_per_cell=2)
    assert report["cells_compacted"] > 0
    assert report["files_after"] < report["files_before"] == before_files
    for entry in os.listdir(codes_path):
        if entry.startswith("cluster_id="):
            assert _n_parquet_files(os.path.join(codes_path, entry)) <= 2, entry

    after = sorted(map(tuple, clustering.ivf_det_serve_frozen(emb, path).collect()))
    assert after == before

    # idempotent: a second compaction is a no-op
    again = clustering.ivf_det_store_compact(spark, path, max_files_per_cell=2)
    assert again["cells_compacted"] == 0


def test_ann_recall_mrr_report_arithmetic_and_bounds(spark, sf_dir):
    """The eval harness's integer arithmetic re-derived from its two
    (already oracle-paired) inputs: n_hits = |approx ∩ truth| per
    query, recall_ppm = hits·1e6 div k, rr_ppm = 1e6 div first true
    hit's rank — plus bounds and the none-found zero path."""
    from kinesis_dstream_spark.operators import clustering
    from kinesis_dstream_spark.operators.clustering import (
        _unit_int_arrays,
        ivf_deterministic_topk,
    )
    from kinesis_dstream_spark.tables import load_table
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    got = {r["q_id"]: r for r in
           clustering.ann_recall_mrr_report(emb).collect()}
    assert len(got) == 10

    iarr = _unit_int_arrays(emb).localCheckpoint()
    q = iarr.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("iu").alias("q_iu")
    )
    dot = F.aggregate(
        F.zip_with(F.col("q_iu"), F.col("iu"), lambda x, y: x * y),
        F.lit(0).cast("long"), lambda a, x: a + x,
    )
    w = Window.partitionBy("q_id").orderBy(F.col("dn").desc(), "c_id")
    truth = {}
    for r in (
        iarr.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .select("q_id", F.col("vec_id").alias("c_id"), dot.alias("dn"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5).collect()
    ):
        truth.setdefault(r["q_id"], set()).add(r["c_id"])
    approx = {}
    for r in ivf_deterministic_topk(emb).collect():
        approx.setdefault(r["q_id"], []).append((r["rk"], r["c_id"]))
    for qid, row in got.items():
        hits = [(rk, c) for rk, c in sorted(approx[qid]) if c in truth[qid]]
        assert row["n_hits"] == len(hits)
        assert row["recall_ppm"] == len(hits) * 1_000_000 // 5
        assert row["rr_ppm"] == (1_000_000 // hits[0][0] if hits else 0)
        assert 0 <= row["recall_ppm"] <= 1_000_000
