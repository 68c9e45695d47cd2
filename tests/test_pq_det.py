"""Deterministic PQ / IVF-PQ (operators/pq_det.py): semantic bounds on
STRUCTURED data plus the persisted-store lifecycle. Value-level
exactness is covered by the DuckDB oracles (registry entries
``ann_pq_det_topk`` / ``ann_ivf_pq_det_serve``) and the 3-scale golden
hashes; these tests pin what the oracle can't — that the operator is
USEFUL, not just reproducible."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from kinesis_dstream_spark.operators import pq_det
from kinesis_dstream_spark.operators.clustering import _unit_int_arrays

_N_CLUSTERS = 16
_PER_CLUSTER = 30


@pytest.fixture(scope="module")
def clustered_emb(spark):
    """Deterministic clustered corpus — the data shape PQ is FOR
    (production embeddings cluster; the isotropic parquet fixture is
    the adversarial case and is covered by the oracle + a documented
    caveat instead of a recall floor)."""
    rng = np.random.RandomState(7)
    centers = rng.randn(_N_CLUSTERS, 64)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = []
    for ci in range(_N_CLUSTERS):
        for _ in range(_PER_CLUSTER):
            v = centers[ci] + 0.05 * rng.randn(64)
            pts.append(v / np.linalg.norm(v))
    return spark.createDataFrame(
        [
            (i, f"c{i // _PER_CLUSTER}", [float(x) for x in p])
            for i, p in enumerate(pts)
        ],
        "vec_id long, label string, embedding array<float>",
    ).localCheckpoint()


def _exact_topk(emb, n_queries=10, k=5):
    iarr = _unit_int_arrays(emb).localCheckpoint()
    q = iarr.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("iu").alias("q_iu")
    )
    dot = F.aggregate(
        F.zip_with(F.col("q_iu"), F.col("iu"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    w = Window.partitionBy("q_id").orderBy(F.col("d").desc(), "c_id")
    return {
        (r.q_id, r.c_id)
        for r in q.crossJoin(iarr)
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", F.col("vec_id").alias("c_id"), dot.alias("d"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .collect()
    }


def test_flat_adc_cluster_purity(clustered_emb):
    """The flat ADC scan cannot rank WITHIN a tight cluster (all
    members share codes, ties break by id — inherent PQ quantization),
    but it must never confuse clusters: every returned neighbor comes
    from the query's own cluster."""
    rows = pq_det.ann_pq_det_topk(clustered_emb).collect()
    assert rows, "no results"
    purity = sum(
        1 for r in rows if r.c_id // _PER_CLUSTER == r.q_id // _PER_CLUSTER
    ) / len(rows)
    assert purity >= 0.9, purity


def test_ivf_pq_rerank_recall(clustered_emb, tmp_path):
    """The composed serve's exact rerank recovers true top-k once the
    ADC shortlist covers the query's cluster (shortlist=40 > cluster
    size 30 -> expect ~full recall; the default 20 < 30 is the honest
    shortlist-too-small regime and must still clear a usable floor)."""
    exact = _exact_topk(clustered_emb)
    wide = {
        (r.q_id, r.c_id)
        for r in pq_det.ivf_pq_det_serve(
            clustered_emb, str(tmp_path / "wide"), shortlist=40
        ).collect()
    }
    assert len(exact & wide) / len(exact) >= 0.9
    narrow = {
        (r.q_id, r.c_id)
        for r in pq_det.ivf_pq_det_serve(
            clustered_emb, str(tmp_path / "narrow"), shortlist=20
        ).collect()
    }
    assert len(exact & narrow) / len(exact) >= 0.5


def test_store_lifecycle_build_once_stale_rebuild_torn_meta(
    spark, sf_dir, tmp_path
):
    """ensure() must build once (meta untouched on a warm second
    call), serve identically from the warm store, rebuild on corpus
    change, treat a TORN meta sidecar as 'no complete build' (the
    stores.py seam contract), and refit after erasure invalidation."""
    import os

    from kinesis_dstream_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "store")
    first = pq_det.ivf_pq_det_serve(emb, path).collect()
    meta_path = os.path.join(path, pq_det._PQ_META)
    t1 = os.path.getmtime(meta_path)
    again = pq_det.ivf_pq_det_serve(emb, path).collect()
    assert os.path.getmtime(meta_path) == t1  # served warm, no rebuild
    assert sorted(map(tuple, first)) == sorted(map(tuple, again))

    # torn meta -> detectably incomplete -> ensure rebuilds
    with open(meta_path, "w") as f:
        f.write('{"fingerprint": "tr')  # truncated JSON
    rebuilt = pq_det.ivf_pq_det_serve(emb, path).collect()
    assert sorted(map(tuple, rebuilt)) == sorted(map(tuple, first))

    # erasure invalidation -> fingerprint mismatch -> refit on ensure
    pq_det.ivf_pq_det_store_invalidate(path)
    t2 = os.path.getmtime(meta_path)
    refit = pq_det.ivf_pq_det_serve(emb, path).collect()
    assert os.path.getmtime(meta_path) != t2  # rebuilt
    assert sorted(map(tuple, refit)) == sorted(map(tuple, first))

    # corpus change -> rebuild with different results allowed but
    # deterministic (two calls agree)
    half = emb.filter(F.col("vec_id") % 2 == 0)
    h1 = pq_det.ivf_pq_det_serve(half, path).collect()
    h2 = pq_det.ivf_pq_det_serve(half, path).collect()
    assert sorted(map(tuple, h1)) == sorted(map(tuple, h2))


def test_residual_reconstruction_beats_direct(clustered_emb):
    """The textbook residual-PQ claim: with the SAME code budget,
    quantizing x − c_cell reconstructs strictly better than quantizing
    x directly on clustered data (the residual cloud is centered and
    tighter, so the codes spend resolution on within-cell structure).
    Total squared reconstruction error, exact int64 arithmetic."""
    from kinesis_dstream_spark.operators.clustering import _fit_kmeans
    from kinesis_dstream_spark.operators.pq_det import (
        _fit_pq,
        _residual_arrays,
    )

    iarr, coarse_asg, coarse = _fit_kmeans(clustered_emb)
    cmap = {cid: coords for cid, coords in coarse}

    def recon_err(codes_df, codebooks, base_of):
        books = [dict(cb) for cb in codebooks]
        err = 0
        for r in codes_df.collect():
            base = base_of(r)
            recon = []
            for s, book in enumerate(books):
                recon.extend(book[r[f"code{s}"]])
            x = r["iu"]
            err += sum((xi - (bi + ri)) ** 2
                       for xi, bi, ri in zip(x, base, recon))
        return err

    # direct: reconstruct from the codes alone (base = 0)
    dcodes, dcbs = _fit_pq(iarr)
    direct_rows = dcodes.join(iarr, "vec_id")
    e_direct = recon_err(direct_rows, dcbs, lambda r: [0] * 64)

    # residual: reconstruct as c_cell + r-hat
    resid = _residual_arrays(coarse_asg, coarse)
    rcodes, rcbs = _fit_pq(resid.select("vec_id", "iu"), tag="rpq")
    res_rows = (
        rcodes.join(iarr, "vec_id")
        .join(coarse_asg.select("vec_id", "cluster_id"), "vec_id")
    )
    e_res = recon_err(res_rows, rcbs, lambda r: cmap[r["cluster_id"]])
    assert e_res < e_direct, (e_res, e_direct)


def test_residual_serve_recall_on_clustered(clustered_emb):
    """End-to-end residual IVF-PQ must recover true top-k on clustered
    data once the shortlist covers the cluster — same bar as the
    direct composed serve."""
    exact = _exact_topk(clustered_emb)
    got = {
        (r.q_id, r.c_id)
        for r in pq_det.ann_ivf_pq_res_topk(
            clustered_emb, shortlist=40
        ).collect()
    }
    assert len(exact & got) / len(exact) >= 0.9


def test_ingest_frozen_append_replay_and_compaction(spark, sf_dir, tmp_path):
    """The store's upkeep half: append assigns new vectors to the
    FROZEN quantizers (meta centroids/codebooks unchanged), a replayed
    batch appends zero rows (batch fingerprint fast path AND row-level
    anti-join), serve_frozen covers the union, and compaction neither
    changes served results nor keeps the append log."""
    import json
    import os

    from kinesis_dstream_spark import stores
    from kinesis_dstream_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 4)
    rest = emb.filter(F.col("vec_id") % 5 == 4)
    path = str(tmp_path / "ing")
    pq_det.ivf_pq_det_store_ensure(base, path)
    meta_before = json.dumps(
        {k: v for k, v in stores.read_meta(path, pq_det._PQ_META).items()
         if k in ("coarse", "codebooks")},
        sort_keys=True,
    )
    pq_det.ivf_pq_det_store_append(rest, path)
    meta_after = json.dumps(
        {k: v for k, v in stores.read_meta(path, pq_det._PQ_META).items()
         if k in ("coarse", "codebooks")},
        sort_keys=True,
    )
    assert meta_before == meta_after  # frozen: append refits nothing
    codes_path = os.path.join(path, "codes")
    n1 = spark.read.parquet(codes_path).count()
    assert n1 == emb.count()
    served = pq_det.ivf_pq_det_serve_frozen(emb, path).collect()
    assert len(served) > 0

    # replay: same batch fingerprint -> no-op; a re-chunked overlap
    # (different fingerprint) -> row-level anti-join appends nothing
    pq_det.ivf_pq_det_store_append(rest, path)
    assert spark.read.parquet(codes_path).count() == n1
    pq_det.ivf_pq_det_store_append(rest.limit(3), path)
    assert spark.read.parquet(codes_path).count() == n1

    stats = pq_det.ivf_pq_det_store_compact(spark, path, max_files_per_cell=0)
    assert stats["cells_compacted"] > 0
    assert stats["files_after"] <= stats["files_before"]
    assert stores.read_meta(path, pq_det._PQ_META).get("appended") == []
    again = pq_det.ivf_pq_det_serve_frozen(emb, path).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, served))


def test_store_at_100x_fixture_scale(spark, tmp_path):
    """Scale exhibit: 100k deterministic synthetic vectors (50x the
    sf0.1 fixture) through the full store path. Asserts the things
    that must survive scale-up: the build completes in bounded time,
    the codes land cell-partitioned, and the serve's executed plan
    scans ONLY the probed cells (static cluster_id IN partition
    filter) — i.e. serve cost is |probed cells|, not |corpus|."""
    import os

    n, d, ncent = 100_000, 64, 32
    coords = F.array(
        *[
            (
                (F.xxhash64(F.lit(j), F.col("vec_id") % ncent) % 1000) / 500.0
                + (F.xxhash64(F.lit(j), F.col("vec_id")) % 100) / 1000.0
            ).cast("float")
            for j in range(d)
        ]
    )
    emb = (
        spark.range(n)
        .select(F.col("id").alias("vec_id"))
        .select(
            "vec_id",
            (F.col("vec_id") % ncent).cast("string").alias("label"),
            coords.alias("embedding"),
        )
        .localCheckpoint()
    )
    path = str(tmp_path / "stress")
    pq_det.ivf_pq_det_store_ensure(emb, path, k=ncent)
    cells = [
        e
        for e in os.listdir(os.path.join(path, "codes"))
        if e.startswith("cluster_id=")
    ]
    assert len(cells) > 1  # multiple populated cells to prune between
    served = pq_det.ivf_pq_det_serve_frozen(emb, path, n_queries=10)
    plan = served._sc._jvm.PythonSQLUtils.explainString(
        served._jdf.queryExecution(), "formatted"
    )
    part_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert part_lines and any(
        "cluster_id" in ln and " IN " in ln for ln in part_lines
    ), part_lines
    assert served.count() == 50


def test_codes_table_is_cell_partitioned_and_one_row_per_vector(
    spark, sf_dir, tmp_path
):
    """Store layout contract: parquet partitioned by coarse cluster_id
    (the partition-prune serving story) with exactly one code row per
    corpus vector (the erasure accounting the governance oracle
    assumes)."""
    import os

    from kinesis_dstream_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "layout")
    pq_det.ivf_pq_det_store_ensure(emb, path)
    codes_dir = os.path.join(path, "codes")
    parts = [e for e in os.listdir(codes_dir) if e.startswith("cluster_id=")]
    assert parts, "codes not partitioned by cluster_id"
    codes = spark.read.parquet(codes_dir)
    assert codes.count() == emb.count()
    assert codes.select("vec_id").distinct().count() == emb.count()


def test_res_store_lifecycle_matches_flat_and_replays(spark, sf_dir, tmp_path):
    """r11 residual store: (1) ensure-on-full-corpus + serve equals the
    flat fit-per-call exhibit row-for-row (the shared-oracle claim);
    (2) frozen append of an already-coded split adds zero rows (cell-
    pruned replay anti-join); (3) serve_frozen refuses a torn meta."""
    import os

    from kinesis_dstream_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    store = str(tmp_path / "res_idx")
    served = sorted(
        map(tuple, pq_det.ann_ivf_pq_res_serve(emb, store).collect())
    )
    flat = sorted(map(tuple, pq_det.ann_ivf_pq_res_topk(emb).collect()))
    assert served == flat

    codes = os.path.join(store, "codes")
    n = spark.read.parquet(codes).count()
    assert n == emb.count()
    # replay: subset re-delivery exercises the row anti-join
    pq_det.ivf_pq_res_store_append(emb.limit(9), store)
    assert spark.read.parquet(codes).count() == n

    with open(os.path.join(store, pq_det._RES_META), "w") as f:
        f.write('{"torn')
    with pytest.raises(FileNotFoundError):
        pq_det.ivf_pq_res_serve_frozen(emb, store)


def test_res_ingest_serve_union_covers_all_vectors(spark, sf_dir, tmp_path):
    """Ensure on the 80% base + frozen append of the 20% remainder must
    leave exactly one residual-code row per corpus vector, in the cell
    the FROZEN coarse quantizer assigns (no refit drift)."""
    import os

    from kinesis_dstream_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    store = str(tmp_path / "res_ing")
    pq_det.ivf_pq_res_store_ensure(emb.filter(F.col("vec_id") % 5 != 4), store)
    pq_det.ivf_pq_res_store_append(emb.filter(F.col("vec_id") % 5 == 4), store)
    codes = spark.read.parquet(os.path.join(store, "codes"))
    assert codes.count() == emb.count()
    assert codes.select("vec_id").distinct().count() == emb.count()
    out = pq_det.ivf_pq_res_serve_frozen(emb, store)
    assert out.count() == 50  # 10 queries x topk 5
