"""Deterministic SQ8 scalar quantization (operators/sq_det.py):
semantic bounds the DuckDB oracle can't express — recall vs the exact
ranking, reconstruction-error budget, and the constant-dimension edge.
Value-level exactness is covered by the registry oracles
(``ann_sq8_topk`` / ``sq8_code_stats``)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from kinesis_dstream_spark.operators import sq_det
from kinesis_dstream_spark.operators.clustering import _unit_int_arrays
from kinesis_dstream_spark.tables import load_table

_SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, _SF, "embeddings").localCheckpoint()


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


def test_sq8_recall_beats_pq_even_isotropic(emb):
    """SQ8 quantizes per-DIMENSION (255 levels each), so unlike PQ's
    16-codes-per-16-dim-subspace it survives the isotropic fixture:
    recall@5 vs the exact integer-dot top-5 must clear a floor the PQ
    flat scan (documented ~0.06-0.24) never reaches there."""
    truth = _exact_topk(emb)
    got = {
        (r.q_id, r.c_id) for r in sq_det.ann_sq8_topk(emb).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, recall


def test_sq8_reconstruction_error_budget(emb):
    """Per-dim |x - x̂| is bounded by one quantization cell:
    span/levels + 1 grid unit (integer truncation)."""
    rows = sq_det.sq8_code_stats(emb).collect()
    assert len(rows) == 64
    for r in rows:
        cell = (r.hi - r.lo) // sq_det._LEVELS + 1
        assert r.max_abs_err <= cell, (r.pos, r.max_abs_err, cell)
        assert 1 <= r.codes_used <= sq_det._LEVELS + 1


def test_sq8_constant_dimension_edge(spark):
    """A constant dimension (span 0) encodes to code 0 and
    reconstructs exactly — no division by zero in either engine."""
    emb = spark.createDataFrame(
        [
            (0, "a", [1.0, 0.5, 0.25]),
            (1, "a", [1.0, -0.5, 0.5]),
            (2, "a", [1.0, 0.1, -0.25]),
        ],
        "vec_id long, label string, embedding array<float>",
    )
    stats = {r.pos: r for r in sq_det.sq8_code_stats(emb).collect()}
    # dim 1 is constant BEFORE normalization but not after (norms
    # differ) — construct the truly-constant case via identical rows
    emb2 = spark.createDataFrame(
        [(i, "a", [0.6, 0.8]) for i in range(3)],
        "vec_id long, label string, embedding array<float>",
    )
    stats2 = {r.pos: r for r in sq_det.sq8_code_stats(emb2).collect()}
    for pos, r in stats2.items():
        assert r.lo == r.hi and r.codes_used == 1 and r.max_abs_err == 0
    # and the non-constant frame still produced 3 dims of stats
    assert set(stats) == {1, 2, 3}


def test_sq8_topk_shape_and_ties(emb):
    out = sq_det.ann_sq8_topk(emb, n_queries=4, topk=3).collect()
    assert len(out) == 12
    per_q = {}
    for r in out:
        assert r.c_id != r.q_id
        per_q.setdefault(r.q_id, []).append((r.rk, r.adc_num, r.c_id))
    for q, rows in per_q.items():
        rows.sort()
        assert [rk for rk, _, _ in rows] == [1, 2, 3]
        # ordered by adc desc, ties by c_id asc
        for (rk1, a1, c1), (rk2, a2, c2) in zip(rows, rows[1:]):
            assert a1 > a2 or (a1 == a2 and c1 < c2)


def test_ivf_sq8_all_probes_equals_flat(emb):
    """Probing every cell makes the composed IVF-SQ8 scan the whole
    corpus — it must then equal the flat SQ8 scan row-for-row (same
    bounds, same ADC, same ties). The k-subset case is the honest-ANN
    approximation; this identity pins that composition changed the
    CANDIDATE SET and nothing else."""
    flat = {
        (r.q_id, r.c_id, r.adc_num, r.rk)
        for r in sq_det.ann_sq8_topk(emb).collect()
    }
    composed = {
        (r.q_id, r.c_id, r.adc_num, r.rk)
        for r in sq_det.ann_ivf_sq8_topk(emb, n_probe=8, k=8).collect()
    }
    assert composed == flat


def test_ivf_sq8_candidates_stay_in_probed_cells(emb):
    """With n_probe=1 every result must live in its query's single
    nearest cell — the IVF contract."""
    from kinesis_dstream_spark.operators.clustering import (
        _fit_kmeans,
        _ivf_probes,
    )

    iarr, asg, cents = _fit_kmeans(emb, 8, 2)
    queries = iarr.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("iu").alias("q_iu")
    )
    probe = {
        (r.q_id, r.cluster_id)
        for r in _ivf_probes(queries, cents, 1).collect()
    }
    cell_of = {r.vec_id: r.cluster_id for r in asg.select("vec_id", "cluster_id").collect()}
    out = sq_det.ann_ivf_sq8_topk(emb, n_probe=1).collect()
    for r in out:
        assert (r.q_id, cell_of[r.c_id]) in probe


def test_ivf_sq8_store_roundtrip_and_replay(spark, emb, tmp_path):
    """The persisted store must serve exactly the flat composed values
    (ensure-on-full-corpus round-trip), a REPLAYED append must change
    nothing (cell-pruned anti-join idempotence), and compaction must
    not move values."""
    path = str(tmp_path / "sq8_store")
    flat = {(r.q_id, r.c_id, r.adc_num, r.rk)
            for r in sq_det.ann_ivf_sq8_topk(emb).collect()}
    served = {(r.q_id, r.c_id, r.adc_num, r.rk)
              for r in sq_det.ivf_sq8_store_serve(emb, path).collect()}
    assert served == flat
    # replay the whole corpus as an append: nothing may duplicate
    sq_det.ivf_sq8_store_append(emb, path)
    replayed = {(r.q_id, r.c_id, r.adc_num, r.rk)
                for r in sq_det.ivf_sq8_serve_frozen(emb, path).collect()}
    assert replayed == flat
    stats = sq_det.ivf_sq8_store_compact(spark, path, max_files_per_cell=0)
    after = {(r.q_id, r.c_id, r.adc_num, r.rk)
             for r in sq_det.ivf_sq8_serve_frozen(emb, path).collect()}
    assert after == flat
    assert stats["files_after"] <= stats["files_before"]


def test_ivf_sq8_frozen_ingest_never_refits(spark, emb, tmp_path):
    """Build on the 80% base, append the 20% remainder: the stored
    bounds and centroids must be byte-identical before and after the
    append (frozen-quantizer contract), and appended out-of-range
    coordinates must saturate inside [0, levels]."""
    import json
    import os
    from pyspark.sql import functions as F

    path = str(tmp_path / "sq8_ing")
    base = emb.filter(F.col("vec_id") % 5 != 4)
    rest = emb.filter(F.col("vec_id") % 5 == 4)
    sq_det.ivf_sq8_store_ensure(base, path)
    meta_before = json.load(open(os.path.join(path, sq_det._SQ_META)))
    sq_det.ivf_sq8_store_append(rest, path)
    meta_after = json.load(open(os.path.join(path, sq_det._SQ_META)))
    assert meta_before["coarse"] == meta_after["coarse"]
    assert meta_before["bounds"] == meta_after["bounds"]
    codes = spark.read.parquet(os.path.join(path, "codes"))
    mx = codes.select(
        F.max(F.array_max("codes")).alias("mx"),
        F.min(F.array_min("codes")).alias("mn"),
    ).collect()[0]
    assert 0 <= mx.mn and mx.mx <= sq_det._LEVELS


def test_ivf_sq8_torn_meta_refuses(spark, emb, tmp_path):
    """Absent-or-torn meta means 'no complete build': frozen serve and
    append must REFUSE (not scan a half-built store)."""
    path = str(tmp_path / "sq8_torn")
    with pytest.raises(FileNotFoundError):
        sq_det.ivf_sq8_serve_frozen(emb, path)
    with pytest.raises(FileNotFoundError):
        sq_det.ivf_sq8_store_append(emb, path)


def test_quantizer_matrix_orders_families_sensibly(emb):
    """On the isotropic fixture the matrix must reproduce the
    documented family story: SQ8 flat (255 levels/dim) beats PQ flat
    (16 codes/subspace) by a wide margin, and the probe-limited IVF
    tiers sit between PQ's collapse and SQ8's near-exactness with
    ivf_sq8 == ivf_det recall (within probed cells the SQ8 ranking is
    exact here)."""
    rows = {r.family: r for r in
            sq_det.quantizer_recall_matrix(emb).collect()}
    assert set(rows) == {
        "ivf_det", "pq_det_flat", "sq8_flat", "ivf_sq8", "knn_graph",
        "pq_rot",
    }
    assert rows["sq8_flat"].recall_ppm >= 900_000
    assert rows["pq_det_flat"].recall_ppm <= 400_000
    assert rows["sq8_flat"].recall_ppm > rows["pq_det_flat"].recall_ppm
    assert rows["ivf_sq8"].recall_ppm == rows["ivf_det"].recall_ppm
    # the graph tier (r12) must clear the probe-limited IVF tiers —
    # multi-hop traversal escapes the probed-cell loss (the knn_graph
    # pytest suite pins the same gap against the exact truth)
    assert rows["knn_graph"].recall_ppm > rows["ivf_det"].recall_ppm
    # the OPQ tier (r13): on the ISOTROPIC fixture rotation is
    # recall-NEUTRAL by design — pin the rotated leg to the same
    # collapsed band as flat PQ (the correlated-data win lives in
    # tests/test_opq.py, where rotation must strictly beat flat)
    assert rows["pq_rot"].recall_ppm <= 400_000
