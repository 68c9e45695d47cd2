"""Similarity-search semantics (E-11): exactness + recall bounds."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kinesis_dstream_spark.operators import relational, similarity
from kinesis_dstream_spark.tables import load_table


def test_bruteforce_topk_matches_numpy(spark, sf_dir):
    """The distributed top-k must equal a local numpy argsort."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    got = similarity.ann_bruteforce_topk(emb, n_queries=3, k=5).collect()

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    m = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    for q in range(3):
        qi = int(np.where(ids == q)[0][0])
        sims = m @ m[qi]
        order = sorted(
            (i for i in range(len(ids)) if ids[i] != q),
            key=lambda i: (-round(float(sims[i]), 4), ids[i]),
        )[:5]
        expect = [int(ids[i]) for i in order]
        have = [r.c_id for r in sorted(got, key=lambda r: r.rk) if r.q_id == q]
        assert have == expect, f"query {q}"


def test_lsh_topk_recall_vs_bruteforce(spark, sf_dir):
    """Multi-table OR-amplification makes recall tunable via n_tables:
    at the defaults (6 planes x 32 tables) the true top-1 neighbor must
    be recovered for >=80% of queries even on this near-isotropic
    fixture, and every returned pair must be honestly scored (same dot
    product as the brute-force path)."""
    emb = load_table(spark, sf_dir, "embeddings")
    brute = similarity.ann_bruteforce_topk(emb, n_queries=10, k=5).collect()
    lsh = similarity.ann_lsh_topk(emb, n_queries=10, k=5).collect()
    brute_scores = {(r.q_id, r.c_id): r.cos_sim for r in brute}
    top1 = {r.q_id: r.c_id for r in brute if r.rk == 1}
    lsh_by_q: dict[int, set] = {}
    for r in lsh:
        lsh_by_q.setdefault(r.q_id, set()).add(r.c_id)
    # scores must agree where pairs overlap (same dot product both paths)
    for r in lsh:
        if (r.q_id, r.c_id) in brute_scores:
            assert math.isclose(r.cos_sim, brute_scores[(r.q_id, r.c_id)], abs_tol=1e-9)
    # every query returns a full result set
    assert len(lsh_by_q) == 10
    # recall floor: the exact top-1 neighbor appears in the LSH top-k
    hits = sum(1 for q, c in top1.items() if c in lsh_by_q.get(q, set()))
    assert hits >= 8, f"top-1 recall {hits}/10 below 0.8 floor"


def test_lsh_topk_more_tables_more_recall(spark, sf_dir):
    """The amplification knob works: 8 tables must recover at least as
    many brute-force top-k pairs as 1 table at the same n_planes."""
    emb = load_table(spark, sf_dir, "embeddings")
    brute = similarity.ann_bruteforce_topk(emb, n_queries=10, k=5).collect()
    bset = {(r.q_id, r.c_id) for r in brute}

    def overlap(n_tables: int) -> int:
        rows = similarity.ann_lsh_topk(
            emb, n_queries=10, k=5, n_planes=6, n_tables=n_tables
        ).collect()
        return len(bset & {(r.q_id, r.c_id) for r in rows})

    assert overlap(8) >= overlap(1)


def test_pq_topk_recall_and_honest_scores(spark, sf_dir):
    """PQ ADC shortlist + exact re-rank: recall floor 0.8 on top-1, and
    every returned score must equal the brute-force dot exactly (the
    re-rank guarantees honest cosines even when recall is approximate)."""
    emb = load_table(spark, sf_dir, "embeddings")
    brute = similarity.ann_bruteforce_topk(emb, n_queries=10, k=5).collect()
    bscores = {(r.q_id, r.c_id): r.cos_sim for r in brute}
    top1 = {r.q_id: r.c_id for r in brute if r.rk == 1}
    pq = similarity.ann_pq_topk(emb, n_queries=10, k=5).collect()
    got: dict[int, set] = {}
    for r in pq:
        got.setdefault(r.q_id, set()).add(r.c_id)
        if (r.q_id, r.c_id) in bscores:
            assert math.isclose(r.cos_sim, bscores[(r.q_id, r.c_id)], abs_tol=1e-9)
    assert len(got) == 10
    hits = sum(1 for q, c in top1.items() if c in got.get(q, set()))
    assert hits >= 8, f"PQ top-1 recall {hits}/10 below 0.8 floor"


def test_ivf_pq_topk_recall_and_honest_scores(spark, sf_dir):
    """Composed IVF-PQ: the probed-cells-only + codes-only scan must still
    find most true top-1 neighbors (floor 0.6 at fixture scale — both
    stages' recall losses compound), and re-ranked scores are exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    brute = similarity.ann_bruteforce_topk(emb, n_queries=10, k=5).collect()
    bscores = {(r.q_id, r.c_id): r.cos_sim for r in brute}
    top1 = {r.q_id: r.c_id for r in brute if r.rk == 1}
    ivfpq = similarity.ann_ivf_pq_topk(emb, n_queries=10, k=5).collect()
    got: dict[int, set] = {}
    for r in ivfpq:
        got.setdefault(r.q_id, set()).add(r.c_id)
        if (r.q_id, r.c_id) in bscores:
            assert math.isclose(r.cos_sim, bscores[(r.q_id, r.c_id)], abs_tol=1e-9)
    assert len(got) == 10
    hits = sum(1 for q, c in top1.items() if c in got.get(q, set()))
    assert hits >= 6, f"IVF-PQ top-1 recall {hits}/10 below 0.6 floor"


def test_ivf_pq_more_probes_more_candidates(spark, sf_dir):
    """n_probe is the recall knob: probing every cell must recover at
    least as many true top-1 neighbors as the pruned default."""
    emb = load_table(spark, sf_dir, "embeddings")
    brute = similarity.ann_bruteforce_topk(emb, n_queries=5, k=3).collect()
    top1 = {r.q_id: r.c_id for r in brute if r.rk == 1}

    def hits(n_probe: int) -> int:
        rows = similarity.ann_ivf_pq_topk(
            emb, n_queries=5, k=3, n_cells=8, n_probe=n_probe
        ).collect()
        got: dict[int, set] = {}
        for r in rows:
            got.setdefault(r.q_id, set()).add(r.c_id)
        return sum(1 for q, c in top1.items() if c in got.get(q, set()))

    assert hits(8) >= hits(2)


def test_ann_index_build_search_recall(spark, sf_dir, tmp_path):
    """Persisted-index serving matches in-memory IVF-PQ semantics: recall
    floor vs brute force, honest re-ranked scores."""
    from kinesis_dstream_spark.operators import ann_index

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "idx")
    out = ann_index.ann_index_topk(emb, path, n_queries=10, k=5).collect()
    brute = similarity.ann_bruteforce_topk(emb, n_queries=10, k=5).collect()
    bscores = {(r.q_id, r.c_id): r.cos_sim for r in brute}
    top1 = {r.q_id: r.c_id for r in brute if r.rk == 1}
    got: dict[int, set] = {}
    for r in out:
        got.setdefault(r.q_id, set()).add(r.c_id)
        if (r.q_id, r.c_id) in bscores:
            assert math.isclose(r.cos_sim, bscores[(r.q_id, r.c_id)], abs_tol=1e-9)
    assert len(got) == 10
    hits = sum(1 for q, c in top1.items() if c in got.get(q, set()))
    assert hits >= 6, f"index top-1 recall {hits}/10 below 0.6 floor"


def test_ann_index_append_grows_index_under_frozen_codebooks(spark, sf_dir, tmp_path):
    """Build on half the corpus, append the rest: the index holds every
    vector, searches see appended rows, and recall matches a full build
    (same codebooks ⇒ appended vectors land in their nearest cells)."""
    from kinesis_dstream_spark.operators import ann_index

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    half = n // 2
    path = str(tmp_path / "idx")
    ann_index.ann_index_build(emb.filter(F.col("vec_id") < half), path)
    ann_index.ann_index_append(emb.filter(F.col("vec_id") >= half), path)
    assert spark.read.parquet(path).count() == n
    out = ann_index.ann_index_search(spark, path, n_queries=5, k=5).collect()
    assert len({r.q_id for r in out}) == 5
    # appended half is reachable: at least one neighbor from vec_id >= half
    assert any(r.c_id >= half for r in out)


def test_ann_index_scan_is_partition_pruned(spark, sf_dir, tmp_path):
    """The probe set must land as a partition filter: the serving scan
    lists only probed cell directories (the inverted-file property)."""
    from kinesis_dstream_spark.operators import ann_index

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "idx")
    ann_index.ann_index_build(emb, path, n_cells=8)
    df = ann_index.ann_index_search(spark, path, n_queries=3, k=3, n_probe=2)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters", 1)[1][:200]
    # sidecar written last marks a complete build; rebuild is skipped
    import os

    assert os.path.exists(os.path.join(path, ann_index.SIDECAR))


def test_ann_index_compaction_preserves_results(spark, sf_dir, tmp_path):
    """Repeated appends accumulate small files per cell; compaction must
    drop the file count without changing a single search result."""
    import os

    from kinesis_dstream_spark.operators import ann_index

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    path = str(tmp_path / "idx")
    ann_index.ann_index_build(emb.filter(F.col("vec_id") < n // 4), path, n_cells=4)
    for i in range(1, 4):
        ann_index.ann_index_append(
            emb.filter(
                (F.col("vec_id") >= i * n // 4) & (F.col("vec_id") < (i + 1) * n // 4)
            ),
            path,
        )
    before = sorted(
        map(tuple, ann_index.ann_index_search(spark, path, n_queries=5, k=5).collect())
    )
    files_before = ann_index._n_parquet_files(path)
    stats = ann_index.ann_index_compact(spark, path, max_files_per_cell=1)
    assert stats["cells_compacted"] > 0
    assert stats["files_after"] < files_before
    # one file per compacted cell
    for entry in os.listdir(path):
        if entry.startswith("cell="):
            assert ann_index._n_parquet_files(os.path.join(path, entry)) == 1
    after = sorted(
        map(tuple, ann_index.ann_index_search(spark, path, n_queries=5, k=5).collect())
    )
    assert after == before
    assert spark.read.parquet(path).count() == 4 * (n // 4)
    # idempotent: a second compact is a no-op
    again = ann_index.ann_index_compact(spark, path, max_files_per_cell=1)
    assert again["cells_compacted"] == 0


def test_ann_index_stale_fingerprint_triggers_rebuild(spark, sf_dir, tmp_path):
    """A persisted index whose sidecar fingerprint no longer matches the
    corpus+params (regenerated fixtures, changed build params, older
    format) is rebuilt instead of silently served stale."""
    import os

    import numpy as np

    from kinesis_dstream_spark.operators import ann_index

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "idx")
    # Build on a 2/3 subset (simulating an old fixture generation)...
    n = emb.count()
    old = emb.filter(F.col("vec_id") < 2 * n // 3)
    ann_index.ann_index_topk(old, path, n_queries=3, k=3).collect()
    assert spark.read.parquet(path).count() == old.count()
    # ...then serve the full corpus through the same path: fingerprint
    # mismatch must force a rebuild that includes every vector.
    ann_index.ann_index_topk(emb, path, n_queries=3, k=3).collect()
    assert spark.read.parquet(path).count() == n
    # Same corpus + same params: sidecar mtime unchanged ⇒ no rebuild.
    sidecar = os.path.join(path, ann_index.SIDECAR)
    mtime = os.path.getmtime(sidecar)
    ann_index.ann_index_topk(emb, path, n_queries=3, k=3).collect()
    assert os.path.getmtime(sidecar) == mtime
    # Changed build params ⇒ rebuild (fingerprint includes params).
    ann_index.ann_index_topk(emb, path, n_queries=3, k=3, n_cells=8).collect()
    assert os.path.getmtime(sidecar) > mtime
    blob = np.load(sidecar)
    assert blob["cents"].shape[0] == 8


def test_adc_udf_rejects_unknown_qid(spark):
    """An ADC batch with a qid missing from the LUT stack must fail fast,
    not silently gather a neighboring query's LUT."""
    import numpy as np

    from kinesis_dstream_spark.operators.similarity import _make_adc_udf

    m, nbits = 4, 2
    luts = {1: np.ones((m, 1 << nbits)), 5: 2 * np.ones((m, 1 << nbits))}
    udf = _make_adc_udf(luts, m)
    df = spark.createDataFrame(
        [(1, [0, 1, 2, 3]), (3, [0, 0, 0, 0]), (9, [1, 1, 1, 1])],
        "qid long, codes array<int>",
    )
    import pytest
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception, match="no LUT|PythonException") as exc:
        df.select(udf("qid", "codes").alias("s")).collect()
    assert "no LUT" in str(exc.value)
    # known qids alone score fine
    ok = spark.createDataFrame([(1, [0, 1, 2, 3]), (5, [0, 0, 0, 0])], "qid long, codes array<int>")
    rows = {r.qid: r.s for r in ok.select("qid", udf("qid", "codes").alias("s")).collect()}
    assert rows[1] == m * 1.0 and rows[5] == m * 2.0


def test_ann_index_external_queries_match_self_queries(spark, sf_dir, tmp_path):
    """The production entry point (external (q_id, embedding) batch)
    must return exactly what self-querying the same vectors returns —
    modulo the self-exclusion rule, which only applies to self-queries."""
    from kinesis_dstream_spark.operators import ann_index

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "idx")
    ann_index.ann_index_build(emb, path)
    self_rows = ann_index.ann_index_search(spark, path, n_queries=5, k=5).collect()
    ext = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 1000).alias("q_id"), "embedding"
    )
    ext_rows = ann_index.ann_index_search(spark, path, k=5, queries=ext).collect()
    # external ids are offset by 1000 and include the query vector itself
    # (it lives in the index under a different id) as its own top-1
    got = {}
    for r in ext_rows:
        got.setdefault(r.q_id - 1000, []).append((r.rk, r.c_id))
    for q in range(5):
        ranked = [c for _, c in sorted(got[q])]
        assert ranked[0] == q  # the identical vector is the 1-NN
    want = {(r.q_id, r.c_id) for r in self_rows}
    # self-results (which exclude the query row) must be a subset of the
    # external results shifted down one rank
    ext_pairs = {(r.q_id - 1000, r.c_id) for r in ext_rows if r.c_id != r.q_id - 1000}
    assert len(want & ext_pairs) >= int(0.8 * len(want))


def test_ann_index_recall_probe_floor_and_monotone(spark, sf_dir, tmp_path):
    """Recall telemetry: one row, recall in (0,1], >=0.6 at defaults,
    non-decreasing in n_probe."""
    from kinesis_dstream_spark.operators import ann_index

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "idx")
    ann_index.ann_index_build(emb, path, n_cells=8)

    def recall(n_probe):
        rows = ann_index.ann_index_recall_probe(
            spark, emb, path, n_queries=10, k=5, n_probe=n_probe
        ).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r.n_exact == 50 and 0 < r.recall_at_k <= 1
        return r.recall_at_k

    r_default = recall(4)
    assert r_default >= 0.6
    assert recall(8) >= r_default


def test_pq_encode_shapes(spark, sf_dir):
    """Codes are length-m int arrays in [0, 2^nbits); codebooks are
    (m, 2^nbits, dim/m)."""
    emb = load_table(spark, sf_dir, "embeddings")
    codes_df, books = similarity.pq_encode(emb, m=8, nbits=4)
    assert books.shape[0] == 8 and books.shape[1] == 16
    rows = codes_df.collect()
    assert len(rows) == emb.count()
    for r in rows[:20]:
        assert len(r.codes) == 8
        assert all(0 <= c < 16 for c in r.codes)


def test_centroid_similarity_sane(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    rows = similarity.centroid_similarity_by_label(emb).collect()
    assert sum(r.n_vecs for r in rows) == emb.count()
    assert all(-1.0 <= r.avg_cos_to_centroid <= 1.0 for r in rows)
    # vectors should on average lean toward their own centroid
    assert all(r.avg_cos_to_centroid > 0 for r in rows)


def test_approx_count_distinct_error_bound(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    approx = {
        (r.event_type): r.approx_users
        for r in relational.approx_distinct_users(ev, rsd=0.02).collect()
    }
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(3, 0.1 * n), (k, approx[k], n)


def test_ann_filtered_respects_predicate(spark, sf_dir):
    """Every retrieved neighbor shares its query's label, and filtered
    results are a subset-or-lower-scored view of the unfiltered top-k."""
    from kinesis_dstream_spark.operators.similarity import (
        ann_bruteforce_topk,
        ann_filtered_topk,
    )
    from kinesis_dstream_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    out = ann_filtered_topk(emb).collect()
    assert out
    for r in out:
        assert labels[r.c_id] == labels[r.q_id]
        assert r.label == labels[r.c_id]
    # per query: filtered top-1 score ≤ unfiltered top-1 score
    unf = {r.q_id: r.cos_sim for r in ann_bruteforce_topk(emb).collect() if r.rk == 1}
    for r in out:
        if r.rk == 1:
            assert r.cos_sim <= unf[r.q_id] + 1e-9


def test_ann_index_search_batched_equals_single_batch(spark, sf_dir, tmp_path):
    """The mega-batch serve loop: a query batch LARGER than the chunk
    cap, served in chunks, must union to exactly the single-call result
    (search is per-q_id independent). batch_rows=7 over 30 queries
    forces 5 chunks through the real chunking path."""
    from kinesis_dstream_spark.operators import ann_index

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "idx")
    ann_index.ann_index_build(emb, path)
    ext = emb.filter(F.col("vec_id") < 30).select(
        (F.col("vec_id") + 1000).alias("q_id"), "embedding"
    )
    single = ann_index.ann_index_search(spark, path, k=5, queries=ext).collect()
    batched = ann_index.ann_index_search_batched(
        spark, path, ext, k=5, batch_rows=7
    ).collect()
    assert sorted(map(tuple, batched)) == sorted(map(tuple, single))
    # under-cap path short-circuits to a single call, same result
    small = ext.filter(F.col("q_id") < 1005)
    one = ann_index.ann_index_search_batched(spark, path, small, k=5).collect()
    ref = ann_index.ann_index_search(spark, path, k=5, queries=small).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, ref))


def test_contrastive_pairs_consistent_with_filtered_topk(spark, sf_dir):
    """Each anchor's positive must equal ann_filtered_topk's rank-1
    same-label hit, and the negative must score >= every same-label
    candidate BELOW the positive is not required — but the negative
    must be the global best among cross-label candidates: verify
    against a brute-force numpy recomputation."""
    import numpy as np

    from kinesis_dstream_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    rows = {r.anchor_id: r for r in similarity.contrastive_pair_mining(emb).collect()}
    pdf = emb.toPandas().sort_values("vec_id")
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    labels = pdf["label"].to_numpy()
    ids = pdf["vec_id"].to_numpy()
    for a in range(10):
        sims = np.round(mat[a] @ mat.T, 4)
        sims[a] = -2
        same = labels == labels[a]
        pos_best = sims[same & (ids != ids[a])].max()
        neg_best = sims[~same].max()
        r = rows[a]
        assert abs(r.pos_sim - pos_best) < 1e-9
        assert abs(r.neg_sim - neg_best) < 1e-9
        assert abs(r.margin - round(r.pos_sim - r.neg_sim, 4)) < 1e-9


def test_random_projection_jl_error_bound(spark, sf_dir):
    """JL guarantee (distribution-free, unlike rank recall on the
    isotropic fixture): the unbiased estimator proj_dot/(m·scale²)
    tracks exact cosine with MAE ≈ √(2/π)/√m. Assert a 25% slack
    over theory, plus determinism of the hash-derived matrix."""
    emb = load_table(spark, sf_dir, "embeddings")
    m = 16
    exact = {
        (r.q_id, r.c_id): r.cos_sim
        for r in similarity.ann_bruteforce_topk(emb, k=10**9).collect()
    }
    jl = similarity.random_projection_topk(emb, out_dims=m, k=10**9).collect()
    errs = [abs(r.proj_dot / (m * 1e12) - exact[(r.q_id, r.c_id)]) for r in jl]
    mae = sum(errs) / len(errs)
    assert mae < 1.25 * (2 / 3.14159) ** 0.5 / m**0.5  # theory + 25%
    again = similarity.random_projection_topk(emb, out_dims=m, k=10**9).collect()
    assert {(r.q_id, r.c_id, r.proj_dot) for r in jl} == {
        (r.q_id, r.c_id, r.proj_dot) for r in again
    }


def test_random_projection_plan_shape(spark, sf_dir):
    """Projection must stay codegen'd JVM expressions (no row-Python,
    no per-pair join at all since the r7 fused scorer); scoring +
    local top-k is ONE Arrow pass (MapInPandas) whose merge window is
    the only exchange downstream."""
    df = similarity.random_projection_topk(load_table(spark, sf_dir, "embeddings"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" in plan
    # the |corpus| x |queries| join is gone entirely
    assert "Join" not in plan


def test_two_stage_retrieval_recall_equals_shortlist_recall(spark, sf_dir):
    """Re-ranking recovers exact order for whatever the shortlist
    caught: end-to-end hits must be exactly (shortlist ∩ exact top-k),
    and every returned score must equal the brute-force score."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r.q_id, r.c_id): r.cos_sim
        for r in similarity.ann_bruteforce_topk(emb, k=10**9).collect()
    }
    exact_top5 = {}
    for (q, c), s in exact.items():
        exact_top5.setdefault(q, []).append((-s, c))
    for q in exact_top5:
        exact_top5[q] = {c for _, c in sorted(exact_top5[q])[:5]}
    sl = {}
    for r in similarity.random_projection_topk(emb, k=20).collect():
        sl.setdefault(r.q_id, set()).add(r.c_id)
    got = {}
    for r in similarity.two_stage_retrieval_topk(emb).collect():
        got.setdefault(r.q_id, set()).add(r.c_id)
        assert r.cos_sim == exact[(r.q_id, r.c_id)]  # re-rank is exact
    for q in got:
        assert got[q] & exact_top5[q] == sl[q] & exact_top5[q]


def test_embedding_drift_detects_injected_shift(spark):
    """A constructed corpus where odd (new) vectors shift dimension 0 by
    +0.5 must report exactly one drifted dimension with that shift."""
    from kinesis_dstream_spark.operators import similarity

    rows = []
    for i in range(40):
        v = [0.1] * 8
        if i % 2 == 1:
            v[0] += 0.5
        rows.append((i, "x", v))
    df = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )
    r = similarity.embedding_drift_report(df).collect()[0]
    assert r["n_dims"] == 8
    assert r["n_dims_drifted"] == 1
    assert abs(r["max_abs_shift"] - 0.5) < 1e-9


def test_quantization_calibration_bounds(spark, sf_dir):
    """Per-dim invariants: clip_level <= abs_max, scale ~ clip_level/127,
    clipped fraction <= 0.1% + grid slack, one row per dimension."""
    from kinesis_dstream_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()["embedding"])
    rows = similarity.embedding_quantization_calibration(emb).collect()
    assert len(rows) == dim
    n = emb.count()
    for r in rows:
        assert 0 < r["clip_level"] <= r["abs_max"]
        assert abs(r["scale"] - (r["clip_level"] / 127)) < 1e-5
        assert r["n_clipped"] <= max(1, n // 1000)


def test_negative_sampling_uniform_and_label_disjoint(spark, sf_dir):
    """Every anchor gets exactly k negatives, none sharing its label,
    and the draw is reproducible (same set on re-run). Uniformity
    smoke: across anchors the negatives are not degenerate (more
    distinct candidates than one anchor's k)."""
    from kinesis_dstream_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    rows = similarity.negative_sampling_pairs(emb).collect()
    by_a: dict[int, list] = {}
    for r in rows:
        by_a.setdefault(r["a_id"], []).append(r["c_id"])
        assert labels[r["c_id"]] != labels[r["a_id"]]
    assert all(len(v) == 8 for v in by_a.values())
    again = {(r["a_id"], r["c_id"]) for r in similarity.negative_sampling_pairs(emb).collect()}
    assert again == {(r["a_id"], r["c_id"]) for r in rows}
    assert len({c for v in by_a.values() for c in v}) > 8


def test_random_projection_chunked_equals_single_batch(spark, sf_dir):
    """r7 verdict task 4: the JL query side serves in vec_id-range
    chunks under a driver-size cap (the ann_index_search_batched loop
    shape). Per-q_id independence makes the chunk union identical to
    one oversized batch."""
    from kinesis_dstream_spark.operators import similarity
    from kinesis_dstream_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    single = sorted(
        map(tuple, similarity.random_projection_topk(emb, n_queries=10).collect())
    )
    chunked = sorted(
        map(
            tuple,
            similarity.random_projection_topk(
                emb, n_queries=10, query_batch_rows=3
            ).collect(),
        )
    )
    assert chunked == single and len(single) > 0


def test_mmr_matches_numpy_greedy(spark, sf_dir):
    """The unrolled distributed MMR must equal a local NumPy greedy
    re-rank exactly (same int grid, same λ, same tie rule)."""
    import numpy as np

    from kinesis_dstream_spark.operators.clustering import _unit_int_arrays

    emb = load_table(spark, sf_dir, "embeddings")
    n_q, m, k = 10, 12, 5
    got = {}
    for r in similarity.mmr_diversified_topk(emb, n_q, m, k).collect():
        got.setdefault(r["q_id"], []).append((r["step"], r["c_id"], r["rel_num"]))
    iarr = {
        r["vec_id"]: np.array(r["iu"], np.int64)
        for r in _unit_int_arrays(emb).collect()
    }
    for q in range(n_q):
        rels = sorted(
            ((int(iarr[q] @ v), c) for c, v in iarr.items() if c != q),
            key=lambda t: (-t[0], t[1]),
        )[:m]
        short = {c: rel for rel, c in rels}
        sel = []
        # step 1: argmax rel, ties on c_id
        first = min(short, key=lambda c: (-short[c], c))
        sel.append((1, first, short[first]))
        for step in range(2, k + 1):
            best = None
            for c, rel in short.items():
                if any(c == s for _, s, _ in sel):
                    continue
                ms = max(int(iarr[c] @ iarr[s]) for _, s, _ in sel)
                score = 1 * rel - (2 - 1) * ms
                key = (-score, c)
                if best is None or key < best[0]:
                    best = (key, c, rel)
            sel.append((step, best[1], best[2]))
        assert sorted(got[q]) == sorted(sel), f"q={q}"
    # diversity sanity: for at least one query the MMR set differs
    # from the plain rel top-k (otherwise the operator is vacuous here)
    diffs = 0
    for q in range(n_q):
        rels = sorted(
            ((int(iarr[q] @ v), c) for c, v in iarr.items() if c != q),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        topk = {c for _, c in rels}
        mmrk = {c for _, c, _ in got[q]}
        if topk != mmrk:
            diffs += 1
    assert diffs > 0
