"""Subject-erasure: zero-residual proof + accounting + plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_dstream_spark.operators import changelog, eventflow, governance
from kinesis_dstream_spark.tables import load_table


def test_erasure_leaves_zero_residual_rows(spark, sf_dir):
    """After erasure, NO store contains any requested subject's rows —
    the actual regulatory requirement, stronger than count accounting."""
    events = load_table(spark, sf_dir, "events")
    requests = (
        events.select("user_id").distinct().where(F.col("user_id") % 37 == 0)
    )
    n_req = requests.count()
    assert n_req > 0, "fixture must contain requested subjects"
    for df in (
        events,
        changelog.scd2_from_changelog(events),
        eventflow.minute_granules_by_user(events),
    ):
        erased = governance.erase_subjects(df, requests, "user_id")
        residual = erased.join(requests, "user_id").count()
        assert residual == 0
        # non-subjects are untouched
        assert erased.count() == df.join(requests, "user_id", "left_anti").count()


def test_erasure_report_accounting(spark, sf_dir):
    rows = governance.erasure_report(spark, sf_dir).collect()
    assert {r.store for r in rows} == {
        "events_raw", "scd2_history", "minute_granules",
    }
    for r in rows:
        assert r.rows_before == r.rows_erased + r.rows_after
        assert r.rows_erased > 0  # the request set is non-empty on fixtures


def test_erasure_plan_broadcasts_requests(spark, sf_dir):
    """The erase anti-join must broadcast the request set — the store
    side is never shuffled."""
    events = load_table(spark, sf_dir, "events")
    requests = (
        events.select("user_id").distinct().where(F.col("user_id") % 37 == 0)
    )
    plan = (
        governance.erase_subjects(events, requests, "user_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_full_erasure_physical_zero_residual_all_stores(spark, sf_dir, tmp_path):
    """The six-store erasure: after erasure_report_full, the PERSISTED
    stores on disk (ANN index, chunk store, MinHash dedup index bands +
    shingles) contain zero rows for any requested doc/vec id, non-
    subject rows survive bit-for-bit, and the report's accounting adds
    up for every store."""
    import os

    work = str(tmp_path / "erase_work")
    rows = governance.erasure_report_full(spark, sf_dir, work_dir=work).collect()
    assert {r.store for r in rows} == {
        "events_raw", "scd2_history", "minute_granules",
        "ann_index", "chunk_store", "minhash_dedup_index",
        "near_dup_pairs", "ivf_det_index", "setsim_pairs",
        "ivf_pq_det_index", "ivf_pq_res_index", "ivf_sq8_index",
        "ab_user_granules", "sentence_granules", "knn_graph_index",
        "lex_index",
    }
    for r in rows:
        assert r.rows_before == r.rows_erased + r.rows_after
        assert r.rows_erased > 0

    stores = {
        "vec_id": [
            os.path.join(work, "ann_index"),
            os.path.join(work, "ivf_det_index", "codes"),
            os.path.join(work, "ivf_pq_det_index", "codes"),
            os.path.join(work, "ivf_pq_res_index", "codes"),
            os.path.join(work, "ivf_sq8_index", "codes"),
            os.path.join(work, "knn_graph_index", "nodes"),
        ],
        "doc_id": [
            os.path.join(work, "chunk_store", "chunks"),
            os.path.join(work, "dedup_index", "bands"),
            os.path.join(work, "dedup_index", "shingles"),
            os.path.join(work, "sentence_granules", "granules"),
            # sixteenth store (r13): postings are the subject's text
            # re-sorted by term; docs is the membership table
            os.path.join(work, "lex_index", "postings"),
            os.path.join(work, "lex_index", "docs"),
        ],
        "user_id": [
            os.path.join(work, "ab_user_granules", "granules"),
        ],
    }
    # the dedup_index dir in the work copy is named after the pristine
    # store key
    if not os.path.exists(stores["doc_id"][1]):
        stores["doc_id"][1] = os.path.join(work, "minhash_dedup_index", "bands")
        stores["doc_id"][2] = os.path.join(work, "minhash_dedup_index", "shingles")
    for key, paths in stores.items():
        for p in paths:
            erased = spark.read.parquet(p)
            assert erased.where(F.col(key) % 37 == 0).count() == 0, p
            assert erased.where(F.col(key) % 37 != 0).count() == erased.count()

    # seventh store: no pair row may reference an erased doc on EITHER
    # endpoint (a similarity assertion about erased content is itself
    # subject data)
    pairs = spark.read.parquet(os.path.join(work, "near_dup_pairs", "pairs"))
    assert (
        pairs.where((F.col("doc_a") % 37 == 0) | (F.col("doc_b") % 37 == 0)).count()
        == 0
    )
    # ninth store (r10): same either-endpoint rule for the setsim pairs
    spairs = spark.read.parquet(os.path.join(work, "setsim_pairs", "pairs"))
    assert (
        spairs.where((F.col("doc_a") % 37 == 0) | (F.col("doc_b") % 37 == 0)).count()
        == 0
    )
    # fifteenth store (r12): the graph-ANN adjacency — no edge row may
    # reference an erased vector on EITHER endpoint, and the erased
    # store's fingerprint must be poisoned (cells/pool/edges were
    # derived from the full corpus → deliberate rebuild on next ensure)
    kedges = spark.read.parquet(os.path.join(work, "knn_graph_index", "edges"))
    assert (
        kedges.where((F.col("src") % 37 == 0) | (F.col("dst") % 37 == 0)).count()
        == 0
    )
    from kinesis_dstream_spark import stores as store_seam
    from kinesis_dstream_spark.operators.knn_graph import _KNNG_META

    meta = store_seam.read_meta(os.path.join(work, "knn_graph_index"), _KNNG_META)
    assert meta["fingerprint"] == "invalidated-by-erasure"
    # sixteenth store (r13): the erased lexical index's completeness
    # marker is dropped (no trained params to refit-poison, but a later
    # ensure must rebuild from the live corpus, not fingerprint-match
    # the pre-erasure one), and the postings keep their bucket layout
    from kinesis_dstream_spark.operators.lexindex import _LEX_META

    assert store_seam.read_meta(os.path.join(work, "lex_index"), _LEX_META) is None
    assert any(
        e.startswith("bucket=")
        for e in os.listdir(os.path.join(work, "lex_index", "postings"))
    )


def test_erase_parquet_store_is_exact_and_preserves_survivors(spark, tmp_path):
    """Unit-level: physical parquet erasure removes exactly the subject
    rows and leaves survivors byte-identical (values, not just counts)."""
    import os

    path = str(tmp_path / "store")
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") * 7 % 13).alias("payload")
    )
    df.write.parquet(path)
    req = spark.range(100).select(F.col("id").alias("doc_id")).where(
        F.col("doc_id") % 10 == 0
    )
    governance.erase_parquet_store(spark, path, req, "doc_id")
    got = sorted(map(tuple, spark.read.parquet(path).collect()))
    want = sorted(
        (i, i * 7 % 13) for i in range(100) if i % 10 != 0
    )
    assert got == want
    assert not os.path.exists(path.rstrip("/") + "_erase_tmp")


def test_erasure_invalidates_codebooks_and_refit_excludes_subjects(
    spark, sf_dir, tmp_path
):
    """r6 task 5: full erasure must poison the ANN sidecar fingerprint;
    the next ann_index_ensure on the erased corpus must retrain, the
    stored train-sample provenance must contain zero erased subjects,
    and serving on the refit index must still clear the brute-force
    recall floor (the ann_index family's pytest bound)."""
    import numpy as np

    from kinesis_dstream_spark.operators import ann_index, governance
    from kinesis_dstream_spark.tables import load_table

    work = str(tmp_path / "gov_full")
    governance.erasure_report_full(spark, sf_dir, work_dir=work).collect()
    index_path = work + "/ann_index"
    sidecar = index_path + "/" + ann_index.SIDECAR

    blob = np.load(sidecar)
    assert str(blob["fingerprint"]) == "invalidated-by-erasure"

    emb = load_table(spark, sf_dir, "embeddings")
    erased_emb = emb.where(F.col("vec_id") % 37 != 0)
    ann_index.ann_index_ensure(erased_emb, index_path)

    blob2 = np.load(sidecar)
    assert str(blob2["fingerprint"]) == ann_index.corpus_fingerprint(
        erased_emb, n_cells=16, m=16, nbits=4, seed=42, train_fraction=1.0
    )
    train_ids = blob2["train_vec_ids"]
    assert len(train_ids) > 0
    assert not any(int(v) % 37 == 0 for v in train_ids)
    # the refit index holds no erased rows and still serves accurately
    assert (
        spark.read.parquet(index_path).where(F.col("vec_id") % 37 == 0).count() == 0
    )
    probe = ann_index.ann_index_recall_probe(spark, erased_emb, index_path).collect()[0]
    assert probe["recall_at_k"] >= 0.6, probe
