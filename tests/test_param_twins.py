"""Non-default-parameter oracle twins (r7 ADVICE).

``RFM_KMV_SQL`` / ``NEGATIVE_SAMPLING_SQL`` used to hardcode the
default parameters while the Python functions were parameterized, so a
non-default call silently diverged from its registered twin. The twins
are now generated from the same parameters; these tests pin that a
NON-default call still hash-matches its generated SQL.
"""

from __future__ import annotations

from kinesis_dstream_spark.operators import eventflow, similarity
from kinesis_dstream_spark.tables import load_table
from kinesis_dstream_spark.testing import frame_fingerprint


def _match(sdf, duck, sql, name):
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), name
    assert len(srows) == len(drows), name
    assert frame_fingerprint(scols, srows) == frame_fingerprint(dcols, drows), name


def test_rfm_kmv_nondefault_k(spark, duck, sf_dir):
    events = load_table(spark, sf_dir, "events")
    _match(
        eventflow.rfm_segments_kmv(events, k=64, shards=4),
        duck,
        eventflow.rfm_kmv_sql(k=64),
        "rfm_kmv_k64",
    )


def test_rfm_kmv_default_constant_matches_generator():
    assert eventflow.RFM_KMV_SQL == eventflow.rfm_kmv_sql()


def test_negative_sampling_nondefault(spark, duck, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    _match(
        similarity.negative_sampling_pairs(emb, n_anchors=5, k=3),
        duck,
        similarity.negative_sampling_sql(n_anchors=5, k=3),
        "neg_sampling_5_3",
    )


def test_negative_sampling_default_constant_matches_generator():
    assert similarity.NEGATIVE_SAMPLING_SQL == similarity.negative_sampling_sql()


def test_ivf_det_ingest_nondefault_params(spark, duck, sf_dir, tmp_path):
    """r9: the frozen-centroid ingest twin must track non-default
    base predicate / probe / topk parameters in lockstep."""
    from kinesis_dstream_spark.operators import clustering

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf_ing_params")
    clustering.ivf_det_store_ensure(emb.filter("vec_id % 3 != 0"), path)
    clustering.ivf_det_store_append(emb.filter("vec_id % 3 = 0"), path)
    _match(
        clustering.ivf_det_serve_frozen(emb, path, n_queries=6, topk=3, n_probe=3),
        duck,
        clustering.ivf_det_ingest_sql(
            fit_pred="vec_id % 3 <> 0", n_queries=6, topk=3, n_probe=3
        ),
        "ivf_det_ingest_params",
    )


def test_ivf_det_ingest_default_constant_matches_generator():
    from kinesis_dstream_spark.operators import clustering

    assert clustering.IVF_DET_INGEST_SQL == clustering.ivf_det_ingest_sql()


def test_setsim_cap_stats_nondefault_cap(spark, duck, sf_dir):
    """r9: the circuit-breaker accounting twin tracks a non-default
    per-key cap."""
    from kinesis_dstream_spark import registry
    from kinesis_dstream_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    _match(
        dedup.setsim_prefix_cap_stats(docs, max_key_rows=3),
        duck,
        registry._setsim_cap_stats_sql(max_key_rows=3),
        "setsim_cap_stats_3",
    )


def test_sorted_neighborhood_suffix_pass_twin(spark, duck, sf_dir):
    """r9: the per-pass rank-CTE generator — the suffix-only pass must
    hash-match the Spark suffix-key neighborhood (the 4th generator of
    the agreement report)."""
    from kinesis_dstream_spark import registry
    from kinesis_dstream_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    sfx = dedup._verify_shingle_jaccard(
        docs,
        dedup._nbhd_candidate_pairs(docs, dedup._nbhd_key_suffix(24), 4),
        3,
        3,
        5,
    )
    _match(
        sfx,
        duck,
        registry._sorted_neighborhood_sql(passes=(True,)),
        "nbhd_suffix_pass",
    )


def test_mixture_budget_nondefault_params(spark, duck, sf_dir):
    """r9: the mixing-solve twin tracks a non-default budget and a
    non-default target dict (including an absent source)."""
    from kinesis_dstream_spark.operators import curation

    docs = load_table(spark, sf_dir, "documents")
    target = {"src0": 700000, "src7": 200000, "nosuchsrc": 100000}
    _match(
        curation.mixture_budget_solve(docs, budget_tokens=12345, target_ppm=target),
        duck,
        curation.mixture_budget_sql(budget_tokens=12345, target_ppm=target),
        "mixture_budget_params",
    )


def test_mixture_budget_default_constant_matches_generator():
    from kinesis_dstream_spark.operators import curation

    assert curation.MIXTURE_BUDGET_SQL == curation.mixture_budget_sql()


def test_curation_pipeline_nondefault_params(spark, duck, sf_dir):
    """r9: the composed-pipeline twin tracks non-default budget,
    target, and token gates in lockstep."""
    from kinesis_dstream_spark.operators import curation

    docs = load_table(spark, sf_dir, "documents")
    target = {"src1": 600000, "src2": 400000}
    _match(
        curation.curation_pipeline_report(
            docs, budget_tokens=5000, target_ppm=target, min_tokens=10, max_tokens=900
        ),
        duck,
        curation.curation_pipeline_sql(
            budget_tokens=5000, target_ppm=target, min_tokens=10, max_tokens=900
        ),
        "curation_pipeline_params",
    )


def test_curation_pipeline_default_constant_matches_generator():
    from kinesis_dstream_spark.operators import curation

    assert curation.CURATION_PIPELINE_SQL == curation.curation_pipeline_sql()


def test_cusum_shift_nondefault_params(spark, duck, sf_dir):
    """r11: the CUSUM twin must track non-default allowance/threshold."""
    events = load_table(spark, sf_dir, "events")
    _match(
        eventflow.cusum_shift_detection(
            events, allowance_ppm=100_000, h_ppm=1_000_000
        ),
        duck,
        eventflow.cusum_shift_sql(allowance_ppm=100_000, h_ppm=1_000_000),
        "cusum_100k_1m",
    )


def test_cusum_shift_default_constant_matches_generator():
    assert eventflow.CUSUM_SHIFT_SQL == eventflow.cusum_shift_sql()


def test_survival_km_nondefault_censor(spark, duck, sf_dir):
    """r11: the KM twin tracks censor_days (the registry runs 1; pin
    another non-default value so the generator, not the constant, is
    what certifies)."""
    events = load_table(spark, sf_dir, "events")
    _match(
        eventflow.user_survival_km(events, censor_days=2),
        duck,
        eventflow.user_survival_km_sql(censor_days=2),
        "km_censor2",
    )


def test_ann_recall_report_nondefault_probe(spark, duck, sf_dir):
    """r11: eval harness twin tracks n_probe/topk; more probes can only
    raise recall (also asserted)."""
    from kinesis_dstream_spark.operators import clustering

    emb = load_table(spark, sf_dir, "embeddings")
    wide = clustering.ann_recall_mrr_report(emb, topk=3, n_probe=4)
    _match(
        wide,
        duck,
        clustering.ann_recall_report_sql(topk=3, n_probe=4),
        "recall_report_p4_k3",
    )
    narrow = {
        r["q_id"]: r["recall_ppm"]
        for r in clustering.ann_recall_mrr_report(emb, topk=3, n_probe=1).collect()
    }
    for r in wide.collect():
        assert r["recall_ppm"] >= narrow[r["q_id"]]


def test_msprt_nondefault_tau(spark, duck, sf_dir):
    from kinesis_dstream_spark.operators import eventflow as ef

    events = load_table(spark, sf_dir, "events")
    _match(
        ef.ab_msprt_always_valid(events, tau=0.01),
        duck,
        ef.ab_msprt_sql(tau=0.01),
        "msprt_tau_0.01",
    )


def test_msprt_default_constant_matches_generator():
    from kinesis_dstream_spark.operators import eventflow as ef

    assert ef.AB_MSPRT_SQL == ef.ab_msprt_sql()


def test_dsir_nondefault_params(spark, duck, sf_dir):
    from kinesis_dstream_spark.operators import curation

    docs = load_table(spark, sf_dir, "documents")
    _match(
        curation.dsir_importance_weights(docs, target_lang="fr", buckets=64),
        duck,
        curation.dsir_importance_weights_sql(target_lang="fr", buckets=64),
        "dsir_fr_64",
    )


def test_dsir_default_constant_matches_generator():
    from kinesis_dstream_spark.operators import curation

    assert (
        curation.DSIR_IMPORTANCE_WEIGHTS_SQL
        == curation.dsir_importance_weights_sql()
    )


def test_pmi_nondefault_params(spark, duck, sf_dir):
    from kinesis_dstream_spark.operators import text as text_ops

    docs = load_table(spark, sf_dir, "documents")
    _match(
        text_ops.token_pmi_collocations(docs, min_count=3, top_k=20),
        duck,
        text_ops.token_pmi_collocations_sql(min_count=3, top_k=20),
        "pmi_3_20",
    )


def test_ndcg_nondefault_params(spark, duck, sf_dir):
    from kinesis_dstream_spark.operators import clustering

    emb = load_table(spark, sf_dir, "embeddings")
    _match(
        clustering.ann_ndcg_report(emb, n_queries=6, topk=4, n_probe=3),
        duck,
        clustering.ann_ndcg_report_sql(n_queries=6, topk=4, n_probe=3),
        "ndcg_6_4_3",
    )


def test_dsir_select_nondefault_topn(spark, duck, sf_dir):
    from kinesis_dstream_spark.operators import curation

    docs = load_table(spark, sf_dir, "documents")
    _match(
        curation.dsir_select_topk(docs, top_n=17),
        duck,
        curation.dsir_select_topk_sql(top_n=17),
        "dsir_select_17",
    )


def test_knn_graph_ingest_binding_cap_twin(spark, duck, sf_dir, tmp_path):
    """r13: the back-link cap where it BINDS. The driver fixture's
    default 80/20 split never pushes a pool node past m_back (the
    goldens read unchanged), so the registry oracle alone does not
    exercise the merge cut cross-engine. This lockstep INVERTS the
    split — 20% base pool, 80% ingested in two batches — so pool nodes
    receive ~48 candidate back-links and the top-m_back selection
    decides the adjacency; the drained store serve must still
    hash-match the capped SQL twin."""
    from pyspark.sql import functions as F

    from kinesis_dstream_spark.operators import knn_graph

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "knng_bind")
    knn_graph.knn_graph_store_ensure(emb.filter(F.col("vec_id") % 5 == 4), path)
    rest = emb.filter(F.col("vec_id") % 5 != 4)
    knn_graph.knn_graph_store_append(rest.filter(F.col("vec_id") % 2 == 0), path)
    knn_graph.knn_graph_store_append(rest.filter(F.col("vec_id") % 2 == 1), path)
    _match(
        knn_graph.knn_graph_serve_frozen(spark, path),
        duck,
        knn_graph.ann_knn_graph_ingest_sql(
            fit_pred="vec_id % 5 = 4", new_pred="{col} % 5 <> 4"
        ),
        "knn_graph_binding_cap",
    )
