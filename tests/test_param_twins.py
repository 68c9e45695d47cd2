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
