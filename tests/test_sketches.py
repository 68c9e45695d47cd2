"""Mergeable-sketch guarantees (operators/sketches.py).

The sketch estimates are probabilistic, so the driver registers them
rows-only; THESE tests are the correctness story — the published
HLL / CMS guarantees pinned on the fixtures, plus the mergeability
properties that justify the persisted-granule design.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from kinesis_dstream_spark.operators import sketches
from kinesis_dstream_spark.tables import load_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


@pytest.fixture(scope="module")
def documents(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


class TestHllRollup:
    def test_estimate_within_relative_error(self, events):
        est = {
            r["event_type"]: r["est_users"]
            for r in sketches.hll_distinct_rollup(events, lgk=12).collect()
        }
        exact = {
            r["event_type"]: r["x"]
            for r in events.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("x"))
            .collect()
        }
        assert set(est) == set(exact)
        # rel stderr ≈ 1.04/sqrt(2^12) ≈ 1.6%; allow 5 sigma
        tol = 5 * 1.04 / math.sqrt(2**12)
        for k, v in exact.items():
            assert abs(est[k] - v) <= max(1, tol * v), (k, est[k], v)

    def test_union_of_daily_sketches_is_lossless(self, events):
        """Rolling up persisted daily sketches must equal sketching the
        raw rows directly — the property that lets a 100 TB pipeline
        answer range queries from sketches alone."""
        rolled = {
            r["event_type"]: r["est_users"]
            for r in sketches.hll_distinct_rollup(events, lgk=12).collect()
        }
        direct = {
            r["event_type"]: r["e"]
            for r in events.groupBy("event_type")
            .agg(
                F.hll_sketch_estimate(
                    F.hll_sketch_agg("user_id", F.lit(12))
                ).alias("e")
            )
            .collect()
        }
        assert rolled == direct

    def test_rollup_counts_cover_all_events(self, events):
        out = sketches.hll_distinct_rollup(events).agg(F.sum("n_events")).first()[0]
        assert out == events.count()


class TestCmsHeavyHitters:
    def test_exact_twin_matches_groupby(self, documents):
        top = sketches.heavy_hitter_tokens(documents, k=10).collect()
        assert len(top) == 10
        # descending counts, token tie-break
        pairs = [(r["n_occurrences"], r["token"]) for r in top]
        assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))

    def test_cms_never_underestimates_and_bounded_over(self, documents):
        rows = sketches.cms_heavy_hitters(documents, k=20).collect()
        assert len(rows) == 20
        n_total = documents.select(
            F.explode(sketches.tokens(F.col("text"))).alias("t")
        ).filter(F.col("t") != "").count()
        eps = math.e / sketches.CMS_WIDTH
        for r in rows:
            assert r["cms_estimate"] >= r["n_occurrences"], r
            # standard CMS bound, generous multiplier for the union of
            # 20 probes (per-probe failure prob e^-depth ≈ 1.8%)
            assert r["cms_estimate"] <= r["n_occurrences"] + 3 * eps * n_total, r

    def test_cms_table_is_mergeable(self, spark, documents):
        """CMS of the whole corpus == counter-wise sum of the CMS of two
        disjoint halves — the relational form of sketch merge."""
        whole = sketches.cms_table(documents)
        h1 = sketches.cms_table(documents.filter(F.col("doc_id") % 2 == 0))
        h2 = sketches.cms_table(documents.filter(F.col("doc_id") % 2 == 1))
        merged = (
            h1.unionByName(h2).groupBy("r", "b").agg(F.sum("cnt").alias("cnt"))
        )
        diff = whole.alias("w").join(
            merged.alias("m"), ["r", "b"], "full"
        ).filter(
            F.coalesce(F.col("w.cnt"), F.lit(0))
            != F.coalesce(F.col("m.cnt"), F.lit(0))
        )
        assert diff.count() == 0

    def test_cms_total_mass(self, documents):
        """Every row of the sketch holds the full occurrence count."""
        n_total = documents.select(
            F.explode(sketches.tokens(F.col("text"))).alias("t")
        ).filter(F.col("t") != "").count()
        per_row = (
            sketches.cms_table(documents)
            .groupBy("r")
            .agg(F.sum("cnt").alias("mass"))
            .collect()
        )
        assert len(per_row) == sketches.CMS_DEPTH
        assert all(r["mass"] == n_total for r in per_row)


class TestKMVQuantiles:
    def test_two_level_tournament_equals_direct_bottom_k(self, spark, sf_dir):
        """Sharded granule build == single-level per-day bottom-k
        (bottom-k mergeability — the property that makes the sketch safe
        to build without a whole-day window partition)."""
        from pyspark.sql import Window

        ev = load_table(spark, sf_dir, "events")
        sharded = sketches.kmv_day_granules(ev, k=64, shards=8).select(
            "day", "event_id"
        )
        base = ev.select(
            F.date_trunc("day", "ts").alias("day"),
            F.md5(F.col("event_id").cast("string")).alias("rk"),
            "event_id",
        )
        w = Window.partitionBy("day").orderBy("rk", "event_id")
        direct = (
            base.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 64)
            .select("day", "event_id")
        )
        assert sharded.exceptAll(direct).count() == 0
        assert direct.exceptAll(sharded).count() == 0

    def test_quantile_estimates_within_sampling_error(self, spark, sf_dir):
        """The estimated q-quantile's TRUE rank in the full data is within
        the DKW-style sampling band q ± 3/sqrt(k)."""
        ev = load_table(spark, sf_dir, "events")
        n_total = ev.count()
        ests = sketches.kmv_quantile_rollup(spark, ev).collect()
        assert [r["q"] for r in ests] == [0.5, 0.9, 0.99]
        eps = 3.0 / (sketches.KMV_K ** 0.5) + 1.0 / min(n_total, sketches.KMV_K)
        for r in ests:
            true_rank = ev.filter(F.col("value") <= r["est_value"]).count() / n_total
            assert abs(true_rank - r["q"]) <= eps, (r["q"], true_rank)


class TestBloomGranules:
    def test_no_false_negatives(self, spark, sf_dir):
        """Every src0 text must claim membership in src0's granule."""
        docs = load_table(spark, sf_dir, "documents")
        stats = {
            r["set_tag"]: r
            for r in sketches.bloom_membership_stats(spark, docs).collect()
        }
        assert stats["present"]["claimed_pairs"] >= stats["present"]["n_keys"]

    def test_false_positive_rate_bounded(self, spark, sf_dir):
        """Absent keys were never ingested: any claim is a false positive.
        At m=8192, h=3 and fixture-scale sources the expected FP rate is
        far below 5% of probed (key, source) pairs."""
        docs = load_table(spark, sf_dir, "documents")
        n_sources = docs.select("source").distinct().count()
        stats = {
            r["set_tag"]: r
            for r in sketches.bloom_membership_stats(spark, docs).collect()
        }
        absent = stats["absent"]
        assert absent["claimed_pairs"] <= 0.05 * absent["n_keys"] * n_sources

    def test_granule_merge_is_union(self, spark, sf_dir):
        """Filter of a union of corpora == union of the filters."""
        docs = load_table(spark, sf_dir, "documents")
        h1 = sketches.bloom_granules(docs.filter(F.col("doc_id") % 2 == 0))
        h2 = sketches.bloom_granules(docs.filter(F.col("doc_id") % 2 == 1))
        merged = h1.unionByName(h2).distinct()
        whole = sketches.bloom_granules(docs)
        assert merged.exceptAll(whole).count() == 0
        assert whole.exceptAll(merged).count() == 0


def test_theta_set_algebra_bounds(spark, sf_dir):
    """Sketch-theory invariants: estimates within ~5/√k relative error
    of exact (k=64 → 62%— generous CI for one draw; typical ~12%),
    intersection ≤ min(|A|,|B|), union ≥ max and consistent with
    inclusion-exclusion on the EXACT columns."""
    from kinesis_dstream_spark.operators.sketches import theta_set_intersection
    from kinesis_dstream_spark.tables import load_table

    rows = {
        r.set_name: r
        for r in theta_set_intersection(load_table(spark, sf_dir, "events")).collect()
    }
    assert set(rows) == {"high_value", "high_activity", "intersection", "union"}
    v, p, i, u = (rows["high_value"], rows["high_activity"],
                  rows["intersection"], rows["union"])
    assert i.exact_distinct <= min(v.exact_distinct, p.exact_distinct)
    assert u.exact_distinct >= max(v.exact_distinct, p.exact_distinct)
    assert u.exact_distinct == v.exact_distinct + p.exact_distinct - i.exact_distinct
    for r in rows.values():
        if r.exact_distinct >= 64:  # sketch regime
            assert abs(r.rel_err) < 0.625, (r.set_name, r.rel_err)
        else:  # exact regime below k
            assert r.est_distinct == float(r.exact_distinct)
