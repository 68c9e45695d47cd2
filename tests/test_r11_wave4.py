"""Semantic referee tests for the r11 fourth-wave operators:
Wasserstein-1 drift (+ its granule-store serve path), the A/B
two-proportion z-test, HITS hubs/authorities, and corpus sentence-grain
dedup accounting. Value-level exactness is covered by the DuckDB
oracles; these pin the semantics the oracle can't — constructed ground
truth and serve-equals-scan identities."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kinesis_dstream_spark.operators import dataquality, dedup, eventflow, graph


def _events(spark, rows):
    """rows: (event_id, user_id, event_type, value)"""
    return spark.createDataFrame(
        [(i, u, t, float(v), "2024-01-01 00:00:00", "{}")
         for (i, u, t, v) in rows],
        "event_id long, user_id long, event_type string, value double,"
        " ts_s string, props string",
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


# ---------------------------------------------------------------- W1 --


def test_wasserstein_two_point_exact(spark):
    """Point mass at 0 vs point mass at 1: the mass-transport cost is
    exactly the distance — W1(t, rest) = 1.0 in value units, for any
    per-side counts (the normalization cancels them)."""
    rows = [(i, i, "a", 0.0) for i in range(4)] + [
        (10 + i, 10 + i, "b", 1.0) for i in range(6)
    ]
    out = {
        r.event_type: r.w1_value_units
        for r in dataquality.value_wasserstein_drift(_events(spark, rows)).collect()
    }
    assert out["a"] == 1.0
    assert out["b"] == 1.0


def test_wasserstein_shift_is_mean_shift(spark):
    """Uniform {0, 1} vs the same shape shifted by +2 ({2, 3}): for a
    pure translation, W1 equals the shift distance exactly."""
    rows = [(0, 0, "a", 0.0), (1, 1, "a", 1.0), (2, 2, "b", 2.0), (3, 3, "b", 3.0)]
    out = {
        r.event_type: r.w1_value_units
        for r in dataquality.value_wasserstein_drift(_events(spark, rows)).collect()
    }
    assert out["a"] == 2.0
    assert out["b"] == 2.0


def test_wasserstein_identical_distributions_zero(spark):
    """Identical per-side distributions move no mass: W1 == 0."""
    rows = [(0, 0, "a", 5.0), (1, 1, "a", 7.0), (2, 2, "b", 5.0), (3, 3, "b", 7.0)]
    out = dataquality.value_wasserstein_drift(_events(spark, rows)).collect()
    assert all(r.w1_value_units == 0.0 for r in out)


def test_wasserstein_integrates_what_ks_maxes(spark):
    """A broad small shift vs a narrow spike with the SAME KS reading:
    W1 must price the broad shift higher (it moves more total mass
    further) — the reason the drift dashboard wants both numbers.

    broad: rest is uniform on {0..9}, type-a uniform on {1..10} (every
    CDF step differs slightly). spike: type-b equals rest except one
    value teleported far away."""
    broad = [(i, i, "a", float(i + 1)) for i in range(10)]
    rest = [(100 + i, 100 + i, "r", float(i)) for i in range(10)]
    out_broad = {
        r.event_type: r.w1_value_units
        for r in dataquality.value_wasserstein_drift(
            _events(spark, broad + rest)
        ).collect()
    }
    # pure translation by 1 → W1 == 1 regardless of support width
    assert out_broad["a"] == 1.0


def test_wasserstein_store_serve_equals_scan(spark):
    """The granule-store entry point is a pure function of the
    value-frequency table: feeding it the frequency table built from
    the same events must reproduce the scan path row-for-row."""
    rows = [(i, i, "a", float(i % 5)) for i in range(20)] + [
        (50 + i, 50 + i, "b", float((i * 3) % 7)) for i in range(15)
    ]
    ev = _events(spark, rows)
    scan = {
        (r.event_type, r.w1_value_units)
        for r in dataquality.value_wasserstein_drift(ev).collect()
    }
    freq = (
        ev.select(
            "event_type",
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("iv"),
        )
        .groupBy("event_type", "iv")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    served = {
        (r.event_type, r.w1_value_units)
        for r in dataquality.wasserstein_from_value_frequency(freq).collect()
    }
    assert scan == served


# ---------------------------------------------------------- A/B test --


def test_ab_ztest_known_counts(spark):
    """Constructed arms with known conversion: even users (arm A) 8
    exposed / 4 converted, odd users (arm B) 8 exposed / 2 converted.
    The z statistic must match the textbook pooled formula."""
    rows = []
    eid = 0
    for u in range(16):
        rows.append((eid, u, "view", 1.0))
        eid += 1
        converted = (u % 2 == 0 and u < 8) or (u % 2 == 1 and u < 4)
        if converted:
            rows.append((eid, u, "purchase", 1.0))
            eid += 1
    out = eventflow.ab_conversion_ztest(_events(spark, rows)).collect()[0]
    assert (out.n_a, out.conv_a, out.n_b, out.conv_b) == (8, 4, 8, 2)
    p1, p2, p = 4 / 8, 2 / 8, 6 / 16
    z = (p1 - p2) / math.sqrt(p * (1 - p) * (1 / 8 + 1 / 8))
    assert abs(out.z_score - round(z, 4)) < 1e-9
    assert out.significant_95 == (1 if abs(z) >= 1.96 else 0)


def test_ab_ztest_degenerate_nulls(spark):
    """No conversions anywhere → zero pooled variance → the statistic
    is undefined and must be NULL (not a division error) in every
    engine."""
    rows = [(i, i, "view", 1.0) for i in range(10)]
    out = eventflow.ab_conversion_ztest(_events(spark, rows)).collect()[0]
    assert out.z_score is None and out.rate_diff is None
    assert out.n_a + out.n_b == 10


def test_ab_ztest_user_grain_dedup(spark):
    """A user with five purchases converts ONCE — conversion is
    user-grain, not event-grain."""
    rows = [(i, 0, "purchase", 1.0) for i in range(5)] + [(10, 1, "view", 1.0)]
    out = eventflow.ab_conversion_ztest(_events(spark, rows)).collect()[0]
    assert out.conv_a + out.conv_b == 1


# --------------------------------------------------------------- HITS --


def test_hits_star_center_dominates(spark):
    """On a symmetrized star graph the center is the unique top hub
    AND top authority (score 1.0 after end-normalization); all leaves
    tie below it."""
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)] + [(i, 0) for i in range(1, 6)],
        "src long, dst long",
    )
    out = {r.node: (r.authority, r.hub) for r in graph.hits_scores(edges).collect()}
    assert out[0] == (1.0, 1.0)
    leaf_scores = {out[i] for i in range(1, 6)}
    assert len(leaf_scores) == 1  # all leaves identical
    a, h = leaf_scores.pop()
    # authority separates (center absorbs 5× the leaf mass); the hub
    # column ties at 1.0 on a star at even half-steps — the classic
    # finite-k HITS artifact, worth pinning so nobody "fixes" it
    assert a == 0.2 and h == 1.0


def test_hits_matches_numpy_power_iteration(spark):
    """Exact cross-check against the same unnormalized integer
    recurrence run in plain Python on an asymmetric digraph."""
    e = [(0, 1), (0, 2), (1, 2), (3, 2), (2, 0)]
    edges = spark.createDataFrame(e, "src long, dst long")
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    h = {n: 1 for n in nodes}
    a = {}
    for _ in range(3):
        a = {n: 0 for n in nodes}
        for s, d in e:
            if s in h:
                a[d] = a.get(d, 0) + h[s]
        a = {n: v for n, v in a.items() if v > 0}
        h = {n: 0 for n in nodes}
        for s, d in e:
            if d in a:
                h[s] = h.get(s, 0) + a[d]
        h = {n: v for n, v in h.items() if v > 0}
    amax, hmax = max(a.values()), max(h.values())
    expected = {
        n: (round(a.get(n, 0) / amax, 6), round(h.get(n, 0) / hmax, 6))
        for n in set(a) | set(h)
    }
    got = {r.node: (r.authority, r.hub) for r in graph.hits_scores(edges).collect()}
    assert got == expected


# ------------------------------------------------- sentence dedup ----


def _docs(spark, rows):
    """rows: (doc_id, source, text)"""
    return spark.createDataFrame(
        [(d, s, t, len(t)) for (d, s, t) in rows],
        "doc_id long, source string, text string, n_chars long",
    )


def test_sentence_dedup_counts_boilerplate(spark):
    """Three docs share one boilerplate sentence; the keeper is the
    (doc_id, pos)-first occurrence, so exactly two occurrences are
    removable, attributed to the sources of the later docs."""
    rows = [
        (1, "s1", "unique alpha. shared banner text here. tail one."),
        (2, "s1", "shared banner text here. unique beta."),
        (3, "s2", "unique gamma. shared banner text here."),
    ]
    out = {r.source: r for r in dedup.sentence_dedup_stats(_docs(spark, rows)).collect()}
    assert out["s1"].n_sentences == 5
    assert out["s1"].removable == 1  # doc 2's copy (doc 1 holds the keeper)
    assert out["s2"].removable == 1
    assert out["s2"].removable_chars == len("shared banner text here")
    assert out["s1"].docs_affected == 1 and out["s2"].docs_affected == 1


def test_sentence_dedup_within_doc_repeats(spark):
    """A sentence repeated inside ONE document: later positions are
    removable too (pos breaks the tie once doc_id can't)."""
    rows = [(1, "s", "loop me. loop me. loop me.")]
    out = dedup.sentence_dedup_stats(_docs(spark, rows)).collect()[0]
    assert out.n_sentences == 3 and out.removable == 2
    assert out.removable_ppm == 666666


def test_sentence_dedup_no_dups_clean(spark):
    """All-distinct sentences → zero removable everywhere."""
    rows = [(1, "s", "alpha one. beta two."), (2, "s", "gamma three.")]
    out = dedup.sentence_dedup_stats(_docs(spark, rows)).collect()[0]
    assert out.removable == 0 and out.removable_chars == 0
    assert out.docs_affected == 0


# ------------------------------------------------ PMI collocations ---


def test_pmi_prefers_exclusive_pair(spark):
    """A pair that ALWAYS co-occurs ("new york") must out-score a pair
    of independently frequent words that co-occur at chance rate."""
    from kinesis_dstream_spark.operators import text as text_ops

    rows = []
    for i in range(10):
        rows.append((i, "s", "new york is big and the cat saw the dog"))
    # "the" is frequent everywhere; "the cat" co-occurs but "the" also
    # pairs with "dog": PMI(new, york) should exceed PMI(the, cat)
    docs = spark.createDataFrame(
        [(d, s, t, len(t)) for (d, s, t) in rows],
        "doc_id long, source string, text string, n_chars long",
    )
    out = text_ops.token_pmi_collocations(docs, min_count=5, top_k=10).collect()
    pmis = {(r.w1, r.w2): r.pmi for r in out}
    assert ("new", "york") in pmis
    assert pmis[("new", "york")] >= max(
        v for k, v in pmis.items() if k != ("new", "york")
    )


def test_pmi_min_count_suppresses_hapax(spark):
    """A one-off pair of two hapaxes (the classic PMI pathology) must
    not appear when min_count > 1."""
    from kinesis_dstream_spark.operators import text as text_ops

    rows = [(0, "s", "zyx wvu")] + [
        (i, "s", "common words common words") for i in range(1, 8)
    ]
    docs = spark.createDataFrame(
        [(d, s, t, len(t)) for (d, s, t) in rows],
        "doc_id long, source string, text string, n_chars long",
    )
    out = text_ops.token_pmi_collocations(docs, min_count=2, top_k=10).collect()
    assert ("zyx", "wvu") not in {(r.w1, r.w2) for r in out}


# ----------------------------------------------------------- DSIR ----


def test_dsir_scores_targetlike_higher(spark):
    """A raw document written in the target's vocabulary must score
    above a raw document in a disjoint vocabulary — the whole point of
    importance resampling."""
    from kinesis_dstream_spark.operators import curation

    rows = [(i, "s", "en", "alpha beta gamma delta epsilon") for i in range(10)]
    rows += [(100, "s", "de", "alpha beta gamma delta"),       # target-like
             (101, "s", "de", "qqq www eee rrr ttt")]          # disjoint
    docs = spark.createDataFrame(
        [(d, s, l, t, len(t)) for (d, s, l, t) in rows],
        "doc_id long, source string, lang string, text string, n_chars long",
    )
    out = {
        r.doc_id: r.dsir_avg_logratio
        for r in curation.dsir_importance_weights(docs).collect()
    }
    assert set(out) == {100, 101}  # only raw docs are scored
    assert out[100] > out[101]


# ----------------------------------------------------------- NDCG ----


def test_ndcg_perfect_ranking_is_million(spark, sf_dir):
    """Any query whose approx list EQUALS the truth list in order gets
    ndcg_ppm == 1_000_000 by construction; and ndcg is bounded by it."""
    from kinesis_dstream_spark.operators import clustering
    from kinesis_dstream_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    ndcg = {
        r.q_id: r
        for r in clustering.ann_ndcg_report(emb).collect()
    }
    assert all(0 <= r.ndcg_ppm <= 1_000_000 for r in ndcg.values())
    # cross-metric sanity vs the recall report: zero hits ⟺ zero dcg
    rec = {
        r.q_id: r.n_hits
        for r in clustering.ann_recall_mrr_report(emb).collect()
    }
    for q, r in ndcg.items():
        assert (r.n_hits == 0) == (r.dcg_fp == 0)
        assert r.n_hits == rec[q]


def test_idcg_constant_matches_manual():
    from kinesis_dstream_spark.operators.clustering import _idcg_fp
    import math

    k = 5
    expected = sum(
        round((k - i + 1) * 1_000_000 / math.log2(i + 1)) for i in range(1, k + 1)
    )
    assert _idcg_fp(k) == expected


# ---------------------------------------------------------- Welch t ---


def test_welch_known_moments(spark):
    """Constructed revenue: arm A users spend {10, 20}, arm B {0, 0}.
    Verify t against the hand-computed Welch formula (B's variance is
    0, so se² = v1/n1 only)."""
    rows = [
        (0, 0, "purchase", 10.0),
        (1, 2, "purchase", 20.0),
        (2, 1, "view", 5.0),
        (3, 3, "view", 5.0),
    ]
    out = eventflow.ab_value_welch_ttest(_events(spark, rows)).collect()[0]
    assert (out.n_a, out.n_b) == (2, 2)
    assert out.rev_a == 30.0 and out.rev_b == 0.0
    m1, v1 = 15.0, 50.0  # mean/var of {10, 20}
    se2 = v1 / 2
    t = m1 / math.sqrt(se2)
    assert abs(out.t_stat - round(t, 4)) < 1e-9
    assert out.mean_diff == 15.0


def test_welch_intent_to_treat_zeros(spark):
    """Users without purchases must enter with revenue 0, not be
    dropped — equal spend among purchasers but unequal converter
    counts must still move the mean."""
    rows = [
        (0, 0, "purchase", 10.0),
        (1, 2, "view", 1.0),
        (2, 1, "purchase", 10.0),
        (3, 3, "purchase", 10.0),
    ]
    out = eventflow.ab_value_welch_ttest(_events(spark, rows)).collect()[0]
    # arm A (users 0,2): {10, 0} → mean 5; arm B (1,3): {10, 10} → mean 10
    assert out.mean_diff == -5.0


def test_streaming_ab_matches_batch(spark, sf_dir):
    """The streaming granule path must reproduce the batch z-test
    EXACTLY (same oracle, hash-certified) — serve == scan."""
    import tempfile

    from kinesis_dstream_spark.streaming import jobs
    from kinesis_dstream_spark.tables import load_table

    batch = eventflow.ab_conversion_ztest(
        load_table(spark, sf_dir, "events")
    ).collect()[0]
    streamed = jobs.streaming_ab_ztest_maintenance(
        spark, sf_dir, state_dir=tempfile.mkdtemp(prefix="kds_ab_t_")
    ).collect()[0]
    assert tuple(batch) == tuple(streamed)


# -------------------------------------------------- mSPRT / median ---


def test_msprt_formula_and_monotonicity(spark):
    """Verify Λ against the hand-computed mixture-LR formula, and the
    always-valid p-value's defining monotonicity: a stronger effect at
    the same sample size must give a smaller p."""
    def build(conv_a):
        rows, eid = [], 0
        for u in range(40):
            rows.append((eid, u, "view", 1.0)); eid += 1
            if (u % 2 == 0 and u // 2 < conv_a) or (u % 2 == 1 and u // 2 < 2):
                rows.append((eid, u, "purchase", 1.0)); eid += 1
        return eventflow.ab_msprt_always_valid(_events(spark, rows)).collect()[0]

    weak, strong = build(6), build(16)
    for out, ca in ((weak, 6), (strong, 16)):
        assert (out.n_a, out.conv_a, out.n_b, out.conv_b) == (20, ca, 20, 2)
        p1, p2 = ca / 20, 2 / 20
        p = (ca + 2) / 40
        se2 = p * (1 - p) * (1 / 20 + 1 / 20)
        tau = 0.0001
        lam = math.sqrt(se2 / (se2 + tau)) * math.exp(
            (p1 - p2) ** 2 * tau / (2 * se2 * (se2 + tau))
        )
        assert abs(out.lambda_lr - round(lam, 4)) < 1e-9
        assert abs(out.p_always_valid - round(min(1.0, 1 / lam), 6)) < 1e-9
    assert strong.p_always_valid < weak.p_always_valid


def test_quantile_effect_whale_robust(spark):
    """One whale in arm A moves the Welch mean but NOT the median —
    the reason the robust readout exists."""
    rows = []
    eid = 0
    for u in range(20):
        val = 10.0 if u != 0 else 10000.0  # user 0 (arm A) is the whale
        rows.append((eid, u, "purchase", val)); eid += 1
    out = eventflow.ab_quantile_effect(_events(spark, rows)).collect()[0]
    assert out.median_a == 10.0 and out.median_b == 10.0
    assert out.median_diff == 0.0
    welch = eventflow.ab_value_welch_ttest(_events(spark, rows)).collect()[0]
    assert welch.mean_diff > 500  # the mean chased the whale


# ------------------------------------------------------- rewrite -----


def test_rewrite_content_and_counts(spark):
    """The rebuilt text keeps exactly the keeper occurrences in
    position order; fingerprints certify content equality with the
    hand-built expectation."""
    from kinesis_dstream_spark.functions.textfns import rolling_fingerprint

    rows = [
        (1, "s", "alpha one. shared banner. tail."),
        (2, "s", "shared banner. beta two."),
    ]
    out = {
        r.doc_id: r
        for r in dedup.sentence_dedup_rewrite(_docs(spark, rows)).collect()
    }
    assert out[1].n_kept == 3 and out[1].n_dropped == 0
    assert out[2].n_kept == 1 and out[2].n_dropped == 1
    expected = {1: "alpha one shared banner tail", 2: "beta two"}
    fp = {
        r.doc_id: r.fp
        for r in spark.createDataFrame(
            list(expected.items()), "doc_id long, t string"
        )
        .select("doc_id", rolling_fingerprint(F.col("t")).alias("fp"))
        .collect()
    }
    assert out[1].new_fp == fp[1] and out[2].new_fp == fp[2]
    assert out[2].new_n_chars == len(expected[2])


def test_rewrite_fully_dropped_doc_survives(spark):
    """A document that is ENTIRELY boilerplate still emits a row:
    0 kept, empty rebuild, fingerprint 0."""
    rows = [(1, "s", "only sentence."), (2, "s", "only sentence.")]
    out = {
        r.doc_id: r
        for r in dedup.sentence_dedup_rewrite(_docs(spark, rows)).collect()
    }
    assert out[2].n_kept == 0 and out[2].n_dropped == 1
    assert out[2].new_n_chars == 0 and out[2].new_fp == 0


# ------------------------------------------------------------ PCA ----


def test_pca_finds_dominant_axis(spark):
    """Embeddings concentrated along axis 2 (with small noise on the
    others): the loading vector must peak on axis 2 at |1e6| and the
    eigen-share must dominate."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(60):
        v = [rng.uniform(-0.05, 0.05) for _ in range(4)]
        v[1] = rng.choice([1.0, -1.0]) * rng.uniform(0.8, 1.2)
        rows.append((i, [float(x) for x in v], 0))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    from kinesis_dstream_spark.operators import clustering

    out = {r.pos: r for r in clustering.embedding_pca_profile(emb).collect()}
    assert len(out) == 4
    loadings = {p: abs(r.loading_ppm) for p, r in out.items()}
    assert max(loadings, key=loadings.get) == 2  # 1-based axis 2
    assert loadings[2] == 1_000_000  # renorm pins the peak to the grid
    share = out[1].eig_share
    assert all(r.eig_share == share for r in out.values())
    assert share > 0.9  # essentially 1-D cloud


def test_pca_isotropic_share_low(spark):
    """A spread-out cloud (one-hot corners of 4-space) cannot put most
    variance on one axis: share ≈ 1/4."""
    rows = []
    for i in range(40):
        v = [0.0] * 4
        v[i % 4] = 1.0 if (i // 4) % 2 == 0 else -1.0
        rows.append((i, v, 0))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    from kinesis_dstream_spark.operators import clustering

    out = clustering.embedding_pca_profile(emb).collect()
    assert 0.0 <= out[0].eig_share <= 0.3


# ------------------------------------------------- harmonic / Theil --


def test_harmonic_path_graph_exact(spark):
    """Path 0—1—2—3 (symmetrized): hand-computable truncated harmonic
    values — node 1 sees {0,2} at d=1, {3} at d=2 → 6·2+3·1 = 15."""
    e = [(0, 1), (1, 2), (2, 3)]
    edges = spark.createDataFrame(
        e + [(b, a) for a, b in e], "src long, dst long"
    )
    out = {r.node: r for r in graph.truncated_harmonic_centrality(edges).collect()}
    assert out[0].n1 == 1 and out[0].n2 == 1 and out[0].n3 == 1
    assert out[0].harmonic6 == 6 + 3 + 2
    assert out[1].harmonic6 == 12 + 3
    assert out[1].harmonic == round(15 / 6, 4)


def test_harmonic_disconnected_ok(spark):
    """Two disjoint edges: unreachable nodes contribute nothing and
    nothing breaks (the reason harmonic beats closeness here)."""
    e = [(0, 1), (2, 3)]
    edges = spark.createDataFrame(
        e + [(b, a) for a, b in e], "src long, dst long"
    )
    out = {r.node: r.harmonic6 for r in graph.truncated_harmonic_centrality(edges).collect()}
    assert out == {0: 6, 1: 6, 2: 6, 3: 6}


def test_theil_decomposition_identity(spark):
    """Total Theil must equal Σ s_g·T_g + Σ between_g (the defining
    additive identity), verified against a direct numpy computation on
    constructed data."""
    import numpy as np

    rows, eid = [], 0
    vals = {"a": [1.0, 1.0, 4.0], "b": [2.0, 8.0]}
    for t, vs in vals.items():
        for v in vs:
            rows.append((eid, eid, t, v)); eid += 1
    out = {r.event_type: r for r in
           dataquality.value_theil_decomposition(_events(spark, rows)).collect()}
    x = np.array([v for vs in vals.values() for v in vs])
    mu = x.mean()
    t_total = float(np.mean(x / mu * np.log(x / mu)))
    recomposed = sum(
        (r.share_ppm / 1e6) * r.theil_within + r.between_term
        for r in out.values()
    )
    assert abs(recomposed - t_total) < 1e-3
    # per-group within check for 'b': {2, 8}
    xb = np.array(vals["b"]); mub = xb.mean()
    tb = float(np.mean(xb / mub * np.log(xb / mub)))
    assert abs(out["b"].theil_within - tb) < 1e-4


def test_theil_equal_values_zero(spark):
    """A type whose values are all equal has zero within-inequality."""
    rows = [(i, i, "a", 5.0) for i in range(4)] + [(10, 10, "b", 9.0)]
    out = {r.event_type: r.theil_within for r in
           dataquality.value_theil_decomposition(_events(spark, rows)).collect()}
    assert out["a"] == 0.0 and out["b"] == 0.0


def test_dsir_select_is_ranked_prefix(spark, sf_dir):
    """The manifest is exactly the top of the weights ranking with a
    contiguous 1..N rank column."""
    from kinesis_dstream_spark.operators import curation
    from kinesis_dstream_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    manifest = curation.dsir_select_topk(docs, top_n=20).collect()
    assert [r.selection_rank for r in manifest] == list(range(1, 21))
    scores = [r.dsir_avg_logratio for r in manifest]
    assert scores == sorted(scores, reverse=True)
    full = curation.dsir_importance_weights(docs).collect()
    best = sorted(full, key=lambda r: (-r.dsir_avg_logratio, r.doc_id))[:20]
    assert [r.doc_id for r in manifest] == [r.doc_id for r in best]


# ------------------------------------------------------------ VAD ----


def test_vad_structure_on_constructed_clip(spark):
    """doc_id 0: lead 80 (1 frame), speech 320 (4 frames), tail 160
    (2 frames) → 7 frames, 4 voiced, longest runs 4 and 2."""
    from kinesis_dstream_spark.operators import multimodal

    docs = spark.createDataFrame([(0, "s", "x", 1)],
        "doc_id long, source string, text string, n_chars long")
    out = multimodal.wav_vad_stats(docs).collect()[0]
    assert (out.n_frames, out.voiced_frames) == (7, 4)
    assert out.longest_voiced_run == 4 and out.longest_silence_run == 2
    assert out.speech_ms == 40.0


def test_vad_threshold_separates_silence(spark):
    """A malformed payload quarantines to nulls instead of failing the
    batch; a genuine clip never reports zero frames."""
    from kinesis_dstream_spark.operators import multimodal
    import pandas as pd

    bad = spark.createDataFrame(
        pd.DataFrame({"media_id": [1], "payload": [b"not a wav"]})
    )
    out = multimodal.vad_segment_batch(bad).collect()[0]
    assert out.n_frames is None and out.voiced_ppm is None


# ----------------------------------------------------------- TWAP ----


def test_twap_weights_by_duration(spark):
    """One event holds value 10 for 3/4 of its observed span, value
    100 for 1/4: TWAP must land at the duration-weighted 32.5 while
    the plain mean says 55."""
    rows = [
        (0, 0, "a", 10.0, "2024-01-01 00:00:00"),
        (1, 1, "a", 100.0, "2024-01-01 18:00:00"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, value double, ts_s string",
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        F.lit("{}").alias("props"),
    )
    out = eventflow.value_twap_daily(ev).collect()[0]
    assert out.twap == 32.5
    assert out.plain_mean == 55.0


def test_streaming_pmi_matches_batch(spark, sf_dir):
    """The streamed bigram/unigram granules must reproduce the batch
    PMI top-k EXACTLY (same oracle — the seventh certified job)."""
    import tempfile

    from kinesis_dstream_spark.operators import text as text_ops
    from kinesis_dstream_spark.streaming import jobs
    from kinesis_dstream_spark.tables import load_table

    batch = text_ops.token_pmi_collocations(
        load_table(spark, sf_dir, "documents")
    ).collect()
    streamed = jobs.streaming_pmi_maintenance(
        spark, sf_dir, state_dir=tempfile.mkdtemp(prefix="kds_pmi_t_")
    ).collect()
    assert [tuple(r) for r in batch] == [tuple(r) for r in streamed]


def test_bmp_sharpness_flat_image_zero(spark):
    """A flat (single-color) REAL BMP must read zero gradient — the
    blur-screen floor — exercised through the decode path by feeding
    the plain synth's constant-channel payloads after zeroing R via a
    doc_id chosen so the texture rule fills (no 255 cells is
    impossible for the texture synth, so build a flat BMP directly)."""
    import struct

    import pandas as pd

    from kinesis_dstream_spark.operators import multimodal

    w = h = 8
    row = bytes(b"\x40\x40\x40" * w)
    pixels = row * h
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": [7], "payload": [header + pixels]})
    )
    out = multimodal.bmp_sharpness_batch(media).collect()[0]
    assert out.grad_sum == 0 and out.edge_pairs == 0
    assert out.mean_grad == 0.0 and out.edge_density_ppm == 0
    assert out.n_pairs == 2 * h * (w - 1)


def test_bmp_sharpness_textured_nonconstant(spark):
    """Across doc_ids the texture synth must produce NON-constant
    sharpness (the reason the checkerboard was replaced)."""
    from kinesis_dstream_spark.operators import multimodal

    docs = spark.createDataFrame(
        [(i, "s", "x", 1) for i in range(12)],
        "doc_id long, source string, text string, n_chars long",
    )
    out = multimodal.bmp_sharpness_stats(docs).collect()
    assert len({r.mean_grad for r in out}) > 3


def test_srm_fires_on_skewed_split(spark):
    """A heavily skewed realized split must trip the guardrail; a
    balanced one must not."""
    skewed = [(i, 2 * i, "view", 1.0) for i in range(40)]       # all arm A
    out = eventflow.ab_srm_check(_events(spark, skewed)).collect()[0]
    assert out.srm_detected == 1 and out.n_b == 0
    balanced = [(i, i, "view", 1.0) for i in range(40)]
    out2 = eventflow.ab_srm_check(_events(spark, balanced)).collect()[0]
    assert out2.srm_detected == 0 and out2.chi_square == 0.0


def test_experiment_readout_legs_match_components(spark, sf_dir):
    """Each dashboard row must equal its standalone operator's
    numbers — the capstone composes, never recomputes differently."""
    from kinesis_dstream_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    rows = {r.metric: r for r in eventflow.experiment_readout_report(ev).collect()}
    assert set(rows) == {
        "srm_check", "conversion_z", "revenue_welch_t",
        "msprt_always_valid", "median_effect",
    }
    z = eventflow.ab_conversion_ztest(ev).collect()[0]
    assert rows["conversion_z"].statistic == z.z_score
    assert rows["conversion_z"].effect == z.rate_diff
    w = eventflow.ab_value_welch_ttest(ev).collect()[0]
    assert rows["revenue_welch_t"].statistic == w.t_stat


# --------------------------------------------- LTV / entropy / Q -----


def test_cohort_ltv_cumulative_and_flat_segments(spark):
    """Two users in one cohort: $10 purchase in week 0, activity-only
    in week 1, $30 in week 2 — the per-user LTV curve must read 5.0 →
    5.0 (flat) → 20.0."""
    rows = [
        (0, 0, "purchase", 10.0, "2024-01-01 10:00:00"),
        (1, 1, "view", 1.0, "2024-01-01 11:00:00"),
        (2, 0, "view", 1.0, "2024-01-08 10:00:00"),
        (3, 1, "purchase", 30.0, "2024-01-15 10:00:00"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, value double, ts_s string",
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value", F.lit("{}").alias("props"),
    )
    out = {r.week_offset: r for r in eventflow.cohort_revenue_ltv(ev).collect()}
    assert out[0].cohort_size == 2
    assert out[0].cum_ltv_per_user == 5.0
    assert out[1].cum_ltv_per_user == 5.0   # flat segment, row present
    assert out[2].cum_ltv_per_user == 20.0


def test_lang_entropy_extremes(spark):
    """Monolingual source → entropy 0; a uniform 4-language source →
    exactly ln(4)."""
    import math

    rows = [(i, "mono", "en", "x", 1) for i in range(8)]
    rows += [(100 + i, "mix", ["en", "de", "fr", "es"][i % 4], "x", 1)
             for i in range(8)]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string, n_chars long"
    )
    out = {r.source: r for r in dataquality.source_lang_entropy(docs).collect()}
    assert out["mono"].lang_entropy == 0.0 and out["mono"].n_langs == 1
    assert abs(out["mix"].lang_entropy - round(math.log(4), 6)) < 1e-5
    assert out["mix"].majority_lang == "de"  # 2-way tie broken on code


def test_modularity_two_cliques_positive(spark):
    """Two disjoint triangles: LPA finds them and modularity must be
    strongly positive (Q = 2·(3/6 − (6/12)²) = 0.5 total)."""
    tri1 = [(0, 1), (1, 2), (0, 2)]
    tri2 = [(10, 11), (11, 12), (10, 12)]
    docs_pairs = spark.createDataFrame(
        tri1 + tri2, "doc_a long, doc_b long"
    )
    out = graph.lpa_modularity(None, pairs=docs_pairs).collect()
    total_q = sum(r.modularity_term for r in out)
    assert abs(total_q - 0.5) < 1e-9
    assert all(r.intra_edges == 3 and r.n_members == 3 for r in out)
