"""Semantic referee tests for the r11 second-wave operators: bigram-LM
perplexity, containment dedup, local clustering, Zipf fit, and the
gini granule-store consumer. Value-level exactness is covered by the
DuckDB oracles; these pin the semantics the oracle can't (constructed
ground truth, serve-equals-scan)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kinesis_dstream_spark.operators import curation, dedup, graph, text


def test_bigram_lm_orders_fluency(spark):
    """The bigram model must score a repeated high-probability
    transition above a scrambled bag of the same words — exactly the
    signal the unigram proxy cannot see (both docs share the unigram
    distribution)."""
    base = [("t", f"d{i}", "the cat sat on the mat and the cat sat again")
            for i in range(8)]
    # fluent doc repeats the corpus's dominant transitions; scrambled
    # doc uses the SAME words in an order the corpus never produces
    rows = base + [
        ("t", "fluent", "the cat sat on the mat"),
        ("t", "scrambled", "mat the on sat cat the"),
    ]
    docs = spark.createDataFrame(
        [(i, r[1], r[0], r[2], len(r[2])) for i, r in enumerate(rows)],
        "doc_id long, title string, source string, text string, n_chars long",
    ).select("doc_id", "source", "text", "n_chars")
    out = {
        r.doc_id: r.avg_logprob
        for r in curation.bigram_lm_perplexity(docs, vocab_size=50).collect()
    }
    fluent_id = len(base)
    scrambled_id = len(base) + 1
    assert out[fluent_id] > out[scrambled_id]


def test_bigram_lm_rows_sum_to_one(spark):
    """Laplace rows are a proper conditional: for a tiny closed corpus,
    sum over all (V+1) successors of P(w2|w1) == 1 exactly — verified
    by reconstructing the model from the operator's own counts."""
    docs = spark.createDataFrame(
        [(0, "s", "a b a b a", 9), (1, "s", "b a b", 5)],
        "doc_id long, source string, text string, n_chars long",
    )
    V = 3
    out = curation.bigram_lm_perplexity(docs, vocab_size=V).collect()
    # corpus bigrams: doc0 = ab,ba,ab,ba ; doc1 = ba,ab → c(a,b)=3,c(b,a)=3
    # vocab by (cnt desc, term asc): a(4) → 1, b(4) → 2; V+1 = 4
    # P(b|a) = (3+1)/(4+4)  — c(a→·)=4? doc0 a appears at pos 1,3,5 (ctx 2) +
    # recompute: contexts of a: doc0 positions 0,2 (followed by b), pos 4 (last,
    # no bigram) → 2; doc1 pos 1 (followed by b) → 1 ⇒ c1(a)=3
    # lp(a→b) = ln((3+1)/(3+4)) = ln(4/7)
    lp_ab = math.log(4 / 7)
    # doc1 = "b a b": bigrams (b,a), (a,b) → avg = (lp_ba + lp_ab)/2
    # c(b→·): doc0 pos1,3 → 2; doc1 pos0 → 1 ⇒ 3; c(b,a)=3 ⇒ lp_ba = ln(4/7)
    expected = round((round(lp_ab * 1e6) + round(lp_ab * 1e6)) / 2 / 1e6, 4)
    got = {r.doc_id: r.avg_logprob for r in out}
    assert got[1] == pytest.approx(expected, abs=1e-4)


def test_containment_catches_what_jaccard_misses(spark):
    """A short doc fully embedded in a long one: containment 1.0 in
    the src→dst direction while Jaccard at the same threshold drops
    the pair — the operator's reason to exist."""
    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    long_doc = short + " " + filler
    docs = spark.createDataFrame(
        [(0, "s", short, len(short)), (1, "s", long_doc, len(long_doc))],
        "doc_id long, source string, text string, n_chars long",
    )
    cont = dedup.dedup_ngram_containment(docs, threshold=0.6).collect()
    jac = dedup.dedup_ngram_jaccard(docs, threshold=0.6).collect()
    directed = {(r.doc_src, r.doc_dst): r.containment for r in cont}
    assert directed.get((0, 1)) == 1.0  # short fully inside long
    assert (1, 0) not in directed  # reverse direction dilutes
    assert jac == []  # Jaccard ≤ |A|/|B| < 0.6 → provably dropped


def test_local_clustering_known_graph(spark):
    """Triangle + pendant: nodes 0,1,2 form a triangle, node 3 hangs
    off node 0. lcc: triangle-only corners 1.0; the hub (deg 3, one
    triangle) 2·1/(3·2) = 1/3; the leaf 0."""
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (0, 3)], "doc_a long, doc_b long"
    )
    out = {r.node: r for r in graph.local_clustering_profile(
        None, pairs=pairs).collect()}
    assert out[1].n_tri == 1 and out[1].lcc == 1.0
    assert out[2].n_tri == 1 and out[2].lcc == 1.0
    assert out[0].degree == 3 and out[0].n_tri == 1
    assert out[0].lcc == pytest.approx(1 / 3, abs=1e-6)
    assert out[3].n_tri == 0 and out[3].lcc == 0.0


def test_zipf_slope_on_synthetic_power_law(spark):
    """A corpus constructed with freq(rank) = C·rank^(−1) must fit
    slope ≈ −1 with r² ≈ 1 (exact power law, log-log linear)."""
    words = []
    for rank in range(1, 41):
        words += [f"tok{rank:03d}"] * max(1, round(4000 / rank))
    docs = spark.createDataFrame(
        [(0, "p", " ".join(words), 1)],
        "doc_id long, source string, text string, n_chars long",
    )
    row = text.zipf_fit_by_source(docs, top_n=40).collect()[0]
    assert row.zipf_slope == pytest.approx(-1.0, abs=0.02)
    assert row.r2 > 0.999


def test_gini_store_serve_equals_scan(spark):
    """The granule-store path must be value-identical to the scan path
    (stale/absent store falls back, fresh store serves) — here the
    arithmetic body identity: gini_from_value_frequency on a freq
    table built from events == value_gini_by_type on the events."""
    from kinesis_dstream_spark.operators import dataquality
    from kinesis_dstream_spark.functions.exact import fixedpoint

    events = spark.createDataFrame(
        [(i, f"u{i%3}", "buy" if i % 2 else "view", float(i % 7), "2024-01-0%d" % (i % 9 + 1))
         for i in range(40)],
        "event_id long, user_id string, event_type string, value double, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    scan = {(r.event_type, r.gini) for r in
            dataquality.value_gini_by_type(events).collect()}
    freq = (
        events.select("event_type",
                      fixedpoint(F.col("value"), dataquality._PCT_SCALE).alias("iv"))
        .groupBy("event_type", "iv").agg(F.count(F.lit(1)).alias("c"))
    )
    served = {(r.event_type, r.gini) for r in
              dataquality.gini_from_value_frequency(freq).collect()}
    assert scan == served


def test_fellegi_sunter_rare_field_outweighs_common(spark):
    """The FS property a distance threshold can't express: agreement
    on a rare field (many values → low u) must contribute a LARGER
    log-odds weight than agreement on a common field (few values →
    high u). Constructed catalog: p_type has 20 values, p_brand has 2;
    the pair agreeing only on type must outscore the pair agreeing
    only on brand."""
    from kinesis_dstream_spark.operators import linkage

    rows = []
    # base population establishing the frequency profile
    for i in range(40):
        rows.append((i, "alpha widget", f"B{i % 2}", f"T{i % 20}", i % 5))
    # pair (100, 101): same TYPE (rare), different brand
    rows.append((100, "beta widget", "B0", "T99", 1))
    rows.append((101, "betax widget", "B1", "T99", 2))
    # pair (200, 201): same BRAND (common), different type
    rows.append((200, "gamma widget", "B0", "T98", 1))
    rows.append((201, "gammax widget", "B0", "T97", 2))
    part = spark.createDataFrame(
        rows, "p_partkey long, p_name string, p_brand string, p_type string, p_size long"
    )
    out = {
        (r.a_key, r.b_key): r
        for r in linkage.fellegi_sunter_scores(part).collect()
    }
    assert (100, 101) in out and (200, 201) in out
    rare = out[(100, 101)]
    common = out[(200, 201)]
    assert rare.agree_type == 1 and rare.agree_brand == 0
    assert common.agree_brand == 1 and common.agree_type == 0
    assert rare.match_weight > common.match_weight


def test_fellegi_sunter_batch_is_pure_subset(spark):
    """a_max only restricts the left side: the batched output must be
    EXACTLY the unbatched rows with a_key < a_max (weights included) —
    the filter relocates, the arithmetic doesn't change."""
    from kinesis_dstream_spark.operators import linkage
    from kinesis_dstream_spark.tables import load_table

    part = load_table(spark, "/root/testdata/sf0.001", "part")
    full = {
        (r.a_key, r.b_key): r.match_weight
        for r in linkage.fellegi_sunter_scores(part).collect()
    }
    batched = {
        (r.a_key, r.b_key): r.match_weight
        for r in linkage.fellegi_sunter_scores(part, a_max=50).collect()
    }
    assert batched == {k: v for k, v in full.items() if k[0] < 50}


def test_y4m_shot_detector_on_handbuilt_video(spark):
    """Hand-assembled 4x4 C444 stream with lumas [10, 12, 200, 202]:
    exactly one cut (12→200), max diff 188, mean (2+188+2)/3."""
    from kinesis_dstream_spark.operators import multimodal

    w = h = 4
    parts = [b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C444\n"]
    for y in (10, 12, 200, 202):
        parts.append(b"FRAME\n")
        parts.append(bytes([y]) * (w * h) + bytes([128]) * (w * h) * 2)
    good = b"".join(parts)
    media = spark.createDataFrame(
        [(0, bytearray(good)), (1, bytearray(b"garbage"))],
        "media_id long, payload binary",
    )
    out = {r.media_id: r for r in multimodal.detect_y4m_shots(media).collect()}
    r = out[0]
    assert (r.n_frames, r.n_cuts, r.n_shots) == (4, 1, 2)
    assert r.max_frame_diff == 188.0
    assert r.mean_frame_diff == round((2 + 188 + 2) / 3, 4)
    assert out[1].n_frames is None  # malformed payload quarantined


def test_source_overlap_nested_and_disjoint(spark):
    """Source A's text fully inside source B → containment(A→B) = 1.0;
    a disjoint source C still gets grid rows with n_shared = 0 (the
    matrix is never vacuously sparse)."""
    a_text = "one two three four five six"
    b_text = a_text + " seven eight nine ten eleven twelve"
    c_text = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [(0, "A", a_text, 1), (1, "B", b_text, 1), (2, "C", c_text, 1)],
        "doc_id long, source string, text string, n_chars long",
    )
    out = {(r.source_a, r.source_b): r
           for r in curation.source_overlap_matrix(docs).collect()}
    assert len(out) == 6  # full 3x2 ordered grid
    assert out[("A", "B")].containment == 1.0
    assert out[("B", "A")].containment < 1.0
    assert out[("A", "C")].n_shared == 0 and out[("A", "C")].containment == 0.0


def test_categorical_mi_dependent_vs_independent(spark):
    """Perfect dependence (B a function of A) gives MI = H(A) and
    NMI = 1; an independent pair gives MI ≈ 0 — pinned on a
    constructed catalog where brand determines type but size is
    uniform within every (brand, type)."""
    from kinesis_dstream_spark.operators import dataquality

    rows = []
    for i in range(240):
        brand = f"B{i % 4}"
        ptype = f"T{i % 4}"        # type == f(brand): perfect dependence
        size = i % 3               # independent of brand (4×3 balanced grid)
        rows.append((i, f"part {i}", brand, ptype, size))
    part = spark.createDataFrame(
        rows, "p_partkey long, p_name string, p_brand string, p_type string, p_size long"
    )
    out = {(r.col_a, r.col_b): r
           for r in dataquality.categorical_mi_profile(part).collect()}
    dep = out[("p_brand", "p_type")]
    ind = out[("p_brand", "p_size")]
    assert dep.nmi == pytest.approx(1.0, abs=1e-3)
    assert dep.mi_nats == pytest.approx(dep.h_a, abs=1e-4)
    assert abs(ind.mi_nats) < 1e-4


def test_assortativity_star_vs_clique(spark):
    """A star is maximally disassortative (r = −1: every edge joins the
    hub to a leaf); a clique has zero degree variance (r undefined →
    NULL). Pinned on constructed graphs."""
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "doc_a long, doc_b long"
    )
    r_star = graph.degree_assortativity(None, pairs=star).collect()[0]
    assert r_star.assortativity == -1.0
    clique = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)],
        "doc_a long, doc_b long",
    )
    r_clique = graph.degree_assortativity(None, pairs=clique).collect()[0]
    assert r_clique.assortativity is None  # zero variance → NULL


def test_packing_efficiency_closed_forms(spark):
    """Hand-checkable corpus: lens [100, 600, 1500] at L=512 —
    seqs_one_doc = 1+2+3 = 6, pad = (512−100)+(1024−600)+(1536−1500)
    = 412+424+36 = 872, packed_lb = ceil(2200/512) = 5."""
    docs = spark.createDataFrame(
        [(i, "s", " ".join(["w"] * n), n) for i, n in
         enumerate([100, 600, 1500])],
        "doc_id long, source string, text string, n_chars long",
    )
    out = {r.context_len: r for r in
           curation.packing_efficiency_report(docs, lengths=[512]).collect()}
    r = out[512]
    assert r.total_tokens == 2200
    assert r.seqs_one_doc == 6
    assert r.pad_one_doc == 872
    assert r.seqs_packed_lb == 5
    assert r.pad_one_doc_ppm == 872 * 1_000_000 // (6 * 512)
    assert r.pack_gain_ppm == (6 - 5) * 1_000_000 // 6


def test_doc_novelty_duplicate_vs_unique(spark):
    """An exact duplicate pair has novelty 0 (every shingle shared);
    a document with unique text has novelty 1e6."""
    dup = "alpha beta gamma delta epsilon zeta eta theta"
    uniq = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [(0, "s", dup, 1), (1, "s", dup, 1), (2, "s", uniq, 1)],
        "doc_id long, source string, text string, n_chars long",
    )
    out = {r.doc_id: r for r in text.doc_novelty_score(docs).collect()}
    assert out[0].novelty_ppm == 0 and out[1].novelty_ppm == 0
    assert out[2].novelty_ppm == 1_000_000
    assert out[2].n_shared == 0


def test_trimmed_mean_known_values_and_outlier_robustness(spark):
    """Hand-checkable: values 1..20 with one absurd outlier 1000 —
    the 5% trim (t = floor(21·5/100) = 1) drops exactly the min and
    the max, so trimmed_mean = mean(2..20) while plain_mean is
    dragged ~47 up by the outlier."""
    from kinesis_dstream_spark.operators import dataquality

    rows = [(i, f"u{i}", "buy", float(i + 1), "2024-01-01") for i in range(20)]
    rows.append((20, "u20", "buy", 1000.0, "2024-01-01"))
    events = spark.createDataFrame(
        rows,
        "event_id long, user_id string, event_type string, value double, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    r = dataquality.value_trimmed_mean(events).collect()[0]
    assert r.n == 21 and r.trimmed_n == 19
    assert r.trimmed_mean == round(sum(range(2, 21)) / 19, 4)
    assert r.plain_mean > r.trimmed_mean + 40


def test_sentence_stats_prose_vs_fragments(spark):
    """Prose (few long sentences) vs a nav-bar fragment storm (many
    <3-word segments): the fragment share separates them."""
    prose = "The quick brown fox jumps over the lazy dog. " \
            "It then rests beneath the old oak tree for a while."
    navbar = "Home. About. Contact. Products. News. Blog. Login."
    docs = spark.createDataFrame(
        [(0, "s", prose, 1), (1, "s", navbar, 1), (2, "s", "", 0)],
        "doc_id long, source string, text string, n_chars long",
    )
    out = {r.doc_id: r for r in text.sentence_stats(docs).collect()}
    assert out[0].n_sentences == 2
    assert out[0].short_sent_ppm == 0
    assert out[0].mean_sent_words == pytest.approx(
        (9 + 11) / 2, abs=0.01
    )
    assert out[1].n_sentences == 7
    assert out[1].short_sent_ppm == 1_000_000
    assert out[2].n_sentences == 0 and out[2].mean_sent_words is None


def test_tukey_fences_hand_checked(spark):
    """1..100 plus outliers -500 and 999 (n=102): nearest-rank
    q1 = value at rank ceil(25.5) = 25, q3 = value at rank
    ceil(76.5) = 76, IQR = 51, fences [-51.5, 152.5] — exactly the two
    planted points fall outside."""
    from kinesis_dstream_spark.operators import dataquality

    vals = [float(i) for i in range(1, 101)] + [-500.0, 999.0]
    events = spark.createDataFrame(
        [(i, f"u{i}", "buy", v, "2024-01-01") for i, v in enumerate(vals)],
        "event_id long, user_id string, event_type string, value double, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    r = dataquality.value_tukey_outliers(events).collect()[0]
    assert (r.q1, r.q3, r.iqr) == (25.0, 76.0, 51.0)
    assert r.n_low == 1 and r.n_high == 1
    assert r.outlier_ppm == 2 * 1_000_000 // 102
