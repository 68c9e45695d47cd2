"""Dedup-operator semantics (E-10): recall bounds and exactness."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_dstream_spark.operators import dedup
from kinesis_dstream_spark.tables import load_table


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_exact_dedup_collapses_identical_texts(spark):
    df = _docs(spark, ["a b c", "a b c", "x y z", "a b c"])
    rows = {(r.keep_id, r.n_copies) for r in dedup.dedup_exact(df).collect()}
    assert rows == {(0, 3), (2, 1)}


def test_content_hash_equals_exact_grouping(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n_exact = dedup.dedup_exact(docs).count()
    n_hash = dedup.dedup_content_hash(docs).count()
    assert n_exact == n_hash  # sha256 collision-free on this corpus


def test_simhash_identical_docs_distance_zero(spark):
    df = _docs(spark, ["a b c d e f", "a b c d e f"])
    rows = dedup.dedup_simhash(df).collect()
    assert len(rows) == 1 and rows[0].hamming == 0


def test_simhash_banding_has_perfect_recall(spark, sf_dir):
    """Pigeonhole: 4 bands over 32 bits catch every pair with Hamming<=3,
    so the banded plan must equal brute force exactly."""
    docs = load_table(spark, sf_dir, "documents").limit(150)
    banded = {
        (r.doc_a, r.doc_b, r.hamming) for r in dedup.dedup_simhash(docs).collect()
    }
    sigs = dedup.simhash_signatures(docs)
    a, b = sigs.alias("a"), sigs.alias("b")
    brute = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias(
                "hamming"
            ),
        )
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    assert banded == brute


def test_minhash_lsh_recall_vs_exact_jaccard(spark, sf_dir):
    """Banded MinHash (8x4) at threshold 0.6 should recover nearly all
    exact-Jaccard pairs: P(candidate | s=0.6) = 1-(1-0.6^4)^8 ~ 0.70 per
    band-set, but verified pairs at s>=0.7 have P>0.93; assert >=0.8
    overall recall and zero false positives (output is exact-verified)."""
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.dedup_ngram_jaccard(docs, threshold=0.6).collect()
    }
    mh = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.dedup_minhash_lsh(docs, threshold=0.6).collect()
    }
    assert set(mh) <= set(exact)  # exact verification -> no false positives
    if exact:
        recall = len(set(mh) & set(exact)) / len(exact)
        assert recall >= 0.8, f"recall {recall}"
    for pair, j in mh.items():
        assert j == exact[pair]  # same Jaccard arithmetic on both paths


def test_embedding_cosine_pairs_are_symmetric_free(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    rows = dedup.dedup_embedding_cosine(emb, threshold=0.35).collect()
    assert all(r.vec_a < r.vec_b for r in rows)
    assert all(-1.0001 <= r.cos_sim <= 1.0001 for r in rows)


def test_embedding_cosine_pandas_path_matches_native(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 80)
    native = {
        (r.vec_a, r.vec_b, r.cos_sim)
        for r in dedup.dedup_embedding_cosine(emb, threshold=0.2).collect()
    }
    pandas_ = {
        (r.vec_a, r.vec_b, r.cos_sim)
        for r in dedup.dedup_embedding_cosine(
            emb, threshold=0.2, use_pandas=True
        ).collect()
    }
    assert native == pandas_


def test_cluster_assignment_is_consistent(spark, sf_dir):
    """Both endpoints of every near-dup pair share a representative, and
    the representative is the minimum doc_id of its cluster."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.dedup_ngram_jaccard(docs)
    clusters = dedup.dedup_clusters(pairs)
    rep = {r.doc_id: r.cluster_rep for r in clusters.collect()}
    for p in pairs.collect():
        assert rep[p.doc_a] == rep[p.doc_b]
    by_rep = {}
    for d, r in rep.items():
        by_rep.setdefault(r, []).append(d)
    for r, members in by_rep.items():
        assert r == min(members)


def test_embedding_cosine_pruned_equals_allpairs(spark, sf_dir):
    """The metric-pruned join is exact BY CONSTRUCTION (angular triangle
    inequality), so it must reproduce the naive all-pairs result bit-for-
    bit regardless of how KMeans happened to cluster."""
    emb = load_table(spark, sf_dir, "embeddings")
    pruned = {
        (r.vec_a, r.vec_b, r.cos_sim)
        for r in dedup.dedup_embedding_cosine(emb, threshold=0.35).collect()
    }
    naive = {
        (r.vec_a, r.vec_b, r.cos_sim)
        for r in dedup.dedup_embedding_cosine_allpairs(emb, threshold=0.35).collect()
    }
    assert pruned == naive


def test_embedding_cosine_plan_has_no_cartesian(spark, sf_dir):
    """The registered cosine-dedup path must never plan a cartesian:
    candidates come from broadcast cell pairs + hash equi-joins."""
    emb = load_table(spark, sf_dir, "embeddings")
    plan = (
        dedup.dedup_embedding_cosine(emb)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _clustered_embeddings(spark, n_clusters=20, per_cluster=10, dim=64, noise=0.25):
    """Synthetic corpus in LSH's target regime: tight clusters whose
    members are true near-dups (cos >= ~0.85), plus isotropic background."""
    import numpy as np

    rng = np.random.RandomState(7)
    rows = []
    vid = 0
    for c in range(n_clusters):
        center = rng.randn(dim)
        center /= np.linalg.norm(center)
        for _ in range(per_cluster):
            v = center + noise * rng.randn(dim) / np.sqrt(dim)
            rows.append((vid, c, [float(x) for x in v]))
            vid += 1
    for _ in range(200):  # background noise vectors
        rows.append((vid, -1, [float(x) for x in rng.randn(dim)]))
        vid += 1
    return spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")


def test_embedding_cosine_lsh_recall_in_target_regime(spark):
    """Multi-table sign-LSH on clustered data: high recall at cos>=0.8,
    zero false positives (candidates are exactly verified), and the
    candidate join key prevents any all-pairs plan."""
    emb = _clustered_embeddings(spark)
    exact = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in dedup.dedup_embedding_cosine_allpairs(emb, threshold=0.8).collect()
    }
    approx = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in dedup.dedup_embedding_cosine_lsh(emb, threshold=0.8).collect()
    }
    assert set(approx) <= set(exact)  # exact verify -> no false positives
    assert exact, "fixture must contain true near-dups"
    recall = len(set(approx) & set(exact)) / len(exact)
    assert recall >= 0.9, f"recall {recall}"
    for pair, cos in approx.items():
        assert cos == exact[pair]  # same scoring arithmetic on both paths


def test_embedding_cosine_lsh_recall_on_fixture(spark, sf_dir):
    """Worst-case regime for hyperplane LSH (isotropic vectors, threshold
    barely above the random-pair distribution): the 4x16 defaults must
    still clear 85% recall with zero false positives."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r.vec_a, r.vec_b)
        for r in dedup.dedup_embedding_cosine(emb).collect()
    }
    approx = {
        (r.vec_a, r.vec_b)
        for r in dedup.dedup_embedding_cosine_lsh(emb).collect()
    }
    assert approx <= exact
    assert len(approx & exact) / max(len(exact), 1) >= 0.85


def test_jaccard_hot_shingle_cap_bounds_candidates(spark):
    """Adversarial corpus: one stop-phrase in 50% of documents. Without
    the df cap the inverted index puts a quadratic pair count on that
    phrase's join key; with it the hot shingles vanish and candidates
    collapse to the planted true duplicates."""
    import itertools

    stop = "breaking news update for today readers"
    texts = []
    for i in range(80):
        tail = f"unique tail {i} alpha beta gamma delta epsilon"
        texts.append((stop + " " + tail) if i % 2 == 0 else tail)
    texts.append(texts[0])  # one planted exact duplicate pair
    docs = _docs(spark, texts)

    def n_candidates(max_df):
        kept = dedup.capped_shingles(docs, k=3, max_df=max_df)
        a, b = kept.alias("a"), kept.alias("b")
        return (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select("a.doc_id", "b.doc_id")
            .distinct()
            .count()
        )

    uncapped = n_candidates(max_df=10**9)
    capped = n_candidates(max_df=8)  # phrase df=41 >> 8; tails are unique
    assert uncapped > 40 * 40 / 2  # the quadratic key is real
    assert capped < 0.05 * uncapped, (capped, uncapped)

    # capped semantics stay correct: the planted duplicate pair survives
    # with Jaccard computed over the retained shingle vocabulary
    pairs = dedup.dedup_ngram_jaccard(docs, max_df=8, threshold=0.6).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(0, 80)}
    assert all(r.jaccard == 1.0 for r in pairs)


def test_jaccard_default_cap_is_inert_on_fixture(spark, sf_dir):
    """On the fixture no shingle reaches the default cap, so the capped
    operator must equal the uncapped definition exactly — this pins the
    oracle-facing semantics."""
    docs = load_table(spark, sf_dir, "documents")
    capped = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.dedup_ngram_jaccard(docs).collect()
    }
    uncapped = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.dedup_ngram_jaccard(docs, max_df=10**9).collect()
    }
    assert capped == uncapped and capped


def test_dedup_clusters_star_matches_min_label(spark, sf_dir):
    """Star-algorithm components must be label-for-label identical to
    min-label propagation on the fixture's near-dup pair graph."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.dedup_ngram_jaccard(docs)
    a = sorted(map(tuple, dedup.dedup_clusters(pairs).collect()))
    b = sorted(map(tuple, dedup.dedup_clusters_star(pairs).collect()))
    assert a == b and a


def test_dedup_clusters_star_logarithmic_rounds_on_chain(spark):
    """A 48-node chain (the worst case for min-label: diameter rounds)
    must converge in O(log n) star rounds with the correct single
    component."""
    n = 48
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a int, doc_b int"
    )
    stats: dict = {}
    out = dedup.dedup_clusters_star(pairs, max_iter=30, stats=stats).collect()
    assert {r.doc_id for r in out} == set(range(n))
    assert all(r.cluster_rep == 0 and r.cluster_size == n for r in out)
    # log₂(48) ≈ 5.6; allow slack for the alternation + the stationary
    # confirmation round — but far below the ~47 min-label rounds
    assert stats["rounds"] <= 12, stats
    # min-label on the same chain needs ~diameter rounds to reach the
    # same labels; verify equality at a high-enough cap
    ml = sorted(map(tuple, dedup.dedup_clusters(pairs, max_iter=60).collect()))
    assert ml == sorted(map(tuple, out))


def test_dedup_substring_detects_shared_spans(spark):
    """A paragraph copied between two documents must surface as
    duplicated k-gram positions in both; a unique doc must not."""
    shared = " ".join(f"w{i}" for i in range(12))  # 12 words > k=8
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma", "en", "src0"),
            (2, f"{shared} delta epsilon zeta", "en", "src0"),
            (3, "totally unrelated text with enough words to form grams here ok", "en", "src0"),
        ],
        "doc_id int, text string, lang string, source string",
    )
    rows = {r.doc_id: r for r in dedup.dedup_substring(docs, k=8).collect()}
    assert set(rows) == {1, 2}  # doc 3 shares nothing
    for d in (1, 2):
        assert rows[d].n_dup_grams >= 5  # the 12-word span yields 5 shared 8-grams
        assert 0 < rows[d].dup_frac <= 1


def test_dedup_substring_empty_and_no_dups(spark):
    empty = spark.createDataFrame([], "doc_id long, text string, lang string, source string")
    assert dedup.dedup_substring(empty).count() == 0
    uniq = spark.createDataFrame(
        [(1, "one singular document with no twin anywhere at all", "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    assert dedup.dedup_substring(uniq).count() == 0
    assert dedup.dedup_clusters_star(
        spark.createDataFrame([], "doc_a long, doc_b long")
    ).count() == 0


def test_dedup_index_build_check_recall(spark, sf_dir, tmp_path):
    """Cross-half near-dup pairs found by the full-corpus exact operator
    must be recovered by the persisted index check with recall >= 0.8
    (the LSH pytest convention), with exact-verified scores."""
    from kinesis_dstream_spark.operators import dedup_index

    docs = load_table(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "didx")
    dedup_index.dedup_index_build(hist, path)
    got = {
        (r.new_doc_id, r.dup_doc_id): r.jaccard
        for r in dedup_index.dedup_index_check(new, path, threshold=0.5).collect()
    }
    # ground truth: exact jaccard pairs crossing the halves
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.dedup_ngram_jaccard(docs, threshold=0.5).collect()
    }
    cross = {
        (a, b) if a % 2 == 1 else (b, a): j
        for (a, b), j in exact.items()
        if (a % 2) != (b % 2)
    }
    assert cross, "fixture must contain cross-half near-dups"
    hits = sum(1 for p in cross if p in got)
    assert hits / len(cross) >= 0.8, f"recall {hits}/{len(cross)}"


def test_dedup_index_ingest_is_replay_safe(spark, sf_dir, tmp_path):
    """Ingesting the same batch twice: the second pass flags every doc
    as a jaccard-1.0 dup of its first-pass twin and appends nothing."""
    from kinesis_dstream_spark.operators import dedup_index

    docs = load_table(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") < 100)
    batch = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 140))
    path = str(tmp_path / "didx")
    dedup_index.dedup_index_build(hist, path)
    n_sh = spark.read.parquet(path + "/shingles").count()
    dedup_index.dedup_index_ingest(batch, path)
    n_after_first = spark.read.parquet(path + "/shingles").count()
    assert n_after_first > n_sh
    dups = dedup_index.dedup_index_ingest(batch, path)
    flagged = {r.new_doc_id for r in dups.collect()}
    batch_ids = {r.doc_id for r in batch.select("doc_id").collect()}
    # every replayed doc is flagged: appended twins match at 1.0; docs
    # that were near-dups of history on the first pass (and so were
    # never appended) still match history above threshold
    assert flagged == batch_ids
    exact = {r.new_doc_id for r in dups.filter(F.col("jaccard") == 1.0).collect()}
    assert exact  # the appended twins really do match themselves
    assert spark.read.parquet(path + "/shingles").count() == n_after_first


def test_dedup_index_compaction_preserves_checks(spark, sf_dir, tmp_path):
    from kinesis_dstream_spark.operators import dedup_index
    from kinesis_dstream_spark.operators.ann_index import _n_parquet_files

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "didx")
    dedup_index.dedup_index_build(docs.filter(F.col("doc_id") < 100), path)
    for lo in range(100, 200, 25):
        dedup_index.dedup_index_append(
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 25)), path
        )
    probe = docs.filter(F.col("doc_id") >= 400)
    before = sorted(map(tuple, dedup_index.dedup_index_check(probe, path, 0.5).collect()))
    files_before = _n_parquet_files(path)
    stats = dedup_index.dedup_index_compact(spark, path, max_files=4)
    assert stats["tables_compacted"] == 2
    assert _n_parquet_files(path) < files_before
    after = sorted(map(tuple, dedup_index.dedup_index_check(probe, path, 0.5).collect()))
    assert after == before
    # idempotent
    assert dedup_index.dedup_index_compact(spark, path, max_files=4)["tables_compacted"] == 0


def test_dedup_substring_cut_removes_shared_spans_only(spark):
    """The copied span vanishes from both docs; unique text survives
    verbatim; short and unique docs are untouched."""
    shared = " ".join(f"w{i}" for i in range(9))
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma", "en", "s"),
            (2, f"{shared} end", "en", "s"),
            (3, "unrelated text entirely different from others totally", "en", "s"),
            (4, "tiny", "en", "s"),
        ],
        "doc_id int, text string, lang string, source string",
    )
    out = {r.doc_id: r for r in dedup.dedup_substring_cut(docs, k=8).collect()}
    assert out[1].kept_text == "alpha beta gamma" and out[1].n_removed == 9
    assert out[2].kept_text == "end" and out[2].n_removed == 9
    assert out[3].n_removed == 0
    assert out[3].kept_text == "unrelated text entirely different from others totally"
    assert out[4].n_removed == 0 and out[4].kept_text == "tiny"
    # conservation: kept + removed == total
    for r in out.values():
        kept_n = len(r.kept_text.split()) if r.kept_text else 0
        assert kept_n + r.n_removed == r.n_tokens


def test_near_dup_pairs_artifact_matches_live_and_detects_staleness(
    spark, sf_dir, tmp_path
):
    """The persisted pairs artifact must serve EXACTLY the live
    dedup_ngram_jaccard rows, reuse the parquet on a second call (no
    rebuild — meta mtime unchanged), and rebuild when the corpus
    changes (fingerprint staleness)."""
    import json
    import os

    from kinesis_dstream_spark.operators import pairs_store

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "ndpairs")
    got = pairs_store.near_dup_pairs_ensure(docs, path).collect()
    want = dedup.dedup_ngram_jaccard(docs).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    meta = os.path.join(path, pairs_store.META)
    with open(meta) as f:
        fp1 = json.load(f)["fingerprint"]
    t1 = os.path.getmtime(meta)
    again = pairs_store.near_dup_pairs_ensure(docs, path).collect()
    assert os.path.getmtime(meta) == t1  # served, not rebuilt
    assert sorted(map(tuple, again)) == sorted(map(tuple, want))
    # a different corpus under the same path must rebuild
    half = docs.filter(F.col("doc_id") % 2 == 0)
    rebuilt = pairs_store.near_dup_pairs_ensure(half, path).collect()
    with open(meta) as f:
        fp2 = json.load(f)["fingerprint"]
    assert fp2 != fp1
    want_half = dedup.dedup_ngram_jaccard(half).collect()
    assert sorted(map(tuple, rebuilt)) == sorted(map(tuple, want_half))


def test_threepass_recovers_reorder_only_pair(spark):
    """r10 token-sort pass: construct a near-dup pair whose only edit
    is a pure REORDER touching BOTH text ends — the prefix sort AND
    the suffix sort each scatter the two docs apart, but their sorted
    token strings are identical, so the token pass lands them
    adjacent. The two-pass variant must miss it; the three-pass must
    find it (and remain a superset)."""
    mid = " ".join(f"common{j}" for j in range(30))
    texts = [
        f"aaa bbb {mid} ccc ddd",
        f"ddd ccc {mid} bbb aaa",  # edges swapped: same token multiset
    ]
    # fillers that sort BETWEEN the pair in BOTH orders: first token
    # b{i}... (prefix key between "aaa" and "ddd") and last token
    # ...q{i}c (reversed key "c{i}q..." between "aaa" and "ddd" too);
    # 6 > window=4 of them, each with unique interior vocabulary so
    # none verifies as a near-dup of anything
    for i in range(6):
        body = " ".join(f"f{i}mid{j}" for j in range(23))
        texts.append(f"b{i}start {body} q{i}c")
    docs = _docs(spark, texts)
    two = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.dedup_sorted_neighborhood_multipass(docs).collect()
    }
    three = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.dedup_sorted_neighborhood_multipass(
            docs, keys=("prefix", "suffix", "tokens")
        ).collect()
    }
    assert (0, 1) not in two, "prefix+suffix passes should both miss it"
    assert (0, 1) in three, "token pass should recover it"
    assert two <= three


def test_agreement_report_from_artifacts_matches_live(spark, sf_dir, tmp_path):
    """r10: the agreement report served from the two persisted pair
    artifacts must return EXACTLY the live-generator rows (the store
    contract: the artifact is the operator's output), the setsim
    artifact must itself match its live generator and rebuild on
    corpus change (staleness fallback), and the stale path — passing
    no artifacts — must agree too."""
    from kinesis_dstream_spark.operators import pairs_store

    docs = load_table(spark, sf_dir, "documents")
    ng = pairs_store.near_dup_pairs_ensure(docs, str(tmp_path / "ng"))
    ss = pairs_store.setsim_pairs_ensure(docs, str(tmp_path / "ss"))
    assert sorted(map(tuple, ss.collect())) == sorted(
        map(tuple, dedup.dedup_setsim_prefix(docs).collect())
    )
    served = dedup.near_dup_generator_agreement(
        docs, ngram_pairs=ng, setsim_pairs=ss
    ).collect()
    live = dedup.near_dup_generator_agreement(docs).collect()
    assert sorted(map(tuple, served)) == sorted(map(tuple, live))
    # staleness: a different corpus under the same path rebuilds
    half = docs.filter(F.col("doc_id") % 2 == 0)
    rebuilt = pairs_store.setsim_pairs_ensure(half, str(tmp_path / "ss"))
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, dedup.dedup_setsim_prefix(half).collect())
    )


def test_setsim_prefix_matches_bruteforce_and_shrinks_index(spark, sf_dir):
    """The prefix filter must lose NO qualifying pair (AllPairs lemma)
    and the index it joins must be a strict subset of the full
    inverted index — the point of the strategy."""
    docs = load_table(spark, sf_dir, "documents")
    got = sorted(map(tuple, dedup.dedup_setsim_prefix(docs).collect()))

    # brute-force twin: full inverted index, no prefix, same semantics
    ex = dedup._shingle_sets(docs, 3).select(
        "doc_id", F.explode("shingles").alias("shingle")
    )
    sz = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = ex.alias("a")
    b = ex.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    want = sorted(
        (
            r["doc_a"],
            r["doc_b"],
            r["n_a"],
            r["n_b"],
            r["n_inter"],
            r["n_inter"] * 1000000 // (r["n_a"] + r["n_b"] - r["n_inter"]),
        )
        for r in inter.join(
            sz.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("n_a")),
            "doc_a",
        )
        .join(
            sz.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("n_b")),
            "doc_b",
        )
        .collect()
        if 5 * r["n_inter"] >= 3 * (r["n_a"] + r["n_b"] - r["n_inter"])
    )
    assert got == want
    assert len(got) > 0

    # the prefix index holds ~(1-t) of rows: assert a real reduction
    from pyspark.sql import Window

    wdoc = Window.partitionBy("doc_id")
    dfreq = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        ex.join(dfreq, "shingle")
        .withColumn("sz", F.count(F.lit(1)).over(wdoc))
        .withColumn("pos", F.row_number().over(wdoc.orderBy("df", "shingle")))
    )
    plen = F.col("sz") - F.expr("(3 * sz + 4) div 5") + F.lit(1)
    n_full = ex.count()
    n_prefix = ranked.filter(F.col("pos") <= plen).count()
    assert n_prefix < 0.55 * n_full


def test_global_rank_matches_single_partition_window(spark, sf_dir):
    """The 2-pass range-partitioned rank must equal the plain global
    window's row_number for every row (rank = position in the total
    order, invariant to range boundaries)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.lower(
            F.substring(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")), 1, 24)
        ).alias("bk"),
    )
    got = {
        r["doc_id"]: r["r"]
        for r in dedup._global_rank(keyed, ["bk", "doc_id"], "r").collect()
    }
    want = {
        r["doc_id"]: r["r"]
        for r in keyed.withColumn(
            "r", F.row_number().over(Window.orderBy("bk", "doc_id"))
        ).collect()
    }
    assert got == want
    # and the ranked plan must not contain a single-partition global sort
    plan = (
        dedup._global_rank(keyed, ["bk", "doc_id"], "r")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan


def test_sorted_neighborhood_candidates_are_linear(spark, sf_dir):
    """w·n − w(w+1)/2 candidate pairs exactly — the linear-candidate
    guarantee that makes the method viable at corpus scale — and every
    emitted pair must clear the Jaccard threshold."""
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    w = 4
    keyed = docs.select(
        "doc_id",
        F.lower(
            F.substring(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")), 1, 24)
        ).alias("bk"),
    )
    ranked = dedup._global_rank(keyed, ["bk", "doc_id"], "r").select("doc_id", "r")
    js = spark.range(1, w + 1).select(F.col("id").alias("j"))
    probes = ranked.crossJoin(F.broadcast(js)).select(
        F.col("doc_id").alias("id_a"), (F.col("r") + F.col("j")).alias("r2")
    )
    n_cand = probes.join(
        ranked.select(F.col("doc_id").alias("id_b"), F.col("r").alias("r2")), "r2"
    ).count()
    assert n_cand == w * n - w * (w + 1) // 2

    out = dedup.dedup_sorted_neighborhood(docs).collect()
    assert len(out) > 0
    for r in out:
        assert 5 * r["n_inter"] >= 3 * (r["n_a"] + r["n_b"] - r["n_inter"])
        assert r["doc_a"] < r["doc_b"]


def test_generator_agreement_regions(spark, sf_dir):
    """On the fixture all three generators agree (one full-agreement
    region — itself the finding); on a constructed corpus where the
    duplicate pair's edit is IN the blocking prefix and 10 filler docs
    separate them in sort order, sorted-neighborhood must miss the
    pair while both index strategies find it."""
    from kinesis_dstream_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = dedup.near_dup_generator_agreement(docs).collect()
    total = sum(r["n_pairs"] for r in rows)
    full_agree = sum(
        r["n_pairs"] for r in rows
        if (r["in_ngram"], r["in_setsim"], r["in_nbhd"]) == (1, 1, 1)
    )
    assert total > 0 and full_agree > 0

    body = " ".join(f"tok{i}" for i in range(40))
    texts = [f"aaa start {body}", f"zzz start {body}"]
    texts += [f"mid{c} filler words {i} " + " ".join(f"x{i}y{j}" for j in range(30))
              for i, c in enumerate("bcdefghijk")]
    synth = _docs(spark, texts)
    regions = {
        (r["in_ngram"], r["in_setsim"], r["in_nbhd"]): r["n_pairs"]
        for r in dedup.near_dup_generator_agreement(synth).collect()
    }
    assert regions.get((1, 1, 0), 0) >= 1, regions


def test_setsim_positional_filter_shrinks_candidates(spark, sf_dir):
    """The PPJoin positional filter must strictly reduce candidate
    pairs vs length-filter-only (on a corpus with partial-overlap
    docs) while the final output is proven identical by the oracle
    gate. Constructed corpus: doc pairs sharing a short common block
    inside otherwise-distinct text — prefix tokens collide, but the
    positional bound proves the overlap can't reach t."""
    from pyspark.sql import Window

    # pair-shared blocks are df=2 (rarer than nothing but the df=1
    # doc-unique shingles, so they sort AFTER the uniques); sizes are
    # tuned into the 1.5u < s < 3u region where the shared block IS in
    # the prefix (collision) yet J < t — exactly the candidates the
    # positional bound provably kills (8·bound ≥ 3·(na+nb) fails)
    texts = []
    for i in range(6):
        shared = " ".join(f"s{i}c{j}" for j in range(22))
        for d in range(2):
            mine = " ".join(f"p{i}d{d}u{j}" for j in range(12))
            texts.append(f"{mine} {shared}")
    docs = _docs(spark, texts)

    ex = dedup._shingle_sets(docs, 3).select(
        "doc_id", F.explode("shingles").alias("shingle")
    )
    dfreq = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    wdoc = Window.partitionBy("doc_id")
    ranked = (
        ex.join(dfreq, "shingle")
        .withColumn("sz", F.count(F.lit(1)).over(wdoc))
        .withColumn("pos", F.row_number().over(wdoc.orderBy("df", "shingle")))
    )
    plen = F.col("sz") - F.expr("(3 * sz + 4) div 5") + F.lit(1)
    prefix = ranked.filter(F.col("pos") <= plen).select(
        "doc_id", "shingle", "sz", "pos"
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    length_ok = (
        (F.col("a.shingle") == F.col("b.shingle"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & (5 * F.least(F.col("a.sz"), F.col("b.sz"))
           >= 3 * F.greatest(F.col("a.sz"), F.col("b.sz")))
    )
    without_pos = (
        a.join(b, length_ok)
        .select(F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y"))
        .distinct()
        .count()
    )
    bound = F.lit(1) + F.least(
        F.col("a.sz") - F.col("a.pos"), F.col("b.sz") - F.col("b.pos")
    )
    with_pos = (
        a.join(b, length_ok & (8 * bound >= 3 * (F.col("a.sz") + F.col("b.sz"))))
        .select(F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y"))
        .distinct()
        .count()
    )
    assert with_pos < without_pos, (with_pos, without_pos)
    # and no qualifying pair is lost: the full operator on this corpus
    # equals the brute-force threshold set
    got = {
        (r["doc_a"], r["doc_b"]) for r in dedup.dedup_setsim_prefix(docs).collect()
    }
    sz = {r["doc_id"]: r["sz"] for r in
          ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz")).collect()}
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y"))
    )
    # brute intersection over FULL sets (not prefixes)
    ea = ex.select(F.col("doc_id").alias("x"), "shingle")
    eb = ex.select(F.col("doc_id").alias("y"), "shingle")
    full_inter = (
        ea.join(eb, "shingle").where(F.col("x") < F.col("y"))
        .groupBy("x", "y").agg(F.count(F.lit(1)).alias("ni"))
        .collect()
    )
    want = {
        (r["x"], r["y"]) for r in full_inter
        if 5 * r["ni"] >= 3 * (sz[r["x"]] + sz[r["y"]] - r["ni"])
    }
    assert got == want


def test_global_rank_is_permutation_across_jobs(spark):
    """r9 regression (ADVICE high): repartitionByRange re-samples its
    range boundaries per JOB, so an unpinned _global_rank could hand
    the offsets job and each consuming job DIFFERENT partitionings —
    duplicated/skipped ranks (6644 duplicate ranks reproduced at 200k
    rows pre-fix). The localCheckpoint pin makes every consumer read
    the one materialized partitioning; assert a perfect 1..n
    permutation across two separate consuming jobs at a scale where
    the boundary sample is non-exhaustive."""
    n = 200_000
    base = spark.range(n).select(
        ((F.col("id") * 2654435761) % 1000003).alias("key"),
        F.col("id").alias("uid"),
    )
    ranked = dedup._global_rank(base, ["key", "uid"], "r")
    for _ in range(2):  # two jobs: the bug was per-job divergence
        agg = ranked.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("r").alias("d"),
            F.min("r").alias("lo"),
            F.max("r").alias("hi"),
        ).collect()[0]
        assert (agg["n"], agg["d"], agg["lo"], agg["hi"]) == (n, n, 1, n)


def test_suffix_blocking_key_engine_identical_on_unicode(spark):
    """r9-ADVICE: Spark reverses strings by codepoint, DuckDB by
    grapheme cluster, so a raw reversed-text key diverges on combining
    sequences. The r10 key reverses the printable-ASCII projection
    only — this test feeds combining marks, CJK, and emoji through
    BOTH engines' key expressions and demands byte equality."""
    import duckdb

    from kinesis_dstream_spark.operators.dedup import _nbhd_key_suffix
    from kinesis_dstream_spark.registry import _nbhd_key_sql

    texts = [
        "café latte menu pricing sheet",   # e + combining acute
        "smol tests é́́ stacked marks end",
        "mixed 你好 world ascii tail here",
        "emoji \U0001f600\U0001f3fd flag tail words",
        "plain ascii only text stays intact",
        "",
    ]
    docs = spark.createDataFrame(
        [(i, t, "xx", "src", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got_spark = {
        r["doc_id"]: r["bk"]
        for r in docs.select("doc_id", _nbhd_key_suffix(24).alias("bk")).collect()
    }
    con = duckdb.connect()
    con.register("documents", __import__("pandas").DataFrame(
        {"doc_id": range(len(texts)), "text": texts}
    ))
    got_duck = dict(
        con.execute(
            f"SELECT doc_id, {_nbhd_key_sql(24, suffix=True)} AS bk FROM documents"
        ).fetchall()
    )
    assert got_spark == got_duck


def test_multipass_recovers_suffix_only_pair(spark):
    """r9 multipass ER: construct a near-dup pair whose ONLY edit is
    inside the 24-char prefix blocking key — in the prefix sort the
    two docs are separated by > window filler docs, so the single
    (prefix) pass misses them; their suffixes are identical, so the
    suffix pass sorts them adjacent and the multipass union finds
    them. The 4-generator agreement report must count the pair in a
    region with in_nbhd=0, in_nbhd_sfx=1."""
    tail = " ".join(f"common{j}" for j in range(30))
    texts = [f"aaaaaa edit one {tail}", f"zzzzzz edit two {tail}"]
    # 6 fillers (> window=4) sorting strictly between 'aaaaaa' and
    # 'zzzzzz' in prefix order, each with a unique vocabulary so no
    # filler verifies as a near-dup of anything
    for i in range(6):
        texts.append(" ".join(f"m{i}tok{j}" for j in range(25)))
    docs = _docs(spark, texts)

    single = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.dedup_sorted_neighborhood(docs).collect()
    }
    multi = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.dedup_sorted_neighborhood_multipass(docs).collect()
    }
    assert (0, 1) not in single, "prefix pass should miss the pair"
    assert (0, 1) in multi, "suffix pass should recover it"
    assert single <= multi, "multipass must be a superset of pass 1"

    regions = {
        (r["in_ngram"], r["in_setsim"], r["in_nbhd"], r["in_nbhd_sfx"]): r["n_pairs"]
        for r in dedup.near_dup_generator_agreement(docs).collect()
    }
    assert any(k[2] == 0 and k[3] == 1 and n >= 1 for k, n in regions.items()), regions


def test_setsim_cap_bounds_degenerate_corpus(spark):
    """r9 circuit breaker: 100 near-identical docs concentrate every
    prefix-index key at df≈100 — the uncapped candidate stage would be
    ~n²/2 pairs. With max_key_rows the prefix index drops hot keys
    BEFORE the self-join (bounded per-key work), emitted pairs stay
    verified-exact (subset of the uncapped output), and the cap-stats
    report flags the trip. On a benign corpus the cap is inert."""
    # 100 near-identical docs: 30 shared tokens + 1 unique token each
    base = " ".join(f"w{j}" for j in range(30))
    degenerate = _docs(spark, [f"{base} u{i}" for i in range(100)])

    stats = dedup.setsim_prefix_cap_stats(degenerate, max_key_rows=8).collect()[0]
    assert stats["n_hot_keys"] > 0 and stats["n_dropped_rows"] > 0
    assert stats["n_prefix_rows"] >= stats["n_dropped_rows"]

    # per-key candidate generation is bounded by the cap: rebuild the
    # capped prefix index and check the max per-key row count
    ex = dedup._shingle_sets(degenerate, 3).select(
        "doc_id", F.explode("shingles").alias("shingle")
    )
    prefix = dedup._setsim_prefix_index(ex, 3, 5)
    key_rows = prefix.groupBy("shingle").agg(F.count(F.lit(1)).alias("n"))
    capped_max = (
        prefix.join(key_rows.filter(F.col("n") <= 8), "shingle")
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n"))
        .collect()[0][0]
    )
    assert capped_max is None or capped_max <= 8

    capped = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.dedup_setsim_prefix(degenerate, max_key_rows=8).collect()
    }
    full = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.dedup_setsim_prefix(degenerate).collect()
    }
    assert capped <= full  # never a false positive — verify is exact

    # benign corpus: generous cap changes nothing (oracle-path parity)
    benign = _docs(
        spark,
        [" ".join(f"d{i}t{j}" for j in range(20)) for i in range(10)]
        + [" ".join(f"d0t{j}" for j in range(20)) + " extra"],
    )
    a = sorted(map(tuple, dedup.dedup_setsim_prefix(benign).collect()))
    b = sorted(
        map(tuple, dedup.dedup_setsim_prefix(benign, max_key_rows=64).collect())
    )
    assert a == b and len(a) >= 1


def test_sorted_nbhd_accounting_formula_matches_actual_pairs(spark, sf_dir):
    """The accounting query's closed-form n_candidates must equal the
    ACTUAL pair count the neighborhood join emits (the skew-
    independence proof: rank-window candidates are a function of n
    alone), and the missed-pair shortfall must be zero exactly when no
    identical-key block exceeds window+1."""
    from kinesis_dstream_spark.operators import dedup
    from kinesis_dstream_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    acct = {r["kind"]: r for r in
            dedup.sorted_neighborhood_accounting(docs).collect()}
    for kind, key_fn in (
        ("prefix", dedup._nbhd_key_prefix),
        ("tokens", dedup._nbhd_key_tokens),
    ):
        actual = dedup._nbhd_candidate_pairs(docs, key_fn(24), 4).count()
        assert acct[kind]["n_candidates"] == actual, kind
        if acct[kind]["max_block"] <= 5:  # window + 1
            assert acct[kind]["missed_intra_pairs"] == 0


def test_sorted_nbhd_accounting_degenerate_corpus(spark):
    """Adversarial: 200 docs sharing ONE token multiset (the near-
    duplicate-heavy degenerate case the r10 verdict flagged). The
    token-key pass must still emit exactly w·n − w(w+1)/2 candidates —
    NOT C(200,2) — while the accounting reports the recall shortfall."""
    from kinesis_dstream_spark.operators import dedup

    n, w = 200, 4
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta", "en", "src", 23) for i in range(n)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    acct = {r["kind"]: r for r in
            dedup.sorted_neighborhood_accounting(docs).collect()}
    tok = acct["tokens"]
    assert tok["max_block"] == n
    expected = w * n - w * (w + 1) // 2
    assert tok["n_candidates"] == expected
    actual = dedup._nbhd_candidate_pairs(
        docs, dedup._nbhd_key_tokens(24), w
    ).count()
    assert actual == expected
    # recall shortfall: C(n,2) intra-block pairs minus the generated
    assert tok["missed_intra_pairs"] == n * (n - 1) // 2 - expected
