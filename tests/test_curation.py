"""Semantics + plan-shape tests for operators/curation.py.

Oracle parity (value hashes vs DuckDB) is covered by
test_oracle_parity.py; these tests pin the *behavioral* claims — scores
rank the right documents, flags fire on the right patterns, the
benchmark side is broadcast — on small constructed inputs where the
expected answer is obvious by eye.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kinesis_dstream_spark.operators import curation
from kinesis_dstream_spark.tables import load_table


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_unigram_logprob_ranks_common_above_rare(spark):
    # 'the the the' is all high-frequency mass; 'zyx qwv' is all OOV-floor.
    rows = [(i, "the cat sat", "s") for i in range(20)]
    rows += [(100, "the the the", "s"), (101, "zyxq qwvk", "s")]
    out = {
        r["doc_id"]: r["avg_logprob"]
        for r in curation.unigram_logprob_score(_docs(spark, rows), vocab_size=3).collect()
    }
    assert out[100] > out[101]  # common words = higher mean log-prob
    # every doc scored, n_tokens right
    assert len(out) == 22


def test_unigram_logprob_oov_floor_matches_count_one(spark):
    # A word seen once and an OOV word (outside vocab) score identically:
    # both are count-1 events under the floor.
    rows = [(0, "common common common common", "s"), (1, "common rare", "s")]
    df = curation.unigram_logprob_score(_docs(spark, rows), vocab_size=1)
    row = {r["doc_id"]: r for r in df.collect()}
    # doc 1: 'common' in vocab, 'rare' OOV -> floor ln(1/6); by symmetry a
    # vocab_size=2 run where 'rare' IS in vocab (cnt=1) gives the same lp.
    df2 = curation.unigram_logprob_score(_docs(spark, rows), vocab_size=2)
    row2 = {r["doc_id"]: r for r in df2.collect()}
    assert row[1]["avg_logprob"] == row2[1]["avg_logprob"]


def test_unigram_logprob_no_global_window(spark):
    # vocab cut must be distributed top-K, not a single-partition window
    rows = [(i, "a b c", "s") for i in range(5)]
    plan = _plan(curation.unigram_logprob_score(_docs(spark, rows)))
    assert "Window" not in plan
    assert "TakeOrderedAndProject" in plan


def test_repetition_flags_loops_not_prose(spark):
    rows = [
        (0, "buy now buy now buy now buy now", "s"),  # looping boilerplate
        (1, "the quick brown fox jumps over a lazy dog", "s"),  # prose
    ]
    out = {r["doc_id"]: r for r in curation.repetition_stats(_docs(spark, rows)).collect()}
    assert out[0]["repetitive"] and not out[1]["repetitive"]
    assert out[0]["top_bigram_frac"] > 0.4  # 'buy now' dominates
    assert out[1]["dup_word_frac"] == 0.0


def test_repetition_single_token_doc_defined(spark):
    out = curation.repetition_stats(_docs(spark, [(0, "word", "s")])).collect()[0]
    assert out["n_tokens"] == 1 and out["top_word_frac"] == 1.0


def test_contamination_finds_shared_shingles_only(spark):
    bench = "alpha beta gamma delta epsilon zeta"
    rows = [
        (0, bench, "src0"),  # the benchmark doc
        (1, "intro alpha beta gamma delta epsilon outro", "src1"),  # contains a 5-gram
        (2, "totally different words here entirely unrelated", "src1"),  # clean
    ]
    out = curation.contamination_check(_docs(spark, rows))
    got = {r["doc_id"]: r for r in out.collect()}
    assert 1 in got and 2 not in got and 0 not in got
    assert got[1]["n_overlap"] >= 1


def test_contamination_broadcasts_benchmark_side(spark):
    # The SHINGLE join must broadcast the benchmark set (the corpus is
    # never shuffled on shingle keys). The final overlap↔count join on
    # doc_id is left to AQE: its small side is data-dependent
    # (contaminated-doc count), so a static broadcast hint would be a
    # 100 TB OOM bet — the static plan may show a sort-merge there.
    rows = [(i, f"w{i} x y z q r s", "src0" if i % 2 else "src1") for i in range(10)]
    plan = _plan(curation.contamination_check(_docs(spark, rows)))
    assert "BroadcastHashJoin" in plan  # the shingle join (explicit hint)
    assert "CartesianProduct" not in plan


def test_grouped_sample_is_uniform_per_group_and_stable(spark):
    rows = [(i, "text", f"s{i % 3}") for i in range(300)]
    out = curation.grouped_sample(_docs(spark, rows), n_per_group=10).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    assert set(by_src) == {"s0", "s1", "s2"}
    assert all(len(v) == 10 for v in by_src.values())
    # stable across input order
    out2 = curation.grouped_sample(_docs(spark, rows[::-1]), n_per_group=10).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_domain_mix_is_md5_deterministic(spark):
    rows = [(i, "text", "src%d" % (i % 2)) for i in range(200)]
    out = {
        r["source"]: r
        for r in curation.domain_mix_sample(
            _docs(spark, rows), rates={"src0": 100, "src1": 0}
        ).collect()
    }
    assert out["src0"]["n_kept"] == out["src0"]["n_docs"]  # rate 100 keeps all
    assert out["src1"]["n_kept"] == 0  # rate 0 keeps none

    # realized counts reproducible outside Spark (the whole point)
    def bucket(doc_id: int) -> int:
        return int(hashlib.md5(f"mix:{doc_id}".encode()).hexdigest()[:8], 16) % 100

    expect = sum(1 for i in range(0, 200, 2) if bucket(i) < 100)
    assert out["src0"]["n_kept"] == expect


def test_pack_sequences_conserves_tokens_and_respects_offsets(spark):
    # 10 docs of 4 tokens each, one shard, budget 16 -> bins of exactly
    # 4 docs / 16 tokens until the tail.
    rows = [(i, "a b c d", "s") for i in range(10)]
    out = curation.pack_sequences(_docs(spark, rows), budget_tokens=16, n_shards=1).collect()
    assert sum(r["n_tokens"] for r in out) == 40  # token conservation
    by_bin = {r["bin_id"]: r for r in out}
    assert by_bin[0]["n_docs"] == 4 and by_bin[0]["fill_ratio"] == 1.0
    assert by_bin[2]["n_docs"] == 2  # tail bin half-full
    assert by_bin[2]["fill_ratio"] == 0.5


def test_pack_sequences_shards_are_stable(spark):
    # same doc_ids -> same shard/bin assignment regardless of row order
    rows = [(i, "w " * (i % 5 + 1), "s") for i in range(50)]
    a = sorted(map(tuple, curation.pack_sequences(_docs(spark, rows)).collect()))
    b = sorted(map(tuple, curation.pack_sequences(_docs(spark, rows[::-1])).collect()))
    assert a == b


def test_domain_mix_default_rates_cover_unknown_sources(spark):
    rows = [(i, "text", "mystery") for i in range(100)]
    out = curation.domain_mix_sample(_docs(spark, rows)).collect()[0]
    assert out["target_pct"] == curation.DEFAULT_MIX_RATE
    assert 0 <= out["n_kept"] <= 100


def test_quality_classifier_separates_sources(spark, sf_dir):
    """Trained on source labels, the classifier must score the positive
    source above every other source on average, and be deterministic."""
    from kinesis_dstream_spark.operators import curation
    from kinesis_dstream_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = {r.source: r.avg_quality_prob for r in curation.quality_classifier_scores(docs).collect()}
    b = {r.source: r.avg_quality_prob for r in curation.quality_classifier_scores(docs).collect()}
    assert a == b  # seeded fit + stable hash => identical scores
    pos = a.pop("src0")
    # fixture sources share most vocabulary, so per-source ranking can
    # tie — but the positive source must sit above the negative mean
    # (clean separation is pinned on the synthetic corpus below)
    assert pos > sum(a.values()) / len(a), (pos, a)


def test_quality_classifier_synthetic_separation(spark):
    """On a synthetic corpus with disjoint vocabularies the classifier
    must separate cleanly (avg positive prob > 0.9 > avg negative)."""
    from kinesis_dstream_spark.operators import curation

    rows = [(i, "good clean prose " * 5, "en", "src0") for i in range(30)]
    rows += [(100 + i, "spam junk garbage " * 5, "en", "srcX") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id int, text string, lang string, source string")
    got = {r.source: r.avg_quality_prob for r in curation.quality_classifier_scores(docs).collect()}
    assert got["src0"] > 0.9
    assert got["srcX"] < 0.1


def test_materialize_corpus_partition_layout(spark, sf_dir, tmp_path):
    """The written table must be physically partitioned by split/lang
    (so training reads partition-prune) and hold every document."""
    import os

    from kinesis_dstream_spark.operators import curation
    from kinesis_dstream_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "corpus")
    manifest = curation.materialize_corpus(docs, out).collect()
    assert sum(r.n_docs for r in manifest) == docs.count()
    splits = {e for e in os.listdir(out) if e.startswith("split=")}
    assert splits == {"split=train", "split=val", "split=test"}
    assert any(e.startswith("lang=") for e in os.listdir(out + "/split=train"))
    # partition pruning on the read-back path
    df = spark.read.parquet(out).filter(
        (F.col("split") == "train") & (F.col("lang") == "en")
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    # re-materializing is stable: same manifest
    again = curation.materialize_corpus(docs, out).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, manifest))


class TestEmbeddingContamination:
    def _ground_truth(self, spark, sf_dir, threshold=0.3):
        import numpy as np

        pdf = load_table(spark, sf_dir, "embeddings").toPandas()
        x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        x = x / np.linalg.norm(x, axis=1, keepdims=True)
        ids = pdf["vec_id"].to_numpy()
        is_b = ids % 10 == 0
        cos = np.round(x[~is_b] @ x[is_b].T, 4)
        bench_ids = ids[is_b]
        out = {}
        for i, vid in enumerate(ids[~is_b]):
            best = None
            for j, bid in enumerate(bench_ids):
                if cos[i, j] >= threshold:
                    key = (cos[i, j], -bid)
                    if best is None or key > best[0]:
                        best = (key, bid, cos[i, j])
            if best is not None:
                out[int(vid)] = (int(best[1]), float(best[2]))
        return out

    def test_exact_vs_bruteforce(self, spark, sf_dir):
        from kinesis_dstream_spark.operators import curation as C

        emb = load_table(spark, sf_dir, "embeddings")
        got = {
            r["vec_id"]: (r["bench_id"], r["cos_sim"])
            for r in C.embedding_contamination(emb, threshold=0.3).collect()
        }
        assert got == self._ground_truth(spark, sf_dir, 0.3)

    def test_bench_cap_guard(self, spark, sf_dir):
        import pytest as _pytest

        from kinesis_dstream_spark.operators import curation as C

        emb = load_table(spark, sf_dir, "embeddings")
        with _pytest.raises(ValueError, match="bench_cap"):
            C.embedding_contamination(emb, bench_cap=3)

    def test_plan_is_shuffle_free(self, spark, sf_dir):
        """The corpus side must be ONE narrow mapInPandas pass: no join,
        no aggregation, no Exchange anywhere in the plan."""
        from kinesis_dstream_spark.operators import curation as C

        emb = load_table(spark, sf_dir, "embeddings")
        plan = C.embedding_contamination(emb)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "CartesianProduct" not in plan


def test_curriculum_stages_are_balanced_and_ordered(spark, sf_dir):
    """ntile staging must conserve the corpus, keep stage sizes within
    1 of each other, and produce non-overlapping quality ranges in
    stage order — the properties a curriculum scheduler relies on."""
    from kinesis_dstream_spark.operators.curation import curriculum_assignment
    from kinesis_dstream_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = curriculum_assignment(docs).collect()
    n_total = docs.count()
    assert sum(r.n_docs for r in rows) == n_total
    by_stage = {}
    for r in rows:
        s = by_stage.setdefault(r.stage, {"n": 0, "lo": 1e9, "hi": -1e9})
        s["n"] += r.n_docs
        s["lo"] = min(s["lo"], r.min_quality)
        s["hi"] = max(s["hi"], r.max_quality)
    sizes = [by_stage[s]["n"] for s in sorted(by_stage)]
    assert len(sizes) == 4 and max(sizes) - min(sizes) <= 1
    for a, b in zip(sorted(by_stage), sorted(by_stage)[1:]):
        assert by_stage[a]["hi"] <= by_stage[b]["lo"] + 1e-9
    assert {r.len_bucket for r in rows} <= {"short", "medium", "long"}


def test_temperature_mix_quotas_apportionment(spark, sf_dir):
    """Hamilton-apportionment law: quotas sum to EXACTLY the total;
    every quota within 1 of its real-valued share; the temperature
    boosts tail languages (oversample > 1 iff share below uniform-ish
    crossover) and quotas follow counts monotonically."""
    from kinesis_dstream_spark.operators.curation import temperature_mix_quotas
    from kinesis_dstream_spark.tables import load_table

    rows = temperature_mix_quotas(load_table(spark, sf_dir, "documents")).collect()
    total = 10_000
    assert sum(r.quota for r in rows) == total
    import math

    s = {r.lang: math.sqrt(r.n_docs) for r in rows}
    S = sum(s.values())
    for r in rows:
        ideal = total * s[r.lang] / S
        assert abs(r.quota - ideal) < 1.0 + 1e-9  # within one seat
    by_count = sorted(rows, key=lambda r: r.n_docs)
    quotas = [r.quota for r in by_count]
    assert quotas == sorted(quotas)  # monotone in counts
    # temperature flattens: smallest lang over-sampled vs raw share,
    # largest under-sampled (strict when counts differ)
    if by_count[0].n_docs < by_count[-1].n_docs:
        assert by_count[0].oversample_factor > 1.0
        assert by_count[-1].oversample_factor < 1.0


def test_curriculum_kmv_stage_sizes_near_exact_quartiles(spark, sf_dir):
    """r6 task 2: the KMV-boundary curriculum must land each stage
    within the sketch's sampling error of the exact ntile quartiles.
    With k = 256, the DKW envelope on the sample CDF is
    sqrt(ln(2/delta)/(2k)) ~ 0.085 at delta = 0.05; the fixture is a
    fixed draw, so we pin a 10% tolerance with margin."""
    from kinesis_dstream_spark.operators import curation

    docs = load_table(spark, sf_dir, "documents")
    exact = {
        r["stage"]: r["n"]
        for r in curation.curriculum_assignment(docs)
        .groupBy("stage")
        .agg(F.sum("n_docs").alias("n"))
        .collect()
    }
    kmv = {
        r["stage"]: r["n"]
        for r in curation.curriculum_assignment_kmv(docs)
        .groupBy("stage")
        .agg(F.sum("n_docs").alias("n"))
        .collect()
    }
    n = sum(exact.values())
    assert n == sum(kmv.values())  # a partition, not a sample, of the corpus
    assert set(kmv) == {1, 2, 3, 4}
    for stage in exact:
        assert abs(kmv.get(stage, 0) - exact[stage]) <= 0.10 * n, (
            stage,
            kmv,
            exact,
        )


def test_stratified_sample_quota_size_and_determinism(spark, sf_dir):
    from kinesis_dstream_spark.operators import curation

    docs = load_table(spark, sf_dir, "documents")
    out1 = {r["lang"]: r for r in curation.stratified_sample_quota(docs).collect()}
    out2 = {r["lang"]: r for r in curation.stratified_sample_quota(docs).collect()}
    assert out1.keys() == out2.keys() and len(out1) > 1
    for lang, r in out1.items():
        assert r["n_sampled"] == min(50, r["n_docs"])
        # deterministic: identical membership fingerprints across runs
        assert r["sum_sampled_ids"] == out2[lang]["sum_sampled_ids"]
        assert r["max_rank"] == out2[lang]["max_rank"]


def test_systematic_sample_even_spread(spark, sf_dir):
    """Every k-th rank exactly; ranks 1, 1+k, 1+2k, ...; the sample's
    length distribution must straddle the corpus (min-side and
    max-side representation — the property hash sampling lacks)."""
    from kinesis_dstream_spark.operators import curation as C
    from kinesis_dstream_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    out = sorted(r["rk"] for r in C.systematic_sample(docs).collect())
    assert out == list(range(1, n + 1, 25))
    chars = [r["n_chars"] for r in C.systematic_sample(docs).collect()]
    lo, hi = docs.agg(F.min("n_chars"), F.max("n_chars")).collect()[0]
    span = hi - lo
    assert min(chars) <= lo + span // 10
    assert max(chars) >= hi - span // 10


def test_mixture_budget_solve_regimes(spark):
    """The three solve regimes on a constructed corpus: downsample
    (oversupplied source → keep-rate < 1e6, zero deficit), repeat
    (undersupplied → epochs > 1e6, keep-rate capped at 1e6, positive
    deficit), and missing (target source absent from the corpus →
    zero supply, NULL epochs, full deficit)."""
    from kinesis_dstream_spark.operators import curation

    # srcA: 10 docs x 10 tokens = 100 tokens; srcB: 1 doc x 5 tokens
    rows = [(i, " ".join(f"a{i}t{j}" for j in range(10)), "en", "srcA", 60)
            for i in range(10)]
    rows.append((100, "b0 b1 b2 b3 b4", "en", "srcB", 14))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {
        r["source"]: r
        for r in curation.mixture_budget_solve(
            docs,
            budget_tokens=100,
            target_ppm={"srcA": 500000, "srcB": 300000, "srcC": 200000},
        ).collect()
    }
    a, b, c = got["srcA"], got["srcB"], got["srcC"]
    # srcA: needs 50 of 100 -> keep half, no deficit
    assert (a["tokens_available"], a["tokens_needed"]) == (100, 50)
    assert a["keep_rate_ppm"] == 500000 and a["epochs_ppm"] == 500000
    assert a["deficit_tokens"] == 0
    # srcB: needs 30 of 5 -> 6 epochs, keep-rate capped, deficit 25
    assert (b["tokens_available"], b["tokens_needed"]) == (5, 30)
    assert b["keep_rate_ppm"] == 1000000 and b["epochs_ppm"] == 6000000
    assert b["deficit_tokens"] == 25
    # srcC: absent -> zero supply, NULL rates, full deficit
    assert (c["tokens_available"], c["tokens_needed"]) == (0, 20)
    assert c["keep_rate_ppm"] is None and c["epochs_ppm"] is None
    assert c["deficit_tokens"] == 20


def test_mixture_budget_solve_trillion_token_budget(spark):
    """The r9-ADVICE overflow class: a quadrillion-token budget must
    neither throw (Spark ANSI int64 overflow) nor wrap — the
    quotient/remainder decomposition keeps every intermediate in
    int64. Expected values computed with Python bignum arithmetic:
    needed = budget·w div 1e6 exactly, epochs = needed·1e6 div avail
    exactly."""
    from kinesis_dstream_spark.operators import curation

    rows = [(i, " ".join(f"a{i}t{j}" for j in range(10)), "en", "srcA", 60)
            for i in range(10)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    budget = 5_000_000_000_000_000  # 5e15 — 500x past the naive bound
    got = {
        r["source"]: r
        for r in curation.mixture_budget_solve(
            docs, budget_tokens=budget, target_ppm={"srcA": 600_000}
        ).collect()
    }["srcA"]
    needed = budget * 600_000 // 1_000_000
    assert got["tokens_needed"] == needed
    # true epochs (3e19 ppm) exceeds int64 -> the documented saturation
    assert needed * 1_000_000 // 100 > curation._EPOCHS_PPM_SAT
    assert got["epochs_ppm"] == curation._EPOCHS_PPM_SAT
    assert got["keep_rate_ppm"] == 1_000_000
    assert got["deficit_tokens"] == needed - 100


def test_mixture_budget_solve_identity_vs_naive_in_safe_range(spark):
    """In the pre-r10 safe range the decomposed arithmetic must be
    IDENTICAL to the naive formulas (randomized spot-check, Python
    bignums as referee)."""
    import random

    from kinesis_dstream_spark.operators import curation

    rng = random.Random(10)
    rows = []
    for i in range(6):
        nt = rng.randrange(1, 40)
        rows.append((i, " ".join(f"w{i}x{j}" for j in range(nt)), "en",
                     f"s{i % 3}", 10))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    budget = rng.randrange(1, 10**12)
    tgt = {f"s{k}": w for k, w in zip(range(3), (500_000, 300_000, 200_000))}
    avail = {}
    for did, text, _, src, _ in rows:
        avail[src] = avail.get(src, 0) + len(text.split())
    for r in curation.mixture_budget_solve(
        docs, budget_tokens=budget, target_ppm=tgt
    ).collect():
        needed = budget * tgt[r["source"]] // 1_000_000
        a = avail[r["source"]]
        assert r["tokens_needed"] == needed
        assert r["epochs_ppm"] == needed * 1_000_000 // a
        assert r["keep_rate_ppm"] == min(1_000_000, needed * 1_000_000 // a)


def test_curation_pipeline_stage_monotonicity_and_dedup(spark, sf_dir):
    """Stage survivorship must be monotone per source
    (raw >= quality >= dedup >= final) and a constructed duplicate
    pair must collapse at the dedup stage."""
    from kinesis_dstream_spark.operators import curation

    docs = load_table(spark, sf_dir, "documents")
    for r in curation.curation_pipeline_report(docs).collect():
        assert r["n_raw"] >= r["n_quality"] >= r["n_dedup"] >= r["n_final"], r
        assert (r["n_final"] == 0) == (r["tokens_final"] == 0)

    dup_rows = [
        (0, "alpha beta gamma delta epsilon zeta", "en", "srcX", 30),
        (1, "alpha  beta gamma   delta epsilon zeta", "en", "srcX", 32),
        (2, "one two three four five six", "en", "srcX", 27),
    ]
    synth = spark.createDataFrame(
        dup_rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    row = curation.curation_pipeline_report(
        synth, target_ppm={"srcX": 1_000_000}
    ).collect()[0]
    # docs 0 and 1 normalize to the same text -> one keeper
    assert (row["n_raw"], row["n_quality"], row["n_dedup"]) == (3, 3, 2)


def test_pps_systematic_sample_properties(spark, sf_dir):
    """Madow PPS invariants on the fixture: total picks == total_tokens
    div stride (exact), every doc at least stride tokens heavy is a
    certainty unit (picked >= 1), per-doc picks within 1 of w/stride
    (the systematic bound), and the 2-pass cumulative equals the naive
    single-window cumulative."""
    from kinesis_dstream_spark.operators import curation

    docs = load_table(spark, sf_dir, "documents")
    out = curation.pps_systematic_sample(docs, n=100).collect()
    toks = {
        r["doc_id"]: max(1, len(r["text"].split()))
        for r in docs.select("doc_id", "text").collect()
    }
    total = sum(toks.values())
    stride = max(1, total // 100)
    assert sum(r["n_picks"] for r in out) == total // stride
    picked = {r["doc_id"]: r["n_picks"] for r in out}
    cum = 0
    for did in sorted(toks):
        w = toks[did]
        expect = (cum + w) // stride - cum // stride
        cum += w
        assert picked.get(did, 0) == expect, did
        if w >= stride:
            assert picked.get(did, 0) >= 1
        assert abs(picked.get(did, 0) - w / stride) <= 1


def test_mixture_budget_solve_saturation_boundary_exact(spark):
    """r10 ADVICE: at EXACTLY n div a == _EPOCHS_Q_CAP the unsaturated
    formula computes cap*1e6 (775,807 of int64 headroom) plus remainder
    terms up to ~1e6 — the old `>` guard let that overflow under ANSI.
    Constructed so the remainder term alone (780,000) exceeds the
    headroom; the `>=` guard must saturate instead of throwing."""
    from kinesis_dstream_spark.operators import curation

    rows = [(i, " ".join(f"a{i}t{j}" for j in range(10)), "en", "srcA", 60)
            for i in range(10)]  # tokens_available = 100
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    budget = curation._EPOCHS_Q_CAP * 100 + 78  # n div 100 == Q_CAP, r=78
    got = {
        r["source"]: r
        for r in curation.mixture_budget_solve(
            docs, budget_tokens=budget, target_ppm={"srcA": 1_000_000}
        ).collect()
    }["srcA"]
    assert got["tokens_needed"] == budget
    assert got["epochs_ppm"] == curation._EPOCHS_PPM_SAT
    assert got["keep_rate_ppm"] == 1_000_000


def test_shard_balance_serpentine_bounds_and_beats_roundrobin(spark):
    """On an adversarially skewed corpus (Zipf-ish weights), the
    serpentine plan's max-min token imbalance must be bounded by the
    largest document weight AND strictly beat plain sorted round-robin
    (shard = (rank-1) % N), which accumulates the within-round bias.
    Totals conserve the corpus exactly."""
    from kinesis_dstream_spark.operators import curation

    n_docs, N = 160, 8
    # deterministic skew: weight ~ 1000/(i+1) words
    rows = [
        (i, " ".join(f"w{j}" for j in range(max(1, 1000 // (i + 1)))),
         "en", "s", 10)
        for i in range(n_docs)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    plan = curation.shard_balance_plan(docs, n_shards=N).collect()
    assert len(plan) == N
    totals = [r["total_tokens"] for r in plan]
    weights = sorted((max(1, 1000 // (i + 1)) for i in range(n_docs)),
                     reverse=True)
    assert sum(totals) == sum(weights)
    assert sum(r["n_docs"] for r in plan) == n_docs
    imb = max(totals) - min(totals)
    assert imb <= weights[0], (imb, weights[0])

    # referee: pure-Python serpentine + round-robin on the same order
    serp = [0] * N
    rr = [0] * N
    for r0, w in enumerate(weights):
        rnd, pos = divmod(r0, N)
        serp[pos if rnd % 2 == 0 else N - 1 - pos] += w
        rr[pos] += w
    assert sorted(totals) == sorted(serp)
    assert imb < max(rr) - min(rr), "serpentine must beat round-robin here"


def test_shard_balance_default_constant_matches_generator():
    from kinesis_dstream_spark.operators import curation

    assert curation.SHARD_BALANCE_SQL == curation.shard_balance_sql()
