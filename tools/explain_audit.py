"""Plan audit: join strategies / exchanges / pushdown per headline query.

Usage: ``python tools/explain_audit.py [sf_dir] [query ...]`` — prints a
markdown table plus the raw formatted plan per query when ``-v``. The
fast feedback loop for "is this the plan I'd want at 100 TB": broadcast
where a side is small, pushed filters on every scan, no stray exchanges.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kinesis_dstream_spark import registry
from kinesis_dstream_spark.session import get_spark

DEFAULT_SF = "/root/testdata/sf0.01"

# batch queries only: streaming jobs materialize eagerly and have no
# single static plan to audit
AUDIT_DEFAULT = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_top_customer_revenue",
    "q18_large_volume_customers",
    "asof_join_prev_order",
    "changelog_latest_state",
    "sessionize_events",
    "dedup_content_hash",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "ann_pq_topk",
    "ann_ivf_pq_topk",
    "tfidf_top_terms",
    "corpus_curation",
    "unigram_logprob_score",
    "repetition_stats",
    "contamination_check",
    "dedup_substring",
    "normalize_text_stats",
    "pii_scrub_stats",
    "corpus_length_stats",
    "domain_mix_sample",
    "pack_sequences",
    "grouped_sample",
    "variant_props_stats",
    "events_gap_fill",
    "poll_window_filter",
    "ir_contacts_poll",
    # r5 additions
    "embedding_contamination",
    "heavy_hitter_tokens",
    "hll_distinct_rollup",
    "cms_heavy_hitters",
    "zorder_layout_stats",
    "bm25_search",
    "dedup_clusters_star",
    "wav_decode_stats",
    "bmp_decode_stats",
    "y4m_decode_stats",
    "arrow_norm_stats",
    "hashed_embedding_stats",
    "text_semantic_topk",
    "hybrid_search_rrf",
    # r5 event-flow / time-series / graph / linkage additions
    "funnel_conversion",
    "cohort_retention",
    "ewma_user_value",
    "rolling_zscore_outliers",
    "event_transition_matrix",
    "gap_fill_interpolate",
    "hierarchical_time_rollup",
    "pagerank_near_dup",
    "record_link_parts",
    "dq_constraint_report",
    "funnel_conversion_windowed",
    "top_event_paths",
    "rfm_segments",
    "ann_filtered_topk",
    "scd2_as_of_snapshot",
    "session_funnel_conversion",
    "user_similarity_topk",
    "gdpr_erasure_report",
    "near_dup_graph_stats",
    # r6 third-wave additions
    "cumulative_distinct_users",
    "key_skew_profile",
    "session_concurrency",
    "media_perceptual_dedup",
    "adaptive_quality_gate",
    "random_projection_topk",
    "join_size_estimate",
    "column_histogram_equidepth",
    "event_sequence_match",
    "pit_feature_join",
    "temperature_mix_quotas",
    "two_stage_retrieval_topk",
    "winsorize_stats",
    "theta_set_intersection",
    "value_trend_regression",
    "rolling_active_users",
    # r7 additions: grid-selection robust stats, KMV-boundary
    # assignment, quota sampling, association mining, drift, LPA
    "mad_outliers",
    "grouped_percentiles",
    "value_decile_binning",
    "curriculum_assignment_kmv",
    "rfm_segments_kmv",
    "stratified_sample_quota",
    "event_type_cooccurrence",
    "embedding_drift_report",
    "label_propagation_communities",
    "cusum_changepoints",
    "funnel_time_to_convert",
    "embedding_quantization_calibration",
    "lang_id_confusion",
    "negative_sampling_pairs",
    "embedding_kmeans_profile",
    "semantic_cluster_dedup",
    "k_core_members",
    "daily_count_autocorr",
    # r8 wave 3
    "ann_ivf_deterministic_topk",
    "dedup_setsim_prefix",
    "dedup_sorted_neighborhood",
    "mmr_diversified_topk",
    "daily_seasonal_decomposition",
    "categorical_association",
    "hilbert_layout_stats",
    "k_truss_edges",
    "value_rank_normalize",
    "temporal_split_leakage",
    "market_basket_pairs",
    "systematic_sample",
    "vocabulary_growth",
    "functional_dependency_profile",
    "markov_baseline_hitrate",
    "seasonal_anomaly_bands",
    "near_dup_generator_agreement",
    # r11 additions
    "ann_ivf_pq_res_serve",
    "sorted_nbhd_accounting",
    "cusum_shift_detection",
    "pii_audit",
    "user_survival_km",
    "mann_kendall_trend",
    "ann_recall_mrr_report",
    "shard_balance_plan",
]


def audit(name: str, df) -> dict:
    # Audit the EXECUTED plan: under AQE the unexecuted explain prints
    # `AdaptiveSparkPlan isFinalPlan=false` — no codegen ids, and join
    # strategies may still change at runtime. Run the query first, then
    # read the finalized plan off the same QueryExecution.
    df.collect()
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # The executed AQE explain prints the Final Plan tree, then the
    # pre-runtime Initial Plan tree, then one detail block per node id
    # from BOTH trees. Count only the final tree + its nodes' details,
    # or every metric double-counts.
    tree = plan.split("== Initial Plan ==")[0]
    final_ids = set(re.findall(r"\((\d+)\)", tree))
    details = {
        m.group(1): m.group(0)
        for m in re.finditer(r"^\((\d+)\) .*?(?=^\(\d+\) |\Z)", plan, re.M | re.S)
    }
    final_detail = "\n".join(t for i, t in details.items() if i in final_ids)
    return {
        "name": name,
        "joins": ",".join(
            sorted(
                set(
                    re.findall(
                        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                        r"BroadcastNestedLoopJoin|CartesianProduct)",
                        tree,
                    )
                )
            )
        )
        or "-",
        # distinct node ids: AQE stage reuse renders one physical shuffle
        # in several subtrees — count it once (it executes once)
        "exchanges": len(set(re.findall(r"\bExchange \((\d+)\)", tree))),
        "pushed_scans": len(re.findall(r"PushedFilters: \[[^\]]", final_detail)),
        # details annotate codegen membership as `[codegen id : N]`;
        # distinct ids among final-plan nodes = whole-stage codegen spans
        "codegen_spans": len(set(re.findall(r"codegen id : (\d+)", final_detail))),
        "plan": plan,
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "-v"]
    verbose = "-v" in sys.argv[1:]
    sf = args[0] if args and os.path.isdir(args[0]) else DEFAULT_SF
    names = args[1:] if args and os.path.isdir(args[0]) else args
    names = names or AUDIT_DEFAULT
    spark = get_spark("kds-explain-audit")
    qs = registry.queries()
    print("| query | joins | exchanges | pushed scans | codegen spans |")
    print("|---|---|---|---|---|")
    for name in names:
        a = audit(name, qs[name](spark, sf))
        print(
            f"| {a['name']} | {a['joins']} | {a['exchanges']} "
            f"| {a['pushed_scans']} | {a['codegen_spans']} |"
        )
        if verbose:
            print(f"\n### {name}\n```\n{a['plan']}\n```\n")
    spark.stop()


if __name__ == "__main__":
    main()
