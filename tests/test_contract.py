"""Driver-contract surface tests (__spark_entry__)."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["event_id", "ts", "user_id", "event_type"]


def test_entry_schema_stable(spark):
    a = entry_mod.entry(spark).schema
    b = entry_mod.entry(spark).schema
    assert a == b


def test_oracle_keys_subset_of_queries():
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 40
    # the env-var nod to the reference's only test
    # (hs_engagements.py:155-159): config surface is importable & sane
    from kinesis_dstream_spark.tables import DEFAULT_SF_DIR, TABLES

    assert DEFAULT_SF_DIR
    assert len(TABLES) == 10


_DRIVER_WINDOW = [
    "q1_pricing_summary", "q2_min_cost_supplier", "q3_shipping_priority",
    "q4_order_priority", "q5_local_supplier_volume", "q6_revenue_forecast",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "q10_top_customer_revenue", "q11_important_part_value",
    "q12_shipmode_priority", "q13_customer_distribution", "q14_promo_effect",
    "q15_top_supplier", "q16_supplier_count_by_part",
    "q17_small_quantity_revenue", "q18_large_volume_customers",
    "q19_disjunctive_predicates", "q20_excess_stock_suppliers",
    "q21_waiting_suppliers", "q22_global_sales_opportunity", "dedup_exact",
    "dedup_content_hash", "dedup_simhash", "dedup_ngram_jaccard",
    "dedup_embedding_cosine", "dedup_clusters", "dedup_edit_distance",
    "ann_bruteforce_topk", "centroid_similarity_by_label",
    "sessionize_events", "events_gap_fill", "variant_props_stats", "lang_id",
    "text_quality_score", "token_stats", "doc_fingerprints",
    "tfidf_top_terms", "bpe_token_counts", "deterministic_split",
    "media_content_index", "media_dedup_by_content", "media_frame_index",
    "poll_window_filter", "ir_contacts_poll", "ir_disjunctive_search",
    "batch_poll_source_scan", "changelog_latest_state",
    "streaming_poll_source_scan",
]


def test_driver_window_order_is_frozen():
    """The driver's correctness gate records the FIRST 50 registry
    entries; their names and order are part of the round-over-round
    contract (registry discipline: new queries land after slot 50).
    A reorder here silently changes what CORRECTNESS_r{N} measures."""
    import __spark_entry__ as e

    assert list(e.queries())[:50] == _DRIVER_WINDOW
