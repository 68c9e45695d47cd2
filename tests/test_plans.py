"""Physical-plan assertions — the 100 TB habits (SURVEY §4 / north_star).

These tests pin the *plan shape*, not results: filters pushed to the
parquet scan, projections pruned in the read schema, small sides
broadcast, top-k via TakeOrderedAndProject, no Python (BatchEvalPython)
in JVM-only paths. A regression here means a query silently became a
full-scan / full-sort / full-shuffle — invisible at fixture scale,
catastrophic at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_dstream_spark.operators import reference_ops, relational
from kinesis_dstream_spark.tables import load_table, load_tables


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_poll_window_filter_pushes_down(spark, sf_dir):
    """O-2/O-3 predicates must reach the scan (the Spark analog of the
    reference serializing filters into the HTTP payload)."""
    ev = load_table(spark, sf_dir, "events")
    plan = _formatted(reference_ops.poll_window_filter(ev))
    assert "PushedFilters" in plan
    assert "IsNotNull(props)" in plan
    # projection pruning: 'value' is not selected and must not be read
    read_schema = [
        line for line in plan.splitlines() if "ReadSchema" in line
    ][0]
    assert "value" not in read_schema
    assert "event_type" in read_schema


def test_q1_filter_pushdown_and_no_python(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plan = _formatted(relational.q1_pricing_summary(li))
    assert "PushedFilters" in plan and "l_shipdate" in plan
    assert "BatchEvalPython" not in plan  # pure JVM path
    assert "HashAggregate" in plan  # partial+final hash agg, not sort agg


def test_q3_broadcasts_dimension_side(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    plan = _plan(relational.q3_shipping_priority(t["customer"], t["orders"], t["lineitem"]))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q5_no_cartesian_and_broadcasts(spark, sf_dir):
    plan = _plan(relational.q5_local_supplier_volume(load_tables(spark, sf_dir)))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_global_topk_uses_take_ordered(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    plan = _plan(relational.global_topk_orders(orders))
    assert "TakeOrderedAndProject" in plan
    # a global Sort would be the scale bug this test exists to catch
    assert "Sort [o_totalprice" not in plan.replace("TakeOrderedAndProject", "")


def test_semi_anti_join_operators(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    semi = _plan(relational.customers_with_high_value_orders(t["customer"], t["orders"]))
    anti = _plan(relational.customers_without_orders(t["customer"], t["orders"]))
    assert "Semi" in semi
    assert "Anti" in anti


def test_events_scan_prunes_columns(spark, sf_dir):
    """A 2-column projection must not read all 6 event columns."""
    ev = load_table(spark, sf_dir, "events")
    plan = _formatted(ev.select("event_id", "event_type"))
    read_schema = [line for line in plan.splitlines() if "ReadSchema" in line][0]
    assert "props" not in read_schema and "user_id" not in read_schema


def test_jvm_only_queries_have_no_python_eval(spark, sf_dir):
    """Every oracle-paired operator is JVM-side by design: the slow path
    (BatchEvalPython / ArrowEvalPython) must not appear anywhere."""
    from kinesis_dstream_spark import registry

    jvm_only = [
        "q1_pricing_summary",
        "dedup_ngram_jaccard",
        "dedup_simhash",
        "ann_bruteforce_topk",
        "lang_id",
        "doc_fingerprints",
        "tfidf_top_terms",
        "media_content_index",
    ]
    qs = registry.queries()
    for name in jvm_only:
        plan = _plan(qs[name](spark, sf_dir))
        assert "EvalPython" not in plan, f"{name} fell off the JVM path"


def test_aqe_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_broadcast_in_ann_bruteforce(spark, sf_dir):
    from kinesis_dstream_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    plan = _plan(similarity.ann_bruteforce_topk(emb))
    # query side broadcast: corpus is never shuffled for scoring
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """Bucketing is the 100 TB co-located-join strategy: both sides
    bucketed+sorted on the join key join with ZERO Exchange (and zero
    sort) in the plan — the shuffle happened once at write time."""
    import io
    from contextlib import redirect_stdout

    from kinesis_dstream_spark.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    for df, name, key in [(orders, "orders_bkt", "o_orderkey"), (lineitem, "lineitem_bkt", "l_orderkey")]:
        (
            df.write.mode("overwrite")
            .option("path", str(tmp_path / name))
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("lineitem_bkt").join(
            spark.table("orders_bkt"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        n = joined.count()
        assert n == lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
        spark.sql("DROP TABLE IF EXISTS orders_bkt")


def test_q11_single_fact_scan_and_broadcast_threshold(spark, sf_dir):
    """Q11's HAVING-vs-global-scalar must not rescan lineitem: the
    threshold is a window SUM over the already-aggregated per-part rows,
    so the fact table appears in the plan exactly once."""
    t = load_tables(spark, sf_dir)
    plan = _plan(
        relational.q11_important_part_value(t["lineitem"], t["supplier"], t["nation"])
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # supplier/nation dims ride broadcasts
    assert plan.count("lineitem.parquet") == 1  # single fact scan
    assert "Window" in plan


def test_q16_anti_join_and_two_phase_distinct(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    plan = _plan(
        relational.q16_supplier_count_by_part(t["lineitem"], t["part"], t["supplier"])
    )
    # NOT IN (complaints) compiles to a broadcast anti join, not a filter UDF
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # count(DISTINCT) plans as expand + two hash aggregates
    assert "HashAggregate" in plan


def test_q20_semi_join_chain(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    plan = _plan(
        relational.q20_excess_stock_suppliers(
            t["lineitem"], t["part"], t["supplier"], t["nation"]
        )
    )
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_q21_no_fact_self_join(spark, sf_dir):
    """The EXISTS/NOT-EXISTS pair must decorrelate into one per-order
    aggregate — never a row-to-row self-join of lineitem."""
    t = load_tables(spark, sf_dir)
    df = relational.q21_waiting_suppliers(t["lineitem"], t["orders"], t["supplier"])
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan  # top-100, not a global sort
    # supplier name lookup rides a broadcast
    assert "BroadcastHashJoin" in plan


def test_grouping_sets_single_shuffle(spark, sf_dir):
    """Three grouping sets must plan as Expand + ONE aggregation pass
    (one Exchange) — not a union of three separate scans."""
    li = load_table(spark, sf_dir, "lineitem")
    plan = _plan(relational.grouping_sets_sales(li))
    assert "Expand" in plan
    assert plan.count("lineitem.parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1


def test_partitioned_write_prunes_partitions(spark, sf_dir):
    """A filter on the partition column must become a PartitionFilter
    (resolved against directory names at planning time) — not a post-scan
    data filter over all years' files."""
    from kinesis_dstream_spark.sources import formats

    plan = _formatted(formats.partitioned_orders_prune_stats(spark, sf_dir))
    scan = plan[plan.index("Scan parquet") :]
    part_line = [ln for ln in scan.splitlines() if "PartitionFilters" in ln][0]
    assert "o_year" in part_line and "1995" in part_line
    # the partition predicate must NOT be re-evaluated as a row filter
    # (best case: no PushedFilters line at all — nothing left to filter)
    for ln in scan.splitlines():
        if "PushedFilters" in ln:
            assert "o_year" not in ln


def test_unpivot_is_mapside_expand(spark, sf_dir):
    """unpivot = Expand (map-side 1→4 rows), so the whole melt costs one
    scan and one aggregation shuffle — never a 4-way self-union."""
    li = load_table(spark, sf_dir, "lineitem")
    plan = _plan(relational.unpivot_measure_stats(li))
    assert "Expand" in plan
    assert plan.count("lineitem.parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1


def test_bucketed_join_needs_no_exchange(spark, sf_dir):
    """Both sides bucketed 8-way on the join key → Catalyst must prove
    the partitionings compatible and plan the join with ZERO exchanges;
    the only shuffle left is the final aggregation. (Broadcast disabled
    so the bucketed sort-merge path is what's exercised — at 100 TB
    neither fact side is broadcastable.)"""
    from kinesis_dstream_spark.sources import formats

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(formats.bucketed_join_stats(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan
    # exactly ONE exchange in the whole plan: the groupBy — none for the join
    assert plan.count("Exchange hashpartitioning") == 1


def test_variant_props_pushes_and_stays_jvm(spark, sf_dir):
    """VariantType shredding is JVM expression work: pruned two-column
    scan, pushed null filter, partial+final hash agg, no Python eval."""
    ev = load_table(spark, sf_dir, "events")
    plan = _formatted(reference_ops.variant_props_stats(ev))
    assert "BatchEvalPython" not in plan
    assert "variant_get" in plan
    assert "PushedFilters: [IsNotNull(props)]" in plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "value" not in read_schema and "props" in read_schema


def test_gap_fill_reuses_user_partitioning(spark, sf_dir):
    """The spine explode, both aggregations and the join all key on
    user_id: at most the two aggregation exchanges may appear — the
    spine join must not introduce a third repartitioning of the data."""
    ev = load_table(spark, sf_dir, "events")
    plan = _plan(reference_ops.events_gap_fill(ev))
    assert "Generate explode(sequence" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_pack_sequences_single_shuffle_window(spark, sf_dir):
    """Packing's only exchange is the per-shard window sort; the bin
    aggregation reuses the shard partitioning (partial+final on the
    same keys, no second exchange)."""
    from kinesis_dstream_spark.operators import curation

    docs = load_table(spark, sf_dir, "documents")
    plan = _plan(curation.pack_sequences(docs))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" in plan and "windowspecdefinition(shard" in plan


def test_heavy_hitter_topk_uses_take_ordered(spark, sf_dir):
    """The exact heavy-hitter cut must be a distributed top-k (per-
    partition heap + driver merge), never a global sort of the full
    token-count table."""
    from kinesis_dstream_spark.operators import sketches

    docs = load_table(spark, sf_dir, "documents")
    plan = _plan(sketches.heavy_hitter_tokens(docs))
    assert "TakeOrderedAndProject" in plan
    assert "Sort [n_occurrences" not in plan.replace("TakeOrderedAndProject", "")


def test_cms_probe_join_broadcasts(spark, sf_dir):
    """Both CMS join sides are tiny post-aggregate; the probe join must
    broadcast, and nothing may cartesian."""
    from kinesis_dstream_spark.operators import sketches

    docs = load_table(spark, sf_dir, "documents")
    plan = _plan(sketches.cms_heavy_hitters(docs))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_runtime_bloom_filter_join_pruning(spark, sf_dir):
    """Spark's runtime row-level filtering: a selective filter on the
    creation side of a shuffle join injects a bloom filter into the
    application side's scan (`might_contain`), pruning rows before the
    shuffle. At 100 TB the size heuristics fire on their own (the
    application-side threshold defaults to 10 GB scans); at fixture
    scale we force eligibility via the scan-size threshold — scoped to
    this test and restored, since semantics are unchanged either way."""
    scan_conf = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    bc_conf = "spark.sql.autoBroadcastJoinThreshold"
    old_scan, old_bc = spark.conf.get(scan_conf), spark.conf.get(bc_conf)
    try:
        spark.conf.set(scan_conf, "0")
        # the injection rule skips creation sides it could broadcast
        # (a broadcast join already prunes via the hash relation), so
        # disable broadcast to exercise the shuffle-join bloom path
        spark.conf.set(bc_conf, "-1")
        li = load_table(spark, sf_dir, "lineitem")
        od = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(od, li.l_orderkey == od.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        n = j.count()
        assert n >= 1
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        assert "might_contain" in plan.lower()
    finally:
        spark.conf.set(scan_conf, old_scan)
        spark.conf.set(bc_conf, old_bc)


def test_zscore_sharded_window_partitions_on_entity_shard(spark, sf_dir):
    """The sharded z-score's window exchange must hash on
    (event_type, shard) — the whole point of the variant: no partition
    ever sorts more than ~1/shards of a type's rows. The unsharded
    variant's exchange hashes on event_type alone (pinned here as the
    contrast, documenting WHY the sharded one exists)."""
    from kinesis_dstream_spark.operators import eventflow

    events = load_table(spark, sf_dir, "events")
    sharded = _plan(eventflow.rolling_zscore_outliers_sharded(events))
    keys = [
        part.split(")")[0]
        for part in sharded.split("hashpartitioning(")[1:]
    ]
    # the window's exchange carries both keys
    assert any("event_type" in k and "shard" in k for k in keys)
    plain = _plan(eventflow.rolling_zscore_outliers(events))
    plain_keys = [
        part.split(")")[0] for part in plain.split("hashpartitioning(")[1:]
    ]
    assert all("shard" not in k for k in plain_keys)


def test_dynamic_partition_pruning_injected(spark, sf_dir):
    """The fact scan must carry a runtime dynamicpruning filter on the
    partition column — proving the dim's years reached the scan at
    execution time, not via any literal in the query."""
    from kinesis_dstream_spark.sources import formats

    df = formats.dynamic_partition_prune_stats(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    # and it prunes the PARTITION column, not a data column
    scan_lines = [
        ln for ln in plan.splitlines()
        if "PartitionFilters" in ln and "dynamicpruning" in ln.lower()
    ]
    assert scan_lines and "o_year" in scan_lines[0]


def _window_specs(plan: str) -> list[str]:
    """Partition/order spec of every Window node in an executed plan."""
    return [
        part.split(")")[0]
        for part in plan.split("windowspecdefinition(")[1:]
    ]


def test_grid_selection_replaces_full_row_key_sorts(spark, sf_dir):
    """r6 task 1: winsorize_stats / mad_outliers / adaptive_quality_gate
    must no longer contain a row_number window over the raw rows
    partitioned by the bare low-cardinality key (the 100 TB hot-spot).
    With histogram-refinement selection (selection.py), (a) the count
    aggregate's exchange hashes on (key, bucket) — a hot key spreads by
    value — and (b) every remaining Window partitions on either the
    bucket table (tiny: |value range| / bucket width rows per key) or
    the (key, sel) refine groups (one bucket's residents). A bare-key
    windowspec over raw rows failing this test means the operator
    regressed to the single-partition sort."""
    from kinesis_dstream_spark.operators import eventflow, text

    events = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    for df, key in [
        (eventflow.winsorize_stats(events), "event_type"),
        (eventflow.mad_outliers(events), "event_type"),
        (text.adaptive_quality_gate(docs), "lang"),
    ]:
        plan = _plan(df)
        keys = [
            part.split(")")[0]
            for part in plan.split("hashpartitioning(")[1:]
        ]
        # (a) the selection count-aggregate exchange carries (key, bucket)
        assert any(key in k and "bucket" in k for k in keys), keys
        # (b) no Window sorts raw rows on the bare key: every windowspec
        # carries the bucket column or the per-selection refine key
        specs = _window_specs(plan)
        assert specs, "expected the selection windows in the plan"
        for s in specs:
            assert "bucket" in s or "sel" in s, s
        # (c) map-side partial aggregation feeds the (key, bucket) count
        assert "partial_count" in plan or "partial count" in plan.lower(), (
            "bucket counts must combine map-side"
        )


def test_jl_topk_pre_reduces_before_window_exchange(spark, sf_dir):
    """r6 task 6: the JL shortlist's per-query top-k must pre-reduce
    partition-locally (MapInPandas) BEFORE the row_number merge, so the
    window exchange carries <= n_partitions*|queries|*k rows, not the
    |corpus|*|queries| scored relation. The plan must show the Arrow
    reduction feeding the window's exchange."""
    from kinesis_dstream_spark.operators import similarity
    from kinesis_dstream_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    plan = _plan(similarity.random_projection_topk(emb))
    assert "MapInPandas" in plan
    # the reduction happens upstream of the q_id window exchange
    window_pos = plan.find("Window")
    map_pos = plan.find("MapInPandas")
    assert 0 <= window_pos < map_pos, (window_pos, map_pos)


def test_r8_wave_plan_pins(spark, sf_dir):
    """Round-8 operator plan shapes: the prefix-filtered set-sim join
    and market-basket pair generator plan hash joins only (a
    CartesianProduct would mean the candidate index stopped keying the
    join); the Hilbert key evaluates via Arrow (a regression to the
    unrolled Column form re-creates the measured 111 MiB task binary);
    MMR's corpus-grain work is exactly one top-m window — every
    post-shortlist round runs on serving-batch relations.
    """
    from kinesis_dstream_spark.operators import dedup, layout, relational

    docs = load_table(spark, sf_dir, "documents")
    p = _plan(dedup.dedup_setsim_prefix(docs))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p

    li = load_table(spark, sf_dir, "lineitem")
    p = _plan(relational.market_basket_pairs(li))
    assert "CartesianProduct" not in p
    # top-k by co-occurrence is a TakeOrderedAndProject, not a sort
    assert "TakeOrderedAndProject" in p

    ev = load_table(spark, sf_dir, "events")
    p = _formatted(layout.hilbert_layout_stats(ev))
    assert "ArrowEvalPython" in p


def test_r11_wave_plan_pins(spark, sf_dir):
    """Round-11 operator plan shapes: pii_audit is ONE pure-JVM scan
    (regex counting must never fall to row-at-a-time Python); the
    daily-series CUSUM/MK windows partition by event_type (grid-
    bounded — a global Window here would be the single-partition sort
    class); MK's joins are all broadcast (no stat-misled SMJ of
    ≤grid-size frames); the shard planner contains no CartesianProduct
    and its only windows are the _pid-partitioned 2-pass rank."""
    from kinesis_dstream_spark.operators import curation, dataquality, eventflow

    docs = load_table(spark, sf_dir, "documents")
    p = _plan(dataquality.pii_audit(docs))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # column pruning: the scan reads only text+source
    assert "ReadSchema: struct<text:string,source:string>" in p

    ev = load_table(spark, sf_dir, "events")
    p = _plan(eventflow.cusum_shift_detection(ev))
    assert "BatchEvalPython" not in p
    assert "partitionspec" in p.lower() or "event_type" in p  # partitioned window

    p = _plan(eventflow.mann_kendall_trend(ev))
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p

    p = _plan(curation.shard_balance_plan(docs))
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p


def test_arrow_udf_uses_arrow_eval_node(spark, sf_dir):
    """The UDF execution matrix is plan-distinguishable: the row UDF
    query carries BatchEvalPython, the useArrow=True twin carries
    ArrowEvalPython — same values (shared oracle), different
    serialization boundary."""
    from kinesis_dstream_spark.operators import udfs

    docs = load_table(spark, sf_dir, "documents")
    p_row = _plan(udfs.udf_token_counts(docs))
    assert "BatchEvalPython" in p_row and "ArrowEvalPython" not in p_row
    p_arrow = _plan(udfs.arrow_udf_token_counts(docs))
    assert "ArrowEvalPython" in p_arrow and "BatchEvalPython" not in p_arrow
