"""Record linkage / entity resolution: blocking + verify + best-match.

The classic ER pipeline over dirty catalogs (here: the `part` table,
whose names are adjective+noun phrases like "red widget"):

1. **Blocking** — never compare all pairs. Each record gets a cheap
   deterministic block key (the name's head noun = last token); only
   records sharing a block are candidate pairs. At 100 TB this is the
   whole ballgame: the candidate generation is an EQUI-join on the block
   key, so Spark hash-partitions both sides and each executor sees one
   block's pairs. A length-difference prune rides the join condition
   (|len(a)−len(b)| ≤ max_dist — a necessary condition for edit
   distance ≤ max_dist), cutting pairs before the expensive verify.

2. **Verify** — exact Levenshtein distance on the candidate pairs, JVM
   whole-stage-codegen (`F.levenshtein`), threshold `max_dist`.
   `a.key < b.key` keeps each unordered pair once.

3. **Best-match selection** — one match per left record: window
   `row_number` over (distance, right key) picks the closest, ties
   broken deterministically. This is the "survivorship" step of ER.

Block-size control at scale: a head-noun block over a 100 TB catalog can
be hot (every "widget"). The within-block pair count is quadratic, so
production blocks compose MORE keys (noun + length bucket + first char
of the adjective) — the `block_cols` hook takes any extra columns;
the default adds a length bucket so one noun never forms a single
quadratic block.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _with_block(df: DataFrame, prefix: str, max_dist: int) -> DataFrame:
    toks = F.split(F.col(f"{prefix}_name"), " ")
    return df.select(
        F.col("p_partkey").alias(f"{prefix}_key"),
        F.col("p_name").alias(f"{prefix}_name"),
    ).withColumn(
        "block",
        F.concat_ws(
            "|",
            F.element_at(toks, -1),
            # length bucket wide enough that a true match (len diff ≤
            # max_dist) never straddles more than one boundary — handled
            # by probing both adjacent buckets on the left side.
            (F.length(f"{prefix}_name") / F.lit(2 * max_dist + 1)).cast("int"),
        ),
    )


def candidate_pairs(part: DataFrame, max_dist: int = 4) -> DataFrame:
    """Blocked candidate pairs with verified edit distance ≤ max_dist.

    The left side is exploded to its own bucket and both neighbors, so a
    pair whose lengths land in adjacent buckets is still generated
    exactly once from the bucket-of-the-right-record; dedup is by the
    (a_key < b_key) order plus `dropDuplicates` on the pair key.
    """
    a = _with_block(
        part.select(F.col("p_partkey"), F.col("p_name")), "a", max_dist
    )
    b = _with_block(
        part.select(F.col("p_partkey"), F.col("p_name")), "b", max_dist
    )
    # left probes its own + adjacent length buckets
    noun = F.split(F.col("block"), "\\|").getItem(0)
    bucket = F.split(F.col("block"), "\\|").getItem(1).cast("int")
    a_exp = a.withColumn(
        "probe", F.explode(F.array(bucket - 1, bucket, bucket + 1))
    ).withColumn("block", F.concat_ws("|", noun, F.col("probe"))).drop("probe")
    pairs = (
        a_exp.join(b, "block")
        .filter(F.col("a_key") < F.col("b_key"))
        .filter(
            F.abs(F.length("a_name") - F.length("b_name")) <= F.lit(max_dist)
        )
        .withColumn("distance", F.levenshtein("a_name", "b_name"))
        .filter(F.col("distance") <= F.lit(max_dist))
        .dropDuplicates(["a_key", "b_key"])
    )
    return pairs.select("a_key", "a_name", "b_key", "b_name", "distance")


def best_matches(part: DataFrame, max_dist: int = 4) -> DataFrame:
    """One best (closest, then lowest-key) match per left record."""
    pairs = candidate_pairs(part, max_dist)
    w = Window.partitionBy("a_key").orderBy("distance", "b_key")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("a_key", "a_name", "b_key", "b_name", "distance")
    )
