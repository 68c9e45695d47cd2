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


def candidate_pairs(
    part: DataFrame, max_dist: int = 4, left: DataFrame | None = None
) -> DataFrame:
    """Blocked candidate pairs with verified edit distance ≤ max_dist.

    The left side is exploded to its own bucket and both neighbors, so a
    pair whose lengths land in adjacent buckets is still generated
    exactly once from the bucket-of-the-right-record; dedup is by the
    (a_key < b_key) order plus `dropDuplicates` on the pair key.

    ``left`` (r11): optional replacement for the join's LEFT side (a
    scoring batch) — the filter lands BEFORE the block join so the
    candidate volume shrinks with the batch, not just the output.
    """
    a = _with_block(
        (part if left is None else left).select(
            F.col("p_partkey"), F.col("p_name")
        ),
        "a",
        max_dist,
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
    """One best (closest, then lowest-key) match per left record.

    NAME-CLASS REWRITE (r5 perf): semantically identical to running the
    window over ``candidate_pairs`` (pinned by
    ``tests/test_changelog_linkage.py::test_best_matches_equals_pair_level``),
    but never materializes record-level pairs. Dirty catalogs are *dense*
    — many records per distinct name (the fixture: 20k records, 64
    names) — so the record-pair set is quadratic in class size (~38M at
    sf0.1, 87 s and an OOM risk) while the NAME-pair set is quadratic in
    the distinct-name count (512 pairs). Verify Levenshtein once per
    name pair; per record, the best partner of a class is simply that
    class's smallest key above the record's own (the a<b, ties-on-b_key
    rule), read from a broadcast per-class sorted key array.

    Cost: |records| × (candidate classes per name) rows with an O(|class|)
    array scan each — vs |records|² /|names| pairs with an O(len²) edit
    distance each. When names are near-unique the class table degenerates
    to the record table and this is the same block join as
    ``candidate_pairs`` minus the pair materialization — never worse.
    100 TB caveat: a single name shared by ~10⁸ records would make its
    key array a giant row; at that density the right tool is the
    distance-0 fast path (same-name window `lead`) before classing.
    """
    classes = (
        part.groupBy(F.col("p_name"))
        .agg(F.sort_array(F.collect_list("p_partkey")).alias("keys"))
        .withColumn("noun", F.element_at(F.split("p_name", " "), -1))
        .withColumn(
            "bucket",
            (F.length("p_name") / F.lit(2 * max_dist + 1)).cast("int"),
        )
    )
    a_cls = classes.select(
        F.col("p_name").alias("a_name"),
        F.col("noun"),
        F.col("bucket").alias("a_bucket"),
    )
    b_cls = classes.select(
        F.col("p_name").alias("b_name"),
        F.col("noun"),
        F.col("bucket").alias("b_bucket"),
        F.col("keys").alias("b_keys"),
    )
    # name-level verify: same predicates as candidate_pairs' blocking
    # (noun equality + |bucket diff| ≤ 1 == the ±1 probe, + length prune)
    np = (
        a_cls.join(b_cls, "noun")
        .filter(F.abs(F.col("a_bucket") - F.col("b_bucket")) <= 1)
        .filter(F.abs(F.length("a_name") - F.length("b_name")) <= F.lit(max_dist))
        .withColumn("distance", F.levenshtein("a_name", "b_name"))
        .filter(F.col("distance") <= F.lit(max_dist))
        .select("a_name", "b_name", "distance", "b_keys")
    )
    recs = part.select(
        F.col("p_partkey").alias("a_key"), F.col("p_name").alias("a_name")
    )
    ka = F.col("a_key")
    cand = (
        recs.join(F.broadcast(np), "a_name")
        .withColumn(
            "b_key", F.array_min(F.filter("b_keys", lambda x: x > ka))
        )
        .filter(F.col("b_key").isNotNull())
    )
    # best partner = MIN over (distance, b_key): a struct-min AGGREGATE,
    # not a window — lexicographic struct ordering implements the
    # (distance asc, b_key asc) rule exactly, and the hash aggregate
    # combines map-side, so the exchange carries one row per record
    # instead of every candidate row feeding a per-key sort (r7 solo
    # medians at sf0.1: ~3.0-3.9 s window → ~2.1-2.5 s aggregate; same
    # rows, pinned by the pair-level equivalence test).
    return (
        cand.groupBy("a_key", "a_name")
        .agg(F.min(F.struct("distance", "b_key", "b_name")).alias("m"))
        .select(
            "a_key",
            "a_name",
            F.col("m.b_key").alias("b_key"),
            F.col("m.b_name").alias("b_name"),
            F.col("m.distance").alias("distance"),
        )
    )


# Fellegi-Sunter comparison fields and fixed m-probabilities: with no
# labeled training pairs, the classic convention fixes m (P(field
# agrees | true match)) high per field and estimates u (P(field agrees
# | non-match)) as the exact random-agreement probability from the
# field's value-frequency distribution — the Splink/probabilistic-ER
# starting point before EM refinement.
_FS_FIELDS = ["p_brand", "p_type", "p_size"]
_FS_M = 0.9
_FS_W_SCALE = 1_000_000


def fellegi_sunter_scores(
    part: DataFrame, max_dist: int = 4, a_max: int | None = None
) -> DataFrame:
    """Fellegi–Sunter probabilistic match scores over the blocked
    candidate pairs — the principled upgrade from the single-field
    edit-distance verdict: every candidate pair gets a LOG-ODDS match
    weight summed over independent field comparisons,

        w_i = ln(m_i / u_i)            if field i agrees
        w_i = ln((1−m_i) / (1−u_i))    if it disagrees

    so agreement on a RARE field (low u — e.g. container×size) moves
    the score far more than agreement on a common one (mfgr has 5
    values; two random parts agree 1/5 of the time). This is the
    scoring model production ER systems (Splink et al.) run between
    blocking and clustering; a plain distance threshold treats all
    evidence equally.

    Determinism: u_i is the exact random-agreement probability
    Σ_v c_v² / n² from the field's value frequencies (two integer
    aggregates, collected as exact int64 scalars — the bounded-collect
    class); m_i is the fixed documented constant. Both engines compute
    ln on identical doubles (same int-literal division order) and each
    field's weight is fixed-pointed to µ-units BEFORE the 4-term sum.

    ``a_max`` bounds the LEFT side to a scoring batch (p_partkey <
    a_max) BEFORE the block join — the production framing: FS weights
    are computed for a batch of incoming records against the catalog,
    not as a standing all-pairs artifact. On this fixture's DENSE name
    classes (64 distinct names at every scale) the unbatched pair set
    grows quadratically in class size (~18M pairs at sf0.1) — real ER
    systems hit the same wall and batch exactly this way.

    Plan: pair generation is the existing blocked equi-join
    (``candidate_pairs`` — never all-pairs); field values arrive via
    two key-equi-joins back to the catalog; u's are 3 map-combinable
    aggregates over the catalog (ONE pass via conditional aggs would
    also do; 3 passes keep the code obvious and the table is scanned
    cheaply); scoring is map-side arithmetic on the pair rows.
    """
    left = part if a_max is None else part.filter(F.col("p_partkey") < a_max)
    pairs = candidate_pairs(part, max_dist, left=left).select(
        "a_key", "b_key", "distance"
    )
    n = part.count()
    u_probs: dict[str, tuple[int, int]] = {}
    for f in _FS_FIELDS:
        u_num = (
            part.groupBy(f)
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.sum(F.col("c") * F.col("c")).alias("s"))
            .collect()[0]["s"]
        )
        u_probs[f] = (int(u_num), n)
    a_side = part.select(
        F.col("p_partkey").alias("a_key"),
        *[F.col(f).alias(f"a_{f}") for f in _FS_FIELDS],
    )
    b_side = part.select(
        F.col("p_partkey").alias("b_key"),
        *[F.col(f).alias(f"b_{f}") for f in _FS_FIELDS],
    )
    scored = pairs.join(a_side, "a_key").join(b_side, "b_key")
    agree_cols = []
    weight_terms = []
    for f in _FS_FIELDS:
        u_num, nn = u_probs[f]
        # identical double construction in both engines: (num·1.0/n)/n
        u = (F.lit(u_num) * F.lit(1.0) / F.lit(nn)) / F.lit(nn)
        agree = F.col(f"a_{f}").eqNullSafe(F.col(f"b_{f}"))
        w = F.round(
            F.log(
                F.when(agree, F.lit(_FS_M) / u).otherwise(
                    F.lit(1.0 - _FS_M) / (F.lit(1.0) - u)
                )
            )
            * _FS_W_SCALE
        ).cast("long")
        agree_cols.append(agree.cast("int").alias(f"agree_{f[2:]}"))
        weight_terms.append(w)
    total = weight_terms[0]
    for t in weight_terms[1:]:
        total = total + t
    return scored.select(
        "a_key",
        "b_key",
        "distance",
        *agree_cols,
        F.round(total / _FS_W_SCALE, 4).alias("match_weight"),
    )


def fellegi_sunter_sql(max_dist: int = 4, a_max: int | None = None) -> str:
    """DuckDB twin generated from the same fields/m/max_dist: the
    blocked-pair CTE (the record-link cand shape without the
    best-match cut), in-query exact u's, identical weight arithmetic."""
    u_ctes = ",\n".join(
        f"""u_{f} AS (
  SELECT (sum(c * c) * 1.0 / (SELECT count(*) FROM part))
           / (SELECT count(*) FROM part) AS u
  FROM (SELECT count(*) AS c FROM part GROUP BY {f})
)"""
        for f in _FS_FIELDS
    )
    agree_sel = ",\n       ".join(
        f"CAST(a2.{f} IS NOT DISTINCT FROM b2.{f} AS INT) AS agree_{f[2:]}"
        for f in _FS_FIELDS
    )
    w_terms = " + ".join(
        f"""CAST(round(ln(CASE WHEN a2.{f} IS NOT DISTINCT FROM b2.{f}
            THEN {_FS_M} / u_{f}.u ELSE {1.0 - _FS_M} / (1.0 - u_{f}.u) END)
            * {_FS_W_SCALE}) AS BIGINT)"""
        for f in _FS_FIELDS
    )
    u_cross = " ".join(f"CROSS JOIN u_{f}" for f in _FS_FIELDS)
    return f"""
WITH cand AS (
  SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
         levenshtein(a.p_name, b.p_name) AS distance
  FROM part a JOIN part b
    ON list_extract(str_split(a.p_name, ' '), len(str_split(a.p_name, ' ')))
     = list_extract(str_split(b.p_name, ' '), len(str_split(b.p_name, ' ')))
   AND a.p_partkey < b.p_partkey
   AND abs(length(a.p_name) - length(b.p_name)) <= {max_dist}
  WHERE levenshtein(a.p_name, b.p_name) <= {max_dist}
    {f"AND a.p_partkey < {a_max}" if a_max is not None else ""}
),
{u_ctes}
SELECT c.a_key, c.b_key, c.distance,
       {agree_sel},
       round(({w_terms}) * 1.0 / {_FS_W_SCALE}, 4) AS match_weight
FROM cand c
JOIN part a2 ON a2.p_partkey = c.a_key
JOIN part b2 ON b2.p_partkey = c.b_key
{u_cross}
"""


FELLEGI_SUNTER_SQL = fellegi_sunter_sql(a_max=200)
