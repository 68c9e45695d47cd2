"""Deterministic scalar quantization (SQ8) ANN (SURVEY §2B E-11).

Completes the classic FAISS quantizer family in the repo — Flat
(``similarity.ann_bruteforce_topk``), IVF (``clustering``), PQ /
IVF-PQ / residual IVF-PQ (``pq_det``) — with the remaining production
member: the **scalar quantizer**. SQ8 stores one uint8 code per
dimension (4× memory vs float32, 8× vs the int64 grid) and is the
standard "cheap compression, near-exact recall" tier: FAISS's
``IndexScalarQuantizer(QT_8bit)``.

Everything is deterministic and hash-checkable, the pq_det discipline:

- **Trained parameters**: per-dimension ``(lo, hi)`` = exact min/max of
  the fixed-point unit coordinates (``clustering._unit_int_arrays``,
  1e-6 grid). min/max are order-independent exact int64 aggregates, so
  unlike the sampled-codebook family there is NO layout dependence at
  all — the train step itself is relational.
- **Encode**: ``code_i = ((x_i - lo_i) * L) div (hi_i - lo_i)`` with
  ``L = 255`` levels (a constant dimension encodes to 0). All operands
  non-negative, so Spark ``div`` (truncate) and DuckDB ``//`` (floor)
  agree.
- **Decode (reconstruction)**: ``x̂_i = lo_i + (code_i * span_i) div L``
  — the rounding-free integer form of FAISS's ``lo + (c + .5)/L·span``
  (the half-step offset is dropped so both engines stay on exact
  int64; the bias is below the grid's own rounding noise).
- **Asymmetric scoring (ADC)**: queries stay UNquantized;
  ``score(q, x) = Σ_i q_i · x̂_i`` — exact int64 (|q_i|,|x̂_i| ≤ 1e6 →
  per-term ≤ 1e12, ×64 dims ≤ 6.4e13, comfortably int64).

Approximation is honest ANN semantics (quantization can reorder
near-ties) but REPRODUCIBLE: same query → same shortlist on any
replica/partitioning, certifiable row-for-row against the DuckDB twin.

Plan shape at 100 TB: training is ONE map-side-partial min/max
aggregate to d rows (the bounded-collect class — d pairs of int64
literals, far smaller than even a PQ codebook); encode/decode is a
map-side ``transform`` over literal arrays (no shuffle, whole-stage
codegen); the flat ADC scan streams the corpus once per query batch
with a broadcast |q|-row query side and NO corpus shuffle — the only
exchange is the per-query top-k window over |q|·topk-bounded rows
(TakeOrderedAndProject shape). ``sq8_code_stats`` adds the operator's
telemetry twin: per-dimension occupancy + exact reconstruction-error
aggregates, the number an operator watches before trusting the 4×
memory cut.

Fixture caveat (family note): the synthetic embeddings are isotropic —
adversarial for any quantizer — but SQ8's cells are per-DIMENSION, so
unlike PQ (whose 16 codes collapse whole subspaces) recall vs the
exact ranking stays high even there; the pytest pins a recall floor
well above the PQ flat scan's.

Reference tie: the reference engine (/root/reference/app/app.py) is an
HTTP poll/filter pipeline with no vector executor; this module is part
of the mandated LLM-pipeline extension surface, not reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kinesis_dstream_spark.operators.clustering import (
    _K,
    _N_ASSIGN,
    _unit_int_arrays,
    kmeans_oracle_cte,
)

_LEVELS = 255  # SQ8: codes in [0, 255]


def _sq_bounds(iarr: DataFrame) -> list[tuple[int, int, int]]:
    """Exact per-dimension (pos0, lo, hi) over the int-grid coordinates.

    ONE aggregation: posexplode → groupBy(pos) min/max → collect d rows
    (the bounded-collect class; d=64 on the fixture). Map-side partial
    min/max keep the shuffle at d rows per partition regardless of
    corpus size.
    """
    rows = (
        iarr.select(F.posexplode("iu").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .collect()
    )
    return sorted((r["pos"], r["lo"], r["hi"]) for r in rows)


def _lit_arr(vals: list[int]) -> str:
    """SQL text of a literal int64 array (text-over-DSL: one parsed
    expression instead of per-element py4j ``F.lit`` round-trips)."""
    return "array(" + ",".join(f"{v}L" for v in vals) + ")"


def _xhat_sql(bounds: list[tuple[int, int, int]], levels: int = _LEVELS) -> str:
    """SQL text reconstructing the decoded array from ``iu``:
    encode-then-decode fused per element against literal lo/span
    arrays. All divisions act on non-negative int64 (x ≥ lo_i by
    construction of lo_i), so truncation == floor in both engines."""
    lo = _lit_arr([b[1] for b in bounds])
    sp = _lit_arr([b[2] - b[1] for b in bounds])
    return (
        f"transform(iu, (x, i) -> element_at({lo}, i + 1) + "
        f"CASE WHEN element_at({sp}, i + 1) > 0 THEN "
        f"((((x - element_at({lo}, i + 1)) * {levels}) div "
        f"element_at({sp}, i + 1)) * element_at({sp}, i + 1)) div {levels} "
        f"ELSE 0L END)"
    )


def ann_sq8_topk(
    embeddings: DataFrame,
    n_queries: int = 10,
    topk: int = 5,
    levels: int = _LEVELS,
    _iarr: DataFrame | None = None,
) -> DataFrame:
    """Flat SQ8 ANN: train bounds + fused encode/decode + full ADC scan
    + per-query top-k. Output (q_id, c_id, adc_num, rk); ties
    (adc desc, c_id); self excluded. Hash-checkable end-to-end against
    ``ANN_SQ8_SQL``. ``_iarr``: optional precomputed (checkpointed)
    ``_unit_int_arrays`` frame shared across matrix legs (r13)."""
    iarr = _iarr if _iarr is not None else _unit_int_arrays(
        embeddings
    ).localCheckpoint()
    bounds = _sq_bounds(iarr)
    xh = iarr.select("vec_id", F.expr(_xhat_sql(bounds, levels)).alias("xh"))
    queries = iarr.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("iu").alias("q_iu")
    )
    scored = (
        xh.join(F.broadcast(queries), F.col("q_id") != F.col("vec_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("c_id"),
            F.expr(
                "aggregate(zip_with(q_iu, xh, (a, b) -> a * b), 0L,"
                " (acc, x) -> acc + x)"
            ).alias("adc_num"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("adc_num").desc(), "c_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= topk)
        .select("q_id", "c_id", "adc_num", "rk")
    )


def sq8_code_stats(embeddings: DataFrame, levels: int = _LEVELS) -> DataFrame:
    """Per-dimension SQ8 telemetry: trained bounds, code occupancy, and
    exact reconstruction error — the go/no-go numbers before trusting
    the 4× memory cut (a dimension whose ``codes_used`` collapses or
    whose ``max_abs_err`` exceeds the grid budget wants more levels).

    Output one row per dimension (1-based ``pos``): lo, hi, codes_used
    (distinct codes actually hit), max_abs_err, sum_abs_err (exact
    int64), mean_abs_err (rounded 4dp). Plan: posexplode → ONE
    (pos, lo, hi) agg broadcast back → per-row encode/decode/err
    map-side → ONE d-row re-aggregation. No corpus shuffle beyond the
    two d-bounded aggs.
    """
    iarr = _unit_int_arrays(embeddings)
    lg = iarr.select(
        "vec_id", F.posexplode("iu").alias("pos0", "x")
    ).select((F.col("pos0") + 1).alias("pos"), "x")
    bounds = lg.groupBy("pos").agg(
        F.min("x").alias("lo"), F.max("x").alias("hi")
    )
    span = F.col("hi") - F.col("lo")
    enc = lg.join(F.broadcast(bounds), "pos").select(
        "pos",
        "x",
        "lo",
        "hi",
        F.when(span > 0, F.expr(f"((x - lo) * {levels}) div (hi - lo)"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("code"),
    )
    err = F.abs(
        F.col("x")
        - (
            F.col("lo")
            + F.expr(f"(code * (hi - lo)) div {levels}")
        )
    )
    return (
        enc.withColumn("abs_err", err.cast("long"))
        .groupBy("pos")
        .agg(
            F.min("lo").alias("lo"),
            F.max("hi").alias("hi"),
            F.countDistinct("code").alias("codes_used"),
            F.max("abs_err").alias("max_abs_err"),
            F.sum("abs_err").alias("sum_abs_err"),
            F.round(F.sum("abs_err") / F.count("*"), 4).alias("mean_abs_err"),
        )
        .select(
            "pos",
            "lo",
            "hi",
            "codes_used",
            "max_abs_err",
            "sum_abs_err",
            "mean_abs_err",
        )
    )


def ann_ivf_sq8_topk(
    embeddings: DataFrame,
    n_queries: int = 10,
    topk: int = 5,
    n_probe: int = 2,
    k: int = _K,
    n_assign: int = _N_ASSIGN,
    levels: int = _LEVELS,
    _fit: tuple | None = None,
) -> DataFrame:
    """Composed deterministic IVF-SQ8 — the FAISS
    ``IndexIVFScalarQuantizer`` shape: coarse cells from the
    deterministic Lloyd fit (``clustering._fit_kmeans`` — the same
    quantizer every det store uses), GLOBAL per-dimension SQ8 bounds
    (the FAISS default: the scalar quantizer trains once on the whole
    corpus, cells share it), and each query ADC-scores ONLY the
    members of its ``n_probe`` nearest cells — never the corpus.

    Versus the PQ-based composed serves: SQ8 keeps per-dimension
    resolution (255 levels/dim vs PQ's 16 codes/16-dim subspace), so
    the ADC ranking is near-exact and NO rerank stage is needed — the
    memory cut is smaller (8 bits/dim vs 8 bits/subspace) but the
    serving pipeline is one stage shorter. That tradeoff (IVF-SQ for
    accuracy-lean tiers, IVF-PQ for memory-lean) is exactly why FAISS
    ships both; now both are hash-checkable here.

    Plan: fit is the bounded centroid collect; bounds are ONE d-row
    aggregate; probes are map-side k literal folds + a ≤|q|·k window;
    the candidate join hashes on cluster_id (partition-pruned to the
    probed cells under the cell-partitioned layout); ADC is the exact
    int64 dot against the fused encode/decode transform. Ties: cells
    (dist, cid), results (adc desc, c_id).
    """
    from kinesis_dstream_spark.operators.clustering import (
        _fit_kmeans,
        _ivf_probes,
    )

    # `_fit` (r13): optional precomputed (iarr, asg, cents) so the
    # quantizer matrix pays the shared coarse fit once (values are a
    # pure function of the inputs — identical either way)
    iarr, asg, cents = _fit if _fit is not None else _fit_kmeans(
        embeddings, k, n_assign
    )
    bounds = _sq_bounds(iarr)
    xh = asg.select(
        "vec_id",
        "cluster_id",
        F.expr(_xhat_sql(bounds, levels)).alias("xh"),
    )
    queries = iarr.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("iu").alias("q_iu")
    )
    probes = _ivf_probes(queries, cents, n_probe)
    scored = (
        xh.join(F.broadcast(probes), "cluster_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("c_id"),
            F.expr(
                "aggregate(zip_with(q_iu, xh, (a, b) -> a * b), 0L,"
                " (acc, x) -> acc + x)"
            ).alias("adc_num"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("adc_num").desc(), "c_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= topk)
        .select("q_id", "c_id", "adc_num", "rk")
    )


# ---------------------------------------------------------------------------
# DuckDB twins (generated from the same parameters — r7-ADVICE discipline).
# Only the shared e/u/iarr/lg prefix of ``kmeans_oracle_cte`` is used; the
# coarse k-means chain CTEs it also defines are simply never referenced
# (the pq_det convention).
# ---------------------------------------------------------------------------


def ann_sq8_sql(
    n_queries: int = 10, topk: int = 5, levels: int = _LEVELS
) -> str:
    """DuckDB twin of ``ann_sq8_topk``: the same bounds-train /
    encode-decode / ADC chain unrolled relationally over ``lg``."""
    return (
        kmeans_oracle_cte(k=1, n_assign=1)
        + f""", sqb AS (
  SELECT pos, min(iu) AS lo, max(iu) AS hi FROM lg GROUP BY pos
), sqx AS (
  SELECT l.vec_id, l.pos,
         CASE WHEN b.hi > b.lo THEN b.lo +
           ((((l.iu - b.lo) * {levels}) // (b.hi - b.lo)) * (b.hi - b.lo))
             // {levels}
         ELSE b.lo END AS xhat
  FROM lg l JOIN sqb b ON b.pos = l.pos
), sqs AS (
  SELECT q.vec_id AS q_id, x.vec_id AS c_id,
         CAST(sum(q.iu * x.xhat) AS BIGINT) AS adc_num
  FROM lg q JOIN sqx x ON x.pos = q.pos AND x.vec_id <> q.vec_id
  WHERE q.vec_id < {n_queries}
  GROUP BY 1, 2
)
SELECT q_id, c_id, adc_num, rk FROM (
  SELECT q_id, c_id, adc_num,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY adc_num DESC, c_id) AS rk
  FROM sqs
) WHERE rk <= {topk}
"""
    )


ANN_SQ8_SQL = ann_sq8_sql()


def ann_ivf_sq8_sql(
    n_queries: int = 10,
    topk: int = 5,
    n_probe: int = 2,
    k: int = _K,
    n_assign: int = _N_ASSIGN,
    levels: int = _LEVELS,
) -> str:
    """DuckDB twin of ``ann_ivf_sq8_topk``: the full k-means chain
    (this time REFERENCED — cells gate the candidates), global SQ8
    bounds, probe ranking, and the probed-cell ADC, all unrolled."""
    cent_tbl = f"c{n_assign - 1}" if n_assign > 1 else "c0"
    return (
        kmeans_oracle_cte(k, n_assign)
        + f""", sqb AS (
  SELECT pos, min(iu) AS lo, max(iu) AS hi FROM lg GROUP BY pos
), sqx AS (
  SELECT l.vec_id, l.pos,
         CASE WHEN b.hi > b.lo THEN b.lo +
           ((((l.iu - b.lo) * {levels}) // (b.hi - b.lo)) * (b.hi - b.lo))
             // {levels}
         ELSE b.lo END AS xhat
  FROM lg l JOIN sqb b ON b.pos = l.pos
), qd AS (
  SELECT l.vec_id AS q_id, c.cid,
         CAST(sum((l.iu - c.cv) * (l.iu - c.cv)) AS BIGINT) AS cd
  FROM lg l JOIN {cent_tbl} c ON c.pos = l.pos
  WHERE l.vec_id < {n_queries}
  GROUP BY 1, 2
), probes AS (
  SELECT q_id, cid FROM (
    SELECT q_id, cid,
           row_number() OVER (PARTITION BY q_id ORDER BY cd, cid) AS pr
    FROM qd
  ) WHERE pr <= {n_probe}
), sqs AS (
  SELECT p.q_id, a.vec_id AS c_id,
         CAST(sum(q.iu * x.xhat) AS BIGINT) AS adc_num
  FROM probes p
  JOIN a{n_assign} a ON a.cid = p.cid
  JOIN lg q ON q.vec_id = p.q_id
  JOIN sqx x ON x.vec_id = a.vec_id AND x.pos = q.pos
  WHERE a.vec_id <> p.q_id
  GROUP BY 1, 2
)
SELECT q_id, c_id, adc_num, rk FROM (
  SELECT q_id, c_id, adc_num,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY adc_num DESC, c_id) AS rk
  FROM sqs
) WHERE rk <= {topk}
"""
    )


ANN_IVF_SQ8_SQL = ann_ivf_sq8_sql()


def sq8_code_stats_sql(levels: int = _LEVELS) -> str:
    """Twin of ``sq8_code_stats`` over the same unrolled chain."""
    return (
        kmeans_oracle_cte(k=1, n_assign=1)
        + f""", sqb AS (
  SELECT pos, min(iu) AS lo, max(iu) AS hi FROM lg GROUP BY pos
), sqe AS (
  SELECT l.pos, l.iu AS x, b.lo, b.hi,
         CASE WHEN b.hi > b.lo
           THEN ((l.iu - b.lo) * {levels}) // (b.hi - b.lo)
         ELSE 0 END AS code
  FROM lg l JOIN sqb b ON b.pos = l.pos
), sqr AS (
  SELECT pos, lo, hi, code,
         abs(x - (lo + (code * (hi - lo)) // {levels})) AS abs_err
  FROM sqe
)
SELECT pos, min(lo) AS lo, max(hi) AS hi,
       count(DISTINCT code) AS codes_used,
       CAST(max(abs_err) AS BIGINT) AS max_abs_err,
       CAST(sum(abs_err) AS BIGINT) AS sum_abs_err,
       round(CAST(sum(abs_err) AS BIGINT) * 1.0 / count(*), 4)
         AS mean_abs_err
FROM sqr GROUP BY pos
"""
    )


SQ8_CODE_STATS_SQL = sq8_code_stats_sql()


# ---------------------------------------------------------------------------
# Persisted deterministic IVF-SQ8 store lifecycle (r11): the FAISS
# IndexIVFScalarQuantizer with the repo's store contract — poison-first
# rebuild, atomic meta-last sidecar, frozen-quantizer ingest with the
# cell-pruned replay anti-join, per-cell compaction, erasure hook.
# ---------------------------------------------------------------------------

_SQ_META = "_meta_sq.json"
_SQ_APPEND_LOG_CAP = 64  # same rationale as pq_det._PQ_APPEND_LOG_CAP


def _codes_sql(bounds: list[tuple[int, int, int]], levels: int = _LEVELS) -> str:
    """SQL text encoding ``iu`` to CLAMPED SQ8 codes against literal
    bounds. The clamp is a no-op when the bounds cover the data (the
    full-corpus build) and the frozen-quantizer contract when they
    don't (ingested vectors outside the trained range saturate at
    0/levels — FAISS SQ semantics). The clamp also absorbs the one
    cross-engine division difference: Spark ``div`` truncates, DuckDB
    ``//`` floors, which differ only on negatives — and every negative
    code clamps to 0 either way."""
    lo = _lit_arr([b[1] for b in bounds])
    sp = _lit_arr([b[2] - b[1] for b in bounds])
    return (
        f"transform(iu, (x, i) -> CASE WHEN element_at({sp}, i + 1) > 0 THEN "
        f"greatest(0L, least({levels}L, ((x - element_at({lo}, i + 1)) * "
        f"{levels}) div element_at({sp}, i + 1))) ELSE 0L END)"
    )


def _xhat_from_codes_sql(
    bounds: list[tuple[int, int, int]], levels: int = _LEVELS
) -> str:
    """SQL text reconstructing x̂ from stored codes (all non-negative
    operands — floor == trunc)."""
    lo = _lit_arr([b[1] for b in bounds])
    sp = _lit_arr([b[2] - b[1] for b in bounds])
    return (
        f"transform(codes, (c, i) -> element_at({lo}, i + 1) + "
        f"(c * element_at({sp}, i + 1)) div {levels})"
    )


def ivf_sq8_store_ensure(
    embeddings: DataFrame,
    path: str,
    k: int = _K,
    n_assign: int = _N_ASSIGN,
    levels: int = _LEVELS,
):
    """Build-if-absent persisted IVF-SQ8 index: (vec_id, codes) parquet
    partitioned by the coarse cluster_id — ONE int64-array column of d
    codes per vector (the 8-bit-per-dim memory story; tighter physical
    types are a parquet encoding detail, the logical layout is what
    the plan prunes on) — with coarse centroids AND the per-dimension
    bounds in the atomic meta sidecar (both are the trained model; a
    code is meaningless without its bounds). Same crash-safety contract
    as every det store: poison meta FIRST, write it LAST. Returns
    (coarse, bounds, codes frame read back)."""
    import os

    from kinesis_dstream_spark import stores
    from kinesis_dstream_spark.operators.ann_index import corpus_fingerprint
    from kinesis_dstream_spark.operators.clustering import _fit_kmeans

    fp = corpus_fingerprint(embeddings, ivf_sq8=(k, n_assign, levels))
    codes_path = os.path.join(path, "codes")
    stored = stores.read_meta(path, _SQ_META)
    if stored is None or stored.get("fingerprint") != fp:
        stores.remove_meta(path, _SQ_META)
        iarr, asg, coarse = _fit_kmeans(embeddings, k, n_assign)
        bounds = _sq_bounds(iarr)
        asg.select(
            "vec_id",
            "cluster_id",
            F.expr(_codes_sql(bounds, levels)).alias("codes"),
        ).write.mode("overwrite").partitionBy("cluster_id").parquet(codes_path)
        stored = {
            "fingerprint": fp,
            "params": [k, n_assign, levels],
            "coarse": [[cid, coords] for cid, coords in coarse],
            "bounds": [list(b) for b in bounds],
        }
        stores.write_meta(path, stored, _SQ_META)  # LAST: build complete
    coarse = [(int(c), [int(x) for x in v]) for c, v in stored["coarse"]]
    bounds = [tuple(int(x) for x in b) for b in stored["bounds"]]
    codes = embeddings.sparkSession.read.parquet(codes_path)
    return coarse, bounds, codes


def ivf_sq8_store_invalidate(path: str) -> None:
    """Erasure hook: coarse centroids and the min/max bounds are model
    parameters trained on the full corpus — poison the fingerprint so
    the next ensure() refits on the erased corpus."""
    from kinesis_dstream_spark import stores

    meta = stores.read_meta(path, _SQ_META)
    if meta is not None:
        meta["fingerprint"] = "invalidated-by-erasure"
        stores.write_meta(path, meta, _SQ_META)


def _ivf_sq8_serve_from(
    embeddings: DataFrame,
    codes: DataFrame,
    coarse,
    bounds,
    n_queries: int,
    topk: int,
    n_probe: int,
    levels: int = _LEVELS,
) -> DataFrame:
    from kinesis_dstream_spark.operators.clustering import _ivf_probes

    iarr = _unit_int_arrays(embeddings)
    queries = iarr.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("iu").alias("q_iu")
    )
    probes = _ivf_probes(queries, coarse, n_probe).localCheckpoint()
    # static partition prune: the probed-cell set is ≤ k ids — a
    # driver literal, pushed as a PartitionFilter on the codes scan
    cells = [int(r[0]) for r in probes.select("cluster_id").distinct().collect()]
    cand = (
        codes.filter(F.col("cluster_id").isin(cells))
        .withColumn("xh", F.expr(_xhat_from_codes_sql(bounds, levels)))
        .join(F.broadcast(probes), "cluster_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("c_id"),
            F.expr(
                "aggregate(zip_with(q_iu, xh, (a, b) -> a * b), 0L,"
                " (acc, x) -> acc + x)"
            ).alias("adc_num"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("adc_num").desc(), "c_id")
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= topk)
        .select("q_id", "c_id", "adc_num", "rk")
    )


def ivf_sq8_store_serve(
    embeddings: DataFrame,
    path: str,
    n_queries: int = 10,
    topk: int = 5,
    n_probe: int = 2,
    k: int = _K,
    n_assign: int = _N_ASSIGN,
    levels: int = _LEVELS,
) -> DataFrame:
    """Ensure + serve: probe the n_probe nearest cells, reconstruct
    ONLY their members from the persisted codes (partition-pruned
    scan), ADC-rank, top-k. Built on the full corpus the round-trip is
    value-identical to the flat composed ``ann_ivf_sq8_topk`` — the
    same oracle certifies persistence (the res-store r11 recipe)."""
    coarse, bounds, codes = ivf_sq8_store_ensure(
        embeddings, path, k, n_assign, levels
    )
    return _ivf_sq8_serve_from(
        embeddings, codes, coarse, bounds, n_queries, topk, n_probe, levels
    )


def ivf_sq8_serve_frozen(
    embeddings: DataFrame,
    path: str,
    n_queries: int = 10,
    topk: int = 5,
    n_probe: int = 2,
    levels: int = _LEVELS,
) -> DataFrame:
    """Serve the store AS-IS (frozen quantizer + whatever ingest
    appended) — missing/torn meta refuses rather than scanning a
    half-rebuilt store (the det-store contract)."""
    import os

    from kinesis_dstream_spark import stores

    meta = stores.read_meta(path, _SQ_META)
    if meta is None:
        raise FileNotFoundError(
            f"ivf_sq8_serve_frozen: no complete store at {path} "
            "(missing/torn meta sidecar — a rebuild may be in flight); "
            "run ivf_sq8_store_ensure"
        )
    coarse = [(int(c), [int(x) for x in v]) for c, v in meta["coarse"]]
    bounds = [tuple(int(x) for x in b) for b in meta["bounds"]]
    codes = embeddings.sparkSession.read.parquet(os.path.join(path, "codes"))
    return _ivf_sq8_serve_from(
        embeddings, codes, coarse, bounds, n_queries, topk, n_probe, levels
    )


def ivf_sq8_store_append(embeddings_new: DataFrame, path: str) -> None:
    """Frozen-quantizer ingest: assign new vectors to the FROZEN coarse
    centroids, encode with the FROZEN bounds (out-of-range coordinates
    saturate at 0/levels — the clamp in ``_codes_sql``), append to the
    cell partitions. Replay-safe twice over: capped batch-fingerprint
    fast path + the cell-pruned row-level anti-join (assign FIRST, then
    anti-join only the batch's cells — the r10-verdict-task-2 shape)."""
    import os

    from kinesis_dstream_spark import stores
    from kinesis_dstream_spark.operators.ann_index import corpus_fingerprint
    from kinesis_dstream_spark.operators.clustering import (
        _assign,
        replay_existing_vec_ids,
    )

    meta = stores.read_meta(path, _SQ_META)
    if meta is None:
        raise FileNotFoundError(
            f"ivf_sq8_store_append: no complete store at {path} "
            "(missing/torn meta sidecar) — run ivf_sq8_store_ensure first"
        )
    fp_new = corpus_fingerprint(embeddings_new, ivf_sq8_append=True)
    if fp_new in meta.get("appended", []):
        return
    coarse = [(int(c), [int(x) for x in v]) for c, v in meta["coarse"]]
    bounds = [tuple(int(x) for x in b) for b in meta["bounds"]]
    _, _, levels = meta["params"]
    codes_path = os.path.join(path, "codes")
    spark = embeddings_new.sparkSession
    asg = _assign(
        _unit_int_arrays(embeddings_new).dropDuplicates(["vec_id"]), coarse
    ).select("vec_id", "iu", "cluster_id").persist()
    try:
        cells = [
            int(r[0]) for r in asg.select("cluster_id").distinct().collect()
        ]
        if cells:
            existing = replay_existing_vec_ids(spark, codes_path, cells)
            fresh = asg.join(existing, "vec_id", "left_anti")
            if not fresh.isEmpty():
                fresh.select(
                    "vec_id",
                    "cluster_id",
                    F.expr(_codes_sql(bounds, levels)).alias("codes"),
                ).write.mode("append").partitionBy("cluster_id").parquet(
                    codes_path
                )
    finally:
        asg.unpersist()
    appended = meta.get("appended", [])
    appended.append(fp_new)
    meta["appended"] = appended[-_SQ_APPEND_LOG_CAP:]
    stores.write_meta(path, meta, _SQ_META)


def ivf_sq8_store_compact(
    spark, path: str, max_files_per_cell: int = 4
) -> dict[str, int]:
    """Per-cell small-file compaction + append-log truncation — shares
    the PQ stores' dynamic-partition-overwrite mechanics."""
    from kinesis_dstream_spark.operators.pq_det import _pq_store_compact

    return _pq_store_compact(spark, path, _SQ_META, max_files_per_cell)


def ivf_sq8_ingest_sql(
    fit_pred: str = "vec_id % 5 <> 4",
    n_queries: int = 10,
    topk: int = 5,
    n_probe: int = 2,
    k: int = _K,
    n_assign: int = _N_ASSIGN,
    levels: int = _LEVELS,
) -> str:
    """Twin of the frozen-quantizer ingest flow (ensure on the
    ``fit_pred`` base + append the rest + serve over the union):
    coarse centroids AND SQ8 bounds fit on the base subset only, then
    ALL vectors assign to the frozen centroids (``aall``) and encode
    with the frozen clamped bounds (``sqx``) — the relational proof
    that ingest refits nothing at either level."""
    cent_tbl = f"c{n_assign - 1}" if n_assign > 1 else "c0"
    return (
        kmeans_oracle_cte(k=k, n_assign=n_assign, fit_pred=fit_pred)
        + f""", sqb AS (
  SELECT pos, min(iu) AS lo, max(iu) AS hi FROM lgf GROUP BY pos
), sqx AS (
  SELECT l.vec_id, l.pos,
         b.lo + (CASE WHEN b.hi > b.lo THEN
             greatest(0, least({levels},
                 ((l.iu - b.lo) * {levels}) // (b.hi - b.lo)))
           ELSE 0 END * (b.hi - b.lo)) // {levels} AS xhat
  FROM lg l JOIN sqb b ON b.pos = l.pos
), dall AS (
  SELECT l.vec_id, c.cid,
         CAST(sum((l.iu - c.cv) * (l.iu - c.cv)) AS BIGINT) AS dist
  FROM lg l JOIN {cent_tbl} c ON c.pos = l.pos GROUP BY 1, 2
), mall AS (SELECT vec_id, min(dist) AS md FROM dall GROUP BY 1),
aall AS (
  SELECT d.vec_id, min(d.cid) AS cid
  FROM dall d JOIN mall ON mall.vec_id = d.vec_id AND d.dist = mall.md
  GROUP BY 1
), qd AS (
  SELECT l.vec_id AS q_id, c.cid,
         CAST(sum((l.iu - c.cv) * (l.iu - c.cv)) AS BIGINT) AS cd
  FROM lg l JOIN {cent_tbl} c ON c.pos = l.pos
  WHERE l.vec_id < {n_queries}
  GROUP BY 1, 2
), probes AS (
  SELECT q_id, cid FROM (
    SELECT q_id, cid,
           row_number() OVER (PARTITION BY q_id ORDER BY cd, cid) AS pr
    FROM qd
  ) WHERE pr <= {n_probe}
), sqs AS (
  SELECT p.q_id, cell.vec_id AS c_id,
         CAST(sum(q.iu * x.xhat) AS BIGINT) AS adc_num
  FROM probes p
  JOIN aall cell ON cell.cid = p.cid
  JOIN lg q ON q.vec_id = p.q_id
  JOIN sqx x ON x.vec_id = cell.vec_id AND x.pos = q.pos
  WHERE cell.vec_id <> p.q_id
  GROUP BY 1, 2
)
SELECT q_id, c_id, adc_num, rk FROM (
  SELECT q_id, c_id, adc_num,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY adc_num DESC, c_id) AS rk
  FROM sqs
) WHERE rk <= {topk}
"""
    )


IVF_SQ8_INGEST_SQL = ivf_sq8_ingest_sql()


def quantizer_recall_matrix(
    embeddings: DataFrame,
    n_queries: int = 10,
    topk: int = 5,
    n_probe: int = 2,
    k: int = _K,
    n_assign: int = _N_ASSIGN,
    levels: int = _LEVELS,
    knn_graph_store: str | None = None,
) -> DataFrame:
    """Cross-family retrieval-quality matrix — ONE oracle-paired table
    ranking every deterministic quantizer tier against the exact
    integer-dot ground truth: det-IVF (probe loss only), flat
    deterministic PQ (subspace-code loss), flat SQ8 (per-dim
    quantization loss), and composed IVF-SQ8 (probe + per-dim loss).
    This is the accuracy-vs-cost decision table an ANN deployment
    reads to pick a tier; because every family here is deterministic,
    the WHOLE matrix is hash-certifiable (the ``ann_recall_mrr_report``
    argument, widened from one family to the family grid).

    Output one row per family: n_hits_total,
    recall_ppm = hits·10⁶ div (|q|·k), and
    mrr_ppm = (Σ_q 10⁶ div first-hit-rank, 0 if none) div |q| — exact
    trunc-div integers end to end.

    Cost model: the exact truth pays the |corpus|·|q| dot pass ONCE
    (shared); each family pays its normal build+search (evals run on
    small query batches, and the builds are the bounded-collect fit
    class). The overlap joins are ≤ |q|·k rows per family.
    """
    from kinesis_dstream_spark.operators.clustering import (
        _fit_kmeans,
        ivf_deterministic_topk,
    )
    from kinesis_dstream_spark.operators.knn_graph import (
        ann_knn_graph_topk,
        knn_graph_serve_frozen,
        knn_graph_store_ensure,
    )
    from kinesis_dstream_spark.operators.opq import ann_pq_rot_topk
    from kinesis_dstream_spark.operators.pq_det import ann_pq_det_topk

    # ONE deterministic coarse fit + ONE unit-array materialization
    # shared by every leg that uses them (r13 optimization, guide
    # §1.2.1 "don't compute things twice"): ivf_det and ivf_sq8 ran
    # identical `_fit_kmeans(embeddings, k, n_assign)` fits, and five
    # legs + the truth pass each re-materialized `_unit_int_arrays` —
    # all pure functions of the same inputs, so sharing is
    # value-invisible (oracle unchanged).
    shared_fit = _fit_kmeans(embeddings, k, n_assign)
    iarr = shared_fit[0]

    if knn_graph_store is not None:
        # shared-build path (r12 verdict): the graph leg reuses the
        # family's build-if-absent persisted store instead of paying a
        # fresh k-means fit + graph build inside the matrix — identical
        # rows (serve-equals-oneshot is pytest-pinned), same oracle
        knn_graph_store_ensure(embeddings, knn_graph_store, k=k, n_assign=n_assign)
        kg_leg = knn_graph_serve_frozen(
            embeddings.sparkSession, knn_graph_store, n_queries, topk
        )
    else:
        kg_leg = ann_knn_graph_topk(
            embeddings, n_queries, topk, k=k, n_assign=n_assign
        )

    queries = iarr.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("iu").alias("q_iu")
    )
    dot = F.aggregate(
        F.zip_with(F.col("q_iu"), F.col("iu"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    tw = Window.partitionBy("q_id").orderBy(F.col("dot_num").desc(), "c_id")
    truth = (
        iarr.join(F.broadcast(queries), F.col("vec_id") != F.col("q_id"))
        .select("q_id", F.col("vec_id").alias("c_id"), dot.alias("dot_num"))
        .withColumn("trk", F.row_number().over(tw))
        .filter(F.col("trk") <= topk)
        .select("q_id", "c_id")
        .localCheckpoint()
    )
    fams = {
        "ivf_det": ivf_deterministic_topk(
            embeddings, n_queries, topk, n_probe, k, n_assign,
            _fit=shared_fit,
        ).select("q_id", "c_id", "rk"),
        "pq_det_flat": ann_pq_det_topk(
            embeddings, n_queries, topk, _iarr=iarr
        ).select("q_id", "c_id", "rk"),
        "sq8_flat": ann_sq8_topk(
            embeddings, n_queries, topk, levels, _iarr=iarr
        ).select("q_id", "c_id", "rk"),
        "ivf_sq8": ann_ivf_sq8_topk(
            embeddings, n_queries, topk, n_probe, k, n_assign, levels,
            _fit=shared_fit,
        ).select("q_id", "c_id", "rk"),
        # the graph tier (r12): bounded-degree k-NN graph + fixed-round
        # beam search — completes the matrix with the production-default
        # ANN structure (graph-traversal loss: a true neighbor outside
        # the beam's reachable set is missed)
        "knn_graph": kg_leg.select("q_id", "c_id", "rk"),
        # OPQ tier (r13): exact Householder pre-rotation from the
        # dominant PC in front of the same det-PQ fit — rotation loss
        # vs flat PQ reads ~0 on the isotropic fixture BY DESIGN (the
        # honest baseline; the correlated-data win is pytest-pinned in
        # tests/test_opq.py)
        "pq_rot": ann_pq_rot_topk(
            embeddings, n_queries, topk, _iarr=iarr
        ).select("q_id", "c_id", "rk"),
    }
    rows = []
    for fam, approx in fams.items():
        hits = approx.join(F.broadcast(truth), ["q_id", "c_id"])
        per_q = hits.groupBy("q_id").agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.min("rk").alias("first_rk"),
        )
        # left-join to the query set so recall-0 queries count in means
        scored = queries.select("q_id").join(F.broadcast(per_q), "q_id", "left")
        rows.append(
            scored.agg(
                F.sum(F.coalesce("n_hits", F.lit(0))).alias("h"),
                F.sum(
                    F.coalesce(F.expr("1000000 div first_rk"), F.lit(0))
                ).alias("rr"),
            ).select(
                F.lit(fam).alias("family"),
                F.col("h").cast("long").alias("n_hits_total"),
                F.expr(f"CAST(h * 1000000 div {n_queries * topk} AS BIGINT)")
                .alias("recall_ppm"),
                F.expr(f"CAST(rr div {n_queries} AS BIGINT)").alias("mrr_ppm"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def quantizer_recall_matrix_sql(
    n_queries: int = 10,
    topk: int = 5,
    n_probe: int = 2,
    k: int = _K,
    n_assign: int = _N_ASSIGN,
    levels: int = _LEVELS,
) -> str:
    """DuckDB twin of the family matrix: the shared k-means chain + PQ
    chain + SQ chain, exact truth, one approx CTE per family, and the
    same trunc-div aggregate arithmetic. Multiply-referenced CTEs are
    MATERIALIZED (the DuckDB CTE-inlining trap, SCALE.md r8)."""
    from kinesis_dstream_spark.operators.knn_graph import (
        _ROUNDS as _KNNG_ROUNDS,
        knng_cte_sql,
    )
    from kinesis_dstream_spark.operators.pq_det import (
        _DSUB,
        _KSUB,
        _M,
        _pq_chain_sql,
        _query_lut_sql,
    )

    from kinesis_dstream_spark.operators.opq import (
        _PQ_ROT_TAG,
        householder_cte_sql,
    )

    cent_tbl = f"c{n_assign - 1}" if n_assign > 1 else "c0"
    pq_lut_joins = " ".join(
        f"JOIN ql{s} q{s} ON q{s}.q_id = q0.q_id AND q{s}.cid = x.code{s}"
        for s in range(1, _M)
    )
    rot_lut_joins = " ".join(
        f"JOIN rql{s} q{s} ON q{s}.q_id = q0.q_id AND q{s}.cid = x.code{s}"
        for s in range(1, _M)
    )
    pq_adc = " + ".join(f"q{s}.dot" for s in range(_M))
    sql = kmeans_oracle_cte(k=k, n_assign=n_assign)
    sql += _pq_chain_sql(_M, _DSUB, _KSUB, n_assign)
    for s in range(_M):
        sql += _query_lut_sql(s, n_queries, _DSUB, n_assign)
    # the rotated-PQ leg (r13): the shared Householder chain (base CTEs
    # already defined by kmeans_oracle_cte) + a second, r-prefixed PQ
    # chain over riarr — the prefix seam, not a string-replace
    sql += householder_cte_sql(with_base=False)
    sql += _pq_chain_sql(
        _M, _DSUB, _KSUB, n_assign, tag=_PQ_ROT_TAG, src="riarr", prefix="r"
    )
    for s in range(_M):
        sql += _query_lut_sql(s, n_queries, _DSUB, n_assign, prefix="r")
    fam_aggs = []
    for fam, ap in [
        ("ivf_det", "ap_ivf"),
        ("pq_det_flat", "ap_pq"),
        ("sq8_flat", "ap_sq8"),
        ("ivf_sq8", "ap_isq"),
        ("knn_graph", "ap_kg"),
        ("pq_rot", "ap_rot"),
    ]:
        fam_aggs.append(f"""
SELECT '{fam}' AS family,
       CAST(coalesce(sum(s.n_hits), 0) AS BIGINT) AS n_hits_total,
       CAST(coalesce(sum(s.n_hits), 0) * 1000000
            // {n_queries * topk} AS BIGINT) AS recall_ppm,
       CAST(coalesce(sum(s.rr), 0) // {n_queries} AS BIGINT) AS mrr_ppm
FROM qset q LEFT JOIN (
  SELECT a.q_id, count(*) AS n_hits, 1000000 // min(a.rk) AS rr
  FROM {ap} a JOIN truth t ON t.q_id = a.q_id AND t.c_id = a.c_id
  GROUP BY 1
) s ON s.q_id = q.q_id""")
    sql += f""", qset AS MATERIALIZED (
  SELECT vec_id AS q_id, iu AS q_iu FROM iarr WHERE vec_id < {n_queries}
), truth AS MATERIALIZED (
  SELECT q_id, c_id FROM (
    SELECT q.q_id, ia.vec_id AS c_id,
           row_number() OVER (PARTITION BY q.q_id
             ORDER BY CAST(list_reduce(list_transform(list_zip(q.q_iu, ia.iu),
                                                      s -> s[1] * s[2]),
                           (x, y) -> x + y) AS BIGINT) DESC, ia.vec_id) AS trk
    FROM qset q JOIN iarr ia ON ia.vec_id <> q.q_id
  ) WHERE trk <= {topk}
), sqb AS MATERIALIZED (
  SELECT pos, min(iu) AS lo, max(iu) AS hi FROM lg GROUP BY pos
), sqx AS MATERIALIZED (
  SELECT l.vec_id, l.pos,
         CASE WHEN b.hi > b.lo THEN b.lo +
           ((((l.iu - b.lo) * {levels}) // (b.hi - b.lo)) * (b.hi - b.lo))
             // {levels}
         ELSE b.lo END AS xhat
  FROM lg l JOIN sqb b ON b.pos = l.pos
), qd AS (
  SELECT l.vec_id AS q_id, c.cid,
         CAST(sum((l.iu - c.cv) * (l.iu - c.cv)) AS BIGINT) AS cd
  FROM lg l JOIN {cent_tbl} c ON c.pos = l.pos
  WHERE l.vec_id < {n_queries}
  GROUP BY 1, 2
), probes AS MATERIALIZED (
  SELECT q_id, cid FROM (
    SELECT q_id, cid,
           row_number() OVER (PARTITION BY q_id ORDER BY cd, cid) AS pr
    FROM qd
  ) WHERE pr <= {n_probe}
), ap_ivf AS (
  SELECT q_id, c_id, rk FROM (
    SELECT p.q_id, a.vec_id AS c_id,
           row_number() OVER (PARTITION BY p.q_id
             ORDER BY CAST(list_reduce(list_transform(list_zip(q.q_iu, ia.iu),
                                                      s -> s[1] * s[2]),
                           (x, y) -> x + y) AS BIGINT) DESC, a.vec_id) AS rk
    FROM probes p
    JOIN a{n_assign} a ON a.cid = p.cid
    JOIN qset q ON q.q_id = p.q_id
    JOIN iarr ia ON ia.vec_id = a.vec_id
    WHERE a.vec_id <> p.q_id
  ) WHERE rk <= {topk}
), ap_pq AS (
  SELECT q_id, c_id, rk FROM (
    SELECT q0.q_id, x.vec_id AS c_id,
           row_number() OVER (PARTITION BY q0.q_id
                              ORDER BY CAST({pq_adc} AS BIGINT) DESC,
                                       x.vec_id) AS rk
    FROM pqcodes x
    JOIN ql0 q0 ON q0.cid = x.code0
    {pq_lut_joins}
    WHERE x.vec_id <> q0.q_id
  ) WHERE rk <= {topk}
), ap_sq8 AS (
  SELECT q_id, c_id, rk FROM (
    SELECT q_id, c_id, adc_num,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY adc_num DESC, c_id) AS rk
    FROM (
      SELECT q.vec_id AS q_id, x.vec_id AS c_id,
             CAST(sum(q.iu * x.xhat) AS BIGINT) AS adc_num
      FROM lg q JOIN sqx x ON x.pos = q.pos AND x.vec_id <> q.vec_id
      WHERE q.vec_id < {n_queries}
      GROUP BY 1, 2
    )
  ) WHERE rk <= {topk}
), ap_isq AS (
  SELECT q_id, c_id, rk FROM (
    SELECT q_id, c_id, adc_num,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY adc_num DESC, c_id) AS rk
    FROM (
      SELECT p.q_id, cell.vec_id AS c_id,
             CAST(sum(q.iu * x.xhat) AS BIGINT) AS adc_num
      FROM probes p
      JOIN a{n_assign} cell ON cell.cid = p.cid
      JOIN lg q ON q.vec_id = p.q_id
      JOIN sqx x ON x.vec_id = cell.vec_id AND x.pos = q.pos
      WHERE cell.vec_id <> p.q_id
      GROUP BY 1, 2
    )
  ) WHERE rk <= {topk}
){knng_cte_sql(n_queries, k=k, n_assign=n_assign, qset="qset", with_qset=False)}, ap_kg AS (
  SELECT q_id, c_id, rk FROM (
    SELECT q_id, node AS c_id,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY dot_num DESC, node) AS rk
    FROM kg_b{_KNNG_ROUNDS}
  ) WHERE rk <= {topk}
), ap_rot AS (
  SELECT q_id, c_id, rk FROM (
    SELECT q0.q_id, x.vec_id AS c_id,
           row_number() OVER (PARTITION BY q0.q_id
                              ORDER BY CAST({pq_adc} AS BIGINT) DESC,
                                       x.vec_id) AS rk
    FROM rpqcodes x
    JOIN rql0 q0 ON q0.cid = x.code0
    {rot_lut_joins}
    WHERE x.vec_id <> q0.q_id
  ) WHERE rk <= {topk}
)
{chr(10).join("UNION ALL" + b if i else b for i, b in enumerate(fam_aggs))}
"""
    return sql


QUANTIZER_RECALL_MATRIX_SQL = quantizer_recall_matrix_sql()
