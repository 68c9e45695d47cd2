"""Deterministic product quantization + composed deterministic IVF-PQ
(SURVEY §2B E-11; r9-verdict task 2).

The sampled-codebook PQ family (``similarity.ann_pq_topk``,
``ann_index``) is honest production ANN but rows-only at the oracle
gate: its codebooks train on execution-layout-dependent samples. This
module applies the deterministic-IVF recipe (clustering.py, r8-r9) to
the product quantizer, so BOTH halves of the classic IVF-PQ serving
stack become end-to-end hash-checkable against an unrolled relational
oracle while keeping the real serving shape:

- **Subspace codebooks**: the unit fixed-point vector (1e-6 grid,
  ``clustering._unit_int_arrays``) splits into ``m`` contiguous
  subspaces of ``d/m`` dims; each subspace runs the SAME deterministic
  Lloyd recurrence as the coarse quantizer (md5 hash-rank seeds —
  salted ``pq{s}:`` per subspace so the draws are independent — fixed
  ``n_assign`` assignment rounds, one trunc-division centroid update
  between, argmin ties to the smallest code id). Every quantity is
  int64 on the grid, so the DuckDB twin unrolls the identical
  recurrence per subspace.
- **Codes**: each vector stores ``m`` small ints — the PQ memory
  story (m·log2(ksub) bits/vector instead of d floats).
- **ADC scoring**: a query builds one lookup table per subspace —
  exact integer dots q_sub·c_j for its ksub codes (|q|·m·ksub rows,
  driver-free) — and a candidate's approximate dot is the sum of m
  LUT hits: ``adc(q,x) = Σ_s lut_s[code_s(x)]``. Overflow headroom:
  per-dim products ≤ 1e12, ×64 dims ≤ 6.4e13 — comfortably int64.
- **Approximation is honest ANN semantics** — quantization error can
  reorder near-ties — but REPRODUCIBLE: the same query returns the
  same shortlist on any replica/partitioning, certifiable
  row-for-row. Recall vs the exact integer-dot top-k is pytest-
  bounded, exactly like the sampled family.

Composed IVF-PQ (the production serving stack):

- coarse cells = the deterministic full-dim Lloyd fit
  (``clustering._fit_kmeans`` — same fit the IVF-det store uses);
- the persisted store writes (vec_id, code_0..code_{m-1}) parquet
  partitioned by cluster_id, with coarse centroids + PQ codebooks in
  the atomic meta sidecar (k·d + m·ksub·(d/m) int64s — the bounded
  codebook-collect class);
- serve: probe the ``n_probe`` nearest cells (static ``cluster_id
  IN`` partition prune — only probed cells' files are opened), ADC-
  score ONLY their members via m broadcast LUT joins, keep a per-query
  ``shortlist`` by (adc desc, c_id), then exact-rerank the shortlist
  with the true integer dot (one pushed-filter join back to the
  corpus) — the two-stage shape every production PQ deployment runs.
- Direct (non-residual) PQ is the store's default: codes quantize the
  raw unit vector, so ONE set of codebooks serves both the flat ADC
  scan and the composed store (and the oracle stays one recurrence per
  subspace). The classic accuracy refinement — RESIDUAL encoding
  (quantize x − coarse_centroid; the FAISS IVFPQ shape) — ships as
  ``ann_ivf_pq_res_topk``: the subspace codebooks fit on the residual
  arrays (salted ``rpq{s}:`` seed draws), ADC adds the exact
  query·cell-centroid term so shortlists compare across probed cells
  (q·x = q·c + q·r̂), and the pytest proves the textbook claim that
  residual reconstruction error is strictly below direct on clustered
  data. Same unrolled-oracle discipline: the residual arrays are one
  extra relational step (iu − cv per position) in both engines.

Fixture caveat (the JL/IVF/SemDeDup family note): the synthetic
parquet embeddings are ISOTROPIC, the adversarial case for any
quantizer — near-orthogonal vectors differ by less than the
quantization cell, so exact-top-k recall of the raw ADC ranking is low
there (~0.06-0.24 across param sweeps) even though every computed row
is oracle-certified. On structured (clustered) data — what production
embeddings are — the pytest pins flat-ADC cluster purity 1.0 and
reranked-serve recall 1.0 (tests/test_pq_det.py). Within a tight
cluster all members share codes, so ADC CANNOT rank them (ties break
by id) — the exact-rerank stage exists precisely for this, which is
why the composed serve, not the flat scan, is the production path.

Plan shape at 100 TB: the fits are bounded collect-loops (codebook
class); encoding is map-side (m literal fold-argmins per row, or the
Arrow matmul kernel past the codegen gate — ``clustering._assign``
dispatches); the flat ADC scan streams the codes table once per query
batch with NO shuffle (LUT joins broadcast |q|·ksub rows); the
composed serve opens only probed partitions. Nothing anywhere scales
worse than |corpus| map work + |q|·shortlist rerank.

Reference tie: the reference engine (/root/reference/app/app.py) is an
HTTP poll/filter pipeline with no vector executor; this module is part
of the mandated LLM-pipeline extension surface, not reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kinesis_dstream_spark.operators.clustering import (
    _collect_seed_centroids,
    _fit_kmeans,
    _ivf_probes,
    _lloyd_rounds,
    _unit_int_arrays,
    kmeans_oracle_cte,
)

_M = 4  # subspaces
_DSUB = 16  # dims per subspace (fixture d=64)
_KSUB = 16  # codes per subspace
_N_ASSIGN = 2  # same fixed Lloyd recurrence depth as the coarse fit
_PQ_META = "_meta.json"

Codebooks = list[list[tuple[int, list[int]]]]  # [subspace][code] -> coords


def _fused_assign_codes(
    iarr: DataFrame, codebooks: Codebooks, dsub: int, keep: tuple = ()
) -> DataFrame:
    """One map-side pass assigning ALL m subspaces at once:
    (vec_id, iu, code_0..code_{m-1}). Identical math to running
    ``clustering._assign_expr`` per sliced subspace (exact int64
    squared-L2 per code, argmin ties to the smallest code id) — the
    subspaces are independent, so fusing them into one projection
    changes scheduling, never values. m·ksub·dsub literal fold terms
    (fixture: 1024) stay far under the Arrow-dispatch gate; the terms
    are rendered as ONE SQL string per code column (not the Column
    DSL) — see ``clustering._sq_l2_fold_sql`` for why."""
    from kinesis_dstream_spark.operators.clustering import (
        _argmin_cid_sql,
        _sq_l2_fold_sql,
    )

    cols = [F.col("vec_id"), F.col("iu"), *[F.col(c) for c in keep]]
    for s, cents in enumerate(codebooks):
        sub = f"slice(iu, {s * dsub + 1}, {dsub})"
        darr = (
            "array("
            + ",".join(_sq_l2_fold_sql(sub, coords) for _, coords in cents)
            + ")"
        )
        cols.append(
            F.expr(_argmin_cid_sql(darr, [cid for cid, _ in cents])).alias(
                f"code{s}"
            )
        )
    return iarr.select(*cols)


def _fit_pq(
    iarr: DataFrame, m: int = _M, dsub: int = _DSUB, ksub: int = _KSUB,
    n_assign: int = _N_ASSIGN, tag: str = "pq",
) -> tuple[DataFrame, Codebooks]:
    """Fit the m subspace quantizers and encode the corpus.

    Returns (codes, codebooks): codes = (vec_id, code_0..code_{m-1}),
    codebooks = the final per-subspace centroid literals. Encoding
    falls out of the final assignment (no separate encode pass).

    FUSED execution (r10 perf): the m per-subspace fits are
    independent recurrences over slices of the SAME rows, so running
    them as m sequential ``_lloyd_rounds`` loops paid m× the bounded
    collects and m corpus passes per round for no reason. This fit
    runs them together — ONE seed-collect job for all subspaces (per-s
    salted-md5 rank window over an exploded (s, vec_id, su) frame),
    ONE fused map-side assignment per round (`_fused_assign_codes`),
    and ONE combined (s, code, pos) partial-sum collect per update —
    2 driver jobs total instead of 2m. Values are bit-identical to the
    unfused loops (per-subspace independence; pinned by the unchanged
    golden hashes and the unchanged per-subspace DuckDB twins)."""
    # --- one-pass seeds for all m subspaces -----------------------------
    sub_structs = F.array(
        *[
            F.struct(
                F.lit(s).alias("s"),
                F.slice(F.col("iu"), s * dsub + 1, dsub).alias("su"),
            )
            for s in range(m)
        ]
    )
    exploded = iarr.select(
        "vec_id", F.explode(sub_structs).alias("e")
    ).select("vec_id", F.col("e.s").alias("s"), F.col("e.su").alias("su"))
    rk = F.md5(
        F.concat(
            F.lit(tag),
            F.col("s").cast("string"),
            F.lit(":"),
            F.col("vec_id").cast("string"),
        )
    )
    seed_w = Window.partitionBy("s").orderBy("rk", "vec_id")
    seed_rows = (
        exploded.select("s", "vec_id", "su", rk.alias("rk"))
        .withColumn("rn", F.row_number().over(seed_w))
        .filter(F.col("rn") <= ksub)
        .select("s", (F.col("rn") - 1).alias("cid"), "su")
        .collect()  # bounded: m·ksub rows of dsub int64s (codebook class)
    )
    codebooks: Codebooks = []
    for s in range(m):
        rows = sorted(
            ((int(r["cid"]), [int(x) for x in r["su"]]) for r in seed_rows
             if r["s"] == s),
            key=lambda t: t[0],
        )
        codebooks.append(rows)

    # --- fused Lloyd rounds ---------------------------------------------
    asg = _fused_assign_codes(iarr, codebooks, dsub)
    for _ in range(n_assign - 1):
        code_structs = F.array(
            *[
                F.struct(
                    F.lit(s).alias("s"),
                    F.col(f"code{s}").alias("cid"),
                    F.slice(F.col("iu"), s * dsub + 1, dsub).alias("su"),
                )
                for s in range(m)
            ]
        )
        upd = (
            asg.select(F.explode(code_structs).alias("e"))
            .select("e.s", "e.cid", F.posexplode("e.su").alias("pos0", "v"))
            .groupBy("s", "cid", "pos0")
            # trunc division toward zero: Spark DIV == DuckDB // (the
            # determinism-trap contract shared with clustering.py)
            .agg(F.expr("sum(v) DIV count(1)").alias("cv"))
            .groupBy("s", "cid")
            .agg(F.sort_array(F.collect_list(F.struct("pos0", "cv"))).alias("cs"))
            .collect()  # bounded: ≤ m·ksub rows of dsub int64s
        )
        codebooks = []
        for s in range(m):
            rows = sorted(
                ((int(r["cid"]), [int(c["cv"]) for c in r["cs"]]) for r in upd
                 if r["s"] == s),
                key=lambda t: t[0],
            )
            codebooks.append(rows)
        asg = _fused_assign_codes(iarr, codebooks, dsub)
    codes = asg.select("vec_id", *[f"code{s}" for s in range(m)])
    return codes, codebooks


def _query_luts(
    queries: DataFrame, codebooks: Codebooks, dsub: int = _DSUB
) -> list[DataFrame]:
    """One LUT frame per subspace: (q_id, cid_s, dot_s) — the exact
    integer dot of the query's subvector with each of the subspace's
    codes. Map-side explode over ksub literal folds, rendered as SQL
    text (``clustering._dot_fold_sql`` rationale); |q|·ksub rows per
    subspace (broadcast class)."""
    from kinesis_dstream_spark.operators.clustering import _dot_fold_sql

    luts = []
    for s, cents in enumerate(codebooks):
        sub = f"slice(q_iu, {s * dsub + 1}, {dsub})"
        entries = ",".join(
            f"named_struct('dot', {_dot_fold_sql(sub, coords)}, 'cid', {cid})"
            for cid, coords in cents
        )
        # per-subspace column names (q{s}/cid{s}/dot{s}): every LUT
        # derives from the same queries frame, so a shared q_id name
        # would be one ambiguous attribute across the m joins
        luts.append(
            queries.select(
                "q_id", F.expr(f"explode(array({entries}))").alias("e")
            ).select(
                F.col("q_id").alias(f"q{s}"),
                F.col("e.cid").alias(f"cid{s}"),
                F.col("e.dot").alias(f"dot{s}"),
            )
        )
    return luts


def _adc_score(codes: DataFrame, luts: list[DataFrame]) -> DataFrame:
    """ADC over a codes frame: m broadcast LUT joins (the first fans
    each code row out per query; the rest are (q_id, code) equi-hits),
    summing to (q_id, c_id, adc_num). No shuffle of the codes side —
    every join is a broadcast hash join on the streaming scan."""
    out = codes.join(
        F.broadcast(luts[0]), codes["code0"] == luts[0]["cid0"]
    ).drop("cid0")
    for s in range(1, len(luts)):
        out = out.join(
            F.broadcast(luts[s]),
            (F.col("q0") == F.col(f"q{s}"))
            & (F.col(f"code{s}") == F.col(f"cid{s}")),
        ).drop(f"q{s}", f"cid{s}")
    adc = sum(F.col(f"dot{s}") for s in range(len(luts)))
    return out.select(
        F.col("q0").alias("q_id"),
        F.col("vec_id").alias("c_id"),
        adc.cast("long").alias("adc_num"),
    )


def ann_pq_det_topk(
    embeddings: DataFrame,
    n_queries: int = 10,
    topk: int = 5,
    m: int = _M,
    dsub: int = _DSUB,
    ksub: int = _KSUB,
    n_assign: int = _N_ASSIGN,
    _iarr: DataFrame | None = None,
) -> DataFrame:
    """Flat deterministic-PQ ANN: fit + encode + full ADC scan + per-
    query top-k — the self-contained BUILD exhibit (the composed store
    below is the recurring-cost path). Output (q_id, c_id, adc_num,
    rk); ties (adc desc, c_id). Hash-checkable end-to-end against
    ``ANN_PQ_DET_SQL`` — the first PQ in the repo with a value-level
    oracle. ``_iarr``: optional precomputed (checkpointed)
    ``_unit_int_arrays`` frame shared across matrix legs (r13)."""
    iarr = _iarr if _iarr is not None else _unit_int_arrays(
        embeddings
    ).localCheckpoint()
    codes, codebooks = _fit_pq(iarr, m, dsub, ksub, n_assign)
    queries = iarr.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("iu").alias("q_iu")
    )
    scored = _adc_score(codes, _query_luts(queries, codebooks, dsub)).filter(
        F.col("c_id") != F.col("q_id")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("adc_num").desc(), "c_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= topk)
        .select("q_id", "c_id", "adc_num", "rk")
    )


# ---------------------------------------------------------------------------
# Composed deterministic IVF-PQ with the persisted-store lifecycle.
# ---------------------------------------------------------------------------


def ivf_pq_det_store_ensure(
    embeddings: DataFrame,
    path: str,
    k: int = 8,
    n_assign: int = _N_ASSIGN,
    m: int = _M,
    dsub: int = _DSUB,
    ksub: int = _KSUB,
) -> tuple[list[tuple[int, list[int]]], Codebooks, DataFrame]:
    """Build-if-absent persisted deterministic IVF-PQ index: the codes
    table (vec_id, code_0..code_{m-1}) written parquet partitioned by
    the coarse cluster_id, coarse centroids + PQ codebooks in the meta
    sidecar. Same crash-safety contract as the IVF-det store
    (poison-first rebuild, atomic meta-last — stores.py seam); same
    fingerprint staleness rule. Returns (coarse centroids, codebooks,
    codes frame read back from the partitioned parquet)."""
    import os

    from kinesis_dstream_spark import stores
    from kinesis_dstream_spark.operators.ann_index import corpus_fingerprint

    fp = corpus_fingerprint(
        embeddings, ivf_pq_det=(k, n_assign, m, dsub, ksub)
    )
    codes_path = os.path.join(path, "codes")
    stored = stores.read_meta(path, _PQ_META)
    if stored is None or stored.get("fingerprint") != fp:
        stores.remove_meta(path, _PQ_META)
        iarr, _, coarse = _fit_kmeans(embeddings, k, n_assign)
        _, codebooks = _fit_pq(iarr, m, dsub, ksub, n_assign)
        # r13 (guide §2.4): the PQ codes and the coarse cell are BOTH
        # map-side functions of the same checkpointed rows, so the
        # write derives them in ONE projection instead of shuffle-
        # joining the two frames on vec_id (the join was the only
        # exchange in the whole ensure write path)
        from kinesis_dstream_spark.operators.clustering import (
            _argmin_cid_sql,
            _sq_l2_fold_sql,
        )

        darr = (
            "array("
            + ",".join(_sq_l2_fold_sql("iu", coords) for _, coords in coarse)
            + ")"
        )
        _fused_assign_codes(iarr, codebooks, dsub).select(
            "vec_id",
            *[f"code{s}" for s in range(m)],
            F.expr(
                _argmin_cid_sql(darr, [cid for cid, _ in coarse])
            ).alias("cluster_id"),
        ).write.mode("overwrite").partitionBy("cluster_id").parquet(codes_path)
        stored = {
            "fingerprint": fp,
            "params": [k, n_assign, m, dsub, ksub],
            "coarse": [[cid, coords] for cid, coords in coarse],
            "codebooks": [
                [[cid, coords] for cid, coords in cb] for cb in codebooks
            ],
        }
        stores.write_meta(path, stored, _PQ_META)  # LAST: build complete
    coarse = [(int(c), [int(x) for x in v]) for c, v in stored["coarse"]]
    codebooks = [
        [(int(c), [int(x) for x in v]) for c, v in cb]
        for cb in stored["codebooks"]
    ]
    codes = embeddings.sparkSession.read.parquet(codes_path)
    return coarse, codebooks, codes


def ivf_pq_det_store_invalidate(path: str) -> None:
    """Erasure hook: coarse centroids AND subspace codebooks are model
    parameters trained on the full corpus — poison the fingerprint so
    the next ensure() refits everything on the erased corpus (the
    ``ann_index_invalidate_codebooks`` / ``ivf_det_store_invalidate``
    contract)."""
    from kinesis_dstream_spark import stores

    meta = stores.read_meta(path, _PQ_META)
    if meta is not None:
        meta["fingerprint"] = "invalidated-by-erasure"
        stores.write_meta(path, meta, _PQ_META)


def ivf_pq_det_serve(
    embeddings: DataFrame,
    path: str,
    n_queries: int = 10,
    topk: int = 5,
    n_probe: int = 2,
    shortlist: int = 20,
    k: int = 8,
    n_assign: int = _N_ASSIGN,
    m: int = _M,
    dsub: int = _DSUB,
    ksub: int = _KSUB,
) -> DataFrame:
    """The composed production serve (two-stage retrieval, both stages
    deterministic): probe the ``n_probe`` nearest coarse cells → ADC-
    score ONLY their members from the persisted codes (static
    ``cluster_id IN`` partition prune + m broadcast LUT joins) → keep
    ``shortlist`` per query by (adc desc, c_id) → exact integer-dot
    rerank of the shortlist → top-k by (dot desc, c_id). Output
    (q_id, c_id, dot_num, rk) — the exact dot, so downstream consumers
    see true scores (the ADC shortlist only decides WHO gets reranked,
    the production contract). Hash-checkable against
    ``IVF_PQ_DET_SERVE_SQL``.

    Cost model per query batch: |probed cells| I/O + |members|·m LUT
    hits + |q|·shortlist exact dots — never a corpus dot scan."""
    coarse, codebooks, codes = ivf_pq_det_store_ensure(
        embeddings, path, k, n_assign, m, dsub, ksub
    )
    return _ivf_pq_serve_from(
        embeddings, codes, coarse, codebooks,
        n_queries, topk, n_probe, shortlist, m, dsub,
    )


def _ivf_pq_serve_from(
    embeddings: DataFrame,
    codes: DataFrame,
    coarse: list[tuple[int, list[int]]],
    codebooks: Codebooks,
    n_queries: int,
    topk: int,
    n_probe: int,
    shortlist: int,
    m: int = _M,
    dsub: int = _DSUB,
) -> DataFrame:
    """The recurring serve, shared by the ensure-path and the frozen
    post-ingest path (one code path → one oracle covers both)."""
    iarr = _unit_int_arrays(embeddings)
    queries = iarr.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("iu").alias("q_iu")
    )
    probes = _ivf_probes(queries, coarse, n_probe).localCheckpoint(eager=True)
    cells = sorted(
        r["cluster_id"] for r in probes.select("cluster_id").distinct().collect()
    )
    # candidates: probed cells only (planning-time partition prune),
    # fanned per probing query by a broadcast join on the cell id
    cand = codes.filter(F.col("cluster_id").isin(cells)).join(
        F.broadcast(probes.select("q_id", "cluster_id")), "cluster_id"
    )
    luts = _query_luts(queries, codebooks, dsub)
    # unlike the flat scan, cand is already fanned per probing query,
    # so EVERY LUT join carries the query-id equality (q_id == q{s})
    scored = cand
    for s in range(m):
        scored = scored.join(
            F.broadcast(luts[s]),
            (F.col("q_id") == F.col(f"q{s}"))
            & (F.col(f"code{s}") == F.col(f"cid{s}")),
        ).drop(f"q{s}", f"cid{s}")
    adc = sum(F.col(f"dot{s}") for s in range(m))
    scored = scored.filter(F.col("vec_id") != F.col("q_id")).select(
        "q_id", F.col("vec_id").alias("c_id"), adc.cast("long").alias("adc_num")
    )
    sw = Window.partitionBy("q_id").orderBy(F.col("adc_num").desc(), "c_id")
    short = (
        scored.withColumn("srk", F.row_number().over(sw))
        .filter(F.col("srk") <= shortlist)
        .select("q_id", "c_id")
    )
    # exact rerank: |q|·shortlist rows join back to the corpus vectors
    # (pushed-filter scans on both sides)
    dot = F.aggregate(
        F.zip_with(F.col("q_iu"), F.col("iu"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    reranked = (
        short.join(F.broadcast(queries), "q_id")
        .join(iarr.select(F.col("vec_id").alias("c_id"), "iu"), "c_id")
        .select("q_id", "c_id", dot.alias("dot_num"))
    )
    tw = Window.partitionBy("q_id").orderBy(F.col("dot_num").desc(), "c_id")
    return (
        reranked.withColumn("rk", F.row_number().over(tw))
        .filter(F.col("rk") <= topk)
        .select("q_id", "c_id", "dot_num", "rk")
    )


def _residual_arrays(
    coarse_asg: DataFrame, coarse: list[tuple[int, list[int]]]
) -> DataFrame:
    """(vec_id, cluster_id, iu = x − c_cell): per-row residual against
    the assigned coarse centroid, computed map-side via a literal
    cid→coords map lookup (k·d int64 literals — codebook class; SQL
    text for the same py4j-chatter reason as the fold helpers).
    Residual coords ≤ 2e6 on the grid, so every downstream product
    keeps the int64 headroom the module docstring budgets."""
    map_sql = "map(" + ",".join(
        f"{cid}, array({','.join(str(c) + 'L' for c in coords)})"
        for cid, coords in coarse
    ) + ")"
    return coarse_asg.select(
        "vec_id",
        "cluster_id",
        F.expr(
            f"zip_with(iu, element_at({map_sql}, cluster_id), (a, b) -> a - b)"
        ).alias("iu"),
    )


def ann_ivf_pq_res_topk(
    embeddings: DataFrame,
    n_queries: int = 10,
    topk: int = 5,
    n_probe: int = 2,
    shortlist: int = 20,
    k: int = 8,
    n_assign: int = _N_ASSIGN,
    m: int = _M,
    dsub: int = _DSUB,
    ksub: int = _KSUB,
) -> DataFrame:
    """RESIDUAL deterministic IVF-PQ (the FAISS IVFPQ shape): subspace
    codebooks fit on x − c_cell (shared across cells — the classic
    single residual codebook), ADC scores candidates as the exact
    query·cell-centroid dot PLUS the residual LUT hits
    (q·x = q·c + q·r ≈ q·c + q·r̂ — the cross-cell-comparable form),
    then the shortlist exact-reranks as usual. Deterministic
    end-to-end: residual arrays are one relational recentering step,
    the residual chains reuse the SAME Lloyd recurrence under salted
    ``rpq{s}:`` seed draws, and ``ANN_IVF_PQ_RES_SQL`` unrolls it all.

    Self-contained fit+serve exhibit (like ``ann_pq_det_topk``); the
    persisted-store lifecycle (r11: ``ivf_pq_res_store_ensure`` /
    ``_append`` / ``ann_ivf_pq_res_serve``) reuses this exact serve
    via ``_ivf_pq_res_serve_from`` — one code path, one oracle.

    Why residual: the residual cloud is centered and tighter than the
    raw corpus, so the same ksub codes spend their resolution on
    within-cell structure — pytest proves total reconstruction error
    strictly below direct PQ on clustered data (the textbook claim).
    """
    iarr, coarse_asg, coarse = _fit_kmeans(embeddings, k, n_assign)
    resid = _residual_arrays(coarse_asg, coarse)
    _, rcbs = _fit_pq(
        resid.select("vec_id", "iu"), m, dsub, ksub, n_assign, tag="rpq"
    )
    # r13 (guide §2.4): the residual frame carries the coarse cell —
    # encode and cell in one projection, no vec_id shuffle join
    codes = _fused_assign_codes(resid, rcbs, dsub, keep=("cluster_id",)).select(
        "vec_id", *[f"code{s}" for s in range(m)], "cluster_id"
    )
    return _ivf_pq_res_serve_from(
        embeddings, codes, coarse, rcbs, n_queries, topk, n_probe,
        shortlist, m, dsub,
    )


def _ivf_pq_res_serve_from(
    embeddings: DataFrame,
    codes: DataFrame,
    coarse: list[tuple[int, list[int]]],
    rcbs: Codebooks,
    n_queries: int,
    topk: int,
    n_probe: int,
    shortlist: int,
    m: int = _M,
    dsub: int = _DSUB,
) -> DataFrame:
    """The residual serve, shared by the flat fit+serve exhibit and the
    persisted-store paths (the ``_ivf_pq_serve_from`` convention):
    probe → residual ADC (exact q·c_cell term + raw-query-slice LUTs
    against the residual codebooks) → shortlist → exact rerank."""
    from kinesis_dstream_spark.operators.clustering import _dot_fold_sql

    iarr = _unit_int_arrays(embeddings)
    queries = iarr.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("iu").alias("q_iu")
    )
    probes = _ivf_probes(queries, coarse, n_probe).localCheckpoint(eager=True)
    cells = sorted(
        r["cluster_id"] for r in probes.select("cluster_id").distinct().collect()
    )
    cand = codes.filter(F.col("cluster_id").isin(cells)).join(
        F.broadcast(probes.select("q_id", "cluster_id")), "cluster_id"
    )
    # exact q·c_cell term: |q|·k-row LUT against the coarse centroids
    centries = ",".join(
        f"named_struct('cdot', {_dot_fold_sql('q_iu', coords)}, 'ccid', {cid})"
        for cid, coords in coarse
    )
    lutc = queries.select(
        F.col("q_id").alias("qc"), F.expr(f"explode(array({centries}))").alias("e")
    ).select("qc", F.col("e.ccid").alias("ccid"), F.col("e.cdot").alias("cdot"))
    scored = cand.join(
        F.broadcast(lutc),
        (F.col("q_id") == F.col("qc")) & (F.col("cluster_id") == F.col("ccid")),
    ).drop("qc", "ccid")
    luts = _query_luts(queries, rcbs, dsub)  # RAW q slices vs residual codes
    for s in range(m):
        scored = scored.join(
            F.broadcast(luts[s]),
            (F.col("q_id") == F.col(f"q{s}"))
            & (F.col(f"code{s}") == F.col(f"cid{s}")),
        ).drop(f"q{s}", f"cid{s}")
    adc = F.col("cdot") + sum(F.col(f"dot{s}") for s in range(m))
    scored = scored.filter(F.col("vec_id") != F.col("q_id")).select(
        "q_id", F.col("vec_id").alias("c_id"), adc.cast("long").alias("adc_num")
    )
    sw = Window.partitionBy("q_id").orderBy(F.col("adc_num").desc(), "c_id")
    short = (
        scored.withColumn("srk", F.row_number().over(sw))
        .filter(F.col("srk") <= shortlist)
        .select("q_id", "c_id")
    )
    dot = F.aggregate(
        F.zip_with(F.col("q_iu"), F.col("iu"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    reranked = (
        short.join(F.broadcast(queries), "q_id")
        .join(iarr.select(F.col("vec_id").alias("c_id"), "iu"), "c_id")
        .select("q_id", "c_id", dot.alias("dot_num"))
    )
    tw = Window.partitionBy("q_id").orderBy(F.col("dot_num").desc(), "c_id")
    return (
        reranked.withColumn("rk", F.row_number().over(tw))
        .filter(F.col("rk") <= topk)
        .select("q_id", "c_id", "dot_num", "rk")
    )


# ---------------------------------------------------------------------------
# Residual IVF-PQ persisted store (r11, r10 verdict task 6): the flat
# residual exhibit above gets the full lifecycle the direct-PQ store has
# — production FAISS serves residual codes from the inverted file, not
# from a fit-per-call scan.
# ---------------------------------------------------------------------------

_RES_META = "_meta_res.json"  # distinct name: a path could host either kind


def ivf_pq_res_store_ensure(
    embeddings: DataFrame,
    path: str,
    k: int = 8,
    n_assign: int = _N_ASSIGN,
    m: int = _M,
    dsub: int = _DSUB,
    ksub: int = _KSUB,
) -> tuple[list[tuple[int, list[int]]], Codebooks, DataFrame]:
    """Build-if-absent persisted RESIDUAL IVF-PQ index: codes are the
    residual-codebook assignments of x − c_cell, written parquet
    partitioned by the coarse cluster_id; the meta sidecar versions the
    coarse centroids AND the residual codebooks together (they are one
    model — a residual code is meaningless without the centroid it was
    recentered against). Same crash-safety contract as the direct
    store (poison-first rebuild, atomic meta-last)."""
    import os

    from kinesis_dstream_spark import stores
    from kinesis_dstream_spark.operators.ann_index import corpus_fingerprint

    fp = corpus_fingerprint(
        embeddings, ivf_pq_res=(k, n_assign, m, dsub, ksub)
    )
    codes_path = os.path.join(path, "codes")
    stored = stores.read_meta(path, _RES_META)
    if stored is None or stored.get("fingerprint") != fp:
        stores.remove_meta(path, _RES_META)
        iarr, coarse_asg, coarse = _fit_kmeans(embeddings, k, n_assign)
        resid = _residual_arrays(coarse_asg, coarse)
        _, rcbs = _fit_pq(
            resid.select("vec_id", "iu"), m, dsub, ksub, n_assign, tag="rpq"
        )
        # r13 (guide §2.4): the residual frame already CARRIES the
        # coarse cell, so the final encode keeps it in the same
        # projection instead of shuffle-joining back onto the coarse
        # assignment on vec_id
        _fused_assign_codes(resid, rcbs, dsub, keep=("cluster_id",)).select(
            "vec_id",
            *[f"code{s}" for s in range(m)],
            "cluster_id",
        ).write.mode("overwrite").partitionBy("cluster_id").parquet(codes_path)
        stored = {
            "fingerprint": fp,
            "kind": "residual",
            "params": [k, n_assign, m, dsub, ksub],
            "coarse": [[cid, coords] for cid, coords in coarse],
            "codebooks": [
                [[cid, coords] for cid, coords in cb] for cb in rcbs
            ],
        }
        stores.write_meta(path, stored, _RES_META)  # LAST: build complete
    coarse = [(int(c), [int(x) for x in v]) for c, v in stored["coarse"]]
    rcbs = [
        [(int(c), [int(x) for x in v]) for c, v in cb]
        for cb in stored["codebooks"]
    ]
    codes = embeddings.sparkSession.read.parquet(codes_path)
    return coarse, rcbs, codes


def ivf_pq_res_store_invalidate(path: str) -> None:
    """Erasure hook: coarse centroids and residual codebooks are model
    parameters trained on the full corpus — poison the fingerprint so
    the next ensure() refits on the erased corpus (the shared
    ``*_store_invalidate`` contract)."""
    from kinesis_dstream_spark import stores

    meta = stores.read_meta(path, _RES_META)
    if meta is not None:
        meta["fingerprint"] = "invalidated-by-erasure"
        stores.write_meta(path, meta, _RES_META)


def ann_ivf_pq_res_serve(
    embeddings: DataFrame,
    path: str,
    n_queries: int = 10,
    topk: int = 5,
    n_probe: int = 2,
    shortlist: int = 20,
    k: int = 8,
    n_assign: int = _N_ASSIGN,
    m: int = _M,
    dsub: int = _DSUB,
    ksub: int = _KSUB,
) -> DataFrame:
    """Store-backed residual serve: ensure (build-if-absent) then probe
    → residual ADC over ONLY the probed cell partitions → exact rerank.
    Ensure-on-the-full-corpus makes this value-identical to the flat
    ``ann_ivf_pq_res_topk``, so the SAME ``ANN_IVF_PQ_RES_SQL`` oracle
    certifies the persisted round-trip (write codes → read back →
    serve) — the ``ivf_pq_det_serve`` convention."""
    coarse, rcbs, codes = ivf_pq_res_store_ensure(
        embeddings, path, k, n_assign, m, dsub, ksub
    )
    return _ivf_pq_res_serve_from(
        embeddings, codes, coarse, rcbs, n_queries, topk, n_probe,
        shortlist, m, dsub,
    )


def ivf_pq_res_serve_frozen(
    embeddings: DataFrame,
    path: str,
    n_queries: int = 10,
    topk: int = 5,
    n_probe: int = 2,
    shortlist: int = 20,
) -> DataFrame:
    """Serve the residual store AS-IS (frozen quantizers + whatever
    ingest appended); a missing/torn meta refuses rather than scanning
    a half-rebuilt store (the ``*_serve_frozen`` contract)."""
    import os

    from kinesis_dstream_spark import stores

    meta = stores.read_meta(path, _RES_META)
    if meta is None:
        raise FileNotFoundError(
            f"ivf_pq_res_serve_frozen: no complete store at {path} "
            "(missing/torn meta sidecar — a rebuild may be in flight); "
            "run ivf_pq_res_store_ensure"
        )
    coarse = [(int(c), [int(x) for x in v]) for c, v in meta["coarse"]]
    rcbs = [
        [(int(c), [int(x) for x in v]) for c, v in cb]
        for cb in meta["codebooks"]
    ]
    _, _, m, dsub, _ = meta["params"]
    codes = embeddings.sparkSession.read.parquet(os.path.join(path, "codes"))
    return _ivf_pq_res_serve_from(
        embeddings, codes, coarse, rcbs, n_queries, topk, n_probe,
        shortlist, m, dsub,
    )


def ivf_pq_res_store_append(embeddings_new: DataFrame, path: str) -> None:
    """Incremental ingest for the residual store: frozen coarse assign
    → recenter against the assigned centroid → frozen residual-codebook
    encode → append to the cell partitions. Nothing refits (the shared
    append contract); replay-safe via the capped batch-fingerprint fast
    path plus the CELL-PRUNED row anti-join (the batch's coarse cells
    are known before the store is touched, so the replay read lists
    only those partitions — ``replay_existing_vec_ids``)."""
    import os

    from kinesis_dstream_spark import stores
    from kinesis_dstream_spark.operators.ann_index import corpus_fingerprint
    from kinesis_dstream_spark.operators.clustering import (
        _assign,
        replay_existing_vec_ids,
    )

    meta = stores.read_meta(path, _RES_META)
    if meta is None:
        raise FileNotFoundError(
            f"ivf_pq_res_store_append: no complete store at {path} "
            "(missing/torn meta sidecar) — run ivf_pq_res_store_ensure first"
        )
    fp_new = corpus_fingerprint(embeddings_new, ivf_pq_res_append=True)
    if fp_new in meta.get("appended", []):
        return
    coarse = [(int(c), [int(x) for x in v]) for c, v in meta["coarse"]]
    rcbs = [
        [(int(c), [int(x) for x in v]) for c, v in cb]
        for cb in meta["codebooks"]
    ]
    _, _, m, dsub, _ = meta["params"]
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
            fresh = asg.join(existing, "vec_id", "left_anti").localCheckpoint()
            if not fresh.isEmpty():
                # recenter, then one fused frozen encode of all m slices
                resid = _residual_arrays(
                    fresh.select("vec_id", "cluster_id", "iu"), coarse
                )
                rows = _fused_assign_codes(
                    resid.select("vec_id", "iu"), rcbs, dsub
                ).join(fresh.select("vec_id", "cluster_id"), "vec_id")
                rows.select(
                    "vec_id", *[f"code{s}" for s in range(m)], "cluster_id"
                ).write.mode("append").partitionBy("cluster_id").parquet(
                    codes_path
                )
    finally:
        asg.unpersist()
    appended = meta.get("appended", [])
    appended.append(fp_new)
    meta["appended"] = appended[-_PQ_APPEND_LOG_CAP:]
    stores.write_meta(path, meta, _RES_META)


_PQ_APPEND_LOG_CAP = 64  # same rationale as clustering._IVF_DET_APPEND_LOG_CAP


def ivf_pq_det_store_append(embeddings_new: DataFrame, path: str) -> None:
    """Incremental ingest for the IVF-PQ store: assign new vectors to
    the FROZEN coarse centroids AND the frozen subspace codebooks (pure
    map-side — no refit, no pass over existing data) and append their
    code rows to the cell partitions. Quantizer refit stays a
    deliberate rebuild (``ivf_pq_det_store_invalidate`` + ensure) —
    the ``ivf_det_store_append`` contract extended to both quantizer
    levels. Replay-safe twice over: a capped batch-fingerprint
    fast path plus the row-level anti-join on the stored vec_ids."""
    import os

    from kinesis_dstream_spark import stores
    from kinesis_dstream_spark.operators.ann_index import corpus_fingerprint
    from kinesis_dstream_spark.operators.clustering import _assign

    meta = stores.read_meta(path, _PQ_META)
    if meta is None:
        raise FileNotFoundError(
            f"ivf_pq_det_store_append: no complete store at {path} "
            "(missing/torn meta sidecar) — run ivf_pq_det_store_ensure first"
        )
    fp_new = corpus_fingerprint(embeddings_new, ivf_pq_det_append=True)
    if fp_new in meta.get("appended", []):
        return
    coarse = [(int(c), [int(x) for x in v]) for c, v in meta["coarse"]]
    codebooks = [
        [(int(c), [int(x) for x in v]) for c, v in cb]
        for cb in meta["codebooks"]
    ]
    _, _, m, dsub, _ = meta["params"]
    codes_path = os.path.join(path, "codes")
    # r11 (r10 verdict task 2): coarse-assign FIRST, then anti-join
    # against ONLY the batch's cells — the frozen coarse quantizer
    # pins each vector to one deterministic cell, so filtering the
    # stored codes by the batch's cluster_id set (a pushed PARTITION
    # filter on the cell-partitioned table) is provably identical to
    # the whole-store vec_id scan, O(touched cells) instead of
    # O(store) per replayed batch.
    spark = embeddings_new.sparkSession
    asg = _assign(
        _unit_int_arrays(embeddings_new).dropDuplicates(["vec_id"]), coarse
    ).select("vec_id", "iu", "cluster_id").persist()
    try:
        cells = [
            int(r[0]) for r in asg.select("cluster_id").distinct().collect()
        ]  # bounded by the coarse k — a driver-side literal set
        if cells:
            from kinesis_dstream_spark.operators.clustering import (
                replay_existing_vec_ids,
            )

            existing = replay_existing_vec_ids(spark, codes_path, cells)
            fresh = asg.join(existing, "vec_id", "left_anti").localCheckpoint()
            if not fresh.isEmpty():
                # r12 (the r11 quiet-host drift attribution): the m
                # per-subspace codes used to be m sequential _assign +
                # shuffle joins PER micro-batch — 16 extra shuffle
                # joins across a 4-batch drain for pure overhead. The
                # fused map-side encode (`_fused_assign_codes`, already
                # the ensure/residual path) computes all m argmins in
                # ONE projection with zero joins (fresh carries
                # cluster_id through); values bit-identical by the
                # helper's documented per-subspace equivalence.
                rows = _fused_assign_codes(
                    fresh, codebooks, dsub, keep=("cluster_id",)
                )
                rows.select(
                    "vec_id", *[f"code{s}" for s in range(m)], "cluster_id"
                ).write.mode("append").partitionBy("cluster_id").parquet(codes_path)
    finally:
        asg.unpersist()
    appended = meta.get("appended", [])
    appended.append(fp_new)
    meta["appended"] = appended[-_PQ_APPEND_LOG_CAP:]
    stores.write_meta(path, meta, _PQ_META)


def ivf_pq_det_serve_frozen(
    embeddings: DataFrame,
    path: str,
    n_queries: int = 10,
    topk: int = 5,
    n_probe: int = 2,
    shortlist: int = 20,
) -> DataFrame:
    """Serve the store AS-IS (frozen quantizers + whatever ingest
    appended) — no ensure, no freshness check, but a missing/torn meta
    refuses rather than scanning a half-rebuilt store (the
    ``ivf_det_serve_frozen`` contract)."""
    import os

    from kinesis_dstream_spark import stores

    meta = stores.read_meta(path, _PQ_META)
    if meta is None:
        raise FileNotFoundError(
            f"ivf_pq_det_serve_frozen: no complete store at {path} "
            "(missing/torn meta sidecar — a rebuild may be in flight); "
            "run ivf_pq_det_store_ensure"
        )
    coarse = [(int(c), [int(x) for x in v]) for c, v in meta["coarse"]]
    codebooks = [
        [(int(c), [int(x) for x in v]) for c, v in cb]
        for cb in meta["codebooks"]
    ]
    _, _, m, dsub, _ = meta["params"]
    codes = embeddings.sparkSession.read.parquet(os.path.join(path, "codes"))
    return _ivf_pq_serve_from(
        embeddings, codes, coarse, codebooks,
        n_queries, topk, n_probe, shortlist, m, dsub,
    )


def ivf_pq_det_store_compact(
    spark, path: str, max_files_per_cell: int = 4
) -> dict[str, int]:
    """Per-cell small-file compaction + append-log truncation — shares
    the IVF-det store's dynamic-partition-overwrite mechanics (only
    oversized cells rewrite; content, quantizers, and fingerprints
    untouched; serve results pinned identical in pytest)."""
    return _pq_store_compact(spark, path, _PQ_META, max_files_per_cell)


def ivf_pq_res_store_compact(
    spark, path: str, max_files_per_cell: int = 4
) -> dict[str, int]:
    """Residual-store compaction (r11) — identical mechanics, the
    residual sidecar; completes the lifecycle pentad (build / serve /
    ingest / erase / compact) for the residual store too."""
    return _pq_store_compact(spark, path, _RES_META, max_files_per_cell)


def _pq_store_compact(
    spark, path: str, meta_name: str, max_files_per_cell: int
) -> dict[str, int]:
    import os

    from kinesis_dstream_spark import stores
    from kinesis_dstream_spark.operators.ann_index import _n_parquet_files

    codes_path = os.path.join(path, "codes")
    oversized = [
        int(entry.split("=", 1)[1])
        for entry in os.listdir(codes_path)
        if entry.startswith("cluster_id=")
        and _n_parquet_files(os.path.join(codes_path, entry)) > max_files_per_cell
    ]
    files_before = _n_parquet_files(codes_path)
    if oversized:
        rows = (
            spark.read.parquet(codes_path)
            .filter(F.col("cluster_id").isin(oversized))
            .repartition("cluster_id")
            .localCheckpoint()
        )
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            rows.write.partitionBy("cluster_id").mode("overwrite").parquet(
                codes_path
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    meta = stores.read_meta(path, meta_name)
    if meta is not None and meta.get("appended"):
        meta["appended"] = []
        stores.write_meta(path, meta, meta_name)
    return {
        "cells_compacted": len(oversized),
        "files_before": files_before,
        "files_after": _n_parquet_files(codes_path),
    }


def pq_code_stats(
    embeddings: DataFrame,
    m: int = _M,
    dsub: int = _DSUB,
    ksub: int = _KSUB,
    n_assign: int = _N_ASSIGN,
) -> DataFrame:
    """Quantizer-health telemetry — the diagnostic ops runs before
    trusting an ANN tier: per subspace, how many codes the corpus
    actually uses and how skewed the cell occupancy is. A subspace
    whose corpus collapses into few codes (codes_used ≪ ksub, or
    max_share_ppm ≈ 1e6) contributes nothing to ADC discrimination —
    the quantizer analogue of a hot shuffle key. Output per subspace:
    (subspace, codes_used, n_vectors, max_cell_n, min_cell_n,
    max_share_ppm). One fit + one tiny groupBy per subspace; rows = m.
    Oracle-paired (``PQ_CODE_STATS_SQL``)."""
    iarr = _unit_int_arrays(embeddings).localCheckpoint()
    codes, _ = _fit_pq(iarr, m, dsub, ksub, n_assign)
    per_sub = []
    for s in range(m):
        per_sub.append(
            codes.groupBy(F.col(f"code{s}").alias("code"))
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(
                F.lit(s).alias("subspace"),
                F.count(F.lit(1)).alias("codes_used"),
                F.sum("n").alias("n_vectors"),
                F.max("n").alias("max_cell_n"),
                F.min("n").alias("min_cell_n"),
                F.expr("CAST(max(n) * 1000000 DIV sum(n) AS BIGINT)").alias(
                    "max_share_ppm"
                ),
            )
        )
    out = per_sub[0]
    for df in per_sub[1:]:
        out = out.unionByName(df)
    return out


# ---------------------------------------------------------------------------
# DuckDB twins: the per-subspace Lloyd recurrence unrolled, then ADC.
# ---------------------------------------------------------------------------


def _pq_chain_sql(
    m: int = _M,
    dsub: int = _DSUB,
    ksub: int = _KSUB,
    n_assign: int = _N_ASSIGN,
    fit_pred: str | None = None,
    tag: str = "pq",
    src: str = "iarr",
    prefix: str = "",
) -> str:
    """CTE fragment (appended after ``clustering.kmeans_oracle_cte``'s
    prefix, which defines ``iarr``): per subspace s, the sliced arrays
    ``l{s}`` (long form), the salted hash-rank seeds, the unrolled
    Lloyd rounds ending in assignment ``pa{n_assign}_{s}`` and
    centroids ``pc{n_assign-1}_{s}``, plus the combined ``pqcodes``
    table (vec_id, code0..code{m-1}).

    ``fit_pred`` (the frozen-quantizer ingest twin): a vec_id predicate
    restricting the FIT — seeds and every Lloyd round see only matching
    vectors — while the final encoding (``pall_{s}`` → ``pqcodes``)
    assigns ALL vectors to those frozen codebooks, the relational
    statement of "ingest never refits" (``kmeans_oracle_cte`` does the
    same for the coarse level).

    ``prefix`` (r13): prepended to every CTE name this fragment emits,
    so TWO independent PQ fits (e.g. the quantizer matrix's flat and
    rotated legs) compose into one query without name collisions — a
    structural parameter, not the post-hoc string-replace the r12
    ADVICE retired from the beam-curve twin."""
    P = prefix
    parts = []
    final = {}
    for s in range(m):
        lo, hi = s * dsub + 1, (s + 1) * dsub
        lfit = f"{P}l{s}"
        parts.append(f""", {P}l{s} AS (
  SELECT vec_id, unnest(generate_series(1, {dsub})) AS pos,
         unnest(iu[{lo}:{hi}]) AS su
  FROM {src}
)""")
        seed_where = ""
        if fit_pred:
            lfit = f"{P}lf{s}"
            seed_where = f" WHERE {fit_pred}"
            parts.append(
                f", {P}lf{s} AS (SELECT * FROM {P}l{s} WHERE {fit_pred})"
            )
        parts.append(f""", {P}sd{s} AS (
  SELECT vec_id,
         row_number() OVER (
           ORDER BY md5('{tag}{s}:' || CAST(vec_id AS VARCHAR)), vec_id) - 1
           AS cid
  FROM embeddings{seed_where}
  ORDER BY md5('{tag}{s}:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT {ksub}
), {P}pc0_{s} AS (
  SELECT d.cid, l.pos, l.su AS cv FROM {P}sd{s} d JOIN {lfit} l USING (vec_id)
)""")
        prev = f"{P}pc0_{s}"
        for i in range(1, n_assign + 1):
            parts.append(f""", {P}pd{i}_{s} AS (
  SELECT l.vec_id, c.cid,
         CAST(sum((l.su - c.cv) * (l.su - c.cv)) AS BIGINT) AS dist
  FROM {lfit} l JOIN {prev} c ON c.pos = l.pos GROUP BY 1, 2
), {P}pm{i}_{s} AS (SELECT vec_id, min(dist) AS md FROM {P}pd{i}_{s} GROUP BY 1),
{P}pa{i}_{s} AS (
  SELECT d.vec_id, min(d.cid) AS cid
  FROM {P}pd{i}_{s} d JOIN {P}pm{i}_{s} m ON m.vec_id = d.vec_id AND d.dist = m.md
  GROUP BY 1
)""")
            if i < n_assign:
                parts.append(f""", {P}pc{i}_{s} AS (
  SELECT a.cid, l.pos,
         CAST(CAST(sum(l.su) AS BIGINT) // count(*) AS BIGINT) AS cv
  FROM {P}pa{i}_{s} a JOIN {lfit} l USING (vec_id) GROUP BY 1, 2
)""")
                prev = f"{P}pc{i}_{s}"
        final[s] = f"{P}pa{n_assign}_{s}"
        if fit_pred:
            cent = f"{P}pc{n_assign - 1}_{s}" if n_assign > 1 else f"{P}pc0_{s}"
            parts.append(f""", {P}pdall_{s} AS (
  SELECT l.vec_id, c.cid,
         CAST(sum((l.su - c.cv) * (l.su - c.cv)) AS BIGINT) AS dist
  FROM {P}l{s} l JOIN {cent} c ON c.pos = l.pos GROUP BY 1, 2
), {P}pmall_{s} AS (SELECT vec_id, min(dist) AS md FROM {P}pdall_{s} GROUP BY 1),
{P}pall_{s} AS (
  SELECT d.vec_id, min(d.cid) AS cid
  FROM {P}pdall_{s} d JOIN {P}pmall_{s} m ON m.vec_id = d.vec_id AND d.dist = m.md
  GROUP BY 1
)""")
            final[s] = f"{P}pall_{s}"
    joins = " ".join(
        f"JOIN {final[s]} a{s} USING (vec_id)" for s in range(1, m)
    )
    code_cols = ", ".join(
        (f"a{s}.cid AS code{s}" if s else f"a0.cid AS code0") for s in range(m)
    )
    parts.append(f""", {P}pqcodes AS (
  SELECT a0.vec_id, {code_cols}
  FROM {final[0]} a0 {joins}
)""")
    return "".join(parts)


def _query_lut_sql(
    s: int,
    n_queries: int,
    dsub: int = _DSUB,
    n_assign: int = _N_ASSIGN,
    prefix: str = "",
) -> str:
    """LUT CTE per subspace: (q_id, cid, dot) against the FINAL
    subspace centroids. ``prefix`` follows ``_pq_chain_sql``'s."""
    P = prefix
    cent = f"{P}pc{n_assign - 1}_{s}" if n_assign > 1 else f"{P}pc0_{s}"
    return f""", {P}ql{s} AS (
  SELECT l.vec_id AS q_id, c.cid, CAST(sum(l.su * c.cv) AS BIGINT) AS dot
  FROM {P}l{s} l JOIN {cent} c ON c.pos = l.pos
  WHERE l.vec_id < {n_queries}
  GROUP BY 1, 2
)"""


def ann_pq_det_sql(
    n_queries: int = 10,
    topk: int = 5,
    m: int = _M,
    dsub: int = _DSUB,
    ksub: int = _KSUB,
    n_assign: int = _N_ASSIGN,
) -> str:
    """DuckDB twin of ``ann_pq_det_topk``, generated from the same
    parameters (the r7-ADVICE discipline). Only the shared prefix of
    ``kmeans_oracle_cte`` (e/u/iarr) is used; the coarse chain CTEs it
    also defines are simply never referenced."""
    lut_joins = " ".join(
        f"JOIN ql{s} q{s} ON q{s}.q_id = q0.q_id AND q{s}.cid = x.code{s}"
        for s in range(1, m)
    )
    adc = " + ".join(f"q{s}.dot" if s else "q0.dot" for s in range(m))
    sql = kmeans_oracle_cte(k=1, n_assign=1) + _pq_chain_sql(
        m, dsub, ksub, n_assign
    )
    for s in range(m):
        sql += _query_lut_sql(s, n_queries, dsub, n_assign)
    sql += f"""
SELECT q_id, c_id, adc_num, rk FROM (
  SELECT q0.q_id, x.vec_id AS c_id,
         CAST({adc} AS BIGINT) AS adc_num,
         row_number() OVER (PARTITION BY q0.q_id
                            ORDER BY CAST({adc} AS BIGINT) DESC, x.vec_id) AS rk
  FROM pqcodes x
  JOIN ql0 q0 ON q0.cid = x.code0
  {lut_joins}
  WHERE x.vec_id <> q0.q_id
) WHERE rk <= {topk}
"""
    return sql


ANN_PQ_DET_SQL = ann_pq_det_sql()


def ivf_pq_det_serve_sql(
    n_queries: int = 10,
    topk: int = 5,
    n_probe: int = 2,
    shortlist: int = 20,
    k: int = 8,
    n_assign: int = _N_ASSIGN,
    m: int = _M,
    dsub: int = _DSUB,
    ksub: int = _KSUB,
) -> str:
    """DuckDB twin of the composed serve: the coarse chain
    (``kmeans_oracle_cte`` — cells ``a{n}``, centroids ``c{n-1}``),
    the PQ chains, probes, ADC over probed members only, shortlist,
    exact rerank, top-k."""
    cent_tbl = f"c{n_assign - 1}" if n_assign > 1 else "c0"
    lut_joins = " ".join(
        f"JOIN ql{s} q{s} ON q{s}.q_id = p.q_id AND q{s}.cid = x.code{s}"
        for s in range(m)
    )
    adc = " + ".join(f"q{s}.dot" for s in range(m))
    sql = kmeans_oracle_cte(k=k, n_assign=n_assign) + _pq_chain_sql(
        m, dsub, ksub, n_assign
    )
    for s in range(m):
        sql += _query_lut_sql(s, n_queries, dsub, n_assign)
    sql += f""", qd AS (
  SELECT l.vec_id AS q_id, c.cid,
         CAST(sum((l.iu - c.cv) * (l.iu - c.cv)) AS BIGINT) AS cd
  FROM lg l JOIN {cent_tbl} c ON c.pos = l.pos
  WHERE l.vec_id < {n_queries}
  GROUP BY 1, 2
), probes AS (
  SELECT q_id, cid FROM (
    SELECT q_id, cid, row_number() OVER (PARTITION BY q_id ORDER BY cd, cid) AS pr
    FROM qd
  ) WHERE pr <= {n_probe}
), short AS (
  SELECT q_id, c_id FROM (
    SELECT p.q_id, x.vec_id AS c_id,
           row_number() OVER (PARTITION BY p.q_id
                              ORDER BY CAST({adc} AS BIGINT) DESC, x.vec_id)
             AS srk
    FROM probes p
    JOIN a{n_assign} cell ON cell.cid = p.cid
    JOIN pqcodes x ON x.vec_id = cell.vec_id
    {lut_joins}
    WHERE x.vec_id <> p.q_id
  ) WHERE srk <= {shortlist}
)
SELECT q_id, c_id, dot_num, rk FROM (
  SELECT s.q_id, s.c_id,
         CAST(list_reduce(list_transform(list_zip(qi.iu, ci.iu),
                                         z -> z[1] * z[2]),
                          (x, y) -> x + y) AS BIGINT) AS dot_num,
         row_number() OVER (PARTITION BY s.q_id
                            ORDER BY CAST(list_reduce(list_transform(
                                list_zip(qi.iu, ci.iu), z -> z[1] * z[2]),
                                (x, y) -> x + y) AS BIGINT) DESC, s.c_id) AS rk
  FROM short s
  JOIN iarr qi ON qi.vec_id = s.q_id
  JOIN iarr ci ON ci.vec_id = s.c_id
) WHERE rk <= {topk}
"""
    return sql


IVF_PQ_DET_SERVE_SQL = ivf_pq_det_serve_sql()


def ivf_pq_det_ingest_sql(
    fit_pred: str = "vec_id % 5 <> 4",
    n_queries: int = 10,
    topk: int = 5,
    n_probe: int = 2,
    shortlist: int = 20,
    k: int = 8,
    n_assign: int = _N_ASSIGN,
    m: int = _M,
    dsub: int = _DSUB,
    ksub: int = _KSUB,
) -> str:
    """Twin of the frozen-quantizer ingest flow (ensure on the
    ``fit_pred`` base + append the rest + serve over the union): BOTH
    quantizer levels fit on the base subset only, then ALL vectors
    assign to the frozen coarse centroids (``aall``) and frozen
    subspace codebooks (``pall_{s}`` → ``pqcodes``), and the serve
    reads those — the relational proof that ingest refits nothing."""
    cent_tbl = f"c{n_assign - 1}" if n_assign > 1 else "c0"
    lut_joins = " ".join(
        f"JOIN ql{s} q{s} ON q{s}.q_id = p.q_id AND q{s}.cid = x.code{s}"
        for s in range(m)
    )
    adc = " + ".join(f"q{s}.dot" for s in range(m))
    sql = kmeans_oracle_cte(k=k, n_assign=n_assign, fit_pred=fit_pred)
    sql += _pq_chain_sql(m, dsub, ksub, n_assign, fit_pred=fit_pred)
    for s in range(m):
        sql += _query_lut_sql(s, n_queries, dsub, n_assign)
    sql += f""", dall AS (
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
    SELECT q_id, cid, row_number() OVER (PARTITION BY q_id ORDER BY cd, cid) AS pr
    FROM qd
  ) WHERE pr <= {n_probe}
), short AS (
  SELECT q_id, c_id FROM (
    SELECT p.q_id, x.vec_id AS c_id,
           row_number() OVER (PARTITION BY p.q_id
                              ORDER BY CAST({adc} AS BIGINT) DESC, x.vec_id)
             AS srk
    FROM probes p
    JOIN aall cell ON cell.cid = p.cid
    JOIN pqcodes x ON x.vec_id = cell.vec_id
    {lut_joins}
    WHERE x.vec_id <> p.q_id
  ) WHERE srk <= {shortlist}
)
SELECT q_id, c_id, dot_num, rk FROM (
  SELECT s.q_id, s.c_id,
         CAST(list_reduce(list_transform(list_zip(qi.iu, ci.iu),
                                         z -> z[1] * z[2]),
                          (x, y) -> x + y) AS BIGINT) AS dot_num,
         row_number() OVER (PARTITION BY s.q_id
                            ORDER BY CAST(list_reduce(list_transform(
                                list_zip(qi.iu, ci.iu), z -> z[1] * z[2]),
                                (x, y) -> x + y) AS BIGINT) DESC, s.c_id) AS rk
  FROM short s
  JOIN iarr qi ON qi.vec_id = s.q_id
  JOIN iarr ci ON ci.vec_id = s.c_id
) WHERE rk <= {topk}
"""
    return sql


IVF_PQ_DET_INGEST_SQL = ivf_pq_det_ingest_sql()


def ann_ivf_pq_res_sql(
    n_queries: int = 10,
    topk: int = 5,
    n_probe: int = 2,
    shortlist: int = 20,
    k: int = 8,
    n_assign: int = _N_ASSIGN,
    m: int = _M,
    dsub: int = _DSUB,
    ksub: int = _KSUB,
) -> str:
    """Twin of the residual IVF-PQ: coarse chain → per-position
    residuals (``rlg``/``riarr`` — one relational recentering step) →
    residual subspace chains (``rpq`` seed salt, src=riarr) → RAW
    query-slice LUTs against the residual centroids + the exact
    q·c_cell term → shortlist → exact rerank."""
    cent_tbl = f"c{n_assign - 1}" if n_assign > 1 else "c0"
    pc = (lambda s: f"pc{n_assign - 1}_{s}" if n_assign > 1 else f"pc0_{s}")
    lut_joins = " ".join(
        f"JOIN ql{s} q{s} ON q{s}.q_id = p.q_id AND q{s}.cid = x.code{s}"
        for s in range(m)
    )
    adc = "qlc.cdot + " + " + ".join(f"q{s}.dot" for s in range(m))
    sql = kmeans_oracle_cte(k=k, n_assign=n_assign)
    sql += f""", rlg AS (
  SELECT l.vec_id, l.pos, l.iu - c.cv AS ru
  FROM lg l
  JOIN a{n_assign} a ON a.vec_id = l.vec_id
  JOIN {cent_tbl} c ON c.cid = a.cid AND c.pos = l.pos
), riarr AS (
  SELECT vec_id, list(ru ORDER BY pos) AS iu FROM rlg GROUP BY 1
)"""
    sql += _pq_chain_sql(m, dsub, ksub, n_assign, tag="rpq", src="riarr")
    for s in range(m):
        lo, hi = s * dsub + 1, (s + 1) * dsub
        sql += f""", lq{s} AS (
  SELECT vec_id, unnest(generate_series(1, {dsub})) AS pos,
         unnest(iu[{lo}:{hi}]) AS su
  FROM iarr WHERE vec_id < {n_queries}
), ql{s} AS (
  SELECT l.vec_id AS q_id, c.cid, CAST(sum(l.su * c.cv) AS BIGINT) AS dot
  FROM lq{s} l JOIN {pc(s)} c ON c.pos = l.pos
  GROUP BY 1, 2
)"""
    sql += f""", qlc AS (
  SELECT l.vec_id AS q_id, c.cid, CAST(sum(l.iu * c.cv) AS BIGINT) AS cdot
  FROM lg l JOIN {cent_tbl} c ON c.pos = l.pos
  WHERE l.vec_id < {n_queries}
  GROUP BY 1, 2
), qd AS (
  SELECT l.vec_id AS q_id, c.cid,
         CAST(sum((l.iu - c.cv) * (l.iu - c.cv)) AS BIGINT) AS cd
  FROM lg l JOIN {cent_tbl} c ON c.pos = l.pos
  WHERE l.vec_id < {n_queries}
  GROUP BY 1, 2
), probes AS (
  SELECT q_id, cid FROM (
    SELECT q_id, cid, row_number() OVER (PARTITION BY q_id ORDER BY cd, cid) AS pr
    FROM qd
  ) WHERE pr <= {n_probe}
), short AS (
  SELECT q_id, c_id FROM (
    SELECT p.q_id, x.vec_id AS c_id,
           row_number() OVER (PARTITION BY p.q_id
                              ORDER BY CAST({adc} AS BIGINT) DESC, x.vec_id)
             AS srk
    FROM probes p
    JOIN a{n_assign} cell ON cell.cid = p.cid
    JOIN pqcodes x ON x.vec_id = cell.vec_id
    JOIN qlc ON qlc.q_id = p.q_id AND qlc.cid = p.cid
    {lut_joins}
    WHERE x.vec_id <> p.q_id
  ) WHERE srk <= {shortlist}
)
SELECT q_id, c_id, dot_num, rk FROM (
  SELECT s.q_id, s.c_id,
         CAST(list_reduce(list_transform(list_zip(qi.iu, ci.iu),
                                         z -> z[1] * z[2]),
                          (x, y) -> x + y) AS BIGINT) AS dot_num,
         row_number() OVER (PARTITION BY s.q_id
                            ORDER BY CAST(list_reduce(list_transform(
                                list_zip(qi.iu, ci.iu), z -> z[1] * z[2]),
                                (x, y) -> x + y) AS BIGINT) DESC, s.c_id) AS rk
  FROM short s
  JOIN iarr qi ON qi.vec_id = s.q_id
  JOIN iarr ci ON ci.vec_id = s.c_id
) WHERE rk <= {topk}
"""
    return sql


ANN_IVF_PQ_RES_SQL = ann_ivf_pq_res_sql()


def ivf_pq_res_ingest_sql(
    fit_pred: str = "vec_id % 5 <> 4",
    n_queries: int = 10,
    topk: int = 5,
    n_probe: int = 2,
    shortlist: int = 20,
    k: int = 8,
    n_assign: int = _N_ASSIGN,
    m: int = _M,
    dsub: int = _DSUB,
    ksub: int = _KSUB,
) -> str:
    """Twin of the residual frozen-quantizer ingest flow (r11: ensure
    on the ``fit_pred`` base + append the rest + serve over the
    union): the coarse level fits on the base only, ALL vectors take
    their frozen assignment (``aall``), residuals recenter EVERY
    vector against its frozen centroid (``rlg`` reads aall — for base
    vectors aall ≡ the fit's own final assignment, same centroids,
    same min-cid tie rule), the residual subspace chains fit on the
    base residuals and encode all (``pall_{s}`` → ``pqcodes``), and
    the serve reads those — ingest refits NOTHING, at either level,
    relationally proven."""
    cent_tbl = f"c{n_assign - 1}" if n_assign > 1 else "c0"
    pc = (lambda s: f"pc{n_assign - 1}_{s}" if n_assign > 1 else f"pc0_{s}")
    lut_joins = " ".join(
        f"JOIN ql{s} q{s} ON q{s}.q_id = p.q_id AND q{s}.cid = x.code{s}"
        for s in range(m)
    )
    adc = "qlc.cdot + " + " + ".join(f"q{s}.dot" for s in range(m))
    sql = kmeans_oracle_cte(k=k, n_assign=n_assign, fit_pred=fit_pred)
    sql += f""", dall AS (
  SELECT l.vec_id, c.cid,
         CAST(sum((l.iu - c.cv) * (l.iu - c.cv)) AS BIGINT) AS dist
  FROM lg l JOIN {cent_tbl} c ON c.pos = l.pos GROUP BY 1, 2
), mall AS (SELECT vec_id, min(dist) AS md FROM dall GROUP BY 1),
aall AS (
  SELECT d.vec_id, min(d.cid) AS cid
  FROM dall d JOIN mall ON mall.vec_id = d.vec_id AND d.dist = mall.md
  GROUP BY 1
), rlg AS (
  SELECT l.vec_id, l.pos, l.iu - c.cv AS ru
  FROM lg l
  JOIN aall a ON a.vec_id = l.vec_id
  JOIN {cent_tbl} c ON c.cid = a.cid AND c.pos = l.pos
), riarr AS (
  SELECT vec_id, list(ru ORDER BY pos) AS iu FROM rlg GROUP BY 1
)"""
    sql += _pq_chain_sql(
        m, dsub, ksub, n_assign, fit_pred=fit_pred, tag="rpq", src="riarr"
    )
    for s in range(m):
        lo, hi = s * dsub + 1, (s + 1) * dsub
        sql += f""", lq{s} AS (
  SELECT vec_id, unnest(generate_series(1, {dsub})) AS pos,
         unnest(iu[{lo}:{hi}]) AS su
  FROM iarr WHERE vec_id < {n_queries}
), ql{s} AS (
  SELECT l.vec_id AS q_id, c.cid, CAST(sum(l.su * c.cv) AS BIGINT) AS dot
  FROM lq{s} l JOIN {pc(s)} c ON c.pos = l.pos
  GROUP BY 1, 2
)"""
    sql += f""", qlc AS (
  SELECT l.vec_id AS q_id, c.cid, CAST(sum(l.iu * c.cv) AS BIGINT) AS cdot
  FROM lg l JOIN {cent_tbl} c ON c.pos = l.pos
  WHERE l.vec_id < {n_queries}
  GROUP BY 1, 2
), qd AS (
  SELECT l.vec_id AS q_id, c.cid,
         CAST(sum((l.iu - c.cv) * (l.iu - c.cv)) AS BIGINT) AS cd
  FROM lg l JOIN {cent_tbl} c ON c.pos = l.pos
  WHERE l.vec_id < {n_queries}
  GROUP BY 1, 2
), probes AS (
  SELECT q_id, cid FROM (
    SELECT q_id, cid, row_number() OVER (PARTITION BY q_id ORDER BY cd, cid) AS pr
    FROM qd
  ) WHERE pr <= {n_probe}
), short AS (
  SELECT q_id, c_id FROM (
    SELECT p.q_id, x.vec_id AS c_id,
           row_number() OVER (PARTITION BY p.q_id
                              ORDER BY CAST({adc} AS BIGINT) DESC, x.vec_id)
             AS srk
    FROM probes p
    JOIN aall cell ON cell.cid = p.cid
    JOIN pqcodes x ON x.vec_id = cell.vec_id
    JOIN qlc ON qlc.q_id = p.q_id AND qlc.cid = p.cid
    {lut_joins}
    WHERE x.vec_id <> p.q_id
  ) WHERE srk <= {shortlist}
)
SELECT q_id, c_id, dot_num, rk FROM (
  SELECT s.q_id, s.c_id,
         CAST(list_reduce(list_transform(list_zip(qi.iu, ci.iu),
                                         z -> z[1] * z[2]),
                          (x, y) -> x + y) AS BIGINT) AS dot_num,
         row_number() OVER (PARTITION BY s.q_id
                            ORDER BY CAST(list_reduce(list_transform(
                                list_zip(qi.iu, ci.iu), z -> z[1] * z[2]),
                                (x, y) -> x + y) AS BIGINT) DESC, s.c_id) AS rk
  FROM short s
  JOIN iarr qi ON qi.vec_id = s.q_id
  JOIN iarr ci ON ci.vec_id = s.c_id
) WHERE rk <= {topk}
"""
    return sql


IVF_PQ_RES_INGEST_SQL = ivf_pq_res_ingest_sql()


def pq_code_stats_sql(
    m: int = _M, dsub: int = _DSUB, ksub: int = _KSUB, n_assign: int = _N_ASSIGN
) -> str:
    """Twin of ``pq_code_stats`` — per-subspace occupancy aggregates
    over the same unrolled chains."""
    selects = []
    for s in range(m):
        selects.append(f"""SELECT {s} AS subspace, count(*) AS codes_used,
       CAST(sum(n) AS BIGINT) AS n_vectors,
       CAST(max(n) AS BIGINT) AS max_cell_n,
       CAST(min(n) AS BIGINT) AS min_cell_n,
       CAST(CAST(max(n) AS BIGINT) * 1000000 // CAST(sum(n) AS BIGINT)
            AS BIGINT) AS max_share_ppm
FROM (SELECT cid, count(*) AS n FROM pa{n_assign}_{s} GROUP BY 1)""")
    return (
        kmeans_oracle_cte(k=1, n_assign=1)
        + _pq_chain_sql(m, dsub, ksub, n_assign)
        + "\n"
        + "\nUNION ALL\n".join(selects)
    )


PQ_CODE_STATS_SQL = pq_code_stats_sql()
