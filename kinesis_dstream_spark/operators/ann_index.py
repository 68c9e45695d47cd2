"""Persisted ANN index: cell-partitioned parquet + PQ codes (E-11).

``ann_ivf_pq_topk`` proves the IVF-PQ *computation*; this module gives it
the missing lifecycle for a 100 TB corpus: the encoded corpus is
MATERIALIZED as a parquet table partitioned by coarse cell, so serving a
query batch physically reads only the probed cells' files — Spark's
partition pruning IS the inverted-file index structure. Build once
(one bounded codebook fit + one Arrow encode pass + one partitioned
write), serve many times (each search touches n_probe/n_cells of the
files and reads codes for ADC; float vectors are fetched only for the
re-rank shortlist).

Layout:
    <path>/cell=<i>/*.parquet      vec_id, codes, unit
    <path>/_codebooks.npz          cents (n_cells, dim), books (m, 2^nbits, dim/m)

The ``_``-prefixed sidecar is invisible to Spark's file readers (hidden
path convention), so the directory stays a clean parquet table.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_dstream_spark.functions import vectors as V
from kinesis_dstream_spark.operators.codebook import DEFAULT_TRAIN_CAP, _lloyds
from kinesis_dstream_spark.operators.similarity import _make_adc_udf, _normalized

SIDECAR = "_codebooks.npz"

# Bump when the encode/build layout changes incompatibly: a persisted index
# whose sidecar carries a different version is rebuilt, not served.
INDEX_FORMAT_VERSION = 2


def corpus_fingerprint(embeddings: DataFrame, **build_params) -> str:
    """Content+params fingerprint for build-if-absent staleness detection.

    One cheap aggregate over the corpus (count + order-insensitive XOR of
    per-row xxhash64 over id and vector) combined with the build params
    and the index format version. A stale index — regenerated fixtures,
    changed build params, or a format bump — no longer fingerprint-matches
    and is rebuilt instead of silently served. The scan is a single
    columnar pass; production serving that cannot afford it calls
    ``ann_index_search`` directly and owns lifecycle externally.
    """
    import hashlib

    row = embeddings.agg(
        F.count("*").alias("n"),
        # XOR, not SUM: order-insensitive and cannot overflow under ANSI mode
        F.expr("bit_xor(xxhash64(vec_id, embedding))").alias("h"),
    ).collect()[0]
    params = sorted(build_params.items())
    blob = f"v{INDEX_FORMAT_VERSION}|n={row['n']}|h={row['h']}|{params}"
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def ann_index_build(
    embeddings: DataFrame,
    path: str,
    n_cells: int = 16,
    m: int = 16,
    nbits: int = 4,
    seed: int = 42,
    train_fraction: float = 1.0,
) -> None:
    """Build the cell-partitioned IVF-PQ index at ``path``.

    One bounded driver-side sample trains both codebooks (coarse +
    per-sub-space PQ); one Arrow pass encodes the corpus; one
    partitioned write lays the files out by cell. At 100 TB the write is
    the only full-corpus pass, and it shuffles nothing — partitionBy
    splits each task's output by cell value (n_cells output files per
    task; keep n_cells moderate or repartition("cell") first to bound
    file count).

    Storing ``unit`` beside the codes keeps the re-rank self-contained;
    a production layout would split floats into a colder table — the
    scan path below never reads them except for the shortlist, so the
    I/O behavior already matches that split (parquet column pruning).
    """
    normed = _normalized(embeddings).select("vec_id", "unit")
    cents, books, train_ids = _fit_codebooks(
        normed, n_cells, m, nbits, seed, train_fraction
    )
    _write_encoded(normed, cents, books, path, mode="overwrite")
    fp = corpus_fingerprint(
        embeddings, n_cells=n_cells, m=m, nbits=nbits, seed=seed, train_fraction=train_fraction
    )
    np.savez(
        os.path.join(path, SIDECAR),
        cents=cents,
        books=books,
        fingerprint=np.array(fp),
        train_vec_ids=train_ids,
    )


def _fit_codebooks(
    normed: DataFrame,
    n_cells: int,
    m: int,
    nbits: int,
    seed: int,
    train_fraction: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Bounded-sample fit of coarse + PQ codebooks (shared by build/init).

    Also returns the vec_ids of the training sample — stored in the
    sidecar as model provenance, so erasure audits can PROVE which rows
    the codebooks saw (the refit-after-erasure test asserts no erased
    subject in it)."""
    train = normed.select("vec_id", "unit")
    if train_fraction < 1.0:
        train = train.sample(withReplacement=False, fraction=train_fraction, seed=seed)
    pdf = train.limit(DEFAULT_TRAIN_CAP).toPandas()
    train_ids = pdf["vec_id"].to_numpy().astype("int64")
    sample = np.stack(pdf["unit"].to_numpy())
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"ann_index codebook fit: dim {dim} not divisible by m={m}")
    sub = dim // m
    cents = _lloyds(sample, n_cells, seed)
    books = np.stack(
        [_lloyds(sample[:, j * sub : (j + 1) * sub], 1 << nbits, seed + j) for j in range(m)]
    )
    return cents, books, train_ids


def ann_index_init(
    embeddings: DataFrame,
    path: str,
    n_cells: int = 16,
    m: int = 16,
    nbits: int = 4,
    seed: int = 42,
    train_fraction: float = 1.0,
) -> None:
    """Train codebooks and write ONLY the sidecar — zero rows ingested.

    The streaming-ingest bootstrap: codebooks come from a bounded sample
    of a representative batch corpus (same fit as ``ann_index_build``,
    so a fully-drained streaming ingest is bit-identical to a batch
    build); rows then arrive via ``ann_index_append`` under these frozen
    codebooks. No fingerprint is stored — a growing index has no fixed
    corpus to fingerprint; its lifecycle is owned by the ingest job.
    """
    normed = _normalized(embeddings).select("vec_id", "unit")
    cents, books, train_ids = _fit_codebooks(
        normed, n_cells, m, nbits, seed, train_fraction
    )
    os.makedirs(path, exist_ok=True)
    np.savez(
        os.path.join(path, SIDECAR), cents=cents, books=books, train_vec_ids=train_ids
    )


def _write_encoded(
    normed: DataFrame, cents: np.ndarray, books: np.ndarray, path: str, mode: str
) -> None:
    """Encode (cell + PQ codes) in one Arrow pass and write by cell."""
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    m, _, sub = books.shape
    cent_half = 0.5 * (cents * cents).sum(axis=1)
    book_half = 0.5 * (books * books).sum(axis=2)

    enc_schema = StructType(
        [
            StructField("cell", IntegerType()),
            StructField("codes", ArrayType(IntegerType())),
        ]
    )

    @F.pandas_udf(enc_schema)
    def encode_udf(vecs: pd.Series) -> pd.DataFrame:
        x = np.stack(vecs.to_numpy())
        cell = (x @ cents.T - cent_half).argmax(axis=1).astype("int32")
        parts = x.reshape(len(x), m, sub)
        codes = (np.einsum("bms,mks->bmk", parts, books) - book_half).argmax(axis=2)
        return pd.DataFrame({"cell": cell, "codes": list(codes.astype("int32"))})

    (
        normed.select("vec_id", "unit", encode_udf(F.col("unit")).alias("e"))
        .select("vec_id", "unit", F.col("e.cell").alias("cell"), F.col("e.codes").alias("codes"))
        .write.partitionBy("cell")
        .mode(mode)
        .parquet(path)
    )


def ann_index_append(embeddings: DataFrame, path: str) -> None:
    """Append new vectors to an existing index under its FROZEN codebooks.

    The daily-ingest path: re-training (and re-encoding 100 TB) per batch
    is off the table, so appends reuse the sidecar codebooks — new rows
    land in existing cell directories as additional parquet files.
    Codebook drift (new data far from the trained distribution) degrades
    only pruning efficiency/recall, never the honesty of re-ranked
    scores; re-build when recall telemetry says so. The sidecar is
    untouched, so a crash mid-append leaves a readable index (parquet
    files commit atomically per task; duplicate vec_ids are the caller's
    contract, as with any append-only table).
    """
    blob = np.load(os.path.join(path, SIDECAR))
    normed = _normalized(embeddings).select("vec_id", "unit")
    _write_encoded(normed, blob["cents"], blob["books"], path, mode="append")


def ann_index_compact(
    spark: SparkSession, path: str, max_files_per_cell: int = 4
) -> dict[str, int]:
    """Rewrite cells whose parquet file count exceeds the threshold.

    ``ann_index_append`` adds one file per cell per ingest batch, so a
    daily-append index accumulates unbounded small files — the classic
    streaming-ingest file-count problem. Compaction repartitions each
    oversized cell's rows to a single file and commits via Spark's
    *dynamic* partition overwrite, which replaces ONLY the partitions
    present in the written data; untouched cells' files are never
    rewritten, so compaction cost is bounded by the oversized cells'
    data volume, not the index size. The rows are localCheckpoint-ed
    before the overwrite so the read plan no longer depends on the files
    the commit is about to replace (self-overwrite hazard). Codebooks
    and the sidecar fingerprint are untouched — compaction changes the
    file layout, never the index content (pytest asserts identical
    search results before/after).

    Returns ``{"cells_compacted": n, "files_before": a, "files_after": b}``.
    """
    oversized = [
        int(entry.split("=", 1)[1])
        for entry in os.listdir(path)
        if entry.startswith("cell=")
        and _n_parquet_files(os.path.join(path, entry)) > max_files_per_cell
    ]
    files_before = _n_parquet_files(path)
    if not oversized:
        return {"cells_compacted": 0, "files_before": files_before, "files_after": files_before}

    rows = (
        spark.read.parquet(path)
        .filter(F.col("cell").isin(oversized))
        .repartition("cell")
        .localCheckpoint()
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        rows.write.partitionBy("cell").mode("overwrite").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return {
        "cells_compacted": len(oversized),
        "files_before": files_before,
        "files_after": _n_parquet_files(path),
    }


def _n_parquet_files(root: str) -> int:
    return sum(
        1
        for dirpath, _, names in os.walk(root)
        for f in names
        if f.endswith(".parquet")
    )


def ann_index_search(
    spark: SparkSession,
    path: str,
    n_queries: int = 10,
    k: int = 5,
    n_probe: int = 4,
    oversample: int = 16,
    queries: DataFrame | None = None,
) -> DataFrame:
    """Serve top-k from a built index; scans ONLY the probed cells.

    The probe set (union over the query batch) lands in the scan as a
    partition filter — ``cell IN (...)`` prunes whole directories before
    a byte is read (plan-asserted in pytest). ADC runs on the codes
    column of the pruned scan; the exact re-rank fetches ``unit`` for
    the shortlist rows only, so parquet column pruning keeps float
    vectors out of the wide scan entirely.

    By default queries are taken from the index itself (vec_id <
    n_queries) to stay self-contained and oracle-comparable; the
    production entry point passes ``queries`` — an external (q_id,
    embedding) batch, normalized here, identical physics from the probe
    ranking on. The query batch is collected to the driver by contract
    (it is the small side — LUTs ship in the UDF closure), so callers
    keep batches to control-plane size and loop over mega-batches.
    """
    blob = np.load(os.path.join(path, SIDECAR))
    cents, books = blob["cents"], blob["books"]
    m = books.shape[0]
    sub = books.shape[2]

    index = spark.read.parquet(path)
    if queries is None:
        q_rows = (
            index.filter(F.col("vec_id") < n_queries)
            .select("vec_id", "unit")
            .toPandas()
            .sort_values("vec_id")
        )
    else:
        q_rows = (
            queries.select(
                F.col("q_id").alias("vec_id"),
                V.l2_normalize(F.col("embedding").cast("array<double>")).alias("unit"),
            )
            .toPandas()
            .sort_values("vec_id")
        )
    q_mat = np.stack(q_rows["unit"].to_numpy())
    q_ids = q_rows["vec_id"].to_numpy()
    probe_order = np.argsort(-(q_mat @ cents.T), axis=1, kind="stable")[:, :n_probe]
    luts = np.einsum("qms,mks->qmk", q_mat.reshape(len(q_rows), m, sub), books)
    adc_udf = _make_adc_udf({int(qid): luts[i] for i, qid in enumerate(q_ids)}, m)

    probes = spark.createDataFrame(
        [
            (int(qid), int(cell))
            for i, qid in enumerate(q_ids)
            for cell in probe_order[i]
        ],
        "q_id int, q_cell int",
    )
    probed_cells = sorted({int(c) for row in probe_order for c in row})

    # partition-pruned scan: only probed cells' directories are listed/read.
    # Self-queries exclude the query row itself; external query ids live in
    # their own id space, so no exclusion applies there.
    join_cond = F.col("cell") == F.col("q_cell")
    if queries is None:
        join_cond = join_cond & (F.col("vec_id") != F.col("q_id"))
    pruned = index.filter(F.col("cell").isin(probed_cells))
    adc = (
        pruned.select("vec_id", "cell", "codes")
        .join(F.broadcast(probes), join_cond)
        .select(
            "q_id",
            F.col("vec_id").alias("c_id"),
            adc_udf(F.col("q_id"), F.col("codes")).alias("approx_cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("approx_cos").desc(), F.col("c_id").asc())
    shortlist = (
        adc.withColumn("adc_rk", F.row_number().over(w))
        .filter(F.col("adc_rk") <= k * oversample)
        .select("q_id", "c_id")
    )
    q_units = spark.createDataFrame(
        [(int(qid), [float(v) for v in vec]) for qid, vec in zip(q_ids, q_mat)],
        "q_id int, q_unit array<double>",
    )
    rescored = (
        pruned.select(F.col("vec_id").alias("c_id"), F.col("unit").alias("c_unit"))
        .join(F.broadcast(shortlist), "c_id")
        .join(F.broadcast(q_units), "q_id")
        .select(
            "q_id",
            "c_id",
            F.round(V.dot(F.col("q_unit"), F.col("c_unit")), 4).alias("cos_sim"),
        )
    )
    w2 = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("c_id").asc())
    return (
        rescored.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
        .select("q_id", "c_id", "cos_sim", "rk")
    )


# Control-plane cap for one serve call: the query batch is collected to
# the driver by contract (LUTs ship in the UDF closure), so a single
# ann_index_search call must stay driver-sized. Mega-batches go through
# ann_index_search_batched, which chunks to this bound and unions.
QUERY_BATCH_ROWS = 4096


def ann_index_search_batched(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    oversample: int = 16,
    batch_rows: int = QUERY_BATCH_ROWS,
) -> DataFrame:
    """Serve an arbitrarily large query batch by control-plane chunks.

    ``ann_index_search`` collects its query batch to the driver by
    documented contract; this is the loop that contract presumes.
    The query set is split into ``ceil(n / batch_rows)`` chunks keyed
    by ``xxhash64(q_id) mod n_chunks`` (deterministic, balanced w.h.p.
    for arbitrary id spaces — no global sort of the query set), each
    chunk is served through the standard partition-pruned path, and the
    per-chunk results are unioned. Search is per-q_id independent, so
    the union is IDENTICAL to a single oversized call (pytest pins a
    batch larger than the cap against the single-batch result).

    Scale shape: driver memory is bounded by one chunk (≤ ~batch_rows
    rows of unit vectors + LUTs) regardless of total query count; the
    corpus side stays partition-pruned per chunk. The loop is
    driver-paced by design — each chunk's probe set must reach the
    driver to become a partition filter.
    """
    n = queries.count()  # control-plane scalar
    if n == 0:
        return ann_index_search(spark, path, k=k, n_probe=n_probe,
                                oversample=oversample, queries=queries)
    n_chunks = -(-n // batch_rows)
    if n_chunks == 1:
        return ann_index_search(spark, path, k=k, n_probe=n_probe,
                                oversample=oversample, queries=queries)
    chunked = queries.withColumn(
        "_chunk", F.pmod(F.xxhash64(F.col("q_id")), F.lit(n_chunks))
    )
    parts = []
    for b in range(n_chunks):
        part = chunked.filter(F.col("_chunk") == b).drop("_chunk")
        parts.append(
            ann_index_search(
                spark, path, k=k, n_probe=n_probe,
                oversample=oversample, queries=part,
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def ann_index_ensure(embeddings: DataFrame, index_path: str, **kwargs) -> None:
    """Build-if-absent with staleness detection.

    The sidecar's presence marks a completed build (it is written last,
    after the parquet commit), so a partial/failed build re-runs. The
    sidecar also carries a corpus+params fingerprint: an index left over
    from regenerated fixtures, different build params, or an older index
    format fingerprint-mismatches and is rebuilt rather than silently
    served stale.
    """
    build_defaults = {"n_cells": 16, "m": 16, "nbits": 4, "seed": 42, "train_fraction": 1.0}
    build_params = {
        kw: kwargs.get(kw, default) for kw, default in build_defaults.items()
    }
    expected_fp = corpus_fingerprint(embeddings, **build_params)
    sidecar = os.path.join(index_path, SIDECAR)
    stored_fp = None
    if os.path.exists(sidecar):
        blob = np.load(sidecar)
        stored_fp = str(blob["fingerprint"]) if "fingerprint" in blob.files else None
    if stored_fp != expected_fp:
        ann_index_build(embeddings, index_path, **build_params)


def ann_index_invalidate_codebooks(path: str) -> None:
    """Erasure hook: poison the sidecar fingerprint so the NEXT
    ``ann_index_ensure`` refits the codebooks on the post-erasure
    corpus.

    Row erasure removes a subject's vectors and codes, but the
    centroids/codebooks are aggregate statistics fitted over a sample
    that may have included them — a strict right-to-be-forgotten
    reading wants the model parameters retrained, not footnoted.
    Invalidating (rather than refitting inline) keeps erasure itself a
    bounded scan-and-rewrite and makes the retrain land on the normal
    build-if-absent path; cents/books stay readable meanwhile, so
    read-only serving degrades to "stale-model, erased-rows" instead of
    going dark — the same contract as post-append drift awaiting its
    recall-telemetry rebuild. The sentinel can never equal a real
    corpus fingerprint (hex-only alphabet), so the rebuild is
    unconditional.
    """
    sidecar = os.path.join(path, SIDECAR)
    blob = np.load(sidecar)
    data = {k: blob[k] for k in blob.files}
    data["fingerprint"] = np.array("invalidated-by-erasure")
    np.savez(sidecar, **data)


def ann_index_recall_probe(
    spark: SparkSession,
    embeddings: DataFrame,
    path: str,
    n_queries: int = 20,
    k: int = 5,
    n_probe: int = 4,
    oversample: int = 16,
) -> DataFrame:
    """Serving-recall telemetry: recall@k of the persisted index vs the
    exact brute-force answer on a bounded self-query sample.

    The append path freezes codebooks, so distribution drift silently
    degrades recall — the documented rebuild trigger is "recall
    telemetry says so", and this operator IS that telemetry: run it
    after ingest windows, alert/rebuild when recall_at_k drops below the
    SLO. Cost is bounded: the exact side is a brute-force pass for
    n_queries queries only (broadcast query side, corpus scanned once),
    the approx side is the standard partition-pruned serve.

    Returns one row: (n_queries, k, n_probe, n_hits, n_exact,
    recall_at_k).
    """
    from kinesis_dstream_spark.operators.similarity import ann_bruteforce_topk

    approx = ann_index_search(
        spark, path, n_queries=n_queries, k=k, n_probe=n_probe, oversample=oversample
    ).select("q_id", "c_id")
    exact = ann_bruteforce_topk(embeddings, n_queries=n_queries, k=k).select(
        "q_id", "c_id"
    )
    hits = approx.join(exact, ["q_id", "c_id"]).agg(F.count("*").alias("n_hits"))
    totals = exact.agg(F.count("*").alias("n_exact"))
    return hits.crossJoin(totals).select(
        F.lit(n_queries).alias("n_queries"),
        F.lit(k).alias("k"),
        F.lit(n_probe).alias("n_probe"),
        "n_hits",
        "n_exact",
        F.round(F.col("n_hits") / F.col("n_exact"), 4).alias("recall_at_k"),
    )


def ann_index_topk(
    embeddings: DataFrame,
    index_path: str,
    n_queries: int = 10,
    k: int = 5,
    **kwargs,
) -> DataFrame:
    """Build-if-absent then search — the registry/bench entry point
    (see ``ann_index_ensure`` for the staleness contract)."""
    ann_index_ensure(embeddings, index_path, **kwargs)
    search_keys = {"n_probe", "oversample"}
    return ann_index_search(
        embeddings.sparkSession,
        index_path,
        n_queries=n_queries,
        k=k,
        **{kw: v for kw, v in kwargs.items() if kw in search_keys},
    )
