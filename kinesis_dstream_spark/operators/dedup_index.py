"""Persisted MinHash-LSH dedup index: near-dup checks against HISTORY.

``dedup_minhash_lsh`` finds near-dup pairs *within* one corpus pass; a
production ingest pipeline needs the other shape — "is this NEW batch a
near-duplicate of anything we already ingested, possibly 100 TB ago?" —
without rescanning history per batch. This module persists the two
artifacts LSH needs (band buckets + hashed shingle sets) as parquet and
makes the per-batch check a broadcast join against them:

    <path>/bands/     (band_hash long, doc_id long)   candidate index
    <path>/shingles/  (doc_id long, shingles array<long>)  verify store
    <path>/_meta.json sketch params (k, bands, rows_per_band, seed) —
                      written LAST, so its presence marks a complete
                      build (the ann_index sidecar convention)

Scale shape of the per-batch check: the NEW side is a micro-batch
(small by contract) — its band hashes and shingle sets broadcast; the
band table is scanned once with a broadcast hash join (no shuffle of
history, no state in the streaming engine), and the shingle store is
touched only for the candidate doc_ids (column-pruned, id equi-join).
Appends add one file per table per batch — the same small-files growth
``ann_index_compact`` bounds for the ANN index; at production scale the
band table gains a date-partitioned layout and periodic compaction.

Output pairs are exact-Jaccard verified (the sketch affects only
recall), so scores are always honest. Sketch params are frozen in the
meta sidecar: every append/check reuses them, because band hashes
computed under different seeds never collide with history.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_dstream_spark.operators.dedup import (
    _shingle_hash_sets,
    minhash_signatures_from_shingles,
)

META = "_meta.json"


def _band_rows(documents: DataFrame, k: int, bands: int, rows_per_band: int, seed: int):
    """(doc_id, band_hash) + (doc_id, shingles) under the given params."""
    sh = _shingle_hash_sets(documents, k)
    sigs = minhash_signatures_from_shingles(sh, bands * rows_per_band, seed)
    band_rows = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.hash(
                        F.lit(b),
                        *[
                            F.col("sig")[b * rows_per_band + r]
                            for r in range(rows_per_band)
                        ],
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_hash"),
    )
    return band_rows, sh


def corpus_fingerprint(documents: DataFrame, **params) -> str:
    """Content+params fingerprint (the ann_index convention): a stale
    index from regenerated fixtures or changed sketch params is rebuilt
    by ``dedup_index_search_self``, never silently served."""
    import hashlib

    row = documents.agg(
        F.count("*").alias("n"),
        F.expr("bit_xor(xxhash64(doc_id, text))").alias("h"),
    ).collect()[0]
    blob = f"n={row['n']}|h={row['h']}|{sorted(params.items())}"
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def dedup_index_build(
    documents: DataFrame,
    path: str,
    k: int = 3,
    bands: int = 8,
    rows_per_band: int = 4,
    seed: int = 42,
    fingerprint: str | None = None,
) -> None:
    """Materialize band buckets + shingle store; meta written last."""
    band_rows, sh = _band_rows(documents, k, bands, rows_per_band, seed)
    band_rows.write.mode("overwrite").parquet(os.path.join(path, "bands"))
    sh.write.mode("overwrite").parquet(os.path.join(path, "shingles"))
    meta = {"k": k, "bands": bands, "rows_per_band": rows_per_band, "seed": seed}
    if fingerprint is not None:
        meta["fingerprint"] = fingerprint
    with open(os.path.join(path, META), "w") as f:
        json.dump(meta, f)


def _meta(path: str) -> dict:
    with open(os.path.join(path, META)) as f:
        return json.load(f)


def dedup_index_check(
    new_docs: DataFrame, path: str, threshold: float = 0.6
) -> DataFrame:
    """Near-dup check of a new batch against the indexed history.

    Returns (new_doc_id, dup_doc_id, jaccard) for every new document
    whose exact shingle Jaccard with an indexed document clears the
    threshold (candidates via band-bucket collision, so recall is the
    LSH S-curve; scores are exact). The new side broadcasts; history is
    never shuffled.
    """
    spark = new_docs.sparkSession
    m = _meta(path)
    new_bands, new_sh = _band_rows(
        new_docs, m["k"], m["bands"], m["rows_per_band"], m["seed"]
    )
    hist_bands = spark.read.parquet(os.path.join(path, "bands"))
    candidates = (
        hist_bands.join(
            F.broadcast(new_bands.select(F.col("doc_id").alias("new_id"), "band_hash")),
            "band_hash",
        )
        .select(F.col("new_id"), F.col("doc_id").alias("hist_id"))
        .dropDuplicates(["new_id", "hist_id"])
    )
    hist_sh = spark.read.parquet(os.path.join(path, "shingles"))
    verified = candidates.join(
        hist_sh.select(F.col("doc_id").alias("hist_id"), F.col("shingles").alias("sh_h")),
        "hist_id",
    ).join(
        F.broadcast(
            new_sh.select(F.col("doc_id").alias("new_id"), F.col("shingles").alias("sh_n"))
        ),
        "new_id",
    )
    n_inter = F.size(F.array_intersect("sh_n", "sh_h"))
    jac = F.round(n_inter / (F.size("sh_n") + F.size("sh_h") - n_inter), 6)
    return (
        verified.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("new_id").alias("new_doc_id"),
            F.col("hist_id").alias("dup_doc_id"),
            "jaccard",
        )
    )


def dedup_index_append(new_docs: DataFrame, path: str) -> None:
    """Add a batch to the index under the FROZEN sketch params."""
    m = _meta(path)
    band_rows, sh = _band_rows(new_docs, m["k"], m["bands"], m["rows_per_band"], m["seed"])
    band_rows.write.mode("append").parquet(os.path.join(path, "bands"))
    sh.write.mode("append").parquet(os.path.join(path, "shingles"))


def dedup_index_ingest(
    new_docs: DataFrame, path: str, threshold: float = 0.6
) -> DataFrame:
    """Check-then-append: flag near-dups of history, append only the
    novel documents (the standard ingest-dedup contract), and return
    the flagged pairs. Replay-safe the same way the ANN ingest is: a
    re-delivered batch's documents match their already-appended twins
    at jaccard 1.0 and are not re-appended.
    """
    dups = dedup_index_check(new_docs, path, threshold)
    # localCheckpoint: the anti-join below AND the returned DataFrame
    # both consume `dups`; materializing once also pins the check
    # against the pre-append index state (an un-checkpointed lazy plan
    # re-read after the append would see the batch's own rows).
    dups = dups.localCheckpoint()
    novel = new_docs.join(
        dups.select(F.col("new_doc_id").alias("doc_id")).distinct(),
        "doc_id",
        "left_anti",
    )
    dedup_index_append(novel, path)
    return dups


def dedup_index_compact(
    spark: SparkSession, path: str, max_files: int = 8
) -> dict[str, int]:
    """Bound the per-append file growth: rewrite each sub-table whose
    parquet file count exceeds the threshold down to its shuffle-
    partition count. localCheckpoint breaks the read dependency before
    the overwrite (the ann_index_compact convention); check results are
    identical before/after (pytest)."""
    from kinesis_dstream_spark.operators.ann_index import _n_parquet_files

    stats = {"tables_compacted": 0, "files_before": 0, "files_after": 0}
    for sub in ("bands", "shingles"):
        d = os.path.join(path, sub)
        n = _n_parquet_files(d)
        stats["files_before"] += n
        if n <= max_files:
            stats["files_after"] += n
            continue
        rows = spark.read.parquet(d).repartition(max_files).localCheckpoint()
        rows.write.mode("overwrite").parquet(d)
        stats["tables_compacted"] += 1
        stats["files_after"] += _n_parquet_files(d)
    return stats


def dedup_index_search_self(
    documents: DataFrame, path: str, n_check: int = 50, threshold: float = 0.5
) -> DataFrame:
    """Registry entry: build-if-absent on even doc_ids, check the first
    ``n_check`` odd doc_ids against it — deterministic end-to-end run of
    the build→check lifecycle on one fixture. Fingerprint-validated:
    regenerated fixtures or changed params trigger a rebuild."""
    hist = documents.filter(F.col("doc_id") % 2 == 0)
    fp = corpus_fingerprint(hist)
    meta_path = os.path.join(path, META)
    stored = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            stored = json.load(f).get("fingerprint")
    if stored != fp:
        dedup_index_build(hist, path, fingerprint=fp)
    probe = documents.filter(
        (F.col("doc_id") % 2 == 1) & (F.col("doc_id") < 2 * n_check)
    )
    return dedup_index_check(probe, path, threshold)
