"""Persisted near-dup PAIRS artifact — build once, consume everywhere.

Five headline queries consume the same n-gram-Jaccard pair list
(``dedup.dedup_ngram_jaccard``): connected components (both the
min-label and large-star/small-star variants), keep-best survivorship,
PageRank over the near-dup graph, and the graph structural stats. Each
used to re-derive the pair join from raw text per query — correct, but
the single most expensive stage in the repo's bench paid four extra
times. This module persists the pair list as a parquet artifact under
the build-if-absent + fingerprint-staleness convention set by
``ann_index`` / ``dedup_index``: the meta sidecar is written LAST (its
presence marks a complete build) and carries a corpus+params
fingerprint, so regenerated fixtures or changed thresholds trigger a
rebuild rather than silently serving stale pairs.

Scale shape (100 TB): the pair list is the banded/capped-inverted-index
join output — already the scale-safe shape — and is tiny relative to
the corpus (near-dup pairs, not all pairs). Persisting it converts the
consumers from "re-run the corpus-wide shingle join" to "scan a small
parquet table": exactly the materialized-intermediate pattern a
production curation pipeline runs (pairs are built once per corpus
snapshot, then every downstream decision — clustering, survivorship,
ranking — reads the artifact).

Correctness is unchanged by construction: consumers receive the same
rows ``dedup_ngram_jaccard`` returns (pytest pins artifact == live
computation; the DuckDB oracles already recompute pairs from raw text).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (re-export convenience)

from kinesis_dstream_spark import stores
from kinesis_dstream_spark.operators.dedup import dedup_ngram_jaccard
from kinesis_dstream_spark.operators.dedup_index import corpus_fingerprint

META = "_meta.json"


def near_dup_pairs_ensure(
    documents: DataFrame,
    path: str,
    k: int = 3,
    threshold: float = 0.6,
    max_df: int | None = None,
) -> DataFrame:
    """Return the persisted (doc_a, doc_b, jaccard) pair list, building
    it if absent or stale.

    Fingerprint = corpus content hash + sketch params (the
    ``dedup_index`` convention): any change to the fixture or the
    pair-defining params rebuilds; a matching fingerprint serves the
    parquet artifact with zero recomputation.
    """
    fp = corpus_fingerprint(documents, k=k, threshold=threshold, max_df=max_df)
    pairs_path = os.path.join(path, "pairs")
    meta = stores.read_meta(path, META)
    if meta is None or meta.get("fingerprint") != fp:
        # poison-first + atomic-write-last (stores.py seam, r10): a
        # crash mid-rebuild leaves a detectably-incomplete artifact
        stores.remove_meta(path, META)
        pairs = dedup_ngram_jaccard(documents, k=k, threshold=threshold, max_df=max_df)
        pairs.write.mode("overwrite").parquet(pairs_path)
        stores.write_meta(
            path,
            {"fingerprint": fp, "k": k, "threshold": threshold, "max_df": max_df},
            META,
        )
    return documents.sparkSession.read.parquet(pairs_path)


def setsim_pairs_ensure(
    documents: DataFrame,
    path: str,
    k: int = 3,
    t_num: int = 3,
    t_den: int = 5,
) -> DataFrame:
    """Persisted twin of ``dedup.dedup_setsim_prefix`` — the SECOND
    pair generator the agreement report consumes (r9-verdict task 4:
    the report's dominant cost was recomputing both live generators on
    every call even when their artifacts were fresh). Same
    build-if-absent + fingerprint + poison-first/atomic-meta-last
    discipline as the n-gram artifact above; the stored rows are
    exactly the operator's output, so consumers and oracles are
    unchanged by construction."""
    from kinesis_dstream_spark.operators.dedup import dedup_setsim_prefix

    fp = corpus_fingerprint(
        documents, gen="setsim_prefix", k=k, t_num=t_num, t_den=t_den
    )
    pairs_path = os.path.join(path, "pairs")
    meta = stores.read_meta(path, META)
    if meta is None or meta.get("fingerprint") != fp:
        stores.remove_meta(path, META)
        dedup_setsim_prefix(documents, k=k, t_num=t_num, t_den=t_den).write.mode(
            "overwrite"
        ).parquet(pairs_path)
        stores.write_meta(
            path,
            {"fingerprint": fp, "k": k, "t_num": t_num, "t_den": t_den},
            META,
        )
    return documents.sparkSession.read.parquet(pairs_path)


def near_dup_pairs_fresh(
    documents: DataFrame,
    path: str,
    k: int = 3,
    threshold: float = 0.6,
    max_df: int | None = None,
) -> bool:
    """True iff the artifact at ``path`` is complete AND fingerprint-
    matches this corpus+params — the staleness probe consumers use to
    decide between serving the artifact and recomputing live (see
    ``dedup.near_dup_generator_agreement``). Read-only: never builds."""
    meta = stores.read_meta(path, META)
    return meta is not None and meta.get("fingerprint") == corpus_fingerprint(
        documents, k=k, threshold=threshold, max_df=max_df
    )
