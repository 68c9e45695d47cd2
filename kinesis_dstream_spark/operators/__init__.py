"""Operator library.

Modules:

- ``reference_ops`` — the reference's own operator semantics (SURVEY §2A)
  re-expressed on batch DataFrames: event-time window scan, existence
  predicate, projection, limit/pagination, changelog-latest-state,
  micro-batch tumbling aggregation, text-scan parse.
- ``relational`` — the batch relational core (SURVEY §2B E-1..E-8):
  joins, aggregation, window functions, top-k, set ops, scalar functions.
- ``dedup`` — exact + near-duplicate detection (E-10).
- ``similarity`` — embedding similarity search (E-11).
- ``text`` — language-ID, quality scoring, token counting, fingerprints,
  tf-idf (E-12).
- ``multimodal`` — binary-column plumbing + decode stubs (E-13).
- ``curation`` — corpus-curation stages: quality gates, contamination
  (shingle + embedding-space), domain mix, packing (E-12).
- ``bpe`` — learned-merge BPE tokenizer (E-12).
- ``codebook`` — bounded-sample k-means codebooks shared by the
  IVF/PQ/cell-pruning families.
- ``ann_index`` / ``dedup_index`` — persisted, partition-pruned serving
  indexes with append/compaction lifecycles (E-11/E-10).
- ``sketches`` — mergeable HLL / count-min telemetry (E-4 at scale).
- ``layout`` — z-order multi-dimensional file-skipping layout (E-1/E-6).
- ``udfs`` — the UDF surface exhibits (E-14).
"""
