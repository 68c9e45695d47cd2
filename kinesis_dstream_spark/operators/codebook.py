"""Sample-bounded k-means codebook training shared by the vector ops.

Both coarse quantizers in this package (`dedup_embedding_cosine`'s
metric-pruned cells, `ann_ivf_topk`'s IVF cells) need a k-means codebook
whose QUALITY affects only pruning/recall — never correctness (both
operators verify every candidate exactly, and the IVF recall bound is
pytest-checked). Training therefore must not cost full-corpus passes:
each Lloyd's iteration over an unbounded input is a full Spark job, five
of them at 100 TB before any real work starts.

`fit_sampled_kmeans` bounds that cost structurally: the fit input is
`sample(fraction).limit(cap)` — a one-pass, early-terminating scan whose
row count is ≤ cap regardless of corpus size — coalesced to a handful of
partitions (k×cap rows are kilobytes-to-megabytes; 32-task scheduling
overhead would dominate the arithmetic) and cached so the 5 Lloyd's
iterations re-read memory, not parquet. The full corpus is then assigned
in ONE `model.transform` pass by the caller.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DEFAULT_TRAIN_CAP = 100_000


def fit_sampled_kmeans(
    df: DataFrame,
    k: int,
    seed: int,
    max_iter: int = 5,
    features_col: str = "features",
    train_fraction: float = 1.0,
    train_cap: int = DEFAULT_TRAIN_CAP,
):
    """Fit Spark ML KMeans on a bounded sample of ``df``.

    ``train_fraction`` is the Bernoulli pre-sample (set ≪ 1 at corpus
    scale so the limit's early-termination kicks in after a sparse
    scan); ``train_cap`` is the hard row bound the fit can never exceed.
    At fixture scale the defaults (1.0, 1e5) make the sample the whole
    corpus, so tests stay deterministic. Returns the fitted model; the
    caller assigns the full corpus with ``model.transform`` (one pass).
    """
    from pyspark.ml.clustering import KMeans

    train = df.select(features_col)
    if train_fraction < 1.0:
        train = train.sample(withReplacement=False, fraction=train_fraction, seed=seed)
    train = train.limit(train_cap).coalesce(4).cache()
    try:
        return KMeans(
            k=k, seed=seed, maxIter=max_iter, featuresCol=features_col
        ).fit(train)
    finally:
        train.unpersist()
