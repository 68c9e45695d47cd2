"""Sample-bounded k-means codebook training shared by the vector ops.

Both coarse quantizers in this package (`dedup_embedding_cosine`'s
metric-pruned cells, `ann_ivf_topk`'s IVF cells) need a k-means codebook
whose QUALITY affects only pruning/recall — never correctness (both
operators verify every candidate exactly, and the IVF recall bound is
pytest-checked). Training therefore must not cost full-corpus passes:
each Lloyd's iteration over an unbounded input is a full Spark job, five
of them at 100 TB before any real work starts.

`fit_sampled_kmeans` bounds that cost structurally AND avoids the
per-iteration job-scheduling tax: the fit input is
`sample(fraction).limit(cap)` — a one-pass, early-terminating scan whose
row count is ≤ cap regardless of corpus size — collected to the driver
(≤ cap × dim doubles: tens of MB, the same control-plane budget as the
centroid table itself) where kmeans++ init and the Lloyd's iterations
run as in-memory numpy matmuls. This is the faiss/IVF training shape:
sample → local train → broadcast centroids. The full corpus is then
assigned in ONE Arrow pass by `assign_cells` (centroids ride the UDF
closure; argmin ‖x−c‖² computed as argmax x·c − ‖c‖²/2, one matmul per
batch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_TRAIN_CAP = 100_000


def fit_sampled_kmeans(
    df: DataFrame,
    k: int,
    seed: int,
    max_iter: int = 5,
    features_col: str = "unit",
    train_fraction: float = 1.0,
    train_cap: int = DEFAULT_TRAIN_CAP,
) -> np.ndarray:
    """Train a (k, dim) codebook on a bounded sample of ``df``.

    ``train_fraction`` is the Bernoulli pre-sample (set ≪ 1 at corpus
    scale so the limit's early-termination kicks in after a sparse
    scan); ``train_cap`` is the hard row bound the driver ever holds.
    At fixture scale the defaults (1.0, 1e5) make the sample the whole
    corpus, so tests stay deterministic. Returns the centroid matrix;
    assign the full corpus with ``assign_cells`` (one Arrow pass).

    Deterministic for a fixed input: seeded kmeans++ init, vectorized
    Lloyd's; an emptied cluster keeps its previous position.
    """
    train = df.select(features_col)
    if train_fraction < 1.0:
        train = train.sample(withReplacement=False, fraction=train_fraction, seed=seed)
    pdf = train.limit(train_cap).toPandas()
    x = np.stack(pdf[features_col].to_numpy()).astype(np.float64)
    return _lloyds(x, k, seed, max_iter)


def _lloyds(x: np.ndarray, k: int, seed: int, max_iter: int = 5) -> np.ndarray:
    """Seeded kmeans++ init + vectorized Lloyd's over an in-memory (n,
    dim) sample; shared by the cell codebooks and the per-sub-space PQ
    codebooks. An emptied cluster keeps its previous position."""
    n = len(x)
    k = min(k, n)
    rng = np.random.RandomState(seed)

    # kmeans++ seeding: spread initial centroids ∝ squared distance
    chosen = [int(rng.randint(n))]
    d2 = ((x - x[chosen[0]]) ** 2).sum(axis=1)
    for _ in range(1, k):
        total = float(d2.sum())
        if total <= 0:  # all points identical — any choice works
            chosen.append(int(rng.randint(n)))
        else:
            chosen.append(int(rng.choice(n, p=d2 / total)))
        d2 = np.minimum(d2, ((x - x[chosen[-1]]) ** 2).sum(axis=1))
    centroids = x[chosen].copy()

    for _ in range(max_iter):
        # argmin ‖x−c‖² == argmax x·c − ‖c‖²/2 (‖x‖² is constant per row)
        labels = (x @ centroids.T - 0.5 * (centroids * centroids).sum(axis=1)).argmax(
            axis=1
        )
        for j in range(k):
            members = labels == j
            if members.any():
                centroids[j] = x[members].mean(axis=0)
    return centroids


def assign_cells(
    df: DataFrame,
    centroids: np.ndarray,
    features_col: str = "unit",
    out_col: str = "cell",
) -> DataFrame:
    """Nearest-centroid cell id per row — one Arrow matmul per batch.

    The (k, dim) codebook rides the UDF closure (kilobytes — task-binary
    broadcast), so assignment is a single narrow pass over the corpus
    with no shuffle and no ML-pipeline column conversions.
    """
    from pyspark.sql.types import IntegerType

    c = np.asarray(centroids, dtype=np.float64)
    half_norms = 0.5 * (c * c).sum(axis=1)

    @F.pandas_udf(IntegerType())
    def cell_udf(vecs: pd.Series) -> pd.Series:
        x = np.stack(vecs.to_numpy())
        return pd.Series((x @ c.T - half_norms).argmax(axis=1).astype("int32"))

    return df.withColumn(out_col, cell_udf(F.col(features_col)))
