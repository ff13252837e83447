"""In-engine linear algebra over embedding columns: the top principal
component of the corpus embedding cloud by power iteration — the "what
single direction explains this embedding space" probe behind drift
monitoring, whitening decisions, and ANN index diagnostics.

Split of labor (the kmeans_train pattern): the DATA-SCALE work — second
moments S = Σ xᵀx and first moments T — runs as ONE Arrow-batched
mapInPandas pass emitting a d²-sized integer partial per batch (numpy
int64 matmul; exact and order-free, so partials from any partitioning sum
to the same totals — map-side combine by construction). The d×d matrix
those sums define is METADATA (64×64 here), so the 3-iteration power
method runs on the collected partials driver-side, exactly like
broadcasting centroids. Nothing quadratic-in-rows ever forms; at 100 TB
the only big pass is the single scan, and driver traffic is one
(d², d, 1) triple per batch. (An earlier pure-DataFrame formulation
exploded d(d+1)/2 product rows per vector — 10M+ rows at sf0.1 — and ran
5× slower; the partial-aggregation shape is the scalable one.)

Determinism: embeddings are float32; each value is quantized to the 1e-4
grid (the quantization is exact-product: a float32 payload times 10⁴ is an
exact double, and no float32 equals an odd multiple of 1/2·10⁻⁴, so no
rounding ties exist). All moments are then exact integers (decimal(38,0));
covariance entries are a fixed 3-op double sequence; and every float
reduction in the iteration (mat-vec, norms, Rayleigh quotient) is an
EXPLICIT ascending fold, mirrored op-for-op by the SQL oracle's
list_reduce — so eigenvalue AND loadings are bit-identical across engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10_000


def _fold(terms):
    """Left fold starting FROM THE FIRST ELEMENT (list_reduce semantics —
    not sum(), whose 0-start would differ by one op)."""
    acc = terms[0]
    for t in terms[1:]:
        acc = acc + t
    return acc


def pca_top_component(
    embeddings: DataFrame,
    dim: int = 64,
    iterations: int = 3,
    vec_col: str = "embedding",
) -> DataFrame:
    """Top eigenpair of the (centered) covariance of the embedding column:
    one row per dimension i with (i, loading, eigenvalue, n). Power
    iteration from v=[1,…,1], `iterations` mat-vec+normalize steps, then
    the Rayleigh quotient; eigenvalue reported in (unquantized) value²
    units. Loadings have the deterministic sign the fixed start vector
    induces."""
    import numpy as np
    import pandas as pd

    spark = embeddings.sparkSession
    xq = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * F.lit(SCALE)).cast("long"),
    )
    src = embeddings.select(xq.alias("xq"))

    def partial_moments(batches):
        """Per-Arrow-batch integer partials: S (d×d second moments), T
        (first moments), n. Exact int64 (order-free), so partials from
        any partitioning sum to the same totals — the map-side-combine
        shape that keeps the moment pass one scan with a d²-sized
        shuffle, instead of exploding d²/2 rows per vector."""
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["xq"].to_numpy()).astype(np.int64)
            st = x.T @ x  # d×d int64, |xq|<=1e4 -> safe for ~9e10 rows/batch
            yield pd.DataFrame(
                {
                    "s_flat": [st.flatten().tolist()],
                    "t_vec": [x.sum(axis=0).tolist()],
                    "n": [int(len(pdf))],
                }
            )

    parts = src.mapInPandas(
        partial_moments, "s_flat array<long>, t_vec array<long>, n long"
    ).collect()
    # metadata-scale collect: one (d², d, 1) triple per Arrow batch
    n = sum(r["n"] for r in parts)
    s_tot = [0] * (dim * dim)
    t_tot = [0] * dim
    for r in parts:
        for k, v in enumerate(r["s_flat"]):
            s_tot[k] += v
        for k, v in enumerate(r["t_vec"]):
            t_tot[k] += v
    t = [float(v) for v in t_tot]
    c = [0.0] * (dim * dim)
    for i in range(dim):
        for j in range(dim):
            c[i * dim + j] = float(s_tot[i * dim + j]) - t[i] * t[j] / float(n)

    v = [1.0] * dim
    for _ in range(iterations):
        w = [_fold([c[i * dim + j] * v[j] for j in range(dim)]) for i in range(dim)]
        norm = math.sqrt(_fold([x * x for x in w]))
        v = [x / norm for x in w]
    lam = _fold(
        [
            v[i] * _fold([c[i * dim + j] * v[j] for j in range(dim)])
            for i in range(dim)
        ]
    )
    eig = lam / float(SCALE * SCALE)
    return spark.createDataFrame(
        [(i, v[i], eig, n) for i in range(dim)],
        "i long, loading double, eigenvalue double, n long",
    )
