"""In-engine linear algebra over embedding columns: the top principal
component of the corpus embedding cloud by power iteration — the "what
single direction explains this embedding space" probe behind drift
monitoring, whitening decisions, and ANN index diagnostics.

Split of labor (the kmeans_train pattern): the DATA-SCALE work — second
moments S_ij = Σ x_i·x_j and first moments T_i — is one exploded
map-side-combined groupBy over the corpus; the d×d matrix those sums
define is METADATA (64×64 here), so the 3-iteration power method runs on
the collected matrix driver-side, exactly like broadcasting centroids.
Nothing quadratic-in-rows ever forms; at 100 TB the only big pass is the
d(d+1)/2-key aggregation.

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
    spark = embeddings.sparkSession
    xq = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * F.lit(SCALE)).cast("long"),
    )
    src = embeddings.select(xq.alias("xq"))
    pair_structs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.transform(
                F.sequence(i, F.lit(dim - 1)),
                lambda j: F.struct(
                    i.alias("i"),
                    j.alias("j"),
                    (
                        F.element_at(F.col("xq"), i + 1)
                        * F.element_at(F.col("xq"), j + 1)
                    ).alias("p"),
                ),
            ),
        )
    )
    s_tbl = (
        src.select(F.explode(pair_structs).alias("s"))
        .groupBy(F.col("s.i").alias("i"), F.col("s.j").alias("j"))
        .agg(F.sum(F.col("s.p").cast("decimal(38,0)")).alias("s"))
    )
    t_structs = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.struct(i.alias("i"), F.element_at(F.col("xq"), i + 1).alias("x")),
    )
    t_tbl = (
        src.select(F.explode(t_structs).alias("t"))
        .groupBy(F.col("t.i").alias("i"))
        .agg(F.sum("t.x").alias("t"), F.count("*").alias("n"))
    )
    # metadata-scale collects: d(d+1)/2 + d rows (the centroid-broadcast
    # class of driver traffic — never row-scale)
    s_rows = {(r["i"], r["j"]): int(r["s"]) for r in s_tbl.collect()}
    t_rows = {r["i"]: (int(r["t"]), int(r["n"])) for r in t_tbl.collect()}
    n = next(iter(t_rows.values()))[1]
    t = [float(t_rows[i][0]) for i in range(dim)]
    c = [0.0] * (dim * dim)
    for i in range(dim):
        for j in range(dim):
            s = float(s_rows[(i, j) if i <= j else (j, i)])
            c[i * dim + j] = s - t[i] * t[j] / float(n)

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
