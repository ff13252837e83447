"""Sketch-based summaries: a count-min sketch over the corpus token stream
with a heavy-hitter audit — the bounded-memory frequency structure a
streaming ingest keeps when the token domain is too wide for exact counts.

The CMS here is DETERMINISTIC (salted-md5 row hashes, the same family every
hashed operator in this repo uses), so the sketch cells — and therefore the
estimates — are oracle-checkable integers, and the defining CMS guarantee
(estimate >= true count, overestimate bounded by row collisions) is
asserted per row rather than proclaimed.

Scale shape: the token stream collapses to the distinct-token count table
first (map-side-combined groupBy — token-domain scale); the sketch is built
FROM that table (sum commutes), so the d×w cell table costs d token-domain
map passes, never a second scan of the corpus. The audit joins are all
broadcast (k rows × d, d×w cells).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from btrdb_server_spark.functions.text import tokens_col


def _bucket(tok, salt: str, width: int):
    """Salted 16-bit md5 prefix folded into [0, width) — identical
    arithmetic to the oracle's strpos-on-hex formulation."""
    h4 = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), tok)), 1, 4), 16, 10
    ).cast("long")
    return h4 % F.lit(width)


def cms_heavy_hitters(
    docs: DataFrame,
    depth: int = 4,
    width: int = 1024,
    k: int = 30,
    text_col: str = "text",
) -> DataFrame:
    """Build a depth×width count-min sketch of the whitespace-token stream
    and audit it against the exact top-k tokens: one row per heavy hitter
    with (token, cnt, cms_est), cms_est = min over rows of the hashed
    cell, ordered by cnt desc (token asc tiebreak). cms_est >= cnt always;
    equality whenever no collision survives all `depth` rows."""
    if depth < 1 or width < 2:
        raise ValueError("need depth >= 1, width >= 2")
    counts = (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
    )
    per_row = [
        counts.select(
            F.lit(r).cast("long").alias("r"),
            _bucket(F.col("tok"), f"cms{r}:", width).alias("b"),
            F.col("cnt"),
        )
        for r in range(depth)
    ]
    cells = (
        reduce(DataFrame.unionAll, per_row)
        .groupBy("r", "b")
        .agg(F.sum("cnt").alias("cell"))
    )
    top = counts.orderBy(F.col("cnt").desc(), "tok").limit(k)
    probes = reduce(
        DataFrame.unionAll,
        [
            top.select(
                "tok",
                "cnt",
                F.lit(r).cast("long").alias("r"),
                _bucket(F.col("tok"), f"cms{r}:", width).alias("b"),
            )
            for r in range(depth)
        ],
    )
    return (
        probes.join(F.broadcast(cells), ["r", "b"])
        .groupBy("tok", "cnt")
        .agg(F.min("cell").alias("cms_est"))
        .orderBy(F.col("cnt").desc(), "tok")
    )


def kmv_distinct(
    events: DataFrame,
    k: int = 256,
    group_col: str = "event_type",
    id_col: str = "user_id",
) -> DataFrame:
    """K-minimum-values distinct-count sketch per group, audited against
    the exact count: hash each id to 52 bits (md5 prefix — fits double
    exactly, so the estimate's one division is engine-identical), keep
    the k smallest distinct hashes per group, estimate
    D ≈ (k-1)·2^52 / h_(k). Groups with fewer than k distinct hashes are
    served EXACTLY (the sketch holds every hash). The mergeable
    distinct sketch the reference lacks: fixed k-row state per group,
    union = merge-and-trim — the shape that answers "distinct users per
    stream per window" at 100 TB without a count-distinct shuffle of raw
    ids.

    Scale shape: one distinct on (group, hash) — map-side combined; the
    k-smallest prune is a rank window that rewrites to WindowGroupLimit
    (per-partition top-k BEFORE the exchange, k rows per group shuffle);
    the exact audit is the only id-scale count-distinct and exists to
    certify the estimate in tests. Columns: uuid, n_exact, n_kept,
    kth_hash, kmv_est."""
    if k < 2:
        raise ValueError("need k >= 2")
    from pyspark.sql import Window as W

    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("kmv:"), F.col(id_col).cast("string"))), 1, 13
        ),
        16,
        10,
    ).cast("long")
    hashes = (
        events.select(F.col(group_col).alias("uuid"), h.alias("h")).distinct()
    )
    rn = F.row_number().over(W.partitionBy("uuid").orderBy("h"))
    kept = (
        hashes.withColumn("rn", rn)
        .where(F.col("rn") <= k)
        .groupBy("uuid")
        .agg(F.max("h").alias("kth_hash"), F.count("*").alias("n_kept"))
    )
    exact = events.groupBy(F.col(group_col).alias("uuid")).agg(
        F.countDistinct(id_col).alias("n_exact")
    )
    est = F.when(
        F.col("n_kept") == k,
        F.lit(float((k - 1) * (1 << 52))) / F.col("kth_hash").cast("double"),
    ).otherwise(F.col("n_kept").cast("double"))
    return (
        exact.join(kept, "uuid")
        .select("uuid", "n_exact", "n_kept", "kth_hash", est.alias("kmv_est"))
        .orderBy("uuid")
    )
