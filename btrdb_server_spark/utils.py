"""Small plan utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition iff the input has fewer partitions than the cluster has
    cores. Small single-file parquet inputs otherwise serialize expensive
    per-row work (explode/hash/pair-join) onto one task; a well-partitioned
    100 TB input already exceeds the core count, so this is a no-op there
    and costs nothing in the scale path."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
