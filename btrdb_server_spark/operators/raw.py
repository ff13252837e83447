"""RawValues scan + insert validation filter.

Reference semantics:
- RawValues(uuid, start, end, version): all points start <= t < end in time
  order (grpcinterface/serve.go:122-180, qtree/qtree.go:968-1031).
- Insert validation rejects NaN/Inf values and out-of-domain times
  (quasar.go:92-101, qtree/qtree.go:608-618).

Spark-first: the whole query is a declarative filter + sort, so Catalyst
pushes uuid and time predicates into the parquet scan (PushedFilters +
row-group min/max skipping) and prunes to the two projected columns. With the
lake partitioned by uuid_bucket/time_bucket (see store.py) the scan at 100 TB
touches only the overlapping partitions — the same pruning the reference's
tree descent performs (qtree.go:1000-1029).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from btrdb_server_spark.constants import MAX_INSERT_TIME, MIN_TIME


def time_range_pred(start: int, end: int) -> Column:
    """start <= time < end — the universal range predicate (qtree.go:978-994)."""
    return (F.col("time") >= F.lit(start)) & (F.col("time") < F.lit(end))


def raw_values(points: DataFrame, uuid: str, start: int, end: int) -> DataFrame:
    """All points of `uuid` with start <= time < end, ascending by time."""
    return (
        points.where((F.col("uuid") == F.lit(uuid)) & time_range_pred(start, end))
        .select("time", "value")
        .orderBy("time")
    )


def validate_points(points: DataFrame) -> DataFrame:
    """Keep only rows the reference would accept on insert (quasar.go:92-101):
    MIN_TIME <= time < MAX_TIME-1, finite value."""
    return points.where(
        (F.col("time") >= F.lit(MIN_TIME))
        & (F.col("time") <= F.lit(MAX_INSERT_TIME))
        & ~F.isnan("value")
        & (F.col("value") != F.lit(float("inf")))
        & (F.col("value") != F.lit(float("-inf")))
    )


def invalid_cond() -> Column:
    """Predicate matching rows that raise BadValue(425) / InvalidTimeRange(413)
    in the reference (bte/errors.go:182-218)."""
    return (
        (F.col("time") < F.lit(MIN_TIME))
        | (F.col("time") > F.lit(MAX_INSERT_TIME))
        | F.isnan("value")
        | (F.col("value") == F.lit(float("inf")))
        | (F.col("value") == F.lit(float("-inf")))
    )


def invalid_points(points: DataFrame) -> DataFrame:
    """The complement of validate_points."""
    return points.where(invalid_cond())


def truncate_dense_timestamps(points: DataFrame, cap: int) -> DataFrame:
    """Reference-compat truncation: keep at most `cap` points per
    (uuid, 1-ns timestamp). A pw=0 vector block holds VSIZE=1024 points and
    the reference drops the overflow on insert with a 'FIX YOUR DATA'
    warning (qtree.go:692-699); by default this engine stores unbounded
    duplicates (a documented superset) and this transform is the opt-in
    compat mode. Kept rows are the `cap` smallest values per timestamp —
    deterministic where the reference keeps arrival order. The window
    partitions by (uuid, time), so superdense timestamps shuffle but never
    serialize a whole stream through one task."""
    from pyspark.sql import Window

    w = Window.partitionBy("uuid", "time").orderBy("value")
    return (
        points.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= F.lit(cap))
        .drop("_rn")
    )


def hash_sample(
    points: DataFrame,
    start: int,
    end: int,
    k: int,
) -> DataFrame:
    """Deterministic k-per-stream sample: the k points of each stream with
    the smallest md5(uuid|time|value) rank — the "show me a representative
    slice of every stream" preview a dashboard or debugging session runs
    against a 100 TB table. Hash-ranking makes the sample a pure function
    of the DATA (stable across runs, engines and partitionings — unlike
    rand()-based sampling), uniformly distributed over each stream's
    points, and incrementally consistent: adding points only displaces
    the highest ranks. Columns: uuid, time, value, rank (1-based by hash
    order). md5 keeps the rank reproducible in any engine.

    Scale shape: one projection computes the rank hash; the per-stream
    top-k is a row_number window with WindowGroupLimit pushdown — Spark
    keeps only k rows per stream per partition before the shuffle, so the
    exchange carries O(streams * k), not the corpus."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    # Hash over uuid|time ONLY: integer-to-string is identical in every
    # engine, while double formatting is not (shortest-repr vs scientific
    # thresholds differ). Ties (duplicate timestamps) break on (time,
    # value) so the rank order stays total and engine-exact.
    src = points.where(time_range_pred(start, end)).select(
        "uuid",
        "time",
        "value",
        F.md5(F.concat_ws("|", F.col("uuid"), F.col("time"))).alias("h"),
    )
    w = Window.partitionBy("uuid").orderBy("h", "time", "value")
    return (
        src.select("uuid", "time", "value", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k)
        .orderBy("uuid", "rank")
    )
