"""Nearest-point lookup — single probe and the vectorized as-of join.

Reference semantics (qtree/qtree.go:30-133 FindNearestValue):
- backward=True : the point with the greatest time STRICTLY LESS than t.
- backward=False: the point with the smallest time >= t (inclusive).
- No such point -> NoSuchPoint (401).

Spark-first: the single probe is orderBy+limit(1) on a pushed-down range scan
(Catalyst turns it into TakeOrderedAndProject — no full sort). The fleet
variant `nearest_asof` answers MANY probes in one pass as an as-of join:
union probes with points, one window pass per uuid — the idiom for joining a
100 TB point lake against a probe table without a per-probe scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def nearest(points: DataFrame, uuid: str, t: int, backward: bool) -> DataFrame:
    """The single nearest point to t (0 or 1 rows). Columns: time, value."""
    s = points.where(F.col("uuid") == F.lit(uuid)).select("time", "value")
    if backward:
        return s.where(F.col("time") < F.lit(t)).orderBy(F.col("time").desc()).limit(1)
    return s.where(F.col("time") >= F.lit(t)).orderBy(F.col("time").asc()).limit(1)


def nearest_asof(
    points: DataFrame,
    probes: DataFrame,
    backward: bool,
    bucket_pw: int | None = None,
) -> DataFrame:
    """Vectorized nearest: `probes` has (uuid, probe_time); returns one row per
    probe with the matched (time, value) or nulls.

    Implementation: union points and probes on a (time, tie) order, then a
    window pass carries the last point backward (or first point forward)
    onto each probe row. Probes sort before points at equal time, which
    yields exactly backward-exclusive / forward-inclusive.

    `bucket_pw=None` partitions the window by uuid alone: one shuffle, but a
    billion-point stream serializes through one task. With `bucket_pw` set
    (the scale path) the heavy window partitions by (uuid, time >> bucket_pw)
    and a bucket-level carry chain — one row per non-empty bucket — threads
    matches across bucket boundaries, so no task ever sees more than one
    bucket of one stream. Under duplicate timestamps the bucketed carry
    picks the max-value point deterministically where the flat path keeps
    arbitrary row order; otherwise results are identical.
    """
    if bucket_pw is not None:
        return _nearest_asof_bucketed(points, probes, backward, bucket_pw)
    p = points.select(
        "uuid",
        F.col("time").alias("t"),
        F.lit(1).alias("tie"),
        F.col("time").alias("pt_time"),
        F.col("value").alias("pt_value"),
        F.lit(None).cast("long").alias("probe_time"),
    )
    q = probes.select(
        "uuid",
        F.col("probe_time").alias("t"),
        F.lit(0).alias("tie"),
        F.lit(None).cast("long").alias("pt_time"),
        F.lit(None).cast("double").alias("pt_value"),
        "probe_time",
    )
    u = p.unionByName(q)
    if backward:
        w = (
            Window.partitionBy("uuid")
            .orderBy("t", "tie")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = u.select(
            "uuid",
            "probe_time",
            F.last("pt_time", ignorenulls=True).over(w).alias("time"),
            F.last("pt_value", ignorenulls=True).over(w).alias("value"),
        )
    else:
        w = (
            Window.partitionBy("uuid")
            .orderBy("t", "tie")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        matched = u.select(
            "uuid",
            "probe_time",
            F.first("pt_time", ignorenulls=True).over(w).alias("time"),
            F.first("pt_value", ignorenulls=True).over(w).alias("value"),
        )
    return matched.where(F.col("probe_time").isNotNull())


def _nearest_asof_bucketed(
    points: DataFrame, probes: DataFrame, backward: bool, bucket_pw: int
) -> DataFrame:
    """As-of join with (uuid, bucket)-partitioned windows + carry chain."""
    p = points.select(
        "uuid",
        F.col("time").alias("t"),
        F.lit(1).alias("tie"),
        F.col("time").alias("pt_time"),
        F.col("value").alias("pt_value"),
        F.lit(None).cast("long").alias("probe_time"),
        F.shiftright("time", bucket_pw).alias("bucket"),
    )
    q = probes.select(
        "uuid",
        F.col("probe_time").alias("t"),
        F.lit(0).alias("tie"),
        F.lit(None).cast("long").alias("pt_time"),
        F.lit(None).cast("double").alias("pt_value"),
        "probe_time",
        F.shiftright("probe_time", bucket_pw).alias("bucket"),
    )
    u = p.unionByName(q)
    wb = Window.partitionBy("uuid", "bucket").orderBy("t", "tie")
    if backward:
        win = wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pick_in_bucket = F.last
        # per-bucket boundary point: the LAST point of each bucket
        edge_agg = F.max(F.struct(F.col("time"), F.col("value"))).alias("edge")
        carry_frame = (Window.unboundedPreceding, -1)
    else:
        win = wb.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        pick_in_bucket = F.first
        edge_agg = F.min(F.struct(F.col("time"), F.col("value"))).alias("edge")
        carry_frame = (1, Window.unboundedFollowing)
    within = u.select(
        "uuid",
        "bucket",
        "probe_time",
        pick_in_bucket("pt_time", ignorenulls=True).over(win).alias("w_time"),
        pick_in_bucket("pt_value", ignorenulls=True).over(win).alias("w_value"),
    )
    # Carry chain: one row per (uuid, bucket) present in points OR probes —
    # metadata-sized next to the point set, so its per-uuid window is cheap.
    edges = points.groupBy(
        "uuid", F.shiftright("time", bucket_pw).alias("bucket")
    ).agg(edge_agg)
    spine = u.select("uuid", "bucket").distinct()
    wc = Window.partitionBy("uuid").orderBy("bucket").rowsBetween(*carry_frame)
    carry = (
        spine.join(edges, ["uuid", "bucket"], "left")
        .select(
            "uuid",
            "bucket",
            (F.last if backward else F.first)("edge", ignorenulls=True)
            .over(wc)
            .alias("carry"),
        )
    )
    return (
        within.where(F.col("probe_time").isNotNull())
        .join(carry, ["uuid", "bucket"], "left")
        .select(
            "uuid",
            "probe_time",
            F.coalesce(F.col("w_time"), F.col("carry.time")).alias("time"),
            F.when(F.col("w_time").isNotNull(), F.col("w_value"))
            .otherwise(F.col("carry.value"))
            .alias("value"),
        )
    )
