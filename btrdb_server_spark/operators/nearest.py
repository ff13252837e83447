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


def nearest_asof(points: DataFrame, probes: DataFrame, backward: bool) -> DataFrame:
    """Vectorized nearest: `probes` has (uuid, probe_time); returns one row per
    probe with the matched (time, value) or nulls.

    Implementation: union points and probes on a (time, tie) order, then a
    single window pass per uuid carries the last point backward (or first
    point forward) onto each probe row. Probes sort before points at equal
    time, which yields exactly backward-exclusive / forward-inclusive.
    One shuffle by uuid, no per-probe scans.
    """
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
