"""Changed-range computation: bucket coarsening + interval coalescing.

Reference semantics (quasar.go:404-485, qtree/qtree.go:261-357 FindChangedSince,
merger.go:16-130 mergeChangedRanges):
- Changes(uuid, fromVer, toVer, resolution) returns time intervals [start, end)
  that MAY differ between the versions, coarsened to 2**resolution-ns
  granularity; overlapping/adjacent ranges are coalesced. The contract is
  COMPLETENESS (never miss a change), not minimality (qtree.go:253-259).

Spark-first: the change log is rows (from the MVCC store or an explicit
per-batch log); coarsening is a shiftright groupBy-distinct; coalescing is the
classic gap-and-islands rewrite — running max(end) via a window, gap flags,
running sum as group id, then groupBy. Per-uuid windows shuffle once by uuid;
no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def coalesce_intervals(intervals: DataFrame, by_uuid: bool = False) -> DataFrame:
    """Merge overlapping/adjacent [start, end) intervals (merger.go:16-130).

    Input columns: start, end (+ uuid when by_uuid). Adjacent means
    next.start <= prev.end — touching intervals merge, as the reference's
    merger treats [a,b) [b,c) as one [a,c).
    """
    keys = ["uuid"] if by_uuid else []
    w = Window.partitionBy(*keys).orderBy("start") if keys else Window.orderBy("start")
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    flagged = intervals.select(
        *keys,
        "start",
        "end",
        F.when(
            F.col("start") > F.coalesce(F.max("end").over(wprev), F.lit(None)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("is_gap"),
    ).withColumn("grp", F.sum("is_gap").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        flagged.groupBy(*keys, "grp")
        .agg(F.min("start").alias("start"), F.max("end").alias("end"))
        .select(*keys, "start", "end")
        .orderBy(*keys, "start")
    )


def buckets_to_ranges(buckets: DataFrame, resolution: int, by_uuid: bool = False) -> DataFrame:
    """Turn a set of changed 2**resolution buckets (column `bucket` = time >>
    resolution) into coalesced [start, end) ranges (quasar.go:442-476)."""
    keys = ["uuid"] if by_uuid else []
    iv = buckets.select(
        *keys,
        F.shiftleft(F.col("bucket"), resolution).alias("start"),
        F.shiftleft(F.col("bucket") + F.lit(1), resolution).alias("end"),
    ).distinct()
    return coalesce_intervals(iv, by_uuid=by_uuid)


def times_to_changed_ranges(
    changed_times: DataFrame, resolution: int, by_uuid: bool = False
) -> DataFrame:
    """From raw changed-point times (column `time`) to coalesced ranges at
    2**resolution granularity — the full Changes post-processing pipeline."""
    keys = ["uuid"] if by_uuid else []
    buckets = changed_times.select(*keys, F.shiftright("time", resolution).alias("bucket"))
    return buckets_to_ranges(buckets, resolution, by_uuid=by_uuid)
