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
running sum as group id, then groupBy.

Scale shape: a single global `Window.orderBy` serializes the whole interval
set through one task, so coalescing is CHUNKED — phase 1 merges within
(uuid, chunk) groups in parallel (chunk = start >> chunk_shift), phase 2
re-merges only the islands that can interact across chunk boundaries. An
island is provably final ("safe") when no earlier chunk's reach (running max
of interval ends) touches its start and it does not itself touch its chunk's
right edge; the risky remainder is bounded by the chunk count, so the one
remaining global window runs over a metadata-sized set. A fine-resolution
diff of a dense stream — the case that serialized before — collapses inside
the parallel phase.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _gap_islands(intervals: DataFrame, keys: list[str]) -> DataFrame:
    """Gap-and-islands merge of [start, end) intervals within each `keys`
    group (merger.go:16-130). Adjacent means next.start <= prev.end —
    touching intervals merge, as the reference's merger treats [a,b) [b,c)
    as one [a,c)."""
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
    )


def coalesce_intervals(
    intervals: DataFrame,
    by_uuid: bool = False,
    chunk_shift: Optional[int] = None,
) -> DataFrame:
    """Merge overlapping/adjacent [start, end) intervals.

    Input columns: start, end (+ uuid when by_uuid). With `chunk_shift`
    (the scale path — always set it on big inputs), the heavy merge runs
    partitioned by (uuid, start >> chunk_shift) and only boundary-spanning
    islands see a global window.
    """
    keys = ["uuid"] if by_uuid else []
    if chunk_shift is None:
        return _gap_islands(intervals, keys).orderBy(*keys, "start")

    chunked = intervals.withColumn("chunk", F.shiftright("start", chunk_shift))
    p1 = _gap_islands(chunked, keys + ["chunk"])

    # reach(chunk) = max interval end over all STRICTLY EARLIER chunks: the
    # farthest any earlier island can extend toward this chunk. One row per
    # non-empty chunk — the global window here is over a metadata-sized set.
    wk = (
        Window.partitionBy(*keys).orderBy("chunk")
        if keys
        else Window.orderBy("chunk")
    )
    reach = (
        p1.groupBy(*keys, "chunk")
        .agg(F.max("end").alias("cend"))
        .withColumn(
            "reach",
            F.max("cend").over(wk.rowsBetween(Window.unboundedPreceding, -1)),
        )
        .select(*keys, "chunk", "reach")
    )
    joined = p1.join(F.broadcast(reach), keys + ["chunk"], "left")
    # Touch semantics are >=: an island is risky if an earlier chunk reaches
    # its start (reach >= start) or it reaches its chunk's right edge
    # (end >= (chunk+1) << chunk_shift).
    risky_cond = (
        F.col("reach").isNotNull() & (F.col("reach") >= F.col("start"))
    ) | (F.col("end") >= F.shiftleft(F.col("chunk") + F.lit(1), chunk_shift))
    safe = joined.where(~risky_cond).select(*keys, "start", "end")
    risky = joined.where(risky_cond).select(*keys, "start", "end")
    p2 = _gap_islands(risky, keys)
    return safe.unionByName(p2).orderBy(*keys, "start")


def buckets_to_ranges(
    buckets: DataFrame,
    resolution: int,
    by_uuid: bool = False,
    chunk_shift: Optional[int] = None,
) -> DataFrame:
    """Turn a set of changed 2**resolution buckets (column `bucket` = time >>
    resolution) into coalesced [start, end) ranges (quasar.go:442-476)."""
    keys = ["uuid"] if by_uuid else []
    iv = buckets.select(
        *keys,
        F.shiftleft(F.col("bucket"), resolution).alias("start"),
        F.shiftleft(F.col("bucket") + F.lit(1), resolution).alias("end"),
    ).distinct()
    if chunk_shift is None and not by_uuid:
        # Single-key coalescing would otherwise serialize through one
        # window task; per-uuid windows already parallelize across streams
        # (chunking stays available via chunk_shift for one dense stream).
        chunk_shift = min(resolution + 12, 62)  # ~4096 buckets per chunk
    return coalesce_intervals(iv, by_uuid=by_uuid, chunk_shift=chunk_shift)


def times_to_changed_ranges(
    changed_times: DataFrame, resolution: int, by_uuid: bool = False
) -> DataFrame:
    """From raw changed-point times (column `time`) to coalesced ranges at
    2**resolution granularity — the full Changes post-processing pipeline."""
    keys = ["uuid"] if by_uuid else []
    buckets = changed_times.select(*keys, F.shiftright("time", resolution).alias("bucket"))
    return buckets_to_ranges(buckets, resolution, by_uuid=by_uuid)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    start_col: str = "start",
    end_col: str = "end",
    bucket_pw: int | None = None,
) -> DataFrame:
    """Range join: every point with interval.start <= time < interval.end,
    tagged with its interval's columns — the fetch step of the reference's
    ChangedRanges -> RawValues workflow (quasar.go:399-402 then
    serve.go:122-180, one RawValues call per returned range) as a single
    declarative operator. A point inside k overlapping intervals appears
    k times (it IS a join).

    Two scale paths:
    - bucket_pw=None: broadcast nested-loop range join. Right for
      changed-ranges-sized interval sets (hundreds..thousands): the
      interval table ships to every executor once and each point scans
      only that in-memory list; there is no shuffle of the points at all.
    - bucket_pw=p: equi-join on 2**p-ns buckets for LARGE interval sets.
      Each interval explodes into the buckets it covers
      (sequence(start>>p, (end-1)>>p) — ascending since end > start), the
      points compute one bucket key, and the join is a plain shuffle hash
      join with the exact containment predicate re-applied after. Pick p
      near the typical interval width: the explode factor stays O(1) and
      no executor ever sees a nested loop.
    """
    s, e = F.col(start_col), F.col(end_col)
    contains = (F.col("time") >= s) & (F.col("time") < e)
    if bucket_pw is None:
        return points.join(F.broadcast(intervals), contains)
    # Drop degenerate intervals first: with end <= start the bucket
    # sequence would DESCEND (Spark's sequence default step is -1),
    # exploding spurious buckets that only the exact filter removes.
    iv = intervals.where(s < e).withColumn(
        "_bucket",
        F.explode(
            F.sequence(F.shiftright(s, bucket_pw), F.shiftright(e - 1, bucket_pw))
        ),
    )
    return (
        points.withColumn("_bucket", F.shiftright("time", bucket_pw))
        .join(iv, "_bucket")
        .where(contains)
        .drop("_bucket")
    )
