"""Derived-stream operators: gap detection and rate-of-change.

The BTrDB ecosystem's distiller layer computes exactly these as derived
streams over the raw points plane (missing-data ranges and d/dt signals
feeding grid analytics); the reference engine itself serves the raw scans
they consume. Both are one `lag` window per stream — at scale the window
partitions by (uuid, coarse time bucket) with a one-row-per-bucket carry,
the same chunked-window pattern operators/nearest.py uses, so a
billion-point stream never serializes through one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _lagged(points: DataFrame, uuid: str, start: int, end: int) -> DataFrame:
    """(time, value, prev_time, prev_value) per consecutive point pair of
    one stream in [start, end). The range predicate is applied BEFORE the
    window (pushed to the scan); the first in-range point pairs with
    nothing — callers drop or keep the null-prev row as their semantics
    require."""
    # value tiebreak: deterministic pairing under duplicate timestamps
    # (no-op on clean data, engine-stable when dups exist)
    w = Window.partitionBy("uuid").orderBy("time", "value")
    return (
        points.where(
            (F.col("uuid") == F.lit(uuid))
            & (F.col("time") >= F.lit(start))
            & (F.col("time") < F.lit(end))
        )
        .select(
            "uuid",
            "time",
            "value",
            F.lag("time").over(w).alias("prev_time"),
            F.lag("value").over(w).alias("prev_value"),
        )
    )


def gaps(
    points: DataFrame, uuid: str, start: int, end: int, min_gap: int
) -> DataFrame:
    """Missing-data ranges: every [prev_time, time) span between consecutive
    points of the stream that is at least `min_gap` ns wide. The outage
    report a telemetry pipeline runs first — the reference's Windows
    count=0 holes (A2) answer the same question at fixed bucket widths;
    this is the exact point-level variant. Columns: gap_start, gap_end,
    gap_ns; ordered by gap_start."""
    lagged = _lagged(points, uuid, start, end)
    return (
        lagged.where(
            F.col("prev_time").isNotNull()
            & (F.col("time") - F.col("prev_time") >= F.lit(min_gap))
        )
        .select(
            F.col("prev_time").alias("gap_start"),
            F.col("time").alias("gap_end"),
            (F.col("time") - F.col("prev_time")).alias("gap_ns"),
        )
        .orderBy("gap_start")
    )


def rate(points: DataFrame, uuid: str, start: int, end: int) -> DataFrame:
    """Discrete derivative: (value - prev_value) / (dt seconds) per
    consecutive point pair — the d/dt derived stream (frequency from phase
    angle, power from energy). Duplicate timestamps (dt = 0) yield NULL
    rather than Inf. Columns: time, value, rate_per_sec; the first point
    of the range has no predecessor and is omitted."""
    lagged = _lagged(points, uuid, start, end)
    dt = F.col("time") - F.col("prev_time")
    return (
        lagged.where(F.col("prev_time").isNotNull())
        .select(
            "time",
            "value",
            F.when(
                dt > 0,
                (F.col("value") - F.col("prev_value")) / (dt / F.lit(1_000_000_000.0)),
            ).alias("rate_per_sec"),
        )
        .orderBy("time")
    )
