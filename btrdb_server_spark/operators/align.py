"""Multi-stream time alignment — the GenerateCSV dataflow.

Reference semantics (grpcinterface/serve.go:880-1011, csv.go:15-157): N
streams are queried (raw / aligned / windowed); rows are aligned on timestamp
— one output row per distinct time, with empty cells where a stream has no
point at that time. That is an N-way full-outer merge join on time
(serve.go:953-1008 advances N sorted cursors in lockstep).

Spark-first: groupBy(time).pivot(uuid) — one shuffle on time, no N-way join
chain. The pivot value list is passed explicitly so the plan is a single
aggregation (no extra distinct pass to discover labels); at 100 TB the
aggregate is map-side combined per (time, uuid) before the shuffle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from btrdb_server_spark.operators.raw import time_range_pred
from btrdb_server_spark.operators.stat import align_floor


def align_streams(
    points: DataFrame, uuids: Sequence[str], start: int, end: int, agg: str = "first"
) -> DataFrame:
    """Raw-mode alignment: one row per distinct time in [start, end), one
    value column per stream (null = empty cell). Duplicate timestamps within
    a stream collapse via `agg` — 'first' matches the reference cursor
    semantics (csv.go:30-43, one point per timestamp per stream); 'max'/'min'
    give a deterministic choice for oracle comparison."""
    agg_col = {"first": F.first, "max": F.max, "min": F.min}[agg]("value")
    return (
        points.where(F.col("uuid").isin(list(uuids)) & time_range_pred(start, end))
        .groupBy("time")
        .pivot("uuid", list(uuids))
        .agg(agg_col)
        .orderBy("time")
    )


def align_streams_windowed(
    points: DataFrame, uuids: Sequence[str], start: int, end: int, pw: int
) -> DataFrame:
    """Aligned/statistical-mode alignment (csv.go:75-89): one row per 2**pw
    bucket, four columns per stream: <uuid>_min/_mean/_max/_count."""
    fstart = align_floor(start, pw)
    fend = align_floor(end, pw)
    return (
        points.where(F.col("uuid").isin(list(uuids)) & time_range_pred(fstart, fend))
        .groupBy(F.shiftleft(F.shiftright("time", pw), pw).alias("time"))
        .pivot("uuid", list(uuids))
        .agg(
            F.min("value").alias("min"),
            F.avg("value").alias("mean"),
            F.max("value").alias("max"),
            F.count("value").alias("count"),
        )
        .orderBy("time")
    )


def write_csv(aligned: DataFrame, path: str) -> None:
    """CSV sink (GenerateCSV's output stage, serve.go:969-999). Single header,
    empty cells for nulls; coalesce(1) mirrors the single-stream RPC response
    — drop it when exporting at scale."""
    aligned.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
