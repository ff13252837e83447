"""Multi-stream time alignment — the GenerateCSV dataflow.

Reference semantics (grpcinterface/serve.go:880-1011, csv.go:15-157): N
streams are queried (raw / aligned / windowed); rows are aligned on timestamp
— one output row per distinct time, with empty cells where a stream has no
point at that time. That is an N-way full-outer merge join on time
(serve.go:953-1008 advances N sorted cursors in lockstep).

Spark-first: groupBy(time) with one conditional aggregate per stream
(min(value) FILTER (uuid = u) style) — one shuffle on time, no N-way join
chain, no pivot machinery. The stream list is known up front, so the plan is
a single two-phase hash aggregate: partials combine map-side per (time,
stream) before the shuffle — exactly the reference's lockstep cursor merge,
but parallel.
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
    def agg_for(u: str):
        masked = F.when(F.col("uuid") == u, F.col("value"))
        if agg == "first":
            return F.first(masked, ignorenulls=True)
        return {"max": F.max, "min": F.min}[agg](masked)

    return (
        points.where(F.col("uuid").isin(list(uuids)) & time_range_pred(start, end))
        .groupBy("time")
        .agg(*[agg_for(u).alias(u) for u in uuids])
        .orderBy("time")
    )


def align_streams_windowed(
    points: DataFrame, uuids: Sequence[str], start: int, end: int, pw: int
) -> DataFrame:
    """Aligned/statistical-mode alignment (csv.go:75-89): one row per 2**pw
    bucket, four columns per stream: <uuid>_min/_mean/_max/_count."""
    fstart = align_floor(start, pw)
    fend = align_floor(end, pw)
    aggs = []
    for u in uuids:
        masked = F.when(F.col("uuid") == u, F.col("value"))
        aggs += [
            F.min(masked).alias(f"{u}_min"),
            F.avg(masked).alias(f"{u}_mean"),
            F.max(masked).alias(f"{u}_max"),
            F.count(masked).alias(f"{u}_count"),
        ]
    return (
        points.where(F.col("uuid").isin(list(uuids)) & time_range_pred(fstart, fend))
        .groupBy(F.shiftleft(F.shiftright("time", pw), pw).alias("time"))
        .agg(*aggs)
        .orderBy("time")
    )


def write_csv(aligned: DataFrame, path: str) -> None:
    """CSV sink (GenerateCSV's output stage, serve.go:969-999). Single header,
    empty cells for nulls; coalesce(1) mirrors the single-stream RPC response
    — drop it when exporting at scale."""
    aligned.coalesce(1).write.mode("overwrite").option("header", True).csv(path)


def synthesize_stream(
    points: DataFrame,
    weights: dict[str, float],
    name: str,
    start: int,
    end: int,
    bias: float = 0.0,
    grid_pw: int | None = None,
) -> DataFrame:
    """Distiller-style stream synthesis: a NEW stream whose value at each
    shared timestamp is a linear combination of the input streams —
    bias + Σ w_u * value_u — e.g. phase-angle difference (w = [1, -1]),
    three-phase imbalance, or a unit conversion. Rows exist only where
    EVERY input stream has a point (the distiller's all-inputs-ready
    rule); duplicate timestamps within a stream collapse via min() so
    the result is engine-deterministic. The output is a (uuid, time,
    value) points frame insertable straight back into the store — the
    derived stream round-trips as a first-class stream.

    Bit-exactness: the combination is evaluated left-to-right in the
    dict's insertion order, (bias + w1*v1) + w2*v2 + ... — mirror the
    same association order in any oracle. One shuffle on time (the
    align_streams conditional aggregate); the arithmetic is a
    whole-stage-codegen projection.

    `grid_pw`: streams sampled on different cadences rarely share exact
    ns timestamps; with grid_pw set, times floor to the 2**grid_pw grid
    first (per-stream min within a grid cell), so the combination runs
    cell-by-cell — the distiller's common-grid alignment step.

    The distiller layer computes exactly this over aligned raw scans
    (the reference serves the scans; BTrDB's upper layers own synthesis
    — serve.go:880-1011 is the alignment machinery)."""
    uuids = list(weights)
    if grid_pw is not None:
        points = points.withColumn(
            "time", F.shiftleft(F.shiftright("time", grid_pw), grid_pw)
        )
        start = align_floor(start, grid_pw)
        end = align_floor(end, grid_pw)
    aligned = align_streams(points, uuids, start, end, agg="min")
    expr = F.lit(float(bias))
    for u in uuids:
        expr = expr + F.col(u) * F.lit(float(weights[u]))
    present = None
    for u in uuids:
        c = F.col(u).isNotNull()
        present = c if present is None else (present & c)
    return (
        aligned.where(present)
        .select(F.lit(name).alias("uuid"), "time", expr.alias("value"))
        .orderBy("time")
    )
