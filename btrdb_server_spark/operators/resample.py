"""Grid resampling: project an irregular stream onto a uniform tick grid.

The reference serves raw points and pre-aggregated windows; every consumer
that feeds a model or joins streams of different cadences first snaps them
to a shared grid (the distiller ecosystem's align-and-derive stage, and the
standard preprocessing step for ML feature matrices over telemetry). Two
interpolation modes:

- ``hold`` (zero-order hold / last-observation-carried-forward): the value
  at the latest point with time <= tick. Ticks before the first point are
  null.
- ``linear``: straight-line interpolation between the bracketing points
  (prev inclusive, next strictly after the tick); a point exactly ON the
  tick reproduces its value bit-exactly (interpolation weight 0). Ticks
  outside the observed span are null.

Spark-first: both modes ride the vectorized as-of join of
operators/nearest.py (union + ordered window carry) — ticks are a generated
spine (spark.range, no data shuffle to build), and with ``bucket_pw`` set
the heavy window partitions by (uuid, time >> bucket_pw) with the one-row-
per-bucket carry chain, so a billion-point stream fans out across buckets
instead of serializing through one task. The interpolation arithmetic is a
per-row expression: tick offsets are < 2**53 ns for any sane grid span, so
the double ratio (tick - t0)/(t1 - t0) is exact-input IEEE and the result
is engine-deterministic (no accumulation order anywhere).

Reference parity anchor: RawValues scan semantics (quasar.go:253-269) for
the point plane; the grid/interp layer is an extension the reference
delegates to its client-side distiller stack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from btrdb_server_spark.operators.nearest import nearest_asof

_MODES = ("hold", "linear")


def _grid(points: DataFrame, uuid: str, start: int, end: int, step: int) -> DataFrame:
    """One probe row per tick: start + k*step for k in [0, (end-start)//step).
    Probes carry tick+1 so the backward as-of (probe-exclusive at equal
    time) becomes prev-INCLUSIVE and the forward as-of (probe-inclusive)
    becomes next-STRICT — integer-ns times make the +1 shift exact."""
    spark = points.sparkSession
    n = (end - start) // step
    return spark.range(0, n).select(
        F.lit(uuid).alias("uuid"),
        (F.lit(start) + F.col("id") * F.lit(step)).alias("tick"),
        (F.lit(start) + F.col("id") * F.lit(step) + F.lit(1)).alias("probe_time"),
    )


def resample(
    points: DataFrame,
    uuid: str,
    start: int,
    end: int,
    step: int,
    mode: str = "hold",
    bucket_pw: int | None = None,
) -> DataFrame:
    """Resample one stream onto the uniform grid [start, start+step, ...)
    covering whole steps of [start, end). Columns: time (tick), value
    (null where the mode has no defined value). Ordered by time."""
    if step <= 0:
        raise ValueError("resample step must be positive")
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}")
    src = points.where(
        (F.col("uuid") == F.lit(uuid))
        & (F.col("time") >= F.lit(start))
        & (F.col("time") < F.lit(end))
    )
    grid = _grid(points, uuid, start, end, step)
    probes = grid.select("uuid", "probe_time")
    prev = nearest_asof(src, probes, backward=True, bucket_pw=bucket_pw).select(
        F.col("probe_time"),
        F.col("time").alias("t0"),
        F.col("value").alias("v0"),
    )
    out = grid.join(prev, "probe_time", "left")
    if mode == "hold":
        return out.select(F.col("tick").alias("time"), F.col("v0").alias("value")).orderBy(
            "time"
        )
    nxt = nearest_asof(src, probes, backward=False, bucket_pw=bucket_pw).select(
        F.col("probe_time"),
        F.col("time").alias("t1"),
        F.col("value").alias("v1"),
    )
    out = out.join(nxt, "probe_time", "left")
    # Exact-at-tick: t0 == tick gives weight 0, so value == v0 bit-exactly.
    # t1 > tick always (strict next), so t1 - t0 >= 1 and the ratio is a
    # well-defined double of two exact small integers.
    ratio = (F.col("tick") - F.col("t0")).cast("double") / (
        F.col("t1") - F.col("t0")
    ).cast("double")
    interp = F.col("v0") + (F.col("v1") - F.col("v0")) * ratio
    return (
        out.select(
            F.col("tick").alias("time"),
            # A point exactly ON the tick is its own value even when it is
            # the last point (no right bracket exists); otherwise both
            # brackets are required.
            F.when(F.col("t0") == F.col("tick"), F.col("v0"))
            .when(F.col("t0").isNotNull() & F.col("t1").isNotNull(), interp)
            .alias("value"),
        )
        .orderBy("time")
    )
