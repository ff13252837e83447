"""Spectral analysis over the points plane: a binned periodogram (DFT power
at the first K harmonics of the query range) — the "is there a daily/weekly
cycle in this feed?" probe that complements the time-domain autocorrelation
operator (operators/corr.py autocorr).

Method (Welch-style binning): the range is split into `bins` equal phase
bins; the heavy pass is ONE map-side-combined groupBy summing each bin's
quantized values (int64). The DFT then runs over the bin table — bins × K
rows, metadata-sized — against a PRECOMPUTED integer trig table, so the
big-data pass never computes trigonometry and the small DFT pass is a
broadcast join. At 100 TB the plan is: pruned scan → one groupBy(bin) →
tiny join; nothing else touches point-scale data.

Exactness: libm cos/sin differ across engines by ULPs, so the trig table is
computed ONCE in Python (round(cos(2πb/W)·1e6) as int64) and injected into
BOTH the Spark plan and the SQL oracle — the DFT sums are then pure integer
arithmetic (decimal(38,0) against overflow), and every emitted double is a
fixed op sequence over exact integers. The 1e-6 trig quantization is part
of the operator's definition (a documented ~1e-6 relative amplitude error
bound), not an implementation accident.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRIG_SCALE = 1_000_000


def trig_table(bins: int) -> list[tuple[int, int, int]]:
    """(bin, cos_q, sin_q) for phase 2π·bin/bins, quantized to 1e-6 —
    the single source of truth shared by the Spark plan and the SQL
    oracle (Python round's tie mode is irrelevant: both sides consume
    these exact integers)."""
    return [
        (
            b,
            round(math.cos(2.0 * math.pi * b / bins) * TRIG_SCALE),
            round(math.sin(2.0 * math.pi * b / bins) * TRIG_SCALE),
        )
        for b in range(bins)
    ]


def periodogram(
    points: DataFrame,
    uuid: str,
    start: int,
    end: int,
    k_max: int = 8,
    bins: int = 288,
    value_quantum: float = 0.01,
) -> DataFrame:
    """Power at harmonics k=1..k_max of the range [start, end): one row per
    k with (k, n, amp_cos, amp_sin, power), power = amp_cos² + amp_sin²
    where amp_* are the raw (unnormalized) DFT sums in value units.
    A strong daily cycle in a 28-day range shows up at k=28.

    Plan: groupBy(phase bin) over the pruned scan (the ONLY point-scale
    stage), then bins×k_max broadcast-joined rows of integer products."""
    if not 0 < k_max < bins:
        raise ValueError("need 0 < k_max < bins")
    span = end - start
    if span <= 0:
        raise ValueError("empty range")
    q = round(1.0 / value_quantum)
    spark = points.sparkSession
    src = points.where(
        (F.col("uuid") == F.lit(uuid))
        & (F.col("time") >= F.lit(start))
        & (F.col("time") < F.lit(end))
    ).select(
        F.expr(f"((time - ({start})) * {bins}) div {span}").alias("pbin"),
        F.round(F.col("value") / F.lit(value_quantum)).cast("long").alias("vq"),
    )
    binned = src.groupBy("pbin").agg(
        F.sum("vq").alias("sq"), F.count("*").alias("cnt")
    )
    trig = spark.createDataFrame(trig_table(bins), "tb long, cq long, sgq long")
    ks = spark.range(1, k_max + 1).select(F.col("id").alias("k"))
    j = ks.crossJoin(binned).join(
        F.broadcast(trig), (F.col("k") * F.col("pbin")) % F.lit(bins) == F.col("tb")
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    agg = j.groupBy("k").agg(
        F.sum("cnt").alias("n"),
        F.sum(dec("sq") * F.col("cq")).alias("sc"),
        F.sum(dec("sq") * F.col("sgq")).alias("ss"),
    )
    amps = agg.select(
        "k",
        "n",
        (F.col("sc").cast("double") / F.lit(float(TRIG_SCALE)) / F.lit(float(q))).alias(
            "amp_cos"
        ),
        (F.col("ss").cast("double") / F.lit(float(TRIG_SCALE)) / F.lit(float(q))).alias(
            "amp_sin"
        ),
    )
    return amps.select(
        "k",
        "n",
        "amp_cos",
        "amp_sin",
        (F.col("amp_cos") * F.col("amp_cos") + F.col("amp_sin") * F.col("amp_sin")).alias(
            "power"
        ),
    ).orderBy("k")
