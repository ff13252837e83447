"""Bit-determinism under re-partitioning: the quantized stat paths must
return BIT-identical floats no matter how the data is partitioned or in
what order partial aggregates combine.

This is the exact failure class that cost rounds 1-3 at the driver's value
hash (float double-sums are accumulation-order-dependent: at 1000 executors
`sum(vsum)/sum(cnt)` can differ in the last ulp between runs). The
int64-quantum paths (RollupLadder.value_quantum, windows(value_quantum=..))
remove that surface: integer sums are exactly associative. These tests
drive the same query through adversarially different partitionings and
compare raw IEEE bit patterns, not tolerances."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from btrdb_server_spark.operators.stat import windows
from btrdb_server_spark.plans.rollup import RollupLadder

N = 20_000
WIDTH = 1_024


def _pts(spark, shuffle_seed=None, parts=None):
    """Deterministic 2-decimal 'sensor' points; optionally shuffled into a
    different partitioning so partial-aggregate combine order changes."""
    df = spark.range(N).select(
        F.lit("s1").alias("uuid"),
        F.col("id").alias("time"),
        (F.round(F.sin(F.col("id").cast("double")) * 50, 2)).alias("value"),
    )
    if shuffle_seed is not None:
        df = (
            df.withColumn("r", F.pmod(F.xxhash64("time") + shuffle_seed, 97))
            .repartition(parts, "r")
            .drop("r")
        )
    return df


def _bits(rows):
    out = []
    for r in sorted(rows, key=lambda r: r["time"]):
        out.append(
            (
                r["time"],
                struct.pack("<d", r["min"]),
                struct.pack("<d", r["mean"]),
                struct.pack("<d", r["max"]),
                r["count"],
            )
        )
    return out


def test_windows_depth_bits_stable_across_partitionings(spark):
    baseline = None
    for seed, parts in [(None, None), (1, 3), (7, 23), (13, 1)]:
        df = windows(
            _pts(spark, seed, parts), "s1", 0, N, WIDTH, depth=6, value_quantum=0.01
        )
        bits = _bits(df.collect())
        if baseline is None:
            baseline = bits
            assert len(bits) == N // WIDTH
        else:
            assert bits == baseline  # bit-exact, not approximately equal


def test_ladder_serve_bits_stable_across_build_partitionings(spark, tmp_path):
    """Two ladders built from adversarially different partitionings of the
    same points serve bit-identical aligned windows AND bit-identical
    depth-bounded window means (the vq int64 column makes build order
    irrelevant)."""
    baseline = None
    for i, (seed, parts) in enumerate([(None, None), (5, 17)]):
        ladder = RollupLadder(
            spark, str(tmp_path / f"ladder{i}"), levels=(4, 8), value_quantum=0.01
        )
        pts = _pts(spark, seed, parts)
        ladder.rebuild(pts)
        aligned = _bits(ladder.serve_aligned(pts, "s1", 0, N, 10).collect())
        win = _bits(
            ladder.serve_windows(pts, "s1", 0, N, WIDTH, depth=8).collect()
        )
        if baseline is None:
            baseline = (aligned, win)
            assert len(aligned) > 10 and len(win) == N // WIDTH
        else:
            assert (aligned, win) == baseline


def test_incremental_vs_bulk_ladder_bits_identical(spark, tmp_path):
    """A ladder maintained by K out-of-order incremental batches serves the
    same bits as one rebuilt in bulk — merge_rollups' int64 vq column makes
    late-data folds exactly associative too."""
    pts = _pts(spark)
    bulk = RollupLadder(spark, str(tmp_path / "bulk"), levels=(6,), value_quantum=0.01)
    bulk.rebuild(pts)
    inc = RollupLadder(spark, str(tmp_path / "inc"), levels=(6,), value_quantum=0.01)
    # batches deliberately out of time order: late data folds via merge
    for lo, hi in [(12_000, N), (0, 5_000), (5_000, 12_000)]:
        inc.update_with_batch(pts.where((F.col("time") >= lo) & (F.col("time") < hi)))
    a = _bits(bulk.serve_windows(pts, "s1", 0, N, WIDTH, depth=6).collect())
    b = _bits(inc.serve_windows(pts, "s1", 0, N, WIDTH, depth=6).collect())
    assert a == b and len(a) == N // WIDTH
