"""Core read-path tests mirroring the reference's qtree test strategy
(SURVEY.md §5): exact round-trip, rollup-halving invariant, superdense
duplicates, hole semantics, nearest boundary table."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from btrdb_server_spark.operators.changes import coalesce_intervals, times_to_changed_ranges
from btrdb_server_spark.operators.nearest import nearest, nearest_asof
from btrdb_server_spark.operators.raw import invalid_points, raw_values, validate_points
from btrdb_server_spark.operators.stat import aligned_windows, windows
from btrdb_server_spark.schemas import POINTS_SCHEMA
from btrdb_server_spark.sources.testdata import load_points


def make_points(spark, rows):
    return spark.createDataFrame([("s", int(t), float(v)) for t, v in rows], POINTS_SCHEMA)


@pytest.fixture(scope="module")
def dense(spark):
    """F1 fx_dense_aligned: 4096 points at time 0..4095 (qtree2_test.go:41)."""
    rng = random.Random(42)
    df = make_points(spark, [(t, rng.random()) for t in range(4096)]).cache()
    df.count()
    return df


def test_raw_roundtrip_exact(spark, dense):
    got = raw_values(dense, "s", -1, 8).collect()
    assert [r.time for r in got] == list(range(8))
    full = raw_values(dense, "s", 0, 1 << 20).collect()
    assert len(full) == 4096
    assert [r.time for r in full] == sorted(r.time for r in full)


def test_raw_roundtrip_testdata(spark, sf_dir):
    pts = load_points(spark, sf_dir)
    lo, hi = pts.agg(F.min("time"), F.max("time")).first()
    got = raw_values(pts, "click", lo, hi + 1)
    n = pts.where(F.col("uuid") == "click").count()
    rows = got.collect()
    assert len(rows) == n
    assert [r.time for r in rows] == sorted(r.time for r in rows)


def test_rollup_halving_invariant(spark, dense):
    """qtree2_test.go:41-83: 4096 1ns-spaced points -> bucket count halves at
    each pw level, and stats at level k+1 equal the pairwise merge of level k."""
    prev = None
    for pw in range(0, 13):
        rows = aligned_windows(dense, "s", 0, 4096, pw).collect()
        assert len(rows) == 4096 >> pw
        total = sum(r["count"] for r in rows)
        assert total == 4096
        if prev is not None:
            merged = {}
            for r in prev:
                b = r.time >> pw << pw
                m = merged.setdefault(b, dict(mn=math.inf, mx=-math.inf, s=0.0, c=0))
                m["mn"] = min(m["mn"], r["min"])
                m["mx"] = max(m["mx"], r["max"])
                m["s"] += r["mean"] * r["count"]
                m["c"] += r["count"]
            for r in rows:
                m = merged[r.time]
                assert r["count"] == m["c"]
                assert r["min"] == pytest.approx(m["mn"])
                assert r["max"] == pytest.approx(m["mx"])
                assert r["mean"] == pytest.approx(m["s"] / m["c"])
        prev = rows


def test_aligned_windows_boundary_flooring(spark, dense):
    # start/end are floored to the 2^pw boundary (quasar.go:285-289): querying
    # [3, 13) at pw=3 covers buckets [0,8) and [8,16) minus the end-floor ->
    # only bucket 0 (end 13 floors to 8, so buckets in [0, 8)).
    rows = aligned_windows(dense, "s", 3, 13, 3).collect()
    assert [r.time for r in rows] == [0]
    assert rows[0]["count"] == 8


def test_superdense_duplicates(spark):
    """F3 fx_superdense (qtree2_test.go:196): 10k points at time=5. We keep
    all duplicates (documented superset of the reference's 1024/ns cap)."""
    df = make_points(spark, [(5, float(i)) for i in range(10_000)])
    assert raw_values(df, "s", 5, 6).count() == 10_000
    st = aligned_windows(df, "s", 0, 64, 6).collect()
    assert len(st) == 1 and st[0]["count"] == 10_000
    assert st[0]["min"] == 0.0 and st[0]["max"] == 9999.0


def test_superdense_truncation_compat(spark, tmp_path):
    """Opt-in reference compat (qtree.go:692-699): at most 1024 points per
    identical 1-ns timestamp survive the insert; default mode keeps all."""
    from btrdb_server_spark.api import BTrDB
    from btrdb_server_spark.constants import DUP_TIMESTAMP_CAP
    from btrdb_server_spark.operators.raw import truncate_dense_timestamps

    rows = [(5, float(i)) for i in range(10_000)] + [(6, 1.0), (7, 2.0)]

    # transform-level: cap applies per (uuid, time); kept rows are the
    # smallest values (deterministic stand-in for arrival order)
    df = make_points(spark, rows)
    out = truncate_dense_timestamps(df, DUP_TIMESTAMP_CAP)
    got = out.where(F.col("time") == 5)
    assert got.count() == 1024
    assert got.agg(F.max("value")).first()[0] == 1023.0
    assert out.count() == 1024 + 2

    # store-level, both modes (the superdense commit of qtree2_test.go:196)
    compat = BTrDB(spark, str(tmp_path / "compat"), dup_timestamp_cap=DUP_TIMESTAMP_CAP)
    compat.insert("s", rows, enforce_batch_cap=False)
    assert compat.raw_values("s", 5, 6).count() == 1024
    assert compat.raw_values("s", 0, 10).count() == 1026

    superset = BTrDB(spark, str(tmp_path / "superset"))
    superset.insert("s", rows, enforce_batch_cap=False)
    assert superset.raw_values("s", 5, 6).count() == 10_000


def test_windows_holes(spark):
    """F8-style: gap in the middle -> Windows emits count=0 holes; end is
    rounded down to whole windows (quasar.go:328-330)."""
    rows = [(t, 1.0) for t in range(0, 100)] + [(t, 2.0) for t in range(300, 400)]
    df = make_points(spark, rows)
    got = windows(df, "s", 0, 450, 100).collect()
    # end 450 -> 400; windows at 0,100,200,300
    assert [r.time for r in got] == [0, 100, 200, 300]
    assert [r["count"] for r in got] == [100, 0, 0, 100]
    assert got[1]["min"] is None and got[1]["mean"] is None
    assert got[3]["mean"] == pytest.approx(2.0)


def test_windows_depth_approximation(spark):
    df = make_points(spark, [(t, float(t)) for t in range(0, 1024)])
    exact = windows(df, "s", 0, 1024, 256, depth=0).collect()
    approx = windows(df, "s", 0, 1024, 256, depth=4).collect()
    # depth=4 buckets (16 ns) align exactly with 256-wide windows here, so
    # the approximation is exact — counts and means match.
    assert [r["count"] for r in exact] == [r["count"] for r in approx]
    for e, a in zip(exact, approx):
        assert a["mean"] == pytest.approx(e["mean"])


def test_nearest_boundary_table(spark):
    """F4 fx_nearest_sparse golden cases (qtree2_test.go:237-280)."""
    df = make_points(spark, [(1 << 56, 1.0), (2 << 56, 2.0), (3 << 56, 3.0)])
    cases = [
        ((2 << 56) + 1, True, 2.0),
        (2 << 56, True, 1.0),
        (2 << 56, False, 2.0),
        ((2 << 56) + 1, False, 3.0),
        (0, False, 1.0),
        (4 << 56, True, 3.0),
        (0, True, None),
        (4 << 56, False, None),
    ]
    for t, backward, expect in cases:
        rows = nearest(df, "s", t, backward).collect()
        if expect is None:
            assert rows == [], (t, backward)
        else:
            assert len(rows) == 1 and rows[0].value == expect, (t, backward)


def test_nearest_asof_vectorized(spark):
    df = make_points(spark, [(1 << 56, 1.0), (2 << 56, 2.0), (3 << 56, 3.0)])
    probes = spark.createDataFrame(
        [("s", (2 << 56) + 1), ("s", 2 << 56), ("s", 0), ("s", 4 << 56)],
        "uuid string, probe_time long",
    )
    back = {r.probe_time: r.value for r in nearest_asof(df, probes, True).collect()}
    assert back[(2 << 56) + 1] == 2.0
    assert back[2 << 56] == 1.0
    assert back[0] is None
    assert back[4 << 56] == 3.0
    fwd = {r.probe_time: r.value for r in nearest_asof(df, probes, False).collect()}
    assert fwd[2 << 56] == 2.0
    assert fwd[(2 << 56) + 1] == 3.0
    assert fwd[0] == 1.0
    assert fwd[4 << 56] is None


def test_nearest_asof_bucketed_matches_flat(spark):
    """The (uuid, bucket)-partitioned as-of join with carry chain must equal
    the single-window-per-uuid answer — including probes in point-free
    buckets, probes before any point, and exact boundary ties."""
    import random

    rng = random.Random(3)
    pts = []
    for u in ("a", "b"):
        t = 0
        for _ in range(400):
            t += rng.randint(1, 2000)  # spans many 2**8 buckets, some empty
            pts.append((u, t, float(rng.randint(0, 1_000_000))))
    probe_rows = [
        (u, rng.randint(0, 900_000)) for u in ("a", "b") for _ in range(300)
    ]
    probe_rows += [(u, t) for (u, t, _) in pts[:20]]  # exact-tie probes
    df = spark.createDataFrame(pts, "uuid string, time long, value double")
    probes = spark.createDataFrame(probe_rows, "uuid string, probe_time long")
    for backward in (True, False):
        flat = {
            (r.uuid, r.probe_time): (r.time, r.value)
            for r in nearest_asof(df, probes, backward).collect()
        }
        bucketed = {
            (r.uuid, r.probe_time): (r.time, r.value)
            for r in nearest_asof(df, probes, backward, bucket_pw=8).collect()
        }
        assert bucketed == flat


def test_validation_filter(spark):
    inf = float("inf")
    rows = [
        ("s", 10, 1.0),
        ("s", 11, float("nan")),
        ("s", 12, inf),
        ("s", 13, -inf),
        ("s", -(16 << 56) - 1, 1.0),
        ("s", (48 << 56) - 1, 1.0),
    ]
    df = spark.createDataFrame(rows, POINTS_SCHEMA)
    assert validate_points(df).count() == 1
    assert invalid_points(df).count() == 5


def test_coalesce_intervals(spark):
    iv = spark.createDataFrame(
        [(0, 10), (10, 20), (25, 30), (27, 40), (50, 60)], "start long, end long"
    )
    got = [(r.start, r.end) for r in coalesce_intervals(iv).collect()]
    assert got == [(0, 20), (25, 40), (50, 60)]


def test_times_to_changed_ranges(spark):
    times = spark.createDataFrame([(5,), (9,), (17,), (64,)], "time long")
    got = [(r.start, r.end) for r in times_to_changed_ranges(times, 3).collect()]
    # buckets: 0 ([0,8)), 1 ([8,16)), 2 ([16,24)), 8 ([64,72)) -> [0,24), [64,72)
    assert got == [(0, 24), (64, 72)]


def test_chunked_coalescing_matches_global(spark):
    """The parallel chunk-and-merge path (phase-1 per-chunk islands + global
    pass over boundary-risky islands only) must produce exactly the global
    single-window answer, including islands spanning many chunks and
    boundary-touching [a,b) [b,c) merges."""
    import random

    rng = random.Random(11)
    cases = []
    for _ in range(6):
        ivs = []
        for _ in range(rng.randint(5, 120)):
            s = rng.randint(0, 4000)
            e = s + rng.randint(1, 300)  # many cross the 2**6=64 chunk width
            ivs.append((s, e))
        cases.append(ivs)
    cases.append([(0, 64), (64, 128), (128, 129)])  # exact-boundary touches
    cases.append([(0, 4000)])  # one island over all chunks
    for ivs in cases:
        df = spark.createDataFrame(ivs, "start long, end long")
        base = [
            (r.start, r.end)
            for r in coalesce_intervals(df).orderBy("start").collect()
        ]
        chunked = [
            (r.start, r.end)
            for r in coalesce_intervals(df, chunk_shift=6).orderBy("start").collect()
        ]
        assert chunked == base

    # per-uuid variant
    rows = [("u%d" % (i % 3), s, e) for i, (s, e) in enumerate(cases[0])]
    df = spark.createDataFrame(rows, "uuid string, start long, end long")
    base = [
        (r.uuid, r.start, r.end)
        for r in coalesce_intervals(df, by_uuid=True).orderBy("uuid", "start").collect()
    ]
    chunked = [
        (r.uuid, r.start, r.end)
        for r in coalesce_intervals(df, by_uuid=True, chunk_shift=6)
        .orderBy("uuid", "start")
        .collect()
    ]
    assert chunked == base


def test_aligned_quantiles_known_values(spark):
    """Exact interpolated quantiles over one bucket: 5 values 1..5 give
    p50=3, p90=4.6 ((n-1)*q interpolation), count=5."""
    from btrdb_server_spark.operators.stat import aligned_quantiles

    pts = spark.createDataFrame(
        [("s", t, float(v)) for t, v in zip(range(100, 105), [1, 2, 3, 4, 5])],
        "uuid string, time long, value double",
    )
    rows = aligned_quantiles(pts, "s", 0, 1 << 20, 10, qs=(0.5, 0.9)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.time == 0 and r["count"] == 5
    assert r.p50 == 3.0 and abs(r.p90 - 4.6) < 1e-12


def test_gaps_and_rate_derived_streams(spark):
    from btrdb_server_spark.operators.derive import gaps, rate

    pts = spark.createDataFrame(
        [
            ("s", 0, 10.0),
            ("s", 1_000_000_000, 13.0),        # +3 over 1s  -> rate 3
            ("s", 11_000_000_000, 13.0),       # 10s gap     -> rate 0
            ("s", 12_000_000_000, 10.0),       # -3 over 1s  -> rate -3
            ("other", 2_000_000_000, 99.0),    # different stream: ignored
        ],
        "uuid string, time long, value double",
    )
    g = gaps(pts, "s", 0, 1 << 40, min_gap=5_000_000_000).collect()
    assert [(r.gap_start, r.gap_end, r.gap_ns) for r in g] == [
        (1_000_000_000, 11_000_000_000, 10_000_000_000)
    ]
    r = rate(pts, "s", 0, 1 << 40).collect()
    assert [x.rate_per_sec for x in r] == [3.0, 0.0, -3.0]
    assert [x.time for x in r] == [1_000_000_000, 11_000_000_000, 12_000_000_000]


def test_decimate_envelope_extremes_with_exact_times(spark):
    from btrdb_server_spark.operators.stat import decimate_envelope

    pts = spark.createDataFrame(
        [("s", t, v) for t, v in [(0, 5.0), (10, 1.0), (20, 9.0), (30, 9.0)]],
        "uuid string, time long, value double",
    )
    rows = decimate_envelope(pts, "s", 0, 1 << 10, 10).collect()
    got = {(r.kind): (r.time, r.value) for r in rows}
    assert got["min"] == (10, 1.0)
    assert got["max"] == (20, 9.0)  # tie on value 9.0 -> earliest time


def test_decimate_envelope_partial_agg_no_window(spark):
    """Both extremes must ride one map-side-combinable aggregation: a
    two-phase HashAggregate, no window sort, <= 2 rows out per bucket —
    the O(pixels) plotting path at any input density."""
    from btrdb_server_spark.operators.stat import decimate_envelope
    from btrdb_server_spark.sources.testdata import load_points

    df = decimate_envelope(
        load_points(spark, "/root/testdata/sf0.001"), "click", 0, 1 << 62, 40
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("HashAggregate") >= 2 or plan.count("SortAggregate") >= 2


def test_gaps_and_rate_bucketed_matches_flat(spark):
    """Scale path: (uuid, bucket)-partitioned lag + carry chain must be
    point-for-point identical to the flat per-stream window, including
    pairs that straddle bucket boundaries and empty intermediate buckets."""
    import random

    from btrdb_server_spark.operators.derive import gaps, rate

    rng = random.Random(7)
    # Cluster points so many 2**20-ns buckets are empty and several pairs
    # cross bucket boundaries.
    rows = [
        ("s", t, round(rng.uniform(-5, 5), 2))
        for t in sorted(rng.sample(range(0, 200 * (1 << 20)), 400))
    ] + [("other", 5, 1.0)]
    pts = spark.createDataFrame(rows, "uuid string, time long, value double")

    flat_g = gaps(pts, "s", 0, 1 << 40, min_gap=1 << 19).collect()
    buck_g = gaps(pts, "s", 0, 1 << 40, min_gap=1 << 19, bucket_pw=20).collect()
    assert [tuple(r) for r in buck_g] == [tuple(r) for r in flat_g]
    assert len(flat_g) > 5  # the fixture actually exercises gaps

    flat_r = rate(pts, "s", 0, 1 << 40).collect()
    buck_r = rate(pts, "s", 0, 1 << 40, bucket_pw=20).collect()
    assert [tuple(r) for r in buck_r] == [tuple(r) for r in flat_r]
    assert len(flat_r) == 399

    from btrdb_server_spark.operators.derive import sessions

    flat_s = sessions(pts, "s", 0, 1 << 40, gap=1 << 19).collect()
    buck_s = sessions(pts, "s", 0, 1 << 40, gap=1 << 19, bucket_pw=20).collect()
    assert [tuple(r) for r in buck_s] == [tuple(r) for r in flat_s]
    # Sessions and gaps are duals: n_sessions == n_gaps + 1, ids contiguous,
    # sessions partition the points.
    n_gaps = len(flat_g)
    assert len(flat_s) == n_gaps + 1
    assert [r.session_id for r in flat_s] == list(range(len(flat_s)))
    assert sum(r.n_points for r in flat_s) == 400
    for a, b in zip(flat_s, flat_s[1:]):
        assert b.session_start - a.session_end >= 1 << 19  # split at gaps
        assert a.session_end < b.session_start


def test_bucketed_lag_plan_partitions_by_bucket(spark):
    """With bucket_pw set, no point-scale window may partition by uuid
    alone: every WindowExec over the points either includes the bucket key
    or runs on the metadata-sized carry side (one row per non-empty
    bucket). Guards the 100 TB property that a dense stream fans out."""
    from btrdb_server_spark.operators.derive import _lagged
    from btrdb_server_spark.sources.testdata import load_points

    df = _lagged(load_points(spark, "/root/testdata/sf0.001"), "click", 0, 1 << 62, bucket_pw=40)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected window specs in the bucketed-lag plan"
    # The point-scale lag spec must carry both uuid and bucket keys.
    assert any("uuid" in s and "bucket" in s for s in specs)


def test_bucketed_sessions_plan_partitions_by_bucket(spark):
    """sessions(bucket_pw=...) must keep BOTH window passes off the
    uuid-only partitioning: the point-scale cumulative sum carries the
    bucket key; only the carry/offset windows (one row per non-empty
    bucket) may partition by uuid alone."""
    import re

    from btrdb_server_spark.operators.derive import sessions
    from btrdb_server_spark.sources.testdata import load_points

    df = sessions(
        load_points(spark, "/root/testdata/sf0.001"),
        "click",
        0,
        1 << 62,
        gap=1 << 40,
        bucket_pw=40,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected window specs in the bucketed sessions plan"
    assert any("uuid" in s and "bucket" in s for s in specs)


def test_aligned_quantiles_labels_unique(spark):
    from btrdb_server_spark.operators.stat import aligned_quantiles

    pts = spark.createDataFrame(
        [("s", t, float(t)) for t in range(100, 200)],
        "uuid string, time long, value double",
    )
    df = aligned_quantiles(pts, "s", 0, 1 << 20, 10, qs=(0.99, 0.999, 0.125))
    assert df.columns[:3] == ["time", "p99", "p99_9"]
    assert "p12_5" in df.columns


def test_value_histogram_bins_and_contract(spark):
    import pytest

    from btrdb_server_spark.operators.stat import value_histogram

    pts = spark.createDataFrame(
        [("s", i, v) for i, v in enumerate([-0.3, -0.25, -0.01, 0.0, 0.1, 0.25, 0.26, 5.0])]
        + [("other", 1, 99.0)],
        "uuid string, time long, value double",
    )
    rows = {r.bin: (r.bin_lo, r.cnt) for r in
            value_histogram(pts, "s", 0, 100, bin_width=0.25).collect()}
    # floor semantics: [-0.3) -> bin -2; [-0.25, -0.01) -> bin -1;
    # [0, 0.25) -> bin 0 (x3); [0.25, 0.5) -> bin 1 (x2); 5.0 -> bin 20
    assert rows == {
        -2: (-0.5, 1),
        -1: (-0.25, 2),
        0: (0.0, 2),
        1: (0.25, 2),
        20: (5.0, 1),
    }
    with pytest.raises(ValueError):
        value_histogram(pts, "s", 0, 100, bin_width=0.3)


def test_rate_anomaly_period_derived_not_hardcoded(spark):
    """The seasonal period is day_ns // hour_ns — NOT a literal 24 — so
    synthetic granularities work: with day_ns = 4 * hour_ns the baseline
    has 4 slots and a recurring burst in slot 2 of every 'day' is BASELINE
    (not anomalous), while a burst in a normally-quiet slot pages. A
    non-divisible (hour_ns, day_ns) pair must raise."""
    import pytest as _pytest

    from btrdb_server_spark.operators.stat import rate_anomaly

    H = 1000  # synthetic hour
    D = 4 * H  # synthetic day: period 4
    # 3 base days: slot 2 carries 5 events per day, other slots 1 per day.
    rows = []
    for d in range(3):
        for s in range(4):
            n = 5 if s == 2 else 1
            for i in range(n):
                rows.append(("u", d * D + s * H + i, 1.0))
    # score day 3: slot 2 again 5 (normal); slot 1 gets 9 (anomalous spike)
    for i in range(5):
        rows.append(("u", 3 * D + 2 * H + i, 1.0))
    for i in range(9):
        rows.append(("u", 3 * D + 1 * H + i, 1.0))
    pts = spark.createDataFrame(rows, "uuid string, time long, value double")
    got = rate_anomaly(pts, 0, 3, 1, H, D, z_cut=2.0).collect()
    assert [(r.hod, r.k) for r in got] == [(1, 9)]  # only the true spike
    with _pytest.raises(ValueError):
        rate_anomaly(pts, 0, 3, 1, 1000, 2500, z_cut=2.0)
