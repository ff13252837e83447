"""Round-5 derived/stat-plane operators: grid resampling, reset-aware
counter increase, trapezoidal integral, bucket-local z-score anomalies,
cross-stream correlation, LTTB plot decimation.

Known-value tests on tiny hand-built streams plus bucketed-vs-flat
equivalence for the carry-chain scale paths (the same strategy the
reference's qtree tests use for its descent paths: fixed inputs, exact
expected outputs)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from btrdb_server_spark.operators.corr import stream_corr
from btrdb_server_spark.operators.derive import counter_increase, trapz_integral
from btrdb_server_spark.operators.resample import resample
from btrdb_server_spark.operators.stat import anomaly_zscore, lttb_decimate

S = 1_000_000_000  # 1 s in ns


def mk(spark, rows):
    return spark.createDataFrame(rows, "uuid string, time long, value double")


# ------------------------------------------------------------- resample ---


def test_resample_hold_known_values(spark):
    pts = mk(
        spark,
        [("a", 10 * S, 1.0), ("a", 25 * S, 2.0), ("a", 40 * S, 3.0)],
    )
    out = resample(pts, "a", 0, 60 * S, 10 * S, mode="hold").collect()
    assert [(r.time // S, r.value) for r in out] == [
        (0, None),  # before first point
        (10, 1.0),  # exactly on a point: inclusive
        (20, 1.0),
        (30, 2.0),
        (40, 3.0),  # exactly on a point
        (50, 3.0),  # held past the last point
    ]


def test_resample_linear_known_values(spark):
    pts = mk(spark, [("a", 10 * S, 1.0), ("a", 30 * S, 3.0)])
    out = resample(pts, "a", 0, 50 * S, 10 * S, mode="linear").collect()
    got = [(r.time // S, r.value) for r in out]
    assert got[0] == (0, None)  # no left bracket
    assert got[1] == (10, 1.0)  # on-point: weight 0, bit-exact value
    assert got[2] == (20, 2.0)  # midpoint
    assert got[3] == (30, 3.0)  # on-point (last)
    assert got[4] == (40, None)  # no right bracket


def test_resample_bucketed_matches_flat(spark, sf_dir):
    from btrdb_server_spark.sources.testdata import load_points

    T0 = 1_704_067_200_000_000_000
    pts = load_points(spark, sf_dir, T0, T0 + 86_400_000_000_000)
    for mode in ("hold", "linear"):
        flat = resample(
            pts, "click", T0, T0 + 86_400_000_000_000, 3_600_000_000_000, mode=mode
        ).collect()
        buck = resample(
            pts,
            "click",
            T0,
            T0 + 86_400_000_000_000,
            3_600_000_000_000,
            mode=mode,
            bucket_pw=40,
        ).collect()
        assert [tuple(r) for r in flat] == [tuple(r) for r in buck]


# ------------------------------------------------- counter / integral ----


def test_counter_increase_reset_semantics(spark):
    # counter: 1.00 -> 3.00 (+2.00) -> 0.50 (reset: +0.50) -> 2.50 (+2.00)
    pts = mk(
        spark,
        [
            ("c", 1 * S, 1.0),
            ("c", 2 * S, 3.0),
            ("c", 11 * S, 0.5),
            ("c", 12 * S, 2.5),
        ],
    )
    out = counter_increase(pts, "c", 0, 20 * S, 10 * S).collect()
    assert [(r.time // S, round(r.increase, 2), r.n_deltas) for r in out] == [
        (0, 2.0, 1),  # first point contributes nothing
        (10, 2.5, 2),  # reset (+0.5) then +2.0
    ]


def test_trapz_integral_known_value(spark):
    # two points 10 s apart at 1.00 and 3.00: integral = (1+3)/2 * 10 = 20
    pts = mk(spark, [("c", 0, 1.0), ("c", 10 * S, 3.0)])
    out = trapz_integral(pts, "c", 0, 20 * S, 20 * S).collect()
    assert len(out) == 1
    assert out[0].integral_vs == pytest.approx(20.0, abs=1e-9)


def test_counter_and_integral_bucketed_match_flat(spark, sf_dir):
    from btrdb_server_spark.sources.testdata import load_points

    T0 = 1_704_067_200_000_000_000
    T1 = T0 + 7 * 86_400_000_000_000
    pts = load_points(spark, sf_dir, T0, T1)
    for fn in (counter_increase, trapz_integral):
        flat = fn(pts, "signup", T0, T1, 86_400_000_000_000).collect()
        buck = fn(pts, "signup", T0, T1, 86_400_000_000_000, bucket_pw=40).collect()
        assert [tuple(r) for r in flat] == [tuple(r) for r in buck]


# ------------------------------------------------------------- zscore ----


def test_anomaly_zscore_flags_outlier(spark):
    # bucket of 9 points at 1.00 and one at 100.00 -> the spike has
    # z = (q*n - sq)/sqrt(n*sqq - sq^2) with q in cents
    rows = [("a", i * S, 1.0) for i in range(9)] + [("a", 9 * S, 100.0)]
    pts = mk(spark, rows)
    out = anomaly_zscore(pts, "a", 0, 1 << 44, pw=44, threshold=2.0).collect()
    assert len(out) == 1
    assert out[0].time == 9 * S and out[0].value == 100.0
    n, sq, sqq = 10, 9 * 100 + 10000, 9 * 100**2 + 10000**2
    expect = (10000 * n - sq) / math.sqrt(n * sqq - sq * sq)
    assert out[0].zscore == pytest.approx(expect, rel=1e-12)


def test_anomaly_zscore_zero_variance_bucket_silent(spark):
    pts = mk(spark, [("a", i * S, 2.0) for i in range(5)])
    assert anomaly_zscore(pts, "a", 0, 1 << 44, pw=44).count() == 0


# --------------------------------------------------------------- corr ----


def test_stream_corr_perfect_and_anti(spark):
    # x buckets (1 s apart, pw=30 ~= 1.07 s buckets): a == b scaled -> +1;
    # c anti-moves -> corr(a, c) == -1 on two buckets.
    pw = 30
    w = 1 << pw
    rows = []
    for i, (va, vc) in enumerate([(1.0, 3.0), (3.0, 1.0)]):
        rows += [("a", i * w + 5, va), ("b", i * w + 7, 2 * va), ("c", i * w + 9, vc)]
    pts = mk(spark, rows)
    out = {(r.uuid_a, r.uuid_b): r.corr for r in stream_corr(pts, 0, 2 * w, pw).collect()}
    assert out[("a", "b")] == pytest.approx(1.0, abs=1e-12)
    assert out[("a", "c")] == pytest.approx(-1.0, abs=1e-12)
    assert out[("b", "c")] == pytest.approx(-1.0, abs=1e-12)


def test_stream_corr_zero_variance_is_null(spark):
    pw = 30
    w = 1 << pw
    rows = [("a", 5, 1.0), ("a", w + 5, 1.0), ("b", 6, 1.0), ("b", w + 6, 2.0)]
    pts = mk(spark, rows)
    out = stream_corr(pts, 0, 2 * w, pw).collect()
    assert len(out) == 1 and out[0].corr is None  # 'a' has constant bucket sums


# --------------------------------------------------------------- lttb ----


def test_lttb_picks_spike_and_pins_endpoints(spark):
    pw = 33  # ~8.6 s buckets
    w = 1 << pw
    rows = (
        # bucket 0: two points — no left neighbor, keep EARLIEST
        [("a", 1 * S, 5.0), ("a", 2 * S, 9.0)]
        # bucket 1: flat line plus one spike — spike wins the triangle
        + [("a", w + i * S, 1.0) for i in range(5)]
        + [("a", w + 5 * S, 50.0)]
        # bucket 2: two points — no right neighbor, keep LATEST
        + [("a", 2 * w + 1 * S, 2.0), ("a", 2 * w + 2 * S, 7.0)]
    )
    pts = mk(spark, rows)
    out = lttb_decimate(pts, "a", 0, 3 * w, pw).collect()
    assert len(out) == 3
    assert (out[0].time, out[0].value) == (1 * S, 5.0)  # earliest in first
    assert (out[1].time, out[1].value) == (w + 5 * S, 50.0)  # the spike
    assert (out[2].time, out[2].value) == (2 * w + 2 * S, 7.0)  # latest in last


def test_lttb_one_point_per_bucket(spark):
    from btrdb_server_spark.sources.testdata import load_points

    T0 = 1_704_067_200_000_000_000
    pts = load_points(spark, sf_dir="/root/testdata/sf0.001", start=T0)
    out = lttb_decimate(pts, "view", T0, T0 + (1 << 45), pw=43)
    rows = out.collect()
    assert len(rows) == len({r.bucket_time for r in rows})  # one per bucket
    assert rows == sorted(rows, key=lambda r: r.time)


# ---------------------------------------------------------------- bpe -----


def test_bpe_train_known_merges(spark):
    # corpus: "aa ab aa" x freq — pair (a,a) appears twice (from two "aa"),
    # (a,b) once. First merge: (a,a). After it "aa" -> ["aa"], so step 2
    # merges (a,b).
    docs = spark.createDataFrame(
        [(1, "aa ab"), (2, "aa")], "doc_id long, text string"
    )
    from btrdb_server_spark.functions.bpe import bpe_train

    rules = [tuple(r) for r in bpe_train(docs, num_merges=2).collect()]
    assert rules == [(1, "a", "a", "aa", 2), (2, "a", "b", "ab", 1)]


def test_bpe_merge_greedy_non_overlapping(spark):
    # "aaaa": pairs (a,a) x3 -> merge yields [aa, aa], not [aa, aaa...]
    docs = spark.createDataFrame([(1, "aaaa")], "doc_id long, text string")
    from btrdb_server_spark.functions.bpe import bpe_train

    rules = [tuple(r) for r in bpe_train(docs, num_merges=2).collect()]
    assert rules[0] == (1, "a", "a", "aa", 3)
    # step 2: the only remaining adjacent pair is (aa, aa)
    assert rules[1] == (2, "aa", "aa", "aaaa", 1)


def test_bpe_tie_breaks_lexicographic(spark):
    docs = spark.createDataFrame([(1, "xy za")], "doc_id long, text string")
    from btrdb_server_spark.functions.bpe import bpe_train

    rules = [tuple(r) for r in bpe_train(docs, num_merges=1).collect()]
    assert rules == [(1, "x", "y", "xy", 1)]  # (x,y) < (z,a) at equal count


# --------------------------------------------------------- plan shapes ----


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_stream_corr_no_window_no_cartesian_points(spark):
    """stream_corr: the point-scale side is ONE partial-aggregated groupBy;
    no window functions anywhere, and the only cross join is on the
    stream-count-sized marginal table."""
    from btrdb_server_spark.sources.testdata import load_points

    df = stream_corr(
        load_points(spark, "/root/testdata/sf0.001"), 0, 1 << 62, pw=42
    )
    plan = _plan(df)
    assert "Window" not in plan
    assert "partial_sum" in plan or "partial" in plan.lower()


def test_lttb_no_window_functions(spark):
    """lttb_decimate argmaxes via struct max — the plan must carry no
    WindowExec (a per-bucket row_number would sort point-scale data)."""
    from btrdb_server_spark.sources.testdata import load_points

    df = lttb_decimate(
        load_points(spark, "/root/testdata/sf0.001"), "view", 0, 1 << 62, pw=43
    )
    assert "Window" not in _plan(df)


def test_resample_bucketed_windows_carry_bucket_key(spark):
    """resample(bucket_pw=...): every point-scale window spec must include
    the bucket key next to uuid (the carry chain is the only uuid-alone
    window and it is bucket-count sized)."""
    import re

    from btrdb_server_spark.sources.testdata import load_points

    df = resample(
        load_points(spark, "/root/testdata/sf0.001"),
        "click",
        0,
        1 << 50,
        1 << 42,
        mode="hold",
        bucket_pw=44,
    )
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", _plan(df))
    assert specs
    assert any("bucket" in s for s in specs)


def test_resample_pushes_time_predicate(spark):
    """The stream + range predicate must reach the parquet scan."""
    from btrdb_server_spark.sources.testdata import load_points

    T0 = 1_704_067_200_000_000_000
    df = resample(
        load_points(spark, "/root/testdata/sf0.001"),
        "click",
        T0,
        T0 + (1 << 44),
        1 << 40,
        mode="hold",
    )
    plan = _plan(df)
    assert "PushedFilters" in plan and "event_type" in plan


# ------------------------------------------- ewma / cusum / trend_ols ----


def test_ewma_exact_recurrence_flat(spark):
    vals = [4.0, 8.0, 2.0, 6.0, 10.0, 0.0, 4.0, 8.0]
    pts = mk(spark, [("a", i * S, v) for i, v in enumerate(vals)])
    from btrdb_server_spark.operators.derive import ewma

    out = ewma(pts, "a", 0, 100 * S, alpha=0.25).collect()
    s, exp = None, []
    for v in vals:
        s = v if s is None else 0.25 * v + 0.75 * s
        exp.append(s)
    assert [r.ewma for r in out] == exp  # bit-exact: same fold order


def test_ewma_bucketed_matches_flat_to_rounding(spark):
    vals = [4.0, 8.0, 2.0, 6.0, 10.0, 0.0, 4.0, 8.0, 1.0, 9.0]
    pts = mk(spark, [("a", i * S, v) for i, v in enumerate(vals)])
    from btrdb_server_spark.operators.derive import ewma

    flat = ewma(pts, "a", 0, 100 * S, alpha=0.25).collect()
    buck = ewma(pts, "a", 0, 100 * S, alpha=0.25, bucket_pw=31).collect()
    assert len(flat) == len(buck)
    for f, b in zip(flat, buck):
        assert (f.time, f.value) == (b.time, b.value)
        assert b.ewma == pytest.approx(f.ewma, rel=1e-12)


def test_cusum_changepoint_finds_level_shift(spark):
    # 10 points at 1.00 then 10 at 5.00: the max centered deviation is at
    # the last low point (the prefix of the low regime).
    rows = [("a", i * S, 1.0) for i in range(10)] + [
        ("a", (10 + i) * S, 5.0) for i in range(10)
    ]
    pts = mk(spark, rows)
    from btrdb_server_spark.operators.derive import cusum_changepoint

    out = cusum_changepoint(pts, "a", 0, 100 * S).collect()
    assert len(out) == 1
    assert out[0].time == 9 * S  # last point of the first regime
    # score = |n*prefix_i - i*total| = |20*10*100 - 10*(10*100+10*500)|
    assert out[0].score == abs(20 * 1000 - 10 * 6000)
    assert out[0].n == 20


def test_cusum_bucketed_matches_flat(spark, sf_dir):
    from btrdb_server_spark.operators.derive import cusum_changepoint
    from btrdb_server_spark.sources.testdata import load_points

    T0 = 1_704_067_200_000_000_000
    pts = load_points(spark, sf_dir, T0, T0 + 30 * 86_400_000_000_000)
    flat = cusum_changepoint(pts, "click", T0, T0 + 30 * 86_400_000_000_000)
    buck = cusum_changepoint(
        pts, "click", T0, T0 + 30 * 86_400_000_000_000, bucket_pw=40
    )
    assert [tuple(r) for r in flat.collect()] == [tuple(r) for r in buck.collect()]


def test_trend_ols_exact_line(spark):
    # y = 2 + 3t (t in seconds): slope 3/s, intercept 2 — exact recovery.
    pts = mk(spark, [("a", i * S, 2.0 + 3.0 * i) for i in range(5)])
    from btrdb_server_spark.operators.stat import trend_ols

    out = trend_ols(pts, "a", 0, 10 * S, 10 * S).collect()
    assert len(out) == 1
    assert out[0].slope_per_sec == pytest.approx(3.0, rel=1e-12)
    assert out[0].intercept == pytest.approx(2.0, rel=1e-12)
    assert out[0].n == 5


def test_trend_ols_degenerate_window_null(spark):
    pts = mk(spark, [("a", 5, 1.0)])  # one point: no slope
    from btrdb_server_spark.operators.stat import trend_ols

    out = trend_ols(pts, "a", 0, 10 * S, 10 * S).collect()
    assert out[0].slope_per_sec is None and out[0].intercept is None
    assert out[0].n == 1


# ---------------------------------------------------------- knn graph ----


def test_knn_graph_within_cluster_topk(spark):
    # Two obvious clusters on the axes: centroids = first 2 vectors.
    # Neighbors never cross clusters; ranks order by cosine.
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, [0.8, 0.2, 0.0]),
        (4, [0.1, 0.9, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    from btrdb_server_spark.functions.similarity import (
        centroids_from_rows,
        knn_graph,
    )

    g = knn_graph(emb, centroids_from_rows(emb, k=2), k=2).collect()
    by_vec = {}
    for r in g:
        by_vec.setdefault(r.vec_id, []).append(r.neighbor)
    assert by_vec[0] == [2, 3]  # closest first
    assert by_vec[1] == [4]  # only one co-cluster member
    assert set(by_vec[2]) <= {0, 3}
    assert all(n in (1,) or n in (0, 2, 3, 4) for ns in by_vec.values() for n in ns)
    # no self-edges, ranks contiguous from 1
    assert all(r.neighbor != r.vec_id for r in g)
    for vid, ns in by_vec.items():
        ranks = sorted(r.rank for r in g if r.vec_id == vid)
        assert ranks == list(range(1, len(ns) + 1))


def test_autocorr_detects_period(spark):
    """Alternating bucket sums (period 2): acf(2) = +1-ish, acf(1)
    strongly negative; exact ints make the expectation computable."""
    pw = 30
    w = 1 << pw
    # buckets 0..7 with sums alternating 1.00 / 3.00 (one point each)
    rows = [("a", i * w + 5, 1.0 if i % 2 == 0 else 3.0) for i in range(8)]
    pts = mk(spark, rows)
    from btrdb_server_spark.operators.corr import autocorr

    out = {r.lag: r.acf for r in autocorr(pts, "a", 0, 8 * w, pw, lags=(1, 2)).collect()}
    # x = [100,300]*4 cents, mu=200: num(1) = sum of 7 terms (+-100*100)
    # alternating -> all -10000: acf(1) = 7*(-1e4)/ (8*1e4) = -0.875
    assert out[1] == pytest.approx(-0.875, abs=1e-12)
    assert out[2] == pytest.approx(0.75, abs=1e-12)  # 6 terms of +1e4 / 8e4


def test_autocorr_matches_numpy(spark, sf_dir):
    import numpy as np

    from btrdb_server_spark.operators.corr import autocorr
    from btrdb_server_spark.sources.testdata import load_points

    T0 = 1_704_067_200_000_000_000
    T1 = T0 + 7 * 86_400_000_000_000
    pw = 42
    pts = load_points(spark, sf_dir, T0, T1)
    got = {
        r.lag: r.acf
        for r in autocorr(pts, "click", T0, T1, pw, lags=(1, 3)).collect()
    }
    fs = T0 & ~((1 << pw) - 1)
    fe = T1 & ~((1 << pw) - 1)
    n = (fe - fs) >> pw
    x = np.zeros(n)
    for r in pts.where(pts.uuid == "click").collect():
        if fs <= r.time < fe:
            x[(r.time - fs) >> pw] += round(r.value / 0.01)
    mu = x.mean()
    den = ((x - mu) ** 2).sum()
    for lag in (1, 3):
        num = ((x[:-lag] - mu) * (x[lag:] - mu)).sum()
        assert got[lag] == pytest.approx(num / den, rel=1e-9)


# -------------------------------------------------------- event plane ----


def test_props_histogram_and_user_activity(spark):
    rows = [
        (1, "click", 1.0, 10, '{"k": 5}'),
        (2, "click", 2.0, 10, '{"k": 5}'),
        (3, "view", 3.0, 11, '{"k": 7}'),
        (4, "view", 0.5, 10, None),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, value double, user_id long, props string"
    )
    from btrdb_server_spark.operators.events import props_histogram, user_activity

    h = {(r.event_type, r.k): r.cnt for r in props_histogram(ev).collect()}
    assert h == {("click", 5): 2, ("view", 7): 1}  # null props dropped
    ua = {r.user_id: r for r in user_activity(ev).collect()}
    assert (ua[10].n_click, ua[10].n_view, ua[10].total_q, ua[10].n_events) == (
        2, 1, 350, 3
    )
    assert (ua[11].n_view, ua[11].total_q) == (1, 300)


def test_sax_symbols_known_alphabet(spark):
    # Four 1-point windows with values producing z = -1.34, -0.45, +0.45,
    # +1.34 (symmetric) -> symbols a, b, c, d.
    pts = mk(
        spark,
        [("a", 0, 1.0), ("a", 10 * S, 2.0), ("a", 20 * S, 3.0), ("a", 30 * S, 4.0)],
    )
    from btrdb_server_spark.operators.stat import sax_symbols

    out = sax_symbols(pts, "a", 0, 40 * S, 10 * S).collect()
    assert [r.symbol for r in out] == ["a", "b", "c", "d"]
    assert [r.cnt for r in out] == [1, 1, 1, 1]


def test_sax_symbols_hole_is_null(spark):
    pts = mk(spark, [("a", 0, 1.0), ("a", 25 * S, 3.0)])
    from btrdb_server_spark.operators.stat import sax_symbols

    out = sax_symbols(pts, "a", 0, 30 * S, 10 * S).collect()
    assert out[1].symbol is None and out[1].cnt == 0


def test_minhash_jaccard_est_bounds_and_exactness(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different text about spark engines here"),
        ],
        "doc_id long, text string",
    )
    from btrdb_server_spark.functions.dedup import minhash_jaccard_est

    rows = minhash_jaccard_est(docs).collect()
    for r in rows:
        assert 0 <= r.matches <= 16
        assert r.est_jaccard == r.matches / 16.0  # dyadic exact
    est = {(r.a, r.b): r.est_jaccard for r in rows}
    if (1, 2) in est:  # near-dup pair collides in some band
        assert est[(1, 2)] > 0.4


def test_knn_graph_assignment_broadcasts_centroids(spark):
    """The corpus side must never shuffle for the assignment: the centroid
    join is a BroadcastHashJoin."""
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    from btrdb_server_spark.functions.similarity import (
        centroids_from_rows,
        knn_graph,
    )

    plan = _plan(knn_graph(emb, centroids_from_rows(emb, k=2), k=2))
    # The assigned table localCheckpoints, so the broadcast-scoring
    # subtree sits behind the checkpoint boundary (invisible here); what
    # the outer plan must show is that the ONLY shuffle join left is the
    # pair self-join on the cluster key — the ivf_assign+join-back shape
    # this replaced carried two more SortMergeJoins on the id.
    assert plan.count("SortMergeJoin") <= 1


def test_value_run_lengths_flatline(spark):
    rows = [("a", 1 * S, 5.0), ("a", 2 * S, 5.0), ("a", 3 * S, 5.0),
            ("a", 4 * S, 7.0), ("a", 5 * S, 5.0)]
    pts = mk(spark, rows)
    from btrdb_server_spark.operators.derive import value_run_lengths

    out = value_run_lengths(pts, "a", 0, 10 * S, min_run=2).collect()
    assert len(out) == 1  # only the 3-point flatline
    r = out[0]
    assert (r.run_start, r.run_end, r.n_points, r.value) == (1 * S, 3 * S, 3, 5.0)


def test_value_run_lengths_bucketed_matches_flat(spark):
    rows = [("a", i * S, float(v)) for i, v in
            enumerate([1, 1, 2, 2, 2, 3, 1, 1])]
    pts = mk(spark, rows)
    from btrdb_server_spark.operators.derive import value_run_lengths

    flat = value_run_lengths(pts, "a", 0, 10 * S, min_run=1).collect()
    buck = value_run_lengths(pts, "a", 0, 10 * S, min_run=1, bucket_pw=31).collect()
    assert [tuple(r) for r in flat] == [tuple(r) for r in buck]


def test_deadband_compress_keeps_exceptions_only(spark):
    rows = [("a", 1 * S, 0.0), ("a", 2 * S, 0.1), ("a", 3 * S, 0.6),
            ("a", 4 * S, 0.55), ("a", 5 * S, 1.2)]
    pts = mk(spark, rows)
    from btrdb_server_spark.operators.derive import deadband_compress

    out = deadband_compress(pts, "a", 0, 10 * S, deadband=0.3).collect()
    # keep first (0.0); 0.1 inside band; 0.6 kept; 0.55 inside band of
    # 0.6; 1.2 kept (vs 0.6)
    assert [(r.time // S, r.value) for r in out] == [(1, 0.0), (3, 0.6), (5, 1.2)]


def test_deadband_compress_duplicate_time_tiebreak(spark):
    # Two points share time=1s: the fold must visit them in (time, value)
    # order — the sort_array struct order of the original Catalyst fold —
    # so 0.0 is the first/kept point, 0.2 is inside its band, and 0.5 is
    # kept vs 0.0.  Visiting 0.2 first would instead keep {0.2} only.
    rows = [("a", 1 * S, 0.2), ("a", 1 * S, 0.0), ("a", 2 * S, 0.5)]
    pts = mk(spark, rows)
    from btrdb_server_spark.operators.derive import deadband_compress

    out = deadband_compress(pts, "a", 0, 10 * S, deadband=0.3).collect()
    assert [(r.time // S, r.value) for r in out] == [(1, 0.0), (2, 0.5)]


def test_hash_sample_deterministic_and_bounded(spark):
    rows = [("a", i, float(i % 7)) for i in range(100)] + [
        ("b", i, 1.0) for i in range(5)
    ]
    pts = mk(spark, rows)
    from btrdb_server_spark.operators.raw import hash_sample

    s1 = [tuple(r) for r in hash_sample(pts, 0, 1000, k=10).collect()]
    s2 = [tuple(r) for r in hash_sample(pts.repartition(7), 0, 1000, k=10).collect()]
    assert s1 == s2  # partitioning-independent
    by_uuid = {}
    for u, t, v, rk in s1:
        by_uuid.setdefault(u, []).append(rk)
    assert len(by_uuid["a"]) == 10 and by_uuid["a"] == list(range(1, 11))
    assert len(by_uuid["b"]) == 5  # short stream: every point, ranks 1..5


def test_diurnal_profile_exact_hours(spark):
    H = 3_600_000_000_000
    rows = [("a", 0 * H + 5, 1.0), ("a", 24 * H + 7, 3.0),  # hour 0 twice
            ("a", 5 * H + 9, 7.0)]  # hour 5 once
    pts = mk(spark, rows)
    from btrdb_server_spark.operators.stat import diurnal_profile

    out = {r.hour: r for r in diurnal_profile(pts, "a", 0, 48 * H).collect()}
    assert len(out) == 24
    assert (out[0].cnt, out[0].mean) == (2, pytest.approx(2.0))
    assert (out[5].cnt, out[5].mean) == (1, pytest.approx(7.0))
    assert out[3].cnt == 0 and out[3].mean is None


def test_funnel_strict_ordering(spark):
    # u1 completes all three in order; u2 clicks BEFORE its first view
    # (click must not count); u3 views only.
    rows = [
        (10, "view", 1.0, 1), (20, "click", 1.0, 1), (30, "purchase", 1.0, 1),
        (10, "click", 1.0, 2), (20, "view", 1.0, 2),
        (10, "view", 1.0, 3),
    ]
    ev = spark.createDataFrame(
        rows, "ts long, event_type string, value double, user_id long"
    )
    from btrdb_server_spark.operators.events import funnel

    out = {r.step: (r.event_type, r.users) for r in funnel(ev).collect()}
    assert out == {1: ("view", 3), 2: ("click", 1), 3: ("purchase", 1)}


def test_retention_cohorts_known_triangle(spark):
    W = 7 * 86_400_000_000_000
    # u1 joins week 0, active weeks 0 and 2; u2 joins week 1, active week 1.
    rows = [(1, 0), (1, 2 * W + 5), (2, W + 3), (1, 10)]  # dup week-0 row for u1
    ev = spark.createDataFrame(rows, "user_id long, time long")
    from btrdb_server_spark.operators.events import retention_cohorts

    out = {(r.cohort_week, r.week_offset): r.users
           for r in retention_cohorts(ev, 0).collect()}
    assert out == {(0, 0): 1, (0, 2): 1, (1, 0): 1}


def test_ohlc_windows_lexicographic_ties(spark):
    # pw=2 -> 4 ns buckets. Bucket 0: points at t=1 (vals 5.0 and 2.0 —
    # duplicate timestamp, open resolves to the smaller value) and t=3.
    # Bucket 4..7 empty -> omitted. Bucket 8: single point.
    pts = mk(spark, [("a", 1, 5.0), ("a", 1, 2.0), ("a", 3, 1.0), ("a", 9, 7.0)])
    from btrdb_server_spark.operators.stat import ohlc_windows

    out = {r.time: r for r in ohlc_windows(pts, "a", 0, 12, 2).collect()}
    assert set(out) == {0, 8}
    b0 = out[0]
    assert (b0.open, b0.high, b0.low, b0.close, b0.cnt) == (2.0, 5.0, 1.0, 1.0, 3)
    assert (out[8].open, out[8].close, out[8].cnt) == (7.0, 7.0, 1)


def test_xcorr_lags_detects_shift(spark):
    # Stream b is stream a delayed by exactly 2 buckets (pw=0 -> 1 ns
    # buckets): the cross-correlation peaks at lag +2 with r ~= 1.
    a = [("a", t, (t + 1) * 0.01) for t in range(6)]
    b = [("b", t + 2, (t + 1) * 0.01) for t in range(6)]
    pts = mk(spark, a + b)
    from btrdb_server_spark.operators.corr import xcorr_lags

    out = {r.lag: r for r in xcorr_lags(pts, "a", "b", 0, 8, 0).collect()}
    assert set(out) == {-3, -2, -1, 0, 1, 2, 3}
    assert all(out[L].n_pairs == 8 - abs(L) for L in out)
    assert out[2].xcorr == pytest.approx(1.0)
    best = max(out.values(), key=lambda r: (r.xcorr is not None and r.xcorr, r.lag))
    assert best.lag == 2


def test_event_transitions_order_and_ties(spark):
    # u1: view -> click -> view. u2: two events at the SAME ts — order
    # falls back to event_id, so view(id=4) precedes click(id=5).
    rows = [
        (1, 10, 1, "view"), (2, 20, 1, "click"), (3, 30, 1, "view"),
        (4, 50, 2, "view"), (5, 50, 2, "click"),
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts long, user_id long, event_type string")
    from btrdb_server_spark.operators.events import event_transitions

    out = {(r.from_type, r.to_type): r.cnt for r in event_transitions(ev).collect()}
    assert out == {("view", "click"): 2, ("click", "view"): 1}


def test_interval_join_paths_agree(spark):
    pts = mk(spark, [("a", t, float(t)) for t in range(0, 100, 7)])
    iv = spark.createDataFrame(
        [(10, 30), (25, 40), (90, 95)], "start long, end long"
    )  # first two OVERLAP: points in [25,30) must appear twice
    from btrdb_server_spark.operators.changes import interval_join

    def rows(df):
        return sorted((r.start, r.time) for r in df.collect())

    bcast = rows(interval_join(pts, iv))
    bucketed = rows(interval_join(pts, iv, bucket_pw=3))
    assert bcast == bucketed
    assert (10, 28) in bcast and (25, 28) in bcast  # overlap -> two rows
    assert (90, 91) in bcast and all(t != 95 for _, t in bcast)  # end exclusive


def test_edit_verified_pairs_known_distance(spark):
    # Two near-identical docs (one char edit) and one unrelated doc:
    # LSH proposes the near pair; edit_sim = 1 - 1/len.
    t = "the quick brown fox jumps over the lazy dog " * 3
    docs = spark.createDataFrame(
        [(1, t), (2, t[:-1] + "x"), (3, "completely different text " * 5)],
        "doc_id long, text string",
    )
    from btrdb_server_spark.functions.dedup import edit_verified_pairs

    out = edit_verified_pairs(docs, threshold=0.5).collect()
    assert [(r.a, r.b) for r in out] == [(1, 2)]
    r = out[0]
    assert r.dist == 1 and r.edit_sim == pytest.approx(1.0 - 1.0 / len(t))


def test_rolling_stats_inclusive_frame_and_dups(spark):
    # width=5, inclusive [t-5, t]; duplicate timestamps are peers and both
    # count. Output is one row per DISTINCT time.
    pts = mk(spark, [("a", 0, 1.0), ("a", 5, 2.0), ("a", 5, 4.0), ("a", 12, 3.0)])
    from btrdb_server_spark.operators.derive import rolling_stats

    out = {r.time: r for r in rolling_stats(pts, "a", 0, 20, 5).collect()}
    assert set(out) == {0, 5, 12}
    assert (out[0].cnt, out[0].mean) == (1, pytest.approx(1.0))
    assert (out[5].cnt, out[5].sum_q) == (3, 700)
    assert out[5].mean == pytest.approx(700 / 3 * 0.01)
    assert (out[12].cnt, out[12].mean) == (1, pytest.approx(3.0))


def test_stream_profile_dup_counting(spark):
    pts = mk(spark, [("a", 1, 2.0), ("a", 1, 3.0), ("a", 7, 4.0), ("b", 2, 9.0)])
    from btrdb_server_spark.operators.stat import stream_profile

    out = {r.uuid: r for r in stream_profile(pts, 0, 10).collect()}
    a = out["a"]
    assert (a.n_points, a.n_distinct_ts, a.n_dup_ts) == (3, 2, 1)
    assert (a.t_min, a.t_max, a.vmin, a.vmax, a.sum_q) == (1, 7, 2.0, 4.0, 900)
    assert (out["b"].n_points, out["b"].n_dup_ts) == (1, 0)


def test_ngram_novelty_first_occurrence(spark):
    # doc 1 introduces all its shingles; doc 2 repeats doc 1 verbatim
    # (novelty 0); doc 3 is half doc 1, half new.
    t1 = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame(
        [(1, t1), (2, t1), (3, "alpha beta gamma zeta eta theta")],
        "doc_id long, text string",
    )
    from btrdb_server_spark.functions.dedup import ngram_novelty

    out = {r.doc_id: r for r in ngram_novelty(docs).collect()}
    assert out[1].novelty == pytest.approx(1.0) and out[1].n_shingles == 3
    assert out[2].novelty == 0.0 and out[2].n_novel == 0
    # doc 3 shares only the shingle "alpha beta gamma" with doc 1
    assert (out[3].n_shingles, out[3].n_novel) == (4, 3)


def test_group_topk_quota_and_ties(spark):
    docs = spark.createDataFrame(
        [(1, "en", 10), (2, "en", 10), (3, "en", 5), (4, "en", 1), (5, "de", 7)],
        "doc_id long, lang string, n_chars long",
    )
    from btrdb_server_spark.functions.curation import group_topk

    out = [(r.lang, r.doc_id, r.rk) for r in group_topk(docs, k=3).collect()]
    # tie at 10 chars resolves by doc_id; doc 4 falls outside the quota
    assert out == [("de", 5, 1), ("en", 1, 1), ("en", 2, 2), ("en", 3, 3)]


def test_asof_features_strictly_before(spark):
    # click features at t=10 (mean 1.0) and t=20 (mean over [15,20] window
    # of width 5 = (1+2)/2? -> points 10(1.0), 20(2.0), width 15 covers both).
    # purchases at t=10 (must see NOTHING: strictly-before), 15, 25.
    pts = mk(spark, [
        ("click", 10, 1.0), ("click", 20, 2.0),
        ("purchase", 10, 0.0), ("purchase", 15, 0.0), ("purchase", 25, 0.0),
    ])
    from btrdb_server_spark.operators.derive import asof_features

    out = {r.target_time: r for r in
           asof_features(pts, "purchase", "click", 0, 40, 15, bucket_pw=6).collect()}
    assert out[10].feat_time is None and out[10].mean is None
    assert out[15].feat_time == 10 and out[15].mean == pytest.approx(1.0)
    assert out[25].feat_time == 20 and out[25].cnt == 2
    assert out[25].mean == pytest.approx(1.5)


def test_interval_join_degenerate_interval_dropped(spark):
    pts = mk(spark, [("a", 5, 1.0)])
    iv = spark.createDataFrame([(9, 3), (4, 6)], "start long, end long")
    from btrdb_server_spark.operators.changes import interval_join

    out = interval_join(pts, iv, bucket_pw=1).collect()
    assert [(r.start, r.time) for r in out] == [(4, 5)]


def test_threshold_crossings_and_excursions(spark):
    # value path: 5, 12, 15, 8, 20 (threshold 10): up at t=2, down at t=4,
    # up at t=5 -> excursions [2,3] (peak 15) and [5,5] (peak 20).
    pts = mk(spark, [("a", 1, 5.0), ("a", 2, 12.0), ("a", 3, 15.0),
                     ("a", 4, 8.0), ("a", 5, 20.0)])
    from btrdb_server_spark.operators.derive import excursions, threshold_crossings

    cr = [(r.time, r.direction) for r in
          threshold_crossings(pts, "a", 0, 10, 10.0).collect()]
    assert cr == [(2, "up"), (4, "down"), (5, "up")]
    # bucketed path must agree
    crb = [(r.time, r.direction) for r in
           threshold_crossings(pts, "a", 0, 10, 10.0, bucket_pw=1).collect()]
    assert crb == cr
    ex = [(r.t_start, r.t_end, r.n_points, r.v_max) for r in
          excursions(pts, "a", 0, 10, 10.0).collect()]
    assert ex == [(2, 3, 2, 15.0), (5, 5, 1, 20.0)]
    exb = [(r.t_start, r.t_end, r.n_points, r.v_max) for r in
           excursions(pts, "a", 0, 10, 10.0, bucket_pw=1).collect()]
    assert exb == ex


def test_sdt_compress_line_and_spike(spark):
    from btrdb_server_spark.operators.derive import sdt_compress

    # A perfect line compresses to first + last.
    line = mk(spark, [("a", t, t / 10) for t in range(0, 40, 10)])
    assert [(r.time, r.value) for r in sdt_compress(line, "a", 0, 100, 0.5).collect()] \
        == [(0, 0.0), (30, 3.0)]
    # A spike closes the door twice: every point survives.
    sp = mk(spark, [("a", 0, 0.0), ("a", 10, 1.0), ("a", 20, 5.0), ("a", 30, 3.0)])
    assert [(r.time, r.value) for r in sdt_compress(sp, "a", 0, 100, 0.5).collect()] \
        == [(0, 0.0), (10, 1.0), (20, 5.0), (30, 3.0)]
    # Duplicate timestamps collapse to max value before the fold.
    dup = mk(spark, [("a", 0, 0.0), ("a", 10, 1.0), ("a", 10, 9.0), ("a", 20, 2.0)])
    out = [(r.time, r.value) for r in sdt_compress(dup, "a", 0, 100, 0.5).collect()]
    assert out == [(0, 0.0), (10, 9.0), (20, 2.0)]
    # Single point: kept as-is, no duplicate append.
    one = mk(spark, [("a", 7, 3.0)])
    assert [(r.time, r.value) for r in sdt_compress(one, "a", 0, 100, 0.5).collect()] \
        == [(7, 3.0)]


def test_seasonal_naive_error_known_values(spark):
    # pw=0 (1 ns buckets), n=6, period=2. Quanta sums per bucket:
    # b0=100, b1=0, b2=100, b3=200, b4=0, b5=100.
    # pairs t=2..5: |100-100| + |200-0| + |0-100| + |100-200| = 400.
    pts = mk(spark, [("a", 0, 1.0), ("a", 2, 1.0), ("a", 3, 2.0), ("a", 5, 1.0)])
    from btrdb_server_spark.operators.corr import seasonal_naive_error

    r = seasonal_naive_error(pts, "a", 0, 6, 0, 2).collect()[0]
    assert (r.n_pairs, r.sae_q) == (4, 400)
    assert r.mae_q == pytest.approx(100.0) and r.mae == pytest.approx(1.0)


def test_funnel_windowed_cutoff(spark):
    # u1 converts fully within the window; u2's purchase misses the
    # 100-unit budget measured from the FIRST view.
    rows = [
        (10, "view", 1.0, 1), (20, "click", 1.0, 1), (30, "purchase", 1.0, 1),
        (10, "view", 1.0, 2), (20, "click", 1.0, 2), (150, "purchase", 1.0, 2),
    ]
    ev = spark.createDataFrame(
        rows, "ts long, event_type string, value double, user_id long"
    )
    from btrdb_server_spark.operators.events import funnel

    out = {r.step: r.users for r in funnel(ev, within=100).collect()}
    assert out == {1: 2, 2: 2, 3: 1}
    # unbounded: both purchases count
    out2 = {r.step: r.users for r in funnel(ev).collect()}
    assert out2 == {1: 2, 2: 2, 3: 2}


def test_ngram_freq_bigrams(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b"), (3, "x")], "doc_id long, text string"
    )
    from btrdb_server_spark.functions.text import ngram_freq

    out = [(r.gram, r.cnt, r.doc_freq) for r in ngram_freq(docs, n=2).collect()]
    # "a b" appears in docs 1 and 2; "b c" only in doc 1; doc 3 too short
    assert out == [("a b", 2, 2), ("b c", 1, 1)]


def test_dau_wau_trailing_window(spark):
    D = 86_400_000_000_000
    # u1 active days 0 and 7; u2 active day 1 only.
    rows = [(1, 0), (1, 7 * D), (2, D), (1, 10)]  # dup day-0 row for u1
    ev = spark.createDataFrame(rows, "user_id long, time long")
    from btrdb_server_spark.operators.events import dau_wau

    out = {r.day: r for r in dau_wau(ev, 0).collect()}
    assert set(out) == {0, 1, 7}
    assert (out[0].dau, out[0].wau) == (1, 1)
    assert (out[1].dau, out[1].wau) == (1, 2)  # u1 (day 0) still in window
    # day 7: only u1 active in [1, 7]... u2's day-1 activity still covers it
    assert (out[7].dau, out[7].wau) == (1, 2)
    assert out[1].stickiness == pytest.approx(0.5)


def test_exceedance_corr_perfect_and_counts(spark):
    # pw=1 (2 ns buckets) over [0, 8): 4 buckets. a exceeds in buckets
    # 0 and 2; b exceeds in exactly the same buckets -> phi = 1.
    pts = mk(spark, [
        ("a", 0, 9.0), ("a", 4, 9.0), ("a", 6, 1.0),
        ("b", 1, 9.0), ("b", 5, 9.0), ("b", 7, 1.0),
    ])
    from btrdb_server_spark.operators.corr import exceedance_corr

    r = exceedance_corr(pts, "a", "b", 0, 8, 1, 5.0, 5.0).collect()[0]
    assert (r.n_buckets, r.n_a, r.n_b, r.n_both) == (4, 2, 2, 2)
    assert r.phi == pytest.approx(1.0)
    # degenerate margin (b never exceeds) -> null phi
    r2 = exceedance_corr(pts, "a", "b", 0, 8, 1, 5.0, 99.0).collect()[0]
    assert r2.phi is None and r2.n_b == 0


def test_transition_lift_known_matrix(spark):
    # u1: a->b, b->a, a->b ; u2: a->b. Transitions: a->b x3, b->a x1.
    rows = [
        (1, 10, 1, "a"), (2, 20, 1, "b"), (3, 30, 1, "a"), (4, 40, 1, "b"),
        (5, 10, 2, "a"), (6, 20, 2, "b"),
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts long, user_id long, event_type string")
    from btrdb_server_spark.operators.events import transition_lift

    out = {(r.from_type, r.to_type): r for r in transition_lift(ev).collect()}
    assert out[("a", "b")].cnt == 3 and out[("b", "a")].cnt == 1
    # lift(a->b) = (3 * 4) / (3 * 3); lift(b->a) = (1 * 4) / (1 * 1)
    assert out[("a", "b")].lift == pytest.approx(12 / 9)
    assert out[("b", "a")].lift == pytest.approx(4.0)


def test_interarrival_stats_exact_selection(spark):
    # gaps: 1, 1, 2, 10  -> n=4; p50 -> rank 2 -> 1; p90 -> rank 4 -> 10.
    pts = mk(spark, [("a", t, 1.0) for t in (0, 1, 2, 4, 14)])
    from btrdb_server_spark.operators.derive import interarrival_stats

    r = interarrival_stats(pts, "a", 0, 100).collect()[0]
    assert (r.n_gaps, r.g_min, r.g_max) == (4, 1, 10)
    assert (r.p50, r.p90, r.p99) == (1, 10, 10)


def test_attribution_last_touch_strict_and_window(spark):
    from btrdb_server_spark.operators.events import attribution_last_touch

    rows = [
        # u1: click@10(e1), view@20(e2), purchase@20(e3) -> equal-time view
        # NOT credited; latest strictly-before touch is click? No: view@20
        # is AT the conversion time -> excluded; click@10 wins.
        (1, 10, 1, "click"), (2, 20, 1, "view"), (3, 20, 1, "purchase"),
        # u1 second purchase@30 -> view@20 now strictly before, credited.
        (4, 30, 1, "purchase"),
        # u2: purchase@5 with no touch -> unattributed.
        (5, 5, 2, "purchase"),
        # u3: two clicks at t=10 (e6, e7) -> tie resolves to higher eid.
        (6, 10, 3, "click"), (7, 10, 3, "click"), (8, 40, 3, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, time long, user_id long, event_type string"
    )
    out = {r.event_id: r for r in attribution_last_touch(ev).collect()}
    assert out[3].touch_event_id == 1 and out[3].latency == 10
    assert out[4].touch_event_id == 2 and out[4].latency == 10
    assert out[5].touch_event_id is None and out[5].latency is None
    assert out[8].touch_event_id == 7 and out[8].touch_type == "click"
    # within=5: u1's purchase@30 (latency 10) becomes unattributed.
    w = {r.event_id: r for r in attribution_last_touch(ev, within=5).collect()}
    assert w[4].touch_event_id is None and w[3].touch_event_id is None


def test_time_to_convert_first_pair_percentiles(spark):
    from btrdb_server_spark.operators.events import time_to_convert

    rows = [
        # u1: first view@10, purchases @5 (before -> ignored) and @13 -> lat 3
        (1, 10, 1, "view"), (2, 5, 1, "purchase"), (3, 13, 1, "purchase"),
        # u2: view@0, purchase@100 -> lat 100
        (4, 0, 2, "view"), (5, 100, 2, "purchase"),
        # u3: view only -> excluded
        (6, 50, 3, "view"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, time long, user_id long, event_type string"
    )
    r = time_to_convert(ev).collect()[0]
    assert (r.n_converted, r.lat_min, r.lat_max) == (2, 3, 100)
    assert (r.p50, r.p90, r.p99) == (3, 100, 100)


def test_mad_anomaly_robust_to_outlier(spark):
    from btrdb_server_spark.operators.stat import mad_anomaly

    # One bucket (pw=4 covers 0..15): values 10,10,10,12,100.
    # median=10, devs sorted [0,0,0,2,90] -> MAD=0? No: 5 values, median
    # is index 2 -> 0. Use devs [0,0,1,2,90] via value 11: median of
    # (10,10,10,11,12,100)... keep it simple: 3 tens + 14 + 100.
    # values [10,10,10,14,100]: median 10, devs [0,0,0,4,90], MAD=0
    # (index 2). With MAD=0, k*MAD=0: 14 and 100 both flag.
    pts = mk(spark, [("a", t, v) for t, v in
                     [(0, 10.0), (1, 10.0), (2, 10.0),
                      (3, 14.0), (4, 100.0)]])
    out = mad_anomaly(pts, "a", 0, 16, 4, k=3.0).collect()
    assert [(r.time, r.value) for r in out] == [(3, 14.0), (4, 100.0)]
    assert out[1].med == 10.0 and out[1].mad == 0.0 and out[1].dev == 90.0
    # Non-degenerate MAD: values [10,11,12,13,100] -> median 12,
    # devs sorted [0,1,1,2,88] -> MAD=1; k=3 -> threshold 3: only 100.
    pts3 = mk(spark, [("a", t, v) for t, v in
                      [(0, 10.0), (1, 11.0), (2, 12.0),
                       (3, 13.0), (4, 100.0)]])
    out3 = mad_anomaly(pts3, "a", 0, 16, 4, k=3.0).collect()
    assert [(r.time, r.value) for r in out3] == [(4, 100.0)]
    assert out3[0].mad == 1.0
    # zero-MAD bucket (all equal): any deviating point flags.
    pts2 = mk(spark, [("a", t, 5.0) for t in range(5)] + [("a", 5, 5.01)])
    out2 = mad_anomaly(pts2, "a", 0, 16, 4, k=3.0).collect()
    assert [(r.time) for r in out2] == [5]


def test_benford_digits_known_distribution(spark):
    from btrdb_server_spark.operators.stat import benford_digits

    # quanta: 1.23->123 (d1), 9.0->900 (d9), 0.19->19 (d1), 0.0 excluded,
    # -2.5->-250 (d2).
    pts = mk(spark, [("a", 0, 1.23), ("a", 1, 9.0), ("a", 2, 0.19),
                     ("a", 3, 0.0), ("a", 4, -2.5)])
    out = {r.digit: r for r in benford_digits(pts, 0, 10).collect()}
    assert set(out) == {1, 2, 9}
    assert out[1].cnt == 2 and out[1].freq == 0.5
    assert out[2].cnt == 1 and out[9].cnt == 1


def test_synthesize_stream_linear_combo(spark):
    from btrdb_server_spark.operators.align import synthesize_stream

    pts = mk(spark, [
        ("a", 0, 1.0), ("a", 1, 2.0), ("a", 2, 3.0),
        ("b", 0, 10.0), ("b", 2, 30.0),  # b missing at t=1
    ])
    out = synthesize_stream(pts, {"a": 1.0, "b": -1.0}, "a_minus_b", 0, 10).collect()
    assert [(r.uuid, r.time, r.value) for r in out] == [
        ("a_minus_b", 0, -9.0), ("a_minus_b", 2, -27.0)]
    # bias + scaling
    out2 = synthesize_stream(pts, {"a": 2.0}, "a2", 0, 10, bias=1.0).collect()
    assert [r.value for r in out2] == [3.0, 5.0, 7.0]


def test_coverage_report_gaps_and_edges(spark):
    from btrdb_server_spark.operators.stat import coverage_report

    # cadence 10, range [0, 100) -> 10 slots. Stream a: slots 2,3,7
    # (leading gap 2, interior gap 3, trailing gap 2 -> longest 3).
    # Stream b: slot 0 only (trailing gap 9).
    pts = mk(spark, [("a", 25, 1.0), ("a", 26, 1.0), ("a", 35, 1.0),
                     ("a", 78, 1.0), ("b", 5, 2.0)])
    out = {r.uuid: r for r in coverage_report(pts, 0, 100, 10).collect()}
    a = out["a"]
    assert (a.n_expected, a.n_present, a.n_points) == (10, 3, 4)
    assert a.longest_gap_slots == 3 and a.coverage == 0.3
    b = out["b"]
    assert (b.n_present, b.longest_gap_slots, b.coverage) == (1, 9, 0.1)
