"""Property-based tests — the Spark analog of the reference's randomized
suites (qtree/qtree2_test.go:152 TestQT2_A: jittered timestamps, random
batch/commit boundaries, full readback compare against an independent
recomputation; quasar_test.go:73-120 GenData/CompareData).

Hypothesis generates the point sets and batch splits; the oracle is a pure
pandas recomputation — fully independent of the Spark plans under test.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from btrdb_server_spark.operators.nearest import nearest
from btrdb_server_spark.operators.raw import raw_values
from btrdb_server_spark.operators.stat import aligned_windows, windows

# Small bounded domain so buckets/windows have interesting collisions.
T0 = 1_000_000
T1 = 2_000_000

points_strategy = st.lists(
    st.tuples(
        st.integers(min_value=T0, max_value=T1 - 1),
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
    ),
    min_size=1,
    max_size=300,
)

SET = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, pts):
    return spark.createDataFrame(
        [("s", t, v) for t, v in pts], "uuid string, time long, value double"
    )


@given(pts=points_strategy, lo=st.integers(T0, T1), hi=st.integers(T0, T1))
@SET
def test_raw_readback_matches_input(spark, pts, lo, hi):
    """RawValues = exactly the inserted points in [lo, hi), time-ordered
    (duplicate timestamps preserved, unlike the reference's 1024/ns cap —
    documented superset)."""
    lo, hi = min(lo, hi), max(lo, hi)
    got = [
        (r.time, r.value)
        for r in raw_values(_df(spark, pts), "s", lo, hi).collect()
    ]
    want = sorted(((t, v) for t, v in pts if lo <= t < hi), key=lambda x: x[0])
    assert sorted(got) == sorted(want)
    assert [t for t, _ in got] == [t for t, _ in want]


@given(pts=points_strategy, pw=st.integers(4, 16))
@SET
def test_aligned_windows_matches_pandas(spark, pts, pw):
    """AlignedWindows at any pw == per-bucket min/mean/max/count recomputed
    independently; empty buckets omitted (A1)."""
    got = {
        r.time: (r["min"], r["mean"], r["max"], r["count"])
        for r in aligned_windows(_df(spark, pts), "s", T0, T1, pw).collect()
    }
    pdf = pd.DataFrame(pts, columns=["t", "v"])
    fstart = (T0 >> pw) << pw
    fend = (T1 >> pw) << pw
    pdf = pdf[(pdf.t >= fstart) & (pdf.t < fend)]
    pdf["bucket"] = (pdf.t // (1 << pw)) * (1 << pw)
    want = pdf.groupby("bucket")["v"].agg(["min", "mean", "max", "count"])
    assert set(got) == set(want.index)
    for b, row in want.iterrows():
        g = got[b]
        assert g[0] == row["min"] and g[2] == row["max"] and g[3] == row["count"]
        assert math.isclose(g[1], row["mean"], rel_tol=1e-9, abs_tol=1e-9)


@given(pts=points_strategy, width=st.integers(1_000, 200_000))
@SET
def test_windows_hole_emission(spark, pts, width):
    """Windows: exactly (T1-T0)//width rows (end rounded down to whole
    windows, quasar.go:328-330), count=0 holes included, stats match an
    independent recomputation (A2/ST3)."""
    rows = windows(_df(spark, pts), "s", T0, T1, width).collect()
    n_windows = (T1 - T0) // width
    assert len(rows) == n_windows
    pdf = pd.DataFrame(pts, columns=["t", "v"])
    end = T0 + n_windows * width
    pdf = pdf[(pdf.t >= T0) & (pdf.t < end)]
    pdf["w"] = (pdf.t - T0) // width
    want = pdf.groupby("w")["v"].agg(["min", "mean", "max", "count"])
    for r in rows:
        w = (r.time - T0) // width
        if w in want.index:
            assert r["count"] == want.loc[w, "count"]
            assert r["min"] == want.loc[w, "min"]
            assert math.isclose(r["mean"], want.loc[w, "mean"], rel_tol=1e-9)
        else:
            assert r["count"] == 0 and r["min"] is None


@given(pts=points_strategy, probe=st.integers(T0, T1))
@SET
def test_nearest_boundary_semantics(spark, pts, probe):
    """Nearest: backward = max time strictly < probe; forward = min time
    >= probe (inclusive) — the boundary table of qtree2_test.go:253-267,
    randomized."""
    df = _df(spark, pts)
    back = nearest(df, "s", probe, backward=True).collect()
    fwd = nearest(df, "s", probe, backward=False).collect()
    times = sorted(t for t, _ in pts)
    wb = [t for t in times if t < probe]
    wf = [t for t in times if t >= probe]
    if wb:
        assert back and back[0].time == wb[-1]
    else:
        assert not back
    if wf:
        assert fwd and fwd[0].time == wf[0]
    else:
        assert not fwd


@given(
    pts=points_strategy,
    splits=st.lists(st.integers(0, 299), max_size=4),
    dlo=st.integers(T0, T1),
    dhi=st.integers(T0, T1),
)
@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_store_random_batches_delete_roundtrip(spark, tmp_path_factory, pts, splits, dlo, dhi):
    """Store-level randomized round-trip (TestQT2_A + TestQT2_DEL): insert
    in random batch splits, range-delete a random interval, verify readback
    at latest (delete applied) and at the pre-delete version (MVCC)."""
    from btrdb_server_spark.store import PointStore

    dlo, dhi = min(dlo, dhi), max(dlo, dhi)
    if dlo == dhi:
        dhi += 1
    store = PointStore(spark, str(tmp_path_factory.mktemp("pstore")))
    bounds = sorted({s for s in splits if s < len(pts)})
    chunks, prev = [], 0
    for b in bounds + [len(pts)]:
        if b > prev:
            chunks.append(pts[prev:b])
            prev = b
    for chunk in chunks:
        store.insert(
            "s", [(t, v) for t, v in chunk], enforce_batch_cap=False
        )
    pre_delete_ver = store.version
    store.delete_range("s", dlo, dhi)
    latest = [
        (r.time, r.value)
        for r in store.stream_points("s").orderBy("time", "value").collect()
    ]
    want_latest = sorted((t, v) for t, v in pts if not (dlo <= t < dhi))
    assert latest == want_latest
    at_v1 = [
        (r.time, r.value)
        for r in store.stream_points("s", version=pre_delete_ver)
        .orderBy("time", "value")
        .collect()
    ]
    assert at_v1 == sorted(pts)


intervals_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5000),
        st.integers(min_value=1, max_value=400),
    ),
    min_size=1,
    max_size=120,
)


@given(ivs=intervals_strategy, shift=st.integers(3, 9))
@SET
def test_chunked_coalescing_property(spark, ivs, shift):
    """Chunk-parallel interval coalescing == an independent pure-Python
    sweep merge, for any interval set and chunk width (islands spanning
    many chunks, exact [a,b)[b,c) touches, singleton chunks)."""
    from btrdb_server_spark.operators.changes import coalesce_intervals

    rows = [(s, s + w) for s, w in ivs]
    # independent oracle: sort + sweep
    want = []
    for s, e in sorted(rows):
        if want and s <= want[-1][1]:
            want[-1] = (want[-1][0], max(want[-1][1], e))
        else:
            want.append((s, e))
    df = spark.createDataFrame(rows, "start long, end long")
    got = [
        (r.start, r.end)
        for r in coalesce_intervals(df, chunk_shift=shift).orderBy("start").collect()
    ]
    assert got == want


@given(pts=points_strategy, pw=st.integers(6, 10))
@SET
def test_rollup_rewrite_bit_identical_on_quantized_data(
    spark, tmp_path_factory, pts, pw
):
    """The transparent rewrite (plans/rewrite.py) over a quantized ladder is
    BIT-identical to an independent integer-quantum recomputation in pandas:
    min/max/count exact, and the mean reproduced as (sum(vq)*q)/cnt — the
    same associative int64 formulation the ladder serves, so no float
    accumulation-order surface survives the route."""
    import struct

    from btrdb_server_spark.plans.rewrite import rewrite_aligned_stat
    from btrdb_server_spark.plans.rollup import RollupLadder

    qpts = [(t, round(v, 2)) for t, v in pts]
    df = _df(spark, qpts)
    ladder = RollupLadder(
        spark,
        str(tmp_path_factory.mktemp("rw_ladder")),
        levels=(4,),
        value_quantum=0.01,
    )
    ladder.rebuild(df)
    s, e = (T0 >> pw) << pw, ((T1 >> pw) << pw) + (1 << pw)
    canonical = (
        df.where((F.col("uuid") == "s") & (F.col("time") >= s) & (F.col("time") < e))
        .groupBy(F.shiftleft(F.shiftright("time", pw), pw).alias("t"))
        .agg(
            F.min("value").alias("vmin"),
            F.avg("value").alias("vmean"),
            F.max("value").alias("vmax"),
            F.count("value").alias("cnt"),
        )
    )
    routed = rewrite_aligned_stat(canonical, ladder)
    assert routed is not canonical, "rewrite must engage on the canonical shape"

    pdf = pd.DataFrame(qpts, columns=["time", "value"])
    pdf = pdf[(pdf.time >= s) & (pdf.time < e)]
    pdf["t"] = (pdf.time.values >> pw) << pw
    pdf["vq"] = (pdf.value / 0.01).round().astype("int64")
    g = pdf.groupby("t")
    expect = {
        int(t): (
            grp.value.min(),
            (grp.vq.sum() * 0.01) / len(grp),
            grp.value.max(),
            len(grp),
        )
        for t, grp in g
    }
    got = {r["t"]: (r.vmin, r.vmean, r.vmax, r.cnt) for r in routed.collect()}
    assert set(got) == set(expect)
    for t, (emin, emean, emax, ecnt) in expect.items():
        gmin, gmean, gmax, gcnt = got[t]
        assert (gmin, gmax, gcnt) == (emin, emax, ecnt)
        assert struct.pack("<d", gmean) == struct.pack("<d", emean)


@given(pts=points_strategy, m=st.integers(1, 20), off=st.integers(0, 50))
@SET
def test_windows_rewrite_bit_identical_on_quantized_data(
    spark, tmp_path_factory, pts, m, off
):
    """The tumbling-window rewrite shape — GROUP BY (time - s) DIV w with
    a level-aligned width and origin — served from a quantized ladder is
    BIT-identical to an independent integer-quantum pandas recomputation,
    for any width multiple of the level and any aligned origin at or
    before the range start."""
    import struct

    from btrdb_server_spark.plans.rewrite import rewrite_aligned_stat
    from btrdb_server_spark.plans.rollup import RollupLadder

    qpts = [(t, round(v, 2)) for t, v in pts]
    df = _df(spark, qpts)
    ladder = RollupLadder(
        spark,
        str(tmp_path_factory.mktemp("wr_ladder")),
        levels=(4,),
        value_quantum=0.01,
    )
    ladder.rebuild(df)
    width = m * 16
    s = T0 >> 4 << 4
    e = (T1 >> 4 << 4) + 16
    wstart = s - off * 16  # aligned origin at or before the range start
    df.createOrReplaceTempView("prop_pts_wr")
    q = spark.sql(
        f"""SELECT (time - {wstart}) DIV {width} AS widx,
                   min(value) AS vmin, avg(value) AS vmean,
                   max(value) AS vmax, count(value) AS cnt
            FROM prop_pts_wr WHERE uuid = 's' AND time >= {s} AND time < {e}
            GROUP BY (time - {wstart}) DIV {width}"""
    )
    routed = rewrite_aligned_stat(q, ladder)
    assert routed is not q, "windows rewrite must engage on the canonical shape"

    pdf = pd.DataFrame(qpts, columns=["time", "value"])
    pdf = pdf[(pdf.time >= s) & (pdf.time < e)]
    pdf["widx"] = (pdf.time - wstart) // width
    pdf["vq"] = (pdf.value / 0.01).round().astype("int64")
    expect = {
        int(k): (
            grp.value.min(),
            (grp.vq.sum() * 0.01) / len(grp),
            grp.value.max(),
            len(grp),
        )
        for k, grp in pdf.groupby("widx")
    }
    got = {r["widx"]: (r.vmin, r.vmean, r.vmax, r.cnt) for r in routed.collect()}
    assert set(got) == set(expect)
    for k, (emin, emean, emax, ecnt) in expect.items():
        gmin, gmean, gmax, gcnt = got[k]
        assert (gmin, gmax, gcnt) == (emin, emax, ecnt)
        assert struct.pack("<d", gmean) == struct.pack("<d", emean)


# Quantized values (2-decimal) for the integer-quantum round-5 operators.
qpoints_strategy = st.lists(
    st.tuples(
        st.integers(min_value=T0, max_value=T1 - 1),
        st.integers(min_value=-100_000, max_value=100_000),
    ),
    min_size=2,
    max_size=200,
    unique_by=lambda p: p[0],
)


@given(pts=qpoints_strategy)
@SET
def test_resample_hold_matches_pandas_ffill(spark, pts):
    """ZOH resample == pandas reindex(method='ffill') on the tick grid."""
    from btrdb_server_spark.operators.resample import resample

    rows = [(t, c / 100.0) for t, c in pts]
    df = _df(spark, rows)
    step = 100_000
    got = resample(df, "s", T0, T1, step, mode="hold").collect()
    s = (
        pd.Series({t: v for t, v in rows})
        .sort_index()
        .reindex(range(T0, T1, step), method="ffill")
    )
    assert len(got) == len(s)
    for r, (t, v) in zip(got, s.items()):
        assert r.time == t
        assert (r.value is None and math.isnan(v)) or r.value == v


@given(pts=qpoints_strategy)
@SET
def test_trapz_integral_total_matches_numpy(spark, pts):
    """Whole-range single window == numpy.trapz (to float tolerance —
    numpy sums in arbitrary order; the engine is exact-integer)."""
    import numpy as np

    from btrdb_server_spark.operators.derive import trapz_integral

    rows = sorted((t, c / 100.0) for t, c in pts)
    df = _df(spark, rows)
    width = T1 - T0
    got = trapz_integral(df, "s", T0, T1, width).collect()[0].integral_vs
    ts = np.array([t for t, _ in rows], dtype=float)
    vs = np.array([v for _, v in rows], dtype=float)
    expect = float(np.trapz(vs, ts / 1e9))
    assert got == pytest.approx(expect, rel=1e-9, abs=1e-9)


@given(pts=qpoints_strategy)
@SET
def test_counter_increase_monotonic_equals_span(spark, pts):
    """On a monotonic counter the total increase over one whole-range
    window is exactly last - first (no resets fire)."""
    from btrdb_server_spark.operators.derive import counter_increase

    rows = sorted((t, c) for t, c in pts)
    run = []
    acc = 0
    for t, c in rows:
        acc += abs(c) % 500
        run.append((t, acc / 100.0))
    df = _df(spark, run)
    width = T1 - T0
    got = counter_increase(df, "s", T0, T1, width).collect()[0].increase
    expect = run[-1][1] - run[0][1]
    assert got == pytest.approx(expect, abs=1e-9)


@given(pts=qpoints_strategy)
@SET
def test_cusum_score_matches_pandas(spark, pts):
    """The selected changepoint maximizes |n*prefix - i*total| computed
    independently in pandas over the sorted points."""
    from btrdb_server_spark.operators.derive import cusum_changepoint

    rows = sorted((t, c / 100.0) for t, c in pts)
    df = _df(spark, rows)
    got = cusum_changepoint(df, "s", T0, T1).collect()[0]
    cents = [round(v * 100) for _, v in rows]
    n, total = len(cents), sum(cents)
    best = None
    prefix = 0
    for i, (t, _) in enumerate(rows, start=1):
        prefix += cents[i - 1]
        score = abs(n * prefix - i * total)
        if best is None or score > best[0] or (score == best[0] and t < best[1]):
            best = (score, t)
    assert (got.score, got.time) == best


@given(pts=points_strategy, width=st.integers(1, 200_000))
@SET
def test_rolling_stats_matches_brute_force(spark, pts, width):
    """rolling_stats (neighbor-bucket equi-join) == the O(n^2) definition:
    for each distinct t, count/sum over all points in [t-width, t]."""
    from btrdb_server_spark.operators.derive import rolling_stats

    got = {
        r.time: (r.cnt, r.sum_q)
        for r in rolling_stats(_df(spark, pts), "s", T0, T1, width).collect()
    }
    qs = [(t, round(v / 0.01)) for t, v in pts]
    want = {}
    for t in {t for t, _ in pts}:
        inw = [q for (u, q) in qs if t - width <= u <= t]
        want[t] = (len(inw), sum(inw))
    assert got == want


@given(
    pts=points_strategy,
    ivs=st.lists(
        st.tuples(st.integers(T0, T1), st.integers(T0, T1)),
        min_size=1,
        max_size=10,
    ),
    pw=st.integers(1, 18),
)
@SET
def test_interval_join_bucketed_equals_broadcast(spark, pts, ivs, pw):
    """The exploded-bucket equi-join and the broadcast nested-loop paths
    must return identical multisets for any interval set (including
    overlapping and degenerate intervals)."""
    from btrdb_server_spark.operators.changes import interval_join

    pdf = _df(spark, pts)
    iv = spark.createDataFrame(ivs, "start long, end long")
    a = sorted((r.start, r.end, r.time) for r in interval_join(pdf, iv).collect())
    b = sorted(
        (r.start, r.end, r.time)
        for r in interval_join(pdf, iv, bucket_pw=pw).collect()
    )
    assert a == b


@given(pts=points_strategy, thr=st.floats(-1e6, 1e6, allow_nan=False))
@SET
def test_excursions_partition_the_above_set(spark, pts, thr):
    """Every in-range point at/above the threshold falls in exactly one
    excursion; excursions are disjoint, ordered, and peak-correct."""
    from btrdb_server_spark.operators.derive import excursions

    ex = excursions(_df(spark, pts), "s", T0, T1, thr).collect()
    above = sorted((t, v) for t, v in pts if v >= thr)
    assert sum(r.n_points for r in ex) == len(above)
    for prev, cur in zip(ex, ex[1:]):
        assert prev.t_end < cur.t_start  # disjoint + ordered
    if above:
        assert max(r.v_max for r in ex) == max(v for _, v in above)


# 2-decimal quantized values: the exactness contract of the round-6
# trend/similarity operators (cents arithmetic) holds on this domain.
q2_points = st.lists(
    st.tuples(
        st.integers(min_value=T0, max_value=T1 - 1),
        st.integers(min_value=-10000, max_value=10000).map(lambda c: c / 100.0),
    ),
    min_size=2,
    max_size=120,
)


@given(pts=q2_points)
@SET
def test_dtw_identity_and_symmetry(spark, pts):
    """dtw(a, a) = 0 and dtw(a, b) = dtw(b, a) (|.| cost is symmetric) —
    checked through the full operator including bucketing/zero-fill."""
    from btrdb_server_spark.operators.corr import dtw_distance

    width = (T1 - T0) // 16
    df = _df(spark, pts).unionAll(
        spark.createDataFrame(
            [("r", t + 7, v + 0.5) for t, v in pts],
            "uuid string, time long, value double",
        )
    )
    self_d = dtw_distance(df, "s", "s", T0, T1, width).collect()[0]
    assert self_d.dtw_q == 0
    ab = dtw_distance(df, "s", "r", T0, T1, width).collect()[0]
    ba = dtw_distance(df, "r", "s", T0, T1, width).collect()[0]
    assert ab.dtw_q == ba.dtw_q and ab.dtw_q >= 0


@given(pts=q2_points)
@SET
def test_mann_kendall_matches_bruteforce(spark, pts):
    """S, tie-corrected Var and Z against an independent O(n^2) pure-python
    recomputation on the same integer window totals."""
    from collections import Counter, defaultdict

    from btrdb_server_spark.operators.corr import mann_kendall

    width = (T1 - T0) // 8
    got = mann_kendall(_df(spark, pts), "s", T0, T1, width).collect()[0]
    tot = defaultdict(int)
    for t, v in pts:
        tot[(t - T0) // width] += round(v * 100)
    ys = [tot[w] for w in sorted(tot)]
    n = len(ys)
    s = sum(
        (0 if ys[j] == ys[i] else (1 if ys[j] > ys[i] else -1))
        for i in range(n)
        for j in range(i + 1, n)
    )
    tie = sum(c * (c - 1) * (2 * c + 5) for c in Counter(ys).values())
    var = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
    z = (s - 1) / math.sqrt(var) if s > 0 else ((s + 1) / math.sqrt(var) if s < 0 else 0.0)
    assert (got.n, got.s, got.var_s) == (n, s, var)
    assert got.z == z


@given(pts=q2_points)
@SET
def test_theilsen_matches_bruteforce(spark, pts):
    """Type-1 median slope and intercept against an independent pure-python
    recomputation (same (slope, i, j) ordering, same ceil(n/2) pick);
    a pair-less range must still emit the one-row frame with null slope."""
    import math as _m
    from collections import defaultdict

    from btrdb_server_spark.operators.corr import theilsen_trend

    width = (T1 - T0) // 8
    got = theilsen_trend(_df(spark, pts), "s", T0, T1, width).collect()[0]
    tot = defaultdict(int)
    for t, v in pts:
        tot[(t - T0) // width] += round(v * 100)
    ws = sorted(tot)
    slopes = sorted(
        ((tot[ws[jj]] - tot[ws[ii]]) / float(ws[jj] - ws[ii]), ws[ii], ws[jj])
        for ii in range(len(ws))
        for jj in range(ii + 1, len(ws))
    )
    assert got.n == len(ws) and got.n_pairs == len(slopes)
    if not slopes:
        assert got.slope_per_window is None and got.intercept is None
        return
    sl = slopes[_m.ceil(len(slopes) * 0.5) - 1][0]
    resid = sorted((tot[w] - sl * w, w) for w in ws)
    ic = resid[_m.ceil(len(ws) * 0.5) - 1][0]
    assert got.slope_per_window == sl / 100.0
    assert got.intercept == ic / 100.0


@given(pts=q2_points)
@SET
def test_pagerank_mass_conservation_bound(spark, pts):
    """Total fixed-point rank never exceeds N·RANK_ONE and every rank is
    at least the teleport floor (15% of base, minus flooring loss)."""
    from btrdb_server_spark.functions.graph import RANK_ONE, pagerank_fixed

    # build a small random-ish multigraph from the generated points:
    # order id = time bucket, part id = cents mod 13
    rows = [
        (int(t) // ((T1 - T0) // 8), int(round(v * 100)) % 13)
        for t, v in pts
    ]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    from btrdb_server_spark.functions.graph import copurchase_edges

    edges = copurchase_edges(li)
    if edges.count() == 0:
        return
    out = pagerank_fixed(edges, top=None).collect()
    n = len(out)
    total = sum(r.rank_fp for r in out)
    assert total <= n * RANK_ONE
    floor_min = (15 * (RANK_ONE // n)) // 100
    assert all(r.rank_fp >= floor_min for r in out)


@given(pts=q2_points)
@SET
def test_twa_hold_matches_bruteforce(spark, pts):
    """Step-hold TWA against a pure-python segment replay: per window the
    covered ns and the exact numerator agree, and total coverage equals
    the span from the first point to T1."""
    from collections import defaultdict

    from btrdb_server_spark.operators.stat import twa_hold

    width = (T1 - T0) // 8
    got = {
        r.time: (r.covered_ns, r.twa)
        for r in twa_hold(_df(spark, pts), "s", T0, T1, width).collect()
    }
    ordered = sorted((t, round(v * 100)) for t, v in pts)
    # last point per duplicate timestamp holds (value tiebreak ordering)
    num, cov = defaultdict(int), defaultdict(int)
    for idx, (t, vq) in enumerate(ordered):
        e = ordered[idx + 1][0] if idx + 1 < len(ordered) else T1
        s = t
        while s < e:
            w = (s - T0) // width
            stop = min(e, T0 + (w + 1) * width)
            num[w] += vq * (stop - s)
            cov[w] += stop - s
            s = stop
    exp = {
        T0 + w * width: (cov[w], float(num[w]) / float(cov[w]) / 100.0)
        for w in cov
        if cov[w] > 0
    }
    assert got == exp
    assert sum(c for c, _ in got.values()) == T1 - ordered[0][0]


@given(pts=q2_points)
@SET
def test_kalman_matches_bruteforce(spark, pts):
    """Per-window Kalman finals against the identical python fold (same
    duplicated-intermediate op order)."""
    from collections import defaultdict

    from btrdb_server_spark.operators.derive import kalman_level

    width = (T1 - T0) // 4
    got = {
        r.time: (r.n, r.level, r.p_var, r.gain)
        for r in kalman_level(_df(spark, pts), "s", T0, T1, width).collect()
    }
    groups = defaultdict(list)
    for t, v in sorted(pts):
        groups[(t - T0) // width].append(v)
    exp = {}
    for w, vs in groups.items():
        x, p, k = vs[0], 4.0, 0.0
        for z in vs[1:]:
            ppred = p + 0.25
            k = ppred / (ppred + 4.0)
            x = x + k * (z - x)
            p = (1.0 - k) * ppred
        exp[T0 + w * width] = (len(vs), x, p, k)
    assert got == exp


@given(pts=q2_points)
@example(pts=[(1126001, 0.0), (1726000, 0.0)])  # µs-truncation day-boundary
@SET
def test_kaplan_meier_matches_bruteforce(spark, pts):
    """KM curve against a direct python recomputation on per-user
    lifetimes (users = value cents mod 5, churn gap = 1/4 of the range).

    The oracle truncates ts to µs multiples (t - t % 1000) exactly as the
    engine's epoch_ns_expr bigint path does (sources/testdata.py) — raw-ns
    lifetimes can land on the other side of a day boundary."""
    from collections import defaultdict

    from btrdb_server_spark.operators.events import kaplan_meier

    gap = (T1 - T0) // 4
    day = (T1 - T0) // 20
    rows = [
        (int(round(v * 100)) % 5, t, "e", i, "{}")
        for i, (t, v) in enumerate(pts)
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts long, event_type string, event_id long, props string"
    )
    got = [
        (r.t_days, r.n_risk, r.n_churn, r.survival)
        for r in kaplan_meier(
            ev, T0, T1, churn_gap_ns=gap, day_ns=day
        ).collect()
    ]
    span = defaultdict(list)
    for u, t, *_ in rows:
        span[u].append(t - t % 1000)  # engine epoch_ns_expr µs truncation
    lives = [
        ((max(ts) - min(ts)) // day, max(ts) < T1 - gap)
        for ts in span.values()
    ]
    by_life = defaultdict(lambda: [0, 0])
    for life, ch in lives:
        by_life[life][0] += 1
        by_life[life][1] += 1 if ch else 0
    exp, surv = [], 1.0
    risk = len(lives)
    for life in sorted(by_life):
        n_at, d = by_life[life]
        if d > 0:
            # n_risk = users with lifetime >= life
            n_risk = sum(n for l2, (n, _) in by_life.items() if l2 >= life)
            surv = surv * (1.0 - float(d) / float(n_risk))
            exp.append((life, n_risk, d, surv))
    assert got == exp


docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
        min_size=1,
        max_size=12,
    ),
    min_size=2,
    max_size=10,
)


@given(docs=docs_strategy)
@SET
def test_simhash_pairs_equal_bruteforce_hamming_ball(spark, docs):
    """simhash_pairs must return EXACTLY the Hamming<=3 pairs: the
    pigeonhole banding guarantees recall 1 for hamming < bands, and the
    verify step filters candidates to the ball — so the output equals a
    brute-force O(n^2) Hamming scan of the same fingerprints."""
    from btrdb_server_spark.functions.dedup import simhash, simhash_pairs

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    fps = {r.doc_id: r.simhash for r in simhash(df, bits=60).collect()}
    expected = {
        (a, b): bin(fps[a] ^ fps[b]).count("1")
        for a in fps
        for b in fps
        if a < b and bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    got = {
        (r.a, r.b): r.hamming for r in simhash_pairs(df, bits=60).collect()
    }
    assert got == expected


@given(pts=points_strategy, pw=st.integers(min_value=12, max_value=22))
@SET
def test_hist_ladder_quantiles_match_pandas(spark, pts, pw):
    """quantiles_from_hist (built fine, coarsened, then served) equals a
    pandas type-1 quantile recomputation per window — ceil(p*n) integer
    ranks, independent of ladder partitioning."""
    from btrdb_server_spark.plans.rollup import (
        hist_from_hist,
        hist_from_points,
        quantiles_from_hist,
    )

    df = _df(spark, pts)
    fine = hist_from_points(df, pw - 6)
    level = hist_from_hist(fine, pw)
    got = {
        r.time: (r.n, r.p50, r.p90, r.p99)
        for r in quantiles_from_hist(level, pw, "s", T0, T1, pw).collect()
    }
    pdf = pd.DataFrame(pts, columns=["time", "value"])
    pdf["vq"] = (pdf["value"] / 0.01).round().astype("int64")
    fstart, fend = (T0 >> pw) << pw, (T1 >> pw) << pw
    pdf = pdf[(pdf["time"] >= fstart) & (pdf["time"] < fend)]
    exp = {}
    for w, g in pdf.groupby((pdf["time"] // (1 << pw)) * (1 << pw)):
        vs = sorted(g["vq"])
        n = len(vs)
        pick = lambda num, den: vs[(num * n + den - 1) // den - 1] / 100.0
        exp[w] = (n, pick(1, 2), pick(9, 10), pick(99, 100))
    assert got == exp


@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=999),
            st.floats(min_value=-100, max_value=100, allow_nan=False, allow_infinity=False),
        ),
        min_size=2,
        max_size=60,
        unique_by=lambda p: p[0],
    ),
    cuts=st.lists(st.integers(min_value=1, max_value=59), max_size=3, unique=True),
)
@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_streaming_quantile_split_invariant(spark, pts, cuts, tmp_path_factory):
    """However arrivals are cut into micro-batches, the closed-window
    quantiles equal a pandas type-1 recomputation — the histogram-union
    associativity contract."""
    from btrdb_server_spark.streaming.stateful import streaming_quantile

    work = tmp_path_factory.mktemp("squant_prop")
    src, ckpt = str(work / "src"), str(work / "ckpt")
    pts = sorted(pts)
    bounds = sorted({c for c in cuts if c < len(pts)} | {len(pts)})
    lo = 0
    for i, hi in enumerate(bounds):
        if hi > lo:
            spark.createDataFrame(
                [("s", t, v) for t, v in pts[lo:hi]],
                "uuid string, time long, value double",
            ).coalesce(1).write.mode("append").parquet(src)
        lo = hi
    stream = (
        spark.readStream.schema("uuid string, time long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_quantile(stream, 0, 100)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("squant_prop_out")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r.time: (r.n, r.p50, r.p90, r.p99)
        for r in spark.sql("SELECT * FROM squant_prop_out").collect()
    }
    pdf = pd.DataFrame(pts, columns=["time", "value"])
    pdf["vq"] = (pdf["value"] / 0.01).round().astype("int64")
    frontier_w = (pdf["time"].max() // 100) * 100
    exp = {}
    for w, g in pdf.groupby((pdf["time"] // 100) * 100):
        if w >= frontier_w:
            continue  # frontier window never closes
        vs = sorted(g["vq"])
        n = len(vs)
        pick = lambda num, den: vs[(num * n + den - 1) // den - 1] / 100.0
        exp[w] = (n, pick(1, 2), pick(9, 10), pick(99, 100))
    assert got == exp


# ---- MVCC store model check (LSM layout) -----------------------------------
# Random interleavings of insert_many / delete_range / compact, validated
# against a pure-Python model at EVERY readable version — the storage
# engine's end-to-end contract (snapshot reads, tombstone semantics,
# fresh-sentinel + compacted-bucket union) under adversarial op orders.

op_strategy = st.lists(
    st.one_of(
        st.tuples(
            st.just("insert"),
            st.lists(
                st.tuples(
                    st.sampled_from(["a", "b", "c"]),
                    st.integers(min_value=0, max_value=99),
                ),
                min_size=1,
                max_size=12,
            ),
        ),
        st.tuples(
            st.just("delete"),
            st.tuples(
                st.sampled_from(["a", "b", "c"]),
                st.integers(min_value=0, max_value=99),
                st.integers(min_value=1, max_value=60),
            ),
        ),
        st.tuples(st.just("compact"), st.none()),
    ),
    min_size=2,
    max_size=8,
)


@given(ops=op_strategy)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_store_mvcc_matches_model(spark, ops, tmp_path_factory):
    """Every version still addressable after the op sequence must read
    back exactly the model's snapshot: points are (uuid, time) keyed with
    last-writer value; delete_range removes [start, end) of strictly
    older insertions; compact folds history below the compaction point."""
    from btrdb_server_spark.store import BTrDBError, PointStore

    store = PointStore(spark, str(tmp_path_factory.mktemp("mvcc")), num_buckets=4)
    # model: list of (version, kind, payload) in commit order
    history = []
    seq = 0
    for kind, arg in ops:
        if kind == "insert":
            rows = [(u, t, float(seq * 1000 + i)) for i, (u, t) in enumerate(arg)]
            seq += 1
            v = store.insert_many(
                spark.createDataFrame(rows, "uuid string, time long, value double")
            )
            history.append((v, "insert", rows))
        elif kind == "delete":
            u, s, w = arg
            v = store.delete_range(u, s, s + w)
            history.append((v, "delete", (u, s, s + w)))
        else:
            store.compact()

    compacted = store._read_manifest().get("compacted_through", 0)
    latest = store.version
    for v in range(max(compacted, 1), latest + 1):
        # model snapshot at v: apply history rows with ins_ver <= v,
        # deletes hide strictly-older insertions in [start, end)
        live = []  # (uuid, time, value, ins_ver)
        for hv, kind, payload in history:
            if hv > v:
                break
            if kind == "insert":
                live.extend((u, t, val, hv) for u, t, val in payload)
            else:
                du, ds, de = payload
                live = [
                    (u, t, val, iv)
                    for (u, t, val, iv) in live
                    if not (u == du and ds <= t < de and iv < hv)
                ]
            # duplicates at one (uuid, time) are retained (store keeps all)
        want = sorted((u, t, val) for u, t, val, _ in live)
        got = sorted(
            (r.uuid, r.time, r.value) for r in store.points_at(v).collect()
        )
        assert got == want, f"version {v}: {got} != {want}"
    if compacted > 1:
        with pytest.raises(BTrDBError):
            store.points_at(compacted - 1).collect()


@given(
    pts=points_strategy,
    n_streams=st.integers(1, 6),
    dlo=st.integers(T0, T1),
    dhi=st.integers(T0, T1),
    tail=points_strategy,
)
@settings(max_examples=3, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_incremental_compact_equals_full_rewrite(
    spark, tmp_path_factory, pts, n_streams, dlo, dhi, tail
):
    """Randomized equivalence of the two compaction paths: base-compact,
    then a random mix of inserts (spread over several streams) and a range
    delete, folded once INCREMENTALLY (touched buckets + hard-linked
    carry) and once via full=True full rewrite — identical multisets, and
    both equal to the uncompacted read."""
    from btrdb_server_spark.store import PointStore

    dlo, dhi = min(dlo, dhi), max(dlo, dhi) + 1

    def build(path, full):
        store = PointStore(spark, path, num_buckets=8)
        store.insert_many(
            spark.createDataFrame(
                [(f"s{i % n_streams}", t, v) for i, (t, v) in enumerate(pts)],
                "uuid string, time long, value double",
            )
        )
        store.compact()  # establish the base
        store.insert("s0", [(t, v) for t, v in tail], enforce_batch_cap=False)
        store.delete_range("s1" if n_streams > 1 else "s0", dlo, dhi)
        store.compact(full=full)
        return sorted(
            (r.uuid, r.time, r.value) for r in store.points_at().collect()
        )

    base = tmp_path_factory.mktemp("cmp")
    incr = build(str(base / "incr"), full=False)
    full = build(str(base / "full"), full=True)
    assert incr == full


# ------------------------------------------------------- r9: winnowing --

_words = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]),
    min_size=0,
    max_size=40,
)


@given(docs=st.lists(_words, min_size=1, max_size=8))
@SET
def test_winnowing_matches_independent_python(spark, docs):
    """functions/text.py winnowing_fingerprints vs a from-scratch Python
    recomputation (same md5/8-hex-char hash, k=3 grams, w=4 window-min,
    value-distinct selection) — every profile column bit-equal, including
    the zero/NULL profile for sub-k docs and the MOSS density bound."""
    import hashlib

    from btrdb_server_spark.functions.text import winnowing_fingerprints

    k, w = 3, 4

    def profile(toks):
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        hs = [
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams
        ]
        wins = [min(hs[i : i + w]) for i in range(len(hs) - w + 1)]
        fps = set(wins)
        return (
            len(hs),
            len(wins),
            len(fps),
            len(fps) / len(wins) if wins else None,
            min(fps) if fps else None,
            max(fps) if fps else None,
        )

    df = spark.createDataFrame(
        [(i, " ".join(ts)) for i, ts in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_grams, r.n_windows, r.n_fps, r.fp_density, r.fp_min, r.fp_max)
        for r in winnowing_fingerprints(df).collect()
    }
    for i, ts in enumerate(docs):
        assert got[i] == profile(ts), f"doc {i}: {ts}"


# Small word pool so random corpora actually share shingles (near-dups
# arise by chance); docs need >= 3 tokens to have any 3-gram shingle.
_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
docs_strategy = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=3, max_size=8).map(" ".join),
    min_size=2,
    max_size=12,
)


@given(texts=docs_strategy)
@SET
def test_incremental_dedup_equals_one_shot_cross_pairs(spark, tmp_path_factory, texts):
    """For ANY corpus split, probing a persisted LSH index must emit
    exactly the cross-side subset of the one-shot estimator's pairs at
    the same threshold, with identical match counts — the persisted-index
    path can neither invent nor lose pairs relative to the in-memory
    pipeline it mirrors."""
    from btrdb_server_spark.functions.dedup import (
        incremental_dedup_pairs,
        lsh_index_build,
        minhash_jaccard_est,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    base = df.where(F.col("doc_id") % 2 == 0)
    snap = df.where(F.col("doc_id") % 2 == 1)
    idx = str(tmp_path_factory.mktemp("lshprop") / "idx")
    lsh_index_build(base, idx, bands=8)
    got = {
        (r.new_id, r.match_id): r.matches
        for r in incremental_dedup_pairs(snap, idx, est_threshold=0.25).collect()
    }
    # one-shot estimator over the union, restricted to cross-side pairs
    # at the same threshold (est = matches/16 >= 0.25 <=> matches >= 4)
    want = {}
    for r in minhash_jaccard_est(df, bands=8).collect():
        lo, hi = (r.a, r.b) if r.a < r.b else (r.b, r.a)
        if lo % 2 != hi % 2 and r.matches >= 4:
            new_id, match_id = (lo, hi) if lo % 2 == 1 else (hi, lo)
            want[(new_id, match_id)] = r.matches
    assert got == want


@given(docs=docs_strategy)
@SET
def test_bpe_batched_round1_equals_greedy(spark, docs):
    """bpe_train_batched(round_size=1) must be BIT-EQUAL to exact greedy
    bpe_train on any corpus — the degenerate case pinning the batched
    variant's ranking, tie-break, and rewrite to the reference fold."""
    from btrdb_server_spark.functions.bpe import bpe_train, bpe_train_batched

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    a = [tuple(r) for r in bpe_train(df, num_merges=5).collect()]
    b = [
        tuple(r)
        for r in bpe_train_batched(df, num_merges=5, round_size=1).collect()
    ]
    assert a == b
