"""Unit + property tests for the distribution-shape, drawdown, sketch and
graph-census operators: pandas/pure-python recomputations fully independent
of the Spark plans under test (the reference's randomized-compare strategy,
quasar_test.go:73-120 GenData/CompareData)."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from btrdb_server_spark.functions.graph import triangle_count
from btrdb_server_spark.functions.sketch import kmv_distinct
from btrdb_server_spark.operators.corr import spearman_corr
from btrdb_server_spark.operators.derive import max_drawdown
from btrdb_server_spark.operators.stat import chi2_independence, moments_profile

T0 = 1_000_000
T1 = 2_000_000

pts_strategy = st.lists(
    st.tuples(
        st.integers(min_value=T0, max_value=T1 - 1),
        st.integers(min_value=-200_000, max_value=200_000),  # value in cents
    ),
    min_size=2,
    max_size=300,
)

SET = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, pts, uuid="s"):
    return spark.createDataFrame(
        [(uuid, t, q / 100.0) for t, q in pts],
        "uuid string, time long, value double",
    )


@given(pts=pts_strategy)
@SET
def test_max_drawdown_matches_cummax(spark, pts):
    got = max_drawdown(_df(spark, pts), T0, T1, bucket_pw=12).collect()
    df = pd.DataFrame(pts, columns=["time", "q"]).sort_values(["time", "q"])
    want = int((df["q"].cummax() - df["q"]).max())
    assert len(got) == 1
    assert got[0].dd_q == want
    assert got[0].n_points == len(pts)
    assert got[0].drawdown == pytest.approx(want * 0.01, abs=0)


@given(pts=pts_strategy)
@SET
def test_max_drawdown_bucket_width_invariant(spark, pts):
    df = _df(spark, pts)
    a = max_drawdown(df, T0, T1, bucket_pw=8).collect()[0]
    b = max_drawdown(df, T0, T1, bucket_pw=40).collect()[0]
    assert a.dd_q == b.dd_q and a.n_points == b.n_points


@given(pts=pts_strategy)
@SET
def test_moments_profile_matches_numpy(spark, pts):
    got = moments_profile(_df(spark, pts), T0, T1).collect()[0]
    qs = pd.Series([q for _, q in pts], dtype="float64")
    n = len(qs)
    mu = qs.sum() / n
    m2 = (qs**2).sum() / n - mu * mu
    assert got.n_points == n
    assert got.mean == pytest.approx(mu * 0.01, rel=1e-9, abs=1e-9)
    if m2 > 0:
        m3 = (qs**3).sum() / n - 3 * mu * (qs**2).sum() / n + 2 * mu**3
        m4 = (
            (qs**4).sum() / n
            - 4 * mu * (qs**3).sum() / n
            + 6 * mu * mu * (qs**2).sum() / n
            - 3 * mu**4
        )
        assert got.skewness == pytest.approx(
            m3 / (math.sqrt(m2) * m2), rel=1e-7, abs=1e-9
        )
        assert got.kurtosis_x == pytest.approx(
            m4 / (m2 * m2) - 3.0, rel=1e-7, abs=1e-9
        )
    else:
        assert got.skewness is None and got.kurtosis_x is None


@given(
    xs=st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=4, max_size=40
    ),
    ys=st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=4, max_size=40
    ),
)
@SET
def test_spearman_matches_pandas(spark, xs, ys):
    n = min(len(xs), len(ys))
    day = 1000
    rows = [("x", T0 + i * day, xs[i] / 100.0) for i in range(n)] + [
        ("y", T0 + i * day, ys[i] / 100.0) for i in range(n)
    ]
    df = spark.createDataFrame(rows, "uuid string, time long, value double")
    got = spearman_corr(df, "x", "y", T0, T0 + n * day, day).collect()[0]
    want = (
        pd.Series(xs[:n], dtype="float64")
        .rank(method="average")
        .corr(pd.Series(ys[:n], dtype="float64").rank(method="average"))
    )
    assert got.n_windows == n
    if pd.isna(want):
        assert got.rho is None
    else:
        assert got.rho == pytest.approx(want, rel=1e-9, abs=1e-9)


def test_kmv_exact_below_k_and_close_above(spark):
    rows = [(i, "small" if i < 100 else "big", i % 3000) for i in range(6000)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, user_id long")
    out = {r.uuid: r for r in kmv_distinct(df, k=256).collect()}
    # below k distinct: sketch serves the exact hash count
    assert out["small"].n_kept == out["small"].n_exact == 100
    assert out["small"].kmv_est == 100.0
    # above k: estimate within the ~1/sqrt(k-2) band (generous 4 sigma)
    big = out["big"]
    assert big.n_kept == 256
    assert abs(big.kmv_est - big.n_exact) / big.n_exact < 4 / math.sqrt(254)


def test_triangle_count_known_graph(spark):
    orders = [
        (1, 101), (1, 102), (1, 103),   # triangle 101-102-103
        (2, 101), (2, 102),             # duplicate edge
        (3, 102), (3, 103), (3, 104),   # triangle 102-103-104
    ]
    df = spark.createDataFrame(
        [(o, p, 1.0) for o, p in orders],
        "l_orderkey long, l_partkey long, l_extendedprice double",
    )
    r = triangle_count(df).collect()[0]
    # edges: 12,13,23,24,34 on nodes {101..104}
    assert r.n_nodes == 4 and r.n_edges == 5
    assert r.n_wedges == 8 and r.n_triangles == 2
    assert r.clustering == pytest.approx(0.75, abs=0)


def test_chi2_independence_brute_force(spark):
    rows = []
    t = T0
    for uuid, dow_counts in [("a", [5, 3, 2]), ("b", [1, 4, 7])]:
        for dow, cnt in enumerate(dow_counts):
            day_ns = 86_400_000_000_000
            base = (dow + 3) * day_ns  # ((d div day)+4)%7 == dow for d=(dow+3)*day
            for i in range(cnt):
                rows.append((uuid, base + i, 1.0))
    df = spark.createDataFrame(rows, "uuid string, time long, value double")
    got = chi2_independence(df, 0, 10 * 86_400_000_000_000).collect()[0]
    obs = {("a", 3): 5, ("a", 4): 3, ("a", 5): 2, ("b", 3): 1, ("b", 4): 4, ("b", 5): 7}
    n = sum(obs.values())
    r = {"a": 10, "b": 12}
    c = {3: 6, 4: 7, 5: 9}
    chi2 = sum(
        (n * obs.get((u, d), 0) - r[u] * c[d]) ** 2 / (n * r[u] * c[d])
        for u in sorted(r)
        for d in sorted(c)
    )
    assert got.n_total == n and got.dof == 2
    assert got.chi2 == pytest.approx(chi2, rel=1e-12)
    assert got.cramers_v == pytest.approx(math.sqrt(chi2 / n), rel=1e-12)


def test_anova_dow_brute_force(spark):
    day = 86_400_000_000_000
    rows = []
    vals = {0: [100, 200, 300], 1: [400, 400], 2: [50, 150, 250, 350]}
    for dow, qs in vals.items():
        base = (dow + 3) * day
        rows.extend(("s", base + i, q / 100.0) for i, q in enumerate(qs))
    df = spark.createDataFrame(rows, "uuid string, time long, value double")
    from btrdb_server_spark.operators.stat import anova_dow

    got = anova_dow(df, "s", 0, 10 * day).collect()[0]
    flat = [q for qs in vals.values() for q in qs]
    n, k = len(flat), len(vals)
    gm = sum(flat) / n
    ssb = sum(len(qs) * (sum(qs) / len(qs) - gm) ** 2 for qs in vals.values())
    ssw = sum(
        sum(q * q for q in qs) - sum(qs) ** 2 / len(qs) for qs in vals.values()
    )
    assert got.n_total == n and got.n_groups == k
    assert got.ssb == pytest.approx(ssb, rel=1e-9)
    assert got.ssw == pytest.approx(ssw, rel=1e-9)
    assert got.f_stat == pytest.approx(
        (ssb / (k - 1)) / (ssw / (n - k)), rel=1e-9
    )


def test_zipf_fit_synthetic_powerlaw(spark):
    # token i repeated ~C/i times => slope should be near -1
    docs = []
    for i in range(1, 41):
        docs.extend([(len(docs) + j, f"tok{i:02d}") for j in range(400 // i)])
    df = spark.createDataFrame(
        [(i, t) for i, t in docs], "doc_id long, text string"
    )
    from btrdb_server_spark.functions.text import zipf_fit

    r = zipf_fit(df, top=40).collect()[0]
    assert r.n_top == 40 and r.vocab_size == 40
    assert -1.15 < r.slope < -0.85
    assert r.r2 > 0.97


def test_bilateral_trade_symmetric_totals(spark):
    sf = "/root/testdata/sf0.001"
    import __spark_entry__ as entry_mod

    df = entry_mod.q_bilateral_trade(spark, sf)
    rows = df.collect()
    assert len(rows) > 0
    # total items across the matrix == lineitems with resolvable legs
    from btrdb_server_spark.sources.testdata import load_table

    n_li = load_table(spark, sf, "lineitem").count()
    assert sum(r.n_items for r in rows) == n_li


def test_ar1_forecast_brute_force(spark):
    day = 1000
    qs = [100, 140, 120, 180, 160, 220, 200, 260]
    rows = [("s", T0 + i * day, q / 100.0) for i, q in enumerate(qs)]
    df = spark.createDataFrame(rows, "uuid string, time long, value double")
    from btrdb_server_spark.operators.corr import ar1_forecast

    got = ar1_forecast(df, "s", T0, T0 + len(qs) * day, day, horizon=3).collect()
    n = len(qs)
    mu = sum(qs) / n
    num = sum((qs[i] - mu) * (qs[i + 1] - mu) for i in range(n - 1))
    den = sum((q - mu) ** 2 for q in qs)
    phi = num / den
    assert len(got) == 3
    for r in got:
        assert r.phi == pytest.approx(phi, rel=1e-9)
        want = (mu + phi**r.h * (qs[-1] - mu)) * 0.01
        assert r.forecast == pytest.approx(want, rel=1e-9)


def test_hurst_white_noise_near_half(spark):
    import random

    rnd = random.Random(7)
    day = 1000
    n = 512
    rows = [("s", T0 + i * day, rnd.randint(0, 10000) / 100.0) for i in range(n)]
    df = spark.createDataFrame(rows, "uuid string, time long, value double")
    from btrdb_server_spark.operators.corr import hurst_exponent

    r = hurst_exponent(df, "s", T0, T0 + n * day, day, scales=(1, 2, 4, 8)).collect()[0]
    assert r.n_scales == 4
    assert 0.3 < r.hurst < 0.7  # iid noise: H ~ 0.5


def test_hll_brute_force_registers(spark):
    """HLL registers and estimate recomputed in pure Python (hashlib md5)
    — exact equality on the integer register state AND the emitted
    estimate, plus the accuracy envelope ~1.04/sqrt(m)."""
    import hashlib

    from btrdb_server_spark.functions.sketch import hll_distinct

    ids = [f"u{i}" for i in range(3000)]
    df = spark.createDataFrame(
        [("g", i) for i in ids], "event_type string, user_id string"
    )
    out = hll_distinct(df, p=8).collect()[0]
    m = 256
    regs = {}
    for i in ids:
        h60 = int(hashlib.md5(f"hll:{i}".encode()).hexdigest()[:15], 16)
        reg = h60 % m
        suf = (h60 >> 8) % (1 << 40)
        rank = 41 - (suf.bit_length())
        regs[reg] = max(regs.get(reg, 0), rank)
    S = sum(1 << (41 - M) for M in regs.values()) + (m - len(regs)) * (1 << 41)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m * float(1 << 41) / float(S)
    v = m - len(regs)
    est = m * math.log(m / v) if (raw <= 2.5 * m and v > 0) else raw
    assert out.n_exact == 3000
    assert out.n_registers_used == len(regs)
    assert out.hll_est == est
    assert abs(out.hll_est - 3000) / 3000 < 4 * 1.04 / math.sqrt(m)


def test_bloom_no_false_negatives(spark):
    """The one-sided Bloom guarantee: every true member is claimed, at
    every filter size — false positives allowed, negatives never."""
    from btrdb_server_spark.functions.sketch import bloom_audit

    rows = [(i, "src0" if i % 3 == 0 else f"src{1 + i % 2}") for i in range(240)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    for m_bits in (64, 256, 4096):
        out = {r.source: r for r in bloom_audit(df, m_bits=m_bits).collect()}
        b = out["src0"]
        assert b.claimed == b.n_ids == b.true_members  # no false negatives
        assert b.false_positives == 0
        for srcname in ("src1", "src2"):
            nm = out[srcname]
            assert nm.true_members == 0
            assert nm.false_positives == nm.claimed  # every claim is false
            assert nm.fp_rate == nm.false_positives / nm.n_ids


def test_ams_f2_brute_force(spark):
    """AMS estimators recomputed in pure Python: exact integer equality of
    f2_exact, the median order statistic, and the mean."""
    import hashlib
    from collections import Counter

    from btrdb_server_spark.functions.sketch import ams_f2

    texts = ["a b c a", "b b d", "a e f g b", "c c c"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    out = ams_f2(df, d=8).collect()[0]
    cnt = Counter(tok for t in texts for tok in t.split())
    assert out.f2_exact == sum(c * c for c in cnt.values())
    sqs = []
    for r in range(8):
        s = 0
        for tok, c in cnt.items():
            h = int(hashlib.md5(f"ams{r}:{tok}".encode()).hexdigest()[:4], 16)
            s += c if h % 2 == 0 else -c
        sqs.append(s * s)
    sqs.sort()
    assert out.f2_est_median == sqs[3]  # lower median of 8
    assert out.f2_est_mean == sum(sqs) / 8.0
    assert out.n_tokens_distinct == len(cnt)


def test_mips_norm_augmentation_rank_equivalence(spark):
    """The MIPS reduction's defining fact: ordering by raw dot equals
    ordering by augmented-space cosine (same denominator per row), and
    the dots match numpy."""
    import numpy as np

    from btrdb_server_spark.functions.similarity import mips_topk

    rng = np.random.RandomState(5)
    vecs = rng.randn(40, 8) * rng.uniform(0.2, 3.0, size=(40, 1))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = mips_topk(df, probe_id=3, k=40).collect()
    dots = [r.dot for r in out]
    augs = [r.aug_cos for r in out]
    assert dots == sorted(dots, reverse=True)
    assert augs == sorted(augs, reverse=True)  # same ordering
    q = vecs[3]
    byid = {r.vec_id: r.dot for r in out}
    for i, v in enumerate(vecs):
        assert abs(byid[i] - float(np.dot(v, q))) < 2e-6


def test_sq8_error_bound_and_recall(spark):
    """SQ8 decode error per dimension is at most one quantization step, so
    |approx_dot - exact_dot| <= sum_i |q_i| * step_i; and top-1 recall
    holds on a well-separated corpus."""
    import numpy as np

    from btrdb_server_spark.functions.similarity import sq8_topk

    rng = np.random.RandomState(11)
    vecs = rng.randn(60, 8)
    vecs[42] = vecs[7] * 1.5  # dominant MIPS neighbor of probe 7
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = sq8_topk(df, probe_id=7, k=60, dim=8).collect()
    steps = (vecs.max(0) - vecs.min(0)) / 255.0
    bound = float(np.abs(vecs[7]) @ steps) + 4e-6  # + rounding slack
    for r in out:
        assert abs(r.err) <= bound
    assert out[0].vec_id == 42


def test_containment_detects_subset(spark):
    """A document fully quoted inside a longer one: containment 1.0 in the
    quote->host direction, below threshold in reverse."""
    from btrdb_server_spark.functions.dedup import containment_pairs

    quote = "alpha beta gamma delta epsilon zeta"
    host = (
        "intro words here " + quote + " and then a very long tail "
        "of unrelated filler text that keeps going on and on with many "
        "more tokens than the quoted span itself"
    )
    other = "completely different content nothing shared at all whatsoever"
    df = spark.createDataFrame(
        [(1, quote), (2, host), (3, other)], "doc_id long, text string"
    )
    out = {(r.src, r.dst): r.containment for r in containment_pairs(df, k=3).collect()}
    assert out[(1, 2)] == 1.0
    assert (2, 1) not in out  # host is not contained in the quote
    assert all(3 not in pair for pair in out)


def test_kmv_set_ops_below_k_is_exact(spark):
    """With both groups under k distinct ids the sketches hold every
    hash, so union/intersection/Jaccard estimates are EXACT."""
    from btrdb_server_spark.functions.sketch import kmv_set_ops

    rows = (
        [(i, "click") for i in range(80)]
        + [(i, "purchase") for i in range(40, 120)]
    )
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    r = kmv_set_ops(df, k=256).collect()[0]
    assert (r.n_a, r.n_b, r.union_exact, r.inter_exact) == (80, 80, 120, 40)
    assert r.union_est == 120.0
    assert r.inter_est == r.inter_exact
    assert r.jaccard_est == r.jaccard_exact == 40 / 120


def test_tail_index_powerlaw_recovery(spark):
    """Pareto(alpha) samples -> Hill alpha near the truth; recomputed in
    pure python bit-exactly."""
    import math
    import random

    from btrdb_server_spark.operators.tsshape import tail_index

    rng = random.Random(6)
    alpha_true = 2.0
    vals = [
        max(1, round(100 * (rng.random() ** (-1 / alpha_true))))
        for _ in range(3000)
    ]
    df = _px(spark, vals)
    r = tail_index(df, PT0, PT0 + 3000 * PW, k=100).collect()[0]
    top = sorted(vals, reverse=True)
    xk1 = top[100]
    ls = 0.0
    for v in top[:100]:
        ls = ls + math.log(v / xk1)
    assert r.alpha == 100.0 / ls
    assert 1.2 < r.alpha < 3.2  # around the true tail index


PT0 = 10_000_000
PW = 1_000


def _px(spark, series, uuid="s"):
    rows = [(uuid, PT0 + i * PW, c / 100.0) for i, c in enumerate(series)]
    return spark.createDataFrame(rows, "uuid string, time long, value double")



def test_group_sample_deterministic_and_bounded(spark):
    from btrdb_server_spark.operators.tsshape import group_sample

    rows = [(f"u{j}", PT0 + i * PW, float(i)) for j in range(3) for i in range(200)]
    df = spark.createDataFrame(rows, "uuid string, time long, value double")
    a = group_sample(df, PT0, PT0 + 200 * PW, k=5).collect()
    b = group_sample(df.repartition(7), PT0, PT0 + 200 * PW, k=5).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]  # partition-proof
    per = {}
    for r in a:
        per.setdefault(r.uuid, []).append(r.rk)
    assert all(len(v) == 5 and v == sorted(v) for v in per.values())
