"""Property tests for the time-series shape pack (operators/tsshape.py):
independent pure-python/pandas recomputation (the reference's
randomized-compare strategy, quasar_test.go:73-120) plus the analytic
invariants each operator owes — SG polynomial reproduction, decomposition
additivity, known-period recovery."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from btrdb_server_spark.operators.tsshape import (
    dominant_period,
    peak_detect,
    permutation_entropy,
    savgol_smooth,
    seasonal_decompose,
    variance_ratio,
)

T0 = 10_000_000
W = 1_000  # bucket width (ns)


def _pts(spark, series, uuid="s"):
    """One point per bucket at the bucket start; values = cents/100."""
    rows = [(uuid, T0 + i * W, c / 100.0) for i, c in enumerate(series)]
    return spark.createDataFrame(rows, "uuid string, time long, value double")


def test_variance_ratio_brute_force(spark):
    rng = random.Random(7)
    xs = [rng.randint(-500, 500) for _ in range(40)]
    n = len(xs)
    df = _pts(spark, xs)
    out = {r.q: r.vr for r in variance_ratio(df, T0, T0 + n * W, W, qs=(2, 5)).collect()}
    S = sum(xs)
    SS = sum(v * v for v in xs)
    for q in (2, 5):
        ys = [sum(xs[t : t + q]) for t in range(n - q + 1)]
        ny = len(ys)
        Sy = sum(ys)
        SSy = sum(y * y for y in ys)
        num = (float(ny) * float(SSy) - float(Sy) * float(Sy)) * n * n
        den = float(q) * (n * float(SS) - float(S) * float(S)) * ny * ny
        assert out[q] == num / den


def test_variance_ratio_random_walk_near_one(spark):
    """Increments iid -> VR(q) ~ 1 (within sampling noise)."""
    rng = random.Random(1)
    xs = [rng.randint(-100, 100) for _ in range(400)]
    df = _pts(spark, xs)
    out = {r.q: r.vr for r in variance_ratio(df, T0, T0 + 400 * W, W, qs=(2,)).collect()}
    assert abs(out[2] - 1.0) < 0.25


def test_permutation_entropy_brute_force_and_edges(spark):
    rng = random.Random(3)
    xs = [rng.randint(0, 50) for _ in range(60)]
    df = _pts(spark, xs)
    row = permutation_entropy(df, T0, T0 + 60 * W, W).collect()[0]
    from collections import Counter

    pats = Counter()
    for i in range(58):
        a, b, c = xs[i], xs[i + 1], xs[i + 2]
        r0 = (b < a) + (c < a)
        r1 = (a <= b) + (c < b)
        r2 = (a <= c) + (b <= c)
        pats[r0 * 9 + r1 * 3 + r2] += 1
    N = sum(pats.values())
    h = 0.0
    for code in sorted(pats):
        p = pats[code] / N
        h = h + (-p * math.log(p))
    assert row.n_triples == N
    assert row.h == h
    # strictly increasing series -> one pattern -> zero entropy
    mono = _pts(spark, list(range(0, 120, 2)), uuid="m")
    r2 = permutation_entropy(mono, T0, T0 + 60 * W, W).collect()[0]
    assert r2.h == 0.0 and r2.h_norm == 0.0


def test_peak_detect_known_peaks(spark):
    #           0    1     2    3     4     5    6
    xs = [100, 500, 100, 2000, 100, 2100, 2100, 100]
    df = _pts(spark, xs)
    out = peak_detect(df, T0, T0 + 8 * W, W, min_delta=3.0).collect()
    got = {(r.time - T0) // W: (r.value, r.prominence_min) for r in out}
    # bucket 1 (500 over 100/100, gap 4.00) and bucket 3 (gap 19.00);
    # bucket 5 starts a plateau — its higher neighbor is the plateau
    # partner, so its prominence gap is 0 and min_delta=3 rejects it;
    # bucket 6 fails s > prev.
    assert set(got) == {1, 3}
    assert got[1] == (5.0, 4.0)
    assert got[3] == (20.0, 19.0)
    # with no prominence floor the plateau's FIRST bucket is credited
    out0 = peak_detect(df, T0, T0 + 8 * W, W, min_delta=0.0).collect()
    got0 = {(r.time - T0) // W for r in out0}
    assert got0 == {1, 3, 5}


def test_savgol_reproduces_quadratic_exactly(spark):
    """The defining SG property: a polynomial of the filter's order passes
    through unchanged — and with integer inputs the equality is EXACT."""
    xs = [3 * t * t - 7 * t + 11 for t in range(20)]
    df = _pts(spark, xs)
    out = savgol_smooth(df, T0, T0 + 20 * W, W).collect()
    assert len(out) == 16
    for r in out:
        assert r.smooth == r.raw


def test_seasonal_decompose_additivity_and_recovery(spark):
    """x ~= trend + seasonal + residual (additivity), and a pure
    seasonal+linear series yields near-zero residuals away from noise."""
    period = 6
    season = [0, 40, 80, 40, 0, -160]  # zero-mean
    xs = [1000 + 5 * t + season[t % period] for t in range(48)]
    df = _pts(spark, xs)
    out = seasonal_decompose(df, T0, T0 + 48 * W, W, period=period).collect()
    assert len(out) == 48 - period
    for r in out:
        assert abs(r.x - (r.trend + r.seasonal + r.residual)) < 1e-9
        assert abs(r.residual) < 1e-9  # exact linear trend + exact season


def test_dominant_period_recovers_cycle(spark):
    period = 7
    rng = random.Random(9)
    xs = [
        1000 * (1 + (t % period == 0)) + rng.randint(-20, 20) for t in range(70)
    ]
    df = _pts(spark, xs)
    row = dominant_period(df, T0, T0 + 70 * W, W, min_lag=2, max_lag=20).collect()[0]
    assert row.best_lag == period
    assert row.acf > 0.5


def test_readability_brute_force(spark):
    from btrdb_server_spark.functions.text import readability

    docs = [
        (1, "The cat sat. The dog ran! Did it rain?"),
        (2, "aeiou bcd xyz"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in readability(df).collect()}
    import re

    for did, text in docs:
        words = len([t for t in text.lower().split() if t])
        sents = max(1, len(re.findall(r"[.!?]+", text)))
        syls = len(re.findall(r"[aeiouy]+", text.lower()))
        r = out[did]
        assert (r.words, r.sentences, r.syllables) == (words, sents, syls)
        assert r.fk_grade == 0.39 * (words / sents) + 11.8 * (syls / words) - 15.59


def test_frequent_sequences_known_motif(spark):
    from btrdb_server_spark.operators.events import frequent_sequences

    rows = []
    eid = 0
    for u in range(10):
        for ev in ["a", "b", "c", "a", "b", "c"]:
            rows.append((eid, u, eid, ev))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts long, event_type string")
    out = frequent_sequences(df, n=3, k=3).collect()
    assert out[0].seq == "a>b>c" and out[0].cnt == 20
    # sliding n-grams per 6-event user: 4 each -> a>b>c x2, b>c>a, c>a>b
    assert {r.seq for r in out} == {"a>b>c", "b>c>a", "c>a>b"}


def test_ols_two_factor_exact_fit(spark):
    """A y that is EXACTLY b0 + b1*x1 + b2*x2 on integer quanta: Cramer on
    exact moments recovers the coefficients bit-exactly, r2 == 1."""
    import random

    from btrdb_server_spark.operators.corr import ols_two_factor

    rng = random.Random(2)
    rows = []
    for t in range(24):
        x1 = rng.randint(100, 900)
        x2 = rng.randint(100, 900)
        y = 700 + 5 * x1 - 2 * x2
        for uuid, cents in (("y", y), ("x1", x1), ("x2", x2)):
            rows.append((uuid, T0 + t * W, cents / 100.0))
    df = spark.createDataFrame(rows, "uuid string, time long, value double")
    r = ols_two_factor(df, "y", "x1", "x2", T0, T0 + 24 * W, W).collect()[0]
    assert r.b1 == 5.0 and r.b2 == -2.0 and r.b0 == 7.0  # 700 quanta = 7.00
    assert r.r2 == 1.0


def test_degree_assortativity_star_vs_clique(spark):
    """A star graph is maximally disassortative; a clique has zero degree
    variance (null r). Orders stand in for edges via 2-item baskets."""
    from btrdb_server_spark.functions.graph import degree_assortativity

    star = [(o, 0) for o in range(5)] + [(o, o + 1) for o in range(5)]
    df = spark.createDataFrame(star, "l_orderkey long, l_partkey long")
    r = degree_assortativity(df).collect()[0]
    assert r.n_edges == 10 and r.n_nodes == 6
    assert r.assortativity == -1.0  # perfect star
    clique = [(100 + i * 10 + j, p) for i, j, p in
              [(a, b, p) for a in range(4) for b in range(2) for p in (0,)]]
    # build a triangle instead: orders {1:(a,b), 2:(b,c), 3:(a,c)}
    tri = [(1, 10), (1, 11), (2, 11), (2, 12), (3, 10), (3, 12)]
    df2 = spark.createDataFrame(tri, "l_orderkey long, l_partkey long")
    r2 = degree_assortativity(df2).collect()[0]
    assert r2.assortativity is None  # zero variance -> undefined


def test_runs_test_brute_force(spark):
    """Alternating series -> maximal runs (positive z); block series ->
    two runs (negative z); values recomputed in pure python."""
    from btrdb_server_spark.operators.tsshape import runs_test

    alt = [100 + i if i % 2 == 0 else 900 + i for i in range(20)]
    blk = [100 + i for i in range(10)] + [900 + i for i in range(10)]
    df = _pts(spark, alt, uuid="alt").unionAll(_pts(spark, blk, uuid="blk"))
    out = {r.uuid: r for r in runs_test(df, T0, T0 + 20 * W, W).collect()}

    def brute(xs):
        med = sorted(range(len(xs)), key=lambda i: (xs[i], i))
        m = xs[med[(len(xs) + 1) // 2 - 1]]
        ups = [1 if x > m else 0 for x in xs if x != m]
        n1, n2 = sum(ups), len(ups) - sum(ups)
        runs = 1 + sum(1 for i in range(1, len(ups)) if ups[i] != ups[i - 1])
        nn = float(n1) + float(n2)
        two = 2.0 * float(n1) * float(n2)
        mu = two / nn + 1.0
        var = (two * (two - nn)) / (nn * nn * (nn - 1.0))
        return n1, n2, runs, (float(runs) - mu) / var**0.5

    for name, xs in (("alt", alt), ("blk", blk)):
        n1, n2, runs, z = brute(xs)
        r = out[name]
        assert (r.n1, r.n2, r.runs) == (n1, n2, runs)
        assert abs(r.z - z) < 1e-12
    assert out["alt"].z > 0 > out["blk"].z


def test_power_users_concentration(spark):
    from btrdb_server_spark.operators.events import power_users

    # 20 users; user 0 contributes 81 events, the rest 1 each
    rows = [(i, 0) for i in range(81)] + [(81 + u, u) for u in range(1, 20)]
    df = spark.createDataFrame(rows, "event_id long, user_id long")
    r = power_users(df, decile=10).collect()[0]
    assert (r.n_users, r.k, r.top_events, r.total_events) == (20, 2, 82, 100)
    assert r.share == 0.82


def test_ngram_coverage_monotone_and_exact(spark):
    from btrdb_server_spark.functions.text import ngram_coverage

    docs = [(1, "a b c a b c a b d"), (2, "a b c x y z")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.k: r for r in ngram_coverage(df, n=3, ks=(1, 2, 100)).collect()}
    from collections import Counter

    grams = Counter()
    for _, t in docs:
        toks = t.split()
        for i in range(len(toks) - 2):
            grams[" ".join(toks[i : i + 3])] += 1
    total = sum(grams.values())
    top = sorted(grams.items(), key=lambda kv: (-kv[1], kv[0]))
    assert out[1].covered == top[0][1]
    assert out[2].covered == top[0][1] + top[1][1]
    assert out[100].covered == total and out[100].coverage == 1.0
    assert out[1].coverage <= out[2].coverage <= out[100].coverage


def test_customer_distribution_includes_zero(spark):
    from btrdb_server_spark.operators.olap import customer_distribution

    cust = spark.createDataFrame([(i,) for i in range(6)], "c_custkey long")
    orders = spark.createDataFrame(
        [(o, c) for o, c in [(1, 0), (2, 0), (3, 1), (4, 2), (5, 2), (6, 2)]],
        "o_orderkey long, o_custkey long",
    )
    out = {r.c_count: r.custdist for r in customer_distribution(orders, cust).collect()}
    assert out == {0: 3, 1: 1, 2: 1, 3: 1}


def test_hist_quantiles_exact_when_bins_resolve(spark):
    """With a value domain narrower than the bin count every bin holds one
    distinct value, so the estimate's containing cell is exact to within
    the cell width; and the exact column IS the order statistic."""
    import random

    from btrdb_server_spark.operators.tsshape import hist_quantiles

    rng = random.Random(4)
    vals = [rng.randint(0, 1000) for _ in range(500)]
    df = _pts(spark, vals)
    out = {r.p: r for r in hist_quantiles(df, T0, T0 + 500 * W, W).collect()}
    svals = sorted(vals)
    for p in (50, 90, 99):
        rank = -((-p * 500) // 100)
        assert out[p].exact == svals[rank - 1] / 100.0
        width = (max(vals) - min(vals) + 1) / 64 / 100.0
        assert abs(out[p].est - out[p].exact) <= width + 1e-9


def test_cluster_purity_separated_clusters(spark):
    """Two well-separated blobs -> purity 1.0 for both labels; a point
    planted at the other blob's centroid flips exactly one count."""
    import numpy as np

    from btrdb_server_spark.functions.similarity import cluster_purity

    rng = np.random.RandomState(3)
    rows = []
    for i in range(30):
        base = 5.0 if i % 2 == 0 else -5.0
        v = base + rng.randn(8) * 0.1
        rows.append((i, [float(x) for x in v], i % 2))
    # plant a defector: labeled 0, sitting at blob 1
    rows.append((99, [-5.0] * 8, 0))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = {r.label: r for r in cluster_purity(df).collect()}
    assert out[1].purity == 1.0
    assert out[0].nearest_own == out[0].n - 1  # only the defector strays
    assert out[0].mean_intra_sq > out[1].mean_intra_sq  # defector inflates


def test_error_budget_brute_force(spark):
    from btrdb_server_spark.operators.tsshape import error_budget

    rows = []
    eid = 0
    # window 0: 2 errors / 10 events; window 1: 0 / 5
    for i in range(10):
        rows.append((T0 + i, "error" if i < 2 else "click"))
    for i in range(5):
        rows.append((T0 + W + i, "view"))
    df = spark.createDataFrame(rows, "time long, event_type string")
    out = error_budget(
        df, budget_ppm=100_000, width=W, start=T0, end=T0 + 2 * W
    ).collect()
    w0, w1 = out[0], out[1]
    assert (w0.events, w0.errors, w0.error_share) == (10, 2, 0.2)
    assert w0.burn_rate == 2_000_000 / 1_000_000  # 2x the 10% budget
    assert w1.errors == 0 and w1.burn_rate == 0.0
    assert w1.cum_budget_used == 2_000_000 / (15 * 100_000)


def test_incident_report_groups_runs(spark):
    from btrdb_server_spark.operators.tsshape import incident_report

    xs = [100] * 20
    xs[5] = 5000
    xs[6] = 5000
    xs[12] = 5000
    df = _pts(spark, xs)
    out = incident_report(df, T0, T0 + 20 * W, W, z_threshold=1.0).collect()
    spans = [((r.incident_start - T0) // W, (r.incident_end - T0) // W, r.n_buckets) for r in out]
    assert (5, 7, 2) in spans and (12, 13, 1) in spans
    assert all(r.peak_z > 1.0 for r in out)


def test_top_movers_rank(spark):
    from btrdb_server_spark.operators.tsshape import top_movers

    xs = [100, 100, 900, 100, 100, 100]  # +800 then -800 moves
    df = _pts(spark, xs)
    out = top_movers(df, T0, T0 + 6 * W, W, k=2).collect()
    deltas = sorted(r.delta for r in out)
    assert deltas == [-8.0, 8.0]


def test_quality_curve_monotone(spark):
    from btrdb_server_spark.functions.curation import quality_curve

    docs = [(i, " ".join(["w"] * n)) for i, n in enumerate([5, 15, 30, 60, 200])]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = quality_curve(df, thresholds=(10, 50, 100)).collect()
    kept = [r.docs_kept for r in out]
    assert kept == [4, 2, 1]
    assert out[0].tokens_kept == 15 + 30 + 60 + 200
    shares = [r.token_share for r in out]
    assert shares == sorted(shares, reverse=True)


def test_granger_lite_detects_lagged_dependence(spark):
    """y built as 0.8*x_{t-1} + noise: the F-stat is large and b_x near
    0.8; an independent pair yields a small F."""
    import random

    from btrdb_server_spark.operators.corr import granger_lite

    rng = random.Random(8)
    xs = [rng.randint(500, 1500) for _ in range(60)]
    ys = [1000] + [round(0.8 * xs[t - 1]) + rng.randint(-20, 20) for t in range(1, 60)]
    zs = [rng.randint(500, 1500) for _ in range(60)]
    rows = []
    for t in range(60):
        for u, v in (("x", xs[t]), ("y", ys[t]), ("z", zs[t])):
            rows.append((u, T0 + t * W, v / 100.0))
    df = spark.createDataFrame(rows, "uuid string, time long, value double")
    dep = granger_lite(df, "y", "x", T0, T0 + 60 * W, W).collect()[0]
    ind = granger_lite(df, "y", "z", T0, T0 + 60 * W, W).collect()[0]
    assert dep.f_stat > 50
    assert abs(dep.b_x - 0.8) < 0.05
    assert ind.f_stat < 10
    assert dep.rss_full <= dep.rss_restricted  # adding a regressor never hurts


def test_sax_motifs_periodic_series(spark):
    """A strict 4-periodic series yields exactly 4 motifs, each the
    rotation of the same word, with near-equal counts."""
    from btrdb_server_spark.operators.tsshape import sax_motifs

    pat = [100, 900, 2000, 2900]
    xs = [pat[t % 4] for t in range(40)]
    df = _pts(spark, xs)
    out = sax_motifs(df, T0, T0 + 40 * W, W, word=4, k=10).collect()
    assert len(out) == 4
    assert {r.motif for r in out} == {"abcd", "bcda", "cdab", "dabc"}
    assert all(9 <= r.cnt <= 10 for r in out)


def test_streaming_hll_batch_split_invariant(spark, tmp_path):
    """The converged streaming-HLL emission is identical whether the ids
    arrive in 1 or 4 micro-batches (register max is associative and
    idempotent), and equals the batch estimate."""
    from btrdb_server_spark.functions.sketch import hll_distinct
    from btrdb_server_spark.streaming.stateful import streaming_hll

    ids = [("g", f"u{i}") for i in range(2000)]
    df = spark.createDataFrame(ids, "uuid string, id string")
    src = str(tmp_path / "src")
    df.repartition(4).write.parquet(src)
    outs = []
    for j, mft in enumerate((1, 4)):
        stream = (
            spark.readStream.schema("uuid string, id string")
            .option("maxFilesPerTrigger", mft)
            .parquet(src)
        )
        name = f"shll_{j}"
        q = (
            streaming_hll(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / f"ckpt{j}"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        row = (
            spark.sql(f"SELECT * FROM {name}")
            .orderBy(F.col("n_seen").desc())
            .collect()[0]
        )
        outs.append(row)
    assert outs[0] == outs[1]
    batch = hll_distinct(
        df.withColumnRenamed("uuid", "event_type").withColumnRenamed("id", "user_id"),
        p=8,
    ).collect()[0]
    assert outs[0].hll_est == batch.hll_est
    assert outs[0].n_registers_used == batch.n_registers_used


def test_target_encode_loo_no_leakage(spark):
    """The LOO encoding of a row excludes exactly that row: for category
    sums S and size n, enc_i = (S - v_i)/(n - 1); singletons are null."""
    from btrdb_server_spark.functions.mlprep import target_encode

    rows = [(1, "a", 10.0), (2, "a", 20.0), (3, "a", 30.0), (4, "b", 5.0)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = {r.event_id: r.loo_enc for r in target_encode(df).collect()}
    assert out[1] == 25.0 and out[2] == 20.0 and out[3] == 15.0
    assert out[4] is None


def test_split_report_user_level_and_weights(spark):
    """Every event of a user lands in one split, and the 8/1/1 weights
    roughly hold over many users."""
    from btrdb_server_spark.functions.mlprep import split_report

    rows = [(u, "t") for u in range(1000) for _ in range(3)]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    out = split_report(df).collect()
    by = {r.split: r for r in out}
    assert sum(r.n_rows for r in out) == 3000
    assert all(r.n_rows == 3 * r.n_users for r in out)  # user-level split
    assert 0.7 < by["train"].type_share < 0.9
    assert abs(sum(r.type_share for r in out) - 1.0) < 1e-12


def test_k_anonymity_flags_small_groups(spark):
    from btrdb_server_spark.functions.mlprep import k_anonymity

    rows = []
    # 10 users in one quasi-group (safe), 1 user alone in another (risky)
    for u in range(10):
        rows.append((3_600_000_000_000 * 5, "a", u % 2))  # hour 5, 2 buckets
    rows.append((3_600_000_000_000 * 7, "a", 49))  # singleton group
    df = spark.createDataFrame(rows, "time long, event_type string, user_id long")
    r = k_anonymity(df, k=5, user_buckets=50).collect()[0]
    assert r.k_min == 1 and r.rows_below_k == 1
    assert r.n_groups == 3


def test_hashed_features_row_sums(spark):
    from btrdb_server_spark.functions.mlprep import hashed_features

    rows = [(3_600_000_000_000 * h, f"t{h % 3}", h % 4) for h in range(96)]
    df = spark.createDataFrame(rows, "time long, event_type string, user_id long")
    out = hashed_features(df).collect()
    for r in out:
        assert sum(r[f"f{i}"] for i in range(8)) == r.n_events


def test_curation_pipeline_monotone_funnel(spark):
    """The funnel is monotone non-increasing in both docs and tokens, and
    an exact duplicate is dropped at stage 1 while a contaminated doc
    falls at stage 3."""
    from btrdb_server_spark.functions.curation import curation_pipeline

    good = ("the quick brown fox jumps over the lazy dog and runs on "
            "with plenty of natural language for the filter to like")
    rows = [
        (0, good),                      # survives everything
        (1, good),                      # exact duplicate of 0 -> stage 1
        (2, "the bench doc is this exact sentence with the tokens on and on repeated for the benchmark"),
        (3, "x" * 50),                  # fails quality (one giant token)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = docs.where(F.col("doc_id") == 2)
    out = curation_pipeline(docs, bench).collect()
    d = [r.docs for r in out]
    t = [r.tokens for r in out]
    assert d == sorted(d, reverse=True) and t == sorted(t, reverse=True)
    assert d[0] == 4 and d[1] == 3        # dup dropped
    assert d[3] == d[2] - 1               # the bench doc self-contaminates
    assert out[0].doc_share == 1.0 and out[0].token_share == 1.0


def test_var_cvar_brute_force(spark):
    import random

    from btrdb_server_spark.operators.tsshape import var_cvar

    rng = random.Random(12)
    xs = [rng.randint(-1000, 1000) for _ in range(50)]
    df = _pts(spark, xs)
    r = var_cvar(df, T0, T0 + 50 * W, W, alpha_pct=10).collect()[0]
    deltas = sorted(xs[i] - xs[i - 1] for i in range(1, 50))
    rank = -((-10 * 49) // 100)
    var_q = deltas[rank - 1]
    tail = [d for d in deltas if d <= var_q]
    assert r.var == var_q / 100.0
    assert r.cvar == sum(tail) / (len(tail) * 100.0)
    assert r.n_tail == len(tail)
    assert r.cvar <= r.var  # tail mean can't exceed its upper bound


def test_mix_entropy_uniform_vs_point_mass(spark):
    from btrdb_server_spark.operators.events import mix_entropy

    rows = []
    # window 0: perfectly uniform over 5 types; window 1: all one type
    types = ["click", "view", "purchase", "signup", "error"]
    for i, ty in enumerate(types * 4):
        rows.append((i, ty))
    for i in range(10):
        rows.append((1_000 + i, "error"))
    df = spark.createDataFrame(rows, "time long, event_type string")
    out = mix_entropy(df, width=1_000, start=0, end=2_000).collect()
    assert abs(out[0].h_norm - 1.0) < 1e-12  # uniform -> max entropy
    assert out[1].h == 0.0 and out[1].dominant == "error"


def test_user_novelty_accounting(spark):
    from btrdb_server_spark.operators.events import user_novelty

    rows = [(0, 1), (0, 2), (1_000, 1), (1_000, 3), (2_000, 3)]
    df = spark.createDataFrame(rows, "time long, user_id long")
    out = {(r.time // 1_000): r for r in user_novelty(df, width=1_000, start=0, end=3_000).collect()}
    assert (out[0].new_users, out[0].returning_users) == (2, 0)
    assert (out[1].new_users, out[1].returning_users) == (1, 1)
    assert (out[2].new_users, out[2].returning_users) == (0, 1)


def test_hour_dow_heatmap_cells(spark):
    from btrdb_server_spark.operators.tsshape import hour_dow_heatmap

    HOUR = 3_600_000_000_000
    # 1970-01-01 (epoch day 0) was a Thursday -> dow 4
    rows = [("s", 5 * HOUR, 10.0), ("s", 5 * HOUR + 1, 30.0),
            ("s", 29 * HOUR, 7.0)]
    df = spark.createDataFrame(rows, "uuid string, time long, value double")
    out = {(r.dow, r.hod): r for r in hour_dow_heatmap(df, 0, 48 * HOUR).collect()}
    assert out[(4, 5)].n == 2 and out[(4, 5)].mean == 20.0
    assert out[(5, 5)].n == 1 and out[(5, 5)].mean == 7.0


def test_rerank_fusion_properties(spark):
    """A doc at rank 1 in both lists dominates; a doc present in only
    one list scores exactly its single term."""
    from btrdb_server_spark.functions.retrieval import rerank_fusion

    docs = [
        (0, "spark hash merge window spark hash merge window"),
        (1, "spark hash something else entirely here today now"),
        (2, "nothing relevant at all in this one whatsoever ok"),
    ]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    import numpy as np

    rng = np.random.RandomState(4)
    vecs = rng.randn(3, 8)
    vecs[0] = vecs[1] * 2.0  # doc 0 also the nearest neighbor of probe 1
    edf = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    out = rerank_fusion(ddf, edf, ["spark", "hash", "merge", "window"],
                        probe_id=1, pool=3, k=3).collect()
    assert out[0].doc_id == 0
    assert out[0].rrf == 1.0 / 61.0 + 1.0 / 62.0 or out[0].rrf == 2.0 / 61.0
    only_lex = [r for r in out if r.cos_rank is None]
    for r in only_lex:
        assert r.rrf == 1.0 / (60.0 + r.bm25_rank)


def test_discount_elasticity_planted_slope(spark):
    from btrdb_server_spark.operators.olap import discount_elasticity

    rows = []
    # brand A: qty = 10 + 3*disc_h exactly; brand B: constant discount
    for i, dh in enumerate([0, 2, 4, 6, 8] * 4):
        rows.append((i, 10.0 + 3 * dh, dh / 100.0, "Brand#A"))
    for i in range(5):
        rows.append((100 + i, 7.0, 0.05, "Brand#B"))
    li = spark.createDataFrame(
        [(i, q, d) for i, q, d, b in rows],
        "l_partkey long, l_quantity double, l_discount double",
    )
    part = spark.createDataFrame(
        [(i, b) for i, q, d, b in rows], "p_partkey long, p_brand string"
    )
    out = {r.p_brand: r for r in discount_elasticity(li, part).collect()}
    assert out["Brand#A"].slope == 3.0 and out["Brand#A"].r2 == 1.0
    assert out["Brand#B"].slope is None  # zero discount variance


def test_embedding_drift_planted_dimension(spark):
    """Shift one dimension in the odd half only: that dim tops the drift
    ranking with a large |z|; undrifted dims stay small."""
    import numpy as np

    from btrdb_server_spark.functions.similarity import embedding_drift

    rng = np.random.RandomState(2)
    rows = []
    for i in range(200):
        v = rng.randn(8) * 0.1
        if i % 2 == 1:
            v[3] += 2.0  # drift dim 3 in half B
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = embedding_drift(df, top=8).collect()
    assert out[0].dim == 3
    assert abs(out[0].z) > 10
    assert all(abs(r.z) < 5 for r in out[1:])
    assert abs((out[0].mean_b - out[0].mean_a) - 2.0) < 0.1


def test_vocab_growth_monotone_and_exact(spark):
    from btrdb_server_spark.functions.text import vocab_growth

    docs = [(i, f"common w{i} w{i % 3}") for i in range(10)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = vocab_growth(df, checkpoints=(2, 5, 10)).collect()
    vocabs = [r.vocab for r in out]
    toks = [r.tokens_total for r in out]
    assert toks == [6, 15, 30]
    # vocab at k: 'common' + distinct w{i} for i<k + distinct w{i%3} seen
    def brute(k):
        s = set()
        for i in range(k):
            s.update(f"common w{i} w{i % 3}".split())
        return len(s)
    assert vocabs == [brute(2), brute(5), brute(10)]
    assert vocabs == sorted(vocabs)


def test_skyline_dominance(spark):
    """No frontier point is dominated; every non-frontier point is."""
    from btrdb_server_spark.operators.olap import skyline_parts

    pts = [(1, 10.0, 5), (2, 10.0, 5), (3, 12.0, 8), (4, 15.0, 8),
           (5, 9.0, 2), (6, 20.0, 9), (7, 12.0, 3)]
    df = spark.createDataFrame(pts, "p_partkey long, p_retailprice double, p_size int")
    out = skyline_parts(df).collect()
    frontier = {(r.retail_price, r.p_size) for r in out}
    allp = [(p, s) for _, p, s in pts]
    def dominated(a):
        return any(
            (q[0] <= a[0] and q[1] >= a[1]) and q != a for q in set(allp)
        )
    for f in frontier:
        assert not dominated(f), f
    for a in set(allp):
        if a not in frontier:
            assert dominated(a), a
    # duplicates on a frontier pair are counted together
    d = {(r.retail_price, r.p_size): r.n_parts for r in out}
    assert d[(10.0, 5)] == 2


def test_weekend_effect_planted_difference(spark):
    from btrdb_server_spark.operators.tsshape import weekend_effect

    DAY = 86_400_000_000_000
    # 28 days from a Monday-epoch-ish origin: start at day index so that
    # dow of widx 0 = (day0+4)%7; use start=0 -> widx0 dow=4 (Thursday)
    xs = []
    for t in range(28):
        dow = (t + 4) % 7
        xs.append(50_000 if dow in (0, 6) else 10_000)
    rows = [("s", t * DAY, c / 100.0) for t, c in enumerate(xs)]
    df = spark.createDataFrame(rows, "uuid string, time long, value double")
    r = weekend_effect(df, 0, 28 * DAY).collect()[0]
    assert (r.n_wd, r.n_we) == (20, 8)
    assert r.mean_we == 500.0 and r.mean_wd == 100.0
    assert r.t is None or abs(r.t) > 0  # zero variance -> a+b == 0 -> null
    assert r.t is None  # constant groups: undefined t, reported null


def test_collection_tree_rollup(spark):
    from btrdb_server_spark.metadata import collection_tree

    rows = [
        ("u1", "a/b/c"), ("u2", "a/b/c"), ("u3", "a/b/d"), ("u4", "a/e"),
        ("u5", "z"),
    ]
    df = spark.createDataFrame(rows, "uuid string, collection string")
    out = {r.prefix: r for r in collection_tree(df).collect()}
    assert out["a"].n_streams == 4 and out["a"].n_collections == 3
    assert out["a/b"].n_streams == 3 and out["a/b"].n_collections == 2
    assert out["a/b/c"].n_streams == 2 and out["a/b/c"].n_collections == 1
    assert out["z"].depth == 1 and out["z"].n_streams == 1


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SET = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_SET
@given(
    xs=st.lists(
        st.integers(min_value=-10_000, max_value=10_000), min_size=12, max_size=60
    )
)
def test_variance_ratio_hypothesis(spark, xs):
    from btrdb_server_spark.operators.tsshape import variance_ratio

    n = len(xs)
    df = _pts(spark, xs)
    out = {r.q: r.vr for r in variance_ratio(df, T0, T0 + n * W, W, qs=(3,)).collect()}
    ys = [sum(xs[t : t + 3]) for t in range(n - 2)]
    ny, Sy, SSy = len(ys), sum(ys), sum(y * y for y in ys)
    S, SS = sum(xs), sum(v * v for v in xs)
    den = 3.0 * (n * float(SS) - float(S) * float(S)) * ny * ny
    if den == 0:
        assert out[3] is None
    else:
        num = (float(ny) * float(SSy) - float(Sy) * float(Sy)) * n * n
        assert out[3] == num / den


@_SET
@given(
    vals=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=-500, max_value=500),
        ),
        min_size=3,
        max_size=40,
    )
)
def test_target_encode_hypothesis(spark, vals):
    from collections import defaultdict

    from btrdb_server_spark.functions.mlprep import target_encode

    rows = [(i, t, c / 100.0) for i, (t, c) in enumerate(vals)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = {r.event_id: r.loo_enc for r in target_encode(df).collect()}
    sums, cnts = defaultdict(int), defaultdict(int)
    for t, c in vals:
        sums[t] += c
        cnts[t] += 1
    for i, (t, c) in enumerate(vals):
        if cnts[t] == 1:
            assert out[i] is None
        else:
            assert out[i] == (float(sums[t] - c) / float(cnts[t] - 1)) / 100.0


@_SET
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_bloom_one_sided_hypothesis(spark, seed):
    import random

    from btrdb_server_spark.functions.sketch import bloom_audit

    rng = random.Random(seed)
    ids = rng.sample(range(100_000), 60)
    rows = [(i, "src0" if j < 20 else "srcX") for j, i in enumerate(ids)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = {r.source: r for r in bloom_audit(df, m_bits=128, k_hashes=2).collect()}
    b = out["src0"]
    assert b.claimed == b.true_members == b.n_ids  # never a false negative
    assert out["srcX"].true_members == 0


def test_market_concentration_bounds(spark):
    """HHI in [1/n, 1]; a one-whale nation reads ~1, an equal-split
    nation reads exactly 1/n; top_share is the max customer share."""
    from btrdb_server_spark.operators.olap import market_concentration

    li, od = [], []
    # nation 0: four equal customers; nation 1: one whale + crumbs
    for cust, amount in [(0, 100.0), (1, 100.0), (2, 100.0), (3, 100.0),
                         (10, 970.0), (11, 10.0), (12, 10.0), (13, 10.0)]:
        okey = cust + 1000
        od.append((okey, cust))
        li.append((okey, amount, 0.0))
    lidf = spark.createDataFrame(li, "l_orderkey long, l_extendedprice double, l_discount double")
    oddf = spark.createDataFrame(od, "o_orderkey long, o_custkey long")
    cust_rows = [(c, 0 if c < 10 else 1) for c in [0, 1, 2, 3, 10, 11, 12, 13]]
    cdf = spark.createDataFrame(cust_rows, "c_custkey long, c_nationkey int")
    ndf = spark.createDataFrame([(0, "EQ"), (1, "WHALE")], "n_nationkey int, n_name string")
    out = {r.n_name: r for r in market_concentration(lidf, oddf, cdf, ndf).collect()}
    assert out["EQ"].hhi == 0.25 and out["EQ"].top_share == 0.25
    assert out["WHALE"].hhi == (970**2 + 3 * 10**2) / 1000**2
    assert out["WHALE"].top_share == 0.97


def test_gap_histogram_decades(spark):
    from btrdb_server_spark.operators.tsshape import gap_histogram

    times = [0, 5, 10, 1_010, 2_010, 1_000_000, 1_000_000]  # dup ts at end
    rows = [("s", t, 1.0) for t in times]
    df = spark.createDataFrame(rows, "uuid string, time long, value double")
    out = {r.digits: r for r in gap_histogram(df, 0, 2_000_000).collect()}
    # gaps: 5,5 (1 digit), 1000,1000 (4 digits), 997990 (6 digits), 0 dropped
    assert out[1].n_gaps == 2 and out[1].min_gap_ns == 5
    assert out[4].n_gaps == 2 and out[4].max_gap_ns == 1000
    assert out[6].n_gaps == 1 and out[6].min_gap_ns == 997_990
    assert set(out) == {1, 4, 6}


def test_halfway_point_frontloaded(spark):
    from btrdb_server_spark.operators.tsshape import halfway_point

    front = [900] * 3 + [10] * 17   # half the volume lands by bucket 1
    back = [10] * 17 + [900] * 3
    df = _pts(spark, front, uuid="front").unionAll(_pts(spark, back, uuid="back"))
    out = {r.uuid: r for r in halfway_point(df, T0, T0 + 20 * W, W).collect()}
    import itertools
    def brute(xs):
        tot = sum(xs); c = 0
        for i, v in enumerate(xs):
            c += v
            if 2 * c >= tot:
                return i
    assert out["front"].halfway_widx == brute(front)
    assert out["back"].halfway_widx == brute(back)
    assert out["front"].frontload_ratio < out["back"].frontload_ratio


def test_mode_value_and_share(spark):
    from btrdb_server_spark.operators.tsshape import mode_value

    xs = [100, 100, 100, 250, 250, 777]
    df = _pts(spark, xs)
    r = mode_value(df, T0, T0 + 6 * W).collect()[0]
    assert r.mode_value == 1.0 and r.mode_count == 3
    assert r.mode_share == 0.5
    # tie at the top -> smaller value wins
    ys = [100, 100, 250, 250, 9]
    r2 = mode_value(_pts(spark, ys, uuid="t"), T0, T0 + 5 * W).collect()[0]
    assert r2.mode_value == 1.0


def test_tukey_outliers_brute_force(spark):
    import random

    from btrdb_server_spark.operators.tsshape import tukey_outliers

    rng = random.Random(21)
    xs = [rng.randint(0, 1000) for _ in range(200)] + [99_999, -99_999]
    df = _pts(spark, xs)
    r = tukey_outliers(df, T0, T0 + len(xs) * W).collect()[0]
    sv = sorted(xs)
    n = len(sv)
    q1 = sv[-((-n) // 4) - 1]
    q3 = sv[-((-3 * n) // 4) - 1]
    lo = q1 - 1.5 * (q3 - q1)
    hi = q3 + 1.5 * (q3 - q1)
    assert r.q1 == q1 / 100.0 and r.q3 == q3 / 100.0
    assert r.n_below == sum(1 for v in xs if v < lo)
    assert r.n_above == sum(1 for v in xs if v > hi)
    assert r.n_above >= 1 and r.n_below >= 1


def test_lang_confusion_shares_sum_to_one(spark):
    from btrdb_server_spark.functions.text import lang_confusion

    docs = [
        (1, "the cat and the dog is here of course", "en"),
        (2, "el perro de la casa que ladra", "es"),
        (3, "zzz qqq xxx", "en"),  # no markers -> 'und'
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    out = lang_confusion(df).collect()
    cells = {(r.declared, r.predicted): r for r in out}
    assert cells[("en", "en")].n == 1
    assert cells[("es", "es")].n == 1 and cells[("es", "es")].share == 1.0
    assert cells[("en", "und")].n == 1
    from collections import defaultdict

    by_decl = defaultdict(float)
    for r in out:
        by_decl[r.declared] += r.share
    assert all(abs(v - 1.0) < 1e-12 for v in by_decl.values())


def test_hourly_conversion_counts(spark):
    from btrdb_server_spark.operators.events import hourly_conversion

    HOUR = 3_600_000_000_000
    rows = (
        [(5 * HOUR + i, "view") for i in range(4)]
        + [(5 * HOUR + 10, "purchase")]
        + [(7 * HOUR, "purchase")]
        + [(8 * HOUR, "click")]  # ignored type
    )
    df = spark.createDataFrame(rows, "time long, event_type string")
    out = {r.hod: r for r in hourly_conversion(df).collect()}
    assert out[5].n_from == 4 and out[5].n_to == 1 and out[5].cvr == 0.25
    assert out[7].n_from == 0 and out[7].cvr is None
    assert 8 not in out


def test_repurchase_intervals_brute(spark):
    from datetime import date

    from btrdb_server_spark.operators.olap import repurchase_intervals

    rows = [
        (1, 10, date(2024, 1, 1)), (2, 10, date(2024, 1, 11)),
        (3, 10, date(2024, 2, 10)), (4, 20, date(2024, 1, 5)),
        (5, 20, date(2024, 1, 6)),
    ]
    df = spark.createDataFrame(rows, "o_orderkey long, o_custkey long, o_orderdate date")
    r = repurchase_intervals(df).collect()[0]
    gaps = sorted([10, 30, 1])
    assert r.n_gaps == 3
    assert r.p50_days == gaps[-((-50 * 3) // 100) - 1]
    assert r.p90_days == gaps[-((-90 * 3) // 100) - 1]
    assert r.mean_days == sum(gaps) / 3


def test_ship_delay_profile_shared_histogram_cell(spark):
    """The histogram median reads percentiles off cumulative day-cell
    counts; one repeated day value can cover SEVERAL percentile ranks
    (rank ∈ (cum - cnt, cum]) — here ranks r50 and r90 both land inside
    the d=5 cell, so p50 == p90 == 5 must come out of a single row."""
    from datetime import date, timedelta

    from btrdb_server_spark.operators.olap import ship_delay_profile

    base = date(2024, 1, 1)
    delays = [1] + [5] * 8 + [100]  # n=10: r50=rank5, r90=rank9 → both d=5
    od = spark.createDataFrame(
        [(i, base) for i in range(len(delays))],
        "o_orderkey long, o_orderdate date",
    )
    li = spark.createDataFrame(
        [(i, base + timedelta(days=d)) for i, d in enumerate(delays)],
        "l_orderkey long, l_shipdate date",
    )
    r = ship_delay_profile(li, od).collect()[0]
    sv = sorted(delays)
    n = len(sv)
    assert r.p50 == sv[-((-50 * n) // 100) - 1] == 5
    assert r.p90 == sv[-((-90 * n) // 100) - 1] == 5
    assert r.p99 == sv[-((-99 * n) // 100) - 1] == 100
    assert r.n_items == n and r.n_slow == 1 and r.slow_share == 0.1


def test_ship_delay_profile_brute(spark):
    from datetime import date, timedelta

    from btrdb_server_spark.operators.olap import ship_delay_profile

    base = date(2024, 1, 1)
    delays = [1, 5, 10, 30, 61, 90, 2, 3, 4, 7]
    od = spark.createDataFrame(
        [(i, base) for i in range(len(delays))],
        "o_orderkey long, o_orderdate date",
    )
    li = spark.createDataFrame(
        [(i, base + timedelta(days=d)) for i, d in enumerate(delays)],
        "l_orderkey long, l_shipdate date",
    )
    r = ship_delay_profile(li, od).collect()[0]
    sv = sorted(delays)
    n = len(sv)
    assert r.p50 == sv[-((-50 * n) // 100) - 1]
    assert r.p99 == sv[-((-99 * n) // 100) - 1]
    assert r.n_slow == 2 and r.slow_share == 0.2


def test_boilerplate_ngrams_planted_template(spark):
    from btrdb_server_spark.functions.dedup import boilerplate_ngrams

    docs = [(i, f"copyright acme corp unique{i} words here") for i in range(50)]
    docs += [(100 + i, f"totally different text {i} again") for i in range(5)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = boilerplate_ngrams(df, k=2, min_share=0.5, top=5).collect()
    tops = {r.shingle for r in out}
    assert "copyright acme" in tops and "acme corp" in tops
    byname = {r.shingle: r for r in out}
    assert byname["copyright acme"].df == 50
    assert abs(byname["copyright acme"].df_share - 50 / 55) < 1e-12
    assert all(r.df * 100 >= 55 * 50 for r in out)


def test_order_backlog_conservation(spark):
    """Backlog telescopes: eom backlog = cumulative opened - closed, and
    ends at zero once every order has shipped."""
    from datetime import date

    from btrdb_server_spark.operators.olap import order_backlog

    orders = spark.createDataFrame(
        [(1, date(2024, 1, 5)), (2, date(2024, 1, 20)), (3, date(2024, 2, 2))],
        "o_orderkey long, o_orderdate date",
    )
    li = spark.createDataFrame(
        [(1, date(2024, 1, 10)), (1, date(2024, 3, 1)),   # order 1 closes in March
         (2, date(2024, 1, 25)),                            # order 2 closes in Jan
         (3, date(2024, 2, 15))],
        "l_orderkey long, l_shipdate date",
    )
    out = {r.month: r for r in order_backlog(li, orders).collect()}
    assert out["2024-01"].n_opened == 2 and out["2024-01"].n_closed == 1
    assert out["2024-01"].backlog_eom == 1
    assert out["2024-02"].backlog_eom == 1  # order 3 opens and closes; 1 still open
    assert out["2024-03"].backlog_eom == 0


def test_lake_integrity_plants_orphans(spark):
    from btrdb_server_spark.operators.olap import lake_integrity

    li = spark.createDataFrame(
        [(1, 10, 100), (2, 11, 100), (99, 10, 100)],  # order 99 missing
        "l_orderkey long, l_partkey long, l_suppkey long",
    )
    od = spark.createDataFrame(
        [(1, 5), (2, 6), (3, 77)],  # cust 77 missing; order 3 has no lines
        "o_orderkey long, o_custkey long",
    )
    cu = spark.createDataFrame([(5,), (6,), (7,)], "c_custkey long")
    pa = spark.createDataFrame([(10,), (11,), (12,)], "p_partkey long")
    su = spark.createDataFrame([(100,), (200,)], "s_suppkey long")
    out = {r["check"]: r for r in lake_integrity(li, od, cu, pa, su).collect()}
    assert out["lineitem_orphan_order"].n_failing == 1
    assert out["order_orphan_customer"].n_failing == 1
    assert out["order_without_lines"].n_failing == 1
    assert out["part_never_sold"].n_failing == 1      # part 12
    assert out["supplier_never_used"].n_failing == 1  # supplier 200
    assert out["customer_without_orders"].n_failing == 1  # cust 7


def test_session_conversion_depth_curve(spark):
    from btrdb_server_spark.operators.events import session_conversion

    GAP = 1_800_000_000_000
    rows = []
    eid = 0
    # user 1: depth-3 session WITH purchase, later a depth-1 without
    for i, ty in enumerate(["view", "click", "purchase"]):
        rows.append((1, i * 1000, eid, ty)); eid += 1
    rows.append((1, 10 * GAP, eid, "view")); eid += 1
    # user 2: depth-3 session WITHOUT purchase
    for i, ty in enumerate(["view", "view", "click"]):
        rows.append((2, i * 1000, eid, ty)); eid += 1
    df = spark.createDataFrame(rows, "user_id long, time long, event_id long, event_type string")
    out = {r.depth: r for r in session_conversion(df).collect()}
    assert out[3].n_sessions == 2 and out[3].n_converted == 1 and out[3].cvr == 0.5
    assert out[1].n_sessions == 1 and out[1].n_converted == 0


def test_graph_summary_triangle_plus_isolate(spark):
    from btrdb_server_spark.functions.graph import graph_summary

    # orders: {1:(a,b)}, {2:(b,c)}, {3:(a,c)} -> triangle; part 99 isolated
    rows = [(1, 10), (1, 11), (2, 11), (2, 12), (3, 10), (3, 12), (4, 99)]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    r = graph_summary(df).collect()[0]
    assert (r.n_nodes, r.n_edges, r.max_degree, r.n_isolated) == (3, 3, 2, 1)
    assert r.density == 1.0 and r.avg_degree == 2.0


def test_source_profile_exact_median(spark):
    from btrdb_server_spark.functions.text import source_profile

    docs = [
        (1, "aa", "s1"), (2, "bbbb", "s1"), (3, "cccccc", "s1"),
        (4, "x y z", "s2"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    out = {r.source: r for r in source_profile(df).collect()}
    assert out["s1"].median_chars == 4  # middle of {2, 4, 6}
    assert out["s1"].mean_chars == 4.0
    assert out["s2"].mean_tokens == 3.0 and out["s2"].n_docs == 1


def test_bbit_minhash_bounds_and_identity(spark):
    """For an exact duplicate pair full est = 1 and bbit est = 1; bit
    agreement always >= full matches (equal components agree in bit)."""
    from btrdb_server_spark.functions.dedup import bbit_minhash_est

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [(1, base), (2, base), (3, base + " different tail entirely here")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {(r.a, r.b): r for r in bbit_minhash_est(df).collect()}
    dup = out[(1, 2)]
    assert dup.est_full == 1.0 and dup.est_bbit == 1.0
    for r in out.values():
        assert r.bit_agree >= r.matches
        assert -1.0 <= r.est_bbit <= 1.0
        assert 0.0 <= r.est_full <= 1.0


def test_dup_rate_by_source_keeper_rule(spark):
    from btrdb_server_spark.functions.dedup import dup_rate_by_source

    docs = [
        (1, "same text here", "crawlA"),
        (2, "same text here", "crawlB"),   # loses to doc 1
        (3, "unique alpha", "crawlB"),
        (4, "  SAME   text HERE ", "crawlB"),  # normalizes to dup too
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    out = {r.source: r for r in dup_rate_by_source(df).collect()}
    assert out["crawlA"].n_dups == 0
    assert out["crawlB"].n_dups == 2 and out["crawlB"].n_docs == 3
    assert out["crawlB"].dup_rate == 2 / 3


def test_kmv_daily_exact_below_k(spark):
    from btrdb_server_spark.functions.sketch import kmv_daily

    DAY = 86_400_000_000_000
    rows = [(i % 10, (i % 2) * DAY + i, "g") for i in range(200)]
    df = spark.createDataFrame(rows, "user_id long, time long, event_type string")
    out = kmv_daily(df, k=64, start=0, end=2 * DAY).collect()
    for r in out:
        assert r.n_exact <= 10
        assert r.kmv_est == float(r.n_exact)  # under k -> exact


def test_segment_spend_profile_exact(spark):
    from btrdb_server_spark.operators.olap import segment_spend_profile

    orders = spark.createDataFrame(
        [(i, i % 2, float(p)) for i, p in enumerate([10, 20, 30, 40, 50, 60])],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    cust = spark.createDataFrame(
        [(0, "A"), (1, "B")], "c_custkey long, c_mktsegment string"
    )
    out = {r.c_mktsegment: r for r in segment_spend_profile(orders, cust).collect()}
    assert out["A"].n_orders == 3 and out["A"].median_price == 30.0
    assert out["A"].mean_price == 30.0
    assert out["B"].median_price == 40.0  # {20,40,60} -> 40


def test_round_number_bias_planted(spark):
    from btrdb_server_spark.operators.tsshape import round_number_bias

    vals = [100, 200, 150, 137, 263, 300, 50]  # quanta
    df = _pts(spark, vals)
    r = round_number_bias(df, T0, T0 + len(vals) * W).collect()[0]
    assert r.n_whole == 3   # 100, 200, 300
    assert r.n_half == 2    # 150, 50
    assert r.whole_share == 3 / 7 and r.half_share == 2 / 7


def test_spend_trajectory_planted_slope(spark):
    from datetime import date, timedelta

    from btrdb_server_spark.operators.olap import spend_trajectory

    rows = []
    ok = 0
    # 5 customers, each 4 orders with price 100 + 25*(index-1): slope 2500c
    for c in range(5):
        for i in range(4):
            rows.append((ok, c, date(2024, 1, 1) + timedelta(days=i),
                         100.0 + 25.0 * i))
            ok += 1
    # one 2-order customer excluded by min_orders
    rows.append((ok, 99, date(2024, 1, 1), 5.0)); ok += 1
    rows.append((ok, 99, date(2024, 1, 2), 900.0))
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate date, o_totalprice double"
    )
    r = spend_trajectory(df).collect()[0]
    assert r.n_customers == 5 and r.n_orders == 20
    assert r.slope_cents_per_order == 2500.0
    assert r.mean_first_price == 100.0 and r.mean_last_price == 175.0


def test_basket_diversity_histogram(spark):
    from btrdb_server_spark.operators.olap import basket_diversity

    rows = [(1, 10), (1, 11), (1, 10), (2, 10), (3, 10), (3, 11), (3, 12)]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = {r.n_parts: r for r in basket_diversity(df).collect()}
    assert out[1].n_orders == 1 and out[2].n_orders == 1 and out[3].n_orders == 1
    assert abs(sum(r.share for r in out.values()) - 1.0) < 1e-12


def test_lexical_diversity_brute(spark):
    from collections import Counter

    from btrdb_server_spark.functions.text import lexical_diversity

    docs = [(1, "a b a c c d"), (2, "x x x"), (3, "")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in lexical_diversity(df).collect()}
    c = Counter("a b a c c d".split())
    assert out[1].n_tokens == 6 and out[1].n_types == 4
    assert out[1].hapax_share == sum(1 for v in c.values() if v == 1) / 4
    assert out[2].ttr == 1 / 3 and out[2].hapax_share == 0.0
    assert out[3].n_tokens == 0 and out[3].ttr is None


def test_delay_by_priority_exact(spark):
    from datetime import date, timedelta

    from btrdb_server_spark.operators.olap import delay_by_priority

    base = date(2024, 1, 1)
    orders = spark.createDataFrame(
        [(i, base, "1-URGENT" if i < 3 else "5-LOW") for i in range(6)],
        "o_orderkey long, o_orderdate date, o_orderpriority string",
    )
    delays = {0: 1, 1: 2, 2: 9, 3: 10, 4: 20, 5: 30}
    li = spark.createDataFrame(
        [(i, base + timedelta(days=d)) for i, d in delays.items()],
        "l_orderkey long, l_shipdate date",
    )
    out = {r.o_orderpriority: r for r in delay_by_priority(li, orders).collect()}
    assert out["1-URGENT"].median_days == 2 and out["1-URGENT"].mean_days == 4.0
    assert out["5-LOW"].median_days == 20 and out["5-LOW"].mean_days == 20.0


def test_activity_histogram_counts(spark):
    from btrdb_server_spark.operators.events import activity_histogram

    DAY = 86_400_000_000_000
    rows = [(1, 10), (1, 20), (1, DAY + 5), (2, 30)]
    df = spark.createDataFrame(rows, "user_id long, time long")
    out = {r.events_in_window: r for r in
           activity_histogram(df, start=0, end=2 * DAY).collect()}
    # user 1 day 0: k=2; user 1 day 1: k=1; user 2 day 0: k=1
    assert out[2].n_user_windows == 1 and out[1].n_user_windows == 2
    assert abs(out[1].share - 2 / 3) < 1e-15
