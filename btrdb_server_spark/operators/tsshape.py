"""Time-series shape operators over the integer bucket-sum spine: variance
ratio (random-walk test), permutation entropy (complexity), local-peak
detection, Savitzky-Golay smoothing, classical additive seasonal
decomposition, and the dominant-period (ACF argmax) probe.

All six share one scan shape: a map-side-combined groupBy collapses the
point-scale stream to integer bucket sums in value-quantum units, the
spine zero-fills empty buckets, and everything after runs on the
bucket-scale table (n = range/width rows per stream — bounded by the
REQUEST, not the data, so a 100 TB stream costs the same post-scan work
as a 1 GB one). Every emitted double is a single division (or a fixed
left-to-right IEEE expression) over exact int64/decimal integers, so
results are bit-identical in any engine at any parallelism — the same
exactness contract as operators/corr.py autocorr.

Reference parity note: the reference's closed aggregate set is
min/mean/max/count (qtree/qtree.go:802-808); these are extension
operators in the SURVEY §2.12 sense.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from btrdb_server_spark.operators.raw import time_range_pred


def _bucket_sums(
    points: DataFrame,
    start: int,
    end: int,
    width: int,
    value_quantum: float,
) -> tuple[DataFrame, int]:
    """(uuid, widx, s) with s the exact integer bucket sum in quantum
    units, zero-filled over the full [0, n) spine per stream present in
    the range. Returns (df, n)."""
    if width <= 0:
        raise ValueError("width must be positive")
    end = end - (end - start) % width
    n = (end - start) // width
    if n < 1:
        raise ValueError("empty range")
    sums = (
        points.where(time_range_pred(start, end))
        .select(
            "uuid",
            F.expr(f"(time - ({start})) div {width}").alias("widx"),
            F.round(F.col("value") / F.lit(value_quantum))
            .cast("long")
            .alias("vq"),
        )
        .groupBy("uuid", "widx")
        .agg(F.sum("vq").alias("s"))
    )
    spark = points.sparkSession
    spine = (
        sums.select("uuid")
        .distinct()
        .join(spark.range(0, n).select(F.col("id").alias("widx")))
    )
    filled = spine.join(sums, ["uuid", "widx"], "left").select(
        "uuid", "widx", F.coalesce(F.col("s"), F.lit(0)).alias("s")
    )
    return filled, n


def variance_ratio(
    points: DataFrame,
    start: int,
    end: int,
    width: int,
    qs: tuple[int, ...] = (2, 5, 10),
    value_quantum: float = 0.01,
) -> DataFrame:
    """Lo-MacKinlay variance-ratio statistic per stream and horizon:
    VR(q) = Var(q-bucket sums) / (q * Var(1-bucket sums)) over the
    zero-filled spine, with overlapping q-windows. VR ~ 1 for a random
    walk in the increments, < 1 for mean reversion, > 1 for trending.

    Exactness: with S/SS the spine sum and sum of squares (int64) and
    Sy/SSy the overlapping q-sum aggregates (decimal(38,0) — y^2 can
    pass int64), VR evaluates as

        ((ny*SSy - Sy^2) * n * n) / (q * (n*SS - S^2) * ny * ny)

    each factor an exact integer cast to double first — one fixed IEEE
    tree. Scale shape: q-sums come from a (q x offset) explode joined on
    the BUCKET-scale table, so the post-scan cost is O(sum(qs) * n) rows.
    Columns: uuid, q, vr, n_buckets."""
    if not qs or any(q < 2 for q in qs):
        raise ValueError("horizons must be >= 2")
    filled, n = _bucket_sums(points, start, end, width, value_quantum)
    if n <= max(qs):
        raise ValueError("range shorter than the largest horizon")
    filled = filled.localCheckpoint(eager=True)
    marg = filled.groupBy("uuid").agg(
        F.sum("s").alias("S"),
        F.sum(F.col("s") * F.col("s")).alias("SS"),
    )
    spark = points.sparkSession
    offs = spark.createDataFrame(
        [(int(q), int(j)) for q in qs for j in range(q)], "q long, j long"
    )
    y = (
        filled.join(offs)
        .select("uuid", "q", (F.col("widx") - F.col("j")).alias("t"), "s")
        .where((F.col("t") >= 0) & (F.col("t") <= F.lit(n) - F.col("q")))
        .groupBy("uuid", "q", "t")
        .agg(F.sum("s").alias("y"))
    )
    qagg = y.groupBy("uuid", "q").agg(
        F.sum(F.col("y").cast("decimal(38,0)")).alias("Sy"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("SSy"),
        F.count("*").alias("ny"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    num = (d("ny") * d("SSy") - d("Sy") * d("Sy")) * float(n) * float(n)
    den = d("q") * (float(n) * d("SS") - d("S") * d("S")) * d("ny") * d("ny")
    return (
        qagg.join(marg, "uuid")
        .select(
            "uuid",
            "q",
            F.when(den != 0, num / den).alias("vr"),
            F.lit(n).cast("long").alias("n_buckets"),
        )
        .orderBy("uuid", "q")
    )


def permutation_entropy(
    points: DataFrame,
    start: int,
    end: int,
    width: int,
    value_quantum: float = 0.01,
) -> DataFrame:
    """Order-3 permutation entropy per stream (Bandt-Pompe): classify
    every consecutive bucket-sum triple by its ordinal pattern (ties
    broken by time position, the standard convention) and report the
    Shannon entropy of the 6-pattern distribution plus its ln(6)-
    normalized form. Low = predictable shape, 1.0 = white noise.

    Exactness: pattern counts are integers; H folds the <= 6 terms in
    FIXED pattern-code order via F.aggregate over a sorted struct array,
    each term -(c/N)*ln(c/N) computed on exact integer ratios with the
    libm pandas_udf ln (JVM Math.log is 1-ulp off libm on some inputs —
    surfaced at sf0.001 — and the terms are <= 6 post-aggregate rows per
    stream, so the shim costs nothing). The fixed-order float fold
    pattern of events.py markov_entropy. Scale shape: one lead-window
    pass over the bucket-scale spine (bounded partitions: n rows per
    stream). Columns: uuid, n_triples, h, h_norm."""
    from btrdb_server_spark.utils import libm_ln

    # strict: inputs are c/N with c >= 1 (counts of OBSERVED patterns)
    _ln = libm_ln(strict=True)  # libm shim; raises on nonpositive

    filled, n = _bucket_sums(points, start, end, width, value_quantum)
    if n < 3:
        raise ValueError("need at least 3 buckets")
    w = Window.partitionBy("uuid").orderBy("widx")
    tri = (
        filled.withColumn("b", F.lead("s", 1).over(w))
        .withColumn("c", F.lead("s", 2).over(w))
        .where(F.col("c").isNotNull())
    )
    a, b, c = F.col("s"), F.col("b"), F.col("c")
    # rank of element i among the triple, ties to the earlier position:
    r0 = (b < a).cast("int") + (c < a).cast("int")
    r1 = (a <= b).cast("int") + (c < b).cast("int")
    r2 = (a <= c).cast("int") + (b <= c).cast("int")
    coded = tri.select("uuid", (r0 * 9 + r1 * 3 + r2).alias("code"))
    # ONE pass over the spine window: collapse to per-stream (N, sorted
    # (code,cnt) array) in a single groupBy, then explode the <= 6-element
    # post-aggregate array to feed the libm shim row-wise and re-collect —
    # the expensive lead-window pass is never referenced twice.
    counts = coded.groupBy("uuid", "code").agg(F.count("*").alias("cnt"))
    per0 = counts.groupBy("uuid").agg(
        F.sum("cnt").alias("N"),
        F.array_sort(F.collect_list(F.struct("code", "cnt"))).alias("cc0"),
    )
    ratio = F.col("x.cnt").cast("double") / F.col("N").cast("double")
    terms = per0.select(
        "uuid", "N", F.explode("cc0").alias("x")
    ).select(
        "uuid",
        "N",
        F.struct(F.col("x.code").alias("code"), (-ratio * _ln(ratio)).alias("term")).alias("ct"),
    )
    per = terms.groupBy("uuid").agg(
        F.max("N").alias("N"),
        F.array_sort(F.collect_list("ct")).alias("cc"),
    )
    h = F.expr("aggregate(cc, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.term)")
    return per.select(
        "uuid",
        F.col("N").alias("n_triples"),
        h.alias("h"),
        (h / F.lit(math.log(6.0))).alias("h_norm"),
    ).orderBy("uuid")


def peak_detect(
    points: DataFrame,
    start: int,
    end: int,
    width: int,
    min_delta: float = 0.0,
    value_quantum: float = 0.01,
) -> DataFrame:
    """Local-peak detection on the bucket-sum spine: interior buckets
    strictly above the previous bucket, at least as high as the next
    (plateaus credit their first bucket), clearing BOTH neighbors by
    `min_delta` (value units). All comparisons run on exact integer
    quanta — no float threshold. Columns: uuid, time, value,
    prominence_min (height above the higher neighbor, value units)."""
    filled, n = _bucket_sums(points, start, end, width, value_quantum)
    if n < 3:
        raise ValueError("need at least 3 buckets")
    dq = int(round(min_delta / value_quantum))
    q = round(1.0 / value_quantum)
    w = Window.partitionBy("uuid").orderBy("widx")
    lagged = (
        filled.withColumn("p", F.lag("s", 1).over(w))
        .withColumn("nx", F.lead("s", 1).over(w))
        .where(F.col("p").isNotNull() & F.col("nx").isNotNull())
    )
    gap = F.col("s") - F.greatest(F.col("p"), F.col("nx"))
    return (
        lagged.where(
            (F.col("s") > F.col("p")) & (F.col("s") >= F.col("nx")) & (gap >= dq)
        )
        .select(
            "uuid",
            (F.lit(start) + F.col("widx") * F.lit(width)).alias("time"),
            (F.col("s").cast("double") / F.lit(float(q))).alias("value"),
            (gap.cast("double") / F.lit(float(q))).alias("prominence_min"),
        )
        .orderBy("uuid", "time")
    )


# 5-point quadratic Savitzky-Golay convolution (Savitzky & Golay 1964).
_SG5 = (-3, 12, 17, 12, -3)
_SG5_DEN = 35


def savgol_smooth(
    points: DataFrame,
    start: int,
    end: int,
    width: int,
    value_quantum: float = 0.01,
) -> DataFrame:
    """5-point quadratic Savitzky-Golay smoothing of the bucket-sum
    spine: smooth_t = (-3 s_{t-2} + 12 s_{t-1} + 17 s_t + 12 s_{t+1}
    - 3 s_{t+2}) / 35 — the least-squares parabola value, preserving
    peak heights a moving average flattens. Interior buckets only.

    Exactness: the convolution numerator is exact int64; raw and smooth
    are each ONE division (by q and 35q). Scale shape: four lag/lead
    taps on the bucket-scale spine window. Columns: uuid, time, raw,
    smooth."""
    filled, n = _bucket_sums(points, start, end, width, value_quantum)
    if n < 5:
        raise ValueError("need at least 5 buckets")
    q = round(1.0 / value_quantum)
    w = Window.partitionBy("uuid").orderBy("widx")
    taps = (
        filled.withColumn("m2", F.lag("s", 2).over(w))
        .withColumn("m1", F.lag("s", 1).over(w))
        .withColumn("p1", F.lead("s", 1).over(w))
        .withColumn("p2", F.lead("s", 2).over(w))
        .where(F.col("m2").isNotNull() & F.col("p2").isNotNull())
    )
    num = (
        F.lit(_SG5[0]) * F.col("m2")
        + F.lit(_SG5[1]) * F.col("m1")
        + F.lit(_SG5[2]) * F.col("s")
        + F.lit(_SG5[3]) * F.col("p1")
        + F.lit(_SG5[4]) * F.col("p2")
    )
    return taps.select(
        "uuid",
        (F.lit(start) + F.col("widx") * F.lit(width)).alias("time"),
        (F.col("s").cast("double") / F.lit(float(q))).alias("raw"),
        (num.cast("double") / F.lit(float(_SG5_DEN * q))).alias("smooth"),
    ).orderBy("uuid", "time")


def seasonal_decompose(
    points: DataFrame,
    start: int,
    end: int,
    width: int,
    period: int = 24,
    value_quantum: float = 0.01,
) -> DataFrame:
    """Classical additive seasonal decomposition of the bucket-sum spine
    (the moving-average method of STL's ancestor): trend = centered
    2x(period)-MA, seasonal = per-phase mean of the detrended series,
    residual = the rest. Even period handled with the standard
    half-weight endpoints.

    Exactness: trend numerator tnum_t = s_{t-p/2} + 2*sum_{|j|<p/2}
    s_{t+j} + s_{t+p/2} (int64) over denominator 2p; detrended_t =
    (2p*s_t - tnum_t)/2p keeps the SAME integer denominator, so the
    per-phase seasonal mean is sum(dnum)/(2p*c) and the residual
    (c*dnum - Sphase)/(2p*c) — every emitted double is one division of
    exact int64 products. Scale shape: one rangeBetween window sum plus
    two endpoint taps on the bucket-scale spine, then a phase-scale
    broadcast join. Columns: uuid, time, x, trend, seasonal, residual."""
    if period < 2 or period % 2 != 0:
        raise ValueError("period must be even and >= 2")
    filled, n = _bucket_sums(points, start, end, width, value_quantum)
    half = period // 2
    if n < period + 1:
        raise ValueError("range shorter than one period plus one bucket")
    q = round(1.0 / value_quantum)
    w = Window.partitionBy("uuid").orderBy("widx")
    wr = w.rowsBetween(-half, half)
    t = (
        filled.withColumn("full", F.sum("s").over(wr))
        .withColumn("lo", F.lag("s", half).over(w))
        .withColumn("hi", F.lead("s", half).over(w))
        .where(F.col("lo").isNotNull() & F.col("hi").isNotNull())
        .select(
            "uuid",
            "widx",
            "s",
            (F.lit(2) * F.col("full") - F.col("lo") - F.col("hi")).alias(
                "tnum"
            ),
            (F.col("widx") % F.lit(period)).alias("phase"),
        )
        .withColumn("dnum", F.lit(2 * period) * F.col("s") - F.col("tnum"))
    )
    t = t.localCheckpoint(eager=True)
    seas = t.groupBy("uuid", "phase").agg(
        F.sum("dnum").alias("Sphase"), F.count("*").alias("cphase")
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    den = float(2 * period)
    return (
        t.join(F.broadcast(seas), ["uuid", "phase"])
        .select(
            "uuid",
            (F.lit(start) + F.col("widx") * F.lit(width)).alias("time"),
            (d("s") / F.lit(float(q))).alias("x"),
            (d("tnum") / F.lit(den * q)).alias("trend"),
            (d("Sphase") / (F.lit(den * q) * d("cphase"))).alias("seasonal"),
            (
                (d("cphase") * d("dnum") - d("Sphase"))
                / (F.lit(den * q) * d("cphase"))
            ).alias("residual"),
        )
        .orderBy("uuid", "time")
    )


def dominant_period(
    points: DataFrame,
    start: int,
    end: int,
    width: int,
    min_lag: int = 2,
    max_lag: int = 48,
    value_quantum: float = 0.01,
) -> DataFrame:
    """Dominant period per stream: the lag in [min_lag, max_lag] whose
    Box-Jenkins ACF over the zero-filled bucket-sum spine is highest —
    the integer-exact seasonality detector (a diurnal stream at hour
    buckets answers 24).

    Exactness: the lag-independent ACF denominator cancels in the
    argmax, and the n^2-scaled numerator n^2*Sxy - n*S*(Sh+St) +
    (n-L)*S^2 is computed in decimal(38,0) — the argmax compares EXACT
    integers (smaller lag wins ties), so the winning lag is engine- and
    order-independent; the reported acf is then the usual fixed IEEE
    expression on int64 components. Scale shape: identical to
    operators/corr.py autocorr (one scan, then O(lags * buckets) on the
    bucket table). Columns: uuid, best_lag, acf, n_buckets."""
    if not 1 <= min_lag <= max_lag:
        raise ValueError("need 1 <= min_lag <= max_lag")
    if width <= 0:
        raise ValueError("width must be positive")
    end = end - (end - start) % width
    n = (end - start) // width
    if n < 1:
        raise ValueError("empty range")
    if n <= max_lag:
        raise ValueError("range shorter than the largest lag")
    # One zero-filled bucket array per stream replaces the _bucket_sums
    # spine + per-lag joins (guide §2.4): the old plan cross-joined the
    # lag table against BOTH a copy of the spine and a (lag-shifted)
    # self-join of it, then joined three per-lag branches back together —
    # 30 Exchanges of label-scale rows. The array form computes the same
    # exact int64 sums (Sxy over pairs (t, t+L) = zip of a[0..n-L-1] with
    # a[L..n-1]; Sh = sum a[0..n-L-1]; St = sum a[L..n-1]; S/SS over the
    # full array — integer addition is order-free) with ONE aggregation
    # exchange, and the lag explode + argmax stay on the uuid
    # partitioning. O(lags * n) work per stream, same as before.
    sums = (
        points.where(time_range_pred(start, end))
        .select(
            "uuid",
            F.expr(f"(time - ({start})) div {width}").alias("widx"),
            F.round(F.col("value") / F.lit(value_quantum))
            .cast("long")
            .alias("vq"),
        )
        .groupBy("uuid", "widx")
        .agg(F.sum("vq").alias("s"))
    )
    arr = (
        sums.groupBy("uuid")
        .agg(
            F.map_from_entries(F.collect_list(F.struct("widx", "s"))).alias("m")
        )
        .select(
            "uuid",
            F.expr(
                f"transform(sequence(0L, {n - 1}L),"
                " i -> coalesce(try_element_at(m, i), 0L))"
            ).alias("a"),
        )
    )
    agg_sum = lambda e: f"aggregate({e}, 0L, (acc, x) -> acc + x)"  # noqa: E731
    per_lag = (
        arr.select(
            "uuid",
            "a",
            F.expr(agg_sum("a")).alias("S"),
            F.expr("aggregate(a, 0L, (acc, x) -> acc + x * x)").alias("SS"),
            F.explode(
                F.sequence(F.lit(min_lag).cast("long"), F.lit(max_lag).cast("long"))
            ).alias("lag"),
        )
        .select(
            "uuid",
            "lag",
            "S",
            "SS",
            F.expr(
                "aggregate(zip_with("
                f"slice(a, 1, {n} - lag), slice(a, lag + 1, {n} - lag),"
                " (x, y) -> x * y), 0L, (acc, x) -> acc + x)"
            ).alias("Sxy"),
            F.expr(agg_sum(f"slice(a, 1, {n} - lag)")).alias("Sh"),
            F.expr(agg_sum(f"slice(a, lag + 1, {n} - lag)")).alias("St"),
        )
    )
    dec = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("decimal(38,0)")  # noqa: E731
    d = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("double")  # noqa: E731
    per_lag = (
        per_lag.select(
            "uuid",
            "lag",
            (
                F.lit(n) * F.lit(n) * dec("Sxy")
                - F.lit(n) * dec("S") * (dec("Sh") + dec("St"))
                + (F.lit(n) - F.col("lag")) * dec("S") * dec("S")
            ).alias("num_exact"),
            (
                F.lit(float(n)) * F.lit(float(n)) * d("Sxy")
                - F.lit(float(n)) * d("S") * (d("Sh") + d("St"))
                + (F.lit(float(n)) - F.col("lag").cast("double"))
                * d("S")
                * d("S")
            ).alias("num_dbl"),
            (
                F.lit(float(n)) * F.lit(float(n)) * d("SS")
                - F.lit(float(n)) * d("S") * d("S")
            ).alias("den_dbl"),
        )
    )
    # The argmax carries num_dbl/den_dbl along in the max struct instead
    # of joining the winner back onto per_lag: (num_exact, neg_lag) is
    # unique per (uuid, lag) — lag is unique — so the trailing fields
    # never participate in the comparison and the winning row is the
    # same one the old self-join fetched.
    pick = per_lag.groupBy("uuid").agg(
        F.max(
            F.struct(
                F.col("num_exact"),
                (-F.col("lag")).alias("neg_lag"),
                F.col("num_dbl"),
                F.col("den_dbl"),
            )
        ).alias("best")
    )
    return pick.select(
        "uuid",
        (-F.col("best.neg_lag")).alias("best_lag"),
        F.when(
            F.col("best.den_dbl") != 0, F.col("best.num_dbl") / F.col("best.den_dbl")
        ).alias("acf"),
        F.lit(n).cast("long").alias("n_buckets"),
    ).orderBy("uuid")


def runs_test(
    points: DataFrame,
    start: int,
    end: int,
    width: int,
    value_quantum: float = 0.01,
) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness per stream: bucket sums
    are classified above/below the stream MEDIAN (exact lower-median
    order statistic; equals-median buckets dropped, the standard
    convention), R counts the sign runs, and the z-statistic compares R
    to its null mean 2*n1*n2/(n1+n2) + 1. |z| >> 0 flags trending
    (too few runs) or oscillation (too many).

    Exactness: the median is an integer order statistic; n1, n2, R are
    integers; E[R] and Var[R] are the textbook rationals evaluated in
    ONE fixed IEEE tree on exact int64 casts. Scale shape: one rank
    window for the median, one lag pass for runs — all bucket-scale.
    Columns: uuid, n1, n2, runs, z."""
    filled, n = _bucket_sums(points, start, end, width, value_quantum)
    if n < 4:
        raise ValueError("need at least 4 buckets")
    w = Window.partitionBy("uuid").orderBy("s", "widx")
    ranked = filled.withColumn("rn", F.row_number().over(w))
    med = ranked.where(F.col("rn") == (n + 1) // 2).select(
        "uuid", F.col("s").alias("med")
    )
    signed = (
        filled.join(F.broadcast(med), "uuid")
        .where(F.col("s") != F.col("med"))
        .select("uuid", "widx", (F.col("s") > F.col("med")).cast("int").alias("up"))
    )
    wo = Window.partitionBy("uuid").orderBy("widx")
    runs = (
        signed.withColumn("prev", F.lag("up").over(wo))
        .select(
            "uuid",
            "up",
            (F.col("prev").isNull() | (F.col("up") != F.col("prev")))
            .cast("long")
            .alias("new_run"),
        )
        .groupBy("uuid")
        .agg(
            F.sum("up").alias("n1"),
            F.sum(F.lit(1) - F.col("up")).alias("n2"),
            F.sum("new_run").alias("runs"),
        )
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    nn = d("n1") + d("n2")
    two = F.lit(2.0) * d("n1") * d("n2")
    mu = two / nn + F.lit(1.0)
    var = (two * (two - nn)) / (nn * nn * (nn - F.lit(1.0)))
    return runs.select(
        "uuid",
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        "runs",
        F.when(
            (F.col("n1") > 0) & (F.col("n2") > 0) & (var > 0),
            (d("runs") - mu) / F.sqrt(var),
        ).alias("z"),
    ).orderBy("uuid")


def hist_quantiles(
    points: DataFrame,
    start: int,
    end: int,
    bins: int = 64,
    ps: tuple[int, ...] = (50, 90, 99),
    value_quantum: float = 0.01,
) -> DataFrame:
    """Histogram-sketch quantile estimation per stream, audited against
    the exact order statistic on the same row — the mergeable
    fixed-size alternative to sorting 100 TB: a `bins`-cell equi-width
    histogram is a groupBy away (and unions by cell-wise ADD), the
    p-quantile is read off the cumulative counts with linear
    interpolation inside the target cell.

    Exactness: cell index (vq - lo) * bins div (hi - lo + 1) is all
    int64; the interpolated estimate
    cell_lo + (rank - cum_before) / cell_cnt * cell_width evaluates as
    one fixed IEEE tree over exact integers; the exact quantile is the
    type-1 order statistic at rank ceil(p*n/100) (a rank window, exact).
    Columns: uuid, p, est, exact, err (value units)."""
    if bins < 2 or not ps or any(not 0 < p <= 100 for p in ps):
        raise ValueError("need bins >= 2 and percentiles in (0, 100]")
    q = round(1.0 / value_quantum)
    vq = F.round(F.col("value") / F.lit(value_quantum)).cast("long")
    src = (
        points.where(time_range_pred(start, end))
        .select("uuid", vq.alias("vq"))
        .localCheckpoint(eager=False)
    )
    rng = src.groupBy("uuid").agg(
        F.min("vq").alias("lo"),
        F.max("vq").alias("hi"),
        F.count("*").alias("n"),
    )
    binned = (
        src.join(F.broadcast(rng), "uuid")
        .select(
            "uuid",
            F.expr(
                f"((vq - lo) * CAST({bins} AS BIGINT)) div (hi - lo + 1)"
            ).alias("b"),
        )
        .groupBy("uuid", "b")
        .agg(F.count("*").alias("cnt"))
    )
    wcum = Window.partitionBy("uuid").orderBy("b")
    cum = binned.withColumn(
        "cum_before", F.coalesce(F.sum("cnt").over(wcum) - F.col("cnt"), F.lit(0))
    )
    spark = points.sparkSession
    pdf = spark.createDataFrame([(int(p),) for p in ps], "p long")
    # rank = ceil(p*n/100) in integers
    withrank = pdf.join(rng).select(
        "uuid", "p", "lo", "hi", "n",
        F.expr("(p * n + 99) div 100").alias("rank"),
    )
    cell = (
        withrank.join(cum, "uuid")
        .where(
            (F.col("cum_before") < F.col("rank"))
            & (F.col("rank") <= F.col("cum_before") + F.col("cnt"))
        )
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    width = (d("hi") - d("lo") + F.lit(1.0)) / F.lit(float(bins))
    cell_lo = d("lo") + d("b") * width
    est = (
        cell_lo
        + (d("rank") - d("cum_before")) / d("cnt") * width
    ) / F.lit(float(q))
    # exact type-1 order statistic (the audit side)
    wrank = Window.partitionBy("uuid").orderBy("vq")
    ranked = src.withColumn("rn", F.row_number().over(wrank))
    exact_df = (
        ranked.join(
            withrank.select("uuid", "p", "rank"),
            ["uuid"],
        )
        .where(F.col("rn") == F.col("rank"))
        .select("uuid", "p", (F.col("vq").cast("double") / F.lit(float(q))).alias("exact"))
    )
    return (
        cell.select("uuid", "p", est.alias("est"))
        .join(exact_df, ["uuid", "p"])
        .select("uuid", "p", "est", "exact", (F.col("est") - F.col("exact")).alias("err"))
        .orderBy("uuid", "p")
    )


def tail_index(
    points: DataFrame,
    start: int,
    end: int,
    k: int = 100,
    value_quantum: float = 0.01,
) -> DataFrame:
    """Hill estimator of the tail index per stream: over the k largest
    positive values, alpha = k / sum_i ln(x_(i) / x_(k+1)) — the
    heavy-tail diagnostic that says whether extremes are power-law
    (alpha small, variance may not exist) or thin-tailed. Pairs with
    the Zipf/Gini/burstiness family.

    Exactness: order statistics on integer quanta (deterministic rank,
    value-then-nothing ties are identical values); each term is libm ln
    of a ratio of exact integers (quantum cancels) via the pandas UDF —
    JVM Math.log is 1-ulp off libm (the hurst_exponent/zipf_fit note) —
    and the sum folds in ASCENDING rank order via F.aggregate over a
    sorted array, a fixed float fold. Scale shape: the k+1 largest per
    stream come from a WindowGroupLimit rank prune (per-partition
    heaps, k+1 rows per stream on the exchange); the UDF and fold touch
    k rows per stream. Columns: uuid, k, x_kplus1, alpha."""
    if k < 2:
        raise ValueError("need k >= 2")
    from btrdb_server_spark.utils import libm_ln

    # strict: inputs are vq/xk1 with vq >= xk1 >= 1 (descending ranks)
    _ln = libm_ln(strict=True)  # libm shim; raises on nonpositive

    vq = F.round(F.col("value") / F.lit(value_quantum)).cast("long")
    src = (
        points.where(time_range_pred(start, end))
        .select("uuid", vq.alias("vq"))
        .where(F.col("vq") > 0)
    )
    w = Window.partitionBy("uuid").orderBy(F.col("vq").desc())
    top = src.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= k + 1
    )
    xk = top.where(F.col("rn") == k + 1).select(
        "uuid", F.col("vq").alias("xk1")
    )
    terms = (
        top.where(F.col("rn") <= k)
        .join(F.broadcast(xk), "uuid")
        .select(
            "uuid",
            "rn",
            "xk1",
            _ln(F.col("vq").cast("double") / F.col("xk1").cast("double")).alias(
                "t"
            ),
        )
    )
    per = terms.groupBy("uuid").agg(
        F.array_sort(F.collect_list(F.struct("rn", "t"))).alias("tops"),
        F.count("*").alias("got"),
        F.min("xk1").alias("xk1"),
    )
    logsum = F.expr(
        "aggregate(tops, CAST(0.0 AS DOUBLE), (acc, e) -> acc + e.t)"
    )
    q = round(1.0 / value_quantum)
    return (
        per.where(F.col("got") == k)
        .select(
            "uuid",
            F.lit(k).cast("long").alias("k"),
            (F.col("xk1").cast("double") / F.lit(float(q))).alias("x_kplus1"),
            F.when(logsum > 0, F.lit(float(k)) / logsum).alias("alpha"),
        )
        .orderBy("uuid")
    )


def group_sample(
    points: DataFrame,
    start: int,
    end: int,
    k: int = 20,
    value_quantum: float = 0.01,
) -> DataFrame:
    """Deterministic per-stream preview sample: the k points whose
    salted md5 rank is smallest WITHIN each stream — the "show me a
    fair sample of every stream" query, stable across runs, engines
    and partitionings (unlike TABLESAMPLE). Rank key is
    md5('gs:' || uuid || ':' || time) with (hash, time) tiebreak.

    Scale shape: one rank-window prune that rewrites to
    WindowGroupLimit — per-partition top-k heaps BEFORE the exchange,
    so the shuffle carries streams x k rows, never the scan. Columns:
    uuid, time, value, rk."""
    if k < 1:
        raise ValueError("need k >= 1")
    rk = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("gs:"),
                    F.col("uuid"),
                    F.lit(":"),
                    F.col("time").cast("string"),
                )
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    src = points.where(time_range_pred(start, end)).select(
        "uuid", "time", "value", rk.alias("rk")
    )
    w = Window.partitionBy("uuid").orderBy("rk", "time")
    return (
        src.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("uuid", "time", "value", "rk")
        .orderBy("uuid", "rk", "time")
    )


def error_budget(
    events: DataFrame,
    budget_ppm: int = 150_000,
    time_col: str = "time",
    type_col: str = "event_type",
    error_type: str = "error",
    width: int = 86_400_000_000_000,
    start: int | None = None,
    end: int | None = None,
) -> DataFrame:
    """SLO error-budget burn per window: error share of all events vs an
    allowance of `budget_ppm` parts-per-million, plus the cumulative
    burn fraction of the period's total budget — the SRE dashboard row.
    burn_rate = (errors * 1e6) / (events * budget_ppm): > 1 means this
    window alone overspends its pro-rata budget.

    Exactness: counts are integers; error share, burn rate and the
    cumulative budget fraction are each ONE division of exact int64
    products. Scale shape: one map-side-combined groupBy to window
    counts, one window-scale cumulative. Columns: time, events, errors,
    error_share, burn_rate, cum_budget_used."""
    if budget_ppm <= 0 or width <= 0:
        raise ValueError("budget_ppm and width must be positive")
    t = F.col(time_col)
    src = events
    if start is not None:
        src = src.where(t >= start)
    if end is not None:
        src = src.where(t < end)
    origin = start if start is not None else 0
    per = (
        src.select(
            F.expr(f"({time_col} - ({origin})) div {width}").alias("widx"),
            (F.col(type_col) == error_type).cast("long").alias("is_err"),
        )
        .groupBy("widx")
        .agg(F.count("*").alias("events"), F.sum("is_err").alias("errors"))
    )
    wc = Window.orderBy("widx")
    cum = per.select(
        "widx",
        "events",
        "errors",
        F.sum("errors").over(wc).alias("cum_err"),
        F.sum("events").over(wc).alias("cum_ev"),
    )
    tot = per.agg(F.sum("events").alias("tot_ev"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return (
        cum.join(F.broadcast(tot))
        .select(
            (F.lit(origin) + F.col("widx") * F.lit(width)).alias("time"),
            "events",
            "errors",
            (d("errors") / d("events")).alias("error_share"),
            (
                (F.col("errors") * F.lit(1_000_000)).cast("double")
                / (F.col("events") * F.lit(budget_ppm)).cast("double")
            ).alias("burn_rate"),
            (
                (F.col("cum_err") * F.lit(1_000_000)).cast("double")
                / (F.col("tot_ev") * F.lit(budget_ppm)).cast("double")
            ).alias("cum_budget_used"),
        )
        .orderBy("time")
    )


def incident_report(
    points: DataFrame,
    start: int,
    end: int,
    width: int,
    z_threshold: float = 2.0,
    value_quantum: float = 0.01,
) -> DataFrame:
    """Anomalous buckets grouped into INCIDENTS: a bucket is anomalous
    when its sum deviates from the stream's spine mean by more than
    `z_threshold` population sigmas (the z-test on exact integer spine
    moments — (n*s - S) / sqrt(n*SS - S^2)), and consecutive
    anomalous buckets coalesce into one incident row (the classic
    gap-and-islands pass) — pages per INCIDENT, not per bucket.

    Exactness: the z comparison is a fixed IEEE tree on exact int64
    moments; island grouping is integer arithmetic. Scale shape: one
    point-scale groupBy to the spine, moments broadcast back, one
    bucket-scale lag window. Columns: uuid, incident_start,
    incident_end, n_buckets, peak_z."""
    filled, n = _bucket_sums(points, start, end, width, value_quantum)
    # NB: Spark resolution is case-insensitive — the moment columns must
    # not collide with the spine's lowercase `s`.
    marg = filled.groupBy("uuid").agg(
        F.sum("s").alias("m_sum"),
        F.sum(F.col("s") * F.col("s")).alias("m_sq"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    nn = float(n)
    z = (nn * d("s") - d("m_sum")) / F.sqrt(
        nn * d("m_sq") - d("m_sum") * d("m_sum")
    )
    flagged = (
        filled.join(F.broadcast(marg), "uuid")
        .select("uuid", "widx", z.alias("z"))
        .where(
            (F.col("z") > F.lit(z_threshold))
            | (F.col("z") < F.lit(-z_threshold))
        )
    )
    w = Window.partitionBy("uuid").orderBy("widx")
    runs = flagged.withColumn(
        "new_run",
        (
            F.coalesce(F.col("widx") - F.lag("widx").over(w), F.lit(2)) > 1
        ).cast("long"),
    ).withColumn("run_id", F.sum("new_run").over(w))
    return (
        runs.groupBy("uuid", "run_id")
        .agg(
            F.min("widx").alias("w0"),
            F.max("widx").alias("w1"),
            F.count("*").alias("n_buckets"),
            F.max(F.abs(F.col("z"))).alias("peak_z"),
        )
        .select(
            "uuid",
            (F.lit(start) + F.col("w0") * F.lit(width)).alias("incident_start"),
            (F.lit(start) + (F.col("w1") + 1) * F.lit(width)).alias(
                "incident_end"
            ),
            "n_buckets",
            "peak_z",
        )
        .orderBy("uuid", "incident_start")
    )


def top_movers(
    points: DataFrame,
    start: int,
    end: int,
    width: int,
    k: int = 10,
    value_quantum: float = 0.01,
) -> DataFrame:
    """Biggest bucket-over-bucket moves across ALL streams: rank every
    (stream, bucket) by |delta| of consecutive spine sums and keep the
    top k — the "what changed the most overnight" screen. Integer
    deltas, integer rank (|delta| desc, uuid/time asc tiebreak), one
    division per emitted double. Scale shape: bucket-scale lag window
    per stream, then TakeOrderedAndProject. Columns: uuid, time, value,
    prev_value, delta."""
    if k < 1:
        raise ValueError("need k >= 1")
    filled, n = _bucket_sums(points, start, end, width, value_quantum)
    q = round(1.0 / value_quantum)
    w = Window.partitionBy("uuid").orderBy("widx")
    lagged = (
        filled.withColumn("p", F.lag("s").over(w))
        .where(F.col("p").isNotNull())
        .withColumn("delta", F.col("s") - F.col("p"))
    )
    return (
        lagged.orderBy(
            F.abs(F.col("delta")).desc(), "uuid", "widx"
        )
        .limit(k)
        .select(
            "uuid",
            (F.lit(start) + F.col("widx") * F.lit(width)).alias("time"),
            (F.col("s").cast("double") / F.lit(float(q))).alias("value"),
            (F.col("p").cast("double") / F.lit(float(q))).alias("prev_value"),
            (F.col("delta").cast("double") / F.lit(float(q))).alias("delta"),
        )
    )


# N(0,1) quartile breakpoints, 4-letter SAX alphabet (Lin et al. 2003) —
# same literals as operators/stat.py sax_symbols.
_SAXB = (-0.6744897501960817, 0.0, 0.6744897501960817)


def sax_motifs(
    points: DataFrame,
    start: int,
    end: int,
    width: int,
    word: int = 4,
    k: int = 20,
    value_quantum: float = 0.01,
) -> DataFrame:
    """Symbolic motif mining across ALL streams: PAA bucket means
    z-normalized PER STREAM, discretized to the 4-letter SAX alphabet
    (identical arithmetic to operators/stat.py sax_symbols), then every
    sliding `word`-symbol window counted — the recurring-shape detector
    ("which 4-day pattern keeps happening?"). Top `k` by count desc,
    (word, uuid) asc — deterministic.

    Exactness: bucket sums/counts and per-stream moments are exact
    int64; z and the breakpoint compares are one fixed IEEE tree (the
    sax_symbols contract); word counts are integers. Empty buckets
    break words (the A2 hole contract). Scale shape: one point-scale
    groupBy, per-stream moments broadcast back, word-1 lead taps on the
    bucket-scale spine, one map-side-combined count. Columns: uuid,
    motif, cnt."""
    if word < 2 or k < 1:
        raise ValueError("need word >= 2 and k >= 1")
    if width <= 0:
        raise ValueError("width must be positive")
    end = end - (end - start) % width
    nb = (end - start) // width
    if nb < word:
        raise ValueError("range shorter than one word")
    src = points.where(time_range_pred(start, end)).select(
        "uuid",
        F.expr(f"(time - ({start})) div {width}").alias("widx"),
        F.round(F.col("value") / F.lit(value_quantum)).cast("long").alias("q"),
    )
    wagg = src.groupBy("uuid", "widx").agg(
        F.sum("q").alias("sw"), F.count("*").alias("nw")
    )
    gl = src.groupBy("uuid").agg(
        F.count("*").alias("n"),
        F.sum("q").alias("sq"),
        F.sum(F.col("q") * F.col("q")).alias("sqq"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    sigma_q = F.sqrt(
        (d("n") * d("sqq") - d("sq") * d("sq")).cast("double")
    ) / d("n")
    z = (d("sw") / d("nw") - d("sq") / d("n")) / sigma_q
    b1, b2, b3 = (F.lit(b) for b in _SAXB)
    sym = (
        F.when(z < b1, "a").when(z < b2, "b").when(z < b3, "c").otherwise("d")
    )
    spark = points.sparkSession
    spine = (
        wagg.select("uuid")
        .distinct()
        .join(spark.range(0, nb).select(F.col("id").alias("widx")))
    )
    symbols = (
        spine.join(wagg, ["uuid", "widx"], "left")
        .join(F.broadcast(gl), "uuid")
        .select(
            "uuid",
            "widx",
            F.when(F.col("nw").isNotNull(), sym).alias("sym"),
        )
    )
    w = Window.partitionBy("uuid").orderBy("widx")
    cols = [F.col("sym")]
    df = symbols
    for j in range(1, word):
        df = df.withColumn(f"s{j}", F.lead("sym", j).over(w))
        cols.append(F.col(f"s{j}"))
    full = df
    for j in range(1, word):
        full = full.where(F.col(f"s{j}").isNotNull())
    full = full.where(F.col("sym").isNotNull())
    return (
        full.select("uuid", F.concat_ws("", *cols).alias("motif"))
        .groupBy("uuid", "motif")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "motif", "uuid")
        .limit(k)
    )


def hour_dow_heatmap(
    points: DataFrame,
    start: int,
    end: int,
    value_quantum: float = 0.01,
) -> DataFrame:
    """Hour-of-day x day-of-week utilization heatmap per stream: count
    and exact mean per cell — the two-dimensional extension of the
    diurnal profile (stat.py diurnal_profile) that separates "3am on
    Sunday" from "3am on Tuesday". Epoch day 0 (1970-01-01) was a
    Thursday, so dow = (epoch_days + 4) % 7 with 0 = Sunday.

    Integer cell sums in quantum units; the mean is ONE division. Scale
    shape: one map-side-combined groupBy over a 168-cell-per-stream
    domain. Columns: uuid, dow, hod, n, mean."""
    q = round(1.0 / value_quantum)
    src = points.where(time_range_pred(start, end)).select(
        "uuid",
        F.expr("((time div 86400000000000) + 4) % 7").alias("dow"),
        F.expr("(time div 3600000000000) % 24").alias("hod"),
        F.round(F.col("value") / F.lit(value_quantum)).cast("long").alias("vq"),
    )
    return (
        src.groupBy("uuid", "dow", "hod")
        .agg(F.count("*").alias("n"), F.sum("vq").alias("s"))
        .select(
            "uuid",
            "dow",
            "hod",
            "n",
            (
                F.col("s").cast("double")
                / (F.col("n").cast("double") * F.lit(float(q)))
            ).alias("mean"),
        )
        .orderBy("uuid", "dow", "hod")
    )


def var_cvar(
    points: DataFrame,
    start: int,
    end: int,
    width: int,
    alpha_pct: int = 5,
    value_quantum: float = 0.01,
) -> DataFrame:
    """Value-at-Risk and Conditional VaR of bucket-over-bucket changes
    per stream: VaR = the alpha-percentile worst delta (exact type-1
    order statistic over the integer delta series), CVaR = the exact
    mean of the deltas at or below VaR — the loss-tail summary, shaped
    for telemetry drops as much as for P&L.

    Exactness: deltas are int64; the VaR rank is ceil(alpha*n/100) via
    the (a + b - 1) div b identity; CVaR is ONE division of exact
    integers. Scale shape: one bucket-scale lag, one rank window over
    the (request-bounded) delta series, one conditional aggregate.
    Columns: uuid, n_deltas, var, cvar, n_tail."""
    if not 0 < alpha_pct < 100:
        raise ValueError("alpha_pct in (0, 100)")
    filled, n = _bucket_sums(points, start, end, width, value_quantum)
    if n < 3:
        raise ValueError("need at least 3 buckets")
    q = round(1.0 / value_quantum)
    w = Window.partitionBy("uuid").orderBy("widx")
    deltas = (
        filled.withColumn("p", F.lag("s").over(w))
        .where(F.col("p").isNotNull())
        .select("uuid", (F.col("s") - F.col("p")).alias("d"))
    )
    wr = Window.partitionBy("uuid").orderBy("d")
    ranked = deltas.withColumn("rn", F.row_number().over(wr))
    nn = deltas.groupBy("uuid").agg(F.count("*").alias("nd"))
    var_row = (
        ranked.join(F.broadcast(nn), "uuid")
        .where(
            F.col("rn") == F.expr(f"({alpha_pct} * nd + 99) div 100")
        )
        .select("uuid", F.col("d").alias("var_q"))
    )
    tail = (
        deltas.join(F.broadcast(var_row), "uuid")
        .where(F.col("d") <= F.col("var_q"))
        .groupBy("uuid")
        .agg(F.sum("d").alias("tail_sum"), F.count("*").alias("n_tail"))
    )
    return (
        nn.join(var_row, "uuid")
        .join(tail, "uuid")
        .select(
            "uuid",
            F.col("nd").alias("n_deltas"),
            (F.col("var_q").cast("double") / F.lit(float(q))).alias("var"),
            (
                F.col("tail_sum").cast("double")
                / (F.col("n_tail").cast("double") * F.lit(float(q)))
            ).alias("cvar"),
            "n_tail",
        )
        .orderBy("uuid")
    )


def weekend_effect(
    points: DataFrame,
    start: int,
    end: int,
    value_quantum: float = 0.01,
) -> DataFrame:
    """Weekday-vs-weekend Welch t-test on daily sums per stream: does
    the weekend population differ from the weekday one? Welch t and the
    Welch-Satterthwaite df from exact per-group integer moments (the
    welch_ttest machinery pointed at the calendar). dow from epoch days
    (+4) % 7 with 0 = Sunday; weekend = {0, 6}.

    Exactness: group sums/squares are int64; t and df are fixed IEEE
    trees over them (sample variances with the n-1 denominator). Scale
    shape: one point-scale groupBy to daily sums, one 2-group moment
    reduce per stream. Columns: uuid, n_wd, n_we, mean_wd, mean_we, t,
    df."""
    filled, n = _bucket_sums(points, start, end, 86_400_000_000_000, value_quantum)
    q = round(1.0 / value_quantum)
    day0 = start // 86_400_000_000_000
    dow = (F.col("widx") + F.lit(day0 + 4)) % 7
    tagged = filled.select(
        "uuid", "s", ((dow == 0) | (dow == 6)).alias("is_we")
    )
    mom = tagged.groupBy("uuid").agg(
        F.sum(F.when(~F.col("is_we"), 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("is_we"), 1).otherwise(0)).alias("n2"),
        F.sum(F.when(~F.col("is_we"), F.col("s")).otherwise(0)).alias("S1"),
        F.sum(F.when(F.col("is_we"), F.col("s")).otherwise(0)).alias("S2"),
        F.sum(
            F.when(~F.col("is_we"), F.col("s") * F.col("s")).otherwise(0)
        ).alias("SS1"),
        F.sum(
            F.when(F.col("is_we"), F.col("s") * F.col("s")).otherwise(0)
        ).alias("SS2"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    m1 = d("S1") / d("n1")
    m2 = d("S2") / d("n2")
    v1 = (d("n1") * d("SS1") - d("S1") * d("S1")) / (
        d("n1") * (d("n1") - F.lit(1.0))
    )
    v2 = (d("n2") * d("SS2") - d("S2") * d("S2")) / (
        d("n2") * (d("n2") - F.lit(1.0))
    )
    a = v1 / d("n1")
    b = v2 / d("n2")
    t = (m1 - m2) / F.sqrt(a + b)
    df = (a + b) * (a + b) / (
        a * a / (d("n1") - F.lit(1.0)) + b * b / (d("n2") - F.lit(1.0))
    )
    ok = (F.col("n1") > 1) & (F.col("n2") > 1)
    return mom.select(
        "uuid",
        F.col("n1").cast("long").alias("n_wd"),
        F.col("n2").cast("long").alias("n_we"),
        (m1 / F.lit(float(q))).alias("mean_wd"),
        (m2 / F.lit(float(q))).alias("mean_we"),
        F.when(ok & ((a + b) > 0), t).alias("t"),
        F.when(ok & ((a + b) > 0), df).alias("df"),
    ).orderBy("uuid")


def gap_histogram(
    points: DataFrame,
    start: int,
    end: int,
) -> DataFrame:
    """Inter-arrival gap distribution per stream in DECADE buckets
    (bucket = number of decimal digits of the gap in ns — a log-scale
    histogram with exact integer bucketing, no float log): the one-look
    answer to "is this stream 1 Hz, 1/min, or bursty across scales",
    and the cadence evidence behind coverage_report's declared-cadence
    check.

    All-integer output. Scale shape: one per-stream lag over the
    time-ordered scan (stream-keyed window partitions), one map-side-
    combined groupBy over the tiny (stream x ~19 digit-buckets) domain.
    Columns: uuid, digits, n_gaps, min_gap_ns, max_gap_ns."""
    w = Window.partitionBy("uuid").orderBy("time")
    gaps = (
        points.where(time_range_pred(start, end))
        .select("uuid", "time")
        .withColumn("prev", F.lag("time").over(w))
        .where(F.col("prev").isNotNull())
        .select("uuid", (F.col("time") - F.col("prev")).alias("gap"))
        .where(F.col("gap") > 0)  # duplicate timestamps carry no cadence
    )
    digits = F.length(F.col("gap").cast("string"))
    return (
        gaps.groupBy("uuid", digits.alias("digits"))
        .agg(
            F.count("*").alias("n_gaps"),
            F.min("gap").alias("min_gap_ns"),
            F.max("gap").alias("max_gap_ns"),
        )
        .orderBy("uuid", "digits")
    )


def halfway_point(
    points: DataFrame,
    start: int,
    end: int,
    width: int,
    value_quantum: float = 0.01,
) -> DataFrame:
    """The volume-midpoint of the period per stream: the first bucket
    where cumulative volume reaches half the period total (2*cum >=
    total, an integer comparison — no float share), plus the front-load
    ratio midpoint/n. Early midpoints flag front-loaded periods, late
    ones back-loaded ramps.

    All-integer decision; the ratio is ONE division. Scale shape: one
    point-scale groupBy to bucket sums, one bucket-scale cumulative,
    one min-pick. Columns: uuid, halfway_widx, halfway_time, n_buckets,
    frontload_ratio."""
    filled, n = _bucket_sums(points, start, end, width, value_quantum)
    w = (
        Window.partitionBy("uuid")
        .orderBy("widx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = filled.withColumn("cum", F.sum("s").over(w))
    tot = filled.groupBy("uuid").agg(F.sum("s").alias("total"))
    hit = (
        cum.join(F.broadcast(tot), "uuid")
        .where(F.lit(2) * F.col("cum") >= F.col("total"))
        .groupBy("uuid")
        .agg(F.min("widx").alias("halfway_widx"))
    )
    return hit.select(
        "uuid",
        "halfway_widx",
        (F.lit(start) + F.col("halfway_widx") * F.lit(width)).alias(
            "halfway_time"
        ),
        F.lit(n).cast("long").alias("n_buckets"),
        (
            (F.col("halfway_widx") + F.lit(1)).cast("double")
            / F.lit(float(n))
        ).alias("frontload_ratio"),
    ).orderBy("uuid")


def mode_value(
    points: DataFrame,
    start: int,
    end: int,
    value_quantum: float = 0.01,
) -> DataFrame:
    """Modal value per stream: the most frequent quantized value, its
    count, and its share of all points — the stuck-sensor / default-
    value DQ probe (a healthy continuous signal has a tiny modal
    share). Argmax over integer counts with the smaller value winning
    ties — engine-exact.

    Scale shape: one map-side-combined groupBy over the (stream, value)
    domain, one struct-max argmax per stream, one total join. Columns:
    uuid, mode_value, mode_count, n_points, mode_share."""
    q = round(1.0 / value_quantum)
    vq = F.round(F.col("value") / F.lit(value_quantum)).cast("long")
    counts = (
        points.where(time_range_pred(start, end))
        .groupBy("uuid", vq.alias("vq"))
        .agg(F.count("*").alias("cnt"))
    )
    pick = counts.groupBy("uuid").agg(
        F.max(F.struct(F.col("cnt"), (-F.col("vq")).alias("nvq"))).alias("m"),
        F.sum("cnt").alias("n_points"),
    )
    return pick.select(
        "uuid",
        ((-F.col("m.nvq")).cast("double") / F.lit(float(q))).alias(
            "mode_value"
        ),
        F.col("m.cnt").alias("mode_count"),
        "n_points",
        (
            F.col("m.cnt").cast("double") / F.col("n_points").cast("double")
        ).alias("mode_share"),
    ).orderBy("uuid")


def tukey_outliers(
    points: DataFrame,
    start: int,
    end: int,
    k_fence: float = 1.5,
    value_quantum: float = 0.01,
) -> DataFrame:
    """Tukey-fence outlier census per stream: exact type-1 quartiles
    (order statistics at ceil(n/4) and ceil(3n/4)), fences q1 -
    k*(q3-q1) and q3 + k*(q3-q1), and the number of points beyond each
    — the classical box-plot outlier count with no approximation in the
    quartiles.

    Exactness: quartiles are integer order statistics; the fences are
    one fixed IEEE expression over them; the beyond-fence comparisons
    put exact integers against those doubles — identical in any engine.
    Scale shape: one rank window per stream (the audit-grade exact
    quartile — at serving scale the histogram-sketch hist_quantiles is
    the cheap path), one conditional reduce. Columns: uuid, q1, q3,
    lo_fence, hi_fence, n_below, n_above, n_points."""
    q = round(1.0 / value_quantum)
    vq = F.round(F.col("value") / F.lit(value_quantum)).cast("long")
    src = (
        points.where(time_range_pred(start, end))
        .select("uuid", vq.alias("vq"))
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("uuid").orderBy("vq")
    ranked = src.withColumn("rn", F.row_number().over(w))
    nn = src.groupBy("uuid").agg(F.count("*").alias("n"))
    qs = (
        ranked.join(F.broadcast(nn), "uuid")
        .where(
            (F.col("rn") == F.expr("(n + 3) div 4"))
            | (F.col("rn") == F.expr("(3 * n + 3) div 4"))
        )
        .groupBy("uuid")
        .agg(
            F.min(
                F.when(F.col("rn") == F.expr("(n + 3) div 4"), F.col("vq"))
            ).alias("q1q"),
            F.min(
                F.when(
                    F.col("rn") == F.expr("(3 * n + 3) div 4"), F.col("vq")
                )
            ).alias("q3q"),
        )
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    iqr = d("q3q") - d("q1q")
    lo = d("q1q") - F.lit(float(k_fence)) * iqr
    hi = d("q3q") + F.lit(float(k_fence)) * iqr
    flagged = src.join(F.broadcast(qs), "uuid").select(
        "uuid",
        (F.col("vq").cast("double") < lo).cast("long").alias("below"),
        (F.col("vq").cast("double") > hi).cast("long").alias("above"),
    )
    agg = flagged.groupBy("uuid").agg(
        F.sum("below").alias("n_below"),
        F.sum("above").alias("n_above"),
        F.count("*").alias("n_points"),
    )
    qf = round(1.0 / value_quantum)
    return (
        agg.join(qs, "uuid")
        .select(
            "uuid",
            (d("q1q") / F.lit(float(qf))).alias("q1"),
            (d("q3q") / F.lit(float(qf))).alias("q3"),
            (lo / F.lit(float(qf))).alias("lo_fence"),
            (hi / F.lit(float(qf))).alias("hi_fence"),
            "n_below",
            "n_above",
            "n_points",
        )
        .orderBy("uuid")
    )


def round_number_bias(
    points: DataFrame,
    start: int,
    end: int,
    value_quantum: float = 0.01,
) -> DataFrame:
    """Round-number bias probe per stream: the share of values landing
    exactly on whole units (.00) and half units (.50) versus the 1%
    each a smooth distribution would give — human-entered or defaulted
    data clumps on round numbers, sensors don't (the Benford companion
    for the fractional part).

    All-integer counts (quanta mod 100 / mod 50); shares are single
    divisions. Scale shape: one map-side-combined aggregate. Columns:
    uuid, n, n_whole, n_half, whole_share, half_share."""
    q = round(1.0 / value_quantum)
    vq = F.round(F.col("value") / F.lit(value_quantum)).cast("long")
    src = points.where(time_range_pred(start, end)).select(
        "uuid", vq.alias("vq")
    )
    agg = src.groupBy("uuid").agg(
        F.count("*").alias("n"),
        F.sum((F.pmod(F.col("vq"), F.lit(q)) == 0).cast("long")).alias(
            "n_whole"
        ),
        F.sum(
            (
                (F.pmod(F.col("vq"), F.lit(q // 2)) == 0)
                & (F.pmod(F.col("vq"), F.lit(q)) != 0)
            ).cast("long")
        ).alias("n_half"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return agg.select(
        "uuid",
        "n",
        "n_whole",
        "n_half",
        (d("n_whole") / d("n")).alias("whole_share"),
        (d("n_half") / d("n")).alias("half_share"),
    ).orderBy("uuid")
