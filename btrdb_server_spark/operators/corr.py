"""Cross-stream correlation over aligned time buckets.

Fleet analytics ask "which sensors move together" — the grid operator the
BTrDB ecosystem's distillers feed (voltage-angle pairs across PMUs). This
computes the Pearson correlation of per-bucket activity between every pair
of streams in one pass over the points.

Alignment semantics: streams are aligned on 2**pw-ns buckets by their
bucket SUM in quantum units, with empty buckets counting as 0 over the full
[start, end) spine — so the statistic is a total function of the point set
(no pairwise-complete-case ambiguity), and for fixed-cadence streams it
equals the correlation of mean rates.

Exactness: every aggregate is an int64 in quantum units (bucket sums, pair
dot products, per-stream sums of squares — a month of cent-quantized hourly
sums is far inside the int64 ceiling; the zero-filled spine adds nothing to
any sum, so missing buckets need no rows at all). The Pearson formula then
runs in double on those exact integers with each factor cast first:

    corr = (n*Sab - Sa*Sb) / (sqrt(n*Saa - Sa^2) * sqrt(n*Sbb - Sb^2))

— a fixed IEEE op sequence on exact inputs, bit-identical in any engine.
n is the CONSTANT bucket count of the range, so cross-products of absent
buckets (0 * x) vanish and the inner bucket-join computes Sab completely.

Scale shape: groupBy (uuid, bucket) -> one row per non-empty bucket (the
only point-scale pass, map-side combined); the pair join runs on that
reduced set keyed by bucket, and the final per-pair reduce is
streams^2-sized. Zero windows, zero sorts; with S streams the shuffle
carries O(S * buckets) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from btrdb_server_spark.constants import MAX_PW
from btrdb_server_spark.operators.raw import time_range_pred
from btrdb_server_spark.operators.stat import align_floor


def stream_corr(
    points: DataFrame,
    start: int,
    end: int,
    pw: int,
    value_quantum: float = 0.01,
) -> DataFrame:
    """Pearson correlation of per-bucket sums for every unordered stream
    pair (uuid_a < uuid_b). Columns: uuid_a, uuid_b, n_buckets, corr
    (null when either side has zero variance). Ordered by (uuid_a, uuid_b)."""
    if not 0 <= pw <= MAX_PW:
        raise ValueError(f"pointwidth {pw} out of range [0, {MAX_PW}]")
    fstart = align_floor(start, pw)
    fend = align_floor(end, pw)
    n_buckets = (fend - fstart) >> pw
    if n_buckets <= 0:
        raise ValueError("empty bucket range")
    # localCheckpoint: `sums` feeds the marginals AND both sides of the
    # pair join — without materialization Spark re-runs the point-scale
    # scan+shuffle three times (no exchange reuse across the self-join).
    # The table is bucket-scale (streams x non-empty buckets), so pinning
    # it costs KBs and collapses the plan to ONE pass over the points.
    sums = (
        points.where(time_range_pred(fstart, fend))
        .groupBy("uuid", F.shiftright("time", pw).alias("bucket"))
        .agg(
            F.sum(F.round(F.col("value") / F.lit(value_quantum)).cast("long")).alias("s")
        )
        .localCheckpoint(eager=True)
    )
    # Per-stream marginals: one row per stream (missing buckets add 0).
    marg = sums.groupBy("uuid").agg(
        F.sum("s").alias("S"), F.sum(F.col("s") * F.col("s")).alias("SS")
    )
    # Pair dot products on the bucket key: absent-bucket terms are 0*s = 0,
    # so the inner join over non-empty buckets computes the full spine sum.
    a = sums.select(
        F.col("uuid").alias("uuid_a"), "bucket", F.col("s").alias("sa")
    )
    b = sums.select(
        F.col("uuid").alias("uuid_b"), "bucket", F.col("s").alias("sb")
    )
    dots = (
        a.join(b, "bucket")
        .where(F.col("uuid_a") < F.col("uuid_b"))
        .groupBy("uuid_a", "uuid_b")
        .agg(F.sum(F.col("sa") * F.col("sb")).alias("Sab"))
    )
    # All stream pairs, even never-cobucketed ones (Sab = 0 then).
    pairs = (
        marg.select(F.col("uuid").alias("uuid_a"))
        .crossJoin(marg.select(F.col("uuid").alias("uuid_b")))
        .where(F.col("uuid_a") < F.col("uuid_b"))
    )
    ma = marg.select(
        F.col("uuid").alias("uuid_a"), F.col("S").alias("Sa"), F.col("SS").alias("Saa")
    )
    mb = marg.select(
        F.col("uuid").alias("uuid_b"), F.col("S").alias("Sb"), F.col("SS").alias("Sbb")
    )
    n = F.lit(float(n_buckets))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    sab = F.coalesce(F.col("Sab"), F.lit(0)).cast("double")
    cov = n * sab - d("Sa") * d("Sb")
    var_a = n * d("Saa") - d("Sa") * d("Sa")
    var_b = n * d("Sbb") - d("Sb") * d("Sb")
    return (
        pairs.join(ma, "uuid_a")
        .join(mb, "uuid_b")
        .join(dots, ["uuid_a", "uuid_b"], "left")
        .select(
            "uuid_a",
            "uuid_b",
            F.lit(n_buckets).alias("n_buckets"),
            F.when(
                (var_a > 0) & (var_b > 0),
                cov / (F.sqrt(var_a) * F.sqrt(var_b)),
            ).alias("corr"),
        )
        .orderBy("uuid_a", "uuid_b")
    )


def autocorr(
    points: DataFrame,
    uuid: str,
    start: int,
    end: int,
    pw: int,
    lags: tuple[int, ...] = (1, 2, 3, 4, 5),
    value_quantum: float = 0.01,
) -> DataFrame:
    """Autocorrelation function over per-bucket sums (zero-filled spine) —
    the seasonality probe: a daily-periodic stream shows a peak at the
    ~24 h lag. For each lag L the statistic is the standard ACF with the
    GLOBAL mean (Box-Jenkins form):

        r(L) = sum_{t<n-L} (x_t - mu)(x_{t+L} - mu) / sum_t (x_t - mu)^2

    multiplied through by n^2 so every aggregate is an exact integer:
    numerator*n^2 = n^2*Sxy - n*S*(Sh + St) + (n-L)*S^2, denominator*n^2 =
    n^2*SS - n*S^2 — with Sxy the lag-L dot product, Sh/St the head/tail
    partial sums (head = buckets [0, n-L), tail = [L, n)) and S/SS the
    full-spine sum and sum of squares. Every component is an int64 in
    quantum units (zero-filled buckets contribute nothing); the final
    ratio evaluates in double on the exact integers with each factor cast
    first — bit-identical in any engine.

    Scale shape: ONE point-scale groupBy to bucket sums (map-side
    combined, localCheckpoint'ed — the table feeds the marginal and every
    lag), then per-lag work on the bucket-scale table: a shifted
    self-join for Sxy and conditional aggregates for Sh/St. With |lags|=L
    the total cost beyond the one scan is O(L * non-empty buckets)."""
    if not 0 <= pw <= MAX_PW:
        raise ValueError(f"pointwidth {pw} out of range [0, {MAX_PW}]")
    if not lags or any(lag < 1 for lag in lags):
        raise ValueError("lags must be positive")
    fstart = align_floor(start, pw)
    fend = align_floor(end, pw)
    n = (fend - fstart) >> pw
    if n <= max(lags):
        raise ValueError("range shorter than the largest lag")
    b0 = fstart >> pw
    sums = (
        points.where((F.col("uuid") == F.lit(uuid)) & time_range_pred(fstart, fend))
        .groupBy((F.shiftright("time", pw) - F.lit(b0)).alias("bucket"))
        .agg(
            F.sum(F.round(F.col("value") / F.lit(value_quantum)).cast("long")).alias("s")
        )
        .localCheckpoint(eager=True)
    )
    marg = sums.agg(
        F.sum("s").alias("S"), F.sum(F.col("s") * F.col("s")).alias("SS")
    )
    spark = points.sparkSession
    lag_df = spark.createDataFrame([(int(lag),) for lag in lags], "lag long")
    # Shifted self-join on the bucket-scale table: pairs (t, t+L) present
    # on both sides; zero-filled terms vanish from every sum.
    a = sums.select(F.col("bucket").alias("t"), F.col("s").alias("sa"))
    b = sums.select(F.col("bucket").alias("tb"), F.col("s").alias("sb"))
    sxy = (
        lag_df.join(a)
        .join(b, F.col("tb") == F.col("t") + F.col("lag"))
        .groupBy("lag")
        .agg(F.sum(F.col("sa") * F.col("sb")).alias("Sxy"))
    )
    # Head/tail partial sums per lag: conditional aggregates on ranges.
    parts = (
        lag_df.join(sums)
        .groupBy("lag")
        .agg(
            F.sum(F.when(F.col("bucket") < F.lit(n) - F.col("lag"), F.col("s"))).alias(
                "Sh"
            ),
            F.sum(F.when(F.col("bucket") >= F.col("lag"), F.col("s"))).alias("St"),
        )
    )
    d = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("double")  # noqa: E731
    nn = F.lit(float(n))
    num = (
        nn * nn * d("Sxy")
        - nn * d("S") * (d("Sh") + d("St"))
        + (nn - F.col("lag").cast("double")) * d("S") * d("S")
    )
    den = nn * nn * d("SS") - nn * d("S") * d("S")
    return (
        lag_df.join(sxy, "lag", "left")
        .join(parts, "lag", "left")
        .crossJoin(F.broadcast(marg))
        .select(
            "lag",
            F.lit(n).alias("n_buckets"),
            F.when(den > 0, num / den).alias("acf"),
        )
        .orderBy("lag")
    )


def xcorr_lags(
    points: DataFrame,
    uuid_a: str,
    uuid_b: str,
    start: int,
    end: int,
    pw: int,
    lags: tuple[int, ...] = (-3, -2, -1, 0, 1, 2, 3),
    value_quantum: float = 0.01,
) -> DataFrame:
    """Cross-correlation function between two streams over per-bucket sums
    (zero-filled spine): for each signed lag L, the Pearson correlation of
    pairs (a_t, b_{t+L}) over the m = n-|L| overlapping buckets — the lag
    estimator ("sensor B follows sensor A by ~2 buckets" shows as the
    argmax lag). Positive L means b LAGS a.

    Exactness: every component is an int64 in quantum units — Sxy from a
    shifted join (zero-filled terms vanish), Sa/Saa and Sb/Sbb from
    conditional range aggregates over the non-empty buckets — and the
    Pearson ratio

        r(L) = (m*Sxy - Sa*Sb) / (sqrt(m*Saa - Sa^2) * sqrt(m*Sbb - Sb^2))

    evaluates in double on the exact integers, each factor cast first:
    bit-identical in any engine. Null when either side of the overlap has
    zero variance.

    Scale shape: TWO point-scale groupBys to bucket sums (map-side
    combined, localCheckpoint'ed — each table feeds every lag's join and
    range aggregates), then per-lag work on bucket-scale tables only:
    O(|lags| * non-empty buckets) beyond the scans."""
    if not 0 <= pw <= MAX_PW:
        raise ValueError(f"pointwidth {pw} out of range [0, {MAX_PW}]")
    fstart = align_floor(start, pw)
    fend = align_floor(end, pw)
    n = (fend - fstart) >> pw
    if not lags or n <= max(abs(lag) for lag in lags):
        raise ValueError("need lags, each shorter than the bucket range")
    b0 = fstart >> pw
    q = F.round(F.col("value") / F.lit(value_quantum)).cast("long")

    def bucket_sums(uid: str) -> DataFrame:
        return (
            points.where((F.col("uuid") == F.lit(uid)) & time_range_pred(fstart, fend))
            .groupBy((F.shiftright("time", pw) - F.lit(b0)).alias("bucket"))
            .agg(F.sum(q).alias("s"))
            .localCheckpoint(eager=True)
        )

    sa, sb = bucket_sums(uuid_a), bucket_sums(uuid_b)
    spark = points.sparkSession
    lag_df = spark.createDataFrame([(int(lag),) for lag in lags], "lag long")
    # Overlap index ranges: a-side t in [max(0,-L), n - max(0,L));
    # b-side u = t+L in [max(0,L), n + min(0,L)).
    lo_a = F.greatest(F.lit(0), -F.col("lag"))
    hi_a = F.lit(n) - F.greatest(F.lit(0), F.col("lag"))
    lo_b = F.greatest(F.lit(0), F.col("lag"))
    hi_b = F.lit(n) + F.least(F.lit(0), F.col("lag"))
    sxy = (
        lag_df.join(sa.select(F.col("bucket").alias("t"), F.col("s").alias("va")))
        .join(
            sb.select(F.col("bucket").alias("u"), F.col("s").alias("vb")),
            F.col("u") == F.col("t") + F.col("lag"),
        )
        .groupBy("lag")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("Sxy"))
    )
    parts_a = (
        lag_df.join(sa)
        .where((F.col("bucket") >= lo_a) & (F.col("bucket") < hi_a))
        .groupBy("lag")
        .agg(
            F.sum("s").alias("Sa"),
            F.sum(F.col("s") * F.col("s")).alias("Saa"),
        )
    )
    parts_b = (
        lag_df.join(sb)
        .where((F.col("bucket") >= lo_b) & (F.col("bucket") < hi_b))
        .groupBy("lag")
        .agg(
            F.sum("s").alias("Sb"),
            F.sum(F.col("s") * F.col("s")).alias("Sbb"),
        )
    )
    d = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("double")  # noqa: E731
    m = (F.lit(n) - F.abs(F.col("lag"))).cast("double")
    num = m * d("Sxy") - d("Sa") * d("Sb")
    var_a = m * d("Saa") - d("Sa") * d("Sa")
    var_b = m * d("Sbb") - d("Sb") * d("Sb")
    return (
        lag_df.join(sxy, "lag", "left")
        .join(parts_a, "lag", "left")
        .join(parts_b, "lag", "left")
        .select(
            "lag",
            (F.lit(n) - F.abs(F.col("lag"))).alias("n_pairs"),
            F.when(
                (var_a > 0) & (var_b > 0),
                num / (F.sqrt(var_a) * F.sqrt(var_b)),
            ).alias("xcorr"),
        )
        .orderBy("lag")
    )


def seasonal_naive_error(
    points: DataFrame,
    uuid: str,
    start: int,
    end: int,
    pw: int,
    period: int,
    value_quantum: float = 0.01,
) -> DataFrame:
    """Seasonal-naive forecast evaluation: predict each bucket sum by the
    sum `period` buckets earlier and report the mean absolute error over
    the zero-filled spine — the baseline every seasonality claim
    (autocorr peak, diurnal profile) must beat before a fancier model is
    worth running. One summary row: n_pairs (n - period), sae_q (exact
    int64 sum of |s_t - s_{t-period}| in quantum units), mae_q (one
    double division), mae (value units).

    Scale shape: ONE point-scale groupBy to bucket sums, then a
    bucket-scale full-outer self-join shifted by `period` (zero-filled
    terms via coalesce), one map-side-combined sum. Exact integers until
    the final division — bit-identical in any engine."""
    if not 0 <= pw <= MAX_PW:
        raise ValueError(f"pointwidth {pw} out of range [0, {MAX_PW}]")
    fstart = align_floor(start, pw)
    fend = align_floor(end, pw)
    n = (fend - fstart) >> pw
    if not 0 < period < n:
        raise ValueError("period must be positive and shorter than the range")
    b0 = fstart >> pw
    sums = (
        points.where((F.col("uuid") == F.lit(uuid)) & time_range_pred(fstart, fend))
        .groupBy((F.shiftright("time", pw) - F.lit(b0)).alias("bucket"))
        .agg(
            F.sum(F.round(F.col("value") / F.lit(value_quantum)).cast("long")).alias("s")
        )
    )
    cur = sums.where(F.col("bucket") >= F.lit(period)).select(
        F.col("bucket").alias("t"), F.col("s").alias("cs")
    )
    past = sums.where(F.col("bucket") < F.lit(n - period)).select(
        (F.col("bucket") + F.lit(period)).alias("t"), F.col("s").alias("ps")
    )
    joined = cur.join(past, "t", "full").select(
        F.abs(
            F.coalesce(F.col("cs"), F.lit(0)) - F.coalesce(F.col("ps"), F.lit(0))
        ).alias("ae")
    )
    np_ = n - period
    mae_q = F.col("sae_q").cast("double") / F.lit(float(np_))
    return (
        joined.agg(F.coalesce(F.sum("ae"), F.lit(0)).alias("sae_q"))
        .select(
            F.lit(np_).cast("long").alias("n_pairs"),
            "sae_q",
            mae_q.alias("mae_q"),
            (mae_q * F.lit(value_quantum)).alias("mae"),
        )
    )


def exceedance_corr(
    points: DataFrame,
    uuid_a: str,
    uuid_b: str,
    start: int,
    end: int,
    pw: int,
    thr_a: float,
    thr_b: float,
) -> DataFrame:
    """Cross-stream ALARM correlation: the phi coefficient of the 2x2
    contingency "did bucket exceed the threshold" between two streams
    over aligned 2**pw buckets — "do these two sensors alarm together?",
    the binary-event companion to stream_corr's value correlation. A
    bucket exceeds when its max value is at/above the stream's
    threshold; empty buckets do not exceed (zero-filled spine
    semantics). One summary row: n_buckets, n_a, n_b, n_both, phi
    (null when either margin is degenerate).

        phi = (n*n11 - na*nb) / sqrt(na*(n-na) * nb*(n-nb))

    — every term an exact int64 count, one double expression at the end:
    bit-identical in any engine.

    Scale shape: two point-scale groupBys collapse to exceeding-bucket
    sets (map-side combined; the filter keeps only exceeding buckets, so
    the join input is alarm-scale, not bucket-scale); n_both is one
    equi-join count. No spine materializes — n comes from the range."""
    if not 0 <= pw <= MAX_PW:
        raise ValueError(f"pointwidth {pw} out of range [0, {MAX_PW}]")
    fstart = align_floor(start, pw)
    fend = align_floor(end, pw)
    n = (fend - fstart) >> pw
    if n <= 0:
        raise ValueError("empty bucket range")

    def exceeding(uid: str, thr: float) -> DataFrame:
        return (
            points.where(
                (F.col("uuid") == F.lit(uid)) & time_range_pred(fstart, fend)
            )
            .groupBy(F.shiftright("time", pw).alias("bucket"))
            .agg(F.max("value").alias("vmax"))
            .where(F.col("vmax") >= F.lit(thr))
            .select("bucket")
            .localCheckpoint(eager=False)  # feeds its margin AND the join
        )

    ea, eb = exceeding(uuid_a, thr_a), exceeding(uuid_b, thr_b)
    counts = (
        ea.agg(F.count("*").alias("n_a"))
        .crossJoin(eb.agg(F.count("*").alias("n_b")))
        .crossJoin(ea.join(eb, "bucket").agg(F.count("*").alias("n_both")))
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    nn = F.lit(float(n))
    num = nn * d("n_both") - d("n_a") * d("n_b")
    den2 = (
        d("n_a") * (nn - d("n_a")) * d("n_b") * (nn - d("n_b"))
    )
    return counts.select(
        F.lit(n).cast("long").alias("n_buckets"),
        "n_a",
        "n_b",
        "n_both",
        F.when(den2 > 0, num / F.sqrt(den2)).alias("phi"),
    )


def _daily_totals(
    points: DataFrame, uuid: str, start: int, end: int, width: int,
    value_quantum: float,
) -> DataFrame:
    """(widx, yq) — per-window totals of one stream in exact quantum units;
    the bounded series the pairwise trend statistics run on."""
    return (
        points.where(
            (F.col("uuid") == F.lit(uuid))
            & (F.col("time") >= F.lit(start))
            & (F.col("time") < F.lit(end))
        )
        .select(
            F.expr(f"(time - ({start})) div {width}").alias("widx"),
            F.round(F.col("value") / F.lit(value_quantum)).cast("long").alias("vq"),
        )
        .groupBy("widx")
        .agg(F.sum("vq").alias("yq"))
    )


def mann_kendall(
    points: DataFrame,
    uuid: str,
    start: int,
    end: int,
    width: int,
    value_quantum: float = 0.01,
) -> DataFrame:
    """Mann-Kendall trend test on the per-window totals of one stream:
    S = Σ_{i<j} sign(y_j - y_i), the tie-corrected variance
    Var = (n(n-1)(2n+5) - Σ_t t(t-1)(2t+5)) / 18, and the normal
    approximation Z (continuity-corrected) — the nonparametric "is this
    feed drifting?" answer that, unlike OLS, no single spike can flip.
    One row: n, s, var_s, z.

    Exactness: totals are exact int64 quantum units, S and 18·Var are
    integer sums, and Z is a fixed two-op double sequence (divide by
    sqrt) over exact integers. The pairwise pass is quadratic in WINDOW
    COUNT (a bounded, user-chosen resolution — 31 for a month of days),
    never in points; the point-scale work is one map-side groupBy."""
    t = _daily_totals(points, uuid, start, end, width, value_quantum)
    a = t.select(F.col("widx").alias("i"), F.col("yq").alias("yi"))
    b = t.select(F.col("widx").alias("j"), F.col("yq").alias("yj"))
    pairs = a.join(b, F.col("i") < F.col("j"))
    # coalesce: a 0- or 1-window range has no pairs -> S is 0, not null
    s_df = pairs.agg(
        F.coalesce(
            F.sum(F.signum(F.col("yj") - F.col("yi")).cast("long")), F.lit(0)
        ).alias("s")
    )
    nt = t.agg(F.count("*").alias("n"))
    ties = (
        t.groupBy("yq")
        .agg(F.count("*").alias("t"))
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            ).alias("tie_term")
        )
    )
    joined = s_df.crossJoin(F.broadcast(nt)).crossJoin(F.broadcast(ties))
    var18 = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tie_term")
    )
    var_s = var18.cast("double") / F.lit(18.0)
    z = (
        F.when(F.col("s") > 0, (F.col("s") - 1).cast("double") / F.sqrt(var_s))
        .when(F.col("s") < 0, (F.col("s") + 1).cast("double") / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    return joined.select("n", "s", var_s.alias("var_s"), z.alias("z"))


def theilsen_trend(
    points: DataFrame,
    uuid: str,
    start: int,
    end: int,
    width: int,
    value_quantum: float = 0.01,
) -> DataFrame:
    """Theil-Sen robust trend of the per-window totals: the type-1 median
    of all pairwise slopes (y_j - y_i)/(j - i), plus the matching median
    intercept y_i - slope·i — up to ~29% corrupted windows move the
    estimate by nothing, where OLS follows every outlier. One row:
    n, n_pairs, slope_per_window, intercept (value units).

    Exactness: each slope is ONE IEEE division of exact int64 quantities,
    identical in any engine; the median is an order-statistic PICK
    (cumulative count over the sorted slope set, widx tiebreaks), not an
    accumulation, so no float-order surface exists. Same quadratic-in-
    windows bound as mann_kendall."""
    from pyspark.sql import Window as W

    t = _daily_totals(points, uuid, start, end, width, value_quantum)
    q = float(round(1.0 / value_quantum))
    a = t.select(F.col("widx").alias("i"), F.col("yq").alias("yi"))
    b = t.select(F.col("widx").alias("j"), F.col("yq").alias("yj"))
    pairs = a.join(b, F.col("i") < F.col("j")).select(
        "i",
        "j",
        (
            (F.col("yj") - F.col("yi")).cast("double")
            / (F.col("j") - F.col("i")).cast("double")
        ).alias("slope"),
    )
    w = W.orderBy("slope", "i", "j").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = pairs.select("slope", F.count("*").over(w).alias("cum"))
    np_df = pairs.agg(F.count("*").alias("n_pairs"))
    # Ungrouped agg so a pair-less range (fewer than 2 windows) still
    # yields the one-row frame (null slope) instead of vanishing.
    med = (
        cum.crossJoin(F.broadcast(np_df))
        .agg(
            F.min(
                F.when(
                    F.col("cum")
                    >= F.ceil(F.col("n_pairs").cast("double") * F.lit(0.5)),
                    F.col("slope"),
                )
            ).alias("slope_q")
        )
        .crossJoin(F.broadcast(np_df))
    )
    resid = t.crossJoin(F.broadcast(med)).select(
        "n_pairs",
        "slope_q",
        (F.col("yq").cast("double") - F.col("slope_q") * F.col("widx").cast("double")).alias("r"),
        "widx",
    )
    wr = W.orderBy("r", "widx").rowsBetween(W.unboundedPreceding, W.currentRow)
    rcum = resid.select(
        "n_pairs", "slope_q", "r", F.count("*").over(wr).alias("cum")
    )
    nt = t.agg(F.count("*").alias("n"))
    return (
        rcum.crossJoin(F.broadcast(nt))
        .groupBy("n", "n_pairs", "slope_q")
        .agg(
            F.min(
                F.when(
                    F.col("cum") >= F.ceil(F.col("n").cast("double") * F.lit(0.5)),
                    F.col("r"),
                )
            ).alias("int_q")
        )
        .select(
            "n",
            "n_pairs",
            (F.col("slope_q") / F.lit(q)).alias("slope_per_window"),
            (F.col("int_q") / F.lit(q)).alias("intercept"),
        )
    )


def dtw_distance(
    points: DataFrame,
    uuid_a: str,
    uuid_b: str,
    start: int,
    end: int,
    width: int,
    value_quantum: float = 0.01,
) -> DataFrame:
    """Dynamic-time-warping distance between two streams' zero-filled
    window-total profiles: the shape-similarity measure that forgives
    phase shift (a sensor lagging its twin by an hour still matches),
    where stream_corr / xcorr_lags demand alignment. One row:
    n_a, n_b, dtw_q (quantum units), dtw (value units).

    Full O(n_a·n_b) DP with |Δ| cost over int64 quantum totals — every DP
    cell is integer min/add, so the distance is engine-exact (the oracle
    replays the DP as a recursive CTE). Spark built-ins cannot express a
    2-D DP recurrence, so the fold runs in ONE Arrow-batched mapInPandas
    over the two collected profiles — the documented escape hatch for
    genuinely sequential kernels. Point-scale work is the two map-side
    groupBys; the DP input is window-count-sized (the user-chosen
    resolution), never points."""
    import pandas as pd

    def series(uuid: str, name: str) -> DataFrame:
        tot = _daily_totals(points, uuid, start, end, width, value_quantum)
        n_w = (end - start) // width
        spine = points.sparkSession.range(0, n_w).select(
            F.col("id").alias("widx")
        )
        filled = spine.join(tot, "widx", "left").select(
            "widx", F.coalesce(F.col("yq"), F.lit(0)).alias("yq")
        )
        return filled.agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("widx", "yq"))),
                lambda s: s["yq"],
            ).alias(name)
        )

    both = series(uuid_a, "a").crossJoin(series(uuid_b, "b"))

    def dp(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                a = [int(x) for x in row["a"]]
                b = [int(x) for x in row["b"]]
                prev = []
                run = 0
                for j in range(len(b)):
                    run += abs(a[0] - b[j])
                    prev.append(run)
                for i in range(1, len(a)):
                    cur = [abs(a[i] - b[0]) + prev[0]]
                    for j in range(1, len(b)):
                        cur.append(
                            abs(a[i] - b[j]) + min(prev[j], cur[j - 1], prev[j - 1])
                        )
                    prev = cur
                yield pd.DataFrame(
                    {
                        "n_a": [len(a)],
                        "n_b": [len(b)],
                        "dtw_q": [prev[-1]],
                        "dtw": [float(prev[-1]) / round(1.0 / value_quantum)],
                    }
                )

    return both.mapInPandas(dp, "n_a long, n_b long, dtw_q long, dtw double")


def spearman_corr(
    points: DataFrame,
    uuid_x: str,
    uuid_y: str,
    start: int,
    end: int,
    width: int,
    value_quantum: float = 0.01,
) -> DataFrame:
    """Spearman rank correlation between two streams' per-window totals
    over [start, end): Pearson on AVERAGE ranks (the textbook tie
    treatment), computed entirely in integers — average ranks are exact
    half-units, so rank2 = 2*min_rank + ties - 1 is an integer and every
    moment sum is int64; rho is one double expression over six exact
    integers, bit-identical in any engine and any aggregation order.
    Monotone-robust alternative to stream_corr's Pearson (a single spike
    that drags a covariance barely moves a rank). Columns: n_windows, rho
    (null when either side is a constant series).

    Scale shape: the point scan collapses to window-indexed totals
    (bucket-scale) per stream; the rank windows run over that bounded
    series (window count fixed by the query range — the unpartitioned
    window is over metadata-scale rows, same bound as mann_kendall's
    pair join), then one global aggregate."""
    from pyspark.sql import Window as W

    x = _daily_totals(points, uuid_x, start, end, width, value_quantum)
    y = _daily_totals(points, uuid_y, start, end, width, value_quantum)
    j = (
        x.select("widx", F.col("yq").alias("xq"))
        .join(y.select("widx", F.col("yq").alias("yv")), "widx")
    )
    rank2 = lambda c: (  # noqa: E731
        2 * F.rank().over(W.orderBy(c))
        + F.count("*").over(W.partitionBy(c))
        - 1
    ).cast("long")
    ranked = j.select(
        rank2(F.col("xq")).alias("ra"), rank2(F.col("yv")).alias("rb")
    )
    agg = ranked.agg(
        F.count("*").alias("n"),
        F.sum("ra").alias("sa"),
        F.sum("rb").alias("sb"),
        F.sum(F.col("ra") * F.col("ra")).alias("saa"),
        F.sum(F.col("rb") * F.col("rb")).alias("sbb"),
        F.sum(F.col("ra") * F.col("rb")).alias("sab"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    cov = d("n") * d("sab") - d("sa") * d("sb")
    var_a = d("n") * d("saa") - d("sa") * d("sa")
    var_b = d("n") * d("sbb") - d("sb") * d("sb")
    return agg.select(
        F.col("n").alias("n_windows"),
        F.when(
            (var_a > 0) & (var_b > 0), cov / (F.sqrt(var_a) * F.sqrt(var_b))
        ).alias("rho"),
    )


def ar1_forecast(
    points: DataFrame,
    uuid: str,
    start: int,
    end: int,
    width: int,
    horizon: int = 7,
    value_quantum: float = 0.01,
) -> DataFrame:
    """AR(1) forecast of a stream's per-window totals: fit
    x_{t+1} - mu = phi (x_t - mu) by least squares on the lag-1 pairs
    (phi = the Yule-Walker/ACF(1) estimate over the zero-filled window
    spine) and project h = 1..horizon steps ahead from the last window:
    f_h = mu + phi^h (x_last - mu). Every moment is an exact integer in
    quantum units (the autocorr n^2-scaling trick); phi and mu are fixed
    double expressions, and phi^h is a LEFT-FOLD of h explicit
    multiplications — never pow(), whose JVM implementation is only
    1-ulp-accurate and disagrees with libm (same class of bug as
    Math.log, see zipf_fit). Columns: h, phi, forecast.

    Scale shape: one point-scale groupBy to window totals; the fit is
    three aggregates over the bucket-scale table (marginal, shifted
    self-join dot product, last window), the projection a `horizon`-row
    literal explode of a broadcast 1-row stats table."""
    if horizon < 1:
        raise ValueError("horizon >= 1")
    n = (end - start) // width
    if n < 3:
        raise ValueError("need at least 3 windows")
    sums = (
        points.where(
            (F.col("uuid") == F.lit(uuid))
            & (F.col("time") >= F.lit(start))
            & (F.col("time") < F.lit(end))
        )
        .select(
            F.expr(f"(time - ({start})) div {width}").alias("widx"),
            F.round(F.col("value") / F.lit(value_quantum))
            .cast("long")
            .alias("vq"),
        )
        .groupBy("widx")
        .agg(F.sum("vq").alias("s"))
        .localCheckpoint(eager=True)
    )
    marg = sums.agg(
        F.sum("s").alias("S"),
        F.sum(F.col("s") * F.col("s")).alias("SS"),
        F.sum(F.when(F.col("widx") < n - 1, F.col("s"))).alias("Sh"),
        F.sum(F.when(F.col("widx") >= 1, F.col("s"))).alias("St"),
        F.coalesce(
            F.sum(F.when(F.col("widx") == n - 1, F.col("s"))), F.lit(0)
        ).alias("last"),
    )
    a = sums.select(F.col("widx").alias("t"), F.col("s").alias("sa"))
    b = sums.select((F.col("widx") - 1).alias("t"), F.col("s").alias("sb"))
    dots = a.join(b, "t").agg(
        F.coalesce(F.sum(F.col("sa") * F.col("sb")), F.lit(0)).alias("Sxy")
    )
    stats = marg.crossJoin(F.broadcast(dots))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    nn = F.lit(float(n))
    # numerator/denominator of phi, x n^2 (exact integers cast late)
    num = (
        nn * nn * F.coalesce(d("Sxy"), F.lit(0.0))
        - nn * d("S") * (F.coalesce(d("Sh"), F.lit(0.0)) + F.coalesce(d("St"), F.lit(0.0)))
        + F.lit(float(n - 1)) * d("S") * d("S")
    )
    den = nn * nn * d("SS") - nn * d("S") * d("S")
    phi = F.when(den > 0, num / den).otherwise(F.lit(0.0))
    mu = d("S") / nn
    spark = points.sparkSession
    hs = spark.createDataFrame([(h,) for h in range(1, horizon + 1)], "h long")
    proj = stats.withColumn("phi", phi).withColumn("mu", mu).crossJoin(
        F.broadcast(hs)
    )
    phi_pow = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.col("h")), lambda _: F.col("phi")
        ),
        F.lit(1.0),
        lambda acc, x: acc * x,
    )
    return proj.select(
        "h",
        "phi",
        (
            (F.col("mu") + phi_pow * (d("last") - F.col("mu")))
            * F.lit(value_quantum)
        ).alias("forecast"),
    ).orderBy("h")


def hurst_exponent(
    points: DataFrame,
    uuid: str,
    start: int,
    end: int,
    width: int,
    scales: tuple[int, ...] = (1, 2, 4, 8),
    value_quantum: float = 0.01,
) -> DataFrame:
    """Hurst exponent by the aggregated-variance method: block-average
    the per-window totals at each scale m, compute the variance of the
    block means, fit ln Var(m) against ln m — slope = 2H - 2, so
    H = 1 + slope/2 (H ~ 0.5: no memory; H > 0.5: long-range
    dependence, the self-similarity diagnostic for utility telemetry).
    Block sums are exact integers per scale; each variance is a fixed
    double expression; the logs go through the libm pandas UDF (JVM log
    is 1-ulp off libm — zipf_fit note) and the 4-point OLS runs as
    fixed-order folds. Columns: n_scales, hurst, r2.

    Scale shape: ONE point-scale groupBy to window totals, then per
    scale a bucket-scale groupBy(widx div m) — |scales| passes over the
    checkpointed spine table, constant-size everything after."""
    import math as _math

    from pyspark.sql.functions import pandas_udf

    n = (end - start) // width
    if any(n // m < 2 for m in scales):
        raise ValueError("every scale needs >= 2 blocks")
    sums = (
        points.where(
            (F.col("uuid") == F.lit(uuid))
            & (F.col("time") >= F.lit(start))
            & (F.col("time") < F.lit(end))
        )
        .select(
            F.expr(f"(time - ({start})) div {width}").alias("widx"),
            F.round(F.col("value") / F.lit(value_quantum))
            .cast("long")
            .alias("vq"),
        )
        .groupBy("widx")
        .agg(F.sum("vq").alias("s"))
    )
    # All scales in ONE pass: attach the per-scale constants as a 4-row
    # broadcast spine, block-aggregate on (m, widx div m), then reduce per
    # m. Replaces the per-scale loop (an eager checkpoint job + 2
    # exchanges and an ArrowEvalPython round trip PER scale, unioned) with
    # two exchanges and one Python round trip total; S/SS are the same
    # exact integer sums and the variance expression applies the identical
    # IEEE op chain with the identical per-scale values, so var_m is
    # bit-equal. The spine left-join restores the always-one-row-per-scale
    # contract (S = SS = 0 when no block survives the bound filter).
    spark = points.sparkSession
    spine = spark.createDataFrame(
        [(int(m), (n // m) * m, float(n // m)) for m in scales],
        "m long, bound long, nbd double",
    )
    blocks = (
        sums.join(F.broadcast(spine))
        .where(F.col("widx") < F.col("bound"))
        .groupBy("m", F.expr("widx div m").alias("blk"))
        .agg(F.sum("s").alias("bs"))
    )
    per_scale = blocks.groupBy("m").agg(
        F.sum("bs").alias("S"),
        F.sum(F.col("bs") * F.col("bs")).alias("SS"),
    )
    d = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("double")  # noqa: E731
    nbd = F.col("nbd")
    md = F.col("m").cast("double")
    # variance of block MEANS: E[(bs/m)^2] - (E[bs/m])^2, all from
    # integer sums; zero-filled windows are implicit (absent rows
    # contribute 0 to S/SS but DO count in nb)
    var = (d("SS") / (md * md)) / nbd - (d("S") / md / nbd) * (
        d("S") / md / nbd
    )
    scaled = (
        spine.join(per_scale, "m", "left")
        .select(F.col("m"), var.alias("var_m"))
    )

    from btrdb_server_spark.utils import libm_ln

    # NOT strict by design: var_m is 0 for a constant series, and the
    # documented behavior is a NaN slope (no Hurst exponent), not a
    # failed job.
    _ln = libm_ln()

    terms = scaled.select(
        "m", _ln(F.col("m").cast("double")).alias("x"), _ln("var_m").alias("y")
    ).select(
        "m",
        "x",
        "y",
        (F.col("x") * F.col("y")).alias("xy"),
        (F.col("x") * F.col("x")).alias("xx"),
        (F.col("y") * F.col("y")).alias("yy"),
    )
    fold = lambda field: F.aggregate(  # noqa: E731
        F.col("arr"), F.lit(0.0), lambda acc, e: acc + e[field]
    )
    agg2 = terms.agg(
        F.count("*").alias("k"),
        F.array_sort(F.collect_list(F.struct("m", "x", "y", "xy", "xx", "yy"))).alias(
            "arr"
        ),
    ).select(
        "k",
        fold("x").alias("sx"),
        fold("y").alias("sy"),
        fold("xy").alias("sxy"),
        fold("xx").alias("sxx"),
        fold("yy").alias("syy"),
    )
    kd = F.col("k").cast("double")
    cov = kd * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = kd * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = kd * F.col("syy") - F.col("sy") * F.col("sy")
    return agg2.select(
        F.col("k").alias("n_scales"),
        (F.lit(1.0) + (cov / vx) / F.lit(2.0)).alias("hurst"),
        F.when(vy > 0, cov * cov / (vx * vy)).alias("r2"),
    )


def ols_two_factor(
    points: DataFrame,
    y_uuid: str,
    x1_uuid: str,
    x2_uuid: str,
    start: int,
    end: int,
    width: int,
    value_quantum: float = 0.01,
) -> DataFrame:
    """Two-factor linear regression between streams on the bucket-sum
    grid: y_t = b0 + b1*x1_t + b2*x2_t over buckets of `width` ns — the
    cross-stream explanatory model ("how much of purchase volume do
    clicks and views explain?") the reference's single-stream plane
    cannot ask.

    Exactness: the 3x3 normal equations are solved by Cramer's rule on
    EXACT integer moments in decimal(38,0) (bucket sums in quantum
    units; every determinant a fixed polynomial of int64 moments), so
    the four determinants are exact; each beta is one decimal->double
    cast pair and a division; R^2 evaluates in one fixed IEEE tree from
    the same exact moments. Buckets where any stream is empty count as
    zero (the shared spine). Scale shape: one point-scale scan collapsed
    to (bucket x 3 streams) sums, pivoted to bucket-scale rows; the
    moment reduce is one row. Columns: n, b0, b1, b2, r2 (betas in
    value units — quantum cancels across the pivot)."""
    if width <= 0:
        raise ValueError("width must be positive")
    end = end - (end - start) % width
    nb = (end - start) // width
    if nb < 4:
        raise ValueError("need at least 4 buckets")
    su = (
        points.where(
            F.col("uuid").isin(y_uuid, x1_uuid, x2_uuid)
            & (F.col("time") >= start)
            & (F.col("time") < end)
        )
        .groupBy(
            F.expr(f"(time - ({start})) div {width}").alias("widx"), "uuid"
        )
        .agg(
            F.sum(
                F.round(F.col("value") / F.lit(value_quantum)).cast("long")
            ).alias("s")
        )
    )
    wide = (
        points.sparkSession.range(0, nb)
        .select(F.col("id").alias("widx"))
        .join(su, "widx", "left")
        .groupBy("widx")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("uuid") == y_uuid, F.col("s"))), F.lit(0)
            ).alias("y"),
            F.coalesce(
                F.sum(F.when(F.col("uuid") == x1_uuid, F.col("s"))), F.lit(0)
            ).alias("x1"),
            F.coalesce(
                F.sum(F.when(F.col("uuid") == x2_uuid, F.col("s"))), F.lit(0)
            ).alias("x2"),
        )
    )
    dc = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    mom = wide.agg(
        F.count("*").alias("n"),
        F.sum("x1").alias("S1"),
        F.sum("x2").alias("S2"),
        F.sum("y").alias("Sy"),
        F.sum(dc("x1") * F.col("x1")).alias("S11"),
        F.sum(dc("x2") * F.col("x2")).alias("S22"),
        F.sum(dc("x1") * F.col("x2")).alias("S12"),
        F.sum(dc("x1") * F.col("y")).alias("S1y"),
        F.sum(dc("x2") * F.col("y")).alias("S2y"),
        F.sum(dc("y") * F.col("y")).alias("Syy"),
    )
    D = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    det = (
        D("n") * (D("S11") * D("S22") - D("S12") * D("S12"))
        - D("S1") * (D("S1") * D("S22") - D("S12") * D("S2"))
        + D("S2") * (D("S1") * D("S12") - D("S11") * D("S2"))
    )
    det0 = (
        D("Sy") * (D("S11") * D("S22") - D("S12") * D("S12"))
        - D("S1") * (D("S1y") * D("S22") - D("S12") * D("S2y"))
        + D("S2") * (D("S1y") * D("S12") - D("S11") * D("S2y"))
    )
    det1 = (
        D("n") * (D("S1y") * D("S22") - D("S12") * D("S2y"))
        - D("Sy") * (D("S1") * D("S22") - D("S12") * D("S2"))
        + D("S2") * (D("S1") * D("S2y") - D("S1y") * D("S2"))
    )
    det2 = (
        D("n") * (D("S11") * D("S2y") - D("S1y") * D("S12"))
        - D("S1") * (D("S1") * D("S2y") - D("S1y") * D("S2"))
        + D("Sy") * (D("S1") * D("S12") - D("S11") * D("S2"))
    )
    q = round(1.0 / value_quantum)
    d = lambda e: e.cast("double")  # noqa: E731
    b0 = d(det0) / d(det)
    b1 = d(det1) / d(det)
    b2 = d(det2) / d(det)
    sst = d(F.col("Syy")) - d(F.col("Sy")) * d(F.col("Sy")) / d(F.col("n"))
    sse = d(F.col("Syy")) - (
        b0 * d(F.col("Sy")) + b1 * d(F.col("S1y")) + b2 * d(F.col("S2y"))
    )
    return mom.select(
        F.col("n"),
        F.when(d(det) != 0, b0 / F.lit(float(q))).alias("b0"),
        F.when(d(det) != 0, b1).alias("b1"),
        F.when(d(det) != 0, b2).alias("b2"),
        F.when((d(det) != 0) & (sst != 0), F.lit(1.0) - sse / sst).alias("r2"),
    )


def granger_lite(
    points: DataFrame,
    y_uuid: str,
    x_uuid: str,
    start: int,
    end: int,
    width: int,
    value_quantum: float = 0.01,
) -> DataFrame:
    """Granger-style predictive-causality probe on the bucket-sum grid:
    does x's previous bucket improve the AR(1) prediction of y?
    Restricted model y_t ~ 1 + y_{t-1}; full model y_t ~ 1 + y_{t-1} +
    x_{t-1}; F = (RSS_r - RSS_f) / (RSS_f / (n - 3)). Large F: lagged x
    carries information about y beyond y's own memory.

    Exactness: the 2x2 and 3x3 normal equations solve by closed form /
    Cramer's rule on EXACT integer moments (decimal(38,0) products);
    each RSS is the standard Syy - b.(X'y) identity evaluated as one
    fixed IEEE tree over exact integers; F is two divisions. Buckets
    with no data count as zero (shared spine). Scale shape: one
    point-scale groupBy pivoted to (widx, y, x), one bucket-scale lag,
    one one-row moment reduce. Columns: n, b_ar, b_x, rss_restricted,
    rss_full, f_stat."""
    if width <= 0:
        raise ValueError("width must be positive")
    end = end - (end - start) % width
    nb = (end - start) // width
    if nb < 5:
        raise ValueError("need at least 5 buckets")
    su = (
        points.where(
            F.col("uuid").isin(y_uuid, x_uuid)
            & (F.col("time") >= start)
            & (F.col("time") < end)
        )
        .groupBy(
            F.expr(f"(time - ({start})) div {width}").alias("widx"), "uuid"
        )
        .agg(
            F.sum(
                F.round(F.col("value") / F.lit(value_quantum)).cast("long")
            ).alias("s")
        )
    )
    wide = (
        points.sparkSession.range(0, nb)
        .select(F.col("id").alias("widx"))
        .join(su, "widx", "left")
        .groupBy("widx")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("uuid") == y_uuid, F.col("s"))), F.lit(0)
            ).alias("y"),
            F.coalesce(
                F.sum(F.when(F.col("uuid") == x_uuid, F.col("s"))), F.lit(0)
            ).alias("x"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy("widx")  # request-bounded bucket series
    lagged = (
        wide.withColumn("yl", F.lag("y").over(w))
        .withColumn("xl", F.lag("x").over(w))
        .where(F.col("yl").isNotNull())
    )
    dc = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    mom = lagged.agg(
        F.count("*").alias("n"),
        F.sum("yl").alias("S1"),
        F.sum("xl").alias("S2"),
        F.sum("y").alias("Sy"),
        F.sum(dc("yl") * F.col("yl")).alias("S11"),
        F.sum(dc("xl") * F.col("xl")).alias("S22"),
        F.sum(dc("yl") * F.col("xl")).alias("S12"),
        F.sum(dc("yl") * F.col("y")).alias("S1y"),
        F.sum(dc("xl") * F.col("y")).alias("S2y"),
        F.sum(dc("y") * F.col("y")).alias("Syy"),
    )
    D = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    d = lambda e: e.cast("double")  # noqa: E731
    # restricted: y ~ 1 + yl
    den_r = d(D("n") * D("S11") - D("S1") * D("S1"))
    b1_r = d(D("n") * D("S1y") - D("S1") * D("Sy")) / den_r
    b0_r = (d(F.col("Sy")) - b1_r * d(F.col("S1"))) / d(F.col("n"))
    rss_r = d(F.col("Syy")) - (b0_r * d(F.col("Sy")) + b1_r * d(F.col("S1y")))
    # full: y ~ 1 + yl + xl (Cramer, as in ols_two_factor)
    det = (
        D("n") * (D("S11") * D("S22") - D("S12") * D("S12"))
        - D("S1") * (D("S1") * D("S22") - D("S12") * D("S2"))
        + D("S2") * (D("S1") * D("S12") - D("S11") * D("S2"))
    )
    det0 = (
        D("Sy") * (D("S11") * D("S22") - D("S12") * D("S12"))
        - D("S1") * (D("S1y") * D("S22") - D("S12") * D("S2y"))
        + D("S2") * (D("S1y") * D("S12") - D("S11") * D("S2y"))
    )
    det1 = (
        D("n") * (D("S1y") * D("S22") - D("S12") * D("S2y"))
        - D("Sy") * (D("S1") * D("S22") - D("S12") * D("S2"))
        + D("S2") * (D("S1") * D("S2y") - D("S1y") * D("S2"))
    )
    det2 = (
        D("n") * (D("S11") * D("S2y") - D("S1y") * D("S12"))
        - D("S1") * (D("S1") * D("S2y") - D("S1y") * D("S2"))
        + D("Sy") * (D("S1") * D("S12") - D("S11") * D("S2"))
    )
    b0_f = d(det0) / d(det)
    b1_f = d(det1) / d(det)
    b2_f = d(det2) / d(det)
    rss_f = d(F.col("Syy")) - (
        b0_f * d(F.col("Sy")) + b1_f * d(F.col("S1y")) + b2_f * d(F.col("S2y"))
    )
    fstat = (rss_r - rss_f) / (rss_f / (d(F.col("n")) - F.lit(3.0)))
    ok = (den_r != 0) & (d(det) != 0)
    return mom.select(
        F.col("n"),
        F.when(ok, b1_f).alias("b_ar"),
        F.when(ok, b2_f).alias("b_x"),
        F.when(ok, rss_r).alias("rss_restricted"),
        F.when(ok, rss_f).alias("rss_full"),
        F.when(ok & (rss_f > 0), fstat).alias("f_stat"),
    )
