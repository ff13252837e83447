"""Sketch-based summaries: a count-min sketch over the corpus token stream
with a heavy-hitter audit — the bounded-memory frequency structure a
streaming ingest keeps when the token domain is too wide for exact counts.

The CMS here is DETERMINISTIC (salted-md5 row hashes, the same family every
hashed operator in this repo uses), so the sketch cells — and therefore the
estimates — are oracle-checkable integers, and the defining CMS guarantee
(estimate >= true count, overestimate bounded by row collisions) is
asserted per row rather than proclaimed.

Scale shape: the token stream collapses to the distinct-token count table
first (map-side-combined groupBy — token-domain scale); the sketch is built
FROM that table (sum commutes), so the d×w cell table costs d token-domain
map passes, never a second scan of the corpus. The audit joins are all
broadcast (k rows × d, d×w cells).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from btrdb_server_spark.functions.text import tokens_col


def _bucket(tok, salt: str, width: int):
    """Salted 16-bit md5 prefix folded into [0, width) — identical
    arithmetic to the oracle's strpos-on-hex formulation."""
    h4 = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), tok)), 1, 4), 16, 10
    ).cast("long")
    return h4 % F.lit(width)


def cms_heavy_hitters(
    docs: DataFrame,
    depth: int = 4,
    width: int = 1024,
    k: int = 30,
    text_col: str = "text",
) -> DataFrame:
    """Build a depth×width count-min sketch of the whitespace-token stream
    and audit it against the exact top-k tokens: one row per heavy hitter
    with (token, cnt, cms_est), cms_est = min over rows of the hashed
    cell, ordered by cnt desc (token asc tiebreak). cms_est >= cnt always;
    equality whenever no collision survives all `depth` rows."""
    if depth < 1 or width < 2:
        raise ValueError("need depth >= 1, width >= 2")
    counts = (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
    )
    per_row = [
        counts.select(
            F.lit(r).cast("long").alias("r"),
            _bucket(F.col("tok"), f"cms{r}:", width).alias("b"),
            F.col("cnt"),
        )
        for r in range(depth)
    ]
    cells = (
        reduce(DataFrame.unionAll, per_row)
        .groupBy("r", "b")
        .agg(F.sum("cnt").alias("cell"))
    )
    top = counts.orderBy(F.col("cnt").desc(), "tok").limit(k)
    probes = reduce(
        DataFrame.unionAll,
        [
            top.select(
                "tok",
                "cnt",
                F.lit(r).cast("long").alias("r"),
                _bucket(F.col("tok"), f"cms{r}:", width).alias("b"),
            )
            for r in range(depth)
        ],
    )
    return (
        probes.join(F.broadcast(cells), ["r", "b"])
        .groupBy("tok", "cnt")
        .agg(F.min("cell").alias("cms_est"))
        .orderBy(F.col("cnt").desc(), "tok")
    )


def kmv_distinct(
    events: DataFrame,
    k: int = 256,
    group_col: str = "event_type",
    id_col: str = "user_id",
) -> DataFrame:
    """K-minimum-values distinct-count sketch per group, audited against
    the exact count: hash each id to 52 bits (md5 prefix — fits double
    exactly, so the estimate's one division is engine-identical), keep
    the k smallest distinct hashes per group, estimate
    D ≈ (k-1)·2^52 / h_(k). Groups with fewer than k distinct hashes are
    served EXACTLY (the sketch holds every hash). The mergeable
    distinct sketch the reference lacks: fixed k-row state per group,
    union = merge-and-trim — the shape that answers "distinct users per
    stream per window" at 100 TB without a count-distinct shuffle of raw
    ids.

    Scale shape: one distinct on (group, hash) — map-side combined; the
    k-smallest prune is a rank window that rewrites to WindowGroupLimit
    (per-partition top-k BEFORE the exchange, k rows per group shuffle);
    the exact audit is the only id-scale count-distinct and exists to
    certify the estimate in tests. Columns: uuid, n_exact, n_kept,
    kth_hash, kmv_est."""
    if k < 2:
        raise ValueError("need k >= 2")
    from pyspark.sql import Window as W

    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("kmv:"), F.col(id_col).cast("string"))), 1, 13
        ),
        16,
        10,
    ).cast("long")
    hashes = (
        events.select(F.col(group_col).alias("uuid"), h.alias("h")).distinct()
    )
    rn = F.row_number().over(W.partitionBy("uuid").orderBy("h"))
    kept = (
        hashes.withColumn("rn", rn)
        .where(F.col("rn") <= k)
        .groupBy("uuid")
        .agg(F.max("h").alias("kth_hash"), F.count("*").alias("n_kept"))
    )
    exact = events.groupBy(F.col(group_col).alias("uuid")).agg(
        F.countDistinct(id_col).alias("n_exact")
    )
    est = F.when(
        F.col("n_kept") == k,
        F.lit(float((k - 1) * (1 << 52))) / F.col("kth_hash").cast("double"),
    ).otherwise(F.col("n_kept").cast("double"))
    return (
        exact.join(kept, "uuid")
        .select("uuid", "n_exact", "n_kept", "kth_hash", est.alias("kmv_est"))
        .orderBy("uuid")
    )


def hll_distinct(
    events: DataFrame,
    p: int = 8,
    group_col: str = "event_type",
    id_col: str = "user_id",
) -> DataFrame:
    """HyperLogLog distinct-count sketch per group, audited against the
    exact count. Deterministic md5 hashing: the low `p` hash bits pick
    one of m=2^p registers, the register keeps max(41 - bit_length of
    the next 40 hash bits). The harmonic sum runs in the INTEGER
    domain — sum(2^(40-M_j)) over occupied registers plus 2^40 per empty
    register — so the raw estimate alpha*m^2*2^40 / S is ONE division of
    engine-identical doubles (S < 2^49 fits exactly). Small-range
    correction (linear counting m*ln(m/V)) applied per the standard
    recipe when raw <= 2.5m and V > 0.

    The mergeable fixed-size distinct sketch at 100 TB: register table =
    m rows per group (map-side combined max), union of sketches =
    groupBy max — never a shuffle of raw ids. The exact count exists to
    certify the estimate. Columns: uuid, n_exact, n_registers_used,
    hll_est."""
    if not 4 <= p <= 14:
        raise ValueError("need 4 <= p <= 14")
    m = 1 << p
    hexh = F.md5(F.concat(F.lit("hll:"), F.col(id_col).cast("string")))
    # 60 hash bits: top p -> register index, next 40 -> rank domain
    h60 = F.conv(F.substring(hexh, 1, 15), 16, 10).cast("long")
    reg = (h60 % F.lit(m)).alias("reg")  # low bits as index (independent of suffix)
    suffix = F.shiftright(h60, p) % F.lit(1 << 40)
    # leading zeros within 40 bits: 40 - bit_length(suffix); rank = lz + 1
    blen = F.when(F.col("suf") == 0, F.lit(0)).otherwise(
        (F.floor(F.log2(F.col("suf").cast("double"))) + 1).cast("long")
    )
    regs = (
        events.select(F.col(group_col).alias("uuid"), reg, suffix.alias("suf"))
        .withColumn("rank", F.lit(41) - blen)
        .groupBy("uuid", "reg")
        .agg(F.max("rank").alias("M"))
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    per_group = regs.groupBy("uuid").agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 41 - CAST(M AS INT))")).alias("s_used"),
        F.count("*").alias("n_used"),
    )
    S = F.col("s_used") + (F.lit(m) - F.col("n_used")) * F.lit(1 << 41)
    raw = F.lit(alpha * m * m * float(1 << 41)) / S.cast("double")
    v_empty = F.lit(m) - F.col("n_used")
    corrected = F.when(
        (raw <= F.lit(2.5 * m)) & (v_empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_empty.cast("double")),
    ).otherwise(raw)
    exact = events.groupBy(F.col(group_col).alias("uuid")).agg(
        F.countDistinct(id_col).alias("n_exact")
    )
    return (
        exact.join(per_group, "uuid")
        .select(
            "uuid",
            "n_exact",
            F.col("n_used").alias("n_registers_used"),
            corrected.alias("hll_est"),
        )
        .orderBy("uuid")
    )


def bloom_audit(
    documents: DataFrame,
    m_bits: int = 256,
    k_hashes: int = 2,
    build_source: str = "src0",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Bloom-filter membership audit: build an (m_bits, k_hashes) filter
    over the ids of one source slice, probe EVERY id, and report per
    source the claimed-member count, the true members, the false
    positives, and the exact false-positive rate among true
    non-members — the defining one-sided guarantee (no false negatives)
    checked as data, not asserted.

    Deterministic salted-md5 bit positions, so the filter bitset — and
    every probe — is oracle-reproducible. Scale shape: the filter is a
    distinct (position) table of <= m_bits rows built from one pass over
    the build slice; probes expand to k rows each, join the position
    table BROADCAST, and claim membership iff all k positions hit
    (count = k). fp_rate = fp / non_members, one exact-int division.
    Columns: source, n_ids, claimed, true_members, false_positives,
    fp_rate."""
    if k_hashes < 1 or m_bits < 2:
        raise ValueError("need k_hashes >= 1, m_bits >= 2")
    ids = documents.select(
        F.col(source_col).alias("src"), F.col(id_col).cast("long").alias("id")
    )
    pos_of = lambda r: (  # noqa: E731
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"bloom{r}:"), F.col("id").cast("string"))),
                1, 12,
            ), 16, 10,
        ).cast("long") % F.lit(m_bits)
    )
    build = ids.where(F.col("src") == build_source)
    bits = reduce(
        DataFrame.unionAll,
        [build.select(pos_of(r).alias("pos")) for r in range(k_hashes)],
    ).distinct()
    probes = reduce(
        DataFrame.unionAll,
        [
            ids.select("src", "id", F.lit(r).alias("r"), pos_of(r).alias("pos"))
            for r in range(k_hashes)
        ],
    )
    hits = (
        probes.join(F.broadcast(bits), "pos", "left_semi")
        .groupBy("src", "id")
        .agg(F.count("*").alias("nhit"))
        .where(F.col("nhit") == k_hashes)
        .select("src", "id", F.lit(1).alias("claimed"))
    )
    flagged = ids.join(hits, ["src", "id"], "left").select(
        "src",
        "id",
        F.coalesce(F.col("claimed"), F.lit(0)).alias("claimed"),
        (F.col("src") == build_source).cast("int").alias("is_member"),
    )
    agg = flagged.groupBy(F.col("src").alias("source")).agg(
        F.count("*").alias("n_ids"),
        F.sum("claimed").alias("claimed"),
        F.sum("is_member").alias("true_members"),
        F.sum(
            ((F.col("claimed") == 1) & (F.col("is_member") == 0)).cast("long")
        ).alias("false_positives"),
    )
    non_members = F.col("n_ids") - F.col("true_members")
    return agg.select(
        "source",
        "n_ids",
        "claimed",
        "true_members",
        "false_positives",
        F.when(
            non_members > 0,
            F.col("false_positives").cast("double") / non_members.cast("double"),
        ).otherwise(F.lit(0.0)).alias("fp_rate"),
    ).orderBy("source")


def ams_f2(
    docs: DataFrame,
    d: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """AMS second-frequency-moment (self-join size / "surprise number")
    sketch over the whitespace-token stream, audited against the exact
    F2 = sum over tokens of cnt^2. Each of `d` estimators keeps one
    integer S_r = sum_tok s_r(tok)*cnt with s_r = +-1 from a salted md5
    bit; E[S_r^2] = F2. The reported estimate is the MEDIAN of the d
    squares — an ORDER STATISTIC of integers, so every emitted value is
    exact in any engine at any parallelism (no float path at all).

    Scale shape: one map-side-combined token count, then d conditional
    sums over the token-domain table (never a second corpus scan); the
    median picks from d rows on the driver-scale estimator table.
    Columns: f2_exact, f2_est_median, f2_est_mean, n_tokens_distinct,
    d."""
    if d < 1:
        raise ValueError("need d >= 1")
    counts = (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        # d estimators + the exact audit all read this table — without
        # the checkpoint each union branch re-explodes the corpus.
        .localCheckpoint(eager=False)
    )
    sign_of = lambda r: F.when(  # noqa: E731
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"ams{r}:"), F.col("tok"))), 1, 4),
            16, 10,
        ).cast("long") % 2 == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    est_rows = reduce(
        DataFrame.unionAll,
        [
            counts.select(
                F.lit(r).alias("r"), (sign_of(r) * F.col("cnt")).alias("term")
            )
            for r in range(d)
        ],
    )
    sq = (
        est_rows.groupBy("r")
        .agg(F.sum("term").alias("S"))
        .select((F.col("S") * F.col("S")).alias("sq"))
    )
    # exact median of d integers: lower median (element at ceil(d/2)-th
    # rank); the mean (the unbiased estimator) is one division of the
    # exact integer total.
    from pyspark.sql import Window as W

    med = (
        sq.withColumn("rn", F.row_number().over(W.orderBy("sq")))
        .groupBy()
        .agg(
            F.max(F.when(F.col("rn") == (d + 1) // 2, F.col("sq"))).alias(
                "f2_est_median"
            ),
            F.sum("sq").alias("sq_total"),
        )
    )
    exact = counts.agg(
        F.sum(F.col("cnt") * F.col("cnt")).alias("f2_exact"),
        F.count("*").alias("n_tokens_distinct"),
    )
    return exact.join(F.broadcast(med)).select(
        "f2_exact",
        "f2_est_median",
        (F.col("sq_total").cast("double") / F.lit(float(d))).alias(
            "f2_est_mean"
        ),
        "n_tokens_distinct",
        F.lit(d).cast("long").alias("d"),
    )


def kmv_set_ops(
    events: DataFrame,
    group_a: str = "click",
    group_b: str = "purchase",
    k: int = 256,
    group_col: str = "event_type",
    id_col: str = "user_id",
) -> DataFrame:
    """The defining KMV property — MERGEABILITY — demonstrated as set
    algebra between two groups' id sets: the union sketch is the k
    smallest of the two sketches' union (never touching raw ids again),
    |A u B| estimates from its k-th hash, the Jaccard estimate is the
    co-membership fraction inside the union sketch (the theta-sketch
    trick), and |A n B| = jaccard_est * union_est. Exact counts audited
    on the same row.

    Exactness: hashes are 52-bit md5 prefixes (double-exact), every
    estimate is one or two divisions of exact int64s; the co-membership
    count is an integer. Scale shape: two k-row sketches (built with
    the WindowGroupLimit prune of kmv_distinct), merged and re-trimmed
    at k rows — the union/intersection NEVER rescans ids; only the
    audit columns do. Columns: n_a, n_b, union_exact, union_est,
    inter_exact, inter_est, jaccard_exact, jaccard_est."""
    if k < 2:
        raise ValueError("need k >= 2")
    from pyspark.sql import Window as W

    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("kmv:"), F.col(id_col).cast("string"))), 1, 13
        ),
        16,
        10,
    ).cast("long")
    hashes = (
        events.where(F.col(group_col).isin(group_a, group_b))
        .select(F.col(group_col).alias("g"), h.alias("h"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    rn = F.row_number().over(W.partitionBy("g").orderBy("h"))
    sk = hashes.withColumn("rn", rn).where(F.col("rn") <= k).select("g", "h")
    # union sketch: k smallest distinct hashes of the merged sketches,
    # each tagged with which side(s) carry it (the theta co-membership).
    merged = (
        sk.groupBy("h")
        .agg(
            F.max((F.col("g") == group_a).cast("int")).alias("in_a"),
            F.max((F.col("g") == group_b).cast("int")).alias("in_b"),
        )
        .withColumn("urn", F.row_number().over(W.orderBy("h")))
        .where(F.col("urn") <= k)
    )
    usk = merged.agg(
        F.max("h").alias("kth"),
        F.count("*").alias("nk"),
        F.sum((F.col("in_a") + F.col("in_b") == 2).cast("long")).alias("both"),
    )
    est = lambda kth, nk: F.when(  # noqa: E731
        nk == k, F.lit(float((k - 1) * (1 << 52))) / kth.cast("double")
    ).otherwise(nk.cast("double"))
    exact = events.where(F.col(group_col).isin(group_a, group_b)).agg(
        F.countDistinct(
            F.when(F.col(group_col) == group_a, F.col(id_col))
        ).alias("n_a"),
        F.countDistinct(
            F.when(F.col(group_col) == group_b, F.col(id_col))
        ).alias("n_b"),
        F.countDistinct(id_col).alias("union_exact"),
    )
    jac = F.col("both").cast("double") / F.col("nk").cast("double")
    uest = est(F.col("kth"), F.col("nk"))
    return (
        exact.join(F.broadcast(usk))
        .select(
            "n_a",
            "n_b",
            "union_exact",
            uest.alias("union_est"),
            (F.col("n_a") + F.col("n_b") - F.col("union_exact")).alias(
                "inter_exact"
            ),
            (jac * uest).alias("inter_est"),
            (
                (F.col("n_a") + F.col("n_b") - F.col("union_exact")).cast(
                    "double"
                )
                / F.col("union_exact").cast("double")
            ).alias("jaccard_exact"),
            jac.alias("jaccard_est"),
        )
    )


def kmv_daily(
    events: DataFrame,
    k: int = 64,
    day_ns: int = 86_400_000_000_000,
    group_col: str = "event_type",
    id_col: str = "user_id",
    time_col: str = "time",
    start: int | None = None,
    end: int | None = None,
) -> DataFrame:
    """Windowed KMV: the distinct-id sketch PER (group, day) — the
    mergeable rollup shape ("distinct users per stream per day") where
    a day's sketch unions into weeks/months by merge-and-trim without
    rescanning ids. Audited against the exact per-window count on the
    same row.

    Same 52-bit md5-prefix hashes as kmv_distinct (double-exact, one
    division per estimate; windows under k distinct ids are served
    EXACTLY). Scale shape: one distinct on (group, day, hash)
    (map-side combined), a WindowGroupLimit rank prune at k rows per
    window, window-scale aggregates. Columns: uuid, day, n_exact,
    n_kept, kmv_est."""
    if k < 2:
        raise ValueError("need k >= 2")
    from pyspark.sql import Window as W

    t = F.col(time_col)
    src = events
    if start is not None:
        src = src.where(t >= start)
    if end is not None:
        src = src.where(t < end)
    origin = start if start is not None else 0
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("kmv:"), F.col(id_col).cast("string"))), 1, 13
        ),
        16,
        10,
    ).cast("long")
    hashes = (
        src.select(
            F.col(group_col).alias("uuid"),
            F.expr(f"({time_col} - ({origin})) div {day_ns}").alias("day"),
            h.alias("h"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    rn = F.row_number().over(W.partitionBy("uuid", "day").orderBy("h"))
    kept = (
        hashes.withColumn("rn", rn)
        .where(F.col("rn") <= k)
        .groupBy("uuid", "day")
        .agg(F.max("h").alias("kth"), F.count("*").alias("n_kept"))
    )
    exact = hashes.groupBy("uuid", "day").agg(
        F.count("*").alias("n_exact")
    )
    est = F.when(
        F.col("n_kept") == k,
        F.lit(float((k - 1) * (1 << 52))) / F.col("kth").cast("double"),
    ).otherwise(F.col("n_kept").cast("double"))
    return (
        exact.join(kept, ["uuid", "day"])
        .select("uuid", "day", "n_exact", "n_kept", est.alias("kmv_est"))
        .orderBy("uuid", "day")
    )
