"""ML-preparation and data-governance operators over the event feed: the
feature-engineering and release-gating steps a training-data pipeline runs
after curation — k-anonymity auditing, leakage-free target encoding, the
hashing trick, and deterministic stratified splitting.

Same discipline as the rest of the repo: all-JVM column expressions, exact
integer counts/sums in quantum units, every emitted double ONE division of
exact int64s, deterministic md5-based hashing shared verbatim with the SQL
oracles. Scale shapes noted per operator; nothing here touches a
point-scale sort or a Python row UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity(
    events: DataFrame,
    k: int = 5,
    user_buckets: int = 50,
    time_col: str = "time",
    type_col: str = "event_type",
    user_col: str = "user_id",
) -> DataFrame:
    """k-anonymity audit of the event feed under the quasi-identifier
    tuple (event_type, hour-of-day, user-id bucket): per event type, the
    number of quasi-id groups, the smallest group (k_min — the headline
    re-identification risk), and how many rows sit in groups below `k`.
    The release gate a privacy review reads before an event dataset
    ships.

    Exactness: group sizes are integers; share_small is ONE division.
    Scale shape: one map-side-combined groupBy to quasi-id group sizes
    (group-domain scale), one rollup per type. `time_col` is int64
    epoch ns. Columns: event_type, n_rows, n_groups, k_min,
    rows_below_k, share_below_k."""
    if k < 2 or user_buckets < 1:
        raise ValueError("need k >= 2 and user_buckets >= 1")
    hour = F.expr(f"({time_col} div 3600000000000) % 24")
    ub = F.col(user_col) % F.lit(user_buckets)
    groups = (
        events.select(
            F.col(type_col).alias("event_type"),
            hour.alias("hod"),
            ub.alias("ub"),
        )
        .groupBy("event_type", "hod", "ub")
        .agg(F.count("*").alias("gsz"))
    )
    return (
        groups.groupBy("event_type")
        .agg(
            F.sum("gsz").alias("n_rows"),
            F.count("*").alias("n_groups"),
            F.min("gsz").alias("k_min"),
            F.sum(F.when(F.col("gsz") < k, F.col("gsz")).otherwise(F.lit(0))).alias(
                "rows_below_k"
            ),
        )
        .select(
            "event_type",
            "n_rows",
            "n_groups",
            "k_min",
            "rows_below_k",
            (
                F.col("rows_below_k").cast("double")
                / F.col("n_rows").cast("double")
            ).alias("share_below_k"),
        )
        .orderBy("event_type")
    )


def target_encode(
    events: DataFrame,
    value_quantum: float = 0.01,
    type_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Leakage-free leave-one-out target encoding of the categorical
    `type_col` against the numeric target: each row's encoding is the
    mean target of its category EXCLUDING the row itself,
    (S_c - v_i) / (n_c - 1) — the standard trick that lets a model use
    a high-cardinality category without leaking the row's own label.

    Exactness: category sums are exact int64 in quantum units; every
    encoding is ONE division of exact integers. Scale shape: one
    map-side-combined category aggregate (category-domain scale,
    broadcast back) and one map pass — the feed is scanned once.
    Columns: event_id, event_type, value, loo_enc (null for singleton
    categories — no peer to borrow from)."""
    q = round(1.0 / value_quantum)
    vq = F.round(F.col(value_col) / F.lit(value_quantum)).cast("long")
    src = events.select(
        F.col(id_col).alias("event_id"),
        F.col(type_col).alias("event_type"),
        vq.alias("vq"),
    )
    cat = src.groupBy("event_type").agg(
        F.sum("vq").alias("S"), F.count("*").alias("n")
    )
    enc = (
        (F.col("S") - F.col("vq")).cast("double")
        / (F.col("n") - F.lit(1)).cast("double")
    ) / F.lit(float(q))
    return (
        src.join(F.broadcast(cat), "event_type")
        .select(
            "event_id",
            "event_type",
            (F.col("vq").cast("double") / F.lit(float(q))).alias("value"),
            F.when(F.col("n") > 1, enc).alias("loo_enc"),
        )
        .orderBy("event_id")
    )


def hashed_features(
    events: DataFrame,
    n_buckets: int = 8,
    time_col: str = "time",
    type_col: str = "event_type",
    user_col: str = "user_id",
) -> DataFrame:
    """The hashing trick as a per-user feature row: every event maps to
    md5(type || ':' || hour-of-day) % n_buckets and the user's row
    counts events per hashed bucket — the fixed-width representation
    that absorbs unbounded categorical domains without a vocabulary.

    All-integer output. Scale shape: one map-side-combined
    groupBy(user) with a STATIC conditional-sum list (no pivot scan of
    distinct values — the bucket domain is fixed by construction).
    Columns: user_id, f0..f{n-1}, n_events."""
    if n_buckets < 2:
        raise ValueError("need n_buckets >= 2")
    hour = F.expr(f"({time_col} div 3600000000000) % 24")
    b = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col(type_col), F.lit(":"), hour.cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % F.lit(n_buckets)
    )
    src = events.select(F.col(user_col).alias("user_id"), b.alias("b"))
    aggs = [
        F.sum((F.col("b") == i).cast("long")).alias(f"f{i}")
        for i in range(n_buckets)
    ]
    aggs.append(F.count("*").alias("n_events"))
    return src.groupBy("user_id").agg(*aggs).orderBy("user_id")


def split_report(
    events: DataFrame,
    weights: tuple[int, int, int] = (8, 1, 1),
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Deterministic USER-level train/val/test assignment (every event of
    a user lands in the same split — the grouping that prevents
    same-user leakage across splits) with the stratification report:
    per (split, event_type) row counts, user counts, and the within-type
    share. split = md5('split:' || user) % (w_tr + w_va + w_te) against
    cumulative weight boundaries.

    All-integer counts; shares are single divisions. Scale shape: the
    split key is a pure map expression; one map-side-combined groupBy
    (split x type domain) plus one type-total broadcast. Columns:
    split, event_type, n_rows, n_users, type_share."""
    if len(weights) != 3 or any(w < 0 for w in weights) or sum(weights) < 1:
        raise ValueError("need three non-negative weights summing >= 1")
    tot = sum(weights)
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split:"), F.col(user_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % F.lit(tot)
    )
    split = (
        F.when(h < weights[0], F.lit("train"))
        .when(h < weights[0] + weights[1], F.lit("val"))
        .otherwise(F.lit("test"))
    )
    src = events.select(
        split.alias("split"),
        F.col(type_col).alias("event_type"),
        F.col(user_col).alias("uid"),
    )
    per = src.groupBy("split", "event_type").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("uid").alias("n_users"),
    )
    tot_type = src.groupBy("event_type").agg(F.count("*").alias("type_rows"))
    return (
        per.join(F.broadcast(tot_type), "event_type")
        .select(
            "split",
            "event_type",
            "n_rows",
            "n_users",
            (
                F.col("n_rows").cast("double")
                / F.col("type_rows").cast("double")
            ).alias("type_share"),
        )
        .orderBy("split", "event_type")
    )
