"""Event-plane operators over the raw events table (beyond the points
projection): JSON property extraction and per-entity activity pivots.

The reference's data plane is (time, value) only — everything else lives in
stream metadata. A modern ingest feed carries typed envelopes (entity ids,
JSON property bags); these operators show the engine consuming that
envelope natively: JSON scalar extraction stays in JVM expressions
(get_json_object — no Python), and the per-entity pivot is a conditional
aggregation with a FIXED category list, so the plan is one
map-side-combined groupBy (a dynamic pivot would need a distinct-scan
first and break plan determinism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def props_histogram(
    events: DataFrame,
    json_col: str = "props",
    field: str = "k",
    type_col: str = "event_type",
) -> DataFrame:
    """Distribution of a JSON property per event type: one row per
    (event_type, value-of-field) with its count — the cardinality /
    skew probe run before choosing a partition key for a new feed.
    Columns: event_type, k (extracted int), cnt. All-integer output,
    engine-exact; ordered by (event_type, k)."""
    k = F.get_json_object(F.col(json_col), f"$.{field}").cast("long")
    return (
        events.select(F.col(type_col).alias("event_type"), k.alias("k"))
        .where(F.col("k").isNotNull())
        .groupBy("event_type", "k")
        .agg(F.count("*").alias("cnt"))
        .orderBy("event_type", "k")
    )


def user_activity(
    events: DataFrame,
    types: tuple[str, ...] = ("click", "view", "purchase", "signup", "error"),
    value_quantum: float = 0.01,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user activity profile: event counts per type (fixed category
    list -> static conditional aggregation, one shuffle) plus the exact
    total value in quantum units. The feature row a personalization or
    abuse model consumes. Columns: user_id, n_<type>..., total_q (int64
    quantum units — exactly associative), n_events."""
    aggs = [
        F.coalesce(
            F.sum(F.when(F.col(type_col) == t, F.lit(1))), F.lit(0)
        ).alias(f"n_{t}")
        for t in types
    ]
    aggs.append(
        F.sum(F.round(F.col("value") / F.lit(value_quantum)).cast("long")).alias(
            "total_q"
        )
    )
    aggs.append(F.count("*").alias("n_events"))
    return (
        events.groupBy(F.col(user_col).alias("user_id"))
        .agg(*aggs)
        .orderBy("user_id")
    )
