"""Readers for the driver-generated testdata (TESTDATA.md).

The `events` table is the time-series source: each event_type is one stream
(uuid), `ts` (wall-clock µs) becomes int64 epoch nanoseconds, `value` is the
payload — the mapping
FIXTURES.md prescribes for benching the points plane. All conversions are
pure built-in column expressions so Catalyst keeps pushdown and codegen.

At 100 TB the same reader shape holds: parquet scan with column pruning
(only ts/value/event_type read), partition pruning on any uuid/time
partitioning of the lake, and no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Historical note: earlier driver testdata stored `events.ts` as parquet
    # TIMESTAMP(NANOS), readable only with nanosAsLong (→ ts as int64 ns).
    # Current testdata stores TIMESTAMP(MICROS, isAdjustedToUTC=false), which
    # Spark 4 reads as TIMESTAMP_NTZ regardless of that flag. events_to_points
    # handles every ts dtype it may encounter, so no session config is needed
    # here — externally built SparkSessions (the correctness harness) work
    # unmodified.
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# Epoch as a wall-clock NTZ literal: timestampdiff against it turns a
# TIMESTAMP_NTZ into epoch µs with NO session-timezone dependence (the same
# wall-clock arithmetic DuckDB's epoch_ns(ts) applies to the µs column).
_NTZ_EPOCH = "TIMESTAMP_NTZ'1970-01-01 00:00:00'"


def _ntz_lit(ns: int):
    """Epoch-ns bound → TIMESTAMP_NTZ literal (µs floor), parsed from a
    string so the conversion never consults the session timezone."""
    from datetime import datetime, timedelta

    dt = datetime(1970, 1, 1) + timedelta(microseconds=ns // 1000)
    return F.lit(dt.strftime("%Y-%m-%d %H:%M:%S.%f")).cast("timestamp_ntz")


def epoch_ns_expr(events: DataFrame, ts_col: str = "ts"):
    """Epoch-nanosecond Column for the events `ts`, matching DuckDB's
    epoch_ns(ts) bit-exactly and independent of the session timezone.
    The parquet stores TIMESTAMP(MICROS, not adjusted to UTC): Spark 4
    reads it as TIMESTAMP_NTZ; time = wall-clock µs × 1000. Legacy dtypes
    (int64 ns via nanosAsLong, tz-aware TimestampType) are still accepted
    for older lakes."""
    ts_type = dict(events.dtypes)[ts_col]
    if ts_type == "bigint":  # legacy nanosAsLong read: raw int64 ns
        return F.col(ts_col) - F.col(ts_col) % F.lit(1000)
    if ts_type == "timestamp_ntz":
        return (
            F.expr(f"timestampdiff(MICROSECOND, {_NTZ_EPOCH}, {ts_col})")
            * F.lit(1000)
        )
    # tz-aware TimestampType (µs instant) fallback
    return F.unix_micros(ts_col) * F.lit(1000)


def events_to_points(events: DataFrame) -> DataFrame:
    """Map the events table to the (uuid, time, value) points plane.

    uuid = event_type (one stream per source type), time = epoch nanoseconds
    of the wall-clock ts (see epoch_ns_expr — exactly DuckDB's epoch_ns(ts),
    keeping the oracle comparison exact and timezone-independent).
    """
    return events.select(
        F.col("event_type").alias("uuid"),
        epoch_ns_expr(events).alias("time"),
        F.col("value").alias("value"),
    )


def load_points(
    spark: SparkSession,
    sf_dir: str,
    start: int | None = None,
    end: int | None = None,
) -> DataFrame:
    """Points view of events. When a time range is known, pass it: the range
    is applied to the RAW ts column before the projection, so it reaches the
    parquet scan as a pushable predicate (row-group min/max skipping). The
    raw bounds are widened to whole µs (floor start, ceil end) — a superset;
    operators re-apply the exact predicate on `time`."""
    events = load_table(spark, sf_dir, "events")
    ts_type = dict(events.dtypes)["ts"]
    if ts_type == "bigint":
        if start is not None:
            events = events.where(F.col("ts") >= F.lit(start))
        if end is not None:
            events = events.where(F.col("ts") < F.lit(end + 1000))
    elif ts_type == "timestamp_ntz":
        if start is not None:
            events = events.where(F.col("ts") >= _ntz_lit(start))
        if end is not None:
            events = events.where(F.col("ts") < _ntz_lit(end + 999))
    return events_to_points(events)


def ensure_events_ladder(spark: SparkSession, sf_dir: str, levels=(32, 38)):
    """Idempotent per-sf rollup-ladder build over the events points plane
    (cached under /tmp): the materialized-view path for stat queries —
    build once offline, serve online from the hot <1% tier."""
    import os
    import re

    from btrdb_server_spark.plans.rollup import RollupLadder

    tag = re.sub(r"[^A-Za-z0-9.]+", "_", sf_dir.strip("/"))
    path = f"/tmp/btrdb_spark_ladder/{CACHE_TAG}/{tag}"
    # Testdata values are exact 2-decimal -> quantized ladder: rollup rows
    # carry the int64 vq sum, making depth-bounded means bit-deterministic
    # under any aggregation order (see RollupLadder.value_quantum).
    ladder = RollupLadder(spark, path, levels, value_quantum=0.01)
    marker = os.path.join(path, "_BUILT")
    if not os.path.exists(marker):
        ladder.rebuild(load_points(spark, sf_dir))
        with open(marker, "w") as f:
            f.write("ok")
    return ladder


T_JAN10 = 1_704_844_800_000_000_000
T_JAN20 = 1_705_708_800_000_000_000

# Bump when the ladder/store build semantics change: the tag is part of the
# /tmp cache path, so stale artifacts from older code can never be served.
CACHE_TAG = "v6"  # v6: LSM store layout (fresh versions in uuid_bucket=-1)


def ensure_events_store(spark: SparkSession, sf_dir: str):
    """Idempotent per-sf MVCC PointStore built from the events points plane
    (cached under /tmp): version 1 = bulk insert of every point, version 2 =
    range-delete of the signup stream over [Jan10, Jan20). Lets the driver
    validate the store's snapshot reads, tombstones, version travel, and
    version-diff against SQL oracles over the raw parquet."""
    import os
    import re

    from btrdb_server_spark.store import PointStore

    tag = re.sub(r"[^A-Za-z0-9.]+", "_", sf_dir.strip("/"))
    path = f"/tmp/btrdb_spark_store/{CACHE_TAG}/{tag}"
    marker = os.path.join(path, "_BUILT")
    store = PointStore(spark, path)
    if not os.path.exists(marker):
        store.insert_many(load_points(spark, sf_dir))          # -> version 1
        store.delete_range("signup", T_JAN10, T_JAN20)          # -> version 2
        with open(marker, "w") as f:
            f.write("ok")
    return store


def streams_from_events(events: DataFrame) -> DataFrame:
    """Derive a stream registry from the events table.

    One stream per (event_type, user_id): collection = 'events/<type>',
    tags = {source: 'u<user_id>'}. Gives a realistic registry (dozens of
    streams, hierarchical collections) for metadata-plane queries.
    """
    return (
        events.select("event_type", "user_id")
        .distinct()
        .select(
            F.concat(F.col("event_type"), F.lit("/"), F.col("user_id").cast("string")).alias(
                "uuid"
            ),
            F.concat(F.lit("events/"), F.col("event_type")).alias("collection"),
            F.create_map(
                F.lit("source"),
                F.concat(F.lit("u"), F.col("user_id").cast("string")),
                F.lit("kind"),
                F.col("event_type"),
            ).alias("tags"),
            F.create_map(F.lit("note"), F.concat(F.lit("n"), F.col("user_id").cast("string"))).alias(
                "annotations"
            ),
            F.lit(0).cast("long").alias("annotation_version"),
            F.lit(1).cast("long").alias("created_version"),
            F.lit(False).alias("tombstoned"),
        )
    )
