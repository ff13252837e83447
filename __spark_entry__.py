"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query on sf0.001.
queries()     — one entry per implemented operator from SURVEY.md §2.
oracle_sql()  — DuckDB-equivalent SQL for each query (same column names).

The time-series plane maps the `events` table to points:
uuid = event_type, time = epoch ns truncated to µs (matches DuckDB
epoch_ns(ts) on the TIMESTAMP(NANOS) parquet), value = value.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from btrdb_server_spark.metadata import collections_of, filter_streams, usage_of
from btrdb_server_spark.operators.align import align_streams
from btrdb_server_spark.operators.changes import times_to_changed_ranges
from btrdb_server_spark.operators.nearest import nearest
from btrdb_server_spark.operators.raw import raw_values
from btrdb_server_spark.operators.stat import (
    aligned_windows,
    aligned_windows_all_streams,
    windows,
)
from btrdb_server_spark.sources.testdata import (
    load_points,
    load_table,
    streams_from_events,
)

# Time constants (UTC epoch ns). Testdata events span Jan 2024.
T_2024 = 1_704_067_200_000_000_000  # 2024-01-01
T_FEB = 1_706_745_600_000_000_000  # 2024-02-01
T_2025 = 1_735_689_600_000_000_000  # 2025-01-01
T_JAN10 = 1_704_844_800_000_000_000  # 2024-01-10
T_JAN15 = 1_705_276_800_000_000_000  # 2024-01-15
T_JAN20 = 1_705_708_800_000_000_000  # 2024-01-20
DAY_NS = 86_400_000_000_000

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

# DuckDB view of the points plane (µs-truncated ns — see sources/testdata.py).
PTS_CTE = (
    "WITH pts AS (SELECT event_type AS uuid, epoch_ns(ts) AS time, value FROM events)"
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-stream aligned statistical rollup over sf0.001."""
    pts = load_points(spark, "/root/testdata/sf0.001")
    return aligned_windows_all_streams(pts, T_2024, T_2025, 40).orderBy("uuid", "time")


# ---------------------------------------------------------------- queries ---


def q_raw_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = load_points(spark, sf_dir)
    return raw_values(pts, "click", T_2024, T_2025)


def q_aligned_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = load_points(spark, sf_dir)
    df = aligned_windows(pts, "click", T_2024, T_2025, 38)
    return df.select(
        "time",
        F.col("min").alias("vmin"),
        F.round("mean", 6).alias("vmean"),
        F.col("max").alias("vmax"),
        F.col("count").alias("cnt"),
    )


def q_windows_holes(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = load_points(spark, sf_dir)
    df = windows(pts, "view", T_2024, T_FEB, DAY_NS)
    return df.select(
        "time",
        F.col("min").alias("vmin"),
        F.round("mean", 6).alias("vmean"),
        F.col("max").alias("vmax"),
        F.col("count").alias("cnt"),
    )


def q_nearest_before(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = load_points(spark, sf_dir)
    return nearest(pts, "purchase", T_JAN15, backward=True)


def q_nearest_after(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = load_points(spark, sf_dir)
    return nearest(pts, "purchase", T_JAN15, backward=False)


def q_changed_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = load_points(spark, sf_dir)
    times = pts.where(F.col("uuid") == "error").select("time")
    return times_to_changed_ranges(times, 40)


def q_multistream_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = load_points(spark, sf_dir)
    return align_streams(pts, EVENT_TYPES, T_2024, T_2025, agg="max")


def q_delete_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeleteRange readback semantics (T1): points outside [Jan10, Jan20)."""
    pts = load_points(spark, sf_dir)
    deleted = pts.where(
        ~((F.col("time") >= T_JAN10) & (F.col("time") < T_JAN20))
    )
    return raw_values(deleted, "signup", T_2024, T_2025)


def q_list_collections(spark: SparkSession, sf_dir: str) -> DataFrame:
    streams = streams_from_events(load_table(spark, sf_dir, "events"))
    return collections_of(streams, prefix="events/", start_with="events/e", limit=100)


def q_lookup_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    streams = streams_from_events(load_table(spark, sf_dir, "events"))
    found = filter_streams(
        streams, collection="events/", tags={"kind": "click", "source": None}
    )
    return found.select("uuid", "collection").orderBy("uuid")


def q_metadata_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    streams = streams_from_events(load_table(spark, sf_dir, "events"))
    tag_usage, _ = usage_of(streams, prefix="events/")
    return tag_usage


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "raw_values": q_raw_values,
        "aligned_windows": q_aligned_windows,
        "windows_holes": q_windows_holes,
        "nearest_before": q_nearest_before,
        "nearest_after": q_nearest_after,
        "changed_ranges": q_changed_ranges,
        "multistream_align": q_multistream_align,
        "delete_range": q_delete_range,
        "list_collections": q_list_collections,
        "lookup_streams": q_lookup_streams,
        "metadata_usage": q_metadata_usage,
    }


# ----------------------------------------------------------------- oracle ---


def oracle_sql() -> dict[str, str]:
    stat_cols = (
        "min(value) AS vmin, round(avg(value), 6) AS vmean, "
        "max(value) AS vmax, count(*) AS cnt"
    )
    return {
        "raw_values": f"""
            {PTS_CTE}
            SELECT time, value FROM pts
            WHERE uuid = 'click' AND time >= {T_2024} AND time < {T_2025}
            ORDER BY time
        """,
        "aligned_windows": f"""
            {PTS_CTE}
            SELECT ((time >> 38) << 38) AS time, {stat_cols}
            FROM pts
            WHERE uuid = 'click' AND time >= {T_2024} AND time < {T_2025}
            GROUP BY 1 ORDER BY 1
        """,
        "windows_holes": f"""
            {PTS_CTE}, spine AS (
                SELECT range AS widx FROM range(0, {(T_FEB - T_2024) // DAY_NS})
            ), agg AS (
                SELECT (time - {T_2024}) // {DAY_NS} AS widx,
                       min(value) AS vmin, round(avg(value), 6) AS vmean,
                       max(value) AS vmax, count(*) AS cnt
                FROM pts
                WHERE uuid = 'view' AND time >= {T_2024} AND time < {T_FEB}
                GROUP BY 1
            )
            SELECT {T_2024} + spine.widx * {DAY_NS} AS time,
                   agg.vmin AS vmin, agg.vmean AS vmean, agg.vmax AS vmax,
                   coalesce(agg.cnt, 0) AS cnt
            FROM spine LEFT JOIN agg ON spine.widx = agg.widx
            ORDER BY time
        """,
        "nearest_before": f"""
            {PTS_CTE}
            SELECT time, value FROM pts
            WHERE uuid = 'purchase' AND time < {T_JAN15}
            ORDER BY time DESC LIMIT 1
        """,
        "nearest_after": f"""
            {PTS_CTE}
            SELECT time, value FROM pts
            WHERE uuid = 'purchase' AND time >= {T_JAN15}
            ORDER BY time ASC LIMIT 1
        """,
        "changed_ranges": f"""
            {PTS_CTE}, b AS (
                SELECT DISTINCT (time >> 40) AS bucket FROM pts WHERE uuid = 'error'
            ), iv AS (
                SELECT (bucket << 40) AS s, ((bucket + 1) << 40) AS e FROM b
            ), m AS (
                SELECT s, e,
                       CASE WHEN s > max(e) OVER (ORDER BY s ROWS BETWEEN
                            UNBOUNDED PRECEDING AND 1 PRECEDING)
                            THEN 1 ELSE 0 END AS is_gap
                FROM iv
            ), g AS (
                SELECT s, e, sum(is_gap) OVER (ORDER BY s ROWS BETWEEN
                       UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
                FROM m
            )
            SELECT min(s) AS start, max(e) AS "end" FROM g GROUP BY grp ORDER BY 1
        """,
        "multistream_align": f"""
            {PTS_CTE}
            SELECT time,
                   max(value) FILTER (WHERE uuid = 'click') AS click,
                   max(value) FILTER (WHERE uuid = 'error') AS error,
                   max(value) FILTER (WHERE uuid = 'purchase') AS purchase,
                   max(value) FILTER (WHERE uuid = 'signup') AS signup,
                   max(value) FILTER (WHERE uuid = 'view') AS view
            FROM pts WHERE time >= {T_2024} AND time < {T_2025}
            GROUP BY time ORDER BY time
        """,
        "delete_range": f"""
            {PTS_CTE}
            SELECT time, value FROM pts
            WHERE uuid = 'signup' AND time >= {T_2024} AND time < {T_2025}
              AND NOT (time >= {T_JAN10} AND time < {T_JAN20})
            ORDER BY time
        """,
        "list_collections": """
            SELECT DISTINCT 'events/' || event_type AS collection FROM events
            WHERE 'events/' || event_type >= 'events/e'
            ORDER BY collection LIMIT 100
        """,
        "lookup_streams": """
            SELECT DISTINCT event_type || '/' || user_id AS uuid,
                   'events/' || event_type AS collection
            FROM events WHERE event_type = 'click'
            ORDER BY uuid
        """,
        "metadata_usage": """
            WITH s AS (SELECT DISTINCT event_type, user_id FROM events)
            SELECT key, count(*) AS cnt
            FROM s, (SELECT unnest(['kind', 'source']) AS key)
            GROUP BY key ORDER BY key
        """,
    }
