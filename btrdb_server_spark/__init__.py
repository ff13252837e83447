"""btrdb_server_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of BTrDB (btrdb-server v4.15.9).

The reference (/root/reference) is a Go time-series database whose data plane
is (uuid, time:int64 ns, value:float64) points organized in a copy-on-write
64-ary time-partitioned tree. This package re-expresses every operator of that
system Spark-first: DataFrame/SQL declarative plans, Catalyst-optimized scans,
materialized rollup ladders instead of tree-internal aggregates, an MVCC
parquet store instead of COW tree generations, and Structured Streaming for
ingest. See SURVEY.md for the full operator inventory and file:line parity map.
"""

from btrdb_server_spark.constants import (
    KFACTOR,
    MAX_TIME,
    MIN_TIME,
    PWFACTOR,
    VSIZE,
)
from btrdb_server_spark.session import get_spark

__all__ = [
    "KFACTOR",
    "MAX_TIME",
    "MIN_TIME",
    "PWFACTOR",
    "VSIZE",
    "get_spark",
]
