from btrdb_server_spark.operators.raw import raw_values, validate_points
from btrdb_server_spark.operators.stat import aligned_windows, windows
from btrdb_server_spark.operators.nearest import nearest, nearest_asof
from btrdb_server_spark.operators.changes import coalesce_intervals
from btrdb_server_spark.operators.align import align_streams

__all__ = [
    "raw_values",
    "validate_points",
    "aligned_windows",
    "windows",
    "nearest",
    "nearest_asof",
    "coalesce_intervals",
    "align_streams",
]
