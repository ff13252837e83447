from btrdb_server_spark.sources.testdata import (
    events_to_points,
    load_table,
    streams_from_events,
)

__all__ = ["events_to_points", "load_table", "streams_from_events"]
