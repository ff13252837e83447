"""Fixed schemas of the engine's data plane and metadata plane.

The reference's only payload type is {Time int64 ns, Val float64}
(qtree/qtree_utils.go:42-45); stream metadata is string maps
(internal/mprovider/metaprovider.go:24-61). Times stay raw int64 nanoseconds —
never TimestampType, whose microsecond precision would lose the ns domain
[-(16<<56), 48<<56) (quasar.go:42-43).
"""

from pyspark.sql import types as T

# One logical `points` table holds every stream, keyed by uuid
# (reference: one qtree per uuid; here: one DataFrame partitioned by uuid).
POINTS_SCHEMA = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("time", T.LongType(), False),
        T.StructField("value", T.DoubleType(), False),
    ]
)

# MVCC variant used by the versioned store: a row is visible at version v iff
# ins_ver <= v < del_ver (del_ver = LONG_MAX while live). This replaces the
# reference's COW tree generations (internal/bstore/blocktypes.go:18-23).
MVCC_POINTS_SCHEMA = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("time", T.LongType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("ins_ver", T.LongType(), False),
        T.StructField("del_ver", T.LongType(), False),
    ]
)

# StatPoint result shape (qtree/qtree.go:802-808, btrdb.proto:214-220).
STAT_SCHEMA = T.StructType(
    [
        T.StructField("time", T.LongType(), False),  # bucket start
        T.StructField("min", T.DoubleType(), True),
        T.StructField("mean", T.DoubleType(), True),
        T.StructField("max", T.DoubleType(), True),
        T.StructField("count", T.LongType(), False),
    ]
)

# Stream registry (internal/mprovider/metaprovider.go:55-61).
STREAMS_SCHEMA = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("collection", T.StringType(), False),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("annotations", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("annotation_version", T.LongType(), False),
        T.StructField("created_version", T.LongType(), False),
        T.StructField("tombstoned", T.BooleanType(), False),
    ]
)

# ChangedRange result (qtree/qtree.go:59-63).
CHANGED_RANGE_SCHEMA = T.StructType(
    [
        T.StructField("start", T.LongType(), False),
        T.StructField("end", T.LongType(), False),
    ]
)
