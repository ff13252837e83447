"""Custom stateful streaming operator: incremental per-bucket statistics.

The reference accumulates (count, min, max, total) per window as tree
fragments stream through a query (WindowContext, qtree/qtree.go:810-818,
update/emit qtree.go:1033-1068) and folds the write buffer into window
stats on ingest (CreateStatWindows, merger.go:218-253). The streaming form
of that accumulator — a running StatPoint per (uuid, 2**pw bucket) updated
as points arrive, with arbitrarily late data folding in (ST2: no
watermark, nothing dropped) — needs keyed state Spark's built-in windowed
aggregation only offers with watermark-bound state eviction.

applyInPandasWithState gives exactly that: state keyed by (uuid, bucket)
holding the associative (min, sum, max, count) summary; every micro-batch
folds its Arrow-batched rows into the summary and emits the updated
StatPoint. State never expires (NoTimeout) — matching the reference, where
a bucket from years ago is still updatable; at 100 TB the state store
(RocksDB on executors) shards by the group key, so state size scales with
DISTINCT touched buckets, not points.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "uuid string, bucket long, vmin double, vmean double, vmax double, cnt long"
)
STATE_SCHEMA = "vmin double, vsum double, vmax double, cnt long"


def _update_bucket_stats(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's points for one (uuid, bucket) group into the
    running summary and emit the updated StatPoint. The merge is the
    associative combine of merger.go:132-214: min/min, max/max, sum+=,
    count+= (mean derived at emit)."""
    uuid, bucket = key
    if state.exists:
        vmin, vsum, vmax, cnt = state.get
    else:
        vmin, vsum, vmax, cnt = float("inf"), 0.0, float("-inf"), 0
    for pdf in pdfs:
        v = pdf["value"]
        if len(v) == 0:
            continue
        vmin = min(vmin, float(v.min()))
        vmax = max(vmax, float(v.max()))
        vsum += float(v.sum())
        cnt += int(len(v))
    if cnt == 0:
        return
    state.update((vmin, vsum, vmax, cnt))
    yield pd.DataFrame(
        {
            "uuid": [uuid],
            "bucket": [bucket],
            "vmin": [vmin],
            "vmean": [vsum / cnt],
            "vmax": [vmax],
            "cnt": [cnt],
        }
    )


def streaming_stat_windows(points_stream: DataFrame, pw: int) -> DataFrame:
    """Running AlignedWindows over a stream: one updated StatPoint per
    (uuid, 2**pw bucket) per micro-batch that touches it. Late points
    reopen their bucket exactly (no watermark drop)."""
    keyed = points_stream.withColumn(
        "bucket", F.shiftleft(F.shiftright("time", pw), pw)
    ).groupBy("uuid", "bucket")
    return keyed.applyInPandasWithState(
        _update_bucket_stats,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
