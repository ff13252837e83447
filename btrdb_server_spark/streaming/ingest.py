"""Structured Streaming ingest — the write path (S1/S4/ST1-ST5).

Reference write path (pqm.go:516-631): inserts buffer per stream, journal
for durability, full commit at 32,768 points or 8 h age; Flush forces a
commit; queries at LatestGeneration merge the uncommitted buffer.

Spark-first mapping:
- micro-batching       = Structured Streaming triggers (ST1); the commit
  threshold becomes the trigger interval / maxFilesPerTrigger;
- journal + replay     = checkpointLocation WAL (S4, ST4 exactly-once);
- Flush                = processAllAvailable (serve.go:743-765);
- read-your-writes     = committed micro-batches are immediately visible
  (minor version ≙ batches since last manifest bump); the in-flight batch is
  not, a documented relaxation of ST5;
- arbitrarily late data (ST2) needs NO watermark: the sink is an append of
  immutable versioned files + an associative rollup merge, so a point from
  years ago lands in exactly the right buckets.

foreachBatch { validate -> append points version -> fold rollup ladder } is
the idiomatic Spark form of the reference's journal->tree->stats commit.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from btrdb_server_spark.operators.raw import validate_points
from btrdb_server_spark.plans.rollup import RollupLadder
from btrdb_server_spark.store import PointStore


class IngestPipeline:
    """Streaming (uuid, time, value) ingest into a PointStore (+ optional
    rollup ladder maintenance), with Flush semantics."""

    def __init__(
        self,
        store: PointStore,
        ladder: Optional[RollupLadder] = None,
        drop_invalid: bool = True,
        compact_every: Optional[int] = None,
    ):
        """`compact_every`: fold the store's fresh-version tail whenever N
        or more versions have committed since the last compaction. The
        cadence is derived from DURABLE state (store.version −
        store.compacted_through, both manifest-backed), not an in-process
        batch counter — a counter resets on pipeline restart and ticks for
        replayed already-committed batches, so it drifts from the number of
        versions actually accumulated. A long-running stream otherwise
        accumulates one sentinel (uuid_bucket=-1) version dir per batch,
        and the fresh tail cannot be bucket-pruned on read (measured ~4x
        single-stream read cost at 50 uncompacted versions — see
        store.FRESH_BUCKET). Compaction intentionally makes versions below
        the compaction point unaddressable, so this is OPT-IN: leave None
        when historical version reads matter more than read latency."""
        self.store = store
        self.ladder = ladder
        self.drop_invalid = drop_invalid
        self.compact_every = compact_every
        self.query: Optional[StreamingQuery] = None

    def _process_batch(self, batch: DataFrame, batch_id: int) -> None:
        if self.drop_invalid:
            batch = validate_points(batch)
        if batch.isEmpty():
            return
        # Idempotence (ST4): after a crash, foreachBatch replays the last
        # uncommitted batch id with identical data (checkpoint WAL). The
        # store records the id atomically with its version commit and skips
        # replays; each ladder level records the last id folded into it, so
        # a crash between the two (or mid-ladder) re-folds exactly the
        # levels that missed the batch — no double counts, no gaps.
        self.store.insert_many(batch, batch_id=batch_id)
        if self.ladder is not None:
            self.ladder.update_with_batch(batch, batch_id=batch_id)
        if self.compact_every and (
            self.store.version - self.store.compacted_through
        ) >= self.compact_every:
            # Replay-safe and restart-safe: both sides of the trigger are
            # manifest state, so a replayed batch (no new version) never
            # advances it and a restart resumes exactly where the tail
            # stands. Compacting is maintenance, not a commit — a crash
            # between insert and compact just defers the fold.
            self.store.compact()

    def start(
        self,
        source: DataFrame,
        checkpoint: str,
        trigger_seconds: Optional[float] = None,
    ) -> StreamingQuery:
        """`source` must be a streaming DataFrame with columns
        (uuid, time, value)."""
        writer = (
            source.writeStream.outputMode("append")
            .option("checkpointLocation", checkpoint)
            .foreachBatch(self._process_batch)
        )
        if trigger_seconds is not None:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        self.query = writer.start()
        return self.query

    def flush(self) -> int:
        """Process everything available (≙ Flush, serve.go:743-765); returns
        the store version after the flush."""
        assert self.query is not None, "pipeline not started"
        self.query.processAllAvailable()
        return self.store.version

    def stop(self) -> None:
        if self.query is not None:
            self.query.stop()
            self.query = None
