"""Insert changefeed: committed store versions as a Structured Stream.

The reference's clients poll Changes/RawValues version diffs to follow a
stream (quasar.go:404-485 powers that sync loop); Spark's idiomatic
equivalent is a FILE-SOURCE subscription to the store itself. Every
committed insert lands as immutable parquet under the fresh sentinel
directory (`ins_ver={v}/uuid_bucket=-1`, store.py:212-226), so a
readStream over that glob IS a CDC feed of committed inserts: each new
version's files are discovered by the next micro-batch, exactly-once per
file via the checkpointed file log, no polling RPCs and no extra write
path — the WAL the ingest already writes is the feed.

Scope and caveats (by design, documented not hidden):

- changefeed() is INSERT-ONLY. Range deletes are tombstones in a
  separate dataset and compaction's rewritten history lands in real
  hash-bucket dirs — both invisible to the sentinel glob, so the feed
  never replays old data as fake inserts. Delete visibility is its own
  stream: changefeed_deletes() subscribes to the tombstone dataset with
  the same exactly-once file-log semantics (the reference's DeleteRange
  is just another versioned commit clients observe via Changes,
  quasar.go:487-520 / 404-485 — two feeds here because the two commit
  kinds live in two datasets).
- VALIDATED-ONLY: the insert path writes to a dot-prefixed staging dir
  (invisible to the glob) and renames into the sentinel path only after
  validation passes (store.py _write_version), so an aborted insert —
  whose version number the next insert reuses — never reaches the feed.
  A crash between that rename and the manifest write is cleaned by the
  store's recovery sweep (store.recover(): ins_ver dirs newer than the
  committed version are deleted, the version-fenced replay of
  pqm.go:160-186). The sweep runs automatically on WRITER opens only —
  a read-only open (PointStore(..., writer=False)) must not delete a
  live writer's in-flight version dir, so a reader process that starts
  a feed right after a crash calls store.recover() explicitly once it
  knows no writer is mid-commit. Only a feed already RUNNING at the
  instant of the crash can see the phantom dir.
- Compaction retires old generation dirs (store.py compact); files the
  feed has PROCESSED may vanish (harmless — the file log does not
  re-read). A lagging feed's tolerance is the retention knob:
  compact(generations_retained=N) keeps the newest N-1 superseded
  generations on disk, so the feed may lag up to N-2 FULL compaction
  intervals (default N=2 = the classic LSM-CDC contract: feed latency <
  compaction cadence; widen N to trade disk for lag tolerance).
- Rows carry `ins_ver` (the committing version) extracted from the file
  path — a consumer can resume the reference-style version protocol at
  any point.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _committed_version_fence(store):
    """Boolean pandas_udf `ins_ver <= committed manifest version`,
    re-reading the manifest at EXECUTION time — i.e. fresh on every
    micro-batch (an Arrow-batch file read of a <KB json on the shared
    store volume). This is what lets a RUNNING feed fence out a crashed
    writer's orphan dir: a static literal would freeze the version at
    stream start and filter out all later legitimate commits."""
    import json as _json

    from pyspark.sql.functions import pandas_udf

    manifest_path = store.manifest_path

    @pandas_udf("boolean")
    def _fence(ins_ver):
        with open(manifest_path) as f:
            v = int(_json.load(f)["version"])
        return ins_ver <= v

    return _fence


def changefeed(
    store,
    include_version: bool = True,
    max_files_per_trigger: Optional[int] = None,
    version_fence: bool = False,
) -> DataFrame:
    """Streaming DataFrame of committed inserts (uuid, time, value
    [, ins_ver]) across ALL streams of a PointStore. Filter by uuid for a
    per-stream subscription — the predicate pushes into the parquet scan,
    where the (uuid, time)-sorted files' row-group stats prune it (file-
    LEVEL pruning would need uuid in the path, which the sentinel layout
    deliberately avoids on the hot write path; store.py:212-226).

    `max_files_per_trigger`: bound micro-batch size (one committed version
    is >= 1 file); None processes everything available each trigger.

    `version_fence=True` closes the last documented phantom window for a
    feed RUNNING at the instant a writer crashes between _write_version's
    rename and the manifest commit: every micro-batch re-reads the
    committed manifest version (execution-time pandas_udf) and drops rows
    whose ins_ver exceeds it, so the orphan dir is never delivered — and
    once the recovery retry commits that version, the retry's own files
    deliver the rows exactly once. Residual: only a micro-batch that read
    the orphan's files while recovery + retry + commit ALL completed
    inside the same trigger can still pass them (orders of magnitude
    narrower than the unfenced contract). Off by default: the fence adds
    an Arrow-batched udf filter to an otherwise pure-JVM scan."""
    from btrdb_server_spark.store import FRESH_BUCKET

    glob = os.path.join(
        store.path, "points*", "ins_ver=*", f"uuid_bucket={FRESH_BUCKET}"
    )
    reader = store.spark.readStream.schema("uuid string, time long, value double")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(glob)
    if include_version or version_fence:
        # The sentinel glob defeats directory-partition discovery (the
        # generation dir between basePath and ins_ver= is not key=value),
        # so the committing version is recovered from the file path — via
        # the DETERMINISTIC hidden _metadata.file_path column, never
        # input_file_name(): a nondeterministic projection blocks filter
        # pushdown above it, which would turn every per-stream
        # subscription (.where(uuid = ...)) into a full scan of each
        # micro-batch (pinned by tests/test_plans.py).
        df = df.withColumn(
            "ins_ver",
            F.regexp_extract(
                F.col("_metadata.file_path"), r"ins_ver=(\d+)", 1
            ).cast("long"),
        )
    if version_fence:
        df = df.where(_committed_version_fence(store)(F.col("ins_ver")))
        if not include_version:
            df = df.drop("ins_ver")
    return df


def changefeed_deletes(
    store,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """Streaming DataFrame of committed range-delete tombstones
    (uuid, start, end, ver) of a PointStore — the delete half of the CDC
    story. Each delete_range/obliterate appends one immutable tombstone
    row-file under the store's deletes dataset (store.py:302-318), so a
    readStream over it delivers every delete exactly once via the
    checkpointed file log; `ver` is the committing major version carried
    IN the row, so a consumer can merge this feed with changefeed()'s
    ins_ver into one totally-ordered version history.

    Caveat (same LSM-CDC contract as the insert feed): compaction folds
    tombstones into the snapshot and clears the dataset
    (store.py:530-532) — a feed lagging more than one compaction can
    lose not-yet-processed tombstones. Operate with feed latency below
    the compaction cadence."""
    reader = store.spark.readStream.schema(
        "uuid string, start long, end long, ver long"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(store.deletes_path)
