"""Stream registry — the metadata plane (Create / StreamInfo /
SetStreamAnnotations / ListCollections / LookupStreams / GetMetadataUsage /
Obliterate).

Reference: internal/mprovider/metaprovider.go (etcd-backed). Semantics kept:
- Tags are immutable identity: (collection, tags) must be unique among live
  streams (metaprovider.go:86-99,294-300); annotations are mutable with CAS
  on annotation_version (metaprovider.go:148-199).
- Key/value validation regexes and size caps (metaprovider.go:24-53).
- Obliterate tombstones the uuid forever — never reusable
  (metaprovider.go:296-326,339-427).
- LookupStreams filters: collection exact or prefix; tag/annotation k=v
  equality, or presence when value is None (the leapfrog intersection,
  lookup.go:215-298) — here a conjunctive map-lookup filter, which Spark
  evaluates without any join.
- ListCollections: prefix + keyset pagination, limit <= 10,000
  (metaprovider.go:429-457).

The registry itself is etcd-scale (the reference stores it in etcd); the
durable state mirrors etcd's log+snapshot design (the raft WAL behind
metaprovider.go's CAS semantics): every single mutation is an O(1) fsync'd
append to a JSONL mutation log, and the log is compacted into an atomic
parquet snapshot (pyarrow write + os.replace) every COMPACT_EVERY records,
on bulk loads, and on close(). A restarted process replays the log over the
snapshot, so it sees exactly the committed registry — including permanent
obliterate tombstones — even after a crash mid-burst. At millions of
streams a mutation costs one appended line, never an O(N) rewrite.
Uniqueness of (collection, tags) is an O(1) hash-index lookup, not a scan.
Bulk registration goes through create_many(), whose conflict checks are
DataFrame joins — the path that holds at millions of streams. All read ops
are DataFrame plans: the snapshot scan plus a broadcast anti-join overlay
of the (bounded, log-sized) uncompacted mutations — broadcastable for
joins against the 100 TB points plane.
"""

from __future__ import annotations

import os
import re
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from btrdb_server_spark.constants import (
    ERR_ANN_VERSION_MISMATCH,
    ERR_BAD_TAG_KEY,
    ERR_BAD_TAG_VALUE,
    ERR_BAD_LIMIT,
    ERR_NO_SUCH_STREAM,
    ERR_STREAM_EXISTS,
    KEY_REGEX,
    MAX_ANNOTATIONS,
    MAX_COLLECTION_LEN,
    MAX_KEY_LEN,
    MAX_LIST_COLLECTIONS_LIMIT,
    MAX_TAGS,
    MAX_VAL_LEN,
)
from btrdb_server_spark.schemas import STREAMS_SCHEMA
from btrdb_server_spark.store import BTrDBError

_KEY_RE = re.compile(KEY_REGEX)


def _validate_kv(kv: dict, max_entries: int, what: str) -> None:
    if len(kv) > max_entries:
        raise BTrDBError(ERR_BAD_TAG_KEY, f"too many {what} ({len(kv)} > {max_entries})")
    for k, v in kv.items():
        if not _KEY_RE.match(k) or len(k) > MAX_KEY_LEN:
            raise BTrDBError(ERR_BAD_TAG_KEY, f"invalid {what} key {k!r}")
        if v is not None and len(v) > MAX_VAL_LEN:
            raise BTrDBError(ERR_BAD_TAG_VALUE, f"invalid {what} value for {k!r}")


def filter_streams(
    df: DataFrame,
    collection: str = "",
    is_collection_prefix: bool = True,
    tags: Optional[dict] = None,
    annotations: Optional[dict] = None,
) -> DataFrame:
    """LookupStreams predicate as a pure DataFrame transform — AND of
    collection (exact/prefix) and tag/annotation equality or presence
    (None value). The leapfrog-merge intersection (lookup.go:215-298)
    collapses to conjunctive map lookups: no join, fully pushdown-able."""
    if collection:
        if is_collection_prefix:
            df = df.where(F.col("collection").startswith(collection))
        else:
            df = df.where(F.col("collection") == collection)
    for colname, kv in (("tags", tags), ("annotations", annotations)):
        for k, v in (kv or {}).items():
            if v is None:
                df = df.where(F.map_contains_key(F.col(colname), F.lit(k)))
            else:
                df = df.where(F.element_at(F.col(colname), F.lit(k)) == F.lit(v))
    return df


def collections_of(
    df: DataFrame, prefix: str = "", start_with: str = "", limit: int = 1000
) -> DataFrame:
    """ListCollections: distinct collections with prefix, keyset pagination
    (metaprovider.go:429-457)."""
    out = df.select("collection").distinct()
    if prefix:
        out = out.where(F.col("collection").startswith(prefix))
    if start_with:
        out = out.where(F.col("collection") >= start_with)
    return out.orderBy("collection").limit(limit)


def usage_of(df: DataFrame, prefix: str = "") -> tuple[DataFrame, DataFrame]:
    """GetMetadataUsage: tag-key and annotation-key stream counts under a
    collection prefix (keyusage.go:20-78)."""
    if prefix:
        df = df.where(F.col("collection").startswith(prefix))
    tag_usage = (
        df.select(F.explode(F.map_keys("tags")).alias("key"))
        .groupBy("key")
        .agg(F.count("*").alias("cnt"))
        .orderBy("key")
    )
    ann_usage = (
        df.select(F.explode(F.map_keys("annotations")).alias("key"))
        .groupBy("key")
        .agg(F.count("*").alias("cnt"))
        .orderBy("key")
    )
    return tag_usage, ann_usage


def _identity_key(collection: str, tags: dict) -> tuple:
    return (collection, tuple(sorted(tags.items())))


class StreamRegistry:
    # Compact the mutation log into the snapshot after this many appended
    # records. Bounds both replay time on open and the driver-side overlay
    # the read path unions in.
    COMPACT_EVERY = 1024

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        # Snapshot is a single parquet FILE (pyarrow-written, atomically
        # replaced); `streams` (a Spark-written dir) is the legacy layout.
        # `mutations.jsonl` is the append-only log of post-snapshot
        # mutations (etcd's log+snapshot shape).
        self.parquet_path = os.path.join(path, "streams.parquet")
        self._legacy_path = os.path.join(path, "streams")
        self._log_path = os.path.join(path, "mutations.jsonl")
        os.makedirs(path, exist_ok=True)
        self._rows: dict[str, dict] = {}
        # (collection, sorted tags) -> uuid of the LIVE stream holding that
        # identity (metaprovider.go:294-300 uniqueness among live streams).
        self._identity: dict[tuple, str] = {}
        # uuid -> latest post-snapshot row state (the read-path overlay);
        # bounded by COMPACT_EVERY distinct uuids between compactions.
        self._overlay: dict[str, dict] = {}
        self._log_count = 0
        self._df: Optional[DataFrame] = None
        load_from = None
        if os.path.exists(self.parquet_path):
            load_from = self.parquet_path
        elif os.path.exists(self._legacy_path):
            load_from = self._legacy_path
        if load_from is not None:
            import pyarrow.parquet as pq

            for r in pq.read_table(load_from).to_pylist():
                r["tags"] = dict(r["tags"] or [])
                r["annotations"] = dict(r["annotations"] or [])
                self._rows[r["uuid"]] = r
        self._replay_log()
        for r in self._rows.values():
            if not r["tombstoned"]:
                self._identity[_identity_key(r["collection"], r["tags"])] = r["uuid"]

    # ----------------------------------------------------------- mutations --

    def _replay_log(self) -> None:
        """Fold the mutation log (if any) over the snapshot state. A torn
        final line from a crash mid-append is skipped — it was never
        acknowledged."""
        import json

        if not os.path.exists(self._log_path):
            return
        with open(self._log_path, "r", encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    r = json.loads(line)
                except ValueError:
                    continue  # torn tail write: unacknowledged, drop
                self._rows[r["uuid"]] = r
                self._overlay[r["uuid"]] = r
                self._log_count += 1

    def _append_mutation(self, row: dict) -> None:
        """O(1) durable mutation: one fsync'd JSONL append holding the full
        post-mutation row (latest record per uuid wins on replay). This is
        the etcd-WAL equivalent of metaprovider.go's per-key puts — at
        millions of streams an annotation CAS writes one line, not the
        registry."""
        import json

        with open(self._log_path, "a", encoding="utf-8") as f:
            f.write(json.dumps(row, separators=(",", ":")) + "\n")
            f.flush()
            os.fsync(f.fileno())
        self._overlay[row["uuid"]] = row
        self._log_count += 1
        self._df = None
        if self._log_count >= self.COMPACT_EVERY:
            self.compact()

    def compact(self) -> None:
        """Fold the log into a fresh atomic snapshot and truncate it —
        etcd's periodic snapshot. Runs automatically every COMPACT_EVERY
        mutations, after bulk loads, and from close()."""
        self._persist()
        if os.path.exists(self._log_path):
            os.remove(self._log_path)
        self._overlay = {}
        self._log_count = 0

    def close(self) -> None:
        if self._log_count:
            self.compact()

    def _persist(self) -> None:
        """Atomically rewrite the snapshot: pyarrow write to a tmp file +
        os.replace. Milliseconds at etcd scale, and crash-safe — readers see
        either the old or the new complete snapshot, never a partial one.
        Mutation-path callers go through _append_mutation instead; this runs
        on compaction and bulk loads only."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = list(self._rows.values())
        table = pa.table(
            {
                "uuid": [r["uuid"] for r in rows],
                "collection": [r["collection"] for r in rows],
                "tags": [sorted(r["tags"].items()) for r in rows],
                "annotations": [sorted(r["annotations"].items()) for r in rows],
                "annotation_version": [r["annotation_version"] for r in rows],
                "created_version": [r["created_version"] for r in rows],
                "tombstoned": [r["tombstoned"] for r in rows],
            },
            schema=pa.schema(
                [
                    ("uuid", pa.string()),
                    ("collection", pa.string()),
                    ("tags", pa.map_(pa.string(), pa.string())),
                    ("annotations", pa.map_(pa.string(), pa.string())),
                    ("annotation_version", pa.int64()),
                    ("created_version", pa.int64()),
                    ("tombstoned", pa.bool_()),
                ]
            ),
        )
        tmp = self.parquet_path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, self.parquet_path)
        self._df = None

    def create(
        self,
        uuid: str,
        collection: str,
        tags: Optional[dict] = None,
        annotations: Optional[dict] = None,
    ) -> None:
        tags = dict(tags or {})
        annotations = dict(annotations or {})
        if not collection or len(collection) > MAX_COLLECTION_LEN or "\x00" in collection:
            raise BTrDBError(ERR_BAD_TAG_VALUE, "invalid collection")
        _validate_kv(tags, MAX_TAGS, "tag")
        _validate_kv(annotations, MAX_ANNOTATIONS, "annotation")
        existing = self._rows.get(uuid)
        if existing is not None:
            # uuid exists or was obliterated — never reusable
            # (metaprovider.go:296-326).
            raise BTrDBError(ERR_STREAM_EXISTS, "uuid exists (or is tombstoned)")
        if _identity_key(collection, tags) in self._identity:
            raise BTrDBError(
                ERR_STREAM_EXISTS, "a stream with this collection+tags exists"
            )  # metaprovider.go:294-300
        row = dict(
            uuid=uuid,
            collection=collection,
            tags=tags,
            annotations=annotations,
            annotation_version=1,
            created_version=1,
            tombstoned=False,
        )
        self._rows[uuid] = row
        self._identity[_identity_key(collection, tags)] = uuid
        self._append_mutation(row)

    def create_many(self, streams: DataFrame) -> int:
        """Bulk registration — the path that holds at millions of streams.

        `streams` needs columns (uuid, collection, tags); optional
        annotations. All conflict checks run as DataFrame plans against the
        current snapshot (joins, not a driver loop): duplicate uuids within
        the batch, uuids already registered or tombstoned, and live
        (collection, tags)-identity collisions — the same invariants
        create() enforces one at a time (metaprovider.go:86-99,294-326).
        Returns the number of streams registered."""
        cols = set(streams.columns)
        if not {"uuid", "collection", "tags"} <= cols:
            raise BTrDBError(ERR_BAD_TAG_KEY, "need uuid, collection, tags columns")
        new = streams.select(
            "uuid",
            "collection",
            F.col("tags"),
            (
                F.col("annotations")
                if "annotations" in cols
                else F.create_map().cast("map<string,string>").alias("annotations")
            ),
        )
        ident = F.to_json(F.array_sort(F.map_entries("tags"))).alias("_ident")

        bad = new.where(
            F.col("collection").isNull()
            | (F.length("collection") == 0)
            | (F.length("collection") > MAX_COLLECTION_LEN)
            | F.col("collection").contains("\x00")
            | (F.size("tags") > MAX_TAGS)
            | ~F.forall(
                F.map_keys("tags"),
                lambda k: k.rlike(KEY_REGEX) & (F.length(k) <= MAX_KEY_LEN),
            )
            | ~F.forall(F.map_values("tags"), lambda v: F.length(v) <= MAX_VAL_LEN)
        )
        if bad.limit(1).count():
            raise BTrDBError(ERR_BAD_TAG_VALUE, "invalid collection or tags in batch")

        with_ident = new.select("*", ident)
        intra = (
            with_ident.groupBy("uuid")
            .count()
            .where(F.col("count") > 1)
            .unionByName(
                with_ident.groupBy(F.col("collection").alias("uuid"), "_ident")
                .count()
                .where(F.col("count") > 1)
                .drop("_ident")
            )
        )
        if intra.limit(1).count():
            raise BTrDBError(ERR_STREAM_EXISTS, "duplicate uuid or identity in batch")

        cur = self.df()
        if cur.limit(1).count():
            uuid_clash = new.join(cur.select("uuid"), "uuid", "left_semi")
            ident_clash = with_ident.join(
                cur.where(~F.col("tombstoned")).select("collection", ident),
                ["collection", "_ident"],
                "left_semi",
            )
            if uuid_clash.limit(1).count() or ident_clash.limit(1).count():
                raise BTrDBError(
                    ERR_STREAM_EXISTS, "uuid or collection+tags already registered"
                )

        added = 0
        for r in new.toArrow().to_pylist():
            tags = dict(r["tags"] or [])
            anns = dict(r["annotations"] or [])
            self._rows[r["uuid"]] = dict(
                uuid=r["uuid"],
                collection=r["collection"],
                tags=tags,
                annotations=anns,
                annotation_version=1,
                created_version=1,
                tombstoned=False,
            )
            self._identity[_identity_key(r["collection"], tags)] = r["uuid"]
            added += 1
        # Bulk loads fold everything into one fresh snapshot (one O(N) write
        # for N registrations) and clear any outstanding log.
        self.compact()
        return added

    def set_annotations(
        self, uuid: str, expected_version: int, changes: dict[str, Optional[str]]
    ) -> int:
        """CAS update (serve.go:389-420): None value removes the key; returns
        the new annotation_version."""
        r = self._live(uuid)
        if expected_version != 0 and r["annotation_version"] != expected_version:
            raise BTrDBError(ERR_ANN_VERSION_MISMATCH, "annotation version mismatch")
        _validate_kv({k: v for k, v in changes.items()}, MAX_ANNOTATIONS, "annotation")
        ann = dict(r["annotations"])
        for k, v in changes.items():
            if v is None:
                ann.pop(k, None)
            else:
                ann[k] = v
        if len(ann) > MAX_ANNOTATIONS:
            raise BTrDBError(ERR_BAD_TAG_KEY, "too many annotations")
        r["annotations"] = ann
        r["annotation_version"] += 1
        self._append_mutation(r)
        return r["annotation_version"]

    def obliterate(self, uuid: str) -> None:
        r = self._live(uuid)
        r["tombstoned"] = True
        # the identity becomes reusable (uniqueness is among live streams);
        # the uuid never does (the tombstoned row stays forever).
        self._identity.pop(_identity_key(r["collection"], r["tags"]), None)
        self._append_mutation(r)

    # --------------------------------------------------------------- reads --

    def _live(self, uuid: str) -> dict:
        r = self._rows.get(uuid)
        if r is None or r["tombstoned"]:
            raise BTrDBError(ERR_NO_SUCH_STREAM, f"no such stream {uuid}")
        return r

    def df(self) -> DataFrame:
        """The registry as a DataFrame (live + tombstoned rows): the parquet
        snapshot scan — not materialized from driver memory, so the plan
        holds however large the registry grows — plus, when uncompacted
        mutations exist, a broadcast anti-join overlay of the (bounded,
        <= COMPACT_EVERY rows) log state: snapshot rows whose uuid was
        mutated since the snapshot are replaced by their log row."""
        if self._df is None:
            if os.path.exists(self.parquet_path):
                snap = self.spark.read.schema(STREAMS_SCHEMA).parquet(
                    self.parquet_path
                )
            elif os.path.exists(self._legacy_path):
                snap = self.spark.read.schema(STREAMS_SCHEMA).parquet(
                    self._legacy_path
                )
            else:
                snap = self.spark.createDataFrame([], STREAMS_SCHEMA)
            if self._overlay:
                over = self.spark.createDataFrame(
                    [
                        (
                            r["uuid"],
                            r["collection"],
                            dict(r["tags"]),
                            dict(r["annotations"]),
                            r["annotation_version"],
                            r["created_version"],
                            r["tombstoned"],
                        )
                        for r in self._overlay.values()
                    ],
                    STREAMS_SCHEMA,
                )
                snap = snap.join(
                    F.broadcast(over.select("uuid")), "uuid", "left_anti"
                ).unionByName(over)
            self._df = snap
        return self._df

    def live_df(self) -> DataFrame:
        return self.df().where(~F.col("tombstoned"))

    def stream_info(self, uuid: str) -> dict:
        return dict(self._live(uuid))

    def list_collections(
        self, prefix: str = "", start_with: str = "", limit: int = 1000
    ) -> DataFrame:
        """Distinct collections with `prefix`, keyset-paginated from
        `start_with` (metaprovider.go:429-457, quasar.go:605-607)."""
        if not 0 < limit <= MAX_LIST_COLLECTIONS_LIMIT:
            raise BTrDBError(ERR_BAD_LIMIT, "invalid limit")
        return collections_of(self.live_df(), prefix, start_with, limit)

    def lookup_streams(
        self,
        collection: str = "",
        is_collection_prefix: bool = True,
        tags: Optional[dict[str, Optional[str]]] = None,
        annotations: Optional[dict[str, Optional[str]]] = None,
    ) -> DataFrame:
        """Streams matching ALL predicates (serve.go:516-601)."""
        return filter_streams(
            self.live_df(), collection, is_collection_prefix, tags, annotations
        )

    def metadata_usage(self, prefix: str = "") -> tuple[DataFrame, DataFrame]:
        """(tag_usage, annotation_usage): key -> stream count under a
        collection prefix (keyusage.go:20-78)."""
        return usage_of(self.live_df(), prefix)


def collection_tree(streams) -> "DataFrame":
    """Hierarchy rollup over the collection NAMESPACE: collections are
    hierarchical by convention (prefix-searchable, '/'-delimited —
    metaprovider.go:429-457 ListCollections), and this emits one row
    per path prefix with the number of streams and distinct child
    collections beneath it — the tree browser's one-query payload (the
    reference walks prefixes per request; here the whole tree is one
    pass).

    All-integer; deterministic. Scale shape: each stream explodes to
    depth-many prefix rows (depth is small by convention), one
    map-side-combined groupBy(prefix) with a distinct-collection count.
    Columns: prefix, depth, n_streams, n_collections."""
    from pyspark.sql import functions as F

    parts = F.split(F.col("collection"), "/")
    prefixes = F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.array_join(F.slice(parts, 1, i), "/"),
    )
    exploded = streams.select(
        F.col("collection"), F.explode(prefixes).alias("prefix")
    )
    return (
        exploded.groupBy("prefix")
        .agg(
            F.count("*").alias("n_streams"),
            F.countDistinct("collection").alias("n_collections"),
        )
        .select(
            "prefix",
            (F.size(F.split(F.col("prefix"), "/"))).cast("long").alias("depth"),
            "n_streams",
            "n_collections",
        )
        .orderBy("prefix")
    )
