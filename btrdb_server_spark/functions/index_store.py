"""Generation manifest shared by the persisted LSH / BM25 / IVF / PQ
indexes.

The persisted indexes (lsh_index_build, bm25_index_build,
ivf_index_build, pq_index_build) are operational state that must survive
the full lifecycle a 100 TB corpus actually has: batch APPENDS (daily
crawls), document RETIREMENT (GDPR takedown, re-curation), and
COMPACTION (folding append fragments and dropping retired rows). This
module gives them the same durability discipline the point store already
has (store.py: version dirs + atomic manifest flip + tombstones +
generation-named compaction; reference analogy: the tombstone-then-
background-delete protocol of Obliterate,
internal/mprovider/metaprovider.go:339-427, and the version-fenced
journal replay of pqm.go:160-186):

- every index carries a tiny ``MANIFEST.json`` — the single source of
  truth for which table generations, which committed batches, which
  tombstone set, and (for BM25) which exact corpus stats are LIVE;
- data writes land in fresh ``<table>.gen<G>/batch=<N>`` directories
  that no reader consults until ONE atomic manifest flip (os.replace)
  commits them — a crash mid-append/mid-compact/mid-REBUILD leaves the
  old index fully intact and only orphans an uncommitted directory,
  which the next write of the same batch id clears (the store's "crash
  leftover from an uncommitted version" rule, store.py:246). A rebuild
  (overwrite-mode build on an existing index) is just the next
  generation: init_index never deletes live data before the flip;
- retirement appends to a tombstone SET (rewritten as a new small
  generation — tombstones are metadata-scale by construction); every
  read path anti-joins it until compaction folds it into the data and
  drops it. The anti-join BROADCASTS the set only while it is provably
  small (row count carried in the manifest, so the guard is free);
  a bulk re-curation that retires a large corpus fraction degrades
  SOFT to a shuffled anti-join instead of OOMing the driver;
- every control-file primitive (manifest flip, lease create/steal/
  heartbeat/release) goes through a pluggable COMMIT BACKEND
  (functions/commit_backend.py): POSIX rename/O_EXCL by default —
  byte-for-byte the behavior described below — or a conditional-put
  contract (put/delete-if-match) for S3-class object stores where
  rename and O_EXCL do not exist; the lifecycle test suite runs on
  BOTH. Bulk data files need no conditional semantics: they land on
  paths no reader consults until the manifest flip;
- maintenance ops are SINGLE-WRITER, and that is now enforced, not
  assumed: every mutating op holds an O_EXCL ``WRITER.lock`` LEASE
  (host + pid + token, mtime-heartbeated; a same-host crashed writer is
  stolen the moment its pid is gone, a foreign-host writer only after
  its heartbeat exceeds the lease TTL, and the steal itself is an
  atomic rename-then-verify so N contenders produce one winner),
  and the manifest flip itself re-reads the manifest and CAS-asserts
  the fence (gen_seq / batches / tables / tombstones) it started from —
  a second writer that somehow bypassed the lock fails LOUDLY at the
  flip instead of silently dropping the other writer's batch.

Readers open exactly the committed batch directories
(``spark.read.parquet(dir/batch=0, dir/batch=1, ...)``), so partition
pruning on the real layout keys (bucket / cluster / band) is untouched
and uncommitted garbage is invisible without any runtime filter. A
fully-retired-then-compacted table writes NO data files (an empty
partitioned write would be unreadable); instead the manifest records the
table's schema under ``empty_tables`` and readers synthesize the empty
DataFrame from it.
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import socket
import threading
import uuid as uuidlib
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from btrdb_server_spark.functions import commit_backend as cbk

MANIFEST = "MANIFEST.json"
WRITER_LOCK = "WRITER.lock"

# A lock whose holder is on ANOTHER host (shared storage) is a LEASE: the
# holder's liveness cannot be probed with os.kill, so the holder heartbeats
# the lockfile mtime while it works and a contender may steal only a lease
# whose heartbeat is older than this TTL. Same-host locks keep the stronger
# pid-liveness rule (steal the moment the pid is gone).
LEASE_TTL_SEC = 600.0

# Broadcast the tombstone anti-join only below this many retired ids —
# ~50 B/id keeps the broadcast under a few hundred MB, comfortably
# inside executor broadcast budgets. Above it (a bulk re-curation that
# retires a large corpus fraction before the next compaction) the live
# view degrades soft to a shuffled anti-join on the id.
TOMBSTONE_BROADCAST_CAP = 5_000_000

_UNSET = object()


class ConcurrentIndexWriterError(RuntimeError):
    """A second concurrent writer was detected on a persisted index —
    either at WRITER.lock acquisition or at the manifest CAS fence."""


def _read_lock(lock: str) -> Optional[str]:
    """Lock content (stripped), or None if it vanished / is unreadable.
    Reads through the commit backend so lock diagnosis works on both the
    POSIX volume and a conditional-put object store."""
    raw = cbk.get_default_backend().read(lock)
    return None if raw is None else raw.strip()


def _parse_lock(cur: str):
    """(host, pid, ttl) from lock content. Current format is
    ``host:pid:token:ttl``; r12-early locks lack the ttl; legacy locks
    are a bare pid (same-host by construction). Unparseable/empty
    content returns (None, 0, None) — the holder may be mid-write, so
    it is NOT treated as a dead same-host pid."""
    parts = cur.split(":")
    if len(parts) >= 3:
        try:
            pid = int(parts[1])
        except ValueError:
            pid = 0
        ttl = None
        if len(parts) >= 4:
            with contextlib.suppress(ValueError):
                ttl = float(parts[3])
        return parts[0], pid, ttl
    try:
        return socket.gethostname(), int(cur), None  # legacy bare pid
    except ValueError:
        return None, 0, None


def _pid_alive(pid: int) -> bool:
    if pid <= 0:
        return False
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by another user


@contextlib.contextmanager
def writer_lock(path: str, lease_ttl_sec: float = LEASE_TTL_SEC):
    """Single-writer LEASE for index maintenance ops (build / append /
    retire / compact): a lockfile holding ``host:pid:token``, created
    O_EXCL and heartbeated (mtime touch) while held. A live holder makes
    a second writer raise ConcurrentIndexWriterError at acquisition —
    fail loudly; the silent failure mode was two appends claiming the
    same batch id and one losing its rows.

    Steal rules (who may reclaim an abandoned lock):
    - SAME-HOST lock whose pid is gone — a crashed local writer —
      stealable immediately (pid liveness is authoritative locally);
    - FOREIGN-HOST lock (shared storage) — stealable only once its
      heartbeat mtime is older than the lease TTL the HOLDER recorded in
      the lockfile (falling back to this call's `lease_ttl_sec` for
      locks predating the recorded TTL), so processes configured with
      different TTLs can never steal a live writer that is heartbeating
      on its own schedule;
    - EMPTY/unparseable content (a holder between its O_EXCL create and
      its token write, or a writer that crashed exactly there) — never
      treated as a dead pid; stealable only past the TTL, like a
      foreign lease.
    The steal itself is ONE-WINNER atomic via the commit backend
    (functions/commit_backend.py): on POSIX the stale lock is renamed
    ASIDE to a unique name — of N contenders exactly one rename succeeds
    — and on a conditional-put object store it is a DELETE If-Match on
    the diagnosed-stale content; either way the winner then re-enters
    the normal exclusive create. Release and heartbeat verify ownership
    first, so a stolen-from writer's cleanup can no longer unlink the
    thief's live lock. Residual TOCTOU windows on the POSIX backend
    (verify-then-unlink on release, a steal racing a holder's normal
    release) are microseconds wide and backstopped by write_manifest's
    CAS fence — concurrent flips still fail loudly at commit; the
    conditional-put backend closes them outright (every mutation is
    content-conditional)."""
    backend = cbk.get_default_backend()
    os.makedirs(path, exist_ok=True)
    lock = os.path.join(path, WRITER_LOCK)
    host = socket.gethostname()
    token = f"{host}:{os.getpid()}:{uuidlib.uuid4().hex}:{lease_ttl_sec:g}"
    acquired = False
    for attempt in (0, 1, 2):
        if backend.create_exclusive(lock, token):
            acquired = True
            break
        raw = backend.read(lock)
        if raw is None:
            continue  # holder released between our create and read: retry
        cur = raw.strip()
        lock_host, lock_pid, lock_ttl = _parse_lock(cur)
        age = backend.age_sec(lock)
        if age is None:
            continue  # vanished mid-diagnosis: retry the create
        if lock_host == host:
            stale = not _pid_alive(lock_pid)
        else:  # foreign/unknown: only an expired heartbeat lease
            stale = age > (
                lock_ttl if lock_ttl and lock_ttl > 0 else lease_ttl_sec
            )
        if not stale or attempt == 2:
            raise ConcurrentIndexWriterError(
                f"index writer lock already held "
                f"(host {lock_host}, pid {lock_pid}): {lock}"
            )
        # One-winner steal of the diagnosed-stale lock (rename-aside on
        # POSIX, DELETE If-Match on conditional-put): losers raise.
        if not backend.remove_stale(lock, raw):
            raise ConcurrentIndexWriterError(
                f"lost the stale-lock steal race to another writer: {lock}"
            )
        # loop re-enters the exclusive create; a third party that slips
        # in first makes it fail loudly at the liveness check above
    if not acquired:
        raise ConcurrentIndexWriterError(f"could not acquire {lock}")
    stop = threading.Event()

    def _heartbeat() -> None:
        # Refresh the lease's last-modified while held; stop the moment
        # the lock is PROVABLY no longer ours (stolen after a long
        # stall) — refreshing a thief's lock would extend the WRONG
        # lease. A read that FAILS (a shared-storage blip) is not proof
        # of loss: exiting there would permanently stop the heartbeat of
        # a still-live writer, whose lease then expires mid-write and
        # gets stolen; keep trying and re-check ownership next tick (the
        # manifest CAS still fails an actually-stolen-from writer
        # loudly). refresh_if_content: True=refreshed, False=not ours,
        # None=read failed.
        while not stop.wait(max(lease_ttl_sec / 8.0, 0.05)):
            if backend.refresh_if_content(lock, token) is False:
                return

    hb = threading.Thread(
        target=_heartbeat, name="index-writer-lease", daemon=True
    )
    hb.start()
    try:
        yield
    finally:
        stop.set()
        hb.join(timeout=5.0)
        # Verified release: delete only if the lock is still OURS.
        backend.delete_if_content(lock, token)


def _fence(m: dict) -> dict:
    """The manifest fields a concurrent maintenance op would have moved —
    the CAS token write_manifest checks before flipping."""
    return {
        "gen_seq": int(m["gen_seq"]),
        "batches": sorted(int(b) for b in m["batches"]),
        "tables": dict(m.get("tables") or {}),
        "tombstones": m.get("tombstones"),
    }


def read_manifest(path: str) -> dict:
    target = os.path.join(path, MANIFEST)
    raw = cbk.get_default_backend().read(target)
    if raw is None:
        raise FileNotFoundError(target)
    m = json.loads(raw)
    # Stamp the CAS fence at read time: a maintenance op that mutates
    # this dict and hands it back to write_manifest is checked against
    # the state it STARTED from (popped before the JSON is written).
    m["_expect"] = _fence(m)
    return m


def write_manifest(path: str, m: dict) -> None:
    """Atomic flip: readers planned at any instant see either the old
    complete index or the new complete index. On the POSIX backend that
    is a same-device rename — exactly store._write_manifest's
    discipline; on a conditional-put backend it is a PUT If-Match on the
    content the fence check just read (If-None-Match:* for a fresh
    build), so the compare and the flip are ONE service-side atomic step.

    CAS fence: if `m` carries an `_expect` token (stamped by
    read_manifest, or None from init_index on a fresh path meaning "no
    manifest may exist yet"), the CURRENT manifest is re-read and must
    still match it — a concurrent writer that flipped in between makes
    this op raise instead of silently superseding the other's commit.

    Deferred reclamation: dirs fold_retired aged out of the retention
    window travel here under `_drop_after_commit` and are deleted only
    AFTER the flip succeeds — an op that crashes (or fails the CAS)
    before committing deletes NOTHING, so the documented
    generations_retained reader window never shrinks by an uncommitted
    op. A crash between the flip and the deletes leaks the aged-out dirs
    (bounded: one retention group), never data."""
    backend = cbk.get_default_backend()
    expect = m.pop("_expect", _UNSET)
    drop_after = m.pop("_drop_after_commit", None)
    target = os.path.join(path, MANIFEST)
    raw = backend.read(target)
    if expect is None:
        if raw is not None:
            raise ConcurrentIndexWriterError(
                f"another writer created {target} since this build started"
            )
        observed = None  # conditional backends: create-if-absent
    elif expect is not _UNSET:
        if raw is None:
            raise ConcurrentIndexWriterError(
                f"{target} vanished since this op started"
            )
        cur = json.loads(raw)
        if _fence(cur) != expect:
            raise ConcurrentIndexWriterError(
                f"manifest moved under this op (expected {expect}, "
                f"found {_fence(cur)}): {target}"
            )
        observed = raw  # conditional backends: put-if-match this content
    else:
        observed = cbk.UNCONDITIONAL
    try:
        backend.publish(
            target, json.dumps(m, indent=1, sort_keys=True), observed
        )
    except cbk.CommitConflictError as e:
        raise ConcurrentIndexWriterError(str(e))
    for group in drop_after or []:
        drop_dirs(path, group)


def init_index(path: str, tables: list[str], **extra) -> dict:
    """Start a (re)build: return the manifest for the NEXT generation.

    On a fresh path this is the gen-0 manifest; on an existing index the
    rebuild targets gen_seq+1 directories and the OLD index stays fully
    live (and readable) until the caller's write_manifest flip — a crash
    mid-rebuild orphans only uncommitted gen dirs, never the serving
    index. The superseded generation is recorded in `retired_dirs` and
    reclaimed by the NEXT maintenance op (two-generation retention),
    like compact; groups aged out of the retention window here are only
    DELETED when this rebuild's own write_manifest commits (deferred via
    `_drop_after_commit`) — an abandoned rebuild shrinks nothing.
    Nothing is live until the caller's write_manifest."""
    os.makedirs(path, exist_ok=True)
    try:
        prior = read_manifest(path)
    except FileNotFoundError:
        prior = None
    seq = int(prior["gen_seq"]) + 1 if prior else 0
    m = {
        "gen_seq": seq,
        "batches": [0],
        "tables": {t: f"{t}.gen{seq}" for t in tables},
        "tombstones": None,
        "_expect": prior["_expect"] if prior else None,
    }
    if prior is not None:
        if "generations_retained" in prior:
            m["generations_retained"] = prior["generations_retained"]
        m["retired_dirs"] = prior.get("retired_dirs") or []
        fold_retired(
            path,
            m,
            list(prior.get("tables", {}).values())
            + [
                prior.get("tombstones"),
                prior.get("centroids"),
                prior.get("codebooks"),
            ],
        )
    m.update(extra)
    return m


def table_batch_dir(path: str, m: dict, table: str, batch: int) -> str:
    """Target dir for one table's batch. Any leftover from a crashed,
    never-committed write of the same batch id is cleared first — the
    batch id is not in the manifest, so nothing live is touched."""
    d = os.path.join(path, m["tables"][table], f"batch={batch}")
    shutil.rmtree(d, ignore_errors=True)
    return d


def next_batch(m: dict) -> int:
    return max(m["batches"], default=-1) + 1


def write_partitioned_batch(
    df: DataFrame, d: str, partition_col: str, sort_within: str | None = None
) -> int:
    """Write one batch table partitioned by its layout key and return the
    EXACT row count, observed on the write job itself (no second pass).
    A zero-row batch REMOVES the directory the write just created — an
    empty partitioned parquet write leaves a file-less dir that poisons
    a later all-batches read — so the caller must then commit nothing
    for it (an append no-op) or record the schema under empty_tables
    (an empty build). Shared by the LSH / IVF / PQ batch writers.

    Rows are CLUSTERED by the partition key before the write: without
    that, every input task cuts one file per key value it holds
    (tasks x values tiny files — measured 256 files / 0.91 s vs
    8 files / 0.33 s for an 8-value key at sf0.1; a 10k-task append over
    a 1k-value layout would cut 10M files at 100 TB), and every reader
    of the table then pays per-file open cost proportionally more.
    Plain repartition(key) rather than the AQE REBALANCE hint: both were
    measured, and rebalance's extra adaptive stage round cost ~0.3-1 s
    per maintenance op at bench scale for identical file layouts
    (a deployment expecting one cell/bucket to outgrow a single write
    task can switch to REBALANCE for byte-sized splits — same contract).

    `sort_within` (optional column name) sorts rows within each write
    partition AFTER the clustering exchange — a caller-side sort would
    be undone by it — so per-file min/max stats on that column stay
    selective (the BM25 postings' term sort)."""
    from pyspark.sql import Observation

    out = df.repartition(partition_col)
    if sort_within is not None:
        out = out.sortWithinPartitions(sort_within)
    obs = Observation()
    out.observe(obs, F.count(F.lit(1)).alias("n")).write.partitionBy(
        partition_col
    ).parquet(d)
    n = int(obs.get["n"] or 0)
    if n == 0:
        shutil.rmtree(d, ignore_errors=True)
    return n


def mark_table(
    m: dict, table: str, rows: int, schema, batch_written: bool = True
) -> None:
    """Record a table's emptiness state in the manifest being built: a
    zero-row table writes NO files (an empty partitioned parquet write
    leaves an unreadable directory), so its schema is carried in the
    manifest instead and read_table synthesizes the empty DataFrame.
    A non-empty write clears any stale mark."""
    empt = dict(m.get("empty_tables") or {})
    if rows == 0:
        empt[table] = schema.json()
    else:
        empt.pop(table, None)
    m["empty_tables"] = empt


def read_table(spark: SparkSession, path: str, m: dict, table: str) -> DataFrame:
    """All COMMITTED batches of a table, as one DataFrame. Opening the
    committed batch dirs explicitly (rather than the table root plus a
    filter) keeps uncommitted crash leftovers invisible and leaves
    partition pruning on the layout keys (bucket/cluster/band) intact.

    A table marked empty in the manifest (`empty_tables`, written by a
    compaction that found zero live rows) has no data files; its empty
    DataFrame is synthesized from the recorded schema. Batch dirs are
    allowed to be absent ONLY for marked tables (a later append revives
    the table without rewriting history) — for an unmarked table a
    missing committed dir still raises, preserving loss detection."""
    from pyspark.sql.types import StructType

    root = os.path.join(path, m["tables"][table])
    empty_schema = (m.get("empty_tables") or {}).get(table)
    dirs, missing = [], []
    for b in m["batches"]:
        d = os.path.join(root, f"batch={b}")
        (dirs if os.path.isdir(d) else missing).append(d)
    if missing and empty_schema is None:
        raise FileNotFoundError(
            f"committed batch dirs missing from index table {root}: {missing}"
        )
    if not dirs:
        if empty_schema is None:
            raise FileNotFoundError(f"index table has no data and no schema: {root}")
        return spark.createDataFrame(
            [], StructType.fromJson(json.loads(empty_schema))
        )
    # basePath anchors partition discovery at the table root so the real
    # layout keys (bucket/cluster/band) resolve consistently across batch
    # dirs; only the LISTED (committed) dirs are scanned. The synthetic
    # `batch` column is dropped — it is commit metadata, not data.
    return spark.read.option("basePath", root).parquet(*dirs).drop("batch")


def read_tombstones(
    spark: SparkSession, path: str, m: dict
) -> Optional[DataFrame]:
    if not m.get("tombstones"):
        return None
    return spark.read.parquet(os.path.join(path, m["tombstones"]))


def minus_tombstones(
    df: DataFrame,
    tomb: Optional[DataFrame],
    id_col: str,
    tomb_id: str = "id",
    tomb_rows: Optional[int] = None,
    broadcast_row_cap: int = TOMBSTONE_BROADCAST_CAP,
) -> DataFrame:
    """Live view of an index table: anti-join against the retired-id set
    (absent set = the plain scan, so a never-retired index keeps its
    pinned join-free plans).

    The set is BROADCAST only while provably small: `tomb_rows` is the
    exact count the retire path records in the manifest
    (`tombstone_rows`), so the guard costs nothing; when the manifest
    predates the counter the guard falls back to a bounded limit+count.
    An oversized set (bulk re-curation retiring a large corpus fraction
    before the next compaction) degrades SOFT to a shuffled anti-join on
    the id instead of OOMing the driver."""
    if tomb is None:
        return df
    keys = tomb.select(F.col(tomb_id).alias(id_col)).distinct()
    if tomb_rows is None:
        tomb_rows = tomb.limit(broadcast_row_cap + 1).count()
    if tomb_rows <= broadcast_row_cap:
        keys = F.broadcast(keys)
    return df.join(keys, id_col, "left_anti")


def retire_filter(
    df: DataFrame,
    ids,
    id_col: str,
    broadcast_row_cap: int = TOMBSTONE_BROADCAST_CAP,
    ids_rows: Optional[int] = None,
) -> DataFrame:
    """Rows of `df` whose id is in `ids`: a python list/sequence (literal
    isin — fine for a metadata-scale takedown batch) or a DataFrame whose
    FIRST column holds the ids (semi-join — the shape a bulk re-curation
    job produces; never a driver-side collect). The semi-join BROADCASTS
    the id set only while provably small; a bulk re-curation handing in a
    large corpus fraction degrades SOFT to a shuffled semi-join instead
    of OOMing at the broadcast.

    The upstream plan behind an `ids` DataFrame runs ONCE: pass
    `ids_rows` when the caller already knows the set size (a takedown
    batch usually does), else the projected keys are localCheckpointed
    before the cap probe — a retire set that is itself an expensive job
    (a quality-filter output) must not be recomputed from scratch for
    the semi-join after the count already ran it (the BM25 append path's
    `toks` discipline)."""
    if isinstance(ids, DataFrame):
        key = ids.columns[0]
        keys = ids.select(F.col(key).alias(id_col)).distinct()
        if ids_rows is None:
            keys = keys.localCheckpoint(eager=True)
            ids_rows = keys.limit(broadcast_row_cap + 1).count()
        if ids_rows <= broadcast_row_cap:
            keys = F.broadcast(keys)
        return df.join(keys, id_col, "left_semi")
    return df.where(F.col(id_col).isin(list(ids)))


def write_tombstones(
    path: str, m: dict, tomb: DataFrame, seq: int, rows: Optional[int] = None
) -> str:
    """Persist the new FULL tombstone set as its own generation (the set
    is rewritten, not appended — it is metadata-scale by contract, and a
    rewrite keeps the flip atomic: the old set stays live until the
    manifest points away from it). Returns the new dir name.

    `rows` is the exact set size the caller already counted: at or under
    the broadcast cap the set collapses to ONE file (single task — fine
    for metadata-scale sets, and the read side stays a one-file load);
    past the cap — a bulk re-curation — the single-task coalesce(1)
    would bottleneck the whole retire on one core, so the set is written
    multi-file at the job's natural parallelism instead (reads and the
    anti-join are unaffected; they already degrade to shuffles at the
    same threshold)."""
    d = f"tombstones.gen{seq}"
    target = os.path.join(path, d)
    if rows is not None and rows > TOMBSTONE_BROADCAST_CAP:
        tomb.write.mode("overwrite").parquet(target)
    else:
        tomb.coalesce(1).write.mode("overwrite").parquet(target)
    return d


def drop_dirs(path: str, names: list[Optional[str]]) -> None:
    """Delete superseded generation dirs."""
    for n in names:
        if n:
            shutil.rmtree(os.path.join(path, n), ignore_errors=True)


def retire_table_ids(
    spark: SparkSession, path: str, table: str, ids, id_col: Optional[str] = None
) -> int:
    """Generic takedown path shared by the single-table indexes (LSH
    bands, IVF cells, PQ code cells): record the ids in the tombstone
    set WITHOUT rewriting index bytes, folding the EXACT retired count
    into the manifest (which is what keeps every probe's broadcast guard
    free). Retire-then-probe is bit-equal to a rebuild on the post-delete
    corpus because every read path anti-joins the set; bytes are
    reclaimed by compaction — tombstone now, rewrite in the background,
    the reference's Obliterate protocol
    (internal/mprovider/metaprovider.go:339-427).

    Idempotent (the retired set is derived from live rows, so re-retiring
    or retiring never-indexed ids is a no-op). Cost: one id-column scan
    plus a metadata-scale tombstone rewrite. Returns the count newly
    retired."""
    with writer_lock(path):
        m = read_manifest(path)
        idc = id_col or m["id_col"]
        seq = m["gen_seq"] + 1
        tomb_old = read_tombstones(spark, path, m)
        old_rows = m.get("tombstone_rows")
        newly = (
            minus_tombstones(
                read_table(spark, path, m, table).select(idc),
                tomb_old,
                idc,
                tomb_rows=old_rows,
            )
            .transform(lambda df: retire_filter(df, ids, idc))
            .select(F.col(idc).alias("id"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_new = newly.count()
        if n_new == 0:
            return 0
        # newly is disjoint from the old set by construction (derived from
        # the tombstone-filtered live rows), so the counts fold exactly.
        total = (
            old_rows
            if old_rows is not None
            else (tomb_old.count() if tomb_old is not None else 0)
        ) + n_new
        full = newly if tomb_old is None else tomb_old.unionByName(newly)
        tomb_dir = write_tombstones(path, m, full, seq, rows=total)
        old_tomb = m["tombstones"]
        m["tombstones"] = tomb_dir
        m["tombstone_rows"] = total
        m["gen_seq"] = seq
        fold_retired(path, m, [old_tomb])  # N-generation retention
        write_manifest(path, m)
        return n_new


def compact_partitioned_table(
    spark: SparkSession,
    path: str,
    table: str,
    partition_col: str,
    id_col: Optional[str] = None,
) -> dict:
    """Generic compaction shared by the single-table indexes: rewrite the
    live rows into ONE fresh generation (re-sharded by the layout key so
    each partition directory collapses to a few fat files), flip the
    manifest atomically; the superseded generation and tombstone set are
    retained until the NEXT maintenance op (two-generation retention,
    store.py:406-520 discipline). Answers are unchanged (compact-then-
    probe == tombstone-view probe == post-delete rebuild, driver-proven);
    probes stop paying the anti-join and the per-batch file fan-out. A
    fully-retired table records its schema in the manifest instead of
    writing an unreadable empty partitioned dir. Returns {rows, gen}."""
    with writer_lock(path):
        m = read_manifest(path)
        idc = id_col or m["id_col"]
        seq = m["gen_seq"] + 1
        live = minus_tombstones(
            read_table(spark, path, m, table),
            read_tombstones(spark, path, m),
            idc,
            tomb_rows=m.get("tombstone_rows"),
        )
        m2 = dict(m)
        m2["tables"] = {**m["tables"], table: f"{table}.gen{seq}"}
        # ONE job: the count is observed on the write itself (the
        # separate count-before-write executed the scan + anti-join
        # twice), and a fully-retired table's empty write is rolled back
        # by the helper — exactly its zero-row contract.
        rows = write_partitioned_batch(
            live, table_batch_dir(path, m2, table, 0), partition_col
        )
        m2["batches"] = [0] if rows else []
        mark_table(m2, table, rows, live.schema)
        m2["tombstones"] = None
        m2["tombstone_rows"] = 0
        m2["gen_seq"] = seq
        # N-generation retention: this op's superseded dirs become one
        # retention group; groups older than generations_retained-1 drop.
        fold_retired(path, m2, [m["tables"][table], m["tombstones"]])
        write_manifest(path, m2)  # atomic flip
        return {"rows": rows, "gen": seq}


def drop_prior_retired(path: str, m: dict) -> None:
    """Two-generation retention (store.compact's discipline,
    store.py:406-520): a maintenance op never deletes the dirs IT
    supersedes — it records them under the manifest's `retired_dirs` and
    deletes the dirs the PREVIOUS op retired. A scan planned against the
    pre-flip manifest therefore keeps its whole file listing readable for
    one full maintenance interval; only a scan spanning two maintenance
    ops can race a generation delete (the store's same documented
    residual). Prefer fold_retired, which also honors the manifest's
    generations_retained knob."""
    groups = m.get("retired_dirs") or []
    if groups and isinstance(groups[0], str):
        groups = [groups]
    for g in groups:
        drop_dirs(path, g)


def fold_retired(path: str, m: dict, new_group: list) -> None:
    """Record this op's superseded dirs as one retention GROUP and age
    out groups older than the manifest's `generations_retained` (default
    2 = live + one superseded — exactly the old two-generation
    behavior). `retired_dirs` is a list of groups, oldest first; the
    newest (generations_retained - 1) groups stay on disk, so a scan
    planned against an old manifest keeps its listing readable for that
    many maintenance intervals. Set the knob once with
    set_generations_retained; legacy flat lists migrate as one group.

    Aged-out groups are NOT deleted here: they are stashed under
    `_drop_after_commit` and deleted by write_manifest only after the
    op's atomic flip succeeds — an op that never commits (crash, CAS
    conflict, rebuild abandoned after init_index) must not shrink the
    reader window the retention knob promises."""
    keep = max(1, int(m.get("generations_retained", 2))) - 1
    groups = m.get("retired_dirs") or []
    if groups and isinstance(groups[0], str):
        groups = [groups]  # legacy flat list = the previous op's group
    group = [d for d in new_group if d]
    if group:
        groups = groups + [group]
    drop, m["retired_dirs"] = (
        (groups[:-keep], groups[-keep:]) if keep else (groups, [])
    )
    if drop:
        m["_drop_after_commit"] = (m.get("_drop_after_commit") or []) + drop


def set_generations_retained(path: str, n: int) -> None:
    """Widen (or narrow) an index's retention: how many generations —
    live + superseded — stay on disk across maintenance ops. The
    changefeed-lag / long-scan contract knob: a reader holding listings
    from up to n-1 maintenance ops ago stays safe. Takes the writer lock
    (it is a manifest write like any other maintenance op)."""
    if n < 2:
        raise ValueError("generations_retained must be >= 2 (live + 1)")
    with writer_lock(path):
        m = read_manifest(path)
        m["generations_retained"] = int(n)
        write_manifest(path, m)
