"""Generation manifest shared by the persisted LSH / BM25 / IVF indexes.

The three persisted indexes (lsh_index_build, bm25_index_build,
ivf_index_build) are operational state that must survive the full
lifecycle a 100 TB corpus actually has: batch APPENDS (daily crawls),
document RETIREMENT (GDPR takedown, re-curation), and COMPACTION
(folding append fragments and dropping retired rows). This module gives
them the same durability discipline the point store already has
(store.py: version dirs + atomic manifest flip + tombstones +
generation-named compaction; reference analogy: the tombstone-then-
background-delete protocol of Obliterate,
internal/mprovider/metaprovider.go:339-427, and the version-fenced
journal replay of pqm.go:160-186):

- every index carries a tiny ``MANIFEST.json`` — the single source of
  truth for which table generations, which committed batches, which
  tombstone set, and (for BM25) which exact corpus stats are LIVE;
- data writes land in fresh ``<table>.gen<G>/batch=<N>`` directories
  that no reader consults until ONE atomic manifest flip (os.replace)
  commits them — a crash mid-append/mid-compact leaves the old index
  fully intact and only orphans an uncommitted directory, which the
  next write of the same batch id clears (the store's "crash leftover
  from an uncommitted version" rule, store.py:246);
- retirement appends to a tombstone SET (rewritten as a new small
  generation — tombstones are metadata-scale by construction); every
  read path anti-joins it (broadcast — it never outgrows the retired
  fraction) until compaction folds it into the data and drops it.

Readers open exactly the committed batch directories
(``spark.read.parquet(dir/batch=0, dir/batch=1, ...)``), so partition
pruning on the real layout keys (bucket / cluster / band) is untouched
and uncommitted garbage is invisible without any runtime filter.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "MANIFEST.json"


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST)) as f:
        return json.load(f)


def write_manifest(path: str, m: dict) -> None:
    """Atomic flip: readers planned at any instant see either the old
    complete index or the new complete index (same device rename —
    exactly store._write_manifest's discipline)."""
    tmp = os.path.join(path, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(m, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(path, MANIFEST))


def init_index(path: str, tables: list[str], **extra) -> dict:
    """Fresh index root: wipe `path`, return the gen-0 manifest (caller
    writes data into table_batch_dir(...) then commits with
    write_manifest — nothing is live until that flip)."""
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    m = {
        "gen_seq": 0,
        "batches": [0],
        "tables": {t: f"{t}.gen0" for t in tables},
        "tombstones": None,
    }
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
    return max(m["batches"]) + 1


def read_table(spark: SparkSession, path: str, m: dict, table: str) -> DataFrame:
    """All COMMITTED batches of a table, as one DataFrame. Opening the
    committed batch dirs explicitly (rather than the table root plus a
    filter) keeps uncommitted crash leftovers invisible and leaves
    partition pruning on the layout keys (bucket/cluster/band) intact."""
    root = os.path.join(path, m["tables"][table])
    dirs = [os.path.join(root, f"batch={b}") for b in m["batches"]]
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
    df: DataFrame, tomb: Optional[DataFrame], id_col: str, tomb_id: str = "id"
) -> DataFrame:
    """Live view of an index table: broadcast anti-join against the
    retired-id set (absent set = the plain scan, so a never-retired
    index keeps its pinned join-free plans)."""
    if tomb is None:
        return df
    return df.join(
        F.broadcast(tomb.select(F.col(tomb_id).alias(id_col)).distinct()),
        id_col,
        "left_anti",
    )


def retire_filter(df: DataFrame, ids, id_col: str) -> DataFrame:
    """Rows of `df` whose id is in `ids`: a python list/sequence (literal
    isin — fine for a metadata-scale takedown batch) or a DataFrame whose
    FIRST column holds the ids (broadcast semi-join — the shape a bulk
    re-curation job produces; never a driver-side collect)."""
    if isinstance(ids, DataFrame):
        key = ids.columns[0]
        return df.join(
            F.broadcast(ids.select(F.col(key).alias(id_col)).distinct()),
            id_col,
            "left_semi",
        )
    return df.where(F.col(id_col).isin(list(ids)))


def write_tombstones(
    path: str, m: dict, tomb: DataFrame, seq: int
) -> str:
    """Persist the new FULL tombstone set as its own generation (the set
    is rewritten, not appended — it is metadata-scale, and a rewrite
    keeps the flip atomic: the old set stays live until the manifest
    points away from it). Returns the new dir name for the manifest."""
    d = f"tombstones.gen{seq}"
    tomb.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, d))
    return d


def drop_dirs(path: str, names: list[Optional[str]]) -> None:
    """Delete superseded generation dirs."""
    for n in names:
        if n:
            shutil.rmtree(os.path.join(path, n), ignore_errors=True)


def drop_prior_retired(path: str, m: dict) -> None:
    """Two-generation retention (store.compact's discipline,
    store.py:406-520): a maintenance op never deletes the dirs IT
    supersedes — it records them under the manifest's `retired_dirs` and
    deletes the dirs the PREVIOUS op retired. A scan planned against the
    pre-flip manifest therefore keeps its whole file listing readable for
    one full maintenance interval; only a scan spanning two maintenance
    ops can race a delete (the store's same documented residual)."""
    drop_dirs(path, m.get("retired_dirs") or [])
