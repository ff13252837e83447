"""Synthesize an sf1-scale dataset (10x sf0.1) for scaling-factor runs.

/root/testdata has no sf1, so the 100x-plan claims rest on plan-shape
tests alone.  This script manufactures a representative 10x corpus from
sf0.1 WITHOUT creating adversarial duplicate structure:

- lineitem: 10 replicas with l_orderkey AND l_partkey shifted into
  disjoint ranges — the co-purchase graph grows linearly (10x nodes and
  edges), matching how real data growth adds new orders over new parts
  rather than re-observing the same graph.
- documents: 10 replicas, doc_id shifted; each replica's text is the
  same vocabulary re-ordered by a replica-salted deterministic word sort,
  so replicas keep the corpus token/length distributions (tfidf, LSH
  banding stay representative) but are NOT near-duplicates of each other
  (shingle sets differ), so dedup candidate counts grow ~linearly.
- embeddings: 10 replicas, vec_id shifted; vectors circularly shifted by
  the replica index — norms and within-replica geometry preserved,
  across-replica cosine decorrelated, so k-means cells and within-cell
  quadratics scale linearly.
- all other tables: symlinked to sf0.1 (the five scaling queries don't
  read them, but load_table must resolve).

Usage: python scripts/make_scale_data.py [out_dir]   (default .scale/sf1)
Output is gitignored; ~10 MB/table inputs -> ~170 MB total.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
REPLICAS = 10


def scale_lineitem(out_dir: str) -> None:
    t = pq.read_table(f"{SRC}/lineitem.parquet")
    ok = t.column("l_orderkey").to_numpy()
    pk = t.column("l_partkey").to_numpy()
    ok_span = int(ok.max()) + 1
    pk_span = int(pk.max()) + 1
    parts = []
    for i in range(REPLICAS):
        cols = {name: t.column(name) for name in t.column_names}
        cols["l_orderkey"] = pa.array(ok + i * ok_span)
        cols["l_partkey"] = pa.array(pk + i * pk_span)
        parts.append(pa.table(cols))
    pq.write_table(pa.concat_tables(parts), f"{out_dir}/lineitem.parquet")
    print(f"lineitem: {len(t) * REPLICAS} rows")


def scale_documents(out_dir: str) -> None:
    t = pq.read_table(f"{SRC}/documents.parquet")
    doc_id = t.column("doc_id").to_numpy()
    texts = t.column("text").to_pylist()
    span = int(doc_id.max()) + 1
    parts = [t]
    for i in range(1, REPLICAS):
        # (replica, doc)-salted deterministic re-order: same words per doc
        # (token/length distributions preserved) but the permutation is
        # PER-DOCUMENT — a per-replica global word order would correlate
        # every document's shingle sequence inside the replica and
        # manufacture millions of fake near-dups (observed: 4M LSH pairs
        # vs 260 in the source corpus).
        # True position shuffle (not a sort by word identity — that makes
        # repeated words adjacent and inflates shingle collisions): words
        # keep their multiset, positions are deterministically permuted.
        salted = []
        for j, tx in enumerate(texts):
            ws = tx.split()
            order = sorted(range(len(ws)), key=lambda k, s=(i, j): hash((k, s)))
            salted.append(" ".join(ws[k] for k in order))
        cols = {name: t.column(name) for name in t.column_names}
        cols["doc_id"] = pa.array(doc_id + i * span)
        cols["text"] = pa.array(salted, type=pa.string())
        parts.append(pa.table(cols))
    pq.write_table(pa.concat_tables(parts), f"{out_dir}/documents.parquet")
    print(f"documents: {len(t) * REPLICAS} rows")


def scale_embeddings(out_dir: str) -> None:
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    vid = t.column("vec_id").to_numpy()
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    span = int(vid.max()) + 1
    parts = []
    for i in range(REPLICAS):
        rolled = np.roll(vecs, i, axis=1)
        cols = {name: t.column(name) for name in t.column_names}
        cols["vec_id"] = pa.array(vid + i * span)
        cols["embedding"] = pa.array(list(rolled), type=pa.list_(pa.float32()))
        parts.append(pa.table(cols))
    pq.write_table(pa.concat_tables(parts), f"{out_dir}/embeddings.parquet")
    print(f"embeddings: {len(t) * REPLICAS} rows")


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1"
    )
    os.makedirs(out_dir, exist_ok=True)
    scale_lineitem(out_dir)
    scale_documents(out_dir)
    scale_embeddings(out_dir)
    for tbl in "region nation customer supplier part orders events".split():
        dst = f"{out_dir}/{tbl}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{tbl}.parquet", dst)
    print("wrote", out_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
