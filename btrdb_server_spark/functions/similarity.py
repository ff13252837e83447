"""Similarity search over embedding columns (array<float>).

- cosine_topk           — brute-force exact top-k for one probe vector:
                          a single vectorized scan + TakeOrderedAndProject.
                          The correctness baseline.
- lsh_bucket_assignments — random-hyperplane LSH signatures (deterministic
                          seed), the scale path: bucketing turns 100 TB of
                          vectors into candidate sets ~1/2^planes the size.
- near_dup_pairs        — blocked pairwise cosine (block on a coarse key,
                          e.g. label or LSH bucket) for near-duplicate
                          detection without the full cross product.

Dot products use zip_with + aggregate (JVM codegen, no Python). Hyperplanes
are generated driver-side from a fixed numpy seed and embedded as literals,
so results are reproducible and SQL-oracle-checkable.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from btrdb_server_spark.utils import ensure_parallelism


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _pairwise_cos_pandas(id_col: str, directed: bool):
    """Arrow-batched within-group pairwise-cosine kernel (guide §4.2): one
    applyInPandas per group replaces the group self-join whose per-pair
    cosine ran as an INTERPRETED higher-order-function fold (zip_with/
    aggregate are CodegenFallback — measured ~5.5 µs/pair; this kernel is
    ~10x faster on the same pairs and removes one side of the self-join's
    data movement).

    Bit-exactness contract (the reason this is safe to swap in): the Gram
    matrix accumulates as d rank-1 updates in ascending element order, so
    every cell is (((0.0 + p_0) + p_1) + ... + p_{d-1}) — the IDENTICAL
    IEEE-754 op chain as _dot's left fold with its 0.0 seed; norms are
    sqrt of the same-order diagonal fold (= _norm); the cosine is one
    multiply then one divide, the same two ops as
    dot / (nrm_a * nrm_b). numpy float64 arithmetic and np.sqrt are
    IEEE-754-exact, so per-pair values match the JVM bit for bit
    (property-pinned in tests). Rounding stays OUTSIDE the kernel: callers
    apply F.round(cos_raw, 6) so the oracle's HALF_UP semantics never
    depend on Python.

    Emits (a, b, cos_raw): the id-ascending pairs a < b, or both directed
    orders when `directed`. Assumes fixed-length, null-free vectors (the
    embeddings contract; ragged input raises in np.stack)."""

    def fn(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(id_col, kind="mergesort")
        n = len(pdf)
        empty = {
            "a": pd.Series(dtype="int64"),
            "b": pd.Series(dtype="int64"),
            "cos_raw": pd.Series(dtype="float64"),
        }
        if n < 2:
            return pd.DataFrame(empty)
        M = np.stack(pdf["v"].to_numpy())
        if M.dtype != np.float64:
            M = M.astype(np.float64)
        G = np.zeros((n, n), dtype=np.float64)
        for j in range(M.shape[1]):
            c = M[:, j]
            G += np.multiply.outer(c, c)
        nrm = np.sqrt(np.diagonal(G))
        with np.errstate(divide="ignore", invalid="ignore"):
            C = G / np.multiply.outer(nrm, nrm)
        ids = pdf[id_col].to_numpy()
        i, j = np.triu_indices(n, 1)
        lo, hi, cos = ids[i], ids[j], C[i, j]
        if directed:
            lo, hi = np.concatenate([lo, hi]), np.concatenate([hi, lo])
            cos = np.concatenate([cos, cos])
        return pd.DataFrame(
            {"a": lo.astype("int64"), "b": hi.astype("int64"), "cos_raw": cos}
        )

    return fn


_PAIR_COS_SCHEMA = "a long, b long, cos_raw double"


def _vec_sql(vs: Sequence[float]) -> str:
    """SQL text for a literal double array. repr() emits the shortest
    decimal that round-trips the IEEE-754 value and Spark's parser
    re-rounds it to the identical bits, so the parsed Literal equals
    F.lit's on every finite double — but ONE expr() parse replaces
    len(vs)+1 py4j round trips. Literal-vector trees (centroids,
    codebooks, probes) were costing SECONDS of driver time per index
    build at 64 dims x k candidates (guide §7.3: plan construction is
    single-threaded driver work); the executed plan is unchanged."""
    return "array(" + ", ".join(repr(float(x)) + "D" for x in vs) + ")"


def _dot_sql(a: str, b: str) -> str:
    """SQL text mirroring _dot() exactly (same fold, same 0.0 seed)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, "
        "(acc, x) -> acc + x)"
    )


def _sq_l2_sql(a: str, b: str) -> str:
    """SQL text for the squared-L2 fold used by the PQ encode/drift
    trees: identical op chain to the zip_with/aggregate Column form."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
        "0.0D, (acc, x) -> acc + x)"
    )


def _cos_lit_sql(col: str, vs: Sequence[float]) -> str:
    """SQL text mirroring cosine_col(F.col(col), _lit_vec(vs)) exactly:
    dot / (norm(col) * norm(lit))."""
    a = _vec_sql(vs)
    return (
        f"({_dot_sql(col, a)} / (sqrt({_dot_sql(col, col)}) * "
        f"sqrt({_dot_sql(a, a)})))"
    )


def _all_finite(vs: Sequence[float]) -> bool:
    return all(map(math.isfinite, vs))


def _lit_vec(vec: Sequence[float]) -> Column:
    vs = [float(x) for x in vec]
    if vs and _all_finite(vs):
        # One expr() parse; the analyzed tree (CreateArray of double
        # Literals) is identical to the F.array(F.lit..) form below.
        return F.expr(_vec_sql(vs))
    return F.array(*[F.lit(x) for x in vs])


def cosine_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to `query_vec`. One scan; Catalyst
    plans orderBy+limit as TakeOrderedAndProject (per-partition heap, no full
    sort) — the right brute-force shape at any scale."""
    emb = F.col(vec_col).cast("array<double>")
    return (
        embeddings.select(
            F.col(id_col),
            F.round(cosine_col(emb, _lit_vec(query_vec)), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_topk_by_id(
    embeddings: DataFrame,
    probe_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """cosine_topk with the probe vector taken from the corpus by id: the
    probe rides in as a broadcast 1-row join instead of a driver-side
    collect, so the whole top-k is one Spark job with no driver round-trip."""
    probe_row = embeddings.where(F.col(id_col) == probe_id).select(
        F.col(vec_col).cast("array<double>").alias("q")
    )
    emb = F.col(vec_col).cast("array<double>")
    return (
        embeddings.join(F.broadcast(probe_row))
        .select(
            F.col(id_col),
            F.round(cosine_col(emb, F.col("q")), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def hyperplanes(dim: int, planes: int = 8, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (unit normals not required for sign
    tests). Same literals feed the Spark plan and the SQL oracle."""
    rng = np.random.RandomState(seed)
    return [[float(x) for x in row] for row in rng.randn(planes, dim)]


def lsh_bucket_assignments(
    embeddings: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-of-dot-product LSH signature: bucket = sum_j (dot(v, h_j) > 0)
    << j. Vectors in the same bucket are ANN candidates."""
    vss = [[float(x) for x in h] for h in planes]
    if vss and all(_all_finite(h) for h in vss):
        # One expr() parse for the whole plane sum (identical tree to the
        # Column loop below — same left-assoc adds, same CASE/cast
        # coercions); planes x dim literal trees were ~60 ms of py4j
        # driver time each (guide §7.3).
        col_sql = f"cast(`{vec_col}` as array<double>)"
        b = "0"
        for j, h in enumerate(vss):
            b = (
                f"({b} + (CASE WHEN ({_dot_sql(col_sql, _vec_sql(h))} > 0) "
                f"THEN {1 << j} ELSE 0 END))"
            )
        bucket = F.expr(b)
    else:
        emb = F.col(vec_col).cast("array<double>")
        bucket = F.lit(0)
        for j, h in enumerate(vss):
            bucket = bucket + F.when(
                _dot(emb, _lit_vec(h)) > 0, F.lit(1 << j)
            ).otherwise(0)
    return embeddings.select(F.col(id_col), bucket.alias("bucket")).orderBy(id_col)


def ann_topk_lsh(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    planes: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: restrict the exact scan to the probe's LSH bucket.
    At scale the bucket column is a partition/cluster key, so this prunes
    ~(1 - 1/2^planes) of the data before any arithmetic."""
    q = np.asarray(query_vec, dtype=float)
    qbucket = 0
    for j, h in enumerate(planes):
        if float(np.dot(q, np.asarray(h))) > 0:
            qbucket |= 1 << j
    buckets = lsh_bucket_assignments(embeddings, planes, id_col, vec_col)
    candidates = embeddings.join(
        buckets.where(F.col("bucket") == qbucket).select(id_col), id_col
    )
    return cosine_topk(candidates, query_vec, k, id_col, vec_col)


def ann_topk_lsh_by_id(
    embeddings: DataFrame,
    probe_id: int,
    planes: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ann_topk_lsh with the probe taken from the corpus by id, fully
    plan-side: the probe's bucket is a 1-row broadcast join (no driver
    numpy round-trip), candidates are the probe's LSH bucket, and the
    exact cosine runs only inside it. At scale `bucket` is a partition/
    cluster key, so the scan prunes ~(1 - 1/2^planes) of the corpus."""
    buckets = lsh_bucket_assignments(embeddings, planes, id_col, vec_col)
    probe_bucket = buckets.where(F.col(id_col) == probe_id).select("bucket")
    candidates = embeddings.join(
        buckets.join(F.broadcast(probe_bucket), "bucket").select(id_col), id_col
    )
    return cosine_topk_by_id(candidates, probe_id, k, id_col, vec_col)


def ivf_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest centroid
    by cosine (ties -> smallest centroid id). `centroids` is a small
    (cid, cv array<double>) dim table — the join is an explicit broadcast,
    so the 100 TB side never shuffles; the argmax is a struct-max groupBy
    (map-side combined partial aggregate — no window sort, the shuffle
    carries one pre-reduced row per vector per map task)."""
    e = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    scored = e.join(F.broadcast(centroids)).select(
        id_col,
        "cid",
        F.round(cosine_col(F.col("v"), F.col("cv")), 6).alias("score"),
    )
    # Lexicographic struct max = argmax on score with ties to smallest cid.
    best = scored.groupBy(id_col).agg(
        F.max(F.struct(F.col("score"), (-F.col("cid")).alias("ncid"))).alias("m")
    )
    return best.select(id_col, (-F.col("m.ncid")).alias("cluster"))


def centroids_from_rows(
    embeddings: DataFrame, k: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic seed centroids: the k smallest-id vectors (a k-means
    iteration refines these in a real pipeline; assignment mechanics are
    identical either way). orderBy+limit plans as TakeOrderedAndProject
    (per-partition heaps, no global sort) and — unlike the previous
    `id < k` filter — holds for ANY id distribution: hash ids, offset
    ids, or a filtered corpus slice. On dense 0..n ids the selected rows
    are identical to the old behavior, so every pinned fixture result is
    unchanged."""
    return (
        embeddings.orderBy(id_col)
        .limit(k)
        .select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        )
    )


def ivf_refine(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One k-means (Lloyd) refinement of the IVF centroids: assign every
    vector to its nearest centroid, then recompute each centroid as the
    element-wise mean of its members. The index-build iteration — run it a
    few times offline, then ivf_assign/ann_topk_ivf serve from the result.

    Shape at 100 TB: assignment is the broadcast join + struct-max argmax
    of ivf_assign (no shuffle of the corpus); the mean is posexplode to
    (cluster, dim) rows — the shuffle carries k * dim aggregate rows, the
    per-dimension avg combines map-side, and the rebuilt centroid is an
    array_agg sorted by dimension. No Python in the loop."""
    assign = ivf_assign(embeddings, centroids, id_col, vec_col)
    e = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    dims = (
        e.join(assign, id_col)
        .select("cluster", F.posexplode("v").alias("dim", "x"))
        .groupBy("cluster", "dim")
        .agg(F.avg("x").alias("m"))
    )
    return (
        dims.groupBy("cluster")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("dim"), F.col("m")))
            ).alias("pairs")
        )
        .select(
            F.col("cluster").alias("cid"),
            F.transform(F.col("pairs"), lambda p: F.round(p["m"], 6)).alias("cv"),
        )
    )


def kmeans_train(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Offline IVF index build: k deterministic seed centroids
    (centroids_from_rows) refined by `iters` full Lloyd iterations
    (ivf_refine). Returns the final (cid, cv array<double>) centroid table
    — feed it to ivf_assign / ann_topk_ivf / ann_topk_ivf_multiprobe.

    Each iteration's centroid table is at most k rows and is eagerly
    localCheckpoint'ed, so the logical plan stays one-iteration deep: the
    corpus-scale assignment replans from the checkpointed k rows, not from
    the whole training lineage. Means are rounded to 6 decimals every
    iteration (the engine-portable quantization all similarity oracles
    use), making the training trajectory reproducible across engines and
    partitionings.

    Scale shape per iteration: one broadcast-join assignment over the
    corpus (the 100 TB side never shuffles; map-side-combined struct-max
    argmax) plus a (k x dim)-row mean aggregation. The driver never holds
    more than the k centroid rows."""
    if iters < 0:
        raise ValueError("iters must be >= 0")
    cents = centroids_from_rows(embeddings, k, id_col, vec_col)
    for _ in range(iters):
        cents = ivf_refine(embeddings, cents, id_col, vec_col).localCheckpoint(
            eager=True
        )
    return cents


def ann_topk_ivf(
    embeddings: DataFrame,
    centroids: DataFrame,
    probe_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: search only the probe vector's cluster (nprobe=1).
    At scale `cluster` is the partition key, so the exact scan touches
    1/K of the corpus."""
    # Materialize the assignment once: the probe-cluster lookup, candidate
    # join, and final scan would otherwise each recompute it.
    assign = ivf_assign(embeddings, centroids, id_col, vec_col).localCheckpoint(
        eager=False
    )
    probe_cluster = assign.where(F.col(id_col) == probe_id).select("cluster")
    candidates = embeddings.join(
        assign.join(F.broadcast(probe_cluster), "cluster").select(id_col), id_col
    )
    # The probe vector rides in as a broadcast 1-row join rather than a
    # driver-side collect — the whole top-k stays one Spark job.
    probe_row = embeddings.where(F.col(id_col) == probe_id).select(
        F.col(vec_col).cast("array<double>").alias("q")
    )
    emb = F.col(vec_col).cast("array<double>")
    return (
        candidates.join(F.broadcast(probe_row))
        .select(
            F.col(id_col),
            F.round(cosine_col(emb, F.col("q")), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.99,
    block_col: Optional[str] = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicates: pairwise cosine >= threshold, blocked on
    `block_col` (same-block pairs only) to avoid the full cross join; pass
    block_col=None for the exact (quadratic) variant."""
    emb = ensure_parallelism(embeddings).select(
        F.col(id_col), *([F.col(block_col)] if block_col else []),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    if block_col:
        # One exchange on the block key + the Arrow-batched pair kernel
        # (bit-equal to the former self-join's interpreted fold — see
        # _pairwise_cos_pandas); rounding stays in the JVM.
        pairs = (
            emb.select(F.col(id_col).alias("vec_id"), "v", F.col(block_col))
            .groupBy(block_col)
            .applyInPandas(
                _pairwise_cos_pandas("vec_id", directed=False), _PAIR_COS_SCHEMA
            )
        )
        return (
            pairs.select("a", "b", F.round(F.col("cos_raw"), 6).alias("cosine"))
            .where(F.col("cosine") >= threshold)
            .orderBy("a", "b")
        )
    # Unblocked (exact quadratic) variant keeps the self-join: there is no
    # grouping key to hand the kernel, and a single whole-corpus group
    # would serialize the quadratic onto one task. Precompute each row's
    # norm once so the pair loop is a single dot product.
    emb = emb.withColumn("nrm", _norm(F.col("v"))).localCheckpoint(eager=False)
    l = emb.alias("l")
    r = emb.alias("r")
    cond = F.col(f"l.{id_col}") < F.col(f"r.{id_col}")
    return (
        l.join(r, cond)
        .select(
            F.col(f"l.{id_col}").alias("a"),
            F.col(f"r.{id_col}").alias("b"),
            F.round(
                _dot(F.col("l.v"), F.col("r.v")) / (F.col("l.nrm") * F.col("r.nrm")), 6
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .orderBy("a", "b")
    )


def semantic_dedup(
    embeddings: DataFrame,
    centroids: Optional[DataFrame] = None,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_cell: int = 1024,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster the embedding space coarsely,
    then inside each cluster mark every vector that has a same-cluster
    neighbor with cosine >= threshold and a smaller id as a duplicate —
    the keeper of each near-dup group is its smallest id. Where MinHash
    dedup catches lexical near-copies, this catches *semantic* duplicates
    (paraphrases, translations, re-renderings).

    Scale shape: the clustering is ivf_assign's broadcast-centroid argmax
    (the corpus never shuffles to cluster), and the quadratic pairwise step
    runs only WITHIN clusters — cluster is the join key, so the self-join
    shuffles each partition once and compares ~n_c^2 per cluster instead of
    n^2 overall. Norms are precomputed once so each candidate pair costs a
    single dot product.

    The within-cluster work is quadratic in cell size, so k MUST grow with
    the corpus: at fixed k a 10x corpus costs ~100x/10 = 10x more per cell
    (measured 19.7x wall at fixed k=8 vs 6.9x with k scaled 10x). When
    ``centroids`` is None the cell count is derived from ONE metadata-scale
    count: k = max(8, ceil(n / target_cell)) — expected cell ~target_cell
    rows, keeping per-cell work bounded as n grows. Pass explicit centroids
    (e.g. kmeans_train output, or a pinned k for a fixture) to override.
    """
    if centroids is None:
        n = embeddings.count()  # metadata-scale: one count over the corpus
        k = max(8, -(-n // target_cell))
        centroids = centroids_from_rows(embeddings, k, id_col, vec_col)
    assign = ivf_assign(embeddings, centroids, id_col, vec_col).localCheckpoint(
        eager=False
    )
    emb = (
        ensure_parallelism(embeddings)
        .select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
        .join(assign, id_col)
        .localCheckpoint(eager=False)
    )
    return _mark_semantic_dups(emb, threshold, id_col)


def _mark_semantic_dups(emb: DataFrame, threshold: float, id_col: str) -> DataFrame:
    """SemDeDup's within-cluster pairwise step over (id, v, cluster) rows:
    mark every vector with a same-cluster, smaller-id neighbor at cosine
    >= threshold. Shared by the per-run path (semantic_dedup) and the
    persisted-index path (semantic_dedup_from_index) so the two can never
    diverge on the pair rule. Pairs come from the Arrow-batched
    _pairwise_cos_pandas kernel (bit-equal to the former self-join's
    interpreted fold — see its docstring); the oracle's HALF_UP rounding
    stays in the JVM."""
    pairs = (
        emb.select(F.col(id_col).alias("vec_id"), F.col("v"), F.col("cluster"))
        .groupBy("cluster")
        .applyInPandas(_pairwise_cos_pandas("vec_id", directed=False), _PAIR_COS_SCHEMA)
    )
    dup_ids = (
        pairs.where(F.round(F.col("cos_raw"), 6) >= threshold)
        # kernel pairs are id-ascending (a < b): b is the larger id — the
        # vector with a smaller-id neighbor, i.e. the duplicate.
        .select(F.col("b").alias(id_col))
        .distinct()
    )
    return (
        emb.select(id_col, "cluster")
        .join(dup_ids.select(F.col(id_col), F.lit(True).alias("is_dup")), id_col, "left")
        .select(
            id_col,
            F.col("cluster"),
            F.coalesce(F.col("is_dup"), F.lit(False)).alias("is_dup"),
        )
        .orderBy(id_col)
    )


def semantic_dedup_from_index(
    spark, path: str, threshold: float = 0.95
) -> DataFrame:
    """SemDeDup served from a persisted ivf_index_build index — the
    operational form: the corpus-wide cluster assignment was paid ONCE at
    index build (and per batch at append), so every re-run of the dedup
    POLICY (a threshold sweep, a re-curation after retirements) reads the
    cluster-partitioned cells and runs only the within-cell pairwise
    step — the corpus is never re-assigned, and the self-join's shuffle
    is already materialized as the cell directories. Retired vectors
    (ivf_index_retire) are excluded exactly as a post-delete rebuild
    would.

    Bit-equal to semantic_dedup with the index's centroids: the index
    cells carry the identical row-local argmax assignment
    (plan/property-pinned), and the pair rule is the shared
    _mark_semantic_dups. Same columns: (id, cluster, is_dup) ordered.
    """
    from btrdb_server_spark.functions import index_store as ixs

    m = ixs.read_manifest(path)
    id_col = m["id_col"]
    emb = (
        ixs.minus_tombstones(
            ixs.read_table(spark, path, m, "cells"),
            ixs.read_tombstones(spark, path, m),
            id_col,
            tomb_rows=m.get("tombstone_rows"),
        )
        .select(id_col, "v", "cluster")
        .localCheckpoint(eager=False)
    )
    return _mark_semantic_dups(emb, threshold, id_col)


def _pq_parts(
    embeddings: DataFrame,
    m: int,
    k: int,
    id_col: str,
    vec_col: str,
    dim: Optional[int],
):
    """Shared PQ plumbing: the corpus exploded to (id, j, sv) subvector
    rows and the deterministic seed codebook (j, code, cv) — the first k
    vectors' subvectors, exactly pq_encode's seeds."""
    if dim is None:  # schema metadata, not a data read, when caller knows it
        dim = len(embeddings.select(vec_col).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m

    def subspaces(v):
        return F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    F.slice(v, j * sub + 1, sub).alias("sv"),
                )
                for j in range(m)
            ]
        )

    v = F.col(vec_col).cast("array<double>")
    e = ensure_parallelism(embeddings).select(
        F.col(id_col), F.explode(subspaces(v)).alias("s")
    ).select(id_col, F.col("s.j").alias("j"), F.col("s.sv").alias("sv"))
    cb = (
        embeddings.where(F.col(id_col) < k)
        .select(F.col(id_col).alias("code"), F.explode(subspaces(v)).alias("s"))
        .select("code", F.col("s.j").alias("j"), F.col("s.sv").alias("cv"))
    )
    return e, cb, sub


def _pq_l2():
    """Rounded L2 between the sv and cv columns — 6 digits before any
    argmin so oracle tie-breaks (then by code) are identical."""
    return F.round(
        F.sqrt(
            F.aggregate(
                F.zip_with(F.col("sv"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
        6,
    )


def pq_train(
    embeddings: DataFrame,
    m: int = 4,
    k: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: Optional[int] = None,
) -> DataFrame:
    """Train the PQ codebooks: per-subspace k-means under L2, with all m
    subspaces trained JOINTLY — each Lloyd iteration is ONE broadcast-join
    assignment over the exploded (vector, subspace) rows plus one
    (m x k x sub)-row mean aggregation, not m separate training loops.
    Seeds, distance, and tie rules match pq_encode exactly, so iters=0
    returns pq_encode's own seed codebooks. Returns (j, code,
    cv array<double>) — pass to pq_encode(codebook=...) to encode with
    the trained codebooks. Means round to 6 decimals each iteration (the
    engine-portable trajectory, as kmeans_train); the codebook is
    m*k rows, checkpointed between iterations so the plan stays
    one-iteration deep."""
    if iters < 0:
        raise ValueError("iters must be >= 0")
    e, cb, _sub = _pq_parts(embeddings, m, k, id_col, vec_col, dim)
    for it in range(iters):
        if it:
            # Truncate BETWEEN iterations only: each checkpoint is a full
            # job barrier, and within one iteration the codebook is
            # referenced exactly once (the broadcast join), so the seed
            # plan never replays. iters=1 — the common maintenance cycle —
            # now runs zero mid-train checkpoint jobs (was two).
            cb = cb.localCheckpoint(eager=True)
        # The subvector rides through the argmin struct ((dist, code) is
        # unique per group, so sv never acts as a comparator) — no second
        # join to recover member vectors for the mean.
        best = (
            e.join(F.broadcast(cb), "j")
            .select(id_col, "j", _pq_l2().alias("dist"), "code", "sv")
            .groupBy(id_col, "j")
            .agg(F.min(F.struct("dist", "code", "sv")).alias("b"))
        )
        dims = (
            best.select(
                "j",
                F.col("b.code").alias("code"),
                F.posexplode("b.sv").alias("dim", "x"),
            )
            .groupBy("j", "code", "dim")
            .agg(F.avg("x").alias("mv"))
        )
        cb = (
            dims.groupBy("j", "code")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col("dim"), F.col("mv")))
                ).alias("pairs")
            )
            .select(
                "j",
                "code",
                F.transform(F.col("pairs"), lambda p: F.round(p["mv"], 6)).alias(
                    "cv"
                ),
            )
        )
    return cb


def pq_encode(
    embeddings: DataFrame,
    m: int = 4,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: Optional[int] = None,
    codebook: Optional[DataFrame] = None,
) -> DataFrame:
    """Product-quantization codes (Jégou et al. 2011): split each vector
    into `m` contiguous subvectors and replace each with the id of its
    nearest codebook entry — the memory-compression step that lets an ANN
    index hold 100 TB of embeddings in RAM (dim·4 bytes → m bytes/vector).

    Default codebooks are the first `k` vectors' subvectors (deterministic,
    as centroids_from_rows); pass `codebook=pq_train(...)` to encode with
    offline-trained per-subspace k-means codebooks instead.

    Output: one row per (vector, subspace) with the chosen `code` —
    exploded rather than an array column so the oracle hash is
    representation-independent.

    Scale shape: the codebook is m·k rows and broadcasts; the corpus
    explodes to m rows per vector (map-side), joins the broadcast on the
    subspace id, and the argmin is a groupBy min(struct(dist, code)) —
    map-side combinable, no window sort, corpus never shuffles except for
    that tiny-key aggregate. L2 distances are rounded to 6 digits before
    the argmin so oracle tie-breaks (then by code) are identical.
    """
    e, cb, _sub = _pq_parts(embeddings, m, k, id_col, vec_col, dim)
    if codebook is not None:  # trained codebooks (pq_train) replace seeds
        cb = codebook
    return (
        e.join(F.broadcast(cb), "j")
        .select(id_col, "j", _pq_l2().alias("dist"), "code")
        .groupBy(id_col, "j")
        .agg(F.min(F.struct("dist", "code")).alias("best"))
        .select(
            F.col(id_col),
            F.col("j").alias("subspace"),
            F.col("best.code").alias("code"),
        )
        .orderBy(id_col, "subspace")
    )


def ann_pq_topk(
    embeddings: DataFrame,
    probe_id: int,
    m: int = 4,
    k_codes: int = 8,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: Optional[int] = None,
) -> DataFrame:
    """ANN top-k by asymmetric distance computation (ADC) over PQ codes:
    approx ||q - x||^2 ~= sum_j ||q_j - c[j, code_j(x)]||^2. The serving
    half of pq_encode — the corpus is touched only through its m-byte
    codes, never its raw vectors.

    Scale shape: the probe's distance table (m*k_codes rows — one L2 per
    codebook entry, computed against the 1-row broadcast probe) broadcasts
    to the code table; the scan is then a broadcast-hash join on (j, code)
    + a groupBy(id) sum — map-side combinable, the raw 100 TB embedding
    column is never read at query time (codes are precomputed offline).
    Per-subspace distances round to 6 before summing so the oracle's
    ranking ties identically; ties then break by id.
    """
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    sub = dim // m
    codes = pq_encode(embeddings, m, k_codes, id_col, vec_col, dim)
    probe = embeddings.where(F.col(id_col) == probe_id).select(
        F.col(vec_col).cast("array<double>").alias("q")
    )
    v = F.col(vec_col).cast("array<double>")
    cb = (
        embeddings.where(F.col(id_col) < k_codes)
        .select(
            F.col(id_col).alias("code"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("subspace"),
                            F.slice(v, j * sub + 1, sub).alias("cv"),
                        )
                        for j in range(m)
                    ]
                )
            ).alias("s"),
        )
        .select("code", F.col("s.subspace").alias("subspace"), F.col("s.cv").alias("cv"))
    )
    dtab = cb.join(F.broadcast(probe)).select(
        "subspace",
        "code",
        F.round(
            F.aggregate(
                F.zip_with(
                    F.col("cv"),
                    F.slice(F.col("q"), F.col("subspace") * sub + 1, sub),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("d"),
    )
    return (
        codes.join(F.broadcast(dtab), ["subspace", "code"])
        .groupBy(id_col)
        .agg(F.round(F.sum("d"), 6).alias("adc_dist"))
        .orderBy("adc_dist", id_col)
        .limit(k)
    )


def hard_negative_topk(
    embeddings: DataFrame,
    probe_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: the top-k vectors most
    cosine-similar to the probe whose label DIFFERS from the probe's — the
    near-miss negatives that make a contrastive batch informative (easy
    random negatives contribute ~zero gradient).

    Scale shape: identical to cosine_topk_by_id — the probe row (vector +
    label) rides in as a broadcast 1-row join, the label inequality is a
    map-side filter, and orderBy+limit plans as TakeOrderedAndProject
    (per-partition heap, no full sort). One scan, no driver round-trip;
    mine negatives for a whole probe batch by swapping the 1-row broadcast
    for the batch and grouping the heap per probe."""
    probe_row = embeddings.where(F.col(id_col) == probe_id).select(
        F.col(vec_col).cast("array<double>").alias("q"),
        F.col(label_col).alias("qlabel"),
    )
    emb = F.col(vec_col).cast("array<double>")
    return (
        embeddings.join(F.broadcast(probe_row))
        .where(F.col(label_col) != F.col("qlabel"))
        .select(
            F.col(id_col),
            F.col(label_col).cast("long").alias("label"),
            F.round(cosine_col(emb, F.col("q")), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_topk_batch(
    embeddings: DataFrame,
    probe_ids: Sequence[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batched exact top-k: ONE corpus scan serves a whole batch of probes
    (the online-serving shape — queries arrive in batches, not singly).

    Scale shape: the B probe rows broadcast and pair with the corpus
    map-side (no corpus shuffle to form pairs). Per-probe top-k is the
    salted two-phase pattern: a first window over (probe,
    spark_partition_id) cuts each scan partition to its local top-k, so the
    only full-width shuffle carries <= B*k rows per partition, then a tiny
    second window picks the global top-k per probe. A single window over
    probe alone would shuffle corpus x B rows — the difference between
    serving a batch and re-scanning per query."""
    from pyspark.sql import Window

    probes = embeddings.where(F.col(id_col).isin(list(probe_ids))).select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).cast("array<double>").alias("q"),
    )
    emb = F.col(vec_col).cast("array<double>")
    scored = (
        embeddings.join(F.broadcast(probes))
        .select(
            "probe_id",
            F.col(id_col),
            F.round(cosine_col(emb, F.col("q")), 6).alias("cosine"),
            F.spark_partition_id().alias("part"),
        )
    )
    local = Window.partitionBy("probe_id", "part").orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    pruned = (
        scored.withColumn("lrn", F.row_number().over(local))
        .where(F.col("lrn") <= k)
        .drop("lrn", "part")
    )
    final = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        pruned.withColumn("rank", F.row_number().over(final))
        .where(F.col("rank") <= k)
        .select("probe_id", id_col, F.col("rank").cast("long").alias("rank"), "cosine")
        .orderBy("probe_id", "rank")
    )


def ann_topk_ivf_multiprobe(
    embeddings: DataFrame,
    centroids: DataFrame,
    probe_id: int,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN with multi-probe (nprobe > 1): search the `nprobe` clusters
    whose centroids are closest to the probe, not just the nearest one —
    the standard recall knob for IVF indexes (a probe near a cluster
    boundary has true neighbors on both sides).

    Scale shape: the cluster ranking runs entirely on the k-row centroid
    dim table against a broadcast 1-row probe (driver never sees a vector);
    candidate selection joins the assignment table to the nprobe-row
    cluster list broadcast-side, so the corpus scan prunes to
    ~nprobe/k_clusters of the data before any exact arithmetic — at scale
    `cluster` is the partition key and the pruning is directory-level."""
    assign = ivf_assign(embeddings, centroids, id_col, vec_col)
    probe_row = embeddings.where(F.col(id_col) == probe_id).select(
        F.col(vec_col).cast("array<double>").alias("q")
    )
    ranked = centroids.join(F.broadcast(probe_row)).select(
        "cid", F.round(cosine_col(F.col("cv"), F.col("q")), 6).alias("cs")
    )
    top_clusters = (
        ranked.orderBy(F.col("cs").desc(), F.col("cid"))
        .limit(nprobe)
        .select(F.col("cid").alias("cluster"))
    )
    candidates = embeddings.join(
        assign.join(F.broadcast(top_clusters), "cluster").select(id_col), id_col
    )
    return cosine_topk_by_id(candidates, probe_id, k, id_col, vec_col)


def knn_graph(
    embeddings: DataFrame,
    centroids: Optional[DataFrame] = None,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_cell: int = 1024,
) -> DataFrame:
    """k-NN graph restricted to IVF cells: every vector's top-k cosine
    neighbors AMONG ITS OWN CLUSTER — the similarity-graph build behind
    SemDeDup-style clustering, link prediction features, and graph-based
    label propagation over a corpus. Restricting candidates to the IVF
    cell is what makes the graph buildable at all at corpus scale: the
    quadratic runs per cluster, never globally (the same bound
    semantic_dedup exploits), and the semantics are DEFINED as
    within-cell top-k, so the result is exact for its contract — not a
    recall-approximate shortcut — and oracle-checkable.

    Columns: vec_id, rank (1-based), neighbor, score (cosine rounded to 6
    — the engine-portable quantization all similarity oracles use; ties
    break to the smaller neighbor id).

    Scale shape: one broadcast-join assignment pass (the corpus never
    shuffles for it), then a self-join keyed on the cluster id and a
    row_number window whose partitions are single vectors — cluster size
    bounds both the join fan-out and every window group. As in
    semantic_dedup, the within-cell work is quadratic in cell size, so
    when ``centroids`` is None the cell count is derived from one
    metadata-scale count (n / target_cell, floor 8) to keep expected
    cell size constant as the corpus grows; pass explicit centroids
    (kmeans_train output or a pinned fixture k) to override."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    if centroids is None:
        n = embeddings.count()  # metadata-scale: one count over the corpus
        centroids = centroids_from_rows(
            embeddings, max(8, -(-n // target_cell)), id_col, vec_col
        )
    # Single-pass assignment CARRYING the vector: scoring against the
    # broadcast centroids and the struct-max argmax happen in one groupBy
    # (F.first(v) rides along — v is constant per vector), instead of
    # ivf_assign + a corpus×corpus join back on the id (which plans as a
    # SortMergeJoin with two extra full shuffles). The assigned table has
    # exactly one consumer (the pair kernel below), so no checkpoint.
    ev = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    scored = ev.join(F.broadcast(centroids)).select(
        id_col,
        "v",
        F.struct(
            F.round(cosine_col(F.col("v"), F.col("cv")), 6).alias("score"),
            (-F.col("cid")).alias("ncid"),
        ).alias("cand"),
    )
    # Pair scoring is the Arrow-batched _pairwise_cos_pandas kernel over
    # the cluster groups (bit-equal to the former self-join's interpreted
    # per-pair fold — see the kernel docstring): ONE exchange on the
    # cluster key replaces the self-join's two sides, the assignment pass
    # runs once (the kernel is the table's only vector consumer), and the
    # oracle's HALF_UP rounding stays in the JVM.
    e = (
        scored.groupBy(id_col)
        .agg(F.max("cand").alias("m"), F.first("v").alias("v"))
        .select(F.col(id_col).alias("vec_id"), "v", (-F.col("m.ncid")).alias("cluster"))
    )
    scored = (
        e.groupBy("cluster")
        .applyInPandas(_pairwise_cos_pandas("vec_id", directed=True), _PAIR_COS_SCHEMA)
        .select(
            F.col("a").alias("vec_id"),
            F.col("b").alias("neighbor"),
            F.round(F.col("cos_raw"), 6).alias("score"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("score").desc(), F.col("neighbor"))
    return (
        scored.select(
            "vec_id", "neighbor", "score", F.row_number().over(w).alias("rank")
        )
        .where(F.col("rank") <= k)
        .select("vec_id", "rank", "neighbor", "score")
        .orderBy("vec_id", "rank")
    )


def ann_recall_eval(
    embeddings: DataFrame,
    probe_ids: Sequence[int],
    planes: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k of the LSH-bucketed ANN against the exact brute-force
    scan, per probe — the quality gauge every approximate index ships
    with (is 1/2^planes of the corpus enough to keep the true
    neighbors?). recall = |ANN top-k  ∩  exact top-k| / |exact top-k|;
    exact integer counts, one double division.

    Scale shape: the exact side is cosine_topk_batch's one-scan salted
    two-phase heap; the ANN side assigns buckets in the same scan shape,
    broadcasts the B probes WITH their buckets, and pairs only
    bucket-matching candidates (~1/2^planes of the corpus) before the
    same per-probe two-phase top-k. The final intersection joins two
    B*k-row tables — negligible. Columns: probe_id, n_exact, n_hits,
    recall; ordered by probe_id."""
    from pyspark.sql import Window

    exact = cosine_topk_batch(embeddings, probe_ids, k, id_col, vec_col).select(
        "probe_id", id_col
    )
    buckets = lsh_bucket_assignments(embeddings, planes, id_col, vec_col)
    probes = (
        embeddings.where(F.col(id_col).isin(list(probe_ids)))
        .select(
            F.col(id_col).alias("probe_id"),
            F.col(vec_col).cast("array<double>").alias("q"),
        )
        .join(buckets.withColumnRenamed(id_col, "probe_id"), "probe_id")
    )
    emb = F.col(vec_col).cast("array<double>")
    scored = (
        embeddings.join(buckets, id_col)
        .join(F.broadcast(probes), "bucket")
        .select(
            "probe_id",
            F.col(id_col),
            F.round(cosine_col(emb, F.col("q")), 6).alias("cosine"),
            F.spark_partition_id().alias("part"),
        )
    )
    local = Window.partitionBy("probe_id", "part").orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    pruned = (
        scored.withColumn("lrn", F.row_number().over(local))
        .where(F.col("lrn") <= k)
        .drop("lrn", "part")
    )
    final = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    approx = (
        pruned.withColumn("rank", F.row_number().over(final))
        .where(F.col("rank") <= k)
        .select("probe_id", id_col)
    )
    hits = approx.join(exact, ["probe_id", id_col]).groupBy("probe_id").agg(
        F.count("*").alias("n_hits")
    )
    per_probe = exact.groupBy("probe_id").agg(F.count("*").alias("n_exact"))
    return (
        per_probe.join(hits, "probe_id", "left")
        .select(
            "probe_id",
            "n_exact",
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
                / F.col("n_exact").cast("double")
            ).alias("recall"),
        )
        .orderBy("probe_id")
    )


def mips_topk(
    embeddings: DataFrame,
    probe_id: int = 7,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximum-inner-product top-k with the norm-augmentation reduction
    made visible: MIPS is NOT cosine search (a long vector can win on dot
    while losing on angle), but augmenting every corpus vector with
    aug = sqrt(M^2 - |v|^2) — M the max corpus norm — and the query with
    0 turns dot ranking into cosine ranking in d+1 dims (Bachrach et al.
    2014). Emits both the raw dot and the augmented-space cosine; the
    two orderings coincide by construction (aug_cos = dot / (|q|*M)).

    Scale shape: one aggregate for M^2 (broadcast scalar), the probe a
    broadcast 1-row join, TakeOrderedAndProject top-k — the exact
    brute-force MIPS baseline an IVF/PQ serving path is measured
    against. Ranking on round(dot, 6) with id tiebreak (the repo's
    deterministic-rank convention). Columns: vec_id, dot, aug_cos."""
    emb = F.col(vec_col).cast("array<double>")
    m2 = embeddings.agg(
        F.max(_dot(emb, emb)).alias("M2")
    )
    probe_row = embeddings.where(F.col(id_col) == probe_id).select(
        F.col(vec_col).cast("array<double>").alias("q")
    )
    dot = F.round(_dot(emb, F.col("q")), 6)
    aug_cos = F.round(
        _dot(emb, F.col("q"))
        / (F.sqrt(_dot(F.col("q"), F.col("q"))) * F.sqrt(F.col("M2"))),
        6,
    )
    return (
        embeddings.join(F.broadcast(probe_row))
        .join(F.broadcast(m2))
        .select(F.col(id_col), dot.alias("dot"), aug_cos.alias("aug_cos"))
        .orderBy(F.col("dot").desc(), F.col(id_col))
        .limit(k)
    )


def sq8_topk(
    embeddings: DataFrame,
    probe_id: int = 7,
    k: int = 10,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scalar-quantization (SQ8) asymmetric ANN: compress every vector to
    one byte per dimension with per-dimension [min, max] ranges, rank by
    the dot product of the EXACT query against the DECODED corpus codes
    — the 4x-compression serving path (and its accuracy) audited against
    the exact dot on the same row.

    code_d = floor((x_d - lo_d) * 255 / (hi_d - lo_d)) (capped at 255),
    decode_d = lo_d + code_d * (hi_d - lo_d) / 255. The [lo, hi] table
    is ONE aggregate over the corpus (2*dim doubles, broadcast); codes
    never materialize corpus-wide — at serving scale the codes table is
    the stored index and this operator IS its build+probe plan fused.
    Ranking on round(approx_dot, 6) with id tiebreak. Columns: vec_id,
    approx_dot, exact_dot, err."""
    emb = F.col(vec_col).cast("array<double>")
    # One expr() parse per bound array instead of 2*dim py4j min/getItem
    # trees (identical analyzed aggregate; guide §7.3 driver-time note).
    _el = f"cast(`{vec_col}` as array<double>)"
    stats = embeddings.agg(
        F.expr(
            "array(" + ", ".join(f"min({_el}[{i}])" for i in range(dim)) + ")"
        ).alias("lo"),
        F.expr(
            "array(" + ", ".join(f"max({_el}[{i}])" for i in range(dim)) + ")"
        ).alias("hi"),
    )
    probe_row = embeddings.where(F.col(id_col) == probe_id).select(
        F.col(vec_col).cast("array<double>").alias("q")
    )
    # decoded_d as an expression over (x, lo, hi): floor in double —
    # identical IEEE sequence in the SQL oracle.
    code = lambda x, lo, hi: F.least(  # noqa: E731
        F.lit(255.0),
        F.floor(
            (x - lo) * F.lit(255.0) / F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
        ).cast("double"),
    )
    dec = lambda x, lo, hi: lo + code(x, lo, hi) * (hi - lo) / F.lit(255.0)  # noqa: E731
    decoded = F.zip_with(
        F.zip_with(emb, F.col("lo"), lambda x, lo: F.struct(x.alias("x"), lo.alias("lo"))),
        F.col("hi"),
        lambda s, hi: dec(s["x"], s["lo"], hi),
    )
    approx = F.round(_dot(decoded, F.col("q")), 6)
    exact = F.round(_dot(emb, F.col("q")), 6)
    return (
        embeddings.join(F.broadcast(probe_row))
        .join(F.broadcast(stats))
        .select(
            F.col(id_col),
            approx.alias("approx_dot"),
            exact.alias("exact_dot"),
            (approx - exact).alias("err"),
        )
        .orderBy(F.col("approx_dot").desc(), F.col(id_col))
        .limit(k)
    )


def cluster_purity(
    embeddings: DataFrame,
    quantum: float = 1e-4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Integer-exact cluster-quality audit of the labeled embedding
    cloud: for every point, is its OWN label's centroid the nearest (in
    L2), against every other label's centroid? Reported per label as
    purity = nearest-own fraction plus the mean squared intra-cluster
    distance — the kmeans/labeling QA readout.

    Exactness: embeddings quantize to 1e-4 ints (the linalg.py PCA
    discipline); a label centroid is the exact rational S_d/c, and
    ||x - S/c||^2 * c^2 = sum_d (c*x_d - S_d)^2 is an EXACT int64. The
    nearest-centroid comparison across labels with different sizes
    cross-multiplies in decimal(38,0) (m1/c1^2 < m2/c2^2 iff
    m1*c2^2 < m2*c1^2) — no float anywhere in the test (a point is
    nearest-own unless some other centroid STRICTLY beats its own, so
    exact ties keep the point); mean_intra is ONE division of exact
    integers. Scale shape: one pass for centroid sums (label-scale,
    broadcast back), one points x labels broadcast join bounded by the
    label count. Columns: label, n, nearest_own, purity,
    mean_intra_sq."""
    emb = F.col(vec_col).cast("array<double>")
    vq = F.transform(emb, lambda x: F.round(x / F.lit(quantum)).cast("long"))
    pts = embeddings.select(
        F.col(id_col).alias("pid"), F.col(label_col).alias("lab"), vq.alias("v")
    ).localCheckpoint(eager=False)
    # per-label integer component sums + counts
    cents = (
        pts.select("lab", F.posexplode("v").alias("d", "x"))
        .groupBy("lab", "d")
        .agg(F.sum("x").alias("S"))
        .groupBy("lab")
        .agg(F.array_sort(F.collect_list(F.struct("d", "S"))).alias("ds"))
        .select(
            F.col("lab").alias("clab"),
            F.transform(F.col("ds"), lambda s: s["S"]).alias("S"),
        )
    )
    sizes = pts.groupBy(F.col("lab").alias("clab")).agg(F.count("*").alias("c"))
    cb = cents.join(F.broadcast(sizes), "clab")
    # m = sum_d (c*x_d - S_d)^2  (int64), per (point, centroid)
    m_expr = F.aggregate(
        F.zip_with(
            F.col("v"),
            F.col("S"),
            lambda x, s: (F.col("c") * x - s) * (F.col("c") * x - s),
        ),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    scored = pts.join(F.broadcast(cb)).select(
        "pid",
        "lab",
        "clab",
        m_expr.alias("m"),
        (F.col("c").cast("decimal(38,0)") * F.col("c")).alias("c2"),
    )
    # exact argmin over labels: minimize m/c^2 via decimal cross-products;
    # ties break toward the point's own label, then smaller label id.
    own = scored.where(F.col("lab") == F.col("clab")).select(
        "pid", F.col("m").alias("m_own"), F.col("c2").alias("c2_own")
    )
    other = scored.where(F.col("lab") != F.col("clab"))
    beaten = (
        other.join(F.broadcast(own), "pid")
        .where(
            F.col("m").cast("decimal(38,0)") * F.col("c2_own")
            < F.col("m_own").cast("decimal(38,0)") * F.col("c2")
        )
        .select("pid")
        .distinct()
        .withColumn("beaten", F.lit(1))
    )
    flags = pts.join(beaten, "pid", "left").select(
        "lab",
        F.when(F.col("beaten").isNull(), F.lit(1)).otherwise(F.lit(0)).alias(
            "is_own"
        ),
    )
    intra = scored.where(F.col("lab") == F.col("clab")).groupBy("lab").agg(
        F.sum(F.col("m").cast("decimal(38,0)")).alias("sm"),
        F.max("c2").alias("c2"),
    )
    per = flags.groupBy("lab").agg(
        F.count("*").alias("n"), F.sum("is_own").alias("nearest_own")
    )
    qq = quantum * quantum
    return (
        per.join(intra, "lab")
        .select(
            F.col("lab").cast("long").alias("label"),
            "n",
            "nearest_own",
            (
                F.col("nearest_own").cast("double") / F.col("n").cast("double")
            ).alias("purity"),
            (
                F.col("sm").cast("double")
                / (F.col("n").cast("double") * F.col("c2").cast("double"))
                * F.lit(qq)
            ).alias("mean_intra_sq"),
        )
        .orderBy("label")
    )


def embedding_drift(
    embeddings: DataFrame,
    quantum: float = 1e-4,
    top: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension drift screen between two deterministic halves of the
    embedding corpus (vec_id parity stands in for old/new snapshots):
    for every dimension, the two-sample z of the mean difference
    against the pooled population sd — the "did the encoder move?"
    monitor a feature store runs on refresh. Emits the `top` most
    drifted dimensions (|z| desc, dim asc).

    Exactness: embeddings quantize to 1e-4 ints (the linalg.py PCA
    discipline); per-dim sums/squares are exact int64; z evaluates as
    one fixed IEEE tree over them, so it is bit-identical in any engine
    — and therefore the |z| ranking (dim tiebreak) is deterministic
    too. Scale shape: one posexplode + map-side-combined (dim x half)
    aggregate (2*dim rows), everything after is dim-scale. Columns:
    dim, z, mean_a, mean_b, n_a, n_b."""
    emb = F.col(vec_col).cast("array<double>")
    vq = F.transform(emb, lambda x: F.round(x / F.lit(quantum)).cast("long"))
    pts = embeddings.select(
        (F.col(id_col) % 2 == 0).alias("is_a"), F.posexplode(vq).alias("d", "x")
    )
    mom = pts.groupBy("d").agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("na"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).alias("nb"),
        F.sum(F.when(F.col("is_a"), F.col("x")).otherwise(0)).alias("Sa"),
        F.sum(F.when(~F.col("is_a"), F.col("x")).otherwise(0)).alias("Sb"),
        F.sum(
            F.when(F.col("is_a"), F.col("x") * F.col("x")).otherwise(0)
        ).alias("SSa"),
        F.sum(
            F.when(~F.col("is_a"), F.col("x") * F.col("x")).otherwise(0)
        ).alias("SSb"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    # pooled population variance over both halves combined
    n = d("na") + d("nb")
    S = d("Sa") + d("Sb")
    SS = d("SSa") + d("SSb")
    var = (n * SS - S * S) / (n * n)
    se = F.sqrt(var * (F.lit(1.0) / d("na") + F.lit(1.0) / d("nb")))
    z = (d("Sa") / d("na") - d("Sb") / d("nb")) / se
    from pyspark.sql import Window

    q2 = round(1.0 / quantum)
    ranked = mom.select(
        F.col("d").alias("dim"),
        z.alias("z"),
        (d("Sa") / (d("na") * F.lit(float(q2)))).alias("mean_a"),
        (d("Sb") / (d("nb") * F.lit(float(q2)))).alias("mean_b"),
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
    )
    w = Window.orderBy(F.abs(F.col("z")).desc(), F.col("dim"))
    return (
        ranked.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= top)
        .drop("rn")
        .orderBy(F.abs(F.col("z")).desc(), "dim")
    )


def ivf_recall_curve(
    embeddings: DataFrame,
    centroids: DataFrame,
    probe_ids: Sequence[int],
    k: int = 10,
    nprobes: Sequence[int] = (1, 2, 4, 8),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k vs nprobe for the IVF index, per probe — THE tuning curve
    an ANN deployment ships with: it tells you the cheapest nprobe that
    clears your recall target, which at 100 TB is the difference between
    scanning 1/64 and 1/8 of the corpus per query.

    One corpus pass serves every nprobe setting: candidates are scored
    once against the ranked-cluster table at max(nprobes), each candidate
    row then fans out only to the settings with nprobe >= its cluster
    rank, and per-(probe, nprobe) top-k runs on the already-pruned pair
    table. The exact baseline reuses cosine_topk_batch (salted two-phase
    heap). Columns: probe_id, nprobe, n_hits, recall.

    Scale shape: cluster ranking touches the centroid dim table against
    B broadcast probes; the corpus joins the assignment table once and
    meets the <= B * max(nprobes)-row ranked table broadcast-side; the
    (probe, nprobe) grid join at the end is metadata-scale."""
    from pyspark.sql import Window

    max_np = max(nprobes)
    exact = cosine_topk_batch(embeddings, probe_ids, k, id_col, vec_col).select(
        "probe_id", id_col
    )
    exn = exact.groupBy("probe_id").agg(F.count("*").alias("n_exact"))
    assign = ivf_assign(embeddings, centroids, id_col, vec_col)
    probes = embeddings.where(F.col(id_col).isin(list(probe_ids))).select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).cast("array<double>").alias("q"),
    )
    cr = centroids.join(F.broadcast(probes)).select(
        "probe_id",
        "cid",
        F.round(cosine_col(F.col("cv"), F.col("q")), 6).alias("cs"),
        "q",
    )
    wc = Window.partitionBy("probe_id").orderBy(F.col("cs").desc(), F.col("cid"))
    ranked = (
        cr.withColumn("crank", F.row_number().over(wc))
        .where(F.col("crank") <= max_np)
        .select("probe_id", F.col("cid").alias("cluster"), "crank", "q")
    )
    emb = F.col(vec_col).cast("array<double>")
    cand = (
        embeddings.join(assign, id_col)
        .join(F.broadcast(ranked), "cluster")
        .select(
            "probe_id",
            F.col(id_col),
            "crank",
            F.round(cosine_col(emb, F.col("q")), 6).alias("cosine"),
        )
    )
    np_arr = F.array(*[F.lit(int(n)) for n in nprobes])
    fanned = cand.select(
        "probe_id",
        id_col,
        "cosine",
        F.explode(F.filter(np_arr, lambda n: n >= F.col("crank"))).alias("nprobe"),
    )
    wk = Window.partitionBy("probe_id", "nprobe").orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    topk = (
        fanned.withColumn("rn", F.row_number().over(wk))
        .where(F.col("rn") <= k)
        .select("probe_id", "nprobe", id_col)
    )
    hits = (
        topk.join(exact, ["probe_id", id_col], "left_semi")
        .groupBy("probe_id", "nprobe")
        .agg(F.count("*").alias("n_hits"))
    )
    grid = exn.crossJoin(
        F.broadcast(
            embeddings.sparkSession.createDataFrame(
                [(int(n),) for n in nprobes], "nprobe int"
            )
        )
    )
    return (
        grid.join(hits, ["probe_id", "nprobe"], "left")
        .select(
            "probe_id",
            "nprobe",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
                / F.col("n_exact").cast("double")
            ).alias("recall"),
        )
        .orderBy("probe_id", "nprobe")
    )


def label_noise_screen(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Label-error mining (confident-learning-lite): build one centroid
    per LABEL (the supervised analog of ivf_refine's cluster means, same
    round-6 engine-portable quantization), score every vector against all
    label centroids, and emit the vectors whose best-matching label is
    NOT their own, ordered by how badly (margin = best cosine - own
    cosine). This is the screen a labeled-training-set pipeline runs
    before fine-tuning: the top of the list is where annotation errors
    and class confusion live.

    Scale shape: centroids are a (labels x dim)-row aggregate
    (map-side-combined posexplode avg); scoring joins the corpus against
    the label-count-row centroid table broadcast-side (the corpus never
    shuffles); the argmax is a struct-max aggregate. Columns: vec_id,
    label, pred_label, own_cos, pred_cos, margin; suspects only,
    worst-margin first."""
    e = embeddings.select(
        F.col(id_col),
        F.col(label_col).alias("label"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    dims = (
        e.select("label", F.posexplode("v").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.avg("x").alias("m"))
    )
    cent = (
        dims.groupBy("label")
        .agg(
            F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("pairs")
        )
        .select(
            F.col("label").alias("cid"),
            F.transform("pairs", lambda p: F.round(p["m"], 6)).alias("cv"),
        )
    )
    scored = e.crossJoin(F.broadcast(cent)).select(
        id_col,
        "label",
        "cid",
        F.round(cosine_col(F.col("v"), F.col("cv")), 6).alias("cs"),
    )
    best = scored.groupBy(id_col, "label").agg(
        F.max(F.struct(F.col("cs"), (-F.col("cid")).alias("ncid"))).alias("b")
    )
    own = scored.where(F.col("cid") == F.col("label")).select(
        id_col, F.col("cs").alias("own_cos")
    )
    return (
        best.select(
            id_col,
            "label",
            (-F.col("b.ncid")).alias("pred_label"),
            F.col("b.cs").alias("pred_cos"),
        )
        .join(own, id_col)
        .where(F.col("pred_label") != F.col("label"))
        .select(
            id_col,
            "label",
            "pred_label",
            "own_cos",
            "pred_cos",
            (F.col("pred_cos") - F.col("own_cos")).alias("margin"),
        )
        .orderBy(F.desc("margin"), id_col)
    )


def _centroids_path(path: str, m: dict) -> str:
    """Committed centroid generation (pre-generation manifests fall back
    to the legacy flat `centroids` dir)."""
    return os.path.join(path, m.get("centroids") or "centroids")


def ivf_index_build(
    embeddings: DataFrame,
    path: str,
    centroids: DataFrame | None = None,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist an IVF index for repeated ANN serving: the k-row centroid
    table plus the corpus vectors partitioned BY CLUSTER on disk.

    The in-memory IVF family (ann_topk_ivf / ann_topk_ivf_multiprobe)
    re-runs assignment on every query; an index that serves many probes
    should pay assignment once and lay the corpus out so a probe reads
    only its clusters. partitionBy("cluster") makes each cell a parquet
    directory, so ann_index_topk's literal cluster predicate prunes at the
    DIRECTORY level — a probe reads ~nprobe/k of the corpus bytes, which
    is the entire economics of IVF at 100 TB.

    Build: the ASSIGNMENT is a single map-only pass — the k centroids are
    collected (k rows — configuration, not data) and the nearest-centroid
    argmax runs row-local against literal vectors, bit-identical to
    ivf_assign's broadcast-join argmax (same rounded cosine, same
    ties-to-smallest-cid lexicographic max); no join, no shuffle
    (plan-pinned in tests/test_plans.py). The WRITE then clusters rows by
    cell with one repartition exchange — without it every scan task cuts
    a file per cluster it holds (tasks x k tiny files; measured 256 files
    vs 8 at sf0.1, and 10M files for a 10k-task append over a 1k-cell
    layout at 100 TB).

    Reference analogy: the reference serves stat queries from its
    persisted aggregate tree instead of re-scanning points
    (qtree.go:925-947); this is the same precompute-then-prune discipline
    for similarity search.
    """
    from btrdb_server_spark.functions import index_store as ixs

    if centroids is None:
        centroids = centroids_from_rows(embeddings, k, id_col, vec_col)
    with ixs.writer_lock(path):  # single-writer maintenance, enforced
        m = ixs.init_index(path, ["cells"], id_col=id_col)
        # Centroids are generationed like the cells: a REBUILD writes new
        # centroids beside the old ones and the manifest flip commits
        # centroids + cells together — a crash mid-rebuild can never leave
        # new centroids serving old cells (which would be silently wrong
        # probes, not an error).
        cdir = f"centroids.gen{m['gen_seq']}"
        m["centroids"] = cdir
        centroids.write.mode("overwrite").parquet(os.path.join(path, cdir))
        # Read the PERSISTED rows back rather than collect()ing the lineage:
        # one execution of the centroid job instead of two, and the cells are
        # guaranteed assigned against exactly the centroids the index stores
        # (a non-deterministic centroid source would otherwise diverge them).
        cent_rows = sorted(
            embeddings.sparkSession.read.parquet(os.path.join(path, cdir)).collect(),
            key=lambda r: r["cid"],
        )
        # Cluster rows by the layout key before the write (one file set
        # per cluster, not tasks x clusters tiny files — same rationale
        # and same measured tradeoff as ixs.write_partitioned_batch).
        _assigned_cells(embeddings, cent_rows, id_col, vec_col).repartition(
            "cluster"
        ).write.partitionBy("cluster").parquet(
            ixs.table_batch_dir(path, m, "cells", 0)
        )
        ixs.write_manifest(path, m)  # atomic commit: nothing live before this


def _assigned_cells(
    embeddings: DataFrame,
    cent_rows,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, v, cluster) with the nearest-centroid argmax computed row-local
    against LITERAL centroid vectors: array_max over (score, -cid) structs
    is the same lexicographic max ivf_assign aggregates, so assignments
    are bit-identical — but the plan is map-only (no join, no shuffle),
    which is what lets ivf_index_build cluster a 100 TB corpus in one
    pass. Staged select so the cast vector is computed once, not once per
    centroid expression."""
    staged = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    return staged.select(
        id_col, "v", _nearest_centroid_col(cent_rows).alias("cluster")
    )


def _nearest_centroid_col(cent_rows) -> Column:
    """Row-local nearest-centroid argmax over the `v` column against
    LITERAL centroid vectors: array_max over (score, -cid) structs is the
    same lexicographic max ivf_assign aggregates (rounded cosine, ties to
    the smallest cid), but with no join and no shuffle — shared by the
    IVF and PQ index builds."""
    rows = [(int(r["cid"]), [float(x) for x in r["cv"]]) for r in cent_rows]
    if rows and all(_all_finite(cv) for _, cv in rows):
        # One expr() parse of the whole candidate array (the analyzed
        # tree matches the F.struct/F.round Column form element for
        # element) — k centroids x dim literals was seconds of py4j
        # driver time per build call (guide §7.3).
        scored = F.expr(
            "array("
            + ", ".join(
                f"named_struct('score', round({_cos_lit_sql('v', cv)}, 6), "
                f"'ncid', {-cid})"
                for cid, cv in rows
            )
            + ")"
        )
    else:
        scored = F.array(
            *[
                F.struct(
                    F.round(cosine_col(F.col("v"), _lit_vec(cv)), 6).alias(
                        "score"
                    ),
                    F.lit(-cid).alias("ncid"),
                )
                for cid, cv in rows
            ]
        )
    return -F.array_max(scored)["ncid"]


def ann_index_topk(
    spark,
    path: str,
    probe_vec: Sequence[float],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k cosine neighbors of `probe_vec` from a persisted
    ivf_index_build index, searching the `nprobe` nearest cells.

    The centroid ranking runs on the k-row centroid table; the resulting
    nprobe cluster ids are collected (nprobe INTEGERS — not data) because
    only a LITERAL partition predicate lets the parquet source prune cell
    directories before the scan. Exact cosine then runs only inside the
    selected cells. Columns: vec_id, cosine — ordered, k rows.
    """
    from btrdb_server_spark.functions import index_store as ixs

    m = ixs.read_manifest(path)
    id_col = m["id_col"]
    q = _lit_vec([float(x) for x in probe_vec])
    cents = spark.read.parquet(_centroids_path(path, m))
    ranked = cents.select(
        "cid", F.round(cosine_col(F.col("cv"), q), 6).alias("cs")
    )
    top = [
        r.cid
        for r in ranked.orderBy(F.col("cs").desc(), "cid").limit(nprobe).collect()
    ]
    cells = ixs.minus_tombstones(
        ixs.read_table(spark, path, m, "cells").where(
            F.col("cluster").isin(top)
        ),
        ixs.read_tombstones(spark, path, m),
        id_col,
        tomb_rows=m.get("tombstone_rows"),
    )
    return (
        cells.select(
            F.col(id_col),
            F.round(cosine_col(F.col("v"), q), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), id_col)
        .limit(k)
    )


def ivf_index_stats(spark, path: str) -> DataFrame:
    """Cell-balance audit of a persisted ivf_index_build index: per
    cluster, the vector count and its share of the corpus.

    This is the staleness gauge for a fixed-centroid index: as the corpus
    grows, drifted data piles into few cells, and a probe that should
    read ~nprobe/k of the bytes reads a fat cell instead. Read off the
    cells' partition column alone — parquet can answer it from footer
    row counts; vectors are never deserialized (the `v` column is pruned).

    Columns: cluster, n_vecs, frac — ordered by cluster. On an index with
    live tombstones the retired ids are excluded (the anti-join needs the
    id column, so the footer-only fast path applies only to a compacted
    or never-retired index).
    """
    from btrdb_server_spark.functions import index_store as ixs

    m = ixs.read_manifest(path)
    tomb = ixs.read_tombstones(spark, path, m)
    cells = ixs.minus_tombstones(
        ixs.read_table(spark, path, m, "cells").select(
            m["id_col"], "cluster"
        ),
        tomb,
        m["id_col"],
        tomb_rows=m.get("tombstone_rows"),
    ).select("cluster")
    per = cells.groupBy("cluster").agg(F.count("*").cast("long").alias("n_vecs"))
    total = per.agg(F.sum("n_vecs").alias("t"))
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            "cluster",
            "n_vecs",
            (F.col("n_vecs") / F.col("t")).alias("frac"),
        )
        .orderBy("cluster")
    )


def ivf_index_append(
    new_embeddings: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Fold a new vector batch into a persisted ivf_index_build index —
    the maintenance path: assign ONLY the batch against the index's OWN
    persisted centroids (read back, k rows) with the same row-local
    argmax the build used, and append into the cluster-partitioned cells.

    Append-then-probe is BIT-EQUAL to a full rebuild with the same
    centroids (assignment is a pure per-row function of the centroid
    table), proven by the ann_index_incremental driver entry against the
    full-corpus oracle. Centroids do drift as the corpus grows —
    ivf_index_stats is the cell-balance gauge that says when to re-train
    and re-bucket (a full rebuild, like the store's re-bucketing
    compaction).
    """
    from btrdb_server_spark.functions import index_store as ixs

    spark = new_embeddings.sparkSession
    with ixs.writer_lock(path):  # single-writer maintenance, enforced
        m = ixs.read_manifest(path)
        n = ixs.next_batch(m)
        cent_rows = sorted(
            spark.read.parquet(_centroids_path(path, m)).collect(),
            key=lambda r: r["cid"],
        )
        cells = _assigned_cells(new_embeddings, cent_rows, m["id_col"], vec_col)
        if not ixs.write_partitioned_batch(
            cells, ixs.table_batch_dir(path, m, "cells", n), "cluster"
        ):
            return  # empty batch: a committed no-op (see pq_index_append)
        ixs.mark_table(m, "cells", 1, cells.schema)  # revive after empty compact
        m["batches"] = m["batches"] + [n]
        ixs.write_manifest(path, m)  # atomic commit of the batch


def ivf_index_retire(spark, path: str, ids) -> int:
    """Retire vectors from a persisted ivf_index_build index — the
    takedown / re-curation path: a deleted document's embedding must stop
    surfacing as a neighbor. Records the ids in the tombstone set WITHOUT
    rewriting cells; ann_index_topk and ivf_index_stats anti-join the
    broadcast set, so retire-then-probe is BIT-EQUAL to a rebuild (same
    centroids) on the post-delete corpus. Bytes are reclaimed by
    ivf_index_compact — tombstone now, rewrite in the background, the
    reference's Obliterate protocol (metaprovider.go:339-427).

    Idempotent; cost is one id-column scan of the cells plus a
    metadata-scale tombstone rewrite. Returns the count newly retired.
    """
    from btrdb_server_spark.functions import index_store as ixs

    return ixs.retire_table_ids(spark, path, "cells", ids)


def ivf_index_compact(spark, path: str) -> dict:
    """Fold an IVF index's append fragments and drop its retired vectors:
    rewrite the live cells into ONE fresh generation (re-sharded by
    cluster so each cell directory collapses to a few fat files — and
    ivf_index_stats regains its footer-only fast path), flip the manifest
    atomically; superseded generations and the tombstone set are retained
    until the NEXT maintenance op (two-generation retention). Probe answers are unchanged (compact-then-probe == tombstone-
    view probe == post-delete rebuild, driver-proven). Centroids are
    untouched — re-training drifted centroids is a REBUILD, not a
    compact (ivf_index_stats is the gauge for when). Mirrors
    store.compact()'s generation discipline (store.py:406-520).
    Returns {rows, gen}.
    """
    from btrdb_server_spark.functions import index_store as ixs

    return ixs.compact_partitioned_table(spark, path, "cells", "cluster")


# ------------------------------------------------------------- IVF-PQ -----
# The persisted compressed-code ANN index: IVF coarse cells + product-
# quantization codes INSTEAD of raw vectors in the cells. ivf_index_build
# stores dim*8 bytes/vector; at 100 TB of embeddings the flat cells are
# IO-bound even after directory pruning. Here a cell row is (id, m codes)
# — m bytes/vector at k_codes <= 128 — so a probe's bytes scale with the
# CODE table, not the vectors (Jégou et al. 2011, IVFADC). The quantizer
# (coarse centroids + per-subspace codebooks) is FROZEN at build time and
# versioned with the index — appends encode against it (a pure per-row
# function, so append-then-probe == rebuild bit-exactly), retire/compact
# follow the shared index_store lifecycle, and re-training is a REBUILD
# (new generation, atomic flip), never an in-place mutation.


def _pq_codebook_seed(
    embeddings: DataFrame,
    m: int,
    k_codes: int,
    id_col: str,
    vec_col: str,
    dim: int,
) -> DataFrame:
    """Seed codebooks (j, code, cv): the first `k_codes` vectors'
    subvectors — exactly pq_encode's deterministic default, so an index
    built with the default codebook is code-identical to pq_encode."""
    sub = dim // m
    v = F.col(vec_col).cast("array<double>")
    return (
        embeddings.where(F.col(id_col) < k_codes)
        .select(
            F.col(id_col).cast("int").alias("code"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            F.slice(v, j * sub + 1, sub).alias("cv"),
                        )
                        for j in range(m)
                    ]
                )
            ).alias("s"),
        )
        .select(F.col("s.j").alias("j"), "code", F.col("s.cv").alias("cv"))
    )


def _pq_assigned_codes(
    embeddings: DataFrame,
    cent_rows,
    cb_rows,
    m: int,
    sub: int,
    code_type: str,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, codes array, cluster): coarse assignment AND PQ encoding in
    ONE map-only pass — both argmins run row-local against LITERAL
    centroid/codebook vectors (no join, no shuffle; the dynamic-partition
    write is the only fan-out), which is what lets the build pass over a
    100 TB corpus once. Bit-identical to pq_encode: the same rounded
    subvector L2 (_pq_l2's round(sqrt(...), 6)) feeds the same
    lexicographic (dist, code) min — array_min over structs instead of
    groupBy(min(struct)). Subvector slices are STAGED as their own
    projection (no codegen subexpression elimination inside
    higher-order-function lambdas — each slice would otherwise be
    re-evaluated per codebook entry)."""
    by_j: dict[int, list] = {}
    for r in cb_rows:
        by_j.setdefault(int(r["j"]), []).append(
            (int(r["code"]), [float(x) for x in r["cv"]])
        )

    sql_ok = all(
        _all_finite(cv) for cands in by_j.values() for _, cv in cands
    )

    def code_col(j: int) -> Column:
        if sql_ok:
            # One expr() parse per subspace instead of k_codes py4j
            # literal/lambda trees (~60 ms EACH on the driver — the
            # build's dominant cost at sf0.1 was plan construction, not
            # the job; guide §7.3). Parsed tree identical to the Column
            # form below.
            cands = ", ".join(
                f"named_struct('dist', round(sqrt("
                f"{_sq_l2_sql(f'_sv{j}', _vec_sql(cv))}), 6), "
                f"'code', {code})"
                for code, cv in sorted(by_j[j])
            )
            return F.expr(f"array_min(array({cands}))")["code"].cast(
                code_type
            )
        sv = F.col(f"_sv{j}")
        cands = F.array(
            *[
                F.struct(
                    F.round(
                        F.sqrt(
                            F.aggregate(
                                F.zip_with(
                                    sv,
                                    _lit_vec(cv),
                                    lambda x, y: (x - y) * (x - y),
                                ),
                                F.lit(0.0),
                                lambda acc, x: acc + x,
                            )
                        ),
                        6,
                    ).alias("dist"),
                    F.lit(code).alias("code"),
                )
                for code, cv in sorted(by_j[j])
            ]
        )
        return F.array_min(cands)["code"].cast(code_type)

    staged = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    staged = staged.select(
        id_col,
        "v",
        *[
            F.slice(F.col("v"), j * sub + 1, sub).alias(f"_sv{j}")
            for j in range(m)
        ],
    )
    return staged.select(
        F.col(id_col),
        F.array(*[code_col(j) for j in range(m)]).alias("codes"),
        _nearest_centroid_col(cent_rows).alias("cluster"),
    )


def pq_index_build(
    embeddings: DataFrame,
    path: str,
    centroids: DataFrame | None = None,
    k: int = 8,
    m: int = 4,
    k_codes: int = 8,
    codebook: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: Optional[int] = None,
) -> None:
    """Persist an IVF-PQ index: the k-row coarse centroid table, the
    (m x k_codes)-row PQ codebooks, and the corpus as (id, codes)
    partitioned BY CLUSTER — raw vectors are NOT stored.

    Completes the ANN index story ivf_index_build starts: the flat index
    prunes cell DIRECTORIES but still reads dim*8 B/vector inside them;
    this one reads m B/vector (8-bit codes), so probe bytes drop by
    ~dim*8/m while keeping the same directory-level partition pruning.
    Default quantizers are deterministic (centroids_from_rows seeds +
    pq_encode's seed codebooks); pass centroids=/codebook= (pq_train) for
    trained ones. Both are written as versioned generations and committed
    by the SAME atomic manifest flip as the cells — a crash mid-(re)build
    can never leave a new quantizer serving old codes.

    Build is ONE map-only pass (coarse argmax + m code argmins, all
    row-local against literal vectors — no join, no shuffle; plan-pinned
    in tests/test_plans.py). Reference analogy: precompute-then-prune,
    the persisted aggregate tree discipline (qtree.go:925-947), with the
    store's manifest/tombstone lifecycle (functions/index_store.py).
    """
    from btrdb_server_spark.functions import index_store as ixs

    spark = embeddings.sparkSession
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    code_type = "tinyint" if k_codes <= 127 else "smallint"
    if centroids is None:
        centroids = centroids_from_rows(embeddings, k, id_col, vec_col)
    if codebook is None:
        codebook = _pq_codebook_seed(embeddings, m, k_codes, id_col, vec_col, dim)
    else:  # pq_train shape: (j, code, cv)
        codebook = codebook.select(
            F.col("j").cast("int").alias("j"),
            F.col("code").cast("int").alias("code"),
            F.col("cv").cast("array<double>").alias("cv"),
        )
    with ixs.writer_lock(path):  # single-writer maintenance, enforced
        mst = ixs.init_index(
            path,
            ["cells"],
            id_col=id_col,
            params={"m": m, "k_codes": k_codes, "dim": dim, "sub": sub, "k": k},
        )
        cdir = f"centroids.gen{mst['gen_seq']}"
        mst["centroids"] = cdir
        centroids.write.mode("overwrite").parquet(os.path.join(path, cdir))
        bdir = f"codebooks.gen{mst['gen_seq']}"
        mst["codebooks"] = bdir
        codebook.write.mode("overwrite").parquet(os.path.join(path, bdir))
        # Quantizers read back from their PERSISTED generations (k and
        # m*k_codes rows — configuration, not data): the cells are encoded
        # against exactly the quantizer the index stores.
        cent_rows = sorted(
            spark.read.parquet(os.path.join(path, cdir)).collect(),
            key=lambda r: r["cid"],
        )
        cb_rows = spark.read.parquet(os.path.join(path, bdir)).collect()
        # The exact persisted codebook row count — the probe's truncation
        # guard (a trained codebook may legitimately hold fewer than
        # m*k_codes rows, so the count is recorded, not assumed).
        mst["params"]["cb_rows"] = len(cb_rows)
        _pq_assigned_codes(
            embeddings, cent_rows, cb_rows, m, sub, code_type, id_col, vec_col
        ).repartition("cluster").write.partitionBy(
            "cluster"
        ).parquet(ixs.table_batch_dir(path, mst, "cells", 0))
        ixs.write_manifest(path, mst)  # atomic commit: nothing live before


def pq_index_topk(
    spark,
    path: str,
    probe_vec: Sequence[float],
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """Top-k ADC neighbors of `probe_vec` from a persisted pq_index_build
    index, searching the `nprobe` nearest coarse cells.

    The probe touches three tiny tables (centroids, codebooks, the
    m*k_codes-row distance table — all configuration-scale) and ONLY the
    code cells of its nprobe clusters: the cluster ids are collected
    (nprobe INTEGERS) because only a LITERAL partition predicate prunes
    cell directories before the scan, and the distance table is collected
    (m*k_codes DOUBLES — configuration, not data) into per-subspace
    LITERAL arrays indexed row-locally by each vector's code bytes. The
    ADC sum is therefore one map-only projection over the pruned code
    scan straight into TakeOrderedAndProject — ZERO joins, ZERO
    exchanges, no per-subspace row inflation (the r11 shape exploded m
    rows per vector into a broadcast join + groupBy; plan pinned in
    tests/test_plans.py). Raw vectors are never read — they are not even
    stored. Scores are bit-equal to ann_pq_topk over the live corpus when
    nprobe covers the probed vectors' cells (exactly ann_pq_topk when
    nprobe = k): the same per-subspace round-6 squared L2, summed in the
    same subspace order, the same round-6 total, ties by id.
    Columns: <id>, adc_dist — ordered, k rows."""
    from btrdb_server_spark.functions import index_store as ixs

    m_ = ixs.read_manifest(path)
    id_col = m_["id_col"]
    p = m_["params"]
    sub = int(p["sub"])
    q = [float(x) for x in probe_vec]
    cents = spark.read.parquet(_centroids_path(path, m_))
    ranked = cents.select(
        "cid", F.round(cosine_col(F.col("cv"), _lit_vec(q)), 6).alias("cs")
    )
    top = [
        r.cid
        for r in ranked.orderBy(F.col("cs").desc(), "cid").limit(nprobe).collect()
    ]
    cb = spark.read.parquet(os.path.join(path, m_["codebooks"]))
    # Per-(subspace, code) squared L2 to the probe — the SAME JVM
    # expression the r11 broadcast-join shape evaluated, so the collected
    # values are bit-identical; m*k_codes rows is quantizer configuration,
    # not data (the codebook itself was already collected at build time).
    dtab = cb.select(
        F.col("j").cast("int").alias("subspace"),
        F.col("code").cast("int").alias("code"),
        F.round(
            F.aggregate(
                F.zip_with(
                    F.col("cv"),
                    F.slice(_lit_vec(q), F.col("j") * sub + 1, sub),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("d"),
    ).collect()
    m = int(p["m"])
    k_codes = int(p["k_codes"])
    # A codebook parquet missing entries relative to the row count the
    # build recorded (truncated write, params drift) must fail LOUDLY:
    # an unset slot would otherwise score distance 0 — the best possible
    # — and silently corrupt the top-k ranking. `cb_rows` is the exact
    # count the build/re-encode persisted (a TRAINED codebook may hold
    # fewer than m*k_codes rows — a seed code that wins no vectors drops
    # out of pq_train's means — so m*k_codes alone is not the truth);
    # legitimately-absent codes score +inf (no stored cell references
    # them, but never silently 0).
    expected = int(p.get("cb_rows", m * k_codes))
    if len(dtab) != expected:
        raise ValueError(
            f"persisted codebooks incomplete for {path}: "
            f"{len(dtab)} (j, code) entries != recorded cb_rows {expected}"
        )
    dist: dict[int, list] = {j: [None] * k_codes for j in range(m)}
    for r in dtab:
        j, c = int(r["subspace"]), int(r["code"])
        if not (0 <= j < m and 0 <= c < k_codes):
            raise ValueError(
                f"codebook entry (j={j}, code={c}) outside params "
                f"m={m}, k_codes={k_codes} for {path}"
            )
        if dist[j][c] is not None:
            raise ValueError(
                f"duplicate codebook entry (j={j}, code={c}) for {path}"
            )
        dist[j][c] = float(r["d"])
    inf = float("inf")
    dist = {
        j: [inf if x is None else x for x in dist[j]] for j in range(m)
    }
    cells = ixs.minus_tombstones(
        ixs.read_table(spark, path, m_, "cells").where(
            F.col("cluster").isin(top)
        ),
        ixs.read_tombstones(spark, path, m_),
        id_col,
        tomb_rows=m_.get("tombstone_rows"),
    )
    # Row-local ADC: index each subspace's literal distance array by the
    # stored code byte and add the m terms left-to-right — the identical
    # IEEE sequence the exploded shape produced (posexplode emitted
    # subspaces in order within one partition, so its partial sum folded
    # j-ascending too), with no Exchange and no Join on the serving path.
    adc = F.element_at(F.lit(dist[0]), F.col("codes").getItem(0).cast("int") + 1)
    for j in range(1, m):
        adc = adc + F.element_at(
            F.lit(dist[j]), F.col("codes").getItem(j).cast("int") + 1
        )
    return (
        cells.select(F.col(id_col), F.round(adc, 6).alias("adc_dist"))
        .orderBy("adc_dist", id_col)
        .limit(k)
    )


def pq_index_stats(spark, path: str) -> DataFrame:
    """Cell-balance audit of a persisted pq_index_build index: per
    cluster, the code-row count and corpus share — the same staleness
    gauge as ivf_index_stats (drifted data piling into few cells defeats
    the nprobe/k byte economics). Footer-only on a compacted or
    never-retired index. Columns: cluster, n_vecs, frac — by cluster."""
    from btrdb_server_spark.functions import index_store as ixs

    m_ = ixs.read_manifest(path)
    cells = ixs.minus_tombstones(
        ixs.read_table(spark, path, m_, "cells").select(m_["id_col"], "cluster"),
        ixs.read_tombstones(spark, path, m_),
        m_["id_col"],
        tomb_rows=m_.get("tombstone_rows"),
    ).select("cluster")
    per = cells.groupBy("cluster").agg(F.count("*").cast("long").alias("n_vecs"))
    total = per.agg(F.sum("n_vecs").alias("t"))
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            "cluster", "n_vecs", (F.col("n_vecs") / F.col("t")).alias("frac")
        )
        .orderBy("cluster")
    )


def pq_index_drift(
    spark,
    path: str,
    embeddings: DataFrame,
    vec_col: str = "embedding",
    sample_mod: int = 3,
) -> DataFrame:
    """Quantizer-staleness gauge for a persisted pq_index_build index:
    the QUANTIZATION RESIDUAL — per sampled vector, the squared L2
    between the vector and its PQ reconstruction, i.e. exactly the error
    term ADC adds to every probe distance — over the deterministic
    sample `id % sample_mod == 0` of `embeddings`.

    This is the drift METRIC the stats entry lacked (cell balance says
    the coarse centroids drifted; this says the CODEBOOKS no longer fit
    the data): gauge it at build time, re-gauge it on each new append
    batch (pass the batch as `embeddings` — the quantizer is frozen, so
    re-encoding here is bit-identical to what pq_index_append stores),
    and REBUILD with a re-trained quantizer (pq_train) when the mean
    residual on new data grows past ~2x its build-time value — at that
    point ADC ranking quality, not just cell balance, is degrading.

    Plan shape: one map-only pass over the sampled vectors (per-subspace
    literal-codebook distance arrays, row-local min — no join, no
    shuffle) into a single global aggregate. Residuals are quantized to
    int64 micro-units before summing, so the mean is order-independent
    and bit-stable across engines and partitionings.

    Columns (1 row): n_sampled, mean_resid, max_resid."""
    from btrdb_server_spark.functions import index_store as ixs

    m_ = ixs.read_manifest(path)
    p = m_["params"]
    m, sub, k_codes = int(p["m"]), int(p["sub"]), int(p["k_codes"])
    id_col = m_["id_col"]
    cb_rows = spark.read.parquet(os.path.join(path, m_["codebooks"])).collect()
    # Codes PRESENT per subspace (a trained codebook legitimately drops
    # codes that won no vectors — pq_index_reencode); the residual min
    # runs over what the quantizer can actually encode to, exactly the
    # oracle's min over the persisted cb rows.
    by_j: dict[int, list] = {}
    for r in cb_rows:
        by_j.setdefault(int(r["j"]), []).append([float(x) for x in r["cv"]])
    missing = [j for j in range(m) if not by_j.get(j)]
    if missing:
        raise ValueError(
            f"persisted codebooks empty for subspaces {missing} of {path}"
        )
    sample = embeddings.where(
        F.col(id_col) % F.lit(int(sample_mod)) == 0
    ).select(F.col(vec_col).cast("array<double>").alias("v"))
    staged = sample.select(
        *[F.slice("v", j * sub + 1, sub).alias(f"_sv{j}") for j in range(m)]
    )

    def _dist(j: int, cv: list):
        # Same round-6 squared L2 as the ADC distance table (and the
        # oracle's round(power(list_distance, 2), 6)).
        return F.round(
            F.aggregate(
                F.zip_with(
                    F.col(f"_sv{j}"),
                    _lit_vec(cv),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        )

    sql_ok = all(_all_finite(cv) for cvs in by_j.values() for cv in cvs)
    if sql_ok:
        # One expr() parse per subspace (identical tree to the _dist
        # Column form) — m*k_codes py4j lambda trees were the gauge's
        # dominant driver-side cost; see _pq_assigned_codes.
        dq = [
            F.round(
                F.expr(
                    "array_min(array("
                    + ", ".join(
                        f"round({_sq_l2_sql(f'_sv{j}', _vec_sql(cv))}, 6)"
                        for cv in by_j[j]
                    )
                    + "))"
                )
                * F.lit(1e6)
            ).cast("long")
            for j in range(m)
        ]
    else:
        dq = [
            F.round(
                F.array_min(F.array(*[_dist(j, cv) for cv in by_j[j]]))
                * F.lit(1e6)
            ).cast("long")
            for j in range(m)
        ]
    resid_q = dq[0]
    for term in dq[1:]:
        resid_q = resid_q + term
    return staged.select(resid_q.alias("rq")).agg(
        F.count(F.lit(1)).cast("long").alias("n_sampled"),
        (
            F.sum("rq").cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(1e6)
        ).alias("mean_resid"),
        (F.max("rq").cast("double") / F.lit(1e6)).alias("max_resid"),
    )


def pq_index_append(
    new_embeddings: DataFrame,
    path: str,
    vec_col: str = "embedding",
) -> None:
    """Fold a new vector batch into a persisted pq_index_build index:
    encode ONLY the batch against the index's own persisted quantizer
    (centroids + codebooks read back — the quantizer is FROZEN; assignment
    and encoding are pure per-row functions of it), append into the
    cluster-partitioned cells, commit with one atomic manifest flip.
    Append-then-probe is BIT-EQUAL to a full rebuild with the same
    quantizer (driver-proven by pq_index_incremental against the
    full-corpus oracle). Quantizer drift shows up in pq_index_stats; the
    remedy is a re-trained REBUILD, like the store's re-bucketing
    compaction."""
    from btrdb_server_spark.functions import index_store as ixs

    spark = new_embeddings.sparkSession
    with ixs.writer_lock(path):  # single-writer maintenance, enforced
        m_ = ixs.read_manifest(path)
        p = m_["params"]
        id_col = m_["id_col"]
        n = ixs.next_batch(m_)
        cent_rows = sorted(
            spark.read.parquet(_centroids_path(path, m_)).collect(),
            key=lambda r: r["cid"],
        )
        cb_rows = spark.read.parquet(os.path.join(path, m_["codebooks"])).collect()
        code_type = "tinyint" if int(p["k_codes"]) <= 127 else "smallint"
        cells = _pq_assigned_codes(
            new_embeddings,
            cent_rows,
            cb_rows,
            int(p["m"]),
            int(p["sub"]),
            code_type,
            id_col,
            vec_col,
        )
        if not ixs.write_partitioned_batch(
            cells, ixs.table_batch_dir(path, m_, "cells", n), "cluster"
        ):
            # Empty batch: clearing a fully-retired index's empty_tables
            # mark for ZERO new rows would break the next read (the write
            # leaves a file-less dir) — commit nothing.
            return
        ixs.mark_table(m_, "cells", 1, cells.schema)  # revive after empty compact
        m_["batches"] = m_["batches"] + [n]
        ixs.write_manifest(path, m_)  # atomic commit of the batch


def pq_index_retire(spark, path: str, ids) -> int:
    """Retire vectors from a persisted pq_index_build index — tombstone
    set + broadcast-guarded anti-join on every probe, zero cell bytes
    rewritten; bit-equal to a rebuild (same frozen quantizer) on the
    post-delete corpus. See index_store.retire_table_ids (shared with
    the IVF and LSH indexes). Returns the count newly retired."""
    from btrdb_server_spark.functions import index_store as ixs

    return ixs.retire_table_ids(spark, path, "cells", ids)


def pq_index_compact(spark, path: str) -> dict:
    """Fold a PQ index's append fragments and drop its retired codes into
    one fresh cluster-partitioned generation (atomic flip, two-generation
    retention; quantizer untouched — re-training is a rebuild). See
    index_store.compact_partitioned_table. Returns {rows, gen}."""
    from btrdb_server_spark.functions import index_store as ixs

    return ixs.compact_partitioned_table(spark, path, "cells", "cluster")


def pq_index_reencode(
    embeddings: DataFrame,
    path: str,
    codebook: DataFrame | None = None,
    train_iters: int = 1,
    vec_col: str = "embedding",
) -> dict:
    """Quantizer EVOLUTION for a persisted pq_index_build index — the
    remedy pq_index_drift's gauge calls for: train fresh CODEBOOKS on the
    live corpus (pq_train; or pass `codebook` to bring your own), then
    re-encode every LIVE cell against them through the same
    generation-swap machinery compaction uses — new ``codebooks.gen{s}``
    and ``cells.gen{s}`` directories, ONE atomic manifest flip, the
    superseded generations on the retention ledger, tombstones folded
    (only live rows are re-encoded, like compact). The COARSE structure
    is deliberately kept: centroids — and therefore the cluster
    partition layout and every probe's nprobe pruning — do not move;
    coarse drift is ivf/pq_index_stats' department and a full rebuild.

    `embeddings` must carry (id_col, vec_col) for the indexed corpus —
    the cells store codes, not vectors, so re-encoding necessarily
    rereads the source vectors (restricted to LIVE ids by a semi-join
    against the index, so retired vectors neither train nor re-enter).

    Re-encode-then-probe is BIT-EQUAL to a from-scratch rebuild with the
    same centroids and the same trained codebook over the post-retire
    corpus (encoding is a pure per-row function of the persisted
    quantizer — driver-proven by pq_index_reencode against a full SQL
    oracle that replays the Lloyd step), and the drift gauge's mean
    residual can only improve on the training sample (each subvector
    moves to its nearest NEW centroid; k-means' objective step).

    A crash at any point leaves the OLD quantizer serving the OLD codes
    — exactly the property the reference gets from versioned-root
    atomic swaps (qtree.go generation discipline). Cost: one pass to
    train (iters bounded), one map-only encode pass, one
    cluster-partitioned write. Returns {rows, gen, cb_rows}."""
    from btrdb_server_spark.functions import index_store as ixs

    spark = embeddings.sparkSession
    with ixs.writer_lock(path):  # single-writer maintenance, enforced
        m_ = ixs.read_manifest(path)
        p = m_["params"]
        m, sub = int(p["m"]), int(p["sub"])
        id_col = m_["id_col"]
        seq = int(m_["gen_seq"]) + 1
        # LIVE corpus: the index's ids minus tombstones, joined back to
        # the caller's vectors (inner semi-join — extra source rows never
        # sneak in, retired ids never train).
        live_ids = ixs.minus_tombstones(
            ixs.read_table(spark, path, m_, "cells").select(id_col),
            ixs.read_tombstones(spark, path, m_),
            id_col,
            tomb_rows=m_.get("tombstone_rows"),
        )
        live = embeddings.join(live_ids, id_col, "left_semi")
        if codebook is None:
            codebook = pq_train(
                live,
                m=m,
                k=int(p["k_codes"]),
                iters=train_iters,
                id_col=id_col,
                vec_col=vec_col,
                dim=int(p["dim"]),
            )
        else:
            codebook = codebook.select(
                F.col("j").cast("int").alias("j"),
                F.col("code").cast("int").alias("code"),
                F.col("cv").cast("array<double>").alias("cv"),
            )
        bdir = f"codebooks.gen{seq}"
        # ONE execution of the training plan: collect the codebook, then
        # persist the collected rows (write -> read-back -> collect was
        # three jobs and ran the train plan twice; doubles round-trip
        # parquet losslessly, so the persisted artifact and the rows the
        # encode below scores with are still bit-identical).
        cb_rows = codebook.collect()
        spark.createDataFrame(
            cb_rows, "j int, code int, cv array<double>"
        ).write.mode("overwrite").parquet(os.path.join(path, bdir))
        # Encode against the PERSISTED artifacts (centroids unchanged,
        # codebooks just persisted from the same rows).
        cent_rows = sorted(
            spark.read.parquet(_centroids_path(path, m_)).collect(),
            key=lambda r: r["cid"],
        )
        code_type = "tinyint" if int(p["k_codes"]) <= 127 else "smallint"
        cells = _pq_assigned_codes(
            live, cent_rows, cb_rows, m, sub, code_type, id_col, vec_col
        )
        m2 = dict(m_)
        m2["params"] = {**p, "cb_rows": len(cb_rows)}
        m2["codebooks"] = bdir
        m2["tables"] = {**m_["tables"], "cells": f"cells.gen{seq}"}
        m2["batches"] = [0]
        rows = ixs.write_partitioned_batch(
            cells, ixs.table_batch_dir(path, m2, "cells", 0), "cluster"
        )
        if rows == 0:
            m2["batches"] = []
        ixs.mark_table(m2, "cells", rows, cells.schema)
        m2["tombstones"] = None
        m2["tombstone_rows"] = 0
        m2["gen_seq"] = seq
        ixs.fold_retired(
            path,
            m2,
            [m_["tables"]["cells"], m_["codebooks"], m_["tombstones"]],
        )
        ixs.write_manifest(path, m2)  # atomic flip: quantizer + cells together
        return {"rows": rows, "gen": seq, "cb_rows": len(cb_rows)}
