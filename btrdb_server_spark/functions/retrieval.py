"""Keyword retrieval and language-model scoring over the documents table.

BM25 is the classic inverted-index ranking function; the Spark expression of
an inverted index is explode → filter-to-query-terms → groupBy — the
posting lists are never materialized, only the postings matching the query
survive the map side. The unigram log-probability score is the cheapest
member of the perplexity-filter family (CCNet-style quality scoring with a
model trained on the corpus itself).

All hot-path logic is built-in column expressions (JVM-side, codegen'd) —
no Python UDFs — and every operator has a DuckDB oracle twin in
__spark_entry__.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from btrdb_server_spark.functions.text import tokens_col
from btrdb_server_spark.utils import ensure_parallelism

# Standard Okapi BM25 constants — shared with the SQL oracle.
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 top-k retrieval for a bag-of-words query.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)   (Robertson/Lucene form).

    Scale shape: the token explode is filtered to the query terms BEFORE the
    explode (map-side array filter), so the shuffle carries one row per
    (matching doc, query term) — the size of the query's posting lists, not
    the corpus. Corpus stats (N, avgdl) are a 1-row aggregate and the
    per-term document frequencies are |query| rows; both broadcast. The
    final top-k is TakeOrderedAndProject — no global sort. Scores are
    rounded to 6 digits before ranking so the oracle orders identically.
    """
    docs = ensure_parallelism(docs)
    toks = docs.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("toks")
    ).select(F.col(id_col), F.size("toks").alias("dl"), F.col("toks"))
    stats = toks.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.select(
            id_col,
            "dl",
            F.explode(
                F.filter("toks", lambda t: t.isin(query_terms))
            ).alias("term"),
        )
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    w = (
        idf
        * F.col("tf")
        * F.lit(BM25_K1 + 1.0)
        / (
            F.col("tf")
            + F.lit(BM25_K1)
            * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(w), 6).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), id_col).limit(k)


def unigram_logprob(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unigram language-model quality score: train token counts on the
    corpus itself, then score each document by its mean token
    log-probability ln(count(t)/total). Low scores flag rare-token noise
    (mojibake, hashes, boilerplate markup); the cheap stand-in for the
    perplexity filter of CCNet/Wenzek et al. 2020.

    Scale shape: one explode + one groupBy(token) builds the LM (map-side
    combinable, shuffle is vocab-sized per map task); scoring re-joins
    tokens to counts on the token key — broadcast when the vocabulary fits
    (it does by Heaps' law for all but extreme corpora; ~O(√N) distinct
    tokens), else a shuffle-hash join whose skew on hot stopwords is
    harmless because the build side has one row per token. Documents with
    zero tokens report n_tokens = 0 and NULL score.
    """
    docs = ensure_parallelism(docs)
    toks = docs.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    scored = (
        toks.join(F.broadcast(counts), "tok")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(F.avg(F.log(F.col("cnt") / F.col("total"))), 6).alias(
                "mean_logprob"
            ),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0).cast("long")).alias("n_tokens"),
            F.col("mean_logprob"),
        )
        .orderBy(id_col)
    )


def tfidf_topk(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-k TF-IDF terms — the classic keyword-extraction /
    sparse-featurization pass (what each document is "about", the sparse
    dual of the embedding column). Smoothed sklearn-style idf:
    score = tf * (ln((N + 1)/(df + 1)) + 1), rounded to 6 before ranking
    so ties (then lexicographic token) break identically across engines.
    Output: (doc_id, rank, token, score), rank 1-based.

    Scale shape: tf is a map-side-combined (doc, token) count; the corpus
    size is a 1-row broadcast. The df side is VOCABULARY-sized — at web
    scale that can exceed broadcast capacity, so the tf-df join carries no
    broadcast hint: AQE broadcasts it when the runtime size fits and falls
    back to a shuffle join keyed on the token when it doesn't. The top-k
    is a row_number window partitioned by doc_id — groups are single
    documents, so the window never concentrates a stream of corpus scale
    into one task."""
    docs = ensure_parallelism(docs)
    toks = docs.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("tok")
    )
    tf = toks.groupBy(id_col, "tok").agg(F.count("*").alias("tf"))
    df_ = toks.groupBy("tok").agg(F.countDistinct(id_col).alias("df"))
    n = docs.agg(F.countDistinct(id_col).alias("n"))
    scored = (
        tf.join(df_, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            id_col,
            "tok",
            F.round(
                F.col("tf")
                * (F.log((F.col("n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))) + F.lit(1.0)),
                6,
            ).alias("score"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("tok"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(id_col, "rank", F.col("tok").alias("token"), "score")
        .orderBy(id_col, "rank")
    )


def rerank_fusion(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    probe_id: int = 7,
    pool: int = 50,
    k: int = 10,
    rrf_k: int = 60,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    vid_col: str = "vec_id",
) -> DataFrame:
    """Reciprocal-rank fusion of a lexical and a dense retriever — the
    standard hybrid-search serving pattern: take the top-`pool` BM25
    list and the top-`pool` cosine list (vec_id aligned with doc_id),
    fuse with RRF(d) = 1/(rrf_k + rank_bm25) + 1/(rrf_k + rank_cos)
    (missing from one list contributes nothing), emit the top `k`.

    Exactness: ranks are integers (both retrievers already rank on
    round(score, 6) with id tiebreaks); each RRF term is ONE division
    of exact small integers and the fusion adds exactly two terms —
    engine-identical. Scale shape: two TakeOrderedAndProject heads of
    `pool` rows, one outer join of two tiny lists, one ordered limit.
    Columns: doc_id, rrf, bm25_rank, cos_rank."""
    from pyspark.sql import Window

    from btrdb_server_spark.functions.similarity import cosine_topk_by_id

    lex = bm25_topk(docs, query_terms, k=pool, text_col=text_col, id_col=id_col)
    wl = Window.orderBy(F.col("score").desc(), F.col(id_col))
    lexr = lex.select(
        F.col(id_col).alias("d"),
        F.row_number().over(wl).alias("bm25_rank"),
    )
    dense = cosine_topk_by_id(
        embeddings, probe_id=probe_id, k=pool, id_col=vid_col, vec_col=vec_col
    )
    wd = Window.orderBy(F.col("cosine").desc(), F.col(vid_col))
    denser = dense.select(
        F.col(vid_col).alias("d"),
        F.row_number().over(wd).alias("cos_rank"),
    )
    fused = lexr.join(denser, "d", "full_outer")
    term = lambda c: F.when(  # noqa: E731
        F.col(c).isNotNull(),
        F.lit(1.0) / (F.lit(float(rrf_k)) + F.col(c).cast("double")),
    ).otherwise(F.lit(0.0))
    return (
        fused.select(
            F.col("d").alias("doc_id"),
            (term("bm25_rank") + term("cos_rank")).alias("rrf"),
            "bm25_rank",
            "cos_rank",
        )
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(k)
    )


def _bm25_postings(toks: DataFrame, id_col: str, buckets: int) -> DataFrame:
    return (
        toks.select(id_col, "dl", F.explode("toks").alias("term"))
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").cast("long").alias("tf"))
        .withColumn("bucket", F.pmod(F.hash("term"), F.lit(buckets)))
    )


def _live_postings(spark, path: str, m: dict | None = None) -> DataFrame:
    """Committed postings minus retired docs (see functions/index_store.py
    for the manifest/tombstone discipline shared by the three indexes)."""
    from btrdb_server_spark.functions import index_store as ixs

    m = m or ixs.read_manifest(path)
    return ixs.minus_tombstones(
        ixs.read_table(spark, path, m, "postings"),
        ixs.read_tombstones(spark, path, m),
        m["id_col"],
        tomb_rows=m.get("tombstone_rows"),
    )


def bm25_index_build(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 64,
) -> None:
    """Persist the BM25 inverted index: full postings (term, doc, tf, dl)
    partitioned by a term hash bucket, a thin per-document length table
    (the norms file of a classic IR index), and the exact corpus stats.

    bm25_topk tokenizes the corpus per query; an index that serves many
    queries should tokenize once and lay postings out so a query reads
    only its own terms' lists. partitionBy(term-hash bucket) makes each
    bucket a parquet directory: bm25_index_topk's literal bucket predicate
    prunes at the directory level, so a q-term query reads at most q/64 of
    the postings bytes (plus the term equality filter row-group-pruning
    inside the bucket via parquet min/max on the sorted term column).
    Document frequencies are NOT stored: after pruning, the read contains
    every posting of the query's terms, so df is computed exactly from the
    pruned scan — nothing in the index goes stale except via append.

    Stats hold the EXACT integer (n_docs, sum_dl): integer sums merge
    associatively (exact in int64 far beyond 100 TB of tokens), so
    bm25_index_append folds a batch in and bm25_index_retire subtracts a
    retired set out, and the derived avgdl = sum_dl / n_docs stays
    bit-equal to a full rebuild's F.avg (one exact division either way).
    They live IN the manifest, so the single atomic manifest flip commits
    data + stats together — no crash window can leave them disagreeing
    (the norms table makes any historical disagreement detectable and
    repairable: bm25_index_verify / bm25_index_compact).

    Completes the persisted-index trilogy (lsh_index_build for dedup,
    ivf_index_build for ANN): precompute-then-prune, the same discipline
    as the reference's persisted aggregate tree (qtree.go:925-947), with
    the store's manifest/tombstone lifecycle (store.py, and the
    reference's Obliterate protocol, metaprovider.go:339-427).
    """
    from btrdb_server_spark.functions import index_store as ixs

    docs = ensure_parallelism(docs)
    with ixs.writer_lock(path):  # single-writer maintenance, enforced
        m = ixs.init_index(path, ["postings", "docs"], id_col=id_col)
        # One tokenization for both writes (the append path's `toks`
        # discipline): the docs and postings writes are separate ACTIONS,
        # so without the checkpoint each re-tokenized the whole corpus —
        # exchange reuse never crosses job boundaries.
        toks = (
            docs.select(F.col(id_col), tokens_col(F.col(text_col)).alias("toks"))
            .select(F.col(id_col), F.size("toks").alias("dl"), F.col("toks"))
            .localCheckpoint(eager=True)
        )
        # Stats observed on the docs write job itself: exactly the rows
        # the index commits (never a re-tokenization), without the old
        # third job that read the freshly written norms table back.
        from pyspark.sql import Observation

        obs = Observation()
        toks.select(id_col, "dl").observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.sum("dl").cast("long").alias("s"),
        ).write.parquet(ixs.table_batch_dir(path, m, "docs", 0))
        (
            _bm25_postings(toks, id_col, buckets)
            .repartition("bucket")
            .sortWithinPartitions("term")
            .write.partitionBy("bucket")
            .parquet(ixs.table_batch_dir(path, m, "postings", 0))
        )
        m["stats"] = {
            "n_docs": int(obs.get["n"] or 0),
            "sum_dl": int(obs.get["s"] or 0),
            "buckets": buckets,
        }
        ixs.write_manifest(path, m)  # atomic commit: nothing live before this


def bm25_index_topk(
    spark,
    path: str,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 top-k served from a persisted bm25_index_build index —
    score-identical to bm25_topk (same formula, same 6-digit rounding),
    but the corpus is never tokenized at query time.

    The only driver-side values are the query's bucket ids (|query| small
    integers, computed with the same F.hash the build used — a LITERAL
    partition predicate is what prunes the posting directories). Corpus
    stats come from the manifest (exact int64 n_docs / sum_dl — they ride
    the plan as literals, and avgdl = sum_dl / n_docs is the same one
    IEEE division a rebuild's F.avg performs); retired docs are excluded
    by the broadcast tombstone anti-join, so after a bm25_index_retire
    the scores are bit-equal to a rebuild on the post-delete corpus (df
    too — it is an exact aggregate of the pruned, tombstone-filtered
    scan). The final top-k is TakeOrderedAndProject.
    """
    from btrdb_server_spark.functions import index_store as ixs

    m = ixs.read_manifest(path)
    id_col = m["id_col"]
    st = m["stats"]
    if int(st["n_docs"]) == 0:
        # Empty index (built on nothing, or every doc retired): the
        # correct answer is zero rows — short-circuit before the avgdl
        # division. Schema (id type in particular) comes from the norms
        # table, which survives full retirement via the manifest's
        # empty_tables record.
        from pyspark.sql.types import DoubleType, StructField, StructType

        id_type = ixs.read_table(spark, path, m, "docs").schema[id_col].dataType
        return spark.createDataFrame(
            [],
            StructType(
                [StructField(id_col, id_type), StructField("score", DoubleType())]
            ),
        )
    terms_df = spark.createDataFrame(
        [(t,) for t in query_terms], "term string"
    )
    bucket_ids = sorted(
        r.b
        for r in terms_df.select(
            F.pmod(F.hash("term"), F.lit(int(st["buckets"]))).alias("b")
        )
        .distinct()
        .collect()
    )
    post = _live_postings(spark, path, m).where(
        F.col("bucket").isin(bucket_ids) & F.col("term").isin(query_terms)
    )
    dfreq = post.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    n_docs = F.lit(int(st["n_docs"]))
    avgdl = F.lit(float(st["sum_dl"]) / float(st["n_docs"]))
    idf = F.log(
        (n_docs - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    w = (
        idf
        * F.col("tf")
        * F.lit(BM25_K1 + 1.0)
        / (
            F.col("tf")
            + F.lit(BM25_K1)
            * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / avgdl)
        )
    )
    scored = (
        post.join(F.broadcast(dfreq), "term")
        .groupBy(id_col)
        .agg(F.round(F.sum(w), 6).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), id_col).limit(k)


def bm25_index_stats(spark, path: str, top: int = 20) -> DataFrame:
    """Posting-list skew audit of a persisted bm25_index_build index: the
    `top` terms by document frequency, with total term frequency and the
    share of all posting rows each holds.

    Hot terms (stopwords, boilerplate markup) are the scale hazard of an
    inverted index — a query containing one drags its whole posting list
    through the scorer. Read from the postings alone (term/tf columns;
    text never touched): one map-side-combined groupBy(term), a 1-row
    total, and a TakeOrderedAndProject for the top slice.

    df is countDistinct(doc) — the SAME definition bm25_index_topk scores
    with — so an accidental double-append (duplicate (doc, term) posting
    rows) cannot silently inflate the audit while the query path dedups;
    tombstoned (retired) docs are excluded like every other read path.

    Columns: term, df, total_tf, postings_share — df desc, term ties.
    """
    from btrdb_server_spark.functions import index_store as ixs

    m = ixs.read_manifest(path)
    post = _live_postings(spark, path, m)
    per = post.groupBy("term").agg(
        F.countDistinct(m["id_col"]).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("total_tf"),
    )
    total = per.agg(F.sum("df").alias("t"))
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            "term",
            "df",
            "total_tf",
            (F.col("df") / F.col("t")).alias("postings_share"),
        )
        .orderBy(F.col("df").desc(), "term")
        .limit(top)
    )


def bm25_index_drift(
    spark,
    path: str,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Vocabulary/length drift gauge for a persisted bm25_index_build
    index — the staleness metric the stats entry lacks (posting skew
    says the hot terms changed; this says the CORPUS the index models no
    longer looks like the batches arriving): tokenize `new_docs` with
    the index's own tokenizer and report, in one row,

    - n_docs, n_tokens — batch size;
    - oov_tokens / oov_rate — token OCCURRENCES whose term the live
      postings have never seen (out-of-vocabulary mass: a new language,
      domain, or markup dialect shows up here first);
    - batch_terms / new_terms / new_term_rate — the distinct-term view
      of the same shift;
    - batch_avgdl / index_avgdl / len_ratio — document-length drift,
      which silently reweights BM25's length normalization (the b term)
      even when the vocabulary is stable.

    Rebuild trigger: gauge a held-out slice at build time; when a crawl
    batch's oov_rate or len_ratio runs ~2x the build-time baseline,
    re-tokenize/rebuild (bm25_index_build overwrite — generation-swap,
    like pq_index_reencode) rather than appending the drifted batch into
    stats it distorts. Every rate is a single IEEE division of exact
    int64 counters (index avgdl comes from the manifest's exactly-folded
    stats), so the row is bit-stable across engines. Plan: ONE tokenize
    pass over the batch, a term-level join against the distinct live
    postings vocabulary (column-pruned — postings tf/doc never read),
    three scalar aggregates. The batch is crawl-sized; the vocabulary
    join is the only corpus-scale touch and reads one column."""
    from btrdb_server_spark.functions import index_store as ixs

    m = ixs.read_manifest(path)
    st = m["stats"]
    index_avgdl = float(int(st["sum_dl"])) / float(int(st["n_docs"]))
    vocab = _live_postings(spark, path, m).select("term").distinct()
    toks = (
        ensure_parallelism(new_docs)
        .select(tokens_col(F.col(text_col)).alias("toks"))
        .localCheckpoint(eager=False)  # one tokenize pass, three consumers
    )
    doc_agg = toks.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size("toks")).cast("long").alias("sum_dl"),
    )
    tok_rows = toks.select(F.explode("toks").alias("term"))
    known = vocab.withColumn("known", F.lit(True))
    occ = tok_rows.join(known, "term", "left").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("known").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("oov_tokens"),
    )
    uniq = tok_rows.distinct().join(known, "term", "left").agg(
        F.count(F.lit(1)).cast("long").alias("batch_terms"),
        F.sum(F.when(F.col("known").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("new_terms"),
    )
    return (
        doc_agg.crossJoin(occ)
        .crossJoin(uniq)
        .select(
            "n_docs",
            "n_tokens",
            "oov_tokens",
            (F.col("oov_tokens") / F.col("n_tokens")).alias("oov_rate"),
            "batch_terms",
            "new_terms",
            (F.col("new_terms") / F.col("batch_terms")).alias("new_term_rate"),
            (F.col("sum_dl") / F.col("n_docs")).alias("batch_avgdl"),
            F.lit(index_avgdl).alias("index_avgdl"),
            (
                (F.col("sum_dl") / F.col("n_docs")) / F.lit(index_avgdl)
            ).alias("len_ratio"),
        )
    )


def bm25_index_append(
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Fold a new document batch into a persisted bm25_index_build index —
    the daily-crawl maintenance path: tokenize ONLY the batch, append its
    postings under the same term-hash buckets (bucket count read from the
    index; a batch can never write an incompatible layout), and replace
    the 1-row stats with the exactly-merged (n_docs, sum_dl).

    Append-then-query is BIT-EQUAL to a full rebuild over the union:
    document frequencies are computed from the postings at query time (so
    appended postings are counted exactly), and the stats fold adds exact
    int64 counters. Proven by the ann/bm25 *_incremental driver entries,
    whose oracle is the full-corpus one.

    TRANSACTIONAL: the batch lands in fresh batch=<N> directories that no
    reader consults until the single atomic manifest flip commits the
    batch ids AND the folded stats together — a crash at any point leaves
    the old index fully intact (the next append of batch N clears the
    orphan). Single-writer maintenance, like store compaction.
    """
    from btrdb_server_spark.functions import index_store as ixs

    spark = new_docs.sparkSession
    with ixs.writer_lock(path):  # single-writer maintenance, enforced
        m = ixs.read_manifest(path)
        id_col, buckets = m["id_col"], int(m["stats"]["buckets"])
        n = ixs.next_batch(m)
        docs = ensure_parallelism(new_docs)
        # One tokenization for both consumers (stats aggregate + postings
        # write): tokenizing the batch is the append's dominant cost.
        toks = (
            docs.select(F.col(id_col), tokens_col(F.col(text_col)).alias("toks"))
            .select(F.col(id_col), F.size("toks").alias("dl"), F.col("toks"))
            .localCheckpoint(eager=True)
        )
        batch = toks.agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("dl").cast("long").alias("sum_dl"),
        ).first()
        if int(batch["n_docs"] or 0) == 0:
            # Empty crawl batch: a committed no-op — writing it would leave
            # a file-less partitioned postings dir and could clear a fully-
            # retired index's empty_tables mark for zero new rows.
            return
        toks.select(id_col, "dl").write.parquet(
            ixs.table_batch_dir(path, m, "docs", n)
        )
        post = _bm25_postings(toks, id_col, buckets)
        post_dir = ixs.table_batch_dir(path, m, "postings", n)
        n_post = ixs.write_partitioned_batch(
            post, post_dir, "bucket", sort_within="term"
        )
        # Revive tables after a fully-retired compaction: clear the
        # empty-table marks only for tables this batch actually put rows
        # in (postings are nonempty iff the batch carried tokens). A
        # docs-only batch (every doc empty) contributes no postings: while
        # the postings table is MARKED empty its batch dir must stay
        # absent (read_table synthesizes from the schema record), but an
        # UNMARKED (populated) table requires every committed batch dir to
        # exist — a file-less placeholder among populated dirs reads fine
        # and keeps the loss-detection contract intact.
        if n_post == 0 and "postings" not in (m.get("empty_tables") or {}):
            os.makedirs(post_dir, exist_ok=True)
        ixs.mark_table(m, "docs", 1, toks.schema)
        if n_post:
            if "postings" in (m.get("empty_tables") or {}):
                # REVIVAL of a fully-retired postings table: while the mark
                # was set, docs-only batches committed their ids WITHOUT a
                # postings dir (read_table synthesizes from the schema
                # record, absent dirs tolerated). Clearing the mark now
                # re-arms loss detection — every committed batch dir must
                # exist — so give those earlier docs-only batches their
                # file-less placeholder dirs before the mark drops, or the
                # index reads FileNotFoundError until manual repair.
                post_root = os.path.join(path, m["tables"]["postings"])
                for b in m["batches"]:
                    os.makedirs(
                        os.path.join(post_root, f"batch={b}"), exist_ok=True
                    )
            ixs.mark_table(m, "postings", 1, post.schema)
        m["stats"]["n_docs"] += int(batch["n_docs"] or 0)
        m["stats"]["sum_dl"] += int(batch["sum_dl"] or 0)
        m["batches"] = m["batches"] + [n]
        ixs.write_manifest(path, m)  # atomic commit: batch + stats together


def bm25_index_retire(spark, path: str, ids) -> int:
    """Retire documents from a persisted BM25 index — the takedown /
    re-curation path (GDPR delete, spam purge): record the ids in the
    tombstone set and subtract their exact (count, total length) from the
    manifest stats, WITHOUT rewriting a single posting byte.

    Retire-then-query is BIT-EQUAL to a full rebuild on the post-delete
    corpus: every read path anti-joins the broadcast tombstone set (df
    and the scored postings exclude retired docs exactly) and avgdl is
    derived from the exactly-subtracted int64 stats. The postings bytes
    are reclaimed later by bm25_index_compact — tombstone now, rewrite in
    the background, the reference's Obliterate protocol
    (internal/mprovider/metaprovider.go:339-427, quasar.go:125-143).

    Idempotent: ids already retired (or never indexed) are ignored — the
    retired set is derived from the LIVE norms table, so stats can never
    be subtracted twice. Cost: one thin norms-table scan + a
    metadata-scale tombstone rewrite. Returns the number of docs newly
    retired.
    """
    from btrdb_server_spark.functions import index_store as ixs

    with ixs.writer_lock(path):  # single-writer maintenance, enforced
        m = ixs.read_manifest(path)
        id_col = m["id_col"]
        seq = m["gen_seq"] + 1
        tomb_old = ixs.read_tombstones(spark, path, m)
        old_rows = m.get("tombstone_rows")
        newly = (
            ixs.minus_tombstones(
                ixs.read_table(spark, path, m, "docs"),
                tomb_old,
                id_col,
                tomb_rows=old_rows,
            )
            .transform(lambda df: ixs.retire_filter(df, ids, id_col))
            .select(F.col(id_col).alias("id"), "dl")
            .distinct()
            .localCheckpoint(eager=True)  # one computation feeds fold + write
        )
        delta = newly.agg(
            F.count("*").cast("long").alias("n"),
            F.sum("dl").cast("long").alias("s"),
        ).first()
        n_new = int(delta["n"] or 0)
        if n_new == 0:
            return 0
        total = (
            old_rows
            if old_rows is not None
            else (tomb_old.count() if tomb_old is not None else 0)
        ) + n_new
        full = newly if tomb_old is None else tomb_old.unionByName(newly)
        tomb_dir = ixs.write_tombstones(path, m, full, seq, rows=total)
        old_tomb = m["tombstones"]
        m["tombstones"] = tomb_dir
        m["tombstone_rows"] = total
        m["gen_seq"] = seq
        m["stats"]["n_docs"] -= n_new
        m["stats"]["sum_dl"] -= int(delta["s"] or 0)
        ixs.fold_retired(path, m, [old_tomb])  # N-generation retention
        ixs.write_manifest(path, m)  # atomic: tombstones + stats together
        return n_new


def bm25_index_compact(spark, path: str) -> dict:
    """Fold a BM25 index's append fragments and drop its retired docs:
    rewrite postings (re-sharded by bucket, term-sorted — restoring the
    row-group pruning appends fragment) and the norms table into ONE
    fresh generation, recompute stats from the compacted norms, flip the
    manifest atomically; the superseded generations and tombstone set are
    retained until the NEXT maintenance op (two-generation retention,
    store.py:406-520 discipline) so in-flight scans keep their listings. The index answer is unchanged (compact-then-query ==
    tombstone-view query == post-delete rebuild, driver-proven); what
    changes is the economics — probes stop paying the anti-join and the
    fragment read-amplification.

    The stats recompute doubles as the corruption DETECTION path: a
    manifest whose folded stats disagree with the norms table (possible
    only via out-of-band tampering — every commit here is atomic) is
    reported in the returned dict and REPAIRED (the norms table is the
    doc-level truth). Mirrors store.compact()'s generation discipline
    (store.py:406-520). Returns {docs, stats_repaired, gen}.
    """
    from btrdb_server_spark.functions import index_store as ixs

    with ixs.writer_lock(path):  # single-writer maintenance, enforced
        m = ixs.read_manifest(path)
        id_col = m["id_col"]
        seq = m["gen_seq"] + 1
        tomb = ixs.read_tombstones(spark, path, m)
        trows = m.get("tombstone_rows")
        live_docs = ixs.minus_tombstones(
            ixs.read_table(spark, path, m, "docs"), tomb, id_col, tomb_rows=trows
        )
        live_post = ixs.minus_tombstones(
            ixs.read_table(spark, path, m, "postings"),
            tomb,
            id_col,
            tomb_rows=trows,
        )
        m2 = dict(m)
        m2["tables"] = {t: f"{t}.gen{seq}" for t in m["tables"]}
        # ONE job per table: counts (and the docs table's stats truth,
        # n/sum_dl) are OBSERVED on the write jobs themselves — the old
        # count-before-write + stats read-back executed the anti-join
        # scans twice and re-read the freshly written docs, five jobs
        # where two suffice. A zero-row table's write is rolled back (an
        # empty partitioned dir is unreadable) and records its schema in
        # the manifest instead, same contract as before. The observed
        # n/sum_dl are the exact rows written, so the corruption-
        # detection compare below is anchored to the identical truth.
        from pyspark.sql import Observation

        import shutil as _shutil

        docs_dir = ixs.table_batch_dir(path, m2, "docs", 0)
        obs = Observation()
        live_docs.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.sum("dl").cast("long").alias("s"),
        ).write.parquet(docs_dir)
        n_docs_live = int(obs.get["n"] or 0)
        sum_dl_live = int(obs.get["s"] or 0)
        if n_docs_live == 0:
            _shutil.rmtree(docs_dir, ignore_errors=True)
        ixs.mark_table(m2, "docs", n_docs_live, live_docs.schema)
        n_post_live = ixs.write_partitioned_batch(
            live_post,
            ixs.table_batch_dir(path, m2, "postings", 0),
            "bucket",
            sort_within="term",
        )
        m2["batches"] = [0] if (n_docs_live or n_post_live) else []
        ixs.mark_table(m2, "postings", n_post_live, live_post.schema)
        truth = {
            "n_docs": n_docs_live,
            "sum_dl": sum_dl_live,
            "buckets": m["stats"]["buckets"],
        }
        repaired = truth != m["stats"]
        m2["stats"] = truth
        m2["tombstones"] = None
        m2["tombstone_rows"] = 0
        m2["gen_seq"] = seq
        # N-generation retention via the shared ledger
        ixs.fold_retired(
            path, m2, list(m["tables"].values()) + [m["tombstones"]]
        )
        ixs.write_manifest(path, m2)  # atomic flip to the compacted generation
        return {"docs": truth["n_docs"], "stats_repaired": repaired, "gen": seq}


def bm25_index_verify(spark, path: str) -> DataFrame:
    """Consistency audit of a persisted BM25 index: cross-check the
    manifest's folded stats against the live norms table and the live
    postings — the cheap detection path for any stats/postings
    disagreement (e.g. out-of-band file loss or a duplicated batch dir).

    One thin norms scan plus one postings scan (id column only, buckets
    pruned to nothing — it reads every bucket but only the id/dl
    columns). postings_n_docs counts docs with >= 1 token, so it equals
    docs_n_docs only when no live doc is empty — `consistent` therefore
    pins stats == norms AND norms >= postings distinct ids.

    Columns (1 row): n_docs, sum_dl, docs_n_docs, docs_sum_dl,
    postings_n_docs, consistent.
    """
    from btrdb_server_spark.functions import index_store as ixs

    m = ixs.read_manifest(path)
    id_col = m["id_col"]
    tomb = ixs.read_tombstones(spark, path, m)
    d = (
        ixs.minus_tombstones(
            ixs.read_table(spark, path, m, "docs"),
            tomb,
            id_col,
            tomb_rows=m.get("tombstone_rows"),
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("s"),
        )
        .first()
    )
    p = (
        _live_postings(spark, path, m)
        .agg(F.countDistinct(id_col).cast("long").alias("n"))
        .first()
    )
    st = m["stats"]
    ok = (
        int(st["n_docs"]) == int(d["n"])
        and int(st["sum_dl"]) == int(d["s"])
        and int(p["n"]) <= int(d["n"])
    )
    return spark.createDataFrame(
        [
            (
                int(st["n_docs"]),
                int(st["sum_dl"]),
                int(d["n"]),
                int(d["s"]),
                int(p["n"]),
                bool(ok),
            )
        ],
        "n_docs long, sum_dl long, docs_n_docs long, docs_sum_dl long, "
        "postings_n_docs long, consistent boolean",
    )
