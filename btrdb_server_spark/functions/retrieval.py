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


def bm25_index_build(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 64,
) -> None:
    """Persist the BM25 inverted index: full postings (term, doc, tf, dl)
    partitioned by a term hash bucket, plus the corpus stats row.

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

    Completes the persisted-index trilogy (lsh_index_build for dedup,
    ivf_index_build for ANN): precompute-then-prune, the same discipline
    as the reference's persisted aggregate tree (qtree.go:925-947).
    """
    docs = ensure_parallelism(docs)
    toks = docs.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("toks")
    ).select(F.col(id_col), F.size("toks").alias("dl"), F.col("toks"))
    # Stats store the EXACT integer sum of document lengths, not the
    # average: sums of integers merge associatively (and stay exact in
    # int64 far beyond 100 TB of tokens), so bm25_index_append can fold a
    # new batch in and the derived avgdl = sum_dl / n_docs is bit-equal
    # to a full rebuild's F.avg (both are one exact division).
    stats = toks.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
        F.lit(buckets).cast("long").alias("buckets"),
    )
    stats.coalesce(1).write.mode("overwrite").parquet(path + "/stats")
    postings = (
        toks.select(id_col, "dl", F.explode("toks").alias("term"))
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").cast("long").alias("tf"))
        .withColumn("bucket", F.pmod(F.hash("term"), F.lit(buckets)))
    )
    (
        postings.repartition("bucket")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path + "/postings")
    )


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
    stats ride a broadcast 1-row table; per-term df is an exact aggregate
    of the pruned scan; the final top-k is TakeOrderedAndProject.
    """
    stats_df = spark.read.parquet(path + "/stats")
    n_buckets = stats_df.first()["buckets"]
    terms_df = spark.createDataFrame(
        [(t,) for t in query_terms], "term string"
    )
    bucket_ids = sorted(
        r.b
        for r in terms_df.select(
            F.pmod(F.hash("term"), F.lit(int(n_buckets))).alias("b")
        )
        .distinct()
        .collect()
    )
    post = spark.read.parquet(path + "/postings").where(
        F.col("bucket").isin(bucket_ids) & F.col("term").isin(query_terms)
    )
    dfreq = post.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
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
        post.join(F.broadcast(dfreq), "term")
        .crossJoin(
            F.broadcast(
                stats_df.select(
                    "n_docs",
                    (F.col("sum_dl") / F.col("n_docs")).alias("avgdl"),
                )
            )
        )
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

    Columns: term, df, total_tf, postings_share — df desc, term ties.
    """
    post = spark.read.parquet(path + "/postings")
    per = post.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
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

    Not transactional (stats replace follows the postings append):
    single-writer maintenance, same discipline as store compaction.
    """
    spark = new_docs.sparkSession
    old = spark.read.parquet(path + "/stats").first()
    buckets = int(old["buckets"])
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
    postings = (
        toks.select(id_col, "dl", F.explode("toks").alias("term"))
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").cast("long").alias("tf"))
        .withColumn("bucket", F.pmod(F.hash("term"), F.lit(buckets)))
    )
    (
        postings.repartition("bucket")
        .sortWithinPartitions("term")
        .write.mode("append")
        .partitionBy("bucket")
        .parquet(path + "/postings")
    )
    spark.createDataFrame(
        [
            (
                int(old["n_docs"] or 0) + int(batch["n_docs"] or 0),
                int(old["sum_dl"] or 0) + int(batch["sum_dl"] or 0),
                buckets,
            )
        ],
        "n_docs long, sum_dl long, buckets long",
    ).coalesce(1).write.mode("overwrite").parquet(path + "/stats")
