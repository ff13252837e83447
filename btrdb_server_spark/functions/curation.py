"""Corpus curation for training-data pipelines: rule-based quality
filtering, benchmark decontamination, stratified sampling, and sequence
packing.

These are the steps between "raw crawl" and "training mixture": drop
low-quality documents (Gopher/C4-style rules), remove documents that leak
evaluation data (n-gram overlap with a benchmark set), downsample
over-represented strata to a target mixture, and pack documents into
fixed-length training sequences.

Scale design:
- quality_filter    — pure column expressions, map-side only, zero shuffle;
                      all rules are INTEGER comparisons (n_punct*5 <= n_chars
                      rather than ratio <= 0.2) so engines agree bit-for-bit.
- decontaminate     — the benchmark side is eval-set-sized (tiny next to the
                      corpus), so its distinct shingle set broadcasts; the
                      100 TB side is one shingle explode + semi-join-shaped
                      broadcast hash join + groupBy(doc) — one shuffle of
                      (doc, counts), never a corpus self-join.
- stratified_sample — deterministic hash-threshold sampling: keep iff
                      hash16(id) < floor(rate*2^16). Map-side filter, zero
                      shuffle, reproducible across runs/engines (no RNG
                      state), and composable (re-sampling with a lower rate
                      selects a subset of the higher rate's sample).
- pack_sequences    — concat-and-chunk packing as a per-shard running token
                      offset (window cumsum). Shards are independent, so
                      parallelism = n_shards: size n_shards to the cluster
                      (each shard's cumsum is a single sequential pass, the
                      same boundary any packing implementation has).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from btrdb_server_spark.functions.dedup import shingles_col
from btrdb_server_spark.functions.text import PUNCT_CLASS, STOPWORDS, tokens_col
from btrdb_server_spark.utils import ensure_parallelism

# Gopher-style rule thresholds (Rae et al. 2021, table A1 shape — bounds
# adapted to this corpus' scale). Kept as module constants so the SQL
# oracles and tests share them.
MIN_TOKENS = 10
MAX_TOKENS = 100_000
MIN_MEAN_TOKEN_LEN = 2  # mean token length in [2, 12]
MAX_MEAN_TOKEN_LEN = 12
MAX_PUNCT_RATIO_NUM = 1  # punct ratio <= 1/5
MAX_PUNCT_RATIO_DEN = 5
MIN_STOPWORDS = 2


def quality_filter(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Rule-based quality flags + keep decision per document.

    Rules (each an integer comparison — no float thresholds, so the DuckDB
    oracle reproduces decisions exactly):
    - ok_n_tokens:  MIN_TOKENS <= token count <= MAX_TOKENS
    - ok_token_len: mean token length in [MIN_MEAN_TOKEN_LEN,
                    MAX_MEAN_TOKEN_LEN]  (as tok_chars vs n_toks bounds)
    - ok_punct:     punctuation chars <= 1/5 of all chars
    - ok_stopwords: at least MIN_STOPWORDS stopword occurrences (the Gopher
                    "natural language" signal)
    keep = all of the above.
    """
    docs = ensure_parallelism(docs)
    toks = tokens_col(F.col(text_col))
    n_toks = F.size(toks)
    tok_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    n_punct = F.length(F.regexp_replace(F.col(text_col), PUNCT_CLASS, ""))
    n_chars = F.length(F.col(text_col))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    ok_n_tokens = (n_toks >= MIN_TOKENS) & (n_toks <= MAX_TOKENS)
    ok_token_len = (tok_chars >= MIN_MEAN_TOKEN_LEN * n_toks) & (
        tok_chars <= MAX_MEAN_TOKEN_LEN * n_toks
    )
    ok_punct = n_punct * MAX_PUNCT_RATIO_DEN <= n_chars * MAX_PUNCT_RATIO_NUM
    ok_stopwords = n_stop >= MIN_STOPWORDS
    keep = ok_n_tokens & ok_token_len & ok_punct & ok_stopwords
    return docs.select(
        F.col(id_col),
        n_toks.cast("long").alias("n_tokens"),
        ok_n_tokens.alias("ok_n_tokens"),
        ok_token_len.alias("ok_token_len"),
        ok_punct.alias("ok_punct"),
        ok_stopwords.alias("ok_stopwords"),
        keep.alias("keep"),
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num: int = 1,
    den: int = 2,
) -> DataFrame:
    """Flag training documents whose k-gram shingles overlap a benchmark
    (evaluation) set — the decontamination pass every serious pretraining
    pipeline runs so eval numbers aren't memorization.

    A document is contaminated when
        n_matched / n_shingles >= num/den   (default 1/2),
    where n_matched counts its distinct shingles that appear ANYWHERE in the
    benchmark set. The comparison is kept integral
    (n_matched * den >= n_shingles * num) for engine-exact decisions.

    Shingles are hashed to 60-bit ints (first 15 md5 hex chars — the same
    key ngram_jaccard_pairs uses) so the join moves 8-byte keys. The bench
    shingle set is broadcast: the corpus side never shuffles for the match,
    only the per-doc count aggregation does (one row per doc, map-side
    combined). Documents with fewer than k tokens have no shingles and are
    reported with n_shingles = 0, contaminated = false.
    """
    sh = (
        ensure_parallelism(docs)
        .select(F.col(id_col), F.explode(shingles_col(F.col(text_col), k)).alias("s"))
        .select(
            id_col,
            F.conv(F.substring(F.md5("s"), 1, 15), 16, 10).cast("long").alias("s"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    bench_sh = (
        bench.select(F.explode(shingles_col(F.col(text_col), k)).alias("s"))
        .select(F.conv(F.substring(F.md5("s"), 1, 15), 16, 10).cast("long").alias("s"))
        .distinct()
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    matched = (
        sh.join(F.broadcast(bench_sh), "s")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_matched"))
    )
    n_sh = F.coalesce(F.col("n_shingles"), F.lit(0)).cast("long")
    n_mt = F.coalesce(F.col("n_matched"), F.lit(0)).cast("long")
    return (
        docs.select(id_col)
        .join(sizes, id_col, "left")
        .join(matched, id_col, "left")
        .select(
            F.col(id_col),
            n_sh.alias("n_shingles"),
            n_mt.alias("n_matched"),
            # Unrounded integer ratio (rounding ties diverge across engines).
            (n_mt / F.greatest(n_sh, F.lit(1))).alias("overlap"),
            ((n_mt * den >= n_sh * num) & (n_sh > 0)).alias("contaminated"),
        )
        .orderBy(id_col)
    )


def sample_threshold(rate: float, bits: int = 16) -> int:
    """Integer keep-threshold for a sampling rate: floor(rate * 2^bits)."""
    return int(rate * (1 << bits))


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float,
    key_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "smp|",
) -> DataFrame:
    """Deterministic per-stratum downsampling to a target data mixture:
    keep a document iff hash16(salt || id) < floor(rate[stratum] * 2^16).

    Hash-threshold sampling (not rand()) makes the sample reproducible
    across runs, engines, and partitionings, and NESTED: the rate-0.1
    sample is a strict subset of the rate-0.5 sample, which is what lets a
    pipeline dial a mixture down without re-shuffling data. Pure map-side
    filter — zero shuffle at any scale. Distinct salts give independent
    samples.
    """
    u = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 4),
        16,
        10,
    ).cast("long")
    thr = F.lit(sample_threshold(default_rate))
    for key in sorted(rates):
        thr = F.when(F.col(key_col) == key, sample_threshold(rates[key])).otherwise(thr)
    return (
        ensure_parallelism(docs)
        .where(u < thr)
        .select(F.col(id_col), F.col(key_col))
        .orderBy(id_col)
    )


def pack_sequences(
    docs: DataFrame,
    ctx_len: int = 256,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk sequence packing: lay documents end to end in id
    order within a shard and chunk the token stream every `ctx_len` tokens —
    each document gets its shard, its starting token offset, and the index
    of the training sequence its first token lands in.

    This is the standard pretraining packing (documents concatenated, then
    split into fixed-length sequences), expressed as a per-shard window
    cumsum. Shards are independent: parallelism equals n_shards, so at
    cluster scale set n_shards ~ total cores — the per-shard sequential
    cumsum is the inherent boundary of any packing algorithm (each offset
    depends on every predecessor).
    """
    n_toks = F.size(tokens_col(F.col(text_col))).cast("long")
    shard = F.pmod(F.col(id_col), F.lit(n_shards)).cast("long")
    t = ensure_parallelism(docs).select(
        F.col(id_col), shard.alias("shard"), n_toks.alias("n_tokens")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        t.select(
            id_col,
            "shard",
            "n_tokens",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("tok_offset"),
        )
        .select(
            id_col,
            "shard",
            "n_tokens",
            "tok_offset",
            F.expr(f"tok_offset div {ctx_len}").alias("seq_idx"),
        )
        .orderBy(id_col)
    )


def doc_chunks(
    docs: DataFrame,
    chunk_len: int = 128,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping token-window chunking: split each document's token stream
    into windows of `chunk_len` tokens advancing by `chunk_len - overlap` —
    the retrieval/embedding-prep sibling of pack_sequences (which packs
    whole documents; this splits long ones).

    One row per (document, chunk): chunk_idx, tok_start, tok_len (the last
    chunk is truncated, never padded). Documents with zero tokens emit no
    chunks. Pure map-side explode over a sequence() — zero shuffle, and
    chunk_idx is derived arithmetically from tok_start (tok_start / step)
    so no positional explode state is needed.
    """
    if overlap >= chunk_len:
        raise ValueError("overlap must be < chunk_len")
    step = chunk_len - overlap
    n = F.size(tokens_col(F.col(text_col)))
    starts = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(step))).otherwise(
        F.array().cast("array<int>")
    )
    return (
        ensure_parallelism(docs)
        .select(F.col(id_col), n.alias("n_tokens"), F.explode(starts).alias("tok_start"))
        .select(
            id_col,
            (F.col("tok_start") / step).cast("long").alias("chunk_idx"),
            F.col("tok_start").cast("long"),
            F.least(F.lit(chunk_len), F.col("n_tokens") - F.col("tok_start"))
            .cast("long")
            .alias("tok_len"),
        )
        .orderBy(id_col, "chunk_idx")
    )


def domain_mix(
    docs: DataFrame,
    weights: dict[str, int],
    key_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix|",
) -> DataFrame:
    """Rebalance the corpus to a target domain mixture by downsampling only:
    given integer weight parts per domain (e.g. {web: 5, code: 3, books: 2}
    = 50/30/20), keep the largest sample achieving those proportions
    exactly, without upsampling any domain.

    The budget is set by the binding (scarcest-relative-to-weight) domain:
    keep_s/n_s = min_m(n_m/w_m) * w_s/n_s. Thresholds stay in pure int64
    arithmetic — thr_s = min_m floor(2^16 * w_s * n_m / (n_s * w_m)), using
    floor's monotonicity to fold the rational min into the integer min — so
    the DuckDB oracle reproduces every keep decision bit-for-bit, and row
    selection is the same nested hash-threshold filter stratified_sample
    uses (reproducible, no RNG).

    Scale shape: one tiny groupBy(domain) count, a #domains^2 literal cross
    join on the driver-free small side, then a broadcast join back — the
    corpus itself is scanned once and never shuffled. Domains absent from
    `weights` are dropped (weight 0).
    """
    docs = ensure_parallelism(docs)
    wdf = docs.sparkSession.createDataFrame(
        sorted(weights.items()), f"{key_col} string, w long"
    )
    counts = (
        docs.groupBy(key_col)
        .agg(F.count("*").alias("n"))
        .join(F.broadcast(wdf), key_col)
    )
    s, m = counts.alias("s"), counts.alias("m")
    thr = (
        s.crossJoin(F.broadcast(m))
        .groupBy(F.col(f"s.{key_col}").alias(key_col))
        .agg(
            F.min(
                F.expr("CAST(65536 * s.w * m.n AS LONG) div CAST(s.n * m.w AS LONG)")
            ).alias("thr")
        )
    )
    u = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 4),
        16,
        10,
    ).cast("long")
    return (
        docs.join(F.broadcast(thr), key_col)
        .where(u < F.least(F.col("thr"), F.lit(65536)))
        .select(F.col(id_col), F.col(key_col))
        .orderBy(id_col)
    )


DSIR_BUCKETS = 1024


def dsir_weights(
    docs: DataFrame,
    target_col: str = "lang",
    target_val: str = "en",
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw document by
    how much its hashed-unigram distribution looks like the target domain's,
    log w(x) = sum_tokens [ ln p_target(h(t)) - ln p_raw(h(t)) ],
    with Laplace-smoothed bucket probabilities (count+1)/(total+B). Sampling
    proportionally to w(x) shifts a generic crawl toward the target domain;
    here target = documents whose `target_col` equals `target_val`, raw =
    the whole corpus.

    Scale shape: tokens are hashed into B buckets (md5-derived, the oracle
    mirrors the hash), so the feature table is B rows regardless of corpus
    size — ONE explode + ONE groupBy(bucket) builds both distributions in a
    single pass (conditional aggregation, map-side combined), and scoring
    re-joins tokens to the B-row weight table as a broadcast. The corpus is
    scanned twice and shuffled only for the per-doc sum (one row per doc
    per map task). Zero-token documents report n_tokens = 0, NULL weight.
    """
    docs = ensure_parallelism(docs)
    toks = docs.select(
        F.col(id_col),
        (F.col(target_col) == F.lit(target_val)).alias("is_t"),
        F.explode(tokens_col(F.col(text_col))).alias("tok"),
    ).select(
        id_col,
        "is_t",
        (F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long") % buckets).alias(
            "b"
        ),
    )
    bucket_counts = toks.groupBy("b").agg(
        F.count("*").alias("cr"),
        F.count(F.when(F.col("is_t"), F.lit(1))).alias("ct"),
    )
    totals = bucket_counts.agg(
        F.sum("cr").alias("nr"), F.sum("ct").alias("nt")
    )
    w = bucket_counts.crossJoin(F.broadcast(totals)).select(
        "b",
        (
            F.log((F.col("ct") + F.lit(1.0)) / (F.col("nt") + F.lit(float(buckets))))
            - F.log((F.col("cr") + F.lit(1.0)) / (F.col("nr") + F.lit(float(buckets))))
        ).alias("w"),
    )
    scored = (
        toks.join(F.broadcast(w), "b")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(F.sum("w"), 6).alias("log_weight"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0).cast("long")).alias("n_tokens"),
            F.col("log_weight"),
        )
        .orderBy(id_col)
    )


def decontaminate_lsh(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num: int = 1,
    den: int = 2,
    num_hashes: int | None = None,
    bands: int | None = None,
) -> DataFrame:
    """Scale-path decontamination: `decontaminate` broadcasts the WHOLE
    benchmark shingle set — right while the eval suite fits a broadcast,
    wrong shape once it is itself corpus-sized (held-out shards, giant
    eval suites). This variant runs BIPARTITE MinHash LSH: corpus and
    bench documents are banded independently and meet only on colliding
    (band, key) buckets; candidates are verified by exact shingle Jaccard
    (candidate-scoped joins, work ∝ candidates, never corpus x bench);
    a document is contaminated when ANY bench doc verifies at
    Jaccard >= num/den (integral compare — no float threshold).

    Output per corpus doc: (doc_id, n_candidates, n_contaminating,
    contaminated). Detection differs from `decontaminate` by design:
    aggregate-shingle overlap flags piecewise contamination from MANY
    bench docs; this flags whole-document near-copies of SOME bench doc,
    at LSH recall."""
    from btrdb_server_spark.functions.dedup import (
        DEFAULT_BANDS,
        DEFAULT_NUM_HASHES,
        minhash_signatures,
    )

    num_hashes = num_hashes or DEFAULT_NUM_HASHES
    bands = bands or DEFAULT_BANDS
    r = num_hashes // bands

    def band_table(frame, out):
        sig = minhash_signatures(frame, text_col, id_col, num_hashes, k)
        band_structs = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat_ws(
                        "|", *[F.col(f"mh{b * r + i}") for i in range(r)]
                    ).alias("band_key"),
                )
                for b in range(bands)
            ]
        )
        return sig.select(
            F.col(id_col).alias(out), F.explode(band_structs).alias("bk")
        ).select(out, F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))

    cand = (
        band_table(docs, "did")
        .join(band_table(bench, "bid"), ["band", "band_key"])
        .select("did", "bid")
        .distinct()
    )

    def hashed_shingles(frame, out):
        return (
            ensure_parallelism(frame)
            .select(
                F.col(id_col).alias(out),
                F.explode(shingles_col(F.col(text_col), k)).alias("s"),
            )
            .select(
                out,
                F.conv(F.substring(F.md5("s"), 1, 15), 16, 10)
                .cast("long")
                .alias("s"),
            )
            .distinct()
        )

    sh_c = hashed_shingles(docs, "did")
    sh_b = hashed_shingles(bench, "bid")
    inter = (
        cand.join(sh_c, "did")
        .join(sh_b, ["bid", "s"])
        .groupBy("did", "bid")
        .agg(F.count("*").alias("inter"))
    )
    sza = sh_c.groupBy("did").agg(F.count("*").alias("sza"))
    szb = sh_b.groupBy("bid").agg(F.count("*").alias("szb"))
    # No broadcast hints on the size tables: a broadcast build is its own
    # exchange boundary, so it REPLAYS the whole hashed-shingle corpus
    # pass (runtime exchange reuse cannot cross it) — and at 100 TB a
    # doc-scale size table must not broadcast anyway. As plain shuffle
    # joins, sza/szb sit directly above sh_c/sh_b's distinct exchanges
    # and ReusedExchange serves them from the one materialization.
    flags = (
        inter.join(sza, "did")
        .join(szb, "bid")
        .select(
            "did",
            (
                F.col("inter") * F.lit(den)
                >= (F.col("sza") + F.col("szb") - F.col("inter")) * F.lit(num)
            ).cast("long").alias("hit"),
        )
        .groupBy("did")
        .agg(F.sum("hit").alias("n_contaminating"))
    )
    ncand = cand.groupBy("did").agg(F.count("*").alias("n_candidates"))
    return (
        docs.select(F.col(id_col))
        .join(ncand.withColumnRenamed("did", id_col), id_col, "left")
        .join(flags.withColumnRenamed("did", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_candidates", F.lit(0)).cast("long").alias("n_candidates"),
            F.coalesce("n_contaminating", F.lit(0))
            .cast("long")
            .alias("n_contaminating"),
            (F.coalesce("n_contaminating", F.lit(0)) > 0).alias("contaminated"),
        )
        .orderBy(id_col)
    )


def group_topk(
    docs: DataFrame,
    group_col: str = "lang",
    order_col: str = "n_chars",
    k: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group quota selection: the top k rows of each group by
    `order_col` descending (ties broken by ascending id — fully
    deterministic) — the "keep the k best documents per domain/language"
    curation primitive.

    Scale shape: Spark rewrites a row_number-filter window into
    WindowGroupLimit, which keeps ONLY k rows per group per partition
    BEFORE the exchange (pinned in tests/test_plans.py) — the shuffle
    carries groups x k rows, never the corpus. Columns: group_col, id,
    order value, rk."""
    w = Window.partitionBy(group_col).orderBy(
        F.col(order_col).desc(), F.col(id_col).asc()
    )
    return (
        docs.select(group_col, id_col, order_col)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= F.lit(k))
        # cast AFTER the filter: the WindowGroupLimit rewrite matches the
        # raw rank predicate, and the int64 output matches SQL engines
        # whose row_number() is BIGINT.
        .select(group_col, id_col, order_col, F.col("rk").cast("long").alias("rk"))
        .orderBy(group_col, "rk")
    )


def quality_curve(
    docs: DataFrame,
    thresholds: tuple[int, ...] = (10, 20, 40, 80, 160),
    text_col: str = "text",
) -> DataFrame:
    """Survival curve of the corpus under a sliding minimum-token-count
    quality bar: for each threshold, how many documents and how much
    token volume survive — the sizing table read before committing to a
    filter setting (the complement of quality_filter's single verdict).

    Pure integer counts (token counts per doc computed once, thresholds
    applied as conditional sums); each share is ONE division of exact
    int64s. Scale shape: one corpus pass to per-doc token counts
    (map-side), then a thresholds x docs conditional aggregate — the
    doc-scale table is scanned once per batch of thresholds, never the
    corpus. Columns: min_tokens, docs_kept, docs_total, tokens_kept,
    tokens_total, doc_share, token_share."""
    if not thresholds:
        raise ValueError("need at least one threshold")
    from btrdb_server_spark.functions.text import tokens_col

    per_doc = docs.select(
        F.size(tokens_col(F.col(text_col))).cast("long").alias("n_tok")
    )
    spark = docs.sparkSession
    tdf = spark.createDataFrame(
        [(int(t),) for t in thresholds], "min_tokens long"
    )
    agg = (
        tdf.join(per_doc)
        .groupBy("min_tokens")
        .agg(
            F.sum((F.col("n_tok") >= F.col("min_tokens")).cast("long")).alias(
                "docs_kept"
            ),
            F.count("*").alias("docs_total"),
            F.sum(
                F.when(F.col("n_tok") >= F.col("min_tokens"), F.col("n_tok"))
            ).alias("tokens_kept"),
            F.sum("n_tok").alias("tokens_total"),
        )
    )
    d = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("double")  # noqa: E731
    return agg.select(
        "min_tokens",
        "docs_kept",
        "docs_total",
        F.coalesce(F.col("tokens_kept"), F.lit(0)).alias("tokens_kept"),
        "tokens_total",
        (d("docs_kept") / F.col("docs_total").cast("double")).alias(
            "doc_share"
        ),
        (d("tokens_kept") / F.col("tokens_total").cast("double")).alias(
            "token_share"
        ),
    ).orderBy("min_tokens")


def curation_pipeline(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The composed curation funnel — the numbers a pretraining-data run
    reports: how many documents and tokens survive each stage of
    raw -> exact dedup (md5-content keeper) -> quality filter (the
    Gopher-style rules of quality_filter) -> decontamination (3-gram
    overlap vs the benchmark set, the decontaminate rule). One row per
    stage with the running doc/token totals and the share of the raw
    corpus still standing.

    Every stage decision is the EXISTING operator's integer rule — this
    operator adds only the composition, so the funnel is engine-exact
    end to end. Scale shape: each stage's flag is a doc-scale column
    (content hash groupBy, JVM quality expressions, broadcast-bench
    shingle match); the funnel aggregate reads the flag table once.
    Columns: stage_idx, stage, docs, tokens, doc_share, token_share."""
    from btrdb_server_spark.functions.dedup import exact_dedup
    from btrdb_server_spark.functions.text import tokens_col

    n_tok = F.size(tokens_col(F.col(text_col))).cast("long")
    base = docs.select(F.col(id_col), n_tok.alias("n_tok"))
    dup = exact_dedup(docs, text_col=text_col, id_col=id_col).select(
        id_col, F.col("is_dup")
    )
    qual = quality_filter(docs, text_col=text_col, id_col=id_col).select(
        id_col, F.col("keep").alias("q_keep")
    )
    cont = decontaminate(docs, bench, text_col=text_col, id_col=id_col).select(
        id_col, F.col("contaminated")
    )
    flags = (
        base.join(dup, id_col)
        .join(qual, id_col)
        .join(cont, id_col)
        .select(
            "n_tok",
            (~F.col("is_dup")).alias("s1"),
            (~F.col("is_dup") & F.col("q_keep")).alias("s2"),
            (
                ~F.col("is_dup") & F.col("q_keep") & ~F.col("contaminated")
            ).alias("s3"),
        )
    )
    agg = flags.agg(
        F.count("*").alias("d0"),
        F.sum("n_tok").alias("t0"),
        F.sum(F.col("s1").cast("long")).alias("d1"),
        F.sum(F.when(F.col("s1"), F.col("n_tok")).otherwise(F.lit(0))).alias("t1"),
        F.sum(F.col("s2").cast("long")).alias("d2"),
        F.sum(F.when(F.col("s2"), F.col("n_tok")).otherwise(F.lit(0))).alias("t2"),
        F.sum(F.col("s3").cast("long")).alias("d3"),
        F.sum(F.when(F.col("s3"), F.col("n_tok")).otherwise(F.lit(0))).alias("t3"),
    )
    names = ["raw", "dedup", "quality", "decontaminated"]
    stages = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("stage_idx"),
                F.lit(names[i]).alias("stage"),
                F.col(f"d{i}").alias("docs"),
                F.col(f"t{i}").alias("tokens"),
            )
            for i in range(4)
        ]
    )
    return (
        agg.select(F.explode(stages).alias("s"), "d0", "t0")
        .select(
            F.col("s.stage_idx").alias("stage_idx"),
            F.col("s.stage").alias("stage"),
            F.col("s.docs").alias("docs"),
            F.col("s.tokens").alias("tokens"),
            (F.col("s.docs").cast("double") / F.col("d0").cast("double")).alias(
                "doc_share"
            ),
            (
                F.col("s.tokens").cast("double") / F.col("t0").cast("double")
            ).alias("token_share"),
        )
        .orderBy("stage_idx")
    )


def weighted_sample(
    docs: DataFrame,
    k: int = 100,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    salt: str = "ws",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES): each row gets key = ln(u)/w for a salted-hash uniform
    u in (0, 1]; the k largest keys are a weight-proportional sample.
    With weight = document length, this is token-budget-proportional
    corpus sampling — the mixing primitive stratified_sample (equal-rate)
    and dsir_weights (importance scores) don't give you.

    Exactness: u = (hv+1)/2^32 is an exact power-of-two division of a
    salted md5 integer; ln is the libm pandas UDF (JVM Math.log is 1-ulp
    off); the key is one further division by the integer weight. Scale
    shape: one map-side projection, then a global top-k that plans as
    TakeOrderedAndProject (per-partition heaps, k rows on the exchange —
    never a full sort). Rows with weight <= 0 are excluded (both
    engines)."""
    import math as _math

    from btrdb_server_spark.utils import libm_ln

    _ln = libm_ln(strict=True)  # libm shim; raises on nonpositive — matches DuckDB bit-exactly

    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    keyed = (
        ensure_parallelism(docs)
        .where(F.col(weight_col) > 0)
        .select(
            F.col(id_col),
            F.col(weight_col).cast("long").alias("weight"),
            (
                _ln((hv + F.lit(1)).cast("double") / F.lit(4294967296.0))
                / F.col(weight_col).cast("double")
            ).alias("key"),
        )
    )
    return keyed.orderBy(F.desc("key"), id_col).limit(k)


def pack_efficiency(
    docs: DataFrame,
    ctx_len: int = 256,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Packing efficiency report over pack_sequences: per shard, how many
    training sequences the token stream fills, the tail waste (padding in
    the final sequence), the fill ratio, and how many documents straddle
    a sequence boundary (the cross-document-attention contamination
    proxy packing runs monitor). Columns: shard, n_docs, n_tokens,
    n_seqs, tail_waste, fill_ratio, n_split_docs, split_frac.

    All-integer except the two ratio divisions; beyond pack_sequences
    this is one metadata-scale aggregate per shard."""
    packed = pack_sequences(docs, ctx_len, n_shards, text_col, id_col)
    split = (
        (
            F.expr(f"(tok_offset + n_tokens - 1) div {ctx_len}")
            != F.col("seq_idx")
        )
        & (F.col("n_tokens") > 0)
    ).cast("long")
    per = packed.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum(split).alias("n_split_docs"),
    )
    n_seqs = F.expr(f"(n_tokens + {ctx_len - 1}) div {ctx_len}")
    d = lambda c: c.cast("double")  # noqa: E731
    return (
        per.select(
            "shard",
            "n_docs",
            "n_tokens",
            n_seqs.alias("n_seqs"),
            (n_seqs * F.lit(ctx_len) - F.col("n_tokens")).alias("tail_waste"),
            (
                d(F.col("n_tokens")) / d(n_seqs * F.lit(ctx_len))
            ).alias("fill_ratio"),
            "n_split_docs",
            (d(F.col("n_split_docs")) / d(F.col("n_docs"))).alias("split_frac"),
        )
        .orderBy("shard")
    )
