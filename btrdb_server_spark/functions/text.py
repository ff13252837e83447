"""Text analysis for large-scale training-data pipelines: tokenization,
quality scoring, language ID, document fingerprinting.

All hot-path logic is built-in column expressions (JVM-side, codegen'd) —
no Python UDFs — so a 100 TB documents table processes at full vectorized
parquet-scan speed with column pruning (only `text` + id columns read).
Formulas are deliberately expressible in ANSI SQL so every operator has a
DuckDB oracle twin in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from btrdb_server_spark.utils import ensure_parallelism

# Shared with the SQL oracles — keep in sync with __spark_entry__.py.
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]
PUNCT_CLASS = r"[^.,;:!?]"

# Tiny marker-word vote tables for the language-ID heuristic.
LANG_MARKERS = {
    "en": ["the", "and", "of", "is"],
    "es": ["el", "la", "de", "que"],
    "de": ["der", "die", "und", "ist"],
    "fr": ["le", "les", "et", "est"],
}


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization, lowercased, empty tokens dropped — identical
    to list_filter(regexp_split_to_array(lower(t), '\\s+'), x -> x <> '')."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda x: x != F.lit(""))


def text_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document stats: token count, mean token length, punctuation ratio,
    stopword ratio, and a composite quality score in [0,1]."""
    docs = ensure_parallelism(docs)
    toks = tokens_col(F.col(text_col))
    n_toks = F.size(toks)
    tok_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    n_punct = F.length(F.regexp_replace(F.col(text_col), PUNCT_CLASS, ""))
    n_chars = F.length(F.col(text_col))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_toks, F.lit(1))
    quality = (
        F.lit(0.4) * F.least(n_toks / F.lit(50.0), F.lit(1.0))
        + F.lit(0.3) * stop_ratio
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
    )
    return docs.select(
        F.col(id_col),
        n_toks.alias("n_tokens"),
        # No round(): integer-ratio values hit exact decimal .5 ties (e.g.
        # 1/128) where Spark HALF_UP and DuckDB HALF_EVEN disagree; the raw
        # IEEE expressions are bit-identical across engines.
        (tok_chars / F.greatest(n_toks, F.lit(1))).alias("mean_token_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        quality.alias("quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word-vote language ID: count marker hits per language, argmax
    with deterministic tie-break on language code order, 'und' when no
    marker hits at all."""
    docs = ensure_parallelism(docs)
    toks = tokens_col(F.col(text_col))

    # NB: single-arg lambdas only — a second parameter (even defaulted) makes
    # F.filter pass the element index into it.
    def _hits(markers):
        return F.size(F.filter(toks, lambda t: t.isin(markers)))

    langs = sorted(LANG_MARKERS)  # deterministic tie-break: alphabetical
    # argmax via lexicographic array_max over (score, -index) structs: each
    # score expression appears ONCE in the plan (a greatest + when-chain
    # formulation re-expands every score per comparison — measured ~3x the
    # expression tree), ties go to the smallest index = alphabetical order.
    scored = F.array_max(
        F.array(
            *[
                F.struct(
                    _hits(LANG_MARKERS[lang]).alias("s"), F.lit(-i).alias("ni")
                )
                for i, lang in enumerate(langs)
            ]
        )
    )
    lang_names = F.array(*[F.lit(l) for l in langs])
    pred = F.when(F.col("m.s") == 0, F.lit("und")).otherwise(
        F.element_at(lang_names, (-F.col("m.ni") + 1).cast("int"))
    )
    return docs.select(F.col(id_col), scored.alias("m")).select(
        F.col(id_col), pred.alias("pred_lang")
    )


def doc_fingerprint(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Whitespace-normalized md5 content fingerprint — the canonical key for
    exact dedup and change detection."""
    docs = ensure_parallelism(docs)
    normalized = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return docs.select(F.col(id_col), F.md5(normalized).alias("fingerprint"))


# BPE-style pre-tokenizer: letter runs | digit runs | punctuation runs.
# Explicit whitespace class (not \s) so Java regex (Spark) and RE2 (DuckDB)
# agree byte-for-byte.
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r\\f]+"


def bpe_token_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Token counting with a BPE-ish pre-tokenizer regex (the standard
    letters/digits/punct split that BPE vocabularies train over): total
    pre-tokens, unique pre-tokens, and bytes-per-token — the compression
    proxy used for training-data sizing. Pure regexp_extract_all + array
    ops: JVM codegen, one scan (the repartition spreads the single-file
    local input; a real lake's file count already exceeds the core count)."""
    docs = ensure_parallelism(docs)
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), F.lit(0))
    n = F.size(toks)
    return docs.select(
        F.col(id_col),
        n.cast("long").alias("n_bpe"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_bpe"),
        # Unrounded: integer ratio, see text_stats note on rounding ties.
        (F.length(F.col(text_col)) / F.greatest(n, F.lit(1))).alias("chars_per_token"),
    )


# Rolling-hash fold constants (Rabin-Karp): base 131, modulus 1e9+7. Token
# values stay < 2^17 and the accumulator < 2^30, so base*acc+tok < 2^38 —
# safely inside int64 even under ANSI overflow checking.
RH_BASE = 131
RH_MOD = 1_000_000_007


def _hex4(col: Column) -> Column:
    """First-4-hex-chars of a digest -> int in [0, 65536). Spark-side conv()
    is one JVM call; the DuckDB oracle mirrors it with instr arithmetic."""
    return F.conv(F.substring(col, 1, 4), 16, 10).cast("long")


def rolling_fingerprint(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Polynomial rolling-hash document fingerprint: fold
    h = (h*131 + hash16(token)) mod 1e9+7 over the whitespace token stream.
    Order-sensitive (unlike a bag-of-words hash) yet incremental — the
    streaming-ingest-friendly fingerprint. Single map-side pass, no
    shuffle."""
    docs = ensure_parallelism(docs)
    toks = tokens_col(F.col(text_col))
    tok_hashes = F.transform(toks, lambda t: _hex4(F.md5(t)).cast("long"))
    fp = F.aggregate(
        tok_hashes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * RH_BASE + x) % RH_MOD,
    )
    return docs.select(F.col(id_col), fp.alias("fp"))


def token_freq(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", top: int = 100
) -> DataFrame:
    """Corpus vocabulary: the `top` most frequent whitespace tokens with
    total count and document frequency. One explode + one groupBy — the
    count combines map-side, the shuffle carries one row per distinct
    token per map task, and the top-k is TakeOrderedAndProject (no global
    sort). Ties break lexicographically for determinism."""
    toks = ensure_parallelism(docs).select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("tok")
    )
    return (
        toks.groupBy("tok")
        .agg(
            F.count("*").alias("cnt"),
            F.countDistinct(id_col).alias("doc_freq"),
        )
        .orderBy(F.col("cnt").desc(), "tok")
        .limit(top)
    )


# Scrub patterns shared verbatim with the DuckDB oracle: plain character
# classes only, identical semantics in Java regex and RE2.
SCRUB_URL = r"https?://[^\s]+"
SCRUB_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
SCRUB_DIGITS = r"[0-9][0-9][0-9][0-9][0-9]+"


def text_scrub(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Training-data scrubbing: URLs, emails, and long digit runs (ids,
    phone numbers) replaced with typed placeholder tokens, plus counts of
    each redaction. Pure column expressions — three regexp passes fused in
    one codegen stage, no Python in the row path."""
    docs = ensure_parallelism(docs)
    t = F.col(text_col)
    n_urls = F.size(F.regexp_extract_all(t, F.lit(SCRUB_URL), F.lit(0)))
    t1 = F.regexp_replace(t, SCRUB_URL, "<URL>")
    n_emails = F.size(F.regexp_extract_all(t1, F.lit(SCRUB_EMAIL), F.lit(0)))
    t2 = F.regexp_replace(t1, SCRUB_EMAIL, "<EMAIL>")
    n_digits = F.size(F.regexp_extract_all(t2, F.lit(SCRUB_DIGITS), F.lit(0)))
    t3 = F.regexp_replace(t2, SCRUB_DIGITS, "<NUM>")
    return docs.select(
        F.col(id_col),
        t3.alias("scrubbed"),
        n_urls.cast("long").alias("n_urls"),
        n_emails.cast("long").alias("n_emails"),
        n_digits.cast("long").alias("n_numbers"),
    )


def ngrams_col(text: Column, n: int) -> Column:
    """Word n-grams as space-joined strings (empty array when fewer than n
    tokens) — the generalization of dedup.shingles_col shared with the
    repetition metrics."""
    toks = tokens_col(text)
    cnt = F.size(toks)
    return F.when(
        cnt >= n,
        F.transform(
            F.sequence(F.lit(1), cnt - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1): the fraction
    of duplicate word bigrams / trigrams and the count of the most frequent
    bigram, per document. High duplicate-n-gram fractions flag boilerplate
    and template spam that per-token quality rules miss.

    dup_frac_n = (total n-grams - distinct n-grams) / total n-grams
    (0.0 for documents with no n-grams).

    Scale shape: both n-gram sizes ride ONE explode + ONE groupBy pair —
    grams are tagged with n and counted per (doc, n, gram) with map-side
    combine, then reduced per doc with conditional aggregates. The shuffle
    carries one row per distinct (doc, n, gram) per map task; nothing is
    quadratic in document length (an array_distinct/mode formulation would
    be). Joined back to the full doc list so gram-less documents still
    report zeros.
    """
    docs = ensure_parallelism(docs)
    grams = docs.select(
        F.col(id_col),
        F.explode(
            F.concat(
                F.transform(
                    ngrams_col(F.col(text_col), 2),
                    lambda g: F.struct(F.lit(2).alias("n"), g.alias("g")),
                ),
                F.transform(
                    ngrams_col(F.col(text_col), 3),
                    lambda g: F.struct(F.lit(3).alias("n"), g.alias("g")),
                ),
            )
        ).alias("ng"),
    ).select(id_col, F.col("ng.n").alias("n"), F.col("ng.g").alias("g"))
    per_gram = grams.groupBy(id_col, "n", "g").agg(F.count("*").alias("cnt"))
    is2 = F.col("n") == 2
    is3 = F.col("n") == 3
    agg = per_gram.groupBy(id_col).agg(
        F.coalesce(F.sum(F.when(is2, F.col("cnt"))), F.lit(0)).alias("tot2"),
        F.coalesce(F.count(F.when(is2, F.lit(1))), F.lit(0)).alias("dist2"),
        F.coalesce(F.max(F.when(is2, F.col("cnt"))), F.lit(0)).alias("top2"),
        F.coalesce(F.sum(F.when(is3, F.col("cnt"))), F.lit(0)).alias("tot3"),
        F.coalesce(F.count(F.when(is3, F.lit(1))), F.lit(0)).alias("dist3"),
    )
    # No rounding: the raw IEEE division is bit-identical to the oracle's
    # (round(x, 6) is NOT — Spark HALF_UP vs DuckDB's banker's rounding can
    # disagree on ties, which is exactly the hash mismatch the driver saw).
    frac = lambda tot, dist: F.when(  # noqa: E731
        F.col(tot) > 0, (F.col(tot) - F.col(dist)) / F.col(tot)
    ).otherwise(0.0)
    return (
        docs.select(id_col)
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("tot2"), F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce(frac("tot2", "dist2"), F.lit(0.0)).alias("dup_bigram_frac"),
            F.coalesce(frac("tot3", "dist3"), F.lit(0.0)).alias("dup_trigram_frac"),
            F.coalesce(F.col("top2"), F.lit(0)).cast("long").alias("top_bigram_cnt"),
        )
        .orderBy(id_col)
    )


def token_entropy(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Shannon entropy of the token distribution (nats):
    H = ln(n) - (1/n) * sum_tok cnt*ln(cnt). Low entropy flags repetitive
    boilerplate that duplicate-ngram fractions can miss (e.g. one token
    repeated with rotating separators); high entropy approaches ln(n) for
    all-distinct tokens. Computed via the cnt*ln(cnt) identity so a single
    groupBy over (doc, token) with map-side combine feeds one per-doc sum —
    no per-doc vocabulary arrays, nothing quadratic. Zero-token documents
    report n_tokens = 0 and NULL entropy.
    """
    docs = ensure_parallelism(docs)
    per_tok = (
        docs.select(F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("cnt"))
    )
    agg = per_tok.groupBy(id_col).agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.sum(F.col("cnt") * F.log("cnt")).alias("clogc"),
    )
    scored = agg.select(
        id_col,
        "n_tokens",
        F.round(
            F.log(F.col("n_tokens")) - F.col("clogc") / F.col("n_tokens"), 6
        ).alias("entropy"),
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0).cast("long")).alias("n_tokens"),
            F.col("entropy"),
        )
        .orderBy(id_col)
    )


def ngram_freq(
    docs: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    top: int = 100,
) -> DataFrame:
    """Corpus n-gram table: the `top` most frequent word n-grams with
    total count and document frequency — the phrase-level companion to
    token_freq that an LM data pipeline reads for boilerplate phrases,
    contamination shingles, and tokenizer merge candidates. Same plan
    shape: one explode + one map-side-combined groupBy, top-k as
    TakeOrderedAndProject (no global sort), lexicographic tie-break."""
    from btrdb_server_spark.functions.dedup import shingles_col

    grams = ensure_parallelism(docs).select(
        F.col(id_col), F.explode(shingles_col(F.col(text_col), n)).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(
            F.count("*").alias("cnt"),
            F.countDistinct(id_col).alias("doc_freq"),
        )
        .orderBy(F.col("cnt").desc(), "gram")
        .limit(top)
    )


def token_collocations(
    docs: DataFrame,
    min_count: int = 5,
    top: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus collocations: adjacent token pairs ranked by LIFT —
    P(w1 w2) / (P(w1) P(w2)) over bigram slots vs unigram slots — the
    "statistically glued" phrases (named entities, idioms, boilerplate)
    a tokenizer or phrase-mining pass wants, where raw ngram_freq counts
    only surface the common. lift = (c12 * n_uni * n_uni) /
    (n_bi * c1 * c2), every factor an exact int64 count, the expression
    one fixed-association double product: bit-identical in any engine
    (kept rational — ln() differs across engines, so no log-PMI).

    Scale shape: one token explode feeding BOTH the unigram and bigram
    map-side-combined groupBys, marginal counts join the (already
    min_count-pruned) bigram table on single-token keys, corpus totals
    broadcast as one row; top-k is TakeOrderedAndProject. Columns: w1,
    w2, c12, c1, c2, lift; ordered by (lift desc, w1, w2)."""
    toks = ensure_parallelism(docs).select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("toks")
    )
    uni = toks.select(F.explode("toks").alias("w")).groupBy("w").agg(
        F.count("*").alias("c")
    )
    pairs = (
        toks.where(F.size("toks") >= 2)
        .select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("toks"), 1, F.size("toks") - 1),
                    F.slice(F.col("toks"), 2, F.size("toks") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
        .where(F.col("c12") >= min_count)
    )
    totals = uni.agg(F.sum("c").alias("n_uni")).crossJoin(
        pairs.agg(F.sum("c12").alias("n_bi"))
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    lift = ((d("c12") * d("n_uni")) * d("n_uni")) / (
        (d("n_bi") * d("c1")) * d("c2")
    )
    return (
        pairs.join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(totals))
        .select("w1", "w2", "c12", "c1", "c2", lift.alias("lift"))
        .orderBy(F.col("lift").desc(), "w1", "w2")
        .limit(top)
    )


def corpus_summary(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    source_col: str = "source",
) -> DataFrame:
    """One-row corpus dashboard: document count, total/unique token
    counts, exact mean tokens per doc (one double division), total
    characters, and language/source cardinalities — the summary line a
    dataset card or ingest review starts from. All-integer except the
    division.

    Scale shape: one pass computes the per-doc aggregates map-side
    (token counts from the array length — no explode for totals); only
    the DISTINCT-token count needs the exploded table, and it
    map-side-combines to vocabulary scale. Columns: n_docs, n_tokens,
    n_unique_tokens, mean_tokens, total_chars, n_langs, n_sources."""
    toks = ensure_parallelism(docs).select(
        F.col(id_col),
        F.col(lang_col),
        F.col(source_col),
        tokens_col(F.col(text_col)).alias("toks"),
        F.length(text_col).cast("long").alias("chars"),
    )
    base = toks.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size("toks").cast("long")).alias("n_tokens"),
        F.sum("chars").alias("total_chars"),
        F.countDistinct(lang_col).alias("n_langs"),
        F.countDistinct(source_col).alias("n_sources"),
    )
    vocab = toks.select(F.explode("toks").alias("w")).agg(
        F.countDistinct("w").alias("n_unique_tokens")
    )
    return base.crossJoin(F.broadcast(vocab)).select(
        "n_docs",
        "n_tokens",
        "n_unique_tokens",
        (F.col("n_tokens").cast("double") / F.col("n_docs").cast("double")).alias(
            "mean_tokens"
        ),
        "total_chars",
        "n_langs",
        "n_sources",
    )


def zipf_fit(
    docs: DataFrame, top: int = 100, text_col: str = "text"
) -> DataFrame:
    """Zipf's-law fit of the corpus token distribution: OLS slope of
    ln(freq) against ln(rank) over the `top` most frequent tokens
    (natural text sits near slope -1; synthetic or templated corpora
    drift off it — a one-row corpus fingerprint for drift monitoring).
    Ranks are integers (count desc, token asc tiebreak), the per-rank
    log terms are deterministic doubles, and every OLS sum runs as a
    FIXED-ORDER fold over the rank-sorted term list, so slope/intercept/
    r2 are bit-identical across engines and plans. The logs themselves
    are computed by a label-scale pandas UDF wrapping libm's log —
    java.lang.Math.log is only 1-ulp-accurate and measurably disagrees
    with the C library DuckDB calls (observed on 5/199 small ints), so
    the JVM log built-ins cannot appear in an oracle-paired expression.

    Scale shape: one token-scale groupBy (map-side combined), a
    TakeOrderedAndProject top-k, then label-scale work: rank window over
    `top` rows and four folds over a collected array. vocab/total counts
    ride in via broadcast 1-row cross joins. Columns: n_top, vocab_size,
    total_tokens, slope, intercept, r2."""
    from pyspark.sql import Window as W

    counts = (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
    )
    totals = counts.agg(
        F.count("*").alias("vocab_size"),
        F.sum("cnt").alias("total_tokens"),
    )
    ranked = (
        counts.orderBy(F.col("cnt").desc(), "tok")
        .limit(top)
        .select(
            F.row_number()
            .over(W.orderBy(F.col("cnt").desc(), "tok"))
            .alias("rank"),
            "cnt",
        )
    )
    import math

    from btrdb_server_spark.utils import libm_ln

    _ln = libm_ln(strict=True)  # libm shim; raises on nonpositive — matches DuckDB bit-exactly

    terms = ranked.select(
        "rank",
        _ln(F.col("rank").cast("double")).alias("x"),
        _ln(F.col("cnt").cast("double")).alias("y"),
    ).select(
        "rank",
        "x",
        "y",
        (F.col("x") * F.col("y")).alias("xy"),
        (F.col("x") * F.col("x")).alias("xx"),
        (F.col("y") * F.col("y")).alias("yy"),
    )
    arr = F.array_sort(
        F.collect_list(F.struct("rank", "x", "y", "xy", "xx", "yy"))
    )
    fold = lambda field: F.aggregate(  # noqa: E731
        F.col("arr"), F.lit(0.0), lambda acc, e: acc + e[field]
    )
    agg = terms.agg(
        F.count("*").alias("n"), arr.alias("arr")
    ).select(
        "n",
        fold("x").alias("sx"),
        fold("y").alias("sy"),
        fold("xy").alias("sxy"),
        fold("xx").alias("sxx"),
        fold("yy").alias("syy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    n = d("n")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov / vx
    return (
        agg.crossJoin(F.broadcast(totals))
        .select(
            F.col("n").alias("n_top"),
            "vocab_size",
            F.col("total_tokens").cast("long").alias("total_tokens"),
            slope.alias("slope"),
            ((F.col("sy") - slope * F.col("sx")) / n).alias("intercept"),
            F.when(vy > 0, cov * cov / (vx * vy)).alias("r2"),
        )
    )


def readability(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Flesch-Kincaid-style readability per document with the classic
    vowel-group syllable proxy: syllables = count of [aeiouy]+ runs in
    the lowercased text (whitespace breaks runs, so the total equals the
    per-word sum), sentences = count of [.!?]+ runs floored at one.
    grade = 0.39*(words/sentences) + 11.8*(syllables/words) - 15.59 —
    two exact-integer divisions combined in one fixed IEEE expression.

    Scale shape: three JVM-side regexp counts per row, zero joins, zero
    UDFs — a pure map over the corpus scan. Columns: doc_id, words,
    sentences, syllables, fk_grade."""
    words = F.size(tokens_col(F.col(text_col)))
    sentences = F.greatest(
        F.lit(1).cast("long"),
        F.regexp_count(F.col(text_col), F.lit(r"[.!?]+")).cast("long"),
    )
    syllables = F.regexp_count(F.lower(F.col(text_col)), F.lit("[aeiouy]+")).cast(
        "long"
    )
    d = lambda c: c.cast("double")  # noqa: E731
    grade = (
        F.lit(0.39) * (d(words) / d(sentences))
        + F.lit(11.8) * (d(syllables) / d(words))
        - F.lit(15.59)
    )
    return docs.select(
        F.col(id_col),
        words.cast("long").alias("words"),
        sentences.alias("sentences"),
        syllables.alias("syllables"),
        F.when(words > 0, grade).alias("fk_grade"),
    ).orderBy(id_col)


def ngram_coverage(
    docs: DataFrame,
    n: int = 3,
    ks: tuple[int, ...] = (10, 100, 1000),
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary-concentration curve: the share of total word-`n`-gram
    VOLUME covered by the top-k most frequent n-grams, for each k — the
    one-look answer to "how head-heavy is this corpus" (and the sizing
    input for n-gram cache/LM truncation). Deterministic rank (count
    desc, gram asc); each share is ONE division of exact int64 sums.

    Scale shape: one explode+groupBy collapses the corpus to the n-gram
    domain (map-side combined); the head is then a TakeOrderedAndProject
    top-max(k) (per-partition heaps — the domain table is NEVER globally
    sorted, the rank window runs on max(k) rows), and the totals are one
    domain-scale reduce. Columns: k, covered, total, distinct_grams,
    coverage."""
    if n < 1 or not ks:
        raise ValueError("need n >= 1 and at least one k")
    from pyspark.sql import Window

    # The interpreted tokenize+slice explode is the expensive stage; a
    # single-file input would otherwise run it on ONE task (guide §2.5
    # input skew — every sibling text operator carries the same guard).
    docs = ensure_parallelism(docs)
    toks = tokens_col(F.col(text_col))
    if n == 1:
        grams = F.explode(toks).alias("g")
    else:
        grams = F.explode(
            F.when(
                F.size(toks) >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size(toks) - n),
                    lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g")
    counts = (
        docs.select(grams)
        .groupBy("g")
        .agg(F.count("*").alias("cnt"))
        # the head and the totals both read this — checkpoint so the
        # n-gram explode happens once, not per consumer.
        .localCheckpoint(eager=False)
    )
    head = counts.orderBy(F.col("cnt").desc(), F.col("g")).limit(int(max(ks)))
    w = Window.orderBy(F.col("cnt").desc(), F.col("g"))
    ranked = head.withColumn("rn", F.row_number().over(w))
    totals = counts.agg(
        F.sum("cnt").alias("total"), F.count("*").alias("distinct_grams")
    )
    spark = docs.sparkSession
    kdf = spark.createDataFrame([(int(k),) for k in ks], "k long")
    per_k = (
        kdf.join(ranked)
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("rn") <= F.col("k"), F.col("cnt"))).alias(
                "covered"
            )
        )
    )
    return (
        kdf.join(per_k, "k", "left")
        .join(F.broadcast(totals))
        .select(
            "k",
            F.coalesce(F.col("covered"), F.lit(0)).alias("covered"),
            "total",
            "distinct_grams",
            (
                F.coalesce(F.col("covered"), F.lit(0)).cast("double")
                / F.col("total").cast("double")
            ).alias("coverage"),
        )
        .orderBy("k")
    )


def vocab_growth(
    docs: DataFrame,
    checkpoints: tuple[int, ...] = (50, 100, 200, 500),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Heaps-law vocabulary growth table: at each corpus-prefix
    checkpoint (the first k documents by id), the cumulative token
    volume, the vocabulary size, and the type-token ratio — the curve
    that sizes tokenizer vocabularies and detects synthetic/looped text
    (vocabulary that stops growing).

    Exactness: vocabulary-at-k counts tokens whose FIRST occurrence doc
    is within the prefix (a min aggregate — no sequential scan);
    volume-at-k is a conditional sum; ttr is ONE division. Scale shape:
    one explode feeding two map-side-combined aggregates (first-doc per
    token at vocabulary scale, volume per doc at doc scale), then
    checkpoint-conditional sums — the corpus is scanned once. Columns:
    k_docs, tokens_total, vocab, ttr."""
    if not checkpoints:
        raise ValueError("need at least one checkpoint")
    toks = docs.select(
        F.col(id_col).alias("did"),
        F.explode(tokens_col(F.col(text_col))).alias("tok"),
    ).localCheckpoint(eager=False)
    first = toks.groupBy("tok").agg(F.min("did").alias("first_doc"))
    per_doc = toks.groupBy("did").agg(F.count("*").alias("n_tok"))
    spark = docs.sparkSession
    kdf = spark.createDataFrame(
        [(int(k),) for k in checkpoints], "k_docs long"
    )
    vol = (
        kdf.join(per_doc)
        .groupBy("k_docs")
        .agg(
            F.sum(
                F.when(F.col("did") < F.col("k_docs"), F.col("n_tok"))
            ).alias("tokens_total")
        )
    )
    voc = (
        kdf.join(first)
        .groupBy("k_docs")
        .agg(
            F.sum(
                (F.col("first_doc") < F.col("k_docs")).cast("long")
            ).alias("vocab")
        )
    )
    return (
        vol.join(voc, "k_docs")
        .select(
            "k_docs",
            F.coalesce(F.col("tokens_total"), F.lit(0)).alias("tokens_total"),
            "vocab",
            F.when(
                F.col("tokens_total") > 0,
                F.col("vocab").cast("double")
                / F.col("tokens_total").cast("double"),
            ).alias("ttr"),
        )
        .orderBy("k_docs")
    )


def lang_confusion(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    label_col: str = "lang",
) -> DataFrame:
    """Confusion matrix of the marker-word language-ID heuristic against
    the declared `lang` label: one row per (declared, predicted) cell
    with its count and the within-declared share — the evaluation
    readout that says WHERE the classifier is wrong, not just how
    often. Composes lang_id unchanged.

    Integer counts; the share is ONE division. Scale shape: lang_id's
    pure map pass, one map-side-combined groupBy over the tiny
    (langs x langs) domain. Columns: declared, predicted, n, share."""
    preds = lang_id(docs, text_col=text_col, id_col=id_col)
    labeled = docs.select(F.col(id_col), F.col(label_col).alias("declared"))
    cells = (
        labeled.join(preds, id_col)
        .groupBy("declared", F.col("pred_lang").alias("predicted"))
        .agg(F.count("*").alias("n"))
    )
    tot = cells.groupBy("declared").agg(F.sum("n").alias("t"))
    return (
        cells.join(F.broadcast(tot), "declared")
        .select(
            "declared",
            "predicted",
            "n",
            (F.col("n").cast("double") / F.col("t").cast("double")).alias(
                "share"
            ),
        )
        .orderBy("declared", "predicted")
    )


def source_profile(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source corpus profile: document count, mean and EXACT median
    character length, and mean token count — the slice-by-provenance DQ
    card that catches a broken source before it poisons the mix.

    Exactness: lengths and token counts are integers; medians are
    type-1 order statistics at rank ceil(n/2) read off cumulative
    histogram counts; means are single divisions. Scale shape: one map
    pass for lengths, one map-side-combined groupBy to the
    (source, chars) histogram, one window over that bounded-domain
    table. Columns: source, n_docs,
    mean_chars, median_chars, mean_tokens."""
    from pyspark.sql import Window

    src = docs.select(
        F.col(source_col).alias("source"),
        F.length(F.col(text_col)).cast("long").alias("chars"),
        F.size(tokens_col(F.col(text_col))).cast("long").alias("toks"),
    )
    # Char lengths are bounded-domain integers, so the exact median comes
    # off a VALUE-DOMAIN HISTOGRAM (the delay_by_priority shape): one
    # map-side-combined groupBy collapses the corpus to (source, chars)
    # cells — token sums ride the same cells — and the type-1 order
    # statistic at rank (n+1) div 2 is the first length whose cumulative
    # count reaches the rank: bit-identical to ranking every document,
    # without sorting every doc row on the low-cardinality source key or
    # checkpointing the tokenize pass for a join-back branch.
    hist = src.groupBy("source", "chars").agg(
        F.count("*").alias("cnt"), F.sum("toks").alias("stoks")
    )
    wc = Window.partitionBy("source").orderBy("chars")
    wa = wc.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return (
        hist.select(
            "source",
            "chars",
            "cnt",
            F.sum("cnt").over(wc).alias("cum"),
            F.sum("cnt").over(wa).alias("n_docs"),
            F.sum(F.col("chars") * F.col("cnt")).over(wa).alias("s_chars"),
            F.sum("stoks").over(wa).alias("s_toks"),
        )
        .where(
            (F.col("cum") >= F.expr("(n_docs + 1) div 2"))
            & (F.col("cum") - F.col("cnt") < F.expr("(n_docs + 1) div 2"))
        )
        .select(
            "source",
            "n_docs",
            (d("s_chars") / d("n_docs")).alias("mean_chars"),
            F.col("chars").alias("median_chars"),
            (d("s_toks") / d("n_docs")).alias("mean_tokens"),
        )
        .orderBy("source")
    )


def lexical_diversity(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document lexical diversity: token count, distinct-type count,
    type-token ratio, and the hapax share (types used exactly once in
    the doc) — the repetitiveness lens at document grain
    (repetition_stats' sibling; low TTR + low hapax = looped text).

    All-JVM array expressions, one map pass, no joins. Every ratio is
    ONE division of exact integers. Columns: doc_id, n_tokens, n_types,
    ttr, hapax_share."""
    # Stage the sorted array as a BOUND COLUMN before the lambda: there
    # is no common-subexpression elimination inside higher-order-function
    # lambdas, so referencing array_sort(...) inline re-sorts PER ELEMENT
    # (measured 39 s -> 1 s at sf0.1 for this exact function).
    staged = docs.select(
        F.col(id_col),
        F.array_sort(tokens_col(F.col(text_col))).alias("srt"),
    )
    srt = F.col("srt")
    n_tok = F.size(srt).cast("long")
    n_typ = F.size(F.array_distinct(srt)).cast("long")
    # hapax count: types whose in-doc count is exactly 1 — over the
    # sorted token array, an element differing from both neighbors.
    # F.get is 0-based and null-safe out of bounds (unlike element_at,
    # which raises on index 0).
    is_hapax = F.transform(
        F.sequence(F.lit(0), F.size(srt) - 1),
        lambda i: (
            (F.get(srt, i) != F.coalesce(F.get(srt, i - 1), F.lit("")))
            & (F.get(srt, i) != F.coalesce(F.get(srt, i + 1), F.lit("")))
        ).cast("int"),
    )
    n_hapax = F.when(
        n_tok > 0,
        F.aggregate(is_hapax, F.lit(0), lambda a, x: a + x).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    d = lambda c: c.cast("double")  # noqa: E731
    return staged.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        n_typ.alias("n_types"),
        F.when(n_tok > 0, d(n_typ) / d(n_tok)).alias("ttr"),
        F.when(n_typ > 0, d(n_hapax) / d(n_typ)).alias("hapax_share"),
    ).orderBy(id_col)


def bigram_perplexity(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document perplexity under an add-one-smoothed corpus bigram LM
    — CCNet/Gopher-style perplexity filtering, self-trained (no external
    model): P(w2|w1) = (c(w1,w2)+1) / (c1(w1)+V), where c counts bigram
    occurrences corpus-wide, c1 counts first-position occurrences and V
    is the corpus vocabulary. Output per doc: n_bigrams, log-likelihood
    ll (natural log) and ppl = exp(-ll/n) — boilerplate and in-domain
    text score low, gibberish and OOD text score high.

    Exactness: each term is a libm-ln pandas UDF of an exact integer
    ratio (JVM Math.log is 1-ulp off libm — the hurst/zipf note); the
    per-doc sum folds in ASCENDING position order via F.aggregate over a
    sorted array; ppl is libm exp of a single division. Scale shape: the
    bigram LM is one groupBy over the exploded bigram stream (map-side
    combined); scoring joins each doc's bigrams against the LM tables on
    the bigram key; V rides a one-row broadcast; the fold touches each
    doc's own bigrams only. Docs with fewer than 2 tokens have no
    bigrams and are excluded (both engines)."""
    import math as _math

    from btrdb_server_spark.utils import libm_exp, libm_ln

    _ln = libm_ln(strict=True)  # libm shim; raises on nonpositives — match DuckDB bit-exactly
    _exp = libm_exp()

    t = ensure_parallelism(docs).select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("toks")
    )
    bi = (
        t.where(F.size("toks") >= 2)
        .select(
            id_col,
            F.posexplode(
                F.expr(
                    "transform(sequence(0, size(toks) - 2),"
                    " i -> struct(toks[i] AS w1, toks[i + 1] AS w2))"
                )
            ).alias("pos", "bg"),
        )
        .select(id_col, "pos", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    b = bi.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    # c1(w1) = sum over w2 of c12(w1, w2) — derived from the bigram table
    # instead of a second groupBy over the exploded stream, which replayed
    # the whole tokenize+explode corpus pass (different grouping keys mean
    # different exchanges, so runtime exchange reuse cannot dedup them).
    # Exact same integer counts, one corpus pass fewer.
    u = b.groupBy("w1").agg(F.sum("c12").alias("c1"))
    v = t.select(F.explode("toks").alias("tok")).agg(
        F.countDistinct("tok").alias("vsz")
    )
    terms = (
        bi.join(b, ["w1", "w2"])
        .join(u, "w1")
        .crossJoin(F.broadcast(v))
        .select(
            id_col,
            "pos",
            _ln(
                (F.col("c12") + F.lit(1)).cast("double")
                / (F.col("c1") + F.col("vsz")).cast("double")
            ).alias("term"),
        )
    )
    per = terms.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("pos", "term"))),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x["term"],
        ).alias("ll"),
    )
    return per.select(
        id_col,
        "n_bigrams",
        "ll",
        _exp(-(F.col("ll") / F.col("n_bigrams").cast("double"))).alias("ppl"),
    ).orderBy(id_col)


def winnowing_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """MOSS winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03) fingerprint
    profile: hash every word k-gram, slide a window of w consecutive
    hashes, select the minimum of each window — the distinct selected
    values are the document's fingerprint set. Guarantee: any two docs
    sharing a token run of length >= w + k - 1 share a fingerprint, with
    expected density 2/(w+1) — position-robust local fingerprints where
    rolling_fingerprint above is a single order-sensitive whole-doc hash.

    Pure column expressions, single map-side pass, no shuffle until the
    final presentation sort: the k-gram hash array, the window-min
    transform, and the distinct fold all run inside one codegen stage —
    the per-doc cost is O(tokens·w) independent of corpus size."""
    docs = ensure_parallelism(docs)
    grams = ngrams_col(F.col(text_col), k)
    # One hash column staged on its own projection (CollapseProject will
    # not inline it into the multiple consumers below — see the 10x note
    # in bench lore about expensive exprs inside HOF lambdas).
    hashes = F.transform(
        grams, lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long")
    )
    staged = docs.select(F.col(id_col), hashes.alias("hs"))
    m = F.size(F.col("hs"))
    wins = F.when(
        m >= w,
        F.transform(
            F.sequence(F.lit(1), m - (w - 1)),
            lambda i: F.array_min(F.slice(F.col("hs"), i, w)),
        ),
    ).otherwise(F.array().cast("array<long>"))
    staged = staged.select(
        F.col(id_col), m.cast("long").alias("n_grams"), wins.alias("wins")
    )
    fps = F.array_distinct(F.col("wins"))
    n_wins = F.size(F.col("wins")).cast("long")
    return staged.select(
        F.col(id_col),
        F.col("n_grams"),
        n_wins.alias("n_windows"),
        F.size(fps).cast("long").alias("n_fps"),
        F.when(
            n_wins > 0, F.size(fps).cast("double") / n_wins.cast("double")
        ).alias("fp_density"),
        F.array_min(fps).alias("fp_min"),
        F.array_max(fps).alias("fp_max"),
    ).orderBy(id_col)
