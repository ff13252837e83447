"""Deduplication operators for training-data pipelines: exact, MinHash+LSH,
SimHash, and n-gram Jaccard.

Scale design (the point of each variant):
- exact_dedup        — one hash groupBy; shuffles one row per document, the
                       cheapest possible full-corpus dedup at 100 TB.
- minhash + LSH      — signature is a per-doc map-side computation (no
                       shuffle); the band join shuffles only (band_key, id)
                       pairs, turning O(n^2) similarity search into
                       O(candidate pairs). This is the scale path.
- simhash            — one 16-60-bit fingerprint per doc via explode +
                       groupBy; near-dup = fingerprint equality or a small
                       Hamming ball (simhash_pairs: pigeonhole-banded
                       candidates, recall exactly 1 for hamming < bands).
                       Cheapest near-dup at scale.
- ngram_jaccard      — exact Jaccard via shingle inverted-index self-join;
                       quadratic in the worst case, correct baseline used to
                       validate the LSH recall. Not the 100 TB path.

Everything is built-in expressions (md5, array lambdas) — no Python UDFs —
and every hash is engine-agnostic (md5 over explicit strings) so DuckDB
oracles reproduce results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from btrdb_server_spark.functions.text import tokens_col
from btrdb_server_spark.utils import ensure_parallelism

DEFAULT_NUM_HASHES = 16
DEFAULT_BANDS = 4


def exact_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Map every doc to the smallest doc id sharing its normalized-content
    md5 (keeper). Rows with keeper != id are exact duplicates."""
    from pyspark.sql import Window

    normalized = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    h = docs.select(F.col(id_col), F.md5(normalized).alias("h"))
    # min-over-hash-partition: one shuffle on h, no join back (a
    # groupBy+join formulation shuffles the table twice). No orderBy in the
    # frame -> unbounded min, computed in a single pass per partition.
    keeper = F.min(id_col).over(Window.partitionBy("h"))
    return (
        h.select(
            F.col(id_col),
            keeper.alias("keeper"),
            (F.col(id_col) != keeper).alias("is_dup"),
        )
        .orderBy(id_col)
    )


def shingles_col(text, k: int = 3):
    """Word k-gram shingles: slice windows over the token array (empty when
    fewer than k tokens)."""
    toks = tokens_col(text)
    n = F.size(toks)
    return F.when(n >= k, F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )).otherwise(F.array().cast("array<string>"))


# Carter-Wegman composition: two base digests per shingle generate the whole
# hash family h_j = (a + j*b) mod P. Prime just below 2^32; a,b < 2^32 and
# j <= 15, so a + j*b < 2^36 — no int64 overflow even under ANSI mode.
MINHASH_PRIME = 4_294_967_291


def _hex8_to_long(col):
    """First-8-hex-chars -> BIGINT. Spark-side uses conv() (one JVM call);
    the DuckDB oracle mirrors it with an instr Horner chain (_hexn_sql) —
    both decode the same 8 hex chars to the same integer."""
    return F.conv(F.substring(col, 1, 8), 16, 10).cast("long")


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    k: int = 3,
) -> DataFrame:
    """Per-doc MinHash signature with a 2-universal hash family: per shingle
    only TWO md5 digests (a, b), then h_j = (a + j*b) mod P for all j —
    8x less hashing than one digest per hash function at identical
    collision behavior. Docs with < k tokens have no shingles and are
    excluded."""
    # Explode shingles ONCE, hash per row, then groupBy-min: the shingle
    # pipeline runs a single time, the two digests are shared by all
    # num_hashes functions, and the mins combine map-side so the shuffle
    # carries one row per doc.
    sh = ensure_parallelism(docs).select(
        F.col(id_col), F.explode(shingles_col(F.col(text_col), k)).alias("s")
    )
    ab = sh.select(
        id_col,
        _hex8_to_long(F.md5(F.concat(F.lit("a|"), F.col("s")))).alias("a"),
        _hex8_to_long(F.md5(F.concat(F.lit("b|"), F.col("s")))).alias("b"),
    )
    return ab.groupBy(id_col).agg(
        *[
            F.min((F.col("a") + F.lit(j) * F.col("b")) % MINHASH_PRIME).alias(f"mh{j}")
            for j in range(num_hashes)
        ]
    )


def with_rowwise_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_hashes: int = DEFAULT_NUM_HASHES,
    k: int = 3,
) -> DataFrame:
    """minhash_signatures' values as PER-ROW array expressions (no
    aggregation): same md5 digests, same int64 arithmetic, bit-identical
    mh{j} columns. Needed where a plan cannot host an aggregation — e.g.
    a streaming pipeline feeding a stateful operator. Docs with an empty
    shingle set are excluded, matching the batch path.

    Two projection stages on purpose: the (a, b) digest arrays materialize
    as real columns referenced by all 16 min-hash expressions —
    CollapseProject keeps expensive many-referenced aliases un-inlined, so
    each shingle is digested twice total, not 32 times (measured 10x at
    sf0.1; higher-order-function lambdas get no codegen subexpression
    elimination, so inlining is catastrophic there)."""
    sh = shingles_col(F.col(text_col), k)
    staged = docs.where(F.size(sh) > 0).select(
        F.col(id_col),
        F.transform(sh, lambda s: _hex8_to_long(F.md5(F.concat(F.lit("a|"), s)))).alias(
            "_mha"
        ),
        F.transform(sh, lambda s: _hex8_to_long(F.md5(F.concat(F.lit("b|"), s)))).alias(
            "_mhb"
        ),
    )
    return staged.select(
        id_col,
        *[
            F.array_min(
                F.zip_with("_mha", "_mhb", lambda x, y: (x + F.lit(j) * y) % MINHASH_PRIME)
            ).alias(f"mh{j}")
            for j in range(num_hashes)
        ],
    )


def _band_structs(num_hashes: int, bands: int):
    """The LSH band-key expression shared by every banding consumer
    (lsh_candidate_pairs, the persisted index's _band_rows): an array of
    (band, band_key) structs, band_key = '|'-joined signature slice of
    r = num_hashes // bands components. ONE definition so a formatting
    change can never silently make persisted band keys incompatible with
    the one-shot pipeline they are cross-checked against."""
    r = num_hashes // bands
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws("|", *[F.col(f"mh{b * r + i}") for i in range(r)]).alias(
                    "band_key"
                ),
            )
            for b in range(bands)
        ]
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """LSH banding: split the signature into `bands` bands of r rows; docs
    sharing any full band become a candidate pair (a < b). Collision groups
    are gathered per (band_idx, band_key) and pairs generated map-side —
    only colliding docs meet, never the full cross product."""
    # One explode instead of a `bands`-way union (a union re-runs the whole
    # signature computation once per band). Pair generation is a per-group
    # collect_list + double explode instead of the band-table self-join:
    # ONE signature pipeline feeds one groupBy exchange and the pairs are
    # generated inside the task (the self-join ran the signature pipeline
    # once PER SIDE — at bench scale AQE broadcasts one side so runtime
    # exchange reuse never fires, and the localCheckpoint that used to
    # paper over that cost a planner pass plus, under AQE, eager execution
    # of every shuffle stage at plan-construction time). Group fan-out is
    # bounded by band-collision size, the same bound the join had.
    band_structs = _band_structs(num_hashes, bands)
    groups = (
        signatures.select(F.col(id_col), F.explode(band_structs).alias("bk"))
        .groupBy("bk")
        .agg(F.collect_list(F.col(id_col)).alias("ids"))
    )
    return (
        groups.select(F.explode("ids").alias("a"), "ids")
        .select("a", F.explode("ids").alias("b"))
        .where(F.col("a") < F.col("b"))
        .distinct()
        .orderBy("a", "b")
    )


def minhash_jaccard_est(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """Signature-based Jaccard ESTIMATION for every LSH candidate pair:
    est = (matching signature components) / num_hashes — the MinHash
    estimator (E[est] = true Jaccard). This is the cheap middle road
    between raw banding (binary candidate/not) and exact shingle-set
    verification (lsh_verified_pairs): ranking/thresholding candidates
    WITHOUT touching the documents again — at corpus scale the verify
    join re-reads and re-shingles both texts per pair, while this joins
    two 16-int rows. matches is an exact integer and num_hashes a power
    of two, so est is a dyadic rational — bit-exact in any engine.

    Columns: a, b, matches, est_jaccard; ordered by (a, b)."""
    sigs = minhash_signatures(docs, text_col, id_col, num_hashes).localCheckpoint(
        eager=True
    )
    pairs = lsh_candidate_pairs(sigs, id_col, num_hashes, bands)
    l = sigs.select(
        F.col(id_col).alias("a"), *[F.col(f"mh{j}").alias(f"la{j}") for j in range(num_hashes)]
    )
    r = sigs.select(
        F.col(id_col).alias("b"), *[F.col(f"mh{j}").alias(f"rb{j}") for j in range(num_hashes)]
    )
    matches = sum(
        F.when(F.col(f"la{j}") == F.col(f"rb{j}"), 1).otherwise(0)
        for j in range(num_hashes)
    )
    return (
        pairs.join(l, "a")
        .join(r, "b")
        .select(
            "a",
            "b",
            matches.cast("long").alias("matches"),
            (matches.cast("double") / F.lit(float(num_hashes))).alias("est_jaccard"),
        )
        .orderBy("a", "b")
    )


def minhash_dedup_pairs(docs: DataFrame, **kw) -> DataFrame:
    """Convenience: shingle -> minhash -> band -> candidate pairs."""
    sigs = minhash_signatures(docs, **kw)
    return lsh_candidate_pairs(sigs)


def lsh_verified_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    bands: int = DEFAULT_BANDS,
    threshold: float = 0.5,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """The complete MinHash near-dup pipeline: LSH banding proposes
    candidate pairs, exact shingle Jaccard verifies them. Unlike the exact
    baseline (ngram_jaccard_pairs), the verify stage joins the inverted
    index through the CANDIDATE pair list, so the exact work scales with
    the number of candidates — never with corpus² — which is what makes
    the pipeline hold on a 100 TB near-dup-sparse corpus."""
    # No checkpoints: `sh`'s three consumers sit directly above its distinct
    # exchange and `cand` is consumed once, so runtime exchange reuse dedups
    # every replay — while each lazy localCheckpoint would cost a planner
    # pass + (under AQE) eager execution of its shuffle stages at
    # construction, serializing work one query execution overlaps.
    cand = lsh_candidate_pairs(
        minhash_signatures(docs, text_col, id_col, num_hashes, k),
        id_col,
        num_hashes,
        bands,
    )
    sh = (
        ensure_parallelism(docs)
        .select(F.col(id_col), F.explode(shingles_col(F.col(text_col), k)).alias("s"))
        .select(
            id_col, F.conv(F.substring(F.md5("s"), 1, 15), 16, 10).cast("long").alias("s")
        )
        .distinct()
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    inter = (
        cand.join(sh.select(F.col(id_col).alias("a"), "s"), "a")
        .join(sh.select(F.col(id_col).alias("b"), "s"), ["b", "s"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("szb"))
    return (
        inter.join(F.broadcast(sa), "a")
        .join(F.broadcast(sb), "b")
        .select(
            "a",
            "b",
            # Unrounded integer ratio (rounding ties diverge across engines).
            (
                F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        .orderBy("a", "b")
    )


def _pair_audit(truth: DataFrame, cand: DataFrame) -> DataFrame:
    """One-pass recall/precision audit of a candidate pair set against a
    truth pair set: tag each side, union, and fold all three counts out of
    ONE aggregation — the previous three-branch shape (count(truth),
    count(cand), count(truth left_semi cand)) executed the truth and
    candidate pipelines TWICE each, and both are whole-corpus jobs (the
    truth side is the uncapped exact-Jaccard self-join). Counts are
    identical: truth is distinct on (a, b) by construction (groupBy
    output), so n_hits = pairs carrying both tags = the semi-join count;
    n_truth / n_candidates are plain row counts either way (coalesce
    keeps them 0, not NULL, on empty inputs). One row: n_truth,
    n_candidates, n_hits, recall, precision."""
    u = truth.select("a", "b", F.lit(1).alias("t"), F.lit(0).alias("c")).unionAll(
        cand.select("a", "b", F.lit(0).alias("t"), F.lit(1).alias("c"))
    )
    per = u.groupBy("a", "b").agg(F.sum("t").alias("st"), F.sum("c").alias("sc"))
    return per.agg(
        F.coalesce(F.sum("st"), F.lit(0)).cast("long").alias("n_truth"),
        F.coalesce(F.sum("sc"), F.lit(0)).cast("long").alias("n_candidates"),
        F.coalesce(
            F.sum(((F.col("st") > 0) & (F.col("sc") > 0)).cast("long")), F.lit(0)
        )
        .cast("long")
        .alias("n_hits"),
    ).select(
        "n_truth",
        "n_candidates",
        "n_hits",
        (F.col("n_hits").cast("double") / F.col("n_truth").cast("double")).alias(
            "recall"
        ),
        (
            F.col("n_hits").cast("double") / F.col("n_candidates").cast("double")
        ).alias("precision"),
    )


def lsh_recall_eval(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Recall/precision audit of MinHash LSH banding against exact shingle
    Jaccard ground truth — the dedup-family twin of ann_recall_eval.

    One row: n_truth (exact pairs with jaccard >= threshold), n_candidates
    (banded LSH pairs), n_hits (their intersection), recall and precision
    as plain IEEE divisions. This is the gauge that justifies shipping the
    banded path at 100 TB: the exact baseline is quadratic and only ever
    runs at audit scale; the audit itself touches candidate pairs, never
    the corpus cross product.

    Ground truth is deliberately UNCAPPED exact jaccard (df_cap disabled):
    a recall audit must measure the banded index against the true pair
    set, including pairs whose overlap rides boilerplate shingles — the
    df-capped production operator would under-count exactly the pairs LSH
    is most likely to miss, flattering recall. The skew-unbounded join is
    acceptable here because this is an audit-scale op by contract (and
    the DuckDB oracle computes the same uncapped truth).
    """
    truth = ngram_jaccard_pairs(
        docs, text_col, id_col, k, threshold, df_cap=1 << 62
    ).select("a", "b")
    cand = lsh_candidate_pairs(
        minhash_signatures(docs, text_col, id_col, num_hashes, k),
        id_col,
        num_hashes,
        bands,
    ).select("a", "b")
    return _pair_audit(truth, cand)


def dedup_clusters(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    bands: int = DEFAULT_BANDS,
    threshold: float = 0.5,
    num_hashes: int = DEFAULT_NUM_HASHES,
    max_iter: int = 30,
) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the verified
    near-dup pair graph, labeling every document with the smallest doc id
    of its component (the keeper). The final stage of the dedup pipeline —
    keep one representative per cluster, drop the rest.

    Implementation is min-label propagation (the GraphX connected-components
    algorithm re-expressed on DataFrames): labels start as own ids and each
    round take the min over neighbors, materialized per round, until a
    fixpoint. Rounds are bounded by the component diameter — near-dup
    clusters are shallow, so a handful of joins over the PAIR graph (tiny
    next to the corpus; only documents with at least one near-dup
    participate). Iterative by nature, so this is a driver loop — but each
    iteration is one distributed join over edge-scale data, and the
    convergence probe reads one row."""
    pairs = lsh_verified_pairs(
        docs, text_col, id_col, k, bands, threshold, num_hashes
    ).select("a", "b")
    edges = (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .localCheckpoint(eager=True)
    )
    lab = (
        edges.select(F.col("src").alias("v"))
        .distinct()
        .select("v", F.col("v").alias("lbl"))
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Observation

    prev_sum = None
    for _ in range(max_iter):
        # Invariant the inner join below relies on: `lab` holds EVERY edge
        # endpoint (it is built from the symmetrized edges' src column,
        # which covers both endpoints), so each msgs.v (an edges.dst) and
        # each aggregated vertex has a matching lab row — the inner join
        # never drops a vertex from the frontier.
        msgs = edges.join(lab, edges.src == lab.v).select(
            F.col("dst").alias("v"), "lbl"
        )
        # Convergence check rides the SAME job as the round's
        # materialization: the checkpoint is lazy and the explicit count()
        # below is the one action that materializes it — the Observation
        # fires on that action by API contract. Fixpoint is detected from
        # sum(lbl) alone: each vertex's new label is min(own, neighbor
        # labels) — never larger than its old one — so the label-vector
        # sum is monotone non-increasing and stalls exactly at the
        # fixpoint. That drops the join back onto the previous round's
        # labels (node-scale exchange + join per round) that a per-vertex
        # changed-count needed; iteration count and labels are identical.
        obs = Observation()
        new = (
            lab.unionByName(msgs)
            .groupBy("v")
            .agg(F.min("lbl").alias("lbl"))
            # decimal(38,0): a corpus-scale Σ of int64 ids can overflow
            # int64 (ANSI would fail the job); 38 digits cannot.
            .observe(
                obs,
                F.sum(F.col("lbl").cast("decimal(38,0)")).alias("lbl_sum"),
            )
            .localCheckpoint(eager=False)
        )
        new.count()  # materializes the checkpoint; fires the observation
        lab = new
        cur_sum = obs.get["lbl_sum"]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return (
        docs.select(id_col)
        .join(lab, F.col(id_col) == F.col("v"), "left")
        .select(
            id_col,
            F.coalesce(F.col("lbl"), F.col(id_col)).alias("cluster"),
            (F.coalesce(F.col("lbl"), F.col(id_col)) != F.col(id_col)).alias("is_dup"),
        )
        .orderBy(id_col)
    )


def dedup_select(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **cluster_kw,
) -> DataFrame:
    """Survivor selection — the last stage of the dedup pipeline: one
    representative per near-duplicate cluster, chosen by QUALITY (longest
    text, ties -> smallest id) rather than dedup_clusters' arbitrary min-id
    keeper; unique documents survive as their own representative. Output:
    (doc_id, cluster, score, kept) for every document — filter kept=true
    to materialize the deduplicated corpus.

    The score is an integer (character length), so selection is
    engine-exact — no float threshold to disagree across engines; swap in
    any integer quality signal (quality_filter's rule count, token count).

    Scale shape: clustering touches only the near-dup pair graph
    (dedup_clusters); scoring is a projection of the corpus (ids + one
    length — document text never shuffles); the per-cluster winner is a
    map-side-combined struct-max; the join back is on the integer cluster
    key."""
    clusters = dedup_clusters(docs, text_col, id_col, **cluster_kw).select(
        id_col, "cluster"
    )
    scored = clusters.join(
        docs.select(id_col, F.length(F.col(text_col)).cast("long").alias("score")),
        id_col,
    )
    winners = (
        scored.groupBy("cluster")
        .agg(
            F.max(
                F.struct(F.col("score"), (-F.col(id_col)).alias("nid"))
            ).alias("m")
        )
        .select("cluster", (-F.col("m.nid")).alias("keep_id"))
    )
    return (
        scored.join(winners, "cluster")
        .select(
            id_col,
            "cluster",
            "score",
            (F.col(id_col) == F.col("keep_id")).alias("kept"),
        )
        .orderBy(id_col)
    )


def _hex4_to_int(col):
    """First-4-hex-chars -> int in [0, 65536). Spark-side conv() is one JVM
    call; the DuckDB oracle mirrors it with instr arithmetic."""
    return F.conv(F.substring(col, 1, 4), 16, 10).cast("long")


def simhash(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16
) -> DataFrame:
    """SimHash fingerprint: each token votes ±1 on every bit of its
    md5-derived `bits`-bit hash; fingerprint bit b is 1 iff the sum of
    votes is positive. Term frequency is preserved (tokens not
    deduplicated). bits must be a multiple of 4 and <= 60 (the hash is
    the first bits/4 hex chars of md5 — 15 chars = 60 bits keeps conv()
    inside a signed long on both engines)."""
    assert bits % 4 == 0 and bits <= 60, bits
    toks = ensure_parallelism(docs).select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("tok")
    )
    toks = toks.select(
        id_col,
        F.conv(F.substring(F.md5("tok"), 1, bits // 4), 16, 10)
        .cast("long")
        .alias("th"),
    )
    bitted = toks.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
        "th",
    ).select(
        id_col,
        "bit",
        F.when(F.expr("(th >> bit) & 1") == 1, 1).otherwise(-1).alias("vote"),
    )
    return (
        bitted.groupBy(id_col, "bit")
        .agg(F.sum("vote").alias("s"))
        .groupBy(id_col)
        .agg(
            # The shift MUST be on a long: int32 `1 << bit` wraps at bit 31
            # (shift count is taken mod 32), silently corrupting any
            # fingerprint wider than 31 bits.
            F.sum(
                F.when(F.col("s") > 0, F.expr("cast(1 as bigint) << bit")).otherwise(0)
            ).alias(
                "simhash"
            )
        )
        .orderBy(id_col)
    )


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 60,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Banded SimHash near-duplicate pairs with exact Hamming verify.

    Candidate generation is the pigeonhole LSH: split the fingerprint
    into `bands` contiguous slices and self-join on (band, slice value).
    Any pair with Hamming distance <= bands-1 agrees on at least one
    slice, so for max_hamming < bands recall is exactly 1 — no
    probabilistic miss, unlike MinHash banding. At 60/4 = 15-bit slices
    the buckets are near-singleton on non-duplicate text, so the verify
    (one xor + bit_count per candidate) is ~linear in true pairs.

    Scale shape: the fingerprint is one groupBy over (doc, bit) votes —
    map-side combinable, JVM-only; the band join shuffles 4 rows of
    (band, 15-bit value, id, fingerprint) per document; nothing touches
    document text after tokenization. Complements minhash_lsh_pairs
    (Jaccard regime) with the Charikar cosine/Hamming regime
    (reference has no equivalent; STS-style near-dup per SURVEY 2.12).
    """
    assert max_hamming < bands, "pigeonhole recall needs max_hamming < bands"
    assert bits % bands == 0, (bits, bands)
    fp = simhash(docs, text_col, id_col, bits)
    bw = bits // bands
    mask = (1 << bw) - 1
    bt = fp.select(
        F.col(id_col),
        F.col("simhash").alias("h"),
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
    ).select(
        id_col,
        "band",
        F.expr(f"(h >> (band * {bw})) & {mask}").alias("bv"),
        "h",
    )
    cand = (
        bt.alias("l")
        .join(
            bt.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bv") == F.col("r.bv"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("a"),
            F.col(f"r.{id_col}").alias("b"),
            F.col("l.h").alias("ha"),
            F.col("r.h").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.select(
            "a",
            "b",
            F.expr("cast(bit_count(ha ^ hb) as int)").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .orderBy("a", "b")
    )


def _shingle_inter_counts(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    df_cap: int,
    directed: bool,
) -> tuple[DataFrame, DataFrame]:
    """Shared core of ngram_jaccard_pairs / containment_pairs: the hashed
    k-shingle inverted index, per-document df-capped set sizes, and the
    per-pair intersection counts.

    Shingles are hashed to 60-bit ints (first 15 hex chars of md5) before
    the distinct: every shuffle then moves 8-byte keys instead of ~30-byte
    strings. Collision odds at 2^60 are negligible and the DuckDB oracle
    applies the identical hash.

    Intersections are generated MAP-SIDE: shingles in 2..df_cap documents
    gather their (distinct) document ids with one collect_list — the
    buffer is bounded by df_cap, the same bound the old self-join put on
    its per-key fan-out — and pairs explode inside the task, so a hot
    shingle costs an in-memory array of m ids instead of m² rows through
    the join machinery. The pair multiset is exactly the self-join's
    (every ordered pair of distinct ids sharing s, filtered to a<b or
    a!=b), so the exact integer counts are unchanged. Memory bound
    (ADVICE r13): the collect_list buffer holds up to df_cap int64 doc
    ids PER SHINGLE in a non-spillable aggregation buffer — ~8 KB at the
    default df_cap=1000, but a caller passing a very large df_cap trades
    the old join's spillable shuffle skew for executor-OOM risk; keep
    df_cap at the thousands scale (it is a boilerplate-shingle cutoff,
    not a correctness knob). The old eager-
    under-AQE localCheckpoint of the index is gone too: the index subtree
    feeds its consumers through canonically identical exchanges that
    runtime exchange reuse dedups for free (the measured-faster pattern
    from the recall audits), instead of paying a planner pass + stage
    execution at plan-construction time."""
    sh = (
        ensure_parallelism(docs)
        .select(F.col(id_col), F.explode(shingles_col(F.col(text_col), k)).alias("s"))
        .select(
            id_col, F.conv(F.substring(F.md5("s"), 1, 15), 16, 10).cast("long").alias("s")
        )
        .distinct()
    )
    dfs = sh.groupBy("s").agg(F.count("*").alias("nd"))
    shk = sh.join(dfs.where(F.col("nd") <= df_cap), "s")
    sizes = shk.groupBy(id_col).agg(F.count("*").alias("sz"))
    # Shingles in exactly one document cannot contribute to any
    # intersection; pruning them first shrinks pair generation to the
    # shared-vocabulary subset — on a near-dup-sparse 100 TB corpus that
    # is the difference between pairing ~n*|doc| rows and only the
    # colliding tail.
    groups = (
        shk.where(F.col("nd") >= 2)
        .groupBy("s")
        .agg(F.collect_list(F.col(id_col)).alias("ids"))
    )
    pairs = groups.select(F.explode("ids").alias("a"), "ids").select(
        "a", F.explode("ids").alias("b")
    )
    cond = (
        (F.col("a") != F.col("b")) if directed else (F.col("a") < F.col("b"))
    )
    inter = pairs.where(cond).groupBy("a", "b").agg(F.count("*").alias("inter"))
    return inter, sizes


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    df_cap: int = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity via a shingle inverted index:
    |A∩B| counted from map-side-generated pairs of documents sharing a
    shingle (_shingle_inter_counts), |A∪B| = |A|+|B|-|A∩B|.
    Returns pairs (a < b) with jaccard >= threshold.

    ``df_cap`` bounds the pair fan-out: a shingle present in m documents
    contributes m² pair rows, so one boilerplate shingle (license header,
    navigation chrome) in 10⁶ documents of a 100 TB corpus would be a
    10¹² row hot key on a single shuffle partition. Shingles with document
    frequency > df_cap are dropped from BOTH the intersection and the
    |A|,|B| sizes, so the result is the EXACT jaccard over the df-capped
    vocabulary — the same contract as scrubbing `boilerplate_ngrams`
    output before comparing. Consequence: pairs whose only overlap is
    ultra-common boilerplate score 0 (by design); genuine near-duplicates
    share plenty of sub-cap shingles and are unaffected. MinHash/LSH
    remains the first-choice scale path; this is the exact verifier."""
    inter, sizes = _shingle_inter_counts(
        docs, text_col, id_col, k, df_cap, directed=False
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("szb"))
    return (
        inter.join(F.broadcast(sa), "a")
        .join(F.broadcast(sb), "b")
        .select(
            "a",
            "b",
            # Unrounded integer ratio (rounding ties diverge across engines).
            (
                F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        .orderBy("a", "b")
    )


DUP_SPAN_WINDOW = 8


def duplicate_spans(
    docs: DataFrame,
    w: int = DUP_SPAN_WINDOW,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document duplicate span detection at token-window granularity
    (the ExactSubstr pass of Lee et al. 2021, "Deduplicating Training Data
    Makes Language Models Better", on a w-token grid): every w-token window
    that occurs verbatim in >= 2 distinct documents is reported as
    (doc_id, tok_start, n_docs, n_occurrences) — the spans a pipeline cuts
    or down-weights instead of dropping whole documents.

    Scale shape: windows hash to 60-bit ints (first 15 md5 hex chars, the
    repo's standard engine-mirrorable key), so the duplicate-detection
    groupBy ships 8-byte keys with map-side combine; the join back to spans
    is on the same key, and only windows whose hash repeats across documents
    survive to the output. Nothing is pairwise: a span duplicated across D
    documents costs D rows, not D^2. A suffix-array pass finds arbitrary-
    offset duplicates; the w-token grid is the relational approximation
    (byte-exact duplicates longer than 2w-1 tokens always cover a grid
    window, so long duplicated runs cannot escape)."""
    docs = ensure_parallelism(docs)
    toks = tokens_col(F.col(text_col))
    n = F.size(toks)
    wins = docs.select(
        F.col(id_col),
        F.explode(
            F.when(
                n >= w,
                F.transform(
                    F.sequence(F.lit(1), n - (w - 1)),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.concat_ws(" ", F.slice(toks, i, w)).alias("s"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<pos:int,s:string>>"))
        ).alias("win"),
    ).select(
        id_col,
        F.col("win.pos").cast("long").alias("tok_start"),
        F.conv(F.substring(F.md5(F.col("win.s")), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    dup = (
        wins.groupBy("h")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .where(F.col("n_docs") >= 2)
    )
    return (
        wins.join(dup, "h")
        .select(id_col, "tok_start", "n_docs", "n_occurrences")
        .orderBy(id_col, "tok_start")
    )


def edit_verified_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,  # keyword-only: k/num_hashes positional order differs across the
    # minhash family (see ADVICE r04 on with_rowwise_signatures)
    k: int = 3,
    bands: int = DEFAULT_BANDS,
    num_hashes: int = DEFAULT_NUM_HASHES,
    threshold: float = 0.5,
) -> DataFrame:
    """LSH candidates verified by exact character-level Levenshtein edit
    distance (the JVM built-in) — the verifier to use where shingle
    Jaccard is too coarse: short documents, small in-place edits,
    transposition-heavy noise. edit_sim = 1 - dist / max(len_a, len_b),
    computed as one double division over exact integers.

    Scale shape: the distance runs ONLY on LSH candidate pairs (never
    corpus²), entirely JVM-side. Levenshtein itself is O(len_a * len_b)
    per pair — on a long-document corpus cap or pre-truncate the text
    column upstream; the operator is meant for the short-text regime.
    Columns: a, b, dist, edit_sim; ordered by (a, b)."""
    cand = lsh_candidate_pairs(
        minhash_signatures(docs, text_col, id_col, num_hashes, k),
        id_col,
        num_hashes,
        bands,
    )
    ta = docs.select(F.col(id_col).alias("a"), F.col(text_col).alias("ta"))
    tb = docs.select(F.col(id_col).alias("b"), F.col(text_col).alias("tb"))
    sim = F.lit(1.0) - F.col("dist").cast("double") / F.col("mlen").cast("double")
    return (
        cand.join(ta, "a")
        .join(tb, "b")
        .select(
            "a",
            "b",
            F.levenshtein("ta", "tb").cast("long").alias("dist"),
            F.greatest(F.length("ta"), F.length("tb")).cast("long").alias("mlen"),
        )
        .select("a", "b", "dist", sim.alias("edit_sim"))
        .where(F.col("edit_sim") >= F.lit(threshold))
        .orderBy("a", "b")
    )


def ngram_novelty(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Per-document n-gram novelty: of a doc's DISTINCT word k-shingles,
    the fraction whose FIRST corpus occurrence (minimum doc id) is this
    doc — the freshness signal a crawl pipeline uses to rank near-the-
    frontier content and to spot template-heavy feeds (novelty ~ 0).
    Docs with < k tokens have no shingles and are excluded (same rule as
    minhash_signatures).

    Scale shape: the same inverted-index skeleton as the LSH verifier —
    one shingle explode (8-byte hashed keys), a distinct, then BOTH
    outputs come from shingle-keyed groupBys (first-occurrence = min doc
    id per shingle; novel count = rows per first_doc) with NO join back
    through the shingle table: the only join is doc-scale (totals x
    novel counts). novelty = n_novel / n_shingles, one double division
    over exact int64 counts. Columns: doc_id, n_shingles, n_novel,
    novelty; ordered by doc_id."""
    sh = (
        ensure_parallelism(docs)
        .select(F.col(id_col), F.explode(shingles_col(F.col(text_col), k)).alias("s0"))
        .select(
            id_col,
            F.conv(F.substring(F.md5("s0"), 1, 15), 16, 10).cast("long").alias("s"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    tot = sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    nov = (
        sh.groupBy("s")
        .agg(F.min(id_col).alias("fd"))
        .groupBy(F.col("fd").alias(id_col))
        .agg(F.count("*").alias("nn"))
    )
    novelty = F.col("n_novel").cast("double") / F.col("n_shingles").cast("double")
    return (
        tot.join(nov, id_col, "left")
        .select(
            id_col,
            "n_shingles",
            F.coalesce(F.col("nn"), F.lit(0)).alias("n_novel"),
        )
        .select(id_col, "n_shingles", "n_novel", novelty.alias("novelty"))
        .orderBy(id_col)
    )


def containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    df_cap: int = 1000,
) -> DataFrame:
    """Jaccard CONTAINMENT C(A -> B) = |A n B| / |A| over k-gram shingle
    sets — the asymmetric near-duplication signal symmetric Jaccard
    misses: a short document quoted wholesale inside a long one has tiny
    Jaccard but containment ~1. Emits DIRECTED pairs (src, dst,
    containment, inter, src_sz) with containment >= threshold and
    src != dst — both directions when both clear the bar.

    Same scale shape as ngram_jaccard_pairs: hashed shingle inverted
    index built once, singleton shingles pruned before pair generation,
    sizes joined broadcast; the ratio is one exact integer division
    (never rounded — rounding ties diverge across engines). ``df_cap``
    bounds the pair fan-out exactly as in ngram_jaccard_pairs (see its
    docstring): shingles in more than df_cap documents are dropped from
    both the intersection and |A|, so containment is exact over the
    df-capped vocabulary — a short doc contained in a long one via
    boilerplate-only overlap no longer scores, which is the curation
    semantics you want anyway."""
    inter_ab, sizes = _shingle_inter_counts(
        docs, text_col, id_col, k, df_cap, directed=True
    )
    inter = inter_ab.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "inter"
    )
    ssz = sizes.select(F.col(id_col).alias("src"), F.col("sz").alias("src_sz"))
    return (
        inter.join(F.broadcast(ssz), "src")
        .select(
            "src",
            "dst",
            (F.col("inter") / F.col("src_sz")).alias("containment"),
            "inter",
            "src_sz",
        )
        .where(F.col("containment") >= threshold)
        .orderBy("src", "dst")
    )


def boilerplate_ngrams(
    docs: DataFrame,
    k: int = 2,
    min_share: float = 0.01,
    top: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Boilerplate detector: the k-gram shingles present in the largest
    SHARE of documents — headers, footers, license blurbs and template
    chrome show up as shingles with implausibly high document frequency,
    and this emits the top `top` with df >= min_share of the corpus
    (the removal list a curation pipeline subtracts before dedup).

    The share test is exact by cross-multiplication (df * 100 >=
    n_docs * share_pct — min_share is taken in integer percent), and
    the rank is (df desc, shingle text asc) — deterministic. Scale
    shape: the distinct (doc, shingle) inverted index built once
    (map-side combined), one shingle-domain count, TakeOrdered top-k;
    the raw TEXT of the top shingles is recovered by a broadcast
    semi-join of the tiny winner set back to the index. Columns:
    shingle, df, df_share."""
    share_pct = int(round(min_share * 100))
    sh = (
        ensure_parallelism(docs)
        .select(
            F.col(id_col),
            F.explode(shingles_col(F.col(text_col), k)).alias("s0"),
        )
        .distinct()
    )
    n_docs = docs.select(F.count("*").alias("nd"))
    counts = sh.groupBy("s0").agg(F.count("*").alias("df"))
    return (
        counts.join(F.broadcast(n_docs))
        .where(F.col("df") * 100 >= F.col("nd") * F.lit(share_pct))
        .select(
            F.col("s0").alias("shingle"),
            "df",
            (F.col("df").cast("double") / F.col("nd").cast("double")).alias(
                "df_share"
            ),
        )
        .orderBy(F.col("df").desc(), "shingle")
        .limit(top)
    )


def bbit_minhash_est(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """b-bit MinHash (Li & Konig 2010, b=1) audited against the full
    estimator on the same candidate pairs: keep only the LOWEST BIT of
    each signature component (a 64x storage cut at num_hashes ints ->
    bits), estimate J from the bit-agreement rate via
    J_bbit = 2*agree_share - 1 (random bits agree half the time). Emits
    both estimates per LSH candidate pair so the compression's accuracy
    cost is data, not folklore.

    Exactness: matches and bit agreements are integers; num_hashes is a
    power of two, so both estimates are dyadic rationals (2*a/n - 1 is
    one fixed IEEE expression) — engine-identical. Scale shape:
    signatures built once (checkpointed), banding for candidates, one
    16-int-row join per pair; the b-bit columns never materialize
    corpus-wide (they are bit-ops on the signature join). Columns: a,
    b, matches, est_full, bit_agree, est_bbit."""
    sigs = minhash_signatures(docs, text_col, id_col, num_hashes).localCheckpoint(
        eager=True
    )
    pairs = lsh_candidate_pairs(sigs, id_col, num_hashes, bands)
    l = sigs.select(
        F.col(id_col).alias("a"),
        *[F.col(f"mh{j}").alias(f"la{j}") for j in range(num_hashes)],
    )
    r = sigs.select(
        F.col(id_col).alias("b"),
        *[F.col(f"mh{j}").alias(f"rb{j}") for j in range(num_hashes)],
    )
    matches = sum(
        (F.col(f"la{j}") == F.col(f"rb{j}")).cast("int")
        for j in range(num_hashes)
    )
    agree = sum(
        (F.col(f"la{j}") % 2 == F.col(f"rb{j}") % 2).cast("int")
        for j in range(num_hashes)
    )
    nh = float(num_hashes)
    return (
        pairs.join(l, "a")
        .join(r, "b")
        .select(
            "a",
            "b",
            matches.cast("long").alias("matches"),
            (matches.cast("double") / F.lit(nh)).alias("est_full"),
            agree.cast("long").alias("bit_agree"),
            (
                F.lit(2.0) * (agree.cast("double") / F.lit(nh)) - F.lit(1.0)
            ).alias("est_bbit"),
        )
        .orderBy("a", "b")
    )


def dup_rate_by_source(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Exact-duplicate rate sliced by provenance: per source, how many
    documents are copies of an earlier document (the exact_dedup
    min-id-keeper rule, corpus-wide — a source whose docs lose to
    another source's keepers is re-crawling someone else's content).

    All-integer counts; the rate is ONE division. Scale shape:
    exact_dedup's content-hash groupBy (map-side combined), one
    source-domain rollup. Columns: source, n_docs, n_dups, dup_rate."""
    flags = exact_dedup(docs, text_col=text_col, id_col=id_col).select(
        id_col, F.col("is_dup")
    )
    tagged = docs.select(F.col(id_col), F.col(source_col).alias("source")).join(
        flags, id_col
    )
    return (
        tagged.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("is_dup").cast("long")).alias("n_dups"),
        )
        .select(
            "source",
            "n_docs",
            "n_dups",
            (
                F.col("n_dups").cast("double") / F.col("n_docs").cast("double")
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


def dedup_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", **cluster_kw) -> DataFrame:
    """Dedup impact report: the cluster-size histogram and what the
    keeper rule removes at each size — the card a 100 TB dedup run ships
    with (singletons = untouched docs; the tail of big clusters is where
    boilerplate and mirror sites show up). One row per cluster size:
    (cluster_size, n_clusters, n_docs, n_removed).

    Scale shape: everything beyond dedup_clusters is two metadata-scale
    aggregates (cluster -> size, size -> histogram); document text never
    reappears."""
    cl = dedup_clusters(docs, text_col, id_col, **cluster_kw)
    sizes = cl.groupBy("cluster").agg(F.count("*").alias("cluster_size"))
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
            ((F.col("cluster_size") - 1) * F.col("n_clusters")).alias("n_removed"),
        )
        .orderBy("cluster_size")
    )


def dedup_threshold_curve(
    docs: DataFrame,
    thresholds: tuple = (0.5, 0.6, 0.7, 0.8, 0.9),
    text_col: str = "text",
    id_col: str = "doc_id",
    **kw,
) -> DataFrame:
    """Dedup tuning curve: how many verified near-dup pairs (and how many
    distinct documents they touch) survive at each Jaccard threshold —
    the knob-picking card for a dedup run, from ONE candidate
    set + ONE exact-verify pass (thresholding is a fan-out over the
    already-verified pair table, never re-verification). The pair count
    is what the cluster pass will ingest; the doc count bounds how much
    of the corpus a given threshold can remove. Columns: threshold,
    n_pairs, n_docs; ascending threshold.

    Scale shape: identical to lsh_verified_pairs up to the verify, then
    a |pairs| x |thresholds| fan-out and two metadata-scale aggregates."""
    verified = lsh_verified_pairs(
        docs, text_col, id_col, threshold=min(thresholds), **kw
    ).select("a", "b", "jaccard")
    th = F.array(*[F.lit(float(t)) for t in thresholds])
    fanned = verified.select(
        "a",
        "b",
        F.explode(F.filter(th, lambda t: F.col("jaccard") >= t)).alias("threshold"),
    )
    # Both metrics fold into ONE aggregation at doc grain so the verify
    # pipeline executes once (the pair-count branch used to replay its
    # post-exchange verify work): every pair contributes exactly two doc
    # rows, so n_pairs = count(*) div 2 — an exact even-integer halving.
    stats = (
        fanned.select("threshold", F.explode(F.array("a", "b")).alias("d"))
        .groupBy("threshold")
        .agg(
            F.expr("count(*) div 2").alias("n_pairs"),
            F.countDistinct("d").alias("n_docs"),
        )
    )
    spine = docs.sparkSession.createDataFrame(
        [(float(t),) for t in thresholds], "threshold double"
    )
    return (
        spine.join(stats, "threshold", "left")
        .select(
            "threshold",
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
        )
        .orderBy("threshold")
    )


def _snm_candidates(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    window: int,
    block_chars: int,
    key_chars: int,
) -> DataFrame:
    """Sorted-neighborhood candidate pairs (a < b): per-block prefix hash
    partition, within-block sort on the longer key, each record paired
    with its `window-1` successors via lead() — exactly n·(window-1)
    candidates, no global sort. Shared by the production operator and the
    recall audit so both gauge the same blocking."""
    from pyspark.sql import Window

    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    keyed = ensure_parallelism(docs).select(
        F.col(id_col).alias("a"),
        F.substring(norm, 1, block_chars).alias("blk"),
        F.substring(norm, 1, key_chars).alias("k"),
    )
    w = Window.partitionBy("blk").orderBy("k", "a")
    nbrs = F.array(*[F.lead("a", i).over(w) for i in range(1, window)])
    return (
        keyed.select("a", nbrs.alias("nbrs"))  # window exprs staged first:
        .select("a", F.explode("nbrs").alias("b"))  # no generator over them
        .where(F.col("b").isNotNull())
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
    )


def sorted_neighborhood_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 4,
    block_chars: int = 8,
    key_chars: int = 64,
    threshold: float = 0.3,
) -> DataFrame:
    """Sorted-neighborhood dedup blocking (Hernandez-Stolfo merge/purge):
    sort records by a content-derived key and compare each record only to
    its `window-1` successors — the classic O(n·w) alternative to LSH
    banding when near-duplicates share a PREFIX rather than arbitrary
    shingles (crawl snapshots, versioned records, templated docs).

    Scale shape: records hash-partition by a coarse `block_chars` prefix
    and sort only WITHIN each block (one shuffle, per-block window — no
    global sort, no single-partition row_number). Neighbor pairs come from
    `lead(id, i)` over that window, so candidate volume is exactly
    n·(window-1); the exact token-set Jaccard verification joins the
    token table only against this linear candidate set, never corpus².
    Pairs straddling a block boundary are not compared — the standard
    blocking recall trade, measured by lsh_recall_eval's methodology.

    Returns (a, b, jaccard) with a < b and jaccard >= threshold."""
    cand = _snm_candidates(docs, text_col, id_col, window, block_chars, key_chars)
    tok = docs.select(
        F.col(id_col).alias("d"),
        F.explode(F.array_distinct(tokens_col(F.col(text_col)))).alias("tok"),
    )
    sz = tok.groupBy("d").agg(F.count("*").alias("sz"))
    inter = (
        cand.join(tok.alias("ta"), F.col("a") == F.col("ta.d"))
        .join(
            tok.alias("tb"),
            (F.col("b") == F.col("tb.d"))
            & (F.col("ta.tok") == F.col("tb.tok")),
        )
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter").cast("double") / (
        F.col("sza") + F.col("szb") - F.col("inter")
    ).cast("double")
    return (
        inter.join(sz.select(F.col("d").alias("a"), F.col("sz").alias("sza")), "a")
        .join(sz.select(F.col("d").alias("b"), F.col("sz").alias("szb")), "b")
        .select("a", "b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= F.lit(threshold))
        .orderBy("a", "b")
    )


def snm_recall_eval(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 4,
    block_chars: int = 8,
    key_chars: int = 64,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Recall/precision audit of sorted-neighborhood blocking against
    exact shingle-Jaccard ground truth — the SNM twin of lsh_recall_eval,
    measuring the documented blocking trade (pairs straddling a block
    boundary or further than `window-1` apart in sort order are never
    candidates).

    Same contract as lsh_recall_eval: truth is UNCAPPED exact Jaccard
    (audit-scale by design); the audit itself touches only the linear
    candidate set. One row: n_truth, n_candidates, n_hits, recall,
    precision."""
    truth = ngram_jaccard_pairs(
        docs, text_col, id_col, k, threshold, df_cap=1 << 62
    ).select("a", "b")
    cand = _snm_candidates(docs, text_col, id_col, window, block_chars, key_chars)
    return _pair_audit(truth, cand)


def _band_rows(
    signatures: DataFrame, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    """Signature rows exploded to one row per (band, band_key), CARRYING the
    full signature: the join that consumes these can estimate Jaccard from
    the matched row alone, with no second join back to a signature table.
    Band keys come from the same _band_structs lsh_candidate_pairs uses,
    so persisted-index keys stay compatible with the one-shot pipeline's
    by construction."""
    band_structs = _band_structs(num_hashes, bands)
    return signatures.select(
        F.col(id_col),
        *[F.col(f"mh{j}") for j in range(num_hashes)],
        F.explode(band_structs).alias("bk"),
    ).select(
        id_col,
        F.col("bk.band").alias("band"),
        F.col("bk.band_key").alias("band_key"),
        *[F.col(f"mh{j}") for j in range(num_hashes)],
    )


def lsh_index_build(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    k: int = 3,
    mode: str = "overwrite",
) -> None:
    """Persist the corpus's MinHash band index for INCREMENTAL dedup: one
    parquet row per (doc, band) holding (band_key, full signature),
    partitioned by `band`.

    This is the operational 100 TB story the one-shot pipelines
    (minhash_lsh_pairs, lsh_verified_pairs) don't cover: once a corpus is
    deduped, tomorrow's crawl snapshot must dedup AGAINST it without
    re-shingling, re-hashing, or re-shuffling 100 TB. The index holds 16
    longs + a band key per (doc, band) row — ~200 B per row, ~800 B/doc
    at bands=4, so a 10^10-doc corpus indexes in ~8 TB, under 10% of
    corpus bytes — and is written ONCE; every later snapshot only reads
    it. Appending a deduped snapshot's own rows keeps the index current
    (same schema, append mode — the meta row is only written on
    overwrite, so appends cannot change the hash family).

    The index is SELF-DESCRIBING: (num_hashes, bands, k) persist in the
    manifest and every probe reads them back — a probe can never
    silently run with a mismatched hash family (which would return
    missing pairs, not an error). Appends land in fresh batch dirs that
    no reader consults until the atomic manifest flip commits them, and
    the full lifecycle (lsh_index_retire / lsh_index_compact) follows
    the store's tombstone + generation discipline — see
    functions/index_store.py.

    Reference analogy: the reference folds new points against its
    persisted COW tree instead of rebuilding (store.py insert/compact);
    this is the same fold-against-persisted-state discipline for dedup.
    """
    from btrdb_server_spark.functions import index_store as ixs

    with ixs.writer_lock(path):  # single-writer maintenance, enforced
        if mode == "overwrite":
            m = ixs.init_index(
                path,
                ["bands"],
                params={"num_hashes": num_hashes, "bands": bands, "k": k},
            )
            batch = 0
        else:
            # Appends MUST use the index's own hash family — caller-supplied
            # params are ignored in favor of the persisted meta, otherwise an
            # append could silently write band keys no probe can match.
            m = ixs.read_manifest(path)
            p = m["params"]
            num_hashes, bands, k = int(p["num_hashes"]), int(p["bands"]), int(p["k"])
            batch = ixs.next_batch(m)
        sigs = minhash_signatures(docs, text_col, id_col, num_hashes, k)
        rows = (
            _band_rows(sigs, id_col, num_hashes, bands)
            .withColumnRenamed(id_col, "index_id")
        )
        n_rows = ixs.write_partitioned_batch(
            rows, ixs.table_batch_dir(path, m, "bands", batch), "band"
        )
        if n_rows == 0:
            # An empty APPEND commits nothing (in particular it must not
            # clear a fully-retired index's empty_tables mark); an empty
            # BUILD commits a batch-less manifest whose schema record lets
            # read_table synthesize the empty index (same shape as a
            # fully-retired compaction — a later append revives batch 0).
            if mode != "overwrite":
                return
            m["batches"] = []
        ixs.mark_table(m, "bands", n_rows, rows.schema)
        if mode != "overwrite":
            m["batches"] = m["batches"] + [batch]
        ixs.write_manifest(path, m)  # atomic commit: nothing live before this


def incremental_dedup_pairs(
    new_docs: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    est_threshold: float = 0.5,
    broadcast_snapshot: bool | None = None,
    broadcast_row_cap: int = 2_000_000,
) -> DataFrame:
    """Dedup a NEW snapshot against a persisted lsh_index_build index:
    for every new doc, the already-indexed docs it near-duplicates,
    with the MinHash Jaccard estimate (matches / num_hashes). The hash
    family (num_hashes, bands, k) is read from the index's meta table —
    the probe cannot run with a mismatched family.

    Columns: new_id, match_id, matches, est_jaccard — ordered.

    Scale shape (the entire point of the persisted index):
    - the index side is SCANNED, never shuffled: the new snapshot's band
      rows (snapshot ≪ corpus — a daily crawl is ~0.1% of the total) are
      broadcast, so the join is a broadcast-hash probe riding the index
      scan, and only (band, band_key) + 16 longs are read from it;
    - the corpus TEXT is never touched — verification is sketch-based
      (est_jaccard from the signatures carried in the index rows), which
      is exactly what the stored signatures are for. Exact verification
      would re-read corpus text per candidate; callers who need it can
      join the emitted pairs back to text themselves.
    - duplicates from multi-band collisions collapse with one
      dropDuplicates on (new_id, match_id) — `matches` is a pure function
      of the pair, so every collision row already agrees on it.

    Within-snapshot duplicates are out of scope by design: run the
    one-shot pipeline (minhash_lsh_pairs / lsh_verified_pairs) on the
    snapshot itself, then index-append the survivors.

    The "snapshot ≪ corpus" assumption is ENFORCED, not assumed: by
    default the snapshot's band rows are broadcast only while the
    snapshot is provably small (row count ≤ broadcast_row_cap, a cheap
    count on the batch); an oversized snapshot degrades SOFT to a plain
    shuffled join on (band, band_key) instead of OOMing the driver.
    Pass broadcast_snapshot=True/False to skip the guard either way.

    Retired docs (lsh_index_retire) never appear as match_id — the
    tombstone set rides a broadcast anti-join on the index scan.
    """
    from btrdb_server_spark.functions import index_store as ixs

    spark = new_docs.sparkSession
    m = ixs.read_manifest(index_path)
    p = m["params"]
    num_hashes, bands, k = int(p["num_hashes"]), int(p["bands"]), int(p["k"])
    idx = ixs.minus_tombstones(
        ixs.read_table(spark, index_path, m, "bands"),
        ixs.read_tombstones(spark, index_path, m),
        "index_id",
        tomb_rows=m.get("tombstone_rows"),
    )
    new_sigs = minhash_signatures(new_docs, text_col, id_col, num_hashes, k)
    probe = (
        _band_rows(new_sigs, id_col, num_hashes, bands)
        .withColumnRenamed(id_col, "new_id")
    )
    if broadcast_snapshot is None:
        # The broadcast side holds bands rows per doc, ~(16 longs + key)
        # each: the cap bounds it at a few hundred MB — comfortably
        # inside executor broadcast budgets. The guard count reads just
        # enough docs to decide (limit + count, never a full snapshot
        # scan when it is huge).
        doc_cap = max(1, broadcast_row_cap // bands)
        broadcast_snapshot = new_docs.limit(doc_cap + 1).count() <= doc_cap
    if broadcast_snapshot:
        probe = F.broadcast(probe)
    matches = sum(
        F.when(F.col(f"mh{j}") == F.col(f"imh{j}"), 1).otherwise(0)
        for j in range(num_hashes)
    )
    return (
        idx.select(
            "band",
            "band_key",
            F.col("index_id").alias("match_id"),
            *[F.col(f"mh{j}").alias(f"imh{j}") for j in range(num_hashes)],
        )
        .join(probe, ["band", "band_key"])
        .select(
            "new_id",
            "match_id",
            matches.cast("long").alias("matches"),
            (matches.cast("double") / F.lit(float(num_hashes))).alias(
                "est_jaccard"
            ),
        )
        .where(F.col("est_jaccard") >= F.lit(est_threshold))
        .dropDuplicates(["new_id", "match_id"])
        .orderBy("new_id", "match_id")
    )


def lsh_index_stats(spark, index_path: str) -> DataFrame:
    """Operational audit of a persisted lsh_index_build index: per band,
    the doc count, distinct bucket count, max/mean bucket size, and the
    number of colliding buckets (size >= 2).

    The max bucket size is THE number to watch before every snapshot
    probe: incremental_dedup_pairs emits one candidate row per (new doc x
    resident docs) in a shared bucket, so a degenerate bucket (empty-text
    shingle artifacts, boilerplate) turns the probe into a hot-key join.
    At 100 TB this runs off the index alone — one map-side-combined
    groupBy per (band, band_key), then a per-band reduce; corpus text is
    never touched, and the second aggregation's input is one row per
    bucket.

    Columns: band, n_docs, n_buckets, max_bucket, mean_bucket,
    n_colliding — ordered by band.
    """
    from btrdb_server_spark.functions import index_store as ixs

    m = ixs.read_manifest(index_path)
    idx = ixs.minus_tombstones(
        ixs.read_table(spark, index_path, m, "bands"),
        ixs.read_tombstones(spark, index_path, m),
        "index_id",
        tomb_rows=m.get("tombstone_rows"),
    )
    per_bucket = idx.groupBy("band", "band_key").agg(
        F.count("*").alias("sz")
    )
    return (
        per_bucket.groupBy("band")
        .agg(
            F.sum("sz").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_buckets"),
            F.max("sz").cast("long").alias("max_bucket"),
            (F.sum("sz") / F.count("*")).alias("mean_bucket"),
            F.sum(F.when(F.col("sz") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_colliding"),
        )
        .orderBy("band")
    )


def lsh_index_drift(
    spark,
    index_path: str,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_mod: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Banding-PRECISION drift gauge for a persisted lsh_index_build
    index — the staleness metric the stats entry lacks (bucket skew says
    the keyspace degenerated; this says the banding's candidate QUALITY
    did): over the deterministic sample of index candidate pairs whose
    smaller id satisfies ``a % sample_mod == 0``, compare the stored
    signatures' Jaccard ESTIMATE (matching positions / num_hashes — the
    quantity banding acts on) against the exact shingle Jaccard verified
    from the live corpus text.

    One row: n_pairs, mean_est_jaccard, mean_true_jaccard, mean_abs_err,
    precision (fraction of sampled candidates whose TRUE Jaccard clears
    `threshold`). Rebuild trigger: gauge at build time, re-gauge after
    appends — when precision sinks or mean_abs_err grows past ~2x the
    build-time value (boilerplate/templating drift feeding the bands
    hash-collision-prone shingles), re-band or re-shingle via a REBUILD
    (lsh_index_build overwrite — same generation-swap discipline as
    pq_index_reencode).

    Per-pair ratios are exact int ratios quantized to int64 micro-units
    before the global sums, so every mean is order-independent and
    bit-stable across engines; the precision compare runs on the
    quantized values (no float-tie surface). Cost: one pruned index
    self-join restricted to the sampled left ids, plus exact-verify
    shingling of ONLY the docs appearing in sampled pairs — never the
    corpus (the lsh_verified_pairs economics, sampled)."""
    from btrdb_server_spark.functions import index_store as ixs

    m = ixs.read_manifest(index_path)
    p = m["params"]
    num_hashes, k = int(p["num_hashes"]), int(p["k"])
    rows = ixs.minus_tombstones(
        ixs.read_table(spark, index_path, m, "bands"),
        ixs.read_tombstones(spark, index_path, m),
        "index_id",
        tomb_rows=m.get("tombstone_rows"),
    )
    mh = [f"mh{j}" for j in range(num_hashes)]
    left = (
        rows.where(F.col("index_id") % F.lit(int(sample_mod)) == 0)
        .select(
            F.col("index_id").alias("a"),
            "band",
            "band_key",
            *[F.col(c).alias(f"l_{c}") for c in mh],
        )
    )
    right = rows.select(
        F.col("index_id").alias("b"),
        "band",
        "band_key",
        *[F.col(c).alias(f"r_{c}") for c in mh],
    )
    matches = sum(
        F.when(F.col(f"l_{c}") == F.col(f"r_{c}"), 1).otherwise(0) for c in mh
    )
    cand = (
        left.join(right, ["band", "band_key"])
        .where(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            # est quantized per pair via FLOOR: round() would sit on the
            # HALF_UP-vs-banker's tie divergence for raw ratios; floor of
            # the identical IEEE product is tie-free and engine-portable.
            F.floor(matches / F.lit(num_hashes) * 1e6)
            .cast("long")
            .alias("est_q"),
        )
        .distinct()  # a pair colliding in several bands counts once
        .localCheckpoint(eager=False)  # feeds ids, the verify join, the agg
    )
    ids = cand.select(F.col("a").alias(id_col)).union(
        cand.select(F.col("b").alias(id_col))
    ).distinct()
    sh = (
        ensure_parallelism(docs.join(ids, id_col, "left_semi"))
        .select(
            F.col(id_col), F.explode(shingles_col(F.col(text_col), k)).alias("s")
        )
        .select(
            id_col,
            F.conv(F.substring(F.md5("s"), 1, 15), 16, 10)
            .cast("long")
            .alias("s"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    inter = (
        cand.join(sh.select(F.col(id_col).alias("a"), "s"), "a")
        .join(sh.select(F.col(id_col).alias("b"), "s"), ["b", "s"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("szb"))
    per_pair = (
        cand.join(inter, ["a", "b"], "left")  # zero-overlap pairs stay
        .join(F.broadcast(sa), "a")
        .join(F.broadcast(sb), "b")
        .select(
            "est_q",
            F.floor(
                F.coalesce(F.col("inter"), F.lit(0))
                / (F.col("sza") + F.col("szb") - F.coalesce(F.col("inter"), F.lit(0)))
                * 1e6
            )
            .cast("long")
            .alias("true_q"),
        )
    )
    thr_q = int(threshold * 1e6)  # exact for the supported thresholds
    n = F.count(F.lit(1)).cast("long")
    return per_pair.agg(
        n.alias("n_pairs"),
        (F.sum("est_q").cast("double") / n.cast("double") / F.lit(1e6)).alias(
            "mean_est_jaccard"
        ),
        (F.sum("true_q").cast("double") / n.cast("double") / F.lit(1e6)).alias(
            "mean_true_jaccard"
        ),
        (
            F.sum(F.abs(F.col("est_q") - F.col("true_q"))).cast("double")
            / n.cast("double")
            / F.lit(1e6)
        ).alias("mean_abs_err"),
        (
            F.sum(F.when(F.col("true_q") >= thr_q, 1).otherwise(0)).cast("double")
            / n.cast("double")
        ).alias("precision"),
    )


def lsh_index_retire(spark, index_path: str, ids) -> int:
    """Retire documents from a persisted lsh_index_build index — the
    takedown / re-curation path: once a doc is deleted from the corpus,
    its signature rows must stop producing dedup matches (a stale pair
    against a GDPR-deleted doc is a correctness bug, not a nuisance).
    Records the ids in the tombstone set WITHOUT rewriting band rows;
    every probe (incremental_dedup_pairs, lsh_index_stats) anti-joins the
    broadcast set, so retire-then-probe is BIT-EQUAL to a rebuild on the
    post-delete corpus. Bytes are reclaimed by lsh_index_compact —
    tombstone now, rewrite in the background, the reference's Obliterate
    protocol (internal/mprovider/metaprovider.go:339-427).

    Idempotent (the retired set is derived from live index rows, so
    re-retiring or retiring never-indexed ids is a no-op). Cost: one
    index scan of the index_id column + a metadata-scale tombstone
    rewrite. Returns the number of docs newly retired.
    """
    from btrdb_server_spark.functions import index_store as ixs

    return ixs.retire_table_ids(spark, index_path, "bands", ids, id_col="index_id")


def lsh_index_compact(spark, index_path: str) -> dict:
    """Fold an LSH index's append fragments and drop its retired docs:
    rewrite the live band rows into ONE fresh generation (re-sharded by
    band so each band directory collapses to a few fat files), flip the
    manifest atomically; the superseded generations and tombstone set are
    retained until the NEXT maintenance op (two-generation retention). Probe answers are unchanged (compact-then-probe ==
    tombstone-view probe == post-delete rebuild, driver-proven); probes
    stop paying the anti-join and the per-batch file fan-out. Mirrors
    store.compact()'s generation discipline (store.py:406-520).
    Returns {rows, gen}.
    """
    from btrdb_server_spark.functions import index_store as ixs

    return ixs.compact_partitioned_table(
        spark, index_path, "bands", "band", id_col="index_id"
    )
