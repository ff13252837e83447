"""Tests for the training-data pipeline operators: text analysis, dedup,
similarity search, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from btrdb_server_spark.functions.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from btrdb_server_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    frame_sample,
    resize_plan,
)
from btrdb_server_spark.functions.similarity import (
    ann_topk_lsh,
    cosine_topk,
    hyperplanes,
    lsh_bucket_assignments,
    near_dup_pairs,
)
from btrdb_server_spark.functions.text import doc_fingerprint, lang_id, text_stats


def docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_text_stats_basic(spark):
    df = docs_df(spark, ["The quick brown fox, the lazy dog.", "a b", ""])
    rows = {r.doc_id: r for r in text_stats(df).collect()}
    assert rows[0].n_tokens == 7
    assert rows[0].punct_ratio > 0
    assert rows[0].stopword_ratio == pytest.approx(2 / 7, abs=1e-6)
    assert 0.0 <= rows[0].quality <= 1.0
    assert rows[1].n_tokens == 2 and rows[1].punct_ratio == 0.0
    assert rows[2].n_tokens == 0


def test_text_stats_on_testdata(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = text_stats(docs)
    assert out.count() == docs.count()
    bad = out.where((F.col("quality") < 0) | (F.col("quality") > 1)).count()
    assert bad == 0


def test_lang_id_markers(spark):
    df = docs_df(
        spark,
        [
            "the cat and the dog is here",
            "el perro de la casa que ladra",
            "der hund und die katze ist da",
            "xyzzy plugh",
        ],
    )
    got = {r.doc_id: r.pred_lang for r in lang_id(df).collect()}
    assert got[0] == "en"
    assert got[1] == "es"
    assert got[2] == "de"
    assert got[3] == "und"


def test_exact_dedup(spark):
    df = docs_df(spark, ["hello  world", "hello world", "other text", "Hello World"])
    got = {r.doc_id: (r.keeper, r.is_dup) for r in exact_dedup(df).collect()}
    # whitespace-normalized + lowercased: 0,1,3 identical
    assert got[0] == (0, False)
    assert got[1] == (0, True)
    assert got[3] == (0, True)
    assert got[2] == (2, False)


def test_fingerprint_matches_dedup_key(spark):
    df = docs_df(spark, ["a  b c", "a b c"])
    fps = [r.fingerprint for r in doc_fingerprint(df).collect()]
    assert fps[0] == fps[1]


BASE = "the quick brown fox jumps over the lazy dog again and again every day"


def test_minhash_lsh_finds_near_dups(spark):
    near = BASE.replace("lazy", "sleepy")
    far = "completely different words about spark dataframes and parquet files here"
    df = docs_df(spark, [BASE, near, far])
    sigs = minhash_signatures(df)
    assert sigs.count() == 3
    # bands of 2 rows: ~0.6-Jaccard docs collide on at least one band
    # (deterministic — md5 minhashes are fixed)
    pairs = {(r.a, r.b) for r in lsh_candidate_pairs(sigs, bands=8).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_lsh_verified_and_clusters(spark):
    """The verified pipeline keeps only true near-dups from the LSH
    candidates, and clustering labels each component with its min doc id —
    transitively: A~B and B~C cluster together even if A,C never paired."""
    from btrdb_server_spark.functions.dedup import dedup_clusters, lsh_verified_pairs

    near1 = BASE.replace("lazy", "sleepy")
    near2 = BASE.replace("lazy", "sleepy").replace("quick", "rapid")
    far = "completely different words about spark dataframes and parquet files here"
    df = docs_df(spark, [BASE, near1, near2, far])
    pairs = {(r.a, r.b): r.jaccard for r in
             lsh_verified_pairs(df, threshold=0.3, bands=8).collect()}
    assert (0, 1) in pairs and all(j >= 0.3 for j in pairs.values())
    assert (0, 3) not in pairs and (1, 3) not in pairs and (2, 3) not in pairs

    out = {r.doc_id: (r.cluster, r.is_dup) for r in
           dedup_clusters(df, threshold=0.3, bands=8).collect()}
    assert out[0] == (0, False)
    assert out[1] == (0, True)
    assert out[2] == (0, True)  # transitive via doc 1
    assert out[3] == (3, False)  # singleton keeps itself


def test_dedup_select_keeps_best_quality_member(spark):
    """Survivor selection keeps the LONGEST member of each near-dup
    cluster (not the min id), ties to the smallest id; singletons keep
    themselves."""
    from btrdb_server_spark.functions.dedup import dedup_select

    near_longer = BASE.replace("lazy", "sleepy") + " and then some extra tail"
    far = "completely different words about spark dataframes and parquet files here"
    df = docs_df(spark, [BASE, near_longer, far])
    out = {r.doc_id: (r.cluster, r.score, r.kept) for r in
           dedup_select(df, threshold=0.3, bands=8).collect()}
    assert set(out) == {0, 1, 2}
    assert out[0][0] == out[1][0] == 0        # one cluster, min-id label
    assert out[1][2] and not out[0][2]        # longer member survives
    assert out[2][2]                          # singleton survives
    assert out[1][1] > out[0][1]              # score = char length


def test_simhash_identical_and_near(spark):
    df = docs_df(spark, [BASE, BASE, BASE.replace("lazy", "sleepy"), "unrelated thing"])
    got = {r.doc_id: r.simhash for r in simhash(df).collect()}
    assert got[0] == got[1]
    ham = bin(got[0] ^ got[2]).count("1")
    assert ham <= 6  # near-dup -> small hamming distance
    assert 0 <= got[3] < (1 << 16)


def test_ngram_jaccard_exact(spark):
    a = "w1 w2 w3 w4 w5"  # shingles: {w1w2w3, w2w3w4, w3w4w5}
    b = "w1 w2 w3 w4 x"  # shingles: {w1w2w3, w2w3w4, w3w4x}
    df = docs_df(spark, [a, b])
    rows = ngram_jaccard_pairs(df, threshold=0.0).collect()
    assert len(rows) == 1
    assert rows[0].jaccard == pytest.approx(2 / 4, abs=1e-6)


def test_cosine_topk_ordering(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = cosine_topk(df, [1.0, 0.0, 0.0], k=3).collect()
    assert [r.vec_id for r in got] == [0, 1, 2]
    assert got[0].cosine == pytest.approx(1.0)


def test_lsh_ann(spark):
    import random

    rng = random.Random(42)
    vecs = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(200)]
    vecs.append((200, list(vecs[0][1])))  # exact dup of vec 0
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    planes = hyperplanes(16, planes=6)
    buckets = {r.vec_id: r.bucket for r in lsh_bucket_assignments(df, planes).collect()}
    assert buckets[0] == buckets[200]  # identical vectors share a bucket
    topk = ann_topk_lsh(df, vecs[0][1], planes, k=2).collect()
    assert {r.vec_id for r in topk} == {0, 200}


def test_near_dup_pairs_blocked(spark):
    vecs = [
        (0, 1, [1.0, 2.0, 3.0]),
        (1, 1, [1.0, 2.0, 3.0]),  # dup of 0, same block
        (2, 2, [1.0, 2.0, 3.0]),  # dup but different block -> not compared
        (3, 1, [3.0, -1.0, 0.5]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, label int, embedding array<float>")
    got = [(r.a, r.b) for r in near_dup_pairs(df, threshold=0.999).collect()]
    assert got == [(0, 1)]


def test_multimodal_decode_plumbing(spark):
    rows = [
        (1, "image", bytearray(b"\x89PNGfake"), {"src": "cam1"}),
        (2, "video", bytearray(b"RIFFfake"), None),
        (3, "audio", bytearray(b"ID3fake"), None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    dec = decode_media(media, fake=True)
    got = {r.media_id: r for r in dec.collect()}
    assert got[1].width is not None and got[1].n_frames == 1
    assert got[2].n_frames > 0
    assert got[3].sample_rate in range(8000, 49000)
    assert got[1].n_bytes == 8 and len(got[1].sha256) == 64
    # deterministic: same payload -> same pseudo-metadata
    again = {r.media_id: r for r in decode_media(media, fake=True).collect()}
    assert again[1].width == got[1].width

    frames = frame_sample(dec, every_n=500).collect()
    assert all(r.frame_idx % 500 == 0 for r in frames)
    rs = {r.media_id: r for r in resize_plan(dec, max_side=224).collect()}
    assert max(rs[1].out_w, rs[1].out_h) <= 224

    # fake=False on non-container bytes: NULL dims, hashes still real.
    real = {r.media_id: r for r in decode_media(media, fake=False).collect()}
    assert real[1].width is None and real[1].sha256 == got[1].sha256


def test_multimodal_real_container_decode(spark):
    """fake=False parses REAL container headers: a valid 1x1 PNG, a GIF
    logical screen, a BMP info header, a JPEG SOF0, and a stdlib-written
    WAV file — no external codec library involved."""
    import io
    import struct
    import wave
    import zlib

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 320, 240, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00\xff\x00\x00"))
        + chunk(b"IEND", b"")
    )
    gif = b"GIF89a" + struct.pack("<HH", 99, 77) + b"\x00" * 6
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 12, -34) + b"\x00" * 8
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", 480, 640) + b"\x03" + b"\x00" * 2
        + b"\xff\xd9"
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(b"\x00\x00" * 2 * 100)  # 100 stereo frames
    wav = buf.getvalue()

    rows = [
        (1, "image", bytearray(png), None),
        (2, "image", bytearray(gif), None),
        (3, "image", bytearray(bmp), None),
        (4, "image", bytearray(jpeg), None),
        (5, "audio", bytearray(wav), None),
        (6, "image", bytearray(b"not media"), None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in decode_media(media, fake=False).collect()}
    assert (got[1].width, got[1].height, got[1].n_frames) == (320, 240, 1)
    assert (got[2].width, got[2].height) == (99, 77)
    assert (got[3].width, got[3].height) == (12, 34)
    assert (got[4].width, got[4].height) == (640, 480)
    assert (got[5].sample_rate, got[5].n_frames) == (44100, 100)
    assert got[6].width is None and got[6].n_bytes == 9


def test_bpe_token_stats(spark):
    from btrdb_server_spark.functions.text import bpe_token_stats

    docs = spark.createDataFrame(
        [(1, "Hello, world! 42 foo"), (2, "aaa aaa aaa")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in bpe_token_stats(docs).collect()}
    # "Hello , world ! 42 foo" -> 6 pre-tokens, all unique
    assert rows[1].n_bpe == 6 and rows[1].n_unique_bpe == 6
    assert rows[2].n_bpe == 3 and rows[2].n_unique_bpe == 1


def test_rolling_fingerprint_order_sensitive(spark):
    from btrdb_server_spark.functions.text import rolling_fingerprint

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "c b a"), (3, "a b c"), (4, "")],
        "doc_id long, text string",
    )
    fps = {r.doc_id: r.fp for r in rolling_fingerprint(docs).collect()}
    assert fps[1] == fps[3]          # deterministic
    assert fps[1] != fps[2]          # order matters (unlike bag-of-words)
    assert fps[4] == 0               # empty doc -> 0


def test_ivf_assign_and_topk(spark):
    from btrdb_server_spark.functions.similarity import (
        ann_topk_ivf,
        centroids_from_rows,
        ivf_assign,
    )

    # 2-D vectors: ids 0,1 are the centroids (x-axis / y-axis).
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (1, [0.0, 1.0], 0),
            (2, [0.9, 0.1], 0),
            (3, [0.1, 0.9], 0),
            (4, [-1.0, 0.0], 0),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    cents = centroids_from_rows(emb, k=2)
    assign = {r.vec_id: r.cluster for r in ivf_assign(emb, cents).collect()}
    assert assign[0] == 0 and assign[2] == 0
    assert assign[1] == 1 and assign[3] == 1
    assert assign[4] == 1  # cos with x-axis = -1 < cos with y-axis = 0
    top = ann_topk_ivf(emb, cents, probe_id=0, k=10).collect()
    ids = [r.vec_id for r in top]
    assert ids[0] == 0 and 2 in ids  # same-cluster only
    assert 1 not in ids and 3 not in ids and 4 not in ids


def test_kmeans_train_converges_and_is_deterministic(spark):
    from btrdb_server_spark.functions.similarity import ivf_assign, kmeans_train

    # Two tight angular clusters around the x- and y-axes; the first two
    # rows (the deterministic seeds) are one member of each.
    rows = [(0, [1.0, 0.02], 0), (1, [0.02, 1.0], 0)]
    rows += [(i, [1.0, 0.02 * (i % 5)], 0) for i in range(2, 20)]
    rows += [(i, [0.02 * (i % 5), 1.0], 0) for i in range(20, 40)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    cents = kmeans_train(emb, k=2, iters=3)
    got = {r.cid: r.cv for r in cents.collect()}
    assert set(got) == {0, 1} and all(len(v) == 2 for v in got.values())
    # Trained centroid 0 points along x (first component dominates), 1
    # along y — the Lloyd means of the two angular groups.
    assert got[0][0] > got[0][1] and got[1][1] > got[1][0]
    # Assignment under the trained centroids separates the groups.
    assign = {r.vec_id: r.cluster for r in ivf_assign(emb, cents).collect()}
    assert all(assign[i] == 0 for i in range(2, 20))
    assert all(assign[i] == 1 for i in range(20, 40))
    # Deterministic: a second training run yields identical centroids.
    again = {r.cid: r.cv for r in kmeans_train(emb, k=2, iters=3).collect()}
    assert again == got
    # iters=0 returns the raw seeds.
    seeds = {r.cid: r.cv for r in kmeans_train(emb, k=2, iters=0).collect()}
    assert seeds[0] == [1.0, pytest.approx(0.02)]


# --------------------------------------------------------------- curation --


def test_quality_filter_rules(spark):
    from btrdb_server_spark.functions.curation import quality_filter

    df = docs_df(
        spark,
        [
            # 0: good — long enough, normal tokens, stopwords, no punct flood
            "the quick brown fox jumps over the lazy dog and runs on for a while",
            # 1: too short
            "tiny doc",
            # 2: punctuation flood
            "!!! ... ;;; !!! ... ;;; !!! ... ;;; !!! ... ;;; !!! ... ;;;",
            # 3: no stopwords at all
            "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu",
        ],
    )
    rows = {r.doc_id: r for r in quality_filter(df).collect()}
    assert rows[0].keep
    assert not rows[1].keep and not rows[1].ok_n_tokens
    assert not rows[2].keep and not rows[2].ok_punct
    assert not rows[3].keep and not rows[3].ok_stopwords
    for r in rows.values():  # keep == AND of all flags
        assert r.keep == (
            r.ok_n_tokens and r.ok_token_len and r.ok_punct and r.ok_stopwords
        )


def test_decontaminate_flags_overlap(spark):
    from btrdb_server_spark.functions.curation import decontaminate

    bench = docs_df(spark, ["the secret benchmark question about turtles"])
    train = spark.createDataFrame(
        [
            # 10: verbatim leak of the bench doc -> fully contaminated
            (10, "the secret benchmark question about turtles"),
            # 11: disjoint content -> clean
            (11, "completely unrelated words nothing shared here at all today"),
            # 12: too short for any shingle -> n_shingles 0, clean
            (12, "just two"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in decontaminate(train, bench).collect()}
    assert rows[10].contaminated and rows[10].overlap == 1.0
    assert not rows[11].contaminated and rows[11].n_matched == 0
    assert rows[12].n_shingles == 0 and not rows[12].contaminated


def test_decontaminate_lsh_flags_near_copies(spark):
    """Bipartite LSH decontamination: a verbatim leak and a one-word-off
    near-copy are flagged; disjoint and sub-shingle docs pass; every
    corpus doc gets a row."""
    from btrdb_server_spark.functions.curation import decontaminate_lsh

    bench = docs_df(spark, ["the secret benchmark question about turtles and ponds"])
    train = spark.createDataFrame(
        [
            (10, "the secret benchmark question about turtles and ponds"),
            (11, "the secret benchmark question about turtles and rivers"),
            (12, "completely unrelated words nothing shared here at all today"),
            (13, "just two"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in decontaminate_lsh(train, bench).collect()}
    assert set(rows) == {10, 11, 12, 13}
    assert rows[10].contaminated and rows[10].n_contaminating == 1
    assert rows[11].contaminated          # near-copy: high Jaccard, LSH hit
    assert not rows[12].contaminated and rows[12].n_candidates == 0
    assert not rows[13].contaminated and rows[13].n_candidates == 0


def test_stratified_sample_nested_and_deterministic(spark, sf_dir):
    from btrdb_server_spark.functions.curation import stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lo = stratified_sample(docs, {"en": 0.1}, 0.1)
    hi = stratified_sample(docs, {"en": 0.5}, 0.5)
    lo_ids = {r.doc_id for r in lo.collect()}
    hi_ids = {r.doc_id for r in hi.collect()}
    assert lo_ids <= hi_ids  # hash-threshold sampling nests across rates
    assert lo_ids == {r.doc_id for r in stratified_sample(docs, {"en": 0.1}, 0.1).collect()}
    n = docs.count()
    assert 0 < len(hi_ids) < n
    # rate is roughly honored (binomial-ish tolerance)
    assert abs(len(hi_ids) / n - 0.5) < 0.15


def test_pack_sequences_offsets_contiguous(spark):
    from btrdb_server_spark.functions.curation import pack_sequences

    df = docs_df(spark, [f"tok {'w ' * (i % 7)}end" for i in range(40)])
    out = pack_sequences(df, ctx_len=8, n_shards=4).collect()
    by_shard: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.shard, r.doc_id)):
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) == {0, 1, 2, 3}
    for rows in by_shard.values():
        expect = 0
        for r in rows:  # offsets are the exact running token count
            assert r.tok_offset == expect
            assert r.seq_idx == expect // 8
            expect += r.n_tokens


def test_bm25_ranks_matching_docs(spark):
    from btrdb_server_spark.functions.retrieval import bm25_topk

    df = docs_df(
        spark,
        [
            "spark spark spark streaming engine",   # high tf for 'spark'
            "spark appears once in this longer document about other things",
            "nothing relevant whatsoever here today",
            "hash join and hash shuffle with spark",
        ],
    )
    rows = bm25_topk(df, ["spark", "hash"], k=10).collect()
    ids = [r.doc_id for r in rows]
    assert 2 not in ids  # no query term -> no score at all
    assert ids[0] == 3  # matches both terms, beats any single-term doc
    assert all(rows[i].score >= rows[i + 1].score for i in range(len(rows) - 1))


def test_tfidf_topk_prefers_distinctive_terms(spark):
    """A term unique to one document outranks a corpus-wide term with the
    same in-doc frequency; ranks are 1-based, dense per doc, at most k."""
    from btrdb_server_spark.functions.retrieval import tfidf_topk

    df = docs_df(
        spark,
        [
            "common zebra",            # zebra: unique; common: everywhere
            "common common common yak",
            "common filler words",
        ],
    )
    rows = tfidf_topk(df, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.token, r.score))
    assert set(by_doc) == {0, 1, 2}
    assert all([x[0] for x in v] == list(range(1, len(v) + 1)) for v in by_doc.values())
    assert all(len(v) <= 2 for v in by_doc.values())
    # doc 0: 'zebra' (tf=1, df=1: idf ln2+1) beats 'common' (tf=1, df=3: idf 1)
    assert by_doc[0][0][1] == "zebra"
    # top scores within a doc are non-increasing
    for v in by_doc.values():
        assert all(a[2] >= b[2] for a, b in zip(v, v[1:]))


def test_unigram_logprob_rare_tokens_score_lower(spark):
    from btrdb_server_spark.functions.retrieval import unigram_logprob

    df = docs_df(
        spark,
        ["common common common common", "common zzqx", ""],
    )
    rows = {r.doc_id: r for r in unigram_logprob(df).collect()}
    # doc 0 is all high-frequency tokens; doc 1 mixes in a hapax
    assert rows[0].mean_logprob > rows[1].mean_logprob
    assert rows[2].n_tokens == 0 and rows[2].mean_logprob is None


def test_pq_encode_shape_and_self_coding(spark, sf_dir):
    from btrdb_server_spark.functions.similarity import pq_encode

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    out = pq_encode(emb, m=4, k=8, dim=64)
    rows = out.collect()
    assert len(rows) == 4 * n  # one row per (vector, subspace)
    assert {r.subspace for r in rows} == {0, 1, 2, 3}
    assert all(0 <= r.code < 8 for r in rows)
    # codebook vectors quantize to themselves in every subspace
    for r in rows:
        if r.vec_id < 8:
            assert r.code == r.vec_id


def test_pq_train_refines_codebooks(spark, sf_dir):
    """iters=0 returns pq_encode's seed codebooks verbatim; one joint
    Lloyd iteration produces a valid trained codebook (every subspace,
    every surviving code) whose total quantization distortion does not
    exceed the seeds'; pq_encode accepts it via codebook=."""
    import math

    from btrdb_server_spark.functions.similarity import pq_encode, pq_train

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    seeds = {(r.j, r.code): r.cv for r in pq_train(emb, iters=0, dim=64).collect()}
    assert len(seeds) == 4 * 8 and all(len(v) == 16 for v in seeds.values())
    raw = {
        r.vec_id: r.embedding
        for r in emb.where("vec_id < 8").select("vec_id", "embedding").collect()
    }
    for (j, code), cv in seeds.items():
        want = [float(x) for x in raw[code][j * 16 : (j + 1) * 16]]
        assert all(abs(a - b) < 1e-6 for a, b in zip(cv, want))

    trained = {(r.j, r.code): r.cv for r in pq_train(emb, iters=1, dim=64).collect()}
    assert set(r[0] for r in trained) == {0, 1, 2, 3}
    assert all(len(v) == 16 for v in trained.values())

    def distortion(cb):
        sub = {r.vec_id: r.embedding for r in emb.collect()}
        tot = 0.0
        for vid, v in sub.items():
            for j in range(4):
                sv = [float(x) for x in v[j * 16 : (j + 1) * 16]]
                best = min(
                    math.dist(sv, cb[(jj, c)])
                    for (jj, c) in cb
                    if jj == j
                )
                tot += best
        return tot

    assert distortion(trained) <= distortion(seeds) + 1e-6  # Lloyd improves

    codes = pq_encode(
        emb,
        dim=64,
        codebook=spark.createDataFrame(
            [(j, c, list(cv)) for (j, c), cv in trained.items()],
            "j int, code long, cv array<double>",
        ),
    )
    assert codes.count() == emb.count() * 4


def test_ann_pq_topk_probe_first_and_plausible(spark, sf_dir):
    from btrdb_server_spark.functions.similarity import ann_pq_topk, cosine_topk_by_id

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    adc = ann_pq_topk(emb, probe_id=0, m=4, k_codes=8, k=10, dim=64).collect()
    assert len(adc) == 10
    # the probe is its own codebook entry -> ADC distance exactly 0, rank 1
    assert adc[0].vec_id == 0 and adc[0].adc_dist == 0.0
    assert all(adc[i].adc_dist <= adc[i + 1].adc_dist for i in range(9))
    # the exact scan agrees the probe is its own nearest neighbor (an
    # 8-entry codebook is too coarse to promise more overlap than that)
    exact = cosine_topk_by_id(emb, probe_id=0, k=10).collect()
    assert exact[0].vec_id == 0 and 0 in {r.vec_id for r in adc}


def test_duplicate_spans_cross_doc_only(spark):
    """Spans repeated across >=2 docs are reported with occurrence counts;
    a window repeated only WITHIN one doc is not (n_docs >= 2 filter)."""
    from btrdb_server_spark.functions.dedup import duplicate_spans

    shared = "one two three four five six seven eight"
    df = docs_df(
        spark,
        [
            f"{shared} tail-a",
            f"head-b {shared}",
            "w x y z " * 4,  # 16 tokens, repeats only within itself
            "unique words only here nothing repeated at all",
        ],
    )
    out = duplicate_spans(df, w=8).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 0's shared window starts at token 1; doc 1's at token 2
    assert [r.tok_start for r in by_doc[0]] == [1]
    assert [r.tok_start for r in by_doc[1]] == [2]
    assert all(r.n_docs == 2 and r.n_occurrences == 2 for r in by_doc[0])
    # the within-doc repeater and the unique doc contribute nothing
    assert 2 not in by_doc and 3 not in by_doc


def test_dsir_weights_prefer_target_like_docs(spark):
    """Docs made of target-domain tokens score higher than off-domain docs,
    and zero-token docs report NULL weight."""
    from btrdb_server_spark.functions.curation import dsir_weights

    rows = [
        (0, "alpha beta gamma alpha beta", "en"),
        (1, "alpha beta gamma beta alpha", "en"),
        (2, "zebra quux xylo zebra quux", "de"),
        (3, "alpha beta gamma alpha beta", "de"),  # target-like text, raw label
        (4, "", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.doc_id: r for r in dsir_weights(df).collect()}
    assert out[4].n_tokens == 0 and out[4].log_weight is None
    # target-vocabulary docs outscore the off-domain doc regardless of label
    assert out[3].log_weight > out[2].log_weight
    assert out[0].log_weight > out[2].log_weight


def test_hard_negatives_excludes_probe_label(spark):
    from btrdb_server_spark.functions.similarity import hard_negative_topk

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 7),
        (1, [0.99, 0.1, 0.0, 0.0], 7),   # same label: excluded however close
        (2, [0.9, 0.2, 0.0, 0.0], 3),    # closest different-label
        (3, [0.0, 1.0, 0.0, 0.0], 3),
        (4, [-1.0, 0.0, 0.0, 0.0], 5),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = hard_negative_topk(df, probe_id=0, k=2).collect()
    assert [r.vec_id for r in out] == [2, 3]
    assert all(r.label != 7 for r in out)
    # broadcast probe: no driver-side collect -> plan has BroadcastNestedLoop
    plan = hard_negative_topk(df, probe_id=0, k=2)._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_cosine_topk_batch_matches_single(spark, sf_dir):
    """The batched serve must agree with per-probe cosine_topk_by_id for
    every probe in the batch (salted two-phase pruning loses nothing)."""
    from btrdb_server_spark.functions.similarity import (
        cosine_topk_batch,
        cosine_topk_by_id,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    batch = cosine_topk_batch(emb, probe_ids=[0, 3], k=5).collect()
    for pid in (0, 3):
        got = [(r.vec_id, r.cosine) for r in batch if r.probe_id == pid]
        want = [
            (r.vec_id, r.cosine) for r in cosine_topk_by_id(emb, pid, k=5).collect()
        ]
        assert got == want


def test_ivf_multiprobe_recall_dominates_single(spark, sf_dir):
    """nprobe=2 searches a superset of nprobe=1's candidates, so its top-k
    cosine scores dominate elementwise (the recall knob can only help)."""
    from btrdb_server_spark.functions.similarity import (
        ann_topk_ivf,
        ann_topk_ivf_multiprobe,
        centroids_from_rows,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = centroids_from_rows(emb, k=8)
    single = [r.cosine for r in ann_topk_ivf(emb, cents, probe_id=0, k=5).collect()]
    multi = [
        r.cosine
        for r in ann_topk_ivf_multiprobe(
            emb, cents, probe_id=0, k=5, nprobe=2
        ).collect()
    ]
    assert len(multi) == len(single) == 5
    assert all(m >= s for m, s in zip(multi, single))


def test_media_exact_dedup_binary_identity(spark):
    """Byte-identical payloads share a digest group (keeper = min id);
    differing bytes — even same-length — do not."""
    from btrdb_server_spark.functions.multimodal import media_exact_dedup

    media = spark.createDataFrame(
        [
            (0, bytearray(b"\x89PNG-payload-A")),
            (1, bytearray(b"\x89PNG-payload-A")),   # exact copy
            (2, bytearray(b"\x89PNG-payload-B")),   # same length, one byte off
        ],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in media_exact_dedup(media).collect()}
    assert rows[0].digest == rows[1].digest != rows[2].digest
    assert not rows[0].is_dup and rows[1].is_dup and not rows[2].is_dup
    assert rows[1].keeper_id == 0 and rows[1].n_copies == 2
    assert rows[2].n_copies == 1


def test_rowwise_signatures_match_batch(spark, sf_dir):
    """The per-row (streaming-safe) MinHash formulation must be
    bit-identical to the batch groupBy-min path on real testdata."""
    from btrdb_server_spark.functions.dedup import (
        minhash_signatures,
        with_rowwise_signatures,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = [tuple(r) for r in minhash_signatures(docs).orderBy("doc_id").collect()]
    b = [tuple(r) for r in with_rowwise_signatures(docs).orderBy("doc_id").collect()]
    assert a == b and len(a) > 0


def test_ann_recall_eval_bounds_and_dup(spark):
    import random

    from btrdb_server_spark.functions.similarity import ann_recall_eval

    rng = random.Random(7)
    vecs = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(200)]
    vecs.append((200, list(vecs[0][1])))  # exact dup of vec 0
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    planes = hyperplanes(16, planes=4)
    out = {r.probe_id: r for r in
           ann_recall_eval(df, [0, 1, 2], planes, k=5).collect()}
    assert set(out) == {0, 1, 2}
    for r in out.values():
        assert r.n_exact == 5 and 0 <= r.n_hits <= 5
        assert r.recall == r.n_hits / 5
    # probe 0's bucket contains itself and its dup -> at least those two
    # exact top-2 (cosine 1.0) are recalled.
    assert out[0].n_hits >= 2


def test_user_rfm_boundary_scores(spark):
    from btrdb_server_spark.operators.events import user_rfm

    # 5 users, strictly increasing frequency/monetary, decreasing recency.
    rows = []
    eid = 0
    for u in range(1, 6):
        for j in range(u):  # user u has u events
            rows.append((eid, 10 * u + j, u, "click", 1.0 * u)); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, time long, user_id long, event_type string, value double"
    )
    out = {r.user_id: r for r in user_rfm(ev, anchor_end=1000).collect()}
    assert out[5].frequency == 5 and out[5].monetary_q == 5 * 500
    # distinct metric values, 5 users -> scores are a permutation of 1..5
    assert sorted(r.f_score for r in out.values()) == [1, 2, 3, 4, 5]
    assert sorted(r.m_score for r in out.values()) == [1, 2, 3, 4, 5]
    # user 5 is most recent (latest max time) -> best recency score 5
    assert out[5].r_score == 5 and out[1].r_score == 1
    assert out[5].rfm == 555 and out[1].rfm == 111


def test_token_collocations_lift(spark):
    from btrdb_server_spark.functions.text import token_collocations

    # "new york" always together (2x); "the cat"/"the dog" dilute "the".
    docs = spark.createDataFrame(
        [(1, "new york the cat"), (2, "new york the dog")],
        "doc_id long, text string",
    )
    out = {(r.w1, r.w2): r for r in
           token_collocations(docs, min_count=2, top=10).collect()}
    ny = out[("new", "york")]
    # unigrams: new 2, york 2, the 2, cat 1, dog 1 -> n_uni 8
    # bigrams with c>=2: (new,york) 2, (york,the) 2 -> n_bi 4
    assert (ny.c12, ny.c1, ny.c2) == (2, 2, 2)
    assert ny.lift == ((2 * 8.0) * 8.0) / ((4 * 2.0) * 2.0)


def test_corpus_summary_exact(spark):
    from btrdb_server_spark.functions.text import corpus_summary

    docs = spark.createDataFrame(
        [(1, "a b c", "en", "web"), (2, "a b", "en", "books"),
         (3, "d", "fr", "web")],
        "doc_id long, text string, lang string, source string",
    )
    r = corpus_summary(docs).collect()[0]
    assert (r.n_docs, r.n_tokens, r.n_unique_tokens) == (3, 6, 4)
    assert r.mean_tokens == 2.0
    assert (r.total_chars, r.n_langs, r.n_sources) == (5 + 3 + 1, 2, 2)


def test_semantic_dedup_auto_k_scales_with_corpus(spark):
    """With centroids=None, semantic_dedup derives k from ONE corpus count
    (k = max(8, ceil(n / target_cell))) so expected cell size stays
    ~target_cell as the corpus grows — the within-cell verify is quadratic
    in cell size, so fixed k would scale super-linearly (measured 19.7x
    wall at 10x corpus with fixed k=8 vs 6.9x with k scaled). The result
    must equal the explicit-centroids run at the derived k."""
    import math

    from btrdb_server_spark.functions.similarity import (
        centroids_from_rows,
        semantic_dedup,
    )

    n, target = 200, 10
    rows = [(i, [float(i % 7), float((i * 3) % 5), 1.0]) for i in range(n)]
    # plant one exact dup pair inside the same cluster
    rows[150] = (150, rows[143][1])
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    auto = semantic_dedup(emb, threshold=0.999, target_cell=target)
    k = max(8, math.ceil(n / target))
    explicit = semantic_dedup(
        emb, centroids_from_rows(emb, k=k), threshold=0.999
    )
    assert auto.collect() == explicit.collect()
    # derived k really is corpus-sized: clusters observed > the fixed-8 floor
    n_clusters = auto.select("cluster").distinct().count()
    assert n_clusters > 8


def test_semantic_dedup_auto_k_with_non_dense_ids(spark):
    """centroids_from_rows must work for ANY id distribution — the old
    `id < k` filter selected zero seed rows when ids start at 10_000,
    making the default semantic_dedup silently report zero duplicates."""
    from btrdb_server_spark.functions.similarity import semantic_dedup

    import math

    # 120 distinct unit directions 0.05 rad apart (adjacent cosine
    # cos(0.05) ~ 0.99875, below the 0.999 bar) plus ONE planted exact
    # duplicate. No constant third component — it would compress angular
    # distance (cosine becomes (1 + cos d)/2, putting neighbors over the
    # bar).
    rows = [
        (10_000 + 7 * i, [math.cos(0.05 * i), math.sin(0.05 * i), 0.0])
        for i in range(120)
    ]
    rows[60] = (10_000 + 7 * 60, rows[33][1])  # plant one exact duplicate
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = semantic_dedup(emb, threshold=0.999, target_cell=15)
    dups = [r.vec_id for r in got.collect() if r.is_dup]
    assert dups == [10_000 + 7 * 60]


# ---------------------------------------------------------------- r9 ops --


def _li_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "l_returnflag string, l_linestatus string, l_quantity double, "
        "l_extendedprice double, l_discount double, l_partkey long",
    )


def test_cube_report_grouping_sets(spark):
    """One CUBE pass emits detail rows (gid=0), both one-dim rollups
    (gid=1,2) and the grand total (gid=3), with exact integer money."""
    from btrdb_server_spark.operators.olap import cube_report

    li = _li_df(
        spark,
        [
            ("A", "F", 2.0, 100.00, 0.10, 1),
            ("A", "O", 3.0, 200.00, 0.00, 1),
            ("N", "F", 5.0, 50.00, 0.50, 1),
        ],
    )
    rows = {(r.gid, r.l_returnflag, r.l_linestatus): r for r in cube_report(li).collect()}
    assert len(rows) == 3 + 2 + 2 + 1  # detail + rf-rollup + ls-rollup + total
    total = rows[(3, None, None)]
    assert total.n_items == 3 and total.sum_qty == 10
    assert abs(total.sum_disc_price - (90.0 + 200.0 + 25.0)) < 1e-9
    a_roll = rows[(1, "A", None)]
    assert a_roll.n_items == 2 and a_roll.sum_qty == 5


def test_join_skew_audit_flags_hot_key(spark):
    from btrdb_server_spark.operators.olap import join_skew_audit

    li = _li_df(
        spark,
        [("A", "F", 1.0, 1.0, 0.0, 7)] * 8
        + [("A", "F", 1.0, 1.0, 0.0, 1), ("A", "F", 1.0, 1.0, 0.0, 2)],
    )
    top = join_skew_audit(li, top=2).collect()
    assert top[0].l_partkey == 7 and top[0].cnt == 8
    assert abs(top[0].share - 0.8) < 1e-12
    # 3 distinct keys, mean weight 10/3 -> hot key is 8/(10/3) = 2.4x mean
    assert abs(top[0].skew_vs_mean - 2.4) < 1e-12


def test_sorted_neighborhood_pairs_blocking(spark):
    """Prefix-near docs in the same block pair up; a high-Jaccard doc whose
    prefix lands in ANOTHER block is never compared (the documented
    blocking recall trade)."""
    from btrdb_server_spark.functions.dedup import sorted_neighborhood_pairs

    a = "alpha beta gamma delta epsilon zeta eta theta"
    b = "alpha beta gamma delta epsilon zeta eta iota"    # same prefix block
    c = "zzz alpha beta gamma delta epsilon zeta eta"      # same tokens, other block
    d = "totally different words about nothing shared here at all"
    df = docs_df(spark, [a, b, c, d])
    pairs = {(r.a, r.b): r.jaccard for r in sorted_neighborhood_pairs(df).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] >= 0.7
    assert not any(2 in p for p in pairs)  # cross-block: never a candidate


def test_winnowing_fingerprints_profile(spark):
    """Window-min fingerprinting: identical docs get identical profiles,
    density tracks the 2/(w+1) expectation loosely, and sub-k docs emit the
    documented zero/NULL profile."""
    from btrdb_server_spark.functions.text import winnowing_fingerprints

    long = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest tonight")
    df = docs_df(spark, [long, long, "ab cd"])
    rows = {r.doc_id: r for r in winnowing_fingerprints(df).collect()}
    r0, r1, r2 = rows[0], rows[1], rows[2]
    # k=3, w=4: n_grams = tokens-2, n_windows = n_grams-3
    n_toks = len(long.split())
    assert r0.n_grams == n_toks - 2 and r0.n_windows == r0.n_grams - 3
    assert 0 < r0.n_fps <= r0.n_windows
    assert (r0.n_fps, r0.fp_min, r0.fp_max) == (r1.n_fps, r1.fp_min, r1.fp_max)
    assert r2.n_grams == 0 and r2.n_windows == 0 and r2.n_fps == 0
    assert r2.fp_density is None and r2.fp_min is None


def test_snm_recall_eval_counts_block_boundary_misses(spark):
    """The audit must charge SNM for true pairs its blocking can never
    see: four docs all pairwise at exact Jaccard 0.5 (= threshold), but
    only one pair shares a block prefix — recall is exactly 1/6."""
    from btrdb_server_spark.functions.dedup import snm_recall_eval

    df = docs_df(
        spark,
        [
            "alpha beta gamma delta epsilon",
            "alpha beta gamma delta zeta",
            "zzz alpha beta gamma delta",
            "yyy alpha beta gamma delta",
        ],
    )
    r = snm_recall_eval(df).collect()[0]
    assert (r.n_truth, r.n_candidates, r.n_hits) == (6, 1, 1)
    assert abs(r.recall - 1 / 6) < 1e-12 and r.precision == 1.0


def test_incremental_dedup_against_persisted_index(spark, tmp_path):
    """The persisted-index path finds the same cross-side near-dups as the
    one-shot estimate pipeline: index the base corpus, probe with a
    snapshot containing one near-dup of a base doc and one novel doc."""
    from btrdb_server_spark.functions.dedup import (
        incremental_dedup_pairs,
        lsh_index_build,
        minhash_jaccard_est,
    )

    base_texts = [
        BASE,
        "completely different words about spark dataframes and parquet files here",
    ]
    near = BASE.replace("lazy", "sleepy")
    base = docs_df(spark, base_texts)
    snapshot = spark.createDataFrame(
        [(100, near), (101, "unrelated short text with nothing in common at all ok")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "lsh_index")
    # bands of 2 rows, as in test_minhash_lsh_finds_near_dups: a ~0.6-Jaccard
    # pair reliably collides on at least one band.
    lsh_index_build(base, idx, bands=8)
    got = incremental_dedup_pairs(snapshot, idx, est_threshold=0.25).collect()
    assert [(r.new_id, r.match_id) for r in got] == [(100, 0)]
    r = got[0]
    assert r.est_jaccard == r.matches / 16.0 and r.est_jaccard >= 0.25

    # cross-check against the one-shot estimator over the union corpus:
    # every incremental pair must appear with the SAME match count.
    union = base.unionByName(snapshot)
    est = {
        (r.a, r.b): r.matches
        for r in minhash_jaccard_est(union, bands=8).collect()
    }
    for r in got:
        assert est[(r.match_id, r.new_id)] == r.matches

    # index append keeps the corpus current: after folding the snapshot's
    # own rows in (mode="append"), the NEXT snapshot matches both the
    # original base doc and the just-appended near-dup (identical text ->
    # identical signature -> est 1.0).
    lsh_index_build(snapshot, idx, bands=8, mode="append")
    probe2 = spark.createDataFrame([(200, near)], "doc_id long, text string")
    got2 = {
        (r.new_id, r.match_id): r.est_jaccard
        for r in incremental_dedup_pairs(
            probe2, idx, est_threshold=0.25
        ).collect()
    }
    assert set(got2) == {(200, 0), (200, 100)}
    assert got2[(200, 100)] == 1.0


def test_incremental_dedup_probe_side_broadcasts(spark, tmp_path):
    """Scale contract: the snapshot (small) side is broadcast — the index
    scan is probed in place, never shuffled into a sort-merge join."""
    from btrdb_server_spark.functions.dedup import (
        incremental_dedup_pairs,
        lsh_index_build,
    )

    base = docs_df(spark, [BASE, BASE.replace("fox", "wolf")])
    idx = str(tmp_path / "lsh_index_plan")
    lsh_index_build(base, idx)
    snapshot = spark.createDataFrame(
        [(100, BASE.replace("lazy", "sleepy"))], "doc_id long, text string"
    )
    plan = (
        incremental_dedup_pairs(snapshot, idx)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pairwise_cos_kernel_bit_equal_to_jvm_fold(spark):
    """The Arrow pair kernel (_pairwise_cos_pandas) must produce cosine
    values BIT-identical to the JVM _dot/_norm expression chain it
    replaced (same left fold, same 0.0 seed, same multiply-then-divide):
    the semantic_dedup / knn_graph / near_dup oracles compare floats by
    value hash, so even a last-ulp association difference would fail."""
    import random
    import struct

    from pyspark.sql import functions as F

    from btrdb_server_spark.functions.similarity import (
        _PAIR_COS_SCHEMA,
        _dot,
        _norm,
        _pairwise_cos_pandas,
    )

    rng = random.Random(7)
    d = 17  # odd, non-power-of-two on purpose
    rows = [
        (i, i % 3, [rng.uniform(-2, 2) * 10 ** rng.randint(-3, 3) for _ in range(d)])
        for i in range(60)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, cluster int, v array<double>"
    )
    got = {
        (r["a"], r["b"]): r["cos_raw"]
        for r in emb.groupBy("cluster")
        .applyInPandas(_pairwise_cos_pandas("vec_id", directed=False), _PAIR_COS_SCHEMA)
        .collect()
    }
    l, r = emb.alias("l"), emb.alias("r")
    want = {
        (row["a"], row["b"]): row["c"]
        for row in l.join(
            r,
            (F.col("l.cluster") == F.col("r.cluster"))
            & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .select(
            F.col("l.vec_id").alias("a"),
            F.col("r.vec_id").alias("b"),
            (
                _dot(F.col("l.v"), F.col("r.v"))
                / (_norm(F.col("l.v")) * _norm(F.col("r.v")))
            ).alias("c"),
        )
        .collect()
    }
    assert set(got) == set(want) and len(got) > 500
    for key in want:
        assert struct.pack("<d", got[key]) == struct.pack("<d", want[key]), key
