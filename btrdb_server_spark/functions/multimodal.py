"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, Arrow batch shapes,
mapInPandas partition-parallel decode, deterministic partitioning. Two
decode modes:

- `decode_media(..., fake=True)`: deterministic pseudo-metadata derived
  from the content hash — lets the full pipeline (including oracles over
  the documents-derived media table, whose payloads are text bytes, not
  media containers) run anywhere.
- `fake=False`: REAL container-metadata decoding. The schema's fields
  (width/height/n_frames/sample_rate) are header metadata, so the decoder
  parses PNG / GIF / BMP / JPEG image headers and RIFF/WAV audio with the
  stdlib — no external codec needed; if PIL is importable it is used as a
  fallback for image formats the header parser doesn't know. Payloads in
  no known container format yield NULL dimensions (not an error).
  Pixel-level transforms (actual resampling, frame extraction) would need
  PIL/libav and plug into the same mapInPandas seam.

At 100 TB: binary payloads ride in their own parquet column (column pruning
means metadata-only queries never touch the bytes); decode fans out via
mapInPandas with Arrow batches sized by spark.sql.execution.arrow
.maxRecordsPerBatch, and the output is a normal columnar table ready for
feature joins.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)


def _fake_decode_row(media_id: int, kind: str, payload: bytes) -> dict:
    """Deterministic pseudo-decode: dimensions derived from the content hash.
    Replace with PIL/soundfile/av calls in a real deployment."""
    digest = hashlib.sha256(payload or b"").hexdigest()
    h = int(digest[:8], 16)
    out = dict(
        media_id=media_id,
        kind=kind,
        n_bytes=len(payload or b""),
        sha256=digest,
        width=None,
        height=None,
        n_frames=None,
        sample_rate=None,
    )
    if kind == "image":
        out.update(width=64 + h % 1920, height=64 + (h >> 8) % 1080, n_frames=1)
    elif kind == "video":
        out.update(width=64 + h % 1920, height=64 + (h >> 8) % 1080, n_frames=1 + h % 3600)
    elif kind == "audio":
        out.update(sample_rate=8000 + (h % 6) * 8000, n_frames=1 + h % 10_000_000)
    return out


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from the documents corpus: the
    text's UTF-8 bytes stand in for an opaque payload, kind cycles
    image/audio/video by id. Exercises the full binary-column path (schema,
    Arrow transfer, mapInPandas decode) on real testdata without shipping
    media files."""
    from pyspark.sql import functions as F

    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(kinds, (F.col("doc_id") % 3 + 1).cast("int")).alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.create_map(F.lit("origin"), F.lit("documents")).alias("meta"),
    )


def media_exact_dedup(
    media: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Exact dedup of opaque binary payloads by SHA-256 digest — the
    content-addressable identity pass a multimodal pipeline runs BEFORE
    any decode (one JVM-side digest per object, no Python, no codec).
    keeper = smallest id per digest. Output per media object:
    (media_id, digest, keeper_id, n_copies, is_dup).

    Scale shape: one map-side digest projection, one groupBy(digest)
    min/count aggregate (map-side combined), joined back on the digest —
    the payload bytes themselves are read once and never shuffled."""
    from pyspark.sql import functions as F

    h = media.select(
        F.col(id_col), F.sha2(F.col(payload_col), 256).alias("digest")
    )
    g = h.groupBy("digest").agg(
        F.min(id_col).alias("keeper_id"), F.count("*").alias("n_copies")
    )
    return (
        h.join(g, "digest")
        .select(
            id_col,
            "digest",
            "keeper_id",
            F.col("n_copies").cast("long").alias("n_copies"),
            (F.col(id_col) != F.col("keeper_id")).alias("is_dup"),
        )
        .orderBy(id_col)
    )


def _parse_image_header(p: bytes) -> tuple | None:
    """(width, height) from PNG/GIF/BMP/JPEG container headers — the real
    metadata a training pipeline filters on, parsed with the stdlib."""
    import struct

    if len(p) >= 24 and p[:8] == b"\x89PNG\r\n\x1a\n" and p[12:16] == b"IHDR":
        w, h = struct.unpack(">II", p[16:24])
        return w, h
    if len(p) >= 10 and p[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", p[6:10])
        return w, h
    if len(p) >= 26 and p[:2] == b"BM":
        w, h = struct.unpack("<ii", p[18:26])
        return abs(w), abs(h)
    if len(p) >= 4 and p[:2] == b"\xff\xd8":  # JPEG: scan for a SOF marker
        i = 2
        while i + 9 < len(p):
            if p[i] != 0xFF:
                i += 1
                continue
            marker = p[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seglen = struct.unpack(">H", p[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", p[i + 5 : i + 9])
                return w, h
            i += 2 + seglen
    return None


def _parse_wav_header(p: bytes) -> tuple | None:
    """(sample_rate, n_frames) from a RIFF/WAVE container."""
    import struct

    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return None
    i, rate, frame_bytes, data_len = 12, None, None, None
    while i + 8 <= len(p):
        cid, clen = p[i : i + 4], struct.unpack("<I", p[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 8 + 16 <= len(p):
            _, n_ch, rate, _, block_align, _ = struct.unpack(
                "<HHIIHH", p[i + 8 : i + 24]
            )
            frame_bytes = block_align or None
        elif cid == b"data":
            data_len = clen
        i += 8 + clen + (clen & 1)
    if rate is None:
        return None
    n_frames = (data_len // frame_bytes) if (data_len and frame_bytes) else None
    return rate, n_frames


def _real_decode_row(media_id, kind: str, payload: bytes, digest: str) -> dict:
    out = dict(
        media_id=media_id,
        kind=kind,
        n_bytes=len(payload),
        sha256=digest,
        width=None,
        height=None,
        n_frames=None,
        sample_rate=None,
    )
    if kind in ("image", "video"):
        dims = _parse_image_header(payload)
        if dims is None:
            try:  # optional richer fallback when PIL is installed
                import io

                from PIL import Image  # type: ignore[import-not-found]

                with Image.open(io.BytesIO(payload)) as im:
                    dims = im.size
                    out["n_frames"] = getattr(im, "n_frames", 1)
            except Exception:  # noqa: BLE001 — no PIL / not an image
                dims = None
        if dims is not None:
            out["width"], out["height"] = int(dims[0]), int(dims[1])
            if out["n_frames"] is None:
                out["n_frames"] = 1
    elif kind == "audio":
        wav = _parse_wav_header(payload)
        if wav is not None:
            out["sample_rate"] = int(wav[0])
            out["n_frames"] = None if wav[1] is None else int(wav[1])
    return out


def decode_media(media: DataFrame, fake: bool = True) -> DataFrame:
    """Partition-parallel decode via mapInPandas (Arrow-batched; the bytes
    never pass through Python row-by-row). fake=False parses real container
    headers (see module docstring); unknown formats yield NULL dims."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not fake:
                rows = [
                    _real_decode_row(
                        mid,
                        kind,
                        p := (payload if payload is not None else b""),
                        hashlib.sha256(p).hexdigest(),
                    )
                    for mid, kind, payload in zip(
                        pdf["media_id"], pdf["kind"], pdf["payload"]
                    )
                ]
                out = pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA])
                for c in ("width", "height", "n_frames", "sample_rate"):
                    out[c] = pd.array(out[c], dtype="Int32")
                yield out
                continue
            # Column-at-a-time: the only per-row Python work is the digest
            # itself (inherently per-payload); everything downstream is numpy.
            payloads = [p if p is not None else b"" for p in pdf["payload"]]
            digests = [hashlib.sha256(p).hexdigest() for p in payloads]
            h = np.array([int(d[:8], 16) for d in digests], dtype=np.int64)
            kind = pdf["kind"].to_numpy()
            visual = (kind == "image") | (kind == "video")
            audio = kind == "audio"
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": kind,
                    "n_bytes": np.fromiter(
                        (len(p) for p in payloads), dtype=np.int64, count=len(payloads)
                    ),
                    "sha256": digests,
                    "width": pd.array(
                        np.where(visual, 64 + h % 1920, 0), dtype="Int32"
                    ),
                    "height": pd.array(
                        np.where(visual, 64 + (h >> 8) % 1080, 0), dtype="Int32"
                    ),
                    "n_frames": pd.array(
                        np.select(
                            [kind == "image", kind == "video", audio],
                            [np.ones_like(h), 1 + h % 3600, 1 + h % 10_000_000],
                            0,
                        ),
                        dtype="Int32",
                    ),
                    "sample_rate": pd.array(
                        np.where(audio, 8000 + (h % 6) * 8000, 0), dtype="Int32"
                    ),
                }
            )
            out.loc[~visual, ["width", "height"]] = pd.NA
            out.loc[~(visual | audio), "n_frames"] = pd.NA
            out.loc[~audio, "sample_rate"] = pd.NA
            yield out

    return media.mapInPandas(decode, DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled frame
    index (pure relational explode — the real decoder would attach pixels)."""
    from pyspark.sql import functions as F

    vids = decoded.where((F.col("kind") == "video") & F.col("n_frames").isNotNull())
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


def resize_plan(decoded: DataFrame, max_side: int = 224) -> DataFrame:
    """Resize geometry (aspect-preserving fit into max_side^2) computed
    relationally; a real pipeline feeds these targets to the decoder UDF."""
    from pyspark.sql import functions as F

    imgs = decoded.where(F.col("width").isNotNull())
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return imgs.select(
        "media_id",
        "width",
        "height",
        F.greatest(F.round(F.col("width") * scale).cast("int"), F.lit(1)).alias("out_w"),
        F.greatest(F.round(F.col("height") * scale).cast("int"), F.lit(1)).alias("out_h"),
    )


BYTE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("n_distinct_bytes", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("printable_ratio", T.DoubleType()),
        T.StructField("byte_entropy", T.DoubleType()),
    ]
)


def media_features(
    media: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Byte-statistics feature extraction over opaque binary payloads — the
    feature-extract stage of the multimodal pipeline, and unlike the codec
    it needs no external library: byte histogram -> distinct-byte count,
    exact mean byte, printable-ASCII ratio, and Shannon entropy in
    bits/byte. These are the standard cheap screens for corrupt,
    double-compressed, or mislabeled media objects (a 'text' payload at
    7.9 bits/byte is ciphertext or already-compressed data).

    Scale shape: one Arrow-batched mapInPandas pass; per payload the work
    is a numpy bincount (no per-byte Python). Determinism contract: the
    integer histogram is exact; mean and ratio are single divisions of
    integer sums; the entropy is a LEFT FOLD of -(p*log2(p)) over bytes in
    ASCENDING value order from a 0.0 accumulator, so the DuckDB oracle's
    list_reduce over the same ordered term list reproduces every double
    bit-for-bit (libm log2 on both engines). Empty payloads yield NULL
    mean/ratio/entropy and n_distinct_bytes = 0."""
    import math

    from pyspark.sql import functions as F

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, nb, nd, mb, pr, be = [], [], [], [], [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                b = np.frombuffer(p if p is not None else b"", dtype=np.uint8)
                n = int(b.size)
                ids.append(mid)
                nb.append(n)
                if n == 0:
                    nd.append(0)
                    mb.append(None)
                    pr.append(None)
                    be.append(None)
                    continue
                cnt = np.bincount(b, minlength=256).astype(np.int64)
                nz = np.nonzero(cnt)[0]
                nd.append(int(nz.size))
                mb.append(float(int(b.sum(dtype=np.int64))) / float(n))
                pr.append(float(int(cnt[32:127].sum())) / float(n))
                acc = 0.0
                for v in nz:  # ascending byte value = the pinned fold order
                    pv = float(int(cnt[v])) / float(n)
                    acc = acc + (-(pv * math.log2(pv)))
                be.append(acc)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_bytes": pd.array(nb, dtype="int64"),
                    "n_distinct_bytes": pd.array(nd, dtype="Int32"),
                    "mean_byte": pd.array(mb, dtype="float64"),
                    "printable_ratio": pd.array(pr, dtype="float64"),
                    "byte_entropy": pd.array(be, dtype="float64"),
                }
            )

    return media.select(
        F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload")
    ).mapInPandas(extract, BYTE_FEATURES_SCHEMA)
