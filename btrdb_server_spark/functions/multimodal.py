"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, Arrow batch shapes,
mapInPandas partition-parallel decode, deterministic partitioning — while the
actual media decoding is STUBBED (image/audio libraries are not available in
this environment): `decode_media(..., fake=True)` derives deterministic
pseudo-metadata from the bytes; `fake=False` raises NotImplementedError at
the exact point a real decoder (PIL/libav) would plug in.

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


def decode_media(media: DataFrame, fake: bool = True) -> DataFrame:
    """Partition-parallel decode via mapInPandas (Arrow-batched; the bytes
    never pass through Python row-by-row)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decoding requires PIL/soundfile/av; "
                    "run with fake=True in this environment"
                )
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
