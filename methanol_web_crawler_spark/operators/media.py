"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video content rides as ``binary`` columns with a typed
metadata struct. The Spark-side plumbing — schema, partitioning, UDF
signature, Arrow batch shape — is real and tested; the actual codec
work is stubbed (the decode libraries are not in this container):
``decode_media`` raises NotImplementedError unless
``deterministic_fake=True``, which produces seeded fake features so
the pipeline shape can be exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("byte_len", T.LongType()),
        T.StructField("sha1", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("sha1", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def media_metadata(df: DataFrame, ref_col: str, payload_col: str) -> DataFrame:
    """Typed metadata over opaque binary payloads — pure JVM
    expressions (length, sha1, extension-derived type)."""
    ext = F.lower(F.element_at(F.split(F.col(ref_col), "\\."), -1))
    media_type = (
        F.when(ext.isin("png", "jpg", "jpeg", "gif", "webp"), "image")
        .when(ext.isin("mp3", "ogg", "wav", "flac"), "audio")
        .when(ext.isin("mp4", "webm", "avi", "mov"), "video")
        .otherwise("unknown")
    )
    return df.select(
        F.col(ref_col).alias("media_ref"),
        F.struct(
            media_type.alias("media_type"),
            F.length(F.col(payload_col)).cast("long").alias("byte_len"),
            F.sha1(F.col(payload_col)).alias("sha1"),
        ).alias("meta"),
    )


def decode_media(
    df: DataFrame,
    ref_col: str,
    payload_col: str,
    deterministic_fake: bool = False,
    feature_dim: int = 8,
) -> DataFrame:
    """Decode / feature-extract media payloads via mapInPandas.

    STUB: real decoding (image resize, audio resample, video frame
    sampling) needs codec libraries absent from this container. With
    ``deterministic_fake`` the features are a seeded hash-derived
    vector — the Arrow batch plumbing, schema and partitioning are the
    real thing.
    """

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            refs, types_, lens, sha1s, feats = [], [], [], [], []
            for ref, payload in zip(pdf[ref_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                digest = hashlib.sha1(data).hexdigest()
                ext = ref.rsplit(".", 1)[-1].lower() if "." in ref else ""
                mtype = (
                    "image" if ext in ("png", "jpg", "jpeg", "gif", "webp")
                    else "audio" if ext in ("mp3", "ogg", "wav", "flac")
                    else "video" if ext in ("mp4", "webm", "avi", "mov")
                    else "unknown"
                )
                if not deterministic_fake:
                    raise NotImplementedError(
                        "media codecs unavailable in this container; "
                        "pass deterministic_fake=True to exercise the "
                        "pipeline plumbing"
                    )
                seed = int(digest[:8], 16)
                feats.append(
                    [((seed >> (i * 3)) % 997) / 997.0
                     for i in range(feature_dim)]
                )
                refs.append(ref)
                types_.append(mtype)
                lens.append(len(data))
                sha1s.append(digest)
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "media_type": types_,
                    "byte_len": lens,
                    "sha1": sha1s,
                    "features": feats,
                }
            )

    # partition by media_ref so one ref's batches land together —
    # the shape a real decode stage needs for cache locality
    return df.repartition(F.col(ref_col)).mapInPandas(
        decode, FEATURE_SCHEMA
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    ref_col: str,
    payload_col: str,
    width: int = 224,
    height: int = 224,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Resize image payloads to a fixed shape via mapInPandas.

    STUB like decode_media: the real pixel work needs an image codec
    absent from this container. ``deterministic_fake`` emits a
    payload of exactly width*height bytes derived from the source
    sha1 (seeded, reproducible), so batch shape, output schema and
    size accounting are exercised for real."""

    def resize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            refs, ws, hs, outs = [], [], [], []
            for ref, payload in zip(pdf[ref_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                if not deterministic_fake:
                    raise NotImplementedError(
                        "image codecs unavailable in this container; "
                        "pass deterministic_fake=True to exercise the "
                        "pipeline plumbing"
                    )
                digest = hashlib.sha1(data).digest()
                reps = (width * height) // len(digest) + 1
                outs.append((digest * reps)[: width * height])
                refs.append(ref)
                ws.append(width)
                hs.append(height)
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                    "payload": outs,
                }
            )

    return df.repartition(F.col(ref_col)).mapInPandas(
        resize, RESIZE_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("frame_ix", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    ref_col: str,
    payload_col: str,
    every_ms: int = 1000,
    max_frames: int = 8,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Sample frames from video payloads via mapInPandas — the
    one-row-in / many-rows-out shape (each video explodes into up to
    ``max_frames`` frame rows with timestamps), which is why this is
    mapInPandas and not a scalar pandas_udf.

    STUB: real demuxing needs video codecs. ``deterministic_fake``
    treats the payload as `max_frames` equal byte slices — the fan-out
    row accounting, schema and per-ref partitioning are real."""

    def sample(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            refs, ixs, tss, frames = [], [], [], []
            for ref, payload in zip(pdf[ref_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                if not deterministic_fake:
                    raise NotImplementedError(
                        "video codecs unavailable in this container; "
                        "pass deterministic_fake=True to exercise the "
                        "pipeline plumbing"
                    )
                n = min(max_frames, max(1, len(data)))
                step = max(1, len(data) // n)
                for i in range(n):
                    refs.append(ref)
                    ixs.append(i)
                    tss.append(i * every_ms)
                    frames.append(data[i * step:(i + 1) * step])
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "frame_ix": pd.array(ixs, dtype="int32"),
                    "ts_ms": pd.array(tss, dtype="int64"),
                    "frame": frames,
                }
            )

    return df.repartition(F.col(ref_col)).mapInPandas(
        sample, FRAME_SCHEMA
    )
