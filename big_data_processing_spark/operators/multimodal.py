"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas transforms over ``mapInPandas`` — the Spark-native
pattern for per-blob Python work (one JVM→Arrow→pandas hop per batch,
never per row).

The actual codec step is STUBBED (this container ships no image/audio
libraries): :func:`decode_stub_features` computes deterministic fake
"features" from the raw bytes so the Spark-side plumbing — schema,
batching, partition sizing — is real and testable, and the codec can be
swapped in by replacing one function.

Scale notes: blobs dominate partition size, so re-partition by
``maxRecordsPerFile``-style row budgets, not bytes of the metadata;
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds pandas memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .util import spread

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("meta_source", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum32", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def text_as_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Adapter: wrap a text column as a binary media payload (the
    testdata has no real blobs; this exercises the binary pathway)."""
    return spread(df, id_col, cap=8).select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.col("source").alias("meta_source"),
    )


def decode_stub_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB decoder: real pipelines replace this body with PIL/ffmpeg.

    Emits a deterministic 4-dim "feature" derived from payload bytes so
    downstream operators (similarity, dedup) can be tested end-to-end.
    """
    for pdf in batches:
        out = pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "checksum32": pdf["payload"]
                .map(lambda b: sum(b[:64]) % (1 << 32))
                .astype("int64"),
                "feature": pdf["payload"].map(
                    lambda b: [
                        float(len(b)),
                        float(b[0]) if len(b) else 0.0,
                        float(b[-1]) if len(b) else 0.0,
                        float(sum(b[:16]) % 255),
                    ]
                ),
            }
        )
        yield out


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payloads."""
    return media.mapInPandas(decode_stub_features, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def resize_stub(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """STUB resize: real pipelines decode + rescale with PIL/ffmpeg;
    the stub deterministically truncates/pads the payload to
    width*height bytes so output sizing, schema, and batching are real.
    Payload size changes per row — exactly the case where Arrow batch
    limits (session arrow.maxRecordsPerBatch) matter at scale."""
    target = width * height

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].map(
                lambda b: bytes(b[:target]).ljust(target, b"\0")
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": resized,
                    "width": width,
                    "height": height,
                    "n_bytes": resized.map(len).astype("int64"),
                }
            )

    return media.mapInPandas(fn, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def frame_sample_stub(
    media: DataFrame, frame_bytes: int = 32, every_n: int = 4
) -> DataFrame:
    """STUB frame sampling: treats the payload as a 'video' of
    frame_bytes-sized frames and emits every Nth — a 1→N mapInPandas
    (one input row fans out to many frame rows), the shape a real
    ffmpeg keyframe sampler produces. Output row count is
    data-dependent, which is why this is mapInPandas and not a UDF."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames = [
                    payload[i : i + frame_bytes]
                    for i in range(0, len(payload), frame_bytes)
                ]
                sampled = frames[::every_n]
                out.extend(
                    (int(mid), int(j * every_n), bytes(fr), len(frames))
                    for j, fr in enumerate(sampled)
                )
            if out:
                yield pd.DataFrame(
                    out, columns=["media_id", "frame_idx", "frame", "n_frames"]
                )

    return media.mapInPandas(fn, schema=FRAME_SCHEMA)
