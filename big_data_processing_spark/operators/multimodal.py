"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas transforms over ``mapInPandas`` — the Spark-native
pattern for per-blob Python work (one JVM→Arrow→pandas hop per batch,
never per row).

PNG image decode, nearest-neighbor resize, PCM WAV audio decode, APNG
frame sampling, uncompressed-AVI video decode, and JPEG header
geometry are REAL (operators/mediacodec.py — pure stdlib
zlib/struct/wave + numpy, no PIL/ffmpeg needed):
:func:`extract_image_features` parses actual pixels,
:func:`resize_images` re-encodes a genuinely resampled PNG,
:func:`sample_video_frames` walks a real RIFF container, and
:func:`extract_jpeg_header_features` recovers true JPEG geometry from
the SOF marker. JPEG *pixel* decode rides behind an OPTIONAL PIL
import (:func:`extract_jpeg_pixel_stats`); only compressed video
codecs remain labeled stubs (:func:`decode_stub_features` /
:func:`frame_sample_stub`).

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


def extract_features(
    media: DataFrame, carry_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Arrow-batched feature extraction over the binary payloads.

    ``carry_cols`` names metadata columns of ``media`` (e.g.
    ``meta_source``) to pass through the Arrow hop untouched, appended
    after the feature columns — so ONE decode pass can feed both a
    per-media feature consumer and a metadata-grain rollup without a
    join back to the media frame (r12: the merged
    multimodal_stub_features entry aggregates its source arm off the
    same pass the doc arm reads)."""
    if not carry_cols:
        return media.mapInPandas(decode_stub_features, schema=FEATURE_SCHEMA)
    schema = T.StructType(
        FEATURE_SCHEMA.fields + [media.schema[c] for c in carry_cols]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = next(decode_stub_features(iter([pdf])))
            for c in carry_cols:  # same row order as the decode output
                out[c] = pdf[c]
            yield out

    return media.mapInPandas(fn, schema=schema)


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


# ---------------------------------------------------------------------------
# Real codecs (operators/mediacodec.py — stdlib zlib/struct/wave + numpy)
# ---------------------------------------------------------------------------

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
    ]
)


def synthesize_png_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic RGB PNG fixture per id: size (4 + id%5) x (3 +
    id%4), pixel byte i = (i + id) % 256, encoded through the REAL PNG
    writer (cycling scanline filters 0/1/2). The closed-form pixel rule
    is what lets a SQL oracle verify the decoded stats without being
    able to decode PNG itself."""
    from .mediacodec import encode_png

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf[id_col]:
                mid = int(mid)
                w, h = 4 + mid % 5, 3 + mid % 4
                raw = bytes((i + mid) % 256 for i in range(w * h * 3))
                out.append((mid, encode_png(w, h, 3, raw)))
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    return spread(ids.select(id_col), id_col, cap=8).mapInPandas(
        fn,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


def extract_image_features(media: DataFrame) -> DataFrame:
    """REAL image decode over Arrow batches: parse the PNG, undo the
    scanline filters, and emit true dimensions + exact per-channel
    means (integer byte sums / pixel count — deterministic doubles).
    Non-PNG payloads raise MediaCodecError; keep them out of the input
    or route through decode_stub_features."""
    from .mediacodec import decode_png

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, ch, raw = decode_png(bytes(payload))
                n = w * h
                sums = [0, 0, 0]
                for c in range(min(ch, 3)):
                    sums[c] = sum(raw[c :: ch][: n * 1]) if ch else 0
                out.append(
                    (
                        int(mid),
                        w,
                        h,
                        ch,
                        sums[0] / n,
                        sums[1] / n if ch >= 2 else None,
                        sums[2] / n if ch >= 3 else None,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "channels",
                    "mean_r",
                    "mean_g",
                    "mean_b",
                ],
            )

    return media.mapInPandas(fn, schema=IMAGE_FEATURE_SCHEMA)


def resize_images(media: DataFrame, out_w: int = 4, out_h: int = 3) -> DataFrame:
    """REAL resize: decode PNG → nearest-neighbor resample (numpy
    gather) → re-encode PNG. Output payloads are valid PNGs of the
    target geometry — verified by decoding them again in tests."""
    from .mediacodec import decode_png, encode_png, resize_nearest

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, ch, raw = decode_png(bytes(payload))
                resized = resize_nearest(w, h, ch, raw, out_w, out_h)
                out.append(
                    (int(mid), encode_png(out_w, out_h, ch, resized), out_w, out_h)
                )
            yield pd.DataFrame(
                out, columns=["media_id", "payload", "width", "height"]
            )

    return media.mapInPandas(
        fn,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
                T.StructField("width", T.IntegerType()),
                T.StructField("height", T.IntegerType()),
            ]
        ),
    )


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("mean_sample", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def synthesize_wav_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic PCM16 mono WAV fixture per id: n = 64 + id%64
    samples, sample j = ((j*31 + id*7) % 65536) - 32768, through the
    real stdlib wave writer — same closed-form-oracle pattern as
    synthesize_png_media."""
    from .mediacodec import encode_wav_pcm16

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf[id_col]:
                mid = int(mid)
                n = 64 + mid % 64
                samples = [((j * 31 + mid * 7) % 65536) - 32768 for j in range(n)]
                out.append((mid, encode_wav_pcm16(samples)))
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    return spread(ids.select(id_col), id_col, cap=8).mapInPandas(
        fn,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


def extract_audio_features(media: DataFrame) -> DataFrame:
    """REAL audio decode (stdlib wave): true sample rate, count, exact
    mean (integer sum / count) and absolute peak per payload."""
    from .mediacodec import decode_wav_pcm16

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, _ch, samples = decode_wav_pcm16(bytes(payload))
                n = len(samples)
                out.append(
                    (
                        int(mid),
                        rate,
                        n,
                        sum(samples) / n if n else None,
                        max(abs(s) for s in samples) if n else None,
                    )
                )
            yield pd.DataFrame(
                out, columns=["media_id", "rate", "n_samples", "mean_sample", "peak"]
            )

    return media.mapInPandas(fn, schema=AUDIO_FEATURE_SCHEMA)


FRAME_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)


def synthesize_apng_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic animated-PNG fixture per id: (3 + id%4) x
    (2 + id%3) RGB, 4 + id%5 frames, frame f pixel byte i =
    (i + id + 97*f) % 256 — through the real APNG writer (acTL/fcTL/
    IDAT/fdAT chunk sequencing), same closed-form-oracle pattern as the
    still-image fixtures."""
    from .mediacodec import encode_apng

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf[id_col]:
                mid = int(mid)
                w, h, nf = 3 + mid % 4, 2 + mid % 3, 4 + mid % 5
                frames = [
                    bytes((i + mid + 97 * f) % 256 for i in range(w * h * 3))
                    for f in range(nf)
                ]
                out.append((mid, encode_apng(w, h, 3, frames)))
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    return spread(ids.select(id_col), id_col, cap=8).mapInPandas(
        fn,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


def sample_apng_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL keyframe sampling over a real animation container: decode
    the APNG (chunk sequencing + per-frame inflate/defilter), keep
    every Nth frame, emit exact per-frame byte means — the 1→N
    mapInPandas fan-out shape of an ffmpeg keyframe sampler, with an
    actual decoder underneath instead of byte-slicing."""
    from .mediacodec import decode_apng

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, ch, frames = decode_apng(bytes(payload))
                n = w * h * ch
                for f in range(0, len(frames), every_n):
                    out.append(
                        (int(mid), f, len(frames), sum(frames[f]) / n)
                    )
            if out:
                yield pd.DataFrame(
                    out, columns=["media_id", "frame_idx", "n_frames", "mean_byte"]
                )

    return media.mapInPandas(fn, schema=FRAME_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# Image perceptual hashing (dHash) — near-duplicate detection over pixels
# ---------------------------------------------------------------------------

DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("dhash", T.LongType()),
    ]
)


def _dhash_of_gray(gray, w: int, h: int, grid_w: int, grid_h: int, bits: int) -> int:
    """Shared pool+pack core of the still-image and video-frame dHash
    extractors: exact integer block means over the grid (nearest-pixel
    fallback for images smaller than the grid), bit b = gy*(grid_w-1)
    + gx set when the right cell exceeds the left."""
    xs = [gx * w // grid_w for gx in range(grid_w + 1)]
    ys = [gy * h // grid_h for gy in range(grid_h + 1)]

    def cell(gx: int, gy: int) -> int:
        x0, x1 = xs[gx], xs[gx + 1]
        y0, y1 = ys[gy], ys[gy + 1]
        if x1 <= x0 or y1 <= y0:
            return int(
                gray[min(h - 1, gy * h // grid_h), min(w - 1, gx * w // grid_w)]
            )
        return int(gray[y0:y1, x0:x1].sum() // ((y1 - y0) * (x1 - x0)))

    pooled = [[cell(gx, gy) for gx in range(grid_w)] for gy in range(grid_h)]
    hval = 0
    for gy in range(grid_h):
        for gx in range(grid_w - 1):
            b = gy * (grid_w - 1) + gx
            if b >= bits:
                break
            if pooled[gy][gx + 1] > pooled[gy][gx]:
                hval |= 1 << b
    return hval


def synthesize_neardup_png_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic GRAYSCALE near-duplicate PNG fixture per id — the
    closed-form-oracle pattern of synthesize_png_media, shaped so that
    groups of 4 consecutive selected ids are near-duplicate images:

    with k = id // 10 (the fixture is meant for ids ≡ 0 mod 10),
    g = k // 4 the dup group and every image a 9x8 grid of
    constant-value blocks rendered at per-id scale (sx, sy) =
    (1 + k%3, 1 + (k//3)%2) — so group members share content at
    DIFFERENT pixel sizes, exactly what a perceptual hash must see
    through.  Block (gx, gy) value:

        base = (g*37 + gx*gx*13 + gy*gy*29 + gx*gy*7 + g*gx*3) % 256
        v    = (base + 128) % 256  if k%2 == 1 and (gx, gy) ==
               ((k*3) % 9, (k*5) % 8)   else base

    i.e. odd members carry one strongly-perturbed block (<= 2 dHash
    bits per perturbation), so within-group hamming stays <= 4 while
    cross-group patterns differ at many bit positions.  Encoded
    through the REAL PNG writer; a SQL oracle states the expected
    pooled grid (and hence the expected dHash) without decoding PNG."""
    from .mediacodec import encode_png

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf[id_col]:
                mid = int(mid)
                k = mid // 10
                g, m = k // 4, k % 2
                px, py = (k * 3) % 9, (k * 5) % 8
                sx, sy = 1 + k % 3, 1 + (k // 3) % 2
                w, h = 9 * sx, 8 * sy
                cells = [
                    [
                        (g * 37 + gx * gx * 13 + gy * gy * 29
                         + gx * gy * 7 + g * gx * 3) % 256
                        for gx in range(9)
                    ]
                    for gy in range(8)
                ]
                if m == 1:
                    cells[py][px] = (cells[py][px] + 128) % 256
                raw = bytes(
                    cells[y // sy][x // sx]
                    for y in range(h)
                    for x in range(w)
                )
                out.append((mid, encode_png(w, h, 1, raw)))
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    return spread(ids.select(id_col), id_col, cap=8).mapInPandas(
        fn,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


def extract_image_dhash(
    media: DataFrame, grid_w: int = 9, grid_h: int = 8, bits: int = 60
) -> DataFrame:
    """REAL-decode difference hash (dHash) over Arrow batches: decode
    the PNG, collapse to exact integer grayscale (channel sum // n —
    pure ints, no float luminance), pool to a ``grid_w x grid_h`` grid
    by exact integer block means (sum // pixel count over the block's
    [gx*w//grid_w, (gx+1)*w//grid_w) slice — size-invariant, the whole
    point of a perceptual hash), and pack bit b = gy*(grid_w-1) + gx
    (b < ``bits``) as ``pooled[gy][gx+1] > pooled[gy][gx]``.

    60 bits, not the folkloric 64: the fingerprint then drops straight
    into the SimHash banding machinery
    (dedup.hamming_pairs_from_fingerprints, radius+1 blocks of
    bits/(radius+1) bits) and stays clear of signed-long overflow on
    both engines.  All arithmetic is closed-form integer, so a SQL
    oracle reproduces the exact hash from a closed-form pixel rule.

    Format dispatch (r12): payloads route by magic bytes — PNG through
    decode_png, JPEG (SOI 0xFFD8) through the baseline decode_jpeg —
    so a mixed-format corpus hashes in ONE pass, and the same image
    content hashes identically across container formats wherever the
    decode is exact (pinned by test_image_dhash_cross_format).

    Scale: one Arrow pass, row-local — fingerprints shuffle as slim
    (id, long) rows into the banded join, never pixels."""
    import numpy as np

    from .mediacodec import decode_jpeg, decode_png

    def _decode(b: bytes):
        if b[:2] == b"\xff\xd8":
            return decode_jpeg(b)
        return decode_png(b)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, ch, raw = _decode(bytes(payload))
                arr = (
                    np.frombuffer(raw, dtype=np.uint8)
                    .astype(np.int64)
                    .reshape(h, w, ch)
                )
                gray = arr.sum(axis=2) // ch
                out.append(
                    (int(mid), _dhash_of_gray(gray, w, h, grid_w, grid_h, bits))
                )
            yield pd.DataFrame(out, columns=["media_id", "dhash"])

    return media.mapInPandas(fn, schema=DHASH_SCHEMA)


FRAME_DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("dhash", T.LongType()),
    ]
)


def extract_video_frame_dhash(
    media: DataFrame,
    every_n: int = 2,
    grid_w: int = 9,
    grid_h: int = 8,
    bits: int = 60,
) -> DataFrame:
    """Per-frame dHash over REAL video decode: walk the AVI container
    (RIFF parse, DIB layout undo), keep every Nth frame, grayscale it
    exactly (channel sum // 3) and hash through the same pool+pack
    core as the still-image extractor — the fingerprint layer of
    video-level near-duplicate detection (re-encoded/re-contained
    copies of a clip share frame hashes even when the files differ
    byte-for-byte).  1→N fan-out like sample_video_frames.

    Scale: one Arrow pass over the blob scan; downstream only slim
    (media_id, frame_idx, long) rows move — see video_neardup_pairs
    for the pair stage."""
    import numpy as np

    from .mediacodec import decode_avi_rgb24

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, _fps, frames = decode_avi_rgb24(bytes(payload))
                for f in range(0, len(frames), every_n):
                    arr = (
                        np.frombuffer(frames[f], dtype=np.uint8)
                        .astype(np.int64)
                        .reshape(h, w, 3)
                    )
                    gray = arr.sum(axis=2) // 3
                    out.append(
                        (
                            int(mid),
                            f,
                            len(frames),
                            _dhash_of_gray(gray, w, h, grid_w, grid_h, bits),
                        )
                    )
            if out:
                yield pd.DataFrame(
                    out,
                    columns=["media_id", "frame_idx", "n_frames", "dhash"],
                )

    return media.mapInPandas(fn, schema=FRAME_DHASH_SCHEMA)


def frame_neardup_pairs(
    frames: DataFrame,
    radius: int = 4,
    min_matched_frames: int = 2,
    fp_col: str = "dhash",
    bits: int = 60,
) -> DataFrame:
    """Media-level near-duplicate pairs from FRAME-level fingerprints
    (media_id, frame_idx, <fp_col>) — shared by the video dHash and
    audio spectral paths: frame pairs within hamming ``radius`` come
    from the banded bit-block join (each frame keyed as
    media_id * 2^20 + frame_idx — frame counts are bounded far below
    2^20 by the samplers), and two media pair when at least
    ``min_matched_frames`` DISTINCT frames of the lower-id medium
    match frames of the other.  Returns (id_a, id_b,
    n_matched_frames, min_hamming), id_a < id_b, ordered.

    Scale: the pair stage inherits the banded join's guarantees (never
    all-pairs, bucket-capped); the media rollup is one groupBy over
    the already-tiny pair set.  Frames of the SAME medium (static
    scenes, sustained notes) collide in the band join but are filtered
    before the rollup, so a long still clip cannot pair with itself."""
    from .dedup import hamming_pairs_from_fingerprints

    # the pack bound is load-bearing, not advisory: frame_idx >= 2^20
    # would alias into the NEXT media id (phantom pairs, a bypassed
    # same-media filter, duplicate fids in the banded join), so it
    # RAISES row-locally instead of silently mis-attributing — hit it
    # with a ~5 h unsampled recording and the fix is a coarser
    # hop/every_n, not a dropped frame (r12 review).  The media_id
    # half is guarded too (r12 advice): an id >= 2^43 overflows the
    # signed-long pack and aliases frames into OTHER media — same
    # hazard, other operand; the fix there is a narrower id space.
    packed = F.when(
        (F.col("frame_idx") >= 0)
        & (F.col("frame_idx") < F.lit(1 << 20))
        & (F.col("media_id") >= 0)
        & (F.col("media_id") < F.lit(1 << 43)),
        F.col("media_id") * F.lit(1 << 20) + F.col("frame_idx"),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("frame_neardup_pairs: (media_id, frame_idx) = ("),
                F.col("media_id").cast("string"),
                F.lit(", "),
                F.col("frame_idx").cast("string"),
                F.lit(") outside the 2^43 x 2^20 pack bounds — "),
                F.lit("sample coarser or renumber media ids"),
            )
        )
    )
    keyed = frames.select(packed.alias("fid"), fp_col)
    fpairs = hamming_pairs_from_fingerprints(
        keyed, bits=bits, radius=radius, id_col="fid", fp_col=fp_col
    )

    def vid(c: str):
        return F.shiftright(F.col(c), 20).cast("long")

    def frame(c: str):
        return F.col(c).bitwiseAND(F.lit((1 << 20) - 1)).cast("long")

    cross = fpairs.select(
        vid("id_a").alias("va"),
        frame("id_a").alias("fa"),
        vid("id_b").alias("vb"),
        "hamming",
    ).filter(F.col("va") != F.col("vb"))
    # id_a < id_b on the packed key already orders (va, fa) <= (vb, *),
    # but equal-media frame pairs must go; re-orient by media id so the
    # (va < vb) pair grain is canonical
    return (
        cross.groupBy("va", "vb")
        .agg(
            F.countDistinct("fa").cast("long").alias("n_matched_frames"),
            F.min("hamming").cast("int").alias("min_hamming"),
        )
        .filter(F.col("n_matched_frames") >= min_matched_frames)
        .select(
            F.col("va").alias("id_a"),
            F.col("vb").alias("id_b"),
            "n_matched_frames",
            "min_hamming",
        )
        .orderBy("id_a", "id_b")
    )


def video_neardup_pairs(
    media: DataFrame,
    every_n: int = 2,
    radius: int = 4,
    min_matched_frames: int = 2,
) -> DataFrame:
    """Video-level near-duplicate pairs: per-frame dHash
    (:func:`extract_video_frame_dhash`) through the shared frame
    rollup (:func:`frame_neardup_pairs`) — re-encoded/re-contained
    copies of a clip pair even when the files differ byte-for-byte."""
    return frame_neardup_pairs(
        extract_video_frame_dhash(media, every_n=every_n),
        radius=radius,
        min_matched_frames=min_matched_frames,
    )


AUDIO_FP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("afp", T.LongType()),
    ]
)


def audio_band_edges(frame_len: int, bands: int):
    """Log-spaced spectral band edges over the positive-frequency bins
    — deterministic ints, shared by :func:`extract_audio_fingerprint`
    and the closed-form WAV fixtures (which place one tone per band so
    a SQL oracle can state the fingerprint without an FFT).

    bands + 2, not bands + 1: edges live in [1, n_bins - 1], which
    holds n_bins - 1 distinct integers; with exactly bands + 1
    available the gap-splitting below would insert a duplicate
    (gap // 2 == 0) and np.add.reduceat would emit a zero-width 'band'
    equal to its neighbor, silently deadening that bit (r12 review).
    Band m covers bins [edges[m], edges[m+1]); the spectrum is
    truncated at edges[-1], so the Nyquist bin is outside every band
    (r12 advice)."""
    import numpy as np

    n_bins = frame_len // 2 + 1
    if n_bins < bands + 2:
        raise ValueError(
            f"frame_len {frame_len} gives {n_bins} bins; need >= "
            f"{bands + 2} for {bands} distinct bands"
        )
    edges = np.unique(
        np.rint(np.geomspace(1, n_bins - 1, bands + 1)).astype(np.int64)
    )
    # duplicate rounded edges at the low end shrink the band count —
    # split the widest gaps until exactly `bands` bands remain (still
    # monotone, still deterministic; terminates because the range
    # holds > bands + 1 distinct integers)
    while len(edges) < bands + 1:
        gaps = np.diff(edges)
        i = int(np.argmax(gaps))
        edges = np.insert(edges, i + 1, edges[i] + gaps[i] // 2)
    return edges


def extract_audio_fingerprint(
    media: DataFrame,
    frame_len: int = 512,
    hop: int = 256,
    bands: int = 61,
    bits: int = 60,
) -> DataFrame:
    """Spectral audio fingerprint over the REAL WAV decode — the
    Haitsma & Kalker (2002) robust-hash shape at the engine's 60-bit
    grain: each ``frame_len``-sample window (hop ``hop``) FFTs to a
    power spectrum, energy sums over ``bands`` log-spaced bands, and
    bit m = 1 when band m's energy exceeds band m+1's — a sign-of-
    band-delta code, invariant to GLOBAL GAIN by construction (scaling
    every sample by c multiplies every band energy by c², leaving the
    comparisons unchanged) and robust to small additive noise (only
    near-tied bands can flip).  Returns (media_id, frame_idx,
    n_frames, afp) — one 60-bit long per window, ready for
    :func:`frame_neardup_pairs` exactly like video frame hashes.

    Scale: one Arrow pass over the blob scan (numpy rfft per window);
    only slim fingerprint rows move downstream — the same shape as
    every perceptual-hash path in this module."""
    import numpy as np

    from .mediacodec import decode_wav_pcm16

    edges = audio_band_edges(frame_len, bands)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _rate, ch, samples = decode_wav_pcm16(bytes(payload))
                x = np.asarray(samples, dtype=np.float64)
                if ch > 1:
                    # decode returns INTERLEAVED samples; FFTing them
                    # raw would mix L/R into an artificial Nyquist
                    # component and a stereo recording would never
                    # pair with its mono downmix — downmix by channel
                    # mean first (r12 review)
                    x = x[: len(x) - len(x) % ch].reshape(-1, ch).mean(axis=1)
                n_frames = max(0, (len(x) - frame_len) // hop + 1)
                for f in range(n_frames):
                    win = x[f * hop : f * hop + frame_len]
                    spec = np.abs(np.fft.rfft(win)) ** 2
                    # truncate to edges[-1] so the top band ends at its
                    # documented upper edge instead of silently
                    # absorbing the Nyquist bin (r12 advice)
                    e = np.add.reduceat(spec[: edges[-1]], edges[:-1])
                    hval = 0
                    for m in range(min(bits, bands - 1)):
                        if e[m] > e[m + 1]:
                            hval |= 1 << m
                    out.append((int(mid), f, n_frames, hval))
            if out:
                yield pd.DataFrame(
                    out, columns=["media_id", "frame_idx", "n_frames", "afp"]
                )

    return media.mapInPandas(fn, schema=AUDIO_FP_SCHEMA)


def audio_neardup_pairs(
    media: DataFrame,
    radius: int = 6,
    min_matched_frames: int = 2,
) -> DataFrame:
    """Audio-level near-duplicate pairs: spectral window fingerprints
    (:func:`extract_audio_fingerprint`) through the shared frame
    rollup — a re-gained or lightly-noised copy of a recording pairs
    with its source even when the PCM bytes differ everywhere."""
    return frame_neardup_pairs(
        extract_audio_fingerprint(media),
        radius=radius,
        min_matched_frames=min_matched_frames,
        fp_col="afp",
    )


def synthesize_neardup_avi_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic near-duplicate AVI fixture per id — the video arm
    of the closed-form AV-near-dup oracle (the
    synthesize_neardup_png_media pattern, frame-sequenced):

    with k = id // 20 (the fixture is meant for ids ≡ 0 mod 20),
    g = k // 4 the dup group and m = k % 2 the perturbation parity,
    every video holds 4 frames, each a 9x8 grid of constant-value
    RGB (v, v, v) blocks rendered at per-id scale
    (sx, sy) = (1 + k%3, 1 + (k//3)%2) — group members share frame
    content at DIFFERENT pixel sizes and frame rates, what a
    re-encoded copy looks like.  Block (gx, gy) of frame f:

        base = (g*31 + f*17 + gx*gx*11 + gy*gy*23 + gx*gy*5
                + g*gx*2) % 256
        v    = (base + 128) % 256  if m == 1 and (gx, gy) ==
               ((k*3 + f) % 9, (k*5 + f) % 8)   else base

    i.e. odd members carry one strongly-perturbed block PER FRAME
    (<= 2 dHash bits), so within-group frame hamming stays <= 4 while
    cross-group frames differ widely.  Encoded through the REAL AVI
    writer; a SQL oracle states the expected pooled grid (and hence
    each sampled frame's dHash) without decoding AVI."""
    from .mediacodec import encode_avi_rgb24

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf[id_col]:
                mid = int(mid)
                k = mid // 20
                g, m = k // 4, k % 2
                sx, sy = 1 + k % 3, 1 + (k // 3) % 2
                w, h = 9 * sx, 8 * sy
                frames = []
                for f in range(4):
                    cells = [
                        [
                            (g * 31 + f * 17 + gx * gx * 11 + gy * gy * 23
                             + gx * gy * 5 + g * gx * 2) % 256
                            for gx in range(9)
                        ]
                        for gy in range(8)
                    ]
                    if m == 1:
                        px, py = (k * 3 + f) % 9, (k * 5 + f) % 8
                        cells[py][px] = (cells[py][px] + 128) % 256
                    frames.append(
                        bytes(
                            b
                            for y in range(h)
                            for x in range(w)
                            for b in (cells[y // sy][x // sx],) * 3
                        )
                    )
                out.append(
                    (mid, encode_avi_rgb24(w, h, 10 + 5 * (k % 3), frames))
                )
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    return spread(ids.select(id_col), id_col, cap=8).mapInPandas(
        fn,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


def neardup_audio_bit(g: int, m: int, k: int, b: int) -> int:
    """The designed fingerprint bit b of audio fixture member (g, m, k)
    — the closed form both :func:`synthesize_neardup_wav_media` and
    the SQL oracle state (the engine recovers it through the real WAV
    decode + FFT; this function never touches audio):

        base  = ((g*29 + b*b*7 + b*3) % 11) < 5
        flips (odd members only): positions (k*7 + 1) % 60 and
        (k*13 + 31) % 60, XOR-applied (they cancel if they collide)
    """
    bit = int(((g * 29 + b * b * 7 + b * 3) % 11) < 5)
    if m % 2 == 1:
        f1, f2 = (k * 7 + 1) % 60, (k * 13 + 31) % 60
        bit ^= int(b == f1) ^ int(b == f2)
    return bit


def synthesize_neardup_wav_media(
    ids: DataFrame,
    id_col: str = "doc_id",
    frame_len: int = 512,
    hop: int = 256,
    bands: int = 61,
    bits: int = 60,
) -> DataFrame:
    """Deterministic near-duplicate WAV fixture per id — the audio arm
    of the closed-form AV-near-dup oracle.  Each file realizes a
    DESIGNED 60-bit spectral fingerprint (:func:`neardup_audio_bit`,
    with k = id // 20 for ids ≡ 10 mod 20, g = k // 4, m = k % 4):
    one exact-bin tone per log band (bin ``edges[band]`` from
    :func:`audio_band_edges` — orthogonal over the analysis window, so
    band energies are closed-form) with amplitudes walked down the
    bit chain, A[60] = 260 and A[b] = A[b+1] ± 2 so that
    A[b] > A[b+1] exactly when bit b is set; every adjacent band
    comparison then carries an energy margin >= 65536*(4*min(A)+4)
    ~ 3.7e7, orders of magnitude above int16 quantization leakage, so
    the REAL decode + FFT + band-energy pipeline provably recovers the
    designed pattern (pinned across the id range by
    test_av_neardup_fixture_fingerprints_match_designed).

    Members of a group share the base pattern at DIFFERENT gains
    (1 + 0.1*m — the gain invariance the fingerprint is built for);
    odd members additionally flip two designed bits, keeping
    within-group hamming <= 4 (radius 6) while cross-group patterns
    differ at ~half the positions.  3 analysis windows per file
    (len = frame_len + 2*hop), all realizing the same pattern."""
    import numpy as np

    # the amplitude chain anchors at the top band and walks down one
    # slot per bit, so the designed fixture only covers every band when
    # bands == bits + 1 — any other shape would leave chain slots no
    # bit ever wrote (formerly uninitialized np.empty garbage)
    if bands != bits + 1:
        raise ValueError(
            "synthesize_neardup_wav_media: bands must be bits + 1 "
            f"(got bands={bands}, bits={bits})"
        )
    edges = audio_band_edges(frame_len, bands)
    n_samples = frame_len + 2 * hop
    n = np.arange(n_samples, dtype=np.float64)
    # one (band, sample) sinusoid matrix, shared by every file: only
    # the per-file amplitude vector differs
    tones = np.sin(
        2.0 * np.pi * edges[:bands, None] * n[None, :] / frame_len
        + 0.5 * np.arange(bands, dtype=np.float64)[:, None]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .mediacodec import encode_wav_pcm16

        for pdf in batches:
            out = []
            for mid in pdf[id_col]:
                mid = int(mid)
                k = mid // 20
                g, m = k // 4, k % 4
                amps = np.zeros(bands, dtype=np.float64)
                amps[bands - 1] = 260.0
                for b in range(bits - 1, -1, -1):
                    amps[b] = amps[b + 1] + (
                        2.0 if neardup_audio_bit(g, m, k, b) else -2.0
                    )
                gain = 1.0 + 0.1 * m
                x = np.rint(gain * (amps @ tones)).astype(np.int64)
                if np.abs(x).max() > 32767:
                    raise ValueError(
                        "synthesize_neardup_wav_media: clipped sample — "
                        "amplitude chain exceeds int16"
                    )
                out.append((mid, encode_wav_pcm16([int(s) for s in x])))
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    return spread(ids.select(id_col), id_col, cap=8).mapInPandas(
        fn,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


# ---------------------------------------------------------------------------
# JPEG: header geometry always (stdlib marker walk), pixels via optional PIL
# ---------------------------------------------------------------------------

JPEG_HEADER_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def synthesize_jpeg_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic FULL baseline JPEG per id, encoded through the
    real encoder (FDCT, quantization, canonical Huffman, byte
    stuffing): even ids get a YCbCr 4:2:0 color image with neutral
    chroma, odd ids grayscale (ids with id%4==1 additionally carry
    restart markers every 2 MCUs). Every 8x8 pixel block is constant
    at v = 128 + 2*(((id + bx + 3*by) % 49) - 24) — even offsets from
    128 quantize exactly under the flat-16 table, so the decoded image
    reproduces v bit-exactly and a SQL oracle can state the expected
    per-channel means from the block grid without decoding JPEG."""
    from .mediacodec import encode_jpeg_baseline

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf[id_col]:
                mid = int(mid)
                if mid % 2 == 0:
                    w, h, ch = 16 * (1 + (mid // 2) % 2), 16, 3
                    subsample, rst = True, 0
                else:
                    w, h, ch = 8 * (1 + mid % 3), 8 * (1 + (mid // 3) % 2), 1
                    subsample, rst = False, (2 if mid % 4 == 1 else 0)
                raw = bytearray()
                for y in range(h):
                    for x in range(w):
                        v = 128 + 2 * (((mid + x // 8 + 3 * (y // 8)) % 49) - 24)
                        raw += bytes([v] * ch)
                out.append(
                    (
                        mid,
                        encode_jpeg_baseline(
                            w,
                            h,
                            ch,
                            bytes(raw),
                            subsample=subsample,
                            restart_interval=rst,
                        ),
                    )
                )
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    return spread(ids.select(id_col), id_col, cap=8).mapInPandas(
        fn,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


def synthesize_jpeg_headers(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic minimal JPEG streams per id: SOI + a COM segment of
    id%7 padding bytes (so the marker walk must actually traverse
    variable-length segments) + APP0 + SOF0 declaring geometry
    (4 + id%5) x (3 + id%4) with 3 or 1 components by id parity + EOI.
    Closed-form, so a SQL oracle can state the expected geometry without
    parsing JPEG itself (same pattern as synthesize_png_media)."""
    import struct as _struct

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf[id_col]:
                mid = int(mid)
                w, h = 4 + mid % 5, 3 + mid % 4
                ncomp = 3 if mid % 2 == 0 else 1
                com = b"\xff\xfe" + _struct.pack(">H", 2 + mid % 7) + b"x" * (mid % 7)
                app0 = b"\xff\xe0" + _struct.pack(">H", 7) + b"JFIF\x00"
                sof = (
                    b"\xff\xc0"
                    + _struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
                    + bytes(3 * ncomp)
                )
                out.append((mid, b"\xff\xd8" + com + app0 + sof + b"\xff\xd9"))
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    return spread(ids.select(id_col), id_col, cap=8).mapInPandas(
        fn,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


def extract_jpeg_header_features(media: DataFrame) -> DataFrame:
    """TRUE JPEG geometry over Arrow batches via the pure-stdlib SOF
    marker walk (mediacodec.jpeg_dimensions) — the resolution/aspect
    metadata a curation filter needs, with NO optional dependency.
    Output is identical with or without PIL installed (hash-stable
    across environments); per-pixel statistics live in
    :func:`extract_jpeg_pixel_stats` behind the optional import."""
    from .mediacodec import jpeg_dimensions

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                w, h, ch = jpeg_dimensions(b)
                out.append((int(mid), w, h, ch, len(b)))
            yield pd.DataFrame(
                out,
                columns=["media_id", "width", "height", "channels", "n_bytes"],
            )

    return media.mapInPandas(fn, schema=JPEG_HEADER_SCHEMA)


def extract_jpeg_pixel_stats(media: DataFrame) -> DataFrame:
    """Full JPEG pixel statistics via mediacodec.decode_jpeg: REAL
    with no dependency for baseline sequential streams (the pure
    stdlib+numpy Huffman+IDCT decoder); non-baseline coding modes
    (progressive/arithmetic/12-bit) decode through the OPTIONAL PIL
    import and raise a labeled UnsupportedJpegFeature where PIL is
    absent (this sandbox). Same output contract as
    extract_image_features for PNG."""
    from .mediacodec import decode_jpeg

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, ch, raw = decode_jpeg(bytes(payload))
                n = w * h
                sums = [0, 0, 0]
                for c in range(min(ch, 3)):
                    sums[c] = sum(raw[c::ch])
                out.append(
                    (
                        int(mid),
                        w,
                        h,
                        ch,
                        sums[0] / n,
                        sums[1] / n if ch >= 2 else None,
                        sums[2] / n if ch >= 3 else None,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "channels",
                    "mean_r",
                    "mean_g",
                    "mean_b",
                ],
            )

    return media.mapInPandas(fn, schema=IMAGE_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Video: uncompressed RGB24 AVI — real container decode + frame sampling
# ---------------------------------------------------------------------------

VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("fps", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)


def synthesize_avi_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic uncompressed-AVI fixture per id: (3 + id%4) x
    (2 + id%3) RGB24, 4 + id%5 frames at 10 + id%7 fps, frame f pixel
    byte i = (i + id + 131*f) % 256 — through the REAL RIFF writer
    (bottom-up BGR DIB rows with 4-byte padding), so the closed-form
    SQL oracle verifies a genuine container round-trip."""
    from .mediacodec import encode_avi_rgb24

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf[id_col]:
                mid = int(mid)
                w, h, nf = 3 + mid % 4, 2 + mid % 3, 4 + mid % 5
                fps = 10 + mid % 7
                frames = [
                    bytes((i + mid + 131 * f) % 256 for i in range(w * h * 3))
                    for f in range(nf)
                ]
                out.append((mid, encode_avi_rgb24(w, h, fps, frames)))
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    return spread(ids.select(id_col), id_col, cap=8).mapInPandas(
        fn,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


def sample_video_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL video frame sampling: decode the AVI container (RIFF walk,
    DIB pixel-layout undo), keep every Nth frame, emit exact per-frame
    byte means + container fps — the 1→N mapInPandas fan-out of an
    ffmpeg keyframe sampler with an actual decoder underneath.
    Compressed codecs raise MediaCodecError (route via frame_sample_stub
    where ffmpeg is unavailable; see COVERAGE.md)."""
    from .mediacodec import decode_avi_rgb24

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, fps, frames = decode_avi_rgb24(bytes(payload))
                n = w * h * 3
                for f in range(0, len(frames), every_n):
                    out.append(
                        (int(mid), f, len(frames), fps, sum(frames[f]) / n)
                    )
            if out:
                yield pd.DataFrame(
                    out,
                    columns=[
                        "media_id",
                        "frame_idx",
                        "n_frames",
                        "fps",
                        "mean_byte",
                    ],
                )

    return media.mapInPandas(fn, schema=VIDEO_FRAME_SCHEMA)
