"""Multimodal binary pathway: decode/feature stub, resize stub,
1→N frame sampling — schema, batching, and determinism of the
Arrow-batched plumbing (the codec itself is stubbed; see
operators/multimodal.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_processing_spark.operators.multimodal import (
    extract_features,
    frame_sample_stub,
    resize_stub,
    text_as_media,
)
from big_data_processing_spark.sources.readers import load_table

from .conftest import TEST_SF_DIR


def _media(spark):
    return text_as_media(load_table(spark, TEST_SF_DIR, "documents"))


def test_feature_extraction_deterministic(spark):
    media = _media(spark)
    a = {r.media_id: (r.n_bytes, r.checksum32, tuple(r.feature)) for r in extract_features(media).collect()}
    b = {r.media_id: (r.n_bytes, r.checksum32, tuple(r.feature)) for r in extract_features(media).collect()}
    assert a == b
    assert len(a) == 500
    n_bytes = {r.media_id: r.n_bytes for r in extract_features(media).collect()}
    chars = {r.doc_id: r.n_chars for r in load_table(spark, TEST_SF_DIR, "documents").collect()}
    assert n_bytes == chars  # ascii text: bytes == chars


def test_resize_normalizes_payload_size(spark):
    resized = resize_stub(_media(spark), width=16, height=16)
    rows = resized.collect()
    assert all(r.n_bytes == 256 and len(r.payload) == 256 for r in rows)
    assert all(r.width == 16 and r.height == 16 for r in rows)


def test_frame_sampling_fans_out(spark):
    media = _media(spark).limit(20)
    frames = frame_sample_stub(media, frame_bytes=32, every_n=4)
    rows = frames.collect()
    assert len(rows) > 20  # 1→N fan-out
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.media_id, []).append(r)
    sizes = {r.media_id: r.n_bytes for r in _media(spark).limit(20)
             .select("media_id", F.octet_length("payload").alias("n_bytes")).collect()}
    for mid, fr in by_doc.items():
        total_frames = fr[0].n_frames
        assert total_frames == -(-sizes[mid] // 32)  # ceil division
        assert len(fr) == len(range(0, total_frames, 4))
        assert sorted(r.frame_idx for r in fr) == [i * 4 for i in range(len(fr))]


# ---------------------------------------------------------------------------
# Real codecs (mediacodec.py)
# ---------------------------------------------------------------------------


def test_png_roundtrip_all_supported_shapes():
    import random

    from big_data_processing_spark.operators.mediacodec import decode_png, encode_png

    rng = random.Random(11)
    for _ in range(30):
        w, h, ch = rng.randint(1, 12), rng.randint(1, 12), rng.choice([1, 2, 3, 4])
        raw = bytes(rng.randrange(256) for _ in range(w * h * ch))
        assert decode_png(encode_png(w, h, ch, raw)) == (w, h, ch, raw)


def test_png_decode_average_and_paeth_filters():
    """The encoder emits filters 0/1/2; hand-build scanlines with 3
    (Average) and 4 (Paeth) so decode's full filter set is covered."""
    import struct
    import zlib

    from big_data_processing_spark.operators.mediacodec import (
        _PNG_SIG,
        _chunk,
        decode_png,
    )

    w, h, ch = 3, 2, 3
    raw = bytes(range(w * h * ch))
    stride = w * ch

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    # row 0 with Average (prev row = zeros), row 1 with Paeth
    row0, row1 = raw[:stride], raw[stride:]
    enc0 = bytes(
        (row0[x] - ((row0[x - ch] if x >= ch else 0) + 0) // 2) & 0xFF
        for x in range(stride)
    )
    enc1 = bytes(
        (
            row1[x]
            - paeth(
                row1[x - ch] if x >= ch else 0,
                row0[x],
                row0[x - ch] if x >= ch else 0,
            )
        )
        & 0xFF
        for x in range(stride)
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x03" + enc0 + b"\x04" + enc1))
        + _chunk(b"IEND", b"")
    )
    assert decode_png(png) == (w, h, ch, raw)


def test_png_rejects_unsupported():
    import pytest

    from big_data_processing_spark.operators.mediacodec import (
        MediaCodecError,
        decode_png,
    )

    with pytest.raises(MediaCodecError):
        decode_png(b"\xff\xd8\xff\xe0 not a png")


def test_wav_roundtrip_and_reject():
    import pytest

    from big_data_processing_spark.operators.mediacodec import (
        MediaCodecError,
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    s = [((j * 31 + 5) % 65536) - 32768 for j in range(128)]
    rate, ch, back = decode_wav_pcm16(encode_wav_pcm16(s))
    assert (rate, ch, back) == (16000, 1, s)
    with pytest.raises(MediaCodecError):
        decode_wav_pcm16(b"RIFFxxxxWAVE not really")


def test_resize_images_real_roundtrip(spark):
    """resize_images output payloads are valid PNGs of the target
    geometry whose pixels equal the numpy nearest-neighbor resample of
    the source."""
    from big_data_processing_spark.operators.mediacodec import (
        decode_png,
        resize_nearest,
    )
    from big_data_processing_spark.operators.multimodal import (
        resize_images,
        synthesize_png_media,
    )

    ids = spark.createDataFrame([(i,) for i in range(0, 200, 25)], ["doc_id"])
    media = synthesize_png_media(ids)
    src = {r.media_id: bytes(r.payload) for r in media.collect()}
    out = resize_images(media, out_w=3, out_h=2).collect()
    assert len(out) == len(src)
    for r in out:
        w, h, ch, raw = decode_png(bytes(r.payload))
        assert (w, h, ch) == (3, 2, 3)
        sw, sh, sch, sraw = decode_png(src[r.media_id])
        assert raw == resize_nearest(sw, sh, sch, sraw, 3, 2)


def test_apng_roundtrip_and_plain_png_fallback():
    import random

    from big_data_processing_spark.operators.mediacodec import (
        decode_apng,
        encode_apng,
        encode_png,
    )

    rng = random.Random(7)
    for _ in range(15):
        w, h, ch = rng.randint(1, 8), rng.randint(1, 8), rng.choice([1, 3, 4])
        n = rng.randint(1, 6)
        frames = [
            bytes(rng.randrange(256) for _ in range(w * h * ch)) for _ in range(n)
        ]
        assert decode_apng(encode_apng(w, h, ch, frames)) == (w, h, ch, frames)
    raw = bytes(range(12))
    assert decode_apng(encode_png(2, 2, 3, raw)) == (2, 2, 3, [raw])


def test_sample_apng_frames_real_decode(spark):
    """Frame sampling fan-out with a real container decode: every 2nd
    frame, exact means, n_frames from the acTL declaration."""
    from big_data_processing_spark.operators.multimodal import (
        sample_apng_frames,
        synthesize_apng_media,
    )

    ids = spark.createDataFrame([(i,) for i in range(0, 100, 25)], ["doc_id"])
    out = sample_apng_frames(synthesize_apng_media(ids), every_n=2).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r)
    for mid, rows in by_id.items():
        nf = 4 + mid % 5
        assert rows[0].n_frames == nf
        assert sorted(r.frame_idx for r in rows) == list(range(0, nf, 2))
        w, h = 3 + mid % 4, 2 + mid % 3
        n = w * h * 3
        for r in rows:
            want = sum((i + mid + 97 * r.frame_idx) % 256 for i in range(n)) / n
            assert r.mean_byte == want
