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


def test_jpeg_dimensions_marker_walk():
    """Pure-stdlib SOF walk: geometry recovered through variable-length
    segments; progressive SOF2 accepted; DHT's shared C-range marker is
    NOT mistaken for a frame header; junk rejected."""
    import struct

    import pytest as _pytest

    from big_data_processing_spark.operators.mediacodec import (
        MediaCodecError,
        jpeg_dimensions,
    )

    def sof(marker, h, w, ncomp):
        return (
            bytes([0xFF, marker])
            + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
            + bytes(3 * ncomp)
        )

    com = b"\xff\xfe" + struct.pack(">H", 6) + b"abcd"
    dht = b"\xff\xc4" + struct.pack(">H", 5) + b"\x00\x01\x02"
    baseline = b"\xff\xd8" + com + dht + sof(0xC0, 31, 77, 3) + b"\xff\xd9"
    assert jpeg_dimensions(baseline) == (77, 31, 3)
    progressive = b"\xff\xd8" + sof(0xC2, 5, 9, 1) + b"\xff\xd9"
    assert jpeg_dimensions(progressive) == (9, 5, 1)
    with _pytest.raises(MediaCodecError, match="not a JPEG"):
        jpeg_dimensions(b"\x89PNG\r\n\x1a\n")
    with _pytest.raises(MediaCodecError, match="without SOF"):
        jpeg_dimensions(b"\xff\xd8" + com + b"\xff\xd9")


def test_jpeg_baseline_roundtrip_exact_gray():
    """Block-constant grayscale at even offsets from 128 round-trips
    BIT-EXACTLY through the full encoder/decoder (FDCT+quantize then
    Huffman decode, dequantize, IDCT): the closed-form property the
    hash-checked catalog fixtures rely on."""
    from big_data_processing_spark.operators.mediacodec import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
        jpeg_dimensions,
    )

    w, h = 24, 16
    raw = bytes(
        128 + 2 * ((((x // 8) + 3 * (y // 8)) % 49) - 24)
        for y in range(h)
        for x in range(w)
    )
    data = encode_jpeg_baseline(w, h, 1, raw)
    assert jpeg_dimensions(data) == (w, h, 1)
    assert decode_jpeg_baseline(data) == (w, h, 1, raw)
    # restart markers: same pixels, DC predictors reset every 2 MCUs
    data_rst = encode_jpeg_baseline(w, h, 1, raw, restart_interval=2)
    assert decode_jpeg_baseline(data_rst) == (w, h, 1, raw)


def test_jpeg_baseline_roundtrip_color_420_neutral_chroma():
    """YCbCr 4:2:0 with neutral chroma exercises subsampling, MCU
    interleave, chroma upsample, and color conversion — and still
    round-trips exactly (R=G=B=Y when Cb=Cr=128)."""
    from big_data_processing_spark.operators.mediacodec import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    w, h = 32, 16
    rgb = bytearray()
    for y in range(h):
        for x in range(w):
            v = 128 + 2 * ((((x // 8) + (y // 8)) % 49) - 24)
            rgb += bytes((v, v, v))
    data = encode_jpeg_baseline(w, h, 3, bytes(rgb), subsample=True)
    assert decode_jpeg_baseline(data) == (w, h, 3, bytes(rgb))


def test_jpeg_baseline_random_near_lossless():
    """Arbitrary pixels through a unit quantization table decode
    within 1 gray level (float DCT round-trip error) — including
    non-multiple-of-8 geometry (pad + crop) and real color."""
    import random

    from big_data_processing_spark.operators.mediacodec import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    rng = random.Random(7)
    raw = bytes(rng.randrange(256) for _ in range(17 * 13))
    w, h, ch, out = decode_jpeg_baseline(
        encode_jpeg_baseline(17, 13, 1, raw, quant=[1] * 64)
    )
    assert (w, h, ch) == (17, 13, 1)
    assert max(abs(a - b) for a, b in zip(raw, out)) <= 2

    rgb = bytes(rng.randrange(256) for _ in range(8 * 8 * 3))
    w, h, ch, out = decode_jpeg_baseline(
        encode_jpeg_baseline(8, 8, 3, rgb, quant=[1] * 64)
    )
    assert (w, h, ch) == (8, 8, 3)
    # color conversion is lossy (YCbCr rounding) but tightly bounded
    assert max(abs(a - b) for a, b in zip(rgb, out)) <= 6


def test_jpeg_error_paths_and_optional_pil():
    """Malformed streams raise MediaCodecError; valid-but-non-baseline
    streams raise UnsupportedJpegFeature, which decode_jpeg forwards
    to the OPTIONAL PIL dependency (re-raised where PIL is absent) —
    both environments asserted."""
    import struct as _struct

    import pytest as _pytest

    from big_data_processing_spark.operators.mediacodec import (
        MediaCodecError,
        UnsupportedJpegFeature,
        decode_jpeg,
        decode_jpeg_baseline,
    )

    with _pytest.raises(MediaCodecError):
        decode_jpeg_baseline(b"not a jpeg")
    with _pytest.raises(MediaCodecError):
        decode_jpeg_baseline(b"\xff\xd8\xff\xd9")  # no scan

    progressive = (
        b"\xff\xd8\xff\xc2"
        + _struct.pack(">HBHHB", 11, 8, 8, 8, 1)
        + bytes(3)
        + b"\xff\xd9"
    )
    with _pytest.raises(UnsupportedJpegFeature):
        decode_jpeg_baseline(progressive)

    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if not have_pil:
        with _pytest.raises(UnsupportedJpegFeature):
            decode_jpeg(progressive)
    else:
        # PIL itself decodes our baseline output: external interop
        import io as _io

        from big_data_processing_spark.operators.mediacodec import (
            encode_jpeg_baseline,
        )
        from PIL import Image

        raw = bytes(128 + 2 * (((x // 8) % 49) - 24) for x in range(16) for _ in range(8))
        img = Image.open(
            _io.BytesIO(encode_jpeg_baseline(16, 8, 1, raw))
        )
        img.load()
        assert img.size == (16, 8)


def test_jpeg_pixel_stats_spark(spark):
    """Arrow-batched full-decode stats recover the closed-form block
    means for both fixture families (color 4:2:0 and grayscale+RST)."""
    from big_data_processing_spark.operators.multimodal import (
        extract_jpeg_pixel_stats,
        synthesize_jpeg_media,
    )

    ids = spark.range(0, 8).select(F.col("id").alias("doc_id"))
    rows = extract_jpeg_pixel_stats(synthesize_jpeg_media(ids)).collect()
    assert len(rows) == 8
    for r in rows:
        mid = r.media_id
        if mid % 2 == 0:
            w, h, ch = 16 * (1 + (mid // 2) % 2), 16, 3
        else:
            w, h, ch = 8 * (1 + mid % 3), 8 * (1 + (mid // 3) % 2), 1
        assert (r.width, r.height, r.channels) == (w, h, ch)
        bw, bh = w // 8, h // 8
        want = sum(
            128 + 2 * (((mid + bx + 3 * by) % 49) - 24)
            for by in range(bh)
            for bx in range(bw)
        ) / (bw * bh)
        assert r.mean_r == want
        if ch == 3:
            assert r.mean_g == want and r.mean_b == want
        else:
            assert r.mean_g is None and r.mean_b is None


def test_extract_jpeg_header_features_spark(spark):
    """The Arrow-batched header extractor recovers the closed-form
    geometry for every synthesized id — identical with or without PIL."""
    from big_data_processing_spark.operators.multimodal import (
        extract_jpeg_header_features,
        synthesize_jpeg_headers,
    )

    ids = spark.range(0, 40, 3).select(F.col("id").alias("doc_id"))
    media = synthesize_jpeg_headers(ids)
    rows = {r.media_id: r for r in extract_jpeg_header_features(media).collect()}
    assert len(rows) == 14
    for mid, r in rows.items():
        assert (r.width, r.height) == (4 + mid % 5, 3 + mid % 4)
        assert r.channels == (3 if mid % 2 == 0 else 1)
        assert r.n_bytes == 4 + (4 + mid % 7) + 9 + (10 + 3 * r.channels)


def test_avi_codec_roundtrip():
    """RIFF/AVI round-trip: geometry, fps, and every frame byte survive
    the bottom-up/BGR/padded DIB layout — including odd widths whose
    rows need 4-byte padding; compressed streams rejected."""
    import struct

    import pytest as _pytest

    from big_data_processing_spark.operators.mediacodec import (
        MediaCodecError,
        decode_avi_rgb24,
        encode_avi_rgb24,
    )

    for w, h, nf, fps in [(3, 2, 4, 10), (5, 7, 6, 12), (4, 3, 1, 25)]:
        frames = [
            bytes((i + 13 * f) % 256 for i in range(w * h * 3))
            for f in range(nf)
        ]
        avi = encode_avi_rgb24(w, h, fps, frames)
        got = decode_avi_rgb24(avi)
        assert got == (w, h, fps, frames)

    with _pytest.raises(MediaCodecError, match="not an AVI"):
        decode_avi_rgb24(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    # flip biCompression to a nonzero fourcc -> must refuse, not garble
    avi = bytearray(encode_avi_rgb24(3, 2, 10, [bytes(18)]))
    strf_at = bytes(avi).find(b"strf") + 8
    avi[strf_at + 16 : strf_at + 20] = b"H264"
    with _pytest.raises(MediaCodecError, match="external codec"):
        decode_avi_rgb24(bytes(avi))


def test_sample_video_frames_spark(spark):
    """Arrow-batched AVI frame sampling recovers the closed-form frame
    means for every 2nd frame."""
    from big_data_processing_spark.operators.multimodal import (
        sample_video_frames,
        synthesize_avi_media,
    )

    ids = spark.range(0, 30, 5).select(F.col("id").alias("doc_id"))
    rows = sample_video_frames(synthesize_avi_media(ids), every_n=2).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    for mid, rs in by_id.items():
        w, h, nf = 3 + mid % 4, 2 + mid % 3, 4 + mid % 5
        assert len(rs) == (nf + 1) // 2
        for r in rs:
            assert r.n_frames == nf and r.fps == 10 + mid % 7
            n = w * h * 3
            want = sum((i + mid + 131 * r.frame_idx) % 256 for i in range(n)) / n
            assert abs(r.mean_byte - want) < 1e-12


def test_decoders_quarantine_malformed_bytes():
    """Corrupt, truncated, and random payloads must raise
    MediaCodecError — the only exception the Arrow extractors
    quarantine on — never a raw struct/index/zlib error that would
    fail a whole batch. Fuzzes every decoder entry point with
    truncations of valid media, byte corruptions, and garbage."""
    import random

    from big_data_processing_spark.operators.mediacodec import (
        MediaCodecError,
        decode_apng,
        decode_avi_rgb24,
        decode_jpeg_baseline,
        decode_png,
        decode_wav_pcm16,
        encode_apng,
        encode_avi_rgb24,
        encode_jpeg_baseline,
        encode_png,
        encode_wav_pcm16,
        jpeg_dimensions,
    )

    rng = random.Random(11)
    gray = bytes(128 for _ in range(16 * 8))
    rgb = bytes((i * 7) % 256 for i in range(4 * 3 * 3))
    valid = {
        decode_jpeg_baseline: encode_jpeg_baseline(16, 8, 1, gray),
        jpeg_dimensions: encode_jpeg_baseline(16, 8, 1, gray),
        decode_png: encode_png(4, 3, 3, rgb),
        decode_apng: encode_apng(4, 3, 3, [rgb, rgb]),
        decode_wav_pcm16: encode_wav_pcm16([0, 100, -100, 32000]),
        decode_avi_rgb24: encode_avi_rgb24(3, 2, 10, [bytes(18), bytes(18)]),
    }

    def check(decoder, payload):
        try:
            decoder(payload)
        except MediaCodecError:
            pass  # quarantined — the contract
        # any other exception propagates and fails the test

    for decoder, good in valid.items():
        decoder(good)  # sanity: the fixture is genuinely valid
        for cut in range(0, len(good), max(1, len(good) // 60)):
            check(decoder, good[:cut])
        for _ in range(150):
            b = bytearray(good)
            for _ in range(rng.randrange(1, 6)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            check(decoder, bytes(b))
        for _ in range(100):
            check(
                decoder,
                bytes(rng.randrange(256) for _ in range(rng.randrange(0, 120))),
            )
            check(decoder, good[:2] + bytes(rng.randrange(256) for _ in range(60)))


def test_jpeg_marker_walk_accepts_fill_bytes():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
    marker — conformant streams using padding must not be rejected as
    desynchronized."""
    from big_data_processing_spark.operators.mediacodec import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
        jpeg_dimensions,
    )

    jpg = encode_jpeg_baseline(8, 8, 3, bytes(range(64)) * 3)
    padded = jpg[:2] + b"\xff\xff" + jpg[2:]  # fill bytes after SOI
    assert jpeg_dimensions(padded) == jpeg_dimensions(jpg)
    w, h, comps = decode_jpeg_baseline(padded)[:3]
    assert (w, h) == (8, 8)


def test_avi_topdown_negative_height_not_flipped():
    """Negative biHeight = top-down DIB (legal, common): frames must
    decode in their stored order, not get mirrored vertically."""
    import struct

    from big_data_processing_spark.operators.mediacodec import (
        decode_avi_rgb24,
        encode_avi_rgb24,
    )

    w, h = 3, 2
    # distinct rows so a vertical flip is visible
    frame = bytes([10] * 9 + [200] * 9)  # row0=10s, row1=200s
    avi = bytearray(encode_avi_rgb24(w, h, 5, [frame]))
    _, _, _, (got_bu,) = decode_avi_rgb24(bytes(avi))
    assert got_bu == frame

    # rewrite the strf BITMAPINFOHEADER's biHeight to -h
    body = bytes(avi).find(b"strf") + 8  # past tag + size
    assert struct.unpack("<i", avi[body + 8 : body + 12])[0] == h
    avi[body + 8 : body + 12] = struct.pack("<i", -h)
    # the encoder wrote rows bottom-up; with top-down declared, the
    # stored stream now means the REVERSED logical image
    _, _, _, (got_td,) = decode_avi_rgb24(bytes(avi))
    assert got_td == bytes([200] * 9 + [10] * 9)
    assert got_td != got_bu


def _ref_dhash(mid: int) -> int:
    """Independent pure-Python recomputation of the near-dup fixture's
    60-bit dHash from the closed pixel rule (the same arithmetic the
    DuckDB oracle states in SQL)."""
    k = mid // 10
    g, m = k // 4, k % 2
    px, py = (k * 3) % 9, (k * 5) % 8
    cells = [
        [
            (g * 37 + gx * gx * 13 + gy * gy * 29 + gx * gy * 7 + g * gx * 3)
            % 256
            for gx in range(9)
        ]
        for gy in range(8)
    ]
    if m == 1:
        cells[py][px] = (cells[py][px] + 128) % 256
    h = 0
    for gy in range(8):
        for gx in range(8):
            b = gy * 8 + gx
            if b >= 60:
                break
            if cells[gy][gx + 1] > cells[gy][gx]:
                h |= 1 << b
    return h


def test_image_dhash_matches_closed_form(spark):
    """The REAL decode path (PNG codec → exact integer grayscale →
    exact integer block-mean pooling → bit pack) must reproduce the
    fixture's closed-form hash bit-for-bit — this equality is what
    lets a SQL oracle verify the whole perceptual-hash pipeline
    without decoding PNG."""
    from big_data_processing_spark.operators.multimodal import (
        extract_image_dhash,
        synthesize_neardup_png_media,
    )

    ids = spark.createDataFrame([(i,) for i in range(0, 400, 10)], ["doc_id"])
    media = synthesize_neardup_png_media(ids)
    got = {r.media_id: r.dhash for r in extract_image_dhash(media).collect()}
    assert got == {i: _ref_dhash(i) for i in range(0, 400, 10)}


def test_image_dhash_resolution_invariant(spark):
    """Same content rendered at different pixel sizes must hash
    IDENTICALLY — the size-invariance a perceptual hash exists for.
    Group members with m=0 share the exact grid but get different
    (sx, sy) render scales: ids 0 (9x8) and 160 (27x8) are both
    m=0 of g-equivalent content only when g matches, so compare
    within one group: ids 0 (k=0, 9x8) and 20 (k=2, 27x8) share
    g=0, m=0."""
    from big_data_processing_spark.operators.multimodal import (
        extract_image_dhash,
        synthesize_neardup_png_media,
    )
    from big_data_processing_spark.operators.mediacodec import decode_png

    ids = spark.createDataFrame([(0,), (20,)], ["doc_id"])
    media = synthesize_neardup_png_media(ids)
    payloads = {r.media_id: bytes(r.payload) for r in media.collect()}
    dims = {i: decode_png(p)[:2] for i, p in payloads.items()}
    assert dims[0] != dims[20], "fixture must render at different sizes"
    hashes = {r.media_id: r.dhash for r in extract_image_dhash(media).collect()}
    assert hashes[0] == hashes[20]


def test_image_dhash_on_rgb_decode_path(spark):
    """The extractor's grayscale collapse must also run on the RGB
    fixture (3-channel PNGs through the same real codec) — integer
    channel-mean, no float luminance, deterministic across runs."""
    from big_data_processing_spark.operators.multimodal import (
        extract_image_dhash,
        synthesize_png_media,
    )

    ids = spark.createDataFrame([(i,) for i in range(0, 100, 25)], ["doc_id"])
    media = synthesize_png_media(ids)
    a = {r.media_id: r.dhash for r in extract_image_dhash(media).collect()}
    b = {r.media_id: r.dhash for r in extract_image_dhash(media).collect()}
    assert a == b and len(a) == 4
    assert all(0 <= h < (1 << 60) for h in a.values())


def test_image_neardup_pairs_group_structure(spark):
    """End-to-end on the fixture: every within-group pair must be
    reported within radius 4 (each odd member's single perturbed block
    moves at most 2 bits), with hamming 0 for the unperturbed m=0
    twins rendered at different scales."""
    from pyspark.sql import functions as F  # noqa: F811

    from big_data_processing_spark.operators.dedup import (
        hamming_pairs_from_fingerprints,
    )
    from big_data_processing_spark.operators.multimodal import (
        extract_image_dhash,
        synthesize_neardup_png_media,
    )

    ids = spark.createDataFrame([(i,) for i in range(0, 160, 10)], ["doc_id"])
    fp = extract_image_dhash(synthesize_neardup_png_media(ids))
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in hamming_pairs_from_fingerprints(
            fp, bits=60, radius=4, id_col="media_id", fp_col="dhash"
        ).collect()
    }
    for g in range(4):
        members = [40 * g + 10 * j for j in range(4)]
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                assert (a, b) in pairs, f"missed within-group pair {(a, b)}"
                assert pairs[(a, b)] <= 4
        # the two unperturbed members are exact perceptual duplicates
        assert pairs[(members[0], members[2])] == 0


def test_image_dhash_cross_format(spark):
    """Format invariance wherever the decode is exact: the SAME pixel
    content encoded as grayscale PNG and as baseline JPEG (constant
    8x8 blocks at even offsets from 128 — the exact-quantization
    regime the JPEG encoder fixtures document) must produce the SAME
    dHash through the magic-byte dispatch, and a near-duplicate pair
    ACROSS formats must surface from the banded join."""
    from big_data_processing_spark.operators.dedup import (
        hamming_pairs_from_fingerprints,
    )
    from big_data_processing_spark.operators.mediacodec import (
        encode_jpeg_baseline,
        encode_png,
    )
    from big_data_processing_spark.operators.multimodal import (
        extract_image_dhash,
    )

    # 9x8 grid of constant 8x8 blocks -> 72x64 px, each grid cell one
    # JPEG MCU, every value an even offset from 128 (exact decode)
    def raw_for(seed: int) -> bytes:
        cells = [
            [
                128
                + 2 * (((gx * gx * 5 + gy * gy * 3 + seed * (gx + 1)) % 49) - 24)
                for gx in range(9)
            ]
            for gy in range(8)
        ]
        return bytes(
            cells[y // 8][x // 8] for y in range(64) for x in range(72)
        )

    rows = [
        (0, encode_png(72, 64, 1, raw_for(0))),
        (1, encode_jpeg_baseline(72, 64, 1, raw_for(0), subsample=False)),
        (2, encode_png(72, 64, 1, raw_for(17))),  # different content
    ]
    media = spark.createDataFrame(rows, ["media_id", "payload"])
    hashes = {r.media_id: r.dhash for r in extract_image_dhash(media).collect()}
    assert hashes[0] == hashes[1], "PNG and JPEG of same pixels must agree"
    assert hashes[0] != hashes[2]
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in hamming_pairs_from_fingerprints(
            extract_image_dhash(media),
            bits=60,
            radius=4,
            id_col="media_id",
            fp_col="dhash",
        ).collect()
    }
    assert pairs.get((0, 1)) == 0, pairs


def test_image_dhash_smaller_than_grid(spark):
    """Images narrower/shorter than the 9x8 pooling grid (icons,
    thumbnails) must hash via the nearest-pixel fallback instead of
    dividing by a zero-width block (r12 review: the closed-form
    fixtures always render >= 9x8, so only this test exercises the
    branch) — and identical tiny images must still collide."""
    from big_data_processing_spark.operators.mediacodec import encode_png
    from big_data_processing_spark.operators.multimodal import (
        extract_image_dhash,
    )

    tiny = bytes((i * 37) % 256 for i in range(4 * 4))  # 4x4 gray
    other = bytes((i * 91 + 13) % 256 for i in range(2 * 3))  # 2x3 gray
    media = spark.createDataFrame(
        [
            (0, encode_png(4, 4, 1, tiny)),
            (1, encode_png(4, 4, 1, tiny)),
            (2, encode_png(2, 3, 1, other)),
        ],
        ["media_id", "payload"],
    )
    hashes = {r.media_id: r.dhash for r in extract_image_dhash(media).collect()}
    assert hashes[0] == hashes[1]
    assert all(0 <= v < (1 << 60) for v in hashes.values())


def test_video_frame_dhash_and_neardup_pairs(spark):
    """Video-level near-dup end to end on REAL AVI containers: a clip,
    a re-encoded copy at a different frame rate with one perturbed
    block (frame hashes survive), an UNRELATED clip, and a static clip
    whose identical frames must not self-pair.  The copy pair — and
    only it — must surface, with its matched-frame count."""
    from big_data_processing_spark.operators.mediacodec import (
        encode_avi_rgb24,
    )
    from big_data_processing_spark.operators.multimodal import (
        extract_video_frame_dhash,
        video_neardup_pairs,
    )

    w, h = 18, 16  # 9x8 grid of 2x2 blocks

    def frame_for(scene: int, f: int, perturb: bool = False) -> bytes:
        cells = [
            [
                (scene * 41 + gx * gx * 7 + gy * gy * 11 + f * 29 + gx * gy)
                % 256
                for gx in range(9)
            ]
            for gy in range(8)
        ]
        if perturb:
            cells[3][4] = (cells[3][4] + 128) % 256
        return bytes(
            bytes([cells[y // 2][x // 2]] * 3)[i]
            for y in range(h)
            for x in range(w)
            for i in range(3)
        )

    clip = [frame_for(1, f) for f in range(6)]
    copy = [frame_for(1, f, perturb=(f == 2)) for f in range(6)]
    other = [frame_for(9, f) for f in range(6)]
    still = [frame_for(5, 0)] * 6
    media = spark.createDataFrame(
        [
            (0, encode_avi_rgb24(w, h, 10, clip)),
            (1, encode_avi_rgb24(w, h, 25, copy)),  # different fps
            (2, encode_avi_rgb24(w, h, 10, other)),
            (3, encode_avi_rgb24(w, h, 10, still)),
        ],
        ["media_id", "payload"],
    )
    frames = extract_video_frame_dhash(media, every_n=2).collect()
    by_vid = {}
    for r in frames:
        by_vid.setdefault(r.media_id, {})[r.frame_idx] = r.dhash
    assert set(by_vid) == {0, 1, 2, 3}
    assert set(by_vid[0]) == {0, 2, 4}  # every 2nd of 6 frames
    # unperturbed sampled frames hash identically across the two
    # encodings; the perturbed frame 2 differs but stays within radius
    assert by_vid[0][0] == by_vid[1][0] and by_vid[0][4] == by_vid[1][4]
    assert by_vid[0][2] != by_vid[1][2]

    pairs = {
        (r.id_a, r.id_b): (r.n_matched_frames, r.min_hamming)
        for r in video_neardup_pairs(
            media, every_n=2, radius=4, min_matched_frames=2
        ).collect()
    }
    assert (0, 1) in pairs, pairs
    n_matched, min_ham = pairs[(0, 1)]
    assert n_matched == 3 and min_ham == 0
    # no pair involves the unrelated clip, and the static clip's
    # identical frames never pair it with itself
    assert all(2 not in p and (3, 3) != p for p in pairs)
    assert all(a != b for a, b in pairs)


def test_audio_fingerprint_gain_invariant_and_neardup(spark):
    """Spectral audio fingerprints (Haitsma-Kalker shape) over real WAV
    payloads: a 2x-gained copy fingerprints IDENTICALLY per window
    (band-delta signs are gain-invariant by construction), a lightly
    phase-jittered copy stays within the hamming radius, an unrelated
    signal does not pair, and the audio near-dup rollup surfaces
    exactly the copy pairs."""
    import math

    from big_data_processing_spark.operators.mediacodec import (
        encode_wav_pcm16,
    )
    from big_data_processing_spark.operators.multimodal import (
        audio_neardup_pairs,
        extract_audio_fingerprint,
    )

    n = 512 * 4  # 4 analysis windows at frame_len=512, hop=256 -> 13
    def tone_mix(freqs, gain=1.0, jitter=0.0):
        return [
            max(
                -32768,
                min(
                    32767,
                    int(
                        gain
                        * sum(
                            3000 * math.sin(2 * math.pi * f * (t / 16000.0) + jitter)
                            for f in freqs
                        )
                    ),
                ),
            )
            for t in range(n)
        ]

    base = tone_mix([440.0, 1320.0, 2750.0])
    gained = tone_mix([440.0, 1320.0, 2750.0], gain=2.0)
    jittered = tone_mix([440.0, 1320.0, 2750.0], jitter=0.01)
    other = tone_mix([615.0, 987.0, 4100.0])
    media = spark.createDataFrame(
        [
            (0, encode_wav_pcm16(base)),
            (1, encode_wav_pcm16(gained)),
            (2, encode_wav_pcm16(jittered)),
            (3, encode_wav_pcm16(other)),
        ],
        ["media_id", "payload"],
    )
    fps = extract_audio_fingerprint(media).collect()
    by_vid = {}
    for r in fps:
        by_vid.setdefault(r.media_id, {})[r.frame_idx] = r.afp
    assert set(by_vid) == {0, 1, 2, 3}
    assert len(by_vid[0]) == (n - 512) // 256 + 1
    # exact gain invariance, window for window
    assert by_vid[0] == by_vid[1]
    # unrelated content differs substantially in at least some windows
    assert by_vid[0] != by_vid[3]

    pairs = {
        (r.id_a, r.id_b)
        for r in audio_neardup_pairs(
            media, radius=6, min_matched_frames=2
        ).collect()
    }
    assert (0, 1) in pairs and (0, 2) in pairs and (1, 2) in pairs, pairs
    assert all(3 not in p for p in pairs), pairs


def test_image_dhash_matches_pure_python_reference_on_random_images(spark):
    """Property: on ARBITRARY images (random geometry incl. smaller
    than the grid, random pixels, gray and RGB), the extractor's
    numpy pooling must equal a numpy-free pure-Python dHash reference
    implementing the same spec — exact integer block means over
    [gx*w//9,(gx+1)*w//9) slices, nearest-pixel fallback for empty
    slices, channel sum // ch grayscale, bit b = gy*8+gx < 60."""
    import random

    from big_data_processing_spark.operators.mediacodec import encode_png
    from big_data_processing_spark.operators.multimodal import (
        extract_image_dhash,
    )

    def ref(w, h, ch, raw):
        gray = [
            [
                sum(raw[(y * w + x) * ch + c] for c in range(ch)) // ch
                for x in range(w)
            ]
            for y in range(h)
        ]
        xs = [gx * w // 9 for gx in range(10)]
        ys = [gy * h // 8 for gy in range(9)]

        def cell(gx, gy):
            x0, x1, y0, y1 = xs[gx], xs[gx + 1], ys[gy], ys[gy + 1]
            if x1 <= x0 or y1 <= y0:
                return gray[min(h - 1, gy * h // 8)][min(w - 1, gx * w // 9)]
            s = sum(gray[y][x] for y in range(y0, y1) for x in range(x0, x1))
            return s // ((y1 - y0) * (x1 - x0))

        hval = 0
        for gy in range(8):
            for gx in range(8):
                b = gy * 8 + gx
                if b >= 60:
                    break
                if cell(gx + 1, gy) > cell(gx, gy):
                    hval |= 1 << b
        return hval

    rng = random.Random(1234)
    rows, want = [], {}
    for i in range(40):
        w, h = rng.randint(1, 24), rng.randint(1, 20)
        ch = rng.choice([1, 3])
        raw = bytes(rng.randrange(256) for _ in range(w * h * ch))
        rows.append((i, encode_png(w, h, ch, raw)))
        want[i] = ref(w, h, ch, raw)
    media = spark.createDataFrame(rows, ["media_id", "payload"])
    got = {r.media_id: r.dhash for r in extract_image_dhash(media).collect()}
    assert got == want


def test_av_neardup_fixture_fingerprints_match_designed(spark):
    """The av_neardup_pairs oracle states DESIGNED fingerprints closed
    form; this pin proves the real decode pipelines recover them
    exactly, per frame, across the id range — the load-bearing link
    between the SQL oracle and the engine's Arrow passes.

    Video: every sampled frame's dHash from the REAL AVI decode must
    equal the closed-form hash of the fixture's 9x8 cell grid.  Audio:
    every analysis window's spectral fingerprint from the REAL WAV
    decode + FFT must equal the designed bit pattern
    (neardup_audio_bit) — i.e. the amplitude-chain margins dominate
    int16 quantization leakage at every (group, member, gain)."""
    from big_data_processing_spark.operators.multimodal import (
        extract_audio_fingerprint,
        extract_video_frame_dhash,
        neardup_audio_bit,
        synthesize_neardup_avi_media,
        synthesize_neardup_wav_media,
    )

    vids = list(range(0, 200, 20))
    auds = list(range(10, 210, 20))
    vdf = spark.createDataFrame([(i,) for i in vids], ["doc_id"])
    adf = spark.createDataFrame([(i,) for i in auds], ["doc_id"])

    def video_hash(mid: int, f: int) -> int:
        k = mid // 20
        g, m = k // 4, k % 2
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
        h = 0
        for gy in range(8):
            for gx in range(8):
                b = gy * 8 + gx
                if b < 60 and cells[gy][gx + 1] > cells[gy][gx]:
                    h |= 1 << b
        return h

    frames = extract_video_frame_dhash(
        synthesize_neardup_avi_media(vdf), every_n=2
    ).collect()
    assert {(r.media_id, r.frame_idx) for r in frames} == {
        (i, f) for i in vids for f in (0, 2)
    }
    for r in frames:
        assert r.n_frames == 4
        assert r.dhash == video_hash(r.media_id, r.frame_idx), (
            r.media_id,
            r.frame_idx,
        )

    def audio_fp(mid: int) -> int:
        k = mid // 20
        g, m = k // 4, k % 4
        return sum(neardup_audio_bit(g, m, k, b) << b for b in range(60))

    afps = extract_audio_fingerprint(
        synthesize_neardup_wav_media(adf)
    ).collect()
    assert {(r.media_id, r.frame_idx) for r in afps} == {
        (i, f) for i in auds for f in (0, 1, 2)
    }
    for r in afps:
        assert r.n_frames == 3
        assert r.afp == audio_fp(r.media_id), (r.media_id, r.frame_idx)
