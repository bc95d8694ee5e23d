"""Pure-stdlib media codecs for the multimodal operators.

The sandbox (and many locked-down clusters) has no PIL/ffmpeg, but PNG
and WAV are fully public formats decodable with zlib/struct/wave alone —
so image decode, image resize, and audio decode are REAL here, not
stubs: the bytes are parsed, defiltered, and measured. Formats beyond
these (JPEG, video codecs) raise a clearly-marked ``MediaCodecError``
and keep flowing through the same Spark plumbing via the stub
extractors in multimodal.py.

Everything here is executor-side pure-Python/numpy called from Arrow
``mapInPandas`` batches (multimodal.py): no Spark imports, no state.

PNG subset: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA), non-interlaced; all five scanline filters (None/Sub/Up/
Average/Paeth) are implemented in decode. The encoder cycles filters
0/1/2 per row so round-trip tests genuinely exercise defiltering.

WAV subset: PCM16 mono/stereo via the stdlib ``wave`` module.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib


class MediaCodecError(ValueError):
    """Unsupported or malformed media payload (e.g. JPEG without PIL,
    palette/interlaced PNG): callers route these rows to a quarantine
    column instead of failing the batch."""


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, channels: int, raw: bytes) -> bytes:
    """Minimal PNG writer for 8-bit gray(1)/RGB(3)/RGBA(4) images.

    ``raw`` is width*height*channels bytes, row-major. Rows are written
    with filter type row%3 (None/Sub/Up) — deterministic output AND a
    real defilter exercise for the decoder."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(raw) != stride * height:
        raise MediaCodecError(
            f"encode_png: got {len(raw)} bytes for {width}x{height}x{channels}"
        )
    lines = []
    prev = bytes(stride)
    for y in range(height):
        row = raw[y * stride : (y + 1) * stride]
        f = y % 3
        if f == 0:
            enc = row
        elif f == 1:  # Sub
            enc = bytes(
                (row[x] - (row[x - channels] if x >= channels else 0)) & 0xFF
                for x in range(stride)
            )
        else:  # Up
            enc = bytes((row[x] - prev[x]) & 0xFF for x in range(stride))
        lines.append(bytes([f]) + enc)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(lines), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Real PNG decode: (width, height, channels, raw pixel bytes).

    Parses chunks, inflates IDAT, and undoes all five scanline filters.
    Raises :class:`MediaCodecError` on non-PNG payloads and on the
    unsupported subset (palette, interlaced, 16-bit)."""
    import numpy as np

    if data[:8] != _PNG_SIG:
        raise MediaCodecError("not a PNG payload")
    pos, width = 8, None
    idat = bytearray()
    height = channels = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color not in _CHANNELS or interlace != 0:
                raise MediaCodecError(
                    f"unsupported PNG (depth={depth} color={color} "
                    f"interlace={interlace})"
                )
            channels = _CHANNELS[color]
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if width is None or not idat:
        raise MediaCodecError("PNG missing IHDR/IDAT")
    flat = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(flat) != (stride + 1) * height:
        raise MediaCodecError("PNG scanline size mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        line = flat[y * (stride + 1) : (y + 1) * (stride + 1)]
        f, enc = line[0], np.frombuffer(line[1:], dtype=np.uint8).astype(np.int32)
        if f == 0:
            row = enc
        elif f == 2:  # Up
            row = (enc + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth need left-to-right
            row = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = row[x - channels] if x >= channels else 0
                b = prev[x]
                c = prev[x - channels] if x >= channels else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (enc[x] + pred) & 0xFF
        else:
            raise MediaCodecError(f"unknown PNG filter {f}")
        out[y] = row
        prev = row
    return width, height, channels, out.tobytes()


def resize_nearest(
    width: int, height: int, channels: int, raw: bytes, out_w: int, out_h: int
) -> bytes:
    """Nearest-neighbor resample of decoded pixels (numpy gather) —
    the real geometry transform behind resize_images."""
    import numpy as np

    img = np.frombuffer(raw, dtype=np.uint8).reshape(height, width, channels)
    ys = (np.arange(out_h) * height) // out_h
    xs = (np.arange(out_w) * width) // out_w
    return img[ys][:, xs].tobytes()


def encode_wav_pcm16(samples: list[int], rate: int = 16000, channels: int = 1) -> bytes:
    """Minimal PCM16 WAV writer (stdlib wave) for fixtures/tests."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav_pcm16(data: bytes) -> tuple[int, int, list[int]]:
    """Real WAV decode via stdlib wave: (rate, channels, samples).
    Raises :class:`MediaCodecError` on non-PCM16/compressed payloads."""
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            if w.getsampwidth() != 2:
                raise MediaCodecError(
                    f"unsupported WAV sample width {w.getsampwidth()}"
                )
            n = w.getnframes()
            frames = w.readframes(n)
            samples = list(struct.unpack(f"<{n * w.getnchannels()}h", frames))
            return w.getframerate(), w.getnchannels(), samples
    except wave.Error as e:
        raise MediaCodecError(f"not a PCM WAV payload: {e}") from e
