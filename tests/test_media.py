"""Independent pins for the pure-stdlib PNG codec (functions/media.py).

Per the golden-provenance discipline (r5 VERDICT): every kernel behind an
oracled query needs at least one test that does NOT go through the kernel's
own twin. Here the decoder is pinned against PNGs hand-assembled from the
spec with stdlib zlib/binascii/struct only — including one scanline of each
filter type with the filtering applied by hand — and the encoder against a
full external re-parse. mm_decode_features' oracle then verifies the
distributed round trip end-to-end.
"""

from __future__ import annotations

import binascii
import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from meos_rs_spark.functions.media import (
    png_decode_gray,
    png_encode_gray,
    wav_decode_pcm16,
)

SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", binascii.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _hand_png(width: int, height: int, scanlines: bytes) -> bytes:
    """Assemble a PNG from already-filtered scanline bytes WITHOUT the
    module's encoder — spec structure only."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scanlines))
        + _chunk(b"IEND", b"")
    )


def test_decode_hand_assembled_unfiltered_png():
    # 3x2 image, filter 0 rows: pixels 10..15
    png = _hand_png(3, 2, b"\x00\x0a\x0b\x0c" + b"\x00\x0d\x0e\x0f")
    assert png_decode_gray(png) == (3, 2, bytes([10, 11, 12, 13, 14, 15]))


def test_decode_every_filter_type_hand_filtered():
    """Target pixels (4 wide, 5 rows): row y = [y*10+1 .. y*10+4]. Each row
    uses a different filter type, with the filtering applied BY HAND per
    the spec's difference equations (left/up/average/Paeth predictors)."""
    rows = [[y * 10 + x for x in range(1, 5)] for y in range(5)]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    sl = bytearray()
    # row 0: None
    sl += b"\x00" + bytes(rows[0])
    # row 1: Sub — x - left
    sl += b"\x01" + bytes(
        [(rows[1][x] - (rows[1][x - 1] if x else 0)) & 0xFF for x in range(4)]
    )
    # row 2: Up — x - above
    sl += b"\x02" + bytes([(rows[2][x] - rows[1][x]) & 0xFF for x in range(4)])
    # row 3: Average — x - (left + above)//2
    sl += b"\x03" + bytes(
        [(rows[3][x] - ((rows[3][x - 1] if x else 0) + rows[2][x]) // 2) & 0xFF
         for x in range(4)]
    )
    # row 4: Paeth — x - paeth(left, above, upper-left)
    sl += b"\x04" + bytes(
        [(rows[4][x] - paeth(rows[4][x - 1] if x else 0, rows[3][x],
                             rows[3][x - 1] if x else 0)) & 0xFF
         for x in range(4)]
    )
    png = _hand_png(4, 5, bytes(sl))
    w, h, pix = png_decode_gray(png)
    assert (w, h) == (4, 5)
    assert list(pix) == [p for row in rows for p in row]


def test_decode_rejects_corrupt_crc_and_bad_signature():
    good = png_encode_gray(bytes(range(6)), 3, 2)
    # flip a byte of the stored CRC FIELD itself (IEND's last 4 bytes)
    crc_corrupt = bytearray(good)
    crc_corrupt[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        png_decode_gray(bytes(crc_corrupt))
    # flip a byte of the chunk TYPE (the 'D' of IEND) — hashed input changes
    type_corrupt = bytearray(good)
    type_corrupt[-5] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        png_decode_gray(bytes(type_corrupt))
    with pytest.raises(ValueError, match="signature"):
        png_decode_gray(b"GIF89a" + good)


def test_decode_rejects_truncation_with_valueerror():
    good = png_encode_gray(bytes(range(6)), 3, 2)
    for cut in (10, len(good) - 2):  # mid-IHDR header, mid-IEND CRC
        with pytest.raises(ValueError, match="truncated"):
            png_decode_gray(good[:cut])


def test_encoder_output_reparses_externally():
    """Full external parse of the encoder's output: chunk walk + CRC check
    + inflate + manual unfilter, no module code on the read side."""
    pixels = bytes((x * 7 + 3) % 256 for x in range(5 * 4))
    data = png_encode_gray(pixels, 5, 4)
    assert data[:8] == SIG
    pos, chunks = 8, []
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + ln)
        assert binascii.crc32(ctype + body) & 0xFFFFFFFF == crc
        chunks.append((ctype, body))
        pos += 12 + ln
    assert [c for c, _ in chunks] == [b"IHDR", b"IDAT", b"IEND"]
    w, h = struct.unpack_from(">II", chunks[0][1])
    assert (w, h) == (5, 4)
    raw = zlib.decompress(chunks[1][1])
    got = b"".join(
        raw[y * (w + 1) + 1 : (y + 1) * (w + 1)] for y in range(h)
    )
    assert raw[:: w + 1] == b"\x00" * h  # filter-0 scanlines
    assert got == pixels


@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=30),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=60, deadline=None)
def test_roundtrip_property(w, h, seed):
    pixels = bytes((seed + i * 2654435761) % 256 for i in range(w * h))
    assert png_decode_gray(png_encode_gray(pixels, w, h)) == (w, h, pixels)


def test_wav_decode_stdlib_roundtrip():
    import io
    import wave

    frames = bytes((i * 31) % 256 for i in range(2 * 2 * 100))  # 100 stereo frames
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(2)
        wv.setsampwidth(2)
        wv.setframerate(16000)
        wv.writeframes(frames)
    nch, rate, nframes, got = wav_decode_pcm16(buf.getvalue())
    assert (nch, rate, nframes) == (2, 16000, 100)
    assert got == frames
