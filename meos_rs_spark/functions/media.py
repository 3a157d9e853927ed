"""Pure-stdlib media codecs for the multimodal pipeline.

The container ships no PIL/cv2/ffmpeg, but PNG needs none of them: the
format is zlib (stdlib) + per-row difference filters + CRC-32 (binascii).
This module implements a real, spec-complete grayscale-8 PNG codec —
signature and chunk parsing with CRC verification, multi-IDAT inflate, and
all five scanline filter types (None/Sub/Up/Average/Paeth) on decode — so
the engine's image-decode stage (queries/multimodal.py:mm_decode_features)
can run an ACTUAL decode instead of a labeled fake. Exotic codecs (JPEG,
video, audio compression) remain out of scope in this container; the
plumbing they'd ride is the same mapInPandas stage.

Reference: the PNG specification (RFC 2083 / W3C PNG) — chunk layout
§3, IHDR §4.1.1, filter algorithms §6. Independent pins live in
tests/test_media.py: a byte-level PNG hand-assembled WITHOUT this encoder,
hand-filtered rows for each filter type, and corrupt-CRC rejection.
"""

from __future__ import annotations

import binascii
import io
import struct
import wave
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", binascii.crc32(ctype + data) & 0xFFFFFFFF)
    )


def png_encode_gray(pixels: bytes, width: int, height: int) -> bytes:
    """Encode ``width*height`` 8-bit grayscale pixels as a real PNG
    (color type 0, bit depth 8, filter type 0 per scanline)."""
    if len(pixels) != width * height:
        raise ValueError(f"need {width * height} pixels, got {len(pixels)}")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * width : (y + 1) * width] for y in range(height)
    )
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode_gray(data: bytes) -> tuple[int, int, bytes]:
    """Decode a grayscale-8 PNG: verify the signature and every chunk CRC,
    inflate the (possibly split) IDAT stream, reverse the per-row filter.
    Returns (width, height, raw pixels)."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos, width, height, idat = 8, None, None, []
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated PNG: chunk header cut short")
        (length,) = struct.unpack_from(">I", data, pos)
        if pos + 12 + length > len(data):
            raise ValueError("truncated PNG: chunk body/CRC cut short")
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if binascii.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            width, height, depth, ctype_id, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, ctype_id, comp, filt, interlace) != (8, 0, 0, 0, 0):
                raise ValueError(
                    "unsupported PNG variant (need grayscale-8, no interlace)"
                )
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("missing IHDR or IDAT")
    raw = zlib.decompress(b"".join(idat))
    stride = width + 1
    if len(raw) != stride * height:
        raise ValueError("scanline payload size mismatch")
    out = bytearray(width * height)
    for y in range(height):
        ftype = raw[y * stride]
        line = bytearray(raw[y * stride + 1 : (y + 1) * stride])
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for x in range(1, width):
                line[x] = (line[x] + line[x - 1]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(width):
                line[x] = (line[x] + out[(y - 1) * width + x]) & 0xFF if y else line[x]
        elif ftype == 3:  # Average
            for x in range(width):
                a = line[x - 1] if x else 0
                b = out[(y - 1) * width + x] if y else 0
                line[x] = (line[x] + (a + b) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(width):
                a = line[x - 1] if x else 0
                b = out[(y - 1) * width + x] if y else 0
                c = out[(y - 1) * width + x - 1] if (x and y) else 0
                line[x] = (line[x] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ftype}")
        out[y * width : (y + 1) * width] = line
    return width, height, bytes(out)


def wav_decode_pcm16(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PCM WAV via the stdlib wave module (a real RIFF parse):
    returns (n_channels, sample_rate, n_frames, frame bytes)."""
    with wave.open(io.BytesIO(data)) as w:
        if w.getsampwidth() != 2:
            raise ValueError("need 16-bit PCM")
        return (
            w.getnchannels(),
            w.getframerate(),
            w.getnframes(),
            w.readframes(w.getnframes()),
        )
