"""Pure-Python image container parsers (no codec libraries needed).

Real header parsers for the three ubiquitous raster containers:

- **PNG** — validates the 8-byte signature, reads width/height from the
  IHDR chunk (big-endian u32) and verifies the IHDR CRC-32.
- **JPEG** — walks the marker segments from SOI to the first SOF*n*
  frame header (C0–CF minus C4/C8/CC) and reads height/width
  (big-endian u16, in that order).
- **GIF** — validates the GIF87a/GIF89a signature and reads the logical
  screen descriptor (little-endian u16 — byte order differs from
  PNG/JPEG on purpose in the spec, and in these tests).

These work on any real .png/.jpg/.gif file — only *header* information
is read, which is exactly what a 100 TB cataloging pass needs (width,
height, format) without paying for pixel decode.  The matching writers
(`make_png`/`make_jpeg`/`make_gif`) emit minimal spec-valid byte streams
and exist so the pipeline can synthesize genuine container bytes in an
environment with no image libraries and no binary test media.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"
GIF_SIGNATURES = (b"GIF87a", b"GIF89a")
# SOF markers carrying frame dimensions; C4=DHT, C8=JPG-extension, CC=DAC
_JPEG_SOF = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}
_JPEG_STANDALONE = {0xD8, 0xD9, 0x01} | set(range(0xD0, 0xD8))  # SOI/EOI/TEM/RSTn


class ImageParseError(ValueError):
    """Payload is not a parseable PNG/JPEG/GIF stream."""


def sniff_format(payload: bytes) -> str | None:
    """Magic-number container detection; None for unknown payloads."""
    if payload[:8] == PNG_SIGNATURE:
        return "png"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    if payload[:6] in GIF_SIGNATURES:
        return "gif"
    return None


def png_dimensions(payload: bytes) -> tuple[int, int]:
    """(width, height) from the IHDR chunk, CRC-verified."""
    if payload[:8] != PNG_SIGNATURE:
        raise ImageParseError("bad PNG signature")
    if len(payload) < 33 or payload[12:16] != b"IHDR":
        raise ImageParseError("missing IHDR")
    (length,) = struct.unpack(">I", payload[8:12])
    if length != 13:
        raise ImageParseError(f"IHDR length {length} != 13")
    ihdr = payload[16:29]
    (crc,) = struct.unpack(">I", payload[29:33])
    if zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF != crc:
        raise ImageParseError("IHDR CRC mismatch")
    width, height = struct.unpack(">II", ihdr[:8])
    if not width or not height:
        raise ImageParseError("zero dimension")
    return width, height


def jpeg_dimensions(payload: bytes) -> tuple[int, int]:
    """(width, height) from the first SOF frame header."""
    if payload[:2] != b"\xff\xd8":
        raise ImageParseError("bad JPEG SOI")
    pos = 2
    while pos + 1 < len(payload):
        if payload[pos] != 0xFF:
            raise ImageParseError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker in _JPEG_STANDALONE:
            pos += 2
            continue
        if pos + 4 > len(payload):
            raise ImageParseError("truncated segment header")
        (seg_len,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if marker in _JPEG_SOF:
            if pos + 9 > len(payload):
                raise ImageParseError("truncated SOF")
            height, width = struct.unpack(">HH", payload[pos + 5 : pos + 9])
            if not width or not height:
                raise ImageParseError("zero dimension")
            return width, height
        pos += 2 + seg_len
    raise ImageParseError("no SOF marker found")


def gif_dimensions(payload: bytes) -> tuple[int, int]:
    """(width, height) from the logical screen descriptor."""
    if payload[:6] not in GIF_SIGNATURES:
        raise ImageParseError("bad GIF signature")
    if len(payload) < 10:
        raise ImageParseError("truncated screen descriptor")
    width, height = struct.unpack("<HH", payload[6:10])
    if not width or not height:
        raise ImageParseError("zero dimension")
    return width, height


def image_dimensions(payload: bytes) -> tuple[str, int, int]:
    """(format, width, height) for any supported container."""
    fmt = sniff_format(payload)
    if fmt == "png":
        return ("png", *png_dimensions(payload))
    if fmt == "jpeg":
        return ("jpeg", *jpeg_dimensions(payload))
    if fmt == "gif":
        return ("gif", *gif_dimensions(payload))
    raise ImageParseError("unknown container")


# ── writers: minimal spec-valid streams (fixed sizes, header-only) ──────

PNG_STREAM_BYTES = 45  # 8 sig + (12+13) IHDR + 12 IEND
JPEG_STREAM_BYTES = 41  # 2 SOI + 18 APP0/JFIF + 19 SOF0 + 2 EOI
GIF_STREAM_BYTES = 14  # 6 sig + 7 screen descriptor + 1 trailer


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def make_png(width: int, height: int) -> bytes:
    """Signature + IHDR (8-bit RGB) + IEND; 45 bytes."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return PNG_SIGNATURE + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IEND", b"")


def make_jpeg(width: int, height: int) -> bytes:
    """SOI + APP0/JFIF + SOF0 (3-component baseline) + EOI; 41 bytes."""
    app0 = (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00"
        + bytes([1, 1, 0])
        + struct.pack(">HH", 72, 72)
        + bytes([0, 0])
    )
    sof_payload = struct.pack(">BHHB", 8, height, width, 3) + bytes(
        [1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    sof0 = b"\xff\xc0" + struct.pack(">H", 2 + len(sof_payload)) + sof_payload
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def make_gif(width: int, height: int) -> bytes:
    """GIF89a + screen descriptor (no GCT) + trailer; 14 bytes."""
    return (
        b"GIF89a"
        + struct.pack("<HH", width, height)
        + bytes([0x70, 0, 0])
        + b"\x3b"
    )
