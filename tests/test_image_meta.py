"""Direct tests for the pure-Python image container parsers.

These run with no Spark session: writer→parser round-trips, byte-order
checks, and corruption detection (a parser that ignores CRCs or trusts
the sniffed format would pass parity but fail here).
"""

import struct
import zlib

import pytest

from parquet_query_spark.functions.image_meta import (
    GIF_STREAM_BYTES,
    JPEG_STREAM_BYTES,
    PNG_STREAM_BYTES,
    ImageParseError,
    gif_dimensions,
    image_dimensions,
    jpeg_dimensions,
    make_gif,
    make_jpeg,
    make_png,
    png_dimensions,
    sniff_format,
)

DIMS = [(1, 1), (64, 64), (640, 480), (1919, 1079), (65535, 65535)]


@pytest.mark.parametrize("w,h", DIMS)
def test_round_trip_all_formats(w, h):
    assert image_dimensions(make_png(w, h)) == ("png", w, h)
    assert image_dimensions(make_jpeg(w, h)) == ("jpeg", w, h)
    assert image_dimensions(make_gif(w, h)) == ("gif", w, h)


def test_stream_sizes_are_fixed():
    assert len(make_png(800, 600)) == PNG_STREAM_BYTES
    assert len(make_jpeg(800, 600)) == JPEG_STREAM_BYTES
    assert len(make_gif(800, 600)) == GIF_STREAM_BYTES


def test_sniff_format():
    assert sniff_format(make_png(2, 2)) == "png"
    assert sniff_format(make_jpeg(2, 2)) == "jpeg"
    assert sniff_format(make_gif(2, 2)) == "gif"
    assert sniff_format(b"plain text") is None
    assert sniff_format(b"") is None


def test_png_crc_is_verified():
    data = bytearray(make_png(320, 240))
    data[20] ^= 0x01  # flip a height bit without fixing the CRC
    with pytest.raises(ImageParseError, match="CRC"):
        png_dimensions(bytes(data))


def test_png_bad_signature():
    with pytest.raises(ImageParseError):
        png_dimensions(b"\x89PNX\r\n\x1a\n" + make_png(2, 2)[8:])


def test_jpeg_skips_leading_segments():
    # dimensions live in SOF0, *after* APP0 — a parser reading a fixed
    # offset instead of walking markers would return APP0 density bytes
    payload = make_jpeg(1234, 567)
    assert jpeg_dimensions(payload) == (1234, 567)
    # insert an extra COM segment before SOF0 and it still parses
    com = b"\xff\xfe" + struct.pack(">H", 2 + 5) + b"hello"
    patched = payload[:20] + com + payload[20:]
    assert jpeg_dimensions(patched) == (1234, 567)


def test_jpeg_height_before_width():
    # SOF stores height first; a swapped parser fails on non-square
    assert jpeg_dimensions(make_jpeg(100, 200)) == (100, 200)


def test_jpeg_no_sof():
    with pytest.raises(ImageParseError, match="SOF"):
        jpeg_dimensions(b"\xff\xd8\xff\xd9")


def test_gif_is_little_endian():
    # 0x0102 wide: LE bytes are 02 01 — a big-endian parser reads 0x0201
    payload = make_gif(0x0102, 0x0304)
    assert payload[6:8] == b"\x02\x01"
    assert gif_dimensions(payload) == (0x0102, 0x0304)


def test_real_png_fixture_from_zlib():
    # hand-built PNG with a real IDAT (1x1 white RGB pixel) — proves the
    # parser handles streams with pixel data, not only our minimal writer
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"\x00\xff\xff\xff")  # filter 0 + RGB
    png = sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    assert image_dimensions(png) == ("png", 1, 1)


def test_unknown_container():
    with pytest.raises(ImageParseError):
        image_dimensions(b"RIFF....WEBP")
