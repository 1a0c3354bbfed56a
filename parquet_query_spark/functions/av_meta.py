"""Pure-Python audio/video container parsers (no codec libraries needed).

Companions to :mod:`parquet_query_spark.functions.image_meta` for the
other two multimodal column classes the engine catalogs:

- **WAV** — walks RIFF chunks: validates ``RIFF .... WAVE``, reads the
  ``fmt `` chunk (PCM format tag, channels, sample rate, bits/sample —
  little-endian, per spec) and the ``data`` chunk size, and derives frame
  count + duration.
- **MP4** — walks the ISO BMFF box tree: validates ``ftyp``, descends
  into ``moov`` for ``mvhd`` (timescale + duration → milliseconds) and
  ``trak``/``tkhd`` (presentation width/height, 16.16 fixed point).

Only *header/metadata* information is read — no sample decode — which is
what a 100 TB cataloging pass needs (duration, geometry, rate, layout).
The matching writers (``make_wav``/``make_mp4``) emit minimal spec-valid
byte streams so the pipeline can synthesize genuine container bytes in an
environment with no media libraries and no binary test media.
"""

from __future__ import annotations

import struct


class MediaParseError(ValueError):
    """Payload is not a parseable WAV/MP4 stream."""


# ── WAV ─────────────────────────────────────────────────────────────────


def wav_info(payload: bytes) -> tuple[int, int, int, int]:
    """(channels, sample_rate, bits_per_sample, n_frames) from RIFF chunks."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise MediaParseError("bad RIFF/WAVE signature")
    pos = 12
    fmt = None
    data_size = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            if size < 16:
                raise MediaParseError("short fmt chunk")
            audio_format, channels, sample_rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if audio_format != 1:  # PCM only — compressed needs a codec
                raise MediaParseError(f"non-PCM format {audio_format}")
            fmt = (channels, sample_rate, bits)
        elif tag == b"data":
            data_size = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data_size is None:
        raise MediaParseError("missing fmt or data chunk")
    channels, sample_rate, bits = fmt
    block_align = channels * bits // 8
    if not block_align:
        raise MediaParseError("zero block align")
    return channels, sample_rate, bits, data_size // block_align


def make_wav(
    channels: int, sample_rate: int, bits: int, n_frames: int
) -> bytes:
    """Minimal PCM WAV: RIFF + fmt + zero-filled data chunk."""
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    data = bytes(n_frames * block_align)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, bits
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


# ── MP4 (ISO base media file format) ────────────────────────────────────


def _iter_boxes(payload: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        if size < 8 or pos + size > end:
            raise MediaParseError(f"bad box size {size} for {tag!r}")
        yield tag, pos + 8, pos + size
        pos += size


def mp4_info(payload: bytes) -> tuple[int, int, int]:
    """(width, height, duration_ms) from moov/mvhd + trak/tkhd."""
    top = {t: (s, e) for t, s, e in _iter_boxes(payload, 0, len(payload))}
    if b"ftyp" not in top or b"moov" not in top:
        raise MediaParseError("missing ftyp/moov")
    moov_s, moov_e = top[b"moov"]
    duration_ms = width = height = None
    for tag, s, e in _iter_boxes(payload, moov_s, moov_e):
        if tag == b"mvhd":
            version = payload[s]
            if version == 0:
                timescale, duration = struct.unpack(">II", payload[s + 12 : s + 20])
            else:
                timescale, duration = struct.unpack(
                    ">IQ", payload[s + 20 : s + 32]
                )
            if not timescale:
                raise MediaParseError("zero timescale")
            duration_ms = duration * 1000 // timescale
        elif tag == b"trak":
            for t2, s2, e2 in _iter_boxes(payload, s, e):
                if t2 == b"tkhd":
                    # width/height are the last two u32s, 16.16 fixed point
                    w_fixed, h_fixed = struct.unpack(">II", payload[e2 - 8 : e2])
                    width, height = w_fixed >> 16, h_fixed >> 16
    if duration_ms is None or width is None or height is None:
        raise MediaParseError("missing mvhd or tkhd")
    return width, height, duration_ms


def _box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + tag + body


def make_mp4(width: int, height: int, duration_ms: int, timescale: int = 1000) -> bytes:
    """Minimal ISO BMFF: ftyp + moov(mvhd + trak(tkhd)); header-only."""
    duration = duration_ms * timescale // 1000
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mvhd = _box(
        b"mvhd",
        struct.pack(">B3x", 0)  # version 0 + flags
        + struct.pack(">II", 0, 0)  # creation/modification time
        + struct.pack(">II", timescale, duration)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H", 0x0100)  # volume 1.0
        + bytes(10)  # reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + bytes(24)  # pre-defined
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = _box(
        b"tkhd",
        struct.pack(">B3x", 0)
        + struct.pack(">III", 0, 0, 1)  # times + track id
        + bytes(4)  # reserved
        + struct.pack(">I", duration)
        + bytes(8)  # reserved
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer/group/volume/reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    moov = _box(b"moov", mvhd + _box(b"trak", tkhd))
    return ftyp + moov


MP4_STREAM_BYTES = len(make_mp4(1, 1, 1))  # size is geometry-independent
