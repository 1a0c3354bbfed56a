"""Unit tests for the pure-Python WAV/MP4 container parsers."""

import struct

import pytest

from parquet_query_spark.functions.av_meta import (
    MP4_STREAM_BYTES,
    MediaParseError,
    make_mp4,
    make_wav,
    mp4_info,
    wav_info,
)


@pytest.mark.parametrize(
    "channels,rate,bits,frames",
    [(1, 8000, 16, 1), (2, 44100, 16, 999), (1, 16000, 8, 250), (2, 48000, 24, 10)],
)
def test_wav_roundtrip(channels, rate, bits, frames):
    payload = make_wav(channels, rate, bits, frames)
    assert wav_info(payload) == (channels, rate, bits, frames)
    # exact size: 44-byte header + frames * block_align
    assert len(payload) == 44 + frames * channels * bits // 8


def test_wav_rejects_bad_signature():
    with pytest.raises(MediaParseError):
        wav_info(b"RIFX" + bytes(40))
    with pytest.raises(MediaParseError):
        wav_info(b"RIFF" + struct.pack("<I", 36) + b"AVI " + bytes(32))


def test_wav_rejects_non_pcm():
    payload = bytearray(make_wav(1, 8000, 16, 4))
    payload[20] = 85  # format tag -> 0x55 (MP3)
    with pytest.raises(MediaParseError):
        wav_info(bytes(payload))


def test_wav_missing_data_chunk():
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(MediaParseError):
        wav_info(payload)


@pytest.mark.parametrize(
    "w,h,ms", [(1, 1, 1), (1920, 1080, 60000), (640, 480, 1234), (64, 1079, 59999)]
)
def test_mp4_roundtrip(w, h, ms):
    payload = make_mp4(w, h, ms)
    assert mp4_info(payload) == (w, h, ms)
    assert len(payload) == MP4_STREAM_BYTES  # geometry-independent size


def test_mp4_timescale_conversion():
    # duration stored in timescale units; parser converts back to ms
    payload = make_mp4(100, 100, 2500, timescale=90000)
    assert mp4_info(payload)[2] == 2500


def test_mp4_rejects_missing_boxes():
    with pytest.raises(MediaParseError):
        mp4_info(make_mp4(1, 1, 1)[: MP4_STREAM_BYTES // 2])  # truncated moov
    ftyp_only = make_mp4(1, 1, 1)[:28]
    with pytest.raises(MediaParseError):
        mp4_info(ftyp_only)


def test_mp4_rejects_bad_box_size():
    payload = bytearray(make_mp4(1, 1, 1))
    payload[0:4] = struct.pack(">I", 4)  # box size < 8 is invalid
    with pytest.raises(MediaParseError):
        mp4_info(bytes(payload))
