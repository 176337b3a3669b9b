"""Codec-level unit tests for operators.multimodal_codecs: the PNG
decoder against hand-filtered fixtures (all five filter types), the
nearest-neighbor resampler against a known raster, the WAV round-trip
with hand-computed features, and the video container demux. The
query-level differential coverage (decoded content vs the oracle's
generative formula) lives in test_oracle_parity."""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from aws_etl_global_footprint_network_spark.operators.multimodal import synth_png
from aws_etl_global_footprint_network_spark.operators.multimodal_codecs import (
    decode_png_gray,
    demux_frames,
    encode_png_gray,
    resize_nn,
    synth_video,
    synth_wav,
)


def _png_with_filters(width, height, raster, ftypes):
    """Build a valid PNG whose scanlines use the given per-row filter
    types — the forward-filter twin of the decoder's unfilter."""

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    raw = b""
    prev = bytes(width)
    for r in range(height):
        line = raster[r * width : (r + 1) * width]
        ftype = ftypes[r % len(ftypes)]
        out = bytearray(width)
        for c in range(width):
            a = line[c - 1] if c else 0
            b, cc = prev[c], (prev[c - 1] if c else 0)
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
            out[c] = (line[c] - pred) & 0xFF
        raw += bytes([ftype]) + bytes(out)
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_decode_synth_png_reproduces_seed_cycling():
    seed = b"training-data"
    w, h, raster = decode_png_gray(synth_png(7, 5, seed))
    assert (w, h) == (7, 5)
    expected = bytes(seed[(r * 7 + c) % len(seed)] for r in range(5) for c in range(7))
    assert bytes(raster) == expected


@pytest.mark.parametrize("ftypes", [(0,), (1,), (2,), (3,), (4,), (0, 1, 2, 3, 4)])
def test_unfilter_all_png_filter_types(ftypes):
    rng = np.random.RandomState(42)
    raster = bytes(rng.randint(0, 256, 6 * 9, dtype=np.uint8))
    payload = _png_with_filters(6, 9, raster, ftypes)
    w, h, decoded = decode_png_gray(payload)
    assert (w, h) == (6, 9)
    assert bytes(decoded) == raster


def test_encode_decode_round_trip():
    raster = bytes(range(12))
    w, h, decoded = decode_png_gray(encode_png_gray(4, 3, raster))
    assert (w, h, bytes(decoded)) == (4, 3, raster)


def test_resize_nn_known_fixture():
    # 4x4 -> 2x2: out[r][c] = in[r*4//2][c*4//2] = in[2r][2c]
    raster = bytes(range(16))
    thumb = resize_nn(raster, 4, 4, 2, 2)
    assert bytes(thumb) == bytes([0, 2, 8, 10])
    # odd-size halving: 5x3 -> 3x2 uses the floor mapping
    raster = bytes(range(15))
    thumb = resize_nn(raster, 5, 3, 3, 2)
    rows = [r * 3 // 2 for r in range(2)]
    cols = [c * 5 // 3 for c in range(3)]
    assert bytes(thumb) == bytes(raster[r * 5 + c] for r in rows for c in cols)


def test_wav_round_trip_and_features():
    samples = np.array([0, 1000, -1000, 32767, -32768], dtype=np.int64)
    payload = synth_wav(11000, samples.astype(np.int16))
    with wave.open(io.BytesIO(payload), "rb") as w:
        assert w.getframerate() == 11000
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        back = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    assert (back == samples).all()
    assert int((samples * samples).sum()) == 2000000 + 32767**2 + 32768**2
    assert int(np.abs(samples).max()) == 32768


def test_video_container_demux_and_frame_decode():
    text = b"abcdefghij"
    payload = synth_video(10, text)  # n_frames=2+10%7=5, fw=4+10%13=14, fh=3+10%11=13
    n_frames, fw, fh, frames = demux_frames(payload)
    assert (n_frames, fw, fh) == (5, 14, 13)
    assert len(frames) == 5
    n = len(text)
    for f in (0, 3):
        w, h, raster = decode_png_gray(frames[f])
        assert (w, h) == (14, 13)
        expected = bytes(text[(f + k % n) % n] for k in range(14 * 13))
        assert bytes(raster) == expected


def test_decoder_rejects_non_png():
    with pytest.raises(ValueError):
        decode_png_gray(b"not a png at all")
    with pytest.raises(ValueError):
        demux_frames(b"XXXX\x00\x00")


# ---- property tests: round-trips on arbitrary content ----------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    data=st.binary(min_size=1, max_size=24 * 24),
)
def test_property_png_encode_decode_round_trip(w, h, data):
    raster = bytes((data * ((w * h) // len(data) + 1))[: w * h])
    dw, dh, decoded = decode_png_gray(encode_png_gray(w, h, raster))
    assert (dw, dh, bytes(decoded)) == (w, h, raster)


@settings(max_examples=30, deadline=None)
@given(
    rate=st.integers(1, 192_000),
    samples=st.lists(
        st.integers(-32768, 32767), min_size=0, max_size=200
    ),
)
def test_property_wav_round_trip(rate, samples):
    import numpy as np

    arr = np.array(samples, dtype=np.int16)
    payload = synth_wav(rate, arr)
    with wave.open(io.BytesIO(payload), "rb") as w:
        assert w.getframerate() == rate
        assert w.getnframes() == len(samples)
        back = np.frombuffer(w.readframes(len(samples)), dtype="<i2")
    assert (back == arr).all()


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(1, 16),
    h=st.integers(1, 16),
    tw=st.integers(1, 16),
    th=st.integers(1, 16),
    data=st.binary(min_size=1, max_size=64),
)
def test_property_resize_nn_matches_floor_mapping(w, h, tw, th, data):
    raster = bytes((data * (w * h // len(data) + 1))[: w * h])
    out = resize_nn(raster, w, h, tw, th)
    expected = bytes(
        raster[(r * h // th) * w + (c * w // tw)]
        for r in range(th)
        for c in range(tw)
    )
    assert bytes(out) == expected
