"""The multimodal decode step is real since round 3: header parsing
against known byte fixtures (hand-built PNG/JPEG/GIF/BMP binaries, not
the synthesizer's own output) and the distributed pipeline over
genuinely valid PNG payloads."""

from __future__ import annotations

import struct
import zlib

from aws_etl_global_footprint_network_spark.operators.multimodal import (
    FEATURE_DIM,
    byte_features,
    decode_image_header,
    synth_png,
)


def _png_fixture(w: int, h: int) -> bytes:
    # hand-assembled, independent of synth_png
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    idat = zlib.compress(b"\x00" * ((w + 1) * h))
    out = b"\x89PNG\r\n\x1a\n"
    for typ, data in ((b"IHDR", ihdr), (b"IDAT", idat), (b"IEND", b"")):
        out += (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )
    return out


def _jpeg_fixture(w: int, h: int) -> bytes:
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_png_header():
    assert decode_image_header(_png_fixture(640, 480)) == ("png", 640, 480)


def test_jpeg_header_walks_segments():
    # SOF0 is NOT the first segment — the walker must skip APP0
    assert decode_image_header(_jpeg_fixture(1024, 768)) == ("jpeg", 1024, 768)


def test_gif_and_bmp_headers():
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 4
    assert decode_image_header(gif) == ("gif", 320, 200)
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 800, -600) + b"\x00" * 4
    assert decode_image_header(bmp) == ("bmp", 800, 600)  # top-down rows


def test_text_is_unknown():
    assert decode_image_header(b"just some document text") == (
        "unknown",
        None,
        None,
    )
    assert decode_image_header(b"") == ("unknown", None, None)


def test_synth_png_is_valid_and_roundtrips():
    p = synth_png(17, 9, b"seed bytes")
    assert decode_image_header(p) == ("png", 17, 9)
    # genuinely well-formed: chunk CRCs verify and the decompressed
    # raster has exactly h*(w+1) filter+pixel bytes
    i = 8
    seen = []
    while i < len(p):
        (length,) = struct.unpack(">I", p[i : i + 4])
        typ = p[i + 4 : i + 8]
        data = p[i + 8 : i + 8 + length]
        (crc,) = struct.unpack(">I", p[i + 8 + length : i + 12 + length])
        assert crc == zlib.crc32(typ + data) & 0xFFFFFFFF, typ
        seen.append(typ)
        if typ == b"IDAT":
            assert len(zlib.decompress(data)) == 9 * (17 + 1)
        i += 12 + length
    assert seen == [b"IHDR", b"IDAT", b"IEND"]


def test_byte_features_real_statistics():
    f = byte_features(b"\x00" * 100)
    assert len(f) == FEATURE_DIM
    assert f[0] == 0.0 and f[2] == 0.0 and f[4] == 1.0  # mean, entropy, zeros
    f2 = byte_features(bytes(range(256)))
    assert abs(f2[2] - 1.0) < 1e-9  # uniform bytes: entropy = 8 bits
    assert f2[6] == 1.0  # all 256 values present


def test_pipeline_decodes_real_png_payloads(spark, sf_dir):
    from aws_etl_global_footprint_network_spark.operators.multimodal import (
        multimodal_features_full,
    )

    df = multimodal_features_full(spark, sf_dir)
    assert df.columns == [
        "doc_id",
        "n_bytes",
        "format",
        "width",
        "height",
        "feature_pos",
        "feature_val",
    ]
    rows = df.filter(df.feature_pos == 0).collect()
    by_id = {r.doc_id: r for r in rows}
    for doc_id, r in by_id.items():
        if doc_id % 4 == 0:
            assert r.format == "png"
            assert r.width == 4 + doc_id % 29 and r.height == 3 + doc_id % 17
        else:
            assert r.format == "unknown" and r.width is None
