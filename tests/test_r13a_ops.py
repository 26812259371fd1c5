"""Round-13 operators, batch A: the zlib-PNG real-decode lane.

Reference parity note: the reference pipeline (batch_pipeline1.py) has
no media surface at all — this lane is extension-brief coverage
(multimodal decode plumbing), tested the same way as the r12 PPM/PCM
positive paths.
"""

from __future__ import annotations

import struct
import zlib

import pandas as pd
import pytest

from banking_data_etl_pipeline_spark.multimodal import binaryops
from banking_data_etl_pipeline_spark.sources import tables
from conftest import SF_DIR


# ------------------------------------------------------------- pure python


def _raster(d: int) -> tuple[int, int, bytes]:
    w, h = 8 + d % 13, 8 + d % 11
    return w, h, bytes((d * 131 + i * 17) % 256 for i in range(w * h * 3))


def test_png_filter_roundtrip_covers_all_five_types():
    for d in (0, 1, 2, 3, 4, 13, 100, 997):
        w, h, raw = _raster(d)
        filtered = binaryops._png_filter_lines(raw, w, h, d)
        # every scanline carries its filter-type byte; h >= 8 > 5 so
        # all five spec filters appear on every image
        types = {filtered[r * (1 + w * 3)] for r in range(h)}
        assert types == {0, 1, 2, 3, 4}
        assert binaryops._png_unfilter(filtered, w, h) == raw


def test_png_unfilter_rejects_malformed():
    w, h, raw = _raster(7)
    filtered = binaryops._png_filter_lines(raw, w, h, 7)
    assert binaryops._png_unfilter(filtered[:-1], w, h) is None  # truncated
    bad = bytearray(filtered)
    bad[0] = 9  # unknown filter type
    assert binaryops._png_unfilter(bytes(bad), w, h) is None


def test_parse_png_checks_crc_and_shape():
    w, h, raw = _raster(42)
    z = zlib.compress(binaryops._png_filter_lines(raw, w, h, 42), 6)
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    payload = (
        binaryops.PNG_SIG
        + binaryops._png_chunk_bytes(b"IHDR", ihdr)
        + binaryops._png_chunk_bytes(b"IDAT", z)
        + binaryops._png_chunk_bytes(b"IEND", b"")
    )
    pw, ph, zd = binaryops.parse_png(payload)
    assert (pw, ph) == (w, h) and zlib.decompress(zd) == \
        binaryops._png_filter_lines(raw, w, h, 42)
    # corrupt one IDAT data byte -> CRC mismatch -> None
    bad = bytearray(payload)
    bad[8 + 25 + 8 + 3] ^= 0xFF
    assert binaryops.parse_png(bytes(bad)) is None
    # wrong color type
    bad_ihdr = struct.pack(">II", w, h) + b"\x08\x00\x00\x00\x00"
    p2 = (
        binaryops.PNG_SIG
        + binaryops._png_chunk_bytes(b"IHDR", bad_ihdr)
        + binaryops._png_chunk_bytes(b"IDAT", z)
        + binaryops._png_chunk_bytes(b"IEND", b"")
    )
    assert binaryops.parse_png(p2) is None
    assert binaryops.parse_png(payload[:30]) is None
    assert binaryops.parse_png(b"") is None


# ------------------------------------------------------------- spark lane


def test_synthesize_png_is_real_multi_idat_png(spark):
    docs = tables.load(spark, SF_DIR, "documents")
    media = binaryops.synthesize_png(docs)
    rows = media.orderBy("media_id").limit(6).collect()
    for r in rows:
        payload = bytes(r.payload)
        parsed = binaryops.parse_png(payload)
        assert parsed is not None
        w, h, zd = parsed
        assert (w, h) == (8 + r.media_id % 13, 8 + r.media_id % 11)
        raw = binaryops._png_unfilter(zlib.decompress(zd), w, h)
        _, _, expect = _raster(int(r.media_id))
        assert raw == expect
        assert r.meta.mime == "image/png"
        assert r.meta.n_bytes == len(payload)
        # ≤64-byte IDAT split: every compressed stream here exceeds 64
        # bytes, so the multi-IDAT concat path is genuinely exercised
        assert payload.count(b"IDAT") >= 2


def test_decode_png_matches_formula_and_nulls_malformed(spark):
    docs = tables.load(spark, SF_DIR, "documents").limit(20)
    media = binaryops.synthesize_png(docs)
    got = {
        r.media_id: r
        for r in binaryops.decode_png(media).collect()
    }
    for d, r in got.items():
        w, h, raw = _raster(int(d))
        assert (r.width, r.height, r.n_px) == (w, h, w * h)
        sums = [0, 0, 0]
        for i, b in enumerate(raw):
            sums[i % 3] += b
        assert (r.sum_r, r.sum_g, r.sum_b) == tuple(sums)
    # corrupt payloads decode to null stats, never raise
    corrupt = media.limit(3).selectExpr(
        "media_id",
        "substring(payload, 1, octet_length(payload) - 7) AS payload",
    )
    bad = binaryops.decode_png(corrupt).collect()
    assert len(bad) == 3
    assert all(r.width is None and r.sum_r is None for r in bad)
