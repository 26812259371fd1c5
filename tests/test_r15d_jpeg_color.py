"""Round-15 batch D: the color (YCbCr 4:2:0) JPEG lane — interleaved
MCU codec fidelity, per-channel exactness on constant blocks,
cross-lane rejection, and the Spark decode stats."""

from __future__ import annotations

import numpy as np
import pytest

from banking_data_etl_pipeline_spark.multimodal import jpeg as J
from banking_data_etl_pipeline_spark.sources import tables
from conftest import SF_DIR


def _planes(d: int):
    bw, bh = J._mcus_of(d)
    y = np.zeros((bh * 16, bw * 16), dtype=np.uint8)
    for by in range(bh * 2):
        for bx in range(bw * 2):
            y[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = J._block_val(
                d, bx, by
            )
    cb = np.zeros((bh * 8, bw * 8), dtype=np.uint8)
    cr = np.zeros_like(cb)
    for my in range(bh):
        for mx in range(bw):
            cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = J._chroma_val(
                d, mx, my, 0
            )
            cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = J._chroma_val(
                d, mx, my, 1
            )
    return y, cb, cr


def test_constant_blocks_roundtrip_exactly_per_channel():
    for d in (0, 1, 5, 7, 123, 254):
        y, cb, cr = _planes(d)
        dec = J.decode_color_jpeg(J.encode_color_jpeg(y, cb, cr))
        assert dec is not None
        dy, dcb, dcr = dec
        assert (dy == y).all() and (dcb == cb).all() and (dcr == cr).all()


def test_general_raster_color_fidelity():
    rng = np.arange(32 * 32, dtype=np.int64)
    y = ((rng * 17 + 5) % 256).astype(np.uint8).reshape(32, 32)
    cb = ((rng[:256] * 7 + 9) % 256).astype(np.uint8).reshape(16, 16)
    cr = ((rng[:256] * 11 + 3) % 256).astype(np.uint8).reshape(16, 16)
    dec = J.decode_color_jpeg(J.encode_color_jpeg(y, cb, cr))
    assert dec is not None
    for got, want in zip(dec, (y, cb, cr)):
        assert got.shape == want.shape
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_dc_predictors_are_per_component():
    """Flat mid-gray luma with strongly different chroma: wrong
    predictor sharing would smear DC across components."""
    y = np.full((16, 16), 128, dtype=np.uint8)
    cb = np.full((8, 8), 255, dtype=np.uint8)
    cr = np.zeros((8, 8), dtype=np.uint8)
    dy, dcb, dcr = J.decode_color_jpeg(J.encode_color_jpeg(y, cb, cr))
    assert (dy == 128).all() and (dcb == 255).all() and (dcr == 0).all()


def test_cross_lane_rejection():
    y, cb, cr = _planes(3)
    color = J.encode_color_jpeg(y, cb, cr)
    gray = J.encode_gray_jpeg(y)
    assert J.decode_gray_jpeg(color) is None
    assert J.decode_color_jpeg(gray) is None


def test_color_decoder_honors_pixel_budget():
    import struct

    def seg(marker, body):
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    sof = (
        bytes([8])
        + struct.pack(">HH", 65520, 65520)
        + bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    )
    payload = b"\xff\xd8" + seg(0xDB, bytes([0]) + bytes([1] * 64)) + seg(
        0xC0, sof
    ) + b"\xff\xd9"
    assert J.decode_color_jpeg(payload) is None


def test_encode_rejects_unaligned_planes():
    with pytest.raises(ValueError):
        J.encode_color_jpeg(
            np.zeros((24, 24), dtype=np.uint8),
            np.zeros((12, 12), dtype=np.uint8),
            np.zeros((12, 12), dtype=np.uint8),
        )


def test_spark_color_stats_match_synthesis(spark):
    docs = tables.load(spark, SF_DIR, "documents").limit(20)
    out = J.decode_color_jpeg_stats(J.synthesize_color_jpeg(docs)).collect()
    assert len(out) == 20
    for r in out:
        d = int(r.media_id)
        bw, bh = J._mcus_of(d)
        assert (r.width, r.height) == (16 * bw, 16 * bh)
        assert r.n_px == 256 * bw * bh
        want_y = 64 * sum(
            J._block_val(d, bx, by)
            for by in range(bh * 2)
            for bx in range(bw * 2)
        )
        want_cb = 64 * sum(
            J._chroma_val(d, mx, my, 0)
            for my in range(bh)
            for mx in range(bw)
        )
        assert (r.sum_y, r.sum_cb) == (want_y, want_cb)
