"""Round-14 batch B: the REAL baseline JPEG lane (grayscale T.81
sequential) — codec-level bitstream fidelity, exactness on constant
blocks, malformation handling, and the Spark decode stats."""

from __future__ import annotations

import struct

import numpy as np

from banking_data_etl_pipeline_spark.multimodal import jpeg as J
from banking_data_etl_pipeline_spark.sources import tables
from conftest import SF_DIR


def _constant_image(d: int) -> np.ndarray:
    bw_, bh_ = J._blocks_of(d)
    px = np.zeros((bh_ * 8, bw_ * 8), dtype=np.uint8)
    for by in range(bh_):
        for bx in range(bw_):
            px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = J._block_val(
                d, bx, by
            )
    return px


def test_zigzag_is_the_standard_order():
    # spot-pin the spec order (T.81 Figure 5) at the known positions
    assert J.ZIGZAG[0] == (0, 0)
    assert J.ZIGZAG[1] == (0, 1)
    assert J.ZIGZAG[2] == (1, 0)
    assert J.ZIGZAG[3] == (2, 0)
    assert J.ZIGZAG[4] == (1, 1)
    assert J.ZIGZAG[5] == (0, 2)
    assert J.ZIGZAG[63] == (7, 7)
    assert len(set(J.ZIGZAG)) == 64


def test_constant_blocks_roundtrip_exactly():
    for d in (0, 1, 5, 7, 123, 254):
        px = _constant_image(d)
        dec = J.decode_gray_jpeg(J.encode_gray_jpeg(px))
        assert dec is not None and (dec == px).all()


def test_general_raster_bitstream_fidelity():
    """On an arbitrary raster, reconstruction is lossy (quantizer
    rounding) but the BITSTREAM must be faithful: decoding the
    entropy stream recovers the encoder's quantized coefficient
    blocks exactly — proven end-to-end by re-encoding the decode:
    with quantizer 1 and max reconstruction error <= 1, a second
    encode/decode cycle must be a fixpoint within the same bound."""
    rng = np.arange(24 * 16, dtype=np.int64)
    px = ((rng * 17 + 131) % 256).astype(np.uint8).reshape(24, 16)
    dec = J.decode_gray_jpeg(J.encode_gray_jpeg(px))
    assert dec is not None and dec.shape == px.shape
    err = np.abs(dec.astype(int) - px.astype(int)).max()
    assert err <= 1  # quantizer-1 baseline: rounding only
    dec2 = J.decode_gray_jpeg(J.encode_gray_jpeg(dec))
    assert np.abs(dec2.astype(int) - dec.astype(int)).max() <= 1


def test_entropy_stream_byte_stuffing_is_real():
    """At least one synthesized payload must contain a stuffed FF00
    inside the entropy segment — and every payload must decode, so
    unstuffing demonstrably works."""
    found = False
    for d in range(64):
        payload = J.encode_gray_jpeg(_constant_image(d))
        sos = payload.index(b"\xff\xda")
        body = payload[sos + 2 :]
        if b"\xff\x00" in body:
            found = True
        assert J.decode_gray_jpeg(payload) is not None
    assert found


def test_malformed_payloads_degrade_to_none():
    good = J.encode_gray_jpeg(_constant_image(3))
    assert J.decode_gray_jpeg(b"") is None
    assert J.decode_gray_jpeg(b"\x00" * 32) is None
    assert J.decode_gray_jpeg(good[:30]) is None  # truncated tables
    assert J.decode_gray_jpeg(good[:-10]) is None  # truncated scan
    smashed = bytearray(good)
    smashed[1] = 0x00  # not SOI
    assert J.decode_gray_jpeg(bytes(smashed)) is None
    # progressive frames are out of scope and must be REJECTED, not
    # mis-decoded: rewrite SOF0 -> SOF2
    prog = bytearray(good)
    i = bytes(prog).index(b"\xff\xc0")
    prog[i + 1] = 0xC2
    assert J.decode_gray_jpeg(bytes(prog)) is None


def test_decoder_honors_in_stream_tables():
    """The decoder must build its Huffman tables from DHT, not assume
    ours: corrupting one DHT BITS byte changes the canonical code
    assignment and must break the decode (None), not silently
    succeed."""
    good = J.encode_gray_jpeg(_constant_image(9))
    b = bytearray(good)
    i = bytes(b).index(b"\xff\xc4")
    # first BITS byte of the DC table (after marker+len+TcTh)
    b[i + 5] = 16
    assert J.decode_gray_jpeg(bytes(b)) in (None,)


def test_media_jpeg_stats_match_formula(spark):
    docs = tables.load(spark, SF_DIR, "documents").limit(40)
    media = J.synthesize_jpeg(docs)
    got = {r.media_id: r for r in J.decode_jpeg(media).collect()}
    assert len(got) == 40
    for d, r in got.items():
        bw_, bh_ = J._blocks_of(d)
        vals = [
            J._block_val(d, bx, by)
            for by in range(bh_)
            for bx in range(bw_)
        ]
        assert (r.width, r.height) == (8 * bw_, 8 * bh_)
        assert r.n_px == 64 * bw_ * bh_
        assert r.sum_luma == 64 * sum(vals)
        assert (r.min_luma, r.max_luma) == (min(vals), max(vals))
