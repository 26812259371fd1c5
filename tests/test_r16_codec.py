"""r16 optimization-round tests: the vectorized JPEG codec fast paths
must be bit-compatible with the scalar implementation they replaced,
and the r15 ADVICE zero-dimension SOF gap must stay closed."""

from __future__ import annotations

import struct

import numpy as np

from banking_data_etl_pipeline_spark.multimodal import jpeg as J


def _gray_image(d: int) -> np.ndarray:
    bw, bh = J._blocks_of(d)
    px = np.zeros((bh * 8, bw * 8), dtype=np.uint8)
    for by in range(bh):
        for bx in range(bw):
            px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = J._block_val(d, bx, by)
    return px


def _patch_sof_dims(payload: bytes, h: int, w: int, sof_marker: int = 0xC0) -> bytes:
    """Rewrite the SOF height/width fields in an encoded stream."""
    pos = 2
    out = bytearray(payload)
    while pos + 4 <= len(payload):
        marker = payload[pos + 1]
        seg_len = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        if marker == sof_marker:
            out[pos + 5 : pos + 9] = struct.pack(">HH", h, w)
            return bytes(out)
        pos += 2 + seg_len
    raise AssertionError("no SOF segment found")


def test_zero_dim_sof_degrades_to_none_gray():
    # r15 ADVICE (medium): h == 0 or w == 0 passes the w*h pixel
    # budget but decodes to an empty plane whose stats raise outside
    # the degrade-to-null guard — must now be rejected at SOF.
    good = J.encode_gray_jpeg(_gray_image(3))
    assert J.decode_gray_jpeg(good) is not None
    assert J.decode_gray_jpeg(_patch_sof_dims(good, 0, 16)) is None
    assert J.decode_gray_jpeg(_patch_sof_dims(good, 16, 0)) is None
    assert J.decode_gray_jpeg(_patch_sof_dims(good, 0, 0)) is None


def test_zero_dim_sof_degrades_to_none_color():
    y = np.full((16, 16), 77, dtype=np.uint8)
    cb = np.full((8, 8), 120, dtype=np.uint8)
    cr = np.full((8, 8), 140, dtype=np.uint8)
    good = J.encode_color_jpeg(y, cb, cr)
    assert J.decode_color_jpeg(good) is not None
    assert J.decode_color_jpeg(_patch_sof_dims(good, 0, 16)) is None
    assert J.decode_color_jpeg(_patch_sof_dims(good, 16, 0)) is None


def test_pack_bits_matches_scalar_bit_writer():
    # The numpy entropy packer must emit exactly what the scalar
    # MSB-first writer did: same bit order, 1-padding to the byte
    # boundary, 0x00 stuffed after every 0xFF output byte.
    rng = np.random.default_rng(42)
    for _ in range(50):
        n = int(rng.integers(1, 200))
        lens = [int(x) for x in rng.integers(1, 17, n)]
        vals = [int(rng.integers(0, 1 << l)) for l in lens]

        acc = 0
        nbits = 0
        out = bytearray()
        for v, l in zip(vals, lens):
            for i in range(l - 1, -1, -1):
                acc = (acc << 1) | ((v >> i) & 1)
                nbits += 1
                if nbits == 8:
                    out.append(acc)
                    if acc == 0xFF:
                        out.append(0x00)
                    acc, nbits = 0, 0
        if nbits:
            acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
            out.append(acc)
            if acc == 0xFF:
                out.append(0x00)
        assert J._pack_bits(vals, lens) == bytes(out)


def test_fast_bits_truncation_and_stuffing():
    # 0xFF 0x00 unstuffs to a single 0xFF data byte; reading past the
    # segment end (delimited by a real marker) raises like the scalar
    # reader did.
    payload = b"\xff\x00\xab\xff\xd9"
    fb = J._FastBits(payload, 0)
    assert fb.nbits == 16
    assert fb.read(8) == 0xFF
    assert fb.read(8) == 0xAB
    try:
        fb.read(1)
        raise AssertionError("expected truncation error")
    except ValueError:
        pass


def test_forward_zz_constant_fast_path_equals_dct():
    # Constant blocks short-circuit to DC = 8*(v-128); the general DCT
    # path must round to exactly the same integers.
    for v in (0, 1, 77, 128, 200, 255):
        plane = np.full((8, 8), v, dtype=np.uint8)
        zz = J._forward_zz(plane)
        coeff = J._M @ (plane.astype(np.float64) - 128.0) @ J._M.T
        ref = np.rint(coeff).astype(np.int64).reshape(64)[J._ZZ_FLAT]
        assert np.array_equal(zz[0], ref)
        assert zz[0, 0] == 8 * (v - 128)
        assert not zz[0, 1:].any()
