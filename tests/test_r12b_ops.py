"""Round-12 decode-lane tests: the REAL positive decode paths
(uncompressed PPM rasters, WAV PCM samples) and their never-raise
malformed-byte contracts."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from banking_data_etl_pipeline_spark.multimodal import binaryops
from banking_data_etl_pipeline_spark.sources import tables

from conftest import SF_DIR


def _ppm(w: int, h: int, raster: bytes, header: bytes | None = None) -> bytes:
    return (header or b"P6\n%d %d\n255\n" % (w, h)) + raster


def test_decode_ppm_recovers_exact_channel_sums(spark):
    """End-to-end over the synthesized lane at sf0.001: the decoder's
    per-channel sums must equal an independent pure-Python recompute
    from the synthesis arithmetic (proves the header tokenizer found
    the raster offset and every raster byte was read)."""
    docs = tables.load(spark, SF_DIR, "documents").limit(40)
    media = binaryops.synthesize_ppm(docs)
    got = {
        r["media_id"]: r.asDict()
        for r in binaryops.decode_ppm(media).collect()
    }
    n_docs = docs.count()
    assert len(got) == n_docs and n_docs > 0
    for mid, row in got.items():
        w, h = 8 + mid % 13, 8 + mid % 11
        sums = [0, 0, 0]
        for i in range(w * h * 3):
            sums[i % 3] += (mid * 131 + i * 17) % 256
        assert (row["width"], row["height"], row["maxval"]) == (w, h, 255)
        assert row["n_px"] == w * h
        assert (row["sum_r"], row["sum_g"], row["sum_b"]) == tuple(sums)


def test_parse_ppm_tokenizer_handles_comments_and_split_whitespace():
    """The header tokenizer is a real netpbm parser, not an offset
    assumption: comments between fields and multi-whitespace
    separators must parse; the raster starts exactly one whitespace
    byte after maxval."""
    raster = bytes(range(2 * 1 * 3))
    hdr = b"P6 # comment right after magic\n2\n# another\n  1\t255\n"
    parsed = binaryops.parse_ppm(hdr + raster)
    assert parsed == (2, 1, 255, raster)


def test_parse_ppm_malformed_degrades_to_none_never_raises():
    raster = bytes(6)
    cases = [
        b"",                                   # empty
        b"P5\n2 1\n255\n" + raster,            # wrong magic (grayscale)
        b"P6\n2 1\n255\n" + raster[:-1],       # truncated raster
        b"P6\n2 1\n",                          # header cut short
        b"P6\n0 1\n255\n",                     # zero dimension
        b"P6\n2 1\n0\n" + raster,              # maxval out of range
        b"P6\n2 x\n255\n" + raster,            # non-digit field
    ]
    for payload in cases:
        assert binaryops.parse_ppm(payload) is None


def test_decode_ppm_emits_null_stats_for_corrupt_rows(spark):
    """A corrupt blob inside a batch must yield a null-stat row for
    that media_id without failing the stage or disturbing neighbors."""
    good = _ppm(2, 1, bytes([10, 20, 30, 40, 50, 60]))
    bad = b"NOTAPPM"
    df = spark.createDataFrame(
        [(1, good), (2, bad)], "media_id long, payload binary"
    )
    rows = {r["media_id"]: r for r in binaryops.decode_ppm(df).collect()}
    assert rows[1]["sum_r"] == 50 and rows[1]["sum_g"] == 70
    assert rows[1]["sum_b"] == 90 and rows[1]["n_px"] == 2
    assert rows[2]["width"] is None and rows[2]["sum_r"] is None


def test_decode_pcm_matches_struct_recompute_and_drops_odd_byte(spark):
    """int16-LE reinterpretation of the data chunk: amplitude sum,
    peak and zero crossings against a struct.unpack recompute; a
    trailing odd byte is not a sample."""
    samples = [100, -200, 3, -4, 0, 32767, -32768]
    body = b"".join(struct.pack("<h", s) for s in samples) + b"\x01"
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(body)) + body
    )
    df = spark.createDataFrame([(7, wav)], "media_id long, payload binary")
    row = binaryops.decode_pcm(df).collect()[0]
    assert row["n_samples"] == len(samples)
    assert row["sum_amp"] == sum(samples)
    assert row["peak_abs"] == 32768
    # signs: + - + - + + -  (0 counts non-negative) -> 5 changes
    assert row["zero_cross"] == 5


def test_decode_pcm_skips_non_wav_and_empty_data(spark):
    wav_empty = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", 0)
    )
    df = spark.createDataFrame(
        [(1, b"garbage"), (2, wav_empty)], "media_id long, payload binary"
    )
    assert binaryops.decode_pcm(df).count() == 0


def test_decode_is_real_a_flipped_raster_byte_changes_the_sum(spark):
    """Anti-fake guard: the decoder must be reading raster bytes, not
    echoing header arithmetic — flipping one byte in one channel moves
    exactly that channel's sum by the delta."""
    base = bytes([10, 20, 30, 40, 50, 60])
    tampered = bytes([10, 20, 30, 255, 50, 60])  # pixel 1, channel R
    df = spark.createDataFrame(
        [(1, _ppm(2, 1, base)), (2, _ppm(2, 1, tampered))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in binaryops.decode_ppm(df).collect()}
    assert rows[2]["sum_r"] - rows[1]["sum_r"] == 255 - 40
    assert rows[2]["sum_g"] == rows[1]["sum_g"]
    assert rows[2]["sum_b"] == rows[1]["sum_b"]


def test_synthesize_ppm_meta_matches_payload(spark):
    """meta.n_bytes is the container size; the payload really starts
    with a parseable P6 header whose dims match the id arithmetic."""
    docs = tables.load(spark, SF_DIR, "documents").limit(5)
    rows = binaryops.synthesize_ppm(docs).collect()
    for r in rows:
        assert r["meta"]["n_bytes"] == len(r["payload"])
        w, h, maxval, raster = binaryops.parse_ppm(bytes(r["payload"]))
        assert (w, h) == (8 + r["media_id"] % 13, 8 + r["media_id"] % 11)
        assert len(raster) == w * h * 3
