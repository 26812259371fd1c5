"""Property tests for the round-13 pure kernels: the PNG filter
codec, the PNG container parser, and the unigram-LM segmentation DP —
the engine-shared arithmetic the oracle-parity gate rides on."""

from __future__ import annotations

import struct
import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from banking_data_etl_pipeline_spark.multimodal import binaryops
from banking_data_etl_pipeline_spark.operators.unigram import (
    SEP,
    _PAD,
    segment_key,
)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    seed=st.integers(0, 2**31 - 1),
    data=st.data(),
)
def test_png_filter_roundtrip_any_raster(w, h, seed, data):
    """For ANY raster bytes and ANY per-row filter choice, forward
    filter then un-filter is the identity (the synthesizer only uses
    the (d+r)%5 schedule, but the decoder must survive any spec-legal
    input)."""
    raw = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
            )
        )
    )
    filtered = binaryops._png_filter_lines(raw, w, h, seed)
    assert binaryops._png_unfilter(filtered, w, h) == raw
    # and the full container round-trips through parse + inflate
    z = zlib.compress(filtered, 6)
    payload = (
        binaryops.PNG_SIG
        + binaryops._png_chunk_bytes(
            b"IHDR", struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
        )
        + binaryops._png_chunk_bytes(b"IDAT", z)
        + binaryops._png_chunk_bytes(b"IEND", b"")
    )
    pw, ph, zd = binaryops.parse_png(payload)
    assert (pw, ph) == (w, h)
    assert binaryops._png_unfilter(zlib.decompress(zd), w, h) == raw


@settings(max_examples=40, deadline=None)
@given(
    payload=st.binary(min_size=0, max_size=200),
)
def test_parse_png_never_raises_on_garbage(payload):
    # arbitrary bytes: parse returns None or a well-formed triple,
    # never raises (a decoder inside a Spark task must not fail the
    # stage on one bad blob)
    out = binaryops.parse_png(payload)
    assert out is None or (len(out) == 3 and out[0] > 0 and out[1] > 0)


def _brute_best(word: str, vocab: dict[str, int], max_piece: int):
    """Enumerate EVERY segmentation; return the min key under the
    spec ordering — the oracle for the DP."""
    best = []

    def rec(pos, pieces):
        if pos == len(word):
            s = sum(vocab[p] for p in pieces)
            best.append(
                f"{len(pieces):02d}{_PAD - s:013d}" + SEP.join(pieces)
            )
            return
        for ln in range(1, min(max_piece, len(word) - pos) + 1):
            p = word[pos : pos + ln]
            if p in vocab:
                rec(pos + ln, pieces + [p])

    rec(0, [])
    return min(best) if best else None


@settings(max_examples=80, deadline=None)
@given(
    word=st.text(alphabet="ab", min_size=1, max_size=9),
    data=st.data(),
)
def test_segment_key_matches_brute_force(word, data):
    """The dominance DP returns exactly the brute-force minimum key
    over all segmentations — min pieces, then max count sum, then
    lexicographically smallest sequence."""
    # vocab: all substrings <= 3 chars get a random count; drop some
    # multi-char pieces so unsegmentable paths exist
    subs = sorted(
        {
            word[i : i + ln]
            for i in range(len(word))
            for ln in range(1, min(3, len(word) - i) + 1)
        }
    )
    vocab = {}
    for p in subs:
        if len(p) == 1 or data.draw(st.booleans()):
            vocab[p] = data.draw(st.integers(0, 50))
    assert segment_key(word, vocab, max_piece=3) == _brute_best(
        word, vocab, 3
    )


@settings(max_examples=30, deadline=None)
@given(
    word=st.text(alphabet="abc", min_size=1, max_size=6),
    data=st.data(),
)
def test_segment_key_none_iff_no_cover(word, data):
    """segment_key is None exactly when no piece cover exists (here:
    when some character is missing from a chars-only vocab)."""
    chars = sorted(set(word))
    kept = [
        c for c in chars if data.draw(st.booleans())
    ]
    vocab = {c: 1 for c in kept}
    got = segment_key(word, vocab, max_piece=3)
    if set(word) <= set(kept):
        assert got is not None
    else:
        assert got is None
