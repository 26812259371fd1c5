"""Multimodal plumbing + text analysis operators."""

from __future__ import annotations

import hashlib

from banking_data_etl_pipeline_spark.multimodal import binaryops
from banking_data_etl_pipeline_spark.sources import tables
from pyspark.sql import functions as F

from conftest import SF_DIR


def _media(spark):
    return binaryops.synthesize_media(tables.load(spark, SF_DIR, "documents"))


def test_media_metadata_matches_payload(spark):
    media = _media(spark)
    sample = media.limit(5).collect()
    meta = {r.media_id: r for r in binaryops.media_metadata(media).collect()}
    for r in sample:
        m = meta[r.media_id]
        assert m.n_bytes == len(r.payload)
        assert m.sha256 == hashlib.sha256(bytes(r.payload)).hexdigest()
        assert m.kind in ("image", "audio")
        assert m.mime in ("image/png", "audio/wav")


def test_extract_features_fake_decode(spark):
    media = _media(spark)
    feats = {r.media_id: r for r in binaryops.extract_features(media).collect()}
    for r in media.limit(5).collect():
        f = feats[r.media_id]
        n = len(r.payload)
        assert (f.height, f.width, f.channels) == (32 + n % 97, 32 + n % 89, 3)
        assert f.n_bytes == n


def test_frame_sample_counts(spark):
    media = _media(spark)
    counts = {
        r.media_id: r.n
        for r in binaryops.frame_sample(media)
        .groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in media.select("media_id", F.octet_length("payload").alias("nb")).collect():
        expect = max(r.nb - 1, 0) // 1024 + 1
        assert counts[r.media_id] == expect


def test_text_quality_and_langid(spark):
    from banking_data_etl_pipeline_spark.functions import texttools

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it was happy for a while"),
            (2, "der hund ist nicht auf der couch und das ist gut"),
            (3, "!!! ??? ;;; ###"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in docs.select(
            "doc_id",
            texttools.lang_id(F.col("text")).alias("lang"),
            texttools.quality_score(F.col("text")).alias("q"),
            texttools.token_count(F.col("text")).alias("n"),
        ).collect()
    }
    assert rows[1].lang == "en"
    assert rows[2].lang == "de"
    assert rows[3].lang == "und"
    assert rows[4].n == 0 and rows[4].lang == "und"
    assert rows[1].q > rows[3].q  # clean prose beats punctuation soup
    assert all(0.0 <= rows[i].q <= 1.0 for i in rows)


def test_fingerprint_deterministic(spark):
    from banking_data_etl_pipeline_spark.functions import texttools

    docs = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "abcdefghij"), (3, "zyxwvutsrq")],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r.fp
        for r in docs.select(
            "doc_id", texttools.fingerprint(F.col("text"), 8).alias("fp")
        ).collect()
    }
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]
    assert len(rows[1]) == 32


def test_resize_media_shrinks_and_hashes(spark):
    import hashlib

    media = binaryops.synthesize_media(tables.load(spark, SF_DIR, "documents"))
    out = {r.media_id: r for r in binaryops.resize_media(media, 8, 8).collect()}
    src = {r.media_id: bytes(r.payload) for r in media.select("media_id", "payload").collect()}
    assert set(out) == set(src)
    for mid, r in out.items():
        assert (r.height, r.width) == (8, 8)
        assert 1 <= r.resized_bytes <= len(src[mid])
        assert r.resized_sha == hashlib.sha256(src[mid][: r.resized_bytes]).hexdigest()
    # a small target must actually shrink a typical payload
    shrunk = [m for m in out if out[m].resized_bytes < len(src[m])]
    assert len(shrunk) > len(out) // 2


def test_real_decode_raises_through_spark(spark):
    """The real-decode escape hatch must fail LOUDLY through a
    mapInPandas task — a clean DecodeNotAvailable surfaced in the
    driver-side error, not a silent fall-through to the fake decoder
    (which would report fabricated dimensions as if decoded)."""
    import pytest
    from pyspark.errors import PythonException

    media = _media(spark).limit(4)
    with pytest.raises(PythonException) as ei:
        binaryops.extract_features(media, real_decode=True).collect()
    assert "DecodeNotAvailable" in str(ei.value)
    assert "codecs are not installed" in str(ei.value)


def test_repetition_signals(spark):
    """Repetition fractions bounded and the verdicts sort correctly: a
    chanted bigram doc is culled, varied prose is kept, a too-short
    doc gets null signals but survives (insufficient evidence)."""
    from banking_data_etl_pipeline_spark.functions import texttools

    rows = [
        (1, "buy now " * 50),                       # one bigram everywhere
        (2, "the quick brown fox jumps over a lazy dog near the riverbank"),
        (3, "word"),                                # too short for bigrams
        (4, ("a b c d e f g h " * 10)),             # loops trigrams hard
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", *texttools.repetition_signals(F.col("text"))
    )
    out = {r.doc_id: r for r in df.collect()}
    for r in out.values():
        for v in (r.top_bigram_frac, r.dup_trigram_frac):
            assert v is None or 0.0 <= v <= 1.0
    assert not out[1].keep and out[1].top_bigram_frac > 0.4
    assert out[2].keep
    assert out[3].keep and out[3].top_bigram_frac is None
    assert not out[4].keep and out[4].dup_trigram_frac > 0.8
