"""Round-15 batch E: the end-to-end curation-export composition —
pretrain_manifest chains the chunk-dedup gate, the quality ensemble,
temperature mixing, and the shard planner in one DataFrame DAG."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from banking_data_etl_pipeline_spark.functions import texttools
from banking_data_etl_pipeline_spark.operators import (
    corpus as corpus_ops,
    dedup,
    sampling,
)
from banking_data_etl_pipeline_spark.sources import tables
from conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return tables.load(spark, SF_DIR, "documents")


@pytest.fixture(scope="module")
def manifest(docs):
    return sampling.pretrain_manifest(docs).collect()


def test_manifest_covers_exactly_the_gated_docs(docs, manifest):
    dup_ok = dedup.chunk_dup_rollup(docs).filter(
        F.col("dup_chunk_share") < 0.5
    ).select("doc_id")
    qual_ok = corpus_ops.quality_ensemble(docs).filter(
        F.col("kept")
    ).select("doc_id")
    kept = docs.join(dup_ok, "doc_id").join(qual_ok, "doc_id")
    want_docs = kept.count()
    want_tokens = kept.select(
        F.sum(texttools.token_count(F.col("text"))).alias("t")
    ).collect()[0].t
    assert sum(r.n_docs for r in manifest) == want_docs
    assert sum(r.n_tokens for r in manifest) == want_tokens


def test_shards_are_token_balanced_and_contiguous(manifest):
    rows = sorted(manifest, key=lambda r: r.shard_id)
    assert rows[0].shard_id == 0
    # shard ids are the prefix-sum buckets: dense from 0
    assert [r.shard_id for r in rows] == list(range(len(rows)))
    # id ranges never interleave (docs assigned in id order)
    for a, b in zip(rows, rows[1:]):
        assert a.last_doc <= b.first_doc
    # every full shard holds >= 512 tokens across its doc starts'
    # span; no shard is empty
    assert all(r.n_docs >= 1 and r.n_tokens >= 1 for r in rows)


def test_mix_weight_is_a_convex_blend_of_source_weights(docs, manifest):
    dup_ok = dedup.chunk_dup_rollup(docs).filter(
        F.col("dup_chunk_share") < 0.5
    ).select("doc_id")
    qual_ok = corpus_ops.quality_ensemble(docs).filter(
        F.col("kept")
    ).select("doc_id")
    kept = docs.join(dup_ok, "doc_id").join(qual_ok, "doc_id")
    w = sampling.temperature_weights(kept).collect()
    lo, hi = min(r.weight for r in w), max(r.weight for r in w)
    for r in manifest:
        assert lo - 1e-6 <= r.mix_weight <= hi + 1e-6


def test_manifest_prefix_sum_is_distributed(docs):
    """The shard assignment must ride the range-partitioned prefix
    sum (rangepartitioning in the plan), never a bare global window
    — the single-partition construction is the 100 TB scale-killer
    the _dist_prefix_sum helper exists to avoid."""
    plan = (
        sampling.pretrain_manifest(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in plan.lower()
