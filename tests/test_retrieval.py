"""BM25 retrieval: hand-computed scores on a controlled corpus."""

from __future__ import annotations

import math

from banking_data_etl_pipeline_spark.operators import retrieval


def test_bm25_matches_manual_computation(spark):
    """Single-term query derived from rank 1 ('apple', the most
    frequent token): operator scores must equal a from-scratch BM25
    computation with the same tokenizer, k1=1.2, b=0.75."""
    rows = [
        (1, "apple apple banana cherry"),
        (2, "apple banana banana date elderberry fig"),
        (3, "cherry date elderberry"),
        (4, "apple apple apple"),
        (5, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.score, r.rank)
        for r in retrieval.bm25_topk(
            docs, k=4, n_queries=1, terms_per_query=1, vocab_rank_start=1
        ).collect()
    }

    # manual: tokenize = lower().split(), query term = most frequent
    toks = {d: t.split() for d, t in rows}
    counts: dict[str, int] = {}
    for t in toks.values():
        for w in t:
            counts[w] = counts.get(w, 0) + 1
    term = max(counts, key=lambda w: (counts[w], [-ord(c) for c in w]))
    assert term == "apple"
    n_docs = float(len(rows))
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    df = float(sum(1 for t in toks.values() if term in t))
    k1, b = 1.2, 0.75
    want = {}
    for d, t in toks.items():
        tf = float(t.count(term))
        if tf == 0:
            continue
        idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        s = idf * (tf * (k1 + 1.0)) / (
            tf + k1 * (1.0 - b + b * len(t) / avgdl)
        )
        want[d] = s
    assert set(out) == set(want)
    for d, s in want.items():
        assert abs(out[d][0] - s) < 1e-6, (d, out[d][0], s)
    # rank order: score desc, doc_id asc
    ranked = sorted(want, key=lambda d: (-want[d], d))
    assert [out[d][1] for d in ranked] == list(range(1, len(ranked) + 1))
    spark.catalog.clearCache()
