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


def test_rank_fusion_rrf_combines_arms(spark):
    """Hand-built corpus where both arm rankings are derivable by
    inspection: doc 1 wins lexically (matches all three query terms),
    doc 3 wins semantically (near-parallel embedding), docs 3 and 4
    each appear in only ONE arm (NULL rank in the other). RRF scores
    must equal 1/(60+lex) + 1/(60+sem) with missing arms contributing
    zero, ranked (rrf desc, doc_id asc)."""
    docs = spark.createDataFrame(
        [
            (0, "apple banana cherry"),  # the query document
            (1, "apple banana cherry"),  # lexical twin
            (2, "apple banana"),
            (3, "date elderberry fig"),  # lexically disjoint
            (4, "banana cherry"),
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 1.0]),   # orthogonal to the query
            (2, [0.9, 0.1]),
            (3, [1.0, 0.05]),  # semantically closest
            (4, [-1.0, 0.0]),  # opposite
        ],
        "vec_id long, embedding array<float>",
    )
    out = {
        r.doc_id: r
        for r in retrieval.hybrid_rank_fusion(
            docs, emb, n_queries=1, m_terms=3, k_arm=3, k=5
        ).collect()
    }
    # lexical arm (BM25, see test above): 1 > {2, 4 tie -> id asc}
    # semantic arm (cosine): 3 > 2 > 1  (4's cosine is -1, cut at k_arm)
    assert (out[1].lex_rank, out[1].sem_rank) == (1, 3)
    assert (out[2].lex_rank, out[2].sem_rank) == (2, 2)
    assert (out[3].lex_rank, out[3].sem_rank) == (None, 1)
    assert (out[4].lex_rank, out[4].sem_rank) == (3, None)
    want_rrf = {
        1: round(1 / 61 + 1 / 63, 6),
        2: round(1 / 62 + 1 / 62, 6),
        3: round(1 / 61, 6),
        4: round(1 / 63, 6),
    }
    for d, w in want_rrf.items():
        assert abs(out[d].rrf - w) < 1e-9, (d, out[d].rrf, w)
    # fused order: doc1 (.032266) > doc2 (.032258) > doc3 > doc4
    assert [out[d].rank for d in (1, 2, 3, 4)] == [1, 2, 3, 4]
    spark.catalog.clearCache()


def test_phrase_search_counts_positions(spark):
    """Controlled corpus: derived top bigram is 'big data' (3 corpus
    occurrences); overlapping repeats count per POSITION ('x x x' has
    two 'x x' hits); docs without adjacency never match."""
    docs = spark.createDataFrame(
        [
            (1, "big data big data"),     # 2 hits of "big data"
            (2, "big data systems"),      # 1 hit
            (3, "data big"),              # reversed - no hit
            (4, "x x x"),                 # overlap probe
            (5, ""),
        ],
        "doc_id long, text string",
    )
    out = retrieval.phrase_search(docs, n_queries=2).collect()
    got = {(r.phrase, r.doc_id): r.n_hits for r in out}
    # bigram counts: "big data" 3, "x x" 2, "data big" 2 ... top-2 by
    # (count desc, asc): "big data" (3), then tie at 2 -> "data big"
    assert got[("big data", 1)] == 2
    assert got[("big data", 2)] == 1
    assert ("big data", 3) not in got
    assert got[("data big", 1)] == 1  # "data big" inside doc 1
    assert got[("data big", 3)] == 1
    assert all(p in ("big data", "data big") for p, _ in got)
    spark.catalog.clearCache()
