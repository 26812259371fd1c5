"""Driver-contract smoke: a fast subset of queries checked against
their DuckDB oracle twins at sf0.001 — the same row-count/schema/
value-hash comparison the driver runs at sf0.01 (scripts/parity.py is
the full harness)."""

from __future__ import annotations

import importlib.util
import sys

import duckdb
import pytest

from conftest import SF_DIR

SUBSET = [
    "pipeline_enriched",
    "rfm_scores",
    "parse_typed",
    "dedup_exact",
    "emb_near_dup",
    "text_stats",
    "window_agg",
    "sessionize",
    "topk_per_group",
    "media_features",
    "asof_join",
    "cube_orders",
    "percentiles",
    "pivot_daily",
    "chunk_docs",
    "above_avg_orders",
    # round-3 family representatives
    "seq_pack",
    "contamination",
    "scd2_merge",
    "fuzzy_join",
    "pagerank",
    "winsorize",
    "mad_outliers",
    "decay_totals",
    "table_checksum",
    "split_manifest",
    "kmeans",
]


def _load_entry():
    sys.path.insert(0, "/root/repo")
    spec = importlib.util.spec_from_file_location(
        "spark_entry_under_test", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _canon(df):
    spec = importlib.util.spec_from_file_location(
        "parity_under_test", "/root/repo/scripts/parity.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.canon_frame(df)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    entry = _load_entry()
    sdf = entry.queries()[name](spark, SF_DIR).toPandas()
    odf = duck.execute(entry.oracle_sql()[name]).df()
    sn, sc, sh, _ = _canon(sdf)
    on, oc, oh, _ = _canon(odf)
    assert sn == on, f"row count {sn} != {on}"
    assert sc == oc, f"columns {sc} != {oc}"
    assert sh == oh, "value hash mismatch"


def test_entry_smoke(spark):
    entry = _load_entry()
    df = entry.entry(spark)
    assert df.count() > 0
    assert "customer_segment" in df.columns


def test_contract_complete(spark):
    entry = _load_entry()
    q, o = entry.queries(), entry.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 30
