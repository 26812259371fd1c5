"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` builder AND its ``oracle_sql()`` DuckDB
twin on the same sf dir; compare row count, column names, and an
order-insensitive canonical value hash. Usage:

    python scripts/parity.py [--snapshot PATH] [sf_dir] [query ...]

Exit code = number of failing queries.

``--snapshot PATH`` additionally writes a per-query JSON record in the
driver's CORRECTNESS_r*.json shape — committed per round as
PARITY_r{N}.json so a missed driver run (the r5 precedent: neither
CORRECTNESS_r05 nor BENCH_r05 was ever recorded) still leaves an
auditable proof artifact next to the code it proved.
"""

from __future__ import annotations

import hashlib
import json
import math
import sys
import time

import duckdb
import pandas as pd


def canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, (int,)):
        return str(v)
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def canon_frame(df: pd.DataFrame) -> tuple[int, list[str], str, list[tuple]]:
    cols = sorted(df.columns)
    rows = [
        tuple(canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return len(rows), cols, h.hexdigest(), rows


def run(sf_dir: str, only: list[str], snapshot: str | None = None) -> int:
    import os

    # CWD-proofing (the r7 lesson — a relative sf_dir silently broke
    # every streaming query, whose tempdir symlinks resolve relative
    # to the SYMLINK's directory, and Python workers spawned without
    # the repo on PYTHONPATH could not unpickle mapInPandas closures):
    # absolutize the data dir and export the repo root to the workers
    # BEFORE the session starts, so the gate runs identically from any
    # directory.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    os.environ["PYTHONPATH"] = (
        repo + os.pathsep + os.environ.get("PYTHONPATH", "")
    )
    sf_dir = os.path.abspath(sf_dir)
    import __spark_entry__ as entry
    from banking_data_etl_pipeline_spark.session import get_spark

    spark = get_spark("parity", cpus=16)

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry.queries()
    oq = entry.oracle_sql()
    names = only or list(qs)
    failures = 0
    record: dict[str, dict] = {}
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            record[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None,
                "err": f"spark {type(e).__name__}: {str(e)[:200]}",
            }
            failures += 1
            continue
        finally:
            # drop blocks persisted inside operators (minhash/ngram
            # postings, CC labels) so the many-query session doesn't
            # accumulate cache across unrelated queries
            spark.catalog.clearCache()
        if name not in oq:
            print(f"SKIP {name}: rows-only ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
            record[name] = {"rows_only": True, "spark_rows": len(sdf), "err": None}
            continue
        try:
            odf = con.execute(oq[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            record[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": len(sdf),
                "oracle_rows": None,
                "err": f"duckdb {type(e).__name__}: {str(e)[:200]}",
            }
            failures += 1
            continue
        sn, sc, sh, srows = canon_frame(sdf)
        on, oc, oh, orows = canon_frame(odf)
        record[name] = {
            "rows_match": sn == on,
            "schema_match": sc == oc,
            "hash_match": sh == oh,
            "spark_rows": sn,
            "oracle_rows": on,
            "err": None,
        }
        status = []
        if sn != on:
            status.append(f"rows {sn}!={on}")
        if sc != oc:
            status.append(f"cols {sc}!={oc}")
        if sh != oh:
            status.append("hash")
        if status:
            failures += 1
            print(f"FAIL {name}: {', '.join(status)} [{time.time()-t0:.1f}s]")
            if sc == oc and sn == on:
                sset, oset = set(srows), set(orows)
                extra = sorted(sset - oset)[:3]
                missing = sorted(oset - sset)[:3]
                print(f"  cols: {sc}")
                for r in extra:
                    print(f"  spark-only: {r}")
                for r in missing:
                    print(f"  oracle-only: {r}")
        else:
            print(f"PASS {name}: {sn} rows [{time.time()-t0:.1f}s]")
    if snapshot:
        with open(snapshot, "w", encoding="utf-8") as f:
            json.dump(
                {"sf_dir": sf_dir, "n_queries": len(names),
                 "n_failures": failures, "results": record},
                f, indent=1,
            )
        print(f"wrote {snapshot} ({len(record)} entries, {failures} failures)")
    return failures


if __name__ == "__main__":
    args = sys.argv[1:]
    snap = None
    if "--snapshot" in args:
        i = args.index("--snapshot")
        snap = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf = args[0] if args else "/root/testdata/sf0.001"
    sys.exit(run(sf, args[1:], snapshot=snap))
