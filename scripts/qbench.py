"""Isolated per-query timing + plan dump for optimization work.

Usage:
    python scripts/qbench.py [--n 3] [--plan-dir DIR] [--sf SF_DIR] query [query ...]

Runs each named query through the noop sink (full computation, no
collect — guide §1.4) with one untimed warm-up pass, then ``--n`` timed
passes; prints min/median per query. With ``--plan-dir``, writes each
query's ``explain("formatted")`` output to ``DIR/<query>.txt`` so plan
shapes can be diffed before/after a change (guide §7.2).

Methodology matches bench.py's warm loop (clearCache + System.gc
between passes) so numbers are comparable with battery warm times.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    import __spark_entry__ as entry
    from banking_data_etl_pipeline_spark.session import get_spark

    spark = get_spark("qbench")
    qs = entry.queries()
    if args.plan_dir:
        os.makedirs(args.plan_dir, exist_ok=True)

    for name in args.queries:
        spark.sparkContext.setJobDescription(f"qbench:{name}")
        if args.plan_dir:
            df = qs[name](spark, args.sf)
            with open(
                os.path.join(args.plan_dir, f"{name}.txt"), "w", encoding="utf-8"
            ) as f:
                try:
                    f.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
                except Exception:
                    # public API fallback: capture explain() stdout
                    import contextlib
                    import io

                    buf = io.StringIO()
                    with contextlib.redirect_stdout(buf):
                        df.explain("formatted")
                    f.write(buf.getvalue())
        times = []
        for i in range(args.n + 1):
            t0 = time.time()
            qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            if i > 0:  # pass 0 is the untimed warm-up
                times.append(dt)
            spark.catalog.clearCache()
            spark._jvm.System.gc()
        print(
            f"{name}: min={min(times):.3f} med={statistics.median(times):.3f} "
            f"all={[round(t, 3) for t in times]} load={os.getloadavg()[0]:.2f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
