"""Driver-window rotation planner — mechanizes the policy documented
in ``__spark_entry__.queries()``:

  1. flagship first;
  2. queries changed/new this round (must re-prove on current code) —
     supplied via --changed, or inferred as "registered but never
     driver-green";
  3. remaining slots stalest-first by the round of each query's most
     recent green CORRECTNESS_r*.json row;
  4. bank-core singles sort last within a staleness tier (the
     flagship composes them, so they re-prove every round anyway).

Usage:
    python scripts/rotation.py [--changed q1,q2,...]

Prints the recommended 50-entry window and a diff against the current
``queries()`` order so reordering is a mechanical copy, not a
judgment call.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50
FLAGSHIP = "pipeline_enriched"
BANK_SINGLES = {
    "age_group", "wealth_segment", "contact_day_type", "has_loans",
    "engagement_score", "rfm_scores", "customer_segment", "normalize",
    "range_filter", "required_filter", "lineage",
}


def last_green() -> dict[str, int]:
    out: dict[str, int] = {}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int("".join(c for c in os.path.basename(path) if c.isdigit()))
        with open(path, encoding="utf-8") as f:
            rows = json.load(f)
        for name, row in rows.items():
            ok = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            )
            if ok:
                out[name] = max(out.get(name, 0), rnd)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--changed", default="", help="comma-separated names")
    args = ap.parse_args()

    import __spark_entry__ as entry

    registered = list(entry.queries())
    green = last_green()
    changed = [q for q in args.changed.split(",") if q]
    never_green = [q for q in registered if q not in green]
    tier2 = []
    for q in changed + never_green:
        if q != FLAGSHIP and q in registered and q not in tier2:
            tier2.append(q)

    rest = [q for q in registered if q != FLAGSHIP and q not in tier2]
    # stalest first; bank singles last within a tier; stable by the
    # current registry order inside equal keys
    rest.sort(
        key=lambda q: (green.get(q, 0), q in BANK_SINGLES, registered.index(q))
    )
    plan = [FLAGSHIP] + tier2 + rest
    window = plan[:WINDOW]

    cur_window = registered[:WINDOW]
    print(f"# recommended window (first {WINDOW} of {len(plan)}):")
    for i, q in enumerate(window, 1):
        mark = ""
        if q in tier2:
            mark = "  [re-prove: changed/new]"
        elif green.get(q):
            mark = f"  [last green r{green[q]:02d}]"
        print(f"{i:3d}. {q}{mark}")
    missing = [q for q in window if q not in cur_window]
    extra = [q for q in cur_window if q not in window]
    print("\n# vs current queries() order:")
    print("  should enter window:", missing or "(none)")
    print("  may leave window:   ", extra or "(none)")


if __name__ == "__main__":
    main()
