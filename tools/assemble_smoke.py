#!/usr/bin/env python3
"""Assemble SCALE_SMOKE_r{N}.json from paired Bench detail files:
a baseline run (sf0.1) and a scaled run (same harness, same query set),
normalized by the replication factor. Usage:
    python3 tools/assemble_smoke.py BASE.json SCALED.json FACTOR OUT.json \
        [--subset q1,q2,...]
"""
import argparse
import json

# A trivially-cached query can record 0.0s raw; floor the denominator so
# normalization degrades to "very fast baseline" instead of dividing by zero.
MIN_BASE_SEC = 1e-3


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("base", help="baseline Bench detail JSON (sf0.1)")
    ap.add_argument("scaled", help="scaled-run Bench detail JSON")
    ap.add_argument("factor", type=int, help="data replication factor")
    ap.add_argument("out", help="output SCALE_SMOKE json path")
    ap.add_argument("--subset", default=None,
                    help="comma-separated query names to restrict to")
    args = ap.parse_args()

    base = json.load(open(args.base))
    scaled = json.load(open(args.scaled))
    qs = {q for q in base["queries"] if q in scaled["queries"]}
    if args.subset:
        qs &= set(args.subset.split(","))
    factor = args.factor
    b_tot = sum(base["queries"][q] for q in qs)
    s_tot = sum(scaled["queries"][q] for q in qs)
    per = {
        q: {
            "base_sec": round(base["queries"][q], 2),
            "scaled_sec": round(scaled["queries"][q], 2),
            "normalized": round(
                scaled["queries"][q]
                / max(base["queries"][q], MIN_BASE_SEC) / factor, 3),
        }
        for q in sorted(qs)
    }
    out = {
        "metric": f"scale_smoke_{factor}x",
        "unit": "sec",
        "factor": factor,
        "gc_between_queries": True,
        "n_queries": len(qs),
        "baseline_total_sec": round(b_tot, 2),
        "scaled_total_sec": round(s_tot, 2),
        "normalized_ratio": round(s_tot / max(b_tot, MIN_BASE_SEC) / factor, 3),
        "outliers_gt_2x": sorted(
            q for q in qs if per[q]["normalized"] > 2.0),
        "queries": per,
    }
    json.dump(out, open(args.out, "w"), indent=1)
    print(args.out, out["normalized_ratio"], "outliers:", out["outliers_gt_2x"])

if __name__ == "__main__":
    main()
