#!/usr/bin/env python3
"""Assemble SCALE_SMOKE_r{N}.json from paired Bench detail files:
a baseline run (sf0.1) and a scaled run (same harness, same query set),
normalized by the replication factor. Usage:
    python3 tools/assemble_smoke.py BASE.json SCALED.json FACTOR OUT.json \
        [--subset q1,q2,...]
"""
import json, sys

def main():
    base_f, scaled_f, factor, out_f = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4]
    subset = None
    if len(sys.argv) > 6 and sys.argv[5] == "--subset":
        subset = set(sys.argv[6].split(","))
    base = json.load(open(base_f))
    scaled = json.load(open(scaled_f))
    qs = {q for q in base["queries"] if q in scaled["queries"]}
    if subset:
        qs &= subset
    b_tot = sum(base["queries"][q] for q in qs)
    s_tot = sum(scaled["queries"][q] for q in qs)
    per = {
        q: {
            "base_sec": round(base["queries"][q], 2),
            "scaled_sec": round(scaled["queries"][q], 2),
            "normalized": round(scaled["queries"][q] / base["queries"][q] / factor, 3),
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
        "normalized_ratio": round(s_tot / b_tot / factor, 3),
        "outliers_gt_2x": sorted(
            q for q in qs if per[q]["normalized"] > 2.0),
        "queries": per,
    }
    json.dump(out, open(out_f, "w"), indent=1)
    print(out_f, out["normalized_ratio"], "outliers:", out["outliers_gt_2x"])

if __name__ == "__main__":
    main()
