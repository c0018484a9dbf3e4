#!/usr/bin/env python3
"""Assemble the two-section SCALE_SMOKE_r{N}.json (10x full suite + 100x
linear-path subset) from three Bench detail files. Usage:
    python3 tools/assemble_smoke2.py BASE.json SCALED10.json SCALED100.json \
        OUT.json --subset q1,q2,...
"""
import argparse
import json

MIN_BASE_SEC = 1e-3

ROWS = {
    10: {"events": 1000000, "documents": 50000, "embeddings": 20000},
    100: {"events": 10000000, "documents": 500000, "embeddings": 200000},
}


def section(base, scaled, factor, qs, note):
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
    b_tot = sum(base["queries"][q] for q in qs)
    s_tot = sum(scaled["queries"][q] for q in qs)
    return {
        "rows": ROWS[factor],
        "subset_note": note,
        "n_queries": len(qs),
        "baseline_sf01_total_sec": round(b_tot, 2),
        "scaled_total_sec": round(s_tot, 2),
        "normalized_ratio": round(s_tot / max(b_tot, MIN_BASE_SEC) / factor, 3),
        "outliers_gt_2x": sorted(q for q in qs if per[q]["normalized"] > 2.0),
        "queries": per,
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("base")
    ap.add_argument("scaled10")
    ap.add_argument("scaled100")
    ap.add_argument("out")
    ap.add_argument("--subset", required=True,
                    help="comma-separated 100x subset query names")
    ap.add_argument("--note10", default="")
    ap.add_argument("--note100", default="")
    ap.add_argument("--probes", default=None,
                    help="optional SmokeProbes JSON (mor_skew + ivf_prune) to embed")
    args = ap.parse_args()

    base = json.load(open(args.base))
    s10 = json.load(open(args.scaled10))
    s100 = json.load(open(args.scaled100))
    qs10 = {q for q in base["queries"] if q in s10["queries"]}
    qs100 = {q for q in args.subset.split(",")
             if q in base["queries"] and q in s100["queries"]}
    out = {
        "metric": "scale_smoke",
        "unit": "sec",
        "gc_between_queries": True,
        "dataset_note": ("sf0.1 replicated Nx via tools/make_scale_smoke.py "
                         "(ids shifted per replica; every 7th document token "
                         "perturbed per replica so replica pairs sit at ~0.4 "
                         "shingle Jaccard - duplicate pairs scale naturally, "
                         "not manufactured; embedding replicas rotated to "
                         "exactly cos 0.30 against their source via a seeded "
                         "orthogonal direction - under the 0.35 near-dup "
                         "threshold, so no manufactured dup pairs, and ANN "
                         "recall probes measure real index quality instead "
                         "of verbatim-copy signature collisions)"),
        "smoke_10x": section(base, s10, 10, qs10, args.note10),
        "smoke_100x": section(base, s100, 100, qs100, args.note100),
    }
    if args.probes:
        out["probes"] = json.load(open(args.probes))
    json.dump(out, open(args.out, "w"), indent=1)
    for k in ("smoke_10x", "smoke_100x"):
        print(k, out[k]["normalized_ratio"], "outliers:", out[k]["outliers_gt_2x"])


if __name__ == "__main__":
    main()
