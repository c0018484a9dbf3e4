#!/usr/bin/env python3
"""Anchor-normalized round comparison between two BENCH_DETAIL files.

Usage: python3 tools/norm_compare.py OLD.json NEW.json [--watch q1,q2,...]

Prints a markdown fragment: suite-level normalized movement, the top
movers in each direction, and a per-query adjudication of the --watch
list (the queries a prior round flagged `weak`). Comparison is made on
`queries_norm_cpu` (seconds ÷ mean pure-CPU anchor), so box drift between
rounds divides out; the fragment also reports each run's own in-suite
anchor drift (pre→post), which normalization can NOT correct — a run with
large in-suite drift should be rerun, not compared.
"""
import argparse
import json


def load(path):
    d = json.load(open(path))
    a = d["anchors"]
    drift = max(a["anchor_cpu_post"] / a["anchor_cpu_pre"],
                a["anchor_cpu_pre"] / a["anchor_cpu_post"])
    # prefer segment-local norms (time-resolved anchors, r14+) when present:
    # they divide mid-run drift out of exactly the queries it hit
    norms = d.get("queries_norm_cpu_local", d["queries_norm_cpu"])
    return norms, drift, d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--watch", default="")
    ap.add_argument("--old-label", default="old")
    ap.add_argument("--new-label", default="new")
    args = ap.parse_args()
    oldq, odrift, _ = load(args.old)
    newq, ndrift, nd = load(args.new)
    common = sorted(set(oldq) & set(newq))
    ratios = {q: newq[q] / max(oldq[q], 1e-6) for q in common}
    o_tot = sum(oldq[q] for q in common)
    n_tot = sum(newq[q] for q in common)
    print(f"- In-suite CPU-anchor drift: {args.old_label} {odrift:.2f}x, "
          f"{args.new_label} {ndrift:.2f}x (pre->post; <=1.2x = clean run).")
    print(f"- Suite normalized total over {len(common)} common queries: "
          f"{o_tot:.1f} -> {n_tot:.1f} anchor-units ({n_tot/o_tot:.2f}x).")
    movers_up = sorted(ratios.items(), key=lambda kv: -kv[1])[:5]
    movers_dn = sorted(ratios.items(), key=lambda kv: kv[1])[:5]
    print(f"- Top regressions (normalized {args.new_label}/{args.old_label}): "
          + (", ".join(f"{q} {r:.2f}x" for q, r in movers_up if r > 1.2) or "none >1.2x"))
    print("- Top improvements: "
          + (", ".join(f"{q} {r:.2f}x" for q, r in movers_dn if r < 0.8) or "none <0.8x"))
    watch = [q for q in args.watch.split(",") if q]
    if watch:
        print(f"- Watch-list adjudication ({args.old_label}->{args.new_label}, "
              "normalized):")
        for q in watch:
            if q not in ratios:
                print(f"  - {q}: not in both runs")
                continue
            verdict = ("cleared (within drift envelope)" if ratios[q] <= 1.3
                       else "REGRESSED - profile it")
            print(f"  - {q}: {oldq[q]:.2f} -> {newq[q]:.2f} "
                  f"({ratios[q]:.2f}x) - {verdict}")


if __name__ == "__main__":
    main()
