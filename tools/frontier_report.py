#!/usr/bin/env python3
"""Pareto report over IndexMaintBench's ivfpq_frontier rows.

Prints, per corpus scale, the Pareto-efficient design points of
(recall@10 UP, probed-row fraction DOWN) with serve seconds — the
operator's view of the recall-vs-scan trade the frontier measures
(the recommended band lives in the ivfPqTopKStored scaladoc).

  python3 tools/frontier_report.py tools/index_maint_r15.json
"""
import json
import sys


def pareto(rows):
    """Rows Pareto-efficient in (max recall, min probed fraction)."""
    out = []
    for r in rows:
        dominated = any(
            o["recall_at_10"] >= r["recall_at_10"]
            and o["probed_frac"] <= r["probed_frac"]
            and (o["recall_at_10"] > r["recall_at_10"]
                 or o["probed_frac"] < r["probed_frac"])
            for o in rows)
        if not dominated:
            out.append(r)
    return sorted(out, key=lambda r: r["probed_frac"])


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "tools/index_maint_r15.json"
    rows = [r for r in json.load(open(path))
            if r.get("family") == "ivfpq_frontier"]
    if not rows:
        print(f"no ivfpq_frontier rows in {path}")
        return 1
    for nv in sorted({r["n_vecs"] for r in rows}):
        sub = [r for r in rows if r["n_vecs"] == nv]
        print(f"\n== {nv} vectors: Pareto frontier "
              f"(recall@10 vs probed-row fraction) ==")
        print(f"{'nList':>5} {'k':>4} {'nProbe':>6} {'short':>6} "
              f"{'recall':>7} {'probed':>7} {'serve_s':>8}")
        for r in pareto(sub):
            print(f"{r['n_list']:>5} {r['codebook_k']:>4} "
                  f"{r['n_probe']:>6} {r['shortlist']:>6} "
                  f"{r['recall_at_10']:>7.3f} {r['probed_frac']:>7.3f} "
                  f"{r['serve_sec']:>8.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
