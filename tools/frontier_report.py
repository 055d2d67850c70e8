#!/usr/bin/env python3
"""Pareto report over IndexMaintBench's ivfpq_frontier rows.

Prints, per family and corpus scale, the Pareto-efficient design
points of (recall@10 UP, probed-row fraction DOWN) with serve seconds
— the operator's view of the recall-vs-scan trade the frontier
measures (the recommended band lives in the ivfPqTopKStored scaladoc).
Covers both the r15 base grid (`ivfpq_frontier`: nList ≤ 128,
shortlist ≤ 1024) and the r16 extension into the recommended band
(`ivfpq_frontier_ext`: nList 128-1024, shortlist 1024-25600, 1.28M
rung). With --target R it also prints, per scale, the measured config
reaching recall ≥ R at minimal probed fraction (the band-selection
readout).

  python3 tools/frontier_report.py tools/index_maint_r16.json
  python3 tools/frontier_report.py tools/index_maint_r16.json --target 0.95
"""
import json
import sys

FAMILIES = ("ivfpq_frontier", "ivfpq_frontier_ext")


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


def fmt(r):
    return (f"{r['n_list']:>5} {r['codebook_k']:>4} "
            f"{r['n_probe']:>6} {r['shortlist']:>6} "
            f"{r['recall_at_10']:>7.3f} {r['probed_frac']:>7.3f} "
            f"{r['serve_sec']:>8.2f}")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    target = None
    if "--target" in sys.argv:
        target = float(sys.argv[sys.argv.index("--target") + 1])
    path = args[0] if args else "tools/index_maint_r16.json"
    data = json.load(open(path))
    any_rows = False
    for fam in FAMILIES:
        rows = [r for r in data if r.get("family") == fam]
        if not rows:
            continue
        any_rows = True
        for nv in sorted({r["n_vecs"] for r in rows}):
            sub = [r for r in rows if r["n_vecs"] == nv]
            print(f"\n== {fam} @ {nv} vectors: Pareto frontier "
                  f"(recall@10 vs probed-row fraction) ==")
            print(f"{'nList':>5} {'k':>4} {'nProbe':>6} {'short':>6} "
                  f"{'recall':>7} {'probed':>7} {'serve_s':>8}")
            for r in pareto(sub):
                print(fmt(r))
            if target is not None:
                ok = [r for r in sub if r["recall_at_10"] >= target]
                if ok:
                    best = min(ok, key=lambda r: (r["probed_frac"],
                                                  r["serve_sec"]))
                    print(f"  -> recall >= {target} at minimal scan: "
                          f"{fmt(best).strip()}")
                else:
                    print(f"  -> NO measured config reaches recall >= "
                          f"{target} at this scale")
    if not any_rows:
        print(f"no frontier rows in {path}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
