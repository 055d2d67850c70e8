#!/usr/bin/env python3
"""Per-gate scaling report for the round-9 empirical scaling audit:
reads Bench `_bench.json` artifacts from runs at sf0.1 / sf0.2 / sf0.4
(the ScaleData isomorphic-domain replicas) and prints each gate's
times, ratios, and fitted scaling exponent
    exp = log(t(sf0.4) / t(sf0.1)) / log(4)
(1.0 = linear, 0 = flat/constant, >1 super-linear). Local caveat: at
these sizes many gates carry seconds of fixed job-scheduling overhead,
which DEFLATES exponents — a gate reading exp ≤ 1 is consistent with
its documented complexity; the audit's alarm condition is exp
substantially ABOVE the documented class.

Usage: python3 tools/scaling_report.py <bench_sf01> <bench_sf02> <bench_sf04>
"""
import json
import math
import sys


def load(p):
    with open(p) as f:
        return json.load(f)["queries"]


def main(p1, p2, p4):
    t1, t2, t4 = load(p1), load(p2), load(p4)
    names = sorted(set(t1) & set(t2) & set(t4))
    missing = sorted((set(t1) | set(t2) | set(t4)) - set(names))
    if missing:
        print(f"(not in all three runs, skipped: {', '.join(missing)})")
    print(f"{'gate':<28}{'sf0.1':>8}{'sf0.2':>8}{'sf0.4':>8}"
          f"{'x2':>6}{'x4':>6}{'exp':>6}")
    rows = []
    for n in names:
        a, b, c = t1[n], t2[n], t4[n]
        if a > 0 and c > 0:
            exp = math.log(c / a) / math.log(4)
            rows.append((exp, n, a, b, c))
            print(f"{n:<28}{a:>8.2f}{b:>8.2f}{c:>8.2f}"
                  f"{b / a:>6.2f}{c / a:>6.2f}{exp:>6.2f}")
        else:
            # a 0.00s reading carries no scaling signal; keep it out of
            # the max() too (a NaN there silently mis-selects the worst)
            print(f"{n:<28}{a:>8.2f}{b:>8.2f}{c:>8.2f}"
                  f"{'-':>6}{'-':>6}{'-':>6}  (sub-resolution, skipped)")
    if rows:
        worst = max(rows)
        print(f"\nhighest exponent: {worst[1]} exp={worst[0]:.2f}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
