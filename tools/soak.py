#!/usr/bin/env python3
"""sf1 soak report: compare two Bench JSONs (sf0.1 vs sf1, factor 10x)
and print per-query scaling exponents alpha = log10(t_big / t_small),
i.e. t ~ n^alpha for a 10x data-size step. Linear-ish operators should
land alpha <= ~1.2 (constant overheads push small-sf alpha below 1);
the documented-quadratic exact pair generators are expected near 2.

Usage: python3 tools/soak.py <bench_small.json> <bench_big.json>
"""
import json
import math
import sys


def main():
    # bench files carry a full line plus a compact tail-summary line;
    # the per-query map lives on the first line
    small = json.loads(open(sys.argv[1]).readline())
    big = json.loads(open(sys.argv[2]).readline())
    qs, qb = small["queries"], big["queries"]
    rows = []
    for name in sorted(qb):
        if name not in qs or qs[name] <= 0 or qb[name] <= 0:
            continue
        ratio = qb[name] / qs[name]
        alpha = math.log10(ratio)
        rows.append((alpha, ratio, name))
    rows.sort(reverse=True)
    print(f"{'query':28s} {'t_small':>8s} {'t_big':>8s} {'ratio':>7s} {'alpha':>6s}")
    for alpha, ratio, name in rows:
        print(f"{name:28s} {qs[name]:8.2f} {qb[name]:8.2f} {ratio:7.2f} {alpha:6.2f}")
    tot_s = sum(qs[n] for _, _, n in rows)
    tot_b = sum(qb[n] for _, _, n in rows)
    print(f"{'TOTAL':28s} {tot_s:8.2f} {tot_b:8.2f} {tot_b / tot_s:7.2f} "
          f"{math.log10(tot_b / tot_s):6.2f}")
    out = {n: {"t_small": qs[n], "t_big": qb[n], "alpha": round(a, 3)}
           for a, _, n in rows}
    json.dump({"factor": 10, "queries": out,
               "probe_small": small.get("probe"), "probe_big": big.get("probe")},
              open("/tmp/soak_report.json", "w"), indent=1)


if __name__ == "__main__":
    main()
