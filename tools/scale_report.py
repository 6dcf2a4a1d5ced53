#!/usr/bin/env python3
"""Scale-rehearsal report (dev tool, r18 — SURVEY §8p).

Usage: python3 tools/scale_report.py <bench_small.json> <bench_big.json> [factor]

Reads two Bench JSON lines (e.g. the driver's sf0.1 round artifact and a
GenData sf1.0 rehearsal), joins per-query wall + cpu_s, and prints a
markdown table with the per-query scaling exponent
    e = log(t_big / t_small) / log(factor)
(factor defaults to 10). e ≈ 1 is linear scaling, e < 1 sublinear (fixed
overhead still dominates), e > 1 superlinear — the rows to investigate.
Queries that failed (-1) on either side are listed separately: at the
rehearsal SF the cap-refused eval rows (c72/c83/c108/c114) are EXPECTED
there by design.
"""
import json
import math
import sys


def main():
    small = json.loads(open(sys.argv[1]).read().strip().splitlines()[0])
    big = json.loads(open(sys.argv[2]).read().strip().splitlines()[0])
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qs, qb = small["queries"], big["queries"]
    cs = small.get("queries_cpu_s", {})
    cb = big.get("queries_cpu_s", {})
    names = sorted(set(qs) & set(qb))
    rows, failed, missing = [], [], sorted(set(qs) ^ set(qb))
    for n in names:
        a, b = qs[n], qb[n]
        if a is None or b is None or a < 0 or b < 0:
            failed.append((n, a, b))
            continue
        e = math.log(max(b, 1e-4) / max(a, 1e-4)) / math.log(factor)
        rows.append((n, a, b, b / max(a, 1e-4), e,
                     cs.get(n, -1.0), cb.get(n, -1.0)))
    rows.sort(key=lambda r: -r[4])
    print(f"| query | t_small s | t_big s | ratio | exponent | cpu_small | cpu_big |")
    print("|---|---|---|---|---|---|---|")
    for n, a, b, r, e, ca, cbv in rows:
        print(f"| {n} | {a:.3f} | {b:.3f} | {r:.2f} | {e:.2f} | {ca:.2f} | {cbv:.2f} |")
    tot_a = sum(r[1] for r in rows)
    tot_b = sum(r[2] for r in rows)
    es = sorted(r[4] for r in rows)
    med = es[len(es) // 2] if es else float("nan")
    print(f"\nshared queries: {len(rows)}; total {tot_a:.1f} s -> {tot_b:.1f} s "
          f"(ratio {tot_b / max(tot_a, 1e-9):.2f}, exponent "
          f"{math.log(tot_b / max(tot_a, 1e-9)) / math.log(factor):.2f}); "
          f"median exponent {med:.2f}")
    print(f"superlinear (e > 1.15): "
          f"{[r[0] for r in rows if r[4] > 1.15] or 'none'}")
    if failed:
        print(f"failed/refused on one side: {[(n, a, b) for n, a, b in failed]}")
    if missing:
        print(f"present on one side only: {missing}")


if __name__ == "__main__":
    main()
