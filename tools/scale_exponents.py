#!/usr/bin/env python3
"""Compare two graft.Bench JSON lines (sf0.1 vs sf1) and print per-query
scaling factors + log10 exponents, flagging wall growth > FLAG x for 10x data.
Usage: scale_exponents.py bench_sf0.1.json bench_sf1.json [override_sf1.json]
An optional third file's query timings override the second's (re-runs on
fixed data)."""
import json
import math
import sys

FLAG = 12.0


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith('{"metric"'):
                return json.loads(line)
    raise SystemExit(f"no bench JSON line in {path}")


def main():
    base, big = load(sys.argv[1]), load(sys.argv[2])
    bq, gq = dict(base["queries"]), dict(big["queries"])
    giso = dict(big.get("isolated", {}))
    biso = dict(base.get("isolated", {}))
    if len(sys.argv) > 3:
        over = load(sys.argv[3])
        gq.update(over["queries"])
        giso.update(over.get("isolated", {}))
    rows = []
    for q in sorted(set(bq) & set(gq)):
        # prefer isolated numbers on BOTH sides when present (suite-context
        # noise dominates in-suite tails)
        b = biso.get(q, bq[q])
        g = giso.get(q, gq[q])
        if b <= 0:
            continue
        ratio = g / b
        rows.append((ratio, q, b, g))
    rows.sort(reverse=True)
    print(f"{'query':34s} {'sf0.1':>8s} {'sf1':>8s} {'x':>7s} {'exp':>5s} flag")
    for ratio, q, b, g in rows:
        exp = math.log10(ratio) if ratio > 0 else float("nan")
        flag = "  <<< AUDIT" if ratio > FLAG else ""
        print(f"{q:34s} {b:8.3f} {g:8.3f} {ratio:7.2f} {exp:5.2f}{flag}")
    tot_b = sum(bq[q] for q in set(bq) & set(gq))
    tot_g = sum(gq[q] for q in set(bq) & set(gq))
    print(f"\ncommon-query totals: sf0.1 {tot_b:.1f}s  sf1 {tot_g:.1f}s  "
          f"ratio {tot_g / tot_b:.2f}x for 10x data")


if __name__ == "__main__":
    main()
