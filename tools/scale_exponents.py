#!/usr/bin/env python3
"""Compare two graft.Bench JSON lines (small sf vs big sf) and print
per-query scaling factors + log-base-FACTOR exponents, flagging wall growth
beyond FACTOR * 1.2 (super-linear by more than 20% per decade-equivalent).
Usage: scale_exponents.py small.json big.json [override_big.json] [factor]
An optional third file's query timings override the second's (re-runs on
fixed data); factor is the data-size ratio between the two (default 10)."""
import json
import math
import sys



def load(path):
    text = open(path).read()
    # accept either a raw graft.Bench line or the driver's BENCH_rN.json
    # wrapper whose "tail" captures the bench stdout
    try:
        doc = json.loads(text)
        if isinstance(doc, dict) and "metric" in doc:
            return doc
        if isinstance(doc, dict) and "tail" in doc:
            text = doc["tail"]
    except ValueError:
        pass
    for line in text.splitlines():
        line = line.strip()
        idx = line.find('{"metric"')
        if idx >= 0:
            return json.loads(line[idx:])
    raise SystemExit(f"no bench JSON line in {path}")


def main():
    base, big = load(sys.argv[1]), load(sys.argv[2])
    factor = float(sys.argv[4]) if len(sys.argv) > 4 else 10.0
    flag = factor * 1.2
    bq, gq = dict(base["queries"]), dict(big["queries"])
    giso = dict(big.get("isolated", {}))
    biso = dict(base.get("isolated", {}))
    if len(sys.argv) > 3 and sys.argv[3] not in ("", "-"):
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
    print(f"{'query':34s} {'small':>8s} {'big':>8s} {'x':>7s} {'exp':>5s} flag")
    for ratio, q, b, g in rows:
        exp = (math.log(ratio) / math.log(factor)) if ratio > 0 else float("nan")
        mark = "  <<< AUDIT" if ratio > flag else ""
        print(f"{q:34s} {b:8.3f} {g:8.3f} {ratio:7.2f} {exp:5.2f}{mark}")
    tot_b = sum(bq[q] for q in set(bq) & set(gq))
    tot_g = sum(gq[q] for q in set(bq) & set(gq))
    print(f"\ncommon-query totals: small {tot_b:.1f}s  big {tot_g:.1f}s  "
          f"ratio {tot_g / tot_b:.2f}x for {factor:g}x data")


if __name__ == "__main__":
    main()
