#!/usr/bin/env python3
"""Per-family scaling factors between two Bench JSON lines (dev tool).
usage: tools/scaling_report.py bench_small.json bench_big.json [data_ratio]
Prints per-family median per-entry time ratio and flags entries whose
ratio exceeds the data ratio (super-linear scaling suspects)."""
import sys, json, re
from collections import defaultdict

def load(p):
    for line in open(p):
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            return json.loads(line)
    raise SystemExit(f"no bench JSON line in {p}")

def fam(name):
    m = re.match(r"(ts|olap|dedup|doc|emb|ann|events|sketch|mm|ingest|approx|store)_", name)
    return m.group(1) if m else "other"

def main(small_p, big_p, ratio):
    small, big = load(small_p), load(big_p)
    qs, qb = small["queries"], big["queries"]
    fams = defaultdict(list)
    suspects = []
    for k in sorted(set(qs) & set(qb)):
        a, b = qs[k], qb[k]
        if a <= 0 or b <= 0:
            continue
        r = b / a
        fams[fam(k)].append(r)
        # small-entry times are noise-dominated; only flag entries with
        # meaningful absolute cost at the big SF
        if r > ratio and b > 1.0:
            suspects.append((k, a, b, r))
    print(f"total: {small['value']:.1f}s -> {big['value']:.1f}s "
          f"(x{big['value']/small['value']:.2f} for x{ratio:.0f} data)")
    for f in sorted(fams):
        rs = sorted(fams[f])
        med = rs[len(rs)//2]
        print(f"  {f:8s} n={len(rs):3d} median x{med:.2f} max x{rs[-1]:.2f}")
    if suspects:
        print("super-linear suspects (ratio > data ratio AND >1s at big SF):")
        for k, a, b, r in sorted(suspects, key=lambda t: -t[3]):
            print(f"  {k}: {a:.2f}s -> {b:.2f}s (x{r:.1f})")
    else:
        print("no super-linear suspects (>1s) found")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 10.0)
