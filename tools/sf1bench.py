#!/usr/bin/env python3
"""Merge per-family sf1 bench windows into BENCH_SF1.json with growth factors.

The sf1 suite cannot run in ONE JVM window: the dedup family's staged
localCheckpoint blocks squeeze the single local JVM at 10x data and
inflate UNRELATED queries that happen to run later (round 11 measured
geo_nearest_signal 54 s in-session vs 15.3 s isolated). Each family
therefore gets its own `graft.Bench` window (own JVM, own warmup), and
this script merges the window artifacts and attaches per-query growth
vs the sf0.1 minima in BENCH_LOCAL.json.

Usage: python3 tools/sf1bench.py <windowJson...> --base BENCH_LOCAL.json \
         --out BENCH_SF1.json

--base is repeatable (and accepts comma-separated paths): per-family
base windows min-merge into one base map, so growth factors cover every
family instead of silently dropping queries absent from a single base
file (r19 advice: the sf10 growth table lost every non-ta family).
"""
import json, sys


def main():
    args = sys.argv[1:]
    base_paths = []
    out_path = "/root/repo/BENCH_SF1.json"
    windows = []
    i = 0
    while i < len(args):
        if args[i] == "--base":
            base_paths.extend(p for p in args[i + 1].split(",") if p)
            i += 2
        elif args[i] == "--out":
            out_path = args[i + 1]; i += 2
        else:
            windows.append(args[i]); i += 1
    if not base_paths:
        base_paths = ["/root/repo/BENCH_LOCAL.json"]
    base = {}
    for bp in base_paths:
        for q, v in json.load(open(bp))["queries"].items():
            if v >= 0 and (q not in base or base[q] < 0 or v < base[q]):
                base[q] = v
            elif q not in base:
                base[q] = v
    queries, spread, errors, meta = {}, {}, [], []
    for w in windows:
        d = json.load(open(w))
        # MIN-merge on duplicate query keys: passing two sweeps' window
        # files produces per-query minima across sweeps — the same
        # outer-round decorrelation graft.Bench applies within one
        # window (a contention minute lands on different queries each
        # sweep, and the min discards it). Spread follows its winning
        # window so it stays the variance evidence for the kept number.
        for q, v in d.get("queries", {}).items():
            if v >= 0 and (q not in queries or queries[q] < 0 or v < queries[q]):
                queries[q] = v
                if q in d.get("spread", {}):
                    spread[q] = d["spread"][q]
            elif q not in queries:
                queries[q] = v
        errors.extend(d.get("errors", []))
        meta.append({"window": w.split("/")[-1], "sf": d.get("sf"),
                     "repeats": d.get("repeats"),
                     "n": len(d.get("queries", {}))})
    growth = {q: round(v / base[q], 2) for q, v in queries.items()
              if q in base and base[q] > 0 and v >= 0}
    out = {
        "metric": "total", "unit": "sec", "sf": "/tmp/graft-sf1 (10x sf0.1)",
        "windows": meta, "errors": errors,
        "value": round(sum(v for v in queries.values() if v >= 0), 3),
        "queries": {q: queries[q] for q in sorted(queries)},
        "spread": {q: spread[q] for q in sorted(spread)},
        "growth_vs_sf01": {q: growth[q] for q in sorted(growth)},
    }
    json.dump(out, open(out_path, "w"), indent=1)
    worst = sorted(growth.items(), key=lambda kv: -kv[1])[:8]
    print(f"wrote {out_path}: {len(queries)} queries, total {out['value']}s")
    print("worst growth:", ", ".join(f"{q}={g}x" for q, g in worst))


if __name__ == "__main__":
    main()
