#!/usr/bin/env python3
"""Min-merge N bench_out.json runs into a BENCHOUT snapshot.

Usage: python3 scripts/merge_bench.py out.json run1.json run2.json ...

Per query: keep the MINIMUM time across runs, with that run's telemetry
row (the least-contended observation of the same plan). Plan hashes are
pinned to the LAST run (the final-HEAD run by convention) after checking
for cross-run disagreements — any hash flip across runs is printed and
exits nonzero, because a context-dependent hash would make the bench-diff
flip channel unreadable. Total = sum of per-query minima; gc_s/spill_mb
are taken from the run with the smallest total (whole-run noise floor).
"""
import json, sys

def main():
    out_path, runs = sys.argv[1], [json.load(open(p)) for p in sys.argv[2:]]
    assert len(runs) >= 2, "need at least two runs to merge"
    names = list(runs[-1]["queries"].keys())
    for r in runs:
        assert set(r["queries"].keys()) == set(names), "query sets differ across runs"
    flips = []
    for q in names:
        hashes = {r["telemetry"][q].get("plan") for r in runs if q in r.get("telemetry", {})}
        if len(hashes) > 1:
            flips.append((q, sorted(hashes)))
    if flips:
        for q, hs in flips:
            print(f"HASH-DISAGREEMENT {q}: {hs}", file=sys.stderr)
        sys.exit(1)
    for i, r in enumerate(runs):
        missing = [q for q in names if q not in r.get("telemetry", {})]
        assert not missing, (
            f"run #{i + 1} ({sys.argv[2 + i]}) lacks telemetry for: "
            f"{missing[:5]}{'...' if len(missing) > 5 else ''}")
    queries, telem = {}, {}
    for q in names:
        best = min(runs, key=lambda r: r["queries"][q])
        queries[q] = best["queries"][q]
        t = dict(best["telemetry"][q])
        t["plan"] = runs[-1]["telemetry"][q].get("plan")
        telem[q] = t
    base = min(runs, key=lambda r: r["value"])
    snap = {
        "metric": "total", "value": round(sum(queries.values()), 3),
        "unit": "sec", "queries": queries, "errors": {},
        "gc_s": base.get("gc_s"), "spill_mb": base.get("spill_mb"),
        "telemetry": telem, "sf": runs[-1].get("sf"),
    }
    for r in runs:
        assert not r.get("errors"), f"run has errors: {r['errors']}"
    json.dump(snap, open(out_path, "w"))
    print(f"merged {len(runs)} runs -> {out_path}: total {snap['value']}s "
          f"/ {len(queries)} queries, zero errors, zero cross-run hash flips")

if __name__ == "__main__":
    main()
