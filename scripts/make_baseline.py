#!/usr/bin/env python3
"""Regenerate the committed bench baseline resource from a BENCHOUT snapshot.

Usage: python3 scripts/make_baseline.py BENCHOUT_rNN.json

Writes src/main/resources/graft/bench_baseline.json with one entry per
query: {"t": min-merged seconds, "ph": 8-hex plan hash} plus a "_sf" key
recording the snapshot's scale factor (basename of its sf dir). Bench's
in-run outlier re-measure and the `vd` self-adjudication channel key on
both: times gate the triggers, plan hashes let the artifact say
"same plan, time environmental" itself, and `_sf` disables the whole
mechanism at any other scale factor (r15 ADVICE).
"""
import json, os, sys


def main():
    snap = json.load(open(sys.argv[1]))
    sf = os.path.basename((snap.get("sf") or "").rstrip("/"))
    assert sf, f"snapshot {sys.argv[1]} lacks an sf field"
    telem = snap.get("telemetry") or {}
    lines = ["{", f'"_sf": "{sf}",']
    entries = []
    for q in sorted(snap["queries"]):
        ph = (telem.get(q) or {}).get("plan") or ""
        entries.append(f'"{q}": {{"t": {round(snap["queries"][q], 3)}, "ph": "{ph}"}}')
    lines.append(",\n".join(entries))
    lines.append("}")
    out = os.path.join(os.path.dirname(__file__), "..",
                       "src/main/resources/graft/bench_baseline.json")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    n_ph = sum(1 for q in snap["queries"] if (telem.get(q) or {}).get("plan"))
    print(f"wrote {out}: {len(snap['queries'])} queries, {n_ph} plan hashes, _sf={sf}")


if __name__ == "__main__":
    main()
