#!/usr/bin/env python3
"""Extend BASELINE_bench.json with new queries' first untainted measurement.

The set-aware gate (`bench_compare.py --baseline`) compares query-name
intersections, so queries absent from the baseline are silently excluded
from the ratio. This tool closes that hole per the SCALING.md protocol:
after a round's quiet final bench, run it to fold every current-only
query into the baseline, provenance-noted, and recompute `value` as the
sum of per-query mins over the extended set. Refuses tainted input.

Usage:
  python3 tools/extend_baseline.py [--note "round N ..."] [--dry-run]

Reads BENCH_full.json and BASELINE_bench.json at the repo root (relative
to this file), writes BASELINE_bench.json in place. Dev tool only
(driver-side python). Idempotent: re-running with no new queries is a
no-op.
"""
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(ROOT, "BASELINE_bench.json")
CURRENT = os.path.join(ROOT, "BENCH_full.json")


def selftest():
    import tempfile
    d = tempfile.mkdtemp()
    bp, cp = os.path.join(d, "b.json"), os.path.join(d, "c.json")

    def write(path, qs, tainted=False):
        json.dump({"value": round(sum(qs.values()), 3), "tainted": tainted,
                   "calib_spread": 1.2,
                   "queries": {k: {"min": v, "median": v, "reps": [v]}
                               for k, v in qs.items()}}, open(path, "w"))
    # tainted current refuses
    write(bp, {"a": 1.0})
    write(cp, {"a": 1.0, "b": 2.0}, tainted=True)
    assert main([], baseline=bp, current=cp) == 1
    # extension folds the new query in and recomputes value
    write(cp, {"a": 1.5, "b": 2.0})
    assert main([], baseline=bp, current=cp) == 0
    got = json.load(open(bp))
    assert set(got["queries"]) == {"a", "b"}, got
    assert got["queries"]["a"]["min"] == 1.0, "existing entries must not move"
    assert got["value"] == 3.0, got["value"]
    assert "b" in got.get("provenance", {}), "extension must be provenance-noted"
    # idempotent
    assert main([], baseline=bp, current=cp) == 0
    assert json.load(open(bp))["value"] == 3.0
    print("selftest OK")
    return 0


def main(argv, baseline=BASELINE, current=CURRENT):
    note, dry = "", False
    i = 0
    while i < len(argv):
        if argv[i] == "--selftest":
            return selftest()
        if argv[i] == "--note" and i + 1 < len(argv):
            note, i = argv[i + 1], i + 2
        elif argv[i] == "--dry-run":
            dry, i = True, i + 1
        else:
            print(__doc__)
            return 2
    base = json.load(open(baseline))
    cur = json.load(open(current))
    if cur.get("tainted"):
        print("BENCH_full.json is TAINTED — the baseline only accepts "
              "untainted first measurements; re-run quiet")
        return 1
    new_qs = sorted(set(cur["queries"]) - set(base["queries"]))
    if not new_qs:
        print("baseline already covers every current query — no-op")
        return 0
    prov = base.setdefault("provenance", {})
    stamp = note or (f"first untainted quiet measurement (total "
                     f"{cur.get('value')}s, spread "
                     f"{cur.get('calib_spread')})")
    for q in new_qs:
        base["queries"][q] = cur["queries"][q]
        prov[q] = stamp
    base["value"] = round(sum(v["min"] for v in base["queries"].values()), 3)
    print(f"extending baseline with {len(new_qs)} queries: "
          f"{', '.join(new_qs)} -> value {base['value']}s "
          f"({len(base['queries'])} queries)")
    if dry:
        print("dry run — not written")
        return 0
    json.dump(base, open(baseline, "w"), indent=1)
    print("written")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
