#!/usr/bin/env python3
"""Two-scale bench curve: pair a quiet sf0.01 run with a quiet sf0.1 run
and flag queries whose time ratio materially exceeds the 10x data ratio —
the local proxy for the 100x question, and the instrument that catches a
quadratic term no plan reading spots. Dev tool only (driver-side python).

Usage: python3 tools/bench_scaling.py <bench_sf001.json> <bench_sf01.json>
Writes BENCH_scaling.json and prints the worst scalers.

Interpretation notes baked into the output:
  - at sf0.01 most queries are fixed-overhead dominated (~0.1 s of job
    scheduling), which DEFLATES ratios; a ratio near 10 therefore already
    means super-linear data cost, and we flag at >= 12 with an absolute
    floor so noise on sub-0.3 s queries can't trigger.
  - gold-table build time is excluded per-query by construction (Bench
    builds gold once, outside the timed loop).
"""
import json
import sys

RATIO_FLAG = 12.0   # 10x data, 20% headroom
MIN_BIG_SEC = 0.30  # ignore ratios on queries still in fixed-overhead land


def main(small_path, big_path):
    small = json.load(open(small_path))
    big = json.load(open(big_path))
    qs, qb = small["queries"], big["queries"]
    rows = []
    for name, b in qb.items():
        s = qs.get(name)
        if not s:
            continue
        smin, bmin = s["min"], b["min"]
        ratio = bmin / smin if smin > 0 else float("inf")
        rows.append({"query": name, "sf001_sec": round(smin, 3),
                     "sf01_sec": round(bmin, 3), "ratio": round(ratio, 2),
                     "flag": ratio >= RATIO_FLAG and bmin >= MIN_BIG_SEC})
    rows.sort(key=lambda r: -r["ratio"])
    out = {
        "data_ratio": 10.0,
        "flag_threshold": RATIO_FLAG,
        "min_big_sec": MIN_BIG_SEC,
        "small": {"sf": small.get("sf"), "total": small.get("value"),
                  "tainted": small.get("tainted"),
                  "calib_spread": small.get("calib_spread")},
        "big": {"sf": big.get("sf"), "total": big.get("value"),
                "tainted": big.get("tainted"),
                "calib_spread": big.get("calib_spread")},
        "flagged": [r for r in rows if r["flag"]],
        "queries": rows,
    }
    with open("BENCH_scaling.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"small total {small.get('value')}s tainted={small.get('tainted')}; "
          f"big total {big.get('value')}s tainted={big.get('tainted')}")
    print(f"{len(out['flagged'])} flagged of {len(rows)}")
    for r in rows[:15]:
        mark = " <-- FLAG" if r["flag"] else ""
        print(f"  {r['query']}: {r['sf001_sec']} -> {r['sf01_sec']} "
              f"(x{r['ratio']}){mark}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
