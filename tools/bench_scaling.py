#!/usr/bin/env python3
"""Scaling bench curve: pair a quiet sf0.01 run with a quiet sf0.1 run —
plus, optionally, an sf1-EQUIVALENT run (graft.ScaleGen output) for the
steep scalers — and flag queries whose time ratio materially exceeds the
10x data ratio. The local proxy for the 100x question, and the instrument
that catches a quadratic term no plan reading spots. Dev tool only
(driver-side python).

Usage:
  python3 tools/bench_scaling.py <bench_sf001.json> <bench_sf01.json> \
      [bench_sf1e.json]
Writes BENCH_scaling.json, prints the worst scalers, and EXITS NONZERO if
any query is flagged on any leg — wire it into the round-final artifact
step so the tripwire cannot be forgotten.

Interpretation notes baked into the output:
  - at sf0.01 most queries are fixed-overhead dominated (~0.1 s of job
    scheduling), which DEFLATES ratios; a ratio near 10 therefore already
    means super-linear data cost, and we flag at >= 12 with an absolute
    floor so noise on sub-0.3 s queries can't trigger.
  - the sf0.1 -> sf1e leg is the one the overhead floor can't deflate:
    at sf0.1 the steep scalers already run 0.4-1.3 s, so a hidden
    super-linear term with a small constant shows here first.
  - gold-table build time is excluded per-query by construction (Bench
    builds gold once, outside the timed loop); the sf1e gold build IS
    reported (`huge.gold_build_sec`) because co-movement pair density
    scales super-linearly by construction there — see SCALING.md.
"""
import json
import sys

RATIO_FLAG = 12.0   # 10x data, 20% headroom
MIN_BIG_SEC = 0.30  # ignore ratios on queries still in fixed-overhead land

# Flagged-but-adjudicated (LEG, query) pairs: the flag stays in the
# artifact (visible, re-examined every round) but does not fail the gate.
# Scoped per leg on purpose: shadow_pairs' rationale predicts FLAT scaling
# on the density-preserving sf0.01->sf0.1 leg, so a flag THERE would be a
# genuine regression the waiver must not silence. Every entry MUST cite
# the SCALING.md section holding the measured rationale.
WAIVERS = {
    ("sf1e", "shadow_pairs"):
        "inherent wedge volume: the density-stress sf1e input grows true "
        "wedge count ~96x (960M vs ~10M; avg degree 338, max 902, nothing "
        "clipped at cap 1000) and measured runtime is LINEAR in wedges "
        "(126s @960M, 9.2s @74M cap=100, 3.0s cap=32) — maxNeighbors is "
        "the production cost knob, clipped flag marks approximation; "
        "density-preserving x10 is flat at 0.92x. SCALING.md round 13.",
}


def leg(lo, hi, lo_key, hi_key, leg_name):
    rows = []
    for name, h in hi["queries"].items():
        l = lo["queries"].get(name)
        if not l:
            continue
        lmin, hmin = l["min"], h["min"]
        ratio = hmin / lmin if lmin > 0 else float("inf")
        row = {"query": name, lo_key: round(lmin, 3),
               hi_key: round(hmin, 3), "ratio": round(ratio, 2),
               "flag": ratio >= RATIO_FLAG and hmin >= MIN_BIG_SEC}
        if row["flag"] and (leg_name, name) in WAIVERS:
            row["waived"] = WAIVERS[(leg_name, name)]
        rows.append(row)
    rows.sort(key=lambda r: -r["ratio"])
    return rows


def run_meta(d):
    return {"sf": d.get("sf"), "total": d.get("value"),
            "tainted": d.get("tainted"),
            "calib_spread": d.get("calib_spread"),
            "gold_build_sec": d.get("gold_build_sec")}


def main(small_path, big_path, huge_path=None):
    small = json.load(open(small_path))
    big = json.load(open(big_path))
    rows = leg(small, big, "sf001_sec", "sf01_sec", "small_big")
    out = {
        "data_ratio": 10.0,
        "flag_threshold": RATIO_FLAG,
        "min_big_sec": MIN_BIG_SEC,
        "small": run_meta(small),
        "big": run_meta(big),
        "flagged": [r for r in rows if r["flag"]],
        "queries": rows,
    }
    def gate_count(rs):
        return len([r for r in rs if r["flag"] and "waived" not in r])

    flagged = gate_count(rows)
    if huge_path:
        huge = json.load(open(huge_path))
        hrows = leg(big, huge, "sf01_sec", "sf1e_sec", "sf1e")
        out["huge"] = run_meta(huge)
        out["huge_leg"] = {
            "note": "sf1-equivalent (graft.ScaleGen x10 of sf0.1, "
                    "density-STRESS variant) — the leg past the "
                    "fixed-overhead floor; only the steep-scaler subset is "
                    "benched there",
            "flagged": [r for r in hrows if r["flag"]],
            "queries": hrows,
        }
        flagged += gate_count(hrows)
    with open("BENCH_scaling.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"small total {small.get('value')}s tainted={small.get('tainted')}; "
          f"big total {big.get('value')}s tainted={big.get('tainted')}")
    print(f"{len(out['flagged'])} flagged of {len(rows)} on the sf0.01->sf0.1 leg")
    for r in rows[:15]:
        mark = " <-- FLAG" if r["flag"] else ""
        print(f"  {r['query']}: {r['sf001_sec']} -> {r['sf01_sec']} "
              f"(x{r['ratio']}){mark}")
    if huge_path:
        hq = out["huge_leg"]["queries"]
        print(f"{len(out['huge_leg']['flagged'])} flagged of {len(hq)} "
              f"on the sf0.1->sf1e leg")
        for r in hq:
            mark = (" <-- FLAG (waived)" if "waived" in r
                    else " <-- FLAG") if r["flag"] else ""
            print(f"  {r['query']}: {r['sf01_sec']} -> {r['sf1e_sec']} "
                  f"(x{r['ratio']}){mark}")
    if flagged:
        print(f"GATE: {flagged} flagged without a waiver — failing (exit 1)")
        sys.exit(1)


if __name__ == "__main__":
    main(*sys.argv[1:4])
