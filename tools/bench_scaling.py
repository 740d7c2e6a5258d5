#!/usr/bin/env python3
"""Scaling bench curve: pair a quiet sf0.01 run with a quiet sf0.1 run —
plus, optionally, an sf1-EQUIVALENT run (graft.ScaleGen output, the
density-STRESS x10) and a density-PRESERVING sf1e_span run (ScaleGen
spanFactor=10: 10x rows AND 10x days) — and flag queries whose time
ratio materially exceeds the 10x data ratio. The local proxy for the
100x question, and the instrument that catches a quadratic term no plan
reading spots. Dev tool only (driver-side python).

Usage:
  python3 tools/bench_scaling.py <bench_sf001.json> <bench_sf01.json> \
      [bench_sf1e.json] [bench_sf1e_span.json]
Writes BENCH_scaling.json, prints the worst scalers, and EXITS NONZERO
if any query is flagged WITHOUT a valid waiver on any leg — wire it into
the round-final artifact step so the tripwire cannot be forgotten.

Interpretation notes baked into the output:
  - at sf0.01 most queries are fixed-overhead dominated (~0.1 s of job
    scheduling), which DEFLATES ratios; a ratio near 10 therefore already
    means super-linear data cost, and we flag at >= 12 with an absolute
    floor so noise on sub-0.3 s queries can't trigger.
  - the sf0.1 -> sf1e leg is the one the overhead floor can't deflate:
    at sf0.1 the steep scalers already run 0.4-1.3 s, so a hidden
    super-linear term with a small constant shows here first.
  - the sf0.1 -> sf1e_span leg is the shape a REAL 10x corpus grows
    along (more days/geography at constant density); a flag there is
    never waivable by the wedge-volume rationale and would be a genuine
    engine regression.
  - gold-table build time is excluded per-query by construction (Bench
    builds gold once, outside the timed loop); the sf1e/sf1e_span gold
    builds ARE reported (`huge.gold_build_sec` / `span.gold_build_sec`)
    because co-movement pair density scales super-linearly by
    construction on the stress variant — see SCALING.md.
"""
import json
import sys

RATIO_FLAG = 12.0   # 10x data, 20% headroom
MIN_BIG_SEC = 0.30  # ignore ratios on queries still in fixed-overhead land

# Flagged-but-adjudicated (LEG, query) pairs: the flag stays in the
# artifact (visible, re-examined every round) but does not fail the gate
# — and ONLY while the measured ratio stays at or below the waiver's
# max_ratio. A waiver is a bounded adjudication, not a blank check: the
# shadow_pairs rationale explains ~96x of wedge growth, so a future 900x
# (a NEW quadratic term on top) must re-trip the gate. Scoped per leg on
# purpose: shadow_pairs' rationale predicts FLAT scaling on the
# density-preserving legs, so a flag THERE would be a genuine regression
# the waiver must not silence. Every entry MUST cite the SCALING.md
# section holding the measured rationale.
WAIVERS = {
    ("sf1e", "shadow_pairs"): {
        # measured 83-93x across runs; 120 leaves noise headroom while
        # still catching any super-wedge term (2x over measured ~96x
        # wedge growth would read ~190x and fail).
        "max_ratio": 120.0,
        "why":
            "inherent wedge volume: the density-stress sf1e input grows "
            "true wedge count ~96x (960M vs ~10M; avg degree 338, max "
            "902, nothing clipped at cap 1000) and measured runtime is "
            "LINEAR in wedges (126s @960M, 9.2s @74M cap=100, 3.0s "
            "cap=32) — maxNeighbors is the production cost knob, clipped "
            "flag marks approximation; density-preserving x10 is flat at "
            "0.92x. SCALING.md round 13.",
    },
    ("sf1e", "triangle_counts"): {
        # measured 16.8x (round 16; 1.30s -> 21.8s) against a TRUE
        # triangle-volume growth of ~961x on the density-stress corpus
        # (sum(triangles): 70,317,381 vs 73,185 at sf0.1; same degree
        # inflation as shadow_pairs' wedges) — runtime is deeply
        # SUBLINEAR in the inherent workload. 35 gives noise headroom
        # (~2x measured) while still catching any genuinely super-linear
        # engine term long before the volume bound. Density-preserving
        # x10 is flat at 1.02x. SCALING.md round 16.
        "max_ratio": 35.0,
        "why":
            "inherent triangle volume: the density-stress sf1e input "
            "grows true triangle count ~961x (70.3M vs 73.2k; the same "
            "avg-degree-338 inflation behind shadow_pairs' waiver) while "
            "measured runtime grows 16.8x — sublinear in the workload; "
            "density-preserving x10 is flat at 1.02x. SCALING.md round 16.",
    },
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
        if row["flag"]:
            w = WAIVERS.get((leg_name, name))
            if w is not None:
                if ratio <= w["max_ratio"]:
                    row["waived"] = w["why"]
                    row["waiver_max_ratio"] = w["max_ratio"]
                else:
                    row["waiver_exceeded"] = (
                        f"ratio {ratio:.1f} exceeds waiver max_ratio "
                        f"{w['max_ratio']} — waiver void, gate fails")
        rows.append(row)
    rows.sort(key=lambda r: -r["ratio"])
    return rows


def gate_failing(rows):
    """Rows that fail the gate: flagged and not (validly) waived."""
    return [r for r in rows if r["flag"] and "waived" not in r]


def waived_rows(rows):
    return [r for r in rows if "waived" in r]


def leg_out(rows, note):
    return {
        "note": note,
        "flagged": gate_failing(rows),   # gate-failing only
        "waived": waived_rows(rows),     # adjudicated, visible, bounded
        "queries": rows,
    }


def run_meta(d):
    return {"sf": d.get("sf"), "total": d.get("value"),
            "tainted": d.get("tainted"),
            "calib_spread": d.get("calib_spread"),
            "gold_build_sec": d.get("gold_build_sec")}


def main(small_path, big_path, huge_path=None, span_path=None):
    small = json.load(open(small_path))
    big = json.load(open(big_path))
    rows = leg(small, big, "sf001_sec", "sf01_sec", "small_big")
    out = {
        "data_ratio": 10.0,
        "flag_threshold": RATIO_FLAG,
        "min_big_sec": MIN_BIG_SEC,
        "small": run_meta(small),
        "big": run_meta(big),
        "flagged": gate_failing(rows),
        "waived": waived_rows(rows),
        "queries": rows,
    }
    failing = len(out["flagged"])

    def print_leg(title, rs, lo_key, hi_key, limit=None):
        fl = gate_failing(rs)
        wv = waived_rows(rs)
        print(f"{len(fl)} gate-failing ({len(wv)} waived) of {len(rs)} "
              f"on the {title} leg")
        for r in (rs[:limit] if limit else rs):
            mark = ""
            if r["flag"]:
                if "waived" in r:
                    mark = " <-- FLAG (waived)"
                elif "waiver_exceeded" in r:
                    mark = " <-- FLAG (WAIVER EXCEEDED)"
                else:
                    mark = " <-- FLAG"
            print(f"  {r['query']}: {r[lo_key]} -> {r[hi_key]} "
                  f"(x{r['ratio']}){mark}")

    if huge_path:
        huge = json.load(open(huge_path))
        hrows = leg(big, huge, "sf01_sec", "sf1e_sec", "sf1e")
        out["huge"] = run_meta(huge)
        out["huge_leg"] = leg_out(
            hrows,
            "sf1-equivalent (graft.ScaleGen x10 of sf0.1, density-STRESS "
            "variant) — the leg past the fixed-overhead floor; only the "
            "steep-scaler subset is benched there")
        failing += len(out["huge_leg"]["flagged"])
    if span_path:
        span = json.load(open(span_path))
        srows = leg(big, span, "sf01_sec", "span_sec", "sf1e_span")
        out["span"] = run_meta(span)
        out["span_leg"] = leg_out(
            srows,
            "sf1-equivalent density-PRESERVING (graft.ScaleGen "
            "spanFactor=10: 10x rows AND 10x days, constant events/hour) "
            "— the shape a real 10x corpus grows along; FULL suite; no "
            "wedge-volume waiver applies here by design")
        failing += len(out["span_leg"]["flagged"])
    out["gate_failing"] = failing
    with open("BENCH_scaling.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"small total {small.get('value')}s tainted={small.get('tainted')}; "
          f"big total {big.get('value')}s tainted={big.get('tainted')}")
    print_leg("sf0.01->sf0.1", rows, "sf001_sec", "sf01_sec", limit=15)
    if huge_path:
        print_leg("sf0.1->sf1e (stress)", out["huge_leg"]["queries"],
                  "sf01_sec", "sf1e_sec")
    if span_path:
        print_leg("sf0.1->sf1e_span (density-preserving)",
                  out["span_leg"]["queries"], "sf01_sec", "span_sec",
                  limit=20)
    if failing:
        print(f"GATE: {failing} flagged without a valid waiver — "
              f"failing (exit 1)")
        sys.exit(1)


if __name__ == "__main__":
    if not 3 <= len(sys.argv) <= 5:
        print("usage: python3 tools/bench_scaling.py <bench_sf001.json> "
              "<bench_sf01.json> [bench_sf1e.json] [bench_sf1e_span.json]")
        sys.exit(2)
    main(*sys.argv[1:5])
