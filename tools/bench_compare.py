#!/usr/bin/env python3
"""Cross-round bench comparator that ENFORCES the SCALING.md noise rule.

The round-13 variance study measured same-code, untainted, same-box
variance at +/-6% on suite totals and p90 1.33x per query — so a naked
per-query ratio between two round artifacts is NOT evidence of a
regression or an improvement. The operational rule it recorded:

  - totals: compare only untainted artifacts; differences within +/-10%
    are noise by default;
  - per-query: a claim (either direction) needs a 15-rep probe pair on
    the same box — the way `dwell_episodes` was adjudicated in round 13.

This tool turns that prose into the gate the round-final step runs: it
compares two committed `BENCH_full.json` artifacts and REFUSES (exit 1)
to bless per-query regression/improvement claims that lack a probe —
mirroring how the `tainted` flag already polices totals. Dev tool only
(driver-side python).

Usage:
  python3 tools/bench_compare.py <old_BENCH_full.json> <new_BENCH_full.json> \
      [--probes <dir>]

Probe protocol: for a candidate query q, run BOTH builds 15-rep targeted
  SPARK_GRAFT_BENCH_ONLY=q SPARK_GRAFT_BENCH_REPS=15 sbt "runMain graft.Bench"
and drop the two artifacts at <dir>/q.old.json and <dir>/q.new.json.
The probe verdict uses quartile separation: a claim holds only when the
two 15-rep distributions don't overlap at the quartiles (p25 of the
slower side above p75 of the faster side) AND medians differ > 10%.

Exit codes: 0 = comparison clean (no unproven candidates), 1 = unproven
per-query candidates present or a tainted artifact was offered, 2 = usage.
"""
import json
import os
import sys

TOTAL_NOISE = 0.10      # +/-10% on untainted totals is noise
QUERY_RATIO = 1.4       # per-query candidate threshold (either direction)
QUERY_ABS_SEC = 0.15    # ... with an absolute floor so 0.02s->0.04s can't flag
PROBE_MEDIAN_GAP = 0.10 # probe verdict needs >10% median separation


def quartiles(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 4], s[n // 2], s[(3 * n) // 4]


def probe_verdict(old_reps, new_reps):
    """(verdict, detail): 'regression' / 'improvement' / 'noise'."""
    o25, o50, o75 = quartiles(old_reps)
    n25, n50, n75 = quartiles(new_reps)
    detail = (f"old p25/p50/p75 {o25:.3f}/{o50:.3f}/{o75:.3f}; "
              f"new {n25:.3f}/{n50:.3f}/{n75:.3f}")
    if o50 <= 0:
        return "noise", detail
    gap = (n50 - o50) / o50
    if gap > PROBE_MEDIAN_GAP and n25 > o75:
        return "regression", detail
    if gap < -PROBE_MEDIAN_GAP and n75 < o25:
        return "improvement", detail
    return "noise", detail


def parse_args(argv):
    """Split argv into (positional, probes_dir), consuming --probes WITH its
    value so the value never leaks into the positional list (the round-14
    bug that made --probes mode unreachable). Returns (None, None) on a
    malformed flag."""
    args, probes_dir, i = [], None, 0
    while i < len(argv):
        a = argv[i]
        if a == "--probes":
            if i + 1 >= len(argv):
                return None, None
            probes_dir = argv[i + 1]
            i += 2
        elif a == "--selftest":
            i += 1  # handled in main before parse_args
        elif a.startswith("--"):
            return None, None
        else:
            args.append(a)
            i += 1
    return args, probes_dir


def selftest():
    """Pin the arg-parsing contract and the probe verdict math."""
    a, p = parse_args(["old.json", "new.json", "--probes", "/tmp/p"])
    assert a == ["old.json", "new.json"] and p == "/tmp/p", (a, p)
    a, p = parse_args(["--probes", "/tmp/p", "old.json", "new.json"])
    assert a == ["old.json", "new.json"] and p == "/tmp/p", (a, p)
    a, p = parse_args(["old.json", "new.json"])
    assert a == ["old.json", "new.json"] and p is None, (a, p)
    a, p = parse_args(["old.json", "new.json", "--probes"])  # missing value
    assert a is None, (a, p)
    a, p = parse_args(["old.json", "new.json", "--bogus"])
    assert a is None, (a, p)
    # probe verdict: non-overlapping quartiles + >10% median gap
    slow = [1.5 + 0.01 * i for i in range(15)]
    fast = [1.0 + 0.01 * i for i in range(15)]
    assert probe_verdict(fast, slow)[0] == "regression"
    assert probe_verdict(slow, fast)[0] == "improvement"
    assert probe_verdict(fast, [x * 1.05 for x in fast])[0] == "noise"
    # set-aware baseline gate: added / removed queries stay OUT of the ratio
    def art(qs, **kw):
        d = {"value": round(sum(qs.values()), 3), "calib_spread": 1.2,
             "tainted": False,
             "queries": {k: {"min": v, "median": v, "reps": [v]}
                         for k, v in qs.items()}}
        d.update(kw)
        return d
    base = art({"a": 1.0, "b": 2.0})
    # added query: current has new 100s query c — would be 34x on raw
    # totals, but the intersection {a,b} is flat -> gate OK
    assert baseline_gate(base, art({"a": 1.0, "b": 2.0, "c": 100.0})) == 0
    # removed query: baseline-only b excluded; intersection {a} flat -> OK
    assert baseline_gate(base, art({"a": 1.0})) == 0
    # real regression on the intersection still fails regardless of set noise
    assert baseline_gate(base, art({"a": 3.0, "b": 6.0, "c": 0.01})) == 1
    # tainted current refuses
    assert baseline_gate(base, art({"a": 1.0, "b": 2.0}, tainted=True)) == 1
    # disjoint sets refuse rather than divide nothing
    assert baseline_gate(base, art({"z": 1.0})) == 1
    # spread-rule boundary: differing (or one-side-unstamped) rules note
    # loudly; identical rules stay silent
    v3 = {"spread_rule": "settled-pre+interior+post/v3"}
    assert spread_rule_note(v3, "a", {}, "b") is True
    assert spread_rule_note(v3, "a", dict(v3), "b") is False
    assert spread_rule_note({}, "a", {}, "b") is False
    print("selftest OK")
    return 0


BASELINE_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BASELINE_bench.json")
BASELINE_GATE = 2.0  # the driver's 2x rule, re-anchored at the 165-query surface


def spread_rule_note(a, a_name, b, b_name):
    """Print a loud note when two artifacts' calib-spread VERDICTS were
    computed under different rules (`spread_rule`; absent = a pre-r17
    artifact, i.e. v1 pre+interior+post or v2 interior+post — the field
    exists so this comparison is never silent). The timings themselves are
    rule-independent, so this never fails a gate — but a spread/taint
    difference between the two artifacts must not be read as a
    box-quietness difference across a rule boundary."""
    ra = a.get("spread_rule", "pre-v3 (unstamped)")
    rb = b.get("spread_rule", "pre-v3 (unstamped)")
    if ra != rb:
        print(f"NOTE: spread rules differ — {a_name}: {ra!r} vs "
              f"{b_name}: {rb!r}; taint/spread values are not comparable "
              f"across the rule boundary (timings are)")
        return True
    return False


def baseline_gate(base, cur, base_name="BASELINE_bench.json",
                  cur_name="BENCH_full.json"):
    """Set-aware round-final gate (round 16): the baseline and the current
    artifact may cover DIFFERENT query sets (the suite grows ~5 queries a
    round), so dividing raw totals drifts toward spurious failure as the
    numerator grows against a frozen denominator. Instead:

      - compare per-query `min` totals over the QUERY-NAME INTERSECTION;
      - report (not gate) the set differences with their own totals;
      - extend BASELINE_bench.json with each new query's first untainted
        measurement (provenance-noted) so the denominator grows with the
        suite — `tools/extend_baseline.py` / the SCALING.md protocol.

    Also prints exactly which record it gated against (path, total, spread,
    tainted flag) per the round-15 #5 adjudication rule."""
    if cur.get("tainted"):
        print(f"current {cur_name} is TAINTED — re-run quiet before gating")
        return 1
    spread_rule_note(base, base_name, cur, cur_name)
    bq = {k: v["min"] for k, v in base.get("queries", {}).items()}
    cq = {k: v["min"] for k, v in cur.get("queries", {}).items()}
    common = sorted(bq.keys() & cq.keys())
    only_base = sorted(bq.keys() - cq.keys())
    only_cur = sorted(cq.keys() - bq.keys())
    print(f"gating against: {base_name} (total {base.get('value')}s, "
          f"{len(bq)} queries, spread {base.get('calib_spread')}) vs "
          f"{cur_name} (total {cur.get('value')}s, {len(cq)} queries, "
          f"spread {cur.get('calib_spread')}, tainted={cur.get('tainted')})")
    if not common:
        print("GATE FAILED: no common queries between baseline and current")
        return 1
    bt = sum(bq[q] for q in common)
    ct = sum(cq[q] for q in common)
    print(f"intersection: {len(common)} queries — baseline {bt:.3f}s, "
          f"current {ct:.3f}s")
    if only_base:
        print(f"  baseline-only ({len(only_base)}): "
              f"{', '.join(only_base)} = "
              f"{sum(bq[q] for q in only_base):.3f}s (excluded from gate; "
              f"removed queries should be pruned from the baseline)")
    if only_cur:
        print(f"  current-only ({len(only_cur)}): {', '.join(only_cur)} = "
              f"{sum(cq[q] for q in only_cur):.3f}s (excluded from gate; "
              f"extend the baseline with their first untainted measurement)")
    ratio = ct / bt if bt > 0 else float("inf")
    print(f"intersection ratio x{ratio:.3f} (gate {BASELINE_GATE}x)")
    if ratio > BASELINE_GATE:
        print(f"GATE FAILED: intersection total exceeds {BASELINE_GATE}x "
              "of the baseline")
        return 1
    print("gate OK")
    return 0


def baseline_mode():
    base = json.load(open(BASELINE_PATH))
    cur = json.load(open(os.path.join(os.path.dirname(BASELINE_PATH),
                                      "BENCH_full.json")))
    return baseline_gate(base, cur)


def main(argv):
    if "--selftest" in argv:
        return selftest()
    if "--baseline" in argv:
        return baseline_mode()
    args, probes_dir = parse_args(argv)
    if args is None or len(args) != 2:
        print("usage: python3 tools/bench_compare.py <old_BENCH_full.json> "
              "<new_BENCH_full.json> [--probes <dir>] [--selftest] "
              "[--baseline]")
        return 2
    old = json.load(open(args[0]))
    new = json.load(open(args[1]))

    bad = [p for p, d in ((args[0], old), (args[1], new)) if d.get("tainted")]
    if bad:
        print(f"TAINTED artifact(s): {', '.join(bad)} — totals from a "
              "contended box are not regression evidence; re-run quiet.")
        return 1

    spread_rule_note(old, args[0], new, args[1])
    ot, nt = old.get("value"), new.get("value")
    tr = nt / ot if ot else float("inf")
    verdict = ("within noise (+/-10%)" if abs(1 - tr) <= TOTAL_NOISE
               else ("TOTAL REGRESSION candidate" if tr > 1
                     else "total improvement"))
    print(f"totals: {ot}s -> {nt}s (x{tr:.3f}) — {verdict}")

    oq = {k: v["min"] for k, v in old.get("queries", {}).items() if v["min"] > 0}
    nq = {k: v["min"] for k, v in new.get("queries", {}).items() if v["min"] > 0}
    candidates = []
    for q in sorted(oq.keys() & nq.keys()):
        r = nq[q] / oq[q] if oq[q] > 0 else float("inf")
        if (r >= QUERY_RATIO or r <= 1 / QUERY_RATIO) and \
                abs(nq[q] - oq[q]) >= QUERY_ABS_SEC:
            candidates.append((q, oq[q], nq[q], r))

    if not candidates:
        print(f"per-query: no candidates beyond the {QUERY_RATIO}x/"
              f"{QUERY_ABS_SEC}s noise threshold over "
              f"{len(oq.keys() & nq.keys())} common queries")
        return 0

    unproven = []
    for q, o, n, r in candidates:
        direction = "slower" if r > 1 else "faster"
        po = os.path.join(probes_dir, f"{q}.old.json") if probes_dir else None
        pn = os.path.join(probes_dir, f"{q}.new.json") if probes_dir else None
        if po and pn and os.path.exists(po) and os.path.exists(pn):
            oreps = json.load(open(po))["queries"][q]["reps"]
            nreps = json.load(open(pn))["queries"][q]["reps"]
            v, detail = probe_verdict(oreps, nreps)
            print(f"  {q}: {o:.3f} -> {n:.3f} (x{r:.2f}, {direction}) — "
                  f"probe verdict: {v.upper()} ({detail})")
        else:
            unproven.append(q)
            print(f"  {q}: {o:.3f} -> {n:.3f} (x{r:.2f}, {direction}) — "
                  f"UNPROVEN: within p90-1.33x same-code variance reach; "
                  f"needs a 15-rep probe pair "
                  f"({q}.old.json/{q}.new.json under --probes)")

    if unproven:
        print(f"GATE: {len(unproven)} per-query claim(s) lack a probe — "
              "do not record them as regressions/improvements (exit 1)")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
