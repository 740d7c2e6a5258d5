#!/usr/bin/env python3
"""Compositional DuckDB verifier for pair_components at oracle-infeasible
scale: independent min-label fixpoint over an ALREADY-VERIFIED pair set.

WHY THIS EXISTS (round 18): the declared pair_components oracle is a
WITH RECURSIVE reachability CLOSURE — reach holds every (node, reachable
node) pair, O(sum of component size^2) OUTPUT volume. On the density-
stress corpus (2.54M edges / 15k nodes, near-giant component) DuckDB
disk-filled at >78 GB temp twice (32 threads/90 GB and 8 threads/100 GB)
— the closure's quadratic volume is the bound, not evaluation order, so
stepwise/slice/gc cannot save it. A non-recursive unrolled formulation is
no better MONOLITHICALLY: every relax stage re-references the edge CTE,
and DuckDB 1.0 re-inlines multiply-referenced CTEs into each consumer, so
a 30-stage chain plans ~180 copies of the pair machinery (measured: >11
minutes CPU-bound in the PLANNER at sf0.001 before being killed).

What IS feasible is the same algorithm the engine runs, evaluated
independently by DuckDB with MATERIALIZED stages: min-label propagation
(label(v) <- min(label(v), min over neighbors)) iterated to fixpoint —
per-round volume is |edges| join rows and |nodes| output rows, LINEAR,
and the fixpoint is unique regardless of iteration strategy. Composition
makes this a real cross-engine check rather than self-confirmation:

  1. the PAIR SET input is the engine's pairs_daily dump, which has its
     own REAL verbatim-oracle DuckDB match at the same scale
     (CORRECTNESS_sf1e.json: 2,567,205 rows, stepwise exact) — so the
     edges this tool consumes are cross-engine-verified values, and
  2. the label computation here is DuckDB SQL driven by this script:
     no Spark, no engine code, a from-scratch implementation of the
     (unique) min-label fixpoint.

What this does NOT re-derive: the pairs themselves (step 1 did). The
claim is exactly "given the verified pair set, the engine's component
labels, sizes and canonical flags are the unique fixpoint" — the step
the closure oracle was supposed to check and could not at this volume.

Usage:
  python3 tools/cc_fixpoint_check.py <pairs_daily_dump_dir> <pair_components_dump_dir>
      [--max-rounds 30] [--memory 40GB]
  python3 tools/cc_fixpoint_check.py --selftest

Exit 0 iff converged within --max-rounds AND the engine dump is an exact
multiset match (EXCEPT ALL both directions) of the derived frame.
"""
import sys
import time

import duckdb


def connect(memory="40GB"):
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{memory}'")
    return con


def fixpoint_labels(con, max_rounds=30):
    """Iterate min-label relax over table `sym(id, nbr)` to fixpoint.

    Leaves the result in table `lab(id, lab)`. Returns rounds used.
    Raises RuntimeError if not converged within max_rounds — the engine's
    own Dedup.dupClusters(maxRounds=30) contract, mirrored.
    """
    con.execute("CREATE OR REPLACE TABLE lab AS "
                "SELECT DISTINCT id, id AS lab FROM sym")
    for r in range(1, max_rounds + 1):
        con.execute("""
            CREATE OR REPLACE TABLE lab_next AS
            SELECT l.id, least(l.lab, m.mn) AS lab
            FROM lab l JOIN (
              SELECT s.id, min(p.lab) AS mn
              FROM sym s JOIN lab p ON p.id = s.nbr
              GROUP BY s.id) m ON m.id = l.id""")
        changed = con.execute(
            "SELECT count(*) FROM lab_next a JOIN lab b "
            "ON a.id = b.id AND a.lab < b.lab").fetchone()[0]
        con.execute("DROP TABLE lab")
        con.execute("ALTER TABLE lab_next RENAME TO lab")
        if changed == 0:
            return r
    raise RuntimeError(
        f"min-label fixpoint did not converge within {max_rounds} rounds — "
        f"mirrors the engine's Dedup.dupClusters(maxRounds=30) loud failure")


def derive_components(con, max_rounds=30):
    """From table `pairs(uid_a, uid_b, ...)`: build sym, run the fixpoint,
    and materialize `derived(user_id, cluster, comp_size, is_canonical)`."""
    con.execute("""
        CREATE OR REPLACE TABLE sym AS
        SELECT uid_a AS id, uid_b AS nbr FROM (SELECT DISTINCT uid_a, uid_b FROM pairs)
        UNION
        SELECT uid_b, uid_a FROM (SELECT DISTINCT uid_a, uid_b FROM pairs)""")
    rounds = fixpoint_labels(con, max_rounds)
    con.execute("""
        CREATE OR REPLACE TABLE derived AS
        SELECT l.id AS user_id, l.lab AS cluster, cs.comp_size,
               (l.id = l.lab) AS is_canonical
        FROM lab l JOIN (
          SELECT lab AS cluster, CAST(count(*) AS BIGINT) AS comp_size
          FROM lab GROUP BY 1) cs ON cs.cluster = l.lab""")
    return rounds


def multiset_diff(con, a, b, cols):
    """Rows in `a` not matched in `b` (multiset, EXCEPT ALL), plus reverse."""
    sel = ", ".join(cols)
    fwd = con.execute(
        f"SELECT count(*) FROM (SELECT {sel} FROM {a} "
        f"EXCEPT ALL SELECT {sel} FROM {b})").fetchone()[0]
    rev = con.execute(
        f"SELECT count(*) FROM (SELECT {sel} FROM {b} "
        f"EXCEPT ALL SELECT {sel} FROM {a})").fetchone()[0]
    return fwd, rev


def check(pairs_dir, comp_dir, max_rounds=30, memory="40GB"):
    con = connect(memory)
    con.execute(f"CREATE VIEW pairs AS "
                f"SELECT * FROM read_parquet('{pairs_dir}/*.parquet')")
    con.execute(f"CREATE VIEW engine AS "
                f"SELECT * FROM read_parquet('{comp_dir}/*.parquet')")
    t0 = time.time()
    rounds = derive_components(con, max_rounds)
    nodes, comps = con.execute(
        "SELECT count(*), count(DISTINCT cluster) FROM derived").fetchone()
    cols = ["user_id", "cluster", "comp_size", "is_canonical"]
    fwd, rev = multiset_diff(con, "derived", "engine", cols)
    dt = time.time() - t0
    ok = fwd == 0 and rev == 0
    print(f"fixpoint in {rounds} rounds; {nodes} nodes, {comps} components; "
          f"EXCEPT ALL diffs derived-engine={fwd} engine-derived={rev}; "
          f"{dt:.1f}s -> {'MATCH' if ok else 'MISMATCH'}")
    return ok


def selftest():
    con = connect("2GB")
    # two components: a 6-node CHAIN (exercises multi-round convergence,
    # min id 1 at one end) and a triangle; plus duplicate pair rows to
    # prove the DISTINCT guard
    con.execute("""
        CREATE TABLE pairs AS SELECT * FROM (VALUES
          (2, 1), (2, 3), (3, 4), (4, 5), (5, 6),
          (10, 11), (11, 12), (10, 12),
          (2, 3)) t(uid_a, uid_b)""")
    rounds = derive_components(con, max_rounds=30)
    got = sorted(con.execute("SELECT * FROM derived").fetchall())
    want = sorted(
        [(i, 1, 6, i == 1) for i in range(1, 7)] +
        [(i, 10, 3, i == 10) for i in (10, 11, 12)])
    assert got == want, f"selftest labels wrong:\n got {got}\nwant {want}"
    assert rounds >= 2, f"chain must take multiple rounds, took {rounds}"
    # comparator must FAIL on a corrupted engine frame (one flipped label)
    con.execute("CREATE TABLE engine AS SELECT * FROM derived")
    con.execute("UPDATE engine SET cluster = 99 WHERE user_id = 6")
    fwd, rev = multiset_diff(con, "derived", "engine",
                             ["user_id", "cluster", "comp_size",
                              "is_canonical"])
    assert fwd == 1 and rev == 1, f"comparator missed corruption: {fwd},{rev}"
    # non-convergence must be LOUD: a chain longer than max_rounds
    con2 = connect("2GB")
    vals = ", ".join(f"({i}, {i + 1})" for i in range(1, 12))
    con2.execute(f"CREATE TABLE pairs AS SELECT * FROM "
                 f"(VALUES {vals}) t(uid_a, uid_b)")
    try:
        derive_components(con2, max_rounds=3)
        raise AssertionError("expected non-convergence to raise")
    except RuntimeError:
        pass
    # flag parsing must keep flag VALUES out of the positional list
    assert parse_args(["p", "c", "--max-rounds", "30", "--memory", "8GB"]) \
        == (["p", "c"], 30, "8GB")
    assert parse_args(["--max-rounds", "5", "p", "c"]) == (["p", "c"], 5,
                                                          "40GB")
    assert parse_args(["p", "c", "--bogus"]) is None
    print("selftest OK")


def parse_args(argv):
    """Index loop that CONSUMES flag values, so "--max-rounds 30" does not
    leak "30" into the positional list (the r18 ADVICE bug: every flagged
    invocation printed usage and exited 2). Returns
    (positionals, max_rounds, memory) or None on an unknown flag."""
    args = []
    max_rounds = 30
    memory = "40GB"
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--max-rounds":
            max_rounds = int(argv[i + 1])
            i += 2
        elif a == "--memory":
            memory = argv[i + 1]
            i += 2
        elif a.startswith("--"):
            print(f"unknown flag: {a}")
            return None
        else:
            args.append(a)
            i += 1
    return args, max_rounds, memory


def main(argv):
    if "--selftest" in argv:
        selftest()
        return 0
    parsed = parse_args(argv)
    if parsed is None:
        print(__doc__)
        return 2
    args, max_rounds, memory = parsed
    if len(args) != 2:
        print(__doc__)
        return 2
    return 0 if check(args[0], args[1], max_rounds, memory) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
