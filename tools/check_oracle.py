#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run DuckDB oracle SQL
against the testdata parquet and diff with the Verify.scala parquet dumps.
Dev tool only — NOT part of the library (the engine itself is pure Scala).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, math, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def rows_of(df):
    """Canonical string tuples in the frame's own row order (column-sorted).
    to_records().tolist() yields Python-native scalars for numeric dtypes, so
    canon() sees the same value kinds on both sides."""
    df = df[sorted(df.columns)]
    return [tuple(canon(v) for v in r)
            for r in df.to_records(index=False).tolist()]


def canonize(df):
    """The driver's unordered pandas compare: stringify FIRST, then sort, so
    both frames order on the same canonical representation even when dtypes
    round-trip differently (e.g. HUGEINT->float64 above 2^53)."""
    df = df[sorted(df.columns)].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single parquet FILES; engine-generated scale
        # dirs (graft.ScaleGen) are Spark-style DIRECTORIES of part files —
        # accept both layouts
        path = f"{sf_dir}/{t}.parquet"
        import os
        pat = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{pat}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        # One execution per side; both the ordered compare and the driver-style
        # pandas compare are derived from the same frame. The pandas path is
        # the driver's actual semantics (HUGEINT->float64 etc.), so going
        # through .df() for the strict compare too keeps both sides symmetric.
        try:
            want_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        try:
            got_df = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            failures += 1
            continue
        if sorted(got_df.columns) != sorted(want_df.columns):
            print(f"FAIL {name}: columns differ: "
                  f"spark={sorted(got_df.columns)} oracle={sorted(want_df.columns)}")
            failures += 1
            continue
        try:
            g = rows_of(got_df)
            w = rows_of(want_df)
        except (TypeError, ValueError) as e:
            # data-shaped cells the driver also can't compare (arrays etc.)
            print(f"FAIL {name}: uncomparable cells ({type(e).__name__}: {e})")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: row count spark={len(g)} oracle={len(w)}")
            failures += 1
            continue
        if g != w:
            # also try order-insensitive compare to distinguish sort-only diffs
            if sorted(g) == sorted(w):
                print(f"FAIL {name}: rows match but ORDER differs")
            else:
                bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, w)) if a != b][:3]
                print(f"FAIL {name}: value mismatch; first diffs (row, spark, oracle):")
                for i, a, b in bad:
                    print(f"  row {i}:\n    spark : {a}\n    oracle: {b}")
            failures += 1
            continue
        # Driver-style unordered stringly compare on the SAME frames.
        try:
            ndiff = (canonize(got_df).values != canonize(want_df).values).sum()
        except (TypeError, ValueError) as e:
            print(f"FAIL {name}: pandas canonize error — genuine driver-parity "
                  f"risk ({type(e).__name__}: {e})")
            failures += 1
            continue
        except Exception as e:
            # environment quirk (pandas version etc.), not a data mismatch:
            # surface it loudly but with its class so triage is easy
            print(f"WARN {name}: pandas-path environment error "
                  f"({type(e).__name__}: {e}) — strict compare already passed")
        else:
            if ndiff:
                print(f"FAIL {name}: pandas-path mismatch ({ndiff} cells; "
                      "likely a dtype canonicalization diff, e.g. HUGEINT)")
                failures += 1
                continue
        print(f"OK   {name}: {len(g)} rows")
    print(f"{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
