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


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.sql(sql)
            want_cols = list(want.columns)
            want_rows = want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = list(got.columns)
            got_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            failures += 1
            continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: columns differ: spark={sorted(got_cols)} oracle={sorted(want_cols)}")
            failures += 1
            continue
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        wi = [want_cols.index(c) for c in sorted(want_cols)]
        g = [tuple(canon(r[i]) for i in gi) for r in got_rows]
        w = [tuple(canon(r[i]) for i in wi) for r in want_rows]
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
        # The driver compares through pandas, which is stricter than raw
        # fetchall: DuckDB HUGEINT (e.g. window sum of BIGINT) becomes
        # float64 ("32.0" != "32" after stringify) and array cells are
        # unsortable/unhashable. Mirror that path so those bugs fail here.
        try:
            want_df = con.sql(sql).df()
            got_df = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()

            def canonize(df):
                df = df[sorted(df.columns)]
                df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
                return df.astype(str)

            ndiff = (canonize(got_df).values != canonize(want_df).values).sum()
            if ndiff:
                print(f"FAIL {name}: pandas-path mismatch ({ndiff} cells; "
                      "likely a dtype canonicalization diff, e.g. HUGEINT)")
                failures += 1
                continue
        except Exception as e:
            print(f"FAIL {name}: pandas-path error (driver would err too): {e}")
            failures += 1
            continue
        print(f"OK   {name}: {len(g)} rows")
    print(f"{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
