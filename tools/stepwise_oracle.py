#!/usr/bin/env python3
"""Stepwise-materialized DuckDB oracle runner for the CTE-heavy queries.

WHY THIS EXISTS (round 17): six declared oracles (shadow_pairs,
pair_pagerank, seed_pagerank, seed_distance, weighted_pagerank,
triangle_counts) were recorded "DuckDB-infeasible at 10x scale" since
round 14 — the monolithic statements spilled to disk-full (>70 GB temp)
on the span corpus. Round 17 root-caused the spill: it is NOT the data
volume. DuckDB inlines a WITH chain's multiply-referenced CTEs into every
consumer, so `hourly` (referenced 4x) and the 75M-row `pair_hours` get
re-planned/re-buffered per consumer and the temp explodes combinatorially.
Materializing the SAME chain stage by stage — `CREATE TABLE <name> AS
<verbatim CTE body>` in declaration order, then the verbatim final
SELECT — runs the whole shadow_pairs oracle on a 10x corpus in ~12 s
with zero spill. Every stage body and the final SELECT are byte-identical
substrings of the declared oracle SQL, so the re-derivation is exactly as
independent as the monolithic run; only the evaluation ORDER is pinned.

Usage:
  python3 tools/stepwise_oracle.py <sfDir> <verifyOutDir> [--only q1,q2]
      [--exclude q3,q4] [--memory 40GB] [--threads N]
      [--slice cte=column:valuesTable ...] [--gc]
      [--db path.duckdb] [--selftest]

--slice (round 18, for the stress-leg volume wall): materialize the named
CTE in VALUE SLICES instead of one statement — `CREATE ... WHERE 1=0`,
then one `INSERT ... WHERE <column> = v` per distinct v of
`SELECT DISTINCT <column> FROM <valuesTable>` (an EARLIER materialized
stage), plus a final `<column> IS NULL` slice. DuckDB pushes the slice
predicate into the body's joins, so the peak intermediate is one slice's,
not the whole stage's. CONTRACT the caller asserts: <valuesTable> must be
the stage the body reads <column> from (then the value list is exhaustive
by construction and the slice union IS the body, verbatim body text,
only evaluation order pinned — the same epistemic status as stepwise
itself). Example, the six stress-leg graph oracles:
  --slice pair_hours=dt:hourly

--gc (round 18, same wall): DROP a materialized stage as soon as no
LATER stage body nor the final statement references it (word-boundary
name match, conservative: a name inside a string literal still counts
as a reference). Without it the peak footprint is the SUM of every
stage in the chain; with it, the running maximum — on the stress-leg
graph oracles that is the difference between pair_hours (~30 GB) +
wed (~20 GB) coexisting and each being freed before the next giant
lands. Purely an eviction-order change: every stage is still built
from the verbatim body text before anything reads it.

--db <path> (round 18): back the stage tables with a file database
instead of :memory: — in-memory DuckDB cannot page BASE TABLES out
under memory pressure (only operator intermediates spill), so a chain
whose stage tables alone exceed the memory limit needs the file
backing. The file is removed before connect so each run starts clean.

Big-result compare (round 18): when the engine dump exceeds
BIG_COMPARE_ROWS, the pandas canonize path (which stringifies every
cell — ~60 GB of Python strings at 100M rows) is replaced by an exact
SQL multiset compare run inside DuckDB: the final statement is
materialized as a table and `engine EXCEPT ALL oracle` /
`oracle EXCEPT ALL engine` must both be empty, columns selected in
sorted-name order on both sides. This is STRICTER than the hash
compare it stands in for (exact multiset equality, no hash at all)
and streams/spills instead of materializing strings.

Compares each query's stepwise-oracle frame against the engine's Verify
parquet dump with check_oracle's own canonize/compare, prints OK/FAIL per
query, exits nonzero on any FAIL. Dev tool only (driver-side python).
"""
import importlib.util
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
_spec = importlib.util.spec_from_file_location(
    "check_oracle", os.path.join(HERE, "check_oracle.py"))
check_oracle = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(check_oracle)

TABLES = check_oracle.TABLES


class MonolithicRequired(Exception):
    """The statement cannot be materialized stage-by-stage (recursive CTE,
    CTE column list) — the caller must execute it as ONE statement, which
    is always semantically safe; stepwise is only a spill optimization."""


def split_with_chain(sql):
    """Split `WITH a AS (...), b AS (...) SELECT ...` into
    ([(name, body), ...], final_select). Returns ([], sql) when the
    statement has no top-level WITH. Tracks paren depth AND single-quoted
    string literals (a quoted ')' or ',' must not move the depth/split).
    Every returned body and the final select are verbatim substrings.

    Raises MonolithicRequired for shapes a CREATE-TABLE-per-stage walk
    cannot express: `WITH RECURSIVE` (the first "stage" would parse as a
    table named RECURSIVE and the self-reference cannot be a plain CTAS)
    and CTE column lists like `reach(id, r) AS (...)` (the column-list
    close-paren returns the walker to depth 0 mid-definition)."""
    s = sql.lstrip()
    if not s.upper().startswith("WITH "):
        return [], sql
    if s[5:].lstrip().upper().startswith("RECURSIVE"):
        raise MonolithicRequired("WITH RECURSIVE")
    defs_src = s[5:]
    # walk: collect top-level comma offsets until a segment stops looking
    # like `name AS (` — everything from there is the final statement
    stages, depth, in_str, start = [], 0, False, 0
    final_at = None
    i = 0
    while i < len(defs_src):
        c = defs_src[i]
        if in_str:
            if c == "'":
                in_str = False
        elif c == "'":
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                # end of a CTE body: the next non-space token decides —
                # ',' continues the chain, anything else starts the final
                j = i + 1
                while j < len(defs_src) and defs_src[j] in " \n\r\t":
                    j += 1
                seg = defs_src[start:i + 1]
                name = seg.strip().split()[0]
                if "(" in name:
                    # `reach(id, r) AS (...)`: the column-list paren closed
                    # at depth 0 and this "body" is the column list itself
                    raise MonolithicRequired(
                        f"CTE column list on {name.split('(')[0]!r}")
                body = seg[seg.index("(") + 1:seg.rindex(")")]
                stages.append((name, body))
                if j < len(defs_src) and defs_src[j] == ",":
                    start = j + 1
                    i = j
                else:
                    final_at = j
                    break
        i += 1
    if final_at is None:
        raise ValueError("WITH chain has no final statement")
    return stages, defs_src[final_at:]


def selftest():
    sql = ("WITH a AS (SELECT 1 AS x, ',' AS s FROM t WHERE u = '(('),\n"
           "b AS (SELECT x, count(*) AS n FROM a GROUP BY 1)\n"
           "SELECT x, n, least(n, 2) FROM b ORDER BY x, n")
    stages, final = split_with_chain(sql)
    assert [n for n, _ in stages] == ["a", "b"], stages
    assert stages[0][1] == "SELECT 1 AS x, ',' AS s FROM t WHERE u = '(('"
    assert final.startswith("SELECT x, n, least(n, 2)"), final
    # top-level commas in the final select must not confuse the splitter
    assert "least" in final and final.count(",") == 4
    # every piece is a verbatim substring of the input
    for _, b in stages:
        assert b in sql
    assert final in sql
    # no top-level WITH -> passthrough
    st, fin = split_with_chain("SELECT 1, 2 FROM t")
    assert st == [] and fin == "SELECT 1, 2 FROM t"
    # base-table collision refused
    try:
        check_no_collision([("events", "SELECT 1")])
        raise AssertionError("collision must be refused")
    except ValueError:
        pass
    check_no_collision([("hourly", "SELECT 1")])
    # WITH RECURSIVE must refuse to split (the first stage would parse as
    # a table named RECURSIVE), not mangle — r17 ADVICE case
    for bad in (
        "WITH RECURSIVE reach AS (SELECT 1 AS id UNION ALL "
        "SELECT id + 1 FROM reach WHERE id < 3) SELECT * FROM reach",
        "with recursive x as (select 1) select * from x",
        # CTE column list: the list's close-paren hits depth 0 mid-def
        "WITH reach(id, r) AS (SELECT 1, 2) SELECT * FROM reach",
    ):
        try:
            split_with_chain(bad)
            raise AssertionError(f"must require monolithic: {bad[:40]}")
        except MonolithicRequired:
            pass
    # end-to-end: run_query falls back monolithically and returns the
    # right rows + an explicit mode note (never a FAIL on a green engine)
    import duckdb
    con = duckdb.connect()
    df, mode = run_query(con, (
        "WITH RECURSIVE reach(id) AS (SELECT 1 UNION ALL "
        "SELECT id + 1 FROM reach WHERE id < 4) "
        "SELECT id FROM reach ORDER BY id"))
    assert list(df["id"]) == [1, 2, 3, 4], df
    assert mode.startswith("monolithic"), mode
    df2, mode2 = run_query(con, "SELECT 7 AS x")
    assert list(df2["x"]) == [7] and mode2 == "stepwise"
    # a splittable chain still splits (CREATE TABLE per stage)
    df3, mode3 = run_query(con, (
        "WITH a AS (SELECT 3 AS x), b AS (SELECT x + 1 AS y FROM a) "
        "SELECT y FROM b"))
    assert list(df3["y"]) == [4] and mode3 == "stepwise"
    assert con.sql("SELECT count(*) FROM a").fetchone()[0] == 1
    con.close()
    # --slice: per-value materialization of a named stage must equal the
    # unsliced run (values exhaustive from the provenance stage, NULL
    # slice included), with the mode note naming the slice count
    con2 = duckdb.connect()
    sliced_sql = (
        "WITH src AS (SELECT * FROM (VALUES (1, 'a'), (1, 'b'), (2, 'c'), "
        "(NULL, 'n')) t(d, v)), "
        "pairs AS (SELECT x.d, x.v AS va, y.v AS vb FROM src x "
        "JOIN src y ON x.d = y.d AND x.v < y.v "
        "UNION ALL SELECT d, v, v FROM src WHERE d IS NULL) "
        "SELECT d, va, vb FROM pairs ORDER BY d, va, vb")
    plain, _ = run_query(con2, sliced_sql)
    con2.close()
    con3 = duckdb.connect()
    slcd, smode = run_query(con3, sliced_sql,
                            {"pairs": ("d", "src")})
    con3.close()
    assert plain.equals(slcd), (plain, slcd)
    assert "pairs/2 d-slices" in smode, smode
    # --gc: dead stages drop as the chain advances, result unchanged; a
    # stage referenced only by the FINAL statement survives to the end
    con4 = duckdb.connect()
    gc_sql = (
        "WITH big AS (SELECT range AS x FROM range(5)), "
        "mid AS (SELECT x, x * 2 AS y FROM big), "
        "toptail AS (SELECT max(y) AS m FROM mid) "
        "SELECT m FROM toptail")
    gdf, gmode = run_query(con4, gc_sql, gc=True)
    assert list(gdf["m"]) == [8], gdf
    # big is dead after mid; mid after toptail; toptail must survive
    assert "gc [big mid]" in gmode, gmode
    tabs = {r[0] for r in con4.sql("SHOW TABLES").fetchall()}
    assert "toptail" in tabs and "big" not in tabs and "mid" not in tabs, tabs
    con4.close()
    # gc + slice compose: the sliced stage's values-table (src) is read
    # by the slicing machinery itself, and the conservative word-match
    # keeps it alive because the sliced body references it
    con5 = duckdb.connect()
    g2, g2mode = run_query(con5, sliced_sql, {"pairs": ("d", "src")},
                           gc=True)
    con5.close()
    assert plain.equals(g2), (plain, g2)
    assert "pairs/2 d-slices" in g2mode and "gc [src]" in g2mode, g2mode
    # big-result path: run_query_as_table + sql_multiset_compare agree
    # with the pandas path on match, and catch a 1-row multiset diff
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        con6 = duckdb.connect()
        con6.sql(f"COPY (SELECT range AS a, range % 2 AS b FROM range(10)) "
                 f"TO '{td}/part.parquet' (FORMAT PARQUET)")
        mode6 = run_query_as_table(
            con6, "WITH t AS (SELECT range AS a, range % 2 AS b "
                  "FROM range(10)) SELECT a, b FROM t", "__oracle", gc=True)
        en, on, ok6, diff6 = sql_multiset_compare(
            con6, f"{td}/*.parquet", "__oracle")
        assert (en, on, ok6, diff6) == (10, 10, True, 0), (en, on, ok6,
                                                           diff6)
        assert mode6.startswith("stepwise"), mode6
        # one changed row on one side -> nonzero symmetric diff
        con6.sql("UPDATE __oracle SET b = 99 WHERE a = 3")
        _, _, _, diff7 = sql_multiset_compare(
            con6, f"{td}/*.parquet", "__oracle")
        assert diff7 == 2, diff7  # the row differs in BOTH directions
        # column-set mismatch is schema_match=False, not a crash
        con6.sql("ALTER TABLE __oracle RENAME b TO c")
        _, _, ok8, _ = sql_multiset_compare(
            con6, f"{td}/*.parquet", "__oracle")
        assert ok8 is False
        con6.close()
    # word-boundary matcher: 'ed' must not match inside 'wed'/'ed2',
    # but quoted or case-shifted references still count (conservative)
    assert not _referenced("ed", ["SELECT * FROM wed"])
    assert not _referenced("ed", ["SELECT * FROM ed2"])
    assert _referenced("ed", ["SELECT * FROM ed JOIN x"])
    assert _referenced("ed", ['JOIN "ED" ON 1=1'])
    print("selftest OK")
    return 0


def check_no_collision(stages):
    """A CTE named after a base table shadows the view only from its
    definition point in monolithic evaluation but would REPLACE it for
    every stage here — refuse rather than silently diverge from the
    declared SQL's semantics."""
    for name, _ in stages:
        if name.lower() in TABLES:
            raise ValueError(
                f"CTE {name!r} collides with a base table; stepwise "
                f"materialization would change which relation later stages "
                f"read — run this query monolithically")


def _referenced(name, texts):
    """True when `name` appears as a whole word in any of `texts` —
    deliberately conservative (matches inside string literals too), so
    --gc can only keep a stage longer than strictly needed, never drop
    one a later body still reads."""
    import re
    pat = re.compile(r"(?<![A-Za-z0-9_])" + re.escape(name)
                     + r"(?![A-Za-z0-9_])", re.IGNORECASE)
    return any(pat.search(t) for t in texts)


BIG_COMPARE_ROWS = 5_000_000


def run_query_as_table(con, sql, table, slices=None, gc=False):
    """run_query, but land the final statement in `table` instead of a
    pandas frame (the big-result path — the result never leaves DuckDB).
    Returns the mode note."""
    try:
        stages, final = split_with_chain(sql)
        check_no_collision(stages)
    except (MonolithicRequired, ValueError) as e:
        con.sql(f'CREATE TABLE "{table}" AS {sql}')
        return f"monolithic — {e}"
    _, mode = _materialize(con, stages, final, slices, gc,
                           final_table=table)
    return mode


def sql_multiset_compare(con, engine_glob, oracle_table):
    """Exact multiset equality between the engine parquet dump and a
    materialized oracle table, computed entirely in DuckDB: sorted-name
    column projection on both sides, EXCEPT ALL in both directions.
    Returns (engine_rows, oracle_rows, schema_match, diff_rows)."""
    con.sql(f"CREATE OR REPLACE VIEW __engine AS "
            f"SELECT * FROM '{engine_glob}'")
    ecols = sorted(r[0] for r in con.sql("DESCRIBE __engine").fetchall())
    ocols = sorted(r[0] for r in
                   con.sql(f'DESCRIBE "{oracle_table}"').fetchall())
    en = con.sql("SELECT count(*) FROM __engine").fetchone()[0]
    on = con.sql(f'SELECT count(*) FROM "{oracle_table}"').fetchone()[0]
    if ecols != ocols:
        return en, on, False, None
    proj = ", ".join(f'"{c}"' for c in ecols)
    diff = con.sql(
        f'SELECT count(*) FROM ('
        f'(SELECT {proj} FROM __engine EXCEPT ALL '
        f' SELECT {proj} FROM "{oracle_table}") UNION ALL '
        f'(SELECT {proj} FROM "{oracle_table}" EXCEPT ALL '
        f' SELECT {proj} FROM __engine))').fetchone()[0]
    return en, on, True, diff


def run_query(con, sql, slices=None, gc=False):
    """Execute one oracle statement, stepwise when splittable; returns
    (DataFrame, mode_note). Recursive CTEs, CTE column lists, and CTE
    names that shadow base tables fall back to executing the declared
    statement MONOLITHICALLY — semantically always safe (stepwise exists
    only to sidestep DuckDB's CTE re-inlining spill), and never a FAIL.
    `slices` maps cte_name -> (column, values_table) — see the --slice
    contract in the module doc; `gc` drops dead stages (--gc)."""
    try:
        stages, final = split_with_chain(sql)
        check_no_collision(stages)
    except (MonolithicRequired, ValueError) as e:
        return con.sql(sql).df(), f"monolithic — {e}"
    return _materialize(con, stages, final, slices, gc)


def _materialize(con, stages, final, slices=None, gc=False,
                 final_table=None):
    """Shared stage walk: CREATE TABLE per stage (sliced where asked,
    GC'd where dead), then run the verbatim final statement — into a
    pandas frame, or into `final_table` for the big-result path."""
    sliced, dropped = [], []
    for idx, (name, body) in enumerate(stages):
        if slices and name in slices:
            col, vtab = slices[name]
            con.sql(f'CREATE TABLE "{name}" AS '
                    f'SELECT * FROM ({body}) __t WHERE 1=0')
            vals = [r[0] for r in con.sql(
                f'SELECT DISTINCT "{col}" FROM "{vtab}" '
                f'WHERE "{col}" IS NOT NULL ORDER BY 1').fetchall()]
            for v in vals:
                con.execute(f'INSERT INTO "{name}" SELECT * FROM ({body}) '
                            f'__t WHERE __t."{col}" = ?', [v])
            con.sql(f'INSERT INTO "{name}" SELECT * FROM ({body}) __t '
                    f'WHERE __t."{col}" IS NULL')
            sliced.append(f"{name}/{len(vals)} {col}-slices")
        else:
            con.sql(f'CREATE TABLE "{name}" AS {body}')
        if gc:
            # texts any live stage must survive: every LATER body, the
            # final statement, and the values-tables of later slices
            later = [b for _, b in stages[idx + 1:]] + [final]
            if slices:
                later += [slices[n][1] for n, _ in stages[idx + 1:]
                          if n in slices]
            for n, _ in stages[:idx + 1]:
                if n not in dropped and not _referenced(n, later):
                    con.sql(f'DROP TABLE "{n}"')
                    dropped.append(n)
    mode = "stepwise"
    if sliced:
        mode += ", " + ", ".join(sliced)
    if dropped:
        mode += f", gc [{' '.join(dropped)}]"
    if final_table is not None:
        con.sql(f'CREATE TABLE "{final_table}" AS {final}')
        return None, mode
    return con.sql(final).df(), mode


def main(argv):
    if "--selftest" in argv:
        return selftest()
    args, only, memory, slices, gc, dbpath = [], None, "40GB", {}, False, None
    exclude, threads = set(), None
    i = 0
    while i < len(argv):
        if argv[i] == "--only":
            only = set(argv[i + 1].split(","))
            i += 2
        elif argv[i] == "--exclude":
            # for multi-pass runs where a --slice spec only fits SOME
            # queries (CTE names are reused across oracles)
            exclude = set(argv[i + 1].split(","))
            i += 2
        elif argv[i] == "--memory":
            memory = argv[i + 1]
            i += 2
        elif argv[i] == "--slice":
            spec = argv[i + 1]
            cte, rest = spec.split("=", 1)
            colname, vtab = rest.split(":", 1)
            slices[cte] = (colname, vtab)
            i += 2
        elif argv[i] == "--gc":
            gc = True
            i += 1
        elif argv[i] == "--db":
            dbpath = argv[i + 1]
            i += 2
        elif argv[i] == "--threads":
            # fewer threads = fewer per-thread partitions in hash
            # distinct/join spill — the recursive-closure queries write
            # LESS total temp at lower parallelism
            threads = argv[i + 1]
            i += 2
        else:
            args.append(argv[i])
            i += 1
    if len(args) != 2:
        print("usage: python3 tools/stepwise_oracle.py <sfDir> <verifyOutDir>"
              " [--only q1,q2] [--exclude q3,q4] [--memory 40GB]"
              " [--threads N] [--slice cte=column:valuesTable ...] [--gc]"
              " [--db path.duckdb] [--selftest]")
        return 2
    sf_dir, out_dir = args
    import duckdb
    import pandas as pd
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    excluded = 0
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            continue
        if name in exclude:
            # explicit, so a partial pass of a multi-pass run never
            # visually resembles full-suite coverage
            print(f"SKIP {name} (--exclude)")
            excluded += 1
            continue
        # fresh db per query: stage tables can't leak across queries
        if dbpath:
            for suffix in ("", ".wal"):
                if os.path.exists(dbpath + suffix):
                    os.remove(dbpath + suffix)
            con = duckdb.connect(dbpath)
        else:
            con = duckdb.connect()
        con.sql(f"SET memory_limit='{memory}'")
        con.sql("SET preserve_insertion_order=false")
        if threads:
            con.sql(f"SET threads={int(threads)}")
        for t in TABLES:
            path = f"{sf_dir}/{t}.parquet"
            pat = f"{path}/*.parquet" if os.path.isdir(path) else path
            con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{pat}'")
        try:
            eglob = f"{out_dir}/{name}/*.parquet"
            ecount = con.sql(
                f"SELECT count(*) FROM '{eglob}'").fetchone()[0]
            if ecount > BIG_COMPARE_ROWS:
                mode = run_query_as_table(con, sql, "__oracle", slices, gc)
                en, on, schema_ok, diff = sql_multiset_compare(
                    con, eglob, "__oracle")
                if not schema_ok:
                    print(f"FAIL {name}: column sets differ")
                    failures += 1
                elif en != on:
                    print(f"FAIL {name}: engine {en} rows vs oracle {on}")
                    failures += 1
                elif diff != 0:
                    print(f"FAIL {name}: {en} rows, EXCEPT ALL diff "
                          f"{diff} rows")
                    failures += 1
                else:
                    print(f"OK   {name}: {en} rows ({mode}; "
                          f"sql-compare EXCEPT ALL)")
                continue
            odf, mode = run_query(con, sql, slices, gc)
            edf = duckdb.sql(f"SELECT * FROM '{eglob}'").df()
            a = check_oracle.canonize(edf)
            b = check_oracle.canonize(odf)
            if len(edf) != len(odf):
                print(f"FAIL {name}: engine {len(edf)} rows vs oracle "
                      f"{len(odf)}")
                failures += 1
            elif not a.equals(b):
                print(f"FAIL {name}: {len(edf)} rows, canonical frames "
                      f"differ")
                failures += 1
            else:
                print(f"OK   {name}: {len(edf)} rows ({mode})")
        except Exception as e:  # pragma: no cover - surfaced per query
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}")
            failures += 1
        finally:
            con.close()
    tail = f" ({excluded} excluded)" if excluded else ""
    print(("ALL OK" if failures == 0 else f"{failures} FAILURES") + tail)
    return 0 if failures == 0 else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
