#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify,
then hash-compare each result parquet against DuckDB running the same
oracle SQL over the fixture tables. Dev tooling only — the shipped Scala
library has no Python dependency.

Usage: python3 tools/check.py [sfDir] [outDir] [--skip-verify]
"""
import json, sys, glob, os, subprocess

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_verify():
    r = subprocess.run(
        ["sbt", f'runMain graft.Verify {SF} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True, timeout=1200)
    tail = "\n".join((r.stdout + r.stderr).splitlines()[-25:])
    if r.returncode != 0:
        print(tail)
        sys.exit("verify failed")
    for line in (r.stdout + r.stderr).splitlines():
        if "[verify]" in line:
            print(line)


def norm(df):
    import pandas as pd
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    import duckdb, pandas as pd
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{OUT}/{name}/*.parquet")
        if not files:
            print(f"MISSING RESULT  {name}")
            fail += 1
            continue
        try:
            exp = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"ORACLE ERROR    {name}: {e}")
            fail += 1
            continue
        got = norm(con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf())
        if list(exp.columns) != list(got.columns):
            print(f"SCHEMA MISMATCH {name}: oracle={list(exp.columns)} got={list(got.columns)}")
            fail += 1
            continue
        if len(exp) != len(got):
            print(f"ROWS MISMATCH   {name}: oracle={len(exp)} got={len(got)}")
            fail += 1
            continue
        # exact value compare (dtype-insensitive via astype(str) fallback)
        try:
            same = exp.equals(got)
            if not same:
                same = exp.astype(str).equals(got.astype(str))
        except Exception:
            same = exp.astype(str).equals(got.astype(str))
        if same:
            ok += 1
            print(f"OK              {name} ({len(exp)} rows)")
        else:
            fail += 1
            diff = (exp.astype(str) != got.astype(str))
            bad = diff.any(axis=1)
            print(f"VALUE MISMATCH  {name}: first diffs:")
            print("  oracle:", exp[bad].head(3).to_dict("records"))
            print("  got:   ", got[bad].head(3).to_dict("records"))
    print(f"\n{ok} ok, {fail} failed of {ok + fail}")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    if "--skip-verify" not in sys.argv:
        run_verify()
    main()
