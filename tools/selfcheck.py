#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/selfcheck.py <verify_out_dir> <sf_dir>

Loads each <name>/ parquet result written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the fixture parquet tables,
sorts columns by name and rows by all columns, and compares cell-by-cell
(exact; this is stricter-or-equal to the driver's hash compare).
"""
import json, sys, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver hashes values; emulate exact repr
        return repr(v)
    return repr(v)

def load_sorted(con, rel_sql):
    df = con.sql(rel_sql).fetchdf()
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(norm(v) for v in row) for row in df.itertuples(index=False)]
    return cols, sorted(rows)

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        try:
            gcols, got = load_sorted(con, f"SELECT * FROM read_parquet('{d}*.parquet')")
        except Exception as e:
            results[name] = f"READ-FAIL {e}"
            continue
        if name not in oracle:
            results[name] = f"rows-only ({len(got)} rows)" if got else "EMPTY (rows-only FAIL)"
            continue
        try:
            ocols, want = load_sorted(con, oracle[name])
        except Exception as e:
            results[name] = f"ORACLE-SQL-FAIL {e}"
            continue
        if gcols != ocols:
            results[name] = f"SCHEMA-MISMATCH got={gcols} want={ocols}"
        elif len(got) != len(want):
            results[name] = f"ROWCOUNT-MISMATCH got={len(got)} want={len(want)}"
        elif got != want:
            bad = next(i for i, (g, w) in enumerate(zip(got, want)) if g != w)
            results[name] = f"VALUE-MISMATCH first at row {bad}: got={got[bad]} want={want[bad]}"
        else:
            results[name] = f"OK ({len(got)} rows)"
    width = max(len(k) for k in results) if results else 0
    nfail = 0
    for k in sorted(results):
        ok = results[k].startswith("OK") or results[k].startswith("rows-only")
        if not ok:
            nfail += 1
        print(f"{'PASS' if ok else 'FAIL'}  {k.ljust(width)}  {results[k]}")
    print(f"\n{len(results) - nfail}/{len(results)} pass")
    sys.exit(1 if nfail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
