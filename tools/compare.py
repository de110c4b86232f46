#!/usr/bin/env python3
"""Dev-only oracle compare (mimics the driver's t2 gate).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark parquet result,
run the matching oracle SQL from oracle_sql.json in DuckDB (tables
registered as views over <sfDir>/*.parquet), sort columns by name,
and compare values exactly. NOT part of the Scala library.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    queries = [d for d in sorted(os.listdir(out_dir))
               if os.path.isdir(os.path.join(out_dir, d))]
    n_pass = n_fail = n_noora = 0
    for q in queries:
        files = glob.glob(os.path.join(out_dir, q, "*.parquet"))
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True) \
              if files else pd.DataFrame()
        if q not in oracles:
            print(f"  [rows-only] {q}: {len(got)} rows " +
                  ("OK" if len(got) > 0 else "EMPTY!"))
            n_noora += 1
            continue
        try:
            exp = con.execute(oracles[q]).fetchdf()
        except Exception as e:
            print(f"  [FAIL-ora] {q}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"  [FAIL] {q}: columns {list(g.columns)} != {list(e.columns)}")
            n_fail += 1
            continue
        # The driver hashes typed values: an int64 Spark column vs a
        # float64 oracle column (e.g. an uncast DuckDB SUM -> HUGEINT)
        # hash-mismatches even when the numbers are equal. Catch the
        # kind difference here instead of letting check_dtype=False
        # paper over it.
        kind_bad = [c for c in g.columns
                    if g[c].dtype.kind != e[c].dtype.kind
                    and {g[c].dtype.kind, e[c].dtype.kind} <= {"i", "u", "f"}
                    and "f" in {g[c].dtype.kind, e[c].dtype.kind}]
        if kind_bad:
            print(f"  [FAIL] {q}: dtype kind mismatch (int vs float) in "
                  f"{[(c, str(g[c].dtype), str(e[c].dtype)) for c in kind_bad]}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"  [FAIL] {q}: rows {len(g)} != {len(e)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                          check_exact=True)
            print(f"  [PASS] {q}: {len(g)} rows")
            n_pass += 1
        except AssertionError as ex:
            print(f"  [FAIL] {q}: value mismatch\n{str(ex)[:800]}")
            # show first differing rows
            neq = (g != e) & ~(g.isna() & e.isna())
            rows = neq.any(axis=1)
            print("   spark:", g[rows].head(3).to_dict("records"))
            print("   duck :", e[rows].head(3).to_dict("records"))
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_noora} rows-only ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
