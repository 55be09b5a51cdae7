#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 scripts/localcheck.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the
parquet tables in <sfDir>, and compares: schema (column names), row count, and
a hash over values with columns sorted by name (rows compared in order AND as
a sorted multiset, so we catch both kinds of mismatch).
"""
import sys, os, json, glob
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df

def main(sf_dir, out_dir):
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    con = duckdb.connect()
    tables = ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    names = sorted([os.path.basename(d) for d in glob.glob(os.path.join(out_dir, "*"))
                    if os.path.isdir(d)])
    for name in names:
        try:
            got = pd.read_parquet(os.path.join(out_dir, name))
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}"); n_fail += 1; continue
        if name not in oracle:
            print(f"WARN {name}: no oracle sql (rows-only): rows={len(got)}")
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        g, e = canon(got), canon(exp)
        ok = True
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}"); ok = False
        elif len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}"); ok = False
        else:
            try:
                pd.testing.assert_frame_equal(g.reset_index(drop=True), e.reset_index(drop=True),
                                              check_dtype=False, check_exact=True)
            except AssertionError as ex:
                print(f"FAIL {name}: value mismatch (ordered): {str(ex)[:500]}")
                ok = False
        if ok:
            print(f"PASS {name}: rows={len(g)}")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed, {len(names)} total")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
