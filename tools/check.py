#!/usr/bin/env python3
"""Dev-only parity checker mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json, registers each <sfDir>/*.parquet as a
DuckDB view, runs each oracle SQL, and compares (sorted rows, columns sorted
by name) against the Spark result parquet at <verifyOutDir>/<name>/.
NOT part of the library — local feedback loop only.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def canon(df):
    # columns sorted by name, rows sorted by all columns, values stringified
    # with pandas CSV formatting: this reproduces the driver's observed
    # behavior — an all-midnight datetime64 column prints as bare dates
    # (so DATE vs TIMESTAMP skew is forgiven) while Decimal('1.50') vs
    # float 1.5 differ (so a decimal output column is a real hazard).
    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in cols:
        txt = df[c].to_frame().to_csv(index=False, header=False).split("\n")
        df[c] = pd.Series(txt[: len(df)], index=df.index, dtype="object")
    return df.sort_values(by=cols).reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failed = []
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output dir"); failed.append(name); continue
        try:
            ora = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); failed.append(name); continue
        # pyarrow read (NOT duckdb): mirrors the driver — spark decimal columns
        # arrive as Python Decimal objects while the duckdb oracle .df() gives
        # float64, so a decimal output column is a compare hazard by itself.
        got = pd.read_parquet(spark_path)
        dt_g = {c: str(t) for c, t in got.dtypes.items()}
        dt_o = {c: str(t) for c, t in ora.dtypes.items()}
        if dt_g != dt_o:
            print(f"WARN {name}: dtype skew spark={dt_g} oracle={dt_o}")
        a, b = canon(got), canon(ora)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns spark={list(a.columns)} oracle={list(b.columns)}")
            failed.append(name); continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} oracle={len(b)}")
            failed.append(name); continue
        if not a.equals(b):
            diff = (a != b).any(axis=1)
            print(f"FAIL {name}: {int(diff.sum())}/{len(a)} rows differ; first diffs:")
            print(a[diff].head(3).to_string())
            print(b[diff].head(3).to_string())
            failed.append(name); continue
        print(f"PASS {name} ({len(a)} rows)")
    if failed:
        print(f"\n{len(failed)} FAILED: {failed}"); sys.exit(1)
    print("\nall queries match")

if __name__ == "__main__":
    main()
