#!/usr/bin/env python3
"""Dev-side replica of the driver's t2 correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`: loads each
<outDir>/<name> parquet (Spark result), runs the matching oracle SQL from
<outDir>/oracle_sql.json in DuckDB over the same source tables, and compares
schemas + values (columns sorted by name, rows sorted by all columns).

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    # normalize dtypes for compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    return df.reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    err_path = f"{out_dir}/_errors.json"
    if os.path.exists(err_path):
        for name, msg in sorted(json.load(open(err_path)).items()):
            print(f"FAIL {name}: Spark-side exception: {msg[:300]}")
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        res_dir = f"{out_dir}/{name}"
        try:
            spark_df = pq.read_table(glob.glob(f"{res_dir}/*.parquet")[0] if glob.glob(f"{res_dir}/*.parquet") else res_dir).to_pandas()
            duck_df = con.execute(sql).df()
            a, b = canon(spark_df), canon(duck_df)
            if list(a.columns) != list(b.columns):
                print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
                n_fail += 1
            elif len(a) != len(b):
                print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
                n_fail += 1
            else:
                try:
                    # dtype-strict: the driver's gate hashes dtype-sensitively,
                    # so the replica must never pass what the gate fails.
                    pd.testing.assert_frame_equal(a, b, check_dtype=True, check_exact=True)
                    print(f"PASS {name} ({len(a)} rows)")
                    n_pass += 1
                except AssertionError as e:
                    print(f"FAIL {name}: value mismatch\n  {str(e)[:500]}")
                    n_fail += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
