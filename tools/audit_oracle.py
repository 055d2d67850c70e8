#!/usr/bin/env python3
"""Adversarial audit of the correctness gate's SENSITIVITY (round-8
VERDICT task #7): for sampled gates, perturb the Spark result — drop a
row, mutate one cell per column — and assert the driver-replica compare
(tools/check_oracle.py's canon + dtype-strict frame equality, the same
shape as the driver's hash) CATCHES every perturbation. Guards against
a future gate whose checksum accidentally ignores a column (e.g. an
unsorted free-text column that the canon ordering makes compare-inert).

Usage: python3 tools/audit_oracle.py <sfDir> <verifyOutDir> [nGates] [seed]

Exit 0 = every perturbation on every sampled gate was caught.
"""
import glob
import json
import os
import random
import sys

import duckdb
import pandas as pd
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_oracle import canon  # the driver-replica canonicalization


def frames_equal(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    """The check_oracle.py PASS condition, boolean-ized."""
    a, b = canon(a), canon(b)
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=True,
                                      check_exact=True)
        return True
    except AssertionError:
        return False


def perturb_value(v):
    """Return a same-type-ish value different from v, or None if this
    cell type can't be perturbed generically (caller skips)."""
    import numpy as np
    import datetime
    if v is None:
        return None
    if isinstance(v, (bool, np.bool_)):
        return not bool(v)
    if isinstance(v, (int, np.integer)):
        return v + 1
    if isinstance(v, (float, np.floating)):
        return v + 1.0 if v == v else 0.0  # NaN -> 0.0
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return v + pd.Timedelta(seconds=1)
    if isinstance(v, (datetime.date,)):
        return v + datetime.timedelta(days=1)
    if isinstance(v, str):
        return v + "x"  # append 'x'
    if isinstance(v, bytes):
        return v + b"x"
    if isinstance(v, np.ndarray):
        if len(v) == 0:
            return None  # can't synthesize a typed element generically
        w = v.copy()
        inner = perturb_value(w[0])
        if inner is None:
            return None
        w[0] = inner
        return w
    if isinstance(v, dict):  # struct column
        w = dict(v)
        for k in w:
            inner = perturb_value(w[k])
            if inner is not None:
                w[k] = inner
                return w
        return None
    return None


def audit_gate(con, name: str, sql: str, res_dir: str):
    """Yields (perturbation, caught) tuples for one gate."""
    files = glob.glob(f"{res_dir}/*.parquet")
    spark_df = pq.read_table(files[0] if files else res_dir).to_pandas()
    duck_df = con.execute(sql).df()
    if not frames_equal(spark_df, duck_df):
        yield ("baseline", False)  # gate is ALREADY failing — report loud
        return
    if len(spark_df) == 0:
        yield ("empty-result (nothing to perturb)", True)
        return
    # 1. drop a row
    dropped = spark_df.iloc[1:].reset_index(drop=True)
    yield ("drop-row", not frames_equal(dropped, duck_df))
    # 2. mutate one non-null cell in EVERY column (column sensitivity)
    for c in spark_df.columns:
        col = spark_df[c]
        idx = None
        for i in range(len(col)):
            if col.iloc[i] is not None and not (
                    isinstance(col.iloc[i], float) and
                    col.iloc[i] != col.iloc[i]):
                idx = i
                break
        if idx is None:
            yield (f"mutate[{c}] (all-null column, skipped)", True)
            continue
        new_v = perturb_value(col.iloc[idx])
        if new_v is None:
            yield (f"mutate[{c}] (unperturbable type "
                   f"{type(col.iloc[idx]).__name__}, skipped)", True)
            continue
        mutated = spark_df.copy(deep=True)
        # object columns keep arbitrary values; for typed columns the
        # perturbed value is same-type by construction above
        mutated.at[idx, c] = new_v
        yield (f"mutate[{c}]", not frames_equal(mutated, duck_df))


def main(sf_dir, out_dir, n_gates=20, seed=9, only=None):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        tname = os.path.basename(p)[: -len(".parquet")]
        con.execute(
            f"CREATE VIEW {tname} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    rng = random.Random(seed)
    # Permanently audited set (VERDICT r11 #6): the serving/maintenance
    # composition gates ride EVERY audit run on top of the rotating
    # random sample (store-level maintenance perturbations — drop a
    # delta segment, skip a tombstone, off-by-one a seq — are drilled
    # Scala-side in MaintPerturbSpec, which proves the SERVE changes;
    # this file proves the compare catches a changed result frame).
    PINNED = ("q291", "q292", "q293", "q294", "q70")
    if only:  # pin specific gates by name prefix (comma list)
        prefixes = [p.strip() for p in only.split(",") if p.strip()]
        sample = sorted(n for n in oracles
                        if any(n.startswith(p) for p in prefixes))
    else:
        pinned = [n for n in oracles
                  if any(n.startswith(p) for p in PINNED)]
        sample = sorted(set(
            rng.sample(sorted(oracles), min(n_gates, len(oracles))))
            | set(pinned))
    n_checks = n_missed = 0
    for name in sample:
        gate_missed = 0
        for what, caught in audit_gate(con, name, oracles[name],
                                       f"{out_dir}/{name}"):
            n_checks += 1
            if not caught:
                n_missed += 1
                gate_missed += 1
                print(f"MISSED {name}: {what} NOT caught by the compare")
            elif "skipped" in what or what.startswith("empty"):
                print(f"note   {name}: {what}")
        print(f"{'BAD   ' if gate_missed else 'ok    '} {name}"
              + (f" ({gate_missed} missed)" if gate_missed else ""))
    print(f"== {len(sample)} gates, {n_checks} perturbations, "
          f"{n_missed} missed ==")
    sys.exit(1 if n_missed else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 20,
         int(sys.argv[4]) if len(sys.argv) > 4 else 9,
         sys.argv[5] if len(sys.argv) > 5 else None)
