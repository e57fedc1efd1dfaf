#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Loads each SparkEntry query result (written by graft.Verify) and the oracle
SQL (oracle_sql.json), runs the oracle in DuckDB over the same parquet
tables, sorts columns by name and rows by all columns, and compares values
exactly. Usage: check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, math
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if v is None:
        return None
    # pandas missing markers that are NOT float nan (pd.NA from nullable
    # dtypes, NaT from datetime columns) are SQL NULLs -> normalize to None.
    # Float-column NULL vs NaN is conflated to NaN by the pandas bridge on
    # BOTH sides identically (DuckDB .df() hands back a plain float64 array)
    # -- same conflation the driver's own pandas bridge applies, so the
    # comparison stays driver-faithful.
    if v is getattr(pd, "NA", None) or v is pd.NaT:
        return None
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, (bool, np.bool_)):
        return bool(v)
    if isinstance(v, (float, np.floating)):
        v = float(v)
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, np.integer):
        return int(v)
    return v

def frame(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        # Fetch through pandas (.df()), NOT fetchall(): the driver goes
        # through pandas, where DuckDB HUGEINT (e.g. sum(INT)) lands as
        # float64 and hashes as "357.0" vs Spark's "357". fetchall() returns
        # Python ints and silently hides that class of mismatch (the r7
        # q129 hash_match:false escaped exactly this way).
        try:
            sp_df = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            sp_cols = list(sp_df.columns)
            sp_rows = [tuple(r) for r in sp_df.itertuples(index=False)]
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            du_df = con.execute(oracle[name]).df()
            du_cols = list(du_df.columns)
            du_rows = [tuple(r) for r in du_df.itertuples(index=False)]
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        sc, sr = frame(sp_rows, sp_cols)
        dc, dr = frame(du_rows, du_cols)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
            n_fail += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rowcount spark={len(sr)} duck={len(dr)}")
            sset, dset = set(sr), set(dr)
            for r in list(sset - dset)[:3]:
                print(f"  spark-only: {r}")
            for r in list(dset - sset)[:3]:
                print(f"  duck-only:  {r}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(sr, dr) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(sr)} rows differ; first 3:")
            for a, b in bad[:3]:
                print(f"  spark: {a}\n  duck:  {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

main()
