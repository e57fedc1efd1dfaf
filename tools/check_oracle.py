#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Loads each SparkEntry query result (written by graft.Verify) and the oracle
SQL (oracle_sql.json), runs the oracle in DuckDB over the same parquet
tables, sorts columns by name and rows by all columns, and compares values
exactly. Usage: check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return bool(v)
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
        try:
            sp_rows = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
            sp_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            du_rows = con.execute(oracle[name]).fetchall()
            du_cols = [d[0] for d in con.description]
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
