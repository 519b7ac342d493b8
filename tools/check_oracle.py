#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB over
the parquet tables in <sfDir>, load the Spark result parquet, sort columns by
name, canonicalize values, and compare row-by-row.  Queries without oracle SQL
get a rows-only check (>0 rows).
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 12 significant digits: engines agree after explicit ROUND()s; 6
        # digits would mask real differences in large (~1e8+) aggregates
        return f"{v:.12g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rows_of(table):
    cols = sorted(table.column_names)
    data = [table.column(c).to_pylist() for c in cols]
    return cols, [tuple(canon(col[i]) for col in data) for i in range(table.num_rows)]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import os
    names = sorted(d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}"))
    n_pass = n_fail = 0
    # round-13 review: a query that failed in Verify leaves NO dump (the
    # stale-output guard deletes first) — without the manifest check that
    # just shrinks the pass count silently.
    manifest_path = f"{out_dir}/queries.json"
    if os.path.exists(manifest_path):
        expected = set(json.load(open(manifest_path)))
        for miss in sorted(expected - set(names)):
            print(f"FAIL {miss}: no dump written (query failed in Verify)")
            n_fail += 1
    for name in names:
        spark_tbl = ds.dataset(f"{out_dir}/{name}").to_table()
        if name not in oracle:
            ok = spark_tbl.num_rows > 0
            print(f"{'PASS' if ok else 'FAIL'} {name} (rows-only: {spark_tbl.num_rows})")
            n_pass += ok
            n_fail += not ok
            continue
        try:
            duck_tbl = con.execute(oracle[name]).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        scols, srows = rows_of(spark_tbl)
        dcols, drows = rows_of(duck_tbl)
        if scols != dcols:
            print(f"FAIL {name}: columns differ spark={scols} duck={dcols}")
            n_fail += 1
            continue
        if srows == drows:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows differ (spark={len(srows)}, duck={len(drows)})")
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b][:3]
            for i, a, b in diffs:
                print(f"   row {i}: spark={a}\n          duck ={b}")
            if len(srows) != len(drows):
                only_s = set(srows) - set(drows)
                only_d = set(drows) - set(srows)
                for r in list(only_s)[:2]:
                    print(f"   only-spark: {r}")
                for r in list(only_d)[:2]:
                    print(f"   only-duck : {r}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
