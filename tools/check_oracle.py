#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate.

Usage: check_oracle.py <sf_dir> <verify_out_dir>

Reads <verify_out_dir>/oracle_sql.json, runs each SQL in DuckDB with the
parquet fixture tables registered as views, loads the Spark-written parquet
result, and compares: schema (column names), row count, and cell values
(columns sorted by name, rows sorted by all columns). Floats compared
exactly after the query-side rounding — mirroring a hash comparison.
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:200]}")
            n_fail += 1
            continue
        try:
            tbl = ds.dataset(f"{out_dir}/{name}", format="parquet").to_table()
            scols = tbl.column_names
            srows = [tuple(r[c] for c in scols) for r in tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {str(e)[:200]}")
            n_fail += 1
            continue
        oc, orw = canon(ocols, orows)
        sc, srw = canon(scols, srows)
        if oc != sc:
            print(f"FAIL {name}: schema mismatch duckdb={oc} spark={sc}")
            n_fail += 1
        elif len(orw) != len(srw):
            print(f"FAIL {name}: rowcount duckdb={len(orw)} spark={len(srw)}")
            n_fail += 1
        elif orw != srw:
            diffs = [i for i, (a, b) in enumerate(zip(orw, srw)) if a != b]
            i = diffs[0]
            print(f"FAIL {name}: {len(diffs)} differing rows; first at {i}:")
            print(f"  duckdb: {orw[i]}")
            print(f"  spark : {srw[i]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srw)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {len(oracle)} total")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
