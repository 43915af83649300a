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

# The driver loads the oracle result via pandas (`.df()`), which narrows
# DuckDB's widened integer types (HUGEINT from sum(int), UBIGINT, ...) to
# float64 — so an uncast aggregate hashes as "1.0" against Spark's "1"
# even though fetchall() (used below for values) keeps exact ints. Guard
# the channel structurally: the numeric CATEGORY (int vs float) of every
# oracle column must match Spark's parquet schema. This is exactly the
# bug that kept q_sessionize red for rounds 1-4 (uncast windowed sum as
# a group key).
DUCK_FLOATY = {"FLOAT", "DOUBLE", "HUGEINT", "UHUGEINT", "UBIGINT"}
DUCK_INTY = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"}

def num_category(type_name):
    t = type_name.upper()
    if t in DUCK_FLOATY:
        return "float"
    if t in DUCK_INTY:
        return "int"
    if t.startswith("DECIMAL"):
        return "float"   # pandas narrows DECIMAL to float64 too
    return None

def arrow_category(arrow_type):
    import pyarrow as pa
    if pa.types.is_integer(arrow_type):
        return "int"
    if pa.types.is_floating(arrow_type) or pa.types.is_decimal(arrow_type):
        return "float"
    return None

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            otypes = {r[0]: r[1]
                      for r in con.execute(f"DESCRIBE {sql}").fetchall()}
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
        cat_bad = []
        for f in tbl.schema:
            if f.name in otypes:
                a, b = arrow_category(f.type), num_category(otypes[f.name])
                if a is not None and b is not None and a != b:
                    cat_bad.append(f"{f.name}: spark={f.type} duckdb={otypes[f.name]}")
        if cat_bad:
            print(f"FAIL {name}: numeric-category mismatch (driver hashes "
                  f"int vs float differently): {'; '.join(cat_bad)}")
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
