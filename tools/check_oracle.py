#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate (pandas channel).

Usage: check_oracle.py <sf_dir> <verify_out_dir> [only_names...]

Reads <verify_out_dir>/oracle_sql.json, runs each SQL in DuckDB with the
parquet fixture tables registered as views, loads the Spark-written parquet
result, and compares THE WAY THE DRIVER DOES:

  - oracle loaded via duckdb `.df()` (pandas) — NOT fetchall. This narrows
    DECIMAL/HUGEINT/UBIGINT to float64 and DATE to midnight Timestamps,
    exactly like the driver sees them;
  - Spark side loaded via pyarrow `.to_pandas()` — DECIMAL arrives as
    decimal.Decimal objects, DATE as datetime.date, BINARY as bytes,
    LIST as numpy ndarrays;
  - cells that the driver's all-column sort_values cannot sort or hash
    (bytes / bytearray / ndarray / list / dict) are a structural FAIL —
    the driver records `err` for these, so we must too;
  - numeric cells compare with their TYPE CATEGORY attached (int vs float
    vs Decimal), because the driver hashes `1` ≠ `1.0` ≠ `Decimal('1')`.

Round-10 lesson: the old fetchall-based checker was MORE FORGIVING than
the driver and passed four gates the driver rejected (BLOB bytearray,
ndarray list cells, Decimal-vs-float64, BIT raw bytes). This version
fails all four pre-fix shapes.
"""
import datetime
import json
import math
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

UNSORTABLE = (bytes, bytearray, np.ndarray, list, dict, set, tuple)


def norm_cell(v):
    """Driver-faithful canonical form: distinct numeric categories stay
    distinct (they hash differently in the driver); datelikes collapse to
    a midnight-padded ISO form (DuckDB DATE -> Timestamp 00:00 vs Spark
    DATE -> datetime.date ARE driver-equal — DATE gates are green)."""
    if v is None:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NaN"           # float-channel NULL and true NaN coincide
    if isinstance(v, np.floating):
        return "f:" + repr(float(v))
    if isinstance(v, float):
        return "f:" + repr(v)
    if isinstance(v, (bool, np.bool_)):
        return "b:" + str(bool(v))
    if isinstance(v, (int, np.integer)):
        return "i:" + str(int(v))
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        if v != v:             # NaT
            return "NULL"
        return "t:" + pd.Timestamp(v).isoformat()
    if isinstance(v, datetime.date):
        return "t:" + pd.Timestamp(v).isoformat()
    if isinstance(v, datetime.timedelta):
        return "iv:" + str(pd.Timedelta(v))
    import decimal
    if isinstance(v, decimal.Decimal):
        return "dec:" + str(v)
    if v is pd.NaT:
        return "NULL"
    return "s:" + str(v)


def frame_rows(df):
    """Canonical (sorted-columns, sorted-rows) cell matrix, or an error
    string when any cell would break the driver's sort_values."""
    cols = sorted(df.columns)
    # Per-column extraction: iterrows() upcasts every cell to the frame's
    # common dtype (int64 -> float in an all-numeric frame), which both
    # fakes FAILs and masks the int-vs-float driver distinction. tolist()
    # on each Series preserves its own dtype.
    col_vals = {}
    for c in cols:
        vals = df[c].tolist()
        for v in vals:
            if isinstance(v, UNSORTABLE):
                return None, None, (f"driver-channel unsortable cell in "
                                    f"'{c}': {type(v).__name__}")
        col_vals[c] = [norm_cell(v) for v in vals]
    rows = [tuple(col_vals[c][i] for c in cols) for i in range(len(df))]
    return cols, sorted(rows), None


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            odf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:200]}")
            n_fail += 1
            continue
        try:
            sdf = ds.dataset(f"{out_dir}/{name}",
                             format="parquet").to_table().to_pandas()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {str(e)[:200]}")
            n_fail += 1
            continue
        oc, orw, oerr = frame_rows(odf)
        sc, srw, serr = frame_rows(sdf)
        if oerr or serr:
            print(f"FAIL {name}: {oerr or ''}{' | ' if oerr and serr else ''}"
                  f"{serr or ''}")
            n_fail += 1
        elif oc != sc:
            print(f"FAIL {name}: schema mismatch duckdb={oc} spark={sc}")
            n_fail += 1
        elif len(orw) != len(srw):
            print(f"FAIL {name}: rowcount duckdb={len(orw)} spark={len(srw)}")
            n_fail += 1
        elif orw != srw:
            diffs = [i for i, (a, b) in enumerate(zip(orw, srw)) if a != b]
            i = diffs[0]
            da = [(c, a, b) for c, a, b in zip(oc, orw[i], srw[i]) if a != b]
            print(f"FAIL {name}: {len(diffs)} differing rows; first at {i}:")
            for c, a, b in da[:6]:
                print(f"  {c}: duckdb={a} spark={b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srw)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {len(oracle)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:]) or None))
