#!/usr/bin/env python3
"""Differential-fuzz checker: replay FuzzDump's script + queries in DuckDB
and diff each engine-"ok" result against DuckDB's as a sorted multiset.

Usage: python3 tools/check_fuzz.py <outDir>   (after graft.sql.FuzzDump)

Exit 0 iff zero mismatches AND zero engine crashes. Engine rejections are
reported as coverage data (the generator aims for near-zero).
"""
import datetime
import json
import sys

import duckdb


def norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, int):
        return int(v)
    if isinstance(v, (datetime.date, datetime.datetime)):
        return str(v)[:10]
    if isinstance(v, float):
        # the generator emits no floating point; ints can surface as
        # floats only through a comparison bug — make it visible
        return ("FLOAT", v)
    return str(v)


def key(row):
    return tuple((x is None, str(x)) for x in row)


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fuzz_out"
    con = duckdb.connect()
    with open(f"{out}/script.sql") as f:
        for stmt in f.read().split(";\n"):
            if stmt.strip():
                con.execute(stmt)
    with open(f"{out}/fuzz.json") as f:
        entries = json.load(f)

    n_ok = n_mismatch = n_reject = n_crash = n_duck_err = 0
    failures = []
    for e in entries:
        if e["status"] == "reject":
            n_reject += 1
            continue
        if e["status"] == "crash":
            n_crash += 1
            failures.append(("CRASH", e["name"], e["sql"], e.get("error", "")))
            continue
        try:
            duck = [tuple(norm(v) for v in row)
                    for row in con.execute(e["sql"]).fetchall()]
        except Exception as ex:
            n_duck_err += 1
            failures.append(("DUCK-ERR", e["name"], e["sql"], str(ex)[:300]))
            continue
        mine = [tuple(norm(v) for v in row) for row in e["rows"]]
        if sorted(duck, key=key) == sorted(mine, key=key):
            n_ok += 1
        else:
            n_mismatch += 1
            only_d = [r for r in duck if r not in mine][:3]
            only_m = [r for r in mine if r not in duck][:3]
            failures.append(("MISMATCH", e["name"], e["sql"],
                             f"rows duck={len(duck)} engine={len(mine)} "
                             f"duck-only={only_d} engine-only={only_m}"))

    for kind, name, sql, detail in failures:
        print(f"{kind} {name}: {sql}\n    {detail}")
    total = len(entries)
    print(f"{n_ok} match / {n_mismatch} mismatch / {n_duck_err} duckdb-error / "
          f"{n_crash} crash / {n_reject} reject / {total} total")
    sys.exit(0 if n_mismatch == 0 and n_crash == 0 and n_duck_err == 0 else 1)


if __name__ == "__main__":
    main()
