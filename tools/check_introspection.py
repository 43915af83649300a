#!/usr/bin/env python3
"""Cross-engine check for the catalog-introspection surface.

Usage: check_introspection.py <ddl.sql> <engine_dump_dir>

Replays tools/introspection_ddl.sql into an in-memory DuckDB, runs the
DuckDB-side equivalents of graft.sql.IntrospectDump's probes, and diffs
the rows against the engine's TSV dumps. The duckdb_* /
information_schema relations are driver-side VALUES trees in the engine
(no per-query oracle can see them), so this harness is their gate.

DuckDB-side deltas handled here, NOT by loosening the compare:
  - duckdb_schemas()/information_schema carry DuckDB's system schemas
    (information_schema, pg_catalog) and system/temp databases — filter
    to the connection's own database and non-system schemas;
  - DuckDB's duckdb_columns()/information_schema.columns include VIEW
    columns; the engine's list base-table columns only — filter the
    DuckDB side to tables (a known, documented divergence);
  - python bools render True/False — normalized to true/false.
"""
import sys

import duckdb

USER = ("WHERE database_name = current_database() "
        "AND schema_name NOT IN ('information_schema', 'pg_catalog')")
TBL = ("table_schema || '.' || table_name IN "
       "(SELECT schema_name || '.' || table_name FROM duckdb_tables())")

QUERIES = {
    "schemas": f"SELECT schema_name FROM duckdb_schemas() {USER} "
               "ORDER BY schema_name",
    "tables": "SELECT schema_name, table_name, column_count "
              "FROM duckdb_tables() ORDER BY schema_name, table_name",
    "views": "SELECT schema_name, view_name FROM duckdb_views() "
             "WHERE NOT internal ORDER BY schema_name, view_name",
    "columns": "SELECT schema_name, table_name, column_name, column_index,"
               " data_type, is_nullable FROM duckdb_columns() "
               "WHERE schema_name || '.' || table_name IN "
               "(SELECT schema_name || '.' || table_name FROM duckdb_tables()) "
               "ORDER BY schema_name, table_name, column_index",
    "is_tables": "SELECT table_schema, table_name, table_type "
                 "FROM information_schema.tables "
                 "ORDER BY table_schema, table_name, table_type",
    "is_columns": "SELECT table_schema, table_name, column_name, "
                  "ordinal_position, data_type, is_nullable "
                  f"FROM information_schema.columns WHERE {TBL} "
                  "ORDER BY table_schema, table_name, ordinal_position",
}


def norm(v):
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def main(ddl_path, dump_dir):
    con = duckdb.connect()
    for line in open(ddl_path):
        stmt = line.strip()
        if stmt and not stmt.startswith("--"):
            con.execute(stmt)
    n_pass = n_fail = 0
    for name, sql in QUERIES.items():
        want = [tuple(norm(c) for c in row)
                for row in con.execute(sql).fetchall()]
        try:
            got = [tuple(line.split("\t"))
                   for line in open(f"{dump_dir}/{name}.tsv")
                   .read().splitlines() if line]
        except OSError as e:
            print(f"FAIL {name}: missing engine dump: {e}")
            n_fail += 1
            continue
        if got == want:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: engine={len(got)} rows duckdb={len(want)}")
            for g in [r for r in got if r not in want][:4]:
                print(f"  engine-only: {g}")
            for w in [r for r in want if r not in got][:4]:
                print(f"  duckdb-only: {w}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {len(QUERIES)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
