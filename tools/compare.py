#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle SQL and diff per query. Dev tooling only — the
engine itself is pure Scala/Spark.

Usage: python3 tools/compare.py <verify_out_dir> <sf_dir> [query ...]
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def compare(name, out_dir, sf_dir, con):
    sql = ORACLE[name]
    try:
        want = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        return f"ORACLE ERROR: {e}"
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
        ).fetch_arrow_table()
    except Exception as e:
        return f"RESULT MISSING: {e}"

    w_cols = sorted(want.column_names)
    g_cols = sorted(got.column_names)
    if w_cols != g_cols:
        return f"SCHEMA MISMATCH: oracle {w_cols} vs got {g_cols}"
    if want.num_rows != got.num_rows:
        return f"ROWCOUNT MISMATCH: oracle {want.num_rows} vs got {got.num_rows}"

    wd = {c: want.column(c).to_pylist() for c in w_cols}
    gd = {c: got.column(c).to_pylist() for c in g_cols}
    w_rows = sorted(zip(*[map(norm_cell, wd[c]) for c in w_cols]),
                    key=lambda r: tuple(str(x) for x in r))
    g_rows = sorted(zip(*[map(norm_cell, gd[c]) for c in g_cols]),
                    key=lambda r: tuple(str(x) for x in r))
    n_exact = 0
    max_float_diff = 0.0
    for wr, gr in zip(w_rows, g_rows):
        if wr == gr:
            n_exact += 1
            continue
        for wv, gv in zip(wr, gr):
            if wv == gv:
                continue
            if isinstance(wv, float) and isinstance(gv, float):
                max_float_diff = max(max_float_diff, abs(wv - gv))
            else:
                return (f"VALUE MISMATCH: {wr} vs {gr}")
    if n_exact == len(w_rows):
        return f"OK exact ({want.num_rows} rows)"
    return (f"OK-ISH rows={want.num_rows} exact={n_exact} "
            f"max_float_diff={max_float_diff:.3e}")


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    global ORACLE
    with open(f"{out_dir}/oracle_sql.json") as f:
        ORACLE = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    failed = 0
    for name in sorted(ORACLE):
        if only and name not in only:
            continue
        res = compare(name, out_dir, sf_dir, con)
        status = "PASS" if res.startswith("OK") else "FAIL"
        if status == "FAIL":
            failed += 1
        print(f"{status} {name}: {res}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
