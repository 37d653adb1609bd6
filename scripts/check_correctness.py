#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate: run Verify output
against the DuckDB oracle and compare (rows / schema / values).

Usage: python3 scripts/check_correctness.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 and fold float noise at 1e-9
        return round(v + 0.0, 9)
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle_sql = json.load(open(f"{out_dir}/oracle_sql.json"))
    import os
    results = {}
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if not os.path.isdir(p):
            continue
        try:
            got = con.sql(f"SELECT * FROM '{p}/*.parquet'")
            got_cols = sorted(got.columns)
            got_rows = sorted(
                sorted(tuple(norm(v) for v in r)
                       for r in con.sql(
                           f"SELECT {', '.join(got_cols)} FROM '{p}/*.parquet'").fetchall()))
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL: {e}"
            continue
        if name not in oracle_sql:
            results[name] = f"rows-only: {len(got_rows)} rows" + \
                (" [EMPTY!]" if not got_rows else "")
            continue
        try:
            oracle = con.sql(oracle_sql[name])
            o_cols = sorted(oracle.columns)
            o_rows = sorted(
                sorted(tuple(norm(v) for v in r)
                       for r in con.sql(
                           f"SELECT {', '.join(o_cols)} FROM ({oracle_sql[name]})").fetchall()))
        except Exception as e:
            results[name] = f"ORACLE-FAIL: {e}"
            continue
        if got_cols != o_cols:
            results[name] = f"SCHEMA-MISMATCH: spark={got_cols} oracle={o_cols}"
        elif len(got_rows) != len(o_rows):
            results[name] = f"ROWCOUNT-MISMATCH: spark={len(got_rows)} oracle={len(o_rows)}"
        elif got_rows != o_rows:
            ndiff = sum(1 for a, b in zip(got_rows, o_rows) if a != b)
            ex = next((a, b) for a, b in zip(got_rows, o_rows) if a != b)
            results[name] = f"VALUE-MISMATCH: {ndiff}/{len(got_rows)} rows differ; first: spark={ex[0]} oracle={ex[1]}"
        else:
            results[name] = f"OK ({len(got_rows)} rows)"
    npass = sum(1 for v in results.values() if v.startswith("OK") or v.startswith("rows-only"))
    for k, v in sorted(results.items()):
        flag = "  " if v.startswith("OK") or v.startswith("rows-only") else "XX"
        print(f"{flag} {k}: {v}")
    print(f"\n{npass}/{len(results)} pass")
    return 0 if npass == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
