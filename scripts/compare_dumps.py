#!/usr/bin/env python3
"""Row-set compare of two Verify dumps — the determinism
re-verification discipline (run Verify at SPARK_GRAFT_CPUS=8 and =32,
then every query's row set must be byte-identical across the two
parallelism levels).

Usage: compare_dumps.py DUMP_A DUMP_B
"""
import os
import sys

import duckdb

a, b = sys.argv[1], sys.argv[2]
names = sorted(
    n for n in set(os.listdir(a)) & set(os.listdir(b))
    if os.path.isdir(os.path.join(a, n)))
bad = 0
for n in names:
    con = duckdb.connect()
    try:
        ra = con.execute(
            f"SELECT * FROM '{a}/{n}/*.parquet' ORDER BY ALL").fetchall()
        rb = con.execute(
            f"SELECT * FROM '{b}/{n}/*.parquet' ORDER BY ALL").fetchall()
    except Exception as e:  # noqa: BLE001 - report and keep comparing
        print(f"XX {n}: {e}")
        bad += 1
        continue
    if ra == rb:
        print(f"   {n}: OK ({len(ra)} rows)")
    else:
        print(f"XX {n}: MISMATCH ({len(ra)} vs {len(rb)} rows)")
        bad += 1
print(f"{len(names) - bad}/{len(names)} identical")
sys.exit(1 if bad else 0)
