#!/usr/bin/env python3
"""Determinism compare: two Verify dump dirs must be content-identical.

For every query dir present in both dumps, runs duckdb EXCEPT ALL in
both directions over the parquet results (order- and file-layout-
independent). Exits nonzero on any difference or missing query.
"""
import sys, os
import duckdb

def main(a, b):
    qa = {d for d in os.listdir(a) if os.path.isdir(os.path.join(a, d))}
    qb = {d for d in os.listdir(b) if os.path.isdir(os.path.join(b, d))}
    if qa != qb:
        print(f"query sets differ: only-a={sorted(qa-qb)} only-b={sorted(qb-qa)}")
        return 1
    con = duckdb.connect()
    bad = 0
    for q in sorted(qa):
        pa = os.path.join(a, q, "*.parquet")
        pb = os.path.join(b, q, "*.parquet")
        try:
            d1 = con.execute(
                f"SELECT COUNT(*) FROM (SELECT * FROM read_parquet('{pa}') "
                f"EXCEPT ALL SELECT * FROM read_parquet('{pb}'))").fetchone()[0]
            d2 = con.execute(
                f"SELECT COUNT(*) FROM (SELECT * FROM read_parquet('{pb}') "
                f"EXCEPT ALL SELECT * FROM read_parquet('{pa}'))").fetchone()[0]
        except Exception as e:
            print(f"✗ {q}: {e}")
            bad += 1
            continue
        if d1 or d2:
            print(f"✗ {q}: {d1} rows only in a, {d2} only in b")
            bad += 1
        else:
            print(f"✓ {q}")
    print(f"== {len(qa) - bad} identical, {bad} differ")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
