#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracles over the same parquet tables.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True) if files else pd.DataFrame()
        if name not in oracles:
            print(f"  {name}: rows-only ({len(spark_df)} rows)")
            continue
        try:
            duck_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"✗ {name}: oracle SQL failed: {e}")
            n_bad += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        ok = list(a.columns) == list(b.columns) and len(a) == len(b)
        detail = ""
        if ok:
            for c in a.columns:
                x, y = a[c], b[c]
                try:
                    same = x.equals(y.astype(x.dtype))
                except Exception:
                    same = False
                if not same:
                    # show first diff
                    try:
                        neq = (x != y) & ~(x.isna() & y.isna())
                        i = neq[neq].index[0] if neq.any() else None
                    except Exception:
                        i = 0
                    if i is not None:
                        detail = f" col={c} row={i} spark={x.iloc[i]!r} duck={y.iloc[i]!r} dtypes={x.dtype}/{y.dtype}"
                        ok = False
                        break
        else:
            detail = f" cols spark={list(a.columns)} duck={list(b.columns)} rows={len(a)}/{len(b)}"
        print(("✓" if ok else "✗") + f" {name}: {len(a)} rows{detail}")
        n_ok += ok
        n_bad += (not ok)
    print(f"== {n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
