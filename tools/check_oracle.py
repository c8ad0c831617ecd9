#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read Verify.scala's
parquet dumps, run each oracle SQL in DuckDB over the same sf tables,
sort columns by name, and compare row-by-row. Dev tool only (driver-side
python libs); not part of the Scala build."""
import json, sys, glob, os
import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    # harness tables are single files; ScaleGen-derived snapshots are
    # parquet directories -> glob the parts
    path = f"{SF_DIR}/{t}.parquet"
    src = f"{path}/*.parquet" if os.path.isdir(path) else path
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

with open(f"{OUT_DIR}/oracle_sql.json") as f:
    oracles = json.load(f)

def canon(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df

fails, passes, skips = [], [], []
for name in sorted(os.listdir(OUT_DIR)):
    path = os.path.join(OUT_DIR, name)
    if not os.path.isdir(path):
        continue
    spark_df = canon(pd.concat([pd.read_parquet(p) for p in
                     sorted(glob.glob(f"{path}/*.parquet"))], ignore_index=True)
                     if glob.glob(f"{path}/*.parquet") else pd.DataFrame())
    if name not in oracles:
        skips.append(f"{name}: rows-only ({len(spark_df)} rows)")
        if len(spark_df) == 0:
            fails.append((name, "rows-only query returned 0 rows"))
        continue
    try:
        oracle_df = canon(con.sql(oracles[name]).df())
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    if list(spark_df.columns) != list(oracle_df.columns):
        fails.append((name, f"columns differ: spark={list(spark_df.columns)} oracle={list(oracle_df.columns)}"))
        continue
    # dtype parity: a strict hash compare can trip on int32-vs-int64 or
    # DuckDB HUGEINT-sum-as-float64 even when values match
    dt = [c for c in spark_df.columns
          if str(spark_df[c].dtype) != str(oracle_df[c].dtype)]
    if dt:
        fails.append((name, "dtype mismatch: " + ", ".join(
            f"{c} spark={spark_df[c].dtype} oracle={oracle_df[c].dtype}" for c in dt)))
        continue
    if len(spark_df) != len(oracle_df):
        fails.append((name, f"row count: spark={len(spark_df)} oracle={len(oracle_df)}"))
        continue
    # value compare (exact; what a hash compare would see)
    diff_cols = []
    for c in spark_df.columns:
        a, b = spark_df[c], oracle_df[c]
        try:
            ok = (a.astype(object).where(pd.notnull(a), None) ==
                  b.astype(object).where(pd.notnull(b), None)).all()
        except Exception:
            ok = False
        if not ok:
            diff_cols.append(c)
    if diff_cols:
        name_, det = name, []
        for c in diff_cols[:3]:
            mask = ~(spark_df[c].astype(object).where(pd.notnull(spark_df[c]), None) ==
                     oracle_df[c].astype(object).where(pd.notnull(oracle_df[c]), None))
            idx = list(spark_df.index[mask])[:3]
            det.append(f"{c}: rows {idx} spark={list(spark_df.loc[idx, c])} oracle={list(oracle_df.loc[idx, c])}")
        fails.append((name, "; ".join(det)))
    else:
        passes.append(f"{name}: OK ({len(spark_df)} rows)")

for p in passes: print("PASS ", p)
for s in skips: print("SKIP ", s)
for n, m in fails: print("FAIL ", n, "--", m)
print(f"\n{len(passes)} pass, {len(fails)} fail, {len(skips)} rows-only")
sys.exit(1 if fails else 0)
