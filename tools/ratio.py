#!/usr/bin/env python3
"""Reproducible BASELINE.md headline ratio: Spark total vs DuckDB total
over the SHARED query set (queries present in both per-query maps), from
the bench artifacts rather than anyone's memory.

  python3 tools/ratio.py [BENCH_LOCAL.json] [BASELINE_ORACLE.json]

BENCH_LOCAL.json  — written by `sbt "runMain graft.Bench"` (per-query map)
BASELINE_ORACLE.json — written by tools/bench_oracle.py (DuckDB twins)

Prints both suite totals, the shared-set totals, the ratio, and the top
divergences each way. Dev tool only (stdlib json)."""
import json
import sys

bench_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_LOCAL.json"
oracle_path = sys.argv[2] if len(sys.argv) > 2 else "BASELINE_ORACLE.json"

bench = json.load(open(bench_path))
oracle = json.load(open(oracle_path))

bq = {k: v for k, v in bench["queries"].items() if v >= 0}  # drop fail sentinels
oq = {k: v for k, v in oracle["queries"].items() if v is not None and v >= 0}
shared = sorted(set(bq) & set(oq))
spark_shared = sum(bq[k] for k in shared)
duck_shared = sum(oq[k] for k in shared)

print(f"spark bench:   {sum(bq.values()):8.2f}s over {len(bq)} queries "
      f"({bench.get('sf', '?')})")
print(f"duckdb oracle: {sum(oq.values()):8.2f}s over {len(oq)} queries "
      f"({oracle.get('sf', '?')})")
print(f"shared set:    {len(shared)} queries — spark {spark_shared:.2f}s, "
      f"duckdb {duck_shared:.2f}s")
print(f"RATIO (spark/duckdb, shared set): {spark_shared / duck_shared:.3f}")

only_b = sorted(set(bq) - set(oq))
only_o = sorted(set(oq) - set(bq))
if only_b:
    print(f"spark-only (rows-only / no twin): {', '.join(only_b)}")
if only_o:
    print(f"oracle-only: {', '.join(only_o)}")

div = sorted(shared, key=lambda k: bq[k] - oq[k])
print("top 5 spark wins (spark_s vs duck_s):")
for k in div[:5]:
    print(f"  {k:36s} {bq[k]:7.2f} vs {oq[k]:7.2f}")
print("top 5 spark losses:")
for k in div[-5:][::-1]:
    print(f"  {k:36s} {bq[k]:7.2f} vs {oq[k]:7.2f}")
