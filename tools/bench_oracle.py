#!/usr/bin/env python3
"""Time the DuckDB oracle suite — the numeric baseline the Spark bench is
ratioed against (BASELINE.md had no number before round 3; the reference
publishes none). Runs each oracle SQL from Verify.scala's oracle_sql.json
against the given sf dir, one warmup + N timed runs, prints per-query and
total seconds as JSON. Dev tool only (driver-side python libs)."""
import json, sys, time
import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ORACLES = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 3

con = duckdb.connect()
con.sql("SET threads TO 32")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

with open(ORACLES) as f:
    oracles = json.load(f)

results = {}
for name in sorted(oracles):
    sql = oracles[name]
    try:
        t0 = time.perf_counter()
        con.sql(sql).fetchall()  # warmup (page cache + plan)
        warm = time.perf_counter() - t0
        # heavy twins (brute-force oracle forms) get one timed run, not N —
        # the baseline wants total suite cost, not per-query micro-precision
        iters = ITERS if warm < 10 else 1
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            con.sql(sql).fetchall()
            times.append(time.perf_counter() - t0)
        results[name] = round(min(times), 3)
        print(f"done {name}: {results[name]}s (warm {warm:.1f}s)",
              file=sys.stderr, flush=True)
    except Exception as e:
        results[name] = None
        print(f"ERROR {name}: {e}", file=sys.stderr, flush=True)

ok = {k: v for k, v in results.items() if v is not None}
out = {"metric": "oracle_total", "value": round(sum(ok.values()), 3),
       "unit": "sec", "n_queries": len(ok), "sf": SF_DIR,
       "engine": "duckdb", "threads": 32, "best_of": ITERS,
       "queries": ok}
print(json.dumps(out))
