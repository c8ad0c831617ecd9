#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read Verify.scala's
parquet dumps, run each oracle SQL in DuckDB over the same sf tables,
sort columns by name, and compare row-by-row. Dev tool only (driver-side
python libs); not part of the Scala build."""
import json, sys, glob, os, time, threading
import duckdb
import pandas as pd

args = [a for a in sys.argv[1:] if not a.startswith("--")]
opts = {a.split("=", 1)[0]: (a.split("=", 1) + [""])[1]
        for a in sys.argv[1:] if a.startswith("--")}
SF_DIR = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
OUT_DIR = args[1] if len(args) > 1 else "/tmp/verify_out"
# --json=PATH writes a per-query machine-readable record (the sf1
# correctness artifact); --timeout=SEC interrupts an oracle SQL that
# outlives the budget (DuckDB's recursive-CTE/quadratic twins DNF at
# sf1 — q81 already DNF'd at sf0.1) and records oracle_timeout instead
# of hanging the whole pass.
JSON_OUT = opts.get("--json")
TIMEOUT = float(opts.get("--timeout", "0") or 0)
# --memlimit=48GB caps DuckDB's memory (spilling to temp instead of
# eating the box): without it, a pathological CTE twin at sf1 consumed
# all RAM, the Timer thread ITSELF died of MemoryError, and the
# interrupt never fired — the timeout must survive the query it guards.
MEMLIMIT = opts.get("--memlimit")

con = duckdb.connect()
if MEMLIMIT:
    con.sql(f"SET memory_limit='{MEMLIMIT}'")
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    # harness tables are single files; ScaleGen-derived snapshots are
    # parquet directories -> glob the parts
    path = f"{SF_DIR}/{t}.parquet"
    src = f"{path}/*.parquet" if os.path.isdir(path) else path
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

with open(f"{OUT_DIR}/oracle_sql.json") as f:
    oracles = json.load(f)

# Bounded-error oracle specs for PURE sketch dumps: sketch internals hash
# engine-specifically (HLL registers / GK summaries), so no exact hash twin
# exists by construction — but the ESTIMATE is still cross-engine checkable
# against DuckDB's exact answer within the sketch's documented error bound.
# As of round 7 the registry rows q122/q123 check their error contract
# IN-QUERY (boolean verdicts + exact aggregates) and ride the exact-oracle
# path above like every other query; these specs remain as the tolerance
# fallback for dumps of the pure sketch shapes (SketchOps.approxDistinct /
# approxQuantile), which only fire when a dump has no oracle_sql entry.
# Contracts mirror SketchSpec.scala exactly (same tolerances, same rank
# semantics), so the in-JVM test and the cross-engine gate assert one
# contract. "relative": join spark vs exact on `key`, each col within
# rel_tol of the exact value. "rank": for each group and quantile q, the
# spark answer v must satisfy frac(< v) <= q+eps and frac(<= v) >= q-eps
# over DuckDB's exact value multiset.
TOLERANCE = {
    "q122_approx_distinct_hll": {
        # rsd 0.02 -> 3 sigma = 6% relative-error bound (SketchSpec)
        "mode": "relative", "key": "lang", "cols": {"approx_tokens": 0.06},
        "sql": """
            WITH toks AS (SELECT lang, unnest(string_split(lower(text), ' ')) AS tok
                          FROM documents)
            SELECT coalesce(lang, '__null__') AS lang,
                   CAST(count(DISTINCT tok) AS BIGINT) AS approx_tokens
            FROM toks GROUP BY 1
            UNION ALL
            SELECT '__all__' AS lang, CAST(count(DISTINCT tok) AS BIGINT)
            FROM toks ORDER BY lang""",
    },
    "q123_approx_quantile_sketch": {
        # accuracy 1000 -> rank error <= 1/1000; +0.0005 discreteness
        # slack (SketchSpec). n is exact and compared exactly.
        "mode": "rank", "key": "o_orderpriority",
        "cols": {"p25": 0.25, "p50": 0.5, "p75": 0.75, "p95": 0.95},
        "count_col": "n", "eps": 0.0015,
        "sql": """SELECT o_orderpriority AS k, CAST(o_totalprice AS DOUBLE) AS v
                  FROM orders""",
    },
}

def check_bounded(name, spark_df, spec):
    """Returns (ok, detail) for a bounded-error spec."""
    exact = run_oracle(spec["sql"])
    if spec["mode"] == "relative":
        key = spec["key"]
        e = exact.set_index(key)
        s = spark_df.set_index(key)
        if sorted(e.index) != sorted(s.index):
            return False, f"key sets differ: spark={sorted(s.index)} exact={sorted(e.index)}"
        worst = 0.0
        for col, tol in spec["cols"].items():
            for k in e.index:
                ev, sv = float(e.loc[k, col]), float(s.loc[k, col])
                rel = abs(sv - ev) / ev
                worst = max(worst, rel)
                if rel > tol:
                    return False, (f"{col}[{k}]: approx={sv:.0f} exact={ev:.0f} "
                                   f"rel_err={rel:.4f} > {tol}")
        return True, f"max rel_err {worst:.4f} <= {min(spec['cols'].values())}"
    # rank mode
    key, eps = spec["key"], spec["eps"]
    groups = {k: g["v"].sort_values().to_numpy()
              for k, g in exact.groupby("k")}
    if sorted(groups) != sorted(spark_df[key]):
        return False, (f"key sets differ: spark={sorted(spark_df[key])} "
                       f"exact={sorted(groups)}")
    worst = 0.0
    for _, row in spark_df.iterrows():
        vals = groups[row[key]]
        n = len(vals)
        if spec.get("count_col") and int(row[spec["count_col"]]) != n:
            return False, f"n[{row[key]}]: spark={row[spec['count_col']]} exact={n}"
        for col, q in spec["cols"].items():
            v = float(row[col])
            below = (vals < v).sum() / n
            at_or_below = (vals <= v).sum() / n
            dev = max(below - q, q - at_or_below, 0.0)
            worst = max(worst, dev)
            if below > q + eps or at_or_below < q - eps:
                return False, (f"{col}[{row[key]}]={v}: rank band "
                               f"[{below:.4f},{at_or_below:.4f}] outside {q}+-{eps}")
    return True, f"max rank deviation {worst:.4f} <= {eps}"

# In-query invariant contracts (VERDICT r8 #1): these queries carry
# boolean verdict columns computed by the ENGINE via an independent
# formulation (edge-vs-node mass conservation, edge-iterator vs
# node-iterator triangle totals, labeling consistency, sampled
# brute-force re-scoring). At sf0.01 the oracle pins them to literal
# TRUE like any other column; past the oracle's reach (the DuckDB CTE
# twins DNF) a timeout no longer means "unverified": the checker reads
# the engine dump and verifies every contract column affirmatively ->
# status "invariant_match" instead of "oracle_timeout".
INVARIANTS = {
    "q81_dedup_components": ["inv_edges_ok", "inv_canonical_ok"],
    "q131_pagerank_trade_graph": ["mass_ok"],
    "q137_triangle_count": ["tri_xcheck"],
    "q148_bfs_hops": ["bfs_ok"],
    "q35_ngram_jaccard_blocked": ["jacc_xck"],
}

def check_invariants(name, spark_df):
    """(status, detail) for a timed-out oracle whose query carries
    invariant columns. Affirmative only when rows exist and every
    contract column is all-True."""
    cols = INVARIANTS[name]
    if len(spark_df) == 0:
        return "fail", "invariant check on 0 rows"
    missing = [c for c in cols if c not in spark_df.columns]
    if missing:
        return "fail", f"invariant columns missing from dump: {missing}"
    bad = {c: int((~spark_df[c].astype(bool)).sum()) for c in cols
           if not spark_df[c].astype(bool).all()}
    if bad:
        return "fail", f"invariant violations: {bad}"
    return "invariant_match", (f"{len(spark_df)} rows; engine-side "
                               f"contracts all TRUE: {cols}")

def canon(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df

def run_oracle(sql):
    """Run one oracle SQL, interrupting at TIMEOUT seconds if set."""
    if not TIMEOUT:
        return con.sql(sql).df()
    timer = threading.Timer(TIMEOUT, con.interrupt)
    timer.start()
    try:
        return con.sql(sql).df()
    finally:
        timer.cancel()

fails, passes, skips = [], [], []
record = {}
for name in sorted(os.listdir(OUT_DIR)):
    path = os.path.join(OUT_DIR, name)
    if not os.path.isdir(path):
        continue
    print(f"... {name}", file=sys.stderr, flush=True)
    spark_df = canon(pd.concat([pd.read_parquet(p) for p in
                     sorted(glob.glob(f"{path}/*.parquet"))], ignore_index=True)
                     if glob.glob(f"{path}/*.parquet") else pd.DataFrame())
    if name not in oracles:
        if len(spark_df) == 0:
            # fail only -- appending to skips too would double-count the
            # query in the summary line and print it as both SKIP and FAIL
            fails.append((name, "rows-only query returned 0 rows"))
            record[name] = {"status": "fail", "rows": 0,
                            "detail": "rows-only query returned 0 rows"}
        elif name in TOLERANCE:
            t0 = time.time()
            try:
                ok, detail = check_bounded(name, spark_df, TOLERANCE[name])
            except duckdb.InterruptException:
                skips.append(f"{name}: oracle timeout after {TIMEOUT:.0f}s "
                             f"({len(spark_df)} spark rows)")
                record[name] = {"status": "oracle_timeout",
                                "rows": len(spark_df),
                                "oracle_secs": round(time.time() - t0, 1)}
                continue
            except Exception as e:
                ok, detail = False, f"bounded-check error: {e}"
            if ok:
                passes.append(f"{name}: bounded-error OK "
                              f"({len(spark_df)} rows, {detail})")
                record[name] = {"status": "bounded_match",
                                "rows": len(spark_df), "detail": detail,
                                "oracle_secs": round(time.time() - t0, 1)}
            else:
                fails.append((name, detail))
                record[name] = {"status": "fail", "rows": len(spark_df),
                                "detail": detail[:300]}
        else:
            skips.append(f"{name}: rows-only ({len(spark_df)} rows)")
            record[name] = {"status": "rows_only", "rows": len(spark_df)}
        continue
    t0 = time.time()
    try:
        oracle_df = canon(run_oracle(oracles[name]))
    except duckdb.InterruptException:
        secs = round(time.time() - t0, 1)
        if name in INVARIANTS:
            status, detail = check_invariants(name, spark_df)
            if status == "invariant_match":
                passes.append(f"{name}: oracle DNF ({secs}s) but {detail}")
            else:
                fails.append((name, f"oracle DNF and {detail}"))
            record[name] = {"status": status, "rows": len(spark_df),
                            "detail": detail, "oracle_secs": secs}
        else:
            skips.append(f"{name}: oracle timeout after {TIMEOUT:.0f}s "
                         f"({len(spark_df)} spark rows)")
            record[name] = {"status": "oracle_timeout", "rows": len(spark_df),
                            "oracle_secs": secs}
        continue
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        record[name] = {"status": "oracle_error", "rows": len(spark_df),
                        "detail": str(e)[:300]}
        continue
    record[name] = {"status": "match", "rows": len(spark_df),
                    "oracle_secs": round(time.time() - t0, 1)}
    def fail(detail):
        fails.append((name, detail))
        record[name] = {"status": "fail", "rows": len(spark_df),
                        "detail": detail[:300]}
    if list(spark_df.columns) != list(oracle_df.columns):
        fail(f"columns differ: spark={list(spark_df.columns)} oracle={list(oracle_df.columns)}")
        continue
    # dtype parity: a strict hash compare can trip on int32-vs-int64 or
    # DuckDB HUGEINT-sum-as-float64 even when values match
    dt = [c for c in spark_df.columns
          if str(spark_df[c].dtype) != str(oracle_df[c].dtype)]
    if dt:
        fail("dtype mismatch: " + ", ".join(
            f"{c} spark={spark_df[c].dtype} oracle={oracle_df[c].dtype}" for c in dt))
        continue
    if len(spark_df) != len(oracle_df):
        fail(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
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
        det = []
        for c in diff_cols[:3]:
            mask = ~(spark_df[c].astype(object).where(pd.notnull(spark_df[c]), None) ==
                     oracle_df[c].astype(object).where(pd.notnull(oracle_df[c]), None))
            idx = list(spark_df.index[mask])[:3]
            det.append(f"{c}: rows {idx} spark={list(spark_df.loc[idx, c])} oracle={list(oracle_df.loc[idx, c])}")
        fail("; ".join(det))
    else:
        passes.append(f"{name}: OK ({len(spark_df)} rows)")

for p in passes: print("PASS ", p)
for s in skips: print("SKIP ", s)
for n, m in fails: print("FAIL ", n, "--", m)
print(f"\n{len(passes)} pass, {len(fails)} fail, {len(skips)} rows-only/timeout")
if JSON_OUT:
    counts = {}
    for v in record.values():
        counts[v["status"]] = counts.get(v["status"], 0) + 1
    with open(JSON_OUT, "w") as f:
        json.dump({"sf_dir": SF_DIR, "out_dir": OUT_DIR,
                   "timeout_secs": TIMEOUT or None, "summary": counts,
                   "queries": record}, f, indent=1, sort_keys=True)
    print(f"wrote {JSON_OUT}: {counts}")
sys.exit(1 if fails else 0)
