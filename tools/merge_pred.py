#!/usr/bin/env python3
"""Assemble PRED_sf100.json from the r11 re-recorded rows plus the rows
carried from the r10 artifact (code unchanged for those), with per-row
provenance and the scope-out map.

Usage: merge_pred.py out.json carried.json excluded.json new1.json [new2...]
"""
import json, sys

def main():
    out, carried_path, exc_path = sys.argv[1:4]
    news = sys.argv[4:]
    carried = json.load(open(carried_path))
    new_rows = {}
    base = None
    for p in news:
        d = json.load(open(p))
        base = base or d
        for r in d["results"]:
            r["recorded"] = "r11"
            new_rows[r["query"]] = r
    rows = list(new_rows.values())
    for r in carried["results"]:
        if r["query"] not in new_rows:
            r["recorded"] = "r10-carried (operator code unchanged in r11)"
            rows.append(r)
    failed = sum(1 for r in rows if not r.get("ok"))
    doc = {
        "metric": "predicted_values",
        "small": base["small"], "big": base["big"], "reps": base["reps"],
        "checks": len(rows), "failed": failed,
        "excluded": json.load(open(exc_path)),
        "results": rows,
    }
    with open(out, "w") as f:
        json.dump(doc, f)
        f.write("\n")
    print(f"{out}: {len(rows)} rows ({len(new_rows)} r11), failed {failed}")

if __name__ == "__main__":
    main()
