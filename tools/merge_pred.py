#!/usr/bin/env python3
"""Assemble a PRED artifact from newly recorded rows plus the rows
carried from the previous artifact (operator code unchanged for those),
with per-row provenance and the scope-out map. Tags are explicit args
(r12: they were hardcoded round names).

Usage: merge_pred.py out.json carried.json carried_tag excluded.json \
         new_tag new1.json [new2...]
"""
import json, sys

def main():
    out, carried_path, carried_tag, exc_path, new_tag = sys.argv[1:6]
    news = sys.argv[6:]
    carried = json.load(open(carried_path))
    new_rows = {}
    base = None
    # provenance is a JSON LIST of tags (ADVICE r12: the old ' | '-joined
    # string grew unboundedly and its 'prior' default was dead); legacy
    # string values from older artifacts are split back into lists.
    def as_tags(v):
        if isinstance(v, list):
            return v
        if isinstance(v, str) and v:
            return [t for t in v.split(" | ") if t]
        return []
    for p in news:
        d = json.load(open(p))
        base = base or d
        for r in d["results"]:
            r["recorded"] = [new_tag]
            new_rows[r["query"]] = r
    rows = list(new_rows.values())
    for r in carried["results"]:
        if r["query"] not in new_rows:
            r["recorded"] = as_tags(r.get("recorded")) + [carried_tag]
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
    print(f"{out}: {len(rows)} rows ({len(new_rows)} {new_tag}), failed {failed}")

if __name__ == "__main__":
    main()
