#!/usr/bin/env python3
"""Merge SuiteProbe progress logs into one completion artifact.

SuiteProbe prints one `SUITE <name> <cell-json>` line per query as it runs
and writes the full JSON only at exit — a run killed mid-flight (or a
targeted GRAFT_ONLY re-run after a fix) still has every completed cell in
its log. This stitches N logs (later logs override earlier cells, so a
re-run after a fix replaces the failed cell), attaches the exclusion map,
and emits the same suite_completion schema SuiteProbe itself writes.

A query that crashed the JVM mid-run (or was wall-killed before printing
its SUITE line) appears in NO log: the merged artifact must not silently
present itself as complete while missing it (ADVICE r11). The expected
registry is read from expected.txt (one query name per line); any name in
neither cells nor the exclusion map lands in a "missing" list, counts
toward a nonzero exit, and the artifact carries it.

Each log may be passed as TAG=path (e.g. r12-quiet-sweep=slow.log); the
emitted artifact carries a "provenance" map naming, per cell, the tag of
the log that provided it (VERDICT r11 #6: a reader must be able to tell
re-measured cells from carried ones). Bare paths get log<i> tags.

Usage: merge_suite.py out.json sf_dir cpus shuffle_parts \
         excluded.json expected.txt [TAG=]log1 [[TAG=]log2 ...]
"""
import json, os, re, sys

def main():
    out, sf_dir, cpus, parts, exc_path, expected_path = sys.argv[1:7]
    logs = sys.argv[7:]
    cells, provenance = {}, {}
    for i, spec in enumerate(logs):
        # A spec that names an existing file is ALWAYS a bare path — the
        # r12 guard ('/' in the tag half) missed 'run=12/suite.log', whose
        # slash lands after the '=', so the spec was reinterpreted as
        # TAG='run' + path='12/suite.log' (ADVICE r13). TAG=path parsing
        # is the fallback for specs that are not themselves files, and a
        # '/' anywhere in the spec after the '=' still forces bare-path.
        if os.path.exists(spec):
            tag, path = "", spec
        else:
            tag, _, path = spec.rpartition("=")
            if "/" in tag or ("/" in path and not os.path.exists(path)):
                tag, path = "", spec
        tag = tag or f"log{i}"
        if not os.path.exists(path):
            sys.exit(f"merge_suite: log not found: {path!r}"
                     + (f" (parsed from spec {spec!r} as TAG={tag!r} — "
                        f"use a tag without '=' or pass a bare path)"
                        if path != spec else ""))
        for line in open(path, errors="replace"):
            m = re.match(r"SUITE (q\S+) (\{.*\})\s*$", line)
            if m:
                try:
                    cells[m.group(1)] = json.loads(m.group(2))
                    provenance[m.group(1)] = tag
                except json.JSONDecodeError:
                    pass
    excluded = json.load(open(exc_path))
    for q in excluded:
        cells.pop(q, None)
        provenance.pop(q, None)
    expected = [l.strip() for l in open(expected_path) if l.strip()]
    missing = sorted(set(expected) - set(cells) - set(excluded))
    failed = sum(1 for c in cells.values() if "error" in c)
    doc = {
        "metric": "suite_completion", "sf_dir": sf_dir,
        "cpus": int(cpus), "shuffle_partitions": int(parts),
        "queries": len(cells), "failed": failed,
        "excluded": excluded,
        "missing": missing,
        "merged_from_logs": len(logs),
        "provenance": {q: provenance[q] for q in sorted(provenance)},
        "per_query": {q: cells[q] for q in sorted(cells)},
    }
    with open(out, "w") as f:
        json.dump(doc, f)
        f.write("\n")
    print(f"{out}: {len(cells)} cells, failed {failed}, "
          f"excluded {len(excluded)}, missing {len(missing)}")
    if missing:
        print(f"MISSING (ran in no log, not excluded): {missing}",
              file=sys.stderr)
        sys.exit(1)

if __name__ == "__main__":
    main()
