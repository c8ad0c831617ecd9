#!/usr/bin/env python3
"""Promote a full-suite bench detail file to BENCH_QUIET_REF.json — with
the provenance gate VERDICT r12 #2 asked for: the r12 round promoted a
snapshot recorded BEFORE the round's final operator commit, so BASELINE.md's
"best quiet bench on record" claim measured code that no longer existed.

Refuses to promote unless ALL of:
  - the candidate records the git commit of the tree it measured
    ("commit" field, written by graft.Bench since r13), that commit == the
    repo's current HEAD, and the measured tree was not dirty;
  - every pass was probe-clean (clean_passes >= 2, contended all-false);
  - no query failed;
  - the run is at the graded scale factor (sf0.1 by default).

Usage: tools/promote_quiet.py [candidate.json] [--sf /root/testdata/sf0.1]
"""
import json
import subprocess
import sys


def fail(msg: str) -> None:
    print(f"REFUSED: {msg}", file=sys.stderr)
    sys.exit(1)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    cand_path = args[0] if args else "BENCH_LOCAL.json"
    sf = "/root/testdata/sf0.1"
    if "--sf" in sys.argv:
        sf = sys.argv[sys.argv.index("--sf") + 1]

    with open(cand_path) as f:
        cand = json.load(f)

    commit = cand.get("commit", "")
    if not commit:
        fail(f"{cand_path} has no 'commit' field (pre-r13 artifact?) — "
             "re-run graft.Bench on the current tree")
    head = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                          text=True, check=True).stdout.strip()
    if commit != head:
        fail(f"measured commit {commit[:12]} != HEAD {head[:12]} — "
             "the snapshot does not measure the current tree")
    if cand.get("dirty", True):
        fail("measured tree had uncommitted src/build.sbt changes "
             "('dirty': true) — commit first, then re-run the bench")
    if cand.get("sf") != sf:
        fail(f"sf {cand.get('sf')!r} != graded {sf!r}")
    if cand.get("failed", 1) != 0:
        fail(f"failed={cand.get('failed')} queries")
    calib = cand.get("calibration", {})
    if calib.get("clean_passes", 0) < 2:
        fail(f"clean_passes={calib.get('clean_passes')} < 2")
    if any(calib.get("contended", [True])):
        fail(f"contended passes present: {calib.get('contended')}")
    if "queries" not in cand:
        fail("no per-query detail — promote the FILE artifact "
             "(BENCH_LOCAL.json), not the stdout line")
    qr = cand.get("quiet_ref", {})
    if qr.get("residual_inflation", False):
        fail(f"residual_inflation vs the current ref (median ratio "
             f"{qr.get('median_query_ratio')}) — promoting an inflated run "
             "would loosen the reference; re-run on a quiet box")

    with open("BENCH_QUIET_REF.json", "w") as f:
        json.dump(cand, f, separators=(",", ":"))
        f.write("\n")
    print(f"promoted {cand_path} -> BENCH_QUIET_REF.json "
          f"(commit {commit[:12]}, total {cand.get('value')}s, "
          f"{len(cand.get('queries', {}))} queries)")


if __name__ == "__main__":
    main()
