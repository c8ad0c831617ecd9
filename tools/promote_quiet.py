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
import argparse
import json
import subprocess
import sys


def fail(msg: str) -> None:
    print(f"REFUSED: {msg}", file=sys.stderr)
    sys.exit(1)


def main() -> None:
    # argparse, not hand-rolled token filtering (ADVICE r13): dropping
    # only '--'-prefixed tokens left --sf's VALUE in the positional list,
    # so `promote_quiet.py --sf /root/testdata/sf1` selected the sf PATH
    # as the candidate file and died on a confusing JSON error instead of
    # a REFUSED message.
    ap = argparse.ArgumentParser()
    ap.add_argument("candidate", nargs="?", default="BENCH_LOCAL.json")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ns = ap.parse_args()
    cand_path, sf = ns.candidate, ns.sf

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
    # Build fingerprint (ADVICE r13): commit==HEAD + dirty=false describe
    # the worktree, but the bench executes compiled classes — refuse a
    # snapshot whose newest .class predates the last commit that touched
    # src/build.sbt (committed-but-not-recompiled = measuring stale code).
    build = cand.get("build_epoch", 0)
    src = cand.get("src_epoch", 0)
    if not build or not src:
        fail(f"missing build fingerprint (build_epoch={build}, "
             f"src_epoch={src}; pre-r14 artifact?) — re-run graft.Bench")
    if build < src:
        fail(f"build_epoch {build} < src_epoch {src} — the compiled "
             "classes predate the last src/build.sbt commit; "
             "run `sbt compile` and re-run the bench")
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
