#!/usr/bin/env python3
"""Merge several graft.Bench JSON lines into one BENCH.json with
per-query MINIMA across all passes of all runs (each query keeps the
concatenated `runs` array for transparency).

Same remedy as merge_stress.py / Bench.scala's round-robin passes: a
host-contention window can inflate at most one run's samples of any
query, so the min across independent runs converges on the query's
true cost. `flagged_vs_prior` is re-derived against the previously
committed BENCH.json when present (same >5x advisory as Bench.scala).

Usage: merge_bench.py out.json run1.log [run2.log ...]
(each log is a file whose LAST {"metric":...} line is the run's JSON)
"""
import json
import sys


def load_run(path):
    last = None
    for line in open(path):
        if '"metric"' in line and '"queries"' in line:
            last = line[line.index('{'):].strip()
    if last is None:
        raise SystemExit(f"no bench JSON line in {path}")
    return json.loads(last)


def main(out_path, logs):
    runs = [load_run(f) for f in logs]
    base = runs[-1]
    names = sorted(set().union(*[r["queries"].keys() for r in runs]))
    merged_runs = {}
    queries = {}
    for q in names:
        samples = []
        for r in runs:
            samples += r.get("runs", {}).get(q, [r["queries"][q]] if q in r["queries"] else [])
        merged_runs[q] = samples
        queries[q] = min(samples)
    # Baseline = the COMMITTED artifact (ad-hoc bench runs overwrite the
    # working-tree file, so reading out_path directly could compare
    # against a clobbered intermediate); fall back to the file when the
    # path isn't tracked. Flag condition mirrors Bench.scala's advisory:
    # prior > 0 && cur > 5 * prior && cur > 0.5.
    prior = {}
    try:
        import subprocess, os
        # git show needs a repo-root-relative path: an absolute
        # out_path or an invocation from a subdirectory would fail the
        # lookup and silently fall back to the clobberable file.
        top = subprocess.run(
            ["git", "rev-parse", "--show-toplevel"],
            capture_output=True, text=True, check=True).stdout.strip()
        rel = os.path.relpath(os.path.abspath(out_path), top)
        blob = subprocess.run(
            ["git", "show", f"HEAD:{rel}"], cwd=top,
            capture_output=True, text=True, check=True).stdout
        prior = json.loads(blob).get("queries", {})
        print(f"baseline: git HEAD:{rel}", file=sys.stderr)
    except Exception:
        try:
            prior = json.load(open(out_path)).get("queries", {})
            print(f"baseline: working-tree {out_path} (NOT committed — "
                  "may be a clobbered intermediate)", file=sys.stderr)
        except Exception:
            print("baseline: none found", file=sys.stderr)
    flagged = {q: [prior[q], queries[q]] for q in queries
               if q in prior and prior[q] > 0
               and queries[q] > 5 * prior[q] and queries[q] > 0.5}
    out = {
        "metric": base.get("metric", "total"),
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "runs": merged_runs,
        "passes": sum(r.get("passes", len(next(iter(r.get("runs", {"x": [0]}).values()))) if r.get("runs") else 1) for r in runs),
        "flagged_vs_prior": flagged,
        "catalog_size": base.get("catalog_size"),
        # derived from the merged set: a filtered (BENCH_ONLY) last run
        # would otherwise stamp its own tiny row count onto the artifact
        "bench_rows": len(queries),
        "git_sha": base.get("git_sha"),
        "sf": base.get("sf"),
    }
    json.dump(out, open(out_path, "w"))
    print(f"wrote {out_path}: {len(queries)} queries, total {out['value']}s, "
          f"flagged {list(flagged)}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
