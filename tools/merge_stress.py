#!/usr/bin/env python3
"""Merge several graft.Stress run logs into one STRESS.json with
per-phase MINIMA across runs (each phase keeps its full `sec_runs`
array for transparency).

Rationale: the single-JVM stress harness shares its host; wall-clock on
individual phases swings 2-3x run-to-run under external contention
while the structural metrics (spill, shuffle volume, task spread,
exactness requires) are stable. Per-phase minima across runs is the
same remedy Bench.scala applies per-query across round-robin passes —
a contention window can inflate at most one run's sample of any phase.
Metrics other than `sec` are taken from the run that achieved the min.

Usage: merge_stress.py out.json run1.log [run2.log ...]
"""
import json
import sys


def main(out_path, logs):
    runs = []
    for f in logs:
        d = {}
        for line in open(f):
            if '[stress] {' in line:
                rec = json.loads(line.split('[stress] ', 1)[1])
                d[rec['phase']] = rec
        runs.append(d)
    phases = list(runs[-1].keys())
    out = []
    for p in phases:
        recs = [r[p] for r in runs if p in r]
        best = min(recs, key=lambda r: r['sec'])
        merged = dict(best)
        merged['sec_runs'] = [r['sec'] for r in recs]
        out.append(merged)
    json.dump(out, open(out_path, 'w'), indent=1)
    print(f"wrote {out_path}: {len(out)} phases, {len(runs)} runs")


if __name__ == '__main__':
    main(sys.argv[1], sys.argv[2:])
