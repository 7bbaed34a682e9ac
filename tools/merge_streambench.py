#!/usr/bin/env python3
"""Reassemble the canonical STREAMBENCH.json from per-mix forked runs.

Why forked runs: one long-lived local JVM degrades monotonically as
mixes execute (JIT profile pollution over the shared Row/ArrayData
call sites — the same artifact BASELINE.md documents for the ANN
stress phases), taxing whichever mix runs later by ~1-1.5 s/batch.
Measured: dim_fanout 2.8 s solo vs 3.8 s sequenced; its narrowed twin
2.6 s solo vs 4.3 s sequenced — the in-sequence shape reverses the
pair's true order. Running every mix via SPARK_GRAFT_SB_MIX_ONLY in a
fresh JVM makes paired tiers comparable; this script stitches the
partial outputs back into the canonical artifact shape.

Usage: merge_streambench.py OUT part1.json part2.json ...

Each part is StreamBench's partial shape: header fields + one or more
named mix objects. Later parts win on tier collisions. The canonical
shape inlines the `small` mix at top level and renames the batch
tiers to their committed *_batch names; `forked_jvms` records the
provenance, `seed_sec` the per-part seed costs (the canary).
"""
import json
import sys

RENAME = {
    "large": "large_batch",
    "dim_only": "dim_only_batch",
    "dim_only_narrowed": "dim_only_batch_narrowed",
    "dim_fanout": "dim_fanout_batch",
    "dim_fanout_narrowed": "dim_fanout_batch_narrowed",
    "dim_only_cf": "dim_only_batch_cf",
    "dim_fanout_cf": "dim_fanout_batch_cf",
    "over_cap": "over_cap_batch",
}
HEADER = ("seed_listings", "buckets", "payload_bytes")
CANON_ORDER = [
    "large_batch", "dim_only_batch", "dim_only_batch_narrowed",
    "dim_fanout_batch", "dim_fanout_batch_narrowed",
    "dim_only_batch_cf", "dim_fanout_batch_cf", "over_cap_batch",
    "dedup_stream", "vec_dedup_stream", "hh_stream",
]


def main():
    out_path, parts = sys.argv[1], sys.argv[2:]
    merged, seeds, small = {}, [], None
    for p in parts:
        with open(p) as f:
            d = json.load(f)
        for h in HEADER:
            if h in d:
                prev = merged.get(h)
                assert prev is None or prev == d[h], \
                    f"{p}: header {h} mismatch ({prev} vs {d[h]})"
                merged[h] = d[h]
        if "seed_sec" in d:
            seeds.append(d["seed_sec"])
        for k, v in d.items():
            if k in ("seed_sec",) or k in HEADER:
                continue
            if k == "small":
                small = v
            else:
                merged[RENAME.get(k, k)] = v
    canon = {h: merged[h] for h in HEADER if h in merged}
    canon["seed_sec"] = min(seeds) if seeds else None
    canon["seed_sec_runs"] = seeds
    canon["forked_jvms"] = len(parts)
    if small is not None:
        canon.update(small)
    for k in CANON_ORDER:
        if k in merged:
            canon[k] = merged[k]
    with open(out_path, "w") as f:
        json.dump(canon, f)
        f.write("\n")
    print(f"[merge_streambench] {out_path}: "
          f"{len([k for k in CANON_ORDER if k in merged]) + (1 if small else 0)}"
          f" tiers from {len(parts)} forked runs")


if __name__ == "__main__":
    main()
