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
    "small_changelog": "small_changelog_batch",
    "dim_fanout_changelog": "dim_fanout_changelog_batch",
}
HEADER = ("seed_listings", "buckets", "payload_bytes")
CANON_ORDER = [
    "large_batch", "dim_only_batch", "dim_only_batch_narrowed",
    "dim_fanout_batch", "dim_fanout_batch_narrowed",
    "dim_only_batch_cf", "dim_fanout_batch_cf", "over_cap_batch",
    "small_changelog_batch", "dim_fanout_changelog_batch",
    "growth",
    "dedup_stream", "vec_dedup_stream", "hh_stream",
]


SEED_BAND_FACTOR = 1.35  # keep in lockstep with StreamBenchGuard.scala
SMALL_TIME_KEY = "mean_batch_sec"


def _same_config(a, b):
    return all(a.get(k) == b.get(k) for k in ("batches", "rows_per_batch"))


def _pick(prior, fresh, fresh_in_band):
    """Coherent-better record: seconds stay paired with the structural
    fields measured alongside them. An out-of-band part's record is
    adopted only when there is nothing comparable committed (new tier
    or reconfigured mix) — its structure is needed, its seconds are
    upper bounds either way."""
    if prior is None:
        return fresh
    if not _same_config(prior, fresh):
        return fresh
    if not fresh_in_band:
        return prior
    pm, fm = prior.get(SMALL_TIME_KEY), fresh.get(SMALL_TIME_KEY)
    if pm is not None and fm is not None and pm < fm:
        return prior
    return fresh


def main():
    args = [a for a in sys.argv[1:] if a != "--force"]
    force = "--force" in sys.argv[1:]
    out_path, parts = args[0], args[1:]
    merged, seeds, small, tier_seed = {}, [], None, {}
    small_seed = None
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
                small_seed = d.get("seed_sec")
            else:
                merged[RENAME.get(k, k)] = v
                tier_seed[RENAME.get(k, k)] = d.get("seed_sec")
    canon = {h: merged[h] for h in HEADER if h in merged}
    canon["seed_sec"] = min(seeds) if seeds else None
    canon["seed_sec_runs"] = seeds
    canon["forked_jvms"] = len(parts)
    if small is not None:
        canon.update(small)
    for k in CANON_ORDER:
        if k in merged:
            canon[k] = merged[k]

    # CANARY GATE (the Scala StreamBenchGuard discipline): when a
    # comparable committed artifact exists, each forked part's SEED is
    # its canary — parts past committed_seed_min * SEED_BAND_FACTOR are
    # ambient-pace runs whose seconds must not replace committed ones.
    # Structural folds (new tiers, reconfigured mixes) come from any
    # part; seconds only from in-band parts, and then only when better.
    committed = None
    if not force:
        try:
            with open(out_path) as f:
                committed = json.load(f)
        except (OSError, ValueError):
            committed = None
    if committed is not None and \
            all(committed.get(h) == canon.get(h) for h in HEADER):
        prior_seed = committed.get("seed_sec")

        def in_band(seed):
            if prior_seed is None or seed is None:
                return True
            return seed <= prior_seed * SEED_BAND_FACTOR

        folded = dict(committed)
        # header from fresh (asserted equal anyway)
        for h in HEADER:
            if h in canon:
                folded[h] = canon[h]
        # seed: min folds only over in-band parts; ALL parts append to
        # the provenance array
        in_band_seeds = [s for s in seeds if in_band(s)]
        cands = ([prior_seed] if prior_seed is not None else []) \
            + in_band_seeds
        folded["seed_sec"] = min(cands) if cands else None
        folded["seed_sec_runs"] = \
            committed.get("seed_sec_runs", []) + seeds
        folded["forked_jvms"] = \
            committed.get("forked_jvms", 0) + len(parts)
        # small mix (loose top-level scalars): one coherent block
        if small is not None:
            prior_small = {k: committed[k] for k in small if k in committed}
            pick = _pick(prior_small if prior_small else None, small,
                         in_band(small_seed))
            folded.update(pick)
        for k in CANON_ORDER:
            if k in merged:
                folded[k] = _pick(committed.get(k), merged[k],
                                  in_band(tier_seed.get(k)))
        canon = folded
        out_of_band = [s for s in seeds if not in_band(s)]
        if out_of_band:
            print(f"[merge_streambench] {len(out_of_band)} part(s) out of "
                  f"seed band (> {prior_seed} * {SEED_BAND_FACTOR}): their "
                  f"seconds did not fold")
    with open(out_path, "w") as f:
        json.dump(canon, f)
        f.write("\n")
    print(f"[merge_streambench] {out_path}: "
          f"{len([k for k in CANON_ORDER if k in merged]) + (1 if small else 0)}"
          f" tiers from {len(parts)} forked runs")


if __name__ == "__main__":
    main()
