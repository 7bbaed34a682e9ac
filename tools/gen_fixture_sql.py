#!/usr/bin/env python3
"""Regenerate the pinned-fixture oracle SQL (q_minhash_pairs, q_simhash)
from a `graft.Verify` output directory.

The two fixtures pin engine-specific xxhash64 outputs no external engine
can recompute; whenever the tokenizer, the MinHash/SimHash expressions,
or the catalog parameters change, rerun Verify and this script (see the
oracle-coupling notes in OracleFixtures' scaladoc).

Usage: gen_fixture_sql.py <verify_out_dir> <resources_dir>
e.g.:  tools/gen_fixture_sql.py /tmp/verify_sf01 src/main/resources/graft/fixtures --suffix sf0.1
"""
import argparse
import glob
import os

import duckdb


def values_sql(parquet_glob, cols, order):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT {', '.join(cols)} FROM read_parquet('{parquet_glob}') "
        f"ORDER BY {order}").fetchall()
    assert rows, f"no rows under {parquet_glob}"
    tuples = ",\n       ".join(
        "(" + ", ".join(str(v) for v in row) + ")" for row in rows)
    casts = ", ".join(f"CAST({c} AS BIGINT) AS {c}" for c in cols)
    return (f"SELECT {casts}\n       FROM (VALUES {tuples}) "
            f"AS t({', '.join(cols)})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("verify_out")
    ap.add_argument("resources_dir")
    ap.add_argument("--suffix", default="sf0.1")
    args = ap.parse_args()
    os.makedirs(args.resources_dir, exist_ok=True)
    for name, cols, order in (
            ("minhash_pairs", ["id_a", "id_b"], "id_a, id_b"),
            ("simhash", ["doc_id", "simhash"], "doc_id")):
        src = os.path.join(args.verify_out,
                           "q_" + name, "*.parquet")
        assert glob.glob(src), f"missing Verify output for q_{name}"
        sql = values_sql(src, cols, order)
        dst = os.path.join(args.resources_dir, f"{name}_{args.suffix}.sql")
        with open(dst, "w") as f:
            f.write(sql + "\n")
        print(f"wrote {dst}")


if __name__ == "__main__":
    main()
