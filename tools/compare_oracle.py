#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: compare_oracle.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
against the raw test parquet, read the Spark result parquet, sort columns
by name + rows by all columns, round floats, and diff.
"""
import json, sys, math
import duckdb

def norm(df):
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == 'float64':
            df[c] = df[c].round(4)
        # timestamps: normalize to ns-truncated-to-us strings
        if str(df[c].dtype).startswith('datetime64'):
            df[c] = df[c].astype('datetime64[us]').astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        w, g = norm(want), norm(got)
        if list(w.columns) != list(g.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
        elif len(w) != len(g):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
        elif not w.equals(g):
            diff = (w != g) & ~(w.isna() & g.isna())
            bad = diff.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())} mismatched rows; first:")
            print("  want:", w[bad].head(3).to_dict('records'))
            print("  got: ", g[bad].head(3).to_dict('records'))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(w)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
