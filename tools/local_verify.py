#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet dump produced by graft.Verify,
runs the matching oracle SQL from oracle_sql.json in DuckDB over the same
testdata parquet tables, sorts columns by name and rows by value, and
compares cell-by-cell (exact equality, same as a hash compare would be).
"""
import json
import math
import sys

import duckdb

STRICT_TYPES = False


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            rr.append(v)
        out.append(tuple(rr))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [sorted(cols)] + out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        # Single execution per side: the pandas frame provides both the
        # value rows and the dtypes (running each oracle twice doubled the
        # gate's DuckDB work for no extra information).
        try:
            mine_df = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        mine_cols = list(mine_df.columns)
        mine_rows = list(mine_df.itertuples(index=False, name=None))
        want_cols = list(want_df.columns)
        want_rows = list(want_df.itertuples(index=False, name=None))
        # Driver-parity dtype check: the driver hashes pandas frames, and
        # int-vs-float divergence (e.g. DuckDB HUGEINT -> float64 vs Spark
        # int64) fails its hash even when values compare equal. Integer
        # width differences (int32 vs int64) are fine.
        kinds = [{c: mine_df[c].dtype.kind for c in mine_df.columns},
                 {c: want_df[c].dtype.kind for c in want_df.columns}]
        dtype_bad = [c for c in kinds[0]
                     if c in kinds[1] and
                     {kinds[0][c], kinds[1][c]} == {"i", "f"}]
        a, b = canon(mine_rows, mine_cols), canon(want_rows, want_cols)
        if a == b and not dtype_bad:
            print(f"PASS {name} ({len(mine_rows)} rows)")
            n_pass += 1
        elif dtype_bad:
            n_fail += 1
            print(f"FAIL {name}: int-vs-float dtype divergence on {dtype_bad} "
                  f"({ {c: (kinds[0][c], kinds[1][c]) for c in dtype_bad} })")
        else:
            n_fail += 1
            if a[0] != b[0]:
                print(f"FAIL {name}: columns {a[0]} vs {b[0]}")
                continue
            diffs = [(x, y) for x, y in zip(a[1:], b[1:]) if x != y]
            print(f"FAIL {name}: rows {len(a)-1} vs {len(b)-1}, "
                  f"{len(diffs)} differing rows; first 3:")
            for x, y in diffs[:3]:
                print(f"  mine: {x}\n  want: {y}")
    # Rows-only queries (no oracle SQL) still get sorted+hashed by the
    # driver; a non-scalar cell (list/array) crashes pandas sort_values.
    import os
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d) or name in oracle:
            continue
        try:
            df = con.execute(
                f"SELECT * FROM read_parquet('{d}/*.parquet')").df()
            df.sort_values(by=list(df.columns))
            print(f"PASS {name} (rows-only, {len(df)} rows, sortable)")
            n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: rows-only output not driver-sortable: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
