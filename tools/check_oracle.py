#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output
parquet written by graft.Verify, run the matching oracle SQL in DuckDB
over the same testdata and compare values (columns sorted by name).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df):
    """Sort columns by name; stringify values for robust compare."""
    df = df[sorted(df.columns)]
    return [tuple(str(v) for v in row) for row in df.itertuples(index=False)]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        g, w = norm(got), norm(want)
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs oracle {len(w)}")
            failures += 1
        elif sorted(got.columns) != sorted(want.columns):
            print(f"FAIL {name}: cols {sorted(got.columns)} vs {sorted(want.columns)}")
            failures += 1
        elif g != w:
            # row-order-insensitive fallback diagnostic
            if sorted(g) == sorted(w):
                print(f"WARN {name}: values match but row order differs")
            else:
                bad = next(i for i, (a, b) in enumerate(zip(g, w)) if a != b)
                print(f"FAIL {name}: first diff at row {bad}:")
                print(f"  got:    {g[bad]}")
                print(f"  oracle: {w[bad]}")
                failures += 1
        else:
            print(f"OK   {name} ({len(g)} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
