#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB oracle compare.

Usage: oracle_compare.py <sfDir> <verifyOutDir> [query ...]

For each query: run the dumped oracle SQL in DuckDB (base tables
registered as views over <sfDir>/<name>.parquet), read the Spark result
parquet, and compare row count, column names, and the multiset of rows
(order-insensitive, NaN-safe). Prints one line per query.
"""
import json
import math
import sys

import duckdb

TABLES = ["customer", "documents", "embeddings", "events", "lineitem",
          "nation", "orders", "part", "region", "supplier"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9) + 0.0)  # +0.0 folds -0.0 into 0.0
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return repr(v)


def rows_key(rows):
    return sorted(",".join(norm(v) for v in r) for r in rows)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    failures = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        try:
            orows = con.execute(oracle[name]).fetchall()
            ocols = [d[0] for d in con.description]
            srel = duckdb.connect().execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            srows = srel.fetchall()
            scols = [d[0] for d in srel.description]
            ok_rows = len(orows) == len(srows)
            ok_cols = ocols == scols
            ok_hash = rows_key(orows) == rows_key(srows)
            status = "OK" if (ok_rows and ok_cols and ok_hash) else "FAIL"
            if status == "FAIL":
                failures += 1
            print(f"{name}: {status} rows={len(srows)}/{len(orows)} "
                  f"cols={'ok' if ok_cols else f'{scols} vs {ocols}'} "
                  f"hash={'ok' if ok_hash else 'MISMATCH'}")
            if not ok_hash and ok_rows and ok_cols:
                a, b = rows_key(srows), rows_key(orows)
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                for x, y in diff:
                    print(f"   spark: {x[:200]}\n  oracle: {y[:200]}")
        except Exception as e:
            failures += 1
            print(f"{name}: ERROR {str(e)[:300]}")
    print(f"failures={failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
