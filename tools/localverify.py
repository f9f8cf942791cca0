#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/localverify.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json, registers each fixture parquet as a
DuckDB view named after the table, runs every oracle SQL, and compares the
result against the engine's parquet dump at <verifyOutDir>/<name>/ —
columns sorted by name, rows sorted, values canonicalized to strings.
"""
import json
import math
import os
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if v is None:
        return "<None>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_of(rel):
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(canon(r[i]) for i in order) for r in rel.fetchall()]
    rows.sort()
    return [cols[i] for i in order], rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        # driver fixtures are single files; ScaleUp fixtures (sf1/sf10) are
        # Spark-written directories — glob the parts in that case
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        try:
            got_cols, got = table_of(
                con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"))
        except Exception as e:
            print(f"FAIL {name}: engine output unreadable: {e}")
            n_fail += 1
            continue
        try:
            want_cols, want = table_of(con.sql(oracles[name]))
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if got_cols != want_cols:
            print(f"FAIL {name}: columns engine={got_cols} oracle={want_cols}")
            n_fail += 1
        elif got != want:
            print(f"FAIL {name}: rows engine={len(got)} oracle={len(want)}")
            diffs = [(g, w) for g, w in zip(got, want) if g != w]
            for g, w in diffs[:3]:
                print(f"  engine: {g}\n  oracle: {w}")
            if len(got) != len(want):
                eng, orc = set(got), set(want)
                for r in list(eng - orc)[:3]:
                    print(f"  only-engine: {r}")
                for r in list(orc - eng)[:3]:
                    print(f"  only-oracle: {r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
