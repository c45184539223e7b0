#!/usr/bin/env python3
"""Dev-only parity checker mirroring the driver's DuckDB oracle compare.

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`, run
    python3 scripts/check_parity.py <sfDir> <outDir>

Compares each Spark parquet result in <outDir>/<name>/ against the DuckDB
result of <outDir>/oracle_sql.json[name], with columns sorted by name.
Reports exact row-order match and row-sorted match separately.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    with open(f"{out}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_ok = n_bad = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            duck = con.execute(sql)
            dcols = [c[0] for c in duck.description]
            drows = duck.fetchall()
            sq = con.execute(f"SELECT * FROM '{out}/{name}/*.parquet'")
            scols = [c[0] for c in sq.description]
            srows = sq.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_bad += 1
            continue
        if sorted(dcols) != sorted(scols):
            print(f"FAIL {name}: columns differ spark={sorted(scols)} duck={sorted(dcols)}")
            n_bad += 1
            continue
        dperm = sorted(range(len(dcols)), key=lambda i: dcols[i])
        sperm = sorted(range(len(scols)), key=lambda i: scols[i])
        dr = [tuple(canon(r[i]) for i in dperm) for r in drows]
        sr = [tuple(canon(r[i]) for i in sperm) for r in srows]
        if dr == sr:
            print(f"OK   {name}: {len(sr)} rows (exact order)")
            n_ok += 1
        elif sorted(dr) == sorted(sr):
            print(f"OK?  {name}: {len(sr)} rows match only after row-sort "
                  f"(driver may hash in order — fix the ORDER BY)")
            n_ok += 1
        else:
            n_bad += 1
            print(f"FAIL {name}: spark={len(sr)} rows duck={len(dr)} rows")
            sset, dset = set(sr), set(dr)
            only_s = [r for r in sr if r not in dset][:3]
            only_d = [r for r in dr if r not in sset][:3]
            for r in only_s:
                print(f"       spark-only: {r}")
            for r in only_d:
                print(f"       duck-only : {r}")
            if not only_s and not only_d:
                for i, (a, b) in enumerate(zip(sr, dr)):
                    if a != b:
                        print(f"       first order diff at row {i}:\n"
                              f"         spark={a}\n         duck ={b}")
                        break
    print(f"\n{n_ok} ok, {n_bad} bad, {len(oracle)} total")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
