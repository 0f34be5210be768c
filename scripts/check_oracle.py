#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate: run after
`sbt "runMain graft.Verify <sfDir> <outDir>"`, compares each dumped
parquet against its DuckDB oracle result (exact, like the driver's hash).
Not part of the shipped library.

Usage: python3 scripts/check_oracle.py <sfDir> <outDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} vs {ec}")
            n_bad += 1
            continue
        g = [tuple(norm(v) for v in r) for r in got[gc].itertuples(index=False)]
        e = [tuple(norm(v) for v in r) for r in exp[ec].itertuples(index=False)]
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            n_bad += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, e)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(g)} rows differ; first row "
                  f"{i}:\n  spark={a}\n  duck ={b}\n  cols={gc}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(g)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
