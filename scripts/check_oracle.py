#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the sfDir
parquet tables, sorts columns by name and rows by all values, and compares
exactly. Prints per-query status and a final "N ok, M failed" line.
"""
import datetime
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    # the driver compares through pandas, where DATE and midnight
    # TIMESTAMP both become datetime64[ns] — mirror that equivalence
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return datetime.datetime(v.year, v.month, v.day).isoformat(sep=" ")
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def canon(cols, rows):
    # columns sort by name (mirrors the driver); rows stay POSITIONAL —
    # every declared query ends in a total ORDER BY, so an ordering
    # regression must fail here, not be sorted away
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], out


def type_lint(con, oracle_sql):
    """DESCRIBE every oracle and reject output types the driver's pandas
    hash treats differently from Spark's (HUGEINT/UHUGEINT from bare
    sum(BIGINT), DECIMAL) — dtype mismatches that the value-stringifying
    comparison below cannot see. Runs over ALL registry entries regardless
    of the query filter so the class can't recur on unselected queries."""
    bad = 0
    for name in sorted(oracle_sql):
        try:
            desc = con.execute(f"DESCRIBE {oracle_sql[name]}").fetchall()
        except Exception as e:
            print(f"TYPELINT-FAIL {name}: DESCRIBE error {e}")
            bad += 1
            continue
        offending = [(c, t) for c, t, *_ in desc
                     if "HUGEINT" in t.upper() or "DECIMAL" in t.upper()]
        if offending:
            print(f"TYPELINT-FAIL {name}: un-cast wide output columns "
                  f"{offending} — CAST them (AS BIGINT/DOUBLE) in the oracle")
            bad += 1
    return bad


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle_sql = json.load(open(f"{out_dir}/oracle_sql.json"))
    unknown = only - set(oracle_sql)
    if unknown:
        print(f"FAIL unknown query name(s) in filter: {sorted(unknown)}")
        sys.exit(1)
    lint_failed = type_lint(con, oracle_sql)
    ok = failed = 0
    for name in sorted(oracle_sql):
        if only and name not in only:
            continue
        sql = oracle_sql[name]
        try:
            sdf = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols, srows = sdf.description, sdf.fetchall()
            scols = [c[0] for c in scols]
            odf = con.execute(sql)
            ocols, orows = [c[0] for c in odf.description], odf.fetchall()
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            failed += 1
            continue
        sc, sr = canon(scols, srows)
        oc, orr = canon(ocols, orows)
        if sc != oc:
            print(f"FAIL {name}: columns spark={sc} oracle={oc}")
            failed += 1
        elif len(sr) != len(orr):
            print(f"FAIL {name}: rows spark={len(sr)} oracle={len(orr)}")
            failed += 1
        elif sr != orr:
            diff = next(i for i, (a, b) in enumerate(zip(sr, orr)) if a != b)
            print(f"FAIL {name}: first diff at sorted row {diff}:\n"
                  f"  spark : {sr[diff]}\n  oracle: {orr[diff]}")
            failed += 1
        else:
            print(f"ok   {name} ({len(sr)} rows)")
            ok += 1
    print(f"{ok} ok, {failed} failed, {lint_failed} type-lint failures")
    sys.exit(1 if failed or lint_failed else 0)


if __name__ == "__main__":
    main()
