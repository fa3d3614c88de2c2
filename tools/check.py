#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/check.py <sparkOutDir> <sfDir> [query ...]

Reads <sparkOutDir>/oracle_sql.json (written by graft.Verify), registers the
sf tables as DuckDB views, runs each oracle SQL, and compares against the
Spark parquet output in <sparkOutDir>/<name>/ — column names (sorted),
column TYPES (the driver's hash is type-sensitive: DuckDB SUM(BIGINT)
returns HUGEINT and hash-fails against a Spark BIGINT even when every
value matches — r03 shipped three such reds because this script was
value-only), row count, and exact values.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    return v


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        # driver fixtures are single files; repo-generated fixtures
        # (scaling ladder rungs, the reseeded float fixture) are
        # Spark-written DIRECTORIES — DuckDB needs the glob form there
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{path}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        sql = oracles[name]
        try:
            oracle = con.sql(sql)
            ocols = [c.lower() for c in oracle.columns]
            otypes = [str(t) for t in oracle.types]
            orows = oracle.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            spark = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            scols = [c.lower() for c in spark.columns]
            stypes = [str(t) for t in spark.types]
            srows = spark.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {name}: columns oracle={sorted(ocols)} "
                  f"spark={sorted(scols)}")
            n_fail += 1
            continue
        # driver sorts columns by name before hashing values
        operm = sorted(range(len(ocols)), key=lambda i: ocols[i])
        sperm = sorted(range(len(scols)), key=lambda i: scols[i])
        # type check first: the driver's hash sees HUGEINT != BIGINT even
        # when the values are identical
        tbad = [(ocols[oi], otypes[oi], stypes[si])
                for oi, si in zip(operm, sperm) if otypes[oi] != stypes[si]]
        if tbad:
            for c, ot, st in tbad:
                print(f"FAIL {name}: type mismatch on '{c}': "
                      f"oracle={ot} spark={st}")
            n_fail += 1
            continue
        orows = [tuple(canon(r[i]) for i in operm) for r in orows]
        srows = [tuple(canon(r[i]) for i in sperm) for r in srows]
        if len(orows) != len(srows):
            print(f"FAIL {name}: rows oracle={len(orows)} spark={len(srows)}")
            n_fail += 1
            continue
        bad = None
        for i, (o, s) in enumerate(zip(orows, srows)):
            if o != s:
                bad = (i, o, s)
                break
        if bad:
            i, o, s = bad
            print(f"FAIL {name}: first diff at row {i}:")
            print(f"  cols   {sorted(ocols)}")
            print(f"  oracle {o}")
            print(f"  spark  {s}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(orows)} rows)")
            n_pass += 1
    # approx_err.json (written by graft.Verify): the measured numeric
    # error of the rows-only sketch/codec entries, each with its
    # documented bound — a measurement over its bound is a FAIL, so the
    # no-oracle entries are certified, not merely row-counted. Verify
    # writes the file unconditionally (err=null for a measurement that
    # crashed), so a MISSING file on an unrestricted run means Verify
    # itself died before the dump — count that as a FAIL too.
    err_file_missing = False
    try:
        with open(f"{out_dir}/approx_err.json") as f:
            errs = json.load(f)
    except FileNotFoundError:
        errs = {}
        err_file_missing = True
        if not only:
            print("FAIL approx_err.json missing (Verify did not finish)")
            n_fail += 1
    # unrestricted runs also validate the file's KEYS against the
    # manifest Verify writes from the full (unfiltered) approxErrors
    # inventory: a subset Verify run merges now, but a file that
    # nevertheless lost entries (older Verify, hand edit, crash between
    # the two writes) must fail here BY NAME — the missing-file check
    # alone cannot see missing entries (r12 ADVICE).
    # ... unless approx_err.json itself was missing: one FAIL already
    # names that root cause, and a per-name FAIL for every expected
    # entry would bury it under dozens of consequences (r13 ADVICE).
    if not only and not err_file_missing:
        try:
            with open(f"{out_dir}/approx_manifest.json") as f:
                expected = json.load(f)
        except FileNotFoundError:
            expected = []
            print("FAIL approx_manifest.json missing (Verify did not "
                  "finish, or predates the manifest)")
            n_fail += 1
        for name in expected:
            if name not in errs:
                print(f"FAIL {name} missing from approx_err.json "
                      "(entry dropped — subset overwrite or crash)")
                n_fail += 1
    for name in sorted(errs):
        if only and name not in only:
            continue
        e, bound = errs[name]["err"], errs[name]["bound"]
        if e is None:
            print(f"FAIL {name} approx err measurement crashed (err=null)")
            n_fail += 1
        elif e <= bound:
            print(f"PASS {name} approx err={e:.6f} <= bound {bound}")
            n_pass += 1
        else:
            print(f"FAIL {name} approx err={e:.6f} > bound {bound}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
