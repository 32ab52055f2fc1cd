#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs each oracle SQL from oracle_sql.json in DuckDB over views of the
sf-dir parquet tables, loads the corresponding Spark result parquet, and
compares: schema (sorted column names), row count, and values (columns
sorted by name, rows sorted by all columns) — strict equality, the way a
hash compare would see it.

Usage: verify_local.py <sfDir> <outDir> [key ...]
(outDir must already contain Verify.scala's dumps.)
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    import datetime
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, int):
        return float(v) if abs(v) < 2**52 else v  # int/float unify like a pandas hash would not; keep simple
    return v


def frame(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), x if not isinstance(x, tuple) else str(x)) for x in t))
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    passed, failed, skipped = [], [], []
    for key in sorted(oracles):
        if only and key not in only:
            continue
        sql = oracles[key]
        try:
            ocur = con.execute(sql)
            ocols = [d[0] for d in ocur.description]
            orows = ocur.fetchall()
        except Exception as e:
            failed.append((key, f"oracle error: {e}"))
            continue
        try:
            scur = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{key}/*.parquet')")
            scols = [d[0] for d in scur.description]
            srows = scur.fetchall()
        except Exception as e:
            failed.append((key, f"spark result missing: {e}"))
            continue
        oc, orws = frame(ocols, orows)
        sc, srws = frame(scols, srows)
        if oc != sc:
            failed.append((key, f"schema mismatch: spark={sc} oracle={oc}"))
            continue
        if len(orws) != len(srws):
            failed.append((key, f"row count: spark={len(srws)} oracle={len(orws)}"))
            continue
        bad = None
        for i, (a, b) in enumerate(zip(srws, orws)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            failed.append((key, f"value mismatch at sorted-row {bad[0]}:\n  spark ={bad[1]}\n  oracle={bad[2]}"))
        else:
            passed.append(key)
    for k in passed:
        print(f"PASS {k}")
    for k, why in failed:
        print(f"FAIL {k}: {why}")
    print(f"\n{len(passed)} passed, {len(failed)} failed")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
