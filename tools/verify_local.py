#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs each oracle SQL from oracle_sql.json in DuckDB over views of the
sf-dir parquet tables, loads the corresponding Spark result parquet, and
compares: schema (sorted column names), row count, values (columns
sorted by name, rows sorted by all columns) — strict equality, the way a
hash compare would see it — AND the physical pandas dtype of every
column on both sides. The dtype leg exists because the driver hashes
dtype-sensitively: DuckDB sum() returns HUGEINT, which pandas
materializes as float64, so an uncast oracle aggregate hash-reds against
a Spark LongType column even when every value matches (the round-15
text_bpe_train/encode false-green — canon() unified int widths and this
script reported green while the driver saw red).

Usage: verify_local.py <sfDir> <outDir> [key ...]
(outDir must already contain Verify.scala's dumps.)

Set VERIFY_JSON=<path> to additionally write the per-query result map in
the driver's CORRECTNESS_r*.json shape (rows/schema/hash match + row
counts + err), so a self-check artifact can be committed from HEAD
without anyone re-running the 185-query gate to adjudicate it.
"""
import json
import math
import struct
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _fbits(v):
    # Bit-level float identity: distinguishes -0.0 from +0.0 the way the
    # driver's bitwise hash does (a plain == compare false-greened the
    # round-13 embedding_project_rp red). NaN canonicalized to one pattern.
    if math.isnan(v):
        return "f:NaN"
    return "f:" + struct.pack("<d", v).hex()


def canon(v):
    # fetch() materializes via pandas, so scalars arrive as NUMPY
    # generics (np.int64 is not int, np.bool_ is not bool) and DuckDB
    # LIST columns as np.ndarray — unwrap to Python natives FIRST or
    # none of the branches below fire (scalars survived only because
    # both sides share the path; an array-typed oracle column would
    # reach frame()'s sort as ndarray and crash on ambiguous truth).
    import numpy as np
    if isinstance(v, np.generic):
        v = v.item()
    elif isinstance(v, np.ndarray):
        v = list(v)
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return _fbits(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    import datetime
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, int):
        # int/float unify (one engine may widen); floats carry bit identity
        return _fbits(float(v)) if abs(v) < 2**52 else v
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
    record = {}

    def rec(key, rows_match, schema_match, hash_match, s_rows, o_rows, err):
        record[key] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": s_rows,
            "oracle_rows": o_rows, "err": err,
        }

    def fetch(cur):
        # ONE materialization per side, through DuckDB→pandas — exactly
        # the driver's path. Both the value rows and the per-column
        # dtype map derive from it (the r16 version re-executed each
        # side a second time just for dtypes). Values therefore carry
        # the pandas representation (numpy scalars, NaN-for-NULL in
        # float columns) — MORE driver-faithful than the old fetchall
        # natives, and cross-width unification in canon() is no longer
        # load-bearing because the dtype gate below requires identical
        # widths before any value compares.
        df = cur.fetch_df()
        cols = list(df.columns)
        dtypes = {c: str(df[c].dtype) for c in cols}
        rows = [tuple(r) for r in df.itertuples(index=False, name=None)]
        return cols, dtypes, rows

    for key in sorted(oracles):
        if only and key not in only:
            continue
        sql = oracles[key]
        try:
            ocols, ot, orows = fetch(con.execute(sql))
        except Exception as e:
            failed.append((key, f"oracle error: {e}"))
            rec(key, False, False, False, None, None, f"oracle error: {e}")
            continue
        try:
            scols, st, srows = fetch(con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{key}/*.parquet')"))
        except Exception as e:
            failed.append((key, f"spark result missing: {e}"))
            rec(key, False, False, False, None, len(orows), f"spark result missing: {e}")
            continue
        # Physical dtype leg: int32 vs int64 vs float64 widths change
        # the driver's bitwise hash even when canon() sees equal numbers.
        if ot != st:
            diff = {c: (st.get(c), ot.get(c))
                    for c in sorted(set(ot) | set(st)) if st.get(c) != ot.get(c)}
            failed.append((key, f"dtype mismatch (spark, oracle): {diff}"))
            rec(key, len(srows) == len(orows), sorted(ot) == sorted(st), False,
                len(srows), len(orows), f"dtype mismatch (spark, oracle): {diff}")
            continue
        oc, orws = frame(ocols, orows)
        sc, srws = frame(scols, srows)
        if oc != sc:
            failed.append((key, f"schema mismatch: spark={sc} oracle={oc}"))
            rec(key, len(srws) == len(orws), False, False, len(srws), len(orws),
                f"schema mismatch: spark={sc} oracle={oc}")
            continue
        if len(orws) != len(srws):
            failed.append((key, f"row count: spark={len(srws)} oracle={len(orws)}"))
            rec(key, False, True, False, len(srws), len(orws), None)
            continue
        bad = None
        for i, (a, b) in enumerate(zip(srws, orws)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            failed.append((key, f"value mismatch at sorted-row {bad[0]}:\n  spark ={bad[1]}\n  oracle={bad[2]}"))
            rec(key, True, True, False, len(srws), len(orws),
                f"value mismatch at sorted-row {bad[0]}")
        else:
            passed.append(key)
            rec(key, True, True, True, len(srws), len(orws), None)
    for k in passed:
        print(f"PASS {k}")
    for k, why in failed:
        print(f"FAIL {k}: {why}")
    print(f"\n{len(passed)} passed, {len(failed)} failed")
    import os
    out_json = os.environ.get("VERIFY_JSON")
    if out_json:
        with open(out_json, "w") as f:
            json.dump(dict(sorted(record.items())), f, indent=2)
        print(f"wrote {out_json} ({len(record)} queries)")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
