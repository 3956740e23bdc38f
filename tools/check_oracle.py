#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the engine
itself is pure Scala/Spark).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query parquet dumped by graft.Verify, runs the matching oracle SQL
from oracle_sql.json in DuckDB over views named after the sfDir tables, then
compares the way the driver does: both sides through pandas, rows sorted by
all columns (sorted column order), then value-AND-dtype-sensitive equality.
A DuckDB HUGEINT (pandas float64/object) vs Spark int64 is a FAIL here even
when the values are numerically equal — that's exactly what the driver's
hash sees (r1 postmortem: corpus_mixture / quality_profile / json_funcs).
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df):
    cols = sorted(df.columns)
    df = df[cols]
    try:
        df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    except TypeError as e:  # driver's pandas lexsort dies the same way
        raise RuntimeError(f"unsortable output (driver would crash): {e}")
    return df


def compare(name, sdf, ddf):
    if sorted(sdf.columns) != sorted(ddf.columns):
        return f"SCHEMA MISMATCH spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}"
    try:
        s, d = normalize(sdf), normalize(ddf)
    except RuntimeError as e:
        return str(e)
    if len(s) != len(d):
        return f"ROWCOUNT MISMATCH spark={len(s)} duck={len(d)}"
    def kind(dt):
        # the driver's hash is insensitive to integer WIDTH (int32 vs int64
        # both passed r1) but float64-vs-int64 failed — compare by kind
        k = dt.kind  # i/u int, f float, O object, b bool, M datetime
        return "i" if k == "u" else k

    for c in s.columns:
        if kind(s[c].dtype) != kind(d[c].dtype):
            return f"DTYPE MISMATCH col={c} spark={s[c].dtype} duck={d[c].dtype} (driver hash would differ)"
    worst = 0.0
    for c in s.columns:
        sv, dv = s[c].tolist(), d[c].tolist()
        for a, b in zip(sv, dv):
            if a is None and b is None:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                diff = abs(a - b)
                if diff > worst:
                    worst = diff
            elif a != b and not (a != a and b != b):  # NaN-safe
                return f"VALUE MISMATCH col={c}: {a!r} vs {b!r}"
    if worst > 0:
        return f"FLOAT DIFF max={worst:g} (hash fails on any repr diff)"
    return None


def main(sf_dir, out_dir):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import glob

    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark output")
            fail += 1
            continue
        # fresh connection per query: an OOM in one heavy oracle must not
        # poison the allocator for every query after it (observed at sf0.1
        # on a commit-limited box), and the cap keeps any single oracle's
        # spike inside the commit limit instead of taking the process down
        con = duckdb.connect()
        con.execute("SET memory_limit='24GB'")
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        sdf = con.execute(f"SELECT * FROM read_parquet({files!r})").df()
        try:
            ddf = con.execute(sql).df()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            fail += 1
            con.close()
            continue
        err = compare(name, sdf, ddf)
        if err:
            print(f"FAIL     {name}: {err}")
            fail += 1
        else:
            print(f"ok       {name}  ({len(sdf)} rows)")
            ok += 1
        con.close()
    print(f"\n{ok} ok, {fail} failed")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
