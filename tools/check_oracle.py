#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the engine
itself is pure Scala/Spark).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query parquet dumped by graft.Verify, runs the matching oracle SQL
from oracle_sql.json in DuckDB over views named after the sfDir tables, then
compares: column names (sorted), row counts, and values (rows sorted, exact
for ints/strings, tiny-epsilon report for floats).
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows):
    # sort key is type-tagged strings so NULL/float/str mixes cannot crash
    # the sort; equality comparison below still sees the raw values
    return sorted(
        (tuple("NULL" if v is None else v for v in r) for r in rows),
        key=lambda r: tuple(str(v) for v in r),
    )


def compare(name, spark_rows, spark_cols, duck_rows, duck_cols):
    if sorted(spark_cols) != sorted(duck_cols):
        return f"SCHEMA MISMATCH spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    # reorder both to sorted column order
    sidx = [spark_cols.index(c) for c in sorted(spark_cols)]
    didx = [duck_cols.index(c) for c in sorted(duck_cols)]
    s = canon([[r[i] for i in sidx] for r in spark_rows])
    d = canon([[r[i] for i in didx] for r in duck_rows])
    if len(s) != len(d):
        return f"ROWCOUNT MISMATCH spark={len(s)} duck={len(d)}"
    worst = 0.0
    for sr, dr in zip(s, d):
        for a, b in zip(sr, dr):
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                diff = abs(a - b)
                if diff > worst:
                    worst = diff
                if diff > 0:
                    pass
            elif a != b:
                return f"VALUE MISMATCH {sr} vs {dr}"
    if worst > 0:
        return f"FLOAT DIFF max={worst:g} (hash would fail if nonzero repr diff)"
    return None


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import glob

    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark output")
            fail += 1
            continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet({files!r})"
        )
        spark_cols = [d[0] for d in sdf.description]
        spark_rows = sdf.fetchall()
        try:
            ddf = con.execute(sql)
            duck_cols = [d[0] for d in ddf.description]
            duck_rows = ddf.fetchall()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            fail += 1
            continue
        err = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
        if err:
            print(f"FAIL     {name}: {err}")
            fail += 1
        else:
            print(f"ok       {name}  ({len(spark_rows)} rows)")
            ok += 1
    print(f"\n{ok} ok, {fail} failed")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
