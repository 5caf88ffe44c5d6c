"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
at the given sf, then compares row count, sorted column names, and the
order-insensitive multiset of row values (columns sorted by name, floats
compared exactly — the driver hashes values, so near-misses are failures here
too).

Usage: python tools/verify_contract.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def main() -> int:
    import __spark_entry__ as entrymod
    from cognee_graphdb_spark.session import get_spark

    spark = get_spark("verify-contract")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    failures = []

    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF)
            spark_cols = sorted(df.columns)
            spark_rows = df.collect()
        except Exception:
            print(f"FAIL {name}: spark error\n{traceback.format_exc()}")
            n_fail += 1
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(spark_rows)} rows  ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = sorted(d[0] for d in res.description)
            duck_rows = res.fetchall()
        except Exception:
            print(f"FAIL {name}: duckdb error\n{traceback.format_exc()}")
            n_fail += 1
            failures.append(name)
            continue
        ok = True
        msgs = []
        if len(spark_rows) != len(duck_rows):
            ok = False
            msgs.append(f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
        if spark_cols != duck_cols:
            ok = False
            msgs.append(f"cols spark={spark_cols} duck={duck_cols}")
        if ok:
            s = rowset(df.columns, [tuple(r) for r in spark_rows])
            d = rowset([c[0] for c in res.description], duck_rows)
            if s != d:
                ok = False
                diff_s = [r for r in s if r not in set(map(tuple, d))][:3]
                diff_d = [r for r in d if r not in set(map(tuple, s))][:3]
                msgs.append(f"values differ; spark-only={diff_s} duck-only={diff_d}")
        if ok:
            print(f"PASS {name}: {len(spark_rows)} rows  ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL {name}: " + "; ".join(msgs))
            n_fail += 1
            failures.append(name)

    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only ==")
    if failures:
        print("failures:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
