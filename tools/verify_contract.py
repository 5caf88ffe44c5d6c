"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
at the given sf, then compares row count, sorted column names, per-column
*types* (DuckDB Arrow schema vs Spark dtype, mapped to families — the driver's
value hash is type-sensitive, so a DuckDB HUGEINT/DECIMAL column against a
Spark BIGINT fails there even when the values print identically), and the
order-insensitive multiset of row values (columns sorted by name, floats
compared exactly — the driver hashes values, so near-misses are failures here
too). Oracle rows are materialized via Arrow (not fetchall) so type-lossy
Python conversions can't mask a skew.

Usage: python tools/verify_contract.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import duckdb
import pyarrow as pa

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


def arrow_family(t: pa.DataType) -> str:
    """Collapse an Arrow type to a comparison family (widening within a family
    is fine for the driver's serialization; crossing families is not)."""
    if pa.types.is_null(t):
        return "null"  # all-NULL column — compatible with anything
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return "list"
    if pa.types.is_struct(t) or pa.types.is_map(t):
        return "struct"
    return str(t)


def spark_family(dt: str) -> str:
    dt = dt.lower()
    if dt in ("tinyint", "smallint", "int", "bigint", "long", "integer", "short", "byte"):
        return "int"
    if dt in ("float", "double"):
        return "float"
    if dt.startswith("decimal"):
        return "decimal"
    if dt == "boolean":
        return "bool"
    if dt in ("string", "varchar"):
        return "string"
    if dt == "binary":
        return "binary"
    if dt.startswith("timestamp"):
        return "timestamp"
    if dt == "date":
        return "date"
    if dt.startswith("array"):
        return "list"
    if dt.startswith("struct") or dt.startswith("map"):
        return "struct"
    if dt == "void":
        return "null"
    return dt


def type_mismatches(spark_dtypes, arrow_schema):
    """Column-name-matched family comparison; returns list of human messages."""
    spark_by_name = {name: spark_family(dt) for name, dt in spark_dtypes}
    msgs = []
    for field in arrow_schema:
        sf_fam = spark_by_name.get(field.name)
        if sf_fam is None:
            continue  # column-name mismatch is reported separately
        of_fam = arrow_family(field.type)
        if "null" in (sf_fam, of_fam):
            continue
        if sf_fam != of_fam:
            msgs.append(
                f"type skew on '{field.name}': spark={sf_fam} oracle={of_fam} ({field.type})"
            )
    return msgs


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
            tbl = con.execute(oracles[name]).fetch_arrow_table()
            duck_colnames = list(tbl.column_names)
            duck_cols = sorted(duck_colnames)
            col_data = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
            duck_rows = list(zip(*col_data)) if tbl.num_columns else []
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
        tmsgs = type_mismatches(df.dtypes, tbl.schema)
        if tmsgs:
            ok = False
            msgs.extend(tmsgs)
        if ok:
            s = rowset(df.columns, [tuple(r) for r in spark_rows])
            d = rowset(duck_colnames, duck_rows)
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
