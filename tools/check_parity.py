"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
names, and order-insensitive values (columns sorted by name, rows sorted
by stringified tuple). Floats are compared by repr after the queries'
own rounding — mirroring a value-hash check, not an approx check.

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return repr(float(v))
        return repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat().replace("T", " ")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(normalize_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def frame_signature(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols_sorted = [columns[i] for i in order]
    normalized = sorted(
        tuple(normalize_cell(r[i]) for i in order) for r in rows
    )
    return cols_sorted, normalized


def main() -> int:
    import duckdb
    from ai_etl_pipeline_spark.session import get_session

    import __spark_entry__ as entrymod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = get_session("parity-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_rows = [tuple(r) for r in sdf.collect()]
            spark_cols = list(sdf.columns)
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"okay {name}: rows-only ({len(spark_rows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            duck_cols = list(rel.columns)
            duck_rows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            continue
        sc, sv = frame_signature(spark_cols, spark_rows)
        dc, dv = frame_signature(duck_cols, duck_rows)
        if sc != dc:
            failures.append(name)
            print(f"FAIL {name}: columns differ\n  spark={sc}\n  duck ={dc}")
            continue
        if len(sv) != len(dv):
            failures.append(name)
            print(f"FAIL {name}: row count spark={len(sv)} duck={len(dv)}")
            continue
        if sv != dv:
            failures.append(name)
            bad = [(a, b) for a, b in zip(sv, dv) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs:")
            for a, b in bad:
                print(f"  spark={a}\n  duck ={b}")
            continue
        print(f"PASS {name} ({len(sv)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures / {len(only) if only else len(qs)} checked")
    if failures:
        print("failed:", " ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
