"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
names, and order-insensitive values.

Canonicalization deliberately mirrors the DRIVER, not a lenient local
ideal (round-1 lesson: the old gate unified ints-with-floats and
stringified list cells, which hid exactly the two driver failures):

- both sides are materialized as *pandas* frames (``toPandas()`` /
  ``rel.df()``) so type-coercion artifacts the driver sees — e.g.
  DuckDB HUGEINT landing as float64 ``8963.0`` vs Spark bigint
  ``8963`` — surface locally too;
- rows are sorted with ``DataFrame.sort_values`` (crashes on list
  cells exactly like the driver's canonicalizer → reported FAIL);
- values are compared after ``astype(str)`` with NO int/float
  unification.

Usage: python tools/check_parity.py [sf_dir] [query ...]
       python tools/check_parity.py --artifact PATH [sf_dir] [query ...]

``--artifact PATH`` additionally writes every result line to PATH via a
dedicated file handle. Round-7 lesson: capturing stdout loses lines —
Spark progress bars interleave carriage returns into the same stream,
so a shell redirect of this script's output ate 8 of 192 PASS lines.
The artifact handle never shares a stream with Spark.

Round-15 lesson (r14 verdict What's wrong #2): the r14 committed
artifact said "0 failures / 294 checked" but held only 284 result
lines — so the artifact is now SELF-VERIFIED: after closing, the file
is re-read and the count of PASS/FAIL/okay lines must equal the number
of queries checked (plus unknown-query FAILs), or the run exits 1 with
a loud ARTIFACT SELF-CHECK FAILED message instead of committing a
trailer that overstates its own contents.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def frame_signature(pdf):
    """Driver-style canonical form: columns sorted by name, rows sorted,
    every cell stringified via pandas ``astype(str)``.

    Raises TypeError on unsortable (list/dict) cells — the same failure
    mode as the driver's pandas canonicalizer, so queries returning raw
    array columns FAIL here instead of passing silently.
    """
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns), kind="mergesort")
    spdf = pdf.astype(str)
    rows = sorted(map(tuple, spdf.itertuples(index=False, name=None)))
    return list(pdf.columns), rows


def main() -> int:
    import duckdb
    from ai_etl_pipeline_spark.session import get_session

    import __spark_entry__ as entrymod

    argv = sys.argv[1:]
    artifact = None
    if "--artifact" in argv:
        i = argv.index("--artifact")
        artifact = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])
    art_fh = open(artifact, "w") if artifact else None

    def emit(line: str) -> None:
        print(line)
        if art_fh is not None:
            art_fh.write(line.rstrip("\n") + "\n")
            art_fh.flush()

    spark = get_session("parity-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    n_checked = 0
    unknown = sorted(only - set(qs))
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_checked += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as e:
            failures.append(name)
            emit(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            # Rows-only queries still go through the driver's pandas
            # canonicalizer — run it here too, so a result the driver
            # cannot canonicalize (duplicate column names, list cells)
            # FAILs locally instead of printing "okay" (round-2 lesson:
            # q_pipeline_mapping crashed the driver but passed this gate).
            try:
                frame_signature(spark_pdf)
            except (TypeError, ValueError) as e:
                failures.append(name)
                emit(f"FAIL {name}: rows-only result not canonicalizable "
                      f"(driver would crash): {type(e).__name__}: {e}")
                continue
            emit(
                f"okay {name}: rows-only ({len(spark_pdf)} rows, "
                f"{time.time()-t0:.1f}s)"
            )
            continue
        try:
            duck_pdf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            emit(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            continue
        try:
            sc, sv = frame_signature(spark_pdf)
        except (TypeError, ValueError) as e:
            failures.append(name)
            emit(f"FAIL {name}: spark result not canonicalizable "
                  f"(driver would crash): {e}")
            continue
        try:
            dc, dv = frame_signature(duck_pdf)
        except (TypeError, ValueError) as e:
            failures.append(name)
            emit(f"FAIL {name}: oracle result not canonicalizable "
                  f"(driver would crash): {e}")
            continue
        if sc != dc:
            failures.append(name)
            emit(f"FAIL {name}: columns differ\n  spark={sc}\n  duck ={dc}")
            continue
        if len(sv) != len(dv):
            failures.append(name)
            emit(f"FAIL {name}: row count spark={len(sv)} duck={len(dv)}")
            continue
        if sv != dv:
            failures.append(name)
            bad = [(a, b) for a, b in zip(sv, dv) if a != b][:3]
            emit(f"FAIL {name}: values differ; first diffs:")
            for a, b in bad:
                emit(f"  spark={a}\n  duck ={b}")
            continue
        emit(f"PASS {name} ({len(sv)} rows, {time.time()-t0:.1f}s)")
    for name in unknown:
        failures.append(name)
        emit(f"FAIL {name}: not in the registry")
    print()
    emit(f"{len(failures)} failures / {n_checked} checked")
    if failures:
        emit("failed: " + " ".join(failures))
    if art_fh is not None:
        art_fh.close()
        # artifact self-check (r14 verdict #2): one result line per
        # checked query must actually be ON DISK — an artifact whose
        # trailer overstates its contents is worse than no artifact
        expected = n_checked + len(unknown)
        with open(artifact) as fh:
            lines = fh.read().splitlines()
        got = sum(
            1 for ln in lines
            if ln.startswith(("PASS ", "FAIL ", "okay "))
        )
        has_trailer = any(" checked" in ln and "failures / " in ln for ln in lines)
        if got != expected or not has_trailer:
            print(
                f"ARTIFACT SELF-CHECK FAILED: {artifact} has {got} result "
                f"lines (expected {expected}), trailer present: {has_trailer}"
            )
            return 1
        print(f"artifact self-check OK: {got}/{expected} result lines present")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
