"""Scale-growth evidence for the CDC / lakehouse tier (r12: the
versioned copy-on-write store, its change feed, and incremental
join-view maintenance gained operators this round; this curve shows
their costs track BATCH size and file-granularity, not table size,
as the table decades).

Per table size (rows; 16 data files per version, so file granularity
is table_rows/16):
- write_sec:       versioned_write of the full table (the one
                   genuinely O(table) step — the initial load)
- upsert_sec:      versioned_upsert of a FIXED 200-key update batch.
                   Cost = one probe scan (map-only, metadata column +
                   broadcast semi-join) + rewrite of the touched files
                   (~batch-proportional file count) — expected to grow
                   well below the data decade.
- feed_sec:        change_feed(v1, v2) — MANIFEST-PRUNED: reads only
                   retired+added files, so expected ~FLAT.
- feed_rows:       exactly the 200 updates at every size (phantom rows
                   from rewritten-but-unchanged neighbors must cancel).
- join_delta_sec:  cdc.join_delta with a fixed 1000-row insert batch
                   per side against the table-sized base — two base
                   scans with broadcast deltas, expected ~linear
                   (scan-bound), never quadratic.

Deterministic synthetic rows (id, md5-derived payload). Fresh session
per size; System.gc() between ops. Usage:
python tools/cdc_scale_bench.py [n ...] (default 100000 1000000 10000000)
Artifact: BENCH_SCALE_r{N}_cdc.json. Growth >12×/decade flags.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from ai_etl_pipeline_spark.operators import cdc  # noqa: E402
from ai_etl_pipeline_spark.session import get_session  # noqa: E402
from ai_etl_pipeline_spark.sources import versioned  # noqa: E402

N_FILES = 16
UPSERT_KEYS = 200
DELTA_ROWS = 1000


def build_table(spark, n: int):
    return spark.range(n).select(
        F.col("id").alias("k"),
        F.md5(F.col("id").cast("string")).alias("payload"),
        (F.col("id") % 1000).alias("grp"),
    )


def timed(fn):
    t0 = time.monotonic()
    r = fn()
    return round(time.monotonic() - t0, 2), r


def release_shuffles(spark) -> None:
    spark.sparkContext._jvm.System.gc()
    time.sleep(2)


def run_size(spark, n: int) -> dict:
    out: dict = {"n_rows": n}
    base = tempfile.mkdtemp(prefix=f"cdcbench_{n}_")
    try:
        tbl = build_table(spark, n)
        t, _ = timed(lambda: versioned.versioned_write(tbl, base, n_files=N_FILES))
        out["write_sec"] = t
        release_shuffles(spark)

        upd = spark.range(UPSERT_KEYS).select(
            (F.col("id") * (n // UPSERT_KEYS)).alias("k"),
            F.lit("UPDATED").alias("payload"),
            F.lit(-1).cast("bigint").alias("grp"),
        )
        t, v2 = timed(lambda: versioned.versioned_upsert(spark, base, upd, ["k"]))
        out["upsert_sec"] = t
        release_shuffles(spark)

        t, rows = timed(
            lambda: versioned.change_feed(spark, base, 1, v2, ["k"]).count()
        )
        out["feed_sec"], out["feed_rows"] = t, rows
        release_shuffles(spark)

        # IVM: fixed insert batches against the table-sized base
        left = tbl.select("k", "payload")
        right = tbl.select("k", "grp")
        dl = spark.range(DELTA_ROWS).select(
            (F.col("id") + n).alias("k"), F.lit("dl").alias("payload")
        )
        dr = spark.range(DELTA_ROWS).select(
            (F.col("id") + n).alias("k"), F.lit(-2).cast("bigint").alias("grp")
        )
        t, nd = timed(
            lambda: cdc.join_delta(left, dl, right, dr, on=["k"]).count()
        )
        out["join_delta_sec"], out["join_delta_rows"] = t, nd
        release_shuffles(spark)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


def fresh_session():
    spark = get_session(
        "cdc-scale-bench",
        extra_conf={
            "spark.io.compression.codec": "zstd",
            "spark.io.compression.zstd.level": "3",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000, 10_000_000]
    out = {"metric": "cdc_scale", "unit": "sec", "sizes": {}}
    spark = None
    for n in sizes:
        if spark is not None:
            spark.stop()
        spark = fresh_session()
        run_size(spark, 10_000)  # warm the exact op shapes
        out["sizes"][str(n)] = run_size(spark, n)
        print(json.dumps({"partial": n, **out["sizes"][str(n)]}), flush=True)
    ratios = {}
    flagged = []
    keys = sorted(out["sizes"], key=int)
    for a, b in zip(keys, keys[1:]):
        sa, sb = out["sizes"][a], out["sizes"][b]
        r: dict = {"data_growth": round(sb["n_rows"] / sa["n_rows"], 1)}
        for k in ("write_sec", "upsert_sec", "feed_sec", "join_delta_sec"):
            g = round(sb[k] / max(sa[k], 1e-9), 1)
            r[k.replace("_sec", "_growth")] = g
            if g > 12:
                flagged.append({"step": f"{a}->{b}", "op": k, "growth": g})
        ratios[f"{a}->{b}"] = r
    out["growth"] = ratios
    out["flagged"] = flagged
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
