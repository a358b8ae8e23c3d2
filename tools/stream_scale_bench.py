"""Scale-growth evidence for the STRUCTURED STREAMING tier (r12: the
streaming receipts certify SEMANTICS — watermark eviction, interval-
join state, pandas state stores — at fixed cohort sizes; this curve
shows micro-batch THROUGHPUT tracks the data decade, i.e. the
streaming plans are scan/state-bound, not accumulating anything
super-linear).

Synthetic events (deterministic, from a range scan): n rows spread
over 30 days, 50k users, 8 event types — written once per size as an
8-file parquet dir, then streamed with Trigger.AvailableNow into:

- tumbling_sec:  watermarked 10-minute tumbling window aggregation
                 (append mode, JVM state; state_partitions=8)
- stateful_sec:  applyInPandasWithState per-user running totals
                 (update mode, Arrow state; session parallelism —
                 pandas state wants MANY partitions, the r12 lesson)
- dedup_sec:     watermarked streaming dropDuplicates on event_id

Wall time includes the final no-data batch; the file WRITE is not
billed. Fresh session per size. Usage:
python tools/stream_scale_bench.py [n ...]
(default 100000 1000000 10000000). Artifact:
BENCH_SCALE_r{N}_stream.json; >12×/decade flags.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from ai_etl_pipeline_spark.session import get_session  # noqa: E402
from ai_etl_pipeline_spark.streaming import windows as stream_windows  # noqa: E402


def write_events(spark, n: int) -> str:
    base = tempfile.mkdtemp(prefix=f"streambench_{n}_")
    span = 30 * 24 * 3600
    (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            F.expr(
                f"timestamp_seconds(1700000000 + pmod(xxhash64('t', id), {span}))"
            ).alias("ts"),
            F.expr("pmod(xxhash64('u', id), 50000)").alias("user_id"),
            F.expr(
                "element_at(array('view','click','cart','buy','share','like','rate','hide'),"
                " cast(pmod(xxhash64('e', id), 8) as int) + 1)"
            ).alias("event_type"),
            F.expr(
                "cast(pmod(xxhash64('v', id), 10000) as double) / 100.0"
            ).alias("value"),
            F.lit("").alias("props"),
        )
        .repartition(8)
        .write.mode("overwrite")
        .parquet(base)
    )
    return base


def timed(fn):
    t0 = time.monotonic()
    r = fn()
    return round(time.monotonic() - t0, 2), r


def run_size(spark, n: int) -> dict:
    out: dict = {"n_events": n}
    base = write_events(spark, n)
    try:
        def tumbling():
            stream = stream_windows.read_events_stream(spark, base)
            agg = stream_windows.tumbling_window_agg(
                stream_windows.with_watermark(stream, "30 minutes"), "10 minutes"
            )
            return stream_windows.run_stream_to_memory(
                agg, "append", state_partitions=8
            ).count()

        out["tumbling_sec"], out["tumbling_rows"] = timed(tumbling)

        def stateful():
            from ai_etl_pipeline_spark.streaming.stateful import (
                running_user_totals,
            )

            stream = stream_windows.read_events_stream(spark, base)
            return stream_windows.run_stream_to_memory(
                running_user_totals(stream), "update"
            ).count()

        out["stateful_sec"], out["stateful_rows"] = timed(stateful)

        def dedup():
            stream = stream_windows.read_events_stream(spark, base)
            d = stream_windows.with_watermark(stream, "30 minutes").dropDuplicates(
                ["event_id"]
            )
            return stream_windows.run_stream_to_memory(
                d.groupBy().count(), "complete", state_partitions=8
            ).count()

        out["dedup_sec"], _ = timed(dedup)
        spark.sparkContext._jvm.System.gc()
        time.sleep(2)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000, 10_000_000]
    out = {"metric": "stream_scale", "unit": "sec", "sizes": {}}
    spark = None
    for n in sizes:
        if spark is not None:
            spark.stop()
        spark = get_session(
            "stream-scale-bench",
            extra_conf={"spark.io.compression.codec": "zstd"},
        )
        spark.sparkContext.setLogLevel("ERROR")
        run_size(spark, 20_000)  # warm the exact streaming shapes
        out["sizes"][str(n)] = run_size(spark, n)
        print(json.dumps({"partial": n, **out["sizes"][str(n)]}), flush=True)
    ratios = {}
    flagged = []
    keys = sorted(out["sizes"], key=int)
    for a, b in zip(keys, keys[1:]):
        sa, sb = out["sizes"][a], out["sizes"][b]
        r: dict = {"data_growth": round(sb["n_events"] / sa["n_events"], 1)}
        for k in ("tumbling_sec", "stateful_sec", "dedup_sec"):
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
