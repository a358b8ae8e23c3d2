"""Benchmark harness: runs EVERY registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
COMPACT JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"sf": ..., "n_queries": N, "slowest": {top-8 map}, "detail": path}.
Exclusions (EXCLUDED below) carry a written reason and are emitted into
BENCH_DETAIL.json — a coverage gap is visible, never silent.

The full per-query timing map goes to BENCH_DETAIL.json next to this
script, NOT the stdout line: at 160+ queries the inline map overflowed
the driver's tail-capture window and round 6's headline number was
recorded as "parsed": null. The stdout line is bounded (~500 bytes)
regardless of how many queries the registry grows to.

Timing = full query execution to a driver-side collect (results are
small aggregates / bounded row sets). Session build time excluded; one
warm-up action runs first so JVM/codegen startup isn't billed to q1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# r11 (verdict item #5): bench the FULL registry, not a hand-kept
# headline list — every queries() entry runs unless it appears in
# EXCLUDED with a written reason (the exclusion list + reasons land in
# BENCH_DETAIL.json so the gap is visible, never silent).
EXCLUDED: dict[str, str] = {}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from ai_etl_pipeline_spark.session import get_session

    import __spark_entry__ as entrymod

    spark = get_session("bench")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up: touch the biggest table so startup cost is off the clock
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in qs:
        if name in EXCLUDED:
            continue
        # best of 2: the first run pays codegen compile and is exposed to
        # shared-host load spikes; min() measures the engine, not the host
        best, n = None, 0
        for _ in range(2):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            n = len(df.collect())
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    sf = sf_dir.rstrip("/").split("sf")[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    total = round(sum(timings.values()), 3)
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(
            {
                "metric": "headline_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "excluded": EXCLUDED,
                "sf": sf_val,
            },
            fh,
            indent=1,
            sort_keys=True,
        )
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:8]
    )
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(timings),
                "slowest": slowest,
                "detail": "BENCH_DETAIL.json",
            }
        )
    )


if __name__ == "__main__":
    main()
