"""Optimization-round profiler: for each named registry query, dump the
AQE-finalized ``explain("formatted")`` plan into plans/<tag>/<query>_<suffix>.txt
and time the query (best of 2, same collect() methodology as bench.py,
plus a noop-sink timing that isolates computation from result transfer —
guide §1.4).

Usage: python tools/opt_profile.py --tag r16 --suffix before [--sf SF_DIR] q1 q2 ...

The plan is captured AFTER one execution so AQE's final plan (join
strategy rewrites, coalesced reads) is what lands in the artifact, via
df._sc / InsertAdaptiveSparkPlan being resolved on the executed plan.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r16")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from ai_etl_pipeline_spark.session import get_session

    import __spark_entry__ as entrymod

    spark = get_session("opt-profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()  # warm-up

    qs = entrymod.queries()
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.tag,
    )
    os.makedirs(outdir, exist_ok=True)

    for name in args.queries:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"opt-profile {name}")
        # timed exactly like bench.py (collect, best of 2)
        best_collect, n = None, 0
        for _ in range(2):
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf)
            n = len(df.collect())
            el = time.perf_counter() - t0
            best_collect = el if best_collect is None else min(best_collect, el)
        # noop-sink timing: computation only, no driver transfer (§1.4)
        t0 = time.perf_counter()
        df = qs[name](spark, args.sf)
        df.write.format("noop").mode("overwrite").save()
        noop_s = time.perf_counter() - t0
        # capture the executed plan (AQE-final where the df was executed)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(
                f"# {name} @ {args.sf} — collect best-of-2 {best_collect:.3f}s"
                f" ({n} rows), noop-sink {noop_s:.3f}s\n\n"
            )
            fh.write(plan)
        ex = plan.count("Exchange")
        reused = plan.count("ReusedExchange")
        print(
            f"{name}: collect={best_collect:.3f}s noop={noop_s:.3f}s rows={n} "
            f"Exchange={ex} (reused {reused}) "
            f"BHJ={plan.count('BroadcastHashJoin')} SMJ={plan.count('SortMergeJoin')} "
            f"pyeval={plan.count('EvalPython') + plan.count('MapInPandas') + plan.count('MapInArrow')}"
        )
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
