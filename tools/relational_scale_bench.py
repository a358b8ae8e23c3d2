"""Relational-tier scale receipt (r10 verdict item #6): run the 22
TPC-H query shapes plus the window/agg/join surface at sf0.01 AND
sf0.1 (one data decade — TPC-H tables and events scale 10x between
them) and record the per-query decade ratio into
BENCH_SCALE_r11_relational.json.

A query growing much faster than the data (ratio >> 10) has a plan
that would not survive a 100x scale-up; the FLAG_RATIO threshold (12x,
the same bar the dedup/graph/text curves use) marks entries needing a
plan diff in PLANS.md. Run on a QUIET box only — concurrent Spark
skews timings 2-10x.

Usage: python tools/relational_scale_bench.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the 22 TPC-H shapes (COVERAGE.md rows; Q-number order)
TPCH = [
    "q_pricing_summary",          # Q1
    "q_min_cost_supplier",        # Q2
    "q_shipping_priority",        # Q3
    "q_late_shipment_priority",   # Q4
    "q_local_supplier_volume",    # Q5
    "q_forecast_revenue",         # Q6
    "q_volume_shipping",          # Q7
    "q_market_share",             # Q8
    "q_product_profit",           # Q9
    "q_returned_items",           # Q10
    "q_part_revenue_share",       # Q11
    "q_priority_line_buckets",    # Q12
    "q_order_distribution",       # Q13
    "q_promo_revenue_share",      # Q14
    "q_top_supplier_revenue",     # Q15
    "q_supplier_part_counts",     # Q16
    "q_small_qty_revenue",        # Q17
    "q_large_orders",             # Q18
    "q_disjunctive_revenue",      # Q19
    "q_bulk_part_suppliers",      # Q20
    "q_last_shipper",             # Q21
    "q_idle_rich_customers",      # Q22
]

# window / agg / set-op / join surface over the scaling tables
RELATIONAL = [
    "q_window_topk_per_customer",
    "q_window_running_total",
    "q_window_frames",
    "q_window_cume_dist",
    "q_agg_stats",
    "q_agg_rollup",
    "q_agg_mode",
    "q_agg_moments",
    "q_agg_bitwise",
    "q_agg_histogram",
    "q_agg_heavy_hitters",
    "q_agg_weighted_median",
    "q_set_union",
    "q_join_broadcast_part",
    "q_join_range_bands",
    "q_join_semi",
    "q_join_anti",
    "q_events_asof_join",
]

FLAG_RATIO = 12.0
SFS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SCALE_r11_relational.json",
    )
    from ai_etl_pipeline_spark.session import get_session

    import __spark_entry__ as entrymod

    spark = get_session("relational-scale")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = [n for n in TPCH + RELATIONAL if n in qs]
    results: dict[str, dict] = {}
    for sf_dir in SFS:
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # warm FS
        for name in names:
            best = None
            for _ in range(2):  # best-of-2: codegen compile off the clock
                t0 = time.perf_counter()
                len(qs[name](spark, sf_dir).collect())
                el = time.perf_counter() - t0
                best = el if best is None else min(best, el)
            results.setdefault(name, {})[sf_dir.split("/")[-1]] = round(best, 3)
            print(f"# {sf_dir.split('/')[-1]} {name}: {best:.3f}s", file=sys.stderr)
    for name, r in results.items():
        r["ratio_per_decade"] = round(r["sf0.1"] / max(r["sf0.01"], 1e-9), 2)
        r["flagged"] = r["ratio_per_decade"] > FLAG_RATIO
    flagged = sorted(n for n, r in results.items() if r["flagged"])
    payload = {
        "metric": "relational_scale_decade",
        "sfs": ["sf0.01", "sf0.1"],
        "flag_ratio": FLAG_RATIO,
        "n_queries": len(results),
        "flagged": flagged,
        "queries": results,
        "note": (
            "decade ratio = wall(sf0.1)/wall(sf0.01), best-of-2 per SF on a"
            " quiet box; TPC-H tables + events scale 10x between the SFs."
            " Sub-10 ratios at this size are dominated by fixed per-job"
            " overhead (~0.3-0.5s/job local[32]); the flag catches plans"
            " growing superlinearly with data."
        ),
    }
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(json.dumps({"flagged": flagged, "n": len(results), "out": out_path}))


if __name__ == "__main__":
    main()
