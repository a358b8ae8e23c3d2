"""Scale-growth evidence for the ITERATIVE-JOIN graph tier (r11
verdict task #2: dedup and the relational tier have decade curves;
the iterative operators — PageRank power iteration, connected
components with edge contraction, k-core peeling, degree-ordered
triangles — did not, and iterative shuffles are exactly where 100×
breaks first: lineage growth, checkpoint cadence, skewed hubs).

The synthetic graph is DETERMINISTIC and HUB-SKEWED by construction:
edge i connects ``src = floor(u_i² · n_nodes)`` (quadratic bias — the
density of node j falls off as ~1/√j, so low ids are heavy hubs; the
top node collects ~√n_nodes× the average degree) to a uniform ``dst``,
with ``n_nodes = n_edges / 10`` (avg degree ~20 after the symmetric
rendering). Skew is the point: a uniform random graph would never
exercise the degree-ordered orientation in triangle_count or the
contraction path in connected components.

Measured per size, end-to-end to a driver-side action:
- pagerank:  8 integer power iterations (the flagship registry config)
- cc:        connected components (hash-min + pointer halving + edge
             contraction) over the edge set
- kcore:     3-core peeling, 8 fixed rounds + convergence certificate
- triangles: degree-ordered exact triangle census (O(m^1.5) wedges)

Each size runs in a FRESH SparkSession (stop() releases the previous
size's shuffle dirs — the dedup bench's /tmp lesson) and every op is
separated by a System.gc() nudge so the ContextCleaner can reap
shuffle files between measurements.

Usage: python tools/graph_scale_bench.py [n_edges ...]
       (default 100000 1000000 10000000)
Prints one JSON line per completed size plus the final artifact;
committed as BENCH_SCALE_r{N}_graph.json. Growth >12×/decade gets a
`flagged` entry for the round's PLANS.md note.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from ai_etl_pipeline_spark.operators import dedup, graph  # noqa: E402
from ai_etl_pipeline_spark.session import get_session  # noqa: E402


def build_edges(spark, n_edges: int):
    """Deterministic hub-skewed multigraph: src quadratically biased
    toward low ids, dst uniform, self-loops dropped (the operators drop
    them anyway; dropping here keeps n_edges honest)."""
    n_nodes = max(n_edges // 10, 100)
    u = "(pmod(xxhash64('gs', id), 1000000) / 1000000.0)"
    return (
        spark.range(n_edges)
        .select(
            F.expr(
                f"cast({u} * {u} * {n_nodes} as bigint)"
            ).alias("src"),
            F.expr(f"pmod(xxhash64('gd', id), {n_nodes})").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
    )


def timed(fn):
    t0 = time.monotonic()
    n = fn()
    return round(time.monotonic() - t0, 2), n


def release_shuffles(spark) -> None:
    spark.sparkContext._jvm.System.gc()
    time.sleep(2)


def run_size(spark, n_edges: int) -> dict:
    edges = build_edges(spark, n_edges).persist()
    n_rows = edges.count()  # materialize: generation isn't billed to op 1
    out: dict = {"n_edges": n_rows}

    t, n = timed(lambda: graph.pagerank(edges, iterations=8).count())
    out["pagerank_sec"], out["pagerank_nodes"] = t, n
    release_shuffles(spark)

    pairs = edges.select(
        F.col("src").alias("id_a"), F.col("dst").alias("id_b")
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    nodes.count()
    t, n = timed(
        lambda: dedup.near_duplicate_clusters(pairs, nodes, "node")
        .where(F.col("cluster_id") == F.col("node"))
        .count()
    )
    out["cc_sec"], out["cc_components"] = t, n
    nodes.unpersist()
    release_shuffles(spark)

    t, n = timed(
        lambda: graph.k_core(edges, 3, "src", "dst", iterations=8).count()
    )
    out["kcore_sec"], out["kcore_nodes"] = t, n
    release_shuffles(spark)

    t, row = timed(lambda: graph.triangle_count(edges, "src", "dst").first())
    out["triangles_sec"] = t
    out["n_triangles"] = int(row["n_triangles"])
    edges.unpersist()
    release_shuffles(spark)
    return out


def fresh_session():
    spark = get_session(
        "graph-scale-bench",
        extra_conf={
            "spark.io.compression.codec": "zstd",
            "spark.io.compression.zstd.level": "3",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def warm(spark) -> None:
    e = build_edges(spark, 2000).persist()
    e.count()
    graph.pagerank(e, iterations=8).count()
    graph.k_core(e, 3, "src", "dst", iterations=8).count()
    graph.triangle_count(e, "src", "dst").first()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    dedup.near_duplicate_clusters(
        e.select(F.col("src").alias("id_a"), F.col("dst").alias("id_b")),
        nodes,
        "node",
    ).count()
    e.unpersist()


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000, 10_000_000]
    out = {"metric": "graph_scale", "unit": "sec", "sizes": {}}
    spark = None
    for n in sizes:
        if spark is not None:
            spark.stop()
        spark = fresh_session()
        warm(spark)
        out["sizes"][str(n)] = run_size(spark, n)
        print(json.dumps({"partial": n, **out["sizes"][str(n)]}), flush=True)
    ratios = {}
    flagged = []
    keys = sorted(out["sizes"], key=int)
    for a, b in zip(keys, keys[1:]):
        sa, sb = out["sizes"][a], out["sizes"][b]
        growth = sb["n_edges"] / sa["n_edges"]
        r: dict = {"data_growth": round(growth, 1)}
        for op in ("pagerank", "cc", "kcore", "triangles"):
            k = f"{op}_sec"
            if k in sa and k in sb:
                g = round(sb[k] / max(sa[k], 1e-9), 1)
                r[f"{op}_time_growth"] = g
                if g > 12:
                    flagged.append({"step": f"{a}->{b}", "op": op, "growth": g})
        ratios[f"{a}->{b}"] = r
    out["growth"] = ratios
    out["flagged"] = flagged
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
