"""Scale-growth evidence for the dedup tier (round-5 item: the sf0.1
bench corpus is 500 docs, index-build dominated — this measures the
SAME operators on 10x and 100x synthetic corpora so growth, not
constant cost, is visible).

Corpora come from the partitioned Python DataSource
(`synthetic_docs`), so generation is distributed like any file scan; a
deterministic 10% near-dup layer (each doc_id % 10 == 0 re-emitted
with one appended word under id + n) guarantees the LSH/verify stages
do real work instead of degenerating to zero candidates.

Workload proportionality: the raw generator has a 16-word vocabulary
and 6-15-word docs, so CHANCE near-dup pairs grow ~quadratically with
corpus size (at 550k docs a first cut measured 14x more verified pairs
for 10x more docs) — that measures the corpus, not the operator. Each
doc therefore gets four unique md5-derived filler tokens and the
near-dup threshold is 0.8: injected dups stay J = n/(n+1) >= 0.86,
chance same-base collisions cap at ~10/18 = 0.55 and are verified
away, so pair counts track the injected 10% and time growth reflects
operator scaling.

Measured per size, end-to-end to a driver-side count:
- minhash:     full MinHash-LSH pair generation + Jaccard verify
- clusters:    connected components over those pairs (O(log d) rounds)
- incremental: 10% delta probed against the 90% corpus band index

Usage: python tools/dedup_scale_bench.py [size ...]   (default 5000 50000)
Prints ONE JSON line; the round artifact is committed as
BENCH_SCALE_r{N}.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from ai_etl_pipeline_spark.operators import dedup  # noqa: E402
from ai_etl_pipeline_spark.session import get_session  # noqa: E402
from ai_etl_pipeline_spark.sources import writers  # noqa: E402
from ai_etl_pipeline_spark.sources.python_datasource import (  # noqa: E402
    register_synthetic_docs,
)


THRESHOLD = 0.8


def build_corpus(spark, n: int):
    h = F.md5(F.col("doc_id").cast("string"))
    base = (
        spark.read.format("synthetic_docs")
        .option("n", n)
        .option("partitions", 32)
        .load()
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                F.col("text"),
                F.substring(h, 1, 8),
                F.substring(h, 9, 8),
                F.substring(h, 17, 8),
                F.substring(h, 25, 8),
            ).alias("text"),
        )
    )
    dups = base.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + n).alias("doc_id"),
        F.concat_ws(" ", F.col("text"), F.lit("extra")).alias("text"),
    )
    return base.unionByName(dups)


def timed(fn) -> tuple[float, int]:
    t0 = time.monotonic()
    n = fn()
    return round(time.monotonic() - t0, 2), n


def release_shuffles(spark) -> None:
    """Nudge the ContextCleaner between ops: shuffle map outputs live on
    disk until their RDD objects are GC'd, so a multi-op size at 5M docs
    otherwise ACCUMULATES every op's shuffle files (~60 GB — the
    attempt-3 'No space left on device'). A JVM System.gc() after each
    timed op lets the cleaner delete the previous op's files."""
    spark.sparkContext._jvm.System.gc()
    time.sleep(2)


def run_size(spark, n: int) -> dict:
    docs = build_corpus(spark, n).persist()
    n_docs = docs.count()  # materialize so generation isn't billed to op 1

    t_minhash, n_pairs = timed(
        lambda: dedup.minhash_lsh_near_duplicates(
            docs, "doc_id", "text", threshold=THRESHOLD
        ).count()
    )
    release_shuffles(spark)

    # materialize the pair relation OUTSIDE the clusters timing: the
    # operator eagerly persists its input, so handing it the lazy
    # minhash plan would re-execute all of pair generation inside the
    # clustering measurement (a first cut showed exactly that — the
    # "clusters" time tracked minhash, not clustering)
    pairs = dedup.minhash_lsh_near_duplicates(
        docs, "doc_id", "text", threshold=THRESHOLD
    ).persist()
    pairs.count()
    t_clusters, n_clustered = timed(
        lambda: dedup.near_duplicate_clusters(pairs, docs, "doc_id").count()
    )
    pairs.unpersist()
    release_shuffles(spark)

    corpus = docs.where(F.col("doc_id") % 10 != 0)
    delta = docs.where(F.col("doc_id") % 10 == 0)
    t_incr, n_incr = timed(
        lambda: dedup.minhash_lsh_incremental(
            corpus, delta, "doc_id", "text", threshold=THRESHOLD
        ).count()
    )
    release_shuffles(spark)

    # the 100 TB shape, separately timed: pay the corpus signature pass
    # ONCE into a (band, sig)-bucketed index table, then the per-batch
    # probe only computes DELTA signatures and equi-joins the bucketed
    # index with no corpus-side Exchange — probe cost should track the
    # delta, not the corpus
    import tempfile

    spark = docs.sparkSession
    tbl = f"t_scale_band_index_{n}"
    t_index, _ = timed(
        lambda: writers.write_bucketed_table(
            dedup.minhash_band_relation(corpus, "doc_id", "text", 3, 16, 8),
            tbl,
            ["band", "sig"],
            num_buckets=16,
            sort_cols=["band", "sig"],
            path=tempfile.mkdtemp(prefix=f"band_idx_{n}_"),
        )
        or 0
    )
    idx = spark.table(tbl)
    t_probe, n_probe = timed(
        lambda: dedup.minhash_lsh_incremental(
            corpus, delta, "doc_id", "text",
            threshold=THRESHOLD, corpus_bands=idx,
        ).count()
    )
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")

    docs.unpersist()
    return {
        "n_docs": n_docs,
        "minhash_sec": t_minhash,
        "minhash_pairs": n_pairs,
        "clusters_sec": t_clusters,
        "clusters_rows": n_clustered,
        "incremental_sec": t_incr,
        "incremental_pairs": n_incr,
        "index_build_sec": t_index,
        "bucketed_probe_sec": t_probe,
        "bucketed_probe_pairs": n_probe,
    }


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [5000, 50000]
    spark = get_session("dedup-scale-bench", extra_conf={"spark.io.compression.codec": "zstd"})
    spark.sparkContext.setLogLevel("ERROR")
    register_synthetic_docs(spark)
    # warm-up runs the MEASURED operators on a tiny corpus: JVM, codegen
    # for these exact plan shapes, python workers, shuffle service — a
    # bare count() warm-up left ~15s of first-run init billed to the
    # smallest size's minhash
    warm = build_corpus(spark, 500).persist()
    warm.count()
    dedup.minhash_lsh_near_duplicates(warm, "doc_id", "text", threshold=THRESHOLD).count()
    pairs = dedup.minhash_lsh_near_duplicates(warm, "doc_id", "text", threshold=THRESHOLD)
    dedup.near_duplicate_clusters(pairs, warm, "doc_id").count()
    dedup.minhash_lsh_incremental(
        warm.where(F.col("doc_id") % 10 != 0),
        warm.where(F.col("doc_id") % 10 == 0),
        "doc_id",
        "text",
        threshold=THRESHOLD,
    ).count()
    warm.unpersist()

    out = {"metric": "dedup_scale", "unit": "sec", "sizes": {}}
    for n in sizes:
        # fresh context per size: stop() removes this context's shuffle
        # dirs from disk; the per-size warm-up below re-warms codegen so
        # sizes stay comparable
        spark.stop()
        spark = get_session("dedup-scale-bench", extra_conf={"spark.io.compression.codec": "zstd"})
        spark.sparkContext.setLogLevel("ERROR")
        register_synthetic_docs(spark)
        warm = build_corpus(spark, 500).persist()
        dedup.minhash_lsh_near_duplicates(warm, "doc_id", "text", threshold=THRESHOLD).count()
        warm.unpersist()
        out["sizes"][str(n)] = run_size(spark, n)
    ratios = {}
    keys = sorted(out["sizes"], key=int)
    for a, b in zip(keys, keys[1:]):
        sa, sb = out["sizes"][a], out["sizes"][b]
        growth = sb["n_docs"] / sa["n_docs"]
        ratios[f"{a}->{b}"] = {
            "data_growth": round(growth, 1),
            "minhash_time_growth": round(sb["minhash_sec"] / max(sa["minhash_sec"], 1e-9), 1),
            "clusters_time_growth": round(sb["clusters_sec"] / max(sa["clusters_sec"], 1e-9), 1),
            "incremental_time_growth": round(
                sb["incremental_sec"] / max(sa["incremental_sec"], 1e-9), 1
            ),
            "bucketed_probe_time_growth": round(
                sb["bucketed_probe_sec"] / max(sa["bucketed_probe_sec"], 1e-9), 1
            ),
        }
    out["growth"] = ratios
    print(json.dumps(out))


if __name__ == "__main__":
    main()
