"""Scale-growth evidence for the EMBEDDING SUFFICIENT-STATISTICS tier
(r12: gramian / PCA / linear probe / Mahalanobis in
``operators/embedstats.py``). The module's 100 TB claim is that every
op reduces the corpus to a d x d (or d x n_classes) statistic in ONE
map-only Arrow pass with a shuffle whose volume depends on partition
count, not corpus size — so wall time must track the scan decade and
nothing else. This curve measures exactly that.

Synthetic vectors (deterministic: sin of id-derived angles, dim 64,
8 labels from a linear functional so the probe has signal), written
once per size as parquet (write not billed):

- gramian_sec:     full X^T X reduction + driver collect
- probe_sec:       linear_probe_report end-to-end (distinct labels,
                   gramian, X^T Y, driver solve, distributed predict,
                   accuracy aggregate — the most pass-heavy op here)
- mahal_sec:       mahalanobis_scores + an aggregate over the scores
                   (two stat passes + one scoring pass)

Fresh session per size; 10k warm-up first. Usage:
python tools/embed_scale_bench.py [n ...]
(default 20000 200000 2000000). Artifact: BENCH_SCALE_r{N}_embed.json;
>12x/decade flags.
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
from ai_etl_pipeline_spark.operators import embedstats  # noqa: E402

DIM = 64


def write_vectors(spark, n: int) -> str:
    base = tempfile.mkdtemp(prefix=f"embedbench_{n}_")
    # sin(id * k) per dimension: deterministic, anisotropic enough for
    # a non-degenerate covariance, no Python in the generator
    vec = F.array(
        *[
            F.sin(F.col("id") * F.lit(0.1 + 0.037 * k)).alias(f"v{k}")
            for k in range(DIM)
        ]
    )
    (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            vec.alias("embedding"),
            F.expr("cast(pmod(xxhash64('lbl', id), 8) as bigint)").alias("label"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(base)
    )
    return base


def timed(fn):
    """Best of 2 (bench.py's convention): the first run pays the cold
    read of the just-written corpus file + codegen; min() measures the
    engine, not the page cache."""
    best, r = None, None
    for _ in range(2):
        t0 = time.monotonic()
        r = fn()
        el = time.monotonic() - t0
        best = el if best is None else min(best, el)
    return round(best, 2), r


def release_shuffles(spark) -> None:
    spark.sparkContext._jvm.System.gc()
    time.sleep(2)


def run_size(spark, n: int) -> dict:
    out: dict = {"n_vectors": n, "dim": DIM}
    path = write_vectors(spark, n)
    try:
        df = spark.read.parquet(path)

        def gram():
            rows = embedstats.gramian_matrix(df, "embedding", DIM).collect()
            return rows[0]["n_rows"]

        out["gramian_sec"], out["gramian_n"] = timed(gram)
        release_shuffles(spark)

        def probe():
            rep = embedstats.linear_probe_report(
                df, "embedding", "label", DIM, l2=1.0
            ).collect()
            return sum(r["correct"] for r in rep)

        out["probe_sec"], out["probe_correct"] = timed(probe)
        release_shuffles(spark)

        def mahal():
            return (
                embedstats.mahalanobis_scores(df, "embedding", DIM)
                .agg(
                    F.count("mahalanobis").alias("n"),
                    F.round(F.avg("mahalanobis"), 4).alias("avg"),
                )
                .collect()[0]["n"]
            )

        out["mahal_sec"], out["mahal_n"] = timed(mahal)
        release_shuffles(spark)
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return out


OPS = ("gramian_sec", "probe_sec", "mahal_sec")


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [20_000, 200_000, 2_000_000]
    out = {"metric": "embed_stats_scale", "unit": "sec", "sizes": {}}
    spark = None
    for n in sizes:
        if spark is not None:
            spark.stop()
        spark = get_session("embed-scale-bench")
        spark.sparkContext.setLogLevel("ERROR")
        run_size(spark, 10_000)  # warm the exact shapes off the clock
        out["sizes"][str(n)] = run_size(spark, n)
        print(json.dumps({"partial": n, **out["sizes"][str(n)]}), flush=True)
    ratios, flagged = {}, []
    keys = sorted(out["sizes"], key=int)
    for a, b in zip(keys, keys[1:]):
        sa, sb = out["sizes"][a], out["sizes"][b]
        r: dict = {"data_growth": round(sb["n_vectors"] / sa["n_vectors"], 1)}
        for k in OPS:
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
