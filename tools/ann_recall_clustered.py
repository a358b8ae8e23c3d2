"""ANN recall frontier on a CLUSTERED corpus (r16 — the r15 verdict's
missing #2): every prior recall receipt used ann_scale_bench's uniform
synthetic corpus, the documented WORST case for locality (a uniform
point's top-5 neighbors are barely separated from the rest, so any
bucketing/cell structure looks bad). Real embedding corpora are
clustered; this receipt measures the SAME six tiers, same fixed
64-query panel, same recall@5-vs-brute-force protocol as
tools/ann_recall_frontier.py, on a deterministic mixture-of-Gaussians:

- 256 components; component means uniform in [-1, 1]^64
  (hash-derived, reproducible);
- per-vector noise = 0.1 · (u1 + u2 + u3) per dimension with
  u_i uniform in [-1, 1] from independent hash salts — the Irwin–Hall
  CLT shape (sum of 3 uniforms ≈ Gaussian, std 0.1·√3·√(1/3)·... ≈
  0.1 per dimension), SQL-only and deterministic, no RNG state;
- queries are corpus members (hash-ranked panel), i.e. cluster
  members, the realistic retrieval shape.

Together with the uniform frontier this turns the tier-routing
guidance (training-free LSH vs trained IVF) from prose into two
measured endpoints: the locality floor and the clustered case.

Usage: python tools/ann_recall_clustered.py [n]   (default 2000000)
Prints one JSON line; committed as BENCH_SCALE_r{N}_ann_clustered.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from ai_etl_pipeline_spark.operators import similarity  # noqa: E402
from ai_etl_pipeline_spark.session import get_session  # noqa: E402

DIM = 64
PANEL = 64
K = 5
COMPONENTS = 256
SIGMA = 0.1


def build_corpus(spark, n: int):
    """Deterministic mixture of COMPONENTS Gaussians in [-1,1]^DIM."""
    u = "((pmod(xxhash64('{s}', {key}, d), 2000001) - 1000000) / 1000000.0)"
    mu = u.format(s="mu", key="cid")
    noise = " + ".join(u.format(s=f"e{k}", key="id") for k in (1, 2, 3))
    return (
        spark.range(n)
        .withColumn("cid", F.expr(f"pmod(xxhash64('c', id), {COMPONENTS})"))
        .select(
            F.col("id").alias("vec_id"),
            F.expr(
                f"transform(sequence(0, {DIM - 1}), "
                f"d -> cast({mu} + {SIGMA} * ({noise}) as double))"
            ).alias("embedding"),
        )
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_session(
        "ann-recall-clustered",
        extra_conf={"spark.io.compression.codec": "zstd"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = build_corpus(spark, n).persist()
    n_rows = emb.count()
    panel = similarity.hash_ranked_sample(
        emb, "vec_id", PANEL, salt="rq|", corpus_rows=n_rows
    ).localCheckpoint()

    truth = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_knn(emb, panel, k=K).collect()
    }

    def measure(label: str, df, cand: float) -> dict:
        t0 = time.monotonic()
        rows = df.collect()
        hits = sum((r.query_id, r.neighbor_id) in truth for r in rows)
        return {
            "tier": label,
            "cand_per_query": round(cand, 1),
            "recall_micro": hits * 1_000_000 // max(len(truth), 1),
            "query_sec": round(time.monotonic() - t0, 2),
        }

    def lsh_cands(bits: int, mp: int) -> float:
        bcount = (
            emb.select(similarity.sign_lsh_bucket("embedding", bits).alias("b"))
            .groupBy("b").count()
        )
        pb = panel.select(
            similarity.sign_lsh_bucket("embedding", bits).alias("b0")
        )
        if mp:
            probes = F.array(
                F.col("b0"),
                *[F.expr(f"cast(b0 ^ {1 << i} as int)") for i in range(mp)],
            )
            pb = pb.withColumn("b", F.explode(probes)).select("b")
        else:
            pb = pb.select(F.col("b0").alias("b"))
        row = (
            pb.join(bcount, "b", "left")
            .groupBy()
            .agg((F.sum(F.coalesce(F.col("count"), F.lit(0))) / F.lit(PANEL)).alias("c"))
            .first()
        )
        return float(row["c"])

    tiers = []
    tiers.append(measure(
        "lsh_fixed8",
        similarity.lsh_knn(emb, panel, k=K, num_bits=8),
        lsh_cands(8, 0),
    ))
    for target in (32, 128, 512):
        bits = similarity.lsh_bits_for(n_rows, target)
        mp = min(bits, max(2, bits // 2))
        tiers.append(measure(
            f"lsh_auto_t{target}",
            similarity.lsh_knn(
                emb, panel, k=K, num_bits=bits, multiprobe=mp
            ),
            lsh_cands(bits, mp),
        ))
        tiers[-1]["bits"] = bits
        tiers[-1]["multiprobe"] = mp
    cells = similarity.ivf_cells_for(n_rows)
    sample = min(32 * cells, 65536)
    rows = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in similarity.hash_ranked_sample(
            emb, "vec_id", sample, corpus_rows=n_rows
        ).collect()
    ]
    cents = similarity.kmeans_centroids_local_np(rows, k=cells, iterations=2)
    index = similarity.ivf_index(emb, cents)
    index.count()
    cell_sizes = {
        r["cell"]: r["count"]
        for r in index.groupBy("cell").count().collect()
    }
    for nprobe in (2, 8):
        probed = similarity.ivf_assign_cells(
            panel.select("vec_id", "embedding"), "embedding", cents,
            nprobe=nprobe,
        ).select("vec_id", "cell").collect()
        cand = sum(cell_sizes.get(r["cell"], 0) for r in probed) / PANEL
        tiers.append(measure(
            f"ivf_nprobe{nprobe}",
            similarity.ivf_knn(
                emb, panel, k=K, nprobe=nprobe, centroids=cents, index=index
            ),
            cand,
        ))
        tiers[-1]["cells"] = cells
    index.unpersist()

    out = {
        "metric": "ann_recall_clustered",
        "corpus": f"mog{COMPONENTS}_sigma{SIGMA}",
        "n_vectors": n_rows,
        "panel": PANEL,
        "k": K,
        "tiers": tiers,
    }
    emb.unpersist()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
