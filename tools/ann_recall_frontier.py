"""Recall/candidate FRONTIER for the ANN tiers at one corpus size —
the companion honesty receipt to ann_scale_bench's decade curves
(r15). The scale bench proves the auto-sized sign-LSH candidate curve
stops growing with the corpus; this receipt answers the follow-up
question "what did the bounded budget cost in recall, and is recall a
KNOB or a casualty?" by measuring recall@5 against brute-force ground
truth at several points of the sizing knob ON THE SAME CORPUS:

- lsh_fixed8: the retired design (bucket = n/256 — candidates grow
  linearly with the corpus; its recall 'advantage' is just a bigger
  scan).
- lsh_auto_t{32,128,512}: lsh_bits_for(n, target_bucket=t) with auto
  multiprobe — the production knob. Larger t = more candidates = more
  recall, at a budget the OPERATOR chose, independent of corpus size.
- ivf_nprobe{2,8}: the trained coarse-quantizer tier at two probe
  widths (√n cells) — same knob shape, cells instead of sign buckets.

All tiers are scored against the same fixed 64-query hash-ranked
panel. The corpus is ann_scale_bench's uniform synthetic one — the
WORST case for any locality structure (top-5 neighbors of a uniform
point are barely separated), so these recalls are floors, not
expectations; real embedding corpora are clustered and bucket/cell
locality does far better there.

Usage: python tools/ann_recall_frontier.py [n]   (default 2000000)
Prints one JSON line; committed as BENCH_SCALE_r{N}_ann_frontier.json.
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


def build_corpus(spark, n: int):
    comp = "(pmod(xxhash64('v', id, d), 2000001) - 1000000) / 1000000.0"
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {DIM - 1}), d -> cast({comp} as double))"
        ).alias("embedding"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    # no maxResultSize bump needed: both hash_ranked_sample calls below
    # pass corpus_rows, so the cutoff pre-filter keeps task-local top-k
    # partials at ~8n rows corpus-wide (the bare top-k's O(tasks × n)
    # partials tripped the 1 GiB default at 20M rows)
    spark = get_session(
        "ann-recall-frontier",
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
    # retired fixed-8-bit control (single probe — the pre-r15 registry shape)
    tiers.append(measure(
        "lsh_fixed8",
        similarity.lsh_knn(emb, panel, k=K, num_bits=8),
        lsh_cands(8, 0),
    ))
    # the r15 knob: auto bits at three target budgets, auto multiprobe
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
    # trained IVF at two probe widths for cross-tier context
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
        "metric": "ann_recall_frontier",
        "n_vectors": n_rows,
        "panel": PANEL,
        "k": K,
        "tiers": tiers,
    }
    emb.unpersist()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
