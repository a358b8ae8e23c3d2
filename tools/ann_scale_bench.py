"""Scale-growth evidence for the ANN tier (r11 verdict task #3: the
LSH/IVF/PQ tiers had quality receipts — recall@k, nDCG/MRR — but no
decade curve proving index BUILD and PROBE stay sub-quadratic as the
corpus grows).

Corpus: deterministic synthetic embeddings — 64-dim vectors with
components ``(xxhash64('v', id, d) mod 2e6+1 − 1e6) / 1e6`` ∈ [−1, 1],
generated as a Spark range scan (distributed like any source, no
files). Query panel: a FIXED 64-vector hash-ranked panel (the
registry receipts' shape), so probe cost growth isolates the CORPUS
decade, not panel growth.

Measured per size, per tier:
- ivf_cells: √n-sized cell count (similarity.ivf_cells_for — the r12
  verdict #3 fix: a FIXED cell count held ivf_cand_per_query at ~25%
  of the corpus at every size; with cells ~ √n and nprobe fixed the
  probed FRACTION falls per decade — recorded as ivf_cand_frac).
- train_sec: quantizer training — hash-ranked sample (32 rows/cell,
  capped 65536) collected once, IVF centroids trained driver-side with
  the vectorized trainer (kmeans_centroids_local_np — the pure-Python
  bit-lockstep trainer is O(sample·cells·d) interpreted and exists for
  the hash-gated 8-cell receipts), PQ codebooks via pq_train_local on
  the fixed 256-row sample. Still O(sample): grows ~√n via the sample,
  never O(corpus).
- ivf_build_sec: the once-per-corpus inverted-list build (Arrow/BLAS
  cell assignment, ivf_index) — O(n*cells) dgemm work, paid once and
  amortized over every query batch like a deployment's persisted
  cell-partitioned table.
- {lsh,ivf,pq}_query_sec: top-5 for the 64-query panel (IVF: probe +
  score over the prebuilt index; LSH/PQ: one lazy plan).
  Expected ~linear in corpus size (scan-bound), never quadratic.
- cand_per_query: average candidate rows actually scored per query
  (LSH: same-bucket corpus rows; IVF: rows in the nprobe probed
  cells; PQ/ADC and brute-force: the full corpus by design — recorded
  to make the comparison honest).
- bf_query_sec: brute-force baseline for reference.

r15 additions (the r14 verdict's What's wrong #1 + What's missing #2):
- The LSH tier now runs under lsh_bits_for(n) auto sizing (bits =
  ⌈log2(n/32)⌉, the √n-cells precedent) with auto multiprobe
  (min(bits, max(2, bits//2)) Hamming-1 probes) — lsh_cand_per_query
  must stop growing linearly. The old fixed-8-bit design is kept as a
  CONTROL column (lsh_fixed8_*), and recall@5 vs the brute-force truth
  is recorded for BOTH designs (lsh_recall_micro /
  lsh_fixed8_recall_micro) so the candidate cut is honest about what
  it costs in recall.
- ivfpq_append_sec: appending a 10%-of-corpus delta to the frozen
  IVFADC index (ivfpq_index_append — assign+encode the delta only)
  vs ivfpq_build_sec's full O(n·cells) rebuild.

Fresh SparkSession per size (shuffle-dir hygiene), System.gc() between
ops. Usage: python tools/ann_scale_bench.py [n ...]
(default 20000 200000 2000000). Prints one JSON line per size plus the
final artifact; committed as BENCH_SCALE_r{N}_ann.json. Growth
>12×/decade on any *_sec gets a `flagged` entry.
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
SAMPLE = 256
K = 5
NPROBE = 2
LSH_BITS = 8


def build_corpus(spark, n: int):
    comp = "(pmod(xxhash64('v', id, d), 2000001) - 1000000) / 1000000.0"
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {DIM - 1}), d -> cast({comp} as double))"
        ).alias("embedding"),
    )


def timed(fn):
    t0 = time.monotonic()
    r = fn()
    return round(time.monotonic() - t0, 2), r


def release_shuffles(spark) -> None:
    spark.sparkContext._jvm.System.gc()
    time.sleep(2)


def run_size(spark, n: int) -> dict:
    emb = build_corpus(spark, n).persist()
    n_rows = emb.count()
    cells = similarity.ivf_cells_for(n_rows)
    lsh_bits = similarity.lsh_bits_for(n_rows)
    lsh_mp = min(lsh_bits, max(2, lsh_bits // 2))
    out: dict = {
        "n_vectors": n_rows,
        "ivf_cells": cells,
        "lsh_bits": lsh_bits,
        "lsh_multiprobe": lsh_mp,
    }

    panel = similarity.hash_ranked_sample(
        emb, "vec_id", PANEL, salt="rq|", corpus_rows=n_rows
    ).localCheckpoint()

    # --- training: the O(sample) claim (sample ~ 32/cell, never O(n)) --
    def train():
        ivf_sample = min(32 * cells, 65536)
        rows = [
            (r["vec_id"], [float(x) for x in r["embedding"]])
            for r in similarity.hash_ranked_sample(
                emb, "vec_id", max(ivf_sample, SAMPLE), corpus_rows=n_rows
            ).collect()
        ]
        cents = similarity.kmeans_centroids_local_np(
            rows[: max(ivf_sample, SAMPLE)], k=cells, iterations=2
        )
        books = similarity.pq_train_local(rows[:SAMPLE], m=4, codebook_k=16, iterations=2)
        return cents, books

    out["train_sec"], (cents, books) = timed(train)
    release_shuffles(spark)

    # --- per-tier end-to-end query cost ------------------------------
    # LSH under the r15 auto sizing (bits scale with log n, multiprobe
    # widened) — the column that must stop growing linearly
    t, _ = timed(
        lambda: similarity.lsh_knn(
            emb, panel, k=K, num_bits=lsh_bits, multiprobe=lsh_mp
        ).count()
    )
    out["lsh_query_sec"] = t
    release_shuffles(spark)

    # CONTROL: the pre-r15 fixed-8-bit single-probe design
    t, _ = timed(
        lambda: similarity.lsh_knn(emb, panel, k=K, num_bits=LSH_BITS).count()
    )
    out["lsh_fixed8_query_sec"] = t
    release_shuffles(spark)

    # IVF: index BUILD (the once-per-corpus O(n·cells) assignment —
    # Arrow/BLAS pass at √n cell counts) measured apart from QUERY
    # (probe + score over the prebuilt inverted lists) — the shape a
    # deployment actually runs: build once, amortize over batches.
    def build_index():
        ix = similarity.ivf_index(emb, cents)
        ix.count()  # materialize the cached inverted lists
        return ix

    out["ivf_build_sec"], index = timed(build_index)
    release_shuffles(spark)

    t, _ = timed(
        lambda: similarity.ivf_knn(
            emb, panel, k=K, nprobe=NPROBE, centroids=cents, index=index
        ).count()
    )
    out["ivf_query_sec"] = t
    index.unpersist()
    release_shuffles(spark)

    t, _ = timed(
        lambda: similarity.pq_knn(emb, panel, k=K, codebooks=books).count()
    )
    out["pq_query_sec"] = t
    release_shuffles(spark)

    # IVFPQ (r13 verdict missing #1): compose the two indexes — coarse
    # cells prune, ADC scans ONLY the probed lists. Build = one
    # assignment+encode pass (vs ivf_build's assignment-only); query
    # cost should track the probed fraction (falling per decade under
    # √n cells), unlike flat PQ's full-corpus ADC scan.
    def build_ivfpq():
        ix = similarity.ivfpq_index(emb, cents, books)
        ix.count()  # materialize the cell-partitioned code table
        return ix

    out["ivfpq_build_sec"], pq_index = timed(build_ivfpq)
    release_shuffles(spark)

    t, _ = timed(
        lambda: similarity.ivfpq_knn(
            emb, panel, k=K, nprobe=NPROBE,
            centroids=cents, codebooks=books, index=pq_index,
        ).count()
    )
    out["ivfpq_query_sec"] = t
    release_shuffles(spark)

    # incremental maintenance (r15): append a 10% delta against the
    # FROZEN quantizers — cost must be delta-sized, not a full rebuild
    delta = build_corpus(spark, n + max(n // 10, 1)).where(f"vec_id >= {n}")
    t, _ = timed(
        lambda: similarity.ivfpq_index_append(
            pq_index, delta, cents, books
        ).count()
    )
    out["ivfpq_append_sec"] = t
    pq_index.unpersist()
    release_shuffles(spark)

    # brute force doubles as the recall ground truth — collect the
    # panel-sized result once (64×5 rows) instead of re-running it
    def bf_truth():
        return similarity.brute_force_knn(emb, panel, k=K).collect()

    out["bf_query_sec"], truth_rows = timed(bf_truth)
    truth = {(r.query_id, r.neighbor_id) for r in truth_rows}
    release_shuffles(spark)

    # --- recall@5 vs brute force (honesty metric for the r15 sizing) --
    def recall_of(res_rows):
        hits = sum((r.query_id, r.neighbor_id) in truth for r in res_rows)
        return hits * 1_000_000 // max(len(truth), 1)

    out["lsh_recall_micro"] = recall_of(
        similarity.lsh_knn(
            emb, panel, k=K, num_bits=lsh_bits, multiprobe=lsh_mp
        ).collect()
    )
    out["lsh_fixed8_recall_micro"] = recall_of(
        similarity.lsh_knn(emb, panel, k=K, num_bits=LSH_BITS).collect()
    )
    release_shuffles(spark)

    # --- candidates per query (honesty metric) -----------------------
    # LSH (auto sizing): corpus rows across each panel vector's probed
    # buckets — the identity probe plus lsh_mp Hamming-1 flips
    def lsh_cands(bits: int, mp: int) -> float:
        bcount = (
            emb.select(similarity.sign_lsh_bucket("embedding", bits).alias("b"))
            .groupBy("b")
            .count()
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
            .agg(
                (
                    F.sum(F.coalesce(F.col("count"), F.lit(0))) / F.lit(PANEL)
                ).alias("c")
            )
            .first()
        )
        return float(row["c"])

    out["lsh_cand_per_query"] = round(lsh_cands(lsh_bits, lsh_mp), 1)
    out["lsh_fixed8_cand_per_query"] = round(lsh_cands(LSH_BITS, 0), 1)
    # IVF: rows in each panel vector's nprobe nearest cells. Cell sizes
    # come from one assignment pass (the same Arrow/BLAS argmax the
    # index uses at √n cell counts — ivf_assign_cells).
    cell_sizes = (
        similarity.ivf_assign_cells(
            emb.select("vec_id", "embedding"), "embedding", cents
        )
        .groupBy("cell")
        .count()
    )
    probed = similarity.ivf_assign_cells(
        panel.select("vec_id", "embedding"), "embedding", cents, nprobe=NPROBE
    ).select("vec_id", "cell")
    row = (
        probed.join(cell_sizes, "cell", "left")
        .groupBy("vec_id")
        .agg(F.sum(F.coalesce(F.col("count"), F.lit(0))).alias("c"))
        .agg(F.avg("c").alias("c"))
        .first()
    )
    out["ivf_cand_per_query"] = round(float(row["c"]), 1)
    out["ivf_cand_frac"] = round(float(row["c"]) / n_rows, 4)
    out["pq_cand_per_query"] = n_rows  # flat ADC scans every code by design
    # IVFPQ probes the same nprobe cells as IVF — its ADC candidate set
    # IS the probed-cell row count (the falling column flat PQ lacks)
    out["ivfpq_cand_per_query"] = out["ivf_cand_per_query"]
    emb.unpersist()
    release_shuffles(spark)
    return out


def fresh_session():
    spark = get_session(
        "ann-scale-bench",
        extra_conf={
            "spark.io.compression.codec": "zstd",
            "spark.io.compression.zstd.level": "3",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [20_000, 200_000, 2_000_000]
    out = {"metric": "ann_scale", "unit": "sec", "sizes": {}}
    spark = None
    for n in sizes:
        if spark is not None:
            spark.stop()
        spark = fresh_session()
        run_size(spark, 2_000)  # warm codegen/python on a tiny corpus
        out["sizes"][str(n)] = run_size(spark, n)
        print(json.dumps({"partial": n, **out["sizes"][str(n)]}), flush=True)
    ratios = {}
    flagged = []
    keys = sorted(out["sizes"], key=int)
    for a, b in zip(keys, keys[1:]):
        sa, sb = out["sizes"][a], out["sizes"][b]
        r: dict = {"data_growth": round(sb["n_vectors"] / sa["n_vectors"], 1)}
        for k in ("train_sec", "lsh_query_sec", "ivf_build_sec",
                  "ivf_query_sec", "pq_query_sec", "bf_query_sec",
                  "ivfpq_append_sec"):
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
